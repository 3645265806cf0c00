import json, glob, sys
a=json.load(open('dev/r14-anchor/sweep_sf01.json'))['queries']
b=json.loads([l for l in open('dev/r14-anchor/sweep_sf1.json')][-1])['queries']
c={}
for f in sorted(glob.glob('dev/r14-anchor/sweep_sf10_chunk*.out')):
    for line in open(f, errors='replace'):
        if line.startswith('{"metric"'):
            c.update(json.loads(line)['queries'])
print(f"sf10 queries collected: {len(c)}")
# Bench records a query whose every run failed as -1.0; a sentinel in any
# scale would make the ratios negative nonsense — exclude and report
bad=sorted(k for k in a if k in b and k in c and min(a[k],b[k],c[k])<0)
if bad: print(f"excluded (failed at some scale): {bad}")
rows=[(k,a[k],b[k],c[k],b[k]/a[k],c[k]/b[k]) for k in a
      if k in b and k in c and min(a[k],b[k],c[k])>=0]
rows.sort(key=lambda r:-r[5])
print(f"{'query':32s} {'sf0.1':>7s} {'sf1':>8s} {'sf10':>8s} {'d1':>6s} {'d2':>6s}")
for k,x,y,z,d1,d2 in rows:
    flag=' <== SUPER-LINEAR' if d2>10 else (' <~ watch' if d2>7 else '')
    print(f"{k:32s} {x:7.3f} {y:8.3f} {z:8.3f} {d1:6.2f} {d2:6.2f}{flag}")
