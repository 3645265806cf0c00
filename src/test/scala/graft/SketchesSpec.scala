package graft

import org.apache.spark.sql.functions._

import graft.operators.Sketches

/** Deterministic sketch layer: KMV distinct (exact-below-k, estimator,
  * persistable sketch/merge/estimate composition) and count-min
  * (over-estimate-only guarantee, incremental merge by summing cells).
  */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  test("kmvDistinct is exact while a group has seen fewer than k distinct keys") {
    val df = Seq(("a", 1), ("a", 2), ("a", 2), ("a", 3), ("b", 7)).toDF("g", "x")
    val out = Sketches.kmvDistinct(df, col("x"), Seq(col("g")), k = 64)
      .collect().map(r => r.getAs[String]("g") -> r.getAs[Double]("nd_est")).toMap
    assert(out("a") == 3.0 && out("b") == 1.0, out.toString)
  }

  test("kmvDistinct estimator lands within the k-bound error on a large domain") {
    val n = 20000
    val df = spark.range(n).select((col("id") * 7919 % 1000003).as("x"))
    val est = Sketches.kmvDistinct(df, col("x"), Seq.empty, k = 256)
      .collect().head.getAs[Double]("nd_est")
    // distinct count is n (injective map mod a prime > n); rel err ~ 1/sqrt(k-2)
    assert(math.abs(est - n) / n < 0.25, s"estimate $est for $n distinct")
  }

  test("kmvSketch shards merge to exactly the whole-corpus sketch and estimate") {
    val whole = spark.range(5000).select((col("id") % 1700).as("x"),
      (col("id") % 2).cast("string").as("g"))
    val shard1 = whole.filter(col("x") < 900)
    val shard2 = whole.filter(col("x") >= 900)
    val k = 64
    val direct = Sketches.kmvDistinct(whole, col("x"), Seq(col("g")), k)
      .collect().map(r => r.getString(0) -> (r.getAs[Int]("n_mins"),
        r.getAs[Long]("kth_hash"), r.getAs[Double]("nd_est"))).toMap
    val merged = Sketches.kmvEstimate(Sketches.kmvMerge(Seq(
      Sketches.kmvSketch(shard1, col("x"), Seq(col("g")), k),
      Sketches.kmvSketch(shard2, col("x"), Seq(col("g")), k)), Seq("g"), k), k)
      .collect().map(r => r.getString(0) -> (r.getAs[Int]("n_mins"),
        r.getAs[Long]("kth_hash"), r.getAs[Double]("nd_est"))).toMap
    assert(direct == merged, s"direct $direct vs merged $merged")
  }

  test("cms estimates never undercount and are exact for heavy terms at ample width") {
    val terms = (Seq.fill(500)("hot") ++ Seq("a", "b", "c", "d", "e")).toDF("t")
    val sketch = Sketches.cmsBuild(terms, col("t"), depth = 4, width = 1024)
    val probes = Seq("hot", "a", "zzz-absent").toDF("t")
    val est = Sketches.cmsQuery(sketch, probes, col("t"), depth = 4, width = 1024)
      .collect().map(r => r.getAs[String]("term") -> r.getAs[Long]("est_count")).toMap
    assert(est("hot") >= 500L && est("a") >= 1L, est.toString)
    // with 6 distinct terms in 1024 buckets × 4 rows, collisions are
    // wildly unlikely — the estimates are exact here
    assert(est("hot") == 500L && est("a") == 1L && est("zzz-absent") == 0L, est.toString)
  }

  test("quantileSketch is exact below k and its estimate tracks true quantiles above") {
    // below k: the "sample" is the whole group, nearest-rank is exact
    val small = (1L to 9L).map(i => ("g", i)).toDF("g", "v")
      .select(col("g"), col("v"), col("v").as("k"))
    val ex = Sketches.quantileEstimate(
      Sketches.quantileSketch(small, col("v"), col("k"), Seq(col("g")), k = 64),
      Seq("g"), Seq(0.5)).collect().head
    assert(ex.getAs[Long]("p50") == 5L, ex.toString)
    // above k: uniform 1..20000, p50/p90 within a few percent
    val big = spark.range(1L, 20001L).select(lit("g").as("g"), col("id").as("v"))
    val est = Sketches.quantileEstimate(
      Sketches.quantileSketch(big, col("v"), col("v"), Seq(col("g")), k = 512),
      Seq("g"), Seq(0.5, 0.9)).collect().head
    assert(math.abs(est.getAs[Long]("p50") - 10000L) < 2000, est.toString)
    assert(math.abs(est.getAs[Long]("p90") - 18000L) < 2000, est.toString)
  }

  test("quantileSketch shards merge to exactly the whole-corpus sketch") {
    val whole = spark.range(1L, 5001L)
      .select((col("id") % 3).cast("string").as("g"), col("id").as("v"))
    val k = 64
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val direct = Sketches.quantileSketch(whole, col("v"), col("v"), Seq(col("g")), k)
    val merged = Sketches.quantileMerge(Seq(
      Sketches.quantileSketch(whole.filter(col("v") < 2500), col("v"), col("v"), Seq(col("g")), k),
      Sketches.quantileSketch(whole.filter(col("v") >= 2500), col("v"), col("v"), Seq(col("g")), k)),
      Seq("g"), k)
    assert(rows(direct) == rows(merged))
  }

  test("cms sketches merge incrementally by summing cells") {
    val b1 = Seq("x", "x", "y").toDF("t")
    val b2 = Seq("x", "z").toDF("t")
    val merged = Sketches.cmsBuild(b1, col("t"))
      .unionByName(Sketches.cmsBuild(b2, col("t")))
      .groupBy("d", "bucket").agg(sum("cnt").as("cnt"))
    val whole = Sketches.cmsBuild(b1.unionByName(b2), col("t"))
    assert(merged.collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSet
      == whole.collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSet)
    val est = Sketches.cmsQuery(merged, Seq("x").toDF("t"), col("t"))
      .collect().head.getAs[Long]("est_count")
    assert(est == 3L)
  }

  test("bloom has no false negatives, rejects absent keys at ample size, and is deterministic") {
    val keys = (0 until 500).map(i => s"key$i")
    val df = keys.toDF("k")
    val sketch = Sketches.bloomBuild(df, col("k"), numBits = 1 << 16, hashes = 5)
    // every inserted key answers true
    val in = Sketches.bloomQuery(sketch, df, col("k"), numBits = 1 << 16, hashes = 5)
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(keys.forall(in(_)), "false negative")
    // absent keys: at 2^16 bits / 500 keys / 5 hashes the fp rate is ~1e-7,
    // so 100 absent probes must all answer false
    val absent = (0 until 100).map(i => s"absent$i").toDF("k")
    val out = Sketches.bloomQuery(sketch, absent, col("k"), numBits = 1 << 16, hashes = 5)
      .collect().map(_.getBoolean(1))
    assert(out.forall(!_), "false positive at ample size")
    // deterministic: rebuilding yields the identical (word, bits) relation
    val again = Sketches.bloomBuild(df, col("k"), numBits = 1 << 16, hashes = 5)
    assert(sketch.collect().map(r => (r.getInt(0), r.getLong(1))).toSet ==
      again.collect().map(r => (r.getInt(0), r.getLong(1))).toSet)
  }

  test("bloom shard sketches merge to exactly the whole-corpus sketch") {
    val a = (0 until 200).map(i => s"k$i").toDF("k")
    val b = (150 until 400).map(i => s"k$i").toDF("k")
    val whole = Sketches.bloomBuild(a.unionByName(b), col("k"), numBits = 4096, hashes = 4)
    val merged = Sketches.bloomMerge(Seq(
      Sketches.bloomBuild(a, col("k"), numBits = 4096, hashes = 4),
      Sketches.bloomBuild(b, col("k"), numBits = 4096, hashes = 4)))
    assert(whole.collect().map(r => (r.getInt(0), r.getLong(1))).toSet ==
      merged.collect().map(r => (r.getInt(0), r.getLong(1))).toSet)
  }

  test("kmvSetOps is exact while the union fits in k") {
    val k = 256
    val a = spark.range(0, 60).select(col("id").as("x"))
    val b = spark.range(40, 100).select(col("id").as("x"))
    val sa = Sketches.kmvSketch(a, col("x"), Seq.empty, k)
      .select(col("mins").as("mins_a"))
    val sb = Sketches.kmvSketch(b, col("x"), Seq.empty, k)
      .select(col("mins").as("mins_b"))
    val r = Sketches.kmvSetOps(sa.crossJoin(sb), "mins_a", "mins_b", k)
      .collect().head
    // |A|=60, |B|=60, overlap 40..59 => union 100, intersection 20 — exact
    assert(r.getAs[Int]("n_union_mins") == 100)
    assert(r.getAs[Double]("union_est") == 100.0)
    assert(r.getAs[Int]("n_common_mins") == 20)
    assert(math.abs(r.getAs[Double]("jaccard_est") - 0.2) < 1e-12)
    assert(math.abs(r.getAs[Double]("inter_est") - 20.0) < 1e-9)
  }

  test("kmvSetOps estimates union/intersection within tolerance beyond k") {
    val k = 512
    def inj(df: org.apache.spark.sql.Dataset[java.lang.Long]) =
      df.select((col("id") * 7919 % 1000003).as("x"))
    val a = inj(spark.range(0, 20000))
    val b = inj(spark.range(10000, 30000))
    val sa = Sketches.kmvSketch(a, col("x"), Seq.empty, k).select(col("mins").as("mins_a"))
    val sb = Sketches.kmvSketch(b, col("x"), Seq.empty, k).select(col("mins").as("mins_b"))
    val r = Sketches.kmvSetOps(sa.crossJoin(sb), "mins_a", "mins_b", k).collect().head
    val union = r.getAs[Double]("union_est"); val jac = r.getAs[Double]("jaccard_est")
    assert(math.abs(union - 30000) / 30000 < 0.2, s"union $union")
    assert(math.abs(jac - 1.0 / 3) < 0.1, s"jaccard $jac")
    assert(math.abs(r.getAs[Double]("inter_est") - 10000) / 10000 < 0.3)
  }

  test("winsorize clips into per-group sketch bounds the data contains") {
    val df = spark.range(1000).select((col("id") % 7).cast("string").as("g"),
      (col("id") * col("id") % 997).cast("double").as("v"), col("id").as("rid"))
    val vals = df.collect().groupBy(_.getString(0))
      .map { case (g, rs) => g -> rs.map(_.getDouble(1)).toSet }
    val out = Sketches.winsorize(df, "v", col("rid"), Seq("g"), lo = 0.1, hi = 0.9, k = 64)
      .collect()
    assert(out.length == 1000, "row count preserved")
    out.foreach { r =>
      val g = r.getAs[String]("g")
      val lo = r.getAs[Double]("lo_bound"); val hi = r.getAs[Double]("hi_bound")
      val c = r.getAs[Double]("v_clipped")
      assert(lo <= hi && c >= lo && c <= hi)
      assert(vals(g).contains(lo) && vals(g).contains(hi),
        "bounds are actual sample values")
      assert(c == math.min(math.max(r.getAs[Double]("v"), lo), hi))
    }
  }

  test("quantileBins buckets rows into reproducible equi-depth bins") {
    val df = spark.range(1000).select((col("id") % 2).cast("string").as("g"),
      col("id").cast("double").as("v"), col("id").as("rid"))
    val out = Sketches.quantileBins(df, "v", col("rid"), Seq("g"), nBins = 4, k = 256)
      .collect()
    assert(out.length == 1000)
    val bins = out.map(_.getAs[Int]("bin")).distinct.sorted
    assert(bins.toSeq == Seq(0, 1, 2, 3), s"bins: ${bins.toSeq}")
    // binning is monotone in the value within a group
    out.groupBy(_.getString(0)).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getAs[Double]("v")).map(_.getAs[Int]("bin"))
      assert(sorted.zip(sorted.tail).forall { case (a, b) => a <= b })
    }
  }

  test("madOutliers: flags the planted spike, never the bulk") {
    // 100 values near 10 plus one spike; k > n so the sketch is the
    // EXACT sample and med/mad are true medians
    val base = spark.range(100)
      .select(lit("g").as("grp"), col("id").as("k"),
        (lit(10.0) + (col("id") % 5).cast("double") / 10.0).as("v"))
    val spiked = base.unionByName(
      Seq(("g", 999L, 1000.0)).toDF("grp", "k", "v"))
    val out = Sketches.madOutliers(spiked, "v", col("k"), Seq("grp"),
      cutoff = 3.0, k = 512)
    val rows = out.collect()
    assert(rows.count(_.getAs[Boolean]("is_outlier")) == 1)
    assert(rows.find(_.getAs[Boolean]("is_outlier")).get.getAs[Double]("v") == 1000.0)
    // med/mad are real data values of the bulk
    val r = rows.head
    assert(r.getAs[Double]("med") >= 10.0 && r.getAs[Double]("med") <= 10.4)
    assert(r.getAs[Double]("mad") <= 0.4)
  }

  test("cmsJoinSize: exact without collisions, over-estimate always") {
    val a = Seq("a", "a", "b").toDF("k")
    val b = Seq("a", "b", "b", "c").toDF("k")
    // true |A ⋈ B| = 2·1 + 1·2 = 4; wide sketch → no collisions → exact
    val wide = Sketches.cmsJoinSize(
      Sketches.cmsBuild(a, col("k"), width = 1 << 14),
      Sketches.cmsBuild(b, col("k"), width = 1 << 14)).head().getLong(0)
    assert(wide == 4L, s"wide=$wide")
    // a 2-bucket grid collides hard but must never under-estimate
    val tight = Sketches.cmsJoinSize(
      Sketches.cmsBuild(a, col("k"), width = 2),
      Sketches.cmsBuild(b, col("k"), width = 2)).head().getLong(0)
    assert(tight >= 4L, s"tight=$tight")
  }

  test("quantileMatch aligns incompatible per-group scales onto one global ladder") {
    // group a scores in 0-10, group b in 1000-1010 — same shape, shifted.
    // After matching, equal within-group ranks must map to EQUAL values.
    val rows = (0 to 10).flatMap(i =>
      Seq((i.toLong, "a", i.toDouble), (100L + i, "b", 1000.0 + i)))
      .toDF("id", "g", "v")
    val out = Sketches.quantileMatch(rows, "v", "id", Seq("g"), nQ = 10, k = 64)
      .collect().map(r => (r.getAs[String]("g"), r.getAs[Double]("prank"),
        r.getAs[Double]("matched")))
    val byRank = out.groupBy(_._2)
    // every rank present in both groups resolves to one matched value
    byRank.foreach { case (p, rs) =>
      assert(rs.map(_._3).distinct.length == 1,
        s"rank $p maps to ${rs.map(_._3).distinct.toSeq}")
    }
    // matching is monotone in rank
    val aSorted = out.filter(_._1 == "a").sortBy(_._2).map(_._3)
    assert(aSorted.zip(aSorted.tail).forall { case (x, y) => x <= y })
    // matched values come from the GLOBAL value ladder
    val ladder = ((0 to 10).map(_.toDouble) ++ (0 to 10).map(1000.0 + _)).toSet
    assert(out.forall(r => ladder.contains(r._3)))
  }
}
