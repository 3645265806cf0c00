package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.Incremental

/** Incremental summary semantics vs full recompute (mirrors the reference's
  * AggregateRewriter/CountDistinctRewriter contract: MV + delta == full).
  */
class IncrementalSpec extends SparkSpec {
  import spark.implicits._

  private def fact(rows: (Int, String, Long, Double)*) =
    rows.toDF("dt", "k", "member", "v") // dt as yyyyMMdd int, reference-style

  test("additive summary: refresh processes only the delta, query matches full recompute") {
    val mv = Files.createTempDirectory("graft-mv").toString + "/sums"
    val day1 = fact((20240101, "a", 1, 10.0), (20240101, "a", 2, 5.0), (20240101, "b", 1, 1.0))
    Incremental.refresh(spark, day1, mv, "dt", Seq("k"),
      Seq(("SUM", col("v"), "sv"), ("COUNT", lit(1), "n")))
    assert(Incremental.highWaterMark(spark, mv, "dt").contains(20240101))

    // second refresh over full history: only day2 rows are re-aggregated
    val full = day1.union(fact((20240102, "a", 3, 7.0), (20240102, "b", 1, 2.0)))
    Incremental.refresh(spark, full, mv, "dt", Seq("k"),
      Seq(("SUM", col("v"), "sv"), ("COUNT", lit(1), "n")))
    assert(Incremental.highWaterMark(spark, mv, "dt").contains(20240102))
    // the MV holds one partial row per (date, key)
    assert(spark.read.parquet(mv).count() == 4)

    val got = Incremental.query(spark, mv, Seq("k"),
      Seq(("SUM", "sv", "sv"), ("SUM", "n", "n")))
      .orderBy("k").collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    val want = full.groupBy("k").agg(sum("v").as("sv"), count(lit(1)).as("n"))
      .orderBy("k").collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    assert(got.toSeq == want.toSeq)
  }

  test("refresh is idempotent: re-running over the same history never double-counts") {
    val mv = Files.createTempDirectory("graft-mv").toString + "/idem"
    val day1 = fact((20240101, "a", 1, 10.0), (20240101, "b", 1, 1.0))
    Incremental.refresh(spark, day1, mv, "dt", Seq("k"), Seq(("SUM", col("v"), "sv")))
    // simulate a retry after a partial/failed run: HWM says 20240101, but the
    // caller re-submits day1 rows with a stale (empty) HWM view — dynamic
    // partition overwrite must REPLACE the 20240101 partition, not append
    day1.groupBy("dt", "k").agg(sum("v").as("sv"))
      .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
      .partitionBy("dt").parquet(mv)
    Incremental.refresh(spark, day1, mv, "dt", Seq("k"), Seq(("SUM", col("v"), "sv")))
    assert(spark.read.parquet(mv).count() == 2) // one partial per (date, key)
    val got = Incremental.query(spark, mv, Seq("k"), Seq(("SUM", "sv", "sv")))
      .orderBy("k").collect().map(r => (r.getString(0), r.getDouble(1)))
    assert(got.toSeq == Seq(("a", 10.0), ("b", 1.0)))
  }

  test("count-distinct summary: members recurring across dates count once") {
    val mv = Files.createTempDirectory("graft-mv").toString + "/members"
    val day1 = fact((20240101, "a", 1, 0.0), (20240101, "a", 2, 0.0))
    Incremental.refreshDistinct(spark, day1, mv, "dt", Seq("k"), "member")
    val full = day1.union(fact((20240102, "a", 1, 0.0), (20240102, "a", 3, 0.0)))
    Incremental.refreshDistinct(spark, full, mv, "dt", Seq("k"), "member")

    val got = Incremental.queryDistinct(spark, mv, Seq("k"), "member", "nd")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // member 1 appears on both dates but counts once: distinct = {1,2,3}
    assert(got.toSeq == Seq(("a", 3L)))

    // incremental count-distinct under CUBE equals full recompute
    val cubed = Incremental.queryDistinctCube(spark, mv, Seq("k"), "member", "nd")
      .collect().map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    assert(cubed == Map(Some("a") -> 3L, None -> 3L))
  }

  test("sketch summary: cross-date dedup holds and estimates track exact counts") {
    val mv = Files.createTempDirectory("graft-mv").toString + "/sketches"
    val ord = sf("orders").select(
      (year(col("o_orderdate")) * 100 + month(col("o_orderdate"))).cast("int").as("dt"),
      col("o_orderpriority").as("k"), col("o_custkey").as("member"))
    Incremental.refreshDistinctSketch(spark, ord.filter(col("dt") <= 199612),
      mv, "dt", Seq("k"), "member")
    Incremental.refreshDistinctSketch(spark, ord, mv, "dt", Seq("k"), "member")
    // one sketch row per (month, priority), not per member
    val exactRows = ord.select("dt", "k").distinct().count()
    assert(spark.read.parquet(mv).count() == exactRows)

    val est = Incremental.queryDistinctSketch(spark, mv, Seq("k"), "nd")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = ord.groupBy("k").agg(count_distinct(col("member")).as("nd"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.keySet == exact.keySet)
    for ((k, e) <- exact) {
      val rel = math.abs(est(k).toDouble - e) / e.max(1L)
      assert(rel < 0.05, s"estimate for $k off by ${rel * 100}%%: est=${est(k)} exact=$e")
    }

    // grouping sets roll up by unioning the same sketches
    val cubeEst = Incremental.queryDistinctSketchCube(spark, mv, Seq("k"), "nd")
      .filter(col("k").isNull).collect().head.getLong(1)
    val cubeExact = ord.select("member").distinct().count()
    assert(math.abs(cubeEst.toDouble - cubeExact) / cubeExact < 0.05)
  }

  test("KMV summary: incremental merge equals direct sketch bit-for-bit, tracks exact") {
    val mv = Files.createTempDirectory("graft-mv-kmv").toString + "/kmv"
    val ord = sf("orders").select(
      (year(col("o_orderdate")) * 100 + month(col("o_orderdate"))).cast("int").as("dt"),
      col("o_orderpriority").as("k"), col("o_custkey").as("member"))
    Incremental.refreshDistinctKmv(spark, ord.filter(col("dt") <= 199612),
      mv, "dt", Seq("k"), "member", k = 64)
    Incremental.refreshDistinctKmv(spark, ord, mv, "dt", Seq("k"), "member", k = 64)
    val viaMv = Incremental.queryDistinctKmv(spark, mv, Seq("k"), k = 64)
      .collect().map(r => r.getString(0) -> ((r.getInt(1), r.getLong(2), r.getDouble(3)))).toMap
    // the KMV semilattice makes incremental-merge == direct an IDENTITY,
    // not an approximation: same n_mins, same kth hash, same estimate
    val direct = graft.operators.Sketches.kmvDistinct(ord, col("member"),
      Seq(col("k")), k = 64)
      .collect().map(r => r.getString(0) -> ((r.getInt(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(viaMv == direct, "incremental KMV diverged from direct sketch")
    // and both track the exact distinct counts within KMV error bounds
    val exact = ord.groupBy("k").agg(count_distinct(col("member")).as("nd"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((k, (_, _, est)) <- viaMv) {
      val rel = math.abs(est - exact(k)) / exact(k).max(1L)
      assert(rel < 0.30, s"KMV estimate for $k off by ${rel * 100}%: $est vs ${exact(k)}")
    }
    // cube rollup: the ALL row re-takes bottom-k over every sketch
    val all = Incremental.queryDistinctKmvCube(spark, mv, Seq("k"), k = 64)
      .filter(col("k").isNull).collect().head.getDouble(3)
    val allExact = ord.select("member").distinct().count()
    assert(math.abs(all - allExact) / allExact < 0.30)
  }

  test("upsert: last-writer-wins merge that rewrites only touched partitions") {
    val dir = Files.createTempDirectory("graft-upsert-spec").toString + "/t"
    val base = Seq(
      (1L, 20240101, "a"), (2L, 20240101, "b"),
      (3L, 20240102, "c"), (4L, 20240103, "d")
    ).toDF("id", "dt", "v")
    base.write.partitionBy("dt").parquet(dir)
    def files(p: String) = new java.io.File(s"$dir/dt=$p").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(f => f.getName -> f.lastModified).toMap
    val before = files("20240103")
    // update id=1 in 20240101, insert id=9 into 20240102; 20240103 untouched
    val updates = Seq((1L, 20240101, "A2"), (9L, 20240102, "ins"))
      .toDF("id", "dt", "v")
    Incremental.upsert(spark, dir, updates, Seq("id"), "dt")
    val after = spark.read.parquet(dir).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2)))).toMap
    assert(after == Map(
      1L -> (("A2", 20240101)), 2L -> (("b", 20240101)),
      3L -> (("c", 20240102)), 9L -> (("ins", 20240102)),
      4L -> (("d", 20240103))))
    // the untouched partition's files are bit-for-bit the originals
    assert(files("20240103") == before, "untouched partition was rewritten")
    // no staging residue (staging paths are uniquely suffixed per call)
    assert(new java.io.File(dir).getParentFile.listFiles()
      .forall(!_.getName.contains("_upsert_staging")))
    // a key that moved partitions is caught by the stability verifier...
    val moved = Seq((4L, 20240101, "moved")).toDF("id", "dt", "v")
    val err = intercept[IllegalArgumentException](
      Incremental.upsert(spark, dir, moved, Seq("id"), "dt", verifyStability = true))
    assert(err.getMessage.contains("partition-stable"))
    // ...and the table is unchanged after the refused merge
    assert(spark.read.parquet(dir).count() == 5)
    // an empty delta is a clean no-op, not a schema-inference crash
    Incremental.upsert(spark, dir,
      spark.read.parquet(dir).limit(0), Seq("id"), "dt")
    assert(spark.read.parquet(dir).count() == 5)
  }

  test("upsert: duplicate-keyed updates without a seqCol fail loudly; with one, last seq wins") {
    val dir = Files.createTempDirectory("graft-upsert-dup").toString + "/t"
    Seq((1L, 20240101, "a")).toDF("id", "dt", "v").write.partitionBy("dt").parquet(dir)
    val dup = Seq((1L, 20240101, "x"), (1L, 20240101, "y")).toDF("id", "dt", "v")
    val err = intercept[IllegalArgumentException](
      Incremental.upsert(spark, dir, dup, Seq("id"), "dt"))
    assert(err.getMessage.contains("seqCol"))
    assert(spark.read.parquet(dir).collect().map(_.getString(1)).toSeq == Seq("a"))
    // same rows with a seq column: greatest seq per key wins
    val seqd = Seq((1L, 20240101, "x", 1L), (1L, 20240101, "y", 2L))
      .toDF("id", "dt", "v", "seq")
    Incremental.upsert(spark, dir, seqd, Seq("id"), "dt", seqCol = Some("seq"))
    assert(spark.read.parquet(dir).collect().map(_.getString(1)).toSeq == Seq("y"))
  }

  test("upsert CDC ops: deletes apply, in-batch I->D resolves by seq, emptied partition drops") {
    val dir = Files.createTempDirectory("graft-upsert-cdc").toString + "/t"
    val base = Seq(
      (1L, 20240101, "a"), (2L, 20240101, "b"),
      (3L, 20240102, "c"), (4L, 20240103, "d")
    ).toDF("id", "dt", "v")
    base.write.partitionBy("dt").parquet(dir)
    // delete id=2; update id=1; id=5 inserted then deleted IN-BATCH (seq
    // ordering must make the delete win); id=3 deleted — emptying 20240102
    val cdc = Seq(
      (1L, 20240101, "A2", "U", 10L),
      (2L, 20240101, "b", "D", 11L),
      (5L, 20240101, "ghost", "I", 12L),
      (5L, 20240101, "ghost", "D", 13L),
      (3L, 20240102, "c", "D", 14L)
    ).toDF("id", "dt", "v", "op", "seq")
    Incremental.upsert(spark, dir, cdc, Seq("id"), "dt",
      opCol = Some("op"), seqCol = Some("seq"))
    val after = spark.read.parquet(dir).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2)))).toMap
    assert(after == Map(1L -> (("A2", 20240101)), 4L -> (("d", 20240103))), after.toString)
    // the fully-deleted partition's directory is gone, not lingering
    assert(!new java.io.File(s"$dir/dt=20240102").exists(),
      "emptied partition directory survived the delete")
    // delete-then-reinsert across calls: the key comes back cleanly
    val back = Seq((2L, 20240101, "b2", "I", 20L)).toDF("id", "dt", "v", "op", "seq")
    Incremental.upsert(spark, dir, back, Seq("id"), "dt",
      opCol = Some("op"), seqCol = Some("seq"))
    val again = spark.read.parquet(dir).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(again == Map(1L -> "A2", 2L -> "b2", 4L -> "d"), again.toString)
  }

  test("upsert CDC: a delta that deletes EVERYTHING leaves a readable (empty-table) state") {
    val dir = Files.createTempDirectory("graft-upsert-allDel").toString + "/t"
    Seq((1L, 20240101, "a"), (2L, 20240101, "b")).toDF("id", "dt", "v")
      .write.partitionBy("dt").parquet(dir)
    val cdc = Seq((1L, 20240101, "a", "D", 1L), (2L, 20240101, "b", "D", 2L))
      .toDF("id", "dt", "v", "op", "seq")
    // must not die reading an empty staging dir; the emptied partition drops
    Incremental.upsert(spark, dir, cdc, Seq("id"), "dt",
      opCol = Some("op"), seqCol = Some("seq"))
    assert(!new java.io.File(s"$dir/dt=20240101").exists())
    // no staging residue even on the empty path
    assert(new java.io.File(dir).getParentFile.listFiles()
      .forall(!_.getName.contains("_upsert_staging")))
  }

  test("upsert CDC: null partition value merges, keeps rows, and drops when emptied") {
    val dir = Files.createTempDirectory("graft-upsert-nullpart").toString + "/t"
    // ids 1,2 live in the NULL partition (__HIVE_DEFAULT_PARTITION__),
    // id 3 in a real one
    val base = Seq((1L, None: Option[String], "a"), (2L, None, "b"),
      (3L, Some("2024-01-01"), "c")).toDF("id", "dt", "v")
    base.write.partitionBy("dt").parquet(dir)
    assert(new java.io.File(s"$dir/dt=__HIVE_DEFAULT_PARTITION__").exists())
    // update id=1 in the null partition: id=2 (same partition, untouched
    // key) MUST survive — isin()-based membership silently drops it
    val upd = Seq((1L, None: Option[String], "A2", "U", 10L))
      .toDF("id", "dt", "v", "op", "seq")
    Incremental.upsert(spark, dir, upd, Seq("id"), "dt",
      opCol = Some("op"), seqCol = Some("seq"))
    val after = spark.read.parquet(dir).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(after == Map(1L -> "A2", 2L -> "b", 3L -> "c"), after.toString)
    // now delete both null-partition rows: the __HIVE_DEFAULT_PARTITION__
    // directory must be dropped (a "dt=null" leaf would never match)
    val del = Seq((1L, None: Option[String], "A2", "D", 20L),
      (2L, None, "b", "D", 21L)).toDF("id", "dt", "v", "op", "seq")
    Incremental.upsert(spark, dir, del, Seq("id"), "dt",
      opCol = Some("op"), seqCol = Some("seq"))
    assert(!new java.io.File(s"$dir/dt=__HIVE_DEFAULT_PARTITION__").exists(),
      "emptied null partition directory survived the delete")
    val fin = spark.read.parquet(dir).collect().map(_.getLong(0)).toSet
    assert(fin == Set(3L), fin.toString)
  }

  test("snapshotDiff classifies added/removed/changed/unchanged incl. null payloads") {
    val prev = Seq((1L, Some("a"), 10.0), (2L, Some("b"), 20.0),
      (3L, None, 30.0), (4L, Some("d"), 40.0)).toDF("k", "s", "v")
    val next = Seq((2L, Some("b"), 20.0), (3L, None, 30.0),
      (4L, Some("D"), 40.0), (5L, Some("e"), 50.0)).toDF("k", "s", "v")
    val out = Incremental.snapshotDiff(prev, next, Seq("k")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // 1 vanished, 5 appeared, 4's payload changed, 3's null payload is
    // null-safe-equal → unchanged
    assert(out == Map(1L -> "removed", 2L -> "unchanged", 3L -> "unchanged",
      4L -> "changed", 5L -> "added"), out.toString)
    // explicit compareCols restrict the change test: ignoring s, 4 is unchanged
    val onlyV = Incremental.snapshotDiff(prev, next, Seq("k"), Seq("v")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(onlyV(4L) == "unchanged")
  }

  test("legacy batch marker: canonicalized match rewrites the marker in canonical form") {
    val dir = Files.createTempDirectory("graft-marker").toString
    val mv = s"$dir/mv"
    new java.io.File(mv).mkdirs()
    val ckptCanonical = Incremental.canonicalCheckpoint(spark, s"$dir/ckpt")
    // fabricate a pre-canonicalCheckpoint marker: same path, NON-canonical
    // spelling (no scheme). It must read as the SAME lineage...
    val raw = s"$dir/ckpt\n7"
    java.nio.file.Files.write(java.nio.file.Paths.get(mv, "_graft_last_batch"),
      raw.getBytes("UTF-8"))
    assert(Incremental.lastMergedBatch(spark, mv, s"$dir/ckpt") == 7L)
    // ...and the read must have REWRITTEN the marker canonically, so a
    // driver restarted from a different cwd can match it exactly instead
    // of re-canonicalizing a relative spelling against the wrong base
    val stored = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(mv, "_graft_last_batch")), "UTF-8")
    assert(stored == s"$ckptCanonical\n7", stored)
    // exact-match reads (the steady state) do not rewrite: content stable
    assert(Incremental.lastMergedBatch(spark, mv, s"$dir/ckpt") == 7L)
    // a genuinely different checkpoint still reads as a foreign lineage
    assert(Incremental.lastMergedBatch(spark, mv, s"$dir/other") == -1L)
    // ...and the foreign read must NOT clobber the stored marker
    val after = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(mv, "_graft_last_batch")), "UTF-8")
    assert(after == s"$ckptCanonical\n7", after)
    // the atomic temp-then-rename write leaves no droppings behind
    val leftovers = new java.io.File(mv).listFiles()
      .map(_.getName).filter(_.endsWith(".tmp"))
    assert(leftovers.isEmpty, leftovers.mkString(","))
  }
}
