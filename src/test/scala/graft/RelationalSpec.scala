package graft

import org.apache.spark.sql.functions._

import graft.operators.Relational

/** Per-operator unit tests in the style of the reference's TestOperators
  * (src/test/java/com/linkedin/cubert/operator/TestOperators.java) — inline
  * fixtures, asserted outputs — but over local SparkSession DataFrames.
  */
class RelationalSpec extends SparkSpec {
  import spark.implicits._

  test("DUPLICATE emits N copies with 1..N counter (DuplicateOperator.java:35)") {
    val df = Seq(("a", 1), ("b", 2)).toDF("k", "v")
    val out = Relational.duplicate(df, 3, Some("c")).collect()
    assert(out.length == 6)
    val counters = out.map(r => (r.getString(0), r.getLong(2))).toSet
    assert(counters == Set(("a", 1L), ("a", 2L), ("a", 3L), ("b", 1L), ("b", 2L), ("b", 3L)))
  }

  test("DUPLICATE without counter keeps schema") {
    val df = Seq(("a", 1)).toDF("k", "v")
    val out = Relational.duplicate(df, 2)
    assert(out.columns.toSeq == Seq("k", "v"))
    assert(out.count() == 2)
  }

  test("FLATTEN TUPLE splats struct columns (FlattenBagOperator TUPLE)") {
    val df = Seq((1, ("x", 10))).toDF("id", "s")
    val out = Relational.flattenTuple(df, "s")
    assert(out.columns.toSeq == Seq("id", "_1", "_2"))
    assert(out.collect().head.toSeq == Seq(1, "x", 10))
  }

  test("FLATTEN BAG explodes; outer keeps empty bags (FlattenBagOperator BAG)") {
    val df = Seq((1, Seq("a", "b")), (2, Seq.empty[String])).toDF("id", "bag")
    assert(Relational.flattenBag(df, "bag", "el").count() == 2)
    val outer = Relational.flattenBag(df, "bag", "el", outer = true)
    assert(outer.count() == 3)
    assert(outer.filter($"id" === 2).collect().head.isNullAt(1))
  }

  test("FLATTEN BAG_TUPLE explodes a bag of structs into columns") {
    val df = Seq((1, Seq(("a", 10), ("b", 20)))).toDF("id", "bag")
    val out = Relational.flattenBagTuple(df, "bag")
    assert(out.columns.toSeq == Seq("id", "_1", "_2"))
    assert(out.count() == 2)
  }

  test("GATHER is bag-semantics union (GatherOperator.java:29)") {
    val a = Seq(1, 2).toDF("x"); val b = Seq(2, 3).toDF("x")
    assert(Relational.gather(a, b).count() == 4) // keeps duplicates
  }

  test("TEE WITH SPLIT removes teed rows from main flow (TeeOperator.java:33)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-tee").toString
    val df = Seq(1, 2, 3, 4, 5).toDF("x")
    val main = Relational.teeWithSplit(df, $"x" >= 4, s"$dir/side")
    assert(main.collect().map(_.getInt(0)).sorted.toSeq == Seq(1, 2, 3))
    assert(spark.read.parquet(s"$dir/side").count() == 2)
  }

  test("INTERSECT/EXCEPT round out the set ops") {
    val a = Seq(1, 2, 3).toDF("x"); val b = Seq(2, 3, 4).toDF("x")
    assert(Relational.intersect(a, b).collect().map(_.getInt(0)).sorted.toSeq == Seq(2, 3))
    assert(Relational.except(a, b).collect().map(_.getInt(0)).toSeq == Seq(1))
  }

  test("SHUFFLE repartitions on keys and sorts within partitions (CubertPartitioner.java:39)") {
    val df = sf("lineitem")
    val out = Relational.shuffle(df, Seq(col("l_orderkey")), Seq(col("l_orderkey"), col("l_linenumber")))
    assert(out.rdd.getNumPartitions > 0)
    // within-partition sortedness on the sort keys
    val ok = out.select("l_orderkey", "l_linenumber").rdd.mapPartitions { it =>
      val rows = it.map(r => (r.getLong(0), r.getInt(1))).toSeq
      Iterator.single(rows == rows.sorted)
    }.collect()
    assert(ok.forall(identity))
  }

  test("sortBlock sorts within partitions only, like the reference SORT") {
    val df = spark.range(100).select((col("id") * 37 % 100).as("v"))
      .repartition(4, col("v") % 4)
    val sorted = Relational.sortBlock(df, col("v"))
    // every partition is internally sorted...
    val ok = sorted.rdd.mapPartitions { it =>
      val vs = it.map(_.getLong(0)).toSeq
      Iterator.single(vs == vs.sorted)
    }.collect()
    assert(ok.forall(identity))
    // ...and partition boundaries are preserved (no global exchange)
    assert(sorted.rdd.getNumPartitions == 4)
  }

  test("skyline: exact Pareto frontier, ties survive, nulls dropped") {
    val pts = Seq((1, 5), (5, 1), (3, 3), (2, 2), (0, 6), (5, 1))
      .toDF("x", "y")
    // max-max: (2,2) is dominated by (3,3); the duplicate (5,1) pair survives
    val mm = Relational.skyline(pts, maxCols = Seq("x", "y"))
      .collect().map(r => (r.getInt(0), r.getInt(1))).sorted
    assert(mm.toSeq == Seq((0, 6), (1, 5), (3, 3), (5, 1), (5, 1)), mm.toSeq)
    // max x, min y: (5,1) dominates everything else
    val mx = Relational.skyline(pts, maxCols = Seq("x"), minCols = Seq("y"))
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    assert(mx == Set((5, 1)))
    // a null dimension drops the row
    val withNull = pts.unionAll(Seq((9, 9)).toDF("x", "y")
      .select(col("x"), lit(null).cast("int").as("y")))
    val nn = Relational.skyline(withNull, maxCols = Seq("x", "y"))
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    assert(nn == Set((0, 6), (1, 5), (3, 3), (5, 1)))
    // three dimensions against a brute-force reference
    val p3 = Seq((1, 1, 9), (2, 2, 2), (9, 1, 1), (1, 9, 1), (3, 3, 3), (2, 3, 3))
      .toDF("x", "y", "z")
    val got = Relational.skyline(p3, maxCols = Seq("x", "y", "z"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2))).toSet
    val all = Seq((1, 1, 9), (2, 2, 2), (9, 1, 1), (1, 9, 1), (3, 3, 3), (2, 3, 3))
    val brute = all.filter(a => !all.exists(b =>
      b._1 >= a._1 && b._2 >= a._2 && b._3 >= a._3 &&
        (b._1 > a._1 || b._2 > a._2 || b._3 > a._3))).toSet
    assert(got == brute, s"got $got expected $brute")
  }

  test("skyline: partitioned refine matches broadcast refine on an anti-correlated band") {
    // x + y == const → every distinct point is on the frontier, the worst
    // case for the band (band == input). Force the fallback with a tiny
    // maxBroadcastPts and check it against the broadcast path + brute force.
    val n = 500
    val pts = spark.range(n).selectExpr("cast(id as int) as x",
      s"cast($n - id as int) as y")
      // plus some strictly-dominated interior points
      .unionAll(spark.range(100).selectExpr("cast(id as int) as x",
        "cast(id as int) as y"))
    val viaBroadcast = Relational.skyline(pts, maxCols = Seq("x", "y"))
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    val viaPartitioned = Relational.skyline(pts, maxCols = Seq("x", "y"),
        maxBroadcastPts = 10)
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    // every interior point (i,i), i<=99, is dominated by (i, n-i);
    // the anti-correlated diagonal is a pure antichain
    val frontier = (0 until n).map(i => (i, n - i)).toSet
    assert(viaBroadcast == frontier)
    assert(viaPartitioned == frontier)
    // and with a min dimension through the fallback too
    val minVia = Relational.skyline(pts, maxCols = Seq("x"), minCols = Seq("y"),
        maxBroadcastPts = 10)
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    // (n-1, 1) dominates every other anti-correlated point; (0, 0) survives
    // because nothing has y <= 0 with larger x
    assert(minVia == Set((n - 1, 1), (0, 0)))
  }
}
