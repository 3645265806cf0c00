package graft

import org.apache.spark.sql.functions._

import graft.operators.CubeOps

/** CUBE semantics vs brute-force expectations, in the spirit of the
  * reference's TestOLAPCube.validate() (TestOLAPCube.java:57-151).
  */
class CubeOpsSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq(
    ("x", "p", 1, 10), ("x", "q", 2, 20), ("y", "p", 3, 30), ("y", "p", 3, 40))
    .toDF("d1", "d2", "m", "u")

  test("full CUBE emits all 2^n grouping sets (CubeDimensions.java:141-145)") {
    val out = CubeOps.cube(df, Seq("d1", "d2"), Seq(("SUM", col("m"), "s"), ("COUNT", lit(1), "n")))
    // grouping sets: (d1,d2)=3 combos present, (d1)=2, (d2)=2, ()=1 → 8 rows
    assert(out.count() == 8)
    val grand = out.filter($"d1".isNull && $"d2".isNull).collect().head
    assert(grand.getAs[Long]("s") == 9 && grand.getAs[Long]("n") == 4)
  }

  test("ROLLUP emits prefix sets only") {
    val out = CubeOps.rollup(df, Seq("d1", "d2"), Seq(("COUNT", lit(1), "n")))
    assert(out.count() == 3 + 2 + 1) // (d1,d2) combos, (d1), ()
  }

  test("GROUPING SETS compiles explicit set lists (grammar :136)") {
    val out = CubeOps.groupingSets(df, Seq("d1", "d2"),
      Seq(Seq("d1"), Seq()), Seq("count(1) AS n"))
    assert(out.count() == 2 + 1)
  }

  test("GROUPING COMBOS n enumerates subsets of size <= n (grammar :138)") {
    val out = CubeOps.groupingCombos(df, Seq("d1", "d2"), 1, Seq("count(1) AS n"))
    assert(out.count() == 1 + 2 + 2) // (), (d1), (d2)
  }

  test("CUBE with exact count-distinct (CountDistinctCubeAggregator.java:25)") {
    val out = CubeOps.cubeCountDistinct(df, Seq("d1"), "u", "nd")
    val m = out.collect().map(r => Option(r.getString(0)).getOrElse("ALL") -> r.getLong(1)).toMap
    assert(m == Map("x" -> 2L, "y" -> 2L, "ALL" -> 4L))
  }

  test("approx count-distinct cube tracks the exact cube within rsd tolerance") {
    val ord = sf("orders")
    val exact = CubeOps.cubeCountDistinct(ord, Seq("o_orderstatus"), "o_custkey", "nd")
      .collect().map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    val approx = CubeOps.cubeApproxCountDistinct(ord, Seq("o_orderstatus"), "o_custkey", "nd")
      .collect().map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    exact.foreach { case (k, v) =>
      assert(math.abs(approx(k) - v) <= math.max(3, 0.15 * v), s"key=$k exact=$v approx=${approx(k)}")
    }
  }

  test("duple [MAX, SUM] computes inner agg per grouping-set ∪ inner (DupleCubeAggregator.java:33)") {
    // fixture where the inner key m=3 spans both d1 values — the case that
    // distinguishes the correct rewrite (re-group inner per grouping set)
    // from the naive pre-agg per (all dims ∪ inner)
    val d = Seq(("x", 1, 10), ("x", 3, 5), ("y", 3, 70)).toDF("d1", "m", "u")
    val out = CubeOps.dupleCube(d, Seq("d1"), Seq("m"), "max", "sum(u)", "mx")
    val m = out.collect().map(r => Option(r.getString(0)).getOrElse("ALL") -> r.getLong(1)).toMap
    // d1=x: m-groups {1→10, 3→5} → 10; d1=y: {3→70} → 70
    // grand total: m-groups over ALL rows {1→10, 3→75} → 75
    // (naive pre-agg per (d1,m) would give max(10,5,70)=70 — wrong)
    assert(m == Map("x" -> 10L, "y" -> 70L, "ALL" -> 75L))
  }

  test("additive pre-agg cube equals direct cube (scale path)") {
    val direct = CubeOps.cube(df, Seq("d1", "d2"), Seq(("COUNT", lit(1), "n_rows"), ("SUM", col("m"), "s")))
      .withColumn("n_rows", col("n_rows")).orderBy("d1", "d2")
    val pre = CubeOps.additiveCubePreAgg(df, Seq("d1", "d2"), Seq((col("m"), "s")))
      .orderBy("d1", "d2")
    val d = direct.select("d1", "d2", "n_rows", "s").collect().toSeq
    val p = pre.select("d1", "d2", "n_rows", "s").collect().toSeq
    assert(d == p)
  }

  test("approx percentile cube tracks the exact per-group median closely") {
    val ord = sf("orders")
    val approx = CubeOps.cubeApproxPercentile(ord, Seq("o_orderstatus"),
      "o_totalprice", percentage = 0.5, as = "p50")
      .collect().map(r => Option(r.getString(0)).getOrElse("ALL") -> r.getDouble(1)).toMap
    val exact = ord.groupBy("o_orderstatus")
      .agg(expr("percentile(o_totalprice, 0.5)").as("p50"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    exact.foreach { case (k, v) =>
      assert(math.abs(approx(k) - v) / v < 0.02, s"$k: approx ${approx(k)} vs exact $v")
    }
    // the rollup rows exist too (cube shape preserved)
    assert(approx.contains("ALL"))
  }
}
