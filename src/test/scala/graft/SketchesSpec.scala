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
}
