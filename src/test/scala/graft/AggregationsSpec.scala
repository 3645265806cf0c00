package graft

import org.apache.spark.sql.functions._

import graft.operators.Aggregations

/** Mirrors the reference's TestAggregators coverage (exact values over
  * inline fixtures) — reference: operator/aggregate/AggregationType.java:20-31.
  */
class AggregationsSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq(
    ("a", 1, 10.0), ("a", 2, 20.0), ("a", 2, 30.0),
    ("b", 5, 5.0)).toDF("k", "i", "d")

  test("GROUP BY with the full aggregate set") {
    val out = Aggregations.groupBy(df, Seq("k"), Seq(
      ("SUM", col("d"), "s"), ("COUNT", lit(1), "n"), ("MIN", col("i"), "mn"),
      ("MAX", col("i"), "mx"), ("COUNT_DISTINCT", col("i"), "nd"),
      ("BITWISE_OR", col("i"), "bor"), ("MEDIAN", col("d"), "med")))
      .collect().map(r => r.getString(0) -> r).toMap
    val a = out("a")
    assert(a.getDouble(1) == 60.0 && a.getLong(2) == 3 && a.getInt(3) == 1 &&
      a.getInt(4) == 2 && a.getLong(5) == 2 && a.getInt(6) == 3 && a.getDouble(7) == 20.0)
    val b = out("b")
    assert(b.getDouble(1) == 5.0 && b.getLong(2) == 1)
  }

  test("GROUP BY ALL aggregates the whole relation (GroupByOperator.java:85-89)") {
    val out = Aggregations.groupByAll(df, Seq(("SUM", col("d"), "s"), ("COUNT", lit(1), "n"))).collect().head
    assert(out.getDouble(0) == 65.0 && out.getLong(1) == 4)
  }

  test("COUNT_TO_ONE emits 1 per group and SUM-rolls-up to a group count") {
    val one = Aggregations.groupBy(df, Seq("k"), Seq(("COUNT_TO_ONE", lit(1), "o")))
    assert(one.collect().forall(_.getLong(1) == 1L))
    assert(one.agg(org.apache.spark.sql.functions.sum("o")).collect().head.getLong(0)
      == df.select("k").distinct().count())
  }

  test("SEQNO numbers rows sequentially within each partition") {
    val n = Seq(1, 2, 3, 4, 5, 6).toDF("x").repartition(2)
      .select(graft.functions.Builtins.seqNo().as("s")).collect().map(_.getInt(0))
    assert(n.count(_ == 1) == 2) // two partitions, each starts at 1
    assert(n.max <= 6 && n.min == 1)
  }

  test("BAG collects values sorted for determinism (ArrayListAggregation.java:35)") {
    val out = Aggregations.groupBy(df, Seq("k"), Seq(("BAG", col("i"), "bag")))
      .filter($"k" === "a").collect().head.getSeq[Int](1)
    assert(out == Seq(1, 2, 2))
  }

  test("exact percentile matches hand computation (ExtractMedianOperator semantics)") {
    val vals = Seq(1.0, 2.0, 3.0, 4.0).toDF("v")
    val p = vals.agg(Aggregations.exactPercentile(col("v"), 0.5).as("p")).collect().head.getDouble(0)
    assert(p == 2.5)
  }

  test("PresenceBitmapUDAF semantics: one bit per present day (PresenceBitmapUDAF.java:81)") {
    val ev = Seq(
      (1L, "2024-01-01 10:00:00"), (1L, "2024-01-03 09:00:00"), (1L, "2024-01-03 23:00:00"),
      (2L, "2024-01-02 00:00:00")).toDF("user_id", "ts_s")
      .withColumn("ts", $"ts_s".cast("timestamp"))
    val out = ev.groupBy("user_id")
      .agg(Aggregations.presenceBitmap($"ts", lit("2024-01-01")).as("bm"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1L) == ((1L << 0) | (1L << 2))) // days 0 and 2
    assert(out(2L) == (1L << 1))
  }

  test("user Aggregator registers and runs (UDAFOperatorAdapter.java:26)") {
    import org.apache.spark.sql.expressions.Aggregator
    import org.apache.spark.sql.{Encoder, Encoders}
    val geoMean = new Aggregator[Double, (Double, Long), Double] {
      def zero = (0.0, 0L)
      def reduce(b: (Double, Long), a: Double) = (b._1 + math.log(a), b._2 + 1)
      def merge(x: (Double, Long), y: (Double, Long)) = (x._1 + y._1, x._2 + y._2)
      def finish(r: (Double, Long)) = math.exp(r._1 / r._2)
      def bufferEncoder: Encoder[(Double, Long)] = Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
      def outputEncoder: Encoder[Double] = Encoders.scalaDouble
    }
    Aggregations.registerUdaf(spark, "geo_mean", geoMean)
    val out = Seq(1.0, 100.0).toDF("v").selectExpr("geo_mean(v)").collect().head.getDouble(0)
    assert(math.abs(out - 10.0) < 1e-9)
  }

  test("heavyHitters returns exact counts and shares above the threshold") {
    val toks = Seq.fill(6)("a") ++ Seq.fill(3)("b") ++ Seq("c")
    val out = Aggregations.heavyHitters(toks.toDF("t"), col("t"), minShare = 0.25)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out == Map("a" -> (6L, 0.6), "b" -> (3L, 0.3)))
  }

  test("countDistinctSkewProof equals count_distinct and dedups pre-shuffle") {
    val ev = sf("events")
    val fast = Aggregations.countDistinctSkewProof(ev, Seq("event_type"), col("user_id"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val ref = ev.groupBy("event_type").agg(count_distinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(fast == ref)
    // two aggregates: the first keyed by (keys, value) so a hot key's
    // values spread over all shuffle partitions
    val aggs = Aggregations.countDistinctSkewProof(ev, Seq("event_type"), col("user_id"))
      .queryExecution.executedPlan.toString
      .linesIterator.count(_.contains("HashAggregate"))
    assert(aggs >= 4, "expected two partial+final aggregate pairs")
  }

  test("profile reports per-column rows/nulls/distinct/min/max in one pass") {
    val df = Seq((Some(1), Some("x")), (Some(1), None), (None, Some("a")))
      .toDF("i", "s")
    val out = Aggregations.profile(df, Seq("i", "s"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5))).toMap
    assert(out("i") == (3L, 1L, 1L, "1", "1"))
    assert(out("s") == (3L, 1L, 2L, "a", "x"))
    // one scan: a single leaf in the plan despite profiling two columns
    val scans = Aggregations.profile(df, Seq("i", "s"))
      .queryExecution.optimizedPlan.collectLeaves().size
    assert(scans == 1)
  }

  test("linearTrend: exact slope/intercept on a known line, null under-determined") {
    // y = 2x + 3 exactly; micro-quantization is lossless on these values
    val pts = Seq(("a", 0L, 3.0), ("a", 1L, 5.0), ("a", 2L, 7.0),
      ("b", 5L, 1.0), ("b", 5L, 9.0)).toDF("k", "x", "y")
    val out = Aggregations.linearTrend(pts, Seq("k"), "x", "y").collect()
      .map(r => r.getString(0) -> r).toMap
    val a = out("a")
    assert(a.getAs[Long]("n") == 3L)
    assert(math.abs(a.getAs[Double]("slope") - 2.0) < 1e-9, a.toString)
    assert(math.abs(a.getAs[Double]("intercept") - 3.0) < 1e-9, a.toString)
    // a single distinct x cannot determine a slope
    assert(out("b").isNullAt(out("b").fieldIndex("slope")))
  }

  test("linearTrend survives microsecond-epoch x without decimal overflow") {
    // x ~1.7e18: pre-rebase Σx² terms are ~3e36, which overflowed
    // decimal(38,0) after a few dozen rows and silently nulled the slope
    val base = 1700000000000000000L
    val rows = (0 until 200).map(i => ("t", base + i * 1000000L, 4.0 + 0.5 * i))
    val out = Aggregations.linearTrend(rows.toDF("k", "x", "y"),
        Seq("k"), "x", "y").collect().head
    assert(out.getAs[Long]("n") == 200L)
    // y rises 0.5 per 1e6 x-units
    assert(math.abs(out.getAs[Double]("slope") - 0.5e-6) < 1e-15, out.toString)
    // intercept is in original x coordinates: y(0) = 4 − base·slope
    val expected = 4.0 - base * 0.5e-6
    // |expected| ≈ 8.5e11, so 1e-2 absolute ≈ 1e-14 relative — tight for
    // doubles at this magnitude, loud for any sign/order bug
    assert(math.abs(out.getAs[Double]("intercept") - expected) < 1e-2, out.toString)
  }

  test("distributionDrift: exact TV mass, proportions, PSI sign; missing buckets fill") {
    import graft.operators.Aggregations
    // base: 60/30/10 over buckets 0/1/2; current: 30/30/0 + new bucket 3 (40)
    val base = (Seq.fill(60)(0) ++ Seq.fill(30)(1) ++ Seq.fill(10)(2)).toDF("b")
    val cur = (Seq.fill(30)(0) ++ Seq.fill(30)(1) ++ Seq.fill(40)(3)).toDF("b")
    val out = Aggregations.distributionDrift(base, cur, col("b"))
      .collect().map(r => r.getAs[Int]("bucket") -> r).toMap
    assert(out.keySet == Set(0, 1, 2, 3))
    // totals 100/100: tv_num = |a*100 - b*100|
    assert(out(0).getAs[Long]("tv_num") == 3000)
    assert(out(1).getAs[Long]("tv_num") == 0)
    assert(out(2).getAs[Long]("tv_num") == 1000)
    assert(out(3).getAs[Long]("tv_num") == 4000)
    // total TV = sum/(2AB) = 8000/20000 = 0.4 exactly
    val tv = out.values.map(_.getAs[Long]("tv_num")).sum.toDouble /
      (2.0 * out(0).getAs[Long]("total_base") * out(0).getAs[Long]("total_cur"))
    assert(tv == 0.4)
    assert(out(2).getAs[Long]("n_cur") == 0L && out(3).getAs[Long]("n_base") == 0L)
    assert(out(0).getAs[Double]("p_base") == 0.6 && out(0).getAs[Double]("p_cur") == 0.3)
    // PSI terms: shrunk bucket negative? (q-p)ln(q/p): q<p -> positive product
    assert(out(0).getAs[Double]("psi_term") > 0)   // moved mass away
    assert(out(1).getAs[Double]("psi_term") == 0.0) // unchanged
    assert(out(3).getAs[Double]("psi_term") > 0)   // new mass appeared
  }

  test("benford: power-law values fit the law; uniform fabricated values deviate") {
    import graft.operators.Aggregations
    // log-uniform magnitudes 1..10^5: classic Benford-conformant
    val rnd = new scala.util.Random(11)
    val natural = Seq.fill(20000)(math.pow(10.0, rnd.nextDouble() * 5).toLong)
      .filter(_ >= 1).toDF("v")
    val nat = Aggregations.benford(natural, col("v")).collect()
      .map(r => r.getInt(0) -> r).toMap
    assert(nat.keySet == (1 to 9).toSet)
    val natTv = nat.values.map(_.getAs[Long]("dev_num")).sum.toDouble /
      (nat(1).getAs[Long]("total").toDouble * 1e9)
    assert(natTv < 0.05, s"natural data deviates $natTv from Benford")
    // digit-1 share ~ 30.1%
    assert(math.abs(nat(1).getAs[Double]("share") - 0.301) < 0.02)
    // uniform 100..999 (fabricated-looking): every digit ~1/9 -> big deviation
    val flat = (100L to 999L).toDF("v")
    val f = Aggregations.benford(flat, col("v")).collect().map(r => r.getInt(0) -> r).toMap
    val flatTv = f.values.map(_.getAs[Long]("dev_num")).sum.toDouble /
      (f(1).getAs[Long]("total").toDouble * 1e9)
    assert(flatTv > 0.25, s"uniform data should deviate, got $flatTv")
    assert(f.values.forall(_.getAs[Long]("n") == 100L))
    // zeros and negatives: zero excluded, sign ignored, missing digits fill
    val edge = Seq(0L, -200L, 300L, 0L).toDF("v")
    val e = Aggregations.benford(edge, col("v")).collect().map(r => r.getInt(0) -> r).toMap
    assert(e(2).getAs[Long]("n") == 1L && e(3).getAs[Long]("n") == 1L)
    assert(e(7).getAs[Long]("n") == 0L && e(1).getAs[Long]("total") == 2L)
  }
}
