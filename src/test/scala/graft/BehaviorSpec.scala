package graft

import org.apache.spark.sql.functions._

import graft.operators.Behavior

/** Behavioral analytics: strictly-ordered funnels (later steps only count
  * AFTER the previous step's first completion) and cohort retention.
  */
class BehaviorSpec extends SparkSpec {
  import spark.implicits._

  private val ev = Seq(
    // u1 completes the full funnel in order
    (1L, 10L, "view"), (1L, 20L, "click"), (1L, 30L, "purchase"),
    // u2: purchase BEFORE the first click — must not count; depth 2
    (2L, 10L, "view"), (2L, 15L, "purchase"), (2L, 20L, "click"),
    // u3: click precedes the first view — depth 1 (view only)
    (3L, 20L, "view"), (3L, 10L, "click"),
    // u4: never views — absent from the funnel frontier
    (4L, 10L, "click"), (4L, 20L, "purchase"),
    // u5: second view→click pair; first-completion times must win
    (5L, 10L, "view"), (5L, 12L, "click"), (5L, 40L, "view"), (5L, 50L, "click")
  ).toDF("user_id", "ts", "event_type")

  test("funnel enforces step order and first-completion times") {
    val out = Behavior.funnel(ev, "user_id", "ts", Seq(
        col("event_type") === "view", col("event_type") === "click",
        col("event_type") === "purchase"))
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)), Option(r.get(2)), Option(r.get(3)), r.getLong(4))).toMap
    assert(out(1L) == ((Some(10L), Some(20L), Some(30L), 3L)))
    assert(out(2L) == ((Some(10L), Some(20L), None, 2L)), "pre-click purchase counted")
    assert(out(3L) == ((Some(20L), None, None, 1L)), "pre-view click counted")
    assert(!out.contains(4L), "never-viewed user in frontier")
    assert(out(5L) == ((Some(10L), Some(12L), None, 2L)), "not first completion")
  }

  test("funnelSinglePass reproduces the k-join funnel, including edge users") {
    val steps = Seq(
      col("event_type") === "view", col("event_type") === "click",
      col("event_type") === "purchase")
    val viaJoins = Behavior.funnel(ev, "user_id", "ts", steps)
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)), Option(r.get(2)), Option(r.get(3)), r.getLong(4))).toMap
    val viaFold = Behavior.funnelSinglePass(ev, "user_id", "ts", steps)
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)), Option(r.get(2)), Option(r.get(3)), r.getLong(4))).toMap
    assert(viaFold == viaJoins)
    // a same-timestamp view+click pair must not complete two steps at once
    val tied = Seq((9L, 10L, "view"), (9L, 10L, "click"), (9L, 20L, "click"))
      .toDF("user_id", "ts", "event_type")
    val t = Behavior.funnelSinglePass(tied, "user_id", "ts", steps)
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)), Option(r.get(2)), r.getLong(4))).toMap
    assert(t(9L) == ((Some(10L), Some(20L), 2L)))
    // one event satisfying two consecutive predicates can only advance one
    val both = Seq((7L, 10L, "view"), (7L, 20L, "any"))
      .toDF("user_id", "ts", "event_type")
    val b = Behavior.funnelSinglePass(both, "user_id", "ts", Seq(
        col("event_type").isin("view", "any"), col("event_type") === "any",
        col("event_type") === "any"))
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)), Option(r.get(2)), Option(r.get(3)), r.getLong(4))).toMap
    // t0=10 (view); the ts=20 'any' sets t1=20 but cannot also set t2
    assert(b(7L) == ((Some(10L), Some(20L), None, 2L)))
  }

  test("conversion window bounds later steps from the first step-0 touch") {
    val e = Seq(
      // u1: click at +15 inside a 20-window; purchase at +25 outside it
      (1L, 10L, "view"), (1L, 25L, "click"), (1L, 35L, "purchase"),
      // u2: everything inside the window
      (2L, 10L, "view"), (2L, 15L, "click"), (2L, 25L, "purchase"),
      // u3: a SECOND view inside-window does not re-anchor the funnel
      (3L, 10L, "view"), (3L, 100L, "view"), (3L, 105L, "click")
    ).toDF("user_id", "ts", "event_type")
    val steps = Seq(col("event_type") === "view", col("event_type") === "click",
      col("event_type") === "purchase")
    for (fn <- Seq(
        Behavior.funnel(e, "user_id", "ts", steps, maxSpan = Some(20L)),
        Behavior.funnelSinglePass(e, "user_id", "ts", steps, maxSpan = Some(20L)))) {
      val out = fn.collect().map(r => r.getLong(0) ->
        (Option(r.get(1)), Option(r.get(2)), Option(r.get(3)), r.getLong(4))).toMap
      assert(out(1L) == ((Some(10L), Some(25L), None, 2L)), out.toString)
      assert(out(2L) == ((Some(10L), Some(15L), Some(25L), 3L)), out.toString)
      assert(out(3L) == ((Some(10L), None, None, 1L)), out.toString)
    }
  }

  test("funnelCounts histograms completion depth") {
    val counts = Behavior.funnelCounts(ev, "user_id", "ts", Seq(
        col("event_type") === "view", col("event_type") === "click",
        col("event_type") === "purchase"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts == Map(3L -> 1L, 2L -> 2L, 1L -> 1L))
  }

  test("seasonal profile folds time onto the period; anomalies flag per-phase outliers") {
    // period 100, bucket 50 → 2 phases. Phase 0 values cluster at 10,
    // phase 1 at 100 — except one wild row in each phase.
    val rows = Seq(
      (1L, "m", 0L, 10L), (2L, "m", 110L, 11L), (3L, "m", 210L, 9L),
      (4L, "m", 310L, 10L), (5L, "m", 410L, 60L), // the phase-0 outlier
      (6L, "m", 60L, 100L), (7L, "m", 160L, 101L), (8L, "m", 260L, 99L),
      (9L, "m", 360L, 100L)
    ).toDF("id", "k", "ts", "qv")
    val prof = Behavior.seasonalProfile(rows, Seq("k"), "ts", "qv",
        periodUs = 100L, bucketUs = 50L)
      .collect().map(r => r.getLong(1) -> ((r.getLong(2), r.getDouble(3)))).toMap
    assert(prof(0L)._1 == 5L && prof(1L)._1 == 4L)
    assert(prof(0L)._2 == 20.0) // (10+11+9+10+60)/5
    assert(prof(1L)._2 == 100.0)
    val anom = Behavior.seasonalAnomalies(rows, Seq("k"), "ts", "qv",
        periodUs = 100L, bucketUs = 50L, cutoff = 1.5)
      .collect().map(_.getAs[Long]("id")).toSet
    assert(anom == Set(5L), s"got $anom")
    // a 1-row phase can never be flagged (no variance to deviate from)
    val solo = Seq((1L, "s", 0L, 7L)).toDF("id", "k", "ts", "qv")
    assert(Behavior.seasonalAnomalies(solo, Seq("k"), "ts", "qv", 100L, 50L).count() == 0)
  }

  test("kaplanMeier: censored subjects stay at risk without counting as events") {
    // durations/events: 1+, 2c, 3+, 3+, 4c  (+ = event, c = censored)
    val subjects = Seq(
      ("x", 1L, 1L), ("x", 2L, 0L), ("x", 3L, 1L), ("x", 3L, 1L), ("x", 4L, 0L)
    ).toDF("cohort", "dur", "ev")
    val km = Behavior.kaplanMeier(subjects, Seq("cohort"), "dur", "ev")
      .collect().map(r => r.getLong(1) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    // steps only at event times; censored rows shape n but emit nothing
    assert(km.keySet == Set(1L, 3L), km.toString)
    assert(km(1L) == ((5L, 1L, 1.0 - 1.0 / 5.0)), km.toString)
    val s3 = (1.0 - 1.0 / 5.0) * (1.0 - 2.0 / 3.0)
    assert(km(3L)._1 == 3L && km(3L)._2 == 2L &&
      math.abs(km(3L)._3 - s3) < 1e-15, km.toString)
  }

  test("cusumDrift locates a mean shift at the shift point") {
    // 10,10,10,10,10 then 20,20,20,20,20: max |cumulative deviation|
    // lands exactly on the last pre-shift point (ts=5)
    val shifted = (1 to 10).map(i => ("m", i.toLong, i.toLong,
      if (i <= 5) 10L else 20L)).toDF("k", "ts", "tie", "qv")
    val d = Behavior.cusumDrift(shifted, Seq("k"), "ts", "qv", "tie")
      .collect().head
    assert(d.getAs[Long]("changepoint_ts") == 5L, d.toString)
    assert(d.getAs[Double]("drift_stat") < -1.0, d.toString)
    // an alternating (driftless) series scores much smaller
    val flat = (1 to 10).map(i => ("f", i.toLong, i.toLong,
      if (i % 2 == 0) 10L else 20L)).toDF("k", "ts", "tie", "qv")
    val f = Behavior.cusumDrift(flat, Seq("k"), "ts", "qv", "tie").collect().head
    assert(math.abs(f.getAs[Double]("drift_stat")) <
      math.abs(d.getAs[Double]("drift_stat")) / 2, f.toString)
    // constant series (zero variance) emits nothing
    val const = (1 to 5).map(i => ("c", i.toLong, i.toLong, 7L))
      .toDF("k", "ts", "tie", "qv")
    assert(Behavior.cusumDrift(const, Seq("k"), "ts", "qv", "tie").count() == 0)
  }

  test("timeWeightedAvg weights by duration; zero spans drop; negatives raise") {
    val iv = Seq(
      // k=a: value 10 for 30 units, value 40 for 10 units → (300+400)/40 = 17.5
      ("a", 0L, 30L, 10L), ("a", 30L, 40L, 40L),
      // zero-length interval contributes nothing
      ("a", 40L, 40L, 999L),
      ("b", 0L, 10L, 5L)
    ).toDF("k", "st", "en", "qv")
    val out = Behavior.timeWeightedAvg(iv, Seq("k"), "st", "en", "qv")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out == Map("a" -> ((3L, 17.5)), "b" -> ((1L, 5.0))))
    val bad = Seq(("x", 10L, 5L, 1L)).toDF("k", "st", "en", "qv")
    val err = intercept[Exception](
      Behavior.timeWeightedAvg(bad, Seq("k"), "st", "en", "qv").collect())
    assert(err.getMessage != null)
  }

  test("seasonalAnomaliesRobust flags against a median baseline the outliers can't drag") {
    // phase 0: eight 10s and two enormous 1000s. A mean/σ baseline is
    // dragged toward the outliers; the median/MAD baseline still flags both.
    val rows = ((0 until 8).map(i => ("m", i * 100L, 10L + i % 2)) ++
      Seq(("m", 800L, 1000L), ("m", 900L, 1000L))).toDF("k", "ts", "qv")
    val robust = Behavior.seasonalAnomaliesRobust(rows, Seq("k"), "ts", "qv",
        periodUs = 100L, bucketUs = 100L, cutoff = 5.0)
      .collect().map(_.getAs[Long]("ts")).toSet
    assert(robust == Set(800L, 900L), s"got $robust")
  }

  test("retention cohorts by first day and counts distinct active offsets") {
    val day = 10L
    val e = Seq(
      (1L, 0L), (1L, 5L), (1L, 10L), (1L, 25L), // cohort 0, days 0,1,2
      (2L, 12L), (2L, 35L),                     // cohort 1, days 1,3 → offsets 0,2
      (3L, 3L)                                  // cohort 0, day 0 only
    ).toDF("user_id", "ts")
    val out = Behavior.retention(e, "user_id", "ts", dayUs = day)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out == Map(
      (0L, 0L) -> 2L, // u1 + u3 on their cohort day
      (0L, 1L) -> 1L, (0L, 2L) -> 1L, // u1 (multiple same-day events dedup)
      (1L, 0L) -> 1L, (1L, 2L) -> 1L))
  }

  test("abTest computes exact variant stats and Welch z") {
    val df = Seq(("A", 0L), ("A", 10L), ("B", 4L), ("C", 2L), ("C", 2L), ("C", 2L))
      .toDF("v", "qv")
    val out = Behavior.abTest(df, "v", "qv")
      .collect().map(r => (r.getAs[String]("variant_a"), r.getAs[String]("variant_b")) -> r).toMap
    assert(out.keySet == Set(("A", "B"), ("A", "C"), ("B", "C")))
    val ac = out(("A", "C"))
    // A: n=2 mean=5 var=(100-10*5)/1=50 ; C: n=3 mean=2 var=0
    assert(ac.getAs[Double]("mean_a") == 5.0 && ac.getAs[Double]("var_a") == 50.0)
    assert(ac.getAs[Double]("mean_b") == 2.0 && ac.getAs[Double]("var_b") == 0.0)
    assert(ac.getAs[Double]("z") == (5.0 - 2.0) / math.sqrt(50.0 / 2.0))
    // single-sample variant: variance (and hence z) is null, not a crash
    assert(out(("A", "B")).isNullAt(out(("A", "B")).fieldIndex("z")))
  }

  test("transitions counts ordered steps and normalizes per from-state") {
    val df = Seq(
      (1L, 1L, "a"), (1L, 2L, "b"), (1L, 3L, "a"),
      (2L, 1L, "a"), (2L, 2L, "b"),
      (3L, 1L, "a"), (3L, 2L, "c")
    ).toDF("k", "ts", "st").withColumn("id", col("ts"))
    val out = Behavior.transitions(df, "k", "ts", "st", "id")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("n_steps"), r.getAs[Double]("prob"))).toMap
    assert(out(("a", "b")) == ((2L, 2.0 / 3.0)))
    assert(out(("a", "c")) == ((1L, 1.0 / 3.0)))
    assert(out(("b", "a")) == ((1L, 1.0)))
    assert(out.size == 3)
  }

  test("associationRules: exact stats, distinct-item baskets, mega-basket cap") {
    val baskets = Seq(
      (1L, "x"), (1L, "y"), (1L, "x"),        // duplicate item collapses
      (2L, "x"), (2L, "y"),
      (3L, "x"), (3L, "z"),
      (4L, "y")).toDF("b", "i")
    val out = Behavior.associationRules(baskets, "b", "i", minPairCount = 2L)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    // only (x,y) reaches 2 baskets; (x,z) has 1 and is filtered
    assert(out.keySet == Set(("x", "y")))
    val r = out(("x", "y"))
    assert(r.getAs[Long]("n_pair") == 2L && r.getAs[Long]("n_a") == 3L
      && r.getAs[Long]("n_b") == 3L)
    assert(r.getAs[Double]("support") == 2.0 / 4.0)
    assert(r.getAs[Double]("conf_a_to_b") == 2.0 / 3.0)
    // lift = (2/3) / (3/4) = 8/9
    assert(math.abs(r.getAs[Double]("lift") - 8.0 / 9.0) < 1e-12)
    // a mega-basket above the cap contributes NO pairs
    val withMega = baskets.unionByName(
      (1 to 50).map(i => (9L, s"m$i")).toDF("b", "i"))
    val capped = Behavior.associationRules(withMega, "b", "i",
      minPairCount = 1L, maxBasketSize = 10)
    assert(!capped.collect().exists(_.getString(0).startsWith("m")))
  }

  test("decayedCounts: exact dyadic half-life weights") {
    import graft.operators.WindowOps
    // now=100, halfLife=10: ages 0,1,2 → weights 1, 0.5, 0.25; a future
    // event and a 62-half-life-old one contribute nothing
    val ev = Seq(("a", 95L), ("a", 85L), ("a", 75L), ("a", 105L),
      ("b", 100L), ("b", 100L - 620L)).toDF("k", "t")
    val out = WindowOps.decayedCounts(ev, Seq("k"), "t",
      nowTs = 100L, halfLife = 10L).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out == Map("a" -> 1.75, "b" -> 1.0), out.toString)
  }

  test("decayedStats: exact EWM over dyadic weights") {
    import graft.operators.WindowOps
    // now=100, halfLife=10: weights 1 and 0.5 → ewm = (1·8 + 0.5·2)/1.5 = 6
    val ev = Seq(("a", 95L, 8.0), ("a", 85L, 2.0)).toDF("k", "t", "v")
    val r = WindowOps.decayedStats(ev, Seq("k"), "t", "v",
      nowTs = 100L, halfLife = 10L).head()
    assert(r.getAs[Double]("decayed_n") == 1.5, r.toString)
    assert(r.getAs[Double]("decayed_sum") == 9.0, r.toString)
    assert(r.getAs[Double]("ewm") == 6.0, r.toString)
  }

  test("attribution: first/last/linear credit inside the lookback only") {
    // user 1: touches at t=10,20,80; conversion at t=100, lookback 50
    // → eligible touches 80 and... 60<tt<=100: only 80 (and 20? 20>50 no)
    val touches = Seq((1L, 101L, 10L), (1L, 102L, 60L), (1L, 103L, 80L),
      (2L, 201L, 5L)).toDF("u", "tid", "tt")
    val convs = Seq((1L, 900L, 100L), (2L, 901L, 200L)).toDF("u", "cid", "ct")
    def run(model: String) =
      Behavior.attribution(touches, convs, "u", "tid", "tt", "cid", "ct",
        lookback = 50L, model = model).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // conv 900 window (50, 100]: touches 60 and 80; conv 901 window
    // (150, 200]: nothing — absent
    assert(run("linear").toSet == Set((900L, 102L, 0.5), (900L, 103L, 0.5)))
    assert(run("first").toSet == Set((900L, 102L, 1.0)))
    assert(run("last").toSet == Set((900L, 103L, 1.0)))
    // position model: 2 touches → 0.5/0.5
    assert(run("position").toSet == Set((900L, 102L, 0.5), (900L, 103L, 0.5)))
    // 4 touches → U-shape 0.4 / 0.1 / 0.1 / 0.4
    val four = Seq((9L, 1L, 10L), (9L, 2L, 20L), (9L, 3L, 30L), (9L, 4L, 40L))
      .toDF("u", "tid", "tt")
    val conv = Seq((9L, 800L, 45L)).toDF("u", "cid", "ct")
    val pos = Behavior.attribution(four, conv, "u", "tid", "tt", "cid", "ct",
      lookback = 50L, model = "position").collect()
      .map(r => r.getLong(1) -> r.getDouble(2)).toMap
    assert(pos == Map(1L -> 0.4, 2L -> 0.1, 3L -> 0.1, 4L -> 0.4), pos.toString)
  }

  test("chiSquare: hand-checked 2x2 statistic, Cramér's V, perfect association") {
    // contingency [[30,10],[10,30]]: n=80, all marginals 40,
    // e=20 per cell, chi2 = 4·(10²/20) = 20, V = sqrt(20/80) = 0.5
    val rows = Seq.fill(30)(("x", "u")) ++ Seq.fill(10)(("x", "v")) ++
      Seq.fill(10)(("y", "u")) ++ Seq.fill(30)(("y", "v"))
    val out = Behavior.chiSquare(rows.toDF("a", "b"), "a", "b").head()
    assert(math.abs(out.getAs[Double]("chi2") - 20.0) < 1e-6, out.toString)
    assert(out.getAs[Long]("dof") == 1L && out.getAs[Long]("n") == 80L)
    assert(math.abs(out.getAs[Double]("cramers_v") - 0.5) < 1e-6)
    // perfect association: V = 1
    val perfect = (Seq.fill(5)(("x", "u")) ++ Seq.fill(5)(("y", "v"))).toDF("a", "b")
    val p = Behavior.chiSquare(perfect, "a", "b").head()
    assert(math.abs(p.getAs[Double]("cramers_v") - 1.0) < 1e-6, p.toString)
  }

  test("concurrency: sweep counts active intervals at every boundary") {
    val iv = Seq((0L, 10L), (5L, 15L), (5L, 8L), (20L, 30L)).toDF("s", "e")
    val out = Behavior.concurrency(iv, "s", "e").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out == Map(0L -> ((1L, 1L)), 5L -> ((2L, 3L)), 8L -> ((-1L, 2L)),
      10L -> ((-1L, 1L)), 15L -> ((-1L, 0L)), 20L -> ((1L, 1L)), 30L -> ((-1L, 0L))))
    // bucketing never changes the answer: 1 bucket ≡ many buckets
    val one = Behavior.concurrency(iv, "s", "e", buckets = 1).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(one == out.map { case (t, (_, c)) => (t, c) }.toSet)
    // empty input: empty result, no range to bucket
    assert(Behavior.concurrency(iv.filter(col("s") < 0), "s", "e").count() == 0)
    // grouped: strata sweep independently off one shared bucket range
    val giv = Seq(("a", 0L, 10L), ("a", 5L, 15L), ("b", 5L, 8L)).toDF("g", "s", "e")
    val gc = Behavior.concurrency(giv, "s", "e", groupCols = Seq("g")).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(3)).toMap
    assert(gc == Map(("a", 0L) -> 1L, ("a", 5L) -> 2L, ("a", 10L) -> 1L,
      ("a", 15L) -> 0L, ("b", 5L) -> 1L, ("b", 8L) -> 0L), gc.toString)
  }

  test("diffInDiff: hand-computed 2x2 nets out baseline and common trend") {
    import graft.operators.Behavior
    // control: 10 -> 13 (+3 common trend); treated: 20 -> 28 (+8)
    // => effect = 8 - 3 = 5, exactly
    val rows = Seq(
      (0, 0, 8L), (0, 0, 12L),          // control pre: mean 10
      (0, 1, 11L), (0, 1, 15L),         // control post: mean 13
      (1, 0, 18L), (1, 0, 22L),         // treated pre: mean 20
      (1, 1, 26L), (1, 1, 30L)          // treated post: mean 28
    ).toDF("tr", "po", "v")
    val r = Behavior.diffInDiff(rows, col("tr") === 1, col("po") === 1, col("v"))
      .collect().head
    assert(r.getAs[Double]("mean_t_pre") == 20.0 && r.getAs[Double]("mean_t_post") == 28.0)
    assert(r.getAs[Double]("mean_c_pre") == 10.0 && r.getAs[Double]("mean_c_post") == 13.0)
    assert(r.getAs[Double]("did") == 5.0, r.toString)
    assert(r.getAs[Long]("n_t_pre") == 2 && r.getAs[Long]("n_c_post") == 2)
  }
}
