package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Behavioral / engagement analytics over event streams — ordered funnels
  * and cohort retention. This is the workload family the reference engine
  * was built to serve at LinkedIn (README "statistics calculation" /
  * per-member engagement pipelines, `examples/` cube jobs over member
  * events); here each is a few partial-aggregating shuffles on the user
  * key, so a 10^11-event stream costs k scan+agg passes for a k-step
  * funnel and exactly two for retention — no window over raw events, no
  * per-user state bigger than the step times.
  */
object Behavior {

  /** Strictly-ordered funnel: for each key, the earliest time of step 0,
    * then the earliest step-1 event AFTER that, and so on — `t0..t{k-1}`
    * (null once a step is never reached; later steps are then null too by
    * construction) plus `depth` = number of steps completed.
    *
    * Stage i is one filtered scan + equi-join on the key with the stage
    * i-1 frontier + one min aggregation: each stage partial-aggregates
    * map-side and shuffles only (key, times) rows, so funnel cost is
    * k × (scan + keyed agg) regardless of per-user event counts. Keys
    * that never perform step 0 are absent from the output (count them
    * from the source if the 0-depth row matters).
    *
    * `maxSpan` bounds the whole conversion: later steps only count within
    * `maxSpan` time units of t0 (the analytics-product "converted within
    * 7 days" window semantics, anchored on the FIRST step-0 touch — the
    * funnel never re-anchors on a later step-0 event).
    */
  def funnel(events: DataFrame, keyCol: String, tsCol: String,
             steps: Seq[Column], maxSpan: Option[Long] = None): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step predicate")
    val step0 = events.filter(steps.head)
      .groupBy(col(keyCol)).agg(min(col(tsCol)).as("t0"))
    val full = steps.zipWithIndex.drop(1).foldLeft(step0) { case (cur, (pred, i)) =>
      val carried = cur.columns.filter(_ != keyCol) // t0..t{i-1}
      val inWindow = maxSpan // conversion window measured from step 0
        .map(s => col(tsCol) <= col("t0") + lit(s)).getOrElse(lit(true))
      val next = events.filter(pred)
        .join(cur, keyCol)
        .filter(col(tsCol) > col(s"t${i - 1}") && inWindow)
        .groupBy((keyCol +: carried.toSeq).map(col): _*)
        .agg(min(col(tsCol)).as(s"t$i"))
      // keys stalled before step i keep their earlier times, t_i = null
      cur.join(next.select(col(keyCol), col(s"t$i")), Seq(keyCol), "left")
    }
    val ts = steps.indices.map(i => col(s"t$i"))
    full.withColumn("depth",
      ts.map(t => when(t.isNotNull, 1L).otherwise(0L)).reduce(_ + _))
  }

  /** [[funnel]], in ONE scan of the event table. The k-join form above
    * reads the events k times (fine at k ≤ 4, the oracle anchor); this
    * form filters once to step-relevant events, collects each key's
    * (ts, step-bitmask) pairs sorted by time, and computes the ordered
    * frontier with a statically-unrolled `aggregate` fold — exactly one
    * shuffle (the keyed collect), partial-aggregated map-side, per-key
    * state bounded by that key's step-relevant events. Same contract and
    * same answer as [[funnel]]: t_i is the earliest step-i event strictly
    * after t_{i-1} (ties can't complete two steps at one timestamp, in
    * either form), keys that never perform step 0 are absent, and
    * `maxSpan` bounds the conversion window from t0 identically.
    */
  def funnelSinglePass(events: DataFrame, keyCol: String, tsCol: String,
                       steps: Seq[Column], maxSpan: Option[Long] = None): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step predicate")
    require(steps.length <= 31,
      s"funnelSinglePass packs step flags into an Int bitmask (max 31 " +
        s"steps, got ${steps.length}); use funnel() for longer funnels")
    val k = steps.length
    val tsType = events.select(col(tsCol)).schema.head.dataType
    val mask = steps.zipWithIndex.map { case (p, i) =>
      when(p, lit(1 << i)).otherwise(lit(0)) }.reduce(_.bitwiseOR(_))
    val collected = events.filter(steps.reduce(_ || _))
      .select(col(keyCol), struct(col(tsCol).as("ts"), mask.as("m")).as("ev"))
      .groupBy(col(keyCol))
      .agg(sort_array(collect_list(col("ev"))).as("evs"))
    // fold state = the k frontier times. Each event updates every step
    // slot from the PRE-event state, so one event can never complete two
    // consecutive steps (strict t_i > t_{i-1} needs a later event) — the
    // same semantics the stage joins produce.
    val nullT = lit(null).cast(tsType)
    val folded = collected.withColumn("st",
      aggregate(col("evs"), array_repeat(nullT, k), (st, e) =>
        array((0 until k).map { i =>
          val t = element_at(st, i + 1)
          val hasBit = e.getField("m").bitwiseAND(lit(1 << i)) =!= 0
          val inWindow = maxSpan // same first-touch-anchored bound as funnel
            .map(s => e.getField("ts") <= element_at(st, 1) + lit(s))
            .getOrElse(lit(true))
          val prevOk =
            if (i == 0) lit(true)
            else element_at(st, i).isNotNull &&
              e.getField("ts") > element_at(st, i) && inWindow
          when(t.isNotNull, t)
            .when(hasBit && prevOk, e.getField("ts"))
            .otherwise(nullT)
        }: _*)))
    folded.select(
      (col(keyCol) +:
        (0 until k).map(i => element_at(col("st"), i + 1).as(s"t$i"))) :+
        size(org.apache.spark.sql.functions.filter(col("st"), _.isNotNull))
          .cast("long").as("depth"): _*)
      .filter(col("t0").isNotNull)
  }

  /** Funnel depth histogram: how many keys completed exactly `depth`
    * steps. One tiny aggregation over the [[funnel]] frontier.
    */
  def funnelCounts(events: DataFrame, keyCol: String, tsCol: String,
                   steps: Seq[Column]): DataFrame =
    funnel(events, keyCol, tsCol, steps)
      .groupBy(col("depth")).agg(count(lit(1)).as("n_keys"))

  /** Cohort retention: keys are cohorted by the day of their FIRST event;
    * `n_active` counts distinct keys of cohort `cohort_day` active
    * `day_offset` days later (offset 0 = the cohort's size). `dayUs` is
    * the bucket width (a day by default) over a numeric microsecond time
    * column — plain integer arithmetic end to end.
    *
    * Two passes over the events (first-touch min, distinct active days),
    * both partial-aggregating on the key; the matrix join is keyed on the
    * key column and the output is cohorts × offsets — metadata-sized.
    */
  def retention(events: DataFrame, keyCol: String, tsCol: String,
                dayUs: Long = 86400L * 1000000L): DataFrame = {
    val day = (col(tsCol) - pmod(col(tsCol), lit(dayUs))) / lit(dayUs)
    val firsts = events.groupBy(col(keyCol))
      .agg(min(day.cast("long")).as("cohort_day"))
    val active = events.select(col(keyCol), day.cast("long").as("__day")).distinct()
    active.join(firsts, keyCol)
      .withColumn("day_offset", col("__day") - col("cohort_day"))
      .groupBy(col("cohort_day"), col("day_offset"))
      .agg(count(lit(1)).as("n_active"))
  }

  /** Welch two-sample z statistic between every pair of variants over an
    * INTEGER-quantized metric column (quantize like
    * [[WindowOps.rollingStats]]: exact per-variant count/sum/sumsq, so
    * mean, sample variance (n−1 denominator), and
    * z = (mean_a − mean_b) / sqrt(var_a/n_a + var_b/n_b) are pure
    * exactly-rounded double arithmetic — engine-portable, no normal-CDF
    * table needed downstream (|z| > 1.96 ≈ p < 0.05).
    *
    * One partial-aggregating pass over the data; the variant-stats table
    * is variant-cardinality sized, and the pair matrix is a broadcast
    * self-join of that metadata.
    */
  def abTest(df: DataFrame, variantCol: String, valueCol: String): DataFrame = {
    val v = col(valueCol)
    val stats = df.groupBy(col(variantCol))
      .agg(count(lit(1)).as("n"), sum(v).as("__s"), sum(v * v).as("__ss"))
      .withColumn("mean", col("__s").cast("double") / col("n").cast("double"))
      .withColumn("var",
        when(col("n") > 1,
          (col("__ss").cast("double") -
            col("__s").cast("double") * col("mean")) / (col("n") - 1).cast("double")))
      .drop("__s", "__ss")
    def side(sfx: String) = stats.select(
      col(variantCol).as(s"variant$sfx"), col("n").as(s"n$sfx"),
      col("mean").as(s"mean$sfx"), col("var").as(s"var$sfx"))
    side("_a").join(broadcast(side("_b")), col("variant_a") < col("variant_b"))
      .withColumn("z",
        (col("mean_a") - col("mean_b")) /
          sqrt(col("var_a") / col("n_a").cast("double") +
            col("var_b") / col("n_b").cast("double")))
  }

  /** Difference-in-differences: the quasi-experimental effect estimate
    * when treatment wasn't randomized but a pre/post boundary and a
    * control group exist (feature rollout to some cohorts, a policy
    * change in one market). For each (group ∈ treated/control ×
    * period ∈ pre/post) cell: exact count and sum of the INTEGER-
    * quantized metric (quantize upstream like [[abTest]]); then
    *
    *   did = (mean_t_post − mean_t_pre) − (mean_c_post − mean_c_pre)
    *
    * which nets out both the group baseline and the common time trend.
    * One partial-aggregating pass to a 4-row table; every mean is one
    * exactly-rounded division, so the whole row — estimate included —
    * replays bit-for-bit in an oracle. Emits the 4 cell means plus
    * `did`. (Standard errors need cluster structure — pair with
    * [[abTest]]'s variance machinery if rows are independent.)
    */
  def diffInDiff(df: DataFrame, treatedCol: Column, postCol: Column,
                 valueCol: Column): DataFrame = {
    val spark = df.sparkSession
    // ONE aggregation pass; the 4-row cell table collects (metadata-sized)
    // so an invalid design — any empty cell — fails loudly instead of
    // silently returning an empty frame
    val cells = df
      // null treated/post flags have no cell; null metric rows would null
      // the cell sum — drop both up front so errors stay the designed
      // loud ones, never an opaque NPE off a null cell
      .filter(treatedCol.isNotNull && postCol.isNotNull && valueCol.isNotNull)
      .groupBy(treatedCol.cast("int").as("treated"),
        postCol.cast("int").as("post"))
      .agg(count(lit(1)).as("n"), sum(valueCol).as("__s"))
      .withColumn("mean", col("__s").cast("double") / col("n").cast("double"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> ((r.getLong(2), r.getDouble(4)))).toMap
    def cell(t: Int, p: Int): (Long, Double) = cells.getOrElse((t, p),
      throw new IllegalArgumentException(
        s"diffInDiff: no rows with treated=$t, post=$p — the 2x2 design " +
          "needs all four cells populated"))
    val (ntp, mtp) = cell(1, 0); val (nta, mta) = cell(1, 1)
    val (ncp, mcp) = cell(0, 0); val (nca, mca) = cell(0, 1)
    import spark.implicits._
    Seq((ntp, mtp, nta, mta, ncp, mcp, nca, mca, (mta - mtp) - (mca - mcp)))
      .toDF("n_t_pre", "mean_t_pre", "n_t_post", "mean_t_post",
        "n_c_pre", "mean_c_pre", "n_c_post", "mean_c_post", "did")
  }

  /** Seasonal baseline per (key, phase): fold a numeric-microsecond time
    * column onto a period (a day, a week) in `bucketUs` phases (hour of
    * day, day of week…) and compute exact per-phase count/mean/sample
    * variance over an INTEGER-quantized metric (quantize upstream like
    * [[abTest]]) — the "what is NORMAL for 3 am on a Sunday" table that
    * rolling windows can't express. One partial-aggregating pass; the
    * profile is keys × (period/bucket) rows — metadata-sized.
    */
  def seasonalProfile(df: DataFrame, keyCols: Seq[String], tsCol: String,
                      valueCol: String, periodUs: Long, bucketUs: Long): DataFrame = {
    require(periodUs > 0 && bucketUs > 0 && periodUs % bucketUs == 0,
      "period must be a positive multiple of the bucket width")
    val v = col(valueCol)
    // integer div end to end (a double quotient would be fine below 2^53
    // but `div` is exact by construction and mirrors the oracle's `//`)
    val phase = expr(s"($tsCol % ${periodUs}L) div ${bucketUs}L")
    df.withColumn("phase", phase)
      .groupBy((keyCols.map(col) :+ col("phase")): _*)
      .agg(count(lit(1)).as("n"), sum(v).as("__s"), sum(v * v).as("__ss"))
      .withColumn("mean", col("__s").cast("double") / col("n").cast("double"))
      .withColumn("var",
        when(col("n") > 1,
          (col("__ss").cast("double") -
            col("__s").cast("double") * col("mean")) / (col("n") - 1).cast("double")))
      .drop("__s", "__ss")
  }

  /** Robust (median/MAD) form of the seasonal detector: the per-(key,
    * phase) baseline comes from [[Sketches.madOutliers]] grouped by the
    * folded phase, so a phase whose history is itself outlier-contaminated
    * (the exact situation that drags a mean/σ baseline toward the
    * anomalies being hunted) still flags correctly. Same fold, same scale
    * shape as madOutliers: two sketch passes, broadcasts, narrow flags.
    */
  def seasonalAnomaliesRobust(df: DataFrame, keyCols: Seq[String], tsCol: String,
                              valueCol: String, periodUs: Long, bucketUs: Long,
                              cutoff: Double = 3.0,
                              sketchKey: Option[Column] = None): DataFrame = {
    require(periodUs > 0 && bucketUs > 0 && periodUs % bucketUs == 0,
      "period must be a positive multiple of the bucket width")
    val phased = df.withColumn("phase",
      expr(s"($tsCol % ${periodUs}L) div ${bucketUs}L"))
    Sketches.madOutliers(phased, valueCol, sketchKey.getOrElse(col(tsCol)),
        keyCols :+ "phase", cutoff)
      .filter(col("is_outlier"))
  }

  /** Rows whose metric deviates from their (key, phase) seasonal baseline
    * by more than `cutoff` standard deviations — periodic-pattern anomaly
    * detection (complements `WindowOps.rollingStats`, which is trailing,
    * not seasonal). The profile joins BACK into the stream broadcast
    * (metadata-sized), so the detector is one aggregation pass plus a
    * narrow codegen'd probe: no window over raw events, no second shuffle.
    * Phases observed fewer than `minN` times are never flagged (a 1-row
    * phase has no variance to deviate from).
    */
  def seasonalAnomalies(df: DataFrame, keyCols: Seq[String], tsCol: String,
                        valueCol: String, periodUs: Long, bucketUs: Long,
                        cutoff: Double = 3.0, minN: Long = 2L): DataFrame =
    seasonalScreen(df,
      seasonalProfile(df, keyCols, tsCol, valueCol, periodUs, bucketUs),
      keyCols, tsCol, valueCol, periodUs, bucketUs, cutoff, minN)

  /** The probe half of [[seasonalAnomalies]] against an ALREADY-BUILT
    * profile — so a STREAM can screen live events against yesterday's
    * batch-computed baseline (stream-static broadcast join, stateless,
    * append mode), and a batch can screen against a frozen profile
    * (drift detection against last week's normal rather than its own).
    */
  def seasonalScreen(df: DataFrame, profile: DataFrame, keyCols: Seq[String],
                     tsCol: String, valueCol: String, periodUs: Long,
                     bucketUs: Long, cutoff: Double = 3.0,
                     minN: Long = 2L): DataFrame = {
    val phase = expr(s"($tsCol % ${periodUs}L) div ${bucketUs}L")
    df.withColumn("phase", phase)
      .join(broadcast(profile), keyCols :+ "phase")
      .withColumn("z",
        (col(valueCol).cast("double") - col("mean")) / sqrt(col("var")))
      .filter(col("var") > 0.0 && col("n") >= minN && abs(col("z")) > cutoff)
  }

  /** Kaplan–Meier survival curve per cohort — churn/retention analysis
    * over censored lifetimes: each subject contributes a `durationCol`
    * (time to event, or to censoring) and an `eventCol` flag (1 = the
    * event happened, 0 = censored/still alive). At every event time t:
    * n_t = subjects still at risk (duration ≥ t), d_t = events at t, and
    * S(t) = Π_{u≤t} (1 − d_u/n_u) — the estimator that uses censored
    * subjects correctly instead of dropping them.
    *
    * Scale shape: subjects partial-aggregate to one row per (cohort,
    * duration) — the curve's resolution, NOT the population — at-risk
    * counts are a suffix sum over that per-cohort grid, and the running
    * product folds the grid's SORTED factor list sequentially (bit-
    * portable like the other folds; the prefix re-fold is O(T²) in the
    * per-cohort grid size, so quantize durations to days/weeks upstream).
    * Emits (cohort keys, duration, n_risk, d_events, survival) at event
    * times only.
    */
  def kaplanMeier(df: DataFrame, keyCols: Seq[String], durationCol: String,
                  eventCol: String): DataFrame = {
    val perT = df.groupBy((keyCols :+ durationCol).map(col): _*)
      .agg(sum(col(eventCol).cast("long")).as("__d"), count(lit(1)).as("__c"))
    val sw = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*).orderBy(col(durationCol).desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val grid = perT.withColumn("__n", sum(col("__c")).over(sw))
    val packed = grid.groupBy(keyCols.map(col): _*)
      .agg(array_sort(collect_list(struct(col(durationCol).as("t"),
        col("__d").as("d"), col("__n").as("n")))).as("__arr"))
    packed
      .select((keyCols.map(col) :+ col("__arr") :+
        explode(col("__arr")).as("__u")): _*)
      .filter(col("__u.d") > 0)
      .withColumn("survival",
        aggregate(
          transform(
            org.apache.spark.sql.functions.filter(col("__arr"),
              x => x.getField("t") <= col("__u.t")),
            x => lit(1.0) - x.getField("d").cast("double") / x.getField("n").cast("double")),
          lit(1.0d), (a, x) => a * x))
      .select((keyCols.map(col) :+ col("__u.t").as("duration") :+
        col("__u.n").as("n_risk") :+ col("__u.d").as("d_events") :+
        col("survival")): _*)
  }

  /** CUSUM drift detection per key: the standardized cumulative deviation
    * D_i = (Σ_{j≤i} v_j − i·mean) / (σ·√n) over the time-ordered series,
    * whose max |D| locates a MEAN SHIFT — the slow drift that per-point
    * detectors ([[WindowOps.rollingStats]] spikes, [[seasonalAnomalies]]
    * periodic outliers) can't see. Emits one row per key: the max-|D|
    * statistic and its timestamp (the changepoint estimate), ties to the
    * earliest time. Exact and portable: the cumulative sums are integer
    * windows over the quantized metric, the statistic one
    * exactly-rounded double tree (abTest's mean/variance trees).
    *
    * Scale shape: one per-key stats aggregation (broadcast back), one
    * per-key ordered window for the integer cumsum (state = a running
    * long per key partition, the same class as rollingStats), one
    * partial-aggregated argmax. Keys with < 2 rows or zero variance emit
    * nothing.
    */
  def cusumDrift(df: DataFrame, keyCols: Seq[String], tsCol: String,
                 valueCol: String, tieBreak: String): DataFrame = {
    val v = col(valueCol)
    val stats = df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("__n"), sum(v).as("__s"), sum(v * v).as("__ss"))
      .withColumn("__mean", col("__s").cast("double") / col("__n").cast("double"))
      .withColumn("__var",
        when(col("__n") > 1,
          (col("__ss").cast("double") -
            col("__s").cast("double") * col("__mean")) / (col("__n") - 1).cast("double")))
      .drop("__s", "__ss")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*).orderBy(col(tsCol), col(tieBreak))
    val scored = df
      .withColumn("__cum", sum(v).over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .withColumn("__i", row_number().over(w))
      .join(broadcast(stats), keyCols)
      .filter(col("__var") > 0.0)
      .withColumn("__stat",
        (col("__cum").cast("double") - col("__i").cast("double") * col("__mean")) /
          (sqrt(col("__var")) * sqrt(col("__n").cast("double"))))
    scored.groupBy(keyCols.map(col): _*)
      .agg(min(struct((-abs(col("__stat"))).as("na"),
        col(tsCol).as("cts"), col("__stat").as("st"))).as("__m"))
      .select(keyCols.map(col) :+ col("__m.cts").as("changepoint_ts") :+
        col("__m.st").as("drift_stat"): _*)
  }

  /** Exact time-weighted average of an INTEGER-quantized metric over
    * validity intervals — the TSDB `twa()` for irregularly-sampled gauges,
    * where a plain mean over-weights chatty reporters. Per key:
    * Σ v·(end−start) / Σ (end−start), both sums exact decimals (a
    * microsecond duration times a quantized gauge overflows a long), the
    * final ratio one exactly-rounded double division. One
    * partial-aggregating pass, metadata-sized output; zero-length
    * intervals contribute nothing, negative ones raise.
    */
  def timeWeightedAvg(df: DataFrame, keyCols: Seq[String], startCol: String,
                      endCol: String, valueCol: String): DataFrame = {
    val dur = (col(endCol) - col(startCol)).cast("decimal(38,0)")
    val guarded = when(col(endCol) >= col(startCol), dur)
      .otherwise(raise_error(lit(
        s"timeWeightedAvg: $endCol < $startCol")).cast("decimal(38,0)"))
    df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n_intervals"),
        sum(col(valueCol).cast("decimal(38,0)") * guarded).as("__wv"),
        sum(guarded).as("__w"))
      .withColumn("twa",
        when(col("__w") > 0,
          col("__wv").cast("double") / col("__w").cast("double")))
      .drop("__wv", "__w")
  }

  /** Pairwise association rules (market-basket): for every item pair
    * co-occurring in ≥ `minPairCount` baskets, emit support
    * (pair-baskets / all baskets), both directed confidences
    * (pair / item-baskets), and lift (confidence over the consequent's
    * base rate) — the classic A-implies-B mining, pairwise (the useful
    * 90% of apriori without the exponential lattice).
    *
    * Scale shape: baskets larger than `maxBasketSize` are dropped BEFORE
    * pair generation (a degenerate mega-basket would otherwise contribute
    * |basket|² pairs — the skew guard, analogous to the hot-shingle cap),
    * so pair volume is Σ min(|basket|, cap)². Item and pair counts
    * partial-aggregate; the per-item counts broadcast back into the
    * (much smaller, minPairCount-filtered) pair table. All statistics are
    * exact integer counts + exactly-rounded divisions, hence
    * oracle-portable.
    */
  def associationRules(df: DataFrame, basketCol: String, itemCol: String,
                       minPairCount: Long = 2L,
                       maxBasketSize: Int = 100): DataFrame = {
    val items = df.select(col(basketCol).as("__b"), col(itemCol).as("__i")).distinct()
    val ok = items.groupBy("__b").agg(count(lit(1)).as("__sz"))
      .filter(col("__sz") <= maxBasketSize).select("__b")
    val bounded = items.join(ok, "__b")
    val nBaskets = bounded.select(col("__b")).distinct().count()
    val itemCounts = bounded.groupBy(col("__i")).agg(count(lit(1)).as("__ic"))
    val pairs = bounded.as("a")
      .join(bounded.as("b"), col("a.__b") === col("b.__b") && col("a.__i") < col("b.__i"))
      .select(col("a.__i").as("item_a"), col("b.__i").as("item_b"))
      .groupBy("item_a", "item_b").agg(count(lit(1)).as("n_pair"))
      .filter(col("n_pair") >= minPairCount)
    pairs
      .join(broadcast(itemCounts.select(col("__i").as("item_a"), col("__ic").as("n_a"))), "item_a")
      .join(broadcast(itemCounts.select(col("__i").as("item_b"), col("__ic").as("n_b"))), "item_b")
      .withColumn("support", col("n_pair").cast("double") / lit(nBaskets.toDouble))
      .withColumn("conf_a_to_b", col("n_pair").cast("double") / col("n_a").cast("double"))
      .withColumn("conf_b_to_a", col("n_pair").cast("double") / col("n_b").cast("double"))
      .withColumn("lift", col("conf_a_to_b") /
        (col("n_b").cast("double") / lit(nBaskets.toDouble)))
      .select("item_a", "item_b", "n_pair", "n_a", "n_b",
        "support", "conf_a_to_b", "conf_b_to_a", "lift")
  }

  /** Interval-concurrency sweep: given (start, end] intervals (end
    * exclusive, integer timestamps), emit every boundary instant `t` with
    * `net` (interval starts minus ends at t) and `concurrent` (number of
    * intervals active in [t, next boundary)) — peak concurrent sessions is
    * `max(concurrent)`, a one-row reduction away. With `groupCols` the
    * sweep runs independently per stratum (concurrent sessions per
    * server / per event type) off the same two-phase machinery.
    *
    * Scale shape: the classic sweep is a running sum over a GLOBAL time
    * order, which naively funnels every boundary through one window task.
    * Here the boundaries first collapse by exact timestamp (one
    * partial-aggregating shuffle, output = distinct boundaries, not
    * intervals), then the running sum is two-phase like
    * `Sampling.deterministicShuffle`: range-bucket on `t` (bucket order =
    * time order by construction), per-bucket net totals prefix-sum in a
    * metadata-sized window, and the exact cumulative sum runs per-bucket,
    * `buckets`-way parallel, seeded by its bucket offset. Only min/max(t)
    * (two longs) ever reach the driver. Integer-only, oracle-portable.
    */
  def concurrency(intervals: DataFrame, startCol: String, endCol: String,
                  buckets: Int = 1024, groupCols: Seq[String] = Nil): DataFrame = {
    require(buckets >= 1, s"bad buckets: $buckets")
    val gs = groupCols
    // r17: the range probe is a NARROW min/max scan of the raw interval
    // columns (identical values: min over the boundary union = least of
    // the two per-column mins, and min/max ignore NULLs on both paths) —
    // the old probe executed the whole boundary union+aggregation once
    // just to read two longs. The offsets branch and the final join still
    // reference the boundary aggregate twice, but they share its exchange
    // (identical subtree in one plan — AQE stage reuse; measured: adding a
    // localCheckpoint to force single evaluation was wall-neutral at
    // sf0.1 and costs O(boundaries) cache at scale, so it stays out).
    val rangeRow = intervals.agg(
      min(col(startCol).cast("long")), max(col(startCol).cast("long")),
      min(col(endCol).cast("long")), max(col(endCol).cast("long"))).head()
    val deltas = intervals
      .select(gs.map(col) :+ col(startCol).cast("long").as("t") :+ lit(1L).as("__d"): _*)
      .unionAll(intervals
        .select(gs.map(col) :+ col(endCol).cast("long").as("t") :+ lit(-1L).as("__d"): _*))
      .groupBy((gs :+ "t").map(col): _*).agg(sum("__d").as("net"))
    // one GLOBAL time range buckets every group: bucket order = time
    // order inside any group, and only two longs reach the driver
    val mins = Seq(0, 2).filterNot(rangeRow.isNullAt).map(rangeRow.getLong)
    val maxs = Seq(1, 3).filterNot(rangeRow.isNullAt).map(rangeRow.getLong)
    if (mins.isEmpty) return deltas.withColumn("concurrent", lit(0L))
    val tMin = mins.min
    val width = math.max((maxs.max - tMin) / buckets + 1, 1L)
    val b = deltas.withColumn("__b", ((col("t") - tMin) / width).cast("int"))
    val ow = org.apache.spark.sql.expressions.Window
      .partitionBy(gs.map(col): _*).orderBy("__b")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val offs = b.groupBy((gs :+ "__b").map(col): _*).agg(sum("net").as("__n"))
      .withColumn("__off", coalesce(sum("__n").over(ow), lit(0L)))
      .select((gs :+ "__b" :+ "__off").map(col): _*)
    val rw = org.apache.spark.sql.expressions.Window
      .partitionBy((gs :+ "__b").map(col): _*).orderBy("t")
    b.join(broadcast(offs), gs :+ "__b")
      .withColumn("concurrent", col("__off") + sum("net").over(rw))
      .select((gs :+ "t" :+ "net" :+ "concurrent").map(col): _*)
  }

  /** Marketing-style conversion attribution: for every conversion, credit
    * the key's touch events inside the lookback window — `first` /
    * `last` touch get credit 1.0, `linear` splits 1/n over all touches,
    * `position` is the U-shape (0.4 to each end, 0.2 across the middle).
    * Emits (conv_id, touch_id, credit); conversions with no touch in
    * window are absent (count them from the source for an "organic" row).
    *
    * Scale shape: one equi-join on the key with the window predicate in
    * the join condition (never a cross product; per-key width is the
    * user's own event count — pre-session truly pathological keys), then
    * ONE partial-aggregating groupBy per conversion electing min/max_by
    * (first/last) or count (linear) — no per-event window. Credits are
    * 1.0 or the single exactly-rounded 1/n division: oracle-portable.
    */
  def attribution(touches: DataFrame, convs: DataFrame, keyCol: String,
                  touchIdCol: String, touchTsCol: String,
                  convIdCol: String, convTsCol: String,
                  lookback: Long, model: String = "linear"): DataFrame = {
    require(lookback > 0, s"bad lookback: $lookback")
    val t = touches.select(col(keyCol).as("__k"),
      col(touchIdCol).as("touch_id"), col(touchTsCol).cast("long").as("__tt"))
    val c = convs.select(col(keyCol).as("__k"),
      col(convIdCol).as("conv_id"), col(convTsCol).cast("long").as("__ct"))
    val joined = c.join(t, Seq("__k"))
      .filter(col("__tt") <= col("__ct") && col("__tt") > col("__ct") - lookback)
    model match {
      case "first" =>
        joined.groupBy("conv_id")
          .agg(min_by(col("touch_id"), struct(col("__tt"), col("touch_id")))
            .as("touch_id"))
          .withColumn("credit", lit(1.0))
      case "last" =>
        joined.groupBy("conv_id")
          .agg(max_by(col("touch_id"), struct(col("__tt"), col("touch_id")))
            .as("touch_id"))
          .withColumn("credit", lit(1.0))
      case "linear" =>
        val n = joined.groupBy("conv_id").agg(count(lit(1)).as("__n"))
        joined.join(n, "conv_id")
          .withColumn("credit", lit(1.0) / col("__n").cast("double"))
          .select("conv_id", "touch_id", "credit")
      case "position" =>
        // U-shaped: first and last touch get 0.4 each, the middles split
        // the remaining 0.2 (1 touch → 1.0, 2 touches → 0.5/0.5); ties
        // break on (time, touch_id) like first/last. Same shape as
        // linear: one election aggregate joined back on the conversion.
        val ord = struct(col("__tt"), col("touch_id"))
        val stats = joined.groupBy("conv_id").agg(
          count(lit(1)).as("__n"),
          min_by(col("touch_id"), ord).as("__first"),
          max_by(col("touch_id"), ord).as("__last"))
        joined.join(stats, "conv_id")
          .withColumn("credit",
            when(col("__n") === 1, lit(1.0))
              .when(col("__n") === 2, lit(0.5))
              .when(col("touch_id") === col("__first") ||
                col("touch_id") === col("__last"), lit(0.4))
              .otherwise(lit(0.2) / (col("__n") - 2).cast("double")))
          .select("conv_id", "touch_id", "credit")
      case other => throw new IllegalArgumentException(s"unknown model: $other")
    }
  }

  /** Chi-square test of independence between two categorical columns:
    * contingency counts, the χ² statistic, degrees of freedom, and
    * Cramér's V effect size (p-values need the incomplete gamma — compare
    * χ² against critical values, or feed it to a stats library).
    *
    * Scale shape: one partial-aggregating groupBy to the |A|×|B| cell
    * table (metadata-sized), marginals broadcast back, everything after
    * runs on cells. Bit-portable: each cell's (o−e)²/e is one
    * exactly-rounded double tree, QUANTIZED to integer nanos before the
    * cross-cell sum (float addition is order-sensitive; integer addition
    * is not — the same discipline as the LM scorers), so the statistic
    * replays exactly in any engine.
    */
  def chiSquare(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val obs = df.groupBy(col(aCol), col(bCol)).agg(count(lit(1)).as("o"))
    val ra = obs.groupBy(col(aCol)).agg(sum("o").as("__ra"))
    val cb = obs.groupBy(col(bCol)).agg(sum("o").as("__cb"))
    val tot = obs.agg(sum("o").as("__n"),
      count_distinct(col(aCol)).as("__da"), count_distinct(col(bCol)).as("__db"))
    val e = col("__ra").cast("double") * col("__cb").cast("double") /
      col("__n").cast("double")
    val contrib = (col("o").cast("double") - e) * (col("o").cast("double") - e) / e
    // every (a, b) pair of the marginals, INCLUDING never-observed cells —
    // a zero cell still contributes (0−e)²/e = e to the statistic
    val cells = ra.crossJoin(broadcast(cb))
      .join(broadcast(obs), Seq(aCol, bCol), "left")
      .withColumn("o", coalesce(col("o"), lit(0L)))
      .crossJoin(broadcast(tot))
      .select(floor(contrib * lit(1e9)).cast("long").as("__q"),
        col("__n"), col("__da"), col("__db"))
    cells.groupBy("__n", "__da", "__db").agg(sum("__q").as("__sq"))
      .select(
        (col("__sq").cast("double") / lit(1e9)).as("chi2"),
        ((col("__da") - 1) * (col("__db") - 1)).as("dof"),
        col("__n").as("n"), col("__da"), col("__db"))
      .withColumn("cramers_v",
        sqrt(col("chi2") / (col("n").cast("double") *
          least(col("__da") - 1, col("__db") - 1).cast("double"))))
      .drop("__da", "__db")
  }

  /** First-order transition matrix of an event-state sequence: per key,
    * order events by (time, tie-break) and count each consecutive
    * (from_state → to_state) step, with `prob` = count / outgoing-total of
    * the from state. The lag is one per-key window pass (partition =
    * key); the matrix is state² rows, so the probability join broadcasts.
    */
  def transitions(events: DataFrame, keyCol: String, tsCol: String,
                  stateCol: String, tieBreak: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieBreak))
    val steps = events
      .withColumn("from_state", lag(col(stateCol), 1).over(w))
      .filter(col("from_state").isNotNull)
      .groupBy(col("from_state"), col(stateCol).as("to_state"))
      .agg(count(lit(1)).as("n_steps"))
    val totals = steps.groupBy(col("from_state")).agg(sum(col("n_steps")).as("__tot"))
    steps.join(broadcast(totals), "from_state")
      .withColumn("prob", col("n_steps").cast("double") / col("__tot").cast("double"))
      .drop("__tot")
  }
}
