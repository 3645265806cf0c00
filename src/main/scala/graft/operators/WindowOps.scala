package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ranking / top-N / analytic windows — SURVEY.md §2.5.
  *
  * The reference computed RANK and TOP N by iterating pivots of pre-sorted
  * blocks (operator/RankOperator.java:24, operator/TopNOperator.java:32);
  * Spark's Window exec is the same partition-sorted iteration, planned
  * automatically. The reference's RANK is row_number semantics — it
  * increments on every row, not on ties (RankOperator.java:78-97) — and we
  * keep that quirk (SURVEY.md §7.4).
  */
object WindowOps {

  private def w(partitionBy: Seq[String], orderBy: Seq[Column]) = {
    val base = if (partitionBy.isEmpty) Window.partitionBy() else Window.partitionBy(partitionBy.map(col): _*)
    base.orderBy(orderBy: _*)
  }

  /** RANK x AS col [GROUP BY g ORDER BY o] — row_number semantics
    * (reference: operator/RankOperator.java:88-97).
    */
  def rank(df: DataFrame, as: String, partitionBy: Seq[String], orderBy: Seq[Column]): DataFrame =
    df.withColumn(as, row_number().over(w(partitionBy, orderBy)))

  /** Gap rank (SQL RANK) — not in the reference; included for completeness. */
  def gapRank(df: DataFrame, as: String, partitionBy: Seq[String], orderBy: Seq[Column]): DataFrame =
    df.withColumn(as, org.apache.spark.sql.functions.rank().over(w(partitionBy, orderBy)))

  /** TOP N FROM x GROUP BY g ORDER BY o — first N rows per group
    * (reference: operator/TopNOperator.java:67-86). row_number + filter lets
    * Spark plan a partial top-N (WindowGroupLimit pushes the limit into the
    * shuffle map side on Spark 3.5+), which is the scalable form.
    */
  def topN(df: DataFrame, n: Int, partitionBy: Seq[String], orderBy: Seq[Column],
           rankCol: String = "__rank"): DataFrame =
    df.withColumn(rankCol, row_number().over(w(partitionBy, orderBy)))
      .filter(col(rankCol) <= n)
      .drop(rankCol)

  /** Analytic frame helpers — the reference's "coming soon" analytic window
    * functions (README "Coming (really) soon"), free on Spark.
    */
  def withLag(df: DataFrame, c: Column, as: String, partitionBy: Seq[String],
              orderBy: Seq[Column], offset: Int = 1): DataFrame =
    df.withColumn(as, lag(c, offset).over(w(partitionBy, orderBy)))

  def withLead(df: DataFrame, c: Column, as: String, partitionBy: Seq[String],
               orderBy: Seq[Column], offset: Int = 1): DataFrame =
    df.withColumn(as, lead(c, offset).over(w(partitionBy, orderBy)))

  /** Moving aggregate over a row frame [start, end] relative to current row. */
  def movingAgg(df: DataFrame, agg: Column, as: String, partitionBy: Seq[String],
                orderBy: Seq[Column], start: Long, end: Long): DataFrame =
    df.withColumn(as, agg.over(w(partitionBy, orderBy).rowsBetween(start, end)))

  /** Distribution analytics (ntile buckets, percent_rank, cume_dist) — the
    * rest of the reference's "coming soon" analytic set, free on Spark.
    */
  def withNtile(df: DataFrame, n: Int, as: String, partitionBy: Seq[String],
                orderBy: Seq[Column]): DataFrame =
    df.withColumn(as, ntile(n).over(w(partitionBy, orderBy)))

  def withPercentRank(df: DataFrame, as: String, partitionBy: Seq[String],
                      orderBy: Seq[Column]): DataFrame =
    df.withColumn(as, percent_rank().over(w(partitionBy, orderBy)))

  def withCumeDist(df: DataFrame, as: String, partitionBy: Seq[String],
                   orderBy: Seq[Column]): DataFrame =
    df.withColumn(as, cume_dist().over(w(partitionBy, orderBy)))

  /** Batch sessionization (gaps-and-islands): per key, order events by time
    * and start a new session when the gap to the previous event exceeds
    * `gapSeconds`; session id = running count of session starts. The batch
    * analog of Streaming.sessionGroupBy — one window pass, one shuffle on
    * the key.
    */
  def sessionize(df: DataFrame, keyCol: String, tsCol: String,
                 gap: Long, sessionCol: String = "session_id"): DataFrame = {
    val byTime = w(Seq(keyCol), Seq(col(tsCol).asc))
    val prev = lag(col(tsCol).cast("long"), 1).over(byTime)
    val isNew = when(prev.isNull || col(tsCol).cast("long") - prev > gap, 1L).otherwise(0L)
    df.withColumn(sessionCol,
      sum(isNew).over(byTime.rowsBetween(Window.unboundedPreceding, 0)))
  }

  /** Time-series gap fill (resample + fill-forward): bucket events to a
    * fixed `step` grid per key, then emit EVERY grid bucket between each
    * key's first and last event, carrying the most recent observed value
    * forward across empty buckets — the densification step feature
    * pipelines need before windowed aggregation (a sparse event stream is
    * not a time series until the gaps are explicit).
    *
    * Per (key, bucket) the observed value is the LATEST event's
    * (`max_by` over (time, tie-break) — deterministic under equal
    * timestamps); `observed` marks buckets that had an event, filled rows
    * carry it `false`. Buckets before a key's first event don't exist by
    * construction (the grid starts at the first observation).
    *
    * Scale shape: the bucket aggregation partial-aggregates map-side (one
    * shuffle on (key, bucket)); the grid is a `sequence` explode of
    * (range/step) longs per key — metadata, not data; the fill-forward is
    * one per-key window pass over grid rows, so cost scales with the
    * GRID, never with raw event count. The time column must already be a
    * numeric (e.g. `unix_micros`) — instant semantics stay with the
    * caller.
    */
  def gapFill(df: DataFrame, keyCols: Seq[String], tsCol: String,
              valueCol: String, step: Long, tieBreak: String): DataFrame = {
    require(step > 0, s"step must be positive: $step")
    val kcols = keyCols.map(col)
    val bucketed = df
      // integer bucketing (ts - ts % step): no double division, exact at
      // any epoch magnitude
      .withColumn("bucket", col(tsCol) - pmod(col(tsCol), lit(step)))
      .groupBy(kcols :+ col("bucket"): _*)
      .agg(max_by(col(valueCol), struct(col(tsCol), col(tieBreak))).as("__v"))
    val grid = bucketed.groupBy(kcols: _*)
      .agg(min(col("bucket")).as("__mn"), max(col("bucket")).as("__mx"))
      .select(kcols :+ explode(sequence(col("__mn"), col("__mx"), lit(step))).as("bucket"): _*)
    val joined = grid.join(bucketed, keyCols :+ "bucket", "left")
    val byBucket = w(keyCols, Seq(col("bucket").asc))
      .rowsBetween(Window.unboundedPreceding, 0)
    joined
      .withColumn("observed", col("__v").isNotNull)
      .withColumn(valueCol, last(col("__v"), ignoreNulls = true).over(byBucket))
      .drop("__v")
  }

  /** Rolling statistics + z-score anomaly flag over an ordered (usually
    * [[gapFill]]-densified) series: per key, a trailing `window`-row frame
    * yields count / sum / sum-of-squares of an INTEGER-quantized value
    * column (the caller quantizes, e.g. `floor(value * 1000)` — integer
    * frame sums are exact, so the derived mean/variance/z are pure
    * exactly-rounded double arithmetic and replay bit-for-bit in any
    * engine; IEEE `sqrt` is correctly rounded). Emits `roll_n`,
    * `roll_mean`, `roll_var`, `zscore` (null while the frame variance is
    * 0), and `is_anomaly` = |z| > zThreshold.
    *
    * Scale shape: one window pass per key over grid rows — after gap
    * fill the frame is bounded and the partition is range/step sized
    * (metadata), so cost never tracks raw event volume.
    */
  def rollingStats(df: DataFrame, keyCols: Seq[String], orderCol: String,
                   valueCol: String, window: Int,
                   zThreshold: Double = 3.0): DataFrame = {
    require(window >= 2, s"window must be >= 2: $window")
    val frame = w(keyCols, Seq(col(orderCol).asc))
      .rowsBetween(-(window - 1), Window.currentRow)
    val v = col(valueCol)
    val withSums = df
      .withColumn("roll_n", count(lit(1)).over(frame))
      .withColumn("__sum", sum(v).over(frame))
      .withColumn("__sumsq", sum(v * v).over(frame))
    val mean = col("__sum").cast("double") / col("roll_n").cast("double")
    val variance =
      col("__sumsq").cast("double") / col("roll_n").cast("double") -
        col("roll_mean") * col("roll_mean")
    withSums
      .withColumn("roll_mean", mean)
      .withColumn("roll_var", variance)
      .withColumn("zscore",
        when(col("roll_var") > 0,
          (v.cast("double") - col("roll_mean")) / sqrt(col("roll_var"))))
      .withColumn("is_anomaly",
        col("zscore").isNotNull && abs(col("zscore")) > zThreshold)
      .drop("__sum", "__sumsq")
  }

  /** Exponentially time-decayed counts per key: each event contributes
    * 2^−age (age = whole `halfLife` units before `nowTs`), so yesterday's
    * click counts half of today's — the standard recency-weighted
    * engagement score, made REPRODUCIBLE: decay weights are the dyadic
    * rationals 2^−k, carried as integer numerators over 2^62 and summed
    * EXACTLY (decimal arithmetic, no float-order sensitivity); the single
    * final division by 2^62 is one exactly-rounded double op. Events
    * older than 62 half-lives contribute 0 (they'd be below one ulp
    * anyway); events after `nowTs` are dropped.
    *
    * One partial-aggregating shuffle of (key, decimal) — the same cost as
    * a plain count, with none of approx-decay's engine dependence.
    */
  def decayedCounts(df: DataFrame, keyCols: Seq[String], tsCol: String,
                    nowTs: Long, halfLife: Long): DataFrame = {
    require(halfLife > 0, s"bad halfLife: $halfLife")
    // guard on the raw timestamp, not the age: integer division of a
    // negative numerator truncates toward zero in Spark but floors in
    // other engines, so a future event's age is engine-dependent
    val a = s"cast(((${nowTs}L - cast(`$tsCol` as bigint)) div ${halfLife}L) as int)"
    val num = expr(s"case when cast(`$tsCol` as bigint) <= ${nowTs}L and $a < 62 " +
      s"then shiftleft(1L, 62 - $a) else 0L end")
    df.groupBy(keyCols.map(col): _*)
      .agg(sum(num.cast("decimal(38,0)")).as("__num"))
      .withColumn("decayed",
        // decimal→double via string: Double.parseDouble is correctly
        // rounded, while Decimal.toDouble can be off by one ulp on
        // integers past 2^53 — and the oracle's HUGEINT cast is correct
        col("__num").cast("string").cast("double") / lit(math.pow(2.0, 62)))
      .drop("__num")
  }

  /** Recency-weighted statistics of a metric per key — [[decayedCounts]]'s
    * exact-dyadic weights applied to a value column: `decayed_n` (weighted
    * count), `decayed_sum` (weighted value total), and `ewm` (the
    * exponentially-weighted mean — yesterday's metric counts half of
    * today's). The value is micro-quantized and every weighted
    * contribution is an exact decimal product, so the sums carry no
    * float-order sensitivity and the three outputs are single
    * exactly-rounded double trees. |value| must stay below ~1e13 (the
    * decimal-38 headroom under the 2^62 weight scale — checked nowhere,
    * documented here). One partial-aggregating shuffle.
    */
  def decayedStats(df: DataFrame, keyCols: Seq[String], tsCol: String,
                   valueCol: String, nowTs: Long, halfLife: Long): DataFrame = {
    require(halfLife > 0, s"bad halfLife: $halfLife")
    val a = s"cast(((${nowTs}L - cast(`$tsCol` as bigint)) div ${halfLife}L) as int)"
    val w = s"case when cast(`$tsCol` as bigint) <= ${nowTs}L and $a < 62 " +
      s"then shiftleft(1L, 62 - $a) else 0L end"
    val vq = s"cast(floor(cast(`$valueCol` as double) * 1e6) as bigint)"
    val wDec = expr(w).cast("decimal(38,0)")
    val agg = df.groupBy(keyCols.map(col): _*).agg(
      sum(wDec).as("__wn"),
      sum(wDec * expr(vq).cast("decimal(38,0)")).as("__ws"))
    val two62 = lit(math.pow(2.0, 62))
    // string-route the decimal→double casts (see decayedCounts): exact
    // integers above 2^53 must round identically to the oracle's casts
    val wn = col("__wn").cast("string").cast("double")
    val ws = col("__ws").cast("string").cast("double")
    agg
      .withColumn("decayed_n", wn / two62)
      .withColumn("decayed_sum", ws / two62 / lit(1e6))
      .withColumn("ewm", when(col("__wn") > 0, ws / wn / lit(1e6)))
      .drop("__wn", "__ws")
  }
}
