package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** CUBE / GROUPING SETS / ROLLUP — the reference's flagship operator
  * (reference: operator/CubeOperator.java:60; ancestor enumeration
  * operator/cube/CubeDimensions.java:141-145,267-286; grouping-set syntax
  * CubertPhysical.g4:121,135-139).
  *
  * Semantics map to Spark's native cube/rollup/GROUPING SETS: the 2^n
  * ancestor enumeration is Expand + partial HashAggregate, the null-bit-
  * vector convention becomes `grouping()`/`grouping_id()`, and the bounded
  * 2M-entry hash table with 95%-occupancy flush (CubeOperator.java:65,81)
  * becomes HashAggregate's automatic spill. Non-additive measures (exact
  * COUNT DISTINCT, percentiles, duple [outer,inner] aggregates) that the
  * reference handled with INNER-sorted partitioned-additive aggregators
  * (operator/cube/DupleCubeAggregator.java:33) are expressed either directly
  * (count_distinct under cube — Catalyst plans the Expand) or via the
  * two-level rewrite in `dupleCube`.
  */
object CubeOps {

  // temp-view names for SQL-only constructs: a process-wide counter (identity
  // hashes are not unique across live DataFrames); views are dropped right
  // after the sql() call — Spark analyzes eagerly, so the resolved plan no
  // longer needs the view.
  private val viewSeq = new java.util.concurrent.atomic.AtomicLong(0)

  private def withTempView[T](df: DataFrame, prefix: String)(body: String => T): T = {
    val v = s"__graft_${prefix}_${viewSeq.incrementAndGet()}"
    df.createOrReplaceTempView(v)
    try body(v)
    finally df.sparkSession.catalog.dropTempView(v)
  }

  /** CUBE x BY dims AGGREGATES … — full 2^n grouping sets. */
  def cube(df: DataFrame, dims: Seq[String], aggs: Seq[(String, Column, String)]): DataFrame = {
    val exprs = aggs.map { case (t, c, n) => Aggregations.aggExpr(t, c).as(n) }
    df.cube(dims.map(col): _*).agg(exprs.head, exprs.tail: _*)
  }

  /** ROLLUPS clause — prefix grouping sets (reference: grammar :137). */
  def rollup(df: DataFrame, dims: Seq[String], aggs: Seq[(String, Column, String)]): DataFrame = {
    val exprs = aggs.map { case (t, c, n) => Aggregations.aggExpr(t, c).as(n) }
    df.rollup(dims.map(col): _*).agg(exprs.head, exprs.tail: _*)
  }

  /** Explicit GROUPING SETS — compiled to SQL because the DataFrame API has
    * no direct form (reference: grammar :136 `GROUPING SETS (…)`).
    * `sets` are subsets of `dims`; aggs as (aggType, inputExpr SQL, alias).
    */
  def groupingSets(df: DataFrame, dims: Seq[String], sets: Seq[Seq[String]],
                   aggsSql: Seq[String]): DataFrame = withTempView(df, "gs") { v =>
    val setsSql = sets.map(s => if (s.isEmpty) "()" else s.mkString("(", ", ", ")")).mkString(", ")
    // only dims that appear in ≥1 set are selectable (a dim in no set is
    // not a grouping column — MISSING_AGGREGATION otherwise)
    val used = dims.filter(d => sets.exists(_.contains(d)))
    df.sparkSession.sql(
      s"SELECT ${(used ++ aggsSql).mkString(", ")} " +
        s"FROM $v GROUP BY GROUPING SETS ($setsSql)")
  }

  /** GROUPING COMBOS n — all grouping sets of size ≤ n, enumerated
    * explicitly (reference: grammar :138; CubeDimensions ancestor subsets).
    */
  def groupingCombos(df: DataFrame, dims: Seq[String], maxSize: Int,
                     aggsSql: Seq[String]): DataFrame = {
    val sets = (0 to maxSize).flatMap(k => dims.combinations(k).toSeq)
    groupingSets(df, dims, sets, aggsSql)
  }

  /** Duple [outerAgg, innerAgg] measures — e.g. [SUM, COUNT] = per grouping
    * set, the outer aggregate of the inner aggregate computed per inner-
    * dimension group (reference: operator/cube/DefaultDupleCubeAggregator.java:38;
    * enforcement of INNER sort/partition preconditions CubeOperator.java:365-400).
    *
    * Spark rewrite (SURVEY.md §7.2.5): two-level aggregation —
    * groupBy(dims ++ inner).agg(innerAgg) then cube(dims).agg(outerAgg) —
    * which is also the scalable plan: the first aggregation shrinks the data
    * before the 2^n Expand, exactly the reduction the reference's
    * partitioned-additive trick achieved.
    */
  /** Correctness subtlety (SURVEY.md §7.4): the inner aggregate must be
    * computed per (grouping set ∪ inner), NOT per (all dims ∪ inner) — so
    * cube over dims with inner pinned in every grouping set
    * (GROUP BY inner, CUBE(dims)), then outer-aggregate per grouping set.
    * grouping_id() disambiguates "NULL because aggregated" from NULL data,
    * exactly the reference's null-bit-vector (CubeDimensions.java:89-91).
    * The first aggregation also shrinks the data before the outer pass,
    * which is the scale story of the reference's partitioned-additive trick.
    * `innerAggSql` is e.g. "sum(l_quantity)", `outerAggSql` e.g. "max".
    */
  /** Grouping-set count up to which [[dupleCube]] enumerates the cube as
    * UNION branches over one shared inner-key exchange instead of the
    * Expand form. Measured at sf0.1 (Profile "q26" sections, r17): the
    * Expand form copies every RAW row 2^n times into a partial aggregate
    * whose keys are near-unique (the inner key), so the partial collapses
    * nothing and the exchange carries ~|rows|·2^n partials; the union form
    * shuffles the raw rows ONCE (repartition by the inner key — a subset
    * of every branch's grouping key, so all 2^n branch aggregates are
    * exchange-free and ReuseExchange shares the one shuffle), 2.09 s →
    * 0.67 s on q26. Past this cap the 2^n branch passes over the base
    * outgrow the one Expand pass and the plan itself gets large.
    */
  val MaxUnionGroupingSets: Int = 8

  def dupleCube(df: DataFrame, dims: Seq[String], inner: Seq[String],
                outerAggSql: String, innerAggSql: String, as: String): DataFrame = {
    val nSets = if (dims.length < 31) 1 << dims.length else Int.MaxValue
    if (inner.nonEmpty && dims.nonEmpty && nSets <= MaxUnionGroupingSets)
      dupleCubeUnion(df, dims, inner, outerAggSql, innerAggSql, as)
    else withTempView(df, "duple") { v =>
      df.sparkSession.sql(
        s"""SELECT ${dims.mkString(", ")}, $outerAggSql(__inner) AS $as FROM (
           |  SELECT ${dims.mkString(", ")}, grouping_id() AS __gid,
           |         $innerAggSql AS __inner
           |  FROM $v
           |  GROUP BY ${inner.mkString(", ")}, CUBE(${dims.mkString(", ")})
           |) GROUP BY ${dims.mkString(", ")}, __gid""".stripMargin)
    }
  }

  /** [[dupleCube]]'s union form: every cube grouping set becomes one
    * aggregate branch over a SHARED repartition-by-inner-key exchange.
    * The inner key is a subset of every branch's grouping key, so
    * hashpartitioning(inner) satisfies each branch's clustering
    * requirement — the 2^n inner aggregates run exchange-free off one
    * shuffle of the raw rows, where the Expand form shuffles the ~2^n-
    * multiplied near-unique partials. Branch output replays the Expand
    * convention exactly: aggregated-away dims are NULL literals (typed
    * from the input schema) and __gid is the grouping_id() bit vector
    * (bit n-1-i set when dims(i) is aggregated), so the final
    * (dims, __gid) re-aggregation — and therefore every output row —
    * is identical to the Expand form's.
    */
  private def dupleCubeUnion(df: DataFrame, dims: Seq[String], inner: Seq[String],
                             outerAggSql: String, innerAggSql: String,
                             as: String): DataFrame = {
    val base = df.repartition(inner.map(col): _*)
    val subsets: Seq[Seq[String]] =
      (0 to dims.length).flatMap(k => dims.combinations(k).toSeq)
    val branches = subsets.map { kept =>
      val keptSet = kept.toSet
      val gid = dims.zipWithIndex
        .collect { case (d, i) if !keptSet.contains(d) => 1L << (dims.length - 1 - i) }
        .sum
      val dimCols = dims.map { d =>
        if (keptSet.contains(d)) col(d)
        else lit(null).cast(df.schema(d).dataType).as(d)
      }
      base.groupBy((inner ++ kept).map(col): _*)
        .agg(expr(innerAggSql).as("__inner"))
        .select(dimCols :+ lit(gid).as("__gid") :+ col("__inner"): _*)
    }
    branches.reduce(_ unionAll _)
      .groupBy((dims :+ "__gid").map(col): _*)
      .agg(expr(s"$outerAggSql(__inner)").as(as))
      .select((dims :+ as).map(col): _*)
  }

  /** Exact COUNT DISTINCT under CUBE — the reference's partitioned-additive
    * flagship (operator/cube/CountDistinctCubeAggregator.java:25). Expressed
    * directly; Catalyst rewrites distinct-under-Expand into a two-phase
    * aggregation equivalent to the reference's inner-pivot scheme.
    */
  def cubeCountDistinct(df: DataFrame, dims: Seq[String], distinctCol: String,
                        as: String, extraAggs: Seq[(String, Column, String)] = Nil): DataFrame = {
    val exprs = count_distinct(col(distinctCol)).as(as) +:
      extraAggs.map { case (t, c, n) => Aggregations.aggExpr(t, c).as(n) }
    df.cube(dims.map(col): _*).agg(exprs.head, exprs.tail: _*)
  }

  /** Approximate COUNT DISTINCT under CUBE (HyperLogLog++) — the 100 TB
    * fallback when exactness is negotiable: constant-size sketches replace
    * the distinct expansion entirely, and partials merge additively across
    * grouping sets. `rsd` = relative standard deviation (Spark default .05).
    */
  def cubeApproxCountDistinct(df: DataFrame, dims: Seq[String], distinctCol: String,
                              as: String, rsd: Double = 0.05): DataFrame =
    df.cube(dims.map(col): _*)
      .agg(approx_count_distinct(col(distinctCol), rsd).as(as))

  /** Approximate-percentile cube measure — the sketch-based scale path for
    * the reference's exact-percentile CUBE (CubeOperator MEDIAN/percentile
    * measures): t-digest-style `approx_percentile` is mergeable, so unlike
    * the exact sort-based form it composes with partial aggregation under
    * Expand and never needs per-group sorted buffers. `accuracy` trades
    * sketch size for error exactly like the reference's HTSIZE dial traded
    * memory for flushes.
    */
  def cubeApproxPercentile(df: DataFrame, dims: Seq[String], valueCol: String,
                           percentage: Double, as: String,
                           accuracy: Int = 10000): DataFrame =
    df.cube(dims.map(col): _*)
      .agg(percentile_approx(col(valueCol), lit(percentage), lit(accuracy)).as(as))

  /** Pre-aggregated cube for very wide dims at scale: collapse to the leaf
    * grouping set first, then cube the (much smaller) leaf aggregate. Valid
    * for additive measures only (SUM/COUNT/MIN/MAX — the reference's
    * ValueAggregationType set, operator/cube/ValueAggregationType.java:23).
    * This mirrors Cubert's memory-bounded one-pass trick: at 100 TB the
    * Expand multiplier applies to |leaf groups|, not |rows|.
    */
  def additiveCubePreAgg(df: DataFrame, dims: Seq[String],
                         sumCols: Seq[(Column, String)]): DataFrame = {
    val leaf = df.groupBy(dims.map(col): _*)
      .agg(count(lit(1)).as("__cnt"), sumCols.map { case (c, n) => sum(c).as(n) }: _*)
    leaf.cube(dims.map(col): _*)
      .agg(sum("__cnt").as("n_rows"), sumCols.map { case (_, n) => sum(n).as(n) }: _*)
  }
}
