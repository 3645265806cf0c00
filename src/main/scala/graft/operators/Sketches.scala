package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Udafs

/** Mergeable, fixed-memory sketches with DETERMINISTIC contents — the
  * approximate-counting layer of the engine (reference analog: the
  * COUNT_DISTINCT aggregation family, functions/builtin/FunctionType.java:
  * 20-68, which the reference only offers exactly). Spark ships HLL and
  * approx_percentile, but their register layouts are implementation-defined;
  * these sketches are pure functions of a portable hash, so an external
  * engine reproduces every cell bit-for-bit — sketches can be STOREd,
  * diffed across engines, and re-merged incrementally like any other table.
  */
object Sketches {

  private val M: Long = 1L << 30 // hash space of Sampling.hashBucket

  /** Per-group KMV approximate distinct count. One partial-aggregating
    * shuffle whose per-group state is ≤ k longs; while a group has seen
    * fewer than k distinct hashes the count is exact, beyond that the
    * classic (k-1)·M / kth_min estimator applies (relative error
    * ~ 1/sqrt(k-2)). Emits (groups..., n_mins, kth_hash, nd_est).
    * The estimate division happens HERE, declaratively, so the oracle can
    * replay the identical expression tree on the identical integers.
    */
  def kmvDistinct(df: DataFrame, key: Column, groupCols: Seq[Column],
      k: Int = 64, salt: String = "kmv"): DataFrame = {
    val h = Sampling.hashBucket(key, salt, (1 << 30))
    val sk = udaf(new Udafs.Kmv(k))
    df.groupBy(groupCols: _*)
      .agg(sk(h).as("__kmv"))
      .select(col("*"), col("__kmv.n_mins").as("n_mins"), col("__kmv.kth_hash").as("kth_hash"))
      .drop("__kmv")
      .withColumn("nd_est",
        when(col("n_mins") < k, col("n_mins").cast("double"))
          .otherwise(lit(((k - 1).toLong * M).toDouble) / col("kth_hash").cast("double")))
  }

  /** Persistable KMV sketch: per group, the sorted array of the k smallest
    * distinct key hashes (`mins`). STORE the result per shard / batch and
    * compose later with [[kmvMerge]] — the incremental-corpus shape: a new
    * batch is sketched alone and merged against the stored sketch without
    * rescanning history. State per group ≤ k longs.
    */
  def kmvSketch(df: DataFrame, key: Column, groupCols: Seq[Column],
      k: Int = 64, salt: String = "kmv"): DataFrame = {
    val h = Sampling.hashBucket(key, salt, (1 << 30))
    val sk = udaf(new Udafs.KmvMins(k))
    df.groupBy(groupCols: _*).agg(sk(h).as("mins"))
  }

  /** Merge KMV sketch tables (same k and salt): union, explode the min
    * arrays, re-take the bottom-k per group. Exactly the sketch the union
    * of the raw inputs would have produced — KMV's bottom-k state is a
    * semilattice, so merge order never matters.
    */
  def kmvMerge(sketches: Seq[DataFrame], groupKeys: Seq[String], k: Int = 64): DataFrame = {
    require(sketches.nonEmpty)
    val sk = udaf(new Udafs.KmvMins(k))
    val all = sketches.reduce(_.unionByName(_))
    all.select(groupKeys.map(col) :+ explode(col("mins")).as("__h"): _*)
      .groupBy(groupKeys.map(col): _*).agg(sk(col("__h")).as("mins"))
  }

  /** Distinct-count estimate from a [[kmvSketch]]/[[kmvMerge]] table —
    * the same declarative estimator expression as [[kmvDistinct]], so
    * sketch-then-estimate ≡ direct kmvDistinct row-for-row.
    */
  def kmvEstimate(sketch: DataFrame, k: Int = 64): DataFrame =
    sketch
      .withColumn("n_mins", size(col("mins")))
      .withColumn("kth_hash",
        when(col("n_mins") === k, element_at(col("mins"), k)).otherwise(lit(-1L)))
      .withColumn("nd_est",
        when(col("n_mins") < k, col("n_mins").cast("double"))
          .otherwise(lit(((k - 1).toLong * M).toDouble) / col("kth_hash").cast("double")))
      .drop("mins")

  /** Theta-sketch-style SET OPERATIONS over two [[kmvSketch]] columns
    * (built with the same k and salt). For each input row carrying two
    * sorted bottom-k arrays `minsA`/`minsB`, emits:
    *
    *   - `n_union_mins` / `union_kth` / `union_est` — the merged sketch's
    *     state and the [[kmvEstimate]] distinct-count estimator for
    *     |A ∪ B| (the merged bottom-k IS the sketch of the union — the
    *     KMV semilattice property);
    *   - `n_common_mins` — how many of the merged bottom-k hashes appear
    *     in BOTH inputs; `jaccard_est` = n_common_mins / n_union_mins is
    *     the classic theta-sketch Jaccard estimator (the merged bottom-k
    *     is a uniform sample of A ∪ B, so the fraction landing in A ∩ B
    *     estimates the Jaccard similarity);
    *   - `inter_est` = jaccard_est · union_est ≈ |A ∩ B|.
    *
    * All hash work happened at sketch-build time; this is a narrow map
    * over array columns of ≤ k longs — pairing any number of sketch pairs
    * costs nothing but the join that produced the pairs. Everything below
    * is integer arithmetic plus three exactly-rounded double ops, so the
    * estimates — not just the sketch state — replay bit-for-bit in any
    * engine.
    */
  def kmvSetOps(pairs: DataFrame, minsA: String, minsB: String,
      k: Int = 64): DataFrame = {
    val merged = slice(array_sort(array_union(col(minsA), col(minsB))), 1, k)
    val common = array_intersect(col(minsA), col(minsB))
    pairs
      .withColumn("__merged", merged)
      .withColumn("n_union_mins", size(col("__merged")))
      .withColumn("union_kth",
        when(col("n_union_mins") === k, element_at(col("__merged"), k)).otherwise(lit(-1L)))
      .withColumn("union_est",
        when(col("n_union_mins") < k, col("n_union_mins").cast("double"))
          .otherwise(lit(((k - 1).toLong * M).toDouble) / col("union_kth").cast("double")))
      .withColumn("n_common_mins", size(array_intersect(col("__merged"), common)))
      .withColumn("jaccard_est",
        when(col("n_union_mins") === 0, lit(0.0))
          .otherwise(col("n_common_mins").cast("double") / col("n_union_mins").cast("double")))
      .withColumn("inter_est", col("jaccard_est") * col("union_est"))
      .drop("__merged", minsA, minsB)
  }

  /** Deterministic quantile sketch: per group, the rows whose key hashes
    * rank in the bottom `k` of the portable hash order — a fixed-size
    * uniform row sample (the key should identify rows, as in
    * [[Sampling.deterministicShuffle]]) that is DETERMINISTIC, mergeable
    * ([[quantileMerge]]: bottom-k of a union = re-ranked union of
    * bottom-ks, a semilattice like KMV), and bit-portable — unlike
    * approx_percentile's implementation-defined digest. Emits
    * (groups..., __h, v). Quantiles come from [[quantileEstimate]];
    * sampling error is the usual O(1/sqrt(k)).
    *
    * Scale shape: the rank filter is a WindowGroupLimit — every map task
    * pre-prunes to its own bottom-k per group before the exchange, so a
    * 10^9-row group ships ~k rows per task, never the group.
    */
  def quantileSketch(df: DataFrame, value: Column, key: Column,
      groupCols: Seq[Column], k: Int = 256, salt: String = "qsk"): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val base = df.select(groupCols :+
      Sampling.hashBucket(key, salt, 1 << 30).as("__h") :+ value.as("v"): _*)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(base.columns.dropRight(2).map(col): _*)
      .orderBy(col("__h"), col("v"))
    base.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k).drop("__rk")
  }

  /** Merge quantile sketch tables built with the same k and salt: union,
    * re-take the bottom-k per group — exactly the sketch of the unioned
    * raw inputs (per-shard / per-batch sketches compose incrementally).
    */
  def quantileMerge(sketches: Seq[DataFrame], groupKeys: Seq[String],
      k: Int = 256): DataFrame = {
    require(sketches.nonEmpty)
    val all = sketches.reduce(_.unionByName(_))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupKeys.map(col): _*).orderBy(col("__h"), col("v"))
    all.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k).drop("__rk")
  }

  /** Quantile estimates from a [[quantileSketch]] table: per group, the
    * sorted sample array indexed at floor(q·(n−1)) (lower-nearest-rank on
    * the sample — index arithmetic is one exactly-rounded multiply +
    * floor, so any engine reproduces it). Emits (groups..., n_sample,
    * p<q> per requested quantile). The sample is ≤ k rows per group, so
    * the collect_list is bounded state, not data.
    */
  def quantileEstimate(sketch: DataFrame, groupKeys: Seq[String],
      qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q >= 0 && q <= 1), s"bad quantiles: $qs")
    val agg = sketch.groupBy(groupKeys.map(col): _*)
      .agg(array_sort(collect_list(col("v"))).as("__vs"),
        count(lit(1)).as("n_sample"))
    qs.foldLeft(agg) { (d, q) =>
      // name from the quantile in percent, rounded past IEEE noise
      // (0.99 * 100 is 99.00000000000001): p50, p90, p99, p99_9, ...
      val scaled = math.round(q * 10000).toDouble / 100.0
      val name = "p" + (if (scaled == scaled.floor) scaled.toInt.toString
                        else scaled.toString.replace('.', '_'))
      d.withColumn(name, element_at(col("__vs"),
        (floor(lit(q) * (col("n_sample") - 1).cast("double")) + 1).cast("int")))
    }.drop("__vs")
  }

  /** Winsorization (outlier clipping) driven by the deterministic quantile
    * sketch: clip `valueCol` into the per-group [lo, hi] quantile bounds
    * estimated by [[quantileSketch]] + [[quantileEstimate]] — the standard
    * robust-scaling step before a numeric feature feeds a model, but with
    * bounds that are REPRODUCIBLE (sketch sample = pure hash function of
    * the data) instead of approx_percentile's impl-defined digest.
    *
    * Scale shape: the sketch pass ships ≤ k rows per group per task
    * (WindowGroupLimit pre-prune), the bounds table is group-cardinality
    * sized and BROADCAST back, and the clip itself is a narrow codegen'd
    * `least/greatest` — the full data is scanned twice but never
    * shuffled. The bounds are exact sample values (no interpolation
    * arithmetic), so clipped outputs are always values the column
    * actually contains.
    */
  def winsorize(df: DataFrame, valueCol: String, key: Column,
      groupCols: Seq[String], lo: Double = 0.05, hi: Double = 0.95,
      k: Int = 256, salt: String = "qsk"): DataFrame = {
    require(lo <= hi, s"lo $lo > hi $hi")
    val sketch = quantileSketch(df, col(valueCol), key, groupCols.map(col), k, salt)
    val est = quantileEstimate(sketch, groupCols, Seq(lo, hi))
    val names = est.columns.takeRight(2) // p<lo>, p<hi> in request order
    val bounds = est.select(groupCols.map(col) :+
      col(names(0)).as("lo_bound") :+ col(names(1)).as("hi_bound"): _*)
    val joined =
      if (groupCols.isEmpty) df.crossJoin(broadcast(bounds))
      else df.join(broadcast(bounds), groupCols)
    joined.withColumn(s"${valueCol}_clipped",
      least(greatest(col(valueCol), col("lo_bound")), col("hi_bound")))
  }

  /** MAD-based robust outlier detection on the sketch layer: flag rows
    * with |x − median| > cutoff · MAD, where both the per-group median and
    * the median absolute deviation come from the deterministic
    * [[quantileSketch]] — the robust alternative to z-scores (mean/stddev
    * are themselves dragged by the outliers being hunted), with REPRODUCIBLE
    * statistics instead of approx_percentile's impl-defined digest.
    *
    * Scale shape: two sketch passes (each ships ≤ k rows per group per
    * task), two broadcast joins of group-cardinality tables, and narrow
    * codegen'd arithmetic for the deviation/flag — the data is scanned
    * twice, shuffled never. Emits the input plus (med, mad, is_outlier).
    */
  def madOutliers(df: DataFrame, valueCol: String, key: Column,
      groupCols: Seq[String], cutoff: Double = 3.0, k: Int = 256,
      salt: String = "mad"): DataFrame = {
    require(cutoff > 0, s"bad cutoff: $cutoff")
    def est(data: DataFrame, value: Column, s: String, out: String) = {
      val e = quantileEstimate(
        quantileSketch(data, value, key, groupCols.map(col), k, s),
        groupCols, Seq(0.5))
      e.select(groupCols.map(col) :+ col("p50").as(out): _*)
    }
    def joinB(data: DataFrame, small: DataFrame) =
      if (groupCols.isEmpty) data.crossJoin(broadcast(small))
      else data.join(broadcast(small), groupCols)
    val withMed = joinB(df, est(df, col(valueCol), salt, "med"))
      .withColumn("__dev", abs(col(valueCol) - col("med")))
    joinB(withMed, est(withMed, col("__dev"), salt + "d", "mad"))
      .withColumn("is_outlier", col("__dev") > lit(cutoff) * col("mad"))
      .drop("__dev")
  }

  /** Equi-depth (quantile) binning driven by the deterministic quantile
    * sketch: per group, the i/nBins quantile boundaries come from
    * [[quantileSketch]] + [[quantileEstimate]], broadcast back, and each
    * row's `bin` (0-based) counts the boundaries ≤ its value — feature
    * bucketing whose cut points are reproducible functions of the data.
    * Same scale shape as [[winsorize]]: sketch pass ships ≤ k rows per
    * group, the clip/bin itself is narrow and codegen'd.
    */
  def quantileBins(df: DataFrame, valueCol: String, key: Column,
      groupCols: Seq[String], nBins: Int, k: Int = 256,
      salt: String = "qsk"): DataFrame = {
    require(nBins >= 2, s"nBins must be >= 2: $nBins")
    val qs = (1 until nBins).map(_.toDouble / nBins)
    val sketch = quantileSketch(df, col(valueCol), key, groupCols.map(col), k, salt)
    val est = quantileEstimate(sketch, groupCols, qs)
    val names = est.columns.takeRight(nBins - 1)
    val bounds = est.select(groupCols.map(col) ++
      names.zipWithIndex.map { case (n, i) => col(n).as(s"__b$i") }: _*)
    val joined =
      if (groupCols.isEmpty) df.crossJoin(broadcast(bounds))
      else df.join(broadcast(bounds), groupCols)
    val bin = (0 until nBins - 1)
      .map(i => when(col(valueCol) >= col(s"__b$i"), 1).otherwise(0))
      .reduce(_ + _)
    joined.withColumn("bin", bin)
      .drop((0 until nBins - 1).map(i => s"__b$i"): _*)
  }

  /** Count-min sketch BUILD: a (depth × width) grid of counts, stored as a
    * DataFrame of (d, bucket, cnt) cells — at most depth·width rows
    * regardless of corpus size. Each input row increments one bucket per
    * hash row; the whole build is a single partial-aggregating shuffle of
    * depth·width groups, and two sketches merge by summing cells (the
    * incremental-corpus shape). `weight` defaults to 1 per row.
    */
  def cmsBuild(df: DataFrame, term: Column, depth: Int = 4, width: Int = 1024,
      salt: String = "cms", weight: Column = lit(1L)): DataFrame = {
    require(depth >= 1 && width >= 2, s"bad sketch shape: $depth x $width")
    val entries = array((0 until depth).map { i =>
      struct(lit(i).as("d"),
        Sampling.hashBucket(term, s"$salt$i", width).cast("int").as("bucket"))
    }: _*)
    df.select(explode(entries).as("e"), weight.as("__w"))
      .select(col("e.d").as("d"), col("e.bucket").as("bucket"), col("__w"))
      .groupBy("d", "bucket")
      .agg(sum("__w").as("cnt"))
  }

  /** Count-min sketch QUERY: estimated count per probe term = min over the
    * depth rows of that term's bucket counts (an over-estimate, never
    * under). The sketch is metadata-sized, so the probe join broadcasts —
    * probing costs one narrow pass over the probe set. Integer-only, hence
    * bit-portable. The (depth, width, salt) must match the build.
    */
  def cmsQuery(sketch: DataFrame, probes: DataFrame, term: Column,
      depth: Int = 4, width: Int = 1024, salt: String = "cms"): DataFrame = {
    val entries = array((0 until depth).map { i =>
      struct(lit(i).as("d"),
        Sampling.hashBucket(col("term"), s"$salt$i", width).cast("int").as("bucket"))
    }: _*)
    probes.select(term.as("term")).distinct()
      .select(col("term"), explode(entries).as("e"))
      .select(col("term"), col("e.d").as("d"), col("e.bucket").as("bucket"))
      .join(broadcast(sketch), Seq("d", "bucket"), "left")
      .groupBy("term")
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est_count"))
  }

  /** Merge count-min sketch tables built with the same (depth, width,
    * salt): cells sum — exactly the sketch of the unioned raw inputs
    * (the grid is a homomorphism of multiset union), so per-shard /
    * per-batch sketches compose incrementally like [[kmvMerge]] /
    * [[bloomMerge]].
    */
  def cmsMerge(sketches: Seq[DataFrame]): DataFrame = {
    require(sketches.nonEmpty)
    sketches.reduce(_.unionByName(_))
      .groupBy("d", "bucket").agg(sum("cnt").as("cnt"))
  }

  /** Join-cardinality estimate from two count-min sketches built with the
    * SAME (depth, width, salt): |A ⋈ B| on the sketched key ≈ min over the
    * depth rows of Σ_bucket cntA·cntB (the AMS-style inner product; each
    * row over-estimates — colliding keys add cross terms — so the min is
    * the tightest). The inputs are metadata-sized (≤ depth·width cells), so
    * the whole estimate is a broadcast join over sketch cells + one scalar
    * aggregate: the raw tables are never touched — the shape that lets a
    * planner pick join order or a skew strategy BEFORE paying the shuffle.
    * Integer-only, hence bit-portable to the oracle.
    */
  def cmsJoinSize(sketchA: DataFrame, sketchB: DataFrame): DataFrame = {
    val prod = sketchA.select(col("d"), col("bucket"), col("cnt").as("__ca"))
      .join(broadcast(sketchB.select(col("d"), col("bucket"), col("cnt").as("__cb"))),
        Seq("d", "bucket"))
      .groupBy("d").agg(sum(col("__ca") * col("__cb")).as("__dot"))
    prod.agg(min("__dot").as("est_join_size"))
  }

  /** Bloom filter as a (word, bits) relation: `hashes` portable bit
    * positions per key over a `numBits` space, packed 62 bits per word
    * (62, not 64, so no engine's BIGINT shift ever touches the sign bit).
    * One partial-aggregating bit_or shuffle bounded by numBits/62 rows
    * regardless of key cardinality; DETERMINISTIC — same hashes in any
    * engine, so the sketch (and even its false positives) replays in the
    * oracle, unlike Spark's built-in bloom_filter_agg whose layout is
    * implementation-defined. Membership via [[bloomQuery]]; shard/batch
    * sketches compose with [[bloomMerge]] (bit_or is a semilattice).
    * Sizing: false-positive rate ~ (1 - e^(-hashes·n/numBits))^hashes.
    */
  def bloomBuild(df: DataFrame, key: Column, numBits: Int = 1 << 16,
      hashes: Int = 5, salt: String = "blm"): DataFrame = {
    require(hashes >= 1 && numBits >= 62, s"bad bloom shape: $hashes x $numBits")
    val positions = array((0 until hashes).map { i =>
      Sampling.hashBucket(key, s"$salt$i", numBits)
    }: _*)
    df.select(explode(positions).as("__pos"))
      .select(floor(col("__pos") / 62).cast("int").as("word"),
        call_function("shiftleft", lit(1L), (col("__pos") % 62).cast("int")).as("__bit"))
      .groupBy("word")
      .agg(expr("bit_or(__bit)").as("bits"))
  }

  /** Bloom membership per probe key: true iff every one of the key's
    * `hashes` bit positions is set. The sketch is metadata-sized
    * (numBits/62 rows), so the probe join broadcasts — one narrow pass
    * over the probe set. No false negatives; false positives at the
    * standard rate, and — the portable-hash dividend — the SAME false
    * positives in every engine. (numBits, hashes, salt) must match the
    * build.
    */
  def bloomQuery(sketch: DataFrame, probes: DataFrame, key: Column,
      numBits: Int = 1 << 16, hashes: Int = 5, salt: String = "blm"): DataFrame = {
    val positions = array((0 until hashes).map { i =>
      Sampling.hashBucket(col("key"), s"$salt$i", numBits)
    }: _*)
    probes.select(key.as("key")).distinct()
      .select(col("key"), explode(positions).as("__pos"))
      .select(col("key"), floor(col("__pos") / 62).cast("int").as("word"),
        call_function("shiftleft", lit(1L), (col("__pos") % 62).cast("int")).as("__mask"))
      .join(broadcast(sketch), Seq("word"), "left")
      .groupBy("key")
      .agg(min((coalesce(col("bits"), lit(0L)).bitwiseAND(col("__mask")) =!= 0L)
        .cast("int")).as("__all"))
      .select(col("key"), (col("__all") === 1).as("may_contain"))
  }

  /** Merge bloom sketch tables built with the same (numBits, hashes,
    * salt): union, re-OR per word — exactly the sketch of the unioned raw
    * inputs, in any merge order.
    */
  def bloomMerge(sketches: Seq[DataFrame]): DataFrame = {
    require(sketches.nonEmpty)
    sketches.reduce(_.unionByName(_)).groupBy("word").agg(expr("bit_or(bits)").as("bits"))
  }

  /** Quantile normalization across strata (quantile matching): map each
    * group's values onto the GLOBAL distribution at `nQ`-quantile
    * resolution — the batch-effect correction for heterogeneous sources
    * scoring on incompatible scales (one classifier's 0.6 is another's
    * 0.9; after matching, equal per-group ranks read as equal global
    * values). Per row: per-group percent rank p
    * (`Sampling.percentRank`'s two-phase bucketed rank — no global-sort
    * task), j = floor(p·nQ), and the output is the global reference value
    * at bottom-k-sketch index floor((j/nQ)·(n−1)) — the [[quantileSketch]]
    * boundary set, which broadcasts as ONE row. Deterministic and exact
    * end to end (both layers are independently oracle-replayed), cost =
    * percentRank's two shuffles + a narrow broadcast probe.
    */
  def quantileMatch(df: DataFrame, valueCol: String, keyCol: String,
                    groupCols: Seq[String], nQ: Int = 100, k: Int = 1024,
                    salt: String = "qm"): DataFrame = {
    require(nQ >= 1, s"nQ must be >= 1: $nQ")
    val ranked = graft.operators.Sampling.percentRank(df, valueCol,
      groupCols = groupCols)
    val ref = quantileSketch(df, col(valueCol).cast("double"), col(keyCol),
        Nil, k, salt)
      .agg(array_sort(collect_list(col("v"))).as("__vs"),
        count(lit(1)).as("__n"))
    ranked.crossJoin(broadcast(ref))
      .withColumn("matched", element_at(col("__vs"),
        (floor((floor(col("prank") * nQ) / lit(nQ.toDouble)) *
          (col("__n") - 1).cast("double")) + 1).cast("int")))
      .drop("__vs", "__n")
  }
}
