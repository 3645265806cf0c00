package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.PortableHash

/** Deterministic sampling operators for training-data pipelines. All
  * selection decisions derive from the engine-portable content hash
  * (graft.functions.PortableHash), not from RNG state, so (a) a sample is
  * reproducible run-to-run and engine-to-engine (the DuckDB oracle included),
  * (b) re-running over a grown dataset keeps previously selected rows
  * selected (stable under appends), and (c) no coordination is needed across
  * executors — every decision is a narrow per-row map, no shuffle.
  *
  * The reference engine has no sampling surface; these are the operations a
  * 100 TB corpus pipeline needs (down-sample a web crawl per source,
  * fixed-size per-stratum eval holdouts, mixture-weighted corpus assembly).
  */
object Sampling {

  /** Per-mille hash bucket (0..999) of a key column under a salt. The salt
    * decorrelates independent samples over the same keys (different salt →
    * statistically independent selection). The raw char poly hash is weakly
    * mixing for short sequential keys (consecutive ids hash to consecutive
    * values), so a final LCG round scrambles it before the bucket modulo —
    * portable Long arithmetic, every intermediate < 2^62.
    */
  def hashBucket(key: Column, salt: String, buckets: Int = 1000): Column = {
    val h = PortableHash.charPolyHash(concat(lit(salt + ":"), key.cast("string")))
    ((h * lit(1103515245L) + lit(12345L)) % lit(PortableHash.P)) % buckets
  }

  /** Keep approximately `fraction` of rows, decided by the key's hash bucket.
    * Narrow (no shuffle); at any scale this is a codegen'd filter that
    * composes with Parquet scan pushdown of other predicates.
    */
  def hashSample(df: DataFrame, key: Column, fraction: Double,
      salt: String = "smp"): DataFrame = {
    require(fraction >= 0 && fraction <= 1, s"fraction out of range: $fraction")
    df.filter(hashBucket(key, salt) < (fraction * 1000).toInt)
  }

  /** Stratified hash sampling: per-stratum keep fractions (e.g. language →
    * rate), applied as one codegen'd when-chain — no join, no shuffle.
    * Strata absent from `rates` use `defaultFraction`.
    */
  def stratifiedHashSample(df: DataFrame, stratum: Column, key: Column,
      rates: Map[String, Double], defaultFraction: Double = 1.0,
      salt: String = "smp"): DataFrame = {
    val permille = rates.toSeq.sortBy(_._1).foldLeft(lit((defaultFraction * 1000).toInt)) {
      case (acc, (s, f)) => when(stratum === s, lit((f * 1000).toInt)).otherwise(acc)
    }
    df.filter(hashBucket(key, salt) < permille)
  }

  /** Deterministic train/val/test split: label each row by its key's hash
    * bucket against cumulative per-mille thresholds. Content-hashed, so the
    * assignment is stable under appends and reshuffles (a document never
    * migrates between splits across pipeline runs — the property random
    * splits lose), and identically computable by any engine. Narrow map,
    * no shuffle. `weights` need not sum to 1; they are normalized.
    */
  def hashSplit(df: DataFrame, key: Column, weights: Seq[Double],
      labels: Seq[String], salt: String = "split",
      outCol: String = "split"): DataFrame = {
    require(weights.length == labels.length && weights.nonEmpty,
      "weights and labels must align")
    require(weights.forall(_ >= 0) && weights.sum > 0, s"bad weights: $weights")
    val cum = weights.scanLeft(0.0)(_ + _).tail.map(_ / weights.sum)
    val thresholds = cum.init.map(c => math.round(c * 1000).toInt)
    val b = hashBucket(key, salt)
    val label = thresholds.zip(labels.init).foldRight(lit(labels.last): Column) {
      case ((t, l), acc) => when(b < t, lit(l)).otherwise(acc)
    }
    df.withColumn(outCol, label)
  }

  /** Deterministic fixed-size per-stratum sample: the `n` rows with the
    * smallest key hashes in each stratum (ties broken by the key itself) —
    * the reproducible analog of per-key reservoir sampling. One shuffle on
    * the stratum column; Spark's WindowGroupLimit pushes the top-n below the
    * shuffle, so each map task forwards at most n rows per stratum.
    */
  def reservoirPerKey(df: DataFrame, stratum: Column, key: Column, n: Int,
      salt: String = "smp"): DataFrame = {
    val w = Window.partitionBy(stratum).orderBy(hashBucket(key, salt, 1 << 30), key)
    df.withColumn("sample_rank", row_number().over(w).cast("int"))
      .filter(col("sample_rank") <= n)
  }

  /** Importance-weighted deterministic sampling: keep each row with
    * probability `weight` (clamped to [0, 1]), decided by the key's hash
    * bucket — the selection step after DSIR-style importance weighting
    * turns per-row weights into an actual subcorpus. Same contract as
    * [[hashSample]]: reproducible, append-stable, engine-portable, and a
    * narrow codegen'd filter (no shuffle, composes with scan pushdown).
    * The weight is compared against a 2^20-bucket hash, so acceptance
    * probabilities are honored to ~1e-6 granularity.
    */
  def weightedHashSample(df: DataFrame, key: Column, weight: Column,
      salt: String = "wsmp"): DataFrame = {
    val b = 1 << 20
    df.filter(hashBucket(key, salt, b).cast("double") <
      greatest(lit(0.0), least(weight.cast("double"), lit(1.0))) * b)
  }

  /** Per-key quota cap (a crawl pipeline's per-domain caps): keep at most
    * quota(key) rows per key, preferring the `orderBy` prefix; keys absent
    * from `quotas` are capped at `defaultQuota`. Include a unique
    * tiebreaker in `orderBy` so the kept set is deterministic.
    *
    * Scale: the global maximum quota is applied as a rank filter BEFORE
    * the per-key quota join, which Spark plans as WindowGroupLimit — every
    * map task pre-prunes to maxQuota rows per key before the shuffle, so a
    * key with 10^9 rows ships ~maxQuota of them, not all (the quota table
    * is key-cardinality metadata and broadcasts; reading its max on the
    * driver is a one-row aggregate, not a data-plane collect).
    */
  def capPerKey(df: DataFrame, keyCol: String, orderBy: Seq[Column],
      quotas: DataFrame, defaultQuota: Long,
      quotaCol: String = "quota"): DataFrame = {
    require(defaultQuota >= 0, s"defaultQuota must be >= 0: $defaultQuota")
    val maxQuota = Option(
      quotas.agg(max(col(quotaCol).cast("long"))).head.get(0))
      .map(_.asInstanceOf[Long].max(defaultQuota)).getOrElse(defaultQuota)
    val w = Window.partitionBy(col(keyCol)).orderBy(orderBy: _*)
    df.withColumn("__rank", row_number().over(w))
      .filter(col("__rank") <= lit(maxQuota))
      .join(broadcast(quotas.select(col(keyCol),
        col(quotaCol).cast("long").as("__quota"))), Seq(keyCol), "left")
      .filter(col("__rank") <= coalesce(col("__quota"), lit(defaultQuota)))
      .drop("__rank", "__quota")
  }

  /** Mixture plan: given per-row strata and sizes (token counts), allocate a
    * global `budget` proportionally to each stratum's share of the total —
    * the planning step of mixture-weighted corpus assembly. Integer totals
    * (exact, order-independent); one double division per stratum and a floor,
    * so the result is bit-stable across engines. Two tiny aggregates; the
    * singleton total is broadcast.
    */
  /** Materialize a mixture plan: per stratum, keep rows in deterministic
    * content-hash order until the stratum's token budget fills (inclusive
    * running total ≤ budget). `budgets` is (stratum, alloc_tokens) — the
    * output of [[mixturePlan]], or hand-written targets. The hash order
    * makes the selected subset reproducible and append-stable: new
    * documents insert into the order but cannot displace the earlier
    * selection wholesale.
    *
    * Scale: a naive per-stratum running-sum window funnels each stratum's
    * entire row set through one task — with a handful of strata that is
    * the whole corpus through ~5 reducers. Instead the take is two-phase:
    * (1) a per-(stratum, coarse hash bucket) token histogram (metadata-
    * sized — |strata| × `coarseBuckets` rows — so its cumulative sum is a
    * window over an aggregate, not the corpus) yields each bucket's
    * starting offset `__before`; buckets that start past the budget are
    * dropped by the broadcast join. (2) The exact running sum then runs
    * partitioned by (stratum, BUCKET) — `coarseBuckets`-way parallel
    * within every stratum — seeded with the bucket's offset. Because the
    * bucket id is the top bits of the very hash the ordering uses, bucket
    * order = hash order and `__before + within-bucket cumsum` equals the
    * naive global cumsum exactly: output is row-for-row identical, but no
    * task ever sees more than ~1/coarseBuckets of a stratum. Sizes are
    * assumed non-negative (token counts).
    */
  def mixtureTake(df: DataFrame, stratum: Column, size: Column, key: Column,
      budgets: DataFrame, salt: String = "mix",
      coarseBuckets: Int = 1024): DataFrame = {
    require(coarseBuckets > 0 && (1 << 30) % coarseBuckets == 0,
      s"coarseBuckets must divide 2^30: $coarseBuckets")
    val bWidth = (1 << 30) / coarseBuckets
    val helperCols =
      Seq("__stratum", "__h", "__key", "__size", "__b", "__before", "__alloc", "__cum")
    val base = df.withColumn("__stratum", stratum)
      .withColumn("__h", hashBucket(key, salt, 1 << 30))
      .withColumn("__key", key)
      .withColumn("__size", size)
      .withColumn("__b", floor(col("__h") / bWidth).cast("int"))
    // Phase 1: bucket histogram → per-bucket starting offset vs the budget.
    val wb = Window.partitionBy("__stratum").orderBy("__b")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val buckets = base.groupBy(col("__stratum"), col("__b"))
      .agg(sum(col("__size")).as("__btok"))
      .withColumn("__incl", sum(col("__btok")).over(wb))
      .join(broadcast(budgets.select(col("stratum").as("__bstratum"),
        col("alloc_tokens").as("__alloc"))),
        col("__stratum") === col("__bstratum"))
      .withColumn("__before", col("__incl") - col("__btok"))
      .filter(col("__before") <= col("__alloc"))
      .select("__stratum", "__b", "__before", "__alloc")
    // Phase 2: bucket-parallel exact cumsum, seeded with the offset.
    val we = Window.partitionBy(col("__stratum"), col("__b"))
      .orderBy(col("__h"), col("__key"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base.join(broadcast(buckets), Seq("__stratum", "__b"))
      .withColumn("__cum", col("__before") + sum(col("__size")).over(we))
      .filter(col("__cum") <= col("__alloc"))
      .drop(helperCols: _*)
  }

  /** Deterministic global shuffle: assign every row a contiguous 1-based
    * position `outCol` in a pseudorandom-but-reproducible total order —
    * the training-data ordering step (shuffle once, train anywhere, replay
    * byte-identically). The order is (content hash, key): seeded by `salt`,
    * so different salts give independent epoch orders over the same corpus.
    * `key` must be unique per row or positions of tied rows are undefined.
    *
    * Scale: a naive `row_number() OVER (ORDER BY hash)` funnels the whole
    * corpus through ONE task. Instead the rank is two-phase, like
    * [[mixtureTake]]: bucket = top bits of the ordering hash (so bucket
    * order = hash order), per-bucket counts aggregate map-side to a
    * `buckets`-row table whose exclusive prefix sum (a window over
    * metadata, not data) seeds each bucket's offset; the exact row_number
    * then runs partitioned by bucket — `buckets`-way parallel — and
    * offset + within-bucket rank reproduces the global rank exactly.
    */
  def deterministicShuffle(df: DataFrame, key: Column, salt: String = "shuf",
      buckets: Int = 4096, outCol: String = "pos"): DataFrame = {
    require(buckets > 0 && (1 << 30) % buckets == 0,
      s"buckets must divide 2^30: $buckets")
    val bWidth = (1 << 30) / buckets
    val base = df.withColumn("__h", hashBucket(key, salt, 1 << 30))
      .withColumn("__key", key)
      .withColumn("__b", floor(col("__h") / bWidth).cast("int"))
    twoPhaseRank(base, Nil, Seq(col("__h"), col("__key")), outCol)
      .drop("__h", "__key", "__b")
  }

  /** Percent-rank normalization of a numeric column, globally or per
    * `groupCols` stratum — SQL `percent_rank() OVER ([PARTITION BY g]
    * ORDER BY value)` semantics: rows-strictly-below / (n − 1), ties
    * sharing one rank — the step that puts heterogeneous quality signals
    * (a Gopher score, an LM perplexity, a classifier margin) on one
    * comparable [0, 1] scale before fusing them, or normalizes a score
    * within each language before mixing strata.
    *
    * Scale shape: ranking DISTINCT values, not rows, so a hot tied score
    * (10^8 zeros) is ONE row in the ranked table — no tie funnel. One
    * groupBy collapses rows to (value, count); the strictly-below running
    * count is the two-phase bucketed cumsum of [[deterministicShuffle]]
    * (value-range buckets, metadata-window offsets, per-bucket exclusive
    * prefix); the result joins back on the value key. Two shuffles
    * regardless of tie structure; only min/max/total (three scalars)
    * reach the driver. Rows with a null value keep a null rank.
    */
  def percentRank(df: DataFrame, valueCol: String, buckets: Int = 1024,
      outCol: String = "prank", groupCols: Seq[String] = Nil): DataFrame = {
    require(buckets >= 1, s"bad buckets: $buckets")
    val gs = groupCols
    val counts = df.filter(col(valueCol).isNotNull)
      .groupBy(gs.map(col) :+ col(valueCol).cast("double").as("__v"): _*)
      .agg(count(lit(1)).as("__c"))
    val range = counts.agg(min("__v"), max("__v")).head()
    if (range.isNullAt(0)) return df.withColumn(outCol, lit(null).cast("double"))
    val lo = range.getDouble(0)
    // global value-range buckets align with the value order inside EVERY
    // group, so one boundary set serves all strata
    val width = math.max((range.getDouble(1) - lo) / buckets,
      java.lang.Double.MIN_VALUE)
    val b = counts.withColumn("__b",
      least(floor((col("__v") - lo) / width).cast("int"), lit(buckets - 1)))
    val ow = Window.partitionBy(gs.map(col): _*).orderBy("__b")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = b.groupBy((gs :+ "__b").map(col): _*).agg(sum("__c").as("__n"))
      .withColumn("__off", coalesce(sum("__n").over(ow), lit(0L)))
      .select((gs :+ "__b" :+ "__off").map(col): _*)
    val iw = Window.partitionBy((gs :+ "__b").map(col): _*).orderBy("__v")
      .rowsBetween(Window.unboundedPreceding, -1)
    val below = b.join(broadcast(offs), gs :+ "__b")
      .withColumn("__below", col("__off") + coalesce(sum("__c").over(iw), lit(0L)))
      .select((gs :+ "__v" :+ "__below").map(col): _*)
    val nPer = counts.groupBy(gs.map(col): _*).agg(sum("__c").as("__ntot"))
    val withV = df.withColumn("__v", col(valueCol).cast("double"))
    val j1 = withV.join(below, gs :+ "__v", "left")
    val j2 = if (gs.isEmpty) j1.crossJoin(broadcast(nPer))
             else j1.join(broadcast(nPer), gs, "left")
    j2.withColumn(outCol,
        when(col("__v").isNotNull && col("__ntot") > 1,
          col("__below").cast("double") / (col("__ntot") - 1).cast("double"))
          .when(col("__v").isNotNull, lit(0.0)))
      .drop("__v", "__below", "__ntot")
  }

  /** The two-phase distributed rank shared by [[deterministicShuffle]] and
    * [[interleaveStrata]]: given a `__b` bucket column ALIGNED with the
    * `ord` order (bucket boundaries never split the order), per-(part,
    * bucket) counts aggregate map-side into a metadata-sized table whose
    * exclusive prefix sum (a window over the aggregate, per part) seeds
    * each bucket's offset; the exact row_number then runs partitioned by
    * (part, bucket) — buckets-way parallel — and offset + in-bucket rank
    * reproduces the per-part global rank exactly.
    */
  private[operators] def twoPhaseRank(base: DataFrame, part: Seq[String],
      ord: Seq[Column], outCol: String): DataFrame = {
    val grp = part :+ "__b"
    val ow = (if (part.isEmpty) Window.partitionBy()
              else Window.partitionBy(part.map(col): _*))
      .orderBy(col("__b")).rowsBetween(Window.unboundedPreceding, -1)
    val offs = base.groupBy(grp.map(col): _*).agg(count(lit(1)).as("__n"))
      .withColumn("__off", coalesce(sum(col("__n")).over(ow), lit(0L)))
      .select((grp :+ "__off").map(col): _*)
    val rw = Window.partitionBy(grp.map(col): _*).orderBy(ord: _*)
    base.join(broadcast(offs), grp)
      .withColumn(outCol, col("__off") + row_number().over(rw).cast("long"))
      .drop("__off")
  }

  /** Fair deterministic epoch interleave: a contiguous 1-based training
    * order that ROUND-ROBINS across strata — position r of every stratum
    * precedes position r+1 of any stratum, so a mixture's components stay
    * evenly spread through the epoch instead of clumping (the data-mixing
    * complement of [[deterministicShuffle]], which ignores strata). Within
    * a stratum the order is the salted content hash, so epochs replay
    * byte-identically and different salts give independent orders.
    * `key` must be unique per row.
    *
    * Scale shape: three metadata-windowed two-phase ranks and ONE tiny
    * global aggregate — (1) the per-stratum rank runs (stratum × bucket)-
    * parallel with per-stratum bucket offsets, (2) stratum indexes come
    *  from a distinct-strata table (strata-row metadata), (3) the global
    * interleave rank runs over the composite (rank-1)·S + stratumIdx,
    * re-bucketed by value range — monotone, so bucket order = composite
    * order. No step funnels the corpus through one task.
    */
  def interleaveStrata(df: DataFrame, stratum: Column, key: Column,
      salt: String = "ilv", buckets: Int = 1024, outCol: String = "pos"): DataFrame = {
    require(buckets > 0 && (1 << 30) % buckets == 0,
      s"buckets must divide 2^30: $buckets")
    val bWidth = (1 << 30) / buckets
    val base = df.withColumn("__st", stratum)
      .withColumn("__h", hashBucket(key, salt, 1 << 30))
      .withColumn("__key", key)
      .withColumn("__b", floor(col("__h") / bWidth).cast("int"))
    val ranked = twoPhaseRank(base, Seq("__st"), Seq(col("__h"), col("__key")), "__r")
    // stratum → dense index, plus the stratum count (strata-row metadata)
    val sidx = base.select(col("__st")).distinct()
      .withColumn("__idx", row_number().over(Window.orderBy(col("__st"))).cast("long") - 1)
      .withColumn("__s", count(lit(1)).over(Window.partitionBy()))
    val withOrd = ranked.join(broadcast(sidx), Seq("__st"))
      .withColumn("__ord", (col("__r") - 1) * col("__s") + col("__idx"))
    // re-bucket by composite value range (monotone → order-aligned); the
    // max is a single-row aggregate broadcast back into the scan
    val mx = withOrd.agg(max(col("__ord")).as("__mx"))
    val base2 = withOrd.crossJoin(broadcast(mx))
      // integer DIV: double division would misalign bucket edges past 2^53
      .withColumn("__b", expr(s"CAST((__ord * $buckets) DIV (__mx + 1) AS INT)"))
    twoPhaseRank(base2, Nil, Seq(col("__ord")), outCol)
      .drop("__st", "__h", "__key", "__b", "__r", "__idx", "__s", "__ord", "__mx")
  }

  def mixturePlan(df: DataFrame, stratum: Column, size: Column,
      budget: Long): DataFrame = {
    val per = df.groupBy(stratum.as("stratum"))
      .agg(count(lit(1)).as("n_docs"), sum(size).as("stratum_tokens"))
    // the cross-stratum total is an unpartitioned window over the
    // STRATA-sized aggregate output — |strata| rows, metadata, not data —
    // so the corpus is scanned ONCE (an agg + crossJoin(broadcast) form
    // recomputes `per`, i.e. re-scans the corpus, since the two exchange
    // subtrees differ and cannot be reused). Long sums are
    // order-independent, so the total is exact either way.
    per.withColumn("total_tokens",
      sum("stratum_tokens").over(Window.partitionBy(Seq.empty[Column]: _*)))
      .withColumn("share",
        col("stratum_tokens").cast("double") / col("total_tokens").cast("double"))
      .withColumn("alloc_tokens", floor(lit(budget.toDouble) * col("share")).cast("long"))
      .drop("total_tokens")
  }

  /** Temperature-flattened mixture plan: allocate `budget` tokens across
    * strata proportionally to share^(1/τ) — τ > 1 flattens the mixture
    * toward uniform (the multilingual/low-resource up-weighting trick),
    * τ = 1 recovers [[mixturePlan]]'s proportional split. Since
    * share^(1/τ) = tokens^(1/τ) / total^(1/τ) and the total factor cancels
    * in normalization, weights are computed directly on the per-stratum
    * token counts.
    *
    * Determinism: each weight is floor(tokens^(1/τ)) as a long, so the
    * cross-stratum total is an integer sum (order-independent); the final
    * allocation is a multiply and a divide, both exactly rounded in
    * IEEE-754. With τ = 2 the root is `sqrt`, which IEEE requires correctly
    * rounded — any engine reproduces the plan bit-for-bit. Other τ go
    * through `pow`, where libm implementations may differ in the last ulp
    * (almost always absorbed by the floor). Same two tiny aggregates as
    * [[mixturePlan]]; the singleton total broadcasts.
    */
  def mixturePlanTemperature(df: DataFrame, stratum: Column, size: Column,
      budget: Long, tau: Double = 2.0): DataFrame = {
    require(tau > 0, s"tau must be > 0: $tau")
    val t = col("stratum_tokens").cast("double")
    val root =
      if (tau == 1.0) t
      else if (tau == 2.0) sqrt(t)
      else pow(t, 1.0 / tau)
    val per = df.groupBy(stratum.as("stratum"))
      .agg(count(lit(1)).as("n_docs"), sum(size).as("stratum_tokens"))
      .withColumn("weight", floor(root).cast("long"))
    // same single-scan shape as mixturePlan: the total is a window over
    // the strata-sized aggregate, never a second corpus pass
    per.withColumn("total_weight",
      sum("weight").over(Window.partitionBy(Seq.empty[Column]: _*)))
      .withColumn("alloc_tokens",
        floor(lit(budget.toDouble) * col("weight").cast("double") /
          col("total_weight").cast("double")).cast("long"))
      .drop("total_weight")
  }

  /** Deterministic contrastive negative sampling: up to `k` pseudo-random
    * corpus candidates per anchor — the in-batch-negatives replacement a
    * contrastive/embedding training pipeline needs — without any cross
    * join. Candidates land in `buckets` hash buckets; draw j sends the
    * anchor to bucket hash(anchor:j) and takes the candidate minimizing
    * hash(anchor:j:cand) inside it (the anchor itself excluded). Each
    * (anchor, draw) probes ONE bucket of ~|corpus|/buckets candidates via
    * an equi shuffle join + partial-aggregated min-of-struct, so total
    * cost is |anchors|·k·|corpus|/buckets — `buckets` dials probe width
    * against per-bucket candidate diversity. Fully deterministic under
    * `salt` (PortableHash end to end, oracle-replayable); a draw whose
    * bucket holds no eligible candidate yields no row, and two draws that
    * land in one bucket can repeat a negative — dedup downstream if draws
    * must be distinct.
    */
  def negativeSample(anchors: DataFrame, corpus: DataFrame,
                     anchorIdCol: String, candIdCol: String, k: Int,
                     buckets: Int = 64, salt: String = "neg"): DataFrame = {
    require(k >= 1 && buckets >= 1, "k and buckets must be positive")
    val cands = corpus.select(col(candIdCol).as("neg_id"),
      hashBucket(col(candIdCol).cast("string"), salt, buckets).as("__b"))
    val draws = anchors.select(col(anchorIdCol).as("anchor_id"))
      .withColumn("draw", explode(sequence(lit(1), lit(k))))
      .withColumn("__b", hashBucket(
        concat(col("anchor_id").cast("string"), lit(":"), col("draw").cast("string")),
        salt, buckets))
    draws.join(cands, "__b")
      .filter(col("neg_id") =!= col("anchor_id"))
      .withColumn("__th", hashBucket(
        concat(col("anchor_id").cast("string"), lit(":"),
          col("draw").cast("string"), lit(":"), col("neg_id").cast("string")),
        salt, 1 << 30))
      .groupBy("anchor_id", "draw")
      .agg(min(struct(col("__th"), col("neg_id"))).as("__m"))
      .select(col("anchor_id"), col("draw"), col("__m.neg_id").as("neg_id"))
  }

  /** Split-integrity screen: rows of one GROUP (a user, a near-dup
    * cluster, a conversation) must not span train/val/test — splitting by
    * row while grouping exists leaks evaluation data into training. Emits
    * the violating groups with their row count, number of splits touched,
    * and the sorted split list (as one string — portable to any oracle).
    * Empty result = split is group-clean. One partial-aggregating
    * groupBy; run it as the assertion AFTER any [[hashSplit]] whose key
    * is finer than the leakage unit (the fix is splitting BY the group
    * key instead).
    */
  def splitLeakage(df: DataFrame, groupCol: Column, splitCol: Column): DataFrame =
    df.groupBy(groupCol.as("group"))
      .agg(count(lit(1)).as("n_rows"),
        count_distinct(splitCol).as("n_splits"),
        array_join(array_sort(collect_set(splitCol)), ",").as("splits"))
      .filter(col("n_splits") > 1)
}
