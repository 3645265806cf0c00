package graft.pipelines

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.operators.{Packing, Sampling}
import graft.text.TextAnalysis

/** The standard pre-training corpus curation pipeline, composed end-to-end
  * from the library's operators: quality screen → PII scrub → exact dedup →
  * MinHash near-dedup (LSH candidates → verified pairs → connected
  * components → one survivor per cluster) → eval-set decontamination →
  * context-window chunking → deterministic train/val/test split → greedy
  * sequence packing.
  *
  * This module only composes operators documented in SURVEY §2.9; every
  * stage's scale shape is its operator's (SCALING.md). The composition
  * stays lazy end-to-end: one DataFrame in, one out, so Catalyst fuses the
  * narrow stages (quality features, scrub, split labels) into the same
  * scan and the pipeline's shuffles are exactly the dedup joins, the
  * chunk-pack repartition, and nothing else.
  */
object Curation {

  /** Pipeline knobs; defaults are testing-scale, not production-scale. */
  case class Config(
      minTokens: Long = 5L,
      maxTokens: Long = 1000000L,
      maxStopwordRatio: Double = 1.0,
      dedupShingleN: Int = 3,
      dedupK: Int = 16,
      dedupBands: Int = 4,
      dedupThreshold: Double = 0.5,
      decontamN: Int = 8,
      chunkTokens: Int = 64,
      chunkOverlap: Int = 8,
      packCapacity: Long = 256L,
      splitWeights: Seq[Double] = Seq(0.9, 0.05, 0.05),
      splitLabels: Seq[String] = Seq("train", "val", "test"))

  /** Run the full pipeline. `docs` needs (doc_id, text); `evalSet` needs
    * (text) — pass an empty frame to skip decontamination. Output rows are
    * packed training chunks: (split, pack_id, pack_pos, doc_id, chunk_idx,
    * chunk_text, n_chunk_tokens).
    */
  def curate(docs: DataFrame, evalSet: DataFrame,
             cfg: Config = Config()): DataFrame = {
    // 1. quality screen: token-count window + stopword-ratio cap, on the
    //    PII-redacted text (narrow maps, fused into the scan)
    val scrubbed = TextAnalysis.withPiiScrub(docs)
      .select(col("doc_id"), col("text_redacted").as("text"))
    val quality = graft.plans.PushdownBarrier(TextAnalysis.withQualityFeatures(scrubbed))
      .filter(col("n_tokens").between(cfg.minTokens, cfg.maxTokens) &&
        col("stopword_ratio") <= cfg.maxStopwordRatio)
      .select("doc_id", "text")

    // 2. exact dedup on the normalized text (min doc_id survives)
    val exact = Dedup.exactSurvivors(
      quality.withColumn("__norm", TextAnalysis.normalize(col("text"))),
      textCol = "__norm").drop("__norm")

    // 3. near-dedup: LSH candidates → exact-Jaccard verify → components →
    //    one survivor per cluster
    val pairs = Dedup.minHashDedup(exact, cfg.dedupShingleN, cfg.dedupK,
      cfg.dedupBands, cfg.dedupThreshold)
    val survivors = Dedup.clusterSurvivors(exact, Dedup.dupClusters(pairs))

    // 4. decontamination: drop docs sharing an n-gram shingle with the eval set
    val keepIds = Dedup.decontaminate(survivors, evalSet, cfg.decontamN)
      .filter(!col("contaminated")).select("doc_id")
    val clean = survivors.join(keepIds, Seq("doc_id"), "left_semi")

    // 5. chunk into context windows, then split (per chunk, content-stable)
    //    and greedy-pack per split. chunk_key doubles as the deterministic
    //    pack order (unique per row — ties would make packing ambiguous).
    val chunks = TextAnalysis.chunk(clean, cfg.chunkTokens, cfg.chunkOverlap)
      .withColumn("chunk_key",
        concat(col("doc_id").cast("string"), lit("_"), col("chunk_idx")))
    val split = Sampling.hashSplit(chunks, col("chunk_key"),
      cfg.splitWeights, cfg.splitLabels)
    Packing.packGreedy(split, groupCol = "split", orderCol = "chunk_key",
      sizeCol = "n_chunk_tokens", capacity = cfg.packCapacity)
      .select("split", "pack_id", "pack_pos", "doc_id", "chunk_idx",
        "chunk_text", "n_chunk_tokens")
  }
}
