package graft

import org.apache.spark.sql.functions._

import graft.pipelines.Curation

class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("end-to-end curation drops junk, dups, and contaminated docs, then packs") {
    val base = "the quick brown fox jumps over the lazy dog and runs far away today"
    val docs = Seq(
      (1L, base),                                   // keeper
      (2L, base),                                   // exact dup of 1 -> dropped
      (3L, base.replace("today", "tonight")),       // near dup of 1 -> dropped
      (4L, "tiny"),                                 // under minTokens -> dropped
      (5L, "completely different text about ships sailing across wide oceans at night with stars"),
      (6L, "eval secret alpha beta gamma delta epsilon zeta eta theta plus trailing context words here")
    ).toDF("doc_id", "text")
    // eval set shares an 8-gram with doc 6 only
    val evalSet = Seq("eval secret alpha beta gamma delta epsilon zeta eta theta")
      .toDF("text")
    val cfg = Curation.Config(minTokens = 5L, dedupShingleN = 2,
      dedupThreshold = 0.5, decontamN = 8, chunkTokens = 8, chunkOverlap = 2,
      packCapacity = 16L, splitWeights = Seq(1.0), splitLabels = Seq("train"))
    val out = Curation.curate(docs, evalSet, cfg)
    val kept = out.select("doc_id").distinct().as[Long].collect().toSet
    assert(kept == Set(1L, 5L))
    // packing respects capacity within every (split, pack)
    val over = out.groupBy("split", "pack_id")
      .agg(sum("n_chunk_tokens").as("s")).filter(col("s") > 16L).count()
    assert(over == 0)
    // chunk text reassembles the kept documents' token stream (stride 6,
    // overlap 2): first chunk starts with the first token
    val first = out.filter(col("doc_id") === 1L && col("chunk_idx") === 0)
      .select("chunk_text").as[String].collect().head
    assert(first.startsWith("the quick brown"))
  }

  test("curation is deterministic across runs") {
    val docs = sf("documents").limit(60)
    val evalSet = Seq("nothing matches this eval sentence at all").toDF("text")
    val cfg = Curation.Config()
    val a = Curation.curate(docs, evalSet, cfg).collect().map(_.toString).sorted
    val b = Curation.curate(docs, evalSet, cfg).collect().map(_.toString).sorted
    assert(a.sameElements(b))
  }
}
