package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Byte-pair-encoding vocabulary induction and segmentation — the end-to-end
  * tokenizer-training path on top of [[TextAnalysis.pairCounts]]'s statistic.
  *
  * Scale shape: the distributed part of training is ONE word-frequency
  * aggregation (map-side partials; output bounded by the vocabulary, capped
  * at `maxVocab` by frequency). The merge loop then runs driver-side over
  * that dictionary — each merge rescans the *dictionary* (≤ maxVocab short
  * words), never the corpus. This is the standard scalable BPE trainer: a
  * 100 TB corpus contributes exactly one shuffle, after which training cost
  * is independent of corpus size. Segmentation is a pure per-row function of
  * the (small) merge table, shipped in the UDF closure.
  */
object Bpe {

  /** A fixed, data-independent merge table for oracle-checked segmentation
    * (q92): every pair's parts are single characters or results of earlier
    * merges ("rank-consistent"), which makes the priority-loop apply
    * ([[segmentToken]]) provably equal to replaying the merges once in
    * rank order — the form a SQL oracle can express with nested string
    * replaces over a symbol-delimited encoding.
    */
  val demoMerges: Seq[(String, String)] = Seq(
    "t" -> "a", "l" -> "e", "ta" -> "b", "tab" -> "le", "s" -> "c",
    "sc" -> "a", "r" -> "o", "ro" -> "w", "d" -> "a", "t" -> "h", "th" -> "e")

  /** Learn `numMerges` merges from the corpus. Deterministic: pair-count
    * ties break to the lexicographically smallest (left, right) pair, and
    * the word dictionary is capped by (count desc, word) order.
    *
    * Cost note: BPE's merge ordering is inherently sequential — merge i's
    * pair counts depend on merge i−1 — so this runs ONE driver round-trip
    * per merge over the (bounded, `maxVocabWords`) word dictionary. Fine
    * at the documented vocab scale (word dict is metadata-sized; corpus
    * size only affects the single counting pass); at 32k-merge production
    * vocabularies the standard path is: learn on a word-count SAMPLE here
    * (the dictionary saturates quickly), or import an externally trained
    * merge table and use [[segment]] — segmentation, not learning, is the
    * corpus-scale operation, and it is a narrow zero-shuffle map.
    */
  def learn(df: DataFrame, numMerges: Int, minWordCount: Long = 1L,
            maxVocab: Int = 100000, textCol: String = "text"): Seq[(String, String)] = {
    val words = df
      .select(explode(TextAnalysis.tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .filter(col("c") >= minWordCount)
      .orderBy(col("c").desc, col("w"))
      .limit(maxVocab)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    learnFromCounts(words, numMerges)
  }

  /** The driver-side trainer over a word-frequency dictionary. */
  def learnFromCounts(words: Seq[(String, Long)], numMerges: Int): Seq[(String, String)] = {
    var dict: Array[(Array[String], Long)] =
      words.map { case (w, c) => (w.map(_.toString).toArray, c) }.toArray
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var exhausted = false
    while (merges.length < numMerges && !exhausted) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      dict.foreach { case (syms, c) =>
        var j = 0
        while (j < syms.length - 1) {
          val p = (syms(j), syms(j + 1))
          counts(p) = counts.getOrElse(p, 0L) + c
          j += 1
        }
      }
      if (counts.isEmpty) exhausted = true
      else {
        val best = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best
        dict = dict.map { case (syms, c) => (mergePair(syms, best), c) }
      }
    }
    merges.toSeq
  }

  /** Merge every adjacent occurrence of `p` in a symbol sequence. */
  private def mergePair(syms: Array[String], p: (String, String)): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var j = 0
    while (j < syms.length) {
      if (j < syms.length - 1 && syms(j) == p._1 && syms(j + 1) == p._2) {
        out += (p._1 + p._2); j += 2
      } else { out += syms(j); j += 1 }
    }
    out.toArray
  }

  /** Segment one token: repeatedly merge the adjacent pair with the lowest
    * merge rank (all its occurrences at once) until no learned pair remains
    * — the standard BPE apply algorithm.
    */
  def segmentToken(tok: String, rank: Map[(String, String), Int]): Seq[String] = {
    var syms = tok.map(_.toString).toArray
    var done = syms.length < 2
    while (!done) {
      var bestRank = Int.MaxValue
      var best: (String, String) = null
      var j = 0
      while (j < syms.length - 1) {
        val p = (syms(j), syms(j + 1))
        val r = rank.getOrElse(p, Int.MaxValue)
        if (r < bestRank) { bestRank = r; best = p }
        j += 1
      }
      if (best == null) done = true
      else {
        syms = mergePair(syms, best)
        done = syms.length < 2
      }
    }
    syms.toSeq
  }

  /** Add a `subwords` array column: every whitespace token segmented by the
    * learned merges. Per-row imperative merging has no `functions._`
    * equivalent, so this is the one deliberate UDF in the text stack — still
    * a narrow map, no shuffle, and the merge table rides the closure as a
    * broadcast-sized Map.
    */
  def segment(df: DataFrame, merges: Seq[(String, String)],
              textCol: String = "text", outCol: String = "subwords"): DataFrame = {
    val rank: Map[(String, String), Int] = merges.zipWithIndex.toMap
    val seg = udf((text: String) =>
      if (text == null) null
      else text.split("\\s+").filter(_.nonEmpty).toSeq
        .flatMap(t => segmentToken(t, rank)))
    df.withColumn(outCol, seg(col(textCol)))
  }
}
