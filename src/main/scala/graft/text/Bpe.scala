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

  /** The driver-side trainer over a word-frequency dictionary.
    *
    * Merges are applied in provably-safe BATCHES: each round counts pairs
    * once, then accepts a descending-count prefix of merges that the
    * sequential algorithm would have picked in exactly that order — so a
    * 32k-merge vocabulary takes hundreds of dictionary scans instead of
    * 32k, with BIT-IDENTICAL output (property-tested against the
    * `maxBatch = 1` sequential path). A prefix merge is safe when
    * (a) it shares no symbol — left, right, or concatenation — with an
    * earlier accepted merge (its own count is then unchanged by them), and
    * (b) its count strictly exceeds a conservative upper bound on every
    * pair an earlier accepted merge could CREATE or inflate: a merge
    * (a,b) only creates pairs (x,ab)/(ab,y) at its own merge sites, so
    * each is bounded by min(c_ab, c_(x,a)) (resp. c_(b,y)) plus the
    * pre-existing count of the collision pair. The first conflict or
    * bound violation ends the batch — acceptance is always a contiguous
    * prefix of the sorted candidates, which is what makes the equivalence
    * proof an induction instead of a heuristic.
    */
  def learnFromCounts(words: Seq[(String, Long)], numMerges: Int,
                      maxBatch: Int = 256): Seq[(String, String)] =
    learnFromCountsWithRounds(words, numMerges, maxBatch)._1

  /** [[learnFromCounts]] plus the number of dictionary-scan rounds taken —
    * exposed so the batching win is testable and loggable.
    */
  def learnFromCountsWithRounds(words: Seq[(String, Long)], numMerges: Int,
                                maxBatch: Int = 256): (Seq[(String, String)], Int) = {
    require(maxBatch >= 1, s"maxBatch must be >= 1: $maxBatch")
    var dict: Array[(Array[String], Long)] =
      words.map { case (w, c) => (w.map(_.toString).toArray, c) }.toArray
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var rounds = 0
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
        val batch = selectSafeBatch(counts,
          math.min(maxBatch, numMerges - merges.length))
        merges ++= batch
        // batch merges share no symbols, so one left-to-right pass per
        // word applies all of them without interaction
        dict = dict.map { case (syms, c) =>
          (batch.foldLeft(syms)((s, p) => mergePair(s, p)), c)
        }
        rounds += 1
      }
    }
    if (rounds > 0)
      org.slf4j.LoggerFactory.getLogger("graft.text.Bpe").info(
        s"bpe learn: ${merges.length} merges in $rounds dictionary rounds " +
          s"(batching ${if (rounds < merges.length) "saved " +
            (merges.length - rounds) + " scans" else "had no win on this corpus"})")
    (merges.toSeq, rounds)
  }

  /** The descending-(count, pair) prefix of merges the sequential trainer
    * would pick in this exact order — see [[learnFromCounts]] for the two
    * acceptance conditions and why stopping at the FIRST violation (rather
    * than skipping) is required for exactness.
    */
  private def selectSafeBatch(counts: scala.collection.Map[(String, String), Long],
                              maxTake: Int): Seq[(String, String)] = {
    val sorted = counts.toSeq.sortBy { case ((a, b), c) => (-c, a, b) }
    // neighbor indexes for the created-pair bounds
    val byLeft = sorted.groupBy(_._1._1)
    val byRight = sorted.groupBy(_._1._2)
    val used = scala.collection.mutable.HashSet.empty[String]
    val acc = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    // per-CREATED-PAIR upper bounds, accumulated ADDITIVELY across the
    // accepted merges: one created pair can draw contributions from TWO
    // different merges (their concatenations can collide with existing
    // symbol strings), so a max of independent per-merge bounds would
    // under-estimate it — each key starts at its pre-batch count and
    // gains min(c_merge, c_neighbor) per contributing merge family
    val createdBound = scala.collection.mutable.HashMap.empty[(String, String), Long]
    var createdCap = Long.MinValue
    def bump(key: (String, String), contribution: Long): Unit = {
      val next = createdBound.getOrElse(key, counts.getOrElse(key, 0L)) + contribution
      createdBound(key) = next
      if (next > createdCap) createdCap = next
    }
    // accepted concatenations with their merge counts, for the
    // new-symbol × new-symbol created pairs below
    val accConcat = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    var stop = false
    val it = sorted.iterator
    while (!stop && acc.length < maxTake && it.hasNext) {
      val ((a, b), c) = it.next()
      if (acc.nonEmpty && c <= createdCap) stop = true
      else if (used(a) || used(b) || used(a + b)) stop = true
      else {
        acc += ((a, b))
        used += a; used += b; used += (a + b)
        val ab = a + b
        // every pair this merge can create or inflate, bounded from above
        byRight.getOrElse(a, Nil).foreach { case ((x, _), cxa) =>
          bump((x, ab), math.min(c, cxa))
        }
        byLeft.getOrElse(b, Nil).foreach { case ((_, y), cby) =>
          bump((ab, y), math.min(c, cby))
          // a b a b → (ab, ab): the (b, a) neighbor can close on itself
          if (y == a) bump((ab, ab), math.min(c, cby))
        }
        // pairs of two NEW symbols: chains `a' b' a b` fold into
        // (a'b', ab) — at most min of the two merges' site counts per
        // direction, and bump() seeds any colliding pre-batch count
        // (both concatenations can equal existing symbol strings)
        accConcat.foreach { case (ab0, c0) =>
          bump((ab0, ab), math.min(c0, c))
          bump((ab, ab0), math.min(c0, c))
        }
        accConcat += ((ab, c))
      }
    }
    acc.toSeq
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
