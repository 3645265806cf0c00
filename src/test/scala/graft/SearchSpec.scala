package graft

import graft.text.Search

class SearchSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "spark merge join spark spark"),
    (2L, "merge sort merge"),
    (3L, "window functions here"),
    (4L, "totally unrelated words")).toDF("doc_id", "text")

  /** Independent scalar reference over the tiny corpus. */
  private def refScore(terms: Seq[String], k1: Double = 1.2, b: Double = 0.75)
      : Map[Long, (Long, Long)] = {
    val docs = Map(
      1L -> Seq("spark", "merge", "join", "spark", "spark"),
      2L -> Seq("merge", "sort", "merge"),
      3L -> Seq("window", "functions", "here"),
      4L -> Seq("totally", "unrelated", "words"))
    val n = docs.size.toLong
    val avgdl = docs.values.map(_.size).sum.toDouble / n.toDouble
    val df = docs.values.flatMap(_.distinct).groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
    val perDoc = for {
      (id, toks) <- docs.toSeq
      term <- terms.distinct if toks.contains(term)
    } yield {
      val tf = toks.count(_ == term).toDouble
      val dl = toks.size.toDouble
      val tfF = tf * (k1 + 1.0) / (tf + k1 * ((1.0 - b) + b * dl / avgdl))
      val idfR = ((n - df(term)).toDouble + 0.5) / (df(term).toDouble + 0.5)
      id -> math.floor(tfF * idfR * Search.Scale.toDouble).toLong
    }
    perDoc.groupBy(_._1).map { case (id, xs) =>
      id -> (xs.map(_._2).sum, xs.size.toLong)
    }
  }

  test("index counts postings, lengths, df, N, avgdl exactly") {
    val idx = Search.bm25Index(corpus)
    assert(idx.nDocs == 4L)
    assert(idx.avgDl == (5 + 3 + 3 + 3).toDouble / 4.0)
    val post = idx.postings.collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(post((1L, "spark")) == 3L && post((1L, "merge")) == 1L)
    assert(post((2L, "merge")) == 2L)
    val dfreq = idx.dfreq.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(dfreq("merge") == 2L && dfreq("spark") == 1L)
    val dl = idx.lengths.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dl == Map(1L -> 5L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("quantized scores match an independent scalar reference") {
    val terms = Seq("spark", "merge", "window")
    val idx = Search.bm25Index(corpus)
    val got = Search.bm25Score(idx, terms).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == refScore(terms), s"got $got expected ${refScore(terms)}")
    // unmatched doc 4 absent; score_ln finite and positive on matches
    assert(!got.contains(4L))
    val ln = Search.bm25Score(idx, terms).collect()
      .map(r => r.getDouble(3))
    assert(ln.forall(v => v > 0.0 && !v.isNaN))
  }

  test("topK ranks by score desc with deterministic id ties, k bounds rows") {
    val idx = Search.bm25Index(corpus)
    val top = Search.bm25TopK(idx, Seq("spark", "merge", "window"), k = 2)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("rank")))
    assert(top.length == 2)
    assert(top.map(_._2).toSeq == Seq(1, 2))
    val ref = refScore(Seq("spark", "merge", "window"))
    val order = ref.toSeq.sortBy { case (id, (s, _)) => (-s, id) }.map(_._1)
    assert(top.map(_._1).toSeq == order.take(2))
  }

  test("duplicate query terms are deduped; empty query rejected") {
    val idx = Search.bm25Index(corpus)
    val once = Search.bm25Score(idx, Seq("merge")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val twice = Search.bm25Score(idx, Seq("merge", "merge")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(once == twice)
    intercept[IllegalArgumentException](Search.bm25Score(idx, Seq.empty))
  }

  test("table-driven profile scores identically to the Seq form (seed expansion)") {
    val idx = Search.bm25Index(corpus)
    val fromSeq = Search.bm25Score(idx, Seq("spark", "merge")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val profile = Seq("spark", "merge", "merge").toDF("term")
    val fromDf = Search.bm25ScoreProfile(idx, profile).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fromSeq == fromDf)
    // the composed seed-expansion shape: topTerms of a seed doc as profile
    val seeds = corpus.filter($"doc_id" === 1L)
    val seedProfile = graft.text.TextAnalysis.topTerms(seeds, k = 2)
      .select("term")
    val expanded = Search.bm25ScoreProfile(idx, seedProfile).collect()
    assert(expanded.nonEmpty)
  }

  test("rrf fusion: quantized contributions, overlap wins, ties break on id") {
    def c(r: Int): Long = (Search.Scale.toDouble / (60.0 + r.toDouble)).toLong
    val lex = Seq((1L, 1), (2L, 2)).toDF("doc_id", "rank")
    val vec = Seq((2L, 1), (3L, 2)).toDF("doc_id", "rank")
    val fused = Search.rrfFuse(Seq(lex, vec)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    // doc 2 appears in both lists and must fuse to the top
    assert(fused.toSeq == Seq(
      (2L, c(1) + c(2), 2L, 1),
      (1L, c(1), 1L, 2),
      (3L, c(2), 1L, 3)), fused.mkString(","))
    // a doc ranked 1 in a single list ties a doc ranked 1 in another:
    // id breaks the tie deterministically
    val a = Seq((9L, 1)).toDF("doc_id", "rank")
    val b = Seq((4L, 1)).toDF("doc_id", "rank")
    val tied = Search.rrfFuse(Seq(a, b)).collect().map(r => (r.getLong(0), r.getInt(3)))
    assert(tied.toSeq == Seq((4L, 1), (9L, 2)))
    intercept[IllegalArgumentException](Search.rrfFuse(Seq.empty))
  }

  test("save/load roundtrip preserves scores") {
    val idx = Search.bm25Index(corpus)
    val dir = java.nio.file.Files.createTempDirectory("bm25idx").toString
    Search.save(idx, dir)
    val re = Search.load(spark, dir)
    assert(re.nDocs == idx.nDocs && re.avgDl == idx.avgDl && re.idCol == "doc_id")
    val a = Search.bm25Score(idx, Seq("spark", "merge")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = Search.bm25Score(re, Seq("spark", "merge")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b)
  }

  test("retrievalMetrics: closed-form recall/precision/MRR/nDCG, absent-hit queries") {
    // q1: retrieved d1(rank1, rel2), d2(rank2, not judged), d3(rank3, rel1);
    //     judged but unretrieved d9(rel3) caps recall and ideal DCG
    // q2: nothing relevant retrieved -> all-zero metrics with n_rel intact
    val runs = Seq((1L, 1L, 1), (1L, 2L, 2), (1L, 3L, 3),
      (2L, 8L, 1)).toDF("query_id", "doc_id", "rank")
    val qrels = Seq((1L, 1L, 2), (1L, 3L, 1), (1L, 9L, 3),
      (2L, 7L, 1)).toDF("query_id", "doc_id", "rel")
    val out = Search.retrievalMetrics(runs, qrels, k = 10).collect()
      .map(r => r.getLong(0) -> r).toMap
    val d = Search.ndcgDiscounts(10)
    val q1 = out(1L)
    assert(q1.getAs[Long]("hits") == 2 && q1.getAs[Long]("n_rel") == 3)
    assert(q1.getAs[Double]("recall_k") == 2.0 / 3.0)
    assert(q1.getAs[Double]("precision_k") == 0.2)
    assert(q1.getAs[Double]("mrr") == 1.0)
    val dcg = d(0) * 3 + d(2) * 1
    val idcg = d(0) * 7 + d(1) * 3 + d(2) * 1
    assert(q1.getAs[Double]("ndcg_k") == dcg.toDouble / idcg.toDouble)
    val q2 = out(2L)
    assert(q2.getAs[Long]("hits") == 0 && q2.getAs[Long]("n_rel") == 1)
    assert(q2.getAs[Double]("recall_k") == 0.0 && q2.getAs[Double]("mrr") == 0.0
      && q2.getAs[Double]("ndcg_k") == 0.0)
  }
}
