package graft

import org.apache.spark.sql.functions._

import graft.functions.PortableHash.{B, P}
import graft.text.NgramLm

class NgramLmSpec extends SparkSpec {
  import spark.implicits._

  private def h(s: String): Long =
    s.foldLeft(0L)((acc, c) => (acc * 31 + c.toLong) % P)

  private def gram2(a: Long, b: Long): Long = ((a % P) * B % P + b) % P

  test("fit counts grams, contexts, and vocab exactly") {
    val corpus = Seq((1L, "a b a"), (2L, "a b")).toDF("doc_id", "text")
    val lm = NgramLm.fit(corpus, n = 2)
    val (ha, hb) = (h("a"), h("b"))
    val grams = lm.grams.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(grams == Map(gram2(ha, hb) -> 2L, gram2(hb, ha) -> 1L))
    // contexts are the leading token of each gram position
    val ctxs = lm.ctxs.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ctxs == Map(ha -> 2L, hb -> 1L))
    assert(lm.vocab == 2L)
  }

  test("score: exact quantized probabilities for seen and OOV grams") {
    val corpus = Seq((1L, "a b a"), (2L, "a b")).toDF("doc_id", "text")
    val lm = NgramLm.fit(corpus, n = 2)
    val docs = Seq((10L, "a b"), (11L, "z z"), (12L, "a")).toDF("doc_id", "text")
    val out = NgramLm.score(docs, lm).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // "a b": c(ab)=2, c(a)=2, V=2 → p = 3/4 → floor(0.75·2^30)
    assert(out(10L) == ((1L, 0L, (NgramLm.Scale * 3 / 4))))
    // "z z": unseen gram and context → p = 1/2
    assert(out(11L) == ((1L, 1L, NgramLm.Scale / 2)))
    // single-token doc: below n, not scored
    assert(!out.contains(12L))
  }

  test("in-domain text outscores OOV gibberish on the real corpus") {
    val docs = sf("documents")
    val lm = NgramLm.fit(docs, n = 2)
    val inDomain = docs.limit(5).select("doc_id", "text")
    val gibberish = Seq((9001L, "qzx vbn wpl kjh zzq mmx rrv ttb")).toDF("doc_id", "text")
    val scored = NgramLm.score(inDomain.unionByName(gibberish), lm)
      .withColumn("avg_pq", col("sum_pq").cast("double") / col("n_ngrams"))
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("avg_pq")).toMap
    val gib = scored(9001L)
    assert(scored.filter(_._1 != 9001L).values.forall(_ > gib),
      s"in-domain docs must outscore gibberish: $scored")
  }

  test("quantized LM scores match a naive in-memory reference on random corpora") {
    val rnd = new scala.util.Random(7)
    val words = Vector("a", "bb", "ccc", "dd", "e")
    def mkDocs(ids: Range): Seq[(Long, String)] = ids.map(i =>
      (i.toLong, Seq.fill(1 + rnd.nextInt(9))(words(rnd.nextInt(words.size))).mkString(" ")))
    for (_ <- 1 to 3) {
      val fitDocs = mkDocs(1 to 20)
      val scoreDocs = mkDocs(100 to 110)
      val lm = NgramLm.fit(fitDocs.toDF("doc_id", "text"), n = 2)
      val got = NgramLm.score(scoreDocs.toDF("doc_id", "text"), lm).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
      val fitTok = fitDocs.map(d => d._2.split("\\s+").toSeq.map(h)).filter(_.length >= 2)
      val grams = fitTok.flatMap(t => t.sliding(2).map(w => gram2(w(0), w(1))))
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val ctxs = fitTok.flatMap(_.dropRight(1))
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val v = fitTok.flatten.distinct.size.toLong
      val want = scoreDocs.flatMap { case (id, text) =>
        val t = text.split("\\s+").toSeq.map(h)
        if (t.length < 2) None
        else {
          val ps = t.sliding(2).toSeq.map { w =>
            val cg = grams.getOrElse(gram2(w(0), w(1)), 0L)
            val cc = ctxs.getOrElse(w(0), 0L)
            (cg, math.floor((cg + 1).toDouble / (cc + v).toDouble * NgramLm.Scale).toLong)
          }
          Some(id -> ((ps.size.toLong, ps.count(_._1 == 0L).toLong, ps.map(_._2).sum)))
        }
      }.toMap
      assert(got == want)
    }
  }

  test("importanceScore equals the difference of the two per-model scores") {
    val rnd = new scala.util.Random(29)
    val words = Vector("a", "bb", "ccc", "dd", "e")
    def mkDocs(ids: Range): Seq[(Long, String)] = ids.map(i =>
      (i.toLong, Seq.fill(2 + rnd.nextInt(8))(words(rnd.nextInt(words.size))).mkString(" ")))
    val tgtDocs = mkDocs(1 to 15).toDF("doc_id", "text")
    val bkgDocs = mkDocs(50 to 65).toDF("doc_id", "text")
    val score = mkDocs(100 to 110).toDF("doc_id", "text")
    val tgt = NgramLm.fit(tgtDocs, n = 2)
    val bkg = NgramLm.fit(bkgDocs, n = 2)
    val got = NgramLm.importanceScore(score, tgt, bkg).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getAs[Long]("weight_q")))).toMap
    val st = NgramLm.score(score, tgt).collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    val sb = NgramLm.score(score, bkg).collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got.keySet == st.keySet)
    got.foreach { case (id, (_, t, b, w)) =>
      assert(t == st(id) && b == sb(id) && w == t - b, s"doc $id")
    }
  }

  test("importance: target-like text weighs positive, background-like negative") {
    val tgt = NgramLm.fit(Seq((1L, "alpha beta alpha beta alpha beta")).toDF("doc_id", "text"))
    val bkg = NgramLm.fit(Seq((1L, "gamma delta gamma delta gamma delta")).toDF("doc_id", "text"))
    val docs = Seq((10L, "alpha beta alpha"), (11L, "gamma delta gamma")).toDF("doc_id", "text")
    val w = NgramLm.importanceScore(docs, tgt, bkg).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("weight_q")).toMap
    assert(w(10L) > 0L, s"target-like doc must weigh positive: $w")
    assert(w(11L) < 0L, s"background-like doc must weigh negative: $w")
    // mismatched n fails loudly
    val tri = NgramLm.fit(Seq((1L, "a b c d")).toDF("doc_id", "text"), n = 3)
    intercept[IllegalArgumentException](NgramLm.importanceScore(docs, tgt, tri))
  }

  test("stupid backoff: exact quantized scores for seen, backoff, and OOV grams") {
    val corpus = Seq((1L, "a b a"), (2L, "a b")).toDF("doc_id", "text")
    val bm = NgramLm.fitBackoff(corpus, n = 2)
    // fit tokens: a b a | a b → T=5, V=2, c(a)=3, c(b)=2
    assert(bm.tokens == 5L && bm.vocab == 2L)
    val docs = Seq((10L, "a b"), (11L, "b b"), (12L, "z z")).toDF("doc_id", "text")
    val out = NgramLm.scoreBackoff(docs, bm).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // "a b": seen gram, c(ab)=2, c(a ctx)=2 → floor(2^30 · 1.0)
    assert(out(10L) == ((1L, 0L, NgramLm.Scale)))
    // "b b": unseen gram → backoff to α·(c(b)+1)/(T+V) = 0.5·3/7
    assert(out(11L) == ((1L, 1L,
      math.floor(3.0 / 7.0 * (NgramLm.Scale / 2)).toLong)))
    // "z z": backoff with OOV unigram → 0.5·1/7
    assert(out(12L) == ((1L, 1L,
      math.floor(1.0 / 7.0 * (NgramLm.Scale / 2)).toLong)))
  }

  test("backoff scores match a naive in-memory reference on random corpora") {
    val rnd = new scala.util.Random(13)
    val words = Vector("a", "bb", "ccc", "dd", "e")
    def mkDocs(ids: Range): Seq[(Long, String)] = ids.map(i =>
      (i.toLong, Seq.fill(1 + rnd.nextInt(9))(words(rnd.nextInt(words.size))).mkString(" ")))
    for (_ <- 1 to 3) {
      val fitDocs = mkDocs(1 to 20)
      val scoreDocs = mkDocs(100 to 110)
      val bm = NgramLm.fitBackoff(fitDocs.toDF("doc_id", "text"), n = 2)
      val got = NgramLm.scoreBackoff(scoreDocs.toDF("doc_id", "text"), bm).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
      val fitTok = fitDocs.map(d => d._2.split("\\s+").toSeq.map(h)).filter(_.length >= 2)
      val grams = fitTok.flatMap(t => t.sliding(2).map(w => gram2(w(0), w(1))))
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val ctxs = fitTok.flatMap(_.dropRight(1))
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val unis = fitTok.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val t0 = fitTok.map(_.size).sum.toLong
      val v = unis.size.toLong
      val want = scoreDocs.flatMap { case (id, text) =>
        val t = text.split("\\s+").toSeq.map(h)
        if (t.length < 2) None
        else {
          val ps = t.sliding(2).toSeq.map { w =>
            val cg = grams.getOrElse(gram2(w(0), w(1)), 0L)
            if (cg > 0L)
              (false, math.floor(cg.toDouble / ctxs(w(0)).toDouble * NgramLm.Scale).toLong)
            else
              (true, math.floor((unis.getOrElse(w(1), 0L) + 1).toDouble /
                (t0 + v).toDouble * (NgramLm.Scale / 2)).toLong)
          }
          Some(id -> ((ps.size.toLong, ps.count(_._1).toLong, ps.map(_._2).sum)))
        }
      }.toMap
      assert(got == want)
    }
  }

  test("backoff: in-domain beats gibberish, avg_logs finite and negative") {
    val docs = sf("documents")
    val bm = NgramLm.fitBackoff(docs, n = 2)
    val gibberish = Seq((9001L, "qzx vbn wpl kjh zzq mmx rrv ttb")).toDF("doc_id", "text")
    val scored = NgramLm.scoreBackoff(docs.limit(5).select("doc_id", "text")
        .unionByName(gibberish), bm)
      .withColumn("avg_sq", col("sum_sq").cast("double") / col("n_ngrams"))
      .collect().map(r => (r.getLong(0), r.getAs[Double]("avg_sq"), r.getAs[Double]("avg_logs")))
    val gib = scored.find(_._1 == 9001L).get
    assert(scored.filter(_._1 != 9001L).forall(_._2 > gib._2), scored.mkString(","))
    assert(scored.forall(s => s._3 < 0.0 && !s._3.isNaN && !s._3.isInfinite))
  }

  test("saved and reloaded model scores identically to the in-memory fit") {
    val corpus = Seq((1L, "a b a c a b"), (2L, "c a b a")).toDF("doc_id", "text")
    val lm = NgramLm.fit(corpus, n = 2)
    val dir = java.nio.file.Files.createTempDirectory("graft-lm").toString
    NgramLm.save(lm, dir)
    val re = NgramLm.load(spark, dir)
    assert(re.vocab == lm.vocab && re.n == lm.n)
    val docs = Seq((10L, "a b c"), (11L, "b b b")).toDF("doc_id", "text")
    val a = NgramLm.score(docs, lm).collect().map(_.toSeq.take(4)).toSet
    val b = NgramLm.score(docs, re).collect().map(_.toSeq.take(4)).toSet
    assert(a == b && a.nonEmpty)
  }

  test("fitting on a corpus with no scoreable document fails loudly") {
    val tiny = Seq((1L, "solo"), (2L, "")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException](NgramLm.fit(tiny, n = 2))
    assert(e.getMessage.contains("cannot fit"))
  }

  test("avg_logp is finite, negative, and orders with the quantized score") {
    val docs = sf("documents")
    val lm = NgramLm.fit(docs, n = 2)
    val scored = NgramLm.score(docs.limit(50), lm).collect()
    assert(scored.nonEmpty)
    scored.foreach { r =>
      val lp = r.getAs[Double]("avg_logp")
      assert(!lp.isNaN && !lp.isInfinite && lp < 0.0, s"bad avg_logp: $r")
    }
  }
}
