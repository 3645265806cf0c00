package graft

import org.apache.spark.sql.functions._

import graft.similarity.Similarity

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("ivfAssign picks the nearest centroid per vector") {
    import org.apache.spark.sql.functions.{array, col, lit}
    val vecs = Seq((1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 1.0f)), (3L, Array(0.9f, 0.1f)))
      .toDF("vec_id", "embedding")
    val cents = Seq((10, Array(1.0f, 0.0f)), (20, Array(0.0f, 1.0f)))
      .toDF("centroid_id", "cvec")
    val got = Similarity.ivfAssign(vecs, cents)
      .select("vec_id", "centroid_id").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == Map(1L -> 10, 2L -> 20, 3L -> 10))
  }

  test("native LSH signature kernel matches the declarative specification") {
    val emb = sf("embeddings").limit(50)
    val both = emb.select(
      Similarity.lshSignature(org.apache.spark.sql.functions.col("embedding"), 16).as("k"),
      Similarity.lshSignatureGeneric(org.apache.spark.sql.functions.col("embedding"), 16).as("g"))
    assert(both.filter(org.apache.spark.sql.functions.col("k") =!=
      org.apache.spark.sql.functions.col("g")).count() == 0)
  }

  test("cosine/dot/norm exact on known vectors") {
    val df = Seq((Array(1.0f, 0.0f), Array(0.0f, 1.0f)), (Array(1.0f, 1.0f), Array(1.0f, 1.0f)))
      .toDF("a", "b")
    val out = df.select(
      Similarity.dot($"a", $"b"), Similarity.cosine($"a", $"b")).collect()
    assert(out(0).getDouble(0) == 0.0 && out(0).getDouble(1) == 0.0)
    assert(out(1).getDouble(0) == 2.0 && math.abs(out(1).getDouble(1) - 1.0) < 1e-12)
  }

  test("brute-force top-k ranks a planted duplicate first") {
    val emb = sf("embeddings")
    // plant: vector 9999 = copy of vec_id 0
    val planted = emb.filter($"vec_id" === 0).withColumn("vec_id", lit(9999L))
    val corpus = emb.unionByName(planted)
    val top = Similarity.bruteForceTopK(corpus, corpus.filter($"vec_id" === 0), k = 3)
      .orderBy("rank").collect()
    assert(top.head.getAs[Long]("neighbor_id") == 9999L)
    assert(math.abs(top.head.getAs[Double]("cosine") - 1.0) < 1e-9)
  }

  test("IVF top-k searches only the query's cell and finds a planted duplicate") {
    val emb = sf("embeddings")
    val planted = emb.filter($"vec_id" === 0).withColumn("vec_id", lit(9999L))
    val corpus = emb.unionByName(planted)
    val cents = corpus.filter($"vec_id" % 50 === 0)
      .select($"vec_id".as("centroid_id"), $"embedding".as("cvec"))
    val top = Similarity.ivfTopK(corpus, corpus.filter($"vec_id" === 0), cents, k = 3)
      .orderBy("rank").collect()
    // the exact copy lands in the same cell as the query → rank 1
    assert(top.head.getAs[Long]("neighbor_id") == 9999L)
    assert(math.abs(top.head.getAs[Double]("cosine") - 1.0) < 1e-9)
    // every neighbor shares the query's cell: re-derive assignments and check
    val assign = Similarity.ivfAssign(corpus, cents)
      .select($"vec_id", $"centroid_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(top.forall(r => assign(r.getAs[Long]("neighbor_id")) == assign(0L)))
  }

  test("narrow ivfAssign matches the exchange-based form row-for-row, zero-vector edge included") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val emb = sf("embeddings")
    val cents = emb.filter($"vec_id" % 25 === 0)
      .select($"vec_id".as("centroid_id"), $"embedding".as("cvec"))
    def rows(df: org.apache.spark.sql.DataFrame) = df.select("vec_id", "centroid_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rows(Similarity.ivfAssign(emb, cents)) == rows(Similarity.ivfAssignShuffled(emb, cents)))
    // zero vector: cosine is NaN against every centroid; both forms must
    // resolve the all-NaN argmin to the lowest centroid id
    val schema = StructType(Seq(StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    val z = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row(1L, Array(0f, 0f)), Row(2L, Array(1f, 0f)))), schema)
    val zc = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row(7L, Array(1f, 0f)), Row(3L, Array(0f, 1f)))), schema)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("cvec"))
    assert(rows(Similarity.ivfAssign(z, zc)) == rows(Similarity.ivfAssignShuffled(z, zc)))
  }

  test("IVF recall is monotone in nprobe and degenerates to brute force at nprobe = #cells") {
    val emb = sf("embeddings")
    val queries = emb.filter($"vec_id" < 10)
    val cents = emb.filter($"vec_id" % 25 === 0)
      .select($"vec_id".as("centroid_id"), $"embedding".as("cvec"))
    val nCells = cents.count().toInt
    val exact = Similarity.bruteForceTopK(emb, queries, k = 10)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(nprobe: Int): Double = {
      val got = Similarity.ivfTopK(emb, queries, cents, k = 10, nprobe = nprobe)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      got.intersect(exact).size.toDouble / exact.size
    }
    val r1 = recall(1); val r2 = recall(2); val rAll = recall(nCells)
    assert(r1 <= r2 + 1e-12 && r2 <= rAll + 1e-12, s"recall not monotone: $r1, $r2, $rAll")
    assert(rAll == 1.0, s"nprobe=#cells must equal brute force, recall $rAll")
  }

  test("LSH top-k finds the planted duplicate through banding") {
    val emb = sf("embeddings")
    val planted = emb.filter($"vec_id" === 0).withColumn("vec_id", lit(9999L))
    val corpus = emb.unionByName(planted)
    val top = Similarity.lshTopK(corpus, corpus.filter($"vec_id" === 0), k = 3)
      .orderBy("rank").collect()
    // identical vector has identical signature → always a candidate
    assert(top.head.getAs[Long]("neighbor_id") == 9999L)
  }

  test("lsh signature is deterministic across evaluations") {
    val emb = sf("embeddings").limit(20)
    val s1 = emb.select($"vec_id", Similarity.lshSignature($"embedding").as("s")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val s2 = emb.select($"vec_id", Similarity.lshSignature($"embedding").as("s")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(s1 == s2)
  }

  test("multimodal plumbing: media struct + stub features have the contracted shape") {
    import graft.multimodal.Multimodal
    val docs = sf("documents").limit(10)
    val media = Multimodal.asMedia(docs.select("doc_id", "text"), col("text"), "image", "png")
    assert(media.schema("media_meta").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
      .fieldNames.toSeq == Seq("media_type", "format", "width", "height", "duration_ms", "n_bytes"))
    val feats = Multimodal.extractFeatures(media, "doc_id", dim = 8)
    val rows = feats.collect()
    assert(rows.length == 10)
    assert(rows.forall(_.getSeq[Float](1).length == 8))
    // deterministic: same payload → same features
    val feats2 = Multimodal.extractFeatures(media, "doc_id", dim = 8).collect()
    assert(rows.map(_.getSeq[Float](1)).toSeq == feats2.map(_.getSeq[Float](1)).toSeq)
  }

  test("multimodal resize updates metadata and shrinks the payload; frameSample explodes frames") {
    import graft.multimodal.Multimodal
    val docs = sf("documents").limit(5)
    val media = Multimodal.asMedia(docs.select("doc_id", "text"), col("text"), "image", "png")
    val out = Multimodal.resize(media, 640, 480)
    val r = out.select("media_meta.width", "media_meta.height", "media_meta.n_bytes", "payload")
      .collect()
    assert(r.forall(x => x.getInt(0) == 640 && x.getInt(1) == 480))
    assert(r.forall(x => x.getLong(2) == x.getAs[Array[Byte]](3).length.toLong))
    val frames = Multimodal.frameSample(media, "doc_id", n = 3)
    assert(frames.count() == 15)
    assert(frames.columns.toSeq == Seq("doc_id", "frame_idx", "frame_bytes"))
  }

  test("diverseSelect keeps the most-central member of every cell") {
    val cents = Seq((0L, Seq(1f, 0f)), (1L, Seq(0f, 1f)))
      .toDF("centroid_id", "cvec")
    val corpus = Seq(
      (10L, Seq(0.9f, 0.1f)), (11L, Seq(0.99f, 0.01f)), // cell 0; 11 is closer
      (12L, Seq(0.2f, 0.8f))                            // cell 1, alone
    ).toDF("vec_id", "embedding")
    val reps = Similarity.diverseSelect(corpus, cents)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(reps == Map(0L -> 11L, 1L -> 12L), reps.toString)
  }

  test("marginMine demotes the hub that raw cosine would pick") {
    // hub is the raw-cosine best for src a, but it is near EVERYTHING, so
    // its large neighbor-mean divides its margin below the true match ta
    val src = Seq(
      (1L, Seq(1f, 0f, 0f)), (2L, Seq(0f, 1f, 0f))).toDF("vec_id", "embedding")
    val tgt = Seq(
      (10L, Seq(0.72f, 0f, 0.7f)),   // ta: a's true match
      (11L, Seq(1f, 0.9f, 0f)),      // hub: close to both a and b
      (12L, Seq(0f, 0.72f, 0.7f))    // tb: b's true match
    ).toDF("vec_id", "embedding")
    // raw cosine really does prefer the hub for a...
    val raw = Similarity.bruteForceTopK(tgt, src.filter(col("vec_id") === 1), k = 1)
      .collect().head
    assert(raw.getLong(1) == 11L, s"fixture broken: raw best is ${raw.getLong(1)}")
    // ...and the margin criterion recovers the true pairs
    val mined = Similarity.marginMine(src, tgt, k = 2, threshold = 0.0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(mined == Map(1L -> 10L, 2L -> 12L), mined.toString)
  }
}
