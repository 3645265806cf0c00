package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization — the compression layer 100 TB ANN actually runs
  * on: a d-dim float vector (4d bytes) becomes m one-byte codes by
  * vector-quantizing each of m subspaces against its own k-centroid
  * codebook (here k ≤ 256). Search then scores codes against per-query
  * distance lookup tables (asymmetric distance) without ever touching raw
  * vectors. The reference has no vector surface; this extends the ANN
  * family ([[Similarity]]) the same dataflow-first way as kmeansFit.
  *
  * Scale shape: training iterates Lloyd's on the (vec, subspace) stream —
  * per iteration one narrow assignment map against the broadcast codebooks
  * and one partial-aggregated mean reduction (shuffle carries m·k·(d/m)
  * partials per partition, never the corpus). Encoding is one narrow map.
  * Search explodes codes to (id, subspace, code) fixed-width rows, joins
  * the BROADCAST per-query tables, and partial-aggregates the m-term sums —
  * the corpus never shuffles raw vectors, only 8-byte partial distances.
  */
object Pq {

  /** Squared L2 between two equal-width array<double> columns, sequential
    * fold (deterministic per row).
    */
  private def l2sq(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), (acc, v) => acc + v)

  /** Train m per-subspace codebooks of k centroids by Lloyd's with L2
    * assignment (PQ-standard). Deterministic: centroids init from the k
    * lowest-id vectors per subspace; empty clusters keep their centroid.
    * Returns (subspace, centroid_id, cvec).
    */
  def pqTrain(df: DataFrame, m: Int, k: Int, iters: Int,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val dim = df.select(size(col(vecCol))).head().getInt(0)
    require(dim % m == 0, s"dim $dim not divisible by m=$m subspaces")
    val sub = dim / m
    val stream = df.select(col(idCol).as("vec_id"), col(vecCol).cast("array<double>").as("__v"))
      .select(col("vec_id"), explode(transform(sequence(lit(0), lit(m - 1)),
        s => struct(s.as("subspace"), slice(col("__v"), s * lit(sub) + 1, lit(sub)).as("subvec")))).as("__e"))
      .select(col("vec_id"), col("__e.subspace").as("subspace"), col("__e.subvec").as("subvec"))

    var books: Seq[(Int, Long, Seq[Double])] = stream
      .withColumn("__rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("subspace").orderBy("vec_id")))
      .filter(col("__rk") <= k)
      .select(col("subspace"), (col("__rk") - 1).cast("long").as("centroid_id"), col("subvec"))
      .as[(Int, Long, Seq[Double])].collect().toSeq

    for (_ <- 1 to iters) {
      val cdf = broadcast(books.toDF("subspace", "centroid_id", "cvec"))
      val means = stream.join(cdf, "subspace")
        .withColumn("__d", l2sq(col("subvec"), col("cvec")))
        .groupBy("vec_id", "subspace")
        .agg(min_by(col("centroid_id"), struct(col("__d"), col("centroid_id"))).as("centroid_id"),
          first(col("subvec")).as("subvec"))
        .select(col("subspace"), col("centroid_id"), posexplode(col("subvec")).as(Seq("pos", "x")))
        .groupBy("subspace", "centroid_id", "pos").agg(avg("x").as("mx"))
        .groupBy("subspace", "centroid_id")
        .agg(array_sort(collect_list(struct(col("pos"), col("mx")))).as("pm"))
        .select(col("subspace"), col("centroid_id"),
          transform(col("pm"), x => x("mx")).as("cvec"))
        .as[(Int, Long, Seq[Double])].collect()
        .map(t => (t._1, t._2) -> t._3).toMap
      books = books.map { case (s, c, old) => (s, c, means.getOrElse((s, c), old)) }
    }
    books.toDF("subspace", "centroid_id", "cvec")
  }

  /** Encode each vector as its m nearest-centroid codes (array<bigint>,
    * subspace order). One narrow map against the broadcast codebooks plus
    * a per-row regroup.
    */
  def pqEncode(df: DataFrame, codebooks: DataFrame,
               idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val m = codebooks.agg(max("subspace")).head().getInt(0) + 1
    val sub = codebooks.select(size(col("cvec"))).head().getInt(0)
    val stream = df.select(col(idCol).as("vec_id"), col(vecCol).cast("array<double>").as("__v"))
      .select(col("vec_id"), explode(transform(sequence(lit(0), lit(m - 1)),
        s => struct(s.as("subspace"), slice(col("__v"), s * lit(sub) + 1, lit(sub)).as("subvec")))).as("__e"))
      .select(col("vec_id"), col("__e.subspace").as("subspace"), col("__e.subvec").as("subvec"))
    stream.join(broadcast(codebooks), "subspace")
      .withColumn("__d", l2sq(col("subvec"), col("cvec")))
      .groupBy("vec_id", "subspace")
      .agg(min_by(col("centroid_id"), struct(col("__d"), col("centroid_id"))).as("code"))
      .groupBy("vec_id")
      .agg(array_sort(collect_list(struct(col("subspace"), col("code")))).as("sc"))
      .select(col("vec_id").as(idCol), transform(col("sc"), x => x("code")).as("codes"))
  }

  /** Each vector's coarse-cell residual: (vec_id, cell, residual) where
    * residual = vec - cell centroid. Residuals have much lower variance
    * than raw vectors, so codebooks trained on THIS frame (pqTrain with
    * vecCol = "residual") quantize finer — the FAISS IVF-PQ design.
    */
  def residualFrame(df: DataFrame, centroids: DataFrame,
                    idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    Similarity.ivfAssign(df, centroids, idCol, vecCol)
      .join(broadcast(centroids.select(col("centroid_id"), col("cvec"))), "centroid_id")
      .select(col(idCol), col("centroid_id").as("cell"),
        zip_with(col(vecCol).cast("array<double>"), col("cvec"), (a, b) => a - b)
          .as("residual"))

  /** Build the IVF-PQ index frame: PQ codes + coarse-cell assignment per
    * vector — (vec_id, cell, codes). With `residual = true` the codes
    * quantize (vec - centroid) — pass codebooks trained on
    * [[residualFrame]]. The billion-scale layout: the cell bounds the
    * search, the codes replace the raw vector. Persist this (e.g.
    * `Layout.zorderWrite` on cell) and drop the raw embeddings.
    */
  def ivfPqEncode(df: DataFrame, centroids: DataFrame, codebooks: DataFrame,
                  idCol: String = "vec_id", vecCol: String = "embedding",
                  residual: Boolean = false): DataFrame =
    if (residual) {
      val rf = residualFrame(df, centroids, idCol, vecCol)
      rf.select(col(idCol), col("cell"))
        .join(pqEncode(rf, codebooks, idCol, "residual"), idCol)
    } else
      Similarity.ivfAssign(df, centroids, idCol, vecCol)
        .select(col(idCol), col("centroid_id").as("cell"))
        .join(pqEncode(df, codebooks, idCol, vecCol), idCol)

  /** IVF-PQ search: ADC scoring restricted to each query's `nprobe`
    * nearest coarse cells (the standard recall/cost dial — nprobe = #cells
    * degenerates to exact [[pqTopK]] candidate coverage). `index` is
    * ivfPqEncode's output. The per-query distance tables carry the probed
    * cells, so the (subspace, code, cell) broadcast join prunes every
    * out-of-cell candidate before any aggregation. Returns
    * (query_id, vec_id, adc_dist, rank).
    */
  def ivfPqTopK(index: DataFrame, codebooks: DataFrame, centroids: DataFrame,
                queries: DataFrame, topK: Int, nprobe: Int = 1,
                queryIdCol: String = "vec_id", vecCol: String = "embedding",
                residual: Boolean = false,
                indexIdCol: String = "vec_id"): DataFrame = {
    require(nprobe >= 1, "nprobe must be >= 1")
    val sub = codebooks.select(size(col("cvec"))).head().getInt(0)
    val probeW = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("__d"), col("centroid_id"))
    val probed = queries
      .select(col(queryIdCol).as("query_id"), col(vecCol).cast("array<double>").as("__q"))
      .crossJoin(broadcast(centroids.select(col("centroid_id"), col("cvec").as("__cc"))))
      .withColumn("__d", -Similarity.cosineGeneric(col("__q"), col("__cc")))
      .withColumn("__rk", row_number().over(probeW)).filter(col("__rk") <= nprobe)
    // residual index ⇒ tables score (q - probed centroid) per probed cell
    val qeff = if (residual) zip_with(col("__q"), col("__cc"), (a, b) => a - b)
               else col("__q")
    val qtab = probed
      .select(col("query_id"), qeff.as("__q"), col("centroid_id").as("cell"))
      .crossJoin(broadcast(codebooks))
      .withColumn("__qs", slice(col("__q"), col("subspace") * lit(sub) + 1, lit(sub)))
      .select(col("query_id"), col("cell"), col("subspace"),
        col("centroid_id").as("code"), l2sq(col("__qs"), col("cvec")).as("__dtab"))
    val exploded = index.select(col(indexIdCol).as("vec_id"), col("cell"),
      posexplode(col("codes")).as(Seq("subspace", "code")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("adc_dist"), col("vec_id"))
    exploded.join(broadcast(qtab), Seq("subspace", "code", "cell"))
      .groupBy("query_id", "vec_id").agg(sum("__dtab").as("adc_dist"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
  }

  /** Exact L2 top-k (the PQ ground truth): broadcast the query side,
    * stream the corpus, one shuffle for the per-query window. Same output
    * shape as [[pqTopK]] so results compare row-for-row.
    */
  def exactL2TopK(corpus: DataFrame, queries: DataFrame, topK: Int,
                  idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"),
      col(vecCol).cast("array<double>").as("__q")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("adc_dist"), col("vec_id"))
    corpus.select(col(idCol).as("vec_id"), col(vecCol).cast("array<double>").as("__v"))
      .crossJoin(q)
      .select(col("query_id"), col("vec_id"), l2sq(col("__v"), col("__q")).as("adc_dist"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
  }

  /** recall@k of an approximate result against the exact one (both in the
    * (query_id, vec_id, ...) shape): per query |approx ∩ exact| / |exact|,
    * plus the mean over queries in a `__mean` grouping row — the tuning
    * loop for m/k/nprobe.
    */
  def recallAtK(approx: DataFrame, exact: DataFrame): DataFrame = {
    val hits = exact.select(col("query_id"), col("vec_id"))
      .join(approx.select(col("query_id"), col("vec_id"), lit(1).as("__hit")),
        Seq("query_id", "vec_id"), "left")
    val per = hits.groupBy("query_id")
      .agg((sum(coalesce(col("__hit"), lit(0))).cast("double") / count(lit(1))).as("recall"))
    per.select(col("query_id").cast("string"), col("recall"))
      .unionAll(per.agg(lit("__mean").as("query_id"), avg("recall").as("recall")))
  }

  /** Asymmetric-distance top-k: score PQ codes against per-(query,
    * subspace, centroid) distance tables (q·m·k rows — broadcast), sum the
    * m table entries per (query, candidate), keep the k smallest. Returns
    * (query_id, vec_id, adc_dist, rank).
    */
  def pqTopK(codes: DataFrame, codebooks: DataFrame, queries: DataFrame, topK: Int,
             queryIdCol: String = "vec_id", vecCol: String = "embedding",
             codesIdCol: String = "vec_id"): DataFrame = {
    val sub = codebooks.select(size(col("cvec"))).head().getInt(0)
    val qtab = queries
      .select(col(queryIdCol).as("query_id"), col(vecCol).cast("array<double>").as("__q"))
      .crossJoin(broadcast(codebooks))
      .withColumn("__qs", slice(col("__q"), col("subspace") * lit(sub) + 1, lit(sub)))
      .select(col("query_id"), col("subspace"), col("centroid_id").as("code"),
        l2sq(col("__qs"), col("cvec")).as("__dtab"))
    val exploded = codes.select(col(codesIdCol).as("vec_id"),
      posexplode(col("codes")).as(Seq("subspace", "code")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("adc_dist"), col("vec_id"))
    exploded.join(broadcast(qtab), Seq("subspace", "code"))
      .groupBy("query_id", "vec_id").agg(sum("__dtab").as("adc_dist"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
  }
}
