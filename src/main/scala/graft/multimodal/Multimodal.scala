package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, processed by per-partition batch
  * transforms. The Spark-side contract (schema, partitioning, batch shape)
  * is real and tested; the actual media decode is STUBBED with a
  * deterministic fake because no image/audio codec libraries ship in this
  * container — swap `decodeStub` for a real decoder (or a Pandas-UDF
  * mapInPandas in PySpark deployments) without touching the plumbing.
  */
object Multimodal {

  /** Typed metadata carried alongside every payload. */
  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("media_type", StringType),   // image | audio | video
    StructField("format", StringType),       // png, wav, mp4, ...
    StructField("width", IntegerType),       // images/video
    StructField("height", IntegerType),
    StructField("duration_ms", LongType),    // audio/video
    StructField("n_bytes", LongType)))

  /** Wrap a text/binary column as an opaque media payload with metadata —
    * the ingestion shape for multimodal datasets. Metadata fields that the
    * (stubbed) probe can't know are derived deterministically from content.
    */
  def asMedia(df: DataFrame, payloadCol: Column, mediaType: String, format: String): DataFrame = {
    val payload = payloadCol.cast("binary")
    df.withColumn("payload", payload)
      .withColumn("media_meta", struct(
        lit(mediaType).as("media_type"),
        lit(format).as("format"),
        (pmod(xxhash64(payload), lit(1920L)).cast("int") + 1).as("width"),
        (pmod(xxhash64(payload, lit(1)), lit(1080L)).cast("int") + 1).as("height"),
        pmod(xxhash64(payload, lit(2)), lit(600000L)).as("duration_ms"),
        octet_length(payload).cast("long").as("n_bytes")))
  }

  /** Feature-extraction output schema: fixed-width float vector + the id. */
  def featureSchema(idCol: String, dim: Int): StructType = StructType(Seq(
    StructField(idCol, LongType),
    StructField("features", ArrayType(FloatType, containsNull = false))))

  /** STUB decoder for media types the JDK has no codec for (audio/video):
    * deterministic fake features from payload bytes. Real deployments
    * replace this body (e.g. JNI to a codec, or ONNX) — the mapPartitions
    * batching, schema, and partitioning stay identical. The IMAGE path is
    * real: see [[Images]] (pure-JDK decode / histogram features / resize).
    */
  def decodeStub(payload: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var h = 1125899906842597L
    var i = 0
    while (i < payload.length) { h = 31 * h + payload(i); i += 1 }
    var d = 0
    while (d < dim) {
      h ^= h << 13; h ^= h >>> 7; h ^= h << 17 // xorshift
      out(d) = (h % 1000L).toFloat / 1000.0f
      d += 1
    }
    out
  }

  /** Batched per-partition feature extraction over (id, payload) rows —
    * the mapInPandas-equivalent plumbing in Scala: one decoder context per
    * partition (not per row), rows streamed through it. Partition count
    * controls decode parallelism; repartition upstream for GPU-sized
    * batches.
    */
  def extractFeatures(df: DataFrame, idCol: String, dim: Int): DataFrame = {
    val spark = df.sparkSession
    val schema = featureSchema(idCol, dim)
    val rdd = df.select(col(idCol).cast("long"), col("payload")).rdd.mapPartitions { it =>
      // per-partition decoder init would go here (model load, codec ctx)
      it.map { r =>
        val feats = decodeStub(r.getAs[Array[Byte]](1), dim)
        Row(r.getLong(0), feats.toSeq)
      }
    }
    spark.createDataFrame(rdd, schema)
  }

  /** Frame-sample stub for video payloads: emit `n` (frame_idx, frame_bytes)
    * rows per payload — demonstrates the explode-shaped output contract.
    */
  def frameSample(df: DataFrame, idCol: String, n: Int): DataFrame =
    df.select(col(idCol), col("payload"),
      posexplode(transform(sequence(lit(0), lit(n - 1)),
        i => call_function("substring", col("payload"), i * 16 + 1, lit(16)))))
      .toDF(idCol, "payload", "frame_idx", "frame_bytes")
      .drop("payload")

  /** Resize stub for image payloads: the contract is payload → payload'
    * with width/height metadata updated and n_bytes recomputed — a narrow
    * per-row map, no shuffle, so it composes with extractFeatures'
    * partition batching. The stub transform halves the byte stream (a real
    * deployment decodes, scales, re-encodes in the same slot).
    */
  def resize(df: DataFrame, width: Int, height: Int): DataFrame = {
    val resized = call_function("substring", col("payload"), lit(1),
      greatest((octet_length(col("payload")) + 1) / 2, lit(1)))
    df.withColumn("payload", resized)
      .withColumn("media_meta", col("media_meta")
        .withField("width", lit(width))
        .withField("height", lit(height))
        .withField("n_bytes", octet_length(col("payload")).cast("long")))
  }
}
