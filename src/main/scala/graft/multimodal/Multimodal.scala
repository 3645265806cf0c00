package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, processed by per-partition batch
  * transforms. The Spark-side contract (schema, partitioning, batch shape)
  * is real and tested; the VIDEO decode is STUBBED with a deterministic
  * fake because the JDK ships no video codec — plug a real decoder in
  * through the [[Multimodal.MediaDecoder]] SPI (class name, instantiated
  * per partition executor-side) without touching the plumbing. The image
  * and audio paths are REAL: see [[Images]] and [[Audio]].
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

  /** Decoder SPI: a real video stack (JNI/ffmpeg, ONNX, a GPU codec) drops
    * in by implementing this trait with a ZERO-ARG constructor and passing
    * its class name to [[extractFeatures]]/[[frameSample]] — no engine
    * change. One instance is created PER PARTITION executor-side (never
    * serialized from the driver, so native handles are safe), `open()`
    * runs before the first payload, and `close()` is hooked to task
    * completion so early-abort never leaks a codec context.
    */
  trait MediaDecoder {
    def open(): Unit = ()
    /** fixed-width feature vector for one payload */
    def features(payload: Array[Byte], dim: Int): Array[Float]
    /** up to `n` sampled frames for one payload */
    def frames(payload: Array[Byte], n: Int): Seq[Array[Byte]]
    def close(): Unit = ()
  }

  /** The default deterministic stub decoder ([[decodeStub]] features,
    * 16-byte payload slices as "frames"). */
  final class StubDecoder extends MediaDecoder {
    def features(payload: Array[Byte], dim: Int): Array[Float] =
      decodeStub(payload, dim)
    def frames(payload: Array[Byte], n: Int): Seq[Array[Byte]] =
      (0 until n).map(i => payload.slice(i * 16, i * 16 + 16))
  }

  private def openDecoder(decoderClass: String): MediaDecoder = {
    val d = Class.forName(decoderClass).getDeclaredConstructor()
      .newInstance().asInstanceOf[MediaDecoder]
    d.open()
    Option(org.apache.spark.TaskContext.get()).foreach(
      _.addTaskCompletionListener[Unit](_ => d.close()))
    d
  }

  /** Batched per-partition feature extraction over (id, payload) rows —
    * the mapInPandas-equivalent plumbing in Scala: one decoder context per
    * partition (not per row), rows streamed through it. Partition count
    * controls decode parallelism; repartition upstream for GPU-sized
    * batches.
    */
  def extractFeatures(df: DataFrame, idCol: String, dim: Int,
                      decoderClass: String = classOf[StubDecoder].getName): DataFrame = {
    val spark = df.sparkSession
    val schema = featureSchema(idCol, dim)
    val rdd = df.select(col(idCol).cast("long"), col("payload")).rdd.mapPartitions { it =>
      val decoder = openDecoder(decoderClass)
      it.map { r =>
        val feats = decoder.features(r.getAs[Array[Byte]](1), dim)
        Row(r.getLong(0), feats.toSeq)
      }
    }
    spark.createDataFrame(rdd, schema)
  }

  /** Frame sampling for video payloads: emit up to `n` (frame_idx,
    * frame_bytes) rows per payload through the same per-partition decoder
    * SPI (default: deterministic 16-byte payload slices).
    */
  def frameSample(df: DataFrame, idCol: String, n: Int,
                  decoderClass: String = classOf[StubDecoder].getName): DataFrame = {
    val spark = df.sparkSession
    val schema = StructType(Seq(
      StructField(idCol, LongType),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("frame_bytes", BinaryType)))
    val rdd = df.select(col(idCol).cast("long"), col("payload")).rdd.mapPartitions { it =>
      val decoder = openDecoder(decoderClass)
      it.flatMap { r =>
        decoder.frames(r.getAs[Array[Byte]](1), n).iterator.zipWithIndex.map {
          case (frame, i) => Row(r.getLong(0), i, frame)
        }
      }
    }
    spark.createDataFrame(rdd, schema)
  }

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
