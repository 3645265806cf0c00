package graft.multimodal

import java.io.ByteArrayInputStream
import javax.sound.sampled.{AudioFormat, AudioSystem}

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** REAL audio operators over binary payload columns, pure JDK —
  * `javax.sound.sampled` parses WAV/AIFF/AU containers and converts
  * PCM/A-law/µ-law encodings without any external codec library. This
  * upgrades the audio half of the multimodal surface from the documented
  * stub to a working decode → probe → feature path, mirroring [[Images]];
  * compressed formats (MP3/AAC/…) stay outside the JDK and are rejected as
  * undecodable rather than failing the task.
  *
  * Same execution contract as [[Images]]: `mapPartitions`-batched, one
  * decoder per task, no shuffle anywhere — partition count is the batch
  * knob.
  */
object Audio {

  /** Container/format probe, or None for junk payloads (never throws). */
  def decodeInfo(payload: Array[Byte]): Option[(AudioFormat, Long)] =
    try {
      val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(payload))
      try Some((in.getFormat, in.getFrameLength)) finally in.close()
    } catch { case _: Exception => None }

  val probeSchema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("decodable", BooleanType),
    StructField("channels", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("n_frames", LongType),
    StructField("duration_ms", LongType)))

  /** Real header probe over (id, payload): channels, sample rate, frame
    * count and integer-math duration; `decodable=false` rows keep zeros.
    */
  def probeAudio(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    val rdd = df.select(col(idCol).cast("long"), col("payload")).rdd.mapPartitions { it =>
      it.map { r =>
        decodeInfo(r.getAs[Array[Byte]](1)) match {
          case Some((f, frames)) =>
            val rate = math.round(f.getSampleRate).toInt
            val durMs = if (rate > 0 && frames > 0) frames * 1000L / rate else 0L
            Row(r.getLong(0), true, f.getChannels, rate, frames, durMs)
          case None => Row(r.getLong(0), false, 0, 0, 0L, 0L)
        }
      }
    }
    spark.createDataFrame(rdd, probeSchema)
  }

  private val MaxSamples = 1 << 22 // ~4M mono samples ≈ 90s at 44.1kHz: bounds per-row work

  /** Deterministic REAL feature vector: `windows`-slot RMS energy envelope
    * over the decoded signal (converted to signed PCM16, channels mixed by
    * integer average, amplitude normalized to [0,1]; inputs longer than
    * ~4M samples are prefix-truncated so per-row cost is bounded).
    * Undecodable payloads yield the zero vector, like
    * [[Images.lumaHistogram]].
    */
  def energyEnvelope(payload: Array[Byte], windows: Int): Array[Float] = {
    val out = new Array[Float](windows)
    try {
      val src = AudioSystem.getAudioInputStream(new ByteArrayInputStream(payload))
      try {
        val f = src.getFormat
        val target = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
          f.getSampleRate, 16, f.getChannels, f.getChannels * 2, f.getSampleRate, false)
        val pcm = AudioSystem.getAudioInputStream(target, src)
        val ch = f.getChannels
        val bytes = pcm.readNBytes(MaxSamples * 2)
        val nFrames = bytes.length / (2 * ch)
        if (nFrames > 0) {
          // mono mix: integer average across channels, little-endian PCM16
          val mono = new Array[Int](nFrames)
          var i = 0
          while (i < nFrames) {
            var s = 0L
            var c = 0
            while (c < ch) {
              val o = (i * ch + c) * 2
              s += ((bytes(o + 1) << 8) | (bytes(o) & 0xff)).toShort
              c += 1
            }
            mono(i) = (s / ch).toInt
            i += 1
          }
          var w = 0
          while (w < windows) {
            val lo = (w.toLong * nFrames / windows).toInt
            val hi = ((w + 1).toLong * nFrames / windows).toInt
            if (hi > lo) {
              var ss = 0L
              var j = lo
              while (j < hi) { ss += mono(j).toLong * mono(j); j += 1 }
              out(w) = (math.sqrt(ss.toDouble / (hi - lo)) / 32768.0).toFloat
            }
            w += 1
          }
        }
      } finally src.close()
    } catch { case _: Exception => () }
    out
  }

  /** Batched feature extraction: (id, features) with the real energy
    * envelope — same output contract as [[Images.imageFeatures]] /
    * [[Multimodal.extractFeatures]], so ANN/dedup over audio composes
    * unchanged (near-identical clips land near each other).
    */
  def audioFeatures(df: DataFrame, idCol: String, windows: Int = 32): DataFrame = {
    val spark = df.sparkSession
    val schema = Multimodal.featureSchema(idCol, windows)
    val rdd = df.select(col(idCol).cast("long"), col("payload")).rdd.mapPartitions { it =>
      it.map(r => Row(r.getLong(0), energyEnvelope(r.getAs[Array[Byte]](1), windows).toSeq))
    }
    spark.createDataFrame(rdd, schema)
  }
}
