package graft.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** REAL image operators over binary payload columns, pure JDK —
  * `javax.imageio` decodes PNG/JPEG/GIF/BMP and `java.awt` rasters work
  * headless, so no external codec library is needed. This upgrades the
  * image half of the multimodal surface from the documented stub to a
  * working decode → probe → feature → resize path; audio/video stay
  * stubbed (the JDK ships no codecs for them).
  *
  * All operators are `mapPartitions`-batched like
  * [[Multimodal.extractFeatures]]: one decoder context per task, rows
  * streamed through it — partition count is the batch-size knob, no
  * shuffle anywhere.
  */
object Images {

  // ImageIO touches AWT; pin headless so executors never probe a display
  System.setProperty("java.awt.headless", "true")

  /** Decode, or None for corrupt/unsupported payloads (never throws —
    * a crawl's image column always carries junk).
    */
  def decode(payload: Array[Byte]): Option[BufferedImage] =
    try Option(ImageIO.read(new ByteArrayInputStream(payload)))
    catch { case _: Exception => None }

  val probeSchema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("decodable", BooleanType),
    StructField("width", IntegerType),
    StructField("height", IntegerType)))

  /** Real width/height probe over (id, payload): one decode per row,
    * `decodable=false` (with 0×0) for junk instead of a task failure.
    */
  def probeImages(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    val rdd = df.select(col(idCol).cast("long"), col("payload")).rdd.mapPartitions { it =>
      it.map { r =>
        decode(r.getAs[Array[Byte]](1)) match {
          case Some(img) => Row(r.getLong(0), true, img.getWidth, img.getHeight)
          case None => Row(r.getLong(0), false, 0, 0)
        }
      }
    }
    spark.createDataFrame(rdd, probeSchema)
  }

  /** Deterministic REAL feature vector: normalized `bins`-bucket luminance
    * histogram (integer Rec.601 luma, stride-subsampled above ~256×256 so
    * cost is bounded per image). Undecodable payloads yield the zero
    * vector — they carry no signal but keep the row (filter on the probe
    * if you want them gone).
    */
  def lumaHistogram(payload: Array[Byte], bins: Int): Array[Float] = {
    val out = new Array[Float](bins)
    decode(payload).foreach { img =>
      val w = img.getWidth; val h = img.getHeight
      val stride = math.max(1, math.max(w, h) / 256)
      var n = 0L
      val counts = new Array[Long](bins)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val lum = (299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff) +
            114 * (rgb & 0xff)) / 1000
          counts(math.min(bins - 1, lum * bins / 256)) += 1
          n += 1
          x += stride
        }
        y += stride
      }
      if (n > 0) {
        var b = 0
        while (b < bins) { out(b) = counts(b).toFloat / n; b += 1 }
      }
    }
    out
  }

  /** Batched feature extraction: (id, features) with the real luminance
    * histogram — the same output contract as
    * [[Multimodal.extractFeatures]], so downstream ANN/dedup composes
    * unchanged (e.g. `Dedup.embeddingNearDup` over image features finds
    * visually identical crops).
    */
  def imageFeatures(df: DataFrame, idCol: String, bins: Int = 32): DataFrame = {
    val spark = df.sparkSession
    val schema = Multimodal.featureSchema(idCol, bins)
    val rdd = df.select(col(idCol).cast("long"), col("payload")).rdd.mapPartitions { it =>
      it.map(r => Row(r.getLong(0), lumaHistogram(r.getAs[Array[Byte]](1), bins).toSeq))
    }
    spark.createDataFrame(rdd, schema)
  }

  /** Real resize: decode → smooth-scale onto a `width`×`height` RGB
    * raster → re-encode PNG; metadata updated from the REAL result.
    * Undecodable payloads pass through untouched with their metadata
    * intact. Narrow per-partition map like everything else here.
    */
  def resizeImages(df: DataFrame, width: Int, height: Int): DataFrame = {
    require(width > 0 && height > 0, s"bad target size ${width}x$height")
    val spark = df.sparkSession
    val resizeOne = (payload: Array[Byte]) =>
      decode(payload).map { img =>
        val dst = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
        val g = dst.createGraphics()
        try {
          g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(img, 0, 0, width, height, null)
        } finally g.dispose()
        val bos = new ByteArrayOutputStream()
        ImageIO.write(dst, "png", bos)
        bos.toByteArray
      }
    val schema = df.schema
    val pIdx = schema.fieldIndex("payload")
    val mIdx = schema.fieldIndex("media_meta")
    val rdd = df.rdd.mapPartitions { it =>
      it.map { r =>
        resizeOne(r.getAs[Array[Byte]](pIdx)) match {
          case Some(bytes) =>
            val meta = r.getStruct(mIdx)
            val newMeta = Row(meta.get(0), "png", width, height, meta.get(4),
              bytes.length.toLong)
            Row.fromSeq(r.toSeq.updated(pIdx, bytes).updated(mIdx, newMeta))
          case None => r
        }
      }
    }
    spark.createDataFrame(rdd, schema)
  }

  /** 64-bit difference hash (dHash) of an image payload: smooth-scale to a
    * 9×8 luminance grid, bit (r,c) = 1 iff luma(r,c+1) > luma(r,c).
    * Invariant under rescaling and robust to mild recompression — the
    * perceptual identity that survives the JPEG re-encodes that break
    * byte-level content hashing. None for undecodable payloads.
    */
  def dHash(payload: Array[Byte]): Option[Long] = decode(payload).map { img =>
    val w = 9; val h = 8
    val dst = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val g = dst.createGraphics()
    try {
      g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g.drawImage(img, 0, 0, w, h, null)
    } finally g.dispose()
    def luma(x: Int, y: Int): Int = {
      val rgb = dst.getRGB(x, y)
      (299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff) +
        114 * (rgb & 0xff)) / 1000
    }
    var bits = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w - 1) {
        if (luma(x + 1, y) > luma(x, y)) bits |= 1L << (y * (w - 1) + x)
        x += 1
      }
      y += 1
    }
    bits
  }

  /** Batched (id, dhash, decodable) over an (id, payload) relation —
    * narrow per-partition map like everything else here.
    */
  def imageHashes(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    val schema = StructType(Seq(
      StructField(idCol, LongType),
      StructField("dhash", LongType),
      StructField("decodable", BooleanType, nullable = false)))
    val rdd = df.select(col(idCol).cast("long"), col("payload")).rdd.mapPartitions { it =>
      it.map { r =>
        dHash(r.getAs[Array[Byte]](1)) match {
          case Some(b) => Row(r.getLong(0), b, true)
          case None    => Row(r.getLong(0), null, false)
        }
      }
    }
    spark.createDataFrame(rdd, schema)
  }

  /** Perceptual near-duplicate image pairs: dHash + the banded-hamming
    * pigeonhole (split 64 bits into `maxHamming + 1` bands; any pair
    * within the distance bound agrees exactly on ≥ 1 band → per-band
    * equi-join, never an all-pairs product — the same trick as
    * `Dedup.simHashCandidates`, at image width). Undecodable payloads
    * never pair.
    */
  def imageNearDup(df: DataFrame, idCol: String, maxHamming: Int = 7): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 31, s"bad maxHamming: $maxHamming")
    val nBands = maxHamming + 1
    val width = 64 / nBands
    require(width >= 1, s"maxHamming $maxHamming leaves no band bits")
    val hashes = imageHashes(df, idCol).filter(col("decodable")).drop("decodable")
    val banded = hashes.select(col(idCol), col("dhash"),
      explode(array((0 until nBands).map { b =>
        struct(lit(b).as("band"),
          call_function("shiftright", col("dhash"), lit(b * width))
            .bitwiseAND(lit((1L << width) - 1)).as("key"))
      }: _*)).as("bb"))
      .select(col(idCol), col("dhash"), col("bb.band"), col("bb.key"))
    val l = banded.as("l"); val r = banded.as("r")
    l.join(r, col("l.band") === col("r.band") && col("l.key") === col("r.key") &&
        col(s"l.$idCol") < col(s"r.$idCol"))
      .select(col(s"l.$idCol").as("id_a"), col(s"r.$idCol").as("id_b"),
        bit_count(col("l.dhash").bitwiseXOR(col("r.dhash"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
