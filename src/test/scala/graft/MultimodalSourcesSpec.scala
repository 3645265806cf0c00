package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal
import graft.sources.Sources

class MultimodalSourcesSpec extends SparkSpec {
  import spark.implicits._

  test("asMedia wraps payloads with typed metadata") {
    val df = Seq((1L, "hello"), (2L, "")).toDF("id", "text")
    val media = Multimodal.asMedia(df, col("text"), "image", "png")
    val rows = media.select("id", "media_meta.media_type", "media_meta.format",
      "media_meta.n_bytes").orderBy("id").collect()
    assert(rows(0).getString(1) == "image" && rows(0).getString(2) == "png")
    assert(rows(0).getLong(3) == 5L && rows(1).getLong(3) == 0L)
  }

  test("extractFeatures produces deterministic fixed-width vectors per partition batch") {
    val df = Multimodal.asMedia(Seq((1L, "abc"), (2L, "abc"), (3L, "xyz")).toDF("id", "text"),
      col("text"), "image", "png")
    val feats = Multimodal.extractFeatures(df, "id", dim = 8)
    assert(feats.schema.fieldNames.toSeq == Seq("id", "features"))
    val byId = feats.collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(byId(1L).length == 8)
    assert(byId(1L) == byId(2L)) // same payload → same features
    assert(byId(1L) != byId(3L))
  }

  test("frameSample emits n frames per payload") {
    val df = Multimodal.asMedia(Seq((1L, "0123456789abcdef0123456789abcdef")).toDF("id", "text"),
      col("text"), "video", "mp4")
    val frames = Multimodal.frameSample(df, "id", n = 2)
    assert(frames.columns.toSeq == Seq("id", "frame_idx", "frame_bytes"))
    assert(frames.count() == 2)
  }

  test("loadCached produces a broadcast-hinted relation") {
    val dir = Files.createTempDirectory("graft-cached").toString
    Seq((1L, "x")).toDF("k", "v").write.parquet(s"$dir/small")
    val cached = Sources.loadCached(spark, s"$dir/small", "parquet")
    val big = Seq((1L, 10), (2L, 20)).toDF("k", "n")
    val joined = big.join(cached, Seq("k"))
    assert(joined.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
    assert(joined.count() == 1)
  }

  test("char shingles cover text without token boundaries") {
    val df = Seq((1L, "abcd")).toDF("doc_id", "text")
    val sh = graft.dedup.Dedup.charShingles(df, 2).collect().map(_.getString(1)).sorted
    assert(sh.toSeq == Seq("ab", "bc", "cd"))
  }

  test("sources roundtrip: json, orc, text, virtual") {
    val dir = Files.createTempDirectory("graft-sources").toString
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "name")
    Sources.store(df, s"$dir/j", "json")
    assert(Sources.load(spark, s"$dir/j", "json", Some("LONG id, STRING name"))
      .orderBy("id").collect().map(_.getString(1)).toSeq == Seq("a", "b"))
    Sources.store(df, s"$dir/o", "orc")
    assert(Sources.load(spark, s"$dir/o", "orc").count() == 2)
    Sources.store(df.select(col("name")), s"$dir/t", "text")
    assert(Sources.load(spark, s"$dir/t", "text", Some("STRING name")).count() == 2)
    Sources.store(df, s"$dir/c", "csv")
    assert(Sources.load(spark, s"$dir/c", "csv", Some("LONG id, STRING name"))
      .orderBy("id").collect().map(_.getString(1)).toSeq == Seq("a", "b"))
    assert(Sources.virtual(spark, 5).count() == 5)
  }

  test("TEXT roundtrip: quote-leading values and typed single columns (r17 review)") {
    val dir = Files.createTempDirectory("graft-text-rt").toString
    // a field value starting with '"' must not open a csv quote on read
    // (the write side emits raw unquoted TSV)
    val df = Seq((1L, "\"42 rue\" Paris", "x"), (2L, "plain", "y"))
      .toDF("id", "addr", "t")
    Sources.store(df, s"$dir/q", "text")
    val back = Sources.load(spark, s"$dir/q", "text",
      Some("LONG id, STRING addr, STRING t")).orderBy("id").collect()
    assert(back.map(_.getString(1)).toSeq == Seq("\"42 rue\" Paris", "plain"),
      back.mkString(";"))
    assert(back.map(_.getString(2)).toSeq == Seq("x", "y"))
    // a single-column TYPED text schema loads via the csv parser (text()
    // supports only one STRING column)
    Sources.store(Seq(7, 8).toDF("n"), s"$dir/n", "text")
    val ns = Sources.load(spark, s"$dir/n", "text", Some("INT n"))
      .collect().map(_.getInt(0)).toSet
    assert(ns == Set(7, 8), ns.toString)
    // partition_by on text/avro refuses loudly instead of writing flat
    intercept[IllegalArgumentException](
      Sources.store(df, s"$dir/p", "text", partitionBy = Seq("t")))
    intercept[IllegalArgumentException](
      Sources.store(df, s"$dir/a", "avro", partitionBy = Seq("t")))
  }

  test("loadRobust splits clean rows from quarantined corrupt records") {
    val dir = Files.createTempDirectory("graft-robust").toString
    Files.write(java.nio.file.Paths.get(s"$dir/in.json"),
      ("""{"id": 1, "name": "a"}""" + "\n" +
        """{"id": oops not json""" + "\n" +
        """{"id": 3, "name": "c"}""" + "\n").getBytes("UTF-8"))
    val (clean, bad) = Sources.loadRobust(spark, s"$dir/in.json", "json",
      "LONG id, STRING name")
    assert(clean.orderBy("id").collect().map(_.getLong(0)).toSeq == Seq(1L, 3L))
    val quarantined = bad.collect().map(_.getString(0))
    assert(quarantined.length == 1 && quarantined.head.contains("oops"))
  }

  test("avro roundtrips natively on avro-core: flat, nullable, nested, arrays") {
    val df = Seq(
      (1L, "a", Some(1.5), Seq(1L, 2L), ("x", 10)),
      (2L, "b", None, Seq.empty[Long], ("y", 20)))
      .toDF("id", "name", "score", "xs", "rec")
    val dir = Files.createTempDirectory("graft-avro").toString + "/t"
    Sources.store(df, dir, "avro")
    val back = Sources.load(spark, dir, "avro")
    assert(back.schema.fieldNames.toSeq == Seq("id", "name", "score", "xs", "rec"))
    val rows = back.orderBy("id").collect()
    assert(rows(0).getLong(0) == 1L && rows(0).getString(1) == "a")
    assert(rows(0).getDouble(2) == 1.5 && rows(1).isNullAt(2))
    assert(rows(0).getSeq[Long](3) == Seq(1L, 2L))
    assert(rows(0).getStruct(4).getString(0) == "x"
      && rows(1).getStruct(4).getInt(1) == 20)
    // appended shard read back together with the first
    Sources.store(df.filter(col("id") === 1), dir, "avro", mode = "append")
    assert(Sources.load(spark, dir, "avro").count() == 3)
  }

  test("avro: null array/map elements survive the round trip (r17 review)") {
    import graft.sources.AvroNative
    val df = Seq(
      (1L, Seq[String]("a", null, "c"), Map("k" -> "v", "n" -> null)),
      (2L, Seq.empty[String], Map.empty[String, String]))
      .toDF("id", "tags", "props")
    val dir = Files.createTempDirectory("graft-avro-nullel").toString + "/t"
    AvroNative.write(df, dir) // threw NPE before [null, T] element unions
    val back = AvroNative.read(spark, dir).orderBy("id").collect()
    assert(back(0).getSeq[String](1) == Seq("a", null, "c"), back(0).toString)
    assert(back(0).getMap[String, String](2).get("n").contains(null))
  }

  test("avro write modes: error throws, ignore is a no-op (r17 review)") {
    import graft.sources.AvroNative
    val df = Seq((1L, "a")).toDF("id", "s")
    val dir = Files.createTempDirectory("graft-avro-mode").toString + "/t"
    AvroNative.write(df, dir)
    val before = AvroNative.read(spark, dir).count()
    // 'error' is Spark's canonical fail-if-exists spelling — it must not
    // fall through to an append
    intercept[IllegalStateException](AvroNative.write(df, dir, mode = "error"))
    intercept[IllegalStateException](AvroNative.write(df, dir, mode = "errorifexists"))
    AvroNative.write(df, dir, mode = "ignore") // no-op, not an append
    assert(AvroNative.read(spark, dir).count() == before)
    intercept[IllegalArgumentException](AvroNative.write(df, dir, mode = "bogus"))
  }

  test("avro read accepts a single file and a glob (r17 review)") {
    import graft.sources.AvroNative
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "s").coalesce(1)
    val dir = Files.createTempDirectory("graft-avro-glob").toString
    AvroNative.write(df, s"$dir/d1")
    AvroNative.write(df, s"$dir/d2")
    val one = new java.io.File(s"$dir/d1").listFiles()
      .filter(_.getName.endsWith(".avro")).head.getPath
    assert(AvroNative.read(spark, one).count() == 2)          // single file
    assert(AvroNative.read(spark, s"$dir/d*").count() == 4)   // dir glob
    assert(AvroNative.read(spark, s"$dir/d1/*.avro").count() == 2) // file glob
  }

  test("a single multi-block avro file splits into many sync-range tasks") {
    import graft.sources.AvroNative
    // one container file (one partition), enough data to span many sync
    // blocks (DataFileWriter seals a block ~every 64 KB)
    val n = 20000
    val df = spark.range(n).toDF("id")
      .withColumn("payload", concat(lit("x" * 64), col("id").cast("string")))
      .coalesce(1)
    val dir = Files.createTempDirectory("graft-avro-split").toString + "/t"
    AvroNative.write(df, dir)
    // commit protocol: no _temporary residue, exactly one sealed part file
    val files = new java.io.File(dir).listFiles().map(_.getName).toSeq
    assert(files.count(_.endsWith(".avro")) == 1)
    assert(!files.contains("_temporary"))
    val back = AvroNative.read(spark, dir, maxSplitBytes = 64 * 1024)
    assert(back.rdd.getNumPartitions > 1,
      s"expected >1 sync-range task, got ${back.rdd.getNumPartitions}")
    assert(back.count() == n)
    // exactly-once across range boundaries: ids are a permutation of 0..n-1
    assert(back.agg(countDistinct("id"), sum("id")).collect().head.toSeq ==
      Seq(n.toLong, n.toLong * (n - 1) / 2))
    // partial consumption must not wedge on leaked streams (close is via
    // task-completion listener, not iterator exhaustion)
    assert(back.limit(5).collect().length == 5)
  }

  test("avro projected read decodes only the requested columns") {
    import graft.sources.AvroNative
    val df = Seq((1L, "a", 1.5), (2L, "b", 2.5)).toDF("id", "name", "score")
    val dir = Files.createTempDirectory("graft-avro-proj").toString + "/t"
    AvroNative.write(df, dir)
    val proj = AvroNative.read(spark, dir, columns = Seq("id", "score"))
    assert(proj.schema.fieldNames.toSeq == Seq("id", "score"))
    assert(proj.orderBy("id").collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      == Seq((1L, 1.5), (2L, 2.5)))
    val err = intercept[IllegalArgumentException](
      AvroNative.read(spark, dir, columns = Seq("nope")))
    assert(err.getMessage.contains("unknown columns"))
  }

  test("avro read of an empty directory fails with a clear message") {
    import graft.sources.AvroNative
    val dir = Files.createTempDirectory("graft-avro-empty").toString
    val err = intercept[IllegalArgumentException](AvroNative.read(spark, dir))
    assert(err.getMessage.contains("no .avro files"))
  }

  test("a drop-in MediaDecoder SPI implementation composes with embedding near-dup") {
    // FakeFfmpegDecoder stands in for a JNI/ffmpeg decoder: plugged in by
    // class name only, instantiated per partition, open/close observed
    val df = Multimodal.asMedia(Seq(
      (1L, "same video content"), (2L, "same video content"),
      (3L, "completely different scene")).toDF("id", "text"),
      col("text"), "video", "mp4")
    val feats = Multimodal.extractFeatures(df, "id", dim = 16,
        decoderClass = classOf[FakeFfmpegDecoder].getName)
      .withColumnRenamed("id", "vec_id").withColumnRenamed("features", "embedding")
    val pairs = graft.dedup.Dedup.embeddingNearDup(feats, threshold = 0.999)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)), s"got $pairs")
    // frame sampling rides the same SPI: 3 frames per payload, tagged
    val frames = Multimodal.frameSample(df, "id", n = 3,
      decoderClass = classOf[FakeFfmpegDecoder].getName)
    assert(frames.columns.toSeq == Seq("id", "frame_idx", "frame_bytes"))
    assert(frames.groupBy("id").count().collect().forall(_.getLong(1) == 3L))
    assert(frames.filter(col("frame_bytes").isNull).count() == 0)
    // lifecycle: every partition that decoded something closed its decoder
    assert(FakeFfmpegDecoder.openCount.get() > 0)
    assert(FakeFfmpegDecoder.closeCount.get() == FakeFfmpegDecoder.openCount.get())
  }

  // ---- REAL image path (pure JDK, graft.multimodal.Images) ---------------

  private def pngBytes(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private def gradientPng(w: Int, h: Int, invert: Boolean): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v0 = (x * 255) / math.max(1, w - 1)
      val v = if (invert) 255 - v0 else v0
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("dHash is scale-invariant and imageNearDup pairs perceptual twins only") {
    import graft.multimodal.Images
    val a1 = Images.dHash(gradientPng(64, 48, invert = false)).get
    val a2 = Images.dHash(gradientPng(128, 96, invert = false)).get // same content, 2x scale
    val b = Images.dHash(gradientPng(64, 48, invert = true)).get    // reversed gradient
    assert(java.lang.Long.bitCount(a1 ^ a2) <= 4, s"rescale moved the hash: $a1 vs $a2")
    assert(java.lang.Long.bitCount(a1 ^ b) > 20, "opposite gradients too close")
    assert(Images.dHash("junk".getBytes("UTF-8")).isEmpty)
    val df = Seq(
      (1L, gradientPng(64, 48, invert = false)),
      (2L, gradientPng(128, 96, invert = false)),
      (3L, gradientPng(64, 48, invert = true)),
      (4L, "junk".getBytes("UTF-8"))).toDF("id", "payload")
    val pairs = Images.imageNearDup(df, "id", maxHamming = 7)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)), s"got $pairs")
  }

  test("probeImages decodes real PNG dimensions and flags junk") {
    import graft.multimodal.Images
    val rows = Seq(
      (1L, pngBytes(8, 6, 0xffffff)),
      (2L, pngBytes(3, 5, 0x000000)),
      (3L, "not an image at all".getBytes("UTF-8")))
    val df = rows.toDF("id", "payload")
    val out = Images.probeImages(df, "id").collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(1), r.getInt(2), r.getInt(3)))).toMap
    assert(out(1L) == ((true, 8, 6)))
    assert(out(2L) == ((true, 3, 5)))
    assert(out(3L) == ((false, 0, 0)))
  }

  test("imageFeatures: real luminance histograms separate dark from light") {
    import graft.multimodal.Images
    val df = Seq((1L, pngBytes(10, 10, 0x000000)), (2L, pngBytes(10, 10, 0xffffff)),
      (3L, Array[Byte](1, 2, 3))).toDF("id", "payload")
    val by = Images.imageFeatures(df, "id", bins = 4).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(by(1L).head == 1.0f && by(1L).sum == 1.0f)      // all-black → bin 0
    assert(by(2L).last == 1.0f && by(2L).sum == 1.0f)      // all-white → last bin
    assert(by(3L).sum == 0.0f)                             // junk → zero vector
  }

  test("resizeImages really rescales and updates metadata; junk passes through") {
    import graft.multimodal.Images
    val junk = "zz".getBytes("UTF-8")
    val df = Multimodal.asMedia(
      Seq((1L, pngBytes(16, 12, 0x336699)), (2L, junk)).toDF("id", "raw")
        .withColumn("raw", col("raw")), col("raw"), "image", "png")
    val out = Images.resizeImages(df, width = 4, height = 3)
    val byId = out.select("id", "payload", "media_meta.width", "media_meta.height")
      .collect().map(r => r.getLong(0) -> r).toMap
    val resized = byId(1L).getAs[Array[Byte]]("payload")
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(resized))
    assert(img.getWidth == 4 && img.getHeight == 3)
    assert(byId(1L).getInt(2) == 4 && byId(1L).getInt(3) == 3)
    assert(byId(2L).getAs[Array[Byte]]("payload").toSeq == junk.toSeq, "junk mutated")
  }

  // ---- REAL audio path (pure JDK, graft.multimodal.Audio) ----------------

  private def wavBytes(samples: Array[Short], rate: Float): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(rate, 16, 1, true, false)
    val bytes = new Array[Byte](samples.length * 2)
    for (i <- samples.indices) {
      bytes(2 * i) = (samples(i) & 0xff).toByte
      bytes(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(bytes), fmt, samples.length.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("probeAudio decodes real WAV headers and flags junk") {
    import graft.multimodal.Audio
    val df = Seq(
      (1L, wavBytes(new Array[Short](4000), 8000f)),
      (2L, "definitely not audio".getBytes("UTF-8"))).toDF("id", "payload")
    val out = Audio.probeAudio(df, "id").collect()
      .map(r => r.getLong(0) ->
        ((r.getBoolean(1), r.getInt(2), r.getInt(3), r.getLong(4), r.getLong(5)))).toMap
    assert(out(1L) == ((true, 1, 8000, 4000L, 500L)))
    assert(out(2L) == ((false, 0, 0, 0L, 0L)))
  }

  test("audioFeatures: real RMS envelope tracks where the energy is") {
    import graft.multimodal.Audio
    // first half silence, second half a constant-amplitude square wave
    val half = 2000
    val samples = new Array[Short](2 * half)
    for (i <- half until 2 * half)
      samples(i) = if (i % 2 == 0) 16384.toShort else (-16384).toShort
    val df = Seq((1L, wavBytes(samples, 8000f)), (2L, Array[Byte](9, 9)))
      .toDF("id", "payload")
    val by = Audio.audioFeatures(df, "id", windows = 4).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val env = by(1L)
    assert(env(0) == 0f && env(1) == 0f, env.toString)
    assert(env(2) == 0.5f && env(3) == 0.5f, env.toString) // |±16384|/32768
    assert(by(2L).sum == 0f, "junk must yield the zero vector")
  }

  test("audio features compose with embedding near-dup: clones match, noise doesn't") {
    import graft.multimodal.Audio
    // two near-identical clips (same energy shape, one slightly louder)
    // and one with the energy at the other end
    def clip(amp: Short, backHalf: Boolean): Array[Byte] = {
      val n = 2000
      val s = new Array[Short](n)
      val (lo, hi) = if (backHalf) (n / 2, n) else (0, n / 2)
      for (i <- lo until hi) s(i) = if (i % 2 == 0) amp else (-amp).toShort
      wavBytes(s, 8000f)
    }
    val df = Seq(
      (1L, clip(16000, backHalf = true)),
      (2L, clip(15000, backHalf = true)),
      (3L, clip(16000, backHalf = false))).toDF("id", "payload")
    val feats = Audio.audioFeatures(df, "id", windows = 8)
      .withColumnRenamed("id", "vec_id").withColumnRenamed("features", "embedding")
    val pairs = graft.dedup.Dedup.embeddingNearDup(feats, threshold = 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)), s"got $pairs")
  }

  // ---- REAL video path (MJPEG-in-AVI, pure JDK, graft.multimodal.Video) --

  private def jpegBytes(w: Int, h: Int, lum: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val v = math.min(255, math.max(0, lum))
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, (v << 16) | (v << 8) | v)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  private def mjpegAvi(lums: Seq[Int], w: Int = 32, h: Int = 24): Array[Byte] =
    graft.multimodal.Video.writeAvi(lums.map(jpegBytes(w, h, _)), w, h, fps = 10)

  test("AviInfo.durationMs clamps junk-header overflow instead of going negative") {
    import graft.multimodal.Video.AviInfo
    // the worst PARSEABLE header (u32-max rate × Int.MaxValue-clamped
    // frames) fits a Long by a hair (2^63 - 2^32 - 2^31 + 1) — exact
    val worst = AviInfo(width = 1, height = 1, microSecPerFrame = 0xFFFFFFFFL,
      totalFrames = Int.MaxValue, frameSpans = Vector.empty, payload = Array.empty)
    assert(worst.durationMs == 0xFFFFFFFFL * Int.MaxValue / 1000L
      && worst.durationMs > 0)
    // a hand-constructed overflow (the case class is public) clamps
    // instead of wrapping negative
    val junk = AviInfo(width = 1, height = 1, microSecPerFrame = Long.MaxValue,
      totalFrames = Int.MaxValue, frameSpans = Vector.empty, payload = Array.empty)
    assert(junk.durationMs == Long.MaxValue / 1000L, junk.durationMs.toString)
    // sane headers are unaffected
    val ok = AviInfo(1, 1, microSecPerFrame = 100000L, totalFrames = 6,
      frameSpans = Vector.empty, payload = Array.empty)
    assert(ok.durationMs == 600L)
  }

  test("MJPEG AVI: real probe, frame sampling, and features through the SPI") {
    import graft.multimodal.{MjpegAviDecoder, Video}
    // roundtrip: 6 synthesized JPEG frames in a written container parse back
    val avi = mjpegAvi(Seq(0, 50, 100, 150, 200, 250))
    val parsed = Video.parseAvi(avi).get
    assert(parsed.width == 32 && parsed.height == 24, parsed.toString)
    assert(parsed.frames.length == 6 && parsed.totalFrames == 6)
    assert(parsed.durationMs == 600L) // 6 frames at 10 fps
    // every recovered frame is a decodable JPEG of the right geometry
    parsed.frames.foreach { f =>
      val img = graft.multimodal.Images.decode(f).get
      assert(img.getWidth == 32 && img.getHeight == 24)
    }
    // adversarial payloads never fail a task: a mid-download truncation
    // (cut inside a frame chunk header / body), a declared chunk size far
    // past the real bytes, and a bomb of nested LIST headers all parse to
    // whatever is recoverable
    val truncated = avi.take(avi.length - 5)
    assert(Video.parseAvi(truncated).isDefined)
    assert(Video.parseAvi(avi.take(30)).isDefined) // cut inside hdrl
    val lying = avi.clone()
    lying(16) = 0xff.toByte; lying(17) = 0xff.toByte // hdrl LIST size >> file
    assert(Video.parseAvi(lying).isDefined)
    val bomb = new java.io.ByteArrayOutputStream()
    bomb.write("RIFF".getBytes("US-ASCII"))
    bomb.write(Array[Byte](0xff.toByte, 0xff.toByte, 0x3f, 0)) // big size
    bomb.write("AVI ".getBytes("US-ASCII"))
    (0 until 200000).foreach { _ =>
      bomb.write("LIST".getBytes("US-ASCII"))
      bomb.write(Array[Byte](0xff.toByte, 0xff.toByte, 0x3f, 0))
      bomb.write("hdrl".getBytes("US-ASCII"))
    }
    assert(Video.parseAvi(bomb.toByteArray).exists(_.nFrames == 0),
      "nested-LIST bomb must parse shallow, not overflow the stack")
    // an UNSIGNED size field >= 2^31 (Int-negative) must neither spin the
    // scan in place nor walk the offset backwards off the array
    def evil(size: Array[Byte]): Array[Byte] = {
      val b = new java.io.ByteArrayOutputStream()
      b.write("RIFF".getBytes("US-ASCII"))
      b.write(Array[Byte](100, 0, 0, 0))
      b.write("AVI ".getBytes("US-ASCII"))
      b.write("00dc".getBytes("US-ASCII"))
      b.write(size)
      b.write(new Array[Byte](32))
      b.toByteArray
    }
    assert(Video.parseAvi(evil(Array(0xf8.toByte, 0xff.toByte, 0xff.toByte,
      0xff.toByte))).exists(_.nFrames == 0)) // u32 = 4294967288
    assert(Video.parseAvi(evil(Array(0, 0, 0, 0x80.toByte)))
      .exists(_.nFrames == 0)) // u32 = 2^31 (Int.MinValue if truncated)
    val df = Seq((1L, avi), (2L, mjpegAvi(Seq(10, 20))),
      (3L, "not a video".getBytes("UTF-8"))).toDF("id", "payload")
    // probe: real header + movi facts; junk flagged, not failed
    val probe = Video.probeVideos(df, "id").collect()
      .map(r => (r.getLong(0), r.getBoolean(1), r.getInt(4))).toSet
    assert(probe == Set((1L, true, 6), (2L, true, 2), (3L, false, 0)), probe.toString)
    // frame sampling through the SPI: n=3 of 6 evenly (first frame always),
    // short videos yield what they have, junk yields nothing
    val frames = Multimodal.frameSample(df, "id", n = 3,
      decoderClass = classOf[MjpegAviDecoder].getName)
    val perId = frames.groupBy("id").count().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(perId == Map(1L -> 3L, 2L -> 2L), perId.toString)
    val f0 = frames.filter(col("id") === 1L && col("frame_idx") === 0)
      .collect()(0).getAs[Array[Byte]]("frame_bytes")
    assert(graft.multimodal.Images.decode(f0).isDefined, "sampled frame not a JPEG")
    // features: mean luminance histogram separates dark from light videos
    // and composes with embedding near-dup like the image/audio paths
    val vdf = Seq(
      (1L, mjpegAvi(Seq(10, 12, 14))),        // dark
      (2L, mjpegAvi(Seq(11, 13, 15))),        // dark (near-identical)
      (3L, mjpegAvi(Seq(240, 242, 244)))).toDF("id", "payload") // light
    val feats = Multimodal.extractFeatures(vdf, "id", dim = 16,
        decoderClass = classOf[MjpegAviDecoder].getName)
      .withColumnRenamed("id", "vec_id").withColumnRenamed("features", "embedding")
    val pairs = graft.dedup.Dedup.embeddingNearDup(feats, threshold = 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)), s"got $pairs")
  }
}

/** Test stand-in for a native video decoder plugged in via the
  * MediaDecoder SPI: content-deterministic features (identical payloads →
  * identical vectors) and fixed 4-byte "frames". The open/close counters
  * let the spec assert the per-partition lifecycle a JNI codec relies on.
  */
class FakeFfmpegDecoder extends graft.multimodal.Multimodal.MediaDecoder {
  override def open(): Unit = FakeFfmpegDecoder.openCount.incrementAndGet()
  override def close(): Unit = FakeFfmpegDecoder.closeCount.incrementAndGet()
  def features(payload: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var i = 0
    while (i < payload.length) {
      out(i % dim) += (payload(i) & 0xff) / 255.0f
      i += 1
    }
    out
  }
  def frames(payload: Array[Byte], n: Int): Seq[Array[Byte]] =
    (0 until n).map(i => Array[Byte]((i + 1).toByte, payload.length.toByte, 0, 1))
}

object FakeFfmpegDecoder {
  val openCount = new java.util.concurrent.atomic.AtomicInteger(0)
  val closeCount = new java.util.concurrent.atomic.AtomicInteger(0)
}
