package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.Streaming

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("windowed group by with watermark over a memory stream") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, String, Double)]
    val df = in.toDF().toDF("ts", "k", "v")
    val agg = Streaming.windowedGroupBy(df, "ts", "10 minutes", Seq("k"),
      Seq(("SUM", col("v"), "sv"), ("COUNT", lit(1), "n")), watermark = "5 minutes")
    val q = agg.writeStream.format("memory").queryName("win_agg")
      .outputMode("update").start()
    try {
      in.addData(
        (ts("2024-01-01 00:01:00"), "a", 1.0),
        (ts("2024-01-01 00:02:00"), "a", 2.0),
        (ts("2024-01-01 00:11:00"), "b", 5.0))
      q.processAllAvailable()
      val rows = spark.table("win_agg")
        .select("k", "sv", "n").orderBy("k").collect()
      assert(rows.map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSeq ==
        Seq(("a", 3.0, 2L), ("b", 5.0, 1L)))
    } finally q.stop()
  }

  test("streaming distinct within watermark") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, Long)]
    val df = in.toDF().toDF("ts", "id")
    val q = Streaming.distinctStream(df, Seq("id"), "ts", "1 hour")
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    try {
      // id=1 arrives twice with DIFFERENT event times (both within the
      // watermark): streaming DISTINCT is over idCols only, so one survives
      in.addData((ts("2024-01-01 00:00:00"), 1L), (ts("2024-01-01 00:05:00"), 1L),
        (ts("2024-01-01 00:01:00"), 2L))
      q.processAllAvailable()
      assert(spark.table("dedup_stream").count() == 2)
      assert(spark.table("dedup_stream").select("id").distinct().count() == 2)
    } finally q.stop()
  }

  test("stream-static semantic novelty screen drops indexed near-dups statelessly") {
    implicit val sqlCtx = spark.sqlContext
    val cents = Seq((0L, Array(1f, 0f)), (1L, Array(0f, 1f)))
      .toDF("centroid_id", "cvec")
    // stored corpus index: one vector in cell 0
    val index = graft.dedup.Dedup.semDedupIndex(
      Seq((500L, Array(2f, 0.1f))).toDF("vec_id", "embedding"), cents)
    val in = MemoryStream[(Long, Array[Float])]
    val batch = in.toDF().toDF("vec_id", "embedding")
    val q = graft.dedup.Dedup.semDedupScreenStream(batch, index, cents, threshold = 0.97)
      .writeStream.format("memory").queryName("sem_screen")
      .outputMode("append").start()
    try {
      in.addData(
        (5L, Array(4f, 0.2f)),   // near-dup of indexed 500 → dropped
        (6L, Array(0.1f, 3f)))   // novel, different cell → kept
      q.processAllAvailable()
      in.addData((7L, Array(2f, 0.1f)))  // exact copy in a later microbatch → dropped
      q.processAllAvailable()
      val kept = spark.table("sem_screen").select("vec_id").collect().map(_.getLong(0)).toSet
      assert(kept == Set(6L), s"got $kept")
    } finally q.stop()
  }

  test("embeddingScreenStream drops corpus AND intra-batch near-dups, appends survivors") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft-emb-screen").toString
    val cents = Seq((0L, Array(1f, 0f)), (1L, Array(0f, 1f)))
      .toDF("centroid_id", "cvec")
    val index = graft.dedup.Dedup.semDedupIndex(
      Seq((500L, Array(2f, 0.1f))).toDF("vec_id", "embedding"), cents)
    val in = MemoryStream[(Long, Array[Float])]
    val q = Streaming.embeddingScreenStream(
      in.toDF().toDF("vec_id", "embedding"), index, cents,
      s"$dir/out", s"$dir/ck", threshold = 0.97)
    try {
      // 5 is a corpus near-dup (drops); 10 and 11 are an INTRA-batch
      // near-dup pair in cell 1 (min-id 10 survives); 6 is novel
      in.addData(
        (5L, Array(4f, 0.2f)),
        (11L, Array(0.1f, 3f)), (10L, Array(0.2f, 6f)),
        (6L, Array(-3f, 0.1f)))
      q.processAllAvailable()
      val got1 = spark.read.parquet(s"$dir/out").collect().map(_.getLong(0)).toSet
      assert(got1 == Set(6L, 10L), got1.toString)
      // a later batch appends its own survivors independently
      in.addData((20L, Array(2f, 0.1f)), (21L, Array(-0.1f, -5f)))
      q.processAllAvailable()
      val got2 = spark.read.parquet(s"$dir/out").collect().map(_.getLong(0)).toSet
      assert(got2 == Set(6L, 10L, 21L), got2.toString)
      // batch ≡ stream pin: the batch pipeline on batch-1's rows agrees
      val b1 = Seq((5L, Array(4f, 0.2f)), (11L, Array(0.1f, 3f)),
        (10L, Array(0.2f, 6f)), (6L, Array(-3f, 0.1f)))
        .toDF("vec_id", "embedding")
      val batchAnswer = graft.dedup.Dedup.semDedupAgainstIndex(
        b1, index, cents, threshold = 0.97)
        .collect().map(_.getAs[Long]("vec_id")).toSet
      assert(batchAnswer == Set(6L, 10L), batchAnswer.toString)
    } finally q.stop()
  }

  test("mapGroupsWithState running aggregate across batches") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Streaming.KeyedEvent]
    val q = Streaming.runningAggPerKey(in.toDS())
      .writeStream.format("memory").queryName("running_agg")
      .outputMode("update").start()
    try {
      in.addData(Streaming.KeyedEvent("a", 1.0), Streaming.KeyedEvent("a", 2.0))
      q.processAllAvailable()
      in.addData(Streaming.KeyedEvent("a", 3.0)) // second batch accumulates state
      q.processAllAvailable()
      val last = spark.table("running_agg")
        .filter($"key" === "a").orderBy($"n".desc).collect().head
      assert(last.getLong(1) == 3L && last.getDouble(2) == 6.0)
    } finally q.stop()
  }

  test("flatMapGroupsWithState emits each closed session exactly once") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[(Timestamp, String)]
    val ds = in.toDF().toDF("ts", "key")
      .withWatermark("ts", "10 seconds")
      .select("key", "ts")
      .as[Streaming.SessionEvent]
    val q = Streaming.closedSessions(ds, gapMs = 60000)
      .writeStream.format("memory").queryName("closed_sessions")
      .outputMode("append").start()
    try {
      in.addData((ts("2024-01-01 00:00:00"), "a"), (ts("2024-01-01 00:00:30"), "a"))
      q.processAllAvailable()
      assert(spark.table("closed_sessions").count() == 0) // still open
      // 10 minutes later: gap exceeded — the first session closes and emits
      in.addData((ts("2024-01-01 00:10:00"), "a"))
      q.processAllAvailable()
      val rows = spark.table("closed_sessions").as[Streaming.ClosedSession].collect()
      assert(rows.length == 1)
      assert(rows.head.n == 2 && rows.head.endMs - rows.head.startMs == 30000L)
    } finally q.stop()
  }

  test("closedSessions survives a watermark jump larger than the gap (r17 review)") {
    // Before the fragment rewrite this sequence KILLED the query: batch 3's
    // lagging event passes the late filter (which uses the PREVIOUS batch's
    // watermark) and merges into the open session, but lastMs + gap is far
    // below the CURRENT eviction watermark, and
    // GroupStateImpl.setTimeoutTimestamp throws on a below-watermark value.
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[(Timestamp, String)]
    val ds = in.toDF().toDF("ts", "key")
      .withWatermark("ts", "10 seconds")
      .select("key", "ts")
      .as[Streaming.SessionEvent]
    // no-data micro-batches would fire the session's event-time timer
    // between addData calls and close it early — the crash window needs
    // the straggler batch to DIRECTLY follow the jump batch
    spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    val q = Streaming.closedSessions(ds, gapMs = 60000)
      .writeStream.format("memory").queryName("wm_jump_sessions")
      .outputMode("append").start()
    try {
      in.addData((ts("2024-01-01 00:00:00"), "a"))
      q.processAllAvailable()
      in.addData((ts("2024-01-01 01:00:00"), "b")) // watermark jumps ~1h
      q.processAllAvailable()
      // admitted-late straggler for "a": the late filter uses the PREVIOUS
      // batch's watermark (23:59:50, below it) while the eviction watermark
      // is already 00:59:50 — far past lastMs + gap
      in.addData((ts("2024-01-01 00:00:30"), "a"))
      q.processAllAvailable()
      assert(q.exception.isEmpty, q.exception.map(_.toString).getOrElse(""))
      val aRows = spark.table("wm_jump_sessions").as[Streaming.ClosedSession]
        .collect().filter(_.key == "a")
      assert(aRows.length == 1, aRows.mkString(";"))
      assert(aRows.head.n == 2 && aRows.head.startMs == ts("2024-01-01 00:00:00").getTime
        && aRows.head.endMs == ts("2024-01-01 00:00:30").getTime, aRows.head.toString)
    } finally {
      q.stop()
      spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "true")
    }
  }

  test("closedSessions is exact on admitted-late events: backward extension and own-session split") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[(Timestamp, String)]
    val ds = in.toDF().toDF("ts", "key")
      .withWatermark("ts", "1 hour") // generous delay: stragglers are admitted
      .select("key", "ts")
      .as[Streaming.SessionEvent]
    val q = Streaming.closedSessions(ds, gapMs = 60000)
      .writeStream.format("memory").queryName("late_sessions")
      .outputMode("append").start()
    try {
      in.addData((ts("2024-01-01 02:00:00"), "a"))
      q.processAllAvailable()
      // within the gap BEFORE the session start: extends it backward
      in.addData((ts("2024-01-01 01:59:30"), "a"))
      q.processAllAvailable()
      // far before every fragment: its OWN session, not absorbed (the old
      // single-session merge guard was vacuously true for earlier events)
      in.addData((ts("2024-01-01 01:00:30"), "a"))
      q.processAllAvailable()
      // advance the watermark to 03:00:00 so both early fragments close
      in.addData((ts("2024-01-01 04:00:00"), "a"))
      q.processAllAvailable()
      in.addData((ts("2024-01-01 04:30:00"), "b")) // one more advance to flush
      q.processAllAvailable()
      assert(q.exception.isEmpty, q.exception.map(_.toString).getOrElse(""))
      val aRows = spark.table("late_sessions").as[Streaming.ClosedSession]
        .collect().filter(_.key == "a")
        .map(r => (r.startMs, r.endMs, r.n)).toSet
      assert(aRows == Set(
        (ts("2024-01-01 01:00:30").getTime, ts("2024-01-01 01:00:30").getTime, 1L),
        (ts("2024-01-01 01:59:30").getTime, ts("2024-01-01 02:00:00").getTime, 2L)),
        aRows.toString)
    } finally q.stop()
  }

  test("runningAggPerKey idle TTL evicts state; a later event restarts from zero") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Streaming.KeyedEvent]
    val q = Streaming.runningAggPerKey(in.toDS(), idleTimeout = Some("500 milliseconds"))
      .writeStream.format("memory").queryName("running_agg_ttl")
      .outputMode("update").start()
    // processing-time timers keep the engine cycling no-data batches, which
    // can starve processAllAvailable — poll the sink with a deadline instead
    def awaitRow(pred: org.apache.spark.sql.Row => Boolean, what: String): Unit = {
      val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
      while (!spark.table("running_agg_ttl").collect().exists(pred)) {
        assert(q.exception.isEmpty, q.exception.map(_.toString).getOrElse(""))
        assert(System.nanoTime() < deadline, s"timed out waiting for: $what")
        Thread.sleep(100)
      }
    }
    try {
      in.addData(Streaming.KeyedEvent("a", 1.0), Streaming.KeyedEvent("a", 2.0))
      awaitRow(r => r.getString(0) == "a" && r.getLong(1) == 2L, "pre-TTL (a,2,3.0)")
      Thread.sleep(1200) // let the processing-time TTL elapse
      in.addData(Streaming.KeyedEvent("b", 9.0)) // keeps batches flowing
      awaitRow(r => r.getString(0) == "b", "(b,1,9.0)")
      in.addData(Streaming.KeyedEvent("a", 5.0)) // state was evicted → restarts
      awaitRow(r => r.getString(0) == "a" && r.getLong(1) == 1L &&
        r.getDouble(2) == 5.0, "post-TTL restart (a,1,5.0)")
      assert(q.exception.isEmpty, q.exception.map(_.toString).getOrElse(""))
    } finally q.stop()
  }

  test("file stream end-to-end: read csv dir, window, write parquet") {
    val dir = Files.createTempDirectory("graft-stream").toString
    val inDir = s"$dir/in"; val outDir = s"$dir/out"; val ck = s"$dir/ck"
    // two file batches (maxFilesPerTrigger=1, oldest first): the second
    // batch's 00:25 event advances the watermark past the first window's
    // end, so append mode MUST emit the closed ("a", 3.0) window
    Seq((ts("2024-01-01 00:01:00"), "a", 1.0), (ts("2024-01-01 00:02:00"), "a", 2.0))
      .toDF("ts", "k", "v").coalesce(1).write.option("header", "false").csv(inDir)
    Thread.sleep(1100) // distinct mod times keep file-batch order stable
    Seq((ts("2024-01-01 00:25:00"), "b", 5.0))
      .toDF("ts", "k", "v").coalesce(1).write.mode("append").option("header", "false").csv(inDir)
    val src = Streaming.readStream(spark, inDir, "csv",
      "STRING ts, STRING k, DOUBLE v", Map("maxFilesPerTrigger" -> "1"))
      .select(col("ts").cast("timestamp").as("ts"), col("k"), col("v"))
    val agg = Streaming.windowedGroupBy(src, "ts", "10 minutes", Seq("k"),
      Seq(("SUM", col("v"), "sv")), watermark = "0 seconds")
      .select(col("k"), col("sv"))
    val q = agg.writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", ck)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val out = spark.read.parquet(outDir)
    assert(out.columns.toSeq == Seq("k", "sv"))
    val closed = out.collect().map(r => (r.getString(0), r.getDouble(1))).toSet
    assert(closed.contains(("a", 3.0)), s"expected closed window ('a', 3.0), got $closed")
  }

  test("a stream screens against a static seasonal profile, batch ≡ stream") {
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.Behavior
    // yesterday's baseline, batch-built: phase 0 ~10, phase 1 ~100
    val hist = Seq(
      ("m", 0L, 10L), ("m", 100L, 11L), ("m", 200L, 9L), ("m", 300L, 10L),
      ("m", 50L, 100L), ("m", 150L, 101L), ("m", 250L, 99L), ("m", 350L, 100L)
    ).toDF("k", "ts", "qv")
    val prof = Behavior.seasonalProfile(hist, Seq("k"), "ts", "qv", 100L, 50L)
    // live events: one normal per phase, one wild outlier
    val live = Seq(("m", 410L, 10L), ("m", 460L, 100L), ("m", 510L, 75L))
    val expected = Behavior.seasonalScreen(
        live.toDF("k", "ts", "qv"), prof, Seq("k"), "ts", "qv", 100L, 50L,
        cutoff = 3.0)
      .collect().map(r => r.getAs[Long]("ts")).toSet
    assert(expected == Set(510L), s"batch screen got $expected")
    val in = MemoryStream[(String, Long, Long)]
    val screened = Behavior.seasonalScreen(
      in.toDF().toDF("k", "ts", "qv"), prof, Seq("k"), "ts", "qv", 100L, 50L,
      cutoff = 3.0)
    val q = screened.writeStream.format("memory").queryName("seasonal_screen")
      .outputMode("append").start()
    try {
      in.addData(live: _*)
      q.processAllAvailable()
      val got = spark.table("seasonal_screen")
        .collect().map(_.getAs[Long]("ts")).toSet
      assert(got == expected, s"stream screen got $got")
    } finally q.stop()
  }

  test("upsertStream applies CDC batches: creates, merges, resolves in-batch conflicts by seq") {
    implicit val sqlCtx = spark.sqlContext
    val base = Files.createTempDirectory("graft-upsert-stream").toString
    val in = MemoryStream[(Long, Int, String, Long)]
    val q = graft.operators.Incremental.upsertStream(
      in.toDF().toDF("id", "dt", "v", "seq"),
      s"$base/t", Seq("id"), "dt", "seq", s"$base/ck")
    try {
      // batch 1 creates the target; id=1 appears twice — seq 12 must win
      in.addData((1L, 20240101, "old", 11L), (1L, 20240101, "new", 12L),
        (2L, 20240102, "b", 10L))
      q.processAllAvailable()
      val t1 = spark.read.parquet(s"$base/t").collect()
        .map(r => r.getAs[Long]("id") -> r.getAs[String]("v")).toMap
      assert(t1 == Map(1L -> "new", 2L -> "b"))
      // batch 2 updates id=2 and inserts id=3; id=1's partition untouched
      in.addData((2L, 20240102, "b2", 20L), (3L, 20240103, "c", 21L))
      q.processAllAvailable()
      val t2 = spark.read.parquet(s"$base/t").collect()
        .map(r => (r.getAs[Long]("id"), r.getAs[String]("v"), r.getAs[Int]("dt"))).toSet
      assert(t2 == Set((1L, "new", 20240101), (2L, "b2", 20240102), (3L, "c", 20240103)))
    } finally q.stop()
  }

  test("upsertStream with an op column: streamed deletes apply, first batch skips dead keys") {
    implicit val sqlCtx = spark.sqlContext
    val base = Files.createTempDirectory("graft-cdc-stream").toString
    val in = MemoryStream[(Long, Int, String, String, Long)]
    val q = graft.operators.Incremental.upsertStream(
      in.toDF().toDF("id", "dt", "v", "op", "seq"),
      s"$base/t", Seq("id"), "dt", "seq", s"$base/ck", opCol = Some("op"))
    try {
      // first batch CREATES the table: id=9 is inserted-then-deleted in
      // the same batch (seq ordering) so it must never land; the op
      // column itself must not become a table column
      in.addData((1L, 20240101, "a", "I", 1L), (2L, 20240101, "b", "I", 2L),
        (9L, 20240102, "ghost", "I", 3L), (9L, 20240102, "ghost", "D", 4L))
      q.processAllAvailable()
      val t1 = spark.read.parquet(s"$base/t")
      assert(!t1.columns.contains("op"), t1.columns.mkString(","))
      assert(t1.collect().map(_.getAs[Long]("id")).toSet == Set(1L, 2L))
      // second batch: delete id=1, update id=2, insert id=3
      in.addData((1L, 20240101, "a", "D", 10L), (2L, 20240101, "b2", "U", 11L),
        (3L, 20240103, "c", "I", 12L))
      q.processAllAvailable()
      val t2 = spark.read.parquet(s"$base/t").collect()
        .map(r => r.getAs[Long]("id") -> r.getAs[String]("v")).toMap
      assert(t2 == Map(2L -> "b2", 3L -> "c"), t2.toString)
    } finally q.stop()
  }

  test("upsertStream: an ALL-DELETE first batch must not brick the stream") {
    implicit val sqlCtx = spark.sqlContext
    val base = Files.createTempDirectory("graft-cdc-allDel").toString
    val in = MemoryStream[(Long, Int, String, String, Long)]
    val q = graft.operators.Incremental.upsertStream(
      in.toDF().toDF("id", "dt", "v", "op", "seq"),
      s"$base/t", Seq("id"), "dt", "seq", s"$base/ck", opCol = Some("op"))
    try {
      // batch 0: deletes only — the target must NOT be created as an
      // empty (schema-less) parquet dir that breaks every later batch
      in.addData((7L, 20240101, "x", "D", 1L))
      q.processAllAvailable()
      // batch 1 creates the table normally
      in.addData((1L, 20240101, "a", "I", 2L))
      q.processAllAvailable()
      val t = spark.read.parquet(s"$base/t").collect()
        .map(r => r.getAs[Long]("id") -> r.getAs[String]("v")).toMap
      assert(t == Map(1L -> "a"), t.toString)
    } finally q.stop()
  }

  test("upsertStream: the null partition merges and drops through the stream") {
    implicit val sqlCtx = spark.sqlContext
    val base = Files.createTempDirectory("graft-cdc-nullpart").toString
    val in = MemoryStream[(Long, Option[String], String, String, Long)]
    val q = graft.operators.Incremental.upsertStream(
      in.toDF().toDF("id", "dt", "v", "op", "seq"),
      s"$base/t", Seq("id"), "dt", "seq", s"$base/ck", opCol = Some("op"))
    try {
      // batch 0 creates a mixed table with two rows in the NULL partition
      in.addData((1L, None, "a", "I", 1L), (2L, None, "b", "I", 2L),
        (3L, Some("2024-01-01"), "c", "I", 3L))
      q.processAllAvailable()
      assert(new java.io.File(s"$base/t/dt=__HIVE_DEFAULT_PARTITION__").exists())
      // batch 1 updates one null-partition key — the other must survive
      in.addData((1L, None, "a2", "U", 10L))
      q.processAllAvailable()
      val t1 = spark.read.parquet(s"$base/t").collect()
        .map(r => r.getAs[Long]("id") -> r.getAs[String]("v")).toMap
      assert(t1 == Map(1L -> "a2", 2L -> "b", 3L -> "c"), t1.toString)
      // batch 2 deletes both: the __HIVE_DEFAULT_PARTITION__ dir drops
      in.addData((1L, None, "a2", "D", 20L), (2L, None, "b", "D", 21L))
      q.processAllAvailable()
      assert(!new java.io.File(s"$base/t/dt=__HIVE_DEFAULT_PARTITION__").exists(),
        "emptied null partition survived the streamed delete")
      val t2 = spark.read.parquet(s"$base/t").collect().map(_.getAs[Long]("id")).toSet
      assert(t2 == Set(3L), t2.toString)
    } finally q.stop()
  }

  test("streamRefresh maintains the additive MV from a stream of facts") {
    implicit val sqlCtx = spark.sqlContext
    val base = Files.createTempDirectory("graft-mv-stream").toString
    val in = MemoryStream[(Int, String, Long)]
    val q = graft.operators.Incremental.streamRefresh(
      in.toDF().toDF("dt", "k", "v"), s"$base/mv", "dt", Seq("k"),
      Seq(("SUM", col("v"), "sv"), ("COUNT", lit(1), "n")), s"$base/ck")
    try {
      in.addData((20240101, "a", 10L), (20240101, "a", 5L), (20240102, "b", 1L))
      q.processAllAvailable()
      // second batch touches EXISTING dates — partials must merge, not replace
      in.addData((20240102, "b", 2L), (20240101, "a", 1L))
      q.processAllAvailable()
      val res = graft.operators.Incremental.query(spark, s"$base/mv", Seq("k"),
        Seq(("SUM", "sv", "sum_v"), ("SUM", "n", "n_rows")))
        .orderBy("k").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      assert(res == Seq(("a", 16L, 3L), ("b", 3L, 2L)))
    } finally q.stop()
  }

  test("streamRefresh crash-window replay does not double-count (r17 review)") {
    // the crash window: MV written, but neither the graft batch marker nor
    // Spark's commit log recorded the batch. On restart the batch REPLAYS;
    // the merge must run against the staged PRE-batch snapshot, not the
    // live (already-merged) MV — before the prestate fix this double-
    // counted the replayed batch's rows
    val base = Files.createTempDirectory("graft-mv-crash").toString
    val inDir = s"$base/in"; val mv = s"$base/mv"; val ck = s"$base/ck"
    Seq((20240101, "a", 10L), (20240101, "a", 5L))
      .toDF("dt", "k", "v").coalesce(1)
      .write.option("header", "false").csv(inDir)
    def start() = graft.operators.Incremental.streamRefresh(
      Streaming.readStream(spark, inDir, "csv", "INT dt, STRING k, LONG v",
        Map("maxFilesPerTrigger" -> "1")),
      mv, "dt", Seq("k"),
      Seq(("SUM", col("v"), "sv"), ("COUNT", lit(1), "n")), ck)
    def run(q: org.apache.spark.sql.streaming.StreamingQuery): Unit = {
      try q.processAllAvailable() finally q.stop()
      // stop() can race the next start() on the same checkpoint — wait for
      // the active-query registry to drain before restarting
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (spark.streams.active.exists(_.id == q.id)) {
        assert(System.nanoTime() < deadline, "query did not deregister")
        Thread.sleep(50)
      }
    }
    val q1 = start()
    run(q1)
    def totals() = graft.operators.Incremental.query(spark, mv, Seq("k"),
      Seq(("SUM", "sv", "sum_v"), ("SUM", "n", "n_rows")))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(totals() == Set(("a", 15L, 2L)))
    // simulate the crash: drop batch 0 from Spark's commit log AND the
    // graft marker (both writes happen AFTER the MV merge)
    assert(new java.io.File(s"$ck/commits/0").delete(), "no commit log?")
    new java.io.File(s"$ck/commits/.0.crc").delete() // orphaned checksum
    new java.io.File(s"$ck/commits/.0.crc.crc").delete()
    val marker = new org.apache.hadoop.fs.Path(mv, "_graft_last_batch")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.delete(marker, false), "no graft marker?")
    val q2 = start() // restart → batch 0 replays
    run(q2)
    assert(totals() == Set(("a", 15L, 2L)), s"replay double-counted: ${totals()}")
    // and the stream keeps accumulating normally after the recovery
    Thread.sleep(1100) // distinct mod time keeps file-batch order stable
    Seq((20240101, "a", 1L), (20240102, "b", 2L))
      .toDF("dt", "k", "v").coalesce(1)
      .write.mode("append").option("header", "false").csv(inDir)
    val q3 = start()
    run(q3)
    assert(totals() == Set(("a", 16L, 3L), ("b", 2L, 1L)), totals().toString)
  }

  test("curation operators run unchanged on a stream (quality + sampling)") {
    // the corpus-curation maps are narrow/stateless, so the SAME operator
    // calls work under readStream — and must agree with the batch results
    implicit val sqlCtx = spark.sqlContext
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "x"),
      (3L, "a a a a a a a a a a"),
      (4L, "the quick brown fox jumps over the lazy dog"))
    def curate(df: org.apache.spark.sql.DataFrame) =
      graft.operators.Sampling.hashSample(
        graft.text.TextAnalysis.withRepetitionFeatures(
          graft.text.TextAnalysis.withQualityFeatures(df)),
        col("doc_id"), 0.7)
        .select("doc_id", "n_tokens", "stopword_ratio", "dup_token_frac")
    val in = MemoryStream[(Long, String)]
    val q = curate(in.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("curated_stream")
      .outputMode("append").start()
    try {
      in.addData(docs: _*)
      q.processAllAvailable()
      val streamed = spark.table("curated_stream").collect().map(_.toSeq).toSet
      val batch = curate(docs.toDF("doc_id", "text")).collect().map(_.toSeq).toSet
      assert(streamed == batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("classifier scoring and PQ encoding run unchanged on a stream") {
    // model application is a narrow map: fit offline, score/encode online.
    // The same score()/pqEncode() calls work under readStream and must
    // agree with the batch results row-for-row.
    implicit val sqlCtx = spark.sqlContext
    val emb = sf("embeddings").limit(40).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
    val batchDf = emb.toSeq.toDF("vec_id", "embedding")
    val labeled = sf("embeddings").withColumn("q", (col("label") < 5).cast("int"))
    val (w, b) = graft.similarity.Classifier.logregFit(labeled, col("q"), dim = 64,
      iters = 5)
    val books = graft.similarity.Pq.pqTrain(sf("embeddings"), m = 8, k = 16, iters = 2)

    val in = MemoryStream[(Long, Seq[Float])]
    val scored = graft.similarity.Classifier.score(
      in.toDF().toDF("vec_id", "embedding"), w, b)
      .select("vec_id", "quality_score")
    val q = scored.writeStream.format("memory").queryName("scored_stream")
      .outputMode("append").start()
    try {
      in.addData(emb.toSeq: _*)
      q.processAllAvailable()
      val streamed = spark.table("scored_stream").collect().map(_.toSeq).toSet
      val batch = graft.similarity.Classifier.score(batchDf, w, b)
        .select("vec_id", "quality_score").collect().map(_.toSeq).toSet
      assert(streamed == batch && streamed.size == 40)
    } finally q.stop()
    // pqEncode aggregates per row group — batch parity on the same rows
    val codesBatch = graft.similarity.Pq.pqEncode(batchDf, books).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(codesBatch.size == 40 && codesBatch.values.forall(_.length == 8))
  }

  test("near-dup candidates stream against a static minhash index") {
    // the incremental-dedup shape at 100 TB: the corpus band index is built
    // once (static), each arriving micro-batch is banded (narrow per-row
    // expressions) and stream-static joined against it
    implicit val sqlCtx = spark.sqlContext
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val corpus = Seq((1L, base),
      (2L, "one two three four five six seven eight nine ten")).toDF("doc_id", "text")
    val index = graft.dedup.Dedup.minHashIndex(corpus, shingleN = 2, k = 16, bands = 8)
    val in = MemoryStream[(Long, String)]
    val cands = graft.dedup.Dedup.minHashLshAgainstIndex(
      in.toDF().toDF("doc_id", "text"), index, shingleN = 2, k = 16, bands = 8)
    val q = cands.writeStream.format("memory").queryName("neardup_stream")
      .outputMode("append").start()
    try {
      in.addData((100L, base.replace("mu", "nu")), (101L, "wholly unrelated text here"))
      q.processAllAvailable()
      val got = spark.table("neardup_stream").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got.contains((100L, 1L)), got.toString)
      assert(!got.exists(_._1 == 101L), got.toString)
    } finally q.stop()
  }

  test("minHashScreenStream drops verified corpus near-dups, appends survivors") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft-mh-screen").toString
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val corpus = Seq((1L, base),
      (2L, "one two three four five six seven eight nine ten")).toDF("doc_id", "text")
    val index = graft.dedup.Dedup.minHashIndex(corpus, shingleN = 2, k = 16, bands = 8)
    val in = MemoryStream[(Long, String)]
    val q = Streaming.minHashScreenStream(
      in.toDF().toDF("doc_id", "text"), index, corpus,
      s"$dir/out", s"$dir/ck", shingleN = 2, k = 16, bands = 8, threshold = 0.5)
    try {
      // 100 is a true near-dup of corpus doc 1 (drops); 101 is unrelated
      // (survives); 102 BAND-collides candidates can arise but exact
      // verification keeps it (low real jaccard vs corpus doc 2)
      in.addData((100L, base.replace("mu", "nu")),
        (101L, "wholly unrelated text goes here"),
        (102L, "one two three completely different tail of words"))
      q.processAllAvailable()
      val got1 = spark.read.parquet(s"$dir/out").collect()
        .map(_.getLong(0)).toSet
      assert(got1 == Set(101L, 102L), got1.toString)
      // a later batch appends its own survivors
      in.addData((200L, "another novel document entirely"), (201L, base))
      q.processAllAvailable()
      val got2 = spark.read.parquet(s"$dir/out").collect().map(_.getLong(0)).toSet
      assert(got2 == Set(101L, 102L, 200L), got2.toString)
      // an INTRA-batch near-dup pair loses one member (min-id survivor),
      // composed with the corpus screen in the same micro-batch
      val nd = "red orange yellow green blue indigo violet cyan magenta white"
      val b3 = Seq((301L, nd.replace("white", "black")), (300L, nd), (302L, base))
      in.addData(b3: _*)
      q.processAllAvailable()
      val got3 = spark.read.parquet(s"$dir/out").collect().map(_.getLong(0)).toSet
      assert(got3 == Set(101L, 102L, 200L, 300L), got3.toString)
      // batch ≡ stream pin: the batch-side composition of the same rule
      // (minHashDedup → dupClusters min-id survivors → corpus screen) on
      // the same rows yields exactly the streamed batch-3 survivors
      val b3df = b3.toDF("doc_id", "text")
      val pairs = graft.dedup.Dedup.minHashDedup(
        b3df, shingleN = 2, k = 16, bands = 8, threshold = 0.5)
      val intra = graft.dedup.Dedup.clusterSurvivors(
        b3df, graft.dedup.Dedup.dupClusters(pairs))
      val corpusDups = graft.dedup.Dedup.minHashDedupAgainstIndex(
        intra, index, corpus, shingleN = 2, k = 16, bands = 8, threshold = 0.5)
        .select(col("batch_id").as("doc_id")).distinct()
      val batchAnswer = intra.join(corpusDups, Seq("doc_id"), "left_anti")
        .collect().map(_.getLong(0)).toSet
      assert(batchAnswer == Set(300L), batchAnswer.toString)
    } finally q.stop()
  }

  test("minHashScreenStream: STRING doc ids dedup intra-batch (no silent no-op)") {
    // the round-12 claim: idCol may be integral or string — before the
    // ccEdgeIds fix, string ids null-cast inside dupClusters and the
    // intra-batch pass silently no-opped
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft-mh-screen-sid").toString
    val corpus = Seq(("c1", "one two three four five six seven eight nine ten"))
      .toDF("doc_id", "text")
    val index = graft.dedup.Dedup.minHashIndex(corpus, shingleN = 2, k = 16, bands = 8)
    val in = MemoryStream[(String, String)]
    val q = Streaming.minHashScreenStream(
      in.toDF().toDF("doc_id", "text"), index, corpus,
      s"$dir/out", s"$dir/ck", shingleN = 2, k = 16, bands = 8, threshold = 0.5)
    try {
      // docB/docA are an intra-batch near-dup pair: lexicographic min
      // docA must survive, docB must NOT (both are corpus-novel)
      val nd = "red orange yellow green blue indigo violet cyan magenta white"
      in.addData(("docB", nd), ("docA", nd.replace("white", "black")),
        ("docZ", "wholly unrelated text goes here"))
      q.processAllAvailable()
      val got = spark.read.parquet(s"$dir/out").collect()
        .map(_.getString(0)).toSet
      assert(got == Set("docA", "docZ"), got.toString)
    } finally q.stop()
  }

  test("exactlyOnceAppend: a body/marker crash-window replay leaves exactly one copy") {
    import graft.operators.Incremental
    val dir = Files.createTempDirectory("graft-e1-append").toString
    val out = s"$dir/out"; val ck = s"$dir/ck"
    val b0 = Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text")
    Incremental.exactlyOnceAppend(b0, 0L, out, ck)(_ => b0)
    // simulate a crash BETWEEN the append body and the marker write: the
    // marker vanishes, Structured Streaming re-invokes the same batch
    val marker = new java.io.File(out, "_graft_last_batch")
    assert(marker.exists(), "marker should exist after a completed batch")
    assert(marker.delete())
    Incremental.exactlyOnceAppend(b0, 0L, out, ck)(_ => b0)
    val afterReplay = spark.read.parquet(out)
    assert(afterReplay.count() == 2, "replayed batch appended a second copy")
    assert(afterReplay.columns.contains(Incremental.BatchIdCol))
    // a genuinely new batch appends alongside, and an already-recorded
    // batch id is skipped outright (marker fast path)
    val b1 = Seq((3L, "c")).toDF("doc_id", "text")
    Incremental.exactlyOnceAppend(b1, 1L, out, ck)(_ => b1)
    Incremental.exactlyOnceAppend(b1, 1L, out, ck)(_ =>
      sys.error("body must not run for an already-recorded batch id"))
    val all = spark.read.parquet(out)
    assert(all.count() == 3)
    assert(all.select("doc_id").collect().map(_.getLong(0)).toSet == Set(1L, 2L, 3L))
    // the stamp records which micro-batch appended each row
    val byBatch = all.groupBy(Incremental.BatchIdCol).count().collect()
      .map(r => r.getAs[Number](0).longValue() -> r.getLong(1)).toMap
    assert(byBatch == Map(0L -> 2L, 1L -> 1L), byBatch.toString)
    // a stream RESTARTED FROM A FRESH CHECKPOINT renumbers batches from 0
    // — its batch 0 must append BESIDE the old lineage's batch 0, never
    // overwrite it (the partition key carries the checkpoint lineage)
    val ck2 = s"$dir/ck-fresh"
    val b0v2 = Seq((9L, "z")).toDF("doc_id", "text")
    Incremental.exactlyOnceAppend(b0v2, 0L, out, ck2)(_ => b0v2)
    val both = spark.read.parquet(out)
    assert(both.count() == 4, "fresh-checkpoint batch 0 clobbered the old lineage")
    assert(both.select(Incremental.LineageCol).distinct().count() == 2)
    // and the fresh lineage's own replay is still idempotent
    assert(new java.io.File(out, "_graft_last_batch").delete())
    Incremental.exactlyOnceAppend(b0v2, 0L, out, ck2)(_ => b0v2)
    assert(spark.read.parquet(out).count() == 4)
    // the convenience reader hides the stamps; compaction snapshots the
    // sink (stamps dropped, small files merged) without touching it
    val plain = Incremental.readAppendSink(spark, out)
    assert(plain.columns.toSet == Set("doc_id", "text"), plain.columns.mkString(","))
    val target = s"$dir/compacted"
    assert(Incremental.compactAppendSink(spark, out, target) == 4L)
    val snap = spark.read.parquet(target)
    assert(snap.columns.toSet == Set("doc_id", "text"))
    assert(snap.select("doc_id").collect().map(_.getLong(0)).toSet
      == Set(1L, 2L, 3L, 9L))
    assert(spark.read.parquet(out).count() == 4, "compaction touched the source")
    val notSink = intercept[IllegalArgumentException](
      Incremental.compactAppendSink(spark, target, s"$dir/c2"))
    assert(notSink.getMessage.contains("not an exactlyOnceAppend sink"))
    // an aliased spelling of the source cannot bypass the non-destructive
    // guard (qualified-path comparison, not raw string), and neither can
    // a nested target (inside the sink) or an enclosing one (overwriting
    // an ancestor would delete the sink itself)
    val alias = intercept[IllegalArgumentException](
      Incremental.compactAppendSink(spark, out, s"file:$out"))
    assert(alias.getMessage.contains("non-destructive"), alias.getMessage)
    val nested = intercept[IllegalArgumentException](
      Incremental.compactAppendSink(spark, out, s"$out/compact"))
    assert(nested.getMessage.contains("non-destructive"), nested.getMessage)
    val enclosing = intercept[IllegalArgumentException](
      Incremental.compactAppendSink(spark, out, dir))
    assert(enclosing.getMessage.contains("non-destructive"), enclosing.getMessage)
    // an early batch-only layout (no lineage level) still compacts
    val legacy = s"$dir/legacy"
    Seq((1L, "a")).toDF("doc_id", "text")
      .withColumn(Incremental.BatchIdCol, org.apache.spark.sql.functions.lit(0L))
      .write.partitionBy(Incremental.BatchIdCol).parquet(legacy)
    assert(Incremental.compactAppendSink(spark, legacy, s"$dir/legacy-snap") == 1L)
    assert(spark.read.parquet(s"$dir/legacy-snap").columns.toSet
      == Set("doc_id", "text"))
    // a RESPELLED-but-equivalent checkpoint path is the SAME lineage: a
    // crash-window replay under the alias overwrites, never duplicates
    assert(new java.io.File(out, "_graft_last_batch").delete())
    Incremental.exactlyOnceAppend(b0v2, 0L, out, s"file:$ck2")(_ => b0v2)
    assert(spark.read.parquet(out).count() == 4,
      "respelled checkpoint path minted a second lineage for the same stream")
    // a WIPED-and-reused checkpoint path (marker holds a higher id than
    // the renumbered stream presents) fails loudly instead of silently
    // dropping or double-processing the new incarnation's batches
    Incremental.exactlyOnceAppend(b1, 7L, out, ck2)(_ => b1)
    val wiped = intercept[IllegalArgumentException](
      Incremental.exactlyOnceAppend(b0v2, 2L, out, ck2)(_ => b0v2))
    assert(wiped.getMessage.contains("wiped"), wiped.getMessage)
  }

  test("append sink lifecycle: batches → crash replays → compact → resume equals no-crash run") {
    // the round-12 pieces composed end to end, against a reference stream
    // that never crashed: N micro-batches, a body→marker crash replay, a
    // marker→commit crash replay, a mid-life compaction snapshot, then
    // more batches — readAppendSink must equal the no-crash run throughout
    import graft.operators.Incremental
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft-sink-life").toString
    val corpus = Seq((1L, "one two three four five six seven eight nine ten"))
      .toDF("doc_id", "text")
    val index = graft.dedup.Dedup.minHashIndex(corpus, shingleN = 2, k = 16, bands = 8)
    val batchA = Seq((100L, "alpha beta gamma delta epsilon zeta eta theta"),
      (101L, "one two three four five six seven eight nine zen"))
    val batchB = Seq((200L, "red orange yellow green blue indigo violet cyan"),
      (201L, "one two three four five six seven eight nine urn"))
    val nd = "spring summer autumn winter solstice equinox dawn dusk noon night"
    val batchC = Seq((300L, nd), (301L, nd.replace("night", "midnight")))
    def screen(in: MemoryStream[(Long, String)], out: String, ck: String) =
      Streaming.minHashScreenStream(in.toDF().toDF("doc_id", "text"), index,
        corpus, out, ck, shingleN = 2, k = 16, bands = 8, threshold = 0.5)
    def ids(path: String): Set[Long] =
      Incremental.readAppendSink(spark, path).collect().map(_.getLong(0)).toSet

    // reference: the same three batches, uninterrupted
    val refIn = MemoryStream[(Long, String)]
    val refQ = screen(refIn, s"$dir/ref-out", s"$dir/ref-ck")
    try {
      for (b <- Seq(batchA, batchB, batchC)) {
        refIn.addData(b: _*); refQ.processAllAvailable()
      }
    } finally refQ.stop()
    assert(ids(s"$dir/ref-out") == Set(100L, 200L, 300L))

    // lifecycle run, batch A then B
    val out = s"$dir/out"; val ck = s"$dir/ck"
    val in = MemoryStream[(Long, String)]
    val q1 = screen(in, out, ck)
    try {
      in.addData(batchA: _*); q1.processAllAvailable()
      in.addData(batchB: _*); q1.processAllAvailable()
    } finally q1.stop()
    // crash window 1 (body ran, marker write lost): rewind the marker to
    // batch 0 and drop Spark's commit for batch 1 — the restart re-runs
    // batch 1 through the real foreachBatch path
    Incremental.recordMergedBatch(spark, out, ck, 0L)
    def dropCommit(): Unit = {
      assert(new java.io.File(s"$ck/commits/1").delete(), "no commit file to drop")
      // the checksum sidecar must go too — a stale .crc makes Hadoop's
      // ChecksumFs fail the replayed commit's rename
      new java.io.File(s"$ck/commits/.1.crc").delete()
    }
    dropCommit()
    val q2 = screen(in, out, ck)
    try q2.processAllAvailable() finally q2.stop()
    assert(ids(out) == Set(100L, 200L), "crash-window replay duplicated or lost rows")
    // mid-life compaction: snapshot equals the live sink, source untouched
    val snap = s"$dir/snap"
    assert(Incremental.compactAppendSink(spark, out, snap) == 2L)
    assert(spark.read.parquet(snap).collect().map(_.getLong(0)).toSet
      == Set(100L, 200L))
    assert(ids(out) == Set(100L, 200L), "compaction touched the source sink")
    // crash window 2 (marker recorded, Spark's commit lost): the replay
    // arrives with batchId <= marker and must SKIP the body — no
    // duplicate partition write — then the stream continues with batch C
    dropCommit()
    val q3 = screen(in, out, ck)
    try {
      q3.processAllAvailable()
      assert(ids(out) == Set(100L, 200L), "marker-covered replay re-ran the body")
      in.addData(batchC: _*); q3.processAllAvailable()
    } finally q3.stop()
    // the resumed lifecycle converges on the no-crash reference exactly
    assert(ids(out) == ids(s"$dir/ref-out"))
    // and per-batch provenance survived the whole lifecycle: one lineage,
    // three batch partitions
    val raw = spark.read.parquet(out)
    assert(raw.select(Incremental.LineageCol).distinct().count() == 1)
    assert(raw.select(Incremental.BatchIdCol).distinct().count() == 3)
  }

  test("stream-stream join matches within the time bound, drops beyond it") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Timestamp, Long)]
    val views = MemoryStream[(Timestamp, Long)]
    val joined = Streaming.streamStreamJoin(
      clicks.toDF().toDF("click_ts", "click_user"),
      views.toDF().toDF("view_ts", "view_user"),
      key = ("click_user", "view_user"),
      tsCols = ("click_ts", "view_ts"),
      watermarks = ("1 hour", "1 hour"),
      maxLag = "10 minutes")
    val q = joined.select("click_user", "click_ts", "view_ts")
      .writeStream.format("memory").queryName("ss_join")
      .outputMode("append").start()
    try {
      // user 1: view 5 min after click (within bound); user 2: view 30 min
      // after click (beyond 10-minute bound); user 3: click with no view
      clicks.addData((ts("2024-01-01 00:00:00"), 1L),
        (ts("2024-01-01 00:00:00"), 2L), (ts("2024-01-01 00:00:00"), 3L))
      views.addData((ts("2024-01-01 00:05:00"), 1L),
        (ts("2024-01-01 00:30:00"), 2L))
      q.processAllAvailable()
      val rows = spark.table("ss_join").collect()
        .map(r => r.getLong(0)).toSeq
      assert(rows == Seq(1L))
    } finally q.stop()
  }

  test("funnelStream advances per-key step frontier across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Streaming.FunnelEvent]
    val q = Streaming.funnelStream(in.toDS(), nSteps = 3)
      .writeStream.format("memory").queryName("funnel_stream")
      .outputMode("update").start()
    try {
      // batch 1: u1 views then clicks; u2's click arrives BEFORE any view
      in.addData(
        Streaming.FunnelEvent("u1", 10L, 0), Streaming.FunnelEvent("u1", 20L, 1),
        Streaming.FunnelEvent("u2", 10L, 1))
      q.processAllAvailable()
      // batch 2: u1 purchases; u2 finally views (click state must NOT
      // have advanced out of order)
      in.addData(
        Streaming.FunnelEvent("u1", 30L, 2), Streaming.FunnelEvent("u2", 20L, 0))
      q.processAllAvailable()
      val rows = spark.table("funnel_stream")
      val latest = rows.groupBy("key")
        .agg(max("depth").as("depth")).collect()
        .map(r => r.getString(0) -> r.getInt(1)).toMap
      assert(latest == Map("u1" -> 3, "u2" -> 1), latest.toString)
    } finally q.stop()
  }

  test("count-min sketch maintains itself over a stream (complete mode)") {
    // the incremental-corpus shape live: cmsBuild IS a streaming
    // aggregation, and the cell state (≤ depth·width rows) is exactly
    // what complete mode is sized for
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[String]
    val cells = graft.operators.Sketches.cmsBuild(
      in.toDF().toDF("term"), col("term"), depth = 2, width = 64)
    val q = cells.writeStream.format("memory").queryName("cms_stream")
      .outputMode("complete").start()
    try {
      in.addData("a", "b", "a")
      q.processAllAvailable()
      in.addData("a", "c")
      q.processAllAvailable()
      val streamed = spark.table("cms_stream")
      // state after two batches == the batch sketch of the union
      val batch = graft.operators.Sketches.cmsBuild(
        Seq("a", "b", "a", "a", "c").toDF("term"), col("term"),
        depth = 2, width = 64)
      assert(streamed.collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).sorted
        .sameElements(batch.collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).sorted))
      // probing the live state gives the exact hot-term count
      val est = graft.operators.Sketches.cmsQuery(streamed,
        Seq("a").toDF("t"), col("t"), depth = 2, width = 64)
      assert(est.head().getLong(1) == 3L)
    } finally q.stop()
  }

  test("cmsMerge: per-batch sketches compose to the union's sketch") {
    val s1 = graft.operators.Sketches.cmsBuild(Seq("a", "b").toDF("term"),
      col("term"), depth = 2, width = 64)
    val s2 = graft.operators.Sketches.cmsBuild(Seq("a", "c").toDF("term"),
      col("term"), depth = 2, width = 64)
    val merged = graft.operators.Sketches.cmsMerge(Seq(s1, s2))
    val full = graft.operators.Sketches.cmsBuild(
      Seq("a", "b", "a", "c").toDF("term"), col("term"), depth = 2, width = 64)
    assert(merged.collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).sorted
      .sameElements(full.collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).sorted))
  }
}
