package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental computation / materialized-view reuse — the reference's
  * summary rewriters for time-partitioned facts (reference:
  * analyzer/physical/SummaryRewriter.java:57-94, AggregateRewriter.java:54-110,
  * CountDistinctRewriter.java:55; dates as yyyyMMdd ints via
  * utils/DateTimeUtilities.java:25).
  *
  * Model: a fact relation partitioned by a date column. A *summary* MV holds
  * per-(date, keys) partial aggregates; `refresh` processes only dates newer
  * than the MV's high-water mark and writes them with dynamic partition
  * overwrite (date-partitioned parquet: re-processing a date replaces its
  * partition, so a retried or concurrent refresh is idempotent, never
  * double-counted); `query` rolls the summary up
  * to per-keys results. For COUNT(DISTINCT) — not additive across dates —
  * the summary stores distinct (date, keys, member) tuples
  * (`refreshDistinct`), exactly the reference's member-level summary trick,
  * and the final count dedups members across dates.
  *
  * At 100 TB/day this is the difference between scanning one day and
  * re-scanning history: refresh cost is O(delta), query cost is O(summary).
  */
object Incremental {

  private def exists(spark: SparkSession, path: String): Boolean = {
    val p = new Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** True when `path` holds actual table DATA (partition dirs or data
    * files), not merely metadata like the `_graft_last_batch` marker — a
    * fully-deleted CDC table keeps its marker, and schema inference over
    * a data-less directory would otherwise fail every later batch.
    */
  private def hasTableData(spark: SparkSession, path: String): Boolean = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p) && fs.listStatus(p).exists { st =>
      val n = st.getPath.getName
      !n.startsWith("_") && !n.startsWith(".")
    }
  }

  /** High-water mark of the MV (max date present), if any. Gated on actual
    * DATA, not directory existence: a data-less MV dir (only _SUCCESS/
    * markers — an empty first refresh, or a reset that kept the marker)
    * must read as "no MV yet", not crash schema inference forever.
    */
  def highWaterMark(spark: SparkSession, mvPath: String, dateCol: String): Option[Any] =
    if (!hasTableData(spark, mvPath)) None
    else spark.read.parquet(mvPath).agg(max(col(dateCol))).collect().headOption
      .flatMap(r => Option(r.get(0)))

  /** Refresh an additive summary: aggregate fact rows with date > HWM into
    * per-(date, keys) partials and append as new date partitions.
    * `aggs` must be additive (SUM/COUNT/MIN/MAX — the reference's
    * ValueAggregationType set); COUNT is stored as a SUM-able partial count,
    * mirroring the rewriters' COUNT→SUM phase switch
    * (ShuffleRewriter.java:495-523).
    */
  def refresh(spark: SparkSession, fact: DataFrame, mvPath: String,
              dateCol: String, keys: Seq[String],
              aggs: Seq[(String, Column, String)]): Unit = {
    // same additivity contract streamRefresh enforces — a non-additive
    // partial (AVG, COUNT_DISTINCT) would make query()'s rollup silently
    // wrong, not fail
    aggs.foreach { case (t, _, n) =>
      require(Set("SUM", "COUNT", "MIN", "MAX").contains(t.toUpperCase),
        s"refresh needs additive aggregates (SUM/COUNT/MIN/MAX); got $t for $n " +
          "— use refreshDistinct/refreshDistinctSketch for COUNT(DISTINCT)")
    }
    val delta = highWaterMark(spark, mvPath, dateCol) match {
      case Some(hwm) => fact.filter(col(dateCol) > lit(hwm))
      case None      => fact
    }
    val exprs = aggs.map { case (t, c, n) => Aggregations.aggExpr(t, c).as(n) }
    delta
      .groupBy((dateCol +: keys).map(col): _*)
      .agg(exprs.head, exprs.tail: _*)
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(dateCol).parquet(mvPath)
  }

  /** Roll the additive summary up to per-keys totals. `rollup` maps each
    * summary column to its re-aggregation (COUNT partials roll up with SUM).
    */
  def query(spark: SparkSession, mvPath: String, keys: Seq[String],
            rollup: Seq[(String, String, String)]): DataFrame = {
    val exprs = rollup.map { case (t, c, n) => Aggregations.aggExpr(t, col(c)).as(n) }
    spark.read.parquet(mvPath)
      .groupBy(keys.map(col): _*)
      .agg(exprs.head, exprs.tail: _*)
  }

  /** Continuous refresh: maintain the same additive summary from a STREAM
    * of fact rows — each micro-batch aggregates its own rows per (date,
    * keys) and merges into the MV (read-merge-overwrite of only the dates
    * the batch touched, so the work per batch ∝ batch size, not history).
    * The MV stays queryable with the same `query` rollup, and a streaming
    * pipeline and a daily batch job can feed the SAME view — the
    * reference's daily-MV reuse generalized to continuous arrival.
    * Exactly-once: the batch marker skips batches the streaming engine
    * replays from BEFORE the crash window, and the crash-window batch
    * itself (MV written, marker not yet) is made replay-idempotent by a
    * PRE-STATE snapshot — before the MV write, the touched dates' current
    * partials are staged under `_graft_prestate_<lineage>` keyed by the
    * batch id; a replay of the same batch merges against that snapshot
    * rather than the live (possibly already-merged) MV, producing the
    * identical overwrite. A read-modify-write against the live MV alone
    * would double-count exactly that one batch.
    */
  def streamRefresh(stream: DataFrame, mvPath: String, dateCol: String,
                    keys: Seq[String], aggs: Seq[(String, Column, String)],
                    checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery = {
    val exprs = aggs.map { case (t, c, n) => Aggregations.aggExpr(t, c).as(n) }
    // partials re-aggregate by their own additive law (COUNT partials are
    // counts, so they merge with SUM — the rewriters' COUNT→SUM switch)
    val mergeExprs = aggs.map {
      case (t, _, n) => t.toUpperCase match {
        case "COUNT" | "SUM" => sum(col(n)).as(n)
        case "MIN"           => min(col(n)).as(n)
        case "MAX"           => max(col(n)).as(n)
        case other => throw new IllegalArgumentException(
          s"streamRefresh supports additive aggregates (SUM/COUNT/MIN/MAX); got $other for $n")
      }
    }
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        exactlyOnceBatch(batch, batchId, mvPath, checkpoint) { spark =>
          val partial = batch
            .groupBy((dateCol +: keys).map(col): _*)
            .agg(exprs.head, exprs.tail: _*)
          val hconf = spark.sparkContext.hadoopConfiguration
          val preRoot = new Path(mvPath,
            s"_graft_prestate_${lineageTag(canonicalCheckpoint(spark, checkpoint))}")
          val preData = new Path(preRoot, "data")
          val preMark = new Path(preRoot, "_batch")
          val fs = preRoot.getFileSystem(hconf)
          def stagedBatch(): Long =
            if (!fs.exists(preMark)) -1L
            else {
              val in = fs.open(preMark)
              try scala.io.Source.fromInputStream(in).mkString.trim.toLong
              finally in.close()
            }
          // an empty snapshot (first data-bearing batch) stages a dir with
          // no data files — schema inference can't read that back
          def readStaged(): DataFrame = {
            val files = fs.globStatus(new Path(preData, "*.parquet"))
            if (files == null || files.isEmpty)
              spark.createDataFrame(
                spark.sparkContext.emptyRDD[Row], partial.schema)
            else spark.read.parquet(preData.toString)
          }
          val preState =
            if (stagedBatch() == batchId)
              // crash-window replay: the live MV may already hold this
              // batch's merge — the staged snapshot IS the pre-batch state
              readStaged()
            else {
              // merge only the dates this batch touched. Stage data FIRST,
              // then the batch marker: a crash mid-stage leaves a stale
              // marker and the next attempt re-stages from the live MV,
              // which the crash left untouched (the MV write comes later)
              val existing =
                if (!hasTableData(spark, mvPath))
                  spark.createDataFrame(
                    spark.sparkContext.emptyRDD[Row], partial.schema)
                else {
                  val touched = partial.select(dateCol).distinct()
                  spark.read.parquet(mvPath).join(broadcast(touched), Seq(dateCol))
                }
              existing.write.mode("overwrite").parquet(preData.toString)
              val out = fs.create(preMark, true)
              try out.write(s"$batchId\n".getBytes("UTF-8")) finally out.close()
              readStaged()
            }
          preState.unionByName(partial)
            .groupBy((dateCol +: keys).map(col): _*)
            .agg(mergeExprs.head, mergeExprs.tail: _*)
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(dateCol).parquet(mvPath)
        }
      }
      .start()
  }

  // Replay guard for streamRefresh: the id of the last batch merged into
  // the MV, kept in a marker file beside the partitions (underscore prefix
  // → invisible to parquet readers). Batch ids only mean something within
  // one checkpoint lineage, so the marker is scoped to the checkpoint
  // path: a stream restarted from a FRESH checkpoint renumbers from 0 and
  // must not be mistaken for replay.
  private def batchMarker(mvPath: String) = new Path(mvPath, "_graft_last_batch")

  /** The exactly-once foreachBatch skeleton shared by every marker-guarded
    * streaming sink (streamRefresh, upsertStream, the Streaming dedup
    * screens): skip empty batches and batches at or below the recorded
    * marker, run the body, then advance the marker. The skeleton itself
    * only guarantees AT-LEAST-ONCE for the body — a failure BETWEEN the
    * body and the marker write replays that one batch — so each body must
    * be replay-idempotent: the refresh/upsert sinks overwrite their
    * touched partitions, and the append-parquet dedup screens go through
    * [[exactlyOnceAppend]], whose batch-id-partitioned dynamic overwrite
    * makes the replayed batch rewrite exactly its own rows.
    */
  private[graft] def exactlyOnceBatch(batch: Dataset[Row], batchId: Long,
                                      outPath: String, checkpoint: String)
                                     (body: SparkSession => Unit): Unit = {
    val spark = batch.sparkSession
    val last = lastMergedBatch(spark, outPath, checkpoint)
    // batch ids only move FORWARD within one checkpoint lineage; Structured
    // Streaming replays at most the batch the marker already recorded. A
    // SMALLER id therefore means the checkpoint directory was wiped and
    // the stream renumbered from 0 at the same path — whether those
    // batches re-read old data (skip = correct) or carry genuinely new
    // rows (skip = silent data loss) is unknowable here, so fail LOUDLY
    // and make the operator decide (delete the sink's _graft_last_batch
    // to accept the new incarnation, pointing it at a fresh outPath if
    // the old rows must not be mixed with re-reads).
    require(batchId >= last,
      s"stream at checkpoint $checkpoint replayed batch $batchId but $outPath " +
        s"already recorded batch $last from the same checkpoint path — the " +
        "checkpoint was wiped and renumbered. Delete the sink's " +
        "_graft_last_batch marker (and choose a fresh outPath if these " +
        "batches re-read old data) before restarting from scratch.")
    if (!batch.isEmpty && batchId > last) {
      body(spark)
      recordMergedBatch(spark, outPath, checkpoint, batchId)
    }
  }

  /** Stamp columns for [[exactlyOnceAppend]] sinks. No leading
    * underscore: Spark's file index treats `_`-prefixed paths as hidden,
    * which would hide the partition directories themselves.
    */
  val LineageCol = "graft_lineage"
  val BatchIdCol = "graft_batch_id"

  /** Deterministic 16-hex tag of a CANONICAL checkpoint path — the lineage
    * scope for [[exactlyOnceAppend]] partitions. SHA-256-derived, NOT
    * String.hashCode: 32-bit hashCode collisions are trivial to hit
    * ("Aa" vs "BB"), and two checkpoints colliding into one lineage on a
    * shared outPath would dynamic-overwrite each other's batches — the
    * exact erasure the tag exists to prevent. Callers must pass
    * [[canonicalCheckpoint]] output so a respelled path cannot mint a
    * second lineage for the same stream.
    */
  private[graft] def lineageTag(canonicalCk: String): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(canonicalCk.getBytes("UTF-8"))
      .take(8).map(b => f"${b & 0xff}%02x").mkString

  /** Effectively-exactly-once parquet APPEND under the marker discipline:
    * stamp the batch's rows with a checkpoint-lineage tag and the batch id
    * and write them as a dynamic partition OVERWRITE of the
    * `graft_lineage=<tag>/graft_batch_id=<id>` partition. A crash in the
    * body→marker window replays the batch, and the replay rewrites
    * exactly its own partition — every other batch's rows are untouched —
    * so readers see exactly one copy without any dedup-on-read view.
    * Batch ids only mean something within one checkpoint lineage (the
    * marker discipline above), so the partition key carries BOTH: a
    * stream restarted from a fresh checkpoint at a NEW path renumbers
    * from 0, and without the lineage scope its batch 0 would silently
    * ERASE the old lineage's batch-0 survivors instead of appending
    * beside them. (Wiping and REUSING the old checkpoint path is the one
    * restart the marker cannot disambiguate — [[exactlyOnceBatch]] fails
    * that loudly instead of guessing.) The stamps double as row lineage
    * (which stream incarnation + micro-batch appended this row). The
    * two-level `graft_lineage=<tag>/graft_batch_id=<id>` layout is the
    * sink's on-disk contract; earlier builds' screens appended FLAT
    * parquet, which Spark's partition discovery cannot mix with this —
    * point an upgraded stream at a fresh outPath (or compact the old
    * sink first). One directory per micro-batch: at minutes-scale
    * triggers that is the same file count a plain append produces; use
    * [[compactAppendSink]] when the sink lives for months, and
    * [[readAppendSink]] to read without the stamps.
    */
  private[graft] def exactlyOnceAppend(batch: Dataset[Row], batchId: Long,
                                       outPath: String, checkpoint: String)
                                      (survivors: SparkSession => DataFrame): Unit =
    exactlyOnceBatch(batch, batchId, outPath, checkpoint) { spark =>
      survivors(spark)
        .withColumn(LineageCol,
          lit(lineageTag(canonicalCheckpoint(spark, checkpoint))))
        .withColumn(BatchIdCol, lit(batchId))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(LineageCol, BatchIdCol)
        .parquet(outPath)
    }

  /** Read an [[exactlyOnceAppend]] sink as plain data: the lineage/batch
    * stamp columns drop. Use the raw `spark.read.parquet(path)` when the
    * per-batch provenance matters.
    */
  def readAppendSink(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read.parquet(path)
    raw.drop(LineageCol, BatchIdCol)
  }

  /** Compact an [[exactlyOnceAppend]] sink NON-destructively: rewrite the
    * accumulated one-directory-per-micro-batch layout as a plain
    * unpartitioned parquet snapshot at `targetPath` (small files merged,
    * provenance stamps dropped) and return the row count. The source is
    * never touched — swap readers to the snapshot (and retire or truncate
    * the source) once it lands. Deliberately NOT in-place: an in-place
    * rewrite either reads and overwrites the same path in one job
    * (disallowed) or needs a multi-step delete/rename dance whose crash
    * states double- or under-count — transactional table formats exist
    * for that; a marker-disciplined parquet sink should not fake one.
    * Run against a paused stream or accept that batches appended after
    * the read began are missing from the snapshot (they remain in the
    * source — nothing is lost).
    */
  def compactAppendSink(spark: SparkSession, path: String, targetPath: String,
                        targetPartitions: Int = 0): Long = {
    require(targetPartitions >= 0, s"bad targetPartitions: $targetPartitions")
    // qualify BOTH paths (scheme + working dir resolved) and reject
    // ancestor/descendant relationships, not just equality: overwriting
    // an ANCESTOR of the sink deletes the sink itself, and writing a
    // DESCENDANT plants a non-partition directory inside it that breaks
    // every later partition discovery over the sink
    val conf = spark.sparkContext.hadoopConfiguration
    def qualified(s: String): Path = {
      val p = new Path(s); p.getFileSystem(conf).makeQualified(p)
    }
    val src = qualified(path); val tgt = qualified(targetPath)
    def isAncestorOrSelf(a: Path, b0: Path): Boolean = {
      var b = b0
      while (b != null) { if (a == b) return true; b = b.getParent }
      false
    }
    require(!isAncestorOrSelf(tgt, src) && !isAncestorOrSelf(src, tgt),
      s"compactAppendSink is non-destructive: targetPath $tgt must not equal, " +
        s"contain, or live inside the source $src")
    val raw = spark.read.parquet(path)
    // stamped layouts: lineage+batch (current), batch-only (early round-12
    // builds) — both compact; a directory with NEITHER stamp is some other
    // dataset and is rejected loudly (flat pre-stamp screen sinks are
    // plain parquet: snapshot those with an ordinary read->write)
    require(raw.columns.contains(BatchIdCol),
      s"$path is not an exactlyOnceAppend sink (no $BatchIdCol partition); " +
        "flat legacy sinks are plain parquet — snapshot them with a direct " +
        "read.parquet(...).write")
    val parts =
      if (targetPartitions > 0) targetPartitions
      else {
        // auto: ~512 MB of source bytes per output partition — a single
        // forced task on a months-old sink is a one-executor bottleneck
        val bytes = src.getFileSystem(conf).getContentSummary(src).getLength
        math.max(1, (bytes / (512L * 1024 * 1024)).toInt)
      }
    raw.drop(LineageCol, BatchIdCol)
      .repartition(parts)
      .write.mode("overwrite").parquet(targetPath)
    // count the SNAPSHOT, not the source: footer-only, sees exactly the
    // rows written, and needs no whole-sink cache pin (a months-old sink
    // must never be localCheckpointed wholesale just for a count)
    spark.read.parquet(targetPath).count()
  }

  /** Canonical spelling of a checkpoint path (scheme-qualified, working
    * dir resolved) — the identity used by BOTH the marker content and
    * [[lineageTag]], so a respelled-but-equivalent path across a restart
    * ("/ckpt" vs "file:/ckpt" vs a relative form) stays ONE lineage: the
    * raw string would read as a different stream and turn a crash-window
    * replay into a duplicated batch.
    */
  private[graft] def canonicalCheckpoint(spark: SparkSession,
                                         checkpoint: String): String = {
    val p = new Path(checkpoint)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .makeQualified(p).toString
  }

  private[graft] def lastMergedBatch(spark: SparkSession, mvPath: String,
                                     checkpoint: String): Long = {
    val p = batchMarker(mvPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) -1L
    else {
      val in = fs.open(p)
      val content = try scala.io.Source.fromInputStream(in).mkString.trim finally in.close()
      content.split("\n") match {
        // markers written by builds that predate canonicalCheckpoint hold
        // the string as PASSED — canonicalize the stored spelling too
        // (never compare raw == raw: two different pipelines' relative
        // spellings can collide as strings while canonicalizing apart).
        // Reading a legacy marker as "different lineage" would replay a
        // crash-window batch into a non-idempotent refresh/upsert merge.
        case Array(ck, id) =>
          val canon = canonicalCheckpoint(spark, checkpoint)
          if (ck == canon) id.trim.toLong
          else if (scala.util.Try(canonicalCheckpoint(spark, ck)).toOption
              .contains(canon)) {
            // matched only through canonicalization — rewrite the marker
            // in canonical form NOW: the stored spelling canonicalizes
            // against THIS process's default filesystem and cwd, so a
            // driver later restarted from a DIFFERENT cwd could resolve
            // the same relative string to a different path, read it as a
            // foreign lineage (-1), and reopen the crash-window
            // duplicate-replay this match just closed. Best-effort: the
            // rewrite is an optimization of a READ — a read-only
            // filesystem or transient failure must not fail the read
            // itself (the legacy marker is still intact and matched).
            val n = id.trim.toLong
            scala.util.Try(recordMergedBatch(spark, mvPath, checkpoint, n))
              .failed.foreach(e => System.err.println(
                s"graft: legacy marker canonical rewrite failed (this read " +
                  s"already matched; see cause for marker state): $e"))
            n
          } else -1L // different stream lineage
        case _ => -1L
      }
    }
  }

  private[graft] def recordMergedBatch(spark: SparkSession, mvPath: String,
                                       checkpoint: String, id: Long): Unit = {
    val p = batchMarker(mvPath)
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = p.getFileSystem(conf)
    // write-temp-then-rename, never truncate-in-place: the marker is also
    // REWRITTEN on the read path (legacy canonicalization), and a crash
    // between a truncating create and its close would destroy the very
    // marker whose loss reopens the crash-window duplicate replay
    val tmp = new Path(p.getParent, s".${p.getName}.${java.util.UUID.randomUUID()}.tmp")
    // Once the OLD marker at p has been deleted (non-atomic fallback below),
    // tmp holds the ONLY surviving copy — the failure-path cleanup must
    // leave it in place, or a failed rename destroys both copies and
    // reopens the crash-window duplicate replay the marker exists to close.
    var tmpIsOnlyCopy = false
    try {
      val out = fs.create(tmp, true)
      try out.write(
        s"${canonicalCheckpoint(spark, checkpoint)}\n$id".getBytes("UTF-8"))
      finally out.close()
      try {
        val fc = org.apache.hadoop.fs.FileContext.getFileContext(p.toUri, conf)
        fc.rename(fs.makeQualified(tmp), fs.makeQualified(p),
          org.apache.hadoop.fs.Options.Rename.OVERWRITE)
      } catch {
        // no AbstractFileSystem binding for this scheme (FileContext is a
        // separate registry from FileSystem — vendor connectors often ship
        // only the latter): fall back to rename, delete+rename only if the
        // destination blocks it. Non-atomic, but the temp file survives a
        // crash in the gap, and wedging the exactly-once WRITE path on an
        // optional API would be worse.
        case _: org.apache.hadoop.fs.UnsupportedFileSystemException =>
          // try non-destructively first: when p doesn't exist yet (first
          // marker) the rename succeeds without ever deleting anything
          if (!fs.rename(tmp, p)) {
            fs.delete(p, false)
            tmpIsOnlyCopy = true
            require(fs.rename(tmp, p),
              s"marker rename failed: $tmp -> $p (old marker deleted; " +
                s"marker content preserved at $tmp)")
            tmpIsOnlyCopy = false
          }
      }
    } catch {
      case e: Throwable =>
        // never leak temp droppings into the MV directory on failure —
        // UNLESS tmp is the only copy of the marker (see tmpIsOnlyCopy)
        if (!tmpIsOnlyCopy) scala.util.Try(fs.delete(tmp, false))
        throw e
    }
  }

  /** Refresh a COUNT(DISTINCT member) summary: store distinct
    * (date, keys, member) tuples for new dates only (reference:
    * CountDistinctRewriter.java:55 — partitioned-additive via member-level
    * summaries).
    */
  def refreshDistinct(spark: SparkSession, fact: DataFrame, mvPath: String,
                      dateCol: String, keys: Seq[String], memberCol: String): Unit = {
    val delta = highWaterMark(spark, mvPath, dateCol) match {
      case Some(hwm) => fact.filter(col(dateCol) > lit(hwm))
      case None      => fact
    }
    delta
      .select((dateCol +: keys :+ memberCol).map(col): _*)
      .distinct()
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(dateCol).parquet(mvPath)
  }

  /** Exact COUNT(DISTINCT member) per keys from the member-level summary —
    * members recurring across dates count once.
    */
  def queryDistinct(spark: SparkSession, mvPath: String, keys: Seq[String],
                    memberCol: String, as: String): DataFrame =
    spark.read.parquet(mvPath)
      .groupBy(keys.map(col): _*)
      .agg(count_distinct(col(memberCol)).as(as))

  /** Exact COUNT(DISTINCT member) under CUBE from the member-level summary —
    * the reference's flagship incremental computation (CountDistinctRewriter
    * feeding CUBE): history stays materialized as members, only the cube
    * over the (much smaller) summary recomputes per run.
    */
  def queryDistinctCube(spark: SparkSession, mvPath: String, dims: Seq[String],
                        memberCol: String, as: String): DataFrame =
    spark.read.parquet(mvPath)
      .cube(dims.map(col): _*)
      .agg(count_distinct(col(memberCol)).as(as))

  /** Refresh an approximate COUNT(DISTINCT) summary: one mergeable HLL
    * sketch (Apache DataSketches, via Spark's hll_sketch_agg) per
    * (date, keys). The sub-linear companion to [[refreshDistinct]]: the
    * member-level summary is exact but grows with the distinct domain —
    * at 100 TB a user-id summary IS the distinct user set. A sketch row is
    * O(2^lgK) bytes regardless of cardinality, sketches union across dates
    * and across grouping sets (the partitioned-additive property Cubert
    * engineered for exact counts, reference
    * CountDistinctRewriter.java:55, holds for HLL by construction), and
    * estimate error is ~1.04/sqrt(2^lgK) (~1.6% at the default lgK=12).
    */
  def refreshDistinctSketch(spark: SparkSession, fact: DataFrame, mvPath: String,
                            dateCol: String, keys: Seq[String], memberCol: String,
                            lgK: Int = 12): Unit = {
    val delta = highWaterMark(spark, mvPath, dateCol) match {
      case Some(hwm) => fact.filter(col(dateCol) > lit(hwm))
      case None      => fact
    }
    delta
      .groupBy((dateCol +: keys).map(col): _*)
      .agg(hll_sketch_agg(col(memberCol), lgK).as("__sketch"))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(dateCol).parquet(mvPath)
  }

  /** Approximate COUNT(DISTINCT member) per keys from the sketch summary:
    * union the per-date sketches, estimate once. Members recurring across
    * dates count once, exactly as in [[queryDistinct]].
    */
  def queryDistinctSketch(spark: SparkSession, mvPath: String, keys: Seq[String],
                          as: String): DataFrame =
    spark.read.parquet(mvPath)
      .groupBy(keys.map(col): _*)
      .agg(hll_sketch_estimate(hll_union_agg(col("__sketch"))).as(as))

  /** Approximate COUNT(DISTINCT member) under CUBE from the sketch summary —
    * every grouping set rolls up by unioning the same per-(date, keys)
    * sketches; no rescan, no Expand over the fact table.
    */
  def queryDistinctSketchCube(spark: SparkSession, mvPath: String, dims: Seq[String],
                              as: String): DataFrame =
    spark.read.parquet(mvPath)
      .cube(dims.map(col): _*)
      .agg(hll_sketch_estimate(hll_union_agg(col("__sketch"))).as(as))

  /** The BIT-PORTABLE sibling of [[refreshDistinctSketch]]: a KMV
    * (bottom-k hashes) sketch per (date, keys) instead of HLL. Same
    * bounded state (≤ k longs per row), same mergeable-semilattice
    * refresh (only dates past the high-water mark are sketched), but —
    * unlike HLL's opaque register layout — every byte of KMV state and
    * every estimate is deterministic integer/exactly-rounded-double
    * arithmetic, so an external engine can replay the summary and the
    * query hash-for-hash (see Sketches.kmvDistinct). Error ~1/sqrt(k-2).
    */
  def refreshDistinctKmv(spark: SparkSession, fact: DataFrame, mvPath: String,
                         dateCol: String, keys: Seq[String], memberCol: String,
                         k: Int = 64): Unit = {
    val delta = highWaterMark(spark, mvPath, dateCol) match {
      case Some(hwm) => fact.filter(col(dateCol) > lit(hwm))
      case None      => fact
    }
    Sketches.kmvSketch(delta, col(memberCol), (dateCol +: keys).map(col), k)
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(dateCol).parquet(mvPath)
  }

  /** Approximate COUNT(DISTINCT member) per keys from the KMV summary:
    * merge the per-date bottom-k sets (explode + re-take bottom-k — the
    * KMV semilattice), estimate once. Emits (keys..., n_mins, kth_hash,
    * nd_est) — the identical expression tree Sketches.kmvDistinct builds
    * directly, so incremental-MV == direct == oracle, hash-for-hash.
    */
  def queryDistinctKmv(spark: SparkSession, mvPath: String, keys: Seq[String],
                       k: Int = 64): DataFrame =
    Sketches.kmvEstimate(
      Sketches.kmvMerge(Seq(spark.read.parquet(mvPath)), keys, k), k)

  /** KMV distinct estimates under CUBE: every grouping set re-takes the
    * bottom-k of the union of its per-(date, keys) sketches — no rescan
    * of the fact table, and still bit-portable.
    */
  def queryDistinctKmvCube(spark: SparkSession, mvPath: String, dims: Seq[String],
                           k: Int = 64): DataFrame = {
    val sk = org.apache.spark.sql.functions.udaf(new graft.functions.Udafs.KmvMins(k))
    val exploded = spark.read.parquet(mvPath)
      .select(dims.map(col) :+ explode(col("mins")).as("__h"): _*)
    Sketches.kmvEstimate(
      exploded.cube(dims.map(col): _*).agg(sk(col("__h")).as("mins")), k)
  }

  /** CDC-style snapshot diff: classify every key of two table versions as
    * `added` (new only), `removed` (old only), `changed` (both, any
    * compare column null-safe-differs), or `unchanged`. `compareCols`
    * defaults to every shared non-key column. Emits (keys..., status) —
    * feed the non-unchanged keys to an incremental rebuild, or aggregate
    * for a drift report.
    *
    * Scale shape: one full outer shuffle join on the key (bucket both
    * snapshots on it to make the join shuffle-free); the comparison is a
    * narrow codegen'd null-safe conjunction, no hashing of payload
    * columns needed.
    */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, keyCols: Seq[String],
                   compareCols: Seq[String] = Nil): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    val cmp =
      if (compareCols.nonEmpty) compareCols
      else oldDf.columns.toSeq.intersect(newDf.columns.toSeq).diff(keyCols)
    val o = oldDf.select((keyCols ++ cmp).map(col): _*)
      .withColumn("__in_old", lit(true))
      .toDF(keyCols ++ cmp.map("__o_" + _) :+ "__in_old": _*)
    val n = newDf.select((keyCols ++ cmp).map(col): _*)
      .withColumn("__in_new", lit(true))
      .toDF(keyCols ++ cmp.map("__n_" + _) :+ "__in_new": _*)
    val joined = o.join(n, keyCols, "full_outer")
    val differs = cmp.map(c => !(col(s"__o_$c") <=> col(s"__n_$c")))
      .reduceOption(_ || _).getOrElse(lit(false))
    joined.withColumn("status",
      when(col("__in_old").isNull, "added")
        .when(col("__in_new").isNull, "removed")
        .when(differs, "changed")
        .otherwise("unchanged"))
      .select(keyCols.map(col) :+ col("status"): _*)
  }

  /** Copy-on-write upsert (MERGE) into a hive-partitioned parquet table:
    * last-writer-wins by key, rewriting ONLY the partitions the updates
    * touch. The shape a date-partitioned 100 TB fact needs — cost is
    * proportional to touched partitions, not table size:
    *
    *  1. the updates' distinct partition values collect to the driver
    *     (metadata-sized — partitions, not rows);
    *  2. the target is read WITH a partition filter on those values, so
    *     the scan prunes to touched partitions (PartitionFilters at the
    *     file index, untouched data never reads);
    *  3. kept = target-in-touched-partitions anti-join updates on the key,
    *     unioned with the updates (insert + replace in one pass);
    *  4. written back under DYNAMIC partition-overwrite, which replaces
    *     exactly the partitions present in the result.
    *
    * Keys must be PARTITION-STABLE (a key's partition value never changes
    * across versions — true of any date-keyed fact): a key that moved
    * partitions would leave its old row in an untouched partition. With
    * `verifyStability = true` the operator pays one extra scan of the
    * UNTOUCHED partitions (bloom-pruned semi-join on the update keys) and
    * fails loudly if any update key lives there; off by default because the
    * whole point is not scanning the rest of the table.
    *
    * CDC semantics: with `seqCol` set, duplicate-keyed update rows resolve
    * to the greatest seq per key (max-of-struct, one partial-aggregating
    * shuffle of the DELTA); without it, duplicate keys in `updates` are
    * ambiguous and the merge fails loudly rather than landing duplicate
    * keys in the table. With `opCol` set, rows whose op equals `deleteOp`
    * DELETE their key (anti-join removes it, nothing re-inserts it) —
    * I/U/D feeds in one pass, ordering within the batch decided by
    * `seqCol`. A partition whose rows are ALL deleted is dropped
    * explicitly (dynamic overwrite only replaces partitions present in
    * the output, so an emptied partition would otherwise linger).
    *
    * Concurrency: the staging directory is uniquely suffixed per call and
    * removed in a finally, but two concurrent upserts into one target
    * still race at the dynamic-overwrite commit — serialize merges per
    * target (the streaming path does, via foreachBatch).
    */
  def upsert(spark: SparkSession, targetPath: String, updates: DataFrame,
             keyCols: Seq[String], partitionCol: String,
             verifyStability: Boolean = false,
             opCol: Option[String] = None, seqCol: Option[String] = None,
             deleteOp: String = "D"): Unit = {
    require(keyCols.nonEmpty, "need at least one key column")
    require(!keyCols.contains(partitionCol),
      "partition column cannot be a key column")
    // the dedup result feeds several actions (touched collect, optional
    // stability probe, the staging write) — cache OUR derived frame so the
    // max-of-struct shuffle runs once per call, never the caller's input
    val (latest, ownCache) = seqCol match {
      case Some(sc) =>
        val dataCols = updates.columns.toSeq
        val ordered = sc +: dataCols.filterNot(_ == sc)
        val l = updates.groupBy(keyCols.map(col): _*)
          .agg(max(struct(ordered.map(col): _*)).as("__m"))
          .select(dataCols.map(c => col(s"__m.$c")): _*)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        (l, true)
      case None =>
        val dup = updates.groupBy(keyCols.map(col): _*)
          .count().filter(col("count") > 1).limit(1).count()
        require(dup == 0L,
          "upsert: duplicate keys in updates with no seqCol to pick a " +
            "winner — pass seqCol (last-writer-wins by it) or dedupe first")
        (updates, false)
    }
    try {
    val touched = latest.select(col(partitionCol)).distinct()
      .collect().map(_.get(0)).toSeq
    if (touched.isEmpty) return // empty delta: nothing to merge, nothing to stage
    // membership must be NULL-SAFE: a delta that touches the null partition
    // (Spark's __HIVE_DEFAULT_PARTITION__) never matches isin() under SQL
    // null semantics, which would silently drop the null partition's kept
    // rows on overwrite. Keep isin (one InSet lookup, not an O(partitions)
    // Or-chain) for the non-null values and add an isNull disjunct only
    // when the delta touches the null partition; coalesce makes the
    // predicate two-valued so its negation is usable directly
    val inTouched: Column => Column = {
      val nonNull = touched.filter(_ != null)
      val hasNull = touched.size != nonNull.size
      c => {
        val in = if (nonNull.isEmpty) lit(false) else coalesce(c.isin(nonNull: _*), lit(false))
        if (hasNull) in || c.isNull else in
      }
    }
    val target = spark.read.parquet(targetPath)
    if (verifyStability) {
      val stale = target
        .filter(!inTouched(col(partitionCol)))
        .join(broadcast(latest.select(keyCols.map(col): _*).distinct()),
          keyCols, "left_semi")
        .limit(1).count()
      require(stale == 0L,
        s"upsert: an update key exists in an untouched $partitionCol " +
          "partition — keys must be partition-stable (or include the old " +
          "partition's rows in the updates)")
    }
    val kept = target
      .filter(inTouched(col(partitionCol)))
      .join(latest.select(keyCols.map(col): _*).distinct(), keyCols, "left_anti")
    val inserts = opCol match {
      case Some(oc) => latest.filter(col(oc).isNull || col(oc) =!= lit(deleteOp))
      case None => latest
    }
    val merged = kept.unionByName(inserts.select(target.columns.map(col): _*))
    // the merge reads the same files the overwrite replaces, so stage the
    // touched-partition result once (sized by the delta's partitions, not
    // the table) and commit it back under dynamic partition overwrite
    val staging = targetPath.stripSuffix("/") +
      s"_upsert_staging_${java.util.UUID.randomUUID().toString.take(8)}"
    val hconf = spark.sparkContext.hadoopConfiguration
    try {
      merged.write.mode("overwrite").parquet(staging)
      // a delta that deletes EVERY remaining row of the touched partitions
      // stages zero data files — spark.read.parquet would fail schema
      // inference, and there is nothing to overwrite anyway: just drop
      // the emptied partition directories
      val sfs = new Path(staging).getFileSystem(hconf)
      val stagedFiles = sfs.globStatus(new Path(staging, "*.parquet"))
      val remaining: Set[Any] =
        if (stagedFiles == null || stagedFiles.isEmpty) Set.empty
        else {
          val staged = spark.read.parquet(staging)
          staged.write
            .mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(partitionCol)
            .parquet(targetPath)
          if (opCol.isDefined)
            staged.select(col(partitionCol)).distinct()
              .collect().map(_.get(0)).toSet
          else touched.toSet
        }
      if (opCol.isDefined) {
        // partitions fully emptied by deletes never appear in the staged
        // output, so dynamic overwrite leaves their directories — drop them
        val tfs = new Path(targetPath).getFileSystem(hconf)
        touched.filterNot(remaining.contains).foreach { v =>
          // escape exactly as Spark's hive-partition writer does; a null
          // (or empty) value must pass through as-is so
          // getPartitionPathString substitutes __HIVE_DEFAULT_PARTITION__
          // — String.valueOf(null) would build a bogus "part=null" leaf
          // and leave the real null partition (and its deleted rows) alive
          val leaf = org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
            .getPartitionPathString(partitionCol,
              if (v == null) null else String.valueOf(v))
          val dir = new Path(targetPath.stripSuffix("/") + "/" + leaf)
          if (tfs.exists(dir)) tfs.delete(dir, true)
        }
      }
    } finally {
      val sp = new Path(staging)
      sp.getFileSystem(hconf).delete(sp, true)
    }
    } finally if (ownCache) latest.unpersist()
  }

  /** Streaming CDC apply: each micro-batch of change rows MERGEs into the
    * partitioned target via [[upsert]]. In-batch conflicts resolve to the
    * row with the greatest `seqCol` (a CDC LSN / source timestamp) per key
    * via one partial-aggregating max-of-struct — no window over the batch.
    * Batch replays are idempotent through the same durable last-batch
    * marker [[streamRefresh]] uses (a retried foreachBatch re-merge is a
    * no-op), and the first batch creates the target. Cost per trigger is
    * [[upsert]]'s: proportional to the partitions the delta touches.
    */
  def upsertStream(stream: DataFrame, targetPath: String, keyCols: Seq[String],
                   partitionCol: String, seqCol: String,
                   checkpoint: String,
                   opCol: Option[String] = None,
                   deleteOp: String = "D"): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        exactlyOnceBatch(batch, batchId, targetPath, checkpoint) { spark =>
          if (!hasTableData(spark, targetPath)) {
            val dataCols = batch.columns.toSeq
            val ordered = seqCol +: dataCols.filterNot(_ == seqCol)
            val latest = batch
              .groupBy(keyCols.map(col): _*)
              .agg(max(struct(ordered.map(col): _*)).as("__m"))
              .select(dataCols.map(c => col(s"__m.$c")): _*)
            // first DATA-BEARING batch creates the table (the batch
            // marker alone doesn't count — an all-delete first batch or
            // a fully-deleted table must not look like a readable one):
            // an op column never lands in the target, and a key whose
            // latest op is a delete is a no-op
            val creates = opCol match {
              case Some(oc) =>
                latest.filter(col(oc).isNull || col(oc) =!= lit(deleteOp))
                  .drop(oc)
              case None => latest
            }
            // an ALL-DELETE batch must not create an empty parquet dir —
            // schema inference over it would brick every later batch.
            // append mode: the dir may already exist holding only the
            // batch marker (data-less), which ErrorIfExists would trip on
            if (!creates.isEmpty)
              creates.write.mode("append").partitionBy(partitionCol).parquet(targetPath)
          } else
            // pass the RAW batch: upsert runs the max-of-struct dedup itself
            // (seqCol set), so pre-deduplicating here would shuffle twice
            upsert(spark, targetPath, batch.toDF(), keyCols, partitionCol,
              opCol = opCol, seqCol = Some(seqCol), deleteOp = deleteOp)
        }
      }
      .start()
}
