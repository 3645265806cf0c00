package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Storage-layout management for parquet data at rest — the write-side twin
  * of [[graft.operators.Blockgen]]. Blockgen is the reference's hash-bucket
  * layout (BLOCKGEN, block/storage §2.6); these are the two layout concerns
  * the reference left to its Hadoop admins that a 100 TB Spark lake cannot:
  *
  *  - '''compact''': the small-files problem. Ingest and fine-grained
  *    partition overwrites leave thousands of KB-scale files; every
  *    downstream scan then pays per-file open/footer/seek cost and the
  *    driver pays listing + task-scheduling overhead. Rewrite to a target
  *    file size.
  *  - '''zorderWrite''': multi-dimensional clustering. Parquet row-group
  *    pruning works off per-file min/max ranges; a z-order (Morton) sort
  *    makes ranges narrow in EVERY clustered dimension at once, so
  *    selective filters on any of them skip most files — range-partition
  *    by one key only helps that key.
  *
  * Both are plain shuffles + writes: at cluster scale the cost is one pass
  * over the data, and both are idempotent overwrite jobs safe to re-run.
  */
object Layout {

  /** Bits of z-value resolution per clustered column. 16 bits × up to 4
    * columns fills a 64-bit z-value; finer resolution than the file count
    * can express is wasted anyway.
    */
  val BitsPerDim = 16

  /** Morton z-value of `cols`, each scaled to [0, 2^16) over its observed
    * [min, max] (one stats pass, broadcast as literals). Pure bit-shift
    * expression tree — codegen'd, no UDF. Nulls sort first (scaled to 0).
    */
  def zValue(cols: Seq[Column], mins: Seq[Double], maxs: Seq[Double]): Column = {
    require(cols.nonEmpty && cols.length <= 4, "z-order supports 1..4 columns")
    val d = cols.length
    // stay off bit 63: at 4 columns a full 16 bits would land the 4th
    // column's top bit on the SIGN bit, making upper-half values sort
    // negative and inverting Morton order for that dimension — 15 bits at
    // d=4 keeps every interleaved position <= 59
    val bits = math.min(BitsPerDim, 63 / d)
    val top = (1L << bits) - 1
    val scaled = cols.zipWithIndex.map { case (c, j) =>
      val (lo, hi) = (mins(j), maxs(j))
      val s =
        if (hi <= lo) lit(0L)
        else least(lit(top), greatest(lit(0L),
          floor((c.cast("double") - lit(lo)) / lit(hi - lo) * lit(top.toDouble)).cast("long")))
      coalesce(s, lit(0L))
    }
    // bit i of column j lands at position i*d + j: columns interleave
    // round-robin from the low bit, so every dimension shares the high bits
    val terms = for { j <- 0 until d; i <- 0 until bits } yield
      shiftleft(shiftright(scaled(j), i).bitwiseAND(lit(1L)), i * d + j)
    terms.reduce(_ bitwiseOR _)
  }

  /** Rewrite `df` into `numFiles` z-order-clustered parquet files at
    * `path`: one stats pass for per-column [min, max], then range-partition
    * and sort by the interleaved z-value. Filters on ANY of `zCols` then
    * prune most files via parquet min/max. Numeric/date/timestamp columns
    * only (they cast to double for scaling).
    */
  def zorderWrite(df: DataFrame, path: String, zCols: Seq[String],
                  numFiles: Int): Unit = {
    // temporal types don't cast to double directly — normalize to epoch
    // numerics first (NTZ via the session-tz cast, micros precision)
    import org.apache.spark.sql.types.{DateType, TimestampNTZType, TimestampType}
    def scalable(name: String): Column = df.schema(name).dataType match {
      case TimestampNTZType => unix_micros(col(name).cast("timestamp")).cast("double")
      case TimestampType    => unix_micros(col(name)).cast("double")
      case DateType         => call_function("unix_date", col(name)).cast("double")
      case _                => col(name).cast("double")
    }
    val zs = zCols.map(scalable)
    val stats = df.select(
      zs.flatMap(c => Seq(min(c).cast("double"), max(c).cast("double"))): _*)
      .collect().head
    val mins = zCols.indices.map(i => Option(stats.get(2 * i)).fold(0.0)(_ => stats.getDouble(2 * i)))
    val maxs = zCols.indices.map(i => Option(stats.get(2 * i + 1)).fold(0.0)(_ => stats.getDouble(2 * i + 1)))
    df.withColumn("__z", zValue(zs, mins, maxs))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** Parquet write with per-column BLOOM FILTERS — the row-group-skipping
    * complement to z-order's min/max pruning: min/max stats prune RANGE
    * predicates, blooms prune POINT lookups on high-cardinality keys
    * (user_id = X over 100 TB touches only row groups whose bloom says
    * maybe). `ndv` sizes each filter (expected distinct values per row
    * group); the bits live in the files, so every parquet reader — Spark,
    * DuckDB, Trino — skips with them, no side index to maintain.
    */
  def storeWithBloom(df: DataFrame, path: String, bloomCols: Seq[String],
                     ndv: Long = 100000L, mode: String = "overwrite"): Unit = {
    require(bloomCols.nonEmpty, "need at least one bloom column")
    bloomCols.foldLeft(df.write.mode(mode)) { (w, c) =>
      w.option(s"parquet.bloom.filter.enabled#$c", "true")
        .option(s"parquet.bloom.filter.expected.ndv#$c", ndv.toString)
    }.parquet(path)
  }

  /** Rewrite the parquet data at `inPath` into files of ~`targetFileBytes`
    * at `outPath`. Merging small files is a narrow `coalesce` (no shuffle —
    * tasks concatenate input splits); splitting oversized files needs the
    * full `repartition` shuffle. Returns the file count written.
    */
  def compact(spark: SparkSession, inPath: String, outPath: String,
              targetFileBytes: Long = 128L * 1024 * 1024): Int = {
    require(targetFileBytes > 0, "targetFileBytes must be positive")
    val p = new Path(inPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val entries = fs.listStatus(p).filterNot(_.getPath.getName.startsWith("_"))
    val (dirs, files) = entries.partition(_.isDirectory)
    // a hive-partitioned table must be compacted per partition directory —
    // a whole-table rewrite would silently collapse the partition layout
    require(dirs.isEmpty, s"$inPath contains partition directories " +
      s"(${dirs.take(3).map(_.getPath.getName).mkString(", ")}…); " +
      "compact each partition directory instead")
    val totalBytes = files.map(_.getLen).sum
    val n = math.max(1, math.ceil(totalBytes.toDouble / targetFileBytes).toInt)
    val df = spark.read.parquet(inPath)
    val out = if (n < files.length) df.coalesce(n) else df.repartition(n)
    out.write.mode("overwrite").parquet(outPath)
    n
  }
}
