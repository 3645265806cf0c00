package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{broadcast, coalesce, col, concat_ws, lit}

import graft.functions.SchemaCodec

/** Sources & sinks — LOAD / STORE / LOAD-CACHED (reference:
  * io/StorageFactory.java:26-32; TEXT io/text/TextStorage.java:34, AVRO
  * io/avro/AvroStorage.java:32, RUBIX io/rubix/RubixStorage.java:33).
  *
  * Format mapping (SURVEY.md §2.1): RUBIX → Parquet (columnar,
  * dictionary-encoded, self-describing — everything Rubix's COMPACT
  * serialization and metadata trailer provided); TEXT → csv with an explicit
  * Cubert schema string; AVRO → the NATIVE avro-core reader/writer
  * ([[AvroNative]] — no spark-avro module needed; always used for the
  * `avro` format, sync-range split and parallel both ways). Schema
  * strings use the reference's "INT a, STRING b" form
  * (block/BlockSchema.java:58-78) via SchemaCodec.
  */
object Sources {

  /** LOAD 'path' USING fmt['schema'] — schema mandatory for text formats,
    * inferred from file metadata for parquet/orc/avro (the reference
    * likewise inferred only from Avro/Rubix metadata).
    */
  def load(spark: SparkSession, path: String, format: String,
           schema: Option[String] = None): DataFrame = {
    val reader = spark.read
    val withSchema = schema.map(s => reader.schema(SchemaCodec.parse(s))).getOrElse(reader)
    format.toLowerCase match {
      case "parquet" => withSchema.parquet(path)
      case "rubix" =>
        // a real legacy `.rubix` dataset decodes natively ([[Rubix.read]]);
        // otherwise RUBIX is this engine's alias for its parquet successor
        if (Rubix.isRubixData(spark, path)) Rubix.read(spark, path)
        else withSchema.parquet(path)
      case "orc"               => withSchema.orc(path)
      case "avro"              => AvroNative.read(spark, path)
      case "json"              => withSchema.json(path)
      case "csv"               => withSchema.option("header", "true").csv(path)
      case "text" =>
        // TEXT with a declared schema is tab-separated per the reference's
        // TextTupleCreator; single-column schema reads raw lines
        schema match {
          case Some(s) if SchemaCodec.parse(s).length > 1 =>
            withSchema.option("sep", "\t").csv(path)
          case _ => withSchema.text(path)
        }
      case other => throw new IllegalArgumentException(s"unknown format: $other")
    }
  }

  /** STORE x INTO 'path' USING fmt (reference: plan/physical/JobExecutor.java:470-487).
    * `partitionBy` writes hive-style `col=value` directories — the layout
    * that turns date/category filters into partition pruning (the scan
    * lists only matching directories; at 100 TB the difference between
    * reading a day and reading the table). The reference's time-partitioned
    * facts did this by path convention; Spark makes it first-class.
    */
  def store(df: DataFrame, path: String, format: String,
            mode: String = "overwrite", partitionBy: Seq[String] = Nil): Unit = {
    def w = if (partitionBy.nonEmpty) df.write.mode(mode).partitionBy(partitionBy: _*)
            else df.write.mode(mode)
    format.toLowerCase match {
    case "parquet" | "rubix" => w.parquet(path)
    case "orc"               => w.orc(path)
    case "avro"              => AvroNative.write(df, path, mode)
    case "json"              => w.json(path)
    case "csv"               => w.option("header", "true").csv(path)
    case "text" =>
      // multi-column TEXT is tab-separated, matching the reference's
      // TextStorage writer (io/text/TextTeeWriter.java:42). NULLs become
      // empty fields — concat_ws alone would SKIP them and misalign rows
      val out =
        if (df.columns.length > 1)
          df.select(concat_ws("\t",
            df.columns.map(c => coalesce(col(c).cast("string"), lit(""))): _*))
        else df.select(col(df.columns.head).cast("string"))
      out.write.mode(mode).text(path)
    case other => throw new IllegalArgumentException(s"unknown format: $other")
  } }

  /** Corrupt-tolerant text-format ingest: parse `path` as json/csv with the
    * declared schema in PERMISSIVE mode and split the result into (clean
    * rows, quarantined raw records). At 100 TB a single malformed line must
    * neither kill the job (FAILFAST) nor silently vanish (DROPMALFORMED) —
    * the quarantine side keeps the raw text for replay after a parser fix.
    * Both sides come off ONE narrow scan; no shuffle.
    */
  def loadRobust(spark: SparkSession, path: String, format: String,
                 schema: String): (DataFrame, DataFrame) = {
    val corrupt = "_corrupt_record"
    val fields = SchemaCodec.parse(schema)
      .add(corrupt, org.apache.spark.sql.types.StringType)
    val reader = spark.read.schema(fields)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corrupt)
    val df = (format.toLowerCase match {
      case "json" => reader.json(path)
      case "csv"  => reader.option("header", "false").csv(path)
      case other  => throw new IllegalArgumentException(
        s"loadRobust supports json/csv, got $other")
    // Spark disallows queries whose only referenced column is the internal
    // corrupt-record column unless the parsed relation is materialized
    // (SPARK-21610); MEMORY_AND_DISK bounds the footprint by spilling. The
    // persisted parse backs BOTH returned frames — release it with
    // df.unpersist()/clearCache() once the split is consumed
    }).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val clean = df.filter(col(corrupt).isNull).drop(corrupt)
    val quarantined = df.filter(col(corrupt).isNotNull).select(col(corrupt).as("raw_record"))
    (clean, quarantined)
  }

  /** LOAD-CACHED — read a small file and mark it broadcast; the reference
    * shipped such files via the Hadoop distributed cache
    * (operator/LoadBlockFromCacheOperator.java:31, utils/FileCache.java:35) —
    * a broadcast relation is Spark's distributed cache.
    */
  def loadCached(spark: SparkSession, path: String, format: String,
                 schema: Option[String] = None): DataFrame =
    broadcast(load(spark, path, format, schema))

  /** VIRTUAL input — generator relation not backed by files (reference:
    * io/virtual/VirtualStorage.java:43), used by dictionary jobs etc.
    */
  def virtual(spark: SparkSession, rows: Long, indexCol: String = "index"): DataFrame =
    spark.range(rows).toDF(indexCol)
}
