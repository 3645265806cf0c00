package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.avro.{Schema, SchemaBuilder}
import org.apache.avro.file.{DataFileReader, DataFileStream, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.mapred.FsInput
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Native Avro read/write built directly on the avro-core library that
  * ships with Spark (`/opt/spark/jars/avro-*.jar`) — no external
  * `spark-avro` datasource module needed. Reference analog:
  * io/avro/AvroStorage.java:32 (the reference's primary columnar input).
  *
  * Read path: each file is planned as one task per byte range of
  * `maxSplitBytes` (default: the session's `files.maxPartitionBytes`);
  * a task seeks to the first Avro sync marker at-or-after its range start
  * (`DataFileReader.sync`) and stops at the first sync past its range end
  * (`pastSync`) — the same container-block splitting the reference got from
  * Hadoop's AvroInputFormat, so a 10 GB file fans out across the cluster
  * instead of becoming one task. Readers are closed via a task-completion
  * listener, so limit/take/early-abort never leaks a stream.
  *
  * Write path: one Avro container file per partition via `DataFileWriter`,
  * written to a task-attempt temp name under `_temporary/` and renamed into
  * place on task commit — speculative attempts of the same partition write
  * distinct temp files and only one rename wins, so concurrent attempts can
  * never interleave bytes in the final container file; a mid-job failure
  * leaves only `_temporary/` garbage, which the driver removes.
  *
  * Supported types both ways: boolean/int/long/float/
  * double/string/bytes, nullable unions, nested records, arrays, and
  * string-keyed maps — the practical Cubert schema surface; enum and fixed
  * read as string/binary.
  */
object AvroNative {

  // ---- schema conversion ----------------------------------------------------

  def toSparkType(s: Schema): DataType = s.getType match {
    case Schema.Type.BOOLEAN => BooleanType
    case Schema.Type.INT     => IntegerType
    case Schema.Type.LONG    => LongType
    case Schema.Type.FLOAT   => FloatType
    case Schema.Type.DOUBLE  => DoubleType
    case Schema.Type.STRING  => StringType
    case Schema.Type.ENUM    => StringType
    case Schema.Type.BYTES   => BinaryType
    case Schema.Type.FIXED   => BinaryType
    case Schema.Type.ARRAY   => ArrayType(toSparkType(s.getElementType))
    case Schema.Type.MAP     => MapType(StringType, toSparkType(s.getValueType))
    case Schema.Type.RECORD =>
      StructType(s.getFields.asScala.toSeq.map(f =>
        StructField(f.name(), toSparkType(f.schema()), nullable = isNullable(f.schema()))))
    case Schema.Type.UNION =>
      val nonNull = s.getTypes.asScala.filter(_.getType != Schema.Type.NULL)
      require(nonNull.size == 1, s"only [null, T] unions supported: $s")
      toSparkType(nonNull.head)
    case other => throw new IllegalArgumentException(s"unsupported avro type: $other")
  }

  private def isNullable(s: Schema): Boolean =
    s.getType == Schema.Type.UNION && s.getTypes.asScala.exists(_.getType == Schema.Type.NULL)

  def toAvroSchema(st: StructType, name: String = "record"): Schema = {
    def field(dt: DataType, nm: String): Schema = dt match {
      case BooleanType => Schema.create(Schema.Type.BOOLEAN)
      case IntegerType | ShortType | ByteType => Schema.create(Schema.Type.INT)
      case LongType    => Schema.create(Schema.Type.LONG)
      case FloatType   => Schema.create(Schema.Type.FLOAT)
      case DoubleType  => Schema.create(Schema.Type.DOUBLE)
      case StringType  => Schema.create(Schema.Type.STRING)
      case BinaryType  => Schema.create(Schema.Type.BYTES)
      case ArrayType(et, containsNull) =>
        val es = field(et, nm + "_item")
        // a null element needs a [null, T] element union or append() NPEs
        Schema.createArray(
          if (containsNull) Schema.createUnion(Schema.create(Schema.Type.NULL), es)
          else es)
      case MapType(StringType, vt, valueContainsNull) =>
        val vs = field(vt, nm + "_value")
        Schema.createMap(
          if (valueContainsNull) Schema.createUnion(Schema.create(Schema.Type.NULL), vs)
          else vs)
      case st: StructType => toAvroSchema(st, nm)
      case other => throw new IllegalArgumentException(s"unsupported spark type for avro: $other")
    }
    val b = SchemaBuilder.record(name).fields()
    st.fields.foldLeft(b) { (fb, f) =>
      val base = field(f.dataType, f.name)
      if (f.nullable)
        fb.name(f.name)
          .`type`(Schema.createUnion(Schema.create(Schema.Type.NULL), base))
          .withDefault(null)
      else fb.name(f.name).`type`(base).noDefault()
    }.endRecord()
  }

  // ---- value conversion -----------------------------------------------------

  private def fromAvro(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (u: org.apache.avro.util.Utf8, StringType) => u.toString
    case (s: CharSequence, StringType) => s.toString
    case (e: GenericData.EnumSymbol, StringType) => e.toString
    case (b: java.nio.ByteBuffer, BinaryType) =>
      val out = new Array[Byte](b.remaining()); b.duplicate().get(out); out
    case (f: GenericData.Fixed, BinaryType) => f.bytes().clone()
    case (r: GenericRecord, st: StructType) =>
      Row.fromSeq(st.fields.toSeq.map(f => fromAvro(r.get(f.name), f.dataType)))
    case (l: java.util.Collection[_], ArrayType(et, _)) =>
      l.asScala.toSeq.map(fromAvro(_, et))
    case (m: java.util.Map[_, _], MapType(_, vt, _)) =>
      m.asScala.map { case (k, x) => k.toString -> fromAvro(x, vt) }.toMap
    case (x, _) => x
  }

  private def toAvro(v: Any, s: Schema): Any = {
    val target = if (isNullable(s))
      s.getTypes.asScala.find(_.getType != Schema.Type.NULL).get else s
    (v, target.getType) match {
      case (null, _) => null
      case (r: Row, Schema.Type.RECORD) =>
        val rec = new GenericData.Record(target)
        target.getFields.asScala.zipWithIndex.foreach { case (f, i) =>
          rec.put(f.name(), toAvro(r.get(i), f.schema())) }
        rec
      case (seq: scala.collection.Seq[_], Schema.Type.ARRAY) =>
        seq.map(toAvro(_, target.getElementType)).toSeq.asJava
      case (m: scala.collection.Map[_, _], Schema.Type.MAP) =>
        m.map { case (k, x) => k.toString -> toAvro(x, target.getValueType) }.asJava
      case (b: Array[Byte], Schema.Type.BYTES) => java.nio.ByteBuffer.wrap(b)
      case (x, _) => x
    }
  }

  // ---- read -----------------------------------------------------------------

  /** Read a directory (or glob) of Avro container files. Schema comes from
    * the first file; every file must share it (the reference's contract).
    *
    * @param maxSplitBytes target bytes per task; <=0 uses the session's
    *                      `spark.sql.files.maxPartitionBytes`. Each
    *                      (file, range) pair becomes one task; ranges are
    *                      resolved to container blocks via sync markers, so
    *                      every record is read exactly once.
    * @param columns       optional top-level projection, applied at DECODE
    *                      time through Avro schema resolution (skipped
    *                      fields are skim-decoded, not materialized) — the
    *                      required-field pushdown the reference's
    *                      AvroStorage honored from Pig.
    */
  def read(spark: SparkSession, path: String, maxSplitBytes: Long = -1L,
           columns: Seq[String] = Nil): DataFrame = {
    val hconf = spark.sparkContext.hadoopConfiguration
    val dir = new org.apache.hadoop.fs.Path(path)
    val fs = dir.getFileSystem(hconf)
    // accept a single file, a directory (its *.avro children), or a glob
    // (matching files directly; matched dirs expand to their *.avro)
    def avroIn(d: org.apache.hadoop.fs.Path): Seq[org.apache.hadoop.fs.FileStatus] =
      Option(fs.globStatus(new org.apache.hadoop.fs.Path(d, "*.avro")))
        .map(_.toSeq.filter(_.isFile)).getOrElse(Seq.empty)
    val statuses: Seq[org.apache.hadoop.fs.FileStatus] =
      if (path.exists(c => "*?[{".contains(c)))
        Option(fs.globStatus(dir)).map(_.toSeq).getOrElse(Seq.empty)
          .flatMap(st => if (st.isFile) Seq(st) else avroIn(st.getPath))
      else if (fs.exists(dir) && fs.getFileStatus(dir).isFile)
        Seq(fs.getFileStatus(dir))
      else avroIn(dir)
    val files: Seq[(String, Long)] =
      statuses.map(s => (s.getPath.toString, s.getLen))
    require(files.nonEmpty, s"no .avro files under $path")
    val firstSchemaJson = {
      val in = new DataFileStream[GenericRecord](
        fs.open(new org.apache.hadoop.fs.Path(files.head._1)),
        new GenericDatumReader[GenericRecord]())
      try in.getSchema.toString finally in.close()
    }
    val writerSchema = new Schema.Parser().parse(firstSchemaJson)
    val readSchemaJson =
      if (columns.isEmpty) firstSchemaJson
      else {
        val byName = writerSchema.getFields.asScala.map(f => f.name -> f).toMap
        val missing = columns.filterNot(byName.contains)
        require(missing.isEmpty, s"avro projection: unknown columns $missing")
        // preserve writer field order so schema resolution stays a skim
        val kept = writerSchema.getFields.asScala
          .filter(f => columns.contains(f.name))
          .map(f => new Schema.Field(f.name, f.schema, f.doc, f.defaultVal()))
        val rec = Schema.createRecord(writerSchema.getName, writerSchema.getDoc,
          writerSchema.getNamespace, false)
        rec.setFields(kept.toList.asJava)
        rec.toString
      }
    val sparkSchema = toSparkType(new Schema.Parser().parse(readSchemaJson))
      .asInstanceOf[StructType]
    val splitBytes =
      if (maxSplitBytes > 0) maxSplitBytes
      else spark.sessionState.conf.filesMaxPartitionBytes
    // plan one task per (file, sync-range) — the cluster-scale fan-out the
    // reference inherited from AvroInputFormat's HDFS-block splits
    val splits: Seq[(String, Long, Long)] = files.flatMap { case (f, len) =>
      (0L until math.max(len, 1L) by splitBytes).map { start =>
        (f, start, math.min(start + splitBytes, len))
      }
    }
    // ship the DRIVER's hadoop conf to the read tasks so programmatic
    // spark.hadoop.* settings (credentials, custom FS) apply to reading
    // exactly as they did to the listing above
    val confBc = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(hconf))
    val rdd = spark.sparkContext
      .parallelize(splits, splits.size)
      .flatMap { case (file, start, end) =>
        val conf = confBc.value.value
        val in = new FsInput(new org.apache.hadoop.fs.Path(file), conf)
        // reader schema = the projection; Avro schema resolution skips
        // dropped fields at decode time
        val expected = new Schema.Parser().parse(readSchemaJson)
        val reader =
          try new DataFileReader[GenericRecord](in,
            new GenericDatumReader[GenericRecord](null, expected))
          catch { case e: Throwable => in.close(); throw e } // corrupt header
        // close on task completion, not iterator exhaustion — limit/take
        // abandon the iterator mid-stream
        Option(TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit](_ => reader.close()))
        reader.sync(start) // first block whose sync marker is >= start
        new Iterator[Row] {
          def hasNext: Boolean = reader.hasNext && !reader.pastSync(end)
          def next(): Row = {
            val rec = reader.next()
            Row.fromSeq(sparkSchema.fields.toSeq.map(f =>
              fromAvro(rec.get(f.name), f.dataType)))
          }
        }
      }
    spark.createDataFrame(rdd, sparkSchema)
  }

  /** Write one Avro container file per partition (part-NNNNN.avro) under
    * `path` — the many-files layout that keeps both this writer and the
    * reader trivially parallel.
    */
  def write(df: DataFrame, path: String, mode: String = "overwrite"): Unit = {
    require(Set("overwrite", "append", "error", "errorifexists", "ignore")
      .contains(mode), s"unknown save mode: $mode")
    val conf = new org.apache.hadoop.conf.Configuration(
      df.sparkSession.sparkContext.hadoopConfiguration)
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    if (fs.exists(p)) {
      if (mode == "overwrite") fs.delete(p, true)
      else if (mode == "error" || mode == "errorifexists")
        throw new IllegalStateException(s"$path exists")
      else if (mode == "ignore") return
    }
    fs.mkdirs(p)
    val schemaJson = toAvroSchema(df.schema).toString
    val structSchema = df.schema
    // job-unique filename token so append mode never collides with the
    // part files of an earlier write (same convention as Spark's writers)
    val job = java.util.UUID.randomUUID().toString.take(8)
    // ship the DRIVER's hadoop conf to the write tasks (same as the read
    // path) — a default executor Configuration would drop programmatic
    // spark.hadoop.* settings (credentials, fs.defaultFS) and could even
    // resolve a scheme-less path against a DIFFERENT filesystem than the
    // driver's mkdirs above
    val confBc = df.sparkSession.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(conf))
    try df.rdd.mapPartitionsWithIndex { (i, it) =>
      // Two-phase commit: write to an attempt-unique temp name, rename into
      // place once the container is sealed — speculative attempts never
      // touch the same path, and exactly one rename wins.
      val schema = new Schema.Parser().parse(schemaJson)
      val outFs = new org.apache.hadoop.fs.Path(path).getFileSystem(confBc.value.value)
      val attempt = Option(TaskContext.get()).map(_.taskAttemptId()).getOrElse(0L)
      val tmp = new org.apache.hadoop.fs.Path(
        path, f"_temporary/part-$job-$i%05d-a$attempt.avro")
      val dst = new org.apache.hadoop.fs.Path(path, f"part-$job-$i%05d.avro")
      val out = outFs.create(tmp, true)
      var sealedOk = false
      try {
        val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
        w.create(schema, out)
        it.foreach { row =>
          val rec = new GenericData.Record(schema)
          schema.getFields.asScala.zipWithIndex.foreach { case (f, j) =>
            rec.put(f.name(), toAvro(row.get(structSchema.fieldIndex(f.name())), f.schema())) }
          w.append(rec)
        }
        w.close()
        // a losing speculative twin finds dst taken; drop its temp file
        if (!outFs.rename(tmp, dst)) outFs.delete(tmp, false)
        sealedOk = true
      } finally if (!sealedOk) {
        // task abort: release the file lease and this attempt's temp file
        try out.close() catch { case _: Exception => () }
        try outFs.delete(tmp, false) catch { case _: Exception => () }
      }
      Iterator.empty[Int].iterator
    }.count() // force the write job
    catch {
      case t: Throwable =>
        // job abort: this job's token makes its committed part files
        // identifiable — remove them so a failed append/overwrite never
        // reads back as a complete dataset (pre-existing files survive)
        try {
          Option(fs.globStatus(new org.apache.hadoop.fs.Path(p, s"part-$job-*.avro")))
            .foreach(_.foreach(st => fs.delete(st.getPath, false)))
          fs.delete(new org.apache.hadoop.fs.Path(p, "_temporary"), true)
        } catch { case _: Exception => () }
        throw t
    }
    // job commit: clear attempt garbage (aborted/losing attempts)
    fs.delete(new org.apache.hadoop.fs.Path(p, "_temporary"), true)
  }
}
