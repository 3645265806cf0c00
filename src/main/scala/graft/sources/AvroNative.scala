package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.avro.{Schema, SchemaBuilder}
import org.apache.avro.file.{DataFileStream, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Native Avro read/write built directly on the avro-core library that
  * ships with Spark (`/opt/spark/jars/avro-*.jar`) — no external
  * `spark-avro` datasource module needed. Reference analog:
  * io/avro/AvroStorage.java:32 (the reference's primary columnar input).
  *
  * Read path: `binaryFiles` (one partition per file, any Hadoop
  * filesystem) → `DataFileStream` of GenericRecords → Rows under the
  * converted schema. Write path: one Avro container file per partition via
  * `DataFileWriter`. Supported types both ways: boolean/int/long/float/
  * double/string/bytes, nullable unions, nested records, arrays, and
  * string-keyed maps — the practical Cubert schema surface; enum and fixed
  * read as string/binary. Files split per-file (Avro container blocks are
  * not sub-split here); write many files for parallelism, as the reference
  * did.
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
      case ArrayType(et, _) => Schema.createArray(field(et, nm + "_item"))
      case MapType(StringType, vt, _) => Schema.createMap(field(vt, nm + "_value"))
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
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    val files = spark.sparkContext.binaryFiles(s"$path/*.avro")
    val firstSchemaJson = {
      val (_, pds) = files.first()
      val in = new DataFileStream[GenericRecord](pds.open(),
        new GenericDatumReader[GenericRecord]())
      try in.getSchema.toString finally in.close()
    }
    val sparkSchema = toSparkType(new Schema.Parser().parse(firstSchemaJson))
      .asInstanceOf[StructType]
    val rdd = files.flatMap { case (_, pds) =>
      val in = new DataFileStream[GenericRecord](pds.open(),
        new GenericDatumReader[GenericRecord]())
      new Iterator[Row] {
        def hasNext: Boolean = { val h = in.hasNext; if (!h) in.close(); h }
        def next(): Row = {
          val rec = in.next()
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
    val conf = new org.apache.hadoop.conf.Configuration(
      df.sparkSession.sparkContext.hadoopConfiguration)
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    if (fs.exists(p)) {
      if (mode == "overwrite") fs.delete(p, true)
      else if (mode == "errorifexists") throw new IllegalStateException(s"$path exists")
    }
    fs.mkdirs(p)
    val schemaJson = toAvroSchema(df.schema).toString
    val structSchema = df.schema
    // job-unique filename token so append mode never collides with the
    // part files of an earlier write (same convention as Spark's writers)
    val job = java.util.UUID.randomUUID().toString.take(8)
    df.rdd.mapPartitionsWithIndex { (i, it) =>
      // executor-side: default Configuration resolves the same FS for
      // file:// and cluster-default HDFS; one container file per task
      val schema = new Schema.Parser().parse(schemaJson)
      val outFs = new org.apache.hadoop.fs.Path(path)
        .getFileSystem(new org.apache.hadoop.conf.Configuration())
      val out = outFs.create(
        new org.apache.hadoop.fs.Path(path, f"part-$job-$i%05d.avro"), true)
      val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
      w.create(schema, out)
      it.foreach { row =>
        val rec = new GenericData.Record(schema)
        schema.getFields.asScala.zipWithIndex.foreach { case (f, j) =>
          rec.put(f.name(), toAvro(row.get(structSchema.fieldIndex(f.name())), f.schema())) }
        w.append(rec)
      }
      w.close()
      Iterator.empty[Int].iterator
    }.count() // force the write job
  }
}
