package graft.sources

import java.io.{ByteArrayOutputStream, DataInput, DataInputStream, DataOutput, DataOutputStream, EOFException, InputStream, OutputStream}

import scala.collection.mutable.ArrayBuffer

import org.apache.hadoop.fs.Path
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** Native reader/writer for the reference engine's Rubix block-file format,
  * so a migrating user's existing blockgen'd datasets ingest directly —
  * no re-export through the legacy stack.
  *
  * File layout (reference: io/rubix/RubixRecordWriter.java:47-56 doc +
  * close() :199-222, RubixFile.java:228-269 trailer parse):
  *
  * {{{
  *   [Value Section: one serialized tuple per record, blocks contiguous]
  *   trailerStart:
  *     writeUTF(metadataJson)       // schema, partitionKeys, sortKeys, ...
  *     writeInt(keySectionSize)
  *     [Key Section: per block — key tuple, offset, blockId, numRecords]
  *   writeLong(trailerStart)        // last 8 bytes of the file
  * }}}
  *
  * Values and keys are Pig BinSedesTuples serialized with
  * `Tuple.write(DataOutput)` (io/DefaultTupleSerializer.java:40), i.e. the
  * Pig 0.13 BinInterSedes wire format — reimplemented here as [[PigSedes]]
  * from the published format (the reference pins pigVersion=0.13.0). The
  * alternative COMPACT block serialization (io/CompactSerializer.java,
  * io/VariableLengthEncoder.java) is implemented as [[Vle]].
  *
  * Scale shape: `describe` touches only trailers (metadata-sized, driver);
  * `read` plans ONE TASK PER BLOCK — the same unit the reference used as an
  * InputSplit (io/rubix/RubixInputSplit.java) — so a 100 TB rubix dataset
  * fans out to its natural block parallelism, each task streaming one byte
  * range. Nothing but trailer metadata ever collects to the driver.
  */
object Rubix {

  /** One data block: a contiguous byte range of `file` holding `numRecords`
    * serialized tuples, keyed by the block's partition-key values.
    */
  case class BlockInfo(file: String, key: Seq[Any], offset: Long, length: Long,
                       blockId: Long, numRecords: Long) {
    /** The writing reducer's id — the top 32 bits (RubixFile.java:89-92). */
    def reducerId: Int = (blockId >> 32).toInt
  }

  /** Parsed trailer of one `.rubix` file. */
  case class FileMeta(file: String, schema: StructType, partitionKeys: Seq[String],
                      sortKeys: Seq[String], serializationType: String,
                      blockgenId: Option[String], blocks: Seq[BlockInfo])

  private val Extension = ".rubix"

  /** True when `path` is a `.rubix` file or a directory holding `*.rubix*`
    * files (the reference's glob, RubixConstants.java:21).
    */
  def isRubixData(spark: SparkSession, path: String): Boolean = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) false
    else if (fs.getFileStatus(p).isFile) p.getName.contains(Extension)
    else fs.globStatus(new Path(p, "*" + Extension + "*")) match {
      case null => false
      case sts  => sts.nonEmpty
    }
  }

  private def listFiles(spark: SparkSession, path: String): Seq[Path] = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files =
      if (fs.getFileStatus(p).isFile) Seq(p)
      else fs.globStatus(new Path(p, "*" + Extension + "*")).toSeq
        .filter(_.isFile).map(_.getPath)
    require(files.nonEmpty, s"no $Extension files under $path")
    files.sortBy(_.getName)
  }

  // ---- trailer parse ------------------------------------------------------

  /** Parse every rubix file's trailer under `path` — metadata only, no data
    * bytes read (reference: RubixFile.getKeyData, RubixFile.java:228-305).
    */
  def describe(spark: SparkSession, path: String): Seq[FileMeta] = {
    val hconf = spark.sparkContext.hadoopConfiguration
    listFiles(spark, path).map { p =>
      val fs = p.getFileSystem(hconf)
      val fileLen = fs.getFileStatus(p).getLen
      val in = fs.open(p)
      try {
        in.seek(fileLen - 8)
        val trailerStart = in.readLong()
        in.seek(trailerStart)
        val din = new DataInputStream(in)
        val json = din.readUTF()
        val keySectionSize = din.readInt()
        val keySection = new Array[Byte](keySectionSize)
        din.readFully(keySection)

        val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
        val meta = mapper.readTree(json)
        val schema = cubertSchemaToSpark(meta.get("schema"))
        def strArray(field: String): Seq[String] = Option(meta.get(field)) match {
          case Some(n) if n.isArray =>
            (0 until n.size).map(i => n.get(i).asText())
          case Some(n) if !n.isNull => Seq(n.asText())
          case _ => Nil
        }
        val nBlocks = Option(meta.get("numberOfBlocks")).map(_.asInt).getOrElse(0)
        val serType = Option(meta.get("serializationType"))
          .map(_.asText()).getOrElse("DEFAULT")

        // key section entries: key tuple datum, offset, blockId, numRecords
        val bais = new java.io.ByteArrayInputStream(keySection)
        val kin = new DataInputStream(bais)
        val blocks = ArrayBuffer.empty[BlockInfo]
        var i = 0
        while (i < nBlocks) {
          val key = PigSedes.readDatum(kin) match {
            case r: Row => r.toSeq
            case other  => Seq(other) // non-tuple partition key
          }
          val offset = kin.readLong()
          val blockId = kin.readLong()
          val numRecords = kin.readLong()
          blocks += BlockInfo(p.toString, key, offset, 0L, blockId, numRecords)
          i += 1
        }
        // an UNDERSTATED numberOfBlocks would silently drop the trailing
        // blocks (an overstated one already fails loudly with EOF) — the
        // key section must be exactly consumed
        require(bais.available() == 0,
          s"rubix trailer inconsistent in $p: numberOfBlocks=$nBlocks left " +
            s"${bais.available()} unread bytes of the $keySectionSize-byte key section")
        // lengths: gap to the next block's offset; last block ends at trailer
        val sized = blocks.toSeq.zipWithIndex.map { case (b, j) =>
          val end = if (j + 1 < blocks.length) blocks(j + 1).offset else trailerStart
          b.copy(length = end - b.offset)
        }
        FileMeta(p.toString, schema, strArray("partitionKeys"), strArray("sortKeys"),
          serType, Option(meta.get("BlockgenId")).map(_.asText()), sized)
      } finally in.close()
    }
  }

  // ---- read ---------------------------------------------------------------

  /** Read a rubix file/directory as a DataFrame: one Spark task per block
    * (the reference's InputSplit unit), each streaming its byte range and
    * decoding `numRecords` tuples. Per-block compression (`.rubix.deflate`/
    * `.rubix.gz` extensions) is honored — each block is an independent
    * codec stream (RubixRecordWriter finishes/resets the codec at block
    * boundaries precisely so ranges stay independently readable).
    */
  def read(spark: SparkSession, path: String): DataFrame =
    read(spark, path, describe(spark, path))

  /** As [[read]], reusing already-parsed trailers (convert's single-parse path). */
  private def read(spark: SparkSession, path: String, metas: Seq[FileMeta]): DataFrame = {
    val schema = metas.head.schema
    require(metas.forall(_.schema == schema),
      s"rubix files under $path disagree on schema")
    val blocks = metas.flatMap(m => m.blocks.map(b => (b, m.serializationType)))
    val confBc = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(
        spark.sparkContext.hadoopConfiguration))
    val fieldTypes = schema.fields.map(_.dataType).toSeq
    val rdd = spark.sparkContext
      .parallelize(blocks, math.max(blocks.size, 1))
      .flatMap { case (b, serType) =>
        val p = new Path(b.file)
        val fs = p.getFileSystem(confBc.value.value)
        val fsin = fs.open(p)
        Option(TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit](_ => fsin.close()))
        fsin.seek(b.offset)
        val bounded = new BoundedInputStream(fsin, b.length)
        val raw: InputStream =
          if (b.file.endsWith(".deflate")) new java.util.zip.InflaterInputStream(bounded)
          else if (b.file.endsWith(".gz")) new java.util.zip.GZIPInputStream(bounded)
          else bounded
        // the codec stream owns a native Inflater that only close() (not
        // GC) releases promptly — mirror of the write side's Deflater fix
        if (raw ne bounded)
          Option(TaskContext.get()).foreach(
            _.addTaskCompletionListener[Unit](_ => raw.close()))
        serType match {
          case "COMPACT" =>
            (0L until b.numRecords).iterator.map { _ =>
              Row.fromSeq(fieldTypes.map(dt => Vle.decodeField(raw, dt)))
            }
          case _ =>
            val din = new DataInputStream(raw)
            (0L until b.numRecords).iterator.map { _ =>
              PigSedes.readDatum(din) match {
                case r: Row =>
                  if (r.length != fieldTypes.length)
                    throw new java.io.IOException(
                      s"rubix record arity ${r.length} != schema width " +
                        s"${fieldTypes.length} in ${b.file} @${b.offset} — " +
                        "trailer schema and block data disagree")
                  Row.fromSeq(fieldTypes.zip(r.toSeq).map {
                    case (dt, v) => PigSedes.toSpark(v, dt) })
                case other =>
                  throw new java.io.IOException(
                    s"rubix record is not a tuple: $other")
              }
            }
        }
      }
    spark.createDataFrame(rdd, schema)
  }

  // ---- write --------------------------------------------------------------

  /** Write `df` as a rubix dataset: one `part-rNNNNN.rubix` per Spark
    * partition, rows grouped into blocks by `partitionKeys` value and
    * sorted by `partitionKeys ++ sortKeys` — the reference's BLOCKGEN
    * contract. blockId = (taskId << 32) | blockIndex, matching the
    * reducerId-in-high-bits convention (RubixFile.java:89-92).
    *
    * `codec` = Some("deflate"|"gzip") compresses each BLOCK as an
    * independent stream (finished at block close, fresh for the next —
    * exactly the finish/resetState dance RubixRecordWriter.java:173-195
    * does so byte-range splits stay independently readable); the trailer
    * stays uncompressed and the filename gains the codec extension the
    * reference's CompressionCodecFactory keyed on.
    */
  def write(df: DataFrame, path: String, partitionKeys: Seq[String] = Nil,
            sortKeys: Seq[String] = Nil, serialization: String = "DEFAULT",
            codec: Option[String] = None): Unit = {
    require(serialization == "DEFAULT" || serialization == "COMPACT",
      s"serialization must be DEFAULT|COMPACT: $serialization")
    require(codec.forall(c => c == "deflate" || c == "gzip"),
      s"codec must be deflate|gzip: $codec")
    val schema = df.schema
    if (serialization == "COMPACT")
      require(schema.fields.forall(f => Vle.supports(f.dataType)),
        "COMPACT serialization needs a flat schema of " +
          "boolean/byte/int/long/float/double/string columns")
    val metaJson = metadataJson(schema, partitionKeys, sortKeys, serialization)
    val spark = df.sparkSession
    val out = new Path(path)
    val fs = out.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(out)) fs.delete(out, true)
    fs.mkdirs(out)
    val confBc = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(
        spark.sparkContext.hadoopConfiguration))
    val arranged =
      if (partitionKeys.nonEmpty)
        df.repartition(partitionKeys.map(col): _*)
          .sortWithinPartitions((partitionKeys ++ sortKeys).map(col): _*)
      else if (sortKeys.nonEmpty) // the trailer records sortKeys — honor them
        df.sortWithinPartitions(sortKeys.map(col): _*)
      else df
    val keyIdx = partitionKeys.map(schema.fieldIndex)
    val fieldTypes = schema.fields.map(_.dataType).toSeq
    val pathStr = out.toString
    val ext = Extension + codec.map {
      case "deflate" => ".deflate"
      case "gzip"    => ".gz"
    }.getOrElse("")
    // job abort: write() owns `path` (it cleared any pre-existing data
    // above), so a failed job must not leave the partitions that DID
    // commit looking like a complete dataset to a later read()
    try arranged.foreachPartition { (it: Iterator[Row]) =>
      if (it.hasNext) {
        val taskId = TaskContext.getPartitionId()
        // two-phase commit (the AvroNative discipline): write to an
        // attempt-unique temp name, rename into place once sealed — a
        // retried or speculative attempt never collides with a half-
        // written final file, and exactly one rename wins
        val attempt = Option(TaskContext.get()).map(_.taskAttemptId()).getOrElse(0L)
        val tmp = new Path(pathStr, f"_temporary/part-r$taskId%05d-a$attempt$ext")
        val file = new Path(pathStr, f"part-r$taskId%05d$ext")
        val wfs = file.getFileSystem(confBc.value.value)
        val fsOut = wfs.create(tmp, true)
        val counting = new CountingOutputStream(fsOut)
        val keySection = new ByteArrayOutputStream()
        val keyOut = new DataOutputStream(keySection)
        var nBlocks = 0
        var blockRecords = -1L // -1 = no open block
        var currentKey: Seq[Any] = null
        // the current block's value sink — per-block codec stream when
        // compressing, the raw counting stream otherwise
        var blockZip: java.util.zip.DeflaterOutputStream = null
        // the codec stream's native Deflater — finish() flushes but does
        // NOT release the native zlib buffer (only end()/close() do, and
        // close() would close the shared file stream), so a many-block
        // task would leak one native Deflater per block until GC
        // finalization: track it explicitly and end() it per block
        var blockDeflater: java.util.zip.Deflater = null
        var dout: DataOutputStream = new DataOutputStream(counting)
        var sealedOk = false
        try {
        def closeBlock(): Unit = if (blockRecords >= 0) {
          keyOut.writeLong(blockRecords); blockRecords = -1L
          if (blockZip != null) {
            dout.flush(); blockZip.finish(); blockZip = null
            blockDeflater.end(); blockDeflater = null
          }
        }
        def openBlock(key: Seq[Any], canonical: Seq[Any]): Unit = {
          closeBlock()
          PigSedes.writeDatum(keyOut, Row.fromSeq(key),
            StructType(keyIdx.map(schema.fields)))
          keyOut.writeLong(counting.count)
          keyOut.writeLong((taskId.toLong << 32) | nBlocks.toLong)
          nBlocks += 1
          blockRecords = 0L
          currentKey = canonical
          codec.foreach { c =>
            blockZip =
              if (c == "deflate") {
                blockDeflater = new java.util.zip.Deflater()
                new java.util.zip.DeflaterOutputStream(counting, blockDeflater)
              } else
                // GZIPOutputStream constructs its own Deflater into the
                // protected `def` field — expose it so closeBlock can end()
                new java.util.zip.GZIPOutputStream(counting) {
                  blockDeflater = `def`
                }
            dout = new DataOutputStream(blockZip)
          }
        }

        // block-break comparison needs VALUE equality: Array[Byte] keys
        // compare by reference and boxed NaN fails == — canonicalize
        // (bits-compare floats, +0.0 normalization keeps -0.0 == 0.0 runs
        // contiguous the way the sort ordered them)
        def canonKey(key: Seq[Any]): Seq[Any] = key.map {
          case a: Array[Byte] => a.toSeq
          case f: java.lang.Float  => java.lang.Float.floatToIntBits(f + 0.0f)
          case d: java.lang.Double => java.lang.Double.doubleToLongBits(d + 0.0d)
          case v => v
        }
        it.foreach { row =>
          val key = canonKey(keyIdx.map(row.get))
          if (blockRecords < 0 || key != currentKey)
            openBlock(keyIdx.map(row.get), key)
          if (serialization == "COMPACT")
            fieldTypes.zipWithIndex.foreach { case (dt, i) =>
              Vle.encodeField(dout, row.get(i), dt) }
          else PigSedes.writeDatum(dout, row, schema)
          blockRecords += 1
        }
        closeBlock()
        // the trailer always writes UNCOMPRESSED to the raw stream
        val tout = new DataOutputStream(counting)
        tout.flush()
        val trailerStart = counting.count
        tout.writeUTF(metaJson.replace("%%NBLOCKS%%", nBlocks.toString))
        val keyBytes = keySection.toByteArray
        tout.writeInt(keyBytes.length)
        tout.write(keyBytes)
        tout.writeLong(trailerStart)
        tout.close()
        // a losing speculative twin finds the final name taken; drop temp.
        // Any OTHER rename failure must fail the task loudly — swallowing
        // it would silently lose this partition's rows
        if (!wfs.rename(tmp, file)) {
          if (wfs.exists(file)) wfs.delete(tmp, false)
          else throw new java.io.IOException(
            s"rubix commit failed: could not rename $tmp to $file " +
              "and no winning attempt's file exists")
        }
        sealedOk = true
        } finally if (!sealedOk) {
          // task abort: release the native Deflater, the file lease, and
          // this attempt's temp file — never leave them to GC/retry luck
          if (blockDeflater != null) blockDeflater.end()
          try fsOut.close() catch { case _: Exception => () }
          try wfs.delete(tmp, false) catch { case _: Exception => () }
        }
        ()
      }
    } catch {
      case t: Throwable =>
        try fs.delete(out, true) catch { case _: Exception => () }
        throw t
    }
    // job commit: clear attempt garbage from aborted/losing attempts
    fs.delete(new Path(out, "_temporary"), true)
  }

  /** Convert a rubix dataset into a blockgen'd (bucketed + sorted) table,
    * carrying the trailer's partition/sort metadata into the catalog so
    * co-located joins keep working — the migration path for existing
    * datasets. Bucket count defaults to the source's block count (one
    * bucket ≈ one legacy block).
    */
  def convert(spark: SparkSession, rubixPath: String, table: String,
              buckets: Option[Int] = None): DataFrame = {
    val metas = describe(spark, rubixPath)
    val df = read(spark, rubixPath, metas) // one trailer parse, not two
    val pk = metas.head.partitionKeys
    val sk = metas.head.sortKeys
    if (pk.nonEmpty)
      graft.operators.Blockgen.blockgen(df, table, pk, sk,
        buckets.getOrElse(math.max(1, metas.map(_.blocks.size).sum)))
    else {
      spark.sql(s"DROP TABLE IF EXISTS `$table`")
      df.write.mode("overwrite").format("parquet").saveAsTable(table)
    }
    spark.table(table)
  }

  // ---- cubert <-> spark schema -------------------------------------------

  /** Cubert BlockSchema JSON → Spark schema. Cubert types (block/DataType
    * .java:28-54): scalars map 1:1; STRING/ENUM → string; BYTES → binary;
    * TUPLE/RECORD → struct; BAG → array of struct (of the inner tuple);
    * ARRAY → array of the single inner field's type; MAP → map<string,string>.
    */
  private[sources] def cubertSchemaToSpark(schemaNode: com.fasterxml.jackson.databind.JsonNode): StructType =
    StructType((0 until schemaNode.size).map { i =>
      val colNode = schemaNode.get(i)
      StructField(colNode.get("name").asText(), cubertTypeToSpark(colNode))
    })

  private def cubertTypeToSpark(colNode: com.fasterxml.jackson.databind.JsonNode): DataType =
    colNode.get("type").asText().toUpperCase match {
      case "INT"              => IntegerType
      case "LONG"             => LongType
      case "FLOAT"            => FloatType
      case "DOUBLE"           => DoubleType
      case "BOOLEAN"          => BooleanType
      case "BYTE"             => ByteType
      case "STRING" | "ENUM"  => StringType
      case "BYTES"            => BinaryType
      case "TUPLE" | "RECORD" => cubertSchemaToSpark(colNode.get("schema"))
      case "BAG" =>
        ArrayType(cubertSchemaToSpark(colNode.get("schema").get(0).get("schema")))
      case "ARRAY" =>
        ArrayType(cubertTypeToSpark(colNode.get("schema").get(0).get("schema").get(0)))
      case "MAP"              => MapType(StringType, StringType)
      case other => throw new IllegalArgumentException(s"unknown cubert type: $other")
    }

  private def sparkTypeToCubert(name: String, dt: DataType): String = {
    def obj(tpe: String, schema: Option[String] = None) =
      s"""{"name":${jstr(name)},"type":"$tpe"""" +
        schema.map(s => s""","schema":$s""").getOrElse("") + "}"
    dt match {
      case IntegerType => obj("INT")
      case LongType    => obj("LONG")
      case FloatType   => obj("FLOAT")
      case DoubleType  => obj("DOUBLE")
      case BooleanType => obj("BOOLEAN")
      case ByteType    => obj("BYTE")
      case StringType  => obj("STRING")
      case BinaryType  => obj("BYTES")
      case st: StructType =>
        obj("TUPLE", Some(st.fields.map(f => sparkTypeToCubert(f.name, f.dataType))
          .mkString("[", ",", "]")))
      case ArrayType(st: StructType, _) =>
        val inner = st.fields.map(f => sparkTypeToCubert(f.name, f.dataType))
          .mkString("[", ",", "]")
        obj("BAG", Some(s"""[{"name":${jstr(name)},"type":"TUPLE","schema":$inner}]"""))
      case ArrayType(et, _) =>
        val inner = s"[${sparkTypeToCubert(name, et)}]"
        obj("ARRAY", Some(s"""[{"name":${jstr(name)},"type":"TUPLE","schema":$inner}]"""))
      case MapType(StringType, StringType, _) => obj("MAP")
      case other =>
        throw new IllegalArgumentException(
          s"type ${other.simpleString} has no cubert equivalent (column $name)")
    }
  }

  private def jstr(s: String): String =
    "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  private def metadataJson(schema: StructType, partitionKeys: Seq[String],
                           sortKeys: Seq[String], serialization: String): String = {
    val cols = schema.fields.map(f => sparkTypeToCubert(f.name, f.dataType))
      .mkString("[", ",", "]")
    val pk = partitionKeys.map(jstr).mkString("[", ",", "]")
    val sk = sortKeys.map(jstr).mkString("[", ",", "]")
    s"""{"schema":$cols,"partitionKeys":$pk,"sortKeys":$sk,""" +
      s""""keyClass":"org.apache.pig.data.BinSedesTuple",""" +
      s""""valueClass":"org.apache.pig.data.BinSedesTuple",""" +
      s""""serializationType":"$serialization","numberOfBlocks":%%NBLOCKS%%}"""
  }

  // ---- plumbing -----------------------------------------------------------

  /** Bounds reads to `limit` bytes of the underlying stream (the reference's
    * io/BlockInputStream.java) — a block slice must never read into its
    * neighbor.
    */
  private[sources] class BoundedInputStream(in: InputStream, limit: Long) extends InputStream {
    private var remaining = limit
    override def read(): Int =
      if (remaining <= 0) -1
      else { val b = in.read(); if (b >= 0) remaining -= 1; b }
    override def read(buf: Array[Byte], off: Int, len: Int): Int =
      if (remaining <= 0) -1
      else {
        val n = in.read(buf, off, math.min(len.toLong, remaining).toInt)
        if (n > 0) remaining -= n
        n
      }
    override def available(): Int = math.min(remaining, Int.MaxValue.toLong).toInt
  }

  private[sources] class CountingOutputStream(out: OutputStream) extends OutputStream {
    var count: Long = 0L
    override def write(b: Int): Unit = { out.write(b); count += 1 }
    override def write(buf: Array[Byte], off: Int, len: Int): Unit = {
      out.write(buf, off, len); count += len
    }
    override def flush(): Unit = out.flush()
    override def close(): Unit = out.close()
  }
}
