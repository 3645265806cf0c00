package graft

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.{Rubix, Sources, Vle}

/** Native rubix block-file format: the reader is gated against a GOLDEN
  * file hand-assembled byte-by-byte from the reference's documented layout
  * (RubixRecordWriter.java:47-56, RubixFile.java:228-305) — independent of
  * this repo's writer — then writer/reader round-trips, COMPACT blocks,
  * and the convert-to-blockgen migration path.
  */
class RubixSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String) = Files.createTempDirectory(prefix).toString

  /** Hand-encode one BinInterSedes datum per the published Pig 0.13 tags. */
  private object Golden {
    def tinyTuple(out: DataOutputStream, arity: Int): Unit = {
      out.writeByte(21); out.writeByte(arity)
    }
    def int(out: DataOutputStream, v: Int): Unit = { out.writeByte(3); out.writeInt(v) }
    def long(out: DataOutputStream, v: Long): Unit = { out.writeByte(8); out.writeLong(v) }
    def str(out: DataOutputStream, s: String): Unit = {
      val b = s.getBytes("UTF-8")
      out.writeByte(15); out.writeShort(b.length); out.write(b)
    }
    def nul(out: DataOutputStream): Unit = out.writeByte(27)
  }

  test("golden file: a byte-level hand-assembled rubix file parses and reads") {
    // two blocks keyed on `grp`: (grp=1: two records) (grp=2: one record),
    // schema (grp INT, name STRING, score LONG)
    val dir = tmp("graft-rubix-golden")
    val file = new java.io.File(s"$dir/part-r00000.rubix")
    val bytes = new ByteArrayOutputStream()
    val out = new DataOutputStream(bytes)
    def record(grp: Int, name: String, score: java.lang.Long): Unit = {
      Golden.tinyTuple(out, 3)
      Golden.int(out, grp)
      if (name == null) Golden.nul(out) else Golden.str(out, name)
      if (score == null) Golden.nul(out) else Golden.long(out, score)
    }
    // --- value section
    val off1 = out.size().toLong
    record(1, "alice", 10L)
    record(1, null, 20L)
    val off2 = out.size().toLong
    record(2, "carol", null)
    val trailerStart = out.size().toLong
    // --- trailer: UTF json, key-section size, key section, trailer offset
    val meta = """{"schema":[{"name":"grp","type":"INT"},""" +
      """{"name":"name","type":"STRING"},{"name":"score","type":"LONG"}],""" +
      """"partitionKeys":["grp"],"sortKeys":["grp","score"],""" +
      """"keyClass":"org.apache.pig.data.BinSedesTuple",""" +
      """"valueClass":"org.apache.pig.data.BinSedesTuple",""" +
      """"serializationType":"DEFAULT","numberOfBlocks":2}"""
    out.writeUTF(meta)
    val keySec = new ByteArrayOutputStream()
    val kout = new DataOutputStream(keySec)
    Golden.tinyTuple(kout, 1); Golden.int(kout, 1) // block 1 key
    kout.writeLong(off1); kout.writeLong((7L << 32) | 0L); kout.writeLong(2L)
    Golden.tinyTuple(kout, 1); Golden.int(kout, 2) // block 2 key
    kout.writeLong(off2); kout.writeLong((7L << 32) | 1L); kout.writeLong(1L)
    out.writeInt(keySec.size())
    out.write(keySec.toByteArray)
    out.writeLong(trailerStart)
    Files.write(file.toPath, bytes.toByteArray)

    // trailer metadata parses exactly
    val metas = Rubix.describe(spark, dir)
    assert(metas.length == 1)
    val m = metas.head
    assert(m.schema == StructType(Seq(StructField("grp", IntegerType),
      StructField("name", StringType), StructField("score", LongType))))
    assert(m.partitionKeys == Seq("grp") && m.sortKeys == Seq("grp", "score"))
    assert(m.serializationType == "DEFAULT")
    assert(m.blocks.map(b => (b.key, b.numRecords, b.reducerId)) ==
      Seq((Seq(1), 2L, 7), (Seq(2), 1L, 7)))
    assert(m.blocks.map(_.offset) == Seq(off1, off2))
    assert(m.blocks.map(_.length) == Seq(off2 - off1, trailerStart - off2))

    // data decodes, including nulls, via the public LOAD path
    val rows = Sources.load(spark, dir, "rubix").collect()
      .map(r => (r.get(0), r.get(1), r.get(2))).toSet
    assert(rows == Set((1, "alice", 10L), (1, null, 20L), (2, "carol", null)))
  }

  test("DEFAULT round-trip: all cubert types, nulls, bags, structs, maps survive") {
    val dir = tmp("graft-rubix-rt") + "/data"
    val schema = StructType(Seq(
      StructField("id", IntegerType), StructField("l", LongType),
      StructField("f", FloatType), StructField("d", DoubleType),
      StructField("b", BooleanType), StructField("y", ByteType),
      StructField("s", StringType), StructField("bin", BinaryType),
      StructField("bag", ArrayType(StructType(Seq(
        StructField("t", StringType), StructField("n", IntegerType))))),
      StructField("arr", ArrayType(LongType)),
      StructField("rec", StructType(Seq(StructField("a", IntegerType),
        StructField("bb", StringType)))),
      StructField("m", MapType(StringType, StringType))))
    val rows = Seq(
      Row(1, 10L, 1.5f, 2.5, true, 3.toByte, "x", Array[Byte](1, 2),
        Seq(Row("p", 1), Row("q", 2)), Seq(7L, 8L), Row(5, "in"),
        Map("k" -> "v")),
      Row(2, null, null, null, null, null, null, null, Seq.empty[Row],
        Seq.empty[Long], null, null),
      Row(2, 130L, -0.0f, 3.25, false, (-4).toByte, "yy", Array[Byte](),
        Seq(Row(null, null)), Seq(9L), Row(null, "z"), Map.empty[String, String]))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
    Rubix.write(df, dir, partitionKeys = Seq("id"), sortKeys = Seq("l"))

    val metas = Rubix.describe(spark, dir)
    assert(metas.head.partitionKeys == Seq("id"))
    assert(metas.head.sortKeys == Seq("l"))
    // one block per distinct id
    assert(metas.flatMap(_.blocks).length == 2)
    assert(metas.flatMap(_.blocks).map(_.key).toSet == Set(Seq(1), Seq(2)))

    val back = Rubix.read(spark, dir)
    assert(back.schema == schema)
    val norm = back.collect().map { r =>
      (r.get(0), r.get(1), r.get(2), r.get(3), r.get(4), r.get(5), r.get(6),
        Option(r.get(7)).map(_.asInstanceOf[Array[Byte]].toSeq).orNull,
        r.get(8), r.get(9), r.get(10), r.get(11))
    }.toSet
    val expect = rows.map { r =>
      (r.get(0), r.get(1), r.get(2), r.get(3), r.get(4), r.get(5), r.get(6),
        Option(r.get(7)).map(_.asInstanceOf[Array[Byte]].toSeq).orNull,
        r.get(8), r.get(9), r.get(10), r.get(11))
    }.toSet
    assert(norm == expect)
  }

  test("COMPACT round-trip: flat schema with nulls, zeros and negatives") {
    val dir = tmp("graft-rubix-compact") + "/data"
    val df = Seq(
      (1, Some(-42L), Some(0.0f), Some(123.456), Some(true), "row one"),
      (2, None, None, None, None, null),
      (3, Some(Long.MaxValue), Some(-1.5f), Some(-0.0), Some(false), ""),
      (3, Some(255L), Some(3.0f), Some(-7.0), Some(true), "Ünïcode")
    ).toDF("id", "l", "f", "d", "b", "s")
    Rubix.write(df, dir, partitionKeys = Seq("id"), serialization = "COMPACT")
    assert(Rubix.describe(spark, dir).head.serializationType == "COMPACT")
    val back = Rubix.read(spark, dir)
    assert(back.collect().map(_.toSeq).toSet == df.collect().map(_.toSeq).toSet)
    // nested schemas must be rejected up front, not corrupt silently
    val nested = Seq((1, Seq(1L))).toDF("a", "bs")
    val err = intercept[IllegalArgumentException](
      Rubix.write(nested, dir + "2", serialization = "COMPACT"))
    assert(err.getMessage.contains("flat schema"))
  }

  test("compressed blocks: per-block deflate/gzip streams round-trip and split per block") {
    val df = (1 to 1000).map(i => (i % 4, i.toLong, s"payload-$i" * 3))
      .toDF("grp", "seq", "text")
    for ((codec, ext) <- Seq("deflate" -> ".rubix.deflate", "gzip" -> ".rubix.gz")) {
      val dir = tmp(s"graft-rubix-$codec") + "/data"
      Rubix.write(df, dir, partitionKeys = Seq("grp"), sortKeys = Seq("seq"),
        codec = Some(codec))
      val files = new java.io.File(dir).listFiles.map(_.getName)
        .filter(n => n.contains(".rubix") && !n.startsWith("."))
      assert(files.nonEmpty && files.forall(_.endsWith(ext)), files.mkString(","))
      // trailer parses (uncompressed), one block per key, data decodes
      val metas = Rubix.describe(spark, dir)
      assert(metas.flatMap(_.blocks).map(_.key).toSet ==
        Set(Seq(0), Seq(1), Seq(2), Seq(3)))
      val back = Rubix.read(spark, dir)
      assert(back.collect().map(_.toSeq).toSet == df.collect().map(_.toSeq).toSet)
    }
    // COMPACT composes with compression
    val dir2 = tmp("graft-rubix-cz") + "/data"
    Rubix.write(df, dir2, partitionKeys = Seq("grp"),
      serialization = "COMPACT", codec = Some("deflate"))
    assert(Rubix.read(spark, dir2).count() == 1000)
  }

  test("VLE codec: exhaustive boundaries + randomized int/long/float/double round-trip") {
    val boundaryInts = Seq(0, 1, -1, 2, 127, 128, 129, 255, 256, 65535, 65536,
      0x7F7F, 0x1FFFFF, 0x200000, Int.MaxValue, -Int.MaxValue, -65536)
    val boundaryLongs = boundaryInts.map(_.toLong) ++ Seq(1L << 32, (1L << 40) - 1,
      1L << 40, 1L << 48, 1L << 56, Long.MaxValue, -Long.MaxValue, -(1L << 56))
    val rnd = new scala.util.Random(42)
    val ints = boundaryInts ++ Seq.fill(500)(rnd.nextInt()).filter(_ != Int.MinValue)
    val longs = boundaryLongs ++ Seq.fill(500)(rnd.nextLong()).filter(_ != Long.MinValue)
    for (h <- Seq(1, 2)) {
      for (v <- ints) {
        val bos = new ByteArrayOutputStream()
        // h=2 embeds in a float slot; exercise via the public float path below
        if (h == 1) {
          Vle.encodeInt(v, bos, 1)
          val in = new java.io.ByteArrayInputStream(bos.toByteArray)
          assert(Vle.decodeInt(in).intValue == v, s"int $v")
          assert(in.available() == 0, s"int $v leftover bytes")
        }
      }
      for (v <- longs if h == 1) {
        val bos = new ByteArrayOutputStream()
        Vle.encodeLong(v, bos, 1)
        val in = new java.io.ByteArrayInputStream(bos.toByteArray)
        assert(Vle.decodeLong(in).longValue == v, s"long $v")
        assert(in.available() == 0, s"long $v leftover bytes")
      }
    }
    val floats = Seq(0.0f, -0.0f, 1.0f, -1.0f, 255.0f, 1e9f, 3.14f, -2.5f,
      Float.MaxValue, Float.MinPositiveValue) ++ Seq.fill(300)(rnd.nextFloat() * 1e6f)
    for (v <- floats) {
      val bos = new ByteArrayOutputStream()
      Vle.encodeFloat(v, bos)
      val in = new java.io.ByteArrayInputStream(bos.toByteArray)
      assert(Vle.decodeFloat(in).floatValue == v, s"float $v")
      assert(in.available() == 0, s"float $v leftover bytes")
    }
    val doubles = Seq(0.0, -0.0, 1.0, -1.0, 1e15, -1e15, 2.718281828, 4e18,
      Double.MaxValue, Double.MinPositiveValue) ++ Seq.fill(300)(rnd.nextDouble() * 1e12)
    for (v <- doubles) {
      val bos = new ByteArrayOutputStream()
      Vle.encodeDouble(v, bos)
      val in = new java.io.ByteArrayInputStream(bos.toByteArray)
      assert(Vle.decodeDouble(in).doubleValue == v, s"double $v")
      assert(in.available() == 0, s"double $v leftover bytes")
    }
  }

  test("PigSedes: randomized nested datums round-trip byte-for-byte (seeded)") {
    import java.io.{ByteArrayInputStream, DataInputStream}
    val rnd = new scala.util.Random(7)
    val leafTypes = Seq(IntegerType, LongType, FloatType, DoubleType,
      BooleanType, ByteType, StringType, BinaryType)
    def randLeaf(dt: DataType): Any = dt match {
      case _ if rnd.nextInt(8) == 0 => null
      case IntegerType => rnd.nextInt()
      case LongType    => rnd.nextLong()
      case FloatType   => rnd.nextFloat() * 1e6f
      case DoubleType  => rnd.nextDouble() * 1e12
      case BooleanType => rnd.nextBoolean()
      case ByteType    => rnd.nextInt().toByte
      case StringType  => // boundary-hugging lengths incl. multi-byte UTF-8
        val len = Seq(0, 1, 120, 254, 255, 256)(rnd.nextInt(6))
        (0 until len).map(_ => if (rnd.nextInt(5) == 0) 'ü' else ('a' + rnd.nextInt(26)).toChar).mkString
      case BinaryType  => Array.fill(Seq(0, 1, 254, 255, 300)(rnd.nextInt(5)))(rnd.nextInt().toByte)
    }
    def randSchema(depth: Int): DataType =
      if (depth == 0) leafTypes(rnd.nextInt(leafTypes.length))
      else rnd.nextInt(4) match {
        case 0 => StructType((0 until 1 + rnd.nextInt(4)).map(i =>
          StructField(s"f$i", randSchema(depth - 1))))
        case 1 => ArrayType(StructType(Seq(
          StructField("e", randSchema(depth - 1)))))
        case 2 => MapType(StringType, StringType)
        case _ => leafTypes(rnd.nextInt(leafTypes.length))
      }
    def randValue(dt: DataType): Any = dt match {
      case st: StructType =>
        Row.fromSeq(st.fields.toSeq.map(f => randValue(f.dataType)))
      case ArrayType(st: StructType, _) =>
        Vector.fill(rnd.nextInt(5))(randValue(st))
      case MapType(StringType, StringType, _) =>
        (0 until rnd.nextInt(4)).map(i => s"k$i" -> s"v${rnd.nextInt(99)}").toMap
      case leaf => randLeaf(leaf)
    }
    def norm(v: Any): Any = v match {
      case b: Array[Byte] => b.toSeq
      case r: Row => r.toSeq.map(norm)
      case s: scala.collection.Seq[_] => s.map(norm).toVector
      case m: scala.collection.Map[_, _] => m.map { case (k, x) => (k, norm(x)) }.toMap
      case x => x
    }
    for (_ <- 0 until 300) {
      val schema = StructType((0 until 1 + rnd.nextInt(5)).map(i =>
        StructField(s"c$i", randSchema(rnd.nextInt(3)))))
      val value = randValue(schema).asInstanceOf[Row]
      val bos = new ByteArrayOutputStream()
      graft.sources.PigSedes.writeDatum(new DataOutputStream(bos), value, schema)
      val in = new DataInputStream(new ByteArrayInputStream(bos.toByteArray))
      val back = graft.sources.PigSedes.readDatum(in) match {
        case r: Row => Row.fromSeq(schema.fields.toSeq.zip(r.toSeq).map {
          case (f, x) => graft.sources.PigSedes.toSpark(x, f.dataType) })
        case other => fail(s"not a tuple: $other")
      }
      assert(in.available() == 0, "leftover bytes after datum")
      assert(norm(back) == norm(value), s"schema $schema")
    }
  }

  test("write honors sortKeys without partitionKeys; trailer matches the data (r17 review)") {
    val dir = tmp("graft-rubix-sk") + "/data"
    val df = Seq((3, "c"), (1, "a"), (2, "b")).toDF("x", "s").coalesce(1)
    Rubix.write(df, dir, partitionKeys = Nil, sortKeys = Seq("x"))
    val metas = Rubix.describe(spark, dir)
    assert(metas.head.sortKeys == Seq("x"))
    // the block data must actually BE sorted the way the trailer claims
    // (one block, one read task — collect preserves the block's row order)
    val got = Rubix.read(spark, dir).collect().map(_.getInt(0)).toSeq
    assert(got == Seq(1, 2, 3), got.toString)
  }

  test("describe rejects an understated numberOfBlocks instead of dropping blocks (r17 review)") {
    val dir = tmp("graft-rubix-ub") + "/data"
    val df = Seq((1, "a"), (2, "b")).toDF("k", "s").coalesce(1)
    Rubix.write(df, dir, partitionKeys = Seq("k")) // 2 blocks
    // patch numberOfBlocks 2 -> 1 byte-for-byte: same length, so every
    // trailer offset stays valid — only the count now understates
    val f = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".rubix")).head
    val bytes = java.nio.file.Files.readAllBytes(f.toPath)
    val needle = "\"numberOfBlocks\":2".getBytes("UTF-8").toSeq
    val idx = bytes.toSeq.indexOfSlice(needle)
    assert(idx >= 0, "trailer json not found")
    bytes(idx + needle.length - 1) = '1'.toByte
    java.nio.file.Files.write(f.toPath, bytes)
    // drop the local-fs checksum sidecar the patch just invalidated
    new java.io.File(f.getParentFile, s".${f.getName}.crc").delete()
    val e = intercept[IllegalArgumentException](Rubix.describe(spark, dir))
    assert(e.getMessage.contains("numberOfBlocks"), e.getMessage)
  }

  test("binary partition keys block by value, not reference (r17 review)") {
    val dir = tmp("graft-rubix-bin") + "/data"
    val schema = StructType(Seq(
      StructField("bk", BinaryType), StructField("v", IntegerType)))
    val rows = Seq(Row(Array[Byte](1, 2), 1), Row(Array[Byte](1, 2), 2),
      Row(Array[Byte](3), 3))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
    Rubix.write(df, dir, partitionKeys = Seq("bk"))
    // was one block per ROW before the canonical-key fix (Array reference ==)
    val blocks = Rubix.describe(spark, dir).flatMap(_.blocks)
    assert(blocks.length == 2, blocks.mkString(";"))
    assert(Rubix.read(spark, dir).count() == 3)
  }

  test("a failed write aborts the whole output instead of leaving a partial dataset (r17 review)") {
    val dir = tmp("graft-rubix-abort") + "/data"
    val boom = udf((i: Int) => {
      if (i == 42) throw new RuntimeException("boom"); i
    })
    val df = spark.range(0, 100, 1, 4).select(boom(col("id").cast("int")).as("x"))
    intercept[Exception](Rubix.write(df, dir, partitionKeys = Nil))
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(p),
      "aborted write must not leave a readable partial dataset")
  }

  test("convert: legacy rubix dataset lands as a bucketed table with its keys") {
    val dir = tmp("graft-rubix-conv") + "/data"
    val df = (1 to 100).map(i => (i % 5, i.toLong, s"r$i"))
      .toDF("grp", "seq", "payload")
    Rubix.write(df, dir, partitionKeys = Seq("grp"), sortKeys = Seq("seq"))
    val out = Rubix.convert(spark, dir, "rubix_converted")
    assert(out.count() == 100)
    val cat = spark.sessionState.catalog.getTableMetadata(
      spark.sessionState.sqlParser.parseTableIdentifier("rubix_converted"))
    val spec = cat.bucketSpec.get
    assert(spec.bucketColumnNames == Seq("grp"))
    assert(spec.sortColumnNames == Seq("seq"))
    assert(out.groupBy("grp").count().collect().map(_.getLong(1)).forall(_ == 20))
    spark.sql("DROP TABLE IF EXISTS rubix_converted")
  }

  test("script: LOAD a real .rubix dataset USING RUBIX decodes natively") {
    val dir = tmp("graft-rubix-script") + "/data"
    val df = Seq((1, "a", 5L), (1, "b", 6L), (2, "c", 7L)).toDF("k", "v", "n")
    Rubix.write(df, dir, partitionKeys = Seq("k"))
    val script =
      s"""a = LOAD '$dir' USING RUBIX;
         |b = GROUP a BY k AGGREGATES SUM(n) AS total;
         |""".stripMargin
    val out = graft.script.ScriptEngine.run(spark, script)("b")
    assert(out.collect().map(r => (r.getInt(0), r.getLong(1))).toSet ==
      Set((1, 11L), (2, 7L)))
  }
}
