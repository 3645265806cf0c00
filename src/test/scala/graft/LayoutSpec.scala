package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.Layout

/** Storage-layout operators: z-value arithmetic against a bit-twiddling
  * reference, the clustering payoff (per-file ranges narrow in BOTH
  * z-ordered dimensions), and compaction file-count/data fidelity.
  */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft-layout").toString

  test("zValue == Morton bit-interleave reference") {
    // 2 dims over [0, 65535] with identity scaling: zValue must equal the
    // classic interleave (x bit i -> position 2i, y bit i -> 2i+1)
    def refMorton(x: Long, y: Long): Long = {
      var z = 0L
      for (i <- 0 until 16) {
        z |= ((x >> i) & 1L) << (2 * i)
        z |= ((y >> i) & 1L) << (2 * i + 1)
      }
      z
    }
    val pts = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 65535L), (12345L, 54321L),
      (65535L, 0L), (255L, 256L))
    val got = pts.toDF("x", "y")
      .select(Layout.zValue(Seq(col("x"), col("y")),
        Seq(0.0, 0.0), Seq(65535.0, 65535.0)))
      .collect().map(_.getLong(0))
    pts.zip(got).foreach { case ((x, y), z) =>
      assert(z == refMorton(x, y), s"($x,$y)")
    }
  }

  test("zValue with 4 columns never crosses the sign bit (r17 review)") {
    // 16 bits x 4 dims put the 4th column's top bit at position 63: rows in
    // that column's upper half sorted NEGATIVE, inverting Morton order —
    // 15 bits/dim at d=4 keeps every z-value non-negative and monotone in
    // each dimension
    val df = Seq(
      (0L, 0L, 0L, 0L),
      (0L, 0L, 0L, 40000L),   // upper half of the 4th dim — was negative
      (65535L, 65535L, 65535L, 65535L)).toDF("a", "b", "c", "d")
    val zs = df.select(Layout.zValue(
      Seq(col("a"), col("b"), col("c"), col("d")),
      Seq.fill(4)(0.0), Seq.fill(4)(65535.0))).collect().map(_.getLong(0))
    assert(zs.forall(_ >= 0L), zs.mkString(","))
    assert(zs(0) < zs(1) && zs(1) < zs(2), zs.mkString(","))
  }

  test("zValue handles nulls, constants, and out-of-range as documented") {
    val df = Seq[(java.lang.Long, java.lang.Long)]((null, 5L), (7L, 7L))
      .toDF("x", "y")
    // null scales to 0; a constant column (min==max) contributes 0 bits
    val z = df.select(Layout.zValue(Seq(col("x"), col("y")),
      Seq(0.0, 7.0), Seq(10.0, 7.0))).collect().map(_.getLong(0))
    assert(z(0) == 0L)                     // null x, constant y
    assert((z(1) & 2L) == 0L && z(1) > 0L) // y bits all zero, x bits set
  }

  test("z-order write narrows per-file ranges in BOTH dimensions") {
    val li = sf("lineitem").select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity")
    val dir = tmp()
    Layout.zorderWrite(li, dir, Seq("l_partkey", "l_suppkey"), numFiles = 8)
    val back = spark.read.parquet(dir)
    assert(back.count() == li.count())

    // per-file [min,max] width for each dimension, as a fraction of the
    // global range; random layout gives ~1.0, clustered much less
    def avgWidth(c: String): Double = {
      val w = back.groupBy(input_file_name()).agg(
        (max(col(c)) - min(col(c))).cast("double").as("w")).agg(avg("w"))
        .collect().head.getDouble(0)
      val g = li.agg((max(col(c)) - min(col(c))).cast("double")).collect().head.getDouble(0)
      w / g
    }
    assert(avgWidth("l_partkey") < 0.6, s"l_partkey not clustered: ${avgWidth("l_partkey")}")
    assert(avgWidth("l_suppkey") < 0.6, s"l_suppkey not clustered: ${avgWidth("l_suppkey")}")
  }

  test("z-order clusters timestamp + numeric columns together") {
    val ev = sf("events").select("event_id", "ts", "user_id")
    val dir = tmp()
    Layout.zorderWrite(ev, dir, Seq("ts", "user_id"), numFiles = 4)
    val back = spark.read.parquet(dir)
    assert(back.count() == ev.count())
    val w = back.groupBy(input_file_name()).agg(
      (max(col("user_id")) - min(col("user_id"))).cast("double").as("w"))
      .agg(avg("w")).collect().head.getDouble(0)
    val g = ev.agg((max(col("user_id")) - min(col("user_id"))).cast("double"))
      .collect().head.getDouble(0)
    assert(w / g < 0.8, s"user_id not clustered alongside ts: ${w / g}")
  }

  test("compact merges small files to the target size and preserves rows") {
    val dir = tmp()
    val li = sf("lineitem")
    li.repartition(20).write.mode("overwrite").parquet(s"$dir/in")
    val inFiles = new java.io.File(s"$dir/in").listFiles
      .count(f => f.isFile && !f.getName.startsWith("_") && !f.getName.endsWith(".crc"))
    assert(inFiles == 20)
    val n = Layout.compact(spark, s"$dir/in", s"$dir/out", targetFileBytes = 256L * 1024)
    val outFiles = new java.io.File(s"$dir/out").listFiles
      .count(f => f.isFile && !f.getName.startsWith("_") && !f.getName.endsWith(".crc"))
    assert(outFiles == n && n < 20, s"expected <20 merged files, got $n")
    // data fidelity: same multiset of rows
    assert(spark.read.parquet(s"$dir/out").exceptAll(li).count() == 0)
    assert(li.exceptAll(spark.read.parquet(s"$dir/out")).count() == 0)
  }

  test("compact refuses a hive-partitioned directory instead of collapsing it") {
    val dir = tmp()
    sf("orders").write.partitionBy("o_orderpriority").parquet(s"$dir/in")
    val e = intercept[IllegalArgumentException] {
      Layout.compact(spark, s"$dir/in", s"$dir/out")
    }
    assert(e.getMessage.contains("partition directories"))
  }

  test("compact splits an oversized single file when target is small") {
    val dir = tmp()
    sf("lineitem").coalesce(1).write.mode("overwrite").parquet(s"$dir/in")
    val n = Layout.compact(spark, s"$dir/in", s"$dir/out", targetFileBytes = 64L * 1024)
    assert(n > 1, s"expected a split, got $n file(s)")
  }

  test("storeWithBloom writes real parquet bloom filters that answer membership") {
    import scala.jdk.CollectionConverters._
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import org.apache.parquet.io.api.Binary
    val dir = tmp()
    val df = spark.range(1000)
      .select(concat(lit("u"), col("id")).as("k"), col("id").as("v")).coalesce(1)
    Layout.storeWithBloom(df, s"$dir/out", bloomCols = Seq("k"), ndv = 1000)
    val file = new java.io.File(s"$dir/out").listFiles
      .filter(_.getName.endsWith(".parquet")).head
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(file.getPath),
      new org.apache.hadoop.conf.Configuration()))
    try {
      val block = reader.getFooter.getBlocks.get(0)
      val cols = block.getColumns.asScala
      val bfr = reader.getBloomFilterDataReader(block)
      val kBf = bfr.readBloomFilter(cols.find(_.getPath.toDotString == "k").get)
      assert(kBf != null, "no bloom filter on the requested column")
      // every written key answers maybe-present
      (0 until 1000 by 97).foreach { i =>
        assert(kBf.findHash(kBf.hash(Binary.fromString(s"u$i"))), s"u$i missing")
      }
      // absent keys mostly answer no (fpp well under 50%)
      val fp = (0 until 200).count(i =>
        kBf.findHash(kBf.hash(Binary.fromString(s"absent$i"))))
      assert(fp < 40, s"false-positive storm: $fp/200")
      // the un-requested column carries no bloom
      assert(bfr.readBloomFilter(cols.find(_.getPath.toDotString == "v").get) == null)
    } finally reader.close()
  }
}
