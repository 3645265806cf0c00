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

  test("avro without the spark-avro module fails with an actionable message") {
    // this container ships no spark-avro jar; the format mapping must
    // surface Spark's deploy-the-module guidance, not a random classpath error
    val df = Seq((1L, "a")).toDF("id", "name")
    val e = intercept[Exception] {
      Sources.store(df, Files.createTempDirectory("graft-avro").toString + "/a", "avro")
    }
    assert(e.getMessage.toLowerCase.contains("avro"))
  }
}
