package graft

import org.apache.spark.sql.functions._

import graft.operators.{Packing, Sampling}
import graft.text.TextAnalysis

class SamplingPackingSpec extends SparkSpec {
  import spark.implicits._

  // ---- repetition features ------------------------------------------------

  test("repetition features on known strings") {
    val df = Seq(
      (1L, "a a a a"),       // 1 distinct token of 4; bigrams all "a a"
      (2L, "a b c d"),       // no repetition at all
      (3L, "")               // empty → all zeros
    ).toDF("doc_id", "text")
    val r = TextAnalysis.withRepetitionFeatures(df).orderBy("doc_id").collect()
    assert(r(0).getAs[Double]("dup_token_frac") == 0.75)
    assert(r(0).getAs[Double]("dup_bigram_frac") == 1.0 - 1.0 / 3.0)
    assert(r(0).getAs[Double]("dup_trigram_frac") == 0.5)
    assert(r(1).getAs[Double]("dup_token_frac") == 0.0)
    assert(r(1).getAs[Double]("dup_bigram_frac") == 0.0)
    assert(r(2).getAs[Long]("n_tokens") == 0L)
    assert(r(2).getAs[Double]("dup_token_frac") == 0.0)
  }

  // ---- PII scrub ----------------------------------------------------------

  test("pii scrub counts and redacts emails, phones, ips") {
    val df = Seq(
      (1L, "mail me at jo.doe+x@mail.example.org or call 555-1234"),
      (2L, "server at 192.168.0.1 and 10.0.0.255"),
      (3L, "nothing sensitive here"),
      (4L, "call 555-123-4567 now"), // 10-digit form redacts WHOLE, no prefix leak
      (5L, "serial 1234-5678 and 1234.5.6.7 stay") // word-bounded: no partial match
    ).toDF("doc_id", "text")
    val r = TextAnalysis.withPiiScrub(df).orderBy("doc_id").collect()
    assert(r(0).getAs[Long]("n_emails") == 1 && r(0).getAs[Long]("n_phones") == 1)
    assert(r(0).getAs[String]("text_redacted") == "mail me at <EMAIL> or call <PHONE>")
    assert(r(1).getAs[Long]("n_ipv4") == 2)
    assert(r(1).getAs[String]("text_redacted") == "server at <IP> and <IP>")
    assert(r(2).getAs[String]("text_redacted") == "nothing sensitive here")
    assert(r(3).getAs[String]("text_redacted") == "call <PHONE> now")
    assert(r(4).getAs[String]("text_redacted") == "serial 1234-5678 and 1234.5.6.7 stay")
    assert(r(4).getAs[Long]("n_phones") == 0 && r(4).getAs[Long]("n_ipv4") == 0)
  }

  // ---- normalization / blocklist ------------------------------------------

  test("normalize lowercases, strips punctuation, collapses whitespace") {
    val df = Seq("  Hello,   WORLD!! 42 ", "a\t\nb", "§§§").toDF("text")
    val out = df.select(TextAnalysis.normalize($"text")).collect().map(_.getString(0))
    assert(out.toSeq == Seq("hello world 42", "a b", ""))
    // normalization makes case/punct variants collide on the dedup key
    val fp = Seq("The cat!", "the CAT", "the dog").toDF("text")
      .select(md5(TextAnalysis.normalize($"text"))).collect().map(_.getString(0))
    assert(fp(0) == fp(1) && fp(0) != fp(2))
  }

  test("blocklist flags token membership, not substrings") {
    val df = Seq(
      (1L, "the assassin class"), // "ass" must NOT trip via substring
      (2L, "clean words only"),
      (3L, "BAD Bad bad")         // case-insensitive, counted per token
    ).toDF("doc_id", "text")
    val r = TextAnalysis.withBlocklistFlag(df, Seq("ass", "bad"))
      .orderBy("doc_id").collect()
    assert(r(0).getAs[Long]("n_blocked") == 0 && r(0).getAs[Boolean]("keep_clean"))
    assert(r(1).getAs[Boolean]("keep_clean"))
    assert(r(2).getAs[Long]("n_blocked") == 3 && !r(2).getAs[Boolean]("keep_clean"))
    // empty blocklist (nothing configured) → everything is clean, no crash
    val none = TextAnalysis.withBlocklistFlag(df, Seq.empty).collect()
    assert(none.forall(_.getAs[Boolean]("keep_clean")))
  }

  // ---- sampling -----------------------------------------------------------

  test("hashSample is deterministic, stable under appends, and ~fraction") {
    val df = spark.range(0, 2000).select($"id".as("doc_id"))
    val s1 = Sampling.hashSample(df, $"doc_id", 0.3).collect().map(_.getLong(0)).toSet
    val s2 = Sampling.hashSample(df, $"doc_id", 0.3).collect().map(_.getLong(0)).toSet
    assert(s1 == s2) // deterministic
    assert(math.abs(s1.size - 600) < 100) // ~30%
    // appending rows never evicts previously selected ones
    val grown = spark.range(0, 3000).select($"id".as("doc_id"))
    val s3 = Sampling.hashSample(grown, $"doc_id", 0.3).collect().map(_.getLong(0)).toSet
    assert(s1.subsetOf(s3))
    // a different salt decorrelates the selection
    val s4 = Sampling.hashSample(df, $"doc_id", 0.3, salt = "other")
      .collect().map(_.getLong(0)).toSet
    assert(s4 != s1)
  }

  test("stratifiedHashSample applies per-stratum rates") {
    val df = spark.range(0, 1000)
      .select($"id".as("doc_id"), when($"id" % 2 === 0, "a").otherwise("b").as("g"))
    val out = Sampling.stratifiedHashSample(df, $"g", $"doc_id", Map("a" -> 1.0, "b" -> 0.0))
    val langs = out.select("g").distinct().as[String].collect().toSet
    assert(langs == Set("a")) // rate 0 drops the whole stratum
    assert(out.count() == 500)
  }

  test("reservoirPerKey emits exactly n per stratum, deterministically") {
    val df = spark.range(0, 500)
      .select($"id".as("doc_id"), ($"id" % 5).cast("string").as("g"))
    val out = Sampling.reservoirPerKey(df, $"g", $"doc_id", n = 7)
    val sizes = out.groupBy("g").count().as[(String, Long)].collect().toMap
    assert(sizes.values.toSet == Set(7L))
    val again = Sampling.reservoirPerKey(df, $"g", $"doc_id", n = 7)
    assert(out.orderBy("g", "doc_id").collect().toSeq ==
      again.orderBy("g", "doc_id").collect().toSeq)
  }

  test("mixturePlan allocates the budget proportionally to token share") {
    val df = Seq(("a", 300L), ("a", 300L), ("b", 400L)).toDF("g", "n")
    val r = Sampling.mixturePlan(df, $"g", $"n", budget = 100L)
      .orderBy("stratum").collect()
    assert(r(0).getAs[String]("stratum") == "a")
    assert(r(0).getAs[Long]("stratum_tokens") == 600L)
    assert(r(0).getAs[Long]("alloc_tokens") == 60L)
    assert(r(1).getAs[Long]("alloc_tokens") == 40L)
  }

  test("mixturePlanTemperature flattens toward uniform as tau grows") {
    val df = Seq(("a", 8100L), ("b", 100L)).toDF("g", "n")
    // tau=1 is the proportional plan: a gets 8100/8200 of the budget
    val t1 = Sampling.mixturePlanTemperature(df, $"g", $"n", budget = 1000L, tau = 1.0)
      .orderBy("stratum").collect()
    assert(t1(0).getAs[Long]("weight") == 8100L)
    assert(t1(0).getAs[Long]("alloc_tokens") == (1000.0 * 8100 / 8200).floor.toLong)
    // tau=2: weights sqrt(8100)=90 vs sqrt(100)=10 → 900/100 split
    val t2 = Sampling.mixturePlanTemperature(df, $"g", $"n", budget = 1000L, tau = 2.0)
      .orderBy("stratum").collect()
    assert(t2(0).getAs[Long]("weight") == 90L)
    assert(t2(1).getAs[Long]("weight") == 10L)
    assert(t2(0).getAs[Long]("alloc_tokens") == 900L)
    assert(t2(1).getAs[Long]("alloc_tokens") == 100L)
    // the flattened plan gives the small stratum strictly more than proportional
    assert(t2(1).getAs[Long]("alloc_tokens") > t1(1).getAs[Long]("alloc_tokens"))
  }

  // ---- passage-level duplication ------------------------------------------

  test("crossDocShingleStats flags shared passages only") {
    val shared = "one two three four five six seven eight"
    val df = Seq(
      (1L, s"intro $shared tail one"),
      (2L, s"other lead-in $shared closing words here"),
      (3L, "completely different content with no overlap at all nine ten"),
      (4L, "tiny")).toDF("doc_id", "text")
    val r = graft.dedup.Dedup.crossDocShingleStats(df, n = 8)
      .orderBy("doc_id").collect()
    assert(r(0).getAs[Long]("n_dup_shingles") == 1) // exactly the shared 8-gram
    assert(r(1).getAs[Long]("n_dup_shingles") == 1)
    assert(r(2).getAs[Long]("n_dup_shingles") == 0)
    assert(r(3).getAs[Long]("n_shingles") == 0)     // < 8 tokens → no shingles
    assert(r(3).getAs[Double]("cross_dup_frac") == 0.0)
  }

  // ---- packing ------------------------------------------------------------

  test("packGreedy respects capacity and never splits or drops rows") {
    val rows = (0L until 100L).map(i => (i, "g" + (i % 3), 10L + (i % 7) * 13L))
    val df = rows.toDF("doc_id", "g", "sz")
    val out = Packing.packGreedy(df, "g", "doc_id", "sz", capacity = 120L)
      .select("doc_id", "g", "sz", "pack_id", "pack_pos").collect()
    assert(out.length == 100) // nothing dropped or duplicated
    assert(out.map(_.getLong(0)).toSet == rows.map(_._1).toSet)
    // per (group, pack): total size within capacity, positions contiguous
    val byPack = out.groupBy(r => (r.getString(1), r.getLong(3)))
    byPack.foreach { case ((g, _), rs) =>
      assert(rs.map(_.getLong(2)).sum <= 120L, s"overfull pack in $g")
      assert(rs.map(_.getLong(4)).sorted.toSeq == (0L until rs.length).toSeq)
    }
    // greedy invariant: within a group, consecutive packs in doc_id order
    val g0 = out.filter(_.getString(1) == "g0").sortBy(_.getLong(0))
    assert(g0.map(_.getLong(3)).toSeq == g0.map(_.getLong(3)).toSeq.sorted)
  }

  test("packGreedy matches a sequential reference on seeded random inputs") {
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 5) {
      val cap = 50L + rnd.nextInt(200)
      val rows = (0L until (20 + rnd.nextInt(200)).toLong).map { i =>
        (i, "g" + rnd.nextInt(4), 1L + rnd.nextInt(2 * cap.toInt))
      }
      // sequential reference: greedy scan per group in doc_id order
      val expected = rows.groupBy(_._2).flatMap { case (_, rs) =>
        var cum = 0L; var pack = -1L
        rs.sortBy(_._1).map { case (id, g, sz) =>
          if (pack < 0 || cum + sz > cap) { pack += 1; cum = sz } else cum += sz
          (id, g, pack)
        }
      }.toSet
      val got = Packing.packGreedy(rows.toDF("doc_id", "g", "sz"),
        "g", "doc_id", "sz", cap)
        .select("doc_id", "g", "pack_id").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      assert(got == expected, s"trial $trial (cap=$cap) diverged from reference")
    }
  }

  test("packGreedySharded partitions work across shards without losing rows") {
    val rows = (0L until 200L).map(i => (i, "g" + (i % 2), 10L))
    val out = Packing.packGreedySharded(rows.toDF("doc_id", "g", "sz"),
      "g", "doc_id", "sz", capacity = 100L, shards = 4)
      .select("doc_id", "g", "pack_shard", "pack_id", "sz").collect()
    assert(out.length == 200)
    assert(out.map(_.getLong(0)).toSet == rows.map(_._1).toSet) // nothing lost
    val shardsUsed = out.map(_.getInt(2)).toSet
    assert(shardsUsed.size > 1, s"expected multiple shards, got $shardsUsed")
    // capacity holds within every (group, shard, pack)
    out.groupBy(r => (r.getString(1), r.getInt(2), r.getLong(3))).foreach {
      case (_, rs) => assert(rs.map(_.getLong(4)).sum <= 100L)
    }
  }

  test("packGreedy gives an oversized row its own pack") {
    val df = Seq((1L, "g", 50L), (2L, "g", 500L), (3L, "g", 50L)).toDF("doc_id", "g", "sz")
    val out = Packing.packGreedy(df, "g", "doc_id", "sz", capacity = 100L)
      .orderBy("doc_id").select("pack_id").as[Long].collect().toSeq
    assert(out == Seq(0L, 1L, 2L))
  }

  test("hashSplit is deterministic, exhaustive, and roughly proportional") {
    val df = spark.range(1, 2001).toDF("doc_id")
    val out = Sampling.hashSplit(df, col("doc_id"),
      weights = Seq(0.8, 0.1, 0.1), labels = Seq("train", "val", "test"))
    val counts = out.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet == Set("train", "val", "test"))
    assert(counts("train") > 1400 && counts("val") < 350 && counts("test") < 350)
    // stable under appends: the same doc keeps its split in a grown frame
    val grown = Sampling.hashSplit(spark.range(1, 4001).toDF("doc_id"),
      col("doc_id"), Seq(0.8, 0.1, 0.1), Seq("train", "val", "test"))
    val before = out.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val after = grown.filter(col("doc_id") < 2001).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(before == after)
  }

  test("mixtureTake fills each stratum budget in deterministic hash order") {
    val docs = Seq(
      (1L, "en", 40L), (2L, "en", 40L), (3L, "en", 40L), (4L, "en", 40L),
      (5L, "fr", 30L), (6L, "fr", 30L)).toDF("doc_id", "lang", "n_tokens")
    val budgets = Seq(("en", 80L), ("fr", 100L)).toDF("stratum", "alloc_tokens")
    val kept = Sampling.mixtureTake(docs, col("lang"), col("n_tokens"),
      col("doc_id"), budgets)
    val byLang = kept.collect().groupBy(_.getString(1))
    // en: exactly 2 docs fit the 80-token budget; fr: both fit
    assert(byLang("en").length == 2 && byLang("fr").length == 2)
    // deterministic: a second run selects the same documents
    val again = Sampling.mixtureTake(docs, col("lang"), col("n_tokens"),
      col("doc_id"), budgets).collect().map(_.getLong(0)).toSet
    assert(again == kept.collect().map(_.getLong(0)).toSet)
    // rows keep their original columns only
    assert(kept.columns.toSeq == Seq("doc_id", "lang", "n_tokens"))
  }

  test("two-phase mixtureTake equals the naive whole-stratum cumsum on random corpora") {
    import org.apache.spark.sql.expressions.Window
    // the reference semantics, as one whole-stratum running-sum window
    def naive(docs: org.apache.spark.sql.DataFrame,
              budgets: org.apache.spark.sql.DataFrame): Set[Long] = {
      val w = Window.partitionBy(col("lang"))
        .orderBy(Sampling.hashBucket(col("doc_id"), "mix", 1 << 30), col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      docs.withColumn("__cum", sum(col("n_tokens")).over(w))
        .join(budgets, col("lang") === col("stratum"))
        .filter(col("__cum") <= col("alloc_tokens"))
        .collect().map(_.getLong(0)).toSet
    }
    val rnd = new scala.util.Random(13)
    for (trial <- 1 to 4) {
      val langs = Seq("en", "fr", "de").take(1 + rnd.nextInt(3))
      val docs = (0 until 80 + rnd.nextInt(120)).map { i =>
        (i.toLong, langs(rnd.nextInt(langs.length)),
          // include zero-size rows: they ride along while cum <= budget
          (if (rnd.nextInt(10) == 0) 0L else 1L + rnd.nextInt(50).toLong))
      }.toDF("doc_id", "lang", "n_tokens")
      val budgets = langs.map(l => (l, rnd.nextInt(3) match {
        case 0 => 0L // nothing but leading zero-size rows fit
        case 1 => 100L + rnd.nextInt(400).toLong // boundary inside a bucket
        case _ => 1000000L // everything fits
      })).toDF("stratum", "alloc_tokens")
      val want = naive(docs, budgets)
      // small bucket counts force multi-bucket strata and boundary buckets
      for (buckets <- Seq(1, 4, 1024)) {
        val got = Sampling.mixtureTake(docs, col("lang"), col("n_tokens"),
          col("doc_id"), budgets, coarseBuckets = buckets)
          .collect().map(_.getLong(0)).toSet
        assert(got == want,
          s"trial $trial buckets=$buckets: missing=${want.diff(got)} extra=${got.diff(want)}")
      }
    }
  }

  // ---- weighted acceptance sampling ----------------------------------------

  test("weightedHashSample honors 0/1 weights exactly and is deterministic") {
    val rows = (1L to 400L).map(i => (i, if (i % 2 == 0) 1.0 else 0.0))
      .toDF("id", "w")
    val kept = Sampling.weightedHashSample(rows, col("id"), col("w"))
      .collect().map(_.getLong(0)).toSet
    assert(kept == (1L to 400L).filter(_ % 2 == 0).toSet) // w=1 always, w=0 never
    val again = Sampling.weightedHashSample(rows, col("id"), col("w"))
      .collect().map(_.getLong(0)).toSet
    assert(again == kept)
  }

  test("weightedHashSample acceptance rate tracks the weight") {
    val rows = (1L to 2000L).map(i => (i, 0.25)).toDF("id", "w")
    val n = Sampling.weightedHashSample(rows, col("id"), col("w")).count()
    assert(n > 2000 * 0.15 && n < 2000 * 0.35, s"0.25-weight kept $n of 2000")
    // out-of-range weights clamp rather than throw
    val clamped = (1L to 50L).map(i => (i, 7.5)).toDF("id", "w")
    assert(Sampling.weightedHashSample(clamped, col("id"), col("w")).count() == 50)
  }

  // ---- per-key quota cap ----------------------------------------------------

  test("capPerKey keeps quota(key) best rows per key, default for unknown keys") {
    val rows = Seq(
      ("a", 1L, 100L), ("a", 2L, 90L), ("a", 3L, 80L), ("a", 4L, 70L),
      ("b", 5L, 50L), ("b", 6L, 60L),
      ("c", 7L, 10L), ("c", 8L, 20L), ("c", 9L, 30L))
      .toDF("key", "id", "score")
    val quotas = Seq(("a", 2L), ("b", 5L)).toDF("key", "quota")
    val kept = Sampling.capPerKey(rows, "key",
      Seq(col("score").desc, col("id").asc), quotas, defaultQuota = 1L)
      .collect().map(_.getLong(1)).toSet
    // a: top-2 by score = {1, 2}; b: quota 5 > count → all; c: default 1 → best is 9
    assert(kept == Set(1L, 2L, 5L, 6L, 9L))
  }

  test("capPerKey tie-break and zero quota are deterministic") {
    val rows = Seq(("a", 1L, 10L), ("a", 2L, 10L), ("z", 3L, 1L))
      .toDF("key", "id", "score")
    val quotas = Seq(("z", 0L)).toDF("key", "quota")
    val kept = Sampling.capPerKey(rows, "key",
      Seq(col("score").desc, col("id").asc), quotas, defaultQuota = 1L)
      .collect().map(_.getLong(1)).toSet
    assert(kept == Set(1L)) // tie at 10 → min id; z capped to nothing
  }

  // ---- Gopher top-token rule ------------------------------------------------

  test("topTokenStats counts the most frequent token, min token on ties") {
    val df = Seq(
      (1L, "b b a a a"),  // a wins 3/5
      (2L, "x y"),        // tie → lexicographically smallest: x
      (3L, ""))           // empty → nulls/zeros
      .toDF("doc_id", "text")
    val r = TextAnalysis.topTokenStats(df).orderBy("doc_id").collect()
    assert(r(0).getAs[String]("top_token") == "a")
    assert(r(0).getAs[Long]("top_cnt") == 3L)
    assert(r(0).getAs[Long]("n_tokens") == 5L)
    assert(r(0).getAs[Double]("top_frac") == 0.6)
    assert(r(1).getAs[String]("top_token") == "x")
    assert(r(1).getAs[Double]("top_frac") == 0.5)
    assert(r(2).isNullAt(r(2).fieldIndex("top_token")))
    assert(r(2).getAs[Long]("top_cnt") == 0L)
    assert(r(2).getAs[Double]("top_frac") == 0.0)
  }

  // ---- deterministic shuffle ----------------------------------------------

  test("deterministicShuffle assigns each row a unique contiguous position") {
    val df = (1L to 500L).toDF("id")
    val r = Sampling.deterministicShuffle(df, col("id"), buckets = 8)
    val pos = r.select("pos").collect().map(_.getLong(0)).sorted.toSeq
    assert(pos == (1L to 500L))
    // not the identity order (it's a shuffle)
    val byPos = r.orderBy("pos").select("id").collect().map(_.getLong(0)).toSeq
    assert(byPos != (1L to 500L))
  }

  test("deterministicShuffle is reproducible and salt-sensitive") {
    val df = (1L to 200L).toDF("id")
    def order(salt: String) = Sampling.deterministicShuffle(df, col("id"), salt)
      .orderBy("pos").select("id").collect().map(_.getLong(0)).toSeq
    assert(order("epoch0") == order("epoch0"))
    assert(order("epoch0") != order("epoch1"))
  }

  test("deterministicShuffle bucket-offset rank equals the naive global rank") {
    val df = (1L to 300L).toDF("id")
    val two = Sampling.deterministicShuffle(df, col("id"), buckets = 16)
    val naive = df
      .withColumn("__h", Sampling.hashBucket(col("id"), "shuf", 1 << 30))
      .withColumn("pos", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("__h"), col("id"))).cast("long"))
    val a = two.orderBy("pos").select("id").collect().map(_.getLong(0)).toSeq
    val b = naive.orderBy("pos").select("id").collect().map(_.getLong(0)).toSeq
    assert(a == b)
  }

  test("percentRank matches SQL percent_rank incl. tie sharing and nulls") {
    import graft.operators.Sampling
    val df = Seq((1L, Some(5.0)), (2L, Some(1.0)), (3L, Some(5.0)),
      (4L, Some(9.0)), (5L, None)).toDF("id", "v")
    val out = Sampling.percentRank(df, "v").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(2)) null else r.getDouble(2))).toMap
    // n=4 non-null: 1.0→0/3, the tied 5.0s→1/3 each, 9.0→3/3; null stays null
    assert(out(2L) == 0.0 && out(4L) == 1.0 && out(5L) == null)
    assert(out(1L) == 1.0 / 3 && out(3L) == 1.0 / 3, out.toString)
    // the two-phase bucketing never changes the answer
    val one = Sampling.percentRank(df, "v", buckets = 1).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(2)) null else r.getDouble(2))).toMap
    assert(one == out)
    // single-row and empty inputs degrade safely
    assert(Sampling.percentRank(df.limit(0), "v").count() == 0)
    val solo = Sampling.percentRank(df.filter(col("id") === 4), "v").head()
    assert(solo.getDouble(2) == 0.0)
    // grouped: each stratum normalizes against its own n
    val g = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 10.0), ("b", 20.0))
      .toDF("g", "v")
    val gr = Sampling.percentRank(g, "v", groupCols = Seq("g")).collect()
      .map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    assert(gr == Map(("a", 1.0) -> 0.0, ("a", 2.0) -> 0.5, ("a", 3.0) -> 1.0,
      ("b", 10.0) -> 0.0, ("b", 20.0) -> 1.0), gr.toString)
  }

  test("negativeSample draws deterministic bucket-probed negatives, never the anchor") {
    val corpus = spark.range(200).toDF("id")
    val anchors = corpus.filter(col("id") < 10)
    val out = Sampling.negativeSample(anchors, corpus, "id", "id", k = 3, buckets = 8)
    val rows = out.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    // ≤ k draws per anchor, no self-negatives, draw ids in 1..k
    val perAnchor = rows.groupBy(_._1)
    assert(perAnchor.keySet == (0L until 10L).toSet)
    assert(rows.forall { case (a, j, n) => n != a && j >= 1 && j <= 3 })
    assert(perAnchor.values.forall(_.length <= 3))
    // with 8 buckets over 200 candidates every draw finds SOME candidate
    assert(rows.length == 30)
    // reproducible; different salt draws differently somewhere
    val again = Sampling.negativeSample(anchors, corpus, "id", "id", k = 3, buckets = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(again.sorted.toSeq == rows.sorted.toSeq)
    val other = Sampling.negativeSample(anchors, corpus, "id", "id", k = 3,
        buckets = 8, salt = "neg2")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(other.sorted.toSeq != rows.sorted.toSeq)
  }

  test("splitLeakage flags groups spanning splits; group-keyed splits are clean") {
    import graft.operators.Sampling
    val rows = Seq(
      (1L, 10L), (2L, 10L), (3L, 10L), // user 10: three events
      (4L, 20L), (5L, 20L),            // user 20: two events
      (6L, 30L)                        // user 30: one event
    ).toDF("event_id", "user_id")
    // per-EVENT split: user groups can span splits -> must be flagged
    val byEvent = Sampling.hashSplit(rows, col("event_id"),
      Seq(0.5, 0.5), Seq("train", "test"))
    val leaks = Sampling.splitLeakage(byEvent, col("user_id"), col("split"))
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getString(3))).toList
    // every flagged group genuinely spans >1 split, sorted split list
    assert(leaks.forall { case (_, n, s) => n > 1 && s == "test,train" }, leaks.toString)
    // per-USER split of the same rows: zero leakage by construction
    val byUser = Sampling.hashSplit(rows, col("user_id"),
      Seq(0.5, 0.5), Seq("train", "test"))
    assert(Sampling.splitLeakage(byUser, col("user_id"), col("split")).count() == 0)
  }
}
