package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs the headline queries on
  * SPARK_GRAFT_SF_DIR at local[32] and prints ONE JSON line
  * {"metric":…,"value":N,"unit":"sec","queries":{…},"sf":…}.
  *
  * Headline set = the queries that represent the engine's hot paths
  * (scan+agg, exact distinct, joins, CUBE family, window top-N, word count,
  * dedup/similarity extensions) — excludes table-write operators
  * (q33_blockgen) whose cost is dominated by the one-time bucketed write.
  */
object Bench {
  val headline: Seq[String] = Seq(
    "q10_groupby",
    "q12_count_distinct",
    "q15_join_merge",
    "q16_join_hash",
    "q21_cube",
    "q55_cube_wide",
    "q24_cube_count_distinct",
    "q26_duple_cube",
    "q28_topn",
    "q34_wordcount",
    "q40_dedup_ngram",
    "q41_dedup_minhash",
    "q44_ann_brute",
    "q83_join_asof",
    "q86_chunk",
    "q90_mixture_take",
    "q93_duplicate_spans",
    "q101_edit_join",
    "q113_minhash_batch_index",
    "q114_lm_score",
    "q115_bm25",
    "q116_lm_backoff",
    "q120_cut_spans",
    "q124_domain_cap",
    "q127_det_shuffle",
    "q128_paragraph_dedup",
    "q129_semdedup",
    "q131_kmv_distinct",
    "q134_quantile_sketch",
    "q135_semdedup_batch_index",
    "q136_strip_markup",
    "q137_script_profile",
    "q139_winnow",
    "q141_gopher_quality",
    "q142_dedup_prefix",
    "q145_url_dedup",
    "q146_kmv_setops",
    "q147_gap_fill",
    "q148_winsorize",
    "q150_funnel",
    "q153_transitions",
    "q155_triangles",
    "q156_corr_matrix",
    "q159_kcore",
    "q161_concurrency",
    "q162_skyline",
    "q164_feature_hash",
    "q165_mad_outliers",
    "q166_percent_rank",
    "q167_chi_square",
    "q169_snapshot_diff",
    "q170_attribution",
    "q171_decayed_counts",
    "q173_feature_hash_tfidf",
    "q174_linear_trend",
    "q175_concurrency_by",
    "q176_decayed_stats",
    "q179_funnel_single",
    // round-7 additions (q180_upsert excluded like q33: cost is the
    // one-time partitioned table write, not the operator)
    "q181_seasonal_anomaly",
    "q182_negative_sample",
    "q183_time_weighted_avg",
    "q184_quantile_match",
    "q186_margin_mine",
    "q188_cusum_drift",
    "q189_sorted_neighborhood",
    "q190_scd_join",
    "q191_kaplan_meier",
    // round-8 additions (rubix/upsert queries excluded like q33/q180:
    // their cost is the one-time dataset write, not the operator)
    "q196_crosscorpus_prefix",
    "q197_retrieval_metrics",
    "q198_drift",
    "q199_pagerank",
    "q200_calibration",
    "q201_label_prop",
    "q202_split_leakage",
    "q203_did",
    // round-9 additions: the iterative data-selection family (k driver
    // rounds of narrow literal-scored scans — the bench tracks their
    // fixed per-round cost the way q199/q201 track the graph loops)
    "q208_kcenter_greedy",
    "q209_mmr_select",
    // round-17 additions: the r15/r16 correctness-only paths join the
    // trend record (cross-round matched-set reads restrict to the common
    // 77 — BASELINE.md round 17)
    "q212_ovr_score",
    "q213_union_screen")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // Optional comma-separated subset (e.g. the round-5 matched-22) so a
    // regression can be re-measured in an isolated JVM without the full
    // suite's GC/code-cache pressure.
    val selected: Seq[String] = sys.env.get("SPARK_GRAFT_BENCH_QUERIES") match {
      case Some(csv) if csv.trim.nonEmpty =>
        val want = csv.split(',').map(_.trim).filter(_.nonEmpty).toSet
        // any SparkEntry query is selectable in subset mode (the scale
        // sweeps measure some non-headline variants, e.g. q178_skyline3);
        // headline order first, then the extras in name order
        headline.filter(want.contains) ++
          (want -- headline.toSet).toSeq.sorted.filter(SparkEntry.queries.contains)
      case _ => headline
    }
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      // shuffle-partition policy knobs (same defaults as GraftSession:
      // ceiling = cpus, advisory 64m — the fixed-count behavior, which the
      // round-15 sf100 interleaved A/B measured as the winner on one JVM;
      // see GraftSession.scala and SCALING.md round 15). There is NO
      // automatic byte-based sizing: SPARK_GRAFT_INITIAL_PARTITIONS raises
      // the ceiling for partitions-∝-bytes sweeps; SPARK_GRAFT_ADVISORY
      // sets the per-partition byte target (memory-per-core emulation).
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        sys.env.getOrElse("SPARK_GRAFT_INITIAL_PARTITIONS", cpus))
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes",
        sys.env.getOrElse("SPARK_GRAFT_ADVISORY", "64m"))
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      .config("spark.ui.enabled", "false")
    // Scan-split size override for scale measurement on multi-row-group
    // fixtures (dev/gen_rowgroups.py). The default 128 MB is byte-based
    // packing; the compressed-text tables are CPU-bound at tiny byte
    // sizes (documents at sf10 = 6 MB for 5M rows), so splitting them
    // across cores needs a much smaller target — the same
    // maxPartitionBytes tuning a CPU-heavy scan needs on a real cluster.
    // Row groups are the split GRANULARITY (a one-row-group file is one
    // task no matter what this is set to); this knob is the split SIZE.
    val spark = sys.env.get("SPARK_GRAFT_MAX_PARTITION_BYTES")
      .filter(_.trim.nonEmpty)
      .fold(builder)(b => builder.config("spark.sql.files.maxPartitionBytes", b.trim))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // warm the JVM + parquet footers once so per-query numbers measure the
    // query, not first-touch class loading
    SparkEntry.queries("q10_groupby")(spark, sfDir).count()

    // q115 measures the PRODUCTION retrieval shape: the index is built and
    // persisted once (untimed setup — indexing is a separate, amortized
    // job), the timed query scores the stored postings/lengths/df tables.
    // The verify-gate q115 keeps the inline build so the oracle replays
    // one lineage; only the bench shape differs.
    val bm25Dir = java.nio.file.Files.createTempDirectory("graft-bm25").toString
    graft.text.Search.save(graft.text.Search.bm25Index(
      spark.read.parquet(s"$sfDir/documents.parquet")), bm25Dir)
    // q135 likewise: the corpus cell index is a one-time persisted artifact
    // (the whole point of the incremental path); the timed query screens a
    // batch against the STORED index
    import org.apache.spark.sql.functions.col
    val semDir = java.nio.file.Files.createTempDirectory("graft-semidx").toString
    locally {
      val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      val cents = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("centroid_id"), col("embedding").as("cvec"))
      graft.dedup.Dedup.semDedupIndex(emb.filter(col("vec_id") >= 100), cents)
        .write.mode("overwrite").parquet(s"$semDir/index")
      cents.write.mode("overwrite").parquet(s"$semDir/cents")
    }
    val overrides: Map[String, (SparkSession, String) => org.apache.spark.sql.DataFrame] = Map(
      "q115_bm25" -> ((s, _) =>
        graft.text.Search.bm25TopK(graft.text.Search.load(s, bm25Dir),
          SparkEntry.bm25Terms, k = 50)
          .select("doc_id", "score_q", "n_terms", "rank")),
      "q135_semdedup_batch_index" -> ((s, d) =>
        graft.dedup.Dedup.semDedupAgainstIndex(
          s.read.parquet(s"$d/embeddings.parquet").filter(col("vec_id") < 100),
          s.read.parquet(s"$semDir/index"), s.read.parquet(s"$semDir/cents"),
          threshold = 0.45)
          .select("vec_id", "centroid_id")))

    // best-of-3 per query: later runs reuse compiled codegen classes
    // (JIT/codegen warmup excluded — measured still settling on run 2)
    // while every run re-reads parquet, re-plans, re-shuffles, and
    // re-broadcasts — standard warm single-node throughput methodology
    // computed ONCE: the timing loop and the archive's "consume" field must
    // never drift apart on which body produced the numbers
    val consume =
      if (sys.env.get("SPARK_GRAFT_BENCH_CONSUME").contains("count")) "count" else "noop"
    val rawRuns = scala.collection.mutable.LinkedHashMap.empty[String, Seq[Double]]
    val results = selected.map { name =>
      val fn = overrides.getOrElse(name, SparkEntry.queries(name))
      // a failed query must never masquerade as a fast one: record -1 and
      // log loudly instead of timing the distance to the exception
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        try {
          // materialize the FULL output via the noop sink, never count():
          // count() lets Catalyst prune the output project and then
          // eliminate cardinality-preserving left joins wholesale —
          // q120_cut_spans benched at 0.11 s while CONTAINING
          // q93_duplicate_spans' 0.66 s of work (its entire span-detection
          // side was optimized away under count). The noop write sinks
          // every output column, so the number measures producing the
          // result (round-13 methodology; totals shift up slightly vs
          // count()-based rounds — BASELINE.md records the change).
          // SPARK_GRAFT_BENCH_CONSUME=count restores the old body for
          // same-session methodology A/Bs only.
          if (consume == "count")
            fn(spark, sfDir).count()
          else
            fn(spark, sfDir).write.mode("overwrite").format("noop").save()
          (System.nanoTime() - t0) / 1e9
        } catch {
          case e: Throwable =>
            System.err.println(s"BENCH FAIL $name: ${e.getClass.getName}: " +
              String.valueOf(e.getMessage).linesIterator.take(1).mkString)
            -1.0
        }
      }
      rawRuns(name) = times
      name -> (if (times.exists(_ >= 0)) times.filter(_ >= 0).min else -1.0)
    }
    val qs = results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val line = f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    println(line)
    // Self-archive the full result set: the driver's BENCH_rN.json keeps
    // only a truncated stdout tail (r13/r14 both lost q01–q11 per-query
    // numbers to the pipe), so the one JSON line above is ALSO written to a
    // file — same content plus the per-run raw times — making the
    // cross-round trend record machine-parseable without tail regexing.
    // run.sh cds to the repo root, so the default lands beside dev/.
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_results.json")
    try {
      val runsJson = results.map { case (k, _) =>
        "\"" + k + "\":[" + rawRuns(k).map(t => f"$t%.3f").mkString(",") + "]"
      }.mkString("{", ",", "}")
      // per-query stability: max/min over the WARM raw runs — run 1 is
      // excluded when all runs succeeded, because it is codegen/JIT
      // warmup and dominates every query's max (measured: the suite's
      // largest all-runs ratios were uniformly run-1 artifacts), which
      // min-of-3 already discards. 1.0 = perfectly stable;
      // q201_label_prop has shown 1.39 WARM spread inside one session.
      // Lets cross-round trend reads weight by stability mechanically.
      val spreadJson = results.map { case (k, _) =>
        val raw = rawRuns(k)
        // run 1 is warmup whenever it RAN (succeeded), regardless of how
        // later runs fared — a later-run failure must not smuggle the
        // cold run-1 time back into the warm-only ratio
        val ok = (if (raw.size >= 3 && raw.headOption.exists(_ >= 0)) raw.tail else raw)
          .filter(_ >= 0)
        val ratio = if (ok.size >= 2 && ok.min > 0) ok.max / ok.min else -1.0
        "\"" + k + f"\":$ratio%.3f"
      }.mkString("{", ",", "}")
      // cpus stays a JSON number when numeric (matching the r15-era rows;
      // r16's rows are quoted strings — trend reads coerce); only a
      // non-numeric setting like SPARK_GRAFT_CPUS="*" (valid for local[*])
      // is quoted to keep the JSON well-formed
      // round-trip through Int so "08" (leading zero — illegal JSON) and
      // non-ASCII Unicode digits are quoted, not emitted as bare tokens
      val cpusJson = if (cpus.toIntOption.map(_.toString).contains(cpus)) cpus
        else "\"" + cpus + "\""
      val full =
        f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"runs":$runsJson,"spread":$spreadJson,"sf":"$sfDir","cpus":$cpusJson,"consume":"$consume"}"""
      java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
        (full + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    } catch {
      case e: Throwable =>
        System.err.println(s"BENCH ARCHIVE FAIL $outPath: ${e.getMessage}")
    }
    spark.stop()
  }
}
