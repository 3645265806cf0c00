package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: decompose where wall time goes in the slow headline queries by
  * timing successively larger fragments of each pipeline (best of 3 warm
  * runs, same session settings as Bench). Usage:
  *   SPARK_GRAFT_SF_DIR=... dev/run.sh graft.Profile
  */
object Profile {
  // SPARK_GRAFT_PROFILE_ONLY=q101 runs just the sections whose labels
  // contain the token — a 10x-scale dataset makes the full battery slow
  private val only = sys.env.get("SPARK_GRAFT_PROFILE_ONLY").map(_.trim).filter(_.nonEmpty)

  private def time(label: String)(f: => Long): Unit = {
    if (only.forall(label.contains)) {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); val n = f; ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"PROFILE ${ts.map(_._1).min}%8.3f s  rows=${ts.head._2}%-9d $label")
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.builder(cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t(n: String): DataFrame = Tables.load(spark, sfDir, n)

    // warm
    t("lineitem").count()

    def noop(df: DataFrame): Long = { df.write.mode("overwrite").format("noop").save(); 0L }

    time("lineitem bare count")(t("lineitem").count())
    time("lineitem scan 6 cols agg 4 keys (q55 leaf, noop)") {
      noop(t("lineitem").groupBy(col("l_returnflag"), col("l_linestatus"),
        col("l_linenumber"), year(col("l_shipdate")).as("ship_year"))
        .agg(count(lit(1)), sum("l_orderkey"), min("l_quantity"), max("l_quantity")))
    }
    time("q55 leaf without year() (noop)") {
      noop(t("lineitem").groupBy(col("l_returnflag"), col("l_linestatus"),
        col("l_linenumber"))
        .agg(count(lit(1)), sum("l_orderkey"), min("l_quantity"), max("l_quantity")))
    }
    // deliberate count-vs-noop probe pair (kept as the historical r5-era
    // comparison; the preagg/AQE toggles below are count-based too)
    time("q55 full (count)")(SparkEntry.queries("q55_cube_wide")(spark, sfDir).count())
    time("q55 full (noop)")(noop(SparkEntry.queries("q55_cube_wide")(spark, sfDir)))
    locally {
      val df = SparkEntry.queries("q55_cube_wide")(spark, sfDir)
      time("q55 count only (pre-built df)")(df.count())
    }
    time("q55 leaf+expand by hand (noop)") {
      val leaf = t("lineitem").groupBy(col("l_returnflag"), col("l_linestatus"),
        col("l_linenumber"), year(col("l_shipdate")).as("ship_year"))
        .agg(count(lit(1)).as("pc"), sum("l_orderkey").as("ps"),
          min("l_quantity").as("pmn"), max("l_quantity").as("pmx"))
      noop(leaf.cube(col("l_returnflag"), col("l_linestatus"), col("l_linenumber"), col("ship_year"))
        .agg(sum("pc").as("n_rows"), sum("ps").as("sum_key"),
          min("pmn").as("min_qty"), max("pmx").as("max_qty")))
    }
    spark.conf.set("spark.graft.cube.preagg", "false")
    time("q55 full WITHOUT preagg rule")(SparkEntry.queries("q55_cube_wide")(spark, sfDir).count())
    spark.conf.set("spark.graft.cube.preagg", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    time("q55 full AQE off")(SparkEntry.queries("q55_cube_wide")(spark, sfDir).count())
    time("q15 full AQE off")(SparkEntry.queries("q15_join_merge")(spark, sfDir).count())
    spark.conf.set("spark.sql.adaptive.enabled", "true")

    val li = t("lineitem"); val ord = t("orders")
    time("q15 merge join only") {
      graft.operators.Joins.mergeJoin(
        li.withColumnRenamed("l_orderkey", "o_orderkey"), ord, Seq("o_orderkey")).count()
    }
    locally {
      import graft.operators.Joins
      val cust = t("customer"); val nat = t("nation"); val reg = t("region")
      def j1 = Joins.mergeJoin(li.withColumnRenamed("l_orderkey", "o_orderkey"), ord, Seq("o_orderkey"))
      def j2 = Joins.rsJoin(j1.withColumnRenamed("o_custkey", "c_custkey"), cust, Seq("c_custkey"))
      def j3 = Joins.hashJoin(j2.withColumnRenamed("c_nationkey", "n_nationkey"), nat, Seq("n_nationkey"))
      def j4 = Joins.hashJoin(j3.withColumnRenamed("n_regionkey", "r_regionkey"), reg, Seq("r_regionkey"))
      time("q15 j1+j2 (SMJ + rs cust)")(j2.count())
      time("q15 j1..j4 no agg")(j4.count())
      time("q15 j1..j4 + agg (noop)")(noop(
        j4.groupBy("r_name").agg(count(lit(1)).as("n_rows"), sum("l_quantity").as("sum_qty"))))
    }
    time("q15 full (count)")(SparkEntry.queries("q15_join_merge")(spark, sfDir).count())
    time("q15 full (noop)")(noop(SparkEntry.queries("q15_join_merge")(spark, sfDir)))

    time("q40 full")(noop(SparkEntry.queries("q40_dedup_ngram")(spark, sfDir)))
    locally {
      import graft.functions.PortableHash
      val base = t("documents").filter(col("doc_id") % 5 === 0)
        .select(col("doc_id"), PortableHash.tokenHashes(col("text")).as("__th"))
        .filter(size(col("__th")) >= 2)
        .select(col("doc_id"), graft.functions.expressions.NativeExpressions.shingleHashSet(
          col("__th"), 2, PortableHash.B, PortableHash.P).as("__shs"))
      val sh = base.select(col("doc_id"), size(col("__shs")).as("n_sh"),
        explode(col("__shs")).as("shingle"))
      val a = sh.hint("shuffle_hash").as("a"); val b = sh.as("b")
      time("q40 shuffle-hash self-join (ReuseExchange?)") {
        a.join(b, col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
          .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
            col("a.n_sh").as("n_a"), col("b.n_sh").as("n_b"))
          .agg(count(lit(1)).as("common"))
          .withColumn("jaccard",
            col("common").cast("double") / (col("n_a") + col("n_b") - col("common")))
          .filter(col("jaccard") >= 0.05)
          .count()
      }
    }
    time("q41 full")(noop(SparkEntry.queries("q41_dedup_minhash")(spark, sfDir)))
    time("q16 full")(noop(SparkEntry.queries("q16_join_hash")(spark, sfDir)))
    time("q10 full")(noop(SparkEntry.queries("q10_groupby")(spark, sfDir)))

    // (the per-ROW FastSS decomposition that used to sit here measured the
    // pre-round-13 operator shape — editDistanceJoin now dedupes keys
    // first; see the "q101 decomposition" section below)
    time("q93 full")(noop(SparkEntry.queries("q93_duplicate_spans")(spark, sfDir)))

    // q93 decomposition: position explode vs hot-count vs hot-join vs window
    locally {
      import graft.functions.PortableHash
      val n = 8
      val pos = t("documents")
        .select(col("doc_id"), PortableHash.tokenHashes(col("text")).as("__th"))
        .filter(size(col("__th")) >= n)
        .select(col("doc_id"),
          posexplode(PortableHash.shingleHashes(col("__th"), n)).as(Seq("__i0", "__h")))
        .select(col("doc_id"), (col("__i0") + 1).as("__i"), col("__h"))
      time("q93 pos explode only (noop)")(noop(pos))
      val hot = pos.groupBy("__h").agg(count(lit(1)).as("__c"))
        .filter(col("__c") >= 2).select("__h")
      time("q93 hot count only")(hot.count())
      val dup = pos.join(hot, Seq("__h")).select(col("doc_id"), col("__i"))
      time("q93 + hot join (noop)")(noop(dup))
    }
    time("q90 full")(noop(SparkEntry.queries("q90_mixture_take")(spark, sfDir)))

    // q162 decomposition: grid-bin pass vs candidate checkpoint vs refine
    locally {
      import graft.operators.{Relational, Sketches}
      val p = t("part").select("p_partkey", "p_size", "p_retailprice")
      time("q162 part bare count")(p.count())
      val b0 = Sketches.quantileBins(
        p.withColumn("__v0", col("p_retailprice").cast("double")), "__v0",
        col("__v0"), Nil, 8)
      time("q162 one quantileBins pass (noop)")(noop(b0))
      val b1 = Sketches.quantileBins(
        b0.withColumn("__v1", -col("p_size").cast("double")), "__v1",
        col("__v1"), Nil, 8)
      time("q162 both bins (noop)")(noop(b1))
      time("q162 full")(Relational.skyline(p,
        maxCols = Seq("p_retailprice"), minCols = Seq("p_size")).count())
    }
    time("q161 full")(noop(SparkEntry.queries("q161_concurrency")(spark, sfDir)))
    // r17: the pre-r17 concurrency form inline (range probe over the
    // boundary aggregate, no checkpoint) vs the shipped one
    time("q161 old-form inline") {
      val us = expr("unix_micros(cast(ts as timestamp))")
      val iv = t("events").select(us.as("st"),
        (us + floor(col("value") * lit(6.0e7)).cast("long")).as("en"))
      val deltas = iv
        .select(col("st").cast("long").as("t"), lit(1L).as("__d"))
        .unionAll(iv.select(col("en").cast("long").as("t"), lit(-1L).as("__d")))
        .groupBy(col("t")).agg(sum("__d").as("net"))
      val range = deltas.agg(min("t"), max("t")).head()
      val tMin = range.getLong(0)
      val width = math.max((range.getLong(1) - tMin) / 1024 + 1, 1L)
      val b = deltas.withColumn("__b", ((col("t") - tMin) / width).cast("int"))
      val ow = org.apache.spark.sql.expressions.Window
        .partitionBy().orderBy("__b")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      val offs = b.groupBy(col("__b")).agg(sum("net").as("__n"))
        .withColumn("__off", coalesce(sum("__n").over(ow), lit(0L)))
        .select(col("__b"), col("__off"))
      val rw = org.apache.spark.sql.expressions.Window
        .partitionBy(col("__b")).orderBy("t")
      noop(b.join(broadcast(offs), Seq("__b"))
        .withColumn("concurrent", col("__off") + sum("net").over(rw))
        .select(col("t"), col("net"), col("concurrent")))
    }

    // q101 decomposition: distinct keys vs variant explode vs candidate
    // key-pair join vs verify vs id-group expansion. The whole block is
    // gated on its LABEL SET (not just its time() calls): the eager
    // localCheckpoint below would otherwise materialize the multi-million-
    // row candidate join even when SPARK_GRAFT_PROFILE_ONLY excludes q101
    val q101Labels = Seq("q101 distinct keys", "q101 variant explode (noop)",
      "q101 raw candidate key pairs", "q101 distinct only (isolated)",
      "q101 levenshtein only (isolated)", "q101 join+distinct composed (no lev)",
      "q101 verified key pairs", "q101 same-key id pairs", "q101 full")
    if (only.forall(t => q101Labels.exists(_.contains(t)))) locally {
      import graft.functions.expressions.NativeExpressions
      val keyed = t("documents").filter(col("doc_id") % 3 === 0)
        .select(col("doc_id"), substring(col("text"), 1, 16).as("__key"))
      val uniq = keyed.select("__key").distinct()
      time("q101 distinct keys")(uniq.count())
      val exploded = uniq.withColumn("__vh",
        explode(NativeExpressions.deletionVariantHashes(col("__key"), 2)))
      time("q101 variant explode (noop)")(noop(exploded))
      val a = exploded.as("a"); val b = exploded.as("b")
      val rawPairs = a.join(b,
        col("a.__vh") === col("b.__vh") && col("a.__key") < col("b.__key"))
        .select(col("a.__key").as("__ka"), col("b.__key").as("__kb"))
      time("q101 raw candidate key pairs")(rawPairs.count())
      // the isolated stages need the candidates materialized; gate the
      // eager checkpoint on THEIR labels so "ONLY=q101 full" doesn't pay
      // an untimed multi-million-row materialization it never reads
      if (only.forall(t => Seq("q101 distinct only (isolated)",
          "q101 levenshtein only (isolated)").exists(_.contains(t)))) {
        val rawMat = rawPairs.localCheckpoint()
        time("q101 distinct only (isolated)")(rawMat.distinct().count())
        time("q101 levenshtein only (isolated)")(rawMat
          .withColumn("dist", levenshtein(col("__ka"), col("__kb"), 2).cast("long"))
          .filter(col("dist") >= 0).count())
      }
      time("q101 join+distinct composed (no lev)")(rawPairs.distinct().count())
      val keyPairs = rawPairs.distinct()
        .withColumn("dist", levenshtein(col("__ka"), col("__kb"), 2).cast("long"))
        .filter(col("dist") >= 0)
      time("q101 verified key pairs")(keyPairs.count())
      val xx = keyed.as("x"); val yy = keyed.as("y")
      time("q101 same-key id pairs")(xx.join(yy,
        col("x.__key") === col("y.__key") && col("x.doc_id") < col("y.doc_id")).count())
      time("q101 full")(noop(SparkEntry.queries("q101_edit_join")(spark, sfDir)))
    }

    // q141 decomposition (round 14): which Gopher feature dominates the
    // per-row map once the scan parallelizes (multi-row-group fixture)?
    locally {
      import graft.text.TextAnalysis
      val salted = concat(col("text"),
        when(col("doc_id") % 3 === 0,
          lit("\n- bullet item\n- second bullet\n* third")).otherwise(lit("")),
        when(col("doc_id") % 4 === 0,
          lit("\ntrailing line...\nsecond trailer…")).otherwise(lit("")),
        when(col("doc_id") % 5 === 0, lit(" ## # ###")).otherwise(lit("")))
      val base = t("documents").select(col("doc_id"), salted.as("text"))
      val tc = col("text")
      val toks = TextAnalysis.tokens(tc)
      val lines = filter(split(tc, "\n"), l => trim(l) =!= "")
      time("q141 salted scan only (noop)")(noop(base))
      time("q141 tokenize only (noop)")(noop(base.select(col("doc_id"), size(toks).as("n"))))
      time("q141 mean_word_len fold (noop)")(noop(base.select(col("doc_id"),
        aggregate(toks, lit(0L), (acc, w) => acc + length(w)).as("s"))))
      time("q141 alpha rlike filter (noop)")(noop(base.select(col("doc_id"),
        size(filter(toks, w => w.rlike("[A-Za-z]"))).as("a"))))
      time("q141 line split+rlikes (noop)")(noop(base.select(col("doc_id"),
        size(filter(lines, l => trim(l).rlike("^[-*•]"))).as("b"),
        size(filter(lines, l => trim(l).rlike("(\\.\\.\\.|…)$"))).as("e"))))
      time("q141 symbol replaces (noop)")(noop(base.select(col("doc_id"),
        (length(tc) - length(replace(tc, lit("#"), lit("")))).as("h"),
        ((length(tc) - length(replace(tc, lit("..."), lit("")))) / lit(3) +
          (length(tc) - length(replace(tc, lit("…"), lit(""))))).as("e"))))
      time("q141 stop_hits (noop)")(noop(base.select(col("doc_id"),
        size(filter(array(TextAnalysis.defaultStopwords.map(lit): _*),
          w => array_contains(transform(toks, lower _), w))).as("s"))))
      time("q141 full")(noop(SparkEntry.queries("q141_gopher_quality")(spark, sfDir)))
    }

    // q61 decomposition (round 14): quality features + langid + filter
    locally {
      import graft.text.TextAnalysis
      val base = t("documents")
      time("q61 bare scan (noop)")(noop(base))
      time("q61 quality features only (noop)")(noop(TextAnalysis.withQualityFeatures(base)))
      time("q61 langid only (noop)")(noop(TextAnalysis.withLangId(base)))
      val toks = TextAnalysis.tokens(col("text"))
      time("q61 tokenize only (noop)")(noop(base.select(col("doc_id"), size(toks).as("n"))))
      time("q61 mean_token_len fold (noop)")(noop(base.select(col("doc_id"),
        aggregate(toks, lit(0L), (acc, w) => acc + length(w)).as("s"))))
      time("q61 stopword_ratio only (noop)")(noop(base.select(col("doc_id"),
        size(filter(transform(toks, lower _),
          w => array_contains(array(TextAnalysis.defaultStopwords.map(lit): _*), w))).as("s"))))
      time("q61 full")(noop(SparkEntry.queries("q61_quality_filter")(spark, sfDir)))
    }

    // q79 decomposition (round 14): which normalize stage dominates?
    locally {
      val base = t("documents").select(col("doc_id"), col("text"))
      time("q79 lower only (noop)")(noop(base.select(col("doc_id"), lower(col("text")).as("x"))))
      time("q79 charclass regex only (noop)")(noop(base.select(col("doc_id"),
        regexp_replace(lower(col("text")), "[^a-z0-9\\s]", " ").as("x"))))
      time("q79 ws-collapse regex only (noop)")(noop(base.select(col("doc_id"),
        regexp_replace(lower(col("text")), "\\s+", " ").as("x"))))
      time("q79 full normalize (noop)")(noop(base.select(col("doc_id"),
        graft.text.TextAnalysis.normalize(col("text")).as("x"))))
      time("q79 md5 only (noop)")(noop(base.select(col("doc_id"), md5(col("text")).as("x"))))
      time("q79 bisect: literal-z regex (noop)")(noop(base.select(col("doc_id"),
        regexp_replace(col("text"), "z", " ").as("x"))))
      time("q79 bisect: charclass no-lower (noop)")(noop(base.select(col("doc_id"),
        regexp_replace(col("text"), "[^a-z0-9\\s]", " ").as("x"))))
      time("q79 bisect: charclass-nospace (noop)")(noop(base.select(col("doc_id"),
        regexp_replace(col("text"), "[^a-z0-9 ]", " ").as("x"))))
      time("q79 bisect: translate (noop)")(noop(base.select(col("doc_id"),
        translate(col("text"), ".,!?", "    ").as("x"))))
      time("q79 bisect: scan partitions") {
        println(s"NUM_PARTITIONS=${base.rdd.getNumPartitions}"); 0L
      }
      time("q79 bisect: rdd-map same regex") {
        base.select(col("text")).rdd.mapPartitions { it =>
          val rx = java.util.regex.Pattern.compile("[^a-z0-9\\s]")
          it.map(r => rx.matcher(r.getString(0)).replaceAll(" ").length.toLong)
        }.sum().toLong
      }
      time("q79 full")(noop(SparkEntry.queries("q79_normalize")(spark, sfDir)))
    }

    // graphpin: re-assert the partial-agg-before-exchange pins on the
    // EXECUTED plan at whatever scale sfDir points to (the SkewStressSpec
    // pins prove the property on a synthetic 10^5-in-degree hub; this
    // section proves AQE keeps the same shape on the real scale fixtures
    // — e.g. /tmp/graft-gr100, where shared suppliers give ~10^5+
    // in-degree hubs). Prints GRAPHPIN OK/FAIL per query.
    val graphPins = Seq("graphpin q199_pagerank (contribution round)",
      "graphpin q201_label_prop (LPA round)", "graphpin q155_triangles",
      "graphpin q159_kcore")
    if (graphPins.exists(l => only.forall(l.contains))) {
      def pin(name: String, df: => DataFrame, needles: Seq[String]): Unit =
        if (only.forall(name.contains)) {
          val d = df
          // finalize AQE on THIS QueryExecution (a write would execute a
          // SEPARATE one and leave d.queryExecution at the initial,
          // never-replanned adaptive plan — the pin would pass vacuously)
          d.queryExecution.toRdd.foreach(_ => ())
          val plan = d.queryExecution.executedPlan.toString.toLowerCase
          val missing = needles.filterNot(plan.contains)
          println(if (missing.isEmpty) s"GRAPHPIN OK $name"
            else s"GRAPHPIN FAIL $name missing=${missing.mkString(",")}")
        }
      // q199/q201 unroll iterations behind localCheckpoints, so the final
      // executedPlan only shows the last fragment — pin the per-round
      // subplans (same shapes SkewStressSpec pins on the synthetic hub)
      // over the fixture's REAL cust-supp edges
      val edges = t("orders").select(col("o_orderkey"), col("o_custkey"))
        .join(t("lineitem").select(col("l_orderkey"), col("l_suppkey")),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("src"),
          (col("l_suppkey") + 1000000000000L).as("dst"))
        .distinct()
      val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
      val state = edges.select(col("src").as("node")).distinct()
        .select(col("node"), lit(9999L).as("r"))
        .join(deg.withColumnRenamed("src", "node"), Seq("node"), "left")
        .select(col("node"), col("r"), col("deg"))
      pin(graphPins(0),
        graft.operators.Matrix.prRound(edges, state, identity,
          base = 1499L, dampingPct = 85),
        Seq("partial_sum"))
      val labels = edges.select(col("src").as("node")).distinct()
        .select(col("node"), col("node").as("label"))
      pin(graphPins(1),
        graft.operators.Matrix.lpaRound(edges, labels, identity),
        Seq("partial_count", "partial_min"))
      pin(graphPins(2), SparkEntry.queries("q155_triangles")(spark, sfDir),
        Seq("partial_count"))
      pin(graphPins(3), SparkEntry.queries("q159_kcore")(spark, sfDir),
        Seq("partial_count"))
    }

    // q201 LPA argmax experiment (r17): the min(struct(-cnt,label)) winner
    // election plans as SortAggregate (struct buffers are not hash-
    // aggregable) — does an order-preserving decimal(38,0) linearization
    // ((-cnt)·2^64 + (label+2^63), hash-aggregable) beat the two keyed
    // sorts per round?
    locally {
      val edges = t("orders").select(col("o_orderkey"), col("o_custkey"))
        .join(t("lineitem").select(col("l_orderkey"), col("l_suppkey")),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("src"),
          (col("l_suppkey") + 1000000000L).as("dst"))
        .distinct().localCheckpoint()
      val labels = edges.select(col("src").as("node")).distinct()
        .select(col("node"), col("node").as("label")).localCheckpoint()
      // r17 round = decimal election + winner⋈labels LEFT join; r18 round
      // (the shipped lpaRound) folds the join into the election as a
      // zero-count self-vote — this pair is the per-round A/B
      time("q201 round r17 form: election + winner join (noop)") {
        val L = new java.math.BigDecimal(java.math.BigInteger.ONE.shiftLeft(64))
        val HALF = new java.math.BigDecimal(java.math.BigInteger.ONE.shiftLeft(63))
        val cnts = edges
          .join(broadcast(labels.withColumnRenamed("node", "src")), "src")
          .groupBy(col("dst").as("node"), col("label"))
          .agg(count(lit(1)).as("cnt"))
        val ord = (col("cnt").cast("decimal(38,0)") * lit(-1) * lit(L)) +
          (col("label").cast("decimal(38,0)") + lit(HALF))
        val winner = cnts.select(col("node"), ord.as("__ord"))
          .groupBy("node").agg(min("__ord").as("__m"))
          .select(col("node"),
            (pmod(col("__m"), lit(L)) - lit(HALF)).cast("long").as("__new"))
        noop(labels.join(broadcast(winner), Seq("node"), "left")
          .select(col("node"), coalesce(col("__new"), col("label")).as("label")))
      }
      time("q201 round r18 form: self-vote union, shipped (noop)") {
        noop(graft.operators.Matrix.lpaRound(edges, labels,
          df => broadcast(df)))
      }
    }

    // q142 prefix-pipeline decomposition (r18): where does the prefix path
    // spend — the shingle kernel, the df-order prefix selection (dfreq
    // join + per-doc row_number window over the FULL exploded stream), the
    // PPJoin candidate join, or the staged verification? Also A/Bs the
    // window-form prefix selection against an aggregate form (collect_list
    // + per-group array sort + slice — same (doc, shingle, pos) rows).
    locally {
      val thr = 0.8
      val docs = t("documents").filter(col("doc_id") % 2 === 0)
      def kernel = docs
        .select(col("doc_id"),
          graft.functions.PortableHash.tokenHashes(col("text")).as("__th"))
        .filter(size(col("__th")) >= 2)
        .select(col("doc_id"),
          sort_array(graft.functions.expressions.NativeExpressions.shingleHashSet(
            col("__th"), 2, graft.functions.PortableHash.B,
            graft.functions.PortableHash.P)).cast("array<int>").as("__shs"))
        .select(col("doc_id"), col("__shs"), size(col("__shs")).as("n_sh"))
      time("q142x withN kernel only (noop)")(noop(kernel))
      val withN = kernel.localCheckpoint() // eager: probes below exclude it
      val prefLenCap = (col("n_sh") - ceil(col("n_sh") * lit(thr)) + 1)
      def shExp = withN.select(col("doc_id"), col("n_sh"), explode(col("__shs")).as("shingle"))
      def dfreq = shExp.groupBy("shingle").agg(count(lit(1)).as("__df"))
      def prefWindow = {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("doc_id")).orderBy(col("__df"), col("shingle"))
        shExp.join(dfreq, Seq("shingle"))
          .withColumn("__pos", row_number().over(w))
          .filter(col("__pos") <= prefLenCap)
          .select(col("doc_id"), col("n_sh"), col("shingle"), col("__pos"))
      }
      def prefAgg = shExp.join(dfreq, Seq("shingle"))
        .groupBy(col("doc_id"), col("n_sh"))
        .agg(sort_array(collect_list(struct(col("__df"), col("shingle")))).as("__a"))
        .select(col("doc_id"), col("n_sh"),
          posexplode(slice(col("__a"), lit(1), prefLenCap.cast("int")))
            .as(Seq("__p0", "__e")))
        .select(col("doc_id"), col("n_sh"), col("__e.shingle").as("shingle"),
          (col("__p0") + 1).cast("int").as("__pos"))
      time("q142x prefix selection, window form (noop)")(noop(prefWindow))
      time("q142x prefix selection, agg form (noop)")(noop(prefAgg))
      val pref = prefWindow.localCheckpoint()
      time("q142x ppjoin candidates from cached pref (count)") {
        graft.dedup.Dedup.ppjoinCandidates(pref, pref,
          col("a.doc_id") < col("b.doc_id"), "doc_id", thr).count()
      }
      time("q142x ppjoin candidates, asymmetric index prefix (count)") {
        graft.dedup.Dedup.ppjoinCandidates(pref, pref,
          (col("a.n_sh") < col("b.n_sh")) ||
            (col("a.n_sh") === col("b.n_sh") && col("a.doc_id") < col("b.doc_id")),
          "doc_id", thr, indexSideA = true).count()
      }
      val cand = graft.dedup.Dedup.ppjoinCandidates(pref, pref,
        col("a.doc_id") < col("b.doc_id"), "doc_id", thr).localCheckpoint()
      time("q142x staged verification from cached candidates (noop)") {
        noop(graft.dedup.Dedup.stagedVerifiedJaccard(cand, withN, withN, "doc_id", thr))
      }
      time("q142x full (noop)")(noop(SparkEntry.queries("q142_dedup_prefix")(spark, sfDir)))
    }

    // q135 stored-index decomposition (r18): the bench shape screens a
    // 100-vector batch against a STORED parquet cell index — ~1 s for a
    // tiny batch smells like job/plan overhead, not data. Time the screen
    // and the in-batch stage separately, and count jobs/stages.
    locally {
      def probe(label: String)(body: => Unit): Unit =
        if (only.forall(label.contains)) {
          val stages = new java.util.concurrent.atomic.AtomicLong
          val jobs = new java.util.concurrent.atomic.AtomicLong
          val listener = new org.apache.spark.scheduler.SparkListener {
            override def onStageCompleted(
                sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
              stages.incrementAndGet(); ()
            }
            override def onJobStart(
                js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
              jobs.incrementAndGet(); ()
            }
          }
          spark.sparkContext.addSparkListener(listener)
          val t0 = System.nanoTime()
          body
          Thread.sleep(1500)
          spark.sparkContext.removeSparkListener(listener)
          println(f"PROBE ${(System.nanoTime() - t0) / 1e9}%8.3f s jobs=${jobs.get}%-4d " +
            f"stages=${stages.get}%-4d $label")
        }
      if (only.exists(_.startsWith("q135x"))) { // whole block gated: the index build is setup
        val emb = t("embeddings")
        val cents = emb.filter(col("vec_id") < 8)
          .select(col("vec_id").as("centroid_id"), col("embedding").as("cvec"))
        val semDir = java.nio.file.Files.createTempDirectory("graft-semidx-prof").toString
        graft.dedup.Dedup.semDedupIndex(emb.filter(col("vec_id") >= 100), cents)
          .write.mode("overwrite").parquet(s"$semDir/index")
        cents.write.mode("overwrite").parquet(s"$semDir/cents")
        def batch = emb.filter(col("vec_id") < 100)
        def idx = spark.read.parquet(s"$semDir/index")
        def cts = spark.read.parquet(s"$semDir/cents")
        probe("q135x screen only (noop)") {
          noop(graft.dedup.Dedup.semDedupScreen(batch, idx, cts, 0.45))
        }
        if (only.contains("q135xplan")) {
          val d = graft.dedup.Dedup.semDedupScreen(batch, idx, cts, 0.45)
          d.queryExecution.toRdd.foreach(_ => ())
          println("SCREEN FINAL PLAN:\n" + d.queryExecution.executedPlan.toString)
        }
        probe("q135x full againstIndex (noop)") {
          noop(graft.dedup.Dedup.semDedupAgainstIndex(batch, idx, cts, threshold = 0.45)
            .select("vec_id", "centroid_id"))
        }
        probe("q135x full againstIndex, second run (noop)") {
          noop(graft.dedup.Dedup.semDedupAgainstIndex(batch, idx, cts, threshold = 0.45)
            .select("vec_id", "centroid_id"))
        }
      }
    }

    // q159 kCore runtime-reuse probe (r18): the static round plan computes
    // the degree aggregation TWICE (one subtree per semi-join build) — does
    // AQE's exchange reuse collapse them at runtime, or is an explicit
    // per-round materialization of `keep` worth it? Counts stages and
    // shuffle volume via a listener (counts are noise-immune, times are not).
    locally {
      def probe(label: String)(body: => Unit): Unit =
        if (only.forall(label.contains)) {
          val stages = new java.util.concurrent.atomic.AtomicLong
          val tasks = new java.util.concurrent.atomic.AtomicLong
          val sbytes = new java.util.concurrent.atomic.AtomicLong
          val inrecs = new java.util.concurrent.atomic.AtomicLong
          val listener = new org.apache.spark.scheduler.SparkListener {
            override def onStageCompleted(
                sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
              stages.incrementAndGet()
              tasks.addAndGet(sc.stageInfo.numTasks)
              sbytes.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
              inrecs.addAndGet(sc.stageInfo.taskMetrics.inputMetrics.recordsRead)
            }
          }
          spark.sparkContext.addSparkListener(listener)
          val t0 = System.nanoTime()
          body
          Thread.sleep(1500) // listener bus drain
          spark.sparkContext.removeSparkListener(listener)
          println(f"PROBE ${(System.nanoTime() - t0) / 1e9}%8.3f s stages=${stages.get}%-4d " +
            f"tasks=${tasks.get}%-5d shuffleWriteBytes=${sbytes.get}%-12d " +
            f"inputRecords=${inrecs.get} $label")
        }
      val edges = t("documents")
        .select(expr("doc_id div 8").as("a"),
          expr("doc_id div 8 + 1 + doc_id % 8").as("b"))
      probe("q159x kCore shipped (noop)") {
        noop(graft.operators.Matrix.kCore(edges, k = 10, maxIter = 8))
      }
      probe("q159x kCore keep materialized per round (noop)") {
        val e0 = edges.toDF("u", "v").filter(col("u") =!= col("v"))
          .select(least(col("u"), col("v")).as("u"), greatest(col("u"), col("v")).as("v"))
          .distinct()
        var e = e0.localCheckpoint(false)
        var eCount = e.count()
        var i = 0
        var done = false
        while (i < 8 && !done) {
          val deg = e.select(explode(array(col("u"), col("v"))).as("n"))
            .groupBy("n").agg(count(lit(1)).as("d"))
          val keep = deg.filter(col("d") >= 10).select("n").localCheckpoint(true)
          val next = e
            .join(keep.withColumnRenamed("n", "u"), Seq("u"), "left_semi")
            .join(keep.withColumnRenamed("n", "v"), Seq("v"), "left_semi")
            .select("u", "v").localCheckpoint(false)
          val nextCount = next.count()
          done = nextCount == eCount
          e = next
          eCount = nextCount
          i += 1
        }
        noop(e.select(explode(array(col("u"), col("v"))).as("node"))
          .groupBy("node").agg(count(lit(1)).as("degree")))
      }
    }

    // q199/q201 FULL-LOOP probes (r18): the r17 loop (election + winner
    // join / contribution + state join per round) inlined, vs the shipped
    // r18 union-form rounds — job/stage counts + wall, same JVM.
    locally {
      def probe(label: String)(body: => Unit): Unit =
        if (only.forall(label.contains)) {
          val stages = new java.util.concurrent.atomic.AtomicLong
          val jobs = new java.util.concurrent.atomic.AtomicLong
          val sbytes = new java.util.concurrent.atomic.AtomicLong
          val listener = new org.apache.spark.scheduler.SparkListener {
            override def onStageCompleted(
                sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
              stages.incrementAndGet()
              sbytes.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
            }
            override def onJobStart(
                js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
              jobs.incrementAndGet(); ()
            }
          }
          spark.sparkContext.addSparkListener(listener)
          val t0 = System.nanoTime()
          body
          Thread.sleep(1500) // listener bus drain
          spark.sparkContext.removeSparkListener(listener)
          println(f"PROBE ${(System.nanoTime() - t0) / 1e9}%8.3f s jobs=${jobs.get}%-4d " +
            f"stages=${stages.get}%-4d shuffleWriteBytes=${sbytes.get} $label")
        }
      val L = new java.math.BigDecimal(java.math.BigInteger.ONE.shiftLeft(64))
      val HALF = new java.math.BigDecimal(java.math.BigInteger.ONE.shiftLeft(63))
      def edges = t("orders").select(col("o_orderkey"), col("o_custkey"))
        .join(t("lineitem").select(col("l_orderkey"), col("l_suppkey")),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("src"),
          (col("l_suppkey") + 1000000000000L).as("dst"))
      def q201Old(tag: String): Unit = probe(s"q201x$tag OLD loop (election + winner join x4, noop)") {
        val e = edges.toDF("src", "dst").distinct().localCheckpoint(false)
        val nodes = e.select(col("src").as("node"))
          .union(e.select(col("dst"))).distinct().localCheckpoint(false)
        nodes.count()
        var labels = nodes.select(col("node"), col("node").as("label"))
        for (_ <- 0 until 4) {
          val cnts = e.join(broadcast(labels.withColumnRenamed("node", "src")), "src")
            .groupBy(col("dst").as("node"), col("label"))
            .agg(count(lit(1)).as("cnt"))
          val ord = (col("cnt").cast("decimal(38,0)") * lit(-1) * lit(L)) +
            (col("label").cast("decimal(38,0)") + lit(HALF))
          val winner = cnts.select(col("node"), ord.as("__ord"))
            .groupBy("node").agg(min("__ord").as("__m"))
            .select(col("node"),
              (pmod(col("__m"), lit(L)) - lit(HALF)).cast("long").as("__new"))
          labels = labels.join(broadcast(winner), Seq("node"), "left")
            .select(col("node"), coalesce(col("__new"), col("label")).as("label"))
            .localCheckpoint(false)
        }
        noop(labels)
      }
      def q201New(tag: String): Unit =
        probe(s"q201x$tag NEW loop (self-vote union x4, shipped, noop)") {
          noop(graft.operators.Matrix.labelPropagation(edges, iters = 4))
        }
      // order-balanced in one JVM: OLD,NEW,NEW,OLD,NEW,OLD,OLD,NEW — the
      // warm tail (positions 4-8) holds interleaved samples of both arms
      q201Old("a"); q201New("b"); q201New("c"); q201Old("d")
      q201New("e"); q201Old("f"); q201Old("g"); q201New("h")
      probe("q199x OLD loop (contribution + state join x5, noop)") {
        val e = edges.toDF("src", "dst").distinct().localCheckpoint(false)
        val deg = e.groupBy("src").agg(count(lit(1)).as("deg"))
        val nodes = e.select(col("src").as("node"))
          .union(e.select(col("dst"))).distinct().localCheckpoint(false)
        val n = nodes.count()
        val scale = 1000000000L
        val base = (scale * 15 / 100) / n
        var state = nodes
          .join(deg.withColumnRenamed("src", "node"), Seq("node"), "left")
          .select(col("node"), lit(scale / n).as("r"), col("deg"))
          .localCheckpoint(false)
        for (_ <- 0 until 5) {
          val contrib = e.join(broadcast(
              state.filter(col("deg").isNotNull)
                .select(col("node").as("src"), expr("r div deg").as("c"))), "src")
            .select(col("dst").as("node"), col("c"))
            .groupBy("node").agg(sum("c").as("s"))
          state = state.join(broadcast(contrib), Seq("node"), "left")
            .withColumn("__s", coalesce(col("s"), lit(0L)))
            .select(col("node"), (lit(base) + expr("(85 * __s) div 100")).as("r"),
              col("deg"))
            .localCheckpoint(false)
        }
        noop(state.select("node", "r"))
      }
      probe("q199x NEW loop (state rides contribution agg x5, shipped, noop)") {
        noop(graft.operators.Matrix.pageRankPortable(edges, iters = 5))
      }
    }

    // q26 duple cube decomposition (r17): where does the Expand-over-raw-rows
    // inner aggregate spend its time, and does a union-of-grouping-sets
    // rewrite (grouping sets enumerated as branches over one
    // REPARTITION(inner-key) exchange, reused across branches) beat it?
    locally {
      val li = t("lineitem")
      time("q26 full")(noop(SparkEntry.queries("q26_duple_cube")(spark, sfDir)))
      time("q26 inner cube agg only (noop)") {
        val v = "__prof_q26_inner"
        li.createOrReplaceTempView(v)
        noop(spark.sql(
          s"""SELECT l_returnflag, l_linestatus, grouping_id() AS __gid,
             |       sum(l_quantity) AS __inner
             |FROM $v GROUP BY l_orderkey, CUBE(l_returnflag, l_linestatus)""".stripMargin))
      }
      time("q26 leaf agg by (okey,rf,ls) only (noop)") {
        noop(li.groupBy("l_orderkey", "l_returnflag", "l_linestatus")
          .agg(sum("l_quantity").as("s")))
      }
      time("q26 union-no-repartition (noop)") {
        val base = li.select("l_orderkey", "l_returnflag", "l_linestatus", "l_quantity")
        def branch(gid: Long, keep: Seq[String]) = {
          val grp = "l_orderkey" +: keep
          base.groupBy(grp.map(col): _*).agg(sum("l_quantity").as("__inner"))
            .select(
              (if (keep.contains("l_returnflag")) col("l_returnflag")
               else lit(null).cast("string")).as("l_returnflag"),
              (if (keep.contains("l_linestatus")) col("l_linestatus")
               else lit(null).cast("string")).as("l_linestatus"),
              lit(gid).as("__gid"), col("__inner"))
        }
        noop(branch(0, Seq("l_returnflag", "l_linestatus"))
          .unionAll(branch(1, Seq("l_returnflag")))
          .unionAll(branch(2, Seq("l_linestatus")))
          .unionAll(branch(3, Nil))
          .groupBy("l_returnflag", "l_linestatus", "__gid")
          .agg(max("__inner").as("max_order_qty"))
          .select("l_returnflag", "l_linestatus", "max_order_qty"))
      }
      time("q26 union-rewrite (noop)") {
        val base = li.select("l_orderkey", "l_returnflag", "l_linestatus", "l_quantity")
          .repartition(col("l_orderkey"))
        def branch(gid: Long, keep: Seq[String]) = {
          val grp = "l_orderkey" +: keep
          base.groupBy(grp.map(col): _*).agg(sum("l_quantity").as("__inner"))
            .select(
              (if (keep.contains("l_returnflag")) col("l_returnflag")
               else lit(null).cast("string")).as("l_returnflag"),
              (if (keep.contains("l_linestatus")) col("l_linestatus")
               else lit(null).cast("string")).as("l_linestatus"),
              lit(gid).as("__gid"), col("__inner"))
        }
        noop(branch(0, Seq("l_returnflag", "l_linestatus"))
          .unionAll(branch(1, Seq("l_returnflag")))
          .unionAll(branch(2, Seq("l_linestatus")))
          .unionAll(branch(3, Nil))
          .groupBy("l_returnflag", "l_linestatus", "__gid")
          .agg(max("__inner").as("max_order_qty"))
          .select("l_returnflag", "l_linestatus", "max_order_qty"))
      }
    }
    spark.stop()
  }
}
