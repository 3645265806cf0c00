package graft

import org.apache.spark.sql.functions._
import graft.script.ScriptEngine

/** Script front-end coverage: each statement type compiles to the expected
  * DataFrame semantics (mirrors the reference's script examples, e.g.
  * release/examples/wordcount.cmr).
  */
class ScriptSpec extends SparkSpec {
  import spark.implicits._

  private def env(pairs: (String, org.apache.spark.sql.DataFrame)*) = Map(pairs: _*)

  test("generate / filter / group by with aggregates") {
    val df = Seq((1, "a", 10.0), (2, "a", 20.0), (3, "b", 5.0)).toDF("id", "k", "v")
    val out = ScriptEngine.run(spark,
      """f = FILTER t BY v > 6;
        |g = GROUP f BY k AGGREGATES SUM(v) AS sv, COUNT(1) AS n;""".stripMargin,
      env0 = env("t" -> df))("g")
    assert(out.orderBy("k").collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSeq
      == Seq(("a", 30.0, 2L)))
  }

  test("group by ALL") {
    val df = Seq(1, 2, 3).toDF("x")
    val out = ScriptEngine.run(spark,
      "g = GROUP t BY ALL AGGREGATES SUM(x) AS s;", env0 = env("t" -> df))("g")
    assert(out.collect().head.getLong(0) == 6L)
  }

  test("FOREACH macro generates one job instance per value, with nesting") {
    val dir = java.nio.file.Files.createTempDirectory("graft-foreach").toString
    val df = Seq((1, "a", "x"), (2, "a", "y"), (3, "b", "x")).toDF("id", "k", "s")
    // the reference's per-date job generation shape: one STORE per segment
    ScriptEngine.run(spark,
      s"""FOREACH SEG IN ('a', 'b') DO
         |  f = FILTER t BY k == '%SEG%';
         |  STORE f INTO '$dir/seg_$$SEG' USING PARQUET;
         |END FOREACH;""".stripMargin,
      env0 = env("t" -> df))
    assert(spark.read.parquet(s"$dir/seg_a").count() == 2)
    assert(spark.read.parquet(s"$dir/seg_b").count() == 1)
    // nested loops expand the cross product
    assert(ScriptEngine.expandForeach(
      "FOREACH A IN ('1') DO FOREACH B IN ('2', '3') DO say $A-$B; END FOREACH; END FOREACH;")
      .replaceAll("\\s+", " ").trim == "say 1-2; say 1-3;")
    // unterminated loop is loud
    val err = intercept[IllegalArgumentException](
      ScriptEngine.expandForeach("FOREACH A IN ('1') DO x = y;"))
    assert(err.getMessage.contains("END FOREACH"))
  }

  test("user-defined operator loads by class name with inputs and params") {
    val out = ScriptEngine.run(spark,
      "o = OPERATOR 'graft.SampleUnionOperator' a, b ('tag': 'x');",
      env0 = env("a" -> Seq(1).toDF("v"), "b" -> Seq(2).toDF("v")))("o")
    assert(out.collect().map(r => (r.getInt(0), r.getString(1))).toSet
      == Set((1, "x"), (2, "x")))
  }

  test("shipped curation plug-ins: novelty screen and salient terms from a script") {
    val batch = Seq((1L, "seen before"), (2L, "rare gem here")).toDF("doc_id", "text")
    val corpus = Seq((9L, "seen   before")).toDF("doc_id", "text")
    val out = ScriptEngine.run(spark,
      """novel = OPERATOR 'graft.script.ops.NoveltyFilter' batch, corpus ('expectedBatchDocs': '100');
        |terms = OPERATOR 'graft.script.ops.TopTerms' novel ('k': '1');""".stripMargin,
      env0 = env("batch" -> batch, "corpus" -> corpus))
    assert(out("novel").select("doc_id").collect().map(_.getLong(0)).toSeq == Seq(2L))
    assert(out("terms").select("doc_id", "term_rank").collect().map(_.getLong(0)).toSeq == Seq(2L))
  }

  test("shipped minhash index plug-ins: build, store, match a batch from a script") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val corpus = Seq((1L, base),
      (2L, "one two three four five six seven eight nine ten")).toDF("doc_id", "text")
    val batch = Seq((100L, base.replace("mu", "nu")),
      (101L, "wholly unrelated text here")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-mhidx").toString
    // build + persist the index once ...
    ScriptEngine.run(spark,
      s"""idx = OPERATOR 'graft.script.ops.MinHashIndex' corpus ('shingleN': '2', 'k': '16', 'bands': '8');
         |STORE idx INTO '$dir/idx' USING PARQUET;""".stripMargin,
      env0 = env("corpus" -> corpus))
    // ... then match a later batch against the stored index
    val out = ScriptEngine.run(spark,
      s"""idx = LOAD '$dir/idx' USING PARQUET;
         |cands = OPERATOR 'graft.script.ops.MinHashMatch' batch, idx ('shingleN': '2', 'k': '16', 'bands': '8');""".stripMargin,
      env0 = env("batch" -> batch))
    val got = out("cands").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.contains((100L, 1L)), got.toString)
    assert(!got.exists(_._1 == 101L), got.toString)
  }

  test("shipped LM-score plug-in ranks in-domain text above gibberish from a script") {
    val ref = Seq((1L, "the cat sat on the mat"), (2L, "the dog sat on the rug"))
      .toDF("doc_id", "text")
    val corpus = Seq((10L, "the cat sat on the rug"), (11L, "zzq vbn wpl kjh qqx mmr"))
      .toDF("doc_id", "text")
    val out = ScriptEngine.run(spark,
      "scored = OPERATOR 'graft.script.ops.LmScore' corpus, ref ('n': '2');",
      env0 = env("corpus" -> corpus, "ref" -> ref))
    val byDoc = out("scored").collect()
      .map(r => r.getLong(0) -> r.getAs[Double]("avg_logp")).toMap
    assert(byDoc(10L) > byDoc(11L), byDoc.toString)
  }

  test("shipped classifier plug-in filters by model score from a script") {
    val emb = sf("embeddings")
    val out = ScriptEngine.run(spark,
      """kept = OPERATOR 'graft.script.ops.ClassifierFilter' corpus, labeled
        |  ('label': 'CAST(label < 5 AS INT)', 'dim': '64', 'iters': '10');""".stripMargin,
      env0 = env("corpus" -> emb, "labeled" -> emb))
    val n = out("kept").count()
    assert(n > 0 && n < emb.count(), s"model filter kept $n of ${emb.count()}")
  }

  test("shipped semantic-dedup plug-ins: build, store, and match against the cell index") {
    val emb = sf("embeddings")
    val dir = java.nio.file.Files.createTempDirectory("graft-semidx").toString
    // build + persist the corpus cell index once ...
    ScriptEngine.run(spark,
      s"""cents = FILTER all BY vec_id < 8;
         |cv = FROM cents GENERATE vec_id AS centroid_id, embedding AS cvec;
         |corpus = FILTER all BY vec_id >= 100;
         |idx = OPERATOR 'graft.script.ops.SemDedupIndex' corpus, cv;
         |STORE idx INTO '$dir/idx' USING PARQUET;
         |STORE cv INTO '$dir/cv' USING PARQUET;""".stripMargin,
      env0 = env("all" -> emb))
    // ... then dedup a later batch against the stored index; the batch
    // carries a planted copy of corpus vector 100 (id 9999), which the
    // stored index must kill
    val batch = emb.filter(col("vec_id") < 100).unionByName(
      emb.filter(col("vec_id") === 100).withColumn("vec_id", lit(9999L)))
    val out = ScriptEngine.run(spark,
      s"""idx = LOAD '$dir/idx' USING PARQUET;
         |cv = LOAD '$dir/cv' USING PARQUET;
         |kept = OPERATOR 'graft.script.ops.SemDedupMatch' batch, idx, cv ('threshold': '0.45');""".stripMargin,
      env0 = env("batch" -> batch))
    val keptIds = out("kept").select("vec_id").collect().map(_.getLong(0)).toSet
    assert(keptIds.nonEmpty && !keptIds.contains(9999L),
      s"planted corpus duplicate survived: ${keptIds.size} kept")
  }

  test("shipped sketch plug-ins: kmv distinct and a stored count-min sketch from a script") {
    val corpus = (Seq.fill(40)("hot") ++ Seq("a", "b", "c")).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "term")
    val dir = java.nio.file.Files.createTempDirectory("graft-sketch").toString
    // build + persist the cms once, estimate distincts in the same pass ...
    ScriptEngine.run(spark,
      s"""nd = OPERATOR 'graft.script.ops.KmvDistinct' corpus ('key': 'term');
         |cms = OPERATOR 'graft.script.ops.CmsBuild' corpus ('term': 'term', 'width': '256');
         |STORE cms INTO '$dir/cms' USING PARQUET;
         |STORE nd INTO '$dir/nd' USING PARQUET;""".stripMargin,
      env0 = env("corpus" -> corpus))
    val nd = spark.read.parquet(s"$dir/nd").collect().head.getAs[Double]("nd_est")
    assert(nd == 4.0, s"4 distinct terms, estimated $nd")
    // ... then probe the stored sketch from a later script
    val probes = Seq("hot", "absent").toDF("term")
    val out = ScriptEngine.run(spark,
      s"""cms = LOAD '$dir/cms' USING PARQUET;
         |est = OPERATOR 'graft.script.ops.CmsQuery' cms, probes ('term': 'term', 'width': '256');""".stripMargin,
      env0 = env("probes" -> probes))
    val est = out("est").collect().map(r => r.getAs[String]("term") -> r.getAs[Long]("est_count")).toMap
    assert(est("hot") == 40L && est("absent") == 0L, est.toString)
    // bloom: persist a membership sketch, probe from a later script
    ScriptEngine.run(spark,
      s"""bf = OPERATOR 'graft.script.ops.BloomBuild' corpus ('key': 'term', 'numBits': '4096');
         |STORE bf INTO '$dir/bf' USING PARQUET;""".stripMargin,
      env0 = env("corpus" -> corpus))
    val bq = ScriptEngine.run(spark,
      s"""bf = LOAD '$dir/bf' USING PARQUET;
         |hit = OPERATOR 'graft.script.ops.BloomQuery' bf, probes ('key': 'term', 'numBits': '4096');""".stripMargin,
      env0 = env("probes" -> probes))
    val hit = bq("hit").collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(hit("hot") && !hit("absent"), hit.toString)
  }

  test("shipped gopher + winnow plug-ins: rule filtering and fingerprint screening from a script") {
    val clean = (1 to 30).map(_ => "the quick brown fox jumps over a lazy dog and runs on").mkString(" ")
    val corpus = Seq((1L, clean), (2L, "# ## ###")).toDF("doc_id", "text")
    val kept = ScriptEngine.run(spark,
      "kept = OPERATOR 'graft.script.ops.GopherRules' corpus ('keepOnly': 'true');",
      env0 = env("corpus" -> corpus))("kept")
    assert(kept.select("doc_id").collect().map(_.getLong(0)).toSeq == Seq(1L))

    // winnow: store the corpus fingerprint index once, screen a later batch
    val dir = java.nio.file.Files.createTempDirectory("graft-winnow").toString
    val batch = Seq(
      (100L, clean), // verbatim corpus reuse → screened out
      (101L, "p q r s t u v w x y z aa bb cc")).toDF("doc_id", "text")
    ScriptEngine.run(spark,
      s"""fps = OPERATOR 'graft.script.ops.WinnowIndex' corpus;
         |STORE fps INTO '$dir/fps' USING PARQUET;""".stripMargin,
      env0 = env("corpus" -> corpus))
    val out = ScriptEngine.run(spark,
      s"""idx = LOAD '$dir/fps' USING PARQUET;
         |novel = OPERATOR 'graft.script.ops.WinnowIndex' batch, idx;
         |pairs = OPERATOR 'graft.script.ops.WinnowOverlap' batch ('minShared': '1');""".stripMargin,
      env0 = env("batch" -> batch))
    assert(out("novel").select("doc_id").collect().map(_.getLong(0)).toSeq == Seq(101L))
    assert(out("pairs").count() == 0) // the two batch docs share no passage
  }

  test("the reference's wordcount.cmr runs under the phase-syntax front end") {
    // release/examples/wordcount.cmr body, verbatim except the output path
    // (the example writes to a relative "output" dir); $CUBERT_HOME comes
    // from property substitution exactly as in the reference launcher
    val dir = java.nio.file.Files.createTempDirectory("graft-wc").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/words.txt"),
      "jeeves\ni\nsaid\nmay\ni\nsaid\ni\n".getBytes)
    val script =
      s"""PROGRAM "Word Count";
         |
         |SET overwrite true;
         |
         |JOB "count words"
         |  REDUCERS 5;
         |  MAP {
         |    data = LOAD "$$CUBERT_HOME/words.txt" USING TEXT("schema": "STRING word");
         |    with_count = FROM data GENERATE word, 1L AS count;
         |  }
         |  SHUFFLE with_count PARTITIONED ON word AGGREGATES COUNT(word) AS count;
         |  REDUCE {
         |    counted = GROUP with_count BY word AGGREGATES SUM(count) AS count;
         |  }
         |  STORE counted INTO "$dir/output" USING TEXT();
         |END
         |""".stripMargin
    val out = ScriptEngine.run(spark, script, params = Map("CUBERT_HOME" -> dir))
    val counts = out("counted").collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("jeeves" -> 1L, "i" -> 3L, "said" -> 2L, "may" -> 1L))
    // TEXT sink wrote tab-separated lines
    val lines = spark.read.text(s"$dir/output").collect().map(_.getString(0)).sorted
    assert(lines.contains("i\t3"))
  }

  test("multipass groups share a persisted input and run independent chains") {
    val df = Seq(("a", 1.0), ("a", 2.0), ("b", 5.0)).toDF("k", "v")
    val out = ScriptEngine.run(spark,
      """MULTIPASS
        |{ g1 = GROUP t BY k AGGREGATES SUM(v) AS sv; }
        |{ g2 = GROUP t BY ALL AGGREGATES COUNT(1) AS n; }""".stripMargin,
      env0 = env("t" -> df))
    assert(out("g1").count() == 2)
    assert(out("g2").collect().head.getLong(0) == 3L)
    assert(df.storageLevel.useMemory) // shared input was persisted
    df.unpersist()
  }

  test("relations named like statement keywords still parse as assignments") {
    val df = Seq(1, 2, 3).toDF("x")
    val out = ScriptEngine.run(spark,
      """map = FILTER t BY x > 1;
        |set = DISTINCT map;
        |store = LIMIT set 2;""".stripMargin, env0 = env("t" -> df))
    assert(out("store").count() == 2)
  }

  test("TEXT store writes empty fields for NULLs, keeping rows aligned") {
    val dir = java.nio.file.Files.createTempDirectory("graft-textnull").toString
    val df = Seq((1, Some("a"), "z"), (2, None, "y")).toDF("id", "mid", "tail")
    graft.sources.Sources.store(df, s"$dir/t", "text")
    val lines = spark.read.text(s"$dir/t").collect().map(_.getString(0)).sorted
    assert(lines.toSeq == Seq("1\ta\tz", "2\t\ty")) // 3 fields either way
  }

  test("group by without AGGREGATES emits one row per group") {
    val df = Seq((1, "a"), (2, "a"), (3, "b")).toDF("x", "k")
    val out = ScriptEngine.run(spark, "g = GROUP t BY k;", env0 = env("t" -> df))("g")
    assert(out.columns.toSeq == Seq("k"))
    assert(out.collect().map(_.getString(0)).sorted.toSeq == Seq("a", "b"))
  }

  test("joins: shuffle and hash, outer types") {
    val a = Seq((1, "x"), (2, "y")).toDF("k", "va")
    val b = Seq((1, "p"), (3, "q")).toDF("k", "vb")
    val inner = ScriptEngine.run(spark, "j = JOIN a BY k, b BY k;", env0 = env("a" -> a, "b" -> b))("j")
    assert(inner.count() == 1)
    val left = ScriptEngine.run(spark, "j = LEFT OUTER JOIN a BY k, b BY k;", env0 = env("a" -> a, "b" -> b))("j")
    assert(left.count() == 2)
    val hash = ScriptEngine.run(spark, "j = HASH-JOIN a BY k, b BY k;", env0 = env("a" -> a, "b" -> b))("j")
    assert(hash.count() == 1)
  }

  test("cube / rollup") {
    val df = Seq(("a", "x", 1L), ("a", "y", 2L), ("b", "x", 3L)).toDF("d1", "d2", "m")
    val out = ScriptEngine.run(spark,
      "c = CUBE t BY d1, d2 AGGREGATES SUM(m) AS s;", env0 = env("t" -> df))("c")
    assert(out.count() == 8) // 3 leaf + 2 d1 + 2 d2 + 1 total
    val ru = ScriptEngine.run(spark,
      "c = ROLLUP t BY d1, d2 AGGREGATES SUM(m) AS s;", env0 = env("t" -> df))("c")
    assert(ru.count() == 6)
  }

  test("cube with GROUPING SETS clause") {
    val df = Seq(("a", "x", 1L), ("a", "y", 2L), ("b", "x", 3L)).toDF("d1", "d2", "m")
    val out = ScriptEngine.run(spark,
      "c = CUBE t BY d1, d2 AGGREGATES SUM(m) AS s GROUPING SETS ((d1), (d2), ());",
      env0 = env("t" -> df))("c")
    assert(out.count() == 5) // 2 d1 + 2 d2 + 1 total
  }

  test("multi-column dictionary, path-stored dictionary, encode/decode roundtrip") {
    val dir = java.nio.file.Files.createTempDirectory("graft-dict").toString
    val df = Seq((1, "gold", "eu"), (2, "silver", "us"), (3, "gold", "us"))
      .toDF("id", "tier", "region")
    val out = ScriptEngine.run(spark,
      s"""d = DICTIONARY t ON tier, region;
         |STORE d INTO '$dir/dict' USING PARQUET;
         |e = ENCODE t ON tier, region USING '$dir/dict';
         |r = DECODE e ON tier, region USING d;""".stripMargin,
      env0 = env("t" -> df))
    val enc = out("e").orderBy("id").collect()
    assert(enc.map(_.getInt(1)).toSeq == Seq(1, 2, 1))   // gold=1, silver=2
    assert(enc.map(_.getInt(2)).toSeq == Seq(1, 2, 2))   // eu=1, us=2
    val rt = out("r").orderBy("id").collect()
    assert(rt.map(_.getString(1)).toSeq == Seq("gold", "silver", "gold"))
    assert(rt.map(_.getString(2)).toSeq == Seq("eu", "us", "us"))
  }

  test("flatten variants: TUPLE, BAG with type list, BAG_TUPLE; cube HTSIZE parses") {
    val nested = Seq((1, (10, "a")), (2, (20, "b"))).toDF("id", "st")
    val t1 = ScriptEngine.run(spark, "f = FLATTEN n BY st TUPLE (x:int, y:string);",
      env0 = env("n" -> nested))("f")
    assert(t1.columns.toSeq == Seq("id", "_1", "_2"))
    val bags = Seq((1, Seq(10, 20))).toDF("id", "vs")
    val t2 = ScriptEngine.run(spark, "f = FLATTEN b BY vs BAG (v:int);",
      env0 = env("b" -> bags))("f")
    assert(t2.columns.toSeq == Seq("id", "v") && t2.count() == 2)
    val bagTuples = Seq((1, Seq((10, "a"), (20, "b")))).toDF("id", "ts")
    val t3 = ScriptEngine.run(spark, "f = FLATTEN bt BY ts BAG_TUPLE (x:int, y:string);",
      env0 = env("bt" -> bagTuples))("f")
    assert(t3.count() == 2 && t3.columns.length == 3)
    val cube = ScriptEngine.run(spark,
      "c = CUBE t BY d1 AGGREGATES COUNT(1) AS n HTSIZE 2000000;",
      env0 = env("t" -> Seq(("a", 1)).toDF("d1", "m")))("c")
    assert(cube.count() == 2)
  }

  test("cube with GROUPING COMBOS and ROLLUPS clauses") {
    val df = Seq(("a", "x", 1L), ("a", "y", 2L), ("b", "x", 3L)).toDF("d1", "d2", "m")
    val combos = ScriptEngine.run(spark,
      "c = CUBE t BY d1, d2 AGGREGATES SUM(m) AS s GROUPING COMBOS 1;",
      env0 = env("t" -> df))("c")
    assert(combos.count() == 5) // sets of size ≤ 1: (d1), (d2), ()
    val rollups = ScriptEngine.run(spark,
      "c = CUBE t BY d1, d2 AGGREGATES SUM(m) AS s ROLLUPS (d1, d2);",
      env0 = env("t" -> df))("c")
    assert(rollups.count() == 6) // (d1,d2)+(d1)+(): 3 + 2 + 1
  }

  test("combine merges sorted relations; validate and no_op assert sortedness") {
    val a = Seq(1, 3).toDF("x"); val b = Seq(2, 4).toDF("x")
    val out = ScriptEngine.run(spark,
      """c = COMBINE a, b SORTED ON x;
        |v = VALIDATE c BY ROW PARTITIONED ON x SORTED ON x;
        |n = NO_OP v ASSERT PARTITIONED ON x SORTED ON x;""".stripMargin,
      env0 = env("a" -> a, "b" -> b))("n")
    assert(out.count() == 4) // runtime sort assertions pass
  }

  test("pivot co-locates groups; load block matching reads the bucketed table") {
    val df = Seq((1, "a"), (1, "b"), (2, "c")).toDF("k", "v")
    val out = ScriptEngine.run(spark,
      """p = PIVOT t ON k;
        |b = BLOCKGEN p PARTITIONED ON k SORTED ON k INTO script_lb BUCKETS 2;
        |m = LOAD BLOCK FROM script_lb MATCHING p;""".stripMargin,
      env0 = env("t" -> df))("m")
    assert(out.count() == 3)
  }

  test("tee with GENERATE projects the side output, main keeps full schema") {
    val dir = java.nio.file.Files.createTempDirectory("graft-tee-gen").toString
    val df = Seq((1, "a"), (2, "b"), (3, "c")).toDF("x", "s")
    val out = ScriptEngine.run(spark,
      s"m = TEE t INTO '$dir/side' USING PARQUET GENERATE s IF x > 1;",
      env0 = env("t" -> df))("m")
    assert(out.columns.toSeq == Seq("x", "s")) // main unchanged
    val side = spark.read.parquet(s"$dir/side")
    assert(side.columns.toSeq == Seq("s") && side.count() == 2)
  }

  test("cube with INNER computes the duple aggregate per grouping-set ∪ inner") {
    // same fixture as CubeOpsSpec's duple test: inner key m=3 spans both d1s
    val df = Seq(("x", 1, 10), ("x", 3, 5), ("y", 3, 70)).toDF("d1", "m", "u")
    val out = ScriptEngine.run(spark,
      "c = CUBE t BY d1 INNER m AGGREGATES MAX(sum(u)) AS mx;", env0 = env("t" -> df))("c")
    val got = out.collect().map(r => Option(r.getString(0)).getOrElse("ALL") -> r.getLong(1)).toMap
    assert(got == Map("x" -> 10L, "y" -> 70L, "ALL" -> 75L))
  }

  test("top n / rank / sort / limit / distinct") {
    val df = Seq((1, 10), (1, 20), (1, 30), (2, 5)).toDF("g", "v")
    val top = ScriptEngine.run(spark,
      "t2 = TOP 2 FROM t GROUP BY g ORDER BY v DESC;", env0 = env("t" -> df))("t2")
    assert(top.count() == 3)
    val rnk = ScriptEngine.run(spark,
      "r = RANK t AS rnk GROUP BY g ORDER BY v;", env0 = env("t" -> df))("r")
    assert(rnk.filter($"rnk" === 1).count() == 2)
    val lim = ScriptEngine.run(spark, "l = LIMIT t 2;", env0 = env("t" -> df))("l")
    assert(lim.count() == 2)
    val dis = ScriptEngine.run(spark, "d = DISTINCT t2;",
      env0 = env("t2" -> df.select("g")))("d")
    assert(dis.count() == 2)
  }

  test("duplicate / flatten / gather / shuffle") {
    val df = Seq((1, Seq(10, 20))).toDF("id", "arr")
    val out = ScriptEngine.run(spark,
      """f = FLATTEN t BY arr AS elem;
        |d = DUPLICATE f 2 TIMES COUNTER AS c;
        |g = GATHER d, d;
        |s = SHUFFLE g PARTITIONED ON id SORTED ON elem;""".stripMargin,
      env0 = env("t" -> df))("s")
    assert(out.count() == 8) // 2 elems × 2 dup × 2 gather
  }

  test("expression sugar: positional $i and map projection #'key'") {
    val df = Seq((7, Map("k" -> 42))).toDF("num", "m")
    val out = ScriptEngine.run(spark,
      "g = FROM t GENERATE $0 AS n, m#'k' AS mv;", env0 = env("t" -> df))("g")
    assert(out.collect().head.toSeq == Seq(7, 42))
  }

  test("case / string expressions go through Catalyst") {
    val df = Seq(("R", 50.0), ("N", 10.0)).toDF("flag", "qty")
    val out = ScriptEngine.run(spark,
      "g = FROM t GENERATE CASE WHEN flag = 'R' THEN 'ret' ELSE 'kept' END AS cls, qty * 2 AS q2;",
      env0 = env("t" -> df))("g")
    assert(out.orderBy("cls").collect().map(_.getString(0)).toSeq == Seq("kept", "ret"))
  }

  test("load / store roundtrip via sources") {
    val dir = java.nio.file.Files.createTempDirectory("graft-script").toString
    val df = Seq((1, "a"), (2, "b")).toDF("id", "name")
    ScriptEngine.run(spark, s"STORE t INTO '$dir/out' USING CSV;", env0 = env("t" -> df))
    val back = ScriptEngine.run(spark,
      s"r = LOAD '$dir/out' USING CSV('INT id, STRING name');")("r")
    assert(back.orderBy("id").collect().map(_.getString(1)).toSeq == Seq("a", "b"))
  }

  test("wordcount — the reference's example script shape") {
    val docs = Seq("the cat", "the dog").toDF("text")
    val out = ScriptEngine.run(spark,
      """toks = FROM d GENERATE explode(split(text, '\\s+')) AS word;
        |wc = GROUP toks BY word AGGREGATES COUNT(1) AS cnt;""".stripMargin,
      env0 = env("d" -> docs))("wc")
    assert(out.filter($"word" === "the").collect().head.getLong(1) == 2L)
  }

  test("dictionary / encode / decode statements") {
    val df = Seq((1, "gold"), (2, "silver"), (3, "gold")).toDF("id", "tier")
    val out = ScriptEngine.run(spark,
      """d = DICTIONARY t ON tier;
        |e = ENCODE t ON tier USING d;
        |r = DECODE e ON tier USING d;""".stripMargin,
      env0 = env("t" -> df))
    val enc = out("e").orderBy("id").collect().map(_.getInt(1)).toSeq
    assert(enc == Seq(1, 2, 1)) // codes by sorted value: gold=1, silver=2
    assert(out("r").orderBy("id").collect().map(_.getString(1)).toSeq
      == Seq("gold", "silver", "gold"))
  }

  test("tee with split writes side output and keeps the rest in main") {
    val dir = java.nio.file.Files.createTempDirectory("graft-tee").toString
    val df = Seq(1, 2, 3, 4).toDF("x")
    val out = ScriptEngine.run(spark,
      s"m = TEE WITH SPLIT t INTO '$dir/side' USING PARQUET IF x > 2;",
      env0 = env("t" -> df))("m")
    assert(out.collect().map(_.getInt(0)).sorted.toSeq == Seq(1, 2))
    assert(spark.read.parquet(s"$dir/side").count() == 2)
  }

  test("tee with split and no IF tees every row and empties the main flow") {
    val dir = java.nio.file.Files.createTempDirectory("graft-tee-all").toString
    val df = Seq(1, 2, 3).toDF("x")
    val out = ScriptEngine.run(spark,
      s"m = TEE WITH SPLIT t INTO '$dir/side' USING PARQUET;",
      env0 = env("t" -> df))("m")
    assert(out.count() == 0)
    assert(out.columns.toSeq == Seq("x"))
    assert(spark.read.parquet(s"$dir/side").count() == 3)
  }

  test("blockgen statement creates a bucketed table readable as a relation") {
    val df = Seq((1, "a"), (2, "b"), (3, "c")).toDF("k", "v")
    val out = ScriptEngine.run(spark,
      "b = BLOCKGEN t PARTITIONED ON k SORTED ON k INTO script_bg BUCKETS 2;",
      env0 = env("t" -> df))("b")
    assert(out.count() == 3)
    assert(spark.sessionState.catalog
      .getTableMetadata(spark.sessionState.sqlParser.parseTableIdentifier("script_bg"))
      .bucketSpec.exists(_.numBuckets == 2))
  }

  test("oncompletion tasks: mkdir, mv, rm") {
    val dir = java.nio.file.Files.createTempDirectory("graft-oc").toString
    ScriptEngine.run(spark,
      s"""ONCOMPLETION { MKDIR '$dir/a'; MV '$dir/a' '$dir/b'; MKDIR '$dir/c'; RM '$dir/c'; }""")
    assert(!new java.io.File(s"$dir/a").exists())
    assert(new java.io.File(s"$dir/b").exists())
    assert(!new java.io.File(s"$dir/c").exists())
  }

  test("store with zorder storage params writes clustered parquet") {
    val dir = java.nio.file.Files.createTempDirectory("graft-zs").toString
    val li = sf("lineitem").select("l_orderkey", "l_partkey", "l_suppkey")
    ScriptEngine.run(spark,
      s"""STORE t INTO '$dir/z' USING PARQUET ("zorder": "l_partkey,l_suppkey", "files": "4");""",
      env0 = env("t" -> li))
    val back = spark.read.parquet(s"$dir/z")
    assert(back.count() == li.count())
    val nFiles = back.select(org.apache.spark.sql.functions.input_file_name())
      .distinct().count()
    assert(nFiles == 4, s"expected 4 z-ordered files, got $nFiles")
    // dry-run still analyzes but writes nothing
    ScriptEngine.run(spark,
      s"""STORE t INTO '$dir/dry' USING PARQUET ("zorder": "l_partkey");""",
      env0 = env("t" -> li), dryRun = true)
    assert(!new java.io.File(s"$dir/dry").exists())
  }

  test("store with partition_by storage param writes hive-style directories") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ps").toString
    ScriptEngine.run(spark,
      s"""STORE t INTO '$dir/p' USING PARQUET ("partition_by": "o_orderpriority");""",
      env0 = env("t" -> sf("orders")))
    val parts = new java.io.File(s"$dir/p").listFiles
      .filter(_.isDirectory).map(_.getName).toSet
    assert(parts.exists(_.startsWith("o_orderpriority=")), s"no partition dirs: $parts")
    assert(spark.read.parquet(s"$dir/p").count() == sf("orders").count())
  }

  test("param substitution") {
    val df = Seq(1, 2, 3, 4).toDF("x")
    val out = ScriptEngine.run(spark, "f = FILTER t BY x > %lo%;",
      params = Map("lo" -> "2"), env0 = env("t" -> df))("f")
    assert(out.count() == 2)
  }

  test("FUNCTION statement registers a UDF by class name (grammar :24)") {
    val df = Seq(1L, 2L, 3L).toDF("x")
    val out = ScriptEngine.run(spark,
      """FUNCTION dbl 'graft.SampleDoubleFn';
        |g = FROM t GENERATE x, dbl(x) AS y;""".stripMargin,
      env0 = env("t" -> df))("g")
    assert(out.orderBy("x").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 2L), (2L, 4L), (3L, 6L)))
    // reference form: unquoted dotted uri + constant constructor args
    val out2 = ScriptEngine.run(spark,
      """FUNCTION triple graft.SampleDoubleFn('3');
        |g = FROM t GENERATE x, triple(x) AS y;""".stripMargin,
      env0 = env("t" -> df))("g")
    assert(out2.orderBy("x").collect().map(_.getLong(1)).toSeq == Seq(3L, 6L, 9L))
  }

  test("FUNCTION wraps a Pig EvalFunc reflectively (PigEvalFuncWrapper.java:38-51 parity)") {
    // range-based input, NOT a LocalRelation: ConvertToLocalRelation
    // would constant-fold a literal frame driver-side and never exercise
    // TASK SERIALIZATION of the UDF closure — the exact failure mode a
    // captured reflective handle causes on a real cluster
    val df = spark.range(1, 4)
      .select(col("id").as("x"),
        when(col("id") < 3, col("id") * 10).as("y"),
        concat(lit("s"), col("id")).as("s"))
    val out = ScriptEngine.run(spark,
      """FUNCTION padd 'graft.SamplePigAddFunc';
        |FUNCTION pjoin graft.SamplePigJoinFunc('_');
        |g = FROM t GENERATE x, padd(x, y) AS total, pjoin(s, x) AS tag;""".stripMargin,
      env0 = env("t" -> df))("g")
    val rows = out.orderBy("x").collect()
      .map(r => (r.getLong(0), Option(r.get(1)), r.getString(2))).toSeq
    assert(rows == Seq((1L, Some(11L), "s1_1"), (2L, Some(22L), "s2_2"),
      (3L, None, "s3_3")), rows.toString)
    // a class that is neither contract fails loudly at declaration
    val err = intercept[IllegalArgumentException](ScriptEngine.run(spark,
      "FUNCTION bad 'java.lang.StringBuilder';\ng = FROM t GENERATE x;",
      env0 = env("t" -> df)))
    assert(err.getMessage.contains("neither"))
  }

  test("FUNCTION types tuple/bag-returning Pig EvalFuncs from their outputSchema " +
      "(PigEvalFuncWrapper.java:56-99 schema walk)") {
    // range-based, NOT LocalRelation — exercises task serialization of the
    // complex-return converter, and row 3 has a null string to pin null
    // propagation through the bag path
    val df = spark.range(1, 4)
      .select(col("id").as("x"), (col("id") * 10).as("y"),
        when(col("id") < 3, concat(lit("a b"), col("id"))).as("s"))
    val out = ScriptEngine.run(spark,
      """FUNCTION mm 'graft.SamplePigMinMaxFunc';
        |FUNCTION tok graft.SamplePigTokenizeFunc(' ');
        |g = FROM t GENERATE x, mm(x, y) AS r, tok(s) AS parts;""".stripMargin,
      env0 = env("t" -> df))("g")
    // the declared outputSchema drives the Spark-side types, field names
    // included (single TUPLE column → descend; single BAG column → array)
    val rt = out.schema("r").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(rt.fieldNames.toSeq == Seq("lo", "hi"), rt.toString)
    val pt = out.schema("parts").dataType
      .asInstanceOf[org.apache.spark.sql.types.ArrayType]
    assert(pt.elementType.asInstanceOf[org.apache.spark.sql.types.StructType]
      .fieldNames.toSeq == Seq("token", "pos"), pt.toString)
    val rows = out.orderBy("x").collect()
    val r1 = rows(0)
    assert(r1.getStruct(1).getLong(0) == 1L && r1.getStruct(1).getLong(1) == 10L)
    assert(r1.getSeq[org.apache.spark.sql.Row](2).map(p => (p.getString(0), p.getInt(1))) ==
      Seq(("a", 0), ("b1", 1)), rows.mkString("; "))
    assert(rows(1).getSeq[org.apache.spark.sql.Row](2).map(_.getString(0)) == Seq("a", "b2"))
    assert(rows(2).isNullAt(2), "null input must propagate to a null bag")
    // the bag result composes with FLATTEN BAG_TUPLE — one row per token,
    // struct fields promoted to columns (the reference's standard
    // TOKENIZE-then-FLATTEN idiom)
    val flat = ScriptEngine.run(spark,
      """FUNCTION tok graft.SamplePigTokenizeFunc(' ');
        |g = FROM t GENERATE x, tok(s) AS parts;
        |f = FLATTEN g BY parts BAG_TUPLE (token:string, pos:int);""".stripMargin,
      env0 = env("t" -> df))("f")
    val toks = flat.orderBy("x", "pos").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSeq
    assert(toks == Seq((1L, "a", 0), (1L, "b1", 1), (2L, "a", 0), (2L, "b2", 1)),
      toks.toString)
    // nested access into the struct result works downstream
    val lo = ScriptEngine.run(spark,
      """FUNCTION mm 'graft.SamplePigMinMaxFunc';
        |g = FROM t GENERATE mm(x, y) AS r;
        |h = FROM g GENERATE r.lo AS lo;""".stripMargin,
      env0 = env("t" -> df))("h")
    assert(lo.orderBy("lo").collect().map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    // a tuple-returning UDF with no declared outputSchema fails loudly
    val err = intercept[Exception](ScriptEngine.run(spark,
      """FUNCTION bad 'graft.SamplePigBadTupleFunc';
        |g = FROM t GENERATE bad(x) AS r;""".stripMargin,
      env0 = env("t" -> df))("g").collect())
    assert(err.getMessage != null && err.getMessage.contains("outputSchema"),
      String.valueOf(err.getMessage))
    // INPUT-side conversion: struct args arrive as Pig Tuples, array<struct>
    // args as DataBags — the UDF reads them through the Pig data API
    graft.functions.PigUdf.register(spark, "ptupsum",
      classOf[SamplePigTupleArgFunc])
    graft.functions.PigUdf.register(spark, "pbagsum",
      classOf[SamplePigBagArgFunc])
    val in2 = spark.range(1, 4).select(col("id").as("x"), (col("id") * 2).as("y"))
    val got = in2.selectExpr("x", "ptupsum(struct(x, y)) AS ts",
        "pbagsum(array(struct(x AS v), struct(y AS v))) AS bs")
      .orderBy("x").collect().map(r => (r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq((3L, 3L), (6L, 6L), (9L, 9L)), got.toString)
    // conversion is DECLARED-TYPE-driven, never row-shape-driven: an empty
    // bag arrives as an empty DataBag (not a raw Seq) on every row
    val empty = in2.selectExpr(
        "pbagsum(filter(array(struct(x AS v)), e -> e.v < 0)) AS bs")
      .collect().map(_.getLong(0)).toSeq
    assert(empty == Seq(0L, 0L, 0L), empty.toString)
  }

  test("FUNCTION wraps Pig Algebraic/Accumulator UDAFs; algebraic partial-aggregates") {
    // range-derived (NOT LocalRelation) so task serialization of the
    // reflective aggregator is exercised, and v=5 is null to pin
    // null-skipping through Initial/Intermed/Final
    val df = spark.range(1, 7)
      .select((col("id") % 2).as("k"),
        when(col("id") =!= 5, col("id")).as("v"))
    val out = ScriptEngine.run(spark,
      """FUNCTION psum 'graft.SamplePigSumAlgebraic';
        |FUNCTION pmax 'graft.SamplePigMaxAccumulator';
        |g = GROUP t BY k AGGREGATES psum(v) AS s, pmax(v) AS m;""".stripMargin,
      env0 = env("t" -> df))("g")
    // k=0: v ∈ {2,4,6} → sum 12 max 6; k=1: v ∈ {1,3,null} → sum 4 max 3
    val rows = out.orderBy("k").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(rows == Seq((0L, 12L, 6L), (1L, 4L, 3L)), rows.toString)
    // the algebraic path MUST partially aggregate — getIntermed is the
    // combiner stage the reference ran (CubertCombiner parity), and the
    // plan shows it as a partial aggregate before the exchange
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("partial_psum"),
      s"algebraic UDAF did not partial-aggregate:\n$plan")
    // GROUP BY ALL and empty input: Final over an empty bag yields null
    // (Pig SUM semantics), not a crash
    val empty = ScriptEngine.run(spark,
      """FUNCTION psum 'graft.SamplePigSumAlgebraic';
        |g = GROUP t BY ALL AGGREGATES psum(v) AS s;""".stripMargin,
      env0 = env("t" -> df.filter(col("k") < 0)))("g")
    assert(empty.collect().head.isNullAt(0))
    // in a bare GENERATE the registered aggregate behaves as Spark's
    // global aggregate (select(max(v)) semantics) — one row, whole input
    val whole = ScriptEngine.run(spark,
      """FUNCTION pmax 'graft.SamplePigMaxAccumulator';
        |g = FROM t GENERATE pmax(v) AS m;""".stripMargin,
      env0 = env("t" -> df))("g")
    assert(whole.collect().map(_.getLong(0)).toSeq == Seq(6L))
  }

  test("LET bindings compute preprocessor values through Catalyst (free-form JS-preprocessing parity)") {
    import graft.script.ScriptEngine
    val df = Seq((1L, 4L), (2L, 5L)).toDF("x", "y")
    val rels = ScriptEngine.run(spark,
      """LET THRESH = 2 + 2;
        |LET TAG = upper(concat('run_', '$ENV'));
        |LET CUT = CASE WHEN $THRESH > 3 THEN 1 ELSE 99 END;
        |g = FILTER t BY y >= $THRESH;
        |h = FROM g GENERATE x, '$TAG' AS tag, x + $CUT AS xc;""".stripMargin,
      params = Map("ENV" -> "prod"), env0 = env("t" -> df))
    val rows = rels("h").orderBy("x").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(rows.head.getString(1) == "RUN_PROD")
    assert(rows.map(_.getLong(2)).toSeq == Seq(2L, 3L), rows.mkString(";"))
    // the full SQL date/format library is available to bindings
    val d = ScriptEngine.run(spark,
      """LET D = date_format(date_add(DATE'2024-03-01', 9), 'yyyy/MM/dd');
        |g = FROM t GENERATE x, '$D' AS dt;""".stripMargin,
      env0 = env("t" -> df))("g")
    assert(d.collect().head.getString(1) == "2024/03/10")
    // a LET inside a dropped IF branch never evaluates (it would throw)
    val ok = ScriptEngine.run(spark,
      """IF ('x' == 'y') DO
        |  LET BAD = assert_true(false);
        |END IF;
        |g = FROM t GENERATE x;""".stripMargin, env0 = env("t" -> df))("g")
    assert(ok.count() == 2)
    // loud failures: unterminated binding, non-evaluating expression
    val err = intercept[IllegalArgumentException](ScriptEngine.run(spark,
      "LET X = 1 + 1", env0 = env("t" -> df)))
    assert(err.getMessage.contains("missing terminating"), err.getMessage)
    val err2 = intercept[IllegalArgumentException](ScriptEngine.run(spark,
      "LET X = not_a_function(1);\ng = FROM t GENERATE x;", env0 = env("t" -> df)))
    assert(err2.getMessage.contains("does not evaluate"), err2.getMessage)
    // identifier-boundary substitution: a binding D never corrupts $D2
    val pfx = ScriptEngine.run(spark,
      """LET D = 2;
        |LET D2 = 30;
        |g = FILTER t BY y >= $D2;
        |h = FROM g GENERATE x + $D AS xd;""".stripMargin,
      env0 = env("t" -> df))
    assert(pfx("g").count() == 0, "binding D corrupted $D2 (y >= 22 matched)")
    assert(pfx("h").count() == 0)
    // per-replica shadowing: a LET inside a FOREACH body re-binds per
    // iteration; lowercase `let` is the same keyword (grammar parity with
    // foreach/if); escaped quotes inside the expression scan correctly
    val shadow = ScriptEngine.run(spark,
      """FOREACH V IN ('a', 'b') DO
        |  let TAG = upper('$V');
        |  out_$V = FROM t GENERATE x, '$TAG' AS tag;
        |END FOREACH;
        |LET QLEN = length('it\'s; fine');
        |q = FROM t GENERATE x + $QLEN AS s;""".stripMargin,
      env0 = env("t" -> df))
    assert(shadow("out_a").select("tag").distinct().collect()
      .map(_.getString(0)).toSeq == Seq("A"))
    assert(shadow("out_b").select("tag").distinct().collect()
      .map(_.getString(0)).toSeq == Seq("B"),
      "FOREACH replica b saw replica a's LET binding")
    // the escaped quote and the ; inside the literal scanned correctly:
    // length("it's; fine") = 10
    assert(shadow("q").orderBy("s").collect().map(_.getLong(0)).toSeq
      == Seq(11L, 12L))
    // a re-binding's own RHS composes over the prior value; names are
    // CASE-SENSITIVE (only the LET keyword is not): d is a new binding,
    // not a re-binding of D
    val rebind = ScriptEngine.run(spark,
      """LET X = 1;
        |LET X = $X + 1;
        |LET D = 2;
        |LET d = 100;
        |g = FROM t GENERATE x + $X AS xs, x + $d + $D AS xd;""".stripMargin,
      env0 = env("t" -> df))("g")
    val rb = rebind.orderBy("xs").collect()
    assert(rb.map(_.getLong(0)).toSeq == Seq(3L, 4L), rb.mkString(";"))
    assert(rb.map(_.getLong(1)).toSeq == Seq(103L, 104L),
      "a differently-cased LET truncated the first binding's scope")
    // the scope-stop scan is quote-aware like the expression scan: a
    // re-binding whose RHS holds a quoted ';' still ends where Spark says
    val qrb = ScriptEngine.run(spark,
      """LET X = 1;
        |LET X = $X + length('a;b');
        |g = FROM t GENERATE x + $X AS xs;""".stripMargin,
      env0 = env("t" -> df))("g")
    assert(qrb.orderBy("xs").collect().map(_.getLong(0)).toSeq == Seq(5L, 6L))
    // an IF condition referencing a LET binding fails LOUDLY: LET expands
    // after IF, so the condition would silently compare the literal "$X"
    val ifLet = intercept[IllegalArgumentException](ScriptEngine.run(spark,
      """LET X = 2 + 2;
        |IF ('$X' == '4') DO
        |  g = FROM t GENERATE x;
        |END IF;""".stripMargin, env0 = env("t" -> df)))
    assert(ifLet.getMessage.contains("LET expands AFTER IF"), ifLet.getMessage)
    // ...including a LET defined after the IF (the token is equally
    // unresolved at condition time)
    val ifLet2 = intercept[IllegalArgumentException](ScriptEngine.run(spark,
      """IF (%Y% == 4) DO
        |  g = FROM t GENERATE x;
        |END IF;
        |LET Y = 4;""".stripMargin, env0 = env("t" -> df)))
    assert(ifLet2.getMessage.contains("LET expands AFTER IF"), ifLet2.getMessage)
    // a value carrying a quote or ';' that splices into a RE-BINDING's
    // RHS would desynchronize the quote-aware scope scan — loud failure
    val desync = intercept[IllegalArgumentException](ScriptEngine.run(spark,
      """LET B = concat('a', ';', 'b');
        |LET B = upper('$B');
        |g = FROM t GENERATE x, '$B' AS s;""".stripMargin, env0 = env("t" -> df)))
    assert(desync.getMessage.contains("desynchronize"), desync.getMessage)
    // ...and equally loudly into a DIFFERENT binding's RHS — an unquoted
    // ';' in the value would otherwise truncate that binding's scan and
    // inject the remainder as statements
    val desync2 = intercept[IllegalArgumentException](ScriptEngine.run(spark,
      """LET A = concat('1', ';', ' h = FILTER t BY x > 0');
        |LET B = $A;
        |g = FROM t GENERATE x;""".stripMargin, env0 = env("t" -> df)))
    assert(desync2.getMessage.contains("LET B"), desync2.getMessage)
    // a trailing backslash would escape the host binding's closing quote
    // — caught by the same guard
    val desync3 = intercept[IllegalArgumentException](ScriptEngine.run(spark,
      """LET A = concat('x', chr(92));
        |LET B = upper('$A');
        |g = FROM t GENERATE x;""".stripMargin, env0 = env("t" -> df)))
    assert(desync3.getMessage.contains("LET B"), desync3.getMessage)
    // a LINE BREAK in a value is rejected outright — substituted into any
    // position it could mint a phantom line-anchored LET/IF/FOREACH head
    // on the next pass (evaluated and excised out of the host statement)
    val multiline = intercept[IllegalArgumentException](ScriptEngine.run(spark,
      """LET A = concat(chr(10), 'LET EVIL = 99;');
        |g = FROM t GENERATE x, '$A' AS s;""".stripMargin, env0 = env("t" -> df)))
    assert(multiline.getMessage.contains("line terminator"), multiline.getMessage)
    // ...including the non-\n\r Java line terminators (NEL anchors (?m)^)
    val nel = intercept[IllegalArgumentException](ScriptEngine.run(spark,
      """LET A = concat(chr(133), 'LET EVIL = 99;');
        |g = FROM t GENERATE x, '$A' AS s;""".stripMargin, env0 = env("t" -> df)))
    assert(nel.getMessage.contains("line terminator"), nel.getMessage)
    // and the backstop: a single-line value that MINTS a head where its
    // token opened a continuation line fails loudly, never evaluates
    val mint = intercept[IllegalArgumentException](ScriptEngine.run(spark,
      "LET A = 'LET Y = 1';\ng = FROM t GENERATE x,\n$A AS s;",
      env0 = env("t" -> df)))
    assert(mint.getMessage.contains("new"), mint.getMessage)
    // benign siblings still pass: a ';'-carrying value used only in
    // statement text, and a re-binding that never references the value
    val benign = ScriptEngine.run(spark,
      """LET A = concat('a', ';', 'b');
        |LET C = 'first';
        |LET C = 'second';
        |g = FROM t GENERATE x, '$A' AS s, '$C' AS c;""".stripMargin,
      env0 = env("t" -> df))("g")
    val bRow = benign.orderBy("x").collect().head
    assert(bRow.getString(1) == "a;b" && bRow.getString(2) == "second")
  }

  test("preprocessor fuzz: random FOREACH/IF/LET nests expand or fail loudly (seeded)") {
    import graft.script.ScriptEngine
    // 300 deterministic random scripts assembled from grammar fragments —
    // including unterminated/interleaved forms. The contract under fuzz:
    // expansion either returns (balanced text) or throws
    // IllegalArgumentException with a message; never a StackOverflow,
    // a hang, or a silent mis-parse surfacing as some other exception.
    val rnd = new scala.util.Random(20260815L)
    val frags = Array(
      "LET X = 1 + 1;\n", "LET X = $X + 1;\n", "LET y2 = upper('a');\n",
      "LET B = '$X';\n", "LET C = concat('a', ';', 'b');\n",
      "IF ('a' == 'a') DO\n", "IF (%P% >= 2) DO\n", "ELSE DO\n", "END IF;\n",
      "FOREACH V IN ('p', 'q') DO\n", "END FOREACH;\n",
      "g_$V = FROM t GENERATE x + $X AS c;\n", "h = FILTER t BY x > 0;\n",
      "-- comment $X\n", "IF ('$X' == '2') DO\n", "LET X = 'LET Z = 9';\n")
    var ok = 0; var loud = 0
    for (_ <- 0 until 300) {
      val n = 1 + rnd.nextInt(6)
      val script = Seq.fill(n)(frags(rnd.nextInt(frags.length))).mkString
      try {
        val out = ScriptEngine.expandLets(spark,
          ScriptEngine.expandIf(
            ScriptEngine.expandForeach(script.replace("%P%", "3"))))
        // successful expansion leaves no block machinery behind (orphan
        // tails fail loudly inside the expanders — found BY this fuzz)
        assert(!out.toUpperCase.contains("END FOREACH") &&
          !out.toUpperCase.contains("END IF") &&
          !out.toUpperCase.contains("ELSE DO"), s"unconsumed tail in:\n$script")
        ok += 1
      } catch {
        case e: IllegalArgumentException =>
          assert(e.getMessage != null && e.getMessage.nonEmpty); loud += 1
      }
    }
    // both outcomes must actually occur or the generator is degenerate
    assert(ok > 20 && loud > 20, s"degenerate fuzz mix: ok=$ok loud=$loud")
  }

  test("LET value fuzz: adversarial values substitute consistently or fail loudly (seeded)") {
    import graft.script.ScriptEngine
    // value-level companion to the block-structure fuzz: the VALUES are
    // adversarial (quotes, backslashes, semicolons, $/% metacharacters,
    // line terminators, NULL, phantom-LET spellings) rather than the
    // nesting. Contract: expandLets either returns text with every head
    // consumed AND is idempotent on its own output (a second pass is a
    // no-op — phantom heads minted by substitution would violate this),
    // or throws IllegalArgumentException with a message.
    val rnd = new scala.util.Random(20260815L)
    val names = Array("X", "X2", "Y")
    val exprs = Array(
      "1 + 1", "'a' || 'b'", "upper('qq')", "chr(36) || 'Y'", "'%Y%'",
      "concat('a', ';', 'b')", "chr(10) || 'x'", "NULL", "''",
      "'LET Q = 9'", "repeat('z', 5)", "$X + 1", "'$X2'", "0.5 * 4",
      "chr(92)", "'$'", "trim('  p  ')")
    val stmts = Array(
      "g = FROM t GENERATE x, '$X' AS a;\n", "h = FILTER t BY x > $Y;\n",
      "k = FROM t GENERATE x, '%X2%' AS b;\n", "-- comment $X %Y%\n",
      "m = FROM t GENERATE x + $X2 AS c;\n")
    val letHead = "(?m)^[ \\t]*(?i:LET)\\s+[A-Za-z_][A-Za-z0-9_]*\\s*=".r
    var ok = 0; var loud = 0
    for (_ <- 0 until 300) {
      val n = 1 + rnd.nextInt(5)
      val lets = Seq.fill(n)(
        s"LET ${names(rnd.nextInt(names.length))} = ${exprs(rnd.nextInt(exprs.length))};\n")
      val body = Seq.fill(1 + rnd.nextInt(3))(stmts(rnd.nextInt(stmts.length)))
      val script = rnd.shuffle(lets ++ body).mkString
      try {
        val out = ScriptEngine.expandLets(spark, script)
        assert(letHead.findFirstIn(out).isEmpty, s"unconsumed LET in:\n$script\n->\n$out")
        assert(ScriptEngine.expandLets(spark, out) == out,
          s"expansion not idempotent (phantom head?) for:\n$script\n->\n$out")
        ok += 1
      } catch {
        case e: IllegalArgumentException =>
          assert(e.getMessage != null && e.getMessage.nonEmpty); loud += 1
      }
    }
    assert(ok > 20 && loud > 20, s"degenerate fuzz mix: ok=$ok loud=$loud")
  }

  test("operator-grammar fuzz: seeded statement chains analyze; token mutants fail loudly") {
    import graft.script.ScriptEngine
    // Round-14 companion to the two preprocessor fuzzes: the OPERATOR-
    // STATEMENT grammar itself. Valid scripts are chains of composable
    // productions (every production's output keeps (id, k, v), so any
    // production can feed any other); mutants are token-level typos over
    // a valid chain. Contract:
    //  - a generated-valid script MUST run (dryRun analysis) — a throw is
    //    either a generator bug or a parser bug, both loud test failures;
    //  - a mutant either still runs or throws a MESSAGE-FUL error of a
    //    parse/analysis kind (IllegalArgumentException from the parser,
    //    AnalysisException/ParseException from Catalyst, the engine's
    //    "undefined relation" RuntimeException, NumberFormatException on a
    //    mangled literal) — never a StackOverflow, NPE, MatchError,
    //    index-out-of-bounds, or hang.
    val df = Seq((1, "a", 10.0), (2, "a", 20.0), (3, "b", 5.0)).toDF("id", "k", "v")
    val rnd = new scala.util.Random(20260815L)
    // prelude relations every chain may reference: a dictionary for
    // ENCODE/DECODE and a join side with non-colliding column names
    val prelude = "d0 = DICTIONARY t ON k;\nr0 = FROM t GENERATE k, v AS vr;\n"
    def prods(n: String, a: String): Array[String] = Array(
      s"$n = FILTER $a BY v > 1;",
      s"$n = FROM $a GENERATE id, k, v, v * 2 AS v2;",
      s"$n = FROM $a GENERATE id, upper(k) AS k, v;",
      s"$n = LIMIT $a 2;",
      s"$n = DISTINCT $a;",
      s"$n = DUPLICATE $a 2 TIMES COUNTER AS cnum;",
      s"$n = NO_OP $a;",
      s"$n = PIVOT $a ON k;",
      s"$n = COMBINE $a, $a SORTED ON id;",
      s"$n = SORT $a ON id, v DESC;",
      s"$n = SHUFFLE $a PARTITIONED ON k SORTED ON id;",
      s"$n = GROUP $a BY k AGGREGATES SUM(v) AS v, MIN(id) AS id;",
      s"$n = CUBE $a BY k AGGREGATES SUM(v) AS v, MAX(id) AS id;",
      s"$n = ROLLUP $a BY k AGGREGATES SUM(v) AS v, MIN(id) AS id;",
      s"$n = TOP 2 FROM $a GROUP BY k ORDER BY v DESC;",
      s"$n = RANK $a AS rnk GROUP BY k ORDER BY v;",
      s"$n = JOIN $a BY k, r0 BY k;",
      s"$n = HASH-JOIN $a BY k, r0 BY k;",
      s"$n = GATHER $a, $a;",
      s"$n = TEE $a INTO '/tmp/graft-fuzz-tee' USING PARQUET IF v > 1;",
      s"${n}_e = ENCODE $a ON k USING d0;\n$n = DECODE ${n}_e ON k USING d0;")
    // terminal productions may change the schema (nothing consumes them)
    def terminals(n: String, a: String): Array[String] = Array(
      s"$n = GROUP $a BY ALL AGGREGATES SUM(v) AS sv;",
      s"$n = CUBE $a BY k INNER id AGGREGATES MAX(SUM(v)) AS mv;",
      s"$n = CUBE $a BY k AGGREGATES COUNT(1) AS n_rows GROUPING COMBOS 1;")
    def genValid(): String = {
      val sb = new StringBuilder(prelude)
      var rels = Vector("t")
      val n = 1 + rnd.nextInt(6)
      for (i <- 0 until n) {
        val name = s"x$i"
        val src = rels(rnd.nextInt(rels.length))
        sb.append(prods(name, src)(rnd.nextInt(prods(name, src).length))).append('\n')
        rels :+= name
      }
      if (rnd.nextBoolean())
        sb.append(terminals("z", rels.last)(rnd.nextInt(3))).append('\n')
      sb.toString
    }
    val kws = Array("FILTER", "GENERATE", "BY", "USING", "GROUP", "AGGREGATES",
      "ORDER", "JOIN", "ON", "INTO", "AS", "FROM", "DISTINCT", "SORTED")
    def mutate(s: String): String = rnd.nextInt(7) match {
      case 0 => // delete a short span
        val i = rnd.nextInt(s.length); s.take(i) + s.drop(i + 1 + rnd.nextInt(3))
      case 1 => // duplicate a word token
        val ws = "[A-Za-z_][A-Za-z0-9_]*".r.findAllMatchIn(s).toVector
        if (ws.isEmpty) s else { val m = ws(rnd.nextInt(ws.length))
          s.take(m.end) + " " + m.matched + s.drop(m.end) }
      case 2 => // swap one keyword for another
        val hits = kws.flatMap(k => ("\\b" + k + "\\b").r.findAllMatchIn(s)
          .map(m => (m.start, m.end))).toVector
        if (hits.isEmpty) s else { val (a, b) = hits(rnd.nextInt(hits.length))
          s.take(a) + kws(rnd.nextInt(kws.length)) + s.drop(b) }
      case 3 => // drop a semicolon
        val is = s.zipWithIndex.filter(_._1 == ';').map(_._2)
        if (is.isEmpty) s else { val i = is(rnd.nextInt(is.length))
          s.take(i) + s.drop(i + 1) }
      case 4 => s.take(1 + rnd.nextInt(s.length)) // truncate
      case 5 => // inject a stray punct
        val i = rnd.nextInt(s.length)
        s.take(i) + ";,()=.#".charAt(rnd.nextInt(7)) + s.drop(i)
      case _ => // reference an undefined relation
        "\\bx\\d+\\b".r.replaceFirstIn(s, "zzz_undefined")
    }
    def isLoud(e: Throwable): Boolean = e match {
      case _: IllegalArgumentException | _: org.apache.spark.sql.AnalysisException |
           _: NumberFormatException => e.getMessage != null && e.getMessage.nonEmpty
      case r: RuntimeException if r.getClass == classOf[RuntimeException] =>
        r.getMessage != null && r.getMessage.nonEmpty
      case _ => false
    }
    var validOk = 0; var mutOk = 0; var mutLoud = 0
    for (_ <- 0 until 120) {
      val script = genValid()
      val out = ScriptEngine.run(spark, script, env0 = env("t" -> df), dryRun = true)
      assert(out.nonEmpty && out.values.forall(_.schema.nonEmpty), s"empty result for:\n$script")
      validOk += 1
      for (_ <- 0 until 2) {
        val m = mutate(script)
        try { ScriptEngine.run(spark, m, env0 = env("t" -> df), dryRun = true); mutOk += 1 }
        catch {
          case e: Throwable =>
            assert(isLoud(e),
              s"non-loud failure ${e.getClass.getName}: ${e.getMessage}\nscript:\n$m")
            mutLoud += 1
        }
      }
    }
    // the generator must exercise both mutant outcomes to mean anything
    assert(validOk == 120 && mutOk > 20 && mutLoud > 100,
      s"degenerate fuzz mix: valid=$validOk mutOk=$mutOk mutLoud=$mutLoud")
  }

  test("LET metacharacter values: cascade and boundary semantics are pinned") {
    import graft.script.ScriptEngine
    // textual-macro cascade: a value that SPELLS a later binding's token
    // is rewritten when that binding expands (LETs run top-to-bottom on
    // the text) — macro semantics, same as the reference's JS templating
    val casc = ScriptEngine.expandLets(spark,
      "LET A = '%B%';\nLET B = 2;\ng = FROM t GENERATE '$A' AS a;")
    assert(casc.contains("'2' AS a"), casc)
    val dollar = ScriptEngine.expandLets(spark,
      "LET D = chr(36) || 'B';\nLET B = 3;\ng = FROM t GENERATE '$D' AS a;")
    assert(dollar.contains("'3' AS a"), dollar)
    // self-spelling value: $X's value is the literal text "$X" — the
    // substitution is a single pass, so it stays literal (no loop)
    val self = ScriptEngine.expandLets(spark,
      "LET X = chr(36) || 'X';\ng = FROM t GENERATE '$X' AS a;")
    assert(self.contains("'$X' AS a"), self)
    // identifier-boundary: binding X never corrupts the $X2 token
    val bnd = ScriptEngine.expandLets(spark,
      "LET X = 5;\nLET X2 = 7;\ng = FROM t GENERATE $X2 AS a, $X AS b;")
    assert(bnd.contains("7 AS a") && bnd.contains("5 AS b"), bnd)
    // %-spelling cascade composes with the %name% form too
    val pct = ScriptEngine.expandLets(spark,
      "LET P = 9;\ng = FROM t GENERATE %P% AS a;")
    assert(pct.contains("9 AS a"), pct)
  }

  test("orphan-token guards ignore quoted literals and -- comments") {
    import graft.script.ScriptEngine
    val df = Seq((1L, 2L)).toDF("x", "y")
    // a script with NO block heads that merely contains the reserved words
    // inside string literals / comments must pass through to SQL unchanged
    // (pre-guard behavior) — the guards scan literal/comment-masked text
    val rels = ScriptEngine.run(spark,
      """-- note: end if / else do / end foreach here are just words
        |g = FROM t GENERATE x, 'end if' AS a, "ELSE DO" AS b,
        |    'END FOREACH' AS c;""".stripMargin, env0 = env("t" -> df))
    val row = rels("g").collect().head
    assert(row.getString(1) == "end if" && row.getString(2) == "ELSE DO" &&
      row.getString(3) == "END FOREACH")
    // real orphans (outside literals) still fail loudly with the diagnosis
    for ((bad, msg) <- Seq(
        ("g = FROM t GENERATE x;\nEND IF;", "END IF without"),
        ("g = FROM t GENERATE x;\nELSE DO", "ELSE DO without"),
        ("g = FROM t GENERATE x;\nEND FOREACH;", "END FOREACH without"))) {
      val e = intercept[IllegalArgumentException](
        ScriptEngine.run(spark, bad, env0 = env("t" -> df)))
      assert(e.getMessage.contains(msg), s"$bad => ${e.getMessage}")
    }
    // masking is escape-aware: a backslash-escaped quote doesn't
    // desynchronize the scanner into masking real tokens
    val masked = ScriptEngine.maskLiteralsAndComments(
      "a = 'it\\'s END IF data'; END IF;")
    assert(!masked.substring(0, 24).contains("END IF"))
    assert(masked.contains("END IF;"))
    // the filler is # not space: a trailing comment between ELSE and a
    // next-line DO must not space-blank into a phantom "ELSE DO" orphan
    // (\s+ in that pattern crosses newlines) — this script has no IF head
    // and must keep passing through to SQL as it did pre-guard
    val rels2 = ScriptEngine.run(spark,
      """g = FROM t GENERATE x, CASE WHEN x > 0 THEN 1 ELSE -- fallback
        |DO_NOT_MIND_ME END AS c;""".stripMargin
        .replace("DO_NOT_MIND_ME", "0"), env0 = env("t" -> df))
    assert(rels2("g").collect().head.getInt(1) == 1)
    val m2 = ScriptEngine.maskLiteralsAndComments("ELSE -- note\nDO x")
    assert(!"(?i)\\bELSE\\s+DO\\b".r.findFirstIn(m2).isDefined, m2)
  }

  test("preprocessor IF/ELSE includes and excludes statements (JS-templating parity)") {
    import graft.script.ScriptEngine
    val df = Seq((1L, 2L)).toDF("x", "y")
    val out = java.nio.file.Files.createTempDirectory("graft-if").toString
    // prod branch taken: conditional STORE runs, ELSE branch does not
    ScriptEngine.run(spark,
      """IF ('%ENV%' == 'prod') DO
        |  STORE t INTO '%OUT%/prod' USING PARQUET;
        |ELSE DO
        |  STORE t INTO '%OUT%/dev' USING PARQUET;
        |END IF;""".stripMargin,
      params = Map("ENV" -> "prod", "OUT" -> out), env0 = env("t" -> df))
    assert(new java.io.File(s"$out/prod").exists())
    assert(!new java.io.File(s"$out/dev").exists())
    // else branch taken; AND/OR and numeric comparison forms
    ScriptEngine.run(spark,
      """IF ('%ENV%' == 'prod' AND %SF% >= 10) DO
        |  STORE t INTO '%OUT%/big' USING PARQUET;
        |ELSE DO
        |  STORE t INTO '%OUT%/small' USING PARQUET;
        |END IF;""".stripMargin,
      params = Map("ENV" -> "prod", "SF" -> "2", "OUT" -> out), env0 = env("t" -> df))
    assert(!new java.io.File(s"$out/big").exists())
    assert(new java.io.File(s"$out/small").exists())
    // numeric compare is numeric, not lexicographic ('9' < '10')
    assert(ScriptEngine.evalCond("9 < 10"))
    assert(!ScriptEngine.evalCond("'b' < 'a'"))
    assert(ScriptEngine.evalCond("'x' != 'y' OR false"))
    assert(ScriptEngine.evalCond("true"))
    // IF without ELSE, condition false: body vanishes entirely
    val rels = ScriptEngine.run(spark,
      """g = FROM t GENERATE x;
        |IF (false) DO
        |  h = FROM t GENERATE y;
        |END IF;""".stripMargin, env0 = env("t" -> df))
    assert(rels.contains("g") && !rels.contains("h"))
    // nesting: inner IF inside outer ELSE; FOREACH var feeds the condition
    val nested = ScriptEngine.run(spark,
      """FOREACH D IN ('a', 'b') DO
        |IF ('$D' == 'a') DO
        |  r_$D = FROM t GENERATE x;
        |END IF;
        |END FOREACH;""".stripMargin, env0 = env("t" -> df))
    assert(nested.contains("r_a") && !nested.contains("r_b"))
    // malformed: missing END IF fails loudly
    val err = intercept[Exception](ScriptEngine.run(spark,
      "IF (true) DO\ng = FROM t GENERATE x;", env0 = env("t" -> df)))
    assert(err.getMessage.contains("missing END IF"), err.getMessage)
  }

  test("preprocessor blocks coexist with phase END; quoted AND/OR stay values") {
    import graft.script.ScriptEngine
    val df = Seq((1L, 2L)).toDF("x", "y")
    // a bare phase END (JOB … END) followed by an IF head must NOT read
    // as "END IF" — the terminator requires END IF on one line
    val rels = ScriptEngine.run(spark,
      """JOB 'first'
        |g = FROM t GENERATE x;
        |END
        |IF (true) DO
        |  h = FROM t GENERATE y;
        |END IF;""".stripMargin, env0 = env("t" -> df))
    assert(rels.contains("g") && rels.contains("h"), rels.keySet.toString)
    // same hazard for FOREACH
    val rels2 = ScriptEngine.run(spark,
      """JOB 'j'
        |g = FROM t GENERATE x;
        |END
        |FOREACH V IN ('a') DO
        |  r_$V = FROM t GENERATE y;
        |END FOREACH;""".stripMargin, env0 = env("t" -> df))
    assert(rels2.contains("r_a"), rels2.keySet.toString)
    // AND/OR inside a quoted operand are value text, not connectives
    assert(ScriptEngine.evalCond("'NORTH AND SOUTH' == 'NORTH AND SOUTH'"))
    assert(ScriptEngine.evalCond("'x' == 'y' OR 'OR' == 'OR'"))
    assert(!ScriptEngine.evalCond("'a OR b' == 'c'"))
    // \b semantics: '_' is a word char, so bare tokens containing _OR_/_AND_
    // are operands, not connectives
    assert(ScriptEngine.evalCond("X_OR_Y == X_OR_Y"))
    assert(!ScriptEngine.evalCond("NORTH_AND_SOUTH == 'c'"))
  }

  test("preprocessor $DATE computes offset dates in paths (JS date arithmetic parity)") {
    import graft.script.ScriptEngine
    // literal base: deterministic, leap-year-aware, custom pattern
    assert(ScriptEngine.expandDates("x/$DATE('2024-03-01', -1, 'yyyy-MM-dd')") ==
      "x/2024-02-29")
    assert(ScriptEngine.expandDates("$DATE('20240115', +6, 'yyyyMMdd')") == "20240121")
    assert(ScriptEngine.expandDates("$DATE('2024-01-15', 0)") == "2024-01-15")
    // 'today' resolves against the driver clock (UTC)
    val today = java.time.LocalDate.now(java.time.ZoneOffset.UTC)
    val got = ScriptEngine.expandDates("$DATE('today', -1, 'yyyyMMdd')")
    val want = today.minusDays(1)
      .format(java.time.format.DateTimeFormatter.ofPattern("yyyyMMdd"))
    val wantAlt = today.minusDays(2) // midnight-crossing slack
      .format(java.time.format.DateTimeFormatter.ofPattern("yyyyMMdd"))
    assert(got == want || got == wantAlt, got)
    // end-to-end: a dated STORE path lands where the script computed it
    val df = Seq((1L, 2L)).toDF("x", "y")
    val out = java.nio.file.Files.createTempDirectory("graft-date").toString
    ScriptEngine.run(spark,
      """STORE t INTO '%OUT%/dt=$DATE('20240301', -1, 'yyyyMMdd')' USING PARQUET;""".stripMargin,
      params = Map("OUT" -> out), env0 = env("t" -> df))
    assert(new java.io.File(s"$out/dt=20240229").exists())
  }

  test("CREATE DICTIONARY with explicit values encodes in declaration order (grammar :30)") {
    val df = Seq((1L, "red"), (2L, "blue"), (3L, "red")).toDF("id", "color")
    val rels = ScriptEngine.run(spark,
      """CREATE DICTIONARY pal COLUMN color VALUES 'red', 'green', 'blue';
        |e = ENCODE t ON color USING pal;""".stripMargin,
      env0 = env("t" -> df))
    assert(rels("pal").orderBy("code").collect().map(r => (r.getString(1), r.getInt(2))).toSeq ==
      Seq(("red", 1), ("green", 2), ("blue", 3)))
    val enc = rels("e").orderBy("id").collect().map(_.getInt(1)).toSeq
    assert(enc == Seq(1, 3, 1)) // red=1, blue=3 per declaration order
  }

  test("shipped URL / gap-fill / winsorize plug-ins run from scripts") {
    import graft.script.ScriptEngine
    val pages = Seq(
      (1L, "HTTPS://WWW.E.com/p?id=1&utm_x=a"),
      (2L, "https://e.com:443/p?id=1"),
      (3L, "https://e.com/p?id=2#frag")).toDF("doc_id", "url")
    val rels = ScriptEngine.run(spark,
      """n = OPERATOR 'graft.script.ops.UrlNormalize' pages ('parts': 'true');
        |d = OPERATOR 'graft.script.ops.UrlDedup' pages;""".stripMargin,
      env0 = env("pages" -> pages))
    val norm = rels("n").orderBy("doc_id").collect()
    assert(norm.map(_.getAs[String]("url_norm")).toSeq == Seq(
      "https://e.com/p?id=1", "https://e.com/p?id=1", "https://e.com/p?id=2"))
    assert(norm.forall(_.getAs[String]("host") == "e.com"))
    assert(rels("d").select("doc_id").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 3L))

    val ev = Seq((1L, 100L, 1.0, 1L), (1L, 310L, 3.0, 2L)).toDF("k", "ts", "v", "id")
    val g = ScriptEngine.run(spark,
      """g = OPERATOR 'graft.script.ops.GapFill' ev
        |  ('key': 'k', 'ts': 'ts', 'value': 'v', 'step': '100', 'tieBreak': 'id');""".stripMargin,
      env0 = env("ev" -> ev))("g")
    assert(g.orderBy("bucket").collect().map(r =>
      (r.getAs[Long]("bucket"), r.getAs[Boolean]("observed"), r.getAs[Double]("v"))).toSeq ==
      Seq((100L, true, 1.0), (200L, false, 1.0), (300L, true, 3.0)))

    val nums = spark.range(100).selectExpr("id AS rid", "CAST(id AS DOUBLE) AS x")
    val w = ScriptEngine.run(spark,
      """w = OPERATOR 'graft.script.ops.Winsorize' nums
        |  ('value': 'x', 'key': 'rid', 'lo': '0.1', 'hi': '0.9', 'k': '32');""".stripMargin,
      env0 = env("nums" -> nums))("w")
    val rows = w.collect()
    assert(rows.length == 100)
    rows.foreach { r =>
      val c = r.getAs[Double]("x_clipped")
      assert(c >= r.getAs[Double]("lo_bound") && c <= r.getAs[Double]("hi_bound"))
    }
  }

  test("shipped funnel and retention plug-ins run from scripts") {
    import graft.script.ScriptEngine
    val ev = Seq((1L, 10L, "view"), (1L, 20L, "click"), (2L, 10L, "view"))
      .toDF("user_id", "ts", "event_type")
    val rels = ScriptEngine.run(spark,
      """f = OPERATOR 'graft.script.ops.Funnel' ev
        |  ('key': 'user_id', 'ts': 'ts',
        |   'steps': "event_type = 'view'; event_type = 'click'");
        |r = OPERATOR 'graft.script.ops.Retention' ev
        |  ('key': 'user_id', 'ts': 'ts', 'dayUs': '100');""".stripMargin,
      env0 = env("ev" -> ev))
    val f = rels("f").collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(f == Map(1L -> 2L, 2L -> 1L))
    assert(rels("r").collect().map(_.getLong(2)).sum == 2L)

    val m = Seq(("A", 1L), ("A", 3L), ("B", 2L)).toDF("variant", "qv")
    val ab = ScriptEngine.run(spark,
      "z = OPERATOR 'graft.script.ops.AbTest' m ('variant': 'variant', 'value': 'qv');",
      env0 = env("m" -> m))("z")
    assert(ab.count() == 1 && ab.columns.contains("z"))
    val tr = ScriptEngine.run(spark,
      """t = OPERATOR 'graft.script.ops.Transitions' ev
        |  ('key': 'user_id', 'ts': 'ts', 'state': 'event_type', 'tieBreak': 'ts');""".stripMargin,
      env0 = env("ev" -> ev))("t")
    assert(tr.collect().map(r => (r.getString(0), r.getString(1))).toSet ==
      Set(("view", "click")))
  }

  test("shipped image plug-ins probe and featurize real PNGs from scripts") {
    import graft.script.ScriptEngine
    val img = new java.awt.image.BufferedImage(6, 4,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val df = Seq((1L, bos.toByteArray)).toDF("doc_id", "payload")
    val rels = ScriptEngine.run(spark,
      """p = OPERATOR 'graft.script.ops.ImageProbe' imgs;
        |f = OPERATOR 'graft.script.ops.ImageFeatures' imgs ('bins': '8');""".stripMargin,
      env0 = env("imgs" -> df))
    val probe = rels("p").collect().head
    assert(probe.getBoolean(1) && probe.getInt(2) == 6 && probe.getInt(3) == 4)
    assert(rels("f").collect().head.getSeq[Float](1).sum == 1.0f)
  }

  test("shipped audio plug-ins probe and featurize real WAVs from scripts") {
    import graft.script.ScriptEngine
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val pcm = new Array[Byte](2000 * 2) // 2000 silent frames = 250ms
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, 2000L)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val df = Seq((1L, bos.toByteArray)).toDF("doc_id", "payload")
    val rels = ScriptEngine.run(spark,
      """p = OPERATOR 'graft.script.ops.AudioProbe' snd;
        |f = OPERATOR 'graft.script.ops.AudioFeatures' snd ('windows': '4');""".stripMargin,
      env0 = env("snd" -> df))
    val probe = rels("p").collect().head
    assert(probe.getBoolean(1) && probe.getInt(3) == 8000 && probe.getLong(5) == 250L)
    assert(rels("f").collect().head.getSeq[Float](1).sum == 0f) // silence
  }

  test("shipped video plug-ins probe, featurize, and frame-sample real MJPEG AVIs from scripts") {
    import graft.script.ScriptEngine
    def jpeg(lum: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(8, 6,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 6; x <- 0 until 8)
        img.setRGB(x, y, (lum << 16) | (lum << 8) | lum)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    val avi = graft.multimodal.Video.writeAvi(Seq(jpeg(10), jpeg(20), jpeg(30)),
      width = 8, height = 6, fps = 5)
    val df = Seq((1L, avi)).toDF("doc_id", "payload")
    val rels = ScriptEngine.run(spark,
      """p = OPERATOR 'graft.script.ops.VideoProbe' vids;
        |f = OPERATOR 'graft.script.ops.VideoFeatures' vids ('dim': '8');
        |s = OPERATOR 'graft.script.ops.FrameSample' vids ('n': '2');""".stripMargin,
      env0 = env("vids" -> df))
    val probe = rels("p").collect().head
    assert(probe.getBoolean(1) && probe.getInt(2) == 8 && probe.getInt(3) == 6 &&
      probe.getInt(4) == 3 && probe.getLong(5) == 600L, probe.toString)
    // flat dark frames: all histogram mass in the lowest bins
    val feats = rels("f").collect().head.getSeq[Float](1)
    assert(math.abs(feats.sum - 1.0f) < 1e-5, feats.toString)
    assert(feats.take(2).sum > 0.99f, feats.toString)
    val frames = rels("s").collect()
    assert(frames.length == 2 && frames.forall(r =>
      graft.multimodal.Images.decode(r.getAs[Array[Byte]]("frame_bytes")).isDefined))
  }

  test("concurrency, skyline, and cms join-size plug-ins run from scripts") {
    import graft.script.ScriptEngine
    val iv = Seq((0L, 10L), (5L, 15L)).toDF("s", "e")
    val pts = Seq((1, 5), (5, 1), (3, 3), (2, 2)).toDF("x", "y")
    val a = Seq("a", "a", "b").toDF("k")
    val b = Seq("a", "b").toDF("k")
    val rels = ScriptEngine.run(spark,
      """c = OPERATOR 'graft.script.ops.Concurrency' iv ('start': 's', 'end': 'e');
        |sk = OPERATOR 'graft.script.ops.Skyline' pts ('max': 'x,y');
        |ja = OPERATOR 'graft.script.ops.CmsBuild' ta ('term': 'k', 'width': '1024');
        |jb = OPERATOR 'graft.script.ops.CmsBuild' tb ('term': 'k', 'width': '1024');
        |js = OPERATOR 'graft.script.ops.CmsJoinSize' ja, jb;""".stripMargin,
      env0 = env("iv" -> iv, "pts" -> pts, "ta" -> a, "tb" -> b))
    val conc = rels("c").collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(conc == Map(0L -> 1L, 5L -> 2L, 10L -> 1L, 15L -> 0L))
    assert(rels("sk").collect().map(r => (r.getInt(0), r.getInt(1))).toSet ==
      Set((1, 5), (5, 1), (3, 3))) // (2,2) dominated by (3,3)
    assert(rels("js").head().getLong(0) == 3L) // 2·1 + 1·1
  }

  test("feature-hash plug-in emits dense vectors ready for the ANN layer") {
    import graft.script.ScriptEngine
    val docs = Seq((7L, "x y x")).toDF("doc_id", "text")
    val out = ScriptEngine.run(spark,
      "f = OPERATOR 'graft.script.ops.FeatureHash' docs ('dim': '16', 'dense': 'true');",
      env0 = env("docs" -> docs))("f")
    val v = out.collect().head.getSeq[Float](1)
    assert(v.length == 16 && v.sum == 3f && v.max == 2f, v.toString)
  }

  test("selection plug-ins: k-center coreset and MMR re-rank from a script") {
    import graft.script.ScriptEngine
    // same hand fixtures as BpeKmeansSpec so the script path provably
    // routes through the identical portable arithmetic
    val corpus = Seq((1L, Seq(0.0f)), (2L, Seq(1.0f)), (3L, Seq(0.4f)))
      .toDF("vec_id", "embedding")
    val kc = ScriptEngine.run(spark,
      "sel = OPERATOR 'graft.script.ops.KCenterSelect' corpus ('k': '3', 'scale': '10');",
      env0 = env("corpus" -> corpus))("sel")
    assert(kc.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      == Seq((1L, 1L, 0L), (2L, 2L, 100L), (3L, 3L, 16L)))
    val mmrCorpus = Seq((1L, Seq(1.0f, 0.0f)), (2L, Seq(0.9f, 0.1f)),
      (3L, Seq(0.0f, 1.0f))).toDF("vec_id", "embedding")
    val query = Seq(Tuple1(Seq(1.0f, 0.0f))).toDF("embedding")
    val mmr = ScriptEngine.run(spark,
      "sel = OPERATOR 'graft.script.ops.MmrSelect' corpus, q ('k': '3', 'lambdaPct': '50', 'scale': '10');",
      env0 = env("corpus" -> mmrCorpus, "q" -> query))("sel")
    assert(mmr.collect().map(r => (r.getLong(1), r.getLong(2))).toSeq
      == Seq((1L, 5000L), (2L, 0L), (3L, -500L)))
    // a multi-row query table fails loudly, not with an arbitrary pick
    val twoRow = Seq(Tuple1(Seq(1.0f, 0.0f)), Tuple1(Seq(0.0f, 1.0f))).toDF("embedding")
    intercept[IllegalArgumentException] {
      ScriptEngine.run(spark,
        "sel = OPERATOR 'graft.script.ops.MmrSelect' corpus, q ('k': '1');",
        env0 = env("corpus" -> mmrCorpus, "q" -> twoRow))("sel")
    }
  }

  test("substitution is identifier-boundary-aware across FOREACH/LET/params (r17 review)") {
    val df = Seq(("x2", 1), ("ab", 2)).toDF("s", "v")
    // FOREACH var D must not corrupt the LET name D2 into "x2"
    val out = ScriptEngine.run(spark,
      """FOREACH D IN ('x') DO
        |LET D2 = concat('a', 'b');
        |r$D = FILTER t BY s == '$D2';
        |END FOREACH""".stripMargin, env0 = env("t" -> df))("rx")
    assert(out.collect().map(_.getInt(1)).toSeq == Seq(2), "\\$D clobbered $D2")
    // a CLI param P must not corrupt a longer LET name P2 either
    val out2 = ScriptEngine.run(spark,
      """LET P2 = concat('a', 'b');
        |r = FILTER t BY s == '$P2';""".stripMargin,
      env0 = env("t" -> df), params = Map("P" -> "zz"))("r")
    assert(out2.collect().map(_.getInt(1)).toSeq == Seq(2), "param P clobbered $P2")
  }

  test("positional refs and map projection leave string literals alone (r17 review)") {
    val df = Seq(("win $1", 1), ("other", 2)).toDF("label", "v")
    // '$1' inside the literal must stay literal text, while the bare $0
    // resolves to the first column (0-based, Pig's convention)
    val out = ScriptEngine.run(spark,
      "r = FILTER t BY $0 == 'win $1';", env0 = env("t" -> df))("r")
    assert(out.collect().map(_.getInt(1)).toSeq == Seq(1))
    // out-of-range positional refs fail loudly with context
    val e = intercept[IllegalArgumentException] {
      ScriptEngine.run(spark, "r = FILTER t BY $5 > 0;", env0 = env("t" -> df))
    }
    assert(e.getMessage.contains("out of range"), e.getMessage)
  }

  test("escaped quotes and scientific notation lex correctly (r17 review)") {
    val df = Seq(("O'Brien", 200000.0), ("Smith", 1.0)).toDF("name", "x")
    val out = ScriptEngine.run(spark,
      "r = FILTER t BY name == 'O\\'Brien' AND x > 1e5;", env0 = env("t" -> df))("r")
    assert(out.count() == 1)
  }

  test("grouping-sets aggregates accept positional refs like plain CUBE (r17 review)") {
    val df = Seq(("a", "x", 1L), ("a", "y", 2L), ("b", "x", 3L))
      .toDF("d1", "d2", "m")
    val out = ScriptEngine.run(spark,
      "c = CUBE t BY d1, d2 AGGREGATES SUM($2) AS s GROUPING SETS ((d1), ());",
      env0 = env("t" -> df))("c")
    val got = out.collect().map(r =>
      (Option(r.getString(0)), r.getLong(1))).toSet
    assert(got == Set((Some("a"), 3L), (Some("b"), 3L), (None, 6L)), got.toString)
  }

  test("STORE refuses zorder combined with partition_by (r17 review)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-store-zp").toString
    val df = Seq((1, 20240101), (2, 20240102)).toDF("a", "dt")
    val e = intercept[IllegalArgumentException] {
      ScriptEngine.run(spark,
        s"""STORE t INTO '$dir/out' USING PARQUET ("zorder": "a", "partition_by": "dt");""",
        env0 = env("t" -> df))
    }
    assert(e.getMessage.contains("cannot combine"), e.getMessage)
  }

}

/** Sample user operator for the OPERATOR statement test (needs a stable
  * top-level class name for Class.forName).
  */
class SampleUnionOperator extends graft.script.ScriptEngine.UserOperator {
  def apply(inputs: Seq[org.apache.spark.sql.DataFrame],
            params: Map[String, String]): org.apache.spark.sql.DataFrame =
    inputs.reduce(_ unionByName _)
      .withColumn("tag", org.apache.spark.sql.functions.lit(params("tag")))
}

/** Sample user function for the FUNCTION statement test: multiplies by the
  * declared constant factor (default 2).
  */
class SampleDoubleFn extends graft.script.ScriptEngine.UserFunction {
  def register(spark: org.apache.spark.sql.SparkSession, name: String,
               args: Seq[String]): Unit = {
    val factor = args.headOption.map(_.toLong).getOrElse(2L)
    spark.udf.register(name, (x: Long) => factor * x)
  }
}

/** Sample Pig UDF for the reflective-adapter test: sums its tuple fields
  * as longs, null-propagating — exactly the shape a real EvalFunc[Long]
  * UDF jar presents to PigUdf.
  */
class SamplePigAddFunc extends org.apache.pig.EvalFunc[java.lang.Long] {
  override def exec(t: org.apache.pig.data.Tuple): java.lang.Long = {
    var sum = 0L
    var i = 0
    while (i < t.size()) {
      t.get(i) match {
        case null         => return null
        case n: java.lang.Number => sum += n.longValue()
        case other        => throw new java.io.IOException(s"not a number: $other")
      }
      i += 1
    }
    sum
  }
}

/** Sample Pig UDF with the String-constants constructor convention. */
class SamplePigJoinFunc(sep: String) extends org.apache.pig.EvalFunc[String] {
  def this() = this("-")
  override def exec(t: org.apache.pig.data.Tuple): String =
    (0 until t.size()).map(i => String.valueOf(t.get(i))).mkString(sep)
}

/** Test mirror of Pig's algebraic LongSum shape: getInitial/getIntermed/
  * getFinal stage classes over bags, null-skipping, null on empty —
  * exactly what a combiner-aware Pig UDAF jar presents.
  */
class SamplePigSumAlgebraic extends org.apache.pig.EvalFunc[java.lang.Long]
    with org.apache.pig.Algebraic {
  override def exec(t: org.apache.pig.data.Tuple): java.lang.Long =
    PigAlgebraicStages.sumBag(t)
  override def getInitial: String = classOf[SamplePigSumInitial].getName
  override def getIntermed: String = classOf[SamplePigSumIntermed].getName
  override def getFinal: String = classOf[SamplePigSumFinal].getName
}

object PigAlgebraicStages {
  /** Sum field 0 of every tuple in the bag at field 0; null if none non-null. */
  def sumBag(t: org.apache.pig.data.Tuple): java.lang.Long = {
    val bag = t.get(0).asInstanceOf[org.apache.pig.data.DataBag]
    var sum = 0L
    var any = false
    val it = bag.iterator()
    while (it.hasNext) {
      it.next().get(0) match {
        case null => ()
        case n: java.lang.Number => sum += n.longValue(); any = true
        case other => throw new java.io.IOException(s"not a number: $other")
      }
    }
    if (any) java.lang.Long.valueOf(sum) else null
  }
}

class SamplePigSumInitial extends org.apache.pig.EvalFunc[org.apache.pig.data.Tuple] {
  override def exec(t: org.apache.pig.data.Tuple): org.apache.pig.data.Tuple = {
    // the bag holds exactly one inner tuple: this input row's args
    val inner = t.get(0).asInstanceOf[org.apache.pig.data.DataBag].iterator().next()
    val out = org.apache.pig.data.TupleFactory.getInstance.newTuple(1)
    out.set(0, inner.get(0))
    out
  }
}

class SamplePigSumIntermed extends org.apache.pig.EvalFunc[org.apache.pig.data.Tuple] {
  override def exec(t: org.apache.pig.data.Tuple): org.apache.pig.data.Tuple = {
    val out = org.apache.pig.data.TupleFactory.getInstance.newTuple(1)
    out.set(0, PigAlgebraicStages.sumBag(t))
    out
  }
}

class SamplePigSumFinal extends org.apache.pig.EvalFunc[java.lang.Long] {
  override def exec(t: org.apache.pig.data.Tuple): java.lang.Long =
    PigAlgebraicStages.sumBag(t)
}

/** Test mirror of a Pig Accumulator UDAF (max over longs): the whole-group
  * bag streams through accumulate, getValue reads out, cleanup resets.
  */
class SamplePigMaxAccumulator extends org.apache.pig.EvalFunc[java.lang.Long]
    with org.apache.pig.Accumulator[java.lang.Long] {
  private var best: java.lang.Long = null
  override def exec(t: org.apache.pig.data.Tuple): java.lang.Long = {
    cleanup(); accumulate(t); val v = getValue; cleanup(); v
  }
  override def accumulate(t: org.apache.pig.data.Tuple): Unit = {
    val it = t.get(0).asInstanceOf[org.apache.pig.data.DataBag].iterator()
    while (it.hasNext) {
      it.next().get(0) match {
        case null => ()
        case n: java.lang.Number =>
          if (best == null || n.longValue() > best) best = n.longValue()
        case other => throw new java.io.IOException(s"not a number: $other")
      }
    }
  }
  override def getValue: java.lang.Long = best
  override def cleanup(): Unit = best = null
}

/** Tuple-returning Pig UDF for the complex-return schema walk: (min, max)
  * of its numeric args, with the outputSchema convention real Pig UDFs use
  * (a single TUPLE column whose nested schema names the fields).
  */
class SamplePigMinMaxFunc extends org.apache.pig.EvalFunc[org.apache.pig.data.Tuple] {
  override def exec(t: org.apache.pig.data.Tuple): org.apache.pig.data.Tuple = {
    var lo: java.lang.Long = null
    var hi: java.lang.Long = null
    var i = 0
    while (i < t.size()) {
      t.get(i) match {
        case null => return null // null-propagating, like most Pig UDFs
        case n: java.lang.Number =>
          val v = n.longValue()
          if (lo == null || v < lo) lo = v
          if (hi == null || v > hi) hi = v
        case other => throw new java.io.IOException(s"not a number: $other")
      }
      i += 1
    }
    val out = org.apache.pig.data.TupleFactory.getInstance.newTuple(2)
    out.set(0, lo); out.set(1, hi)
    out
  }
  override def outputSchema(in: org.apache.pig.impl.logicalLayer.schema.Schema)
      : org.apache.pig.impl.logicalLayer.schema.Schema = {
    import org.apache.pig.impl.logicalLayer.schema.Schema
    import org.apache.pig.data.DataType
    val inner = new Schema
    inner.add(new Schema.FieldSchema("lo", DataType.LONG))
    inner.add(new Schema.FieldSchema("hi", DataType.LONG))
    val s = new Schema
    s.add(new Schema.FieldSchema("mm", inner, DataType.TUPLE))
    s
  }
}

/** Bag-returning Pig UDF (TOKENIZE shape): splits its string arg into a
  * bag of (token, pos) tuples, declaring the standard bag-wraps-one-tuple
  * outputSchema.
  */
class SamplePigTokenizeFunc(sep: String) extends org.apache.pig.EvalFunc[org.apache.pig.data.DataBag] {
  def this() = this(" ")
  override def exec(t: org.apache.pig.data.Tuple): org.apache.pig.data.DataBag = {
    val s = t.get(0).asInstanceOf[String]
    if (s == null) return null
    val bag = org.apache.pig.data.BagFactory.getInstance.newDefaultBag()
    s.split(sep).zipWithIndex.foreach { case (tok, i) =>
      val tt = org.apache.pig.data.TupleFactory.getInstance.newTuple(2)
      tt.set(0, tok); tt.set(1, Int.box(i))
      bag.add(tt)
    }
    bag
  }
  override def outputSchema(in: org.apache.pig.impl.logicalLayer.schema.Schema)
      : org.apache.pig.impl.logicalLayer.schema.Schema = {
    import org.apache.pig.impl.logicalLayer.schema.Schema
    import org.apache.pig.data.DataType
    val row = new Schema
    row.add(new Schema.FieldSchema("token", DataType.CHARARRAY))
    row.add(new Schema.FieldSchema("pos", DataType.INTEGER))
    val wrap = new Schema
    wrap.add(new Schema.FieldSchema("t", row, DataType.TUPLE))
    val s = new Schema
    s.add(new Schema.FieldSchema("toks", wrap, DataType.BAG))
    s
  }
}

/** Tuple-returning UDF that declares NO outputSchema — must fail loudly at
  * resolution (nothing exists to type it from; same failure the reference
  * hit in PigEvalFuncWrapper.java).
  */
class SamplePigBadTupleFunc extends org.apache.pig.EvalFunc[org.apache.pig.data.Tuple] {
  override def exec(t: org.apache.pig.data.Tuple): org.apache.pig.data.Tuple = t
}

/** Pig UDF that reads a TUPLE argument through the Pig Tuple API — pins
  * that struct-typed Spark args arrive as genuine Pig tuples, not Rows.
  */
class SamplePigTupleArgFunc extends org.apache.pig.EvalFunc[java.lang.Long] {
  override def exec(t: org.apache.pig.data.Tuple): java.lang.Long = {
    val inner = t.get(0).asInstanceOf[org.apache.pig.data.Tuple]
    var s = 0L
    var i = 0
    while (i < inner.size()) {
      s += inner.get(i).asInstanceOf[java.lang.Number].longValue(); i += 1
    }
    s
  }
}

/** Pig UDF that reads a BAG argument through the DataBag API — pins that
  * array&lt;struct&gt; Spark args arrive as genuine Pig bags.
  */
class SamplePigBagArgFunc extends org.apache.pig.EvalFunc[java.lang.Long] {
  override def exec(t: org.apache.pig.data.Tuple): java.lang.Long = {
    val bag = t.get(0).asInstanceOf[org.apache.pig.data.DataBag]
    var s = 0L
    val it = bag.iterator()
    while (it.hasNext) s += it.next().get(0).asInstanceOf[java.lang.Number].longValue()
    s
  }
}
