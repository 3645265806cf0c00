package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines: token
  * counting, quality scoring, language ID, document fingerprinting. All are
  * pure `functions._` compositions (no UDFs) so they run inside whole-stage
  * codegen and scale linearly — each is a narrow map over the documents
  * table, no shuffle.
  */
object TextAnalysis {

  /** Whitespace tokens (any run of \s — spaces, tabs, newlines), empties
    * removed. Native one-pass kernel; equals
    * filter(split(text, "\\s+"), _ =!= "").
    */
  def tokens(text: Column): Column =
    graft.functions.expressions.NativeExpressions.tokenize(text)

  /** Token count (whitespace tokenization). */
  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  /** BPE-ish subword count: segment into title-case words, caps runs,
    * lowercase runs, digit runs, and single punctuation marks — the way
    * byte-pair tokenizers pre-segment; a cheap proxy for LLM token
    * budgeting without shipping a tokenizer model. Pure ordered
    * alternation (no lookarounds) so RE2-based engines — and the DuckDB
    * oracle — evaluate it identically.
    */
  val subwordPattern = """[A-Z][a-z]+|[A-Z]+|[a-z]+|[0-9]+|[^A-Za-z0-9\s]"""

  /** Segment count from the one-pass kernel — equals
    * size(regexp_extract_all(text, subwordPattern, 0)); the ordered
    * alternation reduces to a char-class state machine (the regex form
    * paid the anti-scaling char-class tax; see
    * NativeKernels.normalizeText's doc for the measurements).
    */
  def subwordCount(text: Column): Column =
    graft.functions.expressions.NativeExpressions.subwordCount(text)

  /** Quality-scoring feature columns: lengths, alpha/punct/space/digit
    * ratios, mean token length, stopword ratio. Cheap heuristics of the
    * C4/Gopher-rule family.
    */
  val defaultStopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "that", "for", "on", "with", "as")

  /** Guard for operators that stage helper columns via withColumn + drop:
    * if the caller's frame already has a column by one of these names,
    * withColumn would silently REPLACE it and the epilogue drop would then
    * remove the caller's data — fail loudly instead. (The `__`-prefixed
    * names are this module's reserved namespace; the error names the
    * clash so the caller can rename.)
    */
  private def requireFreshHelpers(df: DataFrame, names: String*): Unit = {
    val clash = names.filter(df.columns.contains)
    require(clash.isEmpty,
      s"input already has reserved helper column(s) ${clash.mkString(", ")} — " +
        "rename them before calling this operator (they would be silently overwritten and dropped)")
  }

  def withQualityFeatures(df: DataFrame, textCol: String = "text"): DataFrame = {
    requireFreshHelpers(df, "__q_counts", "__q_ts")
    val t = col(textCol)
    // TWO codepoint passes total, no token-array materialization:
    // char-class counts from scriptCounts and (n_tokens, Σ token length,
    // stopword hits) from the fused tokenStats kernel — the previous form
    // materialized the token array and then re-walked it THREE times
    // (aggregate for mean length, transform(lower) + array_contains per
    // token for stopwords), which was the residual cost of the q61 screen
    // after round 14's fence (2.4 s of sf10 wall-clock; SCALING.md round
    // 15). Values are bit-identical: n_tokens = size(tokenize),
    // sum_token_len = aggregate(toks, 0L, acc+length), stop_hits =
    // size(filter(transform(toks, lower), array_contains(stop))) —
    // property-tested in KernelPropertySpec, and both pre-projected so
    // multi-reference keeps them un-inlined.
    val sc = col("__q_counts")
    val ts = col("__q_ts")
    val nChars = sc.getItem(0).cast("double")
    val nToksL = ts.getField("n_tokens")
    val nToks = nToksL.cast("double")
    def ratio(c: Column): Column =
      when(nChars > 0, c.cast("double") / nChars).otherwise(lit(0.0))
    df.withColumn("__q_counts",
        graft.functions.expressions.NativeExpressions.scriptCounts(t))
      .withColumn("__q_ts",
        graft.functions.expressions.NativeExpressions.tokenStats(t, defaultStopwords))
      .withColumn("n_chars_m", sc.getItem(0))
      .withColumn("n_tokens", nToksL)
      .withColumn("mean_token_len",
        when(nToks > 0, ts.getField("sum_token_len").cast("double") / nToks)
          .otherwise(lit(0.0)))
      .withColumn("alpha_ratio", ratio(sc.getItem(1)))
      .withColumn("digit_ratio", ratio(sc.getItem(2)))
      .withColumn("space_ratio", ratio(sc.getItem(6)))
      .withColumn("stopword_ratio",
        when(nToks > 0, ts.getField("stop_hits").cast("double") / nToks)
          .otherwise(lit(0.0)))
      .drop("__q_counts", "__q_ts")
  }

  /** Gopher-style document-quality rules (Rae et al. 2021, Appendix A1.1 —
    * the repetition-independent subset; repetition itself lives in
    * [[withRepetitionFeatures]]): word-count bounds, mean word length
    * bounds, symbol-to-word ratio (# and ellipsis), bullet-line and
    * ellipsis-line fractions, fraction of words with at least one
    * alphabetic character, and a minimum count of distinct function words.
    * Emits each feature column plus the combined `keep_gopher` flag, so
    * pipelines can re-threshold without recomputing. Pure `functions._`
    * composition over one pass of the text — narrow, codegen'd, and exact
    * integer/ratio arithmetic the DuckDB oracle replays bit-for-bit.
    */
  def withGopherRules(df: DataFrame, textCol: String = "text",
                      minWords: Int = 50, maxWords: Int = 100000,
                      minMeanWordLen: Double = 3.0, maxMeanWordLen: Double = 10.0,
                      maxSymbolWordRatio: Double = 0.1,
                      maxBulletRatio: Double = 0.9, maxEllipsisRatio: Double = 0.3,
                      minAlphaWordRatio: Double = 0.8, minStopHits: Int = 2): DataFrame = {
    requireFreshHelpers(df, "__gopher")
    val t = col(textCol)
    // ALL ten feature inputs come from one fused scan kernel (r16 — see
    // NativeKernels.gopherStats): the previous form materialized the token
    // and line arrays and ran three per-element regex lambdas
    // (rlike("[A-Za-z]") per token, ^[-*•] and (\.\.\.|…)$ per line — the
    // per-char regex tax of the round-14 lesson) plus an aggregate lambda
    // for mean word length. Values are bit-identical field by field
    // (property-tested against the declarative forms, incl. the
    // non-overlapping "..." replace semantics and trim's space-only
    // contract); stop_hits keeps the array_intersect DISTINCT-stopwords
    // semantics its comment derived in round 13.
    val g = col("__gopher")
    val nW = g.getField("n_words")
    val nWd = nW.cast("double")
    val nLines = g.getField("n_lines").cast("double")
    val bulletLines = g.getField("bullet_lines").cast("double")
    val ellipsisLines = g.getField("ellipsis_lines").cast("double")
    val hashCount = g.getField("hash_cnt")
    val ellCount = g.getField("ell3_cnt").cast("double") + g.getField("ellch_cnt")
    val alphaWords = g.getField("alpha_words").cast("double")
    val stopHits = g.getField("stop_distinct")
    val out = df
      .withColumn("__gopher", graft.functions.expressions.NativeExpressions
        .gopherStats(t, defaultStopwords))
      .withColumn("n_words", nW)
      .withColumn("mean_word_len",
        when(nW > 0, g.getField("sum_word_len").cast("double") / nWd)
          .otherwise(lit(0.0)))
      .withColumn("alpha_word_ratio", when(nW > 0, alphaWords / nWd).otherwise(lit(0.0)))
      .withColumn("bullet_line_ratio",
        when(nLines > 0, bulletLines / nLines).otherwise(lit(0.0)))
      .withColumn("ellipsis_line_ratio",
        when(nLines > 0, ellipsisLines / nLines).otherwise(lit(0.0)))
      .withColumn("symbol_word_ratio",
        when(nW > 0, (hashCount + ellCount).cast("double") / nWd).otherwise(lit(0.0)))
      .withColumn("stop_hits", stopHits)
    out.withColumn("keep_gopher",
      col("n_words").between(minWords, maxWords) &&
        col("mean_word_len").between(minMeanWordLen, maxMeanWordLen) &&
        col("symbol_word_ratio") < maxSymbolWordRatio &&
        col("bullet_line_ratio") < maxBulletRatio &&
        col("ellipsis_line_ratio") < maxEllipsisRatio &&
        col("alpha_word_ratio") > minAlphaWordRatio &&
        col("stop_hits") >= minStopHits)
      .drop("__gopher")
  }

  /** Language ID by stopword-profile voting: score each candidate language
    * by the fraction of tokens in its function-word list; argmax wins (ties
    * break by list order). An n-gram-free heuristic that is deterministic
    * and shuffle-free; real deployments would swap in a fastText-style model
    * via mapInPandas on the same column contract.
    */
  val langProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is", "that", "it", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit", "den"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "que", "pour", "dans"),
    "es" -> Seq("el", "la", "los", "las", "es", "un", "una", "que", "por", "para"),
    "zh" -> Seq("de", "shi", "le", "bu", "wo", "zai", "you", "he", "ren", "zhe"))

  /** NULL contract: a NULL text yields a NULL prediction (standard
    * expression null propagation). This is a deliberate round-14 change —
    * the previous array_max-over-structs formulation returned the
    * binary-largest language ('zh') for NULL docs, because the struct
    * scores were null and the tie broke on the lang field; NULL-in-NULL-out
    * is the contract a consumer branching on lang_pred should see. An
    * EMPTY or all-zero-score document still gets the tie-break winner
    * (binary-largest lang), not NULL.
    */
  def withLangId(df: DataFrame, textCol: String = "text", as: String = "lang_pred"): DataFrame =
    // one-pass kernel vote — equal to array_max over per-profile
    // struct(size(filter(lowercased-tokens, in-profile)), lang) structs:
    // max score, ties to the binary-larger lang (all-zero docs included)
    df.withColumn(as, graft.functions.expressions.NativeExpressions.langIdPick(
      col(textCol), langProfiles.map(_._1), langProfiles.map(_._2)))

  /** Language ID by character-n-gram profile counting: each language has a
    * signature trigram list; score = total characters matched by its
    * trigrams in the lowercased text (length-weighted occurrence count via
    * pure integer arithmetic — len(t) - len(remove(t, g)) — identical in
    * any SQL engine, so the oracle reproduces the exact scores); argmax
    * wins, ties to the first language listed.
    */
  val ngramProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", " th", "ing", "and", "ion"),
    "de" -> Seq("der", "sch", "ein", "ich", "und"),
    "fr" -> Seq("les", "ent", "ion", "que", "eur"),
    "es" -> Seq("que", "los", "ndo", "ado", "nte"))

  def withLangIdNgram(df: DataFrame, textCol: String = "text",
                      as: String = "lang_ngram"): DataFrame =
    // one-pass Aho–Corasick kernel — equal to scoring each profile with
    // Σ (length(lower(t)) - length(regexp_replace(lower(t), gram, "")))
    // and taking the argmax with ties to the FIRST profile listed. The
    // declarative form ran one regexp_replace per gram: 20 stripped
    // copies of every document per row for the default 4×5 profiles, at
    // ~68 ns/char each with zero speedup from cores (the round-14 regex
    // finding); the kernel is one DFA step per char. NULL text → NULL
    // (the old array_max form returned the first profile for NULL docs).
    df.withColumn(as, graft.functions.expressions.NativeExpressions.ngramLangPick(
      col(textCol), ngramProfiles.map(_._1), ngramProfiles.map(_._2)))

  /** Document fingerprint: md5 of the whitespace-normalized token stream.
    * Equal fingerprints ⇒ equal token sequences regardless of whitespace
    * layout — the cheap exact-dup key for 100 TB dedup passes (hash first,
    * shuffle (fingerprint, id), never full documents).
    */
  def fingerprint(text: Column): Column = md5(concat_ws(" ", tokens(text)))

  /** Order-sensitive polynomial rolling hash over the token-hash sequence —
    * a 62-bit numeric alternative to `fingerprint` for engines/joins that
    * prefer fixed-width integer keys. Portable arithmetic (PortableHash).
    */
  def rollingFingerprint(text: Column): Column =
    aggregate(graft.functions.PortableHash.tokenHashes(text), lit(0L),
      (h, th) => pmod(h * lit(graft.functions.PortableHash.B) + th,
        lit(graft.functions.PortableHash.P)))

  /** TF-IDF-style salient terms: the `k` tokens of each document with the
    * highest tf/df ratio (term frequency in the document over corpus
    * document frequency) — rarity-weighted keyword extraction for topic
    * bucketing, cluster naming, and index keying. The score avoids
    * transcendentals on purpose: one double division is exactly rounded in
    * IEEE-754 (so the DuckDB oracle reproduces it bit-for-bit, where
    * log-idf would drift in the last ulp), and for a fixed tf the ranking
    * it induces over df is identical to log-idf's.
    *
    * Scale shape: one shuffle counts (doc, term) pairs — map-side partial
    * aggregation collapses each document's repeats before the exchange;
    * a second, vocab-sized aggregation counts per-term document frequency;
    * the df table joins back on the term (vocabulary is tiny next to the
    * corpus — AQE promotes the join to broadcast when it fits, and the
    * join stays a fixed-width shuffle when it does not); one per-document
    * window takes the top k, with WindowGroupLimit pushing the limit below
    * the exchange.
    */
  def topTerms(df: DataFrame, k: Int, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = df.select(col(idCol), explode(tokens(col(textCol))).as("term"))
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col(idCol)).orderBy(col("score").desc, col("term"))
    tf.join(dfreq, Seq("term"))
      .withColumn("score", col("tf").cast("double") / col("df").cast("double"))
      .withColumn("term_rank", row_number().over(w).cast("int"))
      .filter(col("term_rank") <= k)
      .select(col(idCol), col("term"), col("tf"), col("df"), col("score"),
        col("term_rank"))
  }

  /** Gopher-style "most common word" rule: per-document count and fraction
    * of the single most frequent token. A high `top_frac` flags degenerate
    * or boilerplate documents ("cookie cookie cookie ..."). Computed as two
    * token-linear partial-aggregating shuffles keyed by (doc, token) then
    * doc — not a per-row array scan — so one pathological 1 GB document
    * costs its token count, not its square, and hot tokens combine map-side.
    * Ties break to the lexicographically smallest token (deterministic and
    * engine-portable). Documents with no tokens keep zero counts and a null
    * `top_token`.
    */
  def topTokenStats(df: DataFrame, textCol: String = "text",
                    idCol: String = "doc_id"): DataFrame = {
    // per-document statistic = per-row kernel; the explode → two-level
    // groupBy → join-back formulation shuffled |corpus tokens| rows
    // through two exchanges for values each row can compute alone
    // (ties break to the binary-smallest token, matching the old
    // min_by(tok, struct(-cnt, tok)))
    val t = col("__tts")
    df.select(col(idCol),
        graft.functions.expressions.NativeExpressions
          .topTokenStats(col(textCol)).as("__tts"))
      .select(col(idCol), t.getField("top_token").as("top_token"),
        coalesce(t.getField("top_cnt"), lit(0L)).as("top_cnt"),
        coalesce(t.getField("n_tokens"), lit(0L)).as("n_tokens"),
        when(t.getField("n_tokens") > 0,
          t.getField("top_cnt").cast("double") / t.getField("n_tokens").cast("double"))
          .otherwise(lit(0.0)).as("top_frac"))
  }

  /** Gopher-style repetition features: the fraction of duplicate tokens /
    * word-bigrams / word-trigrams in a document (1 - distinct/total). High
    * values flag boilerplate and degenerate machine-generated text. N-grams
    * are compared by their portable shingle hashes (PortableHash) — no n-gram
    * string ever materializes — and `array_distinct` is a linear hash-set
    * pass, so the whole computation is a narrow per-row map: no shuffle,
    * cost linear in document length.
    */
  def withRepetitionFeatures(df: DataFrame, textCol: String = "text"): DataFrame = {
    requireFreshHelpers(df, "__th")
    val th = graft.functions.PortableHash.tokenHashes(col(textCol))
    def dupFrac(arr: Column): Column = {
      val n = size(arr).cast("double")
      when(n > 0, lit(1.0) - size(array_distinct(arr)).cast("double") / n)
        .otherwise(lit(0.0))
    }
    def grams(n: Int): Column =
      when(size(col("__th")) >= n,
        graft.functions.PortableHash.shingleHashes(col("__th"), n))
        .otherwise(array().cast("array<bigint>"))
    df.withColumn("__th", th)
      .withColumn("n_tokens", size(col("__th")).cast("long"))
      .withColumn("dup_token_frac", dupFrac(col("__th")))
      .withColumn("dup_bigram_frac", dupFrac(grams(2)))
      .withColumn("dup_trigram_frac", dupFrac(grams(3)))
      .drop("__th")
  }

  /** PII scrubbing: count and redact email addresses, phone-shaped numbers
    * (7-digit and 10-digit dashed forms), and IPv4 addresses. Patterns
    * avoid lookarounds but DO use `\b` — the ASCII word boundary behaves
    * identically in the JVM regex and RE2 (the DuckDB oracle), and without
    * it a longer digit run would partially match and leak its prefix
    * through the redaction (e.g. "555-123-4567" redacting to
    * "555-<PHONE>"). Redaction is applied email → phone → ip, in that
    * order (order is observable when patterns overlap). A narrow codegen'd
    * map — the 100 TB shape is exactly this: scan passes fused into the
    * scan projection. All three patterns are evaluated by one-pass
    * kernels (NativeKernels.piiEmailScan/piiPhoneScan/piiIpv4Scan) that
    * reproduce these regexes exactly; the patterns remain the contract
    * (and what the property tests replay through the JVM regex engine).
    */
  val emailPattern = """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"""
  val phonePattern = """\b([0-9]{3}-)?[0-9]{3}-[0-9]{4}\b"""
  val ipv4Pattern = """\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"""

  /** Canonical text normalization for dedup keys: lowercase, strip
    * everything but letters/digits/whitespace, collapse whitespace runs to
    * one space, trim. Normalizing before fingerprint/MinHash makes
    * near-dup detection robust to case and punctuation noise; narrow
    * codegen'd map, identical regex semantics in RE2 (the oracle).
    */
  /** Lowercase, strip to [a-z0-9] words, single-space separators —
    * equals trim(regexp_replace(regexp_replace(lower(t),
    * "[^a-z0-9\\s]", " "), "\\s+", " ")). One-pass native kernel: the
    * regex chain was ~70x slower per char AND anti-scaled under
    * concurrency (this JDK's char-class scan runs no faster on 32 regex
    * threads than on 1 — q79 measured 14 s at both 4 and 32 cores); see
    * NativeKernels.normalizeText.
    */
  def normalize(text: Column): Column =
    graft.functions.expressions.NativeExpressions.normalizeText(text)

  /** HTML/markup stripping — the WET-extraction step of a web-crawl
    * pipeline: drop script/style blocks wholesale, comments, then all
    * tags; decode the common entities; collapse whitespace. A chain of
    * codegen'd regexp_replace — narrow map, no shuffle, and every pattern
    * is RE2-compatible so the oracle replays it byte-for-byte. This is
    * regex extraction, not an HTML parser — the standard trade for a
    * 100 TB first-pass text extractor.
    */
  /** Flesch reading-ease features: word count, sentence count (runs of
    * terminal punctuation, floored at 1), a vowel-group syllable
    * approximation, and the Flesch score
    * 206.835 − 1.015·(words/sentences) − 84.6·(syllables/words).
    * Pure regex counts + exactly-rounded double arithmetic — narrow,
    * codegen'd, oracle-portable. The syllable heuristic is the standard
    * cheap proxy (exact syllabification needs a dictionary).
    */
  def withReadability(df: DataFrame, textCol: String = "text"): DataFrame = {
    import graft.functions.expressions.NativeExpressions.runCountInSet
    val words = tokenCount(col(textCol))
    // maximal-run counts via the one-pass kernel — equal to
    // size(regexp_extract_all(t, "[set]+", 0)), minus the per-char regex tax
    val sentences = greatest(lit(1L), runCountInSet(col(textCol), ".!?"))
    val syllables = runCountInSet(col(textCol), "aeiouyAEIOUY")
    val wps = words.cast("double") / sentences.cast("double")
    val spw = syllables.cast("double") / words.cast("double")
    df.withColumn("n_words", words)
      .withColumn("n_sentences", sentences)
      .withColumn("n_syllables", syllables)
      .withColumn("flesch",
        when(words > 0, lit(206.835) - lit(1.015) * wps - lit(84.6) * spw))
  }

  /** Hashing-trick feature vectors (the fastText/Vowpal-Wabbit input
    * encoding): each token maps to one of `dim` buckets via the portable
    * hash; weight = in-document term frequency. Emits SPARSE (id, idx, w)
    * rows — one narrow tokenize pass + one partial-aggregating shuffle of
    * (id, idx) groups, integer-only and oracle-portable. Densify with
    * [[toDenseFeatures]] to feed the k-means/ANN/classifier layer: text
    * clustering without a vocabulary table, at any corpus size.
    */
  def featureHash(df: DataFrame, dim: Int, textCol: String = "text",
      idCol: String = "doc_id", salt: String = "fh"): DataFrame = {
    require(dim >= 2, s"bad dim: $dim")
    df.select(col(idCol), explode(tokens(col(textCol))).as("__t"))
      .select(col(idCol),
        graft.operators.Sampling.hashBucket(col("__t"), salt, dim).cast("int").as("idx"))
      .groupBy(col(idCol), col("idx")).agg(count(lit(1)).as("w"))
  }

  /** TF-IDF weighting over the hashed feature space: [[featureHash]]'s
    * integer term frequencies scaled by ln(N / df_bucket), where
    * df_bucket = number of documents touching the bucket (computed
    * exactly from the sparse rows — one extra metadata-sized aggregate,
    * broadcast back). Weights are tf·ln(N/df) QUANTIZED to micro-units —
    * libm ln differs across engines in the last ulp, so the raw product
    * is floored at 1e−6 granularity before anything downstream sees it
    * (the LM-scorer discipline); the kept weight is bit-portable and the
    * 1e−6 loss is far below any retrieval signal.
    */
  def featureHashTfidf(df: DataFrame, dim: Int, textCol: String = "text",
      idCol: String = "doc_id", salt: String = "fh"): DataFrame = {
    val sparse = featureHash(df, dim, textCol, idCol, salt)
    val dfreq = sparse.groupBy("idx").agg(count(lit(1)).as("__df"))
    val n = sparse.select(col(idCol)).distinct().count()
    val raw = col("w").cast("double") *
      log(lit(n.toDouble) / col("__df").cast("double"))
    sparse.join(broadcast(dfreq), "idx")
      .withColumn("w_tfidf",
        floor(raw * lit(1e6)).cast("long").cast("double") / lit(1e6))
      .select(col(idCol), col("idx"), col("w"), col("w_tfidf"))
  }

  /** Assemble [[featureHash]]'s sparse rows into dense `Array[Float]`
    * vectors with the (id, features) contract the similarity layer
    * expects. One shuffle on id; per-row state ≤ the number of DISTINCT
    * occupied buckets, never `dim` until the final narrow transform.
    */
  def toDenseFeatures(sparse: DataFrame, dim: Int,
      idCol: String = "doc_id"): DataFrame =
    sparse.groupBy(col(idCol))
      .agg(map_from_arrays(collect_list(col("idx")),
        collect_list(col("w"))).as("__m"))
      .select(col(idCol), expr(
        s"transform(sequence(0, ${dim - 1}), i -> cast(coalesce(element_at(__m, i), 0L) as float))")
        .as("features"))

  def stripMarkup(text: Column): Column = {
    val noBlocks = regexp_replace(
      regexp_replace(text, "(?is)<(script|style)[^>]*>.*?</(script|style)>", " "),
      "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noBlocks, "<[^>]*>", " ")
    val decoded = Seq("&amp;" -> "&", "&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&#39;" -> "'", "&nbsp;" -> " ")
      .foldLeft(noTags) { case (c, (e, r)) =>
        regexp_replace(c, java.util.regex.Pattern.quote(e), r) }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** Per-document script/charset profile: character counts and ratios for
    * explicit codepoint ranges (Latin letters, digits, CJK, Cyrillic,
    * Arabic) plus the dominant script — the pre-language-ID routing signal
    * of a multilingual pipeline. Explicit ranges, not \\p{script} classes,
    * so engines agree character-for-character; ratios are single
    * exactly-rounded divisions. All six counts come from ONE codepoint
    * pass ([[graft.functions.expressions.NativeKernels.scriptCounts]]) —
    * the per-range regexp_replace formulation materialized five stripped
    * copies of the text per row, and that allocation (not the scan) was
    * the bottleneck: memory-bound, it gained only 1.4× from 32-way scan
    * parallelism at sf10. The counts array is kept as a separate
    * projection so the kernel evaluates once (CollapseProject keeps
    * multiply-referenced non-trivial expressions un-inlined).
    */
  def withScriptProfile(df: DataFrame, textCol: String = "text"): DataFrame = {
    requireFreshHelpers(df, "__script_counts")
    val sc = col("__script_counts")
    def cnt(i: Int): Column = sc.getItem(i)
    val n = cnt(0)
    def ratio(c: Column): Column =
      when(n > 0, c.cast("double") / n.cast("double")).otherwise(lit(0.0))
    val latin = cnt(1); val digit = cnt(2)
    val cjk = cnt(3); val cyr = cnt(4)
    val ara = cnt(5)
    df.withColumn("__script_counts",
        graft.functions.expressions.NativeExpressions.scriptCounts(col(textCol)))
      .withColumn("n_chars_total", n)
      .withColumn("latin_ratio", ratio(latin))
      .withColumn("digit_ratio", ratio(digit))
      .withColumn("cjk_ratio", ratio(cjk))
      .withColumn("cyrillic_ratio", ratio(cyr))
      .withColumn("arabic_ratio", ratio(ara))
      .withColumn("dominant_script",
        when(latin.geq(cjk) && latin.geq(cyr) && latin.geq(ara) && latin > 0, lit("latin"))
          .when(cjk.geq(cyr) && cjk.geq(ara) && cjk > 0, lit("cjk"))
          .when(cyr.geq(ara) && cyr > 0, lit("cyrillic"))
          .when(ara > 0, lit("arabic"))
          .otherwise(lit("other")))
      .drop("__script_counts")
  }

  /** Repetitiveness via DEFLATE ratio (compressed/raw bytes): boilerplate
    * and template spam compress far below natural text (natural prose
    * sits ~0.3–0.6; ratio < `minRatio` flags machine-generated
    * repetition). Narrow codegen'd native kernel
    * ([[graft.functions.expressions.NativeExpressions.compressionRatio]]);
    * deterministic per zlib but not engine-portable, so spec-verified
    * (rows-only oracle) rather than hash-graded. Complements the shingle
    * fractions of [[withRepetitionFeatures]]: deflate sees
    * character-level and long-range repetition that token shingles miss.
    */
  def withCompressionRatio(df: DataFrame, textCol: String = "text",
                           minRatio: Double = 0.20): DataFrame =
    df.withColumn("compression_ratio",
        graft.functions.expressions.NativeExpressions.compressionRatio(col(textCol)))
      .withColumn("keep_compression", col("compression_ratio") >= minRatio)

  /** Blocklist filter (C4-style "bad words" screening): count of tokens in
    * the blocklist and a keep/drop flag. Token-set membership, not
    * substring: "assassin" does not trip "ass". Case-insensitive. The
    * blocklist rides inline in the plan (a literal array) — at 100 TB this
    * is still a narrow map; swap in a broadcast join only if the list
    * outgrows expression-literal size (~thousands of terms).
    */
  def withBlocklistFlag(df: DataFrame, blocklist: Seq[String],
                        textCol: String = "text"): DataFrame = {
    // empty blocklist → everything is clean (array() alone would have
    // element type NULL and fail array_contains type checking)
    val blocked: Column =
      if (blocklist.isEmpty) lit(0L)
      else {
        val bl = array(blocklist.map(w => lit(w.toLowerCase)): _*)
        size(filter(transform(tokens(col(textCol)), lower _),
          t => array_contains(bl, t))).cast("long")
      }
    df.withColumn("n_blocked", blocked)
      .withColumn("keep_clean", col("n_blocked") === 0L)
  }

  /** BPE merge-candidate counting: corpus-wide frequency of every adjacent
    * token pair — the inner statistic of byte-pair-encoding vocabulary
    * induction (count pairs → merge the most frequent → repeat). One
    * narrow tokenize+zip-adjacent map and ONE shuffle (groupBy pair) with
    * automatic map-side partial aggregation, so the shuffle carries unique
    * pairs per partition rather than the token stream. `minCount` prunes
    * the hapax tail after aggregation (the overwhelming majority of pairs
    * at corpus scale).
    */
  def pairCounts(df: DataFrame, textCol: String = "text",
                 minCount: Long = 2L): DataFrame = {
    val t = tokens(col(textCol))
    df.select(t.as("__t"))
      .filter(size(col("__t")) >= 2)
      .select(explode(transform(sequence(lit(1), size(col("__t")) - 1),
        i => struct(element_at(col("__t"), i).as("tok_a"),
          element_at(col("__t"), i + 1).as("tok_b")))).as("p"))
      .groupBy(col("p.tok_a").as("tok_a"), col("p.tok_b").as("tok_b"))
      .agg(count(lit(1)).as("pair_count"))
      .filter(col("pair_count") >= minCount)
  }

  /** Passage chunking: split each document into token windows of
    * `chunkTokens` with `overlap` tokens carried between consecutive
    * chunks — context-window prep for training/retrieval corpora. Chunk
    * starts are 1, 1+stride, … (stride = chunkTokens − overlap) while
    * start ≤ max(n − overlap, 1), so every token lands in ≥1 chunk, a
    * short document yields exactly one chunk, and no chunk is a pure
    * suffix of its predecessor. Narrow map + explode — token-linear, no
    * shuffle; output rows carry (doc_id, chunk_idx, chunk_text, n_chunk_tokens).
    */
  def chunk(df: DataFrame, chunkTokens: Int, overlap: Int = 0,
            textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(chunkTokens > overlap && overlap >= 0,
      s"need chunkTokens > overlap >= 0, got ($chunkTokens, $overlap)")
    val stride = chunkTokens - overlap
    df.select(col(idCol), tokens(col(textCol)).as("__t"))
      .filter(size(col("__t")) >= 1)
      .select(col(idCol), col("__t"),
        explode(sequence(lit(1), greatest(size(col("__t")) - overlap, lit(1)),
          lit(stride))).as("__start"))
      .select(col(idCol),
        ((col("__start") - 1) / stride).cast("long").as("chunk_idx"),
        array_join(slice(col("__t"), col("__start"), lit(chunkTokens)), " ")
          .as("chunk_text"),
        least(lit(chunkTokens), size(col("__t")) - col("__start") + 1)
          .cast("long").as("n_chunk_tokens"))
  }

  def withPiiScrub(df: DataFrame, textCol: String = "text"): DataFrame = {
    requireFreshHelpers(df, "__pii_email")
    val t = col(textCol)
    import graft.functions.expressions.NativeExpressions.{piiEmailScan, piiIpv4Scan, piiPhoneScan}
    // all three patterns are one-pass scan kernels (r16 — see
    // NativeKernels.piiEmailScan/piiPhoneScan/piiIpv4Scan for the
    // per-pattern greedy≡longest arguments; each is property-tested
    // char-for-char against its regex, plus a full-pipeline equivalence
    // test against the pre-kernel gated-regex formulation). Counts are
    // over the ORIGINAL text; redaction chains email → phone → ip
    // (order observable when patterns overlap). The r15 trigger-char
    // gates are gone with the regexes — a kernel pass over a row with no
    // candidate chars costs the one scan the gate itself would.
    val r1 = col("__pii_email").getField("redacted")
    df.withColumn("__pii_email", piiEmailScan(t))
      .withColumn("n_emails", col("__pii_email").getField("n"))
      .withColumn("n_phones", piiPhoneScan(t).getField("n"))
      .withColumn("n_ipv4", piiIpv4Scan(t).getField("n"))
      .withColumn("text_redacted",
        piiIpv4Scan(piiPhoneScan(r1).getField("redacted")).getField("redacted"))
      .drop("__pii_email")
  }
}
