package graft.script

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators._

/** Cubert Script front end — compiles a script to DataFrame transforms over
  * the operator library (reference: grammar CubertPhysical.g4; lifecycle
  * app/CmrExecutor.java:41-116, parser plan/physical/PhysicalParser.java:88).
  *
  * Design (SURVEY.md §7.1): the MAP/SHUFFLE/REDUCE phase structure of the
  * reference is *erased* — statements declare a dataflow, Catalyst plans the
  * shuffles. The expression sublanguage is delegated to Spark SQL's
  * expression parser after a small pre-pass translating Cubert-specific
  * syntax (`$i` positional refs, `m#"key"` map projection — grammar
  * :176-179), so CASE/NVL/MATCHES/casts all come from Catalyst instead of a
  * bespoke FunctionTree (reference: functions/FunctionTree.java:52).
  *
  * Statement surface:
  * {{{
  *   a = LOAD 'path' USING PARQUET;              -- also CSV/JSON/AVRO/TEXT('schema')
  *   b = FROM a GENERATE x, y * 2 AS y2;
  *   c = FILTER b BY y2 > 10;
  *   d = GROUP c BY x AGGREGATES SUM(y2) AS s, COUNT(1) AS n;
  *   d2 = GROUP c BY ALL AGGREGATES COUNT(1) AS n;
  *   e = CUBE c BY x, z AGGREGATES SUM(y2) AS s; -- also ROLLUP
  *   j = JOIN a BY k, b BY k;                    -- LEFT/RIGHT/FULL OUTER JOIN, HASH-JOIN
  *   s = SHUFFLE a PARTITIONED ON k SORTED ON t; -- repartition + sortWithinPartitions
  *   t = TOP 3 FROM a GROUP BY g ORDER BY o DESC;
  *   r = RANK a AS rnk GROUP BY g ORDER BY o;
  *   u = GATHER a, b;                            -- union
  *   v = DISTINCT a;   w = LIMIT a 10;   x = SORT a ON c1, c2 DESC;
  *   y = DUPLICATE a 3 TIMES COUNTER AS i;
  *   z = FLATTEN a BY arr AS elem;
  *   c = COMBINE a, b SORTED ON k;               -- order-preserving merge
  *   n = NO_OP a ASSERT PARTITIONED ON k SORTED ON k;
  *   va = VALIDATE a BY ROW PARTITIONED ON k SORTED ON k;
  *   pv = PIVOT a ON k;                          -- co-locate pivot groups
  *   lb = LOAD BLOCK FROM tbl MATCHING a;        -- bucketed-table read
  *   -- CUBE also takes GROUPING SETS ((a,b),()) | GROUPING COMBOS n
  *   --                 | ROLLUPS (a,b),(c); TEE takes GENERATE … [IF …]
  *   MULTIPASS { g1 = GROUP a BY k AGGREGATES …; } { g2 = …; }
  *   STORE e INTO 'out' USING PARQUET;
  * }}}
  */
object ScriptEngine {

  // ---- lexer ---------------------------------------------------------------

  private[script] sealed trait Tok
  private case class Word(s: String) extends Tok   // identifier or keyword
  private case class Str(s: String) extends Tok    // 'literal'
  private case class Num(s: String) extends Tok
  private case class Punct(s: String) extends Tok  // = , ; ( ) # . $ etc.

  private def lex(src: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    val n = src.length
    while (i < n) {
      val c = src(i)
      if (c.isWhitespace) i += 1
      else if (c == '-' && i + 1 < n && src(i + 1) == '-') { // -- comment
        while (i < n && src(i) != '\n') i += 1
      } else if (c == '\'' || c == '"') {
        // backslash-escape-aware, matching the preprocessor's masked scans
        // (and exprUntil emits \' itself): \' and \\ unescape, any other
        // \x passes through for Catalyst to interpret
        val lit = new StringBuilder
        var j = i + 1
        var closed = false
        while (j < n && !closed) {
          val ch = src(j)
          if (ch == '\\' && j + 1 < n) {
            if (src(j + 1) != c && src(j + 1) != '\\') lit.append('\\')
            lit.append(src(j + 1)); j += 2
          } else if (ch == c) closed = true
          else { lit.append(ch); j += 1 }
        }
        require(closed, s"unterminated string literal at offset $i")
        out += Str(lit.toString); i = j + 1
      } else if (c.isLetter || c == '_') {
        var j = i + 1
        // HASH-JOIN is one keyword: allow '-' inside a word when both sides
        // are letters (no other token in the surface contains '-')
        while (j < n && (src(j).isLetterOrDigit || src(j) == '_' ||
          (src(j) == '-' && j + 1 < n && src(j + 1).isLetter))) j += 1
        out += Word(src.substring(i, j)); i = j
      } else if (c.isDigit) {
        var j = i + 1
        while (j < n && (src(j).isDigit || src(j) == '.')) j += 1
        // scientific notation: 1e5, 2.5E-3 — else Num+Word re-render as
        // invalid SQL ("1 e5")
        if (j < n && (src(j) == 'e' || src(j) == 'E')) {
          var k = j + 1
          if (k < n && (src(k) == '+' || src(k) == '-')) k += 1
          if (k < n && src(k).isDigit) {
            while (k < n && src(k).isDigit) k += 1
            j = k
          }
        }
        out += Num(src.substring(i, j)); i = j
      } else { out += Punct(c.toString); i += 1 }
    }
    out.result()
  }

  // ---- parser state --------------------------------------------------------

  private class P(toks: Vector[Tok]) {
    var pos = 0
    def peek: Option[Tok] = if (pos < toks.length) Some(toks(pos)) else None
    def next(): Tok = {
      // loud EOF, not an IndexOutOfBounds from the Vector: a truncated
      // script (or a parse that consumed past a malformed statement) must
      // read as a syntax error (found by the round-14 grammar fuzz)
      require(pos < toks.length,
        s"unexpected end of script (after ${toks.takeRight(5).mkString(" ")})")
      val t = toks(pos); pos += 1; t
    }
    def kw(s: String): Boolean = peek match {
      case Some(Word(w)) if w.equalsIgnoreCase(s) => pos += 1; true
      case _ => false
    }
    /** Statement-leading keyword: matches only when NOT followed by '=' so
      * a relation named `map`/`set`/`store`/… still parses as an assignment
      * (`map = FILTER a BY …;`).
      */
    def stmtKw(s: String): Boolean = peek match {
      case Some(Word(w)) if w.equalsIgnoreCase(s) &&
        (pos + 1 >= toks.length || toks(pos + 1) != Punct("=")) => pos += 1; true
      case _ => false
    }
    def expectKw(s: String): Unit =
      require(kw(s), s"expected $s at ${toks.drop(pos).take(5)}")
    def punct(s: String): Boolean = peek match {
      case Some(Punct(p)) if p == s => pos += 1; true
      case _ => false
    }
    def expectPunct(s: String): Unit =
      require(punct(s), s"expected '$s' at ${toks.drop(pos).take(5)}")
    def ident(): String = next() match {
      case Word(w) => w
      case t => throw new IllegalArgumentException(s"expected identifier, got $t")
    }
    def str(): String = next() match {
      case Str(s) => s
      case t => throw new IllegalArgumentException(s"expected string literal, got $t")
    }
    def num(): String = next() match {
      case Num(s) => s
      case t => throw new IllegalArgumentException(s"expected number, got $t")
    }
    /** Raw source tokens until one of `stop` keywords (at paren depth 0) or
      * ';'. Re-rendered as a Spark SQL expression string.
      */
    def exprUntil(stop: Set[String]): String = {
      val sb = new StringBuilder
      var depth = 0
      var done = false
      while (!done) peek match {
        case None => done = true
        case Some(Punct(";")) => done = true
        case Some(Punct("(")) => depth += 1; sb.append('('); pos += 1
        case Some(Punct(")")) if depth == 0 => done = true
        case Some(Punct(")")) => depth -= 1; sb.append(')'); pos += 1
        case Some(Punct(",")) if depth == 0 => done = true
        case Some(Word(w)) if depth == 0 && stop.exists(_.equalsIgnoreCase(w)) => done = true
        case Some(t) =>
          pos += 1
          t match {
            case Word(w)  => sb.append(' ').append(w).append(' ')
            case Num(s)   => sb.append(s)
            // re-escape what the lexer unescaped (backslashes FIRST) so the
            // rendered SQL literal round-trips through Catalyst's parser
            case Str(s)   => sb.append('\'')
              .append(s.replace("\\", "\\\\").replace("'", "\\'")).append('\'')
            case Punct(p) => sb.append(p)
          }
      }
      sb.toString.trim
    }
  }

  /** Translate Cubert-specific expression syntax to Spark SQL: `$0` → the
    * FIRST column of `rel` (Pig's 0-based positional convention, which the
    * reference inherited), `m#'key'` → `m['key']`. Both rewrites apply
    * only OUTSIDE string literals — `'win $1'` and `'#tag'` are literal
    * text, not references.
    */
  private[script] def translateExpr(raw: String, df: DataFrame): String = {
    // split into alternating code / literal runs (backslash-escape-aware)
    val runs = scala.collection.mutable.ArrayBuffer.empty[(Boolean, String)]
    val code = new StringBuilder
    var i = 0
    val n = raw.length
    while (i < n) {
      if (raw(i) == '\'') {
        runs += ((false, code.toString)); code.clear()
        val lit = new StringBuilder
        var j = i + 1
        var closed = false
        while (j < n && !closed) {
          if (raw(j) == '\\' && j + 1 < n) { lit.append(raw(j)).append(raw(j + 1)); j += 2 }
          else if (raw(j) == '\'') closed = true
          else { lit.append(raw(j)); j += 1 }
        }
        runs += ((true, lit.toString)); i = j + 1
      } else { code.append(raw(i)); i += 1 }
    }
    runs += ((false, code.toString))
    def positional(s: String): String =
      "\\$(\\d+)".r.replaceAllIn(s, m => {
        val idx = m.group(1).toInt
        require(idx < df.columns.length,
          s"positional reference $$$idx out of range for a " +
            s"${df.columns.length}-column relation (positions are 0-based)")
        java.util.regex.Matcher.quoteReplacement(s"`${df.columns(idx)}`")
      })
    val out = new StringBuilder
    var k = 0
    val TrailingHash = "#\\s*$".r
    while (k < runs.length) {
      runs(k) match {
        case (false, text) =>
          val c = positional(text)
          TrailingHash.findFirstIn(c) match {
            // m#'key': the code run ends with # and the literal that
            // follows is the key — fuse to m['key']
            case Some(h) if k + 1 < runs.length && runs(k + 1)._1 =>
              out.append(c.substring(0, c.length - h.length))
                .append("['").append(runs(k + 1)._2).append("']")
              k += 2
            case _ => out.append(c); k += 1
          }
        case (true, lit) =>
          out.append('\'').append(lit).append('\''); k += 1
      }
    }
    out.toString
  }

  private def toColumn(raw: String, df: DataFrame): Column =
    expr(translateExpr(raw, df))

  private def aliasedExprs(p: P, df: DataFrame, stop: Set[String]): Seq[(Column, Option[String])] = {
    val out = Seq.newBuilder[(Column, Option[String])]
    var more = true
    while (more) {
      val e = p.exprUntil(stop + "AS")
      require(e.nonEmpty,
        s"empty expression before ${p.peek.getOrElse("end of statement")} — " +
          "note the clause keywords (" + stop.mkString(", ") + ") end the " +
          "list at paren depth 0; parenthesize a function call with a " +
          "clause-keyword name, e.g. (IF(c,a,b)) AS x")
      val alias = if (p.kw("AS")) Some(p.ident()) else None
      out += ((toColumn(e, df), alias))
      more = p.punct(",")
    }
    out.result()
  }

  private def identList(p: P): Seq[String] = {
    val out = Seq.newBuilder[String]
    out += p.ident()
    while (p.punct(",")) out += p.ident()
    out.result()
  }

  /** Optional storage-format parameter group after `USING fmt`: our concise
    * `('schema string')`, the reference's `("schema": "...", ...)` key-value
    * form (grammar params, :70-71), or empty `()`. Returns the schema param
    * if one was given; other keys are accepted and ignored.
    */
  private def formatParams(p: P): Option[String] =
    formatParamMap(p).get("schema")

  /** Full `("key": "value", ...)` storage-param map; a bare `('schema')`
    * string is returned under the "schema" key (grammar :208 storage
    * params).
    */
  private def formatParamMap(p: P): Map[String, String] = {
    if (!p.punct("(")) return Map.empty
    if (p.punct(")")) return Map.empty
    val first = p.str()
    if (p.punct(":")) {
      var m = Map(first -> p.str())
      while (p.punct(",")) { val k = p.str(); p.expectPunct(":"); m += (k -> p.str()) }
      p.expectPunct(")")
      m
    } else { p.expectPunct(")"); Map("schema" -> first) }
  }

  /** One cuboid: a possibly-empty column list in parens or brackets —
    * `(a,b)`, `[a,b]`, `()` (grammar cuboid, :139).
    */
  private def cuboid(p: P): Seq[String] = {
    val close = if (p.punct("(")) ")" else { p.expectPunct("["); "]" }
    val out = Seq.newBuilder[String]
    if (!p.punct(close)) {
      out += p.ident(); while (p.punct(",")) out += p.ident(); p.expectPunct(close)
    }
    out.result()
  }

  /** `AGG(arg) AS alias, …` — aggregate names per AggregationType (SURVEY
    * §2.4); arg parsed as a SQL expression. Returns both the Column form and
    * the raw `AGG(arg) AS alias` SQL (for grouping-sets compilation).
    */
  private def aggListRaw(p: P, df: DataFrame): Seq[((String, Column, String), String)] = {
    val out = Seq.newBuilder[((String, Column, String), String)]
    var more = true
    while (more) {
      val name = p.ident()
      p.expectPunct("(")
      val arg = p.exprUntil(Set.empty)
      p.expectPunct(")")
      p.expectKw("AS")
      val alias = p.ident()
      // the raw-SQL form feeds the grouping-sets paths, which hand it to
      // Spark SQL directly — run the same Cubert→SQL translation the
      // Column path gets, or $N / m#'key' work in plain CUBE only
      out += (((name, toColumn(arg, df), alias),
        s"$name(${translateExpr(arg, df)}) AS $alias"))
      more = p.punct(",")
    }
    out.result()
  }

  private def aggList(p: P, df: DataFrame): Seq[(String, Column, String)] =
    aggListRaw(p, df).map(_._1)

  /** ORDER BY list with optional per-column DESC. */
  private def orderList(p: P): Seq[(String, Boolean)] = {
    val out = Seq.newBuilder[(String, Boolean)]
    var more = true
    while (more) {
      val c = p.ident()
      val desc = p.kw("DESC") || { p.kw("ASC"); false }
      out += ((c, desc))
      more = p.punct(",")
    }
    out.result()
  }

  private def orderCols(os: Seq[(String, Boolean)]): Seq[Column] =
    os.map { case (c, desc) => if (desc) col(c).desc else col(c).asc }

  /** `FOREACH V IN ('a', 'b', …) DO … END FOREACH;` — the loop macro that
    * replaces the reference's JavaScript script preprocessing
    * (CmrExecutor.java:46-49,118+, whose dominant real use was generating
    * per-date copies of a job). Pure TEXT expansion before lexing: the
    * body is replicated once per value with `%V%` / `$V` substituted,
    * exactly like `params`. Loops nest (outer expands first, then the
    * copied inner loops expand in later passes); each pass consumes one
    * loop head, so the cap bounds TOTAL loop instances, keeping a
    * malformed script from spinning. The macro scanner is token-ish, not
    * string-aware — don't spell END FOREACH inside a quoted literal.
    */
  /** Text with quoted-literal contents and `--` line comments blanked to
    * `#` (length-preserving). The ORPHAN-token diagnostics scan this
    * instead of the raw script: a statement that merely contains the words
    * `end if` in a string literal or a comment is not an orphan token and
    * must keep passing through to SQL unchanged, exactly as it did before
    * the guards existed. (The EXPANSION scanners stay raw-text token-ish by
    * design — their caveat "don't spell END FOREACH inside a quoted
    * literal" only bites when a matching head exists; the orphan scan runs
    * precisely when none does.) The filler is `#`, NOT a space: the ELSE
    * DO orphan pattern's \s+ may cross newlines, and space-blanking a
    * trailing `-- comment` between an `ELSE` and a next-line `DO` would
    * MINT an orphan match the raw text never had — `#` is neither \s nor
    * \w, so it can neither bridge tokens nor extend them. Quote tracking
    * mirrors [[expandLets]]' exprEnd: ' and " delimit, backslash escapes
    * the next char in-quote.
    */
  private[graft] def maskLiteralsAndComments(s: String): String = {
    val out = s.toCharArray
    var i = 0
    var q = 0: Char
    while (i < s.length) {
      val c = s(i)
      if (q != 0) {
        if (c == '\\' && i + 1 < s.length) { out(i) = '#'; i += 1; out(i) = '#' }
        else if (c == q) q = 0
        else if (c != '\n' && c != '\r') out(i) = '#'
      } else if (c == '\'' || c == '"') q = c
      else if (c == '-' && i + 1 < s.length && s(i + 1) == '-') {
        while (i < s.length && s(i) != '\n') { out(i) = '#'; i += 1 }
        i -= 1
      }
      i += 1
    }
    new String(out)
  }

  private[graft] def expandForeach(script: String, maxDepth: Int = 1000): String = {
    val Head = "(?is)\\bFOREACH\\s+([A-Za-z_][A-Za-z0-9_]*)\\s+IN\\s*\\(([^)]*)\\)\\s*DO\\b".r
    // END and FOREACH must sit on ONE line ([ \t]+, not \s+): the grammar
    // also has a bare phase END (JOB … END), and \s+ would conflate
    // "END\nFOREACH v IN (…) DO" — a phase END followed by a new loop —
    // into a block terminator, miscompiling legal scripts
    val Tok = "(?is)\\bFOREACH\\b|\\bEND[ \\t]+FOREACH\\s*;?".r
    def expandOnce(s: String): Option[String] = Head.findFirstMatchIn(s).map { m =>
      val varName = m.group(1)
      val values = "'([^']*)'".r.findAllMatchIn(m.group(2)).map(_.group(1)).toSeq
      require(values.nonEmpty, s"FOREACH $varName: no quoted values in (${m.group(2)})")
      // find the matching END FOREACH, counting nested FOREACH heads
      var depth = 1
      var bodyEnd = -1
      var afterEnd = -1
      val it = Tok.findAllMatchIn(s).dropWhile(_.start <= m.start)
      while (depth > 0 && it.hasNext) {
        val t = it.next()
        if (t.matched.toUpperCase.startsWith("FOREACH")) depth += 1
        else { depth -= 1; if (depth == 0) { bodyEnd = t.start; afterEnd = t.end } }
      }
      require(bodyEnd >= 0, s"FOREACH $varName: missing END FOREACH")
      val body = s.substring(m.end, bodyEnd)
      // boundary-aware like the LET path: a plain replace("$D", v) would
      // corrupt a longer name such as $D2 into "<v>2"
      val varTok = ("\\$" + java.util.regex.Pattern.quote(varName) +
        "(?![A-Za-z0-9_])").r
      val expanded = values.map(v =>
        varTok.replaceAllIn(body.replace(s"%$varName%", v),
          java.util.regex.Matcher.quoteReplacement(v))).mkString("\n")
      s.substring(0, m.start) + expanded + s.substring(afterEnd)
    }
    var cur = script
    var i = 0
    while (i < maxDepth) {
      expandOnce(cur) match {
        case Some(next) => cur = next; i += 1
        case None =>
          // every head is consumed; a leftover END FOREACH is an orphan —
          // fail HERE with the real diagnosis instead of letting the
          // stray token confuse the statement parser downstream. Scan the
          // literal/comment-masked text: 'end foreach' inside a quoted
          // string is data, not a token
          require("(?i)\\bEND[ \\t]+FOREACH\\b".r
              .findFirstIn(maskLiteralsAndComments(cur)).isEmpty,
            "END FOREACH without a matching 'FOREACH v IN (…) DO' head")
          return cur
      }
    }
    require(Head.findFirstMatchIn(cur).isEmpty,
      s"more than $maxDepth FOREACH expansions — malformed or runaway loop?")
    cur
  }

  /** Preprocessor IF/ELSE blocks — with [[expandForeach]] and [[expandDates]]
    * this covers the real uses of the reference's JavaScript script
    * templating (app/CmrExecutor.java:46-49 ran scripts through a JS
    * engine; production scripts used it for date loops, computed dates,
    * and conditional jobs — the three now expressible without JS):
    *
    * {{{
    * IF ('$ENV' == 'prod') DO
    *   STORE big INTO '/prod/out' USING PARQUET;
    * ELSE DO
    *   STORE big INTO '/tmp/out' USING PARQUET;
    * END IF;
    * }}}
    *
    * Conditions run AFTER param/FOREACH substitution, so `$ENV` above is
    * already a constant. A condition is comparisons (`==  !=  <  <=  >
    * >=`) over quoted strings or bare tokens, joined by AND/OR (AND binds
    * tighter); both sides numeric → numeric compare, else string (ordering
    * comparisons lexicographic). A single term must be 'true'/'false'.
    * Parentheses inside the condition are not supported — the head is
    * `IF ( … ) DO` with the first `)` closing it. Blocks nest.
    */
  private[graft] def expandIf(script: String, maxDepth: Int = 1000): String = {
    val Head = "(?is)\\bIF\\s*\\(([^)]*)\\)\\s*DO\\b".r
    val LetHead = LetHeadAll
    // LET expands AFTER IF (a LET in a dropped branch must never
    // evaluate), so an IF condition referencing a LET binding would
    // silently compare the literal "$name" token and take the wrong
    // branch — fail loudly instead. CLI params and FOREACH vars are
    // already substituted by the time conditions evaluate.
    def rejectLetRefs(s: String, cond: String): Unit = {
      val letNames = LetHead.findAllMatchIn(s).map(_.group(1)).toSet
      val offending = letNames.filter { n =>
        val q = java.util.regex.Pattern.quote(n)
        ("\\$" + q + "(?![A-Za-z0-9_])|%" + q + "%").r.findFirstIn(cond).isDefined
      }
      require(offending.isEmpty,
        s"IF (${cond.trim}): references ${offending.toSeq.sorted.map("$" + _).mkString(", ")} " +
          "bound by LET, but LET expands AFTER IF (so a LET in a dropped " +
          "branch never evaluates) — the condition would compare the literal " +
          "token. Use a CLI param or FOREACH variable in IF conditions, or " +
          "restructure so the LET decision happens in SQL (CASE).")
    }
    // END IF on one line ([ \t]+): see expandForeach — a bare phase END
    // followed by a new "IF (…) DO" head must not read as END IF
    val Tok = "(?is)\\bIF\\s*\\([^)]*\\)\\s*DO\\b|\\bELSE\\s+DO\\b|\\bEND[ \\t]+IF\\s*;?".r
    def expandOnce(s: String): Option[String] = Head.findFirstMatchIn(s).map { m =>
      var depth = 1
      var elseAt = -1 // depth-1 ELSE DO (start, end)
      var elseEnd = -1
      var bodyEnd = -1
      var afterEnd = -1
      val it = Tok.findAllMatchIn(s).dropWhile(_.start <= m.start)
      while (depth > 0 && it.hasNext) {
        val t = it.next()
        val up = t.matched.toUpperCase(java.util.Locale.ROOT)
        if (up.startsWith("IF")) depth += 1
        else if (up.startsWith("ELSE")) {
          if (depth == 1) {
            require(elseAt < 0, "IF: more than one ELSE DO at the same depth")
            elseAt = t.start; elseEnd = t.end
          }
        } else { depth -= 1; if (depth == 0) { bodyEnd = t.start; afterEnd = t.end } }
      }
      require(bodyEnd >= 0, s"IF (${m.group(1).trim}): missing END IF")
      rejectLetRefs(s, m.group(1))
      val taken =
        if (evalCond(m.group(1)))
          s.substring(m.end, if (elseAt >= 0) elseAt else bodyEnd)
        else if (elseAt >= 0) s.substring(elseEnd, bodyEnd)
        else ""
      s.substring(0, m.start) + taken + s.substring(afterEnd)
    }
    var cur = script
    var i = 0
    while (i < maxDepth) {
      expandOnce(cur) match {
        case Some(next) => cur = next; i += 1
        case None =>
          // all IF heads consumed: leftover END IF / ELSE DO tokens are
          // orphans — diagnose here, not as a downstream parser puzzle.
          // Scan the literal/comment-masked text: 'end if' inside a
          // quoted string or -- comment is data, not a token
          val masked = maskLiteralsAndComments(cur)
          require("(?i)\\bEND[ \\t]+IF\\b".r.findFirstIn(masked).isEmpty,
            "END IF without a matching 'IF (…) DO' head")
          require("(?i)\\bELSE\\s+DO\\b".r.findFirstIn(masked).isEmpty,
            "ELSE DO without a matching 'IF (…) DO' head")
          return cur
      }
    }
    require(Head.findFirstMatchIn(cur).isEmpty,
      s"more than $maxDepth IF expansions — malformed or runaway nesting?")
    cur
  }

  /** `LET name = <sql expression>;` — driver-evaluated preprocessing
    * bindings, the graft-native replacement for the reference's free-form
    * JavaScript preprocessing (app/CmrExecutor.java:46-49,118+: the .cmr
    * ran through a JS engine that could compute arbitrary values into the
    * script text). Instead of embedding a JS interpreter, the expression
    * evaluates through Catalyst (`SELECT <expr>` — constants only, but
    * the FULL SQL function library: date arithmetic, formatting, CASE,
    * string ops, math) and the stringified result substitutes into the
    * REMAINDER of the script as `$name` / `%name%`, exactly like a CLI
    * param. LETs evaluate top-to-bottom, so later LETs and all following
    * statements see earlier bindings; they run after FOREACH/IF
    * expansion, so a LET inside a loop body binds per replica and a LET
    * in a dropped IF branch never evaluates. The flip side — an IF
    * condition can NOT reference a LET binding — is enforced loudly in
    * [[expandIf]] (the condition would otherwise compare the literal
    * `$name` token). Same caveats as the other preprocessor forms: don't
    * spell `LET x =` inside a quoted literal, and the expression may not
    * contain an unquoted `;`.
    */
  /** All LET heads, any name — shared by the desync guard in expandLets. */
  private val LetHeadAll = "(?m)^[ \\t]*(?i:LET)\\s+([A-Za-z_][A-Za-z0-9_]*)\\s*=".r

  private[graft] def expandLets(spark: SparkSession, script: String,
                                maxDepth: Int = 1000): String = {
    val Head = LetHeadAll // one head grammar — the desync guard scans with it too
    // the expression runs from `from` to the first ; outside quotes; a
    // backslash inside a quoted literal escapes the next char (Spark
    // SQL's \' escaping must not desynchronize the scanner). Returns the
    // index of the terminating ';', or -1.
    def exprEnd(s: String, from: Int): Int = {
      var i = from
      var q = 0: Char
      while (i < s.length) {
        val c = s(i)
        if (q == 0 && c == ';') return i
        if (q != 0 && c == '\\') i += 1 // skip the escaped char
        else if (q == 0 && (c == '\'' || c == '"')) q = c
        else if (q != 0 && c == q) q = 0
        i += 1
      }
      -1
    }
    def expandOnce(s: String): Option[String] = Head.findFirstMatchIn(s).map { m =>
      val name = m.group(1)
      val i = exprEnd(s, m.end)
      require(i >= 0, s"LET $name: missing terminating ';'")
      val exprSql = s.substring(m.end, i).trim
      require(exprSql.nonEmpty, s"LET $name: empty expression")
      val value =
        try spark.sql(s"SELECT CAST(($exprSql) AS STRING)").first().getString(0)
        catch {
          case e: Exception => throw new IllegalArgumentException(
            s"LET $name: expression does not evaluate: $exprSql (${e.getMessage})")
        }
      require(value != null, s"LET $name: expression evaluated to NULL: $exprSql")
      // a line break inside a value is rejected outright: every
      // preprocessor head (LET/IF-block starts, FOREACH) is line-anchored,
      // so a substituted "\nLET X = …;" would mint a PHANTOM binding on
      // the next pass — evaluated and excised out of whatever statement
      // text hosted the token. Preprocessor values are scalar constants;
      // multi-line values have no legitimate use in this grammar.
      // the full Java (?m) line-terminator set, not just \n\r — U+0085,
      // U+2028, U+2029 also anchor ^, so a NEL-carrying value would mint
      // a phantom head past a \n\r-only check
      require(!value.exists(c => c == '\n' || c == '\r' || c == 0x85.toChar ||
          c == 0x2028.toChar || c == 0x2029.toChar),
        s"LET $name: value contains a line terminator — line-anchored " +
          "preprocessor heads could match inside the substituted text; " +
          "preprocessor values must be single-line")
      val rest = s.substring(i + 1)
      // the binding's scope ends AFTER a re-binding's own expression (the
      // re-binding's RHS still sees the old value — `LET X = $X + 1;`
      // composes — but everything past its ';' sees the new one; a LET
      // replicated per FOREACH iteration therefore shadows per replica).
      // The name in the re-binding test is CASE-SENSITIVE like the
      // substitution itself — only the LET keyword is case-insensitive.
      // $name substitutes only at an identifier boundary (a binding D
      // must never corrupt $D2 — the hazard the CLI-param path avoids by
      // longest-first ordering).
      val quotedName = java.util.regex.Pattern.quote(name)
      val sameName = ("(?m)^[ \\t]*(?i:LET)\\s+" + quotedName + "\\s*=").r
      val rebind = sameName.findFirstMatchIn(rest)
      val stop = rebind.map { m2 =>
        val e = exprEnd(rest, m2.end)
        if (e >= 0) e + 1 else rest.length // unterminated: next pass fails loudly
      }.getOrElse(rest.length)
      // a value carrying a quote, backslash, or semicolon that splices
      // into ANY later LET's RHS (a re-binding of this name or a
      // different binding that references it) would desynchronize the
      // next pass's quote-aware exprEnd scan — the scope boundaries were
      // computed on the PRE-substitution text — an unquoted `;` could
      // even inject statements, and a trailing backslash escapes the
      // host RHS's closing quote. Fail loudly instead of mis-scoping.
      if (value.exists(c => c == '\'' || c == '"' || c == ';' || c == '\\')) {
        val token = ("\\$" + quotedName + "(?![A-Za-z0-9_])|%" + quotedName + "%").r
        val inScope = rest.substring(0, stop)
        LetHeadAll.findAllMatchIn(inScope).foreach { m2 =>
          val e = exprEnd(inScope, m2.end)
          val rhs = inScope.substring(m2.end, if (e >= 0) e else inScope.length)
          require(token.findFirstIn(rhs).isEmpty,
            s"LET $name: value ${value.take(80)} contains a quote, '\\\\', or ';' and " +
              s"is referenced in the later binding LET ${m2.group(1)} — the " +
              "splice would desynchronize that binding's expression scan; " +
              "bind a new name or strip the quote/semicolon from the value")
        }
      }
      val quotedVal = java.util.regex.Matcher.quoteReplacement(value)
      val substituted =
        ("%" + quotedName + "%").r.replaceAllIn(
          ("\\$" + quotedName + "(?![A-Za-z0-9_])").r
            .replaceAllIn(rest.substring(0, stop), quotedVal), quotedVal)
      // injection backstop covering what the character guards cannot
      // enumerate: substitution must never MINT a LET head that was not
      // in the text before (e.g. a value spelling "LET Y = 1" landing
      // where its token opened a continuation line — no line terminator
      // in the value, yet the host line's own start anchors a phantom
      // head the next pass would evaluate and excise)
      require(LetHeadAll.findAllMatchIn(substituted).size <=
          LetHeadAll.findAllMatchIn(rest.substring(0, stop)).size,
        s"LET $name: substituting value ${value.take(80)} creates a new " +
          "LET head in the script text — the next pass would evaluate it " +
          "as a phantom binding; rephrase the value or the host statement")
      s.substring(0, m.start) + substituted + rest.substring(stop)
    }
    var cur = script
    for (_ <- 0 until maxDepth) {
      expandOnce(cur) match {
        case Some(next) => cur = next
        case None => return cur
      }
    }
    require(Head.findFirstMatchIn(cur).isEmpty,
      s"more than $maxDepth LET bindings — malformed or runaway?")
    cur
  }

  /** Evaluate a preprocessor IF condition (see [[expandIf]]). */
  private[graft] def evalCond(cond: String): Boolean = {
    val Term =
      "^(?:'([^']*)'|([^\\s='!<>]+))\\s*(==|!=|<=|>=|<|>)\\s*(?:'([^']*)'|(\\S+))$".r
    def term(t0: String): Boolean = {
      val t = t0.trim
      t match {
        case Term(lq, lb, op, rq, rb) =>
          val l = if (lq != null) lq else lb
          val r = if (rq != null) rq else rb
          val ln = scala.util.Try(BigDecimal(l)).toOption
          val rn = scala.util.Try(BigDecimal(r)).toOption
          val cmp: Int = (ln, rn) match {
            case (Some(a), Some(b)) => a.compare(b)
            case _ => l.compareTo(r)
          }
          op match {
            case "==" => cmp == 0
            case "!=" => cmp != 0
            case "<"  => cmp < 0
            case "<=" => cmp <= 0
            case ">"  => cmp > 0
            case ">=" => cmp >= 0
          }
        case _ =>
          val bare = t.stripPrefix("'").stripSuffix("'")
          if (bare.equalsIgnoreCase("true")) true
          else if (bare.equalsIgnoreCase("false")) false
          else sys.error(s"IF condition term is neither a comparison nor " +
            s"true/false: '$t'")
      }
    }
    // split on AND/OR only OUTSIDE quoted strings — 'NORTH AND SOUTH' is
    // a value, not a conjunction
    def isWordChar(c: Char): Boolean = Character.isLetterOrDigit(c) || c == '_'
    def splitTopLevel(s: String, word: String): Seq[String] = {
      val out = Seq.newBuilder[String]
      val cur = new StringBuilder
      var inQuote = false
      var i = 0
      while (i < s.length) {
        val c = s.charAt(i)
        if (c == '\'') { inQuote = !inQuote; cur += c; i += 1 }
        else if (!inQuote && s.regionMatches(true, i, word, 0, word.length) &&
            // \b semantics: '_' is a word character, so X_OR_Y stays one token
            (i == 0 || !isWordChar(s.charAt(i - 1))) &&
            (i + word.length >= s.length ||
              !isWordChar(s.charAt(i + word.length)))) {
          out += cur.result(); cur.clear(); i += word.length
        } else { cur += c; i += 1 }
      }
      out += cur.result()
      out.result()
    }
    splitTopLevel(cond, "OR").exists(disj =>
      splitTopLevel(disj, "AND").forall(term))
  }

  /** Computed date arithmetic — `\$DATE('base', offsetDays[, 'pattern'])`
    * substitutes a formatted date anywhere in the script text (paths are
    * the dominant use: the reference's JS-templated scripts computed
    * yesterday/last-week paths). `base` is `today` (driver-clock UTC) or a
    * literal date in the same pattern; the default pattern is yyyy-MM-dd.
    *
    * {{{ li = LOAD '/data/$DATE('today', -1, 'yyyyMMdd')' USING PARQUET; }}}
    */
  private[graft] def expandDates(script: String): String = {
    val Call =
      "(?i)\\$DATE\\(\\s*'([^']*)'\\s*,\\s*([+-]?\\d+)\\s*(?:,\\s*'([^']*)')?\\s*\\)".r
    Call.replaceAllIn(script, m => {
      val pattern = Option(m.group(3)).getOrElse("yyyy-MM-dd")
      val fmt = java.time.format.DateTimeFormatter.ofPattern(pattern)
      val base =
        if (m.group(1).equalsIgnoreCase("today"))
          java.time.LocalDate.now(java.time.ZoneOffset.UTC)
        else java.time.LocalDate.parse(m.group(1), fmt)
      java.util.regex.Matcher.quoteReplacement(
        base.plusDays(m.group(2).toLong).format(fmt))
    })
  }

  // ---- execution -----------------------------------------------------------

  /** Run a script; returns the final relation environment (STOREs execute as
    * encountered). `params` substitute `%name%` occurrences pre-lex, like
    * the reference's `param.` property substitution (CmrExecutor.java:46-49).
    * With `dryRun` every statement — STORE and TEE included — still parses
    * and analyzes (schema resolution runs), but no write executes: the
    * reference's -c compile-only mode. With `only` set, ONLY the STORE
    * statements whose stored relation is named execute (others analyze
    * but skip the write) — the reference's `-x <job>` selective execution
    * (ScriptExecutor.java:258-295) mapped onto STOREs, the job outputs;
    * TEE side-taps stay in-flow like the reference's in-job TEE.
    */
  def run(spark: SparkSession, script: String,
          params: Map[String, String] = Map.empty,
          env0: Map[String, DataFrame] = Map.empty,
          dryRun: Boolean = false,
          only: Option[Set[String]] = None,
          maxConcurrentStores: Int = 5): Map[String, DataFrame] = {
    require(maxConcurrentStores >= 1,
      s"maxConcurrentStores must be >= 1: $maxConcurrentStores")
    val store: (DataFrame, String, String) => Unit =
      if (dryRun) (df, _, _) => { df.schema; () } // force analysis, skip the write
      else (df, path, fmt) => graft.sources.Sources.store(df, path, fmt)

    // ---- concurrent STORE execution (reference parity: the physical plan
    // ran up to 5 independent jobs at once — plan/physical/
    // ExecutorService.java:41). Consecutive STOREs are independent jobs by
    // construction (they read already-defined relations and write disjoint
    // outputs), so each submits on a bounded pool and the shared session's
    // scheduler interleaves their stages; any OTHER statement — a LOAD
    // that might read a path still being written, an ONCOMPLETION fs task,
    // a relation definition — drains pending writes first, as does a STORE
    // to a path a pending write targets. Each write thread joins the
    // "graft_stores" scheduler pool: under spark.scheduler.mode=FAIR the
    // concurrent writes share the cluster fairly instead of convoying
    // (FIFO also runs them concurrently, just prioritized by submission).
    val storeThreads = new java.util.concurrent.atomic.AtomicInteger(0)
    lazy val storePool = java.util.concurrent.Executors.newFixedThreadPool(
      maxConcurrentStores,
      (r: Runnable) => {
        val t = new Thread(r, s"graft-store-${storeThreads.incrementAndGet()}")
        t.setDaemon(true); t
      })
    // (relName, outputPath, inputPaths, future) per in-flight write: a
    // stored relation reads its INPUTS at write time, so independence is
    // output-output disjointness AND no pending write touching this
    // relation's inputs AND this write not clobbering a pending
    // relation's inputs. Input paths come from the analyzed plan's file
    // source relations — LOAD, LOAD-CACHED, ENCODE/DECODE dictionary
    // paths, and any future path-reading operator are covered uniformly.
    val pending = scala.collection.mutable.ArrayBuffer
      .empty[(String, String, Seq[String], java.util.concurrent.Future[_])]
    def normPath(p: String): String =
      new org.apache.hadoop.fs.Path(p).toUri.getPath
    def inputPathsOf(df: DataFrame): Seq[String] =
      df.queryExecution.analyzed.collect {
        case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          l.relation match {
            case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
              fs.location.rootPaths.map(p => normPath(p.toString))
            case _ => Seq.empty[String]
          }
      }.flatten
    def pathsOverlap(a0: String, b0: String): Boolean = {
      val a = normPath(a0); val b = normPath(b0)
      a == b || a.startsWith(b + "/") || b.startsWith(a + "/")
    }
    def drainStores(): Unit = if (pending.nonEmpty) {
      val waiting = pending.toSeq
      pending.clear()
      var failure: Throwable = null
      waiting.foreach { case (relName, path, _, f) =>
        try f.get()
        catch {
          case e: java.util.concurrent.ExecutionException =>
            if (failure == null) failure = new RuntimeException(
              s"STORE $relName INTO '$path' failed", e.getCause)
        }
      }
      if (failure != null) throw failure
    }
    def submitStore(relName: String, r: DataFrame, path: String)(body: => Unit): Unit =
      if (dryRun || maxConcurrentStores == 1) body
      else {
        // serialize when outputs collide, when a pending write targets one
        // of this relation's input paths (it would read mid-overwrite), or
        // when this write targets one of a pending relation's inputs
        val ins = inputPathsOf(r)
        if (pending.exists { case (_, p0, ins0, _) =>
          pathsOverlap(p0, path) ||
            ins.exists(i => pathsOverlap(i, p0)) ||
            ins0.exists(i0 => pathsOverlap(i0, path)) })
          drainStores()
        pending += ((relName, path, ins, storePool.submit(new Runnable {
          override def run(): Unit = {
            spark.sparkContext.setLocalProperty("spark.scheduler.pool", "graft_stores")
            spark.sparkContext.setJobDescription(s"STORE $relName INTO $path")
            body
          }
        })))
      }
    // both our %name% and the reference's $NAME property substitution
    // (CmrExecutor.java:46-49); identifier-boundary-aware so a param D
    // never clobbers a LET/FOREACH/param named D2 (longest-first kept as
    // belt-and-braces among the params themselves)
    val substituted = params.toSeq.sortBy(-_._1.length).foldLeft(script) {
      case (s, (k, v)) =>
        ("\\$" + java.util.regex.Pattern.quote(k) + "(?![A-Za-z0-9_])").r
          .replaceAllIn(s.replace(s"%$k%", v),
            java.util.regex.Matcher.quoteReplacement(v))
    }
    // preprocessor order: FOREACH first (loop vars feed IF conditions and
    // DATE bases), then IF (drops dead branches before they cost anything),
    // then LET bindings (computed on the surviving text only — a LET in a
    // dropped branch never evaluates), then DATE substitution
    val p = new P(lex(expandDates(expandLets(spark,
      expandIf(expandForeach(substituted))))))
    var env = env0
    def rel(name: String): DataFrame =
      env.getOrElse(name, sys.error(s"undefined relation: $name"))

    def statement(p: P): Unit = {
      if (p.punct(";")) () // empty statement
      else if (p.stmtKw("PROGRAM")) { p.str(); p.expectPunct(";") }
      // FUNCTION name com.example.Cls('arg', …); (grammar :24 — uri may
      // also be a quoted string; parens optional) — register a UDF by
      // class name for use in any later expression (the reference loaded
      // Pig EvalFuncs the same way: functions/PigEvalFuncWrapper.java:38-51).
      // The class implements UserFunction and registers itself into the
      // session's function registry, receiving the declared constant args.
      else if (p.stmtKw("FUNCTION")) {
        val name = p.ident()
        val cls = p.peek match {
          case Some(Str(_)) => p.str()
          case _ =>
            val sb = new StringBuilder(p.ident())
            while (p.punct(".")) { sb += '.'; sb ++= p.ident() }
            sb.result()
        }
        val args = Seq.newBuilder[String]
        if (p.punct("(")) {
          if (!p.punct(")")) {
            def const(): String = p.peek match {
              case Some(Str(_)) => p.str()
              case Some(Num(_)) => p.num()
              case _            => p.ident() // booleans
            }
            args += const()
            while (p.punct(",")) args += const()
            p.expectPunct(")")
          }
        }
        val klass = Class.forName(cls)
        if (classOf[UserFunction].isAssignableFrom(klass))
          klass.getDeclaredConstructor().newInstance()
            .asInstanceOf[UserFunction].register(spark, name, args.result())
        // a real Pig UDF (jar shipped via REGISTER), wrapped reflectively
        // with constants as constructor args — most specific contract
        // first: Algebraic registers as a partial-aggregating UDAF,
        // Accumulator as a whole-group UDAF, plain EvalFunc as a scalar
        else if (graft.functions.PigUdf.isAlgebraic(klass))
          graft.functions.PigUdf.registerAlgebraic(spark, name, klass, args.result())
        else if (graft.functions.PigUdf.isAccumulator(klass))
          graft.functions.PigUdf.registerAccumulator(spark, name, klass, args.result())
        else if (graft.functions.PigUdf.isEvalFunc(klass))
          graft.functions.PigUdf.register(spark, name, klass, args.result())
        else throw new IllegalArgumentException(
          s"$cls is neither a graft UserFunction nor a Pig EvalFunc")
        p.expectPunct(";")
      }
      // REGISTER 'path/to.jar'; (grammar :23) — ship a UDF jar. The
      // session resource loader gives SQL ADD JAR semantics: the jar joins
      // the DRIVER classloader (so a later FUNCTION/OPERATOR Class.forName
      // can resolve it) and is distributed to executors. URI-aware
      // existence check (hdfs:// etc.); missing jars are recorded-and-
      // ignored like SET, so compile-only runs of cluster scripts parse.
      else if (p.stmtKw("REGISTER")) {
        val jar = p.str()
        val hp = new org.apache.hadoop.fs.Path(jar)
        val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (fs.exists(hp)) spark.sessionState.resourceLoader.addJar(jar)
        p.expectPunct(";")
      }
      // CREATE DICTIONARY d COLUMN c VALUES 'a','b' [COLUMN …]; (grammar
      // :30-31) — a dictionary relation with EXPLICITLY declared values;
      // codes are 1..N in declaration order (CodeDictionary adds in order,
      // codes start at 1). Shape matches Dictionary.createMulti
      // ((colname, colvalue, code)) so ENCODE/DECODE consume it directly.
      else if (p.stmtKw("CREATE")) {
        p.expectKw("DICTIONARY")
        val name = p.ident()
        val rows = Seq.newBuilder[(String, String, Int)]
        var more = p.kw("COLUMN")
        if (!more) sys.error("CREATE DICTIONARY needs at least one COLUMN clause")
        while (more) {
          val c = p.ident(); p.expectKw("VALUES")
          var code = 1
          rows += ((c, p.str(), code))
          while (p.punct(",")) { code += 1; rows += ((c, p.str(), code)) }
          more = p.kw("COLUMN")
        }
        p.expectPunct(";")
        import spark.implicits._
        env += (name -> rows.result().toDF("colname", "colvalue", "code"))
      }
      // ---- MR phase syntax, parsed but ERASED to dataflow (SURVEY §7.1):
      // JOB/END group statements, MAP/REDUCE braces concatenate, REDUCERS
      // and SET are recorded-and-ignored (Catalyst plans the shuffles)
      else if (p.stmtKw("SET")) { p.ident(); p.exprUntil(Set.empty); p.expectPunct(";") }
      else if (p.stmtKw("JOB")) { p.str() }
      else if (p.stmtKw("END")) ()
      else if (p.stmtKw("REDUCERS")) { p.num(); p.expectPunct(";") }
      else if (p.stmtKw("MAP") || p.stmtKw("REDUCE")) {
        p.expectPunct("{")
        while (!p.punct("}")) statement(p)
      }
      else if (p.stmtKw("SHUFFLE")) {
        // phase-form SHUFFLE (no lhs): re-binds the relation in place.
        // AGGREGATES = the combiner declaration (ShuffleRewriter.java:495-523)
        // — the full aggregation is planned partial+final by Spark, so the
        // declared combine IS the aggregation
        val name = p.ident()
        p.expectKw("PARTITIONED"); p.expectKw("ON")
        val parts = identList(p)
        val sorts = if (p.kw("SORTED")) { p.expectKw("ON"); identList(p) } else Nil
        val df = rel(name)
        val out =
          if (p.kw("AGGREGATES")) Aggregations.groupBy(df, parts, aggList(p, df))
          else Blockgen.blockgenInFlight(df, parts, sorts)
        env = env.updated(name, out)
        p.expectPunct(";")
      }
      else if (p.stmtKw("MULTIPASS")) {
        // MULTIPASS { cmds } { cmds }+ — several single-pass chains over one
        // materialized input (grammar :74-76; reference:
        // plan/physical/PhaseExecutor.java:114-154). On Spark: persist every
        // relation referenced by more than one group, then run the groups.
        val groups = Vector.newBuilder[Vector[Tok]]
        while (p.punct("{")) {
          val slice = Vector.newBuilder[Tok]
          var depth = 1
          while (depth > 0) p.next() match {
            case t @ Punct("{") => depth += 1; slice += t
            case t @ Punct("}") => depth -= 1; if (depth > 0) slice += t
            case t => slice += t
          }
          groups += slice.result()
        }
        val gs = groups.result()
        require(gs.length >= 2, "MULTIPASS needs at least two { } groups")
        val wordSets = gs.map(_.collect { case Word(w) => w }.toSet)
        env.keys.filter(n => wordSets.count(_.contains(n)) >= 2)
          .foreach(n => env(n).persist())
        gs.foreach { slice =>
          val sub = new P(slice)
          while (sub.peek.isDefined) statement(sub)
        }
      }
      else if (p.stmtKw("ONCOMPLETION")) {
        // ONCOMPLETION { RM 'p'; MV 'a' 'b'; MKDIR 'p'; DUMP rel; }
        // (reference: plan/physical/CompletionTasks.java:28, grammar :195-201)
        drainStores() // completion tasks see every finished write
        val fs = org.apache.hadoop.fs.FileSystem.get(
          spark.sparkContext.hadoopConfiguration)
        p.expectPunct("{")
        while (!p.punct("}")) {
          if (p.kw("RM")) fs.delete(new org.apache.hadoop.fs.Path(p.str()), true)
          else if (p.kw("MV")) {
            val from = p.str(); val to = p.str()
            fs.rename(new org.apache.hadoop.fs.Path(from), new org.apache.hadoop.fs.Path(to))
          } else if (p.kw("MKDIR")) fs.mkdirs(new org.apache.hadoop.fs.Path(p.str()))
          else if (p.kw("DUMP")) rel(p.ident()).show(20, truncate = false)
          else sys.error(s"unknown completion task at ${p.peek}")
          p.expectPunct(";")
        }
      }
      else if (p.stmtKw("STORE")) {
        val relName = p.ident()
        val r = rel(relName)
        // deselected under --only: analyze (loud on schema errors), no write
        val selected = only.forall(_.contains(relName))
        p.expectKw("INTO"); val path = p.str()
        p.expectKw("USING"); val fmt = p.ident().toLowerCase
        val wp = formatParamMap(p) // writer params (overwrite is the default)
        // ("zorder": "a,b"[, "files": "n"]) — z-order-clustered parquet
        // layout (sources.Layout); ("partition_by": "a,b") — hive-style
        // partition directories; otherwise the plain writer path
        // resolve layout params against the schema even under --dry-run,
        // so a typo'd column or bad "files" fails at compile time, not in
        // the real run (the dry-run contract in ScriptRunner)
        def resolved(param: String, csv: String): Seq[String] = {
          val cols = csv.split(",").map(_.trim).toSeq
          val missing = cols.filterNot(r.columns.contains)
          require(missing.isEmpty,
            s"""$param column(s) ${missing.mkString(", ")} not in schema ${r.columns.mkString(", ")}""")
          cols
        }
        val nFiles = wp.get("files").map { f =>
          require(f.matches("\\d+") && f.toInt > 0, s"bad \"files\" value: $f")
          f.toInt
        }
        (wp.get("zorder"), wp.get("partition_by")) match {
          case (Some(_), Some(_)) =>
            // silently ignoring one of them wrote a layout the caller did
            // not ask for — refuse instead
            throw new IllegalArgumentException(
              "STORE: \"zorder\" and \"partition_by\" cannot combine — " +
                "z-order clusters files within one directory; partition the " +
                "data first and zorder each partition separately if needed")
          case (Some(zc), _) =>
            require(fmt == "parquet" || fmt == "rubix",
              s"zorder storage param requires parquet, got $fmt")
            val zCols = resolved("zorder", zc)
            zCols.foreach { c =>
              val dt = r.schema(c).dataType
              require(dt.isInstanceOf[org.apache.spark.sql.types.NumericType] ||
                dt == org.apache.spark.sql.types.DateType ||
                dt == org.apache.spark.sql.types.TimestampType,
                s"zorder column $c must be numeric/date/timestamp, got ${dt.simpleString}")
            }
            if (dryRun) store(r, path, fmt)
            else if (!selected) { r.schema; () }
            else submitStore(relName, r, path)(graft.sources.Layout.zorderWrite(r,
              path, zCols,
              nFiles.getOrElse(spark.sessionState.conf.numShufflePartitions)))
          case (None, Some(pb)) =>
            val pCols = resolved("partition_by", pb)
            // "files" bounds the file count per written partition dir
            val rr = nFiles.map(r.repartition(_, pCols.map(col): _*)).getOrElse(r)
            if (dryRun) store(r, path, fmt)
            else if (!selected) { r.schema; () }
            else submitStore(relName, r, path)(
              graft.sources.Sources.store(rr, path, fmt, partitionBy = pCols))
          case _ =>
            val rr = nFiles.map(r.repartition(_)).getOrElse(r)
            if (selected) submitStore(relName, r, path)(store(rr, path, fmt))
            else { r.schema; () }
        }
        p.expectPunct(";")
      } else {
        val name = p.ident()
        p.expectPunct("=")
        // a relation definition may LOAD a path a pending STORE is still
        // writing — e.g. STORE a INTO 'p'; b = LOAD 'p' ...
        drainStores()
        val df = parseOperator(spark, p, rel, store)
        env = env.updated(name, df)
        p.expectPunct(";")
      }
    }
    try {
      while (p.peek.isDefined) statement(p)
      drainStores()
    } finally {
      // a statement failure mid-script must still await in-flight writes
      // (but never mask the original exception with a store failure)
      try drainStores() catch { case _: Throwable => () }
      if (storeThreads.get() > 0) storePool.shutdown()
    }
    env
  }

  /** Contract for user-defined operators loadable by class name from a
    * script — the reference's uriOperator / USER_DEFINED_TUPLE_OPERATOR
    * (grammar :133, operator/OperatorType.java:59-60). Implementations need
    * a no-arg constructor.
    */
  trait UserOperator {
    def apply(inputs: Seq[DataFrame], params: Map[String, String]): DataFrame
  }

  /** Contract for user-defined scalar functions declared by class name
    * (`FUNCTION name 'class';` — the reference's Pig-EvalFunc registration,
    * grammar :24). The implementation registers whatever signature it
    * wants under `name` (spark.udf.register, or a native Expression via
    * the registry); afterwards the name resolves inside any script
    * expression. Needs a no-arg constructor.
    */
  trait UserFunction {
    /** `args` are the constant constructor arguments from the declaration
      * (`FUNCTION f com.x.F('a', 1);` → Seq("a", "1")); empty when omitted.
      */
    def register(spark: SparkSession, name: String, args: Seq[String]): Unit
  }

  private def parseOperator(spark: SparkSession, p: P, rel: String => DataFrame,
                            store: (DataFrame, String, String) => Unit): DataFrame = {
    if (p.kw("OPERATOR")) {
      // o = OPERATOR 'fully.qualified.ClassName' in1, in2 ['(' 'k':'v', … ')'];
      val cls = p.str()
      val inputs = identList(p).map(rel)
      val params = Seq.newBuilder[(String, String)]
      if (p.punct("(")) {
        if (!p.punct(")")) {
          val k = p.str(); p.expectPunct(":"); params += (k -> p.str())
          while (p.punct(",")) { val k2 = p.str(); p.expectPunct(":"); params += (k2 -> p.str()) }
          p.expectPunct(")")
        }
      }
      Class.forName(cls).getDeclaredConstructor().newInstance()
        .asInstanceOf[UserOperator](inputs, params.result().toMap)
    } else if (p.kw("LOAD")) {
      if (p.kw("BLOCK")) {
        // LOAD BLOCK [IN MEMORY] FROM table MATCHING x — read the co-bucketed
        // table; MATCHING is metadata on Spark (the bucket spec already
        // co-partitions, reference: operator/LoadBlockOperator.java:37)
        if (p.kw("IN")) p.expectKw("MEMORY")
        p.expectKw("FROM")
        val table = p.peek match { case Some(Str(_)) => p.str(); case _ => p.ident() }
        p.expectKw("MATCHING"); p.ident()
        Blockgen.loadBlock(spark, table)
      } else {
        val path = p.str()
        p.expectKw("USING")
        val fmt = p.ident().toLowerCase
        graft.sources.Sources.load(spark, path, fmt, formatParams(p))
      }
    } else if (p.kw("NO_OP")) {
      // NO_OP x [ASSERT PARTITIONED ON p SORTED ON s] — identity; the sort
      // assertion runs as a real runtime check (reference: NullOperator.java:31)
      val df = rel(p.ident())
      var out = df
      if (p.kw("ASSERT")) {
        if (p.kw("PARTITIONED")) { p.expectKw("ON"); identList(p) }
        if (p.kw("SORTED")) { p.expectKw("ON"); out = Relational.validateSorted(df, identList(p)) }
      }
      out
    } else if (p.kw("VALIDATE")) {
      // VALIDATE x BY type PARTITIONED ON p [SORTED ON s]
      // (reference: operator/ValidateOperator.java:38)
      val df = rel(p.ident())
      p.expectKw("BY"); p.ident() // blockgen type — informational on Spark
      p.expectKw("PARTITIONED"); p.expectKw("ON"); val parts = identList(p)
      val sorts = if (p.kw("SORTED")) { p.expectKw("ON"); identList(p) } else parts
      Relational.validateSorted(df, sorts)
    } else if (p.kw("COMBINE")) {
      // COMBINE a, b SORTED ON cols — order-preserving k-way merge
      // (reference: operator/CombineOperator.java:35)
      val dfs = identList(p).map(rel)
      p.expectKw("SORTED"); p.expectKw("ON")
      Relational.combine(identList(p).map(col), dfs: _*)
    } else if (p.kw("PIVOT")) {
      // PIVOT [IN MEMORY] x ON cols — co-locate pivot groups so downstream
      // per-pivot operators see complete runs (reference: PivotBlockOperator.java:62)
      if (p.kw("IN")) p.expectKw("MEMORY")
      val df = rel(p.ident())
      p.expectKw("ON")
      val cols = identList(p)
      Blockgen.blockgenInFlight(df, cols, cols)
    } else if (p.kw("FROM")) {
      val df = rel(p.ident())
      p.expectKw("GENERATE")
      val es = aliasedExprs(p, df, Set.empty)
      df.select(es.map { case (c, a) => a.map(c.as).getOrElse(c) }: _*)
    } else if (p.kw("FILTER")) {
      val df = rel(p.ident())
      p.expectKw("BY")
      df.filter(toColumn(p.exprUntil(Set.empty), df))
    } else if (p.kw("LIMIT")) {
      val df = rel(p.ident()); df.limit(p.num().toInt)
    } else if (p.kw("DISTINCT")) {
      rel(p.ident()).distinct()
    } else if (p.kw("DUPLICATE")) {
      val df = rel(p.ident()); val n = p.num().toInt
      p.kw("TIMES")
      val counter = if (p.kw("COUNTER")) { p.expectKw("AS"); Some(p.ident()) } else None
      Relational.duplicate(df, n, counter)
    } else if (p.kw("FLATTEN")) {
      // FLATTEN x BY col [AS name]                  — our concise bag form
      //           | col TUPLE (n:t,…)               — struct → columns
      //           | col BAG (n:t,…)                 — one row per element
      //           | col BAG_TUPLE (n:t,…)           — explode then splat
      // (grammar flattenItem :141-144; the (name:type) list is the
      // reference's redeclaration of inferred fields — parsed, names used
      // for the BAG output column, types validated by Catalyst)
      val df = rel(p.ident())
      p.expectKw("BY"); val c = p.ident()
      def typeNames(): Seq[String] = {
        val names = Seq.newBuilder[String]
        if (p.punct("(")) {
          names += p.ident()
          if (p.punct(":")) p.ident()
          while (p.punct(",")) { names += p.ident(); if (p.punct(":")) p.ident() }
          p.expectPunct(")")
        }
        names.result()
      }
      if (p.kw("TUPLE")) { typeNames(); Relational.flattenTuple(df, c) }
      else if (p.kw("BAG_TUPLE")) { typeNames(); Relational.flattenBagTuple(df, c) }
      else if (p.kw("BAG")) {
        val names = typeNames()
        Relational.flattenBag(df, c, names.headOption.getOrElse(c))
      } else {
        p.expectKw("AS"); Relational.flattenBag(df, c, p.ident())
      }
    } else if (p.kw("GATHER")) {
      identList(p).map(rel).reduce(_ unionByName _)
    } else if (p.kw("DICTIONARY")) {
      // DICTIONARY x ON cols — one column gives the plain (colvalue, code)
      // relation; several give the reference's global (colname, colvalue,
      // code) shape (GenerateDictionary.java:50)
      val df = rel(p.ident())
      p.expectKw("ON")
      val cs = identList(p)
      if (cs.length == 1) Dictionary.create(df, cs.head)
      else Dictionary.createMulti(df, cs)
    } else if (p.kw("ENCODE")) {
      // ENCODE x ON cols USING (dictRel | 'path') [NULLS AS n] [UNKNOWNS AS u]
      // (grammar: encodeOperator accepts a stored-dictionary path or a name)
      val df = rel(p.ident())
      p.expectKw("ON"); val cs = identList(p)
      p.expectKw("USING")
      val dict = p.peek match {
        case Some(Str(_)) => spark.read.parquet(p.str())
        case _            => rel(p.ident())
      }
      val nulls = if (p.kw("NULLS")) { p.expectKw("AS"); p.num().toInt } else 0
      val unknowns = if (p.kw("UNKNOWNS")) { p.expectKw("AS"); Some(p.num().toInt) } else None
      Dictionary.encodeMulti(df, cs, dict, nulls, unknowns)
    } else if (p.kw("DECODE")) {
      val df = rel(p.ident())
      p.expectKw("ON"); val cs = identList(p)
      p.expectKw("USING")
      val dict = p.peek match {
        case Some(Str(_)) => spark.read.parquet(p.str())
        case _            => rel(p.ident())
      }
      val unknowns = if (p.kw("UNKNOWNS")) { p.expectKw("AS"); Some(p.str()) } else None
      Dictionary.decodeMulti(df, cs, dict, unknowns)
    } else if (p.kw("TEE")) {
      // TEE x INTO 'path' USING fmt [IF cond] — side output; main flow
      // continues (WITH SPLIT removes matching rows from main)
      val withSplit = { val b = p.kw("WITH"); if (b) p.expectKw("SPLIT"); b }
      val df = rel(p.ident())
      p.expectKw("INTO"); val path = p.str()
      p.expectKw("USING"); val fmt = p.ident().toLowerCase
      formatParams(p) // writer params accepted
      // optional GENERATE e1 AS n1, …: project the TEED rows only — the main
      // flow keeps the input schema (reference: TeeOperator.java:33)
      val proj: DataFrame => DataFrame =
        if (p.kw("GENERATE")) {
          val es = aliasedExprs(p, df, Set("IF"))
          d => d.select(es.map { case (c, a) => a.map(c.as).getOrElse(c) }: _*)
        } else identity
      val cond = if (p.kw("IF")) Some(toColumn(p.exprUntil(Set.empty), df)) else None
      (withSplit, cond) match {
        case (true, Some(c)) =>
          val (main, teed) = Relational.split(df, c)
          store(proj(teed), path, fmt); main
        case (true, None) =>
          // WITH SPLIT and no IF: every row is teed and leaves the main flow
          // (reference TeeOperator semantics) — main continues empty.
          store(proj(df), path, fmt)
          df.filter(lit(false))
        case (false, condOpt) =>
          store(proj(condOpt.map(df.filter).getOrElse(df)), path, fmt); df
      }
    } else if (p.kw("LOAD-CACHED")) {
      val path = p.str()
      p.expectKw("USING")
      val fmt = p.ident().toLowerCase
      graft.sources.Sources.loadCached(spark, path, fmt, formatParams(p))
    } else if (p.kw("BLOCKGEN")) {
      // BLOCKGEN x PARTITIONED ON p [SORTED ON s] INTO table BUCKETS n
      val df = rel(p.ident())
      p.expectKw("PARTITIONED"); p.expectKw("ON")
      val parts = identList(p)
      val sorts = if (p.kw("SORTED")) { p.expectKw("ON"); identList(p) } else parts
      p.expectKw("INTO"); val table = p.ident()
      p.expectKw("BUCKETS"); val buckets = p.num().toInt
      Blockgen.blockgen(df, table, parts, sorts, buckets)
      Blockgen.loadBlock(spark, table)
    } else if (p.kw("SORT")) {
      val df = rel(p.ident())
      p.expectKw("ON")
      df.sortWithinPartitions(orderCols(orderList(p)): _*)
    } else if (p.stmtKw("SHUFFLE")) {
      val df = rel(p.ident())
      p.expectKw("PARTITIONED"); p.expectKw("ON")
      val parts = identList(p)
      val sorts = if (p.kw("SORTED")) { p.expectKw("ON"); identList(p) } else Nil
      Blockgen.blockgenInFlight(df, parts, sorts)
    } else if (p.kw("GROUP")) {
      val df = rel(p.ident())
      p.expectKw("BY")
      val keys = if (p.kw("ALL")) Nil else identList(p)
      // AGGREGATES is optional in the grammar (groupByOperator, :110):
      // without it, GROUP emits one row per group — a distinct of the keys
      if (p.kw("AGGREGATES")) {
        val aggs = aggList(p, df)
        if (keys.isEmpty) Aggregations.groupByAll(df, aggs)
        else Aggregations.groupBy(df, keys, aggs)
      } else if (keys.isEmpty) df.select().distinct()
      else df.select(keys.map(col): _*).distinct()
    } else if (p.kw("CUBE")) {
      // CUBE x BY dims [INNER cols] AGGREGATES ...; with INNER, the single
      // aggregate must be the duple form OUTER(INNER_AGG(col)) — e.g.
      // MAX(SUM(clicks)) — computed per grouping-set ∪ inner
      // (reference: CubertPhysical.g4:121, DupleCubeAggregator.java:33)
      val df = rel(p.ident())
      p.expectKw("BY"); val dims = identList(p)
      val inner = if (p.kw("INNER")) identList(p) else Nil
      p.expectKw("AGGREGATES")
      val result = if (inner.isEmpty) {
        val aggs = aggListRaw(p, df)
        // optional GROUPING SETS ((a,b),(a),()) | GROUPING COMBOS n |
        // ROLLUPS (a,b),(c) clause (grammar :135-137)
        if (p.kw("GROUPING")) {
          if (p.kw("COMBOS")) {
            // all grouping sets of size ≤ n (CubeDimensions GROUPING COMBOS)
            CubeOps.groupingCombos(df, dims, p.num().toInt, aggs.map(_._2))
          } else {
            p.expectKw("SETS")
            p.expectPunct("(")
            val sets = Seq.newBuilder[Seq[String]]
            var more = true
            while (more) {
              sets += cuboid(p)
              more = p.punct(",")
            }
            p.expectPunct(")")
            CubeOps.groupingSets(df, dims, sets.result(), aggs.map(_._2))
          }
        } else if (p.kw("ROLLUPS")) {
          // ROLLUPS (a,b),(c): union of the prefix grouping sets of each
          // listed hierarchy (rollupsClause, grammar :137)
          val cuboids = Seq.newBuilder[Seq[String]]
          cuboids += cuboid(p)
          while (p.punct(",")) cuboids += cuboid(p)
          val sets = cuboids.result()
            .flatMap(c => (0 to c.length).reverse.map(c.take)).distinct
          CubeOps.groupingSets(df, dims, sets, aggs.map(_._2))
        } else CubeOps.cube(df, dims, aggs.map(_._1))
      } else {
        val outer = p.ident()
        p.expectPunct("(")
        val innerAggSql = p.exprUntil(Set.empty)
        p.expectPunct(")")
        p.expectKw("AS")
        val alias = p.ident()
        CubeOps.dupleCube(df, dims, inner, outer.toLowerCase, innerAggSql, alias)
      }
      // HTSIZE n (grammar :121) sized the reference's in-memory cube hash
      // table; Spark's HashAggregate spills, so the knob parses and erases
      if (p.kw("HTSIZE")) p.num()
      result
    } else if (p.kw("ROLLUP")) {
      val df = rel(p.ident())
      p.expectKw("BY"); val dims = identList(p)
      p.expectKw("AGGREGATES")
      CubeOps.rollup(df, dims, aggList(p, df))
    } else if (p.kw("TOP")) {
      val n = p.num().toInt
      p.expectKw("FROM"); val df = rel(p.ident())
      val g = if (p.kw("GROUP")) { p.expectKw("BY"); identList(p) } else Nil
      p.expectKw("ORDER"); p.expectKw("BY")
      WindowOps.topN(df, n, g, orderCols(orderList(p)))
    } else if (p.kw("RANK")) {
      val df = rel(p.ident())
      p.expectKw("AS"); val as = p.ident()
      val g = if (p.kw("GROUP")) { p.expectKw("BY"); identList(p) } else Nil
      val o = if (p.kw("ORDER")) { p.expectKw("BY"); orderList(p) } else Nil
      WindowOps.rank(df, as, g, orderCols(o))
    } else {
      // join family: [LEFT|RIGHT|FULL] [OUTER] JOIN | HASH-JOIN
      val how =
        if (p.kw("LEFT")) { p.kw("OUTER"); "left" }
        else if (p.kw("RIGHT")) { p.kw("OUTER"); "right" }
        else if (p.kw("FULL")) { p.kw("OUTER"); "full" }
        else "inner"
      val hash = p.kw("HASH-JOIN")
      if (!hash) p.expectKw("JOIN")
      val left = rel(p.ident())
      p.expectKw("BY")
      // left keys run until ", <ident> BY" introduces the right relation
      val lkb = Seq.newBuilder[String]
      lkb += p.ident()
      var rightName: String = null
      while (rightName == null) {
        p.expectPunct(",")
        val id = p.ident()
        if (p.kw("BY")) rightName = id else lkb += id
      }
      val lk = lkb.result()
      val right = rel(rightName)
      val rk = identList(p)
      require(lk == rk, s"script JOIN requires same-named keys on both sides (got $lk vs $rk); " +
        "rename with FROM..GENERATE first")
      if (hash) Joins.hashJoin(left, right, lk, how) else Joins.rsJoin(left, right, lk, how)
    }
  }
}
