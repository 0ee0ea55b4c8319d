package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The DuckDB-dialect SQL front door (r12 verdict #5) — the other half of
  * the engine-switch story, one layer above the [[DuckDialect]] function
  * aliases: run a DuckDB-flavored oracle text on Spark.
  *
  *  1. TYPE-TOKEN rewrites, applied OUTSIDE string literals only:
  *     `DOUBLE[]` → `ARRAY<DOUBLE>` (DuckDB list-type syntax),
  *     `AS VARCHAR` → `AS STRING` (bare VARCHAR cast), the
  *     `//` integer-division operator → ` DIV `, the bare aggregate
  *     `FILTER (cond)` → `FILTER (WHERE cond)` (DuckDB makes WHERE
  *     optional; the rewrite fires only after a closing paren, so the
  *     higher-order `filter(arr, fn)` function is never touched),
  *     DuckDB's inside-the-call `f(expr IGNORE NULLS)` → standard
  *     `f(expr) IGNORE NULLS`, and the 1-based inclusive list slice
  *     `xs[lo:hi]` → `slice(xs, lo, hi-lo+1)` (identifier receiver,
  *     integer-literal bounds). Pure spelling, no
  *     semantics: each converted query is equality-checked against both
  *     DuckDB and the DataFrame implementation in SqlParitySpec.
  *  2. `WITH RECURSIVE` expansion: Spark 4's native recursion accepts only
  *     UNION ALL members, but the SQL-standard closure idiom (and every
  *     recursive oracle here) uses UNION — on a cyclic edge relation
  *     UNION ALL never terminates, so "just rewrite it" is not an option.
  *     The façade parses the CTE list and evaluates each recursive member
  *     by SEMI-NAIVE fixed-point iteration (exactly the standard's
  *     working-table semantics, which is also DuckDB's): the anchor seeds
  *     the accumulator, each round re-binds the CTE name to the LAST
  *     round's new rows, evaluates the step, keeps `distinct − seen`, and
  *     stops on an empty frontier. Each frontier is localCheckpoint-
  *     materialized so the loop's plan depth stays Θ(1) per round.
  *
  * Dialect trade-off (deliberate, like the `regexp_extract_all` group-0
  * default): the [[DuckDialect]] shadows give `chr` Unicode-codepoint
  * semantics (Spark's builtin is ASCII-mod-256) and make the 4th
  * `regexp_replace` argument a DuckDB FLAGS string (only `'g'` accepted —
  * Spark's builtin 4th argument is a start POSITION, which a dialect
  * session gives up; a non-'g' value fails loudly rather than silently
  * changing semantics).
  *
  * This is a PORTABILITY surface: it makes a reference user's SQL run
  * unchanged. The engine's own operators ([[graft.operators.DedupCluster
  * .connectedComponents]] with pointer jumping, the banded/blocked
  * kernels) remain the scale path for closure workloads — the façade's
  * row-at-a-time closure is the standard's semantics, not a 100 TB plan.
  */
object DuckSql {

  /** Hard stop for non-converging recursion (a closure's round count is
    * bounded by the graph diameter; anything near this is a bug or a
    * genuinely divergent query). */
  val MaxIterations = 200

  def sql(spark: SparkSession, text: String): DataFrame = {
    val t = rewriteTokens(text)
    if (RecursivePrefix.findFirstIn(t).isEmpty) spark.sql(t)
    else expandRecursive(spark, t)
  }

  private val RecursivePrefix = "(?is)^\\s*WITH\\s+RECURSIVE\\b".r

  /** Token rewrites outside single-quoted literals ('' escapes handled). */
  private[graft] def rewriteTokens(s: String): String = {
    val out = new StringBuilder(s.length + 16)
    var i = 0
    while (i < s.length) {
      if (s(i) == '\'') {
        val end = skipString(s, i)
        out.append(s.substring(i, end))
        i = end
      } else if (s.startsWith("//", i)) {
        out.append(" DIV "); i += 2
      } else if (matchesWord(s, i, "DOUBLE") && nextNonWs(s, i + 6) == Some('[') &&
          nextNonWsAfterIs(s, i + 6, '[', ']')) {
        out.append("ARRAY<DOUBLE>")
        i = indexAfter(s, i + 6, ']')
      } else if (matchesWord(s, i, "VARCHAR")) {
        out.append("STRING"); i += 7
      } else if (matchesWord(s, i, "FILTER") &&
          lastNonWs(out) == Some(')') && nextNonWs(s, i + 6) == Some('(') &&
          !matchesWord(s, skipWs(s, skipWs(s, i + 6) + 1), "WHERE")) {
        // aggregate FILTER with DuckDB's optional WHERE omitted; the
        // `) FILTER (` shape can't be the higher-order filter() function
        val open = skipWs(s, i + 6)
        out.append(s.substring(i, open + 1)).append("WHERE ")
        i = open + 1
      } else if (s(i) == '[' && sliceExprs(s, i).isDefined &&
          lastIdent(out).isDefined) {
        // DuckDB 1-based inclusive list slice `xs[lo:hi]` → Spark
        // `slice(xs, lo, (hi)-(lo)+1)` (both clamp to the available
        // length); identifier receiver, non-negative bound expressions
        // (a negative from-the-end bound has no direct slice() analogue
        // and stays untouched → loud parse error)
        val (lo, hi, after) = sliceExprs(s, i).get
        val id = lastIdent(out).get
        out.setLength(out.length - id.length)
        val loR = rewriteTokens(lo)
        val hiR = rewriteTokens(hi)
        out.append(s"slice($id, $loR, ($hiR) - ($loR) + 1)")
        i = after
      } else if (s(i) == '[' && lastIdent(out).isDefined &&
          bracketEnd(s, i).exists(e => !s.substring(i + 1, e - 1).contains(':'))) {
        // DuckDB 1-based list indexing `xs[i]` (NULL out of range) →
        // `try_element_at(xs, i)` — Spark's bare `xs[i]` is 0-based and
        // would be a silent off-by-one; the inner expression is recursively
        // rewritten (it may itself carry `//` or nested indexing). A
        // non-literal slice (`xs[a:b]`, the ':' guard) stays untouched —
        // a loud parse error beats a silent semantic change.
        val end = bracketEnd(s, i).get
        val id = lastIdent(out).get
        out.setLength(out.length - id.length)
        // the CAST matters: series subscripts arrive as BIGINT and Spark's
        // element_at index parameter is INT-typed
        out.append(s"try_element_at($id, CAST(" +
          s"${rewriteTokens(s.substring(i + 1, end - 1))} AS INT))")
        i = end
      } else if (matchesWord(s, i, "UNNEST") && nextNonWs(s, i + 6) == Some('(')) {
        // DuckDB's SELECT-list unnest ≡ Spark's explode generator (one
        // generator per SELECT list — same constraint in both engines'
        // planners for the texts this facade carries)
        out.append("explode"); i += 6
      } else if (matchesWord(s, i, "STRING_AGG") && nextNonWs(s, i + 10) == Some('(') &&
          aggOrderSplit(s, skipWs(s, i + 10)).isDefined) {
        // DuckDB's in-call ordered aggregate `string_agg(x, sep ORDER BY
        // k)` → the standard listagg spelling Spark 4 implements:
        // `listagg(x, sep) WITHIN GROUP (ORDER BY k)`
        val open = skipWs(s, i + 10)
        val (args, order, after) = aggOrderSplit(s, open).get
        out.append(s"listagg(${rewriteTokens(args)}) WITHIN GROUP (ORDER BY ${rewriteTokens(order)})")
        i = after
      } else if (matchesWord(s, i, "MATERIALIZED") &&
          lastWordIs(out, "AS") && nextNonWs(s, i + 12) == Some('(')) {
        // DuckDB's `cte AS MATERIALIZED (...)` — a materialization HINT,
        // not semantics; Spark has no spelling for it, drop the word
        i += 12
        while (i < s.length && s(i).isWhitespace) i += 1
      } else if (matchesWord(s, i, "IGNORE") && {
        val n = skipWs(s, i + 6)
        matchesWord(s, n, "NULLS") && nextNonWs(s, n + 5) == Some(')')
      }) {
        // f(expr IGNORE NULLS) — DuckDB allows the modifier inside the
        // call; the standard (and Spark) puts it after: f(expr) IGNORE NULLS
        val close = skipWs(s, skipWs(s, i + 6) + 5)
        out.append(") IGNORE NULLS")
        i = close + 1
      } else {
        out.append(s(i)); i += 1
      }
    }
    out.toString
  }

  private def lastNonWs(sb: StringBuilder): Option[Char] = {
    var i = sb.length - 1
    while (i >= 0 && sb.charAt(i).isWhitespace) i -= 1
    if (i >= 0) Some(sb.charAt(i)) else None
  }

  /** Whether the builder's last complete word equals `w` (case-insensitive). */
  private def lastWordIs(sb: StringBuilder, w: String): Boolean = {
    var e = sb.length
    while (e > 0 && sb.charAt(e - 1).isWhitespace) e -= 1
    var b = e
    while (b > 0 && isIdent(sb.charAt(b - 1))) b -= 1
    e - b == w.length && sb.substring(b, e).equalsIgnoreCase(w)
  }

  /** The (possibly dot-qualified) identifier the builder currently ends
    * with (no trailing ws): `ws`, `t.ws` — but not a numeric literal. */
  private def lastIdent(sb: StringBuilder): Option[String] = {
    var i = sb.length
    while (i > 0 && (isIdent(sb.charAt(i - 1)) ||
        (sb.charAt(i - 1) == '.' && i - 1 > 0 && isIdent(sb.charAt(i - 2))))) i -= 1
    if (i < sb.length && !(i > 0 && sb.charAt(i - 1) == '\'')) {
      val id = sb.substring(i)
      val segs = id.split('.')
      if (segs.exists(s => s.isEmpty || s.head.isDigit)) None else Some(id)
    } else None
  }

  /** For an aggregate call whose '(' is at `i0`: split the argument text
    * at a top-level ` ORDER BY ` — returns (args, orderKeys, index after
    * the ')'); None when the call carries no in-call ORDER BY. */
  private def aggOrderSplit(s: String, i0: Int): Option[(String, String, Int)] = {
    val end = matchParen(s, i0)
    val inner = s.substring(i0 + 1, end - 1)
    var depth = 0
    var i = 0
    while (i < inner.length) {
      inner(i) match {
        case '\'' => i = skipString(inner, i) - 1
        case '(' | '[' => depth += 1
        case ')' | ']' => depth -= 1
        case _ if depth == 0 && matchesWord(inner, i, "ORDER") &&
            matchesWord(inner, skipWs(inner, i + 5), "BY") =>
          val keys = inner.substring(skipWs(inner, i + 5) + 2).trim
          return Some((inner.substring(0, i).trim, keys, end))
        case _ =>
      }
      i += 1
    }
    None
  }

  /** Index AFTER the ']' matching the '[' at `i0`, tracking nesting and
    * skipping string literals; None when unbalanced. */
  private def bracketEnd(s: String, i0: Int): Option[Int] = {
    var depth = 0
    var i = i0
    while (i < s.length) {
      s(i) match {
        case '\'' => i = skipString(s, i) - 1
        case '[' => depth += 1
        case ']' =>
          depth -= 1
          if (depth == 0) return Some(i + 1)
        case _ =>
      }
      i += 1
    }
    None
  }

  /** `[lo:hi]` slice starting at the '[' with EXPRESSION bounds split at
    * the top-level ':' — returns (lo, hi, index after ']'); None when the
    * brackets don't contain a top-level ':' or the upper bound is a
    * from-the-end negative. */
  private def sliceExprs(s: String, i0: Int): Option[(String, String, Int)] = {
    val end = bracketEnd(s, i0).getOrElse(return None)
    val inner = s.substring(i0 + 1, end - 1)
    var depth = 0
    var colon = -1
    var i = 0
    while (i < inner.length && colon < 0) {
      inner(i) match {
        case '\'' => i = skipString(inner, i) - 1
        case '(' | '[' => depth += 1
        case ')' | ']' => depth -= 1
        case ':' if depth == 0 => colon = i
        case _ =>
      }
      i += 1
    }
    if (colon < 0) return None
    val lo = inner.substring(0, colon).trim
    val hi = inner.substring(colon + 1).trim
    if (lo.isEmpty || hi.isEmpty || hi.startsWith("-")) None
    else Some((lo, hi, end))
  }

  /** i points at the opening quote; returns index AFTER the closing quote,
    * treating '' as an escaped quote (the SQL standard). */
  private def skipString(s: String, i0: Int): Int = {
    var i = i0 + 1
    while (i < s.length) {
      if (s(i) == '\'') {
        if (i + 1 < s.length && s(i + 1) == '\'') i += 2
        else return i + 1
      } else i += 1
    }
    s.length
  }

  private def matchesWord(s: String, i: Int, w: String): Boolean =
    s.regionMatches(true, i, w, 0, w.length) &&
      (i == 0 || !isIdent(s(i - 1))) &&
      (i + w.length >= s.length || !isIdent(s(i + w.length)))

  private def isIdent(c: Char): Boolean =
    Character.isLetterOrDigit(c) || c == '_'

  private def nextNonWs(s: String, from: Int): Option[Char] = {
    var i = from
    while (i < s.length && s(i).isWhitespace) i += 1
    if (i < s.length) Some(s(i)) else None
  }

  /** After skipping whitespace from `from`, expect `open` then (whitespace)
    * then `close`. */
  private def nextNonWsAfterIs(s: String, from: Int, open: Char, close: Char): Boolean = {
    var i = from
    while (i < s.length && s(i).isWhitespace) i += 1
    if (i >= s.length || s(i) != open) return false
    i += 1
    while (i < s.length && s(i).isWhitespace) i += 1
    i < s.length && s(i) == close
  }

  private def indexAfter(s: String, from: Int, c: Char): Int = {
    var i = from
    while (s(i) != c) i += 1
    i + 1
  }

  // ── WITH RECURSIVE expansion ───────────────────────────────────────────

  private case class Cte(name: String, cols: Seq[String], body: String)

  private def expandRecursive(spark: SparkSession, text: String): DataFrame = {
    val m = RecursivePrefix.findFirstMatchIn(text).get
    var i = m.end
    val ctes = scala.collection.mutable.ArrayBuffer.empty[Cte]
    var done = false
    while (!done) {
      i = skipWs(text, i)
      val (name, i1) = parseIdent(text, i)
      i = skipWs(text, i1)
      val (cols, i2) =
        if (i < text.length && text(i) == '(') parseIdentList(text, i)
        else (Nil, i)
      i = skipWs(text, i2)
      require(text.regionMatches(true, i, "AS", 0, 2) &&
        (i + 2 >= text.length || !isIdent(text(i + 2))),
        s"expected AS after CTE name $name")
      i = skipWs(text, i + 2)
      require(i < text.length && text(i) == '(', s"expected ( after $name AS")
      val end = matchParen(text, i)
      ctes += Cte(name, cols, text.substring(i + 1, end - 1))
      i = skipWs(text, end)
      if (i < text.length && text(i) == ',') i += 1 else done = true
    }
    val finalSql = text.substring(i)
    val created = scala.collection.mutable.ArrayBuffer.empty[String]
    try {
      ctes.foreach { cte =>
        val df =
          if (referencesName(cte.body, cte.name)) fixpoint(spark, cte)
          else withCols(spark.sql(cte.body), cte.cols)
        df.createOrReplaceTempView(cte.name)
        created += cte.name
      }
      // analysis inlines the view plans, so the returned frame survives the
      // temp-view cleanup below
      spark.sql(finalSql)
    } finally created.foreach(spark.catalog.dropTempView(_))
  }

  private def withCols(df: DataFrame, cols: Seq[String]): DataFrame =
    if (cols.isEmpty) df else df.toDF(cols: _*)

  /** Standard semi-naive evaluation of one recursive member.
    *
    * Every frontier is FROZEN — localCheckpoint-materialized, then wrapped
    * in an independent `createDataFrame` plan per role (working-table view,
    * accumulator element, except() reference). The per-role wrap matters:
    * re-using one plan object across the accumulated unions duplicates its
    * attribute ids through the tree and trips Union's constraint
    * propagation (`key not found: id#N`). */
  private def fixpoint(spark: SparkSession, cte: Cte): DataFrame = {
    val (anchorSql, stepSql, distinctUnion) = splitUnion(cte.body, cte.name)
    def freeze(df: DataFrame): DataFrame = df.localCheckpoint(true)
    def fresh(frozen: DataFrame): DataFrame =
      spark.createDataFrame(frozen.rdd, frozen.schema)
    var frontier = freeze {
      val a = withCols(spark.sql(anchorSql), cte.cols)
      if (distinctUnion) a.distinct() else a
    }
    var acc = fresh(frontier)
    var iter = 0
    while (!frontier.isEmpty && iter < MaxIterations) {
      fresh(frontier).createOrReplaceTempView(cte.name) // the working table
      var next = withCols(spark.sql(stepSql), cte.cols)
      if (distinctUnion) next = next.distinct().except(acc)
      frontier = freeze(next)
      if (!frontier.isEmpty) acc = acc.union(fresh(frontier))
      iter += 1
    }
    require(iter < MaxIterations,
      s"recursive CTE ${cte.name} did not converge in $MaxIterations rounds")
    acc
  }

  /** Split a recursive body at its top-level UNION [ALL]; returns (anchor,
    * step, distinct?). */
  private def splitUnion(body: String, name: String): (String, String, Boolean) = {
    var i = 0
    var depth = 0
    while (i < body.length) {
      body(i) match {
        case '\'' => i = skipString(body, i) - 1
        case '(' => depth += 1
        case ')' => depth -= 1
        case _ if depth == 0 && matchesWord(body, i, "UNION") =>
          val after = skipWs(body, i + 5)
          val isAll = matchesWord(body, after, "ALL")
          val stepStart = if (isAll) after + 3 else i + 5
          return (body.substring(0, i), body.substring(stepStart), !isAll)
        case _ =>
      }
      i += 1
    }
    throw new IllegalArgumentException(
      s"recursive CTE $name has no top-level UNION")
  }

  private def referencesName(body: String, name: String): Boolean = {
    // strip string literals, then look for the name in a TABLE position
    // (FROM <name> / JOIN <name>) — a bare word match false-positives on
    // column aliases that reuse the CTE's name (`SELECT count(*) AS c12
    // ... FROM bg` inside CTE c12 is NOT recursion)
    val sb = new StringBuilder
    var i = 0
    while (i < body.length) {
      if (body(i) == '\'') i = skipString(body, i)
      else { sb.append(body(i)); i += 1 }
    }
    (s"(?is)\\b(from|join)\\s+${java.util.regex.Pattern.quote(name)}" +
      "(?![A-Za-z0-9_])").r.findFirstIn(sb.toString).isDefined
  }

  private def skipWs(s: String, from: Int): Int = {
    var i = from
    while (i < s.length && s(i).isWhitespace) i += 1
    i
  }

  private def parseIdent(s: String, from: Int): (String, Int) = {
    var i = from
    while (i < s.length && isIdent(s(i))) i += 1
    require(i > from, s"expected identifier at ...${s.substring(from, math.min(s.length, from + 30))}")
    (s.substring(from, i), i)
  }

  /** Parse `(a, b, c)` starting at the '('. */
  private def parseIdentList(s: String, from: Int): (Seq[String], Int) = {
    var i = from + 1
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var done = false
    while (!done) {
      i = skipWs(s, i)
      val (id, i1) = parseIdent(s, i)
      out += id
      i = skipWs(s, i1)
      if (s(i) == ',') i += 1
      else { require(s(i) == ')', "expected , or ) in column list"); i += 1; done = true }
    }
    (out.toSeq, i)
  }

  /** i at '('; returns index AFTER the matching ')'. */
  private def matchParen(s: String, i0: Int): Int = {
    var depth = 0
    var i = i0
    while (i < s.length) {
      s(i) match {
        case '\'' => i = skipString(s, i) - 1
        case '(' => depth += 1
        case ')' =>
          depth -= 1
          if (depth == 0) return i + 1
        case _ =>
      }
      i += 1
    }
    throw new IllegalArgumentException("unbalanced parentheses in CTE body")
  }
}
