package graft.sqlapi

/** `QUALIFY` clause support (DuckDB/Snowflake/BigQuery dialect; Delta's
  * SQL surface ships it on Databricks) — a windowed row filter that runs
  * AFTER window evaluation, the idiomatic top-n-per-group form:
  *
  * {{{
  * SELECT c, k, p FROM t
  * QUALIFY row_number() OVER (PARTITION BY c ORDER BY p DESC) <= 2
  * }}}
  *
  * Spark's grammar has no QUALIFY, but its ANALYZER already has everything
  * the clause needs — so this is a pure parse-time TEXT rewrite into the
  * standard shape, and Catalyst plans it exactly as if the user had
  * written the window by hand (one Window + Filter, no extra shuffle):
  *
  * {{{
  * SELECT * EXCEPT (__qualify) FROM (
  *   SELECT <original select list>, (<pred>) AS __qualify FROM ...
  * ) __qualify_src WHERE __qualify
  * <original ORDER BY / LIMIT tail>
  * }}}
  *
  * The predicate is computed INSIDE the select block (windows are legal
  * there; they are not in WHERE), the filter runs outside, and Spark 4's
  * `* EXCEPT` star drops the helper column so the output schema is
  * untouched. Filter-then-distinct equals distinct-then-filter when the
  * filter column rides the distinct tuple, so `SELECT DISTINCT … QUALIFY`
  * keeps DuckDB's clause order (QUALIFY before DISTINCT) too.
  *
  * The rewrite recurses into every parenthesized block INNERMOST-FIRST,
  * so QUALIFY works where users actually put it — CTE bodies, derived
  * tables, scalar subqueries, and the SELECT of an INSERT — each block
  * rewritten independently in its own scope (each block's `__qualify`
  * helper is dropped by its own `* EXCEPT` before the enclosing scope
  * sees the schema). Scanning is quote-aware ('…', "…", `…`) and
  * comment-aware, so literals and comments never confuse the clause
  * boundaries.
  *
  * Guards — shapes the rewrite must NOT touch:
  *  - a block whose text contains no `OVER` token anywhere: Spark does
  *    not reserve `qualify`, so a column/alias/table legally named
  *    `qualify` must keep parsing (a REAL qualify clause always has a
  *    window in the block — in the predicate or behind a select-list
  *    alias); without the token the block passes through verbatim;
  *  - a set operation beside the clause (each branch would need its own
  *    rewrite); set-op keywords are only believed when followed by a
  *    query head (`SELECT`/`WITH`/`VALUES`/`TABLE`/`(`, after an
  *    optional ALL/DISTINCT), so columns named `union`/`minus`/`except`
  *    stay identifiers — and `* EXCEPT (col, …)` stays the select-list
  *    star modifier;
  *  - a non-SELECT statement head (leading comments skipped first).
  * Refusals are loud, never silent: an untouched QUALIFY fails in
  * Spark's own parser with its standard error.
  */
object QualifyRewrite {

  private def isWordChar(c: Char): Boolean = c.isLetterOrDigit || c == '_'

  /** Index just past any whitespace / `--` / bracketed comments at `from`. */
  private def skipWsComments(sql: String, from: Int): Int = {
    var i = from
    val n = sql.length
    var moved = true
    while (moved && i < n) {
      moved = false
      while (i < n && sql.charAt(i).isWhitespace) { i += 1; moved = true }
      if (i + 1 < n && sql.charAt(i) == '-' && sql.charAt(i + 1) == '-') {
        while (i < n && sql.charAt(i) != '\n') i += 1
        moved = true
      } else if (i + 1 < n && sql.charAt(i) == '/' && sql.charAt(i + 1) == '*') {
        var nest = 1; i += 2
        while (i < n && nest > 0) {
          if (i + 1 < n && sql.charAt(i) == '/' && sql.charAt(i + 1) == '*') {
            nest += 1; i += 2
          } else if (i + 1 < n && sql.charAt(i) == '*' && sql.charAt(i + 1) == '/') {
            nest -= 1; i += 2
          } else i += 1
        }
        moved = true
      }
    }
    i
  }

  /** Index of the first quote-free, comment-free, word-bounded occurrence
    * of `kw` (case-insensitive) at or after `from`, or -1. With
    * `anyDepth = false` (the default) only paren depth 0 matches. String
    * literals honor BOTH of Spark's escape conventions (backslash and
    * doubled quotes — a lone backslash always escapes the next char,
    * which also covers `\\`); `--` line comments and nested bracketed
    * comments are skipped entirely.
    */
  private def topLevelIndexOf(sql: String, kw: String, from: Int,
                              anyDepth: Boolean = false): Int = {
    var i = from
    var depth = 0
    val n = sql.length
    def skipQuoted(q: Char): Unit = {
      i += 1
      while (i < n && sql.charAt(i) != q) {
        if (sql.charAt(i) == '\\' && q != '`') i += 2 else i += 1
      }
    }
    while (i < n) {
      sql.charAt(i) match {
        case '\'' => skipQuoted('\'')
        case '"' => skipQuoted('"')
        case '`' => skipQuoted('`')
        case '-' if i + 1 < n && sql.charAt(i + 1) == '-' =>
          while (i < n && sql.charAt(i) != '\n') i += 1
        case '/' if i + 1 < n && sql.charAt(i + 1) == '*' =>
          var nest = 1; i += 2
          while (i < n && nest > 0) {
            if (i + 1 < n && sql.charAt(i) == '/' && sql.charAt(i + 1) == '*') {
              nest += 1; i += 2
            } else if (i + 1 < n && sql.charAt(i) == '*' && sql.charAt(i + 1) == '/') {
              nest -= 1; i += 2
            } else i += 1
          }
          i -= 1 // the loop's own increment lands just past the comment
        case '(' => depth += 1
        case ')' => depth -= 1
        case _ if (anyDepth || depth == 0) &&
            sql.regionMatches(true, i, kw, 0, kw.length) &&
            (i == 0 || !isWordChar(sql.charAt(i - 1))) &&
            (i + kw.length >= n || !isWordChar(sql.charAt(i + kw.length))) =>
          return i
        case _ =>
      }
      i += 1
    }
    -1
  }

  /** Matching `)` for the `(` at `open`, honoring quotes/comments; -1 if
    * unbalanced.
    */
  private def matchingParen(sql: String, open: Int): Int = {
    var i = open
    var depth = 0
    val n = sql.length
    def skipQuoted(q: Char): Unit = {
      i += 1
      while (i < n && sql.charAt(i) != q) {
        if (sql.charAt(i) == '\\' && q != '`') i += 2 else i += 1
      }
    }
    while (i < n) {
      sql.charAt(i) match {
        case '\'' => skipQuoted('\'')
        case '"' => skipQuoted('"')
        case '`' => skipQuoted('`')
        case '-' if i + 1 < n && sql.charAt(i + 1) == '-' =>
          while (i < n && sql.charAt(i) != '\n') i += 1
        case '/' if i + 1 < n && sql.charAt(i + 1) == '*' =>
          var nest = 1; i += 2
          while (i < n && nest > 0) {
            if (i + 1 < n && sql.charAt(i) == '/' && sql.charAt(i + 1) == '*') {
              nest += 1; i += 2
            } else if (i + 1 < n && sql.charAt(i) == '*' && sql.charAt(i + 1) == '/') {
              nest -= 1; i += 2
            } else i += 1
          }
          i -= 1
        case '(' => depth += 1
        case ')' =>
          depth -= 1
          if (depth == 0) return i
        case _ =>
      }
      i += 1
    }
    -1
  }

  /** The rewritten statement, or None when nothing anywhere in it needed
    * (and could safely take) the rewrite.
    */
  def rewrite(sql: String): Option[String] = {
    val out = rewriteRec(sql)
    if (out == sql) None else Some(out)
  }

  /** Innermost-first: every parenthesized block is recursively processed,
    * then the (depth-0) remainder of this block is rewritten if it carries
    * a QUALIFY of its own.
    */
  private def rewriteRec(sql: String): String = {
    val n = sql.length
    val sb = new StringBuilder(n + 64)
    var i = 0
    def copyQuoted(q: Char): Unit = {
      sb.append(sql.charAt(i)); i += 1
      while (i < n && sql.charAt(i) != q) {
        if (sql.charAt(i) == '\\' && q != '`' && i + 1 < n) {
          sb.append(sql.charAt(i)).append(sql.charAt(i + 1)); i += 2
        } else { sb.append(sql.charAt(i)); i += 1 }
      }
      if (i < n) { sb.append(sql.charAt(i)); i += 1 }
    }
    while (i < n) {
      sql.charAt(i) match {
        case '\'' => copyQuoted('\'')
        case '"' => copyQuoted('"')
        case '`' => copyQuoted('`')
        case '-' if i + 1 < n && sql.charAt(i + 1) == '-' =>
          while (i < n && sql.charAt(i) != '\n') { sb.append(sql.charAt(i)); i += 1 }
        case '/' if i + 1 < n && sql.charAt(i + 1) == '*' =>
          val end = skipWsComments(sql, i) // lands just past the comment
          sb.append(sql.substring(i, end)); i = end
        case '(' =>
          val close = matchingParen(sql, i)
          if (close < 0) { sb.append(sql.substring(i)); i = n } // unbalanced: verbatim
          else {
            sb.append('(').append(rewriteRec(sql.substring(i + 1, close))).append(')')
            i = close + 1
          }
        case c => sb.append(c); i += 1
      }
    }
    val flat = sb.toString
    rewriteTop(flat).getOrElse(flat)
  }

  /** One block's own (depth-0) QUALIFY, or None when absent / refused. */
  private def rewriteTop(sql: String): Option[String] = {
    val q = topLevelIndexOf(sql, "QUALIFY", 0)
    if (q < 0) return None
    // no window token anywhere in the block → `qualify` is an identifier
    // here, not the clause (a real clause always has one — in the
    // predicate or behind a select-list alias): pass through verbatim
    if (topLevelIndexOf(sql, "OVER", 0, anyDepth = true) < 0) return None
    val at = skipWsComments(sql, 0)
    val isSelect = sql.regionMatches(true, at, "SELECT", 0, 6) ||
      sql.regionMatches(true, at, "WITH", 0, 4)
    // a set operation beside the clause would need per-branch handling —
    // but the keyword only COUNTS as a set op when a query head follows
    // (else it's a column named union/minus/except). EXCEPT additionally
    // doubles as the select-list star modifier (`* EXCEPT (col, …)`):
    // that form's paren wraps a column list, a set-op EXCEPT's paren
    // wraps a query — the first token inside disambiguates
    def isSetOp(kw: String): Boolean = {
      var atKw = topLevelIndexOf(sql, kw, 0)
      while (atKw >= 0) {
        var j = skipWsComments(sql, atKw + kw.length)
        Seq("ALL", "DISTINCT").foreach { quant =>
          if (sql.regionMatches(true, j, quant, 0, quant.length) &&
              (j + quant.length >= sql.length ||
                !isWordChar(sql.charAt(j + quant.length))))
            j = skipWsComments(sql, j + quant.length)
        }
        def queryHeadAt(k: Int): Boolean =
          k < sql.length && (sql.charAt(k) == '(' ||
            Seq("SELECT", "WITH", "VALUES", "TABLE").exists(h =>
              sql.regionMatches(true, k, h, 0, h.length) &&
                (k + h.length >= sql.length || !isWordChar(sql.charAt(k + h.length)))))
        if (j < sql.length && sql.charAt(j) == '(') {
          if (kw != "EXCEPT" || queryHeadAt(skipWsComments(sql, j + 1)))
            return true
        } else if (queryHeadAt(j)) return true
        atKw = topLevelIndexOf(sql, kw, atKw + kw.length)
      }
      false
    }
    val hasSetOp = Seq("UNION", "INTERSECT", "EXCEPT", "MINUS").exists(isSetOp)
    if (!isSelect || hasSetOp) return None

    val head = sql.substring(0, q)
    val rest = sql.substring(q + "QUALIFY".length)
    val cut = Seq(topLevelIndexOf(rest, "ORDER", 0),
        topLevelIndexOf(rest, "LIMIT", 0))
      .filter(_ >= 0).sorted.headOption.getOrElse(rest.length)
    val pred = rest.substring(0, cut).trim
    val tail = rest.substring(cut)
    val from = topLevelIndexOf(head, "FROM", 0)
    if (from < 0 || pred.isEmpty) return None
    val inner =
      s"${head.substring(0, from)}, ($pred) AS __qualify ${head.substring(from)}"
    Some(s"SELECT * EXCEPT (__qualify) FROM ( $inner ) __qualify_src " +
      s"WHERE __qualify $tail")
  }
}
