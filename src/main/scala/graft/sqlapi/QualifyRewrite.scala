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
  * Scanning is depth-0 and quote-aware ('…', "…", `…`), so subqueries and
  * literals never confuse the clause boundaries. Statements the rewrite
  * cannot carry faithfully — set operations beside the QUALIFY, or a
  * non-SELECT statement — are left alone (Spark's own parser then reports
  * the unsupported syntax, rather than this rewrite mangling it).
  */
object QualifyRewrite {

  private def isWordChar(c: Char): Boolean = c.isLetterOrDigit || c == '_'

  /** Index of the first depth-0, quote-free, comment-free, word-bounded
    * occurrence of `kw` (case-insensitive) at or after `from`, or -1.
    * String literals honor BOTH of Spark's escape conventions (backslash
    * and doubled quotes — a lone backslash always escapes the next char,
    * which also covers `\\`); `--` line comments and nested bracketed
    * comments are skipped entirely.
    */
  private def topLevelIndexOf(sql: String, kw: String, from: Int): Int = {
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
        case _ if depth == 0 &&
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

  /** The rewritten statement, or None when there is no top-level QUALIFY
    * (or the statement's shape is one the rewrite must not touch).
    */
  def rewrite(sql: String): Option[String] = {
    val q = topLevelIndexOf(sql, "QUALIFY", 0)
    if (q < 0) return None
    val lead = sql.trim
    val isSelect = lead.regionMatches(true, 0, "SELECT", 0, 6) ||
      lead.regionMatches(true, 0, "WITH", 0, 4)
    // a set operation beside the clause would need per-branch handling.
    // EXCEPT alone doubles as the select-list star modifier
    // (`* EXCEPT (col, …)`): that form's paren wraps a COLUMN list, a
    // set-op EXCEPT is followed by a query (`SELECT`/`WITH`/`(`) — the
    // first token inside/after the paren disambiguates
    def isSetOp(kw: String): Boolean = {
      var at = topLevelIndexOf(sql, kw, 0)
      while (at >= 0) {
        var j = at + kw.length
        while (j < sql.length && sql.charAt(j).isWhitespace) j += 1
        if (kw != "EXCEPT" || j >= sql.length || sql.charAt(j) != '(')
          return true
        var k = j + 1
        while (k < sql.length && sql.charAt(k).isWhitespace) k += 1
        if (k < sql.length && (sql.charAt(k) == '(' ||
            sql.regionMatches(true, k, "SELECT", 0, 6) ||
            sql.regionMatches(true, k, "WITH", 0, 4)))
          return true // EXCEPT (SELECT …) — a set op after all
        at = topLevelIndexOf(sql, kw, at + kw.length)
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
