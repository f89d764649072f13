package graft.sqlapi

import org.scalatest.funsuite.AnyFunSuite

/** QualifyRewrite's text surgery: clause boundaries under quoting and
  * nesting, the shapes it must refuse, and the exact rewritten form. The
  * end-to-end window semantics are gated by q29 against DuckDB's native
  * QUALIFY; these tests pin the scanner.
  */
class QualifyRewriteSpec extends AnyFunSuite {

  test("basic rewrite: predicate moves inside, filter outside, tail kept") {
    val got = QualifyRewrite.rewrite(
      "SELECT a, b FROM t QUALIFY row_number() OVER (ORDER BY b) <= 2 ORDER BY a").get
    assert(got ==
      "SELECT * EXCEPT (__qualify) FROM ( SELECT a, b , " +
        "(row_number() OVER (ORDER BY b) <= 2) AS __qualify FROM t  ) " +
        "__qualify_src WHERE __qualify ORDER BY a")
  }

  test("no QUALIFY (or no window) -> untouched (identifiers and literals)") {
    assert(QualifyRewrite.rewrite("SELECT a FROM t WHERE b = 1").isEmpty)
    assert(QualifyRewrite.rewrite("SELECT 'QUALIFY' AS s FROM t").isEmpty)
    assert(QualifyRewrite.rewrite("SELECT `QUALIFY` FROM t").isEmpty)
    // Spark does not reserve `qualify`: without an OVER token the word is
    // an identifier and the statement must keep parsing untouched
    assert(QualifyRewrite.rewrite("SELECT a AS qualify FROM t").isEmpty)
    assert(QualifyRewrite.rewrite(
      "SELECT * FROM t qualify WHERE qualify.x > 0").isEmpty)
    assert(QualifyRewrite.rewrite(
      "SELECT a, (SELECT x FROM u QUALIFY x = 1) FROM t").isEmpty)
  }

  test("shapes the rewrite must refuse: set ops and non-SELECT statements") {
    val over = "row_number() OVER (ORDER BY a) = 1"
    assert(QualifyRewrite.rewrite(
      s"SELECT a FROM t QUALIFY $over UNION ALL SELECT a FROM u").isEmpty)
    assert(QualifyRewrite.rewrite(
      s"INSERT INTO x SELECT a FROM t QUALIFY $over").isEmpty)
    // set-op EXCEPT refuses even in its parenthesized-query form …
    assert(QualifyRewrite.rewrite(
      s"SELECT a FROM t QUALIFY $over EXCEPT (SELECT a FROM u)").isEmpty)
    assert(QualifyRewrite.rewrite(
      s"SELECT a FROM t QUALIFY $over MINUS SELECT a FROM u").isEmpty)
  }

  test("set-op keywords as column names stay identifiers") {
    // a column named `minus`/`union` is not a set operation: the keyword
    // is only believed when a query head follows
    val got = QualifyRewrite.rewrite(
      "SELECT minus, union FROM t QUALIFY row_number() OVER (ORDER BY minus) = 1")
    assert(got.isDefined, "columns named after set ops must not refuse the rewrite")
  }

  test("QUALIFY inside CTE bodies, derived tables, and INSERT subqueries") {
    // CTE body: the block rewrites in place, the outer statement is intact
    val cte = QualifyRewrite.rewrite(
      "WITH top AS (SELECT a, b FROM t " +
        "QUALIFY row_number() OVER (PARTITION BY a ORDER BY b) = 1) " +
        "SELECT count(*) AS n FROM top").get
    assert(cte.startsWith("WITH top AS (SELECT * EXCEPT (__qualify) FROM ("))
    assert(cte.endsWith("SELECT count(*) AS n FROM top"))
    // derived table
    val dt = QualifyRewrite.rewrite(
      "SELECT d.a FROM (SELECT a FROM t " +
        "QUALIFY rank() OVER (ORDER BY a) <= 3) d").get
    assert(dt.startsWith("SELECT d.a FROM (SELECT * EXCEPT (__qualify) FROM ("))
    // INSERT's source subquery rewrites even though the statement head
    // is not SELECT (the refusal is per BLOCK)
    val ins = QualifyRewrite.rewrite(
      "INSERT INTO x SELECT * FROM (SELECT a FROM t " +
        "QUALIFY row_number() OVER (ORDER BY a) = 1) s").get
    assert(ins.startsWith("INSERT INTO x SELECT * FROM (SELECT * EXCEPT"))
    // nested: inner block AND the outer statement each carry a QUALIFY
    val both = QualifyRewrite.rewrite(
      "SELECT a FROM (SELECT a, b FROM t " +
        "QUALIFY row_number() OVER (PARTITION BY a ORDER BY b) = 1) d " +
        "QUALIFY rank() OVER (ORDER BY a) <= 2").get
    assert(both.startsWith("SELECT * EXCEPT (__qualify) FROM ( SELECT a"))
    assert(both.contains("FROM (SELECT * EXCEPT (__qualify) FROM ("))
  }

  test("leading comments do not hide the SELECT head") {
    val got = QualifyRewrite.rewrite(
      "-- top-2 per group\nSELECT a FROM t QUALIFY row_number() OVER (ORDER BY a) <= 2")
    assert(got.isDefined, "a leading comment must not defeat the SELECT check")
  }

  test("star-EXCEPT is a select-list modifier, not a set op") {
    val got = QualifyRewrite.rewrite(
      "SELECT * EXCEPT (pad) FROM t QUALIFY row_number() OVER (ORDER BY a) = 1")
    assert(got.isDefined,
      "* EXCEPT (cols) must not be mistaken for a set operation")
    assert(got.get.contains("(pad)"))
  }

  test("comments and escaped quotes never confuse the scanner") {
    // the word in a -- comment is not a clause (and must not mangle the text)
    assert(QualifyRewrite.rewrite("SELECT a FROM t -- qualify later\n").isEmpty)
    assert(QualifyRewrite.rewrite("SELECT a FROM t /* qualify /* nested */ x */").isEmpty)
    // a backslash-escaped quote keeps the literal closed where Spark does
    assert(QualifyRewrite.rewrite(
      "SELECT 'don\\'t qualify' AS s FROM t").isEmpty)
    // and a REAL clause after a comment still rewrites
    val got = QualifyRewrite.rewrite(
      "SELECT a FROM t /* note */ QUALIFY row_number() OVER (ORDER BY a) = 1")
    assert(got.isDefined)
  }

  test("CTE prefix: the main block's FROM is the insertion point") {
    val got = QualifyRewrite.rewrite(
      "WITH c AS (SELECT a, b FROM t) SELECT a FROM c " +
        "QUALIFY row_number() OVER (ORDER BY a) = 1").get
    assert(got.contains("WITH c AS (SELECT a, b FROM t) SELECT a , " +
      "(row_number() OVER (ORDER BY a) = 1) AS __qualify FROM c"))
    assert(got.startsWith("SELECT * EXCEPT (__qualify) FROM ("))
  }
}

/** QUALIFY composed through the FULL spark.sql path over a REGISTERED
  * lake table — the rewritten text re-enters the injected parser, so the
  * lake read rewrite (including VERSION AS OF) must still apply under it.
  */
class QualifyLakeSpec extends graft.SparkSpec {
  import spark.implicits._

  test("QUALIFY windows over aggregates, composing with GROUP BY + HAVING") {
    Seq(("g1", 1L), ("g1", 2L), ("g2", 10L), ("g2", 20L), ("g3", 100L))
      .toDF("g", "x").createOrReplaceTempView("qual_agg_v")
    val got = spark.sql(
      """SELECT g, sum(x) AS s FROM qual_agg_v
        |GROUP BY g HAVING count(*) > 1
        |QUALIFY rank() OVER (ORDER BY sum(x) DESC) = 1""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("g2", 30L)),
      "HAVING filters groups first; QUALIFY ranks the surviving aggregates")
  }

  test("QUALIFY over a registered lake table, current and time-traveled") {
    val t = new graft.lake.MergeTable(scratch("qual_lake"))
    t.overwrite(Seq((1L, "g1", 10L), (2L, "g1", 30L), (3L, "g1", 20L),
      (4L, "g2", 5L), (5L, "g2", 50L)).toDF("k", "g", "score"))
    graft.sqlapi.LakeCatalog.register("qual_tbl", t)
    try {
      t.delete(spark, org.apache.spark.sql.functions.col("k") === 2) // v1
      val top = spark.sql(
        """SELECT k, g FROM qual_tbl
          |QUALIFY row_number() OVER (PARTITION BY g ORDER BY score DESC, k) = 1
          |ORDER BY g""".stripMargin)
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      assert(top == Seq((3L, "g1"), (5L, "g2")), "tip read: k=2 is deleted")
      val old = spark.sql(
        """SELECT k, g FROM qual_tbl VERSION AS OF 0
          |QUALIFY row_number() OVER (PARTITION BY g ORDER BY score DESC, k) = 1
          |ORDER BY g""".stripMargin)
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      assert(old == Seq((2L, "g1"), (5L, "g2")),
        "versioned read must compose under the QUALIFY rewrite")
    } finally graft.sqlapi.LakeCatalog.unregister("qual_tbl")
  }
}
