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

  test("no top-level QUALIFY -> untouched (subqueries and literals)") {
    assert(QualifyRewrite.rewrite("SELECT a FROM t WHERE b = 1").isEmpty)
    assert(QualifyRewrite.rewrite(
      "SELECT a, (SELECT x FROM u QUALIFY x = 1) FROM t").isEmpty)
    assert(QualifyRewrite.rewrite("SELECT 'QUALIFY' AS s FROM t").isEmpty)
    assert(QualifyRewrite.rewrite("SELECT `QUALIFY` FROM t").isEmpty)
  }

  test("shapes the rewrite must refuse: set ops and non-SELECT statements") {
    assert(QualifyRewrite.rewrite(
      "SELECT a FROM t QUALIFY rn = 1 UNION ALL SELECT a FROM u").isEmpty)
    assert(QualifyRewrite.rewrite(
      "INSERT INTO x SELECT a FROM t QUALIFY rn = 1").isEmpty)
    // set-op EXCEPT refuses even in its parenthesized-query form …
    assert(QualifyRewrite.rewrite(
      "SELECT a FROM t QUALIFY rn = 1 EXCEPT (SELECT a FROM u)").isEmpty)
    assert(QualifyRewrite.rewrite(
      "SELECT a FROM t QUALIFY rn = 1 MINUS SELECT a FROM u").isEmpty)
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
      "WITH c AS (SELECT a, b FROM t) SELECT a FROM c QUALIFY a = 1").get
    assert(got.contains("WITH c AS (SELECT a, b FROM t) SELECT a , (a = 1) AS __qualify FROM c"))
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
