package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** t33's BPE building blocks on a hand-computed corpus: the pair census,
  * the argmax total order, and the ·-separated merge application (whole
  * tokens only, left-to-right non-overlapping).
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def stateOf(word: String): String =
    "·" + word.map(c => c + "·").mkString

  private val apply3 =
    "replace(replace(replace(st, '·a·n·', '·an·'), '·a·n·', '·an·'), '·a·n·', '·an·')"

  test("merge application respects token boundaries and is left-greedy") {
    val df = Seq(
      stateOf("banana"), // merging (a,n) → b,an,an,a
      stateOf("nan"),    // pairs n·a, a·n — merge (a,n): n,an
      stateOf("ab")      // no a·n — untouched
    ).toDF("st")
    val merged = df.withColumn("st", expr(apply3))
      .withColumn("toks", split(expr("trim(BOTH '·' FROM st)"), "·"))
      .select("toks").as[Seq[String]].collect().toSeq
    assert(merged(0) === Seq("b", "an", "an", "a"))
    assert(merged(1) === Seq("n", "an"))
    assert(merged(2) === Seq("a", "b"))
    // a merged token is ATOMIC: merging (n,a) afterwards must not split "an"
    val round2 = df.withColumn("st", expr(apply3))
      .withColumn("st", expr("replace(st, '·n·a·', '·na·')"))
      .withColumn("toks", split(expr("trim(BOTH '·' FROM st)"), "·"))
      .select("toks").as[Seq[String]].collect().toSeq
    assert(round2(0) === Seq("b", "an", "an", "a"), "no n·a pair survives in banana")
    assert(round2(1) === Seq("n", "an"), "the n in 'an' must not re-pair")
  }

  test("pair census argmax is the expected merge on a tiny corpus") {
    // low, lower, lowest ×weights: 'lo' and 'ow' tie shapes avoided by
    // weighting: pairs l·o and o·w appear in every word (w 3 each); pick
    // is by (count desc, pair asc) → 'l·o' wins the tie alphabetically
    val words = Seq(("low", 1L), ("lower", 1L), ("lowest", 1L)).toDF("word", "n")
    val top = words
      .select(concat(lit("·"), regexp_replace(col("word"), "(.)", "$1·")).as("st"),
        col("n"))
      .withColumn("toks", split(expr("trim(BOTH '·' FROM st)"), "·"))
      .select(explode(expr(
        "transform(sequence(1, size(toks) - 1), " +
          "i -> concat(element_at(toks, i), '·', element_at(toks, i + 1)))")).as("pr"),
        col("n"))
      .groupBy("pr").agg(sum("n").as("cnt"))
      .orderBy(col("cnt").desc, col("pr").asc)
      .limit(1).collect().head
    assert(top.getString(0) === "l·o" && top.getLong(1) === 3L)
  }

  test("single-token words contribute no pairs (no descending-sequence trap)") {
    val df = Seq("·ab·").toDF("st") // one merged token, size(toks) == 1
      .withColumn("toks", split(expr("trim(BOTH '·' FROM st)"), "·"))
      .select(explode(expr(
        "CASE WHEN size(toks) < 2 THEN array() " +
          "ELSE transform(sequence(1, size(toks) - 1), " +
          "i -> concat(element_at(toks, i), '·', element_at(toks, i + 1))) END")).as("pr"))
    assert(df.count() === 0L)
  }
}
