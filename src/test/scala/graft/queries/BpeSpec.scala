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

  test("merge pairs holding quotes apply as literals (no SQL-text splicing)") {
    import graft.operators.BpeModel
    // a census not pre-filtered to [a-z] can learn a pair containing a
    // single quote — it must behave as a plain string, never as SQL
    val df = Seq("don't", "cant", "o'o'o").toDF("word")
      .select(BpeModel.framed(col("word")).as("st"))
    val merged = BpeModel.applyMerges(df, "st", Seq("n·'", "o·'"))
      .withColumn("toks", split(expr("trim(BOTH '·' FROM st)"), "·"))
      .select("toks").as[Seq[String]].collect().toSeq
    assert(merged(0) === Seq("d", "o", "n'", "t"))
    assert(merged(1) === Seq("c", "a", "n", "t"))
    assert(merged(2) === Seq("o'", "o'", "o"), "consecutive quoted pairs must all merge")
  }

  test("persisted BPE model: train once, idempotent retrain, reproducible apply") {
    import graft.operators.BpeModel
    val census = Seq(("banana", 3L), ("bandana", 2L), ("cabana", 1L))
      .toDF("word", "n")
    val root = scratch("bpe_model")
    val merges = BpeModel.train(census, rounds = 3)
    assert(merges.map(_.iter) === Seq(1, 2, 3))
    val t = BpeModel.persist(spark, root, merges)
    val v0 = t.currentVersion
    // retraining the SAME census yields the same rules — persisting them
    // must be a NO-OP commit (the model's history records real changes only)
    BpeModel.persist(spark, root, BpeModel.train(census, rounds = 3))
    assert(t.currentVersion === v0, "identical rules must not commit a new version")
    // a DIFFERENT census commits a new model version
    BpeModel.persist(spark, root,
      BpeModel.train(Seq(("zzxx", 10L)).toDF("word", "n"), rounds = 3))
    assert(t.currentVersion === v0 + 1)
    // load-from-disk reproduces the application exactly (old version's
    // rules via the versioned table = the old tokenizer)
    val reloaded = BpeModel.load(spark, root)
    assert(reloaded.size === 3)
    val applied = BpeModel.applyMerges(
      census.withColumn("st", expr("concat('·', regexp_replace(word, '(.)', '$1·'))")),
      "st", merges.map(_.pair))
      .select("word", "st").collect().map(r => r.getString(0) -> r.getString(1)).toMap
    // 'an' is overwhelmingly the first merge on this census; later rounds
    // fuse further — after 3 merges 'banana' is down to 2 symbols
    assert(merges.head.pair === "a·n")
    assert(applied("banana").stripPrefix("·").stripSuffix("·")
      .split('·').length === 2, s"got ${applied("banana")}")
  }
}
