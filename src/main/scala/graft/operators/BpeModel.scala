package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.lake.MergeTable

/** BPE merge rules as a PERSISTED, VERSIONED model (the t33/t34 pair's
  * production shape): train once, write the rules to a MergeTable, apply
  * many times by reading them back — tokenizer reproducibility across
  * runs, jobs, and time travel (an old snapshot of the model table IS the
  * old tokenizer). Retraining identical rules is a NO-OP (no new version),
  * so a scheduled refresh that learns nothing new leaves the model's
  * history clean.
  *
  * Scale discipline (unchanged from the inline t33/t34): every learning
  * round shuffles the DISTINCT-WORD census, never documents; the argmax is
  * a `limit(1)` collect (one scalar row); merge application replays on the
  * census too.
  */
object BpeModel {

  private val modelSchema = StructType(Seq(
    StructField("iter", IntegerType, nullable = false),
    StructField("pair", StringType, nullable = false),   // with '·' separator
    StructField("cnt", LongType, nullable = false)))

  /** One learned merge: (round, pair-with-separator, pair count). */
  final case class Merge(iter: Int, pair: String, cnt: Long)

  /** The '·'-framed symbol string of a word (every char its own symbol). */
  private[graft] def framed(wordCol: org.apache.spark.sql.Column) =
    concat(lit("·"), regexp_replace(wordCol, "(.)", "$1·"))

  /** Apply one merge to a framed symbol column. THREE replace passes = the
    * fixpoint for ≤ 12-char words (brute-force-verified): a single pass's
    * continue-after-match skips consecutive occurrences ('banana' would
    * keep an a·n).
    */
  private def applyOne(df: DataFrame, c: String, pair: String): DataFrame = {
    // Column API, not an expr() string: a pair holding a quote (possible
    // for callers whose census is not pre-filtered to [a-z]) must be a
    // literal, never SQL text
    val pat = lit("·" + pair + "·")
    val rep = lit("·" + pair.replace("·", "") + "·")
    val once = (x: org.apache.spark.sql.Column) => replace(x, pat, rep)
    df.withColumn(c, once(once(once(col(c)))))
  }

  /** Apply an ordered rule list to a framed symbol column `c`. */
  def applyMerges(df: DataFrame, c: String, pairs: Seq[String]): DataFrame =
    pairs.foldLeft(df)((d, p) => applyOne(d, c, p))

  /** Learn `rounds` merges from a `(word, n)` census: per round, the
    * highest-count adjacent symbol pair (ties → lexicographically first)
    * merges everywhere, exactly the classic BPE loop.
    */
  def train(census: DataFrame, rounds: Int): Seq[Merge] = {
    var state = census.select(framed(col("word")).as("st"), col("n"))
    (1 to rounds).map { i =>
      val top = state
        .withColumn("toks", split(expr("trim(BOTH '·' FROM st)"), "·"))
        .select(explode(expr(
          "CASE WHEN size(toks) < 2 THEN array() " +
            "ELSE transform(sequence(1, size(toks) - 1), " +
            "i -> concat(element_at(toks, i), '·', element_at(toks, i + 1))) END"))
          .as("pr"), col("n"))
        .groupBy("pr").agg(sum("n").as("cnt"))
        .orderBy(col("cnt").desc, col("pr").asc)
        .limit(1).collect().head
      val pair = top.getString(0)
      state = applyOne(state, "st", pair)
      Merge(i, pair, top.getLong(1))
    }
  }

  /** Persist rules at `root`. IDEMPOTENT: when the stored rules already
    * equal `merges`, no commit happens — the model's version history
    * records real rule changes only.
    */
  def persist(spark: SparkSession, root: String, merges: Seq[Merge]): MergeTable = {
    val t = new MergeTable(root)
    if (t.exists && loadMerges(spark, t) == merges) return t
    t.overwrite(spark.createDataFrame(
      java.util.Arrays.asList(merges.map(m => Row(m.iter, m.pair, m.cnt)): _*),
      modelSchema))
    t
  }

  private def loadMerges(spark: SparkSession, t: MergeTable): Seq[Merge] =
    t.read(spark).orderBy("iter").collect()
      .map(r => Merge(r.getInt(0), r.getString(1), r.getLong(2))).toSeq

  /** Rules back from disk, in application order. */
  def load(spark: SparkSession, root: String): Seq[Merge] =
    loadMerges(spark, new MergeTable(root))

  /** The model at `root` if present, else train-and-persist from the
    * census. `rounds` mismatch (a config change) retrains.
    */
  def ensure(spark: SparkSession, root: String, census: => DataFrame,
             rounds: Int): Seq[Merge] = {
    val t = new MergeTable(root)
    if (t.exists) {
      val stored = loadMerges(spark, t)
      if (stored.size == rounds) return stored
    }
    val merges = train(census, rounds)
    persist(spark, root, merges)
    merges
  }
}
