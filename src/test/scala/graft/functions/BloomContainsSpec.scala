package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** BloomContains: the no-false-negative contract against Spark's own
  * stat-API builder (putString hashes UTF-8 bytes; the expression probes
  * UTF8String.getBytes — same key bytes), codegen evaluation, FP-rate
  * sanity, and SQL registration arity/typing errors.
  */
class BloomContainsSpec extends SparkSpec {
  import spark.implicits._

  test("no false negatives vs stat.bloomFilter; FP rate within bound; codegen path") {
    GraftFunctions.register(spark)
    val members = (1 to 2000).map(i => s"member_$i")
    val df = members.toDF("s").repartition(4)
    val bf = df.stat.bloomFilter("s", 2000, 0.01)
    val b64 = BloomContains.encode(bf)
    // EVERY member must probe TRUE — a Bloom filter has no false negatives,
    // and a byte-encoding mismatch between builder and prober would show
    // here as a definite miss
    val hits = df.withColumn("m", expr(s"bloom_might_contain(s, '$b64')"))
      .filter(!col("m")).count()
    assert(hits === 0L, "a member probed FALSE — builder/prober key bytes disagree")
    // non-members mostly probe FALSE (fpp 1%; allow generous slack)
    val nonMembers = (1 to 2000).map(i => s"other_$i").toDF("s")
    val fps = nonMembers.withColumn("m", expr(s"bloom_might_contain(s, '$b64')"))
      .filter(col("m")).count()
    assert(fps <= 100, s"false-positive rate implausibly high: $fps/2000")
    // NULL in ⇒ NULL out (UnaryExpression null-safety)
    val n = Seq[Option[String]](None).toDF("s")
      .select(expr(s"bloom_might_contain(s, '$b64')").as("m")).head
    assert(n.isNullAt(0))
  }

  test("registration rejects a non-literal sketch and a non-string column") {
    GraftFunctions.register(spark)
    val df = Seq(("a", 1)).toDF("s", "i")
    intercept[Exception] {
      df.select(expr("bloom_might_contain(s, s)")).collect()
    }
    intercept[Exception] {
      val bf = df.stat.bloomFilter("s", 10, 0.1)
      df.select(expr(
        s"bloom_might_contain(i, '${BloomContains.encode(bf)}')")).collect()
    }
  }
}
