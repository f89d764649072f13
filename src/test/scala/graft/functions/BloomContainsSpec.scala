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

  test("Column factory: filter rides the plan as a reference object, no SQL text") {
    val members = (1 to 500).map(i => s"m_$i")
    val df = members.toDF("s").repartition(4)
    val bf = df.stat.bloomFilter("s", 500, 0.01)
    // no encode, no parse: the BloomFilter object is handed to the
    // expression directly — identical semantics to the SQL form
    val misses = df.withColumn("m", BloomContains.mightContain(col("s"), bf))
      .filter(!col("m")).count()
    assert(misses === 0L, "Column-factory path lost the no-false-negative contract")
    val fps = (1 to 500).map(i => s"x_$i").toDF("s")
      .withColumn("m", BloomContains.mightContain(col("s"), bf))
      .filter(col("m")).count()
    assert(fps <= 30, s"false-positive rate implausibly high: $fps/500")
    // the optimized plan must NOT embed the sketch bytes as text — driver
    // cost for plan stringification stays O(1) in sketch size
    val plan = df.withColumn("m", BloomContains.mightContain(col("s"), bf))
      .queryExecution.optimizedPlan.toString
    assert(plan.length < 10000, s"plan text scales with sketch size: ${plan.length}")
    assert(!plan.contains(BloomContains.encode(bf).take(64)),
      "sketch base64 leaked into plan text")
  }

  test("SQL-literal builder enforces the decoded-size cap with a pointer to the factory") {
    GraftFunctions.register(spark)
    // a sketch comfortably past 4 MiB decoded: ~40M bits
    val big = org.apache.spark.util.sketch.BloomFilter.create(4000000, 0.01)
    val b64 = BloomContains.encode(big)
    val e = intercept[Exception] {
      Seq("a").toDF("s")
        .select(expr(s"bloom_might_contain(s, '$b64')")).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("BloomContains.mightContain")),
      s"cap error must direct users to the Column factory: ${e.getMessage}")
  }

  test("equal sketch contents canonicalize: plan-level sharing across instances") {
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.types.StringType
    def freshFilter(): org.apache.spark.util.sketch.BloomFilter = {
      val bf = org.apache.spark.util.sketch.BloomFilter.create(100, 0.03)
      Seq("a", "b", "c").foreach(bf.putString)
      bf
    }
    val child = BoundReference(0, StringType, nullable = true)
    val e1 = BloomContains(child, freshFilter())
    val e2 = BloomContains(child, freshFilter())
    // two DISTINCT filter objects with equal contents: the expressions
    // must compare equal (digest identity), or subexpression elimination
    // and exchange reuse silently miss across plans
    assert(e1 == e2 && e1.hashCode == e2.hashCode,
      "equal sketch contents must canonicalize")
    val other = org.apache.spark.util.sketch.BloomFilter.create(100, 0.03)
    other.putString("z")
    assert(e1 != BloomContains(child, other),
      "different sketch contents must NOT compare equal")
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
