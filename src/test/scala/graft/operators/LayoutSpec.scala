package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Physical-layout operators: the bucketed co-located join really is
  * shuffle-free on both join sides, and the salted join is result-identical
  * to the plain join on a deliberately skewed dataset.
  */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed join plans with NO exchange on either join side") {
    val a = (1 to 1000).map(i => (i.toLong, s"a$i")).toDF("k", "va")
    val b = (1 to 3000).map(i => ((i % 500).toLong, s"b$i")).toDF("k", "vb")
    a.write.mode("overwrite").bucketBy(4, "k").sortBy("k").saveAsTable("bkt_a")
    b.write.mode("overwrite").bucketBy(4, "k").sortBy("k").saveAsTable("bkt_b")
    // force the sort-merge path so bucketing (not broadcast) is exercised
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("bkt_a").join(spark.table("bkt_b"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ, got:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle either side:\n$plan")
      assert(joined.count() === 2994) // keys 1..499 × 6 copies each in b
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("salted join result is identical to the plain join under skew") {
    // 90% of big rows share key 7 — the classic hot key.
    val big = (1 to 5000).map(i => (if (i % 10 == 0) i.toLong % 50 else 7L, i)).toDF("k", "payload")
    val small = (0L to 49L).map(k => (k, s"dim$k")).toDF("k", "attr")
    val salted = SkewJoin.saltedJoin(big, small, "k", salts = 8)
      .groupBy("k").agg(count(lit(1)).as("n"), sum("payload").as("s"))
    val plain = big.join(small, Seq("k"))
      .groupBy("k").agg(count(lit(1)).as("n"), sum("payload").as("s"))
    assert(salted.collect().toSet === plain.collect().toSet)
  }
}
