package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MvRewrite soundness: the rule fires ONLY on provably answer-identical
  * shapes — every decline path here is a query whose rewrite would have
  * returned wrong results, so each must keep scanning the base.
  */
class MvRewriteSpec extends SparkSpec {
  import spark.implicits._

  private def leaves(df: DataFrame): Set[String] =
    MvCatalog.rootPathsOf(df.queryExecution.optimizedPlan)

  private def setup(name: String): (String, String, Set[String], Set[String]) = {
    val root = scratch(name)
    val basePath = s"$root/base"
    val mvPath = s"$root/mv"
    (1 to 400).map(i => (i.toLong, s"g${i % 4}", s"h${i % 2}", (i % 10).toDouble))
      .toDF("id", "ga", "gb", "x").write.parquet(basePath)
    MvRewrite.buildAndRegister(spark, name, basePath, Seq("ga", "gb"),
      Seq(MvAgg("sum", Some("x"), "sum_x"), MvAgg("count", None, "cnt"),
          MvAgg("min", Some("x"), "min_x"), MvAgg("max", Some("x"), "max_x")),
      mvPath)
    val mvRoots = MvCatalog.rootPathsOf(
      spark.read.parquet(mvPath).queryExecution.analyzed)
    val baseRoots = MvCatalog.rootPathsOf(
      spark.read.parquet(basePath).queryExecution.analyzed)
    (basePath, mvPath, mvRoots, baseRoots)
  }

  test("exact and rollup rewrite; results identical to the unrewritten query") {
    val (basePath, _, mvRoots, baseRoots) = setup("mv_exact")
    try {
      val exact = spark.read.parquet(basePath).groupBy("ga", "gb")
        .agg(sum("x").as("sx"), count(lit(1)).as("c"),
             min("x").as("mn"), max("x").as("mx"))
      assert(leaves(exact) == mvRoots, "exact grain must scan the MV")
      val rollup = spark.read.parquet(basePath).groupBy("ga")
        .agg(sum("x").as("sx"), count(lit(1)).as("c"),
             min("x").as("mn"), max("x").as("mx"))
      assert(leaves(rollup) == mvRoots, "rollup must scan the MV")
      // answers must equal a catalog-off replay of the same queries
      val got = (exact.collect().toSet, rollup.collect().toSet)
      MvCatalog.clear()
      val exact0 = spark.read.parquet(basePath).groupBy("ga", "gb")
        .agg(sum("x").as("sx"), count(lit(1)).as("c"),
             min("x").as("mn"), max("x").as("mx"))
      assert(leaves(exact0) == baseRoots)
      assert(exact0.collect().toSet == got._1)
      val rollup0 = spark.read.parquet(basePath).groupBy("ga")
        .agg(sum("x").as("sx"), count(lit(1)).as("c"),
             min("x").as("mn"), max("x").as("mx"))
      assert(rollup0.collect().toSet == got._2)
      // output schema survived the swap exactly (names, types, nullability
      // of count's non-nullable column restored via coalesce)
      assert(exact.schema == exact0.schema)
      assert(rollup.schema == rollup0.schema)
    } finally MvCatalog.clear()
  }

  test("declines: filter, avg, distinct, expression grouping, unknown agg column") {
    val (basePath, _, _, baseRoots) = setup("mv_decline")
    try {
      def base = spark.read.parquet(basePath)
      // a WHERE between scan and aggregate — the MV has no filtered answer
      assert(leaves(base.filter($"id" > 100).groupBy("ga", "gb")
        .agg(sum("x").as("sx"))) == baseRoots)
      // avg is not a registered decomposition
      assert(leaves(base.groupBy("ga", "gb").agg(avg("x").as("a"))) == baseRoots)
      // DISTINCT aggregates never match
      assert(leaves(base.groupBy("ga", "gb")
        .agg(countDistinct("x").as("cd"))) == baseRoots)
      // expression grouping key (not a bare column)
      assert(leaves(base.groupBy(upper($"ga").as("gu"))
        .agg(sum("x").as("sx"))) == baseRoots)
      // aggregate over a column the MV does not store
      assert(leaves(base.groupBy("ga", "gb").agg(sum("id").as("si"))) == baseRoots)
      // grouping FINER than the MV (superset of its keys) cannot roll up
      assert(leaves(base.groupBy("ga", "gb", "id")
        .agg(sum("x").as("sx"))) == baseRoots)
    } finally MvCatalog.clear()
  }

  test("filtered aggregates rewrite when every filter reference is a grouping column") {
    val (basePath, _, mvRoots, _) = setup("mv_filtered")
    try {
      def base = spark.read.parquet(basePath)
      def fExact = base.filter($"ga" === "g1").groupBy("ga", "gb")
        .agg(sum("x").as("sx"), count(lit(1)).as("c"))
      // the filter may speak a FINER grouping column than the query groups
      // by (gb is not in the rollup's keys) — each MV row is one (ga, gb)
      // group, so the predicate is uniform within it and transplants
      def fRoll = base.filter($"gb" === "h0" && $"ga" =!= "g2").groupBy("ga")
        .agg(sum("x").as("sx"), count(lit(1)).as("c"))
      assert(leaves(fExact) == mvRoots, "grouping-column filter must scan the MV")
      assert(leaves(fRoll) == mvRoots, "finer-grouping-column filter must roll up over the MV")
      val got = (fExact.collect().toSet, fRoll.collect().toSet)
      val schemas = (fExact.schema, fRoll.schema)
      MvCatalog.clear()
      assert(fExact.collect().toSet == got._1, "filtered exact answer drifted")
      assert(fRoll.collect().toSet == got._2, "filtered rollup answer drifted")
      assert(fExact.schema == schemas._1 && fRoll.schema == schemas._2)
    } finally MvCatalog.clear()
  }

  test("a duplicating self-union of the base declines (its rows count twice)") {
    val (basePath, _, _, baseRoots) = setup("mv_selfunion")
    try {
      def base = spark.read.parquet(basePath)
      def u = base.union(base).groupBy("ga", "gb").agg(sum("x").as("sx"),
        count(lit(1)).as("c"))
      // the SET-union of the children's paths equals the registered set —
      // only pairwise disjointness tells this apart from a legitimate
      // multi-data-dir snapshot union
      assert(leaves(u) == baseRoots, "self-union must keep scanning the base")
      val got = u.collect().toSet
      MvCatalog.clear()
      assert(u.collect().toSet == got, "self-union answer drifted")
    } finally MvCatalog.clear()
  }

  test("staleness declines, refresh resumes, results track the mutated base") {
    val (basePath, _, mvRoots, baseRoots) = setup("mv_stale")
    try {
      def q = spark.read.parquet(basePath).groupBy("ga", "gb")
        .agg(sum("x").as("sx"), count(lit(1)).as("c"))
      assert(leaves(q) == mvRoots)
      val before = q.collect().toSet
      Seq((9001L, "g0", "h0", 5.0)).toDF("id", "ga", "gb", "x")
        .write.mode("append").parquet(basePath)
      assert(leaves(q) == baseRoots, "a mutated base must disable the rewrite")
      val stale = q.collect().toSet
      assert(stale != before, "the appended row must be visible")
      MvRewrite.refresh(spark, "mv_stale")
      assert(leaves(q) == mvRoots, "refresh must re-enable the rewrite")
      assert(q.collect().toSet == stale,
        "the refreshed MV must serve the post-mutation answer")
    } finally MvCatalog.clear()
  }
}
