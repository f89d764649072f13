package graft.plans

import graft.SparkSpec
import graft.lake.MergeTable
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The persisted/incremental MV lifecycle (q32's spec-level depth):
  * signed-delta refresh across every mutation shape (update, group death,
  * sum-to-NULL, new group), O(1) graft-base freshness (no directory
  * walks), the rollup type-drift decline, absent-base staleness, and
  * commit-log catalog recovery.
  */
class MvIncrementalSpec extends SparkSpec {
  import spark.implicits._

  private def leaves(df: DataFrame): Set[String] =
    MvCatalog.rootPathsOf(df.queryExecution.optimizedPlan)

  test("incremental refresh equals the full recompute across update, group death, sum-to-NULL, new group") {
    val root = scratch("mv_incr")
    val base = new MergeTable(s"$root/base")
    base.overwrite(Seq(
      (1L, "a", Option(1.0)), (2L, "a", Option(2.0)),   // survives, id 1 updates
      (3L, "b", Option(3.0)), (4L, "b", Option(4.0)),   // fully deleted → group dies
      (5L, "c", Option(5.0)), (6L, "c", Option.empty[Double]) // id 5 → NULL: sum(c) must go NULL
    ).toDF("id", "g", "x"))
    MvRewrite.buildAndRegister(spark, "mv_incr", s"$root/base",
      Seq("g"), Seq(MvAgg("sum", Some("x"), "sx"), MvAgg("count", None, "c")),
      s"$root/mv")
    try {
      val mut = Seq(
        (3L, "del", Option.empty[String], Option.empty[Double]),
        (4L, "del", Option.empty[String], Option.empty[Double]),
        (1L, "upd_add", Option.empty[String], Option.empty[Double]),
        (5L, "upd_null", Option.empty[String], Option.empty[Double]),
        (7L, "ins", Option("d"), Option(7.0))             // brand-new group
      ).toDF("id", "kind", "g", "x")
      base.mergeClauses(spark, mut, Seq("id"),
        Seq(MergeTable.MatchedDelete(Some("s.kind = 'del'")),
            MergeTable.MatchedUpdate(Some("s.kind = 'upd_add'"),
              Seq("x" -> "t.x + CAST(10 AS DOUBLE)")),
            MergeTable.MatchedUpdate(Some("s.kind = 'upd_null'"),
              Seq("x" -> "CAST(NULL AS DOUBLE)")),
            MergeTable.NotMatchedInsert(Some("s.kind = 'ins'"),
              Seq("id" -> "s.id", "g" -> "s.g", "x" -> "s.x"))),
        checkUniqueSource = false, changeFeed = true)
      MvRewrite.refresh(spark, "mv_incr")
      assert(MvRewrite.lastRefreshMode == "incremental",
        s"expected the CDF fold, ran '${MvRewrite.lastRefreshMode}'")
      val mv = MergeTable.open(s"$root/mv").read(spark)
        .select("g", "sx", "c").collect()
        .map(r => (r.getString(0), Option(r.get(1)), r.getLong(2))).toSet
      val full = base.read(spark).groupBy("g")
        .agg(sum("x").as("sx"), count(lit(1)).as("c")).collect()
        .map(r => (r.getString(0), Option(r.get(1)), r.getLong(2))).toSet
      assert(mv == full, s"incremental $mv != recompute $full")
      assert(!mv.exists(_._1 == "b"), "a fully-deleted group must leave the MV")
      assert(mv.exists(t => t._1 == "c" && t._2.isEmpty && t._3 == 2L),
        "an all-NULL group's sum must return to NULL while its count survives")
      assert(mv.exists(t => t._1 == "d" && t._2.contains(7.0) && t._3 == 1L),
        "a new group must appear")
      // and the rewrite serves the refreshed MV
      val q = base.read(spark).groupBy("g")
        .agg(sum("x").as("sx"), count(lit(1)).as("c"))
      val mvRoots = MvCatalog.rootPathsOf(
        MergeTable.open(s"$root/mv").read(spark).queryExecution.analyzed)
      assert(leaves(q) == mvRoots, "the rewrite must resume after refresh")
      assert(q.collect().map(r => (r.getString(0), Option(r.get(1)), r.getLong(2)))
        .toSet == full)
    } finally MvCatalog.clear()
  }

  test("min/max stay incremental under retraction via the value census") {
    val root = scratch("mv_minmax")
    val base = new MergeTable(s"$root/base")
    base.overwrite(Seq(
      (1L, "a", Option(5.0)), (2L, "a", Option(9.0)), (10L, "a", Option(5.0)),
      (3L, "b", Option(4.0)), (11L, "b", Option.empty[Double]))
      .toDF("id", "g", "x"))
    MvRewrite.buildAndRegister(spark, "mv_minmax", s"$root/base",
      Seq("g"), Seq(MvAgg("min", Some("x"), "mn"), MvAgg("max", Some("x"), "mx"),
        MvAgg("count", None, "c")), s"$root/mv")
    try {
      def state() = MergeTable.open(s"$root/mv").read(spark)
        .select("g", "mn", "mx", "c").collect()
        .map(r => (r.getString(0), Option(r.get(1)), Option(r.get(2)), r.getLong(3)))
        .toSet
      def check(): Unit = {
        val full = base.read(spark).groupBy("g")
          .agg(min("x").as("mn"), max("x").as("mx"), count(lit(1)).as("c"))
          .collect()
          .map(r => (r.getString(0), Option(r.get(1)), Option(r.get(2)), r.getLong(3)))
          .toSet
        assert(state() == full, s"MV ${state()} != recompute $full")
      }
      def refreshIncr(): Unit = {
        MvRewrite.refresh(spark, "mv_minmax")
        assert(MvRewrite.lastRefreshMode == "incremental",
          s"min/max window must fold via the census, ran '${MvRewrite.lastRefreshMode}'")
        check()
      }
      // append-only commit: new extremes + a new group
      base.merge(spark, Seq((4L, "a", 1.0), (5L, "b", 11.0), (6L, "cc", 7.0))
        .toDF("id", "g", "x"), Seq("id"), changeFeed = true)
      refreshIncr()
      // RETRACTION mix in one commit, every census edge at once:
      //  - id 4 deleted: a's min (1.0) leaves → min re-derives to 5.0;
      //  - id 10 deleted: ONE of a's duplicate 5.0 rows — the census count
      //    drops 2→1 and min must STAY 5.0 (a set, not a census, would
      //    wrongly drop it);
      //  - id 5 deleted and id 3's x → NULL: b's non-null values all gone
      //    → min/max NULL while the group (2 rows) survives;
      //  - id 6 deleted: group cc dies entirely.
      base.mergeClauses(spark,
        Seq((4L, "del"), (10L, "del"), (5L, "del"), (6L, "del"), (3L, "nul"))
          .toDF("id", "kind"),
        Seq("id"),
        Seq(MergeTable.MatchedDelete(Some("s.kind = 'del'")),
            MergeTable.MatchedUpdate(Some("s.kind = 'nul'"),
              Seq("x" -> "CAST(NULL AS DOUBLE)"))),
        checkUniqueSource = false, changeFeed = true)
      refreshIncr()
      val s1 = state()
      assert(s1.exists(t => t._1 == "a" && t._2.contains(5.0)),
        "a's min must re-derive to the surviving duplicate value")
      assert(s1.exists(t => t._1 == "b" && t._2.isEmpty && t._3.isEmpty && t._4 == 2L),
        "an all-NULL group's extrema must go NULL while its count survives")
      assert(!s1.exists(_._1 == "cc"), "a fully-deleted group must leave the MV")
      // values RETURN after emptying: b gets a non-null row again, and a
      // loses its max — both re-derive from the census
      base.mergeClauses(spark,
        Seq((12L, "ins"), (2L, "del")).toDF("id", "kind"), Seq("id"),
        Seq(MergeTable.MatchedDelete(Some("s.kind = 'del'")),
            MergeTable.NotMatchedInsert(Some("s.kind = 'ins'"),
              Seq("id" -> "s.id", "g" -> "'b'", "x" -> "CAST(2 AS DOUBLE)"))),
        checkUniqueSource = false, changeFeed = true)
      refreshIncr()
      assert(state().exists(t => t._1 == "a" && t._3.contains(5.0)),
        "a's max must shrink to the surviving value")
      // the rewrite serves the maintained MV
      val q = base.read(spark).groupBy("g")
        .agg(min("x").as("mn"), max("x").as("mx"), count(lit(1)).as("c"))
      val mvRoots = MvCatalog.rootPathsOf(
        MergeTable.open(s"$root/mv").read(spark).queryExecution.analyzed)
      assert(leaves(q) == mvRoots, "the rewrite must resume after refresh")
    } finally MvCatalog.clear()
  }

  test("a crash-interrupted refresh retries without double-folding (markers anchor the windows)") {
    import java.nio.file._
    import scala.jdk.CollectionConverters._
    def copyDir(from: String, to: String): Unit =
      Files.walk(Paths.get(from)).iterator().asScala.foreach { p =>
        val t = Paths.get(to).resolve(Paths.get(from).relativize(p))
        if (Files.isDirectory(p)) Files.createDirectories(t)
        else { Files.createDirectories(t.getParent); Files.copy(p, t) }
      }
    def deleteDir(dir: String): Unit =
      Files.walk(Paths.get(dir)).iterator().asScala.toSeq.reverse
        .foreach(Files.deleteIfExists(_))
    val root = scratch("mv_crashfold")
    val base = new MergeTable(s"$root/base")
    base.overwrite(Seq((1L, "a", Option(5.0)), (2L, "a", Option(9.0)),
      (3L, "b", Option(4.0))).toDF("id", "g", "x"))
    MvRewrite.buildAndRegister(spark, "mv_crashfold", s"$root/base", Seq("g"),
      Seq(MvAgg("min", Some("x"), "mn"), MvAgg("max", Some("x"), "mx"),
          MvAgg("sum", Some("x"), "sx"), MvAgg("count", None, "c")),
      s"$root/mv")
    try {
      val d0 = MvCatalog.get("mv_crashfold").get
      copyDir(s"$root/mv", s"$root/mv_snap") // the pre-refresh MV bytes
      // window 1: a retraction + an insert the census must track
      base.mergeClauses(spark, Seq((2L, "del"), (4L, "ins")).toDF("id", "kind"),
        Seq("id"),
        Seq(MergeTable.MatchedDelete(Some("s.kind = 'del'")),
            MergeTable.NotMatchedInsert(Some("s.kind = 'ins'"),
              Seq("id" -> "s.id", "g" -> "'a'", "x" -> "CAST(7 AS DOUBLE)"))),
        checkUniqueSource = false, changeFeed = true)
      MvRewrite.refresh(spark, "mv_crashfold")
      assert(MvRewrite.lastRefreshMode == "incremental")
      // CRASH between the census commit and the MV commit, simulated by
      // construction: roll the MV table back to its pre-refresh bytes and
      // restore the old fingerprint — the census (and its marker) stay
      // POST-fold. A retry that re-anchored the census fold on the
      // fingerprint instead of the census's own marker would apply window
      // 1 to it a second time (id 4's +1 lands twice), and the later
      // delete of id 4 would leave a phantom census row keeping min(a) at
      // a value absent from the base.
      deleteDir(s"$root/mv"); copyDir(s"$root/mv_snap", s"$root/mv")
      MvCatalog.register(spark, d0)
      // window 2, then the RETRY refresh spanning both windows
      base.delete(spark, col("id") === 4L, changeFeed = true)
      MvRewrite.refresh(spark, "mv_crashfold")
      assert(MvRewrite.lastRefreshMode == "incremental",
        s"the retry must stay incremental, ran '${MvRewrite.lastRefreshMode}'")
      val mv = MergeTable.open(s"$root/mv").read(spark)
        .select("g", "mn", "mx", "sx", "c").collect()
        .map(r => (r.getString(0), Option(r.get(1)), Option(r.get(2)),
          Option(r.get(3)), r.getLong(4))).toSet
      val full = base.read(spark).groupBy("g")
        .agg(min("x").as("mn"), max("x").as("mx"), sum("x").as("sx"),
          count(lit(1)).as("c")).collect()
        .map(r => (r.getString(0), Option(r.get(1)), Option(r.get(2)),
          Option(r.get(3)), r.getLong(4))).toSet
      assert(mv == full, s"crash-retried refresh diverged: $mv != $full")
      assert(mv.exists(t => t._1 == "a" && t._2.contains(5.0)),
        "a double-folded census would pin min(a) to the deleted 7.0")
    } finally MvCatalog.clear()
  }

  test("graft-base freshness is one version read — never a directory walk") {
    val root = scratch("mv_o1")
    val base = new MergeTable(s"$root/base")
    base.overwrite(Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("id", "g", "x"))
    MvRewrite.buildAndRegister(spark, "mv_o1", s"$root/base",
      Seq("g"), Seq(MvAgg("sum", Some("x"), "sx")), s"$root/mv")
    try {
      MvCatalog.lastFingerprintWalked = false
      val q = base.read(spark).groupBy("g").agg(sum("x").as("sx"))
      val mvRoots = MvCatalog.rootPathsOf(
        MergeTable.open(s"$root/mv").read(spark).queryExecution.analyzed)
      assert(leaves(q) == mvRoots, "rewrite must fire on the graft base")
      assert(!MvCatalog.lastFingerprintWalked,
        "a graft-base freshness consult must not list the directory")
    } finally MvCatalog.clear()
  }

  test("decimal-sum rollup declines: re-aggregation would widen the output type") {
    val root = scratch("mv_dec")
    val basePath = s"$root/base"
    (1 to 100).map(i => (i.toLong, s"g${i % 4}", s"h${i % 2}", i))
      .toDF("id", "ga", "gb", "xi")
      .withColumn("x", col("xi").cast("decimal(10,2)")).drop("xi")
      .write.parquet(basePath)
    MvRewrite.buildAndRegister(spark, "mv_dec", basePath, Seq("ga", "gb"),
      Seq(MvAgg("sum", Some("x"), "sum_x")), s"$root/mv")
    try {
      val mvRoots = MvCatalog.rootPathsOf(
        spark.read.parquet(s"$root/mv").queryExecution.analyzed)
      val baseRoots = MvCatalog.rootPathsOf(
        spark.read.parquet(basePath).queryExecution.analyzed)
      // exact grain: the stored column IS the original type → fires
      val exact = spark.read.parquet(basePath).groupBy("ga", "gb")
        .agg(sum("x").as("sx"))
      assert(leaves(exact) == mvRoots, "exact decimal grain must still rewrite")
      // rollup: Sum over the decimal(20,2) MV column yields decimal(30,2)
      // ≠ the original decimal(20,2) → MUST decline, keeping the schema
      val rollup = spark.read.parquet(basePath).groupBy("ga")
        .agg(sum("x").as("sx"))
      assert(leaves(rollup) == baseRoots,
        "decimal-sum rollup must decline (type drift)")
      val got = rollup.collect().map(r => (r.getString(0), r.getDecimal(1))).toSet
      MvCatalog.clear()
      val bare = spark.read.parquet(basePath).groupBy("ga")
        .agg(sum("x").as("sx"))
      assert(rollup.schema == bare.schema)
      assert(bare.collect().map(r => (r.getString(0), r.getDecimal(1))).toSet == got)
    } finally MvCatalog.clear()
  }

  test("absent or unlistable bases are never fresh") {
    assert(MvCatalog.fingerprint("target/graft-tmp/does/not/exist") == "absent")
    val d = MvDef("mv_absent", "target/graft-tmp/does/not/exist", Set.empty,
      Seq("g"), Seq(MvAgg("count", None, "c")), "nowhere", "absent")
    assert(!MvCatalog.isFresh(d),
      "absent==absent must NOT read as fresh (the r12 advice hazard)")
  }

  test("definitions survive a fresh catalog via attach (commit-log recovery)") {
    val root = scratch("mv_attach")
    val base = new MergeTable(s"$root/base")
    base.overwrite(Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("id", "g", "x"))
    MvCatalog.attach(spark, s"$root/catalog")
    try {
      MvRewrite.buildAndRegister(spark, "mv_attach", s"$root/base",
        Seq("g"), Seq(MvAgg("sum", Some("x"), "sx"), MvAgg("count", None, "c")),
        s"$root/mv")
      MvCatalog.clear()
      assert(MvCatalog.get("mv_attach").isEmpty)
      MvCatalog.attach(spark, s"$root/catalog")
      val d = MvCatalog.get("mv_attach").getOrElse(fail("definition lost"))
      assert(d.groupCols == Seq("g") && d.aggs ==
        Seq(MvAgg("sum", Some("x"), "sx"), MvAgg("count", None, "c")))
      val q = base.read(spark).groupBy("g")
        .agg(sum("x").as("sx"), count(lit(1)).as("c"))
      val mvRoots = MvCatalog.rootPathsOf(
        MergeTable.open(s"$root/mv").read(spark).queryExecution.analyzed)
      assert(leaves(q) == mvRoots, "a reloaded definition must still rewrite")
      // unregister removes the persisted row too
      MvCatalog.unregister("mv_attach")
      MvCatalog.clear()
      MvCatalog.attach(spark, s"$root/catalog")
      assert(MvCatalog.get("mv_attach").isEmpty, "unregister must delete the row")
    } finally { MvCatalog.clear(); MvCatalog.detach() }
  }
}
