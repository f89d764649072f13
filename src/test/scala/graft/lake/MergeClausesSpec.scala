package graft.lake

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[MergeTable.mergeClauses]] — Delta's full conditional-clause MERGE:
  * dispatch order, file pruning, CDF images, generated-column handling,
  * and the dead-clause contract.
  */
class MergeClausesSpec extends SparkSpec {
  import spark.implicits._
  import MergeTable.{BySourceDelete, BySourceUpdate, MatchedDelete,
    MatchedUpdate, NotMatchedInsert}

  private def df(rows: Seq[(Int, Int, String)]) = rows.toDF("k", "v", "p")

  test("first-true-wins within a group; unclaimed rows unchanged/dropped") {
    val t = new MergeTable(scratch("mc_order"), Seq("p"))
    t.overwrite(df(Seq((1, 10, "a"), (2, 20, "a"), (3, 30, "b"))))
    // both clauses' conditions hold for k=1 — the FIRST must claim it
    t.mergeClauses(spark, df(Seq((1, 100, "a"), (2, 2, "a"), (9, 90, "b"))), Seq("k"), Seq(
      MatchedUpdate(Some("s.v > t.v"), Seq("v" -> "s.v")),
      MatchedDelete(None)))
    val got = t.read(spark).select("k", "v").as[(Int, Int)].collect().toSet
    // k=1 updated by clause 1 (not deleted by clause 2); k=2 lower v →
    // clause 2 deletes; k=3 untouched; k=9 unmatched source, no insert
    // clause → dropped
    assert(got === Set((1, 100), (3, 30)))
  }

  test("file pruning: untouched partitions carry forward by reference") {
    val t = new MergeTable(scratch("mc_prune"), Seq("p"))
    t.overwrite(df(Seq((1, 10, "a"), (2, 20, "b"), (3, 30, "c"))))
    val before = t.filesOf(t.currentVersion).toSet
    t.mergeClauses(spark, df(Seq((1, 11, "a"))), Seq("k"), Seq(
      MatchedUpdate(None, Seq("v" -> "s.v"))))
    val after = t.filesOf(t.currentVersion).toSet
    // b's and c's files survive IDENTICALLY (no rewrite), a's is replaced
    val carried = before.intersect(after)
    assert(carried === before.filter(f => f.contains("p=b") || f.contains("p=c")))
    assert(t.read(spark).select("k", "v").as[(Int, Int)].collect().toSet ===
      Set((1, 11), (2, 20), (3, 30)))
  }

  test("BY SOURCE clauses widen the scope; partition pruning still applies") {
    val t = new MergeTable(scratch("mc_bysrc"), Seq("p"))
    t.overwrite(df(Seq((1, 10, "a"), (2, 20, "a"), (3, 30, "b"))))
    val before = t.filesOf(t.currentVersion).toSet
    // source only covers partition a; keysDeterminePartitions scopes the
    // sync to partition a — b's file must carry forward by reference
    t.mergeClauses(spark, df(Seq((1, 100, "a"))), Seq("k"), Seq(
      MatchedUpdate(None, Seq("v" -> "s.v")),
      BySourceDelete(Some("t.v >= 20"))),
      keysDeterminePartitions = true)
    val after = t.filesOf(t.currentVersion).toSet
    assert(before.intersect(after) === before.filter(_.contains("p=b")),
      "only the out-of-scope partition may carry forward under BY SOURCE")
    assert(t.read(spark).select("k", "v").as[(Int, Int)].collect().toSet ===
      Set((1, 100), (3, 30))) // k=2 deleted by the BY SOURCE clause
  }

  test("BY SOURCE UPDATE rewrites unmatched target rows in place") {
    val t = new MergeTable(scratch("mc_bsu"), Nil)
    t.overwrite(df(Seq((1, 10, "a"), (2, 20, "a"))))
    t.mergeClauses(spark, df(Seq((1, 11, "a"))), Seq("k"), Seq(
      MatchedUpdate(None, Seq("v" -> "s.v")),
      BySourceUpdate(None, Seq("v" -> "-1"))))
    assert(t.read(spark).select("k", "v").as[(Int, Int)].collect().toSet ===
      Set((1, 11), (2, -1)))
  }

  test("CDF records per-clause images") {
    val t = new MergeTable(scratch("mc_cdf"), Nil)
    t.overwrite(df(Seq((1, 10, "a"), (2, 20, "a"), (3, 30, "a"))))
    t.mergeClauses(spark, df(Seq((1, 100, "a"), (2, 20, "a"), (7, 70, "a"))), Seq("k"), Seq(
      MatchedUpdate(Some("s.v > t.v"), Seq("v" -> "s.v")),
      MatchedDelete(None),
      NotMatchedInsert(None, Nil)),
      changeFeed = true)
    val ch = t.changes(spark, 1, 1)
      .select("k", "v", MergeTable.ChangeType)
      .as[(Int, Int, String)].collect().toSet
    assert(ch === Set(
      (1, 10, "update_preimage"), (1, 100, "update_postimage"),
      (2, 20, "delete"), (7, 70, "insert")))
  }

  test("generated columns: inserts derive them, updates validate them") {
    val t = new MergeTable(scratch("mc_gen"), Nil,
      generatedCols = Seq("v2" -> "v * 2"))
    t.overwrite(Seq((1, 10), (2, 20)).toDF("k", "v"))
    // insert clause omits v2 → derived from its expression
    t.mergeClauses(spark, Seq((3, 30)).toDF("k", "v"), Seq("k"), Seq(
      NotMatchedInsert(None, Seq("k" -> "s.k", "v" -> "s.v"))))
    assert(t.read(spark).select("k", "v2").as[(Int, Int)].collect().toSet ===
      Set((1, 20), (2, 40), (3, 60)))
    // an update that breaks consistency (sets v without v2) raises
    val ex = intercept[Exception] {
      t.mergeClauses(spark, Seq((1, 99)).toDF("k", "v"), Seq("k"), Seq(
        MatchedUpdate(None, Seq("v" -> "s.v"))))
    }
    assert(ex.getMessage.contains("generated column") ||
      Option(ex.getCause).exists(_.getMessage.contains("generated column")))
    // consistent update passes
    t.mergeClauses(spark, Seq((1, 99)).toDF("k", "v"), Seq("k"), Seq(
      MatchedUpdate(None, Seq("v" -> "s.v", "v2" -> "s.v * 2"))))
    assert(t.read(spark).filter(col("k") === 1).select("v2").as[Int].head() === 198)
  }

  test("dv-masked rows never resurrect through a conditional merge") {
    val t = new MergeTable(scratch("mc_dv"), Nil)
    t.overwrite(df(Seq((1, 10, "a"), (2, 20, "a"), (3, 30, "a"))))
    t.deleteVectorized(spark, col("k") === 2) // masked, file NOT rewritten
    // k=2 is masked: the merge must treat it as absent — its key inserts
    // as a NEW row, and the rewrite of the touched file must not revive
    // the masked original alongside it
    t.mergeClauses(spark, df(Seq((1, 11, "a"), (2, 99, "a"))), Seq("k"), Seq(
      MatchedUpdate(None, Seq("v" -> "s.v")),
      NotMatchedInsert(None, Nil)))
    assert(t.read(spark).select("k", "v").as[(Int, Int)].collect().toSet ===
      Set((1, 11), (2, 99), (3, 30)))
  }

  test("conditional merge composes with column mapping (renamed column)") {
    val t = new MergeTable(scratch("mc_cmap"), Nil)
    t.overwrite(df(Seq((1, 10, "a"), (2, 20, "a"))))
    t.renameColumn("v", "score") // metadata-only; files keep physical 'v'
    t.mergeClauses(spark,
      Seq((1, 100, "a"), (9, 90, "a")).toDF("k", "score", "p"), Seq("k"), Seq(
        MatchedUpdate(Some("s.score > t.score"), Seq("score" -> "s.score")),
        NotMatchedInsert(None, Nil)))
    assert(t.read(spark).select("k", "score").as[(Int, Int)].collect().toSet ===
      Set((1, 100), (2, 20), (9, 90)))
  }

  test("mergeClausesEvolve: source-only columns evolve the schema first") {
    val t = new MergeTable(scratch("mc_evolve"), Seq("p"))
    t.overwrite(df(Seq((1, 10, "a"), (2, 20, "a"), (3, 30, "b"))))
    val src = Seq((1, 100, "a", "en"), (9, 90, "b", "fr")).toDF("k", "v", "p", "lang")
    t.mergeClausesEvolve(spark, src, Seq("k"), Seq(
      MatchedUpdate(Some("s.v > t.v"), Nil), // update-all picks up lang
      NotMatchedInsert(None, Nil)))
    assert(t.schemaOf(t.currentVersion).fieldNames.contains("lang"))
    val got = t.read(spark).select("k", "v", "lang")
      .collect().map(r => (r.getInt(0), r.getInt(1), Option(r.getString(2)))).toSet
    // matched k=1 takes the source row incl. lang; untouched rows read the
    // evolved column as NULL; the unmatched source row inserts with lang
    assert(got === Set((1, 100, Some("en")), (2, 20, None), (3, 30, None),
      (9, 90, Some("fr"))))
    // the SQL grammar routes conditional WITH SCHEMA EVOLUTION here
    val src2 = Seq((2, 200, "a", "de", 7L)).toDF("k", "v", "p", "lang", "score")
    src2.createOrReplaceTempView("mc_evolve_src")
    graft.sqlapi.LakeCatalog.register("mc_evolve_t", t)
    try spark.sql(
      """MERGE WITH SCHEMA EVOLUTION INTO mc_evolve_t USING mc_evolve_src
        |ON mc_evolve_t.k = mc_evolve_src.k
        |WHEN MATCHED AND mc_evolve_src.v > mc_evolve_t.v THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    finally graft.sqlapi.LakeCatalog.unregister("mc_evolve_t")
    assert(t.schemaOf(t.currentVersion).fieldNames.contains("score"))
    assert(t.read(spark).filter(col("k") === 2)
      .select("v", "score").collect().map(r => (r.getInt(0), r.getLong(1))).toSeq ===
      Seq((200, 7L)))
  }

  test("contracts: dead clause, unknown column, duplicate source, no table") {
    val t = new MergeTable(scratch("mc_err"), Nil)
    t.overwrite(Seq((1, 10)).toDF("k", "v"))
    val dead = intercept[IllegalArgumentException] {
      t.mergeClauses(spark, Seq((1, 1)).toDF("k", "v"), Seq("k"), Seq(
        MatchedDelete(None), MatchedUpdate(None, Seq("v" -> "0"))))
    }
    assert(dead.getMessage.contains("only the last"))
    val unk = intercept[IllegalArgumentException] {
      t.mergeClauses(spark, Seq((1, 1)).toDF("k", "v"), Seq("k"), Seq(
        MatchedUpdate(None, Seq("nope" -> "0"))))
    }
    assert(unk.getMessage.contains("unknown column"))
    val dup = intercept[IllegalArgumentException] {
      t.mergeClauses(spark, Seq((1, 1), (1, 2)).toDF("k", "v"), Seq("k"), Seq(
        MatchedUpdate(None, Nil)))
    }
    assert(dup.getMessage.contains("duplicate keys"))
    val missing = new MergeTable(scratch("mc_none"), Nil)
    val nx = intercept[IllegalArgumentException] {
      missing.mergeClauses(spark, Seq((1, 1)).toDF("k", "v"), Seq("k"), Seq(
        MatchedUpdate(None, Nil)))
    }
    assert(nx.getMessage.contains("does not exist"))
  }

  test("partition-disjoint clause merges auto-rebase a lost race (SQL MERGE surface)") {
    val t = new MergeTable(scratch("mc_rebase"), Seq("p"))
    t.overwrite(df(Seq((1, 10, "a"), (2, 20, "b"), (3, 30, "c"))))
    import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
    val pool = Executors.newFixedThreadPool(2)
    val go = new CountDownLatch(1)
    val failures = new java.util.concurrent.atomic.AtomicInteger
    Seq(("a", 1, 100), ("b", 2, 200)).foreach { case (p, k, v) =>
      pool.execute { () =>
        go.await()
        try t.mergeClauses(spark, df(Seq((k, v, p))), Seq("k"), Seq(
          MatchedUpdate(None, Seq("v" -> "s.v")), NotMatchedInsert()),
          keysDeterminePartitions = true)
        catch { case _: Throwable => failures.incrementAndGet() }
      }
    }
    go.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(120, TimeUnit.SECONDS))
    assert(failures.get === 0,
      "a partition-disjoint clause merge losing the race must rebase, not throw")
    assert(t.currentVersion === 2L)
    assert(t.read(spark).select("k", "v").as[(Int, Int)].collect().toSet ===
      Set((1, 100), (2, 200), (3, 30)))
    // zero recomputation: one data dir per writer (plus v0's)
    import scala.jdk.CollectionConverters._
    val dataDirs = java.nio.file.Files.list(java.nio.file.Paths.get(t.root))
      .iterator().asScala.map(_.getFileName.toString)
      .filter(_.startsWith("d")).toSeq
    assert(dataDirs.size === 3, s"orphan dir = re-derivation: $dataDirs")
  }

  test("star expansion resolves source columns case-insensitively (session resolver)") {
    val t = new MergeTable(scratch("mc_case"), Nil)
    t.overwrite(Seq((1, 10), (2, 20)).toDF("k", "v"))
    // source spells the value column "V" — Spark's default case-insensitive
    // resolution must still bind it for UPDATE SET * and INSERT *
    val src = Seq((1, 100), (3, 300)).toDF("k", "V")
    t.mergeClauses(spark, src, Seq("k"), Seq(
      MatchedUpdate(None, Nil), NotMatchedInsert(None, Nil)))
    val got = t.read(spark).select("k", "v").as[(Int, Int)].collect().toSet
    assert(got === Set((1, 100), (2, 20), (3, 300)),
      "a source column differing only in case must assign, not keep/null-fill")
  }
}
