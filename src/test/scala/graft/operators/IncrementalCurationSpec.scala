package graft.operators

import graft.SparkSpec
import graft.lake.MergeTable
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** IncrementalCuration.applyBatch semantics that the st19/st23 gates
  * cannot pin deterministically: out-of-order canonical demotion,
  * delete-driven promotion, below-bar update retraction, and — the hard
  * one — ORDER-INDEPENDENCE when a commit's update pre/postimage files
  * land in different micro-batches in either order (the streaming file
  * source makes no commit-atomicity promise). The hash-conditional
  * fingerprint drop is what makes both orders converge.
  */
class IncrementalCurationSpec extends SparkSpec {
  import spark.implicits._

  // quality-passing texts (>=5 words, >=2 stopwords, low symbols/repetition)
  private val tA = "the cat and the dog ran to the house"
  private val tB = "a bird of the north flew to warm lands"
  private val tC = "the ship and its crew sailed of to sea"
  private val low = "x x" // fails the nw >= 5 gate

  private val emptyGrams = Seq.empty[String].toDF("gram")

  private def batchOf(rows: (Long, String, String, String, Long)*): DataFrame =
    rows.toSeq.toDF("doc_id", "text", "source", MergeTable.ChangeType,
      MergeTable.CommitVersion)

  private def curatedIds(t: MergeTable): Set[Long] =
    t.read(spark).select("doc_id").collect().map(_.getLong(0)).toSet

  test("demotion, promotion, and below-bar retraction converge to the batch recompute") {
    val root = scratch("inccur")
    val fps = new MergeTable(s"$root/fps")
    val curated = new MergeTable(s"$root/curated")
    var b = 0L
    def apply(rows: (Long, String, String, String, Long)*): Long = {
      b += 1
      IncrementalCuration.applyBatch(batchOf(rows: _*), b, fps, curated,
        emptyGrams, "ictest")
    }
    // duplicate with SMALLER id arrives LATER -> sitting canonical demotes
    assert(apply((5L, tA, "s", "insert", 1L)) == 1L)
    assert(curatedIds(curated) == Set(5L))
    apply((2L, tA, "s", "insert", 2L))
    assert(curatedIds(curated) == Set(2L), "late smaller-id dup must demote")
    assert(fps.read(spark).count() == 2, "census keeps ALL quality-passing docs")
    // canonical deleted -> surviving dup promotes
    apply((2L, tA, "s", "delete", 3L))
    assert(curatedIds(curated) == Set(5L), "delete of canonical must promote")
    assert(fps.read(spark).count() == 1)
    // update below the quality bar -> full retraction, hash freed
    apply((5L, tA, "s", "update_preimage", 4L), (5L, low, "s", "update_postimage", 4L))
    assert(curatedIds(curated).isEmpty, "below-bar update must retract")
    assert(fps.read(spark).count() == 0, "fingerprint must leave the census")
    // the freed hash is NOT tombstoned: a fresh insert re-curates
    apply((9L, tA, "s", "insert", 5L))
    assert(curatedIds(curated) == Set(9L))
  }

  test("split update pre/postimage batches converge in EITHER order") {
    for (postFirst <- Seq(true, false)) {
      val root = scratch(s"inccur_split_$postFirst")
      val fps = new MergeTable(s"$root/fps")
      val curated = new MergeTable(s"$root/curated")
      var b = 0L
      def apply(rows: (Long, String, String, String, Long)*): Unit = {
        b += 1
        IncrementalCuration.applyBatch(batchOf(rows: _*), b, fps, curated,
          emptyGrams, "ictest")
      }
      apply((1L, tA, "s", "insert", 1L), (2L, tB, "s", "insert", 1L))
      // doc 1 updates tA -> tC at version 2; the two image files split
      val pre = (1L, tA, "s", "update_preimage", 2L)
      val post = (1L, tC, "s", "update_postimage", 2L)
      if (postFirst) { apply(post); apply(pre) } else { apply(pre); apply(post) }
      // converged state: doc 1 registered under tC's hash, still curated
      assert(curatedIds(curated) == Set(1L, 2L),
        s"postFirst=$postFirst: final curated set diverged")
      val h1 = fps.read(spark).filter(col("doc_id") === 1).select("h")
        .head.getString(0)
      val hC = spark.range(1).select(md5(lit(tC))).head.getString(0)
      assert(h1 == hC, s"postFirst=$postFirst: doc 1 must be registered under tC")
      assert(fps.read(spark).count() == 2)
    }
  }

  test("UNCHANGED-text update (metadata-only backfill) split images converge in EITHER order") {
    // pre- and postimage hashes are EQUAL here, so the hash guard alone
    // cannot tell the trailing preimage from a genuine retraction — the
    // registration's commit version (the same-commit drop guard) must
    for (postFirst <- Seq(true, false)) {
      val root = scratch(s"inccur_meta_$postFirst")
      val fps = new MergeTable(s"$root/fps")
      val curated = new MergeTable(s"$root/curated")
      var b = 0L
      def apply(rows: (Long, String, String, String, Long)*): Unit = {
        b += 1
        IncrementalCuration.applyBatch(batchOf(rows: _*), b, fps, curated,
          emptyGrams, "ictest")
      }
      apply((1L, tA, "s", "insert", 1L))
      // commit 2 "updates" doc 1 without changing its text (the lang-
      // backfill shape); the two image files land in separate batches
      val pre = (1L, tA, "s", "update_preimage", 2L)
      val post = (1L, tA, "s", "update_postimage", 2L)
      if (postFirst) { apply(post); apply(pre) } else { apply(pre); apply(post) }
      assert(curatedIds(curated) == Set(1L),
        s"postFirst=$postFirst: an unchanged-text update must never retract")
      assert(fps.read(spark).count() == 1,
        s"postFirst=$postFirst: the registration must survive its own commit's preimage")
    }
  }

  // -- crash-replay convergence -------------------------------------------
  // applyBatch's exactly-once story (scaladoc: "every crash point
  // converges") rests on fps committing FIRST under its own txn marker and
  // the curated merge re-deriving winners from post-fps state on replay.
  // These tests pin the two non-trivial crash points. The mid-crash state
  // is recreated EXACTLY: a filesystem snapshot of the curated table taken
  // before the batch is restored after it, which is indistinguishable from
  // a writer that died between the two commits (fps advanced + marked,
  // curated untouched, no curated marker).

  private def copyDir(src: String, dst: String): Unit = {
    val s = java.nio.file.Paths.get(src)
    val d = java.nio.file.Paths.get(dst)
    java.nio.file.Files.walk(s).forEach { p =>
      val t = d.resolve(s.relativize(p))
      if (java.nio.file.Files.isDirectory(p)) java.nio.file.Files.createDirectories(t)
      else java.nio.file.Files.copy(p, t,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
  }

  private def deleteDir(dir: String): Unit = {
    val p = java.nio.file.Paths.get(dir)
    if (java.nio.file.Files.exists(p))
      java.nio.file.Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .forEach(java.nio.file.Files.delete(_))
  }

  private def stateOf(fps: MergeTable, curated: MergeTable): (Set[String], Set[String]) = (
    fps.read(spark).select("doc_id", "h", "source", "n_tok", "ok")
      .collect().map(_.mkString("|")).toSet,
    curated.read(spark).select("doc_id", "source", "n_tok")
      .collect().map(_.mkString("|")).toSet)

  test("replay after a crash BETWEEN the fps and curated commits converges") {
    val root = scratch("inccur_crash")
    val b1 = batchOf((5L, tA, "s", "insert", 1L), (6L, tB, "s", "insert", 1L))
    // batch 2 exercises both merge directions: a smaller-id dup demotes
    // doc 5, and doc 6 is corpus-deleted (curated retraction + census drop)
    val b2 = batchOf((2L, tA, "s", "insert", 2L), (6L, tB, "s", "delete", 2L))

    // control: both batches, no crash
    val fpsC = new MergeTable(s"$root/fps_ctl")
    val curC = new MergeTable(s"$root/cur_ctl")
    IncrementalCuration.applyBatch(b1, 1L, fpsC, curC, emptyGrams, "iccrash")
    IncrementalCuration.applyBatch(b2, 2L, fpsC, curC, emptyGrams, "iccrash")
    val want = stateOf(fpsC, curC)

    // crashed run: batch 1, snapshot curated, batch 2, then roll the
    // curated DIRECTORY back to the snapshot — the exact between-commits
    // crash state (fps holds batch 2's marker, curated does not)
    val fps = new MergeTable(s"$root/fps")
    val cur = new MergeTable(s"$root/cur")
    IncrementalCuration.applyBatch(b1, 1L, fps, cur, emptyGrams, "iccrash")
    copyDir(s"$root/cur", s"$root/cur_snap")
    IncrementalCuration.applyBatch(b2, 2L, fps, cur, emptyGrams, "iccrash")
    deleteDir(s"$root/cur")
    copyDir(s"$root/cur_snap", s"$root/cur")

    // replay with FRESH handles (a restarted writer holds no caches)
    val fps2 = new MergeTable(s"$root/fps")
    val cur2 = new MergeTable(s"$root/cur")
    val fpsVerBefore = fps2.currentVersion
    assert(fps2.lastTxnVersion("iccrashf").contains(2L),
      "precondition: the crashed batch's fps commit must be marked")
    assert(cur2.lastTxnVersion("iccrashc").contains(1L),
      "precondition: the curated table must NOT carry batch 2's marker")
    IncrementalCuration.applyBatch(b2, 2L, fps2, cur2, emptyGrams, "iccrash")
    assert(fps2.currentVersion == fpsVerBefore,
      "replay must SKIP the already-marked fps merge (no new fps commit)")
    assert(stateOf(fps2, cur2) == want,
      "between-commits crash + replay must converge to the no-crash state")
  }

  test("replay of a fully-committed batch is a no-op on both tables") {
    val root = scratch("inccur_replay")
    val fps = new MergeTable(s"$root/fps")
    val cur = new MergeTable(s"$root/cur")
    val b1 = batchOf((1L, tA, "s", "insert", 1L), (2L, tB, "s", "insert", 1L))
    IncrementalCuration.applyBatch(b1, 1L, fps, cur, emptyGrams, "icnoop")
    val (fv, cv) = (fps.currentVersion, cur.currentVersion)
    val want = stateOf(fps, cur)
    IncrementalCuration.applyBatch(b1, 1L, fps, cur, emptyGrams, "icnoop")
    assert(fps.currentVersion == fv && cur.currentVersion == cv,
      "a replayed batch must not publish any new commit")
    assert(stateOf(fps, cur) == want)
    // the ACCIDENTAL-DOUBLE-DEPLOYMENT shape (st26's former in-gate layer):
    // a second maintenance instance with FRESH handles — no caches, no
    // shared state — re-applies the same batch under the same app id and
    // must serialize to a pure txn-marker no-op on both tables
    val fps2 = new MergeTable(s"$root/fps")
    val cur2 = new MergeTable(s"$root/cur")
    IncrementalCuration.applyBatch(b1, 1L, fps2, cur2, emptyGrams, "icnoop")
    assert(fps2.currentVersion == fv && cur2.currentVersion == cv,
      "a double-deployed instance must not publish any new commit")
    assert(stateOf(fps2, cur2) == want)
  }

  test("contaminated and eval canonicals take the hash without curating") {
    val root = scratch("inccur_contam")
    val fps = new MergeTable(s"$root/fps")
    val curated = new MergeTable(s"$root/curated")
    // tB's own 8-gram contaminates it; tA stays clean
    val grams = Seq("a bird of the north flew to warm").toDF("gram")
    IncrementalCuration.applyBatch(
      batchOf((3L, tB, "s", "insert", 1L), (4L, tA, "s", "insert", 1L)),
      1L, fps, curated, grams, "ictest")
    assert(curatedIds(curated) == Set(4L), "contaminated doc must not curate")
    // its duplicate never resurrects: the hash is taken (ok=false winner)
    IncrementalCuration.applyBatch(
      batchOf((8L, tB, "s", "insert", 2L)), 2L, fps, curated, grams, "ictest")
    assert(curatedIds(curated) == Set(4L),
      "a contaminated canonical's duplicate must never resurface")
    // eval doc (id % 97 == 0) registers but never curates
    IncrementalCuration.applyBatch(
      batchOf((97L, tC, "s", "insert", 3L)), 3L, fps, curated, grams, "ictest")
    assert(curatedIds(curated) == Set(4L))
    assert(fps.read(spark).filter(col("doc_id") === 97).count() == 1)
  }
}
