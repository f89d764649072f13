package graft.operators

import graft.SparkSpec
import graft.lake.MergeTable
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The curation state tables' SCALE contract: fps is partitioned by a
  * hash-prefix bucket and the per-batch winner recompute reads only the
  * touched buckets' FILES (never the whole census), the "docs that left
  * fps" probe is the fps commit's own change-feed delete rows (never a
  * full-table anti-join), and the curated merge's touched-file probe
  * prunes through `keysDeterminePartitions`. Semantics must be EXACTLY
  * the unbucketed operator's — the first test pins that equivalence over
  * every mutation kind, including the hash-moving update that relocates
  * a census row across bucket partitions.
  */
class BucketedCurationSpec extends SparkSpec {
  import spark.implicits._

  private val emptyGrams = Seq.empty[String].toDF("gram")

  private def batchOf(rows: (Long, String, String, String, Long)*): DataFrame =
    rows.toSeq.toDF("doc_id", "text", "source", MergeTable.ChangeType,
      MergeTable.CommitVersion)

  // quality-passing, pairwise-distinct texts (>=5 words, >=2 stopwords)
  private def txt(i: Int): String = s"the cat and dog ran to house number $i park"

  private val tA = "the cat and the dog ran to the house"
  private val tB = "a bird of the north flew to warm lands"
  private val tC = "the ship and its crew sailed of to sea"

  private def stateOf(fps: MergeTable, curated: MergeTable): (Set[String], Set[String]) = (
    fps.read(spark).select("doc_id", "h", "source", "n_tok", "ok")
      .collect().map(_.mkString("|")).toSet,
    curated.read(spark).select("doc_id", "source", "n_tok")
      .collect().map(_.mkString("|")).toSet)

  test("bucketed state tables converge to the legacy recompute under every mutation kind") {
    val root = scratch("buckcur")
    val legacyF = new MergeTable(s"$root/lf")
    val legacyC = new MergeTable(s"$root/lc")
    val bucketF = IncrementalCuration.fpsTable(spark, s"$root/bf")
    val bucketC = IncrementalCuration.curatedTable(spark, s"$root/bc")
    val batches = Seq(
      // dup group (5, 2 arrives later and demotes), singleton 7
      batchOf((5L, tA, "s", "insert", 1L), (7L, tB, "s", "insert", 1L)),
      batchOf((2L, tA, "s", "insert", 2L)),
      // hash-moving update: doc 7 re-registers under tC's hash (bucket moves)
      batchOf((7L, tB, "s", "update_preimage", 3L),
              (7L, tC, "s", "update_postimage", 3L)),
      // delete of the sitting canonical promotes the dup; below-bar update
      // retracts doc 7 entirely (change-feed delete row drives the curated
      // retraction)
      batchOf((2L, tA, "s", "delete", 4L)),
      batchOf((7L, tC, "s", "update_preimage", 5L),
              (7L, "x x", "s", "update_postimage", 5L)))
    batches.zipWithIndex.foreach { case (b, i) =>
      IncrementalCuration.applyBatch(b, i + 1L, legacyF, legacyC, emptyGrams, "bcl")
      IncrementalCuration.applyBatch(b, i + 1L, bucketF, bucketC, emptyGrams, "bcb")
    }
    assert(stateOf(bucketF, bucketC) == stateOf(legacyF, legacyC),
      "bucketed and legacy state diverged")
    // the hash-moving update actually MOVED the census row's partition:
    // doc 5's file sits under tA's hash-prefix dir, none under tB's remain
    val hA = spark.range(1).select(md5(lit(tA))).head.getString(0)
    val dirs = bucketF.filesOf(bucketF.currentVersion)
      .flatMap(f => "b=([0-9a-f]+)/".r.findFirstMatchIn(f).map(_.group(1))).toSet
    assert(dirs.contains(hA.substring(0, 1)),
      s"expected a file under surviving doc 5's bucket ${hA.substring(0, 1)}, saw $dirs")
  }

  test("winner recompute opens only the touched buckets' files") {
    val root = scratch("buckprune")
    val fps = IncrementalCuration.fpsTable(spark, s"$root/fps")
    val curated = IncrementalCuration.curatedTable(spark, s"$root/cur")
    // seed: 48 distinct docs spread across the 16 hash-prefix buckets
    val seed = batchOf((0 until 48).map(i =>
      (i.toLong, txt(i), "s", "insert", 1L)): _*)
    IncrementalCuration.applyBatch(seed, 1L, fps, curated, emptyGrams, "bcp")
    // several merges so the census holds MANY files across buckets
    (2 to 4).foreach { b =>
      val more = batchOf((0 until 16).map(i =>
        (100L * b + i, txt(1000 * b + i), "s", "insert", b.toLong)): _*)
      IncrementalCuration.applyBatch(more, b.toLong, fps, curated, emptyGrams, "bcp")
    }
    // the probe batch touches exactly ONE hash → one bucket
    val one = "the owl and a fox went to the old barn"
    val bucket = spark.range(1).select(md5(lit(one))).head.getString(0).substring(0, 1)
    IncrementalCuration.applyBatch(
      batchOf((9999L, one, "s", "insert", 5L)), 5L, fps, curated, emptyGrams, "bcp")
    val total = IncrementalCuration.lastWinnerFilesTotal
    val read = IncrementalCuration.lastWinnerFilesRead
    val inBucket = fps.filesOf(fps.currentVersion).count(_.contains(s"b=$bucket/"))
    assert(total > 16, s"precondition: census must span many files, saw $total")
    assert(read < total,
      s"winner recompute must prune fps files: read $read of $total")
    assert(read <= inBucket,
      s"files read ($read) must be bounded by the touched bucket's files ($inBucket)")
    // and the maintained result is still right: the new doc curates
    assert(curated.read(spark).filter(col("doc_id") === 9999L).count() == 1)
  }

  test("crash replay re-locates the fps commit's change feed by txn marker") {
    val root = scratch("buckcrash")
    val b1 = batchOf((5L, tA, "s", "insert", 1L), (6L, tB, "s", "insert", 1L))
    // batch 2 retracts via the change-feed path: doc 6 is corpus-deleted
    val b2 = batchOf((2L, tA, "s", "insert", 2L), (6L, tB, "s", "delete", 2L))

    val fpsC = IncrementalCuration.fpsTable(spark, s"$root/fps_ctl")
    val curC = IncrementalCuration.curatedTable(spark, s"$root/cur_ctl")
    IncrementalCuration.applyBatch(b1, 1L, fpsC, curC, emptyGrams, "bcc")
    IncrementalCuration.applyBatch(b2, 2L, fpsC, curC, emptyGrams, "bcc")
    val want = stateOf(fpsC, curC)

    // crash BETWEEN the fps and curated commits: snapshot curated before
    // batch 2, run it, roll curated back — fps holds batch 2's marker and
    // its change feed; the replay must find that feed to retract doc 6
    val fps = IncrementalCuration.fpsTable(spark, s"$root/fps")
    val cur = IncrementalCuration.curatedTable(spark, s"$root/cur")
    IncrementalCuration.applyBatch(b1, 1L, fps, cur, emptyGrams, "bcc")
    copyDir(s"$root/cur", s"$root/cur_snap")
    IncrementalCuration.applyBatch(b2, 2L, fps, cur, emptyGrams, "bcc")
    deleteDir(s"$root/cur")
    copyDir(s"$root/cur_snap", s"$root/cur")

    val fps2 = IncrementalCuration.fpsTable(spark, s"$root/fps")
    val cur2 = IncrementalCuration.curatedTable(spark, s"$root/cur")
    val fpsVerBefore = fps2.currentVersion
    IncrementalCuration.applyBatch(b2, 2L, fps2, cur2, emptyGrams, "bcc")
    assert(fps2.currentVersion == fpsVerBefore,
      "replay must SKIP the already-marked fps merge")
    assert(stateOf(fps2, cur2) == want,
      "crash + replay must converge (incl. the change-feed-driven retraction)")
  }

  test("prefix length is baked into the table, not the session conf") {
    val root = scratch("bucklen")
    spark.conf.set("spark.graft.curationHashPrefixLen", "2")
    val fps =
      try IncrementalCuration.fpsTable(spark, s"$root/fps")
      finally spark.conf.unset("spark.graft.curationHashPrefixLen")
    val curated = IncrementalCuration.curatedTable(spark, s"$root/cur")
    IncrementalCuration.applyBatch(
      batchOf((1L, tA, "s", "insert", 1L)), 1L, fps, curated, emptyGrams, "bln")
    val hA = spark.range(1).select(md5(lit(tA))).head.getString(0)
    assert(fps.filesOf(fps.currentVersion)
      .exists(_.contains(s"b=${hA.substring(0, 2)}/")),
      "256-bucket table must partition by the 2-char prefix")
    // a LATER handle opened under the DEFAULT conf must still see the
    // 2-char layout: the declaration is table state in the log, restored
    // by the factory's reopen path — conf only matters at creation
    val fps2 = IncrementalCuration.fpsTable(spark, s"$root/fps")
    assert(fps2.generatedCols == Seq("b" -> "substring(h, 1, 2)"),
      s"reopened handle must restore the baked prefix, saw ${fps2.generatedCols}")
    val cur2 = IncrementalCuration.curatedTable(spark, s"$root/cur")
    IncrementalCuration.applyBatch(
      batchOf((1L, tA, "s", "delete", 2L)), 2L, fps2, cur2, emptyGrams, "bln")
    assert(fps2.read(spark).count() == 0 && cur2.read(spark).count() == 0)
  }

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
}
