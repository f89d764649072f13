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
