package graft.operators

import graft.SparkSpec
import graft.lake.MergeTable
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The persisted index's COMPACTION POLICY: a long-running maintained
  * index (one append per micro-batch, one file set per touched cell per
  * append) must keep bounded files-per-cell via the codes table's
  * auto-compaction — and compaction must never change search results.
  * Also pins the searchBatch missing-id guard and the v1-index version
  * error.
  */
class PersistedAnnIndexSpec extends SparkSpec {

  private def emb: DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
      .withColumn("norm", expr("sqrt(float_dot(embedding, embedding))"))
  }

  private def filesPerCell(t: MergeTable): Map[String, Int] =
    t.filesOf(t.currentVersion).groupBy { f =>
      f.split('/').find(_.startsWith("cell=")).getOrElse("?")
    }.map { case (c, fs) => c -> fs.size }

  test("10-append lifecycle: touched cells stay bin-packed, results unchanged") {
    val e = emb.cache()
    val n = e.count()
    val slice = n / 11 + 1
    def part(i: Int) = e.filter(col("vec_id") % 11 === i)
    // compacted index: build() wires autoCompact (threshold 4 here);
    // control index: identical batches, compaction disabled after build
    val rootC = scratch("annc"); val rootU = scratch("annu")
    val hC = PersistedAnnIndex.build(spark, part(0), rootC,
      autoCompactMinFiles = 4)
    val hU = PersistedAnnIndex.build(spark, part(0), rootU,
      autoCompactMinFiles = 4)
    hU.codesTable.setProperties(Map(MergeTable.AutoCompactProp -> "false"))
    (1 to 10).foreach { i =>
      PersistedAnnIndex.append(spark, hC, part(i))
      PersistedAnnIndex.append(spark, hU, part(i))
    }
    assert(hC.codesTable.read(spark).count() == n)
    val fC = filesPerCell(hC.codesTable)
    val fU = filesPerCell(hU.codesTable)
    assert(fU.values.max >= 8,
      s"control index should accumulate micro-files, saw $fU")
    assert(fC.values.max <= 4,
      s"auto-compaction must bound files-per-cell at the threshold, saw $fC")
    // identical model tables + identical row set => compaction is the only
    // difference, and it must be invisible to search
    for (qid <- Seq(0L, 7L, 123L)) {
      val a = PersistedAnnIndex.search(spark, hC, e, qid, k = 10).collect().toSeq
      val b = PersistedAnnIndex.search(spark, hU, e, qid, k = 10).collect().toSeq
      assert(a == b, s"compaction changed search results for query $qid")
    }
    e.unpersist()
  }

  test("remove is idempotent: a replayed retraction batch changes nothing") {
    val e = emb.cache()
    val root = scratch("annrm")
    val h = PersistedAnnIndex.build(spark, e, root)
    val victims = e.filter(col("vec_id") % 37 === 3)
    val nVictims = victims.count()
    assert(PersistedAnnIndex.remove(spark, h, victims) == nVictims)
    val visible = h.codesTable.read(spark).count()
    val got = PersistedAnnIndex.search(spark, h, e, queryId = 0, k = 10)
      .collect().toSeq
    assert(got.forall(r => r.getLong(0) % 37 != 3),
      "search must never surface a removed vector")
    // the replayed micro-batch re-runs remove after its txn-marked append
    // was skipped — masking already-masked positions must be a no-op
    assert(PersistedAnnIndex.remove(spark, h, victims) == nVictims)
    assert(h.codesTable.read(spark).count() == visible)
    assert(PersistedAnnIndex.search(spark, h, e, queryId = 0, k = 10)
      .collect().toSeq == got, "replayed remove changed search results")
    e.unpersist()
  }

  test("maintain folds dv masks past the threshold; search is byte-identical across the fold") {
    val e = emb.cache()
    val root = scratch("annfold")
    val h = PersistedAnnIndex.build(spark, e, root)
    val victims = e.filter(col("vec_id") % 7 === 2)
    PersistedAnnIndex.remove(spark, h, victims)
    val before = PersistedAnnIndex.maintain(spark, h, maxMaskedFraction = 0.05)
    assert(before.maskedRows > 0 && before.maskedFraction > 0.05,
      s"precondition: the removes must mask past the threshold, saw $before")
    assert(before.foldedCells.nonEmpty, "maintain must fold past the threshold")
    // every sidecar is gone, live rows unchanged, and a fresh census is clean
    assert(h.codesTable.deletionVectors.isEmpty,
      "folding must materialize survivors and drop the dv sidecars")
    val after = PersistedAnnIndex.maintain(spark, h, maxMaskedFraction = 0.05)
    assert(after.maskedRows == 0L && after.foldedCells.isEmpty,
      s"post-fold census must be clean, saw $after")
    assert(after.liveRows == before.liveRows, "folding must not change live rows")
    // the fold is invisible to search: rebuild an identical index WITHOUT
    // folding and compare results row for row
    val hU = PersistedAnnIndex.build(spark, e, scratch("annfoldu"))
    PersistedAnnIndex.remove(spark, hU, victims)
    for (qid <- Seq(0L, 7L, 123L)) {
      val a = PersistedAnnIndex.search(spark, h, e, qid, k = 10).collect().toSeq
      val b = PersistedAnnIndex.search(spark, hU, e, qid, k = 10).collect().toSeq
      assert(a == b, s"dv fold changed search results for query $qid")
    }
    e.unpersist()
  }

  test("sustained delete load keeps the masked fraction bounded under maintain") {
    val e = emb.cache()
    val root = scratch("annsust")
    val h = PersistedAnnIndex.build(spark, e, root)
    val cap = 0.25
    (0 until 4).foreach { i =>
      PersistedAnnIndex.remove(spark, h, e.filter(col("vec_id") % 5 === i))
      val r = PersistedAnnIndex.maintain(spark, h, maxMaskedFraction = cap)
      // maintain either stayed under the cap or folded back to zero —
      // the fraction never RATCHETS (the st24 failure mode it closes)
      val now = PersistedAnnIndex.maintain(spark, h, maxMaskedFraction = 1.0)
      assert(now.maskedFraction <= cap,
        s"round $i: masked fraction must stay bounded, saw $now after $r")
    }
    assert(h.codesTable.read(spark).count() == e.filter(col("vec_id") % 5 === 4).count(),
      "only the undeleted residue class remains live")
    e.unpersist()
  }

  test("corpus growth past the threshold raises the retrain signal; a retrain clears it") {
    val e = emb.cache()
    val root = scratch("anngrow")
    val seed = e.filter(col("vec_id") % 8 === 0)
    val h = PersistedAnnIndex.build(spark, seed, root)
    (1 to 7).foreach(i =>
      PersistedAnnIndex.append(spark, h, e.filter(col("vec_id") % 8 === i)))
    val drifted = PersistedAnnIndex.maintain(spark, h, maxGrowth = 4.0)
    assert(drifted.retrainAdvised && drifted.growth.exists(_ > 4.0),
      s"8x growth must advise a retrain, saw $drifted")
    assert(drifted.reason.contains("retrain"),
      s"the advice must be loud and actionable: ${drifted.reason}")
    // the retrain IS build() over the current corpus: atomic model
    // overwrite, training-size property reset, signal cleared
    PersistedAnnIndex.build(spark, e, root)
    val healthy = PersistedAnnIndex.maintain(spark, h, maxGrowth = 4.0)
    assert(!healthy.retrainAdvised && healthy.reason == "healthy",
      s"a retrain must clear the drift signal, saw $healthy")
    e.unpersist()
  }

  test("searchBatch fails fast on a query id absent from the corpus") {
    val e = emb
    val root = scratch("annm")
    val h = PersistedAnnIndex.build(spark, e, root)
    val err = intercept[IllegalArgumentException] {
      PersistedAnnIndex.searchBatch(spark, h, e, Seq(0L, 999999L), k = 5)
    }
    assert(err.getMessage.contains("999999"))
  }

  test("a v1 (pre-residual) index fails loudly with a rebuild instruction") {
    val e = emb
    val root = scratch("annv1")
    val h = PersistedAnnIndex.build(spark, e.limit(100), root)
    // simulate a v1 index: codebook without the residual marker column
    val v1 = h.codebookTable.read(spark).drop("residual")
    h.codebookTable.overwrite(v1)
    val err = intercept[IllegalArgumentException] {
      PersistedAnnIndex.search(spark, h, e, queryId = 0, k = 5)
    }
    assert(err.getMessage.contains("rebuild"))
  }
}
