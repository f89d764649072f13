package graft.pipeline

import graft.SparkSpec
import graft.sqlapi.AthenaQueries
import org.apache.spark.sql.functions.col
import java.time.LocalDate

/** End-to-end pipeline behavior that the cc* oracle queries can't isolate:
  * deterministic in-batch dedup, run-twice idempotency, exception append
  * accumulation.
  */
class PipelineSpec extends SparkSpec {

  private val date = LocalDate.of(2026, 8, 12)

  private def freshLake(name: String): CallCenterPipeline.LakePaths =
    CallCenterPipeline.LakePaths(scratch(name))

  test("a batch carrying the same call_id twice dedupes deterministically") {
    // Two conflicting rows for 200: the asc_nulls_first total order over
    // (caller_id, agent_id, ...) must always pick caller_id 5001 < 5002.
    val rows = Seq(
      "200,5002,22,10:00:00,10:05:00,COMPLETED",
      "200,5001,21,09:00:00,09:05:00,COMPLETED",
    )
    (1 to 2).foreach { i =>
      val p = freshLake(s"dup_batch_$i")
      val csv = Fixture.writeCsv(s"${p.root}/src", "b.csv", rows)
      CallCenterPipeline.silverJob(spark, csv, p, date)
      val silver = CallCenterPipeline.silverTable(p).read(spark).collect()
      assert(silver.length === 1)
      assert(silver.head.getAs[Int]("caller_id") === 5001, s"run $i picked the wrong winner")
    }
  }

  test("re-running the same batch is idempotent across silver AND gold") {
    val p = freshLake("rerun")
    val csv = Fixture.writeCsv(s"${p.root}/src", "b.csv", Fixture.initialBatch)
    CallCenterPipeline.run(spark, csv, p, date)
    AthenaQueries.registerViews(spark, p)
    val gold1 = AthenaQueries.run(spark, "daily_call_summary").collect().toSeq
    CallCenterPipeline.run(spark, csv, p, date) // late re-delivery of same file
    AthenaQueries.registerViews(spark, p)
    val gold2 = AthenaQueries.run(spark, "daily_call_summary").collect().toSeq
    assert(gold1 === gold2)
    assert(CallCenterPipeline.silverTable(p).read(spark).count() === 4)
  }

  test("exception sink is append-only: re-runs accumulate audit rows") {
    val p = freshLake("exc_append")
    val csv = Fixture.writeCsv(s"${p.root}/src", "b.csv", Fixture.initialBatch)
    CallCenterPipeline.silverJob(spark, csv, p, date)
    CallCenterPipeline.silverJob(spark, csv, p, date)
    // 6 invalid rows per run — the reference appends, never dedupes (audit).
    val exc = spark.read.parquet(p.exception)
    assert(exc.count() === 12)
    assert(exc.filter(col("Reject_reason").isNull).count() === 0)
  }
}
