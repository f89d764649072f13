package graft.gold

import graft.SparkSpec
import org.apache.spark.sql.functions.lit
import java.sql.Date

/** Gold aggregation semantics on a hand-computed frame — including quirk Q2
  * (case-SENSITIVE status buckets under case-insensitive validation), Q4
  * (unparseable time → NULL duration → dropped), Q5 (midnight wrap →
  * negative duration → dropped).
  */
class GoldAggregatesSpec extends SparkSpec {
  import spark.implicits._

  // post-merge silver state of the fixture: 101 re-delivered as DROPPED.
  private lazy val silver = Seq(
    (101, 5001, 11, "09:15:00", "09:25:00", "DROPPED"),   // 600 s
    (102, 5002, 12, "10:00:00", "10:01:00", "dropped"),   // Q2: no bucket; 60 s
    (103, 5003, 13, "23:58:00", "00:03:00", "COMPLETED"), // Q5: -86100 s
    (104, 5004, 14, "99:99:99", "10:00:00", "FAILED"),    // Q4: NULL duration
  ).toDF("call_id", "caller_id", "agent_id", "call_start_time", "call_end_time", "call_status")

  private val date = lit(Date.valueOf("2026-08-12"))

  test("dailySummary: Q2 makes buckets sum below total; rate from COMPLETED only") {
    val r = GoldAggregates.dailySummary(silver, date).collect()
    assert(r.length === 1)
    val row = r.head
    assert(row.getAs[Long]("total_calls") === 4)
    assert(row.getAs[Long]("completed_calls") === 1)
    assert(row.getAs[Long]("dropped_calls") === 1) // 'dropped' ≠ 'DROPPED'
    assert(row.getAs[Long]("failed_calls") === 1)
    assert(row.getAs[Double]("completion_rate") === 25.0)
  }

  test("agentPerformance: one row per (agent, date)") {
    val r = GoldAggregates.agentPerformance(silver, date)
    assert(r.count() === 4)
    val a12 = r.filter($"agent_id" === 12).collect().head
    assert(a12.getAs[Long]("total_calls") === 1)
    assert(a12.getAs[Long]("dropped_calls") === 0) // Q2 again
    assert(a12.getAs[Double]("completion_rate") === 0.0)
  }

  test("durationMetrics: Q4 and Q5 rows dropped by the >= 0 filter only") {
    val r = GoldAggregates.durationMetrics(silver, date).collect()
    assert(r.length === 1)
    val row = r.head
    assert(row.getAs[Double]("avg_call_duration_seconds") === 330.0) // (600+60)/2
    assert(row.getAs[Long]("min_call_duration_seconds") === 60)
    assert(row.getAs[Long]("max_call_duration_seconds") === 600)
  }

  test("property: buckets sum to total iff every status is upper-case (Q2 law)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val statusGen = Gen.listOfN(12, Gen.oneOf(
      "COMPLETED", "DROPPED", "FAILED", "completed", "Dropped", "failed"))
    (0 until 4).foreach { i =>
      val statuses = statusGen.apply(Gen.Parameters.default, Seed(7L + i)).get
      val rows = statuses.zipWithIndex.map { case (st, j) =>
        (200 + j, 5000 + j, 20 + j, "09:00:00", "09:05:00", st)
      }
      val df = rows.toDF("call_id", "caller_id", "agent_id",
        "call_start_time", "call_end_time", "call_status")
      val r = GoldAggregates.dailySummary(df, date).collect().head
      val bucketSum = r.getAs[Long]("completed_calls") +
        r.getAs[Long]("dropped_calls") + r.getAs[Long]("failed_calls")
      val nUpper = statuses.count(s => s == s.toUpperCase)
      assert(r.getAs[Long]("total_calls") === statuses.length)
      assert(bucketSum === nUpper, s"case $i: statuses=$statuses")
    }
  }

  test("withYearMonth derives processing-date partitions") {
    val r = GoldAggregates.withYearMonth(GoldAggregates.dailySummary(silver, date), date).collect().head
    assert(r.getAs[Int]("year") === 2026)
    assert(r.getAs[Int]("month") === 8)
  }
}
