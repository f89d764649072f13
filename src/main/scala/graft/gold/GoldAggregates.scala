package graft.gold

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Gold-layer aggregation builders (reference glue_jobs/02_gold_analytics.py).
  *
  * The signature operator is the conditional status-bucket aggregation — a
  * manual PIVOT via `sum(when(status == 'X', 1).otherwise(0))`
  * (02:51-111). Kept in that exact form for oracle parity (SURVEY.md §2.5
  * A2: `count_if` has subtly different NULL semantics — don't).
  *
  * All of this is hash aggregation with map-side partial combine; at scale
  * the only shuffle is on the grouping keys.
  */
object GoldAggregates {

  /** One `sum(when(col === value, 1).otherwise(0))` bucket per domain value. */
  def statusBuckets(statusCol: Column, buckets: Seq[(String, String)]): Seq[Column] =
    buckets.map { case (value, alias) =>
      sum(when(statusCol === value, 1).otherwise(0)).as(alias)
    }

  private val callBuckets = Seq(
    "COMPLETED" -> "completed_calls",
    "DROPPED"   -> "dropped_calls",
    "FAILED"    -> "failed_calls",
  )

  /** `completion_rate` derivation (02:77-79,109-111). The `total > 0` guard
    * is vacuous after `count(*)` (every group has ≥1 row) but kept verbatim.
    */
  def withCompletionRate(df: DataFrame): DataFrame =
    df.withColumn("completion_rate",
      when(col("total_calls") > 0,
        round(col("completed_calls") / col("total_calls") * 100, 2)).otherwise(0.0))

  /** gold_call_daily_summary (02:51-79): grain call_date. */
  def dailySummary(silver: DataFrame, callDate: Column): DataFrame = {
    val df1 = silver
      .select("call_id", "call_start_time", "call_end_time", "call_status")
      .withColumn("call_date", callDate)
    withCompletionRate(
      df1.groupBy("call_date")
        .agg(count("*").as("total_calls"),
             statusBuckets(col("call_status"), callBuckets): _*))
  }

  /** gold_agent_performance (02:83-111): grain (agent_id, call_date). */
  def agentPerformance(silver: DataFrame, callDate: Column): DataFrame = {
    val df2 = silver
      .select("call_id", "agent_id", "call_start_time", "call_end_time", "call_status")
      .withColumn("call_date", callDate)
    withCompletionRate(
      df2.groupBy("agent_id", "call_date")
        .agg(count("*").as("total_calls"),
             statusBuckets(col("call_status"), callBuckets): _*))
  }

  /** gold_call_duration_metrics (02:116-129): durations from `HH:mm:ss`
    * strings via `unix_timestamp` subtraction. Quirks preserved: a
    * pattern-valid but unparseable time ("99:99:99") yields NULL duration,
    * and a midnight-crossing call yields a negative one — both are dropped
    * from duration metrics ONLY by the `>= 0` filter (Q4/Q5, 02:40-43).
    *
    * The reference runs `unix_timestamp(col, "HH:mm:ss")` on Spark 3 with
    * ANSI off, where an unparseable time returns NULL. Spark 4 defaults to
    * ANSI mode (it would throw), so the same semantics are expressed via
    * `try_to_timestamp` — NULL on parse failure, identical epoch values.
    */
  def durationMetrics(silver: DataFrame, callDate: Column): DataFrame = {
    val df3 = silver
      .select("call_id", "call_start_time", "call_end_time", "call_status")
      .withColumn("call_date", callDate)
      .withColumn("duration_sec",
        unix_timestamp(try_to_timestamp(col("call_end_time"), lit("HH:mm:ss"))) -
          unix_timestamp(try_to_timestamp(col("call_start_time"), lit("HH:mm:ss"))))
      .filter(col("duration_sec") >= 0)
    df3.groupBy("call_date").agg(
      round(avg("duration_sec"), 2).as("avg_call_duration_seconds"),
      min("duration_sec").as("min_call_duration_seconds"),
      max("duration_sec").as("max_call_duration_seconds"))
  }

  /** Partition columns derived from the processing date (02:139-142 etc.). */
  def withYearMonth(df: DataFrame, processingDate: Column): DataFrame =
    df.withColumns(Map("year" -> year(processingDate), "month" -> month(processingDate)))
}
