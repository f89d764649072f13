package graft.sqlapi

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.pipeline.CallCenterPipeline.LakePaths
import graft.pipeline.CallCenterPipeline

/** The reference's read-side API: the five Athena queries
  * (sql/athena_queries.sql:7-63) run verbatim through `spark.sql` over temp
  * views of the gold tables (the `callcenter_analytics.` catalog qualifier
  * maps to view registration — SURVEY.md §3.3).
  *
  * Athena's dialect in these queries is 100% ANSI-compatible with Spark SQL:
  * only SELECT / WHERE / GROUP BY / ORDER BY / LIMIT / ROUND / AVG appear.
  * Spark plans each ORDER BY+LIMIT as `TakeOrderedAndProject` — a true
  * distributed top-k, no full sort (SURVEY.md §2.7).
  */
object AthenaQueries {

  val queries: Map[String, String] = Map(
    // 1. Daily Call Summary (latest days first) — sql:7-16
    "daily_call_summary" ->
      """SELECT call_date, total_calls, completed_calls, dropped_calls,
        |       failed_calls, completion_rate
        |FROM gold_call_daily_summary
        |ORDER BY call_date DESC
        |LIMIT 10""".stripMargin,
    // 2. Agent Performance Overview — sql:20-30
    "agent_performance_overview" ->
      """SELECT agent_id, call_date, total_calls, completed_calls,
        |       dropped_calls, failed_calls, completion_rate
        |FROM gold_agent_performance
        |ORDER BY call_date DESC, agent_id
        |LIMIT 20""".stripMargin,
    // 3. Daily Call Duration Metrics — sql:34-41
    "daily_duration_metrics" ->
      """SELECT call_date, avg_call_duration_seconds,
        |       min_call_duration_seconds, max_call_duration_seconds
        |FROM gold_call_duration_metrics
        |ORDER BY call_date DESC
        |LIMIT 10""".stripMargin,
    // 4. Top Performing Agents (by completion rate) — sql:45-51
    "top_agents" ->
      """SELECT agent_id, AVG(completion_rate) AS avg_completion_rate
        |FROM gold_agent_performance
        |GROUP BY agent_id
        |ORDER BY avg_completion_rate DESC
        |LIMIT 5""".stripMargin,
    // 5. Days with High Call Failures — sql:55-63
    "high_failure_days" ->
      """SELECT call_date, failed_calls, total_calls,
        |       ROUND((failed_calls * 100.0) / total_calls, 2) AS failure_rate_pct
        |FROM gold_call_daily_summary
        |WHERE total_calls > 0
        |ORDER BY failure_rate_pct DESC
        |LIMIT 10""".stripMargin,
  )

  /** Register the three gold tables as temp views (Glue-catalog analog). */
  def registerViews(spark: SparkSession, p: LakePaths): Unit =
    CallCenterPipeline.goldTables(p).foreach { case (name, (table, _)) =>
      table.read(spark).createOrReplaceTempView(name)
    }

  def run(spark: SparkSession, name: String): DataFrame = spark.sql(queries(name))
}
