package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import graft.pipeline.{CallCenterPipeline, Fixture}
import graft.pipeline.CallCenterPipeline.LakePaths
import graft.sqlapi.AthenaQueries
import java.nio.file.{Files, Paths}
import java.time.LocalDate
import scala.jdk.CollectionConverters._

/** The reference's OWN surface, oracle-checked end-to-end: run the complete
  * call-center pipeline (CSV → validate/split → silver MERGE → gold MERGEs)
  * on the Fixture batches with a pinned processing date, then hash-check
  *  - cc1..cc5: each Athena query (sql/athena_queries.sql:7-63) over the
  *    resulting gold tables, and
  *  - cc6: the exception table (01_silver_delta_upsert.py:125-129) with its
  *    Reject_reason strings (validation quirks Q1–Q3) bit-for-bit.
  *
  * The DuckDB oracle re-expresses the ENTIRE pipeline in self-contained SQL:
  * the fixture rows appear as a VALUES relation in their post-CSV-parse form
  * (PERMISSIVE parse: non-numeric INT tokens → NULL — quirk Q1 setup), the
  * six DQ rules as CASE chains folded with null-skipping concat_ws (Q3), the
  * silver MERGE as keep-latest-batch row_number, gold as the conditional
  * status buckets (case-SENSITIVE — Q2) and HH:mm:ss durations via
  * try_strptime (unparseable "99:99:99" → NULL → dropped, Q4; midnight wrap
  * → negative → dropped, Q5; strptime's 1900 epoch base cancels in the
  * subtraction, matching Spark's 1970 base).
  *
  * The pipeline writes real MergeTable snapshots on disk once per JVM
  * (memoized); each cc query then reads the committed tables — so the merge
  * path, the atomic manifest swap, and the partitioned exception append are
  * all inside the checked surface.
  */
object PipelineQueries {

  val processingDate: LocalDate = LocalDate.of(2026, 8, 12)

  private def root = s"${Registry.scratchRoot}/cc_lake"
  private val lock = new Object
  @volatile private var ready = false

  /** Run both fixture batches through the full pipeline exactly once per
    * JVM; later calls (and bench re-iterations) only read the lake.
    */
  def ensurePipeline(spark: SparkSession): LakePaths = {
    val paths = LakePaths(root)
    if (!ready) lock.synchronized {
      if (!ready) {
        Registry.cleanDir(root)
        val csv1 = Fixture.writeCsv(s"$root/source", "batch1.csv", Fixture.initialBatch)
        CallCenterPipeline.run(spark, csv1, paths, processingDate)
        val csv2 = Fixture.writeCsv(s"$root/source", "batch2.csv", Fixture.redelivery)
        CallCenterPipeline.run(spark, csv2, paths, processingDate)
        ready = true
      }
    }
    paths
  }

  private def athena(name: String): (SparkSession, String) => DataFrame =
    (s, _) => {
      AthenaQueries.registerViews(s, ensurePipeline(s))
      AthenaQueries.run(s, name)
    }

  /** The fixture in post-CSV-parse form: "abc"→NULL (PERMISSIVE INT parse),
    * empty fields→NULL, "-7" parses to the INT -7 (quirk Q1 trigger).
    * `batch` tags the delivery so the MERGE is expressible as keep-latest.
    */
  private val fixtureCte: String =
    """WITH raw(call_id, caller_id, agent_id, call_start_time, call_end_time, call_status, batch) AS (
      |  VALUES
      |    (101, 5001, 11, '09:15:00', '09:20:30', 'COMPLETED', 1),
      |    (102, 5002, 12, '10:00:00', '10:01:00', 'dropped',   1),
      |    (103, 5003, 13, '23:58:00', '00:03:00', 'COMPLETED', 1),
      |    (104, 5004, 14, '99:99:99', '10:00:00', 'FAILED',    1),
      |    (105, NULL, 15, '09:00:00', '09:05:00', 'COMPLETED', 1),
      |    (106, NULL, 16, '09:00:00', '09:05:00', 'COMPLETED', 1),
      |    (-7,  5007, 17, '09:00:00', '09:05:00', 'COMPLETED', 1),
      |    (108, 5008, 18, '9:00:00',  '09:05:00', 'COMPLETED', 1),
      |    (109, 5009, 19, '09:00:00', '09:05:00', 'BUSY',      1),
      |    (110, 5010, NULL, 'bad', 'also-bad', NULL,           1),
      |    (101, 5001, 11, '09:15:00', '09:25:00', 'DROPPED',   2)),
      |validated AS (
      |  SELECT *, NULLIF(concat_ws(' | ',
      |    CASE WHEN call_id IS NULL THEN 'call_id must not be NULL'
      |         WHEN NOT regexp_matches(CAST(call_id AS VARCHAR), '^[0-9]+$') THEN 'call_id must be numeric' END,
      |    CASE WHEN caller_id IS NULL THEN 'caller_id must not be NULL'
      |         WHEN NOT regexp_matches(CAST(caller_id AS VARCHAR), '^[0-9]+$') THEN 'caller_id must be numeric' END,
      |    CASE WHEN agent_id IS NULL THEN 'agent_id must not be NULL'
      |         WHEN NOT regexp_matches(CAST(agent_id AS VARCHAR), '^[0-9]+$') THEN 'agent_id must be numeric' END,
      |    CASE WHEN call_start_time IS NULL THEN 'call_start_time must not be NULL'
      |         WHEN NOT regexp_matches(call_start_time, '^[0-9]{2}:[0-9]{2}:[0-9]{2}$') THEN 'invalid call_start_time' END,
      |    CASE WHEN call_end_time IS NULL THEN 'call_end_time must not be NULL'
      |         WHEN NOT regexp_matches(call_end_time, '^[0-9]{2}:[0-9]{2}:[0-9]{2}$') THEN 'invalid call_end_time' END,
      |    CASE WHEN call_status IS NULL THEN 'call_status must not be NULL'
      |         WHEN upper(call_status) NOT IN ('COMPLETED','DROPPED','FAILED') THEN 'invalid call_status values' END
      |  ), '') AS reject_reason FROM raw),
      |silver AS (
      |  SELECT call_id, caller_id, agent_id, call_start_time, call_end_time, call_status
      |  FROM (SELECT *, row_number() OVER (PARTITION BY call_id ORDER BY batch DESC) AS rn
      |        FROM validated WHERE reject_reason IS NULL)
      |  WHERE rn = 1),
      |durations AS (
      |  SELECT *, CAST(epoch(try_strptime(call_end_time, '%H:%M:%S')) AS BIGINT)
      |          - CAST(epoch(try_strptime(call_start_time, '%H:%M:%S')) AS BIGINT) AS duration_sec
      |  FROM silver),
      |gold_call_daily_summary AS (
      |  SELECT call_date, total_calls, completed_calls, dropped_calls, failed_calls,
      |         CASE WHEN total_calls > 0
      |              THEN round(CAST(completed_calls AS DOUBLE) / total_calls * 100, 2)
      |              ELSE 0.0 END AS completion_rate
      |  FROM (SELECT DATE '2026-08-12' AS call_date,
      |               count(*) AS total_calls,
      |               CAST(sum(CASE WHEN call_status = 'COMPLETED' THEN 1 ELSE 0 END) AS BIGINT) AS completed_calls,
      |               CAST(sum(CASE WHEN call_status = 'DROPPED' THEN 1 ELSE 0 END) AS BIGINT) AS dropped_calls,
      |               CAST(sum(CASE WHEN call_status = 'FAILED' THEN 1 ELSE 0 END) AS BIGINT) AS failed_calls
      |        FROM silver GROUP BY 1)),
      |gold_agent_performance AS (
      |  SELECT agent_id, call_date, total_calls, completed_calls, dropped_calls, failed_calls,
      |         CASE WHEN total_calls > 0
      |              THEN round(CAST(completed_calls AS DOUBLE) / total_calls * 100, 2)
      |              ELSE 0.0 END AS completion_rate
      |  FROM (SELECT agent_id, DATE '2026-08-12' AS call_date,
      |               count(*) AS total_calls,
      |               CAST(sum(CASE WHEN call_status = 'COMPLETED' THEN 1 ELSE 0 END) AS BIGINT) AS completed_calls,
      |               CAST(sum(CASE WHEN call_status = 'DROPPED' THEN 1 ELSE 0 END) AS BIGINT) AS dropped_calls,
      |               CAST(sum(CASE WHEN call_status = 'FAILED' THEN 1 ELSE 0 END) AS BIGINT) AS failed_calls
      |        FROM silver GROUP BY 1, 2)),
      |gold_call_duration_metrics AS (
      |  SELECT DATE '2026-08-12' AS call_date,
      |         round(avg(duration_sec), 2) AS avg_call_duration_seconds,
      |         min(duration_sec) AS min_call_duration_seconds,
      |         max(duration_sec) AS max_call_duration_seconds
      |  FROM durations WHERE duration_sec >= 0 GROUP BY 1)
      |""".stripMargin

  val all: Map[String, GraftQuery] = Map(

    "cc1_daily_summary" -> GraftQuery(
      athena("daily_call_summary"),
      Some(fixtureCte +
        """SELECT call_date, total_calls, completed_calls, dropped_calls,
          |       failed_calls, completion_rate
          |FROM gold_call_daily_summary
          |ORDER BY call_date DESC LIMIT 10""".stripMargin),
      "full pipeline + Athena query 1 (sql:7-16), hash-checked"),

    "cc2_agent_performance" -> GraftQuery(
      athena("agent_performance_overview"),
      Some(fixtureCte +
        """SELECT agent_id, call_date, total_calls, completed_calls,
          |       dropped_calls, failed_calls, completion_rate
          |FROM gold_agent_performance
          |ORDER BY call_date DESC, agent_id LIMIT 20""".stripMargin),
      "full pipeline + Athena query 2 (sql:20-30), hash-checked"),

    "cc3_duration_metrics" -> GraftQuery(
      athena("daily_duration_metrics"),
      Some(fixtureCte +
        """SELECT call_date, avg_call_duration_seconds,
          |       min_call_duration_seconds, max_call_duration_seconds
          |FROM gold_call_duration_metrics
          |ORDER BY call_date DESC LIMIT 10""".stripMargin),
      "full pipeline + Athena query 3 (sql:34-41): Q4/Q5 duration quirks"),

    "cc4_top_agents" -> GraftQuery(
      athena("top_agents"),
      Some(fixtureCte +
        """SELECT agent_id, AVG(completion_rate) AS avg_completion_rate
          |FROM gold_agent_performance
          |GROUP BY agent_id
          |ORDER BY avg_completion_rate DESC LIMIT 5""".stripMargin),
      "full pipeline + Athena query 4 (sql:45-51)"),

    "cc5_high_failure_days" -> GraftQuery(
      (s, _) => {
        // Spark's ROUND(decimal_expr, 2) stays DECIMAL, and decimal
        // stringification is engine/driver-dependent ('25.00' vs '25.0').
        // The Athena SQL text runs verbatim; the gate wrapper post-casts the
        // rate to DOUBLE — one rounded double has a single canonical
        // stringification everywhere, so the compare cannot be
        // formatting-sensitive. The oracle casts to DOUBLE on its side too.
        AthenaQueries.registerViews(s, ensurePipeline(s))
        AthenaQueries.run(s, "high_failure_days")
          .withColumn("failure_rate_pct", col("failure_rate_pct").cast("double"))
      },
      Some(fixtureCte +
        """SELECT call_date, failed_calls, total_calls,
          |       CAST(ROUND((failed_calls * 100.0) / total_calls, 2) AS DOUBLE) AS failure_rate_pct
          |FROM gold_call_daily_summary
          |WHERE total_calls > 0
          |ORDER BY failure_rate_pct DESC LIMIT 10""".stripMargin),
      "full pipeline + Athena query 5 (sql:55-63); rate post-cast to DOUBLE"),

    // The exception table: every rejected fixture row with its exact
    // " | "-joined Reject_reason (quirks Q1-Q3) + processing partitions.
    "cc6_exceptions" -> GraftQuery(
      (s, _) => {
        val p = ensurePipeline(s)
        s.read.parquet(p.exception)
          .select("call_id", "caller_id", "agent_id", "call_start_time",
            "call_end_time", "call_status", "Reject_reason", "year", "month")
          .orderBy(col("call_id"))
      },
      Some(fixtureCte +
        """SELECT call_id, caller_id, agent_id, call_start_time, call_end_time,
          |       call_status, reject_reason AS Reject_reason,
          |       2026 AS "year", 8 AS "month"
          |FROM validated WHERE reject_reason IS NOT NULL
          |ORDER BY call_id""".stripMargin),
      "exception parquet append: Reject_reason strings bit-for-bit"),
  )
}
