package graft.sqlapi

import graft.SparkSpec

/** Fidelity of the Athena surface: the SQL graft executes IS the reference
  * file's literal text, and the `callcenter_analytics.` qualifier resolves
  * on a graft session.
  */
class AthenaQueriesSpec extends SparkSpec {

  /** Statements of sql/athena_queries.sql in file order: comment lines
    * dropped, split on `;`, trimmed.
    */
  private def referenceStatements: Seq[String] = {
    val text = java.nio.file.Files.readString(
      java.nio.file.Paths.get("/root/reference/sql/athena_queries.sql"))
    text.linesIterator
      .filterNot(_.trim.startsWith("--"))
      .mkString("\n")
      .split(";")
      .map(_.trim)
      .filter(_.nonEmpty)
      .toSeq
  }

  private val fileOrder = Seq(
    "daily_call_summary", "agent_performance_overview",
    "daily_duration_metrics", "top_agents", "high_failure_days")

  test("stored statements are the reference file's text, verbatim") {
    val ref = referenceStatements
    assert(ref.size == 5)
    fileOrder.zip(ref).foreach { case (name, expected) =>
      assert(AthenaQueries.queries(name) == expected,
        s"$name diverges from the reference file text")
    }
  }

  test("callcenter_analytics.<table> resolves on a graft session") {
    assert(spark.conf.get("spark.sql.globalTempDatabase")
      == AthenaQueries.Database)
    import spark.implicits._
    Seq((java.sql.Date.valueOf("2026-08-12"), 4L, 1L, 1L, 1L, 25.0))
      .toDF("call_date", "total_calls", "completed_calls", "dropped_calls",
        "failed_calls", "completion_rate")
      .createOrReplaceGlobalTempView("gold_call_daily_summary")
    Seq((11, java.sql.Date.valueOf("2026-08-12"), 2L, 1L, 0L, 1L, 50.0))
      .toDF("agent_id", "call_date", "total_calls", "completed_calls",
        "dropped_calls", "failed_calls", "completion_rate")
      .createOrReplaceGlobalTempView("gold_agent_performance")
    Seq((java.sql.Date.valueOf("2026-08-12"), 120.5, 30L, 300L))
      .toDF("call_date", "avg_call_duration_seconds",
        "min_call_duration_seconds", "max_call_duration_seconds")
      .createOrReplaceGlobalTempView("gold_call_duration_metrics")

    fileOrder.foreach { name =>
      assert(AthenaQueries.run(spark, name).collect().nonEmpty,
        s"$name returned no rows over the registered views")
    }
  }
}
