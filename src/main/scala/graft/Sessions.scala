package graft

import org.apache.spark.sql.SparkSession

/** Shared session tuning for Verify / Bench / tests. */
object Sessions {

  /** Apply graft's session config to a builder. `cpus` drives both
    * parallelism and shuffle partitioning (local mode: partitions = cores,
    * never the 200 default).
    */
  def builder(cpus: String): SparkSession.Builder =
    SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      // NOTE (measured, r15): spark.sql.optimizer.canChangeCachedPlanOutputPartitioning=true
      // was tried to get AQE coalescing/broadcast on persist() materializations —
      // it cut task counts 3× but made the cache BUILDS themselves ~4× slower
      // (st26 qual.count 2.1 s → 9 s), net-negative; left at the default.
      // Write-commit hygiene for the many small maintained-state commits
      // (guide §6): v2 renames task output directly at task commit (v1 adds
      // a serial job-commit rename pass per write), and the _SUCCESS marker
      // is pure overhead for MergeTable data dirs (the _graft_log commit is
      // the real publish; readers never look at _SUCCESS)
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
      .config("spark.hadoop.mapreduce.fileoutputcommitter.marksuccessfuljobs", "false")
      // Status-store retention trimmed (UI is disabled anyway): the
      // defaults retain 1 000 jobs/stages and 1 000 SQL executions WITH
      // full plan graphs per JVM — a bench process runs 255 queries ×
      // thousands of micro-jobs through one context, and the accumulated
      // tracking measurably ages the JVM (profiler iterations slowed
      // monotonically within one process). Pure observability trim;
      // nothing reads these stores headless.
      .config("spark.ui.retainedJobs", "200")
      .config("spark.ui.retainedStages", "200")
      .config("spark.ui.retainedTasks", "10000")
      .config("spark.sql.ui.retainedExecutions", "50")
      // engine extensions: float_dot registration + the DotProductRewrite
      // optimizer rule (graft.functions.GraftExtensions)
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      // the reference's Athena SQL addresses `callcenter_analytics.<table>`
      // (sql/athena_queries.sql:3): naming the global-temp database after it
      // lets that text run verbatim over global temp views of the gold
      // snapshots — catalog-qualified reads with zero data copies
      // (graft.sqlapi.AthenaQueries)
      .config("spark.sql.globalTempDatabase", "callcenter_analytics")
      // testdata events.ts is TIMESTAMP(NANOS): read as BIGINT nanos
      // (normalized to micros in Registry.t, matching DuckDB's truncation)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // never write deprecated INT96 timestamps
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      // managed tables (bucketed-join path) land in target/, per-JVM —
      // never in the repo root's default ./spark-warehouse
      .config("spark.sql.warehouse.dir",
        s"${sys.env.getOrElse("GRAFT_TMP", "/root/repo/target/graft-tmp")}/warehouse_p${ProcessHandle.current().pid()}")
}
