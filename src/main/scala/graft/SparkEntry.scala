package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.pipeline.{CallCenterPipeline, Fixture}
import graft.sqlapi.AthenaQueries
import graft.queries.Registry
import java.nio.file.{Files, Paths}
import java.time.LocalDate
import scala.jdk.CollectionConverters._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship: the full reference pipeline end-to-end — fixture CSV →
    * validate/split → silver MERGE (initial load + a re-delivery upsert) →
    * three gold MERGEs → Athena daily-summary query. Exercises every layer
    * and both MERGE paths (SURVEY.md §7.2).
    */
  def entry(spark: SparkSession): DataFrame = {
    val root = s"${Registry.scratchRoot}/entry_lake"
    val p = Paths.get(root)
    if (Files.exists(p))
      Files.walk(p).iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
    val paths = CallCenterPipeline.LakePaths(root)
    val date = LocalDate.of(2026, 8, 12) // injected processing date (determinism, SURVEY.md §7.5.2)
    val csv1 = Fixture.writeCsv(s"$root/source", "batch1.csv", Fixture.initialBatch)
    CallCenterPipeline.run(spark, csv1, paths, date)
    val csv2 = Fixture.writeCsv(s"$root/source", "batch2.csv", Fixture.redelivery)
    CallCenterPipeline.run(spark, csv2, paths, date)
    AthenaQueries.registerViews(spark, paths)
    AthenaQueries.run(spark, "daily_call_summary")
  }

  /** One entry per implemented operator from SURVEY.md §2 + extensions. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Registry.all.map { case (name, q) => name -> q.fn }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted only where the operator's values are
    * engine-specific by nature — the HLL estimate (q13) — which falls back
    * to the driver's rows-only check plus dedicated scalatest invariants.
    * The ANN family's oracles are DYNAMIC (`dynOracle`): Verify dumps
    * oracle_sql.json AFTER the queries run, so each ANN query stashes a
    * replay oracle built from its COMMITTED k-means models (centroid /
    * codebook literals) — DuckDB replays cell assignment, PQ encode, probe
    * ranking, ADC scoring, and the exact re-rank; only the Lloyd's fit
    * itself stays engine-side (graft.queries.AnnOracle).
    */
  def oracleSql: Map[String, String] =
    Registry.all.flatMap { case (name, q) =>
      q.dynOracle().orElse(q.oracle).map(name -> _) }
}
