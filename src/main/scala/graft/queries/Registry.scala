package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr

/** One verifiable query: a Spark implementation plus (when SQL-expressible)
  * an equivalent DuckDB oracle SQL over the same parquet tables. Column
  * names/aliases MUST match between the two — the driver's compare sorts
  * columns by name before hashing (builder contract).
  *
  * Determinism rules used throughout (SURVEY.md §5):
  *  - doubles produced by a SINGLE IEEE op (one division/addition) are
  *    bit-exact across engines; multi-term double sums are rounded to 2dp;
  *  - every LIMIT query totally orders its rows (unique tiebreaker);
  *  - integer-valued doubles (l_quantity) sum exactly — safe unrounded.
  */
final case class GraftQuery(
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    doc: String = "",
    dynOracle: () => Option[String] = () => None)

object Registry {
  /** `<sfDir>/<name>.parquet` reader used by every query.
    *
    * `events.ts` normalization — the physical parquet type has varied
    * across driver-generated testdata generations, so BOTH are handled:
    *  - TIMESTAMP(NANOS): Spark's vectorized reader rejects it; Sessions
    *    set `spark.sql.legacy.parquet.nanosAsLong=true`, nanos arrive as
    *    BIGINT and are truncated to micros here — exactly what DuckDB does
    *    (TIMESTAMP_NS → TIMESTAMP);
    *  - TIMESTAMP(MICROS, isAdjustedToUTC=false): arrives as
    *    TIMESTAMP_NTZ; cast to session-time TIMESTAMP (sessions pin
    *    spark.sql.session.timeZone=UTC), which reproduces the same
    *    instants DuckDB reads (its naive TIMESTAMP compared under
    *    TimeZone=UTC).
    * Either way every query downstream sees one type: TIMESTAMP.
    */
  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    val df = spark.read.parquet(s"$dir/$name.parquet")
    df.schema.fields.find(_.name == "ts").map(_.dataType) match {
      case Some(LongType) => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case Some(TimestampNTZType) => df.withColumn("ts", expr("cast(ts as timestamp)"))
      case _ => df
    }
  }

  /** Scratch space for queries that exercise on-disk tables (MergeTable).
    * Kept inside the repo's target dir — never outside the workspace.
    * Suffixed with the JVM's pid: Verify / Bench / test JVMs must never
    * share mutable lake state (a concurrent run rewriting d0 while another
    * JVM holds a plan over the old file listing fails the read).
    */
  val scratchRoot: String =
    sys.env.getOrElse("GRAFT_TMP", "/root/repo/target/graft-tmp") +
      s"/p${ProcessHandle.current().pid()}"

  /** Collision-free identifier fragment from an sf dir path. */
  def sanitize(dir: String): String = dir.replaceAll("[^A-Za-z0-9]+", "_")

  /** Recursively delete a scratch path if present — THE shared helper for
    * every query that stages an on-disk table (one place to harden).
    */
  def cleanDir(path: String): Unit = {
    import java.nio.file._
    import scala.jdk.CollectionConverters._
    val p = Paths.get(path)
    if (Files.exists(p))
      Files.walk(p).iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
  }

  /** Remove sibling per-PID scratch roots untouched for 2h+ — dead JVMs'
    * lakes/warehouses otherwise accrete across driver rounds. Never touches
    * the live (current-PID) root or anything recently modified (a
    * concurrent run).
    */
  def cleanStaleScratch(): Unit = {
    import java.nio.file._
    import scala.jdk.CollectionConverters._
    val parent = Paths.get(scratchRoot).getParent
    if (parent == null || !Files.exists(parent)) return
    val cutoff = System.currentTimeMillis() - 2L * 3600 * 1000
    val self = Paths.get(scratchRoot).getFileName.toString
    // Staleness = newest mtime anywhere in the tree, not the root's: the
    // root dir's mtime only changes when direct children are added, so a
    // long-lived JVM writing inside subdirs created at startup would look
    // stale by the root alone and get its live scratch deleted mid-run.
    def newestMtime(p: Path): Long =
      try Files.walk(p).iterator().asScala
        .map(f => Files.getLastModifiedTime(f).toMillis).max
      catch { case _: Exception => Long.MaxValue } // unreadable ⇒ assume live
    Files.list(parent).iterator().asScala
      .filter(p => Files.isDirectory(p) && p.getFileName.toString.startsWith("p")
        && p.getFileName.toString != self
        && newestMtime(p) < cutoff)
      .foreach { p =>
        try Files.walk(p).iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
        catch { case _: java.io.IOException => () } // a racer won; harmless
      }
  }

  def all: Map[String, GraftQuery] =
    CoreQueries.all ++ LakeQueries.all ++ EventQueries.all ++
      TextQueries.all ++ SimilarityQueries.all ++ DedupQueries.all ++
      MultimodalQueries.all ++ PipelineQueries.all ++ StreamQueries.all ++
      FormatQueries.all
}
