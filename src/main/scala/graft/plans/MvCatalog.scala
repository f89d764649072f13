package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._

/** One aggregate column of a materialized-view definition.
  *
  * `func` ∈ {"sum", "count", "min", "max"}; `inputCol` is the base column
  * the aggregate reads (None for count(*)); `mvCol` names the stored
  * result column in the MV table.
  */
final case class MvAgg(func: String, inputCol: Option[String], mvCol: String)

/** A registered materialized view: a single-table GROUP BY aggregate over
  * a parquet base, stored at `mvPath`, valid for automatic query rewrite
  * while the base is byte-identical to the snapshot it was built from.
  *
  *  - `baseRootPaths`: the base relation's resolved root paths, captured
  *    at registration — [[MvRewrite]] matches scan nodes against these
  *    (string equality on resolved paths, never prefix heuristics);
  *  - `baseFingerprint`: a digest of the base directory's data-file
  *    listing (relative path, length, mtime) at MV build time. The
  *    rewrite consults it per query: ANY base mutation — append, delete,
  *    rewrite — changes the listing and silently disables the rewrite
  *    until [[MvRewrite.refresh]] rebuilds the view. Correctness never
  *    depends on the refresh cadence; staleness only costs performance.
  */
final case class MvDef(
    name: String,
    basePath: String,
    baseRootPaths: Set[String],
    groupCols: Seq[String],
    aggs: Seq[MvAgg],
    mvPath: String,
    baseFingerprint: String)

/** Session-global registry of materialized views consulted by
  * [[MvRewrite]]. Registration is driver-side metadata only — the
  * catalog never holds data, and an empty catalog makes the optimizer
  * rule a constant-time no-op (the common case: every query in a session
  * with no MVs pays one volatile read).
  */
object MvCatalog {

  private val defs = scala.collection.concurrent.TrieMap.empty[String, MvDef]

  def isEmpty: Boolean = defs.isEmpty
  def all: Seq[MvDef] = defs.values.toSeq
  def get(name: String): Option[MvDef] = defs.get(name)
  def unregister(name: String): Unit = defs.remove(name)
  def clear(): Unit = defs.clear()

  /** Record a definition whose MV table ALREADY holds the aggregate of
    * the CURRENT base snapshot (the contract [[MvRewrite.buildAndRegister]]
    * guarantees by construction — prefer it).
    */
  def register(spark: SparkSession, d: MvDef): MvDef = {
    require(d.aggs.forall(a => Set("sum", "count", "min", "max").contains(a.func)),
      s"unsupported MV aggregate in ${d.aggs}")
    require(d.aggs.forall(a => (a.func == "count") == a.inputCol.isEmpty),
      "count takes no input column; sum/min/max require one")
    defs.put(d.name, d)
    d
  }

  /** Resolved root paths of every file-source leaf under `plan`. */
  def rootPathsOf(plan: LogicalPlan): Set[String] =
    plan.collectLeaves().flatMap {
      case LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
        fs.location.rootPaths.map(_.toString)
      case _ => Nil
    }.toSet

  /** Digest of a directory's data-file listing: relative path + length +
    * mtime of every non-hidden file, sorted. Metadata-only (no data
    * reads) — one `Files.walk` per consult, the price of a correct
    * staleness answer without a commit log on plain parquet directories.
    * Bases that ARE lake tables can use their version instead; plain
    * directories get this.
    */
  def fingerprint(path: String): String = {
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    val root = Paths.get(path)
    if (!Files.exists(root)) return "absent"
    val parts = Files.walk(root).iterator().asScala
      .filter(p => Files.isRegularFile(p))
      .map(p => root.relativize(p).toString)
      .filterNot(n => n.startsWith(".") || n.startsWith("_"))
      .toSeq.sorted
      .map { n =>
        val p = root.resolve(n)
        s"$n:${Files.size(p)}:${Files.getLastModifiedTime(p).toMillis}"
      }
    java.security.MessageDigest.getInstance("MD5")
      .digest(parts.mkString("\n").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
  }

  /** Is the MV still byte-exact — i.e. has the base not changed since
    * the build? Consulted once per candidate Aggregate by [[MvRewrite]],
    * AFTER the structural match (listing a directory costs more than
    * pattern-matching a plan).
    */
  def isFresh(d: MvDef): Boolean = fingerprint(d.basePath) == d.baseFingerprint

  /** Build the MV table from the definition and register it — the only
    * path that guarantees table-matches-definition. Returns the def.
    */
  private[plans] def build(spark: SparkSession, name: String, basePath: String,
                           groupCols: Seq[String], aggs: Seq[MvAgg],
                           mvPath: String): MvDef = {
    val base = spark.read.parquet(basePath)
    val aggCols = aggs.map {
      case MvAgg("sum", Some(c), m)   => sum(col(c)).as(m)
      case MvAgg("count", None, m)    => count(lit(1)).as(m)
      case MvAgg("min", Some(c), m)   => min(col(c)).as(m)
      case MvAgg("max", Some(c), m)   => max(col(c)).as(m)
      case a => throw new IllegalArgumentException(s"unsupported MV aggregate $a")
    }
    // fingerprint BEFORE the aggregate runs: if a writer races the build
    // and lands after this listing, the fingerprint mismatches and the
    // rewrite correctly never fires (fail-stale, never fail-wrong)
    val fp = fingerprint(basePath)
    val rootPaths = rootPathsOf(base.queryExecution.analyzed)
    base.groupBy(groupCols.map(col): _*)
      .agg(aggCols.head, aggCols.tail: _*)
      .write.mode("overwrite").parquet(mvPath)
    register(spark, MvDef(name, basePath, rootPaths, groupCols, aggs, mvPath, fp))
  }
}
