package graft.sqlapi

import graft.lake.MergeTable
import java.util.concurrent.ConcurrentHashMap
import scala.jdk.CollectionConverters._

/** Process-wide name → [[MergeTable]] registry backing the injected SQL
  * parser ([[GraftSqlParser]]): once a table is registered here,
  * `spark.sql("DELETE FROM <name> WHERE …")`, `MERGE INTO`, `UPDATE`,
  * `VACUUM`, `OPTIMIZE`, `DESCRIBE HISTORY`, `SHOW PARTITIONS`, and
  * `SELECT … FROM <name> [VERSION AS OF n]` all work DIRECTLY through the
  * session's SQL entry point — the same integration shape Delta ships (its
  * DeltaCatalog + parser extension resolve `delta.` tables inside
  * spark.sql). MergeTables are paths, not catalog entries, so registration
  * is explicit; unregistered names pass through to Spark untouched, which
  * makes interception safe — the parser can never hijack a real catalog
  * table's statement.
  *
  * The map is process-wide (not per-session) because the parser is built
  * once per session from the same extensions instance; tests and the gate
  * queries use distinct names and unregister in `finally`.
  */
object LakeCatalog {

  private val tables = new ConcurrentHashMap[String, MergeTable]()

  def register(name: String, table: MergeTable): Unit = {
    require(name.matches("[A-Za-z_][A-Za-z0-9_.]*"),
      s"invalid lake table name '$name'")
    tables.put(name, table)
  }

  def unregister(name: String): Unit = tables.remove(name)

  /** Immutable snapshot for one statement's resolution. */
  def targets: Map[String, MergeTable] = tables.asScala.toMap

  /** Resolve a MULTI-PART name (`cat.ns….table`) against a configured
    * [[graft.sources.GraftCatalog]]: when the first part names a session
    * catalog whose implementation is GraftCatalog, the rest maps to
    * `warehouse/ns…/table`. This is what lets the lake statements Spark
    * has no native executor for (UPDATE, MERGE INTO, VACUUM, OPTIMIZE,
    * DESCRIBE HISTORY, …) address catalog tables with the same
    * multi-part names the native surface uses. Metadata-only: one conf
    * lookup + one directory probe, no Spark job.
    */
  def resolveViaCatalog(spark: org.apache.spark.sql.SparkSession,
                        name: String): Option[MergeTable] = {
    val parts = name.split('.')
    if (parts.length < 2) return None
    val impl =
      try spark.conf.getOption(s"spark.sql.catalog.${parts.head}")
      catch { case _: Exception => None }
    if (!impl.contains(classOf[graft.sources.GraftCatalog].getName)) return None
    spark.conf.getOption(s"spark.sql.catalog.${parts.head}.warehouse").flatMap { wh =>
      val p = java.nio.file.Paths.get(wh, parts.tail.toIndexedSeq: _*)
      if (java.nio.file.Files.isDirectory(p.resolve("_graft_log")))
        Some(MergeTable.open(p.toString))
      else None
    }
  }
}
