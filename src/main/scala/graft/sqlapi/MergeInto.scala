package graft.sqlapi

import org.apache.spark.sql.SparkSession
import graft.lake.MergeTable

/** SQL-level twin of the reference's Delta MERGE call-sites
  * (glue_jobs/01_silver_delta_upsert.py:103-112:
  * `merge(...).whenMatchedUpdateAll().whenNotMatchedInsertAll().execute()`),
  * so the "Delta Lake + Spark SQL" statement shape
  * {{{
  *   MERGE INTO tgt [AS t] USING src [AS s]
  *   ON t.k1 = s.k1 [AND t.k2 = s.k2 ...]
  *   WHEN MATCHED THEN UPDATE SET *
  *   WHEN NOT MATCHED THEN INSERT *
  *   [WHEN NOT MATCHED BY SOURCE THEN DELETE]
  * }}}
  * runs over [[MergeTable]]s. Scope is the update-all/insert-all upsert
  * the reference uses, plus Delta's full-sync clause (`NOT MATCHED BY
  * SOURCE THEN DELETE` → `merge(deleteNotMatchedBySource = true)`) —
  * richer clauses (conditional updates, column lists) fail loudly rather
  * than half-parsing.
  *
  * The target name resolves through a caller-supplied registry (MergeTables
  * are paths, not catalog entries); the source name resolves through the
  * session catalog (`spark.table`), so any temp view / registered table
  * works. The ON clause must be a conjunction of `alias.col = alias.col`
  * equalities pairing the SAME column name on both sides — Delta-style
  * equi-key merge, which is what MergeTable implements.
  */
object MergeInto {

  final case class Statement(target: String, targetAlias: String,
                             source: String, sourceAlias: String,
                             keys: Seq[String], syncDelete: Boolean = false)

  private val Shape =
    """(?is)^\s*MERGE\s+INTO\s+([\w.]+)(?:\s+AS\s+(\w+)|\s+(\w+))?\s+USING\s+([\w.]+)(?:\s+AS\s+(\w+)|\s+(\w+))?\s+ON\s+(.+?)\s+WHEN\s+MATCHED\s+THEN\s+UPDATE\s+SET\s+\*\s+WHEN\s+NOT\s+MATCHED\s+THEN\s+INSERT\s+\*(\s+WHEN\s+NOT\s+MATCHED\s+BY\s+SOURCE\s+THEN\s+DELETE)?\s*;?\s*$""".r

  private val Equality = """(?s)^\s*(\w+)\.(\w+)\s*=\s*(\w+)\.(\w+)\s*$""".r

  /** Parse (without executing); throws IllegalArgumentException with a
    * pointed message on anything outside the supported shape.
    */
  def parse(sql: String): Statement = sql match {
    case Shape(tgt, tAs, tBare, src, sAs, sBare, cond, syncDel) =>
      val tAlias = Option(tAs).orElse(Option(tBare)).getOrElse(tgt.split('.').last)
      val sAlias = Option(sAs).orElse(Option(sBare)).getOrElse(src.split('.').last)
      require(tAlias.toLowerCase != sAlias.toLowerCase,
        s"target and source aliases collide ('$tAlias') — alias one side")
      val keys = cond.split("(?i)\\s+AND\\s+").toSeq.map {
        case Equality(a1, c1, a2, c2) =>
          val byAlias = Map(a1.toLowerCase -> c1, a2.toLowerCase -> c2)
          val (tc, sc) = (byAlias.get(tAlias.toLowerCase), byAlias.get(sAlias.toLowerCase))
          require(tc.isDefined && sc.isDefined,
            s"ON term '$a1.$c1 = $a2.$c2' must pair the target alias '$tAlias' with the source alias '$sAlias'")
          require(tc.get.toLowerCase == sc.get.toLowerCase,
            s"ON term pairs different columns ('${tc.get}' vs '${sc.get}') — MergeTable merges on same-named equi-keys")
          tc.get
        case other =>
          throw new IllegalArgumentException(
            s"unsupported ON term '${other.trim}': only conjunctions of alias.col = alias.col equalities are supported")
      }
      Statement(tgt, tAlias, src, sAlias, keys, syncDelete = syncDel != null)
    case _ =>
      throw new IllegalArgumentException(
        "unsupported MERGE statement — supported shape is: MERGE INTO t USING s ON t.k = s.k " +
          "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *")
  }

  /** Target table name if `sql` is a supported MERGE INTO statement — a
    * cheap probe for the injected parser (never throws, never executes).
    */
  private[sqlapi] def targetOf(sql: String): Option[String] =
    if (sql.matches("(?is)^\\s*MERGE\\s+INTO\\b.*"))
      scala.util.Try(parse(sql)).toOption.map(_.target)
    else None

  /** Execute `sql` — target resolved in `targets`, source in the session
    * catalog. All of [[MergeTable.merge]]'s semantics apply (file-pruned
    * rewrite, duplicate-source rejection, atomic commit).
    */
  def run(spark: SparkSession, sql: String,
          targets: Map[String, MergeTable],
          keysDeterminePartitions: Boolean = false): Unit = {
    val st = parse(sql)
    val table = targets.getOrElse(st.target,
      throw new IllegalArgumentException(
        s"unknown MERGE target '${st.target}' — registered targets: ${targets.keys.toSeq.sorted.mkString(", ")}"))
    table.merge(spark, spark.table(st.source), st.keys,
      keysDeterminePartitions = keysDeterminePartitions,
      deleteNotMatchedBySource = st.syncDelete)
  }
}
