package graft.sqlapi

import org.apache.spark.sql.SparkSession
import graft.lake.MergeTable
import graft.lake.MergeTable.{BySourceDelete, BySourceUpdate, MatchedDelete,
  MatchedUpdate, MergeClause, NotMatchedInsert}

/** SQL-level twin of the reference's Delta MERGE call-sites
  * (glue_jobs/01_silver_delta_upsert.py:103-112:
  * `merge(...).whenMatchedUpdateAll().whenNotMatchedInsertAll().execute()`),
  * extended to Delta's FULL conditional-clause grammar:
  * {{{
  *   MERGE INTO tgt [AS t] USING src [AS s]
  *   ON t.k1 = s.k1 [AND t.k2 = s.k2 ...]
  *   WHEN MATCHED [AND cond] THEN UPDATE SET col = expr, … | UPDATE SET * | DELETE
  *   WHEN NOT MATCHED [AND cond] THEN INSERT (cols) VALUES (exprs) | INSERT *
  *   WHEN NOT MATCHED BY SOURCE [AND cond] THEN UPDATE SET … | DELETE
  * }}}
  * The exact update-all/insert-all(+sync-delete) shape dispatches to the
  * file-pruned fast path [[MergeTable.merge]]; anything richer runs
  * through [[MergeTable.mergeClauses]] with the statement's aliases, so
  * clause conditions like `s.value > t.value` resolve naturally.
  * Unsupported syntax fails loudly rather than half-parsing.
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
                             keys: Seq[String], clauses: Seq[MergeClause],
                             schemaEvolution: Boolean = false) {
    /** True iff this is exactly the reference's update-all/insert-all
      * upsert (with or without an unconditional full-sync delete) — the
      * shape [[MergeTable.merge]] runs file-pruned in one pass.
      */
    def isSimpleUpsert: Boolean = clauses match {
      case Seq(MatchedUpdate(None, Seq()), NotMatchedInsert(None, Seq())) => true
      case Seq(MatchedUpdate(None, Seq()), NotMatchedInsert(None, Seq()),
               BySourceDelete(None)) => true
      case _ => false
    }
  }

  // Delta's `MERGE WITH SCHEMA EVOLUTION INTO …` — the clause rides
  // between MERGE and INTO (Delta's grammar position) and turns on the
  // API's mergeSchema (target schema becomes target ∪ source)
  private val Header =
    """(?is)^\s*MERGE\s+(WITH\s+SCHEMA\s+EVOLUTION\s+)?INTO\s+([\w.]+)(?:\s+AS\s+(\w+)|\s+(\w+))?\s+USING\s+([\w.]+)(?:\s+AS\s+(\w+)|\s+(\w+))?\s+ON\s+(.+)$""".r

  private val Equality = """(?s)^\s*(\w+)\.(\w+)\s*=\s*(\w+)\.(\w+)\s*$""".r

  private val MatchedUpdateC =
    """(?is)^WHEN\s+MATCHED\s+(?:AND\s+(.+?)\s+)?THEN\s+UPDATE\s+SET\s+(.+?)\s*;?\s*$""".r
  private val MatchedDeleteC =
    """(?is)^WHEN\s+MATCHED\s+(?:AND\s+(.+?)\s+)?THEN\s+DELETE\s*;?\s*$""".r
  private val BySourceUpdateC =
    """(?is)^WHEN\s+NOT\s+MATCHED\s+BY\s+SOURCE\s+(?:AND\s+(.+?)\s+)?THEN\s+UPDATE\s+SET\s+(.+?)\s*;?\s*$""".r
  private val BySourceDeleteC =
    """(?is)^WHEN\s+NOT\s+MATCHED\s+BY\s+SOURCE\s+(?:AND\s+(.+?)\s+)?THEN\s+DELETE\s*;?\s*$""".r
  private val InsertStarC =
    """(?is)^WHEN\s+NOT\s+MATCHED\s+(?:AND\s+(.+?)\s+)?THEN\s+INSERT\s+\*\s*;?\s*$""".r
  private val InsertColsC =
    """(?is)^WHEN\s+NOT\s+MATCHED\s+(?:AND\s+(.+?)\s+)?THEN\s+INSERT\s*\(([^)]*)\)\s*VALUES\s*\((.+)\)\s*;?\s*$""".r

  /** Split `rest` (everything after `ON`) into the ON condition and the
    * WHEN-clause texts. Boundaries are occurrences of `WHEN` followed by
    * `MATCHED` / `NOT MATCHED` at paren depth 0 outside string literals —
    * a `CASE WHEN` inside an assignment expression never splits, because
    * its `WHEN` is not followed by the MATCHED keyword.
    */
  private def splitClauses(rest: String): (String, Seq[String]) = {
    val boundary = """(?is)^WHEN\s+(NOT\s+)?MATCHED\b""".r
    val idxs = Seq.newBuilder[Int]
    var depth = 0
    var inStr: Option[Char] = None
    var i = 0
    while (i < rest.length) {
      val ch = rest.charAt(i)
      inStr match {
        case Some(q) => if (ch == q) inStr = None
        case None => ch match {
          case '\'' | '"' => inStr = Some(ch)
          case '(' => depth += 1
          case ')' => depth -= 1
          case 'W' | 'w' if depth == 0 &&
              (i == 0 || rest.charAt(i - 1).isWhitespace) &&
              boundary.findPrefixOf(rest.substring(i)).isDefined =>
            idxs += i
          case _ =>
        }
      }
      i += 1
    }
    val cuts = idxs.result()
    require(cuts.nonEmpty,
      "MERGE INTO needs at least one WHEN clause after the ON condition")
    val on = rest.substring(0, cuts.head).trim
    val texts = cuts.zipAll(cuts.tail.map(Some(_)), -1, None).map {
      case (from, Some(to)) => rest.substring(from, to).trim
      case (from, None)     => rest.substring(from).trim
    }
    (on, texts)
  }

  /** Parse `col = expr` assignments (top-level commas only); a column may
    * be qualified with the target alias, which is stripped after checking
    * it IS the target's — assigning through the source alias is an error.
    */
  private def parseAssignments(sets: String, targetAlias: String): Seq[(String, String)] =
    LakeSql.splitTopLevel(sets).map { a =>
      val i = a.indexOf('=')
      require(i > 0, s"unsupported SET assignment '${a.trim}': expected col = expr")
      val raw = a.take(i).trim
      val colName = raw.split('.') match {
        case Array(c)    => c
        case Array(q, c) =>
          require(q.equalsIgnoreCase(targetAlias),
            s"SET target '$raw' must be a target column ('$targetAlias.$c' or bare '$c')")
          c
        case _ => throw new IllegalArgumentException(
          s"unsupported SET target '$raw': must be [targetAlias.]column")
      }
      require(colName.matches("\\w+"),
        s"unsupported SET target '$colName': must be a plain column name")
      colName -> a.drop(i + 1).trim
    }

  private def parseClause(text: String, targetAlias: String): MergeClause = text match {
    case BySourceUpdateC(cond, sets) =>
      BySourceUpdate(Option(cond).map(_.trim), parseAssignments(sets, targetAlias))
    case BySourceDeleteC(cond) => BySourceDelete(Option(cond).map(_.trim))
    case MatchedUpdateC(cond, sets) =>
      val s = sets.trim
      if (s == "*") MatchedUpdate(Option(cond).map(_.trim), Nil)
      else MatchedUpdate(Option(cond).map(_.trim), parseAssignments(s, targetAlias))
    case MatchedDeleteC(cond) => MatchedDelete(Option(cond).map(_.trim))
    case InsertStarC(cond)    => NotMatchedInsert(Option(cond).map(_.trim), Nil)
    case InsertColsC(cond, cols, vals) =>
      val cs = cols.split(',').toSeq.map { c =>
        val t = c.trim
        require(t.matches("\\w+"), s"INSERT column '$t' must be a plain column name")
        t
      }
      val vs = LakeSql.splitTopLevel(vals).map(_.trim)
      require(cs.length == vs.length,
        s"INSERT column/value count mismatch: ${cs.length} columns, ${vs.length} values")
      NotMatchedInsert(Option(cond).map(_.trim), cs.zip(vs))
    case other => throw new IllegalArgumentException(
      s"unsupported MERGE clause '${other.take(80)}…' — supported: WHEN MATCHED [AND c] THEN " +
        "UPDATE SET …|DELETE, WHEN NOT MATCHED [AND c] THEN INSERT …, " +
        "WHEN NOT MATCHED BY SOURCE [AND c] THEN UPDATE SET …|DELETE")
  }

  /** Parse (without executing); throws IllegalArgumentException with a
    * pointed message on anything outside the supported shape.
    */
  def parse(sql: String): Statement = sql match {
    case Header(evo, tgt, tAs, tBare, src, sAs, sBare, rest) =>
      val tAlias = Option(tAs).orElse(Option(tBare)).getOrElse(tgt.split('.').last)
      val sAlias = Option(sAs).orElse(Option(sBare)).getOrElse(src.split('.').last)
      require(tAlias.toLowerCase != sAlias.toLowerCase,
        s"target and source aliases collide ('$tAlias') — alias one side")
      val (cond, clauseTexts) = splitClauses(rest)
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
      Statement(tgt, tAlias, src, sAlias, keys,
        clauseTexts.map(parseClause(_, tAlias)), schemaEvolution = evo != null)
    case _ =>
      throw new IllegalArgumentException(
        "unsupported MERGE statement — expected: MERGE INTO t USING s ON t.k = s.k " +
          "followed by WHEN clauses")
  }

  /** Target table name if `sql` is a supported MERGE INTO statement — a
    * cheap probe for the injected parser (never throws, never executes).
    */
  private[sqlapi] def targetOf(sql: String): Option[String] =
    if (sql.matches("(?is)^\\s*MERGE\\s+(WITH\\s+SCHEMA\\s+EVOLUTION\\s+)?INTO\\b.*"))
      scala.util.Try(parse(sql)).toOption.map(_.target)
    else None

  /** Execute `sql` — target resolved in `targets`, source in the session
    * catalog. The plain upsert shape takes [[MergeTable.merge]]'s pruned
    * fast path; conditional clauses run through
    * [[MergeTable.mergeClauses]]. All commit semantics are shared
    * (file-pruned rewrite, duplicate-source rejection, atomic commit).
    */
  def run(spark: SparkSession, sql: String,
          targets: Map[String, MergeTable],
          keysDeterminePartitions: Boolean = false): Unit = {
    val st = parse(sql)
    val table = targets.getOrElse(st.target,
      LakeCatalog.resolveViaCatalog(spark, st.target)
        .getOrElse(throw new IllegalArgumentException(
          s"unknown MERGE target '${st.target}' — registered targets: " +
            targets.keys.toSeq.sorted.mkString(", "))))
    val fullSync = st.clauses.exists(_.isInstanceOf[BySourceDelete])
    // Delta's delta.enableDeletionVectors: the table property routes the
    // plain upsert to the mask-based merge (O(matched rows), no file
    // rewrite); shapes the dv path can't express keep the rewriting merge
    val dvRoute = st.isSimpleUpsert && !fullSync && !st.schemaEvolution &&
      !table.rowTrackingEnabled &&
      table.properties.get(MergeTable.DeletionVectorsProp).contains("true")
    // Delta's delta.enableChangeDataFeed: the property turns the CDF on
    // for the statement without a per-call flag
    val cdf = table.properties.get(MergeTable.ChangeFeedProp).contains("true")
    if (dvRoute)
      table.mergeVectorized(spark, spark.table(st.source), st.keys, changeFeed = cdf)
    else if (st.isSimpleUpsert)
      table.merge(spark, spark.table(st.source), st.keys,
        mergeSchema = st.schemaEvolution,
        changeFeed = cdf,
        keysDeterminePartitions = keysDeterminePartitions,
        deleteNotMatchedBySource = fullSync)
    else if (st.schemaEvolution)
      // conditional clauses + WITH SCHEMA EVOLUTION: pre-evolve the schema
      // (addColumns mints fresh physicals), then the standard clause
      // dispatch resolves update-all/insert-all against the evolved set
      table.mergeClausesEvolve(spark, spark.table(st.source), st.keys, st.clauses,
        targetAlias = st.targetAlias, sourceAlias = st.sourceAlias,
        changeFeed = cdf,
        keysDeterminePartitions = keysDeterminePartitions)
    else
      table.mergeClauses(spark, spark.table(st.source), st.keys, st.clauses,
        targetAlias = st.targetAlias, sourceAlias = st.sourceAlias,
        changeFeed = cdf,
        keysDeterminePartitions = keysDeterminePartitions)
  }
}
