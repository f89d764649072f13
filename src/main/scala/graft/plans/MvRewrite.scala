package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project, Union}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType}
import graft.lake.MergeTable

/** Materialized-view query rewrite — the optimizer half of the MV
  * lifecycle ([[MvCatalog]] is the metadata half). Injected via
  * `SparkSessionExtensions.injectOptimizerRule` (GraftExtensions), so it
  * runs inside Catalyst's operator-optimization fixpoint on EVERY query:
  * a `GROUP BY` aggregate over a registered base table is transparently
  * re-pointed at the (tiny) MV table whenever that is provably
  * answer-identical. Two shapes fire:
  *
  *  - **exact**: the query's group-by set equals the MV's → the whole
  *    Aggregate collapses to a `Project` over the MV scan (zero shuffles,
  *    zero aggregation — the 100 TB base is never opened);
  *  - **rollup**: the query's group-by set is a strict SUBSET of the
  *    MV's → re-aggregate the MV: `sum → sum(sum_c)`, `count(*) →
  *    sum(cnt)`, `min → min(min_c)`, `max → max(max_c)` — one shuffle
  *    over MV-cardinality rows instead of base-cardinality.
  *
  * Soundness gates (ALL must hold, else the plan is left untouched):
  *  - the Aggregate's child is the registered base scan itself, bar pure
  *    column-pruning Projects (self-aliases allowed — a graft-table read
  *    projects physical→logical names), the UNION a multi-data-dir graft
  *    snapshot reads through (children pairwise disjoint — a duplicating
  *    self-union declines), and deterministic Filters whose every
  *    reference is an MV GROUPING column (the single most common
  *    production MV query: `WHERE grp = x GROUP BY grp`) — such a filter
  *    is uniform within each MV row, so it transplants onto the MV scan,
  *    on the exact grain and under a rollup alike. Any Join, computed
  *    expression, or filter touching a non-grouping column declines;
  *  - every output is a grouping attribute (possibly aliased) or a
  *    DISTINCT-free, FILTER-free sum/count(*)/min/max over a single base
  *    column with a registered MV column of the SAME data type;
  *  - on the rollup path, the RE-AGGREGATED expression's type must also
  *    equal the original aggregate's — `sum` over a decimal MV column
  *    widens (decimal(p,s) → decimal(p+10,s)), and silently swapping a
  *    child of a different type under the original exprId would corrupt
  *    the resolved plan's schema. Type drift declines;
  *  - the base is FRESH ([[MvCatalog.isFresh]]): any base mutation since
  *    the build disables the rewrite — stale MVs cost speed, never
  *    correctness. For graft-table bases this is one O(1) version read.
  *
  * The rewrite preserves the Aggregate's exact output surface — names,
  * exprIds, data types, nullability (count's non-nullable contract is
  * restored with `coalesce(_, 0)`) — so parent operators never know the
  * swap happened. Idempotent under the fixpoint: the rewritten plan scans
  * the MV path, which matches no registered base.
  */
case class MvRewrite(session: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (MvCatalog.isEmpty) return plan
    plan.transformUp {
      case agg: Aggregate =>
        MvCatalog.all.iterator
          .flatMap(d => tryRewrite(agg, d))
          .nextOption().getOrElse(agg)
    }
  }

  /** The base scan under optional pure column-pruning Projects (bare
    * attributes or self-aliases — `col(x).as(x)`, the graft read's
    * physical→logical projection), deterministic Filters (collected —
    * [[tryRewrite]] admits them only when every reference is an MV
    * grouping column), and/or the Union a multi-data-dir graft snapshot
    * scans through. Returns the union of every leaf's root paths plus the
    * filter conditions met on the way down, or None on any node that
    * could otherwise change rows or values.
    */
  private def baseScanWithFilters(p: LogicalPlan): Option[(Set[String], Seq[Expression])] = p match {
    case Project(projList, child) if projList.forall {
        case _: AttributeReference => true
        case a @ Alias(ar: AttributeReference, _) => a.name == ar.name
        case _ => false
      } =>
      baseScanWithFilters(child)
    case Filter(cond, child) if cond.deterministic =>
      baseScanWithFilters(child).map { case (paths, conds) => (paths, cond +: conds) }
    case Union(children, _, _) =>
      val sets = children.map(baseScanWithFilters)
      if (sets.forall(_.isDefined)) {
        // children must be PAIRWISE DISJOINT: a multi-data-dir graft
        // snapshot unions disjoint directory scans, while a duplicating
        // union (`t UNION ALL t`) re-reads the same paths — its SET-union
        // still equals the registered path set, but its rows are the base
        // COUNTED TWICE, so rewriting it to the MV would silently halve
        // every sum/count. Any overlap declines.
        val flat = sets.flatMap(_.get._1)
        // a filter PUSHED BELOW the union appears once per child with
        // per-child attribute ids: admit only when every child carries the
        // NAME-IDENTICAL condition list, and surface one copy
        val condKeys = sets.map(_.get._2.map(canonicalByName))
        if (flat.length == flat.toSet.size && condKeys.distinct.size == 1)
          Some((flat.toSet, sets.head.get._2))
        else None
      } else None
    case LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
      Some((fs.location.rootPaths.map(_.toString).toSet, Nil))
    case _ => None
  }

  /** Name-keyed rendering of a condition — attribute ids differ across
    * union children scanning different files, so equality of the pushed
    * copies is judged on names.
    */
  private def canonicalByName(e: Expression): String =
    e.transform { case a: AttributeReference =>
      AttributeReference(a.name, a.dataType, a.nullable)(exprId = ExprId(0))
    }.toString

  /** count(*) parses to Count(1) — match the literal in either width. */
  private def isCountStar(c: Count): Boolean = c.children match {
    case Seq(Literal(1, IntegerType)) => true
    case Seq(Literal(1L, LongType))   => true
    case _ => false
  }

  /** One classified output column of the candidate Aggregate. */
  private sealed trait Out
  private case class GroupOut(baseCol: String, name: String, exprId: ExprId) extends Out
  private case class AggOut(mv: MvAgg, original: Expression, name: String,
                            exprId: ExprId) extends Out

  private def classify(agg: Aggregate, d: MvDef): Option[Seq[Out]] = {
    val groupAttrs = agg.groupingExpressions.collect {
      case a: AttributeReference => a.exprId
    }.toSet
    if (groupAttrs.size != agg.groupingExpressions.size) return None // non-attr grouping

    def aggOf(e: Expression): Option[MvAgg] = e match {
      case AggregateExpression(f, Complete, false, None, _) => f match {
        case Sum(a: AttributeReference, _) =>
          d.aggs.find(m => m.func == "sum" && m.inputCol.contains(a.name))
        case Min(a: AttributeReference) =>
          d.aggs.find(m => m.func == "min" && m.inputCol.contains(a.name))
        case Max(a: AttributeReference) =>
          d.aggs.find(m => m.func == "max" && m.inputCol.contains(a.name))
        case c: Count if isCountStar(c) =>
          d.aggs.find(m => m.func == "count" && m.inputCol.isEmpty)
        case _ => None
      }
      case _ => None
    }

    val outs = agg.aggregateExpressions.map {
      case a: AttributeReference if groupAttrs(a.exprId) =>
        Some(GroupOut(a.name, a.name, a.exprId))
      case al @ Alias(a: AttributeReference, _) if groupAttrs(a.exprId) =>
        Some(GroupOut(a.name, al.name, al.exprId))
      case al: Alias =>
        aggOf(al.child).map(m => AggOut(m, al.child, al.name, al.exprId))
      case _ => None
    }
    if (outs.forall(_.isDefined)) Some(outs.flatten) else None
  }

  private def tryRewrite(agg: Aggregate, d: MvDef): Option[LogicalPlan] = {
    val (paths, conds) = baseScanWithFilters(agg.child).getOrElse(return None)
    if (paths != d.baseRootPaths) return None
    // filtered aggregates are answerable from the MV exactly when every
    // filter reference is an MV GROUPING column: each MV row is one group,
    // all of whose base rows share those values, so the predicate is
    // uniform within a row and filtering the MV == filtering the base —
    // on the exact grain AND under a rollup (the filter may speak FINER
    // grouping columns than the query groups by). Anything else declines.
    if (!conds.forall(_.references.forall(a => d.groupCols.contains(a.name))))
      return None
    val gNames = agg.groupingExpressions.collect { case a: AttributeReference => a.name }
    if (gNames.length != agg.groupingExpressions.length) return None
    if (!gNames.toSet.subsetOf(d.groupCols.toSet)) return None
    val outs = classify(agg, d).getOrElse(return None)
    // structural match done — only now pay the staleness consult (one
    // version read for graft bases, a listing for plain directories)
    if (!MvCatalog.isFresh(d)) return None

    val mvScan = MvRewrite.mvFrame(session, d).queryExecution.analyzed
    val mvOut = mvScan.output.map(a => a.name -> a).toMap
    // every referenced MV column must exist AND carry the exact data type
    // the original expression produced (a schema drift between definition
    // and table declines rather than miscasts)
    val typed = outs.forall {
      case GroupOut(c, _, _)  => mvOut.get(c).isDefined
      case AggOut(m, e, _, _) => mvOut.get(m.mvCol).exists(_.dataType == e.dataType)
    }
    if (!typed) return None
    // rebind the admitted filters onto the MV scan by NAME (their base
    // attribute ids mean nothing over the MV relation); a name or type
    // mismatch declines rather than miscasts
    val rebound = conds.map { c =>
      var ok = true
      val r = c.transform { case a: AttributeReference =>
        mvOut.get(a.name) match {
          case Some(m) if m.dataType == a.dataType => m
          case _ => ok = false; a
        }
      }
      if (ok) Some(r) else None
    }
    if (rebound.exists(_.isEmpty)) return None
    val mvPlan: LogicalPlan =
      if (rebound.isEmpty) mvScan
      else Filter(rebound.flatten.reduce(And), mvScan)

    if (gNames.toSet == d.groupCols.toSet) {
      // exact: Aggregate → Project over the MV scan
      val projected = outs.map {
        case GroupOut(c, name, id) => Alias(mvOut(c), name)(exprId = id)
        case AggOut(m, _, name, id) if m.func == "count" =>
          // count(*) is non-nullable; the stored column read from parquet
          // is not — restore the contract (0 can never actually surface:
          // the MV has no row for an empty group)
          Alias(Coalesce(Seq(mvOut(m.mvCol), Literal(0L))), name)(exprId = id)
        case AggOut(m, _, name, id) => Alias(mvOut(m.mvCol), name)(exprId = id)
      }
      Some(Project(projected, mvPlan))
    } else {
      // rollup: re-aggregate the MV on the query's (coarser) keys
      def reAgg(f: AggregateFunction): Expression =
        AggregateExpression(f, Complete, isDistinct = false)
      val rolled = outs.map {
        case GroupOut(c, name, id) => Some(Alias(mvOut(c), name)(exprId = id))
        case AggOut(m, orig, name, id) =>
          val e: Expression = m.func match {
            case "sum"   => reAgg(Sum(mvOut(m.mvCol)))
            case "count" => Coalesce(Seq(reAgg(Sum(mvOut(m.mvCol))), Literal(0L)))
            case "min"   => reAgg(Min(mvOut(m.mvCol)))
            case "max"   => reAgg(Max(mvOut(m.mvCol)))
          }
          // the re-aggregation must reproduce the original output type
          // EXACTLY — Sum over a decimal MV column widens the precision,
          // and an Alias keeping the original exprId over a differently-
          // typed child breaks the resolved plan's schema. Decline.
          if (e.dataType != orig.dataType) None
          else Some(Alias(e, name)(exprId = id))
      }
      if (rolled.exists(_.isEmpty)) return None
      // group on the QUERY's grouping set (not the output's — a grouping
      // column omitted from the SELECT list must still partition groups)
      val groupings = agg.groupingExpressions.collect {
        case a: AttributeReference => mvOut(a.name)
      }
      Some(Aggregate(groupings, rolled.flatten, mvPlan))
    }
  }
}

object MvRewrite {
  /** How the last [[refresh]] ran: "incremental" (MV ⊕ signed CDF delta —
    * the base is never rescanned), "full" (rebuild from the base
    * snapshot), or "noop" (base version unchanged). Observability for the
    * q32 gate and MvIncrementalSpec.
    */
  @volatile var lastRefreshMode: String = ""

  /** The MV's current contents: through the graft table when one lives at
    * `mvPath` (the incremental-maintenance shape), else plain parquet.
    */
  private[plans] def mvFrame(spark: SparkSession, d: MvDef): DataFrame = {
    val t = new MergeTable(d.mvPath)
    if (t.exists) t.read(spark) else spark.read.parquet(d.mvPath)
  }

  /** Build the MV table from the definition over the CURRENT base
    * snapshot and register it for rewrite — the one-call entry point.
    */
  def buildAndRegister(spark: SparkSession, name: String, basePath: String,
                       groupCols: Seq[String], aggs: Seq[MvAgg],
                       mvPath: String): MvDef =
    MvCatalog.build(spark, name, basePath, groupCols, aggs, mvPath)

  /** Bring a registered MV up to the base's current snapshot and
    * re-fingerprint — the staleness exit. Queries between the base
    * mutation and the refresh simply ran unrewritten.
    *
    * When the base is a graft table with a change feed over the stale
    * window and every aggregate is sum/count, the refresh is INCREMENTAL:
    * the base's CDF rows between the registered version and the tip fold
    * into signed per-group deltas (+1 for insert/update_postimage, −1 for
    * delete/update_preimage — st7's IVM algebra), which merge with the
    * CURRENT MV rows: `new_sum = old_sum + Δsum` (NULL when the non-null
    * input count hits zero), `new_cnt = old_cnt + Δcnt`, and a group
    * whose hidden `__rows` count reaches zero is DROPPED. Cost is
    * O(MV + delta) — the base is never rescanned; at 100 TB that is the
    * difference between touching dozens of grouped rows and re-reading
    * the corpus. min/max MVs stay incremental under RETRACTION too via
    * their VALUE CENSUS ([[MvCatalog.censusPath]], built with the MV):
    * the window's signed counts fold into the census and the touched
    * groups' extrema re-derive from the surviving census rows —
    * O(delta + touched groups' censuses). A pre-census (legacy) MV folds
    * append-only windows with `least/greatest` and rebuilds in full on
    * any retraction (the rebuild creates the census, so it heals);
    * plain-parquet bases always rebuild in full.
    */
  def refresh(spark: SparkSession, name: String): MvDef = {
    val d = MvCatalog.get(name).getOrElse(
      throw new IllegalArgumentException(s"no registered MV named $name"))
    val baseT = new MergeTable(d.basePath)
    val mvT = new MergeTable(d.mvPath)
    val incrCapable = baseT.exists && mvT.exists &&
      d.baseFingerprint.startsWith("graft:v")
    if (!incrCapable) {
      lastRefreshMode = "full"
      return MvCatalog.build(spark, d.name, d.basePath, d.groupCols, d.aggs, d.mvPath)
    }
    val vOld = d.baseFingerprint.stripPrefix("graft:v").toLong
    val vNow = baseT.currentVersion
    if (vNow == vOld) { lastRefreshMode = "noop"; return d }
    // the window is consumed up to four times below (retraction probe,
    // census folds, group-delta aggregate, touched-group set) — pin it
    // once instead of re-reading the feed files per consumer
    val ch =
      try baseT.changes(spark, vOld + 1, vNow).persist()
      catch { case _: Exception =>
        // a commit in the window has no change feed — fall back loudly-
        // correct: rebuild from the snapshot
        lastRefreshMode = "full"
        return MvCatalog.build(spark, d.name, d.basePath, d.groupCols, d.aggs, d.mvPath)
      }
    try refreshIncrementalFrom(spark, d, baseT, mvT, ch, vOld, vNow)
    finally ch.unpersist()
  }

  /** The incremental tail of [[refresh]] over a PINNED change window. */
  private def refreshIncrementalFrom(spark: SparkSession, d: MvDef,
                                     baseT: MergeTable, mvT: MergeTable,
                                     ch: DataFrame, vOld: Long, vNow: Long): MvDef = {
    // each artifact folds FROM ITS OWN txn marker (the base version its
    // contents reflect), never merely "skip when marker >= vNow": a crashed
    // refresh leaves the census at a marker BETWEEN the MV fingerprint and
    // the tip, and a retry that re-folded from the fingerprint would apply
    // the already-folded span twice — silent count corruption. The window
    // each artifact needs is (its marker, vNow]; the shared pinned `ch` is
    // that window exactly when the marker sits at the fingerprint (the
    // no-crash case), and a sub-/super-window is re-read on demand.
    // Re-read (crash-retry) windows are PERSISTED like the shared `ch`
    // (ADVICE r14): the census fold and the MV fold each consume their
    // window twice (delta aggregate + touched-group set), so an unpersisted
    // re-read would re-scan the feed files per consumer. The pins are
    // released in the cleanup loop at the end of the refresh.
    val pinned = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    def windowFrom(start: Long): Option[DataFrame] =
      if (start == vOld) Some(ch)
      else try {
        val w = baseT.changes(spark, start + 1, vNow).persist()
        pinned += w
        Some(w)
      } catch { case _: Exception => None }
    def unpinAll(): Unit = { pinned.foreach(_.unpersist()); pinned.clear() }
    def full(): MvDef = {
      lastRefreshMode = "full"
      unpinAll()
      MvCatalog.build(spark, d.name, d.basePath, d.groupCols, d.aggs, d.mvPath)
    }
    // min/max under RETRACTION: the stored extremum alone cannot answer a
    // shrink, but the MV's VALUE CENSUS (built alongside it — one
    // (group, value, count) row per distinct value) can: fold the window's
    // signed counts into the census, then re-derive the extremum of the
    // AFFECTED groups from their surviving census rows. An MV built
    // before censuses existed (no census table) still rebuilds in full on
    // any retraction — and that rebuild creates the census, so it heals.
    // A min/max over a GROUPING column needs no census at all (the value
    // is the group key, uniform within the group).
    val minMax = d.aggs.filter(a => a.func == "min" || a.func == "max")
    val mmCols = MvCatalog.censusCols(d.groupCols, d.aggs)
    val censusT = mmCols.map(c =>
      c -> new MergeTable(MvCatalog.censusPath(d.mvPath, c))).toMap
    val mvMarker = mvT.lastTxnVersion(s"mv_${d.name}")
    val cMarkers = mmCols.map(c =>
      c -> censusT(c).lastTxnVersion(s"mvc_${d.name}")).toMap
    // a marker BEYOND the tip means the base was recreated under this name
    // (version numbers regressed) — no incremental state is trustworthy
    if (mvMarker.exists(_ > vNow) || cMarkers.values.exists(_.exists(_ > vNow)))
      return full()
    // a census is usable only when MARKED (build always marks; an
    // unmarked table is a leftover from some other lifecycle)
    val censusOk = mmCols.forall(c => censusT(c).exists && cMarkers(c).isDefined)
    val retraction = !ch.filter(col(MergeTable.ChangeType) =!= "insert").isEmpty
    if (minMax.nonEmpty && retraction && !censusOk) return full()
    lastRefreshMode = "incremental"
    val useCensus = mmCols.nonEmpty && censusOk
    val sign = when(col(MergeTable.ChangeType).isin("insert", "update_postimage"),
      lit(1L)).otherwise(lit(-1L))
    // census maintenance FIRST (the extremum re-derivation below reads the
    // post-fold state), each census folding from ITS marker
    if (useCensus) mmCols.foreach { c =>
      val t = censusT(c)
      val cStart = cMarkers(c).get
      if (cStart < vNow) {
        val w = windowFrom(cStart).getOrElse(return full())
        val keyCols = d.groupCols :+ c
        val cd = w.filter(col(c).isNotNull)
          .groupBy(keyCols.map(col): _*).agg(sum(sign).as("__dc")).as("cd")
        val oldC = t.read(spark).as("co")
        val ccond = keyCols.map(k => col(s"co.$k") <=> col(s"cd.$k")).reduce(_ && _)
        val newCnt = coalesce(col(s"co.${MvCatalog.CensusCnt}"), lit(0L)) +
          coalesce(col("__dc"), lit(0L))
        t.overwrite(oldC.join(cd, ccond, "full_outer").filter(newCnt > 0)
          .select(keyCols.map(k => coalesce(col(s"co.$k"), col(s"cd.$k")).as(k)) :+
            newCnt.as(MvCatalog.CensusCnt): _*),
          txn = Some(s"mvc_${d.name}" -> vNow))
      }
    }
    // the MV folds from the LATER of its fingerprint and its own marker: a
    // crash after the MV overwrite but before register leaves marker=vNow
    // over fingerprint=vOld, and the retry must not re-fold
    val mStart = math.max(vOld, mvMarker.getOrElse(vOld))
    if (mStart < vNow) {
      val chMv = windowFrom(mStart).getOrElse(return full())
      val sums = d.aggs.collect { case MvAgg("sum", Some(c), m) => (c, m) }
      val deltaAggs =
        sums.flatMap { case (c, m) => Seq(
          sum(when(col(c).isNotNull, sign * col(c))).as(s"__d_$m"),
          sum(when(col(c).isNotNull, sign).otherwise(lit(0L))).as(s"__dnn_$m")) } ++
        d.aggs.collect { case MvAgg("count", None, m) => sum(sign).as(s"__d_$m") } ++
        (if (useCensus) Nil else
          d.aggs.collect { case MvAgg("min", Some(c), m) if mmCols.contains(c) =>
            min(col(c)).as(s"__d_$m") } ++
          d.aggs.collect { case MvAgg("max", Some(c), m) if mmCols.contains(c) =>
            max(col(c)).as(s"__d_$m") }) :+
        sum(sign).as("__drows")
      val delta = chMv.groupBy(d.groupCols.map(col): _*)
        .agg(deltaAggs.head, deltaAggs.tail: _*).as("dl")
      val old = mvT.read(spark)
      val oldTypes = old.schema.fields.map(f => f.name -> f.dataType).toMap
      // null-safe join: groupBy puts NULL keys in one group, so the merge
      // must match them too (a plain equi-join would strand a NULL-keyed
      // delta as a spurious new group next to the surviving old one)
      val cond = d.groupCols.map(c => col(s"o.$c") <=> col(s"dl.$c")).reduce(_ && _)
      var merged = old.as("o").join(delta, cond, "full_outer")
      def grp(k: String) = coalesce(col(s"o.$k"), col(s"dl.$k"))
      // per-census extremum of the groups the window TOUCHED, from the
      // post-fold census: a LEFT join from the touched-group set keeps a
      // group whose census emptied (all values retracted → extremum NULL);
      // untouched groups never join and keep their stored extremum
      val touched = chMv.select(d.groupCols.map(col): _*).distinct()
      if (useCensus) mmCols.zipWithIndex.foreach { case (c, i) =>
        val cen = censusT(c).read(spark).as("cn")
        val jc = d.groupCols.map(k => col(s"g.$k") <=> col(s"cn.$k")).reduce(_ && _)
        val ext = touched.as("g").join(cen, jc, "left")
          .groupBy(d.groupCols.map(k => col(s"g.$k").as(k)): _*)
          .agg(min(col(s"cn.$c")).as(s"__ext_min_$c"),
               max(col(s"cn.$c")).as(s"__ext_max_$c"))
          .withColumn(s"__aff_$c", lit(true))
          .as(s"e$i")
        val ec = d.groupCols.map(k => grp(k) <=> col(s"e$i.$k")).reduce(_ && _)
        merged = merged.join(ext, ec, "left")
      }
      val newRows = coalesce(col(s"o.${MvCatalog.RowsCol}"), lit(0L)) +
        coalesce(col("__drows"), lit(0L))
      d.aggs.foreach {
        case MvAgg("sum", Some(_), m) =>
          val t = oldTypes(m)
          val nn = coalesce(col(s"o.${MvCatalog.nnColOf(m)}"), lit(0L)) +
            coalesce(col(s"__dnn_$m"), lit(0L))
          merged = merged
            .withColumn(s"__new_$m",
              when(nn === 0, lit(null).cast(t))
                .otherwise((coalesce(col(s"o.$m"), lit(0).cast(t)) +
                  coalesce(col(s"__d_$m"), lit(0).cast(t))).cast(t)))
            .withColumn(s"__newnn_$m", nn)
        case MvAgg("count", None, m) =>
          merged = merged.withColumn(s"__new_$m",
            coalesce(col(s"o.$m"), lit(0L)) + coalesce(col(s"__d_$m"), lit(0L)))
        // a grouping column's extremum IS the group key
        case MvAgg("min" | "max", Some(c), m) if d.groupCols.contains(c) =>
          merged = merged.withColumn(s"__new_$m", grp(c))
        // census path: touched groups take the re-derived extremum (NULL
        // when the census emptied), untouched groups keep the stored one
        case MvAgg("min", Some(c), m) if useCensus =>
          merged = merged.withColumn(s"__new_$m",
            when(col(s"__aff_$c"), col(s"__ext_min_$c")).otherwise(col(s"o.$m")))
        case MvAgg("max", Some(c), m) if useCensus =>
          merged = merged.withColumn(s"__new_$m",
            when(col(s"__aff_$c"), col(s"__ext_max_$c")).otherwise(col(s"o.$m")))
        // legacy MV without a census — the window is PURE APPENDS (gated
        // above): the fold is the extremum of the stored value and the
        // inserts' — least/greatest skip NULL sides
        case MvAgg("min", Some(_), m) =>
          merged = merged.withColumn(s"__new_$m",
            least(col(s"o.$m"), col(s"__d_$m")))
        case MvAgg("max", Some(_), m) =>
          merged = merged.withColumn(s"__new_$m",
            greatest(col(s"o.$m"), col(s"__d_$m")))
        case a => throw new IllegalStateException(s"unsupported MV aggregate $a")
      }
      val outCols = d.groupCols.map(c => grp(c).as(c)) ++
        d.aggs.map(a => col(s"__new_${a.mvCol}").as(a.mvCol)) ++
        Seq(newRows.as(MvCatalog.RowsCol)) ++
        sums.map { case (_, m) => col(s"__newnn_$m").as(MvCatalog.nnColOf(m)) }
      mvT.overwrite(merged.filter(newRows > 0).select(outCols: _*),
        txn = Some(s"mv_${d.name}" -> vNow))
    }
    unpinAll()
    val rootPaths = MvCatalog.rootPathsOf(
      baseT.readVersion(spark, vNow).queryExecution.analyzed)
    MvCatalog.register(spark, d.copy(baseRootPaths = rootPaths,
      baseFingerprint = s"graft:v$vNow"))
  }
}
