package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.{IntegerType, LongType}

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
  *  - the Aggregate's child is the registered base scan itself, bar a
  *    pure column-pruning Project — any Filter/Join/expression in
  *    between declines (a filtered aggregate is NOT the MV's answer);
  *  - every output is a grouping attribute (possibly aliased) or a
  *    DISTINCT-free, FILTER-free sum/count(*)/min/max over a single base
  *    column with a registered MV column of the SAME data type;
  *  - the base is FRESH ([[MvCatalog.isFresh]]): any base mutation since
  *    the build disables the rewrite — stale MVs cost speed, never
  *    correctness.
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

  /** The base scan under an optional pure column-pruning Project. */
  private def baseScanPaths(p: LogicalPlan): Option[Set[String]] = p match {
    case Project(projList, child) if projList.forall(_.isInstanceOf[AttributeReference]) =>
      baseScanPaths(child)
    case LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
      Some(fs.location.rootPaths.map(_.toString).toSet)
    case _ => None
  }

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
    val paths = baseScanPaths(agg.child).getOrElse(return None)
    if (paths != d.baseRootPaths) return None
    val gNames = agg.groupingExpressions.collect { case a: AttributeReference => a.name }
    if (gNames.length != agg.groupingExpressions.length) return None
    if (!gNames.toSet.subsetOf(d.groupCols.toSet)) return None
    val outs = classify(agg, d).getOrElse(return None)
    // structural match done — only now pay the staleness listing
    if (!MvCatalog.isFresh(d)) return None

    val mvPlan = session.read.parquet(d.mvPath).queryExecution.analyzed
    val mvOut = mvPlan.output.map(a => a.name -> a).toMap
    // every referenced MV column must exist AND carry the exact data type
    // the original expression produced (a schema drift between definition
    // and table declines rather than miscasts)
    val typed = outs.forall {
      case GroupOut(c, _, _)  => mvOut.get(c).isDefined
      case AggOut(m, e, _, _) => mvOut.get(m.mvCol).exists(_.dataType == e.dataType)
    }
    if (!typed) return None

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
        case GroupOut(c, name, id) => Alias(mvOut(c), name)(exprId = id)
        case AggOut(m, _, name, id) => m.func match {
          case "sum" => Alias(reAgg(Sum(mvOut(m.mvCol))), name)(exprId = id)
          case "count" =>
            Alias(Coalesce(Seq(reAgg(Sum(mvOut(m.mvCol))), Literal(0L))),
              name)(exprId = id)
          case "min" => Alias(reAgg(Min(mvOut(m.mvCol))), name)(exprId = id)
          case "max" => Alias(reAgg(Max(mvOut(m.mvCol))), name)(exprId = id)
        }
      }
      // group on the QUERY's grouping set (not the output's — a grouping
      // column omitted from the SELECT list must still partition groups)
      val groupings = agg.groupingExpressions.collect {
        case a: AttributeReference => mvOut(a.name)
      }
      Some(Aggregate(groupings, rolled, mvPlan))
    }
  }
}

object MvRewrite {
  /** Build the MV table from the definition over the CURRENT base
    * snapshot and register it for rewrite — the one-call entry point.
    */
  def buildAndRegister(spark: SparkSession, name: String, basePath: String,
                       groupCols: Seq[String], aggs: Seq[MvAgg],
                       mvPath: String): MvDef =
    MvCatalog.build(spark, name, basePath, groupCols, aggs, mvPath)

  /** Rebuild a registered MV against the base's current snapshot and
    * re-fingerprint — the staleness exit. Queries between the base
    * mutation and the refresh simply ran unrewritten.
    */
  def refresh(spark: SparkSession, name: String): MvDef = {
    val d = MvCatalog.get(name).getOrElse(
      throw new IllegalArgumentException(s"no registered MV named $name"))
    MvCatalog.build(spark, d.name, d.basePath, d.groupCols, d.aggs, d.mvPath)
  }
}
