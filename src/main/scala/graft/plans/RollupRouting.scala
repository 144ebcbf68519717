package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.DateType

/** Transparent materialized-rollup routing (SURVEY §4 / §7.3 stretch).
  *
  * The reference pre-aggregates with insert-maintained MVs and users
  * query the MV by name (`usdc-transfers/README.md:66-71`). This rule
  * goes one step further than the reference: queries written against the
  * RAW events table are rewritten to re-aggregate the partial-state
  * rollup when one is registered — the classic "answering queries using
  * materialized views" optimization, scoped to the lossless cases:
  *
  *  - grouping keys ⊆ {to_date(ts) → day, user_id} (any subset: coarser
  *    grains re-aggregate losslessly)
  *  - aggregates ∈ { SUM(value-with-casts) → SUM(v_partial),
  *                   COUNT(*)/COUNT(lit)   → SUM(c_partial),
  *                   MIN(value) → MIN(mn_partial),
  *                   MAX(value) → MAX(mx_partial) }
  *    (AVG is deliberately absent: decimal-partial division is not
  *    bit-identical to a raw double average — rewrite only the lossless)
  *
  * Anything else — other columns, other aggregates, filters below the
  * aggregate — leaves the plan untouched. Output attribute ids are
  * preserved so parent operators (sort, limit, project) re-bind cleanly.
  *
  * A second matcher ([[RollupRouting.JoinSpec]]) extends the same idea
  * across a JOIN: the revenue-by-segment aggregate over the pristine
  * lineitem⋈orders⋈customer inner-join core is rewritten onto the
  * persisted (orderkey, segment) partial rollup
  * ([[graft.ops.StarJoins.revenueSegmentPartialsOf]]) — the join is
  * paid once at build, and the routed read is join-free.
  *
  * At scale this turns a full fact-table scan + shuffle into a scan of a
  * rollup that is orders of magnitude smaller — the same reason the
  * reference's dashboards read MVs instead of `usdc_transfer`.
  */
object RollupRouting {

  /** A registered daily rollup (written by
    * [[graft.streaming.Live.appendDailyPartials]]). */
  case class Spec(sourceSuffix: String, rollupPath: String)

  /** A registered JOIN-DERIVED rollup (written by
    * [[graft.ops.StarJoins.revenueSegmentPartialsOf]]): answers the
    * revenue-by-segment aggregate over the lineitem⋈orders⋈customer
    * join from the persisted (orderkey, segment) partial state. */
  case class JoinSpec(rollupPath: String)

  private var specs: List[Spec] = Nil
  private var joinSpecs: List[JoinSpec] = Nil
  def register(spec: Spec): Unit = synchronized { specs = spec :: specs }
  def registerJoin(spec: JoinSpec): Unit = synchronized { joinSpecs = spec :: joinSpecs }
  def clear(): Unit = synchronized { specs = Nil; joinSpecs = Nil }
  def registered: List[Spec] = specs

  class RuleImpl(spark: SparkSession) extends Rule[LogicalPlan] with PredicateHelper {

    private def stripCasts(e: Expression): Expression = e match {
      case c: Cast => stripCasts(c.child)
      case other => other
    }

    /** Substitute attributes through the Project chain below the
      * aggregate: by the time optimizer rules run, grouping expressions
      * have been pulled out into `_groupingexpression` project aliases
      * (PullOutGroupingExpressions) and `to_date` has been lowered to a
      * cast — resolve back to source-column terms before matching. */
    private def resolveThroughProjects(e: Expression, plan: LogicalPlan): Expression = {
      val aliasMap: Map[ExprId, Expression] = plan.collect {
        case p: org.apache.spark.sql.catalyst.plans.logical.Project =>
          p.projectList.collect { case a @ Alias(child, _) => a.exprId -> child }
      }.flatten.toMap
      def subst(x: Expression): Expression = x.transformUp {
        case a: AttributeReference if aliasMap.contains(a.exprId) => subst(aliasMap(a.exprId))
      }
      subst(e)
    }

    /** Which rollup key a grouping expression computes, if any. */
    private def keyOf(e: Expression): Option[String] = e match {
      case a: AttributeReference if a.name == "user_id" => Some("user_id")
      case e if e.dataType == DateType &&
        e.references.size == 1 && e.references.head.name == "ts" => Some("day")
      case _ => None
    }

    private def scanOf(plan: LogicalPlan): Option[Spec] =
      plan.collectFirst {
        case LogicalRelation(fs: HadoopFsRelation, _, _, _, _)
            if specs.exists(s => fs.location.rootPaths.exists(_.toString.endsWith(s.sourceSuffix))) =>
          specs.find(s => fs.location.rootPaths.exists(_.toString.endsWith(s.sourceSuffix))).get
      }

    /** The child between Aggregate and the scan must be pure projection —
      * a Filter would make the rollup answer wrong. */
    private def projectionOnly(plan: LogicalPlan): Boolean = plan match {
      case _: LogicalRelation => true
      case p: org.apache.spark.sql.catalyst.plans.logical.Project => projectionOnly(p.child)
      case _ => false
    }

    override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
      case agg @ Aggregate(groupings, aggExprs, child, _)
          if scanOf(child).isDefined && projectionOnly(child) =>
        val spec = scanOf(child).get
        rewrite(agg, groupings, aggExprs, spec).getOrElse(agg)
      case agg @ Aggregate(groupings, aggExprs, child, _)
          if joinSpecs.nonEmpty && child.exists(_.isInstanceOf[Join]) =>
        rewriteJoin(agg, groupings, aggExprs, joinSpecs.head).getOrElse(agg)
    }

    // ——— join-derived rollup: the revenue-by-segment shape ———

    private val revSegJoinKeys =
      Set("l_orderkey", "o_orderkey", "o_custkey", "c_custkey")

    /** Strip pruning Projects and the IsNotNull-only Filters that
      * InferFiltersFromConstraints plants on inner-join keys by rule-run
      * time — both are row-set no-ops relative to the rollup (the build
      * ran the same inner joins, which drop null keys anyway). Any other
      * Filter leaves the plan unmatched. */
    private def stripToCore(p: LogicalPlan): LogicalPlan = p match {
      case pr: Project => stripToCore(pr.child)
      case f: Filter
          if splitConjunctivePredicates(f.condition).forall {
            case IsNotNull(a: AttributeReference) => revSegJoinKeys.contains(a.name)
            case _ => false
          } => stripToCore(f.child)
      case other => other
    }

    private def baseTableName(stripped: LogicalPlan): Option[String] =
      stripped match {
        case LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
          fs.location.rootPaths.map(_.toString).collectFirst {
            case rp if rp.endsWith("lineitem.parquet") => "lineitem"
            case rp if rp.endsWith("orders.parquet") => "orders"
            case rp if rp.endsWith("customer.parquet") => "customer"
          }
        case _ => None
      }

    /** Flatten an inner-join tree to its base tables + equi-conditions;
      * None as soon as anything but Project/IsNotNull-Filter/Inner-Join
      * over the three expected scans appears. */
    private def flattenRevSegJoin(p: LogicalPlan)
        : Option[(Set[String], Seq[Expression])] = stripToCore(p) match {
      case Join(l, r, Inner, Some(cond), _) =>
        for {
          (lt, lc) <- flattenRevSegJoin(l)
          (rt, rc) <- flattenRevSegJoin(r)
        } yield (lt ++ rt, lc ++ rc ++ splitConjunctivePredicates(cond))
      case other =>
        baseTableName(other).map(n => (Set(n), Seq.empty[Expression]))
    }

    private def condPairs(conds: Seq[Expression]): Option[Set[(String, String)]] = {
      val pairs = conds.map {
        case EqualTo(a: AttributeReference, b: AttributeReference) =>
          val s = Seq(a.name, b.name).sorted
          Some((s(0), s(1)))
        case _ => None
      }
      if (pairs.forall(_.isDefined)) Some(pairs.flatten.toSet) else None
    }

    /** Answering-queries-using-views for the flagship join: an Aggregate
      * of exactly { SUM(l_extendedprice*(1−l_discount)-with-casts),
      * COUNT(*), COUNT(DISTINCT o_orderkey) } grouped by c_mktsegment
      * (or globally — both grains re-aggregate losslessly)
      * over the pristine lineitem⋈orders⋈customer inner-join core is
      * rewritten onto the registered (orderkey, segment) rollup:
      * SUM → SUM(rev_partial) (decimal partials, bit-identical),
      * COUNT(*) → SUM(n_lines_partial), and COUNT(DISTINCT o_orderkey)
      * degenerates to COUNT(*) because the rollup grain IS the orderkey.
      * Everything else — extra tables, filters, other aggregates or
      * groupings — leaves the plan untouched. Output ExprIds are
      * preserved so parent sorts/projects re-bind. */
    private def rewriteJoin(agg: Aggregate, groupings: Seq[Expression],
                            aggExprs: Seq[NamedExpression],
                            spec: JoinSpec): Option[LogicalPlan] = {
      flattenRevSegJoin(agg.child) match {
        case Some((tables, conds))
            if tables == Set("lineitem", "orders", "customer") &&
               condPairs(conds).contains(
                 Set(("l_orderkey", "o_orderkey"), ("c_custkey", "o_custkey"))) => ()
        case _ => return None
      }
      val rollup = try spark.read.parquet(spec.rollupPath).queryExecution.analyzed
                   catch { case _: Throwable => return None }
      def attr(n: String): Option[Attribute] = rollup.output.find(_.name == n)
      val (seg, rev, nl) =
        (attr("c_mktsegment"), attr("rev_partial"), attr("n_lines_partial")) match {
          case (Some(s), Some(r), Some(n)) => (s, r, n)
          case _ => return None
        }
      val child = agg.child
      def resolved(e: Expression): Expression = resolveThroughProjects(e, child)
      def isSegmentRef(e: Expression): Boolean = resolved(e) match {
        case a: AttributeReference => a.name == "c_mktsegment"
        case _ => false
      }
      // group by the segment, or a GLOBAL aggregate (no grouping) — the
      // rollup re-aggregates losslessly to either grain
      val global = groupings.isEmpty
      if (!global && (groupings.size != 1 || !isSegmentRef(groupings.head)))
        return None
      def isRevenueExpr(se: Expression): Boolean =
        stripCasts(resolved(se)) match {
          case Multiply(ep: AttributeReference,
                        Subtract(Literal(one, _), d: AttributeReference, _), _) =>
            ep.name == "l_extendedprice" && d.name == "l_discount" &&
              one == 1.0d
          case _ => false
        }
      def isOrderKeyRef(se: Expression): Boolean = resolved(se) match {
        case a: AttributeReference => a.name == "o_orderkey"
        case _ => false
      }
      var ok = true
      val newAggExprs: Seq[NamedExpression] = aggExprs.map {
        case ne if isSegmentRef(ne match { case Alias(c, _) => c; case x => x }) =>
          Alias(seg, ne.name)(exprId = ne.exprId)
        case ne =>
          val rewritten = ne.transformUp {
            case ae @ AggregateExpression(Sum(se, _), _, false, None, _)
                if isRevenueExpr(se) =>
              ae.copy(aggregateFunction = Sum(rev))
            case ae @ AggregateExpression(Count(children), _, false, None, _)
                if children.forall(_.isInstanceOf[Literal]) =>
              ae.copy(aggregateFunction = Sum(nl))
            case ae @ AggregateExpression(Count(Seq(se)), _, true, None, _)
                if isOrderKeyRef(se) =>
              ae.copy(aggregateFunction = Count(Seq(Literal(1))), isDistinct = false)
          }.asInstanceOf[NamedExpression]
          if (!rewritten.references.subsetOf(AttributeSet(rollup.output))) ok = false
          rewritten
      }
      if (!ok) return None
      Some(Aggregate(if (global) Nil else Seq(seg), newAggExprs, rollup))
    }

    private def rewrite(agg: Aggregate, groupings: Seq[Expression],
                        aggExprs: Seq[NamedExpression], spec: Spec): Option[LogicalPlan] = {
      val rollup = try spark.read.parquet(spec.rollupPath).queryExecution.analyzed
                   catch { case _: Throwable => return None }
      def attr(n: String): Option[Attribute] = rollup.output.find(_.name == n)
      val (day, userId, vPart, cPart) =
        (attr("day"), attr("user_id"), attr("v_partial"), attr("c_partial")) match {
          case (Some(d), Some(u), Some(v), Some(c)) => (d, u, v, c)
          case _ => return None
        }
      // optional min/max partials (older rollups may predate them; a
      // Min/Max left unmapped then fails the references check below)
      val mnPart = attr("mn_partial")
      val mxPart = attr("mx_partial")

      val child = agg.child
      def keyOfResolved(e: Expression): Option[String] =
        keyOf(resolveThroughProjects(e, child))

      // every grouping must map onto a rollup key
      val keyMap: Map[Expression, Attribute] = groupings.map { g =>
        keyOfResolved(g) match {
          case Some("day") => g -> day
          case Some("user_id") => g -> userId
          case _ => return None
        }
      }.toMap

      var ok = true
      val newAggExprs: Seq[NamedExpression] = aggExprs.map {
        case ne if keyOfResolved(ne match { case Alias(c, _) => c; case x => x }).isDefined =>
          val target = keyOfResolved(ne match { case Alias(c, _) => c; case x => x }).get match {
            case "day" => day
            case _ => userId
          }
          Alias(target, ne.name)(exprId = ne.exprId)
        case ne =>
          def isValueRef(se: Expression): Boolean = {
            val r = resolveThroughProjects(stripCasts(se), child)
            r.isInstanceOf[AttributeReference] &&
              r.asInstanceOf[AttributeReference].name == "value"
          }
          def isBareValueRef(se: Expression): Boolean = {
            val r = resolveThroughProjects(se, child)
            r.isInstanceOf[AttributeReference] &&
              r.asInstanceOf[AttributeReference].name == "value"
          }
          val rewritten = ne.transformUp {
            case ae @ AggregateExpression(Sum(se, _), _, false, None, _)
                if isValueRef(se) =>
              ae.copy(aggregateFunction = Sum(vPart))
            case ae @ AggregateExpression(Count(children), _, false, None, _)
                if children.forall(_.isInstanceOf[Literal]) =>
              ae.copy(aggregateFunction = Sum(cPart))
            // MIN/MAX route only for a BARE value reference: a cast in
            // between could reorder (e.g. string min) or change the
            // output type under a preserved ExprId. SUM tolerates casts
            // because the decimal partial subsumes them (dsum).
            case ae @ AggregateExpression(Min(se), _, false, None, _)
                if mnPart.isDefined && isBareValueRef(se) =>
              ae.copy(aggregateFunction = Min(mnPart.get))
            case ae @ AggregateExpression(Max(se), _, false, None, _)
                if mxPart.isDefined && isBareValueRef(se) =>
              ae.copy(aggregateFunction = Max(mxPart.get))
          }.asInstanceOf[NamedExpression]
          // bail if any raw-table reference survived (unknown aggregate)
          if (!rewritten.references.subsetOf(AttributeSet(rollup.output))) ok = false
          rewritten
      }
      if (!ok) return None

      val newGroupings = groupings.map(keyMap)
      Some(Aggregate(newGroupings, newAggExprs, rollup))
    }
  }
}

/** `SparkSessionExtensions` hook:
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(session => new RollupRouting.RuleImpl(session))
    e.injectPlannerStrategy(_ => TopKPerGroup.Strategy)
  }
}
