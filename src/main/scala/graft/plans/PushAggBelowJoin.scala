package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Eager aggregation (Yan & Larson, VLDB'95): push a decomposable
  * aggregation BELOW a fact-fact inner equi-join, collapsing the big
  * side to one row per join key before the join's shuffle moves it.
  * This is the q03 rewrite (queries/CoreQueries.scala) — previously
  * hand-written there because Catalyst does not perform it — promoted
  * to an optimizer rule, so SQL-text callers (the q99 surface) and any
  * naive DataFrame formulation get the narrow-shuffle plan for free.
  *
  * Soundness does NOT require the probe side's key to be unique: after
  * the pushdown each probe row re-contributes the whole per-key
  * pre-sum, which is exactly what the per-row matches contributed
  * before —
  *   Σ_{(l,r) matching} f(l) = Σ_r Σ_{l: l.k = r.k} f(l).
  * The guarded scope keeps integral SUM / COUNT / MIN / MAX
  * bit-identical to the unpushed plan; a floating SUM is re-ordered
  * (float addition is non-associative), which stays inside the
  * nondeterminism envelope Spark's own partial aggregation and
  * shuffle ordering already impose — exact-sum callers use the
  * repo's integer-scaled pattern regardless. The guards:
  *   - INNER join, conjunctive pure equi-condition, both key sides
  *     plain attributes (a residual non-equi predicate could reference
  *     pushed-away fact columns);
  *   - grouping expressions reference only the probe side;
  *   - every aggregate is a non-distinct, unfiltered SUM / COUNT /
  *     MIN / MAX over fact-side-only inputs, and SUM inputs are
  *     integral or floating (a decimal SUM-of-SUM widens precision
  *     twice and would change the output type);
  *   - the fact child is not itself an Aggregate (also the fixed-point
  *     guard: the rewritten plan matches the pattern again and must
  *     not re-fire).
  * The fact side may be EITHER join input — `fact JOIN dim` and
  * `dim JOIN fact` both rewrite (left tried first).
  * COUNT re-aggregates as SUM of per-key counts, coalesced to 0 so a
  * global aggregate over an empty join still returns COUNT's 0, not
  * SUM's null; MIN/MAX of per-key MIN/MAX are the originals verbatim.
  *
  * At 100 TB the payoff is the same as q03's measured one: the join
  * shuffle moves one narrow row per KEY instead of one wide row per
  * fact-table row, and the pre-aggregation's exchange doubles as the
  * join's left exchange (same key), so no extra shuffle is paid.
  *
  * Register via `GraftExtensions` (injectOptimizerRule) or
  * imperatively through `spark.experimental.extraOptimizations`.
  */
object PushAggBelowJoin extends Rule[LogicalPlan] with PredicateHelper {

  private def supportedSumType(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType |
         FloatType | DoubleType => true
    case _ => false
  }

  /** Pushing changes how many times each aggregate input evaluates
    * (once per fact row instead of once per join row) and TRY-mode
    * SUM's overflow-null would be silently skipped as a null input by
    * the outer re-sum — so require deterministic inputs and exclude
    * `try_sum`. ANSI/LEGACY eval modes are preserved verbatim on both
    * the pushed and the rebuilt outer Sum (see [[rewrite]]).
    */
  private def pushable(ae: AggregateExpression,
      fact: LogicalPlan): Boolean =
    !ae.isDistinct && ae.filter.isEmpty && ae.deterministic &&
      (ae.aggregateFunction match {
      case Sum(e, ctx) =>
        ctx.evalMode != EvalMode.TRY &&
          e.references.subsetOf(fact.outputSet) && supportedSumType(e.dataType)
      case Count(children) =>
        children.forall(_.references.subsetOf(fact.outputSet))
      case Min(e) => e.references.subsetOf(fact.outputSet)
      case Max(e) => e.references.subsetOf(fact.outputSet)
      case _ => false
    })

  /** Fixed-point guard: after this rule fires the pattern matches
    * again with an Aggregate (possibly wrapped in Projects by column
    * pruning within the same optimizer batch) as the left child —
    * re-firing there would stack useless pre-agg layers and ping-pong
    * against ColumnPruning until the iteration cap.
    */
  @annotation.tailrec
  private def alreadyAggregated(p: LogicalPlan): Boolean = p match {
    case org.apache.spark.sql.catalyst.plans.logical.Project(_, c) =>
      alreadyAggregated(c)
    case _: Aggregate => true
    case _ => false
  }

  /** ColumnPruning (same fixed-point batch) interposes a pure-pruning
    * Project between the Aggregate and the Join; look through it —
    * attribute-only project lists change nothing the rewrite relies
    * on, and the rewritten Aggregate reads the join output directly
    * (pruning re-runs on the new plan anyway).
    */
  private object ProjectedJoin {
    def unapply(p: LogicalPlan): Option[Join] = p match {
      case j: Join => Some(j)
      case org.apache.spark.sql.catalyst.plans.logical.Project(pl, j: Join)
          if pl.forall(_.isInstanceOf[AttributeReference]) => Some(j)
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case agg @ Aggregate(groups, aggExprs, ProjectedJoin(
        join @ Join(left, right, Inner, Some(cond), _)), aggHint)
        if !agg.isStreaming =>
      // the fact (aggregated) side may be either join input — a SQL
      // author writing `dim JOIN fact` puts it on the right
      if (!alreadyAggregated(left) &&
          eligible(groups, aggExprs, left, right, cond))
        rewrite(groups, aggExprs, join, aggHint, factIsLeft = true)
      else if (!alreadyAggregated(right) &&
          eligible(groups, aggExprs, right, left, cond))
        rewrite(groups, aggExprs, join, aggHint, factIsLeft = false)
      else agg
  }

  private def rewrite(groups: Seq[Expression],
      aggExprs: Seq[NamedExpression], join: Join,
      aggHint: Option[org.apache.spark.sql.catalyst.plans.logical
        .AggregateHint], factIsLeft: Boolean): Aggregate = {
    val fact = if (factIsLeft) join.left else join.right
    val cond = join.condition.get
    val factKeys = splitConjunctivePredicates(cond).collect {
      case EqualTo(a: AttributeReference, _)
          if fact.outputSet.contains(a) => a
      case EqualTo(_, a: AttributeReference)
          if fact.outputSet.contains(a) => a
    }.distinct
    val pre = scala.collection.mutable.ArrayBuffer.empty[NamedExpression]
    def preAgg(fn: AggregateFunction, name: String): Attribute = {
      val al = Alias(fn.toAggregateExpression(), name)()
      pre += al
      al.toAttribute
    }
    // transformUp: the Count case's replacement embeds a NEW
    // AggregateExpression (Sum over the pushed count); a top-down
    // transform would descend into the replacement and rewrite it
    // again. Bottom-up never revisits a replacement.
    val newAggExprs = aggExprs.map(_.transformUp {
      case ae: AggregateExpression => ae.aggregateFunction match {
        case s: Sum => // keep the original's eval context on the re-sum
          Sum(preAgg(s, "_pushed_sum"), s.evalContext).toAggregateExpression()
        case c: Count =>
          Coalesce(Seq(
            Sum(preAgg(c, "_pushed_cnt")).toAggregateExpression(),
            Literal(0L)))
        case m: Min =>
          Min(preAgg(m, "_pushed_min")).toAggregateExpression()
        case m: Max =>
          Max(preAgg(m, "_pushed_max")).toAggregateExpression()
        case other => // unreachable under eligible()
          throw new IllegalStateException(s"unexpected $other")
      }
    }.asInstanceOf[NamedExpression])
    val pushed = Aggregate(
      factKeys, (factKeys: Seq[NamedExpression]) ++ pre.toSeq, fact, None)
    val newJoin =
      if (factIsLeft) join.copy(left = pushed) else join.copy(right = pushed)
    Aggregate(groups, newAggExprs, newJoin, aggHint)
  }

  /** Can the aggregation push into `fact`, with `probe` untouched? */
  private def eligible(groups: Seq[Expression],
      aggExprs: Seq[NamedExpression], fact: LogicalPlan,
      probe: LogicalPlan, cond: Expression): Boolean = {
    // pure conjunctive equi-join on plain attributes, one side each
    val conjuncts = splitConjunctivePredicates(cond)
    val equiOk = conjuncts.nonEmpty && conjuncts.forall {
      case EqualTo(a: AttributeReference, b: AttributeReference) =>
        (fact.outputSet.contains(a) && probe.outputSet.contains(b)) ||
          (fact.outputSet.contains(b) && probe.outputSet.contains(a))
      case _ => false
    }
    // grouping purely on the probe side, and deterministic: pushing
    // changes evaluation cardinality, so a nondeterministic grouping
    // or join-key expression must block the rewrite (Catalyst rule
    // convention). Join keys are plain attributes under equiOk, but
    // gate cond anyway in case the pattern widens.
    val groupOk = groups.forall(g =>
      g.deterministic && g.references.subsetOf(probe.outputSet)) &&
      cond.deterministic
    // every aggregate pushable; non-aggregate refs only on the probe
    val aggsOk = aggExprs.forall { ne =>
      var ok = true
      var sawAgg = false
      ne.foreach {
        case ae: AggregateExpression =>
          sawAgg = true
          ok &&= pushable(ae, fact)
        case _ => ()
      }
      val bareRefs = ne.collect {
        case a: AttributeReference => a
      }.filterNot { a =>
        // attributes inside aggregate functions are accounted above
        ne.exists {
          case ae: AggregateExpression => ae.references.contains(a)
          case _ => false
        }
      }
      ok && (sawAgg || bareRefs.forall(probe.outputSet.contains))
    }
    // at least one real aggregate to push, else nothing to gain
    val anyAgg = aggExprs.exists(_.exists(
      _.isInstanceOf[AggregateExpression]))
    equiOk && groupOk && aggsOk && anyAgg
  }
}
