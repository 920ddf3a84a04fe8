package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{CoalesceExec, CollectLimitExec, FilterExec, GlobalLimitExec, InputAdapter, ProjectExec, SortExec, SparkPlan, TakeOrderedAndProjectExec, WholeStageCodegenExec}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.exchange.Exchange
import org.apache.spark.sql.execution.joins.{BaseJoinExec, BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.execution.window.WindowExec

/** Plan linting — the repo's plan-audit specs productized as a library
  * surface, so a pipeline author can ask "would this plan survive
  * 100 TB?" BEFORE submitting it. Each rule encodes a hazard the
  * graded operators were explicitly designed around: at local test
  * scale all of these EXECUTE FINE, which is exactly why they need a
  * lint — the 60k-row run that passes CI and the 60-billion-row run
  * that dies at 3 a.m. have the same plan.
  *
  * Heuristic by design (a physical plan does not carry intent): a
  * one-row scalar attach legitimately nest-loops, a deliberately
  * collected driver-side dim legitimately sorts globally. The lint
  * reports; the author decides — same contract as every linter.
  */
object PlanLint {

  /** (rule, node) findings over the df's physical plan. Lints
    * `queryExecution.sparkPlan` — the COMPLETE pre-AQE physical plan —
    * rather than `executedPlan`, because AdaptiveSparkPlanExec plans
    * lazily and its pre-execution view omits every not-yet-planned
    * stage (a root sort literally isn't there until upstream stages
    * materialize). The static plan is the honest lint surface: AQE
    * can improve it at runtime but cannot introduce these hazards.
    *
    * Rules:
    *  - `cartesian_product`: CartesianProductExec — output grows as
    *    |A|·|B|; at scale this is the job that never finishes.
    *  - `nested_loop_join`: BroadcastNestedLoopJoinExec whose BUILD
    *    side is not provably row-bounded ([[rowBounded]]) — per-row
    *    scans of an unbounded broadcast side. A nested loop against a
    *    one-row scalar aggregate or a limit-bounded frame (the
    *    q61/q130 scalar-attach pattern) is the CORRECT plan and is
    *    not reported (round 16: the registry-wide sweep would
    *    otherwise drown in ~38 benign scalar attaches, training
    *    authors to ignore the rule).
    *  - `single_partition_window`: a WindowExec with an empty
    *    PARTITION BY whose input is NOT provably row-bounded — the
    *    whole dataset funnels through ONE task (the q117
    *    anti-pattern; use two-phase ranking instead). An empty-
    *    partition window whose child subtree carries a compile-time
    *    cardinality bound (a limit / TakeOrdered / grand-total
    *    aggregate, composed through row-preserving or row-bounding
    *    operators — [[rowBounded]]) is NOT a finding: a rank over a
    *    k-row candidate list is the correct plan, and flagging it
    *    would train authors to ignore the rule. NOTE (round 15): a
    *    `partitionBy(lit(0))` declaration cannot express this —
    *    Spark's EliminateWindowPartitions folds any foldable
    *    partition expression away before WindowExec sees it, so the
    *    boundedness claim must live in the child PLAN, which is what
    *    this rule checks.
    *  - `global_sort`: a global SortExec that is the plan ROOT (not
    *    feeding a limit/join above it) — a full-data total order
    *    materialization; top-k should be TakeOrderedAndProject.
    */
  def findings(df: DataFrame): Seq[(String, String)] = {
    val root = df.queryExecution.sparkPlan
    def flatten(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => a +: flatten(a.executedPlan)
      case q: QueryStageExec        => q +: flatten(q.plan)
      case other => other +: other.children.flatMap(flatten)
    }
    val all = flatten(root)
    val base = all.collect {
      case c: CartesianProductExec =>
        ("cartesian_product", c.nodeName)
      case j: BroadcastNestedLoopJoinExec if !rowBounded(j.buildSide match {
            case org.apache.spark.sql.catalyst.optimizer.BuildLeft => j.left
            case org.apache.spark.sql.catalyst.optimizer.BuildRight => j.right
          }) =>
        ("nested_loop_join", j.nodeName)
      case w: WindowExec if w.partitionSpec.isEmpty && !rowBounded(w.child) =>
        ("single_partition_window", w.nodeName)
    }
    // a global sort is only a hazard when nothing above it bounds the
    // output: flag it when it is the effective root — descending
    // through wrappers that DON'T bound cardinality (projections and
    // filters preserve the unbounded total-order materialization; a
    // limit/TakeOrdered/join above the sort would not appear here)
    def effectiveRoot(p: SparkPlan): SparkPlan = p match {
      case a: AdaptiveSparkPlanExec => effectiveRoot(a.executedPlan)
      case q: QueryStageExec        => effectiveRoot(q.plan)
      case pr: org.apache.spark.sql.execution.ProjectExec =>
        effectiveRoot(pr.child)
      case f: org.apache.spark.sql.execution.FilterExec =>
        effectiveRoot(f.child)
      case other => other
    }
    val rootSort = effectiveRoot(root) match {
      case s: SortExec if s.global => Seq(("global_sort", s.nodeName))
      case _ => Seq.empty
    }
    base ++ rootSort
  }

  /** True when [[findings]] is empty — the plan carries none of the
    * known scale hazards.
    */
  def clean(df: DataFrame): Boolean = findings(df).isEmpty

  /** Conservative compile-time cardinality bound: true iff every path
    * from `p` downward reaches a row-bounding node (GlobalLimit /
    * CollectLimit / TakeOrderedAndProject / a grand-total aggregate)
    * through operators that cannot increase the bound unboundedly.
    * Joins count as bounded when BOTH sides are (output ≤ |L|·|R|),
    * unions when ALL children are. Anything unrecognized — a
    * Generate/explode, a scan, a grouped aggregate — answers false:
    * the lint must never certify an unbounded relation, while a
    * false "unbounded" merely reports a reviewable finding.
    */
  private[graft] def rowBounded(p: SparkPlan): Boolean = p match {
    case a: AdaptiveSparkPlanExec => rowBounded(a.executedPlan)
    case q: QueryStageExec        => rowBounded(q.plan)
    case w: WholeStageCodegenExec => rowBounded(w.child)
    case i: InputAdapter          => rowBounded(i.child)
    case _: GlobalLimitExec | _: CollectLimitExec |
        _: TakeOrderedAndProjectExec => true
    // compile-time literal relations: a VALUES list / small constant
    // range has its exact cardinality IN the plan — it cannot grow
    // with the data, which is the hazard these rules police. The
    // threshold keeps a deliberately-huge spark.range(1e9) driver of
    // synthetic data out of the certified class.
    case l: org.apache.spark.sql.execution.LocalTableScanExec =>
      l.rows.lengthCompare(LiteralRowsMax) <= 0
    case r: org.apache.spark.sql.execution.RangeExec =>
      r.numElements <= BigInt(LiteralRowsMax)
    case agg: BaseAggregateExec => agg.groupingExpressions.isEmpty ||
      rowBounded(agg.child) || groupingDomainBounded(agg)
    case pr: ProjectExec  => rowBounded(pr.child)
    case f: FilterExec    => rowBounded(f.child)
    case s: SortExec      => rowBounded(s.child)
    case c: CoalesceExec  => rowBounded(c.child)
    case e: Exchange      => rowBounded(e.child)
    case w: WindowExec    => rowBounded(w.child)
    case j: BaseJoinExec  => rowBounded(j.left) && rowBounded(j.right)
    case u: org.apache.spark.sql.execution.UnionExec =>
      u.children.forall(rowBounded)
    case _ => false
  }

  /** Cardinality threshold for certifying compile-time literal
    * relations in [[rowBounded]] — generous for parameter grids and
    * lookup VALUES, far below anything data-shaped.
    */
  private[graft] val LiteralRowsMax = 10000

  /** Round 17: a grouped aggregate whose EVERY grouping expression has
    * a compile-time-bounded VALUE DOMAIN is row-bounded by the product
    * of those domains — the sketch-state class (HLL register tables
    * grouped by a constant label × pmod(h, m); CMS cell tables grouped
    * by (row, pmod(h, w))) whose "O(registers), never data-sized"
    * claim was previously allowlist prose in the registry sweep.
    * Output cardinality ≤ Π domain(keyᵢ) regardless of input size, so
    * the certificate is as sound as the limit/grand-total cases.
    */
  private def groupingDomainBounded(agg: BaseAggregateExec): Boolean = {
    val doms = agg.groupingExpressions.map(domainOf(_, agg.child))
    doms.forall(_.isDefined) &&
      doms.flatten.product <= BigInt(LiteralRowsMax)
  }

  /** Compile-time bound on the number of distinct values `e` can take,
    * or None (= unbounded, the sound default for anything
    * unrecognized). Attribute references resolve through the child
    * plan's defining aliases — projections and aggregate keys/results
    * — so a grouping key that is `pmod(hash, lit(m))` three operators
    * down still certifies. A literal has domain 1; `pmod(_, lit(k))`
    * has domain k; `_ % lit(k)` has 2k−1 (signed remainder).
    */
  private def domainOf(e: org.apache.spark.sql.catalyst.expressions.Expression,
      scope: SparkPlan): Option[BigInt] = {
    import org.apache.spark.sql.catalyst.expressions._
    e match {
      case _: Literal => Some(BigInt(1))
      case al: Alias  => domainOf(al.child, scope)
      case c: Cast    => domainOf(c.child, scope)
      case p: Pmod =>
        literalLong(p.right).filter(_ > 0).map(BigInt(_))
      case r: Remainder =>
        literalLong(r.right).filter(_ > 0).map(k => BigInt(2) * k - 1)
      case a: AttributeReference => resolveAttrDomain(a, scope)
      case _ => None
    }
  }

  private def literalLong(
      e: org.apache.spark.sql.catalyst.expressions.Expression): Option[Long] = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    e match {
      case Literal(v: Int, _)   => Some(v.toLong)
      case Literal(v: Long, _)  => Some(v)
      case Literal(v: Short, _) => Some(v.toLong)
      case Literal(v: Byte, _)  => Some(v.toLong)
      case _ => None
    }
  }

  /** Find the node DEFINING attribute `a` in `scope`'s subtree — an
    * Alias in a projection or in aggregate keys/results — and return
    * the domain of its defining expression, evaluated against THAT
    * node's child (so chains of projections resolve transitively).
    * Not found ⇒ the attribute is a scan column or opaque passthrough
    * ⇒ None.
    */
  private def resolveAttrDomain(
      a: org.apache.spark.sql.catalyst.expressions.AttributeReference,
      scope: SparkPlan): Option[BigInt] = {
    import org.apache.spark.sql.catalyst.expressions.Alias
    def kids(p: SparkPlan): Seq[SparkPlan] = p match {
      case ad: AdaptiveSparkPlanExec => Seq(ad.executedPlan)
      case q: QueryStageExec         => Seq(q.plan)
      case other                     => other.children
    }
    def search(p: SparkPlan): Option[Option[BigInt]] = {
      val here: Option[Option[BigInt]] = p match {
        case pr: ProjectExec =>
          pr.projectList.collectFirst {
            case al: Alias if al.exprId == a.exprId =>
              domainOf(al.child, pr.child)
          }
        case ag: BaseAggregateExec =>
          (ag.groupingExpressions ++ ag.resultExpressions).collectFirst {
            case al: Alias if al.exprId == a.exprId =>
              domainOf(al.child, ag.child)
          }
        case _ => None
      }
      here.orElse(kids(p).view.flatMap(search).headOption)
    }
    search(scope).flatten
  }

  /** Every empty-partition WindowExec in the plan with its boundedness
    * verdict — the audit surface for "this single-partition window is
    * fine BECAUSE its input is k rows" claims (specs assert the
    * boolean instead of trusting a comment).
    */
  def emptyPartitionWindows(df: DataFrame): Seq[(String, Boolean)] = {
    val root = df.queryExecution.sparkPlan
    def flatten(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => a +: flatten(a.executedPlan)
      case q: QueryStageExec        => q +: flatten(q.plan)
      case other => other +: other.children.flatMap(flatten)
    }
    flatten(root).collect {
      case w: WindowExec if w.partitionSpec.isEmpty =>
        (w.nodeName, rowBounded(w.child))
    }
  }
}
