package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{SortExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
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
    *  - `nested_loop_join`: BroadcastNestedLoopJoinExec — per-row
    *    scans of the broadcast side; legitimate only for one-row
    *    scalar attaches (the q61/q130 pattern — hence reported, not
    *    forbidden).
    *  - `single_partition_window`: a WindowExec with an empty
    *    PARTITION BY — the whole dataset funnels through ONE task
    *    (the q117 anti-pattern; use two-phase ranking instead).
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
      case j: BroadcastNestedLoopJoinExec =>
        ("nested_loop_join", j.nodeName)
      case w: WindowExec if w.partitionSpec.isEmpty =>
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
}
