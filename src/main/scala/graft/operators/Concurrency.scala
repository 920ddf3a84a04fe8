package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval concurrency profiling: given a validity-interval table
  * (attr, from_us, to_us half-open, null to = still open), how many
  * intervals of each attribute are simultaneously open — peak
  * concurrent sessions per state, peak users per experiment arm, the
  * capacity number every serving/licensing question reduces to.
  *
  * The classic formulation is a boundary sweep: +1 at each start, −1
  * at each CLOSED end, running-sum in time order; the maximum of the
  * running sum is the peak, and half-open algebra means an interval
  * ending at t never overlaps one starting at t (the −1 sorts with
  * equal t and sums before the comparison — both engines agree
  * because boundaries aggregate to one delta per (attr, t) first).
  *
  * The scale point is HOW the running sum runs: a per-attr window
  * would funnel each attribute's full boundary history through one
  * task (unbounded — exactly the q117 anti-pattern, since a popular
  * state has corpus-many boundaries). Instead the boundary cells run
  * through [[Stats.groupedPrefixSums]] — one global two-phase prefix
  * over the composite (attr, t) order with each attribute's own
  * running sum recovered by base subtraction: grouped prefix sums
  * without per-group windows, because a composite-range order keeps
  * each group contiguous.
  */
object Concurrency {

  /** (attr, max_concurrency, at_us): the peak open-interval count per
    * attribute and the earliest instant attaining it. Open intervals
    * (null to_us) contribute from their start forever.
    */
  def maxConcurrency(intervals: DataFrame): DataFrame = {
    val starts = intervals.select(col("attr"),
      col("from_us").as("t"), lit(1L).as("delta"))
    val ends = intervals.filter(col("to_us").isNotNull)
      .select(col("attr"), col("to_us").as("t"), lit(-1L).as("delta"))
    val cells = starts.unionByName(ends)
      .groupBy(col("attr"), col("t"))
      .agg(sum(col("delta")).as("delta"))
    val conc = Stats.groupedPrefixSums(cells, "attr", "t", Seq("delta"))
      .select(col("attr"), col("t"), col("gcum_delta").as("c"))
    val mx = conc.groupBy(col("attr"))
      .agg(max(col("c")).as("max_concurrency"))
    conc.join(mx, Seq("attr"))
      .filter(col("c") === col("max_concurrency"))
      .groupBy(col("attr"), col("max_concurrency"))
      .agg(min(col("t")).as("at_us"))
      .select(col("attr"), col("max_concurrency"), col("at_us"))
  }

  /** Interval-UNION length per group — total time covered by at
    * least one interval, overlaps merged (user active time, SLA
    * uptime, machine busy time). Input (grp, from_us, to_us); only
    * CLOSED intervals participate (an open interval has unbounded
    * cover — filter or cap upstream), empty/negative ones are
    * dropped.
    *
    * The sweep needs NO neighbor access: at a boundary cell the
    * previous concurrency is `conc − delta` — a per-row expression —
    * so cover transitions are pure row-local flags (off→on where
    * conc > 0 ∧ conc−delta = 0; on→off where conc = 0 ∧
    * conc−delta > 0) and the union length telescopes to
    * Σ t[off] − Σ t[on]. One grouped prefix sum
    * ([[Stats.groupedPrefixSums]]) plus one combining aggregate:
    * no per-group window, no lead/lag, no segment materialization.
    * Closed-interval series always end at concurrency 0, so the
    * telescoping sum is exact. Output: (grp, covered_us,
    * n_segments) with n_segments the count of merged islands.
    */
  def coveredTime(intervals: DataFrame): DataFrame = {
    val iv = intervals.filter(col("to_us").isNotNull &&
      col("to_us") > col("from_us"))
    val deltas = iv.select(col("grp"), col("from_us").as("t"),
        lit(1L).as("delta"))
      .unionByName(iv.select(col("grp"), col("to_us").as("t"),
        lit(-1L).as("delta")))
      .groupBy(col("grp"), col("t"))
      .agg(sum(col("delta")).as("delta"))
      .filter(col("delta") =!= 0) // touching boundaries cancel
    val conc = Stats.groupedPrefixSums(deltas, "grp", "t", Seq("delta"))
      .select(col("grp"), col("t"), col("delta"),
        col("gcum_delta").as("c"))
    conc.groupBy(col("grp"))
      .agg(
        sum(when(col("c") === 0 && col("c") - col("delta") > 0, col("t"))
          .when(col("c") > 0 && col("c") - col("delta") === 0, -col("t"))
          .otherwise(0L)).as("covered_us"),
        sum(when(col("c") > 0 && col("c") - col("delta") === 0, 1L)
          .otherwise(0L)).as("n_segments"))
  }
}
