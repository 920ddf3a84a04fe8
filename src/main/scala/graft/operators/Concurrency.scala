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
  * state has corpus-many boundaries). Instead the boundary cells take
  * ONE global two-phase prefix sum over the composite (attr, t) order
  * ([[Stats.rangePrefixSums]] — range partition, driver offsets,
  * partition-local windows), and each attribute's own running sum is
  * recovered by subtracting the attribute's BASE (the global
  * cumulative just before its first boundary, one `min_by` row per
  * attribute): grouped prefix sums without per-group windows, because
  * a composite-range order keeps each group contiguous.
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
    val cum = Stats.rangePrefixSums(cells,
      struct(col("attr"), col("t")), Seq("delta"))
    val base = cum.groupBy(col("attr"))
      .agg(expr("min_by(cum_delta - delta, t)").as("base"))
    val conc = cum.join(base, Seq("attr"))
      .select(col("attr"), col("t"),
        (col("cum_delta") - col("base")).as("c"))
    val mx = conc.groupBy(col("attr"))
      .agg(max(col("c")).as("max_concurrency"))
    conc.join(mx, Seq("attr"))
      .filter(col("c") === col("max_concurrency"))
      .groupBy(col("attr"), col("max_concurrency"))
      .agg(min(col("t")).as("at_us"))
      .select(col("attr"), col("max_concurrency"), col("at_us"))
  }
}
