package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval range join without a nested loop.
  *
  * Spark plans a bare `p.v BETWEEN i.lo AND i.hi` join condition as
  * BroadcastNestedLoopJoin (or a cartesian) — per-task work n×m. The
  * binned formulation instead discretizes the range dimension: every
  * interval replicates to the bins it overlaps, every point maps to its
  * one bin, and the bin key drives an ordinary equi-join whose output
  * the exact BETWEEN predicate then filters. Shuffle volume is
  * points + intervals×(avg span/binWidth); task size is bounded by bin
  * population, never by n×m. Choose `binWidth` near the typical
  * interval span: much smaller multiplies interval replication, much
  * larger degrades each bin toward a mini nested loop. (DuckDB's native
  * IEJoin range join grades the semantics in q51's oracle.)
  */
object RangeJoin {

  /** Join each row of `points` to every `intervals` row whose
    * [loCol, hiCol] contains its `pointCol` (both bounds inclusive).
    * Output columns: all point columns, then all interval columns —
    * names must not collide (alias first). Intervals with hi < lo match
    * nothing, as in SQL BETWEEN.
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      pointCol: String, loCol: String, hiCol: String,
      binWidth: Double): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    require(points.columns.intersect(intervals.columns).isEmpty,
      "point/interval column names must not collide — alias first")
    val p = points.withColumn("__bin",
      floor(col(pointCol) / binWidth).cast("long"))
    val i = intervals
      .filter(col(loCol) <= col(hiCol))
      .withColumn("__bin", explode(sequence(
        floor(col(loCol) / binWidth).cast("long"),
        floor(col(hiCol) / binWidth).cast("long"))))
    p.join(i, Seq("__bin"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__bin")
  }
}
