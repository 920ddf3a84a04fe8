package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — the time-series alignment primitive (align
  * each fact with the most recent reference row at or before it, per
  * key): training-data pipelines use it to attach the latest-known
  * feature snapshot to every example without leakage from the future.
  *
  * Spark has no native ASOF operator; the naive encodings are a
  * per-left-row subquery (quadratic) or an inequality join (planned as
  * BroadcastNestedLoopJoin — the cartesian trap). This is the
  * sort-merge formulation instead: tag both sides, union them, and
  * carry the last right payload forward with one window pass. ONE hash
  * exchange on the key plus a spillable sort — the same cost profile as
  * a single SortMergeJoin, at any scale. (DuckDB's native ASOF JOIN
  * grades the semantics in the oracle.)
  */
object AsOfJoin {

  /** For each row of `left`, attach `payloadCols` from the `right` row
    * with the greatest `tsCol` ≤ the left row's `tsCol`, matching on
    * `keyCols` (nulls where no right row precedes). `right` must be
    * unique per (keyCols, tsCol) — pre-aggregate if not, or the match
    * among ties is unspecified (DuckDB's ASOF has the same contract).
    */
  def backward(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      tsCol: String, payloadCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    require(payloadCols.forall(!leftCols.contains(_)),
      "payload columns must not collide with left columns — alias first")
    // SQL equality semantics: a NULL key matches nothing. The window
    // partition would otherwise group null-key rows together, so
    // null-key reference rows are dropped up front (left null-key rows
    // then carry a null payload, as ASOF LEFT JOIN does).
    val rightNonNull = right.filter(
      keyCols.map(col(_).isNotNull).reduce(_ && _))
    // tag: right rows sort before left rows at equal ts, so an exactly
    // simultaneous reference row is visible to the fact row (ASOF ≤)
    val r2 = rightNonNull.select(
      keyCols.map(col) ++ Seq(col(tsCol),
        struct(payloadCols.map(col): _*).as("__payload"),
        lit(0).as("__side")): _*)
    val l2 = left.select(
      keyCols.map(col) ++ Seq(col(tsCol),
        struct(leftCols.map(col): _*).as("__row"),
        lit(1).as("__side")): _*)
    val unioned = r2.withColumn("__row",
        lit(null).cast(l2.schema("__row").dataType))
      .select((keyCols :+ tsCol).map(col) ++
        Seq(col("__payload"), col("__side"), col("__row")): _*)
      .unionByName(l2.withColumn("__payload",
        lit(null).cast(r2.schema("__payload").dataType)))
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned
      .withColumn("__asof", last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    carried.select(
      leftCols.map(c => col("__row").getField(c).as(c)) ++
        payloadCols.map(c => col("__asof").getField(c).as(c)): _*)
  }
}
