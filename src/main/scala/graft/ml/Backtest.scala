package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Forecasting baselines with exact backtests — the reference points
  * every model must beat, and the drift monitor for pipelines whose
  * "model" is a heuristic: a forecast operator is only trustworthy
  * with a backtest beside it, so the operator IS the backtest.
  *
  * Seasonal naive: ŷ(g, t) = y(g, t − season); the backtest scores
  * every (g, t) where both sides exist. All integer: per-period
  * values are summed longs, the error Σ|y − ŷ| exact, MAE reported
  * in floor micro-units — hash-replayable.
  *
  * Scale shape: one map-side-combining aggregate to (group, period)
  * cells, one self-equi-join of the cell table shifted by `season`
  * (keyed on (group, period) — cells-sized, not event-sized), one
  * combining aggregate per group.
  */
object Backtest {

  def seasonalNaiveBacktest(df: DataFrame, group: Column, period: Column,
      value: Column, season: Long): DataFrame = {
    require(season >= 1, s"season must be >= 1, got $season")
    val cells = df.select(group.as("g"), period.cast("long").as("t"),
        value.cast("long").as("v"))
      .filter(col("t").isNotNull)
      .groupBy(col("g"), col("t")).agg(sum(col("v")).as("v"))
    val pred = cells.select(col("g"), (col("t") + season).as("t"),
      col("v").as("yhat"))
    cells.join(pred, Seq("g", "t"))
      .select(col("g"), abs(col("v") - col("yhat")).as("ae"))
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n_predictions"),
        sum(col("ae")).as("sum_abs_err"))
      .withColumn("mae_micro",
        expr("(1000000 * sum_abs_err) div n_predictions"))
  }
}
