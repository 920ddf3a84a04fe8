package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Experiment readout with CUPED variance reduction — the standard
  * A/B-test adjustment (Deng et al., WSDM'13): regress the experiment
  * metric on a pre-experiment covariate and report variant means of
  * the residualized metric y − θ·(x − x̄). Same treatment-effect
  * estimate in expectation (θ is fit pooled, x̄ is global), but the
  * covariate's share of the variance is gone, so the same data
  * resolves a smaller lift.
  *
  * All arithmetic is exact integer in ppm (the repo's hash-replayable
  * convention — floor `div`, documented rounding):
  *
  *   θ_ppm   = (10⁶·(n·Sxy − Sx·Sy)) div (n·Sxx − Sx²)   [pooled]
  *   adj_ppm = mean_y_ppm − (θ_ppm·(mean_x_v_ppm − mean_x_ppm)) div 10⁶
  *
  * Zero covariate variance ⇒ θ = 0 (no adjustment). Long bound: the
  * θ numerator needs 10⁶·n·|Sxy| < 2⁶³ — scale metric/covariate to
  * coarse units first at billion-unit populations (the KS/moments
  * escape hatch).
  *
  * Scale shape: ONE map-side-combining aggregate per variant carries
  * all five running sums; the pooled row is the variants' sums summed
  * again (grouping-sets shape without the rollup operator, so both
  * aggregates stay partial-agg friendly), attached back as a one-row
  * broadcast. Input is one row per experiment UNIT — aggregate raw
  * events to units first (the q183 caller does).
  */
object Experiment {

  def cupedReadout(df: DataFrame, variant: Column, metric: Column,
      covariate: Column): DataFrame = {
    val rows = df.select(variant.as("variant"),
        metric.cast("long").as("y"), covariate.cast("long").as("x"))
      .filter(col("y").isNotNull && col("x").isNotNull)
    val perVariant = rows.groupBy(col("variant"))
      .agg(count(lit(1)).as("n_v"), sum(col("y")).as("sy_v"),
        sum(col("x")).as("sx_v"), sum(col("x") * col("x")).as("sxx_v"),
        sum(col("x") * col("y")).as("sxy_v"))
    val pooled = perVariant.agg(sum(col("n_v")).as("n"),
        sum(col("sy_v")).as("sy"), sum(col("sx_v")).as("sx"),
        sum(col("sxx_v")).as("sxx"), sum(col("sxy_v")).as("sxy"))
      .select(col("n"), col("sx"),
        when(col("n") * col("sxx") - col("sx") * col("sx") === 0, lit(0L))
          .otherwise(expr("(1000000 * (n * sxy - sx * sy)) div " +
            "(n * sxx - sx * sx)"))
          .as("theta_ppm"))
    // `div` truncates toward zero (Spark semantics); the oracle
    // replays trunc-div explicitly since DuckDB's `//` floors
    perVariant.crossJoin(broadcast(pooled))
      .select(col("variant"), col("n_v"),
        expr("(1000000 * sy_v) div n_v").as("mean_y_ppm"),
        expr("(1000000 * sx_v) div n_v").as("mean_x_ppm"),
        col("theta_ppm"),
        expr("(1000000 * sy_v) div n_v - (theta_ppm * " +
          "((1000000 * sx_v) div n_v - (1000000 * sx) div n)) " +
          "div 1000000").as("adj_mean_y_ppm"))
  }
}
