package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Feature discretization — the binning passes of a training-data
  * pipeline (histogram features, monotonic bucketing for tree models,
  * data-profiling summaries). All scan-plus-one-aggregate shapes.
  * NULL values never land in a numbered bin: the bin expression is
  * null for null input (greatest/least would otherwise silently swallow
  * the null and report bin 0), and the aggregating helpers exclude
  * null rows like SQL aggregates do.
  */
object Binning {

  /** Equi-width bin index of `c` over [lo, hi] in nBins buckets; values
    * at hi (or beyond, if the bounds are not exact) clamp into the last
    * (first) bucket; null in → null bin. Pure double arithmetic —
    * bit-reproducible in any engine, so bin assignments are
    * oracle-checkable.
    */
  def equiWidthBin(c: Column, lo: Column, hi: Column, nBins: Int): Column =
    when(c.isNotNull,
      least(greatest(
        floor((c.cast("double") - lo) / ((hi - lo) / nBins)), lit(0.0)),
        lit((nBins - 1).toDouble)).cast("long"))

  /** Equi-width histogram over the non-null values: one aggregate for
    * the bounds (driver-side scalars — cheap at any scale), one groupBy
    * for the counts. Empty (or all-null) input yields an empty frame.
    */
  def equiWidthHistogram(df: DataFrame, c: Column,
      nBins: Int): DataFrame = {
    val vals = df.filter(c.isNotNull)
    val b = vals.agg(min(c.cast("double")), max(c.cast("double"))).head()
    val (lo, hi) =
      if (b.isNullAt(0)) (0.0, 0.0) // no rows survive the filter below
      else (b.getDouble(0), b.getDouble(1))
    vals.groupBy(equiWidthBin(c, lit(lo), lit(hi), nBins).as("bin"))
      .agg(count(lit(1)).as("n"))
      .withColumn("bin_lo", lit(lo) + col("bin") * ((lit(hi) - lit(lo)) / nBins))
      .withColumn("bin_hi", lit(lo) + (col("bin") + 1) * ((lit(hi) - lit(lo)) / nBins))
      .select("bin", "bin_lo", "bin_hi", "n")
  }

  /** Quantile (equal-frequency) binning: boundaries from the exact
    * percentiles at `probs` (a tiny driver-collected aggregate, like
    * removeOutliers), assignment via a scan-side comparison chain. Bin
    * i = count of boundaries strictly below the value, so bins are
    * right-closed (a value exactly on boundary b_1 is bin 0). Null
    * values get a null bin; an empty/all-null input returns every row
    * with a null bin.
    */
  def quantileBins(df: DataFrame, c: Column,
      probs: Seq[Double]): DataFrame = {
    val exprs = probs.map(p => expr(s"percentile(__qb_v, $p)"))
    val withV = df.withColumn("__qb_v", c.cast("double"))
    val row = withV.agg(exprs.head, exprs.tail: _*).head()
    if (row.isNullAt(0))
      return df.withColumn("bin", lit(null).cast("long"))
    val bounds = probs.indices.map(row.getDouble)
    val bin = bounds.foldLeft(lit(0L))((acc, b) =>
      acc + when(col("__qb_v") > b, 1L).otherwise(0L))
    withV.withColumn("bin", when(col("__qb_v").isNotNull, bin))
      .drop("__qb_v")
  }
}
