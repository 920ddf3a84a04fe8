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
    withV.withColumn("bin",
        when(col("__qb_v").isNotNull, countBelow(col("__qb_v"), bounds)))
      .drop("__qb_v")
  }

  /** Bin index = number of boundaries strictly below the value (the
    * quantileBins assignment rule), as a comparison chain — scan-side,
    * codegen'd, no join.
    */
  private def countBelow(v: Column, bounds: Seq[Double]): Column =
    bounds.foldLeft(lit(0L))((acc, b) =>
      acc + when(v > b, 1L).otherwise(0L))

  /** Single-pass APPROXIMATE per-group quantiles from a fixed
    * equi-width integer bin sketch — the quantile path that actually
    * scales. The exact percentile aggregates (q07/q13/q107) buffer
    * whole groups; this keeps ≤ nBins longs per group, merges by bin
    * addition (map-side combine applies), and estimates quantile p as
    * the UPPER EDGE of the first bin whose cumulative count reaches
    * ⌈p·n⌉ — error bounded by one bin width, and every step (bin
    * index, cumulative rank, ceiling) is integer arithmetic, so the
    * ESTIMATES replay bit-exactly in SQL. Bounds [lo, hi) are caller
    * constants (schema knowledge: prices, latencies, token counts all
    * have hard ranges); values outside clamp into the edge bins like
    * equiWidthBin. One groupBy on (group, bin) + one on (group) — no
    * sort, no window over data-sized partitions, no per-group buffers
    * beyond the bin counts.
    *
    * Output long form: (group, p, est) for each requested p in
    * per-mille (integer thousandths, avoiding double prob literals).
    */
  def binnedQuantiles(df: DataFrame, group: Column, c: Column,
      lo: Double, hi: Double, nBins: Int,
      perMille: Seq[Int]): DataFrame = {
    require(lo < hi && nBins > 0 && perMille.forall(p => p > 0 && p <= 1000))
    import org.apache.spark.sql.expressions.Window
    val binned = df.filter(c.isNotNull)
      .select(group.as("g"),
        equiWidthBin(c, lit(lo), lit(hi), nBins).as("bin"))
      .groupBy(col("g"), col("bin")).agg(count(lit(1)).as("cnt"))
    // windows over ≤ nBins rows per group — bounded, never data-sized
    val cum = binned
      .withColumn("cum", sum(col("cnt"))
        .over(Window.partitionBy(col("g")).orderBy(col("bin"))))
      .withColumn("n", sum(col("cnt"))
        .over(Window.partitionBy(col("g"))))
    // first bin whose cum count reaches ceil(p·n/1000); since cum is
    // an integer, cum >= ceil(p·n/1000) ⟺ 1000·cum >= p·n — all longs
    cum.withColumn("p", explode(typedLit(perMille.sorted)))
      .filter(col("cum") * 1000 >= col("p") * col("n"))
      .groupBy(col("g"), col("p"))
      .agg(min(col("bin")).as("est_bin"))
      .select(col("g"), col("p").cast("long").as("p"),
        round(lit(lo) + (col("est_bin") + 1) *
          ((lit(hi) - lit(lo)) / nBins), 6).as("est"))
  }

  /** Equi-DEPTH histogram (the profiling complement of
    * equiWidthHistogram): boundaries are the exact i/nBins quantiles
    * rounded to 6 decimals on the engine side — the q07 cross-engine
    * parity form, since the two engines' interpolation can differ in
    * the last ulp — and each row lands in the bin counting boundaries
    * strictly below it, so bins are right-closed like quantileBins.
    * Output is one row per NON-EMPTY bin: (bin, bin_lo, bin_hi, n)
    * with null bin_lo on the first bin and null bin_hi on the last.
    *
    * Scale shape matches q07: pass 1 is one shuffle-light exact
    * percentile aggregate collected to the driver (nBins-1 doubles),
    * pass 2 is an embarrassingly parallel scan-side groupBy over at
    * most nBins keys. Heavily duplicated values collapse bins in both
    * engines identically (the boundaries tie exactly after rounding).
    */
  def equiDepthHistogram(df: DataFrame, c: Column,
      nBins: Int): DataFrame = {
    val probs = (1 until nBins).map(_.toDouble / nBins)
    val vals = df.filter(c.isNotNull)
      .select(c.cast("double").as("__v"))
    val exprs = probs.map(p => round(expr(s"percentile(__v, $p)"), 6))
    val row = vals.agg(exprs.head, exprs.tail: _*).head()
    if (row.isNullAt(0))
      return vals.select(lit(0L).as("bin"),
        lit(null).cast("double").as("bin_lo"),
        lit(null).cast("double").as("bin_hi"),
        lit(0L).as("n")).limit(0)
    val bounds = probs.indices.map(row.getDouble)
    val bArr = typedLit(bounds)
    vals.groupBy(countBelow(col("__v"), bounds).as("bin"))
      .agg(count(lit(1)).as("n"))
      .select(col("bin"),
        when(col("bin") > 0, element_at(bArr, col("bin").cast("int")))
          .as("bin_lo"),
        when(col("bin") < bounds.length,
          element_at(bArr, col("bin").cast("int") + 1)).as("bin_hi"),
        col("n"))
  }
}
