package graft.transform

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The cleaning stage (libs/otokuna/analysis.py:11-28, 76-90): outlier
  * removal, keep-first dedup, dropna, target variable, feature projection.
  */
object Clean {

  /** P1 remove_outliers (analysis.py:11-28): per column, compute the
    * linear-interpolated p99 and drop rows where `col == q` — exact
    * equality, the reference's deliberate quirk (rows are dropped only
    * when the quantile lands exactly on a data value). Two-pass: one tiny
    * aggregate collected to the driver (a single value per column — cheap
    * at any scale), then an embarrassingly parallel filter.
    */
  def removeOutliers(df: DataFrame, thres: Double = 0.99): DataFrame =
    removeOutliersWith(df, c => s"percentile($c, $thres)")

  /** The 100 TB variant of removeOutliers: approx_percentile (a
    * mergeable quantile sketch — constant memory per partition, single
    * pass) instead of exact percentile (which buffers all values). With
    * `accuracy` ε, the returned quantile's rank error is ≤ ε·n; the
    * exact form stays the default because the oracle (and the
    * reference's `== q` quirk) demand the interpolated value.
    */
  def removeOutliersApprox(df: DataFrame, thres: Double = 0.99,
      accuracy: Int = 10000): DataFrame =
    removeOutliersWith(df, c => s"approx_percentile($c, $thres, $accuracy)")

  /** Stand-in for pandas' +inf ratio (admin_fee / 0 with a positive
    * numerator). Ranks above every real ratio in the quantile, exactly
    * as inf does, while staying a legal Spark double.
    */
  private[graft] val InfSentinel: Double = Double.MaxValue

  /** A quantile at or above this is "contaminated" by the sentinel
    * block: pandas' linear interpolation against inf yields inf for any
    * fraction > 0, and `inf == inf` then drops every zero-rent row. No
    * real rent ratio approaches this magnitude.
    */
  private[graft] val ContaminatedQ: Double = 1e250

  private def removeOutliersWith(df: DataFrame,
      quantileExpr: String => String): DataFrame = {
    // pandas parity for the transient ratio: admin_fee/rent in pandas is
    // +inf when rent == 0 with a positive fee (parse_money maps '-' to
    // 0, so it is a legal value) and NaN for 0/0. Spark's non-ANSI
    // Divide nulls both, which would HIDE the inf rows from the
    // percentile's ranking; substituting InfSentinel for the +inf case
    // ranks them exactly as pandas does, while 0/0 stays null (pandas
    // NaN is likewise skipped by quantile and kept by `==`).
    val withRatio = df.withColumn("rent_admin_fee_ratio",
      when(col("rent").cast("double") === 0.0 &&
          col("admin_fee").cast("double") > 0.0, lit(InfSentinel))
        .otherwise(col("admin_fee").cast("double") / col("rent").cast("double")))
    val cols = Seq("area", "n_rooms", "building_age", "rent",
      "rent_admin_fee_ratio")
    val qRow = withRatio.agg(
      expr(quantileExpr(cols.head)),
      cols.tail.map(c => expr(quantileExpr(c))): _*).head()
    // an empty (or all-null) input yields null quantiles → no outliers;
    // approx_percentile also preserves the input type (long cols → long)
    //
    // Each equality flag is coalesced to false: a null comparand
    // (genuinely-null column, or the 0/0 ratio) must KEEP the row,
    // matching pandas where `NaN == q` is False. A contaminated ratio
    // quantile (pandas: inf) drops exactly the sentinel rows, as
    // pandas' `inf == inf` does. Rows with real missing data are still
    // dropped afterwards by dropMissing, preserving the reference's
    // dropna ordering; the transient ratio column is dropped before that.
    val flags = cols.zipWithIndex.flatMap { case (c, i) =>
      if (qRow.isNullAt(i)) None
      else qRow.get(i) match {
        case n: java.lang.Number =>
          val q = n.doubleValue()
          if (c == "rent_admin_fee_ratio" && q >= ContaminatedQ)
            Some(coalesce(col(c) === lit(InfSentinel), lit(false)))
          else
            Some(coalesce(col(c).cast("double") === lit(q), lit(false)))
        case other =>
          throw new IllegalStateException(s"unexpected quantile: $other")
      }
    }
    val filtered =
      if (flags.isEmpty) withRatio
      else withRatio.filter(!flags.reduce(_ || _))
    filtered.drop("rent_admin_fee_ratio")
  }

  /** P2 keep-first dedup (analysis.py:85): pandas keeps the first
    * occurrence in file order. Reproduced with a row_number over the
    * carried (source_file, source_order) — deterministic, unlike
    * dropDuplicates.
    */
  def dedupKeepFirst(df: DataFrame,
      key: String = "jnc_id",
      orderCols: Seq[String] = Seq("source_file", "source_order")): DataFrame = {
    val w = Window.partitionBy(col(key))
      .orderBy(orderCols.map(col): _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** P3 dropna (analysis.py:88): drop rows with any null. Pandas drops
    * NaN; our ingest policy represents missing as null everywhere, so
    * na.drop("any") matches.
    */
  def dropMissing(df: DataFrame): DataFrame = df.na.drop("any")

  /** D7 target variable (analysis.py:76-78). */
  def addTargetVariable(df: DataFrame): DataFrame =
    df.withColumn("y", col("rent") + col("admin_fee"))

  /** clean_df (analysis.py:81-90): dedup → outliers → dropna. */
  def cleanDf(df: DataFrame): DataFrame =
    dropMissing(removeOutliers(dedupKeepFirst(df)))

  /** df2Xy feature list (analysis.py:93-112) — the 15 independent vars. */
  val indepVars: Seq[String] = Seq(
    "building_age", "building_floors", "area", "min_floor", "max_floor",
    "n_rooms", "service_room", "living_room", "dining_room", "kitchen",
    "n_stations", "walk_time_station_min", "walk_time_station_avg",
    "latitude", "longitude")

  def df2Xy(df: DataFrame): DataFrame =
    df.select((Seq("jnc_id") ++ indepVars ++ Seq("y")).map(col): _*)
}
