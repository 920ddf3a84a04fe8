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

  private def removeOutliersWith(df: DataFrame,
      quantileExpr: String => String): DataFrame = {
    val withRatio = df.withColumn("rent_admin_fee_ratio",
      col("admin_fee").cast("double") / col("rent").cast("double"))
    val cols = Seq("area", "n_rooms", "building_age", "rent",
      "rent_admin_fee_ratio")
    val qRow = withRatio.agg(
      expr(quantileExpr(cols.head)),
      cols.tail.map(c => expr(quantileExpr(c))): _*).head()
    // an empty (or all-null) input yields null quantiles → no outliers;
    // approx_percentile also preserves the input type (long cols → long)
    //
    // Each equality flag is coalesced to false: a null comparand (a
    // genuinely-null column, or the null ratio Spark's non-ANSI Divide
    // yields for rent == 0 — a legal value, parse_money maps '-' to 0)
    // must KEEP the row here, matching pandas where ratio = inf and
    // `inf == q` is False. Rows with real missing data are still dropped
    // afterwards by dropMissing, preserving the reference's dropna
    // ordering; the transient ratio column is dropped before that, so
    // zero-rent rows survive cleaning exactly as in the reference.
    val flags = cols.zipWithIndex.flatMap { case (c, i) =>
      if (qRow.isNullAt(i)) None
      else qRow.get(i) match {
        case n: java.lang.Number =>
          Some(coalesce(col(c).cast("double") === lit(n.doubleValue()),
            lit(false)))
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
