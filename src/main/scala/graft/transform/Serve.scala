package graft.transform

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The serving-layer query (app/app.py:155-166 join_dataframes): score,
  * join, global sort, rename — D8/J3/O1/D9.
  */
object Serve {

  /** predictionDf: (jnc_id, y, y_pred); scrapedDf: properties frame.
    * Returns the scored, sorted serving frame. The prediction side is the
    * smaller (already-aggregated) input in the reference; at scale both
    * sides are fact-sized → shuffle hash join on jnc_id.
    */
  def joinDataframes(predictionDf: DataFrame, scrapedDf: DataFrame): DataFrame =
    predictionDf
      .withColumn("otokuna_score", col("y_pred") / col("y"))
      .join(scrapedDf, Seq("jnc_id"), "left")
      .orderBy(col("otokuna_score").desc)
      .withColumnRenamed("y", "monthly_cost")
      .withColumnRenamed("y_pred", "monthly_cost_predicted")

  /** J2 prediction re-join (svc/predict.py:42-44): all scraped rows kept,
    * y_pred null where the model could not score.
    */
  def rejoinPredictions(scored: DataFrame, yDf: DataFrame): DataFrame =
    yDf.join(scored.select("jnc_id", "y_pred"), Seq("jnc_id"), "left")
}
