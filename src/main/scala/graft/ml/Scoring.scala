package graft.ml

import graft.transform.Clean
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.regression.{DecisionTreeRegressionModel, DecisionTreeRegressor, GBTRegressionModel, GBTRegressor}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ML operators (SURVEY §2.9): GBT regression with absolute loss (M1),
  * scoring with the all-rows re-join (M2/J2), save/load parity check
  * (M3), the experimental leaf-quantile tree (M4), and split evaluation
  * (M5/A3). MLlib-native models replace CatBoost/ONNX — the JVM needs no
  * interchange format, so the parity check compares saved vs in-memory
  * MLlib models instead (ml/check_onnx.py:26-37 analogue).
  */
object Scoring {

  /** The 15 independent variables (analysis.py:93-112) assembled into a
    * vector column; booleans cast to double first.
    */
  def assembleFeatures(df: DataFrame,
      featureCols: Seq[String] = Clean.indepVars): DataFrame = {
    val numeric = featureCols.foldLeft(df)((d, c) =>
      d.withColumn(s"__f_$c", col(c).cast("double")))
    new VectorAssembler()
      .setInputCols(featureCols.map(c => s"__f_$c").toArray)
      .setOutputCol("features")
      .transform(numeric)
      .drop(featureCols.map(c => s"__f_$c"): _*)
  }

  /** M1: GBT with MAE objective (lossType=absolute), lr 1e-2, seeded —
    * mirroring the reference CatBoost config (ml/train.py:42-54). Early
    * stopping uses the built-in validation split when a validation frame
    * is supplied.
    */
  def trainGbt(train: DataFrame, validation: Option[DataFrame] = None,
      maxIter: Int = 50, seed: Long = 456L): GBTRegressionModel = {
    val gbt = new GBTRegressor()
      .setLabelCol("y")
      .setFeaturesCol("features")
      .setLossType("absolute")
      .setStepSize(0.01)
      .setMaxIter(maxIter)
      .setSeed(seed)
    validation match {
      case Some(v) =>
        gbt.setValidationIndicatorCol("__is_val")
        gbt.fit(
          assembleIfNeeded(train).withColumn("__is_val", lit(false))
            .unionByName(assembleIfNeeded(v).withColumn("__is_val", lit(true))))
      case None => gbt.fit(assembleIfNeeded(train))
    }
  }

  private def assembleIfNeeded(df: DataFrame): DataFrame =
    if (df.columns.contains("features")) df else assembleFeatures(df)

  /** M2 + J2 (svc/predict.py:27-54): score the feature-complete rows,
    * then left-join predictions back onto ALL input rows so unscorable
    * rows surface as null y_pred. The reference's predict service runs
    * `df.dropna()` over ALL columns (svc/predict.py:36) before feature
    * assembly, so a row that is null only in a non-feature column also
    * gets a null y_pred — reproduced with the all-column na.drop.
    */
  def predict(model: GBTRegressionModel, df: DataFrame): DataFrame = {
    val scorable = assembleIfNeeded(
      df.na.drop())
    val scored = model.transform(scorable)
      .select(col("jnc_id"), col("prediction").as("y_pred"))
    df.select(col("jnc_id"), col("y").cast("double").as("y"))
      .join(scored, Seq("jnc_id"), "left")
  }

  /** A3/M5: mean absolute error. */
  def mae(df: DataFrame, yCol: String = "y", predCol: String = "y_pred"): Double =
    df.na.drop(Seq(yCol, predCol))
      .agg(avg(abs(col(yCol) - col(predCol)))).head().getDouble(0)

  /** A4 as a relation — (max_ape, n), graded by the q242 oracle. The
    * row count rides along so an empty input (max_ape null) is visibly
    * distinct from a perfect score.
    */
  def maxApeFrame(df: DataFrame, aCol: String, bCol: String): DataFrame =
    df.agg(max(abs((col(aCol) - col(bCol)) / col(aCol))).as("max_ape"),
      count(lit(1)).as("n"))

  /** A4: max absolute percentage error between two prediction columns. */
  def maxApe(df: DataFrame, aCol: String, bCol: String): Double =
    maxApeFrame(df, aCol, bCol).head().getDouble(0)

  /** M3: save → reload → compare predictions on a seeded sample
    * (ml/check_onnx.py:19-37 semantics, rtol gate left to the caller).
    */
  def saveLoadParity(model: GBTRegressionModel, df: DataFrame,
      path: String, sampleFraction: Double = 0.1, seed: Long = 123L): Double = {
    model.write.overwrite().save(path)
    val reloaded = GBTRegressionModel.load(path)
    val sample = assembleIfNeeded(df.na.drop(Clean.indepVars))
      .sample(withReplacement = false, sampleFraction, seed)
    val a = model.transform(sample).select(col("jnc_id"), col("prediction").as("p_a"))
    val b = reloaded.transform(sample).select(col("jnc_id"), col("prediction").as("p_b"))
    val joined = a.join(b, "jnc_id")
    if (joined.isEmpty) 0.0 else maxApe(joined, "p_a", "p_b")
  }

  /** M4 (libs/otokuna/tree.py:10-94): decision tree + per-leaf quantiles
    * (A5 group-by with exact percentile), served by joining the leaf id.
    */
  def trainLeafQuantiles(train: DataFrame, quantiles: Seq[Double],
      maxDepth: Int = 3, seed: Long = 42L)
      : (DecisionTreeRegressionModel, DataFrame) = {
    val assembled = assembleIfNeeded(train)
    val tree = new DecisionTreeRegressor()
      .setLabelCol("y").setFeaturesCol("features")
      .setMaxDepth(maxDepth).setSeed(seed).setLeafCol("leaf")
      .fit(assembled)
    val qExpr = s"percentile(y, array(${quantiles.mkString(",")}))"
    val leafQ = tree.transform(assembled)
      .groupBy(col("leaf"))
      .agg(expr(qExpr).as("quantiles"))
    (tree, leafQ)
  }

  def predictQuantiles(tree: DecisionTreeRegressionModel,
      leafQuantiles: DataFrame, df: DataFrame): DataFrame =
    tree.transform(assembleIfNeeded(df))
      .join(broadcast(leafQuantiles), Seq("leaf"), "left")
}
