package graft

import graft.ingest.PropertiesFrame
import graft.ml.Scoring
import graft.sources.Sinks
import graft.transform.{Clean, Geocode, Serve}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The daily batch lifecycle (SURVEY §3.2, PredictDailyMachine) as one
  * driver: scrape → geocode join → target → clean → train → score with
  * the all-rows re-join → serving frame, each stage materialized to
  * parquet under the output dir (the reference's per-Lambda S3 artifacts).
  *
  * Usage: PipelineCli <html_dir_or_zip> <location_csv> <out_dir> [--cpus N]
  */
object PipelineCli {

  def main(args: Array[String]): Unit = {
    var positional = Vector.empty[String]
    var cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "--cpus" =>
          require(i + 1 < args.length, "--cpus needs a value")
          cpus = args(i + 1); i += 2
        case other => positional :+= other; i += 1
      }
    }
    require(positional.length == 3,
      "usage: PipelineCli <html_dir_or_zip> <location_csv> <out_dir> [--cpus N]")
    val Vector(htmlPath, locationCsv, outDir) = positional

    val preExisting = SparkSession.getActiveSession
      .orElse(SparkSession.getDefaultSession).isDefined
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-daily")
      .config("spark.sql.shuffle.partitions", cpus)
      // small scan splits: HTML pages fan out without a repartition
      .config("spark.sql.files.maxPartitionBytes", s"${4 * 1024 * 1024}")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      // scrape (the ScrapePropertyData stage)
      val fetchedAt = math.rint(System.currentTimeMillis() / 1000.0)
      val scraped = PropertiesFrame.scrape(spark, htmlPath, Some(fetchedAt))
      Sinks.writeParquet(scraped.drop("source_file", "source_order"),
        s"$outDir/scraped")

      // geocode + clean + train + predict (the Predict stage)
      val dim = Geocode.readLocationReference(spark, locationCsv)
      val cleaned = Clean.cleanDf(Clean.addTargetVariable(
        Geocode.addAddressCoords(scraped, dim))).cache()
      try {
        val splits = graft.operators.Splits
          .threeWay(cleaned, valRatio = 0.1875, testRatio = 0.25, seed = 123L)
        val model = Scoring.trainGbt(splits("train"), Some(splits("val")),
          maxIter = 50)
        val predictions = Scoring.predict(model, cleaned)
        Sinks.writeParquet(predictions, s"$outDir/prediction")

        // serving frame (join_dataframes)
        val served = Serve.joinDataframes(predictions,
          cleaned.drop("y"))
        Sinks.writeParquet(served, s"$outDir/served")
        val mae = Scoring.mae(Scoring.predict(model, splits("test")))
        println(s"pipeline done: ${cleaned.count()} cleaned rows, " +
          f"test MAE $mae%.2f -> $outDir")
      } finally cleaned.unpersist()
    } finally if (!preExisting) spark.stop()
  }
}
