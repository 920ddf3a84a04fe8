package graft

import java.nio.file.Files

import graft.ingest.SyntheticSuumo

class PipelineCliSpec extends SparkSpec {

  test("daily pipeline CLI: scrape -> clean -> train -> predict -> serve") {
    val pages = SyntheticSuumo.writePages(
      Files.createTempDirectory("graft_pipe_pages"), 8)
    val csv = SyntheticSuumo.writeLocationCsv(
      Files.createTempDirectory("graft_pipe_loc"))
    val out = Files.createTempDirectory("graft_pipe_out").toString
    PipelineCli.main(Array(pages.toString, csv.toString, out))

    val scraped = spark.read.parquet(s"$out/scraped")
    val prediction = spark.read.parquet(s"$out/prediction")
    val served = spark.read.parquet(s"$out/served")
    assert(scraped.count() > 0)
    assert(prediction.columns.sorted.toSeq === Seq("jnc_id", "y", "y_pred"))
    assert(served.columns.contains("otokuna_score") &&
      served.columns.contains("monthly_cost_predicted"))
    // serving frame is score-sorted descending
    val scores = served.select("otokuna_score")
      .collect().map(_.getDouble(0)).toSeq
    assert(scores === scores.sorted(Ordering[Double].reverse))
  }
}
