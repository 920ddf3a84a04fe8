package graft

import java.nio.file.Files

import graft.ingest.SyntheticSuumo

/** Drives the CLI surface the way a user would (modulo the in-process
  * session — ScrapeCli builds its own, which getOrCreate shares here).
  */
class ScrapeCliSpec extends SparkSpec {

  test("scrape CLI: dir → parquet and csv outputs") {
    val pages = SyntheticSuumo.writePages(
      Files.createTempDirectory("graft_cli_pages"), 2)
    val outP = Files.createTempDirectory("graft_cli_out").resolve("props").toString
    ScrapeCli.main(Array(pages.toString, outP,
      "--output-format", "parquet", "--fetched-today"))
    val back = spark.read.parquet(outP)
    assert(back.count() > 0)
    assert(back.columns.contains("jnc_id") && back.columns.length === 30)
    assert(back.filter(back("html_file_fetched_at").isNull).count() === 0)

    val outC = Files.createTempDirectory("graft_cli_out2").resolve("props").toString
    ScrapeCli.main(Array(pages.toString, outC))
    val csv = spark.read.option("header", "true").csv(outC)
    assert(csv.count() === back.count())
  }

  test("scrape CLI rejects bad arguments") {
    intercept[IllegalArgumentException] {
      ScrapeCli.main(Array("only-one-arg"))
    }
    intercept[IllegalArgumentException] {
      ScrapeCli.main(Array("a", "b", "--output-format", "xml"))
    }
  }
}
