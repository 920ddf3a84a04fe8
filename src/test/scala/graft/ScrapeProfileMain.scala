package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import java.nio.file.Paths

/** Round-17 q24 stage breakdown: binaryFile read+decode vs extract
  * flatMap vs Catalyst parse layer vs to_json serialization.
  */
object ScrapeProfileMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes", s"${4 * 1024 * 1024}")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val pages = graft.ingest.SyntheticSuumo.writePages(
      Paths.get(System.getProperty("java.io.tmpdir"), "graft_bench_pages"),
      150, buildingsPerPage = 50, roomsPerBuilding = 4)
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(label: String)(f: => Unit): Unit = {
      f; f // warm
      val t = (1 to 8).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.min
      println(f"$label: $t%.3f s")
    }
    val dir = pages.toString
    time("read pages only")(noop(
      graft.ingest.SuumoPages.readHtmlDir(spark, dir).toDF()))
    time("read+extract raw")(noop(graft.ingest.SuumoPages.rawProperties(
      graft.ingest.SuumoPages.readHtmlDir(spark, dir)).toDF()))
    time("full fromRaw")(noop(
      graft.ingest.PropertiesFrame.scrape(spark, dir, Some(1.6254e9))))
    time("full + to_json drop")(noop(
      graft.ingest.PropertiesFrame.scrape(spark, dir, Some(1.6254e9))
        .drop("source_file", "html_file_last_modified_at")
        .withColumn("building_transportation",
          to_json(col("building_transportation")))))
    // isolate the Filter/Project double-evaluation of the parser layer:
    // parsed columns only, no validity filter
    import graft.functions.Parsers
    val raw = graft.ingest.SuumoPages.rawProperties(
      graft.ingest.SuumoPages.readHtmlDir(spark, dir)).toDF()
    time("parsers, no filter")(noop(raw
      .withColumn("building_age", Parsers.parseAge(col("building_age_s")))
      .withColumn("building_floors", Parsers.parseFloors(col("building_floors_s")))
      .withColumn("rent", Parsers.parseMoney(col("rent_s"), "万円"))
      .withColumn("admin_fee", Parsers.parseMoney(col("admin_fee_s"), "円"))
      .withColumn("deposit", Parsers.parseMoney(col("deposit_s"), "万円"))
      .withColumn("gratuity", Parsers.parseMoney(col("gratuity_s"), "万円"))
      .withColumn("area", Parsers.parseArea(col("area_s")))
      .withColumn("__floor_range", Parsers.parseFloorRange(col("floor_s")))
      .withColumn("__layout", Parsers.parseLayout(col("layout")))
      .withColumn("ward", Parsers.parseWard(col("building_address")))
      .withColumn("district", Parsers.parseDistrict(col("building_address")))))
    // scalar parsers only, no higher-order array exprs: stays codegen'd
    time("parsers scalar-only")(noop(raw
      .withColumn("building_age", Parsers.parseAge(col("building_age_s")))
      .withColumn("building_floors", Parsers.parseFloors(col("building_floors_s")))
      .withColumn("rent", Parsers.parseMoney(col("rent_s"), "万円"))
      .withColumn("admin_fee", Parsers.parseMoney(col("admin_fee_s"), "円"))
      .withColumn("deposit", Parsers.parseMoney(col("deposit_s"), "万円"))
      .withColumn("gratuity", Parsers.parseMoney(col("gratuity_s"), "万円"))
      .withColumn("area", Parsers.parseArea(col("area_s")))
      .withColumn("__floor_range", Parsers.parseFloorRange(col("floor_s")))
      .withColumn("__layout", Parsers.parseLayout(col("layout")))
      .withColumn("ward", Parsers.parseWard(col("building_address")))
      .withColumn("district", Parsers.parseDistrict(col("building_address")))
      .drop("building_transportation")))
    // walk_times higher-order exprs alone
    time("walk_times only")(noop(raw.select(
      transform(filter(col("building_transportation"), t => t =!= ""),
        t => Parsers.parseTransportation(t)).as("__walk_times"))))
    spark.stop()
  }
}
