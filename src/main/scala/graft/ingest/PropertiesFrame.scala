package graft.ingest

import graft.functions.Parsers
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** make_properties_dataframe (libs/otokuna/scraping.py:316-363) as a
  * declarative Catalyst plan: every value parser is a Column expression
  * over the raw string frame, and the reference's try/except row-skip
  * (F12, scraping.py:274-287, 340-356) becomes a null-validity filter —
  * same surviving rows, but fully codegen'd and pushdown-friendly.
  */
object PropertiesFrame {

  /** Columns that must parse for a row to survive (building parse errors
    * drop every room of the building; room/feature errors drop the room —
    * exactly the reference's two skip sites).
    */
  private val requiredParsed = Seq(
    "building_age", "building_floors", "rent", "admin_fee", "deposit",
    "gratuity", "area", "__floor_range", "__layout", "ward", "jnc_id")

  /** Raw string records → the 29-column properties frame (+ jnc_id and
    * the source-order bookkeeping columns used by keep-first dedup).
    */
  def fromRaw(raw: DataFrame, fetchedAt: Option[Double] = None): DataFrame = {
    val walkTimes = transform(
      filter(col("building_transportation"), t => t =!= ""),
      t => Parsers.parseTransportation(t))

    val parsed = raw
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
      .withColumn("__walk_times", walkTimes)

    // Row-skip: any required parse failed, any non-empty transportation
    // entry unparseable (ParsingError in the feature block), or no
    // stations at all (min()/mean() of an empty list fails upstream).
    val valid = requiredParsed
      .map(col(_).isNotNull)
      .reduce(_ && _) &&
      !exists(col("__walk_times"), _.isNull) &&
      size(col("__walk_times")) >= 1

    val fetched: Column = fetchedAt
      .map(ts => lit(ts))
      .getOrElse(lit(null).cast("double"))

    parsed.filter(valid).select(
      col("jnc_id"),
      col("building_category"),
      col("building_title"),
      col("building_address"),
      col("building_transportation"),
      col("building_age"),
      col("building_floors"),
      col("rent"),
      col("admin_fee"),
      col("deposit"),
      col("gratuity"),
      col("layout"),
      col("area"),
      col("__floor_range").getField("min_floor").as("min_floor"),
      col("__floor_range").getField("max_floor").as("max_floor"),
      col("url"),
      col("new_arrival"),
      col("html_file_banner_timestamp"),
      col("html_file_last_modified_at"),
      col("__layout").getField("n_rooms").as("n_rooms"),
      col("__layout").getField("service_room").as("service_room"),
      col("__layout").getField("living_room").as("living_room"),
      col("__layout").getField("dining_room").as("dining_room"),
      col("__layout").getField("kitchen").as("kitchen"),
      size(col("__walk_times")).cast("long").as("n_stations"),
      array_min(col("__walk_times")).as("walk_time_station_min"),
      (aggregate(col("__walk_times"), lit(0.0), (a, x) => a + x) /
        size(col("__walk_times"))).as("walk_time_station_avg"),
      col("ward"),
      col("district"),
      fetched.as("html_file_fetched_at"),
      col("source_file"),
      col("source_order"),
    )
  }

  /** End-to-end scrape: dir-or-zip of HTML → properties frame
    * (the CLI lifecycle, scraping.py:366-410).
    */
  def scrape(spark: org.apache.spark.sql.SparkSession, path: String,
      fetchedAt: Option[Double] = None): DataFrame = {
    val pages =
      if (path.endsWith(".zip")) SuumoPages.readHtmlZip(spark, path)
      else SuumoPages.readHtmlDir(spark, path)
    fromRaw(SuumoPages.rawProperties(pages).toDF(), fetchedAt)
  }
}
