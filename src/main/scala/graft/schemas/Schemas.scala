package graft.schemas

import org.apache.spark.sql.types._

/** Explicit schemas — the single source of truth (SURVEY §1.2-1.3).
  * The reference's schema is implicit (pandas-inferred); the golden frame
  * at libs/tests/test_scraping.py:221-255 enumerates it.
  */
object Schemas {

  /** The properties fact table: jnc_id key + 29 columns, in the
    * reference's column order. Missing values are `null` (not NaN) —
    * policy fixed at ingest (SURVEY §7 risk 1).
    */
  val properties: StructType = StructType(Seq(
    StructField("jnc_id", StringType, nullable = false),
    StructField("building_category", StringType, nullable = true),
    StructField("building_title", StringType, nullable = true),
    StructField("building_address", StringType, nullable = true),
    StructField("building_transportation", ArrayType(StringType), nullable = true),
    StructField("building_age", LongType, nullable = true),
    StructField("building_floors", LongType, nullable = true),
    StructField("rent", LongType, nullable = true),
    StructField("admin_fee", LongType, nullable = true),
    StructField("deposit", LongType, nullable = true),
    StructField("gratuity", LongType, nullable = true),
    StructField("layout", StringType, nullable = true),
    StructField("area", DoubleType, nullable = true),
    StructField("min_floor", LongType, nullable = true),
    StructField("max_floor", LongType, nullable = true),
    StructField("url", StringType, nullable = true),
    StructField("new_arrival", BooleanType, nullable = true),
    StructField("html_file_banner_timestamp", DoubleType, nullable = true),
    StructField("html_file_last_modified_at", DoubleType, nullable = true),
    StructField("n_rooms", LongType, nullable = true),
    StructField("service_room", BooleanType, nullable = true),
    StructField("living_room", BooleanType, nullable = true),
    StructField("dining_room", BooleanType, nullable = true),
    StructField("kitchen", BooleanType, nullable = true),
    StructField("n_stations", LongType, nullable = true),
    StructField("walk_time_station_min", DoubleType, nullable = true),
    StructField("walk_time_station_avg", DoubleType, nullable = true),
    StructField("ward", StringType, nullable = true),
    StructField("district", StringType, nullable = true),
    StructField("html_file_fetched_at", DoubleType, nullable = true),
  ))

  /** Location reference dim (SJIS CSV, 10 cols —
    * libs/otokuna/data/location_reference_tokyo/13_2019.csv header).
    */
  val locationReference: StructType = StructType(Seq(
    StructField("都道府県コード", IntegerType),
    StructField("都道府県名", StringType),
    StructField("市区町村コード", IntegerType),
    StructField("市区町村名", StringType),
    StructField("大字町丁目コード", LongType),
    StructField("大字町丁目名", StringType),
    StructField("緯度", DoubleType),
    StructField("経度", DoubleType),
    StructField("原典資料コード", IntegerType),
    StructField("大字・字・丁目区分コード", IntegerType),
  ))

  /** Prediction table (svc/predict.py:42-44). */
  val prediction: StructType = StructType(Seq(
    StructField("jnc_id", StringType, nullable = false),
    StructField("y", DoubleType, nullable = true),
    StructField("y_pred", DoubleType, nullable = true),
  ))
}
