package graft.transform

import graft.functions.Parsers
import graft.schemas.Schemas
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** J1 geocode join (libs/otokuna/analysis.py:57-73): left equi-join of
  * properties onto the 5,358-row Tokyo location reference on a computed
  * kanji address key. The dim side is tiny → always broadcast; unmatched
  * rows keep null lat/lon (dropped later by clean, re-surfaced by the
  * prediction re-join).
  */
object Geocode {

  /** S5: the location reference CSV is Shift-JIS with a Japanese header.
    * Spark 4 restricts CSV charsets to a short allowlist by default; the
    * legacy conf re-enables the full JVM charset set for shift_jis.
    */
  def readLocationReference(spark: SparkSession, csvPath: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.javaCharsets", "true")
    spark.read
      .option("header", "true")
      .option("encoding", "shift_jis")
      .schema(Schemas.locationReference)
      .csv(csvPath)
      .withColumnRenamed("緯度", "latitude")
      .withColumnRenamed("経度", "longitude")
  }

  def addAddressCoords(df: DataFrame, locationRef: DataFrame): DataFrame = {
    val dim = locationRef
      .select(
        concat(col("都道府県名"), col("市区町村名"), col("大字町丁目名"))
          .as("join_key"),
        col("latitude"), col("longitude"))
    df.withColumn("join_key", Parsers.buildAddressKanji(col("building_address")))
      .join(broadcast(dim), Seq("join_key"), "left")
      .drop("join_key")
  }
}
