package graft.transform

import java.time.{Instant, LocalDate, ZoneId, ZoneOffset}
import java.time.format.DateTimeFormatter

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Serving-layer helpers from app/app.py: date/id conversions (F14), JST
  * formatting (F15), the latest-per-date collapse over listing keys
  * (A7 + P4), and the job-info record (§1.1.5).
  */
object AppServe {

  /** F14 iso2date (app/app.py:199-204): ISO datetime → date string. */
  def iso2date(iso: String): String =
    java.time.LocalDateTime.parse(iso).toLocalDate.toString

  /** F14 date2dataid (app/app.py:207-212): date → midnight epoch seconds.
    * The reference uses the process-local timezone; we pin UTC for
    * determinism (configurable).
    */
  def date2dataid(date: String, zone: ZoneId = ZoneOffset.UTC): Long =
    LocalDate.parse(date).atStartOfDay(zone).toEpochSecond

  /** F15 (app/app.py:47-50): epoch seconds → JST wall-clock string. */
  def formatJst(epochSeconds: Column): Column =
    date_format(
      from_utc_timestamp(timestamp_seconds(epochSeconds), "Asia/Tokyo"),
      "yyyy-MM-dd HH:mm:ss")

  def formatJst(epochSeconds: Double): String =
    DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")
      .withZone(ZoneId.of("Asia/Tokyo"))
      .format(Instant.ofEpochSecond(epochSeconds.toLong))

  /** A7 + P4 (app/app.py:280-294): from a frame of listing keys, regex-
    * extract the ISO datetime, keep the latest per date. The reference's
    * dict-overwrite keeps the last in key order; sorted keys make that
    * the max — reproduced with a deterministic row_number.
    */
  def latestPerDate(keys: DataFrame, keyCol: String = "key",
      pattern: String = ".*/(\\d{4}-\\d{2}-\\d{2})T(\\d{2}:\\d{2}:\\d{2})/.*")
      : DataFrame = {
    val extracted = keys
      .withColumn("date", regexp_extract(col(keyCol), pattern, 1))
      .withColumn("time", regexp_extract(col(keyCol), pattern, 2))
      .filter(col("date") =!= "")
    val w = Window.partitionBy(col("date"))
      .orderBy(col("time").desc, col(keyCol).desc)
    extracted.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Job-info record (svc/save_job_info.py:22-29, app/app.py:30-50). */
  final case class JobInfo(
      job_id: String,
      timestamp: Double,
      user_id: String,
      search_url: String,
      search_conditions: String,
      raw_data_key: String,
      scraped_data_key: String,
      prediction_data_key: String)

  /** O3 (app/app.py:322): jobs sorted by (timestamp, user_id). */
  def sortJobs(jobs: DataFrame): DataFrame =
    jobs.orderBy(col("timestamp"), col("user_id"))
}
