package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated testdata tables (see TESTDATA.md).
  * Plain parquet scans — filters/projections above these are pushed down
  * by Catalyst into the parquet reader.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  /** `events.ts` arrives in either of two parquet physical layouts
    * depending on the generator: TIMESTAMP(NANOS) — which Spark's
    * vectorized reader rejects ([PARQUET_TYPE_ILLEGAL]), so it is read
    * as raw nano longs via the legacy conf and truncated to micros —
    * or TIMESTAMP(MICROS) (tz-naive), which Spark reads directly as
    * TIMESTAMP_NTZ. Both normalize to a microsecond TimestampType
    * column in the UTC session (every entrypoint pins
    * spark.sql.session.timeZone=UTC, so the NTZ cast and
    * timestamp_micros agree on the instant). Sub-microsecond precision
    * is irrelevant to every query's semantics here (events are seconds
    * apart; buckets are minutes+).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    raw.withColumn("ts", normalizedTs(raw.schema("ts").dataType))
  }

  /** The ONE place both readers (this batch loader and
    * [[graft.streaming.EventsStream]]'s file source) turn a raw `ts`
    * column of either physical layout into the canonical
    * microsecond TimestampType — shared so a third layout, or a fix
    * to the truncation, cannot be applied to one reader and silently
    * break every streaming-equals-batch grade through the other.
    */
  def normalizedTs(
      raw: org.apache.spark.sql.types.DataType): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    raw match {
      case org.apache.spark.sql.types.LongType =>
        timestamp_micros(expr("ts div 1000"))
      case _ => col("ts").cast("timestamp")
    }
  }
}
