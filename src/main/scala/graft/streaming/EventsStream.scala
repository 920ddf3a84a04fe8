package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured Streaming ingestion of the events table (SURVEY §2.10
  * extension): file source → watermark → tumbling-window aggregation,
  * drained synchronously with processAllAvailable for batch-parity
  * checks. At scale this runs continuously with the same plan; the
  * watermark bounds state.
  */
object EventsStream {

  /** Raw parquet schema with ts as nanosecond longs (the nanos-as-long
    * legacy read, same as Tables.events).
    */
  private val rawSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** The streaming file source requires a directory: stream the sf dir
    * with a glob filter selecting only events.parquet.
    */
  private def eventsStream(spark: SparkSession, sfDir: String) = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.readStream
      .schema(rawSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(sfDir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  /** 3-hour tumbling-window counts per event type, computed as a real
    * streaming query over the parquet file source. Complete output mode
    * so the drained result equals the batch aggregation exactly.
    */
  def windowedCounts(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val stream = eventsStream(spark, sfDir)
    val agg = stream
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "3 hours"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val name = "graft_stream_" +
      java.util.UUID.randomUUID().toString.replace("-", "")
    val q = agg.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(name)
      .start()
    try {
      q.processAllAvailable()
    } finally q.stop()
    spark.table(name)
      .select(col("window").getField("start").cast("long").as("bucket_start"),
        col("event_type"), col("n"))
      .orderBy(col("bucket_start"), col("event_type"))
  }

  /** Production-shaped sink: append-mode windowed aggregation to a real
    * parquet sink with a checkpoint directory. Append emits a window only
    * once the watermark passes its end, so after draining a bounded
    * source the output contains exactly the closed windows (the trailing
    * ones stay in state — that is append-mode semantics, verified in
    * StreamSinkSpec against the batch aggregation).
    */
  def windowedToParquetSink(spark: SparkSession, sfDir: String,
      outDir: String, checkpointDir: String): Unit = {
    val agg = eventsStream(spark, sfDir)
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "3 hours"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window").getField("start").cast("long").as("bucket_start"),
        col("window").getField("end").cast("long").as("bucket_end"),
        col("event_type"), col("n"))
    val q = agg.writeStream
      .outputMode("append")
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .start()
    try {
      q.processAllAvailable()
    } finally q.stop()
  }

  /** Streaming keyed dedup: dropDuplicates on event_id within the
    * watermark — the streaming face of P2.
    */
  def dedupCount(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val stream = eventsStream(spark, sfDir)
    val deduped = stream
      .withWatermark("ts", "1 hour")
      .dropDuplicates("event_id")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"))
    val name = "graft_dedup_" +
      java.util.UUID.randomUUID().toString.replace("-", "")
    val q = deduped.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(name)
      .start()
    try {
      q.processAllAvailable()
    } finally q.stop()
    spark.table(name).orderBy(col("event_type"))
  }
}
