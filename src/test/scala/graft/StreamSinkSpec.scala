package graft

import java.nio.file.Files

import graft.streaming.EventsStream
import org.apache.spark.sql.functions._

class StreamSinkSpec extends SparkSpec {

  test("append-mode parquet sink emits exactly the watermark-closed windows") {
    val out = Files.createTempDirectory("graft_stream_out").toString
    val ckpt = Files.createTempDirectory("graft_stream_ckpt").toString
    EventsStream.windowedToParquetSink(spark, sfDir, out, ckpt)

    val emitted = spark.read.parquet(out)
    assert(emitted.count() > 0)

    val ev = Tables(spark, sfDir, "events")
    val maxTs = ev.agg(max(col("ts").cast("long"))).head().getLong(0)
    val watermark = maxTs - 3600
    val batch = ev
      .groupBy(window(col("ts"), "3 hours"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window").getField("start").cast("long").as("bucket_start"),
        col("window").getField("end").cast("long").as("bucket_end"),
        col("event_type"), col("n"))
    // closed = window end at or before the final watermark
    val closed = batch.filter(col("bucket_end") <= watermark)
    assert(emitted.exceptAll(closed).count() === 0,
      "sink emitted a window the batch aggregation does not have closed")
    assert(closed.exceptAll(emitted).count() === 0,
      "a closed window is missing from the sink output")
    // the trailing (open) windows are withheld by design
    assert(batch.count() > closed.count())
  }
}
