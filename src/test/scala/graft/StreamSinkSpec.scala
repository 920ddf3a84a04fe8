package graft

import java.nio.file.Files

import graft.streaming.EventsStream
import org.apache.spark.sql.functions._

class StreamSinkSpec extends SparkSpec {

  test("checkpointed streaming state survives a restart: resume, not recount") {
    // The operational property behind q124's continuously-maintained
    // dedup index: a streaming job dies mid-corpus and must RESUME
    // from its checkpoint, not recount. The proof is adversarial —
    // after phase 1 the already-processed input file is DELETED, so
    // phase 2's totals can only be right if phase 1's aggregation
    // state was restored from the checkpoint; a recovery failure
    // undercounts every phase-1 key and the batch compare fails.
    val root = Files.createTempDirectory("graft_ckpt")
    val in = root.resolve("in"); Files.createDirectories(in)
    val ck = root.resolve("ck").toString
    val docs = Tables(spark, sfDir, "documents")
    def drop(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val stage = root.resolve(s"stage_$name").toString
      df.coalesce(1).write.mode("overwrite").parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.copy(part.toPath, in.resolve(name))
    }
    val schema = docs.schema
    def runOnce(): Map[String, (Long, Long)] = {
      val q = spark.readStream.schema(schema).parquet(in.toString)
        .groupBy(substring(col("text"), 1, 100).as("dedup_key"))
        .agg(min(col("doc_id")).as("rep_id"), count(lit(1)).as("n"))
        .writeStream.outputMode("complete").format("memory")
        .queryName("graft_ckpt_recovery")
        .option("checkpointLocation", ck).start()
      q.processAllAvailable(); q.stop()
      spark.table("graft_ckpt_recovery").collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    }
    drop(docs.filter(col("doc_id") % 2 === 0), "a.parquet")
    val phase1 = runOnce()
    assert(phase1.nonEmpty)
    Files.delete(in.resolve("a.parquet")) // kill the raw evidence
    drop(docs.filter(col("doc_id") % 2 =!= 0), "b.parquet")
    val phase2 = runOnce()
    val batch = docs
      .groupBy(substring(col("text"), 1, 100).as("dedup_key"))
      .agg(min(col("doc_id")).as("rep_id"), count(lit(1)).as("n"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(phase2 === batch,
      "restarted stream does not equal the full-corpus batch index")
  }

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

  test("watermark timeout closes idle sessions in the stream") {
    import java.sql.Timestamp
    import graft.streaming.Sessionize
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    def ev(id: Long, uid: Long, sec: Long, v: Double) =
      Sessionize.Event(id, new Timestamp(sec * 1000), uid, "e", v)

    val input = MemoryStream[Sessionize.Event]
    val sessions = Sessionize.sessionizeStream(
      input.toDS().withWatermark("ts", "0 seconds"), gapSeconds = 600)
    val q = sessions.writeStream.format("memory")
      .queryName("sess_timeout").outputMode("append").start()
    try {
      // one user, two in-batch sessions: the first closes immediately
      input.addData(ev(1, 1, 1000, 1.0), ev(2, 1, 1100, 2.0),
        ev(3, 1, 5000, 3.0))
      q.processAllAvailable()
      val first = spark.table("sess_timeout")
        .as[Sessionize.Session].collect()
      assert(first.toSet === Set(Sessionize.Session(1, 1000, 1100, 2, 3.0)))
      // a far-future event advances the watermark past 5000+600 →
      // the open session times out and emits without more user-1 events
      input.addData(ev(10, 2, 100000, 1.0))
      q.processAllAvailable()
      // timeouts fire when a subsequent batch runs at the advanced watermark
      input.addData(ev(11, 2, 100001, 1.0))
      q.processAllAvailable()
      val all = spark.table("sess_timeout")
        .as[Sessionize.Session].collect().toSet
      assert(all.contains(Sessionize.Session(1, 5000, 5000, 1, 3.0)),
        s"idle session did not time out: $all")
    } finally {
      q.stop()
      spark.sql("DROP TABLE IF EXISTS sess_timeout")
    }
  }

  test("admissible late events merge into the open session, never corrupt it") {
    import java.sql.Timestamp
    import graft.streaming.Sessionize
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    def ev(id: Long, uid: Long, sec: Long, v: Double) =
      Sessionize.Event(id, new Timestamp(sec * 1000), uid, "e", v)

    val input = MemoryStream[Sessionize.Event]
    val sessions = Sessionize.sessionizeStream(
      input.toDS().withWatermark("ts", "1 hour"), gapSeconds = 600)
    val q = sessions.writeStream.format("memory")
      .queryName("sess_late").outputMode("append").start()
    try {
      input.addData(ev(1, 1, 2000, 1.0))
      q.processAllAvailable()
      // t=1800 is late but within the session's backward reach → merges
      // (start widens to 1800); t=900 is older than start−gap → its own
      // session, emitted immediately
      input.addData(ev(2, 1, 1800, 2.0), ev(3, 1, 900, 4.0))
      q.processAllAvailable()
      // advance the watermark far past last+gap, then run a batch so the
      // timeout fires and the merged session emits
      input.addData(ev(10, 2, 50000, 0.5))
      q.processAllAvailable()
      input.addData(ev(11, 2, 50001, 0.5))
      q.processAllAvailable()
      val got = spark.table("sess_late")
        .filter($"user_id" === 1).as[Sessionize.Session].collect().toSet
      assert(got === Set(
        Sessionize.Session(1, 900, 900, 1, 4.0),
        Sessionize.Session(1, 1800, 2000, 2, 3.0)), s"got $got")
    } finally {
      q.stop()
      spark.sql("DROP TABLE IF EXISTS sess_late")
    }
  }
}
