package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured Streaming ingestion of the events table (SURVEY §2.10
  * extension): file source → watermark → tumbling-window aggregation,
  * drained synchronously with processAllAvailable for batch-parity
  * checks. At scale the same plans run continuously; every stateful op
  * here expires its state by the watermark.
  */
object EventsStream {

  /** Raw parquet schema with `ts` replaced by the layout-dependent
    * type (see [[eventsStream]]).
    */
  private def rawSchema(tsType: DataType) = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", tsType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** The streaming file source requires a directory: stream the sf dir
    * with a glob filter selecting only events.parquet. `events.ts`
    * arrives in either of two physical layouts (same story as
    * [[graft.Tables.events]], which this mirrors so streaming equals
    * batch bit-for-bit): TIMESTAMP(NANOS) — read as raw nano longs via
    * the legacy conf and truncated to micros — or TIMESTAMP(MICROS)
    * tz-naive, read as TIMESTAMP_NTZ and cast in the UTC session. The
    * layout is probed from the parquet footer with a one-off batch
    * schema read (metadata only, no data scan) because a streaming
    * source needs its schema declared up front.
    */
  private[streaming] def eventsStream(spark: SparkSession, sfDir: String) = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val tsType =
      spark.read.parquet(s"$sfDir/events.parquet").schema("ts").dataType
    spark.readStream
      .schema(rawSchema(tsType))
      .option("pathGlobFilter", "events.parquet")
      .parquet(sfDir)
      .withColumn("ts", graft.Tables.normalizedTs(tsType))
  }

  /** The one windowed aggregation both the memory-drain query (q40) and
    * the parquet sink share — kept single-sourced so they cannot drift.
    */
  private def windowedAgg(spark: SparkSession, sfDir: String): DataFrame =
    eventsStream(spark, sfDir)
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "3 hours"), col("event_type"))
      .agg(count(lit(1)).as("n"))

  /** Drain a streaming frame through a memory sink and return the rows
    * materialized (the temp view is dropped — otherwise every call leaks
    * a full result copy in the session catalog).
    */
  private[streaming] def drainToLocal(df: DataFrame, prefix: String,
      mode: String = "complete"): DataFrame = {
    val spark = df.sparkSession
    val name = prefix + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = df.writeStream
      .outputMode(mode)
      .format("memory")
      .queryName(name)
      .start()
    try {
      q.processAllAvailable()
    } finally q.stop()
    val result = spark.table(name)
    val materialized = spark.createDataFrame(
      new java.util.ArrayList(java.util.Arrays.asList(result.collect(): _*)),
      result.schema)
    spark.catalog.dropTempView(name)
    materialized
  }

  /** 3-hour tumbling-window counts per event type, computed as a real
    * streaming query over the parquet file source. Complete output mode
    * so the drained result equals the batch aggregation exactly.
    */
  def windowedCounts(spark: SparkSession, sfDir: String): DataFrame =
    drainToLocal(windowedAgg(spark, sfDir), "graft_stream_")
      .select(col("window").getField("start").cast("long").as("bucket_start"),
        col("event_type"), col("n"))
      .orderBy(col("bucket_start"), col("event_type"))

  /** Production-shaped sink: append-mode windowed aggregation to a real
    * parquet sink with a checkpoint directory. Append emits a window only
    * once the watermark passes its end, so after draining a bounded
    * source the output contains exactly the closed windows (the trailing
    * ones stay in state — that is append-mode semantics, verified in
    * StreamSinkSpec against the batch aggregation).
    */
  def windowedToParquetSink(spark: SparkSession, sfDir: String,
      outDir: String, checkpointDir: String): Unit = {
    val agg = windowedAgg(spark, sfDir)
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

  /** Streaming keyed dedup — the streaming face of P2.
    * dropDuplicatesWithinWatermark is the state-bounded form: plain
    * dropDuplicates("event_id") would keep every id seen FOREVER (the
    * watermark only expires dedup state when the event-time column is
    * part of the key set), which OOMs a continuous run.
    */
  def dedupCount(spark: SparkSession, sfDir: String): DataFrame = {
    val deduped = eventsStream(spark, sfDir)
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"))
    drainToLocal(deduped, "graft_dedup_").orderBy(col("event_type"))
  }

  /** Raw documents schema for the streaming file source (matches
    * documents.parquet; Tables reads the same columns in batch).
    */
  private val documentsSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  private[streaming] def documentsStream(spark: SparkSession,
      sfDir: String): DataFrame =
    spark.readStream
      .schema(documentsSchema)
      .option("pathGlobFilter", "documents.parquet")
      .parquet(sfDir)

  /** The exact-dedup index maintained BY Structured Streaming — the
    * continuous form of q33's batch hash-groupBy and the streaming
    * face of [[graft.operators.DedupIndex]]: the stateful aggregation
    * state IS the (key → min id, count) representative table, updated
    * per micro-batch, so a continuously-ingesting corpus keeps its
    * dedup index current without any batch rebuild. State is bounded
    * by the number of DISTINCT keys (the index's own size — the
    * inherent floor for exact dedup), not by stream length. Complete
    * mode: the drained table must equal the batch index bit-for-bit
    * (streaming-equals-batch), graded through q124 reusing q33's
    * oracle end to end.
    */
  def streamedDedupIndex(spark: SparkSession, sfDir: String): DataFrame =
    drainToLocal(
      documentsStream(spark, sfDir)
        .groupBy(substring(col("text"), 1, 100).as("dedup_key"))
        .agg(min(col("doc_id")).as("rep_id"),
          count(lit(1)).as("group_size")),
      "graft_dedupidx_")
      .select(col("rep_id"), col("group_size"))
      .orderBy(col("rep_id"))

  /** The count-min cell table maintained BY Structured Streaming —
    * the continuous form of q116's batch sketch. The (row, pos)
    * grouped count runs as stateful streaming aggregation in complete
    * mode, so state is exactly the 2·w cells (bounded regardless of
    * stream length — the whole point of sketching a stream) and the
    * drained result must equal the batch-built cells bit-for-bit:
    * streaming-equals-batch, graded through q118 reusing the q116
    * probes end to end.
    */
  def streamedCmsCells(spark: SparkSession, sfDir: String,
      w: Int): DataFrame =
    drainToLocal(graft.operators.FrequencySketch.cmsCells(
      eventsStream(spark, sfDir), col("user_id"), w), "graft_cms_")

  /** q135's CDC live state maintained BY Structured Streaming: the
    * [[graft.operators.CdcApply.compact]] argmax runs as a stateful
    * complete-mode aggregation (it is just `max(struct)` per key, so
    * state is one record per key — the live table's own size), and
    * the delete filter applies on the drained result. On the bounded
    * source this must equal the batch one-shot compact of the full
    * log bit-for-bit: argmax over a total order is arrival-order
    * insensitive, the same argument as the q134 monoid. Graded
    * through q136 reusing q135's full-log oracle.
    */
  def streamedCdcLive(spark: SparkSession, sfDir: String): DataFrame =
    drainToLocal(
      graft.operators.CdcApply.compact(
        eventsStream(spark, sfDir), col("user_id"),
        Seq(col("ts"), col("event_id")),
        when(col("event_type") === "error", lit("D")).otherwise(lit("U")),
        Seq("last_us" -> unix_micros(col("ts")),
          "event_type" -> col("event_type"), "value" -> col("value"))),
      "graft_cdc_")
      .filter(col("op") =!= "D")
      .select(col("k"), col("last_us"), col("event_type"), col("value"))

  /** The HyperLogLog register table maintained BY Structured
    * Streaming — the continuous form of q141's batch sketch and the
    * cheapest possible distinct-tracking state: the (group, register)
    * max-rank aggregation runs as a stateful complete-mode streaming
    * aggregation, so state is at most 64 rows per group REGARDLESS of
    * how many distinct keys the stream ever carries — the sketch
    * property is exactly what bounds the streaming state. max() is
    * order-insensitive, so the drained registers equal the batch-built
    * registers bit-for-bit (streaming-equals-batch, graded through
    * q142 with the same replayable integer estimate as q141).
    */
  def streamedHllRegisters(spark: SparkSession, sfDir: String): DataFrame =
    drainToLocal(
      graft.operators.HyperLogLog.registers(
        eventsStream(spark, sfDir), col("event_type"), col("user_id")),
      "graft_hll_")

  /** q153's hopping-window counts as a CONTINUOUS query: the same
    * sliding `window(ts, 3 hours, 1 hour)` as a stateful streaming
    * aggregation, drained in COMPLETE mode for batch parity — which
    * means state here is every window ever opened (time span ÷ slide
    * on the bounded source; Spark does NOT apply watermark eviction
    * in complete mode, so complete is only for bounded replays and
    * parity checks). A true continuous deployment runs the SAME
    * aggregation in append/update mode with the watermark — the shape
    * [[windowedToParquetSink]] demonstrates — where state is bounded
    * by lateness ÷ slide. Counts are order-insensitive longs, so the
    * drained result equals the batch hopping aggregation bit-for-bit,
    * graded through q154 with q153's oracle shape.
    */
  def hoppingCounts(spark: SparkSession, sfDir: String): DataFrame =
    drainToLocal(
      eventsStream(spark, sfDir)
        .groupBy(window(col("ts"), "3 hours", "1 hour").as("w"),
          col("event_type"))
        .agg(count(lit(1)).as("n")),
      "graft_hop_")
      .select(col("w").getField("start").cast("long").as("bucket_start"),
        col("event_type"), col("n"))
      .orderBy(col("bucket_start"), col("event_type"))

  /** q148's data-contract counts maintained BY Structured Streaming —
    * the ingestion gate as a continuous query: the fused conditional
    * counts run as a complete-mode streaming aggregation whose entire
    * state is ONE row of N+1 longs however long the stream runs, so a
    * contract can sit on a live feed for free. Long sums are
    * order-insensitive, so the drained counts equal the batch pass
    * bit-for-bit (streaming-equals-batch, graded through q149 with a
    * q148-shape oracle over the events table). The report unpacking
    * runs on the drained row — explode-after-aggregate is not a
    * streaming-supported plan shape, and does not need to be.
    */
  def streamedExpectations(spark: SparkSession, sfDir: String,
      checks: Seq[(String, org.apache.spark.sql.Column)]): DataFrame =
    graft.operators.Expectations.report(
      drainToLocal(
        graft.operators.Expectations.counts(
          eventsStream(spark, sfDir), checks),
        "graft_expect_"),
      checks.map(_._1))

  /** Per-group top-k maintained BY Structured Streaming — the typed
    * [[graft.plans.TopKByKey]] Aggregator as CONTINUOUS state: unlike
    * the declarative sketch aggregations (CMS q118, HLL q142), this
    * proves the custom-Aggregator surface also runs as a stateful
    * streaming aggregation — state per group is the O(k) buffer, the
    * exact property that makes a "live leaderboard" viable on an
    * unbounded stream. The buffer's retained set is arrival-order
    * free (total (score DESC, id ASC) order), so the drained result
    * equals the batch aggregation bit-for-bit (graded through q156
    * against the same ROW_NUMBER oracle shape as q155).
    */
  def streamedTopK(spark: SparkSession, sfDir: String,
      k: Int): DataFrame = {
    val cents = (signum(col("value")) *
      floor(abs(col("value")) * 100 + lit(0.5))).cast("long")
    drainToLocal(
      eventsStream(spark, sfDir)
        .groupBy(col("event_type"))
        .agg(graft.plans.TopKByKey.topK(cents, col("event_id"), k)
          .as("tk")),
      "graft_topk_")
      .select(col("event_type"), posexplode(col("tk")))
      .select(col("event_type"), (col("pos") + 1).cast("long").as("rank"),
        col("col._1").as("value_cents"), col("col._2").as("event_id"))
      .orderBy(col("event_type"), col("rank"))
  }

  /** q162's exponentially decayed counters maintained BY Structured
    * Streaming: the per-type freshness-weighted count runs as a
    * stateful streaming aggregation — the decayed sum is an integer
    * sum of per-row weights, a commutative monoid, so state is one
    * (n, Σw) pair per group updated per micro-batch, and arrival
    * order cannot move a bit. The reference date comes from a
    * metadata-cheap batch max over the same bounded source (a
    * continuous deployment passes its cutoff explicitly — the decay
    * law needs SOME fixed "now" to be replayable at all; recomputing
    * "now" per batch would make old rows' weights drift, which is a
    * re-aggregation, not a counter). Drained in complete mode it
    * must equal [[graft.operators.Decay.decayedCounts]] bit-for-bit
    * — streaming-equals-batch, graded through q169 reusing q162's
    * VALUES-table oracle.
    */
  def streamedDecayedCounts(spark: SparkSession, sfDir: String,
      num: Long, den: Long, maxAge: Int): DataFrame = {
    val ref = graft.Tables(spark, sfDir, "events")
      .filter(col("ts").isNotNull)
      .agg(max(to_date(col("ts")))).head().getDate(0)
    val w = graft.operators.Decay.weightsMicro(num, den, maxAge)
    val wt = element_at(array(w.map(lit): _*),
      least(datediff(lit(ref), to_date(col("ts"))), lit(maxAge))
        .cast("int") + 1)
    drainToLocal(
      eventsStream(spark, sfDir)
        .filter(col("ts").isNotNull)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(wt).as("decayed_micro")),
      "graft_decay_")
      .orderBy(col("event_type"))
  }

  private val ordersSchema = StructType(Seq(
    StructField("o_orderkey", LongType),
    StructField("o_custkey", LongType),
    StructField("o_orderstatus", StringType),
    StructField("o_totalprice", DoubleType),
    StructField("o_orderdate", TimestampType),
    StructField("o_orderpriority", StringType)))

  /** The materialized-view state maintained BY Structured Streaming —
    * the continuous form of q132's batch [[graft.operators
    * .IncrementalAgg]] maintenance. The per-group (cnt, scaled sum,
    * min, max) monoid runs as a stateful streaming aggregation in
    * complete mode: state size is exactly |groups| (the MV's own
    * size), updated per micro-batch, no nightly recompute anywhere.
    * Drained on the bounded source it must equal the batch state
    * bit-for-bit — the long-sum state is order-insensitive, so
    * arrival order cannot move a bit (streaming-equals-batch, graded
    * through q134 reusing q132's full-recompute oracle).
    */
  def streamedMvState(spark: SparkSession, sfDir: String): DataFrame =
    drainToLocal(
      graft.operators.IncrementalAgg.state(
        spark.readStream.schema(ordersSchema)
          .option("pathGlobFilter", "orders.parquet").parquet(sfDir),
        col("o_custkey"), col("o_totalprice"), digits = 2),
      "graft_mv_")
}
