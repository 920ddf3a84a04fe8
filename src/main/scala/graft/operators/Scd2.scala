package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (type 2) build from an event log: collapse
  * each key's attribute timeline into validity intervals
  * [valid_from, valid_to) — the dimension-table construction step of a
  * warehouse load, and the provenance layer a training pipeline needs
  * before features can be joined as-of example time without leakage
  * (the interval table this emits is exactly what
  * [[graft.operators.AsOfJoin]] / [[graft.operators.RangeJoin]]
  * consume).
  *
  * Timeline resolution is integer MICROSECONDS (`unix_micros`, the
  * repo's events idiom — bit-replayable as `epoch_ns // 1000`), with
  * `tieBreak` ordering equal timestamps, so run boundaries are a total
  * order and the output is deterministic in any engine and any
  * partitioning.
  *
  * Scale shape: ONE exchange total, on the key. The change-flag and
  * running-sum windows share one (key)-partitioned (ts, tie) sort; the
  * per-run groupBy keys on (key, run_id) — a superset of the existing
  * hash(key) partitioning, so Catalyst inserts no second Exchange —
  * and the closing `lead` window reuses the same distribution with a
  * re-sort on (key, run_id). Per-key state never leaves its partition;
  * nothing is corpus-wide.
  */
object Scd2 {

  /** One row per (key, attribute run): `valid_from_us` inclusive,
    * `valid_to_us` exclusive (null = current), `n_events` in the run,
    * `is_current`. Null attributes form runs of their own (null-safe
    * change comparison) rather than splitting on every row.
    */
  def build(events: DataFrame, key: Column, attr: Column, ts: Column,
      tieBreak: Column): DataFrame = {
    val w = Window.partitionBy(col("k")).orderBy(col("ts_us"), col("tb"))
    val runs = events
      .select(key.as("k"), attr.as("attr"),
        unix_micros(ts).as("ts_us"), tieBreak.as("tb"))
      .withColumn("chg",
        when(lag(col("attr"), 1).over(w) <=> col("attr"), 0L).otherwise(1L))
      .withColumn("run_id", sum(col("chg"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val byRun = Window.partitionBy(col("k")).orderBy(col("run_id"))
    runs
      .groupBy(col("k"), col("run_id"))
      .agg(min(col("attr")).as("attr"),
        min(col("ts_us")).as("valid_from_us"),
        count(lit(1)).as("n_events"))
      .withColumn("valid_to_us",
        lead(col("valid_from_us"), 1).over(byRun))
      .select(col("k"), col("attr"), col("valid_from_us"),
        col("valid_to_us"), col("n_events"),
        col("valid_to_us").isNull.as("is_current"))
  }

  /** Point-in-time snapshot read over a [[build]] interval table: the
    * state of every key AT `tUs` micros — rows whose
    * [valid_from_us, valid_to_us) interval contains the instant
    * (current rows have null valid_to_us = unbounded). Time travel
    * without storing snapshots: one codegen'd scan-side filter,
    * embarrassingly parallel, no shuffle — and when the interval
    * table is stored partitioned/z-ordered by validity time the scan
    * prunes to the files overlapping `tUs` (the q78/q94 layouts).
    * Keys born after `tUs` simply have no row, which IS the correct
    * historical answer.
    */
  def snapshotAt(intervals: DataFrame, tUs: Long): DataFrame =
    intervals.filter(col("valid_from_us") <= tUs &&
      (col("valid_to_us").isNull || col("valid_to_us") > tUs))

  /** Temporal (validity-interval) join of two SCD2 timelines on the
    * same entity key: one output row per pair of intervals that
    * OVERLAP in time, carrying both attributes and the intersected
    * [from, to) window — the feature-store alignment step ("which
    * (attrA, attrB) combinations were ever simultaneously true, and
    * when"), and the general bitemporal building block.
    *
    * Inputs are two [[build]] outputs (k, attr, valid_from_us,
    * valid_to_us, …); output: (k, attr_a, attr_b, from_us, to_us)
    * with null to_us = still open on both sides. Half-open interval
    * algebra: [a, b) ∩ [c, d) is non-empty iff a < d ∧ c < b (nulls
    * = +∞).
    *
    * Scale shape: an equi-join on the ENTITY KEY with the overlap
    * predicate as a post-filter — per-key work is |runs_A|·|runs_B|
    * for that key, bounded by attribute churn (runs per entity are
    * dozens, not data-sized), never a cross-table nested loop; the
    * planner keys the exchange on k exactly like any SortMergeJoin.
    * For keyLESS interval joins use [[RangeJoin]]'s binning instead —
    * different operator for a different shape.
    */
  def temporalJoin(a: DataFrame, b: DataFrame): DataFrame = {
    val inf = Long.MaxValue
    val l = a.select(col("k"), col("attr").as("attr_a"),
      col("valid_from_us").as("fa"),
      coalesce(col("valid_to_us"), lit(inf)).as("ta"))
    val r = b.select(col("k"), col("attr").as("attr_b"),
      col("valid_from_us").as("fb"),
      coalesce(col("valid_to_us"), lit(inf)).as("tb"))
    l.join(r, Seq("k"))
      .filter(col("fa") < col("tb") && col("fb") < col("ta"))
      .select(col("k"), col("attr_a"), col("attr_b"),
        greatest(col("fa"), col("fb")).as("from_us"),
        when(least(col("ta"), col("tb")) === inf, lit(null).cast("long"))
          .otherwise(least(col("ta"), col("tb"))).as("to_us"))
  }
}
