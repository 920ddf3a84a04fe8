package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Change-data-capture apply — MERGE-INTO semantics as two composable
  * pieces, the current-state complement of [[Scd2]]'s interval
  * history and the third leg of the steady-state story next to
  * [[DedupIndex]] (facts) and [[IncrementalAgg]] (aggregates): a
  * keyed snapshot advanced by a log of upserts and deletes, never
  * rebuilt from scratch.
  *
  * [[compact]] reduces a log to its final record per key as a single
  * map-side-combining `max(struct(ord..., op, attrs...))` aggregate —
  * an argmax by the caller's total order with NO window, no sort, and
  * partial aggregation doing most of the work before the shuffle (a
  * ROW_NUMBER formulation shuffles every log row; this shuffles one
  * candidate per key per map partition). [[merge]] folds a compacted
  * delta into a compacted snapshot with one full-outer equi-join:
  * delta wins per key (the delta is the LATER window by contract),
  * keys whose winning op is a delete leave the state. Because compact
  * is an argmax over a total order, the maintenance law
  * `merge(compact(history), compact(delta)) == live(compact(all))`
  * holds exactly whenever the delta's order keys are ≥ the
  * snapshot's — the daily-partition contract every CDC feed already
  * meets.
  */
object CdcApply {

  /** One row per key: the record with the greatest `ord` tuple.
    * `ord` must be a total order over the log (e.g. ts, then a
    * unique id as tie-break); `op`/`attrs` ride along inside the
    * struct and are only compared when `ord` ties, which a total
    * order never does. Output: (k, op, attrs...).
    */
  def compact(log: DataFrame, key: Column, ord: Seq[Column], op: Column,
      attrs: Seq[(String, Column)]): DataFrame = {
    require(ord.nonEmpty, "compact needs at least one ordering column")
    val packed = struct(
      ord.zipWithIndex.map { case (c, i) => c.as(s"_o$i") } ++
        (op.as("_op") +: attrs.map { case (n, c) => c.as(n) }): _*)
    log.groupBy(key.as("k")).agg(max(packed).as("f"))
      .select(col("k") +: col("f._op").as("op") +:
        attrs.map { case (n, _) => col(s"f.$n").as(n) }: _*)
  }

  /** Fold a compacted delta into a compacted snapshot (both in
    * [[compact]]'s (k, op, attrs...) schema): full-outer on the key,
    * the delta's record wins where present (it is the later window by
    * contract — `op` is never null in a well-formed log, so its
    * presence marks the delta side), and keys whose winning op equals
    * `deleteOp` drop out. Output is the LIVE state: (k, attrs...).
    *
    * Scale shape: the one join is equi on the key; write the snapshot
    * bucketed on k ([[Scale.writeBucketed]]) and the join consumes
    * the scan's partitioning, so steady state shuffles only the
    * delta — the [[DedupIndex]]/[[IncrementalAgg]] argument again.
    */
  def merge(snapshot: DataFrame, delta: DataFrame,
      deleteOp: String = "D"): DataFrame = {
    require(snapshot.columns.sameElements(delta.columns),
      "snapshot and delta must share the compacted schema")
    val attrs = snapshot.columns.drop(2) // k, op, attrs...
    val won = snapshot.columns.map(c =>
      when(col("d.op").isNotNull, col(s"d.$c"))
        .otherwise(col(s"s.$c")).as(c))
    snapshot.alias("s")
      .join(delta.alias("d"), col("s.k") === col("d.k"), "full_outer")
      .select(won: _*)
      .filter(col("op") =!= deleteOp)
      .select(col("k") +: attrs.map(col): _*)
  }
}
