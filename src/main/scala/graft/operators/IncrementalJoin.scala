package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental maintenance of a JOIN view — the missing third of the
  * materialized-view family ([[IncrementalAgg]] maintains aggregates,
  * [[CdcApply]] maintains current-state tables; this maintains an
  * inner equi-join). For append-only sides the delta algebra is
  * exact set theory, not approximation:
  *
  *   (A ∪ ΔA) ⋈ (B ∪ ΔB)
  *     = A⋈B  ∪  ΔA⋈(B ∪ ΔB)  ∪  A⋈ΔB
  *
  * so the new view is the old view plus two delta joins — nothing
  * history×history is ever recomputed. The three terms partition the
  * new pairs (ΔA⋈ΔB lands in the middle term exactly once), so the
  * union is disjoint and needs no dedup pass.
  *
  * Scale shape: ΔA⋈B_new shuffles only ΔA when B is dim-sized
  * (broadcast) or bucket-joined when both are facts; A⋈ΔB touches
  * history ONLY through a join keyed on ΔB's keys — with ΔB tiny
  * (the usual "a few new dimension rows" case) Spark broadcasts it
  * and the history side streams through a scan, no history shuffle.
  * A nightly full recompute is the O(|A|⋈|B|) job this replaces;
  * steady state costs O(Δ ⋈ counterpart).
  *
  * Append-only is a CONTRACT, not a limitation dodge: updates/deletes
  * belong to [[CdcApply]]'s compact-then-merge, and a caller with
  * updating dims should maintain the view over the CDC-compacted
  * current state instead.
  */
object IncrementalJoin {

  /** One maintenance step: previous view `oldView` = oldA ⋈ oldB on
    * `key`, plus insert-only `deltaA`/`deltaB`, → the new view.
    * All frames must share the projected output columns: callers
    * project BEFORE maintenance so the view stores only what it
    * serves (column pruning is part of the contract — a view carrying
    * every source column re-pays the width at every merge).
    */
  def mergeDelta(oldView: DataFrame, oldA: DataFrame, deltaA: DataFrame,
      oldB: DataFrame, deltaB: DataFrame, key: String): DataFrame = {
    val newB = oldB.unionByName(deltaB)
    val fromDeltaA = deltaA.join(newB, Seq(key))
    val fromDeltaB = oldA.join(deltaB, Seq(key))
    oldView.unionByName(fromDeltaA.unionByName(fromDeltaB))
  }
}
