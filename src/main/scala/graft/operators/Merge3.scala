package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Three-way table merge — git-merge semantics for data: two branches
  * (`ours`, `theirs`) diverged from a common `base` snapshot, and the
  * merge must classify every key as cleanly mergeable or conflicted.
  * This is the reconciliation step behind multi-writer lakehouse
  * branches, backfill-vs-live divergence, and A/B-maintained copies —
  * [[SnapshotDiff]] answers "what changed between two versions";
  * Merge3 answers "can three versions be reconciled, and to what".
  *
  * Inputs are keyed hash tables (k, h) — one row per key, `h` a
  * canonical row hash ([[Integrity.rowHash]] is the intended
  * producer; equal hash ⟺ equal row is the sync contract). Absence
  * of a key models deletion/non-existence. The classification is the
  * standard merge lattice, null-safe on every comparison:
  *
  *  - both sides equal base          → `unchanged`
  *  - ours equal base, theirs moved  → `take_theirs`
  *  - theirs equal base, ours moved  → `take_ours`
  *  - both moved, to the SAME value  → `both_same`
  *  - both moved, differently        → `conflict` (merged = null)
  *
  * "Moved" covers inserts and deletes uniformly because absence is
  * a null hash under the full-outer joins — delete-vs-update lands
  * in `conflict`, double-delete in `both_same`, disjoint inserts in
  * `take_*`, like-for-like inserts in `both_same`.
  *
  * Scale shape: two full-outer equi-joins on the key and a codegen'd
  * CASE chain — the same cost as [[SnapshotDiff]] run twice; nothing
  * row-width-sized rides the shuffle (hashes only), and the verdict
  * census downstream is one combining groupBy.
  */
object Merge3 {

  def threeWayMerge(base: DataFrame, ours: DataFrame,
      theirs: DataFrame): DataFrame = {
    val b = base.select(col("k"), col("h").as("h_base"))
    val o = ours.select(col("k"), col("h").as("h_ours"))
    val t = theirs.select(col("k"), col("h").as("h_theirs"))
    val j = b.join(o, Seq("k"), "full_outer")
      .join(t, Seq("k"), "full_outer")
    val oursSame = col("h_ours") <=> col("h_base")
    val theirsSame = col("h_theirs") <=> col("h_base")
    val bothSame = col("h_ours") <=> col("h_theirs")
    j.select(col("k"), col("h_base"), col("h_ours"), col("h_theirs"),
      when(oursSame && theirsSame, lit("unchanged"))
        .when(oursSame, lit("take_theirs"))
        .when(theirsSame, lit("take_ours"))
        .when(bothSame, lit("both_same"))
        .otherwise(lit("conflict")).as("verdict"),
      when(oursSame && theirsSame, col("h_base"))
        .when(oursSame, col("h_theirs"))
        .when(theirsSame, col("h_ours"))
        .when(bothSame, col("h_ours"))
        .otherwise(lit(null).cast("long")).as("h_merged"))
  }
}
