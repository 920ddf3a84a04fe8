package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Change-data-capture between two snapshots of the same keyed table —
  * the daily-dump diff a recurring scrape pipeline needs (the reference
  * re-dumps the full listing set every run; what changed between dumps
  * is the actionable signal: new listings, delisted ones, rent moves).
  *
  * Semantics: one row per key present in either snapshot whose compared
  * values differ (or that exists on only one side), tagged
  * added/removed/changed, with the old and new value of every compared
  * column. Unchanged keys are dropped.
  *
  * Scale shape: a single full-outer sort-merge join co-partitioned on
  * the key — one shuffle of each snapshot, no broadcast (both sides are
  * corpus-sized). The change test is a null-safe struct comparison, so
  * it is a narrow codegen'd projection on the joined rows. With both
  * snapshots written bucketed on the key (Scale.writeBucketed) the
  * Exchange disappears entirely and the diff is a zero-shuffle
  * per-bucket merge — the layout a daily 100 TB diff would run on.
  */
object SnapshotDiff {

  /** Diff `newDf` against `oldDf` on `key`, comparing `compareCols`.
    * Output: key, change_type ∈ {added, removed, changed}, and
    * old_<c>/new_<c> for each compared column.
    */
  def diff(oldDf: DataFrame, newDf: DataFrame, key: String,
      compareCols: Seq[String]): DataFrame = {
    val o = oldDf.select((key +: compareCols).map(col): _*)
      .withColumn("__old", lit(1))
      .select(col(key) +: col("__old") +:
        compareCols.map(c => col(c).as(s"old_$c")): _*)
    val n = newDf.select((key +: compareCols).map(col): _*)
      .withColumn("__new", lit(1))
      .select(col(key) +: col("__new") +:
        compareCols.map(c => col(c).as(s"new_$c")): _*)
    val oldStruct = struct(compareCols.map(c => col(s"old_$c")): _*)
    val newStruct = struct(compareCols.map(c => col(s"new_$c")): _*)
    val changeType: Column =
      when(col("__old").isNull, lit("added"))
        .when(col("__new").isNull, lit("removed"))
        .when(!(oldStruct <=> newStruct), lit("changed"))
    o.join(n, Seq(key), "full_outer")
      .withColumn("change_type", changeType)
      .filter(col("change_type").isNotNull)
      .select(col(key) +: col("change_type") +:
        compareCols.flatMap(c => Seq(col(s"old_$c"), col(s"new_$c"))): _*)
  }

  /** Apply a [[diff]] changelog to a base snapshot, reconstructing the
    * new one: removed keys drop, changed keys take the new values,
    * added keys insert. `applyDiff(old, diff(old, new)) == new` on
    * (key ++ compareCols) — the round-trip CurationSpec pins.
    *
    * This is why the diff is worth storing: restoring or shipping a
    * daily 100 TB snapshot needs only the base plus a changelog that is
    * |added| + |removed| + |changed| rows — one co-partitioned left
    * join against the base (zero-shuffle when base and changelog are
    * bucketed on the key), not a full rewrite of unchanged rows.
    */
  def applyDiff(oldDf: DataFrame, diffDf: DataFrame, key: String,
      compareCols: Seq[String]): DataFrame = {
    val base = oldDf.select((key +: compareCols).map(col): _*)
    val changes = diffDf.select(col(key) +: col("change_type") +:
      compareCols.map(c => col(s"new_$c")): _*)
    val merged = base.join(changes, Seq(key), "left")
      .filter(col("change_type").isNull || col("change_type") === "changed")
      .select(col(key) +: compareCols.map(c =>
        when(col("change_type") === "changed", col(s"new_$c"))
          .otherwise(col(c)).as(c)): _*)
    val added = diffDf.filter(col("change_type") === "added")
      .select(col(key) +: compareCols.map(c => col(s"new_$c").as(c)): _*)
    merged.unionByName(added)
  }
}
