package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Schema discovery — profiling that infers STRUCTURE rather than
  * distributions (the [[Stats]] profiler's complement): which
  * functional dependencies hold (candidate keys, denormalization
  * checks) and which inclusion dependencies hold (foreign-key
  * discovery, referential-integrity audits). On a 100 TB lake these
  * are the checks that catch a broken ingest before a join silently
  * drops or duplicates rows.
  *
  * Both are exact and engine-replayable: an FD verdict is two nested
  * combining aggregates (per-determinant distinct dependents, then
  * one row of counts); an IND verdict is two distincts and an
  * anti-join — nothing quadratic, nothing driver-side. Null contract:
  * a null determinant is a regular group (SQL GROUP BY semantics,
  * identical in both engines); null dependents are ignored by the
  * DISTINCT count (SQL COUNT(DISTINCT) semantics); null child values
  * are excluded from inclusion checks (SQL IN semantics would make
  * them vacuous anyway).
  */
object SchemaDiscovery {

  /** One row per candidate FD `det → dep`: (det, dep, n_groups,
    * n_violating, holds) where a violating group is a determinant
    * value mapping to more than one distinct dependent. Each pair is
    * its own pass (different grouping key — there is no shared
    * shuffle to fuse); results union.
    */
  def functionalDependencies(df: DataFrame,
      pairs: Seq[(String, String)]): DataFrame = {
    require(pairs.nonEmpty, "need at least one (det, dep) pair")
    pairs.map { case (det, dep) =>
      df.groupBy(col(det).as("d"))
        .agg(countDistinct(col(dep)).as("cd"))
        .agg(count(lit(1)).as("n_groups"),
          sum(when(col("cd") > 1, 1L).otherwise(0L)).as("n_violating"))
        .select(lit(det).as("det"), lit(dep).as("dep"),
          col("n_groups"), col("n_violating"),
          (col("n_violating") === 0).as("holds"))
    }.reduce(_.unionByName(_))
  }

  /** One row per candidate IND `child ⊆ parent`: (label,
    * n_child_distinct, n_missing, holds) — n_missing counts distinct
    * non-null child values absent from the parent column. The parent
    * side reduces to its distinct values BEFORE the anti-join (the
    * join runs distinct-vs-distinct, never row-level).
    */
  def inclusionDependencies(
      specs: Seq[(String, DataFrame, String, DataFrame, String)])
      : DataFrame = {
    require(specs.nonEmpty, "need at least one IND spec")
    specs.map { case (label, child, childCol, parent, parentCol) =>
      val cv = child.select(col(childCol).as("v"))
        .filter(col("v").isNotNull).distinct()
      val pv = parent.select(col(parentCol).as("v"))
        .filter(col("v").isNotNull).distinct()
      val missing = cv.join(pv, Seq("v"), "left_anti")
        .agg(count(lit(1)).as("n_missing"))
      cv.agg(count(lit(1)).as("n_child_distinct"))
        .crossJoin(broadcast(missing))
        .select(lit(label).as("label"), col("n_child_distinct"),
          col("n_missing"), (col("n_missing") === 0).as("holds"))
    }.reduce(_.unionByName(_))
  }
}
