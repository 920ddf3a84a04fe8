package graft.operators

import graft.operators.Checkpoints.TruncateOps
import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** 2-D skyline (Pareto frontier): the rows not dominated on two
  * integer criteria — "no other row is at least as good on both and
  * strictly better on one". Curation uses it directly (the
  * cost/quality frontier of candidate training mixes; the
  * size-vs-price frontier of the domain tables) and it is the classic
  * example of an operator whose naive form is a quadratic self-join.
  *
  * For two dimensions the frontier has a sweep-line identity: after
  * reducing to one row per distinct x (the per-x minimum y — ties in
  * x are dominated by their own group minimum), a row is on the
  * frontier iff its y is STRICTLY below every y at strictly smaller
  * x. So the operator is (1) one map-side-combining groupBy to the
  * per-x cell table, then (2) a strict prefix-min over ascending x in
  * the q117/[[Stats.rangePrefixSums]] two-phase layout: range-
  * partition on x, per-partition minima to the driver (≤
  * shuffle.partitions longs), broadcast the cumulative prior-
  * partition minima back as offsets, and finish with a PARTITION-
  * LOCAL window — no single-partition window, no quadratic join, at
  * any |distinct x|.
  *
  * Both criteria MINIMIZE; negate a column to maximize it. Nulls in
  * either dimension are excluded (dominance is undefined for them).
  */
object Skyline {

  /** The frontier rows as (x, y), ascending x (strictly descending
    * y — the frontier's defining shape). Long.MaxValue is reserved as
    * the "no prior partition" sentinel; a real y of Long.MaxValue on
    * the first x would be kept spuriously — negate-to-maximize stays
    * clear of it by construction (negation of a long > Long.MinValue).
    */
  def frontierMin(df: DataFrame, x: Column, y: Column): DataFrame = {
    val spark = df.sparkSession
    val cells = df.select(x.cast("long").as("x"), y.cast("long").as("y"))
      .filter(col("x").isNotNull && col("y").isNotNull)
      .groupBy(col("x")).agg(min(col("y")).as("y"))
    val keyed = cells.repartitionByRange(col("x"))
      .sortWithinPartitions(col("x"))
      .withColumn("__pid", spark_partition_id().cast("long"))
      .truncated
    val totals = keyed.groupBy(col("__pid")).agg(min(col("y")).as("m"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val offsets = totals.map(_._1)
      .zip(totals.map(_._2).scanLeft(Long.MaxValue)(math.min).init)
    val offSchema = StructType(Seq(StructField("__pid", LongType),
      StructField("__off", LongType)))
    val offRows: java.util.List[Row] = java.util.Arrays.asList(
      offsets.map { case (pid, off) => Row(pid, off) }.toSeq: _*)
    val offDf = spark.createDataFrame(offRows, offSchema)
    val w = Window.partitionBy(col("__pid")).orderBy(col("x"))
      .rowsBetween(Window.unboundedPreceding, -1)
    keyed.join(broadcast(offDf), Seq("__pid"))
      .withColumn("__pm", least(col("__off"),
        coalesce(min(col("y")).over(w), lit(Long.MaxValue))))
      .filter(col("y") < col("__pm"))
      .select(col("x"), col("y"))
  }
}
