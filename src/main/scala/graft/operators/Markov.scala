package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** First-order Markov transition tables from event sequences — the
  * sequence-statistics companion to q119's (context, target) example
  * construction: where q119 emits training PAIRS, this emits the
  * aggregate transition MODEL (next-event priors, session-flow
  * dashboards, anomalous-transition detection baselines).
  */
object Markov {

  /** Laplace-smoothed transition table over per-`seqKey` sequences:
    * one row per OBSERVED (prev, next) state pair with its count and
    * the add-one-smoothed probability in integer micro-units,
    *
    *   p_micro = ((c(prev,next) + 1) · 10⁶) div (c(prev·) + V)
    *
    * with V the number of distinct states in the input — so the
    * implicit probability of every unseen transition is the same
    * 1/(c+V) mass the smoothing reserves, and each row's probability
    * is exact integer arithmetic: engine-replayable, no float sums.
    * (Emitting observed pairs only keeps the output sparse — V² rows
    * of mostly-smoothing-floor is dashboard noise at web-scale state
    * counts; the floor is recoverable from c(prev·) and V.)
    *
    * Sequence order is (`orderKeys`...) within each `seqKey` — pass a
    * total order (e.g. event time THEN id, the q119 convention) or
    * tied rows make `lead` nondeterministic. The window partitions by
    * sequence key: per-sequence row counts are bounded by actor
    * activity, never corpus-sized — the legitimate window shape.
    * After the lead, everything is map-side-combining aggregation;
    * the row-marginal join re-keys on `prev` (state-cardinality
    * rows), and V attaches as a broadcast one-row frame, keeping the
    * whole plan lazy.
    */
  def transitions(df: DataFrame, seqKey: Column, orderKeys: Seq[Column],
      state: Column): DataFrame = {
    require(orderKeys.nonEmpty, "need at least one ordering column")
    val oks = orderKeys.zipWithIndex.map { case (c, i) => c.as(s"__o$i") }
    val w = Window.partitionBy(col("__k"))
      .orderBy(orderKeys.indices.map(i => col(s"__o$i")): _*)
    val pairs = df
      .select((seqKey.as("__k") +: state.as("prev") +: oks): _*)
      .withColumn("next", lead(col("prev"), 1).over(w))
      .filter(col("next").isNotNull)
    val c = pairs.groupBy(col("prev"), col("next"))
      .agg(count(lit(1)).as("c"))
    val rowTotal = c.groupBy(col("prev")).agg(sum(col("c")).as("c_prev"))
    val v = df.select(state.as("s")).distinct()
      .agg(count(lit(1)).as("v"))
    c.join(rowTotal, Seq("prev"))
      .crossJoin(broadcast(v))
      .select(col("prev"), col("next"), col("c"),
        expr("((c + 1) * 1000000) div (c_prev + v)").as("p_micro"))
  }
}
