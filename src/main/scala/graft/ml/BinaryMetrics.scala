package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Engine-exact binary-classifier evaluation from rank statistics.
  *
  * The quality-classifier stage of a curation pipeline (FastText-style
  * "is this page worth training on" scorers) needs AUC and a
  * threshold confusion matrix over BILLIONS of scored rows, and the
  * usual implementations fail the repo's two house rules at once:
  * sklearn-style sort-all-scores is a single-machine global sort, and
  * float tie-handling makes the answer partition-order dependent.
  * Here every input is an integer score, so ties are exact, and the
  * whole computation reduces to integer rank sums:
  *
  *   AUC = (R⁺ − P(P+1)/2) / (P·N)
  *
  * with R⁺ the positives' rank sum under AVERAGE ranks for ties (the
  * Mann–Whitney U statistic — Wilcoxon 1945). Per distinct score s
  * with cnt_s rows (pos_s positive) and cum_s rows strictly below,
  * each tied row's average rank is cum_s + (cnt_s+1)/2, so
  * 2·R⁺ = Σ_s pos_s·(2·cum_s + cnt_s + 1) stays integer — no halves,
  * no float order dependence; the one division happens once at the
  * end, 6dp-rounded (the repo's float-output parity rule).
  *
  * Scale shape: one map-side-combining groupBy collapses the corpus
  * to its distinct-score histogram; the cumulative-below counts come
  * from the two-phase range ranking (range partition + per-partition
  * totals collected to the driver as offsets — [[graft.operators
  * .Splits.rangeRanked]]'s layout), never a single-partition window.
  * Everything after the first aggregate moves #distinct-scores rows.
  */
object BinaryMetrics {

  /** One-row metrics frame: n_pos, n_neg, auc (6dp), and the
    * threshold-`thr` confusion matrix tp/fp/fn/tn with
    * precision/recall/f1 in integer micro-units (floor division —
    * deterministic, and replayable by any engine with integer
    * division). `label` must be boolean-valued, `score` integer-
    * valued (scale floats to their natural integer unit first, the
    * q79/q126 discipline); rows predict positive when score ≥ thr.
    * Degenerate inputs (no positives, no negatives, empty threshold
    * side) yield NULL for the affected ratio instead of a division
    * error, matching the SQL CASE the oracle replays.
    */
  def rankMetrics(df: DataFrame, label: Column, score: Column,
      thr: Long): DataFrame = {
    val g = df
      .select(score.cast("long").as("s"),
        label.cast("boolean").cast("long").as("y"))
      .groupBy(col("s"))
      .agg(count(lit(1)).as("cnt"), sum(col("y")).as("pos"))
    // Two-phase cumulative count of rows strictly below each distinct
    // score — the shared range-prefix machinery, no global window.
    val cum = graft.operators.Stats
      .rangePrefixSums(g, col("s"), Seq("cnt"))
      .withColumn("cum_below", col("cum_cnt") - col("cnt"))
    val a = cum.agg(
      sum(col("pos")).as("p"),
      sum(col("cnt") - col("pos")).as("n"),
      sum(col("pos") * (lit(2L) * col("cum_below") + col("cnt") + 1))
        .as("ranksum2"),
      sum(when(col("s") >= thr, col("pos")).otherwise(0L)).as("tp"),
      sum(when(col("s") >= thr, col("cnt") - col("pos")).otherwise(0L))
        .as("fp"))
    a.select(
      col("p").as("n_pos"), col("n").as("n_neg"),
      when(col("p") > 0 && col("n") > 0,
        round((col("ranksum2") - col("p") * (col("p") + 1)).cast("double")
          / (lit(2.0) * col("p") * col("n")), 6)).as("auc"),
      col("tp"), col("fp"),
      (col("p") - col("tp")).as("fn"), (col("n") - col("fp")).as("tn"),
      when(col("tp") + col("fp") > 0,
        expr("(tp * 1000000) div (tp + fp)")).as("precision_micro"),
      when(col("p") > 0, expr("(tp * 1000000) div p")).as("recall_micro"),
      when(col("tp") + col("fp") + col("p") > 0,
        expr("(2 * tp * 1000000) div (tp + fp + p)")).as("f1_micro"))
  }

  /** Reliability diagram bins — the calibration companion to
    * [[rankMetrics]] (AUC says the RANKING is good; calibration says
    * the SCORES mean what they claim): equal-WIDTH score bins
    * (floor division by `binWidth` — deterministic and stable as data
    * grows, where equal-frequency bins move with every batch), each
    * with its count, positive count, observed positive rate and mean
    * score in integer micro-units. A well-calibrated scorer has
    * pos_rate_micro tracking the bin's score; the drill-down is the
    * deliverable, so no curve summary is collapsed here.
    *
    * One map-side-combining aggregation — shuffle volume is #bins.
    * mean_score_micro = (Σs·10⁶) div n needs |Σs| ≤ ~9·10¹² — scores
    * in bounded units (the house integer-score discipline) keep that
    * true far past 10⁹ rows.
    */
  def calibrationBins(df: DataFrame, label: Column, score: Column,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    df.select(score.cast("long").as("s"),
        label.cast("boolean").cast("long").as("y"))
      .groupBy(expr(s"s div $binWidth").as("bin"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("n_pos"),
        sum(col("s")).as("sum_s"))
      .select(col("bin"), col("n"), col("n_pos"),
        expr("(n_pos * 1000000) div n").as("pos_rate_micro"),
        expr("(sum_s * 1000000) div n").as("mean_score_micro"))
  }
}
