package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exponentially time-decayed counters — the freshness-weighted
  * popularity signal (trending hosts, decaying document-quality
  * priors, recency-weighted user activity) that every curation
  * pipeline keeps next to its raw counts.
  *
  * The textbook form Σ λ^age is a transcendental per row (pow), which
  * is neither bit-reproducible across engines nor cheap. Here λ is
  * the rational num/den and the weight for an integer age in days
  * comes from the integer recurrence
  *
  *   w₀ = 10⁶,  w_{d+1} = (w_d · num) div den
  *
  * — micro-unit truncating decay, fully deterministic, generated ONCE
  * on the driver as a lookup literal (`maxAge`+1 entries, a few
  * hundred bytes broadcast inside the plan; ages clamp to `maxAge`,
  * by which point a 0.9-daily weight is below 4% anyway). The per-row
  * work is a codegen'd array index — no join, no pow — and the
  * aggregate is an integer sum: order-independent, so the decayed
  * counter is hash-exact under any partitioning, and replayable by
  * any engine that can hold the same VALUES table
  * ([[weightsMicro]] is the single source for both).
  *
  * Scale shape: one narrow projection + one map-side-combining
  * groupBy — identical to a plain count. The reference date is the
  * corpus max(ts) (one-row agg attached by broadcast cross join, plan
  * stays lazy); pass a fixed reference through a literal-bearing
  * one-row frame instead when reproducing a historical cutoff.
  */
object Decay {

  /** The micro-unit decay table: index d = weight for age d days.
    * Exposed so oracle SQL builds its VALUES list from the SAME
    * recurrence (never a parallel float pow). */
  private[graft] def weightsMicro(num: Long, den: Long,
      maxAge: Int): Seq[Long] = {
    require(num >= 0 && den > 0 && num <= den && maxAge >= 0,
      s"decay must be a rational in [0,1]: $num/$den, maxAge $maxAge")
    Iterator.iterate(1000000L)(m => m * num / den).take(maxAge + 1).toSeq
  }

  /** Per-`key` (n, decayed_micro): row count and the micro-unit decayed
    * count Σ w(age) with age = days from each row's `ts` to the corpus
    * max, clamped at `maxAge`. Rows with null `ts` are excluded (no
    * age, no weight — the na-handling decided at ingest).
    */
  def decayedCounts(df: DataFrame, key: Column, ts: Column,
      num: Long, den: Long, maxAge: Int): DataFrame = {
    val w = weightsMicro(num, den, maxAge)
    val ref = df.filter(ts.isNotNull)
      .agg(max(to_date(ts)).as("__ref"))
    df.filter(ts.isNotNull)
      .select(key.as("k"), to_date(ts).as("__d"))
      .crossJoin(broadcast(ref))
      .select(col("k"),
        element_at(array(w.map(lit): _*),
          least(datediff(col("__ref"), col("__d")), lit(maxAge))
            .cast("int") + 1).as("wt"))
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n"), sum(col("wt")).as("decayed_micro"))
  }
}
