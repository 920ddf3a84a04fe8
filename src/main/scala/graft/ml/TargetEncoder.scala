package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Out-of-fold target encoding — the leakage-safe categorical encoder.
  * Naive target encoding (category → mean of y over ALL rows) leaks
  * each row's own label into its feature; the standard fix assigns
  * rows to k folds and encodes each (category, fold) cell with the
  * mean over the OTHER folds: (S_cat − S_cat,fold) / (n_cat − n_fold).
  *
  * Determinism end to end: folds come from the repo's LCG order key
  * (partition-independent content hash of the id), the target is
  * accumulated in integer cents (sign-safe half-up, the q79/q106
  * quantization), and the out-of-fold mean is ONE double division over
  * exact integer sums, rounded 6dp — so the encoder table
  * hash-matches a SQL replay. A category living entirely inside one
  * fold has no out-of-fold data: its mean is null, surfaced rather
  * than silently imputed (the caller chooses the prior).
  *
  * Scale shape: one (cat, fold) groupBy with map-side combine — the
  * cell table is |cats|·k rows — then a broadcast-sized self-join of
  * per-cat totals onto cells. Nothing row-count-sized ever shuffles
  * twice; the encoder table is tiny by construction and broadcasts
  * into the downstream row-level join for free.
  */
object TargetEncoder {

  def oofMeans(df: DataFrame, id: Column, cat: Column, y: Column,
      k: Int): DataFrame = {
    require(k >= 2, "need at least 2 folds for out-of-fold means")
    val cells = df.select(
        cat.as("cat"),
        // reduce the id mod 2^31 BEFORE the LCG multiply: the product
        // then fits in 62 bits, so fold assignment never hits long
        // wraparound (id * 1103515245 would wrap for ids >= ~8.4e9,
        // silently in Spark, as an overflow error in the oracle). For
        // ids < 2^31 the result is identical to multiplying directly.
        pmod(pmod(pmod(id.cast("long"), lit(2147483648L)) * 1103515245L
          + 12345L, lit(2147483648L)), lit(k.toLong)).as("fold"),
        (signum(y.cast("double")) *
          floor(abs(y.cast("double")) * 100 + lit(0.5))).cast("long")
          .as("cents"))
      .groupBy(col("cat"), col("fold"))
      .agg(count(lit(1)).as("n_fold"), sum(col("cents")).as("s_fold"))
    val totals = cells.groupBy(col("cat"))
      .agg(sum(col("n_fold")).as("n_cat"), sum(col("s_fold")).as("s_cat"))
    cells.join(broadcast(totals), Seq("cat"))
      .select(col("cat"), col("fold"), col("n_fold"),
        when(col("n_cat") > col("n_fold"),
          round((col("s_cat") - col("s_fold")).cast("double") /
            ((col("n_cat") - col("n_fold")) * 100.0), 6))
          .as("oof_mean"))
  }
}
