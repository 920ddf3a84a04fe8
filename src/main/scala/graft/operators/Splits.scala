package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Seeded dataset splits (reference: libs/otokuna/analysis.py:115-149,
  * split_dataset — shuffle indices, slice exact counts n_val = int(n*r)).
  *
  * `threeWay` reproduces the exact-count semantics: a seeded random order +
  * row_number slicing, so |val| == floor(n*valRatio) and
  * |test| == floor(n*testRatio) exactly. The global row_number is a total
  * sort — fine for ML-split-sized tables; for 100 TB-scale sampling use
  * `fractionSample` (no shuffle, scan-local).
  */
object Splits {

  def threeWay(df: DataFrame, valRatio: Double, testRatio: Double,
      seed: Long): Map[String, DataFrame] = {
    val n = df.count()
    val nVal = (n * valRatio).toLong
    val nTest = (n * testRatio).toLong
    // rand(seed) is seeded per PARTITION, so membership would change with
    // the partition count; a content hash is pseudo-random, seeded, and
    // partition-independent — Verify output stays byte-stable. (Byte-
    // identical rows tie on the hash and row_number splits them
    // arbitrarily, but interchangeable rows make that unobservable.)
    val rnd = xxhash64(df.columns.map(col) :+ lit(seed): _*)
    // localCheckpoint: the three slices (and their consumers) would each
    // re-run the global sort + row_number otherwise
    val idx = df
      .withColumn("__rnd", rnd)
      .withColumn("__idx", row_number().over(Window.orderBy(col("__rnd"))))
      .localCheckpoint()
    def slice(lo: Long, hi: Long) =
      idx.filter(col("__idx") > lo && col("__idx") <= hi)
        .drop("__rnd", "__idx")
    Map(
      "test" -> slice(0L, nTest),
      "val" -> slice(nTest, nTest + nVal),
      "train" -> slice(nTest + nVal, n))
  }

  /** Seeded Bernoulli sample (reference: ml/check_onnx.py:19
    * `df.sample(frac, random_state)`): scan-local, no shuffle.
    */
  def fractionSample(df: DataFrame, fraction: Double, seed: Long): DataFrame =
    df.sample(withReplacement = false, fraction, seed)
}
