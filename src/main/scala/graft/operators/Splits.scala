package graft.operators

import graft.operators.Checkpoints.TruncateOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Seeded dataset splits (reference: libs/otokuna/analysis.py:115-149,
  * split_dataset — shuffle indices, slice exact counts n_val = int(n*r)).
  *
  * `threeWay` reproduces the exact-count semantics: a seeded pseudo-random
  * order + exact dense ranking, so |val| == floor(n*valRatio) and
  * |test| == floor(n*testRatio) exactly. Ranking is two-phase (range
  * partition + per-partition offsets), never a single-partition window.
  */
object Splits {

  /** Exact dense 0-based global rank by `key`, scale-safe: no task ever
    * sees more than one partition's rows.
    *
    *  1. `repartitionByRange` on the key — Spark samples split points, so
    *     every partition holds a contiguous, roughly equal key range.
    *  2. Sort within partitions; `monotonically_increasing_id` then
    *     encodes (partition, local position) — local position is the
    *     local rank, with no extra exchange.
    *  3. Per-partition counts (a ≤`shuffle.partitions`-row aggregate)
    *     become cumulative offsets on the driver; a broadcast join adds
    *     them back: rank = offset(partition) + local position.
    *
    * The frame is localCheckpoint'ed: the id assignment must be computed
    * once (three slices + their consumers would otherwise re-run it, and
    * `monotonically_increasing_id` is assignment-order-dependent).
    */
  private[graft] def rangeRanked(df: DataFrame, key: Column): DataFrame = {
    val spark = df.sparkSession
    val keyed = rangeKeyed(df, key).truncated
    val counts = keyed.groupBy(col("__pid")).agg(count(lit(1)).as("__n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val offsets = counts.map(_._1)
      .zip(counts.scanLeft(0L)(_ + _._2).init).toSeq
    import spark.implicits._
    keyed.join(broadcast(offsets.toDF("__pid", "__off")), Seq("__pid"))
      .withColumn("__idx", col("__local") + col("__off"))
      .drop("__pid", "__local", "__off")
  }

  /** The lazy phase-1 plan of [[rangeRanked]] (exposed for plan audits). */
  private[graft] def rangeKeyed(df: DataFrame, key: Column): DataFrame =
    df.withColumn("__rnd", key)
      .repartitionByRange(col("__rnd"))
      .sortWithinPartitions(col("__rnd"))
      .withColumn("__mid", monotonically_increasing_id())
      // documented mid layout: partition index in the upper 31 bits,
      // in-partition record position in the lower 33
      .withColumn("__pid", shiftright(col("__mid"), 33))
      .withColumn("__local", col("__mid").bitwiseAND(lit((1L << 33) - 1)))
      .drop("__mid")

  def threeWay(df: DataFrame, valRatio: Double, testRatio: Double,
      seed: Long): Map[String, DataFrame] = {
    // rand(seed) is seeded per PARTITION, so membership would change with
    // the partition count; a content hash is pseudo-random, seeded, and
    // partition-independent — Verify output stays byte-stable. (Byte-
    // identical rows tie on the hash and ranking splits them
    // arbitrarily, but interchangeable rows make that unobservable.)
    val rnd = xxhash64(df.columns.map(col) :+ lit(seed): _*)
    val idx = rangeRanked(df, rnd)
    val n = idx.count()
    val nVal = (n * valRatio).toLong
    val nTest = (n * testRatio).toLong
    def slice(lo: Long, hi: Long) =
      idx.filter(col("__idx") >= lo && col("__idx") < hi)
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

  /** Stratified seeded sample: per-stratum Bernoulli fractions (the
    * class-rebalancing pass of a training-data pipeline — e.g.
    * downsample boilerplate-heavy languages, keep rare ones whole).
    * Scan-local like [[fractionSample]]: each row consults only its own
    * stratum's fraction, no shuffle, no per-stratum pass. Strata absent
    * from `fractions` are dropped (fraction 0).
    */
  def stratifiedSample(df: DataFrame, strataCol: String,
      fractions: Map[String, Double], seed: Long): DataFrame =
    df.stat.sampleBy(strataCol, fractions, seed)

  /** Leakage-safe grouped split: EVERY row of a group lands in the
    * same train/val/test bucket, decided by the group key's content
    * hash — the split hygiene that keeps near-duplicates (or any
    * correlated family: same source, same dedup cluster, same user)
    * from straddling train and eval. Row-level random splits leak;
    * this one cannot, by construction.
    *
    * Percent buckets come from `rolling_hash(group) mod 100`, pure
    * content arithmetic — reproducible across runs/engines/
    * partitionings and stable under corpus growth (a group's
    * assignment never changes as other groups arrive, unlike any
    * rank-based split). Completely narrow: no shuffle, each row
    * consults only its own group key. Proportions are exact in
    * expectation over groups, not exact-count — exact-count splitting
    * is what [[threeWay]] is for when leakage isn't the concern.
    */
  def groupedSplit(df: DataFrame, group: Column,
      trainPct: Int, valPct: Int): DataFrame = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct <= 100,
      "percentages must fit in [0, 100]")
    val h = pmod(
      graft.plans.RollingHash.rolling_hash(group.cast("string")), lit(100))
    df.withColumn("split",
      when(h < trainPct, lit("train"))
        .when(h < trainPct + valPct, lit("val"))
        .otherwise(lit("test")))
  }
}
