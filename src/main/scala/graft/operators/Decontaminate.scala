package graft.operators

import graft.plans.{BloomAnyContain, ShingleHashes}
import graft.operators.Checkpoints.TruncateOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination — flag every corpus document sharing an
  * n-gram with an evaluation benchmark (the contamination screen a
  * pretraining pipeline runs before training so eval sets don't leak
  * into the corpus).
  *
  * The scale asymmetry drives the design: the corpus is the 100 TB
  * side, the benchmark suite is MBs–GBs. So nothing corpus-sized may
  * shuffle. The benchmark's distinct shingle hashes are aggregated once
  * (small shuffle), folded into a driver-built bloom filter, and shipped
  * to every task inside the codegen'd [[graft.plans.BloomAnyContain]]
  * prefilter — a narrow map over the corpus scan. Only documents whose
  * shingles hit the bloom (true contaminations + the fpp tail) continue
  * to the exact verify: explode the survivors' shingles and broadcast
  * hash-join them against the benchmark set. Clean documents — the vast
  * majority — are eliminated without leaving their input split, and the
  * final counts are exact (bloom false positives die in the verify;
  * false negatives don't exist).
  */
object Decontaminate {

  /** The benchmark suite's distinct n-gram shingle hashes, one `gram`
    * column. Built once and reusable across corpus passes.
    */
  def benchmarkShingles(bench: DataFrame, text: Column, n: Int): DataFrame =
    bench.select(ShingleHashes.shingle_hashes(text, n).as("sh"))
      .filter(size(col("sh")) > 0)
      .select(explode(col("sh")).as("gram"))
      .distinct()

  /** Corpus documents contaminated by the benchmark: (doc_id,
    * n_overlap) where n_overlap = number of DISTINCT n-gram shingles
    * the document shares with any benchmark document (≥ 1 by
    * construction — clean documents are absent, not zero-counted).
    *
    * `benchGrams` is [[benchmarkShingles]] output (or any one-column
    * `gram: long` frame of distinct hashes). `fpp` trades bloom size
    * against wasted verify work; at 1% a 10M-shingle benchmark costs
    * ~12 MB per executor and sends ~1% of clean docs to the verify.
    */
  def contaminated(corpus: DataFrame, id: Column, text: Column,
      benchGrams: DataFrame, n: Int, fpp: Double = 0.01): DataFrame = {
    require(fpp > 0 && fpp < 1, s"fpp must be in (0, 1), got $fpp")
    val grams = benchGrams.select(col("gram")).truncated
    val sh = corpus.select(id.as("doc_id"),
      ShingleHashes.shingle_hashes(text, n).as("sh"))
    val nGrams = grams.count()
    if (nGrams == 0) {
      // empty benchmark ⇒ nothing is contaminated
      return sh.select(col("doc_id"), lit(0L).as("n_overlap")).limit(0)
    }
    val bloom = grams.stat.bloomFilter("gram", nGrams, fpp)
    val candidates =
      sh.filter(BloomAnyContain.bloom_any_contain(col("sh"), bloom))
    // shingle arrays are distinct per doc and benchGrams is distinct, so
    // the join hits each shared shingle exactly once
    candidates.select(col("doc_id"), explode(col("sh")).as("gram"))
      .join(broadcast(grams), Seq("gram"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_overlap"))
  }

  /** Graduated contamination report: per flagged document, the distinct
    * shingle count, the overlap count, and the overlap fraction in
    * integer parts-per-million — the decision variable real screens
    * threshold on (a doc quoting one benchmark sentence is not a doc
    * THAT IS the benchmark; pipelines drop at e.g. ≥ 50% 8-gram
    * overlap and audit the tail). Only documents at or above `minPpm`
    * survive, so the report is candidate-sized, never corpus-sized.
    *
    * Same scale shape as [[contaminated]] — bloom prefilter on the
    * scan, broadcast verify, one candidate-sized groupBy — with the
    * document's own distinct-shingle count riding the candidate rows
    * (no second corpus pass). The fraction is pure integer arithmetic
    * (`n_overlap · 10⁶ div n_shingles`), bit-identical in any engine.
    */
  def contaminationReport(corpus: DataFrame, id: Column, text: Column,
      benchGrams: DataFrame, n: Int, minPpm: Long,
      fpp: Double = 0.01): DataFrame = {
    require(fpp > 0 && fpp < 1, s"fpp must be in (0, 1), got $fpp")
    val grams = benchGrams.select(col("gram")).truncated
    val sh = corpus.select(id.as("doc_id"),
        ShingleHashes.shingle_hashes(text, n).as("sh"))
      .filter(size(col("sh")) > 0)
    val nGrams = grams.count()
    if (nGrams == 0)
      return sh.select(col("doc_id"), lit(0L).as("n_shingles"),
        lit(0L).as("n_overlap"), lit(0L).as("overlap_ppm")).limit(0)
    val bloom = grams.stat.bloomFilter("gram", nGrams, fpp)
    sh.filter(BloomAnyContain.bloom_any_contain(col("sh"), bloom))
      .select(col("doc_id"), size(col("sh")).cast("long").as("n_shingles"),
        explode(col("sh")).as("gram"))
      .join(broadcast(grams), Seq("gram"))
      .groupBy(col("doc_id"), col("n_shingles"))
      .agg(count(lit(1)).as("n_overlap"))
      .withColumn("overlap_ppm", expr("n_overlap * 1000000 div n_shingles"))
      .filter(col("overlap_ppm") >= minPpm)
      .select(col("doc_id"), col("n_shingles"), col("n_overlap"),
        col("overlap_ppm"))
  }
}
