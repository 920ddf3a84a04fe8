package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Vocabulary-coverage quality signals: how much of a document is made
  * of the corpus's own top-V terms. A high out-of-vocabulary rate flags
  * boilerplate, wrong-language text, OCR noise, or encoding damage —
  * the CCNet-style "does this look like the language we want" filter,
  * with the corpus itself standing in for the reference LM's lexicon
  * (cf. reference text filtering in /root/reference/libs/otokuna/
  * analysis.py's permissive-drop spirit: score, don't mutate).
  */
object Vocabulary {

  /** Per-document OOV accounting against the corpus top-`vocabSize`
    * vocabulary (terms ranked by count desc, term asc — a total order,
    * so the V-boundary cut is deterministic in any engine).
    *
    * `oov_ppm` is integer parts-per-million (`n_oov * 1e6 div
    * n_tokens`) — pure integer arithmetic end to end, so the score is
    * bit-identical across engines and row orders; a float ratio could
    * land on an exact .5 at the rounding digit and split engines.
    *
    * Scale shape: one (term) groupBy with map-side combine feeds a
    * TakeOrdered top-V (never a global sort); the vocabulary is
    * V rows and joins back via an explicit broadcast; the per-doc
    * accounting is one more map-side-combining groupBy keyed by
    * doc_id. The token stream is computed twice (vocab pass + scoring
    * pass) rather than cached — at 100 TB a corpus-sized token cache
    * is the wrong trade against a second narrow scan, and a production
    * run re-uses one fixed vocabulary across many scoring passes
    * anyway.
    */
  def oovRate(docs: DataFrame, id: Column, text: Column,
      vocabSize: Int): DataFrame = {
    val toks = docs
      .select(id.as("doc_id"),
        explode(graft.functions.TextFunctions.tokens(text)).as("term"))
      .filter(col("term") =!= "")
    val vocab = toks.groupBy(col("term")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("term"))
      .limit(vocabSize)
      .select(col("term"), lit(1).as("in_vocab"))
    val per = toks.join(broadcast(vocab), Seq("term"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"))
    docs.select(id.as("doc_id"))
      .join(per, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_oov"), lit(0L)).as("n_oov"))
      .withColumn("oov_ppm",
        when(col("n_tokens") === 0, lit(0L))
          .otherwise(expr("n_oov * 1000000 div n_tokens")))
  }
}
