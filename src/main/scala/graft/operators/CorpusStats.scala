package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-level language statistics used as cheap quality signals — the
  * integer-arithmetic stand-ins for the LM-perplexity filters of the
  * CCNet/Gopher pipelines (a real LM score needs log-probs; logarithms
  * are not bit-reproducible across engines, and for FILTERING, any
  * monotone rarity score ranks documents the same way).
  */
object CorpusStats {

  /** Bigram-novelty score: for each document, the sum over its bigram
    * OCCURRENCES of (N − freq(bigram)), where N is the corpus bigram
    * count — high for documents made of bigrams the corpus rarely
    * repeats (novel prose), low for boilerplate assembled from the
    * corpus's most common transitions. The per-occurrence form (not
    * per-distinct) makes internally repetitive documents score like the
    * boilerplate they are.
    *
    * Scale shape: one explode into the metadata-narrow (doc_id, bigram)
    * relation, one map-side-combining groupBy for the frequency table,
    * one equi-join keyed on the bigram (both sides already bigram-
    * partitioned by the agg), one per-doc sum. N = Σf is a one-row
    * aggregate over the (much smaller) frequency table, attached by a
    * broadcast cross join — so the whole plan stays lazy (no count()
    * at construction time; the returned plan re-derives N from
    * whatever the input holds at execution) and the exploded relation
    * is computed exactly twice (freq and the scored join), never
    * cached: at 100 TB a corpus-sized bigram cache is the wrong trade
    * against a second narrow scan.
    */
  def bigramNovelty(docs: DataFrame, id: Column, text: Column): DataFrame = {
    val toks = docs.select(id.as("doc_id"),
      graft.functions.TextFunctions.tokens(text).as("w"))
    val bg = toks.select(col("doc_id"),
      explode(
        when(size(col("w")) >= 2,
          transform(sequence(lit(1), size(col("w")) - 1),
            i => concat(element_at(col("w"), i), lit(" "),
              element_at(col("w"), i + 1))))
          .otherwise(array().cast("array<string>"))).as("bigram"))
    val freq = bg.groupBy(col("bigram")).agg(count(lit(1)).as("f"))
    val total = freq.agg(coalesce(sum(col("f")), lit(0L)).as("n_total"))
    // Σ(N − f) = n_bigrams·N − Σf, so the one-row scalar join attaches
    // above the per-doc aggregate (doc-cardinality rows), never to the
    // occurrence-sized relation.
    val scored = bg.join(freq, Seq("bigram"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("f")).as("sum_f"))
      .crossJoin(broadcast(total))
      .select(col("doc_id"), col("n_bigrams"),
        (col("n_bigrams") * col("n_total") - col("sum_f")).as("novelty"))
    toks.select(col("doc_id"))
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("novelty"), lit(0L)).as("novelty"))
  }
}
