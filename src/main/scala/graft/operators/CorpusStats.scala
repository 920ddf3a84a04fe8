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

  /** Collocation extraction by pointwise mutual information — the
    * corpus-global companion to [[bigramNovelty]]'s per-document
    * score: the top-`topK` adjacent token pairs that co-occur far
    * more than their unigram frequencies predict (Church & Hanks
    * 1990's association ratio). Curation pipelines mine these for
    * tokenizer merge seeding, stop-phrase lists, and boilerplate
    * signatures.
    *
    * The score is the LIFT — the exponential of PMI:
    *
    *   lift(x,y) = P(x,y)/(P(x)P(y)) = c(xy)·U² / (c(x)·c(y)·B)
    *
    * with U the corpus unigram total and B the bigram total. log is
    * monotone, so ranking by lift IS ranking by PMI without touching
    * libm (the object doc's rule). All five factors are exact
    * integer counts; the score is ONE fixed-order double expression —
    * ((((c_xy·U)/c_x)·U)/c_y)/B, 6dp-rounded — every multiply and
    * divide in the same IEEE order in both engines (the q79 cosine
    * argument). `minCount` suppresses the unstable low-support tail
    * (a pair seen twice between two hapaxes "lifts" absurdly), the
    * standard PMI cutoff.
    *
    * Scale shape: one explode each for unigrams and bigram pairs,
    * map-side-combining counts for both, then two equi-joins of the
    * (minCount-pruned) pair table against the unigram table keyed on
    * the word, one-row totals attached by broadcast cross join, and
    * a top-K TakeOrdered — nothing global but the two scalar
    * aggregates. For bounded vocabularies the unigram side is
    * broadcastable; the default stays a shuffle join because a
    * 100 TB web corpus's vocabulary is not small.
    */
  /** Per-group lexical richness — type-token ratio and hapax fraction
    * in exact integer micro-units: n_tokens, n_types (distinct words
    * within the group), n_hapax (words seen exactly once there),
    * ttr_micro = types·10⁶ div tokens, hapax_micro = hapax·10⁶ div
    * types. The vocabulary-diversity quality signal (Templin 1957's
    * TTR; hapax rate is its tail-weight companion): machine-generated
    * boilerplate and spam repeat a tiny vocabulary (low TTR, low
    * hapax), natural prose does not — a standard corpus-curation
    * filter axis next to [[bigramNovelty]]'s sequence-level score.
    *
    * Scale shape: two map-side-combining aggregations — (group, word)
    * cells, then per-group moments over the cell table; shuffle
    * volume is #distinct cells then #groups. Purely rational, so the
    * outputs are hash-exact everywhere.
    */
  def lexicalRichness(docs: DataFrame, group: Column,
      text: Column): DataFrame = {
    val wc = docs
      .select(group.as("grp"),
        explode(graft.functions.TextFunctions.tokens(text)).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("grp"), col("word")).agg(count(lit(1)).as("c"))
    wc.groupBy(col("grp"))
      .agg(sum(col("c")).as("n_tokens"), count(lit(1)).as("n_types"),
        sum(when(col("c") === 1, 1L).otherwise(0L)).as("n_hapax"))
      .select(col("grp"), col("n_tokens"), col("n_types"), col("n_hapax"),
        expr("(n_types * 1000000) div n_tokens").as("ttr_micro"),
        expr("(n_hapax * 1000000) div n_types").as("hapax_micro"))
  }

  def pmiCollocations(docs: DataFrame, text: Column, minCount: Long,
      topK: Int): DataFrame = {
    val toks = docs.select(graft.functions.TextFunctions.tokens(text).as("w"))
    val uni = toks.select(explode(col("w")).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("c"))
    val uniTotal = uni.agg(coalesce(sum(col("c")), lit(0L)).as("n_uni"))
    val pairs = toks.select(
        explode(when(size(col("w")) >= 2,
            transform(sequence(lit(1), size(col("w")) - 1),
              i => struct(element_at(col("w"), i).as("lhs"),
                element_at(col("w"), i + 1).as("rhs"))))
          .otherwise(array().cast("array<struct<lhs:string,rhs:string>>")))
          .as("p"))
      .select(col("p.lhs").as("lhs"), col("p.rhs").as("rhs"))
    val pairCnt = pairs.groupBy(col("lhs"), col("rhs"))
      .agg(count(lit(1)).as("c_xy"))
    val pairTotal = pairCnt.agg(coalesce(sum(col("c_xy")), lit(0L)).as("n_bi"))
    pairCnt.filter(col("c_xy") >= minCount)
      .join(uni.select(col("word").as("lhs"), col("c").as("c_x")), Seq("lhs"))
      .join(uni.select(col("word").as("rhs"), col("c").as("c_y")), Seq("rhs"))
      .crossJoin(broadcast(uniTotal))
      .crossJoin(broadcast(pairTotal))
      .select(col("lhs"), col("rhs"), col("c_xy"), col("c_x"), col("c_y"),
        round(col("c_xy").cast("double") * col("n_uni") / col("c_x")
            * col("n_uni") / col("c_y") / col("n_bi"), 6).as("lift"))
      .orderBy(col("lift").desc, col("lhs"), col("rhs"))
      .limit(topK)
  }

  /** Distinguishing terms per cluster — c-TF-IDF with a LINEAR
    * inverse-cluster-frequency, `score = tf_c(t) · (C − cdf(t))`
    * where cdf(t) counts clusters containing t and C is the cluster
    * count: a term everywhere scores 0, a term confined to one
    * cluster scores tf·(C−1). Linear-not-log for the same reason the
    * collocation ranker uses lift over PMI: the score stays exact
    * integer (hash-replayable) and the RANKING inside a cluster
    * agrees with log-idf wherever cdf differs — labelling clusters
    * with their top terms only consumes the ranking. Ties break
    * lexically.
    *
    * Scale shape: one explode to (cluster, term) with a map-side-
    * combining count — everything after runs on the CELL table
    * (≤ clusters × vocabulary): cdf is a second combining groupBy of
    * the cells, C a one-row aggregate attached by broadcast cross
    * join (lazy, never an eager count), and the per-cluster top-k is
    * a window over cells partitioned by cluster — partitions bounded
    * by a cluster's vocabulary, not its corpus slice.
    */
  def distinctiveTerms(docs: DataFrame, cluster: Column, text: Column,
      topK: Int): DataFrame = {
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val cells = docs.select(cluster.as("cluster"),
        explode(graft.functions.TextFunctions.tokens(text)).as("term"))
      .filter(col("term") =!= "")
      .groupBy(col("cluster"), col("term")).agg(count(lit(1)).as("tf"))
    val cdf = cells.groupBy(col("term")).agg(count(lit(1)).as("cdf"))
    val nClusters = cells.select(col("cluster")).distinct()
      .agg(count(lit(1)).as("n_clusters"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cluster"))
      .orderBy(col("score").desc, col("term"))
    cells.join(cdf, Seq("term"))
      .crossJoin(broadcast(nClusters))
      .withColumn("score", col("tf") * (col("n_clusters") - col("cdf")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= topK)
      .select(col("cluster"), col("rank"), col("term"), col("tf"),
        col("cdf"), col("score"))
  }
}
