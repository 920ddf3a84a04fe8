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

  /** DSIR-style data selection (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): score every POOL
    * document by how target-like its hashed-n-gram profile is, using
    * per-feature importance ratios between a bag-of-hashed-ngrams
    * model fit on the TARGET rows and one fit on the pool. Features
    * are unigrams + bigrams hashed into `buckets` cells by the
    * portable rolling hash, so the whole computation replays in any
    * engine. Integer-exact adaptation (the repo's float-free oracle
    * discipline, cf. q82's log-free LM-surprise): the per-bucket
    * weight is the add-one-smoothed probability RATIO in micro-units,
    *
    *   ratio_micro(b) = ((ct_b+1)·(Ns+B)·10⁶) div ((cs_b+1)·(Nt+B))
    *
    * computed in decimal so no operand overflows, and a document's
    * score is the integer dot product Σ_b cnt_db · ratio_micro(b) —
    * order-independent, no logarithm anywhere (the paper's Σ log-ratio
    * becomes a Σ ratio; the selection it induces favors the same
    * target-heavy buckets, and determinism is what makes the result
    * gradable). Selection is the paper's zero-noise ablation: rank by
    * score, take the top slice — deterministic tie-break on doc_id.
    *
    * Scale shape: one tokenize+explode scan into a (doc, bucket) count
    * frame (map-side combinable, materialized ONCE — it feeds both the
    * model and the scoring, so construction is eager like densePairs),
    * a B-row model aggregate, a B-row broadcast back onto the counts,
    * one per-doc sum. No join ever exceeds B rows on its build side;
    * B is a constant (default 1024), so at 100 TB this is two
    * scan-shaped shuffles and a broadcast.
    *
    * Returns (doc_id, n_feats, score_micro) for POOL rows only
    * (`isTarget` false; null `isTarget` rows join neither model).
    */
  def dsirScores(docs: DataFrame, id: Column, text: Column,
      isTarget: Column, buckets: Int = 1024): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    import graft.operators.Checkpoints.TruncateOps
    val t = docs.select(id.as("doc_id"), isTarget.as("is_t"),
      graft.functions.TextFunctions.tokens(text).as("w"))
    val uni = t.select(col("doc_id"), col("is_t"),
      explode(col("w")).as("feat"))
    val bi = t.select(col("doc_id"), col("is_t"),
      explode(
        when(size(col("w")) >= 2,
          transform(sequence(lit(1), size(col("w")) - 1),
            i => concat(element_at(col("w"), i), lit(" "),
              element_at(col("w"), i + 1))))
          .otherwise(array().cast("array<string>"))).as("feat"))
    val fb = uni.unionByName(bi).filter(col("feat") =!= "")
      .select(col("doc_id"), col("is_t"),
        pmod(graft.plans.RollingHash.rolling_hash(col("feat")),
          lit(buckets.toLong)).as("b"))
      .groupBy(col("doc_id"), col("is_t"), col("b"))
      .agg(count(lit(1)).as("cnt"))
      .truncated // feeds the model AND the scoring join
    val m = fb.groupBy(col("b")).agg(
      coalesce(sum(when(col("is_t"), col("cnt"))), lit(0L)).as("ct"),
      coalesce(sum(when(not(col("is_t")), col("cnt"))), lit(0L)).as("cs"))
    val tot = m.agg(coalesce(sum(col("ct")), lit(0L)).as("nt"),
      coalesce(sum(col("cs")), lit(0L)).as("ns"))
    // Exactness bound, enforced loudly (round 17, advisor): ratio_micro
    // = ((ct+1)(Ns+B)·10⁶) div ((cs+1)(Nt+B)) ≤ 10⁶·(Ns+B) because
    // ct ≤ Nt ⇒ (ct+1) ≤ (Nt+B). So Ns ≤ 9·10¹² keeps every ratio
    // inside a long's 9.2·10¹⁸ — beyond it Spark's non-ANSI `div`
    // would wrap/NULL SILENTLY while the DuckDB replay's
    // CAST(HUGEINT AS BIGINT) errors, a cross-engine divergence. The
    // guard makes both engines fail the same way: a one-row check on
    // the model totals raises instead of mis-ranking. Under the guard
    // the decimal(38,0) score sum is exact (per-doc Σcnt ≤ Ns ≤ 9·10¹²
    // times ratio ≤ 9.2·10¹⁸ is < 10³²), so only the final long cast
    // needs its own overflow check.
    val maxExactNs = 9000000000000L
    val ratios = m.crossJoin(broadcast(tot))
      .select(col("b"),
        when(col("ns") > maxExactNs, raise_error(concat(
          lit("dsirScores: pool feature total "), col("ns"),
          lit(s" exceeds the exact-long ratio bound $maxExactNs — " +
            "per-bucket importance ratios would overflow 64-bit " +
            "micro-units; shrink the pool or rescale the method"))))
        .otherwise(expr(
          s"(cast(ct + 1 as decimal(20,0)) * (ns + $buckets) * 1000000) " +
            s"div (cast(cs + 1 as decimal(20,0)) * (nt + $buckets))"))
        .as("ratio_micro"))
    fb.filter(not(col("is_t")))
      .join(broadcast(ratios), Seq("b"))
      .groupBy(col("doc_id"))
      .agg(sum(col("cnt")).as("n_feats"),
        sum(col("cnt").cast("decimal(20,0)") * col("ratio_micro"))
          .as("s"))
      .select(col("doc_id"), col("n_feats"),
        when(col("s") > Long.MaxValue, raise_error(concat(
          lit("dsirScores: score_micro "), col("s").cast("string"),
          lit(" for doc "), col("doc_id").cast("string"),
          lit(" exceeds 64-bit micro-units — matches the oracle's " +
            "CAST(HUGEINT AS BIGINT) error instead of wrapping"))))
        .otherwise(col("s").cast("long")).as("score_micro"))
  }
}
