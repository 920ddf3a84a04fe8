package graft.queries

import graft.{QueryDef, Tables}
import graft.operators.{Dedup, Layout, Scale, Similarity, SnapshotDiff}
import org.apache.spark.sql.functions._

/** Round-6 operators as graded queries: stream-stream interval join,
  * snapshot CDC diff, exact stratified sampling, token-budget mixture
  * draws, z-order layout audits, int8-quantized ANN with exact rerank,
  * and SemDeDup-style semantic dedup. Every oracle replays the
  * engine-independent arithmetic (integer event time, LCG order keys,
  * bit interleaves, sign-LSH plane sums) in DuckDB.
  */
object CurationQueries {

  // ---------------------------------------------------------------- q74
  /** Stream-stream interval join drained from a real watermarked
    * Structured Streaming query; the oracle is the equivalent BATCH
    * interval join — on a bounded source the two must agree exactly,
    * which is precisely the streaming-equals-batch contract the
    * watermarks are supposed to preserve. Event time compares as
    * integer microseconds on both sides (nanos floor-divided), so no
    * timestamp-precision mismatch can leak in.
    */
  val q74StreamJoin: QueryDef = QueryDef(
    "q74_stream_join",
    (s, dir) =>
      graft.streaming.StreamJoin.clickPurchaseAttribution(s, dir,
        windowMinutes = 30),
    Some("""
      WITH ev AS (SELECT event_id, user_id, event_type,
        CAST(epoch_ns(ts) // 1000 AS BIGINT) AS us FROM events),
      c AS (SELECT event_id AS click_id, user_id, us AS c_us
        FROM ev WHERE event_type = 'click'),
      p AS (SELECT event_id AS purchase_id, user_id, us AS p_us
        FROM ev WHERE event_type = 'purchase')
      SELECT c.click_id, p.purchase_id, c.user_id,
        p.p_us - c.c_us AS delta_us
      FROM c JOIN p ON c.user_id = p.user_id
        AND p.p_us >= c.c_us AND p.p_us <= c.c_us + 1800000000
      ORDER BY c.click_id, p.purchase_id"""),
  )

  // ---------------------------------------------------------------- q75
  /** CDC diff between two snapshots of the orders table (deterministic
    * synthetic drift: 1-in-10 keys absent from the old dump, 1-in-7
    * absent from the new one, 1-in-5 repriced). The oracle is the
    * textbook FULL OUTER JOIN formulation; the operator is the same
    * join shaped for bucketed zero-shuffle execution at scale.
    */
  val q75SnapshotDiff: QueryDef = QueryDef(
    "q75_snapshot_diff",
    (s, dir) => {
      val orders = Tables(s, dir, "orders")
      val oldSnap = orders.filter(pmod(col("o_orderkey"), lit(10)) =!= 3)
      val newSnap = orders.filter(pmod(col("o_orderkey"), lit(7)) =!= 2)
        .withColumn("o_totalprice",
          when(pmod(col("o_orderkey"), lit(5)) === 0,
            col("o_totalprice") + 1.0).otherwise(col("o_totalprice")))
      SnapshotDiff.diff(oldSnap, newSnap, "o_orderkey",
          Seq("o_totalprice", "o_orderstatus"))
        .orderBy(col("o_orderkey"))
    },
    Some("""
      WITH old AS (SELECT o_orderkey, o_totalprice, o_orderstatus
        FROM orders WHERE o_orderkey % 10 <> 3),
      new AS (SELECT o_orderkey,
        CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice + 1.0
             ELSE o_totalprice END AS o_totalprice,
        o_orderstatus FROM orders WHERE o_orderkey % 7 <> 2),
      j AS (SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
        CASE WHEN o.o_orderkey IS NULL THEN 'added'
             WHEN n.o_orderkey IS NULL THEN 'removed'
             WHEN o.o_totalprice IS DISTINCT FROM n.o_totalprice
               OR o.o_orderstatus IS DISTINCT FROM n.o_orderstatus
               THEN 'changed' END AS change_type,
        o.o_totalprice AS old_o_totalprice,
        n.o_totalprice AS new_o_totalprice,
        o.o_orderstatus AS old_o_orderstatus,
        n.o_orderstatus AS new_o_orderstatus
      FROM old o FULL OUTER JOIN new n ON o.o_orderkey = n.o_orderkey)
      SELECT o_orderkey, change_type, old_o_totalprice, new_o_totalprice,
        old_o_orderstatus, new_o_orderstatus
      FROM j WHERE change_type IS NOT NULL
      ORDER BY o_orderkey"""),
  )

  // ---------------------------------------------------------------- q76
  /** Exact stratified sample: first 5 documents of every source in
    * deterministic LCG order. */
  val q76StratifiedSample: QueryDef = QueryDef(
    "q76_stratified_sample",
    (s, dir) =>
      Scale.stratifiedSample(Tables(s, dir, "documents"),
          col("source"), col("doc_id"), nPer = 5)
        .orderBy(col("stratum"), col("rank")),
    Some("""
      WITH d AS (SELECT source AS stratum, doc_id AS id,
        ((doc_id % 2147483648) * 1103515245 + 12345) % 2147483648 AS h
        FROM documents),
      r AS (SELECT stratum, id,
        ROW_NUMBER() OVER (PARTITION BY stratum ORDER BY h, id) AS rank
        FROM d)
      SELECT stratum, id, rank FROM r WHERE rank <= 5
      ORDER BY stratum, rank"""),
  )

  // ---------------------------------------------------------------- q77
  /** Token-budget mixture draw: per source, documents in LCG order
    * until the source's token budget is exhausted (two sources get
    * explicit budgets, the rest the default). */
  val q77TokenBudget: QueryDef = QueryDef(
    "q77_token_budget",
    (s, dir) =>
      Scale.tokenBudgetSample(Tables(s, dir, "documents"),
          col("source"), col("doc_id"),
          size(split(col("text"), " ")),
          budgets = Map("src3" -> 800L, "src7" -> 5000L),
          defaultBudget = 1500L)
        .orderBy(col("source"), col("cum_tokens")),
    Some("""
      WITH d AS (SELECT source, doc_id AS id,
        len(string_split(text, ' ')) AS n_tokens,
        ((doc_id % 2147483648) * 1103515245 + 12345) % 2147483648 AS h
        FROM documents),
      c AS (SELECT source, id, n_tokens,
        CAST(SUM(n_tokens) OVER (PARTITION BY source ORDER BY h, id
          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens FROM d)
      SELECT source, id, n_tokens, cum_tokens FROM c
      WHERE cum_tokens <= CASE source WHEN 'src3' THEN 800
                                      WHEN 'src7' THEN 5000
                                      ELSE 1500 END
      ORDER BY source, cum_tokens"""),
  )

  // ---------------------------------------------------------------- q78
  /** Z-order layout audit over events on (user bucket, time bucket):
    * each 256-key tile of the Morton curve must span a small square of
    * the grid — the bounding boxes in the output ARE the file-skipping
    * statistics a z-ordered table would expose to both user- and
    * time-predicates. The oracle replays the identical bit interleave.
    */
  val q78ZOrder: QueryDef = QueryDef(
    "q78_zorder",
    (s, dir) =>
      Layout.zOrderTiles(Tables(s, dir, "events"),
          pmod(col("user_id"), lit(256)),
          (dayofmonth(col("ts")) - 1) * 8 + expr("hour(ts) div 3"),
          bits = 8, lowBits = 8)
        .orderBy(col("tile")),
    Some(s"""
      WITH b AS (SELECT user_id % 256 AS x,
        CAST((day(ts) - 1) * 8 + hour(ts) // 3 AS BIGINT) AS y FROM events),
      z AS (SELECT x, y,
        ${Layout.zOrderKeySql("x", "y", 8)} AS zkey FROM b)
      SELECT zkey >> 8 AS tile, COUNT(*) AS n,
        MIN(x) AS x_min, MAX(x) AS x_max,
        MIN(y) AS y_min, MAX(y) AS y_max
      FROM z GROUP BY tile
      ORDER BY tile"""),
  )

  // ---------------------------------------------------------------- q79
  /** Int8-quantized ANN with exact rerank: candidates by integer dot
    * product over per-vector symmetric int8 codes, top-30 per query
    * reranked with the full-precision cosine. Quantized scores are
    * exact small integers, so the candidate cut replays bit-identically
    * in DuckDB.
    */
  val q79Int8Ann: QueryDef = QueryDef(
    "q79_int8_ann",
    (s, dir) => {
      val emb = Tables(s, dir, "embeddings")
      Similarity.quantizedTopK(emb, emb.filter(col("vec_id") < 5),
          col("vec_id"), col("embedding"), k = 10, rerankDepth = 30)
        .orderBy(col("q_id"), col("rank"))
    },
    Some("""
      WITH e AS (SELECT vec_id, embedding,
        sqrt(list_reduce([0.0::DOUBLE] || [CAST(x AS DOUBLE) * CAST(x AS DOUBLE) for x in embedding], (a, v) -> a + v)) AS nrm,
        list_max([abs(CAST(x AS DOUBLE)) for x in embedding]) / 127.0 AS s
        FROM embeddings),
      z AS (SELECT vec_id, embedding, nrm,
        CASE WHEN s = 0 THEN [0.0 for x in embedding]
             ELSE [sign(CAST(x AS DOUBLE)) * floor(abs(CAST(x AS DOUBLE)) / s + 0.5) for x in embedding]
        END AS q8 FROM e),
      q AS (SELECT * FROM z WHERE vec_id < 5),
      cand AS (SELECT q.vec_id AS q_id, c.vec_id AS n_id,
        CAST(list_reduce([0.0::DOUBLE] || [q.q8[i] * c.q8[i] for i in range(1, len(q.q8) + 1)], (x, v) -> x + v) AS BIGINT) AS int_score,
        list_reduce([0.0::DOUBLE] || [CAST(q.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE) for i in range(1, len(q.embedding) + 1)], (x, v) -> x + v)
          / (q.nrm * c.nrm) AS cosine
        FROM q JOIN z c ON c.vec_id != q.vec_id),
      top AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
          ORDER BY int_score DESC, n_id) AS cand_rank FROM cand),
      rr AS (SELECT q_id, n_id, int_score, cosine,
          ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine DESC, n_id) AS rank
        FROM top WHERE cand_rank <= 30)
      SELECT q_id, rank, n_id, int_score, ROUND(cosine, 6) AS cosine
      FROM rr WHERE rank <= 10
      ORDER BY q_id, rank"""),
  )

  /** Per-plane sign-LSH cell SQL (mirrors Similarity.lshBucket /
    * planeComponent exactly — same constants, same summation order).
    * Shared with the q39 oracle in ScaleQueries.
    */
  private[queries] def lshCellSql(nPlanes: Int): String = {
    val bits = (0 until nPlanes).map { p =>
      val dot = s"list_reduce([0.0::DOUBLE] || [CAST(embedding[i] AS DOUBLE) * " +
        s"(((($p * 73856093 + (i - 1) * 19349663 + 83492791) % 1001) - 500) / 500.0) " +
        s"for i in range(1, len(embedding) + 1)], (x, v) -> x + v)"
      s"CASE WHEN $dot >= 0 THEN ${1L << p} ELSE 0 END"
    }
    s"CAST(${bits.mkString(" + ")} AS BIGINT)"
  }

  // ---------------------------------------------------------------- q80
  /** SemDeDup-style semantic dedup: sign-LSH cells over the embedding
    * space; a vector is dropped iff an earlier-id in-cell vector sits
    * within the cosine threshold. The oracle recomputes the cells from
    * the same plane arithmetic and applies the same keep rule.
    */
  val q80SemanticDedup: QueryDef = QueryDef(
    "q80_semantic_dedup",
    (s, dir) =>
      Dedup.semanticDedup(Tables(s, dir, "embeddings"),
          col("vec_id"), col("embedding"), eps = 0.35, nPlanes = 4)
        .orderBy(col("id")),
    Some(s"""
      WITH z AS (SELECT vec_id, embedding,
        sqrt(list_reduce([0.0::DOUBLE] || [CAST(x AS DOUBLE) * CAST(x AS DOUBLE) for x in embedding], (a, v) -> a + v)) AS nrm,
        ${lshCellSql(4)} AS cell
        FROM embeddings),
      dominated AS (SELECT b.vec_id AS id, MIN(a.vec_id) AS dup_of
        FROM z a JOIN z b ON a.cell = b.cell AND a.vec_id < b.vec_id
        WHERE list_reduce([0.0::DOUBLE] || [CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE) for i in range(1, len(a.embedding) + 1)], (x, v) -> x + v)
          / (a.nrm * b.nrm) > 0.35
        GROUP BY b.vec_id)
      SELECT z.vec_id AS id, z.cell, d.dup_of IS NULL AS kept, d.dup_of
      FROM z LEFT JOIN dominated d ON z.vec_id = d.id
      ORDER BY id"""),
  )

  // ---------------------------------------------------------------- q81
  /** Sequence packing (concat-and-chop): documents laid end-to-end in
    * LCG order, the token stream cut every 256 tokens; per document,
    * its global offset and the training-sequence range it spans. The
    * Spark side computes the global running sum two-phase (range
    * partitions + broadcast prefix offsets — never a single-partition
    * window); the oracle states the same prefix sums with one flat
    * window, which DuckDB can afford at oracle scale.
    */
  val q81SeqPack: QueryDef = QueryDef(
    "q81_seq_pack",
    (s, dir) =>
      Scale.packSequences(Tables(s, dir, "documents"),
          col("doc_id"), size(split(col("text"), " ")), seqLen = 256)
        .orderBy(col("id")),
    Some("""
      WITH d AS (SELECT doc_id AS id,
        len(string_split(text, ' ')) AS n_tokens,
        ((doc_id % 2147483648) * 1103515245 + 12345) % 2147483648 AS h
        FROM documents),
      c AS (SELECT id, n_tokens,
        CAST(SUM(n_tokens) OVER (ORDER BY h, id
          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS end_off FROM d)
      SELECT id, n_tokens, end_off - n_tokens AS start_off,
        (end_off - n_tokens) // 256 AS first_seq,
        (end_off - 1) // 256 AS last_seq,
        (end_off - 1) // 256 - (end_off - n_tokens) // 256 + 1 AS n_seqs
      FROM c ORDER BY id"""),
  )

  // ---------------------------------------------------------------- q82
  /** Bigram-novelty quality signal: per document, the integer rarity
    * sum Σ (N − freq) over its bigram occurrences — the logarithm-free,
    * rank-preserving stand-in for an LM-surprise filter. */
  val q82BigramNovelty: QueryDef = QueryDef(
    "q82_bigram_novelty",
    (s, dir) =>
      graft.operators.CorpusStats.bigramNovelty(
          Tables(s, dir, "documents"), col("doc_id"), col("text"))
        .orderBy(col("doc_id")),
    Some("""
      WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      bg AS (SELECT doc_id, w[i] || ' ' || w[i + 1] AS bigram
        FROM t, LATERAL (SELECT unnest(range(1, len(w))) AS i) r),
      freq AS (SELECT bigram, COUNT(*) AS f FROM bg GROUP BY bigram),
      tot AS (SELECT COUNT(*) AS n FROM bg),
      scored AS (SELECT b.doc_id, COUNT(*) AS n_bigrams,
          CAST(SUM(tot.n - f.f) AS BIGINT) AS novelty
        FROM bg b JOIN freq f USING (bigram), tot
        GROUP BY b.doc_id)
      SELECT t.doc_id, COALESCE(s.n_bigrams, 0) AS n_bigrams,
        COALESCE(s.novelty, 0) AS novelty
      FROM t LEFT JOIN scored s USING (doc_id)
      ORDER BY t.doc_id"""),
  )

  // ---------------------------------------------------------------- q83
  /** Blocked edit-distance near-dup pairs: first-token blocking, exact
    * Levenshtein on an 80-char prefix, distance ≤ 20. Both engines
    * compute the same DP (the corpus is ASCII, so Spark's char-based
    * and DuckDB's byte-based distance coincide — spec-asserted). */
  val q83EditDistance: QueryDef = QueryDef(
    "q83_edit_distance",
    (s, dir) =>
      // truncate before the presentation sort — see q34: the range
      // sampler would otherwise re-run the 42 M-pair DP verify
      graft.operators.Checkpoints.truncate(
        Dedup.editDistancePairs(Tables(s, dir, "documents"),
          col("doc_id"), col("text"), prefixLen = 80, maxDist = 20))
        .orderBy(col("id_a"), col("id_b")),
    Some("""
      WITH d AS (SELECT doc_id AS id, substr(text, 1, 80) AS p,
        string_split(text, ' ')[1] AS blk FROM documents)
      SELECT a.id AS id_a, b.id AS id_b,
        CAST(levenshtein(a.p, b.p) AS BIGINT) AS dist
      FROM d a JOIN d b ON a.blk = b.blk AND a.id < b.id
      WHERE levenshtein(a.p, b.p) <= 20
      ORDER BY id_a, id_b"""),
  )

  // ---------------------------------------------------------------- q84
  /** Engine-exact second moments: per return flag, mean/variance of
    * quantity and quantity↔price covariance from integer-scaled exact
    * sums (the fsum pattern extended to second moments — a plain
    * covar_pop would be partitioning-dependent in its low bits). */
  val q84ExactMoments: QueryDef = QueryDef(
    "q84_exact_moments",
    (s, dir) =>
      graft.operators.Stats.exactMoments(Tables(s, dir, "lineitem"),
          col("l_returnflag"), col("l_quantity"), col("l_extendedprice"),
          yScale = 100L)
        .orderBy(col("grp")),
    Some("""
      WITH base AS (SELECT l_returnflag AS grp,
        CAST(l_quantity AS BIGINT) AS x,
        CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS y FROM lineitem),
      m AS (SELECT grp, COUNT(*) AS n, SUM(x) AS sum_x, SUM(y) AS sum_y,
        SUM(x * x) AS sum_xx, SUM(x * y) AS sum_xy
        FROM base GROUP BY grp)
      SELECT grp, n, CAST(sum_x AS BIGINT) AS sum_x,
        CAST(sum_y AS BIGINT) AS sum_y,
        CAST(sum_xx AS BIGINT) AS sum_xx,
        CAST(sum_xy AS BIGINT) AS sum_xy,
        ROUND(CAST(sum_x AS DOUBLE) / n, 6) AS mean_x,
        ROUND(CAST(sum_y AS DOUBLE) / (n * 100.0), 6) AS mean_y,
        ROUND((CAST(sum_xx AS DOUBLE) * n - CAST(sum_x AS DOUBLE) * CAST(sum_x AS DOUBLE))
          / (CAST(n AS DOUBLE) * n), 6) AS var_x,
        ROUND((CAST(sum_xy AS DOUBLE) * n - CAST(sum_x AS DOUBLE) * CAST(sum_y AS DOUBLE))
          / (CAST(n AS DOUBLE) * n * 100.0), 6) AS cov_xy
      FROM m ORDER BY grp"""),
  )

  // ---------------------------------------------------------------- q85
  /** Stream-static enrichment: the event stream joined per micro-batch
    * to the static customer dimension, aggregated on the enriched key,
    * with exact-cents value sums. Oracle = the batch join + aggregate. */
  val q85StreamEnrich: QueryDef = QueryDef(
    "q85_stream_enrich",
    (s, dir) => graft.streaming.StreamJoin.enrichedSegmentStats(s, dir),
    Some("""
      SELECT c.c_mktsegment, e.event_type, COUNT(*) AS n,
        CAST(SUM(CAST(round(e.value * 100, 0) AS BIGINT)) AS BIGINT)
          AS value_cents
      FROM events e JOIN customer c ON c.c_custkey = e.user_id
      GROUP BY c.c_mktsegment, e.event_type
      ORDER BY c.c_mktsegment, e.event_type"""),
  )

  // ---------------------------------------------------------------- q86
  /** Per-group top-k (the "3 longest documents per source" slice):
    * rank window per group, deterministic tie-break. One shuffle on the
    * group key; per-task cost is bounded by the largest group's sort —
    * for skewed groups at scale, pre-filter with a per-group threshold
    * from a sample, exactly like the stratified-sample note. (Global
    * top-k stays `TakeOrderedAndProject` — q04; windows are only for
    * the grouped form.)
    */
  val q86GroupTopK: QueryDef = QueryDef(
    "q86_group_topk",
    (s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("source"))
        .orderBy(col("n_chars").desc, col("doc_id"))
      Tables(s, dir, "documents")
        .select(col("source"), col("doc_id"), col("n_chars"))
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 3)
        .orderBy(col("source"), col("rank"))
    },
    Some("""
      SELECT source, doc_id, n_chars, rank FROM (
        SELECT source, doc_id, n_chars,
          ROW_NUMBER() OVER (PARTITION BY source
            ORDER BY n_chars DESC, doc_id) AS rank
        FROM documents)
      WHERE rank <= 3
      ORDER BY source, rank"""),
  )

  // ---------------------------------------------------------------- q87
  /** Three-stage first-touch conversion funnel (click → view →
    * purchase, each strictly after the previous stage's first event).
    * Deterministic under any partitioning: every anchor is a MIN over
    * a filtered event set, no window ordering involved. */
  val q87Funnel: QueryDef = QueryDef(
    "q87_funnel",
    (s, dir) =>
      graft.operators.Funnel.firstTouch(Tables(s, dir, "events"),
          col("user_id"), col("event_type"), col("ts"),
          stages = Seq("click", "view", "purchase"))
        .orderBy(col("user_id")),
    Some("""
      WITH e AS (SELECT user_id, event_type,
        CAST(epoch_ns(ts) // 1000 AS BIGINT) AS us FROM events),
      u AS (SELECT DISTINCT user_id FROM e),
      s1 AS (SELECT user_id, MIN(us) AS t1 FROM e
        WHERE event_type = 'click' GROUP BY user_id),
      s2 AS (SELECT e.user_id, MIN(us) AS t2 FROM e
        JOIN s1 ON e.user_id = s1.user_id AND e.us > s1.t1
        WHERE event_type = 'view' GROUP BY e.user_id),
      s3 AS (SELECT e.user_id, MIN(us) AS t3 FROM e
        JOIN s2 ON e.user_id = s2.user_id AND e.us > s2.t2
        WHERE event_type = 'purchase' GROUP BY e.user_id)
      SELECT u.user_id, s1.t1, s2.t2, s3.t3,
        CAST(CASE WHEN t3 IS NOT NULL THEN 3
                  WHEN t2 IS NOT NULL THEN 2
                  WHEN t1 IS NOT NULL THEN 1
                  ELSE 0 END AS BIGINT) AS stage_reached
      FROM u LEFT JOIN s1 USING (user_id) LEFT JOIN s2 USING (user_id)
             LEFT JOIN s3 USING (user_id)
      ORDER BY u.user_id"""),
  )

  // ---------------------------------------------------------------- q88
  /** Weekly retention cohorts over integer epoch-weeks (timezone-free,
    * engine-identical bucketing): per (first-active cohort week,
    * weeks-since), the count of that cohort's users active that week. */
  val q88Retention: QueryDef = QueryDef(
    "q88_retention",
    (s, dir) =>
      graft.operators.Funnel.retentionCohorts(Tables(s, dir, "events"),
          col("user_id"), col("ts"))
        .orderBy(col("cohort_week"), col("weeks_since")),
    Some("""
      WITH ev AS (SELECT user_id,
        CAST(epoch_ns(ts) // 1000 AS BIGINT) // 86400000000 AS day
        FROM events),
      weeks AS (SELECT DISTINCT user_id, day // 7 AS week FROM ev),
      cohorts AS (SELECT user_id, MIN(week) AS cohort_week
        FROM weeks GROUP BY user_id)
      SELECT c.cohort_week, w.week - c.cohort_week AS weeks_since,
        COUNT(*) AS n_users
      FROM weeks w JOIN cohorts c USING (user_id)
      GROUP BY c.cohort_week, weeks_since
      ORDER BY c.cohort_week, weeks_since"""),
  )

  // ---------------------------------------------------------------- q91
  /** Vocabulary-coverage (OOV-rate) quality scoring: per document, how
    * many tokens fall outside the corpus top-100 vocabulary, as integer
    * parts-per-million. The vocabulary cut is a total order
    * (count desc, term asc), so the V boundary — and therefore every
    * score — is engine-exact; no float ratio crosses the hash compare.
    */
  val q91OovRate: QueryDef = QueryDef(
    "q91_oov_rate",
    (s, dir) =>
      graft.operators.Vocabulary.oovRate(Tables(s, dir, "documents"),
          col("doc_id"), col("text"), vocabSize = 100)
        .orderBy(col("doc_id")),
    Some("""
      WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term
        FROM documents),
      t AS (SELECT doc_id, term FROM toks WHERE term <> ''),
      vocab AS (
        SELECT term FROM (
          SELECT term, COUNT(*) AS cnt FROM t GROUP BY term
          ORDER BY cnt DESC, term LIMIT 100)),
      per AS (
        SELECT t.doc_id, COUNT(*) AS n_tokens,
          CAST(SUM(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_oov
        FROM t LEFT JOIN vocab v ON t.term = v.term
        GROUP BY t.doc_id)
      SELECT d.doc_id,
        COALESCE(p.n_tokens, 0) AS n_tokens,
        COALESCE(p.n_oov, 0) AS n_oov,
        CASE WHEN COALESCE(p.n_tokens, 0) = 0 THEN 0
             ELSE (p.n_oov * 1000000) // p.n_tokens END AS oov_ppm
      FROM documents d LEFT JOIN per p ON d.doc_id = p.doc_id
      ORDER BY d.doc_id"""),
  )

  // ---------------------------------------------------------------- q92
  /** Incremental (delta) dedup — the daily-crawl shape: the corpus is
    * split into a deduplicated history (doc_id % 5 != 0) and an
    * incoming batch (doc_id % 5 == 0), and every batch document is
    * classified as dup_of_history / dup_in_batch / new on a
    * 100-char-prefix content key (the same key q33 proves collides in
    * this corpus). History participates only as its (key → min id)
    * representative index.
    */
  val q92DeltaDedup: QueryDef = QueryDef(
    "q92_delta_dedup",
    (s, dir) => {
      val docs = Tables(s, dir, "documents")
      Dedup.incrementalDedup(
          docs.filter(col("doc_id") % 5 =!= 0),
          docs.filter(col("doc_id") % 5 === 0),
          col("doc_id"), substring(col("text"), 1, 100))
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH hist AS (
        SELECT substr(text, 1, 100) AS k, MIN(doc_id) AS hist_rep
        FROM documents WHERE doc_id % 5 <> 0 GROUP BY k),
      inc AS (
        SELECT doc_id, substr(text, 1, 100) AS k
        FROM documents WHERE doc_id % 5 = 0),
      batch AS (SELECT k, MIN(doc_id) AS batch_rep FROM inc GROUP BY k)
      SELECT i.doc_id,
        CASE WHEN h.hist_rep IS NOT NULL THEN 'dup_of_history'
             WHEN i.doc_id > b.batch_rep THEN 'dup_in_batch'
             ELSE 'new' END AS verdict,
        CASE WHEN h.hist_rep IS NOT NULL THEN h.hist_rep
             WHEN i.doc_id > b.batch_rep THEN b.batch_rep
             ELSE NULL END AS dup_of
      FROM inc i
      LEFT JOIN hist h ON i.k = h.k
      JOIN batch b ON i.k = b.k
      ORDER BY i.doc_id"""),
  )

  // ---------------------------------------------------------------- q93
  /** Fixed-point PageRank (3 iterations, damping 85/100) over the
    * symmetric customer↔supplier trade graph — the link-graph quality
    * prior of web-corpus pipelines (Common Crawl ranks crawl hosts the
    * same way). Every rank is exact integer mass, so a 3-hop iterative
    * computation hash-matches DuckDB's unrolled replay — something no
    * float PageRank can promise. Top-100 by rank.
    *
    * Edge-build shape (round 12): the whole iteration runs on LONG
    * surrogate node ids — custkey·2 for customers, suppkey·2+1 for
    * suppliers, a disjoint injective encoding — and converts to the
    * 'c…'/'s…' string labels only on the final node-sized rank table.
    * Rank mass is invariant under graph isomorphism, so the surrogate
    * graph's ranks ARE the string graph's ranks, at half the shuffle
    * bytes and integer (not string) hashing in every setup and
    * iteration exchange. The narrow int pair also dedups BEFORE
    * symmetrizing into two disjoint orientations (even↔odd ids can
    * never collide), so the union itself is distinct and
    * `edgesDistinct = true` skips the operator's edge-sized distinct.
    */
  val q93PageRank: QueryDef = QueryDef(
    "q93_pagerank",
    (s, dir) => {
      val o = Tables(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"))
      val l = Tables(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"))
      val cs = o.join(l, col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("c"), col("l_suppkey").as("sk"))
        .distinct()
        .select((col("c").cast("long") * 2).as("src"),
          (col("sk").cast("long") * 2 + 1).as("dst"))
      val edges = cs.union(
        cs.select(col("dst").as("src"), col("src").as("dst")))
      graft.operators.Graph.pageRank(edges, iters = 3,
          edgesDistinct = true)
        .select(
          when(col("node") % 2 === 0,
            concat(lit("c"), expr("node div 2")))
            .otherwise(concat(lit("s"), expr("(node - 1) div 2")))
            .as("node"),
          col("rank"))
        .orderBy(col("rank").desc, col("node"))
        .limit(100)
    },
    Some("""
      WITH cs AS (
        SELECT DISTINCT 'c' || o_custkey AS src, 's' || l_suppkey AS dst
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
      e AS (SELECT src, dst FROM cs
            UNION SELECT dst AS src, src AS dst FROM cs),
      nodes AS (SELECT DISTINCT node FROM (
        SELECT src AS node FROM e UNION ALL SELECT dst FROM e)),
      nn AS (SELECT COUNT(*) AS n FROM nodes),
      outdeg AS (SELECT src, COUNT(*) AS outdeg FROM e GROUP BY src),
      r0 AS (SELECT node, (SELECT 1000000000000 // n FROM nn) AS rank
             FROM nodes),
      it1 AS (
        SELECT nd.node,
          (((SELECT 1000000000000 // n FROM nn) * 15) // 100)
            + ((COALESCE(m.in_mass, 0) * 85) // 100) AS rank
        FROM nodes nd LEFT JOIN (
          SELECT e.dst AS node,
            CAST(SUM(r.rank // o.outdeg) AS BIGINT) AS in_mass
          FROM r0 r JOIN e ON r.node = e.src
                    JOIN outdeg o ON e.src = o.src
          GROUP BY e.dst) m ON nd.node = m.node),
      it2 AS (
        SELECT nd.node,
          (((SELECT 1000000000000 // n FROM nn) * 15) // 100)
            + ((COALESCE(m.in_mass, 0) * 85) // 100) AS rank
        FROM nodes nd LEFT JOIN (
          SELECT e.dst AS node,
            CAST(SUM(r.rank // o.outdeg) AS BIGINT) AS in_mass
          FROM it1 r JOIN e ON r.node = e.src
                     JOIN outdeg o ON e.src = o.src
          GROUP BY e.dst) m ON nd.node = m.node),
      it3 AS (
        SELECT nd.node,
          (((SELECT 1000000000000 // n FROM nn) * 15) // 100)
            + ((COALESCE(m.in_mass, 0) * 85) // 100) AS rank
        FROM nodes nd LEFT JOIN (
          SELECT e.dst AS node,
            CAST(SUM(r.rank // o.outdeg) AS BIGINT) AS in_mass
          FROM it2 r JOIN e ON r.node = e.src
                     JOIN outdeg o ON e.src = o.src
          GROUP BY e.dst) m ON nd.node = m.node)
      SELECT node, rank FROM it3
      ORDER BY rank DESC, node LIMIT 100"""),
  )

  // --------------------------------------------------------------- q102
  private def projSql(outDims: Int): String =
    (0 until outDims).map { d =>
      s"ROUND(list_reduce([0.0::DOUBLE] || [CAST(embedding[i] AS DOUBLE) * " +
        s"(((($d * 73856093 + (i - 1) * 19349663 + 83492791) % 1001) - 500)" +
        s" / 500.0) for i in range(1, len(embedding) + 1)]," +
        s" (x, v) -> x + v), 6)"
    }.mkString("[", ", ", "]")

  /** Fixed-plane random projection of the 64-dim embeddings into 8
    * dims (JL-style reduction before pairwise work). The plane family
    * is the repo's deterministic (plane, dim) arithmetic, and each
    * component is a left fold matching list_reduce — so even the
    * double outputs are bit-identical across engines.
    */
  val q102Projection: QueryDef = QueryDef(
    "q102_projection",
    (s, dir) =>
      Similarity.projectDims(Tables(s, dir, "embeddings"),
          col("vec_id"), col("embedding"), outDims = 8, dims = 64)
        .select(col("id").as("vec_id"), col("dim"), col("proj"))
        .orderBy(col("vec_id"), col("dim")),
    Some(s"""
      WITH p AS (
        SELECT vec_id, ${projSql(8)} AS ps FROM embeddings)
      SELECT vec_id, CAST(i - 1 AS BIGINT) AS dim, ps[CAST(i AS INT)] AS proj
      FROM p, LATERAL (SELECT unnest(range(1, 9)) AS i) r
      ORDER BY vec_id, dim"""),
  )

  // --------------------------------------------------------------- q103
  /** Leakage-safe grouped split: every document of a source lands in
    * the same train/val/test bucket via the source key's content hash
    * (80/10/10 in expectation over groups) — the split hygiene that
    * keeps correlated families from straddling train and eval. The
    * oracle replays the identical hash arithmetic.
    */
  val q103GroupedSplit: QueryDef = QueryDef(
    "q103_grouped_split",
    (s, dir) =>
      graft.operators.Splits.groupedSplit(Tables(s, dir, "documents"),
          col("source"), trainPct = 80, valPct = 10)
        .select(col("doc_id"), col("source"), col("split"))
        .orderBy(col("doc_id")),
    Some(s"""
      WITH h AS (
        SELECT doc_id, source,
          (${ScaleQueries.FpLambda.format("source")}) % 100 AS b
        FROM documents)
      SELECT doc_id, source,
        CASE WHEN b < 80 THEN 'train'
             WHEN b < 90 THEN 'val'
             ELSE 'test' END AS split
      FROM h
      ORDER BY doc_id"""),
  )

  // --------------------------------------------------------------- q104
  /** Per-event-type z-score anomaly flags from engine-exact moments:
    * z = (x·n − Σx) / √(Σx²·n − (Σx)²) on cents — integer numerator
    * and radicand, one divide + one sqrt, so the anomaly verdicts are
    * bit-identical across engines. Group statistics come from the
    * FULL group; the user_id < 20 cut only trims the graded output.
    */
  val q104ZScores: QueryDef = QueryDef(
    "q104_zscore",
    (s, dir) =>
      graft.operators.Stats.zScores(Tables(s, dir, "events"),
          col("event_type"), col("event_id"), col("value"))
        .join(Tables(s, dir, "events")
          .select(col("event_id").as("id"), col("user_id")), Seq("id"))
        .filter(col("user_id") < 20)
        .select(col("id").as("event_id"), col("grp").as("event_type"),
          col("x").as("cents"), col("z"), col("is_outlier"))
        .orderBy(col("event_id")),
    Some("""
      WITH e AS (
        SELECT event_id, user_id, event_type,
          CAST(ROUND(value * 100.0) AS BIGINT) AS cents
        FROM events),
      m AS (
        SELECT event_type, COUNT(*) AS n,
          CAST(SUM(cents) AS BIGINT) AS s,
          CAST(SUM(cents * cents) AS BIGINT) AS ss
        FROM e GROUP BY event_type),
      z AS (
        SELECT e.event_id, e.event_type, e.cents, e.user_id,
          CASE WHEN ss * n - s * s = 0 THEN 0.0
               ELSE ROUND(CAST(cents * n - s AS DOUBLE)
                 / sqrt(CAST(ss * n - s * s AS DOUBLE)), 6) END AS z
        FROM e JOIN m USING (event_type))
      SELECT event_id, event_type, cents, z, abs(z) >= 3.0 AS is_outlier
      FROM z
      WHERE user_id < 20
      ORDER BY event_id"""),
  )

  // --------------------------------------------------------------- q105
  /** Incremental NEAR-dup dedup (the fuzzy q92): today's batch
    * (doc_id % 5 == 0) against the historical corpus's banded MinHash
    * index, candidates exact-verified at Jaccard ≥ 0.8. The oracle is
    * the exact incoming×history Jaccard — equality proves the band
    * recall is complete on this corpus, the same contract q35 grades.
    */
  val q105DeltaNearDedup: QueryDef = QueryDef(
    "q105_delta_near_dedup",
    (s, dir) => {
      val docs = Tables(s, dir, "documents")
      Dedup.incrementalNearDedup(
          docs.filter(col("doc_id") % 5 =!= 0),
          docs.filter(col("doc_id") % 5 === 0),
          col("doc_id"), col("text"), n = 3, threshold = 0.8)
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH docs AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      sh AS (
        SELECT doc_id,
          list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
            for i in range(1, len(t) - 1)]) AS shingles
        FROM docs WHERE len(t) >= 3),
      hist AS (SELECT * FROM sh WHERE doc_id % 5 <> 0),
      incsh AS (SELECT * FROM sh WHERE doc_id % 5 = 0),
      inc AS (SELECT doc_id FROM documents WHERE doc_id % 5 = 0),
      pairs AS (
        SELECT i.doc_id, h.doc_id AS hid,
          CAST(len(list_intersect(i.shingles, h.shingles)) AS DOUBLE)
            / len(list_distinct(i.shingles || h.shingles)) AS j
        FROM incsh i CROSS JOIN hist h),
      m AS (SELECT doc_id, MIN(hid) AS dup_of
            FROM pairs WHERE j >= 0.8 GROUP BY doc_id),
      m2 AS (
        SELECT p.doc_id, p.hid AS dup_of, ROUND(p.j, 6) AS jaccard
        FROM pairs p JOIN m ON p.doc_id = m.doc_id AND p.hid = m.dup_of)
      SELECT i.doc_id, m2.dup_of IS NULL AS kept, m2.dup_of, m2.jaccard
      FROM inc i LEFT JOIN m2 USING (doc_id)
      ORDER BY i.doc_id"""),
  )

  // --------------------------------------------------------------- q106
  /** DuckDB replay of [[graft.ml.KMeans.fit]]: the same fixed-point
    * Lloyd iterations unrolled as CTEs, generated from the same
    * (k, iters) constants. Centroids live in long form (cid, dim, c);
    * each iteration is assignment (argmin with dist,cid tie-break) →
    * per-(cluster,dim) integer sums → half-up requantized centroids
    * with COALESCE keeping empty clusters' previous centroids.
    */
  private[queries] def kmeansSql(k: Int, iters: Int): String = {
    val quant = """CAST(CASE WHEN embedding[s.i] >= 0
          THEN floor(CAST(embedding[s.i] AS DOUBLE) * 1000000 + 0.5)
          ELSE -floor(-CAST(embedding[s.i] AS DOUBLE) * 1000000 + 0.5)
          END AS BIGINT)"""
    def assign(t: String, prev: String) = s"""
      a$t AS (
        SELECT q.vec_id, c.cid,
          CAST(SUM((q.qv - c.c) * (q.qv - c.c)) AS BIGINT) AS dist
        FROM q JOIN $prev c USING (dim) GROUP BY q.vec_id, c.cid),
      w$t AS (
        SELECT vec_id, cid AS cluster, dist FROM (
          SELECT vec_id, cid, dist, ROW_NUMBER() OVER
            (PARTITION BY vec_id ORDER BY dist, cid) AS rn FROM a$t)
        WHERE rn = 1)"""
    val iterations = (1 to iters).map { t =>
      s"""${assign(t.toString, s"c${t - 1}")},
      s$t AS (
        SELECT w.cluster, q.dim, COUNT(*) AS n,
          CAST(SUM(q.qv) AS BIGINT) AS s
        FROM w$t w JOIN q USING (vec_id) GROUP BY w.cluster, q.dim),
      c$t AS (
        SELECT p.cid, p.dim,
          COALESCE(CASE WHEN s.s >= 0 THEN (2*s.s + s.n) // (2*s.n)
            ELSE -((-2*s.s + s.n) // (2*s.n)) END, p.c) AS c
        FROM c${t - 1} p
        LEFT JOIN s$t s ON s.cluster = p.cid AND s.dim = p.dim)"""
    }.mkString(",")
    s"""
      WITH q AS (
        SELECT vec_id, s.i - 1 AS dim, $quant AS qv
        FROM embeddings, (SELECT unnest(range(1, 10000)) AS i) s
        WHERE s.i <= len(embedding)),
      init AS (
        SELECT vec_id, ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cid
        FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT $k)),
      c0 AS (SELECT i.cid, q.dim, q.qv AS c
             FROM init i JOIN q USING (vec_id)),
      ${iterations},
      ${assign("f", s"c$iters").trim}
      SELECT vec_id, cluster, dist FROM wf ORDER BY vec_id"""
  }

  /** Fixed-point Lloyd k-means ([[graft.ml.KMeans.fit]]), k=8 over the
    * embeddings table, 3 iterations from the deterministic
    * smallest-ids init. Integer micro-unit arithmetic end to end means
    * the final (cluster, dist) assignment — not an approximation of
    * it — hash-matches the unrolled DuckDB replay.
    */
  val q106KMeans: QueryDef = QueryDef(
    "q106_kmeans",
    (s, dir) =>
      graft.ml.KMeans.fit(Tables(s, dir, "embeddings"),
          col("vec_id"), col("embedding"), k = 8, iters = 3)
        .orderBy(col("vec_id")),
    Some(kmeansSql(8, 3)),
  )

  // --------------------------------------------------------------- q107
  /** DuckDB replay of [[graft.operators.Binning.equiDepthHistogram]]:
    * the same 6dp-rounded exact quantile boundaries (the q07
    * cross-engine parity form) and the same strictly-below comparison
    * chain, generated from the same nBins constant.
    */
  private[queries] def equiDepthSql(table: String, column: String,
      nBins: Int): String = {
    val idx = 1 until nBins
    val bounds = idx.map(i =>
      s"ROUND(quantile_cont(v, ${i.toDouble / nBins}), 6) AS b$i")
      .mkString(",\n          ")
    val chain = idx.map(i => s"(CASE WHEN v > b$i THEN 1 ELSE 0 END)")
      .mkString(" + ")
    val loCases = idx.map(i => s"WHEN $i THEN b$i").mkString(" ")
    val hiCases = idx.map(i => s"WHEN ${i - 1} THEN b$i").mkString(" ")
    s"""
      WITH v AS (
        SELECT CAST($column AS DOUBLE) AS v FROM $table
        WHERE $column IS NOT NULL),
      b AS (
        SELECT $bounds
        FROM v),
      g AS (
        SELECT CAST($chain AS BIGINT) AS bin, COUNT(*) AS n
        FROM v, b GROUP BY 1)
      SELECT g.bin,
        CASE g.bin $loCases END AS bin_lo,
        CASE g.bin $hiCases END AS bin_hi,
        g.n
      FROM g, b ORDER BY g.bin"""
  }

  /** Equi-depth (equal-frequency) histogram of lineitem extended
    * prices in 10 bins — the profiling pass that equi-width q53 cannot
    * express when the distribution is skewed. Boundary doubles and bin
    * counts both hash-match.
    */
  val q107EquiDepth: QueryDef = QueryDef(
    "q107_equidepth_histogram",
    (s, dir) =>
      graft.operators.Binning.equiDepthHistogram(
          Tables(s, dir, "lineitem"), col("l_extendedprice"), nBins = 10)
        .orderBy(col("bin")),
    Some(equiDepthSql("lineitem", "l_extendedprice", 10)),
  )

  // --------------------------------------------------------------- q108
  /** Exact triangle census of the part co-purchase graph (parts linked
    * when some order contains both — per-order fan-out is bounded by
    * order width, ~7 lines in this schema). Grades
    * [[graft.operators.Graph.triangleStats]]'s degree-ordered
    * orientation end to end: node/edge/wedge/triangle counts are exact
    * integers and the clustering coefficient is one deterministic
    * double expression, so the whole row hash-matches.
    */
  val q108Triangles: QueryDef = QueryDef(
    "q108_triangles",
    (s, dir) => {
      val li = Tables(s, dir, "lineitem")
        .select(col("l_orderkey").as("k"), col("l_partkey").as("p"))
      val e = li.as("x").join(li.as("y"), Seq("k"))
        .filter(col("x.p") =!= col("y.p"))
        .select(col("x.p").as("src"), col("y.p").as("dst"))
      graft.operators.Graph.triangleStats(e)
    },
    Some("""
      WITH pairs AS (
        SELECT DISTINCT least(l1.l_partkey, l2.l_partkey) AS a,
                        greatest(l1.l_partkey, l2.l_partkey) AS b
        FROM lineitem l1 JOIN lineitem l2
          ON l1.l_orderkey = l2.l_orderkey
        WHERE l1.l_partkey <> l2.l_partkey),
      deg AS (
        SELECT v, COUNT(*) AS deg FROM (
          SELECT a AS v FROM pairs UNION ALL SELECT b AS v FROM pairs)
        GROUP BY v),
      ori AS (
        SELECT CASE WHEN da.deg < db.deg
                      OR (da.deg = db.deg AND p.a < p.b)
                 THEN p.a ELSE p.b END AS s,
               CASE WHEN da.deg < db.deg
                      OR (da.deg = db.deg AND p.a < p.b)
                 THEN p.b ELSE p.a END AS t
        FROM pairs p
        JOIN deg da ON da.v = p.a JOIN deg db ON db.v = p.b),
      wed AS (
        SELECT e1.t AS x, e2.t AS y FROM ori e1
        JOIN ori e2 ON e1.s = e2.s AND e1.t < e2.t),
      tri AS (
        SELECT COUNT(*) AS triangles
        FROM wed JOIN pairs ON wed.x = pairs.a AND wed.y = pairs.b)
      SELECT (SELECT COUNT(*) FROM deg) AS n_nodes,
             (SELECT COUNT(*) FROM pairs) AS n_edges,
             w.wedges, tri.triangles,
             CASE WHEN w.wedges > 0
               THEN ROUND(3.0 * tri.triangles / w.wedges, 6) END
               AS global_cc
      FROM tri, (SELECT CAST(SUM(deg * (deg - 1) // 2) AS BIGINT)
                 AS wedges FROM deg) w"""),
  )

  // --------------------------------------------------------------- q109
  /** Oracle-replayable KMV distinct sketch
    * ([[graft.plans.Kmv32DistinctSketch]]): per-group approximate
    * distinct parts with k = 64 minima of the PortableHash 32-bit
    * arithmetic hash. Unlike q46's xxhash64 sketch (rows-only by
    * necessity), every piece here — the hash, the k-th minimum, the
    * integer half-up estimate — replays exactly in DuckDB, so the
    * ESTIMATES hash-match, not just the exact counts. The oracle finds
    * the k-th minimum with a window; the engine uses the O(k)-memory
    * mergeable aggregate, which is the part that scales.
    */
  val q109DistinctReplay: QueryDef = QueryDef(
    "q109_distinct_replay",
    (s, dir) =>
      Tables(s, dir, "lineitem")
        .groupBy(col("l_returnflag").as("flag"))
        .agg(
          countDistinct(col("l_partkey")).as("exact"),
          graft.plans.Kmv32DistinctSketch
            .distinctSketch32(col("l_partkey"), 64).as("estimate"))
        .withColumn("rel_err",
          round(abs(col("estimate") - col("exact")).cast("double") /
            col("exact"), 4))
        .orderBy(col("flag")),
    Some {
      val steps = graft.functions.PortableHash.hash32SqlSteps("l_partkey")
      s"""
      WITH h0 AS (
        SELECT l_returnflag AS flag, ${steps(0)} AS h
        FROM lineitem WHERE l_partkey IS NOT NULL),
      h1 AS (SELECT flag, ${steps(1)} AS h FROM h0),
      h2 AS (SELECT flag, ${steps(2)} AS h FROM h1),
      hf AS (SELECT DISTINCT flag, ${steps(3)} AS h FROM h2),
      r AS (
        SELECT flag, h,
          ROW_NUMBER() OVER (PARTITION BY flag ORDER BY h) AS rn,
          COUNT(*) OVER (PARTITION BY flag) AS nd
        FROM hf),
      est AS (
        SELECT flag,
          CASE WHEN nd < 64 THEN nd
               ELSE (63 * 8589934592 + h) // (2 * h) END AS estimate
        FROM r WHERE rn = LEAST(nd, 64)),
      ex AS (
        SELECT l_returnflag AS flag,
          COUNT(DISTINCT l_partkey) AS exact
        FROM lineitem WHERE l_partkey IS NOT NULL GROUP BY 1)
      SELECT ex.flag, ex.exact, est.estimate,
        ROUND(CAST(ABS(est.estimate - ex.exact) AS DOUBLE) / ex.exact, 4)
          AS rel_err
      FROM ex JOIN est USING (flag) ORDER BY flag"""
    },
  )

  // --------------------------------------------------------------- q110
  /** Runtime Bloom pre-filter census
    * ([[graft.operators.RuntimeFilter.bloomJoinStats]]): lineitem
    * pre-filtered by a 2¹⁷-bit two-probe bloom built from one
    * nation's suppliers, then verified with the real semi-join. The
    * oracle replays the PortableHash probes and bit-set membership
    * stepwise, so the exact pass/false-positive counts — the filter
    * DECISIONS, not just the join result — hash-match.
    */
  val q110BloomJoin: QueryDef = QueryDef(
    "q110_bloom_join",
    (s, dir) =>
      graft.operators.RuntimeFilter.bloomJoinStats(
        Tables(s, dir, "lineitem"), col("l_suppkey"),
        Tables(s, dir, "supplier").filter(col("s_nationkey") === 3),
        col("s_suppkey"), mBits = 1 << 17),
    Some {
      def hashChain(src: String, from: String) = s"""
      ${src}h0 AS (
        SELECT x, ((x % 4294967296) + 4294967296) % 4294967296 AS h
        FROM $from),
      ${src}h1 AS (SELECT x, (xor(h, h >> 16) * 73244475) % 4294967296
        AS h FROM ${src}h0),
      ${src}h2 AS (SELECT x, (xor(h, h >> 16) * 73244475) % 4294967296
        AS h FROM ${src}h1),
      ${src}hf AS (SELECT x, xor(h, h >> 16) AS h FROM ${src}h2)"""
      s"""
      WITH dk AS (SELECT DISTINCT s_suppkey AS x FROM supplier
                  WHERE s_nationkey = 3),
      ${hashChain("d", "dk").trim},
      bits AS (SELECT DISTINCT p FROM (
        SELECT h % 131072 AS p FROM dhf
        UNION ALL SELECT (h >> 15) % 131072 FROM dhf)),
      fk AS (SELECT l_suppkey AS x FROM lineitem),
      ${hashChain("f", "fk").trim},
      pass AS (
        SELECT x FROM (SELECT x, h % 131072 AS p1,
                              (h >> 15) % 131072 AS p2 FROM fhf)
        WHERE p1 IN (SELECT p FROM bits)
          AND p2 IN (SELECT p FROM bits)),
      sel AS (SELECT
        (SELECT COUNT(*) FROM fk) AS n_fact,
        (SELECT COUNT(*) FROM pass) AS n_pass,
        (SELECT COUNT(*) FROM pass
         WHERE x IN (SELECT x FROM dk)) AS n_match)
      SELECT n_fact, n_pass, n_match, n_pass - n_match AS false_pos,
        CASE WHEN n_fact > n_match THEN
          ROUND(CAST(n_pass - n_match AS DOUBLE) / (n_fact - n_match), 6)
        END AS fp_rate
      FROM sel"""
    },
  )

  // --------------------------------------------------------------- q111
  /** Single-pass binned quantile sketch
    * ([[graft.operators.Binning.binnedQuantiles]]): per-flag
    * p50/p95/p99 of extended price from a 1024-bin fixed-width sketch.
    * Everything — bin index, cumulative rank, the integer form of the
    * ceiling test (1000·cum ≥ p·n) — is engine-portable arithmetic,
    * so the APPROXIMATE estimates hash-match the SQL replay; accuracy
    * vs the exact percentile is spec-asserted to one bin width.
    */
  val q111BinnedQuantiles: QueryDef = QueryDef(
    "q111_binned_quantiles",
    (s, dir) =>
      graft.operators.Binning.binnedQuantiles(
          Tables(s, dir, "lineitem"), col("l_returnflag"),
          col("l_extendedprice"), lo = 0.0, hi = 110000.0, nBins = 1024,
          perMille = Seq(500, 950, 990))
        .orderBy(col("g"), col("p")),
    Some("""
      WITH v AS (
        SELECT l_returnflag AS g, CAST(l_extendedprice AS DOUBLE) AS v
        FROM lineitem WHERE l_extendedprice IS NOT NULL),
      b AS (
        SELECT g, CAST(LEAST(GREATEST(
          floor((v - 0.0) / ((110000.0 - 0.0) / 1024)), 0.0), 1023.0)
          AS BIGINT) AS bin
        FROM v),
      c AS (SELECT g, bin, COUNT(*) AS cnt FROM b GROUP BY 1, 2),
      w AS (
        SELECT g, bin,
          CAST(SUM(cnt) OVER (PARTITION BY g ORDER BY bin
            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
          CAST(SUM(cnt) OVER (PARTITION BY g) AS BIGINT) AS n
        FROM c),
      p AS (SELECT unnest([500, 950, 990]) AS p),
      e AS (
        SELECT g, p, MIN(bin) AS est_bin FROM w, p
        WHERE cum * 1000 >= p * n GROUP BY 1, 2)
      SELECT g, CAST(p AS BIGINT) AS p,
        ROUND(0.0 + (est_bin + 1) * ((110000.0 - 0.0) / 1024), 6) AS est
      FROM e ORDER BY g, p"""),
  )

  // --------------------------------------------------------------- q112
  private val q112OrcPath =
    s"/tmp/graft_q112_orc_${ProcessHandle.current().pid()}"

  /** ORC sink/source round-trip ([[graft.sources.Sinks.writeOrc]]):
    * a 4-type slice of orders (long, string, double, timestamp) goes
    * through ORC and back; the oracle reads the ORIGINAL parquet, so a
    * hash match proves the second columnar format preserves every
    * value bit — the q47 JSON-lifecycle pattern applied to ORC.
    */
  val q112OrcRoundtrip: QueryDef = QueryDef(
    "q112_orc_roundtrip",
    (s, dir) => {
      val slice = Tables(s, dir, "orders")
        .filter(col("o_orderkey") % 13 === 0)
        .select(col("o_orderkey"), col("o_orderstatus"),
          col("o_totalprice"), col("o_orderdate"))
      graft.sources.Sinks.writeOrc(slice, q112OrcPath)
      graft.sources.Sinks.readOrc(s, q112OrcPath)
        .orderBy(col("o_orderkey"))
    },
    Some("""
      SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderdate
      FROM orders WHERE o_orderkey % 13 = 0
      ORDER BY o_orderkey"""),
  )

  // --------------------------------------------------------------- q113
  private val q113CsvPath =
    s"/tmp/graft_q113_csv_${ProcessHandle.current().pid()}"

  /** CSV sink/source round-trip under hostile content: every document
    * gets a suffix with an embedded comma, double quote, and newline —
    * the three things that break naive CSV — then goes through
    * [[graft.sources.Sinks.writeCsv]] and is read back (multiLine +
    * explicit schema). The oracle applies the same suffix to the
    * ORIGINAL parquet text, so a hash match proves quoting/escaping
    * round-trips every byte. Upgrades K1 from spec-only to graded.
    */
  val q113CsvRoundtrip: QueryDef = QueryDef(
    "q113_csv_roundtrip",
    (s, dir) => {
      val hostile = concat(col("text"), lit(",\"q\"\nL2"))
      val slice = Tables(s, dir, "documents")
        .filter(col("doc_id") % 7 === 0)
        .select(col("doc_id"), col("source"), hostile.as("text"))
      graft.sources.Sinks.writeCsv(slice, q113CsvPath)
      s.read
        .schema("doc_id long, source string, text string")
        .option("header", "true").option("multiLine", "true")
        .csv(q113CsvPath)
        .orderBy(col("doc_id"))
    },
    Some("""
      SELECT doc_id, source,
        text || ',"q"' || chr(10) || 'L2' AS text
      FROM documents WHERE doc_id % 7 = 0
      ORDER BY doc_id"""),
  )

  // --------------------------------------------------------------- q114
  /** Out-of-fold target encoding ([[graft.ml.TargetEncoder.oofMeans]]):
    * order priority encoded by the mean total price of the OTHER four
    * LCG folds — integer-cents sums, one double division, so the full
    * encoder table (including any null cells) hash-matches.
    */
  val q114TargetEncode: QueryDef = QueryDef(
    "q114_target_encode",
    (s, dir) =>
      graft.ml.TargetEncoder.oofMeans(Tables(s, dir, "orders"),
          col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"),
          k = 5)
        .orderBy(col("cat"), col("fold")),
    Some("""
      WITH r AS (
        SELECT o_orderpriority AS cat,
          (((o_orderkey % 2147483648) * 1103515245 + 12345)
            % 2147483648) % 5 AS fold,
          CAST(CASE WHEN o_totalprice >= 0
            THEN floor(o_totalprice * 100 + 0.5)
            ELSE -floor(-o_totalprice * 100 + 0.5) END AS BIGINT)
            AS cents
        FROM orders),
      cells AS (
        SELECT cat, fold, COUNT(*) AS n_fold,
          CAST(SUM(cents) AS BIGINT) AS s_fold
        FROM r GROUP BY 1, 2),
      tot AS (
        SELECT cat, CAST(SUM(n_fold) AS BIGINT) AS n_cat,
          CAST(SUM(s_fold) AS BIGINT) AS s_cat
        FROM cells GROUP BY 1)
      SELECT c.cat, c.fold, c.n_fold,
        CASE WHEN t.n_cat > c.n_fold THEN
          ROUND(CAST(t.s_cat - c.s_fold AS DOUBLE) /
            ((t.n_cat - c.n_fold) * 100.0), 6) END AS oof_mean
      FROM cells c JOIN tot t USING (cat)
      ORDER BY cat, fold"""),
  )

  // --------------------------------------------------------------- q115
  private val q115Base =
    s"/tmp/graft_q115_merge_${ProcessHandle.current().pid()}"

  /** Schema evolution read: two parquet generations with DIFFERENT
    * column sets (an old writer without o_orderstatus, a new one
    * without o_totalprice) read through mergeSchema — the long-lived-
    * table reality at 100 TB, where files written years apart coexist.
    * The oracle is the explicit UNION ALL with typed NULLs, so both
    * the merged schema and the null back-fill are hash-graded.
    */
  val q115SchemaEvolution: QueryDef = QueryDef(
    "q115_schema_evolution",
    (s, dir) => {
      val orders = Tables(s, dir, "orders")
      orders.filter(col("o_orderkey") % 11 === 0)
        .select(col("o_orderkey"), col("o_totalprice"))
        .write.mode("overwrite").parquet(s"$q115Base/gen_a")
      orders.filter(col("o_orderkey") % 11 === 1)
        .select(col("o_orderkey"), col("o_orderstatus"))
        .write.mode("overwrite").parquet(s"$q115Base/gen_b")
      s.read.option("mergeSchema", "true")
        .parquet(s"$q115Base/gen_a", s"$q115Base/gen_b")
        .orderBy(col("o_orderkey"))
    },
    Some("""
      SELECT o_orderkey, o_totalprice,
        CAST(NULL AS VARCHAR) AS o_orderstatus
      FROM orders WHERE o_orderkey % 11 = 0
      UNION ALL
      SELECT o_orderkey, CAST(NULL AS DOUBLE), o_orderstatus
      FROM orders WHERE o_orderkey % 11 = 1
      ORDER BY o_orderkey"""),
  )

  // --------------------------------------------------------------- q116
  /** Count-min frequency sketch audit
    * ([[graft.operators.FrequencySketch]]): 2×1024 cells over event
    * user ids, point estimates for the exact top-20 users, overcount
    * column pinning the one-sided error. Cells, probes, and estimates
    * are all portable integer arithmetic — the sketch replays
    * hash-exactly in DuckDB.
    */
  val q116CountMin: QueryDef = QueryDef(
    "q116_count_min",
    (s, dir) => {
      val ev = Tables(s, dir, "events")
      val w = 1024
      val top = ev.groupBy(col("user_id"))
        .agg(count(lit(1)).as("exact"))
        .orderBy(col("exact").desc, col("user_id")).limit(20)
      val cells = graft.operators.FrequencySketch
        .cmsCells(ev, col("user_id"), w)
      graft.operators.FrequencySketch
        .cmsEstimates(cells, top, col("user_id"), w)
        .join(top, col("key") === col("user_id"))
        .select(col("user_id"), col("exact"), col("est"),
          (col("est") - col("exact")).as("overcount"))
        .orderBy(col("exact").desc, col("user_id"))
    },
    Some {
      def chain(src: String, from: String) = s"""
      ${src}h0 AS (
        SELECT *, ((x % 4294967296) + 4294967296) % 4294967296 AS h
        FROM $from),
      ${src}h1 AS (SELECT * REPLACE(
        (xor(h, h >> 16) * 73244475) % 4294967296 AS h) FROM ${src}h0),
      ${src}h2 AS (SELECT * REPLACE(
        (xor(h, h >> 16) * 73244475) % 4294967296 AS h) FROM ${src}h1),
      ${src}hf AS (SELECT * REPLACE(xor(h, h >> 16) AS h) FROM ${src}h2)"""
      s"""
      WITH ev AS (SELECT user_id AS x FROM events
                  WHERE user_id IS NOT NULL),
      ${chain("e", "ev").trim},
      cells0 AS (SELECT h % 1024 AS pos, COUNT(*) AS cnt
                 FROM ehf GROUP BY 1),
      cells1 AS (SELECT (h >> 15) % 1024 AS pos, COUNT(*) AS cnt
                 FROM ehf GROUP BY 1),
      topk AS (
        SELECT user_id AS x, COUNT(*) AS exact FROM events
        GROUP BY 1 ORDER BY exact DESC, x LIMIT 20),
      ${chain("t", "topk").trim}
      SELECT t.x AS user_id, t.exact,
        LEAST(c0.cnt, c1.cnt) AS est,
        LEAST(c0.cnt, c1.cnt) - t.exact AS overcount
      FROM thf t
      JOIN cells0 c0 ON c0.pos = t.h % 1024
      JOIN cells1 c1 ON c1.pos = (t.h >> 15) % 1024
      ORDER BY t.exact DESC, t.x"""
    },
  )

  // --------------------------------------------------------------- q117
  /** Global percent-rank over the whole fact table WITHOUT a
    * single-partition window: [[graft.operators.Splits.rangeRanked]]'s
    * two-phase ranking (repartitionByRange + per-partition index +
    * broadcast prefix offsets) assigns every row its exact global
    * rank; output keeps the head and tail 50 so the graded frame stays
    * small while still pinning both extremes of the total order. The
    * oracle is the textbook (and 100 TB-hostile) ROW_NUMBER OVER
    * (ORDER BY ...) — the two must agree rank-for-rank.
    */
  val q117PercentRank: QueryDef = QueryDef(
    "q117_percent_rank",
    (s, dir) => {
      val li = Tables(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_extendedprice"))
      val ranked = graft.operators.Splits.rangeRanked(li,
          struct(col("l_extendedprice"), col("l_orderkey"),
            col("l_linenumber")))
        .withColumn("rank", col("__idx") + 1)
        .drop("__idx", "__rnd")
      val n = li.agg(count(lit(1)).as("n"))
      ranked.crossJoin(n)
        .filter(col("rank") <= 50 || col("rank") > col("n") - 50)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_extendedprice"), col("rank"),
          round((col("rank") - 1).cast("double") / (col("n") - 1), 6)
            .as("pct"))
        .orderBy(col("rank"))
    },
    Some("""
      WITH r AS (
        SELECT l_orderkey, l_linenumber, l_extendedprice,
          ROW_NUMBER() OVER (ORDER BY l_extendedprice, l_orderkey,
            l_linenumber) AS rank,
          COUNT(*) OVER () AS n
        FROM lineitem)
      SELECT l_orderkey, l_linenumber, l_extendedprice, rank,
        ROUND(CAST(rank - 1 AS DOUBLE) / (n - 1), 6) AS pct
      FROM r WHERE rank <= 50 OR rank > n - 50
      ORDER BY rank"""),
  )

  // --------------------------------------------------------------- q118
  /** q116's count-min sketch maintained BY Structured Streaming
    * ([[graft.streaming.EventsStream.streamedCmsCells]]): the cell
    * table accumulates as stateful streaming aggregation (state =
    * exactly 2·w cells however long the stream runs), is drained, and
    * feeds the identical estimate join — so q118 shares q116's oracle
    * verbatim. Streaming-equals-batch, graded on the sketch itself.
    */
  val q118StreamCountMin: QueryDef = QueryDef(
    "q118_stream_count_min",
    (s, dir) => {
      val ev = Tables(s, dir, "events")
      val w = 1024
      val top = ev.groupBy(col("user_id"))
        .agg(count(lit(1)).as("exact"))
        .orderBy(col("exact").desc, col("user_id")).limit(20)
      val cells = graft.streaming.EventsStream.streamedCmsCells(s, dir, w)
      graft.operators.FrequencySketch
        .cmsEstimates(cells, top, col("user_id"), w)
        .join(top, col("key") === col("user_id"))
        .select(col("user_id"), col("exact"), col("est"),
          (col("est") - col("exact")).as("overcount"))
        .orderBy(col("exact").desc, col("user_id"))
    },
    q116CountMin.oracle,
  )

  // --------------------------------------------------------------- q119
  /** Supervised next-event pair construction — turning raw event logs
    * into (context, target) training examples, the last mile of every
    * sequence-model data pipeline. Per user, events ordered by
    * (integer event time, event_id): each row is labeled with the NEXT
    * event's type and the exact microsecond gap; the final event per
    * user has null targets (end-of-sequence, surfaced not dropped).
    * The window partitions by user — per-user sequences are bounded by
    * user activity, never corpus-sized, so this is the legitimate
    * window shape (unlike a global ORDER BY, cf. q117).
    */
  val q119NextEvent: QueryDef = QueryDef(
    "q119_next_event",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("us"), col("event_id"))
      Tables(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("event_type"),
          unix_micros(col("ts")).as("us"))
        .withColumn("next_type", lead(col("event_type"), 1).over(w))
        .withColumn("gap_us", lead(col("us"), 1).over(w) - col("us"))
        .filter(col("user_id") % 50 === 0)
        .orderBy(col("user_id"), col("us"), col("event_id"))
    },
    Some("""
      WITH ev AS (
        SELECT user_id, event_id, event_type,
          CAST(epoch_ns(ts) // 1000 AS BIGINT) AS us
        FROM events),
      p AS (
        SELECT user_id, event_id, event_type, us,
          LEAD(event_type) OVER w AS next_type,
          LEAD(us) OVER w - us AS gap_us
        FROM ev
        WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id))
      SELECT user_id, event_id, event_type, us, next_type, gap_us
      FROM p WHERE user_id % 50 = 0
      ORDER BY user_id, us, event_id"""),
  )

  // --------------------------------------------------------------- q120
  /** Deterministic negative sampling — the contrastive-training
    * companion of q119: every purchase event gets 2 pseudo-random
    * negative part ids via the LCG keyed on (event_id, j), drawn from
    * a space of nParts − 1 and mapped around the positive with the
    * rejection-free trick (neg = draw ≥ pos ? draw + 1 : draw), so a
    * negative can NEVER equal the positive and no retry loop exists.
    * Pure integer arithmetic keyed on stable ids: fully replayable,
    * partition-independent, stable under reruns — the properties
    * RNG-based negative samplers do not have.
    */
  val q120NegativeSample: QueryDef = QueryDef(
    "q120_negative_sample",
    (s, dir) => {
      val nParts = Tables(s, dir, "part")
        .agg(max(col("p_partkey"))).head().getLong(0)
      val draws = typedLit(Seq(0, 1))
      Tables(s, dir, "events")
        .filter(col("event_type") === "purchase")
        .select(col("event_id"),
          (pmod(col("user_id"), lit(nParts)) + 1).as("pos"))
        .withColumn("j", explode(draws))
        .withColumn("draw",
          // event_id reduced mod 2^31 before the multiply: no Long
          // wraparound at any id magnitude (same fix as Scale.lcgKey)
          pmod(pmod(pmod(col("event_id"), lit(2147483648L)) * 1103515245L
            + 12345L + col("j") * 7L,
            lit(2147483648L)), lit(nParts - 1)) + 1)
        .withColumn("neg",
          when(col("draw") >= col("pos"), col("draw") + 1)
            .otherwise(col("draw")))
        .select(col("event_id"), col("pos"), col("j").cast("long").as("j"),
          col("neg"))
        .orderBy(col("event_id"), col("j"))
    },
    Some("""
      WITH np AS (SELECT MAX(p_partkey) AS n FROM part),
      pe AS (
        SELECT event_id, (user_id % (SELECT n FROM np)) + 1 AS pos
        FROM events WHERE event_type = 'purchase'),
      d AS (
        SELECT event_id, pos, j,
          (((event_id % 2147483648) * 1103515245 + 12345 + j * 7)
            % 2147483648)
            % ((SELECT n FROM np) - 1) + 1 AS draw
        FROM pe, (SELECT unnest([0, 1]) AS j))
      SELECT event_id, pos, CAST(j AS BIGINT) AS j,
        CASE WHEN draw >= pos THEN draw + 1 ELSE draw END AS neg
      FROM d ORDER BY event_id, j"""),
  )

  // --------------------------------------------------------------- q121
  private val pid = ProcessHandle.current().pid()

  /** In-JVM memo of dedup-index tables already built this process —
    * NOT a catalog-existence probe: spark-warehouse persists across
    * JVMs and pids recycle, so an existence check could silently
    * serve a table built by an older code version. First sight in
    * this JVM always (re)writes — mode("overwrite") clobbers any
    * stale table — and later sights within the JVM reuse it, which
    * is what puts the day-1 build in the bench warm-up and the day-2
    * classify in the timed region.
    */
  private val builtIndexes =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** q92's incremental exact dedup in its STEADY-STATE form: the
    * (key → min id) history index is materialized as a bucketed+sorted
    * table ([[graft.operators.DedupIndex.writeExactIndex]]) and the
    * day-2 classify reads it back with `spark.table` — the history
    * side of the join consumes the bucketed scan's partitioning with
    * zero Exchange (ScaleDesignSpec pins the plan). Same oracle as
    * q92: storage changes the physical plan, never the answer.
    */
  val q121IndexedDeltaDedup: QueryDef = QueryDef(
    "q121_indexed_delta_dedup",
    (s, dir) => {
      val docs = Tables(s, dir, "documents")
      val key = substring(col("text"), 1, 100)
      // build-once per (JVM, input dir) — the name carries both, so a
      // JVM that benches two SF dirs can't serve one's index to the
      // other. The index build is day-1 setup, amortized over every
      // later delta in production — the bench warm-up absorbs it (the
      // q24 fixture pattern) and the timed runs measure the
      // steady-state classify, which is what runs daily at 100 TB.
      val idx = s"graft_q121_idx_${pid}_${Integer.toHexString(dir.hashCode)}"
      // add() is the first-sight CAS guard; a FAILED build (disk full,
      // interrupt) must un-memoize or every later call in this JVM would
      // read a missing/partial table (r13 advisor)
      if (builtIndexes.add(idx))
        try graft.operators.DedupIndex.writeExactIndex(
          docs.filter(col("doc_id") % 5 =!= 0), col("doc_id"), key,
          idx, buckets = 8)
        catch { case e: Throwable => builtIndexes.remove(idx); throw e }
      graft.operators.DedupIndex.incrementalDedupIndexed(
          s.table(idx),
          docs.filter(col("doc_id") % 5 === 0), col("doc_id"), key)
        .orderBy(col("doc_id"))
    },
    q92DeltaDedup.oracle,
  )

  // --------------------------------------------------------------- q122
  /** q105's incremental near-dup dedup in its STEADY-STATE form: the
    * banded MinHash index (bucketed on the bucket key) and the shingle
    * store (bucketed on id) are materialized once
    * ([[graft.operators.DedupIndex.writeNearDupIndex]]) and the day-2
    * delta classify reads BOTH from storage — neither history-sized
    * relation is re-shingled or re-shuffled (ScaleDesignSpec pins zero
    * Exchange above both index scans). Same oracle as q105: the exact
    * all-pairs answer, which the index path must still match because
    * bucket-key collisions only add candidates that the exact-Jaccard
    * verify rejects.
    */
  val q122IndexedNearDedup: QueryDef = QueryDef(
    "q122_indexed_near_dedup",
    (s, dir) => {
      val docs = Tables(s, dir, "documents")
      // build-once per (JVM, input dir) — see q121: the timed region
      // of a warmed bench then measures the day-2 classify, not the
      // day-1 build
      val tag = s"${pid}_${Integer.toHexString(dir.hashCode)}"
      if (builtIndexes.add(s"graft_q122_band_$tag"))
        try graft.operators.DedupIndex.writeNearDupIndex(
          docs.filter(col("doc_id") % 5 =!= 0), col("doc_id"), col("text"),
          n = 3, bands = 32, rowsPerBand = 4,
          bandTable = s"graft_q122_band_$tag",
          shingleTable = s"graft_q122_sh_$tag", buckets = 8)
        catch { case e: Throwable =>
          builtIndexes.remove(s"graft_q122_band_$tag"); throw e }
      graft.operators.DedupIndex.incrementalNearDedupIndexed(
          s.table(s"graft_q122_band_$tag"), s.table(s"graft_q122_sh_$tag"),
          docs.filter(col("doc_id") % 5 === 0), col("doc_id"), col("text"),
          n = 3, threshold = 0.8, bands = 32, rowsPerBand = 4)
        .orderBy(col("doc_id"))
    },
    q105DeltaNearDedup.oracle,
  )

  // --------------------------------------------------------------- q238
  /** The day-1 lifecycle half q122 deliberately amortizes into bench
    * warm-up (round 14, verdict): a FRESH near-dup index build on every
    * call — no memo — followed by the same day-2 classify over the
    * just-built tables. As a gated sf1 bench row this keeps the
    * expensive half of the stored-index lifecycle measured per round
    * (BENCH_SF1 shows build+classify here next to q122's steady-state
    * classify), and the q105 oracle keeps it hash-green: a build that
    * drops shingles, mis-bands, or mis-buckets surfaces as a wrong
    * classify answer, not just a slow row.
    *
    * Scale shape: the build is two bucketed writes (band index on bkey,
    * shingle store on id) — each one wide shuffle into the bucketing,
    * both corpus-sized exactly once; the classify then re-reads them
    * with zero history-side Exchange (same plan pin as q122).
    */
  val q238IndexBuild: QueryDef = QueryDef(
    "q238_index_build",
    (s, dir) => {
      val docs = Tables(s, dir, "documents")
      val tag = s"${pid}_${Integer.toHexString(dir.hashCode)}"
      graft.operators.DedupIndex.writeNearDupIndex(
        docs.filter(col("doc_id") % 5 =!= 0), col("doc_id"), col("text"),
        n = 3, bands = 32, rowsPerBand = 4,
        bandTable = s"graft_q238_band_$tag",
        shingleTable = s"graft_q238_sh_$tag", buckets = 8)
      graft.operators.DedupIndex.incrementalNearDedupIndexed(
          s.table(s"graft_q238_band_$tag"), s.table(s"graft_q238_sh_$tag"),
          docs.filter(col("doc_id") % 5 === 0), col("doc_id"), col("text"),
          n = 3, threshold = 0.8, bands = 32, rowsPerBand = 4)
        .orderBy(col("doc_id"))
    },
    q105DeltaNearDedup.oracle,
  )

  // --------------------------------------------------------------- q123
  /** The END-TO-END curation pipeline a training-data user actually
    * runs, composed from five individually-graded operators in their
    * production order: Gopher-style quality gate (q63 thresholds) →
    * language gate (q31's n-gram heuristic, English) → exact
    * keep-first dedup on the leading 100 chars (q33's key) →
    * benchmark decontamination against the doc_id % 10 holdout's
    * 8-gram shingles (q62's bloom + broadcast verify) → per-source
    * token-budget cut in LCG order (q77). Each stage is hash-green
    * alone; this row pins that the COMPOSITION is — gate ordering,
    * join types (semi for keeps, anti for contamination), and the
    * budget window all have to agree with the oracle's CTE chain.
    *
    * Scale shape: the gates are narrow scans; dedup is one shuffle on
    * the key; decontamination is a scan-side bloom prefilter + a
    * broadcast verify join; the budget cut shuffles once on source.
    * The corpus text never shuffles except for the dedup key exchange.
    */
  val q123CurationPipeline: QueryDef = QueryDef(
    "q123_curation_pipeline",
    (s, dir) => {
      val docs = Tables(s, dir, "documents")
      val bench = docs.filter(col("doc_id") % 10 === 0)
      val corpus = docs.filter(col("doc_id") % 10 =!= 0)
      val keep = graft.operators.CorpusFilter
        .gopherFlags(corpus, col("doc_id"), col("text"),
          graft.operators.CorpusFilter.Thresholds(minTokens = 30,
            maxTokens = 10000, maxDupTokenFrac = 0.6,
            maxDupBigramFrac = 0.05))
        .filter(col("keep")).select("doc_id")
      // hits array computed once behind a fence (round 18, r17 verdict
      // item 6): unfenced, PushPredicateThroughNonJoin substitutes the
      // projection back into the filter and the when-chain re-evaluates
      // the byte-pass per comparison in any non-CSE context
      val gated = corpus.join(keep, Seq("doc_id"), "left_semi")
        .withColumn("__lang_hits", graft.plans.Fence.fence(
          graft.functions.TextFunctions.langIdHits(col("text"))))
        .filter(graft.functions.TextFunctions
          .langIdFromHits(col("__lang_hits")) === "en")
        .drop("__lang_hits")
      val reps = Dedup.exactByKey(gated,
          substring(col("text"), 1, 100), col("doc_id"))
        .select(col("rep_id").as("doc_id"))
      val deduped = gated.join(reps, Seq("doc_id"), "left_semi")
      val contam = graft.operators.Decontaminate.contaminated(
        deduped, col("doc_id"), col("text"),
        graft.operators.Decontaminate.benchmarkShingles(
          bench, col("text"), n = 8), n = 8)
      val clean = deduped.join(contam.select("doc_id"),
        Seq("doc_id"), "left_anti")
      Scale.tokenBudgetSample(clean, col("source"), col("doc_id"),
          size(split(col("text"), " ")),
          budgets = Map("src3" -> 800L), defaultBudget = 1500L)
        .orderBy(col("source"), col("cum_tokens"))
    },
    Some("""
      WITH corpus AS (
        SELECT doc_id, source, text FROM documents WHERE doc_id % 10 <> 0),
      tk AS (
        SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
        FROM corpus),
      u AS (SELECT doc_id, len(toks) AS n, len(list_distinct(toks)) AS d FROM tk),
      bg AS (SELECT doc_id,
          CASE WHEN len(toks) >= 2 THEN len(toks) - 1 ELSE 0 END AS nb,
          CASE WHEN len(toks) >= 2 THEN
            len(list_distinct([toks[i] || ' ' || toks[i+1] for i in range(1, len(toks))]))
          ELSE 0 END AS db
        FROM tk),
      quality AS (
        SELECT u.doc_id
        FROM u JOIN bg USING (doc_id)
        WHERE u.n BETWEEN 30 AND 10000
          AND CAST(u.n - u.d AS DOUBLE) / u.n <= 0.6
          AND (bg.nb = 0 OR CAST(bg.nb - bg.db AS DOUBLE) / bg.nb <= 0.05)),
      lc AS (SELECT doc_id,
          len(list_filter(toks, x -> x IN ('the','a','is','and','of'))) AS c_en,
          len(list_filter(toks, x -> x IN ('der','die','das','und','ist'))) AS c_de,
          len(list_filter(toks, x -> x IN ('el','la','los','es','y'))) AS c_es,
          len(list_filter(toks, x -> x IN ('le','les','est','et','une'))) AS c_fr,
          len(list_filter(toks, x -> x IN ('的','是','了','在','我'))) AS c_zh
        FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM corpus)),
      lang AS (
        SELECT doc_id FROM lc
        WHERE NOT (c_en = 0 AND c_de = 0 AND c_es = 0 AND c_fr = 0 AND c_zh = 0)
          AND c_en >= c_de AND c_en >= c_es AND c_en >= c_fr AND c_en >= c_zh),
      gated AS (
        SELECT c.doc_id, c.source, c.text
        FROM corpus c JOIN quality USING (doc_id) JOIN lang USING (doc_id)),
      dedup AS (
        SELECT * FROM gated
        QUALIFY doc_id = MIN(doc_id) OVER (PARTITION BY substr(text, 1, 100))),
      g8 AS (
        SELECT doc_id,
          list_distinct([list_reduce(t[i:i+7], (a, b) -> a || ' ' || b)
                         for i in range(1, len(t) - 6)]) AS g
        FROM (SELECT doc_id, string_split(text, ' ') AS t FROM dedup)
        WHERE len(t) >= 8),
      bench AS (
        SELECT DISTINCT unnest(g) AS gram FROM (
          SELECT list_distinct([list_reduce(t[i:i+7], (a, b) -> a || ' ' || b)
                                for i in range(1, len(t) - 6)]) AS g
          FROM (SELECT string_split(text, ' ') AS t
                FROM documents WHERE doc_id % 10 = 0)
          WHERE len(t) >= 8)),
      contam AS (
        SELECT DISTINCT doc_id
        FROM (SELECT doc_id, unnest(g) AS gram FROM g8) cg
        JOIN bench USING (gram)),
      clean AS (
        SELECT * FROM dedup WHERE doc_id NOT IN (SELECT doc_id FROM contam)),
      d AS (SELECT source, doc_id AS id, len(string_split(text, ' ')) AS n_tokens,
          ((doc_id % 2147483648) * 1103515245 + 12345) % 2147483648 AS h
        FROM clean),
      cum AS (SELECT source, id, n_tokens,
          CAST(SUM(n_tokens) OVER (PARTITION BY source ORDER BY h, id
            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens FROM d)
      SELECT source, id, n_tokens, cum_tokens FROM cum
      WHERE cum_tokens <= CASE source WHEN 'src3' THEN 800 ELSE 1500 END
      ORDER BY source, cum_tokens"""),
  )

  // --------------------------------------------------------------- q248
  /** DSIR-style data selection
    * ([[graft.operators.CorpusFilter.dsirScores]]): the 100 non-'en'
    * documents whose hashed unigram+bigram profile is most 'en'-like,
    * by integer importance ratios between an add-one-smoothed
    * bag-of-hashed-ngrams model of the target ('en') rows and one of
    * the pool — the importance-resampling data-selection method
    * (Xie et al. 2023) in this repo's float-free exact form (per-bucket
    * probability ratio in micro-units instead of a log-ratio; the
    * paper's Gumbel noise replaced by the deterministic top-k
    * ablation, which is what a DuckDB oracle can replay bit-exactly).
    * Features hash through the portable rolling hash into 1024
    * buckets, so model fit, per-bucket weights, and every document
    * score hash-match across engines. Scale shape: two scan-shaped
    * shuffles and one 1024-row broadcast — the model never exceeds the
    * bucket count whatever the corpus size.
    */
  val q248DsirSelect: QueryDef = QueryDef(
    "q248_dsir_select",
    (s, dir) =>
      graft.operators.CorpusFilter.dsirScores(
          Tables(s, dir, "documents"), col("doc_id"), col("text"),
          col("lang") === "en", buckets = 1024)
        .orderBy(col("score_micro").desc, col("doc_id"))
        .limit(100),
    Some(s"""
      WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS w
        FROM documents),
      uni AS (SELECT doc_id, lang, unnest(w) AS feat FROM t),
      bi AS (SELECT doc_id, lang, w[i] || ' ' || w[i + 1] AS feat
        FROM t, LATERAL (SELECT unnest(range(1, len(w))) AS i) r),
      feats AS (
        SELECT * FROM uni WHERE feat <> ''
        UNION ALL SELECT * FROM bi WHERE feat <> ''),
      fb AS (SELECT doc_id, lang = 'en' AS is_t,
          ${graft.queries.ScaleQueries.FpLambda.format("feat")} % 1024
            AS b, COUNT(*) AS cnt
        FROM feats GROUP BY 1, 2, 3),
      m AS (SELECT b,
          CAST(COALESCE(SUM(CASE WHEN is_t THEN cnt END), 0) AS BIGINT)
            AS ct,
          CAST(COALESCE(SUM(CASE WHEN NOT is_t THEN cnt END), 0)
            AS BIGINT) AS cs
        FROM fb GROUP BY b),
      tot AS (SELECT CAST(SUM(ct) AS BIGINT) AS nt,
          CAST(SUM(cs) AS BIGINT) AS ns FROM m),
      r AS (SELECT b,
          CAST((CAST(ct + 1 AS HUGEINT) * (ns + 1024) * 1000000)
            // (CAST(cs + 1 AS HUGEINT) * (nt + 1024)) AS BIGINT)
            AS ratio_micro
        FROM m, tot),
      sc AS (SELECT fb.doc_id, CAST(SUM(cnt) AS BIGINT) AS n_feats,
          CAST(SUM(CAST(cnt AS HUGEINT) * ratio_micro) AS BIGINT)
            AS score_micro
        FROM fb JOIN r USING (b) WHERE NOT is_t GROUP BY fb.doc_id)
      SELECT doc_id, n_feats, score_micro FROM sc
      ORDER BY score_micro DESC, doc_id LIMIT 100"""),
  )

  val all: Seq[QueryDef] = Seq(q74StreamJoin, q75SnapshotDiff,
    q76StratifiedSample, q77TokenBudget, q78ZOrder, q79Int8Ann,
    q80SemanticDedup, q81SeqPack, q82BigramNovelty, q83EditDistance,
    q84ExactMoments, q85StreamEnrich, q86GroupTopK, q87Funnel,
    q88Retention, q91OovRate, q92DeltaDedup, q93PageRank,
    q102Projection, q103GroupedSplit, q104ZScores, q105DeltaNearDedup,
    q106KMeans, q107EquiDepth, q108Triangles, q109DistinctReplay,
    q110BloomJoin, q111BinnedQuantiles, q112OrcRoundtrip,
    q113CsvRoundtrip, q114TargetEncode, q115SchemaEvolution,
    q116CountMin, q117PercentRank, q118StreamCountMin, q119NextEvent,
    q120NegativeSample, q121IndexedDeltaDedup, q122IndexedNearDedup,
    q123CurationPipeline, q238IndexBuild, q248DsirSelect)
}
