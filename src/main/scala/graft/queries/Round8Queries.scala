package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** Round-8 additions beyond the index/proof consolidation: the dedup
  * index maintained by Structured Streaming (q124), distributed BPE
  * merge learning — tokenizer training at corpus scale (q125), and
  * deterministic BM25 retrieval (q126). Oracles replay the identical
  * arithmetic in DuckDB; q125's replays the whole ITERATIVE training
  * loop as one chained CTE per merge step.
  */
object Round8Queries {

  // --------------------------------------------------------------- q124
  /** The exact-dedup index maintained BY Structured Streaming
    * ([[graft.streaming.EventsStream.streamedDedupIndex]]): the
    * stateful aggregation's state IS the (key → min id, count)
    * representative table of [[graft.operators.DedupIndex]], updated
    * per micro-batch as the corpus arrives — no batch rebuild, state
    * bounded by distinct keys (the index's own size). Drained in
    * complete mode on the bounded source it must equal q33's
    * batch-built index bit-for-bit (streaming-equals-batch), so q33's
    * oracle grades the streaming path end to end — the same
    * structural pairing as q118 reusing q116's oracle for the
    * streamed count-min.
    */
  val q124StreamDedupIndex: QueryDef = QueryDef(
    "q124_stream_dedup_index",
    (s, dir) => graft.streaming.EventsStream.streamedDedupIndex(s, dir),
    Some("""
      SELECT MIN(doc_id) AS rep_id, COUNT(*) AS group_size
      FROM documents
      GROUP BY substr(text, 1, 100)
      ORDER BY rep_id"""),
  )

  // --------------------------------------------------------------- q125
  /** The BPE merge-learning oracle, generated per step: the word
    * histogram once, then per merge i a symbol split (a_i), a zipped
    * adjacent-pair count (p_i), the argmax pair (b_i), and the merge
    * applied (s_i) — the exact chain [[graft.operators.Vocabulary
    * .bpeMerges]] runs distributed, replayed as SQL. CTEs are
    * MATERIALIZED: each s_i is referenced twice (by a_{i+1} and
    * s_{i+1}), so the default inlining would recompute the chain
    * 2^merges times. The '··' double fence makes replace-all exact
    * (see the operator doc).
    */
  /** The shared BPE learn-chain CTEs (word histogram, fenced s0, then
    * per merge i: split a_i → pair count p_i → argmax b_i → merge
    * applied s_i). `word` rides through every s_i so the final state
    * doubles as the word → encoded-symbols table q127 consumes; q125
    * reads only the b_i rows. Ends WITHOUT a closing paren — callers
    * append their own final CTEs/SELECT.
    */
  private def bpeLearnCtes(merges: Int): String = {
    val steps = (1 to merges).map { i =>
      val p = i - 1
      s"""      a$i AS MATERIALIZED (
        SELECT cnt, list_filter(string_split(sym, '·'), x -> x <> '') AS a
        FROM s$p),
      p$i AS (
        SELECT l AS lhs, r AS rhs, CAST(SUM(cnt) AS BIGINT) AS freq FROM (
          SELECT cnt, unnest(a[1:len(a) - 1]) AS l, unnest(a[2:len(a)]) AS r
          FROM a$i WHERE len(a) >= 2)
        GROUP BY l, r),
      b$i AS MATERIALIZED (SELECT lhs, rhs, freq FROM p$i
        ORDER BY freq DESC, lhs, rhs LIMIT 1),
      s$i AS MATERIALIZED (
        SELECT word, replace(sym, '·' || lhs || '··' || rhs || '·',
          '·' || lhs || rhs || '·') AS sym, cnt
        FROM s$p, b$i)"""
    }.mkString(",\n")
    s"""
      WITH w AS (
        SELECT word, COUNT(*) AS cnt FROM (
          SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS word
          FROM documents)
        GROUP BY word),
      s0 AS MATERIALIZED (
        SELECT word, regexp_replace(word, '(.)', '·\\1·', 'g') AS sym, cnt
        FROM w),
$steps"""
  }

  private def bpeOracleSql(merges: Int): String = {
    val union = (1 to merges)
      .map(i =>
        s"      SELECT CAST($i AS BIGINT) AS step, lhs, rhs, freq FROM b$i")
      .mkString("\n      UNION ALL\n")
    s"""${bpeLearnCtes(merges)}
$union
      ORDER BY step"""
  }

  /** Distributed BPE merge learning graded end to end
    * ([[graft.operators.Vocabulary.bpeMerges]]): 12 merge steps over
    * the full corpus word histogram, the learned (step, lhs, rhs,
    * freq) merge table hash-compared against the oracle's replay of
    * the identical iterative process. Every step's argmax feeds the
    * next step's state, so one row of drift at ANY step cascades
    * through the rest — this row certifies the whole training loop,
    * not a single pass.
    */
  val q125BpeMerges: QueryDef = QueryDef(
    "q125_bpe_merges",
    (s, dir) => graft.operators.Vocabulary.bpeMerges(
        Tables(s, dir, "documents"), col("text"), merges = 12)
      .orderBy(col("step")),
    Some(bpeOracleSql(12)),
  )

  // --------------------------------------------------------------- q126
  /** Deterministic BM25 top-30 ([[graft.operators.Search.bm25TopK]]):
    * rational idf core (no libm log), micro-unit integer scores (no
    * float-sum reassociation). The oracle replays the identical IEEE
    * op sequence — every division and multiply in the same order —
    * so the floor at micro precision lands on the same long in both
    * engines (the q79 cosine argument).
    */
  val q126Bm25: QueryDef = QueryDef(
    "q126_bm25_topk",
    (s, dir) => graft.operators.Search.bm25TopK(
      Tables(s, dir, "documents"), col("doc_id"), col("text"),
      terms = Seq("data", "table", "query"), k = 30),
    Some("""
      WITH base AS (
        SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS dl
        FROM documents),
      n AS (SELECT COUNT(*) AS n, CAST(SUM(dl) AS BIGINT) AS tot FROM base),
      f AS (
        SELECT t.doc_id, b.dl, t.tk, COUNT(*) AS tf
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tk
              FROM documents) t
        JOIN base b USING (doc_id)
        WHERE t.tk IN ('data', 'table', 'query')
        GROUP BY t.doc_id, b.dl, t.tk),
      d AS (SELECT tk, COUNT(*) AS df FROM f GROUP BY tk),
      m AS (
        SELECT f.doc_id,
          CAST(floor((n.n - d.df + 0.5) / (d.df + 0.5)
            * (f.tf * 2.2)
            / (f.tf + 1.2 * (1.0 - 0.75 + 0.75 * (f.dl * n.n) / n.tot))
            * 1000000.0) AS BIGINT) AS micro
        FROM f JOIN d USING (tk), n)
      SELECT doc_id, CAST(SUM(micro) AS BIGINT) AS score,
        COUNT(*) AS terms_matched
      FROM m GROUP BY doc_id
      ORDER BY score DESC, doc_id LIMIT 30"""),
  )

  // --------------------------------------------------------------- q127
  /** Tokenizer train → APPLY, graded end to end
    * ([[graft.operators.Vocabulary.bpeTokenCounts]]): learn 12 merges
    * (q125's loop), encode every document with the learned table, and
    * report per-document word/token counts — the numbers every
    * token-budget, packing, and cost estimate downstream consumes.
    * The oracle re-runs the q125 learn chain with `word` carried
    * through each merge state, so the final s12 IS the
    * word → encoded-symbols table; token counts replay as symbol
    * counts joined back onto the corpus occurrences. Train and apply
    * share the double-fence encoding, so a drift in EITHER phase
    * breaks the hash.
    */
  val q127BpeTokenCounts: QueryDef = QueryDef(
    "q127_bpe_token_counts",
    (s, dir) => graft.operators.Vocabulary.bpeTokenCounts(
        Tables(s, dir, "documents"), col("doc_id"), col("text"),
        merges = 12)
      .orderBy(col("doc_id")),
    Some(s"""${bpeLearnCtes(12)},
      wt AS (
        SELECT word,
          CAST(len(list_filter(string_split(sym, '·'), x -> x <> ''))
            AS BIGINT) AS nt
        FROM s12),
      occ AS (
        SELECT doc_id, unnest(list_filter(string_split(text, ' '),
          x -> x <> '')) AS word
        FROM documents)
      SELECT doc_id, COUNT(*) AS n_words,
        CAST(SUM(nt) AS BIGINT) AS n_tokens
      FROM occ JOIN wt USING (word)
      GROUP BY doc_id
      ORDER BY doc_id"""),
  )

  // --------------------------------------------------------------- q128
  /** The SCD-2 interval-build CTE chain (events → change flags → runs
    * → intervals `f`), shared verbatim by q128 (the full table) and
    * q167 (the point-in-time snapshot read) so the two grades cannot
    * drift. Ends after `f` — callers append their SELECT. */
  private val Scd2OracleCtes = """
      WITH e AS (
        SELECT user_id AS k, event_type AS attr,
          CAST(epoch_ns(ts) // 1000 AS BIGINT) AS ts_us, event_id AS tb
        FROM events),
      o AS (
        SELECT k, attr, ts_us, tb,
          CASE WHEN lag(attr) OVER (PARTITION BY k ORDER BY ts_us, tb)
            IS NOT DISTINCT FROM attr THEN 0 ELSE 1 END AS chg
        FROM e),
      r AS (
        SELECT k, attr, ts_us,
          CAST(SUM(chg) OVER (PARTITION BY k ORDER BY ts_us, tb
            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS run_id
        FROM o),
      g AS (
        SELECT k, run_id, MIN(attr) AS attr,
          MIN(ts_us) AS valid_from_us, COUNT(*) AS n_events
        FROM r GROUP BY k, run_id),
      f AS (
        SELECT k AS user_id, attr AS event_type, valid_from_us,
          lead(valid_from_us) OVER (PARTITION BY k ORDER BY run_id)
            AS valid_to_us,
          n_events
        FROM g)"""

  /** SCD-2 dimension build ([[graft.operators.Scd2.build]]): each
    * user's event-type timeline collapsed into validity intervals
    * [valid_from, valid_to) with null-open current rows — the
    * dimension-table shape AsOfJoin/RangeJoin consume for
    * leakage-free as-of feature joins. Runs and interval closes are
    * window arithmetic over a (ts_us, event_id) total order, so the
    * oracle replays them exactly; one Exchange on user_id end to end.
    */
  val q128Scd2: QueryDef = QueryDef(
    "q128_scd2_intervals",
    (s, dir) => graft.operators.Scd2.build(Tables(s, dir, "events"),
        col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumnRenamed("k", "user_id")
      .withColumnRenamed("attr", "event_type")
      .orderBy(col("user_id"), col("valid_from_us")),
    Some(s"""$Scd2OracleCtes
      SELECT user_id, event_type, valid_from_us, valid_to_us, n_events,
        valid_to_us IS NULL AS is_current
      FROM f
      ORDER BY user_id, valid_from_us"""),
  )

  // --------------------------------------------------------------- q129
  /** Directional shingle containment
    * ([[graft.operators.Dedup.containmentPairs]]): the asymmetric
    * near-dup Jaccard can't see — a short document quoted whole
    * inside a long one. Integer ppm score (inter·10⁶ div n_a), no
    * float ratio anywhere; the oracle replays string-level 3-gram
    * sets (distinct hashed shingles ≡ distinct string shingles,
    * q34's argument).
    */
  val q129Containment: QueryDef = QueryDef(
    "q129_containment_pairs",
    (s, dir) => graft.operators.Dedup.containmentPairs(
        Tables(s, dir, "documents"), col("doc_id"), col("text"),
        n = 3, minPpm = 600000L)
      .orderBy(col("id_a"), col("id_b")),
    Some("""
      WITH docs AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      sh AS (
        SELECT doc_id,
          list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                         for i in range(1, len(t) - 1)]) AS shingles
        FROM docs WHERE len(t) >= 3),
      pairs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
          CAST(len(list_intersect(a.shingles, b.shingles)) * 1000000
            // len(a.shingles) AS BIGINT) AS cont_ppm
        FROM sh a JOIN sh b ON a.doc_id <> b.doc_id)
      SELECT id_a, id_b, cont_ppm FROM pairs
      WHERE cont_ppm >= 600000
      ORDER BY id_a, id_b"""),
  )

  // --------------------------------------------------------------- q130
  /** Graduated contamination report
    * ([[graft.operators.Decontaminate.contaminationReport]]): per
    * flagged document the distinct-8-gram count, overlap count, and
    * integer-ppm overlap fraction vs the doc_id % 10 holdout — the
    * decision variable real screens threshold on, where q62 answers
    * only yes/no. Bloom prefilter + broadcast verify; the fraction
    * replays at string level (distinct hashed shingles ≡ distinct
    * string shingles, q34's argument).
    */
  val q130ContaminationReport: QueryDef = QueryDef(
    "q130_contamination_report",
    (s, dir) => {
      val docs = Tables(s, dir, "documents")
      graft.operators.Decontaminate.contaminationReport(
          docs.filter(col("doc_id") % 10 =!= 0),
          col("doc_id"), col("text"),
          graft.operators.Decontaminate.benchmarkShingles(
            docs.filter(col("doc_id") % 10 === 0), col("text"), n = 8),
          n = 8, minPpm = 200000L)
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH g8 AS (
        SELECT doc_id,
          list_distinct([list_reduce(t[i:i+7], (a, b) -> a || ' ' || b)
                         for i in range(1, len(t) - 6)]) AS g
        FROM (SELECT doc_id, string_split(text, ' ') AS t
              FROM documents WHERE doc_id % 10 <> 0)
        WHERE len(t) >= 8),
      bench AS (
        SELECT DISTINCT unnest(g) AS gram FROM (
          SELECT list_distinct([list_reduce(t[i:i+7], (a, b) -> a || ' ' || b)
                                for i in range(1, len(t) - 6)]) AS g
          FROM (SELECT string_split(text, ' ') AS t
                FROM documents WHERE doc_id % 10 = 0)
          WHERE len(t) >= 8)),
      hits AS (
        SELECT doc_id, COUNT(*) AS n_overlap
        FROM (SELECT doc_id, unnest(g) AS gram FROM g8) cg
        JOIN bench USING (gram)
        GROUP BY doc_id),
      rep AS (
        SELECT h.doc_id, CAST(len(s.g) AS BIGINT) AS n_shingles,
          h.n_overlap,
          CAST(h.n_overlap * 1000000 // len(s.g) AS BIGINT) AS overlap_ppm
        FROM hits h JOIN g8 s USING (doc_id))
      SELECT doc_id, n_shingles, n_overlap, overlap_ppm FROM rep
      WHERE overlap_ppm >= 200000
      ORDER BY doc_id"""),
  )

  // --------------------------------------------------------------- q131
  /** Temperature-scaled mixture sampling
    * ([[graft.operators.Scale.temperatureBudgets]] feeding q77's
    * budget cut): per-source budgets ∝ sqrt(source tokens) — the
    * τ = 0.5 temperature reweighting of multilingual pretraining,
    * chosen because sqrt is the one power that is a correctly-rounded
    * IEEE primitive, so the budget table replays bit-for-bit (the
    * Σ sqrt folds in source-name order in both engines). The cut
    * itself is q77's deterministic LCG-ordered cumulative window.
    */
  val q131TemperatureMixture: QueryDef = QueryDef(
    "q131_temperature_mixture",
    (s, dir) => {
      val docs = Tables(s, dir, "documents")
      val nTokens = size(split(col("text"), " "))
      val budgets = graft.operators.Scale.temperatureBudgets(
        docs, col("source"), nTokens, total = 20000L)
      graft.operators.Scale.tokenBudgetSample(docs, col("source"),
          col("doc_id"), nTokens, budgets, defaultBudget = 0L)
        .orderBy(col("source"), col("cum_tokens"))
    },
    Some("""
      WITH d AS (
        SELECT source, doc_id AS id, len(string_split(text, ' ')) AS n_tokens,
          ((doc_id % 2147483648) * 1103515245 + 12345) % 2147483648 AS h
        FROM documents),
      agg AS (
        SELECT source, CAST(SUM(n_tokens) AS BIGINT) AS n
        FROM d GROUP BY source),
      tot AS (
        SELECT list_reduce(
          [0.0::DOUBLE] || list(sqrt(CAST(n AS DOUBLE)) ORDER BY source),
          (a, v) -> a + v) AS t
        FROM agg),
      b AS (
        SELECT source,
          CAST(floor(20000 * sqrt(CAST(n AS DOUBLE)) / tot.t) AS BIGINT)
            AS budget
        FROM agg, tot),
      c AS (
        SELECT source, id, n_tokens,
          CAST(SUM(n_tokens) OVER (PARTITION BY source ORDER BY h, id
            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
        FROM d)
      SELECT c.source, c.id, c.n_tokens, c.cum_tokens
      FROM c JOIN b USING (source)
      WHERE c.cum_tokens <= b.budget
      ORDER BY c.source, c.cum_tokens"""),
  )

  // --------------------------------------------------------------- q132
  /** Incremental materialized-view maintenance
    * ([[graft.operators.IncrementalAgg]]): the per-customer order
    * aggregate kept as a STORED state table (bucketed on the group
    * key) and advanced by folding in a delta — history is never
    * re-aggregated. The oracle aggregates the FULL table directly, so
    * the green row proves the monoid law the operator is built on:
    * `merge(state(history), state(delta)) == state(everything)`,
    * exactly — the sum state is an integer-scaled long, so the merge
    * is associative where a double sum would drift by reduction
    * order.
    */
  val q132IncrementalMv: QueryDef = QueryDef(
    "q132_incremental_mv",
    (s, dir) => {
      val ia = graft.operators.IncrementalAgg
      val ords = Tables(s, dir, "orders")
      ia.writeState(ia.state(ords.filter(col("o_orderkey") % 5 =!= 0),
          col("o_custkey"), col("o_totalprice"), digits = 2),
        s"graft_q132_state_$pid", buckets = 8)
      ia.view(ia.mergeDelta(s.table(s"graft_q132_state_$pid"),
          ords.filter(col("o_orderkey") % 5 === 0),
          col("o_custkey"), col("o_totalprice"), digits = 2), digits = 2)
        .orderBy(col("g"))
    },
    Some("""
      SELECT o_custkey AS g, COUNT(o_totalprice) AS cnt,
        CAST(SUM(CAST(ROUND(o_totalprice * 100.0) AS BIGINT)) AS DOUBLE)
          / 100.0 AS sum_x,
        CAST(MIN(CAST(ROUND(o_totalprice * 100.0) AS BIGINT)) AS DOUBLE)
          / 100.0 AS min_x,
        CAST(MAX(CAST(ROUND(o_totalprice * 100.0) AS BIGINT)) AS DOUBLE)
          / 100.0 AS max_x,
        CASE WHEN COUNT(o_totalprice) > 0 THEN
          CAST(SUM(CAST(ROUND(o_totalprice * 100.0) AS BIGINT)) AS DOUBLE)
            / (100.0 * COUNT(o_totalprice)) END AS avg_x
      FROM orders
      GROUP BY o_custkey
      ORDER BY g"""),
  )

  // --------------------------------------------------------------- q133
  /** Deterministic sampled quantiles
    * ([[graft.operators.Stats.sampledQuantiles]]): exact interpolated
    * percentiles over a hash32(id) mod 16 sample — the scale path
    * where q13's exact percentile buffers a whole group. Because
    * membership is the replayable arithmetic hash, the ESTIMATE is a
    * hash-exact value: the oracle replays the hash chain, takes the
    * identical sample, and must reproduce every quantile bit (after
    * the shared round-6), not just be "close".
    */
  val q133SampledQuantiles: QueryDef = QueryDef(
    "q133_sampled_quantiles",
    (s, dir) =>
      graft.operators.Stats.sampledQuantiles(Tables(s, dir, "events"),
          col("event_type"), col("event_id"), col("value"),
          probs = Seq(0.25, 0.5, 0.9), r = 16)
        .orderBy(col("g")),
    Some {
      val steps = graft.functions.PortableHash.hash32SqlSteps("event_id")
      s"""
      WITH h0 AS (SELECT event_type, value, ${steps(0)} AS h FROM events),
      h1 AS (SELECT event_type, value, ${steps(1)} AS h FROM h0),
      h2 AS (SELECT event_type, value, ${steps(2)} AS h FROM h1),
      hf AS (SELECT event_type, value, ${steps(3)} AS h FROM h2),
      smp AS (SELECT event_type, value FROM hf WHERE h % 16 = 0)
      SELECT event_type AS g, COUNT(*) AS n_sample,
        ROUND(quantile_cont(value, 0.25), 6) AS q0,
        ROUND(quantile_cont(value, 0.5), 6) AS q1,
        ROUND(quantile_cont(value, 0.9), 6) AS q2
      FROM smp GROUP BY event_type ORDER BY g"""
    },
  )

  // --------------------------------------------------------------- q134
  /** q132's materialized view maintained BY Structured Streaming
    * ([[graft.streaming.EventsStream.streamedMvState]]): the same
    * monoid state as a stateful streaming aggregation in complete
    * mode, drained and pushed through the same [[graft.operators
    * .IncrementalAgg.view]]. Reuses q132's oracle — the one-shot
    * full-table recompute — so the green row proves
    * streaming == incremental-batch == full recompute, closing the
    * triangle the way q124/q118 do for the dedup index and the
    * count-min cells.
    */
  val q134StreamMv: QueryDef = QueryDef(
    "q134_stream_mv",
    (s, dir) => graft.operators.IncrementalAgg.view(
        graft.streaming.EventsStream.streamedMvState(s, dir), digits = 2)
      .orderBy(col("g")),
    q132IncrementalMv.oracle,
  )

  // --------------------------------------------------------------- q135
  /** CDC apply ([[graft.operators.CdcApply]]): the events feed read
    * as a change log over a per-user profile (error = delete, all
    * else = upsert; order = (ts, event_id)), compacted per window by
    * the no-window struct-max argmax and folded
    * history-then-delta through [[graft.operators.CdcApply.merge]].
    * The oracle computes the live state from the FULL log in one
    * ROW_NUMBER pass, so the green row proves the maintenance law —
    * merge(compact(history), compact(delta)) == live(compact(all)) —
    * and the argmax-vs-window equivalence at once.
    */
  val q135CdcApply: QueryDef = QueryDef(
    "q135_cdc_apply",
    (s, dir) => {
      val ca = graft.operators.CdcApply
      val ev = Tables(s, dir, "events")
      val op = when(col("event_type") === "error", lit("D"))
        .otherwise(lit("U"))
      val attrs = Seq(
        "last_us" -> unix_micros(col("ts")),
        "event_type" -> col("event_type"),
        "value" -> col("value"))
      val split = lit("2024-01-16").cast("timestamp")
      def window(w: org.apache.spark.sql.DataFrame) =
        ca.compact(w, col("user_id"), Seq(col("ts"), col("event_id")),
          op, attrs)
      ca.merge(window(ev.filter(col("ts") < split)),
          window(ev.filter(col("ts") >= split)))
        .orderBy(col("k"))
    },
    Some("""
      WITH e AS (
        SELECT user_id, event_type, value, event_id,
          CAST(epoch_ns(ts) // 1000 AS BIGINT) AS us
        FROM events),
      r AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
          ORDER BY us DESC, event_id DESC) AS rn
        FROM e)
      SELECT user_id AS k, us AS last_us, event_type, value
      FROM r WHERE rn = 1 AND event_type <> 'error'
      ORDER BY k"""),
  )

  // --------------------------------------------------------------- q136
  /** q135's CDC live state maintained BY Structured Streaming
    * ([[graft.streaming.EventsStream.streamedCdcLive]]): compact's
    * argmax as a complete-mode stateful aggregation, state bounded by
    * the live table's own size. Reuses q135's full-log oracle —
    * streaming == windowed-batch == one-shot, the q124/q134 pairing
    * applied to CDC.
    */
  val q136StreamCdc: QueryDef = QueryDef(
    "q136_stream_cdc",
    (s, dir) => graft.streaming.EventsStream.streamedCdcLive(s, dir)
      .orderBy(col("k")),
    q135CdcApply.oracle,
  )

  // --------------------------------------------------------------- q137
  /** Join-key skew diagnosis ([[graft.operators.Scale.skewReport]]):
    * the measurement that tells a 1000-executor job whether a join
    * needs [[graft.operators.Scale.saltedJoin]] and at what fan-out —
    * top keys with integer-exact corpus share (ppm) and straggler
    * factor vs an even 32-partition spread. Every number is integer
    * floor arithmetic over exact counts: hash-identical in any
    * engine.
    */
  val q137SkewReport: QueryDef = QueryDef(
    "q137_skew_report",
    (s, dir) => graft.operators.Scale.skewReport(
      Tables(s, dir, "events"), col("event_type"), topN = 5, parts = 32),
    Some("""
      WITH c AS (
        SELECT event_type AS k, COUNT(*) AS cnt FROM events GROUP BY 1),
      t AS (SELECT SUM(cnt) AS n_total FROM c)
      SELECT k, cnt, CAST(cnt * 1000000 // n_total AS BIGINT) AS share_ppm,
        CAST(cnt * 32 // n_total AS BIGINT) AS skew_x
      FROM c, t ORDER BY cnt DESC, k LIMIT 5"""),
  )

  // --------------------------------------------------------------- q138
  /** Hybrid retrieval via reciprocal-rank fusion
    * ([[graft.operators.Search.rrfFuse]]): BM25 (q126's scorer) and
    * raw TF-IDF (q72's) each rank their top 30 for the same query,
    * and RRF fuses the two candidate lists rank-only in integer ppb.
    * The rank windows run over 30-row candidate lists (bounded by k,
    * not the corpus — the retrievers already did the corpus-sized
    * work), and the oracle replays both scorers' CTEs plus the
    * integer reciprocal sum end to end.
    */
  val q138RrfFusion: QueryDef = QueryDef(
    "q138_rrf_fusion",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val docs = Tables(s, dir, "documents")
      val terms = Seq("data", "table", "query")
      // candidate lists are k-sized: a single-partition rank window
      // here is 30 rows, not a corpus sort. The window's child plan
      // carries the retriever's own limit, which is what makes this
      // safe — PlanLint.emptyPartitionWindows asserts exactly that
      // (a partitionBy(lit(0)) declaration would NOT help: Spark 4's
      // EliminateWindowPartitions folds a foldable partition spec
      // away before WindowExec's single-partition check, round 15).
      def ranked(df: org.apache.spark.sql.DataFrame) =
        df.withColumn("rank", row_number().over(
            Window.orderBy(col("score").desc, col("doc_id"))).cast("long"))
          .select(col("doc_id"), col("rank"))
      graft.operators.Search.rrfFuse(Seq(
          ranked(graft.operators.Search.bm25TopK(docs, col("doc_id"),
            col("text"), terms, k = 30)),
          ranked(graft.operators.Search.topK(docs, col("doc_id"),
            col("text"), terms, k = 30))),
        k = 20)
    },
    Some("""
      WITH base AS (
        SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS dl
        FROM documents),
      n AS (SELECT COUNT(*) AS n, CAST(SUM(dl) AS BIGINT) AS tot FROM base),
      f AS (
        SELECT t.doc_id, b.dl, t.tk, COUNT(*) AS tf
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tk
              FROM documents) t
        JOIN base b USING (doc_id)
        WHERE t.tk IN ('data', 'table', 'query')
        GROUP BY t.doc_id, b.dl, t.tk),
      d AS (SELECT tk, COUNT(*) AS df FROM f GROUP BY tk),
      bm_m AS (
        SELECT f.doc_id,
          CAST(floor((n.n - d.df + 0.5) / (d.df + 0.5)
            * (f.tf * 2.2)
            / (f.tf + 1.2 * (1.0 - 0.75 + 0.75 * (f.dl * n.n) / n.tot))
            * 1000000.0) AS BIGINT) AS micro
        FROM f JOIN d USING (tk), n),
      bm AS (
        SELECT doc_id, CAST(SUM(micro) AS BIGINT) AS score
        FROM bm_m GROUP BY doc_id ORDER BY score DESC, doc_id LIMIT 30),
      tfidf AS (
        SELECT f.doc_id, CAST(SUM(f.tf * (n.n - d.df)) AS BIGINT) AS score
        FROM f JOIN d USING (tk), n
        GROUP BY f.doc_id ORDER BY score DESC, f.doc_id LIMIT 30),
      ranks AS (
        SELECT doc_id, ROW_NUMBER() OVER (ORDER BY score DESC, doc_id)
          AS rank FROM bm
        UNION ALL
        SELECT doc_id, ROW_NUMBER() OVER (ORDER BY score DESC, doc_id)
          AS rank FROM tfidf)
      SELECT doc_id,
        CAST(SUM(1000000000 // (60 + rank)) AS BIGINT) AS rrf_ppb,
        COUNT(*) AS n_lists
      FROM ranks GROUP BY doc_id
      ORDER BY rrf_ppb DESC, doc_id LIMIT 20"""),
  )

  // --------------------------------------------------------------- q139
  /** Deterministic curriculum order
    * ([[graft.operators.Scale.curriculumOrder]]): length-binned
    * easy→hard training order with an LCG intra-bin shuffle, ranked
    * by the two-phase range ranking (one range exchange, no
    * single-partition window — q117's graded operator shape). The
    * oracle is the definition itself: ROW_NUMBER over
    * (bin, lcg(id), id) minus one. Bit-equal positions prove both
    * the ranking machinery and the replayable shuffle.
    */
  val q139Curriculum: QueryDef = QueryDef(
    "q139_curriculum",
    (s, dir) => {
      val nTok = size(split(col("text"), " ")).cast("long")
      graft.operators.Scale.curriculumOrder(
          Tables(s, dir, "documents").select(col("doc_id"),
            nTok.as("n_tokens"),
            least(shiftright(nTok, 6), lit(7L)).as("bin")),
          col("doc_id"), col("bin"))
        .orderBy(col("curriculum_pos"))
    },
    Some("""
      WITH d AS (
        SELECT doc_id,
          CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
          LEAST(len(string_split(text, ' ')) // 64, 7) AS bin,
          ((doc_id % 2147483648) * 1103515245 + 12345) % 2147483648 AS h
        FROM documents)
      SELECT doc_id, n_tokens, CAST(bin AS BIGINT) AS bin,
        ROW_NUMBER() OVER (ORDER BY bin, h, doc_id) - 1 AS curriculum_pos
      FROM d ORDER BY curriculum_pos"""),
  )

  // --------------------------------------------------------------- q140
  /** ANN quality report ([[graft.operators.Similarity
    * .annQualityReport]]): the multi-probe LSH retriever (q39's graded
    * operator) audited against the exact brute-force truth (q38's),
    * per query — recall@10 and the reciprocal rank of the true nearest
    * neighbor, both as integer ppm. The oracle replays BOTH retrievers
    * (identical 8-plane signatures, probes, ranking) and the report
    * join, so the approximation's measured quality is itself
    * hash-checked — the eval harness is graded, not just the
    * retrievers it evaluates.
    */
  val q140AnnQuality: QueryDef = QueryDef(
    "q140_ann_quality",
    (s, dir) => {
      val emb = Tables(s, dir, "embeddings")
      val qs = emb.filter(col("vec_id") < 5)
      val truth = graft.operators.Similarity.bruteForceTopK(
        emb, qs, col("vec_id"), col("embedding"), k = 10)
      val approx = graft.operators.Similarity.lshTopK(
        emb, qs, col("vec_id"), col("embedding"), k = 10)
      graft.operators.Similarity.annQualityReport(truth, approx, k = 10)
        .orderBy(col("q_id"))
    },
    Some(s"""
      WITH z AS (SELECT vec_id, embedding,
        sqrt(list_reduce([0.0::DOUBLE] || [CAST(x AS DOUBLE) * CAST(x AS DOUBLE) for x in embedding], (a, v) -> a + v)) AS nrm,
        ${CurationQueries.lshCellSql(8)} AS bucket FROM embeddings),
      qz AS (SELECT * FROM z WHERE vec_id < 5),
      ex_scored AS (
        SELECT q.vec_id AS q_id, c.vec_id AS n_id,
          list_reduce([0.0::DOUBLE] || [CAST(q.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE) for i in range(1, len(q.embedding) + 1)], (x, v) -> x + v)
            / (q.nrm * c.nrm) AS cosine
        FROM qz q JOIN z c ON c.vec_id != q.vec_id),
      truth AS (
        SELECT q_id, n_id, ROW_NUMBER() OVER (PARTITION BY q_id
          ORDER BY cosine DESC, n_id) AS t_rank
        FROM ex_scored QUALIFY t_rank <= 10),
      qp AS (SELECT vec_id, embedding, nrm, xor(bucket, m) AS bucket
        FROM qz, LATERAL (SELECT unnest([0, 1, 2, 4, 8, 16, 32, 64, 128]) AS m) probes),
      cand AS (SELECT DISTINCT qp.vec_id AS q_id, c.vec_id AS n_id
        FROM qp JOIN z c USING (bucket) WHERE c.vec_id != qp.vec_id),
      ap_scored AS (SELECT cand.q_id, cand.n_id,
        list_reduce([0.0::DOUBLE] || [CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE) for i in range(1, len(a.embedding) + 1)], (x, v) -> x + v)
          / (a.nrm * b.nrm) AS cosine
        FROM cand JOIN z a ON a.vec_id = cand.q_id
                  JOIN z b ON b.vec_id = cand.n_id),
      approx AS (
        SELECT q_id, n_id, ROW_NUMBER() OVER (PARTITION BY q_id
          ORDER BY cosine DESC, n_id) AS a_rank
        FROM ap_scored QUALIFY a_rank <= 10),
      overlap AS (
        SELECT q_id, COUNT(*) AS n_overlap,
          MIN(CASE WHEN t_rank = 1 THEN a_rank END) AS nn_rank
        FROM truth JOIN approx USING (q_id, n_id)
        GROUP BY q_id)
      SELECT t.q_id,
        COALESCE(o.n_overlap, 0) AS n_overlap,
        COALESCE(o.n_overlap, 0) * 1000000 // 10 AS recall_ppm,
        COALESCE(1000000 // o.nn_rank, 0) AS nn_rr_ppm
      FROM (SELECT DISTINCT q_id FROM truth) t
      LEFT JOIN overlap o USING (q_id)
      ORDER BY q_id"""),
  )

  // ---- shared oracle fragments: the sketch family (q141-q144, q150)
  // and the expectations report (q148/q149). One definition per piece
  // of replay arithmetic — the FpLambda/SimhashCtes convention — so a
  // fix cannot desync one graded oracle from its siblings.

  /** 1 + leading zeros of the 26-bit HLL payload, as the CASE chain
    * both engines evaluate identically.
    */
  private[queries] val HllRankCase = (1 to 26).map(r =>
    s"WHEN w >= ${1L << (26 - r)} THEN $r").mkString(
    "CASE ", " ", " ELSE 27 END")

  /** α₆₄·m²·2²⁷ ×1000 — the HLL estimate numerator. */
  private val HllNum = 709L * 64L * 64L * (1L << 27)

  /** The scaled register sum with unhit registers at 2^27 each,
    * over columns (s_hit, n_hit).
    */
  private val HllSumSql = "(s_hit + (64 - n_hit) * 134217728)"

  /** Half-up integer α·m²/Σ2^−M over [[HllSumSql]]. */
  private[queries] val HllEstimateSql =
    s"(2 * $HllNum + 1000 * $HllSumSql) // (2000 * $HllSumSql)"

  /** Global (ungrouped) HLL estimate CTE chain ending in
    * `<src>est(estimate)`.
    */
  private def hllEstCtes(src: String, table: String, key: String) = {
    val steps = graft.functions.PortableHash.hash32SqlSteps(key)
    s"""
      ${src}h0 AS (SELECT ${steps(0)} AS h FROM $table
        WHERE $key IS NOT NULL),
      ${src}h1 AS (SELECT ${steps(1)} AS h FROM ${src}h0),
      ${src}h2 AS (SELECT ${steps(2)} AS h FROM ${src}h1),
      ${src}hf AS (SELECT ${steps(3)} AS h FROM ${src}h2),
      ${src}rw AS (SELECT h % 64 AS reg, h // 64 AS w FROM ${src}hf),
      ${src}regs AS (SELECT reg, MAX($HllRankCase) AS m FROM ${src}rw
        GROUP BY reg),
      ${src}sums AS (SELECT CAST(SUM(134217728 >> m) AS BIGINT) AS s_hit,
        COUNT(*) AS n_hit FROM ${src}regs),
      ${src}est AS (SELECT $HllEstimateSql AS estimate FROM ${src}sums)"""
  }

  /** CMS d=2×w=1024 cell-table CTE chain ending in
    * `<src>cell0/<src>cell1(pos, cnt)`.
    */
  private def cmsCellCtes(src: String, table: String, key: String) = {
    val steps = graft.functions.PortableHash.hash32SqlSteps(key)
    s"""
      ${src}c0 AS (SELECT ${steps(0)} AS h FROM $table
        WHERE $key IS NOT NULL),
      ${src}c1 AS (SELECT ${steps(1)} AS h FROM ${src}c0),
      ${src}c2 AS (SELECT ${steps(2)} AS h FROM ${src}c1),
      ${src}cf AS (SELECT ${steps(3)} AS h FROM ${src}c2),
      ${src}cell0 AS (SELECT h % 1024 AS pos, COUNT(*) AS cnt
        FROM ${src}cf GROUP BY 1),
      ${src}cell1 AS (SELECT (h >> 15) % 1024 AS pos, COUNT(*) AS cnt
        FROM ${src}cf GROUP BY 1)"""
  }

  /** AMS join-size estimate over two [[cmsCellCtes]] chains. */
  private def cmsJoinSizeSql(a: String, b: String) = s"""
      SELECT LEAST(
          COALESCE((SELECT CAST(SUM(x.cnt * y.cnt) AS BIGINT)
                    FROM ${a}cell0 x JOIN ${b}cell0 y USING (pos)), 0),
          COALESCE((SELECT CAST(SUM(x.cnt * y.cnt) AS BIGINT)
                    FROM ${a}cell1 x JOIN ${b}cell1 y USING (pos)), 0))
          AS est_join_size"""

  /** The one-scan expectations oracle: fused conditional counts over
    * `from`, unpacked into per-check report rows (q148/q149 share
    * this; optional `withCte` prepends a source CTE).
    */
  private def expectationsOracleSql(checks: Seq[(String, String)],
      from: String, withCte: Option[String]): String = {
    // mirrors Expectations' empty-batch contract exactly: sums
    // coalesce to 0 and ppm guards n_rows = 0, so an empty source
    // passes vacuously in BOTH engines instead of desyncing on NULLs
    val aggs = checks.map { case (n, p) =>
      s"COALESCE(CAST(SUM(CASE WHEN NOT COALESCE($p, FALSE) THEN 1 ELSE 0 END) AS BIGINT), 0) AS v_$n"
    }.mkString(",\n        ")
    val rows = checks.map { case (n, _) =>
      s"""SELECT '$n' AS check_name, n_rows, v_$n AS n_violations,
          CASE WHEN n_rows = 0 THEN 0
               ELSE v_$n * 1000000 // n_rows END AS violation_ppm,
          CAST(CASE WHEN v_$n = 0 THEN 1 ELSE 0 END AS BIGINT) AS passed
          FROM agg"""
    }.mkString("\n      UNION ALL\n      ")
    val withPrefix = withCte.map(c => s"$c,").getOrElse("")
    s"""
      WITH $withPrefix
      agg AS (SELECT COUNT(*) AS n_rows,
        $aggs
        FROM $from)
      $rows
      ORDER BY check_name"""
  }

  /** The hopping-window replay (q153 batch, q154 streaming — ONE
    * definition so the streaming-equals-batch pair cannot desync).
    */
  private val HoppingOracleSql = """
      WITH e AS (SELECT epoch_us(ts) // 1000000 AS sec, event_type
        FROM events),
      x AS (SELECT ((sec // 3600) - k) * 3600 AS bucket_start, event_type
        FROM e, (SELECT unnest(range(0, 3)) AS k) r)
      SELECT bucket_start, event_type, COUNT(*) AS n
      FROM x GROUP BY 1, 2 ORDER BY 1, 2"""

  /** Exact events⋈orders join size as a CTE body (q144 + q150). */
  private val ExactJoinSizeSql = """SELECT
          COALESCE(CAST(SUM(e.n * o.n) AS BIGINT), 0) AS exact_join_size
        FROM (SELECT user_id, COUNT(*) AS n FROM events
              WHERE user_id IS NOT NULL GROUP BY 1) e
        JOIN (SELECT o_custkey, COUNT(*) AS n FROM orders
              WHERE o_custkey IS NOT NULL GROUP BY 1) o
          ON e.user_id = o.o_custkey"""

  // --------------------------------------------------------------- q141
  /** Oracle-replayable HyperLogLog ([[graft.operators.HyperLogLog]]):
    * per-group approximate distinct parts from m = 64 six-bit
    * registers, next to the exact count. Completes the graded sketch
    * family (KMV q109, count-min q116/q118, bloom q110) with the
    * industry-standard distinct estimator in its most Spark-native
    * shape: two codegen'd hash aggregations, no UDAF, register table
    * ≤ 64 rows per group. The oracle replays the PortableHash chain,
    * the 26-arm leading-zero CASE, the per-register max, and the
    * pure-integer α·m²/Σ2^−M estimate — so the ESTIMATES hash-match,
    * not just the exact counts.
    */
  val q141HllReplay: QueryDef = QueryDef(
    "q141_hll_replay",
    (s, dir) => {
      val li = Tables(s, dir, "lineitem")
      val est = graft.operators.HyperLogLog.estimates(
        graft.operators.HyperLogLog.registers(
          li, col("l_returnflag"), col("l_partkey")))
      li.filter(col("l_partkey").isNotNull)
        .groupBy(col("l_returnflag").as("g"))
        .agg(countDistinct(col("l_partkey")).as("exact"))
        .join(est, Seq("g"))
        .select(col("g").as("flag"), col("exact"), col("estimate"),
          round(abs(col("estimate") - col("exact")).cast("double") /
            col("exact"), 4).as("rel_err"))
        .orderBy(col("flag"))
    },
    Some {
      val steps = graft.functions.PortableHash.hash32SqlSteps("l_partkey")
      s"""
      WITH h0 AS (
        SELECT l_returnflag AS flag, ${steps(0)} AS h
        FROM lineitem WHERE l_partkey IS NOT NULL),
      h1 AS (SELECT flag, ${steps(1)} AS h FROM h0),
      h2 AS (SELECT flag, ${steps(2)} AS h FROM h1),
      hf AS (SELECT flag, ${steps(3)} AS h FROM h2),
      rw AS (SELECT flag, h % 64 AS reg, h // 64 AS w FROM hf),
      regs AS (SELECT flag, reg, MAX($HllRankCase) AS m
        FROM rw GROUP BY flag, reg),
      sums AS (SELECT flag, CAST(SUM(134217728 >> m) AS BIGINT) AS s_hit,
          COUNT(*) AS n_hit
        FROM regs GROUP BY flag),
      est AS (SELECT flag, $HllEstimateSql AS estimate FROM sums),
      ex AS (SELECT l_returnflag AS flag,
          COUNT(DISTINCT l_partkey) AS exact
        FROM lineitem WHERE l_partkey IS NOT NULL GROUP BY 1)
      SELECT ex.flag, ex.exact, est.estimate,
        ROUND(CAST(ABS(est.estimate - ex.exact) AS DOUBLE) / ex.exact, 4)
          AS rel_err
      FROM ex JOIN est USING (flag) ORDER BY flag"""
    },
  )

  // --------------------------------------------------------------- q142
  /** The HLL register table maintained by Structured Streaming
    * ([[graft.streaming.EventsStream.streamedHllRegisters]]), then fed
    * through the same integer estimator as q141 and compared to the
    * exact batch distinct — approximate distinct users per event type
    * over the live event stream with ≤ 64 rows of state per group.
    * The oracle rebuilds registers and estimate from the events table
    * directly, so the graded claim is streaming-equals-batch down to
    * the estimate's exact integer value.
    */
  val q142StreamHll: QueryDef = QueryDef(
    "q142_stream_hll",
    (s, dir) => {
      val est = graft.operators.HyperLogLog.estimates(
        graft.streaming.EventsStream.streamedHllRegisters(s, dir))
      Tables(s, dir, "events")
        .filter(col("user_id").isNotNull)
        .groupBy(col("event_type").as("g"))
        .agg(countDistinct(col("user_id")).as("exact"))
        .join(est, Seq("g"))
        .select(col("g").as("etype"), col("exact"), col("estimate"),
          round(abs(col("estimate") - col("exact")).cast("double") /
            col("exact"), 4).as("rel_err"))
        .orderBy(col("etype"))
    },
    Some {
      val steps = graft.functions.PortableHash.hash32SqlSteps("user_id")
      s"""
      WITH h0 AS (
        SELECT event_type AS etype, ${steps(0)} AS h
        FROM events WHERE user_id IS NOT NULL),
      h1 AS (SELECT etype, ${steps(1)} AS h FROM h0),
      h2 AS (SELECT etype, ${steps(2)} AS h FROM h1),
      hf AS (SELECT etype, ${steps(3)} AS h FROM h2),
      rw AS (SELECT etype, h % 64 AS reg, h // 64 AS w FROM hf),
      regs AS (SELECT etype, reg, MAX($HllRankCase) AS m
        FROM rw GROUP BY etype, reg),
      sums AS (SELECT etype, CAST(SUM(134217728 >> m) AS BIGINT) AS s_hit,
          COUNT(*) AS n_hit
        FROM regs GROUP BY etype),
      est AS (SELECT etype, $HllEstimateSql AS estimate FROM sums),
      ex AS (SELECT event_type AS etype,
          COUNT(DISTINCT user_id) AS exact
        FROM events WHERE user_id IS NOT NULL GROUP BY 1)
      SELECT ex.etype, ex.exact, est.estimate,
        ROUND(CAST(ABS(est.estimate - ex.exact) AS DOUBLE) / ex.exact, 4)
          AS rel_err
      FROM ex JOIN est USING (etype) ORDER BY etype"""
    },
  )

  // --------------------------------------------------------------- q143
  /** HLL sketch merge ([[graft.operators.HyperLogLog.merge]]): the
    * per-event-type register tables (q142's state) unioned by
    * per-register max into ONE global sketch, whose integer estimate
    * is graded against the corpus-wide exact distinct. Because
    * max-of-max is max, the merged registers equal what a single
    * global pass would build — so the oracle can replay the registers
    * globally while the engine takes the merge path, and the
    * hash-match proves merge-of-parts equals whole. That equality is
    * the 100 TB property: shards/days sketch independently (64 rows
    * each) and combine without rescanning anything.
    */
  val q143HllMerge: QueryDef = QueryDef(
    "q143_hll_merge",
    (s, dir) => {
      val ev = Tables(s, dir, "events")
      val est = graft.operators.HyperLogLog.estimates(
        graft.operators.HyperLogLog.merge(
          graft.operators.HyperLogLog.registers(
            ev, col("event_type"), col("user_id")), "all"))
      ev.filter(col("user_id").isNotNull)
        .agg(countDistinct(col("user_id")).as("exact"))
        .withColumn("g", lit("all"))
        .join(est, Seq("g"))
        .select(col("g").as("scope"), col("exact"), col("estimate"),
          round(abs(col("estimate") - col("exact")).cast("double") /
            col("exact"), 4).as("rel_err"))
    },
    Some(s"""
      WITH ${hllEstCtes("", "events", "user_id").trim},
      ex AS (SELECT COUNT(DISTINCT user_id) AS exact
        FROM events WHERE user_id IS NOT NULL)
      SELECT 'all' AS scope, ex.exact, est.estimate,
        ROUND(CAST(ABS(est.estimate - ex.exact) AS DOUBLE) / ex.exact, 4)
          AS rel_err
      FROM ex CROSS JOIN est"""),
  )

  // --------------------------------------------------------------- q144
  /** Sketch-based join-size estimation ([[graft.operators
    * .FrequencySketch.cmsJoinSize]]): predict |events ⋈ orders| on
    * user/customer key from the two tables' CMS cell tables alone —
    * the AMS inner-product estimator, min over the d rows of
    * Σ cntA·cntB. The planner-style question ("can I afford this
    * join?") answered from 2·2·w longs without touching either table;
    * collisions only add, so the estimate never undercounts, and the
    * `overcount` column grades that one-sided error exactly. Every
    * step is portable integer arithmetic, so cells, inner products,
    * and the final min replay hash-exactly in DuckDB.
    */
  val q144JoinSizeSketch: QueryDef = QueryDef(
    "q144_join_size_sketch",
    (s, dir) => {
      val w = 1024
      val ev = Tables(s, dir, "events")
      val or = Tables(s, dir, "orders")
      val est = graft.operators.FrequencySketch.cmsJoinSize(
        graft.operators.FrequencySketch.cmsCells(ev, col("user_id"), w),
        graft.operators.FrequencySketch.cmsCells(or, col("o_custkey"), w))
      val exact = ev.filter(col("user_id").isNotNull)
        .groupBy(col("user_id")).agg(count(lit(1)).as("na"))
        .join(or.filter(col("o_custkey").isNotNull)
            .groupBy(col("o_custkey")).agg(count(lit(1)).as("nb")),
          col("user_id") === col("o_custkey"))
        .agg(coalesce(sum(col("na") * col("nb")), lit(0L))
          .as("exact_join_size"))
      exact.crossJoin(est)
        .select(col("exact_join_size"), col("est_join_size"),
          (col("est_join_size") - col("exact_join_size")).as("overcount"))
    },
    Some(s"""
      WITH ${cmsCellCtes("x", "events", "user_id").trim},
      ${cmsCellCtes("y", "orders", "o_custkey").trim},
      est AS (${cmsJoinSizeSql("x", "y")}),
      ex AS ($ExactJoinSizeSql)
      SELECT ex.exact_join_size, est.est_join_size,
        est.est_join_size - ex.exact_join_size AS overcount
      FROM ex CROSS JOIN est"""),
  )

  // --------------------------------------------------------------- q145
  /** Deterministic label propagation ([[graft.operators.Graph
    * .labelPropagation]]): 2 synchronous rounds over q93's symmetric
    * customer↔supplier trade graph, communities reported as
    * (community, size) for the 50 largest. Majority vote with
    * smallest-label tie-break makes every round a pure function of
    * the last, so the whole iterative clustering — votes, argmax,
    * membership — hash-matches the oracle's unrolled replay, the
    * same graded-determinism bar q93 sets for PageRank and q106 for
    * k-means.
    */
  val q145LabelProp: QueryDef = QueryDef(
    "q145_label_prop",
    (s, dir) => {
      val o = Tables(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"))
      val l = Tables(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"))
      val cs = o.join(l, col("o_orderkey") === col("l_orderkey"))
        .select(concat(lit("c"), col("o_custkey")).as("src"),
          concat(lit("s"), col("l_suppkey")).as("dst"))
      val edges = cs.union(
        cs.select(col("dst").as("src"), col("src").as("dst")))
      graft.operators.Graph.labelPropagation(edges, iters = 2)
        .groupBy(col("label").as("community"))
        .agg(count(lit(1)).as("size"))
        .orderBy(col("size").desc, col("community"))
        .limit(50)
    },
    Some {
      def round(prev: String, v: String, out: String) = s"""
      $v AS (SELECT e.dst AS node, l.label, COUNT(*) AS cnt
        FROM e JOIN $prev l ON e.src = l.node GROUP BY 1, 2),
      ${out}w AS (SELECT node, label, ROW_NUMBER() OVER (
          PARTITION BY node ORDER BY cnt DESC, label) AS rn FROM $v),
      $out AS (SELECT n.node, COALESCE(w.label, n.node) AS label
        FROM nodes n LEFT JOIN (SELECT node, label FROM ${out}w
          WHERE rn = 1) w USING (node))"""
      s"""
      WITH cs AS (
        SELECT DISTINCT 'c' || o_custkey AS src, 's' || l_suppkey AS dst
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
      e AS (SELECT src, dst FROM cs
            UNION SELECT dst AS src, src AS dst FROM cs),
      nodes AS (SELECT DISTINCT node FROM (
        SELECT src AS node FROM e UNION ALL SELECT dst FROM e)),
      l0 AS (SELECT node, node AS label FROM nodes),
      ${round("l0", "v1", "l1").trim},
      ${round("l1", "v2", "l2").trim}
      SELECT label AS community, COUNT(*) AS size
      FROM l2 GROUP BY 1 ORDER BY size DESC, community LIMIT 50"""
    },
  )

  // --------------------------------------------------------------- q146
  /** Backfill round-trip ([[graft.sources.Sinks.backfillPartitions]]):
    * events land day-partitioned, then the EARLIEST day is reprocessed
    * with a +1000-cent correction and written back through the
    * dynamic-partition-overwrite sink — only that day's directory is
    * replaced. The graded read aggregates the whole store per day, so
    * the hash-match proves BOTH halves of the backfill contract at
    * once: the corrected day carries the new values, and every other
    * day still carries the originals (a static overwrite would have
    * truncated them; the oracle replays the correction over the
    * source table with a CASE on the backfilled day).
    */
  val q146BackfillRoundtrip: QueryDef = QueryDef(
    "q146_backfill_roundtrip",
    (s, dir) => {
      val path = s"/tmp/graft_q146_events_$pid.parquet"
      val cents = (signum(col("value")) *
        floor(abs(col("value")) * 100 + lit(0.5))).cast("long")
      val base = Tables(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("event_type"),
          cents.as("cents"),
          date_format(col("ts"), "yyyyMMdd").cast("int").as("day_id"))
      graft.sources.Sinks.writePartitionedParquet(
        base, path, Seq("day_id"))
      val day0 = base.agg(min(col("day_id"))).head().getInt(0)
      graft.sources.Sinks.backfillPartitions(
        base.filter(col("day_id") === day0)
          .withColumn("cents", col("cents") + 1000L),
        path, Seq("day_id"))
      s.read.parquet(path)
        .groupBy(col("day_id").cast("long").as("day_id"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("cents_sum"))
        .orderBy(col("day_id"))
    },
    Some("""
      WITH base AS (
        SELECT event_id,
          CAST(CASE WHEN value >= 0 THEN FLOOR(value * 100 + 0.5)
               ELSE -FLOOR(-value * 100 + 0.5) END AS BIGINT) AS cents,
          CAST(strftime(ts, '%Y%m%d') AS BIGINT) AS day_id
        FROM events),
      d0 AS (SELECT MIN(day_id) AS day0 FROM base)
      SELECT day_id, COUNT(*) AS n,
        CAST(SUM(cents + CASE WHEN day_id = (SELECT day0 FROM d0)
                 THEN 1000 ELSE 0 END) AS BIGINT) AS cents_sum
      FROM base GROUP BY day_id ORDER BY day_id"""),
  )

  // --------------------------------------------------------------- q147
  /** Signed feature hashing ([[graft.ml.FeatureHash.hashedBow]]):
    * documents projected into a fixed 1024-dim feature space with no
    * vocabulary build — feat = rolling_hash(token) mod D, sign from
    * the next hash bit so collisions cancel in expectation. The
    * oracle replays tokenization, the polynomial hash, the sign
    * parity, and the signed sums, so the featurizer's exact sparse
    * output — including which collision rows cancelled to zero — is
    * hash-graded.
    */
  val q147FeatureHash: QueryDef = QueryDef(
    "q147_feature_hash",
    (s, dir) =>
      graft.ml.FeatureHash.hashedBow(
          Tables(s, dir, "documents").filter(col("doc_id") < 50),
          col("doc_id"), col("text"), dims = 1024)
        .orderBy(col("doc_id"), col("feat")),
    Some(s"""
      WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tk
        FROM documents WHERE doc_id < 50),
      tk AS (SELECT doc_id, tk FROM t WHERE tk <> ''),
      th AS (SELECT doc_id, ${ScaleQueries.FpLambda.format("tk")} AS h
        FROM tk),
      sv AS (SELECT doc_id, h % 1024 AS feat,
          1 - 2 * ((h // 1024) % 2) AS s FROM th),
      agg AS (SELECT doc_id, feat, CAST(SUM(s) AS BIGINT) AS val
        FROM sv GROUP BY 1, 2)
      SELECT doc_id, feat, val FROM agg WHERE val != 0
      ORDER BY doc_id, feat"""),
  )

  // --------------------------------------------------------------- q148
  /** Data-contract validation ([[graft.operators.Expectations
    * .validate]]): seven lineitem expectations — ranges, domains,
    * positivity, a referential-integrity check against orders via a
    * pre-joined null probe, and one deliberately tight bound so
    * nonzero violation ppm is exercised — all evaluated in ONE scan
    * as fused conditional counts. The oracle replays every check
    * with identical null-counts-as-violation semantics, so the
    * contract report (counts, ppm, pass bits) hash-matches.
    */
  val q148Expectations: QueryDef = QueryDef(
    "q148_expectations",
    (s, dir) => {
      val li = Tables(s, dir, "lineitem")
      val joined = li.join(
        Tables(s, dir, "orders")
          .select(col("o_orderkey").as("fk_ok")),
        col("l_orderkey") === col("fk_ok"), "left")
      graft.operators.Expectations.validate(joined, Seq(
          "c1_quantity_range" -> col("l_quantity").between(1, 50),
          "c2_price_positive" -> (col("l_extendedprice") > 0),
          "c3_flag_domain" -> col("l_returnflag").isin("A", "N", "R"),
          "c4_discount_range" -> col("l_discount").between(0, 0.1),
          "c5_fk_orders" -> col("fk_ok").isNotNull,
          "c6_shipdate_known" -> col("l_shipdate").isNotNull,
          "c7_quantity_le_10" -> (col("l_quantity") <= 10)))
        .orderBy(col("check_name"))
    },
    Some(expectationsOracleSql(
      Seq(
        "c1_quantity_range" -> "l_quantity BETWEEN 1 AND 50",
        "c2_price_positive" -> "l_extendedprice > 0",
        "c3_flag_domain" -> "l_returnflag IN ('A', 'N', 'R')",
        "c4_discount_range" -> "l_discount BETWEEN 0 AND 0.1",
        "c5_fk_orders" -> "fk_ok IS NOT NULL",
        "c6_shipdate_known" -> "l_shipdate IS NOT NULL",
        "c7_quantity_le_10" -> "l_quantity <= 10"),
      from = "j",
      withCte = Some("""j AS (
        SELECT l.*, o.o_orderkey AS fk_ok
        FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey)"""))),
  )

  // --------------------------------------------------------------- q149
  /** The data contract as a CONTINUOUS query ([[graft.streaming
    * .EventsStream.streamedExpectations]]): q148's fused conditional
    * counts running as a complete-mode streaming aggregation over the
    * live event feed — total state is one row of N+1 longs, the
    * cheapest stateful query in the repo — drained and unpacked into
    * the same report. The oracle replays the checks over the events
    * table directly, so streaming-equals-batch is graded down to the
    * exact violation counts and ppm.
    */
  val q149StreamExpectations: QueryDef = QueryDef(
    "q149_stream_expectations",
    (s, dir) =>
      graft.streaming.EventsStream.streamedExpectations(s, dir, Seq(
          "e1_type_domain" -> col("event_type").isin("click", "view"),
          "e2_user_notnull" -> col("user_id").isNotNull,
          "e3_value_nonneg" -> (col("value") >= 0),
          "e4_ts_2024" ->
            (col("ts") >= lit("2024-01-01").cast("timestamp"))))
        .orderBy(col("check_name")),
    Some(expectationsOracleSql(
      Seq(
        "e1_type_domain" -> "event_type IN ('click', 'view')",
        "e2_user_notnull" -> "user_id IS NOT NULL",
        "e3_value_nonneg" -> "value >= 0",
        "e4_ts_2024" -> "ts >= TIMESTAMP '2024-01-01'"),
      from = "events",
      withCte = None)),
  )

  // --------------------------------------------------------------- q150
  /** The planner report — sketches composed into EXPLAIN ESTIMATE for
    * the events⋈orders join, one row: row counts, HLL distinct-key
    * estimates for each side (q141's registers under a constant
    * group), the AMS join-size estimate from the CMS cell tables
    * (q144), and the exact join size for reference. This is the
    * composition argument made gradable: every number a cost-based
    * decision needs (broadcast? salt? how many output rows?) comes
    * from O(registers + cells) state, never a second scan of either
    * table at decision time — and the whole report hash-matches a
    * DuckDB replay assembled from the same oracle fragments the
    * component queries grade against.
    */
  val q150PlanEstimate: QueryDef = QueryDef(
    "q150_plan_estimate",
    (s, dir) => {
      import graft.operators.{FrequencySketch, HyperLogLog}
      val w = 1024
      val ev = Tables(s, dir, "events")
        .filter(col("user_id").isNotNull)
      val or = Tables(s, dir, "orders")
        .filter(col("o_custkey").isNotNull)
      val dA = HyperLogLog.estimates(HyperLogLog.registers(
          ev, lit("a"), col("user_id")))
        .select(col("estimate").as("dist_users_est"))
      val dB = HyperLogLog.estimates(HyperLogLog.registers(
          or, lit("b"), col("o_custkey")))
        .select(col("estimate").as("dist_custs_est"))
      val jz = FrequencySketch.cmsJoinSize(
          FrequencySketch.cmsCells(ev, col("user_id"), w),
          FrequencySketch.cmsCells(or, col("o_custkey"), w))
        .select(col("est_join_size"))
      val exact = ev.groupBy(col("user_id")).agg(count(lit(1)).as("na"))
        .join(or.groupBy(col("o_custkey")).agg(count(lit(1)).as("nb")),
          col("user_id") === col("o_custkey"))
        .agg(coalesce(sum(col("na") * col("nb")), lit(0L))
          .as("exact_join_size"))
      ev.agg(count(lit(1)).as("n_events"))
        .crossJoin(or.agg(count(lit(1)).as("n_orders")))
        .crossJoin(dA).crossJoin(dB).crossJoin(jz).crossJoin(exact)
    },
    Some(s"""
      WITH ${hllEstCtes("a", "events", "user_id").trim},
      ${hllEstCtes("b", "orders", "o_custkey").trim},
      ${cmsCellCtes("x", "events", "user_id").trim},
      ${cmsCellCtes("y", "orders", "o_custkey").trim},
      jz AS (${cmsJoinSizeSql("x", "y")}),
      ex AS ($ExactJoinSizeSql),
      cnts AS (SELECT
        (SELECT COUNT(*) FROM events WHERE user_id IS NOT NULL)
          AS n_events,
        (SELECT COUNT(*) FROM orders WHERE o_custkey IS NOT NULL)
          AS n_orders)
      SELECT cnts.n_events, cnts.n_orders,
        aest.estimate AS dist_users_est,
        best.estimate AS dist_custs_est,
        jz.est_join_size, ex.exact_join_size
      FROM cnts CROSS JOIN aest CROSS JOIN best
        CROSS JOIN jz CROSS JOIN ex"""),
  )

  // --------------------------------------------------------------- q151
  /** The LSH S-curve as a graded table ([[graft.operators.Dedup
    * .lshCurve]]): collision probability 1 − (1 − s^r)^b for every
    * banding of a 128-hash MinHash signature × Jaccard s ∈ {0.1..0.9}
    * — the design sheet that justifies q35's (32, 4) banding, with
    * both powers as fixed-order multiply folds so the doubles are
    * bit-identical to DuckDB's list_reduce replay. 45 rows that turn
    * "we picked the bands by the textbook curve" into a hash-checked
    * claim.
    */
  val q151LshTuning: QueryDef = QueryDef(
    "q151_lsh_tuning",
    (s, dir) =>
      graft.operators.Dedup.lshCurve(s,
          Seq((128, 1), (64, 2), (32, 4), (16, 8), (8, 16)))
        .orderBy(col("bands").desc, col("si")),
    Some("""
      WITH combos(bands, rows) AS (VALUES
        (128, 1), (64, 2), (32, 4), (16, 8), (8, 16)),
      grid AS (SELECT bands, rows, si
        FROM combos, (SELECT unnest(range(1, 10)) AS si)),
      calc AS (SELECT bands, rows, si,
        list_reduce([1.0::DOUBLE] || [si / 10.0 for i in range(1, rows + 1)],
          (a, v) -> a * v) AS sr
        FROM grid),
      p AS (SELECT bands, rows, si,
        ROUND(1.0 - list_reduce(
          [1.0::DOUBLE] || [(1.0 - sr) for i in range(1, bands + 1)],
          (a, v) -> a * v), 6) AS collide_prob
        FROM calc)
      SELECT CAST(bands AS BIGINT) AS bands, CAST(rows AS BIGINT) AS rows,
        CAST(si AS BIGINT) AS si, collide_prob
      FROM p ORDER BY bands DESC, si"""),
  )

  // --------------------------------------------------------------- q152
  /** Incremental JOIN-view maintenance ([[graft.operators
    * .IncrementalJoin.mergeDelta]]): the enriched events⋈customer
    * view advanced by insert-only deltas on BOTH sides (10% of events
    * and 1-in-7 customers arrive as the delta), then aggregated per
    * (segment, event type). The oracle recomputes the join from
    * scratch, so the hash-match proves the delta algebra
    * A⋈B ∪ ΔA⋈B_new ∪ A⋈ΔB partitions the new pairs exactly — no
    * pair lost, none double-counted — which is what lets steady state
    * cost O(Δ) instead of a nightly full join.
    */
  val q152IncrementalJoin: QueryDef = QueryDef(
    "q152_incremental_join",
    (s, dir) => {
      val ev = Tables(s, dir, "events")
        .filter(col("user_id").isNotNull)
        .select(col("user_id"), col("event_id"), col("event_type"))
      val cust = Tables(s, dir, "customer")
        .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
      val (dA, oA) = (ev.filter(col("event_id") % 10 === 0),
        ev.filter(col("event_id") % 10 =!= 0))
      val (dB, oB) = (cust.filter(col("user_id") % 7 === 0),
        cust.filter(col("user_id") % 7 =!= 0))
      val oldView = oA.join(oB, Seq("user_id"))
      graft.operators.IncrementalJoin
        .mergeDelta(oldView, oA, dA, oB, dB, "user_id")
        .groupBy(col("c_mktsegment"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("c_mktsegment"), col("event_type"))
    },
    Some("""
      SELECT c.c_mktsegment, e.event_type, COUNT(*) AS n
      FROM events e JOIN customer c ON e.user_id = c.c_custkey
      WHERE e.user_id IS NOT NULL
      GROUP BY 1, 2 ORDER BY 1, 2"""),
  )

  // --------------------------------------------------------------- q153
  /** Hopping-window aggregation: Spark's native sliding
    * `window(ts, "3 hours", "1 hour")` — each event expands into
    * window/slide = 3 overlapping buckets via Expand before the
    * map-side-combining count (the inherent cost of hopping windows;
    * the expansion factor is the ratio, never data-dependent). The
    * oracle replays the bucket assignment as pure integer epoch
    * arithmetic — start ∈ {⌊t⌋ₕ, ⌊t⌋ₕ−1h, ⌊t⌋ₕ−2h} — so the
    * engine's window alignment, inclusivity, and per-bucket counts
    * all hash-match. Complements q14/q40's tumbling windows.
    */
  val q153HoppingWindow: QueryDef = QueryDef(
    "q153_hopping_window",
    (s, dir) =>
      Tables(s, dir, "events")
        .groupBy(window(col("ts"), "3 hours", "1 hour").as("w"),
          col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(col("w.start").cast("long").as("bucket_start"),
          col("event_type"), col("n"))
        .orderBy(col("bucket_start"), col("event_type")),
    Some(HoppingOracleSql),
  )

  // --------------------------------------------------------------- q154
  /** q153's hopping windows maintained BY Structured Streaming
    * ([[graft.streaming.EventsStream.hoppingCounts]]): the sliding
    * window runs as a complete-mode stateful aggregation (complete
    * mode retains every window on the bounded source — a continuous
    * deployment uses append/update with a watermark instead; see
    * hoppingCounts' doc), and the drained counts must equal the
    * batch expansion bit-for-bit — the last member of the
    * streaming-equals-batch family (windows q40, dedup q41, index
    * q124, MV q134, CDC q136, CMS q118, HLL q142, contract q149).
    * Oracle: the SAME [[HoppingOracleSql]] as q153, single-sourced.
    */
  val q154StreamHopping: QueryDef = QueryDef(
    "q154_stream_hopping",
    (s, dir) => graft.streaming.EventsStream.hoppingCounts(s, dir),
    Some(HoppingOracleSql),
  )

  // --------------------------------------------------------------- q155
  /** Per-group top-k by aggregation ([[graft.plans.TopKByKey]]): the
    * 3 highest-priced lineitems per return flag from an O(k) typed
    * Aggregator buffer — where the textbook ROW_NUMBER-per-group
    * window sorts and materializes ENTIRE groups on single tasks
    * (fatal under group skew at scale) and collect_list buffers
    * group-sized state, this keeps k pairs per group with map-side
    * partial aggregation. Total (score DESC, id ASC) ordering makes
    * the retained set order-free, so the oracle IS that textbook
    * window — the two must agree rank-for-rank.
    */
  val q155GroupTopK: QueryDef = QueryDef(
    "q155_group_topk",
    (s, dir) => {
      val li = Tables(s, dir, "lineitem")
      val cents = (signum(col("l_extendedprice")) *
        floor(abs(col("l_extendedprice")) * 100 + lit(0.5))).cast("long")
      val id = col("l_orderkey") * 10 + col("l_linenumber")
      li.groupBy(col("l_returnflag").as("flag"))
        .agg(graft.plans.TopKByKey.topK(cents, id, 3).as("tk"))
        .select(col("flag"), posexplode(col("tk")))
        .select(col("flag"), (col("pos") + 1).cast("long").as("rank"),
          col("col._1").as("price_cents"), col("col._2").as("row_id"))
        .orderBy(col("flag"), col("rank"))
    },
    Some("""
      WITH s AS (SELECT l_returnflag AS flag,
        CAST(CASE WHEN l_extendedprice >= 0
             THEN FLOOR(l_extendedprice * 100 + 0.5)
             ELSE -FLOOR(-l_extendedprice * 100 + 0.5) END AS BIGINT)
          AS price_cents,
        l_orderkey * 10 + l_linenumber AS row_id FROM lineitem),
      r AS (SELECT flag, price_cents, row_id,
        ROW_NUMBER() OVER (PARTITION BY flag
          ORDER BY price_cents DESC, row_id) AS rank
        FROM s)
      SELECT flag, rank, price_cents, row_id FROM r WHERE rank <= 3
      ORDER BY flag, rank"""),
  )

  // --------------------------------------------------------------- q156
  /** q155's bounded top-k Aggregator as CONTINUOUS streaming state
    * ([[graft.streaming.EventsStream.streamedTopK]]): the live
    * leaderboard — top-3 events per type by value — with O(k) state
    * per group however long the stream runs. Extends the
    * streaming-equals-batch family to the custom-Aggregator surface
    * (the declarative sketches had it; this proves typed mergeable
    * buffers get it too). Oracle: the same textbook ROW_NUMBER window
    * as q155, over events.
    */
  val q156StreamTopK: QueryDef = QueryDef(
    "q156_stream_topk",
    (s, dir) => graft.streaming.EventsStream.streamedTopK(s, dir, 3),
    Some("""
      WITH s AS (SELECT event_type,
        CAST(CASE WHEN value >= 0
             THEN FLOOR(value * 100 + 0.5)
             ELSE -FLOOR(-value * 100 + 0.5) END AS BIGINT)
          AS value_cents,
        event_id FROM events),
      r AS (SELECT event_type, value_cents, event_id,
        ROW_NUMBER() OVER (PARTITION BY event_type
          ORDER BY value_cents DESC, event_id) AS rank
        FROM s)
      SELECT event_type, rank, value_cents, event_id FROM r
      WHERE rank <= 3 ORDER BY event_type, rank"""),
  )

  // --------------------------------------------------------------- q157
  /** Right-to-be-forgotten erasure ([[graft.sources.Sinks
    * .eraseKeys]]): events land day-partitioned, every user_id
    * divisible by 101 is erased, and the per-day (count, distinct
    * users) of the re-read store must hash-match an oracle that
    * filters the source directly — proving the three-step erase
    * (find affected partitions, rewrite survivors via dynamic
    * overwrite, remove fully-erased directories) deleted exactly the
    * requested keys and nothing else. The store-side joins broadcast
    * the key set and prune to affected partitions, so at 100 TB an
    * erasure request costs O(affected partitions), not a table
    * rewrite.
    */
  val q157Erasure: QueryDef = QueryDef(
    "q157_erasure",
    (s, dir) => {
      val path = s"/tmp/graft_q157_events_$pid.parquet"
      val base = Tables(s, dir, "events")
        .filter(col("user_id").isNotNull)
        .select(col("event_id"), col("user_id"), col("event_type"),
          date_format(col("ts"), "yyyyMMdd").cast("int").as("day_id"))
      graft.sources.Sinks.writePartitionedParquet(
        base, path, Seq("day_id"))
      val victims = base.select(col("user_id")).distinct()
        .filter(col("user_id") % 101 === 0)
      graft.sources.Sinks.eraseKeys(s, path, "day_id", "user_id",
        victims)
      s.read.parquet(path)
        .groupBy(col("day_id").cast("long").as("day_id"))
        .agg(count(lit(1)).as("n"),
          countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("day_id"))
    },
    Some("""
      SELECT CAST(strftime(ts, '%Y%m%d') AS BIGINT) AS day_id,
        COUNT(*) AS n, COUNT(DISTINCT user_id) AS n_users
      FROM events
      WHERE user_id IS NOT NULL AND user_id % 101 != 0
      GROUP BY 1 ORDER BY 1"""),
  )

  // --------------------------------------------------------------- q158
  /** Multi-source BFS hop census ([[graft.operators.Graph.bfsHops]]):
    * every 100th customer seeds a breadth-first sweep of the
    * customer↔supplier co-purchase graph, and the per-hop census
    * (count, lexicographic endpoints) of the minimum-hop labeling
    * must hash-match a 3-hop unrolled frontier replay in SQL. The
    * reachability member of the graph family (rank q93, communities
    * q145, census q108): synchronous frontier rounds make the
    * minimum hop a pure function of the edge set, which is what
    * makes an iterative traversal oracle-checkable at all.
    */
  val q158BfsHops: QueryDef = QueryDef(
    "q158_bfs_hops",
    (s, dir) => {
      val o = Tables(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"))
      val l = Tables(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"))
      val cs = o.join(l, col("o_orderkey") === col("l_orderkey"))
        .select(concat(lit("c"), col("o_custkey")).as("src"),
          concat(lit("s"), col("l_suppkey")).as("dst"))
      val edges = cs.union(
        cs.select(col("dst").as("src"), col("src").as("dst")))
      val seeds = Tables(s, dir, "customer")
        .filter(col("c_custkey") % 100 === 0)
        .select(concat(lit("c"), col("c_custkey")).as("node"))
      graft.operators.Graph.bfsHops(edges, seeds, maxHops = 3)
        .groupBy(col("hop"))
        .agg(count(lit(1)).as("n"), min(col("node")).as("first_node"),
          max(col("node")).as("last_node"))
        .orderBy(col("hop"))
    },
    Some("""
      WITH cs AS MATERIALIZED (
        SELECT DISTINCT 'c' || o_custkey AS src, 's' || l_suppkey AS dst
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
      e AS MATERIALIZED (SELECT src, dst FROM cs
            UNION SELECT dst AS src, src AS dst FROM cs),
      nodes AS MATERIALIZED (SELECT DISTINCT node FROM (
        SELECT src AS node FROM e UNION ALL SELECT dst FROM e)),
      f0 AS MATERIALIZED (
        SELECT DISTINCT 'c' || c_custkey AS node FROM customer
        WHERE c_custkey % 100 = 0
          AND 'c' || c_custkey IN (SELECT node FROM nodes)),
      v0 AS MATERIALIZED (SELECT node, 0 AS hop FROM f0),
      f1 AS MATERIALIZED (
        SELECT DISTINCT e.dst AS node FROM f0 JOIN e ON f0.node = e.src
        WHERE e.dst NOT IN (SELECT node FROM v0)),
      v1 AS MATERIALIZED (
        SELECT * FROM v0 UNION ALL SELECT node, 1 FROM f1),
      f2 AS MATERIALIZED (
        SELECT DISTINCT e.dst AS node FROM f1 JOIN e ON f1.node = e.src
        WHERE e.dst NOT IN (SELECT node FROM v1)),
      v2 AS MATERIALIZED (
        SELECT * FROM v1 UNION ALL SELECT node, 2 FROM f2),
      f3 AS MATERIALIZED (
        SELECT DISTINCT e.dst AS node FROM f2 JOIN e ON f2.node = e.src
        WHERE e.dst NOT IN (SELECT node FROM v2)),
      v3 AS MATERIALIZED (
        SELECT * FROM v2 UNION ALL SELECT node, 3 FROM f3)
      SELECT CAST(hop AS BIGINT) AS hop, COUNT(*) AS n,
        MIN(node) AS first_node, MAX(node) AS last_node
      FROM v3 GROUP BY hop ORDER BY hop"""),
  )

  // --------------------------------------------------------------- q159
  /** Binary-classifier evaluation from integer rank statistics
    * ([[graft.ml.BinaryMetrics.rankMetrics]]): price-as-ranker for
    * order status F, scored in $10 buckets so ties are DENSE — the
    * average-rank tie handling is the part of a Mann–Whitney AUC
    * that silently drifts between implementations, so the graded
    * form forces it everywhere. One row: AUC plus the full
    * threshold-15000 confusion matrix with micro-unit
    * precision/recall/F1. The oracle replays the doubled rank-sum
    * identity 2·R⁺ = Σ pos·(2·cum_below + cnt + 1) over the same
    * distinct-score histogram (its cumulative count from a window —
    * fine in DuckDB; the operator uses the two-phase ranking).
    */
  val q159AucEval: QueryDef = QueryDef(
    "q159_auc_eval",
    (s, dir) =>
      graft.ml.BinaryMetrics.rankMetrics(
        Tables(s, dir, "orders"),
        col("o_orderstatus") === "F",
        expr("cast(floor(o_totalprice * 100 + 0.5) as bigint) div 1000"),
        thr = 15000L),
    Some("""
      WITH b AS (SELECT
          CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) // 1000 AS s,
          CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
        FROM orders),
      g AS (SELECT s, COUNT(*) AS cnt, SUM(y) AS pos FROM b GROUP BY s),
      c AS (SELECT s, cnt, pos,
          COALESCE(SUM(cnt) OVER (ORDER BY s
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            AS cum_below
        FROM g),
      a AS (SELECT SUM(pos) AS p, SUM(cnt - pos) AS n,
          SUM(pos * (2 * cum_below + cnt + 1)) AS ranksum2,
          SUM(CASE WHEN s >= 15000 THEN pos ELSE 0 END) AS tp,
          SUM(CASE WHEN s >= 15000 THEN cnt - pos ELSE 0 END) AS fp
        FROM c)
      SELECT CAST(p AS BIGINT) AS n_pos, CAST(n AS BIGINT) AS n_neg,
        CASE WHEN p > 0 AND n > 0 THEN
          ROUND(CAST(ranksum2 - p * (p + 1) AS DOUBLE) / (2.0 * p * n), 6)
        END AS auc,
        CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
        CAST(p - tp AS BIGINT) AS fn, CAST(n - fp AS BIGINT) AS tn,
        CASE WHEN tp + fp > 0 THEN
          CAST((tp * 1000000) // (tp + fp) AS BIGINT) END
          AS precision_micro,
        CASE WHEN p > 0 THEN CAST((tp * 1000000) // p AS BIGINT) END
          AS recall_micro,
        CASE WHEN tp + fp + p > 0 THEN
          CAST((2 * tp * 1000000) // (tp + fp + p) AS BIGINT) END
          AS f1_micro
      FROM a"""),
  )

  // --------------------------------------------------------------- q160
  /** PMI collocation mining ([[graft.operators.CorpusStats
    * .pmiCollocations]]): the top-50 adjacent token pairs by lift
    * c(xy)·U²/(c(x)·c(y)·B) with support ≥ 5 — ranking by the
    * exponential of PMI, so the logarithm never enters the engines
    * (log is monotone; the ORDER is the deliverable). The lift is
    * one fixed-order double expression over five exact integer
    * counts, 6dp-rounded, replayed operation-for-operation by the
    * oracle; tokenization is the q82 split (no empty-token filter,
    * single-sourced semantics).
    */
  val q160PmiCollocations: QueryDef = QueryDef(
    "q160_pmi_collocations",
    (s, dir) => graft.operators.CorpusStats.pmiCollocations(
      Tables(s, dir, "documents"), col("text"), minCount = 5L, topK = 50),
    Some("""
      WITH t AS (SELECT string_split(text, ' ') AS w FROM documents),
      u AS (SELECT unnest(w) AS word FROM t),
      uc AS (SELECT word, COUNT(*) AS c FROM u GROUP BY word),
      ut AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_uni FROM u),
      bg AS (SELECT w[i] AS lhs, w[i + 1] AS rhs
        FROM t, LATERAL (SELECT unnest(range(1, len(w))) AS i) r),
      pc AS (SELECT lhs, rhs, COUNT(*) AS c_xy FROM bg GROUP BY lhs, rhs),
      bt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_bi FROM bg)
      SELECT p.lhs, p.rhs, CAST(p.c_xy AS BIGINT) AS c_xy,
        CAST(x.c AS BIGINT) AS c_x, CAST(y.c AS BIGINT) AS c_y,
        ROUND(CAST(p.c_xy AS DOUBLE) * n_uni / x.c * n_uni / y.c / n_bi, 6)
          AS lift
      FROM pc p JOIN uc x ON p.lhs = x.word JOIN uc y ON p.rhs = y.word,
        ut, bt
      WHERE p.c_xy >= 5
      ORDER BY lift DESC, p.lhs, p.rhs LIMIT 50"""),
  )

  // --------------------------------------------------------------- q161
  /** Robust outlier census by median absolute deviation
    * ([[graft.operators.Stats.madOutliers]]): per event type, the
    * count of cent values more than 3 MADs from the median —
    * the 50%-breakdown companion to q104's mean/stddev z-scores.
    * Integer cents make the interpolated median a ½-multiple and
    * the MAD a ¼-multiple, both exact in doubles, so med2/mad4 land
    * as exact longs and the 3·MAD comparison is hash-exact WITHOUT
    * the 6dp rounding guard every other float output needs — the
    * operator doc carries the argument.
    */
  val q161MadOutliers: QueryDef = QueryDef(
    "q161_mad_outliers",
    (s, dir) =>
      graft.operators.Stats.madOutliers(
          Tables(s, dir, "events").filter(col("value").isNotNull),
          col("event_type"),
          (signum(col("value")) *
            floor(abs(col("value")) * 100 + lit(0.5))).cast("long"),
          k = 3)
        .withColumnRenamed("grp", "event_type")
        .orderBy(col("event_type")),
    Some("""
      WITH b AS (SELECT event_type,
          CAST(CASE WHEN value >= 0 THEN FLOOR(value * 100 + 0.5)
               ELSE -FLOOR(-value * 100 + 0.5) END AS BIGINT) AS x
        FROM events WHERE value IS NOT NULL),
      m AS (SELECT event_type, quantile_cont(x, 0.5) AS med
        FROM b GROUP BY event_type),
      d AS (SELECT b.event_type, b.x, m.med, ABS(b.x - m.med) AS adev
        FROM b JOIN m USING (event_type)),
      md AS (SELECT event_type, quantile_cont(adev, 0.5) AS mad
        FROM d GROUP BY event_type)
      SELECT d.event_type, COUNT(*) AS n,
        CAST(2 * MIN(d.med) AS BIGINT) AS med2,
        CAST(4 * MIN(md.mad) AS BIGINT) AS mad4,
        CAST(SUM(CASE WHEN d.adev > 3 * md.mad THEN 1 ELSE 0 END)
          AS BIGINT) AS n_outliers
      FROM d JOIN md USING (event_type)
      GROUP BY d.event_type
      ORDER BY d.event_type"""),
  )

  // --------------------------------------------------------------- q162
  /** Exponentially decayed counters ([[graft.operators.Decay
    * .decayedCounts]]): per event type, the 0.9-per-day
    * freshness-weighted count at the corpus max date, weights from
    * the integer recurrence w₀=10⁶, w_{d+1}=(w·9) div 10 — never
    * pow, never a float sum. The oracle joins the SAME driver-
    * generated micro-unit VALUES table ([[graft.operators.Decay
    * .weightsMicro]] is the single source), so a drift in either
    * engine's age arithmetic or the recurrence itself breaks the
    * hash.
    */
  /** q162's oracle, shared verbatim with its streaming twin q169 —
    * the VALUES table comes from the SAME integer recurrence the
    * operator ships ([[graft.operators.Decay.weightsMicro]]). */
  private val DecayOracleSql: String = {
    val values = graft.operators.Decay.weightsMicro(9L, 10L, 30)
      .zipWithIndex.map { case (w, d) => s"($d, $w)" }.mkString(", ")
    s"""
      WITH mx AS (SELECT CAST(MAX(ts) AS DATE) AS ref FROM events
        WHERE ts IS NOT NULL),
      b AS (SELECT event_type,
          LEAST(date_diff('day', CAST(ts AS DATE),
            (SELECT ref FROM mx)), 30) AS age
        FROM events WHERE ts IS NOT NULL),
      w(age, wt) AS (VALUES $values)
      SELECT b.event_type, COUNT(*) AS n,
        CAST(SUM(w.wt) AS BIGINT) AS decayed_micro
      FROM b JOIN w ON b.age = w.age
      GROUP BY b.event_type ORDER BY b.event_type"""
  }

  /** Exponentially time-decayed event counts (Decay.decayedCounts):
    * integer-exact micro-unit weights ((9/10)^age, age capped at 30
    * days) so the decayed sum replays exactly cross-engine; one
    * groupBy, map-side combinable.
    */
  val q162DecayedCounts: QueryDef = QueryDef(
    "q162_decayed_counts",
    (s, dir) => graft.operators.Decay.decayedCounts(
        Tables(s, dir, "events"), col("event_type"), col("ts"),
        num = 9L, den = 10L, maxAge = 30)
      .withColumnRenamed("k", "event_type")
      .orderBy(col("event_type")),
    Some(DecayOracleSql),
  )

  // --------------------------------------------------------------- q163
  /** First-order Markov transition model ([[graft.operators.Markov
    * .transitions]]): per-user event sequences under the q119 total
    * order (event time, then id), collapsed to the add-one-smoothed
    * transition table p_micro = ((c+1)·10⁶) div (c_prev + V) — exact
    * integer probabilities over observed pairs. The oracle replays
    * lead-over-window, both marginals, and the smoothing division;
    * the window partitions by user (bounded sequences), never
    * globally.
    */
  val q163MarkovTransitions: QueryDef = QueryDef(
    "q163_markov_transitions",
    (s, dir) => graft.operators.Markov.transitions(
        Tables(s, dir, "events").filter(col("user_id").isNotNull),
        col("user_id"),
        Seq(unix_micros(col("ts")), col("event_id")),
        col("event_type"))
      .orderBy(col("prev"), col("next")),
    Some("""
      WITH ev AS (SELECT user_id, event_type, event_id,
          CAST(epoch_ns(ts) // 1000 AS BIGINT) AS us
        FROM events WHERE user_id IS NOT NULL),
      p AS (SELECT event_type AS prev,
          LEAD(event_type) OVER (PARTITION BY user_id
            ORDER BY us, event_id) AS next
        FROM ev),
      c AS (SELECT prev, next, COUNT(*) AS c FROM p
        WHERE next IS NOT NULL GROUP BY prev, next),
      rt AS (SELECT prev, SUM(c) AS c_prev FROM c GROUP BY prev),
      v AS (SELECT COUNT(DISTINCT event_type) AS v FROM ev)
      SELECT c.prev, c.next, CAST(c.c AS BIGINT) AS c,
        CAST(((c.c + 1) * 1000000) // (rt.c_prev + v.v) AS BIGINT)
          AS p_micro
      FROM c JOIN rt USING (prev), v
      ORDER BY prev, next"""),
  )

  // --------------------------------------------------------------- q164
  /** χ² contingency cells ([[graft.operators.Stats.chiSquareCells]]):
    * order priority × order status, the full 5×3 grid with absent
    * cells at observed 0, expected counts in exact integer
    * micro-units and each cell's χ² term micro-rounded from one
    * fixed-order double expression — Σ term_micro is the statistic,
    * as an order-independent integer sum. The oracle rebuilds the
    * grid from broadcast marginals and replays the identical IEEE
    * sequence.
    */
  val q164ChiSquare: QueryDef = QueryDef(
    "q164_chi_square",
    (s, dir) => graft.operators.Stats.chiSquareCells(
        Tables(s, dir, "orders"),
        col("o_orderpriority"), col("o_orderstatus"))
      .orderBy(col("a"), col("b")),
    Some("""
      WITH cells AS (SELECT o_orderpriority AS a, o_orderstatus AS b,
          COUNT(*) AS o
        FROM orders GROUP BY 1, 2),
      ra AS (SELECT a, CAST(SUM(o) AS BIGINT) AS r FROM cells GROUP BY a),
      cb AS (SELECT b, CAST(SUM(o) AS BIGINT) AS c FROM cells GROUP BY b),
      nn AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM cells),
      grid AS (SELECT ra.a, cb.b, ra.r, cb.c, COALESCE(cells.o, 0) AS o
        FROM ra CROSS JOIN cb
        LEFT JOIN cells ON cells.a = ra.a AND cells.b = cb.b),
      d AS (SELECT a, b, o, r, c,
          CAST(o * (SELECT n FROM nn) - r * c AS DOUBLE) AS dd
        FROM grid)
      SELECT a, b, CAST(o AS BIGINT) AS o,
        CAST((r * c * 1000000) // (SELECT n FROM nn) AS BIGINT)
          AS exp_micro,
        CAST(ROUND(dd * dd / r / c / (SELECT n FROM nn) * 1000000, 0)
          AS BIGINT) AS term_micro
      FROM d ORDER BY a, b"""),
  )

  // --------------------------------------------------------------- q165
  /** Per-source Gini impurity of the language mix
    * ([[graft.operators.Stats.giniImpurity]]):
    * (n² − Σc²)·10⁶ div n² in exact integer micro-units — the
    * log-free diversity index. Purely rational, so the hash-match is
    * unconditional (no float anywhere).
    */
  val q165GiniImpurity: QueryDef = QueryDef(
    "q165_gini_impurity",
    (s, dir) => graft.operators.Stats.giniImpurity(
        Tables(s, dir, "documents"), col("source"), col("lang"))
      .withColumnRenamed("grp", "source")
      .orderBy(col("source")),
    Some("""
      WITH cells AS (SELECT source, lang, COUNT(*) AS c
        FROM documents GROUP BY source, lang),
      g AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n,
          COUNT(*) AS n_labels, CAST(SUM(c * c) AS BIGINT) AS ss
        FROM cells GROUP BY source)
      SELECT source, n, CAST(n_labels AS BIGINT) AS n_labels,
        CAST(((n * n - ss) * 1000000) // (n * n) AS BIGINT) AS gini_micro
      FROM g ORDER BY source"""),
  )

  // --------------------------------------------------------------- q166
  /** Per-group heavy hitters: the SpaceSaving Aggregator
    * ([[graft.plans.HeavyHitters]]) composed under groupBy — top-5
    * terms per SOURCE in O(capacity) memory per group per partition,
    * where q59 ran the same typed buffer globally. No new code is the
    * point: a correctly-mergeable Aggregator distributes under any
    * grouping Catalyst plans (map-side partial merge included), and
    * this row grades that composition. Within capacity the sketch is
    * exact, so the oracle is the per-group count window.
    */
  val q166GroupHeavyHitters: QueryDef = QueryDef(
    "q166_group_heavy_hitters",
    (s, dir) =>
      Tables(s, dir, "documents")
        .select(col("source"),
          explode(graft.functions.TextFunctions.tokens(col("text")))
            .as("term"))
        .filter(col("term") =!= "")
        .groupBy(col("source"))
        .agg(graft.plans.HeavyHitters.topItems(col("term"),
          capacity = 4096, topK = 5).as("top"))
        .select(col("source"), posexplode(col("top")))
        .select(col("source"), (col("pos") + 1).cast("long").as("rank"),
          col("col").getField("_1").as("term"),
          col("col").getField("_2").as("cnt"),
          col("col").getField("_3").as("err"))
        .orderBy(col("source"), col("rank")),
    Some("""
      WITH tf AS (
        SELECT source, term, COUNT(*) AS cnt FROM (
          SELECT source, unnest(string_split(text, ' ')) AS term
          FROM documents)
        WHERE term <> '' GROUP BY source, term),
      r AS (
        SELECT source, term, cnt,
          CAST(row_number() OVER (PARTITION BY source
            ORDER BY cnt DESC, term) AS BIGINT) AS rank
        FROM tf)
      SELECT source, rank, term, cnt, CAST(0 AS BIGINT) AS err
      FROM r WHERE rank <= 5
      ORDER BY source, rank"""),
  )

  // --------------------------------------------------------------- q167
  /** Point-in-time snapshot read ([[graft.operators.Scd2
    * .snapshotAt]]): the per-state census of every user AS OF
    * 2024-01-15T00:00:00Z, reconstructed from q128's interval table
    * by one codegen'd containment filter — time travel without
    * stored snapshots. The oracle appends the same instant filter to
    * the SHARED q128 CTE chain ([[Scd2OracleCtes]]), so the build
    * and the read are graded against one single-sourced timeline.
    */
  val q167TimeTravel: QueryDef = QueryDef(
    "q167_time_travel",
    (s, dir) => {
      val iv = graft.operators.Scd2.build(Tables(s, dir, "events"),
        col("user_id"), col("event_type"), col("ts"), col("event_id"))
      graft.operators.Scd2.snapshotAt(iv, 1705276800000000L)
        .groupBy(col("attr").as("event_type"))
        .agg(count(lit(1)).as("n_keys"),
          min(col("k")).as("min_user"), max(col("k")).as("max_user"),
          sum(col("n_events")).as("n_events"))
        .orderBy(col("event_type"))
    },
    Some(s"""$Scd2OracleCtes
      SELECT event_type, COUNT(*) AS n_keys,
        MIN(user_id) AS min_user, MAX(user_id) AS max_user,
        CAST(SUM(n_events) AS BIGINT) AS n_events
      FROM f
      WHERE valid_from_us <= 1705276800000000
        AND (valid_to_us IS NULL OR valid_to_us > 1705276800000000)
      GROUP BY event_type
      ORDER BY event_type"""),
  )

  // --------------------------------------------------------------- q168
  /** Temporal debounce ([[graft.operators.Dedup.debounce]]): per
    * (user, event type), events within 5 s of their predecessor are
    * flagged as bounce — retry storms and double-clicks collapsed
    * before counts mean anything. Graded as the per-type
    * kept/dropped census; the oracle replays the lag-gap rule over
    * the same (ts_us, event_id) total order.
    */
  val q168Debounce: QueryDef = QueryDef(
    "q168_debounce",
    (s, dir) => {
      val flagged = graft.operators.Dedup.debounce(
        Tables(s, dir, "events").filter(col("user_id").isNotNull),
        col("user_id"), col("event_type"), col("ts"),
        Seq(unix_micros(col("ts")), col("event_id")),
        withinUs = 5000000L)
      flagged.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"))
        .select(col("event_type"), col("n"), col("n_kept"),
          (col("n") - col("n_kept")).as("n_dropped"))
        .orderBy(col("event_type"))
    },
    Some("""
      WITH ev AS (SELECT user_id, event_type, event_id,
          CAST(epoch_ns(ts) // 1000 AS BIGINT) AS us
        FROM events WHERE user_id IS NOT NULL),
      l AS (SELECT event_type,
          us - LAG(us) OVER (PARTITION BY user_id, event_type
            ORDER BY us, event_id) AS gap
        FROM ev),
      k AS (SELECT event_type, COALESCE(gap > 5000000, TRUE) AS kept
        FROM l)
      SELECT event_type, COUNT(*) AS n,
        CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        CAST(SUM(CASE WHEN kept THEN 0 ELSE 1 END) AS BIGINT)
          AS n_dropped
      FROM k GROUP BY event_type ORDER BY event_type"""),
  )

  // --------------------------------------------------------------- q169
  /** q162's decayed counters maintained BY Structured Streaming
    * ([[graft.streaming.EventsStream.streamedDecayedCounts]]): the
    * freshness-weighted count as a stateful streaming aggregation —
    * integer weight sums are a commutative monoid, so state is one
    * (n, Σw) pair per type and arrival order cannot move a bit.
    * Drained on the bounded source it must equal the batch operator
    * exactly; oracle: the SAME [[DecayOracleSql]] as q162,
    * single-sourced. Tenth member of the streaming-equals-batch
    * family.
    */
  val q169StreamDecay: QueryDef = QueryDef(
    "q169_stream_decay",
    (s, dir) => graft.streaming.EventsStream.streamedDecayedCounts(
      s, dir, num = 9L, den = 10L, maxAge = 30),
    Some(DecayOracleSql),
  )

  // --------------------------------------------------------------- q170
  /** Calibration bins ([[graft.ml.BinaryMetrics.calibrationBins]]):
    * q159's price-ranks-status scorer binned into equal-width $50k
    * score buckets with observed positive rate and mean score in
    * integer micro-units — AUC grades the ranking, this grades what
    * the scores MEAN. One map-side-combining agg; every output is
    * exact integer arithmetic.
    */
  val q170Calibration: QueryDef = QueryDef(
    "q170_calibration",
    (s, dir) => graft.ml.BinaryMetrics.calibrationBins(
        Tables(s, dir, "orders"),
        col("o_orderstatus") === "F",
        expr("cast(floor(o_totalprice * 100 + 0.5) as bigint) div 1000"),
        binWidth = 5000L)
      .orderBy(col("bin")),
    Some("""
      WITH b AS (SELECT
          CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) // 1000 AS s,
          CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
        FROM orders),
      g AS (SELECT s // 5000 AS bin, COUNT(*) AS n,
          SUM(y) AS n_pos, SUM(s) AS sum_s
        FROM b GROUP BY 1)
      SELECT CAST(bin AS BIGINT) AS bin, n, CAST(n_pos AS BIGINT) AS n_pos,
        CAST((n_pos * 1000000) // n AS BIGINT) AS pos_rate_micro,
        CAST((sum_s * 1000000) // n AS BIGINT) AS mean_score_micro
      FROM g ORDER BY bin"""),
  )

  // --------------------------------------------------------------- q171
  /** Two-sample KS drift distance ([[graft.operators.Stats
    * .ksDistance]]): purchase vs click value distributions, the
    * supremum CDF gap in exact integer micro-units by
    * cross-multiplying the two cumulative counts — the
    * distribution-drift gate with no float CDF anywhere. CDFs come
    * from the shared two-phase range prefix machinery (the q159
    * refactor); the oracle replays the cross-multiplied maximum over
    * the merged support.
    */
  val q171KsDrift: QueryDef = QueryDef(
    "q171_ks_drift",
    (s, dir) => {
      val ev = Tables(s, dir, "events").filter(col("value").isNotNull)
      val cents = (signum(col("value")) *
        floor(abs(col("value")) * 100 + lit(0.5))).cast("long")
      graft.operators.Stats.ksDistance(
        ev.filter(col("event_type") === "purchase"),
        ev.filter(col("event_type") === "click"),
        cents)
    },
    Some("""
      WITH base AS (SELECT event_type,
          CAST(CASE WHEN value >= 0 THEN FLOOR(value * 100 + 0.5)
               ELSE -FLOOR(-value * 100 + 0.5) END AS BIGINT) AS v
        FROM events WHERE value IS NOT NULL),
      ga AS (SELECT v, COUNT(*) AS ca FROM base
        WHERE event_type = 'purchase' GROUP BY v),
      gb AS (SELECT v, COUNT(*) AS cb FROM base
        WHERE event_type = 'click' GROUP BY v),
      j AS (SELECT COALESCE(ga.v, gb.v) AS v,
          COALESCE(ca, 0) AS ca, COALESCE(cb, 0) AS cb
        FROM ga FULL OUTER JOIN gb ON ga.v = gb.v),
      t AS (SELECT CAST(SUM(ca) AS BIGINT) AS n_a,
          CAST(SUM(cb) AS BIGINT) AS n_b FROM j),
      c AS (SELECT v,
          SUM(ca) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cuma,
          SUM(cb) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cumb
        FROM j)
      SELECT t.n_a, t.n_b, c.v AS at_value,
        CAST((ABS(c.cuma * t.n_b - c.cumb * t.n_a) * 1000000)
          // (t.n_a * t.n_b) AS BIGINT) AS ks_micro
      FROM c, t
      ORDER BY ks_micro DESC, at_value LIMIT 1"""),
  )

  // --------------------------------------------------------------- q172
  /** Seasonal anomaly detection by pure composition — per
    * (event type, hour-of-day) cell, the per-day counts z-scored
    * against that cell's own 30-day history
    * ([[graft.operators.Stats.zScores]] over a groupBy, zero new
    * operator code — the q166 composition argument applied to the
    * moments machinery): the "why is 3 a.m. signup traffic 2σ hot
    * today" pager query. Exact integer moments make the flags
    * replayable; the oracle recomputes the identical z arithmetic
    * over the identical cells.
    */
  val q172SeasonalAnomaly: QueryDef = QueryDef(
    "q172_seasonal_anomaly",
    (s, dir) => {
      val cells = Tables(s, dir, "events")
        .groupBy(col("event_type"),
          date_format(col("ts"), "yyyyMMdd").cast("long").as("day_id"),
          hour(col("ts")).cast("long").as("hr"))
        .agg(count(lit(1)).as("c"))
      graft.operators.Stats.zScores(cells,
          concat_ws("|", col("event_type"), col("hr")),
          col("day_id"), col("c"), scale = 1L, flagAt = 2.0)
        .filter(col("is_outlier"))
        .select(col("grp").as("cell"), col("id").as("day_id"),
          col("x").as("n"), col("z"))
        .orderBy(col("cell"), col("day_id"))
    },
    Some("""
      WITH c AS (
        SELECT event_type || '|' || CAST(hour(ts) AS VARCHAR) AS grp,
          CAST(strftime(ts, '%Y%m%d') AS BIGINT) AS day_id,
          COUNT(*) AS x
        FROM events GROUP BY 1, 2),
      m AS (
        SELECT grp, COUNT(*) AS n, CAST(SUM(x) AS BIGINT) AS s,
          CAST(SUM(x * x) AS BIGINT) AS ss
        FROM c GROUP BY grp),
      z AS (
        SELECT c.grp, c.day_id, c.x,
          CASE WHEN ss * n - s * s = 0 THEN 0.0
               ELSE ROUND(CAST(c.x * n - s AS DOUBLE)
                 / sqrt(CAST(ss * n - s * s AS DOUBLE)), 6) END AS z
        FROM c JOIN m USING (grp))
      SELECT grp AS cell, day_id, CAST(x AS BIGINT) AS n, z
      FROM z WHERE abs(z) >= 2.0
      ORDER BY cell, day_id"""),
  )

  // --------------------------------------------------------------- q173
  /** Per-source lexical richness ([[graft.operators.CorpusStats
    * .lexicalRichness]]): type-token ratio and hapax fraction in
    * exact micro-units — the vocabulary-diversity axis of corpus
    * quality (boilerplate repeats a tiny vocabulary; prose does
    * not). Purely rational, unconditional hash-match.
    */
  val q173LexicalRichness: QueryDef = QueryDef(
    "q173_lexical_richness",
    (s, dir) => graft.operators.CorpusStats.lexicalRichness(
        Tables(s, dir, "documents"), col("source"), col("text"))
      .withColumnRenamed("grp", "source")
      .orderBy(col("source")),
    Some("""
      WITH wc AS (
        SELECT source, term, COUNT(*) AS c FROM (
          SELECT source, unnest(string_split(text, ' ')) AS term
          FROM documents)
        WHERE term <> '' GROUP BY source, term),
      g AS (
        SELECT source, CAST(SUM(c) AS BIGINT) AS n_tokens,
          COUNT(*) AS n_types,
          CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
            AS n_hapax
        FROM wc GROUP BY source)
      SELECT source, n_tokens, CAST(n_types AS BIGINT) AS n_types,
        n_hapax,
        CAST((n_types * 1000000) // n_tokens AS BIGINT) AS ttr_micro,
        CAST((n_hapax * 1000000) // n_types AS BIGINT) AS hapax_micro
      FROM g ORDER BY source"""),
  )

  // --------------------------------------------------------------- q174
  /** Personalized PageRank ([[graft.operators.Graph
    * .personalizedPageRank]]): teleport mass restricted to every
    * 100th customer, 2 integer fixed-point iterations over the
    * co-purchase graph — proximity to the flagged set rather than
    * global importance (the related-entity ranking BFS's hop count
    * is too coarse for). Exact integer mass arithmetic (q93's
    * argument), so the oracle unrolls both iterations with
    * seed-gated teleports and must agree bit-for-bit on the top-100.
    */
  val q174PersonalizedPagerank: QueryDef = QueryDef(
    "q174_personalized_pagerank",
    (s, dir) => {
      val o = Tables(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"))
      val l = Tables(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"))
      val cs = o.join(l, col("o_orderkey") === col("l_orderkey"))
        .select(concat(lit("c"), col("o_custkey")).as("src"),
          concat(lit("s"), col("l_suppkey")).as("dst"))
      val edges = cs.union(
        cs.select(col("dst").as("src"), col("src").as("dst")))
      val seeds = Tables(s, dir, "customer")
        .filter(col("c_custkey") % 100 === 0)
        .select(concat(lit("c"), col("c_custkey")).as("node"))
      graft.operators.Graph.personalizedPageRank(edges, seeds, iters = 2)
        .orderBy(col("rank").desc, col("node"))
        .limit(100)
    },
    Some {
      def it(prev: String, out: String) = s"""
      $out AS (
        SELECT nd.node, nd.is_seed,
          (CASE WHEN nd.is_seed
            THEN (((SELECT 1000000000000 // n FROM ns) * 15) // 100)
            ELSE 0 END)
          + ((COALESCE(m.in_mass, 0) * 85) // 100) AS rank
        FROM sd nd LEFT JOIN (
          SELECT e.dst AS node,
            CAST(SUM(r.rank // o.outdeg) AS BIGINT) AS in_mass
          FROM $prev r JOIN e ON r.node = e.src
                       JOIN outdeg o ON e.src = o.src
          GROUP BY e.dst) m ON nd.node = m.node)"""
      s"""
      WITH cs AS (
        SELECT DISTINCT 'c' || o_custkey AS src, 's' || l_suppkey AS dst
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
      e AS (SELECT src, dst FROM cs
            UNION SELECT dst AS src, src AS dst FROM cs),
      nodes AS (SELECT DISTINCT node FROM (
        SELECT src AS node FROM e UNION ALL SELECT dst FROM e)),
      sd AS (SELECT node, node IN (SELECT 'c' || c_custkey FROM customer
          WHERE c_custkey % 100 = 0) AS is_seed
        FROM nodes),
      ns AS (SELECT COUNT(*) AS n FROM sd WHERE is_seed),
      outdeg AS (SELECT src, COUNT(*) AS outdeg FROM e GROUP BY src),
      r0 AS (SELECT node, is_seed,
          CASE WHEN is_seed THEN (SELECT 1000000000000 // n FROM ns)
               ELSE 0 END AS rank
        FROM sd),
      ${it("r0", "it1").trim},
      ${it("it1", "it2").trim}
      SELECT node, rank FROM it2
      ORDER BY rank DESC, node LIMIT 100"""
    },
  )

  // --------------------------------------------------------------- q175
  /** Per-type lag-1 autocorrelation of daily volumes
    * ([[graft.operators.Stats.lagAutocorrelation]]): does today's
    * count predict tomorrow's — the self-similarity diagnostic next
    * to q172's cell anomalies, as exact integer moments over
    * consecutive-day pairs with one fixed-order closed form. The
    * oracle replays the pairing and the Pearson arithmetic exactly.
    */
  val q175Autocorrelation: QueryDef = QueryDef(
    "q175_autocorrelation",
    (s, dir) => {
      val daily = Tables(s, dir, "events")
        .groupBy(col("event_type"),
          date_format(col("ts"), "yyyyMMdd").cast("long").as("day_id"))
        .agg(count(lit(1)).as("c"))
      graft.operators.Stats.lagAutocorrelation(daily,
          col("event_type"), col("day_id"), col("c"))
        .withColumnRenamed("grp", "event_type")
        .orderBy(col("event_type"))
    },
    Some("""
      WITH d AS (SELECT event_type,
          CAST(strftime(ts, '%Y%m%d') AS BIGINT) AS day_id,
          COUNT(*) AS c
        FROM events GROUP BY 1, 2),
      p AS (SELECT event_type, c AS b,
          LAG(c) OVER (PARTITION BY event_type ORDER BY day_id) AS a
        FROM d),
      g AS (SELECT event_type, COUNT(*) AS n,
          CAST(SUM(a) AS BIGINT) AS sa, CAST(SUM(b) AS BIGINT) AS sb,
          CAST(SUM(a * b) AS BIGINT) AS sab,
          CAST(SUM(a * a) AS BIGINT) AS saa,
          CAST(SUM(b * b) AS BIGINT) AS sbb
        FROM p WHERE a IS NOT NULL GROUP BY event_type)
      SELECT event_type, n AS n_pairs,
        CASE WHEN n * saa - sa * sa > 0 AND n * sbb - sb * sb > 0 THEN
          ROUND(CAST(n * sab - sa * sb AS DOUBLE)
            / (sqrt(CAST(n * saa - sa * sa AS DOUBLE))
               * sqrt(CAST(n * sbb - sb * sb AS DOUBLE))), 6)
        END AS r
      FROM g ORDER BY event_type"""),
  )

  private val pid = ProcessHandle.current().pid()

  val all: Seq[QueryDef] =
    Seq(q124StreamDedupIndex, q125BpeMerges, q126Bm25,
      q127BpeTokenCounts, q128Scd2, q129Containment,
      q130ContaminationReport, q131TemperatureMixture,
      q132IncrementalMv, q133SampledQuantiles, q134StreamMv,
      q135CdcApply, q136StreamCdc, q137SkewReport, q138RrfFusion,
      q139Curriculum, q140AnnQuality, q141HllReplay, q142StreamHll,
      q143HllMerge, q144JoinSizeSketch, q145LabelProp,
      q146BackfillRoundtrip, q147FeatureHash, q148Expectations,
      q149StreamExpectations, q150PlanEstimate, q151LshTuning,
      q152IncrementalJoin, q153HoppingWindow, q154StreamHopping,
      q155GroupTopK, q156StreamTopK, q157Erasure, q158BfsHops,
      q159AucEval, q160PmiCollocations, q161MadOutliers,
      q162DecayedCounts, q163MarkovTransitions, q164ChiSquare,
      q165GiniImpurity, q166GroupHeavyHitters, q167TimeTravel,
      q168Debounce, q169StreamDecay, q170Calibration, q171KsDrift,
      q172SeasonalAnomaly, q173LexicalRichness,
      q174PersonalizedPagerank, q175Autocorrelation)
}
