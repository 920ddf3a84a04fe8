package graft.queries

import graft.{QueryDef, Tables}
import graft.functions.TextFunctions
import graft.multimodal.Multimodal
import graft.operators.{CorpusFilter, Decontaminate, Dedup, Scale, Similarity}
import graft.plans.RollingHash.rolling_hash
import org.apache.spark.sql.functions._

/** The 100 TB training-data-pipeline operators as graded queries:
  * text analysis, fingerprints, the dedup family, similarity search,
  * streaming, multimodal plumbing. Oracles compute the same
  * engine-independent arithmetic (rolling hash, integer set ops, double
  * left-folds) in DuckDB.
  */
object ScaleQueries {

  /** Shared oracle fragment: per-token / per-text rolling hash. */
  private[graft] val FpLambda =
    "list_reduce([0::BIGINT] || [unicode(x)::BIGINT for x in string_split(%s, '')], (a, c) -> (a * 31 + c) %% 1000000007)"

  /** Oracle fragment: per-document 32-bit SimHash as CTEs ending in
    * `sim(doc_id, simhash)` — shared by q36 and the clustering oracle.
    */
  private[queries] val SimhashCtes = s"""
      t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      tok AS (SELECT doc_id, unnest(toks) AS tk FROM t),
      th AS (SELECT doc_id, ${FpLambda.format("tk")} AS h FROM tok),
      bits AS (
        SELECT doc_id, b,
          SUM(CASE WHEN ((CASE WHEN b < 30 THEN h
                          ELSE (h * 1103515245 + 12345) % 1073741789 END)
                    >> (CASE WHEN b < 30 THEN b ELSE (b - 30) % 30 END)) & 1 = 1
              THEN 1 ELSE -1 END) AS v
        FROM th, (SELECT unnest(range(0, 32)) AS b)
        GROUP BY doc_id, b),
      sim AS (
        SELECT doc_id, CAST(SUM(CASE WHEN v > 0 THEN (1::BIGINT << b) ELSE 0 END) AS BIGINT) AS simhash
        FROM bits GROUP BY doc_id)"""

  // ---------------------------------------------------------------- q30
  /** Per-document quality metrics — token/char counts, punctuation and
    * stopword ratios, composite quality score — one narrow projection
    * of codegen'd expressions; embarrassingly parallel, no shuffle
    * beyond the final presentation sort.
    */
  val q30TextStats: QueryDef = QueryDef(
    "q30_text_stats",
    (s, dir) => {
      // One-pass counts via the codegen'd text_quality_stats (round 17):
      // the HOF stopword filter made the projection interpreted and the
      // quality composite re-evaluated both ratio subtrees. The float
      // ratio/score algebra below replicates the TextFunctions forms
      // op-for-op (same operands, same order), so values — and the
      // oracle hash — are unchanged; only the integer counts moved into
      // the single-scan expression.
      // The stats struct is materialized ONCE in its own projection
      // (round 18, r17 verdict item 6): the single-Project form
      // repeated text_quality_stats 9× textually and relied on codegen
      // subexpression elimination — correct today, but any interpreted
      // neighbor (a future HOF, a Filter-below-Project duplication)
      // would re-run the byte-pass per occurrence. CollapseProject
      // cannot re-inline it (non-cheap producer, multiple consumers).
      val st = col("__st")
      val nTok = st.getField("n_tokens")
      val len = length(col("text"))
      val praw = when(len > 0,
        st.getField("n_punct").cast("double") / len).otherwise(lit(0.0))
      val sraw = when(nTok > 0,
        st.getField("n_stop").cast("double") / nTok).otherwise(lit(0.0))
      graft.operators.Explosive.ensureMapParallelism(
          Tables(s, dir, "documents"), col("doc_id"))
        .select(col("doc_id"), col("text"),
          graft.plans.TextQualityStats.text_quality_stats(
            col("text"), TextFunctions.EnglishStopwords).as("__st"))
        .select(
          col("doc_id"),
          nTok.cast("long").as("n_tokens"),
          len.cast("long").as("n_chars"),
          round(praw, 6).as("punct_ratio"),
          round(sraw, 6).as("stop_ratio"),
          round(lit(0.3) * least(lit(1.0), nTok.cast("double") / 100.0)
            + lit(0.3) * (lit(1.0) - praw)
            + lit(0.4) * least(lit(1.0), sraw * 5.0), 6).as("quality"))
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH t AS (
        SELECT doc_id, text, string_split(text, ' ') AS toks,
          CASE WHEN length(text) > 0 THEN
            CAST(length(text) - length(regexp_replace(text, '[.,!?;:''"()\[\]{}-]', '', 'g')) AS DOUBLE) / length(text)
          ELSE 0.0 END AS praw,
          CASE WHEN len(string_split(text, ' ')) > 0 THEN
            CAST(len(list_filter(string_split(text, ' '), x -> x IN ('the','a','is','of','and'))) AS DOUBLE) / len(string_split(text, ' '))
          ELSE 0.0 END AS sraw
        FROM documents)
      SELECT doc_id,
        len(toks) AS n_tokens,
        length(text) AS n_chars,
        ROUND(praw, 6) AS punct_ratio,
        ROUND(sraw, 6) AS stop_ratio,
        ROUND(0.3 * LEAST(1.0, CAST(len(toks) AS DOUBLE) / 100.0)
            + 0.3 * (1.0 - praw)
            + 0.4 * LEAST(1.0, sraw * 5.0), 6) AS quality
      FROM t
      ORDER BY doc_id"""),
    headline = true,
  )

  // ---------------------------------------------------------------- q31
  /** Language identification by stopword-hit counting over five
    * languages with a deterministic tie order (en>de>es>fr>zh) — the
    * per-row n-gram heuristic a 100 TB curation pass can afford; scales
    * as a pure map.
    */
  val q31LangId: QueryDef = QueryDef(
    "q31_lang_id",
    (s, dir) =>
      // hits array materialized once in its own projection (round 18,
      // r17 verdict item 6; see TextFunctions.langIdHits) — the argmax
      // chain then reads cheap element_at's off the attribute
      graft.operators.Explosive.ensureMapParallelism(
          Tables(s, dir, "documents"), col("doc_id"))
        .select(col("doc_id"),
          TextFunctions.langIdHits(col("text")).as("__hits"))
        .select(col("doc_id"),
          TextFunctions.langIdFromHits(col("__hits")).as("lang_pred"))
        .orderBy(col("doc_id")),
    Some("""
      WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      c AS (
        SELECT doc_id,
          len(list_filter(toks, x -> x IN ('the','a','is','and','of'))) AS c_en,
          len(list_filter(toks, x -> x IN ('der','die','das','und','ist'))) AS c_de,
          len(list_filter(toks, x -> x IN ('el','la','los','es','y'))) AS c_es,
          len(list_filter(toks, x -> x IN ('le','les','est','et','une'))) AS c_fr,
          len(list_filter(toks, x -> x IN ('的','是','了','在','我'))) AS c_zh
        FROM t)
      SELECT doc_id,
        CASE
          WHEN c_en = 0 AND c_de = 0 AND c_es = 0 AND c_fr = 0 AND c_zh = 0 THEN 'unknown'
          WHEN c_en >= c_de AND c_en >= c_es AND c_en >= c_fr AND c_en >= c_zh THEN 'en'
          WHEN c_de >= c_en AND c_de >= c_es AND c_de >= c_fr AND c_de >= c_zh THEN 'de'
          WHEN c_es >= c_en AND c_es >= c_de AND c_es >= c_fr AND c_es >= c_zh THEN 'es'
          WHEN c_fr >= c_en AND c_fr >= c_de AND c_fr >= c_es AND c_fr >= c_zh THEN 'fr'
          ELSE 'zh'
        END AS lang_pred
      FROM c
      ORDER BY doc_id"""),
  )

  // ---------------------------------------------------------------- q32
  /** Document fingerprinting: the codegen'd RollingHash expression
    * (31-base polynomial mod 1e9+7) plus a 32-bit token SimHash per
    * document — integer-exact, engine-replayable, map-only. The scan
    * rides [[graft.operators.Explosive.ensureMapParallelism]]: the
    * per-token SimHash is the heaviest pure-map expression in the
    * text family, and on a compact few-split parquet it otherwise
    * executes inside a ~2-task scan stage (round-12 probe at sf1:
    * 20.3 s starved → see bench/PROFILE_PAGERANK_r12 companion note;
    * a many-split cluster scan makes the guard a no-op).
    */
  val q32Fingerprint: QueryDef = QueryDef(
    "q32_fingerprint",
    (s, dir) =>
      graft.operators.Explosive.ensureMapParallelism(
          Tables(s, dir, "documents"), col("doc_id"))
        .select(col("doc_id"),
          rolling_hash(col("text")).as("fingerprint"),
          TextFunctions.simhash(col("text")).as("simhash"))
        .orderBy(col("doc_id")),
    Some(s"""
      WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents),
      fp AS (SELECT doc_id, ${FpLambda.format("text")} AS fingerprint FROM t),
      tok AS (SELECT doc_id, unnest(toks) AS tk FROM t),
      th AS (SELECT doc_id, ${FpLambda.format("tk")} AS h FROM tok),
      bits AS (
        SELECT doc_id, b,
          SUM(CASE WHEN ((CASE WHEN b < 30 THEN h
                          ELSE (h * 1103515245 + 12345) % 1073741789 END)
                    >> (CASE WHEN b < 30 THEN b ELSE (b - 30) % 30 END)) & 1 = 1
              THEN 1 ELSE -1 END) AS v
        FROM th, (SELECT unnest(range(0, 32)) AS b)
        GROUP BY doc_id, b),
      sim AS (
        SELECT doc_id, CAST(SUM(CASE WHEN v > 0 THEN (1::BIGINT << b) ELSE 0 END) AS BIGINT) AS simhash
        FROM bits GROUP BY doc_id)
      SELECT fp.doc_id, fp.fingerprint, sim.simhash
      FROM fp JOIN sim ON fp.doc_id = sim.doc_id
      ORDER BY fp.doc_id"""),
  )

  // ---------------------------------------------------------------- q33
  /** Exact dedup keyed on a content prefix (Dedup.exactByKey):
    * min-id representative + group size from one map-side-combinable
    * groupBy on the key — the cheapest dedup pass and the first stage
    * of any 100 TB dedup cascade.
    */
  val q33DedupExact: QueryDef = QueryDef(
    "q33_dedup_exact",
    (s, dir) =>
      Dedup.exactByKey(Tables(s, dir, "documents"),
          substring(col("text"), 1, 100), col("doc_id"))
        .select(col("rep_id"), col("group_size"))
        .orderBy(col("rep_id")),
    Some("""
      SELECT MIN(doc_id) AS rep_id, COUNT(*) AS group_size
      FROM documents
      GROUP BY substr(text, 1, 100)
      ORDER BY rep_id"""),
  )

  private val JaccardOracle = """
      WITH docs AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      sh AS (
        SELECT doc_id,
          list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2] for i in range(1, len(t) - 1)]) AS shingles
        FROM docs WHERE len(t) >= 3),
      pairs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
          CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
            / len(list_distinct(a.shingles || b.shingles)) AS j
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
      SELECT id_a, id_b, ROUND(j, 6) AS jaccard
      FROM pairs WHERE j >= 0.8
      ORDER BY id_a, id_b"""

  // ---------------------------------------------------------------- q34
  /** 3-gram Jaccard near-duplicate pairs at j ≥ 0.8
    * (Dedup.ngramJaccardPairs): shingle inverted index → candidate
    * count-join with the adaptive count-join/prefix-filter chosen from
    * corpus df stats, then exact verify — lossless, never all-pairs.
    */
  val q34NgramJaccard: QueryDef = QueryDef(
    "q34_ngram_jaccard",
    (s, dir) =>
      // truncate before the presentation sort (the q95 lesson,
      // bench/PROFILE_APSS_r13.txt): a global orderBy range-samples
      // its child, re-executing the unmaterialized pair plan; the
      // pair set is output-sized, so materializing it is cheap and
      // the sampler + sort read the checkpoint
      graft.operators.Checkpoints.truncate(
        Dedup.ngramJaccardPairs(Tables(s, dir, "documents"),
          col("doc_id"), col("text"), n = 3, threshold = 0.8))
        .orderBy(col("id_a"), col("id_b")),
    Some(JaccardOracle),
    headline = true,
  )

  // ---------------------------------------------------------------- q35
  /** LSH candidates + exact verify ⇒ equal to the exact all-pairs oracle
    * (miss probability ≈ 5e-8 at j = 0.8 with 32×4 banding).
    */
  val q35MinhashLsh: QueryDef = QueryDef(
    "q35_minhash_lsh",
    (s, dir) =>
      // truncate before the presentation sort — see q34
      graft.operators.Checkpoints.truncate(
        Dedup.minhashLshPairs(Tables(s, dir, "documents"),
          col("doc_id"), col("text"), n = 3, threshold = 0.8))
        .orderBy(col("id_a"), col("id_b")),
    Some(JaccardOracle),
  )

  // ---------------------------------------------------------------- q36
  /** SimHash near-dup pairs at Hamming ≤ 3 (Dedup.simhashPairs):
    * pigeonhole banding — 4 bands of 8 bits, any qualifying pair
    * collides on ≥ 1 whole band, so the band equi-join is a LOSSLESS
    * candidate blocker; exact bit_count verify after.
    */
  val q36SimhashPairs: QueryDef = QueryDef(
    "q36_simhash_pairs",
    (s, dir) =>
      // NO truncate before this presentation sort (round-14 audit,
      // measured): the answer is ~100 M pairs at sf1 but the pair join
      // itself is cheap (~3 s compute) — checkpointing the output blows
      // the block store (27.9 s → 90 s measured) where the range
      // sampler's re-execution of the cheap child costs ~3 s. Truncate
      // pays only when child-cost ≫ output-materialization-cost
      // (q34/q83/q95 yes; q36/q206 no).
      Dedup.simhashPairs(Tables(s, dir, "documents"),
          col("doc_id"), col("text"), maxHamming = 3)
        .orderBy(col("id_a"), col("id_b")),
    Some(s"""
      WITH $SimhashCtes
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
      FROM sim a JOIN sim b ON a.doc_id < b.doc_id
      WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
      ORDER BY id_a, id_b"""),
  )

  // --------------------------------------------------------------- q236
  /** SimHash dedup graded end-to-end at CORPUS size (round 13): the
    * q198 composition shape, but the clustering never leaves signature
    * level — [[Dedup.simhashClusters]] runs connected components over
    * the distinct-signature graph and expands to docs with
    * output-sized joins, so unlike q36 (whose answer at sf1 is 99.7 M
    * pairs and whose graded ORDER BY is ~90% of its wall-clock) every
    * stage, shuffle, and the graded row set here is corpus-sized.
    * This is the sf1 trend row for the SimHash family: it regresses
    * on the operator's compute, not on sorting a 100 M-row
    * presentation. Oracle: exact all-pairs Hamming ≤ 3 + recursive
    * minimum-label propagation + the same per-source census as q198.
    */
  val q236SimhashDedupE2e: QueryDef = QueryDef(
    "q236_simhash_dedup_e2e",
    (s, dir) => {
      val docs = Tables(s, dir, "documents")
      val clusters = Dedup.simhashClusters(docs,
        col("doc_id"), col("text"), maxHamming = 3)
      docs.join(clusters, col("doc_id") === col("node"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("is_rep")).as("n_kept"),
          sum(col("n_chars")).as("chars_total"),
          sum(when(col("is_rep") === 1, col("n_chars"))
            .otherwise(0L)).as("chars_kept"))
        .orderBy(col("source"))
    },
    Some(s"""
      WITH RECURSIVE $SimhashCtes,
      p AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM sim a JOIN sim b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.simhash, b.simhash)) <= 3),
      e AS (SELECT id_a AS s, id_b AS d FROM p
            UNION ALL SELECT id_b, id_a FROM p),
      lab(node, label) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT e.d, l.label FROM lab l JOIN e ON e.s = l.node
        WHERE l.label < e.d),
      cc AS (SELECT node, MIN(label) AS component FROM lab GROUP BY node)
      SELECT d.source AS source, COUNT(*) AS n_docs,
        CAST(SUM(CASE WHEN cc.node = cc.component THEN 1 ELSE 0 END)
          AS BIGINT) AS n_kept,
        CAST(SUM(d.n_chars) AS BIGINT) AS chars_total,
        CAST(SUM(CASE WHEN cc.node = cc.component THEN d.n_chars
          ELSE 0 END) AS BIGINT) AS chars_kept
      FROM documents d JOIN cc ON d.doc_id = cc.node
      GROUP BY d.source ORDER BY source"""),
  )

  /** Oracle fragment: exact double cosine with strict left-fold sums. */
  private val CosineE = """
      e AS (
        SELECT vec_id, embedding,
          sqrt(list_reduce([0.0::DOUBLE] || [CAST(x AS DOUBLE) * CAST(x AS DOUBLE) for x in embedding], (a, v) -> a + v)) AS nrm
        FROM embeddings)"""

  // ---------------------------------------------------------------- q37
  /** Exact cosine-similarity pairs at cos ≥ 0.5 (Dedup.cosinePairs):
    * triangular grid-tile self-join — tile ids bound per-task pair
    * work and keep the plan an equi-join, never CartesianProduct;
    * strict left-fold double sums replay bit-for-bit in the oracle.
    */
  val q37CosinePairs: QueryDef = QueryDef(
    "q37_cosine_pairs",
    (s, dir) =>
      Dedup.cosinePairs(Tables(s, dir, "embeddings"),
          col("vec_id"), col("embedding"), threshold = 0.5)
        .orderBy(col("id_a"), col("id_b")),
    Some(s"""
      WITH $CosineE,
      pairs AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
          list_reduce([0.0::DOUBLE] || [CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE) for i in range(1, len(a.embedding) + 1)], (x, v) -> x + v)
            / (a.nrm * b.nrm) AS cosine
        FROM e a JOIN e b ON a.vec_id < b.vec_id)
      SELECT id_a, id_b, ROUND(cosine, 6) AS cosine
      FROM pairs WHERE cosine >= 0.5
      ORDER BY id_a, id_b"""),
  )

  // ---------------------------------------------------------------- q38
  /** Brute-force cosine top-k (Similarity.bruteForceTopK) — the ANN
    * recall baseline: the bounded query set broadcasts against the
    * full vector table, per-query k kept by aggregation, one scan of
    * the corpus regardless of query count.
    */
  val q38AnnTopK: QueryDef = QueryDef(
    "q38_ann_topk",
    (s, dir) => {
      val emb = Tables(s, dir, "embeddings")
      Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 5),
          col("vec_id"), col("embedding"), k = 10)
        .orderBy(col("q_id"), col("rank"))
    },
    Some(s"""
      WITH $CosineE,
      q AS (SELECT * FROM e WHERE vec_id < 5),
      scored AS (
        SELECT q.vec_id AS q_id, c.vec_id AS n_id,
          list_reduce([0.0::DOUBLE] || [CAST(q.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE) for i in range(1, len(q.embedding) + 1)], (x, v) -> x + v)
            / (q.nrm * c.nrm) AS cosine
        FROM q JOIN e c ON c.vec_id != q.vec_id),
      ranked AS (
        SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, n_id) AS rank
        FROM scored)
      SELECT q_id, rank, n_id, ROUND(cosine, 6) AS cosine
      FROM ranked WHERE rank <= 10
      ORDER BY q_id, rank"""),
    headline = true,
  )

  // ---------------------------------------------------------------- q39
  /** Approximate (multi-probe sign-LSH) ANN. Approximate does NOT mean
    * unverifiable: bucket assignment and probing are pure arithmetic,
    * so the oracle replays the identical 8-plane signatures, the same
    * 1-bit-flip probe set, and the same candidate dedup + cosine
    * ranking — grading the approximation itself, not just row counts
    * (rows-only until round 6).
    */
  val q39AnnLsh: QueryDef = QueryDef(
    "q39_ann_lsh",
    (s, dir) => {
      val emb = Tables(s, dir, "embeddings")
      Similarity.lshTopK(emb, emb.filter(col("vec_id") < 5),
          col("vec_id"), col("embedding"), k = 10)
        .orderBy(col("q_id"), col("rank"))
    },
    oracle = Some(s"""
      WITH z AS (SELECT vec_id, embedding,
        sqrt(list_reduce([0.0::DOUBLE] || [CAST(x AS DOUBLE) * CAST(x AS DOUBLE) for x in embedding], (a, v) -> a + v)) AS nrm,
        ${CurationQueries.lshCellSql(8)} AS bucket FROM embeddings),
      q AS (SELECT vec_id, embedding, nrm, xor(bucket, m) AS bucket
        FROM z, LATERAL (SELECT unnest([0, 1, 2, 4, 8, 16, 32, 64, 128]) AS m) probes
        WHERE vec_id < 5),
      cand AS (SELECT DISTINCT q.vec_id AS q_id, c.vec_id AS n_id
        FROM q JOIN z c USING (bucket) WHERE c.vec_id != q.vec_id),
      scored AS (SELECT cand.q_id, cand.n_id,
        list_reduce([0.0::DOUBLE] || [CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE) for i in range(1, len(a.embedding) + 1)], (x, v) -> x + v)
          / (a.nrm * b.nrm) AS cosine
        FROM cand JOIN z a ON a.vec_id = cand.q_id
                  JOIN z b ON b.vec_id = cand.n_id),
      r AS (SELECT q_id, n_id, cosine, ROW_NUMBER() OVER (PARTITION BY q_id
          ORDER BY cosine DESC, n_id) AS rank FROM scored)
      SELECT q_id, rank, n_id, ROUND(cosine, 6) AS cosine
      FROM r WHERE rank <= 10
      ORDER BY q_id, rank"""),
  )

  // ---------------------------------------------------------------- q40
  /** Structured Streaming 3-hour tumbling-window event counts drained
    * to completion (EventsStream.windowedCounts) — watermarked state,
    * batch-equivalent by construction, so the batch GROUP BY oracle
    * grades the streaming plan exactly.
    */
  val q40StreamWindow: QueryDef = QueryDef(
    "q40_stream_window",
    (s, dir) => graft.streaming.EventsStream.windowedCounts(s, dir),
    Some("""
      SELECT (epoch_us(ts) // 1000000) // 10800 * 10800 AS bucket_start,
        event_type, COUNT(*) AS n
      FROM events
      GROUP BY 1, 2
      ORDER BY bucket_start, event_type"""),
  )

  // ---------------------------------------------------------------- q41
  /** Data contract: event_ids are unique in the testdata, so the
    * SQL-expressible global distinct count equals the watermark-bounded
    * streaming dedup. A duplicate id arriving > watermark after its
    * first occurrence ACROSS micro-batches would be counted twice by
    * design (bounded state) — that semantics is the operator's point
    * and cannot be expressed in the batch oracle.
    */
  val q41StreamDedup: QueryDef = QueryDef(
    "q41_stream_dedup",
    (s, dir) => graft.streaming.EventsStream.dedupCount(s, dir),
    Some("""
      SELECT event_type, COUNT(DISTINCT event_id) AS n
      FROM events
      GROUP BY event_type
      ORDER BY event_type"""),
  )

  // ---------------------------------------------------------------- q42
  /** Multimodal column plumbing: binary payloads with typed metadata,
    * batched partition-local decode (mapInPandas-shaped), byte/frame
    * accounting — schema and batching are real; the codec arithmetic
    * is the documented deterministic stub where exercised on text
    * payloads; the REAL codecs are graded separately (image q230,
    * audio q231, video container q232).
    */
  val q42Multimodal: QueryDef = QueryDef(
    "q42_multimodal",
    (s, dir) =>
      Multimodal.decodeFeatures(
          Multimodal.mediaFromDocuments(Tables(s, dir, "documents")))
        .orderBy(col("media_id")),
    Some(s"""
      SELECT doc_id AS media_id,
        CASE CAST(doc_id % 3 AS INT)
          WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        octet_length(encode(text)) AS n_bytes,
        CASE WHEN length(text) > 0 THEN unicode(substr(text, 1, 1))::BIGINT ELSE -1 END AS header_byte,
        ${FpLambda.format("substr(text, 1, 16)")} AS checksum,
        octet_length(encode(text)) // 256 + 1 AS n_frames
      FROM documents
      ORDER BY media_id"""),
  )

  // --------------------------------------------------------------- q100
  /** Video frame sampling: every 2nd 256-char frame of each video
    * payload, with offsets, widths, and per-frame fingerprints — the
    * multimodal fan-out plumbing (schema, sampling arithmetic,
    * narrow expansion) graded end-to-end; only the codec inside the
    * frame window is a stub.
    */
  val q100FrameSample: QueryDef = QueryDef(
    "q100_frame_sample",
    (s, dir) =>
      Multimodal.sampleFrames(
          Multimodal.mediaFromDocuments(Tables(s, dir, "documents"))
            .filter(col("kind") === "video"),
          frameChars = 256, everyNth = 2)
        .orderBy(col("media_id"), col("sample_id")),
    Some(s"""
      WITH m AS (
        SELECT doc_id AS media_id,
          CASE CAST(doc_id % 3 AS INT)
            WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video'
          END AS kind,
          text AS s
        FROM documents),
      f AS (
        SELECT media_id, kind, s,
          unnest(range(0,
            GREATEST(CAST(ceil(len(s) / 256.0) AS BIGINT), 1), 2)) AS fi
        FROM m WHERE kind = 'video'),
      fr AS (
        SELECT media_id, kind, fi // 2 AS sample_id,
          fi * 256 AS offset_chars, substr(s, fi * 256 + 1, 256) AS frame
        FROM f)
      SELECT media_id, kind, sample_id, offset_chars,
        CAST(len(frame) AS BIGINT) AS n_chars,
        CASE WHEN len(frame) = 0 THEN 0
             ELSE ${FpLambda.format("frame")} END AS frame_fp
      FROM fr
      ORDER BY media_id, sample_id"""),
  )

  // --------------------------------------------------------------- q101
  /** Resize-accounting plumbing variant: deterministic 1/4
    * character downsample grading the original/resized size accounting
    * and the resized payload's fingerprint over arbitrary binary
    * payloads. The REAL pixel resampler on real PNGs is q234
    * ([[Multimodal.resizeImages]]). */
  val q101Resize: QueryDef = QueryDef(
    "q101_resize",
    (s, dir) =>
      Multimodal.resizeStub(
          Multimodal.mediaFromDocuments(Tables(s, dir, "documents"))
            .filter(col("kind") === "image"),
          factor = 4)
        .orderBy(col("media_id")),
    Some(s"""
      WITH m AS (
        SELECT doc_id AS media_id,
          CASE CAST(doc_id % 3 AS INT)
            WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video'
          END AS kind,
          text AS s
        FROM documents),
      r AS (
        SELECT media_id, kind, s,
          array_to_string(list_filter(string_split(s, ''),
            (c, i) -> (i - 1) % 4 = 0), '') AS resized
        FROM m WHERE kind = 'image')
      SELECT media_id, kind, CAST(len(s) AS BIGINT) AS orig_chars,
        CAST(len(resized) AS BIGINT) AS resized_chars,
        CASE WHEN len(resized) = 0 THEN 0
             ELSE ${FpLambda.format("resized")} END AS resized_fp
      FROM r
      ORDER BY media_id"""),
  )

  private val SessionOracle = """
      WITH ev AS (
        SELECT user_id, event_id, epoch_us(ts) // 1000000 AS sec, value
        FROM events),
      w AS (
        SELECT *, LAG(sec) OVER (PARTITION BY user_id ORDER BY sec, event_id) AS prev
        FROM ev),
      s AS (
        SELECT *, CASE WHEN prev IS NULL OR sec - prev > 1800 THEN 1 ELSE 0 END AS ns
        FROM w),
      c AS (
        SELECT *, SUM(ns) OVER (PARTITION BY user_id ORDER BY sec, event_id
          ROWS UNBOUNDED PRECEDING) AS sid
        FROM s)
      SELECT user_id, MIN(sec) AS session_start, MAX(sec) AS session_end,
        COUNT(*) AS n_events,
        CAST(SUM(CAST(ROUND(value * 100.0) AS BIGINT)) AS DOUBLE) / 100.0 AS total_value
      FROM c GROUP BY user_id, sid
      ORDER BY user_id, session_start"""

  // ---------------------------------------------------------------- q43
  /** Stateful sessionization via flatMapGroupsWithState (30-min gap). */
  val q43SessionizeState: QueryDef = QueryDef(
    "q43_sessionize_state",
    (s, dir) => graft.streaming.Sessionize.run(s, dir, gapSeconds = 1800)
      .orderBy(col("user_id"), col("session_start")),
    Some(SessionOracle),
  )

  // ---------------------------------------------------------------- q44
  /** The same sessions via the declarative window-lag plan — the two
    * implementations are proven equivalent against one oracle.
    */
  val q44SessionizeBatch: QueryDef = QueryDef(
    "q44_sessionize_batch",
    (s, dir) => graft.streaming.Sessionize.sessionizeBatch(
        Tables(s, dir, "events"), gapSeconds = 1800)
      .orderBy(col("user_id"), col("session_start")),
    Some(SessionOracle),
  )

  // ---------------------------------------------------------------- q45
  /** IVF ANN with full probing (nProbe = nCentroids) — exact by
    * construction, so it shares the brute-force oracle; drop nProbe for
    * the sublinear scale path (see SimilaritySpec recall checks).
    */
  val q45AnnIvf: QueryDef = QueryDef(
    "q45_ann_ivf",
    (s, dir) => {
      val emb = Tables(s, dir, "embeddings")
      Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 5),
          col("vec_id"), col("embedding"), k = 10,
          nCentroids = 8, nProbe = 8)
        .orderBy(col("q_id"), col("rank"))
    },
    q38AnnTopK.oracle,
  )

  // ---------------------------------------------------------------- q46
  /** KMV sketch vs exact distinct per group, graded by oracle since
    * round 15: re-expressed over [[graft.plans.Kmv32DistinctSketch]]
    * (the PortableHash 32-bit arithmetic hash + pure-integer
    * estimate), so the ESTIMATES hash-replay in DuckDB — previously
    * the lone rows-only sketch row, because its xxhash64 variant's
    * estimate was engine-private. Distinct surface from q109 (k = 64
    * over lineitem parts per returnflag): k = 128 over event users
    * per event type — a second (k, cardinality) operating point of
    * the same mergeable O(k) aggregate. The Spark-native xxhash64
    * sketch ([[graft.plans.KmvDistinctSketch]]) remains in the
    * library for non-integer keys, with its error bound pinned in
    * ScaleDesignSpec.
    */
  val q46DistinctSketch: QueryDef = QueryDef(
    "q46_distinct_sketch",
    (s, dir) =>
      Tables(s, dir, "events")
        // group set derived from the SAME null-filtered relation as the
        // oracle's CTEs: an event_type whose user_ids are ALL null
        // would otherwise survive here (exact=0, estimate=0) while
        // vanishing from the oracle's inner join (round 16, advisor).
        // For groups with ≥1 non-null user the filter is a no-op —
        // countDistinct and the KMV sketch both ignore nulls.
        .filter(col("user_id").isNotNull)
        .groupBy(col("event_type"))
        .agg(
          countDistinct(col("user_id")).as("exact"),
          graft.plans.Kmv32DistinctSketch
            .distinctSketch32(col("user_id"), 128).as("estimate"))
        .withColumn("rel_err",
          round(abs(col("estimate") - col("exact")).cast("double") /
            col("exact"), 4))
        .orderBy(col("event_type")),
    oracle = Some {
      val steps = graft.functions.PortableHash.hash32SqlSteps("user_id")
      s"""
      WITH h0 AS (
        SELECT event_type, ${steps(0)} AS h
        FROM events WHERE user_id IS NOT NULL),
      h1 AS (SELECT event_type, ${steps(1)} AS h FROM h0),
      h2 AS (SELECT event_type, ${steps(2)} AS h FROM h1),
      hf AS (SELECT DISTINCT event_type, ${steps(3)} AS h FROM h2),
      r AS (
        SELECT event_type, h,
          ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rn,
          COUNT(*) OVER (PARTITION BY event_type) AS nd
        FROM hf),
      est AS (
        SELECT event_type,
          CASE WHEN nd < 128 THEN nd
               ELSE (127 * 8589934592 + h) // (2 * h) END AS estimate
        FROM r WHERE rn = LEAST(nd, 128)),
      ex AS (
        SELECT event_type, COUNT(DISTINCT user_id) AS exact
        FROM events WHERE user_id IS NOT NULL GROUP BY 1)
      SELECT ex.event_type, ex.exact, est.estimate,
        ROUND(CAST(ABS(est.estimate - ex.exact) AS DOUBLE) / ex.exact, 4)
          AS rel_err
      FROM ex JOIN est USING (event_type) ORDER BY event_type"""
    },
  )

  // ---------------------------------------------------------------- q49
  /** Vocabulary mining: corpus-wide term frequency + document frequency,
    * top 100 by df — the stopword/vocab-building pass of a training-data
    * pipeline. One explode + one hash aggregate on the term (map-side
    * partial agg collapses each partition to its distinct terms before
    * the shuffle); the top-k is TakeOrderedAndProject, never a global
    * sort.
    */
  val q49Vocab: QueryDef = QueryDef(
    "q49_vocab",
    (s, dir) =>
      Tables(s, dir, "documents")
        .select(col("doc_id"),
          explode(TextFunctions.tokens(col("text"))).as("term"))
        .filter(col("term") =!= "")
        .groupBy(col("term"))
        .agg(count(lit(1)).as("tf"),
          count_distinct(col("doc_id")).as("df"))
        .orderBy(col("df").desc, col("tf").desc, col("term"))
        .limit(100),
    Some("""
      SELECT term, COUNT(*) AS tf, COUNT(DISTINCT doc_id) AS df
      FROM (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term
        FROM documents)
      WHERE term <> ''
      GROUP BY term
      ORDER BY df DESC, tf DESC, term
      LIMIT 100"""),
  )

  // ---------------------------------------------------------------- q50
  /** Backward as-of join: every purchase event aligned with the user's
    * most recent click at or before it — the no-leakage feature-snapshot
    * attach of a training pipeline. Spark side is the sort-merge union +
    * carry-forward window ([[graft.operators.AsOfJoin]], one exchange);
    * DuckDB's NATIVE `ASOF LEFT JOIN` grades the semantics, so the two
    * engines implement the operator entirely independently. The right
    * side is pre-aggregated to one row per (user, ts) — the tie contract
    * both implementations share.
    */
  val q50AsofJoin: QueryDef = QueryDef(
    "q50_asof_join",
    (s, dir) => {
      val ev = Tables(s, dir, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val clicks = ev.filter(col("event_type") === "click")
        .groupBy(col("user_id"), col("ts"))
        .agg(max(col("event_id")).as("click_id"),
          max_by(col("value"), col("event_id")).as("click_value"))
      graft.operators.AsOfJoin.backward(purchases, clicks,
          keyCols = Seq("user_id"), tsCol = "ts",
          payloadCols = Seq("click_id", "click_value"))
        .select(col("event_id"), col("user_id"),
          col("ts").cast("long").as("ts_sec"),
          col("click_id"), round(col("click_value"), 6).as("click_value"))
        .orderBy(col("event_id"))
    },
    Some("""
      WITH p AS (
        SELECT event_id, user_id, ts FROM events
        WHERE event_type = 'purchase'),
      c AS (
        SELECT user_id, ts, MAX(event_id) AS click_id,
               MAX_BY(value, event_id) AS click_value
        FROM events WHERE event_type = 'click'
        GROUP BY user_id, ts)
      SELECT p.event_id, p.user_id,
             CAST(FLOOR(epoch(p.ts)) AS BIGINT) AS ts_sec,
             c.click_id, ROUND(c.click_value, 6) AS click_value
      FROM p ASOF LEFT JOIN c
        ON p.user_id = c.user_id AND c.ts <= p.ts
      ORDER BY p.event_id"""),
  )

  // ---------------------------------------------------------------- q52
  /** Token-cost estimation: whitespace tokens vs BPE-ish subword-proxy
    * tokens and the chars-per-token ratio — the pre-training budget
    * pass. Narrow-only (scan-bound, no shuffle); both engines run the
    * same regex (Java regex and RE2 agree on the pattern).
    */
  val q52TokenCost: QueryDef = QueryDef(
    "q52_token_cost",
    (s, dir) =>
      graft.operators.Explosive.ensureMapParallelism(
          Tables(s, dir, "documents"), col("doc_id")).select(
        col("doc_id"),
        TextFunctions.tokenCount(col("text")).as("n_ws_tokens"),
        TextFunctions.bpeIshTokenCount(col("text")).as("n_bpe_tokens"),
        when(TextFunctions.bpeIshTokenCount(col("text")) > 0,
          round(length(col("text")).cast("double") /
            TextFunctions.bpeIshTokenCount(col("text")), 6))
          .as("chars_per_token"))
        .orderBy(col("doc_id")),
    Some("""
      WITH t AS (
        SELECT doc_id, text,
          CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9 \t\n\x0B\f\r]')) AS BIGINT) AS n_bpe
        FROM documents)
      SELECT doc_id,
        CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws_tokens,
        n_bpe AS n_bpe_tokens,
        CASE WHEN n_bpe > 0
          THEN ROUND(CAST(length(text) AS DOUBLE) / n_bpe, 6) END
          AS chars_per_token
      FROM t
      ORDER BY doc_id"""),
  )

  // ---------------------------------------------------------------- q55
  /** Rarity-weighted keyword extraction: top-3 terms per document by
    * tf × (N/df) — the monotone core of tf-idf without the logarithm,
    * deliberately: ln() is not bit-reproducible across libm
    * implementations, while this score is pure +,×,÷ on doubles, so the
    * DuckDB oracle matches exactly. Two hash aggregates + one per-doc
    * window; the dominant shuffle is the (doc, term) aggregate, with
    * map-side partial aggregation collapsing repeats.
    */
  val q55Keywords: QueryDef = QueryDef(
    "q55_keywords",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val docs = Tables(s, dir, "documents")
      val n = docs.count()
      val tf = docs.select(col("doc_id"),
          explode(TextFunctions.tokens(col("text"))).as("term"))
        .filter(col("term") =!= "")
        .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
      val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      val w = Window.partitionBy(col("doc_id"))
        .orderBy(col("score").desc, col("term"))
      tf.join(dfreq, Seq("term"))
        .withColumn("score",
          round(col("tf") * (lit(n.toDouble) / col("df")), 6))
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 3)
        .select(col("doc_id"), col("rank"), col("term"), col("score"))
        .orderBy(col("doc_id"), col("rank"))
    },
    Some("""
      WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term
        FROM documents),
      tf AS (
        SELECT doc_id, term, COUNT(*) AS tf
        FROM toks WHERE term <> '' GROUP BY doc_id, term),
      dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
      n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM documents),
      ranked AS (
        SELECT tf.doc_id, tf.term,
          ROUND(tf.tf * (n.n / dfreq.df), 6) AS score,
          row_number() OVER (PARTITION BY tf.doc_id
            ORDER BY ROUND(tf.tf * (n.n / dfreq.df), 6) DESC, tf.term) AS rank
        FROM tf JOIN dfreq USING (term), n)
      SELECT doc_id, rank, term, score
      FROM ranked WHERE rank <= 3
      ORDER BY doc_id, rank"""),
  )

  // ---------------------------------------------------------------- q59
  /** SpaceSaving heavy hitters over the term stream — the frequency
    * profile a 100 TB pass computes in O(capacity) memory per partition
    * instead of an exact groupBy. Within capacity the sketch is exact
    * (error 0), which is what lets this row carry a real oracle; the
    * approx regime's bounds are spec'd separately.
    */
  val q59HeavyHitters: QueryDef = QueryDef(
    "q59_heavy_hitters",
    (s, dir) =>
      Tables(s, dir, "documents")
        .select(explode(TextFunctions.tokens(col("text"))).as("term"))
        .filter(col("term") =!= "")
        .agg(graft.plans.HeavyHitters.topItems(col("term"),
          capacity = 4096, topK = 20).as("top"))
        .select(posexplode(col("top")))
        .select((col("pos") + 1).cast("long").as("rank"),
          col("col").getField("_1").as("term"),
          col("col").getField("_2").as("cnt"),
          col("col").getField("_3").as("err"))
        .orderBy(col("rank")),
    Some("""
      WITH tf AS (
        SELECT term, COUNT(*) AS cnt FROM (
          SELECT unnest(string_split(text, ' ')) AS term FROM documents)
        WHERE term <> '' GROUP BY term)
      SELECT CAST(row_number() OVER (ORDER BY cnt DESC, term) AS BIGINT) AS rank,
             term, cnt, CAST(0 AS BIGINT) AS err
      FROM tf
      ORDER BY cnt DESC, term
      LIMIT 20"""),
  )

  // ---------------------------------------------------------------- q60
  /** Resample + forward-fill: align each user's irregular event series
    * to a regular 6-hour grid, carrying the last observation forward
    * (null before the first) — the feature-alignment pass of
    * time-series training data. Composed from the as-of join: grid ⨝asof
    * last event at-or-before each grid point, one exchange. The oracle
    * replays it with DuckDB's native ASOF LEFT JOIN over the same
    * epoch-second grid.
    */
  val q60ResampleFfill: QueryDef = QueryDef(
    "q60_resample_ffill",
    (s, dir) => {
      val ev = Tables(s, dir, "events")
        .select(col("user_id"), col("ts").cast("long").as("ts_sec"),
          col("value"), col("event_id"))
      // bounds stay IN the plan (1-row broadcast cross join) — the
      // query is a single lazy job, and empty input yields zero grid
      // rows instead of a driver-side NPE, matching the oracle
      val bounds = ev.agg(min(col("ts_sec")).as("lo"),
        max(col("ts_sec")).as("hi"))
      val clean = ev.groupBy(col("user_id"), col("ts_sec"))
        .agg(max_by(col("value"), col("event_id")).as("value"))
      val grid = ev.select(col("user_id")).distinct()
        .crossJoin(broadcast(bounds))
        .filter(col("lo").isNotNull)
        .select(col("user_id"),
          explode(sequence(col("lo"), col("hi"), lit(21600L))).as("ts_sec"))
      graft.operators.AsOfJoin.backward(grid, clean,
          keyCols = Seq("user_id"), tsCol = "ts_sec",
          payloadCols = Seq("value"))
        .select(col("user_id"), col("ts_sec"),
          round(col("value"), 6).as("value"))
        .orderBy(col("user_id"), col("ts_sec"))
    },
    Some("""
      WITH e AS (
        SELECT user_id, CAST(FLOOR(epoch(ts)) AS BIGINT) AS ts_sec,
               value, event_id
        FROM events),
      b AS (SELECT MIN(ts_sec) AS lo, MAX(ts_sec) AS hi FROM e),
      u AS (SELECT DISTINCT user_id FROM e),
      g AS (
        SELECT u.user_id, unnest(generate_series(b.lo, b.hi, 21600)) AS ts_sec
        FROM u, b),
      c AS (
        SELECT user_id, ts_sec, MAX_BY(value, event_id) AS value
        FROM e GROUP BY user_id, ts_sec)
      SELECT g.user_id, g.ts_sec, ROUND(c.value, 6) AS value
      FROM g ASOF LEFT JOIN c
        ON g.user_id = c.user_id AND c.ts_sec <= g.ts_sec
      ORDER BY g.user_id, g.ts_sec"""),
  )

  // ---------------------------------------------------------------- q61
  /** Gopher-style repetition filters: duplicate-token fraction, top
    * single-token fraction, duplicate-bigram fraction per document — the
    * cheap repetition screens a pretraining pass applies before any
    * model-based scoring. Both profiles come from the fused
    * [[graft.plans.TokenNgramStats]] expression (one scan + hash map per
    * row, no shuffle); the oracle replays the same counts via
    * explode-and-group SQL.
    */
  val q61Repetition: QueryDef = QueryDef(
    "q61_repetition",
    (s, dir) =>
      graft.operators.Explosive.ensureMapParallelism(
          Tables(s, dir, "documents"), col("doc_id"))
        .select(col("doc_id"),
          graft.plans.TokenNgramStats.token_ngram_stats(col("text"), 1).as("u"),
          graft.plans.TokenNgramStats.token_ngram_stats(col("text"), 2).as("b"))
        .select(col("doc_id"),
          col("u.n_grams").as("n_tokens"),
          when(col("u.n_grams") > 0,
            round((col("u.n_grams") - col("u.n_distinct")).cast("double") /
              col("u.n_grams"), 6)).as("dup_token_frac"),
          when(col("u.n_grams") > 0,
            round(col("u.top_tf").cast("double") / col("u.n_grams"), 6))
            .as("top_token_frac"),
          when(col("b.n_grams") > 0,
            round((col("b.n_grams") - col("b.n_distinct")).cast("double") /
              col("b.n_grams"), 6)).as("dup_bigram_frac"))
        .orderBy(col("doc_id")),
    Some("""
      WITH t AS (
        SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
        FROM documents),
      uc AS (
        SELECT doc_id, tk, COUNT(*) AS c FROM (
          SELECT doc_id, unnest(toks) AS tk FROM t) GROUP BY doc_id, tk),
      us AS (
        SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n, COUNT(*) AS d, MAX(c) AS m
        FROM uc GROUP BY doc_id),
      bc AS (
        SELECT doc_id, g, COUNT(*) AS c FROM (
          SELECT doc_id,
            unnest([toks[i] || ' ' || toks[i+1] for i in range(1, len(toks))]) AS g
          FROM t) GROUP BY doc_id, g),
      bs AS (
        SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n, COUNT(*) AS d
        FROM bc GROUP BY doc_id)
      SELECT t.doc_id,
        COALESCE(us.n, 0) AS n_tokens,
        CASE WHEN us.n > 0
          THEN ROUND(CAST(us.n - us.d AS DOUBLE) / us.n, 6) END AS dup_token_frac,
        CASE WHEN us.n > 0
          THEN ROUND(CAST(us.m AS DOUBLE) / us.n, 6) END AS top_token_frac,
        CASE WHEN bs.n > 0
          THEN ROUND(CAST(bs.n - bs.d AS DOUBLE) / bs.n, 6) END AS dup_bigram_frac
      FROM t LEFT JOIN us USING (doc_id) LEFT JOIN bs USING (doc_id)
      ORDER BY doc_id"""),
  )

  // ---------------------------------------------------------------- q62
  /** Benchmark decontamination: flag corpus documents (doc_id % 10 ≠ 0)
    * sharing any 8-gram with the held-out "benchmark" slice
    * (doc_id % 10 = 0). The graded path is the full
    * [[graft.operators.Decontaminate]] pipeline — benchmark shingles →
    * driver bloom → codegen'd map-side prefilter → broadcast-join exact
    * verify — so bloom false positives provably cannot leak into the
    * output (the oracle recomputes the overlap exactly on gram strings).
    */
  val q62Decontaminate: QueryDef = QueryDef(
    "q62_decontaminate",
    (s, dir) => {
      val docs = Tables(s, dir, "documents")
      val benchGrams = Decontaminate.benchmarkShingles(
        docs.filter(col("doc_id") % 10 === 0), col("text"), n = 8)
      Decontaminate.contaminated(
          docs.filter(col("doc_id") % 10 =!= 0), col("doc_id"), col("text"),
          benchGrams, n = 8)
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH docs AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      sh AS (
        SELECT doc_id,
          list_distinct([list_reduce(t[i:i+7], (a, b) -> a || ' ' || b)
                         for i in range(1, len(t) - 6)]) AS g
        FROM docs WHERE len(t) >= 8),
      bench AS (
        SELECT DISTINCT unnest(g) AS gram FROM sh WHERE doc_id % 10 = 0),
      corpus AS (
        SELECT doc_id, unnest(g) AS gram FROM sh WHERE doc_id % 10 <> 0)
      SELECT c.doc_id, COUNT(*) AS n_overlap
      FROM corpus c JOIN bench b USING (gram)
      GROUP BY c.doc_id
      ORDER BY c.doc_id"""),
  )

  // ---------------------------------------------------------------- q63
  /** Rule-based corpus filter verdicts ([[graft.operators.CorpusFilter]]):
    * length + token/bigram repetition screens with per-rule
    * attribution. Thresholds (30 ≤ tokens ≤ 10000, dup-token ≤ 0.6,
    * dup-bigram ≤ 0.05) split the synthetic corpus so every rule
    * rejects a real slice.
    */
  val q63CorpusFilter: QueryDef = QueryDef(
    "q63_corpus_filter",
    (s, dir) =>
      CorpusFilter.gopherFlags(Tables(s, dir, "documents"),
          col("doc_id"), col("text"),
          CorpusFilter.Thresholds(minTokens = 30, maxTokens = 10000,
            maxDupTokenFrac = 0.6, maxDupBigramFrac = 0.05))
        .orderBy(col("doc_id")),
    Some("""
      WITH t AS (
        SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
        FROM documents),
      u AS (
        SELECT doc_id, len(toks) AS n, len(list_distinct(toks)) AS d FROM t),
      b AS (
        SELECT doc_id,
          CASE WHEN len(toks) >= 2 THEN len(toks) - 1 ELSE 0 END AS nb,
          CASE WHEN len(toks) >= 2 THEN
            len(list_distinct([toks[i] || ' ' || toks[i+1] for i in range(1, len(toks))]))
          ELSE 0 END AS db
        FROM t),
      f AS (
        SELECT u.doc_id, u.n AS n_tokens,
          u.n BETWEEN 30 AND 10000 AS len_ok,
          CASE WHEN u.n > 0
            THEN CAST(u.n - u.d AS DOUBLE) / u.n <= 0.6 ELSE TRUE END AS dup_token_ok,
          CASE WHEN b.nb > 0
            THEN CAST(b.nb - b.db AS DOUBLE) / b.nb <= 0.05 ELSE TRUE END AS dup_bigram_ok
        FROM u JOIN b USING (doc_id))
      SELECT doc_id, n_tokens, len_ok, dup_token_ok, dup_bigram_ok,
        len_ok AND dup_token_ok AND dup_bigram_ok AS keep
      FROM f ORDER BY doc_id"""),
  )

  // ---------------------------------------------------------------- q64
  /** Deterministic source-weighted mixture sampling
    * ([[graft.operators.Scale.mixtureSample]]): keep-rates per source,
    * membership a pure function of content hash — reproducible across
    * runs, partitionings, and engines (the oracle replays the identical
    * rolling hash).
    */
  val q64MixtureSample: QueryDef = QueryDef(
    "q64_mixture_sample",
    (s, dir) =>
      Scale.mixtureSample(Tables(s, dir, "documents"),
          col("source"), col("text"),
          Map("src0" -> 1.0, "src1" -> 0.5, "src2" -> 0.25, "src3" -> 0.1),
          defaultRate = 0.75)
        .select(col("doc_id"), col("source"))
        .orderBy(col("doc_id")),
    Some(s"""
      WITH r AS (
        SELECT doc_id, source,
          ${FpLambda.format("text")} % 1000000 AS h
        FROM documents)
      SELECT doc_id, source FROM r
      WHERE h < (CASE source WHEN 'src0' THEN 1.0 WHEN 'src1' THEN 0.5
                 WHEN 'src2' THEN 0.25 WHEN 'src3' THEN 0.1
                 ELSE 0.75 END) * 1000000
      ORDER BY doc_id"""),
  )

  // ---------------------------------------------------------------- q65
  /** Exact per-label embedding centroids
    * ([[graft.operators.Similarity.labelCentroids]]): fixed-point exact
    * sums make the distributed mean order-independent, so Spark and
    * DuckDB agree bit-for-bit on every component.
    */
  val q65LabelCentroids: QueryDef = QueryDef(
    "q65_label_centroids",
    (s, dir) =>
      Similarity.labelCentroids(Tables(s, dir, "embeddings"),
          col("label"), col("embedding"))
        .orderBy(col("label"), col("dim")),
    Some("""
      SELECT label, s.i - 1 AS dim, COUNT(*) AS n,
        ROUND(CAST(SUM(CAST(ROUND(CAST(embedding[s.i] AS DOUBLE) * 1000000, 0) AS BIGINT)) AS DOUBLE)
          / (COUNT(*) * 1000000.0), 6) AS centroid
      FROM embeddings, (SELECT unnest(range(1, 10000)) AS i) s
      WHERE s.i <= len(embedding)
      GROUP BY label, dim
      ORDER BY label, dim"""),
  )

  // --------------------------------------------------------------- q230
  /** REAL image decode, graded cross-engine WITHOUT the oracle needing
    * a codec: Spark encodes one actual PNG per document id from a
    * deterministic integer test raster ([[Multimodal.pngFromIds]],
    * javax.imageio on the executors), decodes it back
    * ([[Multimodal.decodeImages]]), and hashes the decoded ARGB
    * raster; DuckDB replays the same raster by pure arithmetic. A
    * green row proves the PNG encode→decode round-trip is lossless
    * and the decoder reads real pixels — the codec itself is under
    * test, not stubbed. Encoded byte size is deliberately NOT graded
    * (PNG encoder output is JDK-version-dependent; the raster is not).
    */
  val q230ImageDecode: QueryDef = QueryDef(
    "q230_image_decode",
    (s, dir) =>
      Multimodal.decodeImages(
          Multimodal.pngFromIds(
            Tables(s, dir, "documents").select(col("doc_id"))))
        .select(col("media_id"), col("width"), col("height"),
          col("pixel_checksum"))
        .orderBy(col("media_id")),
    Some("""
      WITH d AS (
        SELECT doc_id, CAST(4 + doc_id % 13 AS BIGINT) AS w,
          CAST(3 + doc_id % 7 AS BIGINT) AS h
        FROM documents),
      px AS (
        SELECT doc_id, w, h,
          [4278190080
             + ((doc_id + 3 * (i % w) + 5 * (i // w)) % 256) * 65536
             + ((2 * doc_id + 7 * (i % w) + (i // w)) % 256) * 256
             + ((5 * doc_id + (i % w) + 11 * (i // w)) % 256)
           for i in range(0, w * h)] AS pxs
        FROM d)
      SELECT doc_id AS media_id, w AS width, h AS height,
        list_reduce([0::BIGINT] || pxs,
          (a, v) -> (a * 31 + v) % 1000000007) AS pixel_checksum
      FROM px ORDER BY media_id"""),
  )

  // --------------------------------------------------------------- q231
  /** REAL audio decode, the q230 pattern for sound: Spark writes one
    * actual PCM-16 mono WAV per document id from a deterministic
    * integer signal ([[Multimodal.wavFromIds]], javax.sound.sampled),
    * parses it back ([[Multimodal.decodeAudio]] — container header,
    * sample rate, channels, frame length) and hashes the decoded
    * unsigned 16-bit samples; DuckDB replays the signal by pure
    * arithmetic. PCM WAV is lossless, so a green row proves the
    * writer, the container parser, and the PCM read are all real.
    */
  val q231AudioDecode: QueryDef = QueryDef(
    "q231_audio_decode",
    (s, dir) =>
      Multimodal.decodeAudio(
          Multimodal.wavFromIds(
            Tables(s, dir, "documents").select(col("doc_id"))))
        .select(col("media_id"), col("sample_rate"), col("channels"),
          col("n_frames"), col("pcm_checksum"))
        .orderBy(col("media_id")),
    Some("""
      WITH d AS (
        SELECT doc_id, CAST(64 + doc_id % 129 AS BIGINT) AS n
        FROM documents)
      SELECT doc_id AS media_id,
        CAST(8000 AS BIGINT) AS sample_rate,
        CAST(1 AS BIGINT) AS channels,
        n AS n_frames,
        list_reduce([0::BIGINT] ||
            [(doc_id * 31 + i * 7) % 65536 for i in range(0, n)],
          (a, v) -> (a * 31 + v) % 1000000007) AS pcm_checksum
      FROM d ORDER BY media_id"""),
  )

  // --------------------------------------------------------------- q232
  /** REAL video-container parse: Spark builds one valid ISO-BMFF (MP4)
    * box tree per document id ([[Multimodal.mp4FromIds]] — ftyp,
    * moov(mvhd, trak(tkhd)×n), mdat, byte-exact to ISO 14496-12) and
    * walks it back with the generic size/type box parser
    * ([[Multimodal.parseMp4]]): mvhd timescale/duration, track count,
    * mdat payload bytes, boxes walked. DuckDB replays the container
    * parameters by arithmetic. This is the video path a 100 TB
    * pipeline actually runs at scan time — parse moov, never decode
    * samples; q233 grades the frame-decode path itself.
    */
  val q232VideoContainer: QueryDef = QueryDef(
    "q232_video_container",
    (s, dir) =>
      Multimodal.parseMp4(
          Multimodal.mp4FromIds(
            Tables(s, dir, "documents").select(col("doc_id"))))
        .orderBy(col("media_id")),
    Some("""
      SELECT doc_id AS media_id,
        CAST(600 AS BIGINT) AS timescale,
        CAST(1000 + doc_id % 9000 AS BIGINT) AS duration,
        CAST(1 + doc_id % 3 AS BIGINT) AS n_tracks,
        CAST(100 + doc_id % 400 AS BIGINT) AS mdat_bytes,
        CAST(4 + 2 * (1 + doc_id % 3) AS BIGINT) AS box_count
      FROM documents ORDER BY media_id"""),
  )

  // --------------------------------------------------------------- q233
  /** REAL video-frame decode, closing the last codec gap: Spark packs
    * per-frame PNG images (the lossless QuickTime-style 'png ' video
    * codec — the only video codec that is both JDK-encodable and
    * cross-engine gradable) into the real ISO-BMFF container
    * ([[Multimodal.videoFromIds]] — ftyp, moov(mvhd, trak), one mdat
    * per frame), walks the boxes back, samples every 2nd frame
    * keyframe-style, and decodes REAL PIXELS with `javax.imageio`
    * ([[Multimodal.decodeVideoFrames]]), hashing each frame's ARGB
    * raster. DuckDB replays frame count, sampling, dimensions, and
    * per-frame raster checksums by pure arithmetic — a green row
    * proves the container walk, the sampling, and the frame codec all
    * operate on real bytes. Scale shape: row-local encode/decode, the
    * frames-per-clip fan-out streams through the scan stage, zero
    * shuffle.
    */
  val q233VideoFrames: QueryDef = QueryDef(
    "q233_video_frames",
    (s, dir) =>
      Multimodal.decodeVideoFrames(
          Multimodal.videoFromIds(
            Tables(s, dir, "documents").select(col("doc_id"))),
          everyNth = 2)
        .orderBy(col("media_id"), col("frame_id")),
    Some("""
      WITH d AS (
        SELECT doc_id, CAST(4 + doc_id % 13 AS BIGINT) AS w,
          CAST(3 + doc_id % 7 AS BIGINT) AS h,
          CAST(2 + doc_id % 4 AS BIGINT) AS k
        FROM documents),
      f AS (
        SELECT doc_id, w, h, unnest(range(0, k, 2)) AS frame_id
        FROM d),
      px AS (
        SELECT doc_id, frame_id, w, h,
          [4278190080
             + (((doc_id * 131 + 17 * frame_id) + 3 * (i % w) + 5 * (i // w)) % 256) * 65536
             + ((2 * (doc_id * 131 + 17 * frame_id) + 7 * (i % w) + (i // w)) % 256) * 256
             + ((5 * (doc_id * 131 + 17 * frame_id) + (i % w) + 11 * (i // w)) % 256)
           for i in range(0, w * h)] AS pxs
        FROM f)
      SELECT doc_id AS media_id, CAST(frame_id AS BIGINT) AS frame_id,
        w AS width, h AS height,
        list_reduce([0::BIGINT] || pxs,
          (a, v) -> (a * 31 + v) % 1000000007) AS pixel_checksum
      FROM px ORDER BY media_id, frame_id"""),
  )

  // --------------------------------------------------------------- q234
  /** REAL image resize on real pixels — the round-12 upgrade of the
    * last stub-shaped operator: Spark encodes one actual PNG per
    * document id ([[Multimodal.pngFromIds]]), decodes it, downsamples
    * 2× with the EXACT area-average (box) resampler, round-trips the
    * resized raster through a real PNG encode→decode, and hashes the
    * resulting pixels ([[Multimodal.resizeImages]]). DuckDB replays the
    * resampled raster by pure integer arithmetic — each output channel
    * is ⌊Σ 2×2 input block / 4⌋ over the [[Multimodal.patternArgb]]
    * pattern — so a green row proves decoder, resampler, and encoder
    * all operated on real pixels. Row-local, batched, zero shuffle.
    */
  val q234ImageResize: QueryDef = QueryDef(
    "q234_image_resize",
    (s, dir) =>
      Multimodal.resizeImages(
          Multimodal.pngFromIds(
            Tables(s, dir, "documents").select(col("doc_id"))),
          factor = 2)
        .orderBy(col("media_id")),
    Some("""
      WITH d AS (
        SELECT doc_id, CAST(4 + doc_id % 13 AS BIGINT) AS w,
          CAST(3 + doc_id % 7 AS BIGINT) AS h
        FROM documents),
      dim AS (
        SELECT doc_id, w, h, w // 2 AS w2, h // 2 AS h2 FROM d),
      px AS (
        SELECT doc_id, w, h, w2, h2,
          [4278190080
             + (list_sum([(doc_id + 3 * (2 * (i % w2) + j % 2)
                           + 5 * (2 * (i // w2) + j // 2)) % 256
                          for j in range(0, 4)]) // 4) * 65536
             + (list_sum([(2 * doc_id + 7 * (2 * (i % w2) + j % 2)
                           + (2 * (i // w2) + j // 2)) % 256
                          for j in range(0, 4)]) // 4) * 256
             + (list_sum([(5 * doc_id + (2 * (i % w2) + j % 2)
                           + 11 * (2 * (i // w2) + j // 2)) % 256
                          for j in range(0, 4)]) // 4)
           for i in range(0, w2 * h2)] AS pxs
        FROM dim)
      SELECT doc_id AS media_id, w AS orig_width, h AS orig_height,
        w2 AS width, h2 AS height,
        CAST(list_reduce([0::BIGINT] || pxs,
          (a, v) -> (a * 31 + v) % 1000000007) AS BIGINT) AS pixel_checksum
      FROM px ORDER BY media_id"""),
  )

  val all: Seq[QueryDef] = Seq(
    q30TextStats, q31LangId, q32Fingerprint, q33DedupExact,
    q34NgramJaccard, q35MinhashLsh, q36SimhashPairs, q37CosinePairs,
    q38AnnTopK, q39AnnLsh, q40StreamWindow, q41StreamDedup, q42Multimodal,
    q43SessionizeState, q44SessionizeBatch, q45AnnIvf, q46DistinctSketch,
    q49Vocab, q50AsofJoin, q52TokenCost, q55Keywords, q59HeavyHitters,
    q60ResampleFfill, q61Repetition, q62Decontaminate, q63CorpusFilter,
    q64MixtureSample, q65LabelCentroids, q100FrameSample, q101Resize,
    q230ImageDecode, q231AudioDecode, q232VideoContainer, q233VideoFrames,
    q234ImageResize, q236SimhashDedupE2e)
}
