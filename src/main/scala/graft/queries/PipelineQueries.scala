package graft.queries

import graft.{QueryDef, Tables}
import graft.functions.Pii
import graft.operators.{Components, Dedup, Scale, Search}
import org.apache.spark.sql.functions._

/** Round-5 pipeline operators as graded queries: duplicate-cluster
  * resolution (pairs → connected components → canonical keep),
  * chunk-level exact dedup, PII redaction, deterministic weighted
  * sampling, and inverted-index text search. Oracles replicate the
  * engine-independent arithmetic in DuckDB (recursive label
  * propagation, integer scores, rational priorities).
  */
object PipelineQueries {

  // ---------------------------------------------------------------- q68
  /** Near-dup pairs (SimHash, hamming ≤ 3) resolved into duplicate
    * clusters by alternating-star connected components; the oracle
    * recomputes the same simhash pairs and closes them with a
    * recursive-CTE minimum-label propagation — two independent
    * fixed-point formulations of the same component structure.
    */
  val q68DedupClusters: QueryDef = QueryDef(
    "q68_dedup_clusters",
    (s, dir) => {
      val docs = Tables(s, dir, "documents")
      val pairs = Dedup.simhashPairs(docs, col("doc_id"), col("text"),
        maxHamming = 3)
      Components.dedupClusters(
          pairs.select(col("id_a").as("src"), col("id_b").as("dst")),
          docs.select(col("doc_id").as("node")))
        .select(col("node").as("doc_id"), col("component"),
          col("is_rep"), col("component_size"))
        .orderBy(col("doc_id"))
    },
    Some(s"""
      WITH RECURSIVE ${ScaleQueries.SimhashCtes},
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
      cc AS (SELECT node, MIN(label) AS component FROM lab GROUP BY node),
      sz AS (SELECT component, COUNT(*) AS component_size
             FROM cc GROUP BY component)
      SELECT cc.node AS doc_id, cc.component,
        CAST(cc.node = cc.component AS BIGINT) AS is_rep,
        sz.component_size
      FROM cc JOIN sz USING (component)
      ORDER BY doc_id"""),
  )

  // ---------------------------------------------------------------- q69
  /** Chunk-level exact dedup: globally keep the first occurrence of
    * every 16-word chunk and reassemble documents from the survivors.
    * The oracle states first-occurrence as a ROW_NUMBER window; the
    * Spark operator states it as a partial-aggregating groupBy-min —
    * independent formulations, identical fixed output.
    */
  val q69ChunkDedup: QueryDef = QueryDef(
    "q69_chunk_dedup",
    (s, dir) =>
      Dedup.chunkDedup(Tables(s, dir, "documents"),
          col("doc_id"), col("text"), chunkWords = 16)
        .orderBy(col("doc_id")),
    Some("""
      WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      nch AS (SELECT doc_id,
        CAST(ceil(len(w) / 16.0) AS BIGINT) AS n_chunks FROM t),
      ch AS (
        SELECT doc_id, i AS pos,
          array_to_string(w[(i*16+1):((i+1)*16)], ' ') AS chunk
        FROM t, LATERAL (SELECT unnest(range(0,
          CAST(ceil(len(w) / 16.0) AS BIGINT))) AS i) r),
      keep AS (
        SELECT doc_id, pos, chunk,
          ROW_NUMBER() OVER (PARTITION BY chunk ORDER BY doc_id, pos) AS rn
        FROM ch),
      agg AS (
        SELECT doc_id, COUNT(*) AS kept_chunks,
          string_agg(chunk, ' ' ORDER BY pos) AS new_text
        FROM keep WHERE rn = 1 GROUP BY doc_id)
      SELECT n.doc_id, n.n_chunks,
        COALESCE(a.kept_chunks, 0) AS kept_chunks,
        COALESCE(a.new_text, '') AS new_text
      FROM nch n LEFT JOIN agg a USING (doc_id)
      ORDER BY doc_id"""),
  )

  // ---------------------------------------------------------------- q70
  /** PII scan + redaction. The corpus tables carry no real PII, so the
    * query deterministically composes PII-shaped text from customer
    * columns IN BOTH ENGINES (same concatenation on each side) and
    * grades the operator under test: the regex counts and the ordered
    * three-stage mask. Patterns live in the Java-regex ∩ RE2 common
    * subset so both engines match identically.
    */
  val q70PiiRedact: QueryDef = QueryDef(
    "q70_pii_redact",
    (s, dir) => {
      val t = Tables(s, dir, "customer").select(
        col("c_custkey").as("id"),
        concat(lit("reach "), col("c_name"),
          lit(" at user"), col("c_custkey").cast("string"),
          lit("@example.org or 10."),
          (col("c_custkey") % 200).cast("string"), lit("."),
          (col("c_nationkey") % 250).cast("string"),
          lit(".7 acct 4012"),
          lpad((col("c_custkey") % 100000000).cast("string"), 12, "0"))
          .as("text"))
      t.select(col("id"),
          Pii.emailCount(col("text")).as("n_emails"),
          Pii.ipv4Count(col("text")).as("n_ips"),
          Pii.longDigitsCount(col("text")).as("n_numbers"),
          Pii.redact(col("text")).as("redacted"))
        .orderBy(col("id"))
    },
    Some(s"""
      WITH t AS (SELECT c_custkey AS id,
        'reach ' || c_name || ' at user' || CAST(c_custkey AS VARCHAR) ||
        '@example.org or 10.' || CAST(c_custkey % 200 AS VARCHAR) || '.' ||
        CAST(c_nationkey % 250 AS VARCHAR) || '.7 acct 4012' ||
        lpad(CAST(c_custkey % 100000000 AS VARCHAR), 12, '0') AS text
        FROM customer)
      SELECT id,
        CAST(len(regexp_extract_all(text, '${Pii.EmailRe}')) AS BIGINT) AS n_emails,
        CAST(len(regexp_extract_all(text, '${Pii.Ipv4Re}')) AS BIGINT) AS n_ips,
        CAST(len(regexp_extract_all(text, '${Pii.LongDigitsRe}')) AS BIGINT) AS n_numbers,
        regexp_replace(regexp_replace(regexp_replace(text,
          '${Pii.EmailRe}', '<EMAIL>', 'g'),
          '${Pii.Ipv4Re}', '<IP>', 'g'),
          '${Pii.LongDigitsRe}', '<NUM>', 'g') AS redacted
      FROM t ORDER BY id"""),
  )

  // ---------------------------------------------------------------- q71
  /** Deterministic weighted sampling (sequential Poisson): 100 docs
    * chosen proportional-to-length via hash-derived priorities — no
    * RNG, so both engines select the identical sample. u uses 20 hash
    * bits; u/w is one exact IEEE division, so even the double
    * priority column hash-matches.
    */
  val q71WeightedSample: QueryDef = QueryDef(
    "q71_weighted_sample",
    (s, dir) =>
      Scale.sequentialPoissonSample(Tables(s, dir, "documents"),
          col("doc_id").as("id"), col("text"), col("n_chars"), k = 100)
        .select(col("id").as("doc_id"), col("weight"), col("priority")),
    Some(s"""
      WITH t AS (SELECT doc_id, CAST(n_chars AS DOUBLE) AS weight,
        CAST((${ScaleQueries.FpLambda.format("text")}) % 1048576 AS DOUBLE)
          / 1048576.0 AS u
        FROM documents WHERE n_chars > 0)
      SELECT doc_id, weight, u / weight AS priority
      FROM t ORDER BY priority, doc_id LIMIT 100"""),
  )

  // ---------------------------------------------------------------- q72
  /** Inverted-index keyword search: integer TF-IDF (tf × (N − df))
    * top-50 for a three-term query. Integer scores are exact and
    * order-independent, so the ranking hash-matches across engines.
    */
  val q72TextSearch: QueryDef = QueryDef(
    "q72_text_search",
    (s, dir) =>
      Search.topK(Tables(s, dir, "documents"), col("doc_id"), col("text"),
        terms = Seq("data", "table", "query"), k = 50),
    Some("""
      WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS tk FROM documents),
      f AS (
        SELECT doc_id, tk, COUNT(*) AS tf FROM tok
        WHERE tk IN ('data', 'table', 'query') GROUP BY doc_id, tk),
      d AS (SELECT tk, COUNT(*) AS df FROM f GROUP BY tk),
      n AS (SELECT COUNT(*) AS n FROM documents)
      SELECT f.doc_id, CAST(SUM(f.tf * (n.n - d.df)) AS BIGINT) AS score,
        COUNT(*) AS terms_matched
      FROM f JOIN d USING (tk), n
      GROUP BY f.doc_id
      ORDER BY score DESC, f.doc_id LIMIT 50"""),
  )

  // ---------------------------------------------------------------- q73
  /** Sliding-window span dedup at token granularity: every token
    * covered by a 16-token window that occurred earlier anywhere in
    * the corpus is removed; first occurrences survive. The oracle
    * states the same fixed semantics with LATERAL range expansions
    * and an ANTI JOIN.
    */
  val q73SpanDedup: QueryDef = QueryDef(
    "q73_span_dedup",
    (s, dir) =>
      Dedup.spanDedup(Tables(s, dir, "documents"),
          col("doc_id"), col("text"), windowTokens = 16)
        .orderBy(col("doc_id")),
    Some("""
      WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      win AS (
        SELECT doc_id, i AS pos, array_to_string(w[(i+1):(i+16)], ' ') AS wnd
        FROM t, LATERAL (SELECT unnest(range(0,
          GREATEST(len(w) - 15, 0))) AS i) r),
      firsts AS (
        SELECT wnd, doc_id AS fdoc, pos AS fpos FROM (
          SELECT wnd, doc_id, pos,
            ROW_NUMBER() OVER (PARTITION BY wnd ORDER BY doc_id, pos) AS rn
          FROM win) WHERE rn = 1),
      dups AS (
        SELECT w.doc_id, w.pos FROM win w JOIN firsts f USING (wnd)
        WHERE (w.doc_id, w.pos) <> (f.fdoc, f.fpos)),
      covered AS (
        SELECT DISTINCT doc_id, pos + off AS tokpos
        FROM dups, LATERAL (SELECT unnest(range(0, 16)) AS off) o),
      toks AS (
        SELECT doc_id, i - 1 AS tokpos, w[i] AS tok
        FROM t, LATERAL (SELECT unnest(range(1, len(w) + 1)) AS i) r),
      kept AS (
        SELECT tk.doc_id, tk.tokpos, tk.tok
        FROM toks tk ANTI JOIN covered c
          ON tk.doc_id = c.doc_id AND tk.tokpos = c.tokpos)
      SELECT t.doc_id, len(w) AS n_tokens,
        COALESCE(k.kept_tokens, 0) AS kept_tokens,
        COALESCE(k.new_text, '') AS new_text
      FROM t LEFT JOIN (
        SELECT doc_id, COUNT(*) AS kept_tokens,
          string_agg(tok, ' ' ORDER BY tokpos) AS new_text
        FROM kept GROUP BY doc_id) k USING (doc_id)
      ORDER BY t.doc_id"""),
  )

  // ---------------------------------------------------------------- q94
  // per-process path (same convention as q47/q66)
  private val q94DocsPath =
    s"/tmp/graft_q94_docs_${ProcessHandle.current().pid()}.parquet"

  /** Partitioned-layout lifecycle: documents go through the
    * hive-partitioned parquet sink (partitioned by lang), and the
    * graded read filters one partition — the write→prune→read
    * round-trip that a date-partitioned corpus store lives on. The
    * oracle replays the filter over the original table; PlanSpec pins
    * that the scan actually prunes (PartitionFilters, one directory
    * touched) rather than filtering after a full scan.
    */
  val q94PartitionPrune: QueryDef = QueryDef(
    "q94_partition_prune",
    (s, dir) => {
      val docs = Tables(s, dir, "documents")
        .select(col("doc_id"), col("text"), col("lang"), col("source"),
          col("n_chars"))
      graft.sources.Sinks.writePartitionedParquet(docs, q94DocsPath,
        Seq("lang"))
      s.read.parquet(q94DocsPath)
        .filter(col("lang") === "en")
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
        .orderBy(col("doc_id"))
    },
    Some("""
      SELECT doc_id, lang, source, n_chars
      FROM documents WHERE lang = 'en'
      ORDER BY doc_id"""),
  )

  // ---------------------------------------------------------------- q95
  /** All-pairs sparse TF-IDF cosine similarity join (APSS) at
    * threshold 0.9, exact (no df cap). Integer weights, integer
    * numerators and squared norms, then three deterministic IEEE ops —
    * the only floating point is one sqrt, one multiply, one divide, so
    * the DuckDB replay is bit-identical. The synthetic corpus has a
    * ~31-term vocabulary, so the call site passes the dense hint
    * (strategy gates stay out of graded hot paths — the q34 lesson);
    * both strategies are spec-pinned bit-identical.
    */
  val q95SparseCosine: QueryDef = QueryDef(
    "q95_sparse_cosine",
    (s, dir) =>
      // truncate BEFORE the presentation sort: a global orderBy
      // range-samples its child to pick partition bounds, which
      // RE-EXECUTES an unmaterialized child end-to-end — the whole
      // APSS ran twice and the row's latency doubled (A/B: 6.6 s
      // unsorted vs 13.3 s sorted at sf1, bench/PROFILE_APSS_r13.txt).
      // Materializing the (output-sized) pair set makes the sample
      // and the sort read the checkpoint instead.
      graft.operators.Checkpoints.truncate(
        Search.sparseCosinePairs(Tables(s, dir, "documents"),
          col("doc_id"), col("text"), threshold = 0.9,
          dense = Some(true)))
        .orderBy(col("id_a"), col("id_b")),
    Some("""
      WITH t AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS tk
        FROM documents),
      tf AS (
        SELECT doc_id, tk, COUNT(*) AS tf
        FROM t WHERE tk <> '' GROUP BY doc_id, tk),
      dfr AS (SELECT tk, COUNT(*) AS df FROM tf GROUP BY tk),
      nn AS (SELECT COUNT(*) AS n FROM documents),
      w AS (
        SELECT doc_id, tk, tf.tf * ((SELECT n FROM nn) - dfr.df) AS w
        FROM tf JOIN dfr USING (tk)),
      norms AS (
        SELECT doc_id, sqrt(CAST(SUM(w * w) AS BIGINT)) AS norm
        FROM w GROUP BY doc_id),
      pairs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
          CAST(SUM(a.w * b.w) AS BIGINT) AS num
        FROM w a JOIN w b ON a.tk = b.tk AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id)
      SELECT id_a, id_b,
        ROUND(CAST(num AS DOUBLE) / (na.norm * nb.norm), 6) AS cosine
      FROM pairs
      JOIN norms na ON id_a = na.doc_id
      JOIN norms nb ON id_b = nb.doc_id
      WHERE ROUND(CAST(num AS DOUBLE) / (na.norm * nb.norm), 6) >= 0.9
      ORDER BY id_a, id_b"""),
  )

  // ---------------------------------------------------------------- q96
  /** Sliding-window chunking with overlap (32-token windows every 24
    * tokens) — the embedding-pipeline preprocessing fan-out. Pure
    * narrow row-local arithmetic, replayed token-for-token by the
    * oracle's list slicing.
    */
  val q96SlidingChunks: QueryDef = QueryDef(
    "q96_sliding_chunks",
    (s, dir) =>
      graft.operators.Chunker.slidingChunks(Tables(s, dir, "documents"),
          col("doc_id"), col("text"), chunkTokens = 32, strideTokens = 24)
        .orderBy(col("doc_id"), col("chunk_id")),
    Some("""
      WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      s AS (
        SELECT doc_id, w, unnest(range(0, len(w), 24)) AS start FROM t)
      SELECT doc_id, start // 24 AS chunk_id,
        len(w[start + 1 : start + 32]) AS n_tokens,
        array_to_string(w[start + 1 : start + 32], ' ') AS chunk
      FROM s
      ORDER BY doc_id, chunk_id"""),
  )

  // ---------------------------------------------------------------- q98
  /** Column profiler over orders — row count, nulls, exact distinct,
    * min/max per column in ONE scan (a single multi-distinct global
    * aggregate; the per-column UNION the oracle uses would be k scans).
    * Non-portable types are normalized at the call site: the timestamp
    * profiles as integer microseconds, and the double price column is
    * profiled as exact cents — so every min/max renders identically in
    * both engines.
    */
  val q98Profile: QueryDef = QueryDef(
    "q98_profile",
    (s, dir) =>
      graft.operators.Stats.profile(Tables(s, dir, "orders"), Seq(
          "o_orderkey" -> col("o_orderkey"),
          "o_custkey" -> col("o_custkey"),
          "o_orderstatus" -> col("o_orderstatus"),
          "o_orderpriority" -> col("o_orderpriority"),
          // NTZ -> instant is exact under the UTC session timezone,
          // matching the oracle's naive-as-UTC epoch_ns
          "o_orderdate_us" ->
            expr("unix_micros(cast(o_orderdate as timestamp))"),
          "o_totalprice_cents" ->
            round(col("o_totalprice") * 100, 0).cast("long")))
        .orderBy(col("col_name")),
    Some("""
      WITH c AS (
        SELECT 'o_orderkey' AS col_name, o_orderkey AS v FROM orders
        UNION ALL
        SELECT 'o_custkey', o_custkey FROM orders
        UNION ALL
        SELECT 'o_orderdate_us',
          CAST(epoch_ns(o_orderdate) // 1000 AS BIGINT) FROM orders
        UNION ALL
        SELECT 'o_totalprice_cents',
          CAST(ROUND(o_totalprice * 100.0) AS BIGINT) FROM orders),
      s AS (
        SELECT 'o_orderstatus' AS col_name, o_orderstatus AS v FROM orders
        UNION ALL
        SELECT 'o_orderpriority', o_orderpriority FROM orders),
      num AS (
        SELECT col_name, COUNT(*) AS n_rows,
          CAST(COUNT(*) - COUNT(v) AS BIGINT) AS n_nulls,
          COUNT(DISTINCT v) AS n_distinct,
          CAST(MIN(v) AS VARCHAR) AS min_val,
          CAST(MAX(v) AS VARCHAR) AS max_val
        FROM c GROUP BY col_name),
      str AS (
        SELECT col_name, COUNT(*) AS n_rows,
          CAST(COUNT(*) - COUNT(v) AS BIGINT) AS n_nulls,
          COUNT(DISTINCT v) AS n_distinct,
          MIN(v) AS min_val, MAX(v) AS max_val
        FROM s GROUP BY col_name)
      SELECT * FROM num UNION ALL SELECT * FROM str
      ORDER BY col_name"""),
  )

  // ---------------------------------------------------------------- q99
  /** SRP hyperplanes replayed as SQL literals: the same
    * java.util.Random(seed) Gaussian sequence [[graft.plans.SrpSignature]]
    * derives its planes from, formatted shortest-round-trip so DuckDB
    * parses back the identical doubles. Plane-major order, dim fixed
    * to the testdata's 64.
    */
  private def srpPlaneSql(seed: Long, nPlanes: Int, dim: Int): String = {
    val rnd = new java.util.Random(seed)
    val planes = Array.fill(nPlanes)(Array.fill(dim)(rnd.nextGaussian()))
    planes.zipWithIndex.map { case (pl, p) =>
      s"[${pl.mkString(", ")}] AS p$p"
    }.mkString(", ")
  }

  /** The per-doc 3-gram list (occurrence order, empty tokens KEPT —
    * Spark split(text,' ',-1) semantics) in each dialect.
    */
  private val sparkGrams =
    "transform(sequence(1, size(t) - 2), i -> concat_ws(' ', slice(t, i, 3)))"
  private val duckGrams =
    "[t[i] || ' ' || t[i+1] || ' ' || t[i+2] for i in range(1, len(t) - 1)]"

  /** The SQL entry surface, graded end-to-end: temp-view registration,
    * raw `spark.sql` text, and ALL EIGHT graft-native Catalyst
    * expressions of GraftExtensions' function registry called from SQL
    * — a registry regression on any FunctionIdentifier fails this
    * oracle row. Each function is anchored in the hash-compared output:
    *  - rolling_hash: min fingerprint over the corpus (FpLambda replay);
    *  - shingle_hashes: Σ distinct-3-gram counts (string-level replay);
    *  - token_ngram_stats: Σ bigram occurrences (.n_grams field);
    *  - minhash_signature: Σ signature widths over shingle arrays
    *    (values are XXH64-derived, not SQL-replayable — the width and
    *    the nested shingle_hashes call still pin the wiring; the
    *    signature VALUES are graded by spec + q35's exact oracle);
    *  - kanji_address_key: the q20 golden quintet + the invalid case;
    *  - dot_product: min/max self-dot over embeddings (left-fold
    *    list_reduce replay, q80's arithmetic);
    *  - srp_signature: Σ sign-LSH buckets, planes replayed from the
    *    identical seeded Gaussian sequence as SQL literals;
    *  - bloom_any_contain: decontamination composition — bloom built
    *    from the seed docs' leading 3-grams prefilters, the exact
    *    gram-overlap verify makes the count FP-free, and a bloom
    *    false NEGATIVE (the one thing a bloom must never do) would
    *    drop the count below the oracle's exact replay.
    */
  val q99SqlSurface: QueryDef = QueryDef(
    "q99_sql_surface",
    (s, dir) => {
      graft.plans.GraftExtensions.register(s)
      Tables(s, dir, "documents").createOrReplaceTempView("documents_v")
      Tables(s, dir, "embeddings").createOrReplaceTempView("embeddings_v")
      // bloom over the seed docs' leading 3-grams — same first-10
      // slice the SQL takes, hashed exactly as shingle_hashes hashes
      // grams (a 1-gram-of-3-tokens evalImpl call IS that hash)
      import org.apache.spark.unsafe.types.UTF8String
      val seedGrams = Tables(s, dir, "documents")
        .filter(col("doc_id") % 997 === 0).select(col("text"))
        .collect().map(_.getString(0))
        .flatMap { text =>
          val toks = text.split(" ", -1)
          (0 to toks.length - 3).take(10)
            .map(i => toks.slice(i, i + 3).mkString(" "))
        }
      val bloom = org.apache.spark.util.sketch.BloomFilter
        .create(math.max(seedGrams.length, 1), 0.01)
      seedGrams.foreach { g =>
        bloom.putLong(graft.plans.ShingleHashes
          .evalImpl(UTF8String.fromString(g), 3).getLong(0))
      }
      val bloomHex = graft.plans.BloomAnyContain.serialize(bloom)
        .map("%02X".format(_)).mkString
      val srpBucket = (0 until 8)
        .map(p => s"CAST(element_at(sg, ${p + 1}) AS BIGINT) * ${1L << p}")
        .mkString(" + ")
      s.sql(s"""
        WITH toks AS (
          SELECT doc_id, text, split(text, ' ', -1) AS t FROM documents_v),
        g AS (
          SELECT doc_id, text, $sparkGrams AS grams
          FROM toks WHERE size(t) >= 3),
        seed AS (
          SELECT flatten(collect_list(slice(grams, 1, 10))) AS sg
          FROM g WHERE doc_id % 997 = 0),
        srp AS (
          SELECT srp_signature(embedding, 8, 42) AS sg FROM embeddings_v)
        SELECT 'bigram_occ_sum' AS metric,
          SUM(token_ngram_stats(text, 2).n_grams) AS vlong,
          CAST(NULL AS DOUBLE) AS vdouble, CAST(NULL AS STRING) AS vstr
        FROM documents_v
        UNION ALL
        SELECT 'bloom_verified_hits', COUNT(*), CAST(NULL AS DOUBLE),
          CAST(NULL AS STRING)
        FROM g, seed
        WHERE bloom_any_contain(shingle_hashes(text, 3), X'$bloomHex')
          AND arrays_overlap(grams, seed.sg)
        UNION ALL
        SELECT 'dot_self_min', CAST(NULL AS BIGINT),
          MIN(ROUND(dot_product(embedding, embedding), 6)),
          CAST(NULL AS STRING)
        FROM embeddings_v
        UNION ALL
        SELECT 'dot_self_max', CAST(NULL AS BIGINT),
          MAX(ROUND(dot_product(embedding, embedding), 6)),
          CAST(NULL AS STRING)
        FROM embeddings_v
        UNION ALL
        SELECT concat('kanji_', CAST(id AS STRING)), CAST(NULL AS BIGINT),
          CAST(NULL AS DOUBLE), kanji_address_key(addr)
        FROM VALUES
          (1, '東京都渋谷区恵比寿南１'), (2, '東京都渋谷区恵比寿南１２'),
          (3, '東京都渋谷区神泉町'), (4, '東京都渋谷区千駄ヶ谷１'),
          (5, '東京都新宿区西新宿２１'), (6, 'invalid_address')
          AS t(id, addr)
        UNION ALL
        SELECT 'minhash_width_sum',
          SUM(size(minhash_signature(shingle_hashes(text, 3), 16))),
          CAST(NULL AS DOUBLE), CAST(NULL AS STRING)
        FROM documents_v
        UNION ALL
        SELECT 'rolling_hash_min', MIN(rolling_hash(text)),
          CAST(NULL AS DOUBLE), CAST(NULL AS STRING)
        FROM documents_v
        UNION ALL
        SELECT 'shingle_count_sum', SUM(size(shingle_hashes(text, 3))),
          CAST(NULL AS DOUBLE), CAST(NULL AS STRING)
        FROM documents_v
        UNION ALL
        SELECT 'srp_bucket_sum', SUM($srpBucket), CAST(NULL AS DOUBLE),
          CAST(NULL AS STRING)
        FROM srp
        ORDER BY metric""")
    },
    Some {
      val srpDots = (0 until 8).map { p =>
        val dot = "list_reduce([0.0::DOUBLE] || [CAST(embedding[i] AS DOUBLE)" +
          s" * pl.p$p[i] for i in range(1, len(embedding) + 1)], (x, v) -> x + v)"
        s"CASE WHEN $dot >= 0 THEN ${1L << p} ELSE 0 END"
      }.mkString(" + ")
      val selfDot = "list_reduce([0.0::DOUBLE] || [CAST(x AS DOUBLE) * " +
        "CAST(x AS DOUBLE) for x in embedding], (a, v) -> a + v)"
      s"""
      WITH toks AS (
        SELECT doc_id, text, string_split(text, ' ') AS t FROM documents),
      g AS (
        SELECT doc_id, text, $duckGrams AS grams
        FROM toks WHERE len(t) >= 3),
      seed AS (
        SELECT flatten(list(grams[1:10])) AS sg
        FROM g WHERE doc_id % 997 = 0),
      pl AS (SELECT ${srpPlaneSql(42L, 8, 64)})
      SELECT 'bigram_occ_sum' AS metric,
        CAST(SUM(GREATEST(len(list_filter(string_split(text, ' '),
          x -> x <> '')) - 1, 0)) AS BIGINT) AS vlong,
        CAST(NULL AS DOUBLE) AS vdouble, CAST(NULL AS VARCHAR) AS vstr
      FROM documents
      UNION ALL
      SELECT 'bloom_verified_hits', COUNT(*), CAST(NULL AS DOUBLE),
        CAST(NULL AS VARCHAR)
      FROM g, seed WHERE list_has_any(grams, seed.sg)
      UNION ALL
      SELECT 'dot_self_min', CAST(NULL AS BIGINT),
        MIN(ROUND($selfDot, 6)), CAST(NULL AS VARCHAR)
      FROM embeddings
      UNION ALL
      SELECT 'dot_self_max', CAST(NULL AS BIGINT),
        MAX(ROUND($selfDot, 6)), CAST(NULL AS VARCHAR)
      FROM embeddings
      UNION ALL
      SELECT 'kanji_' || CAST(id AS VARCHAR), CAST(NULL AS BIGINT),
        CAST(NULL AS DOUBLE), join_key
      FROM (VALUES
        (1, '東京都渋谷区恵比寿南一丁目'),
        (2, '東京都渋谷区恵比寿南十二丁目'),
        (3, '東京都渋谷区神泉町'),
        (4, '東京都渋谷区千駄ケ谷一丁目'),
        (5, '東京都新宿区西新宿二十一丁目'),
        (6, '')) AS t(id, join_key)
      UNION ALL
      SELECT 'minhash_width_sum', 16 * COUNT(*), CAST(NULL AS DOUBLE),
        CAST(NULL AS VARCHAR)
      FROM documents
      UNION ALL
      SELECT 'rolling_hash_min',
        MIN(${ScaleQueries.FpLambda.format("text")}),
        CAST(NULL AS DOUBLE), CAST(NULL AS VARCHAR)
      FROM documents
      UNION ALL
      SELECT 'shingle_count_sum',
        CAST(SUM(CASE WHEN len(t) >= 3
          THEN len(list_distinct($duckGrams)) ELSE 0 END) AS BIGINT),
        CAST(NULL AS DOUBLE), CAST(NULL AS VARCHAR)
      FROM toks
      UNION ALL
      SELECT 'srp_bucket_sum',
        CAST(SUM($srpDots) AS BIGINT), CAST(NULL AS DOUBLE),
        CAST(NULL AS VARCHAR)
      FROM embeddings, pl
      ORDER BY metric"""
    },
  )

  val all: Seq[QueryDef] = Seq(q68DedupClusters, q69ChunkDedup, q70PiiRedact,
    q71WeightedSample, q72TextSearch, q73SpanDedup, q94PartitionPrune,
    q95SparseCosine, q96SlidingChunks, q98Profile, q99SqlSurface)
}
