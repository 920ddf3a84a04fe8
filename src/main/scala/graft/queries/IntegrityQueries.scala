package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Column

/** Round-8 closing wave: replica-sync fingerprints (q176), the 2-D
  * Pareto frontier (q177), weighted shortest paths (q178), positional
  * phrase search (q179), and cluster labelling by distinguishing
  * terms (q180). Oracles replay the identical integer arithmetic in
  * DuckDB — the fingerprint one replays the rolling-hash/hash32 chain
  * end to end, the skyline one grades the sweep against an
  * INDEPENDENT quadratic NOT EXISTS formulation of dominance.
  */
object IntegrityQueries {

  /** hash32 of `x` carried through 4 CTE steps named <p>0..<p>f,
    * keeping `carry` columns alongside. Ends without a trailing comma.
    */
  private def hash32Ctes(p: String, from: String, x: String,
      carry: Seq[String]): String = {
    val steps = graft.functions.PortableHash.hash32SqlSteps(x)
    val keep = if (carry.isEmpty) "" else carry.mkString(", ", ", ", "")
    s"""      ${p}0 AS (SELECT ${steps(0)} AS h$keep FROM $from),
      ${p}1 AS (SELECT ${steps(1)} AS h$keep FROM ${p}0),
      ${p}2 AS (SELECT ${steps(2)} AS h$keep FROM ${p}1),
      ${p}f AS (SELECT ${steps(3)} AS h$keep FROM ${p}2)"""
  }

  // --------------------------------------------------------------- q176
  /** The canonical lineitem identity columns, both dialects: integer
    * key, line number, floored quantity, epoch seconds of the ship
    * date — every piece renders to identical digit strings in Spark
    * and DuckDB (floor-then-cast sidesteps DuckDB's round-on-cast;
    * epoch seconds sidestep timestamp formatting).
    */
  private def canonCols: Seq[Column] = Seq(
    col("l_orderkey"), col("l_linenumber"),
    floor(col("l_quantity")).cast("long"),
    // parquet reads the column as TIMESTAMP_NTZ; the session is pinned
    // UTC, so the cast is an identity re-tag and epoch_ns replays it
    unix_micros(col("l_shipdate").cast("timestamp")))

  private val canonSql =
    "l_orderkey::VARCHAR || '|' || l_linenumber::VARCHAR || '|' || " +
      "CAST(floor(l_quantity) AS BIGINT)::VARCHAR || '|' || " +
      "CAST(epoch_ns(l_shipdate) // 1000 AS BIGINT)::VARCHAR"

  /** Fingerprint cells (bucket, n, sh, s32) for the lineitem subset
    * `where`, as CTEs prefixed `p`.
    */
  private def fpCtes(p: String, where: String): String = s"""
      ${p}rh AS (SELECT ${ScaleQueries.FpLambda.format(canonSql)} AS rh
        FROM lineitem WHERE $where),
${hash32Ctes(s"${p}h", s"${p}rh", "rh", Seq("rh"))},
      ${p}fp AS (SELECT h % 64 AS bucket, COUNT(*) AS n,
        CAST(SUM(rh) AS BIGINT) AS sh, CAST(SUM(h) AS BIGINT) AS s32
        FROM ${p}hf GROUP BY 1)"""

  /** Replica verification end to end: fingerprint the lineitem table
    * and a replica missing ~15 rows (the sync-drift fault model:
    * a partial upload), then emit exactly the mismatched buckets with
    * both sides' (count, Σ rolling-hash, Σ hash32) — what a
    * cross-cluster copy job would transfer (64 tiny rows per side)
    * and compare to decide WHICH slivers to re-ship. The oracle
    * replays the full rolling-hash → hash32 → bucket → three-monoid
    * chain on both sides in DuckDB, so a single bit of drift anywhere
    * in [[graft.operators.Integrity]] breaks the hash row.
    */
  val q176SyncFingerprint: QueryDef = QueryDef(
    "q176_sync_fingerprint",
    (s, dir) => {
      import graft.operators.Integrity
      val li = Tables(s, dir, "lineitem")
      val replica = li.filter(
        !(col("l_orderkey") % 1000 === 7 && col("l_linenumber") === 1))
      val a = Integrity.bucketFingerprints(li,
        Integrity.rowHash(canonCols), 64)
      val b = Integrity.bucketFingerprints(replica,
        Integrity.rowHash(canonCols), 64)
      Integrity.diffBuckets(a, b).orderBy(col("bucket"))
    },
    Some(s"""
      WITH
${fpCtes("a", "TRUE")},
${fpCtes("b", "NOT (l_orderkey % 1000 = 7 AND l_linenumber = 1)")}
      SELECT COALESCE(a.bucket, b.bucket) AS bucket,
        COALESCE(a.n, 0) AS n_a, COALESCE(b.n, 0) AS n_b,
        COALESCE(a.sh, 0) AS sum_h_a, COALESCE(b.sh, 0) AS sum_h_b,
        COALESCE(a.s32, 0) AS sum_h32_a, COALESCE(b.s32, 0) AS sum_h32_b
      FROM afp a FULL OUTER JOIN bfp b ON a.bucket = b.bucket
      WHERE COALESCE(a.n, 0) <> COALESCE(b.n, 0)
         OR COALESCE(a.sh, 0) <> COALESCE(b.sh, 0)
         OR COALESCE(a.s32, 0) <> COALESCE(b.s32, 0)
      ORDER BY bucket"""),
  )

  // --------------------------------------------------------------- q177
  /** The quantity-vs-price Pareto frontier of lineitem: the line
    * items no other item beats on BOTH "at least as large a quantity"
    * and "at least as cheap" (maximize quantity ⇒ negate into the
    * minimize-minimize frontier) — the bulk-buying efficiency
    * frontier. The oracle is deliberately the OTHER formulation of
    * dominance — a quadratic NOT EXISTS over the per-quantity cells —
    * so the sweep-line reduction in [[graft.operators.Skyline]] is
    * graded against the definition, not against itself.
    */
  val q177Skyline: QueryDef = QueryDef(
    "q177_skyline",
    (s, dir) => {
      val li = Tables(s, dir, "lineitem")
      graft.operators.Skyline.frontierMin(li,
          -floor(col("l_quantity")),
          floor(col("l_extendedprice")))
        .select((-col("x")).as("quantity"), col("y").as("min_price"))
        .orderBy(col("quantity"))
    },
    Some("""
      WITH g AS (
        SELECT CAST(0 - floor(l_quantity) AS BIGINT) AS x,
          CAST(MIN(floor(l_extendedprice)) AS BIGINT) AS y
        FROM lineitem GROUP BY 1)
      SELECT 0 - x AS quantity, y AS min_price FROM g a
      WHERE NOT EXISTS (
        SELECT 1 FROM g b
        WHERE b.x <= a.x AND b.y <= a.y AND (b.x < a.x OR b.y < a.y))
      ORDER BY quantity"""),
  )

  // --------------------------------------------------------------- q178
  /** Weighted shortest paths on the customer–supplier bipartite graph
    * (edge weight: minimum quantity ever shipped between the pair —
    * an integer affinity), seeds every 100th customer, three
    * synchronous rounds. The oracle unrolls the same Bellman–Ford
    * recurrence (min-merge of last round's distances with last
    * round's relaxations) as three CTE rounds — the q158 unrolled-BFS
    * pattern generalized to weights; the graded aggregate
    * (per-distance count and node extremes) pins every node's exact
    * distance through the min/max.
    */
  val q178SsspWeighted: QueryDef = QueryDef(
    "q178_sssp_weighted",
    (s, dir) => {
      val o = Tables(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"))
      val l = Tables(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"), col("l_quantity"))
      val cs = o.join(l, col("o_orderkey") === col("l_orderkey"))
        .select(concat(lit("c"), col("o_custkey")).as("src"),
          concat(lit("s"), col("l_suppkey")).as("dst"),
          floor(col("l_quantity")).cast("long").as("w"))
      val edges = cs.unionByName(cs.select(col("dst").as("src"),
        col("src").as("dst"), col("w")))
      val seeds = Tables(s, dir, "customer")
        .filter(col("c_custkey") % 100 === 0)
        .select(concat(lit("c"), col("c_custkey")).as("node"))
      graft.operators.Graph.ssspWeighted(edges, seeds, maxIters = 3)
        .groupBy(col("dist"))
        .agg(count(lit(1)).as("n"), min(col("node")).as("first_node"),
          max(col("node")).as("last_node"))
        .orderBy(col("dist"))
    },
    Some("""
      WITH cs AS (
        SELECT 'c' || o_custkey AS src, 's' || l_suppkey AS dst,
          CAST(floor(l_quantity) AS BIGINT) AS w
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
      eb AS (SELECT src, dst, w FROM cs
             UNION ALL SELECT dst, src, w FROM cs),
      e AS (SELECT src, dst, MIN(w) AS w FROM eb GROUP BY src, dst),
      d0 AS (SELECT DISTINCT 'c' || c_custkey AS node, 0 AS dist
        FROM customer WHERE c_custkey % 100 = 0),
      c1 AS (SELECT e.dst AS node, MIN(d0.dist + e.w) AS nd
        FROM d0 JOIN e ON d0.node = e.src GROUP BY e.dst),
      d1 AS (SELECT node, MIN(d) AS dist FROM (
          SELECT node, dist AS d FROM d0
          UNION ALL SELECT node, nd AS d FROM c1) GROUP BY node),
      c2 AS (SELECT e.dst AS node, MIN(d1.dist + e.w) AS nd
        FROM d1 JOIN e ON d1.node = e.src GROUP BY e.dst),
      d2 AS (SELECT node, MIN(d) AS dist FROM (
          SELECT node, dist AS d FROM d1
          UNION ALL SELECT node, nd AS d FROM c2) GROUP BY node),
      c3 AS (SELECT e.dst AS node, MIN(d2.dist + e.w) AS nd
        FROM d2 JOIN e ON d2.node = e.src GROUP BY e.dst),
      d3 AS (SELECT node, MIN(d) AS dist FROM (
          SELECT node, dist AS d FROM d2
          UNION ALL SELECT node, nd AS d FROM c3) GROUP BY node)
      SELECT CAST(dist AS BIGINT) AS dist, COUNT(*) AS n,
        MIN(node) AS first_node, MAX(node) AS last_node
      FROM d3 GROUP BY dist ORDER BY dist"""),
  )

  // --------------------------------------------------------------- q179
  /** Phrase search, self-targeted: find the corpus's most frequent
    * trigram (count desc, then lexical — the q99 gram conventions:
    * space-split, empties kept), then run [[graft.operators.Search
    * .phraseOccurrences]] on it and report document and occurrence
    * counts with id extremes. The phrase pick is a driver-side
    * planner step (one row), mirroring how a real caller supplies the
    * query string; the oracle recomputes BOTH stages — so the graded
    * row breaks if either the gram statistics or the positional-join
    * assembly drifts.
    */
  val q179PhraseSearch: QueryDef = QueryDef(
    "q179_phrase_search",
    (s, dir) => {
      val docs = Tables(s, dir, "documents")
      val top = docs
        .select(split(col("text"), " ", -1).as("t"))
        .filter(size(col("t")) >= 3)
        .select(explode(expr(
          "transform(sequence(1, size(t) - 2), " +
            "i -> concat_ws(' ', slice(t, i, 3)))")).as("g"))
        .groupBy(col("g")).agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("g"))
        .limit(1).collect()(0).getString(0)
      val phrase = top.split(" ", -1).toSeq
      graft.operators.Search
        .phraseOccurrences(docs, col("doc_id"), col("text"), phrase)
        .agg(countDistinct(col("id")).as("n_docs"),
          count(lit(1)).as("n_occ"),
          min(col("id")).as("first_doc"), max(col("id")).as("last_doc"))
        .select(lit(top).as("phrase"), col("n_docs"), col("n_occ"),
          col("first_doc"), col("last_doc"))
    },
    Some("""
      WITH t AS (SELECT doc_id, string_split(text, ' ') AS t
        FROM documents),
      g AS (SELECT doc_id,
          unnest([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                  for i in range(1, len(t) - 1)]) AS g
        FROM t),
      top AS (SELECT g FROM g GROUP BY g
        ORDER BY COUNT(*) DESC, g LIMIT 1),
      occ AS (SELECT doc_id FROM g JOIN top ON g.g = top.g)
      SELECT (SELECT g FROM top) AS phrase,
        COUNT(DISTINCT doc_id) AS n_docs, COUNT(*) AS n_occ,
        MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
      FROM occ"""),
  )

  // --------------------------------------------------------------- q180
  /** Cluster labelling: top-5 distinguishing terms per source by the
    * integer c-TF-IDF of [[graft.operators.CorpusStats
    * .distinctiveTerms]] — the routine step after any clustering
    * (k-means q106, components q68, semantic cells q80): name the
    * clusters. The oracle replays cells → cluster-df → linear-idf
    * score → per-cluster ROW_NUMBER in SQL.
    */
  val q180ClusterTerms: QueryDef = QueryDef(
    "q180_cluster_terms",
    (s, dir) =>
      graft.operators.CorpusStats
        .distinctiveTerms(Tables(s, dir, "documents"),
          col("source"), col("text"), topK = 5)
        .orderBy(col("cluster"), col("rank")),
    Some("""
      WITH cells AS (
        SELECT cluster, term, COUNT(*) AS tf FROM (
          SELECT source AS cluster,
            unnest(string_split(text, ' ')) AS term
          FROM documents)
        WHERE term <> '' GROUP BY 1, 2),
      cdf AS (SELECT term, COUNT(*) AS cdf FROM cells GROUP BY term),
      c AS (SELECT COUNT(DISTINCT cluster) AS n_clusters FROM cells),
      scored AS (
        SELECT cluster, term, tf, cdf.cdf,
          tf * (c.n_clusters - cdf.cdf) AS score,
          ROW_NUMBER() OVER (PARTITION BY cluster
            ORDER BY tf * (c.n_clusters - cdf.cdf) DESC, term) AS rank
        FROM cells JOIN cdf USING (term) CROSS JOIN c)
      SELECT cluster, rank, term, tf, cdf, score
      FROM scored WHERE rank <= 5
      ORDER BY cluster, rank"""),
  )

  val all: Seq[QueryDef] = Seq(q176SyncFingerprint, q177Skyline,
    q178SsspWeighted, q179PhraseSearch, q180ClusterTerms)
}
