package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** Round-8 wave B: association mining (q181), the lossless
  * edit-distance similarity join (q182), CUPED experiment readout
  * (q183), last-touch attribution (q184), and k-core extraction
  * (q185). The q182 oracle is a brute-force quadratic — grading
  * exactly the losslessness of the prefix filter; q183 replays
  * Spark's trunc-toward-zero `div` explicitly (DuckDB `//` floors);
  * q184 grades against DuckDB's NATIVE ASOF LEFT JOIN.
  */
object AssociationQueries {

  /** trunc-toward-zero integer division in DuckDB (`//` floors;
    * Spark's `div` truncates). Denominator must be positive.
    */
  private def tdiv(a: String, b: String): String =
    s"(CASE WHEN ($a) >= 0 THEN ($a) // ($b) ELSE -((-($a)) // ($b)) END)"

  // --------------------------------------------------------------- q181
  /** Frequent part pairs across orders with exact ppm
    * confidence/lift ([[graft.operators.Association]]): the baskets
    * are orders, the items parts; support ≥ 2, top 20 by support.
    * Everything integer — the oracle replays the same pair join and
    * ppm divisions (all non-negative, so `//` = `div`).
    */
  val q181ItemPairs: QueryDef = QueryDef(
    "q181_item_pairs",
    (s, dir) =>
      graft.operators.Association.frequentItemPairs(
        Tables(s, dir, "lineitem"),
        col("l_orderkey"), col("l_partkey"),
        minSupport = 2, topK = 20),
    Some("""
      WITH bi AS (SELECT DISTINCT l_orderkey AS b, l_partkey AS i
        FROM lineitem),
      sz AS (SELECT b FROM bi GROUP BY b HAVING COUNT(*) <= 1000),
      capped AS (SELECT bi.b, bi.i FROM bi JOIN sz USING (b)),
      pairs AS (
        SELECT a.i AS item_a, c.i AS item_b, COUNT(*) AS support
        FROM capped a JOIN capped c ON a.b = c.b AND a.i < c.i
        GROUP BY 1, 2 HAVING COUNT(*) >= 2),
      itemn AS (SELECT i, COUNT(*) AS n FROM capped GROUP BY i),
      tot AS (SELECT COUNT(*) AS n_baskets FROM sz)
      SELECT item_a, item_b, support, na.n AS n_a, nb.n AS n_b,
        (1000000 * support) // na.n AS conf_ab_ppm,
        (1000000 * support) // nb.n AS conf_ba_ppm,
        (1000000 * support * tot.n_baskets) // (na.n * nb.n) AS lift_ppm
      FROM pairs
      JOIN itemn na ON pairs.item_a = na.i
      JOIN itemn nb ON pairs.item_b = nb.i
      CROSS JOIN tot
      ORDER BY support DESC, item_a, item_b LIMIT 20"""),
  )

  // --------------------------------------------------------------- q182
  /** The edit-distance join over 24-char document prefixes (d ≤ 2,
    * q = 2): [[graft.operators.StringJoin.editDistancePairs]] runs
    * the prefix-filtered plan; the oracle computes the SAME answer by
    * brute force (every pair, native levenshtein) — so a single pair
    * lost by the filter, or any Spark/DuckDB Levenshtein divergence,
    * fails the hash row.
    */
  val q182EditDistanceJoin: QueryDef = QueryDef(
    "q182_edit_distance_join",
    (s, dir) =>
      // truncate before the presentation sort (round-14 audit): the
      // range sampler re-executes the unmaterialized prefix-filter join
      graft.operators.Checkpoints.truncate(
        graft.operators.StringJoin.editDistancePairs(
          Tables(s, dir, "documents")
            .select(col("doc_id"), substring(col("text"), 1, 24).as("s")),
          col("doc_id"), col("s"), maxDist = 2, q = 2))
        .orderBy(col("id_a"), col("id_b")),
    Some("""
      WITH p AS (SELECT doc_id, substr(text, 1, 24) AS s
        FROM documents WHERE len(substr(text, 1, 24)) >= 6)
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        CAST(levenshtein(a.s, b.s) AS BIGINT) AS dist
      FROM p a JOIN p b ON a.doc_id < b.doc_id
      WHERE abs(len(a.s) - len(b.s)) <= 2
        AND levenshtein(a.s, b.s) <= 2
      ORDER BY id_a, id_b"""),
  )

  // --------------------------------------------------------------- q183
  /** CUPED readout over a synthetic assignment (variant =
    * user_id mod 2): units are users, the metric their total purchase
    * value in whole currency units, the covariate their total click
    * value — correlated by construction (active users do more of
    * both), which is the precondition that makes CUPED bite. The
    * oracle replays the five-sum aggregate and every trunc-div.
    */
  val q183Cuped: QueryDef = QueryDef(
    "q183_cuped",
    (s, dir) => {
      val units = Tables(s, dir, "events")
        .groupBy(col("user_id"))
        .agg(
          sum(when(col("event_type") === "purchase",
            floor(col("value")).cast("long")).otherwise(0L)).as("y"),
          sum(when(col("event_type") === "click",
            floor(col("value")).cast("long")).otherwise(0L)).as("x"))
      graft.ml.Experiment.cupedReadout(units,
          pmod(col("user_id"), lit(2L)).as("variant"),
          col("y"), col("x"))
        .orderBy(col("variant"))
    },
    Some(s"""
      WITH units AS (
        SELECT user_id,
          CAST(COALESCE(SUM(CASE WHEN event_type = 'purchase'
            THEN CAST(floor(value) AS BIGINT) END), 0) AS BIGINT) AS y,
          CAST(COALESCE(SUM(CASE WHEN event_type = 'click'
            THEN CAST(floor(value) AS BIGINT) END), 0) AS BIGINT) AS x
        FROM events GROUP BY user_id),
      pv AS (
        SELECT ((user_id % 2) + 2) % 2 AS variant, COUNT(*) AS n_v,
          CAST(SUM(y) AS BIGINT) AS sy_v, CAST(SUM(x) AS BIGINT) AS sx_v,
          CAST(SUM(x * x) AS BIGINT) AS sxx_v,
          CAST(SUM(x * y) AS BIGINT) AS sxy_v
        FROM units GROUP BY 1),
      pooled AS (
        SELECT CAST(SUM(n_v) AS BIGINT) AS n,
          CAST(SUM(sy_v) AS BIGINT) AS sy,
          CAST(SUM(sx_v) AS BIGINT) AS sx,
          CAST(SUM(sxx_v) AS BIGINT) AS sxx,
          CAST(SUM(sxy_v) AS BIGINT) AS sxy FROM pv),
      th AS (
        SELECT n, sx,
          CASE WHEN n * sxx - sx * sx = 0 THEN 0
            ELSE ${tdiv("1000000 * (n * sxy - sx * sy)",
              "n * sxx - sx * sx")} END AS theta_ppm
        FROM pooled)
      SELECT variant, n_v,
        ${tdiv("1000000 * sy_v", "n_v")} AS mean_y_ppm,
        ${tdiv("1000000 * sx_v", "n_v")} AS mean_x_ppm,
        theta_ppm,
        ${tdiv("1000000 * sy_v", "n_v")} - ${tdiv(
          s"theta_ppm * (${tdiv("1000000 * sx_v", "n_v")} - ${tdiv(
            "1000000 * sx", "n")})", "1000000")} AS adj_mean_y_ppm
      FROM pv CROSS JOIN th
      ORDER BY variant"""),
  )

  // --------------------------------------------------------------- q184
  /** Last-touch attribution: every purchase is credited to the most
    * recent click/view AT OR BEFORE it by the same user — the
    * [[graft.operators.AsOfJoin]] backward join (q50's operator)
    * composed into the marketing readout: conversions, revenue, and
    * reached users per touch type, 'none' for purchases with no prior
    * touch. Touches pre-aggregate to one row per (user, instant)
    * (max type — the as-of tie contract needs uniqueness); the oracle
    * is DuckDB's native ASOF LEFT JOIN.
    */
  val q184Attribution: QueryDef = QueryDef(
    "q184_attribution",
    (s, dir) => {
      val ev = Tables(s, dir, "events")
      val touches = ev
        .filter(col("event_type").isin("click", "view"))
        .groupBy(col("user_id"), col("ts"))
        .agg(max(col("event_type")).as("touch"))
      val conv = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"),
          floor(col("value")).cast("long").as("rev"))
      graft.operators.AsOfJoin
        .backward(conv, touches, Seq("user_id"), "ts", Seq("touch"))
        .groupBy(coalesce(col("touch"), lit("none")).as("touch"))
        .agg(count(lit(1)).as("n_conv"), sum(col("rev")).as("revenue"),
          countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("touch"))
    },
    Some("""
      WITH touches AS (
        SELECT user_id, ts, MAX(event_type) AS touch FROM events
        WHERE event_type IN ('click', 'view') GROUP BY 1, 2),
      conv AS (
        SELECT user_id, ts, CAST(floor(value) AS BIGINT) AS rev
        FROM events WHERE event_type = 'purchase'),
      j AS (
        SELECT c.user_id, c.rev, t.touch
        FROM conv c ASOF LEFT JOIN touches t
          ON c.user_id = t.user_id AND t.ts <= c.ts)
      SELECT COALESCE(touch, 'none') AS touch, COUNT(*) AS n_conv,
        CAST(SUM(rev) AS BIGINT) AS revenue,
        COUNT(DISTINCT user_id) AS n_users
      FROM j GROUP BY 1 ORDER BY 1"""),
  )

  // --------------------------------------------------------------- q185
  /** 12-core of the customer–supplier graph after three synchronous
    * peels ([[graft.operators.Graph.kCore]]), reported as the degree
    * histogram of the survivors. The oracle unrolls the same three
    * peel rounds as CTEs (the q158/q178 unrolled-iteration pattern);
    * k = 12 actually deletes nodes on this graph (lower k leaves it
    * intact — degrees here are dense).
    */
  val q185KCore: QueryDef = QueryDef(
    "q185_kcore",
    (s, dir) => {
      val o = Tables(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"))
      val l = Tables(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"))
      val cs = o.join(l, col("o_orderkey") === col("l_orderkey"))
        .select(concat(lit("c"), col("o_custkey")).as("src"),
          concat(lit("s"), col("l_suppkey")).as("dst"))
      graft.operators.Graph.kCore(cs, k = 12, maxPeels = 3)
        .groupBy(col("deg"))
        .agg(count(lit(1)).as("n"), min(col("node")).as("first_node"),
          max(col("node")).as("last_node"))
        .orderBy(col("deg"))
    },
    Some("""
      WITH cs AS (
        SELECT DISTINCT 'c' || o_custkey AS src, 's' || l_suppkey AS dst
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
      e0 AS (SELECT src, dst FROM (
          SELECT src, dst FROM cs UNION SELECT dst, src FROM cs)
        WHERE src <> dst),
      v1 AS (SELECT src AS node FROM e0 GROUP BY src HAVING COUNT(*) < 12),
      e1 AS (SELECT src, dst FROM e0
        WHERE src NOT IN (SELECT node FROM v1)
          AND dst NOT IN (SELECT node FROM v1)),
      v2 AS (SELECT src AS node FROM e1 GROUP BY src HAVING COUNT(*) < 12),
      e2 AS (SELECT src, dst FROM e1
        WHERE src NOT IN (SELECT node FROM v2)
          AND dst NOT IN (SELECT node FROM v2)),
      v3 AS (SELECT src AS node FROM e2 GROUP BY src HAVING COUNT(*) < 12),
      e3 AS (SELECT src, dst FROM e2
        WHERE src NOT IN (SELECT node FROM v3)
          AND dst NOT IN (SELECT node FROM v3))
      SELECT deg, COUNT(*) AS n, MIN(node) AS first_node,
        MAX(node) AS last_node
      FROM (SELECT src AS node, COUNT(*) AS deg FROM e3 GROUP BY src)
      GROUP BY deg ORDER BY deg"""),
  )

  // --------------------------------------------------------------- q186
  /** HITS on the directed customer→supplier purchase graph, two
    * rounds of integer max-norm power iteration
    * ([[graft.operators.Graph.hits]]): suppliers accumulate authority
    * from the customers referring to them, customers accumulate hub
    * mass from the authorities they reach. Graded: the 12 strongest
    * authorities with both scores; the oracle unrolls both rounds —
    * raw sums, per-round max, ppm rescale (all non-negative, so
    * `//` = `div`) — as CTEs.
    */
  val q186Hits: QueryDef = QueryDef(
    "q186_hits",
    (s, dir) => {
      val o = Tables(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"))
      val l = Tables(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"))
      val cs = o.join(l, col("o_orderkey") === col("l_orderkey"))
        .select(concat(lit("c"), col("o_custkey")).as("src"),
          concat(lit("s"), col("l_suppkey")).as("dst"))
      graft.operators.Graph.hits(cs, iters = 2)
        .orderBy(col("auth_ppm").desc, col("node"))
        .limit(12)
    },
    Some("""
      WITH cs AS (
        SELECT DISTINCT 'c' || o_custkey AS src, 's' || l_suppkey AS dst
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
      nd AS (SELECT DISTINCT node FROM (
        SELECT src AS node FROM cs UNION ALL SELECT dst FROM cs)),
      h0 AS (SELECT node, CAST(1000000 AS BIGINT) AS s FROM nd),
      a1r AS (SELECT nd.node,
          CAST(COALESCE((SELECT SUM(h0.s) FROM cs JOIN h0 ON cs.src = h0.node
            WHERE cs.dst = nd.node), 0) AS BIGINT) AS raw FROM nd),
      a1m AS (SELECT MAX(raw) AS m FROM a1r),
      a1 AS (SELECT node, CASE WHEN m = 0 THEN 0
          ELSE (1000000 * raw) // m END AS s FROM a1r CROSS JOIN a1m),
      h1r AS (SELECT nd.node,
          CAST(COALESCE((SELECT SUM(a1.s) FROM cs JOIN a1 ON cs.dst = a1.node
            WHERE cs.src = nd.node), 0) AS BIGINT) AS raw FROM nd),
      h1m AS (SELECT MAX(raw) AS m FROM h1r),
      h1 AS (SELECT node, CASE WHEN m = 0 THEN 0
          ELSE (1000000 * raw) // m END AS s FROM h1r CROSS JOIN h1m),
      a2r AS (SELECT nd.node,
          CAST(COALESCE((SELECT SUM(h1.s) FROM cs JOIN h1 ON cs.src = h1.node
            WHERE cs.dst = nd.node), 0) AS BIGINT) AS raw FROM nd),
      a2m AS (SELECT MAX(raw) AS m FROM a2r),
      a2 AS (SELECT node, CASE WHEN m = 0 THEN 0
          ELSE (1000000 * raw) // m END AS s FROM a2r CROSS JOIN a2m),
      h2r AS (SELECT nd.node,
          CAST(COALESCE((SELECT SUM(a2.s) FROM cs JOIN a2 ON cs.dst = a2.node
            WHERE cs.src = nd.node), 0) AS BIGINT) AS raw FROM nd),
      h2m AS (SELECT MAX(raw) AS m FROM h2r),
      h2 AS (SELECT node, CASE WHEN m = 0 THEN 0
          ELSE (1000000 * raw) // m END AS s FROM h2r CROSS JOIN h2m)
      SELECT h2.node AS node, h2.s AS hub_ppm, a2.s AS auth_ppm
      FROM h2 JOIN a2 ON h2.node = a2.node
      ORDER BY auth_ppm DESC, h2.node LIMIT 12"""),
  )

  val all: Seq[QueryDef] = Seq(q181ItemPairs, q182EditDistanceJoin,
    q183Cuped, q184Attribution, q185KCore, q186Hits)
}
