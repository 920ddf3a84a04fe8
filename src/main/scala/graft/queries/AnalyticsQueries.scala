package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** Round-8 wave I: customer/revenue analytics — RFM scoring on
  * two-phase global rank buckets (q201), Pareto/ABC revenue
  * classification (q202), and graph degree assortativity (q203).
  */
object AnalyticsQueries {

  // --------------------------------------------------------------- q201
  /** RFM scoring: every user bucketed 1..5 on recency (last event),
    * frequency (event count), and monetary (purchase total) —
    * [[graft.operators.Stats.rankBuckets]] three times, each a
    * two-phase global ranking, never a single-partition ROW_NUMBER.
    * 5 = best on every axis. The oracle replays the floor-div bucket
    * arithmetic over ROW_NUMBER ranks with the same (metric, user)
    * total order.
    */
  val q201Rfm: QueryDef = QueryDef(
    "q201_rfm",
    (s, dir) => {
      import graft.operators.Stats
      val m = Tables(s, dir, "events")
        .groupBy(col("user_id"))
        .agg(max(expr("unix_micros(cast(ts as timestamp))")).as("rec"),
          count(lit(1)).as("freq"),
          sum(when(col("event_type") === "purchase",
            floor(col("value")).cast("long")).otherwise(0L)).as("mon"))
      val withR = Stats.rankBuckets(m,
        struct(col("rec"), col("user_id")), 5, "r")
      val withF = Stats.rankBuckets(withR,
        struct(col("freq"), col("user_id")), 5, "f")
      val withM = Stats.rankBuckets(withF,
        struct(col("mon"), col("user_id")), 5, "m")
      withM.select(col("user_id"), col("r"), col("f"), col("m"),
          (col("r") * 100 + col("f") * 10 + col("m")).as("rfm_code"))
        .orderBy(col("user_id"))
    },
    Some("""
      WITH m AS (
        SELECT user_id,
          MAX(CAST(epoch_ns(ts) // 1000 AS BIGINT)) AS rec,
          COUNT(*) AS freq,
          CAST(COALESCE(SUM(CASE WHEN event_type = 'purchase'
            THEN CAST(floor(value) AS BIGINT) END), 0) AS BIGINT) AS mon
        FROM events GROUP BY user_id),
      n AS (SELECT COUNT(*) AS n FROM m),
      rk AS (
        SELECT user_id,
          ROW_NUMBER() OVER (ORDER BY rec, user_id) - 1 AS ri,
          ROW_NUMBER() OVER (ORDER BY freq, user_id) - 1 AS fi,
          ROW_NUMBER() OVER (ORDER BY mon, user_id) - 1 AS mi
        FROM m)
      SELECT user_id,
        CAST(ri * 5 // n + 1 AS BIGINT) AS r,
        CAST(fi * 5 // n + 1 AS BIGINT) AS f,
        CAST(mi * 5 // n + 1 AS BIGINT) AS m,
        CAST((ri * 5 // n + 1) * 100 + (fi * 5 // n + 1) * 10
          + (mi * 5 // n + 1) AS BIGINT) AS rfm_code
      FROM rk CROSS JOIN n
      ORDER BY user_id"""),
  )

  // --------------------------------------------------------------- q202
  /** ABC revenue classification of parts
    * ([[graft.operators.Stats.paretoClasses]], cuts 70%/90%): class
    * census with exact revenue shares — the "how concentrated is the
    * catalogue" question. Exact integer cumulative-share compare;
    * the oracle replays the (revenue desc, part) order with a window
    * running sum.
    */
  val q202Abc: QueryDef = QueryDef(
    "q202_abc",
    (s, dir) => {
      val rev = Tables(s, dir, "lineitem")
        .groupBy(col("l_partkey"))
        .agg(sum(floor(col("l_extendedprice")).cast("long")).as("rev"))
      // share via a one-row broadcast total, not `sum() over ()`: the
      // empty-spec window put the (≤3-row, but unprovably so) class
      // census through the single-partition WindowExec the registry
      // lint polices — the scalar-attach crossJoin is the idiom every
      // other share computation in the repo uses (round 16)
      val census = graft.operators.Stats.paretoClasses(rev,
          col("l_partkey"), col("rev"), Seq(700000L, 900000L))
        .groupBy(col("abc_class"))
        .agg(count(lit(1)).as("n_parts"), sum(col("w")).as("revenue"))
      census
        .crossJoin(broadcast(census.agg(sum(col("revenue")).as("__tot"))))
        .withColumn("share_ppm", expr("(1000000 * revenue) div __tot"))
        .drop("__tot")
        .orderBy(col("abc_class"))
    },
    Some("""
      WITH rev AS (
        SELECT l_partkey AS id,
          CAST(SUM(CAST(floor(l_extendedprice) AS BIGINT)) AS BIGINT)
            AS w
        FROM lineitem GROUP BY l_partkey),
      t AS (SELECT CAST(SUM(w) AS BIGINT) AS tot FROM rev),
      c AS (
        SELECT id, w, CAST(SUM(w) OVER (ORDER BY w DESC, id
          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_w
        FROM rev),
      cls AS (
        SELECT id, w,
          CASE WHEN cum_w * 1000000 <= 700000 * tot THEN 1
               WHEN cum_w * 1000000 <= 900000 * tot THEN 2
               ELSE 3 END AS abc_class
        FROM c CROSS JOIN t)
      SELECT CAST(abc_class AS BIGINT) AS abc_class,
        COUNT(*) AS n_parts, CAST(SUM(w) AS BIGINT) AS revenue,
        CAST((1000000 * CAST(SUM(w) AS BIGINT))
          // (SELECT tot FROM t) AS BIGINT) AS share_ppm
      FROM cls GROUP BY abc_class ORDER BY abc_class"""),
  )

  // --------------------------------------------------------------- q203
  /** Degree assortativity of the customer–supplier graph
    * ([[graft.operators.Graph.degreeAssortativity]]): strongly
    * negative, as a bipartite hub graph must be — high-degree
    * customers connect to suppliers of all degrees. Exact integer
    * moments, one floating sqrt at the end (the q175 parity form).
    */
  val q203Assortativity: QueryDef = QueryDef(
    "q203_assortativity",
    (s, dir) => {
      val o = Tables(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"))
      val l = Tables(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"))
      val cs = o.join(l, col("o_orderkey") === col("l_orderkey"))
        .select(concat(lit("c"), col("o_custkey")).as("src"),
          concat(lit("s"), col("l_suppkey")).as("dst"))
      graft.operators.Graph.degreeAssortativity(cs)
    },
    Some("""
      WITH cs AS (
        SELECT DISTINCT 'c' || o_custkey AS src, 's' || l_suppkey AS dst
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
      und AS (SELECT src, dst FROM (
          SELECT src, dst FROM cs UNION SELECT dst, src FROM cs)
        WHERE src <> dst),
      deg AS (SELECT src AS v, COUNT(*) AS deg FROM und GROUP BY src),
      pairs AS (
        SELECT a.deg AS da, b.deg AS db
        FROM und JOIN deg a ON und.src = a.v JOIN deg b ON und.dst = b.v),
      agg AS (
        SELECT COUNT(*) AS n, CAST(SUM(da) AS BIGINT) AS sa,
          CAST(SUM(db) AS BIGINT) AS sb,
          CAST(SUM(da * db) AS BIGINT) AS sab,
          CAST(SUM(da * da) AS BIGINT) AS saa,
          CAST(SUM(db * db) AS BIGINT) AS sbb
        FROM pairs)
      SELECT n AS n_endpoints,
        CASE WHEN n * saa - sa * sa > 0 AND n * sbb - sb * sb > 0
          THEN ROUND(CAST(n * sab - sa * sb AS DOUBLE)
            / (sqrt(CAST(n * saa - sa * sa AS DOUBLE))
               * sqrt(CAST(n * sbb - sb * sb AS DOUBLE))), 6)
        END AS r
      FROM agg"""),
  )

  // --------------------------------------------------------------- q204
  /** Nested-JSON round trip: per order, a JSON document with a
    * sorted quantity ARRAY is built with string ops, then parsed
    * BACK through `from_json` with a nested schema
    * (struct<id, qty: array<bigint>>), exploded, and aggregated.
    * The oracle computes the same aggregate DIRECTLY from lineitem —
    * fully independent semantics — so any drop, reorder, or type
    * mangling inside Spark's JSON parser on nested arrays fails the
    * hash (q25 grades flat get_json_object; this grades the nested
    * from_json surface).
    */
  val q204JsonNested: QueryDef = QueryDef(
    "q204_json_nested",
    (s, dir) => {
      val docs = Tables(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          floor(col("l_quantity")).cast("long").as("q"))
        .groupBy(col("l_orderkey"))
        .agg(concat(lit("{\"id\":"),
          col("l_orderkey").cast("string"),
          lit(",\"qty\":["),
          concat_ws(",", expr(
            "transform(sort_array(collect_list(struct(l_linenumber, q)))," +
              " x -> cast(x.q as string))")),
          lit("]}")).as("j"))
      docs.select(from_json(col("j"),
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("id",
              org.apache.spark.sql.types.LongType),
            org.apache.spark.sql.types.StructField("qty",
              org.apache.spark.sql.types.ArrayType(
                org.apache.spark.sql.types.LongType))))).as("d"))
        .select(col("d.id").as("id"), explode(col("d.qty")).as("q"))
        .groupBy(pmod(col("id"), lit(7L)).as("bucket"))
        .agg(sum(col("q")).as("sum_qty"), count(lit(1)).as("n_items"),
          countDistinct(col("id")).as("n_orders"))
        .orderBy(col("bucket"))
    },
    Some("""
      SELECT l_orderkey % 7 AS bucket,
        CAST(SUM(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT)
          AS sum_qty,
        COUNT(*) AS n_items,
        COUNT(DISTINCT l_orderkey) AS n_orders
      FROM lineitem GROUP BY 1 ORDER BY bucket"""),
  )

  // --------------------------------------------------------------- q205
  /** The exact integer covariance matrix of the embeddings table
    * ([[graft.operators.Similarity.covarianceMatrix]], scale 1000):
    * all 2080 upper-triangle entries hash-compared — the
    * whitening/PCA input statistic proven bit-identical. The oracle
    * replays the quantization (identical IEEE multiply-then-floor),
    * the pair products, and the n·Σxy − Σx·Σy numerators.
    */
  val q205Covariance: QueryDef = QueryDef(
    "q205_covariance",
    (s, dir) =>
      graft.operators.Similarity.covarianceMatrix(
        Tables(s, dir, "embeddings"), col("vec_id"), col("embedding"),
        scale = 1000L)
        .orderBy(col("i"), col("j")),
    Some("""
      WITH e AS (
        SELECT vec_id, i - 1 AS i,
          CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000) AS BIGINT)
            AS xi
        FROM embeddings, (SELECT unnest(range(1, 65)) AS i)),
      sums AS (
        SELECT a.i, b.i AS j,
          CAST(SUM(a.xi * b.xi) AS BIGINT) AS sxy
        FROM e a JOIN e b ON a.vec_id = b.vec_id AND a.i <= b.i
        GROUP BY a.i, b.i),
      m AS (SELECT i, COUNT(*) AS n, CAST(SUM(xi) AS BIGINT) AS s
        FROM e GROUP BY i)
      SELECT sums.i AS i, sums.j AS j, ma.n AS n,
        CAST(ma.n * sums.sxy - ma.s * mb.s AS BIGINT) AS cov_num
      FROM sums JOIN m ma ON sums.i = ma.i JOIN m mb ON sums.j = mb.i
      ORDER BY i, j"""),
  )

  // --------------------------------------------------------------- q206
  /** Radius self-join over hash-derived user coordinates
    * ([[graft.operators.Spatial.radiusPairs]], grid blocking, r=50
    * on a 1000×1000 plane): every pair of users within Euclidean
    * distance 50, exact integer squared distances. Coordinates
    * derive from the portable hash so the oracle replays them, and
    * the oracle finds the pairs by BRUTE FORCE — grading the
    * losslessness of the 3×3 cell blocking the same way q182 grades
    * the edit-distance prefix filter.
    */
  val q206RadiusJoin: QueryDef = QueryDef(
    "q206_radius_join",
    (s, dir) => {
      import graft.functions.PortableHash
      val pts = Tables(s, dir, "customer")
        .select(col("c_custkey").as("uid"),
          pmod(PortableHash.hash32(col("c_custkey")), lit(1000L)).as("x"),
          pmod(PortableHash.hash32(col("c_custkey") * 31 + 7),
            lit(1000L)).as("y"))
      // NO truncate before this presentation sort (round-14 audit):
      // pair-sized answer over a cheap grid join — same verdict as q36,
      // materializing the output costs more than the range sampler's
      // re-execution of the ~2 s child
      graft.operators.Spatial.radiusPairs(pts, col("uid"), col("x"),
          col("y"), r = 50L)
        .orderBy(col("id_a"), col("id_b"))
    },
    Some {
      val hx = graft.functions.PortableHash.hash32SqlSteps("c_custkey")
      val hy = graft.functions.PortableHash
        .hash32SqlSteps("c_custkey * 31 + 7")
      s"""
      WITH x0 AS (SELECT c_custkey, ${hx(0)} AS h FROM customer),
      x1 AS (SELECT c_custkey, ${hx(1)} AS h FROM x0),
      x2 AS (SELECT c_custkey, ${hx(2)} AS h FROM x1),
      xf AS (SELECT c_custkey, ${hx(3)} AS h FROM x2),
      y0 AS (SELECT c_custkey, ${hy(0)} AS h FROM customer),
      y1 AS (SELECT c_custkey, ${hy(1)} AS h FROM y0),
      y2 AS (SELECT c_custkey, ${hy(2)} AS h FROM y1),
      yf AS (SELECT c_custkey, ${hy(3)} AS h FROM y2),
      pts AS (
        SELECT xf.c_custkey AS uid, xf.h % 1000 AS x, yf.h % 1000 AS y
        FROM xf JOIN yf ON xf.c_custkey = yf.c_custkey)
      SELECT a.uid AS id_a, b.uid AS id_b,
        CAST((a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
          AS BIGINT) AS dist2
      FROM pts a JOIN pts b ON a.uid < b.uid
      WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
        <= 2500
      ORDER BY id_a, id_b"""
    },
  )

  // --------------------------------------------------------------- q207
  /** DBSCAN over the q206 point set (r=25, minPts=5,
    * [[graft.operators.Spatial.dbscan]]): every point classified
    * core/border/noise with its deterministic cluster label — the
    * density-clustering composition of the lossless radius join and
    * the alternating-star components, per-point graded. The oracle
    * recomputes neighborhoods by brute force and closes the
    * core-core graph with recursive minimum-label propagation (the
    * q68 pattern), borders by the min rule.
    */
  val q207Dbscan: QueryDef = QueryDef(
    "q207_dbscan",
    (s, dir) => {
      import graft.functions.PortableHash
      val pts = Tables(s, dir, "customer")
        .select(col("c_custkey").as("uid"),
          pmod(PortableHash.hash32(col("c_custkey")), lit(1000L)).as("x"),
          pmod(PortableHash.hash32(col("c_custkey") * 31 + 7),
            lit(1000L)).as("y"))
      graft.operators.Spatial.dbscan(pts, col("uid"), col("x"),
          col("y"), r = 25L, minPts = 5L)
        .orderBy(col("pid"))
    },
    Some(dbscanOracleSql(r2 = 625L, minPts = 5L)),
  )

  /** The q207/q245/q246 DBSCAN oracle, parameterized on (r², minPts)
    * and the staged-hash point derivation: brute-force neighborhoods,
    * recursive min-label propagation over the core-core graph (the
    * q68 pattern), borders by the min rule. `pred`/`xExpr`/`yExpr`
    * shape the `pts` CTE (q246 filters the corpus and offsets one
    * parity class into a second blob).
    */
  private def dbscanOracleSql(r2: Long, minPts: Long,
      pred: String = "", xExpr: String = "xf.h % 1000",
      yExpr: String = "yf.h % 1000", extraCte: String = "",
      ptsFromSuffix: String = ""): String = {
    val hx = graft.functions.PortableHash.hash32SqlSteps("c_custkey")
    val hy = graft.functions.PortableHash
      .hash32SqlSteps("c_custkey * 31 + 7")
    s"""
      WITH RECURSIVE
      x0 AS (SELECT c_custkey, ${hx(0)} AS h FROM customer$pred),
      x1 AS (SELECT c_custkey, ${hx(1)} AS h FROM x0),
      x2 AS (SELECT c_custkey, ${hx(2)} AS h FROM x1),
      xf AS (SELECT c_custkey, ${hx(3)} AS h FROM x2),
      y0 AS (SELECT c_custkey, ${hy(0)} AS h FROM customer$pred),
      y1 AS (SELECT c_custkey, ${hy(1)} AS h FROM y0),
      y2 AS (SELECT c_custkey, ${hy(2)} AS h FROM y1),
      yf AS (SELECT c_custkey, ${hy(3)} AS h FROM y2),$extraCte
      pts AS (
        SELECT xf.c_custkey AS uid, $xExpr AS x, $yExpr AS y
        FROM xf JOIN yf ON xf.c_custkey = yf.c_custkey$ptsFromSuffix),
      p AS (
        SELECT a.uid AS ua, b.uid AS ub
        FROM pts a JOIN pts b ON a.uid < b.uid
        WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
          <= $r2),
      sym AS (SELECT ua AS a, ub AS b FROM p
              UNION ALL SELECT ub, ua FROM p),
      nb AS (SELECT a AS uid, COUNT(*) AS c FROM sym GROUP BY a),
      roles AS (
        SELECT pts.uid, COALESCE(nb.c, 0) + 1 >= $minPts AS is_core
        FROM pts LEFT JOIN nb ON pts.uid = nb.uid),
      core AS (SELECT uid FROM roles WHERE is_core),
      ce AS (
        SELECT s.a AS s, s.b AS d FROM sym s
        JOIN core ca ON s.a = ca.uid JOIN core cb ON s.b = cb.uid),
      lab(node, label) AS (
        SELECT uid, uid FROM core
        UNION
        SELECT ce.d, l.label FROM lab l JOIN ce ON ce.s = l.node
        WHERE l.label < ce.d),
      cc AS (SELECT node, MIN(label) AS cluster FROM lab GROUP BY node),
      bc AS (
        SELECT s.a AS uid, MIN(cc.cluster) AS b_cluster
        FROM sym s JOIN core c ON s.b = c.uid
        JOIN cc ON cc.node = s.b
        GROUP BY s.a)
      SELECT r.uid AS pid,
        CASE WHEN r.is_core THEN 'core'
             WHEN bc.b_cluster IS NOT NULL THEN 'border'
             ELSE 'noise' END AS role,
        CASE WHEN r.is_core THEN cc.cluster ELSE bc.b_cluster END
          AS cluster
      FROM roles r
      LEFT JOIN cc ON cc.node = r.uid
      LEFT JOIN bc ON bc.uid = r.uid
      ORDER BY pid"""
  }

  // --------------------------------------------------------------- q245
  /** DBSCAN in the saturated-density regime (r=80, minPts=2 — checked:
    * every point at sf0.01 AND sf0.1 has ≥8 in-radius neighbors, so
    * nCore == nPts): grades [[graft.operators.Spatial.dbscan]]'s
    * ALL-CORE shortcut paths (identity semi-joins skipped, border
    * resolution provably empty) — closing the round-14 advisor note
    * that the shortcut was only reached at scales the oracle doesn't
    * watch. Both adaptive paths of the operator are now hash-graded
    * at the graded scale.
    *
    * ORACLE DESIGN: the closed form, not [[dbscanOracleSql]]'s
    * recursive replay — in this regime the radius graph is ONE
    * component (verified out-of-band with a grid-bucketed union-find
    * over the staged-hash coordinates: sf0.01 and sf0.1 both single-
    * component, min in-radius degree 8), so the exact expected output
    * is every point `core` with cluster = MIN(uid). The recursive
    * min-label replay is quadratic in label-pair space on a dense
    * graph (DuckDB held >40 CPU-minutes at sf0.1 before being cut);
    * q207 keeps the recursion where the sparse regime makes it cheap.
    * A dbscan bug that splits the giant cluster, mislabels a role, or
    * drops a point still hash-mismatches; if the testdata generator
    * ever sparsifies this corpus the oracle fails LOUDLY (single-
    * component assumption printed here, not silently assumed). The
    * closed form's residual blind spot — all-core CONNECTIVITY under
    * MULTIPLE components — is closed by [[q246DbscanBlobs]]'s
    * recursive replay over a bounded two-blob fixture (round 15).
    */
  val q245DbscanDense: QueryDef = QueryDef(
    "q245_dbscan_dense",
    (s, dir) => {
      import graft.functions.PortableHash
      val pts = Tables(s, dir, "customer")
        .select(col("c_custkey").as("uid"),
          pmod(PortableHash.hash32(col("c_custkey")), lit(1000L)).as("x"),
          pmod(PortableHash.hash32(col("c_custkey") * 31 + 7),
            lit(1000L)).as("y"))
      graft.operators.Spatial.dbscan(pts, col("uid"), col("x"),
          col("y"), r = 80L, minPts = 2L)
        .orderBy(col("pid"))
    },
    Some("""
      SELECT CAST(c_custkey AS BIGINT) AS pid,
             'core' AS role,
             (SELECT CAST(MIN(c_custkey) AS BIGINT) FROM customer)
               AS cluster
      FROM customer ORDER BY pid"""),
  )

  // --------------------------------------------------------------- q246
  /** DBSCAN all-core shortcut under MULTIPLE components, graded by the
    * FULL recursive oracle (round 15, verdict: q245's closed form
    * conceded single-component connectivity was "verified out-of-band").
    * Fixture: 400 customer points in two blobs — each parity class
    * hashed into a 40×40 box (in-blob diameter ≤ √(40²+40²) ≈ 56.6,
    * so at r = 80 EVERY in-blob pair is a neighbor by construction,
    * data-independent), with the odd class offset +500 in x (blob gap
    * ≥ 500 − 2·40 > 80). minPts = 2 ⟹ nCore == nPts, so the all-core
    * shortcut engages, and the connected-components stage must still
    * find TWO clusters — the exact case the shortcut could corrupt if
    * it collapsed connectivity instead of merely skipping the
    * identity semi-joins. 400 points keep the recursive min-label
    * replay cheap (the dense-graph label-pair space that priced the
    * replay out of q245 is ~2·C(200,2) edges here).
    */
  val q246DbscanBlobs: QueryDef = QueryDef(
    "q246_dbscan_blobs",
    (s, dir) => {
      import graft.functions.PortableHash
      val pts = Tables(s, dir, "customer")
        .filter(col("c_custkey") <= 400)
        .select(col("c_custkey").as("uid"),
          (pmod(PortableHash.hash32(col("c_custkey")), lit(40L)) +
            pmod(col("c_custkey"), lit(2L)) * 500L).as("x"),
          pmod(PortableHash.hash32(col("c_custkey") * 31 + 7),
            lit(40L)).as("y"))
      graft.operators.Spatial.dbscan(pts, col("uid"), col("x"),
          col("y"), r = 80L, minPts = 2L)
        .orderBy(col("pid"))
    },
    Some(dbscanOracleSql(r2 = 6400L, minPts = 2L,
      pred = " WHERE c_custkey <= 400",
      xExpr = "xf.h % 40 + (xf.c_custkey % 2) * 500",
      yExpr = "yf.h % 40")),
  )

  // --------------------------------------------------------------- q247
  /** DBSCAN over a DENSITY-INVARIANT point derivation: the domain side
    * M = ⌈√(67·N)⌉ scales with the corpus (one N-count attached as a
    * broadcast one-row cross join — no driver action, and DuckDB
    * replays the identical IEEE sqrt/ceil), so the per-point expected
    * neighborhood (πr²·N/M² ≈ 29 at r = 25) is CONSTANT at every SF.
    * Round-15 motivation: q207's fixed 1000×1000 grid multiplies
    * density 100× per decade — its sf10 probe died on the pair
    * relation's local-disk footprint (2.2e9 pairs), which measures the
    * fixture, not the operator. Under this derivation the radius-pair
    * relation scales LINEARLY with N (22 M pairs at sf10 — sf1-class
    * work), so the grid-blocked join + cell-contracted components can
    * be probed one decade up on the corpus shape a spatial workload
    * actually has. Same oracle machinery as q207, with the M CTE
    * replayed stepwise.
    */
  val q247DbscanDensity: QueryDef = QueryDef(
    "q247_dbscan_density",
    (s, dir) => {
      import graft.functions.PortableHash
      val cust = Tables(s, dir, "customer")
      val m = cust.agg(
        ceil(sqrt(count(lit(1)) * lit(67))).cast("long").as("m"))
      val pts = cust.crossJoin(broadcast(m))
        .select(col("c_custkey").as("uid"),
          pmod(PortableHash.hash32(col("c_custkey")), col("m")).as("x"),
          pmod(PortableHash.hash32(col("c_custkey") * 31 + 7),
            col("m")).as("y"))
      graft.operators.Spatial.dbscan(pts, col("uid"), col("x"),
          col("y"), r = 25L, minPts = 5L)
        .orderBy(col("pid"))
    },
    Some(dbscanOracleSql(r2 = 625L, minPts = 5L,
      extraCte = """
      m AS (SELECT CAST(ceil(sqrt(COUNT(*) * 67)) AS BIGINT) AS m
            FROM customer),""",
      xExpr = "xf.h % m.m", yExpr = "yf.h % m.m",
      ptsFromSuffix = ", m")),
  )

  // --------------------------------------------------------------- q208
  /** Seasonal-naive backtest of daily event volumes per type
    * ([[graft.ml.Backtest.seasonalNaiveBacktest]], season = 7 days):
    * predict each day by the same weekday last week, score every day
    * where both exist — n, exact Σ|err|, MAE in floor micro-units.
    * The forecasting family's reference baseline, graded before any
    * fancier model earns trust. Oracle: the same cell self-join.
    */
  val q208SeasonalNaive: QueryDef = QueryDef(
    "q208_seasonal_naive",
    (s, dir) =>
      graft.ml.Backtest.seasonalNaiveBacktest(
        Tables(s, dir, "events"), col("event_type"),
        expr("unix_micros(cast(ts as timestamp)) div 86400000000"),
        lit(1L), season = 7L)
        .orderBy(col("g")),
    Some("""
      WITH cells AS (
        SELECT event_type AS g,
          CAST(epoch_ns(ts) // 1000 // 86400000000 AS BIGINT) AS t,
          COUNT(*) AS v
        FROM events GROUP BY 1, 2),
      j AS (
        SELECT a.g, ABS(a.v - b.v) AS ae
        FROM cells a JOIN cells b ON a.g = b.g AND a.t = b.t + 7)
      SELECT g, COUNT(*) AS n_predictions,
        CAST(SUM(ae) AS BIGINT) AS sum_abs_err,
        CAST((1000000 * CAST(SUM(ae) AS BIGINT)) // COUNT(*) AS BIGINT)
          AS mae_micro
      FROM j GROUP BY g ORDER BY g"""),
  )

  // --------------------------------------------------------------- q209
  /** Clickstream path analysis: the top 15 session-opening paths —
    * each session's first three event types joined '>' — with
    * session boundaries from the 30-minute gap rule (q44's
    * sessionization semantics restated declaratively). Windows here
    * are per-USER (bounded activity histories — the Sessionize
    * contract) and the path assembly is an ordered in-group
    * collect_list sliced to 3; counting is a combining groupBy. The
    * oracle replays gap flags, session numbering, and ordered list
    * aggregation.
    */
  val q209SessionPaths: QueryDef = QueryDef(
    "q209_session_paths",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val ev = Tables(s, dir, "events")
        .select(col("user_id"), col("event_type"),
          expr("unix_micros(cast(ts as timestamp))").as("us"),
          col("event_id"))
      val wu = Window.partitionBy(col("user_id"))
        .orderBy(col("us"), col("event_id"))
      val sess = ev
        .withColumn("gap", coalesce(
          col("us") - lag(col("us"), 1).over(wu) > 1800L * 1000000L,
          lit(true)))
        .withColumn("session", sum(when(col("gap"), 1L).otherwise(0L))
          .over(wu.rowsBetween(Window.unboundedPreceding, 0)))
      sess.groupBy(col("user_id"), col("session"))
        .agg(concat_ws(">", expr(
          "transform(slice(sort_array(collect_list(" +
            "struct(us, event_id, event_type))), 1, 3)," +
            " x -> x.event_type)")).as("path"))
        .groupBy(col("path")).agg(count(lit(1)).as("n_sessions"))
        .orderBy(col("n_sessions").desc, col("path"))
        .limit(15)
    },
    Some("""
      WITH ev AS (
        SELECT user_id, event_type,
          CAST(epoch_ns(ts) // 1000 AS BIGINT) AS us, event_id
        FROM events),
      g AS (
        SELECT user_id, event_type, us, event_id,
          CASE WHEN us - lag(us) OVER (PARTITION BY user_id
            ORDER BY us, event_id) > 1800000000
            OR lag(us) OVER (PARTITION BY user_id
              ORDER BY us, event_id) IS NULL
          THEN 1 ELSE 0 END AS gap
        FROM ev),
      se AS (
        SELECT user_id, event_type, us, event_id,
          SUM(gap) OVER (PARTITION BY user_id ORDER BY us, event_id
            ROWS UNBOUNDED PRECEDING) AS session
        FROM g),
      paths AS (
        SELECT user_id, session,
          array_to_string(
            (list(event_type ORDER BY us, event_id))[1:3], '>') AS path
        FROM se GROUP BY user_id, session)
      SELECT path, COUNT(*) AS n_sessions
      FROM paths GROUP BY path
      ORDER BY n_sessions DESC, path LIMIT 15"""),
  )

  // --------------------------------------------------------------- q210
  /** Linear multi-touch attribution: every purchase splits one unit
    * of credit equally (floor ppm) across ALL click/view touches in
    * the preceding 7 days — q184's last-touch generalized to
    * fractional credit. Credit per (conversion, touch) =
    * 10⁶ div n_touches, summed per touch type; conversions with no
    * window touches count as 'none' with full credit. The
    * conversion×touch join is per-user and window-bounded — activity-
    * sized, never cross-user.
    */
  val q210LinearAttribution: QueryDef = QueryDef(
    "q210_linear_attribution",
    (s, dir) => {
      val ev = Tables(s, dir, "events")
        .select(col("user_id"), col("event_type"),
          expr("unix_micros(cast(ts as timestamp))").as("us"),
          col("event_id"))
      val conv = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("us").as("cus"),
          col("event_id").as("cid"))
      val touch = ev.filter(col("event_type").isin("click", "view"))
        .select(col("user_id").as("t_uid"), col("event_type").as("touch"),
          col("us").as("tus"))
      val window = 7L * 86400L * 1000000L
      // the window predicate must be part of the JOIN condition: a
      // post-filter would drop conversions whose user has only
      // out-of-window touches instead of null-extending them
      val j = conv.join(touch,
        col("user_id") === col("t_uid") && col("tus") <= col("cus") &&
          col("tus") > col("cus") - window, "left")
      val perConv = j.groupBy(col("cid"))
        .agg(count(col("tus")).as("n_touches"))
      j.join(perConv, Seq("cid"))
        .groupBy(coalesce(col("touch"), lit("none")).as("touch"))
        .agg(countDistinct(col("cid")).as("n_conversions"),
          sum(when(col("n_touches") === 0, 1000000L)
            .otherwise(expr("1000000 div n_touches"))).as("credit_ppm"))
        .orderBy(col("touch"))
    },
    Some("""
      WITH ev AS (
        SELECT user_id, event_type,
          CAST(epoch_ns(ts) // 1000 AS BIGINT) AS us, event_id
        FROM events),
      conv AS (SELECT user_id, us AS cus, event_id AS cid FROM ev
        WHERE event_type = 'purchase'),
      touch AS (SELECT user_id, event_type AS touch, us AS tus FROM ev
        WHERE event_type IN ('click', 'view')),
      j AS (
        SELECT c.cid, t.touch, t.tus
        FROM conv c LEFT JOIN touch t ON c.user_id = t.user_id
          AND t.tus <= c.cus AND t.tus > c.cus - 604800000000
        ),
      pc AS (SELECT cid, COUNT(tus) AS n_touches FROM j GROUP BY cid)
      SELECT COALESCE(j.touch, 'none') AS touch,
        COUNT(DISTINCT j.cid) AS n_conversions,
        CAST(SUM(CASE WHEN pc.n_touches = 0 THEN 1000000
          ELSE 1000000 // pc.n_touches END) AS BIGINT) AS credit_ppm
      FROM j JOIN pc ON j.cid = pc.cid
      GROUP BY 1 ORDER BY touch"""),
  )

  // --------------------------------------------------------------- q211
  /** Cross-correlation of daily click volume vs daily purchase VALUE
    * at lags 1..7 ([[graft.operators.Stats.crossCorrelation]]) — "do
    * clicks lead purchases, and by how many days". Exact integer
    * moments per lag, the q175 correlation form; the oracle replays
    * the lag join and the closed form.
    */
  val q211CrossCorrelation: QueryDef = QueryDef(
    "q211_cross_correlation",
    (s, dir) => {
      val ev = Tables(s, dir, "events")
      val day = expr("unix_micros(cast(ts as timestamp)) div 86400000000")
      val clicks = ev.filter(col("event_type") === "click")
        .select(day.as("t"), lit(1L).as("v"))
      val purchases = ev.filter(col("event_type") === "purchase" &&
          col("value").isNotNull)
        .select(day.as("t"), floor(col("value")).cast("long").as("v"))
      graft.operators.Stats.crossCorrelation(clicks, purchases,
          col("t"), col("v"), maxLag = 7)
        .orderBy(col("lag"))
    },
    Some("""
      WITH ca AS (
        SELECT CAST(epoch_ns(ts) // 1000 // 86400000000 AS BIGINT) AS t,
          COUNT(*) AS va
        FROM events WHERE event_type = 'click' GROUP BY 1),
      cb AS (
        SELECT CAST(epoch_ns(ts) // 1000 // 86400000000 AS BIGINT) AS t,
          CAST(SUM(CAST(floor(value) AS BIGINT)) AS BIGINT) AS vb
        FROM events WHERE event_type = 'purchase' AND value IS NOT NULL
        GROUP BY 1),
      lags AS (SELECT unnest(range(1, 8)) AS lag),
      pairs AS (
        SELECT lags.lag, ca.va, cb.vb
        FROM ca CROSS JOIN lags JOIN cb ON cb.t = ca.t + lags.lag),
      agg AS (
        SELECT lag, COUNT(*) AS n, CAST(SUM(va) AS BIGINT) AS sa,
          CAST(SUM(vb) AS BIGINT) AS sb,
          CAST(SUM(va * vb) AS BIGINT) AS sab,
          CAST(SUM(va * va) AS BIGINT) AS saa,
          CAST(SUM(vb * vb) AS BIGINT) AS sbb
        FROM pairs GROUP BY lag)
      SELECT CAST(lag AS BIGINT) AS lag, n,
        CASE WHEN n * saa - sa * sa > 0 AND n * sbb - sb * sb > 0
          THEN ROUND(CAST(n * sab - sa * sb AS DOUBLE)
            / (sqrt(CAST(n * saa - sa * sa AS DOUBLE))
               * sqrt(CAST(n * sbb - sb * sb AS DOUBLE))), 6)
        END AS r
      FROM agg ORDER BY lag"""),
  )

  // --------------------------------------------------------------- q212
  /** Volume trend lines per event type: exact-ppm OLS slope and
    * intercept of daily counts over the day index
    * ([[graft.operators.Stats.trendLines]]) — the "is this metric
    * growing" primitive with hash-exact coefficients (trunc-div,
    * replayed explicitly since DuckDB floors).
    */
  val q212TrendLines: QueryDef = QueryDef(
    "q212_trend_lines",
    (s, dir) =>
      graft.operators.Stats.trendLines(
        Tables(s, dir, "events"), col("event_type"),
        expr("unix_micros(cast(ts as timestamp)) div 86400000000"),
        lit(1L))
        .orderBy(col("grp")),
    Some {
      def tdiv(a: String, b: String): String =
        s"(CASE WHEN ($a) >= 0 THEN ($a) // ($b) ELSE -((-($a)) // ($b)) END)"
      s"""
      WITH cells AS (
        SELECT event_type AS grp,
          CAST(epoch_ns(ts) // 1000 // 86400000000 AS BIGINT) AS t,
          COUNT(*) AS v
        FROM events GROUP BY 1, 2),
      agg AS (
        SELECT grp, COUNT(*) AS n, CAST(SUM(t) AS BIGINT) AS st,
          CAST(SUM(v) AS BIGINT) AS sv,
          CAST(SUM(t * v) AS BIGINT) AS stv,
          CAST(SUM(t * t) AS BIGINT) AS stt
        FROM cells GROUP BY grp),
      sl AS (
        SELECT grp, n, st, sv,
          CASE WHEN n * stt - st * st > 0
            THEN ${tdiv("1000000 * (n * stv - st * sv)",
              "n * stt - st * st")} END AS slope_ppm
        FROM agg)
      SELECT grp, n, slope_ppm,
        CASE WHEN slope_ppm IS NOT NULL
          THEN ${tdiv("1000000 * sv - slope_ppm * st", "n")} END
          AS intercept_ppm
      FROM sl ORDER BY grp"""
    },
  )

  // --------------------------------------------------------------- q213
  /** Time-to-convert distribution: for every user who clicked and
    * then purchased, the click→purchase delay in seconds, binned by
    * the equi-width histogram — [[graft.operators.Funnel.firstTouch]]
    * composed with [[graft.operators.Binning.equiWidthHistogram]]
    * (two graded operators, zero new code — the q172 composition
    * argument). The oracle replays the anchored-funnel mins (first
    * purchase strictly AFTER the first click) and q53's double bin
    * arithmetic.
    */
  val q213TimeToConvert: QueryDef = QueryDef(
    "q213_time_to_convert",
    (s, dir) => {
      val ft = graft.operators.Funnel.firstTouch(
        Tables(s, dir, "events"), col("user_id"), col("event_type"),
        col("ts").cast("timestamp"), Seq("click", "purchase"))
      val gaps = ft.filter(col("t2").isNotNull)
        .select(expr("(t2 - t1) div 1000000").as("gap_s"))
      graft.operators.Binning.equiWidthHistogram(gaps, col("gap_s"),
          nBins = 12)
        .withColumn("bin_lo", round(col("bin_lo"), 6))
        .withColumn("bin_hi", round(col("bin_hi"), 6))
        .orderBy(col("bin"))
    },
    Some("""
      WITH ev AS (
        SELECT user_id, event_type,
          CAST(epoch_ns(ts) // 1000 AS BIGINT) AS us
        FROM events),
      c1 AS (SELECT user_id, MIN(us) AS t1 FROM ev
        WHERE event_type = 'click' GROUP BY user_id),
      c2 AS (
        SELECT ev.user_id, MIN(ev.us) AS t2
        FROM ev JOIN c1 ON ev.user_id = c1.user_id
        WHERE ev.event_type = 'purchase' AND ev.us > c1.t1
        GROUP BY ev.user_id),
      gaps AS (
        SELECT (c2.t2 - c1.t1) // 1000000 AS gap_s
        FROM c1 JOIN c2 ON c1.user_id = c2.user_id),
      b AS (SELECT MIN(CAST(gap_s AS DOUBLE)) AS lo,
          MAX(CAST(gap_s AS DOUBLE)) AS hi FROM gaps),
      binned AS (
        SELECT CAST(LEAST(GREATEST(
            FLOOR((CAST(gap_s AS DOUBLE) - b.lo) / ((b.hi - b.lo) / 12)),
            0.0), 11.0) AS BIGINT) AS bin, b.lo, b.hi
        FROM gaps, b)
      SELECT bin,
        ROUND(lo + bin * ((hi - lo) / 12), 6) AS bin_lo,
        ROUND(lo + (bin + 1) * ((hi - lo) / 12), 6) AS bin_hi,
        COUNT(*) AS n
      FROM binned GROUP BY bin, lo, hi ORDER BY bin"""),
  )

  // --------------------------------------------------------------- q214
  /** The unsupervised pipeline end to end, CROSS-modal: k-means over
    * the EMBEDDINGS (q106's fixed-point Lloyd, k=8, 3 iters) → join
    * each cluster back to its document TEXT (vec_id ≡ doc_id) → name
    * every cluster by its top-3 distinctive terms (q180's integer
    * c-TF-IDF). "Cluster the vectors, explain the clusters with
    * words" — the standard corpus-exploration loop as ONE graded row
    * set. The oracle chains the full unrolled k-means replay into
    * the cells → cluster-df → linear-idf → per-cluster rank SQL, so
    * a drift in EITHER stage (or the id pairing between modalities)
    * fails the hash.
    */
  val q214ClusterLabels: QueryDef = QueryDef(
    "q214_cluster_labels",
    (s, dir) => {
      val assign = graft.ml.KMeans.fit(Tables(s, dir, "embeddings"),
          col("vec_id"), col("embedding"), k = 8, iters = 3)
        .select(col("vec_id"), col("cluster"))
      val docs = Tables(s, dir, "documents")
        .join(assign, col("doc_id") === col("vec_id"))
      graft.operators.CorpusStats.distinctiveTerms(docs,
          col("cluster"), col("text"), topK = 3)
        .orderBy(col("cluster"), col("rank"))
    },
    Some(s"""
      WITH km AS (${CurationQueries.kmeansSql(8, 3)}),
      cells AS (
        SELECT cluster, term, COUNT(*) AS tf FROM (
          SELECT km.cluster, unnest(string_split(d.text, ' ')) AS term
          FROM documents d JOIN km ON km.vec_id = d.doc_id)
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
      FROM scored WHERE rank <= 3
      ORDER BY cluster, rank"""),
  )

  // --------------------------------------------------------------- q215
  /** Trailing 7-day distinct users per day — the classically
    * EXPENSIVE exact problem (every window re-counts) made one
    * sketch pass by HLL mergeability: daily register tables
    * ([[graft.operators.HyperLogLog.registers]]), each day's sketch
    * spread onto the 7 windows it belongs to (a constant ×7
    * register-row fan-out — 64 rows per day, never events), max-
    * merged per (window, register), estimated; the EXACT trailing
    * distinct rides alongside so the estimate's error is visible in
    * the graded row. Oracle replays hash → registers → spread →
    * max-merge → integer estimate, and the exact count directly.
    */
  val q215TrailingDistinct: QueryDef = QueryDef(
    "q215_trailing_distinct",
    (s, dir) => {
      import graft.operators.HyperLogLog
      val ev = Tables(s, dir, "events")
      val day = expr("unix_micros(cast(ts as timestamp)) div 86400000000")
      val daily = HyperLogLog.registers(ev, day, col("user_id"))
      val merged = daily
        .select(explode(sequence(col("g"), col("g") + 6)).as("g"),
          col("reg"), col("m"))
        .groupBy(col("g"), col("reg")).agg(max(col("m")).as("m"))
      val est = HyperLogLog.estimates(merged)
        .select(col("g").as("day"), col("estimate"))
      val exact = ev.filter(col("user_id").isNotNull)
        .select(explode(sequence(day, day + 6)).as("day"),
          col("user_id"))
        .groupBy(col("day"))
        .agg(countDistinct(col("user_id")).as("exact"))
      exact.join(est, Seq("day")).orderBy(col("day"))
    },
    Some {
      val steps = graft.functions.PortableHash.hash32SqlSteps("user_id")
      s"""
      WITH e AS (
        SELECT CAST(epoch_ns(ts) // 1000 // 86400000000 AS BIGINT)
          AS day, user_id
        FROM events WHERE user_id IS NOT NULL),
      h0 AS (SELECT day, ${steps(0)} AS h FROM e),
      h1 AS (SELECT day, ${steps(1)} AS h FROM h0),
      h2 AS (SELECT day, ${steps(2)} AS h FROM h1),
      hf AS (SELECT day, ${steps(3)} AS h FROM h2),
      rw AS (SELECT day, h % 64 AS reg, h // 64 AS w FROM hf),
      spread AS (
        SELECT day + s.s AS day, reg, w
        FROM rw, (SELECT unnest(range(0, 7)) AS s) s),
      regs AS (SELECT day, reg,
          MAX(${Round8Queries.HllRankCase}) AS m
        FROM spread GROUP BY day, reg),
      sums AS (SELECT day, CAST(SUM(134217728 >> m) AS BIGINT) AS s_hit,
          COUNT(*) AS n_hit
        FROM regs GROUP BY day),
      est AS (SELECT day, ${Round8Queries.HllEstimateSql} AS estimate
        FROM sums),
      exact AS (
        SELECT e.day + s.s AS day, COUNT(DISTINCT user_id) AS exact
        FROM e, (SELECT unnest(range(0, 7)) AS s) s
        GROUP BY e.day + s.s)
      SELECT exact.day AS day, exact.exact, est.estimate
      FROM exact JOIN est ON exact.day = est.day
      ORDER BY day"""
    },
  )

  // --------------------------------------------------------------- q216
  /** Modularity of the q145 label-propagation communities
    * ([[graft.operators.Graph.modularity]]): the clustering-quality
    * score in exact integers — cleared-fraction numerator
    * Σ_c (4m·e_c − d_c²) plus the trunc-div micro value — so the
    * question "was that clustering better than chance" is itself a
    * hash-graded row. The oracle replays the two label-prop rounds
    * (q145's unrolled chain) and the modularity sums; communities
    * with no internal edges keep their −d_c² penalty through the
    * full-outer merge.
    */
  val q216Modularity: QueryDef = QueryDef(
    "q216_modularity",
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
      val labels = graft.operators.Graph
        .labelPropagation(edges, iters = 2)
      graft.operators.Graph.modularity(edges, labels)
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
      ${round("l1", "v2", "l2").trim},
      und AS (
        SELECT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
        FROM e WHERE src <> dst GROUP BY 1, 2),
      deg AS (SELECT v, COUNT(*) AS deg FROM (
          SELECT a AS v FROM und UNION ALL SELECT b FROM und)
        GROUP BY v),
      wl AS (
        SELECT und.a, und.b, la.label AS la, lb.label AS lb
        FROM und JOIN l2 la ON und.a = la.node
        JOIN l2 lb ON und.b = lb.node),
      ec AS (SELECT la AS label, COUNT(*) AS e_c FROM wl
        WHERE la = lb GROUP BY la),
      dc AS (SELECT l2.label, CAST(SUM(deg.deg) AS BIGINT) AS d_c
        FROM deg JOIN l2 ON deg.v = l2.node GROUP BY l2.label),
      mm AS (SELECT COUNT(*) AS m FROM und),
      terms AS (
        SELECT COALESCE(dc.label, ec.label) AS label,
          COALESCE(ec.e_c, 0) AS e_c, COALESCE(dc.d_c, 0) AS d_c
        FROM dc FULL OUTER JOIN ec ON dc.label = ec.label)
      SELECT COUNT(*) AS n_communities, mm.m,
        CAST(SUM(4 * mm.m * e_c - d_c * d_c) AS BIGINT) AS q_num,
        CAST((CASE WHEN SUM(4 * mm.m * e_c - d_c * d_c) >= 0
          THEN (1000000 * CAST(SUM(4 * mm.m * e_c - d_c * d_c)
            AS BIGINT)) // (4 * mm.m * mm.m)
          ELSE -((-1000000 * CAST(SUM(4 * mm.m * e_c - d_c * d_c)
            AS BIGINT)) // (4 * mm.m * mm.m)) END) AS BIGINT)
          AS q_micro
      FROM terms CROSS JOIN mm GROUP BY mm.m"""
    },
  )

  // --------------------------------------------------------------- q217
  /** Gapped sequential patterns: "A then B within the next 3 events
    * of the same user" — what Markov transitions (q163, adjacent
    * only) cannot see. Events get per-user sequence positions (the
    * bounded per-user window contract), ordered pairs come from a
    * user-keyed self-join with 0 < Δpos ≤ 3 — per-user work is
    * gap-bounded (≤ 3 pairs per event), never quadratic — and the
    * top 15 patterns are a combining count + TakeOrdered. Oracle
    * replays positions, the banded self-join, and the ranking.
    */
  val q217GappedPairs: QueryDef = QueryDef(
    "q217_gapped_pairs",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val ev = Tables(s, dir, "events")
        .select(col("user_id"), col("event_type"),
          expr("unix_micros(cast(ts as timestamp))").as("us"),
          col("event_id"))
      val wu = Window.partitionBy(col("user_id"))
        .orderBy(col("us"), col("event_id"))
      val pos = ev.withColumn("pos", row_number().over(wu).cast("long"))
        .select(col("user_id"), col("event_type"), col("pos"))
      pos.select(col("user_id"), col("event_type").as("a"),
          col("pos").as("pa"))
        .join(pos.select(col("user_id"), col("event_type").as("b"),
          col("pos").as("pb")), Seq("user_id"))
        .filter(col("pb") > col("pa") && col("pb") - col("pa") <= 3)
        .groupBy(col("a"), col("b")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("a"), col("b"))
        .limit(15)
    },
    Some("""
      WITH ev AS (
        SELECT user_id, event_type,
          CAST(epoch_ns(ts) // 1000 AS BIGINT) AS us, event_id
        FROM events),
      pos AS (
        SELECT user_id, event_type,
          CAST(ROW_NUMBER() OVER (PARTITION BY user_id
            ORDER BY us, event_id) AS BIGINT) AS pos
        FROM ev)
      SELECT a.event_type AS a, b.event_type AS b, COUNT(*) AS n
      FROM pos a JOIN pos b ON a.user_id = b.user_id
        AND b.pos > a.pos AND b.pos - a.pos <= 3
      GROUP BY 1, 2 ORDER BY n DESC, a, b LIMIT 15"""),
  )

  // --------------------------------------------------------------- q218
  /** Inter-arrival burstiness per event type: the gaps between a
    * user's consecutive events of each type (per-(user, type)
    * windows — bounded activity histories), aggregated to exact
    * per-type gap moments and the coefficient of variation
    * (6dp-rounded single sqrt, the q175 parity form). cv ≈ 1 is
    * Poisson; cv ≫ 1 is bursty — the traffic-shape diagnostic
    * capacity planning reads first.
    */
  val q218Interarrival: QueryDef = QueryDef(
    "q218_interarrival",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val ev = Tables(s, dir, "events")
        .select(col("user_id"), col("event_type"),
          expr("unix_micros(cast(ts as timestamp))").as("us"),
          col("event_id"))
      val w = Window.partitionBy(col("user_id"), col("event_type"))
        .orderBy(col("us"), col("event_id"))
      val gaps = ev
        .withColumn("gap", col("us") - lag(col("us"), 1).over(w))
        .filter(col("gap").isNotNull)
        // minutes, not seconds: cv is unit-invariant and the squared
        // sum must stay under 2^63 at 10x+ scales (caught by the
        // sf0.1 re-grade: second-granularity gaps overflowed)
        .select(col("event_type").as("g"),
          expr("gap div 60000000").as("gap_min"))
      val varN = col("n") * col("ss") - col("s") * col("s")
      gaps.groupBy(col("g"))
        .agg(count(lit(1)).as("n"), sum(col("gap_min")).as("s"),
          sum(col("gap_min") * col("gap_min")).as("ss"))
        .select(col("g"), col("n"), col("s"), col("ss"),
          when(col("s") > 0, round(
            sqrt(varN.cast("double")) / col("s"), 6)).as("cv"))
        .orderBy(col("g"))
    },
    Some("""
      WITH ev AS (
        SELECT user_id, event_type,
          CAST(epoch_ns(ts) // 1000 AS BIGINT) AS us, event_id
        FROM events),
      gaps AS (
        SELECT event_type AS g,
          (us - lag(us) OVER (PARTITION BY user_id, event_type
            ORDER BY us, event_id)) // 60000000 AS gap_min
        FROM ev),
      agg AS (
        SELECT g, COUNT(*) AS n, CAST(SUM(gap_min) AS BIGINT) AS s,
          CAST(SUM(gap_min * gap_min) AS BIGINT) AS ss
        FROM gaps WHERE gap_min IS NOT NULL GROUP BY g)
      SELECT g, n, s, ss,
        CASE WHEN s > 0 THEN ROUND(
          sqrt(CAST(n * ss - s * s AS DOUBLE)) / s, 6) END AS cv
      FROM agg ORDER BY g"""),
  )

  // --------------------------------------------------------------- q219
  /** Duplicate-cluster size distribution: how big do the SimHash
    * near-dup clusters get — the q68 components aggregated one more
    * level into a (cluster size → how many clusters) histogram plus
    * the singleton share in ppm. The curation planning number ("is
    * dedup mostly pairs or a few mega-clusters") as one graded row
    * set, composed from a graded operator with zero new code.
    */
  val q219ClusterSizes: QueryDef = QueryDef(
    "q219_cluster_sizes",
    (s, dir) => {
      val docs = Tables(s, dir, "documents")
      val pairs = graft.operators.Dedup.simhashPairs(docs,
        col("doc_id"), col("text"), maxHamming = 3)
      graft.operators.Components.dedupClusters(
          pairs.select(col("id_a").as("src"), col("id_b").as("dst")),
          docs.select(col("doc_id").as("node")))
        .groupBy(col("component")).agg(count(lit(1)).as("size"))
        .groupBy(col("size")).agg(count(lit(1)).as("n_clusters"))
        .orderBy(col("size"))
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
      sz AS (SELECT component, COUNT(*) AS size FROM cc
        GROUP BY component)
      SELECT size, COUNT(*) AS n_clusters
      FROM sz GROUP BY size ORDER BY size"""),
  )

  // --------------------------------------------------------------- q220
  /** The unrolled-BFS CTE chain (q158's shape) as a reusable
    * fragment: frontier/visited rounds f0..f<h>/v0..v<h> under
    * `prefix`, seeded from CTE `seedsCte(node)`.
    */
  private def bfsCtes(p: String, seedsCte: String, hops: Int): String = {
    // every round MATERIALIZED: f_i and v_i are each referenced twice
    // downstream (the next frontier's anti-filter AND the next visited
    // union), so an inlining replanner re-evaluates the whole prefix
    // chain per reference — exponential in hops, and with two chained
    // sweeps it exhausted DuckDB's temp spill at sf0.1. Materialization
    // pins each frontier to ONE evaluation; replay cost then scales
    // with frontier size, matching the engine's iteration cost.
    val rounds = (1 to hops).map { i =>
      s"""      ${p}f$i AS MATERIALIZED (SELECT DISTINCT e.dst AS node
        FROM ${p}f${i - 1} f JOIN e ON f.node = e.src
        WHERE e.dst NOT IN (SELECT node FROM ${p}v${i - 1})),
      ${p}v$i AS MATERIALIZED (SELECT * FROM ${p}v${i - 1}
        UNION ALL SELECT node, $i FROM ${p}f$i)"""
    }.mkString(",\n")
    s"""      ${p}f0 AS MATERIALIZED (SELECT node FROM $seedsCte
        WHERE node IN (SELECT node FROM nodes)),
      ${p}v0 AS MATERIALIZED (SELECT node, 0 AS hop FROM ${p}f0),
$rounds"""
  }

  /** Graph eccentricity by the classic double BFS sweep, entirely
    * in-plan: BFS from the minimum node, pick the farthest vertex
    * (max hop, lexically-smallest tie) as a ONE-ROW dataframe — no
    * driver collect — and BFS again from it; the second sweep's
    * maximum hop is the eccentricity of a peripheral vertex and the
    * standard diameter lower bound. Hops capped at 4 (the graded
    * contract; this dense bipartite graph's reachable eccentricities
    * sit inside it). The oracle unrolls BOTH sweeps plus the seed
    * picks — two chained q158 replays.
    */
  val q220Eccentricity: QueryDef = QueryDef(
    "q220_eccentricity",
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
      val nodes = edges.select(col("src").as("node"))
        .union(edges.select(col("dst").as("node"))).distinct()
      val seed1 = nodes.agg(min(col("node")).as("node"))
      val bfs1 = graft.operators.Graph.bfsHops(edges, seed1, maxHops = 4)
      val seed2 = bfs1.orderBy(col("hop").desc, col("node")).limit(1)
        .select(col("node"))
      val bfs2 = graft.operators.Graph.bfsHops(edges, seed2, maxHops = 4)
      seed1.select(col("node").as("sweep1_seed"))
        .crossJoin(seed2.select(col("node").as("peripheral")))
        .crossJoin(bfs2.agg(max(col("hop")).as("ecc_lb"),
          count(lit(1)).as("n_reached")))
    },
    Some(s"""
      WITH cs AS MATERIALIZED (
        SELECT DISTINCT 'c' || o_custkey AS src, 's' || l_suppkey AS dst
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
      e AS MATERIALIZED (SELECT src, dst FROM cs
            UNION SELECT dst AS src, src AS dst FROM cs),
      nodes AS MATERIALIZED (SELECT DISTINCT node FROM (
        SELECT src AS node FROM e UNION ALL SELECT dst FROM e)),
      s1 AS (SELECT MIN(node) AS node FROM nodes),
${bfsCtes("a", "s1", 4)},
      s2 AS (SELECT node FROM av4
        ORDER BY hop DESC, node LIMIT 1),
${bfsCtes("b", "s2", 4)}
      SELECT (SELECT node FROM s1) AS sweep1_seed,
        (SELECT node FROM s2) AS peripheral,
        CAST(MAX(hop) AS BIGINT) AS ecc_lb,
        COUNT(*) AS n_reached
      FROM bv4"""),
  )

  // --------------------------------------------------------------- q221
  /** Embedding drift across pseudo-days (vec_id mod 30 as the
    * arrival bucket): consecutive buckets' centroid-direction
    * cosines ([[graft.operators.Similarity.centroidDrift]], scale
    * 10⁶). Cosine's scale invariance lets the centroid be the exact
    * integer SUM vector, so dot and norms are exact longs and only
    * the final two sqrts float — the oracle replays quantization,
    * sums, the consecutive-bucket join, and the rounded ratio.
    */
  val q221EmbeddingDrift: QueryDef = QueryDef(
    "q221_embedding_drift",
    (s, dir) =>
      graft.operators.Similarity.centroidDrift(
        Tables(s, dir, "embeddings"), pmod(col("vec_id"), lit(30L)),
        col("embedding"), scale = 1000000L)
        .orderBy(col("bucket")),
    Some("""
      WITH e AS (
        SELECT ((vec_id % 30) + 30) % 30 AS b, i - 1 AS i,
          CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000) AS BIGINT)
            AS q
        FROM embeddings, (SELECT unnest(range(1, 65)) AS i)),
      sums AS (SELECT b, i, CAST(SUM(q) AS BIGINT) AS s
        FROM e GROUP BY b, i),
      norms AS (SELECT b, CAST(SUM(s * s) AS BIGINT) AS nrm
        FROM sums GROUP BY b),
      dots AS (
        SELECT a.b, CAST(SUM(a.s * c.s) AS BIGINT) AS dot
        FROM sums a JOIN sums c ON c.b = a.b + 1 AND c.i = a.i
        GROUP BY a.b)
      SELECT d.b AS bucket, d.b + 1 AS next_bucket, d.dot,
        na.nrm AS na, nb.nrm AS nb,
        CASE WHEN na.nrm > 0 AND nb.nrm > 0 THEN
          ROUND(CAST(d.dot AS DOUBLE) /
            (sqrt(CAST(na.nrm AS DOUBLE)) * sqrt(CAST(nb.nrm AS DOUBLE))),
            6) END AS cos
      FROM dots d
      JOIN norms na ON na.b = d.b
      JOIN norms nb ON nb.b = d.b + 1
      ORDER BY bucket"""),
  )

  // --------------------------------------------------------------- q222
  /** Sorted-neighborhood dedup over the q182 prefixes
    * ([[graft.operators.StringJoin.sortedNeighborhoodPairs]], window
    * 10, sort key = the prefix itself): the third blocking family
    * (after LSH banding and rarity-prefix filtering), deliberately
    * approximate — exact-duplicate prefixes sort adjacent and are
    * found; typo pairs whose first characters differ sort apart and
    * are missed, and because q182 grades the EXACT answer on the
    * same input, the recall of the method is itself visible across
    * the two graded rows. The oracle replays the (key, id) ranking,
    * the rank-window candidate rule, and the bounded verify.
    */
  val q222SortedNeighborhood: QueryDef = QueryDef(
    "q222_sorted_neighborhood",
    (s, dir) =>
      graft.operators.StringJoin.sortedNeighborhoodPairs(
        Tables(s, dir, "documents")
          .select(col("doc_id"), substring(col("text"), 1, 24).as("s")),
        col("doc_id"), col("s"), col("s"), window = 10, maxDist = 2)
        .orderBy(col("id_a"), col("id_b")),
    Some("""
      WITH p AS (SELECT doc_id, substr(text, 1, 24) AS s
        FROM documents),
      rk AS (SELECT doc_id, s,
          ROW_NUMBER() OVER (ORDER BY s, doc_id) - 1 AS idx
        FROM p),
      cand AS (
        SELECT a.doc_id AS ida, a.s AS sa, b.doc_id AS idb, b.s AS sb
        FROM rk a JOIN rk b
          ON b.idx > a.idx AND b.idx - a.idx <= 10)
      SELECT LEAST(ida, idb) AS id_a, GREATEST(ida, idb) AS id_b,
        CAST(levenshtein(sa, sb) AS BIGINT) AS dist
      FROM cand WHERE levenshtein(sa, sb) <= 2
      ORDER BY id_a, id_b"""),
  )

  private val q223SplitsPath =
    s"/tmp/graft_q223_splits_${ProcessHandle.current().pid()}.parquet"

  // --------------------------------------------------------------- q223
  /** Split-conformal prediction intervals on the q66 evaluation
    * frame: the per-category-mean model trains on TRAIN, the
    * calibration radius is the exact ⌈(n+1)·0.9⌉-th smallest
    * absolute VAL residual (the distribution-free 90% guarantee),
    * and TEST coverage at that radius is reported in ppm — the
    * finite-sample theorem made a graded row (coverage ≥ 900000 up
    * to discreteness). The k-th order statistic runs on the
    * residual-histogram prefix (no global sort); the splits frame is
    * materialized once and read by BOTH engines (the q66 pattern, so
    * the oracle shares inputs, not arithmetic).
    */
  val q223Conformal: QueryDef = QueryDef(
    "q223_conformal",
    (s, dir) => {
      val base = Tables(s, dir, "orders").select(
        col("o_orderkey").as("id"),
        (col("o_totalprice") * 100).cast("long").as("y_cents"),
        when(col("o_orderkey") % 97 === 0, lit(null).cast("string"))
          .otherwise(col("o_orderpriority")).as("feat"))
      val splits = graft.operators.Splits.threeWay(base, 0.1875, 0.25, 123L)
      splits.toSeq
        .map { case (name, df) => df.withColumn("split", lit(name)) }
        .reduce(_ unionByName _)
        .write.mode("overwrite").parquet(q223SplitsPath)
      val frame = s.read.parquet(q223SplitsPath)
      val model = frame
        .filter(col("split") === "train" && col("feat").isNotNull)
        .groupBy("feat")
        .agg(sum("y_cents").as("ms"), count(lit(1)).as("mc"))
      val scored = frame.join(broadcast(model), Seq("feat"), "left")
        .withColumn("pred_cents", expr("ms DIV mc"))
        .filter(col("pred_cents").isNotNull)
        .withColumn("r", abs(col("y_cents") - col("pred_cents")))
      val cal = scored.filter(col("split") === "val")
      val kRow = cal.agg(count(lit(1)).as("n_cal"))
        .withColumn("k", expr("((n_cal + 1) * 9 + 9) div 10"))
      val cells = cal.groupBy(col("r")).agg(count(lit(1)).as("cnt"))
      val cum = graft.operators.Stats
        .rangePrefixSums(cells, col("r"), Seq("cnt"))
      // grand aggregate, not groupBy(n_cal, k): the keys are constants
      // from the one-row kRow, so the group count is 1 either way, but
      // only the grand agg is PROVABLY one row — the registry lint can
      // then certify the test-side crossJoin below as a bounded
      // scalar attach. Empty-calibration edge (k > n_cal) preserved by
      // the null filter: the grand agg's all-null row is dropped where
      // the empty groupBy produced no row (round 16).
      val radius = cum.crossJoin(broadcast(kRow))
        .filter(col("cum_cnt") >= col("k"))
        .agg(min(col("n_cal")).as("n_cal"), min(col("k")).as("k"),
          min(col("r")).as("radius_cents"))
        .filter(col("radius_cents").isNotNull)
      scored.filter(col("split") === "test")
        .crossJoin(broadcast(radius))
        .groupBy(col("n_cal"), col("k"), col("radius_cents"))
        .agg(count(lit(1)).as("n_test"),
          sum(when(col("r") <= col("radius_cents"), 1L).otherwise(0L))
            .as("n_covered"))
        .withColumn("coverage_ppm",
          expr("(1000000 * n_covered) div n_test"))
    },
    Some(s"""
      WITH frame AS (
        SELECT * FROM read_parquet('$q223SplitsPath/*.parquet')),
      model AS (
        SELECT feat, sum(y_cents) AS ms, count(*) AS mc
        FROM frame WHERE split = 'train' AND feat IS NOT NULL
        GROUP BY feat),
      scored AS (
        SELECT f.split, abs(f.y_cents - (m.ms // m.mc)) AS r
        FROM frame f JOIN model m ON f.feat = m.feat),
      cal AS (SELECT r FROM scored WHERE split = 'val'),
      kk AS (SELECT COUNT(*) AS n_cal,
          ((COUNT(*) + 1) * 9 + 9) // 10 AS k FROM cal),
      rk AS (SELECT r, ROW_NUMBER() OVER (ORDER BY r) AS rn FROM cal),
      rad AS (SELECT kk.n_cal, kk.k,
          CAST(MIN(rk.r) AS BIGINT) AS radius_cents
        FROM rk CROSS JOIN kk WHERE rk.rn >= kk.k
        GROUP BY kk.n_cal, kk.k),
      test AS (SELECT r FROM scored WHERE split = 'test')
      SELECT rad.n_cal, rad.k, rad.radius_cents,
        COUNT(*) AS n_test,
        CAST(COUNT(*) FILTER (test.r <= rad.radius_cents) AS BIGINT)
          AS n_covered,
        CAST((1000000 * COUNT(*) FILTER (test.r <= rad.radius_cents))
          // COUNT(*) AS BIGINT) AS coverage_ppm
      FROM test CROSS JOIN rad
      GROUP BY rad.n_cal, rad.k, rad.radius_cents"""),
  )

  // --------------------------------------------------------------- q224
  /** Cohort LTV curves: users cohorted by first-active epoch-week
    * (q78's integer week arithmetic), purchase revenue accumulated
    * per (cohort, weeks-since-joining) cell, and the RUNNING
    * cumulative per cohort — the lifetime-value curve every growth
    * model consumes — via [[graft.operators.Stats
    * .groupedPrefixSums]] (no per-cohort window). Weeks with no
    * revenue are densified from each cohort's observed span so the
    * curve has no holes; everything integer.
    */
  val q224LtvCurve: QueryDef = QueryDef(
    "q224_ltv_curve",
    (s, dir) => {
      val ev = Tables(s, dir, "events")
      val week = expr(
        "unix_micros(cast(ts as timestamp)) div 86400000000 div 7")
      val firstWeek = ev.groupBy(col("user_id"))
        .agg(min(week).as("cohort"))
      val rev = ev.filter(col("event_type") === "purchase" &&
          col("value").isNotNull)
        .select(col("user_id"), week.as("w"),
          floor(col("value")).cast("long").as("rev"))
        .join(firstWeek, Seq("user_id"))
        .groupBy(col("cohort"), (col("w") - col("cohort")).as("age"))
        .agg(sum(col("rev")).as("rev"))
      // densify: every cohort carries ages 0..max observed age
      val span = rev.groupBy(col("cohort")).agg(max(col("age")).as("mx"))
      val dense = span
        .select(col("cohort"), explode(sequence(lit(0L), col("mx")))
          .as("age"))
        .join(rev, Seq("cohort", "age"), "left")
        .select(col("cohort"), col("age"),
          coalesce(col("rev"), lit(0L)).as("rev"))
      graft.operators.Stats
        .groupedPrefixSums(dense, "cohort", "age", Seq("rev"))
        .select(col("cohort"), col("age"), col("rev"),
          col("gcum_rev").as("ltv"))
        .orderBy(col("cohort"), col("age"))
    },
    Some("""
      WITH ev AS (
        SELECT user_id, event_type,
          CAST(epoch_ns(ts) // 1000 // 86400000000 // 7 AS BIGINT)
            AS w,
          CAST(floor(value) AS BIGINT) AS rev, value
        FROM events),
      fw AS (SELECT user_id, MIN(w) AS cohort FROM ev GROUP BY user_id),
      rev AS (
        SELECT fw.cohort, ev.w - fw.cohort AS age,
          CAST(SUM(ev.rev) AS BIGINT) AS rev
        FROM ev JOIN fw ON ev.user_id = fw.user_id
        WHERE ev.event_type = 'purchase' AND ev.value IS NOT NULL
        GROUP BY 1, 2),
      span AS (SELECT cohort, MAX(age) AS mx FROM rev GROUP BY cohort),
      ages AS (
        SELECT cohort, unnest(range(0, mx + 1)) AS age FROM span),
      dense AS (
        SELECT ages.cohort, ages.age, COALESCE(rev.rev, 0) AS rev
        FROM ages LEFT JOIN rev
          ON rev.cohort = ages.cohort AND rev.age = ages.age)
      SELECT cohort, age, CAST(rev AS BIGINT) AS rev,
        CAST(SUM(rev) OVER (PARTITION BY cohort ORDER BY age
          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS ltv
      FROM dense ORDER BY cohort, age"""),
  )

  // --------------------------------------------------------------- q225
  /** New vs returning daily actives — the dashboard primitive on top
    * of first-occurrence collapse: per day, distinct actives split
    * into first-ever-seen and returning, with the new share in ppm.
    * Two combining aggregates (per-user first day; per-day
    * distincts) and one join — never a distinct-over-window.
    */
  val q225NewVsReturning: QueryDef = QueryDef(
    "q225_new_vs_returning",
    (s, dir) => {
      val ev = Tables(s, dir, "events")
        .filter(col("user_id").isNotNull)
        .select(col("user_id"),
          expr("unix_micros(cast(ts as timestamp)) div 86400000000")
            .as("day"))
      val first = ev.groupBy(col("user_id")).agg(min(col("day")).as("fd"))
      ev.distinct()
        .join(first, Seq("user_id"))
        .groupBy(col("day"))
        .agg(count(lit(1)).as("actives"),
          sum(when(col("day") === col("fd"), 1L).otherwise(0L))
            .as("new_users"))
        .select(col("day"), col("actives"), col("new_users"),
          (col("actives") - col("new_users")).as("returning"),
          expr("(1000000 * new_users) div actives").as("new_share_ppm"))
        .orderBy(col("day"))
    },
    Some("""
      WITH ev AS (
        SELECT DISTINCT user_id,
          CAST(epoch_ns(ts) // 1000 // 86400000000 AS BIGINT) AS day
        FROM events WHERE user_id IS NOT NULL),
      first AS (SELECT user_id, MIN(day) AS fd FROM ev GROUP BY user_id)
      SELECT ev.day, COUNT(*) AS actives,
        CAST(COUNT(*) FILTER (ev.day = first.fd) AS BIGINT)
          AS new_users,
        CAST(COUNT(*) - COUNT(*) FILTER (ev.day = first.fd) AS BIGINT)
          AS returning,
        CAST((1000000 * COUNT(*) FILTER (ev.day = first.fd))
          // COUNT(*) AS BIGINT) AS new_share_ppm
      FROM ev JOIN first ON ev.user_id = first.user_id
      GROUP BY ev.day ORDER BY ev.day"""),
  )

  // --------------------------------------------------------------- q226
  // keyed by pid AND data dir: one JVM evaluating two dirs must not
  // let the first dataset's rows leak into the second's merge (the
  // oracle recomputes from the current dir only)
  private def q226StorePath(dir: String) =
    s"/tmp/graft_q226_store_${ProcessHandle.current().pid()}_" +
      Integer.toHexString(dir.hashCode)

  /** The versioned upsert store ([[graft.sources.Sinks.upsertParquet]]
    * + manifest-pointer publication, round 9) in the graded loop:
    * the events feed applied as three deterministic keep-latest
    * batches (event_id mod 3, each collapsed to one candidate per
    * user first, per the upsert contract), final snapshot resolved
    * through [[graft.sources.Sinks.readSnapshot]]'s manifest chain.
    * The oracle recomputes latest-per-user from the RAW feed in one
    * ROW_NUMBER pass — a green row proves merge semantics AND the
    * versioned publish/resolve path end to end, independent of the
    * engine that wrote it. The order key is a zero-padded (us,
    * event_id) string so ties cannot exist and batch application
    * order is immaterial; re-running the query re-applies the same
    * batches idempotently (three more generations, same state).
    *
    * Scale shape: each batch is one keyed shuffle (the collapse) plus
    * the merge's shuffle; publication is one rename + a 50-byte
    * pointer file per generation — no data copy beyond the merge
    * itself, and readers never block or fail during it.
    */
  val q226UpsertSnapshot: QueryDef = QueryDef(
    "q226_upsert_snapshot",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val store = q226StorePath(dir)
      val ev = Tables(s, dir, "events")
        .filter(col("user_id").isNotNull && col("ts").isNotNull
          && col("event_id").isNotNull)
        .select(col("user_id"), col("event_id"), col("event_type"),
          unix_micros(col("ts")).as("us"))
        .withColumn("ord",
          format_string("%020d|%012d", col("us"), col("event_id")))
      (0L to 2L).foreach { i =>
        val b = ev.filter(pmod(col("event_id"), lit(3L)) === i)
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ord").desc)
        val latest = b.withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1).drop("__rn")
        graft.sources.Sinks.upsertParquet(latest, store,
          Seq("user_id"), "ord")
      }
      graft.sources.Sinks.readSnapshot(s, store)
        .select(col("user_id"), col("event_id"), col("event_type"),
          col("us"))
        .orderBy(col("user_id"))
    },
    Some("""
      WITH e AS (
        SELECT user_id, event_id, event_type,
          CAST(epoch_ns(ts) // 1000 AS BIGINT) AS us
        FROM events
        WHERE user_id IS NOT NULL AND ts IS NOT NULL
          AND event_id IS NOT NULL),
      r AS (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY user_id ORDER BY us DESC, event_id DESC) AS rn
        FROM e)
      SELECT user_id, event_id, event_type, us
      FROM r WHERE rn = 1 ORDER BY user_id"""),
  )

  // --------------------------------------------------------------- q227
  private val q227Pid = ProcessHandle.current().pid()

  /** q226's STREAMING twin — the versioned store maintained by the
    * foreachBatch upsert sink ([[graft.streaming.StreamJoin
    * .upsertSink]]): the same events feed arrives as micro-batches,
    * each collapsed and merged through the same manifest-pointer
    * publication, and the final resolved snapshot must equal the
    * batch answer — so the pair (q226, q227) pins that the store's
    * state is independent of HOW the data arrived (three planned
    * batches vs arbitrary micro-batch slicing), the
    * streaming-equals-batch law applied to storage. Shares q226's
    * independent ROW_NUMBER oracle over the raw feed.
    */
  val q227StreamUpsertSnapshot: QueryDef = QueryDef(
    "q227_stream_upsert_snapshot",
    (s, dir) => {
      val tag = s"${q227Pid}_" + Integer.toHexString(dir.hashCode)
      val out = s"/tmp/graft_q227_store_$tag"
      val ckpt = s"/tmp/graft_q227_ckpt_$tag"
      graft.streaming.StreamJoin.upsertSink(s, dir, out, ckpt)
      graft.sources.Sinks.readSnapshot(s, out)
        .select(col("user_id"), col("event_id"), col("event_type"),
          col("us"))
        .orderBy(col("user_id"))
    },
    q226UpsertSnapshot.oracle,
  )

  // --------------------------------------------------------------- q228
  /** Time travel on the versioned store
    * ([[graft.sources.Sinks.readSnapshotAt]]): build q226's store
    * fresh (the dir is deleted first so generation numbering is
    * deterministic on every invocation), then read GENERATION 2 —
    * the state as of the first two batches — while generation 3 is
    * live. The oracle independently recomputes latest-per-key over
    * ONLY the first two batches' rows (event_id mod 3 ∈ {0, 1}), so
    * a green row proves retained generations are immutable,
    * addressable, and exactly the states their publishes claimed —
    * the as-of read a table format sells, graded cross-engine.
    */
  val q228StoreTimeTravel: QueryDef = QueryDef(
    "q228_store_time_travel",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val store = s"/tmp/graft_q228_store_${ProcessHandle.current().pid()}_" +
        Integer.toHexString(dir.hashCode)
      val root = new org.apache.hadoop.fs.Path(store)
      val fs = root.getFileSystem(s.sessionState.newHadoopConf())
      fs.delete(root, true)
      val ev = Tables(s, dir, "events")
        .filter(col("user_id").isNotNull && col("ts").isNotNull
          && col("event_id").isNotNull)
        .select(col("user_id"), col("event_id"), col("event_type"),
          unix_micros(col("ts")).as("us"))
        .withColumn("ord",
          format_string("%020d|%012d", col("us"), col("event_id")))
      (0L to 2L).foreach { i =>
        val b = ev.filter(pmod(col("event_id"), lit(3L)) === i)
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ord").desc)
        val latest = b.withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1).drop("__rn")
        graft.sources.Sinks.upsertParquet(latest, store,
          Seq("user_id"), "ord")
      }
      graft.sources.Sinks.readSnapshotAt(s, store, 2L)
        .select(col("user_id"), col("event_id"), col("event_type"),
          col("us"))
        .orderBy(col("user_id"))
    },
    Some("""
      WITH e AS (
        SELECT user_id, event_id, event_type,
          CAST(epoch_ns(ts) // 1000 AS BIGINT) AS us
        FROM events
        WHERE user_id IS NOT NULL AND ts IS NOT NULL
          AND event_id IS NOT NULL AND event_id % 3 IN (0, 1)),
      r AS (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY user_id ORDER BY us DESC, event_id DESC) AS rn
        FROM e)
      SELECT user_id, event_id, event_type, us
      FROM r WHERE rn = 1 ORDER BY user_id"""),
  )

  // --------------------------------------------------------------- q229
  /** Compaction of the versioned store
    * ([[graft.sources.Sinks.compactParquet]] resolving the LIVE
    * generation): q226's store is built fresh, compacted into a new
    * path, and the compacted output must hash-match the same
    * independent latest-per-key oracle — small-file maintenance
    * never changes the answer, graded cross-engine. Closes the store
    * lifecycle quartet: upsert (q226), streamed maintenance (q227),
    * time travel (q228), compaction (q229).
    */
  val q229CompactedStore: QueryDef = QueryDef(
    "q229_compacted_store",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val tag = s"${ProcessHandle.current().pid()}_" +
        Integer.toHexString(dir.hashCode)
      val store = s"/tmp/graft_q229_store_$tag"
      val out = s"/tmp/graft_q229_compact_$tag"
      val conf = s.sessionState.newHadoopConf()
      Seq(store, out).foreach { p =>
        val hp = new org.apache.hadoop.fs.Path(p)
        hp.getFileSystem(conf).delete(hp, true)
      }
      val ev = Tables(s, dir, "events")
        .filter(col("user_id").isNotNull && col("ts").isNotNull
          && col("event_id").isNotNull)
        .select(col("user_id"), col("event_id"), col("event_type"),
          unix_micros(col("ts")).as("us"))
        .withColumn("ord",
          format_string("%020d|%012d", col("us"), col("event_id")))
      (0L to 2L).foreach { i =>
        val b = ev.filter(pmod(col("event_id"), lit(3L)) === i)
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ord").desc)
        val latest = b.withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1).drop("__rn")
        graft.sources.Sinks.upsertParquet(latest, store,
          Seq("user_id"), "ord")
      }
      graft.sources.Sinks.compactParquet(s, store, out)
      s.read.parquet(out)
        .select(col("user_id"), col("event_id"), col("event_type"),
          col("us"))
        .orderBy(col("user_id"))
    },
    q226UpsertSnapshot.oracle,
  )

  // --------------------------------------------------------------- q235
  /** The versioned store's COMPOSED lifecycle in one graded chain
    * (round 12) — upsert ×3 → time-travel → compact → diff —
    * complementing q226–q229's per-operation grades: q226's three
    * keep-latest batches build the store fresh, generation 2 is read
    * back AS OF (the state after two batches), the LIVE generation is
    * compacted into a new path, and [[graft.operators.SnapshotDiff
    * .diff]] of (generation 2 → compacted live) emits exactly batch
    * 3's effect as a changelog. The oracle replays both states
    * independently from the raw feed and full-outer-joins them — a
    * green row proves the four lifecycle stages COMPOSE: time travel
    * reads the exact pre-batch-3 state, compaction didn't change the
    * live answer, and the diff is the true delta between them
    * ('removed' is impossible under pure upserts, which the chain
    * also certifies by producing none).
    *
    * Scale shape: the batches and merge are q226's keyed shuffles;
    * the diff is one full-outer join on the store key — co-partitioned
    * when both sides bucket on it, never edge-sized.
    */
  val q235StoreLifecycle: QueryDef = QueryDef(
    "q235_store_lifecycle",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val tag = s"${ProcessHandle.current().pid()}_" +
        Integer.toHexString(dir.hashCode)
      val store = s"/tmp/graft_q235_store_$tag"
      val cpath = s"/tmp/graft_q235_compact_$tag"
      val conf = s.sessionState.newHadoopConf()
      Seq(store, cpath).foreach { p =>
        val hp = new org.apache.hadoop.fs.Path(p)
        hp.getFileSystem(conf).delete(hp, true)
      }
      val ev = Tables(s, dir, "events")
        .filter(col("user_id").isNotNull && col("ts").isNotNull
          && col("event_id").isNotNull)
        .select(col("user_id"), col("event_id"), col("event_type"),
          unix_micros(col("ts")).as("us"))
        .withColumn("ord",
          format_string("%020d|%012d", col("us"), col("event_id")))
      (0L to 2L).foreach { i =>
        val b = ev.filter(pmod(col("event_id"), lit(3L)) === i)
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ord").desc)
        val latest = b.withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1).drop("__rn")
        graft.sources.Sinks.upsertParquet(latest, store,
          Seq("user_id"), "ord")
      }
      val gen2 = graft.sources.Sinks.readSnapshotAt(s, store, 2L)
        .select(col("user_id"), col("event_id"), col("us"))
      graft.sources.Sinks.compactParquet(s, store, cpath)
      val live = s.read.parquet(cpath)
        .select(col("user_id"), col("event_id"), col("us"))
      graft.operators.SnapshotDiff.diff(gen2, live, "user_id",
          Seq("event_id", "us"))
        .orderBy(col("user_id"))
    },
    Some("""
      WITH e AS (
        SELECT user_id, event_id,
          CAST(epoch_ns(ts) // 1000 AS BIGINT) AS us
        FROM events
        WHERE user_id IS NOT NULL AND ts IS NOT NULL
          AND event_id IS NOT NULL),
      s2 AS (
        SELECT user_id, event_id, us FROM (
          SELECT *, ROW_NUMBER() OVER (
            PARTITION BY user_id ORDER BY us DESC, event_id DESC) AS rn
          FROM e WHERE event_id % 3 IN (0, 1)) WHERE rn = 1),
      s3 AS (
        SELECT user_id, event_id, us FROM (
          SELECT *, ROW_NUMBER() OVER (
            PARTITION BY user_id ORDER BY us DESC, event_id DESC) AS rn
          FROM e) WHERE rn = 1)
      SELECT COALESCE(s3.user_id, s2.user_id) AS user_id,
        CASE WHEN s2.user_id IS NULL THEN 'added'
             WHEN s2.event_id <> s3.event_id OR s2.us <> s3.us
               THEN 'changed' END AS change_type,
        s2.event_id AS old_event_id, s3.event_id AS new_event_id,
        s2.us AS old_us, s3.us AS new_us
      FROM s2 FULL JOIN s3 ON s2.user_id = s3.user_id
      WHERE s2.user_id IS NULL
         OR s2.event_id <> s3.event_id OR s2.us <> s3.us
      ORDER BY user_id"""),
  )

  val all: Seq[QueryDef] = Seq(q201Rfm, q202Abc, q203Assortativity,
    q204JsonNested, q205Covariance, q206RadiusJoin, q207Dbscan,
    q208SeasonalNaive, q209SessionPaths, q210LinearAttribution,
    q211CrossCorrelation, q212TrendLines, q213TimeToConvert,
    q214ClusterLabels, q215TrailingDistinct, q216Modularity,
    q217GappedPairs, q218Interarrival, q219ClusterSizes,
    q220Eccentricity, q221EmbeddingDrift, q222SortedNeighborhood,
    q223Conformal, q224LtvCurve, q225NewVsReturning,
    q226UpsertSnapshot, q227StreamUpsertSnapshot, q228StoreTimeTravel,
    q229CompactedStore, q235StoreLifecycle, q245DbscanDense,
    q246DbscanBlobs, q247DbscanDensity)
}
