package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** Round-8 wave C: schema discovery (functional and inclusion
  * dependencies, q187/q188) and the native CUBE surface (q189).
  * FD/IND verdicts are exact counts; the cube grades Spark's
  * grouping-sets machinery bit-for-bit against DuckDB's (both encode
  * GROUPING() with the first column as the high bit).
  */
object SchemaQueries {

  // --------------------------------------------------------------- q187
  /** Candidate functional dependencies across three tables, verdicts
    * with violation counts ([[graft.operators.SchemaDiscovery]]).
    * Mix chosen so both outcomes are graded: key→attr FDs hold,
    * attr→attr FDs fail with large violation counts.
    */
  val q187FdDiscovery: QueryDef = QueryDef(
    "q187_fd_discovery",
    (s, dir) => {
      import graft.operators.SchemaDiscovery.functionalDependencies
      functionalDependencies(Tables(s, dir, "orders"),
          Seq(("o_orderkey", "o_custkey"), ("o_custkey", "o_orderstatus")))
        .unionByName(functionalDependencies(Tables(s, dir, "part"),
          Seq(("p_partkey", "p_brand"), ("p_brand", "p_type"))))
        .unionByName(functionalDependencies(Tables(s, dir, "lineitem"),
          Seq(("l_orderkey", "l_returnflag"))))
        .orderBy(col("det"), col("dep"))
    },
    Some("""
      SELECT 'o_orderkey' AS det, 'o_custkey' AS dep, COUNT(*) AS n_groups,
        COUNT(*) FILTER (cd > 1) AS n_violating,
        COUNT(*) FILTER (cd > 1) = 0 AS holds
      FROM (SELECT o_orderkey, COUNT(DISTINCT o_custkey) AS cd
            FROM orders GROUP BY 1)
      UNION ALL
      SELECT 'o_custkey', 'o_orderstatus', COUNT(*),
        COUNT(*) FILTER (cd > 1), COUNT(*) FILTER (cd > 1) = 0
      FROM (SELECT o_custkey, COUNT(DISTINCT o_orderstatus) AS cd
            FROM orders GROUP BY 1)
      UNION ALL
      SELECT 'p_partkey', 'p_brand', COUNT(*),
        COUNT(*) FILTER (cd > 1), COUNT(*) FILTER (cd > 1) = 0
      FROM (SELECT p_partkey, COUNT(DISTINCT p_brand) AS cd
            FROM part GROUP BY 1)
      UNION ALL
      SELECT 'p_brand', 'p_type', COUNT(*),
        COUNT(*) FILTER (cd > 1), COUNT(*) FILTER (cd > 1) = 0
      FROM (SELECT p_brand, COUNT(DISTINCT p_type) AS cd
            FROM part GROUP BY 1)
      UNION ALL
      SELECT 'l_orderkey', 'l_returnflag', COUNT(*),
        COUNT(*) FILTER (cd > 1), COUNT(*) FILTER (cd > 1) = 0
      FROM (SELECT l_orderkey, COUNT(DISTINCT l_returnflag) AS cd
            FROM lineitem GROUP BY 1)
      ORDER BY det, dep"""),
  )

  // --------------------------------------------------------------- q188
  /** Foreign-key discovery: the star schema's true FKs hold, and the
    * deliberately reversed o_orderkey ⊆ l_orderkey FAILS with an
    * exact missing count (orders with no line items) — the check that
    * catches a partial ingest.
    */
  val q188IndDiscovery: QueryDef = QueryDef(
    "q188_ind_discovery",
    (s, dir) => {
      import graft.operators.SchemaDiscovery.inclusionDependencies
      inclusionDependencies(Seq(
        ("l_orderkey_in_o_orderkey", Tables(s, dir, "lineitem"),
          "l_orderkey", Tables(s, dir, "orders"), "o_orderkey"),
        ("l_partkey_in_p_partkey", Tables(s, dir, "lineitem"),
          "l_partkey", Tables(s, dir, "part"), "p_partkey"),
        ("o_custkey_in_c_custkey", Tables(s, dir, "orders"),
          "o_custkey", Tables(s, dir, "customer"), "c_custkey"),
        ("o_orderkey_in_l_orderkey", Tables(s, dir, "orders"),
          "o_orderkey", Tables(s, dir, "lineitem"), "l_orderkey")))
        .orderBy(col("label"))
    },
    Some("""
      SELECT 'l_orderkey_in_o_orderkey' AS label,
        COUNT(*) AS n_child_distinct,
        COUNT(*) FILTER (v NOT IN (SELECT o_orderkey FROM orders
          WHERE o_orderkey IS NOT NULL)) AS n_missing,
        COUNT(*) FILTER (v NOT IN (SELECT o_orderkey FROM orders
          WHERE o_orderkey IS NOT NULL)) = 0 AS holds
      FROM (SELECT DISTINCT l_orderkey AS v FROM lineitem
            WHERE l_orderkey IS NOT NULL)
      UNION ALL
      SELECT 'l_partkey_in_p_partkey', COUNT(*),
        COUNT(*) FILTER (v NOT IN (SELECT p_partkey FROM part
          WHERE p_partkey IS NOT NULL)),
        COUNT(*) FILTER (v NOT IN (SELECT p_partkey FROM part
          WHERE p_partkey IS NOT NULL)) = 0
      FROM (SELECT DISTINCT l_partkey AS v FROM lineitem
            WHERE l_partkey IS NOT NULL)
      UNION ALL
      SELECT 'o_custkey_in_c_custkey', COUNT(*),
        COUNT(*) FILTER (v NOT IN (SELECT c_custkey FROM customer
          WHERE c_custkey IS NOT NULL)),
        COUNT(*) FILTER (v NOT IN (SELECT c_custkey FROM customer
          WHERE c_custkey IS NOT NULL)) = 0
      FROM (SELECT DISTINCT o_custkey AS v FROM orders
            WHERE o_custkey IS NOT NULL)
      UNION ALL
      SELECT 'o_orderkey_in_l_orderkey', COUNT(*),
        COUNT(*) FILTER (v NOT IN (SELECT l_orderkey FROM lineitem
          WHERE l_orderkey IS NOT NULL)),
        COUNT(*) FILTER (v NOT IN (SELECT l_orderkey FROM lineitem
          WHERE l_orderkey IS NOT NULL)) = 0
      FROM (SELECT DISTINCT o_orderkey AS v FROM orders
            WHERE o_orderkey IS NOT NULL)
      ORDER BY label"""),
  )

  // --------------------------------------------------------------- q189
  /** The native CUBE: all four grouping sets of
    * (l_returnflag, l_linestatus) in one pass, with the grouping-set
    * id bitmask (first column = high bit in BOTH engines) and
    * 'ALL' labels for the rolled-up dimensions. Exact integer sum
    * (floored quantity).
    */
  val q189Cube: QueryDef = QueryDef(
    "q189_cube",
    (s, dir) =>
      Tables(s, dir, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(grouping_id().as("gid"), count(lit(1)).as("n"),
          sum(floor(col("l_quantity")).cast("long")).as("qty"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("status"),
          col("gid"), col("n"), col("qty"))
        .orderBy(col("gid"), col("flag"), col("status")),
    Some("""
      SELECT COALESCE(l_returnflag, 'ALL') AS flag,
        COALESCE(l_linestatus, 'ALL') AS status,
        GROUPING(l_returnflag, l_linestatus) AS gid,
        COUNT(*) AS n,
        CAST(SUM(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT) AS qty
      FROM lineitem
      GROUP BY CUBE (l_returnflag, l_linestatus)
      ORDER BY gid, flag, status"""),
  )

  // --------------------------------------------------------------- q190
  /** The SCD2 run-building CTE chain (q128's oracle shape),
    * parameterized by the attribute expression so two timelines can
    * be built in one statement. Ends in `<p>f(k, attr,
    * valid_from_us, valid_to_us)`.
    */
  private def scd2Ctes(p: String, attrSql: String): String = s"""
      ${p}e AS (
        SELECT user_id AS k, $attrSql AS attr,
          CAST(epoch_ns(ts) // 1000 AS BIGINT) AS ts_us, event_id AS tb
        FROM events),
      ${p}o AS (
        SELECT k, attr, ts_us, tb,
          CASE WHEN lag(attr) OVER (PARTITION BY k ORDER BY ts_us, tb)
            IS NOT DISTINCT FROM attr THEN 0 ELSE 1 END AS chg
        FROM ${p}e),
      ${p}r AS (
        SELECT k, attr, ts_us,
          CAST(SUM(chg) OVER (PARTITION BY k ORDER BY ts_us, tb
            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS run_id
        FROM ${p}o),
      ${p}g AS (
        SELECT k, run_id, MIN(attr) AS attr,
          MIN(ts_us) AS valid_from_us
        FROM ${p}r GROUP BY k, run_id),
      ${p}f AS (
        SELECT k, attr, valid_from_us,
          lead(valid_from_us) OVER (PARTITION BY k ORDER BY run_id)
            AS valid_to_us
        FROM ${p}g)"""

  /** Temporal join of two SCD2 timelines per user — the event-type
    * runs against the value-band runs ([[graft.operators.Scd2
    * .temporalJoin]]): which (type, band) states were simultaneously
    * true and for how long. Graded as the (attr_a, attr_b) overlap
    * census with closed-window durations (open windows count their
    * presence, not their unbounded span). Half-open interval algebra
    * replayed verbatim in the oracle.
    */
  val q190TemporalJoin: QueryDef = QueryDef(
    "q190_temporal_join",
    (s, dir) => {
      val ev = Tables(s, dir, "events")
      val a = graft.operators.Scd2.build(ev, col("user_id"),
        col("event_type"), col("ts"), col("event_id"))
      val b = graft.operators.Scd2.build(ev, col("user_id"),
        expr("cast(floor(value) as bigint) div 100"), col("ts"),
        col("event_id"))
      graft.operators.Scd2.temporalJoin(a, b)
        .groupBy(col("attr_a"), col("attr_b"))
        .agg(count(lit(1)).as("n_windows"),
          sum(when(col("to_us").isNotNull,
            col("to_us") - col("from_us")).otherwise(0L))
            .as("closed_dur_us"))
        .orderBy(col("attr_a"), col("attr_b"))
    },
    Some(s"""
      WITH ${scd2Ctes("a", "event_type").trim.stripPrefix("")}
      , ${scd2Ctes("b",
        // trunc division (Spark `div`), not DuckDB floor `//`: the two
        // agree only for non-negative dividends, and a generator change
        // introducing negative values would otherwise silently diverge
        "(CASE WHEN floor(value) >= 0" +
          " THEN CAST(floor(value) AS BIGINT) // 100" +
          " ELSE -((-CAST(floor(value) AS BIGINT)) // 100) END)").trim}
      , ja AS (SELECT k, attr AS attr_a, valid_from_us AS fa,
          COALESCE(valid_to_us, 9223372036854775807) AS ta FROM af)
      , jb AS (SELECT k, attr AS attr_b, valid_from_us AS fb,
          COALESCE(valid_to_us, 9223372036854775807) AS tb FROM bf)
      , j AS (
        SELECT attr_a, attr_b,
          GREATEST(fa, fb) AS from_us, LEAST(ta, tb) AS to_raw
        FROM ja JOIN jb ON ja.k = jb.k
        WHERE fa < tb AND fb < ta)
      SELECT attr_a, attr_b, COUNT(*) AS n_windows,
        CAST(SUM(CASE WHEN to_raw <> 9223372036854775807
          THEN to_raw - from_us ELSE 0 END) AS BIGINT) AS closed_dur_us
      FROM j GROUP BY 1, 2 ORDER BY 1, 2"""),
  )

  // --------------------------------------------------------------- q191
  /** The truncating geometric RBO weight table as SQL VALUES — the
    * identical integer fold [[graft.operators.Search.rboOverlap]]
    * runs (w₁ = (10⁹·(10⁶−p)) div 10⁶, w_{d+1} = (w_d·p) div 10⁶).
    */
  private def rboWeightValues(k: Int, pPpm: Long): String = {
    val w = new Array[Long](k + 1)
    w(1) = (1000000000L * (1000000L - pPpm)) / 1000000L
    for (d <- 2 to k) w(d) = w(d - 1) * pPpm / 1000000L
    (1 to k).map(d => s"(${d}, ${w(d)})").mkString(", ")
  }

  /** Rank-biased overlap between the BM25 and TF-IDF rankings for
    * the same query (q126/q72's scorers, q138's candidate lists):
    * RBO@30 at p = 0.9 in exact ppb. Where q138 FUSES the rankings
    * and q140 grades set recall, q191 MEASURES their order agreement
    * — the retrieval-evaluation triangle's third side. The oracle
    * replays both scorers, both rank windows, the entry depths, the
    * prefix-overlap counts, and the truncating geometric weights.
    */
  val q191Rbo: QueryDef = QueryDef(
    "q191_rbo",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val docs = Tables(s, dir, "documents")
      val terms = Seq("data", "table", "query")
      // 30-row candidate list: the single-partition rank window sits
      // over the retriever's own limit (PlanLint.emptyPartitionWindows
      // asserts the bound; a lit(0) partition spec would be folded
      // away by EliminateWindowPartitions anyway — round 15)
      def ranked(df: org.apache.spark.sql.DataFrame) =
        df.withColumn("rank", row_number().over(
            Window.orderBy(col("score").desc, col("doc_id"))).cast("long"))
          .select(col("doc_id"), col("rank"))
      graft.operators.Search.rboOverlap(
        ranked(graft.operators.Search.bm25TopK(docs, col("doc_id"),
          col("text"), terms, k = 30)),
        ranked(graft.operators.Search.topK(docs, col("doc_id"),
          col("text"), terms, k = 30)),
        k = 30, pPpm = 900000L)
    },
    Some(s"""
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
      ea AS (SELECT doc_id,
          ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS ra FROM bm),
      eb AS (SELECT doc_id,
          ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rb FROM tfidf),
      ent AS (
        SELECT GREATEST(ra, rb) AS entry FROM ea JOIN eb USING (doc_id)
        WHERE GREATEST(ra, rb) <= 30),
      wt(d, w) AS (VALUES ${rboWeightValues(30, 900000L)}),
      xd AS (
        SELECT wt.d, wt.w, COUNT(ent.entry) AS x
        FROM wt LEFT JOIN ent ON ent.entry <= wt.d
        GROUP BY wt.d, wt.w)
      SELECT CAST(30 AS BIGINT) AS k,
        CAST(COALESCE(MAX(CASE WHEN d = 30 THEN x END), 0) AS BIGINT)
          AS overlap_at_k,
        CAST(COALESCE(SUM((w * x) // d), 0) AS BIGINT) AS rbo_ppb
      FROM xd"""),
  )

  // --------------------------------------------------------------- q192
  /** Peak state concurrency: how many users were simultaneously in
    * each event-type state ([[graft.operators.Concurrency]] over the
    * q128 SCD2 intervals), with the earliest instant attaining the
    * peak. The oracle does what the operator deliberately does NOT —
    * a per-attr window running sum — which is exactly the
    * equivalence being graded: the composite-order two-phase prefix
    * minus per-attr base must equal the per-group window.
    */
  val q192Concurrency: QueryDef = QueryDef(
    "q192_concurrency",
    (s, dir) => {
      val intervals = graft.operators.Scd2.build(
        Tables(s, dir, "events"), col("user_id"), col("event_type"),
        col("ts"), col("event_id"))
        .select(col("attr"), col("valid_from_us").as("from_us"),
          col("valid_to_us").as("to_us"))
      graft.operators.Concurrency.maxConcurrency(intervals)
        .orderBy(col("attr"))
    },
    Some(s"""
      WITH ${scd2Ctes("a", "event_type").trim}
      , deltas AS (
        SELECT attr, valid_from_us AS t, 1 AS delta FROM af
        UNION ALL
        SELECT attr, valid_to_us AS t, -1 AS delta FROM af
        WHERE valid_to_us IS NOT NULL)
      , cells AS (
        SELECT attr, t, CAST(SUM(delta) AS BIGINT) AS delta
        FROM deltas GROUP BY attr, t)
      , conc AS (
        SELECT attr, t, CAST(SUM(delta) OVER (PARTITION BY attr
          ORDER BY t ROWS UNBOUNDED PRECEDING) AS BIGINT) AS c
        FROM cells)
      , mx AS (SELECT attr, MAX(c) AS max_concurrency
               FROM conc GROUP BY attr)
      SELECT conc.attr AS attr, mx.max_concurrency, MIN(t) AS at_us
      FROM conc JOIN mx ON conc.attr = mx.attr
        AND conc.c = mx.max_concurrency
      GROUP BY conc.attr, mx.max_concurrency
      ORDER BY attr"""),
  )

  // --------------------------------------------------------------- q193
  /** Exact weighted quantiles per return flag — the quartiles of
    * line-item PRICE weighted by QUANTITY ("the price point below
    * which a quarter of the units ship"), on
    * [[graft.operators.Stats.weightedQuantiles]]'s grouped two-phase
    * prefix machinery. Inverse-CDF convention, exact integer
    * comparison (cum·10⁶ ≥ q·total). The oracle replays with the
    * per-group window the operator avoids — the q192 equivalence
    * grade applied to weighted order statistics.
    */
  val q193WeightedQuantiles: QueryDef = QueryDef(
    "q193_weighted_quantiles",
    (s, dir) =>
      graft.operators.Stats.weightedQuantiles(
        Tables(s, dir, "lineitem"), col("l_returnflag"),
        floor(col("l_extendedprice")), floor(col("l_quantity")),
        Seq(250000L, 500000L, 750000L))
        .orderBy(col("grp"), col("q_ppm")),
    Some("""
      WITH cells AS (
        SELECT l_returnflag AS grp,
          CAST(floor(l_extendedprice) AS BIGINT) AS v,
          CAST(SUM(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT) AS w
        FROM lineitem WHERE CAST(floor(l_quantity) AS BIGINT) > 0
        GROUP BY 1, 2),
      cum AS (
        SELECT grp, v, w, CAST(SUM(w) OVER (PARTITION BY grp ORDER BY v
          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cw
        FROM cells),
      tot AS (SELECT grp, MAX(cw) AS total_w FROM cum GROUP BY grp),
      qs(q_ppm) AS (VALUES (250000), (500000), (750000)),
      sel AS (
        SELECT cum.grp, q_ppm, MIN(v) AS value, total_w
        FROM cum JOIN tot USING (grp) CROSS JOIN qs
        WHERE cw * 1000000 >= q_ppm * total_w
        GROUP BY cum.grp, q_ppm, total_w)
      SELECT sel.grp AS grp, CAST(q_ppm AS BIGINT) AS q_ppm, value,
        cum.cw AS cum_w, sel.total_w
      FROM sel JOIN cum ON sel.grp = cum.grp AND sel.value = cum.v
      ORDER BY grp, q_ppm"""),
  )

  // --------------------------------------------------------------- q194
  /** Mann–Whitney U between purchase and click value distributions
    * (cents, q171's rounding), in exact doubled integers
    * ([[graft.operators.Stats.mannWhitneyU2]]) — the rank-sum
    * complement to the KS gate: q171 sees the largest local CDF gap,
    * q194 the global stochastic dominance. One row
    * (n_a, n_b, u2_a, u2_b); the U2a + U2b = 2·n_a·n_b identity is
    * spec-pinned, and the oracle replays histograms → exclusive
    * prefixes → the doubled-tie sum.
    */
  val q194MannWhitney: QueryDef = QueryDef(
    "q194_mann_whitney",
    (s, dir) => {
      val ev = Tables(s, dir, "events").filter(col("value").isNotNull)
      val cents = (signum(col("value")) *
        floor(abs(col("value")) * 100 + lit(0.5))).cast("long")
      graft.operators.Stats.mannWhitneyU2(
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
      c AS (SELECT v, ca, cb,
          SUM(ca) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) - ca
            AS lta,
          SUM(cb) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) - cb
            AS ltb
        FROM j)
      SELECT CAST(SUM(ca) AS BIGINT) AS n_a,
        CAST(SUM(cb) AS BIGINT) AS n_b,
        CAST(SUM(2 * ca * ltb + ca * cb) AS BIGINT) AS u2_a,
        CAST(SUM(2 * cb * lta + ca * cb) AS BIGINT) AS u2_b
      FROM c"""),
  )

  // --------------------------------------------------------------- q195
  /** Maximum drawdown per user of the signed purchase-minus-error
    * balance over event time ([[graft.operators.Stats.maxDrawdown]]):
    * the largest peak-to-trough drop and its earliest trough instant.
    * Composes the grouped-prefix SUM (balance) with the grouped-
    * prefix MAX (high-water mark) — the non-invertible-monoid scan,
    * whose cross-partition carry is a window bounded by
    * shuffle.partitions, never by a user's history. The oracle does
    * both scans with the per-user windows the operator avoids.
    */
  val q195Drawdown: QueryDef = QueryDef(
    "q195_drawdown",
    (s, dir) => {
      val ev = Tables(s, dir, "events")
        .filter(col("event_type").isin("purchase", "error") &&
          col("value").isNotNull)
      graft.operators.Stats.maxDrawdown(ev,
          col("user_id"),
          unix_micros(col("ts").cast("timestamp")),
          when(col("event_type") === "purchase",
            floor(col("value")).cast("long"))
            .otherwise(-floor(col("value")).cast("long")))
        .orderBy(col("grp"))
    },
    Some("""
      WITH base AS (
        SELECT user_id AS grp, CAST(epoch_ns(ts) // 1000 AS BIGINT) AS k,
          CAST(CASE WHEN event_type = 'purchase' THEN floor(value)
               ELSE -floor(value) END AS BIGINT) AS d
        FROM events
        WHERE event_type IN ('purchase', 'error') AND value IS NOT NULL),
      cells AS (SELECT grp, k, CAST(SUM(d) AS BIGINT) AS d
        FROM base GROUP BY 1, 2),
      bal AS (SELECT grp, k, CAST(SUM(d) OVER (PARTITION BY grp
          ORDER BY k ROWS UNBOUNDED PRECEDING) AS BIGINT) AS b
        FROM cells),
      dd AS (SELECT grp, k, CAST(MAX(b) OVER (PARTITION BY grp
          ORDER BY k ROWS UNBOUNDED PRECEDING) - b AS BIGINT) AS dd
        FROM bal),
      mx AS (SELECT grp, MAX(dd) AS max_drawdown FROM dd GROUP BY grp)
      SELECT dd.grp AS grp, mx.max_drawdown, MIN(k) AS at_key
      FROM dd JOIN mx ON dd.grp = mx.grp AND dd.dd = mx.max_drawdown
      GROUP BY dd.grp, mx.max_drawdown
      ORDER BY grp"""),
  )

  // --------------------------------------------------------------- q196
  /** Three-way merge census ([[graft.operators.Merge3]]): two
    * synthetic branches of lineitem diverge from base — ours bumps
    * quantities on the %100=1 orders, deletes the %100=2 orders, and
    * inserts a line 9 on the %100=5 orders; theirs bumps PRICES on
    * %100=3, bumps quantities DIFFERENTLY on %100=1 (true conflict),
    * makes the same %100=2 deletes and the same %100=5 inserts
    * (convergent edits), plus its own %100=7 inserts. Every verdict
    * class is populated; the key is orderkey·10+linenumber and the
    * "hash" the canonical value quantity·10⁶+price-floor (exact
    * replay, the sync contract). Graded as the verdict census with
    * merged-value sums.
    */
  val q196ThreeWayMerge: QueryDef = QueryDef(
    "q196_three_way_merge",
    (s, dir) => {
      val li = Tables(s, dir, "lineitem").select(
        (col("l_orderkey") * 10 + col("l_linenumber")).as("k"),
        col("l_orderkey").as("ok"),
        col("l_linenumber").as("ln"),
        floor(col("l_quantity")).cast("long").as("q"),
        floor(col("l_extendedprice")).cast("long").as("p"))
      def h(q: org.apache.spark.sql.Column, p: org.apache.spark.sql.Column) =
        (q * 1000000L + p).as("h")
      val base = li.select(col("k"), h(col("q"), col("p")))
      val inserts5 = li.filter(col("ok") % 100 === 5 && col("ln") === 1)
        .select((col("ok") * 10 + 9).as("k"), h(lit(99L), col("p")))
      val ours = li.filter(!(col("ok") % 100 === 2))
        .select(col("k"),
          h(when(col("ok") % 100 === 1, col("q") + 1).otherwise(col("q")),
            col("p")))
        .unionByName(inserts5)
      val theirs = li.filter(!(col("ok") % 100 === 2))
        .select(col("k"),
          h(when(col("ok") % 100 === 1, col("q") + 2).otherwise(col("q")),
            when(col("ok") % 100 === 3, col("p") + 1).otherwise(col("p"))))
        .unionByName(inserts5)
        .unionByName(li.filter(col("ok") % 100 === 7 && col("ln") === 1)
          .select((col("ok") * 10 + 9).as("k"), h(lit(77L), col("p"))))
      graft.operators.Merge3.threeWayMerge(base, ours, theirs)
        .groupBy(col("verdict"))
        .agg(count(lit(1)).as("n"),
          sum(coalesce(col("h_merged"), lit(0L))).as("merged_sum"))
        .orderBy(col("verdict"))
    },
    Some("""
      WITH li AS (
        SELECT l_orderkey * 10 + l_linenumber AS k,
          l_orderkey AS ok, l_linenumber AS ln,
          CAST(floor(l_quantity) AS BIGINT) AS q,
          CAST(floor(l_extendedprice) AS BIGINT) AS p
        FROM lineitem),
      base AS (SELECT k, q * 1000000 + p AS h FROM li),
      ins5 AS (SELECT ok * 10 + 9 AS k, 99 * 1000000 + p AS h
        FROM li WHERE ok % 100 = 5 AND ln = 1),
      ours AS (
        SELECT k, (CASE WHEN ok % 100 = 1 THEN q + 1 ELSE q END)
          * 1000000 + p AS h
        FROM li WHERE NOT (ok % 100 = 2)
        UNION ALL SELECT k, h FROM ins5),
      theirs AS (
        SELECT k, (CASE WHEN ok % 100 = 1 THEN q + 2 ELSE q END)
          * 1000000
          + (CASE WHEN ok % 100 = 3 THEN p + 1 ELSE p END) AS h
        FROM li WHERE NOT (ok % 100 = 2)
        UNION ALL SELECT k, h FROM ins5
        UNION ALL SELECT ok * 10 + 9 AS k, 77 * 1000000 + p AS h
          FROM li WHERE ok % 100 = 7 AND ln = 1),
      j AS (
        SELECT COALESCE(b.k, o.k, t.k) AS k, b.h AS hb, o.h AS ho,
          t.h AS ht
        FROM base b
        FULL OUTER JOIN ours o ON b.k = o.k
        FULL OUTER JOIN theirs t ON COALESCE(b.k, o.k) = t.k),
      v AS (
        SELECT k,
          CASE WHEN ho IS NOT DISTINCT FROM hb
                AND ht IS NOT DISTINCT FROM hb THEN 'unchanged'
               WHEN ho IS NOT DISTINCT FROM hb THEN 'take_theirs'
               WHEN ht IS NOT DISTINCT FROM hb THEN 'take_ours'
               WHEN ho IS NOT DISTINCT FROM ht THEN 'both_same'
               ELSE 'conflict' END AS verdict,
          CASE WHEN ho IS NOT DISTINCT FROM hb
                AND ht IS NOT DISTINCT FROM hb THEN hb
               WHEN ho IS NOT DISTINCT FROM hb THEN ht
               WHEN ht IS NOT DISTINCT FROM hb THEN ho
               WHEN ho IS NOT DISTINCT FROM ht THEN ho
               ELSE NULL END AS h_merged
        FROM j)
      SELECT verdict, COUNT(*) AS n,
        CAST(SUM(COALESCE(h_merged, 0)) AS BIGINT) AS merged_sum
      FROM v GROUP BY verdict ORDER BY verdict"""),
  )

  // --------------------------------------------------------------- q197
  /** Cumulative distinct reach of users by hour
    * ([[graft.operators.Stats.cumulativeDistinct]]): per hour, the
    * first-time users and the total ever seen — exact
    * first-occurrence collapse + two-phase running sum, never a
    * distinct-within-window rescan. The oracle replays
    * min-day-per-user, daily counts, and a window running total.
    */
  val q197CumulativeDistinct: QueryDef = QueryDef(
    "q197_cumulative_distinct",
    (s, dir) =>
      graft.operators.Stats.cumulativeDistinct(
        Tables(s, dir, "events"), col("user_id"),
        expr("unix_micros(cast(ts as timestamp)) div 3600000000"))
        .orderBy(col("bucket")),
    Some("""
      WITH f AS (
        SELECT user_id,
          MIN(CAST(epoch_ns(ts) // 1000 AS BIGINT) // 3600000000) AS b
        FROM events WHERE user_id IS NOT NULL GROUP BY user_id),
      d AS (SELECT b, COUNT(*) AS new_keys FROM f GROUP BY b)
      SELECT b AS bucket, new_keys,
        CAST(SUM(new_keys) OVER (ORDER BY b ROWS UNBOUNDED PRECEDING)
          AS BIGINT) AS cum_distinct
      FROM d ORDER BY bucket"""),
  )

  // --------------------------------------------------------------- q198
  /** The production near-dup loop graded END-TO-END in one row set:
    * MinHash+LSH candidate pairs with exact-Jaccard verify (q35's
    * operator) → alternating-star connected components with
    * min-representative keep (q68's operator) → per-source kept-
    * corpus census (docs, survivors, characters in and out). The
    * stages are individually hash-green; this row grades their
    * COMPOSITION — the actual pipeline a curation run executes — so
    * a contract drift between stages (id types, missing singleton
    * nodes, rep-choice convention) fails here even if each stage
    * still passes alone. Oracle: exact all-pairs Jaccard (banding is
    * recall-complete at 0.8 on this corpus — the q35 equivalence) +
    * recursive minimum-label propagation + the same census.
    */
  val q198DedupE2e: QueryDef = QueryDef(
    "q198_dedup_e2e",
    (s, dir) => {
      val docs = Tables(s, dir, "documents")
      val pairs = graft.operators.Dedup.minhashLshPairs(docs,
        col("doc_id"), col("text"), n = 3, threshold = 0.8)
      val clusters = graft.operators.Components.dedupClusters(
        pairs.select(col("id_a").as("src"), col("id_b").as("dst")),
        docs.select(col("doc_id").as("node")))
      docs.join(clusters, col("doc_id") === col("node"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("is_rep")).as("n_kept"),
          sum(col("n_chars")).as("chars_total"),
          sum(when(col("is_rep") === 1, col("n_chars"))
            .otherwise(0L)).as("chars_kept"))
        .orderBy(col("source"))
    },
    Some("""
      WITH RECURSIVE docs AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      sh AS (
        SELECT doc_id,
          list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                         for i in range(1, len(t) - 1)]) AS shingles
        FROM docs WHERE len(t) >= 3),
      p AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
            / len(list_distinct(a.shingles || b.shingles)) >= 0.8),
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

  // --------------------------------------------------------------- q199
  /** One-sided CUSUM monitoring of hourly event volumes per type
    * ([[graft.operators.Stats.cusumAlarms]], allowance k = 3 ≈ the
    * mean hourly rate, threshold h = 15): the sequential-looking
    * recursion max(0, S+d) computed as two grouped scans via the
    * closed form S_t = P_t − min(P_0..P_t). The oracle replays both
    * scans with per-group windows and the same GREATEST(…, 0) virtual
    * start — grading the closed form against the textbook definition.
    */
  val q199Cusum: QueryDef = QueryDef(
    "q199_cusum",
    (s, dir) => {
      val cells = Tables(s, dir, "events")
        .groupBy(col("event_type").as("g"),
          expr("unix_micros(cast(ts as timestamp)) div 3600000000")
            .as("ky"))
        .agg(count(lit(1)).as("x"))
      graft.operators.Stats.cusumAlarms(cells, col("g"), col("ky"),
          col("x"), k = 3L, h = 15L)
        .orderBy(col("grp"))
    },
    Some("""
      WITH cells AS (
        SELECT event_type AS g,
          CAST(epoch_ns(ts) // 1000 // 3600000000 AS BIGINT) AS ky,
          COUNT(*) AS x
        FROM events GROUP BY 1, 2),
      p AS (
        SELECT g, ky, CAST(SUM(x - 3) OVER (PARTITION BY g ORDER BY ky
          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS pd
        FROM cells),
      s AS (
        SELECT g, ky, pd + GREATEST(MAX(-pd) OVER (PARTITION BY g
          ORDER BY ky ROWS UNBOUNDED PRECEDING), 0) AS s
        FROM p),
      mx AS (SELECT g, MAX(s) AS max_stat FROM s GROUP BY g),
      am AS (SELECT s.g, mx.max_stat, MIN(ky) AS at_key
        FROM s JOIN mx ON s.g = mx.g AND s.s = mx.max_stat
        GROUP BY s.g, mx.max_stat),
      al AS (SELECT g, MIN(ky) AS first_alarm_key FROM s
        WHERE s > 15 GROUP BY g)
      SELECT am.g AS grp, am.max_stat, am.at_key, al.first_alarm_key
      FROM am LEFT JOIN al ON am.g = al.g
      ORDER BY grp"""),
  )

  // --------------------------------------------------------------- q200
  /** Total covered (active) time per user: each event opens an
    * activity window of `value` seconds; the union length merges the
    * overlaps ([[graft.operators.Concurrency.coveredTime]] —
    * row-local transition flags on one grouped prefix sum, no
    * lead/lag, no per-group window). The oracle is the INDEPENDENT
    * island formulation: intervals sorted, a new island wherever
    * from exceeds the running max of prior ends, union length =
    * Σ island spans — merging by windows what the operator merges by
    * telescoping.
    */
  val q200CoveredTime: QueryDef = QueryDef(
    "q200_covered_time",
    (s, dir) => {
      val f = expr("unix_micros(cast(ts as timestamp))")
      val iv = Tables(s, dir, "events")
        .filter(col("value").isNotNull)
        .select(col("user_id").as("grp"), f.as("from_us"),
          (f + floor(col("value")).cast("long") * 1000000L).as("to_us"))
      graft.operators.Concurrency.coveredTime(iv)
        .orderBy(col("grp"))
    },
    Some("""
      WITH iv0 AS (
        SELECT user_id AS grp,
          CAST(epoch_ns(ts) // 1000 AS BIGINT) AS f,
          CAST(epoch_ns(ts) // 1000 AS BIGINT)
            + CAST(floor(value) AS BIGINT) * 1000000 AS t
        FROM events WHERE value IS NOT NULL),
      iv AS (SELECT grp, f, t FROM iv0 WHERE t > f),
      marked AS (
        SELECT grp, f, t,
          CASE WHEN f > COALESCE(MAX(t) OVER (PARTITION BY grp
            ORDER BY f, t ROWS BETWEEN UNBOUNDED PRECEDING
            AND 1 PRECEDING), -9223372036854775808) THEN 1 ELSE 0 END
            AS new_island
        FROM iv)
      , isl AS (
        SELECT grp, f, t, CAST(SUM(new_island) OVER (PARTITION BY grp
          ORDER BY f, t ROWS UNBOUNDED PRECEDING) AS BIGINT) AS island
        FROM marked)
      , spans AS (
        SELECT grp, island, MAX(t) - MIN(f) AS len FROM isl
        GROUP BY grp, island)
      SELECT grp, CAST(SUM(len) AS BIGINT) AS covered_us,
        COUNT(*) AS n_segments
      FROM spans GROUP BY grp ORDER BY grp"""),
  )

  val all: Seq[QueryDef] = Seq(q187FdDiscovery, q188IndDiscovery,
    q189Cube, q190TemporalJoin, q191Rbo, q192Concurrency,
    q193WeightedQuantiles, q194MannWhitney, q195Drawdown,
    q196ThreeWayMerge, q197CumulativeDistinct, q198DedupE2e, q199Cusum,
    q200CoveredTime)
}
