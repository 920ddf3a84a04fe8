package graft.operators

import graft.functions.PortableHash
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch over integer keys — the frequency-estimation
  * complement of the KMV cardinality sketch (q109): fixed
  * d×w integer cells estimate per-key counts with one-sided error
  * (never an undercount), O(d·w) state total regardless of key
  * cardinality. d = 2 rows use the same Kirsch–Mitzenmacher probes as
  * the bloom filter (q110): pos₀ = h mod w, pos₁ = ⌊h/2¹⁵⌋ mod w off
  * one [[PortableHash.hash32]] value, so every cell sum and every
  * estimate replays exactly in SQL.
  *
  * Construction is a plain (row, pos) groupBy — 2·w cells of exact
  * integer counts with map-side combine; no custom aggregation state
  * is even needed, which is the point: the sketch IS a tiny
  * aggregation, so it inherits Spark's partial-agg scaling for free.
  * Estimation broadcast-joins the cell table (2·w rows) onto the
  * query keys and takes the min over rows.
  */
object FrequencySketch {

  private def positions(c: Column, w: Int): (Column, Column) = {
    val h = PortableHash.hash32(c)
    (pmod(h, lit(w.toLong)), pmod(shiftright(h, 15), lit(w.toLong)))
  }

  /** The d=2 × w cell table: (row, pos, cnt), exact integer counts. */
  def cmsCells(df: DataFrame, key: Column, w: Int): DataFrame = {
    require(w > 0 && (w & (w - 1)) == 0, "w must be a power of two")
    val (p0, p1) = positions(key, w)
    // null keys can't be queried (their probe is null) — keep them out
    // of the cells so they don't inflate other estimates' error
    df.filter(key.isNotNull).select(explode(array(
        struct(lit(0L).as("row"), p0.as("pos")),
        struct(lit(1L).as("row"), p1.as("pos")))).as("c"))
      .groupBy(col("c.row").as("row"), col("c.pos").as("pos"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Equi-join output-size estimate from two cell tables built with
    * the same (d, w) — the AMS/CMS inner-product estimator: per
    * sketch row, Σ_pos cntA·cntB; the estimate is the min over rows.
    * True size is Σ_k f_A(k)·f_B(k); hash collisions only ADD cross
    * terms, so the estimate never undercounts — an upper bound a
    * planner can trust for "can I afford this join" decisions without
    * touching either table again (2·w longs per side, mergeable,
    * reusable across every join the key participates in).
    *
    * Absent cells are zero counts, so the inner join over non-empty
    * cells computes the full inner product; a row with NO overlapping
    * non-empty cells has inner product 0, which the seeded left join
    * preserves (otherwise min() would silently skip that row and
    * return the other row's larger value — or nothing at all for two
    * disjoint sketches, whose correct estimate is exactly 0).
    *
    * Overflow bound: each product ≤ n_A·n_B for row totals n; at 1e9
    * rows a side the row inner product stays under 1e18 < 2^63. Above
    * that, sketch shards and merge cells first (cnt sums stay exact).
    */
  def cmsJoinSize(cellsA: DataFrame, cellsB: DataFrame): DataFrame = {
    val ip = cellsA.select(col("row"), col("pos"), col("cnt").as("ca"))
      .join(cellsB.select(col("row"), col("pos"), col("cnt").as("cb")),
        Seq("row", "pos"))
      .groupBy(col("row")).agg(sum(col("ca") * col("cb")).as("ip"))
    // seed with the sketch rows actually PRESENT in the inputs (never
    // a hardcoded d): a hardcoded row the builder didn't use would
    // coalesce to 0 and silently undercut the min for d != 2 sketches.
    // Two empty cell tables (empty build sides) estimate 0 via the
    // outer coalesce — the true join size of anything with nothing.
    val rows = cellsA.select(col("row"))
      .union(cellsB.select(col("row"))).distinct()
    rows.join(ip, Seq("row"), "left")
      .agg(coalesce(min(coalesce(col("ip"), lit(0L))), lit(0L))
        .as("est_join_size"))
  }

  /** Point estimates for `keys` (one column named by `keyName`):
    * min over the d rows of the addressed cells — ≥ the true count
    * always, equality unless another key collided in BOTH rows.
    *
    * Left joins + coalesce(0): a key whose probe lands in an empty
    * cell (any key unseen at build time) estimates 0 rather than
    * vanishing — querying arbitrary keys is the point of a CMS. Null
    * keys (null probes) also survive, estimating 0, matching their
    * exclusion from [[cmsCells]].
    */
  def cmsEstimates(cells: DataFrame, keys: DataFrame, key: Column,
      w: Int): DataFrame = {
    val (p0, p1) = positions(key, w)
    keys.select(key.as("key"), p0.as("p0"), p1.as("p1"))
      .join(broadcast(cells.filter(col("row") === 0)
        .select(col("pos").as("p0"), col("cnt").as("c0"))), Seq("p0"), "left")
      .join(broadcast(cells.filter(col("row") === 1)
        .select(col("pos").as("p1"), col("cnt").as("c1"))), Seq("p1"), "left")
      .select(col("key"),
        least(coalesce(col("c0"), lit(0L)), coalesce(col("c1"), lit(0L)))
          .as("est"))
  }
}
