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

  val all: Seq[QueryDef] = Seq(q187FdDiscovery, q188IndDiscovery, q189Cube)
}
