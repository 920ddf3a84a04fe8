package graft.queries

import graft.{QueryDef, Tables}
import graft.operators.{Components, Dedup}
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

  val all: Seq[QueryDef] = Seq(q68DedupClusters)
}
