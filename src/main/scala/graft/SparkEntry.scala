package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Every graded query, from all module registries. */
  def defs: Seq[QueryDef] =
    queries_.distinctBy(_.name)

  private def queries_ : Seq[QueryDef] =
    graft.queries.CoreQueries.all ++ graft.queries.DomainQueries.all ++
      graft.queries.ScaleQueries.all ++ graft.queries.PipelineQueries.all ++
      graft.queries.CurationQueries.all ++ graft.queries.Round8Queries.all ++
      graft.queries.IntegrityQueries.all ++
      graft.queries.AssociationQueries.all ++
      graft.queries.SchemaQueries.all ++
      graft.queries.AnalyticsQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries.apply("q03_join_revenue")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    defs.map(d => d.name -> d.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    defs.flatMap(d => d.oracle.map(sql => d.name -> sql.trim)).toMap

  /** Queries Bench times at sf0.1. */
  def headline: Seq[QueryDef] = defs.filter(_.headline)

  /** Representatives of the 100 TB scale families, timed by Bench as a
    * second `scale_total` section (round 9): sparse all-pairs cosine,
    * stored-index incremental near-dedup, BPE vocabulary training,
    * PageRank, grid-blocked DBSCAN, HLL sketch build+merge. The headline
    * section alone only covered two of the scale-surface operators; a
    * regression in any of these families was previously invisible to the
    * per-round bench artifact.
    */
  private val scaleBenchNames: Seq[String] = Seq(
    "q95_sparse_cosine",
    "q122_indexed_near_dedup",
    "q125_bpe_merges",
    "q93_pagerank",
    "q207_dbscan",
    "q141_hll_replay",
  )

  def scaleBench: Seq[QueryDef] = {
    val byName = defs.map(d => d.name -> d).toMap
    scaleBenchNames.map(byName)
  }

  /** The gated sf1 bench additionally times the near-dup pair
    * generators the round-11 explosive-join pins target (q34's adaptive
    * count/prefix join, q35's banded LSH) so the starvation fix has a
    * per-round trend line at the scale where it bites — extended in
    * round 12 with the two remaining pinned near-dup family members
    * (q36 SimHash pigeonhole, q37 grid-tile cosine), which the smoke
    * covered but no gated artifact timed, and one stateful streaming
    * drain (q118 count-min over the micro-batched events feed) so
    * stream latency has a gated trend line at 100× grading scale.
    * Kept OUT of the sf0.1 `scale_total` section so that number stays
    * comparable across rounds.
    */
  def scaleBenchSf1: Seq[QueryDef] = {
    val byName = defs.map(d => d.name -> d).toMap
    // q236 replaces q36 here (round 13): q36's sf1 answer is 99.7 M
    // pairs and its graded ORDER BY was ~90% of the row's wall-clock
    // (bench/PROFILE_TEXTFAMILY_r12.txt) — the trend row measured the
    // presentation sort, not the operator. q236 composes the same
    // signature-level SimHash stage into clusters→kept-corpus (the
    // operation a pipeline actually runs), so its row regresses on
    // compute. q36 itself stays oracle-graded in the registry.
    // q235 (round 13): the versioned-store lifecycle (upsert ×3 →
    // time-travel → compact → diff) is the day-2 write path; grade its
    // latency at 100× too, not just its sf0.01 correctness.
    // q238 (round 14): the day-1 index build q122 amortizes into
    // warm-up, rebuilt fresh every call — both lifecycle halves of the
    // stored-index dedup stay measured (r13 verdict "What's wrong #1").
    // q83 (round 14): the blocked edit-distance pairs row — fixed this
    // round from >22 min single-threaded to ~13 s (duplicate collapse
    // + work-derived per-block salting) — gets a gated trend line so
    // the salted path stays measured at the scale where it bites.
    // q247 (round 15): the density-invariant DBSCAN derivation — the
    // corpus shape a spatial workload actually has (q207's fixed grid
    // multiplies density with SF); its sf10 probe is the family's
    // decade evidence, so its sf1 latency gets a gated trend line too.
    scaleBench ++ Seq("q34_ngram_jaccard", "q35_minhash_lsh",
      "q236_simhash_dedup_e2e", "q37_cosine_pairs",
      "q118_stream_count_min", "q235_store_lifecycle",
      "q238_index_build", "q83_edit_distance",
      "q247_dbscan_density").map(byName)
  }
}
