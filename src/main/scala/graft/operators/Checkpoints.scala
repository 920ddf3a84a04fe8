package graft.operators

import org.apache.spark.sql.DataFrame

/** Lineage truncation for iterative operators (connected components,
  * PageRank/BFS, k-means, BPE merges). Each round's output must be cut
  * from its ancestry or the logical plan — and with it Catalyst
  * analysis time — grows without bound across rounds.
  *
  * Two strategies, selected by configuration at call time:
  *
  *   - default: `localCheckpoint()` — executor-local block storage.
  *     Cheapest (no DFS round-trip), correct on `local[*]`, but the
  *     blocks die with their executor, so on a real cluster an executor
  *     loss mid-iteration kills the whole job (lineage was truncated;
  *     there is nothing to recompute from).
  *   - reliable: `checkpoint()` to the SparkContext checkpoint
  *     directory — survives executor loss, costs one DFS write per
  *     round. Enable with
  *     `spark.conf.set("spark.graft.checkpoint.reliable", "true")`
  *     AFTER `sc.setCheckpointDir(dir)`; the knob without a checkpoint
  *     dir is a configuration error and fails fast rather than
  *     silently downgrading durability.
  *
  * Both are eager (the round materializes here), so per-round
  * convergence metrics collected via `Dataset.observe` fire during
  * this one action. Results are strategy-independent — the spec pins
  * identical output either way (the strategy changes only where the
  * materialized blocks live).
  *
  * RELIABLE-MODE CAVEATS (Spark's documented `checkpoint()` costs, not
  * ours to fix):
  *
  *   - `checkpoint()` runs the plan TWICE — once for the eager action,
  *     once more when the RDD re-executes to write the checkpoint
  *     files — so each round pays ~2× compute, and any
  *     `Dataset.observe` metric riding the action may count each row
  *     twice. Every observation this repo folds into a truncation
  *     (Components' edges/new_edges, dbscan's nPairs) is used only in
  *     scale-invariant ways — 0 stays 0, cur/next scale together, and
  *     nPairs merely picks a strategy with a wide tolerance band — so
  *     correctness holds, but DO NOT read such observed values as
  *     absolute counts under the reliable knob. (Persisting before the
  *     checkpoint would dodge the re-compute but caches every round of
  *     an iterative loop — eviction churn at exactly the scale the
  *     reliable knob targets — so the double-compute is the documented
  *     trade instead.)
  *   - checkpoint files accumulate one directory per round; Spark
  *     cleans them only with
  *     `spark.cleaner.referenceTracking.cleanCheckpoints=true` (set it
  *     alongside the knob) or an external sweep of the checkpoint dir.
  *     The measured DFS cost at scale is recorded in SCALING.md.
  */
object Checkpoints {

  val ReliableKey = "spark.graft.checkpoint.reliable"

  /** Measurement hook (round 18, r17 verdict item 7): a checkpoint
    * replaces its upstream with `Scan ExistingRDD` in every LATER
    * explain, so the committed plan evidence for truncated queries
    * (q95/q34/q236-shaped) showed only a stub. When this conf holds a
    * non-empty path prefix, each truncation first dumps its segment's
    * formatted plan to `<prefix>_seg<N>.txt` (N per prefix, 2 digits).
    * Set by ProfileMain around plan capture; empty (the default)
    * everywhere else — Bench/Verify pay one conf read per truncate.
    */
  val DumpPrefixKey = "spark.graft.checkpoint.dumpPrefix"

  private val dumpSeq =
    new java.util.concurrent.ConcurrentHashMap[String,
      java.util.concurrent.atomic.AtomicInteger]()

  private def dumpIfRequested(df: DataFrame): Unit = {
    val prefix = df.sparkSession.conf.get(DumpPrefixKey, "")
    if (prefix.nonEmpty) {
      val n = dumpSeq.computeIfAbsent(prefix,
        _ => new java.util.concurrent.atomic.AtomicInteger(0))
        .getAndIncrement()
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      java.nio.file.Files.write(
        java.nio.file.Paths.get(f"${prefix}_seg$n%02d.txt"),
        txt.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
  }

  /** True when the session asks for reliable checkpointing. */
  def reliable(df: DataFrame): Boolean =
    df.sparkSession.conf.get(ReliableKey, "false").toBoolean

  /** Truncate lineage eagerly, honoring [[ReliableKey]]. */
  def truncate(df: DataFrame): DataFrame = {
    dumpIfRequested(df)
    if (reliable(df)) {
      require(df.sparkSession.sparkContext.getCheckpointDir.isDefined,
        s"$ReliableKey=true but SparkContext has no checkpoint dir; " +
          "call sc.setCheckpointDir(...) first")
      df.checkpoint()
    } else df.localCheckpoint()
  }

  /** `df.truncated` — chain-friendly form of [[truncate]]. */
  implicit class TruncateOps(private val df: DataFrame) extends AnyVal {
    def truncated: DataFrame = Checkpoints.truncate(df)
  }
}
