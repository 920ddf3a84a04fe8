package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.operators.Checkpoints.TruncateOps

/** Fixed-point Lloyd k-means — the iterative "trained component"
  * sibling of the one-shot q65 centroids, designed so the whole fit is
  * bit-reproducible across engines, runs, and partitionings.
  *
  * Everything that normally makes distributed k-means
  * non-deterministic is pinned:
  *   - init: the k smallest ids' vectors (no RNG);
  *   - arithmetic: vectors are quantized to micro-unit LONGs
  *     (sign-safe half-up, the q79 pattern), centroids are re-quantized
  *     to micro-units after every update with an integer half-up
  *     divide, so every distance is an exact integer sum of squares —
  *     no float accumulation anywhere, hence no reduction-order drift;
  *   - argmin ties break to the smaller cluster id (lexicographic
  *     struct min);
  *   - a cluster that loses all its points keeps its previous centroid.
  *
  * Scale shape (the MLlib pattern, cf. Spark's own
  * `mllib.clustering.KMeans.runAlgorithm`): the quantized projection is
  * localCheckpoint'ed once (one scan of the input; at 100 TB this is
  * the cached working set every iteration re-reads), each iteration is
  * one narrow map with the k centroids embedded as ONE
  * array<array<long>> literal riding the serialized plan (k·dims
  * longs of plan payload — no join, no shuffle of the big side; the
  * argmin is a fold over that array, so generated-code size is O(1)
  * in k, never stressing Janino's 64 KB method limit) plus one
  * partial-agg groupBy on (cluster, dim) whose result is k·dims rows,
  * collected to the driver exactly like MLlib collects its centroid
  * updates. Driver traffic per iteration is O(k·dims), independent of
  * corpus size.
  *
  * Overflow bounds: at embedding-normalized |v| ≤ 1 a micro-unit
  * component is ≤ 1e6, a per-dim squared delta ≤ 4e12, a 64-dim
  * distance ≤ 2.6e14, and a per-(cluster,dim) update sum s is safe
  * while 2·|s| + n stays under 2^63 — `halfUpDiv` doubles s, so the
  * bound is |s| ≲ 4.6e18, i.e. ~4.6e12 rows per cluster — not
  * reachable.
  */
object KMeans {

  /** Micro-unit quantization, sign-safe half-up (round() HALF_UP on
    * negatives differs across engines — spelled with sign/floor, the
    * Similarity.scala:186 pattern).
    */
  private[graft] def quantize(vec: Column): Column =
    transform(vec, x =>
      (signum(x.cast("double")) *
        floor(abs(x.cast("double")) * 1000000 + lit(0.5))).cast("long"))

  /** Integer half-up divide s/n for n > 0, matching the oracle's
    * `CASE WHEN s >= 0 THEN (2s+n)//(2n) ELSE -((-2s+n)//(2n)) END`.
    */
  private[graft] def halfUpDiv(s: Long, n: Long): Long =
    if (s >= 0) (2 * s + n) / (2 * n) else -((-2 * s + n) / (2 * n))

  /** Runs `iters` Lloyd updates from the deterministic init and
    * returns the final assignment: (vec_id, cluster, dist) with dist
    * the exact integer squared L2 distance in micro-units². Triggers
    * `iters + 1` Spark jobs at construction time (each collects only
    * k·dims longs) — inherent to iterative fitting, same contract as
    * MLlib's fit().
    */
  def fit(emb: DataFrame, id: Column, vec: Column, k: Int,
      iters: Int): DataFrame = {
    val q0 = emb.select(id.cast("long").as("vec_id"),
      quantize(vec).as("q"))
    // init BEFORE checkpointing: k smallest ids via TakeOrdered
    val initRows = q0.select(col("vec_id"), col("q"))
      .orderBy(col("vec_id")).limit(k).collect()
    require(initRows.length == k,
      s"kmeans: need at least k=$k rows, got ${initRows.length}")
    val dims = initRows.head.getSeq[Long](1).length
    // one full scan, then every iteration re-reads the materialized
    // quantized projection — the cached working set
    val q = q0
      .withColumn("q", when(size(col("q")) === dims, col("q"))
        .otherwise(raise_error(concat(lit(s"kmeans: expected $dims dims, got "),
          size(col("q")).cast("string")))))
      .truncated

    var centroids: Array[Array[Long]] =
      initRows.sortBy(_.getLong(0)).map(_.getSeq[Long](1).toArray)

    // Argmin as a fold over ONE array<array<long>> centroid literal:
    // generated code is fixed-size regardless of k (a least(struct…)
    // over k per-centroid folds would grow linearly and trip Janino's
    // 64 KB method limit at k in the hundreds). Iterating j ascending
    // and replacing only on strictly-smaller distance keeps the
    // smallest cluster id on ties — the same tie-break as the
    // lexicographic struct min.
    def bestOf(cs: Array[Array[Long]]): Column = {
      val cents = typedLit(cs.map(_.toSeq).toSeq)
      aggregate(
        sequence(lit(0), lit(cs.length - 1)),
        struct(lit(Long.MaxValue).as("dist"), lit(-1L).as("cluster")),
        (acc, j) => {
          val d = aggregate(
            zip_with(col("q"), element_at(cents, j + 1),
              (a, b) => (a - b) * (a - b)),
            lit(0L), (s, x) => s + x)
          when(d < acc.getField("dist"),
            struct(d.as("dist"), j.cast("long").as("cluster")))
            .otherwise(acc)
        })
    }

    for (_ <- 1 to iters) {
      val sums = q.select(col("vec_id"), bestOf(centroids).as("b"), col("q"))
        .select(col("b.cluster").as("cluster"),
          posexplode(col("q")).as(Seq("dim", "v")))
        .groupBy(col("cluster"), col("dim"))
        .agg(count(lit(1)).as("n"), sum(col("v")).as("s"))
        .collect()
      val next = centroids.map(_.clone())
      sums.foreach { r =>
        next(r.getLong(0).toInt)(r.getInt(1)) =
          halfUpDiv(r.getLong(3), r.getLong(2))
      }
      centroids = next
    }

    q.select(col("vec_id"), bestOf(centroids).as("b"))
      .select(col("vec_id"), col("b.cluster").as("cluster"),
        col("b.dist").as("dist"))
  }
}
