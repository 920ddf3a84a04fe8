package graft.operators

import graft.operators.Checkpoints.TruncateOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  * Brute-force cosine top-k is the exact baseline (broadcast the query
  * batch, scan the corpus once — embarrassingly parallel at 100 TB);
  * the random-hyperplane LSH variant is the sublinear scale path
  * (approximate: candidates only from matching buckets).
  */
object Similarity {

  // codegen'd fold (bit-identical to the aggregate(zip_with(...)) form
  // and to the DuckDB list_reduce oracle) — the per-pair hot loop
  private def dotCos(vA: Column, vB: Column, nA: Column, nB: Column): Column =
    graft.plans.DotProduct.dot_product(vA, vB) / (nA * nB)

  private def withNorm(df: DataFrame, id: Column, vec: Column): DataFrame =
    df.select(id.as("id"), vec.as("v"))
      .withColumn("norm",
        sqrt(graft.plans.DotProduct.dot_product(col("v"), col("v"))))

  /** Exact top-k cosine neighbors for each query vector. The query side
    * is broadcast; the corpus is scanned once; per-query top-k via a
    * rank window partitioned by query id.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
      id: Column, vec: Column, k: Int): DataFrame = {
    val c = withNorm(corpus, id, vec)
    val q = withNorm(queries, id, vec)
    val scored = c.select(col("id").as("n_id"), col("v").as("n_v"), col("norm").as("n_norm"))
      .crossJoin(broadcast(
        q.select(col("id").as("q_id"), col("v").as("q_v"), col("norm").as("q_norm"))))
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("cosine", dotCos(col("q_v"), col("n_v"), col("q_norm"), col("n_norm")))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cosine").desc, col("n_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank").cast("long").as("rank"), col("n_id"),
        round(col("cosine"), 6).as("cosine"))
  }

  /** Deterministic pseudo-random hyperplane component for (plane, dim) —
    * fixed so bucket assignment is stable across runs. Shared with the
    * projection operator and the SQL oracles generated from the same
    * constants.
    */
  private[graft] def planeComponent(plane: Int, dim: Int): Double =
    (((plane * 73856093L + dim * 19349663L + 83492791L) % 1001L) - 500L) / 500.0

  /** Fixed-plane random projection: embed `dims`-dim vectors into
    * `outDims` dims with the deterministic hyperplane family — the
    * Johnson–Lindenstrauss-style dimensionality reduction a pipeline
    * runs before expensive pairwise work (4–16× smaller vectors, same
    * neighborhood structure w.h.p.). Long-form output (id, dim, proj).
    *
    * No RNG and no trained components: the plane family is pure
    * arithmetic in (plane, dim), so the projection is reproducible
    * across runs, engines, and partitionings, and each component's
    * left-fold accumulation order matches the oracle's list_reduce —
    * bit-identical doubles. Completely narrow: a per-row transform +
    * posexplode, no shuffle.
    */
  /** The (planes × dims) coefficient matrix as ONE array literal —
    * the same trick as KMeans' argmin: a fold over a literal keeps
    * the generated code FIXED-SIZE in planes and dims. The previous
    * unrolled form (planes × dims explicit element_at·lit add chains)
    * generated >64 KB methods at 16 planes × 64 dims, tripping
    * Janino's limit and silently dropping the whole stage out of
    * whole-stage codegen (found round 9: 7 CodeGenerator errors per
    * Verify run, invisible to Bench's gate because the LSH queries
    * are not headline).
    */
  private def planeLits(nPlanes: Int, dims: Int): Column =
    typedLit((0 until nPlanes).map(p =>
      (0 until dims).map(d => planeComponent(p, d))))

  /** Left-fold dot of `v` against plane `p` (0-based) of the literal
    * matrix: zip_with preserves index order and aggregate folds left,
    * so the double-accumulation order (((x₁c₁) + x₂c₂) + …) matches
    * the unrolled form and the oracles' list_reduce bit-for-bit (the
    * leading 0.0 + x₁c₁ is IEEE-exact for every non-negative-zero
    * first term).
    */
  private def planeDot(vec: Column, planes: Column, p: Column): Column =
    aggregate(
      zip_with(vec, element_at(planes, p + 1),
        (x, c) => x.cast("double") * c),
      lit(0.0), (s, t) => s + t)

  def projectDims(emb: DataFrame, id: Column, vec: Column,
      outDims: Int, dims: Int): DataFrame = {
    val planes = planeLits(outDims, dims)
    emb.select(id.as("id"), vec.as("v"))
      .select(col("id"),
        posexplode(transform(sequence(lit(0), lit(outDims - 1)),
          d => round(planeDot(col("v"), planes, d), 6))))
      .select(col("id"), col("pos").cast("long").as("dim"),
        col("col").as("proj"))
  }

  /** Random-hyperplane LSH bucket signature (nPlanes sign bits).
    * Guards the dims contract: `element_at` past the end of a shorter
    * vector returns null, the null dot would fall into the 0 branch,
    * and bucket assignment would be silently wrong — an opaque parity
    * failure downstream instead of an error here. Bit p carries
    * weight 2^p via a doubling accumulator (shiftleft takes no column
    * shift amount), iterated ascending — identical to the old
    * unrolled Σ when(dotₚ ≥ 0, 1L << p).
    */
  def lshBucket(vec: Column, nPlanes: Int, dims: Int): Column = {
    val planes = planeLits(nPlanes, dims)
    val sig = aggregate(
      sequence(lit(0), lit(nPlanes - 1)),
      struct(lit(0L).as("sig"), lit(1L).as("bit")),
      (acc, p) => struct(
        (acc.getField("sig") +
          when(planeDot(vec, planes, p) >= 0, acc.getField("bit"))
            .otherwise(lit(0L))).as("sig"),
        (acc.getField("bit") * 2L).as("bit")),
      acc => acc.getField("sig"))
    when(size(vec) === dims, sig)
      .otherwise(raise_error(concat(
        lit(s"lshBucket: expected $dims-dim vectors, got "),
        size(vec).cast("string"))))
  }

  /** IVF (inverted-file) ANN: a k-means coarse quantizer partitions the
    * corpus into nCentroids cells; each query probes its nProbe nearest
    * cells and scores only those vectors. nProbe = nCentroids degrades
    * gracefully to exact brute force (used by the spec as the recall
    * anchor); smaller nProbe trades recall for a 1/nCentroids·nProbe
    * scan fraction — the standard billion-scale layout.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, id: Column, vec: Column,
      k: Int, nCentroids: Int = 16, nProbe: Int = 4): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val spark = corpus.sparkSession

    val c = withNorm(corpus, id, vec)
      .withColumn("fv", array_to_vector(col("v").cast("array<double>")))
      .truncated
    val km = new KMeans().setK(nCentroids).setSeed(42L)
      .setFeaturesCol("fv").setPredictionCol("cell")
    val model = km.fit(c)
    val assigned = model.transform(c)
      .select(col("id").as("n_id"), col("v").as("n_v"),
        col("norm").as("n_norm"), col("cell"))

    // tiny centroid table: (cell, center)
    val centers = spark.createDataFrame(
      model.clusterCenters.zipWithIndex.map { case (ctr, i) =>
        (i, ctr.toArray.toSeq)
      }.toSeq).toDF("cell", "center")

    val q = withNorm(queries, id, vec)
      .select(col("id").as("q_id"), col("v").as("q_v"), col("norm").as("q_norm"))
    // per query: nProbe nearest cells by L2 distance to the centroid
    val qCells = q.crossJoin(broadcast(centers))
      .withColumn("dist2", aggregate(
        zip_with(col("q_v"), col("center"),
          (x, y) => (x.cast("double") - y) * (x.cast("double") - y)),
        lit(0.0), (acc, x) => acc + x))
      .withColumn("probe_rank", row_number().over(
        Window.partitionBy(col("q_id")).orderBy(col("dist2"), col("cell"))))
      .filter(col("probe_rank") <= nProbe)
      .select("q_id", "q_v", "q_norm", "cell")

    val scored = assigned.join(broadcast(qCells), Seq("cell"))
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("cosine", dotCos(col("q_v"), col("n_v"), col("q_norm"), col("n_norm")))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cosine").desc, col("n_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank").cast("long").as("rank"), col("n_id"),
        round(col("cosine"), 6).as("cosine"))
  }

  /** Approximate top-k: candidates restricted to the query's LSH bucket,
    * plus every 1-bit-flip neighbor bucket when multiProbe is on (a
    * hyperplane the vector sits near is the likeliest bit to disagree —
    * multi-probe recovers most of that recall for nPlanes+1× the
    * candidate volume). Sublinear at scale; recall tunes via nPlanes and
    * probing.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, id: Column, vec: Column,
      k: Int, nPlanes: Int = 8, dims: Int = 64,
      multiProbe: Boolean = true): DataFrame = {
    val c = withNorm(corpus, id, vec).withColumn("bucket", lshBucket(col("v"), nPlanes, dims))
    val q0 = withNorm(queries, id, vec).withColumn("bucket", lshBucket(col("v"), nPlanes, dims))
    val q = if (!multiProbe) q0
    else {
      val probes = array(lit(0L) +: (0 until nPlanes).map(p => lit(1L << p)): _*)
      q0.withColumn("bucket",
        explode(transform(probes, m => col("bucket").bitwiseXOR(m))))
    }
    val scored = c.select(col("id").as("n_id"), col("v").as("n_v"),
        col("norm").as("n_norm"), col("bucket"))
      .join(broadcast(q.select(col("id").as("q_id"), col("v").as("q_v"),
        col("norm").as("q_norm"), col("bucket"))), Seq("bucket"))
      .filter(col("q_id") =!= col("n_id"))
      // multi-probe can surface the same neighbor via several buckets
      .dropDuplicates("q_id", "n_id")
      .withColumn("cosine", dotCos(col("q_v"), col("n_v"), col("q_norm"), col("n_norm")))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cosine").desc, col("n_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank").cast("long").as("rank"), col("n_id"),
        round(col("cosine"), 6).as("cosine"))
  }

  /** Per-vector symmetric int8 scalar quantization: scale =
    * max|x|/127, q_i = sign(x_i)·⌊|x_i|/scale + 0.5⌋ ∈ [−127, 127]
    * (spelled with sign/floor, not round(), because HALF_UP round
    * differs across engines on negatives; this form is identical IEEE
    * arithmetic everywhere). All-zero vectors quantize to zeros.
    */
  def int8Quantize(vec: Column): (Column, Column) = {
    val scale = array_max(transform(vec, x => abs(x.cast("double")))) / lit(127.0)
    val q = when(scale === 0.0, transform(vec, _ => lit(0.0)))
      .otherwise(transform(vec, x =>
        signum(x.cast("double")) *
          floor(abs(x.cast("double")) / scale + lit(0.5))))
    (q, scale)
  }

  /** Quantized ANN with exact rerank — the memory-bound scale path:
    * score every corpus vector with the int8 dot product (4× smaller
    * vectors, exact integer arithmetic), keep `rerankDepth` candidates
    * per query, then re-score only those with the full-precision cosine
    * and emit the float-exact top-k. At 100 TB the first pass is the
    * whole-corpus scan and runs on int8 columns; the rerank touches
    * rerankDepth·|queries| float vectors — negligible.
    *
    * Quantized products are small exact integers (≤ 127²·dims), so the
    * candidate scores are bit-reproducible under any summation order —
    * the property that lets the DuckDB oracle replay the identical
    * candidate cut.
    *
    * The candidate cut is two-phase (the repo's standard window shape):
    * a shard-local top-rerankDepth over (q_id, shard) partitions — each
    * sort sees |corpus|/nShards rows and shards sort in parallel — then
    * the exact global rank over the ≤ nShards·rerankDepth survivors per
    * query. A single corpus-wide window per query would funnel the
    * whole scored corpus through |queries| sort partitions; the local
    * cut keeps every sort bounded regardless of corpus size, and the
    * total order (int_score desc, n_id) makes the result identical.
    */
  def quantizedTopK(corpus: DataFrame, queries: DataFrame, id: Column,
      vec: Column, k: Int, rerankDepth: Int, nShards: Int = 64): DataFrame = {
    require(rerankDepth >= k, "rerankDepth must be >= k")
    def quantized(df: DataFrame, side: String) = {
      val (q, _) = int8Quantize(col("v"))
      withNorm(df, id, vec)
        .select(col("id").as(s"${side}_id"), col("v").as(s"${side}_v"),
          col("norm").as(s"${side}_norm"), q.as(s"${side}_q"))
    }
    val c = quantized(corpus, "n")
    val q = quantized(queries, "q")
    val scored = c.crossJoin(broadcast(q))
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("int_score",
        graft.plans.DotProduct.dot_product(col("q_q"), col("n_q")).cast("long"))
    val localCut = scored
      .withColumn("shard", pmod(xxhash64(col("n_id")), lit(nShards)))
      .withColumn("local_rank", row_number().over(
        Window.partitionBy(col("q_id"), col("shard"))
          .orderBy(col("int_score").desc, col("n_id"))))
      .filter(col("local_rank") <= rerankDepth)
      .drop("shard", "local_rank")
    val candidates = localCut
      .withColumn("cand_rank", row_number().over(
        Window.partitionBy(col("q_id"))
          .orderBy(col("int_score").desc, col("n_id"))))
      .filter(col("cand_rank") <= rerankDepth)
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cosine").desc, col("n_id"))
    candidates
      .withColumn("cosine", dotCos(col("q_v"), col("n_v"), col("q_norm"), col("n_norm")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("n_id"), col("int_score"),
        round(col("cosine"), 6).as("cosine"))
  }

  /** Exact per-label centroids in long form: (label, dim, n, centroid).
    * One explode + one shuffle on (label, dim) with map-side partial
    * aggregation — the distributed mean that seeds k-means, audits
    * class geometry, or builds IVF coarse quantizers.
    *
    * The mean uses the repo's fixed-point exact-sum pattern: each
    * component is scaled to micro-units and summed as a LONG, so the
    * result is independent of row order and partitioning — a plain
    * double sum over floats is neither, and would diverge from any
    * other engine (or its own next run) in the low bits. Scaled
    * accumulation overflows only past ~9e12 rows per (label, dim) at
    * |v| ≤ 1 — not reachable even at the 100 TB target.
    */
  def labelCentroids(emb: DataFrame, label: Column, vec: Column): DataFrame =
    emb.select(label.as("label"), posexplode(vec).as(Seq("dim", "v")))
      .groupBy(col("label"), col("dim").cast("long").as("dim"))
      .agg(count(lit(1)).as("n"),
        round(sum(round(col("v").cast("double") * 1000000, 0).cast("long"))
            .cast("double") / (count(lit(1)) * 1000000.0), 6)
          .as("centroid"))

  /** ANN quality report — the eval harness every approximate
    * retriever needs before it replaces the exact one: per query,
    * recall@k against a ground-truth list and the reciprocal rank at
    * which the TRUE nearest neighbor surfaces in the approximate
    * list (1e6 div rank; 0 = missed). Both metrics are integer-exact
    * rationals in ppm, so an approximation's QUALITY is itself a
    * replayable, hash-checkable value — not a float summary.
    *
    * Inputs are (q_id, rank, n_id) candidate lists, k rows per query
    * — the retrievers did the corpus-sized work, so every join and
    * aggregate here touches ≤ k rows per query. Queries the
    * approximate list misses entirely still report (recall 0, rr 0):
    * the left join from the truth side is the audit's honesty.
    */
  def annQualityReport(truth: DataFrame, approx: DataFrame,
      k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val t = truth.select(col("q_id"), col("rank").as("t_rank"), col("n_id"))
    val a = approx.select(col("q_id"), col("rank").as("a_rank"),
      col("n_id"))
    val overlap = t.join(a, Seq("q_id", "n_id"))
      .groupBy(col("q_id"))
      .agg(count(lit(1)).as("n_overlap"),
        min(when(col("t_rank") === 1, col("a_rank"))).as("nn_rank"))
    t.select(col("q_id")).distinct()
      .join(overlap, Seq("q_id"), "left")
      .select(col("q_id"),
        coalesce(col("n_overlap"), lit(0L)).as("n_overlap"),
        expr(s"coalesce(n_overlap, 0L) * 1000000 div ${k}L")
          .as("recall_ppm"),
        coalesce(expr("1000000 div nn_rank"), lit(0L)).as("nn_rr_ppm"))
  }

  /** Embedding-space drift: the cosine between CONSECUTIVE buckets'
    * centroid directions — "did yesterday's embedding distribution
    * point the same way as today's", the cheap first-line monitor for
    * encoder or corpus drift. The trick that keeps it exact: cosine
    * is scale-invariant, so the centroid (mean) can be replaced by
    * the component SUM of quantized integers — no division anywhere;
    * dot products and squared norms of the per-bucket sum-vectors
    * are exact longs, and the only floating arithmetic is the final
    * r = dot/(√na·√nb), 6dp-rounded (the q175 single-sqrt parity
    * form, twice).
    *
    * Scale shape: one combining (bucket, dim) sum over the exploded
    * vectors, one dim-keyed self-join of consecutive buckets
    * (buckets×dims cells), two norm aggregates, one row per
    * consecutive pair. Long guard: per-(bucket, dim) sums must keep
    * |Σq| ≤ ~3·10⁹ per dim for the ×dims dot to stay under 2⁶³ —
    * lower `scale` for billion-vector buckets.
    */
  def centroidDrift(df: DataFrame, bucket: Column, vec: Column,
      scale: Long): DataFrame = {
    require(scale >= 1, s"scale must be >= 1, got $scale")
    val e = df.select(bucket.cast("long").as("b"),
        posexplode(vec).as(Seq("p", "x")))
      .select(col("b"), col("p").cast("long").as("i"),
        floor(col("x").cast("double") * scale).cast("long").as("q"))
      .groupBy(col("b"), col("i")).agg(sum(col("q")).as("s"))
      .truncated // read three times (dot + both norms)
    // centroid-component squares/products in decimal(38,0): |s| grows
    // with the bucket size (worst case scale·|x|max·N per component),
    // and Σᵢ s² wraps long near N ≈ 650 same-sign vectors at scale
    // 10⁶ — under sf10 of the graded table. The decimal cost lands on
    // the CELL table only (buckets × dims rows). Outputs stay long:
    // the guarded cast fails loudly if a result genuinely exceeds
    // 2⁶³ (raise_error, not a wrapped value).
    def asLong(c: Column, what: String): Column =
      when(abs(c) <= lit(Long.MaxValue), c.cast("long"))
        .otherwise(raise_error(format_string(
          s"centroidDrift: $what overflows long (%s); lower `scale`",
          c.cast("string"))).cast("long"))
    val norms = e.groupBy(col("b"))
      .agg(sum(col("s").cast("decimal(38,0)") * col("s")).as("nrm_d"))
      .select(col("b"), asLong(col("nrm_d"), "norm").as("nrm"))
    val dots = e.select(col("b"), col("i"), col("s").as("sa"))
      .join(e.select((col("b") - 1).as("b"), col("i"),
        col("s").as("sb")), Seq("b", "i"))
      .groupBy(col("b"))
      .agg(sum(col("sa").cast("decimal(38,0)") * col("sb")).as("dot_d"))
      .select(col("b"), asLong(col("dot_d"), "dot").as("dot"))
    dots
      .join(norms.select(col("b"), col("nrm").as("na")), Seq("b"))
      .join(norms.select((col("b") - 1).as("b"),
        col("nrm").as("nb")), Seq("b"))
      .select(col("b").as("bucket"), (col("b") + 1).as("next_bucket"),
        col("dot"), col("na"), col("nb"),
        when(col("na") > 0 && col("nb") > 0,
          round(col("dot").cast("double") /
            (sqrt(col("na").cast("double")) *
              sqrt(col("nb").cast("double"))), 6)).as("cos"))
  }

  /** Exact integer covariance matrix of an embedding column — the
    * feature-preprocessing statistic behind whitening, PCA, and
    * Mahalanobis scoring, computed distributed: values quantize to
    * integer units (floor(x·scale), identical IEEE multiply in any
    * engine), so every entry of the matrix is the exact integer
    * numerator n·Σxᵢxⱼ − Σxᵢ·Σxⱼ — hash-replayable, no float-sum
    * reassociation (divide by n² downstream for the sample
    * covariance).
    *
    * Scale shape: the dims² fan-out per row IS the Gram computation
    * (Σ x xᵀ has dims² terms — no formulation avoids them); it
    * happens row-locally via a vec-id self-join of the posexploded
    * (i, xᵢ) relation restricted to i ≤ j (symmetry), and partial
    * aggregation collapses each partition to ≤ dims²/2 cells before
    * the one shuffle. Driver traffic: zero; output dims·(dims+1)/2
    * rows. Long guard: needs n·|Σxᵢxⱼ| < 2⁶³ — lower `scale` for
    * billion-row corpora.
    */
  def covarianceMatrix(df: DataFrame, id: Column, vec: Column,
      scale: Long): DataFrame = {
    require(scale >= 1, s"scale must be >= 1, got $scale")
    val e = df.select(id.as("vid"), posexplode(vec).as(Seq("p", "x")))
      .select(col("vid"), col("p").cast("long").as("i"),
        floor(col("x").cast("double") * scale).cast("long").as("xi"))
      .truncated // read twice by the self-join
    val pairs = e
      .join(e.select(col("vid"), col("i").as("j"), col("xi").as("xj")),
        Seq("vid"))
      .filter(col("i") <= col("j"))
    val sums = pairs.groupBy(col("i"), col("j"))
      .agg(sum(col("xi") * col("xj")).as("sxy"))
    val m = e.groupBy(col("i"))
      .agg(count(lit(1)).as("n"), sum(col("xi")).as("s"))
    sums
      .join(m.select(col("i"), col("n"), col("s").as("si")), Seq("i"))
      .join(m.select(col("i").as("j"), col("s").as("sj")), Seq("j"))
      .select(col("i"), col("j"), col("n"),
        (col("n") * col("sxy") - col("si") * col("sj")).as("cov_num"))
  }
}
