package graft.operators

import graft.operators.Checkpoints.TruncateOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed descriptive statistics with engine-exact reproducibility.
  *
  * A plain `covar_pop`/`corr` aggregate accumulates doubles, so its
  * low-order bits depend on partitioning and row order — it can differ
  * between two runs of the SAME engine, let alone across engines. The
  * moments form fixes that: accumulate Σx, Σy, Σxy, Σx² as exact
  * integers (inputs scaled to their natural integer unit — cents,
  * counts), which sum to the same value under ANY association order,
  * then evaluate the closed-form statistic in one deterministic double
  * expression over those exact inputs. This extends the repo's fsum
  * pattern (first moments, CoreQueries) to second moments.
  */
object Stats {

  /** Per-group exact moments and the derived mean/variance/covariance.
    * `x` must be integer-valued as given; `y` is scaled by `yScale`
    * (e.g. 100 for dollars→cents) and rounded to an exact long.
    *
    * Long-range guard: with |x| ≤ 10⁵, |y·scale| ≤ 10⁸ the Σxy
    * accumulator holds ~10⁶ rows per 10¹⁹/10¹³ ≈ beyond any per-group
    * cardinality this engine targets before needing the decimal(38)
    * variant. Σy² is intentionally NOT computed: at cents scale it
    * overflows first and y-variance in display units rarely needs
    * engine-exact bits.
    *
    * One map-side-combining hash aggregation — the same single-shuffle
    * shape as any groupBy; nothing else moves.
    */
  def exactMoments(df: DataFrame, group: Column, x: Column, y: Column,
      yScale: Long): DataFrame = {
    val xi = x.cast("long")
    val yi = round(y.cast("double") * yScale, 0).cast("long")
    df.select(group.as("grp"), xi.as("x"), yi.as("y"))
      .groupBy(col("grp"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("x")).as("sum_x"),
        sum(col("y")).as("sum_y"),
        sum(col("x") * col("x")).as("sum_xx"),
        sum(col("x") * col("y")).as("sum_xy"))
      .select(col("grp"), col("n"), col("sum_x"), col("sum_y"),
        col("sum_xx"), col("sum_xy"),
        round(col("sum_x").cast("double") / col("n"), 6).as("mean_x"),
        round(col("sum_y").cast("double") / (col("n") * lit(yScale.toDouble)), 6)
          .as("mean_y"),
        // population variance / covariance from exact sums; the double
        // expression is identical arithmetic in every engine
        round((col("sum_xx").cast("double") * col("n")
            - col("sum_x").cast("double") * col("sum_x"))
          / (col("n").cast("double") * col("n")), 6).as("var_x"),
        round((col("sum_xy").cast("double") * col("n")
            - col("sum_x").cast("double") * col("sum_y"))
          / (col("n").cast("double") * col("n") * lit(yScale.toDouble)), 6)
          .as("cov_xy"))
  }

  /** Column profiler — the data-quality audit pass (row count, null
    * count, exact distinct count, min/max) for every requested column,
    * in long form. Callers pass (name, value) pairs so non-portable
    * types are normalized at the call site (e.g. timestamps as
    * `unix_micros`, money as cents); min/max are taken on the NATIVE
    * type and only then rendered to string, so numeric ordering is
    * never stringly.
    *
    * Scale shape: ONE scan — a single global aggregate computes every
    * column's metrics together (the multi-distinct plans as Spark's
    * Expand, k-fold row expansion inside one stage, with partial
    * aggregation — still one pass over the data, which is the whole
    * point of a 100 TB audit); the long-form reshape is a 1-row
    * explode. A k-scan per-column loop would read the corpus k times.
    */
  /** Per-group z-scores and outlier flags from engine-exact moments —
    * the applied anomaly-detection form of [[moments]]. With x in
    * integer units (cents), z = (x·n − Σx) / √(Σx²·n − (Σx)²): the
    * numerator and radicand are exact integers (order-independent
    * sums), so the only floating point is one divide and one
    * correctly-rounded sqrt — deterministic in any engine. A
    * zero-variance group flags nothing (z = 0 by convention).
    *
    * Scale shape: one map-side-combining groupBy for the per-group
    * moments (group-cardinality output), one equi-join back to the
    * rows. Long-range audit (round 9): Σx²·n and (Σx)² pass 2⁶³ at
    * ~4·10⁵ rows per group for |cents| ≤ 6·10⁴ — that is only ~sf2 of
    * the graded events table, so the radicand products run in
    * decimal(38,0) (the per-row sums stay long; only the two
    * group-cardinality products pay the decimal cost, and z is a
    * double either way). Silent long wrap here produced wrong
    * outliers, not errors — exactly the q218 bug class.
    */
  def zScores(df: DataFrame, group: Column, id: Column, value: Column,
      scale: Long = 100L, flagAt: Double = 3.0): DataFrame = {
    val rows = df.select(group.as("grp"), id.as("id"),
      round(value * scale, 0).cast("long").as("x"))
    val m = rows.groupBy(col("grp"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("s"),
        sum(col("x") * col("x")).as("ss"))
    // radicand in decimal(38,0): ss·n wraps long at ~4e5 rows/group
    // (|cents| ≤ 6e4); the numerator x·n − s stays far inside long
    val rad = col("ss").cast("decimal(38,0)") * col("n") -
      col("s").cast("decimal(38,0)") * col("s")
    rows.join(m, Seq("grp"))
      .withColumn("z",
        when(rad === 0, lit(0.0))
          .otherwise(round(
            (col("x") * col("n") - col("s")).cast("double") /
              sqrt(rad.cast("double")), 6)))
      .select(col("grp"), col("id"), col("x"), col("z"),
        (abs(col("z")) >= flagAt).as("is_outlier"))
  }

  /** Deterministic sampled quantiles — the 100 TB scale path for
    * percentile estimation. Exact per-group `percentile` keeps every
    * value of the group in the aggregation buffer: fine at q13's
    * scale, a memory wall when one group holds 10¹⁰ rows. This
    * computes the exact interpolated quantile OVER A 1/r SAMPLE,
    * cutting buffer and shuffle by r while keeping rank error
    * O(√(r/n)) w.h.p. (a uniform m-sample estimates any quantile to
    * ±O(1/√m) rank).
    *
    * The sample is `hash32(id) mod r == 0` — membership is a pure
    * function of row identity ([[graft.functions.PortableHash]], the
    * replayable arithmetic hash), NOT an RNG: the same rows are
    * chosen on every run, every engine, every partitioning, so the
    * estimate is a hash-exact, oracle-checkable VALUE rather than a
    * distribution — the same reproducibility argument as
    * mixtureSample/lcgKey, applied to sketching. The filter is a
    * narrow codegen'd predicate on the scan; the only shuffle is the
    * r-times-smaller groupBy.
    */
  def sampledQuantiles(df: DataFrame, group: Column, id: Column,
      x: Column, probs: Seq[Double], r: Int): DataFrame = {
    require(r > 0, s"sampling modulus must be positive, got $r")
    require(probs.nonEmpty, "need at least one quantile probability")
    val qs = probs.zipWithIndex.map { case (p, i) =>
      round(expr(s"percentile(x, ${p}d)"), 6).as(s"q$i") }
    df.filter(pmod(graft.functions.PortableHash.hash32(id), lit(r.toLong))
        === 0)
      .select(group.as("g"), x.as("x"))
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n_sample"), qs: _*)
  }

  /** Per-group robust outlier census by median absolute deviation:
    * n, the group median and MAD (in doubled/quadrupled integer
    * units — see below), and the count of rows with
    * |x − median| > k·MAD. The robust alternative to [[zScores]]:
    * mean/stddev move with the outliers they're hunting (one wild
    * value inflates σ and hides its peers), while the 50% breakdown
    * point of median+MAD (Hampel 1974) does not — the standard
    * choice for fat-tailed quality metrics.
    *
    * Exactness without rounding: `x` must be integer-valued. A
    * linear-interpolated median of integers is a multiple of ½, and
    * the MAD — a median of |int − ½-multiple| deviations — a
    * multiple of ¼; every intermediate (sum, difference, half) of
    * such values is exactly representable in a double, and both
    * engines' interpolation formulas compose exact operations on
    * them, so the comparison |x − med| > k·MAD is EXACT — no 1-ulp
    * divergence for the rounding rule to paper over (contrast q07,
    * where fractional inputs force the 6dp guard). The outputs
    * med2 = 2·median and mad4 = 4·MAD are therefore exact longs.
    *
    * Scale shape: two exact per-group percentile aggregations (the
    * group medians joined back between them — the join re-keys on
    * the group, the same single-shuffle shape as the aggs) and one
    * counting agg. Exact group percentiles buffer each group's
    * values (the A1/q13 trade); at 100 TB cardinalities switch the
    * two medians to [[sampledQuantiles]] — hash-sampling commutes
    * with this operator exactly as documented there.
    */
  def madOutliers(df: DataFrame, group: Column, x: Column,
      k: Int = 3): DataFrame = {
    val base = df.select(group.as("grp"), x.cast("long").as("x"))
    val med = base.groupBy(col("grp"))
      .agg(expr("percentile(x, 0.5d)").as("med"))
    val dev = base.join(med, Seq("grp"))
      .withColumn("adev", abs(col("x") - col("med")))
    val mad = dev.groupBy(col("grp"))
      .agg(expr("percentile(adev, 0.5d)").as("mad"))
    dev.join(mad, Seq("grp"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n"),
        (min(col("med")) * 2).cast("long").as("med2"),
        (min(col("mad")) * 4).cast("long").as("mad4"),
        sum(when(col("adev") > lit(k.toDouble) * col("mad"), 1L)
          .otherwise(0L)).as("n_outliers"))
  }

  /** Per-group lag-1 autocorrelation of an integer series — the
    * self-similarity diagnostic of operational time series ("is
    * today's volume predicted by yesterday's"), and the
    * exact-arithmetic Pearson form of the [[exactMoments]] family
    * applied to consecutive (xₜ₋₁, xₜ) pairs:
    *
    *   r = (n·Σab − Σa·Σb) / (√(n·Σa²−(Σa)²) · √(n·Σb²−(Σb)²))
    *
    * Every sum is an exact integer (order-independent); the closed
    * form is one fixed-order double expression with two correctly-
    * rounded sqrts, 6dp-rounded — deterministic in any engine.
    * Zero variance on either margin yields null (no correlation is
    * defined), groups with fewer than two points vanish (no pairs).
    *
    * The pairing `lag` runs per group ordered by `orderKey` —
    * bounded series per group (daily buckets, not raw rows), the
    * legitimate window shape; everything after is one map-side-
    * combining aggregate. Gaps in `orderKey` pair across the gap
    * (the series the caller provides IS the series measured — densify
    * first if absent buckets must count as zero).
    */
  def lagAutocorrelation(df: DataFrame, group: Column, orderKey: Column,
      value: Column): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("grp")).orderBy(col("k"))
    val pairs = df
      .select(group.as("grp"), orderKey.as("k"),
        value.cast("long").as("b"))
      .withColumn("a", lag(col("b"), 1).over(w))
      .filter(col("a").isNotNull)
    val varA = col("n") * col("saa") - col("sa") * col("sa")
    val varB = col("n") * col("sbb") - col("sb") * col("sb")
    pairs.groupBy(col("grp"))
      .agg(count(lit(1)).as("n"), sum(col("a")).as("sa"),
        sum(col("b")).as("sb"), sum(col("a") * col("b")).as("sab"),
        sum(col("a") * col("a")).as("saa"),
        sum(col("b") * col("b")).as("sbb"))
      .select(col("grp"), col("n").as("n_pairs"),
        when(varA > 0 && varB > 0,
          round((col("n") * col("sab") - col("sa") * col("sb"))
              .cast("double") /
            (sqrt(varA.cast("double")) * sqrt(varB.cast("double"))), 6))
          .as("r"))
  }

  /** Scale-safe global prefix sums: appends `cum_<c>` (INCLUSIVE
    * running sum in `key` order) for each named long column, without
    * a single-partition window. The q117/[[graft.operators.Splits
    * .rangeRanked]] two-phase layout generalized from row positions
    * to arbitrary weights: range-partition by key, per-partition
    * totals collected to the driver as offsets (≤ shuffle.partitions
    * rows), a broadcast join adds them back, and a PARTITION-LOCAL
    * window finishes the prefix — no task ever sees more than one
    * range's rows. Ties on `key` land in one partition (range
    * partitioning is key-granular) but their relative cum order
    * follows sort order; pass a total-order key when per-row prefix
    * values must be deterministic (aggregating to distinct keys
    * first, as the AUC/KS callers do, sidesteps this entirely).
    * Checkpointed once: the partition-id assignment must not be
    * recomputed between the totals pass and the join.
    */
  private[graft] def rangePrefixSums(df: DataFrame, key: Column,
      sumCols: Seq[String]): DataFrame = {
    require(sumCols.nonEmpty, "need at least one column to prefix-sum")
    val spark = df.sparkSession
    val keyed = df.withColumn("__key", key)
      .repartitionByRange(col("__key"))
      .sortWithinPartitions(col("__key"))
      .withColumn("__pid", spark_partition_id().cast("long"))
      .truncated
    val aggs = sumCols.map(c => coalesce(sum(col(c)), lit(0L)).as(c))
    val totals = keyed.groupBy(col("__pid"))
      .agg(aggs.head, aggs.tail: _*)
      .collect()
      .map(r => (r.getLong(0), sumCols.indices.map(i => r.getLong(i + 1))))
      .sortBy(_._1)
    val offsets = totals.map(_._1).zip(
      totals.map(_._2).scanLeft(sumCols.map(_ => 0L): Seq[Long]) {
        (acc, t) => acc.zip(t).map { case (x, y) => x + y }
      }.init)
    val offSchema = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField("__pid",
        org.apache.spark.sql.types.LongType) +:
      sumCols.indices.map(i => org.apache.spark.sql.types.StructField(
        s"__off$i", org.apache.spark.sql.types.LongType)))
    val offRows: java.util.List[org.apache.spark.sql.Row] =
      java.util.Arrays.asList(offsets.map { case (pid, offs) =>
        org.apache.spark.sql.Row.fromSeq(pid +: offs)
      }.toSeq: _*)
    val offDf = spark.createDataFrame(offRows, offSchema)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__pid")).orderBy(col("__key"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val joined = keyed.join(broadcast(offDf), Seq("__pid"))
    val withCums = sumCols.zipWithIndex.foldLeft(joined) {
      case (d, (c, i)) =>
        d.withColumn(s"cum_$c", col(s"__off$i") + sum(col(c)).over(w))
    }
    withCums.drop(("__pid" +: "__key" +:
      sumCols.indices.map(i => s"__off$i")): _*)
  }

  /** GROUPED prefix sums without per-group windows: appends
    * `gcum_<c>` (inclusive running sum in `key` order WITHIN each
    * `group`) for each named long column. One global
    * [[rangePrefixSums]] over the composite (group, key) order — a
    * composite-range order keeps each group contiguous, so the
    * group's running sum is the global cumulative minus the group's
    * BASE (the global cumulative just before its first row, one
    * `min_by` row per group). A per-group window would funnel each
    * group's full history through one task; this never does,
    * whatever the group sizes.
    *
    * Contract: (group, key) unique per row (aggregate to cells
    * first — every caller does), key non-null.
    */
  private[graft] def groupedPrefixSums(df: DataFrame, group: String,
      key: String, sumCols: Seq[String]): DataFrame = {
    val cum = rangePrefixSums(df, struct(col(group), col(key)), sumCols)
    val baseAggs = sumCols.map(c =>
      expr(s"min_by(cum_$c - $c, $key)").as(s"__base_$c"))
    val bases = cum.groupBy(col(group))
      .agg(baseAggs.head, baseAggs.tail: _*)
    sumCols.foldLeft(cum.join(bases, Seq(group))) { (d, c) =>
      d.withColumn(s"gcum_$c", col(s"cum_$c") - col(s"__base_$c"))
    }.drop(sumCols.flatMap(c => Seq(s"cum_$c", s"__base_$c")): _*)
  }

  /** Grouped prefix MAX — [[groupedPrefixSums]] for a monoid that
    * cannot base-subtract (max is not invertible, so the
    * global-cum-minus-base trick is unavailable). Appends `gmax_<c>`:
    * the running maximum of `c` in `key` order within each `group`.
    *
    * Construction: composite-range partition as before; the
    * partition-LOCAL running max is a window over (__pid, group) —
    * bounded by partition size; the cross-partition CARRY joins back
    * from the per-(partition, group) max table, whose per-group row
    * count is the number of partitions the group SPANS (≤
    * shuffle.partitions, a config constant — so the carry window
    * partitioned by group is bounded by P, never by data). Two
    * bounded windows and one equi-join replace the per-group
    * data-sized window.
    *
    * Same contract as [[groupedPrefixSums]]: (group, key) unique,
    * key non-null, columns long.
    */
  private[graft] def groupedPrefixMax(df: DataFrame, group: String,
      key: String, maxCols: Seq[String]): DataFrame = {
    require(maxCols.nonEmpty, "need at least one column to prefix-max")
    val keyed = df
      .repartitionByRange(struct(col(group), col(key)))
      .sortWithinPartitions(struct(col(group), col(key)))
      .withColumn("__pid", spark_partition_id().cast("long"))
      .truncated
    val wLocal = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__pid"), col(group)).orderBy(col(key))
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, 0)
    val pidAggs = maxCols.map(c => max(col(c)).as(s"__pm_$c"))
    val pidMax = keyed.groupBy(col("__pid"), col(group))
      .agg(pidAggs.head, pidAggs.tail: _*)
    val wCarry = org.apache.spark.sql.expressions.Window
      .partitionBy(col(group)).orderBy(col("__pid"))
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, -1)
    val carries = maxCols.foldLeft(pidMax) { (d, c) =>
      d.withColumn(s"__carry_$c", max(col(s"__pm_$c")).over(wCarry))
    }.select(col("__pid") +: col(group) +:
      maxCols.map(c => col(s"__carry_$c")): _*)
    val joined = keyed.join(carries, Seq("__pid", group))
    maxCols.foldLeft(joined) { (d, c) =>
      d.withColumn(s"gmax_$c",
        greatest(max(col(c)).over(wLocal),
          coalesce(col(s"__carry_$c"), lit(Long.MinValue))))
    }.drop(("__pid" +: maxCols.map(c => s"__carry_$c")): _*)
  }

  /** Maximum drawdown per group — the largest peak-to-trough drop of
    * a cumulative series (budget burn-down monitoring, model-metric
    * regression depth, any high-water-mark question): balance(t) =
    * running sum of deltas, drawdown(t) = runningMax(balance) −
    * balance, reported as the per-group maximum with the earliest
    * trough instant. Pure composition of the two grouped-prefix
    * primitives — sums for the balance, MAX for the high-water mark —
    * so no per-group window at any group size.
    *
    * Input: one row per (group, key) with a signed integer delta
    * (aggregate to cells first). Output: (grp, max_drawdown_, at_key)
    * — 0 for a never-declining series.
    */
  def maxDrawdown(df: DataFrame, group: Column, key: Column,
      delta: Column): DataFrame = {
    val cells = df.select(group.as("grp"), key.cast("long").as("k"),
        delta.cast("long").as("d"))
      .filter(col("k").isNotNull)
      .groupBy(col("grp"), col("k")).agg(sum(col("d")).as("d"))
    val bal = groupedPrefixSums(cells, "grp", "k", Seq("d"))
      .withColumnRenamed("gcum_d", "bal")
      .select(col("grp"), col("k"), col("bal").as("d"))
    // reuse the cells contract: (grp, k) unique, column named d
    val hwm = groupedPrefixMax(bal, "grp", "k", Seq("d"))
      .select(col("grp"), col("k"),
        (col("gmax_d") - col("d")).as("dd"))
    val mx = hwm.groupBy(col("grp")).agg(max(col("dd")).as("max_drawdown"))
    hwm.join(mx, Seq("grp"))
      .filter(col("dd") === col("max_drawdown"))
      .groupBy(col("grp"), col("max_drawdown"))
      .agg(min(col("k")).as("at_key"))
      .select(col("grp"), col("max_drawdown"), col("at_key"))
  }

  /** Exact weighted quantiles per group on [[groupedPrefixSums]]:
    * for each requested q in ppm, the SMALLEST value whose inclusive
    * cumulative weight reaches q·total (the lower weighted quantile
    * — the inverse-CDF convention, exact integer comparison
    * cum·10⁶ ≥ q_ppm·total, no interpolation). q_ppm = 500000 is the
    * weighted median. Output: (grp, q_ppm, value, cum_w, total_w).
    *
    * Scale shape: one map-side-combining (group, value) weight-cell
    * aggregate, the grouped two-phase prefix, per-group totals as the
    * cells' max inclusive cum (a combining agg, not a second scan),
    * and a qs-sized broadcast cross join — no per-group window, no
    * sort materialization. The threshold comparison cum·10⁶ ≥
    * q_ppm·total runs in decimal(38,0) — long·10⁶ silently wraps once
    * a group's total weight passes ~9.2·10¹², and a wrong quantile is
    * worse than a slower compare; the cast rides only the comparison,
    * outputs stay long.
    */
  def weightedQuantiles(df: DataFrame, group: Column, value: Column,
      weight: Column, qsPpm: Seq[Long]): DataFrame = {
    require(qsPpm.nonEmpty && qsPpm.forall(q => q >= 1 && q <= 1000000L),
      s"quantiles must be in (0, 1000000] ppm, got $qsPpm")
    val cells = df.select(group.as("grp"), value.cast("long").as("v"),
        weight.cast("long").as("w"))
      .filter(col("v").isNotNull && col("w").isNotNull && col("w") > 0)
      .groupBy(col("grp"), col("v")).agg(sum(col("w")).as("w"))
    val cum = groupedPrefixSums(cells, "grp", "v", Seq("w"))
    val tot = cum.groupBy(col("grp")).agg(max(col("gcum_w")).as("total_w"))
    val spark = df.sparkSession
    import spark.implicits._
    val qs = qsPpm.toDF("q_ppm")
    cum.join(tot, Seq("grp"))
      .crossJoin(broadcast(qs))
      .filter(col("gcum_w").cast("decimal(38,0)") * 1000000L >=
        col("q_ppm").cast("decimal(38,0)") * col("total_w"))
      .groupBy(col("grp"), col("q_ppm"), col("total_w"))
      .agg(min(col("v")).as("value"))
      .join(cum.select(col("grp"), col("v").as("value"),
        col("gcum_w").as("cum_w")), Seq("grp", "value"))
      .select(col("grp"), col("q_ppm"), col("value"), col("cum_w"),
        col("total_w"))
  }

  /** Cross-correlation function: exact Pearson between two series at
    * every lag 1..maxLag — does series A lead series B, and by how
    * much? ([[lagAutocorrelation]] generalized across series and
    * lags: same integer moment sums, same one-floating-sqrt closed
    * form.) Input: two (t, v) cell tables (aggregate first); output
    * one row per lag with n overlapping points and r (6dp, null when
    * either side is constant). The lag fan-out is maxLag× the CELL
    * table — bounded by the series length × lags, never raw rows.
    */
  def crossCorrelation(a: DataFrame, b: DataFrame, t: Column, v: Column,
      maxLag: Int): DataFrame = {
    require(maxLag >= 1, s"maxLag must be >= 1, got $maxLag")
    val ca = a.select(t.cast("long").as("t"), v.cast("long").as("va"))
      .groupBy(col("t")).agg(sum(col("va")).as("va"))
    val cb = b.select(t.cast("long").as("t"), v.cast("long").as("vb"))
      .groupBy(col("t")).agg(sum(col("vb")).as("vb"))
    val lags = ca.sparkSession.range(1, maxLag + 1)
      .select(col("id").as("lag"))
    // pair A at t with B at t + lag: positive r at lag L means A
    // leads B by L periods
    val pairs = ca.crossJoin(broadcast(lags))
      .select(col("lag"), (col("t") + col("lag")).as("t"), col("va"))
      .join(cb, Seq("t"))
    val varA = col("n") * col("saa") - col("sa") * col("sa")
    val varB = col("n") * col("sbb") - col("sb") * col("sb")
    pairs.groupBy(col("lag"))
      .agg(count(lit(1)).as("n"), sum(col("va")).as("sa"),
        sum(col("vb")).as("sb"), sum(col("va") * col("vb")).as("sab"),
        sum(col("va") * col("va")).as("saa"),
        sum(col("vb") * col("vb")).as("sbb"))
      .select(col("lag"), col("n"),
        when(varA > 0 && varB > 0,
          round((col("n") * col("sab") - col("sa") * col("sb"))
              .cast("double") /
            (sqrt(varA.cast("double")) * sqrt(varB.cast("double"))), 6))
          .as("r"))
  }

  /** Per-group OLS trend line in exact ppm: slope and intercept of
    * v ~ t by the closed form over integer moment sums —
    * slope_ppm = (10⁶·(nΣtv − ΣtΣv)) div (nΣtt − (Σt)²) and
    * intercept_ppm = (10⁶·Σv − slope_ppm·Σt) div n (the means
    * identity cleared of fractions; trunc-div, mirrored by the
    * oracle). Zero time-variance groups report nulls. One combining
    * moments aggregate over (group, t, v) cells.
    */
  def trendLines(df: DataFrame, group: Column, t: Column,
      v: Column): DataFrame = {
    val cells = df.select(group.as("grp"), t.cast("long").as("t"),
        v.cast("long").as("v"))
      .groupBy(col("grp"), col("t")).agg(sum(col("v")).as("v"))
    val den = col("n") * col("stt") - col("st") * col("st")
    cells.groupBy(col("grp"))
      .agg(count(lit(1)).as("n"), sum(col("t")).as("st"),
        sum(col("v")).as("sv"), sum(col("t") * col("v")).as("stv"),
        sum(col("t") * col("t")).as("stt"))
      .select(col("grp"), col("n"), col("st"), col("sv"),
        when(den > 0, expr(
          "(1000000 * (n * stv - st * sv)) div (n * stt - st * st)"))
          .as("slope_ppm"))
      .select(col("grp"), col("n"), col("slope_ppm"),
        when(col("slope_ppm").isNotNull, expr(
          "(1000000 * sv - slope_ppm * st) div n")).as("intercept_ppm"))
  }

  /** Global rank buckets (quantile scores): every row gets its bucket
    * 1..k by position in `key` order — the RFM-scoring / decile-
    * normalization primitive. Deterministic floor-div assignment
    * bucket = (idx·k) div n + 1 over the two-phase
    * [[graft.operators.Splits.rangeRanked]] global index (NO
    * single-partition ROW_NUMBER), with n attached as a lazy one-row
    * broadcast. Note this is floor-partitioning, not SQL NTILE —
    * NTILE front-loads the remainder; this spreads it — the oracle
    * replays the same arithmetic. Pass a TOTAL-ORDER key (tiebreak
    * by id) for deterministic buckets.
    */
  def rankBuckets(df: DataFrame, key: Column, k: Int,
      bucketName: String): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val ranked = graft.operators.Splits.rangeRanked(df, key)
    val n = ranked.agg(count(lit(1)).as("__n"))
    ranked.crossJoin(broadcast(n))
      .withColumn(bucketName, expr(s"(__idx * $k) div __n + 1"))
      .drop("__idx", "__n", "__rnd", "__mid")
  }

  /** Pareto / ABC classification: rows ranked by descending weight,
    * classed by cumulative share — class 1 while cum·10⁶ ≤ cut₁·total,
    * class 2 while ≤ cut₂, … , |cuts|+1 for the tail. The "20% of
    * parts are 80% of revenue" census, exact integer. Two-phase
    * prefix over the (−w, id) total order, lazy one-row total.
    * Output: input rows + (cum_w, abc_class).
    */
  def paretoClasses(df: DataFrame, id: Column, weight: Column,
      cutsPpm: Seq[Long]): DataFrame = {
    require(cutsPpm.nonEmpty && cutsPpm == cutsPpm.sorted &&
      cutsPpm.forall(c => c > 0 && c < 1000000L),
      s"cuts must be ascending ppm in (0, 1000000), got $cutsPpm")
    val cells = df.select(id.as("id"), weight.cast("long").as("w"))
      .filter(col("w").isNotNull)
    val cum = rangePrefixSums(cells, struct((-col("w")).as("nw"),
      col("id")), Seq("w"))
    val total = cells.agg(coalesce(sum(col("w")), lit(0L)).as("__tot"))
    val classExpr = cutsPpm.zipWithIndex.foldRight(
      lit(cutsPpm.length + 1): Column) { case ((cut, i), acc) =>
        when(col("cum_w") * 1000000L <= lit(cut) * col("__tot"),
          lit(i + 1)).otherwise(acc)
      }
    cum.crossJoin(broadcast(total))
      .withColumn("abc_class", classExpr.cast("long"))
      .drop("__tot")
  }

  /** One-sided CUSUM change-point detection per group, exact integer:
    * the classic recursive statistic S_t = max(0, S_{t−1} + (x_t − k))
    * has the closed form S_t = P_t − min(P_0..P_t) with P the plain
    * prefix sum of (x − k) — the max(0, ·) fold is the drawdown
    * identity read upside down — so the sequential-looking monitor is
    * two grouped scans: [[groupedPrefixSums]] for P and
    * [[groupedPrefixMax]] of −P for the running minimum. No
    * sequential state, no per-group window, bit-exact.
    *
    * `k` is the reference drift (allowance) subtracted per
    * observation; an alarm fires where S_t > h. Output per group:
    * (grp, max_stat, at_key, first_alarm_key) with
    * first_alarm_key null when the statistic never exceeds h.
    * Input rows are (group, key, x) cells — aggregate duplicates
    * first; x and k integer (scale to cents/micros upstream).
    */
  def cusumAlarms(df: DataFrame, group: Column, key: Column, x: Column,
      k: Long, h: Long): DataFrame = {
    require(h >= 0, s"threshold h must be >= 0, got $h")
    val cells = df.select(group.as("grp"), key.cast("long").as("ky"),
        (x.cast("long") - k).as("d"))
      .filter(col("ky").isNotNull)
      .groupBy(col("grp"), col("ky")).agg(sum(col("d")).as("d"))
    val p = groupedPrefixSums(cells, "grp", "ky", Seq("d"))
      .select(col("grp"), col("ky"), col("gcum_d").as("pd"))
    // running min of P including a virtual P_0 = 0 start: S_t =
    // P_t − min(0, min P_1..P_t)
    val negP = p.select(col("grp"), col("ky"), (-col("pd")).as("d"))
    val s = groupedPrefixMax(negP, "grp", "ky", Seq("d"))
      .join(p, Seq("grp", "ky"))
      .select(col("grp"), col("ky"),
        (col("pd") + greatest(col("gmax_d"), lit(0L))).as("s"))
    val mx = s.groupBy(col("grp")).agg(max(col("s")).as("max_stat"))
    val atMax = s.join(mx, Seq("grp"))
      .filter(col("s") === col("max_stat"))
      .groupBy(col("grp"), col("max_stat"))
      .agg(min(col("ky")).as("at_key"))
    val alarm = s.filter(col("s") > h)
      .groupBy(col("grp")).agg(min(col("ky")).as("first_alarm_key"))
    atMax.join(alarm, Seq("grp"), "left")
      .select(col("grp"), col("max_stat"), col("at_key"),
        col("first_alarm_key"))
  }

  /** Cumulative distinct reach: per time bucket, how many keys appear
    * for the FIRST time and how many distinct keys have appeared up
    * to and including it — the growth curve every "total users /
    * total documents ever seen" dashboard plots. Exact, not sketched:
    * first-occurrence collapses each key to one row (a combining
    * min-aggregate), bucket counts are a second combining aggregate
    * over key-cardinality rows, and the running total is the
    * two-phase [[rangePrefixSums]] — no window over data-sized
    * partitions, no distinct-within-window rescans per bucket.
    * Output: (bucket, new_keys, cum_distinct), buckets with no new
    * keys absent (left-join a calendar to densify).
    */
  def cumulativeDistinct(df: DataFrame, key: Column,
      bucket: Column): DataFrame = {
    val first = df.select(key.as("k"), bucket.cast("long").as("b"))
      .filter(col("k").isNotNull && col("b").isNotNull)
      .groupBy(col("k")).agg(min(col("b")).as("b"))
    val perBucket = first.groupBy(col("b"))
      .agg(count(lit(1)).as("new_keys"))
    rangePrefixSums(perBucket, col("b"), Seq("new_keys"))
      .select(col("b").as("bucket"), col("new_keys"),
        col("cum_new_keys").as("cum_distinct"))
  }

  /** Two-sample Mann–Whitney U in exact DOUBLED integers (ties
    * contribute half wins; ×2 keeps them integral): U2_a =
    * Σ_v 2·c_a(v)·cumB_less(v) + c_a(v)·c_b(v), symmetrically for
    * U2_b, with the invariant U2_a + U2_b = 2·n_a·n_b (spec-pinned).
    * The rank-sum complement to [[ksDistance]]: KS sees the largest
    * local CDF gap, MW the global stochastic dominance — a
    * distribution drift gate wants both.
    *
    * Scale shape is ksDistance's: distinct-value histograms
    * (map-side combining), full-outer support merge,
    * [[rangePrefixSums]] for the EXCLUSIVE less-than prefixes, one
    * final one-row aggregate. Same ·overflow guard: needs
    * n_a·n_b ≤ ~4.6·10¹⁸.
    */
  def mannWhitneyU2(a: DataFrame, b: DataFrame, x: Column): DataFrame = {
    val ga = a.select(x.cast("long").as("v"))
      .groupBy(col("v")).agg(count(lit(1)).as("ca"))
    val gb = b.select(x.cast("long").as("v"))
      .groupBy(col("v")).agg(count(lit(1)).as("cb"))
    val merged = ga.join(gb, Seq("v"), "full_outer")
      .select(col("v"), coalesce(col("ca"), lit(0L)).as("ca"),
        coalesce(col("cb"), lit(0L)).as("cb"))
    val cum = rangePrefixSums(merged, col("v"), Seq("ca", "cb"))
    cum.agg(
        coalesce(sum(col("ca")), lit(0L)).as("n_a"),
        coalesce(sum(col("cb")), lit(0L)).as("n_b"),
        coalesce(sum(lit(2L) * col("ca") * (col("cum_cb") - col("cb"))
          + col("ca") * col("cb")), lit(0L)).as("u2_a"),
        coalesce(sum(lit(2L) * col("cb") * (col("cum_ca") - col("ca"))
          + col("ca") * col("cb")), lit(0L)).as("u2_b"))
  }

  /** Two-sample Kolmogorov–Smirnov distance in exact integer
    * micro-units — the distribution-drift gate of a production
    * pipeline (yesterday's feature distribution vs today's): one row
    * (n_a, n_b, at_value, ks_micro) with
    *
    *   ks_micro = max over values v of
    *              (|cumA(v)·n_b − cumB(v)·n_a| · 10⁶) div (n_a·n_b)
    *
    * and `at_value` the smallest v attaining the max. Cross-
    * multiplying the two CDFs keeps everything integer — no float
    * CDF subtraction, so the statistic is hash-exact and replayable.
    * (PSI, the other standard drift score, needs log; KS needs only
    * order — same reason the repo ranks by lift, not PMI.)
    *
    * Scale shape: each side collapses to its distinct-value histogram
    * (map-side combining), a full-outer merge aligns the supports,
    * [[rangePrefixSums]] builds both CDFs two-phase, and the max is a
    * TakeOrdered(1) — no global sort materialization, no
    * single-partition window. Long-range guard: cum·n ≤ n_a·n_b and
    * the ·10⁶ needs n_a·n_b ≤ ~9·10¹² — beyond that drop to ppm
    * units or pre-sample.
    */
  def ksDistance(a: DataFrame, b: DataFrame, x: Column): DataFrame = {
    val ga = a.select(x.cast("long").as("v"))
      .groupBy(col("v")).agg(count(lit(1)).as("ca"))
    val gb = b.select(x.cast("long").as("v"))
      .groupBy(col("v")).agg(count(lit(1)).as("cb"))
    val merged = ga.join(gb, Seq("v"), "full_outer")
      .na.fill(0L, Seq("ca", "cb"))
    val cums = rangePrefixSums(merged, col("v"), Seq("ca", "cb"))
    val nA = merged.agg(coalesce(sum(col("ca")), lit(0L)).as("n_a"))
    val nB = merged.agg(coalesce(sum(col("cb")), lit(0L)).as("n_b"))
    cums.crossJoin(broadcast(nA)).crossJoin(broadcast(nB))
      .select(col("n_a"), col("n_b"), col("v").as("at_value"),
        expr("(abs(cum_ca * n_b - cum_cb * n_a) * 1000000)" +
          " div (n_a * n_b)").as("ks_micro"))
      .orderBy(col("ks_micro").desc, col("at_value"))
      .limit(1)
  }

  /** Full χ² contingency table between two LOW-cardinality
    * categoricals: one row per (a, b) cell of the |A|×|B| cross —
    * absent combinations included at observed 0, because their
    * expected-count terms are part of the statistic — with the
    * observed count, the expected count in integer micro-units
    * (r·c·10⁶ div N, exact), and the cell's χ² contribution
    * (o·N − r·c)²/(r·c·N) in micro-units. The total statistic is the
    * SUM of term_micro — an integer sum, order-independent — so
    * callers get both the drill-down and a deterministic total from
    * one result; a float Σ(o−e)²/e would reassociate.
    *
    * Each double term is one fixed-order expression over exact
    * integers (o·N and r·c are exact longs well under 2⁵³ for the
    * intended cardinalities), rounded half-up at micro precision —
    * deterministic and engine-replayable. Scale shape: one
    * map-side-combining cell count; both marginals then collapse into
    * ONE grand-total row of (category, count) structs — bounded by
    * the category domain, which is what "LOW-cardinality categorical"
    * means — and the |A|×|B| scaffold explodes out of that single row
    * before an equi-join back to the observed cells. Restructured in
    * round 17: the former broadcast-marginal crossJoin was the
    * textbook construction but planned as a nested-loop join whose
    * build side no static prover can bound (marginal cardinality is a
    * data property); deriving the scaffold from a grand-total
    * aggregate makes the boundedness claim VISIBLE to
    * [[graft.plans.PlanLint.rowBounded]] — same cells, same marginal
    * values, same fixed-order IEEE term sequence.
    * Exact-integer bound: r·c·10⁶ needs N ≤ ~3·10⁶ rows, the same
    * bound as [[giniImpurity]] — sample first beyond it.
    */
  def chiSquareCells(df: DataFrame, a: Column, b: Column): DataFrame = {
    val cells = df.select(a.as("a"), b.as("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("o"))
    val one = cells.groupBy(col("a")).agg(sum(col("o")).as("r"))
      .agg(collect_list(struct(col("a"), col("r"))).as("ras"),
        coalesce(sum(col("r")), lit(0L)).as("n"))
      .crossJoin(broadcast(
        cells.groupBy(col("b")).agg(sum(col("o")).as("c"))
          .agg(collect_list(struct(col("b"), col("c"))).as("cbs"))))
    val term = (col("o") * col("n") - col("r") * col("c")).cast("double")
    one.select(explode(col("ras")).as("ra"), col("cbs"), col("n"))
      .select(col("ra.a").as("a"), col("ra.r").as("r"),
        explode(col("cbs")).as("cb"), col("n"))
      .select(col("a"), col("r"), col("cb.b").as("b"), col("cb.c").as("c"),
        col("n"))
      .join(cells, Seq("a", "b"), "left")
      .na.fill(0L, Seq("o"))
      .select(col("a"), col("b"), col("o"),
        expr("(r * c * 1000000) div n").as("exp_micro"),
        round(term * term / col("r") / col("c") / col("n") * 1e6, 0)
          .cast("long").as("term_micro"))
  }

  /** Per-group Gini impurity of a label distribution,
    * 1 − Σ (cᵢ/n)² = (n² − Σcᵢ²)·10⁶ div n² in exact integer
    * micro-units — the log-free diversity/purity index (label balance
    * of a stratum, language mix of a source, class skew of a dedup
    * cluster). Entropy needs log; for MONITORING a concentration,
    * Gini ranks distributions the same way and stays rational.
    *
    * Two map-side-combining aggregations (label-cell counts, then the
    * per-group moment sum) — shuffle volume is #distinct (group,
    * label) then #groups. Exact-overflow bound: n²·10⁶ needs
    * n ≤ ~3·10⁶ rows per group; beyond that, sample per group first
    * (q133's hash-sample commutes with a proportion-based index).
    */
  def giniImpurity(df: DataFrame, group: Column, label: Column): DataFrame =
    df.select(group.as("grp"), label.as("lbl"))
      .groupBy(col("grp"), col("lbl")).agg(count(lit(1)).as("c"))
      .groupBy(col("grp"))
      .agg(sum(col("c")).as("n"), count(lit(1)).as("n_labels"),
        sum(col("c") * col("c")).as("ss"))
      .select(col("grp"), col("n"), col("n_labels"),
        expr("((n * n - ss) * 1000000) div (n * n)").as("gini_micro"))

  def profile(df: DataFrame, cols: Seq[(String, Column)]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = cols.flatMap { case (n, c) => Seq(
      count(c).as(s"cnt_$n"),
      count_distinct(c).as(s"dst_$n"),
      min(c).cast("string").as(s"min_$n"),
      max(c).cast("string").as(s"max_$n")) }
    val one = df.agg(count(lit(1)).as("n_rows"), aggs: _*)
    val entries = array(cols.map { case (n, _) =>
      struct(lit(n).as("col_name"), col(s"cnt_$n").as("n_non_null"),
        col(s"dst_$n").as("n_distinct"), col(s"min_$n").as("min_val"),
        col(s"max_$n").as("max_val")) }: _*)
    one.select(col("n_rows"), explode(entries).as("p"))
      .select(col("p.col_name").as("col_name"), col("n_rows"),
        (col("n_rows") - col("p.n_non_null")).as("n_nulls"),
        col("p.n_distinct").as("n_distinct"),
        col("p.min_val").as("min_val"), col("p.max_val").as("max_val"))
  }
}
