package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times the headline queries on SPARK_GRAFT_SF_DIR and
  * prints one JSON line. Results are forced through the `noop` sink so the
  * full plan executes (a bare .count() would let Catalyst prune the
  * projection away).
  *
  * Trust hardening (round 4):
  *  - the JSON line is also written to SPARK_GRAFT_BENCH_OUT
  *    (default `BENCH.json` in the working dir), so consumers never have
  *    to fish it out of sbt log noise;
  *  - /proc/loadavg is stamped before and after the run, so a
  *    machine-load-contaminated result is visible in the artifact itself
  *    (the r3 "regressions" were exactly this);
  *  - load GATE (round 8): if the 1-min load exceeds
  *    SPARK_GRAFT_LOAD_MAX (default 2.0 — this is a 32-core box, so 2
  *    means another multi-core job is active) the run sleep-retries up
  *    to 10×30 s for the machine to go idle; if it never clears, the
  *    artifact records `"valid":false` — the numbers are then a load
  *    measurement, not a bench, and say so machine-readably (the r6/r7
  *    artifacts were both contaminated and only a human rerun could
  *    tell);
  *  - a log4j2 appender counts logged CompileExceptions (a failed Janino
  *    compile means a codegen'd operator silently fell back to
  *    interpreted execution) and the run EXITS NONZERO if any occurred —
  *    a bench of the fallback path is not a bench of the shipped code;
  *  - ALL-CORES contamination gate (round 12): the r10 and r11 driver
  *    artifacts both passed the loadavg gate AND the single-thread
  *    calibration drift check while running 33-76% slow — a contender
  *    job leaves one core free, so single-thread yardsticks read clean
  *    while 32-thread queries starve. [[BenchGates.cpuCalibParMs]]
  *    measures the max-of-32-concurrent-spins wall before and after
  *    the run; a parallel/single ratio above
  *    [[BenchGates.ParRatioMax]] marks the artifact `"valid":false`;
  *  - RETRY-UNTIL-CLEAN (round 13): the r12 driver artifact shipped
  *    `"valid":false` — the gate WORKED (a contender was stealing
  *    cores) but the canonical trend file a reader grabs first was a
  *    flagged load measurement. The whole timed run now sleep-retries
  *    (bounded, SPARK_GRAFT_BENCH_ATTEMPTS, default 3) until the
  *    artifact ends valid, the same way the startup gate already
  *    sleep-retries on loadavg; only if every attempt is contaminated
  *    does the LAST attempt's flagged artifact ship.
  */
object Bench {

  def main(args: Array[String]): Unit = {
    import BenchGates._
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH.json")
    val counter = graft.plans.CodegenWatch.install()
    val spark = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      // one small file per scan split (binaryFile HTML pages fan out
      // across cores without a repartition shuffle); the SF-scale
      // parquet tables are below this bound either way
      .config("spark.sql.files.maxPartitionBytes", s"${4 * 1024 * 1024}")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def runOnce(d: QueryDef): Double = {
      val t0 = System.nanoTime()
      try d.fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => return -1.0 }
      (System.nanoTime() - t0) / 1e9
    }

    // warm-up pass over EVERY query: JIT + codegen + parquet footer
    // caches, and one-time fixture materialization (q24's synthetic
    // pages) all land outside the timed region.
    // min of 3 runs — strips one-off JIT/compile noise and reduces the
    // ±20% machine-load variance a single sample carries.
    // PER-ROW steal with burst retries (round 17): the first r17
    // session artifact shipped valid+in-band while its headline
    // section ran under a 5.6% steal burst — the exact within-attempt
    // gap BenchSf1 closed in 71468ce. Same contract here: each row is
    // min over up to 3 burst-free runs (a run at >= StealGateMaxPct
    // steal is a load measurement and is discarded; bounded at 5 runs
    // total), and the published run's steal is stamped per row.
    def timeSection(targets: Seq[QueryDef])
        : Seq[(String, Double, Double, Int)] = {
      targets.foreach(runOnce)
      targets.map { d =>
        def timedRun(): (Double, Double) = {
          val s0 = stealTicks()
          val t0 = System.nanoTime()
          val sec = runOnce(d)
          (sec, stealPct(stealTicks() - s0,
            (System.nanoTime() - t0) / 1000000L))
        }
        var runs = List.empty[(Double, Double)]
        var clean = 0
        while (runs.length < 5 && clean < 3 && !runs.exists(_._1 < 0)) {
          val r = timedRun()
          runs ::= r
          if (r._1 >= 0 && (r._2 < 0 || r._2 < StealGateMaxPct)) clean += 1
        }
        if (runs.exists(_._1 < 0)) (d.name, -1.0, -1.0, runs.length)
        else {
          val pool = runs.filter(r => r._2 < 0 || r._2 < StealGateMaxPct)
          val best = (if (pool.nonEmpty) pool else runs).minBy(_._1)
          (d.name, best._1, best._2, runs.length)
        }
      }
    }
    def toJsonObj(results: Seq[(String, Double, Double, Int)]): String =
      results.map { case (k, v, _, _) => "\"" + k + "\":" + f"$v%.3f" }
        .mkString("{", ",", "}")
    def toStealObj(results: Seq[(String, Double, Double, Int)]): String =
      results.map { case (k, _, s, _) => "\"" + k + "\":" + f"$s%.2f" }
        .mkString("{", ",", "}")

    // one full gated measurement: idle gate, before-calibrations, the
    // timed sections, after-calibrations → (artifact JSON, clean).
    // `clean` = validFinal AND barrier-comparable: the r15 driver
    // artifact published a contaminated-then-rerun headline as
    // "valid":true with barrier 1.356 — and the headline rows moved
    // hardest (q24 3.0× on unchanged code). Publishing after a
    // contaminated attempt now waits for the barrier probe to re-enter
    // the band (bounded by SPARK_GRAFT_BENCH_ATTEMPTS).
    def attempt(attemptNo: Int): (String, Int) = {
      val gate = waitForIdle()
      val valid = gate.valid
      val loadBefore = loadavg()
      // per-attempt codegen-fallback count (r13 advisor): the watcher is
      // JVM-cumulative, so a clean retry must not inherit a discarded
      // contaminated attempt's fallbacks. The process-exit gate below
      // stays cumulative on purpose.
      val ceStart = counter.count.get()
      val attemptT0 = System.nanoTime()
      val attemptSt0 = stealTicks()
      val calibMs = cpuCalibMs()
      val parMs = cpuCalibParMs()
      // barrier-shaped probe (round 15): the r14 driver artifact shipped
      // a +22% scale_total swing as "valid":true on UNCHANGED code (q95
      // 1.59→2.98 s) while the idle sf1 rerun showed the same queries
      // FASTER — the sf0.1 artifact is the one the driver records every
      // round, so it needs the same iterative-state comparability flag
      // BenchSf1 got in round 14 (see barrierCalibMs scaladoc).
      // Steal sampled across the probe window (round 16): the probe's
      // elevation is caused by hypervisor steal under parallel load —
      // stamping the direct signal turns "barrier 1.3, cause unknown"
      // into "the hypervisor took N% of the box during the probe".
      val barrierSt0 = stealTicks()
      val barrierT0 = System.nanoTime()
      val barrierMs = barrierCalibMs(spark)
      val barrierStealPct = stealPct(stealTicks() - barrierSt0,
        (System.nanoTime() - barrierT0) / 1000000L)
      // per-SECTION steal (round 16): steal is bursty within a clean
      // attempt — the r16 sf1 artifact carried one row 40% high while
      // the attempt averaged 1.2% — so each timed section records the
      // steal it actually ran under, which is the first field to read
      // when a single section moves across rounds
      // PRE-SECTION par re-probe (round 18, r17 verdict item 1): the
      // r17 canonical artifact shipped q24/q30/q34 at 2.4-4.7× under a
      // ~5-core residual load the startup gate had steal-adjudicated
      // away — the contender was IN-GUEST (a finished-but-draining sbt
      // session), invisible to hypervisor steal and measured only once,
      // minutes before the headline section ran. Each timed section now
      // re-probes the all-cores ratio immediately before it starts;
      // a section that began contended is machine-readably so
      // (par_ratio_headline / par_ratio_scale), contributes to
      // valid:false, and de-couples headline_comparable from
      // iterative_comparable (they were the same variable before —
      // What's wrong #6 of the r17 verdict).
      def parNow(): Double = {
        val single = cpuCalibMs()
        cpuCalibParMs().toDouble / single.toDouble
      }
      val parRatioHeadline = parNow()
      val headSt0 = stealTicks()
      val headT0 = System.nanoTime()
      val results = timeSection(SparkEntry.headline)
      val headStealPct = stealPct(stealTicks() - headSt0,
        (System.nanoTime() - headT0) / 1000000L)
      val qs = toJsonObj(results)
      val total = results.map(_._2).filter(_ >= 0).sum
      // second section (round 9): the 100 TB scale families — APSS,
      // stored-index near-dedup, BPE training, PageRank, DBSCAN, HLL —
      // previously invisible to the per-round artifact
      val parRatioScale = parNow() // pre-section re-probe, see above
      val scaleSt0 = stealTicks()
      val scaleT0 = System.nanoTime()
      val scaleResults = timeSection(SparkEntry.scaleBench)
      val scaleStealPct = stealPct(stealTicks() - scaleSt0,
        (System.nanoTime() - scaleT0) / 1000000L)
      val scaleQs = toJsonObj(scaleResults)
      val scaleTotal = scaleResults.map(_._2).filter(_ >= 0).sum
      // calib-normalized value: seconds this run WOULD have taken on the
      // round-8 reference host (cpu_calib_ms = 284 on the r8 recorded
      // artifact). Cross-round comparison becomes a field read instead of
      // reader arithmetic: compare value_per_calib to value_per_calib.
      val refCalibMs = 284.0
      val calibRatio = calibMs.toDouble / refCalibMs
      val valuePerCalib = total / calibRatio
      val scalePerCalib = scaleTotal / calibRatio
      val compileExceptions = counter.count.get() - ceStart
      // mid-run contamination check (round 11): the r10 driver artifact
      // passed the STARTUP load gate yet recorded on a contended host
      // (calib 339 vs 284) and misled trend readers. Re-spin the
      // calibration AFTER the run; >15% drift means the host changed
      // speed mid-bench and the numbers are a load measurement.
      val calibAfterMs = cpuCalibMs()
      val parAfterMs = cpuCalibParMs()
      val barrierAfterMs = barrierCalibMs(spark)
      val calibDrift =
        math.abs(calibAfterMs - calibMs).toDouble / calibMs.toDouble
      // the ALL-CORES probe (round 12): the single-thread spin and the
      // loadavg gate both passed on the contaminated r10/r11 driver
      // artifacts — a contender leaves one core free. The parallel/
      // single ratio, before and after, is what actually sees it.
      val parRatio = parMs.toDouble / calibMs.toDouble
      val parRatioAfter = parAfterMs.toDouble / calibAfterMs.toDouble
      // pre-section probes count toward validity (round 18): a section
      // that started under in-guest contention is a load measurement
      // even when the attempt's endpoint probes read clean
      val parClean = parRatio <= ParRatioMax && parRatioAfter <= ParRatioMax &&
        parRatioHeadline <= ParRatioMax && parRatioScale <= ParRatioMax
      val validFinal = valid && calibDrift <= 0.15 && parClean
      // barrier-state comparability (round 15, widened round 16): NOT
      // folded into `valid` — an elevated barrier state means cross-day
      // deltas are host noise, while the measurement itself is still
      // internally clean. Round 15 proved the probe predicts HEADLINE
      // movement too, not just the iterative scale rows (the driver's
      // barrier-1.356 artifact carried q24 at 3.0× and q03 at 1.35× on
      // unchanged code), so the stamp now covers both sections:
      // `headline_comparable` and `iterative_comparable` read the same
      // probe — a reader cannot mistake host state for regression on
      // ANY published number. Pre-run reading only (the post-bench JVM
      // carries GC/cached-block state that reads slow without being
      // host state); the after value is information.
      val barrierRatio = barrierMs.toDouble / RefBarrierMs
      val iterComparable = math.abs(barrierRatio - 1.0) <= 0.15
      // barrier_state (round 17, from the A/B): the anchor breathes
      // ±25% at near-zero steal, so out-of-band has a DIRECTION a
      // reader needs — "slow" (elevation that fakes regressions) vs
      // "fast" (a quick host window that fakes improvements). A fast
      // window at verified-clean steal is still a valid measurement;
      // value_per_barrier below normalizes it onto the anchor host.
      val barrierState =
        if (iterComparable) "band"
        else if (barrierRatio < 1.0) "fast" else "slow"
      // per-section comparability (round 18): each section's flag now
      // reads ITS OWN pre-section par probe on top of the shared
      // barrier probe — the fields used to print the same variable
      // (r17 verdict What's wrong #6) while the r17 contamination was
      // section-local.
      val headComparable = iterComparable && parRatioHeadline <= ParRatioMax
      val scaleComparable = iterComparable && parRatioScale <= ParRatioMax
      val fastHostClean = validFinal && barrierState == "fast" &&
        barrierStealPct >= 0 && barrierStealPct < StealGateMaxPct
      if (parRatioHeadline > ParRatioMax || parRatioScale > ParRatioMax)
        System.err.println(
          f"[bench] WARN: pre-section all-cores ratio headline=" +
            f"$parRatioHeadline%.2f scale=$parRatioScale%.2f exceeds " +
            f"$ParRatioMax%.2f — that section started contended; " +
            "artifact carries \"valid\":false")
      if (!iterComparable) System.err.println(
        f"[bench] NOTE: barrier calibration $barrierMs/$barrierAfterMs ms " +
          f"vs idle reference ${RefBarrierMs}%.0f ms ($barrierState host) — " +
          "headline AND scale_queries trend deltas are not cross-day " +
          "comparable this run except via value_per_barrier")
      if (!parClean) System.err.println(
        f"[bench] WARN: all-cores calibration ratio $parRatio%.2f/" +
          f"$parRatioAfter%.2f exceeds $ParRatioMax%.2f — another " +
          "multi-core job is stealing cores; artifact carries \"valid\":false")
      else if (!validFinal && valid) System.err.println(
        f"[bench] WARN: calibration drifted $calibDrift%.2f mid-run " +
          s"($calibMs -> $calibAfterMs ms) — artifact carries \"valid\":false")
      val attemptStealPct = stealPct(stealTicks() - attemptSt0,
        (System.nanoTime() - attemptT0) / 1000000L)
      val json =
        f"""{"metric":"headline_total","value":$total%.3f,"unit":"sec","valid":$validFinal,"queries":$qs,"queries_steal_pct":${toStealObj(results)},"scale_total":$scaleTotal%.3f,"scale_queries":$scaleQs,"scale_queries_steal_pct":${toStealObj(scaleResults)},"value_per_calib":$valuePerCalib%.3f,"scale_total_per_calib":$scalePerCalib%.3f,"ref_calib_ms":284,"sf":"$sfDir","loadavg_before":"$loadBefore","loadavg_after":"${loadavg()}","load_gate":"${gate.loadGate}","steal_pct_gate":${gate.gateStealPct}%.2f,"loadavg_gate_residual":${gate.residualLoad}%.2f,"cpu_calib_ms":$calibMs,"cpu_calib_after_ms":$calibAfterMs,"cpu_calib_par_ms":$parMs,"cpu_calib_par_after_ms":$parAfterMs,"par_ratio":$parRatio%.3f,"par_ratio_after":$parRatioAfter%.3f,"par_ratio_headline":$parRatioHeadline%.3f,"par_ratio_scale":$parRatioScale%.3f,"par_ratio_max":$ParRatioMax%.2f,"barrier_calib_ms":$barrierMs,"barrier_calib_after_ms":$barrierAfterMs,"ref_barrier_ms":${RefBarrierMs}%.0f,"barrier_ratio":$barrierRatio%.3f,"steal_pct_barrier":$barrierStealPct%.2f,"steal_pct_headline":$headStealPct%.2f,"steal_pct_scale":$scaleStealPct%.2f,"steal_pct_attempt":$attemptStealPct%.2f,"headline_comparable":$headComparable,"iterative_comparable":$scaleComparable,"barrier_state":"$barrierState","value_per_barrier":${total / barrierRatio}%.3f,"scale_total_per_barrier":${scaleTotal / barrierRatio}%.3f,"attempt":$attemptNo,"compile_exceptions":$compileExceptions}"""
      (json,
        if (validFinal && iterComparable) RankClean
        else if (fastHostClean) RankFastHost
        else RankDirty)
    }

    val json = retryUntilValid("bench")(attempt)
    println(json)
    // the printed line is the source of truth; an unwritable out path
    // must not turn a successful run into a nonzero exit
    try java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch {
      case e: Throwable =>
        System.err.println(s"[bench] WARN: could not write $outPath: $e")
    }
    spark.stop()
    val compileExceptions = counter.count.get()
    if (compileExceptions > 0) {
      System.err.println(s"[bench] FAILING: $compileExceptions CompileException(s) logged — a codegen'd stage fell back to interpreted execution")
      sys.exit(1)
    }
  }
}

/** Idle-reference re-anchoring main (round 16): prints the barrier
  * probe reading from a fresh JVM in the exact session shape Bench and
  * BenchSf1 use, plus the single-thread and all-cores spins — run this
  * on a VERIFIED-IDLE host (loadavg < 0.5, no contenders) to re-stamp
  * [[BenchGates.RefBarrierMs]] when the flag starts firing on every
  * run (the r15 failure mode: every measurement read 1.14–1.36 against
  * a stale 4700 ms anchor, so the flag stopped informing). One JSON
  * line: {"barrier_ms":…,"calib_ms":…,"par_ratio":…,"loadavg":"…"}.
  */
object BarrierAnchor {
  def main(args: Array[String]): Unit = {
    import BenchGates._
    val spark = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-barrier-anchor")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val calib = cpuCalibMs()
    val par = cpuCalibParMs()
    val st0 = stealTicks()
    val t0 = System.nanoTime()
    val barrier = barrierCalibMs(spark)
    val stl = stealPct(stealTicks() - st0, (System.nanoTime() - t0) / 1000000L)
    println(f"""{"barrier_ms":$barrier,"calib_ms":$calib,"par_ratio":${par.toDouble / calib}%.3f,"steal_pct_barrier":$stl%.2f,"ref_barrier_ms":${RefBarrierMs}%.0f,"loadavg":"${loadavg()}"}""")
    spark.stop()
  }
}

/** The trust gates every bench artifact shares (Bench, BenchSf1):
  * idle gate, loadavg stamps, and the deterministic CPU calibration.
  */
object BenchGates {

  /** Deterministic single-thread spin (xorshift64, 2²⁷ rounds, min of
    * 3 after a JIT warm-up), in milliseconds — a host-speed yardstick
    * stamped into the artifact. loadavg exposes CONTENTION but not a
    * slower host: two idle machines can differ 30%+ in single-core
    * speed, which would read as a code regression across rounds. With
    * the calibration in the artifact, cross-round per-query seconds
    * can be normalized by the hosts' calibration ratio before anyone
    * concludes a plan got worse.
    */
  private def spinOnce(): Long = {
    var h = 0x9E3779B97F4A7C15L
    var i = 0
    val t0 = System.nanoTime()
    while (i < (1 << 27)) {
      h ^= h << 13; h ^= h >>> 7; h ^= h << 17
      i += 1
    }
    // publish h so the loop cannot be dead-code-eliminated
    if (h == 42L) System.err.print("")
    (System.nanoTime() - t0) / 1000000L
  }

  def cpuCalibMs(): Long = {
    spinOnce() // JIT warm-up
    Seq.fill(3)(spinOnce()).min
  }

  /** All-cores calibration probe (round 12): wall-clock for ALL of
    * `nThreads` concurrent spins to finish (max-of-threads), min of 2
    * runs. The single-thread spin is blind to multi-core contention —
    * a contender job leaves one core free for the spin, so `calibMs`
    * and the 1-min loadavg both read clean while every local[32] query
    * is starved (the r10 AND r11 driver artifacts passed every gate
    * that way). The PARALLEL/SINGLE ratio is the detector: measured
    * idle on the reference host it is ~1.13, and a 12-thread contender
    * moves it to ~1.88 while moving the single spin only 13%. Gate at
    * [[ParRatioMax]], before AND after the run.
    */
  /** Barrier-shaped calibration probe (round 14): wall-clock for a
    * fixed 10-round shuffle-iterate microjob — each round is one job
    * (range scan → keyed repartition → count), so the probe pays 10
    * scheduler barriers and 10 shuffle write+read cycles over a fixed
    * 4 M-row working set. Rationale: the r13 frozen-binary A/B proved
    * q93/q207's ±25% cross-day sf1 swings were HOST STATE, yet both
    * runs passed every existing gate — the single-thread and all-cores
    * CPU spins are pure-compute and blind to whatever moves
    * barrier/shuffle latency (page cache, IO, scheduler state). This
    * probe is shaped like the queries that drifted; BenchSf1 stamps it
    * before and after the run next to [[RefBarrierMs]], and flags
    * `iterative_comparable:false` when it sits >15% off the idle
    * reference — sf1 trend deltas on iterative-barrier rows
    * (q93/q207/q125-shaped) are then machine-readably noise, without
    * poisoning `valid` (the measurement itself is still internally
    * clean).
    */
  def barrierCalibMs(spark: SparkSession, rounds: Int = 15,
      rows: Long = 1L << 20): Long = {
    import org.apache.spark.sql.functions._
    def once(): Long = {
      val t0 = System.nanoTime()
      var i = 0
      var sink = 0L
      while (i < rounds) {
        sink ^= spark.range(rows)
          .select((col("id") * 2654435761L % 65536).as("k"))
          .repartition(32, col("k"))
          .count()
        i += 1
      }
      if (sink == 42L) System.err.print("")
      (System.nanoTime() - t0) / 1000000L
    }
    // the probe reads scheduler+shuffle latency, not allocator state: a
    // JVM fresh off a heavy bench carries GC debt that would read as
    // host drift — settle it first
    System.gc()
    // DEEP warm-up (measured): with a single warm-up loop the reading
    // tracks JIT depth, not the host — fresh JVMs read ~4.0-4.7 s where
    // a heavily-exercised JVM reads ~2.7 s for the same host state.
    // Three full loops before timing puts the whole scheduler/shuffle/
    // codegen stack on its steady tier.
    (1 to 3).foreach(_ => once())
    Seq.fill(3)(once()).min
  }

  /** Idle reference for [[barrierCalibMs]]. RE-ANCHORED round 16: the
    * r14 stamp (4700, clean band 4240–5185) went stale — every r15
    * measurement read 1.14–1.36 against it, so the flag had stopped
    * informing. Root cause found via the steal stamp: this guest's
    * vCPUs are hypervisor-overcommitted, and a noisy neighbor now takes
    * 2–13% of capacity under parallel load, varying by the minute
    * (idle ≈ 1.8%, measured under a 32-thread spin: 9.4%). The r16
    * re-anchor is the reading at a VERIFIED-near-zero-steal moment
    * (barrier 5594 ms at 0.32% steal; contended same-day readings
    * 6517–11768 at 5.7–13.2% steal — read steal_pct_barrier in the
    * artifact to adjudicate any flagged run directly). The 15% band is
    * unchanged: it tolerates intra-day wander at low steal while
    * flagging the steal-storm class. Env-overridable for other hosts
    * like the par-ratio gate; re-stamp with graft.BarrierAnchor when
    * it next goes stale.
    *
    * Round-17 A/B finding: the idle reading itself breathes ±25% at
    * near-zero steal (5470 vs 4150 ms an hour apart, both < 0.8%
    * probe steal — neighbor bandwidth pressure steal cannot count),
    * so this anchor is a band CENTER, not a constant: a below-band
    * barrier_ratio with a clean steal stamp means a FAST host, and
    * such runs are as internally clean as in-band ones (SCALING.md
    * round 17, finding 3).
    */
  val RefBarrierMs: Double =
    sys.env.get("SPARK_GRAFT_REF_BARRIER_MS")
      .flatMap(s => scala.util.Try(s.toDouble).toOption)
      .getOrElse(5600.0)

  def cpuCalibParMs(nThreads: Int = CalibThreads): Long = {
    spinOnce() // JIT warm-up (shared method with cpuCalibMs)
    def wall(): Long = {
      val ts = Array.fill(nThreads)(new Thread(() => { spinOnce(); () }))
      val t0 = System.nanoTime()
      ts.foreach(_.start())
      ts.foreach(_.join())
      (System.nanoTime() - t0) / 1000000L
    }
    Seq.fill(2)(wall()).min
  }

  /** Threads for the all-cores probe. Default availableProcessors —
    * correct on the reference host (32 physical-thread local[32] box).
    * On an SMT host availableProcessors counts hyperthreads, so 2×
    * physical-core spins share ports and the IDLE ratio sits near 2.0;
    * set SPARK_GRAFT_CALIB_THREADS to the physical core count there
    * (or raise SPARK_GRAFT_PAR_RATIO_MAX) so clean runs aren't flagged.
    */
  val CalibThreads: Int =
    sys.env.get("SPARK_GRAFT_CALIB_THREADS").map(_.toInt)
      .getOrElse(Runtime.getRuntime.availableProcessors())

  /** Max allowed parallel/single calibration ratio for a valid
    * artifact. Committed reference: 1.13 idle on the r12 host; 1.35
    * leaves scheduler-noise headroom while still flagging any
    * contender big enough to skew a 32-thread query (a 12-thread
    * contender measures ~1.9). Host-overridable (round 13, per
    * advisor): the 1.35 constant is calibrated to the non-SMT
    * reference host — on SMT hosts set SPARK_GRAFT_PAR_RATIO_MAX
    * (or SPARK_GRAFT_CALIB_THREADS above) to the locally-measured
    * idle ratio plus headroom.
    */
  val ParRatioMax: Double =
    sys.env.get("SPARK_GRAFT_PAR_RATIO_MAX").map(_.toDouble).getOrElse(1.35)

  /** Retry-until-clean (round 13; attempt-aware round 16): run the
    * full gated measurement up to SPARK_GRAFT_BENCH_ATTEMPTS (default
    * 3) times, sleeping 60 s between attempts, until one reports clean.
    * The r12 driver artifact shipped valid:false — the contamination
    * gate fired correctly, but the canonical trend file was then a
    * flagged load measurement; a bounded whole-run retry makes the
    * committed artifact a measurement whenever the contention is
    * transient. Since round 16 the caller's cleanliness predicate may
    * be STRICTER than `valid` (Bench/BenchSf1 also require the barrier
    * probe in its comparability band — the r15 driver artifact was
    * "valid":true yet carried a 3.0× headline swing the probe had
    * flagged), and each attempt receives its 1-based number so the
    * artifact records how many measurements it took. If every attempt
    * is dirty the LAST attempt's flagged JSON is returned — an honest
    * record, machine-readably flagged via its own fields.
    */
  /** Attempt quality ranks for [[retryUntilValid]]: CLEAN = valid and
    * barrier in its comparability band (stop retrying, ship);
    * FAST_HOST = valid, internally clean, barrier BELOW band at a
    * verified-clean steal reading — the round-17 A/B proved this is a
    * genuinely fast host window (the idle anchor breathes ±25% at
    * near-zero steal), so such an attempt is a real measurement worth
    * shipping over a storm-flagged one, machine-readably stamped
    * `barrier_state:"fast"`; DIRTY = everything else.
    */
  val RankClean = 2
  val RankFastHost = 1
  val RankDirty = 0

  def retryUntilValid(
      label: String,
      maxAttempts: Int =
        // tolerant parse (r13 advisor): a malformed env value must not
        // crash the bench after the session is already up
        // default raised 3 → 4 in round 17 (r16 verdict task 2): two
        // rounds running the driver's canonical artifact shipped with
        // every attempt flagged; one more attempt plus the steal-gated
        // pre-wait in waitForIdle makes a clean canonical point the
        // expected outcome rather than the lucky one
        sys.env.get("SPARK_GRAFT_BENCH_ATTEMPTS")
          .flatMap(s => scala.util.Try(s.toInt).toOption)
          .getOrElse(4).max(1),
      sleepMs: Long = 60000L)(attempt: Int => (String, Int)): String = {
    // best-attempt shipping (round 17): retry toward a CLEAN attempt,
    // but remember the best-ranked artifact seen — when the host never
    // offers an in-band window (it sat FAST all session during the r17
    // A/B), a valid fast-host measurement ships instead of whatever
    // flagged artifact happened to be last (the r15/r16 canonical-file
    // failure mode).
    var n = 1
    var (json, rank) = attempt(n)
    var best = (json, rank)
    while (rank < RankClean && n < maxAttempts) {
      System.err.println(
        s"[$label] attempt $n/$maxAttempts contaminated or flagged — " +
          s"sleeping ${sleepMs / 1000} s and re-running the whole measurement")
      Thread.sleep(sleepMs)
      n += 1
      val r = attempt(n); json = r._1; rank = r._2
      if (rank >= best._2) best = (json, rank)
    }
    if (rank < RankClean) {
      if (best._2 == RankFastHost) System.err.println(
        s"[$label] no in-band attempt in $maxAttempts tries — shipping " +
          "the valid fast-host measurement (barrier_state:\"fast\")")
      else System.err.println(
        s"[$label] all $maxAttempts attempts contaminated or flagged — " +
          "shipping the last artifact; its valid/comparable fields say why")
      best._1
    } else json
  }

  def loadavg(): String =
    try {
      val s = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("/proc/loadavg")),
        java.nio.charset.StandardCharsets.UTF_8)
      s.split("\\s+").take(3).mkString(" ")
    } catch { case _: Throwable => "unavailable" }

  /** Cumulative hypervisor steal ticks (/proc/stat cpu line, field 8,
    * USER_HZ = 100). Round 16: direct measurement of what the barrier
    * probe was proxying — this host measures ~2% steal idle but
    * 9–13% under full 32-thread load (a noisy neighbor takes 3–4
    * cores' worth whenever the guest goes wide, varying by the
    * minute), which is exactly the "barrier/shuffle-shaped capacity
    * invisible to pure-compute gates" the r13–r15 swings traced to.
    * −1 when unavailable (non-Linux).
    */
  def stealTicks(): Long =
    try {
      val s = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("/proc/stat")),
        java.nio.charset.StandardCharsets.UTF_8)
      val a = s.linesIterator.next().trim.split("\\s+")
      if (a.length > 8) a(8).toLong else -1L
    } catch { case _: Throwable => -1L }

  /** Steal as % of total guest CPU capacity over a window: ticks are
    * 10 ms each, capacity is elapsed × cores.
    */
  def stealPct(ticksDelta: Long, elapsedMs: Long): Double =
    if (ticksDelta < 0 || elapsedMs <= 0) -1.0
    else 100.0 * ticksDelta * 10.0 /
      (elapsedMs.toDouble * Runtime.getRuntime.availableProcessors())

  /** The idle gate's verdict plus the evidence it decided on, so the
    * artifact can distinguish a genuinely idle start from an
    * adjudicated one (round 17, advisor: the loadavg demotion needs
    * its override STAMPED, not just logged to stderr).
    * `loadGate` values: "clear" (every signal clean),
    * "steal_adjudicated" (loadavg lingered; par ratio + repeated
    * loaded-steal samples clean → self-residue), "steal_never_cleared"
    * (gates clean but the loaded-steal pre-wait never dropped below
    * [[StealGateMaxPct]] — the measurement is internally valid but the
    * barrier probe will likely flag comparability), "failed_par_ratio"
    * / "failed_loadavg_steal" (a contender confirmed — valid:false).
    */
  case class IdleGate(valid: Boolean, loadGate: String,
      gateStealPct: Double, residualLoad: Double)

  /** Hypervisor steal measured UNDER a sustained all-cores spin load —
    * the signal that actually predicts barrier/headline elevation on
    * this overcommitted guest (idle steal reads ~2% while loaded steal
    * swings 0–13% minute to minute; SCALING.md round 16). A ~5 s
    * loaded window, per the SCALING.md gating recipe — long enough to
    * catch a storm the one-shot par-probe sample misses. −1 when
    * /proc/stat is unavailable.
    */
  def stealUnderLoadPct(ms: Long = 5000L): Double = {
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val ts = Array.fill(CalibThreads)(new Thread(() => {
      while (!stop.get()) spinOnce(); ()
    }))
    ts.foreach { t => t.setDaemon(true); t.start() }
    try {
      val s0 = stealTicks()
      val t0 = System.nanoTime()
      Thread.sleep(ms)
      stealPct(stealTicks() - s0, (System.nanoTime() - t0) / 1000000L)
    } finally { stop.set(true); ts.foreach(_.join()) }
  }

  /** Loaded-steal threshold for the pre-measurement gate (round 17,
    * r16 verdict task 2): the SCALING.md recipe's < 2%. The
    * adjudication threshold for a lingering loadavg stays at the
    * round-16 3% — it decides validity, not comparability.
    */
  val StealGateMaxPct: Double =
    sys.env.get("SPARK_GRAFT_STEAL_GATE_MAX")
      .flatMap(s => scala.util.Try(s.toDouble).toOption).getOrElse(2.0)

  /** Hard ceiling for the lingering-loadavg steal adjudication (round
    * 18, r17 verdict item 1): a residual 1-min load above this is a
    * contender no matter what the indirect signals say — the gate
    * refuses to proceed on steal/par evidence alone. 3.0 leaves room
    * for the bench's own probe/writeback residue (~1 core) plus lag
    * while staying far below the r17 false-proceed's 5.37.
    */
  val LoadAdjudicateMax: Double =
    sys.env.get("SPARK_GRAFT_LOAD_ADJUDICATE_MAX")
      .flatMap(s => scala.util.Try(s.toDouble).toOption).getOrElse(3.0)

  /** Load gate: a bench started on a busy machine measures the load,
    * not the code. Waits for idle (up to 10×30 s per signal); the
    * returned [[IdleGate]] carries the verdict AND the evidence.
    * Round 17 adds a steal-gated pre-wait (the r16 canonical driver
    * artifact shipped `headline_comparable:false` for the second round
    * running — every attempt STARTED inside a steal storm the loadavg
    * and par-ratio gates cannot see): after the legacy gates clear,
    * the gate samples steal under its own ~5 s all-cores load and
    * sleep-retries until the sample drops below [[StealGateMaxPct]],
    * so attempt 1 begins in a clean window whenever the host offers
    * one inside the wait budget. The repeated samples double as the
    * lingering-loadavg adjudication signal (advisor: the old one-shot
    * sample left a false-clean window).
    */
  def waitForIdle(): IdleGate = {
    def load1(): Double = loadavg().split(" ").headOption
      .flatMap(s => scala.util.Try(s.toDouble).toOption).getOrElse(0.0)
    val loadMax = sys.env.getOrElse("SPARK_GRAFT_LOAD_MAX", "2.0").toDouble
    // each gate gets its OWN retry budget (r13 advisor: a shared
    // counter silently halved the worst-case wait and let a loadavg
    // storm starve the par-ratio gate of retries)
    var loadWaits = 0
    while (load1() > loadMax && loadWaits < 10) {
      loadWaits += 1
      System.err.println(
        f"[bench] 1-min load ${load1()}%.2f > $loadMax%.2f — " +
          s"sleeping 30 s (retry $loadWaits/10)")
      Thread.sleep(30000L)
    }
    // residual sampled HERE, before the gate's own probes (round 18):
    // the par/steal probes below spin all cores for ~20 s, which
    // re-inflates the 1-min loadavg above any honest ceiling — sampling
    // after them turned every retry attempt's own instrumentation into
    // a "contender" under the hard adjudication ceiling. A contender
    // arriving DURING the probes is caught by the probes themselves
    // (par ratio, loaded steal) and by the per-section re-probes.
    val residual = load1()
    // all-cores pre-gate (round 13): the 1-min loadavg lags ~60 s and
    // misses a contender that leaves one core free; probe the
    // parallel/single spin ratio directly before letting a timed run
    // start, so transient contention burns a sleep here instead of a
    // whole contaminated measurement.
    def parNow(): Double = {
      val single = cpuCalibMs()
      cpuCalibParMs().toDouble / single.toDouble
    }
    var ratio = parNow()
    var parWaits = 0
    while (ratio > ParRatioMax && parWaits < 10) {
      parWaits += 1
      System.err.println(
        f"[bench] all-cores ratio $ratio%.2f > $ParRatioMax%.2f — " +
          s"sleeping 30 s (retry $parWaits/10)")
      Thread.sleep(30000L)
      ratio = parNow()
    }
    // steal-gated pre-wait (round 17): sample hypervisor steal under a
    // sustained ~5 s all-cores load and wait for a clean window. This
    // is what the loadavg/par gates cannot see (an out-of-guest
    // neighbor), and starting attempts inside a storm is why the r15
    // AND r16 canonical driver artifacts shipped comparable:false.
    // A never-clearing storm does NOT invalidate the measurement —
    // the barrier probe owns comparability — but the artifact records
    // that the gate gave up.
    var stl = stealUnderLoadPct()
    var stealWaits = 0
    while (stl >= StealGateMaxPct && stealWaits < 10) {
      stealWaits += 1
      System.err.println(
        f"[bench] loaded steal $stl%.2f%% >= $StealGateMaxPct%.2f%% — " +
          s"sleeping 30 s for a clean window (retry $stealWaits/10)")
      Thread.sleep(30000L)
      stl = stealUnderLoadPct()
    }
    // stale-par recovery (round 17, found by the A/B itself): a steal
    // storm inflates the par ratio too (the 32 spins starve on stolen
    // cores), so the par loop can exhaust its retries DURING a storm
    // that the steal pre-wait — which runs after it — then waits out.
    // p1 of the r17 A/B shipped valid:false from exactly that stale
    // reading while the attempt's own in-run ratios read 1.097/1.077.
    // One fresh probe after the steal wait decides with current
    // evidence; the recovery is stamped, not silent.
    var parRecovered = false
    if (ratio > ParRatioMax && stl >= 0 && stl < StealGateMaxPct) {
      val fresh = parNow()
      if (fresh <= ParRatioMax) {
        System.err.println(
          f"[bench] par ratio recovered after the steal wait " +
            f"($ratio%.2f -> $fresh%.2f) — the storm that inflated it " +
            "has passed; proceeding (stamped)")
        ratio = fresh
        parRecovered = true
      }
    }
    // loadavg demotion (round 16): the 1-min loadavg measures runnable
    // PLUS uninterruptible threads, which includes the bench's OWN
    // residue — a prior attempt's writeback and the gate's own spin
    // probes keep it re-inflated, and the r16 sf1 attempt 2 was
    // marked invalid purely on loadavg while the all-cores ratio read
    // 1.10 (no contender) and the run's mid-flight gates were clean.
    // When loadavg alone fails to clear, adjudicate with the DIRECT
    // signals: the par ratio (in-guest multi-core contender) and
    // hypervisor steal under load (out-of-guest contender) — since
    // round 17 the REPEATED pre-wait samples above, not a one-shot
    // (advisor: a single 2-spin window could read clean inside a
    // storm). Steal unavailable (non-Linux, -1) keeps the old strict
    // behavior.
    val loadCleared = residual <= loadMax
    val ratioCleared = ratio <= ParRatioMax
    val gate =
      if (!ratioCleared) {
        System.err.println(
          f"[bench] WARN: all-cores ratio $ratio%.2f never cleared " +
            f"$ParRatioMax%.2f — artifact will carry \"valid\":false")
        IdleGate(valid = false, "failed_par_ratio", stl, residual)
      } else if (loadCleared) {
        if (stl >= 0 && stl >= StealGateMaxPct) IdleGate(valid = true,
          "steal_never_cleared", stl, residual)
        else if (parRecovered) IdleGate(valid = true,
          "par_recovered_after_steal_wait", stl, residual)
        else IdleGate(valid = true, "clear", stl, residual)
      } else {
        // HARD adjudication ceiling (round 18, r17 verdict item 1): the
        // r16 verdict predicted a contender that moves neither steal nor
        // the par ratio, and the very first steal-adjudicated canonical
        // run (r17, residual 5.37) shipped q24/q30/q34 at 2.4-4.7× with
        // valid:true. Self-residue from the bench's own probes cannot
        // exceed ~1 sustained core plus writeback — a residual above
        // [[LoadAdjudicateMax]] is a contender by definition, no matter
        // how clean the indirect signals read, and the gate refuses to
        // adjudicate it away.
        val ok = stl >= 0 && stl < 3.0 && residual <= LoadAdjudicateMax
        System.err.println(
          f"[bench] loadavg $residual%.2f never cleared but ratio " +
            f"$ratio%.2f is clean; steal under load $stl%.2f%% — " +
            (if (ok) "self-residue, proceeding (stamped steal_adjudicated)"
             else if (residual > LoadAdjudicateMax)
               f"residual above the $LoadAdjudicateMax%.1f adjudication " +
                 "ceiling, artifact will carry \"valid\":false"
             else "contention confirmed, artifact will carry \"valid\":false"))
        if (ok) IdleGate(valid = true, "steal_adjudicated", stl, residual)
        else IdleGate(valid = false, "failed_loadavg_steal", stl, residual)
      }
    gate
  }
}

/** sf1 (100× grading scale) timed bench of the scale families, with the
  * SAME trust gates as [[Bench]] — idle gate, warm-up + min-of-3, CPU
  * calibration, codegen-fallback hard failure. The round-9 "scale
  * smoke" proved partition-invariance at sf1 but was single-run and
  * ungated, so a scaling REGRESSION at 100× stayed half-invisible; this
  * main makes sf1 latency a first-class per-round artifact
  * (bench/BENCH_SF1_r{N}.json).
  *
  * Input: SPARK_GRAFT_SF1_DIR (default /tmp/graft_sf1), generated by
  * `python3 tools/gen_sf1.py` from sf0.1. Output JSON:
  * `{"metric":"sf1_total", ...}` with the Bench field set.
  */
object BenchSf1 {

  def main(args: Array[String]): Unit = {
    import BenchGates._
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF1_DIR", "/tmp/graft_sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_SF1.json")
    require(new java.io.File(sfDir).isDirectory,
      s"$sfDir missing — run: python3 tools/gen_sf1.py /root/testdata/sf0.1 $sfDir")
    val counter = graft.plans.CodegenWatch.install()
    val spark = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master(s"local[$cpus]")
      .appName("graft-bench-sf1")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.maxPartitionBytes", s"${4 * 1024 * 1024}")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def runOnce(d: QueryDef): Double = {
      val t0 = System.nanoTime()
      try d.fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench-sf1] ${d.name} failed: $e"); return -1.0 }
      (System.nanoTime() - t0) / 1e9
    }
    val targets = SparkEntry.scaleBenchSf1

    def attempt(attemptNo: Int): (String, Int) = {
      val gate = waitForIdle()
      val valid = gate.valid
      val loadBefore = loadavg()
      val ceStart = counter.count.get() // per-attempt delta, see Bench
      val attemptT0 = System.nanoTime()
      val attemptSt0 = stealTicks()
      val calibMs = cpuCalibMs()
      val parMs = cpuCalibParMs()
      val barrierSt0 = stealTicks()
      val barrierT0 = System.nanoTime()
      val barrierMs = barrierCalibMs(spark)
      val barrierStealPct = stealPct(stealTicks() - barrierSt0,
        (System.nanoTime() - barrierT0) / 1000000L)
      targets.foreach(runOnce) // warm-up
      // per-section steal, mirroring Bench (round 16): the timed loop's
      // own steal window, separate from the warm-up and the probes
      val secSt0 = stealTicks()
      val secT0 = System.nanoTime()
      // PER-ROW steal with burst retries (round 17, r16 verdict task 3):
      // the r16 sf1 artifact carried q34 at 13.21 s inside a VALID,
      // comparable attempt while a verified-0.1%-steal re-time read
      // 9.47 — a single-row burst averaged into the published row with
      // nothing in the artifact to adjudicate it. Each row now runs
      // min-over-3 where every run carries its own steal sample; runs
      // at >= StealGateMaxPct steal are discarded and re-run (bounded:
      // 5 runs total), and the artifact stamps the published (min)
      // run's steal per row plus how many runs were burst-discarded —
      // a future single-row jump is adjudicable from the artifact
      // alone.
      val results = targets.map { d =>
        def timedRun(): (Double, Double) = {
          val s0 = stealTicks()
          val t0 = System.nanoTime()
          val sec = runOnce(d)
          (sec, stealPct(stealTicks() - s0,
            (System.nanoTime() - t0) / 1000000L))
        }
        var runs = List.empty[(Double, Double)]
        var clean = 0
        while (runs.length < 5 && clean < 3 && !runs.exists(_._1 < 0)) {
          val r = timedRun()
          runs ::= r
          if (r._1 >= 0 && (r._2 < 0 || r._2 < StealGateMaxPct)) clean += 1
        }
        if (runs.exists(_._1 < 0)) (d.name, -1.0, -1.0, runs.length)
        else {
          // min over the burst-free runs when any exist (the burst
          // runs are load measurements); else min over all, honestly
          // stamped with its elevated steal
          val pool = runs.filter(r => r._2 < 0 || r._2 < StealGateMaxPct)
          val best = (if (pool.nonEmpty) pool else runs).minBy(_._1)
          (d.name, best._1, best._2, runs.length)
        }
      }
      val secStealPct = stealPct(stealTicks() - secSt0,
        (System.nanoTime() - secT0) / 1000000L)
      val qs = results.map { case (k, v, _, _) =>
        "\"" + k + "\":" + f"$v%.3f" }.mkString("{", ",", "}")
      val qSteal = results.map { case (k, _, s, _) =>
        "\"" + k + "\":" + f"$s%.2f" }.mkString("{", ",", "}")
      val qRuns = results.map { case (k, _, _, n) =>
        "\"" + k + "\":" + n }.mkString("{", ",", "}")
      val total = results.map(_._2).filter(_ >= 0).sum
      val refCalibMs = 284.0
      val valuePerCalib = total / (calibMs.toDouble / refCalibMs)
      val compileExceptions = counter.count.get() - ceStart
      // same mid-run contamination checks as Bench (single-thread drift,
      // round 11; all-cores parallel ratio, round 12)
      val calibAfterMs = cpuCalibMs()
      val parAfterMs = cpuCalibParMs()
      val barrierAfterMs = barrierCalibMs(spark)
      val calibDrift =
        math.abs(calibAfterMs - calibMs).toDouble / calibMs.toDouble
      val parRatio = parMs.toDouble / calibMs.toDouble
      val parRatioAfter = parAfterMs.toDouble / calibAfterMs.toDouble
      val parClean = parRatio <= ParRatioMax && parRatioAfter <= ParRatioMax
      val validFinal = valid && calibDrift <= 0.15 && parClean
      // barrier-state comparability flag (round 14): not folded into
      // `valid` — the measurement is still internally clean — but when
      // the barrier probe sits >15% off its idle reference, cross-day
      // trend deltas on iterative-barrier rows are noise and the
      // artifact says so machine-readably (see barrierCalibMs scaladoc).
      // Gated on the PRE-RUN reading only: the post-bench JVM carries
      // cached-block and GC state that reads slow without being host
      // state (measured: after-probe +50% in an otherwise-clean run);
      // the after value is recorded as information, not a gate.
      val barrierRatio = barrierMs.toDouble / RefBarrierMs
      val iterComparable = math.abs(barrierRatio - 1.0) <= 0.15
      // barrier_state + fast-host rank: same round-17 semantics as
      // Bench (see the attempt() there and BenchGates.RankFastHost)
      val barrierState =
        if (iterComparable) "band"
        else if (barrierRatio < 1.0) "fast" else "slow"
      val fastHostClean = validFinal && barrierState == "fast" &&
        barrierStealPct >= 0 && barrierStealPct < StealGateMaxPct
      if (!iterComparable) System.err.println(
        f"[bench-sf1] NOTE: barrier calibration $barrierMs/$barrierAfterMs ms " +
          f"vs idle reference ${RefBarrierMs}%.0f ms ($barrierState host) — " +
          "iterative-barrier rows (q93/q207-shaped) are not cross-day " +
          "comparable this run except via value_per_barrier")
      if (!parClean) System.err.println(
        f"[bench-sf1] WARN: all-cores calibration ratio $parRatio%.2f/" +
          f"$parRatioAfter%.2f exceeds $ParRatioMax%.2f — artifact " +
          "carries \"valid\":false")
      else if (!validFinal && valid) System.err.println(
        f"[bench-sf1] WARN: calibration drifted $calibDrift%.2f mid-run " +
          s"($calibMs -> $calibAfterMs ms) — artifact carries \"valid\":false")
      val attemptStealPct = stealPct(stealTicks() - attemptSt0,
        (System.nanoTime() - attemptT0) / 1000000L)
      val json =
        f"""{"metric":"sf1_total","value":$total%.3f,"unit":"sec","valid":$validFinal,"queries":$qs,"queries_steal_pct":$qSteal,"queries_runs":$qRuns,"value_per_calib":$valuePerCalib%.3f,"ref_calib_ms":284,"sf":"$sfDir","loadavg_before":"$loadBefore","loadavg_after":"${loadavg()}","load_gate":"${gate.loadGate}","steal_pct_gate":${gate.gateStealPct}%.2f,"loadavg_gate_residual":${gate.residualLoad}%.2f,"cpu_calib_ms":$calibMs,"cpu_calib_after_ms":$calibAfterMs,"cpu_calib_par_ms":$parMs,"cpu_calib_par_after_ms":$parAfterMs,"par_ratio":$parRatio%.3f,"par_ratio_after":$parRatioAfter%.3f,"par_ratio_max":$ParRatioMax%.2f,"barrier_calib_ms":$barrierMs,"barrier_calib_after_ms":$barrierAfterMs,"ref_barrier_ms":${RefBarrierMs}%.0f,"barrier_ratio":$barrierRatio%.3f,"steal_pct_barrier":$barrierStealPct%.2f,"steal_pct_queries":$secStealPct%.2f,"steal_pct_attempt":$attemptStealPct%.2f,"headline_comparable":$iterComparable,"iterative_comparable":$iterComparable,"barrier_state":"$barrierState","value_per_barrier":${total / barrierRatio}%.3f,"attempt":$attemptNo,"compile_exceptions":$compileExceptions}"""
      (json,
        if (validFinal && iterComparable) RankClean
        else if (fastHostClean) RankFastHost
        else RankDirty)
    }

    val json = retryUntilValid("bench-sf1")(attempt)
    println(json)
    try java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case e: Throwable =>
      System.err.println(s"[bench-sf1] WARN: could not write $outPath: $e") }
    spark.stop()
    val compileExceptions = counter.count.get()
    if (compileExceptions > 0) {
      System.err.println(s"[bench-sf1] FAILING: $compileExceptions CompileException(s) logged")
      sys.exit(1)
    }
  }
}
