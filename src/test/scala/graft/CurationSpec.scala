package graft

import graft.operators.{Dedup, Layout, Scale, Similarity, SnapshotDiff}
import org.apache.spark.sql.functions._

/** Round-6 operator semantics: snapshot diff classification, stratified
  * and token-budget sampling invariants, z-order locality, quantized-ANN
  * recall, semantic-dedup keep rule, and stream-join/batch equivalence
  * (the latter also oracle-anchored by q74).
  */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("snapshot diff classifies added/removed/changed, null-safe") {
    val oldDf = Seq((1L, Some(10.0), "A"), (2L, Some(20.0), "B"),
      (3L, None: Option[Double], "C"), (4L, Some(40.0), "D"))
      .toDF("k", "price", "status")
    val newDf = Seq((2L, Some(20.0), "B"), (3L, Some(30.0), "C"),
      (4L, Some(40.0), "E"), (5L, Some(50.0), "F"))
      .toDF("k", "price", "status")
    val out = SnapshotDiff.diff(oldDf, newDf, "k", Seq("price", "status"))
      .orderBy("k").collect()
    assert(out.map(r => (r.getLong(0), r.getString(1))).toSeq ===
      Seq((1L, "removed"), (3L, "changed"), (4L, "changed"), (5L, "added")))
    // unchanged key 2 is absent; null -> 30.0 counts as a change
    val r3 = out.find(_.getLong(0) == 3L).get
    assert(r3.isNullAt(2) && r3.getDouble(3) === 30.0)
  }

  test("snapshot diff round-trips: apply(old, diff(old,new)) == new") {
    val orders = Tables(spark, sfDir, "orders")
    val oldSnap = orders.filter(pmod(col("o_orderkey"), lit(10)) =!= 3)
    val newSnap = orders.filter(pmod(col("o_orderkey"), lit(7)) =!= 2)
      .withColumn("o_totalprice",
        when(pmod(col("o_orderkey"), lit(5)) === 0,
          col("o_totalprice") + 1.0).otherwise(col("o_totalprice")))
    val cols = Seq("o_totalprice", "o_orderstatus")
    assert(SnapshotDiff.diff(oldSnap, oldSnap, "o_orderkey", cols)
      .count() === 0)
    val d = SnapshotDiff.diff(oldSnap, newSnap, "o_orderkey", cols)
    val rebuilt = SnapshotDiff.applyDiff(oldSnap, d, "o_orderkey", cols)
    val want = newSnap.select(("o_orderkey" +: cols).map(col): _*)
    assert(rebuilt.exceptAll(want).count() === 0 &&
      want.exceptAll(rebuilt).count() === 0)
  }

  test("stratified sample: exact per-stratum counts, partition-stable") {
    val docs = Tables(spark, sfDir, "documents")
    val a = Scale.stratifiedSample(docs, col("source"), col("doc_id"), 5)
    val b = Scale.stratifiedSample(docs.repartition(13), col("source"),
      col("doc_id"), 5)
    assert(a.exceptAll(b).count() === 0 && b.exceptAll(a).count() === 0)
    val counts = a.groupBy("stratum").count().collect()
    val sizes = docs.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    counts.foreach { r =>
      assert(r.getLong(1) === math.min(5L, sizes(r.getString(0))))
    }
  }

  test("token-budget sample: within budget and maximal in hash order") {
    val docs = Tables(spark, sfDir, "documents")
    val budget = 1500L
    val out = Scale.tokenBudgetSample(docs, col("source"), col("doc_id"),
      size(split(col("text"), " ")), budgets = Map.empty, budget)
    val perSource = out.groupBy("source")
      .agg(max(col("cum_tokens")).as("used"), count(lit(1)).as("taken"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    perSource.values.foreach { case (used, _) => assert(used <= budget) }
    // maximality: the first excluded doc per source would blow the budget
    val all = docs.select(col("source"), col("doc_id").as("id"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .withColumn("h", Scale.lcgKey(col("id")))
      .orderBy("source", "h", "id").collect()
      .groupBy(_.getString(0))
    all.foreach { case (src, rows) =>
      val (used, taken) = perSource.getOrElse(src, (0L, 0L))
      if (taken < rows.size)
        assert(used + rows(taken.toInt).getLong(2) > budget,
          s"$src stopped early: used=$used next=${rows(taken.toInt).getLong(2)}")
    }
  }

  test("z-order key interleaves bits; tiles span small squares") {
    val row = spark.range(1).select(
      Layout.zOrderKey(lit(5L), lit(3L), 3).as("z")).head()
    // x=101b -> bits 0,4; y=011b -> bits 1,3 => 11011b = 27
    assert(row.getLong(0) === 27L)
    val tiles = Layout.zOrderTiles(Tables(spark, sfDir, "events"),
      pmod(col("user_id"), lit(256)),
      (dayofmonth(col("ts")) - 1) * 8 + expr("hour(ts) div 3"),
      bits = 8, lowBits = 8).collect()
    assert(tiles.nonEmpty)
    tiles.foreach { t =>
      // a 256-key tile of an 8-bit interleave covers a 16x16 grid square
      assert(t.getLong(3) - t.getLong(2) <= 15,
        s"tile ${t.getLong(0)} x-span too wide")
      assert(t.getLong(5) - t.getLong(4) <= 15,
        s"tile ${t.getLong(0)} y-span too wide")
    }
  }

  test("z-order key is a bijection on the full 6-bit grid") {
    val grid = spark.range(64).select(col("id").as("x"))
      .crossJoin(spark.range(64).select(col("id").as("y")))
      .select(Layout.zOrderKey(col("x"), col("y"), 6).as("z"))
    assert(grid.distinct().count() === 64L * 64)
    val mm = grid.agg(min("z"), max("z")).head()
    assert(mm.getLong(0) === 0L && mm.getLong(1) === 4095L)
  }

  test("z-order write produces files with disjoint z-key ranges") {
    val dir = java.nio.file.Files.createTempDirectory("graft_zorder_")
      .toString
    val ev = Tables(spark, sfDir, "events")
    Layout.zOrderWrite(ev, pmod(col("user_id"), lit(256)),
      (dayofmonth(col("ts")) - 1) * 8 + expr("hour(ts) div 3"),
      bits = 8, nFiles = 4, path = dir)
    val back = spark.read.parquet(dir)
      .withColumn("z", Layout.zOrderKey(pmod(col("user_id"), lit(256)),
        (dayofmonth(col("ts")) - 1) * 8 + expr("hour(ts) div 3"), 8))
      .withColumn("f", input_file_name())
      .groupBy("f").agg(min("z").as("lo"), max("z").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(back.length === 4)
    back.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) =>
        assert(hi1 <= lo2, s"file z-ranges overlap: $back")
      case _ =>
    }
  }

  test("quantized ANN: full rerank depth equals exact brute force") {
    val emb = Tables(spark, sfDir, "embeddings")
    val queries = emb.filter(col("vec_id") < 3)
    val n = emb.count().toInt
    val exact = Similarity.bruteForceTopK(emb, queries,
      col("vec_id"), col("embedding"), k = 10)
      .select("q_id", "rank", "n_id", "cosine")
    val quant = Similarity.quantizedTopK(emb, queries,
      col("vec_id"), col("embedding"), k = 10, rerankDepth = n)
      .select("q_id", "rank", "n_id", "cosine")
    assert(quant.exceptAll(exact).count() === 0 &&
      exact.exceptAll(quant).count() === 0)
  }

  test("quantized ANN: recall@10 at shallow rerank depth") {
    val emb = Tables(spark, sfDir, "embeddings")
    val queries = emb.filter(col("vec_id") < 5)
    val exact = Similarity.bruteForceTopK(emb, queries,
        col("vec_id"), col("embedding"), k = 10)
      .select("q_id", "n_id")
    val quant = Similarity.quantizedTopK(emb, queries,
        col("vec_id"), col("embedding"), k = 10, rerankDepth = 30)
      .select("q_id", "n_id")
    val hit = exact.intersect(quant).count().toDouble
    val recall = hit / exact.count()
    assert(recall >= 0.8, s"int8 recall@10 = $recall")
  }

  test("semantic dedup: keeps earliest, drops true duplicates in-cell") {
    val emb = Tables(spark, sfDir, "embeddings")
    // plant exact-direction duplicates: copies of vectors 0..2 at 2x
    // magnitude with shifted ids (cosine to the original = 1.0)
    val dup = emb.filter(col("vec_id") < 3)
      .select((col("vec_id") + 10000).as("vec_id"),
        transform(col("embedding"), x => x * 2.0f).as("embedding"),
        col("label"))
    val out = Dedup.semanticDedup(emb.unionByName(dup),
      col("vec_id"), col("embedding"), eps = 0.35, nPlanes = 4)
    val planted = out.filter(col("id") >= 10000).collect()
    assert(planted.length === 3)
    planted.foreach { r =>
      assert(!r.getBoolean(2), s"planted duplicate ${r.getLong(0)} kept")
      assert(r.getLong(3) === r.getLong(0) - 10000 ||
        r.getLong(3) < r.getLong(0) - 10000,
        "dup_of must be an earlier id (the original or an even earlier dup)")
    }
    // every dropped row points at a strictly earlier id
    out.filter(!col("kept")).collect().foreach { r =>
      assert(r.getLong(3) < r.getLong(0))
    }
    // no cartesian in the pair join
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"in-cell pair join must be an equi-join on cell:\n$plan")
  }

  test("sequence packing: contiguous offsets, partition-stable") {
    val docs = Tables(spark, sfDir, "documents")
    val toks = size(split(col("text"), " "))
    val a = Scale.packSequences(docs, col("doc_id"), toks, seqLen = 256)
    val b = Scale.packSequences(docs.repartition(7), col("doc_id"), toks,
      seqLen = 256)
    assert(a.exceptAll(b).count() === 0 && b.exceptAll(a).count() === 0)
    val rows = a.orderBy("start_off").collect()
    // the token stream is gapless: each doc starts where the previous ended
    rows.foldLeft(0L) { (expected, r) =>
      assert(r.getLong(2) === expected,
        s"doc ${r.getLong(0)} starts at ${r.getLong(2)}, expected $expected")
      expected + r.getLong(1)
    }
    rows.foreach { r =>
      val (n, start, first, last, nSeqs) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(first === start / 256 && last === (start + n - 1) / 256 &&
        nSeqs === last - first + 1)
    }
  }

  test("bigram novelty: hand-computed toy corpus") {
    import graft.operators.CorpusStats
    val docs = Seq((1L, "a b a b"), (2L, "a b"), (3L, "x"))
      .toDF("doc_id", "text")
    // bigrams: d1 = [a b, b a, a b], d2 = [a b]; N = 4
    // freq: "a b" -> 3, "b a" -> 1
    // novelty d1 = (4-3) + (4-1) + (4-3) = 5; d2 = (4-3) = 1; d3 = 0
    val out = CorpusStats.bigramNovelty(docs, col("doc_id"), col("text"))
      .orderBy("doc_id").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ===
      Seq((1L, 3L, 5L), (2L, 1L, 1L), (3L, 0L, 0L)))
  }

  test("edit-distance pairs: toy values; corpus is ASCII (oracle parity)") {
    val toy = Seq((1L, "kitten sat"), (2L, "kitten sitting"), (3L, "dog ran"))
      .toDF("doc_id", "text")
    val out = Dedup.editDistancePairs(toy, col("doc_id"), col("text"),
      prefixLen = 80, maxDist = 20).collect()
    // only docs 1 and 2 share the block "kitten"; dist("kitten sat",
    // "kitten sitting") = 5 (sat -> sitting: s-a-t vs s-i-t-t-i-n-g)
    assert(out.length === 1)
    assert((out(0).getLong(0), out(0).getLong(1), out(0).getLong(2)) ===
      (1L, 2L, 5L))
    // the DuckDB oracle counts bytes; Spark counts chars — assert the
    // graded corpus is pure ASCII so the two coincide
    val nonAscii = Tables(spark, sfDir, "documents")
      .filter(length(col("text")) !== octet_length(col("text"))).count()
    assert(nonAscii === 0, "corpus must be ASCII for levenshtein parity")
  }

  test("edit-distance pairs: hot-block salted path is row-identical to " +
      "the plain join (both adaptive paths)") {
    // skewed blocks on purpose: one hot block of 12 docs, one pair-only
    // block, one singleton — mutations keep some pairs under maxDist
    // and push others over, so the threshold filter is exercised too
    val docs = ((1L to 12L).map(i =>
        (i, s"alpha doc number $i with shared prefix content")) ++
      Seq((20L, "beta first variant here"), (21L, "beta first variant"),
        (30L, "gamma loner"))).toDF("doc_id", "text")
    def run(floor: String, collapse: Option[Boolean]) = {
      spark.conf.set(graft.operators.Dedup.SaltPairsFloorKey, floor)
      try Dedup.editDistancePairs(docs, col("doc_id"), col("text"),
          prefixLen = 80, maxDist = 6, collapseDups = collapse)
        .as[(Long, Long, Long)].collect().toSet
      finally spark.conf.unset(graft.operators.Dedup.SaltPairsFloorKey)
    }
    val plain = run(Long.MaxValue.toString, Some(false)) // plain path
    val salted = run("0", Some(false)) // forced hot-block salting
    assert(plain === salted)
    // mixed regime (round 14, work-derived per-block salt counts):
    // floor 100 sits between the 2-doc beta block (4 pairs, stays
    // cold, coalesces to one salt) and the 12-doc alpha block (144
    // pairs, salts with S = ceil(144/100) = 2) — both per-block paths
    // in one run, still row-identical to the plain join
    assert(run("100", Some(false)) === plain)
    assert(plain.nonEmpty) // the comparison must not be vacuous
    // duplicate-collapse path (round 14), against both DP join shapes —
    // fresh ids with byte-identical texts, the replica shape
    val collapsedDocs = docs.union(
      docs.filter(col("doc_id") <= 6L)
        .select((col("doc_id") + 100L).as("doc_id"), col("text")))
    val cPlain = Dedup.editDistancePairs(collapsedDocs, col("doc_id"),
        col("text"), prefixLen = 80, maxDist = 6,
        collapseDups = Some(false))
      .as[(Long, Long, Long)].collect().toSet
    def cRun(floor: String) = {
      spark.conf.set(graft.operators.Dedup.SaltPairsFloorKey, floor)
      try Dedup.editDistancePairs(collapsedDocs, col("doc_id"),
          col("text"), prefixLen = 80, maxDist = 6,
          collapseDups = Some(true))
        .as[(Long, Long, Long)].collect().toSet
      finally spark.conf.unset(graft.operators.Dedup.SaltPairsFloorKey)
    }
    assert(cRun(Long.MaxValue.toString) === cPlain)
    assert(cRun("0") === cPlain)
    assert(cPlain.exists(_._3 == 0L), "dup ids at distance 0 expected")
    // every kept dist is a true plain-DP distance (3-arg levenshtein's
    // early-exit may only remove >maxDist rows, never distort kept ones)
    val brute = {
      val rows = docs.as[(Long, String)].collect()
      (for {
        a <- rows; b <- rows if a._1 < b._1
        if a._2.split(" ").head == b._2.split(" ").head
        d = {
          val (s, t) = (a._2.take(80), b._2.take(80))
          val dp = Array.tabulate(s.length + 1, t.length + 1) { (i, j) =>
            if (i == 0) j else if (j == 0) i else 0 }
          for (i <- 1 to s.length; j <- 1 to t.length)
            dp(i)(j) = math.min(math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
              dp(i - 1)(j - 1) + (if (s(i - 1) == t(j - 1)) 0 else 1))
          dp(s.length)(t.length).toLong
        }
        if d <= 6L
      } yield (a._1, b._1, d)).toSet
    }
    assert(plain === brute)
  }

  test("exact moments match Spark's float aggregates and are stable") {
    import graft.operators.Stats
    val li = Tables(spark, sfDir, "lineitem")
    val a = Stats.exactMoments(li, col("l_returnflag"), col("l_quantity"),
      col("l_extendedprice"), yScale = 100L)
    val b = Stats.exactMoments(li.repartition(17), col("l_returnflag"),
      col("l_quantity"), col("l_extendedprice"), yScale = 100L)
    // bit-identical under repartitioning — the property float aggs lack
    assert(a.exceptAll(b).count() === 0 && b.exceptAll(a).count() === 0)
    val exact = a.orderBy("grp").collect()
    val ref = li.groupBy(col("l_returnflag").as("grp"))
      .agg(var_pop(col("l_quantity")).as("v"),
        covar_pop(col("l_quantity"), col("l_extendedprice")).as("c"))
      .orderBy("grp").collect()
    exact.zip(ref).foreach { case (e, r) =>
      assert(math.abs(e.getDouble(8) - r.getDouble(1)) < 1e-4)
      assert(math.abs(e.getDouble(9) - r.getDouble(2)) /
        math.max(1.0, math.abs(r.getDouble(2))) < 1e-6)
    }
  }

  test("compaction rewrites small files into the computed target count") {
    val in = java.nio.file.Files.createTempDirectory("graft_frag_").toString
    val out = java.nio.file.Files.createTempDirectory("graft_comp_").toString
    val ev = Tables(spark, sfDir, "events")
    ev.repartition(32).write.mode("overwrite").parquet(in)
    val nIn = spark.read.parquet(in).inputFiles.length
    assert(nIn === 32, s"fixture should be fragmented, got $nIn files")
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(in), spark.sparkContext.hadoopConfiguration)
    val total = spark.read.parquet(in).inputFiles.map(f =>
      fs.getFileStatus(new org.apache.hadoop.fs.Path(f)).getLen).sum
    val target = total / 4
    val n = graft.operators.Layout.compact(spark, in, out, target)
    val back = spark.read.parquet(out)
    assert(back.inputFiles.length === n && n <= 5,
      s"expected ~4-5 compacted files, got $n")
    assert(back.count() === ev.count())
  }

  test("stream-static enrichment equals the batch join + aggregate") {
    val streamed = graft.streaming.StreamJoin
      .enrichedSegmentStats(spark, sfDir)
    val dim = spark.read.parquet(s"$sfDir/customer.parquet")
      .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
    val batch = Tables(spark, sfDir, "events")
      .join(dim, Seq("user_id"))
      .groupBy(col("c_mktsegment"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 100, 0).cast("long")).as("value_cents"))
    assert(streamed.exceptAll(batch).count() === 0 &&
      batch.exceptAll(streamed).count() === 0)
  }

  test("round-6 operators tolerate empty inputs") {
    import graft.operators.{CorpusStats, Stats}
    val emptyDocs = Seq.empty[(Long, String, String)]
      .toDF("doc_id", "text", "source")
    val emptyEmb = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    val emptyKeyed = Seq.empty[(Long, Double, String)]
      .toDF("k", "price", "status")
    assert(SnapshotDiff.diff(emptyKeyed, emptyKeyed, "k",
      Seq("price", "status")).count() === 0)
    assert(Scale.stratifiedSample(emptyDocs, col("source"), col("doc_id"),
      5).count() === 0)
    assert(Scale.tokenBudgetSample(emptyDocs, col("source"), col("doc_id"),
      size(split(col("text"), " ")), Map.empty, 100L).count() === 0)
    assert(Scale.packSequences(emptyDocs, col("doc_id"),
      size(split(col("text"), " ")), 256).count() === 0)
    assert(CorpusStats.bigramNovelty(emptyDocs, col("doc_id"),
      col("text")).count() === 0)
    assert(Dedup.editDistancePairs(emptyDocs, col("doc_id"), col("text"),
      80, 20).count() === 0)
    assert(Dedup.semanticDedup(emptyEmb, col("vec_id"), col("embedding"),
      0.35).count() === 0)
    assert(Stats.exactMoments(emptyKeyed, col("status"), col("k"),
      col("price"), 100L).count() === 0)
  }

  test("funnel: strict ordering between stages, first-touch anchors") {
    import graft.operators.Funnel
    val mk = (u: Long, t: String, sec: Long) =>
      (u, t, new java.sql.Timestamp(sec * 1000))
    val ev = Seq(
      // user 1: full funnel in order
      mk(1, "click", 10), mk(1, "view", 20), mk(1, "purchase", 30),
      // user 2: purchase BEFORE the first view -> stops at stage 2
      mk(2, "click", 10), mk(2, "purchase", 15), mk(2, "view", 20),
      // user 3: view precedes the first click -> stops at stage 1
      mk(3, "view", 5), mk(3, "click", 10),
      // user 4: never clicks -> stage 0
      mk(4, "view", 10), mk(4, "purchase", 20),
      // user 5: second click is followed by a view; anchor is the FIRST
      // click, and the view is after it, so stage 2
      mk(5, "click", 10), mk(5, "click", 40), mk(5, "view", 50))
      .toDF("user_id", "event_type", "ts")
    val out = Funnel.firstTouch(ev, col("user_id"), col("event_type"),
        col("ts"), Seq("click", "view", "purchase"))
      .orderBy("user_id").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(4))).toSeq ===
      Seq((1L, 3L), (2L, 2L), (3L, 1L), (4L, 0L), (5L, 2L)))
    // real data: anchors strictly increase and nulls are suffix-closed
    Funnel.firstTouch(Tables(spark, sfDir, "events"), col("user_id"),
        col("event_type"), col("ts"), Seq("click", "view", "purchase"))
      .collect().foreach { r =>
        val ts = Seq(1, 2, 3).map(i => if (r.isNullAt(i)) None
          else Some(r.getLong(i)))
        ts.sliding(2).foreach {
          case Seq(Some(a), Some(b)) => assert(a < b)
          case Seq(None, later) => assert(later.isEmpty)
          case _ =>
        }
        assert(r.getLong(4) === ts.count(_.isDefined))
      }
  }

  test("retention cohorts: toy timeline, week-0 completeness") {
    import graft.operators.Funnel
    val day = 86400L
    val mk = (u: Long, d: Long) =>
      (u, new java.sql.Timestamp(d * day * 1000))
    // users 1,2 start week 0 (days 0-6); user 3 starts week 2.
    // user 1 returns in week 1; user 2 returns in week 2.
    val ev = Seq(mk(1, 0), mk(1, 3), mk(1, 8), mk(2, 6), mk(2, 15),
      mk(3, 14)).toDF("user_id", "ts")
    val out = Funnel.retentionCohorts(ev, col("user_id"), col("ts"))
      .orderBy("cohort_week", "weeks_since").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out === Seq((0L, 0L, 2L), (0L, 1L, 1L), (0L, 2L, 1L),
      (2L, 0L, 1L)))
    // every cohort's weeks_since=0 cell counts the whole cohort
    val real = Funnel.retentionCohorts(Tables(spark, sfDir, "events"),
      col("user_id"), col("ts"))
    val w0 = real.filter(col("weeks_since") === 0)
      .agg(sum(col("n_users"))).head().getLong(0)
    val users = Tables(spark, sfDir, "events")
      .select(col("user_id")).distinct().count()
    assert(w0 === users)
  }

  test("streaming upsert sink maintains the latest row per key") {
    val out = java.nio.file.Files.createTempDirectory("graft_upsink_")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_upckpt_")
    graft.streaming.StreamJoin.upsertSink(spark, sfDir,
      out.toString, ckpt.toString)
    val got = graft.sources.Sinks.readSnapshot(spark, out.toString)
    val want = Tables(spark, sfDir, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("user_id"))
          .orderBy(col("us").desc)))
      .filter(col("__rn") === 1).drop("__rn")
    // one row per user, and it is that user's latest event by time
    // (event ids can tie only if two events share a user AND timestamp;
    // compare on (user, us) which is the upsert's contract)
    assert(got.count() === want.count())
    assert(got.select("user_id", "us")
      .exceptAll(want.select("user_id", "us")).count() === 0)
  }

  test("stream-stream interval join equals the batch interval join") {
    val streamed = graft.streaming.StreamJoin
      .clickPurchaseAttribution(spark, sfDir, windowMinutes = 30)
    val ev = Tables(spark, sfDir, "events")
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("us").as("c_us"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"),
        col("user_id").as("p_user_id"), col("us").as("p_us"))
    val batch = c.join(p, col("user_id") === col("p_user_id") &&
        col("p_us") >= col("c_us") &&
        col("p_us") <= col("c_us") + 1800000000L)
      .select(col("click_id"), col("purchase_id"), col("user_id"),
        (col("p_us") - col("c_us")).as("delta_us"))
    assert(streamed.exceptAll(batch).count() === 0 &&
      batch.exceptAll(streamed).count() === 0)
  }

  test("dsirScores ranks target-like pool documents above unlike ones " +
      "and its model join stays bounded (round 16, q248)") {
    import graft.operators.CorpusFilter
    // target rows speak vocabulary A; one pool doc mimics them, one is
    // disjoint — the mimic must outscore the stranger
    val docs = Seq(
      (1L, "alpha beta gamma alpha beta", true),
      (2L, "beta gamma alpha beta gamma", true),
      (3L, "alpha beta gamma beta alpha", true),
      (10L, "alpha beta gamma alpha", false), // target-like pool doc
      (11L, "zeta eta theta iota kappa", false), // disjoint pool doc
    ).toDF("doc_id", "text", "is_t")
    val out = CorpusFilter.dsirScores(docs, col("doc_id"), col("text"),
        col("is_t"), buckets = 64)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out.keySet === Set(10L, 11L), "pool rows only")
    assert(out(10L) > out(11L),
      s"target-like doc must outscore the disjoint one: $out")
    // plan shape: the model attach is a broadcast, never a hazard
    val fs = graft.plans.PlanLint.findings(
      CorpusFilter.dsirScores(docs, col("doc_id"), col("text"),
        col("is_t"), buckets = 64))
    assert(fs.isEmpty, fs.toString)
  }
}
