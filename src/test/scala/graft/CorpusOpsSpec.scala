package graft

import graft.operators.{Dedup, Graph, Scd2, Vocabulary}
import org.apache.spark.sql.functions._

/** Round-7 operator semantics: OOV-rate vocabulary scoring, incremental
  * (delta) dedup verdicts, fixed-point PageRank invariants, and the
  * partitioned sink's pruning contract (also oracle-anchored by
  * q91/q92/q93/q94).
  */
class CorpusOpsSpec extends SparkSpec {
  import spark.implicits._

  test("oovRate: counts, ppm arithmetic, and empty-doc handling") {
    val docs = Seq(
      (1L, "a a a b"),     // all in vocab(2) = {a, b}
      (2L, "a b c d"),     // 2 of 4 OOV
      (3L, "x y z"),       // all OOV
      (4L, ""),            // no tokens
    ).toDF("doc_id", "text")
    val out = Vocabulary.oovRate(docs, col("doc_id"), col("text"), 2)
      .orderBy("doc_id").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3))).toSeq === Seq(
      (1L, 4L, 0L, 0L),
      (2L, 4L, 2L, 500000L),
      (3L, 3L, 3L, 1000000L),
      (4L, 0L, 0L, 0L)))
  }

  test("oovRate: vocabulary boundary is the (count desc, term asc) cut") {
    // b and c tie on count; with V=2 the vocab is {a, b} (term asc
    // breaks the tie), so c is OOV everywhere it appears
    val docs = Seq((1L, "a a c"), (2L, "a b b c")).toDF("doc_id", "text")
    val out = Vocabulary.oovRate(docs, col("doc_id"), col("text"), 2)
      .orderBy("doc_id").collect()
    assert(out.map(_.getLong(2)).toSeq === Seq(1L, 1L))
  }

  test("bpeMerges: learned merge table and pair-exhaustion early stop") {
    // words: aaab ×2, ab ×1.
    // step 1: (a,a) 2·2=4 beats (a,b) 3 → merge; 'aaa' run goes
    //   left-to-right: [aa, a, b]
    // step 2: (a,b) 2+1=3 beats (aa,a) 2 → merge → [aa, ab] / [ab]
    // step 3: (aa,ab) 2 → merge → [aaab]
    // step 4: no pairs remain anywhere → early stop at 3 rows
    val docs = Seq((1L, "aaab aaab ab")).toDF("doc_id", "text")
    val out = Vocabulary.bpeMerges(docs, col("text"), merges = 5)
      .orderBy("step").collect()
    assert(out.map(r => (r.getLong(0), r.getString(1), r.getString(2),
      r.getLong(3))).toSeq === Seq(
      (1L, "a", "a", 4L), (2L, "a", "b", 3L), (3L, "aa", "ab", 2L)))
  }

  test("bpeMerges: a run merges pairwise, not every-other") {
    // 'aaaa' must become [aa, aa] in one step (the double-fence
    // encoding makes consecutive matches character-disjoint); a
    // single-separator encoding would leave [aa, a, a]
    val docs = Seq((1L, "aaaa")).toDF("doc_id", "text")
    val out = Vocabulary.bpeMerges(docs, col("text"), merges = 5)
      .orderBy("step").collect()
    assert(out.map(r => (r.getLong(0), r.getString(1), r.getString(2),
      r.getLong(3))).toSeq === Seq(
      (1L, "a", "a", 3L), (2L, "aa", "aa", 1L)))
  }

  test("bpeMerges: frequency ties break on (lhs, rhs) ascending") {
    val docs = Seq((1L, "bc bc ba ba")).toDF("doc_id", "text")
    val first = Vocabulary.bpeMerges(docs, col("text"), merges = 1)
      .collect()(0)
    assert((first.getString(1), first.getString(2), first.getLong(3))
      === ("b", "a", 2L))
  }

  test("bpeEncodeTokens: explicit merge table replays in rank order") {
    val df = Seq("aaaa", "ab", "ba").toDF("word")
    def counts(table: Seq[(String, String)]): Seq[Long] =
      df.select(Vocabulary.bpeEncodeTokens(col("word"), table))
        .collect().map(_.getLong(0)).toSeq
    // one merge: 'aaaa' -> [aa, aa] (pairwise, not every-other)
    assert(counts(Seq(("a", "a"))) === Seq(2L, 2L, 2L))
    // rank order matters: (a,a) then (aa,aa) collapses the run fully
    assert(counts(Seq(("a", "a"), ("aa", "aa"))) === Seq(1L, 2L, 2L))
    // (a,b) merges 'ab' but never 'ba'
    assert(counts(Seq(("a", "b"))) === Seq(4L, 1L, 2L))
  }

  test("bpeTokenCounts: train -> apply per-doc word/token accounting") {
    // corpus words: aaab x2, ab x2, ba x1. Learned merges (2 steps):
    // (a,a) freq 4 (rhs tiebreak over (a,b)), then (a,b) freq 4.
    // Encodings: aaab -> [aa, ab] = 2, ab -> [ab] = 1, ba -> [b, a] = 2
    val docs = Seq((1L, "aaab aaab ab"), (2L, "ab ba"))
      .toDF("doc_id", "text")
    val out = Vocabulary.bpeTokenCounts(docs, col("doc_id"), col("text"),
        merges = 2)
      .orderBy("doc_id").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq === Seq((1L, 3L, 5L), (2L, 2L, 3L)))
  }

  test("containmentPairs: directional score, integer ppm, dfCap recall") {
    val docs = Seq(
      (1L, "p q r s t u"),          // 4 distinct 3-grams, all inside doc 2
      (2L, "x p q r s t u y"),      // 6 distinct 3-grams
      (3L, "z z z z z"),            // 1 gram, disjoint
    ).toDF("doc_id", "text")
    def run(minPpm: Long, cap: Option[Long] = None) =
      Dedup.containmentPairs(docs, col("doc_id"), col("text"), 3,
          minPpm, cap)
        .orderBy("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // asymmetric: 1⊂2 at 4/4; 2⊃1 only 4/6 = 666666 ppm
    assert(run(700000L) === Seq((1L, 2L, 1000000L)))
    assert(run(600000L) === Seq((1L, 2L, 1000000L), (2L, 1L, 666666L)))
    // dfCap drops shared grams (df=2 here): recall can only fall
    assert(run(600000L, cap = Some(1L)) === Seq())
  }

  test("scd2: runs, interval closes, ties, and null-attribute runs") {
    val events = Seq(
      // user 1: a a b a -> three intervals, last open
      (1L, 1000L, 1L, "a"), (2L, 2000L, 1L, "a"),
      (3L, 3000L, 1L, "b"), (4L, 4000L, 1L, "a"),
      // user 2: single event, current from the start
      (5L, 500L, 2L, "x"),
      // user 3: equal timestamps -> event_id breaks the tie
      (6L, 100L, 3L, "a"), (7L, 100L, 3L, "b"),
      // user 4: nulls form a run of their own
      (8L, 10L, 4L, null), (9L, 20L, 4L, null), (10L, 30L, 4L, "c"),
    ).toDF("event_id", "sec", "user_id", "event_type")
      .withColumn("ts", col("sec").cast("timestamp"))
    val out = Scd2.build(events, col("user_id"), col("event_type"),
        col("ts"), col("event_id"))
      .orderBy("k", "valid_from_us").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)),
        r.getLong(2) / 1000000L,
        if (r.isNullAt(3)) -1L else r.getLong(3) / 1000000L,
        r.getLong(4), r.getBoolean(5))).toSeq
    assert(out === Seq(
      (1L, Some("a"), 1000L, 3000L, 2L, false),
      (1L, Some("b"), 3000L, 4000L, 1L, false),
      (1L, Some("a"), 4000L, -1L, 1L, true),
      (2L, Some("x"), 500L, -1L, 1L, true),
      (3L, Some("a"), 100L, 100L, 1L, false),
      (3L, Some("b"), 100L, -1L, 1L, true),
      (4L, None, 10L, 30L, 2L, false),
      (4L, Some("c"), 30L, -1L, 1L, true)))
  }

  test("CdcApply: upsert, delete, resurrect, and the maintenance law") {
    import graft.operators.CdcApply
    val log = Seq(
      // user 1: upsert then later upsert -> latest wins
      (1L, 1000L, 1L, "U", "a"), (2L, 2000L, 1L, "U", "b"),
      // user 2: upsert then delete -> gone from the live state
      (3L, 1000L, 2L, "U", "x"), (4L, 3000L, 2L, "D", "x"),
      // user 3: delete then RE-insert in the later window -> resurrects
      (5L, 1000L, 3L, "D", "y"), (6L, 4000L, 3L, "U", "z"),
      // user 4: history-only, untouched by the delta -> persists
      (7L, 500L, 4L, "U", "keep"),
      // user 5: appears only in the delta -> inserted
      (8L, 5000L, 5L, "U", "born"),
      // user 6: equal ts -> event_id tie-break picks the delete
      (9L, 100L, 6L, "U", "t"), (10L, 100L, 6L, "D", "t"),
    ).toDF("event_id", "seq", "user_id", "op0", "attr")
    def compactW(w: org.apache.spark.sql.DataFrame) =
      CdcApply.compact(w, col("user_id"),
        Seq(col("seq"), col("event_id")), col("op0"),
        Seq("attr" -> col("attr"), "seq" -> col("seq")))
    val live = CdcApply.merge(
      compactW(log.filter(col("seq") < 2500L)),
      compactW(log.filter(col("seq") >= 2500L)))
    val got = live.orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(got === Seq((1L, "b", 2000L), (3L, "z", 4000L),
      (4L, "keep", 500L), (5L, "born", 5000L)))
    // the law: two-window maintenance == live state of one compact
    val oneShot = compactW(log).filter(col("op") =!= "D")
      .select(col("k"), col("attr"), col("seq"))
    assert(live.exceptAll(oneShot).count() === 0 &&
      oneShot.exceptAll(live).count() === 0)
    intercept[IllegalArgumentException] {
      CdcApply.merge(compactW(log), compactW(log).drop("seq"))
    }
  }

  test("incrementalDedup: history, in-batch, and new verdicts") {
    val history = Seq((10L, "k1"), (11L, "k1"), (12L, "k2"))
      .toDF("id", "key")
    val incoming = Seq(
      (20L, "k1"), // dup_of_history -> 10 (history min, not 11)
      (21L, "k3"), // new (first in batch)
      (22L, "k3"), // dup_in_batch -> 21
      (23L, "k4"), // new
    ).toDF("id", "key")
    val out = Dedup.incrementalDedup(history, incoming,
        col("id"), col("key"))
      .orderBy("doc_id").collect()
    assert(out.map(r => (r.getLong(0), r.getString(1))).toSeq === Seq(
      (20L, "dup_of_history"), (21L, "new"),
      (22L, "dup_in_batch"), (23L, "new")))
    assert(out(0).getLong(2) === 10L && out(2).getLong(2) === 21L)
    assert(out(1).isNullAt(2) && out(3).isNullAt(2))
  }

  test("incrementalDedup: null-keyed rows classify 'new', never drop") {
    // the documented contract is EVERY batch document gets a verdict;
    // a bare equi-join would silently lose null keys
    val history = Seq((10L, "k1")).toDF("id", "key")
    val incoming = Seq((20L, "k1"), (21L, null), (22L, null))
      .toDF("id", "key")
    val out = Dedup.incrementalDedup(history, incoming,
        col("id"), col("key"))
      .orderBy("doc_id").collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(20L, 21L, 22L))
    assert(out(0).getString(1) === "dup_of_history")
    // null != null: two null-keyed rows are NOT dups of each other
    assert(out(1).getString(1) === "new" && out(1).isNullAt(2))
    assert(out(2).getString(1) === "new" && out(2).isNullAt(2))
  }

  test("incrementalNearDedup: verified matches only, keeps the rest") {
    val mk = (i: Long, t: String) => (i, t)
    val history = Seq(
      mk(10L, "alpha beta gamma delta epsilon zeta"),
      mk(11L, "one two three four five six seven")).toDF("id", "text")
    val incoming = Seq(
      // near-identical to 10 (one trailing token differs)
      mk(20L, "alpha beta gamma delta epsilon eta"),
      // unrelated
      mk(21L, "red green blue yellow purple orange"),
      // too short to shingle -> kept
      mk(22L, "xy zz")).toDF("id", "text")
    val out = graft.operators.Dedup.incrementalNearDedup(history,
        incoming, col("id"), col("text"), n = 3, threshold = 0.4)
      .orderBy("doc_id").collect()
    assert(out(0).getLong(0) === 20L && !out(0).getBoolean(1) &&
      out(0).getLong(2) === 10L && out(0).getDouble(3) > 0.4)
    assert(out(1).getBoolean(1) && out(1).isNullAt(2))
    assert(out(2).getBoolean(1) && out(2).isNullAt(2))
  }

  test("incrementalDedup: a key in both history and batch always " +
      "resolves to the historical representative") {
    val history = Seq((5L, "k")).toDF("id", "key")
    val incoming = Seq((1L, "k"), (2L, "k")).toDF("id", "key")
    val out = Dedup.incrementalDedup(history, incoming,
        col("id"), col("key"))
      .orderBy("doc_id").collect()
    assert(out.forall(_.getString(1) == "dup_of_history"))
    assert(out.forall(_.getLong(2) == 5L))
  }

  test("pageRank: symmetric 2-cycle has equal ranks; mass ~ conserved") {
    val edges = Seq(("a", "b"), ("b", "a")).toDF("src", "dst")
    val out = Graph.pageRank(edges, iters = 3)
      .orderBy("node").collect()
    assert(out.length === 2)
    assert(out(0).getLong(1) === out(1).getLong(1))
    // integer truncation only ever LOSES mass, and at most a few units
    val total = out.map(_.getLong(1)).sum
    assert(total <= 1000000000000L && total > 999999999000L)
  }

  test("pageRank: a star center outranks its leaves") {
    val spokes = (1 to 4).map(i => ("hub", s"leaf$i"))
    val edges = (spokes ++ spokes.map(_.swap)).toDF("src", "dst")
    val ranks = Graph.pageRank(edges, iters = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert((1 to 4).forall(i => ranks("hub") > ranks(s"leaf$i")))
    // leaves are symmetric -> identical ranks
    assert((2 to 4).forall(i => ranks(s"leaf$i") === ranks("leaf1")))
  }

  test("label propagation: sync rounds match a reference implementation") {
    // two triangles bridged by one edge — communities should pull
    // toward each triangle's smallest label
    val und = Seq(("a1", "a2"), ("a2", "a3"), ("a1", "a3"),
      ("b1", "b2"), ("b2", "b3"), ("b1", "b3"), ("a3", "b1"))
    val sym = und ++ und.map(_.swap)
    val edges = sym.toDF("src", "dst")
    // reference: synchronous majority vote, ties -> smallest label
    val adj = sym.groupBy(_._1).map { case (n, es) => (n, es.map(_._2)) }
    var ref = adj.keys.map(n => n -> n).toMap
    for (_ <- 1 to 2) {
      val prev = ref
      ref = adj.map { case (n, nbrs) =>
        val counts = nbrs.groupBy(prev).map { case (l, xs) => (l, xs.size) }
        n -> counts.toSeq.minBy { case (l, c) => (-c, l) }._1
      }
    }
    val got = Graph.labelPropagation(edges, iters = 2)
      .as[(String, String)].collect().toMap
    assert(got === ref)
    // and one more round is stable on this graph: communities converged
    val got3 = Graph.labelPropagation(edges, iters = 3)
      .as[(String, String)].collect().toMap
    val prev3 = got
    val want3 = adj.map { case (n, nbrs) =>
      val counts = nbrs.groupBy(prev3).map { case (l, xs) => (l, xs.size) }
      n -> counts.toSeq.minBy { case (l, c) => (-c, l) }._1
    }
    assert(got3 === want3)
  }

  test("pageRank is partitioning-invariant (exact integer ranks)") {
    val o = Tables(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_custkey")).limit(200)
    val l = Tables(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"))
    val cs = o.join(l, col("o_orderkey") === col("l_orderkey"))
      .select(concat(lit("c"), col("o_custkey")).as("src"),
        concat(lit("s"), col("l_suppkey")).as("dst"))
    val edges = cs.union(cs.select(col("dst").as("src"), col("src").as("dst")))
    val a = Graph.pageRank(edges, 2)
    val b = Graph.pageRank(edges.repartition(17), 2)
    assert(a.exceptAll(b).count() === 0 && b.exceptAll(a).count() === 0)
  }

  test("sparseCosinePairs: dense and inverted strategies are identical") {
    val docs = Seq(
      (1L, "apple banana cherry"),
      (2L, "apple banana cherry"),   // identical to 1
      (3L, "dog elephant fox"),      // disjoint from 1/2
      (4L, "apple banana zebra"),    // partial overlap
    ).toDF("doc_id", "text")
    def run(dense: Boolean) = graft.operators.Search.sparseCosinePairs(
        docs, col("doc_id"), col("text"), threshold = 0.1,
        dense = Some(dense))
      .orderBy("id_a", "id_b").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
    val d = run(dense = true)
    val s = run(dense = false)
    assert(d.toSeq === s.toSeq) // bit-identical across strategies
    val pairs = d.toMap
    assert(pairs((1L, 2L)) === 1.0)
    assert(!pairs.contains((1L, 3L)) && !pairs.contains((2L, 3L)))
    assert(pairs((1L, 4L)) > 0.0 && pairs((1L, 4L)) < 1.0)
  }

  test("sparseCosinePairs: forcing the dense path past maxDenseVocab " +
      "fails fast instead of collecting an unbounded vocabulary") {
    val docs = (1L to 20L)
      .map(i => (i, s"w${i}a w${i}b w${i}c")).toDF("doc_id", "text")
    val e = intercept[IllegalStateException] {
      graft.operators.Search.sparseCosinePairs(docs, col("doc_id"),
        col("text"), 0.1, dense = Some(true), maxDenseVocab = 8L)
    }
    assert(e.getMessage.contains("maxDenseVocab"))
    // the adaptive gate routes the same corpus to the inverted path
    assert(graft.operators.Search.sparseCosinePairs(docs, col("doc_id"),
      col("text"), 0.1, maxDenseVocab = 8L).count() === 0L)
  }

  test("sparseCosinePairs: dfCap only drops pairs whose shared terms " +
      "are ubiquitous") {
    // 'the' has df=4 of N=5 (weight 1); capping at df<=2 removes the
    // (3,4) pair that shares nothing else, but keeps (1,2)
    val docs = Seq(
      (1L, "the rare1 rare2"), (2L, "the rare1 rare2"),
      (3L, "the only3"), (4L, "the only4"), (5L, "nothe"),
    ).toDF("doc_id", "text")
    val exact = graft.operators.Search.sparseCosinePairs(docs,
      col("doc_id"), col("text"), 0.01, dense = Some(false))
    val capped = graft.operators.Search.sparseCosinePairs(docs,
      col("doc_id"), col("text"), 0.01, dfCap = Some(2L),
      dense = Some(false))
    val ePairs = exact.select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val cPairs = capped.select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ePairs.contains((3L, 4L)) && !cPairs.contains((3L, 4L)))
    assert(cPairs.contains((1L, 2L)))
    // the surviving pair's score is identical (weights are never capped)
    val e12 = exact.filter(col("id_a") === 1 && col("id_b") === 2)
      .select("cosine").head.getDouble(0)
    val c12 = capped.filter(col("id_a") === 1 && col("id_b") === 2)
      .select("cosine").head.getDouble(0)
    assert(e12 === c12 && e12 === 1.0)
  }

  test("slidingChunks: overlap, short tail, and empty-doc conventions") {
    val docs = Seq(
      (1L, "t0 t1 t2 t3 t4 t5 t6"), // 7 tokens, chunk 4 stride 3
      (2L, ""),                     // one empty token -> one chunk
    ).toDF("doc_id", "text")
    val out = graft.operators.Chunker.slidingChunks(docs,
        col("doc_id"), col("text"), chunkTokens = 4, strideTokens = 3)
      .orderBy("doc_id", "chunk_id").collect()
    val d1 = out.filter(_.getLong(0) == 1L)
      .map(r => (r.getLong(1), r.getLong(2), r.getString(3)))
    assert(d1.toSeq === Seq(
      (0L, 4L, "t0 t1 t2 t3"),
      (1L, 4L, "t3 t4 t5 t6"), // starts at 3: one-token overlap
      (2L, 1L, "t6")))         // short tail
    val d2 = out.filter(_.getLong(0) == 2L)
    assert(d2.length === 1 && d2(0).getLong(2) === 1L &&
      d2(0).getString(3) === "")
  }

  test("profile: one-scan audit counts nulls, distincts, native min/max") {
    val df = Seq(
      (Some(10L), Some("b")), (Some(2L), Some("a")),
      (None: Option[Long], Some("a")), (Some(10L), None),
    ).toDF("k", "s")
    val out = graft.operators.Stats.profile(df,
        Seq("k" -> col("k"), "s" -> col("s")))
      .orderBy("col_name").collect()
    val k = out(0)
    assert(k.getString(0) === "k" && k.getLong(1) === 4L &&
      k.getLong(2) === 1L && k.getLong(3) === 2L)
    // min/max on the NATIVE type: 2 < 10 numerically ("10" < "2" stringly)
    assert(k.getString(4) === "2" && k.getString(5) === "10")
    val s = out(1)
    assert(s.getLong(2) === 1L && s.getLong(3) === 2L &&
      s.getString(4) === "a" && s.getString(5) === "b")
    // one scan: the multi-distinct aggregate plans a single Expand,
    // never one job per column
    val plan = graft.operators.Stats.profile(df,
      Seq("k" -> col("k"), "s" -> col("s")))
      .queryExecution.executedPlan.toString
    assert("Expand".r.findAllIn(plan).size === 1, s"plan:\n$plan")
  }

  test("trailing RANGE frame: variable width and equal-time peers") {
    // micros timeline for one user: events at 0s, 30m, 90m, 90m (peer)
    val us = Seq(0L, 1800000000L, 5400000000L, 5400000000L)
    val ev = us.zipWithIndex
      .map { case (u, i) => (1L, i.toLong, u, 100L) }
      .toDF("user_id", "event_id", "us", "cents")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("us"))
      .rangeBetween(-3600000000L, 0L)
    val out = ev.withColumn("n", count(lit(1)).over(w))
      .orderBy("event_id").collect().map(_.getLong(4))
    // 0s: itself; 30m: {0s, 30m}; 90m: {30m, 90m, 90m-peer} both rows
    assert(out.toSeq === Seq(1L, 2L, 3L, 3L))
  }

  test("SQL surface: registered custom functions match the Column API") {
    graft.plans.GraftExtensions.register(spark)
    val viaSql = spark.sql(
      "SELECT rolling_hash('the quick brown fox') AS h").head.getLong(0)
    val viaCol = Seq("the quick brown fox").toDF("t")
      .select(graft.plans.RollingHash.rolling_hash(col("t")).as("h"))
      .head.getLong(0)
    assert(viaSql === viaCol)
    // dot_product from SQL too (two-arg registration path)
    val dp = spark.sql(
      "SELECT dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
      .head.getDouble(0)
    assert(dp === 11.0)
  }

  test("projectDims: left-fold arithmetic on a known vector, narrow plan") {
    val emb = Seq((1L, Seq(1.0f, 2.0f))).toDF("vec_id", "embedding")
    val out = graft.operators.Similarity.projectDims(emb,
        col("vec_id"), col("embedding"), outDims = 2, dims = 2)
      .orderBy("dim").collect()
    def plane(p: Int, d: Int): Double =
      (((p * 73856093L + d * 19349663L + 83492791L) % 1001L) - 500L) / 500.0
    def expected(p: Int): Double = {
      val v = 1.0 * plane(p, 0) + 2.0 * plane(p, 1)
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(out(0).getDouble(2) === expected(0))
    assert(out(1).getDouble(2) === expected(1))
    // narrow: no exchange anywhere in the projection plan
    val plan = graft.operators.Similarity.projectDims(
      Tables(spark, sfDir, "embeddings"), col("vec_id"), col("embedding"),
      8, 64).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"projection must not shuffle:\n$plan")
  }

  test("groupedSplit: groups never straddle splits; assignment is stable") {
    val docs = Tables(spark, sfDir, "documents")
    val s1 = graft.operators.Splits.groupedSplit(docs, col("source"), 80, 10)
    // every group maps to exactly one split
    val perGroup = s1.groupBy("source")
      .agg(count_distinct(col("split")).as("k")).collect()
    assert(perGroup.forall(_.getLong(1) == 1L))
    // partitioning-invariant
    val s2 = graft.operators.Splits.groupedSplit(
      docs.repartition(13), col("source"), 80, 10)
    assert(s1.select("doc_id", "split")
      .exceptAll(s2.select("doc_id", "split")).count() === 0)
    // all three labels are legal and nothing else appears
    val labels = s1.select("split").distinct().collect()
      .map(_.getString(0)).toSet
    assert(labels.subsetOf(Set("train", "val", "test")))
  }

  test("zScores: exact-moment anomalies, zero-variance convention") {
    // group a: values 1,1,1,1,9 cents -> mean 2.6, popstd 3.2
    //   z(9) = (9*5-13)/sqrt(85*5-169) = 32/16 = 2.0
    val df = Seq(("a", 1L, 0.01), ("a", 2L, 0.01), ("a", 3L, 0.01),
      ("a", 4L, 0.01), ("a", 5L, 0.09),
      ("b", 6L, 0.05), ("b", 7L, 0.05)) // zero variance
      .toDF("g", "i", "v")
    val out = graft.operators.Stats.zScores(df, col("g"), col("i"),
        col("v"), scale = 100L, flagAt = 2.0)
      .orderBy("id").collect()
    assert(out(4).getDouble(3) === 2.0 && out(4).getBoolean(4))
    assert(out(0).getDouble(3) === -0.5 && !out(0).getBoolean(4))
    assert(out(5).getDouble(3) === 0.0 && !out(5).getBoolean(4))
    // partition-invariant: exact integer moments
    val b = graft.operators.Stats.zScores(df.repartition(7), col("g"),
      col("i"), col("v"), 100L, 2.0)
    assert(out.toSeq === b.orderBy("id").collect().toSeq)
  }

  test("slidingChunks: stride == chunk is a lossless partition of the corpus") {
    val docs = Tables(spark, sfDir, "documents").limit(50)
    val rebuilt = graft.operators.Chunker.slidingChunks(docs,
        col("doc_id"), col("text"), chunkTokens = 32, strideTokens = 32)
      .groupBy("doc_id")
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("chunk_id"), col("chunk")))),
        s => s.getField("chunk")), " ").as("t"))
    val orig = docs.select(col("doc_id"), col("text").as("t"))
    assert(rebuilt.exceptAll(orig).count() === 0 &&
      orig.exceptAll(rebuilt).count() === 0)
  }

  test("pageRank: per-iteration checkpoints keep the plan bounded") {
    val edges = Tables(spark, sfDir, "orders").limit(500)
      .select(concat(lit("c"), col("o_custkey")).as("src"),
        concat(lit("s"), col("o_orderkey") % 50).as("dst"))
    val sym = edges.union(edges.select(col("dst").as("src"), col("src").as("dst")))
    // without the per-iteration localCheckpoint, every extra iteration
    // DOUBLES the plan (each rank reference re-derives the prior
    // lineage); with it, plan size is flat in iteration count
    val p2 = graft.operators.Graph.pageRank(sym, 2)
      .queryExecution.executedPlan.toString.length
    val p4 = graft.operators.Graph.pageRank(sym, 4)
      .queryExecution.executedPlan.toString.length
    assert(p4 <= p2 * 2, s"plan grows with iterations: $p2 -> $p4")
  }

  test("partitioned sink: reader prunes to the filtered partition") {
    val path = s"/tmp/graft_prune_spec_${ProcessHandle.current().pid()}"
    val docs = Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("lang"), col("n_chars"))
    graft.sources.Sinks.writePartitionedParquet(docs, path, Seq("lang"))
    val rd = spark.read.parquet(path).filter(col("lang") === "en")
      .select(col("doc_id"), col("n_chars"))
    val plan = rd.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*= en\\)".r
      .findFirstIn(plan).isDefined,
      s"expected a pushed partition filter:\n$plan")
    // row parity with a plain filter over the source table
    val want = docs.filter(col("lang") === "en")
      .select(col("doc_id"), col("n_chars"))
    assert(rd.exceptAll(want).count() === 0 &&
      want.exceptAll(rd).count() === 0)
    // pruning is physical: only the lang=en directory's files are read
    val files = rd.queryExecution.executedPlan.collectLeaves()
      .flatMap {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.selectedPartitions.toPartitionArray
            .map(_.filePath.toString).toSeq
        case _ => Nil
      }
    assert(files.nonEmpty && files.forall(_.contains("lang=en")),
      s"scan touched non-pruned files: ${files.take(3).mkString(",")}")
  }

  test("bfsHops: minimum hop wins when a node is reachable two ways") {
    // a-b-c-d path plus a shortcut a-c: c must label 1, not 2
    val und = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("a", "c"))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val got = Graph.bfsHops(edges, Seq("a").toDF("node"), maxHops = 3)
      .as[(String, Long)].collect().toMap
    assert(got === Map("a" -> 0L, "b" -> 1L, "c" -> 1L, "d" -> 2L))
  }

  test("bfsHops: maxHops bounds the sweep; unreachable nodes are absent") {
    val und = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("x", "y"))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val got = Graph.bfsHops(edges, Seq("a").toDF("node"), maxHops = 2)
      .as[(String, Long)].collect().toMap
    assert(got === Map("a" -> 0L, "b" -> 1L, "c" -> 2L))
    assert(!got.contains("x") && !got.contains("y"))
  }

  test("bfsHops: seeds outside the graph are dropped; multi-source " +
      "takes the closer source; partition-invariant") {
    val und = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val seeds = Seq("a", "e", "ghost").toDF("node")
    val got = Graph.bfsHops(edges, seeds, maxHops = 4)
      .as[(String, Long)].collect().toMap
    // c is 2 from both ends; b is 1 from a; d is 1 from e
    assert(got === Map("a" -> 0L, "e" -> 0L, "b" -> 1L, "d" -> 1L,
      "c" -> 2L))
    val rep = Graph.bfsHops(edges.repartition(7), seeds, maxHops = 4)
      .as[(String, Long)].collect().toMap
    assert(rep === got)
  }

  test("pmiCollocations: lift is the exact count ratio; minCount prunes") {
    val docs = Seq("a b", "a b", "c d").toDF("text")
    // unigrams a:2 b:2 c:1 d:1, U=6; bigrams (a,b):2 (c,d):1, B=3
    // lift(a,b) = 2*6*6/(2*2*3) = 6.0; lift(c,d) = 36/3 = 12.0
    val all = graft.operators.CorpusStats
      .pmiCollocations(docs, col("text"), minCount = 1L, topK = 10)
      .select("lhs", "rhs", "c_xy", "lift")
      .as[(String, String, Long, Double)].collect().toSeq
    assert(all === Seq(("c", "d", 1L, 12.0), ("a", "b", 2L, 6.0)))
    val pruned = graft.operators.CorpusStats
      .pmiCollocations(docs, col("text"), minCount = 2L, topK = 10)
      .select("lhs", "rhs").as[(String, String)].collect().toSeq
    assert(pruned === Seq(("a", "b")))
  }

  test("madOutliers: hand-computed median/MAD, exact long outputs") {
    // odd group: median 3, MAD 1, one point beyond 3*MAD
    // even group: median 2.5, MAD (0.5+1.5)/2 = 1.0, outlier 1000
    val df = Seq(("odd", 1L), ("odd", 2L), ("odd", 3L), ("odd", 4L),
      ("odd", 100L),
      ("even", 1L), ("even", 2L), ("even", 3L), ("even", 1000L))
      .toDF("g", "x")
    val got = graft.operators.Stats
      .madOutliers(df, col("g"), col("x"), k = 3)
      .orderBy("grp")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq(("even", 4L, 5L, 4L, 1L), ("odd", 5L, 6L, 4L, 1L)))
    // exact percentiles -> partition-invariant
    val rep = graft.operators.Stats
      .madOutliers(df.repartition(7), col("g"), col("x"), k = 3)
      .orderBy("grp")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(rep === got)
  }

  test("decayedCounts: integer recurrence weights, age clamp, null ts") {
    import graft.operators.Decay
    assert(Decay.weightsMicro(9L, 10L, 3) ===
      Seq(1000000L, 900000L, 810000L, 729000L))
    val df = Seq(
      ("a", "2024-01-10"), ("a", "2024-01-09"), ("a", "2024-01-08"),
      ("b", "2024-01-10"), ("b", null))
      .toDF("k", "d").withColumn("ts", to_timestamp(col("d")))
    val got = Decay.decayedCounts(df, col("k"), col("ts"), 9L, 10L, 30)
      .orderBy("k").as[(String, Long, Long)].collect().toSeq
    // a: ages 0,1,2 -> 1000000+900000+810000; b: null ts row excluded
    assert(got === Seq(("a", 3L, 2710000L), ("b", 1L, 1000000L)))
    // ages beyond maxAge clamp to the floor weight
    val clamped = Decay.decayedCounts(df, col("k"), col("ts"), 9L, 10L, 1)
      .orderBy("k").as[(String, Long, Long)].collect().toSeq
    assert(clamped.head === ("a", 3L, 1000000L + 900000L + 900000L))
    val rep = Decay
      .decayedCounts(df.repartition(7), col("k"), col("ts"), 9L, 10L, 30)
      .orderBy("k").as[(String, Long, Long)].collect().toSeq
    assert(rep === got)
  }

  test("markov transitions: smoothing, marginals, and V with a " +
      "sink-only state") {
    // user 1: A,B,A,C (ts order, tie broken by id); user 2: A,B
    val df = Seq(
      (1L, 10L, 1L, "A"), (1L, 10L, 2L, "B"), (1L, 20L, 3L, "A"),
      (1L, 30L, 4L, "C"),
      (2L, 10L, 5L, "A"), (2L, 20L, 6L, "B"))
      .toDF("u", "t", "id", "s")
    val got = graft.operators.Markov
      .transitions(df, col("u"), Seq(col("t"), col("id")), col("s"))
      .orderBy("prev", "next")
      .as[(String, String, Long, Long)].collect().toSeq
    // c_A=3, c_B=1; V=3 (C has no outgoing transitions but counts)
    assert(got === Seq(
      ("A", "B", 2L, 500000L),   // (2+1)e6 div (3+3)
      ("A", "C", 1L, 333333L),   // (1+1)e6 div 6
      ("B", "A", 1L, 500000L)))  // (1+1)e6 div (1+3)
    val rep = graft.operators.Markov
      .transitions(df.repartition(5), col("u"),
        Seq(col("t"), col("id")), col("s"))
      .orderBy("prev", "next")
      .as[(String, String, Long, Long)].collect().toSeq
    assert(rep === got)
  }

  test("chiSquareCells: absent cell included; terms sum to the " +
      "textbook statistic") {
    // contingency [[3,1],[0,2]]: expected [[2,2],[1,1]], chi2 = 3.0
    val df = Seq(("x", "p"), ("x", "p"), ("x", "p"), ("x", "q"),
      ("y", "q"), ("y", "q")).toDF("a", "b")
    val got = graft.operators.Stats.chiSquareCells(df, col("a"), col("b"))
      .orderBy("a", "b")
      .as[(String, String, Long, Long, Long)].collect().toSeq
    assert(got === Seq(
      ("x", "p", 3L, 2000000L, 500000L),
      ("x", "q", 1L, 2000000L, 500000L),
      ("y", "p", 0L, 1000000L, 1000000L),  // the absent cell
      ("y", "q", 2L, 1000000L, 1000000L)))
    assert(got.map(_._5).sum === 3000000L)
  }

  test("snapshotAt: before-first, mid-run, boundary, and current reads") {
    // user 1: A at t=100, B at t=300 (current); user 2: C at t=500
    val ev = Seq((1L, 100L, 1L, "A"), (1L, 300L, 2L, "B"),
      (2L, 500L, 3L, "C")).toDF("u", "us", "id", "s")
      .withColumn("ts", timestamp_micros(col("us")))
    val iv = Scd2.build(ev, col("u"), col("s"), col("ts"), col("id"))
    def at(t: Long): Map[Long, String] =
      Scd2.snapshotAt(iv, t).select("k", "attr")
        .as[(Long, String)].collect().toMap
    assert(at(50L) === Map.empty)                 // before any key exists
    assert(at(200L) === Map(1L -> "A"))           // mid first run
    assert(at(300L) === Map(1L -> "B"))           // boundary: from-inclusive
    assert(at(900L) === Map(1L -> "B", 2L -> "C")) // current rows unbounded
  }

  test("debounce: predecessor rule, pair scoping, boundary gap") {
    // user 1 / type X: t=0, 3s, 7s -> 3s bounced (gap 3s), 7s ALSO
    // bounced (gap to predecessor 4s, though 7s from last kept — the
    // documented predecessor semantics); type Y untouched.
    val ev = Seq(
      (1L, 0L, 1L, "X"), (1L, 3000000L, 2L, "X"), (1L, 7000000L, 3L, "X"),
      (1L, 1000000L, 4L, "Y"),
      (2L, 5000000L, 5L, "X"), (2L, 10000000L, 6L, "X"))
      .toDF("u", "us", "id", "s")
      .withColumn("ts", timestamp_micros(col("us")))
    val got = Dedup.debounce(ev, col("u"), col("s"), col("ts"),
        Seq(col("us"), col("id")), withinUs = 5000000L)
      .select("id", "kept").as[(Long, Boolean)].collect().toMap
    assert(got === Map(1L -> true, 2L -> false, 3L -> false,
      4L -> true, 5L -> true, 6L -> false)) // 6: gap == 5s, not > 5s
    // schema: input columns survive, plus the flag
    val cols = Dedup.debounce(ev, col("u"), col("s"), col("ts"),
      Seq(col("us"), col("id")), 5000000L).columns.toSeq
    assert(cols === ev.columns.toSeq :+ "kept")
  }

  test("per-group heavy hitters: groups are independent, exact within " +
      "capacity") {
    val df = Seq.fill(5)(("g1", "a")) ++ Seq.fill(3)(("g1", "b")) ++
      Seq.fill(1)(("g1", "c")) ++
      Seq.fill(4)(("g2", "c")) ++ Seq.fill(4)(("g2", "d"))
    val got = df.toDF("g", "t")
      .groupBy(col("g"))
      .agg(graft.plans.HeavyHitters.topItems(col("t"), 16, 2).as("top"))
      .select(col("g"), posexplode(col("top")))
      .select(col("g"), col("pos"), col("col").getField("_1"),
        col("col").getField("_2"), col("col").getField("_3"))
      .as[(String, Int, String, Long, Long)].collect().toSeq.sorted
    assert(got === Seq(
      ("g1", 0, "a", 5L, 0L), ("g1", 1, "b", 3L, 0L),
      ("g2", 0, "c", 4L, 0L), ("g2", 1, "d", 4L, 0L))) // tie -> lexic.
  }

  test("rangePrefixSums: inclusive prefixes, partition-invariant") {
    val df = (1L to 100L).map(i => (i, 1L, i % 3)).toDF("k", "one", "w")
    val got = graft.operators.Stats
      .rangePrefixSums(df, col("k"), Seq("one", "w"))
      .orderBy("k").select("k", "cum_one", "cum_w")
      .as[(Long, Long, Long)].collect().toSeq
    val expect = (1L to 100L).map(i =>
      (i, i, (1L to i).map(_ % 3).sum))
    assert(got === expect)
    val rep = graft.operators.Stats
      .rangePrefixSums(df.repartition(13), col("k"), Seq("one", "w"))
      .orderBy("k").select("k", "cum_one", "cum_w")
      .as[(Long, Long, Long)].collect().toSeq
    assert(rep === expect)
  }

  test("ksDistance: hand-computed supremum, zero on identical inputs") {
    // a = {1,2,3}, b = {3,4}: CDF gap peaks at v=2 with 2/3 - 0
    val a = Seq(1L, 2L, 3L).toDF("x")
    val b = Seq(3L, 4L).toDF("x")
    val got = graft.operators.Stats.ksDistance(a, b, col("x"))
      .as[(Long, Long, Long, Long)].collect().head
    assert(got === ((3L, 2L, 2L, 666666L)))
    // order of sides only moves the labels, not the distance
    val swapped = graft.operators.Stats.ksDistance(b, a, col("x"))
      .as[(Long, Long, Long, Long)].collect().head
    assert(swapped === ((2L, 3L, 2L, 666666L)))
    val same = graft.operators.Stats.ksDistance(a, a, col("x"))
      .as[(Long, Long, Long, Long)].collect().head
    assert(same._4 === 0L)
  }

  test("personalizedPageRank: all-seeds degenerates to pageRank; " +
      "rank decays with distance from the seed") {
    val rnd = new scala.util.Random(7)
    val und = Seq.fill(40)(
      (rnd.nextInt(12).toLong.toString, rnd.nextInt(12).toLong.toString))
      .filter(e => e._1 != e._2)
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val nodes = und.flatMap(e => Seq(e._1, e._2)).distinct.toDF("node")
    val ppr = Graph.personalizedPageRank(edges, nodes, iters = 3)
      .as[(String, Long)].collect().toMap
    val pr = Graph.pageRank(edges, iters = 3)
      .as[(String, Long)].collect().toMap
    assert(ppr === pr)
    // path a-b-c-d seeded at a: the seed dominates, and within a
    // distance PARITY rank decays (synchronous mass oscillates
    // between parities on a path, so b-vs-c is NOT ordered — only
    // same-parity distances compare: b(1) > d(3))
    val path = Seq(("a", "b"), ("b", "c"), ("c", "d"))
    val pe = (path ++ path.map(_.swap)).toDF("src", "dst")
    val got = Graph.personalizedPageRank(pe, Seq("a").toDF("node"), 4)
      .as[(String, Long)].collect().toMap
    assert(got("a") === got.values.max)
    assert(got("b") > got("d"))
    // integer truncation only loses mass
    assert(got.values.sum <= 1000000000000L)
    // a seed set disjoint from the graph is a caller error
    intercept[IllegalArgumentException] {
      Graph.personalizedPageRank(pe, Seq("zz").toDF("node"), 2)
    }
  }

  test("lagAutocorrelation: perfect trend, perfect alternation, " +
      "constant series") {
    val df = Seq(
      ("up", 1L, 1L), ("up", 2L, 2L), ("up", 3L, 3L),
      ("alt", 1L, 1L), ("alt", 2L, 2L), ("alt", 3L, 1L), ("alt", 4L, 2L),
      ("flat", 1L, 5L), ("flat", 2L, 5L), ("flat", 3L, 5L),
      ("single", 1L, 9L))
      .toDF("g", "d", "c")
    val got = graft.operators.Stats
      .lagAutocorrelation(df, col("g"), col("d"), col("c"))
      .orderBy("grp").collect()
      .map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSeq
    assert(got === Seq(
      ("alt", 3L, Some(-1.0)),
      ("flat", 2L, None),     // zero variance -> undefined
      ("up", 2L, Some(1.0)))) // "single" has no pairs -> absent
  }

  test("lexicalRichness: types, hapax, and micro ratios by hand") {
    // g1: "a a b" + "b c" -> tokens 5, types {a,b,c}=3, hapax {c}=1
    // g2: "x y z" -> tokens 3, types 3, hapax 3
    val docs = Seq(("g1", "a a b"), ("g1", "b c"), ("g2", "x y z"))
      .toDF("src", "text")
    val got = graft.operators.CorpusStats
      .lexicalRichness(docs, col("src"), col("text"))
      .orderBy("grp")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq(
      ("g1", 5L, 3L, 1L, 600000L, 333333L),
      ("g2", 3L, 3L, 3L, 1000000L, 1000000L)))
  }

  test("giniImpurity: pure, balanced, and mixed groups") {
    val df = Seq(("g1", "a"), ("g1", "a"), ("g1", "a"),
      ("g2", "a"), ("g2", "b"),
      ("g3", "a"), ("g3", "a"), ("g3", "b"), ("g3", "c"))
      .toDF("g", "l")
    val got = graft.operators.Stats.giniImpurity(df, col("g"), col("l"))
      .orderBy("grp")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got === Seq(
      ("g1", 3L, 1L, 0L),
      ("g2", 2L, 2L, 500000L),
      ("g3", 4L, 3L, 625000L)))  // (16-6)e6 div 16
  }
}
