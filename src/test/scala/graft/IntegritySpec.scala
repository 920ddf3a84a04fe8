package graft

import org.apache.spark.sql.functions._

/** Round-8 closing-wave operators: sync fingerprints, skyline,
  * weighted SSSP, phrase search, cluster terms. Property tests follow
  * the ComponentsSpec pattern — seeded random inputs against a
  * driver-side reference implementation.
  */
class IntegritySpec extends SparkSpec {
  import spark.implicits._
  import graft.operators.{Integrity, Skyline}

  private def fp(rows: Seq[(Long, String)], n: Int = 8) =
    Integrity.bucketFingerprints(rows.toDF("id", "v"),
      Integrity.rowHash(Seq(col("id"), col("v"))), n)

  test("identical replicas fingerprint identically; one lost row is " +
      "caught; drill-down recovers exactly the lost rows") {
    val base = (1L to 200L).map(i => (i, s"payload_$i"))
    assert(Integrity.diffBuckets(fp(base), fp(base)).isEmpty)
    // drop two rows: the diff names only their buckets, and diffRows
    // inside those buckets returns exactly the dropped rows, side 'a'
    val lost = Set(57L, 133L)
    val replica = base.filterNot(r => lost(r._1))
    val bad = Integrity.diffBuckets(fp(base), fp(replica))
      .select(col("bucket")).as[Long].collect().toSeq
    assert(bad.nonEmpty && bad.size <= lost.size)
    val rows = Integrity.diffRows(base.toDF("id", "v"),
      replica.toDF("id", "v"),
      Integrity.rowHash(Seq(col("id"), col("v"))), 8, bad)
      .select(col("side"), col("id")).as[(String, Long)].collect()
    assert(rows.toSet === lost.map(("a", _)))
  }

  test("a single changed VALUE is always caught (no sum cancellation)") {
    val base = (1L to 100L).map(i => (i, s"v$i"))
    val mutated = base.map { case (i, v) => (i, if (i == 42L) "v42x" else v) }
    assert(!Integrity.diffBuckets(fp(base), fp(mutated)).isEmpty)
  }

  test("null vs empty-string vs literal fence char hash apart") {
    val a = Seq((1L, null: String)).toDF("id", "v")
    val b = Seq((1L, "")).toDF("id", "v")
    val h = (df: org.apache.spark.sql.DataFrame) =>
      df.select(Integrity.rowHash(Seq(col("id"), col("v"))).as("h"))
        .as[Long].head()
    assert(h(a) !== h(b))
  }

  test("drill-down reports BOTH sides: rows only in a as side a, " +
      "rows only in b as side b, in one pass") {
    val base = (1L to 120L).map(i => (i, s"p$i"))
    val a = base.filterNot(_._1 == 30L) // b-only: 30
    val b = base.filterNot(_._1 == 77L) :+ ((200L, "new")) // a-only: 77, 200
    val bad = Integrity.diffBuckets(fp(a), fp(b))
      .select(col("bucket")).as[Long].collect().toSeq
    val rows = Integrity.diffRows(a.toDF("id", "v"), b.toDF("id", "v"),
        Integrity.rowHash(Seq(col("id"), col("v"))), 8, bad)
      .select(col("side"), col("id")).as[(String, Long)].collect().toSet
    assert(rows === Set(("a", 77L), ("b", 30L), ("b", 200L)))
  }

  test("shard fingerprints union-merge to the whole-table fingerprint") {
    val rows = (1L to 300L).map(i => (i, s"r$i"))
    val (s1, s2) = rows.partition(_._1 % 3 == 0)
    val merged = fp(s1).unionByName(fp(s2))
      .groupBy(col("bucket"))
      .agg(sum(col("n_rows")).as("n_rows"), sum(col("sum_h")).as("sum_h"),
        sum(col("sum_h32")).as("sum_h32"))
    assert(Integrity.diffBuckets(merged, fp(rows)).isEmpty)
  }

  test("skyline matches brute-force dominance on seeded random points") {
    def ref(pts: Seq[(Long, Long)]): Set[(Long, Long)] = {
      val ds = pts.distinct
      ds.filterNot(a => ds.exists(b =>
        b._1 <= a._1 && b._2 <= a._2 && (b._1 < a._1 || b._2 < a._2)))
        .toSet
    }
    val rnd = new scala.util.Random(7)
    for (trial <- 0 until 5) {
      val n = 20 + trial * 40
      val span = 1 + rnd.nextInt(30)
      val pts = Seq.fill(n)(
        (rnd.nextInt(span).toLong, rnd.nextInt(span).toLong - 10L))
      val got = Skyline.frontierMin(pts.toDF("px", "py"),
        col("px"), col("py")).as[(Long, Long)].collect().toSet
      assert(got === ref(pts), s"trial $trial (n=$n, span=$span)")
    }
  }

  test("skyline: single point, duplicate points, and a pure chain") {
    assert(Skyline.frontierMin(Seq((5L, 5L), (5L, 5L)).toDF("x", "y"),
      col("x"), col("y")).as[(Long, Long)].collect().toSeq === Seq((5L, 5L)))
    // strictly descending chain: every point on the frontier
    val chain = Seq((1L, 9L), (2L, 7L), (3L, 4L), (4L, 1L))
    assert(Skyline.frontierMin(chain.toDF("x", "y"), col("x"), col("y"))
      .as[(Long, Long)].collect().toSet === chain.toSet)
    // equal y at larger x is dominated
    assert(Skyline.frontierMin(Seq((1L, 3L), (2L, 3L)).toDF("x", "y"),
      col("x"), col("y")).as[(Long, Long)].collect().toSeq === Seq((1L, 3L)))
  }

  test("ssspWeighted matches reference Bellman-Ford on seeded graphs") {
    def ref(edges: Seq[(Long, Long, Long)], seeds: Set[Long],
        iters: Int): Map[Long, Long] = {
      val e = edges.groupBy(t => (t._1, t._2))
        .map { case ((s, d), es) => (s, d, es.map(_._3).min) }.toSeq
      var dist: Map[Long, Long] = seeds.map(_ -> 0L).toMap
      for (_ <- 1 to iters) {
        val cand = e.flatMap { case (s, d, w) =>
          dist.get(s).map(ds => d -> (ds + w)) }
          .groupBy(_._1).map { case (d, cs) => d -> cs.map(_._2).min }
        dist = (dist.keySet ++ cand.keySet).map { v =>
          v -> math.min(dist.getOrElse(v, Long.MaxValue),
            cand.getOrElse(v, Long.MaxValue))
        }.toMap
      }
      dist
    }
    val rnd = new scala.util.Random(31)
    for (trial <- 0 until 4) {
      val n = 20 + trial * 12
      val m = n + rnd.nextInt(3 * n)
      val edges = Seq.fill(m)((rnd.nextInt(n).toLong,
        rnd.nextInt(n).toLong, rnd.nextInt(10).toLong))
      val seeds = Seq.fill(2)(rnd.nextInt(n + 5).toLong) // some off-graph
      val iters = 1 + rnd.nextInt(4)
      val got = graft.operators.Graph.ssspWeighted(
          edges.toDF("src", "dst", "w"), seeds.toDF("node"), iters)
        .as[(Long, Long)].collect().toMap
      assert(got === ref(edges, seeds.toSet, iters),
        s"trial $trial (n=$n, m=$m, iters=$iters)")
    }
  }

  test("ssspWeighted: zero-weight edges and the min over parallel edges") {
    val e = Seq((1L, 2L, 5L), (1L, 2L, 3L), (2L, 3L, 0L)).toDF("src", "dst", "w")
    val got = graft.operators.Graph.ssspWeighted(
        e, Seq(1L).toDF("node"), 3)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 0L, 2L -> 3L, 3L -> 3L))
  }

  test("phraseOccurrences: overlap, repeated terms, boundaries") {
    import graft.operators.Search
    val docs = Seq(
      (1L, "a a a b"), // "a a" overlaps at 0 and 1
      (2L, "b a a"),   // at end
      (3L, "a b a"),   // has both terms but not adjacent
      (4L, "a")        // missing term b... and too short
    ).toDF("doc_id", "text")
    val aa = Search.phraseOccurrences(docs, col("doc_id"), col("text"),
      Seq("a", "a")).as[(Long, Long)].collect().toSet
    assert(aa === Set((1L, 0L), (1L, 1L), (2L, 1L)))
    val ab = Search.phraseOccurrences(docs, col("doc_id"), col("text"),
      Seq("a", "b")).as[(Long, Long)].collect().toSet
    assert(ab === Set((1L, 2L), (3L, 0L)))
    // single-token phrase degenerates to plain postings
    val b = Search.phraseOccurrences(docs, col("doc_id"), col("text"),
      Seq("b")).as[(Long, Long)].collect().toSet
    assert(b === Set((1L, 3L), (2L, 0L), (3L, 1L)))
  }

  test("distinctiveTerms: shared terms score zero, exclusives win, " +
      "ties break lexically") {
    import graft.operators.CorpusStats
    val docs = Seq(
      ("c1", "common alpha alpha beta"),
      ("c2", "common gamma"),
      ("c2", "gamma delta")).toDF("src", "text")
    val got = CorpusStats.distinctiveTerms(docs, col("src"), col("text"), 2)
      .select(col("cluster"), col("rank"), col("term"), col("score"))
      .as[(String, Long, String, Long)].collect().toSet
    // C = 2; common has cdf 2 → score 0; alpha tf=2 → 2; gamma tf=2 → 2
    assert(got === Set(("c1", 1L, "alpha", 2L), ("c1", 2L, "beta", 1L),
      ("c2", 1L, "gamma", 2L), ("c2", 2L, "delta", 1L)))
  }

  test("plan lint: the closing-wave operators carry no scale hazards") {
    import graft.plans.PlanLint
    // skyline: the offset attach is a broadcast equi-join, the prefix
    // window is partition-local — nothing cartesian, nothing global
    val sky = Skyline.frontierMin(
      Tables(spark, sfDir, "lineitem"),
      -floor(col("l_quantity")), floor(col("l_extendedprice")))
    assert(PlanLint.clean(sky), PlanLint.findings(sky).toString)
    // phrase assembly: equi-joins on (id, pos) only
    val ph = graft.operators.Search.phraseOccurrences(
      Tables(spark, sfDir, "documents"), col("doc_id"), col("text"),
      Seq("slow", "hash"))
    assert(PlanLint.clean(ph), PlanLint.findings(ph).toString)
    // cluster terms: window is partitioned by cluster; the C attach is
    // the one-row broadcast cross join (reported as nested_loop, the
    // documented scalar-attach exemption)
    val ct = graft.operators.CorpusStats.distinctiveTerms(
      Tables(spark, sfDir, "documents"), col("source"), col("text"), 3)
    assert(PlanLint.findings(ct).forall(_._1 == "nested_loop_join"),
      PlanLint.findings(ct).toString)
    // fingerprints: one combining aggregate
    val f = graft.operators.Integrity.bucketFingerprints(
      Tables(spark, sfDir, "lineitem"),
      graft.operators.Integrity.rowHash(Seq(col("l_orderkey"))), 64)
    assert(PlanLint.clean(f), PlanLint.findings(f).toString)
  }
}
