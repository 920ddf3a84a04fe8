package graft

import org.apache.spark.sql.functions._

class AnalyticsSpec extends SparkSpec {
  import spark.implicits._
  import graft.operators.{Graph, Stats}

  test("rankBuckets: floor-div assignment, deterministic under ties, " +
      "monotone in the key") {
    def ref(n: Int, k: Int): Seq[Long] =
      (0 until n).map(i => (i.toLong * k) / n + 1)
    for ((n, k) <- Seq((7, 5), (20, 4), (5, 5), (3, 5))) {
      val rows = (1 to n).map(i => (i.toLong, (i % 4).toLong))
      val got = Stats.rankBuckets(rows.toDF("id", "v"),
          struct(col("v"), col("id")), k, "b")
        .select(col("id"), col("b")).as[(Long, Long)].collect()
        .sortBy(_._1)
      // buckets follow the (v, id) order exactly
      val order = rows.sortBy(r => (r._2, r._1)).map(_._1)
      val expect = order.zip(ref(n, k)).toMap
      assert(got.toMap === expect, s"n=$n k=$k")
      // monotone: a later-ordered row never gets a smaller bucket
      val byOrder = order.map(got.toMap)
      assert(byOrder === byOrder.sorted)
    }
  }

  test("paretoClasses: cumulative-share classes with exact boundaries") {
    // weights 50, 30, 15, 5 (desc): cum shares 50%, 80%, 95%, 100%
    // cuts 70/90 → classes 1, 2, 3, 3
    val rows = Seq((1L, 50L), (2L, 30L), (3L, 15L), (4L, 5L))
    val got = Stats.paretoClasses(rows.toDF("id", "w"), col("id"),
        col("w"), Seq(700000L, 900000L))
      .select(col("id"), col("cum_w"), col("abc_class"))
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq === Seq((1L, 50L, 1L), (2L, 80L, 2L),
      (3L, 95L, 3L), (4L, 100L, 3L)))
    // exact boundary is inclusive: 70% exactly → class 1
    val b = Stats.paretoClasses(
        Seq((1L, 7L), (2L, 3L)).toDF("id", "w"), col("id"), col("w"),
        Seq(700000L, 900000L))
      .select(col("id"), col("abc_class")).as[(Long, Long)]
      .collect().toMap
    assert(b === Map(1L -> 1L, 2L -> 3L))
  }

  test("degreeAssortativity: a star is maximally disassortative; a " +
      "clique has zero degree variance (null r)") {
    val star = (2L to 6L).map(i => (1L, i)).toDF("src", "dst")
    val r = Graph.degreeAssortativity(star)
      .select(col("n_endpoints"), col("r"))
      .as[(Long, Option[Double])].head()
    assert(r._1 === 10L && r._2.get === -1.0)
    val clique = (for (a <- 1L to 4L; b <- 1L to 4L if a < b)
      yield (a, b)).toDF("src", "dst")
    val rc = Graph.degreeAssortativity(clique)
      .select(col("r")).as[Option[Double]].head()
    assert(rc.isEmpty) // zero variance → undefined, surfaced as null
  }

  test("degreeAssortativity matches a reference Pearson on random " +
      "graphs") {
    def ref(edges: Seq[(Long, Long)]): Option[Double] = {
      val und = edges.flatMap(t => Seq(t, t.swap))
        .filter(t => t._1 != t._2).distinct
      val deg = und.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      val ps = und.map { case (a, b) => (deg(a), deg(b)) }
      val n = ps.size.toLong
      val sa = ps.map(_._1).sum; val sb = ps.map(_._2).sum
      val sab = ps.map(p => p._1 * p._2).sum
      val saa = ps.map(p => p._1 * p._1).sum
      val sbb = ps.map(p => p._2 * p._2).sum
      val va = n * saa - sa * sa; val vb = n * sbb - sb * sb
      if (va > 0 && vb > 0)
        Some(BigDecimal((n * sab - sa * sb).toDouble /
            (math.sqrt(va.toDouble) * math.sqrt(vb.toDouble)))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      else None
    }
    val rnd = new scala.util.Random(149)
    for (trial <- 0 until 3) {
      val n = 12 + trial * 8
      val edges = Seq.fill(n * 2)(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      val got = Graph.degreeAssortativity(edges.toDF("src", "dst"))
        .select(col("r")).as[Option[Double]].head()
      assert(got === ref(edges), s"trial $trial")
    }
  }

  test("covarianceMatrix matches a reference computation; diagonal " +
      "numerators are non-negative") {
    import graft.operators.Similarity
    val rnd = new scala.util.Random(151)
    val dims = 5
    val vecs = (1L to 30L).map(id =>
      (id, Array.fill(dims)(rnd.nextFloat() - 0.5f)))
    def ref: Map[(Long, Long), Long] = {
      val q = vecs.map { case (_, v) =>
        v.map(x => math.floor(x.toDouble * 1000).toLong) }
      val n = q.size.toLong
      (for (i <- 0 until dims; j <- i until dims) yield {
        val sxy = q.map(v => v(i) * v(j)).sum
        val si = q.map(_(i)).sum
        val sj = q.map(_(j)).sum
        ((i.toLong, j.toLong), n * sxy - si * sj)
      }).toMap
    }
    val got = Similarity.covarianceMatrix(
        vecs.toDF("vec_id", "embedding"), col("vec_id"),
        col("embedding"), 1000L)
      .select(col("i"), col("j"), col("cov_num"))
      .as[(Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got === ref)
    assert((0 until dims).forall(i =>
      got((i.toLong, i.toLong)) >= 0L)) // n·Σx² ≥ (Σx)² always
  }

  test("radiusPairs: lossless blocking vs brute force, negative " +
      "coords, inclusive boundary, no duplicate pairs") {
    import graft.operators.Spatial
    def ref(pts: Seq[(Long, Long, Long)], r: Long) =
      (for {
        a <- pts; b <- pts
        if a._1 < b._1
        d2 = (a._2 - b._2) * (a._2 - b._2) + (a._3 - b._3) * (a._3 - b._3)
        if d2 <= r * r
      } yield (a._1, b._1, d2)).toSet
    val rnd = new scala.util.Random(157)
    for (trial <- 0 until 3) {
      val r = 5L + trial * 7
      val pts = (1L to 80L).map(i =>
        (i, rnd.nextInt(120).toLong - 60L, rnd.nextInt(120).toLong - 60L))
      val got = Spatial.radiusPairs(pts.toDF("id", "x", "y"),
          col("id"), col("x"), col("y"), r)
        .as[(Long, Long, Long)].collect()
      assert(got.length === got.toSet.size, "duplicate pairs")
      assert(got.toSet === ref(pts, r), s"trial $trial (r=$r)")
    }
    // boundary: distance exactly r is IN; r+ε out; cell-diagonal case
    val b = Spatial.radiusPairs(
        Seq((1L, 0L, 0L), (2L, 3L, 4L), (3L, 0L, 6L), (4L, -5L, -5L))
          .toDF("id", "x", "y"),
        col("id"), col("x"), col("y"), 5L)
      .as[(Long, Long, Long)].collect().toSet
    assert(b === Set((1L, 2L, 25L), (2L, 3L, 13L)))
  }

  test("dbscan matches a reference implementation (min-rule borders) " +
      "on seeded random points") {
    import graft.operators.Spatial
    def ref(pts: Seq[(Long, Long, Long)], r: Long, minPts: Long)
        : Map[Long, (String, Option[Long])] = {
      def d2(a: (Long, Long, Long), b: (Long, Long, Long)) =
        (a._2 - b._2) * (a._2 - b._2) + (a._3 - b._3) * (a._3 - b._3)
      val nbr = pts.map(p =>
        p._1 -> pts.filter(q => q._1 != p._1 && d2(p, q) <= r * r)
          .map(_._1).toSet).toMap
      val core = pts.map(_._1).filter(p => nbr(p).size + 1 >= minPts).toSet
      // union-find over core-core edges
      val parent = scala.collection.mutable.Map(
        core.map(c => c -> c).toSeq: _*)
      def find(x: Long): Long = {
        var v = x
        while (parent(v) != v) v = parent(v)
        v
      }
      for (c <- core; n <- nbr(c) if core(n)) {
        val (ra, rb) = (find(c), find(n))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val label = core.map(c => c -> core.filter(find(_) == find(c)).min)
        .toMap
      pts.map { p =>
        val id = p._1
        if (core(id)) id -> (("core", Some(label(id))))
        else {
          val coreNb = nbr(id).filter(core)
          if (coreNb.nonEmpty)
            id -> (("border", Some(coreNb.map(label).min)))
          else id -> (("noise", None))
        }
      }.toMap
    }
    val rnd = new scala.util.Random(163)
    for (trial <- 0 until 3) {
      val r = 6L + trial * 3
      val minPts = 3L + trial
      val pts = (1L to 70L).map(i =>
        (i, rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
      val got = Spatial.dbscan(pts.toDF("id", "x", "y"), col("id"),
          col("x"), col("y"), r, minPts)
        .as[(Long, String, Option[Long])].collect()
        .map(t => t._1 -> ((t._2, t._3))).toMap
      assert(got === ref(pts, r, minPts),
        s"trial $trial (r=$r, minPts=$minPts)")
    }
  }

  test("dbscan: null-coordinate points stay singleton core clusters " +
      "under minPts=1 on BOTH adaptive paths") {
    import graft.operators.Spatial
    // Degenerate but reachable: minPts=1 makes every point core, and
    // null coordinates never join a pair, so such points must come out
    // as singleton clusters (cluster = own id). The contraction path
    // used to fuse them all into one null-cell cluster.
    val rows = Seq[(Long, Option[Long], Option[Long])](
      (1L, Some(0L), Some(0L)), (2L, Some(1L), Some(1L)),
      (3L, None, None), (4L, None, Some(5L)), (5L, Some(50L), Some(50L)))
    val df = rows.toDF("id", "x", "y")
    def run(threshold: String) = {
      spark.conf.set(graft.operators.Spatial.ContractionThresholdKey,
        threshold)
      try Spatial.dbscan(df, col("id"), col("x"), col("y"), 3L, 1L)
        .as[(Long, String, Option[Long])].collect().toSet
      finally spark.conf
        .unset(graft.operators.Spatial.ContractionThresholdKey)
    }
    val small = run(Long.MaxValue.toString) // direct-pairs path
    val contracted = run("0")               // forced contraction path
    val want = Set(
      (1L, "core", Some(1L)), (2L, "core", Some(1L)),
      (3L, "core", Some(3L)), (4L, "core", Some(4L)),
      (5L, "core", Some(5L)))
    assert(small === want, "small-pairs path")
    assert(contracted === want, "contraction path")
  }

  test("zScores: radicand past 2^63 computes exactly via the decimal " +
      "path (the q218 overflow class, round-9 headroom audit)") {
    import graft.operators.Stats
    // x ≈ 1.2e9 over 3 rows: Σx² ≈ 4.3e18 still fits long, but both
    // radicand products (Σx²·n ≈ 1.3e19 and (Σx)² ≈ 1.3e19) pass 2⁶³
    // — the long form wrapped to garbage (negative radicand → NaN or
    // a wrong z); the decimal(38) radicand must match a BigInt
    // reference exactly.
    val xs = Seq(1200000000L, 1210000000L, 1190000000L)
    val rows = xs.zipWithIndex
      .map { case (x, i) => ("g", s"id$i", x.toDouble / 100.0) }
    val got = Stats.zScores(rows.toDF("g", "id", "v"),
        col("g"), col("id"), col("v"))
      .select(col("id"), col("z")).as[(String, Double)].collect().toMap
    val n = BigInt(xs.length)
    val s = xs.map(BigInt(_)).sum
    val ss = xs.map(x => BigInt(x) * BigInt(x)).sum
    // the radicand itself is small — it is the PRODUCTS that pass 2⁶³,
    // so the long form wraps each side before subtracting and the
    // small true difference comes out corrupted
    val rad = (ss * n - s * s).toDouble
    assert(ss * n > BigInt(Long.MaxValue) && s * s > BigInt(Long.MaxValue),
      "test setup must actually exceed 2^63 in the products")
    xs.zipWithIndex.foreach { case (x, i) =>
      val expect = BigDecimal((BigInt(x) * n - s).toDouble / math.sqrt(rad))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(got(s"id$i") === expect, s"id$i")
    }
  }

  test("centroidDrift: a true norm past 2^63 fails loudly " +
      "(raise_error guard), not with a wrapped value") {
    import graft.operators.Similarity
    // one vector per bucket, components 4.0 at scale 1e9 → per-
    // component s = 4e9, s² = 1.6e19 > Long.MaxValue: the pre-audit
    // long product wrapped silently; the decimal path computes the
    // true norm and the guarded cast must refuse to emit it as long
    val vecs = Seq((0L, Array(4.0f, 4.0f)), (1L, Array(4.0f, 4.0f)))
      .toDF("b", "v")
    val e = intercept[Exception] {
      Similarity.centroidDrift(vecs, col("b"), col("v"), 1000000000L)
        .collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("centroidDrift")),
      s"expected the centroidDrift guard, got: ${messages(e).mkString(" | ")}")
  }

  test("crossCorrelation: a shifted copy peaks at its lag with r = 1") {
    import graft.operators.Stats
    val rnd = new scala.util.Random(167)
    val base = (1L to 40L).map(t => (t, rnd.nextInt(50).toLong + 1))
    val a = base
    val b = base.map { case (t, v) => (t + 3, v) } // B = A delayed by 3
    val got = Stats.crossCorrelation(a.toDF("t", "v"), b.toDF("t", "v"),
        col("t"), col("v"), 5)
      .select(col("lag"), col("r")).as[(Long, Option[Double])]
      .collect().toMap
    assert(got(3L) === Some(1.0))
    assert(got.filter(_._1 != 3L).values.flatten.forall(_ < 1.0))
  }

  test("trendLines: exact coefficients on a perfect line; constant " +
      "time gives nulls") {
    import graft.operators.Stats
    // v = 7t + 20 exactly
    val rows = (0L to 19L).map(t => ("g", t, 7 * t + 20))
    val got = Stats.trendLines(rows.toDF("g", "t", "v"), col("g"),
        col("t"), col("v"))
      .select(col("n"), col("slope_ppm"), col("intercept_ppm"))
      .as[(Long, Option[Long], Option[Long])].head()
    assert(got === ((20L, Some(7000000L), Some(20000000L))))
    val const = Stats.trendLines(
        Seq(("g", 5L, 1L), ("g", 5L, 2L)).toDF("g", "t", "v"),
        col("g"), col("t"), col("v"))
      .select(col("slope_ppm")).as[Option[Long]].head()
    assert(const.isEmpty)
  }

  test("modularity: one community scores exactly 0, two cliques " +
      "score high, and a reference computation agrees on random " +
      "labellings") {
    import graft.operators.Graph
    def lab(pairs: Seq[(Long, Long)]) = pairs.toDF("node", "label")
    val twoCliques = (for (a <- 1L to 4L; b <- 1L to 4L if a < b)
      yield (a, b)) ++ (for (a <- 5L to 8L; b <- 5L to 8L if a < b)
      yield (a, b))
    val edges = twoCliques.toDF("src", "dst")
    val allNodes = (1L to 8L)
    val one = Graph.modularity(edges, lab(allNodes.map(n => (n, 1L))))
      .select(col("q_num"), col("q_micro")).as[(Long, Long)].head()
    assert(one === ((0L, 0L)))
    val split = Graph.modularity(edges,
        lab(allNodes.map(n => (n, if (n <= 4) 1L else 2L))))
      .select(col("m"), col("q_num"), col("q_micro"))
      .as[(Long, Long, Long)].head()
    // m=12, each community: e_c=6, d_c=12 → q_num = 2·(288−144) = 288
    assert(split === ((12L, 288L, 500000L))) // Q = 1/2 exactly
    def ref(und: Seq[(Long, Long)], labels: Map[Long, Long]): Long = {
      val m = und.size.toLong
      val deg = und.flatMap(e => Seq(e._1, e._2)).groupBy(identity)
        .view.mapValues(_.size.toLong).toMap
      labels.values.toSet.toSeq.map { (c: Long) =>
        val ec = und.count(e =>
          labels(e._1) == c && labels(e._2) == c).toLong
        val dc: Long = deg.collect {
          case (v, d) if labels.getOrElse(v, -1L) == c => d }.sum
        4L * m * ec - dc * dc
      }.sum[Long]
    }
    val rnd = new scala.util.Random(179)
    for (trial <- 0 until 3) {
      val n = 12 + trial * 6
      val und = Seq.fill(2 * n)(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(e => e._1 != e._2)
        .map(e => (math.min(e._1, e._2), math.max(e._1, e._2)))
        .distinct
      val nodes = und.flatMap(e => Seq(e._1, e._2)).distinct
      val labels = nodes.map(v => v -> (rnd.nextInt(3) + 1).toLong).toMap
      val got = Graph.modularity(und.toDF("src", "dst"),
          lab(labels.toSeq))
        .select(col("q_num")).as[Long].head()
      assert(got === ref(und, labels), s"trial $trial")
    }
  }

  test("centroidDrift: identical buckets give cos = 1, opposite give " +
      "-1, orthogonal give 0; matches a reference computation") {
    import graft.operators.Similarity
    def vecs(rows: Seq[(Long, Array[Float])]) = rows.toDF("b", "v")
    val base = Array(1.0f, 0.0f, 2.0f)
    val got = Similarity.centroidDrift(vecs(Seq(
        (0L, base), (1L, base.map(_ * 2)),   // same direction
        (2L, base.map(-_)),                   // reversed
        (3L, Array(0.0f, 5.0f, 0.0f)))),      // orthogonal to bucket 2?
        col("b"), col("v"), 1000L)
      .select(col("bucket"), col("cos"))
      .as[(Long, Option[Double])].collect().toMap
    assert(got(0L) === Some(1.0))
    assert(got(1L) === Some(-1.0))
    // bucket2 (-base) vs bucket3 (y-axis): dot = 0 → cos 0
    assert(got(2L) === Some(0.0))
    // reference on random buckets
    val rnd = new scala.util.Random(191)
    val rows = (0L to 5L).flatMap(b => Seq.fill(7)(
      (b, Array.fill(4)(rnd.nextFloat() - 0.5f))))
    def ref: Map[Long, Double] = {
      val sums = rows.groupBy(_._1).view.mapValues { vs =>
        (0 until 4).map(i => vs.map(v =>
          math.floor(v._2(i).toDouble * 1000).toLong).sum).toArray
      }.toMap
      (0L to 4L).map { b =>
        val (a, c) = (sums(b), sums(b + 1))
        val dot = (0 until 4).map(i => a(i) * c(i)).sum
        val na = a.map(x => x * x).sum; val nb = c.map(x => x * x).sum
        b -> BigDecimal(dot.toDouble /
            (math.sqrt(na.toDouble) * math.sqrt(nb.toDouble)))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      }.toMap
    }
    val got2 = Similarity.centroidDrift(vecs(rows), col("b"), col("v"),
        1000L)
      .select(col("bucket"), col("cos"))
      .as[(Long, Option[Double])].collect()
      .map(r => r._1 -> r._2.get).toMap
    assert(got2 === ref)
  }

  test("sortedNeighborhoodPairs: finds sort-adjacent near-dups, " +
      "misses sort-distant ones (the documented recall trade), " +
      "equi-blocked plan") {
    import graft.operators.StringJoin
    val strs = Seq(
      (1L, "apple pie recipe"), (2L, "apple pie recipes"), // adjacent
      (3L, "zzz apple pie recipe"),  // 1 edit-ish? no — far edit dist
      (4L, "banana bread"), (5L, "banana breads"),
      (6L, "xpple pie recipe")) // 1 sub from id 1 but sorts far away
    val got = StringJoin.sortedNeighborhoodPairs(
        strs.toDF("id", "s"), col("id"), col("s"), col("s"),
        window = 1, maxDist = 2)
      .as[(Long, Long, Long)].collect().toSet
    // window 1: only sort-adjacent pairs compared; (1,2) and (4,5)
    // verify; (1,6) is a true near-dup but sorts 4 ranks apart → missed
    assert(got === Set((1L, 2L, 1L), (4L, 5L, 1L)))
    // window large enough recovers it
    val wide = StringJoin.sortedNeighborhoodPairs(
        strs.toDF("id", "s"), col("id"), col("s"), col("s"),
        window = 5, maxDist = 2)
      .as[(Long, Long, Long)].collect().toSet
    assert(wide.contains((1L, 6L, 1L)))
    import graft.plans.PlanLint
    val plan = StringJoin.sortedNeighborhoodPairs(
      Tables(spark, sfDir, "documents")
        .select(col("doc_id"), substring(col("text"), 1, 24).as("s")),
      col("doc_id"), col("s"), col("s"), 10, 2)
    assert(PlanLint.clean(plan), PlanLint.findings(plan).toString)
  }

  test("plan lint: the session's remaining additions carry no " +
      "cartesians and no single-partition windows") {
    import graft.plans.PlanLint
    def noHazards(df: org.apache.spark.sql.DataFrame, label: String) = {
      val f = PlanLint.findings(df)
        .filterNot(_._1 == "nested_loop_join") // scalar-attach exemption
      assert(f.isEmpty, s"$label: $f")
    }
    val ev = Tables(spark, sfDir, "events")
    val li = Tables(spark, sfDir, "lineitem")
    noHazards(graft.operators.Merge3.threeWayMerge(
      li.select(col("l_orderkey").as("k"), col("l_partkey").as("h")),
      li.select(col("l_orderkey").as("k"), col("l_partkey").as("h")),
      li.select(col("l_orderkey").as("k"), col("l_partkey").as("h"))),
      "merge3")
    noHazards(graft.operators.Stats.cumulativeDistinct(ev,
      col("user_id"), expr("unix_micros(cast(ts as timestamp))")),
      "cumulativeDistinct")
    noHazards(graft.operators.Similarity.covarianceMatrix(
      Tables(spark, sfDir, "embeddings"), col("vec_id"),
      col("embedding"), 1000L), "covariance")
    noHazards(graft.operators.Spatial.radiusPairs(
      Tables(spark, sfDir, "customer").select(col("c_custkey").as("id"),
        pmod(col("c_custkey") * 37, lit(100L)).as("x"),
        pmod(col("c_custkey") * 17, lit(100L)).as("y")),
      col("id"), col("x"), col("y"), 10L), "radiusPairs")
    noHazards(graft.ml.Backtest.seasonalNaiveBacktest(ev,
      col("event_type"),
      expr("unix_micros(cast(ts as timestamp)) div 86400000000"),
      lit(1L), 7L), "backtest")
    noHazards(graft.operators.Stats.trendLines(ev, col("event_type"),
      expr("unix_micros(cast(ts as timestamp)) div 86400000000"),
      lit(1L)), "trendLines")
    // crossCorrelation's lag table attaches by an explicit broadcast
    // cross join (a maxLag-row constant) — the scalar-attach shape
    val ccf = graft.operators.Stats.crossCorrelation(
      ev.select(expr("unix_micros(cast(ts as timestamp))").as("t"),
        lit(1L).as("v")),
      ev.select(expr("unix_micros(cast(ts as timestamp))").as("t"),
        lit(1L).as("v")),
      col("t"), col("v"), 3)
    assert(!PlanLint.findings(ccf)
      .exists(f => f._1 == "cartesian_product" ||
        f._1 == "single_partition_window"),
      PlanLint.findings(ccf).toString)
    // q210's windowed LEFT join must plan as an EQUI join on user_id
    // with the range predicate as a join filter — never a nested loop
    // (the one reported finding is the root orderBy of the 3-row
    // census, the legitimate ordered-output shape)
    val q210 = graft.queries.AnalyticsQueries.q210LinearAttribution
      .fn(spark, sfDir)
    assert(PlanLint.findings(q210).forall(_._1 == "global_sort"),
      PlanLint.findings(q210).toString)
    // q209's windows are per-user; no global ones
    val q209 = graft.queries.AnalyticsQueries.q209SessionPaths
      .fn(spark, sfDir)
    assert(!PlanLint.findings(q209)
      .exists(_._1 == "single_partition_window"),
      PlanLint.findings(q209).toString)
  }

  test("plan lint: empty-partition windows are findings only when " +
      "unbounded; the k-row candidate ranks are plan-provably bounded " +
      "and the benched APSS path plans no window at all") {
    import graft.plans.PlanLint
    import org.apache.spark.sql.expressions.Window
    // corpus-wide empty-partition window: the q117 anti-pattern stays
    // a finding (and emptyPartitionWindows grades it unbounded)
    val naive = Tables(spark, sfDir, "documents")
      .withColumn("rk", row_number().over(Window.orderBy(col("doc_id"))))
    assert(PlanLint.findings(naive).exists(_._1 == "single_partition_window"),
      PlanLint.findings(naive).toString)
    assert(PlanLint.emptyPartitionWindows(naive).exists(!_._2))
    // q138/q191's rank windows sit over the retrievers' k=30 limits:
    // present in the plan, provably bounded, NOT findings. This is the
    // assertion the removed `partitionBy(lit(0))` comments claimed to
    // be — Spark's EliminateWindowPartitions folds a foldable partition
    // spec away, so only the child plan can carry the bound.
    for (d <- Seq(graft.queries.Round8Queries.q138RrfFusion,
        graft.queries.SchemaQueries.q191Rbo)) {
      val df = d.fn(spark, sfDir)
      val ws = PlanLint.emptyPartitionWindows(df)
      assert(ws.nonEmpty && ws.forall(_._2), s"${d.name}: $ws")
      assert(!PlanLint.findings(df).exists(_._1 == "single_partition_window"),
        s"${d.name}: ${PlanLint.findings(df)}")
    }
    // the benched q95 emitter is gone: the dense vocab index is now
    // assigned driver-side, so the APSS plan carries NO empty-partition
    // WindowExec on either strategy (this was the 5-warning tail of the
    // r14 canonical bench artifact)
    val q95 = SparkEntry.defs.find(_.name == "q95_sparse_cosine").get
      .fn(spark, sfDir)
    assert(PlanLint.emptyPartitionWindows(q95).isEmpty)
    val dense = graft.operators.Search.sparseCosinePairs(
      Tables(spark, sfDir, "documents").limit(50),
      col("doc_id"), col("text"), 0.6, dense = Some(true))
    assert(PlanLint.emptyPartitionWindows(dense).isEmpty)
  }

  test("plan lint: rank buckets and pareto classes never plan a " +
      "single-partition window") {
    import graft.plans.PlanLint
    val m = Tables(spark, sfDir, "orders").groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("cnt"))
    val rb = Stats.rankBuckets(m, struct(col("cnt"), col("o_custkey")),
      5, "b")
    assert(!PlanLint.findings(rb)
      .exists(_._1 == "single_partition_window"),
      PlanLint.findings(rb).toString)
    val pc = Stats.paretoClasses(m, col("o_custkey"), col("cnt"),
      Seq(700000L))
    assert(!PlanLint.findings(pc)
      .exists(_._1 == "single_partition_window"),
      PlanLint.findings(pc).toString)
  }
}
