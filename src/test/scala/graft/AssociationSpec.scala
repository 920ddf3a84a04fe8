package graft

import org.apache.spark.sql.functions._

/** Wave-B operators: association pairs, the lossless edit-distance
  * join, CUPED, k-core. Random-input property tests run against
  * driver-side reference implementations.
  */
class AssociationSpec extends SparkSpec {
  import spark.implicits._

  test("frequentItemPairs: exact support/conf/lift on a hand fixture") {
    // baskets: {a,b,c}, {a,b}, {a,c}, {d}
    val rows = Seq((1L, "a"), (1L, "b"), (1L, "c"), (2L, "a"), (2L, "b"),
      (3L, "a"), (3L, "c"), (4L, "d"), (4L, "d")) // dup (4,d) collapses
    val got = graft.operators.Association.frequentItemPairs(
        rows.toDF("b", "i"), col("b"), col("i"), 2, 10)
      .select(col("item_a"), col("item_b"), col("support"),
        col("conf_ab_ppm"), col("conf_ba_ppm"), col("lift_ppm"))
      .as[(String, String, Long, Long, Long, Long)].collect().toSet
    // N=4; ab: s=2, n_a=3, n_b=2 → conf_ab=666666, conf_ba=1000000,
    // lift = 2*4/(3*2) = 1333333; ac identical shape
    assert(got === Set(
      ("a", "b", 2L, 666666L, 1000000L, 1333333L),
      ("a", "c", 2L, 666666L, 1000000L, 1333333L)))
  }

  test("frequentItemPairs: the basket cap excludes mega-baskets " +
      "from pairs AND from supports") {
    val mega = (1 to 9).map(i => (100L, s"i$i"))
    val rows = mega ++ Seq((1L, "i1"), (1L, "i2"), (2L, "i1"), (2L, "i2"))
    val got = graft.operators.Association.frequentItemPairs(
        rows.toDF("b", "i"), col("b"), col("i"), 2, 10, maxBasketSize = 5)
      .select(col("item_a"), col("item_b"), col("support"), col("n_a"))
      .as[(String, String, Long, Long)].collect()
    // mega-basket gone: i1/i2 support 2 from the two small baskets,
    // and n_a counts only capped baskets (2, not 3)
    assert(got.toSeq === Seq(("i1", "i2", 2L, 2L)))
  }

  test("editDistancePairs matches brute force on mutated strings") {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val rnd = new scala.util.Random(17)
    val alpha = "abcde"
    def mutate(s: String, edits: Int): String = {
      var cur = s
      for (_ <- 0 until edits if cur.nonEmpty) {
        val p = rnd.nextInt(cur.length)
        rnd.nextInt(3) match {
          case 0 => cur = cur.updated(p, alpha(rnd.nextInt(alpha.length)))
          case 1 => cur = cur.take(p) + cur.drop(p + 1)
          case 2 => cur = cur.take(p) +
            alpha(rnd.nextInt(alpha.length)) + cur.drop(p)
        }
      }
      cur
    }
    for (trial <- 0 until 3) {
      val d = 1 + trial // maxDist 1..3
      val q = 2
      val bases = Seq.fill(8)(
        Seq.fill(12 + rnd.nextInt(8))(alpha(rnd.nextInt(alpha.length)))
          .mkString)
      val strs = (bases ++ bases.map(mutate(_, rnd.nextInt(d + 2))))
        .zipWithIndex.map { case (s, i) => (i.toLong, s) }
        .filter(_._2.length >= q * (d + 1))
      val expect = (for {
        (ia, sa) <- strs; (ib, sb) <- strs
        if ia < ib && lev(sa, sb) <= d
      } yield (ia, ib, lev(sa, sb).toLong)).toSet
      val got = graft.operators.StringJoin.editDistancePairs(
          strs.toDF("id", "s"), col("id"), col("s"), d, q)
        .as[(Long, Long, Long)].collect().toSet
      assert(got === expect, s"trial $trial (d=$d, n=${strs.size})")
    }
  }

  test("editDistancePairs: duplicate-collapse path is row-identical to " +
      "the plain path on a replicated corpus (incl. dist-0 pairs)") {
    // replica-heavy corpus, the sf1 shape: 4 base strings × 5 copies
    // plus singletons — within-group dist-0 pairs, cross-group
    // survivors, and an unpaired string all exercised
    val bases = Seq("abcabcab", "abcabcax", "zzzyyyxx", "qqqqqqqq")
    val strs = (bases.flatMap(b => Seq.fill(5)(b)) ++
      Seq("abcabcbb", "mnopqrst")).zipWithIndex
      .map { case (s, i) => (i.toLong, s) }
    val df = strs.toDF("id", "s")
    def run(c: Option[Boolean]) = graft.operators.StringJoin
      .editDistancePairs(df, col("id"), col("s"), maxDist = 2, q = 2,
        collapseDups = c)
      .as[(Long, Long, Long)].collect().toSet
    val plain = run(Some(false))
    val collapsed = run(Some(true))
    assert(plain === collapsed)
    // sanity: both within-group (dist 0) and cross-group pairs present
    assert(plain.exists(_._3 == 0L) && plain.exists(_._3 > 0L))
    // and the ungated call picks SOME path and agrees too
    assert(run(None) === plain)
  }

  test("editDistancePairs: short strings are excluded by contract") {
    val strs = Seq((1L, "abc"), (2L, "abd"), (3L, "abcdefgh"),
      (4L, "abcdefgx"))
    val got = graft.operators.StringJoin.editDistancePairs(
        strs.toDF("id", "s"), col("id"), col("s"), 2, 2)
      .as[(Long, Long, Long)].collect().toSet
    // len >= q*(d+1) = 6: ids 1,2 out; 3,4 differ by one substitution
    assert(got === Set((3L, 4L, 1L)))
  }

  test("kCore matches reference peeling on seeded random graphs") {
    def ref(edges: Seq[(Long, Long)], k: Int,
        peels: Int): Map[Long, Long] = {
      var e = edges.flatMap(t => Seq(t, t.swap)).filter(t => t._1 != t._2)
        .distinct
      var p = 0
      var done = false
      while (p < peels && !done) {
        p += 1
        val deg = e.groupBy(_._1).map { case (n, es) => n -> es.size }
        val victims = deg.filter(_._2 < k).keySet
        if (victims.isEmpty) done = true
        else e = e.filterNot(t => victims(t._1) || victims(t._2))
      }
      e.groupBy(_._1).map { case (n, es) => n -> es.size.toLong }
    }
    val rnd = new scala.util.Random(23)
    for (trial <- 0 until 4) {
      val n = 15 + trial * 10
      val m = n + rnd.nextInt(3 * n)
      val edges = Seq.fill(m)(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      val k = 2 + rnd.nextInt(3)
      val peels = 1 + rnd.nextInt(3)
      val got = graft.operators.Graph.kCore(
          edges.toDF("src", "dst"), k, peels)
        .as[(Long, Long)].collect().toMap
      assert(got === ref(edges, k, peels),
        s"trial $trial (n=$n, m=$m, k=$k, peels=$peels)")
    }
  }

  test("cupedReadout: y = 2x ⇒ θ = 2·10⁶ and adjustment equalizes " +
      "variants that differ only through the covariate") {
    val units = (1L to 40L).map { i =>
      val x = i * 10
      (i, i % 2, 2 * x, x) // variant 1 holds odd i → larger x AND y
    }
    val got = graft.ml.Experiment.cupedReadout(
        units.toDF("u", "variant", "y", "x"),
        col("variant"), col("y"), col("x"))
      .select(col("variant"), col("theta_ppm"), col("mean_y_ppm"),
        col("adj_mean_y_ppm"))
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(got.forall(_._2 === 2000000L))
    // raw means differ (variants have different x); adjusted means
    // coincide exactly because y is a pure function of x
    assert(got(0)._3 !== got(1)._3)
    assert(got(0)._4 === got(1)._4)
  }

  test("cupedReadout: zero covariate variance ⇒ θ = 0, adj = raw mean") {
    val units = Seq((1L, 0L, 10L, 5L), (2L, 0L, 20L, 5L),
      (3L, 1L, 30L, 5L))
    val got = graft.ml.Experiment.cupedReadout(
        units.toDF("u", "variant", "y", "x"),
        col("variant"), col("y"), col("x"))
      .select(col("variant"), col("theta_ppm"), col("mean_y_ppm"),
        col("adj_mean_y_ppm"))
      .as[(Long, Long, Long, Long)].collect()
    assert(got.forall(r => r._2 == 0L && r._3 == r._4))
  }

  test("hits matches reference max-norm power iteration on seeded " +
      "random digraphs") {
    def ref(edges: Seq[(Long, Long)], iters: Int): Map[Long, (Long, Long)] = {
      val e = edges.distinct
      val nodes = e.flatMap(t => Seq(t._1, t._2)).distinct
      var h = nodes.map(_ -> 1000000L).toMap
      var a = nodes.map(_ -> 0L).toMap
      def pass(from: Map[Long, Long], in: ((Long, Long)) => Long,
          out: ((Long, Long)) => Long): Map[Long, Long] = {
        val raw = nodes.map(n => n -> e.filter(t => out(t) == n)
          .map(t => from(in(t))).sum).toMap
        val m = raw.values.max
        raw.map { case (n, r) =>
          n -> (if (m == 0) 0L else 1000000L * r / m) }
      }
      for (_ <- 1 to iters) {
        a = pass(h, _._1, _._2)
        h = pass(a, _._2, _._1)
      }
      nodes.map(n => n -> ((h(n), a(n)))).toMap
    }
    val rnd = new scala.util.Random(47)
    for (trial <- 0 until 3) {
      val n = 12 + trial * 8
      val m = n + rnd.nextInt(3 * n)
      val edges = Seq.fill(m)(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      val iters = 1 + rnd.nextInt(3)
      val got = graft.operators.Graph.hits(
          edges.toDF("src", "dst"), iters)
        .as[(Long, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      assert(got === ref(edges, iters),
        s"trial $trial (n=$n, m=$m, iters=$iters)")
    }
  }

  test("hits: on a bipartite star the busy buyer is the top hub and " +
      "the shared seller the top authority") {
    val edges = Seq((10L, 1L), (10L, 2L), (10L, 3L), (11L, 1L))
    val got = graft.operators.Graph.hits(edges.toDF("src", "dst"), 2)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(got(10L)._2 === 1000000L) // hub max
    assert(got(1L)._3 === 1000000L)  // authority max (bought by both)
    assert(got(1L)._3 > got(2L)._3 && got(10L)._2 > got(11L)._2)
    assert(got(1L)._2 === 0L) // sellers never refer → zero hub
  }

  test("rboOverlap: identity ≈ 1, disjoint = 0, top disagreement " +
      "costs more than tail disagreement") {
    import graft.operators.Search
    def rl(ids: Seq[Long]) = ids.zipWithIndex
      .map { case (id, i) => (id, (i + 1).toLong) }.toDF("doc_id", "rank")
    val k = 10
    val a = rl(1L to 10L)
    def rbo(b: org.apache.spark.sql.DataFrame): (Long, Long) =
      Search.rboOverlap(a, b, k, 900000L)
        .select(col("overlap_at_k"), col("rbo_ppb"))
        .as[(Long, Long)].head()
    val (ovId, rboId) = rbo(rl(1L to 10L))
    assert(ovId === 10L)
    // identity = Σ w_d exactly (X_d = d cancels the /d)
    val w = new Array[Long](k + 1)
    w(1) = (1000000000L * 100000L) / 1000000L
    for (d <- 2 to k) w(d) = w(d - 1) * 900000L / 1000000L
    assert(rboId === w.slice(1, k + 1).sum)
    val (ovDis, rboDis) = rbo(rl(11L to 20L))
    assert(ovDis === 0L && rboDis === 0L)
    // swapping ranks 1,2 hurts more than swapping 9,10
    val topSwap = rbo(rl(Seq(2L, 1L) ++ (3L to 10L)))._2
    val tailSwap = rbo(rl((1L to 8L) ++ Seq(10L, 9L)))._2
    assert(topSwap < rboId && tailSwap < rboId && topSwap < tailSwap)
  }

  test("kCore with generous peel budget reaches a true fixpoint: " +
      "every surviving node has degree >= k") {
    val rnd = new scala.util.Random(173)
    for (trial <- 0 until 3) {
      val n = 20 + trial * 15
      val edges = Seq.fill(3 * n)(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      val k = 2 + rnd.nextInt(3)
      val core = graft.operators.Graph.kCore(
          edges.toDF("src", "dst"), k, maxPeels = n)
        .as[(Long, Long)].collect()
      assert(core.forall(_._2 >= k), s"trial $trial (k=$k)")
    }
  }

  test("rboOverlap stays within [0, Σw] and is monotone in prefix " +
      "agreement") {
    import graft.operators.Search
    def rl(ids: Seq[Long]) = ids.zipWithIndex
      .map { case (id, i) => (id, (i + 1).toLong) }.toDF("doc_id", "rank")
    val k = 8
    val w = new Array[Long](k + 1)
    w(1) = (1000000000L * 100000L) / 1000000L
    for (d <- 2 to k) w(d) = w(d - 1) * 900000L / 1000000L
    val wSum = w.slice(1, k + 1).sum
    val a = rl(1L to 8L)
    // progressively longer agreeing prefixes → non-decreasing rbo
    val rbos = (0 to 8).map { agree =>
      val ids = (1L to agree.toLong) ++ (100L + agree to 107L)
      Search.rboOverlap(a, rl(ids.take(8)), k, 900000L)
        .select(col("rbo_ppb")).as[Long].head()
    }
    assert(rbos.forall(r => r >= 0L && r <= wSum))
    assert(rbos === rbos.sorted)
    assert(rbos.head === 0L && rbos.last === wSum)
  }

  test("plan lint: wave-B operators carry no scale hazards") {
    import graft.plans.PlanLint
    val pairs = graft.operators.Association.frequentItemPairs(
      Tables(spark, sfDir, "lineitem"), col("l_orderkey"),
      col("l_partkey"), 2, 20)
    // the one-row N attach is the documented scalar exemption
    assert(PlanLint.findings(pairs).forall(_._1 == "nested_loop_join"),
      PlanLint.findings(pairs).toString)
    val ed = graft.operators.StringJoin.editDistancePairs(
      Tables(spark, sfDir, "documents")
        .select(col("doc_id"), substring(col("text"), 1, 24).as("s")),
      col("doc_id"), col("s"), 2, 2)
    assert(PlanLint.clean(ed), PlanLint.findings(ed).toString)
    val cuped = graft.ml.Experiment.cupedReadout(
      Tables(spark, sfDir, "events").groupBy(col("user_id"))
        .agg(sum(floor(col("value")).cast("long")).as("y"),
          count(lit(1)).as("x")),
      pmod(col("user_id"), lit(2L)), col("y"), col("x"))
    assert(PlanLint.findings(cuped).forall(_._1 == "nested_loop_join"),
      PlanLint.findings(cuped).toString)
  }
}
