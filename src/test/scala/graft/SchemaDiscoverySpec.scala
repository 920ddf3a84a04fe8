package graft

import org.apache.spark.sql.functions._

class SchemaDiscoverySpec extends SparkSpec {
  import spark.implicits._
  import graft.operators.SchemaDiscovery

  test("functionalDependencies: holds/fails with exact violation " +
      "counts; null determinant is a regular group") {
    val df = Seq(
      ("k1", "a", "x"), ("k1", "a", "y"), // k→dep2 violated by k1
      ("k2", "b", "z"),
      (null: String, "c", "z"), (null, "c", "z") // null det, consistent
    ).toDF("k", "d1", "d2")
    val got = SchemaDiscovery.functionalDependencies(df,
        Seq(("k", "d1"), ("k", "d2")))
      .as[(String, String, Long, Long, Boolean)].collect().toSet
    assert(got === Set(
      ("k", "d1", 3L, 0L, true),
      ("k", "d2", 3L, 1L, false)))
  }

  test("functionalDependencies: all-null dependent group counts " +
      "zero distinct values and cannot violate") {
    val df = Seq(("k1", null: String), ("k1", null),
      ("k2", "v")).toDF("k", "d")
    val got = SchemaDiscovery.functionalDependencies(df, Seq(("k", "d")))
      .as[(String, String, Long, Long, Boolean)].collect()
    assert(got.toSeq === Seq(("k", "d", 2L, 0L, true)))
  }

  test("inclusionDependencies: exact missing counts; nulls excluded") {
    val child = Seq(Some(1L), Some(2L), Some(9L), None, Some(2L))
      .toDF("c")
    val parent = Seq(1L, 2L, 3L).toDF("p")
    val got = SchemaDiscovery.inclusionDependencies(Seq(
        ("c_in_p", child, "c", parent, "p"),
        ("p_in_c", parent, "p", child, "c")))
      .as[(String, Long, Long, Boolean)].collect().toSet
    assert(got === Set(
      ("c_in_p", 3L, 1L, false),  // 9 missing; null not counted
      ("p_in_c", 3L, 1L, false))) // 3 missing
  }

  test("temporalJoin: intersected windows, open ends, no-overlap " +
      "exclusion; self-join is the identity tiling") {
    import graft.operators.Scd2
    def tl(rows: Seq[(Long, String, Long, Option[Long])]) =
      rows.toDF("k", "attr", "valid_from_us", "valid_to_us")
    val a = tl(Seq((1L, "x", 0L, Some(10L)), (1L, "y", 10L, None),
      (2L, "x", 0L, Some(5L))))
    val b = tl(Seq((1L, "p", 5L, Some(12L)), (1L, "q", 12L, None),
      (3L, "p", 0L, None)))
    val got = Scd2.temporalJoin(a, b)
      .as[(Long, String, String, Long, Option[Long])].collect().toSet
    assert(got === Set(
      (1L, "x", "p", 5L, Some(10L)),   // [0,10) ∩ [5,12)
      (1L, "y", "p", 10L, Some(12L)),  // [10,∞) ∩ [5,12)
      (1L, "y", "q", 12L, None)))      // [10,∞) ∩ [12,∞) open
    // adjacent half-open intervals do NOT overlap: [0,5) vs [5,10)
    val adj = Scd2.temporalJoin(
      tl(Seq((9L, "x", 0L, Some(5L)))),
      tl(Seq((9L, "p", 5L, Some(10L)))))
    assert(adj.isEmpty)
    // a timeline joined with itself reproduces each interval (runs of
    // one timeline never overlap each other)
    val self = Scd2.temporalJoin(a, a.withColumnRenamed("attr", "attr2")
        .withColumnRenamed("attr2", "attr"))
      .as[(Long, String, String, Long, Option[Long])].collect()
    assert(self.forall(r => r._2 == r._3))
    assert(self.length === 3)
  }

  test("maxConcurrency: overlap counting, half-open adjacency, open " +
      "intervals") {
    import graft.operators.Concurrency
    def iv(rows: Seq[(String, Long, Option[Long])]) =
      rows.toDF("attr", "from_us", "to_us")
    // x: [0,10) [5,15) [14,20) → peak 2, first at t=5; y: adjacent
    // half-open intervals never overlap (peak 1 at t=0); z: two open
    // intervals accumulate forever (peak 2 at t=7)
    val got = Concurrency.maxConcurrency(iv(Seq(
        ("x", 0L, Some(10L)), ("x", 5L, Some(15L)), ("x", 14L, Some(20L)),
        ("y", 0L, Some(5L)), ("y", 5L, Some(10L)),
        ("z", 3L, None), ("z", 7L, None))))
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got === Map("x" -> ((2L, 5L)), "y" -> ((1L, 0L)),
      "z" -> ((2L, 7L))))
  }

  test("maxConcurrency matches a reference sweep on random intervals") {
    import graft.operators.Concurrency
    def ref(rows: Seq[(String, Long, Option[Long])])
        : Map[String, (Long, Long)] =
      rows.groupBy(_._1).map { case (attr, ivs) =>
        val deltas = (ivs.map(i => (i._2, 1L)) ++
          ivs.flatMap(i => i._3.map(t => (t, -1L))))
          .groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq
          .sortBy(_._1)
        var run = 0L
        val cum = deltas.map { case (t, d) => run += d; (t, run) }
        val mx = cum.map(_._2).max
        attr -> ((mx, cum.filter(_._2 == mx).map(_._1).min))
      }
    val rnd = new scala.util.Random(61)
    for (trial <- 0 until 4) {
      val rows = Seq.fill(40 + trial * 30) {
        val attr = s"a${rnd.nextInt(4)}"
        val from = rnd.nextInt(50).toLong
        val to = if (rnd.nextInt(5) == 0) None
          else Some(from + 1 + rnd.nextInt(20))
        (attr, from, to)
      }
      val got = Concurrency.maxConcurrency(
          rows.toDF("attr", "from_us", "to_us"))
        .as[(String, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      assert(got === ref(rows), s"trial $trial")
    }
  }

  test("weightedQuantiles matches a reference inverse CDF on random " +
      "weighted samples; unit weights degrade to plain quantiles") {
    import graft.operators.Stats
    def ref(rows: Seq[(String, Long, Long)], q: Long)
        : Map[String, Long] =
      rows.groupBy(_._1).map { case (g, rs) =>
        val cells = rs.groupBy(_._2).view.mapValues(_.map(_._3).sum)
          .toSeq.sortBy(_._1)
        val total = cells.map(_._2).sum
        var cum = 0L
        g -> cells.collectFirst {
          case (v, w) if { cum += w; cum * 1000000L >= q * total } => v
        }.get
      }
    val rnd = new scala.util.Random(83)
    for (trial <- 0 until 3) {
      val rows = Seq.fill(60 + trial * 40)((s"g${rnd.nextInt(3)}",
        rnd.nextInt(25).toLong, 1L + rnd.nextInt(9)))
      for (q <- Seq(100000L, 500000L, 900000L, 1000000L)) {
        val got = Stats.weightedQuantiles(rows.toDF("g", "v", "w"),
            col("g"), col("v"), col("w"), Seq(q))
          .select(col("grp"), col("value"))
          .as[(String, Long)].collect().toMap
        assert(got === ref(rows, q), s"trial $trial q=$q")
      }
    }
    // q = 1000000 is the maximum value (cum == total there)
    val mx = Stats.weightedQuantiles(
        Seq(("g", 1L, 5L), ("g", 9L, 1L)).toDF("g", "v", "w"),
        col("g"), col("v"), col("w"), Seq(1000000L))
      .select(col("value")).as[Long].head()
    assert(mx === 9L)
  }

  test("mannWhitneyU2 matches brute-force pair counting and the " +
      "2·n_a·n_b identity") {
    import graft.operators.Stats
    val rnd = new scala.util.Random(97)
    for (trial <- 0 until 3) {
      val a = Seq.fill(20 + rnd.nextInt(30))(rnd.nextInt(12).toLong)
      val b = Seq.fill(20 + rnd.nextInt(30))(rnd.nextInt(12).toLong + trial)
      val u2aRef = (for (x <- a; y <- b) yield
        (if (x > y) 2L else if (x == y) 1L else 0L)).sum
      val u2bRef = (for (x <- a; y <- b) yield
        (if (y > x) 2L else if (x == y) 1L else 0L)).sum
      val (na, nb, u2a, u2b) = Stats.mannWhitneyU2(
          a.toDF("x"), b.toDF("x"), col("x"))
        .as[(Long, Long, Long, Long)].head()
      assert((na, nb, u2a, u2b) ===
        ((a.size.toLong, b.size.toLong, u2aRef, u2bRef)), s"trial $trial")
      assert(u2a + u2b === 2L * na * nb)
    }
    // total separation: every a below every b
    val sep = Stats.mannWhitneyU2(Seq(1L, 2L).toDF("x"),
      Seq(10L, 11L, 12L).toDF("x"), col("x"))
      .as[(Long, Long, Long, Long)].head()
    assert(sep === ((2L, 3L, 0L, 12L)))
  }

  test("maxDrawdown matches a reference scan; rising series draw " +
      "down zero; one giant group exercises the carry path") {
    import graft.operators.Stats
    def ref(rows: Seq[(String, Long, Long)]): Map[String, (Long, Long)] =
      rows.groupBy(_._1).map { case (g, rs) =>
        val cells = rs.groupBy(_._2).view.mapValues(_.map(_._3).sum)
          .toSeq.sortBy(_._1)
        var bal = 0L; var hwm = Long.MinValue
        val dds = cells.map { case (k, d) =>
          bal += d; hwm = math.max(hwm, bal); (k, hwm - bal) }
        val mx = dds.map(_._2).max
        g -> ((mx, dds.filter(_._2 == mx).map(_._1).min))
      }
    val rnd = new scala.util.Random(113)
    for (trial <- 0 until 3) {
      val nGroups = if (trial == 2) 1 else 4 // giant-group trial
      val rows = Seq.fill(80 + trial * 60)((s"u${rnd.nextInt(nGroups)}",
        rnd.nextInt(40).toLong, rnd.nextInt(21).toLong - 10L))
      val got = Stats.maxDrawdown(rows.toDF("g", "k", "d"),
          col("g"), col("k"), col("d"))
        .as[(String, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      assert(got === ref(rows), s"trial $trial")
    }
    val rising = Stats.maxDrawdown(
      (1L to 20L).map(i => ("u", i, 1L)).toDF("g", "k", "d"),
      col("g"), col("k"), col("d"))
      .as[(String, Long, Long)].collect()
    assert(rising.toSeq === Seq(("u", 0L, 1L)))
  }

  test("threeWayMerge: the full verdict lattice on a hand fixture") {
    import graft.operators.Merge3
    def t(rows: Seq[(Long, Long)]) = rows.toDF("k", "h")
    // k1 untouched; k2 ours-only edit; k3 theirs-only edit; k4 both
    // edit same; k5 both edit differently; k6 ours delete (theirs
    // keeps base → take_ours deletion); k7 both delete; k8 delete vs
    // update conflict; k9 disjoint insert (ours); k10 convergent
    // insert; k11 divergent insert
    val base = t(Seq((1L, 10L), (2L, 20L), (3L, 30L), (4L, 40L),
      (5L, 50L), (6L, 60L), (7L, 70L), (8L, 80L)))
    val ours = t(Seq((1L, 10L), (2L, 21L), (3L, 30L), (4L, 44L),
      (5L, 55L), (8L, 88L), (9L, 90L), (10L, 100L), (11L, 110L)))
    val theirs = t(Seq((1L, 10L), (2L, 20L), (3L, 33L), (4L, 44L),
      (5L, 56L), (6L, 60L), (10L, 100L), (11L, 111L)))
    val got = Merge3.threeWayMerge(base, ours, theirs)
      .select(col("k"), col("verdict"), col("h_merged"))
      .as[(Long, String, Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got === Map(
      1L -> (("unchanged", Some(10L))),
      2L -> (("take_ours", Some(21L))),
      3L -> (("take_theirs", Some(33L))),
      4L -> (("both_same", Some(44L))),
      5L -> (("conflict", None)),
      6L -> (("take_ours", None)),      // clean deletion: merged absent
      7L -> (("both_same", None)),      // both deleted
      8L -> (("conflict", None)),       // delete vs update
      9L -> (("take_ours", Some(90L))), // disjoint insert
      10L -> (("both_same", Some(100L))),
      11L -> (("conflict", None))))     // divergent insert
  }

  test("cumulativeDistinct: first occurrences only, exact running " +
      "total, null keys excluded") {
    import graft.operators.Stats
    val rows = Seq((Some("a"), 1L), (Some("b"), 1L), (Some("a"), 2L),
      (Some("c"), 2L), (Some("c"), 5L), (None, 1L))
    val got = Stats.cumulativeDistinct(rows.toDF("k", "b"),
        col("k"), col("b"))
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq === Seq((1L, 2L, 2L), (2L, 1L, 3L)))
  }

  test("cusumAlarms: the closed form equals the sequential " +
      "max(0, S+d) recursion on seeded random series") {
    import graft.operators.Stats
    def ref(rows: Seq[(String, Long, Long)], k: Long, h: Long)
        : Map[String, (Long, Long, Option[Long])] =
      rows.groupBy(_._1).map { case (g, rs) =>
        val cells = rs.groupBy(_._2).view.mapValues(_.map(_._3).sum)
          .toSeq.sortBy(_._1)
        var s = 0L
        val states = cells.map { case (ky, x) =>
          s = math.max(0L, s + (x - k)); (ky, s) }
        val mx = states.map(_._2).max
        g -> ((mx, states.filter(_._2 == mx).map(_._1).min,
          states.find(_._2 > h).map(_._1)))
      }
    val rnd = new scala.util.Random(131)
    for (trial <- 0 until 4) {
      val k = 2L + trial
      val h = 5L + 3 * trial
      val rows = Seq.fill(100)((s"m${rnd.nextInt(3)}",
        rnd.nextInt(50).toLong, rnd.nextInt(8).toLong))
      // cusumAlarms applies k per aggregated CELL — collapse dup keys
      // to one observation first, as the contract requires
      val cells = rows.groupBy(r => (r._1, r._2)).toSeq
        .map { case ((g, ky), rs) => (g, ky, rs.map(_._3).sum) }
      val got = Stats.cusumAlarms(cells.toDF("g", "ky", "x"),
          col("g"), col("ky"), col("x"), k, h)
        .as[(String, Long, Long, Option[Long])].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      assert(got === ref(cells, k, h), s"trial $trial (k=$k, h=$h)")
    }
  }

  test("threeWayMerge matches a reference classifier on random edits") {
    import graft.operators.Merge3
    val rnd = new scala.util.Random(137)
    for (trial <- 0 until 3) {
      val keys = (1L to 60L)
      def mutate(): Map[Long, Long] = keys.flatMap { k =>
        rnd.nextInt(5) match {
          case 0 => None // delete
          case 1 => Some(k -> (1000L + rnd.nextInt(3))) // edit
          case _ => Some(k -> 100L) // keep base value
        }
      }.toMap ++ (61L to 70L).flatMap(k =>
        if (rnd.nextBoolean()) Some(k -> (2000L + rnd.nextInt(2)))
        else None) // inserts
      val base = keys.map(k => k -> 100L).toMap
      val ours = mutate(); val theirs = mutate()
      def ref(k: Long): (String, Option[Long]) = {
        val (b, o, t) = (base.get(k), ours.get(k), theirs.get(k))
        if (o == b && t == b) ("unchanged", b)
        else if (o == b) ("take_theirs", t)
        else if (t == b) ("take_ours", o)
        else if (o == t) ("both_same", o)
        else ("conflict", None)
      }
      val allKeys = (base.keySet ++ ours.keySet ++ theirs.keySet).toSeq
      val expect = allKeys.map(k => k -> ref(k)).toMap
      def df(m: Map[Long, Long]) = m.toSeq.toDF("k", "h")
      val got = Merge3.threeWayMerge(df(base), df(ours), df(theirs))
        .select(col("k"), col("verdict"), col("h_merged"))
        .as[(Long, String, Option[Long])].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      assert(got === expect, s"trial $trial")
    }
  }

  test("coveredTime: merges overlaps, keeps gaps, drops opens; " +
      "matches a reference merger on random intervals") {
    import graft.operators.Concurrency
    def iv(rows: Seq[(String, Long, Option[Long])]) =
      rows.toDF("grp", "from_us", "to_us")
    // [0,10)∪[5,20) = 20; gap to [30,35) = 5 → 25 over 2 segments;
    // touching [40,45)+[45,50) merge; nested [60,100)⊇[70,80); the
    // open and the empty interval are dropped
    val got = Concurrency.coveredTime(iv(Seq(
        ("u", 0L, Some(10L)), ("u", 5L, Some(20L)), ("u", 30L, Some(35L)),
        ("u", 99L, None), ("u", 7L, Some(7L)),
        ("v", 40L, Some(45L)), ("v", 45L, Some(50L)),
        ("w", 60L, Some(100L)), ("w", 70L, Some(80L)))))
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got === Map("u" -> ((25L, 2L)), "v" -> ((10L, 1L)),
      "w" -> ((40L, 1L))))
    def ref(rows: Seq[(String, Long, Long)]): Map[String, (Long, Long)] =
      rows.groupBy(_._1).map { case (g, rs) =>
        val sorted = rs.map(r => (r._2, r._3)).sortBy(identity)
        var segs = List.empty[(Long, Long)]
        sorted.foreach { case (f, t) =>
          segs match {
            case (a, b) :: rest if f <= b =>
              segs = (a, math.max(b, t)) :: rest
            case _ => segs = (f, t) :: segs
          }
        }
        g -> ((segs.map(s => s._2 - s._1).sum, segs.size.toLong))
      }
    val rnd = new scala.util.Random(139)
    for (trial <- 0 until 4) {
      val rows = Seq.fill(60 + trial * 40) {
        val f = rnd.nextInt(200).toLong
        (s"g${rnd.nextInt(3)}", f, f + 1 + rnd.nextInt(30).toLong)
      }
      val got2 = Concurrency.coveredTime(
          rows.map(r => (r._1, r._2, Some(r._3)))
            .toDF("grp", "from_us", "to_us"))
        .as[(String, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      assert(got2 === ref(rows), s"trial $trial")
    }
  }

  test("plan lint: maxDrawdown's windows are partition-local or " +
      "bounded by shuffle.partitions — never data-sized per group") {
    import graft.plans.PlanLint
    val ev = Tables(spark, sfDir, "events")
    val dd = graft.operators.Stats.maxDrawdown(ev, col("user_id"),
      unix_micros(col("ts").cast("timestamp")),
      floor(col("value")).cast("long"))
    assert(!PlanLint.findings(dd)
      .exists(_._1 == "single_partition_window"),
      PlanLint.findings(dd).toString)
  }

  test("plan lint: maxConcurrency never plans a single-partition " +
      "window (its whole point)") {
    import graft.plans.PlanLint
    val intervals = graft.operators.Scd2.build(
      Tables(spark, sfDir, "events"), col("user_id"), col("event_type"),
      col("ts"), col("event_id"))
      .select(col("attr"), col("valid_from_us").as("from_us"),
        col("valid_to_us").as("to_us"))
    val conc = graft.operators.Concurrency.maxConcurrency(intervals)
    assert(!PlanLint.findings(conc)
      .exists(_._1 == "single_partition_window"),
      PlanLint.findings(conc).toString)
  }

  test("plan lint: schema discovery is aggregates and anti-joins only") {
    import graft.plans.PlanLint
    val fd = SchemaDiscovery.functionalDependencies(
      Tables(spark, sfDir, "orders"),
      Seq(("o_orderkey", "o_custkey")))
    assert(PlanLint.clean(fd), PlanLint.findings(fd).toString)
    val ind = SchemaDiscovery.inclusionDependencies(Seq(
      ("fk", Tables(spark, sfDir, "lineitem"), "l_orderkey",
        Tables(spark, sfDir, "orders"), "o_orderkey")))
    // the one-row missing-count attach is the scalar exemption
    assert(PlanLint.findings(ind).forall(_._1 == "nested_loop_join"),
      PlanLint.findings(ind).toString)
  }
}
