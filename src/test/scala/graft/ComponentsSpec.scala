package graft

import graft.operators.Components
import org.apache.spark.sql.functions._

/** Connected components: parity vs an in-JVM union-find on seeded
  * random graphs, worst-case chains (where naive label propagation
  * would need O(n) rounds), and the dedup-cluster view.
  */
class ComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != r) { val nx = parent(c); parent(c) = r; c = nx }
      r
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // root compression to the minimum id in each set
    val label = (0 until n).map(i => i.toLong -> find(i).toLong).toMap
    val minOf = label.groupBy(_._2).map { case (r, m) => r -> m.keys.min }
    label.map { case (nd, r) => nd -> minOf(r) }
  }

  private def ccOf(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val e = edges.toDF("src", "dst")
    val nodes = (0L until n.toLong).toDF("node")
    Components.connectedComponents(e, Some(nodes))
      .as[(Long, Long)].collect().toMap
  }

  test("matches union-find on seeded random graphs") {
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 5) {
      val n = 60 + trial * 30
      val m = rnd.nextInt(2 * n)
      val edges = Seq.fill(m)(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      assert(ccOf(n, edges) === unionFind(n, edges),
        s"trial $trial (n=$n, m=$m)")
    }
  }

  test("small-tail union-find finish ≡ pure star rounds (long and " +
      "string keys), and unsupported key types fall back to stars") {
    def withTail[A](edges: Long)(f: => A): A = {
      spark.conf.set(graft.operators.Components.SmallTailKey,
        edges.toString)
      try f finally spark.conf.unset(graft.operators.Components.SmallTailKey)
    }
    val rnd = new scala.util.Random(271)
    for (trial <- 0 until 3) {
      val n = 80 + trial * 40
      val m = rnd.nextInt(2 * n) + 5
      val edges = Seq.fill(m)(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      val starOnly = withTail(0L)(ccOf(n, edges))
      val tailed = withTail(Long.MaxValue)(ccOf(n, edges))
      assert(tailed === starOnly, s"trial $trial (n=$n, m=$m)")
      assert(starOnly === unionFind(n, edges), s"trial $trial ref")
    }
    // string node ids: lexicographic min labels, both paths agree
    val sEdges = Seq(("b", "c"), ("c", "a"), ("x", "y"), ("q", "q"))
      .toDF("src", "dst")
    def run() = Components.connectedComponents(sEdges)
      .as[(String, String)].collect().toMap
    val sStar = withTail(0L)(run())
    val sTail = withTail(Long.MaxValue)(run())
    assert(sStar === sTail)
    assert(sTail === Map("a" -> "a", "b" -> "a", "c" -> "a",
      "x" -> "x", "y" -> "x"))
    // non-BMP regression: U+10000 ("𐀀") sorts BELOW U+E000
    // in UTF-16 code-unit order but ABOVE it in UTF-8/code-point order
    // (Spark's UTF8String order). Both paths must agree with Spark:
    // root is U+E000.
    val supp = "𐀀" // U+10000
    val pua = ""
    val uEdges = Seq((supp, pua)).toDF("src", "dst")
    def runU() = Components.connectedComponents(uEdges)
      .as[(String, String)].collect().toMap
    val uStar = withTail(0L)(runU())
    val uTail = withTail(Long.MaxValue)(runU())
    assert(uStar === uTail, "supplementary-char root must match Spark order")
    assert(uTail(supp) === pua && uTail(pua) === pua,
      "UTF-16 order would (wrongly) root at the supplementary char")
    // a key type without an external ordering (double) must still
    // converge — via star rounds — even when the tail gate is open
    val dEdges = Seq((1.5, 2.5), (2.5, 3.5)).toDF("src", "dst")
    val dGot = withTail(Long.MaxValue) {
      Components.connectedComponents(dEdges)
        .as[(Double, Double)].collect().toMap
    }
    assert(dGot === Map(1.5 -> 1.5, 2.5 -> 1.5, 3.5 -> 1.5))
  }

  test("small-tail collapse fires below the gates and NEVER above " +
      "them (count gate and byte gate)") {
    def fires[A](tailEdges: String, maxBytes: String)(f: => A): Long = {
      spark.conf.set(Components.SmallTailKey, tailEdges)
      spark.conf.set(Components.SmallTailBytesKey, maxBytes)
      val before = Components.smallTailFires.sum()
      try { f; Components.smallTailFires.sum() - before }
      finally {
        spark.conf.unset(Components.SmallTailKey)
        spark.conf.unset(Components.SmallTailBytesKey)
      }
    }
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L),
      (21L, 22L), (22L, 23L)).toDF("src", "dst")
    def run(): Unit =
      Components.connectedComponents(edges).collect()
    // wide-open gates: the collapse must fire exactly once
    assert(fires(Long.MaxValue.toString, Long.MaxValue.toString)(run()) === 1L,
      "collapse should fire below both gates")
    // count gate closed: star rounds only, no single-task stage
    assert(fires("0", Long.MaxValue.toString)(run()) === 0L,
      "collapse must never fire above the edge-count gate")
    // byte gate closed: even a tiny edge count must stay on star rounds
    assert(fires(Long.MaxValue.toString, "0")(run()) === 0L,
      "collapse must never fire above the byte gate")
    // the byte estimate is monotone in count and key width, and
    // strings with observed bytes estimate wider than zero-byte keys
    assert(Components.smallTailEstBytes(100L, 0L, 24L) <
      Components.smallTailEstBytes(1000L, 0L, 24L))
    assert(Components.smallTailEstBytes(100L, 0L, 0L) <
      Components.smallTailEstBytes(100L, 5000L, 0L))
  }

  test("bfsHops matches a reference BFS on seeded random graphs") {
    def refBfs(edges: Seq[(Long, Long)], seeds: Set[Long],
        maxHops: Int): Map[Long, Long] = {
      val adj = edges.groupBy(_._1).map { case (s, es) =>
        (s, es.map(_._2).distinct) }
      val inGraph = edges.flatMap(e => Seq(e._1, e._2)).toSet
      var dist = seeds.intersect(inGraph).map(_ -> 0L).toMap
      var frontier = dist.keySet
      var hop = 0L
      while (hop < maxHops && frontier.nonEmpty) {
        hop += 1
        val next = frontier.flatMap(n => adj.getOrElse(n, Seq.empty))
          .diff(dist.keySet)
        dist = dist ++ next.map(_ -> hop)
        frontier = next
      }
      dist
    }
    val rnd = new scala.util.Random(1234)
    for (trial <- 0 until 4) {
      val n = 25 + trial * 15
      val m = rnd.nextInt(3 * n) + n / 2
      val und = Seq.fill(m)(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      val sym = und ++ und.map(_.swap)
      val seeds = Seq.fill(3)(rnd.nextInt(2 * n).toLong) // some off-graph
      val maxHops = 1 + rnd.nextInt(4)
      val got = graft.operators.Graph.bfsHops(
          sym.toDF("src", "dst"), seeds.toDF("node"), maxHops)
        .as[(Long, Long)].collect().toMap
      assert(got === refBfs(sym, seeds.toSet, maxHops),
        s"trial $trial (n=$n, m=$m, maxHops=$maxHops)")
    }
  }

  test("ksDistance matches a reference supremum on seeded samples") {
    def refKs(a: Seq[Long], b: Seq[Long]): (Long, Long) = {
      val support = (a ++ b).distinct.sorted
      val pairs = support.map { v =>
        val cumA = a.count(_ <= v).toLong
        val cumB = b.count(_ <= v).toLong
        (v, math.abs(cumA * b.size - cumB * a.size) * 1000000L /
          (a.size.toLong * b.size))
      }
      val best = pairs.map(_._2).max
      (pairs.filter(_._2 == best).map(_._1).min, best)
    }
    val rnd = new scala.util.Random(99)
    for (trial <- 0 until 4) {
      val a = Seq.fill(30 + rnd.nextInt(40))(rnd.nextInt(20).toLong)
      val b = Seq.fill(30 + rnd.nextInt(40))(
        (rnd.nextInt(20) + trial).toLong)
      val (refV, refKsv) = refKs(a, b)
      val got = graft.operators.Stats
        .ksDistance(a.toDF("x"), b.toDF("x"), col("x"))
        .as[(Long, Long, Long, Long)].collect().head
      assert(got === ((a.size.toLong, b.size.toLong, refV, refKsv)),
        s"trial $trial")
      assert(refKsv >= 0L && refKsv <= 1000000L)
    }
  }

  test("chain graph collapses to one component rooted at 0") {
    val n = 200
    val edges = (0L until (n - 1).toLong).map(i => (i, i + 1))
    val got = ccOf(n, edges)
    assert(got.values.toSet === Set(0L))
    assert(got.size === n)
  }

  test("isolated nodes are their own singleton components") {
    val got = ccOf(6, Seq((1L, 2L), (2L, 1L), (4L, 4L)))
    assert(got === Map(0L -> 0L, 1L -> 1L, 2L -> 1L,
      3L -> 3L, 4L -> 4L, 5L -> 5L))
  }

  test("empty edge set with explicit nodes yields all singletons") {
    val e = Seq.empty[(Long, Long)].toDF("src", "dst")
    val nodes = (0L until 4L).toDF("node")
    val got = Components.connectedComponents(e, Some(nodes))
      .as[(Long, Long)].collect().toMap
    assert(got === Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 3L))
  }

  test("dedupClusters marks the component minimum as representative") {
    val e = Seq((5L, 3L), (3L, 9L), (7L, 8L)).toDF("src", "dst")
    val nodes = (1L to 9L).toDF("node")
    val rows = Components.dedupClusters(e, nodes)
      .as[(Long, Long, Long, Long)].collect().toSet
    val expected = Set(
      (1L, 1L, 1L, 1L), (2L, 2L, 1L, 1L), (4L, 4L, 1L, 1L),
      (6L, 6L, 1L, 1L), (3L, 3L, 1L, 3L), (5L, 3L, 0L, 3L),
      (9L, 3L, 0L, 3L), (7L, 7L, 1L, 2L), (8L, 7L, 0L, 2L))
    assert(rows === expected)
  }

  test("triangleStats: exact census on a hand-checked diamond graph") {
    // K4 minus edge 1-4: triangles {1,2,3} and {2,3,4};
    // degrees 2,3,3,2 -> wedges = 1+3+3+1 = 8; cc = 3*2/8 = 0.75.
    // Input deliberately dirty: duplicates, both directions, a self
    // loop — normalization must collapse all of it.
    val edges = Seq(
      (1L, 2L), (2L, 1L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L),
      (3L, 4L), (4L, 4L)).toDF("src", "dst")
    val r = graft.operators.Graph.triangleStats(edges).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ===
      ((4L, 5L, 8L, 2L)))
    assert(r.getDouble(4) === 0.75)
  }

  test("triangleStats: a star has wedges but zero triangles, cc 0") {
    val star = (1L to 5L).map(i => (0L, i)).toDF("src", "dst")
    val r = graft.operators.Graph.triangleStats(star).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ===
      ((6L, 5L, 10L, 0L)))
    assert(r.getDouble(4) === 0.0)
  }
}
