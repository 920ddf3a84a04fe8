package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Distributed connected components over an edge list — the step that
  * turns near-duplicate PAIRS (MinHash/SimHash/Jaccard output) into
  * duplicate CLUSTERS so a corpus can keep one representative per
  * cluster. Pair generation alone under-deduplicates: if A≈B and B≈C
  * but A's similarity to C falls under the threshold, only the
  * component view removes all but one of {A, B, C}.
  *
  * Algorithm: alternating large-star / small-star (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC'14) — the
  * shuffle-friendly formulation that converges in O(log n) rounds on
  * real graphs, vs O(diameter) for naive label propagation (a 1e6-node
  * chain takes 1e6 label-propagation rounds but ~40 star rounds).
  * Each round is two hash aggregations and two hash joins on the edge
  * list — no collect_list adjacency materialization, so a hub node of
  * degree 1e8 never buffers its neighborhood in one task: large-star's
  * per-node minimum is a partial-aggregating groupBy, and the
  * subsequent emit is a join keyed on the node, both of which AQE can
  * skew-split.
  *
  * Lineage is truncated per round via [[Checkpoints.truncate]]
  * (executor-local by default; reliable when
  * `spark.graft.checkpoint.reliable` is set — see Checkpoints.scala).
  * Convergence is detected EXACTLY — round output equals round input
  * as an edge set — never by a hashed signature that could collide
  * and stop early on a wrong answer. The check is folded into the
  * round's ONE materializing action: a left join against the previous
  * edge set flags edges not already present, and `Dataset.observe`
  * collects (edge count, new-edge count) during the checkpoint job
  * itself. |next| == |cur| with zero new edges implies set equality
  * (both sides are distinct sets). One action per round instead of
  * three (checkpoint + count + except-isEmpty) matters because on a
  * large cluster iterative wall-time is round-trip-latency-bound:
  * each extra action is a full job barrier per round.
  */
object Components {

  /** Edge count at or below which the remaining star rounds collapse
    * into ONE single-task union-find stage (see the small-tail note in
    * [[connectedComponents]]). Session-overridable — primarily a spec
    * and tuning knob.
    *
    * Reliable-checkpoint caveat (applies to [[SmallTailBytesKey]]
    * too): under `spark.graft.checkpoint.reliable` the `Dataset
    * .observe` metrics these gates read may count each row TWICE
    * (Checkpoints.scala documents the double-compute of the reliable
    * write path), so the effective thresholds HALVE — the collapse
    * fires one round later than the configured value suggests. That
    * is the safe direction (the tail is smaller than measured, never
    * larger), so the observed value is deliberately NOT rescaled;
    * tune the keys ×2 under reliable mode if the exact trip point
    * matters.
    */
  private[graft] val SmallTailKey = "spark.graft.cc.smallTailEdges"
  private[graft] val DefaultSmallTailEdges = 1000000L

  /** Upper bound on the ESTIMATED heap the single-task union-find may
    * hold (hash table + boxed/string keys + its output), independent of
    * the edge-count gate. The count gate alone is key-width-blind: 1 M
    * long-keyed edges is ~150 MB in one task, and string keys can be
    * arbitrarily wider — a small-heap executor could OOM exactly at the
    * gate. Both gates must pass for the tail collapse to fire.
    */
  private[graft] val SmallTailBytesKey = "spark.graft.cc.smallTailMaxBytes"
  private[graft] val DefaultSmallTailMaxBytes = 64L * 1024 * 1024

  private def smallTailEdges(df: DataFrame): Long =
    df.sparkSession.conf
      .get(SmallTailKey, DefaultSmallTailEdges.toString).toLong

  private def smallTailMaxBytes(df: DataFrame): Long =
    df.sparkSession.conf
      .get(SmallTailBytesKey, DefaultSmallTailMaxBytes.toString).toLong

  /** Test-visible, process-wide count of small-tail collapses fired.
    * Specs pin BOTH sides of the gates with it: the coalesce(1) stage
    * must fire below them and must NEVER appear above them — a config
    * typo must not silently single-task a 100 TB CC.
    */
  private[graft] val smallTailFires =
    new java.util.concurrent.atomic.LongAdder

  /** Conservative heap estimate for the one-task union-find over
    * `count` edges: ≤ 2 nodes per edge, each a HashMap entry (~48 B of
    * table + entry overhead) plus its key payload — a boxed numeric
    * (`fixedKeyWidth` > 0) or a String (~48 B header + char storage
    * ≈ 2× the observed UTF-8 bytes, the compact-strings worst case).
    * `keyBytes` is the observed Σ utf8len(src)+utf8len(dst) over the
    * edge set (0 for fixed-width keys).
    */
  private[graft] def smallTailEstBytes(count: Long, keyBytes: Long,
      fixedKeyWidth: Long): Long = {
    val nodes = 2L * count
    val perKey = if (fixedKeyWidth > 0) fixedKeyWidth else 48L
    nodes * (48L + perKey) + 2L * keyBytes
  }

  /** Connected components of the undirected graph given by `edges`
    * (columns `src`, `dst`, any numeric/orderable type). Returns
    * (`node`, `component`) where `component` is the minimum node id
    * reachable from `node`; every node appearing in `edges` (plus all
    * of `allNodes`, if given — isolated nodes have no edges) gets a
    * row. Deterministic: the fixed point is unique.
    */
  def connectedComponents(edges: DataFrame,
      allNodes: Option[DataFrame] = None, maxIter: Int = 50): DataFrame = {
    val spark = edges.sparkSession
    // normalized undirected edge set: (hi, lo), self-loops dropped
    def normalize(e: DataFrame): DataFrame = e
      .filter(col("src") =!= col("dst"))
      .select(greatest(col("src"), col("dst")).as("src"),
        least(col("src"), col("dst")).as("dst"))
      .distinct()

    // Key-width bookkeeping for the byte-aware small-tail gate: string
    // keys have no static width, so their total UTF-8 bytes ride the
    // same observe action as the edge count (free — no extra job).
    val keyIsString = edges.schema("src").dataType ==
      org.apache.spark.sql.types.StringType
    val fixedKeyWidth = if (keyIsString) 0L else 24L // boxed numeric
    def keyBytesMetric: Column =
      if (keyIsString)
        coalesce(sum(octet_length(col("src")) + octet_length(col("dst")))
          .cast("long"), lit(0L)).as("key_bytes")
      else coalesce(sum(lit(0L)), lit(0L)).as("key_bytes")

    val obs0 = Observation()
    var cur = Checkpoints.truncate(
      normalize(edges.select(col("src"), col("dst")))
        .observe(obs0, count(lit(1)).as("edges"), keyBytesMetric))
    var curCount = obs0.get("edges").asInstanceOf[Long]
    var curKeyBytes = obs0.get("key_bytes").asInstanceOf[Long]
    var converged = curCount == 0L // no edges: already a star forest
    var iter = 0
    val tail = smallTailEdges(edges)
    val maxTailBytes = smallTailMaxBytes(edges)
    def starRound(): Unit = {
      val obs = Observation()
      // ONE star round per checkpoint — deliberately. Fusing two
      // rounds into one action was tried (round 10) and REGRESSED
      // ~35%: each star references its input several times (adj
      // union, the min aggregate, the emit join), which is free when
      // that input is a materialized checkpoint but multiplies the
      // whole previous round's recomputation when it is an
      // unmaterialized subplan. The barrier count is already halved
      // the honest way: convergence detection rides this same action.
      val next = Checkpoints.truncate(
        smallStar(largeStar(cur))
          .join(cur.select(col("src"), col("dst"), lit(1).as("in_cur")),
            Seq("src", "dst"), "left")
          .observe(obs, count(lit(1)).as("edges"),
            count(when(col("in_cur").isNull, 1)).as("new_edges"),
            keyBytesMetric)
          .select(col("src"), col("dst")))
      val m = obs.get
      val nextCount = m("edges").asInstanceOf[Long]
      // exact set equality: same cardinality and no edge of next
      // outside cur (both are distinct sets, so that implies equality)
      converged = nextCount == curCount &&
        m("new_edges").asInstanceOf[Long] == 0L
      cur = next
      curCount = nextCount
      curKeyBytes = m("key_bytes").asInstanceOf[Long]
      iter += 1
    }
    while (!converged && iter < maxIter) {
      // SMALL-TAIL FINISH (round 11): on a real graph the edge set
      // shrinks fast, and the last rounds iterate over a tiny
      // remainder — q207's sf1 profile showed ~6 sequential star
      // rounds (two aggregations + two joins + a checkpoint barrier
      // EACH) over ~0.2 M edges, pure scheduling floor. Once the
      // OBSERVED edge count (free — it rode the previous round's
      // checkpoint action) fits one task, collapse every remaining
      // round into a single coalesce(1) + union-find stage computing
      // the exact fixed point in memory. Bounded TWICE: by edge count
      // (`tail`) and by a key-width-aware byte estimate against
      // `smallTailMaxBytes` — a count gate alone is blind to key width
      // (1 M long-keyed edges ≈ 150 MB boxed; strings are unbounded)
      // and could OOM a small-heap executor exactly at the gate. Falls
      // through to star rounds for node types without a total order
      // mapping (never the case for the library's own callers).
      if (curCount <= tail && smallTailEstBytes(curCount, curKeyBytes,
          fixedKeyWidth) <= maxTailBytes) {
        smallTailFinish(cur) match {
          case Some(fin) =>
            smallTailFires.increment()
            cur = Checkpoints.truncate(fin)
            converged = true
          case None => starRound()
        }
      } else starRound()
    }
    require(converged, s"connectedComponents did not converge in $maxIter rounds")
    // converged state is a star forest: every edge is (member, root)
    val labeled = cur.select(col("src").as("node"), col("dst").as("component"))
    val nodes = allNodes.map(_.select(col("node")).distinct()).getOrElse(
      cur.select(col("src").as("node"))
        .union(cur.select(col("dst").as("node"))).distinct())
    nodes.join(labeled, Seq("node"), "left")
      .select(col("node"), coalesce(col("component"), col("node")).as("component"))
  }

  /** A total order on EXTERNAL row values of `dt`, for the small-tail
    * union-find's min-root rule — defined for the orderable key types
    * the library's graphs actually use. None ⇒ the caller must stay on
    * the (type-generic) star rounds.
    */
  private def externalOrdering(
      dt: org.apache.spark.sql.types.DataType): Option[Ordering[Any]] = {
    import org.apache.spark.sql.types._
    dt match {
      case ByteType => Some(Ordering.Byte.on[Any](_.asInstanceOf[Byte]))
      case ShortType => Some(Ordering.Short.on[Any](_.asInstanceOf[Short]))
      case IntegerType => Some(Ordering.Int.on[Any](_.asInstanceOf[Int]))
      case LongType => Some(Ordering.Long.on[Any](_.asInstanceOf[Long]))
      case StringType =>
        // MUST match Spark's own string comparison (UTF8String: unsigned
        // byte-wise over UTF-8, i.e. code-point order), NOT
        // Ordering.String (UTF-16 code-unit order) — the two disagree
        // for supplementary characters vs U+E000..U+FFFF, and the
        // small-tail min-root rule must pick the same root as the
        // least/greatest/min of the star rounds it replaces.
        Some(new Ordering[Any] {
          override def compare(a: Any, b: Any): Int =
            java.util.Arrays.compareUnsigned(
              a.asInstanceOf[String]
                .getBytes(java.nio.charset.StandardCharsets.UTF_8),
              b.asInstanceOf[String]
                .getBytes(java.nio.charset.StandardCharsets.UTF_8))
        })
      case _ => None
    }
  }

  /** The exact star-round fixed point of `cur`, computed in ONE
    * single-task stage: coalesce the (tiny, ≤ smallTailEdges) edge set
    * into one partition and run a path-compressing union-find with the
    * min-ordered root rule. Emits the converged star forest — a (node,
    * min-reachable-root) edge per non-root node — i.e. byte-identical
    * to what continuing the alternating-star rounds to convergence
    * would leave in `cur`, because both compute the components OF the
    * current edge set with min-id labels. None when the node type has
    * no [[externalOrdering]].
    */
  private def smallTailFinish(cur: DataFrame): Option[DataFrame] = {
    val dt = cur.schema("src").dataType
    externalOrdering(dt).map { ord =>
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("src", dt),
        org.apache.spark.sql.types.StructField("dst", dt)))
      implicit val enc: org.apache.spark.sql.Encoder[org.apache.spark.sql.Row] =
        org.apache.spark.sql.Encoders.row(schema)
      cur.select(col("src"), col("dst")).coalesce(1).mapPartitions { it =>
        val parent = new java.util.HashMap[Any, Any]()
        def find(x: Any): Any = {
          if (parent.get(x) == null) parent.put(x, x)
          var r = x
          while (parent.get(r) != r) r = parent.get(r)
          var c = x // path compression
          while (parent.get(c) != r) {
            val nxt = parent.get(c); parent.put(c, r); c = nxt
          }
          r
        }
        it.foreach { row =>
          val ra = find(row.get(0))
          val rb = find(row.get(1))
          if (ra != rb) {
            if (ord.lt(ra, rb)) parent.put(rb, ra)
            else parent.put(ra, rb)
          }
        }
        // Stream the output instead of buffering it: path compression
        // during the scan only UPDATES values of existing keys (every
        // reachable node is already a key), which is not a structural
        // modification, so iterating keySet while find() compresses is
        // safe — and the output never doubles the task's footprint.
        import scala.jdk.CollectionConverters._
        parent.keySet.iterator.asScala.flatMap { node =>
          val root = find(node)
          if (node != root)
            Iterator.single(org.apache.spark.sql.Row(node, root))
          else Iterator.empty
        }
      }
    }
  }

  /** Large-star: every node u links each STRICTLY LARGER neighbor to
    * the minimum of its closed neighborhood. Implemented as
    * groupBy-min + join — never a buffered adjacency list.
    */
  private def largeStar(e: DataFrame): DataFrame = {
    val adj = e.select(col("src").as("u"), col("dst").as("v"))
      .union(e.select(col("dst").as("u"), col("src").as("v")))
    val mins = adj.groupBy(col("u"))
      .agg(min(col("v")).as("mn"))
      .select(col("u"), least(col("u"), col("mn")).as("m"))
    adj.filter(col("v") > col("u"))
      .join(mins, Seq("u"))
      .select(col("v").as("src"), col("m").as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
  }

  /** Small-star: every node u links its not-larger neighbors (and
    * itself) to the minimum among them.
    */
  private def smallStar(e: DataFrame): DataFrame = {
    // normalized input guarantees src > dst, so N≤(u) of u=src is dst
    val mins = e.groupBy(col("src")).agg(min(col("dst")).as("m"))
    val viaNeighbors = e.join(mins, Seq("src"))
      .select(col("dst").as("src"), col("m").as("dst"))
    val self = mins.select(col("src"), col("m").as("dst"))
    viaNeighbors.union(self)
      .filter(col("src") =!= col("dst"))
      .select(greatest(col("src"), col("dst")).as("src"),
        least(col("src"), col("dst")).as("dst"))
      .distinct()
  }

  /** Cluster view for dedup: every node with its component, whether it
    * is the kept representative (the component minimum), and the
    * component size.
    */
  def dedupClusters(edges: DataFrame, allNodes: DataFrame): DataFrame = {
    val cc = connectedComponents(edges, Some(allNodes))
    val sizes = cc.groupBy(col("component"))
      .agg(count(lit(1)).as("component_size"))
    cc.join(sizes, Seq("component"))
      .select(col("node"), col("component"),
        (col("node") === col("component")).cast("long").as("is_rep"),
        col("component_size"))
  }
}
