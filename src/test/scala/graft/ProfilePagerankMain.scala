package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev profiling (round-12 task #3): where does q93 PageRank's sf1
  * time go — one-time graph setup (orders⋈lineitem edge build, outdeg
  * annotation, node derivation) or the per-iteration loop (join +
  * combine + left join + localCheckpoint barrier)? The round-11 smoke
  * showed p8→p64 buys only 1.23× at sf1, the q207 barrier-floor
  * signature; this main splits the phases so the fix (fold rounds /
  * lazy tail / accept) targets the real floor.
  *
  * Usage: runMain graft.ProfilePagerankMain <dataDir> [shufflePartitions]
  */
object ProfilePagerankMain {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf1")
    val parts = if (args.length > 1) args(1) else "64"
    val spark = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("pagerank-profile")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    def mat(label: String)(df: DataFrame): DataFrame = {
      val out = timed(label)(df.localCheckpoint())
      println(s"[prof]   $label: rows=${out.count()} " +
        s"parts=${out.rdd.getNumPartitions}")
      out
    }

    println(s"=== q93 pageRank phases (dir=$dir, parts=$parts) ===")
    val o = Tables(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"))
    val l = Tables(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"))
    val csInt = mat("csInt (join + int-pair distinct)") {
      o.join(l, col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("c"), col("l_suppkey").as("sk"))
        .distinct()
    }
    val cs = csInt.select(concat(lit("c"), col("c")).as("src"),
      concat(lit("s"), col("sk")).as("dst"))
    val edges = cs.union(
      cs.select(col("dst").as("src"), col("src").as("dst")))

    val e = mat("e (repartition by src)") {
      edges.select(col("src"), col("dst")).repartition(col("src"))
    }
    val eOut = mat("eOut (outdeg annotate)") {
      e.join(e.groupBy(col("src")).agg(count(lit(1)).as("outdeg")),
        Seq("src"))
    }
    val nodes = mat("nodes (union + distinct)") {
      e.select(col("src").as("node"))
        .union(e.select(col("dst").as("node"))).distinct()
    }
    val n = timed("n (count)")(nodes.count())
    val scale = 1000000000000L
    val init = scale / n
    val teleport = (init * 15L) / 100L

    var ranks = nodes.select(col("node"), lit(init).as("rank"))
    for (i <- 1 to 3) {
      val inMass = ranks
        .join(eOut, col("node") === col("src"))
        .select(col("dst"), expr("rank div outdeg").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("in_mass"))
      ranks = mat(s"iter$i (join+combine+left-join)") {
        nodes.join(inMass, col("node") === col("dst"), "left")
          .select(col("node"),
            (lit(teleport) +
              expr("(coalesce(in_mass, 0L) * 85) div 100")).as("rank"))
      }
    }
    timed("topk (sort+limit consume)") {
      ranks.orderBy(col("rank").desc, col("node")).limit(100)
        .write.format("noop").mode("overwrite").save()
    }
    // contrast: the same three iterations WITHOUT per-round truncation
    // (ranks is referenced exactly once per round, so lineage grows
    // linearly, not exponentially — the one-action variant)
    var ranks2 = nodes.select(col("node"), lit(init).as("rank"))
    timed("3 iters, single action (no per-round truncate)") {
      for (_ <- 1 to 3) {
        val inMass = ranks2
          .join(eOut, col("node") === col("src"))
          .select(col("dst"), expr("rank div outdeg").as("c"))
          .groupBy(col("dst")).agg(sum(col("c")).as("in_mass"))
        ranks2 = nodes.join(inMass, col("node") === col("dst"), "left")
          .select(col("node"),
            (lit(teleport) +
              expr("(coalesce(in_mass, 0L) * 85) div 100")).as("rank"))
      }
      ranks2.orderBy(col("rank").desc, col("node")).limit(100)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
