package graft

import graft.functions.PortableHash
import graft.operators.Checkpoints.TruncateOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev profiling: where does q207 (DBSCAN) spend its time at sf1?
  * Round-14 rewrite: phase-splits the SHIPPED path (r11's adaptive
  * exchange pins, r12's edge contraction) instead of the r9 pre-
  * contraction shape — candidate generation, exact verify, pair
  * checkpoint, neighbor counts, contraction, components, border
  * resolution, and the presentation sort, each timed separately with
  * the BenchSf1 session shape.
  *
  * Usage: runMain graft.ProfileDbscanMain <dataDir> [shufflePartitions]
  */
object ProfileDbscanMain {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf1")
    val parts = if (args.length > 1) args(1) else "32"
    val spark = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("dbscan-profile")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.files.maxPartitionBytes", s"${4 * 1024 * 1024}")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    def timed3(label: String)(f: => Unit): Unit = {
      f // warm
      val runs = Seq.fill(3) {
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[prof] $label: min=${runs.min}%.2f s " +
        s"(runs=${runs.map(r => f"$r%.2f").mkString(",")})")
    }
    val r = 25L
    val minPts = 5L
    val pts = Tables(spark, dir, "customer")
      .select(col("c_custkey").as("pid"),
        pmod(PortableHash.hash32(col("c_custkey")), lit(1000L)).cast("long").as("px"),
        pmod(PortableHash.hash32(col("c_custkey") * 31 + 7), lit(1000L)).cast("long").as("py"))
    println(s"[prof] points = ${pts.count()}  (loadavg ${BenchGates.loadavg()})")

    // -- phase A: the explosive cell join ------------------------------
    val pairsFull = graft.operators.Spatial.radiusPairsFull(
      pts, col("pid"), col("px"), col("py"), r)
    timed3("A1 verified pairs count-only (candidate join + dist verify)") {
      pairsFull.count(): Unit
    }
    val pairsC = timed("A2 pairsC truncate (checkpoint the pair set)") {
      pairsFull.truncated
    }
    println(s"[prof] pairs = ${pairsC.count()}")

    // -- phase B: neighbor counts + roles ------------------------------
    val pairs = pairsC.select(col("id_a"), col("id_b"))
    val sym = pairs.select(col("id_a").as("a"), col("id_b").as("b"))
      .unionByName(pairs.select(col("id_b").as("a"), col("id_a").as("b")))
    val roles = timed("B roles truncate (sym groupBy + left join)") {
      val nbCount = sym.groupBy(col("a").as("pid"))
        .agg(count(lit(1)).as("nb"))
      pts.join(nbCount, Seq("pid"), "left")
        .select(col("pid"),
          (coalesce(col("nb"), lit(0L)) + 1 >= minPts).as("is_core"))
        .truncated
    }
    val core = roles.filter(col("is_core")).select(col("pid"))
    println(s"[prof] cores = ${core.count()} of ${roles.count()}")

    // -- phase C: edge contraction (shipped large-pairs path) ----------
    val s2 = { var s = 1L; while (2L * s * s <= r * r) s += 1; s }
    def cellCol(c: org.apache.spark.sql.Column) =
      ((c - pmod(c, lit(s2))) / s2).cast("long")
    val coreEdges = timed("C coreEdges contraction (semi joins + cell group-bys)") {
      val corePairs = pairsC
        .join(core.select(col("pid").as("id_a")), Seq("id_a"), "left_semi")
        .join(core.select(col("pid").as("id_b")), Seq("id_b"), "left_semi")
        .select(col("id_a"), col("id_b"),
          cellCol(col("xa")).as("qxa"), cellCol(col("ya")).as("qya"),
          cellCol(col("xb")).as("qxb"), cellCol(col("yb")).as("qyb"))
      val cross = corePairs
        .filter(col("qxa") =!= col("qxb") || col("qya") =!= col("qyb"))
        .groupBy(col("qxa"), col("qya"), col("qxb"), col("qyb"))
        .agg(min(struct(col("id_a"), col("id_b"))).as("e"))
        .select(col("e.id_a").as("src"), col("e.id_b").as("dst"))
      val coreCells = pts
        .filter(col("px").isNotNull && col("py").isNotNull)
        .join(core, Seq("pid"), "left_semi")
        .select(col("pid"), cellCol(col("px")).as("qx"),
          cellCol(col("py")).as("qy"))
      val stars = coreCells
        .join(coreCells.groupBy(col("qx"), col("qy"))
          .agg(min(col("pid")).as("rep")), Seq("qx", "qy"))
        .filter(col("pid") =!= col("rep"))
        .select(col("pid").as("src"), col("rep").as("dst"))
      stars.unionByName(cross).truncated
    }
    println(s"[prof] coreEdges = ${coreEdges.count()}")

    // -- phase D: components -------------------------------------------
    val clusters = timed("D connectedComponents") {
      graft.operators.Components.connectedComponents(coreEdges,
          Some(core.select(col("pid").as("node"))))
        .select(col("node").as("pid"), col("component").as("cluster"))
    }
    println(s"[prof] clusters rows = ${clusters.count()}")

    // -- phase E: border resolution + final assembly (no sort) ---------
    timed3("E border min-agg + final joins (count-only)") {
      val borderCluster = sym
        .join(core.select(col("pid").as("b")), Seq("b"), "left_semi")
        .join(clusters.select(col("pid").as("b"), col("cluster")), Seq("b"))
        .groupBy(col("a").as("pid"))
        .agg(min(col("cluster")).as("b_cluster"))
      roles.join(clusters, Seq("pid"), "left")
        .join(borderCluster, Seq("pid"), "left")
        .select(col("pid"),
          when(col("is_core"), lit("core"))
            .when(col("b_cluster").isNotNull, lit("border"))
            .otherwise(lit("noise")).as("role"),
          when(col("is_core"), col("cluster"))
            .otherwise(col("b_cluster")).as("cluster"))
        .count(): Unit
    }

    // -- phase F: the shipped graded query, sort variants ---------------
    def dbscanDf() = graft.operators.Spatial.dbscan(pts, col("pid"),
      col("px"), col("py"), r, minPts)
    timed3("F1 shipped q207 (dbscan + orderBy, noop sink)") {
      dbscanDf().orderBy(col("pid"))
        .write.format("noop").mode("overwrite").save()
    }
    timed3("F2 dbscan without orderBy (noop sink)") {
      dbscanDf().write.format("noop").mode("overwrite").save()
    }
    timed3("F3 dbscan truncate-then-orderBy (noop sink)") {
      dbscanDf().truncated.orderBy(col("pid"))
        .write.format("noop").mode("overwrite").save()
    }
    println(s"[prof] done (loadavg ${BenchGates.loadavg()})")
    spark.stop()
  }
}
