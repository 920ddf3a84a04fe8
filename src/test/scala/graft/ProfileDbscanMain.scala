package graft

import graft.functions.PortableHash
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev profiling: where does q207 (DBSCAN) spend its time at sf1?
  * Usage: runMain graft.ProfileDbscanMain <dataDir> [shufflePartitions]
  */
object ProfileDbscanMain {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf1")
    val parts = if (args.length > 1) args(1) else "64"
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("dbscan-profile")
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
    val pts = Tables(spark, dir, "customer")
      .select(col("c_custkey").as("pid"),
        pmod(PortableHash.hash32(col("c_custkey")), lit(1000L)).cast("long").as("px"),
        pmod(PortableHash.hash32(col("c_custkey") * 31 + 7), lit(1000L)).cast("long").as("py"))
    val pairs = timed("radiusPairs materialize") {
      graft.operators.Spatial.radiusPairs(pts, col("pid"), col("px"),
        col("py"), 25L).localCheckpoint()
    }
    println(s"[prof] pairs = ${pairs.count()}")
    val sym = pairs.select(col("id_a").as("a"), col("id_b").as("b"))
      .unionByName(pairs.select(col("id_b").as("a"), col("id_a").as("b")))
    val nbCount = timed("nbCount") {
      sym.groupBy(col("a").as("pid")).agg(count(lit(1)).as("nb"))
        .localCheckpoint()
    }
    val roles = pts.join(nbCount, Seq("pid"), "left")
      .select(col("pid"), (coalesce(col("nb"), lit(0L)) + 1 >= 5L).as("is_core"))
      .localCheckpoint()
    val core = roles.filter(col("is_core")).select(col("pid"))
    println(s"[prof] cores = ${core.count()} of ${roles.count()}")
    val coreEdges = timed("coreEdges materialize") {
      sym.join(core.select(col("pid").as("a")), Seq("a"), "left_semi")
        .join(core.select(col("pid").as("b")), Seq("b"), "left_semi")
        .select(col("a").as("src"), col("b").as("dst"))
        .localCheckpoint()
    }
    println(s"[prof] coreEdges = ${coreEdges.count()}")
    val cc = timed("connectedComponents") {
      graft.operators.Components.connectedComponents(coreEdges,
        Some(core.select(col("pid").as("node"))))
    }
    println(s"[prof] components rows = ${cc.count()}")
    val full = timed("full dbscan") {
      graft.operators.Spatial.dbscan(pts, col("pid"), col("px"),
        col("py"), r = 25L, minPts = 5L).count()
    }
    println(s"[prof] full rows = $full")
    spark.stop()
  }
}
