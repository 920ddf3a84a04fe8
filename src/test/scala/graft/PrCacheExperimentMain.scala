package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Checkpoints.TruncateOps

/** Round-17 experiment: why did persist()-backed static tables slow the
  * q93 loop 4× vs localCheckpoint? Prints the one-iteration inMass plan
  * and timing under (a) localCheckpoint, (b) persist.
  */
object PrCacheExperimentMain {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val o = Tables(spark, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
    val l = Tables(spark, dir, "lineitem").select(col("l_orderkey"), col("l_suppkey"))
    val cs = o.join(l, col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey").cast("long") * 2).as("src"),
        (col("l_suppkey").cast("long") * 2 + 1).as("dst"))
      .distinct()
    val edges = cs.union(cs.select(col("dst").as("src"), col("src").as("dst")))

    def loop(label: String, mk: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame): Unit = {
      val e = mk(edges.repartition(col("src")))
      val outdeg = mk(e.groupBy(col("src")).agg(count(lit(1)).as("outdeg")))
      val nodes = mk(e.select(col("src").as("node"))
        .union(e.select(col("dst").as("node"))).distinct())
      val n = nodes.count()
      var ranks = nodes.select(col("node"), lit(1000000L).as("rank"))
      val t0 = System.nanoTime()
      for (i <- 1 to 3) {
        val inMass = ranks.join(outdeg, col("node") === col("src"))
          .select(col("src"), expr("rank div outdeg").as("c"))
          .join(e, Seq("src"))
          .select(col("dst"), col("c"))
          .groupBy(col("dst")).agg(sum(col("c")).as("in_mass"))
        val next = nodes.join(inMass, col("node") === col("dst"), "left")
          .select(col("node"),
            (lit(7L) + expr("(coalesce(in_mass, 0L) * 85) div 100")).as("rank"))
        if (i == 1) println(s"=== $label iteration plan ===\n" +
          next.queryExecution.executedPlan.toString.take(3500))
        ranks = next.truncated
      }
      println(f"[$label] n=$n loop=${(System.nanoTime() - t0) / 1e9}%.2f s")
      e.unpersist(); outdeg.unpersist(); nodes.unpersist()
    }
    def ckptNoAqe(d: org.apache.spark.sql.DataFrame) = {
      val conf = d.sparkSession.conf
      val prev = conf.get("spark.sql.adaptive.enabled", "true")
      conf.set("spark.sql.adaptive.enabled", "false")
      try d.localCheckpoint() finally
        conf.set("spark.sql.adaptive.enabled", prev)
    }
    loop("checkpoint", _.localCheckpoint())
    loop("ckptNoAqe", ckptNoAqe)
    loop("checkpoint2", _.localCheckpoint())
    loop("ckptNoAqe2", ckptNoAqe)
    spark.stop()
  }
}
