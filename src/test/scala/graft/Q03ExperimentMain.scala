package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off plan experiment for q03: join-then-agg (current) vs
  * pre-aggregate lineitem per orderkey before the fact-fact join.
  * Run: SPARK_GRAFT_SF_DIR=... Test/runMain graft.Q03ExperimentMain
  */
object Q03ExperimentMain {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def current() = {
      val li = Tables(spark, dir, "lineitem")
      val o = Tables(spark, dir, "orders")
      val c = Tables(spark, dir, "customer")
      val n = Tables(spark, dir, "nation")
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg((sum(round(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
            * 10000.0, 0).cast("long")).cast("double") / 10000.0)
          .as("revenue"), count(lit(1)).as("n_items"))
        .orderBy(col("n_name"))
    }
    def preagg() = {
      val li = Tables(spark, dir, "lineitem")
      val o = Tables(spark, dir, "orders")
      val c = Tables(spark, dir, "customer")
      val n = Tables(spark, dir, "nation")
      val perOrder = li.groupBy(col("l_orderkey"))
        .agg(sum(round(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
            * 10000.0, 0).cast("long")).as("rev_i"),
          count(lit(1)).as("items"))
      perOrder.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg((sum(col("rev_i")).cast("double") / 10000.0).as("revenue"),
          sum(col("items")).as("n_items"))
        .orderBy(col("n_name"))
    }
    // warm both
    current().collect(); preagg().collect()
    def time(f: () => org.apache.spark.sql.DataFrame): Double = {
      (0 until 3).map { _ =>
        val t0 = System.nanoTime(); f().collect(); (System.nanoTime() - t0) / 1e9
      }.min
    }
    val tCur = time(current _)
    val tPre = time(preagg _)
    val same = current().collect().map(_.toString).toSeq ==
      preagg().collect().map(_.toString).toSeq
    println(f"RESULT current=$tCur%.3f preagg=$tPre%.3f same=$same")
    spark.stop()
  }
}
