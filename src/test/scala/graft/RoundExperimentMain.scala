package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off expression experiment for the fixed-point exact-sum pattern
  * (CoreQueries.fsum, q03's rev_i): Spark's `round(x, 0)` on a DOUBLE
  * routes every row through java.math.BigDecimal.setScale (see
  * RoundBase.doGenCode), which is allocation-heavy inside the serial
  * scan+partial-agg stage the single-row-group bench tables force.
  * Under fsum's contract (values are fixed-point with <= `digits` true
  * decimals, so x*scale sits within ~1e-4 of an integer) the cheap
  * pure-FP forms floor(x+0.5) and rint(x) are value-identical.
  * Run: Test/runMain graft.RoundExperimentMain
  */
object RoundExperimentMain {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val li = Tables(spark, dir, "lineitem")
    def x = col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 10000.0

    def cur() = li.groupBy(col("l_returnflag"))
      .agg(sum(round(x, 0).cast("long")).as("s"), count(lit(1)).as("n"))
    def fl() = li.groupBy(col("l_returnflag"))
      .agg(sum(floor(x + 0.5).cast("long")).as("s"), count(lit(1)).as("n"))
    def cst() = li.groupBy(col("l_returnflag"))
      .agg(sum((x + 0.5).cast("long")).as("s"), count(lit(1)).as("n"))

    cur().collect(); fl().collect(); cst().collect()
    def time(f: () => org.apache.spark.sql.DataFrame): Double =
      (0 until 5).map { _ =>
        val t0 = System.nanoTime(); f().collect(); (System.nanoTime() - t0) / 1e9
      }.min
    val (tc, tf, tk) = (time(cur _), time(fl _), time(cst _))
    // value equality across ALL SFs matters, not just speed
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val l2 = Tables(spark, s"/root/testdata/$sf", "lineitem")
      def y = col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 10000.0
      val a = l2.agg(sum(round(y, 0).cast("long"))).collect()(0).getLong(0)
      val b = l2.agg(sum(floor(y + 0.5).cast("long"))).collect()(0).getLong(0)
      val c = l2.agg(sum((y + 0.5).cast("long"))).collect()(0).getLong(0)
      val q = l2.agg(sum(round(col("l_quantity") * 1.0, 0).cast("long")))
        .collect()(0).getLong(0)
      val q2 = l2.agg(sum(floor(col("l_quantity") * 1.0 + 0.5).cast("long")))
        .collect()(0).getLong(0)
      println(s"EQ $sf round=$a floor=$b cast=$c eq=${a == b && b == c} " +
        s"qty: $q vs $q2 eq=${q == q2}")
    }
    println(f"TIME round=$tc%.3f floor=$tf%.3f cast=$tk%.3f")
    spark.stop()
  }
}
