package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-17: re-adjudicate the round-10 "no pin below the gate"
  * decision for q207's radius join at sf0.1 — the unpinned verify now
  * runs as one 515 ms task (AQE coalesced), which is exactly the
  * starvation the pin exists to stop.
  */
object DbscanPinExperimentMain {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.functions.PortableHash
    def q207() = {
      val pts = Tables(spark, dir, "customer")
        .select(col("c_custkey").as("uid"),
          pmod(PortableHash.hash32(col("c_custkey")), lit(1000L)).as("x"),
          pmod(PortableHash.hash32(col("c_custkey") * 31 + 7),
            lit(1000L)).as("y"))
      graft.operators.Spatial.dbscan(pts, col("uid"), col("x"),
        col("y"), r = 25L, minPts = 5L).orderBy(col("pid"))
    }
    def noop() = q207().write.format("noop").mode("overwrite").save()
    def time(label: String): Unit = {
      noop(); noop()
      val t = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); noop(); (System.nanoTime() - t0) / 1e9
      }.min
      println(f"$label: $t%.3f s")
    }
    time("default gate (unpinned)")
    val hash = q207().orderBy("pid").collect().map(_.toString).mkString.hashCode
    spark.conf.set(graft.operators.Explosive.PinRowsKey, "1000")
    time("forced pin")
    val hash2 = q207().orderBy("pid").collect().map(_.toString).mkString.hashCode
    println(s"hashes equal: ${hash == hash2}")
    spark.stop()
  }
}
