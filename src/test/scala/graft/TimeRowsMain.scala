package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev utility: warm + min-of-3 timing of individual registry rows
  * under the EXACT BenchSf1 session shape (32 shuffle partitions,
  * 4 MB splits — rows like q34 read ~70% slower under default 128 MB
  * splits, the known split-starvation class, so ad-hoc timings MUST
  * match the bench config to be comparable). Not a gated artifact —
  * no contamination gates; use BenchSf1 for numbers that land in
  * BENCH_SF1*.json.
  *
  * Usage: Test/runMain graft.TimeRows <dataDir> <query> [query...]
  */
object TimeRows {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf1")
    val spark = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("time-rows")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.files.maxPartitionBytes", s"${4 * 1024 * 1024}")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val byName = SparkEntry.defs.map(d => d.name -> d).toMap
    for (name <- args.drop(1)) {
      val d = byName(name)
      d.fn(spark, dir).write.format("noop").mode("overwrite").save() // warm
      val runs = Seq.fill(3) {
        val t0 = System.nanoTime()
        d.fn(spark, dir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[time] $name min=${runs.min}%.2f runs=${runs.map(r => f"$r%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
