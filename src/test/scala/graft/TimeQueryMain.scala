package graft

import org.apache.spark.sql.SparkSession

/** Dev timing for individual registry queries: warm-up once, then
  * min-of-3 wall time through the noop sink — the Bench protocol for
  * one query at an arbitrary SF dir, without the full section run.
  *
  * Usage: Test/runMain graft.TimeQueryMain <dataDir> <substr>[,<substr>…]
  *        [shufflePartitions]
  */
object TimeQueryMain {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: TimeQueryMain <dir> <substrs> [parts]")
    val dir = args(0)
    val subs = args(1).split(",").toSeq
    val parts = if (args.length > 2) args(2) else "32"
    val spark = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("time-query")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.files.maxPartitionBytes", s"${4 * 1024 * 1024}")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val targets = SparkEntry.defs.filter(d =>
      subs.exists(d.name.contains))
    require(targets.nonEmpty, s"no query matches ${args(1)}")
    targets.foreach { d =>
      def once(): Double = {
        val t0 = System.nanoTime()
        d.fn(spark, dir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      once() // warm
      val runs = Seq.fill(3)(once())
      println(f"[time] ${d.name}: min=${runs.min}%.2f s " +
        f"runs=${runs.map(r => f"$r%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
