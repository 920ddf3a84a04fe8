package graft

import org.apache.spark.sql.SparkSession

/** Dev profiling: repeatability of [[BenchGates.barrierCalibMs]] — the
  * round-14 barrier-shaped calibration probe must itself be far less
  * noisy than the comparability gate it feeds, or the flag reads host
  * noise as host state. Prints one probe reading per invocation (what
  * BenchSf1 actually takes, in a fresh JVM) plus optional extra reps.
  *
  * Usage: runMain graft.ProfileBarrierMain [reps]
  */
object ProfileBarrierMain {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master(s"local[$cpus]")
      .appName("barrier-probe-profile")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (i <- 1 to reps) {
      val ms = BenchGates.barrierCalibMs(spark)
      println(s"[prof] barrierCalibMs rep $i: $ms ms (loadavg ${BenchGates.loadavg()})")
    }
    spark.stop()
  }
}
