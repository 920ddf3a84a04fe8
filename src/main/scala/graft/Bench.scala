package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times the headline queries on SPARK_GRAFT_SF_DIR and
  * prints one JSON line. Results are forced through the `noop` sink so the
  * full plan executes (a bare .count() would let Catalyst prune the
  * projection away).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      // one small file per scan split (binaryFile HTML pages fan out
      // across cores without a repartition shuffle); the SF-scale
      // parquet tables are below this bound either way
      .config("spark.sql.files.maxPartitionBytes", s"${4 * 1024 * 1024}")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def runOnce(d: QueryDef): Double = {
      val t0 = System.nanoTime()
      try d.fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => return -1.0 }
      (System.nanoTime() - t0) / 1e9
    }

    val targets = SparkEntry.headline
    // warm-up pass over EVERY query: JIT + codegen + parquet footer
    // caches, and one-time fixture materialization (q24's synthetic
    // pages) all land outside the timed region
    targets.foreach(runOnce)
    // min of 3 runs — strips one-off JIT/compile noise and reduces the
    // ±20% machine-load variance a single sample carries
    val results = targets.map { d =>
      val runs = Seq.fill(3)(runOnce(d))
      d.name -> (if (runs.exists(_ < 0)) -1.0 else runs.min)
    }
    val qs = results
      .map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(
      f"""{"metric":"headline_total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
