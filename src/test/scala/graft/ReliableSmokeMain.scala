package graft

import org.apache.spark.sql.SparkSession

/** One-off sf1 measurement of the reliable-checkpoint knob's cost
  * (round-11 task): run the iterative scale queries (q207 DBSCAN,
  * q93 PageRank) once with default localCheckpoint truncation and once
  * under `spark.graft.checkpoint.reliable=true` + a checkpoint dir, on
  * the same session, and print wall times plus a partition-order-
  * independent content hash of each result — the hashes MUST match
  * (CheckpointsSpec pins tiny-scale equality; this records the
  * DFS-write cost at 100× so cluster users know the price).
  *
  * Usage: runMain graft.ReliableSmokeMain <dataDir>
  */
object ReliableSmokeMain {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf1")
    val spark = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-reliable-smoke")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // static conf: must be set at session build, not runtime
      .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    def contentHash(df: org.apache.spark.sql.DataFrame): String = {
      val cols = df.columns.sorted.map(c =>
        coalesce(col(c).cast("string"), lit("<null>")))
      val r = df.select(xxhash64(cols: _*).cast("decimal(38,0)").as("h"))
        .agg(sum(col("h")).as("s"), count(lit(1)).as("n")).head()
      s"${r.get(0)}/${r.getLong(1)}"
    }
    val byName = SparkEntry.defs.map(d => d.name -> d).toMap
    val targets = Seq("q207_dbscan", "q93_pagerank")
    targets.foreach(n => byName(n).fn(spark, dir).write
      .format("noop").mode("overwrite").save()) // warm-up
    val rows = targets.map { n =>
      def run(): (String, Double) = {
        val t0 = System.nanoTime()
        val out = byName(n).fn(spark, dir)
        val h = contentHash(out)
        (h, (System.nanoTime() - t0) / 1e9)
      }
      val (hLocal, sLocal) = run()
      val ckDir = java.nio.file.Files
        .createTempDirectory("graft_reliable_ck").toString
      spark.sparkContext.setCheckpointDir(ckDir)
      spark.conf.set(graft.operators.Checkpoints.ReliableKey, "true")
      val (hRel, sRel) = try run()
      finally spark.conf.unset(graft.operators.Checkpoints.ReliableKey)
      val ok = hLocal == hRel
      println(f"[reliable] $n local=$sLocal%.2fs reliable=$sRel%.2fs " +
        f"delta=${sRel - sLocal}%.2fs (${sRel / sLocal}%.2fx) " +
        s"identical=$ok")
      ok
    }
    spark.stop()
    if (rows.contains(false)) sys.exit(1)
  }
}
