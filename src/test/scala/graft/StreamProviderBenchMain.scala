package graft

import org.apache.spark.sql.SparkSession

/** One-off latency probe for the streaming state-provider swap
  * (round-11 task): drain every stateful streaming query once under
  * the default heap provider and once under RocksDB, warm-up + min of
  * 2, and print per-query seconds. RocksDbStateSpec already pins
  * result EQUALITY; this records what the swap costs in wall time so
  * the "RocksDB is the deployment provider" advice ships with a
  * number. Usage: runMain graft.StreamProviderBenchMain <dataDir>
  */
object StreamProviderBenchMain {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-stream-provider-bench")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val rocks = "org.apache.spark.sql.execution.streaming.state." +
      "RocksDBStateStoreProvider"
    val targets = Seq("q118_stream_count_min", "q142_stream_hll",
      "q149_stream_expectations", "q156_stream_topk", "q169_stream_decay",
      "q227_stream_upsert_snapshot")
    val byName = SparkEntry.queries
    def drain(name: String): Double = {
      val t0 = System.nanoTime()
      byName(name)(spark, dir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    targets.foreach(drain) // warm-up (heap)
    val heap = targets.map(n => n -> Seq.fill(2)(drain(n)).min).toMap
    spark.conf.set(providerKey, rocks)
    try {
      targets.foreach(drain) // warm-up (rocksdb)
      val rdb = targets.map(n => n -> Seq.fill(2)(drain(n)).min).toMap
      targets.foreach { n =>
        println(f"[stream-provider] $n heap=${heap(n)}%.2fs " +
          f"rocksdb=${rdb(n)}%.2fs (${rdb(n) / heap(n)}%.2fx)")
      }
      println(f"[stream-provider] TOTAL heap=${heap.values.sum}%.2fs " +
        f"rocksdb=${rdb.values.sum}%.2fs " +
        f"(${rdb.values.sum / heap.values.sum}%.2fx)")
    } finally spark.conf.unset(providerKey)
    spark.stop()
  }
}
