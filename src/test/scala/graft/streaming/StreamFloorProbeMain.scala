package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe (round-13 task: the streaming-drain scheduling floor).
  * Every stateful drain costs ~1.3 s at BOTH sf0.1 and sf1
  * (STREAM_PROVIDER_r12_sf1.txt) — suspicion: micro-batch scheduling,
  * not data volume, floors the drains. This main proves or refutes it
  * on q118's count-min drain by varying ONLY the batch schedule over
  * identical data:
  *
  *   A. q118's exact drain over the SF dir (one file ⇒ one batch) —
  *      the number the bench rows carry;
  *   B. the same rows split into N files, maxFilesPerTrigger=1 ⇒ N
  *      micro-batches — if the floor is per-batch scheduling, wall
  *      grows ~linearly in N here;
  *   C. the same N files, no trigger cap ⇒ one big batch — fewer,
  *      bigger micro-batches; wall should fall back to ~A;
  *   D. the identical aggregation as a plain batch query — the
  *      compute content without any streaming machinery.
  *
  * floor ≈ A − D (per-query startup + one batch schedule), and
  * (B − C)/(N − 1) ≈ the per-batch schedule cost. Throughput scales
  * when the schedule isn't the floor ⇔ C ≈ A ≪ B.
  *
  * Usage: runMain graft.streaming.StreamFloorProbeMain <dataDir> [N]
  */
object StreamFloorProbeMain {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf1")
    val nSplit = if (args.length > 1) args(1).toInt else 16
    val w = 1024
    val spark = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("stream-floor-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def minOf3(label: String)(f: => Unit): Double = {
      f // warm
      val runs = Seq.fill(3) {
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] $label: min=${runs.min}%.2f s " +
        s"(runs=${runs.map(r => f"$r%.2f").mkString(",")})")
      runs.min
    }

    println(s"=== q118 drain floor probe (dir=$dir, N=$nSplit) ===")
    // split the events rows into N files so the file source can be
    // scheduled as N micro-batches or 1, over IDENTICAL data
    val splitDir = s"/tmp/graft_streamprobe_${ProcessHandle.current().pid()}"
    val ev = graft.Tables(spark, dir, "events").select(col("user_id"))
    ev.repartition(nSplit).write.mode("overwrite").parquet(splitDir)
    val schema = spark.read.parquet(splitDir).schema
    println(s"[probe] rows=${spark.read.parquet(splitDir).count()}")

    def drainSplit(maxFiles: Option[Int]): Unit = {
      val rdr0 = spark.readStream.schema(schema)
      val rdr = maxFiles.fold(rdr0)(m =>
        rdr0.option("maxFilesPerTrigger", m.toString))
      EventsStream.drainToLocal(
        graft.operators.FrequencySketch.cmsCells(
          rdr.parquet(splitDir), col("user_id"), w),
        "graft_probe_")
    }

    val a = minOf3("A q118 drain over SF dir (1 file = 1 batch)") {
      EventsStream.streamedCmsCells(spark, dir, w)
    }
    val b = minOf3(s"B split drain, maxFilesPerTrigger=1 ($nSplit batches)") {
      drainSplit(Some(1))
    }
    val c = minOf3(s"C split drain, uncapped (1 batch of $nSplit files)") {
      drainSplit(None)
    }
    val d = minOf3("D identical aggregation as plain batch") {
      graft.operators.FrequencySketch.cmsCells(
          spark.read.parquet(splitDir), col("user_id"), w)
        .write.format("noop").mode("overwrite").save()
    }
    println(f"[probe] startup+1-batch floor ≈ A-D = ${a - d}%.2f s; " +
      f"per-batch schedule ≈ (B-C)/(N-1) = ${(b - c) / (nSplit - 1)}%.3f s; " +
      f"C/A = ${c / a}%.2f (≈1 ⇒ fewer, bigger batches recover throughput)")
    spark.stop()
  }
}
