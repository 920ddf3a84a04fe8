package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev profiling (round 12): where does q36 simhashPairs' sf1 time go —
  * signature computation, the pigeonhole chunk join's candidate
  * volume, or the verify? Prints per-stage wall plus the candidate
  * count and the top bucket sizes (sf1 replicates documents ~10×, so
  * identical signatures make buckets quadratic in the copy count).
  *
  * Usage: Test/runMain graft.ProfileSimhashMain <dataDir> [parts]
  */
object ProfileSimhashMain {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf1")
    val parts = if (args.length > 1) args(1) else "32"
    val spark = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("simhash-profile")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    def mat(label: String)(df: DataFrame): DataFrame = {
      val out = timed(label)(df.localCheckpoint())
      println(s"[prof]   $label: rows=${out.count()} " +
        s"parts=${out.rdd.getNumPartitions}")
      out
    }
    val docs = Tables(spark, dir, "documents")
    val chunks = 4; val chunkBits = 8
    val sig = mat("sig (tokenize + simhash)") {
      graft.operators.Explosive.ensureMapParallelism(
          docs.select(col("doc_id").as("id"), col("text").as("__text")),
          col("id"))
        .select(col("id"),
          graft.functions.TextFunctions.simhash(col("__text"), 32).as("sig"))
    }
    val blocked = mat("blocked (chunk explode)") {
      sig.select(col("id"), col("sig"),
        posexplode(transform(sequence(lit(0), lit(chunks - 1)), ch =>
          graft.functions.TextFunctions.shiftRight(col("sig"),
              (ch * chunkBits).cast("int"))
            .bitwiseAND((1L << chunkBits) - 1))))
        .withColumnRenamed("pos", "chunk")
        .withColumnRenamed("col", "chunk_val")
    }
    timed("bucket stats") {
      blocked.groupBy(col("chunk"), col("chunk_val"))
        .agg(count(lit(1)).as("n"))
        .agg(sum(col("n")).as("rows"), sum(col("n") * col("n")).as("cand"),
          max(col("n")).as("max_bucket"))
        .show(false)
    }
    val ba = blocked.select(col("id").as("id_a"), col("sig").as("sig_a"),
      col("chunk"), col("chunk_val"))
    val bb = blocked.select(col("id").as("id_b"), col("sig").as("sig_b"),
      col("chunk"), col("chunk_val"))
    val cand = mat("join+verify (pre-distinct)") {
      ba.join(bb, Seq("chunk", "chunk_val"))
        .filter(col("id_a") < col("id_b"))
        .withColumn("hamming",
          bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).cast("long"))
        .filter(col("hamming") <= 3)
        .select("id_a", "id_b", "hamming")
    }
    timed("distinct (survivors)") {
      println("[prof]   survivors distinct=" + cand.distinct().count())
    }
    spark.stop()
  }
}
