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
    // historical note: the r12 pre-fix DOCUMENT-level join measured
    // here generated 1.99B candidates / 193M survivors at sf1 and
    // OOM'd the survivor distinct — that measurement motivated the
    // shipped sig-level rewrite, profiled below.
    val groups = mat("groups (distinct signatures)") {
      sig.select(col("sig")).distinct()
    }
    val gBlocked = groups.select(col("sig"),
      posexplode(transform(sequence(lit(0), lit(chunks - 1)), ch =>
        graft.functions.TextFunctions.shiftRight(col("sig"),
            (ch * chunkBits).cast("int"))
          .bitwiseAND((1L << chunkBits) - 1))))
      .withColumnRenamed("pos", "chunk")
      .withColumnRenamed("col", "chunk_val")
    val ga = gBlocked.select(col("sig").as("sig_a"), col("chunk"),
      col("chunk_val"))
    val gb = gBlocked.select(col("sig").as("sig_b"), col("chunk"),
      col("chunk_val"))
    val sigPairs = mat("sig-level join+verify+distinct") {
      ga.join(gb, Seq("chunk", "chunk_val"))
        .filter(col("sig_a") < col("sig_b"))
        .withColumn("hamming",
          bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).cast("long"))
        .filter(col("hamming") <= 3)
        .select("sig_a", "sig_b", "hamming").distinct()
    }
    timed("member expansion (output-sized)") {
      val cross = sigPairs
        .join(sig.select(col("sig").as("sig_a"), col("id").as("ia")),
          Seq("sig_a"))
        .join(sig.select(col("sig").as("sig_b"), col("id").as("ib")),
          Seq("sig_b"))
      val same = sig.select(col("sig"), col("id").as("ia"))
        .join(sig.select(col("sig"), col("id").as("ib")), Seq("sig"))
        .filter(col("ia") < col("ib"))
      println("[prof]   expanded pairs=" +
        (cross.count() + same.count()))
    }
    spark.stop()
  }
}
