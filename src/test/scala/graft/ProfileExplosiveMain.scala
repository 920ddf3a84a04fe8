package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev profiling (round-11 task #1): do the remaining explosive joins —
  * LSH band buckets (q35), shingle count-join (q34), grid-tile dense
  * cosine (q95) — suffer the q207 AQE reducer-starvation pattern at
  * sf1, and if so in WHICH stage?
  *
  * Replicates each operator's internals stage by stage with eager
  * localCheckpoint materialization and prints per-stage wall time plus
  * the executed partition count of each materialized stage (the
  * starvation smoking gun: a cheap-bytes/expensive-rows stage coalesced
  * to ~1 task).
  *
  * Usage: runMain graft.ProfileExplosiveMain <dataDir> [shufflePartitions]
  */
object ProfileExplosiveMain {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf1")
    val parts = if (args.length > 1) args(1) else "64"
    val spark = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("explosive-profile")
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

    // ---------------------------------------------------------- q35 LSH
    println("=== q35 minhashLshPairs ===")
    val bands = 32; val rowsPerBand = 4; val k = bands * rowsPerBand
    val sh = mat("sh (shingle+filter)") {
      docs.select(col("doc_id").as("id"),
          graft.plans.ShingleHashes.shingle_hashes(col("text"), 3).as("sh"))
        .filter(size(col("sh")) > 0)
    }
    val banded = mat("banded (minhash sigs + band slices)") {
      sh.withColumn("sig",
          graft.plans.MinhashSignature.minhash_signature(col("sh"), k))
        .select(col("id"),
          posexplode(transform(sequence(lit(0), lit(bands - 1)),
            bd => slice(col("sig"), bd * rowsPerBand + 1, lit(rowsPerBand)))))
        .withColumnRenamed("pos", "band")
        .withColumnRenamed("col", "band_sig")
    }
    val bounded = mat("bounded (bucket-size cap join)") {
      val bucketSizes = banded.groupBy(col("band"), col("band_sig"))
        .agg(count(lit(1)).as("__bs"))
      banded.join(bucketSizes, Seq("band", "band_sig"))
        .filter(col("__bs") <= 10000L).drop("__bs")
    }
    val candidates = mat("candidates (band self-join + distinct)") {
      val ca = bounded.select(col("id").as("id_a"), col("band"),
        col("band_sig"))
      val cb = bounded.select(col("id").as("id_b"), col("band"),
        col("band_sig"))
      ca.join(cb, Seq("band", "band_sig"))
        .filter(col("id_a") < col("id_b"))
        .select("id_a", "id_b").distinct()
    }
    val verified = mat("verify (sets join + array_intersect)") {
      val sets = sh.select(col("id"), col("sh"))
      candidates
        .join(sets.select(col("id").as("id_a"), col("sh").as("sh_a")),
          Seq("id_a"))
        .join(sets.select(col("id").as("id_b"), col("sh").as("sh_b")),
          Seq("id_b"))
        .withColumn("inter",
          size(array_intersect(col("sh_a"), col("sh_b"))).cast("long"))
        .withColumn("jaccard", col("inter").cast("double") /
          (size(col("sh_a")) + size(col("sh_b")) - col("inter")))
        .filter(col("jaccard") >= 0.8)
        .select(col("id_a"), col("id_b"))
    }
    timed("q35 end-to-end (public fn)") {
      println("[prof]   rows=" + graft.operators.Dedup.minhashLshPairs(
        docs, col("doc_id"), col("text"), 3, 0.8).count())
    }
    println(s"[prof] q35 stage rows: cand=${candidates.count()} " +
      s"verified=${verified.count()}")

    // -------------------------------------------------------- q34 ngram
    println("=== q34 ngramJaccardPairs ===")
    val stats = timed("df stats (strategy gate input)") {
      sh.select(explode(col("sh")).as("g"))
        .groupBy(col("g")).agg(count(lit(1)).as("df"))
        .agg(sum(col("df").cast("double") * (col("df").cast("double") - 1))
            .as("cand2"),
          sum(col("df")).as("postings")).head()
    }
    val cand2 = (if (stats.isNullAt(0)) 0.0 else stats.getDouble(0)) / 2
    val postings = if (stats.isNullAt(1)) 0L else stats.getLong(1)
    println(f"[prof] gate: candidates=$cand2%.3g postings=$postings " +
      s"prefix=${cand2 > 64.0 * postings}")
    val inv = mat("inv (explode postings)") {
      sh.select(col("id"), size(col("sh")).cast("long").as("n"),
        explode(col("sh")).as("g"))
    }
    val cjPairs = mat("count-join pairs (shingle self-join + groupBy)") {
      val a = inv.select(col("id").as("id_a"), col("n").as("n_a"), col("g"))
      val b = inv.select(col("id").as("id_b"), col("n").as("n_b"), col("g"))
      a.join(b, Seq("g"))
        .filter(col("id_a") < col("id_b") &&
          col("n_a") >= ceil(col("n_b") * 0.8) &&
          col("n_b") >= ceil(col("n_a") * 0.8))
        .groupBy(col("id_a"), col("id_b"), col("n_a"), col("n_b"))
        .agg(count(lit(1)).as("inter"))
        .withColumn("jaccard", col("inter").cast("double") /
          (col("n_a") + col("n_b") - col("inter")))
        .filter(col("jaccard") >= 0.8)
        .select(col("id_a"), col("id_b"))
    }
    timed("q34 end-to-end (public fn)") {
      println("[prof]   rows=" + graft.operators.Dedup.ngramJaccardPairs(
        docs, col("doc_id"), col("text"), 3, 0.8).count())
    }

    // ------------------------------------------------------- q95 dense
    println("=== q95 sparseCosinePairs (dense grid-tile) ===")
    timed("q95 end-to-end (public fn)") {
      println("[prof]   rows=" + graft.operators.Search.sparseCosinePairs(
        docs, col("doc_id"), col("text"), threshold = 0.9,
        dense = Some(true)).count())
    }

    spark.stop()
  }
}
