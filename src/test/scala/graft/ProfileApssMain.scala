package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev profiling (round-13 task: q95's sf1 drift, 10.8 → ~13.6 s).
  * q95's corpus vocabulary fits the dense gate, so APSS runs
  * [[graft.operators.Search]]'s densePairs: per-doc vocab-wide vector
  * densify (tf join + groupBy + map_from_entries + transform) feeding
  * [[graft.operators.Dedup.cosinePairs]] with collapseDuplicates=false
  * — whose triangular tile join references its input TWICE (left and
  * right roles). With the collapse ON that input is a truncated
  * (localCheckpoint) distinct-vector table; with it OFF the raw
  * densify subplan is inlined per reference. This main prices the
  * phases so the fix targets the real term:
  *   A. densify alone (noop write)
  *   B. tile join over a PRE-MATERIALIZED vector table
  *   C. the shipped q95 end-to-end
  * If C ≈ 2A + B, the collapse-off path should truncate its input
  * once instead of re-densifying per side.
  *
  * Usage: runMain graft.ProfileApssMain <dataDir>
  */
object ProfileApssMain {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf1")
    val spark = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("apss-profile")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes", s"${4 * 1024 * 1024}")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def minOf3(label: String)(f: => Unit): Double = {
      f
      val runs = Seq.fill(3) {
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[prof] $label: min=${runs.min}%.2f s " +
        s"(runs=${runs.map(r => f"$r%.2f").mkString(",")})")
      runs.min
    }
    import org.apache.spark.sql.expressions.Window
    val docs = Tables(spark, dir, "documents")
    // replicate Search.apssPairs' dense prelude exactly (tf/df/weights)
    val nRel = docs.agg(count(lit(1)).as("n_total"))
    val tf = docs.select(col("doc_id"),
        explode(graft.functions.TextFunctions.tokens(col("text"))).as("tk"))
      .filter(col("tk") =!= "")
      .groupBy(col("doc_id"), col("tk")).agg(count(lit(1)).as("tf"))
    val dfRel = tf.groupBy(col("tk")).agg(count(lit(1)).as("df"))
    val weighted = tf.join(broadcast(dfRel), Seq("tk"))
      .crossJoin(broadcast(nRel))
      .select(col("doc_id"), col("tk"),
        (col("tf") * (col("n_total") - col("df"))).as("w"), col("df"))
    val vocabIdx = weighted.select(col("tk")).distinct()
      .withColumn("idx",
        (row_number().over(Window.partitionBy(lit(0))
          .orderBy(col("tk"))) - 1).cast("int"))
    val vmax = vocabIdx.agg(max(col("idx")).as("vmax"))
    def vecs = weighted.join(broadcast(vocabIdx), Seq("tk"))
      .groupBy(col("doc_id"))
      .agg(map_from_entries(
        collect_list(struct(col("idx"), col("w").cast("double")))).as("m"))
      .crossJoin(broadcast(vmax))
      .select(col("doc_id"),
        transform(sequence(lit(0), col("vmax")),
          i => coalesce(element_at(col("m"), i), lit(0.0))).as("v"))
    println(s"[prof] docs=${docs.count()} vocab=${vocabIdx.count()}")
    val a = minOf3("A densify alone (noop)") {
      vecs.write.format("noop").mode("overwrite").save()
    }
    val mat = vecs.localCheckpoint()
    println(s"[prof] materialized vecs rows=${mat.count()}")
    val b = minOf3("B tile join over pre-materialized vecs (collapse off)") {
      graft.operators.Dedup.cosinePairs(mat, col("doc_id"), col("v"),
          threshold = 0.5, collapseDuplicates = false)
        .write.format("noop").mode("overwrite").save()
    }
    val c = minOf3("C shipped q95 end-to-end") {
      SparkEntry.defs.find(_.name == "q95_sparse_cosine").get
        .fn(spark, dir).write.format("noop").mode("overwrite").save()
    }
    println(f"[prof] A=$a%.2f B=$b%.2f C=$c%.2f  (2A+B=${2 * a + b}%.2f)")
    spark.stop()
  }
}
