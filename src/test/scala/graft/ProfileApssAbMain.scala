package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev A/B (round-13, q95 drift): the shipped collapse-off
  * [[graft.operators.Dedup.cosinePairs]] vs the round-11 tile join
  * (inlined below, verbatim shape), both fed the IDENTICAL inline
  * dense-vector subplan, interleaved in one JVM — isolates the r12
  * rework as the variable. Usage: runMain graft.ProfileApssAbMain <dir>
  */
object ProfileApssAbMain {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf1")
    val spark = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("apss-ab")
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
      println(f"[ab] $label: min=${runs.min}%.2f s " +
        s"(runs=${runs.map(r => f"$r%.2f").mkString(",")})")
      runs.min
    }
    import graft.plans.DotProduct.dot_product
    import org.apache.spark.sql.expressions.Window
    val docs = Tables(spark, dir, "documents")
    val nRel = docs.agg(count(lit(1)).as("n_total"))
    val tf = graft.operators.Explosive.ensureMapParallelism(
        docs.select(col("doc_id"), col("text").as("__text")), col("doc_id"))
      .select(col("doc_id"),
        explode(graft.functions.TextFunctions.tokens(col("__text"))).as("tk"))
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
    def vecs: DataFrame = weighted.join(broadcast(vocabIdx), Seq("tk"))
      .groupBy(col("doc_id"))
      .agg(map_from_entries(
        collect_list(struct(col("idx"), col("w").cast("double")))).as("m"))
      .crossJoin(broadcast(vmax))
      .select(col("doc_id"),
        transform(sequence(lit(0), col("vmax")),
          i => coalesce(element_at(col("m"), i), lit(0.0))).as("v"))

    // round-11 cosinePairs, verbatim shape
    def legacy(emb: DataFrame, threshold: Double, gridSide: Int = 8)
        : DataFrame = {
      val e = emb.select(col("doc_id").as("id"), col("v"))
        .withColumn("norm", sqrt(dot_product(col("v"), col("v"))))
        .withColumn("blk",
          pmod(xxhash64(col("id")), lit(gridSide)).cast("int"))
      val left = e.select(col("id").as("id_l"), col("v").as("v_l"),
          col("norm").as("n_l"), col("blk").as("ti"))
        .withColumn("tj", explode(sequence(col("ti"), lit(gridSide - 1))))
      val right = e.select(col("id").as("id_r"), col("v").as("v_r"),
          col("norm").as("n_r"), col("blk").as("tj"))
        .withColumn("ti", explode(sequence(lit(0), col("tj"))))
      left.join(right, Seq("ti", "tj"))
        .filter(col("ti") < col("tj") || col("id_l") < col("id_r"))
        .withColumn("cosine",
          dot_product(col("v_l"), col("v_r")) / (col("n_l") * col("n_r")))
        .filter(col("cosine") >= threshold)
        .select(least(col("id_l"), col("id_r")).as("id_a"),
          greatest(col("id_l"), col("id_r")).as("id_b"),
          round(col("cosine"), 6).as("cosine"))
    }

    val a = minOf3("A shipped cosinePairs(collapse off) on inline vecs") {
      graft.operators.Dedup.cosinePairs(vecs, col("doc_id"), col("v"),
          threshold = 0.9, collapseDuplicates = false)
        .write.format("noop").mode("overwrite").save()
    }
    val b = minOf3("B r11 legacy tile join on inline vecs") {
      legacy(vecs, 0.9).write.format("noop").mode("overwrite").save()
    }
    val c = minOf3("C shipped q95 end-to-end") {
      SparkEntry.defs.find(_.name == "q95_sparse_cosine").get
        .fn(spark, dir).write.format("noop").mode("overwrite").save()
    }
    val d = minOf3("D shipped sparseCosinePairs, no orderBy") {
      graft.operators.Search.sparseCosinePairs(docs,
          col("doc_id"), col("text"), threshold = 0.9,
          dense = Some(true))
        .write.format("noop").mode("overwrite").save()
    }
    def shipped = graft.operators.Search.sparseCosinePairs(docs,
      col("doc_id"), col("text"), threshold = 0.9, dense = Some(true))
    val e = minOf3("E truncate(shipped).orderBy") {
      graft.operators.Checkpoints.truncate(shipped)
        .orderBy(col("id_a"), col("id_b"))
        .write.format("noop").mode("overwrite").save()
    }
    val gs = Seq(12, 16, 24).map { g =>
      g -> minOf3(s"G$g tile join gridSide=$g on inline vecs (unsorted)") {
        graft.operators.Dedup.cosinePairs(vecs, col("doc_id"), col("v"),
            threshold = 0.9, gridSide = g, collapseDuplicates = false)
          .write.format("noop").mode("overwrite").save()
      }
    }
    println(f"[ab] A=$a%.2f B=$b%.2f C=$c%.2f D=$d%.2f E=$e%.2f " +
      gs.map { case (g, t) => f"G$g=$t%.2f" }.mkString(" "))
    spark.stop()
  }
}
