package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-17 q95 dense-path component breakdown: tf/weights vs vector
  * synthesis vs tile-join pair scoring.
  */
object ApssProfileMain {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.plans.DotProduct.dot_product
    val docs = Tables(spark, dir, "documents")
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(label: String)(f: => Unit): Unit = {
      f; f
      val t = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.min
      println(f"$label: $t%.3f s")
    }
    // replicate the weighted tf pipeline (Search.sparseCosinePairs)
    val toks = docs.select(col("doc_id"),
      explode(split(col("text"), " ")).as("tk")).filter(col("tk") =!= "")
    val tf = toks.groupBy(col("doc_id"), col("tk")).agg(count(lit(1)).as("tf"))
    val dfr = tf.groupBy(col("tk")).agg(count(lit(1)).as("df"))
    val nDocs = docs.count()
    val weighted = tf.join(dfr, Seq("tk"))
      .select(col("doc_id"), col("tk"),
        (col("tf") * (lit(nDocs) - col("df"))).as("w"))
    time("weighted tf")(noop(weighted))
    val terms = weighted.select(col("tk")).distinct().collect()
      .map(_.getString(0)).sorted
    val vlen = terms.length
    println(s"vocab: $vlen")
    import spark.implicits._
    val vocabIdx = terms.zipWithIndex.toSeq.toDF("tk", "idx")
    val vecs = weighted.join(broadcast(vocabIdx), Seq("tk"))
      .groupBy(col("doc_id"))
      .agg(map_from_entries(
        collect_list(struct(col("idx"), col("w").cast("double")))).as("m"))
      .select(col("doc_id"),
        transform(sequence(lit(0), lit(vlen - 1)),
          i => coalesce(element_at(col("m"), i), lit(0.0))).as("v"))
    time("vecs synth")(noop(vecs))
    time("vecs + norm")(noop(vecs
      .withColumn("norm", sqrt(dot_product(col("v"), col("v"))))))
    val g = 8
    val e = vecs.withColumn("norm", sqrt(dot_product(col("v"), col("v"))))
      .withColumn("blk", pmod(xxhash64(col("doc_id")), lit(g)).cast("int"))
    val left = e.select(col("doc_id").as("id_l"), col("v").as("v_l"),
        col("norm").as("n_l"), col("blk").as("ti"))
      .withColumn("tj", explode(sequence(col("ti"), lit(g - 1))))
      .repartition(32, col("ti"), col("tj"))
    time("explode+repart only")(noop(left))
    val right = e.select(col("doc_id").as("id_r"), col("v").as("v_r"),
        col("norm").as("n_r"), col("blk").as("tj"))
      .withColumn("ti", explode(sequence(lit(0), col("tj"))))
      .repartition(32, col("ti"), col("tj"))
    time("full tile join")(noop(left.join(right, Seq("ti", "tj"))
      .filter(col("ti") < col("tj") || col("id_l") < col("id_r"))
      .withColumn("cosine",
        dot_product(col("v_l"), col("v_r")) / (col("n_l") * col("n_r")))
      .filter(col("cosine") >= 0.9)
      .select(col("id_l"), col("id_r"), col("cosine"))))
    spark.stop()
  }
}
