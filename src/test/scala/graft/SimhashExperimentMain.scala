package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.plans.RollingHash.rolling_hash

/** Round-17 within-JVM A/B: legacy HOF simhash vs simhash_text. */
object SimhashExperimentMain {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import TextFunctions.{bind, shiftRight, shl, tokens}
    def legacySimhash(c: org.apache.spark.sql.Column,
        nBits: Int): org.apache.spark.sql.Column =
      bind(transform(tokens(c), tk => rolling_hash(tk)), hashes => {
        val bits = transform(sequence(lit(0), lit(nBits - 1)), b => {
          val vote = aggregate(hashes, lit(0L), (acc, h) => {
            val mixed = when(b < 30, h)
              .otherwise(pmod(h * 1103515245L + 12345L, lit(1073741789L)))
            val shift = when(b < 30, b).otherwise(pmod(b - 30, lit(30)))
            acc + when(shiftRight(mixed, shift.cast("int"))
              .bitwiseAND(1L) === 1L, 1L).otherwise(-1L)
          })
          when(vote > 0, shl(lit(1L), b.cast("int"))).otherwise(lit(0L))
        })
        aggregate(bits, lit(0L), (acc, x) => acc + x)
      })
    val docs = Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(label: String)(f: => Unit): Unit = {
      f; f
      val t = (1 to 7).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.min
      println(f"$label: $t%.3f s")
    }
    time("legacy HOF simhash")(noop(docs.select(col("doc_id"),
      legacySimhash(col("text"), 32).as("s"))))
    time("simhash_text")(noop(docs.select(col("doc_id"),
      TextFunctions.simhash(col("text"), 32).as("s"))))
    time("legacy HOF simhash #2")(noop(docs.select(col("doc_id"),
      legacySimhash(col("text"), 32).as("s"))))
    time("simhash_text #2")(noop(docs.select(col("doc_id"),
      TextFunctions.simhash(col("text"), 32).as("s"))))
    spark.stop()
  }
}

/** langId projection cost probe. */
object LangIdExperimentMain {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(label: String)(f: => Unit): Unit = {
      f; f
      val t = (1 to 7).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.min
      println(f"$label: $t%.3f s")
    }
    time("langId")(noop(docs.select(col("doc_id"),
      TextFunctions.langId(col("text")).as("l"))))
    spark.stop()
  }
}
