package graft

import graft.operators.{Checkpoints, Components, Graph}
import org.apache.spark.sql.functions._

/** Reliable-checkpoint strategy: results are identical to the default
  * executor-local strategy (the knob moves materialized blocks, not
  * semantics), and a misconfigured knob fails fast.
  */
class CheckpointsSpec extends SparkSpec {
  import spark.implicits._

  private def withReliable[A](body: => A): A = {
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    val hadCkpt = spark.sparkContext.getCheckpointDir
    spark.sparkContext.setCheckpointDir(dir)
    spark.conf.set(Checkpoints.ReliableKey, "true")
    try body
    finally {
      spark.conf.unset(Checkpoints.ReliableKey)
      // SparkContext has no unset; leave dir in place (temp) but make
      // the default path explicit again for later suites
      hadCkpt.foreach(spark.sparkContext.setCheckpointDir)
    }
  }

  test("connectedComponents identical under reliable checkpointing") {
    val rnd = new scala.util.Random(7)
    val edges = Seq.fill(400)((rnd.nextInt(200).toLong, rnd.nextInt(200).toLong))
    val e = edges.toDF("src", "dst")
    val nodes = (0L until 200L).toDF("node")
    val base = Components.connectedComponents(e, Some(nodes))
      .as[(Long, Long)].collect().sorted.toSeq
    val rel = withReliable {
      assert(Checkpoints.reliable(e))
      Components.connectedComponents(e, Some(nodes))
        .as[(Long, Long)].collect().sorted.toSeq
    }
    assert(rel == base)
  }

  test("pageRank identical under reliable checkpointing") {
    val e = Seq((0L, 1L), (1L, 2L), (2L, 0L), (2L, 3L), (3L, 0L), (4L, 0L))
      .toDF("src", "dst")
    def run() = Graph.pageRank(e, iters = 3)
      .orderBy("node").collect().map(_.toSeq).toSeq
    val base = run()
    val rel = withReliable { run() }
    assert(rel == base)
  }

  test("reliable=true without a checkpoint dir fails fast") {
    val df = Seq((1L, 2L)).toDF("src", "dst")
    // only meaningful when no checkpoint dir is set yet
    if (spark.sparkContext.getCheckpointDir.isEmpty) {
      spark.conf.set(Checkpoints.ReliableKey, "true")
      try {
        intercept[IllegalArgumentException] { Checkpoints.truncate(df) }
      } finally spark.conf.unset(Checkpoints.ReliableKey)
    }
  }
}
