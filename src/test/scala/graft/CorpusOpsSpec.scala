package graft

import graft.operators.{Dedup, Graph, Vocabulary}
import org.apache.spark.sql.functions._

/** Round-7 operator semantics: OOV-rate vocabulary scoring, incremental
  * (delta) dedup verdicts, fixed-point PageRank invariants, and the
  * partitioned sink's pruning contract (also oracle-anchored by
  * q91/q92/q93/q94).
  */
class CorpusOpsSpec extends SparkSpec {
  import spark.implicits._

  test("oovRate: counts, ppm arithmetic, and empty-doc handling") {
    val docs = Seq(
      (1L, "a a a b"),     // all in vocab(2) = {a, b}
      (2L, "a b c d"),     // 2 of 4 OOV
      (3L, "x y z"),       // all OOV
      (4L, ""),            // no tokens
    ).toDF("doc_id", "text")
    val out = Vocabulary.oovRate(docs, col("doc_id"), col("text"), 2)
      .orderBy("doc_id").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3))).toSeq === Seq(
      (1L, 4L, 0L, 0L),
      (2L, 4L, 2L, 500000L),
      (3L, 3L, 3L, 1000000L),
      (4L, 0L, 0L, 0L)))
  }

  test("oovRate: vocabulary boundary is the (count desc, term asc) cut") {
    // b and c tie on count; with V=2 the vocab is {a, b} (term asc
    // breaks the tie), so c is OOV everywhere it appears
    val docs = Seq((1L, "a a c"), (2L, "a b b c")).toDF("doc_id", "text")
    val out = Vocabulary.oovRate(docs, col("doc_id"), col("text"), 2)
      .orderBy("doc_id").collect()
    assert(out.map(_.getLong(2)).toSeq === Seq(1L, 1L))
  }

  test("incrementalDedup: history, in-batch, and new verdicts") {
    val history = Seq((10L, "k1"), (11L, "k1"), (12L, "k2"))
      .toDF("id", "key")
    val incoming = Seq(
      (20L, "k1"), // dup_of_history -> 10 (history min, not 11)
      (21L, "k3"), // new (first in batch)
      (22L, "k3"), // dup_in_batch -> 21
      (23L, "k4"), // new
    ).toDF("id", "key")
    val out = Dedup.incrementalDedup(history, incoming,
        col("id"), col("key"))
      .orderBy("doc_id").collect()
    assert(out.map(r => (r.getLong(0), r.getString(1))).toSeq === Seq(
      (20L, "dup_of_history"), (21L, "new"),
      (22L, "dup_in_batch"), (23L, "new")))
    assert(out(0).getLong(2) === 10L && out(2).getLong(2) === 21L)
    assert(out(1).isNullAt(2) && out(3).isNullAt(2))
  }

  test("incrementalDedup: a key in both history and batch always " +
      "resolves to the historical representative") {
    val history = Seq((5L, "k")).toDF("id", "key")
    val incoming = Seq((1L, "k"), (2L, "k")).toDF("id", "key")
    val out = Dedup.incrementalDedup(history, incoming,
        col("id"), col("key"))
      .orderBy("doc_id").collect()
    assert(out.forall(_.getString(1) == "dup_of_history"))
    assert(out.forall(_.getLong(2) == 5L))
  }

  test("pageRank: symmetric 2-cycle has equal ranks; mass ~ conserved") {
    val edges = Seq(("a", "b"), ("b", "a")).toDF("src", "dst")
    val out = Graph.pageRank(edges, iters = 3)
      .orderBy("node").collect()
    assert(out.length === 2)
    assert(out(0).getLong(1) === out(1).getLong(1))
    // integer truncation only ever LOSES mass, and at most a few units
    val total = out.map(_.getLong(1)).sum
    assert(total <= 1000000000000L && total > 999999999000L)
  }

  test("pageRank: a star center outranks its leaves") {
    val spokes = (1 to 4).map(i => ("hub", s"leaf$i"))
    val edges = (spokes ++ spokes.map(_.swap)).toDF("src", "dst")
    val ranks = Graph.pageRank(edges, iters = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert((1 to 4).forall(i => ranks("hub") > ranks(s"leaf$i")))
    // leaves are symmetric -> identical ranks
    assert((2 to 4).forall(i => ranks(s"leaf$i") === ranks("leaf1")))
  }

  test("pageRank is partitioning-invariant (exact integer ranks)") {
    val o = Tables(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_custkey")).limit(200)
    val l = Tables(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"))
    val cs = o.join(l, col("o_orderkey") === col("l_orderkey"))
      .select(concat(lit("c"), col("o_custkey")).as("src"),
        concat(lit("s"), col("l_suppkey")).as("dst"))
    val edges = cs.union(cs.select(col("dst").as("src"), col("src").as("dst")))
    val a = Graph.pageRank(edges, 2)
    val b = Graph.pageRank(edges.repartition(17), 2)
    assert(a.exceptAll(b).count() === 0 && b.exceptAll(a).count() === 0)
  }

  test("partitioned sink: reader prunes to the filtered partition") {
    val path = s"/tmp/graft_prune_spec_${ProcessHandle.current().pid()}"
    val docs = Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("lang"), col("n_chars"))
    graft.sources.Sinks.writePartitionedParquet(docs, path, Seq("lang"))
    val rd = spark.read.parquet(path).filter(col("lang") === "en")
      .select(col("doc_id"), col("n_chars"))
    val plan = rd.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*= en\\)".r
      .findFirstIn(plan).isDefined,
      s"expected a pushed partition filter:\n$plan")
    // row parity with a plain filter over the source table
    val want = docs.filter(col("lang") === "en")
      .select(col("doc_id"), col("n_chars"))
    assert(rd.exceptAll(want).count() === 0 &&
      want.exceptAll(rd).count() === 0)
    // pruning is physical: only the lang=en directory's files are read
    val files = rd.queryExecution.executedPlan.collectLeaves()
      .flatMap {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.selectedPartitions.toPartitionArray
            .map(_.filePath.toString).toSeq
        case _ => Nil
      }
    assert(files.nonEmpty && files.forall(_.contains("lang=en")),
      s"scan touched non-pruned files: ${files.take(3).mkString(",")}")
  }
}
