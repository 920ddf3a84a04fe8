package graft

import graft.functions.Pii
import graft.operators.{Dedup, Scale, Search}
import org.apache.spark.sql.functions._

/** Unit behavior of the round-5 pipeline operators: chunk dedup, PII
  * redaction, deterministic weighted sampling, inverted-index search.
  */
class PipelineOpsSpec extends SparkSpec {
  import spark.implicits._

  test("chunkDedup keeps first occurrence and reassembles in order") {
    // doc 1: chunks [a b, c d]; doc 2 repeats chunk "a b" then adds "e f"
    val docs = Seq(
      (1L, "a b c d"),
      (2L, "a b e f"),
      (3L, "c d a b")).toDF("doc_id", "text")
    val got = Dedup.chunkDedup(docs, col("doc_id"), col("text"), chunkWords = 2)
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(got === Seq(
      (1L, 2L, 2L, "a b c d"),
      (2L, 2L, 1L, "e f"),
      (3L, 2L, 0L, "")))
  }

  test("chunkDedup dedups repeats WITHIN one document") {
    val docs = Seq((7L, "x y x y z w")).toDF("doc_id", "text")
    val got = Dedup.chunkDedup(docs, col("doc_id"), col("text"), chunkWords = 2)
      .as[(Long, Long, Long, String)].collect().head
    assert(got === ((7L, 3L, 2L, "x y z w")))
  }

  test("chunkDedup ragged tail chunk is its own unit") {
    val docs = Seq((1L, "a b c"), (2L, "c")).toDF("doc_id", "text")
    val got = Dedup.chunkDedup(docs, col("doc_id"), col("text"), chunkWords = 2)
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    // doc 1 → ["a b", "c"]; doc 2's lone chunk "c" is a duplicate
    assert(got === Seq((1L, 2L, 2L, "a b c"), (2L, 1L, 0L, "")))
  }

  test("spanDedup removes straddling duplicate spans, keeps first") {
    // doc 2 repeats doc 1's tokens 1..4 ("b c d e") as a window of 4;
    // with windowTokens = 4 the duplicated span is token-removed even
    // though it would straddle a fixed-chunk boundary
    val docs = Seq(
      (1L, "a b c d e f"),
      (2L, "x b c d e y"),
      (3L, "p q r")).toDF("doc_id", "text")
    val got = Dedup.spanDedup(docs, col("doc_id"), col("text"), windowTokens = 4)
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(got === Seq(
      (1L, 6L, 6L, "a b c d e f"),
      (2L, 6L, 2L, "x y"),
      (3L, 3L, 3L, "p q r")))
  }

  test("spanDedup dedups within one document and keeps short docs intact") {
    val docs = Seq(
      (1L, "a b c d a b c d"), // second occurrence of window "a b c d"
      (2L, "a b c")).toDF("doc_id", "text") // shorter than the window
    val got = Dedup.spanDedup(docs, col("doc_id"), col("text"), windowTokens = 4)
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    // doc 1: windows at pos 0..4; pos 4 ("a b c d") duplicates pos 0 →
    // tokens 4..7 removed. Windows at pos 1..3 are unique.
    assert(got === Seq((1L, 8L, 4L, "a b c d"), (2L, 3L, 3L, "a b c")))
  }

  test("pii redaction masks emails, ips, and digit runs in order") {
    val df = Seq(
      "mail bob.smith+x@corp.example.com from 192.168.0.1 card 4111222233334444",
      "no pii here 123").toDF("text")
    val got = df.select(
        Pii.emailCount(col("text")).as("e"),
        Pii.ipv4Count(col("text")).as("i"),
        Pii.longDigitsCount(col("text")).as("n"),
        Pii.redact(col("text")).as("r"))
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(got.head === ((1L, 1L, 1L, "mail <EMAIL> from <IP> card <NUM>")))
    assert(got(1) === ((0L, 0L, 0L, "no pii here 123")))
  }

  test("sequential Poisson sample is deterministic and weight-sensitive") {
    val df = (1L to 200L).map(i => (i, s"doc body $i", i)).toDF("id", "body", "w")
    val pick = Scale.sequentialPoissonSample(df, col("id"), col("body"), col("w"), k = 20)
      .as[(Long, Double, Double)].collect().toSeq
    val again = Scale.sequentialPoissonSample(
        df.repartition(7), col("id"), col("body"), col("w"), k = 20)
      .as[(Long, Double, Double)].collect().toSeq
    assert(pick === again, "same sample under any partitioning")
    assert(pick.size === 20)
    // weight-sensitivity: with identical u values, dividing by w must
    // pull heavier rows forward vs an unweighted (w = 1) draw
    val uniform = Scale.sequentialPoissonSample(
        df, col("id"), col("body"), lit(1), k = 20)
      .as[(Long, Double, Double)].collect().toSeq
    val meanW = pick.map(_._1).sum.toDouble / pick.size
    val meanWUniform = uniform.map(_._1).sum.toDouble / uniform.size
    assert(meanW > meanWUniform,
      s"weighted draw favors heavy rows: $meanW !> $meanWUniform")
    // priorities are sorted ascending and positive
    assert(pick.map(_._3) === pick.map(_._3).sorted)
  }

  test("search ranks higher tf and rarer terms first") {
    val docs = Seq(
      (1L, "data data data table"),
      (2L, "data table"),
      (3L, "other words only"),
      (4L, "table table table table")).toDF("doc_id", "text")
    val got = Search.topK(docs, col("doc_id"), col("text"),
        terms = Seq("data", "table"), k = 10)
      .as[(Long, Long, Long)].collect().toSeq
    // N=4, df(data)=2, df(table)=3 → idf(data)=2, idf(table)=1
    // doc1: 3*2+1*1=7; doc4: 4*1=4; doc2: 1*2+1*1=3
    assert(got === Seq((1L, 7L, 2L), (4L, 4L, 1L), (2L, 3L, 2L)))
  }
}
