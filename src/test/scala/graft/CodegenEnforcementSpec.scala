package graft

import graft.plans._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Runs every custom Catalyst expression with codegen ENFORCED
  * (`spark.sql.codegen.factoryMode=CODEGEN_ONLY`,
  * `spark.sql.codegen.fallback=false`) and compares the output against
  * the same query interpreted (`NO_CODEGEN`, whole-stage off). A
  * `doGenCode` that emits non-compiling Java fails these tests loudly
  * instead of silently falling back to interpreted execution — which is
  * exactly how four expressions shipped broken through round 3 (scalac
  * suppresses the static forwarder for a companion method named `eval`
  * because the class inherits `Expression.eval(InternalRow)`, so the
  * generated `graft.plans.X.eval(...)` call never resolved).
  *
  * Inputs are built from RDDs on purpose: a `LocalRelation` would let
  * `ConvertToLocalRelation` evaluate the projection in the optimizer
  * (interpreted) and nothing would ever be compiled.
  */
class CodegenEnforcementSpec extends AnyFunSuite {

  private def session(pairs: (String, String)*): SparkSession = {
    val s = SparkSpec.session.newSession()
    pairs.foreach { case (k, v) => s.conf.set(k, v) }
    GraftExtensions.register(s)
    s
  }

  private lazy val codegen: SparkSession = session(
    "spark.sql.codegen.factoryMode" -> "CODEGEN_ONLY",
    "spark.sql.codegen.fallback" -> "false")

  private lazy val interp: SparkSession = session(
    "spark.sql.codegen.factoryMode" -> "NO_CODEGEN",
    "spark.sql.codegen.wholeStage" -> "false")

  private val texts: Seq[(Long, String)] = Seq(
    1L -> "a b c d e",
    2L -> "a a a a a a",
    3L -> "foo bar foo bar foo baz",
    4L -> "",
    5L -> null,
    6L -> "solo",
    7L -> "  double  spaced  tokens  ",
    8L -> "東京都渋谷区神南1丁目2-3 ハイツ301")

  private def textDf(s: SparkSession): DataFrame =
    s.createDataFrame(s.sparkContext.parallelize(texts, 2))
      .toDF("id", "text")

  private val vecs: Seq[(Long, Array[Float], Array[Double])] = Seq(
    (1L, Array(1f, 2f, 3f), Array(1d, 2d, 3d)),
    (2L, Array(-0.5f, 0f, 4.25f), Array(-0.5, 0d, 4.25)),
    (3L, Array(0f, 0f, 0f), Array(0d, 0d, 0d)))

  private def vecDf(s: SparkSession): DataFrame =
    s.createDataFrame(s.sparkContext.parallelize(vecs, 2))
      .toDF("id", "vf", "vd")

  /** Runs the query on both sessions; the codegen run must plan a
    * WholeStageCodegen span (so a broken doGenCode actually throws) and
    * both runs must agree row-for-row.
    */
  private def check(name: String)(q: SparkSession => DataFrame): Unit = {
    val c = q(codegen)
    // `*(n)` is the whole-stage-codegen marker in the plan's toString
    val plan = c.queryExecution.executedPlan.toString
    assert(plan.contains("*("),
      s"$name must execute inside a codegen span:\n$plan")
    val got = c.collect().toSeq
    val want = q(interp).collect().toSeq
    assert(got === want, s"$name: codegen/interpreted mismatch")
    assert(got.nonEmpty)
  }

  test("kanji_address_key compiles under CODEGEN_ONLY and matches interpreted") {
    check("kanji_address_key") { s =>
      textDf(s).select(col("id"),
        KanjiAddressKey.kanji_address_key(col("text")).as("k"))
    }
  }

  test("shingle_hashes compiles under CODEGEN_ONLY and matches interpreted") {
    check("shingle_hashes") { s =>
      textDf(s).select(col("id"),
        ShingleHashes.shingle_hashes(col("text"), 3).as("sh3"),
        ShingleHashes.shingle_hashes(col("text"), 1).as("sh1"))
    }
  }

  test("minhash_signature compiles under CODEGEN_ONLY and matches interpreted") {
    check("minhash_signature") { s =>
      // the when() makes the input array NULLABLE so the generated
      // null branch (allNull) is exercised, not folded away
      textDf(s).select(col("id"),
        MinhashSignature.minhash_signature(
          when(col("id") =!= 5,
            ShingleHashes.shingle_hashes(col("text"), 2)), 16).as("sig"))
    }
  }

  test("token_ngram_stats compiles under CODEGEN_ONLY and matches interpreted") {
    check("token_ngram_stats") { s =>
      textDf(s).select(col("id"),
        TokenNgramStats.token_ngram_stats(col("text"), 1).as("uni"),
        TokenNgramStats.token_ngram_stats(col("text"), 2).as("bi"))
    }
  }

  test("token_tf compiles under CODEGEN_ONLY and matches interpreted") {
    check("token_tf") { s =>
      textDf(s).select(col("id"),
        TokenTf.token_tf(col("text")).as("tf"))
    }
  }

  test("walk_time_stats compiles under CODEGEN_ONLY and matches interpreted") {
    check("walk_time_stats") { s =>
      textDf(s).select(col("id"),
        WalkTimeStats.walk_time_stats(
          split(concat(col("text"), lit(" 歩5分,バス3分, ,歩12分")), ","))
          .as("wt"))
    }
  }

  test("fence compiles under CODEGEN_ONLY and matches interpreted") {
    check("fence") { s =>
      textDf(s).select(col("id"),
        Fence.fence(upper(col("text"))).as("u"),
        Fence.fence(col("id") * 3).as("v"))
    }
  }

  test("rolling_hash compiles under CODEGEN_ONLY and matches interpreted") {
    check("rolling_hash") { s =>
      textDf(s).select(col("id"),
        RollingHash.rolling_hash(col("text")).as("h"))
    }
  }

  test("dot_product compiles under CODEGEN_ONLY and matches interpreted") {
    check("dot_product") { s =>
      vecDf(s).select(col("id"),
        DotProduct.dot_product(col("vf"), col("vf")).as("ff"),
        DotProduct.dot_product(col("vd"), col("vd")).as("dd"))
    }
  }

  test("srp_signature compiles under CODEGEN_ONLY and matches interpreted") {
    check("srp_signature") { s =>
      vecDf(s).select(col("id"),
        SrpSignature.srp_signature(col("vf"), 8, 42L).as("sig"))
    }
  }

  test("bloom_any_contain compiles under CODEGEN_ONLY and matches interpreted") {
    val bf = org.apache.spark.util.sketch.BloomFilter.create(100, 0.01)
    val probe = ShingleHashes.evalImpl(
      org.apache.spark.unsafe.types.UTF8String.fromString("a b c d e"), 3)
    (0 until probe.numElements()).foreach(i => bf.putLong(probe.getLong(i)))
    val bytes = BloomAnyContain.serialize(bf)
    check("bloom_any_contain") { s =>
      textDf(s).select(col("id"),
        BloomAnyContain.bloom_any_contain(
          ShingleHashes.shingle_hashes(col("text"), 3), bytes).as("hit"))
    }
  }

  test("kmeans argmin at k=64 compiles under CODEGEN_ONLY, matches interpreted") {
    // bestOf folds over ONE array<array<long>> centroid literal, so
    // the generated projection is O(1) in k — this pins that k in the
    // tens stays inside Janino's 64 KB method limit (a least(struct…)
    // over k per-centroid folds would grow linearly and break first
    // here). fallback=false: a failed compile throws instead of
    // silently degrading to interpreted execution.
    def run(s: SparkSession): Seq[org.apache.spark.sql.Row] = {
      val rows = (0 until 200).map(i =>
        (i.toLong, Array.tabulate(8)(d => ((i * 31 + d * 7) % 100) / 100.0)))
      val df = s.createDataFrame(s.sparkContext.parallelize(rows, 4))
        .toDF("vec_id", "embedding")
      graft.ml.KMeans.fit(df, col("vec_id"), col("embedding"),
          k = 64, iters = 2)
        .orderBy(col("vec_id")).collect().toSeq
    }
    val got = run(codegen)
    assert(got === run(interp), "kmeans codegen/interpreted mismatch")
    assert(got.length === 200)
  }

  test("SQL registration path also compiles under CODEGEN_ONLY") {
    import codegen.implicits._
    val df = codegen.sparkContext
      .parallelize(texts.filter(_._2 != null), 2).toDF("id", "text")
    df.createOrReplaceTempView("cg_texts")
    val out = codegen.sql(
      """SELECT id, rolling_hash(text) AS rh,
        |       size(shingle_hashes(text, 2)) AS nsh,
        |       token_ngram_stats(text, 2).n_grams AS ng,
        |       kanji_address_key(text) AS kk
        |FROM cg_texts""".stripMargin)
    assert(out.collect().length === texts.count(_._2 != null))
  }
}
