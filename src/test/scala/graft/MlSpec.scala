package graft

import java.nio.file.{Files, Paths}

import graft.ingest.{PropertiesFrame, SyntheticSuumo}
import graft.ml.Scoring
import graft.operators.Splits
import graft.transform.{Clean, Geocode}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class MlSpec extends SparkSpec {
  import spark.implicits._

  /** Cleaned synthetic properties with coords + y — the training frame. */
  lazy val trainingData: DataFrame = {
    val pages = SyntheticSuumo.writePages(
      Files.createTempDirectory("graft_ml_pages"), 8)
    val csv = SyntheticSuumo.writeLocationCsv(
      Files.createTempDirectory("graft_ml_loc"))
    val props = PropertiesFrame.scrape(spark, pages.toString,
      fetchedAt = Some(1.6254e9))
    val dim = Geocode.readLocationReference(spark, csv.toString)
    Clean.cleanDf(Clean.addTargetVariable(
      Geocode.addAddressCoords(props, dim))).cache()
  }

  test("M1+M5: GBT with absolute loss trains and beats the mean baseline") {
    val splits = Splits.threeWay(trainingData, 0.2, 0.2, seed = 123L)
    val model = Scoring.trainGbt(splits("train"), Some(splits("val")), maxIter = 30)
    val scored = Scoring.predict(model, splits("test"))
    val gbtMae = Scoring.mae(scored)
    val meanY = splits("train").agg(avg("y")).head().getDouble(0)
    val baselineMae = Scoring.mae(
      splits("test").withColumn("y_pred", lit(meanY)))
    assert(gbtMae.isFinite && gbtMae > 0)
    assert(gbtMae < baselineMae * 1.2,
      s"GBT MAE $gbtMae should not be far above mean-baseline $baselineMae")
  }

  test("M2/J2: unscorable rows keep null y_pred") {
    val model = Scoring.trainGbt(trainingData, maxIter = 5)
    val withBroken = trainingData
      .unionByName(trainingData.limit(1)
        .withColumn("latitude", lit(null).cast("double"))
        .withColumn("jnc_id", lit("__broken__")))
    val scored = Scoring.predict(model, withBroken)
    assert(scored.count() === trainingData.count() + 1)
    val broken = scored.filter(col("jnc_id") === "__broken__").head()
    assert(broken.isNullAt(broken.fieldIndex("y_pred")))
  }

  test("M3: saved and reloaded model predictions are identical") {
    val model = Scoring.trainGbt(trainingData, maxIter = 5)
    val path = Files.createTempDirectory("graft_model").resolve("gbt").toString
    val ape = Scoring.saveLoadParity(model, trainingData, path,
      sampleFraction = 0.5)
    assert(ape < 1e-9, s"save/load max APE $ape")
  }

  test("A4: maxApeFrame hand-computed values; scalar maxApe agrees") {
    // apes: (10-9)/10 = 0.1, (4-5)/4 = 0.25, (8-8)/8 = 0
    val df = Seq((10.0, 9.0), (4.0, 5.0), (8.0, 8.0)).toDF("a", "b")
    val row = Scoring.maxApeFrame(df, "a", "b").head()
    assert(row.getDouble(0) === 0.25)
    assert(row.getLong(1) === 3L)
    assert(Scoring.maxApe(df, "a", "b") === 0.25)
  }

  /** Deterministic prediction digest: micro-unit-quantized predictions
    * of the feature-complete test rows, order-pinned by jnc_id.
    */
  private def predictionDigest(model: org.apache.spark.ml.regression.GBTRegressionModel,
      eval: DataFrame): (String, Int) = {
    val rows = Scoring.predict(model, eval)
      .na.drop(Seq("y_pred")).orderBy(col("jnc_id"))
      .select(col("jnc_id"),
        (signum(col("y_pred")) * floor(abs(col("y_pred")) * 1000 + lit(0.5)))
          .cast("long").as("p"))
      .collect().map(r => s"${r.getString(0)}:${r.getLong(1)}")
    val digest = java.security.MessageDigest.getInstance("SHA-256")
      .digest(rows.mkString("|").getBytes("UTF-8"))
      .take(8).map("%02x".format(_)).mkString
    (digest, rows.length)
  }

  test("M1 determinism freeze: committed model re-scores to a pinned hash") {
    // Freezes the GBT path (rows-only q23; DuckDB cannot train a GBT):
    //  1. The COMMITTED model fixture (src/test/resources/gbt_fixture;
    //     maxIter=10/absolute/0.01/seed 456) reloads and re-scores the
    //     fixed test slice to a PINNED digest — a silent MLlib change
    //     to the model format or scoring path fails loudly.
    //  2. A FRESH train on the canonical layout (sorted on the id, one
    //     partition — split-stat float accumulation order is the one
    //     layout-dependent degree of freedom) reproduces the identical
    //     digest: training itself is bit-deterministic, across JVMs.
    //
    // The split frame drops the fixture-provenance columns
    // (source_file, html_file_last_modified_at): threeWay hashes every
    // column for its content-split, and those two vary per run (temp
    // dir, mtime) — with them in, split MEMBERSHIP itself would drift.
    // That subtlety is exactly why this freeze exists.
    val stable = trainingData
      .drop("source_file", "html_file_last_modified_at")
    val splits = Splits.threeWay(stable, 0.2, 0.2, seed = 123L)
    val fixture = org.apache.spark.ml.regression.GBTRegressionModel
      .load("src/test/resources/gbt_fixture")
    assert(fixture.getMaxIter === 10 && fixture.getLossType === "absolute" &&
      fixture.getStepSize === 0.01 && fixture.getSeed === 456L &&
      fixture.getNumTrees === 10)
    val (digest, n) = predictionDigest(fixture, splits("test"))
    assert(digest === "ef61403b3418f67f",
      s"GBT scoring/format drifted: digest $digest over $n rows")

    val canonical = splits("train").orderBy(col("jnc_id")).coalesce(1)
    val (fresh, _) = predictionDigest(
      Scoring.trainGbt(canonical, maxIter = 10), splits("test"))
    assert(fresh === "ef61403b3418f67f",
      s"GBT training drifted from the committed fixture: $fresh")
  }

  test("M4/A5: leaf quantiles on separable data are exact") {
    // two separable clusters like libs/tests/test_tree.py:10-36
    val df = ((1 to 50).map(i => (s"a$i", 0.0, 100.0 + i)) ++
      (1 to 50).map(i => (s"b$i", 10.0, 1000.0 + i)))
      .toDF("jnc_id", "x", "y")
    val assembled = new org.apache.spark.ml.feature.VectorAssembler()
      .setInputCols(Array("x")).setOutputCol("features").transform(df)
    val (tree, leafQ) = Scoring.trainLeafQuantiles(assembled,
      quantiles = Seq(0.0, 0.5, 1.0), maxDepth = 1)
    val out = Scoring.predictQuantiles(tree, leafQ, assembled)
    val lowCluster = out.filter(col("x") === 0.0)
      .select("quantiles").head().getSeq[Double](0)
    assert(lowCluster === Seq(101.0, 125.5, 150.0))
    val highCluster = out.filter(col("x") === 10.0)
      .select("quantiles").head().getSeq[Double](0)
    assert(highCluster === Seq(1001.0, 1025.5, 1050.0))
  }

  test("target encoder: out-of-fold means exclude the row's own fold") {
    def lcgFold(id: Long, k: Int) =
      ((id * 1103515245L + 12345L) % 2147483648L) % k
    // ids chosen so category 'a' spans both folds of k=2
    val ids = (0L until 40L)
    val rows = ids.map(i => (i, if (i < 30) "a" else "b", (i + 1) * 10.0))
    val df = rows.toDF("id", "cat", "y")
    val out = graft.ml.TargetEncoder.oofMeans(df, col("id"), col("cat"),
        col("y"), k = 2)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), if (r.isNullAt(3)) None else Some(r.getDouble(3))))
      .toMap
    // replay in plain Scala with exact integer cents
    val cents = rows.map { case (i, c, y) =>
      (c, lcgFold(i, 2), math.floor(y * 100 + 0.5).toLong)
    }
    for (cat <- Seq("a", "b"); fold <- Seq(0L, 1L)) {
      val inCat = cents.filter(_._1 == cat)
      val inCell = inCat.filter(_._2 == fold)
      if (inCell.nonEmpty) {
        val others = inCat.filterNot(_._2 == fold)
        val expected =
          if (others.isEmpty) None
          else Some(BigDecimal(others.map(_._3).sum.toDouble /
            (others.size * 100.0)).setScale(6,
            BigDecimal.RoundingMode.HALF_UP).toDouble)
        val (n, m) = out((cat, fold))
        assert(n === inCell.size.toLong)
        assert(m.map(v => math.abs(v - expected.get) < 1e-9)
          .getOrElse(expected.isEmpty), s"cell ($cat, $fold): $m vs $expected")
      }
    }
    // a category entirely inside one fold has no out-of-fold mean
    val solo = Seq((0L, "only", 5.0), (2L, "other", 1.0),
      (1L, "other", 2.0)).toDF("id", "cat", "y")
    val soloOut = graft.ml.TargetEncoder.oofMeans(solo, col("id"),
      col("cat"), col("y"), k = 2)
    assert(soloOut.filter(col("cat") === "only")
      .collect().forall(_.isNullAt(3)))
  }

  test("rankMetrics: perfect separation gives AUC 1 and a clean " +
      "confusion matrix") {
    val df = Seq((true, 10L), (true, 10L), (false, 1L), (false, 1L))
      .toDF("y", "s")
    val out = graft.ml.BinaryMetrics.rankMetrics(df, col("y"), col("s"),
      thr = 5L).collect().head
    assert(out.getLong(0) === 2L && out.getLong(1) === 2L) // n_pos n_neg
    assert(out.getDouble(2) === 1.0)                       // auc
    assert((3 to 6).map(out.getLong) === Seq(2L, 0L, 0L, 2L)) // tp fp fn tn
    assert((7 to 9).map(out.getLong) === Seq(1000000L, 1000000L, 1000000L))
  }

  test("rankMetrics: average-rank tie handling (hand-computed AUC)") {
    // scores 1-,2+,2-,3+: ranks 1, {2,3}->2.5 avg, 4
    // R+ = 2.5 + 4 = 6.5 -> AUC = (6.5 - 3) / 4 = 0.875
    val df = Seq((false, 1L), (true, 2L), (false, 2L), (true, 3L))
      .toDF("y", "s")
    val out = graft.ml.BinaryMetrics.rankMetrics(df, col("y"), col("s"),
      thr = 2L).collect().head
    assert(out.getDouble(2) === 0.875)
    assert((3 to 6).map(out.getLong) === Seq(2L, 1L, 0L, 1L))
    assert(out.getLong(7) === 666666L)  // 2e6 div 3
    assert(out.getLong(8) === 1000000L)
    assert(out.getLong(9) === 800000L)  // 4e6 div 5
    // all scores tied -> AUC exactly 0.5
    val tied = Seq((true, 7L), (false, 7L), (true, 7L), (false, 7L))
      .toDF("y", "s")
    val t = graft.ml.BinaryMetrics.rankMetrics(tied, col("y"), col("s"),
      thr = 9L).collect().head
    assert(t.getDouble(2) === 0.5)
    assert(t.getLong(3) === 0L && t.isNullAt(7)) // empty positive side
  }

  test("calibrationBins: equal-width binning, exact micro rates") {
    // bin width 10: scores 1,9 -> bin 0; 15,15 -> bin 1; 25 -> bin 2
    val df = Seq((false, 1L), (true, 9L), (true, 15L), (false, 15L),
      (true, 25L)).toDF("y", "s")
    val got = graft.ml.BinaryMetrics
      .calibrationBins(df, col("y"), col("s"), binWidth = 10L)
      .orderBy("bin")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq(
      (0L, 2L, 1L, 500000L, 5000000L),   // mean score (1+9)/2 = 5
      (1L, 2L, 1L, 500000L, 15000000L),
      (2L, 1L, 1L, 1000000L, 25000000L)))
  }

  test("rankMetrics: degenerate one-class input nulls AUC; " +
      "partition-invariant") {
    val onePos = Seq((true, 3L), (true, 9L)).toDF("y", "s")
    val d = graft.ml.BinaryMetrics.rankMetrics(onePos, col("y"),
      col("s"), thr = 5L).collect().head
    assert(d.isNullAt(2) && d.getLong(1) === 0L)
    val df = Seq((false, 1L), (true, 2L), (false, 2L), (true, 3L),
      (true, 5L), (false, 4L), (true, 4L), (false, 9L))
      .toDF("y", "s")
    val a = graft.ml.BinaryMetrics
      .rankMetrics(df, col("y"), col("s"), thr = 4L).collect().head
    val b = graft.ml.BinaryMetrics
      .rankMetrics(df.repartition(7), col("y"), col("s"), thr = 4L)
      .collect().head
    assert(a.toSeq === b.toSeq)
  }
}
