package graft

import java.nio.charset.Charset
import java.nio.file.Files

import graft.transform.{Clean, Geocode, Serve}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class TransformSpec extends SparkSpec {
  import spark.implicits._

  /** Synthesized SJIS location-reference CSV with the reference's header
    * (FIXTURES.md §3) incl. the golden 恵比寿南一丁目 row
    * (libs/tests/test_analysis.py:20-49).
    */
  lazy val locationCsv: String = {
    val header = "都道府県コード,都道府県名,市区町村コード,市区町村名," +
      "大字町丁目コード,大字町丁目名,緯度,経度,原典資料コード,大字・字・丁目区分コード"
    val rows = Seq(
      "13,東京都,13113,渋谷区,131130001001,恵比寿南一丁目,35.644942,139.709897,1,3",
      "13,東京都,13113,渋谷区,131130002000,神泉町,35.657123,139.694345,1,3",
      "13,東京都,13113,渋谷区,131130003001,千駄ケ谷一丁目,35.678654,139.709000,1,3")
    val dir = Files.createTempDirectory("graft_loc")
    val path = dir.resolve("13_2019.csv")
    Files.write(path,
      (header + "\n" + rows.mkString("\n")).getBytes(Charset.forName("Shift_JIS")))
    path.toString
  }

  test("S5+J1: SJIS read + geocode join with miss-row null semantics") {
    val props = Seq(
      ("a", "東京都渋谷区恵比寿南１"),
      ("b", "東京都渋谷区神泉町"),
      ("c", "東京都渋谷区千駄ヶ谷１"), // ヶ→ケ normalization path
      ("d", "invalid_address"))
      .toDF("jnc_id", "building_address")
    val dim = Geocode.readLocationReference(spark, locationCsv)
    assert(dim.count() === 3)
    val out = Geocode.addAddressCoords(props, dim).orderBy("jnc_id").collect()
    assert(out.length === 4)
    assert(out(0).getAs[Double]("latitude") === 35.644942)
    assert(out(0).getAs[Double]("longitude") === 139.709897)
    assert(out(1).getAs[Double]("latitude") === 35.657123)
    assert(out(2).getAs[Double]("latitude") === 35.678654)
    assert(out(3).isNullAt(out(3).fieldIndex("latitude")))
    assert(!out.head.schema.fieldNames.contains("join_key"))
  }

  test("P1: outlier filter drops only rows equal to the exact p99") {
    // 100 rows, area 1..100 → p99 of 1..100 (linear interp) = 99.01 →
    // matches no row → nothing dropped on area. n_rooms constant 2 →
    // p99 = 2 → ALL rows dropped (the reference quirk on constant cols).
    val df = (1 to 100).map(i =>
        (i.toString, i.toDouble, 2L, 10L, 100000L, 1000L))
      .toDF("jnc_id", "area", "n_rooms", "building_age", "rent", "admin_fee")
    val kept = Clean.removeOutliers(df)
    assert(kept.count() === 0) // constant n_rooms kills everything
    // n=101 strictly increasing columns: (n-1)*0.99 = 99 exactly, so each
    // column's p99 IS its rank-99 value → exactly that row is dropped,
    // and notably the MAX row (i=100) survives — the reference quirk.
    val df2 = (0 to 100).map { i =>
      (i.toString, (i + 1).toDouble, i.toLong, i.toLong,
        1000L * (i + 1), i.toLong * (i + 1))
    }.toDF("jnc_id", "area", "n_rooms", "building_age", "rent", "admin_fee")
    val kept2 = Clean.removeOutliers(df2)
    assert(kept2.count() === 100)
    assert(kept2.filter($"jnc_id" === "99").count() === 0) // p99 row gone
    assert(kept2.filter($"jnc_id" === "100").count() === 1) // max row kept
  }

  test("P1: zero-rent rows rank as pandas inf in the ratio quantile") {
    // 200 varied rows + 1 zero-rent row: the single inf sits past the
    // p99 rank, the interpolated quantile stays real, inf == q is False
    // → the zero-rent row SURVIVES the outlier pass (pandas behavior)
    def mk(n: Int, nZero: Int) = {
      val real = (1 to n).map(i => (s"r$i", 20.0 + (i % 37), 1L + i % 3,
        (i % 40).toLong, 50000L + 13L * i * i % 90000, 100L * (i % 23)))
      val zero = (1 to nZero).map(i => (s"z$i", 25.0 + i, 2L, 5L, 0L, 3000L))
      (real ++ zero).toDF(
        "jnc_id", "area", "n_rooms", "building_age", "rent", "admin_fee")
    }
    val few = Clean.removeOutliers(mk(200, 1))
    assert(few.filter($"jnc_id" === "z1").count() === 1)
    // >1% zero-rent rows: pandas' p99 interpolates into the inf block,
    // q = inf, and inf == inf drops EVERY zero-rent row
    val many = Clean.removeOutliers(mk(200, 10))
    assert(many.filter($"jnc_id".startsWith("z")).count() === 0)
    assert(many.filter($"jnc_id".startsWith("r")).count() > 0)
  }

  test("P1: empty input passes through both outlier variants") {
    val empty = Seq.empty[(String, Double, Long, Long, Long, Long)]
      .toDF("jnc_id", "area", "n_rooms", "building_age", "rent", "admin_fee")
    assert(Clean.removeOutliers(empty).count() === 0)
    assert(Clean.removeOutliersApprox(empty).count() === 0)
  }

  test("P1 approx variant: sketch-based quantiles, same behavior here") {
    val df = (0 to 100).map { i =>
      (i.toString, (i + 1).toDouble, i.toLong, i.toLong,
        1000L * (i + 1), i.toLong * (i + 1))
    }.toDF("jnc_id", "area", "n_rooms", "building_age", "rent", "admin_fee")
    val kept = Clean.removeOutliersApprox(df)
    // at this size the sketch is exact: the rank-99 row is dropped
    assert(kept.count() === 100)
    assert(kept.filter($"jnc_id" === "99").count() === 0)
  }

  test("P2: keep-first dedup follows (file, order), not arbitrary") {
    val df = Seq(
      ("x", "f1", 0L, "first"),
      ("x", "f1", 5L, "later-same-file"),
      ("x", "f0", 9L, "earlier-file-wins"),
      ("y", "f2", 1L, "only")).toDF("jnc_id", "source_file", "source_order", "tag")
    val out = Clean.dedupKeepFirst(df).orderBy("jnc_id")
      .select("jnc_id", "tag").as[(String, String)].collect().toSeq
    assert(out === Seq(("x", "earlier-file-wins"), ("y", "only")))
  }

  test("P3+D7: dropna and target variable") {
    val df = Seq(
      ("a", Some(100000L), Some(5000L)),
      ("b", Some(90000L), None)).toDF("jnc_id", "rent", "admin_fee")
    val out = Clean.dropMissing(Clean.addTargetVariable(df))
    assert(out.count() === 1)
    assert(out.head().getAs[Long]("y") === 105000L)
  }

  test("D8/J3/O1/D9: serving join, score sort, rename") {
    val pred = Seq(("a", 100000.0, 120000.0), ("b", 100000.0, 90000.0),
      ("c", 100000.0, 150000.0)).toDF("jnc_id", "y", "y_pred")
    val scraped = Seq(("a", "タワーA"), ("b", "タワーB"), ("c", "タワーC"))
      .toDF("jnc_id", "building_title")
    val out = Serve.joinDataframes(pred, scraped)
    assert(out.columns.contains("monthly_cost") &&
      out.columns.contains("monthly_cost_predicted"))
    assert(out.select("jnc_id").as[String].collect().toSeq === Seq("c", "a", "b"))
    assert(out.head().getAs[Double]("otokuna_score") === 1.5)
  }

  test("J2: prediction re-join keeps unscored rows as null") {
    val yDf = Seq(("a", 1.0), ("b", 2.0)).toDF("jnc_id", "y")
    val scored = Seq(("a", 1.1)).toDF("jnc_id", "y_pred")
    val out = Serve.rejoinPredictions(scored, yDf).orderBy("jnc_id").collect()
    assert(out.length === 2)
    assert(out(1).isNullAt(2))
  }
}
