package graft

import graft.functions.{JpText, Parsers}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Golden parser tables ported from the reference's parametrized tests
  * (libs/tests/test_scraping.py:29-115, libs/tests/test_analysis.py:8-17).
  * `null` marks the reference's ParsingError (row-skip) outcome.
  */
class ParsersSpec extends SparkSpec {
  import spark.implicits._

  private def run(inputs: Seq[String], f: Column => Column): Seq[Any] = {
    val rows = inputs.toDF("s").withColumn("i", monotonically_increasing_id())
      .select(col("i"), f(col("s")).as("v")).orderBy("i").collect()
    rows.map(r => if (r.isNullAt(1)) null else r.get(1)).toSeq
  }

  test("F1 parse_age") {
    assert(run(Seq("新築", "築１２年", "築12年", "築1年", "築年"),
      Parsers.parseAge(_)) === Seq(0L, 12L, 12L, 1L, null))
  }

  test("F2 parse_floors") {
    assert(run(Seq("3階建", "地下1地上3階建", "地上3階建"),
      Parsers.parseFloors(_)) === Seq(3L, 3L, null))
  }

  test("F3 parse_transportation") {
    assert(run(
      Seq("都営浅草線/西馬込駅 歩18分", "都営浅草線/西馬込駅 歩18",
        "東京メトロ東西線/行徳駅 車15分(5.1km)"),
      Parsers.parseTransportation(_)) === Seq(18.0, null, null))
  }

  test("F4 parse_address ward/district") {
    val addrs = Seq("東京都渋谷区恵比寿南１", "東京都渋谷区恵比寿南1",
      "東京都渋谷区神泉町", "神奈川県横浜市中区山下町２２")
    assert(run(addrs, Parsers.parseWard(_)) ===
      Seq("渋谷区", "渋谷区", "渋谷区", null))
    assert(run(addrs, Parsers.parseDistrict(_)) ===
      Seq("恵比寿南", "恵比寿南", "神泉町", null))
  }

  test("F5 parse_money") {
    assert(run(Seq("-", "5000円"), c => Parsers.parseMoney(c, "円")) ===
      Seq(0L, 5000L))
    assert(run(Seq("-", "8万円", "8.5万円", ".5万円", "8.万円"),
      c => Parsers.parseMoney(c, "万円")) ===
      Seq(0L, 80000L, 85000L, 5000L, null))
  }

  test("F6 parse_floor_range") {
    val expected = Seq((2L, 2L), (2L, 2L), (3L, 5L), (0L, 0L), (0L, 1L),
      (-1L, 0L), (0L, 1L), null)
    val got = run(
      Seq("2階", "2-階", "3-5階", "B1階", "B1-1階", "B2-B1階", "1-B1階", "階"),
      Parsers.parseFloorRange(_)).map {
      case null => null
      case r: org.apache.spark.sql.Row => (r.getLong(0), r.getLong(1))
    }
    assert(got === expected)
  }

  test("F7 parse_area") {
    assert(run(Seq("30m2", "30.5m2", ".8m2", "30.m2", "30"),
      Parsers.parseArea(_)) === Seq(30.0, 30.5, 0.8, null, null))
  }

  test("F8 parse_layout") {
    val expected = Seq(
      (1L, false, false, false, false),
      (1L, false, false, false, true),
      (2L, false, false, true, true),
      (3L, false, true, true, true),
      (4L, true, true, true, true))
    val got = run(Seq("ワンルーム", "1K", "2DK", "3LDK", "4SLDK"),
      Parsers.parseLayout(_)).map {
      case r: org.apache.spark.sql.Row =>
        (r.getLong(0), r.getBoolean(1), r.getBoolean(2), r.getBoolean(3),
          r.getBoolean(4))
    }
    assert(got === expected)
  }

  test("F9 parse_banner_timestamp") {
    assert(run(
      Seq("var x = 'foo&times=1609140469000&bar'", "no timestamp here"),
      Parsers.parseBannerTimestamp(_)) === Seq(1.609140469e9, null))
  }

  test("F11 build_address_kanji golden table") {
    val cases = Seq(
      "東京都渋谷区恵比寿南１" -> "東京都渋谷区恵比寿南一丁目",
      "東京都渋谷区恵比寿南1" -> "東京都渋谷区恵比寿南一丁目",
      "東京都渋谷区恵比寿南１２" -> "東京都渋谷区恵比寿南十二丁目",
      "東京都渋谷区神泉町" -> "東京都渋谷区神泉町",
      "東京都渋谷区千駄ヶ谷１" -> "東京都渋谷区千駄ケ谷一丁目",
      "invalid_address" -> "")
    cases.foreach { case (in, out) =>
      assert(Parsers.buildAddressKanjiFn(in) === out, s"for $in")
    }
    // and as a Column (UDF) over a DataFrame
    assert(run(cases.map(_._1), Parsers.buildAddressKanji(_)) ===
      cases.map(_._2))
  }

  test("int2kanji covers composite numerals including 万") {
    assert(JpText.int2kanji(1) === "一")
    assert(JpText.int2kanji(10) === "十")
    assert(JpText.int2kanji(12) === "十二")
    assert(JpText.int2kanji(21) === "二十一")
    assert(JpText.int2kanji(30) === "三十")
    assert(JpText.int2kanji(111) === "百十一")
    assert(JpText.int2kanji(2345) === "二千三百四十五")
    assert(JpText.int2kanji(10000) === "一万")
    assert(JpText.int2kanji(12345) === "一万二千三百四十五")
    assert(JpText.int2kanji(20000000) === "二千万")
  }

  test("F11 degrades (never throws) on pathological digit runs") {
    assert(Parsers.buildAddressKanjiFn("東京都渋谷区恵比寿南12345") ===
      "東京都渋谷区恵比寿南一万二千三百四十五丁目")
    // >= 10^8: unrepresentable street number → "" like any parse failure
    assert(Parsers.buildAddressKanjiFn("東京都渋谷区恵比寿南123456789") === "")
    assert(Parsers.buildAddressKanjiFn(
      "東京都渋谷区恵比寿南999999999999999999999") === "")
  }
}
