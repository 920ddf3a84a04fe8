package graft

import java.nio.file.{Files, Paths}

import graft.ingest.{PropertiesFrame, SuumoPages}
import graft.schemas.Schemas
import org.apache.spark.sql.functions._

/** Golden end-to-end page scrape (SURVEY §5.2-5.3): synthesized fixture
  * pages matching the structure in FIXTURES.md §1 (the real Suumo fixture
  * cannot be redistributed, reference README.md:166-167). Covers the
  * building×room fan-out, all skip paths, and the 29-column golden
  * schema.
  */
class IngestSpec extends SparkSpec {
  import graft.ingest.SyntheticSuumo.{building, pageHtml, room}

  lazy val fixture: String = pageHtml(Seq(
    building("賃貸マンション", "グラフトタワー", "東京都渋谷区恵比寿南１",
      Seq("ＪＲ山手線/恵比寿駅 歩5分", "東京メトロ日比谷線/恵比寿駅 歩7分", ""),
      "築１２年", "11階建",
      Seq(
        room("8万円", "5000円", "8万円", "-", "1K", "20.35m2", "2階",
          "000000000001", newArrival = true),
        room("8.万円", "5000円", "8万円", "-", "1K", "20m2", "2階",
          "000000000002"), // bad rent → room skipped
        room("12.5万円", "-", "12.5万円", "12.5万円", "2LDK", "45.5m2",
          "B1-1階", "000000000003"))),
    building("アパート", "バス物件荘", "東京都台東区元浅草１",
      Seq("東西線/行徳駅 車15分(5.1km)"), "築3年", "2階建",
      Seq(room("6万円", "-", "-", "-", "1K", "18m2", "1階",
        "000000000004"))), // transportation unparseable → skipped
    building("アパート", "古築荘", "東京都台東区元浅草２",
      Seq("都営大江戸線/新御徒町駅 歩4分"), "築年", "2階建",
      Seq(room("6万円", "-", "-", "-", "1K", "18m2", "1階",
        "000000000005"))), // bad age → building skipped
    building("アパート", "横浜荘", "神奈川県横浜市中区山下町２２",
      Seq("みなとみらい線/元町・中華街駅 歩3分"), "築1年", "3階建",
      Seq(room("6万円", "-", "-", "-", "1K", "18m2", "1階",
        "000000000006"))), // non-Tokyo address → ward fails → skipped
    building("賃貸マンション", "ワンルーム館", "東京都渋谷区神泉町",
      Seq("京王井の頭線/神泉駅 歩2分"), "新築", "3階建",
      Seq(room("7万円", "3000円", "-", "7万円", "ワンルーム", "16.2m2",
        "3-5階", "000000000007")))),
    bannerMs = Some(1609140469000L))

  lazy val scraped = {
    val dir = Files.createTempDirectory("graft_html")
    Files.writeString(dir.resolve("page_000001.html"), fixture)
    val df = PropertiesFrame.scrape(spark, dir.toString).cache()
    df
  }

  test("golden page: survivors, skips, and fan-out") {
    // 7 raw rooms; room 2 (bad rent), building 2 (bus), building 3
    // (bad age), building 4 (non-Tokyo) are skipped → 3 survivors
    assert(scraped.count() === 3)
    assert(scraped.select("jnc_id").orderBy("jnc_id").collect().map(_.getString(0)).toSeq
      === Seq("000000000001", "000000000003", "000000000007"))
  }

  test("golden first record, field by field") {
    val r = scraped.filter(col("jnc_id") === "000000000001").head()
    assert(r.getAs[String]("building_category") === "賃貸マンション")
    assert(r.getAs[String]("building_title") === "グラフトタワー")
    assert(r.getAs[String]("building_address") === "東京都渋谷区恵比寿南１")
    assert(r.getAs[Seq[String]]("building_transportation") ===
      Seq("ＪＲ山手線/恵比寿駅 歩5分", "東京メトロ日比谷線/恵比寿駅 歩7分", ""))
    assert(r.getAs[Long]("building_age") === 12L)
    assert(r.getAs[Long]("building_floors") === 11L)
    assert(r.getAs[Long]("rent") === 80000L)
    assert(r.getAs[Long]("admin_fee") === 5000L)
    assert(r.getAs[Long]("deposit") === 80000L)
    assert(r.getAs[Long]("gratuity") === 0L)
    assert(r.getAs[String]("layout") === "1K")
    assert(r.getAs[Double]("area") === 20.35)
    assert(r.getAs[Long]("min_floor") === 2L)
    assert(r.getAs[Long]("max_floor") === 2L)
    assert(r.getAs[String]("url") === "https://suumo.jp/chintai/jnc_000000000001/?bc=100")
    assert(r.getAs[Boolean]("new_arrival") === true)
    assert(r.getAs[Double]("html_file_banner_timestamp") === 1.609140469e9)
    assert(r.getAs[Long]("n_rooms") === 1L)
    assert(r.getAs[Boolean]("kitchen") === true)
    assert(r.getAs[Boolean]("service_room") === false)
    assert(r.getAs[Long]("n_stations") === 2L)
    assert(r.getAs[Double]("walk_time_station_min") === 5.0)
    assert(r.getAs[Double]("walk_time_station_avg") === 6.0)
    assert(r.getAs[String]("ward") === "渋谷区")
    assert(r.getAs[String]("district") === "恵比寿南")
  }

  test("basement floor range and ワンルーム layout") {
    val b = scraped.filter(col("jnc_id") === "000000000003").head()
    assert(b.getAs[Long]("min_floor") === 0L)
    assert(b.getAs[Long]("max_floor") === 1L)
    assert(b.getAs[Long]("gratuity") === 125000L)
    val w = scraped.filter(col("jnc_id") === "000000000007").head()
    assert(w.getAs[Long]("n_rooms") === 1L)
    assert(w.getAs[Boolean]("kitchen") === false)
    assert(w.getAs[Long]("building_age") === 0L)
    assert(w.getAs[Long]("min_floor") === 3L)
    assert(w.getAs[Long]("max_floor") === 5L)
  }

  test("schema matches the golden 29-column frame") {
    val got = scraped.drop("source_file", "source_order").schema
    assert(got.fields.map(f => (f.name, f.dataType)).toSeq ===
      Schemas.properties.fields.map(f => (f.name, f.dataType)).toSeq)
  }

  test("zip variant produces identical rows") {
    val dir = Files.createTempDirectory("graft_zip")
    val zipPath = dir.resolve("pages.zip")
    val zos = new java.util.zip.ZipOutputStream(
      Files.newOutputStream(zipPath))
    zos.putNextEntry(new java.util.zip.ZipEntry("page_000001.html"))
    zos.write(fixture.getBytes("UTF-8"))
    zos.closeEntry(); zos.close()
    val fromZip = PropertiesFrame.scrape(spark, zipPath.toString)
    assert(fromZip.count() === 3)
    val a = scraped.drop("source_file", "html_file_last_modified_at")
    val b = fromZip.drop("source_file", "html_file_last_modified_at")
    assert(b.exceptAll(a).count() === 0)
    assert(a.exceptAll(b).count() === 0)
  }

  test("multiple zip archives parallelize: one glob read covers all") {
    val dir = Files.createTempDirectory("graft_multizip")
    (0 until 3).foreach { z =>
      val zos = new java.util.zip.ZipOutputStream(
        Files.newOutputStream(dir.resolve(f"day_$z%02d.zip")))
      zos.putNextEntry(new java.util.zip.ZipEntry(s"page_$z.html"))
      zos.write(pageHtml(Seq(
        building("アパート", s"多層荘$z", "東京都台東区元浅草１",
          Seq("都営大江戸線/新御徒町駅 歩4分"), "築3年", "2階建",
          Seq(room("6万円", "-", "-", "-", "1K", "18m2", "1階",
            f"00000000100$z")))), Some(1L)).getBytes("UTF-8"))
      zos.closeEntry(); zos.close()
    }
    val pages = graft.ingest.SuumoPages.readHtmlZip(spark, dir.toString + "/*.zip")
    assert(pages.count() === 3)
    val props = graft.ingest.PropertiesFrame.fromRaw(
      graft.ingest.SuumoPages.rawProperties(pages).toDF())
    assert(props.count() === 3)
  }

  test("no banner script → null banner timestamp") {
    val dir = Files.createTempDirectory("graft_html2")
    Files.writeString(dir.resolve("p.html"), pageHtml(Seq(
      building("アパート", "無印荘", "東京都台東区元浅草１",
        Seq("都営大江戸線/新御徒町駅 歩4分"), "築3年", "2階建",
        Seq(room("6万円", "-", "-", "-", "1K", "18m2", "1階",
          "000000000008")))), bannerMs = None))
    val df = PropertiesFrame.scrape(spark, dir.toString)
    assert(df.count() === 1)
    assert(df.head().isNullAt(df.schema.fieldIndex("html_file_banner_timestamp")))
  }
}
