package graft.ingest

import java.nio.file.{Files, Path}

/** Deterministic synthetic Suumo-shaped pages (FIXTURES.md §1). The real
  * fixture cannot be redistributed (reference README.md:166-167), so both
  * the golden tests and the pipeline demo query synthesize pages with the
  * same class-tagged structure the reference's selectors consume.
  */
/** One parser-output row [[SyntheticSuumo.expectedRooms]] predicts from
  * generation arithmetic alone (field types match PropertiesFrame's).
  */
final case class ExpectedRoom(
    page: String, jnc_id: String, building_category: String,
    building_title: String, building_address: String, building_age: Long,
    building_floors: Long, rent: Long, admin_fee: Long, deposit: Long,
    gratuity: Long, layout: String, area: Double, min_floor: Long,
    max_floor: Long, url: String, new_arrival: Boolean, n_rooms: Long,
    service_room: Boolean, living_room: Boolean, dining_room: Boolean,
    kitchen: Boolean, n_stations: Long, walk_time_station_min: Double,
    walk_time_station_avg: Double, ward: String, district: String,
    html_file_banner_timestamp: Double)

object SyntheticSuumo {

  def room(rent: String, admin: String, deposit: String, gratuity: String,
      layout: String, area: String, floor: String, jnc: String,
      newArrival: Boolean = false): String = {
    val na = if (newArrival)
      """<span class="cassetteitem_other-checkbox--newarrival">本日の新着物件</span>"""
    else ""
    s"""<tbody>
       |<tr>
       |<td>x</td><td>y</td>
       |<td> $floor </td>
       |<td><span class="cassetteitem_price cassetteitem_price--rent">$rent</span>
       |<span class="cassetteitem_price cassetteitem_price--administration">$admin</span></td>
       |<td><span class="cassetteitem_price cassetteitem_price--deposit">$deposit</span>
       |<span class="cassetteitem_price cassetteitem_price--gratuity">$gratuity</span></td>
       |<td><span class="cassetteitem_madori">$layout</span>
       |<span class="cassetteitem_menseki">$area</span></td>
       |<td class="ui-text--midium ui-text--bold"><a href="/chintai/jnc_$jnc/?bc=100">詳細</a></td>
       |<td>$na</td>
       |</tr>
       |</tbody>""".stripMargin
  }

  def building(category: String, title: String, address: String,
      transport: Seq[String], age: String, floors: String,
      rooms: Seq[String]): String =
    s"""<div class="cassetteitem">
       |<div class="cassetteitem_content-label">$category</div>
       |<div class="cassetteitem_content-title">$title</div>
       |<ul>
       |<li class="cassetteitem_detail-col1">$address</li>
       |<li class="cassetteitem_detail-col2">${transport.map(t => s"<div>$t</div>").mkString}</li>
       |<li class="cassetteitem_detail-col3"><div>$age</div><div>$floors</div></li>
       |</ul>
       |<table class="cassetteitem_other">${rooms.mkString}</table>
       |</div>""".stripMargin

  def pageHtml(buildings: Seq[String], bannerMs: Option[Long]): String = {
    val script = bannerMs
      .map(ms => s"""<script>var ad = "https://x.example/?a=1&amp;times=$ms&amp;b=2";</script>""")
      .getOrElse("<script>var nothing = 1;</script>")
    s"<html><head>$script</head><body>${buildings.mkString}</body></html>"
  }

  private val wards = Vector("渋谷区", "台東区", "新宿区", "世田谷区", "目黒区")
  private val districts = Vector("恵比寿南", "元浅草", "神泉町", "三軒茶屋", "中目黒")
  private val layouts = Vector("1K", "2DK", "3LDK", "ワンルーム", "4SLDK")

  /** Deterministic page: `idx` seeds every field. Roughly 1-in-13 rooms
    * carries an unparseable rent (the reference's skip path) and every
    * 11th building a non-Tokyo address.
    */
  def page(idx: Int, buildingsPerPage: Int = 10,
      roomsPerBuilding: Int = 3): String = {
    val bs = (0 until buildingsPerPage).map { b =>
      val n = idx * buildingsPerPage + b
      val bad = n % 11 == 10
      val address =
        if (bad) s"神奈川県横浜市中区山下町${n % 30 + 1}"
        else s"東京都${wards(n % 5)}${districts(n % 5)}${n % 12 + 1}"
      val rooms = (0 until roomsPerBuilding).map { r =>
        val k = n * roomsPerBuilding + r
        val rent = if (k % 13 == 12) "8.万円" else s"${5 + k % 20}.${k % 10}万円"
        room(rent,
          admin = if (k % 4 == 0) "-" else s"${1000 + k % 9 * 500}円",
          deposit = s"${5 + k % 20}万円",
          gratuity = if (k % 3 == 0) "-" else s"${5 + k % 10}万円",
          layout = layouts(k % 5),
          area = s"${15 + k % 60}.${k % 100 / 10}m2",
          floor = k % 7 match {
            case 6 => "B1-1階"
            case 5 => s"${k % 4 + 2}-${k % 4 + 4}階"
            case f => s"${f + 1}階"
          },
          jnc = f"${k % 9000}%012d", // collisions → dedup work
          newArrival = k % 5 == 0)
      }
      building(
        category = if (n % 2 == 0) "賃貸マンション" else "アパート",
        title = s"グラフト荘$n",
        address = address,
        transport = Seq(s"ＪＲ山手線/駅${n % 9} 歩${n % 15 + 1}分",
          s"東京メトロ/駅${n % 7} 歩${n % 9 + 2}分"),
        age = if (n % 17 == 0) "新築" else s"築${n % 40 + 1}年",
        floors = s"${n % 12 + 2}階建",
        rooms = rooms)
    }
    pageHtml(bs, bannerMs = Some(1609140469000L + idx))
  }

  /** Write n deterministic pages under dir; idempotent. The child
    * directory is keyed by a content hash of the generated first page,
    * so editing the generator can never leave stale fixtures from a
    * previous code version in place.
    */
  def writePages(dir: Path, n: Int, buildingsPerPage: Int = 10,
      roomsPerBuilding: Int = 3): Path = {
    val version = Integer.toHexString(
      page(0, buildingsPerPage, roomsPerBuilding).hashCode)
    val target = dir.resolve(s"v$version-n$n")
    Files.createDirectories(target)
    (0 until n).foreach { i =>
      val p = target.resolve(f"page_$i%06d.html")
      if (!Files.exists(p))
        Files.writeString(p, page(i, buildingsPerPage, roomsPerBuilding))
    }
    target
  }

  /** Ground truth the parser is expected to emit for the surviving rooms
    * of [[page]] — derived from the generator's own arithmetic and the
    * reference's documented parse formulas (`int(float(s) * mult)`,
    * "-" → 0, B-floor zero-basing, ワンルーム layout, …), NOT from the
    * HTML or the Catalyst parsers under test. This is the structural
    * oracle for the scrape fan-out (S1-S4): generation intent and parse
    * output are two independent derivations of the same rows, so a
    * hash match is a real correctness signal, not a tautology.
    *
    * Skips mirror the reference's two row-skip sites: a room whose rent
    * is unparseable (k % 13 == 12 renders "8.万円") and every room of a
    * building with a non-Tokyo address (n % 11 == 10; ward is the
    * validity signal).
    */
  def expectedRooms(nPages: Int, buildingsPerPage: Int = 10,
      roomsPerBuilding: Int = 3): Seq[ExpectedRoom] = {
    val layoutInfo = Map(
      "1K" -> (1L, false, false, false, true),
      "2DK" -> (2L, false, false, true, true),
      "3LDK" -> (3L, false, true, true, true),
      "ワンルーム" -> (1L, false, false, false, false),
      "4SLDK" -> (4L, true, true, true, true))
    for {
      idx <- 0 until nPages
      b <- 0 until buildingsPerPage
      n = idx * buildingsPerPage + b
      if n % 11 != 10 // non-Tokyo address: ward null, building dropped
      r <- 0 until roomsPerBuilding
      k = n * roomsPerBuilding + r
      if k % 13 != 12 // "8.万円": rent unparseable, room dropped
    } yield {
      val jnc = f"${k % 9000}%012d"
      val layout = layouts(k % 5)
      val (nRooms, sRoom, lRoom, dRoom, kitchen) = layoutInfo(layout)
      val (minFloor, maxFloor) = k % 7 match {
        case 6 => (0L, 1L) // "B1-1階": B1 is zero-based
        case 5 => ((k % 4 + 2).toLong, (k % 4 + 4).toLong)
        case f => ((f + 1).toLong, (f + 1).toLong)
      }
      // the reference's money formula: int(float(s) * mult) — same IEEE
      // double product + truncation in Python, DuckDB, and Spark
      val rent = (s"${5 + k % 20}.${k % 10}".toDouble * 10000).toLong
      val walkA = (n % 15 + 1).toDouble
      val walkB = (n % 9 + 2).toDouble
      ExpectedRoom(
        page = f"page_$idx%06d.html",
        jnc_id = jnc,
        building_category = if (n % 2 == 0) "賃貸マンション" else "アパート",
        building_title = s"グラフト荘$n",
        building_address = s"東京都${wards(n % 5)}${districts(n % 5)}${n % 12 + 1}",
        building_age = if (n % 17 == 0) 0L else (n % 40 + 1).toLong,
        building_floors = (n % 12 + 2).toLong,
        rent = rent,
        admin_fee = if (k % 4 == 0) 0L else (1000 + k % 9 * 500).toLong,
        deposit = (5 + k % 20) * 10000L,
        gratuity = if (k % 3 == 0) 0L else (5 + k % 10) * 10000L,
        layout = layout,
        area = s"${15 + k % 60}.${k % 100 / 10}".toDouble,
        min_floor = minFloor,
        max_floor = maxFloor,
        url = s"https://suumo.jp/chintai/jnc_$jnc/?bc=100",
        new_arrival = k % 5 == 0,
        n_rooms = nRooms,
        service_room = sRoom,
        living_room = lRoom,
        dining_room = dRoom,
        kitchen = kitchen,
        n_stations = 2L,
        walk_time_station_min = math.min(walkA, walkB),
        walk_time_station_avg = (walkA + walkB) / 2.0,
        ward = wards(n % 5),
        district = districts(n % 5),
        html_file_banner_timestamp =
          math.rint((1609140469000.0 + idx) / 1000.0))
    }
  }

  /** Synthetic SJIS location-reference CSV covering the wards above. */
  def writeLocationCsv(dir: Path): Path = {
    Files.createDirectories(dir)
    val header = "都道府県コード,都道府県名,市区町村コード,市区町村名," +
      "大字町丁目コード,大字町丁目名,緯度,経度,原典資料コード,大字・字・丁目区分コード"
    val rows = for {
      (w, wi) <- wards.zipWithIndex
      (d, di) <- districts.zipWithIndex
      chome <- 1 to 12
    } yield {
      val lat = 35.6 + wi * 0.01 + di * 0.001 + chome * 0.0001
      val lon = 139.7 + wi * 0.01 + di * 0.001 + chome * 0.0001
      val name = s"$d${graft.functions.JpText.int2kanji(chome)}丁目"
      f"13,東京都,131$wi%02d,$w,13113000$wi$di$chome,$name,$lat%.6f,$lon%.6f,1,3"
    }
    val p = dir.resolve("location_reference.csv")
    Files.write(p, (header + "\n" + rows.mkString("\n"))
      .getBytes(java.nio.charset.Charset.forName("Shift_JIS")))
    p
  }
}
