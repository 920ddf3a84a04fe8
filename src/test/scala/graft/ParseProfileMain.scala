package graft

import graft.ingest.{HtmlExtract, SuumoPages, SyntheticSuumo}

/** Round-17 microbench: where does extractPage's ~180 ms/page go?
  * Times the full parse and its component selector passes on the
  * bench-shaped synthetic page (50 buildings × 4 rooms).
  * Run: Test/runMain graft.ParseProfileMain
  */
object ParseProfileMain {
  def main(args: Array[String]): Unit = {
    val html = SyntheticSuumo.page(0, buildingsPerPage = 50,
      roomsPerBuilding = 4)
    println(s"page size: ${html.length} chars")
    def time(label: String, reps: Int)(f: => Any): Unit = {
      (1 to 3).foreach(_ => f) // warm
      val t0 = System.nanoTime()
      (1 to reps).foreach(_ => f)
      println(f"$label: ${(System.nanoTime() - t0) / 1e6 / reps}%.2f ms/rep")
    }
    time("extractPage", 20)(SuumoPages.extractPage(html, 1.0, "f"))
    time("elementsByClass(div,cassetteitem)", 20)(
      HtmlExtract.elementsByClass(html, "div", "cassetteitem"))
    time("elementsByTag(script)", 20)(HtmlExtract.elementsByTag(html, "script"))
    val b = HtmlExtract.elementsByClass(html, "div", "cassetteitem").head
    println(s"building size: ${b.length} chars")
    time("building: firstByClass x4 + col scans", 1000) {
      HtmlExtract.firstByClass(b, "div", "cassetteitem_content-label")
      HtmlExtract.firstByClass(b, "div", "cassetteitem_content-title")
      HtmlExtract.firstByClass(b, "li", "cassetteitem_detail-col1")
      HtmlExtract.firstByClass(b, "li", "cassetteitem_detail-col2")
    }
    val table = HtmlExtract.elementsByClass(b, "table", "cassetteitem_other").head
    val room = HtmlExtract.elementsByTag(table, "tbody").head
    println(s"room size: ${room.length} chars")
    time("room: span x6 + tds + href", 1000) {
      Seq("cassetteitem_price cassetteitem_price--rent",
        "cassetteitem_price cassetteitem_price--administration",
        "cassetteitem_price cassetteitem_price--deposit",
        "cassetteitem_price cassetteitem_price--gratuity",
        "cassetteitem_madori", "cassetteitem_menseki")
        .foreach(c => HtmlExtract.firstByClass(room, "span", c))
      HtmlExtract.elementsByTag(room, "td")
      HtmlExtract.existsClass(room, "cassetteitem_other-checkbox--newarrival")
    }
  }
}
