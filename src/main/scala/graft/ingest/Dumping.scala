package graft.ingest

import org.apache.spark.sql.{Dataset, SparkSession}

import scala.collection.mutable.LinkedHashMap

/** The dump-side utilities (libs/otokuna/dumping.py): URL query-param
  * editing (F13), pagination scraping (A6), condition-code extraction
  * (J4) with value validation (P5), search-URL building, and the
  * sequential/parallel page-fetch drivers (S7/S8). No network I/O lives
  * here — fetching is an injected `Int => String` / `String => String`
  * so the drivers are testable and the Spark fan-out is the real
  * parallelism (the reference's 5-worker trio pool,
  * svc/dump_property_data.py:17-72).
  */
object Dumping {

  val SuumoUrl = "https://suumo.jp"

  val TokyoSpecialWards: Seq[String] = Seq(
    "千代田区", "中央区", "港区", "新宿区", "文京区", "台東区", "墨田区", "江東区",
    "品川区", "目黒区", "大田区", "世田谷区", "渋谷区", "中野区", "杉並区", "豊島区",
    "北区", "荒川区", "板橋区", "練馬区", "足立区", "葛飾区", "江戸川区")

  // ---- F13: query-param editing (dumping.py:67-99) -----------------------

  private def splitUrl(url: String): (String, LinkedHashMap[String, List[String]]) = {
    val qIdx = url.indexOf('?')
    if (qIdx < 0) (url, LinkedHashMap.empty)
    else {
      val base = url.substring(0, qIdx)
      val query = LinkedHashMap.empty[String, List[String]]
      url.substring(qIdx + 1).split("&").filter(_.nonEmpty).foreach { seg =>
        val eq = seg.indexOf('=')
        val (k, v) = if (eq < 0) (seg, "") else (seg.take(eq), seg.drop(eq + 1))
        query.updateWith(k)(old => Some(old.getOrElse(Nil) :+ v))
      }
      (base, query)
    }
  }

  private def joinUrl(base: String, query: LinkedHashMap[String, List[String]]): String = {
    val qs = query.iterator
      .flatMap { case (k, vs) => vs.map(v => s"$k=$v") }
      .mkString("&")
    if (qs.isEmpty) base else s"$base?$qs"
  }

  /** remove_params (dumping.py:67-76): drop params if present. */
  def removeParams(url: String, params: Seq[String]): String = {
    val (base, query) = splitUrl(url)
    params.foreach(query.remove)
    joinUrl(base, query)
  }

  def removePageParam(url: String): String = removeParams(url, Seq("page"))

  /** add_params (dumping.py:84-91): set/replace params in place, append
    * new ones at the end (python dict insertion-order semantics).
    */
  def addParams(url: String, valuesByParam: Seq[(String, Seq[String])]): String = {
    val (base, query) = splitUrl(url)
    valuesByParam.foreach { case (k, vs) => query.update(k, vs.toList) }
    joinUrl(base, query)
  }

  /** add_results_per_page_param (dumping.py:94-99): pc=50, exactly once. */
  def addResultsPerPageParam(url: String): String =
    addParams(url, Seq("pc" -> Seq("50")))

  // ---- J4/P5: condition codes (dumping.py:33-62) -------------------------

  /** Checkbox→label pairing: for every input[type=checkbox][name=condId],
    * resolve label[for=input.id] and map its text to the checkbox value.
    */
  def conditionCodesByValue(html: String, condId: String): Map[String, String] =
    HtmlExtract.tagAttrs(html, "input").iterator
      .filter(a => a.get("type").contains("checkbox") && a.get("name").contains(condId))
      .flatMap { a =>
        for {
          id <- a.get("id")
          code <- a.get("value")
          label <- HtmlExtract.elementsByAttr(html, "label", "for", id).headOption
          value <- HtmlExtract.strippedStrings(label).headOption
        } yield value -> code
      }.toMap

  /** _build_condition_codes (dumping.py:44-63) from an already-fetched
    * condition page: validates requested values (P5) and returns sorted
    * codes per condition id.
    */
  def buildConditionCodes(html: String,
      buildingCategories: Option[Seq[String]],
      wards: Option[Seq[String]],
      specialConditions: Option[Seq[String]]): Map[String, Seq[String]] = {
    val wanted = Seq("ts" -> buildingCategories, "sc" -> wards,
      "tc" -> specialConditions)
    wanted.flatMap { case (condId, valuesOpt) =>
      valuesOpt.map { values =>
        val codesByValue = conditionCodesByValue(html, condId)
        val notFound = values.toSet -- codesByValue.keySet
        if (notFound.nonEmpty)
          throw new RuntimeException(
            s"invalid values for condition $condId: $notFound")
        condId -> codesByValue.collect {
          case (v, code) if values.contains(v) => code
        }.toSeq.sorted
      }
    }.toMap
  }

  /** build_search_url (dumping.py:102-138), with the condition page
    * supplied (the reference fetches it; we take HTML to stay
    * network-free).
    */
  def buildSearchUrl(conditionPageHtml: String,
      buildingCategories: Seq[String], wards: Seq[String],
      onlyToday: Boolean = true): String = {
    val base = s"$SuumoUrl/jj/chintai/ichiran/FR301FC001/?" +
      "&ar=030&bs=040&ta=13" +
      "&cb=0.0&ct=9999999" +
      "&mb=0&mt=9999999" +
      "&et=9999999&cn=9999999" +
      "&pc=50"
    val special = if (onlyToday) Some(Seq("本日の新着物件")) else None
    val codes = buildConditionCodes(conditionPageHtml,
      Some(buildingCategories), Some(wards), special)
    addParams(base, Seq("ts", "sc", "tc").flatMap(id =>
      codes.get(id).map(id -> _)))
  }

  // ---- A6: pagination scraping (dumping.py:141-167) ----------------------

  /** scrape_number_of_pages: last pagination link text; a single page has
    * exactly one non-link item.
    */
  def scrapeNumberOfPages(html: String): Int = {
    val ol = HtmlExtract.firstByClass(html, "ol", "pagination-parts").getOrElse("")
    val links = HtmlExtract.elementsByTag(ol, "li")
      .flatMap(li => HtmlExtract.elementsByTag(li, "a"))
    if (links.nonEmpty) HtmlExtract.text(links.last).trim.toInt
    else {
      require(HtmlExtract.elementsByTag(ol, "li").length == 1,
        "unexpected pagination structure")
      1
    }
  }

  /** scrape_next_page_url: href of the 次へ anchor, or None on the last
    * page.
    */
  def scrapeNextPageUrl(html: String): Option[String] =
    HtmlExtract.firstByClass(html, "div", "pagination pagination_set-nav")
      .flatMap { div =>
        val anchorRe = "(?i)<a\\b([^>]*)>".r
        anchorRe.findAllMatchIn(div).collectFirst {
          case m if {
            val end = HtmlExtract.text(
              div.substring(m.end, div.indexOf("</a", m.end) max m.end))
            end == "次へ"
          } =>
            """href\s*=\s*["']([^"']*)["']""".r
              .findFirstMatchIn(m.group(1)).map(SuumoUrl + _.group(1))
        }.flatten
      }

  /** scrape_search_conditions: prefers the long-form paragraph. */
  def scrapeSearchConditions(html: String): String = {
    val p = HtmlExtract
      .firstByClass(html, "p", "conditionbox-info-txt conditionbox-info-txt--all")
      .orElse(HtmlExtract.firstByClass(html, "p", "conditionbox-info-txt"))
      .getOrElse("")
    HtmlExtract.strippedStrings(p).headOption.getOrElse("")
  }

  // ---- S7: sequential pagination driver (dumping.py:170-207) -------------

  /** Out-of-the-box fetch: [[HttpFetch.default]] wrapped in the
    * reference's retry/backoff loop. This is what the pagination
    * drivers use when no fetch is injected.
    */
  def defaultFetch(): String => String = retryingFetch(HttpFetch.default())

  /** The reference's `_get_page` retry loop (dumping.py:194-207): up to
    * `maxAttempts` tries, sleeping `backoffMillis` after EVERY failure
    * (including the last, as the reference does), then RuntimeException.
    * `sleep` is injectable so specs don't wait wall-clock.
    */
  def retryingFetch(fetch: String => String = HttpFetch.default(),
      maxAttempts: Int = 3,
      backoffMillis: Long = 10000L,
      sleep: Long => Unit = Thread.sleep): String => String = url => {
    var attempt = 0
    var out: Option[String] = None
    while (out.isEmpty && attempt < maxAttempts) {
      try out = Some(fetch(url))
      catch {
        case scala.util.control.NonFatal(_) =>
          attempt += 1
          sleep(backoffMillis)
      }
    }
    out.getOrElse(throw new RuntimeException(s"Could not get: $url"))
  }

  /** Iterate result pages by following 次へ links. `fetch` is injected;
    * wrap it with [[retryingFetch]] for the reference's retry behavior.
    * `politenessMillis` reproduces the reference's between-page sleep
    * (dumping.py:190-191); the fetch site stays a sequential driver-side
    * loop exactly because the target rate-limits — parallelism belongs
    * to [[parallelFetchPages]] when the target allows it.
    */
  def iterSearchResults(searchUrl: String,
      fetch: String => String = defaultFetch(),
      politenessMillis: Long = 0L,
      sleep: Long => Unit = Thread.sleep): Iterator[(Int, String)] =
    new Iterator[(Int, String)] {
      private var page = 1
      private var done = false
      override def hasNext: Boolean = !done
      override def next(): (Int, String) = {
        if (page > 1 && politenessMillis > 0) sleep(politenessMillis)
        val html = fetch(addParams(searchUrl, Seq("page" -> Seq(page.toString))))
        if (scrapeNextPageUrl(html).isEmpty) done = true
        val out = (page, html)
        page += 1
        out
      }
    }

  // ---- S8: parallel page fetch (svc/dump_property_data.py:17-72) ---------

  /** Page-1 gives the page count; the remaining pages fan out as Spark
    * tasks (`repartition(parallelism)` bounds the concurrent fetches the
    * way the reference's 5-worker pool did).
    */
  def parallelFetchPages(spark: SparkSession, searchUrl: String,
      nPages: Int, parallelism: Int,
      fetch: String => String = defaultFetch()): Dataset[(Int, String)] = {
    import spark.implicits._
    spark.range(1, nPages + 1L)
      .repartition(parallelism)
      .map { p =>
        val url = addParams(searchUrl, Seq("page" -> Seq(p.toString)))
        (p.toInt, fetch(url))
      }
  }
}
