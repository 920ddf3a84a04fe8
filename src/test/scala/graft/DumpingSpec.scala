package graft

import graft.ingest.Dumping

/** Semantics ported from libs/tests/test_dumping.py (URL editing,
  * pagination, condition codes) on synthesized fixtures.
  */
class DumpingSpec extends SparkSpec {

  test("F13: remove/add params preserve order and multiplicity") {
    assert(Dumping.removePageParam("https://x/y?page=2&pc=50") === "https://x/y?pc=50")
    assert(Dumping.removePageParam("https://x/y?pc=50") === "https://x/y?pc=50")
    assert(Dumping.removePageParam("https://x/y") === "https://x/y")
    assert(Dumping.addResultsPerPageParam("https://x/y?a=1") === "https://x/y?a=1&pc=50")
    // existing pc collapses to one value, in place
    assert(Dumping.addResultsPerPageParam("https://x/y?pc=10&a=1&pc=20") ===
      "https://x/y?pc=50&a=1")
    // multi-valued params survive a round trip
    assert(Dumping.addParams("https://x/y?sc=1&sc=2", Seq("page" -> Seq("3"))) ===
      "https://x/y?sc=1&sc=2&page=3")
  }

  val conditionPage: String =
    """<html><body>
      |<input type="checkbox" name="ts" id="ts1" value="1"><label for="ts1">マンション</label>
      |<input type="checkbox" name="ts" id="ts2" value="2"><label for="ts2">アパート</label>
      |<input type="checkbox" name="sc" id="sc1" value="13104"><label for="sc1">新宿区</label>
      |<input type="checkbox" name="sc" id="sc2" value="13113"><label for="sc2">渋谷区</label>
      |<input type="checkbox" name="tc" id="tc1" value="0401303"><label for="tc1">本日の新着物件</label>
      |</body></html>""".stripMargin

  test("J4: condition codes from checkbox/label pairs") {
    assert(Dumping.conditionCodesByValue(conditionPage, "ts") ===
      Map("マンション" -> "1", "アパート" -> "2"))
    assert(Dumping.conditionCodesByValue(conditionPage, "sc") ===
      Map("新宿区" -> "13104", "渋谷区" -> "13113"))
  }

  test("P5: unknown condition values raise") {
    val e = intercept[RuntimeException] {
      Dumping.buildConditionCodes(conditionPage, Some(Seq("ビル")), None, None)
    }
    assert(e.getMessage.contains("ts"))
  }

  test("build_search_url appends sorted condition codes") {
    val url = Dumping.buildSearchUrl(conditionPage,
      buildingCategories = Seq("マンション"),
      wards = Seq("渋谷区", "新宿区"), onlyToday = true)
    assert(url.contains("pc=50"))
    assert(url.contains("ts=1"))
    assert(url.contains("sc=13104&sc=13113")) // sorted codes
    assert(url.contains("tc=0401303"))
    assert(url.startsWith("https://suumo.jp/jj/chintai/ichiran/FR301FC001/?ar=030"))
  }

  def pageWithPagination(nPages: Int, current: Int): String = {
    val links = (1 to nPages).map(i => s"""<li><a href="/p$i">$i</a></li>""").mkString
    val next = if (current < nPages)
      s"""<div class="pagination pagination_set-nav"><p><a href="/next$current">次へ</a></p></div>"""
    else """<div class="pagination pagination_set-nav"><p></p></div>"""
    s"""<html><body><ol class="pagination-parts">$links</ol>$next</body></html>"""
  }

  test("A6: page count from pagination links; single page without links") {
    assert(Dumping.scrapeNumberOfPages(pageWithPagination(1607, 1)) === 1607)
    assert(Dumping.scrapeNumberOfPages(
      """<html><ol class="pagination-parts"><li>1</li></ol></html>""") === 1)
  }

  test("A6: next-page link presence") {
    assert(Dumping.scrapeNextPageUrl(pageWithPagination(3, 1)) ===
      Some("https://suumo.jp/next1"))
    assert(Dumping.scrapeNextPageUrl(pageWithPagination(3, 3)) === None)
  }

  test("A6: search conditions prefer the long form") {
    val longForm =
      """<p class="conditionbox-info-txt">short</p>
        |<p class="conditionbox-info-txt conditionbox-info-txt--all"> full conditions </p>""".stripMargin
    assert(Dumping.scrapeSearchConditions(longForm) === "full conditions")
    assert(Dumping.scrapeSearchConditions(
      """<p class="conditionbox-info-txt">short</p>""") === "short")
  }

  test("S7: sequential iterator follows 次へ until the last page") {
    val pages = (1 to 3).map(i => pageWithPagination(3, i))
    val fetched = scala.collection.mutable.ArrayBuffer.empty[String]
    val it = Dumping.iterSearchResults("https://x/search?pc=50", url => {
      fetched += url
      val p = "page=(\\d+)".r.findFirstMatchIn(url).get.group(1).toInt
      pages(p - 1)
    })
    val out = it.toVector
    assert(out.map(_._1) === Vector(1, 2, 3))
    assert(fetched.toVector === Vector(
      "https://x/search?pc=50&page=1",
      "https://x/search?pc=50&page=2",
      "https://x/search?pc=50&page=3"))
  }

  test("S7: retryingFetch retries with backoff, then raises") {
    val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
    var calls = 0
    val flaky = Dumping.retryingFetch(url => {
      calls += 1
      if (calls < 3) throw new RuntimeException("boom")
      s"ok:$url"
    }, maxAttempts = 3, backoffMillis = 10000L, sleep = sleeps += _)
    assert(flaky("https://x/p") === "ok:https://x/p")
    assert(calls === 3)
    assert(sleeps.toVector === Vector(10000L, 10000L))

    sleeps.clear()
    val dead = Dumping.retryingFetch(
      _ => throw new RuntimeException("down"),
      maxAttempts = 3, backoffMillis = 10000L, sleep = sleeps += _)
    val err = intercept[RuntimeException](dead("https://x/q"))
    assert(err.getMessage.contains("https://x/q"))
    // the reference sleeps after every failed attempt, including the last
    assert(sleeps.toVector === Vector(10000L, 10000L, 10000L))
  }

  test("S7: politeness sleep between pages, none before the first") {
    val pages = (1 to 3).map(i => pageWithPagination(3, i))
    val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
    val out = Dumping.iterSearchResults("https://x/search?pc=50", url => {
      val p = "page=(\\d+)".r.findFirstMatchIn(url).get.group(1).toInt
      pages(p - 1)
    }, politenessMillis = 1500L, sleep = sleeps += _).toVector
    assert(out.map(_._1) === Vector(1, 2, 3))
    assert(sleeps.toVector === Vector(1500L, 1500L))
  }

  test("S8: parallel fetch fans pages out as Spark tasks") {
    val out = Dumping.parallelFetchPages(spark, "https://x/s?pc=50",
        nPages = 20, parallelism = 4,
        url => s"<html>${url.takeRight(2)}</html>")
      .collect().toMap
    assert(out.keySet === (1 to 20).toSet)
  }

  /** Local JDK HttpServer on an ephemeral port — the specs for the
    * DEFAULT fetch stay network-free while exercising the real
    * java.net.http client end to end.
    */
  private def withServer[A](
      handler: com.sun.net.httpserver.HttpExchange => (Int, String))(
      body: String => A): A = {
    val srv = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    srv.createContext("/", (ex: com.sun.net.httpserver.HttpExchange) => {
      val (code, payload) = handler(ex)
      val bytes = payload.getBytes("UTF-8")
      ex.getResponseHeaders.add("Content-Type", "text/html; charset=utf-8")
      ex.sendResponseHeaders(code, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    })
    srv.start()
    try body(s"http://127.0.0.1:${srv.getAddress.getPort}")
    finally srv.stop(0)
  }

  test("HTTP default fetch: 2xx body, non-2xx raises for the retry loop") {
    withServer { ex =>
      if (ex.getRequestURI.getPath == "/ok") (200, "hello ページ")
      else (404, "nope")
    } { base =>
      val fetch = graft.ingest.HttpFetch.default(timeoutMillis = 5000L)
      assert(fetch(s"$base/ok") === "hello ページ")
      val err = intercept[java.io.IOException](fetch(s"$base/missing"))
      assert(err.getMessage.contains("404"))
    }
  }

  test("HTTP default fetch: retryingFetch turns 5xx into retries") {
    val hits = new java.util.concurrent.atomic.AtomicInteger(0)
    withServer { _ =>
      if (hits.incrementAndGet() < 3) (500, "down") else (200, "up")
    } { base =>
      val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
      val f = Dumping.retryingFetch(
        graft.ingest.HttpFetch.default(timeoutMillis = 5000L),
        maxAttempts = 5, backoffMillis = 1L, sleep = sleeps += _)
      assert(f(s"$base/flaky") === "up")
      assert(hits.get() === 3)
      assert(sleeps.size === 2)
    }
  }

  test("S7: iterSearchResults is callable with NO user-supplied fetch") {
    withServer { ex =>
      val q = Option(ex.getRequestURI.getQuery).getOrElse("")
      val p = "page=(\\d+)".r.findFirstMatchIn(q).map(_.group(1).toInt)
        .getOrElse(1)
      (200, pageWithPagination(3, p))
    } { base =>
      val out = Dumping.iterSearchResults(s"$base/search?pc=50").toVector
      assert(out.map(_._1) === Vector(1, 2, 3))
      assert(out.forall(_._2.contains("pagination-parts")))
    }
  }

  test("S8: default fetch serializes to Spark tasks (parallel fan-out)") {
    withServer { ex =>
      val q = Option(ex.getRequestURI.getQuery).getOrElse("")
      (200, s"<html>$q</html>")
    } { base =>
      val out = Dumping.parallelFetchPages(spark, s"$base/s?pc=50",
          nPages = 8, parallelism = 4,
          graft.ingest.HttpFetch.default(timeoutMillis = 5000L))
        .collect().toMap
      assert(out.keySet === (1 to 8).toSet)
      assert((1 to 8).forall(p => out(p).contains(s"page=$p")))
    }
  }
}
