package graft.ingest

/** Default `fetch` implementation for the pagination drivers
  * ([[Dumping.iterSearchResults]], [[Dumping.parallelFetchPages]],
  * [[Dumping.retryingFetch]]), built on `java.net.http.HttpClient` —
  * JDK-only, no dependency. The seam stays injectable (specs inject
  * in-memory fetchers and stay network-free); this is what runs when a
  * user points the library at a real URL out of the box, closing the
  * gap where the reference's dumping.py:170-207 actually fetched with
  * `requests` but the port shipped no default.
  *
  * Serialization contract: [[Dumping.parallelFetchPages]] ships the
  * fetch function to executors, so the default is a case class whose
  * `HttpClient` is `@transient lazy` — each executor JVM builds its
  * own client on first use; only the settings travel.
  */
object HttpFetch {

  /** A ready-to-use GET fetcher: follows redirects, per-request
    * timeout, non-2xx → IOException (which [[Dumping.retryingFetch]]
    * turns into the reference's retry/backoff loop). Body decoding
    * honors the response charset, defaulting to UTF-8.
    */
  def default(timeoutMillis: Long = 30000L,
      userAgent: String = "graft/0.1"): String => String =
    DefaultFetch(timeoutMillis, userAgent)

  final case class DefaultFetch(timeoutMillis: Long, userAgent: String)
      extends (String => String) with Serializable {
    require(timeoutMillis > 0, s"timeoutMillis must be > 0: $timeoutMillis")

    @transient private lazy val client: java.net.http.HttpClient =
      java.net.http.HttpClient.newBuilder()
        .connectTimeout(java.time.Duration.ofMillis(timeoutMillis))
        .followRedirects(java.net.http.HttpClient.Redirect.NORMAL)
        .build()

    override def apply(url: String): String = {
      val req = java.net.http.HttpRequest
        .newBuilder(java.net.URI.create(url))
        .timeout(java.time.Duration.ofMillis(timeoutMillis))
        .header("User-Agent", userAgent)
        .GET()
        .build()
      val resp = client.send(req,
        java.net.http.HttpResponse.BodyHandlers.ofString())
      if (resp.statusCode() / 100 != 2)
        throw new java.io.IOException(
          s"HTTP ${resp.statusCode()} for $url")
      resp.body()
    }
  }
}
