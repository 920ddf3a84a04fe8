package graft.ingest

import scala.annotation.tailrec
import scala.collection.mutable.ArrayBuffer

/** Minimal class-anchored HTML element scanner — the JVM replacement for
  * the reference's BeautifulSoup selectors (libs/otokuna/scraping.py:
  * 189-235, 268-288). The Suumo page structure the reference consumes is
  * a stable set of class-tagged blocks (FIXTURES.md §1), so a tolerant
  * tag-balance scanner is sufficient; no general HTML parser is needed.
  *
  * Matching mirrors bs4: a class selector matches when every requested
  * token appears in the element's class attribute token list.
  *
  * One deliberate deviation from bs4 `find_all`: once an element
  * matches, the scan resumes AFTER its closing tag, so a nested element
  * that would match the same tag+class selector is not returned
  * separately (bs4 would include it). Safe for every current Suumo
  * selector — cassetteitem blocks never nest — but a selector
  * targeting genuinely nestable structure would under-extract; prefer
  * a second elementsBy* pass over the matched inner HTML for that.
  */
object HtmlExtract {

  // (?i) covers CLASS=/Class=; the captured value stays case-sensitive
  private val TagAttrClass = """(?i)class\s*=\s*["']([^"']*)["']""".r

  /** Per-tag compiled open-tag patterns (round 17): `elements()` runs
    * ~2,000 times per scraped page (once per nested selector call) and
    * `s"<$tag...".r` re-ran Pattern.compile on every one of them —
    * measured as a top scrape-throughput cost. The tag vocabulary is a
    * handful of ASCII names, so a tiny concurrent memo is exact and
    * unbounded-growth-free.
    */
  private val openReCache =
    new java.util.concurrent.ConcurrentHashMap[String, scala.util.matching.Regex]()
  private def openRe(tag: String): scala.util.matching.Regex =
    openReCache.computeIfAbsent(tag, t => s"(?i)<$t(\\s[^>]*)?>".r)
  private val voidReCache =
    new java.util.concurrent.ConcurrentHashMap[String, scala.util.matching.Regex]()
  private def voidRe(tag: String): scala.util.matching.Regex =
    voidReCache.computeIfAbsent(tag, t => s"(?i)<$t(\\s[^>]*)?/?>".r)

  /** Pre-compiled tag stripper for [[text]]/[[strippedStrings]] —
    * `String.replaceAll`/`split` compile their pattern on every call,
    * and these run tens of times per room record.
    */
  private val TagStrip = java.util.regex.Pattern.compile("<[^>]*>")

  /** Pre-compiled whitespace splitter: `String.split("\\s+")` has no
    * single-char fast path, so it too compiled a Pattern per call.
    */
  private val Ws = java.util.regex.Pattern.compile("\\s+")

  /** ASCII-only lowering: String.toLowerCase is locale-sensitive (a
    * Turkish-locale JVM lowers I→ı) and can CHANGE LENGTH (İ → i̇),
    * which would shift every index findElementEnd computes. Tag names
    * are ASCII, so this is both correct and cheaper.
    */
  private def asciiLower(s: String): String = {
    val arr = s.toCharArray
    var i = 0
    while (i < arr.length) {
      val c = arr(i)
      if (c >= 'A' && c <= 'Z') arr(i) = (c + 32).toChar
      i += 1
    }
    new String(arr)
  }

  /** All elements `<tag ... class~=cls...>`, returned as inner HTML. */
  def elementsByClass(html: String, tag: String, cls: String): Vector[String] =
    elements(html, tag, Some(cls))

  /** All elements of `tag` regardless of class. */
  def elementsByTag(html: String, tag: String): Vector[String] =
    elements(html, tag, None)

  private def classTokensOf(attrs: String): Set[String] =
    TagAttrClass.findFirstMatchIn(attrs)
      .map(m => Ws.split(m.group(1)).iterator.filter(_.nonEmpty).toSet)
      .getOrElse(Set.empty[String])

  private def elements(html: String, tag: String,
      cls: Option[String]): Vector[String] = {
    val wanted: Set[String] = cls.map(c => Ws.split(c).toSet).getOrElse(Set.empty)
    val out = ArrayBuffer.empty[String]
    val it = openRe(tag).findAllMatchIn(html)
    // lowercase once per scan — per-element lowering is quadratic on
    // MB-sized pages (it dominated scrape throughput before this)
    lazy val lower = asciiLower(html)
    var searchFrom = 0
    for (m <- it if m.start >= searchFrom) {
      val attrs = Option(m.group(1)).getOrElse("")
      if (wanted.subsetOf(classTokensOf(attrs))) {
        val innerStart = m.end
        val innerEnd = findElementEnd(html, lower, tag, innerStart)
        out += html.substring(innerStart, innerEnd)
        // do not re-match nested same-class elements inside this one
        searchFrom = innerEnd
      }
    }
    out.toVector
  }

  /** One scan of `tag`'s open tags resolving the FIRST match for EVERY
    * selector in `selectors` (each a whitespace-separated class-token
    * conjunction) — the N-selector replacement for N [[firstByClass]]
    * passes (round 17: the scrape parser ran 6 span selector passes
    * per room record; one pass is identical because "first match in
    * document order" is unaffected by the nested-skip rule that only
    * changes SECOND matches). Early-exits once all selectors resolve.
    */
  def firstByClasses(html: String, tag: String,
      selectors: Seq[String]): Map[String, String] = {
    val wanted = selectors.map(c => c -> Ws.split(c).toSet)
    var remaining = wanted.size
    val resolved = scala.collection.mutable.Map.empty[String, String]
    lazy val lower = asciiLower(html)
    val it = openRe(tag).findAllMatchIn(html)
    while (remaining > 0 && it.hasNext) {
      val m = it.next()
      val tokens = classTokensOf(Option(m.group(1)).getOrElse(""))
      var innerEnd = -1 // found lazily, at most once per element
      for ((sel, want) <- wanted
           if !resolved.contains(sel) && want.subsetOf(tokens)) {
        if (innerEnd < 0) innerEnd = findElementEnd(html, lower, tag, m.end)
        resolved(sel) = html.substring(m.end, innerEnd)
        remaining -= 1
      }
    }
    resolved.toMap
  }

  /** All elements of `tag` with their class-token sets, one scan —
    * same element set and skip-nested semantics as [[elementsByTag]],
    * with the class tokens the caller would otherwise re-scan for.
    *
    * TOP-LEVEL-ONLY semantics (r17 advisor): the skip-nested rule
    * skips ALL nested same-tag elements, including a class-matching
    * element nested inside a NON-matching ancestor — the replaced
    * per-class firstByClass scan would have found it. Equivalent for
    * the known Suumo layout (no nested tables inside the cassette
    * tds); a caller parsing markup that nests matching elements under
    * non-matching ancestors must walk the inner HTML explicitly.
    */
  def classedElementsByTag(html: String,
      tag: String): Vector[(Set[String], String)] = {
    val out = ArrayBuffer.empty[(Set[String], String)]
    lazy val lower = asciiLower(html)
    var searchFrom = 0
    for (m <- openRe(tag).findAllMatchIn(html) if m.start >= searchFrom) {
      val innerEnd = findElementEnd(html, lower, tag, m.end)
      out += ((classTokensOf(Option(m.group(1)).getOrElse("")),
        html.substring(m.end, innerEnd)))
      searchFrom = innerEnd
    }
    out.toVector
  }

  /** Index just before this element's closing tag, balancing nesting.
    * `lower` is the pre-lowercased html (same indices).
    */
  private def findElementEnd(html: String, lower: String, tag: String,
      from: Int): Int = {
    val open = s"<${asciiLower(tag)}"
    val close = s"</${asciiLower(tag)}"
    @tailrec
    def loop(pos: Int, depth: Int): Int = {
      val nextOpen = lower.indexOf(open, pos)
      val nextClose = lower.indexOf(close, pos)
      if (nextClose < 0) html.length
      else if (nextOpen >= 0 && nextOpen < nextClose) {
        // guard against prefix collisions (<td matching <table, …)
        if (isTagBoundary(lower, nextOpen + open.length))
          loop(nextOpen + open.length, depth + 1)
        else loop(nextOpen + open.length, depth)
      } else if (!isTagBoundary(lower, nextClose + close.length))
        loop(nextClose + close.length, depth) // </td matching </tbody, …
      else if (depth == 0) nextClose
      else loop(nextClose + close.length, depth - 1)
    }
    loop(from, 0)
  }

  private def isTagBoundary(s: String, i: Int): Boolean =
    i >= s.length || s.charAt(i) == '>' || s.charAt(i).isWhitespace || s.charAt(i) == '/'

  def firstByClass(html: String, tag: String, cls: String): Option[String] =
    elementsByClass(html, tag, cls).headOption

  /** True if any element carries the class (bs4 find(class_=...) != None). */
  def existsClass(html: String, cls: String): Boolean =
    TagAttrClass.findAllMatchIn(html)
      .exists(m => Ws.split(m.group(1)).contains(cls))

  /** First attribute value of the first matching element. */
  def attrFirstByClass(html: String, tag: String, cls: String,
      attr: String): Option[String] = {
    val wanted = Ws.split(cls).toSet
    openRe(tag).findAllMatchIn(html).collectFirst {
      case m if wanted.subsetOf(
        classTokensOf(Option(m.group(1)).getOrElse(""))) =>
        val attrs = Option(m.group(1)).getOrElse("")
        s"""$attr\\s*=\\s*["']([^"']*)["']""".r
          .findFirstMatchIn(attrs).map(_.group(1))
    }.flatten
  }

  /** Concatenated text of all text nodes (bs4 `.text`): tags stripped,
    * basic entities decoded, whitespace preserved.
    */
  def text(inner: String): String =
    decodeEntities(TagStrip.matcher(inner).replaceAll(""))

  /** bs4 `stripped_strings`: per-text-node, trimmed, non-empty. */
  def strippedStrings(inner: String): Vector[String] =
    TagStrip.split(inner).iterator
      .map(s => decodeEntities(s).trim)
      .filter(_.nonEmpty)
      .toVector

  private def decodeEntities(s: String): String =
    s.replace("&amp;", "&").replace("&lt;", "<").replace("&gt;", ">")
      .replace("&quot;", "\"").replace("&#39;", "'").replace("&nbsp;", " ")

  private val AttrRe = """([a-zA-Z_:][-a-zA-Z0-9_:.]*)\s*=\s*["']([^"']*)["']""".r

  /** Attribute maps of every `<tag ...>` occurrence — for void elements
    * (input, img, …) that have no closing tag and therefore no "inner".
    */
  def tagAttrs(html: String, tag: String): Vector[Map[String, String]] =
    voidRe(tag).findAllMatchIn(html).map { m =>
      val attrs = Option(m.group(1)).getOrElse("")
      AttrRe.findAllMatchIn(attrs)
        .map(a => asciiLower(a.group(1)) -> a.group(2)).toMap
    }.toVector

  /** Inner HTML of every element of `tag` whose attribute `attr` equals
    * `value` (e.g. label[for=checkbox-id]).
    */
  def elementsByAttr(html: String, tag: String, attr: String,
      value: String): Vector[String] = {
    val out = ArrayBuffer.empty[String]
    lazy val lower = asciiLower(html)
    for (m <- openRe(tag).findAllMatchIn(html)) {
      val attrs = Option(m.group(1)).getOrElse("")
      val attrMap = AttrRe.findAllMatchIn(attrs)
        .map(a => asciiLower(a.group(1)) -> a.group(2)).toMap
      if (attrMap.get(asciiLower(attr)).contains(value))
        out += html.substring(m.end, findElementEnd(html, lower, tag, m.end))
    }
    out.toVector
  }
}
