package graft.ingest

import java.io.ByteArrayInputStream
import java.util.zip.ZipInputStream

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One search-result page's room-level record, string-typed: structural
  * extraction only. All value parsing happens later in Catalyst
  * expressions (PropertiesFrame), so the hot path stays in codegen and
  * the reference's row-skip semantics become null-filters.
  *
  * Mirrors Building.from_tag / Room.from_tag field sourcing
  * (libs/otokuna/scraping.py:189-235) without the value parsing.
  */
final case class RawProperty(
    building_category: String,
    building_title: String,
    building_address: String,
    building_transportation: Seq[String],
    building_age_s: String,
    building_floors_s: String,
    rent_s: String,
    admin_fee_s: String,
    deposit_s: String,
    gratuity_s: String,
    layout: String,
    area_s: String,
    floor_s: String,
    url: String,
    jnc_id: String,
    new_arrival: Boolean,
    html_file_banner_timestamp: Option[Double],
    html_file_last_modified_at: Double,
    source_file: String,
    source_order: Long,
)

/** A fetched page: file identity + mtime + html text. */
final case class Page(file: String, mtimeSec: Double, html: String)

object SuumoPages {
  import HtmlExtract._

  val SuumoUrl = "https://suumo.jp"

  // hoisted from the per-room/per-page loops (round 17): inline `.r`
  // re-ran Pattern.compile once per room record / script tag
  private val BannerTimesRe = "&times=(\\d+)".r
  private val HrefRe =
    "(?i)<a\\b[^>]*href\\s*=\\s*[\"']([^\"']*)[\"']".r
  private val JncIdRe = "jnc_([0-9]*)/".r
  private val SpanSelectors = Seq(
    "cassetteitem_price cassetteitem_price--rent",
    "cassetteitem_price cassetteitem_price--administration",
    "cassetteitem_price cassetteitem_price--deposit",
    "cassetteitem_price cassetteitem_price--gratuity",
    "cassetteitem_madori", "cassetteitem_menseki")
  private val HrefTdClasses = Set("ui-text--midium", "ui-text--bold")

  /** S1: directory-of-HTML scan via Spark's binaryFile source — file list
    * becomes task partitions (the reference's joblib pool,
    * scraping.py:292-313, for free). mtime rounded to whole seconds like
    * get_last_modified_at_timestamp (scraping.py:166-175).
    */
  def readHtmlDir(spark: SparkSession, dir: String): Dataset[Page] = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.html")
      .load(dir)
      .select(col("path"),
        (col("modificationTime").cast("double")).as("mtime"),
        col("content"))
      .as[(String, Double, Array[Byte])]
      .map { case (path, mtime, content) =>
        Page(path, math.rint(mtime), new String(content, "UTF-8"))
      }
  }

  /** S2: zip-of-HTML scan. A zip is not splittable, so one archive = one
    * task; parallelism comes from many archives (the daily pipeline
    * produces one per day/ward). Entry mtimes use the zip's local
    * date_time, as the reference does (scraping.py:150-157).
    */
  def readHtmlZip(spark: SparkSession, zipPath: String): Dataset[Page] = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .load(zipPath)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (_, bytes) =>
        val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
        val out = scala.collection.mutable.ArrayBuffer.empty[Page]
        var entry = zin.getNextEntry
        while (entry != null) {
          if (!entry.isDirectory && entry.getName.endsWith(".html")) {
            val buf = new java.io.ByteArrayOutputStream()
            val tmp = new Array[Byte](64 * 1024)
            var n = zin.read(tmp)
            while (n > 0) { buf.write(tmp, 0, n); n = zin.read(tmp) }
            // ZipEntry time has 2 s resolution → already whole seconds
            out += Page(entry.getName, entry.getTime / 1000.0,
              new String(buf.toByteArray, "UTF-8"))
          }
          entry = zin.getNextEntry
        }
        out.sortBy(_.file)
      }
  }

  /** S3: page → N raw room records (the reference's building × room
    * fan-out, scraping.py:268-288) as a typed flatMap. `source_order`
    * preserves within-page emission order so keep-first dedup (P2) can
    * reproduce pandas' file-order semantics.
    */
  def rawProperties(pages: Dataset[Page]): Dataset[RawProperty] = {
    implicit val enc = org.apache.spark.sql.Encoders.product[RawProperty]
    // Parallelism comes from the input splits, NOT a repartition: a
    // shuffle here moves the raw HTML bytes over the network — a full
    // extra pass over the corpus at scale. binaryFile packs small pages
    // `spark.sql.files.openCostInBytes` apart up to
    // `spark.sql.files.maxPartitionBytes` per split, so a small corpus
    // spreads by lowering maxPartitionBytes (the entry mains set 4 MiB;
    // a real 100 TB dump saturates the cluster at the default 128 MiB).
    pages.flatMap(p => extractPage(p.html, p.mtimeSec, p.file))
  }

  /** Pure structural extraction of one page. */
  def extractPage(html: String, lastModifiedAt: Double,
      sourceFile: String): Seq[RawProperty] = {
    val banner: Option[Double] = elementsByTag(html, "script").iterator
      .flatMap(s => BannerTimesRe.findFirstMatchIn(text(s)))
      .map(m => math.rint(m.group(1).toDouble / 1000.0))
      .nextOption()

    val out = scala.collection.mutable.ArrayBuffer.empty[RawProperty]
    var order = 0L
    // ONE selector pass per tag instead of one per selector (round 17):
    // the per-room span selectors dominated page parse time (6 scans ×
    // 200 rooms/page); firstByClasses/classedElementsByTag resolve the
    // same first-match-in-document-order results in a single scan.
    for (b <- elementsByClass(html, "div", "cassetteitem")) {
      val divs = firstByClasses(b, "div",
        Seq("cassetteitem_content-label", "cassetteitem_content-title"))
      val category = divs.get("cassetteitem_content-label").map(text)
      val title = divs.get("cassetteitem_content-title").map(text)
      val lis = firstByClasses(b, "li", Seq("cassetteitem_detail-col1",
        "cassetteitem_detail-col2", "cassetteitem_detail-col3"))
      val address = lis.get("cassetteitem_detail-col1").map(text)
      val transportation = lis.get("cassetteitem_detail-col2")
        .map(li => elementsByTag(li, "div").map(text))
        .getOrElse(Vector.empty)
      val col3 = lis.get("cassetteitem_detail-col3")
        .map(li => elementsByTag(li, "div").map(text))
        .getOrElse(Vector.empty)
      val (ageS, floorsS) = col3 match {
        case Vector(a, f) => (Option(a), Option(f))
        case _ => (None, None) // reference would crash; we null → drop
      }
      for {
        table <- elementsByClass(b, "table", "cassetteitem_other")
        room <- elementsByTag(table, "tbody")
      } {
        val spans = firstByClasses(room, "span", SpanSelectors)
        def span(c: String) = spans.get(c).map(text)
        val tds = classedElementsByTag(room, "td")
        val floorS =
          if (tds.length > 2) strippedStrings(tds(2)._2).headOption else None
        val href = tds.collectFirst {
          case (toks, inner) if HrefTdClasses.subsetOf(toks) => inner
        }.flatMap(td => HrefRe.findFirstMatchIn(td).map(_.group(1)))
        val jncId = href.flatMap(h =>
          JncIdRe.findFirstMatchIn(h).map(_.group(1)))
        out += RawProperty(
          building_category = category.orNull,
          building_title = title.orNull,
          building_address = address.orNull,
          building_transportation = transportation,
          building_age_s = ageS.orNull,
          building_floors_s = floorsS.orNull,
          rent_s = span("cassetteitem_price cassetteitem_price--rent").orNull,
          admin_fee_s = span("cassetteitem_price cassetteitem_price--administration").orNull,
          deposit_s = span("cassetteitem_price cassetteitem_price--deposit").orNull,
          gratuity_s = span("cassetteitem_price cassetteitem_price--gratuity").orNull,
          layout = span("cassetteitem_madori").orNull,
          area_s = span("cassetteitem_menseki").orNull,
          floor_s = floorS.orNull,
          url = href.map(SuumoUrl + _).orNull,
          jnc_id = jncId.orNull,
          new_arrival = existsClass(room, "cassetteitem_other-checkbox--newarrival"),
          html_file_banner_timestamp = banner,
          html_file_last_modified_at = lastModifiedAt,
          source_file = sourceFile,
          source_order = order,
        )
        order += 1
      }
    }
    out.toSeq
  }
}
