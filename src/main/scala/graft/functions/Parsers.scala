package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's scalar parser library (SURVEY §2.2, F1-F11) as pure
  * Column-expression builders — codegen-friendly, no UDFs except the
  * kanji-numeral address key (F11).
  *
  * Error semantics: the reference raises `ParsingError` and the caller
  * skips the row (libs/otokuna/scraping.py:25-33, 274-287, 354-356). Here
  * every parser returns NULL on mismatch; callers filter on the validity
  * of required columns to reproduce the row-skip exactly.
  *
  * All patterns are start-anchored (`^`) because the reference uses
  * `re.match`, which anchors at the start but allows trailing text.
  */
object Parsers {
  import JpText.normDigits

  /** regexp_extract returning NULL instead of "" when the pattern does not
    * match. Only valid when the group cannot legitimately capture "".
    */
  private def extractOrNull(c: Column, pattern: String, group: Int): Column = {
    val e = regexp_extract(c, pattern, group)
    when(e =!= "", e)
  }

  /** F1 parse_age (libs/otokuna/scraping.py:36-41): 新築 → 0, 築N年 → N. */
  def parseAge(c: Column): Column = {
    val n = normDigits(c)
    when(n === "新築", lit(0L))
      .otherwise(extractOrNull(n, "^築(\\d+)年", 1).cast("long"))
  }

  /** F2 parse_floors (scraping.py:44-49): above-ground floors only. */
  def parseFloors(c: Column): Column =
    extractOrNull(normDigits(c), "^(地下\\d+地上)?(\\d+)階建", 2).cast("long")

  /** F3 parse_transportation (scraping.py:52-58): walk minutes; 車/バス
    * strings do not match and yield NULL (reference: ParsingError).
    */
  def parseTransportation(c: Column): Column =
    extractOrNull(normDigits(c), "^.*歩(\\d+)分$", 1).cast("double")

  /** F4 parse_address (scraping.py:61-66): 東京都(.+区)(\D*) → ward.
    * Ward cannot be empty, so its NULL-ness is the row-validity signal.
    */
  def parseWard(c: Column): Column =
    extractOrNull(normDigits(c), "^東京都(.+区)(\\D*)", 1)

  /** F4 district part; "" is a legal value (address ends at the ward), so
    * validity is carried by the ward column.
    */
  def parseDistrict(c: Column): Column = {
    val n = normDigits(c)
    when(parseWard(c).isNotNull, regexp_extract(n, "^東京都(.+区)(\\D*)", 2))
  }

  /** F5 parse_money (scraping.py:69-78): "-" → 0; (\d*[.]?\d+)<unit> ×
    * {1, 10000} truncated to long — the reference's `int(float * mult)`
    * truncates toward zero, as does Spark's double→long cast.
    */
  def parseMoney(c: Column, unit: String): Column = {
    val mult = unit match {
      case "円" => 1L
      case "万円" => 10000L
      case other => throw new IllegalArgumentException(s"unit: $other")
    }
    val n = normDigits(c)
    when(n === "-", lit(0L))
      .otherwise((extractOrNull(n, "^(\\d*[.]?\\d+)" + unit, 1)
        .cast("double") * lit(mult)).cast("long"))
  }

  /** F6 parse_floor_range (scraping.py:81-106) → struct(min_floor,
    * max_floor). Basement floors are zero-based: B1 → 0, B2 → -1 (so no
    * two-floor gap between B1 and 1F); a single floor duplicates; an
    * inverted range (1-B1階) is sorted.
    */
  def parseFloorRange(c: Column): Column = {
    val n = normDigits(c)
    val pat = "^(B?\\d+)-?(B?\\d+)?階"
    val g1 = extractOrNull(n, pat, 1)
    val g2 = coalesce(extractOrNull(n, pat, 2), g1)
    val f1 = when(g1.startsWith("B"),
      -substring(g1, 2, 10).cast("long") + 1L).otherwise(g1.cast("long"))
    val f2 = when(g2.startsWith("B"),
      -substring(g2, 2, 10).cast("long") + 1L).otherwise(g2.cast("long"))
    when(g1.isNotNull,
      struct(least(f1, f2).as("min_floor"), greatest(f1, f2).as("max_floor")))
  }

  /** F7 parse_area (scraping.py:109-112): (\d*[.]?\d+)m2 → double m². */
  def parseArea(c: Column): Column =
    extractOrNull(normDigits(c), "^(\\d*[.]?\\d+)m2", 1).cast("double")

  /** F8 parse_layout (scraping.py:115-127) → struct(n_rooms,
    * service_room, living_room, dining_room, kitchen). ワンルーム →
    * (1,F,F,F,F); the S/L/D/K flags test the whole string, as the
    * reference does (`char in s`).
    */
  def parseLayout(c: Column): Column = {
    val n = normDigits(c)
    val oneRoom = struct(lit(1L).as("n_rooms"),
      lit(false).as("service_room"), lit(false).as("living_room"),
      lit(false).as("dining_room"), lit(false).as("kitchen"))
    val nRooms = extractOrNull(n, "^(\\d+)[SLDK]+", 1).cast("long")
    when(n === "ワンルーム", oneRoom)
      .otherwise(when(nRooms.isNotNull, struct(
        nRooms.as("n_rooms"),
        n.contains("S").as("service_room"),
        n.contains("L").as("living_room"),
        n.contains("D").as("dining_room"),
        n.contains("K").as("kitchen"))))
  }

  /** F9 parse_banner_timestamp (scraping.py:130-147): first &times=(\d+)
    * anywhere in the text (re.search), ms → seconds rounded half-even
    * (Python 3 round()).
    */
  def parseBannerTimestamp(c: Column): Column =
    bround(extractOrNull(c, "&times=(\\d+)", 1).cast("double") / 1000.0, 0)

  /** F11 _build_address_kanji (libs/otokuna/analysis.py:31-54): the
    * geocode join key. 東京都渋谷区恵比寿南１ → 東京都渋谷区恵比寿南一丁目;
    * unparseable → "" (empty string, NOT null — the reference returns "").
    * ヶ→ケ normalization for the three districts where the 国土交通省 data
    * spells ケ.
    */
  val buildAddressKanjiFn: String => String = { address =>
    val n = JpText.normDigits(if (address == null) "" else address)
    val pat = "^(東京都)(.+区)(\\D+)(\\d*)".r
    pat.findPrefixMatchOf(n) match {
      case None => ""
      case Some(m) =>
        val (pref, ward, d0, num) =
          (m.group(1), m.group(2), m.group(3), m.group(4))
        val district =
          if (Set("千駄ヶ谷", "富ヶ谷", "幡ヶ谷").contains(d0))
            d0.replace('ヶ', 'ケ')
          else d0
        // a pathological digit-run (>= 10^8) must degrade to "" like any
        // other unparseable address — a throw inside a UDF would abort
        // the whole job
        val streetJp: Option[String] =
          if (num.isEmpty) Some("")
          else if (num.length > 8) None
          else Some(JpText.int2kanji(num.toLong) + "丁目")
        streetJp.map(pref + ward + district + _).getOrElse("")
    }
  }

  /** Column form — a native codegen'd expression, not a UDF (see
    * graft.plans.KanjiAddressKey).
    */
  def buildAddressKanji(c: Column): Column =
    graft.plans.KanjiAddressKey.kanji_address_key(c)
}
