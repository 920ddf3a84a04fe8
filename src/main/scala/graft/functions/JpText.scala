package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Japanese-text helpers shared by the parser library.
  *
  * Python's `\d` / `int()` accept full-width digits (０-９), Java and RE2
  * do not — so every parser normalizes digits first (both in the Spark
  * columns and in the DuckDB oracle SQL) to keep semantics identical to
  * the reference (e.g. 築１２年 → 12, libs/tests/test_scraping.py:40).
  */
object JpText {

  val FullWidthDigits = "０１２３４５６７８９"
  val AsciiDigits = "0123456789"

  /** Normalize full-width digits to ASCII. */
  def normDigits(c: Column): Column =
    translate(c, FullWidthDigits, AsciiDigits)

  def normDigits(s: String): String =
    s.map { ch =>
      val i = FullWidthDigits.indexOf(ch)
      if (i >= 0) AsciiDigits.charAt(i) else ch
    }

  /** Standard kanji numeral, kanjize-style, for 0 <= n < 10^8 (万
    * grouping included so no realistic digit-run in an address can make
    * the UDF throw — a thrown exception inside a UDF aborts the whole
    * job). Mirrors the reference geocode key builder
    * (libs/otokuna/analysis.py:31-54): 12 → 十二, 21 → 二十一, 30 → 三十,
    * 12345 → 一万二千三百四十五.
    */
  def int2kanji(n: Long): String = {
    require(n >= 0 && n < 100000000L, s"int2kanji out of range: $n")
    if (n == 0) return "零"
    val digits = "一二三四五六七八九"
    def digit(d: Long): String = digits.charAt(d.toInt - 1).toString
    def unit(d: Long, u: String): String =
      if (d == 0) "" else if (d == 1) u else digit(d) + u
    def under10000(m: Long): String = {
      val sb = new StringBuilder
      sb ++= unit(m / 1000, "千")
      sb ++= unit(m / 100 % 10, "百")
      sb ++= unit(m / 10 % 10, "十")
      if (m % 10 != 0) sb ++= digit(m % 10)
      sb.toString
    }
    val man = n / 10000
    val rest = n % 10000
    // kanjize writes 一万 (not 万) for 10000
    val manPart =
      if (man == 0) "" else (if (man == 1) "一" else under10000(man)) + "万"
    manPart + under10000(rest)
  }
}
