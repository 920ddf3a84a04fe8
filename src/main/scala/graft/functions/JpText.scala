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

  /** Standard kanji numeral for 0 <= n < 10000 (the range street numbers
    * can realistically take). Mirrors the kanjize `int2kanji` output used
    * by the reference geocode key builder
    * (libs/otokuna/analysis.py:31-54): 12 → 十二, 21 → 二十一, 30 → 三十.
    */
  def int2kanji(n: Int): String = {
    require(n >= 0 && n < 10000, s"int2kanji out of range: $n")
    if (n == 0) return "零"
    val digits = "一二三四五六七八九"
    def digit(d: Int): String = digits.charAt(d - 1).toString
    def unit(d: Int, u: String): String =
      if (d == 0) "" else if (d == 1) u else digit(d) + u
    val sb = new StringBuilder
    sb ++= unit(n / 1000, "千")
    sb ++= unit(n / 100 % 10, "百")
    sb ++= unit(n / 10 % 10, "十")
    if (n % 10 != 0) sb ++= digit(n % 10)
    sb.toString
  }
}
