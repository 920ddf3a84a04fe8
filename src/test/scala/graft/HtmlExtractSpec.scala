package graft

import graft.ingest.HtmlExtract._
import org.scalatest.funsuite.AnyFunSuite

/** Edge cases for the HTML scanner beyond the golden-page coverage. */
class HtmlExtractSpec extends AnyFunSuite {

  test("nested same-tag elements balance correctly") {
    val html = """<div class="outer">a<div>inner</div>b</div><div class="outer">c</div>"""
    val out = elementsByClass(html, "div", "outer")
    assert(out === Vector("a<div>inner</div>b", "c"))
  }

  test("prefix-colliding tags do not confuse the balance scan") {
    val html = "<table class=\"t\"><tbody><td>x</td></tbody></table>"
    assert(elementsByClass(html, "table", "t") ===
      Vector("<tbody><td>x</td></tbody>"))
    assert(elementsByTag(html, "td") === Vector("x"))
  }

  test("uppercase tags and attribute names are matched") {
    val html = """<DIV CLASS="x">body</DIV>"""
    assert(elementsByClass(html, "div", "x") === Vector("body"))
    val attrs = tagAttrs("""<INPUT TYPE="checkbox" NAME="ts" VALUE="1">""", "input")
    assert(attrs.head === Map("type" -> "checkbox", "name" -> "ts", "value" -> "1"))
  }

  test("multi-class selectors require all tokens (bs4 semantics)") {
    val html = """<span class="a b c">yes</span><span class="a">no</span>"""
    assert(elementsByClass(html, "span", "a b") === Vector("yes"))
    assert(elementsByClass(html, "span", "a").length === 2)
  }

  test("unclosed element extends to end of input, not an exception") {
    val html = """<div class="x">never closed"""
    assert(elementsByClass(html, "div", "x") === Vector("never closed"))
  }

  test("entities decode in text and stripped strings") {
    assert(text("<b>a &amp; b</b>") === "a & b")
    assert(strippedStrings("<td> x </td><td></td><td>y&nbsp;</td>") ===
      Vector("x", "y"))
  }

  test("single quotes and attribute order are accepted") {
    val html = "<a href='/p1' class='nav'>next</a>"
    assert(attrFirstByClass(html, "a", "nav", "href") === Some("/p1"))
  }

  test("elementsByAttr matches label[for=id]") {
    val html = """<label for="a">A</label><label for="b">B</label>"""
    assert(elementsByAttr(html, "label", "for", "b") === Vector("B"))
  }
}
