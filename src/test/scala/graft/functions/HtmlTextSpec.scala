package graft.functions

import graft.SparkTestBase
import org.apache.spark.unsafe.types.UTF8String

/** HTML-to-text extraction: the regex-chain contract, the traps that
  * break naive strippers, and pass-through of plain text. */
class HtmlTextSpec extends SparkTestBase {

  private def h(s: String): String =
    HtmlText.compute(UTF8String.fromString(s)).toString

  test("scripts with embedded tags/operators, styles and comments " +
    "vanish wholesale") {
    assert(h("""a<script>if (1<2) { x = "<p>bad</p>"; }</script>b""") == "a b")
    assert(h("a<style>p > span { color: red; }</style>b") == "a b")
    assert(h("a<!-- <p>hidden</p> -->b") == "a b")
    assert(h("a<SCRIPT TYPE='x'>y</SCRIPT>b") == "a b") // case-insensitive
  }

  test("block closers become newlines; inline tags become spaces") {
    assert(h("<h1>Title</h1><p>one</p><p>two</p>") == "Title\none\ntwo")
    assert(h("a<br>b") == "a\nb")
    assert(h("x<b>bold</b>y") == "x bold y")
    assert(h("<ul><li>i1</li><li>i2</li></ul>") == "i1\ni2")
  }

  test("entity decode is fixed-order with &amp; last — double-escaped " +
    "text decodes exactly one level") {
    assert(h("&lt;tag&gt; &quot;q&quot; &#39;s&#39; a&nbsp;b &amp; c")
      == "<tag> \"q\" 's' a b & c")
    assert(h("&amp;lt;") == "&lt;") // double-escape: ONE level decoded
    assert(h("&amp;amp;") == "&amp;")
  }

  test("whitespace normalization: space runs, spaces around newlines, " +
    "newline runs, trim") {
    assert(h("  a   b  ") == "a b")
    assert(h("<p>a</p>  <p>b</p>") == "a\nb")
    assert(h("plain text passes through") == "plain text passes through")
    assert(h("") == "")
  }

  test("SQL surface registers and a full messy page extracts") {
    graft.Graft.init(spark)
    val out = spark.sql(
      """SELECT html_text('<html><body><script>var a="<div>";</script>
        |<h1>T</h1><p>hello &amp; goodbye</p></body></html>') AS t"""
        .stripMargin.replace("\n", "")).head().getString(0)
    assert(out == "T\nhello & goodbye")
  }
}
