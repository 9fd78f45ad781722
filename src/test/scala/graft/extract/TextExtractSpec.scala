package graft.extract

import org.scalatest.funsuite.AnyFunSuite

class TextExtractSpec extends AnyFunSuite {
  private def x(html: String): String =
    TextExtract.extract(html.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  test("strips tags, keeps text bytes") {
    assert(x("<html><body>hello world</body></html>") == "hello world")
    assert(x("<p>a</p><p>b</p>") == "ab")
  }

  test("drops script and style subtrees") {
    assert(x("<body>a<script>var x=1;</script>b</body>") == "ab")
    assert(x("<body>a<style type='x'>p{}</style>b</body>") == "ab")
    assert(x("<body><SCRIPT>x</SCRIPT>keep</body>") == "keep")
  }

  test("decodes the five predefined entities, in the right order") {
    assert(x("<b>a &amp; b</b>") == "a & b")
    assert(x("x &lt;tag&gt; y") == "x <tag> y")
    assert(x("&quot;q&quot; &#39;s&#39;") == "\"q\" 's'")
    assert(x("&amp;lt;") == "&lt;") // amp decoded last: no double-decode
  }

  test("encode/extract round-trip is byte-identical (generator invariant)") {
    val texts = Seq("plain", "a & b < c > d", "quote \" apos '", "",
      "tok " * 50)
    texts.foreach { t =>
      val html = "<html><body>" + TextExtract.encodeEntities(t) + "</body></html>"
      assert(x(html) == t)
    }
  }

  test("null-safe; no whitespace collapsing") {
    assert(TextExtract.extract(null) == null)
    assert(x("<body>a  b\tc</body>") == "a  b\tc")
  }
}
