package graft

import org.scalatest.funsuite.AnyFunSuite

class HtmlTextSpec extends AnyFunSuite {
  import functions.HtmlText.extract

  test("strips tags and uses them as word separators") {
    assert(extract("<p>one</p><p>two</p>") == "one two")
    assert(extract("a<br/>b") == "a b")
    // raw '<' inside an attribute value is invalid HTML; the lenient
    // scanner ends the tag at the first '>' (leftover attr text survives)
    assert(extract("<div class='x' data-y=\"<z>\">t</div>") == "\">t")
    // unterminated tag swallows the rest (lenient)
    assert(extract("before<unclosed") == "before")
  }

  test("drops script/style content and comments entirely, case-insensitive") {
    assert(extract("a<SCRIPT>var x = '&amp; <b>not text</b>';</ScRiPt>b") == "a b")
    assert(extract("a<style media='x'>p { color: &lt;red }</style>b") == "a b")
    assert(extract("a<!-- hidden &amp; <p>gone</p> -->b") == "a b")
    // unterminated script swallows to EOF rather than leaking code as text
    assert(extract("a<script>while(true){}") == "a")
  }

  test("decodes named and numeric entities; lenient on stray ampersands") {
    assert(extract("x &amp; y &lt; z &gt; w &quot;q&quot; &apos;a&apos;") ==
      "x & y < z > w \"q\" 'a'")
    assert(extract("A&nbsp;B") == "A B")
    assert(extract("&#65;&#x42;&#x1F600;") == "AB😀")
    assert(extract("fish & chips") == "fish & chips") // no semicolon in reach
    assert(extract("&bogus; &#junk; &#xZZ;") == "&bogus; &#junk; &#xZZ;")
  }

  test("collapses whitespace runs and trims") {
    assert(extract("  <p> a \n\t b </p>  ") == "a b")
    assert(extract("<html><head><title>T</title></head><body>B</body></html>")
      == "T B")
  }

  test("html_to_text and multi_match_stats are SQL-callable via the Engine") {
    import TestSession._
    val e = Engine(spark)
    val t = e.sql("SELECT html_to_text('<p>a &amp; b</p><script>x</script>') AS t")
      .collect()(0).getString(0)
    assert(t == "a & b", t)
    val r = e.sql(
      "SELECT multi_match_stats('Join the scan', 'join', 'scan', 'an') AS s")
      .collect()(0).getStruct(0)
    assert(r.getAs[Long]("n_matches") == 3L)
    assert(r.getAs[Int]("n_patterns") == 3)
    assert(r.getAs[Int]("first_pos") == 0)
  }
}
