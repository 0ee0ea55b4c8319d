package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Html

/** HTML text extraction. The driver gate hash-checks the content contract
  * (extracted text ≡ the corpus words); these specs pin the PARSER from
  * first principles: it is generator-blind, boilerplate falls to the link
  * -density rule (not tag names), inline markup unwraps, entities decode,
  * script/style bodies vanish, and adversarial markup parses. */
class HtmlSpec extends AnyFunSuite {

  private val payloads = Seq(
    "", "one", "a b c", "the quick brown fox jumps over the lazy dog again",
    ("lorem ipsum " * 40).trim,
    "ampersand & angle < bracket > chars &already;",
    "  leading   and trailing   whitespace  ")

  test("round trip: extraction restores the corpus words exactly") {
    for (p <- payloads) {
      val words = p.trim.split("\\s+").filter(_.nonEmpty)
      val (title, nWords, kept, dropped, clean) = Html.extract(Html.htmlOf(p))
      assert(clean == words.mkString(" "), s"payload '$p'")
      assert(title == words.take(3).mkString(" "))
      assert(nWords == words.length.toLong)
      assert(kept == (words.length + 9) / 10)
      assert(dropped == 2L, "nav + footer, nothing else")
    }
  }

  test("adversarial round trip: unclosed/uppercase/commented/nested markup restores the words") {
    for (p <- payloads) {
      val words = p.trim.split("\\s+").filter(_.nonEmpty)
      val (title, nWords, kept, dropped, clean) = Html.extract(Html.messyHtmlOf(p))
      assert(clean == words.mkString(" "), s"payload '$p'")
      assert(title == words.take(3).mkString(" "))
      assert(nWords == words.length.toLong)
      assert(kept == (words.length + 9) / 10)
      assert(dropped == 4L, "3 nav <li> items + the footer table row")
    }
  }

  test("truncated page: tail text after the last tag still lands in its block") {
    val (_, n, kept, dropped, clean) =
      Html.extract("<html><body><p>first words<p>last words of a truncated crawl page")
    assert(kept == 2L && dropped == 0L)
    assert(clean == "first words last words of a truncated crawl page")
    assert(n == 9L)
    // truncated mid-anchor: the linked chars still count toward density
    val (_, _, k2, d2, c2) =
      Html.extract("<body><p><a href=\"/x\">all link text to the end")
    assert(k2 == 0L && d2 == 1L && c2 == "")
  }

  test("unclosed <p> blocks are implicitly closed by the next block tag") {
    val html = "<html><body><p>first block words<p>second block words" +
      "<footer><a href=\"/x\">x</a></footer></body></html>"
    val (_, _, kept, dropped, clean) = Html.extract(html)
    assert(kept == 2L && dropped == 1L)
    assert(clean == "first block words second block words")
  }

  test("comments and CDATA never leak decoy markup or text") {
    val html = "<html><body><!-- <p>decoy</p> --><p>real <!-- inline note --> words</p>" +
      "<![CDATA[<p>cdata decoy</p>]]></body></html>"
    val (_, n, kept, dropped, clean) = Html.extract(html)
    assert(kept == 1L && dropped == 0L)
    assert(clean == "real words", s"got '$clean'")
    assert(n == 2L)
  }

  test("attribute clutter, shuffled attr order, and uppercase tags parse") {
    val html = "<html><body><P CLASS=\"a\" data-x=\"1\">keep " +
      "<A rel=\"nofollow\" href=\"/w\">tiny</A> link words here now ok</P></body></html>"
    val (_, _, kept, dropped, clean) = Html.extract(html)
    assert(kept == 1L && dropped == 0L)
    assert(clean == "keep tiny link words here now ok")
  }

  test("nested list nav and table footer classify per innermost block") {
    val html = "<html><body><ul><li><a href=\"/\">home</a><li><a href=\"/a\">archive</a></ul>" +
      "<p>content words live here</p>" +
      "<footer><table><tr><td><a href=\"/t\">tos</a></td></tr></table></footer></body></html>"
    val (_, _, kept, dropped, clean) = Html.extract(html)
    assert(kept == 1L && dropped == 3L, "2 li blocks + 1 tr block dropped")
    assert(clean == "content words live here")
  }

  test("link schedule is bounded: a URL-sized token never sinks a content block") {
    // 9 one-char words + one very long word at index 4: an unbounded
    // schedule would link it and exceed 50% of the block's characters
    val long = "x" * 400
    val p = s"a b c d $long f g h i"
    val (_, nWords, kept, dropped, clean) = Html.extract(Html.htmlOf(p))
    assert(clean == p, "content block must survive")
    assert(kept == 1L && dropped == 2L && nWords == 9L)
    val (_, nw2, k2, d2, c2) = Html.extract(Html.messyHtmlOf(p))
    assert(c2 == p && k2 == 1L && d2 == 4L && nw2 == 9L)
  }

  test("pageOf dispatches the adversarial variant on doc_id % 3 == 1 only") {
    val p = "the quick brown fox jumps over the lazy dog again"
    assert(Html.pageOf(0L, p) == Html.htmlOf(p))
    assert(Html.pageOf(1L, p) == Html.messyHtmlOf(p))
    assert(Html.pageOf(2L, p) == Html.htmlOf(p))
    assert(Html.pageOf(4L, p) == Html.messyHtmlOf(p))
    // both variants restore the same content; only the boilerplate census differs
    val clean = Html.extract(Html.htmlOf(p))
    val messy = Html.extract(Html.messyHtmlOf(p))
    assert(clean._1 == messy._1 && clean._2 == messy._2 &&
      clean._3 == messy._3 && clean._5 == messy._5)
    assert(clean._4 == 2L && messy._4 == 4L)
  }

  test("boilerplate falls to link density, not tag identity") {
    // a <p> that is pure links must drop; a <nav> that is mostly prose must survive
    val html = "<html><head><title>t</title></head><body>" +
      "<p><a href=\"/x\">spam</a> <a href=\"/y\">links</a></p>" +
      "<nav>this navigation block is mostly honest prose <a href=\"/\">home</a></nav>" +
      "<p>real content paragraph</p></body></html>"
    val (_, _, kept, dropped, clean) = Html.extract(html)
    assert(kept == 2L && dropped == 1L)
    assert(clean ==
      "this navigation block is mostly honest prose home real content paragraph")
  }

  test("script and style bodies vanish; inline tags unwrap; entities decode") {
    val html = "<html><head><title>a &amp; b</title>" +
      "<style>p { content: \"not text\" }</style>" +
      "<script>if (x < 2) { alert(\"not text either\") }</script></head>" +
      "<body><p>keep <b>bold</b> and <a href=\"/l\">one link</a> plus &lt;tag&gt; text</p></body></html>"
    val (title, _, kept, dropped, clean) = Html.extract(html)
    assert(title == "a & b")
    assert(kept == 1L && dropped == 0L)
    assert(clean == "keep bold and one link plus <tag> text")
  }

  test("suite key matches a driver-side replay on the fixture") {
    val spark = TestSpark.spark
    import spark.implicits._
    val got = Html.htmlStrip(spark, TestSpark.sf0001).collect()
    val docs = Tables.documents(spark, TestSpark.sf0001)
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("text"))
      .as[(Long, String)].collect().toMap
    assert(got.length == docs.size)
    got.foreach { r =>
      val words = docs(r.getLong(0)).trim.split("\\s+").filter(_.nonEmpty)
      assert(r.getString(1) == words.take(3).mkString(" "), s"title of ${r.getLong(0)}")
      assert(r.getLong(2) == words.length.toLong)
      assert(r.getLong(4) == (if (r.getLong(0) % 3 == 1) 4L else 2L),
        s"boilerplate count of ${r.getLong(0)}")
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(words.mkString(" ").getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      assert(r.getString(5) == md, s"clean_md5 of ${r.getLong(0)}")
    }
    val again = Html.htmlStrip(spark, TestSpark.sf0001).collect()
    assert(got.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }
}
