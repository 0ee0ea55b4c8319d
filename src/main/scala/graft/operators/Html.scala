package graft.operators

import scala.util.chaining._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** HTML text extraction — the step every real training-corpus pipeline runs
  * FIRST (raw crawl HTML → clean text), and the jusText/trafilatura-shaped
  * member of the text family: strip comments/CDATA and `<script>`/`<style>`
  * with their bodies, segment the body into block-level runs, classify each
  * block by LINK DENSITY (linked chars / text chars — the classic
  * boilerplate signal: navigation and footers are nearly all links, content
  * is nearly none), keep the content blocks, unwrap inline markup, decode
  * entities.
  *
  * Fixture discipline (the media-leg pattern): each document's "crawl page"
  * is SYNTHESIZED deterministically from its text — title = first 3 words,
  * body = 10-word paragraphs with inline markup and entity escaping, plus
  * all-link boilerplate and a `<script>`/`<style>` pair — then the extractor
  * parses the page with no knowledge of the generator. Docs with
  * `doc_id % 3 == 1` get the ADVERSARIAL variant (r10 verdict #4): unclosed
  * `<p>`/`<li>`, shuffled/extra attributes, uppercase tags, HTML comments
  * carrying decoy markup, CDATA inside script, a `<ul>`-list nav and a
  * nested-table footer — real-crawl malformations, same content contract.
  * Because both generators provably put exactly the corpus words into
  * content blocks (the link schedule is length-BOUNDED so a linked token
  * can never push a content block over the density bar), the ORACLE needs
  * no HTML at all: it derives title/word-count/md5 straight from
  * `documents.text` (only the boilerplate-block count branches on the
  * variant), so a hash match certifies the whole synthesize → parse →
  * classify → unwrap → decode loop restores the original content
  * byte-for-byte.
  *
  * Scale: pure per-row map — one task per page, Θ(page bytes) state,
  * nothing shuffles but the Θ(docs) stat rows; at 100 TB this is the
  * embarrassingly-parallel front of the pipeline (WARC/WET shards in,
  * clean text out), exactly how this kernel would sit under `mapPartitions`
  * over a crawl dump. */
object Html {
  type Q = (SparkSession, String) => DataFrame

  /** Boilerplate bar: a block whose linked-character share exceeds this is
    * dropped. Content paragraphs are bounded ≤ 0.5 by the generator's link
    * schedule; nav/footer measure 0.87+. */
  val LinkDensityMax = 0.5

  private[graft] def esc(w: String): String =
    w.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  private[graft] def unescape(s: String): String =
    s.replace("&lt;", "<").replace("&gt;", ">").replace("&amp;", "&")

  /** One paragraph body: every in-chunk 4th word bold; chunks of ≥9 words
    * carry ONE in-content link at index 4, but ONLY when that word's share
    * of the chunk's characters keeps the block at or under
    * [[LinkDensityMax]] (2·len ≤ textLen) — an unbounded link schedule
    * could let one URL-sized token exceed half the block's characters and
    * silently drop a content block (r10 ADVICE). */
  private def paraBody(ch: Array[String], anchor: String => String,
      bold: String => String): String = {
    val escd = ch.map(esc)
    val textLen = escd.map(_.length).sum + (ch.length - 1)
    escd.zipWithIndex.map { case (w, i) =>
      if (ch.length >= 9 && i == 4 && 2 * w.length <= textLen) anchor(w)
      else if (i % 7 == 3) bold(w)
      else w
    }.mkString(" ")
  }

  /** Deterministic WELL-FORMED page for one document: head (title + style +
    * script), all-link nav, the text as escaped 10-word paragraphs, all-link
    * footer. */
  private[graft] def htmlOf(text: String): String = {
    val words = (if (text == null) "" else text).trim
      .pipe(graft.functions.Tok.splitWs).filter(_.nonEmpty)
    val title = words.take(3).map(esc).mkString(" ")
    val ps = words.grouped(10).map { ch =>
      s"<p>${paraBody(ch, w => s"""<a href="/w">$w</a>""", w => s"<b>$w</b>")}</p>"
    }.mkString
    s"<html><head><title>$title</title><style>.x{color:red}</style>" +
      "<script>var x=1;</script></head><body>" +
      "<nav><a href=\"/\">home</a> <a href=\"/a\">archive</a> <a href=\"/c\">categories</a></nav>" +
      ps +
      "<footer><a href=\"/about\">about</a> <a href=\"/contact\">contact</a> " +
      "<a href=\"/tos\">tos</a></footer></body></html>"
  }

  /** Deterministic ADVERSARIAL page — same content contract, real-crawl
    * malformations: UNCLOSED `<p>` (implicitly closed by the next block),
    * uppercase tags, attribute clutter with `href` last, comments carrying
    * decoy block markup, CDATA inside script, the nav as a `<ul>` of
    * unclosed `<li>` links (3 boilerplate blocks), the footer as a nested
    * table (1 boilerplate block — its `<tr>` row). */
  private[graft] def messyHtmlOf(text: String): String = {
    val words = (if (text == null) "" else text).trim
      .pipe(graft.functions.Tok.splitWs).filter(_.nonEmpty)
    val title = words.take(3).map(esc).mkString(" ")
    val ps = words.grouped(10).zipWithIndex.map { case (ch, pi) =>
      val body = paraBody(ch,
        w => s"""<a rel="nofollow" target="_blank" href="/w">$w</a>""",
        w => s"<B>$w</B>")
      val open = if (pi % 2 == 0) "<P class=\"c1\" data-k=\"v\">" else "<p>"
      val comment =
        if (pi % 3 == 0) "<!-- <p>decoy paragraph that must not leak</p> -->"
        else ""
      s"$comment$open$body" // no </p> — unclosed on purpose
    }.mkString
    s"<html><head><title>$title</title><style>.x{color:red}</style>" +
      "<script>/*<![CDATA[*/var x=1;/*]]>*/</script></head><body>" +
      "<!-- nav follows -->" +
      "<ul class=\"nav\"><li><a href=\"/\">home</a>" +
      "<li><a class=\"n\" href=\"/a\">archive</a>" +
      "<li><a href=\"/c\">categories</a></ul>" +
      ps +
      "<footer><table><tr><td><a href=\"/about\">about</a></td>" +
      "<td><a href=\"/contact\">contact</a></td>" +
      "<td><a href=\"/tos\">tos</a></td></tr></table></footer></body></html>"
  }

  /** The per-document page synthesizer: docs with `doc_id % 3 == 1` get the
    * adversarial variant — ≥1/3 of every corpus exercises the hardened
    * parse path under the driver's hash gate. */
  private[graft] def pageOf(id: Long, text: String): String =
    if (id % 3 == 1) messyHtmlOf(text) else htmlOf(text)

  private val CommentRe = "(?s)<!--.*?-->".r
  private val CdataRe = "(?s)<!\\[CDATA\\[.*?\\]\\]>".r
  private val ScriptStyleRe = "(?si)<(script|style)\\b[^>]*>.*?</\\1>".r
  private val TitleRe = "(?si)<title[^>]*>(.*?)</title>".r
  private val TagRe = "(?s)</?([a-zA-Z][a-zA-Z0-9]*)\\b[^>]*>".r

  /** Block-SEGMENTING tags (jusText-style): an open starts a new block,
    * implicitly closing any open one (unclosed `<p>`/`<li>` handled); a
    * close ends the current block. Everything else — inline markup and
    * transparent containers (`ul`, `table`, `td`, …) — neither starts nor
    * ends a block. */
  private val BlockTags = Set("p", "nav", "footer", "li", "tr")

  /** Parse one page: (title, n_words, blocks kept, blocks dropped, clean
    * text). Generator-blind — it sees only markup. Tag names are
    * case-insensitive; comments and CDATA are stripped before any tag is
    * read (decoy markup inside them never leaks); whitespace-only blocks
    * are ignored (neither kept nor dropped), matching jusText. */
  private[graft] def extract(html: String): (String, Long, Long, Long, String) = {
    val noScript = ScriptStyleRe.replaceAllIn(
      CdataRe.replaceAllIn(CommentRe.replaceAllIn(html, " "), " "), " ")
    val title = unescape(
      TitleRe.findFirstMatchIn(noScript).map(_.group(1)).getOrElse(""))
    val kept = scala.collection.mutable.ArrayBuffer.empty[String]
    var dropped = 0L
    var inBlock = false
    var inAnchor = false
    val buf = new StringBuilder
    var linked = 0
    def finishBlock(): Unit = {
      if (inBlock) {
        // collapse whitespace runs (a stripped inline comment leaves one) —
        // a no-op on single-spaced content, robustness on real crawl text
        val text = buf.toString.trim.replaceAll("\\s+", " ")
        if (text.nonEmpty) {
          if (linked.toDouble / text.length > LinkDensityMax) dropped += 1
          else kept += text
        }
        inBlock = false; inAnchor = false; buf.clear(); linked = 0
      }
    }
    var pos = 0
    TagRe.findAllMatchIn(noScript).foreach { m =>
      if (inBlock && m.start > pos) {
        val txt = noScript.substring(pos, m.start)
        buf.append(txt)
        if (inAnchor) linked += txt.length
      }
      pos = m.end
      val name = m.group(1).toLowerCase
      val isClose = noScript.charAt(m.start + 1) == '/'
      if (BlockTags.contains(name)) {
        finishBlock()
        if (!isClose) inBlock = true
      } else if (name == "a" && inBlock) {
        inAnchor = !isClose
      }
    }
    // a TRUNCATED page can end mid-block with no further tag: flush the
    // tail text so the last block's content is not silently dropped
    if (inBlock && pos < noScript.length) {
      val txt = noScript.substring(pos)
      buf.append(txt)
      if (inAnchor) linked += txt.length
    }
    finishBlock()
    val clean = unescape(kept.mkString(" "))
    val nWords = if (clean.isEmpty) 0L else clean.split(" ").length.toLong
    (title, nWords, kept.length.toLong, dropped, clean)
  }

  /** The ONE per-document kernel behind the batch key and the streaming
    * twin ([[graft.streaming.Streams.htmlStripStream]]): synthesize the
    * page (adversarial variant for `doc_id % 3 == 1`), extract, emit the
    * stat row (clean text still raw — the md5 is a codegen'd projection on
    * top in both forms). */
  private[graft] def rowOf(id: Long, text: String): (Long, String, Long, Long, Long, String) = {
    val (title, nWords, nKept, nDropped, clean) = extract(pageOf(id, text))
    (id, title, nWords, nKept, nDropped, clean)
  }

  /** Suite key: synthesize each doc's page, extract, report the content
    * stats + an md5 of the clean text. The oracle derives every column
    * from `documents.text` alone (see object doc). */
  val htmlStrip: Q = (s, d) => {
    val spark = s
    import spark.implicits._
    // r15: synthesis picks the adversarial variant by doc_id % 3, so the
    // page is a pure function of (text, variant-flag) — the DISTINCT-TEXT
    // contraction ([[Contract]]) runs here on that COMPOUND key: one
    // synthesize+extract per (distinct text, flag), each doc joining its
    // verdict back on (md5, flag). Identical output, oracle-reproved.
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), col("text"),
        (col("doc_id") % 3 === 1).as("adv"))
    val perKey = docs
      .select(graft.operators.Text.textKey(col("text")).as("h"), col("adv"),
        col("text"))
      .groupBy(col("h"), col("adv")).agg(first(col("text")).as("text"))
      .as[(String, Boolean, String)]
      .map { case (h, adv, text) =>
        val (title, nWords, nKept, nDropped, clean) =
          extract(if (adv) messyHtmlOf(text) else htmlOf(text))
        (h, adv, title, nWords, nKept, nDropped, clean)
      }
      .toDF("h", "adv", "title", "n_words", "n_blocks_kept",
        "n_blocks_dropped", "clean")
      .select(col("h"), col("adv"), col("title"), col("n_words"),
        col("n_blocks_kept"), col("n_blocks_dropped"),
        md5(col("clean")).as("clean_md5"))
    docs
      .select(col("doc_id"), graft.operators.Text.textKey(col("text")).as("h"),
        col("adv"))
      .join(perKey, Seq("h", "adv"))
      .select(col("doc_id"), col("title"), col("n_words"),
        col("n_blocks_kept"), col("n_blocks_dropped"), col("clean_md5"))
      .orderBy(col("doc_id"))
  }

  val queries: Map[String, Q] = Map(
    "q_html_strip" -> htmlStrip,
  )

  val oracles: Map[String, String] = Map(
    // content contract straight from the corpus: the extractor must restore
    // exactly the original words (single-space joined), first-3-word title,
    // ceil(n/10) kept paragraphs, and the boilerplate blocks dropped — 2 on
    // the well-formed variant (nav + footer), 4 on the adversarial one
    // (3 nav <li> items + the footer table row)
    "q_html_strip" ->
      """WITH w AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS ws
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_words,
        |    array_to_string(ws[1:3], ' ') AS title,
        |    array_to_string(ws, ' ') AS clean
        |  FROM w)
        |SELECT doc_id, title, n_words,
        |  CAST((n_words + 9) // 10 AS BIGINT) AS n_blocks_kept,
        |  CAST(CASE WHEN doc_id % 3 = 1 THEN 4 ELSE 2 END AS BIGINT) AS n_blocks_dropped,
        |  md5(clean) AS clean_md5
        |FROM c ORDER BY doc_id""".stripMargin,
  )
}
