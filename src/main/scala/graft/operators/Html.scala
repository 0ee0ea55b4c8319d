package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** HTML text extraction — the step every real training-corpus pipeline runs
  * FIRST (raw crawl HTML → clean text), and the jusText/trafilatura-shaped
  * member of the text family: strip `<script>`/`<style>` with their bodies,
  * segment the body into block-level elements, classify each block by LINK
  * DENSITY (linked chars / text chars — the classic boilerplate signal:
  * navigation and footers are nearly all links, content is nearly none),
  * keep the content blocks, unwrap inline markup, decode entities.
  *
  * Fixture discipline (the media-leg pattern): each document's "crawl page"
  * is SYNTHESIZED deterministically from its text — title = first 3 words,
  * body = 10-word paragraphs with inline `<b>`/`<a>` markup and entity
  * escaping, plus all-link `<nav>`/`<footer>` boilerplate and a
  * `<script>`/`<style>` pair — then the extractor parses the page with no
  * knowledge of the generator. Because the generator provably puts exactly
  * the corpus words into content blocks (and the link schedule keeps every
  * content block under the density threshold), the ORACLE needs no HTML at
  * all: it derives title/word-count/md5 straight from `documents.text`, so
  * a hash match certifies the whole synthesize → parse → classify →
  * unwrap → decode loop restores the original content byte-for-byte.
  *
  * Scale: pure per-row map — one task per page, Θ(page bytes) state,
  * nothing shuffles but the Θ(docs) stat rows; at 100 TB this is the
  * embarrassingly-parallel front of the pipeline (WARC/WET shards in,
  * clean text out), exactly how this kernel would sit under `mapPartitions`
  * over a crawl dump. */
object Html {
  type Q = (SparkSession, String) => DataFrame

  /** Boilerplate bar: a block whose linked-character share exceeds this is
    * dropped. Content paragraphs measure ≲0.15 by the generator's link
    * schedule; nav/footer measure 0.87+. */
  val LinkDensityMax = 0.5

  private[graft] def esc(w: String): String =
    w.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  private[graft] def unescape(s: String): String =
    s.replace("&lt;", "<").replace("&gt;", ">").replace("&amp;", "&")

  /** Deterministic page for one document: head (title + style + script),
    * all-link nav, the text as escaped 10-word paragraphs (every in-chunk
    * 4th word bold; chunks of ≥9 words carry ONE in-content link — bounded
    * well under [[LinkDensityMax]]), all-link footer. */
  private[graft] def htmlOf(text: String): String = {
    val words = (if (text == null) "" else text).trim
      .split("\\s+").filter(_.nonEmpty)
    val title = words.take(3).map(esc).mkString(" ")
    val ps = words.grouped(10).map { ch =>
      val body = ch.zipWithIndex.map { case (w0, i) =>
        val w = esc(w0)
        if (ch.length >= 9 && i == 4) s"""<a href="/w">$w</a>"""
        else if (i % 7 == 3) s"<b>$w</b>"
        else w
      }.mkString(" ")
      s"<p>$body</p>"
    }.mkString
    s"<html><head><title>$title</title><style>.x{color:red}</style>" +
      "<script>var x=1;</script></head><body>" +
      "<nav><a href=\"/\">home</a> <a href=\"/a\">archive</a> <a href=\"/c\">categories</a></nav>" +
      ps +
      "<footer><a href=\"/about\">about</a> <a href=\"/contact\">contact</a> " +
      "<a href=\"/tos\">tos</a></footer></body></html>"
  }

  private val ScriptStyleRe = "(?s)<(script|style)\\b[^>]*>.*?</\\1>".r
  private val TitleRe = "(?s)<title>(.*?)</title>".r
  private val BlockRe = "(?s)<(nav|p|footer)\\b[^>]*>(.*?)</\\1>".r
  private val AnchorRe = "(?s)<a\\b[^>]*>(.*?)</a>".r

  private def stripTags(s: String): String = s.replaceAll("(?s)<[^>]*>", "")

  /** Parse one page: (title, n_words, blocks kept, blocks dropped, clean
    * text). Generator-blind — it sees only markup. */
  private[graft] def extract(html: String): (String, Long, Long, Long, String) = {
    val noScript = ScriptStyleRe.replaceAllIn(html, " ")
    val title = unescape(
      TitleRe.findFirstMatchIn(noScript).map(_.group(1)).getOrElse(""))
    val kept = scala.collection.mutable.ArrayBuffer.empty[String]
    var dropped = 0L
    BlockRe.findAllMatchIn(noScript).foreach { m =>
      val inner = m.group(2)
      val text = stripTags(inner)
      val linked = AnchorRe.findAllMatchIn(inner)
        .map(a => stripTags(a.group(1)).length).sum
      if (text.isEmpty || linked.toDouble / text.length > LinkDensityMax)
        dropped += 1
      else kept += text
    }
    val clean = unescape(kept.mkString(" "))
    val nWords = if (clean.isEmpty) 0L else clean.split(" ").length.toLong
    (title, nWords, kept.length.toLong, dropped, clean)
  }

  /** The ONE per-document kernel behind the batch key and the streaming
    * twin ([[graft.streaming.Streams.htmlStripStream]]): synthesize the
    * page, extract, emit the stat row (clean text still raw — the md5 is
    * a codegen'd projection on top in both forms). */
  private[graft] def rowOf(id: Long, text: String): (Long, String, Long, Long, Long, String) = {
    val (title, nWords, nKept, nDropped, clean) = extract(htmlOf(text))
    (id, title, nWords, nKept, nDropped, clean)
  }

  /** Suite key: synthesize each doc's page, extract, report the content
    * stats + an md5 of the clean text. The oracle derives every column
    * from `documents.text` alone (see object doc). */
  val htmlStrip: Q = (s, d) => {
    val spark = s
    import spark.implicits._
    Tables.documents(s, d)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) => rowOf(id, text) }
      .toDF("doc_id", "title", "n_words", "n_blocks_kept", "n_blocks_dropped", "clean")
      .select(col("doc_id"), col("title"), col("n_words"),
        col("n_blocks_kept"), col("n_blocks_dropped"),
        md5(col("clean")).as("clean_md5"))
      .orderBy(col("doc_id"))
  }

  val queries: Map[String, Q] = Map(
    "q_html_strip" -> htmlStrip,
  )

  val oracles: Map[String, String] = Map(
    // content contract straight from the corpus: the extractor must restore
    // exactly the original words (single-space joined), first-3-word title,
    // ceil(n/10) kept paragraphs, and the 2 boilerplate blocks dropped
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
        |  CAST(2 AS BIGINT) AS n_blocks_dropped,
        |  md5(clean) AS clean_md5
        |FROM c ORDER BY doc_id""".stripMargin,
  )
}
