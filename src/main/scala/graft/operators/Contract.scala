package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** DISTINCT-TEXT star contraction for pure per-text kernels (r15
  * optimization round) — the member-vs-distinct discipline VERDICT r9
  * prescribed for candidate stages, applied to the scoring/decode kernels
  * themselves: a kernel whose output is a pure function of the document
  * TEXT (every media chain — the blob is `mediaBlob(text)` — and every
  * text-statistics chain) runs once per DISTINCT text, and each document
  * picks up its text's verdict rows by the 16-byte [[Text.textKey]] md5
  * (the exactDedup grouping discipline; a NULL text keys via the sentinel).
  *
  * Exactness: md5 content-address grouping is already the engine's exact-
  * dedup semantics; the join-back ships (doc_id, h) pairs only — Θ(docs)
  * × 24 bytes — and every touched key is re-proved against the DuckDB
  * oracle. A doc whose text produces ZERO kernel rows stays absent, same
  * as the uncontracted flatMap.
  *
  * Scale: kernel cost now tracks distinct texts, not corpus size — on a
  * dup-dense corpus (production crawls; the engine's 100-copy scale
  * decades) the collapse is the duplication factor (measured 13× on
  * q_lm_score at sf10). On an all-distinct corpus the contraction costs
  * one extra Θ(distinct) aggregate and the join-back, bounded by the
  * plain scan.
  */
object Contract {

  /** Run `kernel` once per distinct text of the dataset's documents and
    * join its rows back per document. The kernel maps the (h, text) reps
    * to a DataFrame that KEEPS the `h` column; the result carries doc_id
    * plus the kernel's other columns (callers append their ORDER BY). */
  def perText(s: SparkSession, d: String)(
      kernel: Dataset[(String, String)] => DataFrame): DataFrame =
    perTextOf(Tables.documents(s, d))(kernel)

  /** [[perText]] over an arbitrary (doc_id, text, …) relation — for the
    * index-lifecycle paths that fingerprint filtered batches. */
  def perTextOf(docs: DataFrame)(
      kernel: Dataset[(String, String)] => DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val reps = Text.textReps(docs.select(col("text")))
      .select(col("h"), col("text")).as[(String, String)]
    docs
      .select(col("doc_id"), Text.textKey(col("text")).as("h"))
      .join(kernel(reps), Seq("h"))
      .drop("h")
  }

  /** The contraction split open for callers that keep working at TEXT
    * granularity instead of joining verdicts back per doc (r16): returns
    *
    *   - `lights` — (doc_id, h): the per-doc pass, no shuffle, text never
    *     leaves the scan;
    *   - `reps`   — (h, text, mult, mindoc): one row per distinct text with
    *     its document multiplicity and minimum doc_id, from the SAME single
    *     aggregate [[Text.textReps]] pays (min(doc_id) rides the existing
    *     exchange for free).
    *
    * The near-dup signature families (minhash LSH / simhash) use this to
    * build their signature-group structure over DISTINCT TEXTS — group
    * reps and sizes recovered exactly as min(mindoc) / Σ mult — so the
    * per-doc signature table, its persist, the doc-level groupBy(sig) and
    * the doc-level join on the signature ARRAY all disappear from the
    * query (guide §1.2 step 1 / §2.4: the contraction's own aggregate
    * already holds everything the downstream grouping needed). */
  def perTextStats(docs: DataFrame): (DataFrame, DataFrame) = {
    val lights = docs.select(col("doc_id"), Text.textKey(col("text")).as("h"))
    val reps = docs
      .select(Text.textKey(col("text")).as("h"), col("text"), col("doc_id"))
      .groupBy(col("h"))
      .agg(first(col("text")).as("text"), count(lit(1)).as("mult"),
        min(col("doc_id")).as("mindoc"))
    (lights, reps)
  }
}
