package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Hashing

/** Text-analysis + deduplication operators over the `documents` table
  * (north-star LLM-pipeline extension): exact dedup, token/term statistics,
  * shingling, tf-idf/BM25 ranking, quality scoring (plus the Gopher-rule
  * and repetition filters), language-ID heuristic, bigram-LM perplexity
  * scoring, prefix-filtered incremental dedup, cross-source overlap and
  * contamination scans, Misra-Gries heavy hitters, deterministic (plain and
  * weighted) sampling, winnowing fingerprints.
  *
  * Tokenization is a single shared definition (split on whitespace of the
  * lower-cased, trimmed text) expressed identically in Spark, in DuckDB
  * oracle SQL, and in the typed kernels ([[graft.functions.Tok]]) so the
  * oracle hashes match.
  *
  * Scale: scans + keyed aggregations throughout; the explodes (terms,
  * shingles, bigrams) are the only row-expanders and are bounded by token
  * count, with map-side partial aggregation keeping shuffles at #distinct
  * keys; document text itself never shuffles.
  */
object Text {
  type Q = (SparkSession, String) => DataFrame

  private def toks(c: Column): Column = split(lower(trim(c)), "\\s+")

  /** Content address for the DISTINCT-TEXT star contraction (r15
    * optimization round): the [[exactDedup]] md5-group discipline, with a
    * sentinel so a NULL text keys (and joins) like any other group.
    *
    * ACCEPTED RISK (ADVICE r15): this 128-bit md5 is the load-bearing
    * doc→verdict join key across the ~25 contracted queries — two distinct
    * texts colliding would silently attach one text's verdict rows to the
    * other's documents. That is the same exposure [[exactDedup]] has always
    * accepted for its grouping (collision probability ~n²/2^129; at 10^12
    * docs ≈ 10^-15), kept as md5 so the contraction's groups are
    * bit-compatible with the exact-dedup discipline the oracles replay. */
  private[operators] def textKey(c: Column): Column =
    coalesce(md5(c), lit("__null_text__"))

  /** STAR CONTRACTION of a (…, text) relation to its distinct texts:
    * one row (h, text, mult) per distinct text. The per-row text kernels
    * (tokenize→shingle→score chains, media decode chains — every one a
    * pure function of the text) then run ONCE per distinct text instead of
    * once per document, with corpus-level counts recovered exactly by
    * weighting with the integer multiplicity — the member-vs-distinct
    * contraction VERDICT r9 prescribed for the dedup family, applied to
    * the scoring kernels themselves. On a dup-dense corpus (the 100-copy
    * scale decades; production crawls) kernel cost collapses by the
    * duplication factor; on an all-distinct corpus the contraction
    * degrades to one extra Θ(distinct) aggregate. The group-by ships one
    * representative text per (distinct hash × map partition) — bounded
    * above by the plain scan's row count, and by the dedup output mass in
    * the regime the contraction targets. */
  private[operators] def textReps(docs: DataFrame): DataFrame =
    docs.select(textKey(col("text")).as("h"), col("text"))
      .groupBy(col("h"))
      .agg(first(col("text")).as("text"), count(lit(1)).as("mult"))

  /** Exact dedup via content hash: one group per distinct text, with group
    * size and representative (min doc_id). At 100 TB this is the classic
    * hash-shuffle dedup; the 256-bit-hash groupBy shuffles only
    * (hash, id) pairs, never the text. */
  val exactDedup: Q = (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"), md5(col("text")).as("text_hash"))
      .groupBy(col("text_hash"))
      .agg(count(lit(1)).as("n_dups"), min(col("doc_id")).as("keep_doc_id"))
      .orderBy(col("text_hash"))

  /** Per-language corpus statistics. */
  val textStats: Q = (s, d) =>
    Tables.documents(s, d)
      .select(col("lang"), col("n_chars"), size(toks(col("text"))).cast("long").as("n_words"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_words")).as("total_words"),
        round(avg(col("n_chars")), 4).as("avg_chars"),
        round(avg(col("n_words")), 4).as("avg_words"))
      .orderBy(col("lang"))

  /** Top-5 terms per language: explode → count → top-k via the custom
    * [[graft.plans.TopKPerGroup]] operator. A `row_number` window here
    * partitions on `lang` — 5 distinct values, so 5 sort tasks each holding
    * 20% of all (lang, term) counts: the same low-cardinality skew funnel
    * the round-1 q_late_data_policy fix removed. The heap operator keeps
    * ≤ 5 rows per group per map task instead. */
  val termFreq: Q = (s, d) => {
    val counts = Tables.documents(s, d)
      .select(col("lang"), explode(toks(col("text"))).as("term"))
      .where(length(col("term")) > 0)
      .groupBy(col("lang"), col("term"))
      .agg(count(lit(1)).as("n"))
    graft.plans.TopKPerGroup
      .topK(counts, Seq("lang"), Seq("n" -> false, "term" -> true), 5)
      .select(col("lang"), col("rn"), col("term"), col("n"))
      .orderBy(col("lang"), col("rn"))
  }

  /** TF-IDF top-3 terms per document — the classic relevance scoring pass of
    * a text corpus pipeline, and the second production composition of the
    * custom top-k operator. tf = per-(doc, term) count; df = docs containing
    * the term; idf = ln((N+1)/(df+1)). Everything is scan + two partial-agg
    * shuffles + one broadcast of the N scalar; the per-doc top-3 never sorts
    * a doc's full term list. */
  val tfidf: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    // r15: DISTINCT-TEXT contraction — tf and the per-doc top-3 are pure
    // text functions; df recovers exactly as the multiplicity-weighted sum
    // over distinct texts containing the term (same integers), and each
    // doc joins its text's top-3 back on the md5 key.
    val reps = textReps(docs.select(col("text")))
    val tf = reps
      .select(col("h"), explode(toks(col("text"))).as("term"))
      .where(length(col("term")) > 0)
      .groupBy(col("h"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.join(reps.select(col("h"), col("mult")), Seq("h"))
      .groupBy(col("term")).agg(sum(col("mult")).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val scored = tf.join(df, "term").crossJoin(broadcast(n))
      .withColumn("tfidf_r",
        round(col("tf") * log((col("n_docs") + 1.0) / (col("df") + 1.0)), 4))
    val top = graft.plans.TopKPerGroup
      .topK(scored, Seq("h"), Seq("tfidf_r" -> false, "term" -> true), 3)
    docs.select(col("doc_id"), textKey(col("text")).as("h"))
      .join(top, Seq("h"))
      .select(col("doc_id"), col("rn"), col("term"), col("tf"), col("tfidf_r"))
      .orderBy(col("doc_id"), col("rn"))
  }

  /** Word 3-gram shingle array of a token array, used by [[ngramShingles]]
    * (the high-throughput shingle consumers — source overlap, contamination
    * — use the typed [[shingleRows]] pass instead; their oracle CTEs mirror
    * this definition).
    *
    * CALLER CONTRACT: only valid under a `size(ws) >= 3` guard. For shorter
    * inputs `sequence(1, greatest(size-2, 0))` is the DESCENDING sequence
    * [1, 0], and `slice(ws, 0, 3)` throws at runtime (slice is 1-based). */
  private def shingleArr(ws: Column): Column = transform(
    sequence(lit(1), greatest(size(ws) - 2, lit(0))),
    i => concat_ws(" ", slice(ws, i, lit(3))))

  /** JVM-side replica of the shared `toks` column expression (see
    * [[graft.functions.Tok]] for the exactness notes — Spark trim/split
    * edge cases). TextQualitySpec pins the equality on adversarial
    * strings. */
  private[graft] def tokenize(text: String): Array[String] =
    graft.functions.Tok.tokenize(text)

  /** Exploded shingle rows via ONE typed tokenizer pass. Semantically
    * identical to `explode(shingleArr(toks(text)))` but compiled: the
    * declarative spelling is three nested higher-order functions
    * (sequence → transform → slice/concat_ws), all CodegenFallback —
    * interpreted per shingle with a fresh array copy per position. Same
    * lesson as lang-id: one typed pass over the tokens, allocation-
    * bounded, ~6× faster at sf0.1. Tokenization is [[tokenize]], the
    * exact replica of the shared `toks` definition.
    *
    * r15: emitted per DISTINCT text (h, sh) — one
    * row per shingle occurrence per distinct text — the set-semantics
    * consumers (contamination, source overlap) recover their per-doc/
    * per-source sets exactly while the shingle kernel tracks distinct
    * texts. (Replaces the per-doc `shingleRows` pass, r15.) */
  private def repShingleRows(s: SparkSession, d: String): DataFrame = {
    val spark = s
    import spark.implicits._
    textReps(Tables.documents(s, d).select(col("text")))
      .select(col("h"), col("text")).as[(String, String)]
      .flatMap { case (h, text) =>
        graft.functions.Tok.shingles(tokenize(text), 3).map((h, _))
      }
      .toDF("h", "sh")
  }

  /** Word 3-gram shingle sets per document (near-dup groundwork): token
    * count + distinct shingle count, UDF-free via sequence+transform. */
  val ngramShingles: Q = (s, d) => {
    val ws = toks(col("text"))
    val shingles = shingleArr(ws)
    // r15: per DISTINCT text — the declarative (CodegenFallback) shingle
    // expression now evaluates once per distinct text, not per doc
    val perText = textReps(Tables.documents(s, d).select(col("text")))
      .select(col("h"), size(ws).cast("long").as("n_tokens"),
        when(size(ws) >= 3, size(array_distinct(shingles)))
          .otherwise(0).cast("long").as("n_shingles"))
    Tables.documents(s, d)
      .select(col("doc_id"), textKey(col("text")).as("h"))
      .join(perText, Seq("h"))
      .select(col("doc_id"), col("n_tokens"), col("n_shingles"))
      .orderBy(col("doc_id"))
  }

  /** BPE-ish regex token counting: words vs punctuation runs. */
  val tokenCount: Q = (s, d) => {
    // r15: the regex extracts are pure text functions — per DISTINCT text
    val perText = textReps(Tables.documents(s, d).select(col("text")))
      .select(col("h"),
        size(regexp_extract_all(col("text"), lit("[a-z0-9]+"), lit(0))).cast("long").as("n_word_toks"),
        size(regexp_extract_all(col("text"), lit("[^a-z0-9\\s]"), lit(0))).cast("long").as("n_punct_toks"),
        length(col("text")).cast("long").as("n_chars_calc"))
    Tables.documents(s, d)
      .select(col("doc_id"), textKey(col("text")).as("h"))
      .join(perText, Seq("h"))
      .select(col("doc_id"), col("n_word_toks"), col("n_punct_toks"),
        col("n_chars_calc"))
      .orderBy(col("doc_id"))
  }

  /** The scalar `quality` column of [[qualityScore]], factored out so every
    * consumer — the standalone key and the near-dup keep-best canonicalizer
    * ([[DedupCluster.keepBest]]) — scores with the ONE definition the
    * q_quality_score oracle replays (operand order included: the rounded
    * double must be bit-identical across engines for the argmax tie
    * structure to agree). */
  private[graft] def qualityExpr: Column = {
    val ws = toks(col("text"))
    val nChars = length(col("text")).cast("double")
    val nPunct = size(regexp_extract_all(col("text"), lit("[^a-z0-9\\s]"), lit(0))).cast("double")
    val nToks = size(ws).cast("double")
    round(least(nToks / 100.0, lit(1.0)) * (lit(1.0) - nPunct / nChars), 4)
  }

  /** Heuristic quality score: length, punctuation ratio, stopword ratio,
    * mean word length — the standard cheap pre-filters of LLM data
    * pipelines. */
  val qualityScore: Q = (s, d) => {
    val ws = toks(col("text"))
    val nChars = length(col("text")).cast("double")
    val nPunct = size(regexp_extract_all(col("text"), lit("[^a-z0-9\\s]"), lit(0))).cast("double")
    val nStop = size(filter(ws, t => t.isin("the", "a", "of", "and", "to"))).cast("double")
    val nToks = size(ws).cast("double")
    // r15: all four signals are pure text functions — per DISTINCT text,
    // joined back per doc ([[textReps]])
    val perText = textReps(Tables.documents(s, d).select(col("text")))
      .select(col("h"),
        round(nPunct / nChars, 4).as("punct_ratio"),
        round(nStop / nToks, 4).as("stopword_ratio"),
        round(nChars / nToks, 4).as("avg_token_len"),
        qualityExpr.as("quality"))
    Tables.documents(s, d)
      .select(col("doc_id"), textKey(col("text")).as("h"))
      .join(perText, Seq("h"))
      .select(col("doc_id"), col("punct_ratio"), col("stopword_ratio"),
        col("avg_token_len"), col("quality"))
      .orderBy(col("doc_id"))
  }

  /** Language-ID heuristic: per-language marker-token counts, argmax with a
    * fixed priority tie-break (en > de > es > fr > zh), 'und' when no marker
    * hits. Reported as a confusion summary per (true lang, guess).
    *
    * One typed tokenizer pass per document: all five marker counts come from
    * a single split + hash-map lookup per token. (The declarative form —
    * five `size(filter(ws, isin(...)))` higher-order calls — is
    * CodegenFallback and re-evaluates the split per call: 13.6 s → sub-second
    * at sf0.1.) Tokenization is [[tokenize]], the exact replica of the
    * shared `toks` definition. */
  val langId: Q = (s, d) => {
    val spark = s
    import spark.implicits._
    val markerLang: Map[String, Int] = Map(
      "the" -> 0, "a" -> 0, "of" -> 0,
      "der" -> 1, "die" -> 1, "und" -> 1,
      "el" -> 2, "la" -> 2, "que" -> 2,
      "le" -> 3, "les" -> 3, "et" -> 3,
      "的" -> 4, "是" -> 4, "了" -> 4)
    val langNames = Array("en", "de", "es", "fr", "zh")
    // r15: the guess is a pure text function — per DISTINCT text, joined
    // back per doc on the md5 key before the (lang, guess) roll-up
    val perText = textReps(Tables.documents(s, d).select(col("text")))
      .select(col("h"), col("text")).as[(String, String)]
      .map { case (h, text) =>
        val counts = new Array[Long](5)
        tokenize(text).foreach { t =>
          markerLang.get(t).foreach(i => counts(i) += 1)
        }
        var best = 0L; var bi = -1
        var i = 0
        while (i < 5) { if (counts(i) > best) { best = counts(i); bi = i }; i += 1 }
        (h, if (bi < 0) "und" else langNames(bi))
      }
      .toDF("h", "guess")
    Tables.documents(s, d)
      .select(col("lang"), textKey(col("text")).as("h"))
      .join(perText, Seq("h"))
      .groupBy(col("lang"), col("guess"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("lang"), col("guess"))
  }

  /** Deterministic per-group sampling: k docs per language, selected by
    * md5 of the doc id — the "carve a stable eval set out of 100 TB" op of
    * a training-data pipeline. Hash-ordered top-k means the sample is
    * reproducible across runs/engines (md5 exists on both sides, so this is
    * fully oracle-checked) and adding data only perturbs the selection
    * locally. Runs on the custom top-k operator: no per-language sort. */
  val samplePerGroup: Q = (s, d) => {
    val scored = Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), md5(col("doc_id").cast("string")).as("h"))
    graft.plans.TopKPerGroup
      .topK(scored, Seq("lang"), Seq("h" -> true, "doc_id" -> true), 3)
      .select(col("lang"), col("rn"), col("doc_id"), col("h"))
      .orderBy(col("lang"), col("rn"))
  }

  /** Domain-mixture balancing: downsample EVERY source to the smallest
    * source's doc count (the equal-share mixture), selecting each source's
    * survivors by deterministic md5 order — the "rebalance the domains
    * before training" op that sits between curation and packing in an LLM
    * pipeline. The per-source target is one count per source (config-sized
    * metadata; the driver read is bounded by the domain count, never data),
    * and selection runs on the heap [[graft.plans.TopKPerGroup]] operator —
    * no low-cardinality window funnel, ≤k rows per source per map task
    * through the shuffle.
    *
    * CONTRACT: unlike the other query builders this one runs an EAGER
    * driver job at construction time — the per-source target k is data
    * (the smallest source's count), so the plan cannot be built without
    * one bounded aggregate (source-cardinality rows → 1 row). */
  val sourceMix: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    val kRow = docs.groupBy(col("source")).agg(count(lit(1)).as("n"))
      .agg(min(col("n"))).head()
    // min() over zero groups is NULL — fail with the real reason instead of
    // an opaque NPE from getLong
    require(!kRow.isNullAt(0),
      "sourceMix: documents table is empty — no per-source target to balance to")
    val k = kRow.getLong(0).toInt
    val scored = docs.select(col("source"), col("doc_id"),
      md5(col("doc_id").cast("string")).as("h"))
    graft.plans.TopKPerGroup
      .topK(scored, Seq("source"), Seq("h" -> true, "doc_id" -> true), k)
      .select(col("source"), col("rn"), col("doc_id"), col("h"))
      .orderBy(col("source"), col("rn"))
  }

  /** Corpus-trained bigram language-model scoring — the CCNet/KenML-style
    * "perplexity filter" of LLM data pipelines, self-trained here: token
    * bigram counts over the corpus give add-one-smoothed conditional
    * probabilities P(w₂|w₁) = (c₁₂+1)/(c₁+V) (prefix count c₁ derived from
    * the bigram table itself, V = distinct-token vocabulary), and each
    * document scores the mean ln P over its bigrams — low scores = text
    * the corpus finds surprising (the drop signal). Model build is two
    * keyed partial aggregates; scoring joins the doc-bigram stream to the
    * model on the bigram key (broadcast when the vocabulary allows, hash
    * join otherwise) — text never shuffles, and everything downstream of
    * the tokenizer is exact integer counts + ln, so the whole pipeline is
    * oracle-checked. */
  val lmScore: Q = (s, d) => {
    val spark = s
    import spark.implicits._
    // r15: DISTINCT-TEXT contraction ([[textReps]]) — the doc→bigram
    // explode (the dominant kernel: tokenize + shingle assembly, formerly
    // run per document AND twice per query) runs once per distinct text;
    // the model counts recover exactly as integer multiplicity-weighted
    // sums (c12 = Σ_text mult·count_text ≡ the per-occurrence count), the
    // vocabulary is a set (invariant under duplication), and a document's
    // score is a pure function of its text, joined back per doc on the
    // md5 key at Θ(docs)·24 bytes. Identical output (oracle-reproved at
    // sf0.01/sf0.1 + fixed-binary compare at sf1); kernel cost now tracks
    // DISTINCT texts, not corpus size, on a dup-dense corpus.
    val reps = textReps(Tables.documents(s, d).select(col("text")))
    val repBg = reps.select(col("h"), col("text"), col("mult"))
      .as[(String, String, Long)]
      .flatMap { case (h, text, m) =>
        graft.functions.Tok.shingles(graft.functions.Tok.tokenize(text), 2)
          .map((h, _, m))
      }
      .toDF("h", "bg", "mult")
    val c12 = repBg.groupBy(col("bg")).agg(sum(col("mult")).as("c12"))
      .withColumn("w1", substring_index(col("bg"), " ", 1))
    val c1 = c12.groupBy(col("w1")).agg(sum(col("c12")).as("c1"))
    val vocab = reps
      .select(explode(toks(col("text"))).as("t")).agg(countDistinct(col("t")).as("v"))
    val lnP = log((col("c12") + 1.0) / (col("c1") + col("v")))
    val perText = repBg
      .join(c12, Seq("bg"))
      .join(c1, Seq("w1"))
      .crossJoin(broadcast(vocab))
      .select(col("h"), lnP.as("lp"))
      .groupBy(col("h"))
      // ACCEPTED RISK (same class as the pow last-ulp ties): avg() over
      // irrational ln terms sums in partition order on Spark but storage
      // order in DuckDB; a last-ulp difference could in principle flip the
      // 4-decimal round when a mean lands exactly on a .00005 boundary.
      // Unlike bm25's integer-valued avgdl this is not provably exact —
      // per-doc bigram counts are small (≤ ~500 terms), keeping the
      // accumulated error ≪ the rounding quantum in practice; a canonical
      // summation order would cost a per-doc sort for a risk that has
      // never materialized across rounds.
      .agg(count(lit(1)).as("n_bigrams"), round(avg(col("lp")), 4).as("mean_lnp_r"))
    Tables.documents(s, d)
      .select(col("doc_id"), textKey(col("text")).as("h"))
      .join(perText, Seq("h"))
      .select(col("doc_id"), col("n_bigrams"), col("mean_lnp_r"))
      .orderBy(col("doc_id"))
  }

  /** Model-based quality classifier — the GPT-3/CCNet-style "curated-vs-
    * crawl" filter, self-trained: a multinomial Naive Bayes over token
    * counts with add-one smoothing, weak labels from the source column
    * (src0–src3 = curated 'hi', the rest 'lo'), trained on the
    * `doc_id % 10 < 7` split and scoring EVERY document with the smoothed
    * log-likelihood ratio llr = ln P(doc|hi) − ln P(doc|lo) + ln-prior
    * delta (every document with a token stream, that is: a NULL-text doc
    * contributes no explode rows and is absent here exactly as in every
    * other token-statistics key; the streaming twin drops it identically). Positive llr ⇒ the doc reads like the curated sources — the
    * standard model-based selection signal (GPT-3 App. A; fastText filters
    * in RefinedWeb/FineWeb), complementing the unsupervised [[lmScore]].
    *
    * Scale: the model is VOCABULARY-sized — per-term class counts built by
    * two keyed partial aggregates on (term[, label]) and broadcast to the
    * scoring join, so document text never shuffles and scoring is a
    * map-side broadcast-hash join + per-doc partial aggregate. Everything
    * after the tokenizer is exact integer counts + ln, so the whole
    * train-and-score pipeline replays in DuckDB (same accepted last-ulp
    * rounding risk as [[lmScore]], documented there).
    *
    * Shared pieces below ([[nbTermCounts]]/[[nbLabels]]/[[nbClassCounts]])
    * are single-sourced with the streaming twin
    * ([[graft.streaming.Streams.nbScoreStream]]) so batch training and the
    * at-ingestion scorer cannot fork. */
  /** Per-(doc, term) occurrence counts — the NB classifier's one
    * row-expander, reused for both training (train split only) and scoring
    * (all docs), and by the streaming twin's offline trainer. */
  private[graft] def nbTermCounts(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), explode(toks(col("text"))).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("c"))

  /** Weak labels + deterministic train split for the NB classifier:
    * src0–src3 are the curated 'hi' class, `doc_id % 10 < 7` trains. */
  private[graft] def nbLabels(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(col("doc_id"),
      when(col("source").isin("src0", "src1", "src2", "src3"), "hi")
        .otherwise("lo").as("label"),
      (col("doc_id") % 10 < 7).as("is_train"))

  /** The trained NB model: per-term class counts over the train split —
    * VOCABULARY-sized by construction (the broadcast side of scoring and
    * the collected model of the streaming twin). */
  private[graft] def nbClassCounts(s: SparkSession, d: String): DataFrame =
    nbTermCounts(s, d).join(nbLabels(s, d).where(col("is_train")), Seq("doc_id"))
      .groupBy(col("term")).agg(
        sum(when(col("label") === "hi", col("c")).otherwise(0L)).as("c_hi"),
        sum(when(col("label") === "lo", col("c")).otherwise(0L)).as("c_lo"))

  val qualityClassifier: Q = (s, d) => {
    val tc = nbTermCounts(s, d)
    val cnt = nbClassCounts(s, d)
    val tot = cnt.agg(
      sum(col("c_hi")).as("tot_hi"), sum(col("c_lo")).as("tot_lo"),
      count(lit(1)).as("v"))
    val prior = nbLabels(s, d).where(col("is_train")).agg(
      sum(when(col("label") === "hi", 1L).otherwise(0L)).as("nd_hi"),
      sum(when(col("label") === "lo", 1L).otherwise(0L)).as("nd_lo"))
    // unseen-in-class terms fall out of the same formula at count 0; OOV
    // terms (absent from the train vocabulary entirely) coalesce to it
    val dlp =
      log((coalesce(col("c_hi"), lit(0L)) + 1.0) / (col("tot_hi") + col("v"))) -
        log((coalesce(col("c_lo"), lit(0L)) + 1.0) / (col("tot_lo") + col("v")))
    val dprior = log(col("nd_hi").cast("double")) - log(col("nd_lo").cast("double"))
    val scored = tc
      .join(broadcast(cnt), Seq("term"), "left")
      .crossJoin(broadcast(tot)).crossJoin(broadcast(prior))
      .select(col("doc_id"), col("c"), dlp.as("dlp"), dprior.as("dprior"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_tokens"),
        round(first(col("dprior")) + sum(col("c") * col("dlp")), 4).as("llr_r"))
    scored
      .withColumn("pred", when(col("llr_r") > 0, "hi").otherwise("lo"))
      .orderBy(col("doc_id"))
  }

  /** Engine-portable uniform draw u ∈ (0,1) over `doc_id`: two rounds of
    * 16-bit Knuth multiplicative hashing in 32-bit space — every
    * intermediate fits in int64 for ANY int64 doc_id (see [[aresKey]] for
    * the overflow analysis), and pure integer arithmetic makes the draw
    * bit-identical across engines. ONE definition under the A-Res key and
    * the [[stratifiedSplit]] assignment. */
  private[operators] def uniformDrawOf(id: Column): Column = {
    val m32 = lit(4294967296L)
    val h1 = id % m32
    val h2 = (h1 * lit(40503L)) % m32
    val h3 = (h2 * lit(40503L)) % m32
    (h3 + 1).cast("double") / lit(4294967297.0)
  }

  private[operators] def uniformDraw: Column = uniformDrawOf(col("doc_id"))

  /** The train/val/test assignment as a pure function of the id — ONE
    * definition under [[stratifiedSplit]] and the cross-split leakage
    * audit ([[Vectors.splitLeakage]]), so the split a document lands in
    * can never differ between the audit and the manifest. */
  private[operators] def splitAssignOf(id: Column): Column =
    when(uniformDrawOf(id) < SplitTrainFrac, lit("train"))
      .when(uniformDrawOf(id) < SplitValFrac, lit("val"))
      .otherwise(lit("test"))

  /** The A-Res ranking key u^(1/n_chars) as a column expression over
    * (doc_id, n_chars) — ONE definition under [[weightedSample]] and the
    * [[CorpusCurate]] flagship's final sampling stage (and mirrored in both
    * oracles), so the engine-portable integer draw can never fork. */
  private[operators] def aresKey: Column =
    pow(uniformDraw, lit(1.0) / col("n_chars").cast("double"))

  /** Weighted sampling without replacement (Efraimidis–Spirakis A-Res,
    * IPL 2006): per language, keep the k docs with the largest
    * u^(1/weight), u a per-doc uniform draw — selection probability
    * proportional to weight (here `n_chars`, i.e. longer docs more likely
    * in the eval set). The draw is two rounds of 16-bit Knuth
    * multiplicative hashing in 32-bit space — every intermediate fits in
    * int64 for ANY int64 doc_id (a single 32-bit-constant multiply would
    * overflow past doc_id ≈ 3.5e9: silent wraparound on Spark, a hard
    * error in the oracle), and pure integer arithmetic makes the draw
    * bit-identical across engines. The ranking key u^(1/w) then goes
    * through libm `pow` (1-ulp spec on both engines, not correctly
    * rounded) — the same accepted last-ulp tie risk as the cosine
    * orderings; the deterministic (k, doc_id) tiebreak bounds the damage
    * to genuinely-tied keys. Companion to [[samplePerGroup]]'s unweighted
    * md5-order sampling; runs on the heap [[graft.plans.TopKPerGroup]]
    * operator: one scan, ≤k rows per group per partition through the
    * shuffle, no per-group sort — the same plan shape at any corpus
    * size. */
  val weightedSample: Q = (s, d) => {
    val scored = Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), col("n_chars"), aresKey.as("k"))
    graft.plans.TopKPerGroup
      .topK(scored, Seq("lang"), Seq("k" -> false, "doc_id" -> true), 3)
      .select(col("lang"), col("rn"), col("doc_id"), col("n_chars"),
        round(col("k"), 6).as("key_r"))
      .orderBy(col("lang"), col("rn"))
  }

  /** Token-set (1-gram) Jaccard similarity join on a bounded sample
    * (doc_id < 50, J ≥ 0.5). Exact set arithmetic via array_intersect on
    * distinct token arrays; the full-corpus scalable path is
    * [[Vectors.minhashLsh]] (banded equi-join instead of pairs). */
  val jaccardNgram: Q = (s, d) => {
    val docs = Tables.documents(s, d).where(col("doc_id") < 50)
      .select(col("doc_id"), array_distinct(toks(col("text"))).as("ws"))
    val a = docs.select(col("doc_id").as("id_a"), col("ws").as("wa"))
    val b = docs.select(col("doc_id").as("id_b"), col("ws").as("wb"))
    val inter = size(array_intersect(col("wa"), col("wb"))).cast("double")
    val jac = inter / (size(col("wa")) + size(col("wb")) - inter)
    a.join(broadcast(b), col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), jac.as("jac"))
      .where(col("jac") >= 0.5)
      .select(col("id_a"), col("id_b"), round(col("jac"), 4).as("jaccard"))
      .orderBy(col("id_a"), col("id_b"))
  }

  /** Incremental near-dup classification — the standard ingestion shape at
    * 100 TB: a NEW batch of documents (here the 50 highest doc_ids) is
    * classified against the EXISTING corpus by token-set Jaccard ≥
    * [[SimJoinThreshold]], without ever forming the new×old cross product.
    *
    * The pruning is prefix filtering (Chaudhuri et al. SSJoin / Bayardo et
    * al. All-Pairs / ppjoin): order every document's tokens by ascending
    * global document frequency, keep only the first |ws| − ⌈t·|ws|⌉ + 1
    * tokens (the "prefix"), and join new-side prefixes to old-side prefixes
    * on the token. Soundness: J(x,y) ≥ t forces an overlap ≥ ⌈t·|x|⌉, so a
    * shared token must appear inside both prefixes — every true pair
    * survives; rare-token prefixes keep posting lists short, so candidate
    * volume tracks true-pair volume, not the cross product. Candidates are
    * then verified exactly (array_intersect) and aggregated per new doc.
    *
    * Shuffles: token df count, the prefix equi-join on token, and the
    * verify re-joins — all keyed, all on (id, token)-sized rows; document
    * text never moves. Output columns are derivable from the ≥t pair set
    * alone (never from dropped sub-threshold pairs), which is what makes
    * the prefix filter lossless for this query.
    *
    * Pruning power is data-dependent: it comes from rare tokens, so it
    * needs a Zipfian vocabulary (any real corpus). The fixture's word-salad
    * documents draw from a deliberately tiny shared vocabulary — measured
    * candidates are ~22.4k of the 22.5k cross pairs at sf0.001 because
    * ~70-82%% of ALL pairs are genuinely ≥ t-similar and even "rare" tokens
    * have dense postings. SimJoinSpec therefore proves the pruning on a
    * synthetic Zipfian corpus (unique-token tails) where the same code
    * prunes >97%% of the cross product, and proves soundness + exact
    * equality with the brute-force definition on the fixture. */
  val SimJoinThreshold = 0.5

  /** The prefix-filter core over a pre-tokenized corpus: docs = (doc_id,
    * ws ARRAY<STRING>), bounds = one-row (split); returns candidate
    * (new_id, old_id) pairs — every pair with J ≥ t survives. */
  private[graft] def prefixCandidates(docs: DataFrame, bounds: DataFrame,
      t: Double): DataFrame = {
    val dfCounts = docs.select(explode(col("ws")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
    // per-doc prefix: tokens sorted by (df, token), first |ws|-ceil(t*|ws|)+1
    val prefixes = docs
      .select(col("doc_id"), explode(col("ws")).as("tok"), size(col("ws")).as("sz"))
      .join(dfCounts, Seq("tok"))
      .groupBy(col("doc_id"), col("sz"))
      .agg(array_sort(collect_list(struct(col("cnt"), col("tok")))).as("ordered"))
      .select(col("doc_id"),
        explode(slice(col("ordered"), lit(1),
          (col("sz") - ceil(col("sz") * t) + 1).cast("int"))).as("pt"))
      .select(col("doc_id"), col("pt.tok").as("tok"))
      .crossJoin(broadcast(bounds))
    prefixes.where(col("doc_id") >= col("split"))
      .select(col("doc_id").as("new_id"), col("tok"))
      .join(prefixes.where(col("doc_id") < col("split"))
        .select(col("doc_id").as("old_id"), col("tok")), Seq("tok"))
      .select(col("new_id"), col("old_id"))
      .distinct()
  }

  /** Prefix-filtered candidate pairs (new_id, old_id) on the fixture split —
    * exposed for the spec's soundness assertions. */
  private[graft] def incrementalCandidates(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), array_distinct(toks(col("text"))).as("ws"))
    val bounds = docs.agg((max(col("doc_id")) - 49).as("split"))
    prefixCandidates(docs, bounds, SimJoinThreshold)
  }

  val dedupIncremental: Q = (s, d) => {
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), array_distinct(toks(col("text"))).as("ws"))
    val bounds = docs.agg((max(col("doc_id")) - 49).as("split"))
    val neu = docs.crossJoin(broadcast(bounds)).where(col("doc_id") >= col("split"))
    val inter = size(array_intersect(col("wa"), col("wb"))).cast("double")
    val jac = inter / (size(col("wa")) + size(col("wb")) - inter)
    val dups = incrementalCandidates(s, d)
      .join(docs.select(col("doc_id").as("new_id"), col("ws").as("wa")), Seq("new_id"))
      .join(docs.select(col("doc_id").as("old_id"), col("ws").as("wb")), Seq("old_id"))
      .select(col("new_id"), jac.as("jac"))
      .where(col("jac") >= SimJoinThreshold)
      .groupBy(col("new_id"))
      .agg(count(lit(1)).as("n_dups"), max(col("jac")).as("best"))
    neu.select(col("doc_id"))
      .join(dups.withColumnRenamed("new_id", "doc_id"), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_dups"), lit(0L)).cast("long").as("n_dups"),
        when(col("n_dups").isNotNull, 1L).otherwise(0L).as("is_dup"),
        round(coalesce(col("best"), lit(0.0)), 4).as("best_dup_jac"))
      .orderBy(col("doc_id"))
  }

  /** Exact heavy hitters (terms with ≥ 1% corpus frequency) via the
    * two-pass sketch-then-verify pattern: pass 1 aggregates a
    * [[graft.functions.MisraGries]] sketch (≤ k counters per partition
    * buffer, map-side mergeable) whose guarantee — no item with true
    * frequency > N/(k+1) is ever dropped — makes its candidate set a
    * superset of every ≥1% term at k=200; pass 2 recounts ONLY the
    * candidates exactly (broadcast semi-filter → keyed agg) and applies the
    * threshold as integer arithmetic (cnt·100 ≥ N). The sketch is a pure
    * optimization, invisible in the result — the oracle is the plain exact
    * definition. At 100 TB pass 1 shuffles one ≤k-entry sketch per
    * partition and pass 2 shuffles only candidate-term rows, vs the full
    * (term → count) shuffle of the naive plan. */
  val heavyHitters: Q = (s, d) => {
    val tokens = Tables.documents(s, d).select(explode(toks(col("text"))).as("term"))
    // sketch and corpus total N come out of the SAME single-row aggregate —
    // exactly two corpus scans end to end (sketch pass, recount pass)
    val cands = tokens
      .agg(graft.functions.MisraGries.misra_gries(col("term"), 200).as("cand"),
        count(lit(1)).as("n_total"))
      .select(explode(col("cand")).as("term"), col("n_total"))
    tokens.join(broadcast(cands), Seq("term"))
      .groupBy(col("term"), col("n_total")).agg(count(lit(1)).as("cnt"))
      .where(col("cnt") * 100 >= col("n_total"))
      .select(col("term"), col("cnt"),
        round(col("cnt").cast("double") / col("n_total"), 4).as("frac_r"))
      .orderBy(col("cnt").desc, col("term"))
  }

  /** BM25 ranking for a fixed query term set — the retrieval-scoring
    * companion to [[tfidf]] (Robertson/Spärck Jones; the Lucene idf
    * variant ln((N−df+0.5)/(df+0.5)+1)). Per-doc work is one tokenizer
    * pass filtered to query terms, so tf rows are |query|-bounded per doc;
    * df (|query| rows) and the (avgdl, N) scalars broadcast; the final
    * top-10 is TakeOrdered. No sort, no cross product — the 100 TB shape
    * is scan → tiny keyed agg → broadcast-joined scoring → per-partition
    * top-k. Constant arithmetic is spelled identically in Spark and the
    * oracle so both engines derive bit-identical doubles before the
    * 4-decimal round. */
  val bm25: Q = (s, d) => {
    val qterms = Seq("spark", "query", "window")
    val docs = Tables.documents(s, d)
    val dl = docs.select(col("doc_id"), size(toks(col("text"))).cast("double").as("dl"))
    val stats = dl.agg(avg(col("dl")).as("avgdl"), count(lit(1)).as("n_docs"))
    val tf = docs.select(col("doc_id"), explode(toks(col("text"))).as("term"))
      .where(col("term").isin(qterms: _*))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).cast("double").as("tf"))
    val dfT = tf.groupBy(col("term")).agg(count(lit(1)).cast("double").as("df"))
    val idf = log((col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0))
    val contrib = idf * (col("tf") * (lit(1.2) + lit(1.0))) /
      (col("tf") + lit(1.2) * (lit(1.0) - lit(0.75) + lit(0.75) * col("dl") / col("avgdl")))
    tf.join(broadcast(dfT), Seq("term"))
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(stats))
      .select(col("doc_id"), contrib.as("contrib"))
      .groupBy(col("doc_id"))
      .agg(round(sum(col("contrib")), 4).as("bm25_r"), count(lit(1)).as("n_terms"))
      .orderBy(col("bm25_r").desc, col("doc_id"))
      .limit(10)
  }

  /** Cross-source overlap matrix at the 3-gram shingle level — "how much
    * content do two corpus slices share", the source-level contamination /
    * provenance question of a training-data pipeline. Computed through the
    * inverted index, never doc×doc: one shuffle keyed by shingle builds each
    * shingle's source posting set, then source pairs expand from the ≤S
    * sorted set by expression, so per-shingle work is |sources containing
    * it|² (≤ S², S = #sources) and the doc-pair cross product never exists.
    * Text never moves. At 100 TB the only hot keys are shingles present in
    * nearly all sources — bounded by S² per shingle, and a stopword-shingle
    * filter (drop shingles above a df ceiling) is the standard mitigation
    * when S itself is large. */
  val sourceOverlap: Q = (s, d) => sourceOverlapWith(s, d, dfCeiling = None)

  /** [[sourceOverlap]] with the scale knobs exposed.
    *
    * `dfCeiling`: drop shingles whose posting set spans more than this many
    * sources BEFORE the S² pair expansion — the stopword-shingle mitigation
    * for many-source corpora, where ubiquitous shingles ("in the", boilerplate
    * headers) each cost S² expanded rows while carrying no provenance signal.
    * None = exact (the oracle-checked default); at thousand-source scale a
    * ceiling around 0.5–0.9·S bounds per-shingle work without touching any
    * discriminative shingle. TextQualitySpec pins that a generous ceiling
    * leaves the answer bit-identical and a tight one actually prunes. */
  def sourceOverlapWith(s: SparkSession, d: String, dfCeiling: Option[Int]): DataFrame = {
    // ONE shuffle keyed by shingle builds the posting set per shingle
    // (collect_set dedups in the aggregate — no separate distinct pass);
    // source pairs are then expanded from each ≤S-element sorted set by a
    // compiled flatMap, so the pair stream hits partial aggregation before
    // any further exchange. This replaced a distinct → self-join-on-shingle
    // plan that materialized the per-shingle S² pair rows through a hash
    // join and re-read the explode subtree three times: 4.5 s →
    // sub-second at sf0.1.
    val spark = s
    import spark.implicits._
    // r15: DISTINCT-TEXT contraction — the posting SET per shingle is the
    // union over distinct texts containing it of those texts' source sets
    // (collect_set semantics: occurrence multiplicities never mattered),
    // so the shingle explode tracks distinct texts and the (sh, source)
    // join stream replaces the Θ(corpus tokens) per-doc explode.
    val setsAll = repShingleRows(s, d).select(col("h"), col("sh")).distinct()
      .join(Tables.documents(s, d)
        .select(textKey(col("text")).as("h"), col("source")).distinct(), Seq("h"))
      .groupBy(col("sh"))
      .agg(sort_array(collect_set(col("source"))).as("ss"))
    val sets = dfCeiling.fold(setsAll)(c => setsAll.where(size(col("ss")) <= c))
    // the expansion includes the DIAGONAL (x, x): its count is exactly the
    // per-source distinct-shingle total, so totals and pair counts fall out
    // of ONE aggregate over ONE shingle pass — no second scan for `n`.
    val counts = sets.select(col("ss")).as[Seq[String]]
      .flatMap { ss =>
        for { i <- ss.indices.iterator; j <- i until ss.length }
          yield (ss(i), ss(j))
      }
      .toDF("source_a", "source_b")
      .groupBy(col("source_a"), col("source_b"))
      .agg(count(lit(1)).as("cnt"))
    // per-source totals come back out of the SAME ≤S²+S-row aggregate by
    // window lookup: pairs are emitted with source_a <= source_b, so the
    // diagonal row (x, x) is present in both the partition-by-source_a
    // group of x's left pairs and the partition-by-source_b group of its
    // right pairs. One linear plan, counts consumed exactly once — no
    // persist to leak in a long-lived session (the r4 hygiene finding),
    // and the windows only touch the tiny pair matrix, never shingles.
    val diag = when(col("source_a") === col("source_b"), col("cnt"))
    counts
      .withColumn("na", max(diag).over(Window.partitionBy(col("source_a"))))
      .withColumn("nb", max(diag).over(Window.partitionBy(col("source_b"))))
      .where(col("source_a") < col("source_b"))
      .select(col("source_a"), col("source_b"), col("cnt").as("n_shared"),
        round(col("cnt").cast("double") / (col("na") + col("nb") - col("cnt")), 4)
          .as("jaccard_r"))
      .orderBy(col("source_a"), col("source_b"))
  }

  /** Benchmark-contamination scan: treating one source (`src0`) as the
    * held-out benchmark, report for every other document the fraction of its
    * distinct 3-gram shingles that appear anywhere in the benchmark — the
    * n-gram-overlap decontamination check LLM training pipelines run against
    * eval sets. One semi-join keyed by shingle (the benchmark side is the
    * small one and broadcasts at real scale); per-doc counts are two keyed
    * aggregations. `contaminated` flags docs with ≥ 10% shingle overlap. */
  /** Contamination cutoff — shared by the Scala flag, the q_contamination
    * oracle and the corpus-curate clean gate. */
  private[graft] val ContaminationThreshold = 0.1

  val contamination: Q = (s, d) => {
    // distinct per-doc shingles once; the benchmark side is ONLY src0's
    // documents re-shingled (a tiny filtered scan, broadcast), and hit/total
    // counting is a single conditional aggregate after one broadcast left
    // join — not a semi-join plus a second agg plus a re-join (3.1 s →
    // sub-second at sf0.1).
    //
    // r15: DISTINCT-TEXT contraction — a doc's (n_sh, n_hit) depends only
    // on its text and the benchmark shingle SET (set semantics: dup counts
    // never mattered), so shingling runs once per distinct text; the bench
    // set is the union over texts that appear with source=src0, and each
    // non-src0 doc joins its text's verdict back on the md5 key.
    val docs = Tables.documents(s, d)
    val repSh = repShingleRows(s, d).select(col("h"), col("sh")).distinct()
    val benchH = docs.where(col("source") === "src0")
      .select(textKey(col("text")).as("h")).distinct()
    val bench = repSh.join(benchH, Seq("h"), "left_semi")
      .select(col("sh")).distinct()
      .withColumn("hit", lit(1L))
    val perText = repSh.join(broadcast(bench), Seq("sh"), "left")
      .groupBy(col("h"))
      .agg(count(lit(1)).as("n_sh"), sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
    val frac = col("n_hit").cast("double") / col("n_sh")
    docs.where(col("source") =!= "src0")
      .select(col("doc_id"), textKey(col("text")).as("h"))
      .join(perText, Seq("h"))
      .select(col("doc_id"), col("n_sh"), col("n_hit"),
        round(frac, 4).as("hit_frac_r"),
        (frac >= ContaminationThreshold).cast("long").as("contaminated"))
      .orderBy(col("doc_id"))
  }

  /** Shared per-document token statistics for the repetition / quality-rule
    * family: (doc_id, n_tokens, n_distinct, top_cnt, mwl, dup_bigram_frac).
    *
    * Token stats come from one explode → (doc, term) partial-agg →
    * (doc) agg chain — two keyed shuffles whose rows are (id, term)-sized,
    * text never shuffled; the bigram duplicate fraction is a pure
    * per-row expression (sequence + slice like [[ngramShingles]]). At
    * 100 TB both sides are scan-parallel with map-side combine.
    */
  private def docTokenStats(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    // r15: the token/bigram statistics are pure text functions — computed
    // once per DISTINCT text ([[textReps]]) and joined back per doc
    val reps = textReps(docs.select(col("text")))
    val ws = toks(col("text"))
    val termAgg = reps.select(col("h"), explode(ws).as("term"))
      .groupBy(col("h"), col("term"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("h"))
      .agg(sum(col("c")).as("n_tokens"),
        count(lit(1)).as("n_distinct"),
        max(col("c")).as("top_cnt"),
        (sum(length(col("term")) * col("c")).cast("double") / sum(col("c"))).as("mwl"))
    val bigrams = transform(
      sequence(lit(1), greatest(size(ws) - 1, lit(0))),
      i => concat_ws(" ", slice(ws, i, lit(2))))
    val bigramFrac = reps.select(col("h"),
      when(size(ws) >= 2,
        lit(1.0) - size(array_distinct(bigrams)).cast("double") / size(bigrams))
        .otherwise(0.0).as("dup_bigram_frac"))
    docs.select(col("doc_id"), textKey(col("text")).as("h"))
      .join(termAgg.join(bigramFrac, Seq("h")), Seq("h"))
      .drop("h")
  }

  /** Per-document repetition signals — the Gopher/C4-style "is this document
    * degenerate boilerplate" measurements every LLM data pipeline runs before
    * training: distinct-token ratio, most-frequent-term mass fraction, and
    * the fraction of duplicated word bigrams. */
  val repetitionStats: Q = (s, d) =>
    docTokenStats(s, d).select(col("doc_id"),
      col("n_tokens"),
      round(col("n_distinct").cast("double") / col("n_tokens"), 4).as("distinct_ratio_r"),
      round(col("top_cnt").cast("double") / col("n_tokens"), 4).as("top_term_frac_r"),
      round(col("dup_bigram_frac"), 4).as("dup_bigram_frac_r"))
      .orderBy(col("doc_id"))

  /** Gopher-style rule filter: per-document keep/drop flags (1/0) for the
    * standard cheap quality gates — token-count bounds, mean-word-length
    * bounds, top-term concentration, distinct-token ratio — and the combined
    * `keep` decision. Thresholds are calibrated to the fixture so both
    * branches of every rule occur (rule thresholds in a real pipeline are
    * corpus config, not engine semantics). All comparisons are on doubles
    * derived from identical integer arithmetic in Spark and DuckDB, so the
    * boundary behavior is deterministic across engines. */
  /** Gopher rule thresholds — ONE definition under the Scala rule columns,
    * the q_gopher_rules oracle and the corpus-curate quality gate, so the
    * three descriptions of the gate cannot silently fork. */
  private[graft] val GopherMinTokens = 30
  private[graft] val GopherMaxTokens = 5000
  private[graft] val GopherMinMwl = 4.0
  private[graft] val GopherMaxMwl = 10.0
  private[graft] val GopherMaxTopFrac = 0.10
  private[graft] val GopherMinDistinctRatio = 0.45

  /** Per-document Gopher rule evaluation in plain Scala — (nTokens,
    * mwl rounded 4dp, fLen, fMwl, fRep, fDr), the SAME arithmetic as the
    * [[gopherRules]] columns (integer-derived doubles, sum(len·c)/sum(c)
    * over longs). Shared by the streaming gate twin
    * ([[graft.streaming.Streams.gopherSnapOf]]), the incremental curation
    * sink, and the oracle-checked batch-verdict key. A null/empty text
    * tokenizes to zero tokens and degrades to an all-flags-zero drop
    * (0/0 would be NaN; BigDecimal(NaN) throws). */
  private[graft] def gopherPerDoc(text: String)
      : (Long, Double, Long, Long, Long, Long) = {
    val ws = graft.functions.Tok.tokenize(text)
    val counts = new java.util.HashMap[String, Long]()
    var chars = 0L
    ws.foreach { w =>
      counts.merge(w, 1L, (a, b) => a + b); chars += w.length
    }
    val nTokens = ws.length.toLong
    if (nTokens == 0) return (0L, 0.0, 0L, 0L, 0L, 0L)
    var topCnt = 0L
    counts.values().forEach(c => if (c > topCnt) topCnt = c)
    val nDistinct = counts.size.toLong
    val mwl = chars.toDouble / nTokens
    val fLen = if (nTokens >= GopherMinTokens && nTokens <= GopherMaxTokens) 1L else 0L
    val fMwl = if (mwl >= GopherMinMwl && mwl <= GopherMaxMwl) 1L else 0L
    val fRep = if (topCnt.toDouble / nTokens <= GopherMaxTopFrac) 1L else 0L
    val fDr  = if (nDistinct.toDouble / nTokens >= GopherMinDistinctRatio) 1L else 0L
    (nTokens,
      BigDecimal(mwl).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble,
      fLen, fMwl, fRep, fDr)
  }

  val gopherRules: Q = (s, d) => {
    val fLen = (col("n_tokens") >= GopherMinTokens &&
      col("n_tokens") <= GopherMaxTokens).cast("long")
    val fMwl = (col("mwl") >= GopherMinMwl && col("mwl") <= GopherMaxMwl).cast("long")
    val fRep = (col("top_cnt").cast("double") / col("n_tokens") <= GopherMaxTopFrac).cast("long")
    val fDr  = (col("n_distinct").cast("double") / col("n_tokens") >= GopherMinDistinctRatio).cast("long")
    docTokenStats(s, d).select(col("doc_id"), col("n_tokens"),
        round(col("mwl"), 4).as("mwl_r"),
        fLen.as("f_len"), fMwl.as("f_mwl"), fRep.as("f_rep"), fDr.as("f_dr"),
        (fLen * fMwl * fRep * fDr).as("keep"))
      .orderBy(col("doc_id"))
  }

  /** Token budget per packed training sequence — fixture-sized (a real
    * pretraining pipeline uses the model context, e.g. 2048/8192); shared
    * by the operator and its oracle. */
  val PackCapacity = 256L

  /** Sequence packing for pretraining (concatenate-and-chunk): documents in
    * doc_id order form one token stream that is split every
    * [[PackCapacity]] tokens — the standard way training examples are
    * assembled from a curated corpus. Per doc: its global stream offset,
    * the chunks it lands in, and how many it spans.
    *
    * The global running offset is a TWO-PHASE DISTRIBUTED PREFIX SUM (the
    * [[RefOps.monotoneDedup]] idiom): range-partition by doc_id, one long
    * per partition (its token total) to the driver, exclusive-prefix
    * broadcast back, then each partition computes exact global offsets
    * locally — no `Window.orderBy` funnel serializing the corpus through
    * one task. Oracle: the window-cumsum definition in DuckDB. */
  val tokenPack: Q = (s, d) =>
    packByCounts(Tables.documents(s, d)
      .select(col("doc_id"), size(toks(col("text"))).cast("long").as("n_tokens")))

  /** The pack-geometry kernel of [[tokenPack]] over ANY per-doc count
    * frame (doc_id, n_tokens) — extracted so the BPE real-token mode
    * ([[Bpe.tokenPackBpe]]) reuses the exact two-phase distributed prefix
    * sum instead of forking the arithmetic. */
  private[operators] def packByCounts(counts: DataFrame): DataFrame = {
    val spark = counts.sparkSession
    import spark.implicits._
    val C = PackCapacity
    val n = math.max(1, spark.sessionState.conf.numShufflePartitions)
    // NOT persisted: Dataset.rdd is a lazy val, so the totals pass and the
    // offsets pass below share ONE planned RDD — identical range boundaries
    // and partition order by construction — and the offsets job reuses the
    // totals job's shuffle files (skipped map stage), so a cache would buy
    // nothing and leak blocks into the caller's session
    val parted = counts
      .select(col("doc_id"), col("n_tokens"))
      .repartitionByRange(n, col("doc_id"))
      .sortWithinPartitions("doc_id")
      .as[(Long, Long)]
    val totals = parted.rdd
      .mapPartitionsWithIndex { (i, it) =>
        var sum = 0L; it.foreach(sum += _._2); Iterator((i, sum))
      }
      .collect().sortBy(_._1).map(_._2)
    val prefix = totals.scanLeft(0L)(_ + _).dropRight(1)
    val bc = spark.sparkContext.broadcast(prefix)
    val packed = parted.rdd.mapPartitionsWithIndex { (i, it) =>
      var off = bc.value(i)
      it.map { case (id, nt) =>
        val start = off; off += nt
        val first = start / C
        val last = (start + math.max(nt, 1L) - 1L) / C
        (id, nt, start, first, last, last - first + 1L)
      }
    }
    spark.createDataset(packed)
      .toDF("doc_id", "n_tokens", "start_off", "chunk_first", "chunk_last", "n_chunks")
      .orderBy(col("doc_id"))
  }

  /** Chunk geometry for [[chunkTokens]] — fixture-sized (a real RAG/embedding
    * pipeline uses e.g. 512/384); shared by the operator, its oracle, and the
    * streaming twin so the three descriptions cannot fork. */
  val ChunkSize = 32
  val ChunkStride = 24

  /** Overlapping token-window chunker — the standard retrieval/embedding
    * preprocessing step ([[tokenPack]]'s complement: packing concatenates
    * documents into fixed sequences for PRETRAINING; chunking splits each
    * document into overlapping windows for INDEXING). Chunks start every
    * [[ChunkStride]] tokens and span [[ChunkSize]] (the final window
    * truncates at the document end), so consecutive chunks share
    * `ChunkSize - ChunkStride` tokens of context. Emits per chunk its
    * geometry plus `md5(chunk_text)` — the id a downstream embedding/dedup
    * stage keys on — rather than the text itself, so the wide column never
    * travels further than this map.
    *
    * Scale shape: one typed map-partitions pass over the documents scan —
    * no shuffle, no state, output Θ(tokens/stride). A doc's chunk count is
    * ⌈n/stride⌉, so output rows track corpus token volume linearly at any
    * document-length distribution. (The typed pass rather than a
    * sequence/transform/slice expression chain: three stacked interpreted
    * higher-order functions lose ~10× to one compiled flatMap — PERF.md
    * lesson 14.) Oracle: DuckDB replays the geometry with generate_series
    * and the hash with md5 over the same list-slice join. */
  /** The ONE chunk kernel — shared by the batch key and the streaming twin
    * ([[graft.streaming.Streams.chunkStream]]) so geometry and content
    * cannot fork between the two. */
  private[graft] def chunkRows(id: Long, text: String): Iterator[(Long, Long, Long, Long, String)] = {
    // null text → no chunks, matching DuckDB's null propagation
    // (generate_series over a NULL token list emits no rows); nothing at
    // load enforces non-null text, so the shared kernel guards (ADVICE r7)
    if (text == null) return Iterator.empty
    // limit -1 keeps trailing empty tokens, matching DuckDB's string_split
    // (Scala's default split drops them — a latent geometry/md5 divergence
    // on text ending in a separator)
    val tk = text.split(" ", -1)
    Iterator.range(0, tk.length, ChunkStride).map { st =>
      val end = math.min(st + ChunkSize, tk.length)
      (id, (st / ChunkStride).toLong, st.toLong, (end - st).toLong,
        tk.slice(st, end).mkString(" "))
    }
  }

  val chunkTokens: Q = (s, d) => {
    val spark = s
    import spark.implicits._
    Tables.documents(s, d)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .flatMap { case (id, text) => chunkRows(id, text) }
      .toDF("doc_id", "chunk_id", "start_tok", "n_tok", "chunk_text")
      .select(col("doc_id"), col("chunk_id"), col("start_tok"), col("n_tok"),
        md5(col("chunk_text")).as("chunk_md5"))
      .orderBy(col("doc_id"), col("chunk_id"))
  }

  /** Winnowing fingerprints: fingerprint count + min/max hash per doc.
    *
    * Oracle-checked (round 5): the winnow's OUTPUT is the sorted distinct
    * set of window-minimum VALUES — the rightmost-tie rule only decides
    * which index is picked, never the value — so DuckDB replays the whole
    * kernel per byte: the k-gram polynomial hash directly (Σ c_j·B^(k-1-j)
    * mod 2⁶⁴, algebraically identical to the rolling form), splitmix64 in
    * staged CTE columns (64×64→mod-2⁶⁴ multiplies as 32-bit split products
    * so INT128 never overflows; each stage materialized once — nested
    * macros expand exponentially), then a 4-row window MIN + DISTINCT. */
  val docFingerprint: Q = (s, d) => {
    val spark = s
    import spark.implicits._
    // r15: winnowing is a pure text function — once per DISTINCT text
    Contract.perText(s, d) { reps =>
      reps.map { case (h, text) =>
        val fp = Hashing.winnow(text, k = 8, w = 4)
        (h, fp.length.toLong, if (fp.isEmpty) 0L else fp.min, if (fp.isEmpty) 0L else fp.max)
      }.toDF("h", "n_fingerprints", "min_fp", "max_fp")
    }.orderBy(col("doc_id"))
  }

  // ---------------------------------------------------------------------
  // PII scrubbing + URL canonicalization — the two standard curation
  // stages (redact contact info; dedup by canonical URL) that were absent
  // from the round-5 surface. The synthetic corpus carries no emails,
  // phones, digits or URLs, so each operator runs over a DETERMINISTIC
  // fixture-enrichment column derived from table values (the same honest
  // stand-in pattern as the multimodal kernels: the enrichment is part of
  // the query and replayed verbatim by the oracle; the scrub/canonicalize
  // kernels are the real, reusable operators).
  // ---------------------------------------------------------------------

  /** Email/phone patterns shared by the Spark kernels and (interpolated
    * verbatim) their oracles — the RE2 ∩ java.util.regex portable subset:
    * character classes and bounded repetition only, no lookaround, no
    * backrefs, so both engines match identically. */
  private[operators] val EmailRe = """[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"""
  private[operators] val PhoneRe = """\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}"""

  /** text + injected PII for doc_id ≡ 0 (mod 3): an email, (mod 5): a
    * phone — every combination of none/either/both occurs in the fixture. */
  private def piiEnriched: Column =
    concat(col("text"),
      when(col("doc_id") % 3 === 0,
        concat(lit(" contact "), col("source"), col("doc_id").cast("string"),
          lit("@mail.example.com"))).otherwise(lit("")),
      when(col("doc_id") % 5 === 0,
        concat(lit(" call +1-555-"),
          lpad((col("doc_id") % 10000).cast("string"), 4, "0"))).otherwise(lit("")))

  /** PII redaction: count + replace emails/phones with [EMAIL]/[PHONE]
    * markers, emit per-doc counts and the md5 of the scrubbed text (pins
    * the exact replacement behavior, not just the counts). Pure codegen'd
    * regexp built-ins over one narrow projection — no UDF, no shuffle
    * before the presentation sort; at 100 TB this is a map-only stage that
    * rides whatever partitioning the corpus already has. */
  val piiScrub: Q = (s, d) =>
    piiScrubCols(Tables.documents(s, d)).orderBy(col("doc_id"))

  /** The PII scrub projection applied to any documents relation — ONE
    * definition under the batch key and the streaming twin
    * ([[graft.streaming.Streams.piiScrubStream]]), so the two cannot
    * fork. Pure stateless column algebra: valid on a stream as-is. */
  private[graft] def piiScrubCols(docs: DataFrame): DataFrame = {
    val t = piiEnriched
    val scrub = regexp_replace(regexp_replace(t, EmailRe, "[EMAIL]"), PhoneRe, "[PHONE]")
    docs.select(
      col("doc_id"),
      regexp_count(t, lit(EmailRe)).cast("long").as("n_emails"),
      regexp_count(t, lit(PhoneRe)).cast("long").as("n_phones"),
      length(scrub).cast("long").as("n_chars_scrub"),
      md5(scrub).as("scrub_md5"))
  }

  /** Zero-width / BOM code points stripped by [[unicodeNormalize]] —
    * the invisible characters crawled text is full of; NFC does NOT remove
    * them (they are format characters, not combining marks), so the scrub
    * is an explicit regex both engines run. The class is spelled with
    * \x{...} escapes so the SAME pattern text compiles in java.util.regex
    * and RE2. */
  private[operators] val ZeroWidthRe = """[\x{200B}\x{200C}\x{200D}\x{FEFF}]"""

  /** text + an injected unicode hazard per doc_id ≡ k (mod 3): a combining
    * acute (NFC merges e+U+0301 → é, length shrinks), a zero-width space
    * (NFC keeps it, the explicit strip removes it), or the ﬁ ligature
    * (U+FB01 — canonical NFC keeps it; only compatibility NFKC would fold
    * it, pinning WHICH normal form the operator implements). */
  private def unicodeEnriched: Column =
    concat(
      when(col("doc_id") % 3 === 0, lit("e\u0301 "))   // DECOMPOSED e + combining acute
        .when(col("doc_id") % 3 === 1, lit("A\u200BB ")) // zero-width space inside a token
        .otherwise(lit("\uFB01le ")),                    // fi ligature (NFC-invariant)
      col("text"))

  /** Unicode canonicalization — the text-cleanup stage every crawl
    * pipeline runs before hashing/dedup (mixed NFC/NFD sources make
    * byte-level dedup miss visually identical text): NFC composition, then
    * zero-width/BOM strip, then whitespace collapse. Emits lengths, a
    * changed flag and `md5(text_norm)` so downstream exact-dedup keys on
    * the canonical bytes.
    *
    * Scale shape: one typed map (the JDK normalizer — Spark has no native
    * NFC expression) inside a map-only stage: no shuffle before the
    * presentation sort, rides the corpus partitioning at any size. The
    * corpus body is ASCII (NFC-invariant), so the injected markers are
    * what exercises each branch — the same honest-enrichment pattern as
    * the PII scrub above. Oracle: DuckDB's utf8proc `nfc_normalize` +
    * the same regex pair; both engines md5 the identical UTF-8 bytes. */
  val unicodeNormalize: Q = (s, d) => {
    val spark = s
    import spark.implicits._
    Tables.documents(s, d)
      .select(col("doc_id"), unicodeEnriched.as("raw"))
      .as[(Long, String)]
      .map { case (id, raw) =>
        // null-safe (ADVICE r7): concat propagates a null doc text to a
        // null raw; propagate it on through (DuckDB's nfc_normalize(NULL)
        // is NULL) instead of NPE-ing the normalizer
        (id, raw,
          if (raw == null) null
          else java.text.Normalizer.normalize(raw, java.text.Normalizer.Form.NFC))
      }
      .toDF("doc_id", "raw", "nfc")
      .select(col("doc_id"), col("raw"),
        regexp_replace(regexp_replace(col("nfc"), ZeroWidthRe, ""), " +", " ")
          .as("clean"))
      .select(col("doc_id"),
        length(col("raw")).cast("long").as("len_raw"),
        length(col("clean")).cast("long").as("len_norm"),
        when(col("clean") =!= col("raw"), 1L).otherwise(0L).as("changed"),
        md5(col("clean")).as("norm_md5"))
      .orderBy(col("doc_id"))
  }

  /** Synthetic URL per doc, with every canonicalization hazard injected
    * deterministically: http/https split, WWW. prefix, mixed-case host,
    * trailing slash, utm_* tracking query, fragment. */
  private def urlEnriched: Column =
    concat(
      when(col("doc_id") % 2 === 0, lit("https")).otherwise(lit("http")), lit("://"),
      when(col("doc_id") % 4 === 0, lit("WWW.")).otherwise(lit("")),
      col("source"), lit(".Example.COM/"), col("lang"), lit("/p/"),
      (col("doc_id") % 40).cast("string"),
      when(col("doc_id") % 3 === 0, lit("/")).otherwise(lit("")),
      when(col("doc_id") % 5 === 0,
        concat(lit("?utm_source=feed&uid="), col("doc_id").cast("string")))
        .otherwise(lit("")),
      when(col("doc_id") % 7 === 0, lit("#frag")).otherwise(lit("")))

  /** URL canonicalization + dedup: normalize scheme, lowercase the host,
    * strip www. / query / fragment / trailing slash, then keep one doc per
    * canonical URL (count + min-id representative) — crawl-side dedup
    * BEFORE any content hashing. regexp_extract/replace built-ins only;
    * the groupBy shuffles one short string + one long per doc. */
  val urlCanonicalize: Q = (s, d) => {
    val url = urlEnriched
    val host = regexp_replace(
      lower(regexp_extract(url, "^[a-z]+://([^/?#]+)", 1)), "^www\\.", "")
    val path = regexp_replace(
      regexp_extract(url, "^[a-z]+://[^/?#]+([^?#]*)", 1), "/$", "")
    Tables.documents(s, d)
      .select(col("doc_id"), concat(lit("https://"), host, path).as("canonical_url"))
      .groupBy(col("canonical_url"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("keep_doc_id"))
      .orderBy(col("canonical_url"))
  }

  /** Embedded public-suffix sample (the PSL shape: single- AND multi-label
    * suffixes, with `uk`/`au` alongside `co.uk`/`com.au` so a naive
    * last-label match provably mis-extracts). A real deployment swaps in
    * the full publicsuffix.org list; the kernel is unchanged. */
  private[graft] val PublicSuffixes: Set[String] =
    Set("com", "org", "net", "io", "uk", "co.uk", "ac.uk", "au", "com.au")

  /** Pinned registrable-domain blocklist: (source, suffix) COMBOS, not
    * whole sources — the gate must key on the extracted eTLD+1, and a
    * source-keyed shortcut would block all eight of a source's suffixes. */
  private[graft] val EtldBlocklist: Set[String] =
    Set("src3.com", "src7.co.uk", "src11.io", "src15.com.au", "src4.uk")

  /** Registrable domain (eTLD+1) by longest-suffix match over
    * [[PublicSuffixes]]; an unmatched TLD defaults to one label (the PSL
    * `*` rule). The oracle unrolls the match to the sample's max suffix
    * depth (2 labels). */
  private[graft] def registrableDomain(host: String): String = {
    val labels = host.split('.')
    var best = -1
    var k = 1
    while (k < labels.length) {
      if (PublicSuffixes(labels.takeRight(k).mkString("."))) best = k
      k += 1
    }
    if (best < 0) best = 1
    labels.takeRight(math.min(best + 1, labels.length)).mkString(".")
  }

  /** Crawl-frontier domain gate: synthesize each doc's host (variable
    * subdomain depth × eight public suffixes), extract the REGISTRABLE
    * domain with the longest-suffix PSL algorithm, and gate it against the
    * pinned eTLD+1 blocklist — the takedown/compliance filter a crawl
    * pipeline applies before any content work. The blocklist keys on
    * eTLD+1, so `www.src3.com` and `a.cdn.src3.com` block together while
    * `src3.co.uk` (same source, different registrable domain) passes — the
    * property a host-string or source-column gate gets wrong.
    *
    * Scale: suffix set and blocklist are O(bytes) broadcast literals; the
    * kernel is one compiled map per row (no shuffle, no join — a
    * blocklist of millions would become a broadcast semi-join on the
    * extracted eTLD+1, same plan shape as the contamination gate). */
  val etldGate: Q = (s, d) => {
    val spark = s
    import spark.implicits._
    // suffix keyed on doc_id DIV 8 so it decorrelates from the corpus's
    // source assignment (source is doc_id-residue-correlated; a % 8 pick
    // would give each source only two of the eight suffixes)
    val suffix = element_at(
      array(Seq("com", "org", "net", "io", "co.uk", "ac.uk", "com.au", "uk")
        .map(lit): _*),
      (expr("(doc_id DIV 8) % 8") + 1).cast("int"))
    val prefix = when(col("doc_id") % 3 === 1, lit("www."))
      .when(col("doc_id") % 3 === 2, lit("a.cdn."))
      .otherwise(lit(""))
    Tables.documents(s, d)
      .select(col("doc_id"),
        concat(prefix, col("source"), lit("."), suffix).as("host"))
      .as[(Long, String)]
      .map { case (id, host) =>
        val etld1 = registrableDomain(host)
        (id, host, etld1, if (EtldBlocklist(etld1)) 1 else 0)
      }
      .toDF("doc_id", "host", "etld1", "is_blocked")
      .orderBy(col("doc_id"))
  }

  /** Span width (tokens) for substring-level duplicate detection and the
    * keep ceiling on the duplicated fraction — shared with the oracle. */
  val SpanK = 5
  val SpanDupKeepFrac = 0.2

  /** Substring-level duplicate detection — the span analogue of suffix-array
    * training-data dedup (Lee et al., "Deduplicating Training Data Makes
    * Language Models Better", arXiv:2107.06499), at fixed [[SpanK]]-token
    * shingle granularity: a span is duplicated iff its text occurs at ≥2
    * positions anywhere in the corpus (within- OR cross-document — both are
    * memorization risks). Per doc: span count, duplicated-span count, the
    * duplicated fraction (exact fixed-point: ⌊10⁴·d/n⌋/10⁴, integer
    * arithmetic identical in both engines), and the keep verdict at
    * ≤ [[SpanDupKeepFrac]] — the gate that catches boilerplate-heavy
    * documents whole-text exact dedup misses entirely.
    *
    * Scale: ONE typed shingle pass (document text never shuffles, and the
    * corpus is tokenized exactly once — a join against a separately
    * aggregated global-count branch would re-scan and re-shingle it),
    * (doc, span) partial counts through the span-keyed shuffle, the global
    * span count as a whole-partition window over the same shuffled rows,
    * then the doc-keyed verdict agg — Θ(tokens) rows through two hash
    * shuffles, map-side combined; output Θ(docs). No pair list, no
    * quadratic term at any dup density — the verdict is per POSITION, not
    * per pair. */
  val substringDedup: Q = (s, d) => {
    val spark = s
    import spark.implicits._
    // r15: DISTINCT-TEXT contraction — per-text span counts m, global
    // occurrence count c = Σ mult·m (exact integers), per-text verdicts
    // joined back per doc on the md5 key
    val reps = textReps(Tables.documents(s, d).select(col("text")))
    val spans = reps
      .select(col("h"), col("text")).as[(String, String)]
      .flatMap { case (h, text) =>
        graft.functions.Tok.shingles(tokenize(text), SpanK).map((h, _))
      }
      .toDF("h", "sh")
      .groupBy(col("h"), col("sh"))
      .agg(count(lit(1)).as("m"))
    val perText = spans
      .join(reps.select(col("h"), col("mult")), Seq("h"))
      .withColumn("c", sum(col("m") * col("mult")).over(Window.partitionBy(col("sh"))))
      .groupBy(col("h"))
      .agg(sum(col("m")).as("n_spans"),
        sum(when(col("c") > 1, col("m")).otherwise(lit(0L))).as("n_dup_spans"))
    Tables.documents(s, d)
      .select(col("doc_id"), textKey(col("text")).as("h"))
      .join(perText, Seq("h"), "left")
      .drop("h")
      .select(col("doc_id"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("n_dup_spans"), lit(0L)).as("n_dup_spans"))
      .withColumn("dup_frac",
        when(col("n_spans") === 0, lit(0.0))
          .otherwise(expr("n_dup_spans * 10000 DIV n_spans") / 10000.0))
      .withColumn("keep", (col("dup_frac") <= SpanDupKeepFrac).cast("long"))
      .orderBy(col("doc_id"))
  }

  /** Exact-substring SCRUB — the transform half of Lee et al.'s exact
    * substring deduplication ([[substringDedup]] is the detection half
    * that gates whole documents; production pipelines REMOVE the repeated
    * span and keep the document): every token covered by a [[SpanK]]-token
    * shingle that occurs more than once corpus-wide is deleted, and the
    * document is rebuilt from the surviving tokens (single-space joined —
    * the canonical token-stream form downstream tokenization consumes).
    * Output per doc: token counts, removed-token count, and the md5 of the
    * scrubbed token stream (the hash certifies the rebuilt text itself).
    *
    * Scale: the shingle stream is the same Θ(tokens) explode as the
    * detection key; duplicate shingles resolve in one keyed aggregate;
    * each document gets back only its dup-span START OFFSETS
    * (Θ(dup spans/doc) longs — document text never shuffles), and the
    * rebuild is a stateless typed map re-tokenizing locally and masking
    * start..start+K−1. */

  /** The corpus-duplicated [[SpanK]]-token shingles (global count > 1) —
    * ONE definition under the batch scrub and the streaming twin's
    * broadcast model ([[graft.streaming.Streams.spanScrubStream]]). */
  private[graft] def dupShingles(s: SparkSession, d: String): DataFrame =
    spanRepRowsOn(Tables.documents(s, d), SpanK)
      .groupBy(col("sh")).agg(sum(col("mult")).as("c"))
      .where(col("c") > 1).select(col("sh"))

  /** [[spanRowsOn]] over the DISTINCT texts ([[textReps]], r15): one
    * (h, i, sh, mult) row per shingle position per distinct text — the
    * occurrence count of a shingle is exactly Σ mult over its rows, so
    * the dup decision is unchanged while the explode kernel (tokenize +
    * width-k shingle assembly, the family's dominant cost) tracks
    * distinct texts instead of corpus size. */
  private def spanRepRowsOn(docs: DataFrame, k: Int) = {
    val spark = docs.sparkSession
    import spark.implicits._
    textReps(docs.select(col("text")))
      .select(col("h"), col("text"), col("mult"))
      .as[(String, String, Long)]
      .flatMap { case (h, text, m) =>
        graft.functions.Tok.shingles(tokenize(text), k).zipWithIndex
          .map { case (sh, i) => (h, i.toLong, sh, m) }
      }
      .toDF("h", "i", "sh", "mult")
  }

  /** Mask `starts..starts+k−1` and rebuild the single-space token stream —
    * the one scrub kernel under the batch typed map and the streaming
    * twin. Returns (n_tokens, n_removed, scrubbed text). */
  private[graft] def rebuildScrubbed(
      ts: Array[String], starts: Iterator[Long], k: Int = SpanK): (Long, Long, String) = {
    val covered = new Array[Boolean](ts.length)
    starts.foreach { s0 =>
      var j = s0.toInt
      val end = math.min(ts.length, s0.toInt + k)
      while (j < end) { covered(j) = true; j += 1 }
    }
    val kept = new StringBuilder
    var n = 0L
    var i = 0
    while (i < ts.length) {
      if (!covered(i)) {
        if (n > 0) kept.append(' ')
        kept.append(ts(i)); n += 1
      }
      i += 1
    }
    (ts.length.toLong, ts.length.toLong - n, kept.toString)
  }

  /** The scrub pipeline over an arbitrary (doc_id, text) relation at
    * shingle width `k` — factored so the L-ladder keys and the planted-span
    * spec share one kernel. Same plan at any k: Θ(tokens) shingle stream,
    * one keyed dup aggregate, start-offset lists back to the doc, stateless
    * rebuild map. */
  private[graft] def spanScrubOn(docs: DataFrame, k: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // r15: DISTINCT-TEXT contraction — shingle explode, dup aggregate,
    // start-offset lists and the rebuild map all run per distinct text
    // ([[spanRepRowsOn]]; dup counts are multiplicity-weighted, so the
    // global >1 decision is exactly the per-occurrence one), and each doc
    // picks up its text's verdict row by md5 key. Identical output
    // (oracle-reproved at sf0.01/sf0.1 + fixed-binary compare at sf1);
    // the kernel now tracks distinct texts, not corpus size.
    val rows = spanRepRowsOn(docs, k)
    val dups = rows.groupBy(col("sh")).agg(sum(col("mult")).as("c"))
      .where(col("c") > 1).select(col("sh"))
    val starts = rows.join(dups, Seq("sh"), "left_semi")
      .groupBy(col("h"))
      .agg(sort_array(collect_list(col("i"))).as("starts"))
    val perText = textReps(docs.select(col("text")))
      .join(starts, Seq("h"), "left")
      .select(col("h"), col("text"),
        coalesce(col("starts"), array().cast("array<long>")).as("starts"))
      .as[(String, String, Seq[Long])]
      .map { case (h, text, st) =>
        val (nTok, nRem, scrub) = rebuildScrubbed(tokenize(text), st.iterator, k)
        (h, nTok, nRem, scrub)
      }
      .toDF("h", "n_tokens", "n_removed", "scrub")
      .select(col("h"), col("n_tokens"), col("n_removed"),
        md5(col("scrub")).as("scrub_md5"))
    docs
      .select(col("doc_id"), textKey(col("text")).as("h"))
      .join(perText, Seq("h"))
      .select(col("doc_id"), col("n_tokens"), col("n_removed"), col("scrub_md5"))
      .orderBy(col("doc_id"))
  }

  val spanScrub: Q = (s, d) => spanScrubOn(Tables.documents(s, d), SpanK)

  /** Long-span width of the dedup ladder — Lee et al. (ACL 2022) dedups
    * arbitrary ≥L-token duplicated spans; a duplicated span of length
    * S ≥ L is exactly the set of positions covered by its S−L+1 duplicated
    * L-shingles, so the [[spanScrubOn]] kernel at width L IS the ≥L-token
    * span semantics. L=20 catches long boilerplate (licence headers,
    * templated footers) that the [[SpanK]]=5 key fragment-matches — and,
    * conversely, leaves short incidental 5-token echoes alone (precision:
    * common phrases are not boilerplate). */
  val SpanL = 20

  /** The ≥[[SpanL]]-token member of the span-dedup ladder (r10 verdict #5). */
  val spanScrubL20: Q = (s, d) => spanScrubOn(Tables.documents(s, d), SpanL)

  /** Hash-split fractions (cumulative: train < 0.8 ≤ val < 0.9 ≤ test) —
    * shared with the oracle. */
  val SplitTrainFrac = 0.8
  val SplitValFrac = 0.9

  /** Deterministic train/val/test corpus split: every document draws the
    * engine-portable [[uniformDraw]] and lands in its split by threshold —
    * a pure map, reproducible on any engine with no coordination, and
    * STABLE UNDER GROWTH (a document's split never changes when new data
    * arrives — the property that keeps eval sets uncontaminated across
    * corpus refreshes; an exact per-stratum quota would need a per-source
    * global rank, a low-cardinality window funnel, and would reshuffle
    * assignments on every ingest). Fractions hold per source stratum in
    * expectation because the draw is independent of the stratum. Emitted
    * as the per-(source, split) audit table a pipeline run logs: counts,
    * id range, and the exact fixed-point corpus share.
    *
    * Scale: map + one tiny keyed agg (output Θ(sources × 3)) + one 1-row
    * broadcast for the share denominator. */
  val stratifiedSplit: Q = (s, d) => {
    val split = splitAssignOf(col("doc_id"))
    val total = Tables.documents(s, d).agg(count(lit(1)).as("n_total"))
    Tables.documents(s, d)
      .select(col("source"), split.as("split"), col("doc_id"))
      .groupBy(col("source"), col("split"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("doc_id")).as("min_doc_id"),
        max(col("doc_id")).as("max_doc_id"))
      .crossJoin(broadcast(total))
      .withColumn("share", expr("n_docs * 10000 DIV n_total") / 10000.0)
      .drop("n_total")
      .orderBy(col("source"), col("split"))
  }

  /** Per-document unigram Shannon entropy — the information-density quality
    * signal (low entropy = repeated boilerplate / keyword stuffing, the
    * docs the repetition rules catch structurally; entropy catches them
    * statistically). Computed in the algebraic one-pass form
    * H = ln(n) − (Σ c·ln c)/n over the per-doc term counts, so the plan is
    * the same two keyed aggregations as every other token statistic:
    * explode → partial-agg (doc, term) → agg (doc). Nothing but (doc_id,
    * term-count) pairs ever shuffles; output Θ(docs).
    *
    * Zero-token documents (whitespace-only text) have no defined entropy
    * and are excluded, matching the oracle's empty-group semantics. */
  val ngramEntropy: Q = (s, d) => {
    // r15: entropy is a pure text function — per DISTINCT text, joined
    // back per doc ([[textReps]])
    val perText = textReps(Tables.documents(s, d).select(col("text")))
      .select(col("h"), explode(toks(col("text"))).as("term"))
      .where(length(col("term")) > 0)
      .groupBy(col("h"), col("term"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("h"))
      .agg(sum(col("c")).as("n_tokens"),
        count(lit(1)).as("n_distinct"),
        sum(col("c").cast("double") * log(col("c").cast("double"))).as("clogc"))
      .select(col("h"), col("n_tokens"), col("n_distinct"),
        round(log(col("n_tokens").cast("double")) - col("clogc") / col("n_tokens"), 4)
          .as("entropy"))
    Tables.documents(s, d)
      .select(col("doc_id"), textKey(col("text")).as("h"))
      .join(perText, Seq("h"))
      .select(col("doc_id"), col("n_tokens"), col("n_distinct"), col("entropy"))
      .orderBy(col("doc_id"))
  }

  /** Membership screen of an incoming corpus against an at-rest REFERENCE
    * corpus (here: source `src0`) without joining the bulk of the stream
    * against it — the "have we trained on this before" ingest gate. A
    * Bloom filter over the reference's content hashes is built ONCE (an
    * eager index-build pass over the reference side only, like the
    * bucketed-table and ANN index builds) and broadcast to every task;
    * bloom-NEGATIVE rows are definitely novel and pass through with no
    * join at all, and only the bloom-positive sliver (true duplicates +
    * the filter's ~1% false positives) pays the exact semi-join that makes
    * the verdict exact. False negatives are impossible, so the output is
    * exactly the anti-join the oracle runs — the sketch changes the PLAN,
    * never the answer.
    *
    * Scale: at 100 TB the reference pass is one projection of (hash) and
    * the bloom is ~1.2 MB per 10⁶ entries at 1% fpp; for multi-billion-doc
    * references, shard the filter by hash prefix and broadcast the shard
    * map. The candidate side is a scan + in-place filter — the exact join
    * processes ~1% of it. The mightContain probe is a Scala UDF (Spark has
    * no bloom-probe Column function); it sits on the cheap prefilter, and
    * the row-at-a-time cost is two hash mixes — at cluster scale the same
    * screen falls out of Spark's own runtime bloom join filters when the
    * reference is small enough, which PlanSpec exercises. */
  val bloomDedup: Q = (s, d) => {
    val cand = Tables.documents(s, d)
      .where(col("source") =!= "src0")
      .select(col("doc_id"), col("source"), md5(col("text")).as("h"))
    bloomScreen(s, cand, referenceHashes(s, d)).orderBy(col("doc_id"))
  }

  /** The reference side of the bloom screen: content hashes of the at-rest
    * `src0` corpus. */
  def referenceHashes(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .where(col("source") === "src0")
      .select(md5(col("text")).as("rh"))

  /** The screen kernel shared by the batch key and the streaming twin
    * ([[graft.streaming.Streams.bloomScreenStream]]): bloom prefilter over
    * `cand`'s `h` column, exact confirm left-anti join against `ref`'s
    * `rh` for the positive sliver only. `cand` may be a streaming
    * DataFrame — both branches stay stateless (the confirm is a
    * stream-static join with the static side on the right). */
  private[graft] def bloomScreen(s: SparkSession, cand: DataFrame, ref: DataFrame,
      expectedItems: Option[Long] = None): DataFrame = {
    // size the filter from the ACTUAL reference cardinality (one cheap
    // count over the hash projection, or a caller-supplied estimate when
    // the reference is expensive to count twice): a fixed capacity
    // silently degrades the fpp — and with it the "only ~1% pays the
    // exact join" contract — once the reference outgrows it. Floor of
    // 1024 keeps the filter sensible on tiny references.
    val n = math.max(1024L, expectedItems.getOrElse(ref.count()))
    val bloom = ref.stat.bloomFilter("rh", n, 0.01)
    val bcast = s.sparkContext.broadcast(bloom)
    val might = udf((h: String) => bcast.value.mightContain(h))
    cand.where(!might(col("h")))
      .unionByName(cand.where(might(col("h")))
        .join(ref, col("h") === col("rh"), "left_anti"))
      .select(col("doc_id"), col("source"))
  }

  /** Number of hash buckets for [[dsirWeights]] — a power of two so the
    * Spark-side bucket (`fnv_hash64 & (B-1)`, low bits of the SIGNED long)
    * equals the oracle's unsigned `h % B` exactly. */
  val DsirBuckets = 1024

  /** DSIR-style importance weights for target-domain data selection (Xie
    * et al., "Data Selection for Language Models via Importance
    * Resampling", NeurIPS 2023): score every document by how much more
    * likely its hashed-unigram bag is under the TARGET domain's bucket
    * distribution (source `src1` stands in for the target here) than under
    * the raw-corpus distribution —
    * w(doc) = Σ_tok [ ln p̂_t(h(tok)) − ln p̂_r(h(tok)) ] with add-1
    * smoothing over [[DsirBuckets]] buckets of the engine's
    * [[graft.functions.FnvHash64Expr]] content hash (the paper's hashed
    * n-gram generative model; unigram features here — bigrams ride the
    * same path with a concat before the hash). High weight = "looks like
    * the target domain", the resampling key for domain-matched pretraining
    * mixes.
    *
    * Scale: the bucket statistics table is Θ(B) = 1024 rows no matter the
    * corpus size — it is aggregated once (map-side partial), its totals
    * are window lookups INSIDE the tiny table, and it broadcasts to the
    * per-doc scoring join, so the corpus-sized side never shuffles more
    * than (doc_id, bucket, count) triples. Exactly the shape DSIR needs at
    * 100 TB: the model fits in a closure, the data streams past it. */
  /** (doc_id, source, bucket) token stream under the DSIR model — one
    * shared definition for the model-training and scoring aggregations. */
  /** r15 (DISTINCT-TEXT contraction): per-distinct-text bucket counts
    * (h, b, cnt) — the tokenize+hash pass runs once per distinct text;
    * corpus/target totals recover exactly via [[dsirMults]]. */
  private def dsirRepTokens(s: SparkSession, d: String): DataFrame =
    textReps(Tables.documents(s, d).select(col("text")))
      .select(col("h"), explode(toks(col("text"))).as("term"))
      .where(length(col("term")) > 0)
      .select(col("h"),
        graft.functions.FnvHash64Expr.fnv_hash64(col("term"))
          .bitwiseAND(lit((DsirBuckets - 1).toLong)).as("b"))
      .groupBy(col("h"), col("b")).agg(count(lit(1)).as("cnt"))

  /** Per-distinct-text multiplicities: total docs and target (src1) docs
    * sharing the text — the exact integer weights that recover the
    * per-occurrence model counts. */
  private def dsirMults(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(textKey(col("text")).as("h"), col("source"))
      .groupBy(col("h"))
      .agg(count(lit(1)).as("mult"),
        sum(when(col("source") === "src1", 1L).otherwise(0L)).as("mult_t"))

  /** The trained DSIR bucket model: Θ([[DsirBuckets]]) rows of
    * (bucket, smoothed log importance ratio). Shared by the batch key
    * (broadcast to the scoring join) and the streaming scorer
    * ([[graft.streaming.Streams.dsirScoreStream]], which collects and
    * broadcasts it — 1024 rows, bounded by construction). Totals are
    * window lookups over the tiny bucket table (the sourceOverlap
    * pattern) — no second aggregation pass, no persist. */
  def dsirModel(s: SparkSession, d: String): DataFrame = {
    val B = DsirBuckets
    val all = Window.partitionBy(lit(1))
    dsirRepTokens(s, d).join(dsirMults(s, d), Seq("h"))
      .groupBy(col("b"))
      .agg(sum(col("cnt") * col("mult")).as("c_r"),
        sum(col("cnt") * col("mult_t")).as("c_t"))
      .select(col("b"),
        (log((col("c_t") + lit(1.0)) / (sum(col("c_t")).over(all) + lit(B.toDouble))) -
          log((col("c_r") + lit(1.0)) / (sum(col("c_r")).over(all) + lit(B.toDouble))))
          .as("logr"))
  }

  /** Smoothed log importance ratio for a bucket the offline model never
    * observed: with c_t = c_r = 0 the add-1 smoothing gives
    * ln(1/(t_tot+B)) − ln(1/(r_tot+B)) = ln((r_tot+B)/(t_tot+B)). The
    * streaming scorer ([[graft.streaming.Streams.dsirScoreStream]]) needs
    * it because arriving documents can hash tokens into buckets absent
    * from the training corpus — a direct Map apply there would kill the
    * stream on the first genuinely-novel token. One tiny agg over the
    * token stream (two longs to the driver). */
  def dsirDefaultLogr(s: SparkSession, d: String): Double = {
    val B = DsirBuckets.toDouble
    // r15: totals over the contracted counts — Σ cnt·mult ≡ the
    // per-occurrence count(*) (exact integers)
    val r = dsirRepTokens(s, d).join(dsirMults(s, d), Seq("h")).agg(
      coalesce(sum(col("cnt") * col("mult")), lit(0L)).as("r_tot"),
      coalesce(sum(col("cnt") * col("mult_t")), lit(0L)).as("t_tot")).head()
    math.log(1.0 / (r.getLong(1).toDouble + B)) -
      math.log(1.0 / (r.getLong(0).toDouble + B))
  }

  val dsirWeights: Q = (s, d) => {
    // r15: per-text weights over the contracted bucket counts, joined back
    // per doc on the md5 key
    val perText = dsirRepTokens(s, d)
      .join(broadcast(dsirModel(s, d)), Seq("b"))
      .groupBy(col("h"))
      .agg(sum(col("cnt")).as("n_tokens"),
        round(sum(col("cnt").cast("double") * col("logr")), 4).as("dsir_weight"))
    Tables.documents(s, d)
      .select(col("doc_id"), textKey(col("text")).as("h"))
      .join(perText, Seq("h"))
      .select(col("doc_id"), col("n_tokens"), col("dsir_weight"))
      .orderBy(col("doc_id"))
  }

  /** CCNet-style perplexity bucketing (Wenzek et al., "CCNet: Extracting
    * High Quality Monolingual Datasets from Web Crawl Data", LREC 2020):
    * rank every document by its bigram-LM mean log-probability WITHIN its
    * language and split each language into head/middle/tail terciles — the
    * standard recipe for stratifying web text by fluency before sampling.
    * Reuses the verified [[lmScore]] chain; the rank runs on the ROUNDED
    * score (ties broken by doc_id) so the ordering is engine-portable.
    *
    * Scale note: the exact-tercile form needs a per-language rank (one
    * shuffle keyed by language — low cardinality, the known window-funnel
    * shape). The 100 TB production recipe replaces it with FIXED perplexity
    * cutpoints estimated once from a sample (CCNet itself does this), which
    * turns the bucket into a stateless map; the exact form here is the
    * verification shape that oracle-checks the semantics. Documents with
    * fewer than 2 tokens have no bigram score and are excluded, matching
    * [[lmScore]]. */
  val perplexityBuckets: Q = (s, d) => {
    val lm = lmScore(s, d).select(col("doc_id"), col("mean_lnp_r"))
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("mean_lnp_r").desc, col("doc_id"))
    Tables.documents(s, d).select(col("doc_id"), col("lang"))
      .join(lm, Seq("doc_id"))
      .withColumn("tile", ntile(3).over(w))
      .select(col("doc_id"), col("lang"), col("mean_lnp_r"),
        when(col("tile") === 1, "head")
          .when(col("tile") === 2, "middle")
          .otherwise("tail").as("bucket"))
      .orderBy(col("doc_id"))
  }

  /** The SAMPLED-CUTPOINT twin of [[perplexityBuckets]] — CCNet's actual
    * production shape (r10 verdict #6): perplexity cutpoints are estimated
    * ONCE from a deterministic hash-sample (`doc_id % 10 < 3`) per
    * language — cut1/cut2 = the sample's tercile-boundary scores (ranks
    * ⌈n/3⌉ and ⌈2n/3⌉ on (rounded score desc, doc_id)) — and every document
    * then buckets by a STATELESS threshold map (score ≥ cut1 → head,
    * ≥ cut2 → middle, else tail; a language absent from the sample defaults
    * to head).
    *
    * Scale: this is why CCNet ships it — the exact form ranks EVERY
    * document through a per-language window (a low-cardinality shuffle
    * funnel at 100 TB), while here the window runs over the sample only
    * (fixed-size in production) and assignment is a broadcast map-side
    * join: no corpus-wide rank at any scale. The cutpoints are rounded
    * scores, so the whole chain replays on any engine. */
  val perplexityBucketsSampled: Q = (s, d) => {
    val lm = lmScore(s, d).select(col("doc_id"), col("mean_lnp_r"))
    val scored = Tables.documents(s, d).select(col("doc_id"), col("lang"))
      .join(lm, Seq("doc_id"))
    val sample = scored.where(col("doc_id") % 10 < 3)
    val ranked = sample
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("lang"))
          .orderBy(col("mean_lnp_r").desc, col("doc_id"))))
      .withColumn("n_s", count(lit(1)).over(Window.partitionBy(col("lang"))))
    val cuts = ranked
      .where(col("rn") === expr("(n_s + 2) DIV 3") ||
        col("rn") === expr("(2 * n_s + 2) DIV 3"))
      .groupBy(col("lang"))
      .agg(
        max(when(col("rn") === expr("(n_s + 2) DIV 3"), col("mean_lnp_r"))).as("cut1"),
        max(when(col("rn") === expr("(2 * n_s + 2) DIV 3"), col("mean_lnp_r"))).as("cut2"))
    scored.join(broadcast(cuts), Seq("lang"), "left")
      .select(col("doc_id"), col("lang"), col("mean_lnp_r"),
        when(col("cut1").isNull || col("mean_lnp_r") >= col("cut1"), "head")
          .when(col("mean_lnp_r") >= col("cut2"), "middle")
          .otherwise("tail").as("bucket"))
      .orderBy(col("doc_id"))
  }

  /** Temperature exponent for [[temperatureMix]] — the standard τ ≈ 0.7
    * multilingual/multi-source flattening (T5, XLM-R recipes). */
  val TemperatureTau = 0.7

  /** Temperature-scaled source mixing: sample source i proportionally to
    * n_i^τ instead of n_i, flattening the head of a skewed corpus without
    * [[sourceMix]]'s hard equal-share floor — τ = 1 reproduces the input
    * mix, τ = 0 the uniform one. Per-source targets are computed with
    * INTEGER arithmetic on fixed-point weights (floor(n^τ · 10⁶), then
    * k_i = N · w_i DIV Σw) so the quota is bit-deterministic across
    * engines even when the raw ratio lands exactly on an integer (uniform
    * sources hit this every time); the only FP in the chain is pow(), whose
    * last-ulp risk sits on a 10⁻⁶ grid — the accepted-risk class the A-Res
    * oracle documents. Selection within a source is the deterministic
    * md5-order draw on the heap top-k operator (k bounded by the largest
    * target — an eager Θ(sources) driver read, the sourceMix precedent).
    * Long arithmetic bounds: N · w_i overflows past ~10⁹ docs/source — at
    * that scale promote the quota arithmetic to DECIMAL.
    *
    * Quota semantics for undersized sources are EXPLICIT: k_target is
    * capped at n_i (a source cannot contribute more documents than it
    * has), so when τ-flattening asks a small source for more than its
    * size, the realized mix deviates from the ideal n^τ proportions by
    * exactly that cap — the standard "sampling without replacement"
    * truncation every temperature recipe inherits. An empty documents
    * table yields an empty mix (no NPE on the eager quota read). */
  val temperatureMix: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    val all = Window.partitionBy(lit(1))
    val tgt = docs.groupBy(col("source")).agg(count(lit(1)).as("n"))
      .withColumn("wf", floor(pow(col("n").cast("double"), TemperatureTau) * 1e6).cast("long"))
      .select(col("source"), col("n"),
        least(col("n"), greatest(lit(1L),
          expr("sum(n) OVER (PARTITION BY 1) * wf DIV sum(wf) OVER (PARTITION BY 1)")))
          .as("k_target"))
    val kMax = tgt.agg(coalesce(max(col("k_target")), lit(0L)))
      .head().getLong(0).toInt
    val scored = docs.select(col("source"), col("doc_id"),
      md5(col("doc_id").cast("string")).as("h"))
    graft.plans.TopKPerGroup
      .topK(scored, Seq("source"), Seq("h" -> true, "doc_id" -> true), kMax)
      .join(broadcast(tgt), Seq("source"))
      .where(col("rn") <= col("k_target"))
      .select(col("source"), col("n").as("n_source"), col("k_target"),
        col("rn"), col("doc_id"))
      .orderBy(col("source"), col("rn"))
  }

  val queries: Map[String, Q] = Map(
    "q_exact_dedup"     -> exactDedup,
    "q_text_stats"      -> textStats,
    "q_term_freq"       -> termFreq,
    "q_tfidf"           -> tfidf,
    "q_sample_per_group" -> samplePerGroup,
    "q_ngram_shingles"  -> ngramShingles,
    "q_token_count"     -> tokenCount,
    "q_quality_score"   -> qualityScore,
    "q_lang_id"         -> langId,
    "q_jaccard_ngram"   -> jaccardNgram,
    "q_dedup_incremental" -> dedupIncremental,
    "q_repetition_stats" -> repetitionStats,
    "q_gopher_rules"    -> gopherRules,
    "q_source_overlap"  -> sourceOverlap,
    "q_contamination"   -> contamination,
    "q_bm25"            -> bm25,
    "q_heavy_hitters"   -> heavyHitters,
    "q_weighted_sample" -> weightedSample,
    "q_lm_score"        -> lmScore,
    "q_doc_fingerprint" -> docFingerprint,
    "q_token_pack"      -> tokenPack,
    "q_source_mix"      -> sourceMix,
    "q_pii_scrub"       -> piiScrub,
    "q_url_canonicalize" -> urlCanonicalize,
    "q_etld_gate" -> etldGate,
    "q_substring_dedup" -> substringDedup,
    "q_span_scrub"      -> spanScrub,
    "q_span_scrub_l20"  -> spanScrubL20,
    "q_stratified_split" -> stratifiedSplit,
    "q_ngram_entropy"   -> ngramEntropy,
    "q_bloom_dedup"     -> bloomDedup,
    "q_dsir_weights"    -> dsirWeights,
    "q_perplexity_buckets" -> perplexityBuckets,
    "q_perplexity_buckets_sampled" -> perplexityBucketsSampled,
    "q_temperature_mix" -> temperatureMix,
    "q_chunk_tokens"    -> chunkTokens,
    "q_unicode_normalize" -> unicodeNormalize,
    "q_quality_classifier" -> qualityClassifier,
  )

  /** Shared oracle CTE mirroring [[docTokenStats]] exactly (term counts +
    * bigram duplicate fraction) so the two rule queries cannot diverge from
    * their statistics source. */
  private[operators] val docTokenStatsCte: String =
    """w AS (
      |  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS ws FROM documents),
      |t AS (SELECT doc_id, unnest(ws) AS term FROM w),
      |tc AS (SELECT doc_id, term, count(*) AS c FROM t GROUP BY doc_id, term),
      |ta AS (
      |  SELECT doc_id, sum(c) AS n_tokens, count(*) AS n_distinct, max(c) AS top_cnt,
      |    CAST(sum(len(term) * c) AS DOUBLE) / sum(c) AS mwl
      |  FROM tc GROUP BY doc_id),
      |bg AS (
      |  SELECT doc_id, ws[i] || ' ' || ws[i+1] AS b
      |  FROM (SELECT doc_id, ws, unnest(generate_series(1, len(ws) - 1)) AS i FROM w) x),
      |ba AS (SELECT doc_id, count(*) AS nb, count(DISTINCT b) AS nd FROM bg GROUP BY doc_id),
      |st AS (
      |  SELECT ta.*, coalesce(1.0 - CAST(ba.nd AS DOUBLE) / ba.nb, 0.0) AS dup_bigram_frac
      |  FROM ta LEFT JOIN ba USING (doc_id))""".stripMargin

  /** Contamination-screen CTE fragment (cw → cds → cbench/cr/ch): distinct
    * per-doc shingles, src0 as the held-out benchmark, per-doc totals and
    * benchmark hits. ONE definition under the q_contamination oracle and the
    * corpus-curate clean gate. */
  private[operators] val contaminationCte: String =
    """cw AS (
      |  SELECT doc_id, source, string_split_regex(lower(trim(text)), '\s+') AS ws
      |  FROM documents),
      |cds AS (
      |  SELECT DISTINCT doc_id, source, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS sh
      |  FROM (SELECT doc_id, source, ws, unnest(generate_series(1, len(ws) - 2)) AS i
      |        FROM cw) cx),
      |cbench AS (SELECT DISTINCT sh FROM cds WHERE source = 'src0'),
      |cr AS (SELECT doc_id, count(*) AS n_sh FROM cds WHERE source <> 'src0' GROUP BY doc_id),
      |ch AS (
      |  SELECT doc_id, count(*) AS hits FROM cds
      |  WHERE source <> 'src0' AND sh IN (SELECT sh FROM cbench) GROUP BY doc_id)""".stripMargin

  /** Width-parameterized q_span_scrub oracle — one template serves the
    * 5/20 span-dedup ladder ([[SpanK]]/[[SpanL]]). */
  private def spanScrubOracle(k: Int): String = {
    val concat = (0 until k).map(j => s"ws[i+$j]").mkString(" || ' ' || ")
    s"""WITH w AS (
       |  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS ws FROM documents),
       |s AS (
       |  SELECT doc_id, i, $concat AS sh
       |  FROM (SELECT doc_id, ws, unnest(generate_series(1, len(ws) - ${k - 1})) AS i FROM w) x),
       |g AS (SELECT sh, count(*) AS c FROM s GROUP BY sh),
       |cov AS (
       |  SELECT DISTINCT doc_id, unnest(generate_series(i, i + ${k - 1})) AS pos
       |  FROM s JOIN g USING (sh) WHERE g.c > 1),
       |tok AS (
       |  SELECT doc_id, unnest(ws) AS t, generate_subscripts(ws, 1) AS pos FROM w),
       |keep AS (
       |  SELECT tok.doc_id, tok.t, tok.pos
       |  FROM tok LEFT JOIN cov ON tok.doc_id = cov.doc_id AND tok.pos = cov.pos
       |  WHERE cov.pos IS NULL),
       |agg AS (
       |  SELECT doc_id, string_agg(t, ' ' ORDER BY pos) AS scrub,
       |    count(*) AS n_kept
       |  FROM keep GROUP BY doc_id),
       |tot AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_tokens FROM w)
       |SELECT tot.doc_id, tot.n_tokens,
       |  tot.n_tokens - CAST(coalesce(agg.n_kept, 0) AS BIGINT) AS n_removed,
       |  md5(coalesce(agg.scrub, '')) AS scrub_md5
       |FROM tot LEFT JOIN agg USING (doc_id) ORDER BY tot.doc_id""".stripMargin
  }

  /** Bigram-LM scoring CTE fragment (c12/c1/vv/lsc) over [[docTokenStatsCte]]'s
    * `bg` (bigram rows) and `t` (token rows). ONE definition under the
    * q_lm_score oracle and the corpus-curate scoring stage. */
  private[operators] val lmScoreCte: String =
    """c12 AS (SELECT b, count(*) AS c12, split_part(b, ' ', 1) AS w1 FROM bg GROUP BY b),
      |c1 AS (SELECT w1, sum(c12) AS c1 FROM c12 GROUP BY w1),
      |vv AS (SELECT count(DISTINCT term) AS v FROM t),
      |lsc AS (
      |  SELECT bg.doc_id, ln((c12.c12 + 1.0) / (c1.c1 + vv.v)) AS lp
      |  FROM bg JOIN c12 USING (b) JOIN c1 USING (w1) CROSS JOIN vv)""".stripMargin

  val oracles: Map[String, String] = Map(
    // the enrichment CASEs are replayed verbatim; the regex constants are
    // interpolated from the SAME [[EmailRe]]/[[PhoneRe]] the Spark kernel
    // compiles, so kernel and oracle can never match different patterns.
    // DuckDB regexp_replace needs the explicit 'g' flag (Spark's is global).
    "q_pii_scrub" ->
      s"""WITH pe AS (
        |  SELECT doc_id,
        |    text
        |    || CASE WHEN doc_id % 3 = 0
        |            THEN ' contact ' || source || CAST(doc_id AS VARCHAR) || '@mail.example.com'
        |            ELSE '' END
        |    || CASE WHEN doc_id % 5 = 0
        |            THEN ' call +1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
        |            ELSE '' END AS t
        |  FROM documents),
        |sc AS (
        |  SELECT doc_id, t,
        |    regexp_replace(regexp_replace(t, '$EmailRe', '[EMAIL]', 'g'),
        |                   '$PhoneRe', '[PHONE]', 'g') AS scrub
        |  FROM pe)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(t, '$EmailRe')) AS BIGINT) AS n_emails,
        |  CAST(len(regexp_extract_all(t, '$PhoneRe')) AS BIGINT) AS n_phones,
        |  CAST(len(scrub) AS BIGINT) AS n_chars_scrub,
        |  md5(scrub) AS scrub_md5
        |FROM sc ORDER BY doc_id""".stripMargin,
    "q_url_canonicalize" ->
      """WITH u AS (
        |  SELECT doc_id,
        |    (CASE WHEN doc_id % 2 = 0 THEN 'https' ELSE 'http' END) || '://'
        |    || (CASE WHEN doc_id % 4 = 0 THEN 'WWW.' ELSE '' END)
        |    || source || '.Example.COM/' || lang || '/p/' || CAST(doc_id % 40 AS VARCHAR)
        |    || (CASE WHEN doc_id % 3 = 0 THEN '/' ELSE '' END)
        |    || (CASE WHEN doc_id % 5 = 0
        |             THEN '?utm_source=feed&uid=' || CAST(doc_id AS VARCHAR) ELSE '' END)
        |    || (CASE WHEN doc_id % 7 = 0 THEN '#frag' ELSE '' END) AS url
        |  FROM documents),
        |c AS (
        |  SELECT doc_id,
        |    'https://'
        |    || regexp_replace(lower(regexp_extract(url, '^[a-z]+://([^/?#]+)', 1)),
        |                      '^www\.', '')
        |    || regexp_replace(regexp_extract(url, '^[a-z]+://[^/?#]+([^?#]*)', 1),
        |                      '/$', '') AS canonical_url
        |  FROM u)
        |SELECT canonical_url, CAST(count(*) AS BIGINT) AS n_docs, min(doc_id) AS keep_doc_id
        |FROM c GROUP BY canonical_url ORDER BY canonical_url""".stripMargin,
    // eTLD+1 gate: longest-suffix match unrolled to the sample's max
    // depth (2 labels), then the pinned registrable-domain blocklist
    "q_etld_gate" ->
      """WITH h AS (
        |  SELECT doc_id,
        |    (CASE WHEN doc_id % 3 = 1 THEN 'www.'
        |          WHEN doc_id % 3 = 2 THEN 'a.cdn.' ELSE '' END)
        |    || source || '.' ||
        |    (CASE CAST(floor(doc_id / 8) AS BIGINT) % 8 WHEN 0 THEN 'com' WHEN 1 THEN 'org'
        |      WHEN 2 THEN 'net' WHEN 3 THEN 'io' WHEN 4 THEN 'co.uk'
        |      WHEN 5 THEN 'ac.uk' WHEN 6 THEN 'com.au' ELSE 'uk' END) AS host
        |  FROM documents),
        |m AS (
        |  SELECT doc_id, host,
        |    regexp_extract(host, '([^.]+)$', 1) AS l1,
        |    regexp_extract(host, '([^.]+\.[^.]+)$', 1) AS l2,
        |    regexp_extract(host, '([^.]+\.[^.]+\.[^.]+)$', 1) AS l3
        |  FROM h),
        |r AS (
        |  SELECT doc_id, host,
        |    CASE WHEN l2 IN ('co.uk', 'ac.uk', 'com.au') THEN l3
        |         WHEN l1 IN ('com', 'org', 'net', 'io', 'uk', 'au') THEN l2
        |         ELSE l2 END AS etld1
        |  FROM m)
        |SELECT doc_id, host, etld1,
        |  CAST(CASE WHEN etld1 IN ('src3.com', 'src7.co.uk', 'src11.io',
        |    'src15.com.au', 'src4.uk') THEN 1 ELSE 0 END AS INT) AS is_blocked
        |FROM r ORDER BY doc_id""".stripMargin,
    // span = k-token shingle; duplicated ⇔ ≥2 occurrences corpus-wide;
    // exact-substring scrub: same shingle stream as q_substring_dedup's
    // oracle; coverage = generate_series over each dup-span start; rebuild
    // = position-ordered string_agg over the surviving tokens (including
    // empty tokens, matching the kernel's single-space join exactly).
    // One width-parameterized template serves the 5/20 ladder.
    "q_span_scrub" -> spanScrubOracle(SpanK),
    "q_span_scrub_l20" -> spanScrubOracle(SpanL),
    "q_substring_dedup" ->
      """WITH w AS (
        |  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS ws FROM documents),
        |s AS (
        |  SELECT doc_id,
        |    ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] || ' ' || ws[i+4] AS sh
        |  FROM (SELECT doc_id, ws, unnest(generate_series(1, len(ws) - 4)) AS i FROM w) x),
        |g AS (SELECT sh, count(*) AS c FROM s GROUP BY sh),
        |p AS (
        |  SELECT s.doc_id, count(*) AS n_spans,
        |    sum(CASE WHEN g.c > 1 THEN 1 ELSE 0 END) AS n_dup
        |  FROM s JOIN g USING (sh) GROUP BY s.doc_id),
        |f AS (
        |  SELECT w.doc_id,
        |    CAST(coalesce(p.n_spans, 0) AS BIGINT) AS n_spans,
        |    CAST(coalesce(p.n_dup, 0) AS BIGINT) AS n_dup_spans
        |  FROM w LEFT JOIN p USING (doc_id))
        |SELECT doc_id, n_spans, n_dup_spans,
        |  CASE WHEN n_spans = 0 THEN 0.0
        |       ELSE (n_dup_spans * 10000 // n_spans) / 10000.0 END AS dup_frac,
        |  CAST(CASE WHEN (CASE WHEN n_spans = 0 THEN 0.0
        |                  ELSE (n_dup_spans * 10000 // n_spans) / 10000.0 END) <= 0.2
        |       THEN 1 ELSE 0 END AS BIGINT) AS keep
        |FROM f ORDER BY doc_id""".stripMargin,
    // the uniform draw is the SAME two-round Knuth hash as q_weighted_sample
    "q_stratified_split" ->
      """WITH u AS (
        |  SELECT doc_id, source,
        |    ((((doc_id % 4294967296) * 40503) % 4294967296) * 40503 % 4294967296 + 1)
        |      / 4294967297.0 AS u
        |  FROM documents),
        |a AS (
        |  SELECT source,
        |    CASE WHEN u < 0.8 THEN 'train' WHEN u < 0.9 THEN 'val' ELSE 'test' END AS split,
        |    doc_id
        |  FROM u),
        |t AS (SELECT count(*) AS n_total FROM documents)
        |SELECT source, split, CAST(count(*) AS BIGINT) AS n_docs,
        |  min(doc_id) AS min_doc_id, max(doc_id) AS max_doc_id,
        |  CAST(floor(CAST(count(*) * 10000 AS DOUBLE) / min(t.n_total)) AS BIGINT)
        |    / CAST(10000 AS DOUBLE) AS share
        |FROM a CROSS JOIN t GROUP BY source, split
        |ORDER BY source, split""".stripMargin,
    "q_exact_dedup" ->
      """SELECT md5(text) AS text_hash, count(*) AS n_dups, min(doc_id) AS keep_doc_id
        |FROM documents GROUP BY md5(text) ORDER BY text_hash""".stripMargin,
    "q_text_stats" ->
      """WITH t AS (
        |  SELECT lang, n_chars,
        |    CAST(len(string_split_regex(lower(trim(text)), '\s+')) AS BIGINT) AS n_words
        |  FROM documents)
        |SELECT lang, count(*) AS n_docs, CAST(sum(n_words) AS BIGINT) AS total_words,
        | round(avg(n_chars), 4) AS avg_chars, round(avg(n_words), 4) AS avg_words
        |FROM t GROUP BY lang ORDER BY lang""".stripMargin,
    "q_term_freq" ->
      """WITH w AS (
        |  SELECT lang, unnest(string_split_regex(lower(trim(text)), '\s+')) AS term
        |  FROM documents),
        |c AS (
        |  SELECT lang, term, count(*) AS n FROM w WHERE len(term) > 0 GROUP BY lang, term),
        |r AS (
        |  SELECT lang, term, n,
        |    CAST(row_number() OVER (PARTITION BY lang ORDER BY n DESC, term) AS BIGINT) AS rn
        |  FROM c)
        |SELECT lang, rn, term, n FROM r WHERE rn <= 5 ORDER BY lang, rn""".stripMargin,
    "q_tfidf" ->
      """WITH w AS (
        |  SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\s+')) AS term
        |  FROM documents),
        |tf AS (
        |  SELECT doc_id, term, count(*) AS tf FROM w WHERE len(term) > 0
        |  GROUP BY doc_id, term),
        |df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        |n AS (SELECT count(*) AS n_docs FROM documents),
        |s AS (
        |  SELECT tf.doc_id, tf.term, tf.tf,
        |    round(tf.tf * ln((n.n_docs + 1.0) / (df.df + 1.0)), 4) AS tfidf_r
        |  FROM tf JOIN df USING (term) CROSS JOIN n),
        |r AS (
        |  SELECT doc_id, term, tf, tfidf_r,
        |    CAST(row_number() OVER (PARTITION BY doc_id ORDER BY tfidf_r DESC, term) AS BIGINT) AS rn
        |  FROM s)
        |SELECT doc_id, rn, term, CAST(tf AS BIGINT) AS tf, tfidf_r
        |FROM r WHERE rn <= 3 ORDER BY doc_id, rn""".stripMargin,
    "q_sample_per_group" ->
      """WITH s AS (
        |  SELECT lang, doc_id, md5(CAST(doc_id AS VARCHAR)) AS h FROM documents),
        |r AS (
        |  SELECT lang, doc_id, h,
        |    CAST(row_number() OVER (PARTITION BY lang ORDER BY h, doc_id) AS BIGINT) AS rn
        |  FROM s)
        |SELECT lang, rn, doc_id, h FROM r WHERE rn <= 3
        |ORDER BY lang, rn""".stripMargin,
    "q_ngram_shingles" ->
      """WITH w AS (
        |  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS ws FROM documents),
        |s AS (
        |  SELECT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS sh
        |  FROM (SELECT doc_id, ws, unnest(generate_series(1, len(ws) - 2)) AS i FROM w) t),
        |c AS (SELECT doc_id, count(DISTINCT sh) AS n FROM s GROUP BY doc_id)
        |SELECT w.doc_id, CAST(len(w.ws) AS BIGINT) AS n_tokens,
        | CAST(coalesce(c.n, 0) AS BIGINT) AS n_shingles
        |FROM w LEFT JOIN c ON w.doc_id = c.doc_id
        |ORDER BY w.doc_id""".stripMargin,
    "q_token_count" ->
      """SELECT doc_id,
        | CAST(len(regexp_extract_all(text, '[a-z0-9]+')) AS BIGINT) AS n_word_toks,
        | CAST(len(regexp_extract_all(text, '[^a-z0-9\s]')) AS BIGINT) AS n_punct_toks,
        | CAST(length(text) AS BIGINT) AS n_chars_calc
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_quality_score" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    CAST(length(text) AS DOUBLE) AS n_chars,
        |    CAST(len(regexp_extract_all(text, '[^a-z0-9\s]')) AS DOUBLE) AS n_punct,
        |    CAST(len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |      x -> x IN ('the', 'a', 'of', 'and', 'to'))) AS DOUBLE) AS n_stop,
        |    CAST(len(string_split_regex(lower(trim(text)), '\s+')) AS DOUBLE) AS n_toks
        |  FROM documents)
        |SELECT doc_id,
        | round(n_punct / n_chars, 4) AS punct_ratio,
        | round(n_stop / n_toks, 4) AS stopword_ratio,
        | round(n_chars / n_toks, 4) AS avg_token_len,
        | round(least(n_toks / 100.0, 1.0) * (1.0 - n_punct / n_chars), 4) AS quality
        |FROM t ORDER BY doc_id""".stripMargin,
    "q_lang_id" ->
      """WITH t AS (
        |  SELECT lang, string_split_regex(lower(trim(text)), '\s+') AS ws FROM documents),
        |c AS (
        |  SELECT lang,
        |    CAST(len(list_filter(ws, x -> x IN ('the', 'a', 'of'))) AS BIGINT) AS c_en,
        |    CAST(len(list_filter(ws, x -> x IN ('der', 'die', 'und'))) AS BIGINT) AS c_de,
        |    CAST(len(list_filter(ws, x -> x IN ('el', 'la', 'que'))) AS BIGINT) AS c_es,
        |    CAST(len(list_filter(ws, x -> x IN ('le', 'les', 'et'))) AS BIGINT) AS c_fr,
        |    CAST(len(list_filter(ws, x -> x IN ('的', '是', '了'))) AS BIGINT) AS c_zh
        |  FROM t),
        |g AS (
        |  SELECT lang,
        |    CASE WHEN greatest(c_en, c_de, c_es, c_fr, c_zh) = 0 THEN 'und'
        |         WHEN c_en = greatest(c_en, c_de, c_es, c_fr, c_zh) THEN 'en'
        |         WHEN c_de = greatest(c_en, c_de, c_es, c_fr, c_zh) THEN 'de'
        |         WHEN c_es = greatest(c_en, c_de, c_es, c_fr, c_zh) THEN 'es'
        |         WHEN c_fr = greatest(c_en, c_de, c_es, c_fr, c_zh) THEN 'fr'
        |         ELSE 'zh' END AS guess
        |  FROM c)
        |SELECT lang, guess, count(*) AS n_docs FROM g
        |GROUP BY lang, guess ORDER BY lang, guess""".stripMargin,
    // brute-force definition: the Spark side's prefix filter is a pure
    // optimization and must be invisible in the result
    "q_dedup_incremental" ->
      s"""WITH w AS (
        |  SELECT doc_id, list_distinct(string_split_regex(lower(trim(text)), '\\s+')) AS ws
        |  FROM documents),
        |b AS (SELECT max(doc_id) - 49 AS split FROM documents),
        |neu AS (SELECT doc_id, ws FROM w, b WHERE doc_id >= b.split),
        |old AS (SELECT doc_id, ws FROM w, b WHERE doc_id < b.split),
        |p AS (
        |  SELECT n.doc_id,
        |    CAST(len(list_intersect(n.ws, o.ws)) AS DOUBLE) /
        |      (len(n.ws) + len(o.ws) - len(list_intersect(n.ws, o.ws))) AS jac
        |  FROM neu n JOIN old o ON true),
        |d AS (
        |  SELECT doc_id, count(*) AS n_dups, max(jac) AS best
        |  FROM p WHERE jac >= ${SimJoinThreshold} GROUP BY doc_id)
        |SELECT n.doc_id,
        |  CAST(coalesce(d.n_dups, 0) AS BIGINT) AS n_dups,
        |  CAST(CASE WHEN d.doc_id IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS is_dup,
        |  round(coalesce(d.best, 0), 4) AS best_dup_jac
        |FROM neu n LEFT JOIN d ON n.doc_id = d.doc_id
        |ORDER BY n.doc_id""".stripMargin,
    "q_repetition_stats" ->
      s"""WITH $docTokenStatsCte
        |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
        | round(CAST(n_distinct AS DOUBLE) / n_tokens, 4) AS distinct_ratio_r,
        | round(CAST(top_cnt AS DOUBLE) / n_tokens, 4) AS top_term_frac_r,
        | round(dup_bigram_frac, 4) AS dup_bigram_frac_r
        |FROM st ORDER BY doc_id""".stripMargin,
    "q_gopher_rules" ->
      s"""WITH $docTokenStatsCte,
        |f AS (
        |  SELECT doc_id, n_tokens, mwl,
        |    CAST(n_tokens >= $GopherMinTokens AND n_tokens <= $GopherMaxTokens AS BIGINT) AS f_len,
        |    CAST(mwl >= $GopherMinMwl AND mwl <= $GopherMaxMwl AS BIGINT) AS f_mwl,
        |    CAST(CAST(top_cnt AS DOUBLE) / n_tokens <= $GopherMaxTopFrac AS BIGINT) AS f_rep,
        |    CAST(CAST(n_distinct AS DOUBLE) / n_tokens >= $GopherMinDistinctRatio AS BIGINT) AS f_dr
        |  FROM st)
        |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens, round(mwl, 4) AS mwl_r,
        | f_len, f_mwl, f_rep, f_dr,
        | f_len * f_mwl * f_rep * f_dr AS keep
        |FROM f ORDER BY doc_id""".stripMargin,
    // built on the SAME shared fragments as the corpus-curate oracle
    // (docTokenStatsCte's bigram/token rows + lmScoreCte)
    "q_lm_score" ->
      s"""WITH $docTokenStatsCte,
        |$lmScoreCte
        |SELECT doc_id, count(*) AS n_bigrams, round(avg(lp), 4) AS mean_lnp_r
        |FROM lsc GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // Naive Bayes train-and-score replayed end-to-end: the same per-(doc,
    // term) counts feed training (train split only) and scoring (all docs),
    // so the learned per-term class counts themselves are hash-compared.
    "q_quality_classifier" ->
      s"""WITH $docTokenStatsCte,
        |lab AS (
        |  SELECT doc_id,
        |    CASE WHEN source IN ('src0','src1','src2','src3') THEN 'hi' ELSE 'lo' END AS label,
        |    doc_id % 10 < 7 AS is_train
        |  FROM documents),
        |ttc AS (
        |  SELECT tc.term, lab.label, tc.c
        |  FROM tc JOIN lab USING (doc_id) WHERE lab.is_train),
        |cnt AS (
        |  SELECT term,
        |    sum(CASE WHEN label = 'hi' THEN c ELSE 0 END) AS c_hi,
        |    sum(CASE WHEN label = 'lo' THEN c ELSE 0 END) AS c_lo
        |  FROM ttc GROUP BY term),
        |tot AS (SELECT sum(c_hi) AS tot_hi, sum(c_lo) AS tot_lo, count(*) AS v FROM cnt),
        |pr AS (
        |  SELECT sum(CASE WHEN label = 'hi' THEN 1 ELSE 0 END) AS nd_hi,
        |         sum(CASE WHEN label = 'lo' THEN 1 ELSE 0 END) AS nd_lo
        |  FROM lab WHERE is_train),
        |sc AS (
        |  SELECT tc.doc_id, tc.c,
        |    ln((coalesce(cnt.c_hi, 0) + 1.0) / (tot.tot_hi + tot.v)) -
        |    ln((coalesce(cnt.c_lo, 0) + 1.0) / (tot.tot_lo + tot.v)) AS dlp
        |  FROM tc LEFT JOIN cnt USING (term) CROSS JOIN tot),
        |ag AS (
        |  SELECT doc_id, sum(c) AS n_tokens,
        |    round(ln(CAST(pr.nd_hi AS DOUBLE)) - ln(CAST(pr.nd_lo AS DOUBLE))
        |          + sum(c * dlp), 4) AS llr_r
        |  FROM sc CROSS JOIN pr GROUP BY doc_id, pr.nd_hi, pr.nd_lo)
        |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens, llr_r,
        |  CASE WHEN llr_r > 0 THEN 'hi' ELSE 'lo' END AS pred
        |FROM ag ORDER BY doc_id""".stripMargin,
    "q_weighted_sample" ->
      """WITH s AS (
        |  SELECT lang, doc_id, n_chars,
        |    pow(((doc_id % 4294967296 * 40503 % 4294967296 * 40503 % 4294967296) + 1)
        |          / 4294967297.0,
        |        1.0 / n_chars) AS k
        |  FROM documents),
        |r AS (
        |  SELECT lang, doc_id, n_chars, k,
        |    CAST(row_number() OVER (PARTITION BY lang ORDER BY k DESC, doc_id) AS BIGINT) AS rn
        |  FROM s)
        |SELECT lang, rn, doc_id, CAST(n_chars AS BIGINT) AS n_chars, round(k, 6) AS key_r
        |FROM r WHERE rn <= 3 ORDER BY lang, rn""".stripMargin,
    // exact definition — the MG sketch on the Spark side must be invisible
    "q_heavy_hitters" ->
      """WITH t AS (
        |  SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) AS term FROM documents),
        |c AS (SELECT term, count(*) AS cnt FROM t GROUP BY term),
        |n AS (SELECT count(*) AS n_total FROM t)
        |SELECT term, CAST(cnt AS BIGINT) AS cnt,
        | round(CAST(cnt AS DOUBLE) / n.n_total, 4) AS frac_r
        |FROM c, n WHERE cnt * 100 >= n.n_total
        |ORDER BY cnt DESC, term""".stripMargin,
    "q_bm25" ->
      """WITH w AS (
        |  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS ws FROM documents),
        |dl AS (SELECT doc_id, CAST(len(ws) AS DOUBLE) AS dl FROM w),
        |st AS (SELECT avg(dl) AS avgdl, count(*) AS n_docs FROM dl),
        |t AS (SELECT doc_id, unnest(ws) AS term FROM w),
        |tf AS (
        |  SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf FROM t
        |  WHERE term IN ('spark', 'query', 'window') GROUP BY doc_id, term),
        |df AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY term),
        |sc AS (
        |  SELECT tf.doc_id,
        |    ln((st.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0) *
        |      (tf.tf * (1.2 + 1.0)) /
        |      (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / st.avgdl)) AS contrib
        |  FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN st)
        |SELECT doc_id, round(sum(contrib), 4) AS bm25_r, count(*) AS n_terms
        |FROM sc GROUP BY doc_id ORDER BY bm25_r DESC, doc_id LIMIT 10""".stripMargin,
    "q_source_overlap" ->
      """WITH w AS (
        |  SELECT source, string_split_regex(lower(trim(text)), '\s+') AS ws FROM documents),
        |s AS (
        |  SELECT DISTINCT source, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS sh
        |  FROM (SELECT source, ws, unnest(generate_series(1, len(ws) - 2)) AS i FROM w) t),
        |n AS (SELECT source, count(*) AS n_sh FROM s GROUP BY source),
        |p AS (
        |  SELECT a.source AS source_a, b.source AS source_b, count(*) AS n_shared
        |  FROM s a JOIN s b ON a.sh = b.sh AND a.source < b.source GROUP BY 1, 2)
        |SELECT source_a, source_b, CAST(n_shared AS BIGINT) AS n_shared,
        | round(CAST(n_shared AS DOUBLE) / (na.n_sh + nb.n_sh - n_shared), 4) AS jaccard_r
        |FROM p JOIN n na ON source_a = na.source JOIN n nb ON source_b = nb.source
        |ORDER BY source_a, source_b""".stripMargin,
    // built on the SAME shared fragment as the corpus-curate oracle
    "q_contamination" ->
      s"""WITH $contaminationCte
        |SELECT cr.doc_id, CAST(cr.n_sh AS BIGINT) AS n_sh,
        | CAST(coalesce(ch.hits, 0) AS BIGINT) AS n_hit,
        | round(CAST(coalesce(ch.hits, 0) AS DOUBLE) / cr.n_sh, 4) AS hit_frac_r,
        | CAST(CAST(coalesce(ch.hits, 0) AS DOUBLE) / cr.n_sh >= $ContaminationThreshold AS BIGINT) AS contaminated
        |FROM cr LEFT JOIN ch ON cr.doc_id = ch.doc_id
        |ORDER BY cr.doc_id""".stripMargin,
    // equal-share mixture: every source downsampled to the smallest
    // source's count, md5-ordered — the data-dependent k is a plain
    // subquery here (the Spark side reads it as one bounded metadata row)
    "q_source_mix" ->
      """WITH n AS (SELECT source, count(*) AS n FROM documents GROUP BY source),
        |k AS (SELECT min(n) AS k FROM n),
        |s AS (SELECT source, doc_id, md5(CAST(doc_id AS VARCHAR)) AS h FROM documents),
        |r AS (
        |  SELECT source, doc_id, h,
        |    CAST(row_number() OVER (PARTITION BY source ORDER BY h, doc_id) AS BIGINT) AS rn
        |  FROM s)
        |SELECT source, rn, doc_id, h FROM r, k WHERE rn <= k.k
        |ORDER BY source, rn""".stripMargin,
    // the window-cumsum definition of concatenate-and-chunk packing — the
    // Spark side's two-phase prefix sum must be invisible in the result
    "q_token_pack" ->
      s"""WITH t AS (
        |  SELECT doc_id,
        |    CAST(len(string_split_regex(lower(trim(text)), '\\s+')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, n_tokens,
        |    CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_off
        |  FROM t)
        |SELECT doc_id, n_tokens, start_off,
        |  start_off // ${PackCapacity} AS chunk_first,
        |  (start_off + greatest(n_tokens, 1) - 1) // ${PackCapacity} AS chunk_last,
        |  (start_off + greatest(n_tokens, 1) - 1) // ${PackCapacity}
        |    - start_off // ${PackCapacity} + 1 AS n_chunks
        |FROM c ORDER BY doc_id""".stripMargin,
    // chunk geometry via generate_series over the same raw space-split the
    // typed pass runs; the content hash replays as md5 over the identical
    // list-slice join (single-space token streams make join = substring)
    "q_chunk_tokens" ->
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |u AS (
        |  SELECT doc_id, toks,
        |    unnest(range(0, (len(toks) - 1) // ${ChunkStride} + 1)) AS gid
        |  FROM t),
        |g AS (
        |  SELECT doc_id, toks, CAST(gid AS BIGINT) AS chunk_id,
        |    CAST(gid * ${ChunkStride} AS BIGINT) AS start_tok
        |  FROM u)
        |SELECT doc_id, chunk_id, start_tok,
        |  CAST(least(len(toks), start_tok + ${ChunkSize}) - start_tok AS BIGINT) AS n_tok,
        |  md5(array_to_string(
        |    toks[CAST(start_tok + 1 AS INT):CAST(least(len(toks), start_tok + ${ChunkSize}) AS INT)],
        |    ' ')) AS chunk_md5
        |FROM g ORDER BY doc_id, chunk_id""".stripMargin,
    // the same enrichment spelled with chr() code points; DuckDB's
    // utf8proc nfc_normalize replays the JDK normalizer (both implement
    // Unicode NFC), the zero-width class is the shared constant, and both
    // engines md5 the identical canonical UTF-8 bytes
    "q_unicode_normalize" ->
      s"""WITH e AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 3 = 0 THEN 'e' || chr(769) || ' '
        |         WHEN doc_id % 3 = 1 THEN 'A' || chr(8203) || 'B '
        |         ELSE chr(64257) || 'le ' END || text AS raw
        |  FROM documents),
        |n AS (
        |  SELECT doc_id, raw,
        |    regexp_replace(regexp_replace(nfc_normalize(raw),
        |      '${ZeroWidthRe}', '', 'g'), ' +', ' ', 'g') AS clean
        |  FROM e)
        |SELECT doc_id, CAST(length(raw) AS BIGINT) AS len_raw,
        |  CAST(length(clean) AS BIGINT) AS len_norm,
        |  CAST(CASE WHEN clean <> raw THEN 1 ELSE 0 END AS BIGINT) AS changed,
        |  md5(clean) AS norm_md5
        |FROM n ORDER BY doc_id""".stripMargin,
    // byte-replay of the winnowing kernel (see docFingerprint notes): the
    // k-gram polynomial hash mod 2^64 via HUGEINT split-multiplies, the
    // splitmix64 avalanche in staged columns, window-min + DISTINCT. xor()
    // on BIGINT two's complement equals xor on the unsigned bits; u // 2^s
    // on the unsigned HUGEINT is the logical right shift.
    "q_doc_fingerprint" ->
      """WITH t AS (
        |  SELECT doc_id, text, CAST(length(text) AS BIGINT) - 8 + 1 AS n FROM documents),
        |g AS (
        |  SELECT doc_id, n, unnest(range(0, n)) AS pos, text FROM t WHERE n > 0),
        |h0 AS (
        |  SELECT doc_id, n, pos,
        |    (CAST(ascii(substr(text, CAST(pos + 1 AS INT), 1)) AS HUGEINT) * 14218562807570617051::HUGEINT
        |     + CAST(ascii(substr(text, CAST(pos + 2 AS INT), 1)) AS HUGEINT) * 15895002104753931833::HUGEINT
        |     + CAST(ascii(substr(text, CAST(pos + 3 AS INT), 1)) AS HUGEINT) * 913917546033277539::HUGEINT
        |     + CAST(ascii(substr(text, CAST(pos + 4 AS INT), 1)) AS HUGEINT) * 11527715348014283921::HUGEINT
        |     + CAST(ascii(substr(text, CAST(pos + 5 AS INT), 1)) AS HUGEINT) * 624165263380053675::HUGEINT
        |     + CAST(ascii(substr(text, CAST(pos + 6 AS INT), 1)) AS HUGEINT) * 956575116354345::HUGEINT
        |     + CAST(ascii(substr(text, CAST(pos + 7 AS INT), 1)) AS HUGEINT) * 1099511628211::HUGEINT
        |     + CAST(ascii(substr(text, CAST(pos + 8 AS INT), 1)) AS HUGEINT)
        |    ) % 18446744073709551616::HUGEINT AS u0 FROM g),
        |x1 AS (
        |  SELECT doc_id, n, pos,
        |    CASE WHEN s1 < 0 THEN CAST(s1 AS HUGEINT) + 18446744073709551616::HUGEINT
        |         ELSE CAST(s1 AS HUGEINT) END AS a1
        |  FROM (
        |    SELECT doc_id, n, pos,
        |      xor(CAST(CASE WHEN u0 >= 9223372036854775808::HUGEINT
        |               THEN u0 - 18446744073709551616::HUGEINT ELSE u0 END AS BIGINT),
        |          CAST(u0 // 1073741824::HUGEINT AS BIGINT)) AS s1
        |    FROM h0) q1),
        |u1 AS (
        |  SELECT doc_id, n, pos,
        |    ((a1 % 4294967296::HUGEINT) * 13787848793156543929::HUGEINT
        |     + ((a1 // 4294967296::HUGEINT * 484763065::HUGEINT) % 4294967296::HUGEINT)
        |       * 4294967296::HUGEINT) % 18446744073709551616::HUGEINT AS u1
        |  FROM x1),
        |x2 AS (
        |  SELECT doc_id, n, pos,
        |    CASE WHEN s2 < 0 THEN CAST(s2 AS HUGEINT) + 18446744073709551616::HUGEINT
        |         ELSE CAST(s2 AS HUGEINT) END AS a2
        |  FROM (
        |    SELECT doc_id, n, pos,
        |      xor(CAST(CASE WHEN u1 >= 9223372036854775808::HUGEINT
        |               THEN u1 - 18446744073709551616::HUGEINT ELSE u1 END AS BIGINT),
        |          CAST(u1 // 134217728::HUGEINT AS BIGINT)) AS s2
        |    FROM u1) q2),
        |u2 AS (
        |  SELECT doc_id, n, pos,
        |    ((a2 % 4294967296::HUGEINT) * 10723151780598845931::HUGEINT
        |     + ((a2 // 4294967296::HUGEINT * 321982955::HUGEINT) % 4294967296::HUGEINT)
        |       * 4294967296::HUGEINT) % 18446744073709551616::HUGEINT AS u2
        |  FROM x2),
        |hh AS (
        |  SELECT doc_id, n, pos,
        |    xor(CAST(CASE WHEN u2 >= 9223372036854775808::HUGEINT
        |             THEN u2 - 18446744073709551616::HUGEINT ELSE u2 END AS BIGINT),
        |        CAST(u2 // 2147483648::HUGEINT AS BIGINT)) AS gram
        |  FROM u2),
        |wm AS (
        |  SELECT doc_id, n, pos,
        |    min(gram) OVER (PARTITION BY doc_id ORDER BY pos
        |                    ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS wmin
        |  FROM hh),
        |pick AS (
        |  SELECT doc_id, wmin AS fp FROM wm WHERE n > 4 AND pos >= 3
        |  UNION
        |  SELECT doc_id, gram AS fp FROM hh WHERE n <= 4),
        |agg AS (
        |  SELECT doc_id, CAST(count(DISTINCT fp) AS BIGINT) AS n_fingerprints,
        |    min(fp) AS min_fp, max(fp) AS max_fp
        |  FROM pick GROUP BY doc_id)
        |SELECT d.doc_id, coalesce(a.n_fingerprints, 0) AS n_fingerprints,
        |  coalesce(a.min_fp, 0) AS min_fp, coalesce(a.max_fp, 0) AS max_fp
        |FROM documents d LEFT JOIN agg a USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,
    "q_jaccard_ngram" ->
      """WITH w AS (
        |  SELECT doc_id, list_distinct(string_split_regex(lower(trim(text)), '\s+')) AS ws
        |  FROM documents WHERE doc_id < 50),
        |p AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |    CAST(len(list_intersect(a.ws, b.ws)) AS DOUBLE) /
        |      (len(a.ws) + len(b.ws) - len(list_intersect(a.ws, b.ws))) AS jac
        |  FROM w a JOIN w b ON a.doc_id < b.doc_id)
        |SELECT id_a, id_b, round(jac, 4) AS jaccard FROM p
        |WHERE jac >= 0.5 ORDER BY id_a, id_b""".stripMargin,
    "q_ngram_entropy" ->
      """WITH w AS (
        |  SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\s+')) AS term
        |  FROM documents),
        |tc AS (
        |  SELECT doc_id, term, count(*) AS c FROM w WHERE len(term) > 0
        |  GROUP BY doc_id, term)
        |SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
        |  CAST(count(*) AS BIGINT) AS n_distinct,
        |  round(ln(CAST(sum(c) AS DOUBLE)) - sum(c * ln(c)) / sum(c), 4) AS entropy
        |FROM tc GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // the bloom filter is plan-only (false positives die in the exact
    // confirm join, false negatives are impossible) — the oracle is the
    // exact anti-join the operator's output contract promises
    "q_bloom_dedup" ->
      """SELECT d.doc_id, d.source FROM documents d
        |WHERE d.source <> 'src0'
        |  AND NOT EXISTS (
        |    SELECT 1 FROM documents r WHERE r.source = 'src0' AND r.text = d.text)
        |ORDER BY d.doc_id""".stripMargin,
    // FNV-1a bucket replay: same recursive-CTE hash chain as the
    // simhash/minhash oracles (unsigned HUGEINT, 32-bit split multiply);
    // bucket = h % 1024 == the Spark side's signed `& 1023` because 1024
    // is a power of two
    "q_dsir_weights" ->
      """WITH RECURSIVE tk AS (
        |  SELECT doc_id, source, unnest(string_split_regex(lower(trim(text)), '\s+')) AS tok
        |  FROM documents),
        |tkf AS (SELECT doc_id, source, tok FROM tk WHERE len(tok) > 0),
        |vocab AS (SELECT DISTINCT tok FROM tkf),
        |fnv(tok, i, h) AS (
        |  SELECT tok, 0, 14695981039346656037::HUGEINT FROM vocab
        |  UNION ALL
        |  SELECT tok, i + 1,
        |    (((CASE WHEN xh < 0 THEN CAST(xh AS HUGEINT) + 18446744073709551616::HUGEINT
        |            ELSE CAST(xh AS HUGEINT) END)
        |      % 4294967296::HUGEINT) * 1099511628211::HUGEINT
        |     + (((CASE WHEN xh < 0 THEN CAST(xh AS HUGEINT) + 18446744073709551616::HUGEINT
        |             ELSE CAST(xh AS HUGEINT) END)
        |         // 4294967296::HUGEINT * 435::HUGEINT) % 4294967296::HUGEINT)
        |       * 4294967296::HUGEINT) % 18446744073709551616::HUGEINT
        |  FROM (
        |    SELECT tok, i, h,
        |      xor(CAST(CASE WHEN h >= 9223372036854775808::HUGEINT
        |               THEN h - 18446744073709551616::HUGEINT ELSE h END AS BIGINT),
        |          CAST(ascii(substr(tok, CAST(i + 1 AS INT), 1)) AS BIGINT)) AS xh
        |    FROM fnv WHERE i < len(tok)) q),
        |tb AS (SELECT tok, CAST(h % 1024::HUGEINT AS BIGINT) AS b
        |       FROM fnv WHERE i = len(tok)),
        |tc AS (SELECT t.doc_id, t.source, tb.b FROM tkf t JOIN tb USING (tok)),
        |bc AS (
        |  SELECT b, count(*) AS c_r,
        |    sum(CASE WHEN source = 'src1' THEN 1 ELSE 0 END) AS c_t
        |  FROM tc GROUP BY b),
        |tot AS (SELECT sum(c_r) AS r_tot, sum(c_t) AS t_tot FROM bc),
        |lr AS (
        |  SELECT b,
        |    ln((c_t + 1.0) / (t_tot + 1024.0)) - ln((c_r + 1.0) / (r_tot + 1024.0)) AS logr
        |  FROM bc CROSS JOIN tot),
        |db AS (SELECT doc_id, b, count(*) AS cnt FROM tc GROUP BY doc_id, b)
        |SELECT db.doc_id, CAST(sum(db.cnt) AS BIGINT) AS n_tokens,
        |  round(sum(db.cnt * lr.logr), 4) AS dsir_weight
        |FROM db JOIN lr USING (b)
        |GROUP BY db.doc_id ORDER BY db.doc_id""".stripMargin,
    // built on the same shared lm chain as q_lm_score / the curate oracle;
    // the rank runs on the ROUNDED score so ordering is engine-portable
    "q_perplexity_buckets" ->
      s"""WITH $docTokenStatsCte,
        |$lmScoreCte,
        |lm AS (SELECT doc_id, round(avg(lp), 4) AS mean_lnp_r FROM lsc GROUP BY doc_id),
        |j AS (
        |  SELECT d.doc_id, d.lang, lm.mean_lnp_r
        |  FROM documents d JOIN lm USING (doc_id)),
        |bkt AS (
        |  SELECT doc_id, lang, mean_lnp_r,
        |    ntile(3) OVER (PARTITION BY lang ORDER BY mean_lnp_r DESC, doc_id) AS tile
        |  FROM j)
        |SELECT doc_id, lang, mean_lnp_r,
        |  CASE WHEN tile = 1 THEN 'head' WHEN tile = 2 THEN 'middle'
        |       ELSE 'tail' END AS bucket
        |FROM bkt ORDER BY doc_id""".stripMargin,
    // the sampled-cutpoint twin: cutpoints from the doc_id % 10 < 3 hash
    // sample's tercile-boundary ROUNDED scores, then a stateless threshold
    // CASE — integer rank arithmetic and the shared lm chain replay exactly
    "q_perplexity_buckets_sampled" ->
      s"""WITH $docTokenStatsCte,
        |$lmScoreCte,
        |lm AS (SELECT doc_id, round(avg(lp), 4) AS mean_lnp_r FROM lsc GROUP BY doc_id),
        |j AS (
        |  SELECT d.doc_id, d.lang, lm.mean_lnp_r
        |  FROM documents d JOIN lm USING (doc_id)),
        |smp AS (SELECT * FROM j WHERE doc_id % 10 < 3),
        |rk AS (
        |  SELECT lang, doc_id, mean_lnp_r,
        |    row_number() OVER (PARTITION BY lang ORDER BY mean_lnp_r DESC, doc_id) AS rn,
        |    count(*) OVER (PARTITION BY lang) AS n_s
        |  FROM smp),
        |cuts AS (
        |  SELECT lang,
        |    max(CASE WHEN rn = (n_s + 2) // 3 THEN mean_lnp_r END) AS cut1,
        |    max(CASE WHEN rn = (2 * n_s + 2) // 3 THEN mean_lnp_r END) AS cut2
        |  FROM rk GROUP BY lang)
        |SELECT j.doc_id, j.lang, j.mean_lnp_r,
        |  CASE WHEN cuts.cut1 IS NULL OR j.mean_lnp_r >= cuts.cut1 THEN 'head'
        |       WHEN j.mean_lnp_r >= cuts.cut2 THEN 'middle'
        |       ELSE 'tail' END AS bucket
        |FROM j LEFT JOIN cuts USING (lang)
        |ORDER BY j.doc_id""".stripMargin,
    // integer fixed-point quota arithmetic (floor(n^tau * 1e6), N*w DIV W)
    // mirrors the Spark columns token-for-token; md5 draw as in q_source_mix
    "q_temperature_mix" ->
      """WITH s AS (SELECT source, count(*) AS n FROM documents GROUP BY source),
        |t AS (
        |  SELECT source, n,
        |    CAST(least(n, greatest(1, sum(n) OVER () * wf // sum(wf) OVER ())) AS BIGINT) AS k_target
        |  FROM (SELECT source, n,
        |          CAST(floor(pow(CAST(n AS DOUBLE), 0.7) * 1e6) AS BIGINT) AS wf
        |        FROM s) x),
        |r AS (
        |  SELECT source, doc_id, md5(CAST(doc_id AS VARCHAR)) AS h FROM documents),
        |w AS (
        |  SELECT source, doc_id, h,
        |    CAST(row_number() OVER (PARTITION BY source ORDER BY h, doc_id) AS BIGINT) AS rn
        |  FROM r)
        |SELECT w.source, CAST(t.n AS BIGINT) AS n_source, t.k_target, w.rn, w.doc_id
        |FROM w JOIN t USING (source)
        |WHERE w.rn <= t.k_target ORDER BY w.source, w.rn""".stripMargin,
  )
}
