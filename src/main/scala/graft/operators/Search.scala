package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Keyword retrieval over the curated corpus — the text-side member of the
  * at-rest serving family (the ANN keys serve embeddings; this serves
  * tokens): a persisted INVERTED INDEX plus BM25 top-k ranking, answering
  * "which held documents best match this query" WITHOUT re-scanning the
  * corpus text. This is the retrieval half every training-data stack also
  * ships (eval-contamination lookups, targeted corpus audits, RAG source
  * serving) and the classic IR layout: postings partitioned by token
  * bucket so a probe touches only its terms' partitions.
  *
  * Layout under the index root (same lifecycle discipline as the
  * minhash/ANN at-rest indexes — build once, partition-append forever):
  *
  *   - `postings/` (term, doc_id, tf, dl) partitioned by `tb =`
  *     crc32(term) mod [[TokenBuckets]] — a probe prunes to its terms'
  *     buckets at directory level, then filters term inside them;
  *   - `_statslog/` append-only (n_docs, sum_dl) DELTA rows — each append
  *     adds one row, a reader aggregates the log (O(appends), no
  *     read-modify-write, exactly the manifest discipline that keeps
  *     appends rebuild-free). `sum_dl` is an int64 token count, so the
  *     derived avgdl = sum_dl / n_docs is EXACT-summation arithmetic —
  *     bit-identical to a fresh avg() on any engine at any append order.
  *
  * Scale: the build is one Θ(corpus tokens) tokenize + per-doc combine
  * (map-side), shuffled once on term to co-locate postings; a probe reads
  * Θ(df of the query terms) posting rows from ≤ |query| directories —
  * independent of corpus size on the text side; df/idf derive from the
  * pruned postings themselves so appended docs are searchable immediately
  * with exact statistics. Document text never enters the index.
  */
object Search {
  type Q = (SparkSession, String) => DataFrame

  /** Posting-list fan-out. 64 here; at 100 TB this is the usual 4k–64k —
    * the probe cost model (terms' buckets only) is unchanged by the count. */
  val TokenBuckets = 64

  /** Results per query. */
  val TopK = 5

  /** The suite key's fixed query workload (query_id, free-text query) —
    * multi-term queries over the fixture vocabulary. */
  val Queries: Seq[(Long, String)] = Seq(
    0L -> "spark window agg",
    1L -> "hash join table",
    2L -> "fast filter scan",
    3L -> "data column value")

  private def toks(c: Column): Column = split(lower(trim(c)), "\\s+")

  /** Token bucket of a term — crc32 mod [[TokenBuckets]], chosen because
    * the driver can compute the identical value (java.util.zip.CRC32) to
    * enumerate a probe's target partitions for directory-level pruning. */
  private def tbOf(term: Column): Column =
    pmod(crc32(term), lit(TokenBuckets.toLong))

  private[graft] def tbOfStr(term: String): Long = {
    val c = new java.util.zip.CRC32
    c.update(term.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.lang.Math.floorMod(c.getValue, TokenBuckets.toLong)
  }

  /** Build the inverted index: tokenize once, combine to per-(doc, term)
    * tf with the doc length carried on every posting (denormalized so a
    * probe never joins back to the corpus), land under `tb=` dirs. */
  def writeKeywordIndex(s: SparkSession, d: String, path: String): Unit = {
    // a BUILD is from-scratch: clear any prior layout at the path first —
    // the append path below uses mode("append"), and appending a rebuild
    // onto a surviving on-disk index (e.g. a fresh JVM over the memoized
    // warehouse path) would silently double every posting
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    appendKeywordIndex(s, path, Tables.documents(s, d))
  }

  /** Partition-APPEND a batch into the persisted layout — new postings
    * land as new files under their existing `tb=` dirs, the stats log
    * gains one delta row; no read of the existing index, no rebuild.
    * `batch` needs (doc_id, text). */
  def appendKeywordIndex(s: SparkSession, path: String, batch: DataFrame): Unit = {
    val w = batch.select(col("doc_id"), toks(col("text")).as("ws"))
      .select(col("doc_id"), col("ws"), size(col("ws")).cast("long").as("dl"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    w.select(col("doc_id"), col("dl"), explode(col("ws")).as("term"))
      .groupBy(col("term"), col("doc_id"), col("dl"))
      .agg(count(lit(1)).as("tf"))
      .withColumn("tb", tbOf(col("term")))
      .write.mode("append").partitionBy("tb").parquet(s"$path/postings")
    w.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
      .write.mode("append").parquet(s"$path/_statslog")
    w.unpersist(blocking = false)
  }

  /** Probe the persisted index with a query workload: prune to the query
    * terms' `tb=` partitions (directory-level — the terms' buckets are
    * enumerated on the driver via the shared crc32), score BM25
    * (k1 = 1.2, b = 0.75, the q_bm25 arithmetic verbatim, idf from the
    * pruned postings' own df), rank per query on the ROUNDED score with
    * doc_id tie-break (deterministic on any engine), cut at `k` through
    * the row_number form the WindowTopKToHeap rule lowers to the heap
    * operator. Output Θ(queries · k). */
  def probeKeywordIndex(s: SparkSession, idx: String,
      queries: Seq[(Long, String)], k: Int): DataFrame = {
    val spark = s
    import spark.implicits._
    val qterms = queries
      .flatMap { case (qid, q) => q.toLowerCase.trim.split("\\s+").map(qid -> _) }
      .distinct
    val terms = qterms.map(_._2).distinct
    val buckets = terms.map(tbOfStr).distinct
    val qt = qterms.toDF("query_id", "term")
    val st = spark.read.parquet(s"$idx/_statslog")
      .agg(sum(col("n_docs")).as("n_docs"), sum(col("sum_dl")).as("sum_dl"))
      .select(col("n_docs"), (col("sum_dl").cast("double") / col("n_docs")).as("avgdl"))
    // tombstoned docs stop matching IMMEDIATELY (broadcast anti-join, the
    // shared index-lifecycle discipline); their df contribution drops with
    // them since df derives from the live postings below. The GLOBAL stats
    // (n_docs, avgdl) refresh at compaction — corpus statistics, not rows.
    val posts = Vectors.dropTombstoned(s, idx,
        spark.read.parquet(s"$idx/postings")
          .where(col("tb").isin(buckets: _*) && col("term").isin(terms: _*)),
        "doc_id")
      .select(col("term"), col("doc_id"), col("tf").cast("double").as("tf"),
        col("dl").cast("double").as("dl"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dfT = posts.groupBy(col("term")).agg(count(lit(1)).cast("double").as("df"))
    val contrib = log((col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0)) *
      (col("tf") * (lit(1.2) + lit(1.0))) /
      (col("tf") + lit(1.2) * (lit(1.0) - lit(0.75) + lit(0.75) * col("dl") / col("avgdl")))
    val scored = posts
      .join(broadcast(dfT), Seq("term"))
      .crossJoin(broadcast(st))
      .join(broadcast(qt), Seq("term"))
      .select(col("query_id"), col("doc_id"), contrib.as("contrib"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(round(sum(col("contrib")), 4).as("score_r"), count(lit(1)).as("n_terms"))
    scored
      .withColumn("rnk", row_number().over(
          Window.partitionBy(col("query_id"))
            .orderBy(col("score_r").desc, col("doc_id"))).cast("long"))
      .where(col("rnk") <= k)
      .select(col("query_id"), col("rnk"), col("doc_id"), col("score_r"), col("n_terms"))
      .orderBy(col("query_id"), col("rnk"))
  }

  /** Physical COMPACTION of the keyword layout — [[Vectors.compactIndex]]
    * over the `tb=`-partitioned postings, then the `_statslog` is REBUILT
    * to one exact row from the surviving postings' distinct (doc_id, dl)
    * pairs (staged to a sibling, swapped by FS rename): after compaction
    * the index is bit-identical to a fresh build over the surviving
    * corpus — deletes leave no statistical residue. Between takedown and
    * compaction the global (n_docs, avgdl) intentionally still count the
    * victims: immediate-takedown correctness is "the doc stops matching",
    * stats refresh on the maintenance schedule. */
  def compactKeywordIndex(s: SparkSession, dir: String): Unit = {
    val had = Vectors.tombstonesOf(s, dir).isDefined
    Vectors.compactIndex(s, dir, Seq("postings"))
    if (had) {
      val conf = s.sparkContext.hadoopConfiguration
      val fresh = s.read.parquet(s"$dir/postings")
        .select(col("doc_id"), col("dl")).distinct()
        .agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
      val tmp = new org.apache.hadoop.fs.Path(s"$dir/_statslog__compact_tmp")
      fresh.write.mode("overwrite").parquet(tmp.toString)
      val live = new org.apache.hadoop.fs.Path(s"$dir/_statslog")
      val fs = live.getFileSystem(conf)
      fs.delete(live, true)
      fs.rename(tmp, live)
    }
  }

  /** AT-REST keyword search as a suite key: the memoized index build (like
    * the ANN/minhash at-rest keys) probed with the fixed [[Queries]]
    * workload. The bench times the SERVING cost — pruned directory reads +
    * Θ(df) scoring — never a corpus scan. */
  val keywordTopkAtRest: Q = (s, d) => {
    val idx = Vectors.ensureIndex(s, "keyword", d)(p => writeKeywordIndex(s, d, p))
    probeKeywordIndex(s, idx, Queries, TopK)
  }

  val queries: Map[String, Q] = Map(
    "q_keyword_topk_at_rest" -> keywordTopkAtRest,
  )

  /** The oracle replays the CONTRACT (BM25 ranking from the corpus), not
    * the index layout — exactly the at-rest screens' oracle discipline:
    * the persisted index is the implementation, the ranked answer is the
    * semantics. Same arithmetic as the q_bm25 oracle, extended with the
    * query dimension and the per-query row_number cut. */
  val oracles: Map[String, String] = Map(
    "q_keyword_topk_at_rest" -> {
      val qvals = Queries
        .flatMap { case (qid, q) => q.toLowerCase.trim.split("\\s+").map(qid -> _) }
        .distinct
        .map { case (qid, t) => s"($qid, '$t')" }
        .mkString(", ")
      val terms = Queries.flatMap(_._2.toLowerCase.trim.split("\\s+"))
        .distinct.map(t => s"'$t'").mkString(", ")
      s"""WITH w AS (
         |  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS ws FROM documents),
         |dl AS (SELECT doc_id, CAST(len(ws) AS DOUBLE) AS dl FROM w),
         |st AS (SELECT avg(dl) AS avgdl, count(*) AS n_docs FROM dl),
         |q(query_id, term) AS (VALUES $qvals),
         |t AS (SELECT doc_id, unnest(ws) AS term FROM w),
         |tf AS (
         |  SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf FROM t
         |  WHERE term IN ($terms) GROUP BY doc_id, term),
         |df AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY term),
         |sc AS (
         |  SELECT q.query_id, tf.doc_id,
         |    ln((st.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0) *
         |      (tf.tf * (1.2 + 1.0)) /
         |      (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / st.avgdl)) AS contrib
         |  FROM q JOIN tf USING (term) JOIN df USING (term)
         |    JOIN dl USING (doc_id) CROSS JOIN st),
         |g AS (
         |  SELECT query_id, doc_id, round(sum(contrib), 4) AS score_r,
         |    CAST(count(*) AS BIGINT) AS n_terms
         |  FROM sc GROUP BY query_id, doc_id),
         |r AS (
         |  SELECT g.*, CAST(row_number() OVER (
         |    PARTITION BY query_id ORDER BY score_r DESC, doc_id) AS BIGINT) AS rnk
         |  FROM g)
         |SELECT CAST(query_id AS BIGINT) AS query_id, rnk, doc_id, score_r, n_terms
         |FROM r WHERE rnk <= $TopK
         |ORDER BY query_id, rnk""".stripMargin
    },
  )
}
