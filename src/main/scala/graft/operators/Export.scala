package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Training-export verbs — the LAST stage of the corpus pipeline, after
  * curation and packing: deterministic sharding with a verifiable manifest,
  * and epoch-aware mixture materialization (the "2.5 epochs of books, 0.25
  * of crawl" recipe of the LLaMA/GPT data mixes), plus domain-level
  * reputation gating (the RefinedWeb/UT1 "judge the site, not just the
  * page" filter).
  *
  * Scale notes common to the module: shard/epoch/site assignment are pure
  * per-row functions of (doc_id, source, lang) — no shuffle to decide them;
  * the only aggregations are Θ(shards) / Θ(sites) manifests; document text
  * never shuffles (the manifest fingerprint travels as one int64 per doc).
  * The trailing orderBy on each key exists for oracle determinism only and
  * is dropped in production use.
  */
object Export {
  type Q = (SparkSession, String) => DataFrame

  /** Shard fan-out of the export. 8 here; at 100 TB this is #output files
    * you want (e.g. 8192) — the assignment below is uniform for any count. */
  val ShardCount = 8

  /** Salt decorrelating the shard draw from the train/val/test split draw
    * ([[Text.uniformDrawOf]] hashes the UNsalted id): same two-round Knuth
    * construction, different orbit. */
  val ShardSalt = 7919L

  /** Salt for the fractional-epoch coin flip, decorrelated from both the
    * split draw and the shard draw. */
  val EpochSalt = 104729L

  private def toks(c: Column): Column = split(lower(trim(c)), "\\s+")

  /** Engine-portable shard id: two rounds of 16-bit Knuth multiplicative
    * hashing over the salted id in 32-bit space (the overflow-safe
    * construction of [[Text.uniformDrawOf]]), then mod [[ShardCount]].
    * Pure integer arithmetic — bit-identical on any engine, stable across
    * reruns, and independent of input order: the property that makes the
    * export reproducible and the manifest re-checkable. */
  private[operators] def shardOf(id: Column): Column = {
    val m32 = lit(4294967296L)
    val h1 = (id + lit(ShardSalt)) % m32
    val h2 = (h1 * lit(40503L)) % m32
    val h3 = (h2 * lit(40503L)) % m32
    (h3 % ShardCount).cast("long")
  }

  /** Per-doc content fingerprint: the leading 60 bits of md5(text) as an
    * int64. XOR-aggregated per shard it yields an order-independent,
    * O(1)-state shard checksum — the manifest entry a reader can recompute
    * after any repartition/merge and still match. */
  private def docFp: Column =
    conv(substring(md5(col("text")), 1, 15), 16, 10).cast("long")

  /** Deterministic shard manifest — the export side of the corpus: every
    * doc lands in a pure-hash shard, and the manifest certifies each
    * shard's content (doc/token/char counts, id range, XOR'd content
    * fingerprint). Writing the data itself is [[writeShards]]; this key is
    * the manifest those files must reproduce.
    *
    * Scale: shard assignment and the per-doc fingerprint are map-side; the
    * groupBy shuffles one 5-long row per doc (never the text) and reduces
    * map-side to ≤ [[ShardCount]] rows per partition. XOR (not sum) keeps
    * the checksum closed under int64 — no overflow at any corpus size. */
  val shardExport: Q = (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"), shardOf(col("doc_id")).as("shard"),
        size(toks(col("text"))).cast("long").as("n_toks"),
        length(col("text")).cast("long").as("n_chars"),
        docFp.as("fp"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_toks")).as("n_tokens"),
        sum(col("n_chars")).as("n_chars"),
        min(col("doc_id")).as("min_doc_id"),
        max(col("doc_id")).as("max_doc_id"),
        expr("bit_xor(fp)").as("fingerprint"))
      .orderBy(col("shard"))

  /** Per-source epoch targets for [[epochMix]], keyed on the numeric source
    * index mod 4 — upsampling (2.5), identity (1.0), aggressive
    * downsampling (0.25) and fractional upsampling (1.75) all exercised.
    * Expressed as (whole epochs, fractional part) so the integer floor
    * never passes through double division. */
  private def epochBase(idx: Column): Column =
    when(idx % 4 === 0, 2L).when(idx % 4 === 1, 1L)
      .when(idx % 4 === 2, 0L).otherwise(1L)
  private def epochFrac(idx: Column): Column =
    when(idx % 4 === 0, 0.5).when(idx % 4 === 1, 0.0)
      .when(idx % 4 === 2, 0.25).otherwise(0.75)

  /** Epoch-aware mixture materialization: each source is assigned a target
    * epoch count e (possibly fractional, possibly < 1); every doc is
    * emitted floor(e) times plus one more with probability frac(e), decided
    * by the engine-portable salted coin flip — so the materialized list
    * hits the target in expectation with zero coordination, and the SAME
    * docs are the repeated/dropped ones on every engine and every rerun
    * (the reproducibility a training run needs to resume). frac < 1 with
    * floor = 0 is deterministic downsampling; floor ≥ 1 is upsampling with
    * deterministic extra-epoch membership.
    *
    * Scale: entirely map-side — a per-row CASE + hash flip + bounded array
    * explode; output is Θ(docs · epochs), which IS the product being built.
    * No shuffle anywhere but the oracle-determinism orderBy. */
  val epochMix: Q = (s, d) => {
    val idx = substring(col("source"), 4, 10).cast("int")
    val u = Text.uniformDrawOf(col("doc_id") + lit(EpochSalt))
    val repCnt = (epochBase(idx) +
      when(u < epochFrac(idx), 1L).otherwise(0L)).cast("long")
    Tables.documents(s, d)
      .select(col("doc_id"), col("source"), repCnt.as("rep_cnt"))
      .withColumn("rep", explode(
        when(col("rep_cnt") >= 1, sequence(lit(1L), col("rep_cnt")))
          .otherwise(array().cast("array<long>"))))
      .orderBy(col("doc_id"), col("rep"))
  }

  /** Scalar twin of [[epochMix]]'s per-doc repeat count — the ONE
    * arithmetic under the batch key, the DuckDB oracle and the streaming
    * twin ([[graft.streaming.Streams]]): parse the source index, pick
    * (floor, frac), flip the salted portable coin. Non-numeric/missing
    * source takes the CASE ELSE branch exactly as the Column form's
    * `otherwise` does. */
  private[graft] def repCountOf(docId: Long, source: String): Long = {
    val m32 = 4294967296L
    val idx =
      try { if (source == null) -1 else source.drop(3).toInt % 4 }
      catch { case _: NumberFormatException => -1 }
    val (base, frac) = idx match {
      case 0 => (2L, 0.5)
      case 1 => (1L, 0.0)
      case 2 => (0L, 0.25)
      case _ => (1L, 0.75)
    }
    val u = (((docId + EpochSalt) % m32) * 40503L % m32 * 40503L % m32 + 1).toDouble / 4294967297.0
    base + (if (u < frac) 1L else 0L)
  }

  /** The simulated OLD snapshot membership/edit rules of [[corpusDiff]],
    * shared between the Spark form and the oracle: docs with id % 11 = 5
    * are new arrivals (absent from old), docs with id % 17 = 3 were taken
    * down (absent from new), docs with id % 13 = 2 were edited in place. */
  private val DiffAddMod = 11L
  private val DiffDropMod = 17L
  private val DiffEditMod = 13L

  /** Corpus snapshot diff — the audit of an incremental refresh: given the
    * previous and the current snapshot of the corpus, report per doc
    * whether it was added, removed, changed (content hash differs) or
    * unchanged. The two snapshots here are deterministic restrictions/
    * edits of the one documents table (the synthetic-fixture discipline of
    * q_url_canonicalize); the operator under test is the diff itself.
    *
    * Scale: both sides reduce to (id, md5) BEFORE the join — the full
    * outer equi-join shuffles 40 bytes per doc, never the text; at 100 TB
    * this is the standard snapshot-reconciliation join, and bucketed
    * at-rest layouts ([[ScaleJoins.writeBucketed]]) make it shuffle-free. */
  /** The OLD-snapshot relation (doc_id, old_md5) — shared with the
    * streaming twin ([[graft.streaming.Streams.corpusDiffStream]]), whose
    * static join side this is. */
  private[graft] def oldSnapshot(docs: DataFrame): DataFrame =
    docs.where(col("doc_id") % DiffAddMod =!= 5)
      .select(col("doc_id"), md5(col("text")).as("old_md5"))

  /** The NEW-snapshot relation (doc_id, new_md5) — membership and edit
    * rule single-sourced between the batch key and the streaming twin's
    * arrival side. */
  private[graft] def newSnapshot(docs: DataFrame): DataFrame =
    docs.where(col("doc_id") % DiffDropMod =!= 3)
      .select(col("doc_id"),
        md5(when(col("doc_id") % DiffEditMod === 2, concat(col("text"), lit(" v2")))
          .otherwise(col("text"))).as("new_md5"))

  val corpusDiff: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    val old = oldSnapshot(docs)
    val nw = newSnapshot(docs)
    old.join(nw, Seq("doc_id"), "full_outer")
      .select(col("doc_id"), col("old_md5"), col("new_md5"),
        when(col("old_md5").isNull, lit("added"))
          .when(col("new_md5").isNull, lit("removed"))
          .when(col("old_md5") =!= col("new_md5"), lit("changed"))
          .otherwise(lit("unchanged")).as("status"))
      .orderBy(col("doc_id"))
  }

  /** The site key of [[domainReputation]]: canonical host + top path
    * segment (the granularity at which crawl blocklists operate — a host
    * serving several language sections is judged per section). Derived
    * from the same synthetic-URL scheme as q_url_canonicalize. */
  private def siteOf: Column =
    concat(col("source"), lit(".example.com/"), col("lang"))

  /** Domain-level reputation gate: aggregate page quality
    * ([[Text.qualityExpr]], fixed-point ×10⁴) per site, flag sites whose
    * mean quality sits below the corpus mean, and gate every doc by its
    * site's verdict — pages on a bad site are dropped even when the page
    * itself scores fine (the signal page-level filters can't see).
    *
    * Determinism: the site-vs-corpus comparison is the integer
    * cross-multiply sum_q4·n_tot < q_tot·n_site — exact, no FP division,
    * so the verdict can never flip on summation order. (At extreme corpus
    * sizes the products need DECIMAL(38) headroom — n_docs·10⁴·n_docs
    * passes int64 around 10⁹ docs — a widening, not a redesign.)
    *
    * Scale: one Θ(sites) aggregate (map-side combined), site verdicts +
    * corpus totals broadcast back; the doc side never shuffles. */
  val domainReputation: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    val q = docs.select(col("doc_id"), siteOf.as("site"),
      round(Text.qualityExpr * 10000, 0).cast("long").as("q4"))
    val sites = q.groupBy(col("site"))
      .agg(count(lit(1)).as("n_site"), sum(col("q4")).as("sum_q4"))
    val tot = q.agg(count(lit(1)).as("n_tot"), sum(col("q4")).as("q_tot"))
    q.join(broadcast(sites), Seq("site"))
      .crossJoin(broadcast(tot))
      .select(col("doc_id"), col("site"), col("n_site"),
        expr("sum_q4 DIV n_site").as("site_mq4"),
        when(col("sum_q4") * col("n_tot") < col("q_tot") * col("n_site"),
          lit("drop")).otherwise(lit("keep")).as("verdict"))
      .orderBy(col("doc_id"))
  }

  /** The offline site-verdict table [[graft.streaming.Streams]] broadcasts
    * for the streaming gate: Θ(sites) rows, each carrying the exact columns
    * the verdict needs. */
  private[graft] def siteVerdicts(s: SparkSession, d: String): DataFrame = {
    val q = Tables.documents(s, d)
      .select(siteOf.as("site"), round(Text.qualityExpr * 10000, 0).cast("long").as("q4"))
    val sites = q.groupBy(col("site"))
      .agg(count(lit(1)).as("n_site"), sum(col("q4")).as("sum_q4"))
    val tot = q.agg(count(lit(1)).as("n_tot"), sum(col("q4")).as("q_tot"))
    sites.crossJoin(broadcast(tot))
      .select(col("site"), col("n_site"), expr("sum_q4 DIV n_site").as("site_mq4"),
        when(col("sum_q4") * col("n_tot") < col("q_tot") * col("n_site"),
          lit("drop")).otherwise(lit("keep")).as("verdict"))
  }

  /** Site key of a single document, computed from its own columns — the
    * stateless per-arrival form the streaming twin uses. */
  private[graft] def siteKeyOf(source: String, lang: String): String =
    s"$source.example.com/$lang"

  /** Materialize the sharded export on disk: Hive-partitioned by `shard`,
    * rows sorted inside each shard file by the deterministic md5 order key
    * (the "global shuffle" of training exports — reproducible, seedless),
    * text carried verbatim. Returns the manifest the files must match —
    * the same relation as [[shardExport]], recomputed FROM THE WRITTEN
    * FILES so the caller verifies the export, not the intent.
    *
    * Scale: one repartition on shard (the only time text moves, and it
    * moves exactly once — this IS the export shuffle), in-partition sort is
    * per-shard-file; `maxRecordsPerFile` bounds file sizes at real scale. */
  def writeShards(s: SparkSession, d: String, outPath: String): DataFrame = {
    Tables.documents(s, d)
      .select(col("doc_id"), col("text"), col("source"), col("lang"),
        shardOf(col("doc_id")).as("shard"),
        md5(col("doc_id").cast("string")).as("ord"))
      .repartition(ShardCount, col("shard"))
      .sortWithinPartitions(col("shard"), col("ord"))
      .write.mode("overwrite").partitionBy("shard").parquet(outPath)
    s.read.parquet(outPath)
      .select(col("shard").cast("long").as("shard"), col("doc_id"),
        size(toks(col("text"))).cast("long").as("n_toks"),
        length(col("text")).cast("long").as("n_chars"), docFp.as("fp"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("n_tokens"),
        sum(col("n_chars")).as("n_chars"), min(col("doc_id")).as("min_doc_id"),
        max(col("doc_id")).as("max_doc_id"), expr("bit_xor(fp)").as("fingerprint"))
      .orderBy(col("shard"))
  }

  /** Salt for the in-stage curriculum shuffle draw — fourth decorrelated
    * Knuth orbit (split, shard, epoch, curriculum). */
  val CurriculumSalt = 1299709L

  /** Quality thresholds (fixed-point ×10⁴) cutting the corpus into
    * curriculum stages 0..3, cleanest first. FIXED absolute thresholds,
    * not quantiles — the stage of a doc never depends on what else is in
    * the corpus, so stages are stable under appends/reshards and
    * engine-portable with zero coordination (the same property the split/
    * shard draws have). */
  val StageCuts: Seq[Long] = Seq(7500L, 5000L, 2500L)

  /** Curriculum ORDER manifest — the "what order to feed it" half of the
    * export (the shard manifest says where rows live; this says when the
    * trainer should see them): quality-staged, deterministically shuffled
    * within stage. Per doc: stage = fixed [[StageCuts]] bucket of the
    * ×10⁴ quality score (easy/clean stages first — the curriculum-learning
    * recipe), shard = the SAME [[shardOf]] draw as the shard manifest (a
    * stage is consumed shard-by-shard), pos = rank within (stage, shard)
    * by the salted [[CurriculumSalt]] coin — the seedless reproducible
    * in-stage shuffle, resume-safe like the epoch mixture.
    *
    * Scale: stage/shard/draw are pure per-row functions; the only real
    * work is the per-(stage, shard) rank — a window whose partition count
    * is stages × [[ShardCount]] and whose partition size is the per-shard
    * export size the writer needs sorted anyway (at 100 TB you raise
    * ShardCount, never the partition size; no global sort exists outside
    * the oracle's presentation ORDER BY). */
  val curriculumOrder: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val q4 = round(Text.qualityExpr * 10000, 0).cast("long")
    val m32 = lit(4294967296L)
    val draw = (((col("doc_id") + lit(CurriculumSalt)) % m32) * lit(40503L) % m32) * lit(40503L) % m32
    val stage = StageCuts.zipWithIndex
      .foldLeft(when(lit(false), lit(0L))) { case (acc, (cut, i)) =>
        acc.when(col("q4") >= cut, lit(i.toLong))
      }.otherwise(lit(StageCuts.size.toLong))
    Tables.documents(s, d)
      .select(col("doc_id"), q4.as("q4"), shardOf(col("doc_id")).as("shard"),
        draw.as("draw"))
      .select(col("doc_id"), stage.as("stage"), col("shard"), col("draw"))
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("stage"), col("shard"))
          .orderBy(col("draw"), col("doc_id"))).cast("long"))
      .select(col("doc_id"), col("stage"), col("shard"), col("pos"))
      .orderBy(col("stage"), col("shard"), col("pos"))
  }

  val queries: Map[String, Q] = Map(
    "q_shard_export"      -> shardExport,
    "q_epoch_mix"         -> epochMix,
    "q_domain_reputation" -> domainReputation,
    "q_corpus_diff"       -> corpusDiff,
    "q_curriculum_order"  -> curriculumOrder,
  )

  /** Shared fixed-point page-quality CTE (×10⁴ integer), mirroring
    * [[Text.qualityExpr]] exactly — ONE replay under the domain oracle. */
  private val q4Cte: String =
    """q AS (
      |  SELECT doc_id, source || '.example.com/' || lang AS site,
      |    CAST(round(round(least(CAST(len(string_split_regex(lower(trim(text)), '\s+')) AS DOUBLE) / 100.0, 1.0)
      |      * (1.0 - CAST(len(regexp_extract_all(text, '[^a-z0-9\s]')) AS DOUBLE)
      |               / CAST(length(text) AS DOUBLE)), 4) * 10000) AS BIGINT) AS q4
      |  FROM documents)""".stripMargin

  /** The first 15 hex chars of md5(text) as a BIGINT, spelled as the
    * positional digit sum Σ digit(k)·16^(15−k) — numerically identical to
    * DuckDB's `('0x' || hex)::BIGINT` hex-string cast (which Spark's CAST
    * rejects), but every term is plain instr/substr arithmetic both
    * engines evaluate exactly (max value 16^15 ≈ 1.15e18 < 2^63; the
    * 16^14 weight is a BIGINT literal on both). Machine-generated so the
    * oracle stays the algorithm. */
  private val hexFp15: String =
    (1 to 15).map { k =>
      val w = java.math.BigInteger.valueOf(16).pow(15 - k)
      s"(instr('0123456789abcdef', substr(md5(text), $k, 1)) - 1) * CAST($w AS BIGINT)"
    }.mkString("(", "\n      + ", ")")

  val oracles: Map[String, String] = Map(
    "q_shard_export" ->
      s"""WITH s AS (
        |  SELECT doc_id,
        |    ((((doc_id + 7919) % 4294967296) * 40503 % 4294967296) * 40503 % 4294967296) % 8 AS shard,
        |    CAST(len(string_split_regex(lower(trim(text)), '\\s+')) AS BIGINT) AS n_toks,
        |    CAST(length(text) AS BIGINT) AS n_chars,
        |    CAST($hexFp15 AS BIGINT) AS fp
        |  FROM documents)
        |SELECT CAST(shard AS BIGINT) AS shard, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_toks) AS BIGINT) AS n_tokens, CAST(sum(n_chars) AS BIGINT) AS n_chars,
        |  min(doc_id) AS min_doc_id, max(doc_id) AS max_doc_id,
        |  CAST(bit_xor(fp) AS BIGINT) AS fingerprint
        |FROM s GROUP BY shard ORDER BY shard""".stripMargin,
    "q_epoch_mix" ->
      """WITH e AS (
        |  SELECT doc_id, source,
        |    CASE CAST(substr(source, 4) AS INT) % 4
        |      WHEN 0 THEN 2 WHEN 1 THEN 1 WHEN 2 THEN 0 ELSE 1 END AS base,
        |    CASE CAST(substr(source, 4) AS INT) % 4
        |      WHEN 0 THEN 0.5 WHEN 1 THEN 0.0 WHEN 2 THEN 0.25 ELSE 0.75 END AS frac,
        |    (((((doc_id + 104729) % 4294967296) * 40503) % 4294967296) * 40503 % 4294967296 + 1)
        |      / 4294967297.0 AS u
        |  FROM documents),
        |r AS (
        |  SELECT doc_id, source,
        |    CAST(base + (CASE WHEN u < frac THEN 1 ELSE 0 END) AS BIGINT) AS rep_cnt
        |  FROM e)
        |SELECT doc_id, source, rep_cnt, CAST(rep AS BIGINT) AS rep
        |FROM (SELECT doc_id, source, rep_cnt, unnest(range(1, rep_cnt + 1)) AS rep FROM r) x
        |ORDER BY doc_id, rep""".stripMargin,
    "q_corpus_diff" ->
      """WITH old AS (
        |  SELECT doc_id, md5(text) AS old_md5 FROM documents WHERE doc_id % 11 <> 5),
        |nw AS (
        |  SELECT doc_id,
        |    md5(CASE WHEN doc_id % 13 = 2 THEN text || ' v2' ELSE text END) AS new_md5
        |  FROM documents WHERE doc_id % 17 <> 3)
        |SELECT doc_id, old_md5, new_md5,
        |  CASE WHEN old_md5 IS NULL THEN 'added'
        |       WHEN new_md5 IS NULL THEN 'removed'
        |       WHEN old_md5 <> new_md5 THEN 'changed'
        |       ELSE 'unchanged' END AS status
        |FROM old FULL OUTER JOIN nw USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
    "q_curriculum_order" ->
      s"""WITH $q4Cte,
        |c AS (
        |  SELECT doc_id,
        |    CASE WHEN q4 >= 7500 THEN 0 WHEN q4 >= 5000 THEN 1
        |         WHEN q4 >= 2500 THEN 2 ELSE 3 END AS stage,
        |    ((((doc_id + 7919) % 4294967296) * 40503 % 4294967296)
        |      * 40503 % 4294967296) % 8 AS shard,
        |    (((doc_id + 1299709) % 4294967296) * 40503 % 4294967296)
        |      * 40503 % 4294967296 AS draw
        |  FROM q)
        |SELECT doc_id, CAST(stage AS BIGINT) AS stage,
        |  CAST(shard AS BIGINT) AS shard,
        |  CAST(row_number() OVER (
        |    PARTITION BY stage, shard ORDER BY draw, doc_id) AS BIGINT) AS pos
        |FROM c ORDER BY stage, shard, pos""".stripMargin,
    "q_domain_reputation" ->
      s"""WITH $q4Cte,
        |s AS (SELECT site, CAST(count(*) AS BIGINT) AS n_site,
        |        CAST(sum(q4) AS BIGINT) AS sum_q4 FROM q GROUP BY site),
        |g AS (SELECT CAST(count(*) AS BIGINT) AS n_tot, CAST(sum(q4) AS BIGINT) AS q_tot FROM q)
        |SELECT q.doc_id, q.site, s.n_site, CAST(s.sum_q4 // s.n_site AS BIGINT) AS site_mq4,
        |  CASE WHEN s.sum_q4 * g.n_tot < g.q_tot * s.n_site THEN 'drop' ELSE 'keep' END AS verdict
        |FROM q JOIN s USING (site), g
        |ORDER BY q.doc_id""".stripMargin,
  )
}
