package graft

import java.io.{File, PrintWriter}

import org.apache.spark.sql.SparkSession

/** Dumps `explain("formatted")` for the headline queries to PLANS.md — the
  * committed evidence that the plans are the ones we want at 100 TB:
  * pushed filters + pruned read schemas, broadcast dimension joins,
  * map-side partial aggregation, TakeOrderedAndProject, the custom
  * TopKPerGroup operator, and native expressions inside WholeStageCodegen
  * spans.
  *
  * Usage: `sbt "runMain graft.Plans [sfDir] [outFile]"`.
  */
object Plans {
  private val headline: Seq[(String, String)] = Seq(
    "q_scan_project_filter" ->
      "filter + projection reach the parquet scan (PushedFilters, pruned ReadSchema)",
    "q_pricing_summary" ->
      "map-side partial aggregation before the single shuffle",
    "q_join_multiway" ->
      "dimension tables broadcast; no shuffle on the small sides",
    "q_join_range" ->
      "multi-level grid range join: int64 level roll-ups, distinct-interval cover equi-join + bounded edge join — no pair materialization, every term linear per decade",
    "q_sort_limit" ->
      "TakeOrderedAndProject — per-partition top-k, no global sort",
    "q_topk_per_group" ->
      "custom TopKPerGroup operator: partial/final heaps around one shuffle, no Window",
    "q_tfidf" ->
      "two partial-agg shuffles + broadcast scalar + custom top-k — tf-idf at scale",
    "q_sample_per_group" ->
      "deterministic md5-ordered sampling through the heap operator — no per-group sort",
    "q_cosine_topk" ->
      "native vec_dot expression inside the codegen span; broadcast probe",
    "q_minhash_lsh" ->
      "banded LSH: equi-join on (band, key), pairs dedup'd before scoring",
    "q_late_data_policy" ->
      "groupBy + broadcast back — no low-cardinality window funnel",
    "q_embed_neardup_srp" ->
      "SRP-LSH planted-recall contract: banded candidate equi-join, ids-only dedup, fused vec_cosine verify, left-join probe of the planted pair set (oracle-graduated r12)",
    "q_dedup_incremental" ->
      "prefix-filtered set-similarity join: df-ordered prefixes, token equi-join, exact verify on candidates only",
    "q_event_funnel" ->
      "ordered funnel as chained keyed min-aggregations — no per-user sequence sort",
    "q_heavy_hitters" ->
      "Misra-Gries sketch pass + broadcast semi-filtered exact recount — no full term shuffle",
    "q_source_overlap" ->
      "inverted-index overlap: one collect_set shuffle keyed by shingle, typed pair expansion, no doc×doc join",
    "q_knn_classify" ->
      "broadcast probes, fused vec_cosine scan, two heap top-k compositions (neighbors, vote argmax)",
    "q_lm_score" ->
      "self-trained bigram LM: two keyed partial aggregates + bigram-keyed scoring join — text never shuffles",
    "q_weighted_sample" ->
      "A-Res weighted sampling on the heap operator — overflow-free integer draw, no per-group sort",
    "q_corpus_curate" ->
      "flagship curation pipeline: id-keyed semi/anti joins over the per-stage plans (hash dedup, CC, token-stats chain, broadcast benchmark side, bigram-keyed LM join), heap top-k sample",
    "q_join_multiway_bucketed" ->
      "bucketed-at-rest fact join: co-located SortMergeJoin, zero Exchange on the fact keys",
    "q_ann_pq" ->
      "PQ ANN: ADC over 8-byte codes (TakeOrdered candidates), exact refine semi-joined on candidate ids; emits the memoized exact-referee contract rows (oracle-graduated r12)",
    "q_simhash_dedup_reps" ->
      "bounded near-dup verdicts: star-contracted candidate edges (distinct-signature block join + linear rep stars) into CC, no materialized pair list",
    "q_pii_scrub" ->
      "PII redaction: codegen'd regexp count/replace in one narrow projection, map-only until the presentation sort",
    "q_substring_dedup" ->
      "span-level dedup: typed shingle pass, span-keyed partial counts joined back, per-doc verdicts — text never shuffles, output Θ(docs)",
    "q_ann_ivfpq_at_rest" ->
      "IVFADC serving path: partition-pruned cell scan over 8-byte residual codes, ADC TakeOrdered, pushed-down IN refine; emits the memoized exact-referee contract rows (oracle-graduated r12)",
    "q_neardup_keep_best" ->
      "near-dup canonicalization: contracted CC labels joined to the scored corpus, heap top-k at k=1 per cluster — no per-cluster sort, Θ(clusters) output",
    "q_bloom_dedup" ->
      "bloom ingest screen: broadcast bloom prefilter in the scan, exact confirm anti-join only on the positive sliver",
    "q_dsir_weights" ->
      "DSIR importance weights: Θ(B)-row bucket model broadcast to the scoring join — the corpus side shuffles only (doc, bucket, count) triples",
    "q_minhash_screen_at_rest" ->
      "at-rest near-dup screen: incoming batch signs itself, probes the persisted band index, verifies on the signature table — at-rest text never scanned",
    "q_simhash_screen_at_rest" ->
      "pigeonhole at-rest screen: block-key probe join with denormalized signatures — codegen bit_count Hamming filter directly on the join output, no second signature join",
    "q_event_attribution" ->
      "stream-stream-join shape in batch: user-keyed equi-join with the time bound as a residual predicate — Θ(pairs), never a cross product",
    "q_join_full_outer" ->
      "full outer SMJ whose join key IS both sides' grouping key — the aggregation partitioning is reused, no third Exchange",
    "q_chunk_tokens" ->
      "overlapping token chunker: one typed flatMap over the documents scan, codegen'd md5 projection, no shuffle before the presentation sort",
    "q_unicode_normalize" ->
      "unicode canonicalization: map-only stage (typed NFC map + codegen'd regex/md5 projection), no shuffle before the presentation sort",
    "q_join_cross" ->
      "explicit cross join: BroadcastNestedLoopJoin over metadata-bounded sides (grid construction) — the only legitimate cross-join shape at scale",
    "q_simhash_dedup" ->
      "bounded nearest-m re-contract: distinct-sig block join (bit_count codegen) + TopKPerGroup heap assembly — Θ(m·docs) output, no window sort, no pair materialization",
    "q_embed_neardup" ->
      "bounded nearest-m re-contract: distinct-embedding contraction + blocked exact kernel over reps + TopKPerGroup heap assembly",
    "q_semantic_dedup" ->
      "SemDeDup: coarse-cell multi-probe restricted exact kernel + star contraction + per-doc verdict tail; emits the exact-closure verdicts with pinned soundness/recall bounds (oracle-graduated r12)",
    "q_bpe_tokenize" ->
      "BPE token accounting: vocab-level N stacked codegen replaces (no iterative jobs after the memoized training) + word join + per-doc aggregate",
    "q_curate_batch" ->
      "incremental-curation batch decision: one shared gate/exact-rep/near-drop relation — id-keyed joins over the banded candidate kernel, Θ(batch) output",
    "q_audio_features" ->
      "real-codec audio framing: one typed flatMap (WAV decode + windowed features) inside the documents scan, no shuffle before the presentation sort",
    "q_image_dedup" ->
      "perceptual-hash image dedup: per-blob decode+dHash map, one hash-shuffle groupBy on the 64-bit signature, family attach join — Θ(docs)",
    "q_shard_export" ->
      "deterministic export manifest: map-side shard hash + 60-bit md5 fingerprint, one map-side-combined ShardCount-row aggregate — text never shuffles",
    "q_epoch_mix" ->
      "epoch-mix materialization: map-only CASE targets + portable coin + bounded sequence explode — no shuffle before the presentation sort",
    "q_domain_reputation" ->
      "site reputation gate: Θ(sites) partial-agg broadcast back over the doc scan, integer cross-multiply verdict — the doc side never shuffles",
    "q_corpus_diff" ->
      "snapshot reconciliation: both sides pre-hashed to (id, md5) before the full outer SMJ — 40 bytes per doc shuffle, text never moves",
    "q_domain_pagerank" ->
      "link-graph power iteration: one Θ(docs) edge pass map-side-combined to Θ(sites²), then 3 fixed steps each joining the cached edge table to a broadcast rank vector — text never enters the graph",
    "q_curriculum_order" ->
      "curriculum manifest: pure per-row stage/shard/draw, one window per (stage, shard) — partition count stages×shards, size = the per-shard export sort the writer needs anyway; no global sort",
    "q_hybrid_rrf" ->
      "hybrid retrieval: lexical leg Θ(df of probe terms) broadcast-joined, semantic leg broadcast-probe fused cosine, RRF = full outer join of two Θ(probes·topN) relations — no corpus product anywhere",
    "q_keyword_topk_at_rest" ->
      "at-rest keyword serving: probe prunes to the query terms' tb= partition dirs (driver-enumerated crc32 buckets), Θ(df) scoring rows, broadcast stats/df/query joins, heap-lowered per-query top-k — no corpus scan",
    "q_video_scenes" ->
      "video shot detection: one typed flatMap (container demux + per-frame ImageIO decode + two-frame sliding madiff) inside the documents scan — frames never leave their blob's task, no shuffle before the presentation sort",
    "q_video_dedup" ->
      "perceptual video dedup: per-blob decode+keyframe-dHash-XOR map, one hash-shuffle window on the 17-byte signature — the imageDedup plan shape, Θ(videos)",
    "q_topic_mix" ->
      "topic mix: typed nearest-pinned-centroid map (no shuffle), id equi-join, Θ(k)-row map-side-combined aggregate + 1-row broadcast total crossJoin",
    "q_hybrid_rrf_indexed" ->
      "indexed hybrid retrieval: tb=-pruned postings (PartitionFilters) + cluster=-pruned IVF scans — both legs at-rest; emits the memoized brute fused contract with the per-probe agreement bound (oracle-graduated r12)",
    "q_video_scenes_avi" ->
      "standard-container video: one typed flatMap (RIFF/AVI demux + per-frame real PNG decode + sliding madiff) inside the documents scan — same shape as the GVID leg, frames never leave their task",
    "q_html_strip" ->
      "HTML extraction: one typed map (page synthesis + parse + link-density classification) with a codegen'd md5 projection — map-only until the presentation sort",
    "q_hybrid_rrf_indexed_fixed" ->
      "oracle-graduated indexed hybrid: tb=-pruned postings + cell=-pruned fixed-IVF scan (integer L2 typed map) — the hash-certified at-rest fused serving path",
    "q_hybrid_rrf_pq_fixed" ->
      "fixed-PQ hybrid: ADC scan of the persisted 8-byte codes table under broadcast lookup tables + the shared at-rest lex leg — the 32×-less-I/O fused mode",
    "q_span_scrub_l20" ->
      "≥20-token span dedup: the width-parameterized shingle stream (same Θ(tokens) plan as the K=5 rung), dup-keyed aggregate, start offsets back to the doc, stateless rebuild",
    "q_perplexity_buckets_sampled" ->
      "sampled-cutpoint perplexity buckets: the per-language window runs on the hash-sample only; assignment is a broadcast threshold map join — no corpus-wide rank",
  )

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val out = if (args.length > 1) args(1) else "PLANS.md"
    val spark = SparkSession.builder()
      .appName("graft-plans").master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // explicit UTF-8: the default-charset PrintWriter mangled the em-dash /
    // Greek glyphs in the descriptions to '?' under an ASCII default locale
    val w = new PrintWriter(new File(out), "UTF-8")
    try {
      w.println("# PLANS — formatted physical plans of the headline queries")
      w.println()
      w.println(s"Generated by `graft.Plans` on `$sfDir` (regenerate: " +
        "`sbt \"runMain graft.Plans\"`). What to look for is noted per query;")
      w.println("PlanSpec asserts the load-bearing properties so they cannot rot.")
      headline.foreach { case (name, why) =>
        val df = SparkEntry.queries(name)(spark, sfDir)
        df.count() // materialize so AQE settles its final plan
        w.println()
        w.println(s"## $name")
        w.println()
        w.println(s"_${why}_")
        w.println()
        w.println("```")
        w.println(df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
        w.println("```")
      }
    } finally w.close()
    spark.stop()
    println(s"wrote $out")
  }
}
