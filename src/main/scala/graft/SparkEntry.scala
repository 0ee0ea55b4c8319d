package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.{Audio, Events, Export, Graph, Multimodal, RefOps, Relational, Search, Text, Vectors, Video}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is assembled from the operator modules; every key has a matching
  * DuckDB `oracleSql` entry unless the operator is non-SQL-expressible
  * (binary blobs, LSH, ingest), in which case the driver records a weaker
  * rows-only check.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's whole soul in one plan (SURVEY §7.2): Fortran ingest →
    * tensor reconstruction → 27-point subsample with monotone dedup →
    * gather join → per-point series encode (normalize/quantize/zlib) →
    * decode-verify stats. */
  def entry(spark: SparkSession): DataFrame =
    RefOps.refSgtPipeline(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ Events.queries ++ RefOps.queries ++
      Text.queries ++ Vectors.queries ++ Multimodal.queries ++
      Audio.queries ++ Video.queries ++ Export.queries ++ Graph.queries ++
      Search.queries ++ operators.Html.queries ++
      operators.CorpusCurate.queries ++ operators.Bpe.queries ++
      Map(
        "q_dedup_clusters" ->
          ((s: SparkSession, d: String) => operators.DedupCluster.clusters(s, d, 0.5)),
        "q_dedup_clusters_exact" ->
          ((s: SparkSession, d: String) => operators.DedupCluster.clustersExact(s, d)),
        "q_simhash_dedup_reps" ->
          ((s: SparkSession, d: String) => operators.DedupCluster.simhashReps(s, d)),
        "q_minhash_dedup_reps" ->
          ((s: SparkSession, d: String) => operators.DedupCluster.minhashReps(s, d)),
        "q_embed_dedup_reps" ->
          ((s: SparkSession, d: String) => operators.DedupCluster.embedReps(s, d)),
        "q_semantic_dedup" ->
          ((s: SparkSession, d: String) => operators.DedupCluster.semanticReps(s, d)),
        "q_semantic_dedup_fixed" ->
          ((s: SparkSession, d: String) => operators.DedupCluster.semanticFixedReps(s, d)),
        "q_neardup_keep_best" ->
          ((s: SparkSession, d: String) => operators.DedupCluster.keepBest(s, d)))

  /** For each key in `queries`, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys → rows-only check. */
  def oracleSql: Map[String, String] =
    Relational.oracles ++ Events.oracles ++ RefOps.oracles ++
      Text.oracles ++ Vectors.oracles ++ Multimodal.oracles ++
      Audio.oracles ++ Video.oracles ++ Export.oracles ++ Graph.oracles ++
      Search.oracles ++ operators.Html.oracles ++
      operators.CorpusCurate.oracles ++ operators.Bpe.oracles ++
      operators.DedupCluster.oracles
}
