package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.streaming.Streams

/** Streaming latency evidence (VERDICT r13 #7): the ~20 streaming twins
  * have replay-EQUALITY specs but no committed latency numbers — this main
  * drives the stateful query family and the exactly-once ingest/curate
  * sinks with rate-limited micro-batches and emits per-batch wall time,
  * input rows, and state-store size as ONE JSON line (also written to the
  * `out` arg, committed per round as bench/stream_r{N}.json).
  *
  * Method: the sf tables are re-sharded into [[Shards]] time-ordered files
  * (repartitionByRange on event time / doc id) and replayed through the
  * file source at `maxFilesPerTrigger=1` — one file per trigger, so
  * arrival order tracks event time and the watermark actually ADVANCES
  * between batches: the reported state rows reflect eviction behavior, not
  * a single-batch pile-up. Per-batch numbers come from the engine's own
  * StreamingQueryProgress (triggerExecution duration, stateOperators
  * totals), not wall-clock guesses. */
object StreamBench {

  val Shards = 16

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption
      .getOrElse(sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf1"))
    val outPath = if (args.length > 1) args(1) else "bench/stream_last.json"
    // r16: optional comma-separated pipeline filter (3rd arg) — the
    // single-pipeline iteration loop for A/B legs, like graft.Time for
    // batch keys. Default (absent/empty) runs the full committed surface.
    val only: Set[String] =
      if (args.length > 2 && args(2).nonEmpty) args(2).split(',').toSet
      else Set.empty
    val spark = GraftSession.create(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    spark.sparkContext.setLogLevel("WARN")
    val scratch = java.nio.file.Files
      .createTempDirectory("graft_streambench").toString

    Tables.events(spark, sfDir)
      .repartitionByRange(Shards, col("ts")).sortWithinPartitions(col("ts"))
      .write.mode("overwrite").parquet(s"$scratch/events")
    Tables.documents(spark, sfDir)
      .repartitionByRange(Shards, col("doc_id")).sortWithinPartitions(col("doc_id"))
      .write.mode("overwrite").parquet(s"$scratch/docs")
    // the twins that take an sfDir (media screens, scrub/chunk) build
    // their indexes/models from the REAL sf layout and replay the sharded
    // docs dir one file per trigger via the graft.stream.* conf overrides
    // (the sf layout's documents.parquet is one flat file = one batch)
    spark.conf.set("graft.stream.docsDir", s"$scratch/docs")
    spark.conf.set("graft.stream.maxFilesPerTrigger", "1")
    val corpus = sfDir

    def shardStream(dir: String): DataFrame =
      spark.readStream.schema(spark.read.parquet(dir).schema)
        .option("maxFilesPerTrigger", "1").parquet(dir)

    def fmt(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)

    /** Run one pipeline to completion; report per-batch engine metrics. */
    def run(name: String,
        start: () => org.apache.spark.sql.streaming.StreamingQuery): String = {
      if (only.nonEmpty && !only(name)) return ""
      val t0 = System.nanoTime()
      val q = start()
      try q.processAllAvailable() finally q.stop()
      val wall = (System.nanoTime() - t0) / 1e9
      val prog = q.recentProgress.toSeq.filter(_.numInputRows > 0)
      val ms = prog.map(_.durationMs.getOrDefault("triggerExecution", 0L).toLong)
        .sorted
      val rows = prog.map(_.numInputRows).sum
      val state = prog.lastOption.map(_.stateOperators.toSeq).getOrElse(Seq.empty)
      val stateRows = state.map(_.numRowsTotal).sum
      val stateBytes = state.map(_.memoryUsedBytes).sum
      val p50 = if (ms.isEmpty) 0L else ms(ms.length / 2)
      System.err.println(s"[stream-bench] $name: ${prog.length} batches, " +
        s"${fmt(wall)} s wall, p50 ${p50} ms/batch, state $stateRows rows")
      s""""$name":{"n_batches":${prog.length},"wall_s":${fmt(wall)},""" +
        s""""rows_in":$rows,"batch_ms_p50":$p50,""" +
        s""""batch_ms_max":${ms.lastOption.getOrElse(0L)},""" +
        s""""batch_ms":[${ms.mkString(",")}],""" +
        s""""state_rows":$stateRows,"state_bytes":$stateBytes}"""
    }

    def memSink(df: DataFrame, name: String, mode: String) = () =>
      df.writeStream.outputMode(mode).format("memory").queryName(name)
        .option("checkpointLocation", s"$scratch/ck_$name").start()

    val parts = Seq(
      // watermarked stateful aggregations — state is windowed counts
      run("tumbling_counts",
        memSink(Streams.tumblingCounts(shardStream(s"$scratch/events")),
          "tumbling_bench", "update")),
      // session windows only support append (watermark-closed emission)
      run("session_counts",
        memSink(Streams.sessionCounts(shardStream(s"$scratch/events")),
          "session_bench", "append")),
      run("stateful_dedup",
        memSink(Streams.dedupStream(shardStream(s"$scratch/events")),
          "dedup_bench", "append")),
      // watermarked stream-stream join — state is the buffered sides,
      // evicted as the per-batch watermark passes the join window
      run("attribution_join",
        memSink(Streams.attributionStreamOuter(shardStream(s"$scratch/events")),
          "attr_bench", "append")),
      // exactly-once index ingest (batch-id-partitioned sink)
      run("minhash_ingest", () =>
        shardStream(s"$scratch/docs").writeStream
          .option("checkpointLocation", s"$scratch/ck_ingest")
          .foreachBatch {
            (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
              Streams.ingestMinhashBatch(b.sparkSession, s"$scratch/ingest_idx", b, id)
          }.start()),
      // incremental curation: gate + dedup-within + at-rest screen + ingest
      run("curate_ingest", () =>
        shardStream(s"$scratch/docs").writeStream
          .option("checkpointLocation", s"$scratch/ck_curate")
          .foreachBatch {
            (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
              Streams.curateMicroBatch(b.sparkSession, s"$scratch/curate_idx",
                s"$scratch/curate_out", b, id)
          }.start()),
      // real-decode media screens (VERDICT r14 #9): each probe synthesizes
      // and REALLY decodes its media blob inside the stream map, then hits
      // the persisted at-rest index — the expensive per-row case; flat
      // per-batch cost is the claim. The ensureIndex build happens at plan
      // construction, outside the timed stream.
      run("dhash_screen",
        memSink(Streams.dhashScreenStream(spark, corpus).toDF(),
          "dhash_bench", "append")),
      run("afp_screen",
        memSink(Streams.afpScreenStream(spark, corpus).toDF(),
          "afp_bench", "append")),
      run("vsig_screen",
        memSink(Streams.vsigScreenStream(spark, corpus).toDF(),
          "vsig_bench", "append")),
      // scrub/chunk maps — stateless typed kernels over the doc stream
      run("span_scrub",
        memSink(Streams.spanScrubStream(spark, corpus).toDF(),
          "scrub_bench", "append")),
      run("chunk_tokens",
        memSink(Streams.chunkStream(spark, corpus),
          "chunk_bench", "append")))

    val line = s"""{"metric":"stream_bench","sf":"$sfDir","shards":$Shards,""" +
      s""""pipelines":{${parts.filter(_.nonEmpty).mkString(",")}}}"""
    try {
      Option(java.nio.file.Paths.get(outPath).getParent)
        .foreach(d => java.nio.file.Files.createDirectories(d))
      java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath), line + "\n")
    } catch { case _: Throwable => () }
    println(line)
    // scratch hygiene: the re-shards + checkpoints are bench-local
    try org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(scratch))
    catch { case _: Throwable => () }
    spark.stop()
  }
}
