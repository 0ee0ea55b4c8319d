package graft

import org.apache.spark.sql.functions._
import graft.operators.{Audio, DataFp, Multimodal, Search, Vectors, Video}

/** Θ(batch) ingest-economics measurement for append-aware index vintage
  * evolution (VERDICT r13 #1 "Done ="): clone an sf dir's corpus, time the
  * COLD index build over the full corpus, append a small delta (a second
  * sf dir's rows, ids offset past the corpus maximum), and time
  * `ensureIndex` again — the append path must cost Θ(batch), and a rebuild
  * (the pre-r14 behavior, Θ(corpus) on ANY corpus change) is a loud
  * failure, not a silent number.
  *
  * r15 (VERDICT r14 #5): ALL ELEVEN ensureIndex kinds are measured through
  * the same throw-on-rebuild harness — the three r14 originals (vsig /
  * minhash / ivf) plus simhash, dhash, afp, keyword (the most valuable
  * append to prove: 145 s cold at sf100), pq, ivfpq and both fixed-codebook
  * twins — and a DELETE leg: Θ(deletes) tombstone takedown plus the
  * Θ(corpus) offline compaction, on the three layouts with dedicated
  * compaction verbs (keyword / minhash / ivf).
  *
  * Usage: runMain graft.AppendBench <corpusSf> <deltaSf> [outJson]
  * (e.g. /tmp/sf10 /root/testdata/sf0.1 bench/append_r15.json) */
object AppendBench {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: AppendBench <corpusSf> <deltaSf> [out]")
    val corpusSf = args(0)
    val deltaSf = args(1)
    val outPath = if (args.length > 2) args(2) else "bench/append_last.json"
    val spark = GraftSession.create(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    spark.sparkContext.setLogLevel("WARN")

    val d = java.nio.file.Files.createTempDirectory("graft_appendbench").toString
    spark.read.parquet(s"$corpusSf/documents.parquet")
      .write.parquet(s"$d/documents.parquet")
    spark.read.parquet(s"$corpusSf/embeddings.parquet")
      .write.parquet(s"$d/embeddings.parquet")
    val nDocs = spark.read.parquet(s"$d/documents.parquet").count()
    val nVecs = spark.read.parquet(s"$d/embeddings.parquet").count()
    val maxDoc = spark.read.parquet(s"$d/documents.parquet")
      .agg(max("doc_id")).head.getLong(0)
    val maxVec = spark.read.parquet(s"$d/embeddings.parquet")
      .agg(max("vec_id")).head.getLong(0)

    def fmt(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    val kinds = Seq[(String, String => Unit)](
      ("vsig", p => Video.writeVsigIndex(spark, d, p)),
      ("minhash", p => Vectors.writeMinhashIndex(spark, d, p)),
      ("ivf", p => Vectors.writeIvfIndex(spark, d, p)),
      ("simhash", p => Vectors.writeSimhashIndex(spark, d, p)),
      ("dhash", p => Multimodal.writeDhashIndex(spark, d, p)),
      ("afp", p => Audio.writeAfpIndex(spark, d, p)),
      (Search.KeywordKind, p => Search.writeKeywordIndex(spark, d, p)),
      ("pq", p => Vectors.writePqIndex(spark, d, p)),
      ("ivfpq", p => Vectors.writeIvfPqIndex(spark, d, p)),
      ("ivf_fixed", p => Vectors.writeIvfFixedIndex(spark, d, p)),
      ("pq_fixed", p => Vectors.writePqFixedIndex(spark, d, p)))

    // cold full-corpus builds
    val builds = kinds.map { case (kind, build) =>
      DataFp.invalidate()
      val (_, s) = timed(Vectors.ensureIndex(spark, kind, d)(build))
      System.err.println(s"[append-bench] $kind cold build: ${fmt(s)} s")
      kind -> s
    }.toMap

    // append-only delta: the deltaSf rows with ids offset past the corpus
    val deltaDocs = spark.read.parquet(s"$deltaSf/documents.parquet")
      .withColumn("doc_id", col("doc_id") + lit(maxDoc + 1L))
    val deltaVecs = spark.read.parquet(s"$deltaSf/embeddings.parquet")
      .withColumn("vec_id", col("vec_id") + lit(maxVec + 1L))
    val nDeltaDocs = deltaDocs.count()
    val nDeltaVecs = deltaVecs.count()
    deltaDocs.write.mode("append").parquet(s"$d/documents.parquet")
    deltaVecs.write.mode("append").parquet(s"$d/embeddings.parquet")

    // evolve: the build lambda throwing = a rebuild happened = FAIL loudly
    val appends = kinds.map { case (kind, _) =>
      DataFp.invalidate()
      val (_, s) = timed(Vectors.ensureIndex(spark, kind, d) { p =>
        throw new IllegalStateException(
          s"append-only delta triggered a REBUILD for $kind (build($p))")
      })
      System.err.println(s"[append-bench] $kind append: ${fmt(s)} s")
      kind -> s
    }.toMap

    // DELETE leg (VERDICT r14 #5): takedown 100 corpus ids from the three
    // layouts with dedicated compaction verbs. The tombstone append is
    // Θ(deletes) — no index read; compaction is the deliberate Θ(corpus)
    // maintenance rewrite. The evolved (appended) indexes are reused.
    val nDeletes = 100
    val victims = spark.read.parquet(s"$d/documents.parquet")
      .select(col("doc_id")).orderBy(col("doc_id")).limit(nDeletes)
      .persist()
    victims.count()
    val delKinds = Seq[(String, String => Unit)](
      (Search.KeywordKind, dir => Search.compactKeywordIndex(spark, dir)),
      ("minhash", dir => Vectors.compactMinhashIndex(spark, dir)),
      ("ivf", dir => Vectors.compactIvfIndex(spark, dir)))
    val deletes = delKinds.map { case (kind, compact) =>
      val dir = Vectors.ensureIndex(spark, kind, d) { p =>
        throw new IllegalStateException(s"delete leg rebuilt $kind ($p)") }
      val (_, delS) = timed(Vectors.deleteFromIndex(spark, dir, victims))
      val (_, compS) = timed(compact(dir))
      System.err.println(
        s"[append-bench] $kind delete: ${fmt(delS)} s, compact: ${fmt(compS)} s")
      kind -> (delS, compS)
    }.toMap

    val per = kinds.map { case (kind, _) =>
      val b = builds(kind); val a = appends(kind)
      s""""$kind":{"build_s":${fmt(b)},"append_s":${fmt(a)},""" +
        s""""speedup":${fmt(b / math.max(a, 1e-9))}}"""
    }.mkString(",")
    val del = delKinds.map { case (kind, _) =>
      val (delS, compS) = deletes(kind)
      s""""$kind":{"tombstone_s":${fmt(delS)},"compact_s":${fmt(compS)}}"""
    }.mkString(",")
    val line = s"""{"metric":"append_bench","corpus":"$corpusSf",""" +
      s""""delta":"$deltaSf","corpus_docs":$nDocs,"corpus_vecs":$nVecs,""" +
      s""""delta_docs":$nDeltaDocs,"delta_vecs":$nDeltaVecs,""" +
      s""""n_deletes":$nDeletes,"kinds":{$per},"delete":{$del}}"""
    try {
      Option(java.nio.file.Paths.get(outPath).getParent)
        .foreach(p => java.nio.file.Files.createDirectories(p))
      java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath), line + "\n")
    } catch { case _: Throwable => () }
    println(line)
    try org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(d))
    catch { case _: Throwable => () }
    spark.stop()
  }
}
