package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Search

/** At-rest keyword serving. The BM25 arithmetic is oracle-hash-checked in
  * the driver gate; these specs pin the INDEX lifecycle: directory-level
  * partition pruning on the probe, the append path reproducing a one-shot
  * build bit-for-bit (postings + stats-log deltas), and determinism. */
class SearchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf0001

  private def freshDir(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"kwidx_$tag").toFile
    d.deleteOnExit(); d.getAbsolutePath
  }

  test("probe prunes to the query terms' tb partitions at directory level") {
    val idx = freshDir("prune")
    Search.writeKeywordIndex(spark, sf, idx)
    val nBuckets = new java.io.File(s"$idx/postings").listFiles()
      .count(_.getName.startsWith("tb="))
    val probed = Search.probeKeywordIndex(spark, idx, Search.Queries, Search.TopK)
    // collect exactly ONCE, then read the executed plan (a second action
    // re-executes with cached listings and driver metrics report 0)
    val rows = probed.collect()
    assert(rows.length == Search.Queries.size * Search.TopK)
    val plan = probed.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*tb".r.findFirstIn(plan).isDefined, plan)
    // the workload's distinct buckets are fewer than the on-disk fan-out,
    // so pruning must cut the directory count actually scanned
    val wantBuckets = Search.Queries
      .flatMap(_._2.split("\\s+")).distinct.map(Search.tbOfStr).distinct.size
    assert(wantBuckets < nBuckets, s"fixture degenerate: $wantBuckets vs $nBuckets dirs")
    val scan = probed.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).find(_.contains("postings"))
    assert(scan.isDefined, plan)
  }

  test("append path reproduces the one-shot build bit-for-bit, stats log aggregates deltas") {
    val docs = Tables.documents(spark, sf)
    val oneShot = freshDir("full")
    Search.writeKeywordIndex(spark, sf, oneShot)
    val grown = freshDir("grown")
    Search.appendKeywordIndex(spark, grown, docs.where(col("source") =!= "src0"))
    // pre-append probe serves the partial corpus (its own exact stats)
    val partial = Search.probeKeywordIndex(spark, grown, Search.Queries, Search.TopK).collect()
    Search.appendKeywordIndex(spark, grown, docs.where(col("source") === "src0"))
    val after = Search.probeKeywordIndex(spark, grown, Search.Queries, Search.TopK)
      .collect().map(_.toSeq).toSeq
    val full = Search.probeKeywordIndex(spark, oneShot, Search.Queries, Search.TopK)
      .collect().map(_.toSeq).toSeq
    assert(after == full, "appended index diverges from the one-shot build")
    assert(partial.map(_.toSeq).toSeq != full, "fixture degenerate: src0 docs never rank")
    // the stats sidecar is an append-only delta log: one row per append,
    // aggregating to the exact corpus totals
    val log = spark.read.parquet(s"$grown/_statslog").collect()
    assert(log.length == 2)
    assert(log.map(_.getLong(0)).sum == docs.count())
    val wantSumDl = docs
      .select(size(split(lower(trim(col("text"))), "\\s+")).cast("long").as("dl"))
      .agg(sum(col("dl"))).head().getLong(0)
    assert(log.map(_.getLong(1)).sum == wantSumDl)
  }

  test("takedown hides a doc immediately; compaction leaves no statistical residue") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
    val idx = freshDir("life")
    Search.writeKeywordIndex(spark, sf, idx)
    val before = Search.probeKeywordIndex(spark, idx, Search.Queries, Search.TopK).collect()
    val victim = before.head.getLong(2) // query 0's top hit
    val victimDf = Seq(victim).toDF("doc_id")
    operators.Vectors.deleteFromIndex(spark, idx, victimDf)
    val after = Search.probeKeywordIndex(spark, idx, Search.Queries, Search.TopK).collect()
    assert(!after.exists(_.getLong(2) == victim), "tombstoned doc still ranks")
    assert(after.exists(r => r.getLong(0) == 0L && r.getLong(1) == 1L),
      "query 0 lost its whole result instead of re-ranking")
    // physical compaction: postings rewritten without the victim, stats
    // log rebuilt — from here the index must be BIT-IDENTICAL to a fresh
    // build over the surviving corpus
    Search.compactKeywordIndex(spark, idx)
    val cleanIdx = freshDir("clean")
    Search.appendKeywordIndex(spark, cleanIdx,
      docs.where(col("doc_id") =!= victim))
    val compacted = Search.probeKeywordIndex(spark, idx, Search.Queries, Search.TopK)
      .collect().map(_.toSeq).toSeq
    val clean = Search.probeKeywordIndex(spark, cleanIdx, Search.Queries, Search.TopK)
      .collect().map(_.toSeq).toSeq
    assert(compacted == clean, "compacted index diverges from a fresh victim-free build")
    assert(spark.read.parquet(s"$idx/postings")
      .where(col("doc_id") === victim).count() == 0, "victim rows survived compaction")
    assert(operators.Vectors.tombstonesOf(spark, idx).isEmpty, "tombstones not cleared")
    val st = spark.read.parquet(s"$idx/_statslog").collect()
    assert(st.length == 1 && st.head.getLong(0) == docs.count() - 1)
  }

  test("hybrid RRF: fusion arithmetic replays from the leg ranks, legs both live, probes excluded") {
    val got = Search.hybridRrf(spark, sf).collect()
    assert(got.length == Search.HybridProbes.size * Search.HybridK)
    got.foreach { r =>
      val rl = if (r.isNullAt(4)) None else Some(r.getLong(4))
      val rs = if (r.isNullAt(5)) None else Some(r.getLong(5))
      // BigDecimal.decimal = valueOf semantics, matching Spark's round()
      val want = BigDecimal.decimal(
          rl.map(x => 1.0 / (Search.RrfK + x)).getOrElse(0.0) +
          rs.map(x => 1.0 / (Search.RrfK + x)).getOrElse(0.0))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getDouble(3) - want) < 1e-9,
        s"rrf of (${r.getLong(0)}, ${r.getLong(2)}): ${r.getDouble(3)} vs $want")
      assert(rl.nonEmpty || rs.nonEmpty, "a fused row with no leg")
      assert(!Search.HybridProbes.contains(r.getLong(2)), "a probe retrieved itself")
    }
    // fusion is meaningful: some results carry both legs, and within each
    // query the rrf score is non-increasing with rank
    assert(got.exists(r => !r.isNullAt(4) && !r.isNullAt(5)), "no doc ranked by both legs")
    got.groupBy(_.getLong(0)).foreach { case (qid, rows) =>
      assert(rows.map(_.getLong(1)).sorted.toSeq == (1L to Search.HybridK.toLong))
      val byRank = rows.sortBy(_.getLong(1)).map(_.getDouble(3))
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b }, s"query $qid order")
    }
    val again = Search.hybridRrf(spark, sf).collect()
    assert(got.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("probe is rerun-deterministic and ranks are dense 1..k per query") {
    val got = Search.keywordTopkAtRest(spark, sf).collect()
    val again = Search.keywordTopkAtRest(spark, sf).collect()
    assert(got.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
    Search.Queries.foreach { case (qid, _) =>
      val rs = got.filter(_.getLong(0) == qid).map(_.getLong(1)).toSeq
      assert(rs == (1L to Search.TopK.toLong), s"query $qid ranks $rs")
    }
    // scores within a query are non-increasing with rank
    got.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val byRank = rows.sortBy(_.getLong(1)).map(_.getDouble(3))
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
    }
  }
}
