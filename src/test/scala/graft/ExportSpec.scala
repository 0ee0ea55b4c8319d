package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Export

/** The training-export verbs: shard manifest + on-disk writer, epoch-aware
  * mixture materialization, domain-reputation gate. Oracle hash checks live
  * in the driver gate; these specs pin the CONTRACTS — coverage, exactness
  * of the integer verdicts, and that the written files reproduce the
  * manifest. */
class ExportSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf0001

  test("shard export: total coverage, in-range shard ids, XOR fingerprint recomputable") {
    val docs = Tables.documents(spark, sf)
    val nDocs = docs.count()
    val m = Export.shardExport(spark, sf).collect()
    assert(m.map(_.getLong(1)).sum == nDocs, "every doc lands in exactly one shard")
    assert(m.forall(r => r.getLong(0) >= 0 && r.getLong(0) < Export.ShardCount))
    // deterministic: a rerun reproduces the manifest bit-for-bit
    val m2 = Export.shardExport(spark, sf).collect()
    assert(m.map(_.toSeq).toSeq == m2.map(_.toSeq).toSeq)
    // the fingerprint really is content-derived: XOR of per-doc 60-bit md5
    // prefixes, recomputed here independently of the operator's plan
    val fp = docs.select(col("doc_id"),
        conv(substring(md5(col("text")), 1, 15), 16, 10).cast("long").as("f"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val bySh = docs.select(col("doc_id")).collect().map(_.getLong(0))
      .groupBy(id => (((id + Export.ShardSalt) % 4294967296L) * 40503L % 4294967296L
        * 40503L % 4294967296L) % Export.ShardCount)
    m.foreach { r =>
      val want = bySh(r.getLong(0)).map(fp).reduce(_ ^ _)
      assert(r.getLong(6) == want, s"shard ${r.getLong(0)} fingerprint")
    }
  }

  test("writeShards: the files reproduce the manifest, rows are in deterministic order, rewrite is idempotent") {
    val out = java.nio.file.Files.createTempDirectory("shards").toString
    val manifest = Export.writeShards(spark, sf, out).collect().map(_.toSeq).toSeq
    val want = Export.shardExport(spark, sf).collect().map(_.toSeq).toSeq
    assert(manifest == want, "manifest recomputed FROM THE WRITTEN FILES matches the logical manifest")
    // Hive layout: one shard=N dir per non-empty shard
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("shard=")).sorted.toSeq
    assert(dirs.nonEmpty && dirs.forall(_.matches("shard=\\d")))
    // within one shard file, rows ride in the deterministic md5(doc_id) order
    val d0 = dirs.head
    val f0 = new java.io.File(s"$out/$d0").listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val ord = spark.read.parquet(f0.toString)
      .select(md5(col("doc_id").cast("string"))).collect().map(_.getString(0)).toSeq
    assert(ord == ord.sorted, s"in-file order not the md5 order in $d0")
    // a second export of the same corpus is bit-identical at the manifest level
    val out2 = java.nio.file.Files.createTempDirectory("shards2").toString
    assert(Export.writeShards(spark, sf, out2).collect().map(_.toSeq).toSeq == want)
  }

  test("epoch mix: per-source repeat counts follow (floor, frac) and the materialization is exact") {
    val rows = Export.epochMix(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // rep enumerates 1..rep_cnt exactly
    rows.groupBy(r => (r._1, r._3)).foreach { case ((id, cnt), g) =>
      assert(g.map(_._4).sorted.toSeq == (1L to cnt), s"doc $id reps")
    }
    val perDoc = rows.groupBy(_._1).map { case (id, g) => (id, g.head._2, g.head._3) }
    def idx(src: String) = src.drop(3).toInt % 4
    // identity sources: exactly one copy, no coin
    assert(perDoc.filter(d => idx(d._2) == 1).forall(_._3 == 1L))
    // 2.5-epoch sources: 2 or 3 copies, both coin outcomes present
    val up = perDoc.filter(d => idx(d._2) == 0).map(_._3).toSet
    assert(up.subsetOf(Set(2L, 3L)) && up.size == 2, s"2.5-epoch counts $up")
    // 0.25-epoch sources appear only as single copies, and the dropped docs
    // really are dropped: materialized docs < source docs
    val downDocs = Tables.documents(spark, sf)
      .where(substring(col("source"), 4, 10).cast("int") % 4 === 2).count()
    val downKept = perDoc.count(d => idx(d._2) == 2)
    assert(perDoc.filter(d => idx(d._2) == 2).forall(_._3 == 1L))
    assert(downKept > 0 && downKept < downDocs, s"$downKept of $downDocs kept")
  }

  test("corpus diff: every status branch live and exactly the simulated membership/edit rules") {
    val ids = Tables.documents(spark, sf).select(col("doc_id"))
      .collect().map(_.getLong(0)).toSet
    val got = Export.corpusDiff(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(3))).toMap
    val inEither = ids.filterNot(id => id % 11 == 5 && id % 17 == 3)
    assert(got.keySet == inEither, "one verdict per doc id in either snapshot")
    ids.foreach { id =>
      val want =
        if (id % 11 == 5 && id % 17 == 3) null // in neither snapshot — absent
        else if (id % 11 == 5) "added"
        else if (id % 17 == 3) "removed"
        else if (id % 13 == 2) "changed"
        else "unchanged"
      if (want == null) assert(!got.contains(id))
      else assert(got(id) == want, s"doc $id: ${got(id)} vs $want")
    }
    assert(got.values.toSet == Set("added", "removed", "changed", "unchanged"))
  }

  test("curriculum order: coverage, dense per-(stage,shard) positions, stage/shard consistency") {
    val docs = Tables.documents(spark, sf)
    val got = Export.curriculumOrder(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.map(_._1).toSet == docs.select("doc_id").collect().map(_.getLong(0)).toSet,
      "every doc gets exactly one curriculum slot")
    // positions are dense 1..n inside every (stage, shard) partition
    got.groupBy(t => (t._2, t._3)).foreach { case (k, rows) =>
      assert(rows.map(_._4).sorted.toSeq == (1L to rows.length.toLong), s"holes in $k")
    }
    // stage is exactly the fixed q4 threshold bucket (scalar replay of the
    // shared quality expression), shard agrees with the shard manifest draw
    val q4 = docs.select(col("doc_id"),
        round(operators.Text.qualityExpr * 10000, 0).cast("long").as("q4"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    def wantStage(q: Long): Long =
      if (q >= 7500) 0 else if (q >= 5000) 1 else if (q >= 2500) 2 else 3
    def knuthShard(id: Long): Long = {
      val m = 4294967296L
      ((id + Export.ShardSalt) % m) * 40503L % m * 40503L % m % Export.ShardCount
    }
    got.foreach { case (id, st, sh, _) =>
      assert(st == wantStage(q4(id)), s"doc $id stage")
      assert(sh == knuthShard(id), s"doc $id shard")
    }
    // the curriculum is non-degenerate (>1 stage populated) and rerun-stable
    assert(got.map(_._2).distinct.length > 1)
    val again = Export.curriculumOrder(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == again.toSeq)
  }

  test("domain reputation: total coverage and the integer verdict is exactly mean_site < mean_corpus") {
    val docs = Tables.documents(spark, sf)
    val got = Export.domainReputation(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getString(4)))
    assert(got.length == docs.count(), "one verdict row per doc")
    assert(got.map(_._5).toSet == Set("keep", "drop"), "both verdict branches live")
    // independent scalar replay of the whole verdict: per-doc fixed-point
    // quality from first principles, then the exact cross-multiply
    def round4(x: Double): Double =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val q4 = docs.select(col("doc_id"), col("source"), col("lang"), col("text"))
      .collect().map { r =>
        val text = r.getString(3)
        val nToks = text.trim.toLowerCase.split("\\s+").length.toDouble
        val nPunct = "[^a-z0-9\\s]".r.findAllIn(text).size.toDouble
        val q = round4(math.min(nToks / 100.0, 1.0) * (1.0 - nPunct / text.length))
        (r.getLong(0), s"${r.getString(1)}.example.com/${r.getString(2)}",
          math.round(q * 10000))
      }
    val bySiteQ = q4.groupBy(_._2)
    val nTot = q4.length.toLong
    val qTot = q4.map(_._3).sum
    got.groupBy(_._2).foreach { case (site, g) =>
      assert(g.map(x => (x._3, x._4, x._5)).toSet.size == 1, s"site $site rows disagree")
      val mine = bySiteQ(site)
      val (nSite, sumQ4) = (mine.length.toLong, mine.map(_._3).sum)
      assert(g.head._3 == nSite, s"site $site n_site")
      assert(g.head._4 == sumQ4 / nSite, s"site $site site_mq4")
      val wantVerdict = if (sumQ4 * nTot < qTot * nSite) "drop" else "keep"
      assert(g.head._5 == wantVerdict, s"site $site verdict")
    }
  }
}
