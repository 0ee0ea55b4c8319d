package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.DedupCluster

class DedupClusterSpec extends AnyFunSuite {

  test("connected components on a known graph (two chains + one clique)") {
    val spark = TestSpark.spark
    import spark.implicits._
    // components: {1,2,3,4} (chain), {10,11,12} (triangle), {20,21} (edge)
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L), (11L, 12L), (10L, 12L), (20L, 21L)).toDF("id_a", "id_b")
    val comp = DedupCluster.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Seq(1L, 2L, 3L, 4L).forall(comp(_) == 1L))
    assert(Seq(10L, 11L, 12L).forall(comp(_) == 10L))
    assert(Seq(20L, 21L).forall(comp(_) == 20L))
  }

  test("long chain converges on the distributed path (driverThreshold=0)") {
    val spark = TestSpark.spark
    import spark.implicits._
    val chain = (0L until 40L).sliding(2).map(s => (s(0), s(1))).toSeq
      .toDF("id_a", "id_b")
    val comp = DedupCluster.connectedComponents(chain, driverThreshold = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((0L until 40L).forall(comp(_) == 0L))
  }

  test("distributed CC exits with zero block-manager residue (session health)") {
    val spark = TestSpark.spark
    import spark.implicits._
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val chain = (0L until 60L).sliding(2).map(s => (s(0), s(1))).toSeq
      .toDF("id_a", "id_b")
    val out = DedupCluster.connectedComponents(chain, driverThreshold = 0)
    // consume the result fully — the steady-state a caller leaves behind
    val comp = out.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((0L until 60L).forall(comp(_) == 0L))
    // every per-round localCheckpoint, the final converged snapshot, and
    // both edge persists must be released by exit: lingering checkpoint
    // blocks measurably degrade UNRELATED queries in a long session
    // (PERF.md, r11 verdict #2)
    val lingering = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(lingering.isEmpty, s"lingering persisted RDDs: $lingering")
  }

  test("driver and distributed paths agree") {
    val spark = TestSpark.spark
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val pairs = (1 to 120).map(_ => (rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
      .filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .distinct.toDF("id_a", "id_b")
    val fast = DedupCluster.connectedComponents(pairs)
      .orderBy("id").collect().toSeq
    val dist = DedupCluster.connectedComponents(pairs, driverThreshold = 0)
      .orderBy("id").collect().toSeq
    assert(fast == dist && fast.nonEmpty)
  }

  test("exact clustering equals an independent union-find over the exact pairs") {
    val spark = TestSpark.spark
    import org.apache.spark.sql.functions.col
    val pairs = graft.operators.Vectors.embedNeardupPairs(spark, TestSpark.sf0001)
      .select(col("id_a"), col("id_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x; while (parent.getOrElse(r, r) != r) r = parent(r); r
    }
    pairs.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    val want = parent.keys.toSeq.map(k => (find(k), k)).groupBy(_._1)
      .map { case (c, ms) => (c, ms.size.toLong, ms.map(_._2).min) }
      .toSeq.sortBy(_._1)
    val got = DedupCluster.clustersExact(spark, TestSpark.sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == want)
  }

  test("simhash reps verdict is consistent with the simhash pair list") {
    val spark = TestSpark.spark
    import org.apache.spark.sql.functions.col
    val reps = DedupCluster.simhashReps(spark, TestSpark.sf0001).collect()
    val nDocs = Tables.documents(spark, TestSpark.sf0001).count()
    // bounded-output contract: exactly one verdict row per document
    assert(reps.length.toLong == nDocs)
    val rep = reps.map(r => r.getLong(0) -> r.getLong(1)).toMap
    val size = reps.map(r => r.getLong(1) -> r.getLong(2)).toMap
    reps.foreach { r =>
      val (id, cr, n, isDup) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))
      assert(cr <= id, s"rep $cr must be the min member, got doc $id")
      assert(rep(cr) == cr, s"representative $cr must represent itself")
      assert((isDup == 1) == (id != cr))
      assert(size(cr) == n, s"n_dups must be the family size at every member")
    }
    // every candidate pair must land in the same family, and family sizes
    // must be exactly the component sizes of the pair graph (plus singletons)
    val pairs = graft.operators.Vectors.simhashPairs(spark, TestSpark.sf0001)
      .select(col("id_a"), col("id_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b) =>
      assert(rep(a) == rep(b), s"pair ($a,$b) split across families")
    }
    val families = reps.map(_.getLong(1)).groupBy(identity).view.mapValues(_.length)
    families.foreach { case (cr, n) => assert(size(cr) == n.toLong) }
  }

  test("minhash reps verdict is consistent with the filtered minhash pair list") {
    val spark = TestSpark.spark
    import org.apache.spark.sql.functions.col
    val reps = DedupCluster.minhashReps(spark, TestSpark.sf0001).collect()
    assert(reps.length.toLong == Tables.documents(spark, TestSpark.sf0001).count())
    val rep = reps.map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every UNCONTRACTED pair at est_jaccard >= 0.5 lands in one family —
    // this is the closure the oracle replays, computed the slow way
    val pairs = graft.operators.Vectors.minhashAgreePairs(spark, TestSpark.sf0001)
      .where(col("est_jaccard") >= 0.5)
      .select(col("id_a"), col("id_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b) =>
      assert(rep(a) == rep(b), s"pair ($a,$b) split across families")
    }
    // and the family count matches an independent union-find over the pairs
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x; while (parent.getOrElse(r, r) != r) r = parent(r); r
    }
    pairs.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    val wantFamilies = parent.keys.map(find).toSet
    val gotFamilies = reps.filter(_.getLong(2) > 1).map(_.getLong(1)).toSet
    assert(gotFamilies == wantFamilies,
      s"missing=${wantFamilies -- gotFamilies} extra=${gotFamilies -- wantFamilies}")
  }

  test("embed reps verdict agrees with the cluster-level exact clustering") {
    val spark = TestSpark.spark
    val reps = DedupCluster.embedReps(spark, TestSpark.sf0001).collect()
    assert(reps.length.toLong == Tables.documents(spark, TestSpark.sf0001).count())
    // the doc-level verdicts must be exactly the cluster-level view
    // (q_dedup_clusters_exact, itself oracle-checked) re-keyed per doc
    val clusters = DedupCluster.clustersExact(spark, TestSpark.sf0001)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    reps.foreach { r =>
      val (id, cr, n, isDup) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))
      clusters.get(cr) match {
        case Some((size, keep)) =>
          assert(n == size && keep == cr, s"doc $id family $cr: $n vs $size")
          assert((isDup == 1) == (id != cr))
        case None =>
          assert(n == 1L && isDup == 0 && cr == id, s"singleton $id broken")
      }
    }
    // every multi-member exact cluster appears as a reps family
    val repFamilies = reps.filter(_.getLong(2) > 1).map(_.getLong(1)).toSet
    assert(clusters.keySet.filter(c => clusters(c)._1 > 1) == repFamilies)
  }

  test("keep-best canonicalization picks the max-quality member of every family") {
    val spark = TestSpark.spark
    import org.apache.spark.sql.functions.col
    // independent reference: union-find over the RAW (uncontracted) pair
    // list + the oracle-checked quality scores, argmax by (quality desc,
    // doc_id asc) per family, singletons included
    val pairs = graft.operators.Vectors.embedNeardupPairs(spark, TestSpark.sf0001)
      .select(col("id_a"), col("id_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x; while (parent.getOrElse(r, r) != r) r = parent(r); r
    }
    pairs.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    val quality = graft.operators.Text.qualityScore(spark, TestSpark.sf0001)
      .select(col("doc_id"), col("quality"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val want = quality.keys.toSeq
      .map(id => (find(id), id))
      .groupBy(_._1)
      .map { case (c, ms) =>
        val ids = ms.map(_._2)
        val best = ids.minBy(id => (-quality(id), id))
        (c, ids.size.toLong, best, quality(best))
      }
      .toSeq.sortBy(_._1)
    val got = DedupCluster.keepBest(spark, TestSpark.sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got == want)
    // and one canonicalization row per family = families partition the corpus
    assert(got.map(_._2).sum == Tables.documents(spark, TestSpark.sf0001).count())
  }

  test("at-rest minhash screen: planted cross dups detected, organic verdicts match the pair list") {
    val spark = TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import graft.operators.Vectors
    // planted: two src9 (incoming batch) docs replicate at-rest texts, one is novel
    val dir = java.nio.file.Files.createTempDirectory("graft_mh_idx").toString
    Seq(
      (0L, "the quick brown fox jumps over the lazy dog again and again", "en", "src0", 0L),
      (1L, "completely different content about something else entirely here", "en", "src1", 0L),
      (100L, "the quick brown fox jumps over the lazy dog again and again", "en", "src9", 0L),
      (101L, "utterly novel text that matches nothing in the reference set", "en", "src9", 0L),
      (102L, "completely different content about something else entirely here", "en", "src9", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val planted = Vectors.minhashScreenAtRest(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(planted.keySet == Set(100L, 101L, 102L), "one verdict row per batch doc")
    assert(planted(100L) == ((1L, 0L, 32L)), "exact replica -> full 32/32 agreement")
    assert(planted(102L) == ((1L, 1L, 32L)))
    assert(planted(101L) == ((0L, -1L, 0L)), "novel doc -> clean verdict")
    // organic corpus: the screen's verdicts must agree with the candidate
    // pair list restricted to mixed (batch x at-rest) pairs at est >= 0.5
    val screen = Vectors.minhashScreenAtRest(spark, TestSpark.sf0001).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val srcs = Tables.documents(spark, TestSpark.sf0001)
      .select(col("doc_id"), col("source"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val mixedDup = graft.operators.Vectors.minhashAgreePairs(spark, TestSpark.sf0001)
      .where(col("est_jaccard") >= 0.5)
      .select(col("id_a"), col("id_b"))
      .collect().flatMap { r =>
        val (a, b) = (r.getLong(0), r.getLong(1))
        (srcs(a) == "src9", srcs(b) == "src9") match {
          case (true, false) => Some(a)
          case (false, true) => Some(b)
          case _ => None
        }
      }.toSet
    assert(screen.keySet == srcs.filter(_._2 == "src9").keySet)
    screen.foreach { case (id, isDup) =>
      assert(isDup == (if (mixedDup(id)) 1L else 0L),
        s"doc $id: screen=$isDup, pair-list=${mixedDup(id)}")
    }
  }

  test("at-rest simhash screen: planted replicas flagged, organic verdicts match the pair list") {
    val spark = TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import graft.operators.Vectors
    // planted: two src9 (incoming batch) docs replicate at-rest texts
    // (identical simhash -> Hamming 0), one is novel
    val dir = java.nio.file.Files.createTempDirectory("graft_sh_idx").toString
    Seq(
      (0L, "the quick brown fox jumps over the lazy dog again and again", "en", "src0", 0L),
      (1L, "completely different content about something else entirely here", "en", "src1", 0L),
      (100L, "the quick brown fox jumps over the lazy dog again and again", "en", "src9", 0L),
      (101L, "utterly novel text that matches nothing in the reference set", "en", "src9", 0L),
      (102L, "completely different content about something else entirely here", "en", "src9", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val planted = Vectors.simhashScreenAtRest(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(planted.keySet == Set(100L, 101L, 102L), "one verdict row per batch doc")
    assert(planted(100L) == ((1L, 0L, 0L)), "exact replica -> Hamming 0 vs its at-rest twin")
    assert(planted(102L) == ((1L, 1L, 0L)))
    assert(planted(101L) == ((0L, -1L, 64L)), "novel doc -> clean verdict, sentinel distance")
    // organic corpus: the screen's verdicts must agree with the candidate
    // pair list (blocks + Hamming <= 12) restricted to mixed (batch x
    // at-rest) pairs, and the reported best match must be a true minimum
    val screen = Vectors.simhashScreenAtRest(spark, TestSpark.sf0001).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val srcs = Tables.documents(spark, TestSpark.sf0001)
      .select(col("doc_id"), col("source"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val mixed = Vectors.simhashPairs(spark, TestSpark.sf0001)
      .collect().flatMap { r =>
        val (a, b, h) = (r.getLong(0), r.getLong(1), r.getInt(2).toLong)
        (srcs(a) == "src9", srcs(b) == "src9") match {
          case (true, false) => Some(a -> ((b, h)))
          case (false, true) => Some(b -> ((a, h)))
          case _ => None
        }
      }.groupBy(_._1).map { case (id, ms) =>
        id -> ms.map(_._2).minBy { case (ref, h) => (h, ref) }
      }
    assert(screen.keySet == srcs.filter(_._2 == "src9").keySet)
    screen.foreach { case (id, (isDup, ref, h)) =>
      mixed.get(id) match {
        case Some((wantRef, wantH)) =>
          assert((isDup, ref, h) == ((1L, wantRef, wantH)), s"doc $id")
        case None =>
          assert((isDup, ref, h) == ((0L, -1L, 64L)), s"doc $id should be clean")
      }
    }
  }

  test("document clusters from LSH candidates have sane shape") {
    val spark = TestSpark.spark
    val cl = DedupCluster.clusters(spark, TestSpark.sf0001, minJac = 0.5).collect()
    // every cluster has >= 2 members (components only form from pairs) and
    // the representative is its own component id
    cl.foreach { r =>
      assert(r.getAs[Long]("cluster_size") >= 2)
      assert(r.getAs[Long]("keep_doc_id") == r.getAs[Long]("comp"))
    }
  }
}
