package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{DedupCluster, Vectors}

/** SemDeDup-shaped clustered semantic dedup: soundness (within-cell edges
  * are a subset of the full exact edge set), measured recall of the
  * cell restriction, verdict-shape and determinism bars. Rows-only key, so
  * these are its correctness gate. */
class SemanticDedupSpec extends AnyFunSuite {

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select(col("id_a"), col("id_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet

  test("semantic cell edges are sound (subset of the full exact pair closure) with high recall") {
    val spark = TestSpark.spark
    val d = TestSpark.sf0001
    val full = pairSet(Vectors.embedNeardupPairs(spark, d))
    val cellEdges = pairSet(Vectors.semanticCellEdges(spark, d))
    assert(cellEdges.nonEmpty)
    // soundness: every emitted edge is a true >= threshold pair (star edges
    // included — identical embeddings are cos 1.0 pairs of the closure)
    assert(cellEdges.subsetOf(full),
      s"unsound extras: ${(cellEdges -- full).take(5)}")
    // recall: only cross-cell pairs may be lost; the shipping (64-cell,
    // p=5) multi-probe assignment measured 0.883 on this fixture — the
    // bar holds the production promise (a SemDeDup under 0.8 under-dedups
    // meaningfully; see the r8 verdict)
    val recall = cellEdges.size.toDouble / full.size
    info(f"within-cell recall at p=${Vectors.SemanticProbes}: $recall%.3f (${cellEdges.size}/${full.size} pairs)")
    assert(recall >= 0.8, f"cell restriction recall $recall%.3f below bar")
  }

  test("semantic verdicts: one row per doc, dup flags a subset of the exact family's") {
    val spark = TestSpark.spark
    val d = TestSpark.sf0001
    val sem = DedupCluster.semanticRepsRaw(spark, d).collect()
    val nDocs = Tables.documents(spark, d).count()
    assert(sem.length == nDocs)
    val semDups = sem.filter(_.getInt(3) == 1).map(_.getLong(0)).toSet
    val exactDups = DedupCluster.embedReps(spark, d).collect()
      .filter(_.getInt(3) == 1).map(_.getLong(0)).toSet
    assert(semDups.nonEmpty && semDups.subsetOf(exactDups))
    // determinism: seeded k-means + exact kernel — two runs byte-equal
    val again = DedupCluster.semanticRepsRaw(spark, d).collect()
    assert(sem.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("fixed-centroid semantic edges are sound; verdicts match a driver closure") {
    val spark = TestSpark.spark
    val d = TestSpark.sf0001
    val full = pairSet(Vectors.embedNeardupPairs(spark, d))
    val fixedEdges = pairSet(Vectors.semanticCellEdgesFixed(spark, d))
    assert(fixedEdges.nonEmpty)
    // soundness: the pinned-cell restriction only ever DROPS true pairs
    assert(fixedEdges.subsetOf(full),
      s"unsound extras: ${(fixedEdges -- full).take(5)}")
    // the verdict tail replayed as a plain driver union-find over the edges
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    fixedEdges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val verdicts = DedupCluster.semanticFixedReps(spark, d).collect()
    val nDocs = Tables.documents(spark, d).count()
    assert(verdicts.length == nDocs)
    verdicts.foreach { r =>
      val (id, rep) = (r.getLong(0), r.getLong(1))
      assert(rep == find(id), s"doc $id: rep $rep != driver ${find(id)}")
      assert((r.getInt(3) == 1) == (id != rep))
    }
    // determinism: pure pinned arithmetic — two runs byte-equal
    val again = DedupCluster.semanticFixedReps(spark, d).collect()
    assert(verdicts.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("referee ceiling: degraded certificate equals the full pipeline on the sampled population (both ways)") {
    val spark = TestSpark.spark
    import spark.implicits._
    val d = TestSpark.sf0001
    val full = DedupCluster.semanticReps(spark, d).collect()
    try {
      // force the ceiling below the fixture (500 embeddings) with a PROPER
      // sub-sample target — the degraded regime on a gate-verifiable corpus
      System.setProperty("graft.semref.ceiling", "10")
      System.setProperty("graft.semref.sample", "150")
      val degraded = DedupCluster.semanticReps(spark, d).collect()
      // population = exactly the deterministic hash-sample (the same
      // engine-side predicate, recomputed independently here)
      val n = Tables.embeddings(spark, d).count()
      val cut = (150.0 / n * (1L << 40).toDouble).toLong
      val expectedIds = Tables.documents(spark, d)
        .select(col("doc_id"))
        .where(pmod(xxhash64(col("doc_id")), lit(1L << 40)) < lit(cut))
        .as[Long].collect().toSet
      assert(expectedIds.nonEmpty && expectedIds.size < full.length,
        "fixture sample must be a proper subset")
      assert(degraded.map(_.getLong(0)).toSet == expectedIds)
      // certificate booleans are certified on the sample, not inherited
      assert(degraded.forall(r => r.getBoolean(4) && r.getBoolean(5)))
      // equality BOTH WAYS: the full (un-degraded) pipeline over a
      // materialized sampled sub-corpus emits byte-identical verdicts
      System.clearProperty("graft.semref.ceiling")
      System.clearProperty("graft.semref.sample")
      val sub = java.nio.file.Files.createTempDirectory("graft_semref").toString
      Tables.documents(spark, d)
        .where(pmod(xxhash64(col("doc_id")), lit(1L << 40)) < lit(cut))
        .write.parquet(s"$sub/documents.parquet")
      Tables.embeddings(spark, d)
        .where(pmod(xxhash64(col("vec_id")), lit(1L << 40)) < lit(cut))
        .write.parquet(s"$sub/embeddings.parquet")
      val fullOnSample = DedupCluster.semanticReps(spark, sub).collect()
      assert(degraded.map(_.toSeq).toSeq == fullOnSample.map(_.toSeq).toSeq)
    } finally {
      System.clearProperty("graft.semref.ceiling")
      System.clearProperty("graft.semref.sample")
    }
  }
}
