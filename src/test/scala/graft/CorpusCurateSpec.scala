package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col

import graft.operators.{CorpusCurate, DedupCluster, Text, Vectors}

/** The flagship curation pipeline: its output must be exactly the
  * composition of its already-verified stages (the DuckDB CTE oracle is the
  * cross-engine check; this spec pins the stage algebra within Spark). */
class CorpusCurateSpec extends AnyFunSuite {

  test("curate output is consistent with every stage's standalone verdict") {
    val spark = TestSpark.spark
    val d = TestSpark.sf0001
    val out = CorpusCurate.curate(spark, d).collect()
    assert(out.nonEmpty)
    val ids = out.map(_.getLong(2)).toSet

    // every sampled doc survives each stage's standalone filter
    val exactKeep = Text.exactDedup(spark, d)
      .select(col("keep_doc_id")).collect().map(_.getLong(0)).toSet
    val ndDrop = DedupCluster
      .connectedComponents(Vectors.embedNeardupPairs(spark, d))
      .where(col("id") =!= col("comp"))
      .collect().map(_.getLong(0)).toSet
    val gopherKeep = Text.gopherRules(spark, d).where(col("keep") === 1)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val clean = Text.contamination(spark, d).where(col("contaminated") === 0)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(ids.subsetOf(exactKeep), s"exact-dup leak: ${ids -- exactKeep}")
    assert(ids.intersect(ndDrop).isEmpty, s"near-dup leak: ${ids.intersect(ndDrop)}")
    assert(ids.subsetOf(gopherKeep), s"gopher leak: ${ids -- gopherKeep}")
    assert(ids.subsetOf(clean), s"contamination leak: ${ids -- clean}")

    // per-language rank sequences are 1..k and the sample is capped at 3
    out.groupBy(_.getString(0)).foreach { case (lang, rows) =>
      val rns = rows.map(_.getLong(1)).sorted.toSeq
      assert(rns == (1L to rns.length), s"$lang ranks: $rns")
      assert(rns.length <= 3)
    }

    // LM scores come from the full-corpus model (stage E joins, not refits)
    val lmAll = Text.lmScore(spark, d)
      .select(col("doc_id"), col("mean_lnp_r")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    out.foreach { r =>
      assert(r.getDouble(4) == lmAll(r.getLong(2)),
        s"doc ${r.getLong(2)} score drifted from q_lm_score")
    }
  }

  test("curation report: per-stage counts replay the flagship's gate chain") {
    val spark = TestSpark.spark
    val d = TestSpark.sf0001
    val rep = CorpusCurate.curationReport(spark, d).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rep.map(_._1).toSeq == (1L to 6L), "one row per stage, in order")
    // chaining: stage k's n_in is stage k-1's n_out; drops are consistent
    rep.sliding(2).foreach { case Array(a, b) =>
      assert(b._3 == a._4, s"stage ${b._1} n_in != stage ${a._1} n_out")
    }
    rep.foreach { case (id, _, nIn, nOut, nDrop) =>
      assert(nOut <= nIn && nDrop == nIn - nOut, s"stage $id arithmetic")
    }
    // endpoints: stage 1 enters the whole corpus; stage 6 exits exactly the
    // flagship's sampled rows
    assert(rep.head._3 == Tables.documents(spark, d).count())
    assert(rep.last._4 == CorpusCurate.curate(spark, d).count().toLong)
    // independent replay of each standalone gate
    val exactKeep = Text.exactDedup(spark, d)
      .select(col("keep_doc_id")).collect().map(_.getLong(0)).toSet
    val ndDrop = DedupCluster
      .connectedComponents(Vectors.embedNeardupPairs(spark, d))
      .where(col("id") =!= col("comp"))
      .collect().map(_.getLong(0)).toSet
    val gopherKeep = Text.gopherRules(spark, d).where(col("keep") === 1)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val clean = Text.contamination(spark, d).where(col("contaminated") === 0)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val lmIds = Text.lmScore(spark, d)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val s1 = exactKeep
    val s2 = s1 -- ndDrop
    val s3 = s2.intersect(gopherKeep)
    val s4 = s3.intersect(clean)
    val s5 = s4.intersect(lmIds)
    assert(rep.map(_._4).take(5).toSeq ==
      Seq(s1.size.toLong, s2.size.toLong, s3.size.toLong, s4.size.toLong,
        s5.size.toLong))
  }

  test("optional PII gate drops exactly the docs q_pii_scrub counts as carrying PII") {
    val spark = TestSpark.spark
    val d = TestSpark.sf0001
    val gated = CorpusCurate.curateWith(spark, d, piiGate = true).collect()
    assert(gated.nonEmpty)
    val piiFree = Text.piiScrub(spark, d)
      .where(col("n_emails") + col("n_phones") === 0)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    // no sampled doc carries PII, and the gate only removes docs — every
    // ungated survivor that is PII-free and ranked high enough reappears
    val gatedIds = gated.map(_.getLong(2)).toSet
    assert(gatedIds.subsetOf(piiFree), s"PII leak: ${gatedIds -- piiFree}")
    val ungated = CorpusCurate.curate(spark, d).collect()
    val ungatedPiiFree = ungated.filter(r => piiFree(r.getLong(2)))
      .map(_.getLong(2)).toSet
    assert(ungatedPiiFree.subsetOf(gatedIds),
      s"gate dropped PII-free survivors: ${ungatedPiiFree -- gatedIds}")
  }

  test("entropy and DSIR gates drop exactly the below-floor docs, and the floors split the corpus") {
    val spark = TestSpark.spark
    val d = TestSpark.sf0001
    val highEntropy = Text.ngramEntropy(spark, d)
      .where(col("entropy") >= CorpusCurate.EntropyGateMin)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val allDocs = Tables.documents(spark, d).count()
    assert(highEntropy.nonEmpty && highEntropy.size < allDocs,
      s"entropy floor must split the corpus (${highEntropy.size} of $allDocs)")
    val entGated = CorpusCurate.curateWith(spark, d, piiGate = false, entropyGate = true)
      .collect().map(_.getLong(2)).toSet
    assert(entGated.subsetOf(highEntropy),
      s"low-entropy leak: ${entGated -- highEntropy}")
    val ungated = CorpusCurate.curate(spark, d).collect().map(_.getLong(2)).toSet
    assert(ungated.filter(highEntropy).subsetOf(entGated),
      "gate dropped high-entropy survivors")

    val targetLike = Text.dsirWeights(spark, d)
      .where(col("dsir_weight") / col("n_tokens") >= CorpusCurate.DsirGateMinPerTok)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(targetLike.nonEmpty && targetLike.size < allDocs,
      s"DSIR floor must split the corpus (${targetLike.size} of $allDocs)")
    val dsirGated = CorpusCurate.curateWith(spark, d, piiGate = false, dsirGate = true)
      .collect().map(_.getLong(2)).toSet
    assert(dsirGated.subsetOf(targetLike),
      s"out-of-domain leak: ${dsirGated -- targetLike}")
    assert(ungated.filter(targetLike).subsetOf(dsirGated),
      "gate dropped target-like survivors")
  }

  test("NB quality gate keeps exactly the classified-curated docs, and the boundary splits the corpus") {
    val spark = TestSpark.spark
    val d = TestSpark.sf0001
    val curatedLike = Text.qualityClassifier(spark, d)
      .where(col("llr_r") > CorpusCurate.NbGateMinLlr)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val allDocs = Tables.documents(spark, d).count()
    assert(curatedLike.nonEmpty && curatedLike.size < allDocs,
      s"NB boundary must split the corpus (${curatedLike.size} of $allDocs)")
    val nbGated = CorpusCurate.curateWith(spark, d, piiGate = false, nbGate = true)
      .collect().map(_.getLong(2)).toSet
    assert(nbGated.subsetOf(curatedLike),
      s"crawl-classified leak: ${nbGated -- curatedLike}")
    val ungated = CorpusCurate.curate(spark, d).collect().map(_.getLong(2)).toSet
    assert(ungated.filter(curatedLike).subsetOf(nbGated),
      "gate dropped curated-classified survivors")
  }
}
