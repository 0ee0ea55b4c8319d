package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{SeisFixture, SeisPipeline}

/** Golden end-to-end test (SURVEY §5 item 4): full SGT/DGF build on the
  * synthetic fixture; decoded series must sit within the truncating-quantizer
  * error bound of the directly-computed truth. */
class PipelineSpec extends AnyFunSuite {

  test("SGT pipeline: every retained point encodes within scale/255") {
    val spark = TestSpark.spark
    val out = SeisPipeline.sgtPipeline(spark, SeisFixture.ensure()).collect()
    assert(out.nonEmpty)
    val expectedSeriesLen = 3 * 6 * SeisFixture.Steps.length // force × param × step
    out.foreach { r =>
      assert(r.getAs[Int]("n") == expectedSeriesLen, s"row $r")
      assert(r.getAs[Boolean]("within_bound"), s"row $r breaks the bound")
      // max_err_r comes from the INFLATED payload, so the real zlib round
      // trip is exercised even though payload bytes left the contract
      assert(r.getAs[Double]("max_err_r") >= 0.0 && r.getAs[Double]("scale_r") > 0.0)
    }
  }

  test("DGF pipeline: every retained point encodes within bound") {
    val spark = TestSpark.spark
    val out = SeisPipeline.dgfPipeline(spark, SeisFixture.ensure()).collect()
    assert(out.nonEmpty)
    val expectedSeriesLen = 3 * 3 * SeisFixture.Steps.length
    out.foreach { r =>
      assert(r.getAs[Int]("n") == expectedSeriesLen)
      assert(r.getAs[Boolean]("within_bound"))
    }
  }

  test("subsampled index: monotone-dedup keeps a strict subset with increasing gll") {
    val spark = TestSpark.spark
    val idx = SeisPipeline.subsampledIndex(spark, SeisFixture.ensure())
    val glls = idx.orderBy("gll").select("gll")
      .collect().map(_.getLong(0)).toSeq
    assert(glls.nonEmpty && glls.distinct == glls)
    val all27 = SeisPipeline.readIbool(spark, SeisFixture.ensure())
      .where(org.apache.spark.sql.functions.col("igll")
        .isin(SeisFixture.Index27.map(Integer.valueOf): _*))
      .select("gll").distinct().count()
    assert(glls.length <= all27) // dedup only removes
  }
}
