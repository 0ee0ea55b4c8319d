package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.{SeisFixture, SeisPipeline, StrainDataSource}

class DataSourceV2Spec extends AnyFunSuite {

  test("DSv2 strain source equals the binaryFile+flatMap reader") {
    val spark = TestSpark.spark
    val dir = SeisFixture.ensure()
    val v2 = spark.read.format(classOf[StrainDataSource].getName)
      .option("path", dir).load()
    assert(v2.schema == StrainDataSource.schema)
    val cols = Seq("force", "step", "param", "spec", "igll", "value").map(col)
    val a = v2.select(cols: _*).orderBy(cols: _*).collect().toSeq
    val b = SeisPipeline.readStrain(spark, dir)
      .select(cols: _*).orderBy(cols: _*).collect().toSeq
    assert(a.size == b.size && a == b)
  }

  test("one input partition per snapshot file (the parallelism axis)") {
    val spark = TestSpark.spark
    val dir = SeisFixture.ensure()
    val v2 = spark.read.format(classOf[StrainDataSource].getName)
      .option("path", dir).load()
    val nFiles = StrainDataSource.listFiles(dir).size
    assert(nFiles == 3 * SeisFixture.Steps.length)
    assert(v2.rdd.getNumPartitions == nFiles)
  }

  test("filters compose on top of the scan (Catalyst handles post-scan pruning)") {
    val spark = TestSpark.spark
    val dir = SeisFixture.ensure()
    val v2 = spark.read.format(classOf[StrainDataSource].getName)
      .option("path", dir).load()
      .where(col("force") === 0 && col("param") === 0 && col("step") === 0)
    assert(v2.count() == SeisFixture.NSPEC * SeisFixture.NGLL_LOCAL)
  }
}
