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

  test("step-stride + force options prune FILES at planning time (DDBbase.py:71 1:N reducer)") {
    val spark = TestSpark.spark
    val dir = SeisFixture.ensure()
    // stride 20 over steps 0..100 → 6 steps of 11; one force of three
    val pruned = spark.read.format(classOf[StrainDataSource].getName)
      .option("path", dir)
      .option("step0", "0").option("step1", "101").option("dstep", "20")
      .option("forces", "N").load()
    assert(pruned.rdd.getNumPartitions == 6)
    assert(pruned.select("step").distinct().count() == 6)
    assert(pruned.select("force").distinct().collect().map(_.getInt(0)).toSeq == Seq(0))
    // full scan is unchanged
    val full = spark.read.format(classOf[StrainDataSource].getName)
      .option("path", dir).load()
    assert(full.rdd.getNumPartitions == 3 * SeisFixture.Steps.length)
  }

  test("DSv2 write path round-trips: rows → Fortran snapshots → same rows") {
    val spark = TestSpark.spark
    val dir = SeisFixture.ensure()
    val out = java.nio.file.Files.createTempDirectory("strain_write").toString
    val src = spark.read.format(classOf[StrainDataSource].getName)
      .option("path", dir).option("step0", "0").option("step1", "21").load()
    src.write.format(classOf[StrainDataSource].getName)
      .option("path", out).mode("append").save()
    // written layout matches the reference's (force dir / proc_..._Step_N.bin)
    assert(new java.io.File(s"$out/force_N/proc000000_strain_field_Step_0.bin").isFile)
    val back = spark.read.format(classOf[StrainDataSource].getName)
      .option("path", out).load()
    val keys = Seq("force", "step", "param", "spec", "igll")
    val joined = src.withColumnRenamed("value", "va")
      .join(back.withColumnRenamed("value", "vb"), keys)
    assert(joined.count() == src.count() && back.count() == src.count())
    // deviatoric re-encode + float32 reconstruction may differ by an ulp
    val maxDiff = joined.agg(max(abs(col("va") - col("vb")))).head().getDouble(0)
    assert(maxDiff < 1e-12, s"round-trip max diff $maxDiff")
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
