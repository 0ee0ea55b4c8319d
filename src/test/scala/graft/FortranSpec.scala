package graft

import java.io.File
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{Fortran, SeisFixture, SeisPipeline}

class FortranSpec extends AnyFunSuite {

  test("record write/read round-trip with proper markers") {
    val recs = Seq(Array[Byte](1, 2, 3, 4), Array.fill[Byte](500)(7), Array.empty[Byte])
    val f = File.createTempFile("fortran", ".bin")
    Fortran.writeRecordFile(f, recs)
    val back = Fortran.readRecords(java.nio.file.Files.readAllBytes(f.toPath))
    assert(back.length == 3)
    recs.zip(back).foreach { case (a, b) => assert(a.sameElements(b)) }
    f.delete()
  }

  test("corrupt trailing marker is rejected") {
    val bytes = Array[Byte](2, 0, 0, 0, 9, 9, 3, 0, 0, 0) // trailer 3 != leader 2
    intercept[IllegalArgumentException](Fortran.readRecords(bytes))
  }

  test("seek-based slice read (R2): matches whole-file parse, touches only the range") {
    val rnd = new scala.util.Random(7)
    val recs = Seq(
      Array.fill(100)(rnd.nextFloat()),
      Array.fill(500)(rnd.nextFloat()),
      Array.fill(30)(rnd.nextFloat()))
    val f = File.createTempFile("fortran_slice", ".bin")
    Fortran.writeRecordFile(f, recs.map(Fortran.bytesOfFloats))
    // slice inside record 1
    val got = Fortran.readFloatSlice(f, record = 1, offset = 37, count = 200)
    assert(got.sameElements(recs(1).slice(37, 237)))
    // full record 2 as a slice
    assert(Fortran.readFloatSlice(f, 2, 0, 30).sameElements(recs(2)))
    // out-of-range slice rejected
    intercept[IllegalArgumentException](Fortran.readFloatSlice(f, 2, 20, 20))
    f.delete()
  }

  test("float/int LE codecs round-trip") {
    val fs = Array(1.5f, -2.25e-7f, 0f, Float.MinPositiveValue)
    assert(Fortran.floatsLE(Fortran.bytesOfFloats(fs)).sameElements(fs))
    val is = Array(1, -1, 0, Int.MaxValue)
    assert(Fortran.intsLE(Fortran.bytesOfInts(is)).sameElements(is))
  }

  test("fixture ibool parses 1-based → 0-based with expected shape") {
    val spark = TestSpark.spark
    val dir = SeisFixture.ensure()
    val ib = SeisPipeline.readIbool(spark, dir)
    assert(ib.count() == SeisFixture.NSPEC * SeisFixture.NGLL_LOCAL)
    val mins = ib.selectExpr("min(gll)", "max(spec)", "max(igll)").head()
    assert(mins.getLong(0) == 0L) // 0-based after shift
    assert(mins.getInt(1) == SeisFixture.NSPEC - 1)
    assert(mins.getInt(2) == SeisFixture.NGLL_LOCAL - 1)
  }

  test("strain reader reconstructs the full tensor from deviatoric records") {
    val spark = TestSpark.spark
    val dir = SeisFixture.ensure()
    val strain = SeisPipeline.readStrain(spark, dir)
      .where("force = 0 AND step = 0 AND spec = 0 AND igll <= 1")
      .collect()
      .map(r => (r.getInt(2), r.getInt(4), r.getDouble(5))) // (param, igll, value)
    assert(strain.length == 12) // 2 points × 6 params
    // xx component (param 0) must equal the pre-deviatoric truth
    strain.filter(_._1 == 0).foreach { case (_, igll, v) =>
      val truth = SeisFixture.strainTruth(0, igll, 0)
      assert(math.abs(v - truth) < 1e-10, s"xx at $igll: $v vs $truth")
    }
    // xy component (param 3) passes through unchanged
    strain.filter(_._1 == 3).foreach { case (_, igll, v) =>
      assert(math.abs(v - SeisFixture.strainTruth(3, igll, 0)) < 1e-10)
    }
  }
}
