package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Codec

class CodecSpec extends AnyFunSuite {
  private val rnd = new scala.util.Random(42)

  test("inflate ∘ deflate = id") {
    for (n <- Seq(0, 1, 7, 256, 10000)) {
      val arr = Array.fill[Byte](n)(rnd.nextInt().toByte)
      assert(Codec.inflate(Codec.deflate(arr)).sameElements(arr))
    }
  }

  test("quantizer truncates toward zero, codes in 0..255") {
    val xs = Array(0.0, 0.5, 0.999, 1.0, 0.003921, 0.0039216)
    val codes = Codec.quantize255(xs).map(_ & 0xff)
    assert(codes.toSeq == Seq(0, 127, 254, 255, 0, 1)) // floor(x*255)
  }

  test("encode/decode round-trip error bound: 0 <= v - v̂ <= scale/255") {
    for (_ <- 1 to 50) {
      val values = Array.fill(1 + rnd.nextInt(500))(rnd.nextDouble() * 2e3 - 1e3)
      val blob = Codec.encodeSeries(values)
      val decoded = Codec.decodeSeries(blob)
      assert(decoded.length == values.length)
      values.zip(decoded).foreach { case (v, d) =>
        val err = v - d
        // truncating quantizer under-estimates (within fp tolerance)
        assert(err >= -1e-9 && err <= blob.scale / 255.0 + 1e-9,
          s"err $err outside [0, ${blob.scale / 255.0}]")
      }
    }
  }

  test("tiny-amplitude series (seismic scale ~1e-7) keeps relative accuracy") {
    val values = Array.tabulate(300)(i => 1e-7 * math.sin(i * 0.1))
    val blob = Codec.encodeSeries(values)
    val decoded = Codec.decodeSeries(blob)
    values.zip(decoded).foreach { case (v, d) =>
      assert(math.abs(v - d) <= blob.scale / 255.0 + 1e-20)
    }
  }

  test("constant series (reference ÷0 quirk) encodes to exact offset") {
    val blob = Codec.encodeSeries(Array(7.5, 7.5, 7.5))
    assert(blob.scale == 0.0)
    assert(Codec.decodeSeries(blob).forall(_ == 7.5))
  }
}
