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

  test("16-bit level: golden little-endian codes, matching numpy uint16 tobytes") {
    val xs = Array(0.0, 0.5, 1.0, 0.25, 0.9999999)
    // floor(x*65535) = 0, 32767, 65535, 16383, 65534 — little-endian pairs
    val bytes = Codec.quantize(xs, 16)
    assert(bytes.toSeq.map(_ & 0xff) ==
      Seq(0, 0, 0xff, 0x7f, 0xff, 0xff, 0xff, 0x3f, 0xfe, 0xff))
    val back = Codec.dequantize(bytes, 16, 0.0, 1.0)
    assert(back.length == xs.length)
    xs.zip(back).foreach { case (v, d) =>
      val err = v - d
      assert(err >= -1e-12 && err <= 1.0 / 65535.0 + 1e-12)
    }
  }

  test("encode at level 16: round-trip bound tightens to scale/65535") {
    for (_ <- 1 to 20) {
      val values = Array.fill(1 + rnd.nextInt(500))(rnd.nextDouble() * 2e3 - 1e3)
      val blob = Codec.encodeSeries(values, bits = 16)
      assert(blob.bits == 16)
      val decoded = Codec.decodeSeries(blob)
      assert(decoded.length == values.length)
      values.zip(decoded).foreach { case (v, d) =>
        val err = v - d
        assert(err >= -1e-9 && err <= blob.scale / 65535.0 + 1e-9,
          s"err $err outside [0, ${blob.scale / 65535.0}]")
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
