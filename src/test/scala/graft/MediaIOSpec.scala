package graft

import java.io.ByteArrayInputStream

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Audio, MediaIO, Multimodal}

/** r15 optimization-round parity pins: every cached-codec fast path in
  * [[MediaIO]] and the hand-rolled tokenizer split must be bit-identical to
  * the JDK facade / regex spelling it replaced — the optimization is
  * dispatch hoisting, never a semantics change. */
class MediaIOSpec extends AnyFunSuite {

  private val payloads = Seq("", "a", "the quick brown fox", "z" * 211,
    "mixed 123 PAYLOAD with  spacing\tand tabs", (0 until 997).mkString(" "))

  test("audioStream ≡ AudioSystem.getAudioInputStream: format + samples") {
    for (p <- payloads) {
      val blob = Audio.mediaBlob(p.getBytes("UTF-8"))
      val fast = MediaIO.audioStream(blob)
      val slow = javax.sound.sampled.AudioSystem
        .getAudioInputStream(new ByteArrayInputStream(blob))
      assert(fast.getFormat.toString == slow.getFormat.toString)
      assert(fast.getFrameLength == slow.getFrameLength)
      val fb = fast.readAllBytes(); val sb = slow.readAllBytes()
      fast.close(); slow.close()
      assert(java.util.Arrays.equals(fb, sb), s"sample bytes diverged for '$p'")
    }
  }

  test("readBmp ≡ ImageIO.read: dimensions, type and pixel grid") {
    for (p <- payloads) {
      val blob = Multimodal.mediaBlob(p.getBytes("UTF-8"))
      val fast = MediaIO.readBmp(blob)
      val slow = javax.imageio.ImageIO.read(new ByteArrayInputStream(blob))
      assert(fast.getWidth == slow.getWidth && fast.getHeight == slow.getHeight)
      assert(fast.getType == slow.getType)
      for (y <- 0 until fast.getHeight; x <- 0 until fast.getWidth)
        assert(fast.getRGB(x, y) == slow.getRGB(x, y), s"pixel ($x,$y) for '$p'")
    }
  }

  test("encodePng round-trips pixel-identical through ImageIO.read") {
    for (p <- payloads) {
      val img = MediaIO.readBmp(Multimodal.mediaBlob(p.getBytes("UTF-8")))
      val png = javax.imageio.ImageIO.read(
        new ByteArrayInputStream(MediaIO.encodePng(img)))
      assert(png != null)
      assert(png.getWidth == img.getWidth && png.getHeight == img.getHeight)
      for (y <- 0 until img.getHeight; x <- 0 until img.getWidth)
        assert((png.getRGB(x, y) & 0xffffff) == (img.getRGB(x, y) & 0xffffff))
    }
  }

  test("Tok.splitWs ≡ String.split(\"\\\\s+\", -1) (property)") {
    val wsChars = Array(' ', '\t', '\n', '\u000B', '\f', '\r')
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 2000) {
      val len = rnd.nextInt(24)
      val s = Array.fill(len) {
        if (rnd.nextInt(10) < 3) wsChars(rnd.nextInt(wsChars.length))
        else ('a' + rnd.nextInt(26)).toChar
      }.mkString
      assert(functions.Tok.splitWs(s).toSeq == s.split("\\s+", -1).toSeq,
        s"diverged on ${s.map(_.toInt).mkString("[", ",", "]")}")
    }
    // pinned edges: empty, all-ws, leading/trailing runs, lone token
    for (s <- Seq("", " ", "   ", "\t\n", "a", " a", "a ", " a ", "a  b",
        "\tab\r\n"))
      assert(functions.Tok.splitWs(s).toSeq == s.split("\\s+", -1).toSeq,
        s"diverged on ${s.map(_.toInt).mkString("[", ",", "]")}")
  }

  test("tokenize still matches the declarative spelling through splitWs") {
    // the exact contract Tok documents: split(lower(trim(text)), "\\s+")
    for (t <- payloads ++ Seq("  leading", "trailing  ", "\tTAB first",
        "UPPER Case MiX", null)) {
      val got = functions.Tok.tokenize(t).toSeq
      val want =
        if (t == null) Seq.empty
        else {
          var b = 0; var e = t.length
          while (b < e && t.charAt(b) == ' ') b += 1
          while (e > b && t.charAt(e - 1) == ' ') e -= 1
          t.substring(b, e).toLowerCase.split("\\s+", -1).toSeq
        }
      assert(got == want, s"tokenize diverged for '$t'")
    }
  }
}
