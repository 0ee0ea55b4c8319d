package graft

/** r15 optimization-round microbenchmark: isolates the per-row kernel costs
  * that dominate the heavy media/text keys at scale (guide §1.2 step 2 —
  * per-task work), so each change is justified by a number, not a hunch.
  *
  * Usage: `sbt "runMain graft.KernelBench [sfDir]"` — loads the real corpus
  * texts so string lengths/shapes match the bench, then times each kernel
  * variant over the whole corpus (min of reps), printing ns/doc.
  */
object KernelBench {
  private def time(reps: Int)(body: => Long): (Double, Long) = {
    var best = Long.MaxValue
    var sink = 0L
    for (_ <- 1 to reps) {
      val t0 = System.nanoTime()
      sink ^= body
      best = math.min(best, System.nanoTime() - t0)
    }
    (best.toDouble, sink)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.create(4)
    spark.sparkContext.setLogLevel("ERROR")
    val texts = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("text").collect().map(_.getString(0))
    spark.stop()
    val n = texts.length
    println(s"corpus: $n docs, avg ${texts.map(_.length).sum / n} chars")

    def report(name: String, reps: Int)(body: => Long): Unit = {
      val (ns, sink) = time(reps)(body)
      println(f"$name%-42s ${ns / n}%10.0f ns/doc  (sink=$sink)")
    }

    // --- tokenize (ADVICE r15: Tok.tokenize WAS switched to the
    //     hand-rolled splitWs, so "current" now IS the hand-rolled path;
    //     the other two legs are the historical baselines it replaced)
    report("tokenize/current (splitWs)", 5) {
      var acc = 0L
      texts.foreach(t => acc += functions.Tok.tokenize(t).length)
      acc
    }
    report("tokenize/regex-baseline (String.split)", 5) {
      var acc = 0L
      texts.foreach { t =>
        acc += t.toLowerCase.trim.split("\\s+", -1).length
      }
      acc
    }
    val ws = java.util.regex.Pattern.compile("\\s+")
    report("tokenize/precompiled-pattern", 5) {
      var acc = 0L
      texts.foreach { t =>
        val lower = t.toLowerCase
        acc += ws.split(lower.trim, -1).length
      }
      acc
    }

    // --- shingles over tokens (string assembly cost)
    report("shingles3/current", 5) {
      var acc = 0L
      texts.foreach { t =>
        functions.Tok.shingles(functions.Tok.tokenize(t), 3)
          .foreach(sh => acc += sh.length)
      }
      acc
    }

    // --- audio: AudioSystem.getAudioInputStream per blob vs thread-local
    //     provider dispatch
    val blobs = texts.map(t =>
      graft.operators.Audio.mediaBlob(t.getBytes("UTF-8")))
    report("wav-decode/AudioSystem", 3) {
      var acc = 0L
      blobs.foreach { b =>
        acc += graft.operators.Audio.decodeSamples(b)._2.length
      }
      acc
    }
    val readers = java.util.ServiceLoader.load(
      classOf[javax.sound.sampled.spi.AudioFileReader])
    val it = readers.iterator()
    var wavReader: javax.sound.sampled.spi.AudioFileReader = null
    while (it.hasNext) {
      val r = it.next()
      if (r.getClass.getName.toLowerCase.contains("wave") && wavReader == null)
        wavReader = r
    }
    println(s"ServiceLoader WAV reader: $wavReader")
    if (wavReader != null) {
      val wr = wavReader
      report("wav-decode/cached-provider", 3) {
        var acc = 0L
        blobs.foreach { b =>
          val in = wr.getAudioInputStream(new java.io.ByteArrayInputStream(b))
          val bytes = in.readAllBytes()
          in.close()
          acc += bytes.length / 2
        }
        acc
      }
    }

    // --- image: ImageIO.read per blob vs thread-local BMP reader
    val bmps = texts.map(t =>
      graft.operators.Multimodal.mediaBlob(t.getBytes("UTF-8")))
    report("bmp-decode/ImageIO.read", 3) {
      var acc = 0L
      bmps.foreach { b => acc += graft.operators.Multimodal.decode(b).getWidth }
      acc
    }
    val bmpReader = {
      val it = javax.imageio.ImageIO.getImageReadersByFormatName("bmp")
      require(it.hasNext, "no BMP reader"); it.next()
    }
    report("bmp-decode/cached-reader", 3) {
      var acc = 0L
      bmps.foreach { b =>
        val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
          new java.io.ByteArrayInputStream(b))
        bmpReader.setInput(iis)
        val img = bmpReader.read(0)
        iis.close()
        acc += img.getWidth
      }
      acc
    }

    // --- png: ImageIO.write per blob vs thread-local writer
    val imgs = bmps.map(graft.operators.Multimodal.decode)
    report("png-encode/ImageIO.write", 3) {
      var acc = 0L
      imgs.foreach { img =>
        val baos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", baos)
        acc += baos.size()
      }
      acc
    }
    val pngWriter = {
      val it = javax.imageio.ImageIO.getImageWritersByFormatName("png")
      require(it.hasNext, "no PNG writer"); it.next()
    }
    report("png-encode/cached-writer", 3) {
      var acc = 0L
      imgs.foreach { img =>
        val baos = new java.io.ByteArrayOutputStream()
        val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(baos)
        pngWriter.setOutput(ios)
        pngWriter.write(img)
        ios.flush(); ios.close()
        acc += baos.size()
      }
      acc
    }
  }

}
