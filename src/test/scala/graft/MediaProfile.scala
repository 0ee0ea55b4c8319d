package graft

/** Scratch stage profiler for the AVI key (not a spec; run manually):
  * splits per-doc wall between encode (aviBlob), container walk, JDK PNG
  * decode, raster extract, and scene arithmetic. */
object MediaProfile {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val texts = Tables.documents(spark, TestSpark.sf0001)
      .select(col("text")).as[String].collect().filter(_ != null)
    println(s"${texts.length} docs")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    // warmup
    texts.take(50).foreach { t =>
      val b = graft.operators.Video.aviBlob(t.getBytes("UTF-8"))
      val (_, _, _, _, fs) = graft.operators.Video.parseAviContainer(b)
      fs.foreach(f => graft.operators.Multimodal.bgrBytes(
        graft.operators.Video.decodePng(f)))
    }
    val blobs = time("encode (aviBlob)") {
      texts.map(t => graft.operators.Video.aviBlob(t.getBytes("UTF-8")))
    }
    val frames = time("container walk") {
      blobs.map(b => graft.operators.Video.parseAviContainer(b)._5)
    }
    // decodePng returns a per-thread REUSED destination image — extracting
    // rasters must happen immediately after each decode (decode-all-then-
    // extract would alias every same-shape frame to the LAST decode and
    // profile the wrong pixels; ADVICE r12). Per-frame nanoTime split keeps
    // the decode/extract stage attribution.
    var decNs = 0L
    var extNs = 0L
    val px = frames.map(_.map { f =>
      val t0 = System.nanoTime()
      val img = graft.operators.Video.decodePng(f)
      val t1 = System.nanoTime()
      val b = graft.operators.Multimodal.bgrBytes(img)
      decNs += t1 - t0
      extNs += System.nanoTime() - t1
      b
    })
    println(f"JDK PNG decode: ${decNs / 1e9}%.3f s")
    println(f"raster extract: ${extNs / 1e9}%.3f s")
    println(s"total frames: ${px.map(_.length).sum}")
  }
}
