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
    val imgs = time("JDK PNG decode") {
      frames.map(_.map(graft.operators.Video.decodePng))
    }
    val px = time("raster extract") {
      imgs.map(_.map(graft.operators.Multimodal.bgrBytes))
    }
    println(s"total frames: ${px.map(_.length).sum}")
  }
}
