package graft

/** Times a single query repeatedly — the iteration loop for optimizing one
  * operator without paying the full Bench suite.
  *
  * Usage: `sbt "runMain graft.Time q_join_range [sfDir] [reps]"`.
  */
object Time {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.create(cpus.toInt)
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    val times = (0 until reps).map { i =>
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[time] $name rep$i: $dt%.3f s ($n rows)")
      dt
    }
    println(f"[time] $name min=${times.min}%.3f s over $reps reps")
    spark.stop()
  }
}
