package graft

/** r15 profiling aid: splits a query's wall time into DataFrame
  * construction (driver-side plan building, incl. any bounded collects the
  * operator does while assembling the plan), Catalyst analysis+optimization
  * of the final frame, and execution — so driver-side costs (guide §5) are
  * attributed before touching executors.
  *
  * Usage: `sbt "runMain graft.TimePhases q_a[,q_b,...] [sfDir] [reps]"`.
  */
object TimePhases {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(',').toSeq
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.create(cpus.toInt)
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val rows = (0 until reps).map { i =>
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val t1 = System.nanoTime()
        df.queryExecution.optimizedPlan // force analysis + optimization
        val t2 = System.nanoTime()
        df.count()
        val t3 = System.nanoTime()
        val r = ((t1 - t0) / 1e9, (t2 - t1) / 1e9, (t3 - t2) / 1e9)
        println(f"[phase] $name rep$i construct=${r._1}%.3f analyze=${r._2}%.3f exec=${r._3}%.3f")
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
        r
      }
      val best = rows.minBy(r => r._1 + r._2 + r._3)
      println(f"[phase] $name BEST construct=${best._1}%.3f analyze=${best._2}%.3f exec=${best._3}%.3f")
    }
    spark.stop()
  }
}
