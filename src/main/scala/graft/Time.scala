package graft

/** Times a single query (or a comma-separated list) repeatedly — the
  * iteration loop for optimizing one operator without paying the full Bench
  * suite, with a per-job wall-time breakdown.
  *
  * Usage: `sbt "runMain graft.Time q_join_range[,q_foo,...] [sfDir] [reps]"`.
  */
object Time {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(',').toSeq
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.create(cpus.toInt)
    spark.sparkContext.setLogLevel("WARN")
    names.foreach(n => require(SparkEntry.queries.contains(n), s"unknown key $n"))
    // r15: per-job breakdown (guide §1 — know WHERE the seconds go before
    // touching anything): one listener row per Spark job with wall time and
    // task count; jobs the query runs during DataFrame CONSTRUCTION
    // (statistics, index builds, referee memos) show up separately from the
    // final count() job.
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          // ADVICE r15: SparkListenerJobStart.properties can itself be null
          val desc = Option(js.properties)
            .flatMap(p => Option(p.getProperty("spark.job.description")))
            .filter(_.nonEmpty)
            .orElse(js.stageInfos.lastOption.map(_.name.takeWhile(_ != '\n')))
            .getOrElse("")
          jobs.put(js.jobId, (js.time, desc))
        }
        override def onJobEnd(
            je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          val st = jobs.remove(je.jobId)
          if (st != null) println(
            f"[job] id=${je.jobId}%4d ${(je.time - st._1) / 1e3}%8.3f s  ${st._2}")
        }
      })
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val times = (0 until reps).map { i =>
        println(s"[time] --- $name rep$i ---")
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"[time] $name rep$i: $dt%.3f s ($n rows)")
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
        dt
      }
      println(f"[time] $name min=${times.min}%.3f s over $reps reps")
    }
    spark.stop()
  }
}
