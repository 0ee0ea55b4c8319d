package graft

import scala.util.Try

/** Spot benchmark for a NAMED subset of keys on one dataset — the
  * third-decade evidence leg (r11 verdict #5): the full `Bench` suite at
  * sf30 would take hours, but the scaling question only concerns the
  * heaviest keys, so this times exactly those with the same methodology
  * (sf0.001 warmup, input pre-touch, per-key isolation, min over reps) and
  * prints ONE JSON line in the Bench format.
  *
  * Usage: runMain graft.BenchSpot <sfDir> <reps> <key> [<key> ...]
  */
object BenchSpot {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: BenchSpot <sfDir> <reps> <key>...")
    val sfDir = args(0)
    val reps = args(1).toInt
    val keys = args.drop(2).toSeq
    val unknown = keys.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown keys: ${unknown.mkString(", ")}")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.create(cpus.toInt)
    spark.sparkContext.setLogLevel("WARN")

    val warmDir = "/root/testdata/sf0.001"
    if (new java.io.File(warmDir).isDirectory)
      keys.foreach(k => Try(SparkEntry.queries(k)(spark, warmDir).count()))
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "documents", "embeddings").foreach { t =>
      Try(Tables(spark, sfDir, t).foreach(_ => ()))
    }
    Try(Tables.events(spark, sfDir).foreach(_ => ()))

    def isolate(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }

    val results = keys.map { k =>
      val fn = SparkEntry.queries(k)
      var ok = true
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        try fn(spark, sfDir).count() catch { case _: Throwable => ok = false }
        val dt = (System.nanoTime() - t0) / 1e9
        isolate()
        dt
      }
      (k, times.min, times.head, ok)
    }
    def fmt(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val qs = results.map { case (k, v, _, ok) => "\"" + k + "\":" + fmt(if (ok) v else -v) }
      .mkString("{", ",", "}")
    // pass-1 carries the first-touch costs the min-of-reps discipline
    // deliberately excludes (ensureIndex builds, referee memoization) —
    // the r12 verdict #3 cold-evidence contract, same as graft.Bench
    val qsCold = results.map { case (k, _, v1, ok) => "\"" + k + "\":" + fmt(if (ok) v1 else -v1) }
      .mkString("{", ",", "}")
    val errors = results.collect { case (k, _, _, false) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.collect { case (_, v, _, true) => v }.sum
    println(
      s"""{"metric":"spot_total","value":${fmt(total)},"unit":"sec","queries":$qs,"queries_pass1":$qsCold,"errors":$errors,"sf":"$sfDir","reps":$reps}""")
    spark.stop()
  }
}
