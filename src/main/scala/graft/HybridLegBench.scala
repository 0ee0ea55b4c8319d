package graft

import graft.operators.Search

/** Decomposition evidence for the r15 hybrid serving flip (VERDICT r14
  * #3): times `hybridRrfIndexedWith` with the IVF semantic leg vs the
  * PQ-ADC semantic leg on the SAME lexical leg and fusion, so the
  * difference isolates the semantic legs — the warm suite number alone
  * cannot show which leg carries the remaining cost (on the 31-term
  * fixture vocabulary the lexical Θ(df) read spans ~97% of the postings
  * relation; see PERF.md round 15).
  *
  * Usage: runMain graft.HybridLegBench <sfDir> <reps> [outJson]
  */
object HybridLegBench {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: HybridLegBench <sfDir> <reps> [out]")
    val sfDir = args(0)
    val reps = args(1).toInt
    val outPath = if (args.length > 2) args(2) else "bench/hybrid_leg_last.json"
    val spark = GraftSession.create(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    spark.sparkContext.setLogLevel("WARN")
    def fmt(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    def timeLeg(semLeg: String): (Double, Double) = {
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        Search.hybridRrfIndexedWith(spark, sfDir, nProbe = 4,
          semLeg = semLeg, pqCand = Search.ServingPqCand).count()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        dt
      }
      (times.min, times.head)
    }
    val (ivfMin, ivfP1) = timeLeg("ivf")
    val (pqMin, pqP1) = timeLeg("pq")
    val line = s"""{"metric":"hybrid_leg_bench","sf":"$sfDir","reps":$reps,""" +
      s""""ivf":{"warm_s":${fmt(ivfMin)},"pass1_s":${fmt(ivfP1)}},""" +
      s""""pq":{"warm_s":${fmt(pqMin)},"pass1_s":${fmt(pqP1)}},""" +
      s""""sem_leg_delta_s":${fmt(ivfMin - pqMin)}}"""
    try {
      Option(java.nio.file.Paths.get(outPath).getParent)
        .foreach(p => java.nio.file.Files.createDirectories(p))
      java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath), line + "\n")
    } catch { case _: Throwable => () }
    println(line)
    spark.stop()
  }
}
