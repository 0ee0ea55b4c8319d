package graft

import java.io.{File, PrintWriter}

/** r16 optimization-round evidence tool: dumps the post-AQE
  * `explain("formatted")` for a NAMED LIST of declared queries — the
  * per-key before/after plan files the round commits under `plans/r16/`
  * (PlanAudit stays the full-suite sweep; this is the iteration loop).
  *
  * Usage: `sbt "runMain graft.PlanDump q_a,q_b <sfDir> <outDir> <suffix>"`
  * writes `<outDir>/<key>_<suffix>.txt` for each key.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(',').toSeq
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val outDir = if (args.length > 2) args(2) else "plans/r16"
    val suffix = if (args.length > 3) args(3) else "before"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.create(cpus.toInt)
    spark.sparkContext.setLogLevel("ERROR")
    new File(outDir).mkdirs()
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val df = fn(spark, sfDir)
      df.count() // settle AQE so the dump shows the executed plan
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val w = new PrintWriter(new File(outDir, s"${name}_$suffix.txt"), "UTF-8")
      try w.println(plan) finally w.close()
      println(s"wrote $outDir/${name}_$suffix.txt")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
