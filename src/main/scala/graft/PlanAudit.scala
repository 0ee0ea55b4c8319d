package graft

import java.io.{File, PrintWriter}

import scala.util.{Failure, Success, Try}

/** r15 optimization-round audit: dumps `explain("formatted")` for EVERY
  * declared query to one file per key and prints a one-line-per-key plan
  * summary (Exchange count, join strategies, scan pushdown evidence,
  * codegen span count) so the round's operator-by-operator checklist is
  * grounded in the actual plans, not memory.
  *
  * Usage: `sbt "runMain graft.PlanAudit [sfDir] [outDir]"`.
  * Counts are taken from the FINAL (post-AQE) plan: each query is
  * materialized with `.count()` first, exactly like the bench action.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val outDir = if (args.length > 1) args(1) else "plans/r15/audit"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.create(cpus.toInt)
    spark.sparkContext.setLogLevel("ERROR")
    new File(outDir).mkdirs()
    val summary = new PrintWriter(new File(outDir, "_summary.tsv"), "UTF-8")
    summary.println(Seq("key", "exchanges", "bhj", "smj", "shj", "bnlj",
      "cartesian", "sorts", "windows", "codegen_spans", "scans",
      "scans_with_pushed_filters", "aqe_shuffle_reads", "err").mkString("\t"))
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      Try {
        val df = fn(spark, sfDir)
        df.count() // settle AQE so the dump shows the executed plan
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        val w = new PrintWriter(new File(outDir, s"$name.txt"), "UTF-8")
        try w.println(plan) finally w.close()
        def c(p: String): Int = p.r.findAllIn(plan).length
        summary.println(Seq(
          name,
          c("\\bExchange\\b"),
          c("BroadcastHashJoin"),
          c("SortMergeJoin"),
          c("ShuffledHashJoin"),
          c("BroadcastNestedLoopJoin"),
          c("CartesianProduct"),
          c("\\bSort\\b"),
          c("\\bWindow\\b"),
          c("WholeStageCodegen"),
          c("Scan parquet"),
          c("PushedFilters: \\[[^]]"),
          c("AQEShuffleRead"),
          "").mkString("\t"))
      } match {
        case Success(_) => ()
        case Failure(e) =>
          summary.println(Seq(name, "", "", "", "", "", "", "", "", "", "",
            "", "", e.toString.take(120)).mkString("\t"))
      }
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    summary.close()
    spark.stop()
    println(s"wrote $outDir")
  }
}
