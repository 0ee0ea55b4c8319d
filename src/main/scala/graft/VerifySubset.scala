package graft
import java.nio.file.{Files, Paths}
/** Dev harness: [[Verify]] restricted to named keys — fast oracle iteration
  * on the handful of queries a change touched (`tools/local_verify.py`
  * compares whatever subdirectories exist). Usage:
  * `sbt "runMain graft.VerifySubset <sfDir> <outDir> key1 key2 ..."` */
object VerifySubset {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0); val outDir = args(1); val keys = args.drop(2).toSet
    require(keys.nonEmpty, "pass at least one query key")
    val unknown = keys -- SparkEntry.queries.keySet
    require(unknown.isEmpty, s"unknown keys: ${unknown.mkString(", ")}")
    val spark = GraftSession.create(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt)
    spark.sparkContext.setLogLevel("WARN")
    // same freshness rule as the full Verify gate
    System.setProperty("graft.bpe.fp.ttl.ms", "0")
    System.setProperty("graft.fp.ttl.ms", "0")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries.filter(kv => keys(kv._1)).foreach { case (name, fn) =>
      fn(spark, sfDir).coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql.filter(kv => keys(kv._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
