package graft

/** Scratch: measure trained-ANN overlap-of-10 vs exact per dataset (run
  * manually when re-pinning the contract bars). */
object AnnProbe {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = TestSpark.spark
    val exact = graft.operators.Vectors.cosineTopk(spark, d)
      .collect().map(_.getLong(0)).toSet
    for ((name, fn) <- Seq(
        "ivf" -> graft.operators.Vectors.annIvfRaw,
        "pq" -> graft.operators.Vectors.annPqRaw,
        "ivfpq" -> graft.operators.Vectors.annIvfPqRaw)) {
      val ids = fn(spark, d).collect().map(_.getLong(0)).toSet
      println(s"$name overlap=${exact.intersect(ids).size}/10")
    }
  }
}
