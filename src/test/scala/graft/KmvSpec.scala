package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.KmvDistinct.kmv_distinct

class KmvSpec extends AnyFunSuite {

  test("exact below k, ≈15% accurate above k, merge-stable across partitions") {
    val spark = TestSpark.spark
    import spark.implicits._
    // below k → exact
    val small = (1 to 100).map(i => i % 40).toDF("v").repartition(8)
    assert(small.agg(kmv_distinct(col("v"), 256)).head().getLong(0) == 40L)
    // above k → within KMV error (~1/sqrt(k))
    val n = 20000
    val big = (1 to n).toDF("v").repartition(16)
    val est = big.agg(kmv_distinct(col("v"), 256)).head().getLong(0)
    assert(math.abs(est - n).toDouble / n < 0.2, s"est=$est true=$n")
    // deterministic across runs (seeded hash, no randomness)
    val est2 = big.agg(kmv_distinct(col("v"), 256)).head().getLong(0)
    assert(est == est2)
  }

  test("per-group sketch on events matches exact distinct within tolerance") {
    val spark = TestSpark.spark
    val ev = Tables.events(spark, TestSpark.sf0001)
    val got = ev.groupBy(col("event_type"))
      .agg(kmv_distinct(col("user_id"), 64).as("est"),
        countDistinct(col("user_id")).as("exact"))
      .collect()
    got.foreach { r =>
      val est = r.getAs[Long]("est"); val exact = r.getAs[Long]("exact")
      assert(math.abs(est - exact).toDouble / exact < 0.25, s"$r")
    }
  }
}
