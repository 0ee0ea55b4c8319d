package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.ScaleJoins

class ScaleJoinsSpec extends AnyFunSuite {

  test("salted join equals plain join on skewed data") {
    val spark = TestSpark.spark
    import spark.implicits._
    // 90% of rows share one hot key
    val big = (1 to 2000).map(i => (if (i % 10 == 0) i.toLong else 7L, i))
      .toDF("k", "payload")
    val small = Seq((7L, "hot"), (10L, "a"), (20L, "b")).toDF("k", "name")
    val plain = big.join(small, "k")
      .orderBy("k", "payload").collect().toSeq
    val salted = ScaleJoins.saltedJoin(big, small, "k", salt = 8)
      .select(col("k"), col("payload"), col("name"))
      .orderBy("k", "payload").collect().toSeq
    assert(salted == plain && plain.nonEmpty)
  }

  test("bucketed tables join without a shuffle Exchange") {
    val spark = TestSpark.spark
    val o = Tables.orders(spark, TestSpark.sf0001)
    val li = Tables.lineitem(spark, TestSpark.sf0001)
    ScaleJoins.writeBucketed(o.select(col("o_orderkey"), col("o_totalprice")),
      "b_orders", "o_orderkey", 4)
    ScaleJoins.writeBucketed(
      li.select(col("l_orderkey").as("o_orderkey"), col("l_quantity")),
      "b_lineitem", "o_orderkey", 4)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    val joined =
      try {
        val j = spark.table("b_orders").join(spark.table("b_lineitem"), "o_orderkey")
        val plan = j.queryExecution.executedPlan.toString
        assert(plan.contains("SortMergeJoin"), plan)
        assert(!plan.contains("Exchange hashpartitioning"), plan) // co-located: zero shuffle
        j
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    // and it still computes the right thing
    val n = joined.count()
    val want = o.join(li, col("o_orderkey") === col("l_orderkey")).count()
    assert(n == want)
  }
}
