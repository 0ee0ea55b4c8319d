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

  test("partitioned layout prunes directories at planning time") {
    val spark = TestSpark.spark
    val out = java.nio.file.Files.createTempDirectory("part_layout").toString
    val li = Tables.lineitem(spark, TestSpark.sf0001)
      .select(col("l_orderkey"), col("l_shipdate"), col("l_quantity"), col("l_returnflag"))
    ScaleJoins.writePartitioned(li, out, "l_returnflag", "l_shipdate")
    val r = spark.read.parquet(out).where(col("l_returnflag") === "R")
    val plan = r.queryExecution.executedPlan.toString
    // the returnflag predicate lands in PartitionFilters (directory-level
    // pruning), not in the row-level PushedFilters
    assert(plan.contains("PartitionFilters: ["), plan)
    assert("PartitionFilters: \\[[^\\]]*l_returnflag".r.findFirstIn(plan).isDefined, plan)
    assert(r.count() == li.where(col("l_returnflag") === "R").count())
    // the executed scan's metrics prove pruning: of the 3 returnflag
    // directories only R's single file was listed and read
    r.collect()
    val exec = r.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val scan = exec.collectLeaves().collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.get
    assert(scan.metrics("numPartitions").value == 1, scan.metrics("numPartitions").value)
    // range repartitioning bounds files per directory at the shuffle
    // parallelism (not one per input task, not all in one task)
    val shufflePartitions = spark.conf.get("spark.sql.shuffle.partitions").toInt
    assert(scan.metrics("numFiles").value <= shufflePartitions, scan.metrics("numFiles").value)
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
