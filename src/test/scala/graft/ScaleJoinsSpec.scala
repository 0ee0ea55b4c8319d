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

  test("zValue interleaves bits (a even, b odd)") {
    val spark = TestSpark.spark
    import spark.implicits._
    val got = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (65535L, 65535L))
      .toDF("a", "b")
      .select(ScaleJoins.zValue(col("a"), col("b")))
      .collect().map(_.getLong(0)).toSeq
    // 3=011 at even bits -> 5; 5=101 at odd bits -> 34; 5|34 = 39
    assert(got == Seq(0L, 1L, 2L, 39L, (1L << 32) - 1))
  }

  test("z-ordered layout prunes row groups on the SECOND dimension too") {
    val spark = TestSpark.spark
    val li = Tables.lineitem(spark, TestSpark.sf0001)
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"), col("l_quantity"))
    val zDir = java.nio.file.Files.createTempDirectory("zorder").toString
    val linDir = java.nio.file.Files.createTempDirectory("linear").toString
    ScaleJoins.writeZOrdered(li, zDir, "l_partkey", "l_suppkey", files = 16)
    // baseline: single-column sort — files are tight in l_partkey only
    li.repartitionByRange(16, col("l_partkey"))
      .sortWithinPartitions(col("l_partkey"))
      .write.mode("overwrite").parquet(linDir)

    val supHi = li.agg(max(col("l_suppkey"))).collect()(0).getLong(0) / 4
    def scanRows(dir: String): (Long, Long) = {
      val q = spark.read.parquet(dir).where(col("l_suppkey") <= supHi)
      // execute THIS queryExecution so its scan metrics populate
      val n = q.collect().length.toLong
      val agg = q.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      val scan = agg.collectLeaves().collectFirst {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }.get
      (scan.metrics("numOutputRows").value, n)
    }
    val (zRead, zMatch) = scanRows(zDir)
    val (linRead, linMatch) = scanRows(linDir)
    assert(zMatch == linMatch) // layout must not change results
    assert(zMatch == li.where(col("l_suppkey") <= supHi).count())
    // the linear layout decodes every row (suppkey unsorted in every file);
    // the z-ordered layout's footer stats skip non-overlapping files
    assert(linRead == li.count(), s"baseline unexpectedly pruned: $linRead")
    assert(zRead < (linRead * 6) / 10, s"z layout read $zRead of $linRead rows")
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
