package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Events, Relational, Vectors}

/** Plan-shape assertions — the 100 TB contract is as much about the physical
  * plan as the answer: filters/projections must reach the parquet scan,
  * dimension joins must broadcast, global top-k must not global-sort. */
class PlanSpec extends AnyFunSuite {
  private def plan(q: Relational.Q): String =
    q(TestSpark.spark, TestSpark.sf0001).queryExecution.executedPlan.toString

  test("scan query pushes filters and prunes columns at the parquet scan") {
    val p = plan(Relational.scanProjectFilter)
    assert(p.contains("PushedFilters: [IsNotNull"), p)
    assert(p.contains("GreaterThanOrEqual(l_shipdate"), p)
    // only the needed columns reach the reader
    assert(p.contains("ReadSchema") && !p.contains("l_partkey"), p)
  }

  test("multiway join broadcasts the dimension tables") {
    val p = plan(Relational.joinMultiway)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("BroadcastExchange"), p)
  }

  test("semi/anti joins plan as LeftSemi/LeftAnti hash joins") {
    assert(plan(Relational.joinSemi).contains("LeftSemi"))
    assert(plan(Relational.joinAnti).contains("LeftAnti"))
  }

  test("order-by-limit plans TakeOrderedAndProject, not a global sort") {
    val p = plan(Relational.sortLimit)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("pricing summary partial-aggregates map-side before the shuffle") {
    val p = plan(Relational.pricingSummary)
    assert(p.contains("partial_sum") || p.contains("partial"), p)
  }

  test("late-data policy has NO window over the 5-value event_type (skew funnel)") {
    val p = plan(Events.lateDataPolicy)
    assert(!p.contains("Window"), p)
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"), p)
  }

  test("range join is bucket equi-joins, never a nested-loop pair join") {
    val p = plan(Relational.joinRange)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("set ops share one aggregation subtree (exchange planned once, reused)") {
    // AQE materializes exchange reuse only in the final plan — execute first
    val df = Relational.setOps(TestSpark.spark, TestSpark.sf0001)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("ReusedExchange"), p.take(4000))
  }

  test("simhash pair scoring stays codegen (bit_count builtin, no Scala UDF)") {
    val p = plan(Vectors.simhashDedup)
    assert(p.contains("bit_count"), p)
    assert(!p.toLowerCase.contains("scalaudf"), p)
  }

  test("term-freq, tfidf and per-group sampling use the heap operator, not a Window sort") {
    import graft.operators.Text
    for (q <- Seq(Text.termFreq, Text.tfidf, Text.samplePerGroup)) {
      val p = plan(q)
      assert(p.contains("TopKPerGroup"), p.take(2000))
      assert(!p.contains("Window"), p.take(2000))
    }
  }

  test("selective shuffle join gets a runtime bloom filter on the fact side") {
    // At 100 TB a selective dimension filter should reach the fact scan as a
    // runtime bloom semi-filter (Spark's InjectRuntimeFilter), cutting the
    // shuffled fact rows before the join. Local fixtures are below the
    // injection thresholds and broadcast-join sized, so pin both down to
    // prove the engine's config surface actually produces the plan.
    val spark = TestSpark.spark
    import org.apache.spark.sql.functions.col
    val conf = spark.conf
    val keys = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold")
    val saved = keys.map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
      val li = Tables.lineitem(spark, TestSpark.sf0001)
      val ord = Tables.orders(spark, TestSpark.sf0001)
        .where(col("o_totalprice") > 400000.0)
      val joined = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority")).count()
      val p = joined.queryExecution.optimizedPlan.toString
      assert(p.contains("might_contain"), p.take(3000))
      assert(p.contains("bloom_filter_agg"), p.take(3000))
    } finally {
      saved.foreach { case (k, v) =>
        v.fold(conf.unset(k))(x => conf.set(k, x))
      }
    }
  }

  test("cosine top-k runs on the fused native vec_cosine, no interpreted higher-order fold") {
    val p = plan(Vectors.cosineTopk)
    assert(p.contains("vec_cosine"), p)
    assert(!p.contains("aggregate(zip_with"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }
}
