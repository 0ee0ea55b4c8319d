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

  test("bucketed multiway fact join has NO Exchange on the fact keys") {
    val spark = TestSpark.spark
    // full query once: builds the bucketed tables AND must match the
    // unbucketed answer (the oracle also pins this cross-engine)
    val got = Relational.joinMultiwayBucketed(spark, TestSpark.sf0001).collect().toSeq
    val want = Relational.joinMultiway(spark, TestSpark.sf0001).collect().toSeq
    assert(got == want)
    // plan of the read side with broadcast off (at 100 TB both facts are
    // broadcast-ineligible — that's when bucketing earns its keep): the
    // lineitem⋈orders leg must be a co-located SortMergeJoin with NO
    // Exchange on either fact key; the only hash Exchange allowed is the
    // one under the n_name groupBy
    val prev = spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    val prevA = spark.conf.getOption("spark.sql.adaptive.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      val p = Relational.bucketedMultiwayJoin(spark, TestSpark.sf0001)
        .queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin [l_orderkey"), p)
      assert(!p.contains("Exchange hashpartitioning(l_orderkey"), p)
      assert(!p.contains("Exchange hashpartitioning(o_orderkey"), p)
      assert(p.contains("Bucketed: true"), p)
    } finally {
      prev.fold(spark.conf.unset("spark.sql.autoBroadcastJoinThreshold"))(
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", _))
      prevA.fold(spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold"))(
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", _))
    }
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

  test("cross join is a broadcast nested loop over metadata-bounded sides") {
    val p = plan(Relational.joinCross)
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
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

  test("AQE splits a skewed sort-merge join at runtime (skew=true in the final plan)") {
    // the engine's answer to hot keys the static planner can't see
    // (GraftSession ships adaptive.skewJoin.enabled=true): a 95%-hot-key
    // build is split across reducers by OptimizeSkewedJoin. Fixture scale
    // is below the default 256 MB thresholds, so pin them down to prove
    // the config surface produces the runtime re-plan — the same move the
    // bloom-filter test above makes.
    val spark = TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, when}
    val conf = spark.conf
    val keys = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor")
    val saved = keys.map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      // shuffle blocks are lz4-compressed, so thresholds are on COMPRESSED
      // bytes — keep them tiny and the payload pseudo-random so the hot
      // partition clears them
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      // 95% of the big side shares one key — one reducer would take ~all rows
      val big = spark.range(200000)
        .select((when(col("id") % 20 =!= 0, 7L).otherwise(col("id"))).as("k"),
          (col("id") * 2654435761L % 1000000007L).as("payload"))
      val small = spark.range(1000).select(col("id").as("k"), (col("id") * 2).as("w"))
      // note: a downstream groupBy(k) would REUSE the join's partitioning,
      // so splitting the skewed partition would add a shuffle and the rule
      // (correctly) declines; a global aggregate has no such requirement
      val joined = big.join(small, "k")
        .agg(org.apache.spark.sql.functions.count(col("payload")).as("n"))
      val rows = joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(2000))
      assert(plan.contains("skew=true"), plan.take(2000))
      // and the split must not change results: every hot-key row joined once
      assert(rows.head.getLong(0) == 190050L)
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

  test("every unpartitioned Window in a declared query sits on a bounded (aggregated) domain") {
    // r15 verdict #3: an unpartitioned WindowExec funnels its whole input
    // through ONE task — acceptable only when that input is provably
    // bounded (a distinct/aggregate of a low-cardinality domain, e.g.
    // q_domain_pagerank's site dimension), never the raw corpus. Sweep
    // every declared query's optimized logical plan so a fixture or
    // operator change can't silently turn one into a corpus funnel.
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Deduplicate, GlobalLimit, LogicalPlan, Window => LWindow}
    val spark = TestSpark.spark
    def bounded(p: LogicalPlan): Boolean =
      p.collectFirst {
        case _: Aggregate => ()
        case _: Deduplicate => ()
        case _: GlobalLimit => ()
      }.isDefined
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val lp = fn(spark, TestSpark.sf0001).queryExecution.optimizedPlan
      lp.foreach {
        case w: LWindow if w.partitionSpec.isEmpty =>
          assert(bounded(w.child),
            s"$name: unpartitioned Window over a non-aggregated (corpus-sized) input:\n${w.treeString.take(2000)}")
        case _ => ()
      }
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
  }
}
