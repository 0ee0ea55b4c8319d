package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Relational

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
}
