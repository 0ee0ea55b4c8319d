package graft

import org.scalatest.funsuite.AnyFunSuite

/** Replicates the driver's smoke check on the flagship entry. */
class EntrySpec extends AnyFunSuite {
  test("SparkEntry.entry returns rows and every point is within the bound") {
    val df = SparkEntry.entry(TestSpark.spark)
    val rows = df.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Boolean]("within_bound")))
  }

  test("every query key with oracle SQL exists in queries") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
    // 118 keys (100 oracle-checked) as of round 6 — a drop means a key was
    // accidentally unwired, not that this floor is stale
    assert(SparkEntry.queries.size >= 118)
    assert(SparkEntry.oracleSql.size >= 100)
  }
}
