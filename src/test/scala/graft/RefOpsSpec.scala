package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.RefOps

class RefOpsSpec extends AnyFunSuite {

  test("monotone dedup reference quirk: [0,5,3,7] keeps 0,5,7 — never 3") {
    val spark = TestSpark.spark
    import spark.implicits._
    val df = Seq((0L, 0L), (1L, 5L), (2L, 3L), (3L, 7L)).toDF("ord", "id")
    val winKept = RefOps.monotoneDedupWindow(df, "ord", "id")
      .select("id").as[Long].collect().sorted.toSeq
    val distKept = RefOps.monotoneDedup(df, "ord", "id")
      .select("id").as[Long].collect().sorted.toSeq
    assert(winKept == Seq(0L, 5L, 7L))
    assert(distKept == Seq(0L, 5L, 7L))
  }

  test("distributed and window monotone dedup agree on events (sf0.001)") {
    val spark = TestSpark.spark
    import spark.implicits._
    val ev = Tables.events(spark, TestSpark.sf0001).select($"event_id", $"user_id")
    val a = RefOps.monotoneDedup(ev, "event_id", "user_id")
      .select("event_id").as[Long].collect().sorted.toSeq
    val b = RefOps.monotoneDedupWindow(ev, "event_id", "user_id")
      .select("event_id").as[Long].collect().sorted.toSeq
    assert(a == b && a.nonEmpty)
  }

  test("monotone dedup output ids strictly increase in scan order") {
    val spark = TestSpark.spark
    import spark.implicits._
    val ev = Tables.events(spark, TestSpark.sf0001).select($"event_id", $"user_id")
    val kept = RefOps.monotoneDedup(ev, "event_id", "user_id")
      .orderBy("event_id").select("user_id").as[Long].collect().toSeq
    assert(kept == kept.sorted && kept.distinct == kept)
  }
}
