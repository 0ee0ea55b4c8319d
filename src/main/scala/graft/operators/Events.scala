package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Event-time operators (SURVEY.md §2.2 streaming family), in their
  * batch-checkable form. The *same logical transformations* compiled as
  * Structured Streaming live in [[graft.streaming.Streams]]; the batch forms
  * here are what the DuckDB oracle verifies.
  *
  * All bucket/“session start” columns are emitted as epoch seconds (BIGINT)
  * rather than timestamps so the hash compare is dialect-stable (SURVEY §7.4).
  *
  * Scale: every query is a single shuffle on (window-bucket | user_id); the
  * tumbling/sliding aggregations are partial-aggregated map-side, so the
  * shuffle volume is #distinct buckets, not #events.
  */
object Events {
  type Q = (SparkSession, String) => DataFrame

  private def epochS(c: org.apache.spark.sql.Column) = unix_timestamp(c)

  /** 5-minute tumbling window per event type, via the native `window()`
    * expression (identical to the Structured Streaming plan). */
  val tumblingWindow: Q = (s, d) =>
    Tables.events(s, d)
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sum_v"))
      .select(epochS(col("window.start")).as("w_start"), col("event_type"), col("n"), col("sum_v"))
      .orderBy(col("w_start"), col("event_type"))

  /** 10-minute window sliding every 5 — each event contributes to exactly 2
    * windows (Spark expands via an Expand node; shuffle stays bucket-sized). */
  val slidingWindow: Q = (s, d) =>
    Tables.events(s, d)
      .groupBy(window(col("ts"), "10 minutes", "5 minutes"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sum_v"))
      .select(epochS(col("window.start")).as("w_start"), col("n"), col("sum_v"))
      .orderBy(col("w_start"))

  /** Session windows with a 30-minute gap per user, via the native
    * `session_window` expression (batch-supported since Spark 3.2). A new
    * session starts when the gap to the previous event is >= 30 min. */
  val sessionWindow: Q = (s, d) =>
    Tables.events(s, d)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sum_v"))
      .select(col("user_id"), epochS(col("session_window.start")).as("sess_start"),
        col("n"), col("sum_v"))
      .orderBy(col("user_id"), col("sess_start"))

  /** Watermark-style late-data policy, batch emulation: relative to the
    * per-event-type max event time, events more than 10 minutes behind are
    * "late" and dropped from the aggregate (documented divergence: streaming
    * watermarks are per-trigger monotonic, the batch form uses the final max —
    * the strictest watermark). */
  val lateDataPolicy: Q = (s, d) => {
    // per-type max via groupBy + broadcast join back, NOT a window: a window
    // partitioned by a ~5-value key funnels 20% of all events into single
    // sort tasks (12.9 s at sf0.1, unbounded skew at scale); the aggregate
    // is map-side partial and the join side is 5 rows
    val ev = Tables.events(s, d)
    val maxPerType = ev.groupBy(col("event_type")).agg(max(col("ts")).as("max_ts"))
    ev.join(broadcast(maxPerType), Seq("event_type"))
      .withColumn("is_late",
        col("ts") < col("max_ts") - expr("INTERVAL 10 MINUTES"))
      .groupBy(col("event_type"))
      .agg(count(when(col("is_late"), 1)).as("n_late"),
        count(when(!col("is_late"), 1)).as("n_ok"),
        round(sum(when(!col("is_late"), col("value"))), 4).as("sum_ok"))
      .orderBy(col("event_type"))
  }

  /** Deterministic stateful dedup: first event per (user_id, event_type) in
    * event-time order — the batch twin of dropDuplicatesWithinWatermark
    * (which keeps the first arrival; here "first" is by event time + id so
    * the oracle is stable). */
  val statefulDedup: Q = (s, d) => {
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    Tables.events(s, d)
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("user_id"), col("event_type"), col("event_id").as("first_event_id"),
        epochS(col("ts")).as("first_ts"), round(col("value"), 4).as("first_value"))
      .orderBy(col("user_id"), col("event_type"))
  }

  val queries: Map[String, Q] = Map(
    "q_tumbling_window"  -> tumblingWindow,
    "q_sliding_window"   -> slidingWindow,
    "q_session_window"   -> sessionWindow,
    "q_late_data_policy" -> lateDataPolicy,
    "q_stateful_dedup"   -> statefulDedup,
  )

  val oracles: Map[String, String] = Map(
    "q_tumbling_window" ->
      """SELECT CAST(floor(epoch(ts) / 300) * 300 AS BIGINT) AS w_start, event_type,
        | count(*) AS n, round(sum(value), 4) AS sum_v
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_sliding_window" ->
      """WITH b AS (SELECT CAST(floor(epoch(ts) / 300) * 300 AS BIGINT) AS b0, value FROM events),
        |u AS (SELECT b0 AS w_start, value FROM b
        |      UNION ALL SELECT b0 - 300, value FROM b)
        |SELECT w_start, count(*) AS n, round(sum(value), 4) AS sum_v
        |FROM u GROUP BY w_start ORDER BY w_start""".stripMargin,
    "q_session_window" ->
      """WITH x AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
        |           OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) >= INTERVAL 30 MINUTE
        |         THEN 1 ELSE 0 END AS is_new
        |  FROM events),
        |sess AS (
        |  SELECT user_id, ts, value,
        |    sum(is_new) OVER (PARTITION BY user_id ORDER BY ts ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM x)
        |SELECT user_id, CAST(floor(epoch(min(ts))) AS BIGINT) AS sess_start,
        | count(*) AS n, round(sum(value), 4) AS sum_v
        |FROM sess GROUP BY user_id, sid ORDER BY user_id, sess_start""".stripMargin,
    "q_late_data_policy" ->
      """WITH x AS (
        |  SELECT event_type, value,
        |    ts < max(ts) OVER (PARTITION BY event_type) - INTERVAL 10 MINUTE AS is_late
        |  FROM events)
        |SELECT event_type,
        | count(*) FILTER (is_late) AS n_late,
        | count(*) FILTER (NOT is_late) AS n_ok,
        | round(sum(value) FILTER (NOT is_late), 4) AS sum_ok
        |FROM x GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_stateful_dedup" ->
      """SELECT user_id, event_type, first_event_id, first_ts, first_value FROM (
        |  SELECT user_id, event_type, event_id AS first_event_id,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS first_ts, round(value, 4) AS first_value,
        |    row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS rn
        |  FROM events) t
        |WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin,
  )
}
