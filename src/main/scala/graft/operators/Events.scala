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

  /** Ordered-funnel analysis (view → click → purchase, each stage strictly
    * after the previous): per user, the earliest view, the earliest click
    * after it, the earliest purchase after that. Expressed as three chained
    * filter→groupBy(user).min stages instead of a per-user event-sequence
    * sort: every stage is map-side partial-aggregable and all joins are
    * keyed on user_id (co-partitioned after the first shuffle), so no
    * per-user event list is ever materialized — the funnel shape that
    * survives a 100 TB event log with power-law users.
    *
    * Timestamps are compared and emitted as epoch MICROseconds: the fixture
    * carries nanosecond timestamps, Spark reads them at microsecond
    * precision, so µs is the finest grain both the engine and the DuckDB
    * oracle agree on (a strict `>` at nanosecond grain could admit a pair
    * Spark cannot distinguish). */
  val eventFunnel: Q = (s, d) => {
    val ev = Tables.events(s, d).select(col("user_id"), col("event_type"),
      unix_micros(col("ts")).as("us"))
    val s1 = ev.where(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("us")).as("t1"))
    val s2 = ev.where(col("event_type") === "click").join(s1, Seq("user_id"))
      .where(col("us") > col("t1"))
      .groupBy(col("user_id")).agg(min(col("us")).as("t2"))
    val s3 = ev.where(col("event_type") === "purchase").join(s2, Seq("user_id"))
      .where(col("us") > col("t2"))
      .groupBy(col("user_id")).agg(min(col("us")).as("t3"))
    s1.join(s2, Seq("user_id"), "left").join(s3, Seq("user_id"), "left")
      .select(col("user_id"),
        col("t1").as("view_us"),
        coalesce(col("t2"), lit(-1L)).as("click_us"),
        coalesce(col("t3"), lit(-1L)).as("purchase_us"),
        (lit(1) + when(col("t2").isNotNull, 1).otherwise(0)
          + when(col("t3").isNotNull, 1).otherwise(0)).cast("long").as("stage"))
      .orderBy(col("user_id"))
  }

  /** Cohort retention: users grouped by signup day, counted once per
    * (cohort day, day offset) they were active on. Two keyed aggregations
    * (cohort min per user, distinct user-day activity) and one user-keyed
    * join — the distinct is the only row-expander and is bounded by
    * users × days. */
  val cohortRetention: Q = (s, d) => {
    val ev = Tables.events(s, d)
    val cohort = ev.where(col("event_type") === "signup")
      .groupBy(col("user_id"))
      .agg(epochS(date_trunc("day", min(col("ts")))).as("d0"))
    val active = ev
      .select(col("user_id"), epochS(date_trunc("day", col("ts"))).as("da"))
      .distinct()
    cohort.join(active, Seq("user_id"))
      .where(col("da") >= col("d0"))
      .groupBy(col("d0").as("cohort_day"),
        ((col("da") - col("d0")) / 86400).cast("long").as("day_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("cohort_day"), col("day_offset"))
  }

  /** Clickstream transition matrix (first-order Markov estimate): counts
    * and conditional probabilities of consecutive event-type pairs within
    * each user's time-ordered stream. ONE window pass partitioned by
    * user_id — high-cardinality partitions, so the sort parallelizes (the
    * anti-pattern is partitioning a window by event_type, see
    * q_late_data_policy's history) — then the S² transition aggregate is
    * map-side partial. Event order is (µs, event_id): microseconds is the
    * finest grain Spark and the nanosecond-timestamp oracle agree on, and
    * the id tiebreak makes the sequence — not just the output — engine-
    * independent. */
  val eventTransitions: Q = (s, d) => {
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
    val pairs = Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("event_type").as("to_type"),
        unix_micros(col("ts")).as("us"))
      .withColumn("from_type", lag(col("to_type"), 1).over(w))
      .where(col("from_type").isNotNull)
    val counts = pairs.groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    val totals = counts.groupBy(col("from_type")).agg(sum(col("n")).as("n_from"))
    counts.join(broadcast(totals), Seq("from_type"))
      .select(col("from_type"), col("to_type"), col("n"),
        round(col("n").cast("double") / col("n_from"), 4).as("p_r"))
      .orderBy(col("from_type"), col("to_type"))
  }

  /** Attribution lookback window in microseconds — shared by the batch key,
    * its oracle, and the watermarked stream-stream join twin
    * ([[graft.streaming.Streams.attributionStream]]). */
  val AttributionWindowUs: Long = 7200L * 1000000L

  /** Purchase→view attribution pairs: every (purchase, view) where the same
    * user's view precedes the purchase by at most [[AttributionWindowUs]] —
    * the batch form of the watermarked STREAM-STREAM JOIN (the one
    * Structured Streaming operator shape the windowed-aggregation family
    * doesn't cover; twin in [[graft.streaming.Streams.attributionStream]]).
    *
    * Scale shape: two filtered projections of the same scan, equi-joined on
    * user_id — both sides shuffle once on the join key and the time bound is
    * a residual predicate, so cost is Θ(pairs within the window), never a
    * cross product. In the streaming twin the same bound is what lets the
    * state store evict: a view older than the window below the purchase-side
    * watermark can never match again. Pairs (not a per-purchase argmin) are
    * the contract precisely so the two forms can be replay-equal — an argmin
    * over a stream-stream join would need a second watermarked aggregation.
    *
    * Timestamps compare at epoch MICROseconds for the same reason as
    * [[eventFunnel]]. */
  val eventAttribution: Q = (s, d) => {
    val ev = Tables.events(s, d)
    val views = ev.where(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("view_id"),
        unix_micros(col("ts")).as("view_us"))
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        unix_micros(col("ts")).as("purchase_us"))
    purchases.join(views, Seq("user_id"))
      .where(col("view_us") < col("purchase_us") &&
        col("purchase_us") - col("view_us") <= AttributionWindowUs)
      .select(col("purchase_id"), col("user_id"), col("purchase_us"),
        col("view_id"), col("view_us"),
        (col("purchase_us") - col("view_us")).as("gap_us"))
      .orderBy(col("purchase_id"), col("view_id"))
  }

  /** Left-outer sibling of [[eventAttribution]]: EVERY purchase is
    * reported, unattributed ones with -1 sentinels — the batch form of the
    * watermarked left-outer stream-stream join, whose streaming semantics
    * (unmatched rows emit only when the watermark proves no future match
    * can arrive) StreamingSpec exercises with a multi-batch replay. Same
    * join shape as the inner form; the outer rows add Θ(unmatched
    * purchases). */
  val eventAttributionOuter: Q = (s, d) => {
    val ev = Tables.events(s, d)
    val views = ev.where(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("event_id").as("view_id"),
        unix_micros(col("ts")).as("view_us"))
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        unix_micros(col("ts")).as("purchase_us"))
    purchases.join(views,
        col("user_id") === col("v_user") &&
        col("view_us") < col("purchase_us") &&
        col("purchase_us") - col("view_us") <= AttributionWindowUs, "left")
      .select(col("purchase_id"), col("user_id"), col("purchase_us"),
        coalesce(col("view_id"), lit(-1L)).as("view_id"),
        coalesce(col("view_us"), lit(-1L)).as("view_us"),
        coalesce(col("purchase_us") - col("view_us"), lit(-1L)).as("gap_us"))
      .orderBy(col("purchase_id"), col("view_id"))
  }

  val queries: Map[String, Q] = Map(
    "q_event_attribution" -> eventAttribution,
    "q_event_attribution_outer" -> eventAttributionOuter,
    "q_event_transitions" -> eventTransitions,
    "q_tumbling_window"  -> tumblingWindow,
    "q_sliding_window"   -> slidingWindow,
    "q_session_window"   -> sessionWindow,
    "q_late_data_policy" -> lateDataPolicy,
    "q_stateful_dedup"   -> statefulDedup,
    "q_event_funnel"     -> eventFunnel,
    "q_cohort_retention" -> cohortRetention,
  )

  val oracles: Map[String, String] = Map(
    "q_event_attribution" ->
      s"""WITH v AS (
        |  SELECT user_id, event_id AS view_id, epoch_us(ts) AS view_us
        |  FROM events WHERE event_type = 'view'),
        |p AS (
        |  SELECT user_id, event_id AS purchase_id, epoch_us(ts) AS purchase_us
        |  FROM events WHERE event_type = 'purchase')
        |SELECT p.purchase_id, p.user_id, p.purchase_us, v.view_id, v.view_us,
        |  p.purchase_us - v.view_us AS gap_us
        |FROM p JOIN v ON p.user_id = v.user_id
        |WHERE v.view_us < p.purchase_us
        |  AND p.purchase_us - v.view_us <= ${AttributionWindowUs}
        |ORDER BY p.purchase_id, v.view_id""".stripMargin,
    "q_event_attribution_outer" ->
      s"""WITH v AS (
        |  SELECT user_id, event_id AS view_id, epoch_us(ts) AS view_us
        |  FROM events WHERE event_type = 'view'),
        |p AS (
        |  SELECT user_id, event_id AS purchase_id, epoch_us(ts) AS purchase_us
        |  FROM events WHERE event_type = 'purchase')
        |SELECT p.purchase_id, p.user_id, p.purchase_us,
        |  coalesce(v.view_id, -1) AS view_id,
        |  coalesce(v.view_us, -1) AS view_us,
        |  coalesce(p.purchase_us - v.view_us, -1) AS gap_us
        |FROM p LEFT JOIN v ON p.user_id = v.user_id
        |  AND v.view_us < p.purchase_us
        |  AND p.purchase_us - v.view_us <= ${AttributionWindowUs}
        |ORDER BY 1, 4""".stripMargin,
    "q_event_transitions" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type AS to_type, epoch_us(ts) AS us FROM events),
        |p AS (
        |  SELECT lag(to_type) OVER (PARTITION BY user_id ORDER BY us, event_id) AS from_type,
        |    to_type
        |  FROM e),
        |c AS (
        |  SELECT from_type, to_type, count(*) AS n FROM p
        |  WHERE from_type IS NOT NULL GROUP BY 1, 2),
        |t AS (SELECT from_type, sum(n) AS n_from FROM c GROUP BY 1)
        |SELECT c.from_type, c.to_type, CAST(c.n AS BIGINT) AS n,
        | round(CAST(c.n AS DOUBLE) / t.n_from, 4) AS p_r
        |FROM c JOIN t USING (from_type) ORDER BY from_type, to_type""".stripMargin,
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
    "q_event_funnel" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
        |s1 AS (SELECT user_id, min(us) AS t1 FROM e WHERE event_type = 'view' GROUP BY user_id),
        |s2 AS (SELECT e.user_id, min(e.us) AS t2 FROM e JOIN s1 USING (user_id)
        |       WHERE e.event_type = 'click' AND e.us > s1.t1 GROUP BY e.user_id),
        |s3 AS (SELECT e.user_id, min(e.us) AS t3 FROM e JOIN s2 USING (user_id)
        |       WHERE e.event_type = 'purchase' AND e.us > s2.t2 GROUP BY e.user_id)
        |SELECT s1.user_id, s1.t1 AS view_us,
        |  coalesce(s2.t2, -1) AS click_us,
        |  coalesce(s3.t3, -1) AS purchase_us,
        |  CAST(1 + CASE WHEN s2.user_id IS NOT NULL THEN 1 ELSE 0 END
        |         + CASE WHEN s3.user_id IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS stage
        |FROM s1 LEFT JOIN s2 ON s1.user_id = s2.user_id
        |        LEFT JOIN s3 ON s1.user_id = s3.user_id
        |ORDER BY s1.user_id""".stripMargin,
    "q_cohort_retention" ->
      """WITH c AS (
        |  SELECT user_id, CAST(floor(epoch(date_trunc('day', min(ts)))) AS BIGINT) AS d0
        |  FROM events WHERE event_type = 'signup' GROUP BY user_id),
        |a AS (SELECT DISTINCT user_id,
        |        CAST(floor(epoch(date_trunc('day', ts))) AS BIGINT) AS da
        |      FROM events)
        |SELECT c.d0 AS cohort_day, (a.da - c.d0) // 86400 AS day_offset,
        |  count(DISTINCT c.user_id) AS n_users
        |FROM c JOIN a USING (user_id) WHERE a.da >= c.d0
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_stateful_dedup" ->
      """SELECT user_id, event_type, first_event_id, first_ts, first_value FROM (
        |  SELECT user_id, event_type, event_id AS first_event_id,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS first_ts, round(value, 4) AS first_value,
        |    row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS rn
        |  FROM events) t
        |WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin,
  )
}
