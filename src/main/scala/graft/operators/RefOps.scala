package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Reference-semantics operators (SURVEY.md §2.1 R7, R8, R12, R14, R17–R24)
  * recast onto the driver's `events` table: `user_id` ≈ GLL point, `ts` ≈
  * step, `event_type` ≈ force/param label, `value` ≈ field amplitude.
  *
  * The seisdb-specific binary ingest + encode pipeline itself lives in
  * [[graft.sources]] / [[graft.functions]]; these queries exercise the same
  * relational semantics on oracle-checkable data.
  */
object RefOps {
  type Q = (SparkSession, String) => DataFrame

  /** Reference R7 (`ibool_reader.py:133-141`): monotone first-occurrence
    * dedup — scanning in `orderCol` order, keep a row only when `idCol`
    * strictly exceeds the running maximum seen so far. NOT a plain
    * dropDuplicates: an id whose first occurrence is below the running max is
    * dropped entirely (e.g. ids [0,5,3,7] keep 0,5,7 — never 3).
    *
    * Scalable two-phase implementation (no single-partition global window):
    *  1. range-repartition by `orderCol` and sort within partitions — global
    *     order across sorted partition ranges;
    *  2. per-partition max of `idCol` → driver (one long per partition);
    *  3. broadcast exclusive prefix maxima; each partition streams its rows
    *     against its own running max seeded with the prefix.
    * Cost: 2 passes over the (cached) partitioned data, one tiny collect.
    * At 1000 executors this is the textbook distributed prefix-scan; the
    * naive `Window.orderBy` form (see [[monotoneDedupWindow]]) would funnel
    * 100 TB through one task.
    */
  def monotoneDedup(df: DataFrame, orderCol: String, idCol: String): DataFrame = {
    val spark = df.sparkSession
    val n = math.max(1, spark.sessionState.conf.numShufflePartitions)
    val parted = df.repartitionByRange(n, col(orderCol))
      .sortWithinPartitions(orderCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val schema = parted.schema
    val idIdx = schema.fieldIndex(idCol)
    def idOf(r: Row): Long = r.get(idIdx) match {
      case l: Long => l
      case i: Int  => i.toLong
      case other   => other.toString.toLong
    }
    val maxes = parted.rdd
      .mapPartitionsWithIndex { (i, it) =>
        var m = Long.MinValue
        it.foreach { r => val v = idOf(r); if (v > m) m = v }
        Iterator((i, m))
      }
      .collect().sortBy(_._1).map(_._2)
    // exclusive prefix max: partition i only needs the max over partitions < i
    val prefix = maxes.scanLeft(Long.MinValue)(math.max).dropRight(1)
    val bc = spark.sparkContext.broadcast(prefix)
    val kept = parted.rdd.mapPartitionsWithIndex { (i, it) =>
      var m = bc.value(i)
      it.filter { r => val v = idOf(r); if (v > m) { m = v; true } else false }
    }
    val out = spark.createDataFrame(kept, schema)
    parted.unpersist(blocking = false)
    out
  }

  /** Single-window reference implementation of R7 — correct but serial
    * (global order); kept for parity testing against [[monotoneDedup]]. */
  def monotoneDedupWindow(df: DataFrame, orderCol: String, idCol: String): DataFrame = {
    val w = Window.orderBy(col(orderCol)).rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("__runmax", max(col(idCol)).over(w))
      .where(col("__runmax").isNull || col(idCol) > col("__runmax"))
      .drop("__runmax")
  }

  val refMonotoneDedup: Q = (s, d) =>
    monotoneDedup(
      Tables.events(s, d).select(col("event_id"), col("user_id")),
      "event_id", "user_id")
      .orderBy(col("event_id"))

  /** R8/R12: strided subsample within a step range (every 50th id). */
  val refSubsample: Q = (s, d) =>
    Tables.events(s, d)
      .where(col("event_id") % 50 === 0 &&
        col("event_id").between(1000, 9000))
      .select(col("event_id"), col("user_id"), round(col("value"), 4).as("value_r"))
      .orderBy(col("event_id"))

  /** R14 (`strainfield_reader.py:57-59`): tensor reconstruction from
    * deviatoric components — pivot 3 measure types to columns, then the
    * derived-column arithmetic xx = xx_dev + trace/3, yy = yy_dev + trace/3,
    * zz = trace − xx − yy. Done with conditional aggregation (map-side
    * partial agg; shuffle is one row per user). */
  val refTensorReconstruct: Q = (s, d) => {
    val t  = coalesce(sum(when(col("event_type") === "view", col("value"))), lit(0.0))
    val xd = coalesce(sum(when(col("event_type") === "purchase", col("value"))), lit(0.0))
    val yd = coalesce(sum(when(col("event_type") === "click", col("value"))), lit(0.0))
    Tables.events(s, d)
      .groupBy(col("user_id"))
      .agg(t.as("trace"), xd.as("xx_dev"), yd.as("yy_dev"))
      .select(col("user_id"),
        round(col("trace"), 4).as("trace_r"),
        round(col("xx_dev") + col("trace") / 3.0, 4).as("xx"),
        round(col("yy_dev") + col("trace") / 3.0, 4).as("yy"),
        round(col("trace") - (col("xx_dev") + col("trace") / 3.0) - (col("yy_dev") + col("trace") / 3.0), 4).as("zz"))
      .orderBy(col("user_id"))
  }

  /** R17 (`DSGT.py:128-135`): gather a per-key ordered series into an array
    * column (collect_list + sort_array over (ts, id, value) structs), then
    * emit hashable arity stats. Scale note: per-key series must fit one
    * executor's task memory — true of the reference too (its dense buffer);
    * beyond that, series would be chunked by time range. */
  val refGatherSeries: Q = (s, d) => {
    val series = sort_array(collect_list(struct(col("ts"), col("event_id"), col("value"))))
    Tables.events(s, d)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"), series.as("series"))
      .select(col("user_id"), col("n"),
        round(element_at(col("series"), 1).getField("value"), 4).as("first_v"),
        round(element_at(col("series"), size(col("series"))).getField("value"), 4).as("last_v"))
      .orderBy(col("user_id"))
  }

  /** R18/R19 (`DSGT.py:139-146`): per-group min-offset + max-normalize to
    * [0,1], with the reference's ÷0-on-constant-series quirk guarded
    * (documented divergence, SURVEY §2.1 R19). */
  val refMinmaxNormalize: Q = (s, d) => {
    val w = Window.partitionBy(col("user_id"))
    Tables.events(s, d)
      .withColumn("offset", min(col("value")).over(w))
      .withColumn("scale", max(col("value")).over(w) - col("offset"))
      .select(col("event_id"), col("user_id"),
        round(when(col("scale") === 0.0, 0.0)
          .otherwise((col("value") - col("offset")) / col("scale")), 4).as("norm_v"))
      .orderBy(col("event_id"))
  }

  /** R20/R24 (`DSGT.py:149-152`): truncating 8-bit quantizer + dequantize;
    * reports per-group max/avg absolute error — the quantization-error bound
    * max_err < scale/255 is the property the golden test asserts. */
  val refQuantizeRoundtrip: Q = (s, d) => {
    val w = Window.partitionBy(col("user_id"))
    Tables.events(s, d)
      .withColumn("offset", min(col("value")).over(w))
      .withColumn("scale", max(col("value")).over(w) - col("offset"))
      .withColumn("code",
        when(col("scale") === 0.0, lit(0L))
          .otherwise(floor((col("value") - col("offset")) / col("scale") * 255.0)))
      .withColumn("deq", col("code") / 255.0 * col("scale") + col("offset"))
      .withColumn("err", abs(col("value") - col("deq")))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"),
        round(max(col("err")), 6).as("max_err"),
        round(avg(col("err")), 6).as("avg_err"),
        round(max(col("scale")), 4).as("scale_r"))
      .orderBy(col("user_id"))
  }

  /** R23 (`DSGT.py:179-194`): the header/stats catalog — per-key multi-agg
    * (count, min, max, scale, distinct series, byte size of an 8-bit
    * encoding). */
  val refHeaderStats: Q = (s, d) =>
    Tables.events(s, d)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("ngll_samples"),
        countDistinct(col("event_type")).as("n_series"),
        round(min(col("value")), 4).as("offset_r"),
        round(max(col("value")) - min(col("value")), 4).as("scale_r"),
        count(lit(1)).as("est_bytes"))
      .orderBy(col("user_id"))

  /** R17–R22 fused as the typed [[graft.functions.SeriesEncodeStats]]
    * Aggregator on events-as-proxy series (non-oracle: binary payload;
    * verified by the round-trip bound in the output + property tests). */
  val refBlobEncode: Q = (s, d) => {
    val spark = s
    import spark.implicits._
    val typeIdx = map_from_arrays(
      array(lit("click"), lit("error"), lit("purchase"), lit("signup"), lit("view")),
      array(lit(0), lit(1), lit(2), lit(3), lit(4)))
    Tables.events(s, d)
      .select(col("user_id").as("gll"), lit(0).as("force"),
        element_at(typeIdx, col("event_type")).as("param"),
        col("event_id").cast("int").as("step"), col("value"))
      .as[graft.functions.SeisSample]
      .groupByKey(_.gll)
      .agg(graft.functions.SeriesEncodeStats.toColumn.name("enc"))
      .toDF("user_id", "enc")
      .select(col("user_id"), col("enc.n").as("n"),
        col("enc.payloadLen").as("payload_len"), col("enc.crc").as("crc"),
        col("enc.maxErr").as("max_err"),
        (col("enc.maxErr") <= col("enc.scale") / 255.0 + lit(1e-12)).as("within_bound"))
      .orderBy(col("user_id"))
  }

  /** R1–R4/R14 binary ingest smoke over the synthetic SPECFEM fixture
    * (FIXTURES.md §B): per (force, step) record counts + checksums of the
    * reconstructed tensor. Non-oracle (DuckDB can't read Fortran bins). */
  val refFortranScan: Q = (s, _) => {
    val dir = graft.sources.SeisFixture.ensure()
    graft.sources.SeisPipeline.readStrain(s, dir)
      .groupBy(col("force"), col("step"))
      .agg(count(lit(1)).as("n_values"),
        round(sum(col("value")) * 1e7, 4).as("sum_scaled"))
      .orderBy(col("force"), col("step"))
  }

  /** E1 end-to-end: full SGT build on the fixture (non-oracle; golden test
    * asserts the quantization bound). */
  val refSgtPipeline: Q = (s, _) =>
    graft.sources.SeisPipeline.sgtPipeline(s, graft.sources.SeisFixture.ensure())

  /** E2 end-to-end: DGF build on the fixture. */
  val refDgfPipeline: Q = (s, _) =>
    graft.sources.SeisPipeline.dgfPipeline(s, graft.sources.SeisFixture.ensure())

  /** R5/R6/E3: element point-lookup read path on the fixture (non-oracle;
    * exact permutation semantics pinned by PipelineSpec). */
  val refElementLookup: Q = (s, _) => {
    val dir = graft.sources.SeisFixture.ensure()
    graft.sources.SeisPipeline.elementLookup(s, dir, indexElement = 2, use27 = true)
      .orderBy(col("pos"))
  }

  /** R24/R25 full cycle as a driver-visible query: build a 16-bit SGT
    * database, read it back through the consumer API ([[graft.sources
    * .SeisPipeline.readSgtDb]]), and report per-point decode stats — sample
    * count, the `step × dt` derived time span the stored `dt` enables, and
    * whether every decoded sample is inside the uint16 quantization bound.
    * Non-oracle (zlib payloads are engine-specific; SinkSpec pins the
    * value-level round trip). */
  val refDbRoundtrip: Q = (s, _) => {
    val dir = graft.sources.SeisFixture.ensure()
    val out = graft.sources.SeisFixture.defaultDir + "_dbrt"
    graft.sources.SeisPipeline.createSgtDb(s, dir, out, "CI", "RT", bits = 16)
    val blobs = s.read.parquet(out).select(col("gll"), col("scale"))
    graft.sources.SeisPipeline.readSgtDb(s, out)
      .join(blobs, Seq("gll"))
      .groupBy(col("gll"))
      .agg(count(lit(1)).as("n_samples"),
        round(max(col("t_sec")), 4).as("t_max"),
        max(col("step")).cast("long").as("step_max"),
        (max(abs(col("value"))) <= max(col("scale")) + abs(min(col("value")))).as("sane"))
      .orderBy(col("gll"))
  }

  /** R12: valid-step scan over the fixture's 3 force dirs (non-oracle). */
  val refValidSteps: Q = (s, _) => {
    val dir = graft.sources.SeisFixture.ensure()
    graft.sources.SeisPipeline.validSteps(s, dir, 0, 101, 10)
  }

  /** Sketch surface: approximate distinct (HLL++) — non-oracle by design
    * (approx results differ engine to engine; SURVEY §7.4 bans approx_* in
    * oracle-checked queries). */
  val refApproxDistinct: Q = (s, d) =>
    Tables.events(s, d)
      .groupBy(col("event_type"))
      .agg(approx_count_distinct(col("user_id"), 0.02).as("approx_users"),
        count(lit(1)).as("n"))
      .orderBy(col("event_type"))

  /** Custom TypedImperativeAggregate sketch (KMV) beside the exact count —
    * non-oracle (sketches are engine-specific by design). */
  val refKmvDistinct: Q = (s, d) =>
    Tables.events(s, d)
      .groupBy(col("event_type"))
      .agg(graft.functions.KmvDistinct.kmv_distinct(col("user_id"), 256).as("kmv_users"),
        countDistinct(col("user_id")).as("exact_users"))
      .orderBy(col("event_type"))

  val queries: Map[String, Q] = Map(
    "ref_monotone_dedup"     -> refMonotoneDedup,
    "ref_subsample"          -> refSubsample,
    "ref_tensor_reconstruct" -> refTensorReconstruct,
    "ref_gather_series"      -> refGatherSeries,
    "ref_minmax_normalize"   -> refMinmaxNormalize,
    "ref_quantize_roundtrip" -> refQuantizeRoundtrip,
    "ref_header_stats"       -> refHeaderStats,
    "ref_blob_encode"        -> refBlobEncode,
    "ref_fortran_scan"       -> refFortranScan,
    "ref_sgt_pipeline"       -> refSgtPipeline,
    "ref_dgf_pipeline"       -> refDgfPipeline,
    "ref_db_roundtrip"       -> refDbRoundtrip,
    "ref_element_lookup"     -> refElementLookup,
    "ref_valid_steps"        -> refValidSteps,
    "ref_approx_distinct"    -> refApproxDistinct,
    "ref_kmv_distinct"       -> refKmvDistinct,
  )

  val oracles: Map[String, String] = Map(
    "ref_monotone_dedup" ->
      """WITH x AS (
        |  SELECT event_id, user_id,
        |    max(user_id) OVER (ORDER BY event_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS rm
        |  FROM events)
        |SELECT event_id, user_id FROM x
        |WHERE rm IS NULL OR user_id > rm
        |ORDER BY event_id""".stripMargin,
    "ref_subsample" ->
      """SELECT event_id, user_id, round(value, 4) AS value_r
        |FROM events
        |WHERE event_id % 50 = 0 AND event_id BETWEEN 1000 AND 9000
        |ORDER BY event_id""".stripMargin,
    "ref_tensor_reconstruct" ->
      """WITH g AS (
        |  SELECT user_id,
        |    coalesce(sum(CASE WHEN event_type = 'view' THEN value END), 0.0) AS trace,
        |    coalesce(sum(CASE WHEN event_type = 'purchase' THEN value END), 0.0) AS xx_dev,
        |    coalesce(sum(CASE WHEN event_type = 'click' THEN value END), 0.0) AS yy_dev
        |  FROM events GROUP BY user_id)
        |SELECT user_id, round(trace, 4) AS trace_r,
        | round(xx_dev + trace / 3.0, 4) AS xx,
        | round(yy_dev + trace / 3.0, 4) AS yy,
        | round(trace - (xx_dev + trace / 3.0) - (yy_dev + trace / 3.0), 4) AS zz
        |FROM g ORDER BY user_id""".stripMargin,
    "ref_gather_series" ->
      """SELECT user_id, count(*) AS n,
        | round(first(value ORDER BY ts, event_id), 4) AS first_v,
        | round(last(value ORDER BY ts, event_id), 4) AS last_v
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "ref_minmax_normalize" ->
      """WITH x AS (
        |  SELECT event_id, user_id, value,
        |    min(value) OVER (PARTITION BY user_id) AS o,
        |    max(value) OVER (PARTITION BY user_id) - min(value) OVER (PARTITION BY user_id) AS s
        |  FROM events)
        |SELECT event_id, user_id,
        | round(CASE WHEN s = 0.0 THEN 0.0 ELSE (value - o) / s END, 4) AS norm_v
        |FROM x ORDER BY event_id""".stripMargin,
    "ref_quantize_roundtrip" ->
      """WITH x AS (
        |  SELECT event_id, user_id, value,
        |    min(value) OVER (PARTITION BY user_id) AS o,
        |    max(value) OVER (PARTITION BY user_id) - min(value) OVER (PARTITION BY user_id) AS s
        |  FROM events),
        |q AS (
        |  SELECT user_id, value, s,
        |    CASE WHEN s = 0.0 THEN 0 ELSE CAST(floor((value - o) / s * 255.0) AS BIGINT) END AS code,
        |    o FROM x),
        |e AS (
        |  SELECT user_id, s, abs(value - (code / 255.0 * s + o)) AS err FROM q)
        |SELECT user_id, count(*) AS n,
        | round(max(err), 6) AS max_err,
        | round(avg(err), 6) AS avg_err,
        | round(max(s), 4) AS scale_r
        |FROM e GROUP BY user_id ORDER BY user_id""".stripMargin,
    "ref_header_stats" ->
      """SELECT user_id, count(*) AS ngll_samples,
        | count(DISTINCT event_type) AS n_series,
        | round(min(value), 4) AS offset_r,
        | round(max(value) - min(value), 4) AS scale_r,
        | count(*) AS est_bytes
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
  )
}
