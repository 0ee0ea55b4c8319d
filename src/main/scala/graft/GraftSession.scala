package graft

import org.apache.spark.sql.SparkSession

/** The library's front door: builds (or upgrades) a SparkSession with the
  * full graft surface installed — native expressions (`fnv_hash64`,
  * `vec_dot`, `vec_cosine`), the `VectorizeDotProduct` optimizer rule, the `TopKPerGroup`
  * planner strategy, and the scalar codec/hashing SQL UDFs — plus the
  * engine's recommended execution config (AQE with partition coalescing and
  * skew handling, UTC session time).
  *
  * Cluster deploys get the Catalyst pieces with
  * `--conf spark.sql.extensions=graft.GraftExtensions` at submit time;
  * `GraftSession.builder(...)` covers local/driver-built sessions, and
  * `GraftSession.install(spark)` upgrades a session someone else built
  * (notebook kernels, test harnesses).
  */
object GraftSession {

  /** A session builder preconfigured for the engine. `parallelism` sizes
    * both the local master and `spark.sql.shuffle.partitions` — on a real
    * cluster, drop `master` and size shuffle partitions to ~2-3× total
    * cores instead. */
  def builder(parallelism: Int = Runtime.getRuntime.availableProcessors()): SparkSession.Builder =
    SparkSession.builder()
      .master(s"local[$parallelism]")
      .config("spark.sql.shuffle.partitions", parallelism)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", 64 * 1024 * 1024)
      .config("spark.ui.enabled", "false")

  /** Build the session and install everything. */
  def create(parallelism: Int = Runtime.getRuntime.availableProcessors()): SparkSession = {
    val spark = builder(parallelism).getOrCreate()
    install(spark)
    spark
  }

  /** Install the full graft surface on an already-running session
    * (idempotent): SQL UDFs, plus everything `GraftExtensions` injects
    * (native expressions, planner strategy, optimizer rule) — the extensions
    * object is the single registration site, applied here via the bridge.
    *
    * SESSION-WIDE SIDE EFFECT (ADVICE r7): this flips
    * `spark.sql.parquet.inferTimestampNTZ.enabled=false` for the WHOLE
    * session — every parquet read, not just the framework's tables, will
    * infer tz-naive timestamps as TimestampType from here on. That is the
    * engine's documented contract (its oracles are written against the
    * UTC-epoch reading); callers embedding graft in a session that also
    * reads NTZ-dependent external data should scope those reads with
    * `.option("inferTimestampNTZ", ...)` per read. One further per-call
    * exception to "loaders stay pure": [[Tables.events]] /
    * [[graft.streaming.Streams.eventsStream]] set the session-level
    * `legacy.parquet.nanosAsLong` when (and only when) they meet the
    * legacy INT64-nanos events vintage, because that knob has no per-read
    * `option(...)` equivalent. */
  def install(spark: SparkSession): Unit = {
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    functions.Codec.register(spark)
    functions.Hashing.register(spark)
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext)
    org.apache.spark.sql.GraftBridge.applyExtensions(ext, spark)
  }
}
