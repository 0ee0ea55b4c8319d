package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join strategies for the two classic 100 TB failure modes: key skew and
  * repeated big-big shuffles. These are library utilities (not tied to one
  * query) with equivalence specs in ScaleJoinsSpec.
  */
object ScaleJoins {

  /** Salted equi-join: big side gets a deterministic per-row salt in
    * [0, salt), small side is exploded `salt` ways, join on (key, salt).
    * Splits a hot key's rows across `salt` reducers at the cost of
    * replicating the small side.
    *
    * AQE's skew-join split handles sort-merge skew automatically; explicit
    * salting is for the cases the optimizer can't see — skewed
    * `groupBy`-style pre-aggregation or broadcast-ineligible builds. The
    * salt is a hash of the whole row (not `rand()`) so retried tasks
    * produce identical output — non-negotiable for exactly-once sinks. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salt: Int): DataFrame = {
    require(salt > 0)
    val bigSalted = big.withColumn("__salt",
      pmod(xxhash64(struct(big.columns.map(col): _*)), lit(salt.toLong)).cast("int"))
    val smallExploded = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    bigSalted.join(smallExploded, Seq(key, "__salt")).drop("__salt")
  }

  /** Hive-style partitioned + sorted parquet layout: the directory tree on
    * `partCol` gives planning-time partition pruning (a filter on partCol
    * never lists, let alone reads, the other directories — at 100 TB the
    * difference between a metadata lookup and a full scan), and sorting
    * within files tightens parquet row-group min/max stats so the reader
    * skips pages inside the selected partitions too. Range-repartitioning
    * on (partCol, sortCols) bounds files per directory at the shuffle
    * parallelism (small-file control vs one-file-per-input-task) WITHOUT
    * funnelling a hot partition value through a single reducer — a plain
    * `repartition(partCol)` would serialize an entire partition's
    * terabytes in one task at 100 TB. */
  def writePartitioned(df: DataFrame, path: String, partCol: String, sortCols: String*): Unit =
    df.repartitionByRange((partCol +: sortCols).map(col): _*)
      .sortWithinPartitions((partCol +: sortCols).map(col): _*)
      .write.mode("overwrite").partitionBy(partCol).parquet(path)

  /** Interleave the low 16 bits of `c` with zeros (Morton "bit spread"),
    * expressed as the classic 4-step shift/mask chain of codegen'd bitwise
    * builtins — no UDF, stays inside whole-stage codegen. */
  private def spreadBits16(c: Column): Column = {
    val x0 = c.cast("long").bitwiseAND(lit(0xFFFFL))
    val x1 = x0.bitwiseOR(shiftleft(x0, 8)).bitwiseAND(lit(0x00FF00FFL))
    val x2 = x1.bitwiseOR(shiftleft(x1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val x3 = x2.bitwiseOR(shiftleft(x2, 2)).bitwiseAND(lit(0x33333333L))
    x3.bitwiseOR(shiftleft(x3, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** Morton z-value of two 16-bit codes: a's bits at even positions, b's at
    * odd. Adjacent z-values are adjacent in BOTH dimensions, which is what
    * makes a z-sorted file cover a bounded rectangle of (a, b) space. */
  def zValue(a: Column, b: Column): Column =
    spreadBits16(a).bitwiseOR(shiftleft(spreadBits16(b), 1))

  /** Z-order clustered parquet layout over two numeric columns — the
    * multi-dimensional complement of [[writePartitioned]]: each output file
    * covers one z-range, i.e. a bounded rectangle in (colA, colB) space, so
    * the parquet footer min/max stats of EVERY file are tight in BOTH
    * columns and a predicate box on either or both dimensions skips
    * non-overlapping files at row-group-pruning time. A single-column sort
    * gives this only for the leading column; at 100 TB the second
    * dimension's full-scan cost is exactly what z-ordering removes
    * (Delta/Iceberg OPTIMIZE ZORDER does the same thing).
    *
    * Columns are min/max-quantized to 16-bit codes (bounds from one tiny
    * aggregate, broadcast — no driver collect); the z-value is computed by
    * codegen'd bitwise expressions, range-repartitioned into `files` tasks
    * and dropped before the write. Skewed columns would want
    * quantile-based codes (range-boundary sampling) instead of linear
    * min/max; linear is right for the fixture and keeps the codes cheap. */
  def writeZOrdered(df: DataFrame, path: String, colA: String, colB: String,
      files: Int): Unit = {
    val bounds = df.agg(
      min(col(colA)).cast("double").as("__alo"), max(col(colA)).cast("double").as("__ahi"),
      min(col(colB)).cast("double").as("__blo"), max(col(colB)).cast("double").as("__bhi"))
    def code(c: Column, lo: Column, hi: Column): Column =
      when(hi === lo, lit(0L)).otherwise(
        least(((c.cast("double") - lo) / (hi - lo) * 65535.0).cast("long"), lit(65535L)))
    df.crossJoin(broadcast(bounds))
      .withColumn("__z", zValue(
        code(col(colA), col("__alo"), col("__ahi")),
        code(col(colB), col("__blo"), col("__bhi"))))
      // shed the constant bounds columns BEFORE the range shuffle — only
      // __z rides along, and it is dropped after placement
      .drop("__alo", "__ahi", "__blo", "__bhi")
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** Write both sides bucketed by the join key into managed tables —
    * subsequent equi-joins on that key are co-located (no Exchange in the
    * plan), the standard way to amortize the big-big shuffle across every
    * downstream join at 100 TB. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    // a fresh in-memory catalog doesn't know about a previous JVM's managed
    // location — clear it so the write is idempotent across runs
    val warehouse = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete()
    }
    val loc = new java.io.File(warehouse, table)
    if (loc.exists()) rm(loc)
    df.write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)
  }
}
