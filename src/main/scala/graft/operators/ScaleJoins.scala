package graft.operators

import org.apache.spark.sql.DataFrame
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
