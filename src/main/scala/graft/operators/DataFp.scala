package graft.operators

import org.apache.spark.sql.SparkSession

/** Dataset-content fingerprints for the engine's memo caches — the
  * [[Bpe]] fingerprint discipline generalized (ADVICE r12): any memo keyed
  * only by (session, dataset-dir) returns STALE results after an in-place
  * dataset rewrite in the same process (Verify-style rewrite-then-query
  * flows), and entries accumulate unboundedly across sessions. Keying on
  * (session, dir, fingerprint) makes a rewrite a cache MISS, and a miss
  * evicts the superseded vintage's entries.
  *
  * The fingerprint is a splitmix fold over the dataset directory's
  * recursive file listing (names, sizes, mtimes) — one driver metadata
  * call, no data read. A short TTL memo ([[ttlNanos]], same contract as
  * `graft.bpe.fp.ttl.ms`) skips the relisting on back-to-back calls;
  * verification mains set the TTL to 0 so every gate query re-lists. */
private[graft] object DataFp {

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(Int, String), (Long, Long)]()

  private def ttlNanos: Long =
    sys.props.get("graft.fp.ttl.ms").map(_.toLong * 1000000L)
      .getOrElse(30L * 1000 * 1000 * 1000)

  /** Fingerprint of everything under `dir` (the whole dataset: any table
    * rewritten in place changes the fold). 0 for a missing dir. */
  def of(s: SparkSession, dir: String): Long = {
    val key = (System.identityHashCode(s), dir)
    val now = System.nanoTime()
    val hit = cache.get(key)
    if (hit != null && now - hit._2 < ttlNanos) hit._1
    else {
      val fp = list(s, dir)
      cache.put(key, (fp, now))
      fp
    }
  }

  private def list(s: SparkSession, dir: String): Long = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) 0L
    else {
      val it = fs.listFiles(p, true)
      var h = 0xcbf29ce484222325L
      while (it.hasNext) {
        val f = it.next()
        h = graft.functions.Hashing.mix64(h ^ f.getPath.getName.hashCode.toLong)
        h = graft.functions.Hashing.mix64(h ^ f.getLen)
        h = graft.functions.Hashing.mix64(h ^ f.getModificationTime)
      }
      h
    }
  }

  /** Explicit reset (tests / same-process rewrite flows that cannot wait
    * out the TTL). */
  def invalidate(): Unit = cache.clear()
}
