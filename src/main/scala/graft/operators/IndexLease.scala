package graft.operators

import org.apache.spark.sql.SparkSession

/** Cross-process mutual exclusion for index mutation (r12 verdict #2 +
  * ADVICE): builds committed by rename had a TOCTOU window and rename-onto-
  * existing-dir pollution (LocalFileSystem falls back to FileUtil.copy INTO
  * the target; HDFS moves src UNDER an existing dst dir), and the
  * maintenance verbs (append / delete / compact) were documented
  * single-active-writer — two sessions appending to one index dir
  * interleaved unguarded (concurrent Spark jobs writing one output path
  * also stomp each other's `_temporary` committer staging).
  *
  * The lease is an exclusive-create lock file: `FileSystem.create(path,
  * overwrite = false)` is atomic on HDFS; for `file://` we use
  * `java.io.File.createNewFile()`, which is the POSIX-atomic primitive
  * (RawLocalFileSystem's create has its own exists/create window).
  * Writers block-retry with backoff until acquired; a lease older than
  * [[StaleMs]] is presumed orphaned by a crashed holder and taken over
  * (delete + re-race) — the documented takeover semantics. Acquisition
  * failing past [[MaxWaitMs]] throws loudly rather than proceeding
  * unguarded. */
private[graft] object IndexLease {

  /** A lease this old is an orphan of a crashed writer — any new writer
    * may break it. Mutations are minutes-scale at most; a genuinely live
    * 10-minute mutation holder should use its own coordination. */
  val StaleMs: Long = 10 * 60 * 1000L

  /** Give up (loudly) after waiting this long for a live holder. */
  val MaxWaitMs: Long = 5 * 60 * 1000L

  private def tryCreate(fs: org.apache.hadoop.fs.FileSystem,
      lock: org.apache.hadoop.fs.Path): Boolean = {
    if (fs.getScheme == "file") {
      val f = new java.io.File(lock.toUri.getPath)
      Option(f.getParentFile).foreach(_.mkdirs())
      f.createNewFile()
    } else {
      try {
        val out = fs.create(lock, false)
        out.writeBytes(s"pid=${ProcessHandle.current().pid()} ts=${System.currentTimeMillis()}\n")
        out.close()
        true
      } catch { case _: java.io.IOException => false }
    }
  }

  /** The reader half of the commit protocol (VERDICT r13 #4): a
    * cross-process reader probing an index BETWEEN the two renames of
    * [[graft.operators.Vectors.ensureIndex]]'s swap (target moved aside,
    * staging not yet renamed in) sees a missing path for a few
    * milliseconds. Writers can't close that window with plain renames
    * (rename onto an existing dir nests on HDFS and pollutes on
    * LocalFileSystem — the r12 lesson), so the READ side carries the
    * contract: retry a path-missing failure with backoff until the swap
    * lands. Bounded by `attempts × backoffMs` (default ~6 s — a swap is
    * two metadata ops; anything longer means the index genuinely does not
    * exist, and the LAST failure rethrows loudly). Spark surfaces the
    * window as AnalysisException PATH_NOT_FOUND at DataFrame construction
    * or FileNotFoundException at scan time — both retried; any other
    * failure propagates immediately. */
  def readWithRetry[A](attempts: Int = 60, backoffMs: Long = 100)(f: => A): A = {
    def pathMissing(e: Throwable): Boolean = e match {
      case null => false
      case _: java.io.FileNotFoundException => true
      case a: org.apache.spark.sql.AnalysisException =>
        a.getErrorClass == "PATH_NOT_FOUND" ||
          String.valueOf(a.getMessage).contains("Path does not exist")
      case other => pathMissing(other.getCause)
    }
    var left = attempts
    while (true) {
      try return f
      catch {
        case e: Throwable if pathMissing(e) && left > 1 =>
          left -= 1
          Thread.sleep(backoffMs)
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Run `f` holding an exclusive lease at `lockPath` (a FILE path, e.g.
    * `<indexDir>/_lease` for in-place verbs or `<indexDir>__lock` for
    * whole-dir swaps). Released in finally; crash-orphaned leases are
    * taken over after [[StaleMs]]. */
  def withLease[A](s: SparkSession, lockPath: String)(f: => A): A = {
    val lock = new org.apache.hadoop.fs.Path(lockPath)
    val fs = lock.getFileSystem(s.sparkContext.hadoopConfiguration)
    Option(lock.getParent).foreach(fs.mkdirs(_))
    val deadline = System.currentTimeMillis() + MaxWaitMs
    var acquired = tryCreate(fs, lock)
    while (!acquired) {
      val age = try {
        System.currentTimeMillis() - fs.getFileStatus(lock).getModificationTime
      } catch { case _: java.io.FileNotFoundException => -1L } // holder just released
      if (age > StaleMs) {
        // orphaned by a crashed writer: break it and re-race the create
        try fs.delete(lock, false) catch { case _: java.io.IOException => () }
      } else if (System.currentTimeMillis() > deadline) {
        throw new IllegalStateException(
          s"[graft] index lease at $lockPath held for ${MaxWaitMs / 1000}s — " +
            "a concurrent writer is live (or its lease is younger than the " +
            s"${StaleMs / 1000}s takeover horizon); refusing to mutate unguarded")
      } else Thread.sleep(100)
      acquired = tryCreate(fs, lock)
    }
    try f
    finally { try fs.delete(lock, false) catch { case _: java.io.IOException => () } }
  }
}
