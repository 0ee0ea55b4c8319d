package graft.operators

import org.apache.spark.scheduler.{SparkListener, SparkListenerApplicationEnd}
import org.apache.spark.sql.SparkSession

/** Session-scoped scratch directories for operators that must round-trip
  * intermediate data through storage (e.g. [[DedupCluster.connectedComponents]]
  * releasing its final localCheckpoint).
  *
  * Why not `java.io.tmpdir` (ADVICE r12): a driver-local nio temp path is
  * wrong for any non-local deployment (executors/readers may not share the
  * driver's /tmp), an external tmp cleaner can remove files a returned
  * DataFrame still depends on, and nothing ever deleted them — a long
  * session leaked one Θ(nodes) directory per call for the process lifetime.
  *
  * This helper allocates under the session's `spark.sql.warehouse.dir`
  * (the same root the index layouts and bucketed tables already use, so it
  * is a storage location every executor can reach) and registers cleanup
  * ONCE per session: the whole per-session scratch root is deleted when the
  * application ends (SparkListener) with a JVM shutdown hook as the
  * fallback for sessions that die without a clean stop. Individual calls
  * get unique subdirectories, so results from earlier calls stay readable
  * for as long as the session lives — the lifetime a lazily-evaluated
  * DataFrame actually needs — and everything goes at once on exit. */
private[graft] object Scratch {

  private val registered =
    java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()

  /** A fresh unique scratch directory for this (session, tag) call. The
    * caller owns the contents; deletion is automatic at session end. */
  def dir(s: SparkSession, tag: String): String = {
    val wh = s.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    val root = s"$wh/graft_scratch/s${System.identityHashCode(s)}"
    if (registered.add(System.identityHashCode(s))) {
      val rootPath = new org.apache.hadoop.fs.Path(root)
      val conf = s.sparkContext.hadoopConfiguration
      s.sparkContext.addSparkListener(new SparkListener {
        override def onApplicationEnd(e: SparkListenerApplicationEnd): Unit =
          try rootPath.getFileSystem(conf).delete(rootPath, true)
          catch { case _: Throwable => () }
      })
      // fallback for JVMs that exit without stopping the context; Hadoop's
      // own shutdown hooks may already have closed the FS cache by the time
      // this runs, so local paths fall back to plain java.io deletion
      Runtime.getRuntime.addShutdownHook(new Thread(() =>
        try rootPath.getFileSystem(conf).delete(rootPath, true)
        catch {
          case _: Throwable =>
            try deleteLocal(new java.io.File(root))
            catch { case _: Throwable => () }
        }))
    }
    s"$root/${tag}_${java.util.UUID.randomUUID().toString.take(8)}"
  }

  private def deleteLocal(f: java.io.File): Unit = {
    val kids = f.listFiles()
    if (kids != null) kids.foreach(deleteLocal)
    f.delete(): Unit
  }
}
