package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dedup clustering: near-dup candidate pairs → connected components →
  * one representative per cluster. The step after MinHash-LSH / SimHash in a
  * 100 TB dedup pipeline ("keep one of each near-dup family").
  *
  * Components by iterative min-label propagation: each round every node
  * takes the min component id among itself and its neighbors — O(diameter)
  * rounds, and near-dup graphs are shallow (cliques + short chains).
  * Lineage is cut per round with localCheckpoint so the plan doesn't grow
  * exponentially; each round is one join + one aggregate, all shuffle-
  * partitioned by node id.
  */
object DedupCluster {

  /** Free the BlockManager blocks behind a `localCheckpoint(eager = true)`
    * result once a newer round supersedes it. Without this, a 25-round run
    * pins 25 full label snapshots for the life of the session — each round's
    * checkpoint is only reclaimed by the ContextCleaner at some later GC. */
  private def releaseCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ => ()
    }

  /** pairs: two id columns (undirected edges). Returns (id, comp) where comp
    * is the min node id of the component. Nodes absent from `pairs` are
    * their own components (callers union them back if needed).
    *
    * Adaptive: candidate-pair edge lists are tiny relative to the corpus
    * (that's the point of LSH pruning), so below `driverThreshold` edges we
    * run exact union-find on the driver — microseconds, no per-round job
    * overhead. The distributed min-label + pointer-jumping path handles the
    * rare beyond-driver-memory graph. */
  def connectedComponents(pairs: DataFrame, idA: String = "id_a",
      idB: String = "id_b", maxIter: Int = 25,
      driverThreshold: Long = 2_000_000L): DataFrame = {
    val spark = pairs.sparkSession
    // the edge list is consumed twice (size probe, then either the driver
    // collect or the iterative joins) — persist so the upstream candidate
    // generation (e.g. the full LSH pipeline) runs once, not per action
    val undirected = pairs.select(col(idA).as("src"), col(idB).as("dst"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nEdges = undirected.count()
    if (nEdges <= driverThreshold) {
      import spark.implicits._
      val es = undirected.as[(Long, Long)].collect()
      undirected.unpersist(blocking = false)
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent(r)
        var c = x
        while (parent.getOrElse(c, c) != c) { val nxt = parent(c); parent(c) = r; c = nxt }
        r
      }
      es.foreach { case (a, b) =>
        parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
      }
      return parent.keys.toSeq.sorted.map(k => (k, find(k))).toDF("id", "comp")
    }
    val edges = undirected
      .union(undirected.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var labels = edges.select(col("src").as("id"))
      .distinct()
      .withColumn("comp", col("id"))
      .localCheckpoint(true)
    var iter = 0
    var done = false
    while (!done && iter < maxIter) {
      val neighborMin = edges
        .join(labels.withColumnRenamed("id", "dst"), Seq("dst"))
        .groupBy(col("src").as("id"))
        .agg(min(col("comp")).as("ncomp"))
      val propagated = labels.join(neighborMin, Seq("id"), "left")
        .select(col("id"),
          least(col("comp"), coalesce(col("ncomp"), col("comp"))).as("comp"))
      // pointer jumping (comp ← comp's comp): turns O(diameter) rounds into
      // O(log diameter) — a 40-node chain converges in ~7 rounds, not 39
      val next = propagated
        .join(propagated.select(col("id").as("comp"), col("comp").as("jump")),
          Seq("comp"), "left")
        .select(col("id"), least(col("comp"), coalesce(col("jump"), col("comp"))).as("comp"))
        .localCheckpoint(true)
      done = next.join(labels.withColumnRenamed("comp", "oldc"), Seq("id"))
        .where(col("comp") =!= col("oldc"))
        .isEmpty
      // the convergence probe above was this round's last read of the old
      // labels snapshot — release its checkpoint blocks before moving on
      releaseCheckpoint(labels)
      labels = next
      iter += 1
    }
    edges.unpersist(blocking = false)
    undirected.unpersist(blocking = false)
    labels
  }

  /** Full dedup plan over documents: LSH candidates (est. Jaccard ≥ minJac)
    * → components → per-cluster size + representative (min doc_id). */
  def clusters(s: SparkSession, d: String, minJac: Double): DataFrame = {
    val pairs = Vectors.minhashLsh(s, d).where(col("est_jaccard") >= minJac)
    connectedComponents(pairs)
      .groupBy(col("comp"))
      .agg(count(lit(1)).as("cluster_size"), min(col("id")).as("keep_doc_id"))
      .orderBy(col("comp"))
  }

  /** Oracle-checked clustering: the same components → size → representative
    * plan over the EXACT embedding near-dup pairs ([[Vectors.embedNeardup]],
    * itself hash-checked), so the whole chain — pair kernel, connected
    * components, representative selection — verifies against a DuckDB
    * recursive-CTE transitive closure. The LSH-fed [[clusters]] stays
    * rows-only only because approximate candidate generation isn't
    * SQL-expressible; this pins the clustering algebra itself. */
  def clustersExact(s: SparkSession, d: String): DataFrame =
    connectedComponents(Vectors.embedNeardupPairs(s, d))
      .groupBy(col("comp"))
      .agg(count(lit(1)).as("cluster_size"), min(col("id")).as("keep_doc_id"))
      .orderBy(col("comp"))

  /** The pair CTE is [[Vectors.nearDupPairCte]] — the SAME fragment (and
    * threshold constant) the q_embed_neardup oracle uses, so the clustering
    * oracle always tests the edge set the kernel actually produces. */
  val oracles: Map[String, String] = Map(
    "q_dedup_clusters_exact" ->
      s"""WITH RECURSIVE ${Vectors.nearDupPairCte},
        |e AS (SELECT id_a AS src, id_b AS dst FROM p UNION SELECT id_b, id_a FROM p),
        |n AS (SELECT DISTINCT src AS id FROM e),
        |reach(id, root) AS (
        |  SELECT id, id FROM n
        |  UNION
        |  SELECT e.dst, r.root FROM reach r JOIN e ON e.src = r.id),
        |comp0 AS (SELECT id, min(root) AS comp FROM reach GROUP BY id)
        |SELECT comp, CAST(count(*) AS BIGINT) AS cluster_size, min(id) AS keep_doc_id
        |FROM comp0 GROUP BY comp ORDER BY comp""".stripMargin,
  )
}
