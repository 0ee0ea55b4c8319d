package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Graph

/** Link-graph analytics. The oracle hash check lives in the driver gate;
  * these specs pin the CONTRACT from first principles: a full driver-side
  * scalar replay of the edge derivation and every integer power step, mass
  * conservation up to floor drift, non-degeneracy, and determinism. */
class GraphSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf0001

  private def knuth(id: Long, salt: Long): Long = {
    val m = 4294967296L
    ((id + salt) % m) * 40503L % m * 40503L % m
  }

  test("domain pagerank: full scalar replay of edges and all three integer power steps") {
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "source", "lang")
      .collect()
      .filter(r => !r.isNullAt(1) && !r.isNullAt(2))
      .map(r => (r.getLong(0), s"${r.getString(1)}.example.com/${r.getString(2)}"))
    val sites = docs.map(_._2).distinct.sorted
    val idx = sites.zipWithIndex.toMap.view.mapValues(_.toLong).toMap
    val n = sites.length.toLong
    val base = Graph.PrScale / n

    // edge multigraph: each doc links its site -> hash-chosen site index
    val edges = docs
      .map { case (id, site) => (site, sites((knuth(id, Graph.LinkSalt) % n).toInt)) }
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val outw = edges.toSeq.groupBy(_._1._1).view.mapValues(_.map(_._2).sum).toMap

    var pr: Map[String, Long] = sites.map(_ -> base).toMap
    for (_ <- 1 to Graph.Iterations) {
      val mass = edges.toSeq
        .map { case ((src, dst), w) => dst -> (pr(src) * w) / outw(src) }
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      pr = sites.map(s => s -> (15L * base + 85L * mass.getOrElse(s, 0L)) / 100L).toMap
    }

    val got = Graph.domainPagerank(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.map(_._1).toSeq == sites.toSeq, "one row per site, site-ordered")
    got.foreach { case (s, ow, p) =>
      assert(ow == outw(s), s"outdegree of $s")
      assert(p == pr(s), s"rank of $s: got $p want ${pr(s)}")
    }
    // every site has >= 1 doc hence >= 1 outlink: no dangling nodes
    assert(got.forall(_._2 >= 1))
    assert(idx.size.toLong == n)
  }

  test("domain pagerank: mass conserved up to floor drift, graph non-degenerate, rerun-deterministic") {
    val rows = Graph.domainPagerank(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(2)))
    val n = rows.length.toLong
    val total = rows.map(_._2).sum
    // each DIV floors away < 1 unit per (edge + site + 1) term per step; a
    // loose but meaningful bar: within 1% of the fixed-point scale, never over
    assert(total <= Graph.PrScale, s"mass $total exceeds the fixed-point scale")
    assert(total > Graph.PrScale * 99L / 100L, s"mass $total leaked > 1%")
    // non-degenerate: the hash multigraph concentrates mass unevenly, so
    // ranks move off the uniform start in both directions
    val base = Graph.PrScale / n
    assert(rows.exists(_._2 > base) && rows.exists(_._2 < base),
      "ranks did not separate from the uniform vector")
    val rerun = Graph.domainPagerank(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(2)))
    assert(rows.toSeq == rerun.toSeq)
  }

  test("pagerank kernel: dangling-node redistribution conserves mass; scalar replay exact") {
    import spark.implicits._
    // c and e are dangling (no outlinks) — a real link graph always has
    // leaf pages; the fixture never does, so this is the kernel's own case
    val nodes = Seq("a", "b", "c", "d", "e").toDF("site")
    val edges = Seq(("a", "b", 1L), ("a", "c", 2L), ("b", "c", 1L),
      ("d", "a", 3L), ("d", "e", 1L)).toDF("src", "dst", "w")
    val n = 5L
    val base = Graph.PrScale / n
    val outw = Map("a" -> 3L, "b" -> 1L, "d" -> 4L)
    val edgeList = Seq(("a", "b", 1L), ("a", "c", 2L), ("b", "c", 1L),
      ("d", "a", 3L), ("d", "e", 1L))
    val sites = Seq("a", "b", "c", "d", "e")

    def replay(redistribute: Boolean): Map[String, Long] = {
      var pr: Map[String, Long] = sites.map(_ -> base).toMap
      for (_ <- 1 to Graph.Iterations) {
        val mass = edgeList
          .map { case (s, d, w) => d -> (pr(s) * w) / outw(s) }
          .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
        val dshare = if (redistribute) sites.filterNot(outw.contains).map(pr).sum / n else 0L
        pr = sites.map(s =>
          s -> (15L * base + 85L * (mass.getOrElse(s, 0L) + dshare)) / 100L).toMap
      }
      pr
    }

    for (redistribute <- Seq(true, false)) {
      val got = Graph.pagerankRanks(nodes, edges, Graph.Iterations, redistribute)
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      val want = replay(redistribute)
      assert(got == want, s"redistribute=$redistribute scalar replay")
    }
    // with redistribution the dangling mass is recycled: conserved up to
    // floor drift; without it, 2 dangling sites' mass evaporates each step
    val withD = replay(true).values.sum
    val withoutD = replay(false).values.sum
    assert(withD <= Graph.PrScale && withD > Graph.PrScale * 99L / 100L,
      s"redistributed mass $withD not conserved")
    assert(withoutD < Graph.PrScale * 80L / 100L,
      s"leak contrast: expected >20% evaporation without redistribution, got $withoutD")
  }
}
