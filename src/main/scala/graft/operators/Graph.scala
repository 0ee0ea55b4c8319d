package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Link-graph analytics over the corpus' domain dimension — the crawl-side
  * complement of [[Export.domainReputation]]'s content-side gate: crawl
  * frontiers are prioritized by LINK centrality (who points at you), not
  * just page quality, and training-data pipelines inherit that ranking as
  * a source-selection signal (the Common-Crawl harmonic-centrality /
  * PageRank rankings that seed most public corpora).
  *
  * The link graph here is derived deterministically from the fixture (each
  * document casts one outbound link from its own site to a hash-chosen
  * site — the synthetic-hazard discipline of q_url_canonicalize; a real
  * deployment reads an actual hyperlink table). The operator under test is
  * the ITERATION: fixed-point integer PageRank whose every step is exact
  * int64 arithmetic, so ranks are bit-identical on any engine and any
  * summation order — the determinism discipline of the export family.
  *
  * Scale: the one Θ(docs) pass is the edge derivation, map-side combined
  * down to Θ(sites²) aggregated edges before any join; each of the fixed
  * [[Iterations]] power steps joins the aggregated edge table against a
  * broadcast Θ(sites) rank vector and shuffles only Θ(edges) partial sums
  * (at web scale this is the standard edges-shuffle-per-iteration layout;
  * the rank side stays broadcast to ~10⁸ nodes). Document text never
  * enters the graph.
  */
object Graph {
  type Q = (SparkSession, String) => DataFrame

  /** Salt for the link-target draw — same two-round Knuth construction as
    * the shard/epoch draws, a third decorrelated orbit. */
  val LinkSalt = 15485863L

  /** Fixed-point scale of the rank vector: ranks are integers summing to
    * ~10⁹ (floor drift only), giving 9 significant digits — the same ×10ⁿ
    * integer discipline as the q4 quality scores. */
  val PrScale = 1000000000L

  /** Fixed power-iteration count. Web-graph PageRank is run to a fixed
    * small iteration budget in production too (convergence is geometric in
    * the damping factor); a FIXED count is also what makes the oracle an
    * unrolled-CTE replay rather than an unverifiable loop. */
  val Iterations = 3

  /** Two-round 16-bit Knuth multiplicative hash in 32-bit space — the
    * overflow-safe engine-portable construction shared with
    * [[Export.shardOf]] / [[graft.operators.Text.uniformDrawOf]]. */
  private def knuth32(id: Column, salt: Long): Column = {
    val m32 = lit(4294967296L)
    ((((id + lit(salt)) % m32) * lit(40503L) % m32) * lit(40503L)) % m32
  }

  /** Generic fixed-point integer PageRank kernel over an arbitrary node
    * dimension (`site` column) and weighted edge relation (`src`, `dst`,
    * `w`) that MAY contain dangling nodes (nodes with no outlinks — a real
    * link graph always has them: leaf pages, binary assets, robots-blocked
    * targets). With `redistributeDangling = true`, each step first sums the
    * rank mass sitting on dangling nodes (a bounded Θ(nodes) aggregate →
    * one driver scalar per step, [[Iterations]]-bounded) and spreads it
    * uniformly — the standard teleport-on-dangling completion that keeps
    * total mass conserved up to floor drift; without it dangling mass
    * simply evaporates each step and ranks are no longer comparable across
    * graphs with different dangling fractions. With `false` the per-step
    * action is skipped entirely — callers who can PROVE every node has an
    * outlink (the fixture's every-site-has-a-doc guarantee) pay zero extra.
    *
    * Scale shape is identical to [[domainPagerank]]'s: the rank vector is
    * broadcast Θ(nodes), only Θ(edges) partial sums shuffle per step, and
    * the dangling aggregate is a broadcast-anti-join + one-row reduce. */
  def pagerankRanks(nodes: DataFrame, edges: DataFrame, iterations: Int,
                    redistributeDangling: Boolean): DataFrame = {
    val n = nodes.count() // bounded driver scalar: #nodes
    val base = PrScale / n
    val deg = edges.groupBy(col("src")).agg(sum(col("w")).as("outw"))
    val e = edges.join(deg, "src")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var rank = nodes.select(col("site"), lit(base).as("pr"))
    for (_ <- 1 to iterations) {
      val contrib = e
        .join(broadcast(rank.select(col("site").as("src"), col("pr").as("src_pr"))), "src")
        .groupBy(col("dst"))
        .agg(sum(expr("(src_pr * w) DIV outw")).as("mass"))
      // uniform share of the mass stranded on outlink-less nodes this step
      val dangShare: Long =
        if (!redistributeDangling) 0L
        else {
          val dang = rank
            .join(broadcast(deg.select(col("src").as("site"))), Seq("site"), "left_anti")
            .agg(coalesce(sum(col("pr")), lit(0L)).as("d"))
            .head.getLong(0)
          dang / n
        }
      rank = nodes.select(col("site"))
        .join(contrib.withColumnRenamed("dst", "site"), Seq("site"), "left")
        .select(col("site"),
          expr(s"(${15L * base} + 85 * (coalesce(mass, 0) + $dangShare)) DIV 100").as("pr"))
    }
    rank
  }

  /** Domain PageRank — fixed-point integer power iteration over the
    * site-level link graph:
    *
    *   1. nodes = distinct sites (the [[Export]] site key), densely
    *      indexed by name order (the index exists only to make the
    *      synthetic link draw expressible — a real pipeline joins on the
    *      target URL's own site key and needs no index);
    *   2. edges = each doc links its site → site with index
    *      knuth(doc_id + [[LinkSalt]]) mod #sites, aggregated to
    *      (src, dst, w) with w = link multiplicity;
    *   3. r₀(v) = [[PrScale]] DIV n; then [[Iterations]] exact-integer
    *      damped steps r'(v) = (15·r₀ + 85·Σᵤ (r(u)·w(u,v)) DIV out(u))
    *      DIV 100 — every site has ≥1 doc hence ≥1 outlink, so there are
    *      no dangling nodes and the mass leak is floor drift only.
    *
    * Int64 headroom: r·w ≤ 10⁹·(docs per edge) — past ~10⁹ docs on one
    * edge the products need DECIMAL(38) widening, the same cure as the
    * reputation gate's cross-multiply (a widening, not a redesign).
    *
    * Output: (site, out_w, pr) — one row per site, ranked mass after
    * [[Iterations]] steps, ORDER BY site for the oracle. */
  val domainPagerank: Q = (s, d) => {
    val docs = Tables.documents(s, d)
      .where(col("source").isNotNull && col("lang").isNotNull)
    val siteCol = concat(col("source"), lit(".example.com/"), col("lang"))
    // Θ(sites) dimension; the row_number sort is over the site dimension
    // only (never the docs), so the single-partition window is bounded
    // lazy persist (every iteration re-reads the dimension); reclaimed by
    // the ContextCleaner — same note as the minhash signature caches
    val sites = docs.select(siteCol.as("site")).distinct()
      .withColumn("site_idx",
        (row_number().over(Window.orderBy(col("site"))) - 1).cast("long"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = sites.count() // bounded driver scalar: #sites
    // one Θ(docs) map pass → Θ(sites²) aggregated multigraph
    val edges = docs
      .select(siteCol.as("src"), (knuth32(col("doc_id"), LinkSalt) % n).as("dst_idx"))
      .join(broadcast(sites), col("dst_idx") === col("site_idx"))
      .groupBy(col("src"), col("site").as("dst"))
      .agg(count(lit(1)).as("w"))
    // fixture guarantee: every site has >= 1 doc hence >= 1 outlink, so the
    // dangling-redistribution leg (and its per-step driver scalar) is off
    val rank = pagerankRanks(sites.select(col("site")), edges, Iterations,
      redistributeDangling = false)
    val deg = edges.groupBy(col("src")).agg(sum(col("w")).as("outw"))
    val out = rank
      .join(deg.withColumnRenamed("src", "site"), "site")
      .select(col("site"), col("outw").as("out_w"), col("pr"))
      .orderBy(col("site"))
    out
  }

  val queries: Map[String, Q] = Map(
    "q_domain_pagerank" -> domainPagerank,
  )

  /** Unrolled-iteration oracle: the dense site index, the Knuth link draw,
    * and each of the three damped steps replayed as exact-integer CTEs
    * (DuckDB `//` floor division = Spark `DIV` on non-negative int64). */
  val oracles: Map[String, String] = Map(
    "q_domain_pagerank" -> {
      def step(prev: String, next: String): String =
        s"""$next AS (
           |  SELECT s.site,
           |    CAST((15 * (SELECT $PrScale // n FROM n)
           |     + 85 * coalesce(sum(($prev.pr * e.w) // e.outw), 0)) // 100 AS BIGINT) AS pr
           |  FROM sites s
           |  LEFT JOIN e ON e.dst = s.site
           |  LEFT JOIN $prev ON $prev.site = e.src
           |  GROUP BY s.site)""".stripMargin
      s"""WITH docs AS (
         |  SELECT doc_id, source || '.example.com/' || lang AS site
         |  FROM documents WHERE source IS NOT NULL AND lang IS NOT NULL),
         |sites AS (
         |  SELECT site, CAST(row_number() OVER (ORDER BY site) - 1 AS BIGINT) AS site_idx
         |  FROM (SELECT DISTINCT site FROM docs)),
         |n AS (SELECT count(*) AS n FROM sites),
         |links AS (
         |  SELECT site AS src,
         |    ((((doc_id + $LinkSalt) % 4294967296) * 40503 % 4294967296)
         |      * 40503 % 4294967296) % (SELECT n FROM n) AS dst_idx
         |  FROM docs),
         |edges AS (
         |  SELECT l.src, s.site AS dst, CAST(count(*) AS BIGINT) AS w
         |  FROM links l JOIN sites s ON l.dst_idx = s.site_idx
         |  GROUP BY 1, 2),
         |deg AS (SELECT src, CAST(sum(w) AS BIGINT) AS outw FROM edges GROUP BY 1),
         |e AS (SELECT edges.src, edges.dst, edges.w, deg.outw
         |      FROM edges JOIN deg USING (src)),
         |r0 AS (SELECT site, (SELECT $PrScale // n FROM n) AS pr FROM sites),
         |${step("r0", "r1")},
         |${step("r1", "r2")},
         |${step("r2", "r3")}
         |SELECT s.site, d.outw AS out_w, r3.pr
         |FROM sites s JOIN r3 ON r3.site = s.site JOIN deg d ON d.src = s.site
         |ORDER BY s.site""".stripMargin
    },
  )
}
