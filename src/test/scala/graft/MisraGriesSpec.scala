package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.MisraGries.misra_gries
import graft.operators.Text

/** Misra-Gries sketch guarantees on a Zipfian stream where distinct items
  * (≫ k) actually stress the counter eviction and the cross-partition merge
  * path — the fixture's tiny vocabulary never would.
  */
class MisraGriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Zipf-ish stream: item_r appears ⌈2000/r⌉ times for r = 1..2000
    * (N ≈ 2000·H(2000) ≈ 16.3k, ~2000 distinct), deterministically
    * shuffled so partitions see interleaved items. */
  private lazy val zipf: Seq[String] = {
    val items = for {
      r <- 1 to 2000
      _ <- 1 to (2000 / r).max(1)
    } yield s"item_$r"
    new scala.util.Random(42).shuffle(items)
  }

  test("no false negatives above N/(k+1) and all counters within the bound") {
    import spark.implicits._
    val k = 100
    val n = zipf.length.toLong
    val df = zipf.toDF("term").repartition(8)
    val cands = df.agg(misra_gries(col("term"), k))
      .collect()(0).getSeq[String](0).toSet
    assert(cands.size <= k)
    val exact = zipf.groupBy(identity).map { case (t, xs) => (t, xs.length.toLong) }
    val bound = n.toDouble / (k + 1)
    val mustKeep = exact.filter(_._2 > bound).keySet
    assert(mustKeep.nonEmpty && mustKeep.size < cands.size)
    val missed = mustKeep -- cands
    assert(missed.isEmpty, s"false negatives above N/(k+1)=$bound: $missed")
  }

  test("sketch result is partitioning-invariant in its guarantee") {
    import spark.implicits._
    val k = 50
    val n = zipf.length.toLong
    val bound = n.toDouble / (k + 1)
    val mustKeep = zipf.groupBy(identity).collect {
      case (t, xs) if xs.length > bound => t
    }.toSet
    for (parts <- Seq(1, 3, 16)) {
      val cands = zipf.toDF("term").repartition(parts)
        .agg(misra_gries(col("term"), k))
        .collect()(0).getSeq[String](0).toSet
      assert((mustKeep -- cands).isEmpty, s"missed heavy hitter at $parts partitions")
    }
  }

  test("guarantee holds across randomized distributions, k values and groups") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // three shapes: uniform, zipf-ish, bursty (one item = half the stream)
    val streams: Seq[(String, Seq[String])] = Seq(
      "uniform" -> Seq.fill(4000)(s"u${rnd.nextInt(500)}"),
      "zipf" -> Seq.fill(4000) { val r = 1 + rnd.nextInt(1000); s"z${4000 / r}" },
      "bursty" -> rnd.shuffle(
        Seq.fill(2000)("hot") ++ Seq.tabulate(2000)(i => s"b$i")))
    for ((label, stream) <- streams; k <- Seq(10, 47, 128)) {
      val n = stream.length
      val bound = n.toDouble / (k + 1)
      val mustKeep = stream.groupBy(identity).collect {
        case (t, xs) if xs.length > bound => t
      }.toSet
      // grouped aggregation: the same stream under two group keys exercises
      // the per-group buffer path (each group sees every item once)
      val df = stream.flatMap(t => Seq(("g1", t), ("g2", t)))
        .toDF("g", "term").repartition(5)
      val rows = df.groupBy(col("g")).agg(misra_gries(col("term"), k).as("cand"))
        .collect()
      assert(rows.length == 2)
      rows.foreach { r =>
        val cands = r.getSeq[String](1).toSet
        assert(cands.size <= k, s"$label k=$k group=${r.getString(0)}")
        val missed = mustKeep -- cands
        assert(missed.isEmpty,
          s"$label k=$k group=${r.getString(0)}: missed $missed above bound $bound")
      }
    }
  }

  test("q_heavy_hitters equals the sketch-free exact definition") {
    val got = Text.heavyHitters(spark, TestSpark.sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    // brute force without the sketch, straight from the table
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val tokens = docs.select(explode(split(lower(trim(col("text"))), "\\s+")).as("term"))
    val n = tokens.count()
    val want = tokens.groupBy(col("term")).count()
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .filter { case (_, c) => c * 100 >= n }
      .sortBy { case (t, c) => (-c, t) }.toSeq
    assert(got == want)
    assert(got.nonEmpty)
  }
}
