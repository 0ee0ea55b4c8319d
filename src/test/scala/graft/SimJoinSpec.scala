package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Text

/** The prefix-filtered incremental dedup: result equality against an
  * independent brute-force computation, soundness of the filter (no true
  * pair pruned), and — on a Zipfian-vocabulary corpus, where prefix
  * filtering has rare tokens to work with — actual pruning. The fixture's
  * word-salad documents share a deliberately tiny vocabulary (~80% of
  * cross pairs are genuinely similar), so pruning there is data-bound;
  * see the operator's scaladoc. */
class SimJoinSpec extends AnyFunSuite {

  private def tokenSets(): Map[Long, Set[String]] = {
    val spark = TestSpark.spark
    Tables.documents(spark, TestSpark.sf0001)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) ->
        r.getString(1).toLowerCase.trim.split("\\s+").toSet)
      .toMap
  }

  private def jac(a: Set[String], b: Set[String]): Double = {
    val i = (a & b).size.toDouble
    i / (a.size + b.size - i)
  }

  test("incremental dedup equals the brute-force definition") {
    val spark = TestSpark.spark
    val ws = tokenSets()
    val split = ws.keys.max - 49
    val truth = ws.keys.filter(_ >= split).toSeq.sorted.map { id =>
      val js = ws.keys.filter(_ < split).toSeq
        .map(o => jac(ws(id), ws(o)))
        .filter(_ >= Text.SimJoinThreshold)
      val best = if (js.isEmpty) 0.0 else math.rint(js.max * 10000) / 10000
      (id, js.size.toLong, if (js.nonEmpty) 1L else 0L, best)
    }
    val got = Text.dedupIncremental(spark, TestSpark.sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got == truth)
    // the batch has real signal — some dups and some varying counts
    assert(truth.exists(_._3 == 1L), "degenerate fixture: no dups at all")
    assert(truth.map(_._2).distinct.size > 1)
  }

  test("prefix filter is sound: every true pair survives on the fixture") {
    val spark = TestSpark.spark
    import spark.implicits._
    val ws = tokenSets()
    val split = ws.keys.max - 49
    val cands = Text.incrementalCandidates(spark, TestSpark.sf0001)
      .as[(Long, Long)].collect().toSet
    val truePairs = for {
      n <- ws.keys.filter(_ >= split)
      o <- ws.keys.filter(_ < split)
      if jac(ws(n), ws(o)) >= Text.SimJoinThreshold
    } yield (n, o)
    assert(truePairs.forall(cands.contains),
      s"prefix filter dropped ${truePairs.count(!cands.contains(_))} true pairs")
    assert(cands.size <= 50L * (ws.size - 50))
  }

  test("prefix filter prunes >97% of the cross product on a Zipfian corpus") {
    val spark = TestSpark.spark
    import spark.implicits._
    // 100 "old" docs + 20 "new": every doc shares a 5-word head (the dense
    // Zipfian trunk) and carries 10 unique tail tokens (the rare mass);
    // each new doc 100+i is a near-copy of old doc i (9 of 10 tails shared)
    val common = (0 until 5).map(i => s"the$i")
    def tails(id: Long, n: Int, from: Int = 0): Seq[String] =
      (from until from + n).map(j => s"uniq${id}x$j")
    val old = (0L until 100L).map(i => (i, (common ++ tails(i, 10)).toArray))
    val neu = (0L until 20L).map { i =>
      (100L + i, (common ++ tails(i, 9) ++ tails(900L + i, 1, 9)).toArray)
    }
    val docs = (old ++ neu).toDF("doc_id", "ws")
    val bounds = Seq(Tuple1(100L)).toDF("split")
    val t = 0.5 // J(new, its old source) = 14/16 = 0.875; unrelated ≈ 5/25
    val cands = Text.prefixCandidates(docs, bounds, t)
      .as[(Long, Long)].collect().toSet
    // all 20 planted pairs survive…
    (0L until 20L).foreach(i => assert(cands.contains((100L + i, i))))
    // …and the dense-head cross product is pruned away
    val cross = 20 * 100
    assert(cands.size < cross * 3 / 100,
      s"${cands.size} candidates of $cross — prefix filter not pruning")
  }
}
