package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Bpe

/** BPE trainer/tokenizer invariants beyond the DuckDB oracle: path
  * equality (driver vs distributed trainer), an independent list-based
  * re-encode, determinism, and the token-budget parity the real-token
  * accounting exists for. */
class BpeSpec extends AnyFunSuite {

  private def vocabOf(d: String): Array[(String, Long)] = {
    val spark = TestSpark.spark
    import spark.implicits._
    Tables.documents(spark, d)
      .select(explode(split(lower(trim(col("text"))), "\\s+")).as("word"))
      .where(col("word").rlike("^[a-z0-9]+$"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      .as[(String, Long)].collect()
  }

  test("driver and distributed trainers learn identical merge tables") {
    val spark = TestSpark.spark
    import spark.implicits._
    val v = vocabOf(TestSpark.sf0001)
    val driver = Bpe.trainDriver(v)
    val dist = Bpe.trainDistributed(
      v.toSeq.toDF("word", "freq"))
    assert(driver.nonEmpty && driver == dist)
  }

  test("prefix-collision fixture: token boundaries respected by all kernels") {
    val spark = TestSpark.spark
    import spark.implicits._
    // Vocab engineered so the learned order is (t,h), (e,r), (th,e) — and
    // `there` is segmented [th, er, e] when merge 3 arrives. A string
    // kernel without a CLOSING delimiter (`|a|b` → `|ab`) would match
    // `|th|e` inside `|th|er|e` (the following token merely STARTS with
    // `e`) and produce [ther, e], after which the trainers' pair counts —
    // and the learned merge tables — diverge at rank 4.
    val v: Array[(String, Long)] =
      Array(("there", 10L), ("th", 60L), ("er", 50L), ("the", 40L))
    val driver = Bpe.trainDriver(v)
    assert(driver.take(3).map { case (_, a, b, _) => (a, b) } ===
      Seq(("t", "h"), ("e", "r"), ("th", "e")))
    // the word whose segmentation the collision would corrupt
    assert(Bpe.applyMerges("there",
      driver.take(3).map { case (_, a, b, _) => (a, b) }.toIndexedSeq).toSeq ===
      Seq("th", "er", "e"))
    // distributed string kernel learns the identical table (rank 4+ is
    // exactly where the collision would fork it)
    val dist = Bpe.trainDistributed(v.toSeq.toDF("word", "freq"))
    assert(driver == dist && driver.length >= 4)
    // and the enclosed-token replace itself, in Spark SQL: applying
    // (t,h),(e,r),(th,e) to `there` must leave [th, er, e]
    val sql = spark.sql(
      """SELECT replace(replace(replace('<t><h><e><r><e>',
        |'<t><h>','<th>'), '<e><r>','<er>'), '<th><e>','<the>')""".stripMargin)
      .collect()(0).getString(0)
    assert(sql === "<th><er><e>")
  }

  test("typed one-pass segmentation equals the declarative replace fold") {
    val spark = TestSpark.spark
    import spark.implicits._
    val d = TestSpark.sf0001
    val typed = Bpe.wordTokenCounts(spark, d)
      .as[(String, Long)].collect().toMap
    val decl = Bpe.finalSeqsDeclarative(spark, d)
      .select(col("word"),
        (length(col("seq")) - length(translate(col("seq"), "<", "")))
          .cast("long").as("n"))
      .as[(String, Long)].collect().toMap
    assert(typed.nonEmpty && typed == decl)
  }

  test("trainer and typed segmentation scale to 1k merges") {
    // the fixture corpus draws from a fixed dictionary whose vocab fully
    // merges after ~89 ops, so the scale test needs a high-entropy vocab:
    // 4000 deterministic 16-hex-char words (Knuth-mix of the index —
    // bijective, so all distinct) sustain a real-tokenizer merge budget
    val v: Array[(String, Long)] = Array.tabulate(4000) { i =>
      val a = (i * 2654435761L) & 0xffffffffL
      val b = ((i + 77) * 2246822519L) & 0xffffffffL
      (f"$a%08x$b%08x", (i % 7 + 1).toLong)
    }
    val big = Bpe.trainDriver(v, numMerges = 1000L)
    assert(big.length >= 1000, s"only ${big.length} merges learned")
    // well-formedness holds across the whole table
    val known = collection.mutable.Set.empty[String]
    big.foreach { case (_, a, b, _) =>
      for (sym <- Seq(a, b))
        assert(sym.length == 1 || known.contains(sym), s"symbol $sym unexplained")
      known += (a + b)
    }
    // more merges never inflate a word's token count, and the typed
    // apply handles the full table with no plan ceiling
    val ms32 = big.take(32).map { case (_, a, b, _) => (a, b) }.toIndexedSeq
    val msAll = big.map { case (_, a, b, _) => (a, b) }.toIndexedSeq
    v.take(500).foreach { case (w, _) =>
      val n32 = Bpe.applyMerges(w, ms32).length
      val nAll = Bpe.applyMerges(w, msAll).length
      assert(nAll <= n32 && nAll >= 1)
      assert(Bpe.applyMerges(w, msAll).mkString == w)
    }
  }

  test("merge table is deterministic, ranked, and concatenation-consistent") {
    val spark = TestSpark.spark
    val m1 = Bpe.bpeTrain(spark, TestSpark.sf0001).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    val m2 = Bpe.bpeTrain(spark, TestSpark.sf0001).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(m1.nonEmpty && m1.sameElements(m2))
    assert(m1.map(_._1).sameElements(1L to m1.length))
    // every later merge's symbols are either single chars or concatenations
    // produced by EARLIER merges — the defining well-formedness of a BPE
    // merge table
    val known = collection.mutable.Set.empty[String]
    m1.foreach { case (_, a, b, cnt) =>
      assert(cnt > 0)
      for (sym <- Seq(a, b))
        assert(sym.length == 1 || known.contains(sym), s"symbol $sym unexplained")
      known += (a + b)
    }
  }

  test("engine token counts equal an independent list-based re-encode") {
    val spark = TestSpark.spark
    import spark.implicits._
    val d = TestSpark.sf0001
    val merges = Bpe.merges(spark, d)
    // independent implementation: token LISTS, merges applied in rank
    // order, leftmost non-overlapping — no string replace anywhere
    def encode(word: String): Int = {
      var tk = word.toCharArray.map(_.toString).toVector
      merges.foreach { case (_, a, b, _) =>
        val out = Vector.newBuilder[String]
        var j = 0
        while (j < tk.length) {
          if (j < tk.length - 1 && tk(j) == a && tk(j + 1) == b) {
            out += (a + b); j += 2
          } else { out += tk(j); j += 1 }
        }
        tk = out.result()
      }
      tk.length
    }
    val wordCounts = vocabOf(d).map { case (w, _) => w -> encode(w) }.toMap
    val docs = Tables.documents(spark, d)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    val want = docs.flatMap { case (id, text) =>
      val ws = text.trim.toLowerCase.split("\\s+").filter(_.matches("^[a-z0-9]+$"))
      if (ws.isEmpty) None
      else Some((id, ws.length.toLong, ws.map(w => wordCounts(w).toLong).sum))
    }.sortBy(_._1).toSeq
    val got = Bpe.bpeTokenize(spark, d).as[(Long, Long, Long)].collect().toSeq
    assert(got.nonEmpty && got == want)
  }

  test("BPE pack geometry: per-doc budgets dominate whitespace, arithmetic consistent") {
    val spark = TestSpark.spark
    import spark.implicits._
    val d = TestSpark.sf0001
    val ws = operators.Text.tokenPack(spark, d)
      .select(col("doc_id"), col("n_tokens")).as[(Long, Long)].collect().toMap
    val bpe = Bpe.tokenPackBpe(spark, d).collect()
    assert(bpe.length == ws.size)
    var off = 0L
    bpe.foreach { r =>
      val (id, n, start, first, last, chunks) = (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      // every whitespace token becomes >= 1 subword/UNK token
      assert(n >= ws(id), s"doc $id: bpe $n < whitespace ${ws(id)}")
      // the pack is a gapless prefix sum with consistent chunk spans
      assert(start == off, s"doc $id: start $start != running offset $off")
      off += n
      assert(first == start / operators.Text.PackCapacity)
      assert(last == (start + math.max(n, 1L) - 1L) / operators.Text.PackCapacity)
      assert(chunks == last - first + 1L)
    }
  }

  test("token budget parity: words <= bpe tokens <= characters, and merges compress") {
    val spark = TestSpark.spark
    import spark.implicits._
    val rows = Bpe.bpeTokenize(spark, TestSpark.sf0001)
      .join(Tables.documents(spark, TestSpark.sf0001)
        .select(col("doc_id"), col("text")), Seq("doc_id"))
      .select(col("n_words"), col("n_bpe"), length(col("text")).cast("long").as("n_chars"))
      .as[(Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (w, bpe, chars) =>
      assert(w <= bpe, s"fewer tokens than words: $w > $bpe")
      assert(bpe <= chars, s"more tokens than characters: $bpe > $chars")
    }
    // the merges actually compress: corpus-wide BPE tokens are strictly
    // fewer than corpus-wide characters of the eligible words
    val totBpe = rows.map(_._2).sum
    val totW = rows.map(_._1).sum
    assert(totBpe < rows.map(_._3).sum && totBpe > totW)
  }

  test("fertility report: per-source accounting consistent with the pack counts and ratio bounds") {
    val spark = TestSpark.spark
    val sf = TestSpark.sf0001
    val got = operators.Bpe.bpeFertility(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))
    val sources = Tables.documents(spark, sf).select("source").distinct().count()
    assert(got.length == sources, "one fertility row per source")
    got.foreach { case (src, nw, nb, nc, fert, cpt) =>
      assert(nb >= nw, s"$src: every word yields >= 1 token")
      assert(fert >= 1.0 && cpt > 0.0, s"$src ratios")
      assert(math.abs(fert - BigDecimal.decimal(nb.toDouble / nw)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
      assert(math.abs(cpt - BigDecimal.decimal(nc.toDouble / nb)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    }
    // the subword totals are the SAME accounting the BPE pack runs on:
    // corpus-wide sums agree exactly across the two keys
    val packTotal = operators.Bpe.tokenPackBpe(spark, sf)
      .agg(org.apache.spark.sql.functions.sum("n_tokens")).head().getLong(0)
    assert(got.map(_._3).sum == packTotal, "fertility vs pack subword totals")
  }
}
