package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Text

/** Invariants of the repetition / Gopher-rule quality family on the
  * sf0.001 fixture (the oracle checks exact values at sf0.01; these pin the
  * semantic envelope and that the rule thresholds genuinely split the
  * corpus — an all-pass or all-drop rule set would be vacuous).
  */
class TextQualitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("repetition stats are well-formed ratios") {
    val rows = Text.repetitionStats(spark, TestSpark.sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val distinct = r.getAs[Double]("distinct_ratio_r")
      val top = r.getAs[Double]("top_term_frac_r")
      val dupBg = r.getAs[Double]("dup_bigram_frac_r")
      assert(distinct > 0.0 && distinct <= 1.0)
      assert(top > 0.0 && top <= 1.0)
      assert(dupBg >= 0.0 && dupBg < 1.0)
      // the most frequent term can never exceed the non-distinct mass
      // both sides carry 4-decimal rounding, so allow 1e-4 slack
      assert(top <= 1.0 - distinct + 1.0 / r.getAs[Long]("n_tokens") + 2e-4)
    }
  }

  test("gopher rules: keep equals the conjunction and both branches occur") {
    val rows = Text.gopherRules(spark, TestSpark.sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val flags = Seq("f_len", "f_mwl", "f_rep", "f_dr").map(r.getAs[Long])
      assert(flags.forall(f => f == 0L || f == 1L))
      assert(r.getAs[Long]("keep") == flags.product)
    }
    val kept = rows.count(_.getAs[Long]("keep") == 1L)
    assert(kept > 0 && kept < rows.length,
      s"rule thresholds must split the corpus (kept $kept of ${rows.length})")
  }

  test("typed tokenize replicates the toks column expression exactly") {
    import org.apache.spark.sql.functions._
    val spark2 = spark
    import spark2.implicits._
    // adversarial edges: Spark trim strips SPACE only; Spark split keeps
    // trailing empties — Java String.trim / default split do neither
    val nasty = Seq(
      "\talpha beta gamma", "alpha beta\n", "  alpha  beta  ", "",
      " ", "\t", "a b c", "ALPHA Beta\tGAMMA delta",
      // non-ASCII rows exercise Spark lower()'s slow path (default-locale
      // String.toLowerCase); Tok.tokenize replicates the fast/slow branch
      // split, so 'I'-with-'İ' mixes stay in parity under ANY JVM locale
      "İSTANBUL CITY", "PURE ASCII I", "MIXED İ AND I", "ÇOK GÜZEL İyi")
    val declarative = nasty.toDF("text")
      .select(split(lower(trim(col("text"))), "\\s+").as("ws"))
      .collect().map(_.getSeq[String](0).toList)
    val typed = nasty.map(Text.tokenize(_).toList)
    assert(typed.toSeq == declarative.toSeq)
  }

  test("source overlap emits one row per unordered source pair, bounded jaccard") {
    val rows = Text.sourceOverlap(spark, TestSpark.sf0001).collect()
    val sources = rows.flatMap(r => Seq(r.getString(0), r.getString(1))).distinct.length
    // every row is an ordered pair; with shared vocabulary all pairs overlap
    assert(rows.length == sources * (sources - 1) / 2)
    rows.foreach { r =>
      assert(r.getString(0) < r.getString(1))
      val j = r.getAs[Double]("jaccard_r")
      assert(j > 0.0 && j < 1.0)
    }
  }

  test("source overlap: generous df ceiling is answer-invariant, tight one prunes, no cache leak") {
    val persistedBefore = spark.sparkContext.getPersistentRDDs.keySet
    val exact = Text.sourceOverlap(spark, TestSpark.sf0001).collect().toSeq
    // a ceiling at S (every posting set is <= S sources by construction)
    // must be bit-identical to the exact answer — the knob only exists to
    // shed ubiquitous shingles when S is large
    val nSources = exact.flatMap(r => Seq(r.getString(0), r.getString(1))).distinct.length
    val ceiled = Text.sourceOverlapWith(spark, TestSpark.sf0001, Some(nSources))
      .collect().toSeq
    assert(ceiled == exact)
    // ceiling 1 keeps only single-source shingles: zero cross-source pairs
    val tight = Text.sourceOverlapWith(spark, TestSpark.sf0001, Some(1)).collect()
    assert(tight.isEmpty)
    // hygiene: the operator must not leave cached blocks behind in a plain
    // session (the totals reuse is a window over one plan, not a persist)
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- persistedBefore
    assert(leaked.isEmpty, s"leaked cached RDDs: $leaked")
  }

  test("token packing: distributed prefix sum equals the window definition, stream is contiguous") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val rows = Text.tokenPack(spark, TestSpark.sf0001).collect()
    assert(rows.nonEmpty)
    // contiguity: each doc starts exactly where the previous one ended —
    // the packed stream has no gaps and no overlaps
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getLong(2) + a.getLong(1) == b.getLong(2),
          s"gap between ${a.getLong(0)} and ${b.getLong(0)}")
      case _ =>
    }
    // span arithmetic: n_chunks matches the chunk bounds, fill never
    // exceeds capacity within a single-chunk doc
    rows.foreach { r =>
      assert(r.getLong(5) == r.getLong(4) - r.getLong(3) + 1)
      if (r.getLong(5) == 1)
        assert(r.getLong(2) % Text.PackCapacity + r.getLong(1) <= Text.PackCapacity)
    }
    // equals the serial window-cumsum reference (the oracle's definition)
    val docs = Tables.documents(spark, TestSpark.sf0001)
      .select(col("doc_id"),
        size(split(lower(trim(col("text"))), "\\s+")).cast("long").as("n_tokens"))
    val w = Window.orderBy(col("doc_id")).rowsBetween(Window.unboundedPreceding, -1)
    val C = Text.PackCapacity
    val start = coalesce(sum(col("n_tokens")).over(w), lit(0L))
    val ref = docs.select(col("doc_id"), col("n_tokens"), start.as("start_off"))
      .withColumn("chunk_first", (col("start_off") / C).cast("long"))
      .withColumn("chunk_last",
        ((col("start_off") + greatest(col("n_tokens"), lit(1L)) - 1) / C).cast("long"))
      .withColumn("n_chunks", col("chunk_last") - col("chunk_first") + 1)
      .orderBy(col("doc_id"))
      .collect()
    assert(rows.toSeq == ref.toSeq)
  }

  test("source mix: every source balanced to the smallest source's count") {
    import org.apache.spark.sql.functions._
    val rows = Text.sourceMix(spark, TestSpark.sf0001).collect()
    val perSource = rows.groupBy(_.getString(0)).view.mapValues(_.length).toMap
    val allSources = Tables.documents(spark, TestSpark.sf0001)
      .groupBy(col("source")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val k = allSources.values.min
    // every source present, each contributing exactly min-count docs
    assert(perSource.keySet == allSources.keySet)
    assert(perSource.values.forall(_ == k), s"$perSource vs k=$k")
    // deterministic: re-running selects the same docs
    val again = Text.sourceMix(spark, TestSpark.sf0001).collect()
    assert(again.toSeq == rows.toSeq)
  }

  test("PII scrub: counts match the injection schedule and redaction is total") {
    import org.apache.spark.sql.functions.col
    val rows = Text.piiScrub(spark, TestSpark.sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      // the deterministic enrichment: one email iff id%3==0, one phone iff id%5==0
      assert(r.getAs[Long]("n_emails") == (if (id % 3 == 0) 1L else 0L), s"doc $id")
      assert(r.getAs[Long]("n_phones") == (if (id % 5 == 0) 1L else 0L), s"doc $id")
    }
    // redaction arithmetic: the scrubbed length must be the raw text plus
    // the unredacted injection residue (" contact " = 9, "[EMAIL]" = 7;
    // " call " = 6, "[PHONE]" = 7) — any accidental extra match or partial
    // redaction breaks this equality (md5 pins exact bytes cross-engine)
    import org.apache.spark.sql.functions.length
    val rawLen = Tables.documents(spark, TestSpark.sf0001)
      .select(col("doc_id"), length(col("text")).cast("long").as("lt"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val want = rawLen(id) + (if (id % 3 == 0) 16L else 0L) + (if (id % 5 == 0) 13L else 0L)
      assert(r.getAs[Long]("n_chars_scrub") == want, s"doc $id")
    }
    assert(rows.length == rawLen.size)
  }

  test("URL canonicalize: junk stripped, families collapse to one keeper") {
    val rows = Text.urlCanonicalize(spark, TestSpark.sf0001).collect()
    assert(rows.nonEmpty)
    var total = 0L
    rows.foreach { r =>
      val u = r.getAs[String]("canonical_url")
      assert(u.startsWith("https://"), u)
      assert(!u.contains("?") && !u.contains("#") && !u.endsWith("/"), u)
      assert(!u.contains("www.") && u == u.toLowerCase, u)
      total += r.getAs[Long]("n_docs")
    }
    // partition of the corpus: every doc lands in exactly one canonical family,
    // and dedup is real (fewer canonical URLs than docs)
    val n = Tables.documents(spark, TestSpark.sf0001).count()
    assert(total == n)
    assert(rows.length < n, s"${rows.length} canonical URLs for $n docs — no collapse")
  }

  test("contamination: hits bounded by shingle count, flag matches fraction") {
    val rows = Text.contamination(spark, TestSpark.sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nSh = r.getAs[Long]("n_sh"); val nHit = r.getAs[Long]("n_hit")
      assert(nHit >= 0 && nHit <= nSh)
      val frac = r.getAs[Double]("hit_frac_r")
      val flagged = r.getAs[Long]("contaminated") == 1L
      // 4-decimal rounding can't move a value across the 0.1 boundary unless
      // it sits within 5e-5 of it; allow that sliver
      if (frac > 0.1 + 1e-4) assert(flagged)
      if (frac < 0.1 - 1e-4) assert(!flagged)
    }
  }

  test("substring dedup: per-doc coverage, exact fixed-point fraction, verdict splits the corpus") {
    val rows = Text.substringDedup(spark, TestSpark.sf0001).collect()
    val total = Tables.documents(spark, TestSpark.sf0001).count()
    assert(rows.length.toLong == total, "one verdict row per document")
    rows.foreach { r =>
      val n = r.getAs[Long]("n_spans")
      val dup = r.getAs[Long]("n_dup_spans")
      assert(dup >= 0L && dup <= n)
      val frac = r.getAs[Double]("dup_frac")
      if (n > 0) assert(frac == (dup * 10000L / n) / 10000.0)
      else assert(frac == 0.0)
      assert(r.getAs[Long]("keep") ==
        (if (frac <= Text.SpanDupKeepFrac) 1L else 0L))
    }
    val kept = rows.count(_.getAs[Long]("keep") == 1L)
    assert(kept > 0 && kept < rows.length,
      s"span-dup gate must split the corpus (kept $kept of ${rows.length})")
  }

  test("stratified split: partitions the corpus, exact share arithmetic, deterministic, train-dominant") {
    val rows = Text.stratifiedSplit(spark, TestSpark.sf0001).collect()
    val total = Tables.documents(spark, TestSpark.sf0001).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == total, "splits partition the corpus")
    assert(rows.map(_.getAs[String]("split")).toSet.subsetOf(Set("train", "val", "test")))
    rows.foreach { r =>
      assert(r.getAs[Double]("share") ==
        (r.getAs[Long]("n_docs") * 10000L / total) / 10000.0)
      assert(r.getAs[Long]("min_doc_id") <= r.getAs[Long]("max_doc_id"))
    }
    val bySplit = rows.groupBy(_.getAs[String]("split"))
      .view.mapValues(_.map(_.getAs[Long]("n_docs")).sum).toMap
    assert(bySplit.getOrElse("train", 0L) > bySplit.getOrElse("val", 0L))
    assert(bySplit.getOrElse("train", 0L) > bySplit.getOrElse("test", 0L))
    val again = Text.stratifiedSplit(spark, TestSpark.sf0001).collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq, "hash split is deterministic")
  }

  /** Plants a tiny documents table in a temp sf-dir so the operators under
    * test run through the same parquet-scan entry as production. */
  private def plantedDocs(rows: Seq[(Long, String, String, String, Long)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_docs").toString
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("unigram entropy: zero for constant docs, ln(k) for uniform docs, corpus signal splits") {
    val dir = plantedDocs(Seq(
      (0L, "x x x x", "en", "src0", 7L),
      (1L, "a b c d", "en", "src0", 7L),
      (2L, "a a b b c c", "en", "src1", 11L)))
    val planted = Text.ngramEntropy(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("entropy")).toMap
    assert(planted(0L) == 0.0)
    assert(planted(1L) == math.rint(math.log(4.0) * 1e4) / 1e4)
    assert(planted(2L) == math.rint(math.log(3.0) * 1e4) / 1e4)
    val rows = Text.ngramEntropy(spark, TestSpark.sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val h = r.getAs[Double]("entropy")
      assert(h >= 0.0)
      assert(h <= math.log(r.getAs[Long]("n_distinct").toDouble) + 1e-4,
        "entropy is bounded by ln(n_distinct) (uniform maximum)")
      assert(r.getAs[Long]("n_distinct") <= r.getAs[Long]("n_tokens"))
    }
    val hs = rows.map(_.getAs[Double]("entropy"))
    assert(hs.min < hs.max, "entropy must separate documents, not emit a constant")
  }

  test("bloom screen: planted duplicates die in the confirm join, result equals the exact anti-join") {
    import org.apache.spark.sql.functions.col
    val dir = plantedDocs(Seq(
      (0L, "alpha beta gamma", "en", "src0", 16L),
      (1L, "delta epsilon", "en", "src0", 13L),
      (2L, "alpha beta gamma", "en", "src1", 16L), // exact dup of ref doc 0
      (3L, "zeta eta theta", "en", "src1", 14L),
      (4L, "delta epsilon", "en", "src2", 13L), // exact dup of ref doc 1
      (5L, "iota kappa", "en", "src3", 10L)))
    assert(Text.bloomDedup(spark, dir).collect().map(_.getAs[Long]("doc_id")).toSeq
      == Seq(3L, 5L),
      "bloom-positive duplicates must be confirmed and dropped, novels kept")
    // on the organic corpus the verdict must equal the plain exact anti-join
    // (the bloom is plan-only — false positives cannot leak into the output)
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val want = docs.where(col("source") =!= "src0")
      .join(docs.where(col("source") === "src0").select(col("text").as("rt")),
        col("text") === col("rt"), "left_anti")
      .select(col("doc_id"), col("source")).orderBy(col("doc_id"))
      .collect().map(_.toString).toSeq
    val got = Text.bloomDedup(spark, TestSpark.sf0001).collect().map(_.toString).toSeq
    assert(got == want)
  }

  test("DSIR weights: replays the closed-form model exactly and ranks by target-likeness") {
    val docs = Seq(
      (0L, "aa bb aa bb", "en", "src1", 11L), // target domain
      (1L, "aa bb", "en", "src1", 5L),
      (2L, "dd ee dd ee", "en", "src5", 11L), // out of domain
      (3L, "aa bb aa bb", "en", "src6", 11L), // target-LIKE content, other source
      (4L, "dd ee", "en", "src7", 5L))
    val dir = plantedDocs(docs)
    val got = Text.dsirWeights(spark, dir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_tokens"),
        r.getAs[Double]("dsir_weight")))
    // closed-form replay on the driver with the same hash, buckets, smoothing
    val B = Text.DsirBuckets
    val toks = docs.map { case (id, text, _, src, _) =>
      (id, src, text.toLowerCase.trim.split("\\s+").toSeq.filter(_.nonEmpty)
        .map(t => graft.functions.Hashing.fnv64(t) & (B - 1).toLong))
    }
    val all = toks.flatMap(_._3)
    val tgt = toks.filter(_._2 == "src1").flatMap(_._3)
    val cR = all.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val cT = tgt.groupBy(identity).view.mapValues(_.size.toLong).toMap
    def logr(b: Long): Double =
      math.log((cT.getOrElse(b, 0L) + 1.0) / (tgt.size + B.toDouble)) -
        math.log((cR(b) + 1.0) / (all.size + B.toDouble))
    val want = toks.map { case (id, _, bs) =>
      (id, bs.size.toLong, math.rint(bs.map(logr).sum * 1e4) / 1e4)
    }
    assert(got.toSeq == want.sortBy(_._1))
    val w = got.map(r => r._1 -> r._3).toMap
    // content decides the score, not the source label: the target-like doc 3
    // scores with the target docs, far above the out-of-domain ones
    assert(w(3L) == w(0L), "identical bags must score identically")
    assert(w(0L) > w(2L) && w(1L) > w(4L))
  }

  test("perplexity buckets: terciles partition each language, head outranks tail") {
    val rows = Text.perplexityBuckets(spark, TestSpark.sf0001).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("lang")).foreach { case (lang, rs) =>
      val byBucket = rs.groupBy(_.getAs[String]("bucket"))
        .view.mapValues(_.map(_.getAs[Double]("mean_lnp_r"))).toMap
      assert(byBucket.keySet.subsetOf(Set("head", "middle", "tail")), lang)
      // tercile sizes differ by at most one
      val sizes = Seq("head", "middle", "tail").map(b => byBucket.getOrElse(b, Array.empty[Double]).length)
      assert(sizes.max - sizes.min <= 1, s"$lang terciles $sizes")
      // head is the most fluent stratum (ties may straddle boundaries)
      for {
        h <- byBucket.get("head"); m <- byBucket.get("middle")
      } assert(h.min >= m.max, s"$lang head/middle inversion")
      for {
        m <- byBucket.get("middle"); t <- byBucket.get("tail")
      } assert(m.min >= t.max, s"$lang middle/tail inversion")
    }
  }

  test("temperature mix: integer quota replay, skew flattened, capped by source size") {
    // planted skew: 30 docs in srcA, 6 in srcB (distinct texts)
    val docs = (0L until 30L).map(i => (i, s"alpha text number $i", "en", "srcA", 10L)) ++
      (100L until 106L).map(i => (i, s"beta text number $i", "en", "srcB", 10L))
    val dir = plantedDocs(docs)
    val out = Text.temperatureMix(spark, dir).collect()
    // closed-form quota replay: wf = floor(n^tau * 1e6),
    // k = min(n, max(1, N*wf DIV W)) — capped at the source size, so the
    // reported quota IS the realized contribution (srcB's uncapped quota
    // here is 8 > its 6 docs: the cap must bind)
    val n = Map("srcA" -> 30L, "srcB" -> 6L)
    val wf = n.view.mapValues(v => math.floor(math.pow(v.toDouble, Text.TemperatureTau) * 1e6).toLong).toMap
    val bigN = n.values.sum; val bigW = wf.values.sum
    val k = wf.map { case (s, w) => s -> math.min(n(s), math.max(1L, bigN * w / bigW)) }
    assert(k("srcB") == n("srcB"), "planted case must exercise the cap")
    out.foreach { r =>
      assert(r.getAs[Long]("k_target") == k(r.getAs[String]("source")))
    }
    val picked = out.groupBy(_.getAs[String]("source")).view.mapValues(_.length.toLong).toMap
    n.foreach { case (s, cnt) =>
      assert(picked(s) == math.min(cnt, k(s)), s"$s picked ${picked(s)}")
    }
    // tau < 1 flattens: the majority source's output share drops below its
    // input share, the minority's rises
    val total = picked.values.sum.toDouble
    assert(picked("srcA") / total < n("srcA").toDouble / bigN)
    assert(picked("srcB") / total > n("srcB").toDouble / bigN)
    // deterministic
    val again = Text.temperatureMix(spark, dir).collect()
    assert(out.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("unicode normalization: NFC merge, zero-width strip, ligature and ASCII invariance") {
    val spark = TestSpark.spark
    val out = Text.unicodeNormalize(spark, TestSpark.sf0001).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val lr = r.getAs[Long]("len_raw"); val ln = r.getAs[Long]("len_norm")
      val ch = r.getAs[Long]("changed")
      (id % 3) match {
        // e + combining acute composes to é: one code point shorter
        case 0 => assert(ln == lr - 1 && ch == 1, s"doc $id: $lr -> $ln")
        // the zero-width space is stripped (NFC alone would keep it)
        case 1 => assert(ln == lr - 1 && ch == 1, s"doc $id: $lr -> $ln")
        // canonical NFC keeps the fi ligature; ASCII body is untouched
        case _ => assert(ln == lr && ch == 0, s"doc $id: $lr -> $ln")
      }
    }
    // deterministic (md5 column pins content, not just lengths)
    val again = Text.unicodeNormalize(spark, TestSpark.sf0001).collect()
    assert(out.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("chunker geometry: stride starts, full coverage, fixed overlap, exact tail") {
    val C = Text.ChunkSize; val S = Text.ChunkStride
    val n = 80 // not a multiple of either, so the tail chunk truncates
    val toks = (0 until n).map(i => s"w$i")
    val rows = Text.chunkRows(7L, toks.mkString(" ")).toSeq
    // chunk ids are dense, starts land every stride
    assert(rows.map(_._2) == rows.indices.map(_.toLong))
    assert(rows.map(_._3) == rows.indices.map(i => (i * S).toLong))
    // all chunks are full-size except the exact-remainder tail
    assert(rows.init.forall(_._4 == C.toLong))
    assert(rows.last._4 == (n - rows.last._3).toLong && rows.last._4 < C)
    // consecutive chunks share exactly C-S tokens; union covers every token
    val spans = rows.map(r => (r._3, r._3 + r._4))
    spans.sliding(2).foreach { case Seq((a0, a1), (b0, _)) =>
      assert(a1 - b0 == (C - S).toLong, s"overlap of ($a0,$a1)/($b0,..)")
    }
    assert(spans.head._1 == 0L && spans.last._2 == n.toLong)
    // chunk text is the verbatim token slice (reconstruction contract)
    rows.foreach { r =>
      assert(r._5 == toks.slice(r._3.toInt, (r._3 + r._4).toInt).mkString(" "))
    }
    // a document shorter than one chunk yields exactly one exact chunk
    val tiny = Text.chunkRows(8L, "a b c").toSeq
    assert(tiny == Seq((8L, 0L, 0L, 3L, "a b c")))
    // trailing separator: the kernel keeps the empty token exactly like
    // DuckDB's string_split, so geometry and reconstruction stay engine-equal
    val trail = Text.chunkRows(9L, "a b ").toSeq
    assert(trail == Seq((9L, 0L, 0L, 3L, "a b ")))
  }

  test("span scrub: planted shared span removed on both sides, everything else kept verbatim") {
    import org.apache.spark.sql.functions.col
    val spark2 = spark
    import spark2.implicits._
    val dir = java.nio.file.Files.createTempDirectory("span_scrub").toString
    // docs 1 and 2 share exactly one 5-token span; doc 3 is clean. The
    // shared span sits mid-document so the kept prefix/suffix must survive
    // verbatim around the hole.
    val span = "v w x y z"
    val rows = Seq(
      (1L, s"a b c $span d e", "en", "src1", 0L),
      (2L, s"p q $span r s t", "en", "src2", 0L),
      (3L, "one two three four five six", "en", "src3", 0L))
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite")
      .parquet(java.nio.file.Paths.get(dir, "documents.parquet").toString)
    val got = Text.spanScrub(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    def m(s: String) = {
      val d = java.security.MessageDigest.getInstance("MD5")
      d.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    // overlapping dup shingles: docs 1/2 share ONLY the 5 tokens of `span`
    // (the flanking tokens differ), so exactly those 5 positions are covered
    assert(got(1L) == ((10L, 5L, m("a b c d e"))), s"got ${got(1L)}")
    assert(got(2L) == ((10L, 5L, m("p q r s t"))), s"got ${got(2L)}")
    assert(got(3L) == ((6L, 0L, m("one two three four five six"))))
    // corpus consistency at fixture scale: removal fires exactly on the
    // docs the detection key flags, and never exceeds the token count
    val d0 = TestSpark.sf0001
    val scrub = Text.spanScrub(spark, d0).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val det = Text.substringDedup(spark, d0).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(scrub.keySet == det.keySet)
    scrub.foreach { case (id, removed) =>
      assert((removed > 0) == (det(id) > 0), s"doc $id: removed=$removed dupSpans=${det(id)}")
    }
    assert(scrub.values.exists(_ > 0) && scrub.values.exists(_ == 0))
  }

  test("sampled-cutpoint perplexity twin: same coverage, tercile agreement within tolerance") {
    val exact = Text.perplexityBuckets(spark, TestSpark.sf0001).collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    val sampled = Text.perplexityBucketsSampled(spark, TestSpark.sf0001).collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    // identical coverage (both exclude <2-token docs through the lm chain)
    assert(sampled.keySet == exact.keySet)
    // the sampled cutpoints are estimates — agreement must be high, not exact
    val agree = sampled.count { case (id, b) => exact(id) == b }
    val frac = agree.toDouble / sampled.size
    assert(frac >= 0.7, s"bucket agreement $frac below tolerance")
    assert(sampled.values.toSet == Set("head", "middle", "tail"),
      "all three buckets populated")
    // determinism: same cutpoints, same buckets on rerun
    val again = Text.perplexityBucketsSampled(spark, TestSpark.sf0001).collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(again == sampled)
  }

  test("span ladder: L=20 catches long boilerplate whole, leaves short echoes that L=5 scrubs") {
    val spark2 = spark
    import spark2.implicits._
    // docs 1/2 share a 25-token boilerplate span (a licence-header shape);
    // docs 3/4 share only a short 5-token echo (a common phrase)
    val boiler = (1 to 25).map(i => s"lic$i").mkString(" ")
    val echo = "all rights strictly reserved worldwide"
    val docs = Seq(
      (1L, s"alpha beta $boiler gamma delta"),
      (2L, s"mu nu $boiler xi omicron"),
      (3L, s"intro words $echo closing remark here"),
      (4L, s"other start $echo different tail words")).toDF("doc_id", "text")
    val at20 = Text.spanScrubOn(docs, 20).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // a 25-token duplicated span is exactly covered by its 6 duplicated
    // 20-shingles: whole span removed, flanks untouched
    assert(at20(1L) == ((29L, 25L)), s"got ${at20(1L)}")
    assert(at20(2L) == ((29L, 25L)), s"got ${at20(2L)}")
    // the short echo is invisible at L=20 (precision: phrases aren't boilerplate)
    assert(at20(3L)._2 == 0L && at20(4L)._2 == 0L)
    val at5 = Text.spanScrubOn(docs, 5).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    // L=5 fragment-counts differently: it also scrubs the 5-token echo
    assert(at5(1L) == 25L && at5(2L) == 25L)
    assert(at5(3L) == 5L && at5(4L) == 5L)
  }

  test("NB quality classifier: total coverage, pred contract, learned signal") {
    val d = TestSpark.sf0001
    val rows = Text.qualityClassifier(spark, d).collect()
    val nDocs = Tables.documents(spark, d).count()
    // every document is scored exactly once (train AND held-out)
    assert(rows.length.toLong == nDocs)
    assert(rows.map(_.getAs[Long]("doc_id")).distinct.length == rows.length)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_tokens") > 0L)
      val llr = r.getAs[Double]("llr_r")
      assert(r.getAs[String]("pred") == (if (llr > 0) "hi" else "lo"))
    }
    // the decision boundary genuinely splits the corpus — an all-one-class
    // model would be vacuous
    val preds = rows.map(_.getAs[String]("pred")).toSet
    assert(preds == Set("hi", "lo"), s"degenerate prediction set $preds")
    // learned signal: docs whose true weak label is 'hi' must score higher
    // on average than 'lo' docs — NB with add-one smoothing over a real
    // class-conditional token distribution cannot fail this on its own
    // training distribution unless the model learned nothing
    val hiSrc = Set("src0", "src1", "src2", "src3")
    val labels = Tables.documents(spark, d)
      .select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> hiSrc.contains(r.getString(1))).toMap
    val (hi, lo) = rows.partition(r => labels(r.getAs[Long]("doc_id")))
    assert(hi.nonEmpty && lo.nonEmpty)
    def meanLlr(rs: Array[org.apache.spark.sql.Row]) =
      rs.map(_.getAs[Double]("llr_r")).sum / rs.length
    assert(meanLlr(hi) > meanLlr(lo),
      f"no learned signal: mean llr hi=${meanLlr(hi)}%.3f lo=${meanLlr(lo)}%.3f")
  }

  test("registrable domain: longest-suffix match, PSL default, depth-invariance") {
    import graft.operators.Text.registrableDomain
    // multi-label suffix wins over its single-label tail
    assert(registrableDomain("src5.co.uk") == "src5.co.uk")
    assert(registrableDomain("www.src5.co.uk") == "src5.co.uk")
    // single-label suffixes strip any subdomain depth
    assert(registrableDomain("a.cdn.src3.com") == "src3.com")
    assert(registrableDomain("src3.com") == "src3.com")
    // unknown TLD: PSL default = one suffix label
    assert(registrableDomain("x.y.zz") == "y.zz")
    // bare suffix-only host degrades to itself, never throws
    assert(registrableDomain("co.uk") == "co.uk")
  }

  test("etld gate blocks by registrable domain, not by source or host string") {
    val spark = TestSpark.spark
    val rows = graft.operators.Text.etldGate(spark, TestSpark.sf0001)
      .select("host", "etld1", "is_blocked").collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2)))
    assert(rows.nonEmpty)
    // every blocked row's etld1 is on the list; every on-list etld1 row is
    // blocked regardless of subdomain depth
    rows.foreach { case (host, etld1, b) =>
      assert((b == 1) == graft.operators.Text.EtldBlocklist(etld1), host)
      assert(host == etld1 || host.endsWith("." + etld1), s"$host vs $etld1")
    }
    // same source, different suffix ⇒ independent verdicts (src3.com is
    // listed; src3 under any other suffix must pass)
    val src3 = rows.filter(_._2.startsWith("src3."))
    assert(src3.exists(_._3 == 1) && src3.exists(_._3 == 0))
  }
}
