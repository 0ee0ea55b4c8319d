package graft.functions

import org.apache.spark.sql.SparkSession

/** Deterministic hash families for the dedup/similarity operators
  * (MinHash+LSH banding, SimHash, winnowing fingerprints). All hashes are
  * seed-fixed and engine-independent (FNV-1a over UTF-8 bytes), so
  * signatures are reproducible across runs and cluster sizes — a property
  * the reference's offset bookkeeping never needed but 100 TB dedup does
  * (re-runs must bucket identically for incremental pipelines).
  */
object Hashing {

  /** Hex MD5 over UTF-8 bytes — byte-identical to Spark SQL's `md5()` and
    * DuckDB's `md5()`, for typed kernels that must hash like the
    * declarative keys (e.g. the streaming span-scrub twin vs the batch
    * key's `md5(scrub)` column). */
  def md5Hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
    d.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  /** 64-bit FNV-1a — stable, allocation-free, portable. */
  def fnv64(s: String): Long = {
    var h = 0xcbf29ce484222325L
    val bytes = s.getBytes("UTF-8")
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** Seeded variant for the MinHash permutation family. */
  def fnv64Seeded(s: String, seed: Long): Long = {
    var h = 0xcbf29ce484222325L ^ java.lang.Long.rotateLeft(seed, 17)
    val bytes = s.getBytes("UTF-8")
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    // final avalanche (splitmix64 tail) to decorrelate seeds
    h ^= (h >>> 30); h *= 0xbf58476d1ce4e5b9L
    h ^= (h >>> 27); h *= 0x94d049bb133111ebL
    h ^ (h >>> 31)
  }

  /** splitmix64 avalanche — full-period mixer. */
  @inline def mix64(z0: Long): Long = {
    var z = z0
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** MinHash signature over a shingle set: sig(i) = min over shingles of
    * h_i(shingle). Each shingle's bytes are hashed ONCE (FNV-1a); the i-th
    * permutation is a splitmix64 remix of that base — O(len + k) per shingle
    * instead of O(len·k), which benchmarked ~6× faster at 5k docs × 32
    * hashes, with the same collision properties (full-avalanche mixer). */
  def minhash(shingles: Seq[String], numHashes: Int): Array[Long] = {
    val sig = Array.fill(numHashes)(Long.MaxValue)
    shingles.foreach { sh =>
      val base = fnv64(sh)
      var i = 0
      while (i < numHashes) {
        val h = mix64(base + 0x9e3779b97f4a7c15L * (i + 1))
        if (h < sig(i)) sig(i) = h
        i += 1
      }
    }
    sig
  }

  /** LSH band keys: hash `rows`-sized signature slices; docs sharing any
    * band key are candidate pairs. bands*rows == numHashes. */
  def lshBands(sig: Array[Long], bands: Int, rows: Int): Array[Long] =
    (0 until bands).map { b =>
      var h = 0xcbf29ce484222325L ^ b.toLong
      var r = 0
      while (r < rows) {
        h ^= sig(b * rows + r)
        h *= 0x100000001b3L
        r += 1
      }
      h
    }.toArray

  /** 64-bit SimHash over a token multiset. */
  def simhash(tokens: Seq[String]): Long = {
    val acc = new Array[Int](64)
    tokens.foreach { t =>
      val h = fnv64(t)
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) acc(j) += 1 else acc(j) -= 1
        j += 1
      }
    }
    var out = 0L
    var j = 0
    while (j < 64) { if (acc(j) > 0) out |= (1L << j); j += 1 }
    out
  }

  def hamming64(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  /** Sign-random-projection (SRP) signature (Charikar, STOC'02): bit i is
    * the sign of v·h_i for a deterministic Rademacher (±1-component)
    * hyperplane h_i derived from (seed, i, j) — no hyperplane matrix is
    * stored or shipped; every executor regenerates the same planes from the
    * seed. Per-bit collision probability for vectors at angle θ is 1 − θ/π,
    * which is what makes banded SRP sound ONLY for near-1 cosine thresholds
    * (see [[graft.operators.Vectors]] for the quantitative envelope). */
  def srpSig(v: Array[Double], nBits: Int, seed: Long): Array[Long] = {
    val dim = v.length
    val sig = new Array[Long]((nBits + 63) >> 6)
    var b = 0
    while (b < nBits) {
      val base = seed + b.toLong * 0x9e3779b97f4a7c15L
      var acc = 0.0
      var j = 0
      while (j < dim) {
        val h = mix64(base + j.toLong * 0xc2b2ae3d27d4eb4fL)
        acc += (if ((h & 1L) == 0L) v(j) else -v(j))
        j += 1
      }
      if (acc > 0) sig(b >> 6) |= 1L << (b & 63)
      b += 1
    }
    sig
  }

  /** LSH band keys over a packed SRP signature: band k's key is its `rows`
    * raw sign bits (rows ≤ 32, so the key space is 2^rows per band — keys
    * are compared only within a band, the join is on (band, key)). */
  def srpBandKeys(sig: Array[Long], bands: Int, rows: Int): Array[Long] = {
    require(rows <= 32, s"srp band rows must be <= 32, got $rows")
    Array.tabulate(bands) { k =>
      var key = 0L
      var r = 0
      while (r < rows) {
        val bit = k * rows + r
        key = (key << 1) | ((sig(bit >> 6) >>> (bit & 63)) & 1L)
        r += 1
      }
      key
    }
  }

  /** Winnowing document fingerprint (Schleimer et al., SIGMOD'03): k-gram
    * rolling hashes, keep the rightmost minimum of each sliding window of
    * size w; returns distinct selected hashes.
    *
    * O(n) end to end: the k-gram hashes roll (one multiply-add in, one
    * multiply-subtract out, splitmix64 avalanche on top — no substring
    * allocation per position, which was O(n·k) work and the round-2
    * q_doc_fingerprint hot spot), and window minima come from a monotonic
    * index deque instead of a rescan per window. */
  def winnow(text: String, k: Int, w: Int): Array[Long] = {
    val n = text.length - k + 1
    if (n <= 0) return Array.empty
    val B = 0x100000001b3L
    var bk = 1L // B^(k-1), the factor of the outgoing code unit
    var j = 1
    while (j < k) { bk *= B; j += 1 }
    val grams = new Array[Long](n)
    var h = 0L
    var i = 0
    while (i < k) { h = h * B + text.charAt(i); i += 1 }
    grams(0) = mix64(h)
    i = 1
    while (i < n) {
      h = (h - text.charAt(i - 1) * bk) * B + text.charAt(i + k - 1)
      grams(i) = mix64(h)
      i += 1
    }
    if (n <= w) return grams.distinct.sorted
    // monotonic deque of candidate indices; popping on >= keeps the
    // RIGHTMOST index among equal minima, matching the winnowing tie rule
    val picked = scala.collection.mutable.LinkedHashSet.empty[Long]
    val dq = new Array[Int](n)
    var head = 0
    var tail = 0
    i = 0
    while (i < n) {
      while (tail > head && grams(dq(tail - 1)) >= grams(i)) tail -= 1
      dq(tail) = i; tail += 1
      if (dq(head) <= i - w) head += 1
      if (i >= w - 1) picked += grams(dq(head))
      i += 1
    }
    picked.toArray.sorted
  }

  /** Register as SQL-callable functions (the engine's text/dedup UDF
    * surface). */
  def register(spark: SparkSession): Unit = {
    spark.udf.register("fnv64", (s: String) => fnv64(s))
    spark.udf.register("minhash_sig",
      (sh: Seq[String], n: Int) => minhash(sh, n))
    spark.udf.register("lsh_bands",
      (sig: Seq[Long], bands: Int, rows: Int) => lshBands(sig.toArray, bands, rows))
    spark.udf.register("simhash64", (ts: Seq[String]) => simhash(ts))
    spark.udf.register("hamming64", (a: Long, b: Long) => hamming64(a, b))
    spark.udf.register("winnow_fp", (s: String, k: Int, w: Int) => winnow(s, k, w))
    spark.udf.register("srp_sig",
      (v: Seq[Double], nBits: Int, seed: Long) => srpSig(v.toArray, nBits, seed))
    spark.udf.register("srp_band_keys",
      (sig: Seq[Long], bands: Int, rows: Int) => srpBandKeys(sig.toArray, bands, rows))
  }
}
