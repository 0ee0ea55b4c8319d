package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal-column plumbing (north-star extension): media as opaque
  * `binary` columns with typed metadata, decode / feature-extract /
  * frame-sample as distributed transforms.
  *
  * The container has no image/audio codecs, so the decode kernel is a
  * clearly-marked DETERMINISTIC FAKE (byte-statistics standing in for pixel
  * decoding) — the Spark-side plumbing (schema, batching, partitioning,
  * per-frame explode) is real and is what the tests cover. Swapping the fake
  * for a JNI/ffmpeg kernel changes one function.
  */
object Multimodal {
  type Q = (SparkSession, String) => DataFrame

  /** STUB — deterministic fake decode: real implementation would hand
    * `bytes` to an image codec; this derives stable pseudo-metadata from the
    * payload so plumbing is testable without codecs. */
  def fakeDecodeMeta(bytes: Array[Byte]): (Int, Int, Double) = {
    val n = bytes.length
    var i = 0; var sum = 0.0
    while (i < n) { sum += (bytes(i) & 0xff); i += 1 }
    val mean = if (n == 0) 0.0 else sum / n
    (640 + n % 640, 360 + n % 360, mean) // (width, height, mean "luma")
  }

  /** Metadata projection over a binary media column (here: utf-8 text bytes
    * as the stand-in payload). Oracle-checked: byte length + header hex are
    * codec-independent. */
  val multimodalMeta: Q = (s, d) => {
    val bin = col("text").cast("binary")
    Tables.documents(s, d)
      .select(col("doc_id"),
        length(bin).cast("long").as("n_bytes"),
        lower(hex(substring(bin, 1, 8))).as("head_hex"))
      .orderBy(col("doc_id"))
  }

  /** Frame sampling over a fake "video" payload: every 64th byte offset is a
    * "frame"; per-frame rows carry (idx, offset, fake feature). The explode
    * pattern — one row per sampled frame, partition-parallel over media
    * blobs — is exactly the 100 TB video-pipeline shape (blob-sized tasks,
    * no driver involvement).
    *
    * Oracle-checked: the stub kernel is pure byte arithmetic, so DuckDB can
    * replay it per byte. `frame_mean` is fixed-point — floor(sum*1e4/cnt)
    * in LONG arithmetic, then one exact integer÷10000.0 — so both engines
    * compute the identical double (a float mean hits round-half ties that
    * rint and SQL round() break differently). */
  val multimodalFrames: Q = (s, d) => {
    val spark = s
    import spark.implicits._
    Tables.documents(s, d)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .flatMap { case (id, text) =>
        val bytes = text.getBytes("UTF-8")
        val (w, h, _) = fakeDecodeMeta(bytes)
        val stride = 64
        // in-place byte loop, no slice allocation / boxed iterator: the
        // per-byte boxing was the whole 22.7 s of round 1's frame pass
        (0 until math.max(1, bytes.length / stride)).iterator.map { f =>
          val off = f * stride
          val end = math.min(bytes.length, off + stride)
          var j = off; var sum = 0L
          while (j < end) { sum += (bytes(j) & 0xff); j += 1 }
          val mean = if (end == off) 0.0 else (sum * 10000L / (end - off)).toDouble / 10000.0
          (id, f.toLong, off.toLong, w.toLong, h.toLong, mean)
        }
      }
      .toDF("doc_id", "frame_idx", "byte_off", "width", "height", "frame_mean")
      .orderBy(col("doc_id"), col("frame_idx"))
  }

  /** STUB resize kernel: real code would decode, scale 2× down, re-encode;
    * the fake keeps every 4th byte (area ratio of a 2× downscale). */
  def fakeResize(bytes: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte]((bytes.length + 3) / 4)
    var i = 0
    while (i < out.length) { out(i) = bytes(i * 4); i += 1 }
    out
  }

  /** Resize pass over the media column: emits the resized payload's true
    * length plus old/new dims. Oracle-checked — the stub kernel's output
    * length and the fake dims are pure arithmetic on octet_length, so DuckDB
    * can verify the whole transform without running it. */
  val multimodalResize: Q = (s, d) => {
    val spark = s
    import spark.implicits._
    Tables.documents(s, d)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        val bytes = text.getBytes("UTF-8")
        val (w, h, _) = fakeDecodeMeta(bytes)
        val resized = fakeResize(bytes)
        (id, w.toLong, h.toLong, w / 2L, h / 2L, resized.length.toLong)
      }
      .toDF("doc_id", "width", "height", "new_width", "new_height", "n_bytes_out")
      .orderBy(col("doc_id"))
  }

  /** Feature extraction: media payload → fixed-size dense vector (8-bin
    * normalized byte histogram standing in for a CNN embedding). Internally
    * the kernel produces the similarity-ready array (`vec_dot`/cosine over it
    * composes with the Vectors operators); the driver-checked output flattens
    * it to scalar `b0..b7` columns — array columns break the driver's pandas
    * row hasher.
    *
    * Oracle-checked (byte-replay oracle, same fixed-point contract as
    * [[multimodalFrames]]); MultimodalSpec additionally pins the kernel's
    * determinism and the distribution-sum invariant. */
  val multimodalFeatures: Q = (s, d) => {
    val spark = s
    import spark.implicits._
    Tables.documents(s, d)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        val bytes = text.getBytes("UTF-8")
        val hist = new Array[Long](8)
        var i = 0
        while (i < bytes.length) { hist((bytes(i) & 0xff) >> 5) += 1L; i += 1 }
        val out = new Array[Double](8)
        if (bytes.length > 0) {
          var b = 0
          while (b < 8) {
            out(b) = (hist(b) * 10000L / bytes.length).toDouble / 10000.0
            b += 1
          }
        }
        (id, out(0), out(1), out(2), out(3), out(4), out(5), out(6), out(7))
      }
      .toDF("doc_id", "b0", "b1", "b2", "b3", "b4", "b5", "b6", "b7")
      .orderBy(col("doc_id"))
  }

  val queries: Map[String, Q] = Map(
    "q_multimodal_meta"     -> multimodalMeta,
    "q_multimodal_frames"   -> multimodalFrames,
    "q_multimodal_resize"   -> multimodalResize,
    "q_multimodal_features" -> multimodalFeatures,
  )

  val oracles: Map[String, String] = Map(
    "q_multimodal_meta" ->
      """SELECT doc_id,
        | CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
        | lower(left(hex(CAST(text AS BLOB)), 16)) AS head_hex
        |FROM documents ORDER BY doc_id""".stripMargin,
    // the stub kernels are pure arithmetic on the byte length, so the whole
    // resize transform is SQL-verifiable: w = 640 + n%640, h = 360 + n%360,
    // resized length = ceil(n/4)
    "q_multimodal_resize" ->
      """WITH t AS (
        |  SELECT doc_id, CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n
        |  FROM documents)
        |SELECT doc_id,
        | 640 + n % 640 AS width, 360 + n % 360 AS height,
        | (640 + n % 640) // 2 AS new_width, (360 + n % 360) // 2 AS new_height,
        | (n + 3) // 4 AS n_bytes_out
        |FROM t ORDER BY doc_id""".stripMargin,
    // byte-replay oracles: the stub kernels are deterministic byte
    // arithmetic, so DuckDB re-runs them per byte via ascii(substr(...)).
    // Empty-text documents are handled explicitly (the frames kernel emits
    // one zero frame, the features kernel an all-zero row — the per-byte
    // CTEs produce no rows for them, so a UNION ALL / LEFT JOIN restores
    // the rows rather than silently dropping the doc).
    // Valid because the corpus is ASCII (octet == char; MultimodalSpec
    // pins the assumption); frame_mean/b_i are fixed-point longs divided
    // by 10000.0, IEEE-identical on both engines.
    "q_multimodal_frames" ->
      """WITH t AS (
        |  SELECT doc_id, text, CAST(length(text) AS BIGINT) AS n FROM documents),
        |f AS (
        |  SELECT doc_id, text, n,
        |    unnest(range(0, greatest(n // 64, 1))) AS frame_idx FROM t),
        |i AS (
        |  SELECT doc_id, n, frame_idx,
        |    ascii(substr(text,
        |      CAST(unnest(range(frame_idx * 64, least(n, frame_idx * 64 + 64))) + 1 AS INT),
        |      1)) AS b
        |  FROM f),
        |a AS (
        |  SELECT doc_id, frame_idx, CAST(sum(b) AS BIGINT) AS s, count(*) AS c
        |  FROM i GROUP BY doc_id, frame_idx)
        |SELECT a.doc_id, a.frame_idx, a.frame_idx * 64 AS byte_off,
        |  640 + t.n % 640 AS width, 360 + t.n % 360 AS height,
        |  CAST(a.s * 10000 // a.c AS DOUBLE) / 10000.0 AS frame_mean
        |FROM a JOIN t USING (doc_id)
        |UNION ALL
        |SELECT doc_id, 0, 0, 640 + n % 640, 360 + n % 360, 0.0
        |FROM t WHERE n = 0
        |ORDER BY doc_id, frame_idx""".stripMargin,
    "q_multimodal_features" ->
      """WITH t AS (
        |  SELECT doc_id, text, CAST(length(text) AS BIGINT) AS n FROM documents),
        |i AS (
        |  SELECT doc_id, n,
        |    ascii(substr(text, CAST(unnest(range(0, n)) + 1 AS INT), 1)) // 32 AS bin
        |  FROM t),
        |h AS (
        |  SELECT doc_id, max(n) AS n,
        |    CAST(sum(CASE WHEN bin = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c0,
        |    CAST(sum(CASE WHEN bin = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
        |    CAST(sum(CASE WHEN bin = 2 THEN 1 ELSE 0 END) AS BIGINT) AS c2,
        |    CAST(sum(CASE WHEN bin = 3 THEN 1 ELSE 0 END) AS BIGINT) AS c3,
        |    CAST(sum(CASE WHEN bin = 4 THEN 1 ELSE 0 END) AS BIGINT) AS c4,
        |    CAST(sum(CASE WHEN bin = 5 THEN 1 ELSE 0 END) AS BIGINT) AS c5,
        |    CAST(sum(CASE WHEN bin = 6 THEN 1 ELSE 0 END) AS BIGINT) AS c6,
        |    CAST(sum(CASE WHEN bin = 7 THEN 1 ELSE 0 END) AS BIGINT) AS c7
        |  FROM i GROUP BY doc_id)
        |SELECT t.doc_id,
        |  coalesce(CAST(c0 * 10000 // h.n AS DOUBLE) / 10000.0, 0.0) AS b0,
        |  coalesce(CAST(c1 * 10000 // h.n AS DOUBLE) / 10000.0, 0.0) AS b1,
        |  coalesce(CAST(c2 * 10000 // h.n AS DOUBLE) / 10000.0, 0.0) AS b2,
        |  coalesce(CAST(c3 * 10000 // h.n AS DOUBLE) / 10000.0, 0.0) AS b3,
        |  coalesce(CAST(c4 * 10000 // h.n AS DOUBLE) / 10000.0, 0.0) AS b4,
        |  coalesce(CAST(c5 * 10000 // h.n AS DOUBLE) / 10000.0, 0.0) AS b5,
        |  coalesce(CAST(c6 * 10000 // h.n AS DOUBLE) / 10000.0, 0.0) AS b6,
        |  coalesce(CAST(c7 * 10000 // h.n AS DOUBLE) / 10000.0, 0.0) AS b7
        |FROM t LEFT JOIN h ON t.doc_id = h.doc_id
        |ORDER BY t.doc_id""".stripMargin,
  )
}
