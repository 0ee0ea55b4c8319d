package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.XxHash64
import org.apache.spark.sql.types.{DataType, LongType}

/** KMV (k-minimum-values) distinct-count sketch as a
  * `TypedImperativeAggregate` — the engine's "custom sketch" extension point
  * (SURVEY §2.2 UDAF surface), complementing the built-in HLL++ demo
  * (`ref_approx_distinct`).
  *
  * Buffer = the k smallest 64-bit hashes seen; estimate = (k−1)/u(k) where
  * u(k) is the k-th smallest hash mapped to (0,1). Buffers are tiny (8k
  * bytes), merge by union-and-trim — associative and commutative, so
  * map-side partial aggregation applies and the shuffle carries k longs per
  * group regardless of input size: the 100 TB-friendly alternative to exact
  * COUNT(DISTINCT)'s two-shuffle expansion.
  *
  * Hashing: integral keys (the common distinct-count case — ids) go through
  * the engine-portable splitmix64 chain ([[Hashing.mix64]] over the
  * golden-ratio increment — exactly splitmix64's `next()` with the key as
  * state), the same wrapping-arithmetic family every oracle-replayed hash in
  * the engine uses, so the k-minimum hash set and hence the ESTIMATE are
  * bit-replayable in DuckDB (the `ref_kmv_distinct` oracle stages the chain
  * in HUGEINT CTEs). Every other input type falls back to Spark's XxHash64
  * on the unsafe row — the sketch stays correct, only the exact estimate's
  * engine-portability is integral-key-only.
  */
case class KmvDistinct(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[Long]] {

  // k = 1 would make the estimator (k-1)/u(k) identically zero, and k <= 0
  // crashes put()'s buf.last() on an empty set — fail at construction, which
  // the SQL builder surfaces as an analysis-time error
  require(k >= 2, s"kmv_distinct needs k >= 2 minimum values, got $k")

  private lazy val hasher = XxHash64(Seq(child), 42L)

  private lazy val integralKey: Boolean = child.dataType match {
    case org.apache.spark.sql.types.LongType | org.apache.spark.sql.types.IntegerType |
         org.apache.spark.sql.types.ShortType | org.apache.spark.sql.types.ByteType => true
    case _ => false
  }

  /** splitmix64(key): wrapping golden-ratio increment + full avalanche. */
  @inline private def splitmixOf(v: Any): Long = {
    val l = v match {
      case x: Long => x
      case x: Int => x.toLong
      case x: Short => x.toLong
      case x: Byte => x.toLong
    }
    Hashing.mix64(l + 0x9E3779B97F4A7C15L)
  }

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "kmv_distinct"

  override def createAggregationBuffer(): java.util.TreeSet[Long] =
    new java.util.TreeSet[Long]()

  // hashes are stored sign-flipped (h ^ Long.MinValue) so the TreeSet's
  // natural signed order IS the unsigned hash order — kth-min then really
  // means the k-th smallest uniform draw
  @inline private def put(buf: java.util.TreeSet[Long], hFlipped: Long): Unit =
    if (buf.size < k) { buf.add(hFlipped); () }
    else if (hFlipped < buf.last()) {
      buf.add(hFlipped)
      if (buf.size > k) { buf.pollLast(); () }
    }

  override def update(buf: java.util.TreeSet[Long], input: InternalRow): java.util.TreeSet[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = if (integralKey) splitmixOf(v)
              else hasher.eval(input).asInstanceOf[Long]
      put(buf, h ^ Long.MinValue)
    }
    buf
  }

  override def merge(a: java.util.TreeSet[Long], b: java.util.TreeSet[Long]): java.util.TreeSet[Long] = {
    val it = b.iterator()
    while (it.hasNext) put(a, it.next())
    a
  }

  override def eval(buf: java.util.TreeSet[Long]): Any =
    if (buf.size < k) buf.size.toLong
    else {
      // k-th smallest (flipped) hash mapped to a uniform draw in (0,1):
      // flipped/2^64 ∈ [−0.5, 0.5) → +0.5
      val u = buf.last().toDouble / 1.8446744073709552e19 + 0.5
      math.round((k - 1) / u)
    }

  override def serialize(buf: java.util.TreeSet[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 8)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val set = new java.util.TreeSet[Long]()
    var i = 0
    while (i < n) { set.add(bb.getLong); i += 1 }
    set
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): KmvDistinct =
    copy(child = newChildren.head)
}

object KmvDistinct {
  /** Column entry point: `df.agg(kmv_distinct(col("user_id"), 256))`. */
  def kmv_distinct(c: Column, k: Int = 256): Column =
    GraftBridge.column(
      KmvDistinct(GraftBridge.expression(c), k).toAggregateExpression())

  /** SQL builder: `kmv_distinct(col [, k])`, k a literal integer. */
  def build(exprs: Seq[Expression]): Expression = exprs match {
    case Seq(c) => KmvDistinct(c, 256)
    case Seq(c, org.apache.spark.sql.catalyst.expressions.Literal(k: Int, org.apache.spark.sql.types.IntegerType)) =>
      KmvDistinct(c, k)
    case _ =>
      throw new IllegalArgumentException(
        "kmv_distinct(column[, k]) needs a column and an optional literal integer k")
  }
}
