package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy-hitters sketch as a `TypedImperativeAggregate`: keeps at
  * most `k` (item, counter) pairs and guarantees that EVERY item with true
  * frequency > N/(k+1) is present when the aggregate finishes — no false
  * negatives — while each surviving counter underestimates by at most
  * N/(k+1) (Misra & Gries 1982; mergeability per Agarwal et al., PODS'12:
  * pointwise-add then subtract the (k+1)-th largest counter and drop ≤0,
  * which preserves the same total-decrement bound).
  *
  * This is the frequent-items complement to [[KmvDistinct]]: the buffer is
  * ≤ k pairs regardless of input size, partial aggregation runs map-side,
  * and the shuffle carries one ≤k-entry sketch per partition per group —
  * the 100 TB path to "which items exceed s·N frequency" without a full
  * (item → count) shuffle. The intended composition (see
  * `Text.heavyHitters`) is sketch pass → candidate set → exact recount of
  * the candidates only, making the sketch a pure optimization that is
  * invisible in the final result.
  *
  * eval returns the candidate items sorted lexicographically (a
  * deterministic `ARRAY<STRING>`); estimated counts stay internal since the
  * contract downstream is recount-exactly.
  */
case class MisraGries(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[String, Long]] {

  require(k > 0, s"misra_gries needs k > 0 counters, got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "misra_gries"

  override def createAggregationBuffer(): java.util.HashMap[String, Long] =
    new java.util.HashMap[String, Long]()

  override def update(buf: java.util.HashMap[String, Long], input: InternalRow): java.util.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val key = v.toString
      val cur = buf.get(key)
      if (cur != 0L || buf.containsKey(key)) buf.put(key, cur + 1L)
      else if (buf.size < k) buf.put(key, 1L)
      else {
        // decrement-all round: every live counter pays 1; zeros drop out
        val it = buf.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (e.getValue == 1L) it.remove() else e.setValue(e.getValue - 1L)
        }
      }
    }
    buf
  }

  override def merge(a: java.util.HashMap[String, Long], b: java.util.HashMap[String, Long]): java.util.HashMap[String, Long] = {
    val it = b.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = a.get(e.getKey)
      a.put(e.getKey, cur + e.getValue)
    }
    if (a.size > k) {
      // subtract the (k+1)-th largest counter from all, drop non-positives
      val vals = new Array[Long](a.size)
      var i = 0
      val vit = a.values().iterator()
      while (vit.hasNext) { vals(i) = vit.next(); i += 1 }
      java.util.Arrays.sort(vals)
      val sub = vals(a.size - (k + 1)) // (k+1)-th largest
      val eit = a.entrySet().iterator()
      while (eit.hasNext) {
        val e = eit.next()
        if (e.getValue <= sub) eit.remove() else e.setValue(e.getValue - sub)
      }
    }
    a
  }

  override def eval(buf: java.util.HashMap[String, Long]): Any = {
    val keys = new Array[String](buf.size)
    buf.keySet().toArray(keys)
    java.util.Arrays.sort(keys, java.util.Comparator.naturalOrder[String]())
    new GenericArrayData(keys.map(UTF8String.fromString(_): Any))
  }

  override def serialize(buf: java.util.HashMap[String, Long]): Array[Byte] = {
    var bytes = 4
    val entries = new java.util.ArrayList[(Array[Byte], Long)](buf.size)
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val kb = e.getKey.getBytes(StandardCharsets.UTF_8)
      entries.add((kb, e.getValue))
      bytes += 4 + kb.length + 8
    }
    val bb = ByteBuffer.allocate(bytes)
    bb.putInt(entries.size)
    var i = 0
    while (i < entries.size) {
      val (kb, v) = entries.get(i)
      bb.putInt(kb.length); bb.put(kb); bb.putLong(v)
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[String, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val m = new java.util.HashMap[String, Long](n * 2)
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val kb = new Array[Byte](len)
      bb.get(kb)
      m.put(new String(kb, StandardCharsets.UTF_8), bb.getLong)
      i += 1
    }
    m
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): MisraGries =
    copy(child = newChildren.head)
}

object MisraGries {
  /** Column entry point: `df.agg(misra_gries(col("term"), 200))`. */
  def misra_gries(c: Column, k: Int): Column =
    GraftBridge.column(
      MisraGries(GraftBridge.expression(c), k).toAggregateExpression())

  /** SQL builder: `misra_gries(col, k)` with a literal integer k. */
  def build(exprs: Seq[Expression]): Expression = exprs match {
    case Seq(c, org.apache.spark.sql.catalyst.expressions.Literal(k: Int, org.apache.spark.sql.types.IntegerType)) =>
      MisraGries(c, k)
    case _ =>
      throw new IllegalArgumentException(
        "misra_gries(column, k) needs a column and a literal integer k")
  }
}
