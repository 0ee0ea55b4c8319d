package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Mutable element-wise running sum over fixed-dimension vectors. */
case class VecSumBuf(var n: Long, var sum: Array[Double])

/** Typed Aggregator computing the per-group mean vector (centroid) of an
  * `Array[Double]` column: the building block of k-means codebooks, class
  * prototypes, and per-slice embedding drift monitors.
  *
  * Scale shape: partial aggregation runs map-side, so the shuffle carries ONE
  * (d)-length buffer per partition per group instead of the n·d scalar rows a
  * `posexplode → groupBy(group, dim)` plan shuffles — at 100 TB with d=1024
  * that is the difference between |groups|·|partitions| kilobyte-sized
  * buffers and re-shuffling the entire corpus. reduce/merge are allocation
  * free after the first vector of a buffer.
  */
class VectorMeanAgg
    extends Aggregator[(Int, Array[Double]), VecSumBuf, (Long, Array[Double])] {

  override def zero: VecSumBuf = VecSumBuf(0L, null)

  override def reduce(b: VecSumBuf, a: (Int, Array[Double])): VecSumBuf = {
    val v = a._2
    if (b.sum == null) { b.sum = v.clone(); b.n = 1L; return b }
    require(v.length == b.sum.length,
      s"mixed vector dimensions in one group: ${v.length} vs ${b.sum.length}")
    var i = 0
    while (i < v.length) { b.sum(i) += v(i); i += 1 }
    b.n += 1L
    b
  }

  override def merge(a: VecSumBuf, c: VecSumBuf): VecSumBuf = {
    if (a.sum == null) return c
    if (c.sum == null) return a
    require(a.sum.length == c.sum.length,
      s"mixed vector dimensions in one group: ${a.sum.length} vs ${c.sum.length}")
    var i = 0
    while (i < a.sum.length) { a.sum(i) += c.sum(i); i += 1 }
    a.n += c.n
    a
  }

  override def finish(b: VecSumBuf): (Long, Array[Double]) = {
    if (b.sum == null) (0L, Array.empty[Double])
    else {
      val m = new Array[Double](b.sum.length)
      var i = 0
      while (i < m.length) { m(i) = b.sum(i) / b.n; i += 1 }
      (b.n, m)
    }
  }

  override def bufferEncoder: Encoder[VecSumBuf] = Encoders.kryo[VecSumBuf]
  override def outputEncoder: Encoder[(Long, Array[Double])] =
    Encoders.product[(Long, Array[Double])]
}
