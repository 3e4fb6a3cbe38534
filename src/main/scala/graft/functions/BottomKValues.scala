package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Value-carrying KMV sample: keeps the VALUE column of the k rows
  * whose (caller-supplied) hash keys are smallest — the grouped /
  * streaming building block behind deterministic sample quantiles
  * ([[graft.operators.ScaleOps.sampleQuantilesByGroup]] and
  * `StreamOps.windowedSampleQuantiles`), where an ORDER BY + LIMIT
  * per group/window doesn't exist as a single mergeable aggregate.
  *
  * State is one flat Array[Long] of ≤ 2k entries — (hash, value-bits)
  * pairs interleaved, sorted ascending by unsigned hash — mergeable and
  * map-side-partial like [[BottomKSketch]], with the same binary-search
  * + arraycopy insertion (the q256 rehearsal lesson: never re-sort per
  * insert). Values ride as raw `doubleToLongBits`; `finish` unpacks
  * them. Caller contract: the hash key is unique per row (an
  * md5-60-bit image of a unique id) — duplicate hashes keep the
  * first-seen value, as a KMV set must.
  */
class BottomKValues(k: Int)
    extends Aggregator[(Long, Double), Array[Long], Array[Double]] {
  require(k > 0, "k must be positive")

  override def zero: Array[Long] = Array.empty

  override def reduce(buf: Array[Long], in: (Long, Double)): Array[Long] =
    insert(buf, in._1, java.lang.Double.doubleToLongBits(in._2))

  /** Bulk two-pointer merge over the interleaved (hash, value) pairs —
    * O(|a|+|b|) instead of the per-pair insert's O(k) array copy each
    * (the BottomKSketch merge lesson applied to the value-carrying
    * twin). On a duplicate hash the pair from `a` wins, exactly as the
    * insert fold kept the first-seen value.
    */
  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    if (b.length == 0) return a
    if (a.length == 0) return b
    val outN = math.min((a.length + b.length) / 2, k)
    val out = new Array[Long](2 * outN)
    var i = 0; var j = 0; var o = 0
    while (o < outN && (i * 2 < a.length || j * 2 < b.length)) {
      if (j * 2 >= b.length) { out(2 * o) = a(2 * i); out(2 * o + 1) = a(2 * i + 1); i += 1 }
      else if (i * 2 >= a.length) { out(2 * o) = b(2 * j); out(2 * o + 1) = b(2 * j + 1); j += 1 }
      else {
        val c = java.lang.Long.compareUnsigned(a(2 * i), b(2 * j))
        if (c <= 0) {
          out(2 * o) = a(2 * i); out(2 * o + 1) = a(2 * i + 1); i += 1
          if (c == 0) j += 1 // duplicate hash — a's (first-seen) value wins
        } else { out(2 * o) = b(2 * j); out(2 * o + 1) = b(2 * j + 1); j += 1 }
      }
      o += 1
    }
    if (o < outN) java.util.Arrays.copyOf(out, 2 * o) else out
  }

  override def finish(buf: Array[Long]): Array[Double] = {
    val vals = new Array[Double](buf.length / 2)
    var i = 0
    while (i < vals.length) {
      vals(i) = java.lang.Double.longBitsToDouble(buf(2 * i + 1)); i += 1
    }
    vals
  }

  private def insert(buf: Array[Long], h: Long, vbits: Long): Array[Long] = {
    val n = buf.length / 2
    if (n >= k && java.lang.Long.compareUnsigned(h, buf(2 * (n - 1))) >= 0) buf
    else {
      var lo = 0
      var hi = n
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        val c = java.lang.Long.compareUnsigned(buf(2 * mid), h)
        if (c == 0) return buf // duplicate hash — keep the first value
        if (c < 0) lo = mid + 1 else hi = mid
      }
      val outN = math.min(n + 1, k)
      val out = new Array[Long](2 * outN)
      System.arraycopy(buf, 0, out, 0, 2 * lo)
      out(2 * lo) = h
      out(2 * lo + 1) = vbits
      val tail = math.min(n - lo, outN - lo - 1)
      if (tail > 0) System.arraycopy(buf, 2 * lo, out, 2 * (lo + 1), 2 * tail)
      out
    }
  }

  override def bufferEncoder: Encoder[Array[Long]] = BottomKSketch.longArrayEncoder
  override def outputEncoder: Encoder[Array[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
}

object BottomKValues {
  /** Column aggregate: values of the k smallest-hash rows. */
  def sample(hash: Column, value: Column, k: Int): Column =
    udaf(new BottomKValues(k)).apply(hash, value)
}
