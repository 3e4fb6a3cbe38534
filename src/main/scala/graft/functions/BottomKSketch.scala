package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bottom-k (KMV) sketch as a typed `Aggregator` — the k smallest
  * xxhash64 values of a group's inputs. One small mergeable state per
  * group gives two operators at once:
  *
  *  - a DETERMINISTIC distinct sample of the group (hash-ordered, so
  *    independent of row order, partitioning, and merge order — unlike
  *    reservoir sampling);
  *  - a distinct-cardinality estimate: with R = (k-th smallest hash as
  *    a fraction of the hash space), n̂ ≈ (k−1)/R.
  *
  * Completes the custom-code palette alongside the native expressions:
  * Aggregator[IN, BUF, OUT] with partial aggregation and merge handled
  * by Spark; registered for DataFrames via `functions.udaf`.
  * EXTENSION (no reference counterpart — the reference has no UDAFs,
  * SURVEY.md §2 "UDF/UDAF/UDTF: none").
  */
class BottomKSketch(k: Int, hashInput: Boolean = true)
    extends Aggregator[Long, Array[Long], Array[Long]] {
  require(k > 0, "k must be positive")

  override def zero: Array[Long] = Array.empty

  /** Inputs are hashed here (xxhash64 of the long, seed 42 — same family
    * as the engine's other sketches) so callers pass raw values.
    * `hashInput = false` skips that hash for callers whose values are
    * ALREADY a uniform hash (e.g. the md5-60-bit shingle keys of
    * `ScaleOps.kmvCorpusOverlap`, whose arithmetic a SQL oracle must
    * replay — xxhash64-of-a-hash would break the replay for no
    * uniformity gain).
    */
  override def reduce(buf: Array[Long], value: Long): Array[Long] = {
    val h = if (hashInput) MinHash.hashLong(value) else value
    insert(buf, h)
  }

  /** Bulk two-pointer merge of two sorted buffers — O(|a|+|b|), not the
    * per-element insert (which copies the whole array per element:
    * O(k²) when two full sketches meet, a real constant on the
    * partial-aggregation combine path every KMV consumer pays at every
    * exchange). Result is bit-identical to the insert fold: the k
    * unsigned-smallest of the deduplicated union.
    */
  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    if (b.length == 0) return a
    if (a.length == 0) return b
    val out = new Array[Long](math.min(a.length + b.length, k))
    var i = 0; var j = 0; var o = 0
    while (o < out.length && (i < a.length || j < b.length)) {
      if (j >= b.length) { out(o) = a(i); i += 1 }
      else if (i >= a.length) { out(o) = b(j); j += 1 }
      else {
        val c = java.lang.Long.compareUnsigned(a(i), b(j))
        if (c < 0) { out(o) = a(i); i += 1 }
        else if (c > 0) { out(o) = b(j); j += 1 }
        else { out(o) = a(i); i += 1; j += 1 } // duplicate — a set keeps one
      }
      o += 1
    }
    if (o < out.length) java.util.Arrays.copyOf(out, o) else out
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  private def insert(buf: Array[Long], h: Long): Array[Long] = {
    // unsigned order; buf is kept sorted ascending (unsigned), ≤ k long.
    // The common case (sketch full, h above the kth smallest) is one
    // compare; a real insertion is an unsigned binary search plus two
    // arraycopies — NOT an allocate-and-re-sort, which at 100 TB row
    // counts costs O(k log k) boxed comparisons for each of the
    // k·ln(n/k) expected insertions per task (caught by the q256 sf10
    // rehearsal: the re-sort dominated the whole estimate).
    if (buf.length >= k && java.lang.Long.compareUnsigned(h, buf(buf.length - 1)) >= 0) buf
    else {
      var lo = 0
      var hi = buf.length
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        val c = java.lang.Long.compareUnsigned(buf(mid), h)
        if (c == 0) return buf // duplicate hash — sketch is a set
        if (c < 0) lo = mid + 1 else hi = mid
      }
      val outLen = math.min(buf.length + 1, k)
      val out = new Array[Long](outLen)
      System.arraycopy(buf, 0, out, 0, lo)
      out(lo) = h
      val tail = math.min(buf.length - lo, outLen - lo - 1)
      if (tail > 0) System.arraycopy(buf, lo, out, lo + 1, tail)
      out
    }
  }

  override def bufferEncoder: Encoder[Array[Long]] = BottomKSketch.longArrayEncoder
  override def outputEncoder: Encoder[Array[Long]] = BottomKSketch.longArrayEncoder
}

object BottomKSketch {

  private[functions] val longArrayEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()

  private val HashSpace = 1.8446744073709552e19 // 2^64

  /** Column aggregate: bottom-k sketch of a LONG column. */
  def sketch(col: Column, k: Int): Column = udaf(new BottomKSketch(k)).apply(col)

  /** KMV estimate of the distinct count from a finished sketch.
    * Exact when the sketch is not full (fewer than k distincts seen).
    */
  def estimateDistinct(sketch: Array[Long], k: Int): Double =
    if (sketch.length < k) sketch.length.toDouble
    else {
      // k-th smallest hash as a fraction of the unsigned 64-bit space
      val kth = sketch.last
      val unsigned = if (kth >= 0) kth.toDouble else kth.toDouble + HashSpace
      val r = unsigned / HashSpace
      if (r <= 0.0) Double.PositiveInfinity else (k - 1).toDouble / r
    }
}
