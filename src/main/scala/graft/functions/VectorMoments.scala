package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Finished output of [[VectorMoments]]: row count, per-dimension sums
  * and the upper-triangular Gram matrix (row-major, d(d+1)/2 entries)
  * of the QUANTIZED vectors q_i = floor(x_i · 2^bits) — all exact
  * 64-bit integers.
  */
final case class VectorMomentsState(n: Long, sums: Array[Long], gram: Array[Long])

/** Exact fixed-point first and second moments of an embedding column in
  * ONE pass: the sufficient statistics for the mean vector and the
  * covariance/Gram matrix of the corpus.
  *
  * Why fixed-point: float sums are order-dependent, so a distributed
  * mean/covariance would differ run-to-run (partitioning, merge order)
  * and engine-to-engine. Quantizing each element to q = floor(x · 2^bits)
  * FIRST — floor of an exact IEEE product, bit-deterministic in any
  * engine — and summing exact integers makes the moments independent of
  * row order, partitioning and merge order, and replayable verbatim by a
  * SQL oracle. The 2^-bits quantization step (default bits=20 →
  * ~1e-6 per element) is far below embedding noise and is part of the
  * operator contract, exactly like the engine's md5-derived sampling
  * keys.
  *
  * State is ONE flat Array[Long] of length 1 + d + d(d+1)/2 (d=64 →
  * 2 145 longs ≈ 17 KB), mergeable, with map-side partial aggregation —
  * the classic one-pass Gram trick: at 100 TB nothing but this buffer
  * crosses the wire. Accumulation uses Math.addExact/multiplyExact so
  * overflow fails LOUDLY instead of silently wrapping; with |x| ≤ 2 and
  * bits=20 the per-pair budget holds past 10^9 rows — beyond that, run
  * on a hash sample (the documented scale path for spectral analysis,
  * as for k-means seeding).
  *
  * EXTENSION (no reference counterpart — the reference has no vector
  * analytics; SURVEY.md §2 "UDF/UDAF/UDTF: none").
  */
class VectorMoments(dim: Int, bits: Int, gram: Boolean = true)
    extends Aggregator[Seq[Double], Array[Long], VectorMomentsState] {
  require(dim > 0, "dim must be positive")
  require(bits >= 0 && bits <= 30, s"bits must be in [0,30], got $bits")

  private val scale = (1L << bits).toDouble
  // gram=false is the SUMS-ONLY arm: d+1 longs of state and d adds per
  // row where the full kernel pays d(d+1)/2 multiply-adds and a ~17 KB
  // buffer (d=64) — the right shape for consumers that need only the
  // mean surface (Embeddings.groupMeans), a ~30× per-row constant on a
  // 100 TB drift scan. Identical quantization and overflow contract;
  // `finish` returns an EMPTY gram.
  private val len = if (gram) 1 + dim + dim * (dim + 1) / 2 else 1 + dim

  override def zero: Array[Long] = new Array[Long](len)

  override def reduce(buf: Array[Long], vec: Seq[Double]): Array[Long] = {
    if (vec == null) return buf
    require(vec.length == dim,
      s"vec_moments: expected dim=$dim, got vector of length ${vec.length}")
    val q = new Array[Long](dim)
    var i = 0
    while (i < dim) { q(i) = math.floor(vec(i) * scale).toLong; i += 1 }
    buf(0) = Math.addExact(buf(0), 1L)
    i = 0
    while (i < dim) {
      buf(1 + i) = Math.addExact(buf(1 + i), q(i))
      i += 1
    }
    if (gram) {
      i = 0
      var g = 1 + dim
      while (i < dim) {
        var j = i
        while (j < dim) {
          buf(g) = Math.addExact(buf(g), Math.multiplyExact(q(i), q(j)))
          j += 1; g += 1
        }
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < len) { a(i) = Math.addExact(a(i), b(i)); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): VectorMomentsState =
    VectorMomentsState(
      buf(0),
      java.util.Arrays.copyOfRange(buf, 1, 1 + dim),
      java.util.Arrays.copyOfRange(buf, 1 + dim, len))

  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[VectorMomentsState] =
    ExpressionEncoder[VectorMomentsState]()
}

object VectorMoments {

  /** Column aggregate over an array<double> column (cast array<float>
    * inputs first — the widening is exact).
    */
  def agg(vec: Column, dim: Int, bits: Int = 20): Column =
    udaf(new VectorMoments(dim, bits)).apply(vec)

  /** Sums-only aggregate (n + per-dimension sums, EMPTY gram): d+1
    * longs of state for mean-surface consumers — same quantization,
    * same addExact overflow contract, ~d/2× cheaper per row than the
    * full Gram kernel.
    */
  def sumsAgg(vec: Column, dim: Int, bits: Int = 20): Column =
    udaf(new VectorMoments(dim, bits, gram = false)).apply(vec)

  /** Upper-triangle row-major index of (i, j), 0-based, i ≤ j. */
  def triIndex(dim: Int, i: Int, j: Int): Int =
    i * dim - i * (i - 1) / 2 + (j - i)
}
