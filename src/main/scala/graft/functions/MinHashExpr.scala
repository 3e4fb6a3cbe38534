package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}

/** Primitive-loop MinHash kernel shared by the native Catalyst expression
  * (org.apache.spark.sql.graft.MinHashSignatureExpr — both interpreted
  * eval and generated code call into here) and by anything else needing
  * signatures outside a query plan.
  *
  * Semantics are IDENTICAL to the higher-order-function formulation in
  * Dedup.minHashSignature: same seeded (a,b) parameter family, same
  * (a·h + b) mod (2⁶¹−1) permutation with 64-bit wraparound multiply,
  * same null-for-empty contract. This is the same operator, compiled:
  * one tight loop over unboxed longs instead of k interpreted array
  * traversals with per-element boxing.
  */
object MinHash {
  val P: Long = 2305843009213693951L // 2^61 − 1, Mersenne prime

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Long), (Array[Long], Array[Long])]()

  /** Seeded permutation parameters; MUST draw in the same order as the
    * HOF formulation (a then b per permutation) for value parity.
    */
  def params(k: Int, seed: Long): (Array[Long], Array[Long]) =
    cache.computeIfAbsent((k, seed), { case (kk, s) =>
      val rng = new scala.util.Random(s)
      val as = new Array[Long](kk)
      val bs = new Array[Long](kk)
      var i = 0
      while (i < kk) {
        as(i) = math.abs(rng.nextLong()) % (P - 1) + 1
        bs(i) = math.abs(rng.nextLong()) % P
        i += 1
      }
      (as, bs)
    })

  /** k-minimum signature of the shingle-hash array; null for empty input
    * (a doc with fewer than w tokens has no shingles, hence no signature).
    */
  def signature(hashes: ArrayData, k: Int, seed: Long): ArrayData = {
    val n = hashes.numElements()
    if (n == 0) return null
    val (as, bs) = params(k, seed)
    val out = new Array[Long](k)
    var i = 0
    while (i < k) {
      val a = as(i)
      val b = bs(i)
      var m = Long.MaxValue
      var j = 0
      while (j < n) {
        var v = (a * hashes.getLong(j) + b) % P
        if (v < 0) v += P
        if (v < m) m = v
        j += 1
      }
      out(i) = m
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Column-level façade so operator code stays in the graft namespace. */
object MinHashSignatureExpr {
  def apply(shingles: Column, k: Int, seed: Long): Column =
    org.apache.spark.sql.graft.NativeExprs.minhashSignature(shingles, k, seed)
}
