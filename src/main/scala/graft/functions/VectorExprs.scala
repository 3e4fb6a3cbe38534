package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.util.ArrayData

/** Primitive kernels for the native vector expressions
  * (org.apache.spark.sql.graft.{CosineSimExpr, L2SqExpr,
  * HyperplaneSigExpr}).
  *
  * Value parity with the HOF formulations in VectorFunctions: identical
  * accumulation order (left fold over elements) in double, identical
  * zero-norm and bit-set semantics — the IEEE ops run in the same
  * sequence, so results are bit-identical (pinned by VectorParitySpec).
  * Assumes non-null elements and equal lengths (embedding contract).
  */
object VectorKernels {

  @inline private def elem(a: ArrayData, i: Int, isFloat: Boolean): Double =
    if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)

  def cosine(a: ArrayData, b: ArrayData, aF: Boolean, bF: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dab = 0.0; var daa = 0.0; var dbb = 0.0
    var i = 0
    while (i < n) {
      val x = elem(a, i, aF); val y = elem(b, i, bF)
      dab += x * y; daa += x * x; dbb += y * y
      i += 1
    }
    val norm = math.sqrt(daa) * math.sqrt(dbb)
    if (norm == 0.0) 0.0 else dab / norm
  }

  def l2Sq(a: ArrayData, b: ArrayData, aF: Boolean, bF: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val d = elem(a, i, aF) - elem(b, i, bF)
      acc += d * d
      i += 1
    }
    acc
  }

  /** The `nprobe` nearest centroid cells of `v` by squared L2,
    * (distance, cell)-ordered — one kernel call per VECTOR instead of a
    * C-wide literal expression tree per row (the literal-array argmin
    * evaluated C l2Sq subtrees plus an array_min/array_position pass;
    * at the sf10 rehearsal's C=1562 that was 312M ArrayData evaluations
    * for one assignment pass). `cents` is dense row-major (c × dim).
    * Distances accumulate in the same per-element order as [[l2Sq]], so
    * cell choices are bit-identical to the literal formulation; ties
    * resolve to the lowest cell (strict-inequality insertion, cells
    * scanned in ascending order) — the same (d, cell) order the
    * struct-sort formulation pinned.
    */
  def nearestCells(v: ArrayData, cents: Array[Double], c: Int, nprobe: Int, vF: Boolean): ArrayData = {
    val dim = if (c == 0) 0 else cents.length / c
    val n = math.min(v.numElements(), dim)
    val k = math.min(nprobe, c)
    val bestD = new Array[Double](k)
    val bestC = new Array[Int](k)
    var filled = 0
    var cell = 0
    while (cell < c) {
      var acc = 0.0
      var i = 0
      val off = cell * dim
      while (i < n) { val d = elem(v, i, vF) - cents(off + i); acc += d * d; i += 1 }
      if (filled < k) {
        var j = filled
        while (j > 0 && bestD(j - 1) > acc) {
          bestD(j) = bestD(j - 1); bestC(j) = bestC(j - 1); j -= 1
        }
        bestD(j) = acc; bestC(j) = cell; filled += 1
      } else if (acc < bestD(k - 1)) {
        var j = k - 1
        while (j > 0 && bestD(j - 1) > acc) {
          bestD(j) = bestD(j - 1); bestC(j) = bestC(j - 1); j -= 1
        }
        bestD(j) = acc; bestC(j) = cell
      }
      cell += 1
    }
    ArrayData.toArrayData(java.util.Arrays.copyOf(bestC, filled))
  }

  /** Quantized dot product: Σ floor(x_i · scale) · c_i, one fused pass.
    * The floor-of-an-exact-product quantization is the engine's
    * cross-engine float-determinism device (graft.functions
    * .VectorMoments): floor(x·2^bits) is bit-identical in any IEEE
    * engine, and the remaining multiply-adds run in ascending index
    * order — the same sequence a SQL oracle's list_dot_product over the
    * pre-quantized list executes, so projections match bit-for-bit.
    */
  def quantDot(v: ArrayData, comp: Array[Double], scale: Double, vF: Boolean): Double = {
    val n = v.numElements()
    if (n != comp.length)
      throw new IllegalArgumentException(
        s"quant_dot: vector length $n != component length ${comp.length} — " +
          "a truncated projection would be silently wrong (the VectorMoments dim contract)")
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += math.floor(elem(v, i, vF) * scale) * comp(i)
      i += 1
    }
    acc
  }

  /** planes is a dense row-major (count × dim) matrix. Throws on a
    * vector/plane dimension mismatch — a silently truncated dot
    * product would bucket every mismatched vector by a projection of
    * its prefix (the [[quantDot]] contract; LSH recall would degrade
    * with no error anywhere).
    */
  def hyperplaneSig(v: ArrayData, planes: Array[Double], count: Int, vF: Boolean): Long = {
    val dim = planes.length / count
    val n = v.numElements()
    if (n != dim)
      throw new IllegalArgumentException(
        s"hyperplane_sig: vector length $n != plane dimension $dim — " +
          "a truncated projection would silently mis-bucket (the quantDot dim contract)")
    var sig = 0L
    var p = 0
    while (p < count) {
      var d = 0.0
      var i = 0
      val off = p * dim
      while (i < n) { d += elem(v, i, vF) * planes(off + i); i += 1 }
      if (d >= 0.0) sig |= (1L << p)
      p += 1
    }
    sig
  }
}

/** Column-level façades for the native vector expressions. */
object VectorExprs {
  def cosine(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.NativeExprs.cosineSim(a, b)
  def l2Sq(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.NativeExprs.l2Sq(a, b)
  def hyperplaneSignature(v: Column, planes: Seq[Array[Double]]): Column =
    org.apache.spark.sql.graft.NativeExprs.hyperplaneSig(v, planes)
}
