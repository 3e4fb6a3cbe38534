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

  /** planes is a dense row-major (count × dim) matrix. */
  def hyperplaneSig(v: ArrayData, planes: Array[Double], count: Int, vF: Boolean): Long = {
    val dim = planes.length / count
    val n = math.min(v.numElements(), dim)
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
