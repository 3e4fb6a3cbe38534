package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns, built from Spark's
  * higher-order functions (`zip_with`, `aggregate`, `transform`) — no UDFs,
  * so Catalyst can still prune/push around them and everything runs on the
  * JVM with primitive arrays.
  *
  * Accumulation is in double regardless of element type (float inputs) to
  * keep dot products stable at dim≈10³.
  */
object VectorFunctions {

  /** Σ aᵢ·bᵢ accumulated in double. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, x) => acc + x)

  /** ‖a‖₂ */
  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** cosine(a, b) = a·b / (‖a‖‖b‖); 0.0 when either norm is 0.
    * Native fused kernel (CosineSimExpr); bit-identical to [[cosineHof]].
    */
  def cosine(a: Column, b: Column): Column = VectorExprs.cosine(a, b)

  /** Reference HOF formulation of [[cosine]] — the semantic spec. */
  def cosineHof(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val n = l2Norm(a) * l2Norm(b)
    when(n === 0.0, lit(0.0)).otherwise(d / n)
  }

  /** Squared euclidean distance Σ (aᵢ−bᵢ)².
    * Native fused kernel (L2SqExpr); bit-identical to [[l2SqHof]].
    */
  def l2Sq(a: Column, b: Column): Column = VectorExprs.l2Sq(a, b)

  /** Reference HOF formulation of [[l2Sq]] — the semantic spec. */
  def l2SqHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => {
        val diff = x.cast("double") - y.cast("double")
        diff * diff
      }),
      lit(0.0),
      (acc, x) => acc + x)

  /** Unit-normalize an array<float|double> → array<double>; zero vector
    * passes through unchanged (avoids NaN).
    */
  def normalize(a: Column): Column = {
    val n = l2Norm(a)
    when(n === 0.0, transform(a, x => x.cast("double")))
      .otherwise(transform(a, x => x.cast("double") / n))
  }

  /** Random-hyperplane signature (sign bits packed into a long) for cosine
    * LSH. `planes` are fixed per engine instance (seeded) so signatures are
    * deterministic and computable independently on every executor —
    * broadcast-free because the plane matrix rides inside the expression.
    *
    * bit i = 1 iff  v · planeᵢ ≥ 0. Native fused kernel
    * (HyperplaneSigExpr); bit-identical to [[hyperplaneSignatureHof]].
    */
  def hyperplaneSignature(v: Column, planes: Seq[Array[Double]]): Column =
    VectorExprs.hyperplaneSignature(v, planes)

  /** Reference HOF formulation of [[hyperplaneSignature]] — the spec. */
  def hyperplaneSignatureHof(v: Column, planes: Seq[Array[Double]]): Column = {
    require(planes.nonEmpty && planes.size <= 63, "1..63 hyperplanes")
    planes.zipWithIndex
      .map { case (p, i) =>
        val plane = array(p.map(lit).toIndexedSeq: _*)
        when(dot(v, plane) >= 0.0, lit(1L << i)).otherwise(lit(0L))
      }
      .reduce(_ + _)
  }

  /** Deterministic unit hyperplanes (xorshift-seeded), dim × count. */
  def randomPlanes(dim: Int, count: Int, seed: Long = 42L): Seq[Array[Double]] = {
    val rng = new scala.util.Random(seed)
    Seq.fill(count) {
      val p = Array.fill(dim)(rng.nextGaussian())
      val n = math.sqrt(p.map(x => x * x).sum)
      p.map(_ / n)
    }
  }
}
