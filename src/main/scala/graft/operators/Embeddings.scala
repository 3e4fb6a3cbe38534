package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{VectorMoments, VectorMomentsState}

/** Embedding-space analytics: exact one-pass moments, covariance,
  * principal components (power iteration), PCA projection and
  * per-group mean drift — the spectral-health toolkit for a 100 TB
  * embedding store (is the space collapsing to a few directions? did
  * yesterday's encoder push shift the mean? which axes carry the
  * variance?).
  *
  * Determinism contract (the property every other engine op shares):
  * all statistics derive from the QUANTIZED vectors q = floor(x·2^bits)
  * via exact integer sums ([[graft.functions.VectorMoments]]), so every
  * number here — covariance entries, eigenvectors, projections — is a
  * pure function of the input SET, independent of partitioning and merge
  * order, and bit-replayable by a SQL oracle (the power iteration runs
  * the same IEEE ops in the same order on both engines).
  *
  * Scale shape: ONE aggregation with a d(d+1)/2-long mergeable state is
  * the only shuffle; the eigensolve is a driver-side O(d²·iters) loop on
  * a 64×64 matrix (a planning step, like k-means centroid refinement);
  * projection and drift are map-only over broadcast component literals.
  *
  * EXTENSION (no reference counterpart — the reference has no vector
  * analytics).
  */
object Embeddings {

  /** One principal component: the unit direction, its Rayleigh-quotient
    * eigenvalue (covariance units, i.e. already scaled back from the
    * fixed-point grid), the projection offset dot(mu_q, v) in QUANTIZED
    * units, and the `bits` the offset was computed under — carried
    * INSIDE the component so [[projectDf]] cannot be handed a
    * mismatched quantization grid (an independent bits parameter would
    * silently shift and mis-scale every score).
    */
  final case class Component(
      vector: Array[Double], lambda: Double, offset: Double, bits: Int)

  /** The one-pass moments aggregate as a 1-row DataFrame (n, sums, gram).
    * `vecCol` may be array<float> or array<double> — floats widen
    * exactly.
    */
  def momentsDf(df: DataFrame, vecCol: String, dim: Int, bits: Int = 20): DataFrame =
    df.agg(VectorMoments.agg(col(vecCol).cast("array<double>"), dim, bits).as("m"))
      .select(col("m.n").as("n"), col("m.sums").as("sums"), col("m.gram").as("gram"))

  /** Driver-side moments (ONE bounded row — a planning aggregate, like
    * k-means centroid collection).
    */
  def moments(df: DataFrame, vecCol: String, dim: Int, bits: Int = 20): VectorMomentsState = {
    val r = momentsDf(df, vecCol, dim, bits).head()
    VectorMomentsState(r.getLong(0), r.getSeq[Long](1).toArray, r.getSeq[Long](2).toArray)
  }

  /** Covariance matrix of the quantized corpus, in ORIGINAL units
    * (scaled back by 2^-2bits). Op order is pinned — mirrored verbatim
    * by the SQL oracle and by [[covarianceDf]]:
    * cov(i)(j) = (G_ij/n − (S_i/n)·(S_j/n)) · 2^-2bits, each term an
    * exact-integer-to-double conversion followed by double ops.
    */
  def covariance(m: VectorMomentsState, dim: Int, bits: Int = 20): Array[Array[Double]] = {
    require(m.n > 0, "covariance of an empty corpus is undefined (n = 0)")
    val nd = m.n.toDouble
    val scale = (1L << bits).toDouble
    val inv = 1.0 / (scale * scale)
    val cov = Array.ofDim[Double](dim, dim)
    var i = 0
    while (i < dim) {
      var j = 0
      while (j < dim) {
        val lo = math.min(i, j); val hi = math.max(i, j)
        val g = m.gram(VectorMoments.triIndex(dim, lo, hi))
        cov(i)(j) = (g.toDouble / nd - (m.sums(i).toDouble / nd) * (m.sums(j).toDouble / nd)) * inv
        j += 1
      }
      i += 1
    }
    cov
  }

  /** Distributed covariance surface: (i, j, cov) for the upper triangle
    * (1-based, i ≤ j), derived from the 1-row moments frame with the
    * SAME pinned double ops as [[covariance]] — no driver collect.
    */
  def covarianceDf(df: DataFrame, vecCol: String, dim: Int, bits: Int = 20): DataFrame = {
    val scale = (1L << bits).toDouble
    val inv = 1.0 / (scale * scale)
    momentsDf(df, vecCol, dim, bits)
      .filter(col("n") > 0) // empty corpus: no covariance surface, not NaNs
      .select(col("n"), col("sums"), col("gram"),
        explode(sequence(lit(0), lit(dim - 1))).as("i0"))
      .select(col("n"), col("sums"), col("gram"), col("i0"),
        explode(sequence(col("i0"), lit(dim - 1))).as("j0"))
      .select(
        (col("i0") + 1).cast("int").as("i"),
        (col("j0") + 1).cast("int").as("j"),
        ((element_at(col("gram"),
            (col("i0") * dim - col("i0") * (col("i0") - 1) / 2 + (col("j0") - col("i0")) + 1)
              .cast("int")).cast("double") / col("n").cast("double")
          - (element_at(col("sums"), (col("i0") + 1).cast("int")).cast("double") / col("n").cast("double"))
            * (element_at(col("sums"), (col("j0") + 1).cast("int")).cast("double") / col("n").cast("double")))
          * lit(inv)).as("cov"))
  }

  private def matvec(c: Array[Array[Double]], v: Array[Double]): Array[Double] = {
    val d = v.length
    val out = new Array[Double](d)
    var i = 0
    while (i < d) {
      var s = 0.0
      var j = 0
      val row = c(i)
      while (j < d) { s += row(j) * v(j); j += 1 }
      out(i) = s
      i += 1
    }
    out
  }

  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  /** Fixed-iteration power iteration from the deterministic all-ones
    * start v0 = (1,…,1)/√d. No convergence test — a FIXED count keeps
    * the result a pure function of the matrix, replayable by the
    * oracle's recursive CTE. Returns (unit vector, Rayleigh λ).
    */
  def powerIteration(c: Array[Array[Double]], iters: Int = 40): (Array[Double], Double) = {
    val d = c.length
    var v = Array.fill(d)(1.0 / math.sqrt(d.toDouble))
    var t = 0
    while (t < iters) {
      val w = matvec(c, v)
      val nrm = math.sqrt(dot(w, w))
      v = w.map(_ / nrm)
      t += 1
    }
    (v, dot(v, matvec(c, v)))
  }

  /** Top-k principal components via power iteration + deflation
    * (C ← C − λ v vᵀ after each extraction). Includes each component's
    * projection offset dot(mu_q, v) in quantized units.
    */
  def principalComponents(
      m: VectorMomentsState,
      dim: Int,
      k: Int,
      bits: Int = 20,
      iters: Int = 40): Seq[Component] = {
    val nd = m.n.toDouble
    val muQ = m.sums.map(_.toDouble / nd)
    var c = covariance(m, dim, bits)
    (0 until k).map { _ =>
      val (v, lam) = powerIteration(c, iters)
      c = Array.tabulate(dim, dim)((i, j) => c(i)(j) - lam * v(i) * v(j))
      Component(v, lam, dot(muQ, v), bits)
    }
  }

  /** Map-only mean-centered projection onto `comps`: for component c,
    * score = (Σ floor(x_i·2^bits)·v_i − offset_c) · 2^-bits — one fused
    * native kernel call per (row, component), components broadcast as
    * literals. Output: idCol, pc1_score … pck_score.
    */
  def projectDf(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      comps: Seq[Component]): DataFrame = {
    require(comps.nonEmpty, "projectDf needs at least one component")
    // the quantization grid rides inside each Component (set by
    // principalComponents) — mixed grids in one projection call are a
    // caller bug, failed loudly here
    require(comps.map(_.bits).distinct.size == 1,
      s"projectDf: components carry mixed bits ${comps.map(_.bits).distinct}")
    val scale = (1L << comps.head.bits).toDouble
    val invScale = 1.0 / scale
    val vec = col(vecCol)
    val scores = comps.zipWithIndex.map { case (c, k) =>
      ((org.apache.spark.sql.graft.NativeExprs.quantDot(
          vec, c.vector, scale) - lit(c.offset)) * lit(invScale))
        .as(s"pc${k + 1}_score")
    }
    df.select(col(idCol) +: scores: _*)
  }

  /** One-row embedding-space ISOTROPY report: is the space collapsing
    * into a few directions? Surfaces n, dim, total variance (trace of
    * the covariance), the top-2 eigenvalues and their variance shares —
    * an isotropic space has share ≈ 1/d; a collapsed one puts most of
    * the trace on PC1 (anisotropy degrades cosine-based retrieval, the
    * classic embedding post-processing finding).
    *
    * Determinism: the trace is computed from EXACT integers first —
    * Σ_i (n·G_ii − S_i²) in BigInt, one double conversion at the end —
    * so no float-summation order exists to disagree on; eigenvalues
    * come from the fixed-iteration power iteration. Cost: the one
    * moments pass (the d(d+1)/2-state aggregate) + a driver-side O(d²)
    * planning loop; the report row is built locally.
    */
  def isotropyReport(
      df: DataFrame,
      vecCol: String,
      dim: Int,
      bits: Int = 20,
      iters: Int = 40): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val m = moments(df, vecCol, dim, bits)
    val scale = (1L << bits).toDouble
    val inv = 1.0 / (scale * scale)
    val traceNum = (0 until dim).map { i =>
      BigInt(m.n) * BigInt(m.gram(VectorMoments.triIndex(dim, i, i))) -
        BigInt(m.sums(i)) * BigInt(m.sums(i))
    }.sum
    val trace = (traceNum.toDouble / (m.n.toDouble * m.n.toDouble)) * inv
    val comps = principalComponents(m, dim, k = 2, bits, iters)
    val l1 = comps.head.lambda
    val l2 = comps(1).lambda
    Seq((m.n, dim, trace, l1, l2, l1 / trace, l2 / trace))
      .toDF("n", "dim", "trace", "lambda1", "lambda2", "pc1_share", "pc2_share")
  }

  /** Per-group per-dimension quantized means — the drift surface
    * between corpus slices (encoder versions, sources, time windows).
    * Output: (groupCol, i (1-based), mean). mean op order pinned:
    * (S_i/n) · 2^-bits.
    */
  def groupMeans(
      df: DataFrame,
      groupCol: String,
      vecCol: String,
      dim: Int,
      bits: Int = 20): DataFrame = {
    val invScale = 1.0 / (1L << bits).toDouble
    // sums-only kernel: the drift surface needs just the d-long sums,
    // so the grouped aggregate must not pay the d(d+1)/2 Gram it would
    // discard (~30× the per-row hot-path cost at d=64, 17 KB → 0.5 KB
    // of state per group)
    df.groupBy(col(groupCol))
      .agg(VectorMoments.sumsAgg(col(vecCol).cast("array<double>"), dim, bits).as("m"))
      .select(col(groupCol), col("m.n").as("n"),
        posexplode(col("m.sums")).as(Seq("p", "s")))
      .select(col(groupCol), (col("p") + 1).cast("int").as("i"),
        ((col("s").cast("double") / col("n").cast("double")) * lit(invScale)).as("mean"))
  }
}
