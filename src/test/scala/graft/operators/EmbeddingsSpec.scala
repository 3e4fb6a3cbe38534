package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.VectorMoments

class EmbeddingsSpec extends SparkSpec {

  lazy val emb = spark.read.parquet(s"$sf/embeddings.parquet")
  private val Dim = 64

  /** Driver-side brute-force twin of the moments aggregate. */
  private def bruteMoments(bits: Int): (Long, Array[Long], Array[Long]) = {
    val scale = (1L << bits).toDouble
    val rows = emb.select("embedding").collect()
      .map(_.getSeq[Float](0).map(x => math.floor(x.toDouble * scale).toLong).toArray)
    val sums = new Array[Long](Dim)
    val gram = new Array[Long](Dim * (Dim + 1) / 2)
    rows.foreach { q =>
      var i = 0
      while (i < Dim) {
        sums(i) += q(i)
        var j = i
        while (j < Dim) {
          gram(VectorMoments.triIndex(Dim, i, j)) += q(i) * q(j); j += 1
        }
        i += 1
      }
    }
    (rows.length.toLong, sums, gram)
  }

  test("moments match the brute-force twin exactly") {
    val m = Embeddings.moments(emb, "embedding", Dim)
    val (n, sums, gram) = bruteMoments(20)
    assert(m.n == n)
    assert(m.sums.sameElements(sums))
    assert(m.gram.sameElements(gram))
  }

  test("moments are partitioning-invariant (exact integer merge)") {
    val a = Embeddings.moments(emb.repartition(7), "embedding", Dim)
    val b = Embeddings.moments(emb.coalesce(1), "embedding", Dim)
    assert(a.n == b.n)
    assert(a.sums.sameElements(b.sums))
    assert(a.gram.sameElements(b.gram))
  }

  test("covariance is symmetric with non-negative diagonal") {
    val m = Embeddings.moments(emb, "embedding", Dim)
    val c = Embeddings.covariance(m, Dim)
    for (i <- 0 until Dim; j <- 0 until Dim) {
      assert(c(i)(j) == c(j)(i), s"asymmetric at ($i,$j)")
    }
    for (i <- 0 until Dim) assert(c(i)(i) >= 0.0, s"negative variance at $i")
  }

  test("covarianceDf equals the driver-side covariance bit-for-bit") {
    val m = Embeddings.moments(emb, "embedding", Dim)
    val c = Embeddings.covariance(m, Dim)
    val rows = Embeddings.covarianceDf(emb, "embedding", Dim).collect()
    assert(rows.length == Dim * (Dim + 1) / 2)
    rows.foreach { r =>
      val (i, j, cov) = (r.getInt(0), r.getInt(1), r.getDouble(2))
      assert(cov == c(i - 1)(j - 1), s"covarianceDf mismatch at ($i,$j)")
    }
  }

  test("power iteration finds an eigenpair: C v = lambda v within tolerance") {
    val m = Embeddings.moments(emb, "embedding", Dim)
    val c = Embeddings.covariance(m, Dim)
    val comps = Embeddings.principalComponents(m, Dim, k = 2)
    val v1 = comps.head.vector
    // unit norm
    assert(math.abs(v1.map(x => x * x).sum - 1.0) < 1e-9)
    // residual ||Cv - lambda v|| small relative to lambda (the fixture's
    // spectrum is near-isotropic, so allow a loose residual — what we
    // require is a descending, consistent eigen-like pair, not textbook
    // convergence on a rank-1 fixture)
    val cv = (0 until Dim).map(i => (0 until Dim).map(j => c(i)(j) * v1(j)).sum)
    val res = math.sqrt((0 until Dim).map(i => math.pow(cv(i) - comps.head.lambda * v1(i), 2)).sum)
    assert(comps.head.lambda > 0.0)
    assert(res < comps.head.lambda, s"residual $res vs lambda ${comps.head.lambda}")
    // deflation: lambda2 <= lambda1 (within power-iteration slack)
    assert(comps(1).lambda <= comps.head.lambda * (1.0 + 1e-9))
  }

  test("power iteration nails a planted dominant direction") {
    import spark.implicits._
    // synthetic: strong variance along axis 3, tiny elsewhere
    val rnd = new scala.util.Random(42)
    val data = (0 until 200).map { i =>
      val v = Array.fill(8)((rnd.nextDouble() - 0.5) * 0.01f)
      v(3) = (if (i % 2 == 0) 1.0 else -1.0) * (0.5 + 0.1 * rnd.nextDouble())
      (i.toLong, v.map(_.toFloat))
    }.toDF("id", "vec")
    val m = Embeddings.moments(data, "vec", 8)
    val comps = Embeddings.principalComponents(m, 8, k = 1)
    val v = comps.head.vector
    assert(math.abs(v(3)) > 0.99, s"dominant axis not found: ${v.mkString(",")}")
  }

  test("projectDf matches a driver-side projection bit-for-bit") {
    val m = Embeddings.moments(emb, "embedding", Dim)
    val comps = Embeddings.principalComponents(m, Dim, k = 2)
    val scale = (1L << 20).toDouble
    val invScale = 1.0 / scale
    val got = Embeddings.projectDf(emb, "vec_id", "embedding", comps)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val want = emb.select("vec_id", "embedding").collect().map { r =>
      val q = r.getSeq[Float](1).map(x => math.floor(x.toDouble * scale)).toArray
      def proj(c: Embeddings.Component): Double = {
        var s = 0.0
        var i = 0
        while (i < Dim) { s += q(i) * c.vector(i); i += 1 }
        (s - c.offset) * invScale
      }
      r.getLong(0) -> (proj(comps.head), proj(comps(1)))
    }.toMap
    assert(got == want)
  }

  test("projected scores are mean-centered (exact-rational mean ~ 0)") {
    val m = Embeddings.moments(emb, "embedding", Dim)
    val comps = Embeddings.principalComponents(m, Dim, k = 1)
    val mean = Embeddings.projectDf(emb, "vec_id", "embedding", comps)
      .agg(avg("pc1_score")).head.getDouble(0)
    assert(math.abs(mean) < 1e-9, s"projection mean $mean")
  }

  test("groupMeans matches per-group brute force and covers all dims") {
    val withG = emb.withColumn("grp", pmod(col("vec_id"), lit(2)))
    val got = Embeddings.groupMeans(withG, "grp", "embedding", Dim)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(got.size == 2 * Dim)
    val scale = (1L << 20).toDouble
    val invScale = 1.0 / scale
    val byG = emb.withColumn("grp", pmod(col("vec_id"), lit(2)))
      .select("grp", "embedding").collect()
      .groupBy(_.getLong(0))
    byG.foreach { case (g, rows) =>
      val n = rows.length.toDouble
      (0 until Dim).foreach { i =>
        val s = rows.map(r => math.floor(r.getSeq[Float](1)(i).toDouble * scale).toLong).sum
        val want = (s.toDouble / n) * invScale
        assert(got((g, i + 1)) == want, s"groupMeans mismatch grp=$g dim=${i + 1}")
      }
    }
  }

  test("sums-only aggregate ≡ full moments on (n, sums); gram empty; state d+1 longs") {
    import graft.functions.VectorMoments
    // the round-12 groupMeans hot-path swap: identical n and sums,
    // no Gram computed or carried
    val full = emb.agg(VectorMoments.agg(
        col("embedding").cast("array<double>"), Dim).as("m"))
      .select("m.n", "m.sums", "m.gram").head()
    val sums = emb.agg(VectorMoments.sumsAgg(
        col("embedding").cast("array<double>"), Dim).as("m"))
      .select("m.n", "m.sums", "m.gram").head()
    assert(sums.getLong(0) == full.getLong(0))
    assert(sums.getSeq[Long](1) == full.getSeq[Long](1))
    assert(sums.getSeq[Long](2).isEmpty, "sums-only arm must carry an EMPTY gram")
    assert(full.getSeq[Long](2).nonEmpty)
  }

  test("isotropyReport: exact trace matches the covariance diagonal; shares ordered and bounded") {
    val r = Embeddings.isotropyReport(emb, "embedding", Dim).head()
    val (n, d, trace, l1, l2, s1, s2) = (r.getLong(0), r.getInt(1), r.getDouble(2),
      r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6))
    assert(n == emb.count() && d == Dim)
    val m = Embeddings.moments(emb, "embedding", Dim)
    val c = Embeddings.covariance(m, Dim)
    val diagSum = (0 until Dim).map(i => c(i)(i)).sum
    // the exact-integer trace and the per-entry-rounded diagonal sum
    // agree to double precision (different rounding paths)
    assert(math.abs(trace - diagSum) <= 1e-12 * math.abs(trace),
      s"trace $trace vs diag-sum $diagSum")
    assert(l1 > 0.0 && l2 > 0.0 && l1 >= l2 * (1.0 - 1e-9))
    assert(l1 <= trace && s1 == l1 / trace && s2 == l2 / trace)
    assert(s1 > 0.0 && s1 < 1.0 && s2 > 0.0 && s2 < 1.0)
  }

  test("moments rejects wrong-dimension vectors loudly") {
    import spark.implicits._
    val bad = Seq(Tuple1(Array(1.0f, 2.0f))).toDF("vec")
    val ex = intercept[Exception] {
      Embeddings.moments(bad, "vec", 8)
    }
    assert(ex.getMessage != null)
  }

  test("vec_moments and quant_dot are reachable from SQL") {
    emb.createOrReplaceTempView("emb_sql")
    val r = spark.sql(
      "SELECT vec_moments(cast(embedding as array<double>), 64, 20) AS m FROM emb_sql")
      .select(col("m.n")).head.getLong(0)
    assert(r == emb.count())
    val d = spark.sql(
      "SELECT quant_dot(embedding, array(" +
        (0 until Dim).map(i => if (i == 0) "1.0D" else "0.0D").mkString(",") +
        "), 1048576.0D) AS s FROM emb_sql WHERE vec_id = 0").head.getDouble(0)
    val first = emb.filter(col("vec_id") === 0).select("embedding").head.getSeq[Float](0)(0)
    assert(d == math.floor(first.toDouble * 1048576.0))
  }
}
