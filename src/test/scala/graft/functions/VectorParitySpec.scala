package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins bit-identical parity between the native vector kernels and the
  * higher-order-function formulations — the oracle-checked similarity
  * queries (q84/q90) depend on exact value equality.
  */
class VectorParitySpec extends SparkSpec {

  lazy val emb = spark.read.parquet(s"$sf/embeddings.parquet")

  test("native cosine is bit-identical to the HOF formulation (incl. self-pairs)") {
    val pairs = emb.select(col("vec_id").as("ia"), col("embedding").as("va"))
      .crossJoin(emb.select(col("vec_id").as("ib"), col("embedding").as("vb")))
      .filter(col("ia") % 7 === 0 && col("ib") % 5 === 0)
    val mism = pairs.select(
      VectorFunctions.cosine(col("va"), col("vb")).as("nat"),
      VectorFunctions.cosineHof(col("va"), col("vb")).as("hof"))
      .filter(col("nat") =!= col("hof")).count()
    assert(mism == 0)
  }

  test("native cosine handles zero vectors as 0.0 (not NaN)") {
    import spark.implicits._
    val df = Seq((Array(0f, 0f, 0f), Array(1f, 2f, 3f))).toDF("a", "b")
    assert(df.select(VectorFunctions.cosine(col("a"), col("b"))).head.getDouble(0) == 0.0)
  }

  test("native l2Sq is bit-identical to the HOF formulation, incl. mixed float/double") {
    val planes = VectorFunctions.randomPlanes(64, 1, seed = 7L)
    val planeCol = array(planes.head.map(lit).toIndexedSeq: _*) // array<double>
    val mism = emb.select(
      VectorFunctions.l2Sq(col("embedding"), planeCol).as("nat"),
      VectorFunctions.l2SqHof(col("embedding"), planeCol).as("hof"))
      .filter(col("nat") =!= col("hof")).count()
    assert(mism == 0)
  }

  test("native hyperplane signature is bit-identical to the HOF formulation") {
    val planes = VectorFunctions.randomPlanes(64, 8)
    val mism = emb.select(
      VectorFunctions.hyperplaneSignature(col("embedding"), planes).as("nat"),
      VectorFunctions.hyperplaneSignatureHof(col("embedding"), planes).as("hof"))
      .filter(col("nat") =!= col("hof")).count()
    assert(mism == 0)
  }

  test("native hyperplane signature throws LOUDLY on a dimension mismatch") {
    // a silently truncated projection would bucket mismatched vectors
    // by a prefix — LSH recall degrades with no error anywhere (the
    // quantDot dim contract)
    val planes = VectorFunctions.randomPlanes(48, 8) // embeddings are 64-dim
    val e = intercept[Exception] {
      emb.select(VectorFunctions.hyperplaneSignature(col("embedding"), planes))
        .collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("hyperplane_sig")),
      s"expected the loud dim-mismatch error, got $e")
  }
}
