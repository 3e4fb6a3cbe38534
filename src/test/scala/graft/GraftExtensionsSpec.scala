package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, TextAnalysis}

class GraftExtensionsSpec extends SparkSpec {

  import spark.implicits._

  test("simhash is callable from SQL and matches the Column API") {
    val df = Seq(("a", "the quick brown fox"), ("b", "el que de la con")).toDF("id", "text")
    df.createOrReplaceTempView("ext_docs")
    val viaSql = spark.sql("SELECT id, simhash(text) AS fp FROM ext_docs ORDER BY id")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val viaCol = df.select(col("id"), Dedup.simHash(col("text")).as("fp")).orderBy("id")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(viaSql.toSeq == viaCol.toSeq)
  }

  test("shingle_hashes + minhash_signature compose in SQL") {
    val df = Seq("one two three four five six").toDF("text")
    df.createOrReplaceTempView("ext_docs2")
    val sig = spark.sql(
      "SELECT minhash_signature(shingle_hashes(text, 3), 128, 42) AS sig FROM ext_docs2")
      .head().getSeq[Long](0)
    val expect = df.select(
      Dedup.minHashSignature(Dedup.shingleHashes(col("text"), 3), 128, 42L).as("sig"))
      .head().getSeq[Long](0)
    assert(sig == expect)
    assert(sig.length == 128)
  }

  test("text_profile struct fields are SQL-accessible") {
    val df = Seq("the quick brown fox and the lazy dog").toDF("text")
    df.createOrReplaceTempView("ext_docs3")
    val r = spark.sql(
      """SELECT text_profile(text).lang_pred AS lang,
                text_profile(text).n_tokens AS n
         FROM ext_docs3""").head()
    assert(r.getString(0) == "en")
    assert(r.getInt(1) == 8)
  }

  test("cosine_sim and l2_sq are SQL-callable on array columns") {
    val df = Seq((Array(1f, 0f), Array(0f, 1f)), (Array(1f, 1f), Array(1f, 1f)))
      .toDF("a", "b")
    df.createOrReplaceTempView("ext_vecs")
    val rows = spark.sql(
      "SELECT round(cosine_sim(a, b), 6) AS c, round(l2_sq(a, b), 6) AS d FROM ext_vecs ORDER BY c")
      .collect().map(r => (r.getDouble(0), r.getDouble(1)))
    assert(rows.toSeq == Seq((0.0, 2.0), (1.0, 0.0)))
  }

  test("defaulted arguments work (shingle_hashes(text), minhash_signature(sh))") {
    val df = Seq("one two three four").toDF("text")
    df.createOrReplaceTempView("ext_docs4")
    val n = spark.sql(
      "SELECT size(minhash_signature(shingle_hashes(text))) AS k FROM ext_docs4")
      .head().getInt(0)
    assert(n == 128)
  }
}
