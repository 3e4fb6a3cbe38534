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

  test("redact_pii / repetition_ratio / md5_fingerprint are SQL-callable") {
    val df = Seq(
      ("a", "email me at x@y.io from 10.0.0.1"),
      ("b", "go go go go go go")).toDF("id", "text")
    df.createOrReplaceTempView("ext_pii")
    val rows = spark.sql(
      """SELECT id, redact_pii(text) AS clean,
                repetition_ratio(text, 2) AS rep,
                md5_fingerprint(text) AS fp
         FROM ext_pii ORDER BY id""").collect()
    assert(rows(0).getString(1) == "email me at <EMAIL> from <IP>")
    assert(rows(1).getDouble(2) == 0.8) // 5 bigrams, 1 distinct → 1 - 1/5
    // SQL output equals the Column API's
    val viaCol = df.orderBy("id")
      .select(graft.operators.TextAnalysis.md5Fingerprint(col("text")))
      .collect().map(_.getString(0))
    assert(rows.map(_.getString(3)).toSeq == viaCol.toSeq)
  }

  test("html_text / html_title / luhn_valid / redact_cards / encoding_noise are SQL-callable") {
    val page = "<html><head><title>The Page</title></head><body>" +
      "<nav><a href='/'>Home row of navigation links</a></nav>" +
      "<p>prose paragraph long enough to survive the boilerplate gate, " +
      "pay 4111111111111111 please</p></body></html>"
    val df = Seq(("a", page), ("b", "caf\u00C3\u00A9 " * 20)).toDF("id", "text")
    df.createOrReplaceTempView("ext_crawl")
    val rows = spark.sql(
      """SELECT id, html_title(text) AS title,
                redact_cards(html_text(text)) AS body,
                luhn_valid('4111111111111111') AS ok,
                luhn_valid('4111111111111112') AS bad,
                encoding_noise(text) AS noise
         FROM ext_crawl ORDER BY id""").collect()
    assert(rows(0).getString(1) == "The Page")
    assert(rows(0).getString(2).contains("pay <CARD> please"))
    assert(!rows(0).getString(2).contains("Home row"))
    assert(rows(0).getBoolean(3) && !rows(0).getBoolean(4))
    assert(rows(0).getDouble(5) == 0.0 && rows(1).getDouble(5) > 0.0)
  }

  test("simhash_md5 is SQL-callable and matches the Column API") {
    val df = Seq((1L, "alpha beta gamma"), (2L, "")).toDF("id", "text")
    df.createOrReplaceTempView("ext_shm")
    val viaSql = spark.sql(
      "SELECT simhash_md5(text) AS fp FROM ext_shm ORDER BY id")
      .collect().map(_.getSeq[Long](0))
    val viaCol = df.orderBy("id")
      .select(graft.operators.Dedup.simHashMd5(col("text")))
      .collect().map(_.getSeq[Long](0))
    assert(viaSql.toSeq == viaCol.toSeq)
    assert(viaSql(1) == Seq(0L, 0L)) // empty text → zero fingerprint
  }

  test("frequent_items is SQL-callable; sketch keeps the hot item with a sane weight") {
    val df = (Seq.fill(500)("hot") ++ (1 to 400).map(i => s"t$i")).toDF("item")
    df.createOrReplaceTempView("ext_fi")
    val sk = spark.sql("SELECT frequent_items(item, 20) AS m FROM ext_fi")
      .head().getMap[String, Long](0)
    assert(sk.contains("hot"), "hot item must survive the sketch")
    assert(sk("hot") <= 500, "Misra-Gries never overestimates")
    assert(sk.size <= 20)
  }

  test("bottom_k is SQL-callable and matches the Column API") {
    import graft.functions.BottomKSketch
    val df = (1L to 200L).toDF("v")
    df.createOrReplaceTempView("ext_bk")
    val viaSql = spark.sql("SELECT bottom_k(v, 16) AS s FROM ext_bk").head().getSeq[Long](0)
    val viaCol = df.agg(BottomKSketch.sketch(col("v"), 16).as("s")).head().getSeq[Long](0)
    assert(viaSql == viaCol)
    assert(viaSql.length == 16)
  }

  test("bottom_k property: partitioning/order-invariant, merge-correct in GROUP BY") {
    import graft.functions.BottomKSketch
    // property sweep over group sizes spanning the exact (<k) and
    // estimating (>k) regimes, each value duplicated to pin distinctness
    val rows = for {
      g <- 1 to 10
      v <- 1 to g * 37
      _ <- 1 to 2 // duplicates must not affect the sketch
    } yield (g, v.toLong * 1001 + g)
    val df = rows.toDF("g", "v")
    df.createOrReplaceTempView("ext_bk_groups")
    df.repartition(17, col("v")).createOrReplaceTempView("ext_bk_shuffled")

    val a = spark.sql(
      "SELECT g, bottom_k(v, 32) AS s FROM ext_bk_groups GROUP BY g ORDER BY g")
      .collect().map(r => r.getInt(0) -> r.getSeq[Long](1))
    val b = spark.sql(
      "SELECT g, bottom_k(v, 32) AS s FROM ext_bk_shuffled GROUP BY g ORDER BY g")
      .collect().map(r => r.getInt(0) -> r.getSeq[Long](1))
    assert(a.toSeq == b.toSeq, "sketch must not depend on partitioning or merge order")

    a.foreach { case (g, sketch) =>
      val trueDistinct = g * 37
      val est = BottomKSketch.estimateDistinct(sketch.toArray, 32)
      if (trueDistinct < 32) assert(est == trueDistinct.toDouble, s"exact below k (g=$g)")
      else assert(math.abs(est - trueDistinct) / trueDistinct < 0.45,
        s"estimate $est vs $trueDistinct at g=$g")
    }
  }
}
