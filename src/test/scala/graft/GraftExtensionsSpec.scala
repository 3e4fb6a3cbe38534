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

  test("winnow_md5 / band_hashes / gopher_signals are SQL-callable and match the Column API") {
    import org.apache.spark.sql.graft.NativeExprs
    val df = Seq(
      ("a", "the quick brown fox jumps over the lazy dog again and again"),
      ("b", "short")).toDF("id", "text")
    df.createOrReplaceTempView("ext_kernels")
    val viaSql = spark.sql(
      """SELECT id, winnow_md5(text, 5, 4) AS fps,
                band_hashes(minhash_signature(shingle_hashes(text, 2), 16, 7), 4) AS bh,
                gopher_signals(text).word_count AS wc,
                gopher_signals(text).alpha_words AS aw
         FROM ext_kernels ORDER BY id""").collect()
    val viaCol = df.orderBy("id").select(
      NativeExprs.winnowMd5(col("text"), 5, 4),
      NativeExprs.bandHashes(
        NativeExprs.minhashSignature(NativeExprs.shingleHashes(col("text"), 2), 16, 7L), 4),
      NativeExprs.gopherSignals(col("text"))).collect()
    viaSql.zip(viaCol).foreach { case (s, c) =>
      assert(s.getSeq[String](1) == c.getSeq[String](0))
      assert(s.getSeq[Long](2) == c.getSeq[Long](1))
      val g = c.getStruct(2)
      def num(r: org.apache.spark.sql.Row, i: Int): Long =
        r.get(i).asInstanceOf[Number].longValue
      assert(num(s, 3) == num(g, g.fieldIndex("word_count")))
      assert(num(s, 4) == num(g, g.fieldIndex("alpha_words")))
    }
    assert(viaSql(0).getSeq[String](1).nonEmpty)
  }

  test("phash is SQL-callable; NULL for undecodable bytes; matches the codec") {
    import graft.multimodal.Multimodal
    val png = Multimodal.ImageCodec.makeStructuredPng(11L)
    val df = Seq((1L, png), (2L, "not an image".getBytes("UTF-8"))).toDF("id", "content")
    df.createOrReplaceTempView("ext_img")
    val rows = spark.sql("SELECT id, phash(content) AS h FROM ext_img ORDER BY id").collect()
    assert(rows(0).getLong(1) == Multimodal.ImageCodec.pHash(png).get)
    assert(rows(1).isNullAt(1))
  }

  test("hyperplane_sig SQL matches VectorFunctions.hyperplaneSignature") {
    import graft.functions.VectorFunctions
    val df = Seq((1L, Array(0.5f, -1f, 2f, 0f)), (2L, Array(-3f, 1f, 0f, 4f)))
      .toDF("id", "v")
    df.createOrReplaceTempView("ext_hp")
    val viaSql = spark.sql(
      "SELECT hyperplane_sig(v, 4, 8, 42) AS s FROM ext_hp ORDER BY id")
      .collect().map(_.getLong(0))
    val planes = VectorFunctions.randomPlanes(4, 8, 42L)
    val viaCol = df.orderBy("id")
      .select(VectorFunctions.hyperplaneSignature(col("v"), planes))
      .collect().map(_.getLong(0))
    assert(viaSql.toSeq == viaCol.toSeq)
  }

  test("top_k_by_score and bloom_sketch aggregates are SQL-callable") {
    import graft.functions.BloomSketch
    val df = (1L to 100L).map(i => (i % 4, i, (i * 37 % 100).toDouble)).toDF("g", "id", "score")
    df.createOrReplaceTempView("ext_topk")
    val rows = spark.sql(
      """SELECT g, top_k_by_score(id, score, 3) AS top FROM ext_topk GROUP BY g ORDER BY g""")
      .collect()
    rows.foreach { r =>
      val top = r.getSeq[org.apache.spark.sql.Row](1)
      assert(top.length == 3)
      val scores = top.map(_.getDouble(1))
      assert(scores == scores.sorted.reverse, "ordered by score desc")
    }
    // top of group equals the window formulation's argmax
    val expectTop = df.groupBy("g").agg(max(struct(col("score"), col("id"))).as("m"))
      .select(col("g"), col("m.id")).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      assert(r.getSeq[org.apache.spark.sql.Row](1).head.getLong(0) == expectTop(r.getLong(0)))
    }

    val names = Seq("alpha", "beta", "gamma", "delta").toDF("name")
    names.createOrReplaceTempView("ext_bloom")
    val bits = spark.sql("SELECT bloom_sketch(name, 256) AS b FROM ext_bloom")
      .head().getSeq[Long](0).toArray
    assert(Seq("alpha", "beta", "gamma", "delta").forall(BloomSketch.mightContain(bits, _)))
    // negative membership: with 4 keys in 256 bits the per-probe fp rate
    // is tiny; over 20 absent probes allow at most 2 false positives so
    // the assertion actually exercises the filter (a broken sketch that
    // answers true for everything fails here).
    val absentHits = (1 to 20).count(i => BloomSketch.mightContain(bits, s"absent_$i"))
    assert(absentHits <= 2, s"bloom answered true for $absentHits/20 absent keys")
  }

  test("unicode_normalize: NFC composes, NFKC folds compatibility, SQL matches Column API") {
    import org.apache.spark.sql.graft.NativeExprs
    val decomposed = "cafe\u0301 man\u0303ana"   // combining acute + tilde
    val composed = "caf\u00E9 ma\u00F1ana"
    val ligature = "\uFB01ne o\uFB03ce"           // fi / ffi ligatures
    val df = Seq((1L, decomposed), (2L, ligature), (3L, "plain ascii")).toDF("id", "text")
    df.createOrReplaceTempView("ext_norm")
    val rows = spark.sql(
      """SELECT id, unicode_normalize(text) AS nfc,
                unicode_normalize(text, 'NFKC') AS nfkc
         FROM ext_norm ORDER BY id""").collect()
    assert(rows(0).getString(1) == composed, "NFC must compose")
    assert(rows(1).getString(1) == ligature, "NFC leaves compatibility chars alone")
    assert(rows(1).getString(2) == "fine office", "NFKC folds ligatures")
    assert(rows(2).getString(1) == "plain ascii")
    val viaCol = df.orderBy("id")
      .select(NativeExprs.unicodeNormalize(col("text"), "NFC")).collect().map(_.getString(0))
    assert(rows.map(_.getString(1)).toSeq == viaCol.toSeq)
    // NFC-then-fingerprint makes composed and decomposed hash-equal
    val pair = Seq(composed, decomposed).toDF("v")
    pair.createOrReplaceTempView("ext_norm2")
    val n = spark.sql(
      "SELECT count(DISTINCT md5_fingerprint(unicode_normalize(v))) AS n FROM ext_norm2")
      .head().getLong(0)
    assert(n == 1L, "composed and decomposed must fingerprint identically after NFC")
    assert(pair.select(countDistinct(graft.operators.TextAnalysis.md5Fingerprint(col("v"))))
      .head().getLong(0) == 2L, "without NFC they differ (the hazard the pass removes)")
    val bad = intercept[Exception] {
      spark.sql("SELECT unicode_normalize(text, 'NFX') FROM ext_norm").collect()
    }
    assert(bad.getMessage.contains("NFKC"))
  }

  test("named models: bpe_encode / nb_score / lm_score resolve registered closures") {
    import graft.operators.{Bpe, Classify, TextAnalysis}
    val docs = Seq(
      (1L, "low lower lowest low low", "a"),
      (2L, "new newer newest new new", "b"),
      (3L, "low new lower newer", "a")).toDF("doc_id", "text", "label")
    docs.createOrReplaceTempView("ext_models")

    val merges = Bpe.train(docs.toDF(), "text", 8)
    Bpe.registerSql(spark, "ext_bpe", merges)
    val nb = Classify.nbTrain(docs.toDF(), "label", "text", vocab = 64)
    Classify.registerSql("ext_nb", nb)
    val lm = TextAnalysis.charNgramModel(docs.toDF(), "text", 3)
    TextAnalysis.registerLmSql("ext_lm", lm, 3)

    val viaSql = spark.sql(
      """SELECT doc_id, bpe_encode(text, 'ext_bpe') AS toks,
                nb_score(text, 'ext_nb').pred AS pred,
                lm_score(text, 'ext_lm') AS lp
         FROM ext_models ORDER BY doc_id""").collect()
    val bpeCol = Bpe.encodeNative(spark, merges)
    val nbCol = Classify.nbScorer(nb)
    val lmCol = TextAnalysis.lmScorer(lm, 3)
    val viaCol = docs.orderBy("doc_id").select(
      bpeCol(col("text")), nbCol(col("text")).getField("pred"), lmCol(col("text"))).collect()
    viaSql.zip(viaCol).foreach { case (s, c) =>
      assert(s.getSeq[String](1) == c.getSeq[String](0))
      assert(s.getString(2) == c.getString(1))
      assert(s.getDouble(3) == c.getDouble(2))
    }
    assert(viaSql(0).getSeq[String](1).nonEmpty)
  }

  test("named models: unregistered name and wrong kind fail with a helpful error") {
    Seq("x").toDF("text").createOrReplaceTempView("ext_badmodel")
    val missing = intercept[Exception] {
      spark.sql("SELECT bpe_encode(text, 'no_such_model') FROM ext_badmodel").collect()
    }
    assert(missing.getMessage.contains("no registered graft model"))
    graft.functions.GraftModels.register("ext_kindcheck", "bpe", identity[org.apache.spark.sql.Column])
    val wrongKind = intercept[Exception] {
      spark.sql("SELECT nb_score(text, 'ext_kindcheck') FROM ext_badmodel").collect()
    }
    assert(wrongKind.getMessage.contains("kind"))
    graft.functions.GraftModels.drop("ext_kindcheck")
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
