package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BpeSpec extends SparkSpec {

  import spark.implicits._

  // the worked example of Sennrich et al. 2016 §3.2:
  // vocabulary {low:5, lower:2, newest:6, widest:3}
  private def paperCorpus = Seq(
    (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")
  ).toDF("text")

  test("train reproduces the paper's merge sequence with deterministic tie-breaks") {
    val merges = Bpe.train(paperCorpus, "text", numMerges = 6)
    // counts round 1: (e,s)=(s,t)=(t,</w>)=9 tie → lexicographic (e,s);
    // then est builds outward, then the 7-count tie (l,o)/(o,w) → (l,o)
    assert(merges == Seq(
      ("e", "s"), ("es", "t"), ("est", "</w>"),
      ("l", "o"), ("lo", "w"), ("e", "w")))
  }

  test("training twice is bit-identical; trainDf ranks in merge order") {
    val a = Bpe.train(paperCorpus, "text", numMerges = 6)
    val b = Bpe.train(paperCorpus, "text", numMerges = 6)
    assert(a == b)
    val df = Bpe.trainDf(paperCorpus, "text", numMerges = 3).orderBy("rank")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3)))
    assert(df.toSeq == Seq(
      (0, "e", "s", "es"), (1, "es", "t", "est"), (2, "est", "</w>", "est</w>")))
  }

  test("encode applies merges by priority; unseen words fall back to characters") {
    val merges = Bpe.train(paperCorpus, "text", numMerges = 6)
    val enc = Bpe.encodeUdf(merges)
    val out = Seq(("lowest newest", 1)).toDF("text", "i")
      .select(enc(col("text")).as("toks"))
      .head().getSeq[String](0)
    // lowest: es→est→est</w> then lo→low ⇒ [low, est</w>]
    // newest: shares est</w>, then (e,w) ⇒ [n, ew, est</w>]
    assert(out == Seq("low", "est</w>", "n", "ew", "est</w>"))
    val unseen = Seq(("zq", 1)).toDF("text", "i")
      .select(enc(col("text")).as("toks")).head().getSeq[String](0)
    assert(unseen == Seq("z", "q", "</w>"))
  }

  test("native encode expression is value-identical to the UDF over the corpus") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val merges = Bpe.train(docs, "text", numMerges = 40)
    val udfEnc = Bpe.encodeUdf(merges)
    val natEnc = Bpe.encodeNative(spark, merges)
    val mism = docs
      .select(col("doc_id"), udfEnc(col("text")).as("u"), natEnc(col("text")).as("n"))
      .filter(col("u") =!= col("n"))
      .count()
    assert(mism == 0L, "every document must encode identically in both paths")
    // null + empty + unseen-word edges agree too
    val edges = Seq((1, null.asInstanceOf[String]), (2, ""), (3, "  "), (4, "zq lowest"))
      .toDF("i", "text")
    val got = edges
      .select(col("i"), udfEnc(col("text")).as("u"), natEnc(col("text")).as("n"))
      .collect()
    got.foreach(r => assert(r.getSeq[String](1) == r.getSeq[String](2), s"row $r"))
  }

  test("minPairCount stops before rare merges; maxTypes caps driver state deterministically") {
    // every pair occurs once → nothing reaches minPairCount=2
    val rare = Seq(("ab cd", 1)).toDF("text", "i")
    assert(Bpe.train(rare, "text", numMerges = 5).isEmpty)
    // maxTypes=2 keeps the two most frequent types (newest:6, low:5);
    // every newest-pair now ties at 6, so lexicographic order drives the
    // whole sequence: (e,s), then (e,w) (since "e" < "es"), then (es,t),
    // then (est,</w>) — different from the full-corpus sequence, which
    // is exactly the point: the cap changes counts deterministically
    val merges = Bpe.train(paperCorpus, "text", numMerges = 4, maxTypes = 2)
    assert(merges == Seq(("e", "s"), ("e", "w"), ("es", "t"), ("est", "</w>")))
  }

  test("empty corpus trains an empty merge table; encoding with it is pure chars") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Bpe.train(empty, "text", numMerges = 5).isEmpty)
    assert(Bpe.trainDf(empty, "text", numMerges = 5).count() == 0)
  }

  test("decode inverts encode: round trip = tokenizer-normalized text (paper + corpus)") {
    val merges = Bpe.train(paperCorpus, "text", numMerges = 6)
    val enc = Bpe.encodeNative(spark, merges)
    // the paper fixture plus unseen words, mixed case, ragged whitespace
    val docs = Seq(
      (1L, "low lower newest widest"),
      (2L, "  Lowest   NEWEST\tunseen  "),
      (3L, "zebra"),
      (4L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = docs.select(col("doc_id"),
        Bpe.decode(enc(col("text"))).as("rt"),
        array_join(TextAnalysis.tokens(lower(col("text"))), " ").as("norm"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    out.foreach { case (id, rt, norm) =>
      if (id == 4L) assert(rt == "", "null text round-trips to empty")
      else assert(rt == norm, s"doc $id: '$rt' != '$norm'")
    }
    // corpus-scale round trip on real documents
    val corpus = spark.read.parquet(s"$sf/documents.parquet").limit(200)
    val mism = corpus.select(
        Bpe.decode(enc(col("text"))).as("rt"),
        array_join(TextAnalysis.tokens(lower(col("text"))), " ").as("norm"))
      .filter(col("rt") =!= col("norm")).count()
    assert(mism == 0, s"$mism corpus docs failed the decode round trip")
  }

  test("id round trip: encodeToIds -> decodeIds = decode(encode); OOV is explicit -1") {
    val merges = Bpe.train(paperCorpus, "text", numMerges = 6)
    val vocab = Bpe.vocabFromCorpus(paperCorpus, "text", merges)
    // vocabulary is deterministic and lexicographically id'd
    assert(vocab.map(_._1) == vocab.map(_._1).sorted)
    assert(vocab.map(_._2) == vocab.indices.toSeq)
    val encIds = Bpe.encodeToIds(spark, merges, vocab)
    val decIds = Bpe.decodeIds(vocab)
    val docs = Seq((1L, "low lower newest widest"), (2L, "lowest newest")).toDF("doc_id", "text")
    val rt = docs.select(col("doc_id"), decIds(encIds(col("text"))).as("rt"),
        array_join(TextAnalysis.tokens(lower(col("text"))), " ").as("norm"))
      .collect()
    rt.foreach(r => assert(r.getString(1) == r.getString(2)))
    // a symbol outside the training alphabet ids as -1 and drops on decode
    val oov = Seq((1L, "zq")).toDF("doc_id", "text")
      .select(encIds(col("text")).as("ids"), decIds(encIds(col("text"))).as("rt"))
      .head()
    assert(oov.getSeq[Int](0).contains(-1), "unseen chars must id as -1")
  }

  test("bpe_encode_ids / bpe_decode round-trip on the SQL surface via one registration") {
    val merges = Bpe.train(paperCorpus, "text", numMerges = 6)
    val vocab = Bpe.vocabFromCorpus(paperCorpus, "text", merges)
    Bpe.registerIdsSql(spark, "bpespec_rt", merges, vocab)
    try {
      Seq((1L, "low lower newest widest"), (2L, "newest low"))
        .toDF("doc_id", "text").createOrReplaceTempView("bpe_rt_docs")
      val rows = spark.sql(
        """SELECT doc_id,
                  bpe_decode(bpe_encode_ids(text, 'bpespec_rt'), 'bpespec_rt') AS rt,
                  text
           FROM bpe_rt_docs ORDER BY doc_id""").collect()
      rows.foreach(r => assert(r.getString(1) == r.getString(2)))
      // same name still serves the subword encoder (multi-kind registry)
      val sub = spark.sql(
        "SELECT bpe_encode(text, 'bpespec_rt') FROM bpe_rt_docs WHERE doc_id = 1")
        .head().getSeq[String](0)
      assert(sub.nonEmpty && sub.contains("low") && sub.contains("est</w>"))
    } finally graft.functions.GraftModels.drop("bpespec_rt")
  }
}
