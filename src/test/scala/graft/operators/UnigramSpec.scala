package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.UnigramEncode

class UnigramSpec extends SparkSpec {

  import spark.implicits._

  // hand-checkable piece table: steep singles, attractive multi pieces,
  // one ENGINEERED exact tie ("join</w>" −4.0 vs "jo"+"in</w>" −2−2)
  private val pieces: Seq[(String, Double)] =
    "abdefghijklmnoprstuvwy".map(c => c.toString -> -8.0) ++ Seq(
      "</w>" -> -4.0,
      "table</w>" -> -3.5, "ta" -> -2.0, "ble</w>" -> -2.5,
      "jo" -> -2.0, "in</w>" -> -2.0, "join</w>" -> -4.0,
      "val" -> -2.0, "ue</w>" -> -2.0)

  private def model = UnigramEncode.model(pieces, Unigram.EndOfWord)

  test("viterbi picks the max-log-prob segmentation") {
    // table: direct −3.5 beats ta+ble</w> −4.5 and singles −44
    assert(UnigramEncode.segmentWord("table", model).toSeq == Seq("table</w>"))
    // value: val+ue</w> −4.0
    assert(UnigramEncode.segmentWord("value", model).toSeq == Seq("val", "ue</w>"))
  }

  test("exact score tie resolves to the earliest start (longest final piece)") {
    // join</w> (−4.0, start 0) ties jo+in</w> (−4.0, last start 2)
    assert(UnigramEncode.segmentWord("join", model).toSeq == Seq("join</w>"))
  }

  test("symbols outside the table surface as unk-priced single pieces") {
    // 'z' and 'q' are not in the table: each is its own piece at the
    // unk score; the word still segments (total coverage)
    assert(UnigramEncode.segmentWord("zq", model).toSeq ==
      Seq("z", "q", "</w>"))
    // and a better-known suffix still wins around the unk island:
    // "zjoin": z unk, then join</w>
    assert(UnigramEncode.segmentWord("zjoin", model).toSeq ==
      Seq("z", "join</w>"))
  }

  test("native encode flattens per-word viterbi pieces; decode round-trips") {
    val enc = Unigram.encodeNative(spark, pieces)
    val df = Seq((1L, "  Table   VALUE join  "), (2L, null.asInstanceOf[String]))
      .toDF("id", "text")
      .select(col("id"), enc(col("text")).as("toks"))
    val out = df.orderBy("id").collect()
    assert(out(0).getSeq[String](1) ==
      Seq("table</w>", "val", "ue</w>", "join</w>"))
    assert(out(1).getSeq[String](1) == Seq.empty)
    val rt = df.select(col("id"), Unigram.decode(col("toks")).as("rt"))
      .orderBy("id").collect()
    assert(rt(0).getString(1) == "table value join")
    assert(rt(1).getString(1) == "")
  }

  test("ids surface: encode_ids/decode_ids round-trip; unk pieces -> -1 and drop") {
    val vocab = Unigram.vocabOf(pieces)
    val ids = Unigram.encodeToIds(spark, pieces, vocab)
    val dec = Unigram.decodeIds(vocab)
    val df = Seq((1L, "value zq")).toDF("id", "text")
      .select(ids(col("text")).as("ids"))
    val got = df.head().getSeq[Int](0)
    // z and q are unk pieces (not table entries) → -1; the rest resolve
    assert(got.count(_ == -1) == 2)
    assert(got.count(_ >= 0) == 3) // val, ue</w>, </w>
    val rt = df.select(dec(col("ids")).as("rt")).head().getString(0)
    // unk ids drop: "zq" loses its two unk chars but keeps its marker
    assert(rt == "value")
  }

  test("train is deterministic and its model encodes with full coverage") {
    val corpus = Seq(
      (Seq.fill(8)("low") ++ Seq.fill(4)("lower") ++
        Seq.fill(9)("newest") ++ Seq.fill(5)("widest")).mkString(" ")
    ).toDF("text")
    val a = Unigram.train(corpus, "text", vocabSize = 20, maxPieceSyms = 4)
    val b = Unigram.train(corpus, "text", vocabSize = 20, maxPieceSyms = 4)
    assert(a == b)
    assert(a.size <= 20)
    // all single symbols survive pruning (the coverage floor)
    val singles = a.map(_._1).filter(p =>
      p == "</w>" || (p.length == 1 && !p.contains("</w>")))
    assert(("lownewidrst" ++ "e").map(_.toString).distinct
      .forall(c => singles.contains(c)))
    // the trained model round-trips its own corpus
    val enc = Unigram.encodeNative(spark, a)
    val rt = corpus.select(
      (Unigram.decode(enc(col("text"))) ===
        array_join(TextAnalysis.tokens(lower(col("text"))), " ")).as("ok"))
      .head().getBoolean(0)
    assert(rt)
  }

  test("unigram_encode / unigram_encode_ids / unigram_decode on the SQL surface") {
    Unigram.registerIdsSql(spark, "unispec_rt", pieces)
    Seq((1L, "table join value")).toDF("doc_id", "text")
      .createOrReplaceTempView("uni_rt_docs")
    val row = spark.sql(
      """SELECT unigram_encode(text, 'unispec_rt') AS toks,
                unigram_decode(unigram_encode_ids(text, 'unispec_rt'),
                               'unispec_rt') AS rt
         FROM uni_rt_docs""").head()
    assert(row.getSeq[String](0) ==
      Seq("table</w>", "join</w>", "val", "ue</w>"))
    assert(row.getString(1) == "table join value")
    // kind mismatch is loud at resolution time
    val e = intercept[Exception] {
      spark.sql("SELECT bpe_encode(text, 'unispec_rt') FROM uni_rt_docs").collect()
    }
    assert(e.getMessage.contains("kind"))
  }

  test("train: vocabSize below the single-symbol floor fails loudly, never hangs") {
    // corpus charset {a..j} + '</w>' = 11 singles; singles are never
    // pruned, so vocabSize=5 is unreachable — must throw, not spin
    val corpus = Seq(("abc def ghij" * 3)).toDF("text")
    val e = intercept[IllegalArgumentException] {
      Unigram.train(corpus, "text", vocabSize = 5)
    }
    assert(e.getMessage.contains("single-symbol floor"))
    assert(e.getMessage.contains("vocabSize"))
  }

  test("train segments a skewed corpus into reusable pieces (EM actually moves)") {
    // "est</w>" appears in 14/26 words; EM should keep it as one piece
    val corpus = Seq(
      (Seq.fill(8)("low") ++ Seq.fill(4)("lower") ++
        Seq.fill(9)("newest") ++ Seq.fill(5)("widest")).mkString(" ")
    ).toDF("text")
    val m = Unigram.train(corpus, "text", vocabSize = 24, maxPieceSyms = 4)
    val enc = UnigramEncode.model(m, Unigram.EndOfWord)
    val segNewest = UnigramEncode.segmentWord("newest", enc).toSeq
    val segWidest = UnigramEncode.segmentWord("widest", enc).toSeq
    // both words end in the same shared piece — the unigram objective
    // (frequent substrings get high prob) surfaces structurally
    assert(segNewest.last == segWidest.last)
    assert(segNewest.last.length > "</w>".length)
  }
}
