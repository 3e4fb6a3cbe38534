package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TextAnalysisSpec extends SparkSpec {

  import spark.implicits._

  test("gazetteerRedact: cover semantics, overlap merge, one placeholder per run") {
    import spark.implicits._
    val docs = Seq(
      // 'acme corp' and 'corp tower' overlap -> ONE merged run, one [GAZ]
      (1L, "visit Acme Corp Tower on main street today"),
      // two separate matches -> two placeholders
      (2L, "acme corp sells to beta labs every quarter"),
      // adjacent (abutting) matches merge into one run
      (3L, "acme corp beta labs merged their operations"),
      // no match survives untouched (normalized)
      (4L, "Nothing Matches In This Document At All"),
      // term at the very end; case-insensitive
      (5L, "the deal closed with BETA LABS")
    ).toDF("doc_id", "text")
    val terms = Seq("Acme Corp", "corp tower", "beta   labs") // messy spacing normalizes
    val got = TextAnalysis.gazetteerRedact(docs, "doc_id", "text", terms)
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(got(0) == ((1L, 1L, 3L, "visit [GAZ] on main street today")),
      s"overlap must merge: ${got(0)}")
    assert(got(1) == ((2L, 2L, 4L, "[GAZ] sells to [GAZ] every quarter")), s"${got(1)}")
    assert(got(2) == ((3L, 1L, 4L, "[GAZ] merged their operations")),
      s"abutting matches merge into one placeholder: ${got(2)}")
    assert(got(3) == ((4L, 0L, 0L, "nothing matches in this document at all")), s"${got(3)}")
    assert(got(4) == ((5L, 1L, 2L, "the deal closed with [GAZ]")), s"${got(4)}")
    // span view agrees with the cut view's counts
    val spans = TextAnalysis.gazetteerSpans(docs, "doc_id", "text", terms)
      .groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(spans == Map(1L -> 1L, 2L -> 2L, 3L -> 1L, 5L -> 1L), s"$spans")
  }

  test("tokenCount: whitespace runs, empty string → 0") {
    val df = Seq("one two  three", "", "   ", "single").toDF("text")
    val n = df.select(TextAnalysis.tokenCount(col("text"))).collect().map(_.getInt(0))
    assert(n.toSeq == Seq(3, 0, 0, 1))
  }

  test("subwordCount: letters, digits, punctuation units") {
    val df = Seq(Tuple1("hello world42!")).toDF("text")
    // "hello" + "world" + "42" + "!" = 4
    assert(df.select(TextAnalysis.subwordCount(col("text"))).head.getInt(0) == 4)
  }

  test("punctCount counts punctuation chars only") {
    val df = Seq(Tuple1("a, b. c! d?")).toDF("text")
    assert(df.select(TextAnalysis.punctCount(col("text"))).head.getInt(0) == 4)
  }

  test("stopwordRatio: half stopwords → 0.5") {
    val df = Seq(Tuple1("the cat and dog")).toDF("text")
    val r = df.select(TextAnalysis.stopwordRatio(col("text"))).head.getDouble(0)
    assert(math.abs(r - 0.5) < 1e-12)
  }

  test("qualityScore in [0,1] for corpus docs") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val bounds = docs.select(
      min(TextAnalysis.qualityScore(col("text"))),
      max(TextAnalysis.qualityScore(col("text")))).head
    assert(bounds.getDouble(0) >= 0.0 && bounds.getDouble(1) <= 1.0)
  }

  test("langId picks profile language by stopword evidence") {
    val df = Seq(
      "the cat sat on the mat with the hat",
      "el perro y la casa de que los gatos",
      "der hund und die katze ist nicht hier",
      "le chat est dans les maisons pour une vie",
      "这 是 一个 测试 的 文档 他 在 这").toDF("text")
    val preds = df.select(TextAnalysis.langId(col("text"))).collect().map(_.getString(0))
    assert(preds.toSeq == Seq("en", "es", "de", "fr", "zh"))
  }

  test("langId returns 'und' when nothing matches") {
    val df = Seq(Tuple1("xyzzy plugh qwerty")).toDF("text")
    assert(df.select(TextAnalysis.langId(col("text"))).head.getString(0) == "und")
  }

  test("fingerprint: deterministic, order-sensitive, case-insensitive") {
    val df = Seq(
      (1L, "alpha beta gamma"),
      (2L, "alpha beta gamma"),
      (3L, "gamma beta alpha"),
      (4L, "ALPHA BETA GAMMA")).toDF("id", "text")
    val fps = df.select(col("id"), TextAnalysis.fingerprint(col("text")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fps(1L) == fps(2L)) // deterministic
    assert(fps(1L) != fps(3L)) // order matters
    assert(fps(1L) == fps(4L)) // lowercased first
  }

  test("fingerprintMd5Poly: same polynomial properties; blank text is 0") {
    val df = Seq(
      (1L, "alpha beta gamma"),
      (2L, "alpha beta gamma"),
      (3L, "gamma beta alpha"),
      (4L, "ALPHA BETA GAMMA"),
      (5L, "   ")).toDF("id", "text")
    val fps = df.select(col("id"), TextAnalysis.fingerprintMd5Poly(col("text")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fps(1L) == fps(2L)) // deterministic
    assert(fps(1L) != fps(3L)) // order matters (positional polynomial)
    assert(fps(1L) == fps(4L)) // lowercased first
    assert(fps(5L) == 0L)      // whitespace-only folds to the empty accumulator
    // single token: fp = h(tok) exactly — pin the md5-limb assembly
    // against an independently computed value (hi*2^32 + lo of md5 hex)
    val single = Seq(Tuple1("alpha")).toDF("text")
      .select(TextAnalysis.fingerprintMd5Poly(col("text"))).head.getLong(0)
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest("alpha".getBytes("UTF-8")).map("%02x".format(_)).mkString
    val expect = java.lang.Long.parseLong(md.substring(0, 8), 16) * 4294967296L +
      java.lang.Long.parseLong(md.substring(8, 16), 16)
    assert(single == expect)
  }

  test("encodingNoiseScore: mojibake artifacts score, clean multilingual text does not") {
    val mojibakeEacute = "\u00C3\u00A9"      // UTF-8 e-acute read back as Latin-1
    val mojibakeQuote = "\u00E2\u20AC\u2122" // cp1252 ghost of U+2019
    val strayByte = "\u00C2\u00A0"           // stray byte + NBSP
    val df = Seq(
      (1L, s"caf$mojibakeEacute au lait, that${mojibakeQuote}s it"),
      (2L, "caf\u00E9 au lait, that\u2019s it"), // the PROPERLY decoded twin
      (3L, s"A${strayByte}B and \uFFFD here"),
      (4L, ""),
      (5L, "plain ascii text only")
    ).toDF("id", "text")
    val got = df.select(col("id"), TextAnalysis.encodingNoiseScore(col("text")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(1L) > 0.0, s"double-decode artifacts must score: $got")
    assert(got(2L) == 0.0, "correctly decoded accents and smart quotes are NOT noise")
    assert(got(3L) > 0.0, "stray-byte and replacement-char artifacts score")
    assert(got(4L) == 0.0 && got(5L) == 0.0)
    // ratio arithmetic: 2 artifacts over the row-1 string's length
    val len1 = s"caf$mojibakeEacute au lait, that${mojibakeQuote}s it".length
    assert(got(1L) == BigDecimal(2.0 * 1000 / len1)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("luhn card redaction: checksum decides, separators allowed, non-cards survive") {
    val df = Seq(
      (1L, "pay 4111111111111111 now"),            // valid visa test number
      (2L, "pay 4111111111111112 now"),            // checksum off by one
      (3L, "pay 4111-1111-1111-1111 today"),       // separated, still valid
      (4L, "order 123456789012 shipped"),          // 12 digits: too short, never a candidate
      (5L, "a 4111111111111111 b 5500005555555559 c"), // two valid cards (visa + mc test numbers)
      (6L, "no digits at all here")
    ).toDF("id", "text")
    val got = df.select(col("id"), TextAnalysis.redactCards(col("text")).as("t"),
        size(TextAnalysis.cardCandidates(col("text"))).as("nc"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2)))).toMap
    assert(got(1L)._1 == "pay <CARD> now")
    assert(got(2L)._1 == "pay 4111111111111112 now", "invalid checksum must NOT redact")
    assert(got(3L)._1 == "pay <CARD> today")
    assert(got(4L)._1 == "order 123456789012 shipped" && got(4L)._2 == 0)
    assert(got(5L)._1 == "a <CARD> b <CARD> c", "every valid card redacts independently")
    assert(got(6L)._1 == "no digits at all here")
    // direct checksum pins
    val v = Seq(("4111111111111111", true), ("4111111111111112", false),
      ("5500005555555559", true), ("4111-1111-1111-1111", true))
      .toDF("c", "want")
    assert(v.filter(TextAnalysis.luhnValid(col("c")) =!= col("want")).isEmpty)
  }

  test("annotate adds all analysis columns") {
    val docs = spark.read.parquet(s"$sf/documents.parquet").limit(10)
    val ann = TextAnalysis.annotate(docs)
    val want = Seq("n_tokens", "n_subwords", "stopword_ratio", "quality", "lang_pred", "fingerprint")
    assert(want.forall(ann.columns.contains))
    assert(ann.count() == 10)
  }

  test("native TextProfileExpr annotate is value-identical to the HOF formulation") {
    val edge = Seq(
      "", "   ", "one", "the quick brown fox and the lazy dog",
      "el que de la con los una por", "这 是 中文 文本 了",
      "x\ty  z!!! (parens) [brackets] 1234 mixed-case CASE",
      "a b c d e f g h i j k l m n o p q r s t u v w x y z").toDF("text")
    val corpus = spark.read.parquet(s"$sf/documents.parquet").select("doc_id", "text")
    for (frame <- Seq(edge.withColumn("doc_id", monotonically_increasing_id()), corpus)) {
      val nat = TextAnalysis.annotate(frame)
      val hof = TextAnalysis.annotateHof(frame)
      val cols = Seq("n_tokens", "n_subwords", "stopword_ratio", "quality", "lang_pred", "fingerprint")
      assert(nat.exceptAll(hof).count() == 0 && hof.exceptAll(nat).count() == 0,
        s"mismatch on columns $cols")
    }
  }

  test("redactPii replaces all four PII classes, leaves clean text alone") {
    val df = Seq(
      "mail me at jane.doe+x@corp-site.co.uk today",
      "ssn is 123-45-6789 ok",
      "call (415) 555-0137 or 415-555-0137 or 415.555.0137",
      "server at 192.168.001.42 port 80",
      "no pii here, just words and 42 numbers like 3.14").toDF("text")
    val out = df.select(TextAnalysis.redactPii(col("text"))).collect().map(_.getString(0))
    assert(out(0) == "mail me at <EMAIL> today")
    assert(out(1) == "ssn is <SSN> ok")
    assert(out(2) == "call <PHONE> or <PHONE> or <PHONE>")
    assert(out(3) == "server at <IP> port 80")
    assert(out(4) == "no pii here, just words and 42 numbers like 3.14")
  }

  test("chunk: window/overlap starts, tail coverage, short and empty docs") {
    val doc100 = (1 to 100).map(i => s"t$i").mkString(" ")
    val df = Seq((1L, doc100), (2L, "a b c d e"), (3L, ""), (4L, "   ")).toDF("id", "text")
    val rows = TextAnalysis.chunk(df, "id", "text", size = 40, overlap = 10)
      .orderBy("id", "chunk_idx").collect()

    val d1 = rows.filter(_.getLong(0) == 1L)
    // starts 1, 31, 61 (start 91 suppressed: wholly inside chunk@61's window)
    assert(d1.map(_.getLong(1)).toSeq == Seq(0L, 1L, 2L))
    assert(d1.map(_.getInt(2)).toSeq == Seq(40, 40, 40))
    assert(d1.head.getString(3).startsWith("t1 t2 ") && d1.last.getString(3).endsWith(" t100"))
    // every token is covered by some chunk
    val covered = d1.flatMap(_.getString(3).split(" ")).toSet
    assert(covered == (1 to 100).map(i => s"t$i").toSet)

    val d2 = rows.filter(_.getLong(0) == 2L)
    assert(d2.length == 1 && d2.head.getInt(2) == 5 && d2.head.getString(3) == "a b c d e")
    assert(!rows.exists(r => r.getLong(0) == 3L || r.getLong(0) == 4L), "empty docs yield no chunks")
  }

  test("repetitionRatio counts repeated trigrams; 0 for unique or short text") {
    val df = Seq(
      "a b c a b c a b c",                    // 7 trigrams, 3 distinct → 1 - 3/7
      "one two three four five six",          // all distinct → 0
      "too short",                            // < 3 tokens → 0
      "").toDF("text")
    val r = df.select(TextAnalysis.repetitionRatio(col("text"), 3)).collect().map(_.getDouble(0))
    assert(math.abs(r(0) - (1.0 - 3.0 / 7.0)) < 1e-6)
    assert(r(1) == 0.0 && r(2) == 0.0 && r(3) == 0.0)
  }

  test("native RepetitionRatioExpr is value-identical to the HOF formulation") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val edge = Seq("", "   ", "a", "a b", "a b a b a b", "x y z x y z x",
      "ONE one OnE one one one").toDF("text")
    for (frame <- Seq(docs, edge); n <- Seq(2, 3, 5)) {
      val both = frame.select(
        TextAnalysis.repetitionRatioHof(col("text"), n).as("hof"),
        TextAnalysis.repetitionRatio(col("text"), n).as("native"))
      assert(both.filter(col("hof") =!= col("native")).count() == 0,
        s"native/HOF divergence at n=$n")
    }
  }

  test("md5Fingerprint matches MessageDigest on normalized text") {
    val fp = Seq("  The QUICK brown fox  ").toDF("text")
      .select(TextAnalysis.md5Fingerprint(col("text"))).head.getString(0)
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest("the quick brown fox".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(fp == md)
    // normalization: case/outer-whitespace insensitive, inner-sensitive
    val same = Seq(("THE QUICK BROWN FOX", "the quick brown fox  "))
      .toDF("a", "b")
      .select((TextAnalysis.md5Fingerprint(col("a")) === TextAnalysis.md5Fingerprint(col("b"))).as("eq"))
      .head.getBoolean(0)
    assert(same)
  }

  test("c4Clean: every published line and document rule, each witnessed both ways") {
    val good =
      "the first shipment arrived on time.\n" +
        "every carton was inspected carefully!\n" +
        "was the manifest checked against the order?\n" +
        "he said \"the label reads fragile.\"\n" +       // terminal punct + closing quote
        "totals were reconciled the same evening."
    val docs = Seq(
      (1L, good),                                          // 5 sentences — survives exactly
      (2L, good + "\nshort one"),                          // no terminal punct — line dropped, doc survives
      (3L, good + "\nok."),                                // punct but < 5 words — line dropped
      (4L, good + "\nplease enable JavaScript to continue."), // javascript line dropped
      (5L, "style { margin: 0 }\n" + good),                // '{' — whole doc dropped
      (6L, "Lorem Ipsum dolor sit amet.\n" + good),        // lorem ipsum — whole doc dropped
      (7L, "only four sentences here.\nanother good line here!\na third fine line stands.\nthe fourth one closes this?"),
      (8L, "   the padded line ends properly.   \n" + good),   // trim before the rules AND in output
      (9L, good + "\nshe answered \"these goods were weighed and sealed\"")) // bare end-quote terminal — KEPT
      .toDF("id", "text")
    val out = TextAnalysis.c4Clean(docs, "id", "text")
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out.map(_._1).toSeq == Seq(1L, 2L, 3L, 4L, 8L, 9L),
      s"doc gates: 5/6 dropped by brace/lorem, 7 by the 3-sentence floor " +
        s"(its two 4-word lines fail the 5-word rule first); got ${out.map(_._1).toSeq}")
    val byId = out.map(o => o._1 -> o).toMap
    assert(byId(1L)._2 == good && byId(1L)._3 == 5L && byId(1L)._4 == 0L)
    assert(byId(2L)._2 == good && byId(2L)._3 == 5L && byId(2L)._4 == 1L,
      "the punct-less line must be dropped and counted")
    assert(byId(3L)._4 == 1L, "a 1-word line is dropped even with terminal punctuation")
    assert(byId(4L)._4 == 1L, "the javascript line is dropped case-insensitively")
    assert(byId(8L)._2.startsWith("the padded line ends properly.\n"),
      "surviving lines are emitted trimmed")
    assert(byId(9L)._3 == 6L && byId(9L)._4 == 0L &&
      byId(9L)._2.endsWith("\"these goods were weighed and sealed\""),
      "the paper treats an end quotation mark itself as terminal")
    // threshold knobs move the gates, not the rules
    val relaxed = TextAnalysis.c4Clean(docs, "id", "text", minDocSentences = 2)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(relaxed.contains(7L), "doc 7's two surviving sentences pass the relaxed floor")
    val strictWords = TextAnalysis.c4Clean(docs, "id", "text", minLineWords = 6)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(!strictWords.contains(1L) || strictWords(1L) < 5L,
      "raising minLineWords must drop shorter sentences")
  }

  test("dedupLines keeps the corpus-first copy of every line, reassembled in order") {
    val docs = Seq(
      (1L, "alpha\nbeta\ngamma"),
      (2L, "beta\ndelta"),                 // beta already in doc 1
      (3L, "delta\nalpha\n\n  \nepsilon")) // blanks dropped, rest seen
      .toDF("id", "text")
    val out = TextAnalysis.dedupLines(docs, "id", "text")
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(out == Seq(
      (1L, "alpha\nbeta\ngamma", 3L),
      (2L, "delta", 1L),
      (3L, "epsilon", 1L)))
  }

  test("dedupLines drops documents whose every line was already seen") {
    val docs = Seq((1L, "x\ny"), (2L, "y\nx"), (3L, "x")).toDF("id", "text")
    val out = TextAnalysis.dedupLines(docs, "id", "text").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L))
    assert(out.head.getString(1) == "x\ny")
  }

  test("dedupLines removes within-document repeats too, keeping the first") {
    val out = TextAnalysis.dedupLines(
      Seq((1L, "a\nb\na\na\nc")).toDF("id", "text"), "id", "text").head()
    assert(out.getString(1) == "a\nb\nc" && out.getLong(2) == 3L)
  }

  test("tfidf ranks a document's distinctive term above the corpus-wide one") {
    // "common" appears in all 3 docs; each doc has a unique term with the
    // same tf — the unique term must outscore the common one
    val docs = Seq(
      (1L, "common alpha alpha"),
      (2L, "common beta beta"),
      (3L, "common gamma gamma")).toDF("doc_id", "text")
    val top = TextAnalysis.tfidf(docs, "doc_id", "text", topK = 1)
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(top == Map(1L -> "alpha", 2L -> "beta", 3L -> "gamma"))
    // smooth-idf value check: tf=2, N=3, df=1 → 2·(ln(4/2)+1)
    val s = TextAnalysis.tfidf(docs, "doc_id", "text", topK = 1)
      .filter($"doc_id" === 1L).head().getDouble(2)
    assert(math.abs(s - 2.0 * (math.log(2.0) + 1.0)) < 5e-5)
  }

  test("tfidf emits at most topK terms per doc, ties broken by term") {
    val docs = Seq((1L, "b a c d e")).toDF("doc_id", "text")
    val out = TextAnalysis.tfidf(docs, "doc_id", "text", topK = 2)
      .orderBy("term").collect().map(_.getString(1))
    assert(out.toSeq == Seq("a", "b"), "equal scores must break ties alphabetically")
  }

  test("bm25: term frequency saturates, doc length normalizes, idf weights rarity") {
    val docs = Seq(
      (1L, "join join join join pad pad pad pad"),   // heavy tf, longer
      (2L, "join pad"),                              // tf=1, short
      (3L, "vector pad pad pad pad pad pad pad"),    // rare term
      (4L, "pad pad pad pad pad pad pad pad"),       // no match
      (5L, "join pad pad pad pad pad pad pad")).toDF("doc_id", "text")
    val out = TextAnalysis.bm25(docs, Seq("join", "vector"), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    val ranked = out.map(_._1).toSeq
    // doc 4 matches nothing and must be absent
    assert(!ranked.contains(4L) && out.length == 4)
    // "vector" (df=1) outweighs "join" (df=3) for single-occurrence docs
    val score = out.map(r => r._1 -> r._2).toMap
    assert(score(3L) > score(5L), s"rarity must win: $score")
    // tf saturation: 4 occurrences score higher than 1 but far below 4x
    assert(score(1L) > score(5L) && score(1L) < 4.0 * score(5L), s"$score")
    // shorter doc with the same tf ranks higher (length normalization)
    assert(score(2L) > score(5L), s"length norm: $score")
    // n_terms_matched
    assert(out.find(_._1 == 3L).get._3 == 1L)
    // determinism
    val again = TextAnalysis.bm25(docs, Seq("join", "vector"), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    assert(again.toSeq == out.toSeq)
  }

  test("ngramCounts: bigrams counted corpus-wide, short docs skipped, minCount gates") {
    val docs = Seq(
      (1L, "the cat sat"),
      (2L, "the cat ran"),
      (3L, "cat"), // shorter than n → no grams
      (4L, "  the   cat  ")) // empty tokens filtered before gram assembly
      .toDF("doc_id", "text")
    val out = TextAnalysis.ngramCounts(docs, "text", n = 2, minCount = 2L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // "the cat" in docs 1, 2, 4 → 3; all other bigrams are singletons
    assert(out == Map("the cat" -> 3L))
    val all = TextAnalysis.ngramCounts(docs, "text", n = 2, minCount = 1L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(all == Map("the cat" -> 3L, "cat sat" -> 1L, "cat ran" -> 1L))
  }

  test("selfPerplexity: gibberish scores below natural text; short docs drop") {
    val natural = "the quick brown fox jumps over the lazy dog and then " * 3
    val docs = Seq(
      (1L, natural),
      (2L, natural + " with a small tail of extra words"),
      (3L, "xq zvk wjq pfzt bbqx vnmz kkjw qqpz xxyw zzqv jjkx wwqz"), // OOD
      (4L, "ab")) // < 3 chars of grams → no rows
      .toDF("doc_id", "text")
    val out = TextAnalysis.selfPerplexity(docs)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(!out.contains(4L), "sub-n doc must drop out")
    assert(out(3L) < out(1L) && out(3L) < out(2L),
      s"gibberish must score lower (higher perplexity): $out")
  }

  test("ngramLogProbScore: unseen grams take the smoothed branch, scoring stays total") {
    val model = TextAnalysis.charNgramModel(
      Seq((1L, "aaaa bbbb cccc")).toDF("doc_id", "text"))
    val out = TextAnalysis.ngramLogProbScore(
      Seq((9L, "zzzz yyyy")).toDF("doc_id", "text"), model)
      .collect()
    assert(out.length == 1 && out.head.getLong(1) == 7L) // 9 chars → 7 grams
    // all grams unseen → every one scored at ln(0.5/total), none dropped
    val total = 12L // "aaaa bbbb cccc" normalized has 14 chars → 12 grams
    val expected = math.log(0.5 / total)
    assert(math.abs(out.head.getDouble(2) - expected) < 1e-3)
  }

  test("broadcast lmScorer is value-identical to the explode+join batch scorer") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val model = TextAnalysis.charNgramModel(docs)
    val batch = TextAnalysis.ngramLogProbScore(docs, model)
      .select(col("doc_id"), col("avg_logp"))
    val scorer = TextAnalysis.lmScorer(model)
    val native = docs.select(col("doc_id"), scorer(col("text")).as("avg_logp"))
      .filter(col("avg_logp").isNotNull)
    assert(batch.count() > 0)
    assert(batch.exceptAll(native).count() == 0 && native.exceptAll(batch).count() == 0)
    // novel text (unseen grams) scores identically through both paths
    val novel = Seq((1L, "zzqx wvkk pp"), (2L, "a")).toDF("doc_id", "text")
    val b2 = TextAnalysis.ngramLogProbScore(novel, model).select("doc_id", "avg_logp")
    val n2 = novel.select(col("doc_id"), scorer(col("text")).as("avg_logp"))
      .filter(col("avg_logp").isNotNull)
    assert(b2.exceptAll(n2).count() == 0 && n2.exceptAll(b2).count() == 0)
  }

  test("selfPerplexity on an unscoreable corpus returns an empty, typed frame") {
    val docs = Seq((1L, "ab"), (2L, "")).toDF("doc_id", "text") // all < n chars
    val out = TextAnalysis.selfPerplexity(docs)
    assert(out.columns.toSeq == Seq("doc_id", "n_grams", "avg_logp") && out.count() == 0)
  }

  test("invertedIndex: df band filter, sorted postings, hot term excluded") {
    val docs = Seq(
      (3L, "hot mid rare"),
      (1L, "hot mid"),
      (2L, "hot mid mid")).toDF("doc_id", "text")
    // df: hot=3, mid=3, rare=1 → band [2,2] excludes everything
    val idx = TextAnalysis.invertedIndex(docs, "doc_id", "text", minDf = 2L, maxDf = 2L)
      .collect()
    assert(idx.isEmpty)
    val idx2 = TextAnalysis.invertedIndex(docs, "doc_id", "text", minDf = 2L, maxDf = 3L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).sortBy(_._1)
    assert(idx2.toSeq == Seq(("hot", 3L, "1,2,3"), ("mid", 3L, "1,2,3")),
      "postings must be doc-id sorted and duplicate tokens collapsed")
  }

  test("winnowing guarantee: a shared >= k+w-1 char passage yields a shared fingerprint") {
    val passage = "the quick brown fox jumps over the lazy dog" // 43 chars >= 25+10-1
    val docs = Seq(
      (1L, "first document head material " + passage + " and a unique tail"),
      (2L, "totally different opening text here " + passage),
      (3L, "no shared passage at all in this third document body")
    ).toDF("doc_id", "text")
    val pairs = TextAnalysis.winnowNearDups(
      docs, "doc_id", "text", k = 25, w = 10, minShared = 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), "the copied passage must surface")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L), "doc 3 shares nothing")
    // short docs emit no fingerprints at all
    val short = Seq((9L, "too short")).toDF("doc_id", "text")
    assert(TextAnalysis.winnowFingerprints(short, "doc_id", "text").count() == 0)
    // maxDf=1 prunes every cross-doc fingerprint → no pairs survive
    assert(TextAnalysis.winnowNearDups(
      docs, "doc_id", "text", k = 25, w = 10, minShared = 1L, maxDf = 1L).count() == 0)
  }

  test("incremental winnowing vs a persisted store == full recompute side-filtered to new pairs") {
    val docs = spark.read.parquet(s"$sf/documents.parquet").limit(200)
    val history = docs.filter(col("doc_id") % 5 =!= 4)
    val batch = docs.filter(col("doc_id") % 5 === 4)
    val store = TextAnalysis.winnowFingerprints(history, "doc_id", "text", k = 25, w = 10)
    val inc = TextAnalysis.winnowNearDupsIncremental(
      batch, store, "doc_id", "text", k = 25, w = 10, minShared = 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val full = TextAnalysis.winnowNearDups(
      docs, "doc_id", "text", k = 25, w = 10, minShared = 1L)
      .filter(col("id_a") % 5 === 4 || col("id_b") % 5 === 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(inc == full,
      s"missing=${(full -- inc).take(3)} extra=${(inc -- full).take(3)}")
    assert(inc.nonEmpty, "fixture must exercise at least one batch-touching pair")
    // history×history pairs never re-emitted
    assert(!inc.exists(p => p._1 % 5 != 4 && p._2 % 5 != 4))
    // next-day store maintenance is a blind union: store ∪ batch fps ==
    // full-corpus fingerprints (winnowing state is append-only)
    val nextStore = store.unionByName(
      TextAnalysis.winnowFingerprints(batch, "doc_id", "text", k = 25, w = 10))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val fullFps = TextAnalysis.winnowFingerprints(docs, "doc_id", "text", k = 25, w = 10)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(nextStore == fullFps)
  }

  test("mergeable winnow df state: delta-summed prune == recount == full recompute") {
    val docs = spark.read.parquet(s"$sf/documents.parquet").limit(200)
    val batch = docs.filter(col("doc_id") % 5 === 4)
    // history arrived as two ingests, each appending its own df delta
    val dayA = docs.filter(col("doc_id") % 5 < 2)
    val dayB = docs.filter(col("doc_id") % 5 === 2 || col("doc_id") % 5 === 3)
    val fpsA = TextAnalysis.winnowFingerprints(dayA, "doc_id", "text", k = 25, w = 10)
    val fpsB = TextAnalysis.winnowFingerprints(dayB, "doc_id", "text", k = 25, w = 10)
    val storeFps = fpsA.unionByName(fpsB)
    val deltaDf = TextAnalysis.winnowDfStore(fpsA, "doc_id")
      .unionByName(TextAnalysis.winnowDfStore(fpsB, "doc_id"))
    // maxDf = 2 makes the prune arithmetic load-bearing: an fp in two
    // history docs plus one batch doc must read 3 (pruned), which only
    // happens if stored deltas and the batch count actually combine
    val asSet = (df: org.apache.spark.sql.DataFrame) =>
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val mergeable = asSet(TextAnalysis.winnowNearDupsIncrementalMergeable(
      batch, storeFps, deltaDf, "doc_id", "text", k = 25, w = 10,
      minShared = 1L, maxDf = 2L))
    val recount = asSet(TextAnalysis.winnowNearDupsIncremental(
      batch, storeFps, "doc_id", "text", k = 25, w = 10,
      minShared = 1L, maxDf = 2L))
    assert(mergeable == recount,
      s"missing=${(recount -- mergeable).take(3)} extra=${(mergeable -- recount).take(3)}")
    val full = asSet(TextAnalysis.winnowNearDups(
      docs, "doc_id", "text", k = 25, w = 10, minShared = 1L, maxDf = 2L)
      .filter(col("id_a") % 5 === 4 || col("id_b") % 5 === 4))
    assert(mergeable == full,
      s"missing=${(full -- mergeable).take(3)} extra=${(mergeable -- full).take(3)}")
    assert(mergeable.nonEmpty, "fixture must exercise at least one pair")
    // the prune must actually fire at maxDf=2 on this fixture, or the
    // equivalence above proves nothing about the df arithmetic
    val loose = asSet(TextAnalysis.winnowNearDupsIncrementalMergeable(
      batch, storeFps, deltaDf, "doc_id", "text", k = 25, w = 10,
      minShared = 1L, maxDf = 1000L))
    assert(loose != mergeable, "maxDf=2 must prune something on this fixture")
    // delta-store associativity: sum of per-ingest deltas == recompute
    // from the combined fingerprints; compaction is idempotent
    val compacted = TextAnalysis.winnowDfCompact(deltaDf)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val recomputed = TextAnalysis.winnowDfStore(storeFps, "doc_id")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(compacted == recomputed)
    val twice = TextAnalysis.winnowDfCompact(TextAnalysis.winnowDfCompact(deltaDf))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(twice == compacted)
  }

  test("native winnow kernel is value-identical to the window formulation on corpus docs") {
    val docs = spark.read.parquet(s"$sf/documents.parquet").limit(100)
    val native = TextAnalysis.winnowFingerprints(docs, "doc_id", "text", k = 25, w = 10)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val windowed = TextAnalysis.winnowFingerprintsWindowed(docs, "doc_id", "text", k = 25, w = 10)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(native == windowed,
      s"missing=${(windowed -- native).take(3)} extra=${(native -- windowed).take(3)}")
    assert(native.nonEmpty)
  }

  test("removeBoilerplate: df-threshold lines drop everywhere, trim-matched; emptied docs vanish") {
    val docs = Seq(
      (1L, "NAV\nalpha\nFOOTER"),
      (2L, "NAV\nbeta\nFOOTER"),
      (3L, "NAV\ngamma"),
      (4L, "delta\n NAV "), // trimmed match still counts toward df and drops
      (5L, "NAV")           // nothing left → doc disappears
    ).toDF("doc_id", "text")
    val out = TextAnalysis.removeBoilerplate(docs, "doc_id", "text", minDocs = 3)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    // NAV df=5 → removed everywhere; FOOTER df=2 → kept (below threshold)
    assert(out == Seq(
      (1L, "alpha\nFOOTER", 2L),
      (2L, "beta\nFOOTER", 2L),
      (3L, "gamma", 1L),
      (4L, "delta", 1L)))
  }

  test("gopherSignals: hand-computed fractions on a crafted doc") {
    val df = Seq((1L, "aa bb aa bb aa bb cc")).toDF("doc_id", "text")
    val r = TextAnalysis.gopherSignals(df).head
    // 7 words, 14 word-chars; top 2-gram "aa bb" ×3 → 12/14 chars
    assert(r.getAs[Long]("word_count") == 7L)
    assert(r.getAs[Double]("mean_word_len") == 2.0)
    assert(r.getAs[Double]("top2gram_frac") == 0.857143)
    // 5-grams are the 3 distinct windows → no duplicate mass
    assert(r.getAs[Double]("dup5gram_frac") == 0.0)
    assert(r.getAs[Double]("alpha_word_frac") == 1.0)
    assert(!r.getAs[Boolean]("passes_gopher")) // too short, words too short
  }

  test("gopherSignals: top-gram ties break to the bytewise-smallest gram") {
    // "b a"(2), "a b"(2), "b c"(2), "c b"(1) — tie resolves to "a b"
    val df = Seq((1L, "b a b c b a b c")).toDF("doc_id", "text")
    val r = TextAnalysis.gopherSignals(df).head
    assert(r.getAs[Double]("top2gram_frac") == 0.5) // 2 occ × 2 chars / 8
  }

  test("gopherSignals: gate fails repetitive text, passes diverse text; symbol counter") {
    val spam = (1L, Seq.fill(60)("spam ham").mkString(" "))
    val clean = (2L, (1 to 60).map(i => f"word$i%03d").mkString(" "))
    val symbols = (3L, (1 to 60).map(i => f"tok$i%03d").mkString(" ") + " " +
      Seq.fill(9)("#").mkString(" ") + " so... on... then...")
    val out = TextAnalysis.gopherSignals(Seq(spam, clean, symbols).toDF("doc_id", "text"))
      .orderBy("doc_id").collect()
    assert(!out(0).getAs[Boolean]("passes_gopher") &&
      out(0).getAs[Double]("top2gram_frac") > 0.2)
    assert(out(1).getAs[Boolean]("passes_gopher"), out(1).toString)
    // 9 '#' + 3 '...' over 72 words = 12/72
    assert(out(2).getAs[Double]("symbol_word_ratio") == 0.166667)
  }

  test("gopherSignals: short and empty docs yield zero fractions, no crash") {
    val df = Seq((1L, "one two"), (2L, ""), (3L, "   ")).toDF("doc_id", "text")
    val out = TextAnalysis.gopherSignals(df).orderBy("doc_id").collect()
    assert(out(0).getAs[Double]("dup5gram_frac") == 0.0) // < 5 words
    assert(out(1).getAs[Long]("word_count") == 0L &&
      out(1).getAs[Double]("mean_word_len") == 0.0 &&
      !out(1).getAs[Boolean]("passes_gopher"))
    assert(out(2).getAs[Long]("word_count") == 0L)
  }

  test("native gopherSignals kernel is value-identical to the exploded reference twin") {
    val edge = Seq(
      "one", "aa bb aa bb aa bb cc", "b a b c b a b c",
      "the quick brown fox jumps over the lazy dog again and again and again",
      "x# y# z#... repeated x# y# z#... repeated x# y# z#...",
      Seq.fill(30)("dup gram block").mkString(" "))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val corpus = spark.read.parquet(s"$sf/documents.parquet").select("doc_id", "text")
    for (frame <- Seq(edge, corpus)) {
      val nat = TextAnalysis.gopherSignals(frame)
      val ref = TextAnalysis.gopherSignalsRef(frame)
      assert(nat.exceptAll(ref).count() == 0 && ref.exceptAll(nat).count() == 0)
    }
  }

  test("ccnetBuckets: per-language terciles, head strictly better than tail, ties share") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val b = TextAnalysis.ccnetBuckets(docs).cache()
    val n = b.count()
    assert(n == TextAnalysis.selfPerplexity(docs).count(), "bucketing must not drop scored docs")
    assert(b.select("bucket").distinct().collect().map(_.getString(0)).toSet
      == Set("head", "middle", "tail"))
    // within every language, min(head score) >= max(tail score): the
    // cuts are values, so the order property is exact, not statistical
    val agg = b.groupBy("lang").pivot("bucket", Seq("head", "tail"))
      .agg(min("avg_logp").as("mn"), max("avg_logp").as("mx"))
      .collect()
    agg.foreach { r =>
      val headMin = r.getAs[Double]("head_mn")
      val tailMax = r.getAs[Double]("tail_mx")
      assert(headMin >= tailMax, s"lang ${r.get(0)}: head $headMin < tail $tailMax")
    }
    // tercile sizes are balanced up to ties sharing a bucket
    val sizes = b.groupBy("lang", "bucket").count().collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(2)))
    sizes.foreach { case (lang, cs) =>
      val total = cs.sum
      assert(cs.forall(c => c <= total / 3 + total / 6 + 2),
        s"lang $lang buckets too skewed: ${cs.toSeq} of $total")
    }
    b.unpersist()
  }

  test("wordBlocklistGate: whole-token matches only, distinct sorted terms, occurrence count") {
    import spark.implicits._
    val df = Seq(
      (1L, "the hashing was slow, slow and SLOW"), // 'hashing' must NOT hit 'hash'
      (2L, "can't stop won't stop"),               // apostrophe token match
      (3L, "a perfectly clean sentence"),
      (4L, "vector Vector VECTOR hash")
    ).toDF("id", "text")
    val got = TextAnalysis.wordBlocklistGate(df, "text",
        Seq("slow", "hash", "vector", "can't"))
      .select("id", "bad_terms", "n_bad_tokens", "blocked")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getBoolean(3)))
      .sortBy(_._1)
    assert(got.toSeq == Seq(
      (1L, "slow", 3L, true),          // hashing ≠ hash; slow ×3 case-folded
      (2L, "can't", 1L, true),
      (3L, "", 0L, false),
      (4L, "hash vector", 4L, true)))  // sorted distinct terms, 4 occurrences
    // native kernel ≡ HOF semantic spec, incl. on the fixture corpus
    // (multi-byte delimiters, punctuation edges, empty hits)
    val corpus = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id").as("id"), col("text"))
      .unionByName(df.select((col("id") + 1000L).as("id"), col("text")))
    val native = TextAnalysis.wordBlocklistGate(corpus, "text",
        Seq("slow", "hash", "vector", "can't"))
      .select("id", "bad_terms", "n_bad_tokens").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sortBy(_._1)
    val hof = TextAnalysis.wordBlocklistGateHof(corpus, "text",
        Seq("slow", "hash", "vector", "can't"))
      .select("id", "bad_terms", "n_bad_tokens").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sortBy(_._1)
    assert(native.toSeq == hof.toSeq, "kernel must equal the HOF formulation")
  }

  test("dropRepeatedParagraphs: first occurrence survives, order preserved, trim-normalized") {
    import spark.implicits._
    val df = Seq(
      (1L, "alpha\nbanner\nbeta\n banner \nalpha\ngamma"),
      (2L, "one\n\ntwo\n\nthree"), // repeated empty paragraph collapses
      (3L, "solo")
    ).toDF("id", "text")
    val got = TextAnalysis.dropRepeatedParagraphs(df, "text")
      .select("id", "clean_text", "n_paragraphs", "n_dropped")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(got.toSeq == Seq(
      (1L, "alpha\nbanner\nbeta\ngamma", 6L, 2L), // ' banner ' trims into the dup
      (2L, "one\n\ntwo\nthree", 5L, 1L),
      (3L, "solo", 1L, 0L)))
  }

  test("piiProfile: counts per class with sequential staging (no double counts)") {
    import spark.implicits._
    val docs = Seq(
      // an email whose local part is digit-heavy: must count ONCE as
      // email, never as phone/ip (it is redacted before those passes)
      (1L, "write 415.555.0137.99@mail.test today"),
      (2L, "call (415) 555-0137 or 415-555-0137 ssn 123-45-6789 host 10.0.0.7"),
      (3L, "no pii here at all"),
      (4L, "ip only 192.168.10.20 twice 10.1.2.3"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.piiProfile(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got(0) == ((1L, 1L, 0L, 0L, 0L)), s"email swallows its digits: ${got(0)}")
    assert(got(1) == ((2L, 0L, 1L, 2L, 1L)), s"each class once: ${got(1)}")
    assert(got(2) == ((3L, 0L, 0L, 0L, 0L)))
    assert(got(3) == ((4L, 0L, 0L, 0L, 2L)))
    // parity with redaction: count == number of tokens redactPii emits
    val red = docs.select(TextAnalysis.redactPii(col("text")).as("c"))
      .collect().map(_.getString(0)).mkString(" ")
    assert("<EMAIL>".r.findAllIn(red).size == 1 && "<PHONE>".r.findAllIn(red).size == 2
      && "<SSN>".r.findAllIn(red).size == 1 && "<IP>".r.findAllIn(red).size == 3)
  }

  test("zipfProfile: ranks by (count desc, token asc); slope matches the closed-form fit") {
    import spark.implicits._
    val docs = Seq((1L, "a a a a b b c"), (2L, "a a a a b b c")).toDF("doc_id", "text")
    val got = TextAnalysis.zipfProfile(docs, "text", topK = 10)
      .orderBy("rank").collect()
    assert(got.map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq ==
      Seq((1L, "a", 8L), (2L, "b", 4L), (3L, "c", 2L)))
    // expected slope from the same rounded-ln least squares, computed
    // independently here (pure-doubles reference of the decimal pipeline)
    def r6(x: Double) = math.round(x * 1e6) / 1e6
    val xs = Seq(1, 2, 3).map(r => r6(math.log(r.toDouble)))
    val ys = Seq(8, 4, 2).map(c => r6(math.log(c.toDouble)))
    val n = 3.0
    val (sx, sy) = (xs.sum, ys.sum)
    val sxy = xs.zip(ys).map { case (x, y) => x * y }.sum
    val sxx = xs.map(x => x * x).sum
    val want = r6((n * sxy - sx * sy) / (n * sxx - sx * sx))
    got.foreach(r => assert(math.abs(r.getDouble(5) - want) < 2e-6,
      s"slope ${r.getDouble(5)} vs expected $want"))
    // a perfect freq = C/rank corpus has slope exactly -1-ish: 8,4,2 over
    // ranks 1,2,3 is NOT 1/r, so just pin the sign and range
    assert(got.head.getDouble(5) < -0.5 && got.head.getDouble(5) > -2.0)
  }

  test("tokenizerFertility: exact counters + 6dp ratios; null/blank text; multibyte bytes") {
    import spark.implicits._
    val merges = Seq("a" -> "b", "ab" -> "</w>", "c" -> "</w>")
    val enc = Bpe.encodeNative(spark, merges)
    val df = Seq(
      ("en", "ab c"),                      // "ab"→1 token, "c"→1 token
      ("en", "   "),                       // blank: 0 words
      ("de", null.asInstanceOf[String]),   // null: 0 words, 0 tokens
      ("de", "AB ab"),                     // lowercased: 2×"ab" → 2 tokens
      ("fr", "éé"))              // éé: 2 chars, 4 UTF-8 bytes, no merges → 3 syms
      .toDF("lang", "text")
    val got = TextAnalysis.tokenizerFertility(df, "lang", "text", enc)
      .orderBy("lang").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), Option(r.get(6)), Option(r.get(7)), Option(r.get(8))))
    assert(got(0) == ("de", 2L, 2L, 4L, 4L, 2L,
      Some(1.0), Some(0.5), Some(2.0)), s"de row ${got(0)}")
    assert(got(1) == ("en", 2L, 2L, 3L, 3L, 2L,
      Some(1.0), Some(0.666667), Some(1.5)), s"en row ${got(1)}")
    assert(got(2) == ("fr", 1L, 1L, 2L, 4L, 3L,
      Some(3.0), Some(1.5), Some(1.333333)), s"fr row ${got(2)}")
    // a language with ONLY empty docs: zero denominators surface NULL
    val empt = TextAnalysis.tokenizerFertility(
      Seq(("zz", "")).toDF("lang", "text"), "lang", "text", enc).head()
    assert(empt.getLong(2) == 0L && empt.isNullAt(6) && empt.isNullAt(7) && empt.isNullAt(8))
  }

  test("vocabCoverage: UNK occurrences counted exactly; empty language surfaces NULL rate") {
    import spark.implicits._
    val merges = Seq("a" -> "b", "ab" -> "</w>", "c" -> "</w>")
    val vocab = Seq("ab</w>" -> 0, "c</w>" -> 1) // everything else is an UNK
    val encIds = Bpe.encodeToIds(spark, merges, vocab)
    val df = Seq(
      ("en", "ab c q"),                  // ab</w>, c</w>, then q,</w> both UNK → 4 tokens, 2 unk
      ("de", null.asInstanceOf[String])) // 0 tokens → NULL rate
      .toDF("lang", "text")
    val got = TextAnalysis.vocabCoverage(df, "lang", "text", encIds)
      .orderBy("lang").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        Option(r.get(4)).map(_.asInstanceOf[Double])))
    assert(got.toSeq == Seq(
      ("de", 1L, 0L, 0L, None),
      ("en", 1L, 4L, 2L, Some(0.5))), s"got ${got.toSeq}")
  }

  test("fertilityAdvance: two advances ≡ full-corpus counters; untouched languages persist") {
    import spark.implicits._
    val merges = Seq("a" -> "b", "ab" -> "</w>", "c" -> "</w>")
    val enc = Bpe.encodeNative(spark, merges)
    val b1 = Seq(("en", "ab c"), ("fr", "éé")).toDF("lang", "text")
    val b2 = Seq(("en", "ab"), ("de", "c c")).toDF("lang", "text")
    val advanced = TextAnalysis.fertilityAdvance(
      TextAnalysis.fertilityCounters(b1, "lang", "text", enc),
      b2, "lang", "text", enc)
      .orderBy("lang").collect().map(_.toSeq).toSeq
    val full = TextAnalysis.fertilityCounters(
      b1.unionByName(b2), "lang", "text", enc)
      .orderBy("lang").collect().map(_.toSeq).toSeq
    assert(advanced == full, s"advance must equal the full recount:\n$advanced\n$full")
    // fr appears only in batch 1 — the advance must carry it through
    assert(advanced.exists(_.head == "fr"))
    // empty batch is a no-op
    val noop = TextAnalysis.fertilityAdvance(
      TextAnalysis.fertilityCounters(b1, "lang", "text", enc),
      Seq.empty[(String, String)].toDF("lang", "text"), "lang", "text", enc)
      .orderBy("lang").collect().map(_.toSeq).toSeq
    assert(noop == TextAnalysis.fertilityCounters(b1, "lang", "text", enc)
      .orderBy("lang").collect().map(_.toSeq).toSeq)
  }

  test("langIdConfusion: exact cells, row-normalized shares, diagonal flag, und arm") {
    import spark.implicits._
    val df = Seq(
      ("en", "the cat and the dog"), // → en (correct)
      ("en", "el que la con"),       // → es (the mislabel cell)
      ("de", "der und das ist"),     // → de (correct)
      ("de", ""))                    // → und (no signal)
      .toDF("lang", "text")
    val got = TextAnalysis.langIdConfusion(df, "lang", "text")
      .orderBy("label", "pred").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getBoolean(4)))
    assert(got.toSeq == Seq(
      ("de", "de", 1L, 0.5, true), ("de", "und", 1L, 0.5, false),
      ("en", "en", 1L, 0.5, true), ("en", "es", 1L, 0.5, false)), s"got ${got.toSeq}")
  }
}
