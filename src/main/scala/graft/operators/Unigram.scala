package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.UnigramEncode
import graft.functions.UnigramEncode.PieceModel

/** Unigram-LM subword tokenizer (SentencePiece-style; Kudo 2018,
  * "Subword Regularization") — the second production tokenizer family
  * next to [[Bpe]] (reference scope: the north-star text-analysis
  * family; production LLM pipelines split between BPE and unigram-LM).
  *
  * Scale shape (the [[Bpe.train]] pattern): training operates on the
  * WORD-TYPE frequency table, not the token stream — one distributed
  * explode+groupBy collapses the corpus (the only pass over data), and
  * the EM loop runs driver-side over the compact type table, exactly
  * like k-means centroids ride the driver. The type table is capped at
  * `maxTypes` by (count desc, word) — bounded driver state at any
  * corpus size.
  *
  * Algorithm (deterministic Viterbi-EM, the standard hard-EM
  * simplification of Kudo's full forward-backward E-step):
  *   1. seed: every substring of every word-framed symbol sequence up
  *      to `maxPieceSyms` symbols, scored by corpus frequency·length;
  *      top `seedSize` kept (ties to the lexicographically smaller
  *      piece), ALL single symbols always included (total coverage);
  *   2. E-step: Viterbi-segment each word type under the current
  *      scores ([[graft.functions.UnigramEncode.segmentWord]] — the
  *      SAME kernel the encoder ships, so train and encode can never
  *      disagree), accumulating type-count-weighted piece counts;
  *   3. M-step: logprob = ln(count / total) over the surviving set;
  *   4. prune: drop the lowest-Viterbi-count multi-symbol pieces
  *      (ties to the lexicographically LARGER piece dropping first)
  *      down to `shrink`× the current size, floor `vocabSize`; single
  *      symbols are never pruned;
  *   repeat 2–4 until the vocabulary is ≤ `vocabSize`, then one final
  *   E+M so the shipped logprobs match the shipped vocabulary.
  *
  * Determinism: all selections sort on (count, piece) before cutting;
  * HashMap iteration order never reaches a decision. Training twice on
  * the same corpus is bit-identical (spec-pinned). Like BPE's merge
  * loop, the iterative argmax has no SQL-expressible oracle — the
  * ORACLE-CHECKED surface is encode-under-frozen-scores (q270/q271),
  * where the Viterbi DP over exact-binary-fraction logprobs replays
  * bit-identically in a DuckDB recursive CTE.
  *
  * Word framing and decode are SHARED with BPE (chars + `</w>` marker,
  * [[Bpe.decode]]), so the fertility/coverage audits (q260/q265) and
  * the packing/id surface work unchanged under either family.
  */
object Unigram {

  /** End-of-word marker — [[Bpe.EndOfWord]], shared by construction. */
  val EndOfWord: String = Bpe.EndOfWord

  /** Symbol length of a piece: marker counts as ONE symbol. */
  private def symLen(p: String): Int =
    if (p.endsWith(EndOfWord)) (p.length - EndOfWord.length) + 1 else p.length

  /** Train a unigram-LM piece table of at most `vocabSize` pieces.
    * Returns (piece, ln-prob) sorted by (piece) — local model state for
    * [[encodeNative]], small by construction.
    */
  def train(
      df: DataFrame,
      textCol: String,
      vocabSize: Int,
      maxTypes: Int = 1 << 20,
      maxPieceSyms: Int = 8,
      seedSize: Int = 1 << 16,
      shrink: Double = 0.75,
      unkScore: Double = -100.0): Seq[(String, Double)] = {
    require(vocabSize > 0, "vocabSize must be positive")
    require(shrink > 0.0 && shrink < 1.0, "shrink must be in (0, 1)")
    val types: Array[(String, Long)] = df
      .select(explode(TextAnalysis.tokens(lower(col(textCol)))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("w"))
      .limit(maxTypes)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))

    // --- seed: substring frequencies over word-framed symbol arrays
    val freq = scala.collection.mutable.HashMap.empty[String, Long]
    types.foreach { case (w, cnt) =>
      val syms: Array[String] =
        w.map(_.toString).toArray :+ EndOfWord
      var i = 0
      while (i < syms.length) {
        val sb = new StringBuilder
        var j = i
        while (j < syms.length && j - i < maxPieceSyms) {
          sb.append(syms(j))
          val p = sb.toString
          freq.update(p, freq.getOrElse(p, 0L) + cnt)
          j += 1
        }
        i += 1
      }
    }
    val singles = freq.keys.filter(symLen(_) == 1).toSeq.sorted
    // Singles are the guaranteed-coverage floor and are never pruned, so a
    // vocabSize below |singles| is unreachable: the prune loop would clamp
    // keepMultis to 0 and spin forever with vocab.size pinned at |singles|.
    // Fail loudly instead of hanging the driver.
    require(vocabSize >= singles.size,
      s"vocabSize=$vocabSize is below the single-symbol floor of " +
        s"${singles.size} pieces (corpus charset + '$EndOfWord'); singles " +
        "are never pruned, so training cannot reach that size — raise " +
        s"vocabSize to at least ${singles.size}")
    val multis = freq.toSeq
      .filter { case (p, _) => symLen(p) > 1 }
      .sortBy { case (p, c) => (-c * symLen(p), p) }
      .take(math.max(0, seedSize - singles.size))
      .map(_._1)
    var vocab: Seq[String] = (singles ++ multis).sorted

    def mStep(counts: Map[String, Long]): Seq[(String, Double)] = {
      val total = math.max(1L, counts.values.sum)
      vocab.map { p =>
        // Laplace-style floor: a piece Viterbi chose zero times keeps
        // a tiny prob so the NEXT E-step can still reach it through a
        // changed neighborhood (standard EM smoothing; singles rely on
        // it to stay alive as the guaranteed-coverage floor)
        val c = math.max(1L, counts.getOrElse(p, 0L))
        p -> math.log(c.toDouble / total.toDouble)
      }
    }

    def eStep(scores: Seq[(String, Double)]): Map[String, Long] = {
      val m = UnigramEncode.model(scores, EndOfWord, unkScore)
      val counts = scala.collection.mutable.HashMap.empty[String, Long]
      types.foreach { case (w, cnt) =>
        UnigramEncode.segmentWord(w, m).foreach { p =>
          counts.update(p, counts.getOrElse(p, 0L) + cnt)
        }
      }
      counts.toMap
    }

    // uniform init over the seed (ln(1/|seed|)), then EM+prune rounds
    var scores: Seq[(String, Double)] =
      vocab.map(_ -> math.log(1.0 / vocab.size))
    var counts = eStep(scores)
    scores = mStep(counts)
    while (vocab.size > vocabSize) {
      val nSingles = singles.size
      val keepMultis =
        math.max(vocabSize - nSingles,
          math.floor((vocab.size - nSingles) * shrink).toInt)
      val kept = vocab.filter(symLen(_) > 1)
        .sortBy(p => (-counts.getOrElse(p, 0L), p))
        .take(math.max(0, keepMultis))
      vocab = (singles ++ kept).sorted
      counts = eStep(mStep(counts))
      scores = mStep(counts)
    }
    scores.sortBy(_._1)
  }

  /** [[train]] as a DataFrame: (piece, logprob) — the declared-query
    * surface (rows-only by the q171 rationale: an iterative EM argmax
    * has no SQL-expressible oracle; UnigramSpec pins determinism and
    * the worked segmentation instead).
    */
  def trainDf(
      df: DataFrame,
      textCol: String,
      vocabSize: Int,
      maxTypes: Int = 1 << 20,
      maxPieceSyms: Int = 8,
      seedSize: Int = 1 << 16,
      shrink: Double = 0.75): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    train(df, textCol, vocabSize, maxTypes, maxPieceSyms, seedSize, shrink)
      .toDF("piece", "logprob")
  }

  /** Map-only Viterbi encoder over a frozen (piece, logprob) table:
    * text → subword-piece array, evaluated in whole-stage codegen
    * against the broadcast table
    * (`org.apache.spark.sql.graft.NativeExprs.unigramEncode`). Null
    * text encodes to the empty array, matching [[Bpe.encodeNative]].
    */
  def encodeNative(
      spark: org.apache.spark.sql.SparkSession,
      pieces: Seq[(String, Double)],
      unkScore: Double = -100.0): Column => Column = {
    val bc = spark.sparkContext.broadcast(
      UnigramEncode.model(pieces, EndOfWord, unkScore))
    c =>
      when(c.isNull, array().cast("array<string>"))
        .otherwise(org.apache.spark.sql.graft.NativeExprs.unigramEncode(c, bc))
  }

  /** Detokenization — identical to [[Bpe.decode]] by shared word
    * framing: concatenate pieces, each end-of-word marker becomes a
    * space, trailing space trimmed. decode ∘ encode reproduces the
    * tokenizer-normalized text exactly (q270 pins the round trip).
    */
  def decode(subwords: Column): Column = Bpe.decode(subwords)

  /** Deterministic (piece → token id) vocabulary: ids by lexicographic
    * piece order over the model table itself (the encoder can only
    * emit table pieces or unk singles, so the table IS the emittable
    * set — no corpus pass needed, unlike BPE's merge-closure).
    */
  def vocabOf(pieces: Seq[(String, Double)]): Seq[(String, Int)] =
    pieces.map(_._1).sorted.zipWithIndex

  private def symToId(vocab: Seq[(String, Int)]): Column =
    map_from_arrays(lit(vocab.map(_._1).toArray), lit(vocab.map(_._2).toArray))
  private def idToSym(vocab: Seq[(String, Int)]): Column =
    map_from_arrays(lit(vocab.map(_._2).toArray), lit(vocab.map(_._1).toArray))

  /** [[encodeNative]] composed with the vocabulary: text → token-id
    * array; unk-priced pieces outside the table encode as -1 — an
    * explicit UNK, never a silent drop (the [[Bpe.encodeToIds]]
    * contract).
    */
  def encodeToIds(
      spark: org.apache.spark.sql.SparkSession,
      pieces: Seq[(String, Double)],
      vocab: Seq[(String, Int)]): Column => Column = {
    val enc = encodeNative(spark, pieces)
    val m = symToId(vocab)
    c => transform(enc(c), s => coalesce(element_at(m, s), lit(-1)))
  }

  /** Token-id array → text ([[Bpe.decodeIds]] semantics: UNK ids
    * resolve to null and drop — lossy exactly where the stream was).
    */
  def decodeIds(vocab: Seq[(String, Int)]): Column => Column = {
    val inv = idToSym(vocab)
    c => decode(transform(c, i => element_at(inv, i)))
  }

  /** Name the trained encoder on the SQL surface:
    * `unigram_encode(text, 'name')` (GraftExtensions) resolves to
    * exactly this expression tree — the [[Bpe.registerSql]] pattern,
    * so the q260/q265 fertility/coverage audits run unchanged under
    * either tokenizer family by swapping the model name.
    */
  def registerSql(
      spark: org.apache.spark.sql.SparkSession,
      name: String,
      pieces: Seq[(String, Double)]): Unit =
    graft.functions.GraftModels.register(
      name, "unigram", encodeNative(spark, pieces))

  /** Register the full id surface under ONE model name:
    * `unigram_encode`, `unigram_encode_ids`, `unigram_decode`.
    */
  def registerIdsSql(
      spark: org.apache.spark.sql.SparkSession,
      name: String,
      pieces: Seq[(String, Double)]): Unit = {
    val vocab = vocabOf(pieces)
    registerSql(spark, name, pieces)
    graft.functions.GraftModels.register(
      name, "unigram_ids", encodeToIds(spark, pieces, vocab))
    graft.functions.GraftModels.register(
      name, "unigram_decode", decodeIds(vocab))
  }
}
