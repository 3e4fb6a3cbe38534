package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding vocabulary training and encoding — the tokenizer-
  * construction step of an LLM data pipeline (reference scope: the
  * north-star text-analysis family; token COUNTING exists as
  * `TextAnalysis.tokenCount`/`subwordCount`, this builds the subword
  * vocabulary itself).
  *
  * Scale shape (the standard one): BPE training operates on the WORD-TYPE
  * frequency table, not the token stream — one distributed
  * explode+groupBy collapses the corpus (the only pass over data), and
  * the merge loop runs driver-side over the compact type table, exactly
  * like k-means centroids ride the driver. The type table is capped at
  * `maxTypes` by (count desc, word) — bounded driver state at any corpus
  * size; rare tail types contribute pair counts ≈ their own frequency
  * and are the standard sacrifice.
  *
  * Determinism: the merge chosen each step is the max-count pair with
  * ties broken lexicographically on (left, right); type iteration order
  * never matters because counts are summed before the argmax. Training
  * twice on the same corpus is bit-identical (spec-pinned), but there is
  * no SQL-expressible oracle for an iterative argmax — the declared
  * query is rows-only by necessity, pinned by the classic
  * low/lower/newest/widest worked example (Sennrich et al. 2016, §3.2)
  * in BpeSpec.
  */
object Bpe {

  /** End-of-word marker appended to every word's symbol sequence, so
    * merges distinguish word-final from word-internal pairs ("est</w>"
    * vs "est"). The paper's formulation.
    */
  val EndOfWord = "</w>"

  /** Train `numMerges` BPE merges over the corpus.
    *
    * Returns a local, ordered merge table — broadcast state for
    * [[encodeUdf]], small by construction (numMerges rows). Use
    * [[trainDf]] for the DataFrame form (the declared-query surface).
    *
    * @param maxTypes cap on distinct word types collected to the driver
    *                 (top by count, ties to the lexicographically
    *                 smaller word — deterministic at any parallelism)
    */
  def train(
      df: DataFrame,
      textCol: String,
      numMerges: Int,
      maxTypes: Int = 1 << 20,
      minPairCount: Long = 2L): Seq[(String, String)] = {
    val types: Array[(Array[String], Long)] = df
      .select(explode(TextAnalysis.tokens(lower(col(textCol)))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("w"))
      .limit(maxTypes)
      .collect()
      .map(r => (r.getString(0).map(_.toString).toArray :+ EndOfWord, r.getLong(1)))

    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var work = types
    var done = false
    while (merges.size < numMerges && !done) {
      val pairCounts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      work.foreach { case (syms, cnt) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          pairCounts.update(p, pairCounts.getOrElse(p, 0L) + cnt)
          i += 1
        }
      }
      if (pairCounts.isEmpty) done = true
      else {
        // max count, ties to the lexicographically smallest (left, right)
        val best = pairCounts.toSeq.minBy { case ((l, r), c) => (-c, l, r) }
        if (best._2 < minPairCount) done = true
        else {
          val (l, r) = best._1
          merges += ((l, r))
          val joined = l + r
          work = work.map { case (syms, cnt) =>
            val out = scala.collection.mutable.ArrayBuffer.empty[String]
            var i = 0
            while (i < syms.length) {
              if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
                out += joined; i += 2
              } else { out += syms(i); i += 1 }
            }
            (out.toArray, cnt)
          }
        }
      }
    }
    merges.toSeq
  }

  /** [[train]] as a DataFrame: (rank, left, right, merged) — the
    * declared-query surface (q171; rows-only: an iterative argmax has no
    * SQL-expressible oracle, so BpeSpec pins the worked example and
    * bit-identical retraining instead).
    */
  def trainDf(
      df: DataFrame,
      textCol: String,
      numMerges: Int,
      maxTypes: Int = 1 << 20,
      minPairCount: Long = 2L): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    train(df, textCol, numMerges, maxTypes, minPairCount)
      .zipWithIndex
      .map { case ((l, r), i) => (i, l, r, l + r) }
      .toDF("rank", "left", "right", "merged")
  }

  /** Map-only BPE encoder: applies the trained merges to each
    * whitespace token (lowest-rank applicable merge first — the
    * standard greedy-by-priority encode), returning the subword array
    * column. The merge-rank map is closure-broadcast; no shuffle, no
    * per-row driver work. A Scala UDF is the honest shape here — no
    * built-in expresses an iterative priority merge, and the per-token
    * loop is primitive string work (same judgment call as the
    * multimodal codecs).
    */
  /** Native codegen twin of [[encodeUdf]]: the same greedy merge loop
    * as a whole-stage-codegen expression over an EXPLICITLY broadcast
    * rank table (`functions.BpeEncode`, the NbScore pattern) — no
    * ScalaUDF encoder round-trip per row, no closure re-serialization
    * per task. Null text encodes to the empty array, matching the UDF.
    * Prefer this for corpus-wide encoding; the UDF twin stays as the
    * readable semantic reference and parity anchor.
    */
  def encodeNative(
      spark: org.apache.spark.sql.SparkSession,
      merges: Seq[(String, String)]): Column => Column = {
    val bc = spark.sparkContext.broadcast(
      graft.functions.BpeEncode.model(merges, EndOfWord))
    c =>
      when(c.isNull, array().cast("array<string>"))
        .otherwise(org.apache.spark.sql.graft.NativeExprs.bpeEncode(c, bc))
  }

  /** Name [[encodeNative]]'s trained closure on the SQL surface:
    * `bpe_encode(text, 'name')` (GraftExtensions) resolves to exactly
    * this expression tree — one semantics, reachable from a config SQL.
    */
  def registerSql(
      spark: org.apache.spark.sql.SparkSession,
      name: String,
      merges: Seq[(String, String)]): Unit =
    graft.functions.GraftModels.register(name, "bpe", encodeNative(spark, merges))

  /** Detokenization — the inverse of [[encodeNative]]/[[encodeUdf]] at
    * the subword level, and deliberately MODEL-FREE: encoding never
    * loses a character (every merge concatenates what it consumed), so
    * concatenating the subwords and turning each end-of-word marker
    * into a space reconstructs the tokenizer-normalized text exactly
    * (lowercased, whitespace collapsed to single spaces — the
    * round-trip BpeSpec pins: decode ∘ encode = `array_join(tokens(
    * lower(text)), ' ')`). Pure codegen'd column arithmetic, map-only.
    *
    * Boundary: a document whose TEXT contains the literal marker
    * "</w>" inside a whitespace token can merge its way to a symbol
    * equal to the marker, which decode reads as a word boundary — the
    * standard ambiguity of marker-based BPE (Sennrich et al. 2016 use
    * the same convention). Pipelines feeding adversarial text should
    * scrub the marker first.
    */
  def decode(subwords: Column): Column =
    rtrim(regexp_replace(
      array_join(subwords, ""),
      java.util.regex.Pattern.quote(EndOfWord), " "))

  /** Deterministic (symbol → token id) vocabulary: the DISTINCT
    * subwords the trained model actually emits over the corpus,
    * id-assigned in lexicographic order — any engine that can sort
    * strings reproduces the mapping. One distributed encode +
    * distinct; the collect is model state bounded by |alphabet| +
    * numMerges, the kmeans-centroid rationale, NOT data.
    */
  def vocabFromCorpus(
      df: DataFrame,
      textCol: String,
      merges: Seq[(String, String)]): Seq[(String, Int)] = {
    val enc = encodeNative(df.sparkSession, merges)
    df.select(explode(enc(col(textCol))).as("s"))
      .distinct().orderBy("s")
      .collect().map(_.getString(0)).toSeq.zipWithIndex
  }

  // vocab as a foldable map literal: map_from_arrays over two array
  // literals is deterministic + foldable, so Catalyst collapses it to
  // ONE map value at optimization time — per-row cost is the hash
  // lookup, never map construction.
  private def symToId(vocab: Seq[(String, Int)]): Column =
    map_from_arrays(lit(vocab.map(_._1).toArray), lit(vocab.map(_._2).toArray))
  private def idToSym(vocab: Seq[(String, Int)]): Column =
    map_from_arrays(lit(vocab.map(_._2).toArray), lit(vocab.map(_._1).toArray))

  /** [[encodeNative]] composed with the vocabulary: text → token-id
    * array (the shape q109 packs). Subwords outside the vocabulary
    * (unseen base characters in post-training data) encode as -1 — an
    * explicit UNK, never a silent drop.
    */
  def encodeToIds(
      spark: org.apache.spark.sql.SparkSession,
      merges: Seq[(String, String)],
      vocab: Seq[(String, Int)]): Column => Column = {
    val enc = encodeNative(spark, merges)
    val m = symToId(vocab)
    c => transform(enc(c), s => coalesce(element_at(m, s), lit(-1)))
  }

  /** Token-id array → text: the id→symbol map then [[decode]]. UNK ids
    * (-1, or any id outside the vocabulary) resolve to null and are
    * dropped by the join — decode of a lossy stream is lossy exactly
    * where the stream was.
    */
  def decodeIds(vocab: Seq[(String, Int)]): Column => Column = {
    val inv = idToSym(vocab)
    c => decode(transform(c, i => element_at(inv, i)))
  }

  /** Register the full id surface under ONE model name:
    * `bpe_encode(text, 'name')` (subwords), `bpe_encode_ids(text,
    * 'name')` and `bpe_decode(ids, 'name')` (GraftExtensions) — the
    * round trip a packing/inspection pipeline needs from a config SQL.
    */
  def registerIdsSql(
      spark: org.apache.spark.sql.SparkSession,
      name: String,
      merges: Seq[(String, String)],
      vocab: Seq[(String, Int)]): Unit = {
    registerSql(spark, name, merges)
    graft.functions.GraftModels.register(
      name, "bpe_ids", encodeToIds(spark, merges, vocab))
    graft.functions.GraftModels.register(name, "bpe_decode", decodeIds(vocab))
  }

  def encodeUdf(merges: Seq[(String, String)]): Column => Column = {
    val ranks: Map[(String, String), Int] = merges.zipWithIndex.toMap
    val enc = udf { (text: String) =>
      if (text == null) Array.empty[String]
      else
        text.trim.toLowerCase.split(graft.operators.TextAnalysis.WhitespaceSplit).filter(_.nonEmpty).flatMap { w =>
          var syms = (w.map(_.toString) :+ EndOfWord).toArray
          var go = true
          while (go && syms.length > 1) {
            var bestRank = Int.MaxValue
            var bestAt = -1
            var i = 0
            while (i < syms.length - 1) {
              val rk = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
              if (rk < bestRank) { bestRank = rk; bestAt = i }
              i += 1
            }
            if (bestAt < 0) go = false
            else {
              val out = new Array[String](syms.length - 1)
              Array.copy(syms, 0, out, 0, bestAt)
              out(bestAt) = syms(bestAt) + syms(bestAt + 1)
              Array.copy(syms, bestAt + 2, out, bestAt + 1, syms.length - bestAt - 2)
              syms = out
            }
          }
          syms
        }
    }
    c => enc(c)
  }
}
