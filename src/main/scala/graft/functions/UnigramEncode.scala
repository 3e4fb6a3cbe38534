package graft.functions

import java.util.{HashMap => JHashMap}

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Primitive kernel for unigram-LM (SentencePiece-style, Kudo 2018)
  * Viterbi encoding, shared by
  * org.apache.spark.sql.graft.UnigramEncodeExpr.
  *
  * The BPE sibling ([[BpeEncode]]) segments by greedy merge priority;
  * this kernel segments each word by MAXIMUM total piece log-probability
  * over a frozen (piece, logprob) table — the other production
  * tokenizer family. Evaluated inside whole-stage codegen against a
  * broadcast piece table (no ScalaUDF round-trip, no closure
  * re-serialization per task), output directly in Catalyst's array
  * format.
  *
  * Word framing is the SAME symbol convention as BPE: the word's
  * characters plus one end-of-word marker symbol, so pieces like
  * "table</w>" are word-final and [[graft.operators.Bpe.decode]]
  * reconstructs text unchanged — the two tokenizer families share one
  * decode and one fertility/coverage audit surface.
  *
  * Determinism (the cross-engine oracle contract): the DP maximizes
  * the exact double sum of piece scores; on an exact score tie the
  * SHORTER back-pointer distance loses — i.e. the candidate starting
  * EARLIEST (longest final piece) wins. With scores chosen as exact
  * binary fractions (the fixture discipline) every sum, comparison,
  * and tie is bit-identical in any IEEE-754 engine, which is what lets
  * DuckDB replay the whole segmentation in a recursive CTE (q270).
  *
  * Unknown handling: a single symbol absent from the table scores
  * [[PieceModel.unkScore]] and surfaces AS ITS OWN PIECE — coverage is
  * total by construction (every word has at least the all-singles
  * path), degradation is visible (audits count the unk-priced pieces),
  * and nothing is silently dropped.
  */
object UnigramEncode {

  /** Broadcast state: piece → logprob, the end-of-word marker, the
    * maximum piece length IN SYMBOLS (chars, marker counts as one) so
    * the DP inner loop is bounded, and the unknown-single-symbol
    * score. Bounded by vocabulary size, independent of corpus size.
    */
  final case class PieceModel(
      scores: JHashMap[String, java.lang.Double],
      eow: String,
      maxSyms: Int,
      unkScore: Double)
      extends Serializable

  def model(
      pieces: Seq[(String, Double)],
      eow: String,
      unkScore: Double = -100.0): PieceModel = {
    require(pieces.nonEmpty, "piece table must be non-empty")
    val m = new JHashMap[String, java.lang.Double](pieces.size * 2)
    var maxSyms = 1
    pieces.foreach { case (p, lp) =>
      require(p.nonEmpty, "empty piece")
      m.put(p, java.lang.Double.valueOf(lp))
      val syms =
        if (p.endsWith(eow)) (p.length - eow.length) + 1 else p.length
      if (syms > maxSyms) maxSyms = syms
    }
    PieceModel(m, eow, maxSyms, unkScore)
  }

  /** Viterbi-segment ONE word's symbol array (chars + end-of-word
    * marker). Returns the piece strings in order. Positions are
    * 0-based: best(p) is the max score covering the first p symbols;
    * bp(p) the chosen start. Iterating j ascending with strict `>`
    * keeps the EARLIEST start on ties (longest final piece) — the
    * documented tie-break the oracle mirrors via first-index-of-max.
    */
  private def viterbi(syms: Array[String], m: PieceModel): Array[String] = {
    val n = syms.length
    val best = new Array[Double](n + 1)
    val bp = new Array[Int](n + 1)
    var p = 1
    while (p <= n) {
      var bestSc = Double.NegativeInfinity
      var bestJ = -1
      var j = math.max(0, p - m.maxSyms)
      while (j < p) {
        val sb = new java.lang.StringBuilder()
        var t = j
        while (t < p) { sb.append(syms(t)); t += 1 }
        val lp = m.scores.get(sb.toString)
        val sc =
          if (lp != null) best(j) + lp.doubleValue()
          else if (p - j == 1) best(j) + m.unkScore
          else Double.NaN
        if (!java.lang.Double.isNaN(sc) && sc > bestSc) { bestSc = sc; bestJ = j }
        j += 1
      }
      best(p) = bestSc
      bp(p) = bestJ
      p += 1
    }
    // backtrack
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var k = n
    while (k > 0) {
      val j = bp(k)
      val sb = new java.lang.StringBuilder()
      var t = j
      while (t < k) { sb.append(syms(t)); t += 1 }
      out += sb.toString
      k = j
    }
    out.reverseIterator.toArray
  }

  /** Segment one word string (no marker yet) into pieces. Exposed for
    * the driver-side EM trainer, which runs the SAME DP over the capped
    * word-type table — one segmentation semantics, not two.
    */
  def segmentWord(w: String, m: PieceModel): Array[String] = {
    val syms = new Array[String](w.length + 1)
    var ci = 0
    while (ci < w.length) { syms(ci) = String.valueOf(w.charAt(ci)); ci += 1 }
    syms(w.length) = m.eow
    viterbi(syms, m)
  }

  /** Encode one document: whitespace tokens (the SAME Java split as
    * the BPE kernel, so the two tokenizer families see identical
    * words), each Viterbi-segmented, pieces flattened in order.
    */
  def encode(text: UTF8String, m: PieceModel): ArrayData = {
    val words = text.toString.trim.toLowerCase
      .split(graft.operators.TextAnalysis.WhitespaceSplit)
    val out = new java.util.ArrayList[UTF8String]()
    var wi = 0
    while (wi < words.length) {
      val w = words(wi)
      if (w.nonEmpty) {
        val pieces = segmentWord(w, m)
        var pi = 0
        while (pi < pieces.length) {
          out.add(UTF8String.fromString(pieces(pi))); pi += 1
        }
      }
      wi += 1
    }
    new GenericArrayData(out.toArray(new Array[AnyRef](out.size())))
  }
}
