package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass kernel for the Gopher-style repetition/quality counters
  * (Rae et al. 2021, arXiv:2112.11446, Table A1), shared by
  * org.apache.spark.sql.graft.GopherSignalsExpr. One tokenization of the
  * lowercased trimmed text yields every raw counter; the fraction
  * columns (and the pass/fail gate) are derived in plain Column
  * arithmetic by graft.operators.TextAnalysis.gopherSignals so the
  * DuckDB oracle can replay them bit-for-bit.
  *
  * Counters (all over words = `\s+` tokens of lower(trim(text)); "word
  * chars" = characters of a word, separators excluded):
  *  - word_count, word_chars (Σ per-word char counts)
  *  - alpha_words: words containing ≥1 ASCII letter (already lowered,
  *    so `[a-z]` — the documented ASCII reading of the paper's
  *    "alphabetic character", chosen to match RE2's `[a-z]` exactly)
  *  - hash_chars / ellipses: `#` characters and non-overlapping
  *    leftmost-first `...` occurrences (the paper's symbol counters)
  *  - topN_chars (n = 2, 3, 4): occurrences × word-chars of the most
  *    frequent word n-gram; ties break to the BYTEWISE-smallest gram —
  *    UTF8String binary order, identical to DuckDB's UTF-8 collation
  *  - dup5_chars: Σ over 5-grams seen more than once of
  *    (occurrences − 1) × word-chars — the repeated-gram char mass
  *    beyond each gram's first occurrence. Overlapping repeats can
  *    double-count a character, so the derived fraction is clamped to 1
  *    downstream (documented upper bound of the paper's exact-coverage
  *    metric, which needs per-character attribution).
  *
  * An n-gram's identity is its space-joined text; per-doc state is one
  * hash map per n over the doc's own grams — bounded by document
  * length, nothing corpus-wide, so the operator stays a map-only stage
  * at any corpus scale.
  */
object GopherSignals {

  private val SplitPattern = UTF8String.fromString(graft.operators.TextAnalysis.WhitespaceSplit)
  private val Space = UTF8String.fromString(" ")

  /** counts(0) = occurrences, counts(1) = word-chars of the gram */
  private final class GramStat(val chars: Long) { var count: Long = 0L }

  def signals(text: UTF8String): InternalRow = {
    val t = text.toLowerCase.trim()
    val toks: Array[UTF8String] =
      if (t.numBytes() == 0) Array.empty else t.split(SplitPattern, -1)
    val wc = toks.length

    var wchars = 0L
    var alphaWords = 0
    val tokChars = new Array[Int](wc)
    var i = 0
    while (i < wc) {
      val nc = toks(i).numChars()
      tokChars(i) = nc
      wchars += nc
      if (hasAsciiLetter(toks(i))) alphaWords += 1
      i += 1
    }

    // '#' and non-overlapping '...' over the trimmed lowered text.
    // ASCII bytes are unambiguous in UTF-8 (continuation bytes have the
    // high bit set), so a byte scan is exact.
    val bytes = t.getBytes
    var hashChars = 0L
    var ellipses = 0L
    i = 0
    while (i < bytes.length) {
      if (bytes(i) == '#') hashChars += 1
      if (bytes(i) == '.' && i + 2 < bytes.length &&
        bytes(i + 1) == '.' && bytes(i + 2) == '.') {
        ellipses += 1
        i += 3
      } else i += 1
    }

    val topChars = new Array[Long](3) // n = 2, 3, 4
    var dup5 = 0L
    var n = 2
    while (n <= 5) {
      val total = wc - (n - 1)
      if (total > 0) {
        val grams = new java.util.HashMap[UTF8String, GramStat](total * 2)
        i = 0
        while (i < total) {
          var gchars = 0L
          var j = 0
          while (j < n) { gchars += tokChars(i + j); j += 1 }
          val gram = UTF8String.concatWs(Space, java.util.Arrays.copyOfRange(toks, i, i + n): _*)
          var stat = grams.get(gram)
          if (stat == null) { stat = new GramStat(gchars); grams.put(gram, stat) }
          stat.count += 1
          i += 1
        }
        if (n <= 4) {
          // most frequent gram; ties to the bytewise-smallest gram
          var bestCount = 0L
          var bestGram: UTF8String = null
          var bestChars = 0L
          val it = grams.entrySet().iterator()
          while (it.hasNext) {
            val e = it.next()
            val c = e.getValue.count
            if (c > bestCount || (c == bestCount && e.getKey.compareTo(bestGram) < 0)) {
              bestCount = c
              bestGram = e.getKey
              bestChars = e.getValue.chars
            }
          }
          topChars(n - 2) = bestCount * bestChars
        } else {
          val it = grams.values().iterator()
          while (it.hasNext) {
            val stat = it.next()
            if (stat.count > 1) dup5 += (stat.count - 1) * stat.chars
          }
        }
      }
      n += 1
    }

    new GenericInternalRow(Array[Any](
      wc, wchars, alphaWords, hashChars, ellipses,
      topChars(0), topChars(1), topChars(2), dup5))
  }

  private def hasAsciiLetter(tok: UTF8String): Boolean = {
    val b = tok.getBytes
    var i = 0
    while (i < b.length) {
      if (b(i) >= 'a' && b(i) <= 'z') return true
      i += 1
    }
    false
  }
}
