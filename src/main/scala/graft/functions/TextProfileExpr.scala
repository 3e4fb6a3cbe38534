package graft.functions

import java.math.RoundingMode

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass kernel computing every column of
  * graft.operators.TextAnalysis.annotate in one tokenization
  * (n_tokens, n_subwords, stopword_ratio, quality, lang_pred,
  * fingerprint), shared by org.apache.spark.sql.graft.TextProfileExpr.
  *
  * Each field is value-identical to its higher-order-function
  * formulation in TextAnalysis (pinned by TextAnalysisSpec):
  *  - tokenizer: trim + `\s+` split (token COUNT is case-insensitive, so
  *    one split of the lowercased text serves token stats, stopword and
  *    language lookups, and the fingerprint hashes alike)
  *  - n_subwords: count of `[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]` matches
  *  - stopword_ratio: lowercase membership in the default 10-word list,
  *    rounded HALF_UP to 4 places (matching functions.round)
  *  - quality: the 4-component score with the same clamps and rounding
  *  - lang_pred: stopword-profile argmax (+ CJK count for zh), ties to
  *    the first language in code order, "und" when all scores are 0
  *  - fingerprint: Σ xxhash64(token_p)·31^p with 64-bit wraparound,
  *    via the builtin's XXH64 (seed 42)
  */
object TextProfile {
  import org.apache.spark.sql.catalyst.expressions.XXH64

  private val SplitPattern = UTF8String.fromString(graft.operators.TextAnalysis.WhitespaceSplit)
  private val SubwordPattern = java.util.regex.Pattern.compile(
    "[A-Za-z]+|[0-9]+|[^A-Za-z0-9" + graft.operators.TextAnalysis.WhitespaceChars + "]")
  private val PunctChars = ".,!?;:'\"()[]{}-".toSet

  private def toSet(words: Seq[String]): java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String]()
    words.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  private val Stopwords = toSet(graft.operators.TextAnalysis.defaultStopwords)
  // language → profile set, in language-code order (the argmax tie-break)
  private val LangOrder: Array[String] =
    graft.operators.TextAnalysis.langProfiles.keys.toArray.sorted
  private val LangSets: Array[java.util.HashSet[UTF8String]] =
    LangOrder.map(l => toSet(graft.operators.TextAnalysis.langProfiles(l)))
  private val LangNames: Array[UTF8String] = LangOrder.map(UTF8String.fromString)
  private val Und = UTF8String.fromString("und")
  private val ZhIdx = LangOrder.indexOf("zh")

  private def round4(v: Double): Double =
    java.math.BigDecimal.valueOf(v).setScale(4, RoundingMode.HALF_UP).doubleValue()

  def profile(text: UTF8String): InternalRow = {
    val str = text.toString
    val nChars = str.codePointCount(0, str.length).toDouble

    // --- subword + punct + CJK counts: one scan each over the raw text
    var nSubwords = 0
    val m = SubwordPattern.matcher(str)
    while (m.find()) nSubwords += 1
    var nPunct = 0
    var cjk = 0
    var ci = 0
    while (ci < str.length) {
      val c = str.charAt(ci)
      if (PunctChars.contains(c)) nPunct += 1
      if (c >= 0x4e00 && c <= 0x9fff) cjk += 1 // CJK Unified Ideographs
      ci += 1
    }

    // --- one tokenization of the lowercased text
    val trimmedLower = text.toLowerCase.trim()
    val toks: Array[UTF8String] =
      if (trimmedLower.numBytes() == 0) Array.empty else trimmedLower.split(SplitPattern, -1)
    val nToks = toks.length

    var stopHits = 0
    val langHits = new Array[Int](LangOrder.length)
    var fp = 0L
    var pow = 1L
    var i = 0
    while (i < nToks) {
      val t = toks(i)
      if (Stopwords.contains(t)) stopHits += 1
      var l = 0
      while (l < LangSets.length) {
        if (LangSets(l).contains(t)) langHits(l) += 1
        l += 1
      }
      fp += XXH64.hashUnsafeBytes(t.getBaseObject, t.getBaseOffset, t.numBytes(), 42L) * pow
      pow *= 31L
      i += 1
    }

    // --- stopword ratio (unrounded feeds quality; rounded is the column)
    val sr = if (nToks == 0) 0.0 else stopHits.toDouble / nToks

    // --- quality score (same clamps as TextAnalysis.qualityScore)
    val lenScore = math.min(nChars / 100.0, 1.0)
    val punctRatio = if (nChars == 0) 0.0 else nPunct / nChars
    val punctScore = math.max(0.0, 1.0 - punctRatio * 5.0)
    val stopScore =
      if (sr >= 0.1 && sr <= 0.6) 1.0 else math.max(0.0, 1.0 - math.abs(sr - 0.35) * 2.0)
    val meanTokLen = if (nToks == 0) 0.0 else nChars / nToks
    val wordScore =
      if (meanTokLen >= 3.0 && meanTokLen <= 10.0) 1.0
      else math.max(0.0, 1.0 - math.abs(meanTokLen - 6.0) / 10.0)
    val quality = round4((lenScore + punctScore + stopScore + wordScore) / 4.0)

    // --- language argmax, ties to first in code order, "und" iff best = 0
    langHits(ZhIdx) += cjk
    var best = 0
    var bestIdx = -1
    var l = 0
    while (l < langHits.length) {
      if (langHits(l) > best) { best = langHits(l); bestIdx = l }
      l += 1
    }
    val lang = if (bestIdx < 0) Und else LangNames(bestIdx)

    new GenericInternalRow(Array[Any](nToks, nSubwords, round4(sr), quality, lang, fp))
  }
}

/** Column-level façade for the native text-profile expression. */
object TextProfileExpr {
  def apply(text: Column): Column =
    org.apache.spark.sql.graft.NativeExprs.textProfile(text)
}
