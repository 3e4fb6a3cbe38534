package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass Unicode-script profile of a document, shared by
  * org.apache.spark.sql.graft.ScriptProfileExpr — the
  * writing-system half of language identification (q97's n-gram
  * langId separates languages WITHIN a script; this separates
  * scripts, the cheap first gate a multilingual 100 TB corpus routes
  * on before any model runs). One code-point scan yields every
  * counter; classification precedence is digit → whitespace → script,
  * so the counts are disjoint and sum to the code-point length.
  *
  * Classes (chosen to be replayable as RE2 `\p{Script}` classes in
  * the DuckDB oracle — Java's `Character.UnicodeScript` and RE2 both
  * implement the Unicode Script property, so the sets agree):
  *  - latin / cyrillic / greek / arabic: that script's code points
  *    (accented letters included; ARABIC includes the Arabic-Indic
  *    digits U+0660.., which RE2 `\p{Arabic}` also matches)
  *  - cjk: HAN | HIRAGANA | KATAKANA | HANGUL, one class — corpus
  *    routing treats the CJK block as one pipeline
  *  - digit: ASCII '0'-'9' only (script COMMON, counted before the
  *    script switch; the oracle's `[0-9]`)
  *  - space: the engine's whitespace class `[ \t\n\f\r]`
  *  - other: everything else (punctuation and symbols are script
  *    COMMON and land here, as in RE2 where they match no `\p{Script}`)
  *
  * Per-doc state is eight counters — map-only at any corpus scale.
  */
object ScriptProfile {

  def profile(text: UTF8String): InternalRow = {
    val s = text.toString
    var latin = 0L; var cyr = 0L; var greek = 0L; var arab = 0L
    var cjk = 0L; var digit = 0L; var space = 0L; var other = 0L
    var i = 0
    val n = s.length
    while (i < n) {
      val cp = s.codePointAt(i)
      if (cp >= '0' && cp <= '9') digit += 1
      else if (cp == ' ' || cp == '\t' || cp == '\n' || cp == '\f' || cp == '\r') space += 1
      else {
        import Character.UnicodeScript
        UnicodeScript.of(cp) match {
          case UnicodeScript.LATIN    => latin += 1
          case UnicodeScript.CYRILLIC => cyr += 1
          case UnicodeScript.GREEK    => greek += 1
          case UnicodeScript.ARABIC   => arab += 1
          case UnicodeScript.HAN | UnicodeScript.HIRAGANA |
               UnicodeScript.KATAKANA | UnicodeScript.HANGUL => cjk += 1
          case _ => other += 1
        }
      }
      i += Character.charCount(cp)
    }
    new GenericInternalRow(
      Array[Any](latin, cyr, greek, arab, cjk, digit, space, other))
  }
}
