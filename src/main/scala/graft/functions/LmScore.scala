package graft.functions

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.unsafe.types.UTF8String

/** Primitive kernel for per-row char-ngram LM scoring, shared by
  * org.apache.spark.sql.graft.LmScoreExpr.
  *
  * Value-identical to the batch pipeline in
  * TextAnalysis.ngramLogProbScore (explode → model join → 6dp round →
  * DECIMAL(18,6) sum → double divide → 4dp round), but evaluated in ONE
  * pass per row against a broadcast model — no explode, no join, no
  * aggregation state. That is what makes the perplexity gate STREAMABLE:
  * a map-only expression needs no watermark and no shuffle.
  *
  * Parity mechanics:
  *  - per-gram log-prob is pre-rounded on the DRIVER into exact
  *    micro-units (long, 1e-6) when the model map is built
  *    ([[LmScore.microModel]]) — the same round(ln(cnt/total), 6) the
  *    batch side computes;
  *  - summation is exact long arithmetic (the DECIMAL(18,6) twin);
  *  - the final divide + HALF_UP 4dp round replays Spark's
  *    round(double, 4) semantics.
  */
object LmScore {

  /** Score one document: mean 6dp-rounded log-prob of its char n-grams,
    * 4dp-rounded; null (None encoded as NaN-free null by the expression)
    * when the text has no grams. `defaultMicro` is the smoothed
    * log-prob for grams absent from the model.
    */
  def score(
      text: UTF8String,
      // java.lang.Long, NOT scala Long: a scala-Long-valued java map
      // silently unboxes a missing key's null to 0 — the unseen-gram
      // branch would score 0 instead of the smoothed default
      model: java.util.HashMap[String, java.lang.Long],
      n: Int,
      defaultMicro: Long): java.lang.Double = {
    // parity with the Column path lower(trim(text)): functions.trim
    // strips ONLY ' ' (0x20) — UTF8String.trim() strips all <= 0x20 and
    // would drop a trailing newline's grams; and substr/length count
    // CODE POINTS, so gram assembly walks code points, not chars
    val lowered = text.toLowerCase.toString
    var st = 0
    var en = lowered.length
    while (st < en && lowered.charAt(st) == ' ') st += 1
    while (en > st && lowered.charAt(en - 1) == ' ') en -= 1
    val cps = lowered.substring(st, en).codePoints().toArray
    val len = cps.length
    if (len < n) return null
    var sumMicro = 0L
    var i = 0
    val grams = len - n + 1
    while (i < grams) {
      val g = new String(cps, i, n)
      val lp = model.get(g)
      sumMicro += (if (lp == null) defaultMicro else lp.longValue())
      i += 1
    }
    // exact micro sum → double → /count → HALF_UP 4dp (Spark round twin)
    val avg = (sumMicro / 1e6) / grams
    JBigDecimal.valueOf(avg).setScale(4, RoundingMode.HALF_UP).doubleValue()
  }

  /** Driver-side model prep: (gram → count) rows + total occurrences →
    * gram → round(ln(cnt/total), 6) in exact micro-units. The map is
    * the broadcast state; char-ngram vocabularies are bounded, so it
    * stays broadcast-sized at any corpus scale.
    */
  def microModel(
      entries: Iterator[(String, Long)],
      total: Long): java.util.HashMap[String, java.lang.Long] = {
    require(total > 0, "empty model")
    val m = new java.util.HashMap[String, java.lang.Long]()
    entries.foreach { case (g, cnt) =>
      m.put(g, java.lang.Long.valueOf(micro(math.log(cnt.toDouble / total.toDouble))))
    }
    m
  }

  /** The smoothed default for unseen grams: round(ln(0.5/total), 6). */
  def defaultMicro(total: Long): Long =
    micro(math.log(0.5 / total.toDouble))

  private def micro(lp: Double): Long =
    JBigDecimal.valueOf(lp).setScale(6, RoundingMode.HALF_UP)
      .movePointRight(6).longValueExact()
}
