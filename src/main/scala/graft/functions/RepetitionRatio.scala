package graft.functions

import java.math.RoundingMode

import org.apache.spark.unsafe.types.UTF8String

/** Single-pass kernel for the repetition-ratio quality signal, shared by
  * org.apache.spark.sql.graft.RepetitionRatioExpr. Value-identical to
  * graft.operators.TextAnalysis.repetitionRatioHof (pinned by spec):
  * tokenize the lowercased trimmed text once, count total and DISTINCT
  * word n-grams, return round(1 − distinct/total, 6), or 0.0 below n
  * tokens.
  *
  * Distinctness is EXACT (not hash-based): tokens are interned to dense
  * int ids via one hash map, and an n-gram's identity is the tuple of
  * its ids — packed into a single Long for n ≤ 3 (21 bits per id ≫ any
  * real document's distinct-token count), a joined key string above.
  * This avoids the HOF formulation's per-gram string allocation
  * (array_join of every window) while computing the same set sizes.
  */
object RepetitionRatio {

  private val SplitPattern = UTF8String.fromString(graft.operators.TextAnalysis.WhitespaceSplit)

  private def round6(v: Double): Double =
    java.math.BigDecimal.valueOf(v).setScale(6, RoundingMode.HALF_UP).doubleValue()

  def ratio(text: UTF8String, n: Int): Double = {
    val trimmedLower = text.toLowerCase.trim()
    val toks: Array[UTF8String] =
      if (trimmedLower.numBytes() == 0) Array.empty
      else trimmedLower.split(SplitPattern, -1)
    val total = toks.length - (n - 1)
    if (total <= 0) return 0.0

    // intern tokens to dense ids (one map over the doc's tokens)
    val ids = new Array[Int](toks.length)
    val intern = new java.util.HashMap[UTF8String, Integer](toks.length * 2)
    var i = 0
    while (i < toks.length) {
      val seen = intern.get(toks(i))
      if (seen != null) ids(i) = seen.intValue()
      else {
        val id = intern.size()
        intern.put(toks(i), Integer.valueOf(id))
        ids(i) = id
      }
      i += 1
    }

    var distinct = 0
    if (n <= 3 && intern.size() < (1 << 21)) {
      val grams = new java.util.HashSet[java.lang.Long](total * 2)
      i = 0
      while (i < total) {
        var key = 0L
        var j = 0
        while (j < n) { key = (key << 21) | ids(i + j).toLong; j += 1 }
        if (grams.add(java.lang.Long.valueOf(key))) distinct += 1
        i += 1
      }
    } else {
      val grams = new java.util.HashSet[String](total * 2)
      val sb = new java.lang.StringBuilder()
      i = 0
      while (i < total) {
        sb.setLength(0)
        var j = 0
        while (j < n) { sb.append(ids(i + j)).append(','); j += 1 }
        if (grams.add(sb.toString)) distinct += 1
        i += 1
      }
    }
    round6(1.0 - distinct.toDouble / total)
  }
}

/** Column-level façade for the native repetition-ratio expression. */
object RepetitionRatioExpr {
  def apply(text: org.apache.spark.sql.Column, n: Int): org.apache.spark.sql.Column =
    org.apache.spark.sql.graft.NativeExprs.repetitionRatio(text, n)
}
