package graft.functions

import java.math.{BigDecimal => JBigDecimal}
import java.security.MessageDigest

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.unsafe.types.UTF8String

/** Primitive kernel for per-row Naive Bayes scoring, shared by
  * org.apache.spark.sql.graft.NbScoreExpr.
  *
  * Value-identical to the batch pipeline in Classify.nbScore (explode →
  * broadcast model joins → DECIMAL(18,6) sum → windowed argmax), but
  * evaluated in ONE pass per row against a broadcast model — no explode,
  * no join, no aggregation state. That makes the classifier gate
  * STREAMABLE (StreamingCorpus.nbGate): a map-only expression needs no
  * watermark and no shuffle.
  *
  * Parity mechanics (the LmScore discipline):
  *  - per-(bucket, label) log-probs, the unseen-bucket defaults, and the
  *    priors are collected from the trained model's DECIMAL(18,6)
  *    columns as exact micro-units (unscaledValue) — no re-rounding, so
  *    the kernel sums exactly what the batch side sums;
  *  - summation is exact long arithmetic (the DECIMAL twin);
  *  - the argmax scans labels in ascending order keeping strict maxima,
  *    replaying the batch (score desc, label asc) tie-break;
  *  - the md5 feature bucket recomputes Classify.bucketOf byte-for-byte:
  *    first 4 digest bytes as an unsigned 32-bit value, mod vocab.
  */
object NbScore {

  /** Broadcast model state: labels ascending; per-bucket micro log-prob
    * arrays indexed like `labels`; defaults/priors per label. Bounded by
    * vocab × |labels| regardless of corpus size.
    */
  final case class MicroModel(
      labels: Array[String],
      bucketLp: java.util.HashMap[java.lang.Long, Array[Long]],
      defaults: Array[Long],
      priors: Array[Long],
      vocab: Int)
      extends Serializable

  /** md5-derived feature bucket — byte-level twin of Classify.bucketOf
    * (`conv(substring(md5(term),1,8),16,10) % vocab`): the first 8 hex
    * chars of md5 are the first 4 digest bytes, read as unsigned 32-bit.
    */
  def bucket(md: MessageDigest, term: String, vocab: Int): Long = {
    md.reset()
    val d = md.digest(term.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val u = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    u % vocab
  }

  /** Score one document: (pred label, score) as an InternalRow. Never
    * null — token-less docs score on priors alone, like the batch side.
    */
  def score(text: UTF8String, m: MicroModel): InternalRow = {
    val nl = m.labels.length
    val sums = new Array[Long](nl)
    System.arraycopy(m.priors, 0, sums, 0, nl)
    // parity with split(lower(text), ' ') + non-empty filter
    val lowered = text.toLowerCase.toString
    val md = MessageDigest.getInstance("MD5")
    var start = 0
    val len = lowered.length
    while (start <= len) {
      var end = lowered.indexOf(' ', start)
      if (end < 0) end = len
      if (end > start) {
        val b = bucket(md, lowered.substring(start, end), m.vocab)
        val arr = m.bucketLp.get(java.lang.Long.valueOf(b))
        var i = 0
        if (arr == null) {
          while (i < nl) { sums(i) += m.defaults(i); i += 1 }
        } else {
          while (i < nl) { sums(i) += arr(i); i += 1 }
        }
      }
      start = end + 1
    }
    var best = 0
    var i = 1
    while (i < nl) {
      if (sums(i) > sums(best)) best = i
      i += 1
    }
    val score = JBigDecimal.valueOf(sums(best), 6).doubleValue()
    new GenericInternalRow(
      Array[Any](UTF8String.fromString(m.labels(best)), score))
  }
}
