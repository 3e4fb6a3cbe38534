package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Misra-Gries heavy-hitter sketch as a typed `Aggregator`: at most `k`
  * (item, weight) counters summarizing an arbitrarily large stream.
  *
  * Guarantees (classic, and preserved under Spark's partial/merge tree by
  * the mergeable-summaries argument of Agarwal et al., PODS'12):
  *   - estimate(x) ≤ true_count(x) ≤ estimate(x) + n/(k+1)
  *   - every item with true_count > n/(k+1) is IN the sketch (no false
  *     negatives above the threshold), for ANY merge order — which is
  *     what makes the two-phase exact heavy-hitter plan in
  *     `ScaleOps.heavyHitters` deterministic even though the sketch
  *     contents themselves depend on task scheduling.
  *
  * Why not `GROUP BY item` at 100 TB: the vocabulary of a web corpus is
  * billions of distinct tokens/n-grams, so the full aggregate shuffles a
  * row per distinct item. The sketch is one map-side pass with O(k)
  * state per partition and a single ≤k-entry row at the driver; the
  * exact follow-up pass then touches only the ≤k candidates.
  */
class MisraGries(k: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {
  require(k > 0, "k must be positive")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(buf: Map[String, Long], item: String): Map[String, Long] = {
    if (item == null) buf
    else buf.get(item) match {
      case Some(c) => buf.updated(item, c + 1)
      case None if buf.size < k => buf.updated(item, 1L)
      case None =>
        // decrement-all step: drop counters that hit zero
        buf.collect { case (i, c) if c > 1 => i -> (c - 1) }
    }
  }

  /** Mergeable-summaries merge: sum counts, then shrink back to k
    * counters by subtracting the (k+1)-th largest combined count from
    * everything and dropping non-positives.
    */
  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    val combined = (a.keySet ++ b.keySet).iterator
      .map(i => i -> (a.getOrElse(i, 0L) + b.getOrElse(i, 0L))).toMap
    if (combined.size <= k) combined
    else {
      val kth = combined.values.toIndexedSeq.sorted(Ordering[Long].reverse)(k)
      combined.collect { case (i, c) if c > kth => i -> (c - kth) }
    }
  }

  override def finish(buf: Map[String, Long]): Map[String, Long] = buf

  override def bufferEncoder: Encoder[Map[String, Long]] = MisraGries.mapEncoder
  override def outputEncoder: Encoder[Map[String, Long]] = MisraGries.mapEncoder
}

object MisraGries {
  private[functions] val mapEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()

  /** Column aggregate: Misra-Gries sketch of a STRING column as
    * map<item, weight>.
    */
  def sketch(col: Column, k: Int): Column = udaf(new MisraGries(k)).apply(col)
}
