package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** One scored candidate: (id, score). */
final case class Scored(id: Long, score: Double)

/** Bounded top-k aggregate: keeps the k highest-scored candidates per
  * group, ordered by (score desc, id asc) — the merge-safe, map-side-
  * combinable alternative to `row_number().over(Window)` top-k.
  *
  * Why it matters at 100 TB: a window formulation shuffles EVERY
  * candidate row to its group's reducer and buffers the group before
  * ranking; this Aggregator's partial aggregation collapses candidates
  * to ≤ k per group per map task BEFORE the shuffle, so the exchange
  * carries k×tasks rows per group instead of all of them. Same
  * mechanics as the KMV [[BottomKSketch]]; deterministic regardless of
  * row order, partitioning, and merge order.
  */
class TopKByScore(k: Int) extends Aggregator[Scored, Array[Scored], Array[Scored]] {
  require(k > 0, "k must be positive")

  override def zero: Array[Scored] = Array.empty

  // buf kept sorted by (score desc, id asc), length ≤ k
  private def worseThanLast(buf: Array[Scored], s: Scored): Boolean = {
    val last = buf(buf.length - 1)
    s.score < last.score || (s.score == last.score && s.id > last.id)
  }

  private def insert(buf: Array[Scored], s: Scored): Array[Scored] =
    if (buf.length >= k && worseThanLast(buf, s)) buf
    else {
      val grown = (buf :+ s).sortWith((a, b) =>
        a.score > b.score || (a.score == b.score && a.id < b.id))
      if (grown.length > k) grown.take(k) else grown
    }

  override def reduce(buf: Array[Scored], value: Scored): Array[Scored] = insert(buf, value)

  override def merge(a: Array[Scored], b: Array[Scored]): Array[Scored] =
    b.foldLeft(a)(insert)

  override def finish(buf: Array[Scored]): Array[Scored] = buf

  override def bufferEncoder: Encoder[Array[Scored]] = TopKByScore.arrayEncoder
  override def outputEncoder: Encoder[Array[Scored]] = TopKByScore.arrayEncoder
}

object TopKByScore {

  private[functions] val arrayEncoder: Encoder[Array[Scored]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Scored]]()

  /** Column aggregate over (id LONG, score DOUBLE) columns; returns
    * array<struct<id,score>> of the k best, ordered.
    */
  def topK(id: Column, score: Column, k: Int): Column = {
    implicit val enc: Encoder[Scored] = Encoders.product[Scored]
    udaf(new TopKByScore(k)).apply(id, score)
  }
}
