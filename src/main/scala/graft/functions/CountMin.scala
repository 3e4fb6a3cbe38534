package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Count-Min sketch (Cormode & Muthukrishnan 2005) as a typed
  * `Aggregator` — a depth×width grid of counters, each row j counting
  * under an independent hash; the point estimate for an item is the
  * MIN over its depth cells. Guarantees (n = total insertions):
  * estimate ≥ true count always (one-sided), and ≤ true + εn with
  * probability 1−δ for width = ⌈e/ε⌉, depth = ⌈ln 1/δ⌉.
  *
  * What it buys at 100 TB: heavy-hitter frequency estimation in ONE
  * pass with O(depth·width) state per group — the distributed-combine
  * shape (map-side partial sketches, elementwise-sum merge) that an
  * exact groupBy-count can't match when the item domain doesn't fit
  * anywhere. Complements the exact Misra-Gries surface (q151,
  * `frequent_items`): MG keeps a bounded candidate LIST (no false
  * negatives above n/(k+1)); CMS answers point queries about ANY item
  * after the fact and merges across corpora by plain vector addition —
  * the state a streaming/incremental twin persists.
  *
  * ENGINE-REPLAYABLE by construction: cell row j for item x is
  * `('0x' || first-8-hex of md5(j || ':' || x)) % width` — the same
  * md5-prefix discipline as the engine's samplers (ScaleOps) and the
  * NB feature hash (q175), so DuckDB can rebuild the ENTIRE grid and
  * every estimate with plain SQL, giving the q211 sketch a FULL hash
  * oracle at production parameters (unlike seeded-hash sketches à la
  * q25/q118, which no other engine can reproduce).
  *
  * The estimate side deliberately stays on the DECLARATIVE surface:
  * [[CountMin.estimate]] composes built-in md5/conv/element_at columns
  * (codegen'd, broadcastable), so probing a finished sketch never
  * leaves Catalyst.
  *
  * EXTENSION (no reference counterpart — the reference has no UDAFs,
  * SURVEY.md §2 "UDF/UDAF/UDTF: none").
  */
class CountMin(depth: Int, width: Int)
    extends Aggregator[String, Array[Long], Array[Long]] {
  require(depth >= 1 && depth <= 16, "depth must be in 1..16")
  require(width >= 2 && width <= (1 << 20), "width must be in 2..2^20")

  /** Empty zero (not a full grid): Spark's partial aggregation clones
    * the zero per group; materializing depth×width longs only on first
    * touch keeps empty/rare groups cheap.
    */
  override def zero: Array[Long] = Array.empty

  override def reduce(buf: Array[Long], value: String): Array[Long] = {
    val b = if (buf.length == 0) new Array[Long](depth * width) else buf
    if (value != null) {
      var j = 0
      while (j < depth) {
        b(j * width + CountMin.bucket(j, value, width)) += 1L
        j += 1
      }
    }
    b
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
    if (a.length == 0) b
    else if (b.length == 0) a
    else {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }

  /** Finished sketches are always full-size (empty groups -> all-zero
    * grid) so downstream element_at probing never needs a length guard.
    */
  override def finish(buf: Array[Long]): Array[Long] =
    if (buf.length == 0) new Array[Long](depth * width) else buf

  override def bufferEncoder: Encoder[Array[Long]] = CountMin.longArrayEncoder
  override def outputEncoder: Encoder[Array[Long]] = CountMin.longArrayEncoder
}

object CountMin {

  private[functions] val longArrayEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()

  private val digestTl: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** Row-j cell index for an item: first 32 md5 bits of "j:item"
    * (equal to parsing the first 8 hex chars) mod width — the exact
    * arithmetic [[estimate]] and the DuckDB oracle replay.
    */
  def bucket(j: Int, item: String, width: Int): Int = {
    val md = digestTl.get()
    md.reset()
    val d = md.digest((j.toString + ":" + item).getBytes("UTF-8"))
    val top = ((d(0) & 0xFFL) << 24) | ((d(1) & 0xFFL) << 16) |
      ((d(2) & 0xFFL) << 8) | (d(3) & 0xFFL)
    (top % width).toInt
  }

  /** Column aggregate: Count-Min grid of a STRING column as a flat
    * depth×width LONG array (row-major).
    */
  def sketch(col: Column, depth: Int, width: Int): Column =
    udaf(new CountMin(depth, width)).apply(col)

  /** Declarative point estimate: min over depth rows of the item's
    * cell — built-in md5/conv/element_at arithmetic only, so the probe
    * stays inside codegen and replays verbatim in the oracle.
    */
  def estimate(sketch: Column, item: Column, depth: Int, width: Int): Column = {
    require(depth >= 1, "depth must be >= 1")
    val cells = (0 until depth).map { j =>
      val b = conv(substring(md5(concat(lit(j.toString + ":"), item)), 1, 8),
        16, 10).cast("long") % width
      element_at(sketch, (lit(j * width) + b + 1).cast("int"))
    }
    cells.reduce((a, b) => least(a, b))
  }

  /** Elementwise-sum merge of two finished sketches (same depth×width)
    * — the incremental-store advance: sketch(A ∪ B) == merge exactly.
    */
  def mergeSketches(a: Array[Long], b: Array[Long]): Array[Long] = {
    require(a.length == b.length || a.length == 0 || b.length == 0,
      s"sketch shapes differ: ${a.length} vs ${b.length}")
    if (a.length == 0) b
    else if (b.length == 0) a
    else {
      val out = new Array[Long](a.length)
      var i = 0
      while (i < a.length) { out(i) = a(i) + b(i); i += 1 }
      out
    }
  }
}
