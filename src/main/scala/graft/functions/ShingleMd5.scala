package graft.functions

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Primitive kernel for the md5 shingle/tile streams of the span-dedup
  * family (Dedup.shingleStreamPos / tileStream), shared by
  * org.apache.spark.sql.graft.Md5ShingleStreamExpr.
  *
  * Value-identical to the HOF formulation
  * `md5(array_join(slice(split(text, " "), i+1, w), " "))` evaluated at
  * every position (overlapping) or every w-aligned tile (aligned):
  *
  *  - `split(text, " ")` splits on EVERY single space byte, keeping
  *    empty tokens (Spark's limit −1 semantics). Joining w consecutive
  *    tokens with " " therefore reconstructs the ORIGINAL byte range
  *    from the start of token i to the end of token i+w−1 — so the
  *    kernel md5s substrings of the original bytes directly: no token
  *    array, no slice, no join, no per-position string building.
  *    (A UTF-8 multibyte sequence can never contain 0x20, so the
  *    byte-level space scan is exact.)
  *  - md5 → lowercase 32-hex, exactly `functions.md5`'s rendering.
  *
  * The HOF shape additionally carried the full token array through its
  * explode — O(tokens²) bytes per document materialized in the
  * generator's output rows; moving the hashing into an interpreted
  * array-HOF lambda traded that for per-element interpretation
  * overhead (measured: BOTH are ~2–4× slower than this kernel on the
  * sf0.1 span queries).
  */
object ShingleMd5 {

  private val Empty = new GenericArrayData(Array.empty[Any])
  private val Hex = "0123456789abcdef".getBytes

  /** Overlapping w-token shingle md5s, one per position 0..n−w;
    * aligned=true instead hashes ⌊n/w⌋ disjoint w-token tiles.
    * Empty array when fewer than w tokens.
    */
  def stream(text: UTF8String, w: Int, aligned: Boolean): ArrayData = {
    val bytes = text.getBytes
    val len = bytes.length
    var spaces = 0
    var i = 0
    while (i < len) { if (bytes(i) == ' ') spaces += 1; i += 1 }
    val n = spaces + 1
    val count = if (aligned) n / w else n - w + 1
    if (count <= 0) return Empty
    val starts = new Array[Int](n)
    val ends = new Array[Int](n)
    var tok = 0
    starts(0) = 0
    i = 0
    while (i < len) {
      if (bytes(i) == ' ') { ends(tok) = i; tok += 1; starts(tok) = i + 1 }
      i += 1
    }
    ends(tok) = len
    val md = java.security.MessageDigest.getInstance("MD5")
    val out = new Array[Any](count)
    var s = 0
    while (s < count) {
      val from = if (aligned) starts(s * w) else starts(s)
      val to = if (aligned) ends(s * w + w - 1) else ends(s + w - 1)
      md.reset()
      md.update(bytes, from, to - from)
      val d = md.digest()
      val hex = new Array[Byte](32)
      var k = 0
      while (k < 16) {
        hex(2 * k) = Hex((d(k) >> 4) & 0xF)
        hex(2 * k + 1) = Hex(d(k) & 0xF)
        k += 1
      }
      out(s) = UTF8String.fromBytes(hex)
      s += 1
    }
    new GenericArrayData(out)
  }
}
