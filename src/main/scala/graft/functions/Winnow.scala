package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Primitive kernel for MOSS winnowing fingerprints: md5 each char
  * k-gram of lower(trim(text)), take the minimum hash of every window of
  * `w` consecutive k-grams (monotonic-deque running min — O(n) total),
  * and return the DISTINCT minima as lowercase hex strings.
  *
  * Value-identical to the window-function formulation in
  * `TextAnalysis.winnowFingerprintsWindowed` (same normalization, same
  * UTF-8-byte md5 as Spark's `md5(substr(text, i, k).cast("binary"))`,
  * and 16-byte unsigned comparison — exactly hex-lexicographic order),
  * but computed in ONE map-side pass per row: no posexplode, no window
  * shuffle, one reused digest instance, no per-position expression tree.
  *
  * Unicode note: k-grams are code-point windows over the UTF-8 byte
  * offsets (matching `substr`'s character semantics); surrogate pairs
  * count as one character in both paths.
  */
object Winnow {

  private val digests = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  private val HexChars = "0123456789abcdef".toCharArray

  /** unsigned lexicographic compare of two 16-byte md5 digests */
  private def less(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < 16) {
      val x = a(i) & 0xff
      val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    false
  }

  private def hex(d: Array[Byte]): UTF8String = {
    val out = new Array[Byte](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = HexChars((d(i) >> 4) & 0xf).toByte
      out(2 * i + 1) = HexChars(d(i) & 0xf).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  /** Distinct winnowing fingerprints of `text`, or an empty array when
    * the normalized text is shorter than k + w − 1 characters.
    */
  def fingerprints(text: UTF8String, k: Int, w: Int): ArrayData = {
    if (text == null) return new GenericArrayData(Array.empty[Any])
    val norm = text.toString.trim.toLowerCase
    val bytes = norm.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    // code-point start offsets into the UTF-8 bytes (+ end sentinel)
    val nChars = norm.codePointCount(0, norm.length)
    if (nChars < k + w - 1) return new GenericArrayData(Array.empty[Any])
    val offs = new Array[Int](nChars + 1)
    var ci = 0
    var bi = 0
    var ui = 0 // UTF-16 index, advanced incrementally (no O(n²) walks)
    while (ci < nChars) {
      offs(ci) = bi
      val cp = norm.codePointAt(ui)
      ui += Character.charCount(cp)
      bi += (if (cp < 0x80) 1 else if (cp < 0x800) 2 else if (cp < 0x10000) 3 else 4)
      ci += 1
    }
    offs(nChars) = bytes.length

    val md = digests.get()
    val nGrams = nChars - k + 1
    val hashes = new Array[Array[Byte]](nGrams)
    var i = 0
    while (i < nGrams) {
      md.reset()
      md.update(bytes, offs(i), offs(i + k) - offs(i))
      hashes(i) = md.digest()
      i += 1
    }

    // monotonic deque of positions: front = index of the window minimum.
    // Ties keep the EARLIER position (strict less when evicting), which
    // matches min()'s value semantics — equal digests are equal values.
    val deque = new Array[Int](nGrams)
    var head = 0
    var tail = 0 // exclusive
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var j = 0
    while (j < nGrams) {
      while (tail > head && !less(hashes(deque(tail - 1)), hashes(j))) tail -= 1
      deque(tail) = j; tail += 1
      if (deque(head) <= j - w) head += 1
      if (j >= w - 1) seen.add(hex(hashes(deque(head))))
      j += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next(); o += 1 }
    new GenericArrayData(out)
  }
}
