package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bloom filter as a typed `Aggregator`: one mergeable bitset per
  * group, built map-side and OR-merged — the group-level twin of
  * parquet's column-index bloom, usable one level up (per FILE in a
  * lake manifest, per partition, per day…). A probe answers
  * "definitely absent" / "maybe present": the file-skipping primitive
  * for EQUALITY predicates on high-cardinality columns, where zone
  * maps ([min,max] per file) are useless unless the data is clustered.
  *
  * Hashing is self-contained (FNV-1a 64 over UTF-8 bytes, then k
  * double-hashed positions) so a driver-side [[BloomSketch.mightContain]]
  * replays the executor-side build bit for bit — no dependence on any
  * engine's internal hash. Null inputs set no bits (a bloom cannot
  * answer IS NULL; that is the zone/stat layer's job).
  *
  * Sizing: false-positive rate ≈ (1 − e^(−k·n/m))^k for n distinct
  * values in m bits with k hashes; the default k=7 is optimal near
  * m/n ≈ 10. EXTENSION (no reference counterpart — the reference has
  * no UDAFs, SURVEY.md §2 "UDF/UDAF/UDTF: none").
  */
class BloomSketch(numBits: Int, numHashes: Int = 7)
    extends Aggregator[String, Array[Long], Array[Long]] {
  require(numBits > 0 && numBits % 64 == 0, "numBits must be a positive multiple of 64")
  require(numHashes > 0, "numHashes must be positive")

  override def zero: Array[Long] = new Array[Long](numBits / 64)

  override def reduce(buf: Array[Long], value: String): Array[Long] = {
    if (value != null) BloomSketch.set(buf, numBits, numHashes, value)
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] = BottomKSketch.longArrayEncoder
  override def outputEncoder: Encoder[Array[Long]] = BottomKSketch.longArrayEncoder
}

object BloomSketch {

  /** Column aggregate: bloom bitset of a STRING column (cast first for
    * other types; the probe must use the same string form).
    */
  def sketch(col: Column, numBits: Int, numHashes: Int = 7): Column =
    udaf(new BloomSketch(numBits, numHashes)).apply(col)

  /** FNV-1a 64-bit over UTF-8 bytes — stable, dependency-free, and
    * trivially replayable outside the JVM for audits.
    */
  def hash64(s: String): Long = {
    var h = 0xcbf29ce484222325L
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** Kirsch–Mitzenmacher double hashing: position_i = h1 + i·h2 mod m.
    * h2 is forced odd so the k probes never collapse onto one slot.
    */
  private def positions(h: Long, numBits: Int, numHashes: Int): Iterator[Int] = {
    val h1 = h
    val h2 = (h >>> 32) | 1L
    (0 until numHashes).iterator.map { i =>
      (((h1 + i * h2) % numBits + numBits) % numBits).toInt
    }
  }

  private def set(bits: Array[Long], numBits: Int, numHashes: Int, value: String): Unit =
    positions(hash64(value), numBits, numHashes).foreach { p =>
      bits(p >> 6) |= 1L << (p & 63)
    }

  /** Driver-side probe of a finished bitset: false ⇒ the value is
    * DEFINITELY absent from the group; true ⇒ maybe present.
    */
  def mightContain(bits: Array[Long], value: String, numHashes: Int = 7): Boolean = {
    val numBits = bits.length * 64
    positions(hash64(value), numBits, numHashes)
      .forall(p => (bits(p >> 6) & (1L << (p & 63))) != 0L)
  }

  /** Big-endian base64 of the packed bitset — the manifest wire form. */
  def toBase64(bits: Array[Long]): String = {
    val bb = java.nio.ByteBuffer.allocate(bits.length * 8)
    bits.foreach(bb.putLong)
    java.util.Base64.getEncoder.encodeToString(bb.array())
  }

  def fromBase64(s: String): Array[Long] = {
    val bytes = java.util.Base64.getDecoder.decode(s)
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong())
  }
}
