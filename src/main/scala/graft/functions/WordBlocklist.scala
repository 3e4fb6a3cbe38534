package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.unsafe.types.UTF8String

/** One-pass kernel for the C4 doc-level word-blocklist gate, shared by
  * org.apache.spark.sql.graft.WordBlocklistExpr. Value-identical to the
  * higher-order-function formulation in
  * `graft.operators.TextAnalysis.wordBlocklistGateHof`:
  *
  *  - tokens are the maximal `[a-z0-9']` runs of lower(text) — one
  *    lowercase + one byte scan, no regex split, no token array. The
  *    byte scan is exact for this token class: every token byte is
  *    ASCII, and any non-ASCII character (whose UTF-8 bytes all have
  *    the high bit set) is a delimiter, exactly as the char-level
  *    regex `[^a-z0-9']+` treats it;
  *  - `n_bad_tokens` counts OCCURRENCES of blocklisted tokens;
  *  - `bad_terms` is the DISTINCT matched terms in UTF8String binary
  *    order (what `array_sort` uses and what DuckDB's UTF-8 collation
  *    replays), space-joined.
  *
  * The dictionary is a shared HashSet per distinct word list (the
  * MinHash.params caching pattern) — blocklists are parameter state,
  * hundreds to thousands of entries.
  */
object WordBlocklist {

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[Seq[String], java.util.HashSet[UTF8String]]()

  /** Bound for the dictionary cache: blocklists are parameter state (a
    * handful of lists per job), so the cap exists only to keep a
    * long-lived executor that sees many DISTINCT lists (dynamic or
    * per-tenant blocklists) from retaining every one forever. Eviction
    * drops ONE arbitrary entry per insert past the cap (not a full
    * clear, which would rebuild all 64 hot entries on nearly every new
    * list in a >64-distinct-list workload); a racing reader keeps its
    * own reference safely, and a racing evictor at worst removes an
    * extra entry — rebuild is one pass over that word list.
    */
  private val MaxCachedDicts = 64

  def dict(words: Seq[String]): java.util.HashSet[UTF8String] = {
    val hit = cache.get(words)
    if (hit != null) hit
    else {
      while (cache.size >= MaxCachedDicts) {
        val it = cache.keySet().iterator()
        if (it.hasNext) { it.next(); it.remove() } // evict one, keep the rest
        else () // raced to empty — nothing to evict
      }
      cache.computeIfAbsent(words, { ws =>
        val s = new java.util.HashSet[UTF8String](ws.length * 2)
        ws.foreach(w => s.add(UTF8String.fromString(w.toLowerCase)))
        s
      })
    }
  }

  private def isTokenByte(x: Byte): Boolean =
    (x >= 'a' && x <= 'z') || (x >= '0' && x <= '9') || x == '\''

  def hits(text: UTF8String, words: java.util.HashSet[UTF8String]): InternalRow = {
    val b = text.toLowerCase.getBytes
    var i = 0
    var nBad = 0L
    var found: java.util.TreeSet[UTF8String] = null
    while (i < b.length) {
      while (i < b.length && !isTokenByte(b(i))) i += 1
      val start = i
      while (i < b.length && isTokenByte(b(i))) i += 1
      if (i > start) {
        val w = UTF8String.fromBytes(b, start, i - start)
        if (words.contains(w)) {
          nBad += 1
          if (found == null) found = new java.util.TreeSet[UTF8String]()
          found.add(w)
        }
      }
    }
    val terms =
      if (found == null) UTF8String.EMPTY_UTF8
      else UTF8String.concatWs(UTF8String.fromString(" "),
        found.toArray(new Array[UTF8String](found.size)): _*)
    new GenericInternalRow(Array[Any](terms, nBad))
  }
}
