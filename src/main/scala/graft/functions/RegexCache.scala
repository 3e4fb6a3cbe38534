package graft.functions

import java.util.concurrent.ConcurrentHashMap
import java.util.regex.Pattern

import org.apache.spark.unsafe.types.UTF8String

/** JVM-wide compiled-regex cache for DYNAMIC (non-literal) patterns.
  *
  * Spark's `RLike` only caches the compiled `Pattern` when the pattern
  * operand is foldable; a pattern coming from a COLUMN (the robots rule
  * table's per-rule regex, evaluated per URL per rule) recompiles on
  * every row — measured at ~1 s per 200k evaluations in the
  * robotsDecision gate, pure `Pattern.compile` overhead. Rule tables
  * are config-sized (a handful of distinct patterns repeated across
  * millions of rows), so a shared cache hits ~always.
  *
  * Bounded: the map is cleared wholesale past `MaxEntries` (distinct
  * patterns in one executor lifetime; crossing it means the caller is
  * feeding genuinely per-row patterns, where caching cannot help
  * anyway). ConcurrentHashMap — shared across tasks, race-safe; a lost
  * update just recompiles once.
  */
object RegexCache {
  private val MaxEntries = 4096
  private val cache = new ConcurrentHashMap[String, Pattern]()

  def pattern(re: String): Pattern = {
    var p = cache.get(re)
    if (p == null) {
      if (cache.size() >= MaxEntries) cache.clear()
      p = Pattern.compile(re)
      cache.put(re, p)
    }
    p
  }

  /** Unanchored match — exactly `RLike`'s semantics
    * (`Pattern.compile(re).matcher(s).find(0)`).
    */
  def find(s: UTF8String, re: UTF8String): Boolean =
    pattern(re.toString).matcher(s.toString).find(0)
}
