package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Parity pin for the ShingleMd5 kernel against the HOF formulation it
  * replaced in Dedup.shingleStreamPos / tileStream:
  * `md5(array_join(slice(split(text, " "), i+1, w), " "))` at every
  * overlapping position (or every w-aligned tile). The kernel hashes
  * byte ranges of the original text — equivalence rests on
  * single-space split/join being a byte-exact reconstruction — so the
  * pin drives the nasty shapes: consecutive spaces (empty tokens),
  * leading/trailing spaces, multibyte UTF-8, exactly-w tokens, fewer
  * than w tokens, empty string.
  */
class ShingleMd5Spec extends SparkSpec {
  import spark.implicits._

  private def hof(text: org.apache.spark.sql.Column, w: Int, aligned: Boolean) = {
    val toks = split(text, " ")
    val n = if (aligned) floor(size(toks) / w).cast("int")
      else (size(toks) - (w - 1)).cast("int")
    val idx = (p: org.apache.spark.sql.Column) =>
      if (aligned) p * w + 1 else p + 1
    when(n >= 1,
      transform(sequence(lit(0), n - 1),
        p => md5(array_join(slice(toks, idx(p), lit(w)), " "))))
      .otherwise(array().cast("array<string>"))
  }

  private val fixtures = Seq(
    "the quick brown fox jumps over the lazy dog again and again",
    "a  b   c d", // consecutive spaces -> empty tokens
    " leading and trailing ",
    "café déjà-vu naïve 日本語 text über tokens here",
    "one two three four five six seven eight", // exactly w for w=8
    "short text", // fewer than w tokens
    "", // empty
    "x", // single token
    "a b c d e f g h i j k l m n o p q r s t")

  for (w <- Seq(2, 3, 8); aligned <- Seq(false, true)) {
    test(s"kernel == HOF formulation (w=$w, aligned=$aligned)") {
      val df = fixtures.toDF("text")
      val got = df.select(
        org.apache.spark.sql.graft.NativeExprs
          .md5ShingleStream(col("text"), w, aligned).as("k"),
        hof(col("text"), w, aligned).as("h"))
      got.collect().foreach { r =>
        assert(r.getSeq[String](0) == r.getSeq[String](1),
          s"mismatch at w=$w aligned=$aligned")
      }
    }
  }

  test("null text yields null (nullSafeEval), not a crash") {
    val df = Seq[Option[String]](None, Some("a b c")).toDF("text")
    val got = df.select(org.apache.spark.sql.graft.NativeExprs
      .md5ShingleStream(col("text"), 2, aligned = false).as("k"))
      .collect()
    assert(got(0).isNullAt(0))
    assert(got(1).getSeq[String](0).nonEmpty)
  }
}
