package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.NativeExprs
import org.apache.spark.unsafe.types.UTF8String

import graft.SparkSpec

class ScriptProfileSpec extends SparkSpec {

  import spark.implicits._

  private def counts(s: String): Seq[Long] = {
    val r = ScriptProfile.profile(UTF8String.fromString(s))
    (0 until 8).map(r.getLong)
  }

  test("kernel: disjoint classes sum to code-point length") {
    // latin+digit+space+punct, cyrillic, greek, arabic(+indic digits), cjk
    val s = "ab1 ?прαم٣漢かナ한"
    val c = counts(s)
    assert(c.sum == s.codePointCount(0, s.length))
    assert(c == Seq(2L, 2L, 1L, 2L, 4L, 1L, 1L, 1L),
      s"latin/cyr/greek/arabic/cjk/digit/space/other: $c")
  }

  test("kernel: precedence and class membership details") {
    // accented letters are LATIN script, not other
    assert(counts("café") == Seq(4L, 0, 0, 0, 0, 0, 0, 0))
    // ASCII digits are digit (not latin); arabic-indic digits are arabic
    assert(counts("42") == Seq(0L, 0, 0, 0, 0, 2, 0, 0))
    assert(counts("٣٤") == Seq(0L, 0, 0, 2, 0, 0, 0, 0))
    // every whitespace-class char is space; punctuation/symbols are other
    assert(counts(" \t\n\f\r") == Seq(0L, 0, 0, 0, 0, 0, 5, 0))
    assert(counts(".,!€") == Seq(0L, 0, 0, 0, 0, 0, 0, 4))
    // supplementary-plane code point counts ONCE (as other)
    val emoji = new String(Character.toChars(0x1F600))
    assert(counts(emoji) == Seq(0L, 0, 0, 0, 0, 0, 0, 1))
    // empty input: all zero
    assert(counts("") == Seq.fill(8)(0L))
  }

  test("SQL surface == Column API == kernel; null in, null out") {
    val df = Seq(
      (1L, "hello мир 42"),
      (2L, "漢字 αβ"),
      (3L, null.asInstanceOf[String])).toDF("id", "t")
    df.createOrReplaceTempView("sp_in")
    val viaSql = spark.sql(
      """SELECT id, script_profile(t).n_latin AS l, script_profile(t).n_cjk AS c,
        |  script_profile(t).n_space AS s FROM sp_in ORDER BY id""".stripMargin)
      .collect().map(r => (r.get(1), r.get(2), r.get(3))).toSeq
    val viaCol = df.select(col("id"), NativeExprs.scriptProfile(col("t")).as("p"))
      .select(col("p.n_latin"), col("p.n_cjk"), col("p.n_space"))
      .collect().map(r => (r.get(0), r.get(1), r.get(2))).toSeq
    assert(viaSql == viaCol)
    assert(viaSql(2) == ((null, null, null)), "null text must yield null struct")
    assert(viaSql(0) == ((5L, 0L, 2L)) && viaSql(1) == ((0L, 2L, 1L)))
  }
}
