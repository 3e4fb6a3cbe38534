package graft.functions

import java.nio.charset.Charset

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.NativeExprs
import org.apache.spark.unsafe.types.UTF8String

import graft.SparkSpec

class MojibakeRepairSpec extends SparkSpec {

  import spark.implicits._

  private val cafe = "caf\u00E9"           // cafe with U+00E9, properly decoded
  private val gE = "\u00C3\u00A9"          // ghost of U+00E9
  private val gQ = "\u00E2\u20AC\u2122"    // cp1252 ghost of U+2019
  private val gN = "\u00C2\u00A0"          // stray byte + NBSP ghost

  private def fix(s: String): String =
    MojibakeRepair.repair(UTF8String.fromString(s)).toString

  test("repair: one-generation ghosts decode back, ASCII and genuine accents survive") {
    assert(fix(s"caf$gE au lait") == s"$cafe au lait")
    assert(fix(s"that${gQ}s it") == "that\u2019s it")
    assert(fix(s"A${gN}B") == "A\u00A0B")
    // ASCII: same object back (scan-only fast path, no allocation)
    val ascii = UTF8String.fromString("plain ascii only")
    assert(MojibakeRepair.repair(ascii) eq ascii)
    // genuine accents: 0xE9 alone is not valid UTF-8 -> untouched
    assert(fix(s"$cafe au lait, that\u2019s it") == s"$cafe au lait, that\u2019s it")
    assert(fix("na\u00EFve r\u00E9sum\u00E9") == "na\u00EFve r\u00E9sum\u00E9")
  }

  test("repair: double mojibake unwinds to a fixpoint") {
    // two decode generations of U+00E9: C3 0192 C2 A9
    assert(fix(s"caf\u00C3\u0192\u00C2\u00A9 encore") == s"$cafe encore")
    // generate N-times-ghosted text mechanically (decode UTF-8 bytes as
    // cp1252, N times) and check the kernel unwinds every generation
    val cp1252 = Charset.forName("windows-1252")
    var ghosted = cafe
    (1 to 3).foreach { _ =>
      ghosted = new String(ghosted.getBytes("UTF-8"), cp1252)
      assert(fix(ghosted) == cafe, s"generation failed for $ghosted")
    }
  }

  test("repair: un-mappable runs are kept and do not block neighbors") {
    // U+FFFD is outside cp1252's image: its run stays, the ghosts beside
    // it still repair (the segment-wise property q210 pins)
    assert(fix(s"a $gE b \uFFFD c $gE d") == s"a \u00E9 b \uFFFD c \u00E9 d")
    // CJK likewise
    assert(fix(s"\u4F60\u597D $gE") == s"\u4F60\u597D \u00E9")
  }

  test("repair: runs that are not a clean double-decode image are untouched") {
    // C3 followed by a non-continuation (C3 C3) is invalid UTF-8
    assert(fix("x\u00C3\u00C3x") == "x\u00C3\u00C3x")
    // NBSP alone: single byte >= 0x80, never valid UTF-8
    assert(fix("a\u00A0b") == "a\u00A0b")
    // truncated multibyte lead at end of run
    assert(fix("tail\u00C3") == "tail\u00C3")
  }

  test("fix_mojibake SQL surface == NativeExprs column == kernel") {
    val df = Seq((1L, s"caf$gE"), (2L, "plain"), (3L, null.asInstanceOf[String]))
      .toDF("id", "text")
    df.createOrReplaceTempView("moji_t")
    val viaSql = spark.sql(
      "SELECT id, fix_mojibake(text) AS f FROM moji_t ORDER BY id")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getString(1)))
    val viaCol = df.select(col("id"), NativeExprs.fixMojibake(col("text")).as("f"))
      .orderBy("id")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getString(1)))
    assert(viaSql.toSeq == viaCol.toSeq)
    assert(viaSql(0)._2 == cafe && viaSql(1)._2 == "plain" && viaSql(2)._2 == null)
  }

  test("repair composes with the q191 detector: repaired text scores 0") {
    val df = Seq((1L, s"caf$gE it${gQ}s fine")).toDF("id", "text")
    val score = df.select(
      graft.operators.TextAnalysis.encodingNoiseScore(
        NativeExprs.fixMojibake(col("text"))).as("s"))
      .head.getDouble(0)
    assert(score == 0.0)
  }
}
