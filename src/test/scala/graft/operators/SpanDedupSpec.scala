package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Duplicate-span detection/removal (q198/q199) and span-level
  * decontamination (q200): alignment-free substring dedup via overlapping
  * shingles + gaps-and-islands merge.
  */
class SpanDedupSpec extends SparkSpec {

  private def spans(df: org.apache.spark.sql.DataFrame, w: Int) =
    Dedup.duplicateSpans(df, "doc_id", "text", w)
      .orderBy("doc_id", "span_no")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getLong(4)))

  test("duplicateSpans finds a MISALIGNED copy the tile pass provably misses") {
    import spark.implicits._
    // the DedupSpec doc-3 case: an 8-token span shared by docs 1 and 3,
    // shifted by one token in doc 3 — substringDedup (w=4 tiles) keeps
    // doc 3 untouched (pinned there); the sliding-window pass must name
    // the exact copied range.
    val shared = (1 to 8).map(i => s"p$i").mkString(" ")
    val df = Seq(
      (1L, shared + " a b c d"),
      (3L, "z " + shared + " t1 t2")
    ).toDF("doc_id", "text")
    val out = spans(df, w = 4)
    // doc 3 tokens: z p1..p8 t1 t2 — the copy covers positions 1..8.
    // duplicated 4-shingles start at 1..5 (five of them) and merge into
    // ONE maximal span [1, 8].
    assert(out.toSeq == Seq((3L, 1, 1, 8, 5L)), out.toSeq.toString)
  }

  test("within-doc repeats: the second occurrence is a span, the first is kept") {
    import spark.implicits._
    val run = (1 to 6).map(i => s"r$i").mkString(" ")
    val df = Seq((7L, s"$run x y $run")).toDF("doc_id", "text")
    // tokens: r1..r6 x y r1..r6 — duplicated 4-shingles start at 8,9,10
    // (positions of the SECOND r1..r6 run's shingles); maximal span
    // [8, 13] (= second run), first occurrence untouched.
    val out = spans(df, w = 4)
    assert(out.toSeq == Seq((7L, 1, 8, 13, 3L)), out.toSeq.toString)
  }

  test("island rule: windows touching at distance w merge; distance w+1 splits") {
    import spark.implicits._
    // doc 1 donates two distinct 4-runs A and B; doc 2 contains A at 0
    // and B at 4 (adjacent copies -> ONE span [0,7]); doc 3 contains A
    // at 0 and B at 5 (one fresh token between -> TWO spans).
    val a = "a1 a2 a3 a4"; val b = "b1 b2 b3 b4"
    val df = Seq(
      (1L, s"$a q1 q2 q3 $b"),
      (2L, s"$a $b"),
      (3L, s"$a z9 $b")
    ).toDF("doc_id", "text")
    val out = spans(df, w = 4)
    assert(out.toSeq == Seq(
      (2L, 1, 0, 7, 2L),          // merged: pos 0 and 4, 4 <= 0 + w
      (3L, 1, 0, 3, 1L),          // split: pos 0 and 5, 5 > 0 + w
      (3L, 2, 5, 8, 1L)), out.toSeq.toString)
  }

  test("removeDuplicateSpans cuts exactly the span tokens, keeps the rest") {
    import spark.implicits._
    val shared = (1 to 8).map(i => s"s$i").mkString(" ")
    val df = Seq(
      (1L, shared + " u1 u2"),
      (2L, "v1 " + shared + " v2")
    ).toDF("doc_id", "text")
    val out = Dedup.removeDuplicateSpans(df, "doc_id", "text", w = 4)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    // doc 2's copy covers positions 1..8; the cut keeps v1 and v2 only
    assert(out(0) == ((1L, 0L, 0L, shared + " u1 u2")), out(0).toString)
    assert(out(1) == ((2L, 1L, 8L, "v1 v2")), out(1).toString)
  }

  test("removeDuplicateSpans equals duplicateSpans-driven manual cut on real docs") {
    // cross-surface consistency on the corpus fixture: rebuild each
    // text by dropping the span token ranges reported by the detection
    // surface; must equal the cut surface byte-for-byte.
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val sp = Dedup.duplicateSpans(docs, "doc_id", "text", w = 8)
      .groupBy("doc_id")
      .agg(collect_list(struct(col("start_tok"), col("end_tok"))).as("sps"))
    val manual = docs.join(sp, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("sps").isNull, col("text")).otherwise(
          array_join(filter(split(col("text"), " "), (_, i) =>
            !exists(col("sps"), s =>
              i >= s("start_tok") && i <= s("end_tok"))), " ")).as("expect"))
    val got = Dedup.removeDuplicateSpans(docs, "doc_id", "text", w = 8)
      .select(col("doc_id"), col("text_dedup"))
    val diff = got.join(manual, Seq("doc_id"))
      .filter(col("text_dedup") =!= col("expect")).count()
    assert(diff == 0L)
  }

  test("contaminationSpans names the exact held-out range; clean docs are absent") {
    import spark.implicits._
    val leak = (1 to 10).map(i => s"e$i").mkString(" ")
    val train = Seq(
      (1L, s"t1 t2 $leak t3 t4"),       // contaminated: positions 2..11
      (2L, "c1 c2 c3 c4 c5 c6 c7 c8 c9")// clean
    ).toDF("doc_id", "text")
    val held = Seq((100L, s"h1 $leak h2")).toDF("doc_id", "text")
    val out = Dedup.contaminationSpans(train, held, "doc_id", "text", w = 8)
      .orderBy("doc_id", "span_no").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
    assert(out.toSeq == Seq((1L, 1, 2, 11)), out.toSeq.toString)
  }

  test("incremental span detection equals the full pass restricted to the batch") {
    // q202's contract on the real corpus: batch (>= 250) vs the
    // history store (< 250) must reproduce exactly the full-corpus
    // spans that land in batch docs (history ids precede batch ids)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val full = Dedup.duplicateSpans(docs, "doc_id", "text", w = 8)
      .filter(col("doc_id") >= 250)
    val inc = Dedup.duplicateSpansIncremental(
      docs.filter(col("doc_id") >= 250),
      Dedup.spanHashStore(docs.filter(col("doc_id") < 250), "doc_id", "text", w = 8),
      "doc_id", "text", w = 8)
    assert(full.exceptAll(inc).count() == 0 && inc.exceptAll(full).count() == 0)
  }

  test("spanHashStore is merge-associative: two daily stores union to the corpus store") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val d1 = Dedup.spanHashStore(docs.filter(col("doc_id") < 100), "doc_id", "text", w = 8)
    val d2 = Dedup.spanHashStore(
      docs.filter(col("doc_id") >= 100 && col("doc_id") < 250), "doc_id", "text", w = 8)
    val merged = d1.union(d2).groupBy("h")
      .agg(min(col("first_key")).as("first_key"))
    val direct = Dedup.spanHashStore(
      docs.filter(col("doc_id") < 250), "doc_id", "text", w = 8)
    assert(merged.exceptAll(direct).count() == 0 && direct.exceptAll(merged).count() == 0)
  }

  test("spans vs tiles on the corpus: the sliding window dominates tile coverage") {
    // every token a w-tile cut removes lies inside some reported span
    // when the SAME duplicated content is measured at shingle width w:
    // spans are a superset of (non-first) tile-aligned duplication.
    // Checked at the doc level: every doc that lost a tile has a span.
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val tiled = Dedup.substringDedup(docs, "doc_id", "text", w = 12)
      .filter(col("n_dup_tiles") > 0).select("doc_id")
    val spanned = Dedup.duplicateSpans(docs, "doc_id", "text", w = 12)
      .select("doc_id").distinct()
    val uncovered = tiled.join(spanned, Seq("doc_id"), "left_anti").count()
    assert(uncovered == 0L)
  }
}
