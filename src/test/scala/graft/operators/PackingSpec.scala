package graft.operators

import graft.SparkSpec

class PackingSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(Long, String, String)], seqLen: Int) =
    Packing.packConcat(
      rows.toDF("id", "shard", "text"), "id", "text", seqLen, "shard")
      .orderBy("shard", "seq_idx", "id")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getInt(3), r.getInt(4)))
      .toSeq

  private val docs = Seq(
    (1L, "a", (1 to 7).map(i => s"t$i").mkString(" ")),  //  7 tokens
    (2L, "a", (1 to 10).map(i => s"u$i").mkString(" ")), // 10 tokens
    (3L, "a", "one"),                                    //  1 token
    (4L, "b", (1 to 12).map(i => s"v$i").mkString(" ")), // 12 tokens
    (5L, "a", ""), (6L, "b", "   "))                     // dropped

  test("packConcat hand-computed layout: straddles, boundaries, empty docs") {
    // shard a stream (id order): doc1 [0,7) doc2 [7,17) doc3 [17,18), L=8
    // shard b stream: doc4 [0,12)
    assert(run(docs, 8) == Seq(
      ("a", 0L, 1L, 0, 7), ("a", 0L, 2L, 7, 8),
      ("a", 1L, 2L, 0, 8),
      ("a", 2L, 2L, 0, 1), ("a", 2L, 3L, 1, 2),
      ("b", 0L, 4L, 0, 8),
      ("b", 1L, 4L, 0, 4)))
  }

  test("packConcat invariants across seqLen values") {
    val nTok = Map(1L -> 7L, 2L -> 10L, 3L -> 1L, 4L -> 12L)
    for (l <- Seq(1, 3, 5, 8, 13, 100)) {
      val out = run(docs, l)
      val ctx = s"seqLen=$l"
      // spans are inside [0, L] and non-empty
      assert(out.forall { case (_, _, _, f, t) => f >= 0 && t <= l && f < t }, ctx)
      // every document's tokens are fully covered, exactly once
      val perDoc = out.groupBy(_._3).view.mapValues(_.map(r => r._5 - r._4).sum)
      nTok.foreach { case (id, n) => assert(perDoc(id) == n, s"$ctx doc=$id") }
      // every sequence except a shard's last is filled to exactly L
      out.groupBy(r => (r._1, r._2)).foreach { case ((sh, k), rows) =>
        val fill = rows.map(r => r._5 - r._4).sum
        val lastSeq = out.filter(_._1 == sh).map(_._2).max
        if (k < lastSeq) assert(fill == l, s"$ctx shard=$sh seq=$k")
        else assert(fill <= l, s"$ctx shard=$sh seq=$k")
      }
      // a doc's rows sit in consecutive sequences (it straddles, never skips)
      out.groupBy(_._3).foreach { case (id, rows) =>
        val seqs = rows.map(_._2).sorted
        assert(seqs == (seqs.head to seqs.last), s"$ctx doc=$id")
      }
    }
  }

  test("packConcat shards pack independently") {
    val full = run(docs, 8).filter(_._1 == "b")
    val alone = run(docs.filter(_._2 == "b"), 8)
    assert(full == alone)
  }
}
