package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BottomKSketchSpec extends SparkSpec {

  test("sketch is deterministic regardless of row order and partitioning") {
    import spark.implicits._
    val values = (1L to 500L).map(v => (v % 7, v))
    val a = values.toDF("g", "v").repartition(8)
    val b = scala.util.Random.shuffle(values).toDF("g", "v").repartition(3)
    def run(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("g").agg(BottomKSketch.sketch(col("v"), 16).as("s"))
        .orderBy("g").collect().map(_.getSeq[Long](1).toSeq)
    assert(run(a).toSeq == run(b).toSeq)
  }

  test("sketch is exact below k and estimates within 30% above k") {
    import spark.implicits._
    // group 0: 40 distinct (< k=64, exact); group 1: 5000 distinct (estimate)
    val df = ((1L to 40L).map(v => (0L, v)) ++ (1L to 5000L).map(v => (1L, v)))
      .toDF("g", "v")
    val sketches = df.groupBy("g").agg(BottomKSketch.sketch(col("v"), 64).as("s"))
      .orderBy("g").collect().map(_.getSeq[Long](1).toArray)
    assert(BottomKSketch.estimateDistinct(sketches(0), 64) == 40.0)
    val est = BottomKSketch.estimateDistinct(sketches(1), 64)
    assert(math.abs(est - 5000.0) / 5000.0 < 0.3, s"estimate $est vs 5000")
  }

  test("bulk two-pointer merge ≡ per-element insert fold (both aggregators)") {
    // the round-12 merge rewrite must be bit-identical to the old
    // insert fold: k unsigned-smallest of the dedup'd union, first-seen
    // value on hash ties for the value-carrying twin
    val rnd = new scala.util.Random(42)
    val sk = new BottomKSketch(16, hashInput = false)
    val bv = new BottomKValues(16)
    def sketchOf(xs: Seq[Long]) = xs.foldLeft(sk.zero)(sk.reduce)
    def valuesOf(xs: Seq[(Long, Double)]) = xs.foldLeft(bv.zero)(bv.reduce)
    (0 until 200).foreach { _ =>
      val na = rnd.nextInt(40); val nb = rnd.nextInt(40)
      // small hash space forces duplicates + negative longs exercise
      // the unsigned order
      val ha = Seq.fill(na)(rnd.nextInt(60).toLong - 30L)
      val hb = Seq.fill(nb)(rnd.nextInt(60).toLong - 30L)
      val a = sketchOf(ha); val b = sketchOf(hb)
      val model = (ha ++ hb).distinct
        .sortWith((x, y) => java.lang.Long.compareUnsigned(x, y) < 0).take(16)
      assert(sk.merge(a.clone(), b.clone()).toSeq == model,
        s"sketch merge mismatch for $ha / $hb")
      val va = valuesOf(ha.zipWithIndex.map { case (h, i) => (h, i + 100.0) })
      val vb = valuesOf(hb.zipWithIndex.map { case (h, i) => (h, i + 900.0) })
      val merged = bv.merge(va.clone(), vb.clone())
      // hashes: k smallest of the union; ties keep va's value
      val hs = merged.indices.filter(_ % 2 == 0).map(merged(_))
      assert(hs == model, "value-merge hash set mismatch")
      val aMap = va.indices.filter(_ % 2 == 0).map(i => va(i) -> va(i + 1)).toMap
      val bMap = vb.indices.filter(_ % 2 == 0).map(i => vb(i) -> vb(i + 1)).toMap
      merged.indices.filter(_ % 2 == 0).foreach { i =>
        val expect = aMap.getOrElse(merged(i), bMap(merged(i)))
        assert(merged(i + 1) == expect, s"value for hash ${merged(i)} not first-seen")
      }
    }
  }

  test("duplicates do not change the sketch") {
    import spark.implicits._
    val once = Seq.tabulate(100)(i => (0L, i.toLong)).toDF("g", "v")
    val dup = (Seq.tabulate(100)(i => (0L, i.toLong)) ++
      Seq.tabulate(100)(i => (0L, i.toLong))).toDF("g", "v")
    def s(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("g").agg(BottomKSketch.sketch(col("v"), 32).as("s"))
        .head.getSeq[Long](1).toSeq
    assert(s(once) == s(dup))
  }
}
