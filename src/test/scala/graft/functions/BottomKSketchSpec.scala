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
