package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CountMinSpec extends SparkSpec {

  import spark.implicits._

  private val D = 3
  private val W = 16

  test("sketch grid equals the brute-force expected grid") {
    val items = Seq("a", "b", "a", "c", "a", "b", null)
    val got = items.toDF("item")
      .agg(CountMin.sketch(col("item"), D, W)).head.getSeq[Long](0).toArray
    val expect = new Array[Long](D * W)
    items.filter(_ != null).foreach { it =>
      (0 until D).foreach(j => expect(j * W + CountMin.bucket(j, it, W)) += 1L)
    }
    assert(got.toSeq == expect.toSeq)
  }

  test("one-sided guarantee: estimate >= exact for every item") {
    val df = spark.range(0, 2000)
      .select((col("id") % 97).cast("string").as("item"))
    val sk = df.agg(CountMin.sketch(col("item"), 4, 64).as("sk"))
    val out = df.groupBy("item").agg(count(lit(1)).as("exact"))
      .crossJoin(broadcast(sk))
      .select(col("item"), col("exact"),
        CountMin.estimate(col("sk"), col("item"), 4, 64).as("est"))
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1),
        s"CMS estimate below exact for ${r.getString(0)}: $r")
    }
  }

  test("declarative estimate == JVM min-over-rows arithmetic") {
    val items = Seq.tabulate(500)(i => s"k${i % 23}")
    val sk = items.toDF("item")
      .agg(CountMin.sketch(col("item"), D, W)).head.getSeq[Long](0).toArray
    val probes = Seq("k0", "k7", "k22", "never-seen")
    val viaCol = probes.toDF("item")
      .crossJoin(items.toDF("item2").agg(CountMin.sketch(col("item2"), D, W).as("sk")))
      .select(col("item"), CountMin.estimate(col("sk"), col("item"), D, W).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    probes.foreach { p =>
      val jvm = (0 until D).map(j => sk(j * W + CountMin.bucket(j, p, W))).min
      assert(viaCol(p) == jvm, s"estimate mismatch for $p")
    }
  }

  test("mergeability: sketch(all) == merge(sketch(even), sketch(odd))") {
    val df = spark.range(0, 1000)
      .select(col("id"), (col("id") % 31).cast("string").as("item"))
    def grid(d: org.apache.spark.sql.DataFrame): Array[Long] =
      d.agg(CountMin.sketch(col("item"), D, W)).head.getSeq[Long](0).toArray
    val whole = grid(df)
    val even = grid(df.filter(col("id") % 2 === 0))
    val odd = grid(df.filter(col("id") % 2 === 1))
    assert(CountMin.mergeSketches(even, odd).toSeq == whole.toSeq)
    // empty side is the identity
    assert(CountMin.mergeSketches(Array.empty[Long], whole).toSeq == whole.toSeq)
  }

  test("cms_sketch SQL surface == Column API, empty input -> all-zero grid") {
    val df = Seq("x", "y", "x").toDF("item")
    df.createOrReplaceTempView("cms_t")
    val viaSql = spark.sql(s"SELECT cms_sketch(item, $D, $W) FROM cms_t")
      .head.getSeq[Long](0)
    val viaCol = df.agg(CountMin.sketch(col("item"), D, W)).head.getSeq[Long](0)
    assert(viaSql == viaCol)
    val emptyGrid = Seq.empty[String].toDF("item")
      .agg(CountMin.sketch(col("item"), D, W)).head.getSeq[Long](0)
    assert(emptyGrid.length == D * W && emptyGrid.forall(_ == 0L))
  }
}
