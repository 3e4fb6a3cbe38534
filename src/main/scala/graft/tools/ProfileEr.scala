package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.EntityResolution

/** Stage decomposition of the q186 golden-record composite — the
  * measurement harness behind the ER cost work (SCALE.md rounds 9–11).
  * Prints per-stage wall times at the SF dir given as arg(0):
  *
  *   linkage   = linkPairs (candidate cascade + banded scoring), counted
  *   resolve   = full entity annotation (linkage + compact closure)
  *   golden    = goldenRecord over the resolved frame
  *
  * Stages run in separate actions, each min-of-`iters`; the overlap
  * (resolve re-runs linkage internally) is intentional — the deltas
  * isolate closure and survivorship without touching the operator.
  */
object ProfileEr {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val iters = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = GraftSession.get("graft-profile-er")
    val part = spark.read.parquet(s"$dir/part.parquet")
      .withColumn("name_noun", element_at(split(col("p_name"), " "), -1))
    def time(label: String)(body: => Long): Double = {
      val ts = (1 to iters).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        val n = body
        val dt = (System.nanoTime() - t0) / 1e9
        (dt, n)
      }
      val best = ts.map(_._1).min
      println(f"[profile-er] $label%-12s $best%7.3f s  (rows=${ts.head._2})")
      best
    }
    // warm: classloading/codegen once
    part.limit(1000).count(): Unit
    val link = time("linkage") {
      EntityResolution.linkPairs(part, "p_partkey",
        Seq("p_brand", "name_noun"), Seq(("p_name", 0.6), ("p_type", 0.4)), 0.85)
        .count()
    }
    val res = time("resolve") {
      EntityResolution.resolve(part, "p_partkey",
        Seq("p_brand", "name_noun"), Seq(("p_name", 0.6), ("p_type", 0.4)), 0.85)
        .count()
    }
    val full = time("full_q186") {
      val resolved = EntityResolution.resolve(part, "p_partkey",
        Seq("p_brand", "name_noun"), Seq(("p_name", 0.6), ("p_type", 0.4)), 0.85)
      EntityResolution.goldenRecord(resolved, "entity_id",
        modeFields = Seq("p_type", "p_size"),
        longestFields = Seq("p_name"),
        newestFields = Seq(("p_retailprice", "p_partkey")))
        .orderBy("entity_id").count()
    }
    println(f"[profile-er] closure ~= ${res - link}%.3f s, survivorship ~= ${full - res}%.3f s")
    spark.stop()
  }
}
