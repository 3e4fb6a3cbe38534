package graft

import graft.queries.Inventory

/** Benchmark main: runs the headline queries at SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line {"metric":…,"queries":{…}}.
  *
  * Each query is forced through the noop sink (full materialization of
  * every output row — unlike count(), which lets Spark prune the plan).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.get("graft-bench")

    val headline = Inventory.all.filter(q => Inventory.benchNames.contains(q.name))

    // Untimed warm-up at the smallest sf: loads Parquet/codegen/exchange
    // classes and JIT-compiles the hot paths so per-query timings measure
    // the engine, not JVM startup.
    try headline.head.run(spark, "/root/testdata/sf0.001")
      .write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }

    // Three timed iterations per query, report the min — one run is noisy
    // (GC pauses, first-touch page faults) and the min is the best
    // estimate of the engine's cost; min-of-2 left ±70% swings between
    // rounds on sub-second queries (q64 r2→r3), min-of-3 separates noise
    // from real regressions. Cache cleared per iteration so queries with
    // internal persists (q81/q101) stay COLD: the cache manager would
    // otherwise dedupe on the logical plan and hand a later run the
    // first run's materialized signatures.
    val results = headline.map { q =>
      val times = (1 to 3).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        try q.run(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable =>
          System.err.println(s"[bench] ${q.name} failed: ${e.getMessage}")
        }
        (System.nanoTime() - t0) / 1e9
      }
      q.name -> times.min
    }
    val qs = results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
