package graft

import org.apache.spark.sql.functions._

import graft.operators.{Classify, Similarity}
import graft.queries.{Inventory, Q}

/** Benchmark main: runs the headline queries at SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line {"metric":…,"queries":{…}}.
  *
  * Each query is forced through the noop sink (full materialization of
  * every output row — unlike count(), which lets Spark prune the plan).
  */
object Bench {

  /** GRAFT_BENCH_DOUBLE=1 adds plain-double-sum twins of the
    * decimal-exact headline aggregates, quantifying the price paid for
    * cross-engine bit-identity (the inventory sums in DECIMAL(28,s) so
    * DuckDB hash-matches; a production pipeline that doesn't need an
    * oracle would sum doubles). Reported as q01x_double_sums next to
    * q01_pricing_summary; the delta is the oracle-exactness tax.
    */
  private val doubleVariants: Seq[Q] = Seq(
    Q("q01x_double_sums",
      (s, dir) =>
        s.read.parquet(s"$dir/lineitem.parquet")
          .filter(col("l_shipdate").cast("date") <= lit("1998-09-02"))
          .groupBy("l_returnflag", "l_linestatus")
          .agg(
            sum("l_quantity").as("sum_qty"),
            sum("l_extendedprice").as("sum_base_price"),
            sum(expr("l_extendedprice*(1-l_discount)")).as("sum_disc_price"),
            sum(expr("l_extendedprice*(1-l_discount)*(1+l_tax)")).as("sum_charge"),
            avg("l_quantity").as("avg_qty"),
            avg("l_discount").as("avg_disc"),
            count(lit(1)).as("count_order"))
          .orderBy("l_returnflag", "l_linestatus"),
      None))

  /** GRAFT_BENCH_KNN_APPROX=1 adds the production parameterization of
    * q176's label propagation: centroid count scaled with the corpus
    * (C = max(16, n/128)) and nprobe = 4, so each query scans a bounded
    * ~4·128 seed vectors instead of all of them. The declared q176 probes
    * every cell (nprobe = C) because that makes the neighbor set exact
    * and DuckDB-replayable — this twin is what a 100 TB deployment runs,
    * and benching both quantifies the oracle-exactness tax the same way
    * GRAFT_BENCH_DOUBLE does for decimal sums.
    */
  private val knnApproxVariants: Seq[Q] = Seq(
    Q("q176x_knn_approx",
      (s, dir) => {
        val e = s.read.parquet(s"$dir/embeddings.parquet")
        val d = s.read.parquet(s"$dir/documents.parquet")
        val c = math.max(16, (e.count() / 128).toInt)
        val seed = e.filter(col("vec_id") % 2 === 0)
          .join(d.select(col("doc_id").as("vec_id"), col("lang")), "vec_id")
        val queries = e.filter(col("vec_id") % 2 === 1)
          .select(col("vec_id").as("qid"), col("embedding"))
        val cents = Similarity.kmeansCentroids(e, "vec_id", "embedding", c, iters = 2)
        Classify.knnPropagate(queries, seed, "vec_id", "qid", "embedding",
          "lang", k = 5, cents = cents, nprobe = 4, scale = 4)
      },
      None))

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.get("graft-bench")

    // GRAFT_BENCH_ONLY=q164_…,q165_… restricts the run — for targeted
    // scale audits (e.g. re-timing only new queries at sf1) without
    // paying the full headline sweep.
    val only = sys.env.get("GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val headline = (Inventory.all.filter(q => Inventory.benchNames.contains(q.name)) ++
      (if (sys.env.get("GRAFT_BENCH_DOUBLE").contains("1")) doubleVariants else Nil) ++
      (if (sys.env.get("GRAFT_BENCH_KNN_APPROX").contains("1")) knnApproxVariants else Nil))
      .filter(q => only.forall(_.contains(q.name)))

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
