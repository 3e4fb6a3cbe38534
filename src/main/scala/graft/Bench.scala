package graft

import java.io.{BufferedReader, InputStreamReader}
import java.lang.management.ManagementFactory

import org.apache.spark.sql.functions._

import graft.operators.{Classify, Dedup, ScaleOps, Similarity}
import graft.queries.{Inventory, Q}

/** Benchmark main: runs the headline queries at SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line {"metric":…,"queries":{…}}.
  *
  * Each query is forced through the noop sink (full materialization of
  * every output row — unlike count(), which lets Spark prune the plan).
  *
  * == Per-family child JVMs ==
  * The round-5 sweep grew to 67 queries in one JVM and every query shared
  * that JVM's accumulated history (broadcast cleanup backlog, code-cache
  * and GC pressure from 1.5 MB task binaries). Measured on the shared-26
  * round-4 set: in-sweep 20.13 s vs 19.46 s mean isolated — a ~3% history
  * tax that only grows with the query count. So the parent process now
  * partitions the headline set into families of 8 (declared order) and
  * forks ONE CHILD JVM PER FAMILY (same classpath/module-opens/heap,
  * sequential — never concurrent, each child is local[32]); each child
  * warms up, runs min-of-3 per query, and prints its own JSON line; the
  * parent merges them into the single driver-visible line. A query's
  * timing now depends only on its family, not on the 60 queries that
  * happened to run before it.
  *
  * == Environment calibration ==
  * The rest of the round-4→5 drift (~1.33×, uniform across all 26 shared
  * queries, zero code/config change on their paths) was HOST-level: the
  * same isolated 26-query bench measured 14.6 s on Aug 12 and 19.4–19.6 s
  * on Aug 13 on an idle machine. Wall-clock alone cannot distinguish "the
  * code got slower" from "the machine got slower", so the parent times a
  * fixed single-thread and all-cores xorshift spin and embeds both in the
  * JSON (`calib_st_ms` / `calib_mt_ms`): compare calibration across rounds
  * to normalize engine numbers before reading a ratio as a regression.
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

  /** Production parameterizations of the ANN/clustering headliners,
    * ALWAYS benched alongside their oracle-shaped originals (they live
    * here rather than in `Inventory.all` because approximate-by-
    * construction results have no SQL oracle, and the declared set keeps
    * those to a documented minimum):
    *
    *  - q176x_knn_approx — q176's label propagation with corpus-scaled
    *    C = max(16, n/128) and nprobe = 4, so each query scans a bounded
    *    ~4·128 seed vectors instead of all of them (the declared q176
    *    probes every cell because that makes the neighbor set exact and
    *    DuckDB-replayable).
    *  - q164x_semantic_fixed_c / q169x_cluster_fixed_c — the declared
    *    twins size C with the corpus (max(8, n/128)) so the ORACLE's
    *    within-cell pair count stays linear; a deployment instead fixes
    *    the quantizer (trained kmeans centroids, C bounded by the
    *    cluster budget) and pays n·C map cost. Benching both keeps the
    *    headline number honest about what a 100 TB run costs.
    */
  private[graft] val productionTwins: Seq[Q] = Seq(
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
      None),
    Q("q164x_semantic_fixed_c",
      (s, dir) => {
        val e = s.read.parquet(s"$dir/embeddings.parquet")
        val cents = Similarity.kmeansCentroids(e, "vec_id", "embedding", 64, iters = 2)
        Dedup.semanticDedup(
          e, "vec_id", "embedding", cents, threshold = 0.45, roundScale = 4)
          .select("vec_id")
      },
      None),
    Q("q169x_cluster_fixed_c",
      (s, dir) => {
        val e = s.read.parquet(s"$dir/embeddings.parquet")
        val cents = Similarity.kmeansCentroids(e, "vec_id", "embedding", 64, iters = 2)
        Similarity.clusterQuality(e, "vec_id", "embedding", cents)
      },
      None),
    Q("q195x_emission_sort",
      // the READER side of q195 — the one exchange curriculumOrder's
      // scaladoc reasons about but the declared query (ordered by
      // doc_id for oracle determinism) never executes: a total sort of
      // the corpus by (bin, shuffle_key64). Benched on the 64-bit key
      // (8-byte comparisons; the hex twin would ship +24 B/row of sort
      // payload); PlanShapeSpec pins it as ONE range-partitioned sort.
      (s, dir) =>
        ScaleOps.curriculumOrder(
          s.read.parquet(s"$dir/documents.parquet"),
          "doc_id", "n_chars", nBins = 4, seed = 42L)
          .orderBy(col("bin"), col("shuffle_key64")),
      None))

  private def headlineQueries(only: Option[Set[String]]): Seq[Q] =
    (Inventory.all.filter(q => Inventory.benchNames.contains(q.name)) ++
      productionTwins ++
      (if (sys.env.get("GRAFT_BENCH_DOUBLE").contains("1")) doubleVariants else Nil))
      .filter(q => only.forall(_.contains(q.name)))

  // --- environment calibration -------------------------------------------

  /** Deterministic xorshift64 spin, `n` steps; returns elapsed ms. The
    * running state is folded into a volatile sink so the JIT cannot dead-
    * code the loop.
    */
  @volatile private var sink: Long = 0L
  private def spin(n: Long): Double = {
    var x = 0x9E3779B97F4A7C15L
    var i = 0L
    val t0 = System.nanoTime()
    while (i < n) { x ^= x << 13; x ^= x >>> 7; x ^= x << 17; i += 1 }
    sink ^= x
    (System.nanoTime() - t0) / 1e6
  }

  /** (single-thread ms, all-cores ms) for a fixed 2e8-step spin — a
    * machine-speed anchor independent of Spark. Min-of-3 single-thread
    * (after a JIT warm pass); one all-cores round (32 threads × the same
    * spin) whose elapsed time exposes both per-core speed and how much
    * parallelism the host actually delivers that day.
    */
  private def calibrate(): (Double, Double) = {
    spin(50000000L) // JIT warm
    val st = (1 to 3).map(_ => spin(200000000L)).min
    val cores = Runtime.getRuntime.availableProcessors()
    val t0 = System.nanoTime()
    val ts = (1 to cores).map(_ => new Thread(() => { spin(200000000L); () }))
    ts.foreach(_.start()); ts.foreach(_.join())
    val mt = (System.nanoTime() - t0) / 1e6
    (st, mt)
  }

  /** IO/bandwidth anchor: write a fixed ~1 GB incompressible parquet
    * frame, then time a full scan+sum of it — reported as
    * (`io_write_s`, `io_anchor_s`) next to the CPU spin. The round-9
    * host drift (q148 unchanged-code 18.8 → 34.4 s at a FLAT
    * calib_st_ms) was invisible to the CPU stamp because it was
    * IO/bandwidth-level; with its own bandwidth stamp, every sweep is
    * self-anchored and cross-round sf10 reads stop needing a same-day
    * manual anchor query. xxhash64 columns defeat parquet encodings
    * and page compression, so the file is ~raw-sized and the scan cost
    * is dominated by the storage path, not codec speed. (The read runs
    * straight after the write, so it measures the warm path — the same
    * page-cache regime the sf0.1 fixtures are read under.)
    *
    * The probe lives under `target/io-anchor` in the repo (override
    * with GRAFT_IO_ANCHOR_DIR) — the SAME filesystem the sf fixtures
    * are read from on this host — NOT java.io.tmpdir, which on many
    * hosts is tmpfs and would make the "IO anchor" a RAM-bandwidth
    * number blind to the storage-path regressions it exists to
    * attribute. (This host: /tmp and /root are both the one ext4
    * device, but the default should not depend on that.)
    */
  private def ioAnchor(): (Double, Double) = {
    val spark = GraftSession.get("graft-bench-io")
    val base = sys.env.getOrElse("GRAFT_IO_ANCHOR_DIR", "target/io-anchor")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(base))
    val dir = java.nio.file.Files
      .createTempDirectory(java.nio.file.Paths.get(base), "probe").toString
    try {
      val df = spark.range(40000000L).select(
        col("id"),
        xxhash64(col("id")).as("h1"),
        xxhash64(col("id"), lit(1L)).as("h2"))
      val t0 = System.nanoTime()
      df.write.mode("overwrite").parquet(dir)
      val wr = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      spark.read.parquet(dir).agg(sum(col("h1")) + sum(col("h2"))).collect()
      val rd = (System.nanoTime() - t1) / 1e9
      (wr, rd)
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
      spark.stop() // family children fork their own JVM-local sessions
    }
  }

  // --- child-side: time one family in THIS JVM ---------------------------

  private def runFamily(names: Seq[Q], sfDir: String): Seq[(String, Double)] = {
    val spark = GraftSession.get("graft-bench")
    // Untimed warm-up at the smallest sf: loads Parquet/codegen/exchange
    // classes and JIT-compiles the hot paths so per-query timings measure
    // the engine, not JVM startup. EVERY query in the family runs once
    // (not just names.head — round 6 showed a family's heavy query can
    // pay its own JIT/codegen bill inside its timed first iteration when
    // only the head was warmed; sf0.001 keeps the extra passes cheap).
    val warmAll = !sys.env.get("GRAFT_BENCH_WARM_HEAD_ONLY").contains("1")
    (if (warmAll) names else names.take(1)).foreach { q =>
      try q.run(spark, "/root/testdata/sf0.001")
        .write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }
    spark.catalog.clearCache()

    // Three timed iterations per query, report the min — one run is noisy
    // (GC pauses, first-touch page faults) and the min is the best
    // estimate of the engine's cost; min-of-2 left ±70% swings between
    // rounds on sub-second queries (q64 r2→r3), min-of-3 separates noise
    // from real regressions. Cache cleared per iteration so queries with
    // internal persists (q81/q101) stay COLD: the cache manager would
    // otherwise dedupe on the logical plan and hand a later run the
    // first run's materialized signatures.
    val results = names.map { q =>
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
    spark.stop()
    results
  }

  private def queriesJson(results: Seq[(String, Double)]): String =
    results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }.mkString("{", ",", "}")

  // --- parent-side: fork one JVM per family, merge the lines -------------

  /** Re-launch this JVM (same java binary, module opens, heap, system
    * props, classpath) on one family of queries; returns the child's
    * parsed (name, seconds) pairs, or None if the child failed.
    */
  private def forkFamily(family: Seq[String], sfDir: String): Option[Seq[(String, Double)]] = {
    val javaBin = System.getProperty("java.home") + "/bin/java"
    val jvmArgs = ManagementFactory.getRuntimeMXBean.getInputArguments
    val cmd = new java.util.ArrayList[String]()
    cmd.add(javaBin)
    jvmArgs.forEach(a => if (!a.startsWith("-agentlib")) cmd.add(a))
    cmd.add("-cp"); cmd.add(System.getProperty("java.class.path"))
    cmd.add("graft.Bench")
    val pb = new ProcessBuilder(cmd)
    pb.environment().put("GRAFT_BENCH_CHILD", "1")
    pb.environment().put("GRAFT_BENCH_ONLY", family.mkString(","))
    pb.environment().put("SPARK_GRAFT_SF_DIR", sfDir)
    pb.redirectError(ProcessBuilder.Redirect.INHERIT)
    val proc = pb.start()
    val out = new BufferedReader(new InputStreamReader(proc.getInputStream))
    var line: String = null
    var jsonLine: String = null
    while ({ line = out.readLine(); line != null })
      if (line.contains("\"metric\"")) jsonLine = line
    val rc = proc.waitFor()
    if (rc != 0 || jsonLine == null) {
      System.err.println(s"[bench] child for ${family.head}.. failed (rc=$rc)")
      None
    } else {
      // The queries object is flat ({"name":secs,…}); pull it out by
      // brace position and regex the pairs — no JSON library needed.
      val qStart = jsonLine.indexOf("\"queries\":{")
      val body = jsonLine.substring(qStart + 11, jsonLine.indexOf('}', qStart))
      val pair = """"([A-Za-z0-9_]+)":([0-9.]+)""".r
      val rs = pair.findAllMatchIn(body).map(m => m.group(1) -> m.group(2).toDouble).toSeq
      // Per-family progress line, printed AS the child exits, so a
      // truncated driver tail still carries most families even if the
      // final merged line is cut (BENCH_r06 lost q01–q64 that way).
      // Deliberately no "metric" key: the driver parses the metric line.
      // calib_st_ms stamps host speed RIGHT AFTER this family: r6's q177
      // 2.7× "regression" was a transient host slow window during the
      // later families (unreproducible next day on the same fixture at
      // the same global calibration — see SCALE.md); a per-family stamp
      // makes the next such window attributable from the artifact alone.
      val famCalib = spin(200000000L)
      println(f"""{"family_done":"${family.head}","calib_st_ms":$famCalib%.1f,"queries":${queriesJson(rs)}}""")
      Console.out.flush()
      Some(rs)
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // GRAFT_BENCH_ONLY=q164_…,q165_… restricts the run — for targeted
    // scale audits (e.g. re-timing only new queries at sf1) without
    // paying the full headline sweep.
    val only = sys.env.get("GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val headline = headlineQueries(only)

    if (sys.env.get("GRAFT_BENCH_CHILD").contains("1")) {
      // Child: time my family in-process and report one line up.
      val results = runFamily(headline, sfDir)
      val total = results.map(_._2).sum
      println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":${queriesJson(results)},"sf":"$sfDir"}""")
    } else {
      val (calibSt, calibMt) = calibrate()
      val (ioWrite, ioRead) = ioAnchor()
      val families = headline.map(_.name).grouped(8).toSeq
      val merged = families.flatMap { fam =>
        forkFamily(fam, sfDir) match {
          case Some(rs) => rs
          case None =>
            // Fallback: a child that cannot launch (unexpected classpath
            // shape) still gets timed — in this JVM, old single-process
            // behavior — rather than silently dropping its queries.
            runFamily(headline.filter(q => fam.contains(q.name)), sfDir)
        }
      }
      val total = merged.map(_._2).sum
      val line =
        f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":${queriesJson(merged)},"sf":"$sfDir","families":${families.size},"calib_st_ms":$calibSt%.1f,"calib_mt_ms":$calibMt%.1f,"io_write_s":$ioWrite%.2f,"io_anchor_s":$ioRead%.2f}"""
      // Also persist the full merged artifact to the repo: the driver's
      // stdout tail truncates long lines (BENCH_r06 lost 10 families and
      // parsed:null); a committed file can't be truncated.
      try {
        val w = new java.io.PrintWriter(new java.io.File("BENCH_LOCAL.json"), "UTF-8")
        try w.println(line) finally w.close()
      } catch { case e: Throwable =>
        System.err.println(s"[bench] BENCH_LOCAL.json write failed: ${e.getMessage}")
      }
      // Emission order matters: the driver keeps only the LAST ~2 KB of
      // stdout and parses the final JSON line it finds there. The full
      // 120+-query line is ~4 KB, so when it prints last its head is cut
      // and the driver's `parsed` stays null (every round through r10).
      // So: full line FIRST (humans + logs; the complete map is also in
      // BENCH_LOCAL.json), then a compact final line — totals, anchors,
      // and the SLOWEST queries that fit a ~1.4 KB budget (the ones a
      // plan audit reads first), with an explicit omitted-count so the
      // truncation is visible, not silent.
      println(line)
      val byCost = merged.sortBy(-_._2)
      val budget = 1400
      val picked = scala.collection.mutable.ListBuffer.empty[(String, Double)]
      var used = 0
      byCost.foreach { case (n, t) =>
        val w = n.length + 12
        if (used + w <= budget) { picked += ((n, t)); used += w }
      }
      val omitted = merged.size - picked.size
      val compact =
        f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":${queriesJson(picked.toSeq)},"queries_omitted":$omitted,"full_map":"BENCH_LOCAL.json","sf":"$sfDir","families":${families.size},"calib_st_ms":$calibSt%.1f,"calib_mt_ms":$calibMt%.1f,"io_write_s":$ioWrite%.2f,"io_anchor_s":$ioRead%.2f}"""
      Console.out.flush()
      println(compact)
    }
  }
}
