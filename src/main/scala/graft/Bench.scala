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

  /** Best-KNOWN per-query times from the repo's committed
    * BENCH_REF.json — the baseline the in-sweep re-stamp compares
    * against. The last sweep's raw artifact (BENCH_LOCAL.json) is the
    * WRONG reference: when the previous sweep itself ran in a
    * contended window, its inflated values would mask the next
    * window's outliers (r12's six 6–10× queries would have set their
    * own bar). So the reference RATCHETS: the parent writes
    * elementwise min(old ref, this sweep) after every full run at the
    * SAME sf, and a transient window can never raise it. A real code
    * regression makes its query re-stamp once per sweep forever with
    * first≈retry — exactly the evidence a regression should leave.
    * Missing/sf-mismatched file → empty map → no re-stamps.
    */
  private def readRef(sfDir: String): Map[String, Double] =
    try {
      val f = new java.io.File("BENCH_REF.json")
      if (!f.exists()) Map.empty
      else {
        val s = scala.io.Source.fromFile(f, "UTF-8")
        val line = try s.getLines().mkString("\n") finally s.close()
        if (!line.contains("\"sf\":\"" + sfDir + "\"")) Map.empty
        else {
          val qStart = line.indexOf("\"queries\":{")
          if (qStart < 0) Map.empty
          else {
            val body = line.substring(qStart + 11, line.indexOf('}', qStart))
            val pair = """"([A-Za-z0-9_]+)":([0-9.]+)""".r
            pair.findAllMatchIn(body).map(m => m.group(1) -> m.group(2).toDouble).toMap
          }
        }
      }
    } catch { case _: Throwable => Map.empty }

  /** The ratcheted best-known single-thread calib of this host (ms) —
    * the CLEAN-window reference the per-family window CLASS is judged
    * against. Lives in BENCH_REF.json next to the query ratchet (same
    * min-elementwise discipline: a contended sweep can never raise it).
    */
  private def readCalibRef(): Option[Double] =
    try {
      val f = new java.io.File("BENCH_REF.json")
      if (!f.exists()) None
      else {
        val s = scala.io.Source.fromFile(f, "UTF-8")
        val line = try s.getLines().mkString("\n") finally s.close()
        """"calib_ms":([0-9.]+)""".r.findFirstMatchIn(line).map(_.group(1).toDouble)
      }
    } catch { case _: Throwable => None }

  /** Family window class from its bracketing calib pair vs the clean
    * reference: both stamps near the reference = "clean"; either
    * moderately above = "elevated"; grossly above = "contended". The
    * class is judged on the WORSE of pre/post (a window that degrades
    * mid-family should not read clean), and the reference is the min
    * of the committed ratchet and this sweep's own best family (so a
    * first run without a ratchet still classifies self-relatively —
    * a contended-THROUGHOUT first sweep reads clean-relative until a
    * later clean sweep ratchets the reference down, which is the best
    * any self-contained stamp can do).
    */
  private def windowClass(pre: Double, post: Double, ref: Double): String = {
    val r = math.max(pre, post) / ref
    if (r <= 1.15) "clean" else if (r <= 1.5) "elevated" else "contended"
  }

  /** Ratchet BENCH_REF.json with this sweep's results (same-sf only;
    * a targeted sf10 audit must not seed sf0.1 references). A full
    * parent sweep at a DIFFERENT sf than the existing file's must not
    * clobber the ratchet either — the file is scoped to the driver's
    * artifact-of-record sf, so a casual sf0.001 smoke run leaves the
    * sf0.1 reference intact (it just records no refs of its own).
    */
  private def writeRef(
      sfDir: String,
      merged: Seq[(String, Double)],
      sweepCalib: Option[Double]): Unit =
    try {
      val f = new java.io.File("BENCH_REF.json")
      if (f.exists() && readRef(sfDir).isEmpty) {
        System.err.println(
          s"[bench] BENCH_REF.json holds another sf's ratchet; not overwriting for $sfDir")
        return
      }
      val old = readRef(sfDir)
      val next = (old.keySet ++ merged.map(_._1)).toSeq.sorted.map { n =>
        val vs = old.get(n).toSeq ++ merged.collectFirst { case (`n`, v) => v }.toSeq
        n -> vs.min
      }
      // ratchet the clean-window calib reference alongside the queries
      val calibNext = (readCalibRef().toSeq ++ sweepCalib.toSeq).reduceOption((a: Double, b: Double) => math.min(a, b))
      val calibJson = calibNext.map(c => f""""calib_ms":$c%.1f,""").getOrElse("")
      val w = new java.io.PrintWriter(new java.io.File("BENCH_REF.json"), "UTF-8")
      try w.println(s"""{"sf":"$sfDir",$calibJson"queries":${queriesJson(next)}}""")
      finally w.close()
    } catch { case e: Throwable =>
      System.err.println(s"[bench] BENCH_REF.json write failed: ${e.getMessage}")
    }

  /** == In-sweep self-attribution ==
    * A contended host window during one family used to masquerade as a
    * per-query regression (r6 q177 2.7×; r12 six queries at 6–10× on
    * byte-identical code) and cost a round of isolated-JVM re-runs to
    * disprove. So the sweep now attributes itself: any query whose
    * min-of-3 exceeds [[RestampFactor]]× its committed BENCH_LOCAL
    * value is immediately re-stamped (one more min-of-3, same JVM,
    * seconds later) and BOTH stamps land in the artifact. A real code
    * regression reproduces in the retry; a transient window does not —
    * the artifact itself now carries the evidence, and the reported
    * value is the min of both stamps (the engine's cost, which is what
    * min-of-3 always estimated). GRAFT_BENCH_NO_RESTAMP=1 disables
    * (e.g. for deliberately-contended A/B experiments).
    */
  private val RestampFactor = 2.0

  private def runFamily(
      names: Seq[Q],
      sfDir: String): (Seq[(String, Double)], Seq[(String, Double, Double)]) = {
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
    def stamp(q: Q): Double =
      (1 to 3).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        try q.run(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable =>
          System.err.println(s"[bench] ${q.name} failed: ${e.getMessage}")
        }
        (System.nanoTime() - t0) / 1e9
      }.min
    val refs =
      if (sys.env.get("GRAFT_BENCH_NO_RESTAMP").contains("1")) Map.empty[String, Double]
      else readRef(sfDir)
    val restamps = scala.collection.mutable.ListBuffer.empty[(String, Double, Double)]
    val results = names.map { q =>
      val first = stamp(q)
      val value = refs.get(q.name) match {
        case Some(ref) if first > RestampFactor * ref =>
          val retry = stamp(q)
          restamps += ((q.name, first, retry))
          math.min(first, retry)
        case _ => first
      }
      q.name -> value
    }
    spark.stop()
    (results, restamps.toSeq)
  }

  private def queriesJson(results: Seq[(String, Double)]): String =
    results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }.mkString("{", ",", "}")

  /** Both stamps of every in-sweep re-stamp, as {"name":[first,retry]}
    * — the window evidence the artifact-of-record carries so a
    * contended driver window can never again masquerade as a
    * regression (first≫retry = transient window; first≈retry = real).
    */
  private def restampsJson(rs: Seq[(String, Double, Double)]): String =
    rs.map { case (k, a, b) => "\"" + k + f"\":[$a%.3f,$b%.3f]" }
      .mkString("{", ",", "}")

  // --- parent-side: fork one JVM per family, merge the lines -------------

  /** Re-launch this JVM (same java binary, module opens, heap, system
    * props, classpath) on one family of queries; returns the child's
    * parsed (name, seconds) pairs, or None if the child failed.
    */
  private def forkFamily(
      family: Seq[String],
      sfDir: String): Option[(Seq[(String, Double)], Seq[(String, Double, Double)],
        Option[(Double, Double)])] = {
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
      val rsStart = jsonLine.indexOf("\"restamps\":{")
      val restamps =
        if (rsStart < 0) Seq.empty[(String, Double, Double)]
        else {
          val rbody = jsonLine.substring(rsStart + 12, jsonLine.indexOf('}', rsStart))
          val rpair = """"([A-Za-z0-9_]+)":\[([0-9.]+),([0-9.]+)\]""".r
          rpair.findAllMatchIn(rbody)
            .map(m => (m.group(1), m.group(2).toDouble, m.group(3).toDouble)).toSeq
        }
      val childCalib = """"calib_pre_ms":([0-9.]+),"calib_post_ms":([0-9.]+)""".r
        .findFirstMatchIn(jsonLine)
        .map(m => (m.group(1).toDouble, m.group(2).toDouble))
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
      val windowJson = childCalib
        .map { case (pre, post) =>
          f""","calib_pre_ms":$pre%.1f,"calib_post_ms":$post%.1f""" }
        .getOrElse("")
      println(f"""{"family_done":"${family.head}","calib_st_ms":$famCalib%.1f$windowJson,"restamps":${restampsJson(restamps)},"queries":${queriesJson(rs)}}""")
      Console.out.flush()
      Some((rs, restamps, childCalib))
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
      // calib_pre/post bracket THE FAMILY'S OWN window (the parent's
      // per-family stamp lands after the child exits — close, but the
      // child's own pre/post pair classifies the exact segment the
      // queries ran in: pre≈post≈committed = clean window, either
      // elevated = contended segment, attributable from the artifact).
      spin(50000000L) // JIT warm for the spin itself
      val calibPre = spin(200000000L)
      val (results, restamps) = runFamily(headline, sfDir)
      val calibPost = spin(200000000L)
      val total = results.map(_._2).sum
      println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":${queriesJson(results)},"restamps":${restampsJson(restamps)},"calib_pre_ms":$calibPre%.1f,"calib_post_ms":$calibPost%.1f,"sf":"$sfDir"}""")
    } else {
      val (calibSt, calibMt) = calibrate()
      val (ioWrite, ioRead) = ioAnchor()
      val families = headline.map(_.name).grouped(8).toSeq
      val allRestamps = scala.collection.mutable.ListBuffer.empty[(String, Double, Double)]
      // per-family window evidence: (family head, members, child pre/post)
      val famWindows = scala.collection.mutable.ListBuffer
        .empty[(String, Seq[String], Option[(Double, Double)])]
      val merged = families.flatMap { fam =>
        forkFamily(fam, sfDir) match {
          case Some((rs, restamps, childCalib)) =>
            allRestamps ++= restamps
            famWindows += ((fam.head, fam, childCalib))
            rs
          case None =>
            // Fallback: a child that cannot launch (unexpected classpath
            // shape) still gets timed — in this JVM, old single-process
            // behavior — rather than silently dropping its queries.
            val pre = spin(200000000L)
            val (rs, restamps) =
              runFamily(headline.filter(q => fam.contains(q.name)), sfDir)
            val post = spin(200000000L)
            allRestamps ++= restamps
            famWindows += ((fam.head, fam, Some((pre, post))))
            rs
        }
      }
      val total = merged.map(_._2).sum
      // == Per-family window CLASS, machine-readable at the stamp grain ==
      // A sweep-wide contended window (r13: every family's calib elevated
      // together) defeats the in-sweep restamp — both stamps share the
      // window — so the artifact now tags each family with a class judged
      // against the RATCHETED clean-calib reference, and every query
      // inherits its family's class. A per-query regression read in an
      // "elevated"/"contended" family adjudicates itself from the
      // artifact; no hand audit. Reference = min(committed ratchet, this
      // sweep's best family calib stamp).
      val sweepBest = famWindows.flatMap(_._3).flatMap(c => Seq(c._1, c._2))
        .reduceOption((a: Double, b: Double) => math.min(a, b))
      val calibRef = (readCalibRef().toSeq ++ sweepBest.toSeq).reduceOption((a: Double, b: Double) => math.min(a, b))
      val windowsJson = famWindows.map { case (head, members, calib) =>
        val (pre, post, cls) = (calib, calibRef) match {
          case (Some((a, b)), Some(ref)) => (a, b, windowClass(a, b, ref))
          case (Some((a, b)), None) => (a, b, "unknown")
          case _ => (-1.0, -1.0, "unknown")
        }
        val qs = members.map("\"" + _ + "\"").mkString("[", ",", "]")
        f""""$head":{"pre_ms":$pre%.1f,"post_ms":$post%.1f,"class":"$cls","queries":$qs}"""
      }.mkString("{", ",", "}")
      val nContended = famWindows.count { case (_, _, calib) =>
        (calib, calibRef) match {
          case (Some((a, b)), Some(ref)) => windowClass(a, b, ref) != "clean"
          case _ => false
        }
      }
      val line =
        f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":${queriesJson(merged)},"restamps":${restampsJson(allRestamps.toSeq)},"windows":$windowsJson,"calib_ref_ms":${calibRef.getOrElse(-1.0)}%.1f,"sf":"$sfDir","families":${families.size},"calib_st_ms":$calibSt%.1f,"calib_mt_ms":$calibMt%.1f,"io_write_s":$ioWrite%.2f,"io_anchor_s":$ioRead%.2f}"""
      // Also persist the full merged artifact to the repo: the driver's
      // stdout tail truncates long lines (BENCH_r06 lost 10 families and
      // parsed:null); a committed file can't be truncated.
      try {
        val w = new java.io.PrintWriter(new java.io.File("BENCH_LOCAL.json"), "UTF-8")
        try w.println(line) finally w.close()
      } catch { case e: Throwable =>
        System.err.println(s"[bench] BENCH_LOCAL.json write failed: ${e.getMessage}")
      }
      writeRef(sfDir, merged, sweepBest)
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
        f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":${queriesJson(picked.toSeq)},"queries_omitted":$omitted,"restamped":${allRestamps.size},"windows_not_clean":$nContended,"full_map":"BENCH_LOCAL.json","sf":"$sfDir","families":${families.size},"calib_st_ms":$calibSt%.1f,"calib_mt_ms":$calibMt%.1f,"io_write_s":$ioWrite%.2f,"io_anchor_s":$ioRead%.2f}"""
      Console.out.flush()
      println(compact)
    }
  }
}
