package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ScaleOpsSpec extends SparkSpec {

  test("saltedJoin returns exactly the plain join's rows") {
    import spark.implicits._
    // one hot key (90% of rows) + a long tail
    val skewed = (1 to 2000).map(i => (if (i % 10 != 0) 1L else i.toLong, s"row$i"))
      .toDF("k", "payload")
    val dim = (1L to 200L).map(k => (k, s"dim$k")).toDF("k", "attr")

    val plain = skewed.join(dim, "k")
    val salted = ScaleOps.saltedJoin(skewed, dim, "k", buckets = 8)

    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(salted).count() == 0)
  }

  test("saltedJoin spreads a hot key over multiple shuffle partitions") {
    import spark.implicits._
    val skewed = (1 to 1000).map(i => (1L, s"row$i")).toDF("k", "payload")
    val salts = skewed.withColumn("__salt", (rand(42) * 8).cast("int"))
      .select("__salt").distinct().count()
    assert(salts > 4, s"expected hot key spread over >4 salt buckets, got $salts")
  }

  test("AQE splits the hot-key partition of a shuffle join (skew=true in final plan)") {
    // Decision rule (also in ScaleOps' scaladoc): AQE's runtime skew-join
    // split is the FIRST line of defense — it activates whenever a
    // shuffle-join partition exceeds max(threshold, factor × median) and
    // needs no query rewrite. Fall back to saltedJoin only when (a) one
    // key is so hot that even a split partition overwhelms a task's
    // build side, or (b) AQE cannot re-plan (cached subtree, non-SMJ
    // shape). This pins evidence that (a)'s default actually engages on
    // a ≥80%-hot key, with thresholds scaled to fixture size the way
    // production would scale them to executor memory.
    import spark.implicits._
    val conf = spark.conf
    val keys = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes")
    val saved = keys.map(k => k -> conf.get(k))
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32KB")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
      val skewed = spark.range(200000)
        .select(when($"id" % 100 < 85, lit(0L)).otherwise($"id" % 1000).as("k"), $"id".as("v"))
      val dim = spark.range(1000).select($"id".as("k2"), ($"id" * 2).as("w"))
      val joined = skewed.join(dim, $"k" === $"k2")
      assert(joined.count() == 200000L)
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"), s"AQE skew join did not activate:\n$plan")
    } finally saved.foreach { case (k, v) => conf.set(k, v) }
  }

  test("distinctCountTwoPhase equals countDistinct, incl. a hot key") {
    import spark.implicits._
    val df = ((1 to 1000).map(i => (1L, i % 17)) ++ // hot key, 17 distinct values
      (1 to 50).map(i => (2L, i)))                  // tail key, 50 distinct
      .toDF("k", "v")
    val twoPhase = ScaleOps.distinctCountTwoPhase(df, "k", "v")
      .orderBy("k").collect().map(r => (r.getLong(0), r.getLong(1)))
    val plain = df.groupBy("k").agg(countDistinct("v").as("d"))
      .orderBy("k").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(twoPhase.toSeq == plain.toSeq)
    assert(twoPhase.toSeq == Seq((1L, 17L), (2L, 50L)))
  }

  test("hashSample is deterministic, disjoint across ranges, and roughly proportional") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val a1 = ScaleOps.hashSample(docs, "doc_id", 0, 100).select("doc_id").collect().map(_.getLong(0)).toSet
    val a2 = ScaleOps.hashSample(docs, "doc_id", 0, 100).select("doc_id").collect().map(_.getLong(0)).toSet
    val b = ScaleOps.hashSample(docs, "doc_id", 100, 200).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a1 == a2)                      // deterministic
    assert(a1.intersect(b).isEmpty)       // disjoint splits
    val n = docs.count().toDouble
    assert(math.abs(a1.size / n - 0.1) < 0.05, s"${a1.size / n} not ~10%")
  }

  test("nPlanesFor applies the log2 sizing rule with clamps") {
    assert(Similarity.nPlanesFor(100000, 256) == 9)
    assert(Similarity.nPlanesFor(100, 256) == 4)    // clamp low
    assert(Similarity.nPlanesFor(Long.MaxValue) == 30) // clamp high
  }

  test("bucketedJoin plans with no shuffle exchange") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey", "l_quantity")
    val ord = spark.read.parquet(s"$sf/orders.parquet")
      .select("o_orderkey", "o_totalprice").withColumnRenamed("o_orderkey", "l_orderkey")

    ScaleOps.writeBucketed(li, "li_b", "l_orderkey", buckets = 8)
    ScaleOps.writeBucketed(ord, "ord_b", "l_orderkey", buckets = 8)
    // disable auto-broadcast: at test scale the planner broadcasts the
    // small side instead of using buckets; at 100 TB both sides are big
    // and the bucketed sort-merge path is what runs
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = ScaleOps.bucketedJoin(spark, "li_b", "ord_b", "l_orderkey")
      val physical = joined.queryExecution.executedPlan.toString
      // Spark prints shuffles as "Exchange hashpartitioning(...)" — the
      // round-1/2 "ShuffleExchange" spelling could never match (vacuous)
      assert(!physical.contains("Exchange hashpartitioning"),
        s"expected shuffle-free plan:\n$physical")
      assert(physical.contains("SortMergeJoin"), s"expected sort-merge join:\n$physical")
      assert(joined.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS ord_b")
    }
  }

  test("stratifiedHashSample: per-stratum proportions, determinism, nesting") {
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val rates = Map("en" -> 0.8, "es" -> 0.3, "zh" -> 0.0)
    val sampled = ScaleOps.stratifiedHashSample(docs, "doc_id", "lang", rates, defaultRate = 0.5)

    // determinism: two materializations identical
    val ids1 = sampled.select("doc_id").collect().map(_.getLong(0)).toSet
    val ids2 = sampled.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids1 == ids2)

    // per-stratum proportions near their rates (500-doc corpus → loose band)
    val perLang = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val sampledPerLang = sampled.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((lang, total) <- perLang if total >= 30) {
      val rate = rates.getOrElse(lang, 0.5)
      val got = sampledPerLang.getOrElse(lang, 0L).toDouble / total
      assert(math.abs(got - rate) < 0.2, s"$lang: got $got want ~$rate of $total")
    }
    assert(!sampledPerLang.contains("zh") || sampledPerLang("zh") == 0L)

    // nesting: raising every rate only ADDS rows
    val bigger = ScaleOps.stratifiedHashSample(
      docs, "doc_id", "lang", rates.map { case (k, r) => k -> math.min(1.0, r + 0.2) },
      defaultRate = 0.7)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids1.subsetOf(bigger), "retained set must be nested under higher rates")
  }

  test("stratifiedHashSampleMd5: same contract on auditable buckets; rate 1.0 keeps all") {
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val rates = Map("en" -> 0.8, "es" -> 0.3, "zh" -> 0.0)
    val sampled = ScaleOps.stratifiedHashSampleMd5(docs, "doc_id", "lang", rates,
      defaultRate = 0.5)

    // determinism: two materializations identical
    val ids1 = sampled.select("doc_id").collect().map(_.getLong(0)).toSet
    val ids2 = sampled.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids1 == ids2)

    // per-stratum proportions near their rates, as for the xxhash64 twin
    val perLang = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val sampledPerLang = sampled.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((lang, total) <- perLang if total >= 30) {
      val rate = rates.getOrElse(lang, 0.5)
      val got = sampledPerLang.getOrElse(lang, 0L).toDouble / total
      assert(math.abs(got - rate) < 0.2, s"$lang: got $got want ~$rate of $total")
    }
    assert(!sampledPerLang.contains("zh") || sampledPerLang("zh") == 0L)

    // nesting holds for the md5 buckets too
    val bigger = ScaleOps.stratifiedHashSampleMd5(
      docs, "doc_id", "lang", rates.map { case (k, r) => k -> math.min(1.0, r + 0.2) },
      defaultRate = 0.7)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids1.subsetOf(bigger), "retained set must be nested under higher rates")

    // rate 1.0 = the 9-char sentinel threshold: keeps EVERY row of the
    // stratum — including a key whose md5 prefix is exactly ffffffff,
    // which an 8-char 'ffffffff' cut would drop
    val all = ScaleOps.stratifiedHashSampleMd5(docs, "doc_id", "lang",
      Map.empty, defaultRate = 1.0)
    assert(all.count() == docs.count(), "rate 1.0 must keep all rows")
    assert(ScaleOps.mdHexThreshold(1.0).length == 9)
  }

  test("mixToTokenBudget approaches per-stratum token targets; untargeted strata drop") {
    import spark.implicits._
    // 300 docs per lang, ~20 tokens each → ~6000 tokens available per lang
    val docs = (0 until 900).map { i =>
      val lang = Seq("en", "es", "fr")(i % 3)
      (i.toLong, lang, 15 + (i * 13) % 11) // 15..25 tokens
    }.toDF("doc_id", "lang", "n_tokens")
    val targets = Map("en" -> 3000L, "es" -> 12000L) // es wants more than exists
    val rates = ScaleOps.tokenBudgetRates(docs, "lang", "n_tokens", targets)
    assert(rates("es") == 1.0, "target above availability caps at keep-everything")
    assert(rates("en") > 0.3 && rates("en") < 0.7, s"en rate ${rates("en")}")

    val mixed = ScaleOps.mixToTokenBudget(docs, "doc_id", "lang", "n_tokens", targets)
    val got = mixed.groupBy("lang").agg(sum("n_tokens").as("t")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!got.contains("fr"), "untargeted stratum must be excluded")
    val esTotal = docs.filter($"lang" === "es")
      .agg(sum($"n_tokens".cast("long"))).head.getLong(0)
    assert(got("es") == esTotal, "rate-1 stratum keeps everything")
    assert(math.abs(got("en") - 3000L) < 900L,
      s"en achieved ${got("en")} vs target 3000 (sampling tolerance)")
    // determinism
    val again = ScaleOps.mixToTokenBudget(docs, "doc_id", "lang", "n_tokens", targets)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again == mixed.select("doc_id").collect().map(_.getLong(0)).toSet)
  }

  test("weightedTokenSample: tight budget attainment under token skew, proportional inclusion") {
    import spark.implicits._
    // SKEWED weights: 10 giant docs (5000 tokens) among 290 small ones
    // (10 tokens) per lang — the shape where document-rate mixing's
    // attainment error blows up (one giant in/out swings ±5000)
    val docs = (0 until 600).map { i =>
      val lang = Seq("en", "es")(i % 2)
      val tokens = if (i < 20) 5000 else 10
      (i.toLong, lang, tokens)
    }.toDF("doc_id", "lang", "n_tokens")
    val targets = Map("en" -> 20000L)

    val kept = ScaleOps.weightedTokenSample(docs, "doc_id", "lang", "n_tokens", targets)
    val rows = kept.collect()
    assert(rows.forall(_.getString(1) == "en"), "untargeted stratum must drop")

    // tight attainment: achieved >= target (stratum not exhausted) and
    // overshoot bounded by ONE document's weight — by construction
    val achieved = rows.map(_.getInt(2).toLong).sum
    val maxKept = rows.map(_.getInt(2).toLong).max
    assert(achieved >= 20000L, s"undershoot: $achieved")
    assert(achieved - 20000L < maxKept, s"overshoot $achieved beyond one document")

    // vs document-rate mixing on the same skewed fixture: A-ES must be
    // strictly tighter (doc-rate error here is necessarily >= one giant
    // doc unless sampling got exactly lucky)
    val docRate = ScaleOps.mixToTokenBudget(docs, "doc_id", "lang", "n_tokens", targets)
      .agg(sum($"n_tokens".cast("long"))).head.getLong(0)
    assert(math.abs(achieved - 20000L) <= math.abs(docRate - 20000L),
      s"A-ES |${achieved - 20000L}| must not exceed doc-rate |${docRate - 20000L}|")

    // token-proportional: giants (0.17% of docs, 63% of tokens) must be
    // overrepresented among kept tokens vs their document share
    val giants = rows.count(_.getLong(0) < 20L)
    assert(giants >= 2, s"expected multiple giant docs in a token-proportional draw, got $giants")

    // determinism: pure function of (key, weights, targets)
    val again = ScaleOps.weightedTokenSample(docs, "doc_id", "lang", "n_tokens", targets)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again == rows.map(_.getLong(0)).toSet)
  }

  test("tokenBudgetRates excludes null strata (no 'null'-string collision)") {
    import spark.implicits._
    val docs = Seq(
      (1L, Some("en"), 100), (2L, Some("en"), 100),
      (3L, None, 500), (4L, None, 500), // unlabeled rows
      (5L, Some("null"), 40) // a stratum literally NAMED "null"
    ).toDF("doc_id", "lang", "n_tokens")
    val rates = ScaleOps.tokenBudgetRates(docs, "lang", "n_tokens",
      Map("en" -> 100L, "null" -> 20L))
    assert(rates("en") == 0.5)
    // the "null"-named stratum plans against ITS tokens (40), not the
    // unlabeled rows' 1000 — the collision the null filter prevents
    assert(rates("null") == 0.5, s"got ${rates("null")}")
  }

  test("boundedExhaustive passes small inputs through, fails fast past maxRows") {
    import spark.implicits._
    val small = (1 to 20).map(_.toLong).toDF("id")
    assert(ScaleOps.boundedExhaustive(small, "test-op").count() == 20)

    val ex = intercept[IllegalArgumentException] {
      ScaleOps.boundedExhaustive(small, "test-op", maxRows = 10)
    }
    assert(ex.getMessage.contains("all-pairs"))
    assert(ex.getMessage.contains("minHashNearDups"),
      "error must point at the bucketed scale path")
  }

  test("binnedIntervalJoin equals the naive predicate join on corpus data") {
    import spark.implicits._
    val ev = { val raw = spark.read.parquet(s"$sf/events.parquet")
      raw.withColumn("ts_sec", tsSecExpr(raw)) }
    val sessions = Sessionize.sessions(ev, "ts_sec", "event_id", gapSeconds = 1800L)
    val purchases = ev.filter($"event_type" === "purchase")
      .select("user_id", "event_id", "ts_sec")

    val binned = ScaleOps.binnedIntervalJoin(
        purchases, sessions, Seq("user_id"), "ts_sec", "start_sec", "end_sec", 1800L)
      .select("event_id", "session_idx")
    val naive = purchases.as("p").join(sessions.as("s"),
        $"p.user_id" === $"s.user_id" &&
          $"s.start_sec" <= $"p.ts_sec" && $"p.ts_sec" <= $"s.end_sec")
      .select($"p.event_id", $"s.session_idx")

    val b = binned.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val n = naive.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(b == n, s"binned=${b.size} naive=${n.size}")
    assert(b.nonEmpty, "fixture must produce at least one in-session purchase")
  }

  test("binnedIntervalJoin plans an equi shuffle join, not a nested loop") {
    import spark.implicits._
    val pts = Seq((1L, 5L), (1L, 42L)).toDF("k", "pt")
    val ivs = Seq((1L, 0L, 10L), (1L, 40L, 50L)).toDF("k", "lo", "hi")
    val plan = ScaleOps.binnedIntervalJoin(pts, ivs, Seq("k"), "pt", "lo", "hi", 10L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"banding must produce an equi join, plan:\n$plan")
    // an interval spanning several bins is replicated to each
    val wide = ScaleOps.binnedIntervalJoin(
      Seq((1L, 25L)).toDF("k", "pt"),
      Seq((1L, 0L, 100L)).toDF("k", "lo", "hi"), Seq("k"), "pt", "lo", "hi", 10L)
    assert(wide.count() == 1, "point must match a multi-bin interval exactly once")
  }

  test("bloomSemiJoin equals the exact semi join (false positives removed)") {
    import spark.implicits._
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    val dim = spark.read.parquet(s"$sf/customer.parquet")
      .filter($"c_mktsegment" === "BUILDING")
    val viaBloom = ScaleOps.bloomSemiJoin(orders, dim, "o_custkey", "c_custkey", 10000L)
      .select("o_orderkey").collect().map(_.getLong(0)).toSet
    val exact = orders.join(dim, $"o_custkey" === $"c_custkey", "left_semi")
      .select("o_orderkey").collect().map(_.getLong(0)).toSet
    assert(viaBloom == exact)
    assert(exact.nonEmpty)
  }

  test("bloomSemiJoin: native codegen probe prunes identically to the UDF twin") {
    import spark.implicits._
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    val dim = spark.read.parquet(s"$sf/customer.parquet")
      .filter($"c_mktsegment" === "MACHINERY")
    def keys(nativeProbe: Boolean): Set[Long] =
      ScaleOps.bloomSemiJoin(orders, dim, "o_custkey", "c_custkey", 10000L,
        nativeProbe = nativeProbe)
        .select("o_orderkey").collect().map(_.getLong(0)).toSet
    val native = keys(nativeProbe = true)
    assert(native == keys(nativeProbe = false))
    assert(native.nonEmpty)
  }

  test("bloomSemiJoin handles null fact keys (dropped, as semi join would)") {
    import spark.implicits._
    val fact = Seq(Some(1L), Some(2L), None).toDF("fk")
    val dim = Seq(1L, 3L).toDF("dk")
    val got = ScaleOps.bloomSemiJoin(fact, dim, "fk", "dk", 10L)
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(1L))
  }

  test("splitByGroup: no group straddles splits; assignment is total and deterministic") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val split = ScaleOps.splitByGroup(docs, "source")
    // leakage guard: each source maps to exactly one split
    val perGroup = split.groupBy("source")
      .agg(countDistinct($"split").as("n")).filter($"n" > 1)
    assert(perGroup.count() == 0)
    // total: every row assigned, only declared labels
    assert(split.filter($"split".isNull).count() == 0)
    val labels = split.select("split").distinct().collect().map(_.getString(0)).toSet
    assert(labels.subsetOf(Set("train", "val", "test")))
    // deterministic across evaluations
    val a = split.groupBy("split").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val b = ScaleOps.splitByGroup(docs, "source").groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a == b)
  }

  test("hll sketch rollup: merged estimate tracks exact distinct counts") {
    import spark.implicits._
    val ev = { val raw = spark.read.parquet(s"$sf/events.parquet")
      raw.withColumn("day", (tsSecExpr(raw) / 86400).cast("long")) }
    // fine-grained sketches per (type, day), rolled up to type
    val parts = ScaleOps.hllRollup(ev, Seq("event_type", "day"), "user_id")
    val est = ScaleOps.hllMergeEstimate(parts, Seq("event_type"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = ev.groupBy("event_type").agg(countDistinct($"user_id").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.keySet == exact.keySet)
    exact.foreach { case (k, n) =>
      assert(math.abs(est(k) - n).toDouble / n < 0.05,
        s"$k: est ${est(k)} vs exact $n")
    }
    // merge path ≈ single-pass sketch (associativity of the union)
    val single = ScaleOps.hllRollup(ev, Seq("event_type"), "user_id")
    val singleEst = single.select(col("event_type"),
        expr("hll_sketch_estimate(hll)").as("e"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.keySet.foreach { k =>
      assert(math.abs(est(k) - singleEst(k)).toDouble / math.max(singleEst(k), 1L) < 0.02,
        s"$k: merged ${est(k)} vs single-pass ${singleEst(k)}")
    }
  }

  test("sampleKPerGroup: exact size per group, deterministic, stable under repartition") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val sizes = ScaleOps.sampleKPerGroup(docs, "lang", "doc_id", 3)
      .groupBy("lang").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val avail = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    avail.foreach { case (g, n) => assert(sizes(g) == math.min(3L, n)) }
    // same pick regardless of physical layout
    val a = ScaleOps.sampleKPerGroup(docs, "lang", "doc_id", 3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = ScaleOps.sampleKPerGroup(docs.repartition(7), "lang", "doc_id", 3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b)
  }

  test("splitByGroup fractions roughly hold over many distinct groups") {
    import spark.implicits._
    val groups = (1 to 2000).map(i => (i.toLong, s"g$i")).toDF("id", "g")
    val counts = ScaleOps.splitByGroup(groups, "g", Seq("a" -> 0.5, "b" -> 0.5))
      .groupBy("split").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(counts("a") - 1000L) < 150, s"got $counts")
    val ex = intercept[IllegalArgumentException] {
      ScaleOps.splitByGroup(groups, "g", Seq("a" -> 0.5, "b" -> 0.4))
    }
    assert(ex.getMessage.contains("sum to 1"))
  }

  test("zOrderBy narrows per-partition ranges on BOTH dimensions") {
    import spark.implicits._
    val orders = spark.read.parquet(s"$sf/orders.parquet")

    // per-partition normalized spread of a column under a layout
    def spreads(df: org.apache.spark.sql.DataFrame, c: String): Double = {
      val full = orders.agg(max(col(c)).cast("double") - min(col(c)).cast("double"))
        .head().getDouble(0)
      val per = df.withColumn("__p", spark_partition_id())
        .groupBy("__p")
        .agg(((max(col(c)).cast("double") - min(col(c)).cast("double")) / full).as("s"))
        .agg(avg("s")).head().getDouble(0)
      per
    }

    val zed = ScaleOps.zOrderBy(orders, Seq("o_custkey", "o_totalprice"),
      bits = 8, numPartitions = 16)
    val oneDim = orders.repartitionByRange(16, $"o_custkey")

    // single-dim layout: custkey clustered, totalprice spans ~everything
    assert(spreads(oneDim, "o_totalprice") > 0.8)
    // z-order: both dimensions materially narrowed
    val zCust = spreads(zed, "o_custkey")
    val zPrice = spreads(zed, "o_totalprice")
    assert(zCust < 0.6 && zPrice < 0.6,
      s"z-order spreads: custkey=$zCust totalprice=$zPrice")
    // layout only: exact same rows
    assert(zed.count() == orders.count())
    assert(zed.agg(sum($"o_orderkey")).head().getLong(0) ==
      orders.agg(sum($"o_orderkey")).head().getLong(0))
  }

  test("zOrderBy degrades to identity when any column has no bounds") {
    import spark.implicits._
    val mixed = Seq((1L, Option.empty[Double]), (2L, None), (3L, None))
      .toDF("a", "b")
    // column b is all-null → no discriminating layout; rows unchanged
    assert(ScaleOps.zOrderBy(mixed, Seq("a", "b")).count() == 3)
  }

  test("heavyHitters equals brute-force GROUP BY on a skewed stream, any partitioning") {
    import spark.implicits._
    // Zipf-ish: item i appears ~3000/i times; plus a long tail of onces
    val stream =
      (1 to 40).flatMap(i => Seq.fill(3000 / i)(s"hot$i")) ++
        (1 to 5000).map(i => s"tail$i")
    val phi = 0.01

    def brute(df: org.apache.spark.sql.DataFrame) = {
      val n = df.count().toDouble
      df.groupBy($"item").agg(count(lit(1)).as("cnt"))
        .filter($"cnt" > phi * n)
        .orderBy("item").collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    }
    val expected = brute(stream.toDF("item"))
    assert(expected.nonEmpty && expected.size < 40)

    // result must be EXACT and independent of partitioning/merge order,
    // even though the sketch contents are not
    for (parts <- Seq(1, 7, 32)) {
      val df = stream.toDF("item").repartition(parts)
      val got = ScaleOps.heavyHitters(df, "item", phi)
        .orderBy("item").collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(got == expected, s"parts=$parts")
    }
  }

  test("MisraGries sketch: no false negatives above n/(k+1); estimates never exceed truth") {
    import spark.implicits._
    val stream = (1 to 20).flatMap(i => Seq.fill(500 / i)(s"h$i")) ++
      (1 to 2000).map(i => s"t$i")
    val n = stream.size
    val k = 50
    val truth = stream.groupBy(identity).map { case (i, xs) => i -> xs.size.toLong }
    val sketch = stream.toDF("item").repartition(13)
      .agg(graft.functions.MisraGries.sketch($"item", k))
      .head().getMap[String, Long](0)

    truth.foreach { case (item, c) =>
      if (c > n.toDouble / (k + 1))
        assert(sketch.contains(item), s"heavy item $item (count $c) missing")
    }
    sketch.foreach { case (item, est) =>
      assert(est <= truth(item), s"$item overestimated: $est > ${truth(item)}")
      assert(est >= truth(item) - n.toDouble / (k + 1) - 1, s"$item bound broken")
    }
  }

  test("heavyHitters on an empty frame returns an empty, well-typed result") {
    import spark.implicits._
    val empty = Seq.empty[String].toDF("item")
    val out = ScaleOps.heavyHitters(empty, "item", phi = 0.1)
    assert(out.columns.toSeq == Seq("item", "cnt") && out.count() == 0)
  }

  test("upsampleToTokenBudget: floor(rate)+frac copies, deterministic, near target") {
    import spark.implicits._
    // stratum "a": 100 docs x 100 tokens = 10k available, target 27k
    // → rate 2.7: every doc 2 or 3 copies; "b" targeted under 1x;
    // "c" untargeted → dropped
    val docs = (1 to 100).map(i => (i.toLong, "a", 100L)) ++
      (101 to 160).map(i => (i.toLong, "b", 50L)) ++
      (161 to 180).map(i => (i.toLong, "c", 10L))
    val df = docs.toDF("id", "g", "toks")
    val targets = Map("a" -> 27000L, "b" -> 1500L)
    val out = ScaleOps.upsampleToTokenBudget(df, "id", "g", "toks", targets).cache()

    assert(out.filter($"g" === "c").count() == 0)
    // per-doc copy counts: {2,3} for a (rate 2.7), {0,1} for b (rate .5)
    val perDocA = out.filter($"g" === "a").groupBy("id").count()
      .select("count").as[Long].collect()
    assert(perDocA.forall(c => c == 2 || c == 3))
    assert(out.filter($"g" === "b").groupBy("id").count()
      .select("count").as[Long].collect().forall(_ == 1))
    // copy_no enumerates repeats 1..k
    assert(out.filter($"g" === "a" && $"copy_no" === 3).count() ==
      perDocA.count(_ == 3))
    // achieved tokens bracket the target (doc-rate sampling error only)
    val gotA = out.filter($"g" === "a").agg(sum("toks")).as[Long].head()
    assert(gotA >= 20000 && gotA <= 30000 && math.abs(gotA - 27000) <= 2000,
      s"achieved $gotA for target 27000")
    // pure function of (key, targets): replay is identical
    val again = ScaleOps.upsampleToTokenBudget(df, "id", "g", "toks", targets)
    assert(out.exceptAll(again).count() == 0 && again.exceptAll(out).count() == 0)
  }

  test("curriculumOrder: equal-frequency bins, deterministic re-seedable shuffle key") {
    import spark.implicits._
    val df = (1L to 400L).map(i => (i, (i * 37) % 1000)).toDF("id", "difficulty")
    val out = ScaleOps.curriculumOrder(df, "id", "difficulty", nBins = 4, seed = 7L)
    val byBin = out.groupBy("bin").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(byBin.keySet == Set(1, 2, 3, 4))
    assert(byBin.values.forall(n => n >= 80 && n <= 120), s"skewed bins: $byBin")
    // bins respect the difficulty order: every bin-1 value <= every bin-4 value
    val max1 = out.filter($"bin" === 1).agg(max("difficulty")).as[Long].head()
    val min4 = out.filter($"bin" === 4).agg(min("difficulty")).as[Long].head()
    assert(max1 <= min4)
    // the key is a pure function of (seed, id): partitioning-invariant,
    // and a new seed is a genuinely different permutation
    val again = ScaleOps.curriculumOrder(
      df.repartition(13), "id", "difficulty", nBins = 4, seed = 7L)
    assert(out.select("id", "bin", "shuffle_key").exceptAll(
      again.select("id", "bin", "shuffle_key")).count() == 0)
    val reseeded = ScaleOps.curriculumOrder(df, "id", "difficulty", nBins = 4, seed = 8L)
    val order7 = out.orderBy("bin", "shuffle_key").select("id").as[Long].collect().toSeq
    val order8 = reseeded.orderBy("bin", "shuffle_key").select("id").as[Long].collect().toSeq
    assert(order7 != order8, "a new seed must re-permute")
    assert(order7.toSet == order8.toSet)
  }

  test("splitByGroup: a null group key gets a null split, not a silent bucket") {
    import spark.implicits._
    val rows = Seq((1L, Some("g1")), (2L, None), (3L, Some("g2")))
      .toDF("id", "g")
    val out = ScaleOps.splitByGroup(rows, "g")
      .collect().map(r => r.getLong(0) -> Option(r.getAs[String]("split"))).toMap
    assert(out(2L).isEmpty, "null group must not be assigned to any split")
    assert(out(1L).nonEmpty && out(3L).nonEmpty)
  }

  test("kmvCorpusOverlap: identical corpora estimate J=1, disjoint estimate J=0") {
    import spark.implicits._
    val a = (1L to 40L).map(i => s"a$i w$i x$i y$i z$i q$i v$i").zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val b = (1L to 40L).map(i => s"b$i m$i n$i o$i p$i r$i s$i").zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val same = ScaleOps.kmvCorpusOverlap(a, a, "text", w = 3, k = 64).head()
    assert(same.getAs[Double]("jaccard_est") == 1.0)
    val disj = ScaleOps.kmvCorpusOverlap(a, b, "text", w = 3, k = 64).head()
    assert(disj.getAs[Double]("jaccard_est") == 0.0)
    // below-k sides report EXACT distinct counts (40 docs x 5 shingles,
    // all distinct by construction = 200 > 64: use a smaller slice)
    val small = ScaleOps.kmvCorpusOverlap(
      a.limit(5), b.limit(5), "text", w = 3, k = 64).head()
    assert(small.getAs[Double]("d_a_est") == 25.0, small.toString)
  }

  test("kmvCorpusOverlap at small k tracks the exact Jaccard within KMV error") {
    // real corpus halves, k=256: |est - exact| must sit inside a loose
    // 5-sigma KMV bound (sigma ~ sqrt(J(1-J)/k) ~ 0.03 at J~0.2)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val a = docs.filter(pmod(col("doc_id"), lit(2)) === 0)
    val b = docs.filter(pmod(col("doc_id"), lit(2)) === 1)
    def shingles(df: org.apache.spark.sql.DataFrame) = {
      val toks = split(col("text"), " ")
      df.select(toks.as("t"), (size(toks) - 4).cast("int").as("n"))
        .where(col("n") >= 1)
        .select(col("t"), explode(sequence(lit(0), col("n") - 1)).as("p"))
        .select(md5(array_join(slice(col("t"), col("p") + 1, lit(5)), " ")).as("h"))
        .distinct()
    }
    val sa = shingles(a).withColumnRenamed("h", "ha")
    val sb = shingles(b).withColumnRenamed("h", "hb")
    val inter = sa.join(sb, sa("ha") === sb("hb"), "left_semi").count().toDouble
    val union = sa.count() + sb.count() - inter
    val exact = inter / union
    val est = ScaleOps.kmvCorpusOverlap(a, b, "text", w = 5, k = 256)
      .head().getAs[Double]("jaccard_est")
    val bound = 5.0 * math.sqrt(math.max(exact * (1 - exact), 0.01) / 256)
    assert(math.abs(est - exact) <= bound,
      s"est=$est exact=$exact bound=$bound")
  }

  test("kmvCorpusOverlap is partitioning-invariant (bottom-k is order-free)") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val a = docs.filter(pmod(col("doc_id"), lit(2)) === 0)
    val b = docs.filter(pmod(col("doc_id"), lit(2)) === 1)
    val one = ScaleOps.kmvCorpusOverlap(a, b, "text", w = 5, k = 128).head()
    val two = ScaleOps.kmvCorpusOverlap(
      a.repartition(17), b.repartition(3), "text", w = 5, k = 128).head()
    assert(one == two, s"$one vs $two")
  }

  test("solveMixBudget: scarcest source binds; allocations honor the normalized weights") {
    import spark.implicits._
    // web: 10k tokens, code: 1k, books: 500 — per-stratum caps at a
    // 2-epoch cap: web 2·10000/0.5 = 40000, code 2·1000/0.3 = 6666.7,
    // books 2·500/0.2 = 5000 — BOOKS is the scarcest source and binds
    val df = ((1 to 100).map(i => (s"w$i", "web", 100L)) ++
      (1 to 20).map(i => (s"c$i", "code", 50L)) ++
      (1 to 10).map(i => (s"b$i", "books", 50L)))
      .toDF("id", "src", "tok")
    val plan = ScaleOps.solveMixBudget(df, "src", "tok",
      Map("web" -> 0.5, "code" -> 0.3, "books" -> 0.2), maxEpochs = 2.0)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getBoolean(5))).sortBy(_._1)
    val byName = plan.map(p => p._1 -> p).toMap
    assert(byName("books")._6, "books must be the binding stratum")
    assert(!byName("web")._6 && !byName("code")._6)
    val tStar = 2.0 * 500 / 0.2
    assert(byName("web")._4 == math.floor(0.5 * tStar).toLong)
    assert(byName("code")._4 == math.floor(0.3 * tStar).toLong)
    assert(byName("books")._4 == math.floor(0.2 * tStar).toLong)
    assert(byName("books")._5 == 2.0, "binding stratum runs at the epoch cap")
    // a weighted stratum with no data makes the mix infeasible
    val infeasible = ScaleOps.solveMixBudget(df, "src", "tok",
      Map("web" -> 0.5, "latin" -> 0.5)).collect()
      .map(r => r.getString(0) -> ((r.getLong(3), r.getBoolean(5)))).toMap
    assert(infeasible("latin") == ((0L, true)), "absent stratum binds at zero")
    assert(infeasible("web") == ((0L, false)), "every allocation zeroes")
  }

  test("mixAtMaxBudget: down-sampled strata near allocation, up-sampled strata pass 1 epoch") {
    import spark.implicits._
    val df = ((1 to 100).map(i => (s"w$i", "web", 100L)) ++
      (1 to 20).map(i => (s"c$i", "code", 50L)))
      .toDF("id", "src", "tok")
    // weights 1:1, 3-epoch cap: code binds at T* = 2·3000... code avail
    // 1000 → T* = 3·1000/0.5 = 6000; web alloc 3000 (downsample from
    // 10k), code alloc 3000 (3 epochs of 1000)
    val mix = ScaleOps.mixAtMaxBudget(df, "id", "src", "tok",
      Map("web" -> 0.5, "code" -> 0.5), maxEpochs = 3.0)
    val toks = mix.groupBy("src").agg(sum("tok")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(toks("web") - 3000L) <= 100L,
      s"web downsample should land within one doc of 3000: ${toks("web")}")
    assert(toks("code") == 3000L, s"code upsample is exact here: ${toks("code")}")
    val copyMax = mix.filter(col("src") === "code").agg(max("copy_no")).head().getLong(0)
    assert(copyMax == 3L, "3-epoch code keeps numbered copies")
    // deterministic end-to-end
    val again = ScaleOps.mixAtMaxBudget(df, "id", "src", "tok",
      Map("web" -> 0.5, "code" -> 0.5), maxEpochs = 3.0)
    assert(mix.orderBy("src", "id", "copy_no").collect().toSeq ==
      again.orderBy("src", "id", "copy_no").collect().toSeq)
  }

  test("importanceResample: target-like docs win; deterministic; reseed = fresh draw") {
    import spark.implicits._
    // two sub-populations with distinct character distributions: the
    // target matches population A, so selection should be dominated by
    // A even though B outnumbers it 3:1 in the raw pool
    val rng = new scala.util.Random(7)
    def sentence(vocab: Seq[String], len: Int): String =
      Seq.fill(len)(vocab(rng.nextInt(vocab.size))).mkString(" ")
    val vocabA = Seq("protein", "genome", "enzyme", "cell", "dna", "molecular")
    val vocabB = Seq("xylophone", "quartz", "jukebox", "fuzzy", "whiskey", "vodka")
    val raw = ((1L to 50L).map(i => (i, sentence(vocabA, 12))) ++
      (51L to 200L).map(i => (i, sentence(vocabB, 12)))).toDF("doc_id", "text")
    val target = (1001L to 1030L).map(i => (i, sentence(vocabA, 12)))
      .toDF("doc_id", "text")
    val sel = ScaleOps.importanceResample(raw, target, "doc_id", "text", k = 30)
    val ids = sel.select("doc_id").collect().map(_.getLong(0))
    assert(ids.length == 30)
    val fromA = ids.count(_ <= 50)
    assert(fromA >= 25, s"target-like docs should dominate selection: $fromA/30 from A")
    // determinism: same seed, same selection, same keys
    val again = ScaleOps.importanceResample(raw, target, "doc_id", "text", k = 30)
    assert(sel.collect().toSeq == again.collect().toSeq)
    // reseed: a fresh permutation among close-weight docs (population A
    // members swap ranks), while gumbelScale = 0 is the pure-weight
    // top-k and ignores the seed entirely
    val reseeded = ScaleOps.importanceResample(
      raw, target, "doc_id", "text", k = 30, seed = 99L)
    assert(reseeded.select("doc_id").collect().map(_.getLong(0)).toSeq != ids.toSeq,
      "a fresh seed should reorder the selection")
    val pure1 = ScaleOps.importanceResample(
      raw, target, "doc_id", "text", k = 10, seed = 1L, gumbelScale = 0.0)
    val pure2 = ScaleOps.importanceResample(
      raw, target, "doc_id", "text", k = 10, seed = 2L, gumbelScale = 0.0)
    assert(pure1.collect().toSeq == pure2.collect().toSeq,
      "gumbelScale = 0 must be seed-independent")
  }

  test("shardByTokenBudget: equals the single-window cumsum, at ANY partition count") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val docs = (1L to 500L).map(i => (i, 1L + rng.nextInt(300).toLong)).toDF("id", "t")
    // reference: the one-window definition on one partition
    val ref = docs.coalesce(1)
      .withColumn("cum", sum("t").over(
        org.apache.spark.sql.expressions.Window.orderBy("id")
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .withColumn("shard", expr("(cum - t) div 1000"))
      .select("id", "shard")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (p <- Seq(1, 3, 7)) {
      val got = ScaleOps.shardByTokenBudget(docs, "id", "t", 1000L, parts = p)
        .select("id", "shard")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == ref, s"parts=$p diverged: ${got.toSet.diff(ref.toSet).take(5)}")
    }
    // shard numbers are monotone along the order and payloads bounded:
    // a shard never exceeds budget + one document (docs never split)
    val assigned = ScaleOps.shardByTokenBudget(docs, "id", "t", 1000L)
    val byShard = assigned.groupBy("shard").agg(sum("t").as("tot"), max("t").as("mx"))
      .collect()
    byShard.foreach { r =>
      assert(r.getLong(1) <= 1000L + 300L, s"shard ${r.get(0)} overshoots: ${r.getLong(1)}")
    }
    val shards = assigned.orderBy("id").select("shard").collect().map(_.getLong(0))
    assert(shards.sameElements(shards.sorted), "shards must be monotone in the order")
  }

  test("shardManifest: consistent with the shards; xor checksum catches a swapped id") {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    val docs = (1L to 400L).map(i => (i, 1L + rng.nextInt(200).toLong)).toDF("id", "t")
    val man = ScaleOps.shardManifest(docs, "id", "t", budget = 2000L)
      .collect().map(r =>
        r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    // manifest rows reconcile exactly with the shard assignment
    val byShard = ScaleOps.shardByTokenBudget(docs, "id", "t", 2000L)
      .groupBy("shard").agg(count(lit(1)).as("n"), sum("t").as("tot"),
        min("id").as("lo"), max("id").as("hi"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(man.keySet == byShard.keySet)
    man.foreach { case (s, (n, tot, lo, hi, _)) =>
      assert(byShard(s) == ((n, tot, lo, hi)), s"shard $s manifest drifted")
    }
    // integrity: a loader that read id 9 where id 8 belonged computes a
    // DIFFERENT checksum for that shard (and only that shard)
    def key60(id: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16)
    }
    val shardOf8 = ScaleOps.shardByTokenBudget(docs, "id", "t", 2000L)
      .filter(col("id") === 8L).select("shard").head().getLong(0)
    val tampered = man(shardOf8)._5 ^ key60(8L) ^ key60(9999L)
    assert(tampered != man(shardOf8)._5, "swapping a member must move the checksum")
    // the xor fold is order-independent and mergeable: recomputing the
    // checksum driver-side from the member ids reproduces it exactly
    val members = ScaleOps.shardByTokenBudget(docs, "id", "t", 2000L)
      .filter(col("shard") === shardOf8).select("id").collect().map(_.getLong(0))
    assert(members.map(key60).reduce(_ ^ _) == man(shardOf8)._5,
      "any engine must be able to recompute the shard checksum")
  }

  test("kmvOverlapMatrix: partition-independent sketches, estimates track exact overlap") {
    import spark.implicits._
    // three groups built from a shared 5-gram pool: A and B share ~half
    // their shingles, C is disjoint
    def doc(words: Seq[String]) = words.mkString(" ")
    val pool = (1 to 400).map(i => s"w$i")
    val a = (0 until 40).map(i => ("A", doc(pool.slice(i * 5, i * 5 + 9))))
    val b = (0 until 40).map(i => ("B", doc(pool.slice(i * 5 + 100, i * 5 + 109))))
    val c = (0 until 40).map(i => ("C", doc((1 to 9).map(j => s"z${i}_$j"))))
    val df = (a ++ b ++ c).toDF("source", "text")
    val m = ScaleOps.kmvOverlapMatrix(df, "source", "text", w = 5, k = 64)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getInt(3), r.getDouble(6))).toMap
    assert(m.keySet == Set(("A", "B"), ("A", "C"), ("B", "C")))
    // C is shingle-disjoint from both
    assert(m(("A", "C"))._2 == 0.0 && m(("B", "C"))._2 == 0.0)
    // A∩B is real and the estimate is positive and below 1
    val ab = m(("A", "B"))._2
    assert(ab > 0.0 && ab < 1.0, s"A-B overlap estimate $ab")
    // sketches are merge-order independent: a different partitioning
    // yields the identical matrix
    val m2 = ScaleOps.kmvOverlapMatrix(df.repartition(7), "source", "text",
        w = 5, k = 64)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getInt(3), r.getDouble(6))).toMap
    assert(m2 == m, "bottom-k merge must be order/partition independent")
    // exact overlap for the A/B construction: estimate within a loose
    // sketch-error band of the true shingle Jaccard
    val sh = (s: Seq[(String, String)]) => s.flatMap { case (_, t) =>
      val w = t.split(" "); (0 to w.length - 5).map(i => w.slice(i, i + 5).mkString(" "))
    }.toSet
    val exact = {
      val (sa, sb) = (sh(a), sh(b))
      sa.intersect(sb).size.toDouble / sa.union(sb).size
    }
    assert(math.abs(ab - exact) <= 0.15, s"est $ab vs exact $exact")

    // incremental advance: sketch-merge of a split corpus equals the
    // one-shot rebuild EXACTLY — bottom-k of a union is the bottom-k of
    // the sub-sketches' union — and replaying the batch is a no-op on
    // the matrix
    val (h, bt) = (df.filter(length(col("text")) % 2 === 0),
      df.filter(length(col("text")) % 2 =!= 0))
    val store = ScaleOps.kmvSketches(h, "source", "text", w = 5, k = 64)
    val (newStore, matIncr) = ScaleOps.kmvOverlapMatrixAdvance(
      store, bt, "source", "text", w = 5, k = 64)
    val viaIncr = matIncr.collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getInt(3), r.getDouble(6))).toMap
    assert(viaIncr == m, "advance(store, batch) must equal the full rebuild")
    val sk1 = newStore.collect()
      .map(r => r.getString(0) -> r.getSeq[Long](1).toSeq).toMap
    val skFull = ScaleOps.kmvSketches(df, "source", "text", w = 5, k = 64)
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toSeq).toMap
    assert(sk1 == skFull, "merged sketch state must equal the from-scratch state")
  }

  test("temperatureTargets: α=1 is natural proportions, small α flattens toward uniform") {
    import spark.implicits._
    // two strata, 9:1 token split
    val df = (1L to 90L).map(i => (i, "big", 100L)) ++
      (91L to 100L).map(i => (i, "small", 100L))
    val d = df.toDF("id", "lang", "t")
    val nat = ScaleOps.temperatureTargets(d, "lang", "t", alpha = 1.0, totalTokens = 1000L)
    // α=1: shares are the natural 0.9/0.1 (exact decimals here)
    assert(nat == Map("big" -> 900L, "small" -> 100L))
    val flat = ScaleOps.temperatureTargets(d, "lang", "t", alpha = 0.3, totalTokens = 1000L)
    // α<1 lifts the tail and trims the head, monotonically in between
    assert(flat("small") > 100L && flat("big") < 900L)
    assert(flat("small") < flat("big"), "α>0 must preserve the ordering")
    // allocations never exceed the budget (floor rounding per stratum)
    assert(flat.values.sum <= 1000L && nat.values.sum <= 1000L)
    // realization attains each target within one document's tokens
    val mix = ScaleOps.temperatureSample(d, "id", "lang", "t", 0.3, 1000L)
      .groupBy("lang").agg(sum("t").as("tot"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    flat.foreach { case (l, tgt) =>
      val got = mix.getOrElse(l, 0L)
      assert(got <= tgt + 100L && (got >= tgt - 100L || tgt <= 100L),
        s"$l attained $got vs target $tgt")
    }
  }

  test("sampleQuantiles: nearest-rank hand-check, partitioning-invariant, q=1 is the sample max") {
    import spark.implicits._
    val df = (1 to 100).map(i => (i.toLong, i.toDouble)).toDF("id", "v")
    // k >= n: the sample IS the population — nearest-rank is exact
    val got = ScaleOps.sampleQuantiles(df, "id", "v", k = 1000,
      qs = Seq(0.25, 0.5, 1.0))
      .collect().map(r => r.getDouble(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(got(0.25)._2 == 100L)
    assert(got(0.25)._1 == 25.0)           // ceil(0.25*100) = 25
    assert(got(0.5)._1 == 50.0)
    assert(got(1.0)._1 == 100.0)           // q=1 -> the maximum
    // deterministic under repartitioning (KMV order is a pure function
    // of the md5 keys)
    val a = ScaleOps.sampleQuantiles(df.repartition(7), "id", "v", 10, Seq(0.5))
      .head.getDouble(1)
    val b = ScaleOps.sampleQuantiles(df.coalesce(1), "id", "v", 10, Seq(0.5))
      .head.getDouble(1)
    assert(a == b)
  }

  test("sampleQuantiles plans the sample as TakeOrdered, not a global sort") {
    import spark.implicits._
    val df = (1 to 100).map(i => (i.toLong, i.toDouble)).toDF("id", "v")
    val plan = ScaleOps.sampleQuantiles(df, "id", "v", 10, Seq(0.5))
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"sample must be per-partition top-k, not a global sort:\n$plan")
  }

  test("skewAdvisor: heavy keys, exact share, salt caps tasks at the target") {
    import spark.implicits._
    // key 1: 10 rows, key 2: 4 rows, key 3: 1 row (total 15)
    val df = (Seq.fill(10)(1) ++ Seq.fill(4)(2) ++ Seq(3)).toDF("k")
    val got = ScaleOps.skewAdvisor(df, "k", targetPerTask = 3)
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2), r.getInt(3))).toMap
    assert(got.keySet == Set(1, 2), s"only keys above the target fire: $got")
    assert(got(1) == ((10L, 10.0 / 15.0, 4)))  // ceil(10/3) = 4 salts
    assert(got(2) == ((4L, 4.0 / 15.0, 2)))
    // minShare pulls in below-target keys too
    val withShare = ScaleOps.skewAdvisor(df, "k", targetPerTask = 100, minShare = 0.1)
      .collect().map(_.getInt(0)).toSet
    assert(withShare == Set(1, 2), "share gate fires independently of the row gate")
  }

  test("sampleQuantilesByGroup: exact per group when k >= group size; partitioning-invariant") {
    import spark.implicits._
    // group a: values 1..20; group b: values 101..110
    val df = ((1 to 20).map(i => ("a", i.toLong, i.toDouble)) ++
      (101 to 110).map(i => ("b", i.toLong, i.toDouble))).toDF("g", "id", "v")
    val got = ScaleOps.sampleQuantilesByGroup(df, "g", "id", "v", k = 100,
      qs = Seq(0.5, 1.0))
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> (r.getDouble(2), r.getLong(3))).toMap
    assert(got(("a", 0.5)) == ((10.0, 20L)))   // ceil(0.5*20) = 10
    assert(got(("a", 1.0)) == ((20.0, 20L)))
    assert(got(("b", 0.5)) == ((105.0, 10L)))
    assert(got(("b", 1.0)) == ((110.0, 10L)))
    // saturated (k < group size): identical under any partitioning
    val s1 = ScaleOps.sampleQuantilesByGroup(df.repartition(9), "g", "id", "v", 7, Seq(0.5))
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    val s2 = ScaleOps.sampleQuantilesByGroup(df.coalesce(1), "g", "id", "v", 7, Seq(0.5))
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(s1 == s2)
  }

  test("BottomKValues keeps the values of the k smallest hashes, merge-order-free") {
    val agg = new graft.functions.BottomKValues(3)
    // hashes 5,1,9,3 with values 50,10,90,30 -> keep h 1,3,5 -> values 10,30,50
    val buf = Seq((5L, 50.0), (1L, 10.0), (9L, 90.0), (3L, 30.0))
      .foldLeft(agg.zero)(agg.reduce)
    assert(agg.finish(buf).toSeq == Seq(10.0, 30.0, 50.0))
    // duplicate hash keeps the first value
    val dup = agg.reduce(buf, (3L, 999.0))
    assert(agg.finish(dup).toSeq == Seq(10.0, 30.0, 50.0))
    // merging two partials equals the direct build
    val left = Seq((5L, 50.0), (1L, 10.0)).foldLeft(agg.zero)(agg.reduce)
    val right = Seq((9L, 90.0), (3L, 30.0)).foldLeft(agg.zero)(agg.reduce)
    assert(agg.finish(agg.merge(left, right)).toSeq == Seq(10.0, 30.0, 50.0))
  }

  test("joinCardinalityEstimate: exact when sketches are unsaturated; tracks the true join size") {
    import spark.implicits._
    // A: keys 1..10 with 3 rows each; B: keys 6..15 with 2 rows each
    // overlap = 5 keys -> true join rows = 5 * 3 * 2 = 30
    val a = (1 to 10).flatMap(i => Seq.fill(3)(i.toLong)).toDF("ka")
    val b = (6 to 15).flatMap(i => Seq.fill(2)(i.toLong)).toDF("kb")
    val r = ScaleOps.joinCardinalityEstimate(a, "ka", b, "kb", k = 64).head()
    assert(r.getLong(1) == 30L && r.getLong(2) == 20L)        // n_a, n_b
    assert(r.getDouble(4) == 10.0 && r.getDouble(5) == 10.0)  // exact distincts (k > d)
    assert(r.getDouble(6) == 15.0)                            // union exact
    assert(r.getDouble(7) == 5.0)                             // overlap exact
    assert(r.getDouble(8) == 30.0, s"est_join_rows ${r.getDouble(8)}") // exact fan-out
    // partitioning invariance (mergeable sketch, exact counts)
    val r2 = ScaleOps.joinCardinalityEstimate(
      a.repartition(7), "ka", b.repartition(3), "kb", k = 64).head()
    assert(r2.getDouble(8) == 30.0 && r2.getDouble(7) == 5.0)
    // saturated sketches on the real fixture: estimate within 25% of truth
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    val cust = spark.read.parquet(s"$sf/customer.parquet")
    val est = ScaleOps.joinCardinalityEstimate(
      orders, "o_custkey", cust, "c_custkey", k = 128).head().getDouble(8)
    val truth = orders.join(cust, col("o_custkey") === col("c_custkey")).count()
    assert(est > truth * 0.75 && est < truth * 1.25,
      s"estimate $est vs true $truth")
  }
}
