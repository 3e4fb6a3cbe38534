package graft.quality

import org.apache.spark.sql.functions._

import graft.SparkSpec

class OutliersSpec extends SparkSpec {

  import spark.implicits._

  test("winsorize clips to discrete per-group percentile bounds") {
    // group a: values 1..10 — percentile_disc(0.05)=1 (cume 0.1 ≥ 0.05),
    // percentile_disc(0.95)=10 (first value with cume_dist ≥ 0.95)
    // group b: 100, 200, ..., 1000 plus an outlier 1e9
    val df = ((1 to 10).map(i => ("a", i.toDouble)) ++
      (1 to 10).map(i => ("b", i * 100.0)) :+ ("b", 1e9))
      .toDF("g", "v")
    val w = Outliers.winsorize(df, "v", Seq("g"), 0.05, 0.90)
    val a = w.filter($"g" === "a").agg(min("v_w"), max("v_w")).head()
    // a: n=10, p05 → first value cume_dist ≥ .05 is 1; p90 → 9
    assert(a.getDouble(0) == 1.0 && a.getDouble(1) == 9.0)
    val b = w.filter($"g" === "b").agg(max("v_w")).head()
    // b: n=11, p90 → ceil(.9*11)=10th value = 1000 — outlier clipped
    assert(b.getDouble(0) == 1000.0)
    // row count unchanged; original column untouched
    assert(w.count() == df.count())
    assert(w.filter($"g" === "b").agg(max("v")).head().getDouble(0) == 1e9)
  }

  test("winsorize bounds are actual data values (discrete, no interpolation)") {
    val vals = Seq(1.13, 2.77, 3.01, 4.99, 5.55, 6.02, 7.31, 8.88)
    val df = vals.map(("g", _)).toDF("g", "v")
    val w = Outliers.winsorize(df, "v", Seq("g"), 0.3, 0.7)
    val clipped = w.select("v_w").collect().map(_.getDouble(0)).toSet
    assert(clipped.subsetOf(vals.toSet), s"bounds must be members of the data: $clipped")
  }

  test("winsorize and winsorizeApprox keep null-group rows, clipped within the null group") {
    val df = Seq(
      (Some("a"), 1.0), (Some("a"), 2.0), (Some("a"), 3.0),
      (None, 10.0), (None, 20.0), (None, 30.0), (None, 1e9))
      .toDF("g", "v")
    for (w <- Seq(
        Outliers.winsorize(df, "v", Seq("g"), 0.05, 0.75),
        Outliers.winsorizeApprox(df, "v", Seq("g"), 0.05, 0.75))) {
      assert(w.count() == 7, "null-group rows must not be dropped")
      // null group n=4: p75 → first value with cume_dist ≥ .75 is 30 —
      // the 1e9 outlier clips to it, WITHIN the null group's own bounds
      val hi = w.filter($"g".isNull).agg(max("v_w")).head().getDouble(0)
      assert(hi == 30.0, s"null group must clip to its own bound, got $hi")
    }
  }

  test("winsorizeApprox bounds are near the exact ones on corpus data") {
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    val exact = Outliers.winsorize(orders, "o_totalprice", Seq("o_orderpriority"))
      .groupBy("o_orderpriority").agg(max("o_totalprice_w").as("hi"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val approx = Outliers.winsorizeApprox(orders, "o_totalprice", Seq("o_orderpriority"))
      .groupBy("o_orderpriority").agg(max("o_totalprice_w").as("hi"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    exact.foreach { case (g, hi) =>
      assert(math.abs(approx(g) - hi) / hi < 0.1,
        s"group $g: approx ${approx(g)} vs exact $hi")
    }
  }

  test("robustScale: hand-checked median/MAD, outlier insensitivity, zero-MAD null") {
    // group a: 1..7 → med=4, |dev|={3,2,1,0,1,2,3} → MAD=2; x=7 → rz=1.5
    val a = (1 to 7).map(i => ("a", i.toDouble))
    // group b: constant-majority → MAD=0 → null scores
    val b = Seq(("b", 5.0), ("b", 5.0), ("b", 5.0), ("b", 9.0))
    val df = (a ++ b).toDF("g", "v")
    val out = Outliers.robustScale(df, "v", Seq("g"))
    val a7 = out.filter($"g" === "a" && $"v" === 7.0).head().getAs[Double]("v_rz")
    assert(a7 == 1.5)
    assert(out.filter($"g" === "b").collect().forall(_.isNullAt(2)))

    // robustness: a wild outlier barely moves the other rows' scores
    // (mean/stddev scaling would shrink them toward 0)
    val spiked = (a :+ ("a", 1e9)).toDF("g", "v")
    val spk = Outliers.robustScale(spiked, "v", Seq("g"))
      .filter($"v" === 7.0).head().getAs[Double]("v_rz")
    assert(math.abs(spk - 1.5) <= 0.5, s"robust score moved to $spk")
  }

  test("robustScale keeps null-group rows, scaled within the null group") {
    val df = Seq(
      (Some("a"), 1.0), (Some("a"), 2.0), (Some("a"), 3.0),
      (None, 10.0), (None, 20.0), (None, 30.0))
      .toDF("g", "v")
    val out = Outliers.robustScale(df, "v", Seq("g"))
    assert(out.count() == 6, "null-group rows must not be dropped")
    // null group: med=20, MAD=10 → v=30 scores 1.0
    val z = out.filter($"g".isNull && $"v" === 30.0).head().getAs[Double]("v_rz")
    assert(z == 1.0)
  }

  test("quantileBin: equal-frequency bins, ties share a bin, null groups kept") {
    // 1..8 in one group → quartiles at 2, 4, 6: bins {1,2}{3,4}{5,6}{7,8}
    val df = (1 to 8).map(i => ("a", i.toDouble)).toDF("g", "v")
    val bins = Outliers.quantileBin(df, "v", Seq("g"), nBins = 4)
      .collect().map(r => r.getDouble(1) -> r.getInt(2)).toMap
    assert(bins == Map(1.0 -> 1, 2.0 -> 1, 3.0 -> 2, 4.0 -> 2,
      5.0 -> 3, 6.0 -> 3, 7.0 -> 4, 8.0 -> 4))
    // ties never straddle: constant data lands in ONE bin
    val const = Seq.fill(9)(("c", 5.0)).toDF("g", "v")
    val cb = Outliers.quantileBin(const, "v", Seq("g"), nBins = 3)
      .select("v_bin").distinct().collect().map(_.getInt(0))
    assert(cb.length == 1)
    // null group rows survive
    val withNull = df.unionByName(Seq((null: String, 9.0)).toDF("g", "v"))
    assert(Outliers.quantileBin(withNull, "v", Seq("g"), 4).count() == 9)
  }

  test("winsorize broadcast-joins the bounds (no extra shuffle for the clip)") {
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    val plan = Outliers.winsorize(orders, "o_totalprice", Seq("o_orderpriority"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"bounds must broadcast, plan:\n$plan")
  }

  test("refIntegrity: orphans, null keys, fan-out, childless parents — one row") {
    import spark.implicits._
    val child = Seq(Some(1L), Some(1L), Some(1L), Some(2L), Some(99L), None)
      .toDF("fk")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val r = Validator.refIntegrity(child, "fk", parent, "pk").head()
    assert(r.getLong(0) == 6L, "child rows")
    assert(r.getLong(1) == 1L, "one null key — neither orphan nor matched")
    assert(r.getLong(2) == 1L, "99 is an orphan")
    assert(r.getLong(3) == 4L, "matched rows")
    assert(r.getLong(4) == 3L, "max fan-out is key 1")
    assert(r.getLong(5) == 3L, "distinct non-null child keys")
    assert(r.getLong(6) == 3L && r.getLong(7) == 1L, "parent 3 is childless")
  }

  test("fdViolations: only violating groups, counts and sorted capped sample") {
    import spark.implicits._
    val df = Seq(
      ("a", "en"), ("a", "en"), ("a", "de"),   // violation: 2 rhs, 3 rows
      ("b", "fr"), ("b", "fr"),                // holds — excluded
      ("c", "zz"), ("c", "en"), ("c", "de"),   // violation: 3 rhs
      ("d", null)).toDF("src", "lang")         // single (null) rhs — holds
    val got = Validator.fdViolations(df, Seq("src"), "lang", sampleValues = 2)
      .orderBy("src").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(got.toSeq == Seq(
      ("a", 2L, 3L, "de,en"),
      ("c", 3L, 3L, "de,en")), s"got ${got.toSeq}") // sample capped at 2, sorted
  }

  test("correlationMatrix: perfect/anti/zero-variance arms, exact-decimal determinism") {
    import spark.implicits._
    // y = 2x (corr 1), z = -x (corr -1), w constant (zero variance -> NULL)
    val df = (1 to 50).map(i => (i.toDouble, 2.0 * i, -i.toDouble, 7.0))
      .toDF("x", "y", "z", "w")
    val got = Validator.correlationMatrix(df, Seq("x", "y", "z", "w"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> Option(r.get(2))).toMap
    assert(got.size == 10)
    def c(a: String, b: String) = got((a, b)).get.asInstanceOf[Double]
    assert(math.abs(c("x", "x") - 1.0) < 1e-12)
    assert(math.abs(c("x", "y") - 1.0) < 1e-12)
    assert(math.abs(c("x", "z") + 1.0) < 1e-12)
    assert(got(("x", "w")).isEmpty, "zero variance must surface NULL, not a blow-up")
    assert(got(("w", "w")).isEmpty)
    // partitioning invariance: exact decimal sums
    val a1 = Validator.correlationMatrix(df.repartition(7), Seq("x", "y")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    val a2 = Validator.correlationMatrix(df.coalesce(1), Seq("x", "y")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(a1 == a2)
  }

  test("correlationMatrixByGroup: each slice equals the filtered global matrix (12dp grid)") {
    import spark.implicits._
    val df = (1 to 60).map { i =>
      val g = if (i % 2 == 0) "even" else "odd"
      // different dependency per slice: y=2x on even, y=-x+noise-free on odd
      val y = if (i % 2 == 0) 2.0 * i else -i.toDouble
      (g, i.toDouble, y)
    }.toDF("g", "x", "y")
    val grouped = Validator.correlationMatrixByGroup(df, "g", Seq("x", "y"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)) -> r.getDouble(3)).toMap
    Seq("even", "odd").foreach { g =>
      val global = Validator.correlationMatrix(df.filter(col("g") === g), Seq("x", "y"))
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
      global.foreach { case ((a, b), c) =>
        assert(grouped((g, a, b)) == math.round(c * 1e12) / 1e12.toDouble ||
          math.abs(grouped((g, a, b)) - c) < 1e-12,
          s"slice $g pair ($a,$b): ${grouped((g, a, b))} vs $c")
      }
    }
    assert(grouped(("even", "x", "y")) == 1.0 && grouped(("odd", "x", "y")) == -1.0)
  }

  test("correlationMatrix fails LOUDLY when a value could overflow the decimal sums") {
    import spark.implicits._
    // 10^(18-6) = 1e12: at scale 6 a value beyond it would cast to NULL
    // in non-ANSI mode and silently skip rows the count keeps
    val big = Seq((1.5e12, 1.0), (2.0, 2.0)).toDF("x", "y")
    val e = intercept[Exception] {
      Validator.correlationMatrix(big, Seq("x", "y")).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("correlation_matrix")),
      s"expected the overflow raise_error, got $e")
    // in-budget magnitudes still pass
    val ok = Seq((1.0e9, 1.0), (2.0, 2.0)).toDF("x", "y")
    assert(Validator.correlationMatrix(ok, Seq("x", "y")).collect().length == 3)
  }

  test("correlationMatrixByGroup's overflow error names the offending group") {
    import spark.implicits._
    // only slice "hot" overflows; the error must localize to it
    val df = Seq(("hot", 1.5e12, 1.0), ("hot", 2.0, 2.0),
      ("cold", 3.0, 4.0), ("cold", 5.0, 6.0)).toDF("g", "x", "y")
    val e = intercept[Exception] {
      Validator.correlationMatrixByGroup(df, "g", Seq("x", "y")).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(m => m.contains("correlation_matrix") && m.contains("hot")),
      s"the per-group gate must name the slice, got $e")
  }

  test("mutualInformation: identical columns share all entropy; independent share none") {
    import spark.implicits._
    // identical columns: MI == H (up to the 6dp ln grid)
    val same = (1 to 90).map(i => (s"c${i % 3}", s"c${i % 3}")).toDF("a", "b")
    val r1 = Validator.mutualInformation(same, "a", "b").head()
    assert(r1.getLong(0) == 90L && r1.getLong(1) == 3L)
    assert(math.abs(r1.getDouble(4) - r1.getDouble(2)) < 1e-5,
      s"MI ${r1.getDouble(4)} should equal H_a ${r1.getDouble(2)}")
    assert(r1.getDouble(2) > 1.0985 && r1.getDouble(2) < 1.0987, "H(uniform 3) = ln 3")
    // independent uniform grid: MI exactly 0 on the 6dp grid
    val indep = (0 until 90).map(i => (s"a${i % 3}", s"b${i / 30}")).toDF("a", "b")
    val r2 = Validator.mutualInformation(indep, "a", "b").head()
    assert(r2.getLong(1) == 9L)
    assert(math.abs(r2.getDouble(4)) < 1e-9, s"independent MI ${r2.getDouble(4)}")
  }

  test("snapshotDiff: added/removed/changed/unchanged with carried columns") {
    import spark.implicits._
    val old = Seq(
      (1L, "alpha", "web"), (2L, "beta", "web"), (3L, "gamma", "books"))
      .toDF("id", "text", "source")
    val neu = Seq(
      (2L, "beta", "web"),          // unchanged
      (3L, "gamma v2", "books"),    // changed
      (4L, "delta", "wiki"))        // added; 1 removed
      .toDF("id", "text", "source")
    val got = Validator.snapshotDiff(old, neu, "id", Seq("text"), Seq("source"))
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(got.toSeq == Seq(
      (1L, "removed", "web"),
      (2L, "unchanged", "web"),
      (3L, "changed", "books"),
      (4L, "added", "wiki")), s"got ${got.toSeq}")
  }

  test("snapshotDiff: multi-column payload distinguishes field moves") {
    import spark.implicits._
    // ('ab','c') vs ('a','bc') must NOT collide — the  separator
    val old = Seq((1L, "ab", "c")).toDF("id", "a", "b")
    val neu = Seq((1L, "a", "bc")).toDF("id", "a", "b")
    val r = Validator.snapshotDiff(old, neu, "id", Seq("a", "b")).head()
    assert(r.getString(1) == "changed")
  }

  test("snapshotDiff plan: shuffle carries fingerprints, not payload text") {
    import spark.implicits._
    val old = Seq((1L, "alpha", "web")).toDF("id", "text", "source")
    val neu = Seq((1L, "alpha", "web")).toDF("id", "text", "source")
    val plan = Validator.snapshotDiff(old, neu, "id", Seq("text"), Seq("source"))
      .queryExecution.executedPlan.toString
    // the join inputs are projected to (id, md5, carry) BEFORE the
    // exchange: no raw `text` column may survive into the join schema
    assert(!plan.contains("text#") ||
      plan.indexOf("Exchange") < 0 ||
      !plan.substring(plan.indexOf("Exchange")).contains("text#"),
      s"payload text crossed the shuffle:\n$plan")
  }
}
