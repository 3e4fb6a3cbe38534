package graft.quality

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DriftSpec extends SparkSpec {

  test("ksDrift: hand-checked D on a known pair, exact argmax and tie-break") {
    import spark.implicits._
    // A = {1,2,3,4}, B = {3,4,5,6}: F_A-F_B = 1/4 at 1, 2/4 at 2,
    // 2/4 at 3 (3/4-1/4), 2/4 at 4, 1/4 at 5, 0 at 6 -> D = 1/2,
    // first attained at v=2 (smallest value wins the tie against 3, 4)
    val a = Seq(1L, 2L, 3L, 4L).toDF("v")
    val b = Seq(3L, 4L, 5L, 6L).toDF("v")
    val r = Drift.ksDrift(a, b, "v").head()
    assert(r.getLong(0) == 4L && r.getLong(1) == 4L)
    assert(r.getDouble(2) == 0.5)
    assert(r.getDouble(3) == 2.0, s"tie must break to the smallest value, got ${r.getDouble(3)}")
  }

  test("ksDrift: identical samples give D=0; disjoint ranges give D=1") {
    import spark.implicits._
    val x = Seq(10L, 20L, 30L).toDF("v")
    assert(Drift.ksDrift(x, x, "v").head().getDouble(2) == 0.0)
    val lo = Seq(1L, 2L).toDF("v")
    val hi = Seq(100L, 200L).toDF("v")
    assert(Drift.ksDrift(lo, hi, "v").head().getDouble(2) == 1.0)
  }

  test("ksDrift: continuous doubles are NOT binned to an integer grid") {
    import spark.implicits._
    // 1.4 vs 1.6 used to collapse onto one grid point under the old
    // cast("long"), reading D=0 for clearly shifted samples
    val a = Seq(1.4, 1.4, 1.4).toDF("v")
    val b = Seq(1.6, 1.6, 1.6).toDF("v")
    val r = Drift.ksDrift(a, b, "v").head()
    assert(r.getDouble(2) == 1.0, s"disjoint continuous samples must give D=1, got $r")
    assert(r.getDouble(3) == 1.4)
  }

  test("ksDrift is partitioning-invariant (partition-offset prefix sums)") {
    val d = spark.read.parquet(s"$sf/documents.parquet")
    val a = d.filter(col("lang") === "en")
    val b = d.filter(col("lang") =!= "en")
    val r1 = Drift.ksDrift(a.repartition(13), b.repartition(5), "n_chars").head()
    val r2 = Drift.ksDrift(a.coalesce(1), b.coalesce(1), "n_chars").head()
    assert(r1.getDouble(2) == r2.getDouble(2))
    assert(r1.getDouble(3) == r2.getDouble(3))
  }

  test("ksDrift: no global single-partition window in the plan") {
    val d = spark.read.parquet(s"$sf/documents.parquet")
    val df = Drift.ksDrift(
      d.filter(col("lang") === "en"), d.filter(col("lang") =!= "en"), "n_chars")
    val exchanges = "Exchange SinglePartition".r
      .findAllIn(df.queryExecution.executedPlan.toString).length
    // the TakeOrdered(1) merge is the only single-partition gather;
    // the prefix sum itself must stay range-partitioned
    assert(exchanges <= 1,
      s"prefix sum must not serialize into one partition:\n${df.queryExecution.executedPlan}")
  }

  test("ksDriftByGroup: hand-checked per-group D; one-sided groups flagged, never dropped") {
    import spark.implicits._
    // g1 replays q253's hand example per group: A={1,2,3,4}, B={3,4,5,6}
    // → D = 1/2 first attained at v=2; g2 exists on side A only
    val a = Seq(("g1", 1L, 1.0), ("g1", 2L, 2.0), ("g1", 3L, 3.0),
      ("g1", 4L, 4.0), ("g2", 9L, 7.0)).toDF("g", "k", "v")
    val b = Seq(("g1", 5L, 3.0), ("g1", 6L, 4.0), ("g1", 7L, 5.0),
      ("g1", 8L, 6.0)).toDF("g", "k", "v")
    val got = Drift.ksDriftByGroup(a, b, "g", "k", "v", k = 100)
      .orderBy("g").collect()
    val g1 = got(0)
    assert(g1.getString(0) == "g1" && g1.getLong(1) == 4L && g1.getLong(2) == 4L)
    assert(g1.getLong(3) == 4L && g1.getLong(4) == 4L) // k > n: sample is exact
    assert(g1.getDouble(5) == 0.5)
    assert(g1.getDouble(6) == 2.0, s"tie must break to the smallest value, got $g1")
    assert(!g1.getBoolean(7))
    val g2 = got(1)
    assert(g2.getString(0) == "g2" && g2.getLong(1) == 1L && g2.getLong(2) == 0L)
    assert(g2.isNullAt(5) && g2.isNullAt(6) && g2.getBoolean(7),
      s"one-sided group must surface with NULL d_stat, got $g2")
  }

  test("ksDriftByGroup is partitioning-invariant and window-free") {
    val d = spark.read.parquet(s"$sf/documents.parquet")
    val a = d.filter(col("doc_id") % 2 === 0)
    val b = d.filter(col("doc_id") % 2 === 1)
    def run(x: org.apache.spark.sql.DataFrame, y: org.apache.spark.sql.DataFrame) =
      Drift.ksDriftByGroup(x, y, "lang", "doc_id", "n_chars", k = 50)
        .orderBy("lang").collect()
        .map(r => (r.getString(0), r.getDouble(5), r.getDouble(6))).toSeq
    assert(run(a.repartition(13), b.repartition(5)) == run(a.coalesce(1), b.coalesce(1)))
    // plan: the struct-minima argmax replaces any per-group window/sort
    val plan = Drift.ksDriftByGroup(a, b, "lang", "doc_id", "n_chars", k = 50)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"per-group KS must not plan a window:\n$plan")
  }

  test("psiDriftBinned: identical sides give psi 0 per bin; a shifted side lands one-sided") {
    import spark.implicits._
    val a = (1 to 100).map(i => (i.toLong, i.toDouble)).toDF("id", "v")
    // A vs itself: 4 equal-frequency bins, shares .25/.25, psi 0
    val self = Drift.psiDriftBinned(a, a, "v", nBins = 4)
      .orderBy("cat").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(6)))
    assert(self.toSeq == Seq(("1", 25L, 25L, 0.0), ("2", 25L, 25L, 0.0),
      ("3", 25L, 25L, 0.0), ("4", 25L, 25L, 0.0)), s"got ${self.toSeq}")
    // every B value above A's top boundary: bins 1-3 one-sided, bin 4
    // carries all of B
    val b = (1 to 40).map(i => (i.toLong, 1000.0 + i)).toDF("id", "v")
    val shift = Drift.psiDriftBinned(a, b, "v", nBins = 4)
      .orderBy("cat").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getBoolean(5)))
    assert(shift.toSeq == Seq(("1", 25L, 0L, true), ("2", 25L, 0L, true),
      ("3", 25L, 0L, true), ("4", 25L, 40L, false)), s"got ${shift.toSeq}")
  }

  test("quantileDriftByGroup: hand-checked deltas below saturation; one-sided arm") {
    import spark.implicits._
    val a = Seq(("g1", 1L, 1.0), ("g1", 2L, 2.0), ("g1", 3L, 3.0),
      ("g1", 4L, 4.0), ("g2", 9L, 7.0)).toDF("g", "k", "v")
    val b = Seq(("g1", 5L, 11.0), ("g1", 6L, 12.0), ("g1", 7L, 13.0),
      ("g1", 8L, 14.0)).toDF("g", "k", "v")
    val got = Drift.quantileDriftByGroup(a, b, "g", "k", "v",
        k = 100, qs = Seq(0.5, 1.0))
      .orderBy("g", "q").collect()
      .map(r => (r.getString(0), r.getDouble(1), Option(r.get(2)),
        Option(r.get(3)), Option(r.get(4)), r.getBoolean(7)))
    // k > n: sample exact → p50 = 2nd value, p100 = max; delta = +10
    assert(got.toSeq == Seq(
      ("g1", 0.5, Some(2.0), Some(12.0), Some(10.0), false),
      ("g1", 1.0, Some(4.0), Some(14.0), Some(10.0), false),
      ("g2", 0.5, Some(7.0), None, None, true),
      ("g2", 1.0, Some(7.0), None, None, true)), s"got ${got.toSeq}")
  }

  test("psiDriftByGroup: single-group frame reproduces the global operator; absent groups get NULL shares") {
    import spark.implicits._
    val a = (Seq.fill(60)("en") ++ Seq.fill(30)("de") ++ Seq.fill(10)("zz"))
      .map(("g1", _)).toDF("g", "lang")
    val b = (Seq.fill(30)("en") ++ Seq.fill(60)("de") ++ Seq.fill(10)("fr"))
      .map(("g1", _)).toDF("g", "lang")
    val global = Drift.psiDrift(a.drop("g"), b.drop("g"), "lang")
      .orderBy("cat").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), Option(r.get(6))))
    val grouped = Drift.psiDriftByGroup(a, b, "g", "lang")
      .orderBy("cat").collect()
      .map(r => (r.getString(1), r.getLong(2), r.getLong(3), Option(r.get(7))))
    assert(grouped.toSeq == global.toSeq,
      s"per-group on one group must equal the global report:\n$grouped\n$global")
    // a group entirely missing from side B: NULL shares (no 0/0 NaN),
    // one_sided on every cell
    val a2 = a.unionByName(Seq(("g2", "en")).toDF("g", "lang"))
    val g2 = Drift.psiDriftByGroup(a2, b, "g", "lang")
      .filter(col("g") === "g2").head()
    assert(g2.getLong(2) == 1L && g2.getLong(3) == 0L)
    assert(!g2.isNullAt(4) && g2.isNullAt(5), s"absent-side share must be NULL: $g2")
    assert(g2.getBoolean(6) && g2.isNullAt(7))
  }

  test("psiDrift: identical mixes give psi 0; sign tracks the share move; one-sided flags") {
    import spark.implicits._
    val a = (Seq.fill(60)("en") ++ Seq.fill(30)("de") ++ Seq.fill(10)("zz")).toDF("lang")
    val b = (Seq.fill(30)("en") ++ Seq.fill(60)("de") ++ Seq.fill(10)("fr")).toDF("lang")
    val got = Drift.psiDrift(a, b, "lang")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getBoolean(5), Option(r.get(6)).map(_.asInstanceOf[Double]))).toMap
    // en: share 0.6 -> 0.3, positive contribution (down-weighted but
    // (sa-sb) and ln(sa/sb) share sign) — PSI contributions are always >= 0
    assert(got("en")._4.get > 0.0)
    assert(got("de")._4.get > 0.0)
    // one-sided categories carry NULL psi and the flag
    assert(got("zz")._3 && got("zz")._4.isEmpty)
    assert(got("fr")._3 && got("fr")._4.isEmpty)
    assert(got("zz")._1 == 10L && got("zz")._2 == 0L)
    // identical mixes: psi exactly 0 for every category
    val same = Drift.psiDrift(a, a, "lang").collect()
    assert(same.forall(r => r.getDouble(6) == 0.0))
  }

  test("ksDriftByGroup / quantileDriftByGroup: NULL-key rows are filtered, not collapsed") {
    import spark.implicits._
    // three NULL-key rows used to hash identically (concat_ws drops
    // NULL args), so at most one survived into the KMV sample with a
    // nondeterministic value; now they are excluded from the sample
    // AND the counts, so the report describes the sampled population
    val a = Seq(("g1", Some(1L), 1.0), ("g1", Some(2L), 2.0),
      ("g1", None, 100.0), ("g1", None, 200.0), ("g1", None, 300.0))
      .toDF("g", "k", "v")
    val b = Seq(("g1", Some(5L), 1.0), ("g1", Some(6L), 2.0)).toDF("g", "k", "v")
    val ks = Drift.ksDriftByGroup(a, b, "g", "k", "v", k = 10).head()
    assert(ks.getLong(1) == 2L && ks.getLong(2) == 2L,
      s"NULL-key rows must not count into n_a/n_b: $ks")
    assert(ks.getDouble(5) == 0.0, s"identical non-null-key sides must read D=0: $ks")
    val qd = Drift.quantileDriftByGroup(a, b, "g", "k", "v", k = 10, qs = Seq(1.0)).head()
    assert(qd.getDouble(2) == 2.0 && qd.getDouble(3) == 2.0,
      s"the NULL-key 100/200/300 values must not enter the sample: $qd")
  }

  test("psiDriftBinned: NULL and NaN values are filtered from both sides") {
    import spark.implicits._
    // percentile_disc ignores NULLs when cutting the baseline
    // boundaries, so a NULL row was never ranked anywhere; letting it
    // fall through when().otherwise(0) into bin 1 inflated bin 1's
    // share on dirty columns
    val clean = (1 to 100).map(i => (i.toLong, Some(i.toDouble))).toDF("id", "v")
    val dirtyA = clean.unionByName(
      Seq((900L, None: Option[Double]), (901L, None)).toDF("id", "v"))
    val dirtyB = clean.unionByName(
      Seq((902L, Some(Double.NaN)), (903L, None)).toDF("id", "v"))
    val got = Drift.psiDriftBinned(dirtyA, dirtyB, "v", nBins = 4)
      .orderBy("cat").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(6)))
    assert(got.toSeq == Seq(("1", 25L, 25L, 0.0), ("2", 25L, 25L, 0.0),
      ("3", 25L, 25L, 0.0), ("4", 25L, 25L, 0.0)),
      s"NULL/NaN rows must not land in any bin: ${got.toSeq}")
  }

  test("psiDriftByGroup preserves the group column's original type") {
    import spark.implicits._
    // the three per-slice drift reports join on the group key; a
    // string coercion here broke that for integer-keyed slices
    val a = Seq((1L, "en"), (1L, "de"), (2L, "en")).toDF("g", "lang")
    val b = Seq((1L, "en"), (1L, "de"), (2L, "en")).toDF("g", "lang")
    val out = Drift.psiDriftByGroup(a, b, "g", "lang")
    assert(out.schema("g").dataType == org.apache.spark.sql.types.LongType,
      s"group key must keep its type, got ${out.schema("g").dataType}")
    val ks = Drift.ksDriftByGroup(a.withColumn("k", col("lang")).withColumn("v", lit(1.0)),
      b.withColumn("k", col("lang")).withColumn("v", lit(1.0)), "g", "k", "v", k = 10)
    // joinable on the shared key without casts
    assert(out.join(ks, "g").count() > 0)
  }

  test("ksBest: the sorted-merge argmax equals the brute-force distinct-candidate definition") {
    import spark.implicits._
    // brute force: for every distinct value v, ad = |#(a<=v)*mb - #(b<=v)*ma|;
    // max ad, ties to the smallest v — the definition ksBest must equal
    def brute(a: Seq[Double], b: Seq[Double]): (Long, Double) = {
      val (ma, mb) = (a.size.toLong, b.size.toLong)
      (a ++ b).distinct.sorted.map { v =>
        val ad = math.abs(a.count(_ <= v) * mb - b.count(_ <= v) * ma)
        (-ad, v)
      }.min
    }
    val rnd = new scala.util.Random(13)
    // deliberately tie-heavy small-domain samples so equal-value runs
    // interleave a- and b-elements (the partial-CDF trap the boundary
    // rule exists for), plus empty-ish and disjoint shapes
    val cases: Seq[(Seq[Double], Seq[Double])] =
      Seq(
        (Seq(1.0, 1.0, 2.0), Seq(1.0, 3.0)),
        (Seq(1.0), Seq(1.0)),
        (Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0)),
        (Seq(2.0, 2.0, 2.0), Seq(2.0, 2.0))) ++
        (1 to 20).map { _ =>
          (Seq.fill(1 + rnd.nextInt(12))(rnd.nextInt(5).toDouble),
            Seq.fill(1 + rnd.nextInt(12))(rnd.nextInt(5).toDouble))
        }
    val df = cases.zipWithIndex
      .map { case ((a, b), i) => (i, a, b) }.toDF("i", "a", "b")
      .withColumn("best", graft.quality.Drift.ksBest(
        col("a"), col("b"), size(col("a")).cast("long"), size(col("b")).cast("long")))
      .select(col("i"), col("best.nad"), col("best.v"))
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2))).toMap
    cases.zipWithIndex.foreach { case ((a, b), i) =>
      assert(df(i) == brute(a, b), s"case $i: a=$a b=$b got ${df(i)} want ${brute(a, b)}")
    }
  }
}
