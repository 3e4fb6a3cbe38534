package graft.quality

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PrivacySpec extends SparkSpec {

  import spark.implicits._

  // (age_band, zip3, diagnosis): one 3-row class, one 2-row class,
  // two singletons
  private lazy val rows = Seq(
    ("30-40", "941", "flu"),
    ("30-40", "941", "flu"),
    ("30-40", "941", "cold"),
    ("50-60", "102", "flu"),
    ("50-60", "102", "flu"),
    ("30-40", "102", "cold"),
    ("70-80", "941", "flu")
  ).toDF("age_band", "zip3", "diagnosis")

  test("kAnonymityClasses counts every quasi-identifier combination") {
    val got = Privacy.kAnonymityClasses(rows, Seq("age_band", "zip3"))
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    assert(got == Map(
      ("30-40", "941") -> 3L, ("50-60", "102") -> 2L,
      ("30-40", "102") -> 1L, ("70-80", "941") -> 1L))
  }

  test("kAnonymityViolations: only classes below k; empty means k-anonymous") {
    val v3 = Privacy.kAnonymityViolations(rows, Seq("age_band", "zip3"), k = 3)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(v3 == Set(("50-60", "102"), ("30-40", "102"), ("70-80", "941")))
    val v1 = Privacy.kAnonymityViolations(rows, Seq("age_band", "zip3"), k = 1)
    assert(v1.isEmpty, "every class has >= 1 row — k=1 always holds")
  }

  test("kAnonymityProfile histogram partitions classes and rows exactly") {
    val prof = Privacy.kAnonymityProfile(rows, Seq("age_band", "zip3"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(prof == Map(1L -> ((2L, 2L)), 2L -> ((1L, 2L)), 3L -> ((1L, 3L))))
    assert(prof.values.map(_._2).sum == rows.count(), "row mass must be partitioned")
  }

  test("lDiversityViolations flags homogeneous classes regardless of size") {
    // the 2-row (50-60, 102) class is all-flu: size passes k=2 but
    // leaks the diagnosis — exactly what l-diversity exists to catch
    val got = Privacy.lDiversityViolations(rows, Seq("age_band", "zip3"), "diagnosis", l = 2)
      .collect().map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getLong(3)))).toMap
    assert(got.keySet == Set(("50-60", "102"), ("30-40", "102"), ("70-80", "941")))
    assert(got(("50-60", "102")) == ((2L, 1L)), "2 rows, 1 distinct diagnosis")
    // the 3-row class has 2 diagnoses — diverse at l=2
    assert(!got.contains(("30-40", "941")))
  }

  test("dpNoisedCounts: deterministic per seed, fresh seed = fresh draw, Laplace-bounded") {
    import spark.implicits._
    val rows = (1 to 200).map(i => (s"u$i", s"g${i % 5}")).toDF("user", "grp")
    val a = Privacy.dpNoisedCounts(rows, Seq("grp"), epsilon = 0.5, seed = 7L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    val b = Privacy.dpNoisedCounts(rows, Seq("grp"), epsilon = 0.5, seed = 7L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    assert(a.sameElements(b), "same seed must replay the identical release")
    val c = Privacy.dpNoisedCounts(rows, Seq("grp"), epsilon = 0.5, seed = 8L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    assert(a.map(_._3).toSeq != c.map(_._3).toSeq, "a fresh seed is a fresh draw")
    a.foreach { case (g, exact, noised) =>
      assert(exact == 40L, s"group $g exact count")
      // 52-bit uniform → |noise| ≤ (1/ε)·ln(2⁵²) ≈ 72; and noise ≠ 0
      // almost surely (u = 0.5 exactly is unreachable by construction)
      assert(math.abs(noised - exact) <= 73.0, s"$g noise out of Laplace range")
      assert(noised != exact.toDouble, s"$g drew zero noise")
    }
  }

  test("dpNoisedCounts: public domain emits noised zeros and suppresses off-domain groups") {
    import spark.implicits._
    val rows = (1 to 40).map(i => (s"u$i", if (i == 40) "secret" else s"g${i % 2}"))
      .toDF("user", "grp")
    val domain = Seq("g0", "g1", "gEmpty").toDF("grp")
    val out = Privacy.dpNoisedCounts(rows, Seq("grp"), epsilon = 0.5, seed = 7L,
        publicDomain = Some(domain))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out.keySet == Set("g0", "g1", "gEmpty"),
      "exactly the public domain is released — the one-individual 'secret' group never appears")
    assert(out("gEmpty")._1 == 0L && out("gEmpty")._2 != 0.0,
      "an absent public group releases a noised zero")
    val released = Privacy.dpRelease(Privacy.dpNoisedCounts(rows, Seq("grp"),
      epsilon = 0.5, seed = 7L, publicDomain = Some(domain)))
    assert(released.columns.toSeq == Seq("grp", "noised_count"),
      "the release projection must exclude class_size")
  }

  test("dpNoisedCounts: release threshold gates data-dependent domains") {
    import spark.implicits._
    val rows = (1 to 41).map(i => (s"u$i", if (i == 41) "lone" else s"g${i % 2}"))
      .toDF("user", "grp")
    val out = Privacy.dpNoisedCounts(rows, Seq("grp"), epsilon = 0.5, seed = 7L,
        releaseThreshold = Some(10.0))
      .collect().map(_.getString(0)).toSet
    assert(out == Set("g0", "g1"),
      "the size-1 group must fall below the stability threshold")
  }

  test("dpNoisedCounts: noise key is injective across group-column splits") {
    import spark.implicits._
    // ("a:b","c") vs ("a","b:c") — a ':'-join key would collide these
    // into identical noise draws; the md5-block key must not
    val rows = Seq(("a:b", "c"), ("a", "b:c")).toDF("x", "y")
    val noise = Privacy.dpNoisedCounts(rows, Seq("x", "y"), epsilon = 0.5, seed = 7L)
      .collect().map(r => r.getDouble(3) - r.getLong(2))
    assert(noise.length == 2 && noise(0) != noise(1),
      "colliding concat keys would draw identical correlated noise")
  }
}
