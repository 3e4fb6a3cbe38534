package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TemporalSpec extends SparkSpec {

  import spark.implicits._

  private val log = Seq(
    // user 1: gold → gold (no-op, dropped) → silver → gold
    (1L, 10L, "gold", "US"),
    (1L, 20L, "gold", "US"),
    (1L, 30L, "silver", "US"),
    (1L, 40L, "gold", "US"),
    // user 2: single observation
    (2L, 15L, "bronze", "DE"),
    // user 3: country flips while tier stays — still a change
    (3L, 5L, "gold", "US"),
    (3L, 6L, "gold", "FR"))
    .toDF("user_id", "ts", "tier", "country")

  test("scd2 compacts no-op rows and builds half-open validity intervals") {
    val dim = Temporal.scd2(log, Seq("user_id"), "ts", Seq("tier", "country"))
      .orderBy("user_id", "valid_from")
      .select("user_id", "valid_from", "valid_to", "tier", "is_current")
      .as[(Long, Long, Option[Long], String, Int)].collect()
    assert(dim.toSeq == Seq(
      (1L, 10L, Some(30L), "gold", 0),
      (1L, 30L, Some(40L), "silver", 0),
      (1L, 40L, None, "gold", 1),
      (2L, 15L, None, "bronze", 1),
      (3L, 5L, Some(6L), "gold", 0),
      (3L, 6L, None, "gold", 1)))
  }

  test("scd2 treats null attribute values null-safely") {
    // null → null is NOT a change; null → value and value → null are
    val nl = Seq(
      (1L, 1L, Option.empty[String]),
      (1L, 2L, Option.empty[String]),
      (1L, 3L, Some("a")),
      (1L, 4L, Option.empty[String]))
      .toDF("k", "ts", "attr")
    val dim = Temporal.scd2(nl, Seq("k"), "ts", Seq("attr"))
      .orderBy("valid_from").select("valid_from", "attr")
      .as[(Long, Option[String])].collect()
    assert(dim.toSeq == Seq((1L, None), (3L, Some("a")), (4L, None)))
  }

  test("a null timestamp does not break first-row detection for its successor") {
    // nulls sort first; the row AFTER the null-ts row must still be
    // compacted when it is a no-op (row_number-based detection)
    val nl = Seq(
      (1L, Option.empty[Long], "a"),
      (1L, Some(5L), "a"))
      .toDF("k", "ts", "attr")
    assert(Temporal.scd2(nl, Seq("k"), "ts", Seq("attr")).count() == 1)
  }

  test("asOfSnapshot returns exactly the rows valid at the instant") {
    val dim = Temporal.scd2(log, Seq("user_id"), "ts", Seq("tier", "country"))
    val at35 = Temporal.asOfSnapshot(dim, lit(35L))
      .orderBy("user_id").select("user_id", "tier")
      .as[(Long, String)].collect()
    // t=35: user1 in silver [30,40), user2 bronze [15,∞), user3 gold [6,∞)
    assert(at35.toSeq == Seq((1L, "silver"), (2L, "bronze"), (3L, "gold")))
    // before any observation of user 1
    assert(Temporal.asOfSnapshot(dim, lit(4L)).count() == 0)
  }

  test("scd2Merge: incremental build equals full replay") {
    val log1 = log // the fixture change log, all ts <= 40
    val log2 = Seq(
      (1L, 50L, "gold", "US"),   // no-op vs open gold → compacted
      (1L, 60L, "platinum", "US"), // closes gold
      (2L, 55L, "silver", "DE"), // closes bronze
      (4L, 45L, "gold", "JP"))   // brand-new key
      .toDF("user_id", "ts", "tier", "country")
    val keys = Seq("user_id"); val attrs = Seq("tier", "country")

    val incremental = Temporal.scd2Merge(
      Temporal.scd2(log1, keys, "ts", attrs), log2, keys, "ts", attrs)
    val replay = Temporal.scd2(log1.unionByName(log2), keys, "ts", attrs)

    val cols = Seq("user_id", "valid_from", "valid_to", "tier", "country", "is_current")
    val a = incremental.select(cols.map(col): _*).collect().map(_.toSeq).toSet
    val b = replay.select(cols.map(col): _*).collect().map(_.toSeq).toSet
    assert(a == b, s"incremental:\n${a.mkString("\n")}\nreplay:\n${b.mkString("\n")}")
    // sanity: user 1 gained a platinum open row, gold closed at 60
    assert(incremental.filter(col("user_id") === 1L && col("is_current") === 1)
      .head().getAs[String]("tier") == "platinum")
  }

  test("scd2Merge accepts a dim built from a log with passthrough columns") {
    val logExtra = log.withColumn("note", concat(col("tier"), lit("!")))
    val dim = Temporal.scd2(logExtra, Seq("user_id"), "ts", Seq("tier", "country"))
    val merged = Temporal.scd2Merge(dim,
      Seq((1L, 99L, "bronze", "US")).toDF("user_id", "ts", "tier", "country"),
      Seq("user_id"), "ts", Seq("tier", "country"))
    // canonical merge schema; the new change closed user 1's open row
    assert(!merged.columns.contains("note"))
    assert(merged.filter(col("user_id") === 1L && col("is_current") === 1)
      .head().getAs[String]("tier") == "bronze")
  }

  test("plan has a single exchange and a single sort (window reuse)") {
    val dim = Temporal.scd2(log, Seq("user_id"), "ts", Seq("tier"))
    val plan = dim.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    val sorts = "\\bSort \\[".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected one shuffle, plan:\n$plan")
    assert(sorts == 1, s"expected one sort, plan:\n$plan")
  }

  test("corpus events: every user has exactly one current row and contiguous intervals") {
    val ev = { val raw = spark.read.parquet(s"$sf/events.parquet")
      raw.withColumn("ts_sec", tsSecExpr(raw)) }
    // pre-dedup to one row per (user, second) — scd2's precondition
    val one = ev.withColumn("__rn",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy("user_id", "ts_sec").orderBy(col("event_id").desc)))
      .filter(col("__rn") === 1).drop("__rn")
    val dim = Temporal.scd2(one, Seq("user_id"), "ts_sec", Seq("event_type")).cache()
    try {
      val users = ev.select("user_id").distinct().count()
      assert(dim.filter(col("is_current") === 1).count() == users)
      // each interval's valid_to equals the next interval's valid_from
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("valid_from")
      val gaps = dim
        .withColumn("__next_from", lead(col("valid_from"), 1).over(w))
        .filter(col("__next_from").isNotNull && col("valid_to") =!= col("__next_from"))
      assert(gaps.count() == 0)
    } finally dim.unpersist()
  }
}
