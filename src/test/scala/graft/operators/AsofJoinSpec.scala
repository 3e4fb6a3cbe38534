package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class AsofJoinSpec extends SparkSpec {

  test("asof attaches the latest right row at-or-before each left row") {
    import spark.implicits._
    val trades = Seq( // (sym, ts, qty)
      ("A", 10L, 1), ("A", 20L, 2), ("A", 35L, 3), ("B", 5L, 4))
      .toDF("sym", "ts", "qty")
    val quotes = Seq( // (sym, ts, qid, px)
      ("A", 8L, 100L, 1.0), ("A", 20L, 101L, 2.0), ("A", 30L, 102L, 3.0),
      ("B", 9L, 103L, 9.9))
      .toDF("sym", "qts", "qid", "px")

    val out = AsofJoin.asof(trades, quotes, Seq("sym"), "ts", "qts", "qid", Seq("px"))
      .orderBy("sym", "ts")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getAs[Any]("asof_px")))

    assert(out.toSeq == Seq(
      ("A", 10L, 1.0), // quote@8
      ("A", 20L, 2.0), // quote AT 20 is visible
      ("A", 35L, 3.0), // quote@30
      ("B", 5L, null))) // no quote at-or-before 5
  }

  test("multiple right rows at one timestamp resolve to the highest id") {
    import spark.implicits._
    val left = Seq(("A", 10L)).toDF("sym", "ts")
    val right = Seq(("A", 10L, 1L, 1.0), ("A", 10L, 2L, 2.0)).toDF("sym", "qts", "qid", "px")
    val out = AsofJoin.asof(left, right, Seq("sym"), "ts", "qts", "qid", Seq("px"))
      .head().getAs[Double]("asof_px")
    assert(out == 2.0)
  }

  test("shared non-key column name on both sides is not shadowed") {
    import spark.implicits._
    // both sides carry a non-key column literally named `value` — the
    // round-1/2 bug null-padded the right's `value` before extraction,
    // silently yielding all-null asof_value
    val left = Seq(("A", 10L, 111.0), ("A", 30L, 222.0)).toDF("sym", "ts", "value")
    val right = Seq(("A", 5L, 1L, 7.5), ("A", 25L, 2L, 8.5)).toDF("sym", "rts", "rid", "value")

    val out = AsofJoin.asof(left, right, Seq("sym"), "ts", "rts", "rid", Seq("value"))
      .orderBy("ts")
      .collect().map(r => (r.getLong(1), r.getDouble(2), r.getAs[Double]("asof_value")))
    assert(out.toSeq == Seq(
      (10L, 111.0, 7.5),   // left's own value intact, right@5 attached
      (30L, 222.0, 8.5)))  // right@25 attached
  }

  test("key-partitioned window exchange excludes left payload columns (slim shuffle)") {
    import spark.implicits._
    // left carries two wide payload columns that must NOT ride the
    // union-window shuffle — they re-attach by __lid after the window
    val left = Seq(("A", 10L, "payload-wide-1", 111.0), ("A", 30L, "payload-wide-2", 222.0))
      .toDF("sym", "ts", "blob", "score")
    val right = Seq(("A", 5L, 1L, 7.5), ("A", 25L, 2L, 8.5)).toDF("sym", "rts", "rid", "px")

    val out = AsofJoin.asof(left, right, Seq("sym"), "ts", "rts", "rid", Seq("px"))

    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val plan = out.queryExecution.executedPlan
    val root = plan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val keyExchanges = root.collect {
      case e: ShuffleExchangeExec if e.outputPartitioning.toString.contains("sym") => e
    }
    assert(keyExchanges.nonEmpty, s"expected a key-partitioned exchange:\n$root")
    keyExchanges.foreach { e =>
      val names = e.output.map(_.name)
      assert(!names.contains("blob") && !names.contains("score"),
        s"left payload rode the window shuffle: $names")
    }

    // semantics unchanged by the restructure
    val rows = out.orderBy("ts").collect()
      .map(r => (r.getLong(1), r.getString(2), r.getDouble(3), r.getAs[Double]("asof_px")))
    assert(rows.toSeq == Seq(
      (10L, "payload-wide-1", 111.0, 7.5),
      (30L, "payload-wide-2", 222.0, 8.5)))
  }

  test("matches DuckDB-style asof semantics on the events table") {
    // each 'click' gets the most recent prior-or-equal 'view' value per user
    val ev = { val raw = spark.read.parquet(s"$sf/events.parquet")
      raw.withColumn("ts_sec", tsSecExpr(raw)) }
    val clicks = ev.filter(col("event_type") === "click")
      .select("user_id", "event_id", "ts_sec")
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts_sec").as("vts"),
        col("event_id").as("vid"), col("value").as("vvalue"))

    val out = AsofJoin.asof(clicks, views, Seq("user_id"), "ts_sec", "vts", "vid", Seq("vvalue"))
    assert(out.count() == clicks.count()) // exactly one output row per left row
    // spot-check one user against a brute-force max-ts lookup
    val u = clicks.select("user_id").head().getLong(0)
    val c = clicks.filter(col("user_id") === u).orderBy(desc("ts_sec")).head()
    val expected = views
      .filter(col("user_id") === u && col("vts") <= c.getLong(2))
      .orderBy(desc("vts"), desc("vid")).select("vvalue")
      .collect().headOption.map(_.getDouble(0))
    val got = Option(out.filter(col("user_id") === u && col("event_id") === c.getLong(1))
      .head().getAs[java.lang.Double]("asof_vvalue")).map(_.doubleValue)
    assert(got == expected)
  }

  test("forward direction attaches the earliest at-or-after right row") {
    import spark.implicits._
    val left = Seq((1L, 5L), (1L, 10L), (1L, 20L), (2L, 1L))
      .toDF("k", "ts")
    val right = Seq((1L, 7L, 70.0), (1L, 10L, 100.0), (1L, 15L, 150.0))
      .toDF("k", "rts", "v").withColumn("rid", col("rts"))
      .select("k", "rts", "rid", "v")
    val out = AsofJoin.asof(left, right, Seq("k"), "ts", "rts", "rid",
        Seq("v"), direction = "forward")
      .orderBy("k", "ts")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Double])))
    // DuckDB `ASOF ... ON l.ts <= r.rts` on this exact fixture:
    // 5→70 (earliest ≥5), 10→100 (equal ts included), 20→None, key 2→None
    assert(out.toSeq == Seq(
      (1L, 5L, Some(70.0)), (1L, 10L, Some(100.0)), (1L, 20L, None),
      (2L, 1L, None)))
  }

  test("tolerance nulls matches further than the bound, keeps fresh ones") {
    import spark.implicits._
    val left = Seq((1L, 10L), (1L, 100L), (1L, 103L)).toDF("k", "ts")
    val right = Seq((1L, 8L, 80.0), (1L, 99L, 990.0))
      .toDF("k", "rts", "v").withColumn("rid", col("rts"))
    val out = AsofJoin.asof(left, right, Seq("k"), "ts", "rts", "rid",
        Seq("v"), tolerance = Some(4L))
      .orderBy("ts").collect()
      .map(r => (r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Double])))
    // 10: match rts=8, gap 2 ≤ 4 → kept; 100: rts=99, gap 1 → kept;
    // 103: rts=99, gap 4 ≤ 4 → kept (boundary inclusive)
    assert(out.toSeq == Seq((10L, Some(80.0)), (100L, Some(990.0)), (103L, Some(990.0))))

    val strict = AsofJoin.asof(left, right, Seq("k"), "ts", "rts", "rid",
        Seq("v"), tolerance = Some(1L))
      .orderBy("ts").collect()
      .map(r => (r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Double])))
    // only the gap-1 match at ts=100 survives
    assert(strict.toSeq == Seq((10L, None), (100L, Some(990.0)), (103L, None)))
  }

  test("a nearest right row with a null value IS the match (no skip to older rows)") {
    import spark.implicits._
    // DuckDB ASOF semantics: the match is the nearest at-or-before ROW;
    // if its value is null, null is attached — the walk must not skip
    // past it to an older row's non-null value.
    val left = Seq((1L, 102L)).toDF("k", "ts")
    val right = Seq((1L, 10L, Some(7.0)), (1L, 100L, Option.empty[Double]))
      .toDF("k", "rts", "v").withColumn("rid", col("rts"))
    val plain = AsofJoin.asof(left, right, Seq("k"), "ts", "rts", "rid", Seq("v"))
      .head()
    assert(plain.isNullAt(plain.fieldIndex("asof_v")),
      "null-valued nearest row must attach null, not an older value")
    // ...and the tolerance gate measures the gap to that SAME row
    val tol = AsofJoin.asof(left, right, Seq("k"), "ts", "rts", "rid",
        Seq("v"), tolerance = Some(5L)).head()
    assert(tol.isNullAt(tol.fieldIndex("asof_v")))
  }

  test("tolerance requires numeric timestamps") {
    import spark.implicits._
    val left = Seq((1L, java.sql.Timestamp.valueOf("2020-01-01 00:00:00")))
      .toDF("k", "ts")
    val right = Seq((1L, java.sql.Timestamp.valueOf("2020-01-01 00:00:00"), 1.0))
      .toDF("k", "rts", "v").withColumn("rid", lit(1L))
    val ex = intercept[IllegalArgumentException] {
      AsofJoin.asof(left, right, Seq("k"), "ts", "rts", "rid",
        Seq("v"), tolerance = Some(5L))
    }
    assert(ex.getMessage.contains("numeric"))
  }
}
