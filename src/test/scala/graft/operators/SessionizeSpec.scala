package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SessionizeSpec extends SparkSpec {

  import spark.implicits._

  test("gap > timeout starts a new session; ties ordered by event id") {
    // user 1: events at t=0, 100, 2000(gap>1800 → new), 2100
    // user 2: single event
    val df = Seq(
      (1L, 1L, 0L, 10.0),
      (2L, 1L, 100L, 20.0),
      (3L, 1L, 2000L, 30.0),
      (4L, 1L, 2100L, 40.0),
      (5L, 2L, 50L, 5.0))
      .toDF("event_id", "user_id", "ts_sec", "value")
    val sess = Sessionize.sessions(df, "ts_sec", "event_id", gapSeconds = 1800L)
      .orderBy("user_id", "session_idx").collect()
    assert(sess.length == 3)
    val s0 = sess(0) // user 1, session 0
    assert(s0.getAs[Long]("user_id") == 1L && s0.getAs[Long]("session_idx") == 0L)
    assert(s0.getAs[Long]("start_sec") == 0L && s0.getAs[Long]("end_sec") == 100L)
    assert(s0.getAs[Long]("n_events") == 2L)
    assert(math.abs(s0.getAs[Double]("total_value") - 30.0) < 1e-9)
    val s1 = sess(1)
    assert(s1.getAs[Long]("session_idx") == 1L && s1.getAs[Long]("n_events") == 2L)
    val s2 = sess(2)
    assert(s2.getAs[Long]("user_id") == 2L && s2.getAs[Long]("n_events") == 1L)
  }

  test("funnel: ordering is strict, horizon bounds conversion, counts shrink monotonically") {
    // user 1: view(10) → click(20) → purchase(30): full funnel
    // user 2: click(5) BEFORE view(10) → click never counts (strict order)
    // user 3: view(0) → click(10) → purchase at 999999 (outside horizon)
    // user 4: purchase only → not even stage 1
    val df = Seq(
      (1L, "view", 10L), (1L, "click", 20L), (1L, "purchase", 30L),
      (2L, "click", 5L), (2L, "view", 10L),
      (3L, "view", 0L), (3L, "click", 10L), (3L, "purchase", 999999L),
      (4L, "purchase", 1L))
      .toDF("user_id", "event_type", "ts_sec")
    val out = Sessionize.funnel(df, Seq("view", "click", "purchase"),
        horizonSeconds = Some(1000L))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq == Seq((1, "view", 3L), (2, "click", 2L), (3, "purchase", 1L)))

    // same-timestamp stage-2 event does NOT count (strictly after)
    val tie = Seq((1L, "view", 10L), (1L, "click", 10L))
      .toDF("user_id", "event_type", "ts_sec")
    val tieOut = Sessionize.funnel(tie, Seq("view", "click"))
      .collect().map(r => (r.getInt(0), r.getLong(2)))
    assert(tieOut.toSeq == Seq((1, 1L), (2, 0L)))

    // without a horizon, user 3's late purchase converts
    val noH = Sessionize.funnel(df, Seq("view", "click", "purchase"))
      .collect().map(r => r.getLong(2))
    assert(noH.toSeq == Seq(3L, 2L, 2L))
  }

  test("gap exactly equal to timeout does NOT split") {
    val df = Seq((1L, 1L, 0L, 1.0), (2L, 1L, 1800L, 1.0))
      .toDF("event_id", "user_id", "ts_sec", "value")
    assert(Sessionize.sessions(df, "ts_sec", "event_id", 1800L).count() == 1)
  }

  test("cohortRetention: known matrix on a constructed fixture, offset 0 is 1.0") {
    import spark.implicits._
    val wk = 604800L
    // cohort week 0: users 1,2,3 (u1 active wks 0,1,2; u2 wks 0,1; u3 wk 0
    // twice — distinct per week). cohort week 1: user 4 (wks 1,3).
    val events = Seq(
      (1L, 0L), (1L, wk + 5), (1L, 2 * wk + 5),
      (2L, 10L), (2L, wk + 10),
      (3L, 20L), (3L, 30L),
      (4L, wk + 1), (4L, 3 * wk + 1))
      .toDF("user_id", "ts_sec")
    val m = Sessionize.cohortRetention(events)
      .orderBy("cohort_period", "period_offset")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(m.toSeq == Seq(
      (0L, 0L, 3L, 3L, 1.0),   // all three cohort-0 users active in week 0
      (0L, 1L, 2L, 3L, 0.666667), // u1, u2 return in week 1
      (0L, 2L, 1L, 3L, 0.333333), // only u1 in week 2
      (1L, 0L, 1L, 1L, 1.0),
      (1L, 2L, 1L, 1L, 1.0)))  // u4 returns two weeks after its cohort
  }

  test("corpus events sessionize without nulls and cover all users") {
    val events = { val raw = spark.read.parquet(s"$sf/events.parquet")
      raw.withColumn("ts_sec", tsSecExpr(raw)) }
    val sess = Sessionize.sessions(events, "ts_sec", "event_id", 1800L)
    assert(sess.filter(col("session_idx").isNull).count() == 0)
    assert(
      sess.select("user_id").distinct().count() ==
        events.select("user_id").distinct().count())
  }
}
