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

  test("gap exactly equal to timeout does NOT split") {
    val df = Seq((1L, 1L, 0L, 1.0), (2L, 1L, 1800L, 1.0))
      .toDF("event_id", "user_id", "ts_sec", "value")
    assert(Sessionize.sessions(df, "ts_sec", "event_id", 1800L).count() == 1)
  }

  test("corpus events sessionize without nulls and cover all users") {
    val events = spark.read.parquet(s"$sf/events.parquet")
      .withColumn("ts_sec", expr("ts div 1000000000"))
    val sess = Sessionize.sessions(events, "ts_sec", "event_id", 1800L)
    assert(sess.filter(col("session_idx").isNull).count() == 0)
    assert(
      sess.select("user_id").distinct().count() ==
        events.select("user_id").distinct().count())
  }
}
