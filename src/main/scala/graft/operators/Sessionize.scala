package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch sessionization over an event stream table
  * (`events(event_id, ts, user_id, …)`): classic gap-based sessions via
  * window functions — lag per user, new-session flag when the gap exceeds
  * the timeout, running sum of flags = session index.
  *
  * Works on an epoch-seconds column (`tsSecCol`) so it is agnostic to how
  * the timestamp was stored (the test corpus stores TIMESTAMP(NANOS),
  * which Spark reads as nanos-long under
  * `spark.sql.legacy.parquet.nanosAsLong=true`).
  *
  * Scale: one shuffle on user_id (the window partition key); everything
  * after is per-partition sorted streaming. Skew is bounded by per-user
  * event counts, not corpus size. The streaming twin is `session_window`
  * in Structured Streaming (graft.streaming).
  */
object Sessionize {

  /** Annotate events with `session_idx` (0-based per user). Rows are
    * ordered within a user by (tsSec, idCol) so ties are deterministic.
    */
  def assign(
      events: DataFrame,
      tsSecCol: String = "ts_sec",
      idCol: String = "event_id",
      gapSeconds: Long = 1800L): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col(tsSecCol).asc, col(idCol).asc)
    val prev = lag(col(tsSecCol), 1).over(byUser)
    val isNew = when(prev.isNull || (col(tsSecCol) - prev) > gapSeconds, 1).otherwise(0)
    events
      .withColumn("__new_session", isNew)
      .withColumn("session_idx", sum(col("__new_session")).over(byUser) - 1)
      .drop("__new_session")
  }

  /** Per-session rollup: bounds (epoch seconds), event count, value sum
    * (decimal-exact then double for cross-engine determinism).
    */
  def sessions(
      events: DataFrame,
      tsSecCol: String = "ts_sec",
      idCol: String = "event_id",
      gapSeconds: Long = 1800L): DataFrame =
    assign(events, tsSecCol, idCol, gapSeconds)
      .groupBy(col("user_id"), col("session_idx"))
      .agg(
        min(col(tsSecCol)).as("start_sec"),
        max(col(tsSecCol)).as("end_sec"),
        count(lit(1)).as("n_events"),
        expr("cast(sum(cast(value as decimal(18,2))) as double)").as("total_value"))

  /** Ordered funnel analysis: how many users reach each stage of an
    * ordered event-type sequence, where stage k counts only if it
    * happens STRICTLY AFTER the user's earliest completion of stage
    * k−1 (and, with `horizonSeconds`, within that horizon of the
    * user's stage-1 time — the "converted within N days" business
    * question).
    *
    * Shape: stage 1 is one groupBy(user) min; each later stage is a
    * filtered scan joined to the survivors (every join and aggregate
    * keys on user_id, so all |stages| shuffles hash the SAME key and
    * co-partition; survivor sets only shrink). No windows, no
    * event-list buffering per user — per-stage state is one timestamp.
    *
    * Output: (stage_no, stage, n_users), one row per stage.
    */
  def funnel(
      events: DataFrame,
      stages: Seq[String],
      tsSecCol: String = "ts_sec",
      typeCol: String = "event_type",
      horizonSeconds: Option[Long] = None): DataFrame = {
    require(stages.nonEmpty && stages.distinct.size == stages.size,
      "stages must be non-empty and distinct")
    var cur = events.filter(col(typeCol) === stages.head)
      .groupBy(col("user_id"))
      .agg(min(col(tsSecCol)).as("t0"))
      .withColumn("tprev", col("t0"))
    var out = cur.agg(count(lit(1)).as("n_users"))
      .select(lit(1).as("stage_no"), lit(stages.head).as("stage"), col("n_users"))

    stages.zipWithIndex.drop(1).foreach { case (stage, i) =>
      val horizonOk = horizonSeconds
        .map(h => col(tsSecCol) <= col("t0") + h)
        .getOrElse(lit(true))
      cur = events.filter(col(typeCol) === stage)
        .join(cur.select(col("user_id"), col("t0"), col("tprev")), Seq("user_id"))
        .where(col(tsSecCol) > col("tprev") && horizonOk)
        .groupBy(col("user_id"))
        .agg(min(col(tsSecCol)).as("t"), max(col("t0")).as("t0"))
        .select(col("user_id"), col("t0"), col("t").as("tprev"))
      out = out.unionAll(
        cur.agg(count(lit(1)).as("n_users"))
          .select(lit(i + 1).as("stage_no"), lit(stage).as("stage"), col("n_users")))
    }
    out.orderBy("stage_no")
  }

  /** Cohort retention matrix: users are cohorted by the period of their
    * FIRST event; retention at offset k = users of the cohort active
    * k periods later / cohort size.
    *
    * Shape: first-event agg keyed on user_id, activity join keyed on
    * user_id (co-partitioned — one hash family for both shuffles, and
    * the same key sessionize/funnel use, so a pre-bucketed events table
    * serves all three exchange-free), then the distinct-activity and
    * matrix aggs on (cohort, offset) — cohort-period cardinality, tiny.
    * Per-user state is one long (first period); no event buffering.
    *
    * Retention is an exact integer ratio cast through one double
    * division — engine-independent.
    *
    * Output: (cohort_period, period_offset, n_active, cohort_size,
    * retention), offset 0 rows carry retention 1.0 by construction.
    */
  def cohortRetention(
      events: DataFrame,
      tsSecCol: String = "ts_sec",
      periodSeconds: Long = 604800L): DataFrame = {
    require(periodSeconds > 0, "periodSeconds must be positive")
    val e = events.select(
      col("user_id"),
      // integer `div`, not `/` (Spark's / on longs is double division)
      expr(s"cast($tsSecCol as long) div $periodSeconds").as("wk"))
    val first = e.groupBy("user_id").agg(min(col("wk")).as("cohort"))
    val sizes = first.groupBy("cohort").agg(count(lit(1)).as("cohort_size"))
    e.join(first, Seq("user_id"))
      .select(col("cohort"), (col("wk") - col("cohort")).as("period_offset"), col("user_id"))
      .distinct()
      .groupBy("cohort", "period_offset")
      .agg(count(lit(1)).as("n_active"))
      .join(sizes, Seq("cohort"))
      .select(
        col("cohort").as("cohort_period"),
        col("period_offset"),
        col("n_active"),
        col("cohort_size"),
        round(col("n_active").cast("double") / col("cohort_size"), 6).as("retention"))
  }
}
