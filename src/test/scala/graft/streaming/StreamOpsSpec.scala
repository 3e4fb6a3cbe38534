package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

class StreamOpsSpec extends SparkSpec {

  private def ts(min: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 00:$min%02d:00")

  test("sessionAggregates: gap-based session windows close past the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp, Double)]
    val events = in.toDF.toDF("user_id", "ts", "value")

    val q = StreamOps.sessionAggregates(events, gap = "5 minutes", watermark = "0 seconds")
      .writeStream.format("memory").queryName("sessions_out").outputMode("append").start()
    try {
      // user 1: two events 2 min apart (one session), then a 20-min gap
      // (second session); a final late-hour event advances the watermark
      // far enough to close both.
      in.addData((1L, ts(0), 1.0), (1L, ts(2), 2.0), (1L, ts(30), 5.0))
      q.processAllAvailable()
      in.addData((2L, Timestamp.valueOf("2024-01-01 03:00:00"), 9.0))
      q.processAllAvailable()
      val out = spark.table("sessions_out")
        .select("user_id", "n_events", "total_value").orderBy("user_id", "total_value")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      assert(out.toSeq == Seq((1L, 2L, 3.0), (1L, 1L, 5.0)))
    } finally q.stop()
  }

  test("windowedEventCounts: tumbling windows count per event type") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, String)]
    val events = in.toDF.toDF("ts", "event_type")

    val q = StreamOps.windowedEventCounts(
        events, window_ = "10 minutes", slide = "10 minutes", watermark = "0 seconds")
      .writeStream.format("memory").queryName("win_out").outputMode("append").start()
    try {
      in.addData((ts(1), "click"), (ts(3), "click"), (ts(8), "view"), (ts(12), "click"))
      q.processAllAvailable()
      in.addData((Timestamp.valueOf("2024-01-01 02:00:00"), "view"))
      q.processAllAvailable()
      val out = spark.table("win_out")
        .filter(col("w_start") < "2024-01-01 01:00:00")
        .select("w_start", "event_type", "n_events").orderBy("w_start", "event_type")
        .collect().map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2)))
      assert(out.toSeq == Seq(
        ("2024-01-01 00:00:00.0", "click", 2L),
        ("2024-01-01 00:00:00.0", "view", 1L),
        ("2024-01-01 00:10:00.0", "click", 1L)))
    } finally q.stop()
  }

  test("dedupWithinWatermark drops duplicate keys arriving within the horizon") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp)]
    val events = in.toDF.toDF("event_id", "ts")

    val q = StreamOps.dedupWithinWatermark(events, Seq("event_id"), watermark = "10 minutes")
      .writeStream.format("memory").queryName("dedup_out").outputMode("append").start()
    try {
      in.addData((7L, ts(0)), (7L, ts(1)), (8L, ts(2)), (7L, ts(3)))
      q.processAllAvailable()
      val out = spark.table("dedup_out").select("event_id")
        .collect().map(_.getLong(0)).sorted
      assert(out.toSeq == Seq(7L, 8L))
    } finally q.stop()
  }

  test("enrich: stream-static broadcast join attaches dim attributes, keeps unmatched") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp)]
    val stream = in.toDF.toDF("user_id", "ts")
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("user_id", "tier")

    val q = StreamOps.enrich(stream, dim, "user_id")
      .writeStream.format("memory").queryName("enrich_out").outputMode("append").start()
    try {
      in.addData((1L, ts(0)), (3L, ts(1)))
      q.processAllAvailable()
      val out = spark.table("enrich_out").select("user_id", "tier")
        .collect().map(r => (r.getLong(0), Option(r.getString(1)))).sortBy(_._1)
      assert(out.toSeq == Seq((1L, Some("gold")), (3L, None)))
    } finally q.stop()
  }

  test("intervalJoin: stream-stream join matches within the event-time gap only") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Long, Timestamp)]
    val views = MemoryStream[(Long, Timestamp)]
    val joined = StreamOps.intervalJoin(
      clicks.toDF.toDF("user_id", "cts"),
      views.toDF.toDF("user_id", "vts"),
      "user_id", "cts", "vts", gap = "5 minutes")

    val q = joined.writeStream.format("memory").queryName("ij_out").outputMode("append").start()
    try {
      views.addData((1L, ts(0)), (1L, ts(20)), (2L, ts(1)))
      clicks.addData((1L, ts(3))) // matches view@0 (within 5 min), not view@20
      q.processAllAvailable()
      val out = spark.table("ij_out").select("user_id", "cts", "vts")
        .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2)))
      assert(out.toSeq == Seq((1L, ts(3), ts(0))))
    } finally q.stop()
  }

  test("windowedDistinctUsers: sketch counts match exact distinct at small cardinality") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, Long, String)]
    val events = in.toDF.toDF("ts", "user_id", "event_type")
    val q = StreamOps.windowedDistinctUsers(events, watermark = "0 seconds")
      .writeStream.format("memory").queryName("wdu_out").outputMode("append").start()
    try {
      // window [00:00,00:10): users 1,2,1 → 2 distinct; [00:10,00:20): 3
      in.addData((ts(1), 1L, "click"), (ts(2), 2L, "click"), (ts(3), 1L, "click"),
        (ts(12), 3L, "click"))
      q.processAllAvailable()
      in.addData((Timestamp.valueOf("2024-01-01 03:00:00"), 9L, "click"))
      q.processAllAvailable()
      val out = spark.table("wdu_out")
        .filter(col("w_start") < "2024-01-01 01:00:00")
        .orderBy("w_start")
        .collect().map(r => r.getLong(2))
      // HLL is exact at tiny cardinality
      assert(out.toSeq == Seq(2L, 1L))
    } finally q.stop()
  }

  test("windowedCmsFrequencies: grid estimates equal exact counts at tiny load; batch twin agrees") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, Long, String)]
    val events = in.toDF.toDF("ts", "user_id", "event_type")
    val watch = Seq("click", "view", "ghost")
    val q = StreamOps.windowedCmsFrequencies(events, watch, watermark = "0 seconds")
      .writeStream.format("memory").queryName("cms_out").outputMode("append").start()
    try {
      // [00:00,00:10): click×3, view×1; [00:10,00:20): view×2
      val data = Seq((ts(1), 1L, "click"), (ts(2), 2L, "click"), (ts(3), 1L, "view"),
        (ts(4), 3L, "click"), (ts(12), 3L, "view"), (ts(13), 1L, "view"))
      in.addData(data: _*)
      q.processAllAvailable()
      in.addData((Timestamp.valueOf("2024-01-01 03:00:00"), 9L, "click")) // close windows
      q.processAllAvailable()
      val out = spark.table("cms_out")
        .filter(col("w_start") < "2024-01-01 01:00:00")
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2)))
      val got = out.map { case (w, i, n) => (w.toString.substring(11, 16), i) -> n }.toMap
      // 4×2048 cells over ≤2 distinct items per window: estimates are exact
      assert(got == Map(
        ("00:00", "click") -> 3L, ("00:00", "view") -> 1L, ("00:00", "ghost") -> 0L,
        ("00:10", "click") -> 0L, ("00:10", "view") -> 2L, ("00:10", "ghost") -> 0L),
        s"got $got")
      // batch twin: the same column composition over the same frame
      val batch = StreamOps.windowedCmsFrequencies(
          data.toDF("ts", "user_id", "event_type"), watch, watermark = "0 seconds")
        .filter(col("w_start") < "2024-01-01 01:00:00")
        .collect().map(r => (r.getTimestamp(0).toString.substring(11, 16),
          r.getString(1)) -> r.getLong(2)).toMap
      assert(batch == got, "stream and batch grids must agree")
    } finally q.stop()
  }

  test("windowedKmvSketches: per-window sketches equal the batch operator; advance composes") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val body = (1 to 30).map(i => s"tok$i").mkString(" ")
    val in = MemoryStream[(Timestamp, String, String)]
    val docs = in.toDF.toDF("ts", "source", "text")
    val q = StreamOps.windowedKmvSketches(docs, watermark = "0 seconds", k = 64)
      .writeStream.format("memory").queryName("kmv_out").outputMode("append").start()
    try {
      val data = Seq(
        (ts(1), "A", body), (ts(2), "B", body.replace("tok1 ", "other ")),
        (ts(12), "A", body.toUpperCase))
      in.addData(data: _*)
      q.processAllAvailable()
      in.addData((Timestamp.valueOf("2024-01-01 03:00:00"), "Z", body))
      q.processAllAvailable()
      val got = spark.table("kmv_out")
        .filter(col("w_start") < "2024-01-01 01:00:00")
        .collect()
        .map(r => (r.getTimestamp(0).toString.substring(11, 16), r.getString(1)) ->
          r.getSeq[Long](2).toSeq).toMap
      assert(got.keySet ==
        Set(("00:00", "A"), ("00:00", "B"), ("00:10", "A")))
      // each (window, group) sketch equals the batch operator on that slice
      for (((win, grp), sk) <- got) {
        // ts → its 10-minute window start "HH:M0"
        val slice = data.filter { case (t, g, _) =>
          g == grp && t.toString.substring(11, 15) + "0" == win }
        val batch = graft.operators.ScaleOps.kmvSketches(
            slice.toDF("ts", "source", "text"), "source", "text", w = 5, k = 64)
          .collect().map(r => r.getSeq[Long](1).toSeq).head
        assert(sk == batch, s"($win, $grp) sketch diverged from batch")
      }
      // closed-window sketches feed the incremental matrix directly
      val store = spark.table("kmv_out")
        .filter(col("w_start") < "2024-01-01 01:00:00")
        .select(col("grp"), col("sk"))
        .select(col("grp"), explode(col("sk")).as("h"))
        .groupBy("grp").agg(collect_list("h").as("hs"))
        .select(col("grp"), sort_array(array_distinct(col("hs"))).as("sk"))
      val (_, matrix) = graft.operators.ScaleOps.kmvOverlapMatrixAdvance(
        store, Seq.empty[(String, String)].toDF("source", "text"),
        "source", "text", w = 5, k = 64)
      val ab = matrix.collect().map(r => (r.getString(0), r.getString(1)) ->
        r.getDouble(6)).toMap
      // A carries body ∪ BODY (26 + 26 shingles), B shares 25 of body's
      // 26 (the swapped token is the FIRST, so it touches exactly one
      // 5-shingle): exact J = 25 / 53, and k = 64 > |union| makes the
      // estimate exact
      assert(ab.get(("A", "B")).contains(
        BigDecimal(25.0 / 53.0).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble),
        s"sketch overlap must be the exact 25/53 at unsaturated k: $ab")
    } finally q.stop()
  }

  test("runningUserStats: custom keyed state accumulates across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[UserEvent]
    val q = StreamOps.runningUserStats(in.toDS())
      .writeStream.format("memory").queryName("stats_out").outputMode("update").start()
    try {
      in.addData(UserEvent(1L, ts(0), 2.0), UserEvent(1L, ts(1), 3.0))
      q.processAllAvailable()
      in.addData(UserEvent(1L, ts(2), 5.0), UserEvent(2L, ts(2), 1.0))
      q.processAllAvailable()
      val latest = spark.table("stats_out")
        .groupBy("user_id").agg(max("n_events").as("n"), max("total_value").as("tot"))
        .orderBy("user_id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      assert(latest.toSeq == Seq((1L, 3L, 10.0), (2L, 1L, 1.0)))
    } finally q.stop()
  }

  test("scdClosedIntervals matches the batch scd2's closed rows across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[AttrEvent]
    val q = StreamOps.scdClosedIntervals(in.toDS())
      .writeStream.format("memory").queryName("scd_out").outputMode("update").start()
    try {
      // batch 1: gold → gold (no-op) → silver closes gold
      in.addData(AttrEvent(1L, 10L, "gold"), AttrEvent(1L, 20L, "gold"),
        AttrEvent(1L, 30L, "silver"))
      q.processAllAvailable()
      // batch 2: state carries the open silver version; gold closes it.
      // A late row (ts=5) must NOT rewrite history; a duplicate-second
      // observation (ts=40, differing attr) must NOT emit a zero-length
      // [40, 40) version. user 2 stays open.
      in.addData(AttrEvent(1L, 40L, "gold"), AttrEvent(1L, 40L, "platinum"),
        AttrEvent(1L, 5L, "bronze"), AttrEvent(2L, 15L, "bronze"))
      q.processAllAvailable()
      val streamed = spark.table("scd_out")
        .select("user_id", "attr", "valid_from", "valid_to")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
      assert(streamed == Set(
        (1L, "gold", 10L, 30L),
        (1L, "silver", 30L, 40L)))

      // batch operator on the same (in-order) event log: closed rows equal
      val log = Seq((1L, 10L, "gold"), (1L, 20L, "gold"), (1L, 30L, "silver"),
        (1L, 40L, "gold"), (2L, 15L, "bronze")).toDF("user_id", "ts", "attr")
      val batchClosed = graft.operators.Temporal
        .scd2(log, Seq("user_id"), "ts", Seq("attr"))
        .filter(col("is_current") === 0)
        .select("user_id", "attr", "valid_from", "valid_to")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
      assert(streamed == batchClosed)
    } finally q.stop()
  }

  test("windowedSampleQuantiles: exact per window below saturation; batch twin agrees") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, Long, Double)]
    val events = in.toDF.toDF("ts", "id", "v")
    val q = StreamOps.windowedSampleQuantiles(events, "ts", "id", "v",
        k = 100, qs = Seq(0.5, 1.0), watermark = "0 seconds")
      .writeStream.format("memory").queryName("wsq_out").outputMode("append").start()
    try {
      // [00:00,00:10): values 1..4; [00:10,00:20): 100, 200
      in.addData((ts(1), 1L, 1.0), (ts(2), 2L, 2.0), (ts(3), 3L, 3.0),
        (ts(4), 4L, 4.0), (ts(12), 5L, 100.0), (ts(13), 6L, 200.0))
      q.processAllAvailable()
      in.addData((Timestamp.valueOf("2024-01-01 03:00:00"), 9L, 0.0))
      q.processAllAvailable()
      val out = spark.table("wsq_out")
        .filter(col("w_start") < "2024-01-01 01:00:00")
        .orderBy("w_start", "q").collect()
        .map(r => (r.getDouble(1), r.getDouble(2), r.getLong(3)))
      // window 1: p50 = ceil(.5*4)=2nd value = 2.0, max = 4.0
      assert(out.toSeq == Seq((0.5, 2.0, 4L), (1.0, 4.0, 4L),
        (0.5, 100.0, 2L), (1.0, 200.0, 2L)), s"got ${out.toSeq}")
      // batch twin over the same rows emits the identical report
      val batch = Seq((ts(1), 1L, 1.0), (ts(2), 2L, 2.0), (ts(3), 3L, 3.0),
        (ts(4), 4L, 4.0), (ts(12), 5L, 100.0), (ts(13), 6L, 200.0))
        .toDF("ts", "id", "v")
      val twin = StreamOps.windowedSampleQuantiles(batch, "ts", "id", "v",
          k = 100, qs = Seq(0.5, 1.0), watermark = "0 seconds")
        .orderBy("w_start", "q").collect()
        .map(r => (r.getDouble(1), r.getDouble(2), r.getLong(3)))
      assert(twin.toSeq == out.toSeq)
    } finally q.stop()
  }

  test("windowedFertility: per-window per-lang counters match the batch operator's grid") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val enc = graft.operators.Bpe.encodeNative(spark,
      Seq("a" -> "b", "ab" -> "</w>", "c" -> "</w>"))
    val in = MemoryStream[(Timestamp, String, String)]
    val events = in.toDF.toDF("ts", "lang", "text")
    val q = StreamOps.windowedFertility(events, "ts", "lang", "text", enc,
        watermark = "0 seconds")
      .writeStream.format("memory").queryName("wf_out").outputMode("append").start()
    try {
      // [00:00,00:10): en {"ab c", "ab"}; [00:10,00:20): de {"c c"}
      in.addData((ts(1), "en", "ab c"), (ts(2), "en", "ab"), (ts(12), "de", "c c"))
      q.processAllAvailable()
      in.addData((Timestamp.valueOf("2024-01-01 03:00:00"), "en", "x")) // close windows
      q.processAllAvailable()
      val out = spark.table("wf_out")
        .filter(col("w_start") < "2024-01-01 01:00:00")
        .orderBy("w_start", "lang").collect()
        .map(r => (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6), r.getDouble(7), r.getDouble(8), r.getDouble(9)))
      // en: 2 docs, 3 words, 5 chars/bytes, 3 tokens (ab</w>, c</w>, ab</w>)
      assert(out.toSeq == Seq(
        ("en", 2L, 3L, 5L, 5L, 3L, 1.0, 0.6, 1.666667),
        ("de", 1L, 2L, 2L, 2L, 2L, 1.0, 1.0, 1.0)), s"got ${out.toSeq}")
      // batch twin over the same rows emits the identical grid
      val batch = Seq((ts(1), "en", "ab c"), (ts(2), "en", "ab"), (ts(12), "de", "c c"))
        .toDF("ts", "lang", "text")
      val twin = StreamOps.windowedFertility(batch, "ts", "lang", "text", enc,
          watermark = "0 seconds")
        .orderBy("w_start", "lang").collect()
        .map(r => (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6), r.getDouble(7), r.getDouble(8), r.getDouble(9)))
      assert(twin.toSeq == out.toSeq, "batch and stream must emit identical grids")
    } finally q.stop()
  }

  test("windowedLangIdConfusion: per-window cells match the batch twin; diagonal flagged") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, String, String)]
    val events = in.toDF.toDF("ts", "lang", "text")
    val q = StreamOps.windowedLangIdConfusion(events, "ts", "lang", "text",
        watermark = "0 seconds")
      .writeStream.format("memory").queryName("wlc_out").outputMode("append").start()
    try {
      // window 1: en correct ×2 + one es-looking mislabel; window 2: de correct
      in.addData(
        (ts(1), "en", "the cat and the dog"), (ts(2), "en", "the and of"),
        (ts(3), "en", "el que la con"), (ts(12), "de", "der und das ist"))
      q.processAllAvailable()
      in.addData((Timestamp.valueOf("2024-01-01 03:00:00"), "en", "x"))
      q.processAllAvailable()
      val out = spark.table("wlc_out")
        .filter(col("w_start") < "2024-01-01 01:00:00")
        .orderBy("w_start", "label", "pred").collect()
        .map(r => (r.getString(1), r.getString(2), r.getLong(3), r.getBoolean(4)))
      assert(out.toSeq == Seq(
        ("en", "en", 2L, true), ("en", "es", 1L, false), ("de", "de", 1L, true)),
        s"got ${out.toSeq}")
      // batch twin over the same rows
      val batch = Seq(
        (ts(1), "en", "the cat and the dog"), (ts(2), "en", "the and of"),
        (ts(3), "en", "el que la con"), (ts(12), "de", "der und das ist"))
        .toDF("ts", "lang", "text")
      val twin = StreamOps.windowedLangIdConfusion(batch, "ts", "lang", "text",
          watermark = "0 seconds")
        .orderBy("w_start", "label", "pred").collect()
        .map(r => (r.getString(1), r.getString(2), r.getLong(3), r.getBoolean(4)))
      assert(twin.toSeq == out.toSeq)
    } finally q.stop()
  }

  test("windowedPsiDrift: per-window PSI vs the baseline; batch twin agrees; one-sided + coverage") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val baseline = Map("en" -> 0.5, "de" -> 0.5)
    val in = MemoryStream[(Timestamp, String)]
    val events = in.toDF.toDF("ts", "lang")
    val q = StreamOps.windowedPsiDrift(events, "ts", "lang", baseline,
        watermark = "0 seconds")
      .writeStream.format("memory").queryName("psi_out").outputMode("append").start()
    try {
      // [00:00,00:10): en×3, de×1, zz×1 (off-baseline) → shares 3/4, 1/4,
      // coverage 4/5; [00:10,00:20): de only → en is one-sided
      in.addData((ts(1), "en"), (ts(2), "en"), (ts(3), "de"), (ts(4), "en"),
        (ts(5), "zz"), (ts(12), "de"))
      q.processAllAvailable()
      in.addData((Timestamp.valueOf("2024-01-01 03:00:00"), "en")) // close windows
      q.processAllAvailable()
      val out = spark.table("psi_out")
        .filter(col("w_start") < "2024-01-01 01:00:00")
        .orderBy("w_start", "cat").collect()
        .map(r => (r.getString(1), r.getLong(2), r.getDouble(3),
          r.getBoolean(5), Option(r.get(6)), r.getDouble(7)))
      // window 1: de (n=1, share .25), en (n=3, share .75)
      assert(out(0)._1 == "de" && out(0)._2 == 1L && out(0)._3 == 0.25)
      assert(out(1)._1 == "en" && out(1)._2 == 3L && out(1)._3 == 0.75)
      assert(out(0)._6 == 0.8 && out(1)._6 == 0.8, "off-baseline zz lowers coverage")
      // PSI contributions positive on both moved categories
      assert(out(0)._5.exists(_.asInstanceOf[Double] > 0.0))
      assert(out(1)._5.exists(_.asInstanceOf[Double] > 0.0))
      // window 2: en has zero rows → one_sided, NULL psi
      assert(out(2)._1 == "de" && out(2)._3 == 1.0 && !out(2)._4)
      assert(out(3)._1 == "en" && out(3)._2 == 0L && out(3)._4 && out(3)._5.isEmpty)
      // the same code run in BATCH mode over the same rows agrees
      val batch = Seq((ts(1), "en"), (ts(2), "en"), (ts(3), "de"), (ts(4), "en"),
        (ts(5), "zz"), (ts(12), "de")).toDF("ts", "lang")
      val twin = StreamOps.windowedPsiDrift(batch, "ts", "lang", baseline,
          watermark = "0 seconds")
        .orderBy("w_start", "cat").collect()
        .map(r => (r.getString(1), r.getLong(2), r.getDouble(3),
          r.getBoolean(5), Option(r.get(6)), r.getDouble(7)))
      assert(twin.toSeq == out.toSeq, "batch and stream must emit identical reports")
    } finally q.stop()
  }

  test("windowedPsiDrift: categories with dots/backticks survive the pivot (index-named columns)") {
    import spark.implicits._
    // "en.US" / "de`at" used to break col("__n_en.US") resolution at
    // analysis time — the pivot now names columns by baseline index
    val baseline = Map("en.US" -> 0.5, "de`at" -> 0.5)
    val batch = Seq((ts(1), "en.US"), (ts(2), "en.US"), (ts(3), "de`at"))
      .toDF("ts", "lang")
    val out = StreamOps.windowedPsiDrift(batch, "ts", "lang", baseline,
        watermark = "0 seconds")
      .orderBy("cat").collect()
      .map(r => (r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == Seq(("de`at", 1L, 1.0 / 3.0), ("en.US", 2L, 2.0 / 3.0)))
  }

  test("windowedKsDriftByGroup: per-(window, group) KS vs baseline equals the batch operator") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // baseline: group x = {1..4}, group y = {10, 20}
    val baseDf = Seq((1L, "x", 1.0), (2L, "x", 2.0), (3L, "x", 3.0),
      (4L, "x", 4.0), (5L, "y", 10.0), (6L, "y", 20.0)).toDF("id", "grp", "v")
    val baseline = graft.quality.Drift.baselineSamples(baseDf, "grp", "id", "v", k = 100)
    assert(baseline("x")._1 == 4L && baseline("y")._1 == 2L)

    val in = MemoryStream[(Timestamp, Long, String, Double)]
    val events = in.toDF.toDF("ts", "id", "grp", "v")
    val q = StreamOps.windowedKsDriftByGroup(events, "ts", "grp", "id", "v",
        baseline, k = 100, watermark = "0 seconds")
      .writeStream.format("memory").queryName("wks_out").outputMode("append").start()
    try {
      // window [00:00,00:10): x shifted up (5,6,7), y unchanged (10,20),
      // z unseen in the baseline
      val windowRows = Seq((ts(1), 11L, "x", 5.0), (ts(2), 12L, "x", 6.0),
        (ts(3), 13L, "x", 7.0), (ts(4), 14L, "y", 10.0),
        (ts(5), 15L, "y", 20.0), (ts(6), 16L, "z", 1.0))
      in.addData(windowRows: _*)
      q.processAllAvailable()
      in.addData((Timestamp.valueOf("2024-01-01 03:00:00"), 99L, "x", 0.0))
      q.processAllAvailable()
      val streamed = spark.table("wks_out")
        .filter(col("w_start") < "2024-01-01 01:00:00")
        .select("grp", "n_a", "n_b", "m_a", "m_b", "d_stat", "at_value", "one_sided")
        .collect().map(r => (r.getString(0),
          if (r.isNullAt(1)) -1L else r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4),
          if (r.isNullAt(5)) Double.NaN else r.getDouble(5),
          if (r.isNullAt(6)) Double.NaN else r.getDouble(6),
          r.getBoolean(7))).sortBy(_._1)
      // batch twin: the SAME baseline rows vs the window's rows
      val winDf = windowRows.toDF("ts", "id", "grp", "v")
      val batch = graft.quality.Drift.ksDriftByGroup(
          baseDf, winDf, "grp", "id", "v", k = 100)
        .select("grp", "n_a", "n_b", "m_a", "m_b", "d_stat", "at_value", "one_sided")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4),
          if (r.isNullAt(5)) Double.NaN else r.getDouble(5),
          if (r.isNullAt(6)) Double.NaN else r.getDouble(6),
          r.getBoolean(7))).sortBy(_._1)
      // the stream emits only window-ACTIVE groups; the batch twin also
      // reports baseline-only groups — compare on the intersection
      val streamGroups = streamed.map(_._1).toSet
      val batchShared = batch.filter(t => streamGroups(t._1))
      // z: unseen in baseline → one_sided, NULL n_a/d_stat (the stream
      // surfaces -1 sentinel for the null n_a in this tuple-ization)
      val z = streamed.find(_._1 == "z").get
      assert(z._8 && z._6.isNaN && z._2 == -1L)
      // x and y: every number equals the batch operator's
      def cmp(a: (String, Long, Long, Long, Long, Double, Double, Boolean),
          b: (String, Long, Long, Long, Long, Double, Double, Boolean)) = {
        assert(a._1 == b._1); assert(a._3 == b._3)
        assert(a._4 == b._4); assert(a._5 == b._5)
        assert(a._6 == b._6 || (a._6.isNaN && b._6.isNaN))
        assert(a._7 == b._7 || (a._7.isNaN && b._7.isNaN))
        assert(a._8 == b._8)
      }
      streamed.filter(_._1 != "z").zip(batchShared.filter(_._1 != "z"))
        .foreach { case (a, b) => cmp(a, b); assert(a._2 == b._2) }
      // and the shifted group actually drifted while the stable one didn't
      val x = streamed.find(_._1 == "x").get
      val y = streamed.find(_._1 == "y").get
      assert(x._6 > y._6)
    } finally q.stop()
  }

  test("windowedQuantileDriftByGroup: per-(window, group) quantile deltas equal the batch operator") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val baseDf = Seq((1L, "x", 1.0), (2L, "x", 2.0), (3L, "x", 3.0),
      (4L, "x", 4.0), (5L, "y", 10.0), (6L, "y", 20.0)).toDF("id", "grp", "v")
    val baseline = graft.quality.Drift.baselineSamples(baseDf, "grp", "id", "v", k = 100)
    val in = MemoryStream[(Timestamp, Long, String, Double)]
    val events = in.toDF.toDF("ts", "id", "grp", "v")
    val qs = Seq(0.5, 1.0)
    val q = StreamOps.windowedQuantileDriftByGroup(events, "ts", "grp", "id", "v",
        baseline, k = 100, qs = qs, watermark = "0 seconds")
      .writeStream.format("memory").queryName("wqd_out").outputMode("append").start()
    try {
      val windowRows = Seq((ts(1), 11L, "x", 5.0), (ts(2), 12L, "x", 6.0),
        (ts(3), 13L, "x", 7.0), (ts(4), 14L, "y", 10.0), (ts(5), 15L, "y", 20.0))
      in.addData(windowRows: _*)
      q.processAllAvailable()
      in.addData((Timestamp.valueOf("2024-01-01 03:00:00"), 99L, "x", 0.0))
      q.processAllAvailable()
      def tup(r: org.apache.spark.sql.Row) = (r.getString(0), r.getDouble(1),
        if (r.isNullAt(2)) Double.NaN else r.getDouble(2),
        if (r.isNullAt(3)) Double.NaN else r.getDouble(3),
        if (r.isNullAt(4)) Double.NaN else r.getDouble(4),
        r.getLong(5), r.getLong(6), r.getBoolean(7))
      val streamed = spark.table("wqd_out")
        .filter(col("w_start") < "2024-01-01 01:00:00")
        .select("grp", "q", "value_a", "value_b", "delta", "m_a", "m_b", "one_sided")
        .collect().map(tup).sortBy(t => (t._1, t._2))
      val batch = graft.quality.Drift.quantileDriftByGroup(
          baseDf, windowRows.toDF("ts", "id", "grp", "v"),
          "grp", "id", "v", k = 100, qs = qs)
        .select("grp", "q", "value_a", "value_b", "delta", "m_a", "m_b", "one_sided")
        .collect().map(tup).sortBy(t => (t._1, t._2))
      assert(streamed.length == 4) // 2 groups × 2 quantiles
      assert(streamed.toSeq == batch.toSeq,
        s"stream ${streamed.toSeq} vs batch ${batch.toSeq}")
    } finally q.stop()
  }
}
