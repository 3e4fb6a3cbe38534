package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Typed row for the custom-state operators (shape of the `events` table's
  * core columns).
  */
case class UserEvent(user_id: Long, ts: java.sql.Timestamp, value: Double)

/** Running per-user aggregate emitted by [[StreamOps.runningUserStats]]. */
case class UserStats(user_id: Long, n_events: Long, total_value: Double)

/** Keyed attribute observation for the streaming SCD feed. */
case class AttrEvent(user_id: Long, ts: Long, attr: String)

/** Open-version state held per key by [[StreamOps.scdClosedIntervals]]. */
case class ScdOpen(attr: String, since: Long)

/** A finished dimension version: [valid_from, valid_to) — the streaming
  * complement of `graft.operators.Temporal.scd2`'s closed rows.
  */
case class ClosedVersion(user_id: Long, attr: String, valid_from: Long, valid_to: Long)

/** Structured Streaming twins of the batch operators — a clearly-marked
  * EXTENSION: the reference is daily batch only (no streaming imports
  * anywhere; schedule at `airflow_dag_code/data_lake_query_pyspark.py:16`),
  * but its `events`-style data is the canonical streaming input, so the
  * engine ships the streaming shapes a training-data pipeline needs.
  *
  * Every operator here takes/returns an UNBOUNDED DataFrame (from
  * `spark.readStream`) and is driven by event time + watermark, so state
  * is bounded and the same code runs on a 1000-executor cluster: state is
  * partitioned by the grouping key across executors, and the watermark
  * bounds per-key state retention regardless of stream length.
  */
object StreamOps {

  /** Gap-based sessions via `session_window` — the streaming twin of
    * `graft.operators.Sessionize.sessions`. Completed sessions are
    * emitted once their window closes past the watermark (append mode).
    */
  def sessionAggregates(
      events: DataFrame,
      tsCol: String = "ts",
      userCol: String = "user_id",
      gap: String = "30 minutes",
      watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(col(userCol), session_window(col(tsCol), gap))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value")).as("total_value"))
      .select(
        col(userCol),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("total_value"))

  /** Tumbling (slide == window) or sliding windowed counts per event type.
    * Watermark bounds state; late rows beyond it are dropped.
    */
  def windowedEventCounts(
      events: DataFrame,
      tsCol: String = "ts",
      window_ : String = "10 minutes",
      slide: String = "10 minutes",
      watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(
        org.apache.spark.sql.functions.window(col(tsCol), window_, slide),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(
        col("window.start").as("w_start"),
        col("window.end").as("w_end"),
        col("event_type"), col("n_events"))

  /** Exact streaming dedup with state bounded by the watermark — the
    * streaming twin of `Dedup.exact`. Duplicates arriving within the
    * watermark horizon of the first occurrence are dropped; state for
    * older keys is evicted, so memory is O(keys per horizon), not
    * O(stream).
    */
  def dedupWithinWatermark(
      df: DataFrame,
      keys: Seq[String],
      tsCol: String = "ts",
      watermark: String = "1 hour"): DataFrame =
    df.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keys.head, keys.tail.toIndexedSeq: _*)

  /** Stream-static enrichment join: attach dimension attributes to a
    * stream. The static side is re-planned per micro-batch (picks up
    * dim-table updates) and broadcast when small — no streaming state at
    * all, so this is the cheapest join shape; prefer it whenever one
    * side is bounded.
    */
  def enrich(
      stream: DataFrame,
      dim: DataFrame,
      key: String,
      joinType: String = "left"): DataFrame =
    stream.join(broadcast(dim), Seq(key), joinType)

  /** Stream-stream inner join within a bounded event-time gap: each left
    * row matches right rows of the same key whose timestamp is within
    * [leftTs - gap, leftTs]. BOTH sides are watermarked — that bounds
    * the buffered state on each side to the gap+watermark horizon, which
    * is what makes an unbounded×unbounded join feasible.
    */
  def intervalJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      gap: String = "10 minutes",
      watermark: String = "1 hour"): DataFrame = {
    val l = left.withWatermark(leftTs, watermark)
    val r = right.withWatermark(rightTs, watermark)
    l.join(
      r,
      l(key) === r(key) &&
        r(rightTs) >= l(leftTs) - expr(s"INTERVAL $gap") &&
        r(rightTs) <= l(leftTs),
      "inner")
      .drop(r(key))
  }

  /** Windowed APPROXIMATE distinct users per event type — exact
    * count(DISTINCT) is unsupported in streaming (it would need
    * unbounded per-window sets); the HLL±-style sketch behind
    * `approx_count_distinct` is mergeable and constant-size, so this is
    * THE shape for streaming cardinality at any scale. `rsd` trades
    * sketch size for error (0.05 → ~5% relative standard deviation).
    */
  def windowedDistinctUsers(
      events: DataFrame,
      tsCol: String = "ts",
      userCol: String = "user_id",
      window_ : String = "10 minutes",
      watermark: String = "1 hour",
      rsd: Double = 0.05): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(
        org.apache.spark.sql.functions.window(col(tsCol), window_),
        col("event_type"))
      .agg(approx_count_distinct(col(userCol), rsd).as("n_users_approx"))
      .select(
        col("window.start").as("w_start"),
        col("event_type"),
        col("n_users_approx"))

  /** Windowed PSI drift monitor: per event-time window, the Population
    * Stability Index of a categorical column against a BASELINE mix
    * (driver-resolved shares — the blessed corpus mix, a previous
    * release's language distribution). The live alarm twin of
    * `graft.quality.Drift.psiDrift`: "the language mix of what we're
    * ingesting moved 20 points in the last hour".
    *
    * One stateful aggregate per window, whose state is |baseline|+1
    * LONGS — per-category counts pivot into COLUMNS during aggregation
    * (the baseline's category set is a driver constant), so no chained
    * stateful operator and no unbounded category state: categories
    * outside the baseline fold into `__other`, which surfaces as a
    * coverage ratio rather than creating state. A stateless projection
    * explodes the columns back to (window, category) rows with the
    * batch operator's exact arithmetic (integer counts → shares →
    * 6dp-ln PSI); zero-count categories get NULL psi + the one_sided
    * flag, mirroring the batch report.
    */
  def windowedPsiDrift(
      events: DataFrame,
      tsCol: String,
      catCol: String,
      baseline: Map[String, Double],
      window_ : String = "10 minutes",
      watermark: String = "1 hour"): DataFrame = {
    require(baseline.nonEmpty, "baseline mix must be non-empty")
    require(baseline.values.forall(v => v > 0.0 && v <= 1.0),
      "baseline shares must be in (0, 1]")
    val cats = baseline.keys.toSeq.sorted
    // pivot columns are named by the category's INDEX in the sorted
    // baseline, not the raw string — a category containing a dot or
    // backtick ("en.US") would otherwise break col() re-resolution at
    // analysis time
    val catCounts = cats.zipWithIndex.map { case (c, i) =>
      sum(when(col(catCol) === c, 1L).otherwise(0L)).as(s"__n_$i")
    }
    val agg = events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), window_))
      .agg(count(lit(1)).as("__total"), catCounts: _*)
    // stateless explode back to rows; per-category share uses the
    // IN-BASELINE total so the shares compare like-for-like even when
    // off-baseline categories appear (they surface via coverage)
    val inBase = cats.indices.map(i => col(s"__n_$i")).reduce(_ + _)
    val perCat = cats.zipWithIndex.map { case (c, i) =>
      struct(lit(c).as("cat"), col(s"__n_$i").as("n"),
        lit(baseline(c)).as("base_share"))
    }
    agg
      .withColumn("__inbase", inBase)
      .select(col("window.start").as("w_start"), col("__total"),
        col("__inbase"), explode(array(perCat: _*)).as("e"))
      .select(
        col("w_start"),
        col("e.cat").as("cat"),
        col("e.n").as("n"),
        (col("e.n").cast("double") / col("__inbase").cast("double")).as("share"),
        col("e.base_share"),
        (col("e.n") === 0L).as("one_sided"),
        when(col("e.n") === 0L, lit(null).cast("double"))
          .otherwise(round(
            (col("e.n").cast("double") / col("__inbase").cast("double")
              - col("e.base_share"))
              * round(log((col("e.n").cast("double") / col("__inbase").cast("double"))
                / col("e.base_share")), 6), 6)).as("psi"),
        (col("__inbase").cast("double") / col("__total").cast("double"))
          .as("baseline_coverage"))
  }

  /** Windowed deterministic sample QUANTILES — p50/p99 of a value per
    * event-time window from BOUNDED state: the value-carrying KMV
    * aggregate (`graft.functions.BottomKValues`, 2k longs per window,
    * mergeable) where an ORDER BY per window is impossible in a
    * stream. The streaming twin of
    * `graft.operators.ScaleOps.sampleQuantilesByGroup`: same md5-60-bit
    * sample, same nearest-rank rule, so a batch replay of the window's
    * rows reproduces every emitted number. `keyCol` must be unique per
    * row (the sample contract); NULL-key rows are filtered before
    * hashing, matching the batch twin (they would otherwise collapse
    * onto one hash slot and bias the sample).
    */
  def windowedSampleQuantiles(
      events: DataFrame,
      tsCol: String,
      keyCol: String,
      valueCol: String,
      k: Int,
      qs: Seq[Double],
      window_ : String = "10 minutes",
      watermark: String = "1 hour"): DataFrame = {
    require(k > 0, "k must be positive")
    require(qs.nonEmpty && qs.forall(q => q > 0.0 && q <= 1.0),
      "quantiles must be in (0, 1]")
    val h = conv(substring(
      md5(concat_ws(":", lit("0"), col(keyCol).cast("string"))),
      1, 15), 16, 10).cast("long")
    events
      .filter(col(keyCol).isNotNull)
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), window_))
      .agg(graft.functions.BottomKValues
        .sample(h, col(valueCol).cast("double"), k).as("__vals"))
      .select(col("window.start").as("w_start"),
        sort_array(col("__vals")).as("__vs"),
        size(col("__vals")).cast("long").as("m"))
      .select(col("w_start"), col("__vs"), col("m"),
        explode(array(qs.map(lit): _*)).as("q"))
      .select(col("w_start"), col("q"),
        element_at(col("__vs"),
          greatest(lit(1L), ceil(col("q") * col("m"))).cast("int")).as("value"),
        col("m").as("sample_size"))
  }

  /** Windowed PER-GROUP KS drift monitor: for every (event-time
    * window, group) the exact two-sample Kolmogorov–Smirnov statistic
    * of the window's value distribution against a DRIVER-RESOLVED
    * baseline sample (`graft.quality.Drift.baselineSamples` — model
    * state like the k-means centroids, |groups|-bounded, frozen at
    * query start) — the live twin of `Drift.ksDriftByGroup` ("French
    * document lengths collapsed in the last ten minutes"). Same
    * md5-60-bit KMV samples, same exact-integer candidate argmax, same
    * smallest-value tie-break, so a batch replay of a window's rows
    * against the same baseline reproduces every number (spec-pinned).
    *
    * Structure: ONE stateful aggregate (the value-carrying KMV,
    * 2k longs per (window, group), mergeable, watermark-expired); the
    * KS argmax runs as STATELESS array expressions on the closed
    * aggregate row (`Drift.ksBest`, one O(m log m) sorted-merge pass —
    * a second grouped argmax would be a chained stateful aggregate,
    * which append-mode streams forbid).
    *
    * Groups absent from the baseline surface with `one_sided` = true
    * and NULL d_stat — never a silent drop. Same `keyCol` contract as
    * the batch twin (unique per row; NULL keys filtered).
    */
  def windowedKsDriftByGroup(
      events: DataFrame,
      tsCol: String,
      groupCol: String,
      keyCol: String,
      valueCol: String,
      baseline: Map[String, (Long, Array[Double])],
      k: Int,
      window_ : String = "10 minutes",
      watermark: String = "1 hour",
      seed: Long = 0L): DataFrame = {
    require(k > 0, "k must be positive")
    require(baseline.nonEmpty, "baseline samples must be non-empty")
    val groups = baseline.keys.toSeq.sorted
    // baseline as foldable map literals (group → sorted sample, group
    // → population count): Catalyst collapses them once, per-row cost
    // is the map lookup
    val bVals = map_from_arrays(lit(groups.toArray),
      array(groups.map(g => lit(baseline(g)._2.sorted)): _*))
    val bNs = map_from_arrays(lit(groups.toArray),
      lit(groups.map(g => baseline(g)._1).toArray))
    val h = conv(substring(
      md5(concat_ws(":", lit(seed.toString), col(keyCol).cast("string"))),
      1, 15), 16, 10).cast("long")
    val agg = events
      .filter(col(keyCol).isNotNull)
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), window_), col(groupCol))
      .agg(count(lit(1)).as("n_b"),
        graft.functions.BottomKValues
          .sample(h, col(valueCol).cast("double"), k).as("__vb"))
    val withBase = agg.select(
      col("window.start").as("w_start"), col(groupCol),
      element_at(bNs, col(groupCol).cast("string")).as("n_a"),
      col("n_b"),
      coalesce(element_at(bVals, col(groupCol).cast("string")),
        array().cast("array<double>")).as("__va"),
      col("__vb"))
      .withColumn("m_a", size(col("__va")).cast("long"))
      .withColumn("m_b", size(col("__vb")).cast("long"))
    // the batch twin's exact-integer argmax, as the SAME O(m log m)
    // sorted-merge kernel (Drift.ksBest) — stateless array expressions
    // on the closed aggregate row
    val best = graft.quality.Drift.ksBest(
      col("__va"), col("__vb"), col("m_a"), col("m_b"))
    withBase
      .withColumn("__best", best)
      .select(
        col("w_start"), col(groupCol), col("n_a"), col("n_b"),
        col("m_a"), col("m_b"),
        when(col("m_a") === 0L || col("m_b") === 0L, lit(null).cast("double"))
          .otherwise((col("__best.nad").cast("double") * -1.0)
            / (col("m_a").cast("double") * col("m_b").cast("double"))).as("d_stat"),
        when(col("m_a") === 0L || col("m_b") === 0L, lit(null).cast("double"))
          .otherwise(col("__best.v")).as("at_value"),
        (col("m_a") === 0L || col("m_b") === 0L).as("one_sided"))
  }

  /** Windowed PER-GROUP QUANTILE drift: p50/p99-style location shifts
    * of each (window, group) against the driver-resolved baseline
    * sample — the LOCATION companion to [[windowedKsDriftByGroup]]
    * (shape) and [[windowedPsiDrift]] (mix), live. Nearest-rank over
    * the same deterministic KMV samples as the batch
    * `Drift.quantileDriftByGroup`; a batch replay of a window's rows
    * reproduces every number (spec-pinned). One stateful aggregate;
    * the quantile indexing and the qs expansion are stateless on the
    * closed row. Groups absent from the baseline surface with NULLs
    * and `one_sided`.
    */
  def windowedQuantileDriftByGroup(
      events: DataFrame,
      tsCol: String,
      groupCol: String,
      keyCol: String,
      valueCol: String,
      baseline: Map[String, (Long, Array[Double])],
      k: Int,
      qs: Seq[Double],
      window_ : String = "10 minutes",
      watermark: String = "1 hour",
      seed: Long = 0L): DataFrame = {
    require(k > 0, "k must be positive")
    require(baseline.nonEmpty, "baseline samples must be non-empty")
    require(qs.nonEmpty && qs.forall(q => q > 0.0 && q <= 1.0),
      "quantiles must be in (0, 1]")
    val groups = baseline.keys.toSeq.sorted
    val bVals = map_from_arrays(lit(groups.toArray),
      array(groups.map(g => lit(baseline(g)._2.sorted)): _*))
    val h = conv(substring(
      md5(concat_ws(":", lit(seed.toString), col(keyCol).cast("string"))),
      1, 15), 16, 10).cast("long")
    val agg = events
      .filter(col(keyCol).isNotNull)
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), window_), col(groupCol))
      .agg(graft.functions.BottomKValues
        .sample(h, col(valueCol).cast("double"), k).as("__vb"))
    def at(vs: org.apache.spark.sql.Column, m: org.apache.spark.sql.Column) =
      when(m === 0L, lit(null).cast("double"))
        .otherwise(element_at(vs,
          greatest(lit(1L), ceil(col("q") * m)).cast("int")))
    agg.select(
        col("window.start").as("w_start"), col(groupCol),
        coalesce(element_at(bVals, col(groupCol).cast("string")),
          array().cast("array<double>")).as("__va"),
        sort_array(col("__vb")).as("__vbs"))
      .withColumn("m_a", size(col("__va")).cast("long"))
      .withColumn("m_b", size(col("__vbs")).cast("long"))
      .select(col("w_start"), col(groupCol), col("m_a"), col("m_b"),
        col("__va"), col("__vbs"),
        explode(array(qs.map(lit): _*)).as("q"))
      .select(col("w_start"), col(groupCol), col("q"),
        at(col("__va"), col("m_a")).as("value_a"),
        at(col("__vbs"), col("m_b")).as("value_b"),
        (at(col("__vbs"), col("m_b")) - at(col("__va"), col("m_a"))).as("delta"),
        col("m_a"), col("m_b"),
        (col("m_a") === 0L || col("m_b") === 0L).as("one_sided"))
  }

  /** Windowed tokenizer-FERTILITY monitor: per event-time window and
    * language, the exact word/char/byte/token counters and 6dp ratios
    * of `graft.operators.TextAnalysis.tokenizerFertility`, live — the
    * ingest-side alarm for "the crawl just started feeding us a
    * language this tokenizer taxes 3×" (sequence-budget blowups show
    * up here before the packing stage pays them). The per-document
    * counters are STATELESS map-only projections (native bpe kernel,
    * fold-in-place word counters); the one stateful aggregate carries
    * five longs per (window, language) — bounded by the language set,
    * mergeable, watermark-expired. A batch replay of the window's rows
    * through the batch operator reproduces every emitted number
    * (spec-pinned).
    */
  def windowedFertility(
      events: DataFrame,
      tsCol: String,
      langCol: String,
      textCol: String,
      enc: org.apache.spark.sql.Column => org.apache.spark.sql.Column,
      window_ : String = "10 minutes",
      watermark: String = "1 hour"): DataFrame = {
    val words = coalesce(
      filter(split(trim(lower(col(textCol))),
        graft.operators.TextAnalysis.WhitespaceSplit), w => w =!= lit("")),
      array().cast("array<string>"))
    def ratio(num: org.apache.spark.sql.Column, den: org.apache.spark.sql.Column) =
      when(den === 0L, lit(null).cast("double"))
        .otherwise(round(num.cast("double") / den.cast("double"), 6))
    events
      .withWatermark(tsCol, watermark)
      .select(col(tsCol), col(langCol).as("lang"),
        size(enc(col(textCol))).cast("long").as("__nt"),
        size(words).cast("long").as("__nw"),
        aggregate(words, lit(0L), (acc, w) => acc + length(w).cast("long")).as("__nc"),
        aggregate(words, lit(0L), (acc, w) => acc + octet_length(w).cast("long")).as("__nb"))
      .groupBy(window(col(tsCol), window_), col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__nw")).as("n_words"),
        sum(col("__nc")).as("n_chars"),
        sum(col("__nb")).as("n_bytes"),
        sum(col("__nt")).as("n_tokens"))
      .select(col("window.start").as("w_start"), col("lang"),
        col("n_docs"), col("n_words"), col("n_chars"), col("n_bytes"),
        col("n_tokens"),
        ratio(col("n_tokens"), col("n_words")).as("tokens_per_word"),
        ratio(col("n_tokens"), col("n_chars")).as("tokens_per_char"),
        ratio(col("n_bytes"), col("n_tokens")).as("bytes_per_token"))
  }

  /** Windowed language-ID CONFUSION monitor: per event-time window,
    * the (label, predicted) cell counts of the q97 heuristic against
    * the labeled language — the live router-health twin of
    * `graft.operators.TextAnalysis.langIdConfusion` ("the crawler's
    * labels and the router started disagreeing on French an hour
    * ago"). Scoring is stateless map-only expressions; the ONE
    * stateful aggregate carries a long per (window, label, pred) —
    * bounded by |labels|·|languages+1|. Counts only (shares divide by
    * a per-(window, label) margin, which would need a second chained
    * stateful aggregate — the consumer derives them from the closed
    * cells, exactly as the batch operator does from its cell frame).
    */
  def windowedLangIdConfusion(
      events: DataFrame,
      tsCol: String,
      labelCol: String,
      textCol: String,
      window_ : String = "10 minutes",
      watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .select(col(tsCol), col(labelCol).cast("string").as("label"),
        graft.operators.TextAnalysis.langId(col(textCol)).as("pred"))
      .groupBy(window(col(tsCol), window_), col("label"), col("pred"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("w_start"), col("label"), col("pred"),
        col("n"), (col("label") === col("pred")).as("is_correct"))

  /** Windowed Count-Min frequency estimates for a WATCH LIST of items —
    * exact per-item streaming counts over an unbounded item universe
    * need one state row per (window, item); the CMS grid
    * ([[graft.functions.CountMin]], the q211 aggregate) is mergeable
    * CONSTANT-size state per window, the same argument
    * [[windowedDistinctUsers]] makes for cardinality. The grid
    * aggregates under the watermark and the watched items probe it
    * DECLARATIVELY (q211's md5-cell arithmetic) after the window
    * closes — one-sided estimates (never under), any item addressable
    * after the fact, state size fixed at depth×width longs per window.
    */
  def windowedCmsFrequencies(
      events: DataFrame,
      watch: Seq[String],
      itemCol: String = "event_type",
      tsCol: String = "ts",
      window_ : String = "10 minutes",
      watermark: String = "1 hour",
      depth: Int = 4,
      width: Int = 2048): DataFrame = {
    require(watch.nonEmpty, "need at least one watched item")
    events
      .withWatermark(tsCol, watermark)
      .groupBy(org.apache.spark.sql.functions.window(col(tsCol), window_))
      .agg(graft.functions.CountMin.sketch(
        col(itemCol).cast("string"), depth, width).as("__sk"))
      .select(col("window.start").as("w_start"), col("__sk"))
      .withColumn("item", explode(array(watch.map(lit).toIndexedSeq: _*)))
      .withColumn("n_est",
        graft.functions.CountMin.estimate(col("__sk"), col("item"), depth, width))
      .drop("__sk")
  }

  /** Windowed per-group KMV sketches — the streaming twin of
    * `ScaleOps.kmvSketches` (q227/q228's state): per (event window,
    * group) the bottom-k md5-60-bit shingle keys plus the distinct
    * estimate, as CONSTANT k-long mergeable state per group per window
    * (the same state-size argument as [[windowedCmsFrequencies]]).
    * Closed-window sketch rows feed `kmvOverlapMatrixAdvance` directly
    * — continuous overlap monitoring without ever re-reading history.
    */
  def windowedKmvSketches(
      docs: DataFrame,
      groupCol: String = "source",
      textCol: String = "text",
      tsCol: String = "ts",
      window_ : String = "10 minutes",
      watermark: String = "1 hour",
      w: Int = 5,
      k: Int = 1024): DataFrame = {
    require(w >= 1 && k >= 2, "need shingle width >= 1 and sketch size >= 2")
    val toks = split(col(textCol), " ")
    val nSh = (size(toks) - (w - 1)).cast("int")
    val bottomK = org.apache.spark.sql.functions.udaf(
      new graft.functions.BottomKSketch(k, hashInput = false))
    val hashSpace = 1.152921504606846976e18 // 2^60
    docs
      .withWatermark(tsCol, watermark)
      .select(col(tsCol), col(groupCol).as("grp"), toks.as("__t"), nSh.as("__n"))
      .where(col("__n") >= 1 && col("grp").isNotNull)
      .select(col(tsCol), col("grp"), col("__t"),
        explode(sequence(lit(0), col("__n") - 1)).as("p"))
      .select(col(tsCol), col("grp"),
        conv(substring(
          md5(array_join(slice(col("__t"), col("p") + 1, lit(w)), " ")),
          1, 15), 16, 10).cast("long").as("h"))
      .groupBy(
        org.apache.spark.sql.functions.window(col(tsCol), window_),
        col("grp"))
      .agg(bottomK(col("h")).as("sk"))
      .select(
        col("window.start").as("w_start"), col("grp"), col("sk"),
        when(size(col("sk")) < k, size(col("sk")).cast("double"))
          .otherwise(round(
            lit((k - 1).toDouble) /
              (array_max(col("sk")).cast("double") / hashSpace), 4))
          .as("d_est"))
  }

  /** Custom keyed state via `mapGroupsWithState`: running per-user event
    * count and value sum, re-emitted on every update (update mode).
    * Demonstrates the arbitrary-state API for operators the built-in
    * windows can't express; state lives in the state store, partitioned
    * by user across executors.
    */
  def runningUserStats(events: Dataset[UserEvent]): Dataset[UserStats] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[UserEvent], state: GroupState[UserStats]) =>
          val prev = state.getOption.getOrElse(UserStats(uid, 0L, 0.0))
          var n = prev.n_events
          var tot = prev.total_value
          rows.foreach { e => n += 1; tot += e.value }
          val next = UserStats(uid, n, tot)
          state.update(next)
          next
      }
  }

  /** Streaming twin of `Temporal.scd2`: maintain each key's OPEN
    * dimension version in keyed state and emit a version the moment a
    * differing attribute value CLOSES it (`valid_to` = the successor's
    * ts, half-open, exactly the batch operator's interval semantics).
    * No-op observations (same attr) are compacted away, as in batch.
    *
    * Ordering contract: per-key event-time order within and across
    * batches (Kafka key-partitioned topics give this; otherwise sort
    * upstream). A row older than the open version's start is DROPPED —
    * a late out-of-order observation cannot retroactively rewrite
    * already-emitted history, which keeps the operator deterministic.
    * State is one small record per key — bounded by keyspace, not
    * stream length; the open version per key is queryable from the
    * state store, closed history accumulates in the sink.
    */
  def scdClosedIntervals(events: Dataset[AttrEvent]): Dataset[ClosedVersion] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        org.apache.spark.sql.streaming.OutputMode.Update(),
        GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[AttrEvent], state: GroupState[ScdOpen]) =>
          val out = Seq.newBuilder[ClosedVersion]
          var cur = state.getOption
          rows.toSeq.sortBy(e => (e.ts, e.attr)).foreach { e =>
            cur match {
              case None =>
                cur = Some(ScdOpen(e.attr, e.ts))
              // late arrival OR duplicate-second observation: drop —
              // first observation per (key, ts) wins (mirrors the batch
              // operator's one-row-per-(key, ts) precondition) and no
              // zero-length [t, t) version can be emitted
              case Some(s) if e.ts <= s.since => ()
              case Some(s) if s.attr != e.attr =>
                out += ClosedVersion(uid, s.attr, s.since, e.ts)
                cur = Some(ScdOpen(e.attr, e.ts))
              case _ => () // no-op change: compact
            }
          }
          cur.foreach(state.update)
          out.result().iterator
      }
  }
}
