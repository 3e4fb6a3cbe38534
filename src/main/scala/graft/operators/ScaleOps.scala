package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale utilities for the shuffle-heavy shapes a 100 TB run hits:
  * key-skew joins and repeated co-located joins. North-star EXTENSION —
  * the reference's only scale knob is `spark.sql.shuffle.partitions=200`
  * (`scripts/...pyspark.py:37`); these are the techniques that knob
  * cannot express.
  *
  * AQE (on by default in GraftSession) already splits skewed SHUFFLE
  * partitions at runtime; explicit salting remains the tool when one
  * build-side key is so hot that even a split partition overwhelms a
  * task, or when AQE is unavailable (e.g. inside a cached subtree).
  */
object ScaleOps {

  /** Skew-resistant inner equi-join: salt the skewed (large, hot-keyed)
    * side with a random factor in [0, buckets), and explode the other
    * side once per bucket, so a hot key's rows spread over `buckets`
    * shuffle partitions instead of one.
    *
    * Cost model: the replicated side grows ×buckets — use when
    * |replicated| × buckets ≪ |skewed partition relief|. Salt is applied
    * to the SHUFFLE KEY only; output columns are untouched.
    */
  def saltedJoin(
      skewed: DataFrame,
      other: DataFrame,
      key: String,
      buckets: Int = 8): DataFrame = {
    require(buckets > 1, "buckets must be > 1")
    // rand() is per-row nondeterministic by design: distribution, not values,
    // matters for the salt. Seeded for reproducible tests.
    val salted = skewed.withColumn("__salt", (rand(42) * buckets).cast("int"))
    val replicated = other.withColumn(
      "__salt",
      explode(array((0 until buckets).map(lit).toIndexedSeq: _*)))
    salted
      .join(replicated, salted(key) === replicated(key) && salted("__salt") === replicated("__salt"))
      .drop(replicated(key))
      .drop("__salt")
  }

  /** Write both sides bucketed by the join key so subsequent joins are
    * exchange-free (bucketed scan → sort-merge join with no shuffle).
    * Spark's bucketing requires `saveAsTable` (bucket metadata lives in
    * the catalog); tables land in the session warehouse.
    *
    * At 100 TB this is the "pay the shuffle once" pattern: fact tables
    * bucketed on their most-joined key amortize every later join.
    */
  def writeBucketed(
      df: DataFrame,
      table: String,
      key: String,
      buckets: Int = 32,
      sortCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite").format("parquet").bucketBy(buckets, key)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }

  /** Join two pre-bucketed tables on their bucket key. With equal bucket
    * counts the planner elides both exchanges (asserted in the spec).
    */
  def bucketedJoin(spark: SparkSession, left: String, right: String, key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)

  /** Exact per-key distinct count as a two-level aggregate:
    * dedupe (key, value) pairs first, then count per key. Equivalent to
    * `countDistinct`, but the first level partially aggregates map-side
    * on (key, value) — so a hot key's duplicates collapse BEFORE the
    * shuffle, where the single-level expand-based plan ships every
    * occurrence of the hot key to one reducer. The standard rewrite for
    * skewed count(DISTINCT). Plain sums/counts don't need this: their
    * built-in partial aggregation already collapses map-side.
    */
  def distinctCountTwoPhase(df: DataFrame, key: String, valueCol: String): DataFrame =
    df.select(col(key), col(valueCol))
      .distinct()
      .groupBy(key)
      .agg(count(lit(1)).as(s"distinct_$valueCol"))

  /** Deterministic hash sample: keep rows whose key hashes into
    * [lo, hi) of den buckets. Unlike `sample()`, the selection is a
    * pure function of the key — stable across runs, engines, and
    * re-partitioning; disjoint ranges give disjoint splits (the
    * train/validation/test contract for corpus building); and the same
    * row set survives incremental reruns on a grown corpus.
    */
  def hashSample(df: DataFrame, keyCol: String, lo: Int, hi: Int, den: Int = 1000): DataFrame = {
    require(0 <= lo && lo < hi && hi <= den, s"need 0 <= lo < hi <= den, got [$lo,$hi)/$den")
    val bucket = pmod(xxhash64(col(keyCol)), lit(den))
    df.filter(bucket >= lo && bucket < hi)
  }

  /** Stratified deterministic sampling — the corpus-MIXING primitive:
    * each stratum (language, source, quality band…) keeps its own
    * fraction of rows, selected by the same keyed hash as
    * [[hashSample]]. Properties that matter for training-data work, all
    * spec-pinned:
    *  - pure function of (key, stratum rate): stable across runs,
    *    partitioning, and engines running the same hash;
    *  - NESTED: raising a stratum's rate only ADDS rows (bucket <
    *    r₁·den ⊆ bucket < r₂·den for r₁ ≤ r₂) — re-weighting a mix
    *    never churns the retained set, so ablations share data;
    *  - map-only: one filter, no shuffle.
    *
    * Strata absent from `rates` keep `defaultRate`.
    */
  def stratifiedHashSample(
      df: DataFrame,
      keyCol: String,
      strataCol: String,
      rates: Map[String, Double],
      defaultRate: Double = 0.0,
      den: Int = 1000000): DataFrame = {
    require((rates.values ++ Seq(defaultRate)).forall(r => r >= 0.0 && r <= 1.0),
      "rates must be in [0, 1]")
    // integer per-`den` thresholds, resolved on the DRIVER: comparing the
    // integer bucket against a floating product (rate * den) would make
    // boundary buckets depend on double rounding (0.1 * 1e6 =
    // 100000.00000000001) — exactly the cross-engine instability the
    // keyed hash exists to avoid
    val bucket = pmod(xxhash64(col(keyCol)), lit(den))
    def threshold(r: Double): Long = math.round(r * den)
    val cut = rates.toSeq.sortBy(_._1).foldLeft(lit(threshold(defaultRate))) {
      case (acc, (s, r)) => when(col(strataCol) === s, lit(threshold(r))).otherwise(acc)
    }
    df.filter(bucket < cut)
  }

  /** Per-stratum keep-rates that hit a TOKEN budget: the corpus-mixing
    * planner. One aggregate measures available tokens per stratum
    * (driver state = one row per stratum — bounded parameters, not
    * data); rate = min(1, target / available). Strata without a target
    * get rate 0 (excluded from the mix).
    */
  def tokenBudgetRates(
      df: DataFrame,
      strataCol: String,
      tokenCol: String,
      targets: Map[String, Long]): Map[String, Double] = {
    val avail = df
      .groupBy(strataCol)
      .agg(sum(col(tokenCol).cast("long")).as("__t"))
      .collect()
      .map(r => String.valueOf(r.get(0)) -> r.getLong(1))
      .toMap
    targets.map { case (s, tgt) =>
      require(tgt >= 0, s"negative token target for stratum '$s'")
      val a = avail.getOrElse(s, 0L)
      s -> (if (a <= 0L) 0.0 else math.min(1.0, tgt.toDouble / a))
    }
  }

  /** Deterministic corpus mixing to per-stratum token budgets:
    * [[tokenBudgetRates]] composed with [[stratifiedHashSample]].
    * Achieved tokens per stratum ≈ target (hash sampling selects a
    * rate-sized fraction of DOCUMENTS; per-document token variance makes
    * the hit stochastic around the budget — exact-budget packing is a
    * different operator, [[graft.operators.Packing.packConcat]] applied
    * after this gate). Selection inherits the sampler's properties:
    * pure function of (key, rates), nested under rate increases,
    * map-only after the one planning aggregate.
    */
  def mixToTokenBudget(
      df: DataFrame,
      keyCol: String,
      strataCol: String,
      tokenCol: String,
      targets: Map[String, Long],
      den: Int = 1000000): DataFrame =
    stratifiedHashSample(
      df, keyCol, strataCol,
      tokenBudgetRates(df, strataCol, tokenCol, targets),
      defaultRate = 0.0, den = den)

  /** Fail-fast guard for VERIFICATION-ONLY exhaustive operators.
    *
    * All-pairs self-joins (exact n-gram Jaccard q83, exact pairwise
    * cosine q84) are O(N²) in shuffle and compute — correct and
    * oracle-checkable at small N, a scale-killer on a real corpus. This
    * counts the input (one cheap job) and refuses to proceed past
    * `maxRows`, pointing the caller at the bucketed scale paths
    * (MinHash LSH / hyperplane LSH) whose outputs are oracle-equal.
    * To run an exhaustive pass on a slice of a big table anyway, cut it
    * first with [[hashSample]].
    */
  def boundedExhaustive(df: DataFrame, what: String, maxRows: Long = 100000L): DataFrame = {
    val n = df.count()
    require(n <= maxRows,
      s"$what is an exhaustive all-pairs (O(N²)) operator intended for " +
        s"verification at small N; got $n rows > $maxRows. Use the bucketed " +
        s"scale path instead (Dedup.minHashNearDups / Dedup.embeddingNearDups) " +
        s"or pre-cut with ScaleOps.hashSample.")
    df
  }
}
