package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Model-based text classification: a multinomial Naive Bayes classifier
  * over hashed bag-of-words features — the fastText-shaped "train a
  * cheap model on labeled docs, score the corpus" stage of an LLM data
  * pipeline (model-based language ID / quality filtering), kept fully
  * engine-auditable.
  *
  * Reference anchor: the reference's query surface stops at SQL
  * analytics (`scripts/data_lake_query_execution_with_pyspark.py`);
  * this module is north-star scope (SURVEY.md §2.C — model-based
  * quality scoring for training-data curation).
  *
  * Design for scale:
  *  - TRAIN is one shuffle: explode tokens → groupBy(label, bucket)
  *    count with map-side partial aggregation. The model is bounded by
  *    `vocab × |labels|` rows regardless of corpus size — feature
  *    HASHING (md5 → bucket) is what caps it, the standard trick for
  *    corpus-scale vocabularies. Everything derived from the counts
  *    frame (totals, log-probs, defaults) is model-sized work.
  *  - SCORE is map-only fan-out (tokens × |labels| via a broadcast
  *    nested-loop over the tiny label list, then broadcast hash joins
  *    against the model) followed by ONE id-width shuffle
  *    (groupBy(id, label) over decimal contributions) and a
  *    doc-partitioned window for the argmax. Document text never
  *    shuffles. The model broadcasts (≤ vocab·L rows).
  *  - Driver state: one row per label (the prior counts) — bounded by
  *    label cardinality, same contract as ScaleOps.tokenBudgetRates.
  *
  * Determinism / auditability (the q115/q145/q153 discipline):
  * features hash via the first 8 hex chars of md5 (any engine replays
  * the bucket assignment); every log term — smoothed likelihood
  * ln((cnt+1)/(tot+V)), the unseen-bucket default ln(1/(tot+V)), and
  * the prior ln(nd/n) — is rounded to 6dp and summed as exact
  * DECIMAL(18,6), so per-doc scores and the argmax replay
  * bit-identically in DuckDB. q175 carries the full train+score oracle.
  */
object Classify {

  private val Dec = DecimalType(18, 6)

  /** md5-hashed feature bucket of a term — engine-auditable: DuckDB
    * replays it as `CAST(('0x' || substr(md5(term),1,8)) AS BIGINT) % v`
    * (the q148 SimHash idiom; 32 bits is collision-ample for bucketing).
    */
  def bucketOf(term: Column, vocab: Int): Column =
    conv(substring(md5(term), 1, 8), 16, 10).cast("long") % vocab

  /** Whitespace tokens of lowercased text (the corpus-wide convention —
    * bm25/tfidf/token counting all segment identically).
    */
  private def toks(text: Column): Column =
    filter(split(lower(text), " "), t => t =!= "")

  /** A trained model: `logp` (label, bucket, lp) over every bucket seen
    * in training × every label; `defaults` (label, lp) for buckets never
    * seen; `priors` (label, lp). All decimal 6dp, all broadcast-sized.
    */
  final case class NbModel(
      logp: DataFrame,
      defaults: DataFrame,
      priors: DataFrame,
      vocab: Int)

  /** Train multinomial NB with add-one smoothing on hashed token
    * counts. Labels are the distinct non-null values of `labelCol`; a
    * label whose documents are all empty still gets a prior and the
    * all-default likelihood row set (tot = 0).
    */
  def nbTrain(
      df: DataFrame,
      labelCol: String,
      textCol: String,
      vocab: Int = 4096): NbModel = {
    require(vocab > 0, "vocab must be positive")
    val labeled = df.filter(col(labelCol).isNotNull)

    val counts = labeled
      .select(col(labelCol).as("label"), explode(toks(col(textCol))).as("__t"))
      .select(col("label"), bucketOf(col("__t"), vocab).as("bucket"))
      .groupBy("label", "bucket")
      .agg(count(lit(1)).as("cnt"))

    // one tiny collect: (label, n_docs) — bounded by label cardinality
    val ndRows = labeled.groupBy(col(labelCol).as("label"))
      .agg(count(lit(1)).as("nd")).collect()
    val n = ndRows.map(_.getLong(1)).sum
    val spark = df.sparkSession
    import spark.implicits._
    val nd = ndRows.map(r => (r.getString(0), r.getLong(1))).toSeq
      .toDF("label", "nd")
    val labels = nd.select("label")

    val stats = labels
      .join(counts.groupBy("label").agg(sum("cnt").as("__tot")), Seq("label"), "left")
      .select(col("label"), coalesce(col("__tot"), lit(0L)).as("tot"))

    val logp = labels
      .crossJoin(counts.select("bucket").distinct())
      .join(counts, Seq("label", "bucket"), "left")
      .join(stats, "label")
      .select(col("label"), col("bucket"),
        round(log((coalesce(col("cnt"), lit(0L)) + lit(1.0)) /
          (col("tot") + lit(vocab.toDouble))), 6).cast(Dec).as("lp"))

    val defaults = stats.select(col("label"),
      round(log(lit(1.0) / (col("tot") + lit(vocab.toDouble))), 6)
        .cast(Dec).as("lp"))

    val priors = nd.select(col("label"),
      round(log(col("nd") / lit(n.toDouble)), 6).cast(Dec).as("lp"))

    NbModel(logp, defaults, priors, vocab)
  }

  /** Score every document against every label and keep the argmax
    * (ties break to the lexicographically smallest label — pinned by
    * the decimal-exact scores, so the tie-break replays cross-engine).
    * Documents with no tokens score on priors alone. Output:
    * (idCol, pred, score DOUBLE).
    */
  def nbScore(
      df: DataFrame,
      model: NbModel,
      idCol: String,
      textCol: String): DataFrame = {
    val labels = broadcast(model.priors.select("label"))

    // every (doc, label) exists even for token-less docs
    val base = df.select(col(idCol)).crossJoin(labels)
      .select(col(idCol), col("label"), lit(0).cast(Dec).as("lp"))

    val contrib = df
      .select(col(idCol), explode(toks(col(textCol))).as("__t"))
      .select(col(idCol), bucketOf(col("__t"), model.vocab).as("bucket"))
      .crossJoin(labels)
      .join(broadcast(model.logp), Seq("label", "bucket"), "left")
      .join(broadcast(model.defaults.withColumnRenamed("lp", "__lpd")), "label")
      .select(col(idCol), col("label"), coalesce(col("lp"), col("__lpd")).as("lp"))

    val scores = base.union(contrib)
      .groupBy(col(idCol), col("label"))
      .agg(sum("lp").as("__s"))
      .join(broadcast(model.priors.withColumnRenamed("lp", "__prior")), "label")
      .select(col(idCol), col("label"),
        (col("__s") + col("__prior")).as("__sd"))

    val w = Window.partitionBy(col(idCol))
      .orderBy(col("__sd").desc, col("label").asc)
    scores
      .withColumn("__r", row_number().over(w))
      .filter(col("__r") === 1)
      .select(col(idCol), col("label").as("pred"),
        col("__sd").cast("double").as("score"))
  }

  /** Per-row NB scorer with the model BROADCAST into a native
    * expression — value-identical to [[nbScore]] (parity spec-pinned:
    * the micro-unit log-probs are lifted from the model's DECIMAL(18,6)
    * columns unscaled, so the kernel sums exactly what the batch side
    * sums) but map-only and shuffle-free, so it gates unbounded streams
    * with no watermark or state (StreamingCorpus.nbGate) and scores
    * batch frames without the fan-out. Collects the model to the driver
    * once: it is vocab × |labels| rows — broadcast state by
    * construction, not data. Returns a (pred, score) struct column.
    */
  def nbScorer(model: NbModel): Column => Column = {
    val spark = model.logp.sparkSession
    val labels = model.priors.select("label").collect()
      .map(_.getString(0)).sorted
    val idx = labels.zipWithIndex.toMap
    def microsOf(df: DataFrame): Map[String, Long] =
      df.collect().map(r =>
        r.getString(0) -> r.getDecimal(1).unscaledValue().longValueExact()).toMap
    val defaults = {
      val m = microsOf(model.defaults.select("label", "lp"))
      labels.map(m)
    }
    val priors = {
      val m = microsOf(model.priors.select("label", "lp"))
      labels.map(m)
    }
    val bucketLp = new java.util.HashMap[java.lang.Long, Array[Long]]()
    model.logp.select("label", "bucket", "lp").collect().foreach { r =>
      val b = java.lang.Long.valueOf(r.getLong(1))
      var arr = bucketLp.get(b)
      if (arr == null) { arr = defaults.clone(); bucketLp.put(b, arr) }
      arr(idx(r.getString(0))) = r.getDecimal(2).unscaledValue().longValueExact()
    }
    val bc = spark.sparkContext.broadcast(
      graft.functions.NbScore.MicroModel(labels, bucketLp, defaults, priors, model.vocab))
    text => org.apache.spark.sql.graft.NativeExprs.nbScore(text, bc)
  }

  /** Name [[nbScorer]]'s trained closure on the SQL surface:
    * `nb_score(text, 'name')` (GraftExtensions) resolves to exactly
    * this expression tree — one semantics, reachable from a config SQL.
    */
  def registerSql(name: String, model: NbModel): Unit =
    graft.functions.GraftModels.register(name, "nb", nbScorer(model))

  /** Precision/recall sweep of a scored binary gate — the calibration
    * step between training a quality/language classifier (q175) and
    * deploying it as a corpus filter: pick the threshold whose
    * precision/recall trade matches the pipeline's loss budget.
    *
    * Scale shape: ONE aggregation collapses the corpus to a (score,
    * label) histogram — bounded by the score's distinct values (scores
    * arrive pre-rounded by convention) — and the threshold sweep runs
    * over thresholds × histogram, both tiny. Never a per-threshold
    * corpus pass. Metrics are 4dp-rounded ratios of exact counts, so
    * the whole curve replays cross-engine; empty denominators yield
    * NULL (no prediction made / no positives) rather than a fake 0.
    *
    * Output: (threshold, tp, fp, fn, precision, recall, f1) ordered by
    * threshold.
    */
  def prCurve(
      scored: DataFrame,
      labelCol: String,
      scoreCol: String,
      thresholds: Seq[Double]): DataFrame = {
    require(thresholds.nonEmpty, "need at least one threshold")
    val hist = scored
      .groupBy(col(scoreCol).cast("double").as("__s"),
        col(labelCol).cast("boolean").as("__y"))
      .agg(count(lit(1)).as("__n"))
    val th = scored.sparkSession.range(1)
      .select(explode(array(thresholds.map(lit).toIndexedSeq: _*)).as("threshold"))
    val swept = th.crossJoin(hist)
      .groupBy("threshold")
      .agg(
        sum(when(col("__y") && col("__s") >= col("threshold"), col("__n"))
          .otherwise(0L)).as("tp"),
        sum(when(!col("__y") && col("__s") >= col("threshold"), col("__n"))
          .otherwise(0L)).as("fp"),
        sum(when(col("__y") && col("__s") < col("threshold"), col("__n"))
          .otherwise(0L)).as("fn"))
    swept
      .withColumn("precision",
        when(col("tp") + col("fp") === 0, lit(null))
          .otherwise(round(col("tp").cast("double") / (col("tp") + col("fp")), 4)))
      .withColumn("recall",
        when(col("tp") + col("fn") === 0, lit(null))
          .otherwise(round(col("tp").cast("double") / (col("tp") + col("fn")), 4)))
      .withColumn("f1",
        when(lit(2) * col("tp") + col("fp") + col("fn") === 0, lit(null))
          .otherwise(round(lit(2.0) * col("tp") /
            (lit(2) * col("tp") + col("fp") + col("fn")), 4)))
      .orderBy("threshold")
  }

  /** Semi-supervised k-NN label propagation: each unlabeled vector takes
    * the cosine-weighted majority label of its k nearest labeled seeds —
    * the "label a small seed set by hand, spread it over the corpus by
    * embedding neighborhood" curation step.
    *
    * Built on [[Similarity.knnJoin]]'s cell equi-join (IVF-blocked, a
    * bounded TopKByScore partial aggregate — never a corpus×corpus
    * nested loop); at `nprobe = cents.length` the neighbor set is exact
    * by construction, which is how q176 attaches an exhaustive DuckDB
    * oracle. The labeled seed is assumed broadcast-small (it is the
    * hand-labeled set); its label column attaches via a broadcast join
    * and the vote is one id-width shuffle. Vote weights are the already
    * `scale`-rounded cosines summed as exact DECIMAL(18,6) — ties break
    * (weight desc, label asc), all cross-engine replayable.
    *
    * Output: (queryId, pred, weight DOUBLE, n_votes).
    */
  def knnPropagate(
      unlabeled: DataFrame,
      labeled: DataFrame,
      corpusId: String,
      queryId: String,
      vecCol: String,
      labelCol: String,
      k: Int,
      cents: Array[(Int, Array[Double])],
      nprobe: Int = 4,
      scale: Int = 6): DataFrame = {
    val nn = Similarity.knnJoin(
      labeled.select(col(corpusId), col(vecCol)),
      unlabeled, corpusId, queryId, vecCol, k, cents, nprobe, scale)
    val votes = nn
      .join(broadcast(labeled.select(col(corpusId), col(labelCol).as("label"))),
        corpusId)
      .groupBy(col(queryId), col("label"))
      .agg(
        sum(col("cos").cast(Dec)).as("__w"),
        count(lit(1)).as("n_votes"))
    val w = Window.partitionBy(col(queryId))
      .orderBy(col("__w").desc, col("label").asc)
    votes
      .withColumn("__r", row_number().over(w))
      .filter(col("__r") === 1)
      .select(col(queryId), col("label").as("pred"),
        col("__w").cast("double").as("weight"), col("n_votes"))
  }
}
