package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Empty-input hardening: at cluster scale, empty partitions and
  * empty filtered subsets are routine — every operator must degrade to
  * an empty (correctly-schemed) result, never throw. Runs each operator
  * family on zero-row frames with production schemas.
  */
class EmptyInputSpec extends SparkSpec {

  import spark.implicits._

  private def emptyDocs: DataFrame =
    Seq.empty[(Long, String, String)].toDF("doc_id", "text", "source")

  private def emptyEvents: DataFrame =
    Seq.empty[(Long, Long, Long, String, Double)]
      .toDF("event_id", "user_id", "ts_sec", "event_type", "value")

  test("round-11 second-wave operators: quantiles, skew, drift, diff, cardinality, embeddings") {
    import spark.implicits._
    val emptyIdVal = Seq.empty[(Long, Double)].toDF("id", "v")
    assert(ScaleOps.sampleQuantiles(emptyIdVal, "id", "v", 10, Seq(0.5)).count() == 0)
    assert(ScaleOps.sampleQuantilesByGroup(
      emptyDocs, "source", "doc_id", "doc_id", 10, Seq(0.5)).count() == 0)
    assert(ScaleOps.skewAdvisor(emptyDocs, "source", 10).count() == 0)
    val card = ScaleOps.joinCardinalityEstimate(
      emptyIdVal, "id", emptyIdVal, "id", 16).head()
    assert(card.getLong(1) == 0L && card.getDouble(8) == 0.0,
      "empty join estimate must be 0.0, not NULL")
    assert(graft.quality.Drift.ksDrift(emptyIdVal, emptyIdVal, "v").count() == 0)
    assert(graft.quality.Drift.psiDrift(emptyDocs, emptyDocs, "source").count() == 0)
    assert(graft.quality.Validator.snapshotDiff(
      emptyDocs, emptyDocs, "doc_id", Seq("text")).count() == 0)
    val emptyVecs = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    assert(Embeddings.covarianceDf(emptyVecs, "embedding", 4).count() == 0,
      "empty corpus: no covariance rows, not NaNs")
    assert(Embeddings.groupMeans(emptyVecs, "vec_id", "embedding", 4).count() == 0)
    val mz = Embeddings.moments(emptyVecs, "embedding", 4)
    assert(mz.n == 0L)
    val ex = intercept[IllegalArgumentException] {
      Embeddings.covariance(mz, 4)
    }
    assert(ex.getMessage.contains("empty"), "covariance must refuse n = 0 loudly")
  }

  test("round-12 operators: fertility, coverage, per-group KS/PSI/corr, confusion, threshold sweep") {
    import spark.implicits._
    val enc = Bpe.encodeNative(spark, Seq("a" -> "b"))
    val encIds = Bpe.encodeToIds(spark, Seq("a" -> "b"), Seq("ab" -> 0))
    assert(TextAnalysis.tokenizerFertility(emptyDocs, "source", "text", enc).count() == 0)
    assert(TextAnalysis.vocabCoverage(emptyDocs, "source", "text", encIds).count() == 0)
    assert(TextAnalysis.langIdConfusion(emptyDocs, "source", "text").count() == 0)
    val emptyGkv = Seq.empty[(String, Long, Double)].toDF("g", "k", "v")
    assert(graft.quality.Drift.ksDriftByGroup(
      emptyGkv, emptyGkv, "g", "k", "v", k = 10).count() == 0)
    assert(graft.quality.Drift.psiDriftByGroup(
      emptyDocs, emptyDocs, "source", "text").count() == 0)
    // empty BASELINE: boundaries are NULL → everything lands in bin 1
    // and A's emptiness surfaces through one_sided, never a crash
    val oneRow = Seq(("x", 1L, 2.0)).toDF("g", "k", "v")
    val pb = graft.quality.Drift.psiDriftBinned(emptyGkv, oneRow, "v", nBins = 4)
      .collect()
    assert(pb.length == 1 && pb(0).getBoolean(5), s"got ${pb.toSeq}")
    assert(graft.quality.Drift.psiDriftBinned(emptyGkv, emptyGkv, "v").count() == 0)
    val emptyXy = Seq.empty[(String, Double, Double)].toDF("g", "x", "y")
    assert(graft.quality.Validator.correlationMatrixByGroup(
      emptyXy, "g", Seq("x", "y")).count() == 0)
    // the grid survives an empty corpus: every threshold row present, 0s
    val sweep = Dedup.thresholdSensitivity(
      emptyDocs, "doc_id", "text", thresholds = Seq(0.5, 0.8)).orderBy("threshold").collect()
    assert(sweep.length == 2 && sweep.forall(r => r.getLong(1) == 0L && r.isNullAt(3)))
  }

  test("text operators: tfidf, invertedIndex, ngramCounts, dedupLines, removeBoilerplate") {
    assert(TextAnalysis.tfidf(emptyDocs, "doc_id", "text").count() == 0)
    assert(TextAnalysis.invertedIndex(emptyDocs, "doc_id", "text").count() == 0)
    assert(TextAnalysis.ngramCounts(emptyDocs, "text").count() == 0)
    assert(TextAnalysis.dedupLines(emptyDocs, "doc_id", "text").count() == 0)
    assert(TextAnalysis.removeBoilerplate(emptyDocs, "doc_id", "text", minDocs = 2).count() == 0)
  }

  test("round-9 operators: blocklist, paragraph dedup, temperature mix, DP counts, splits, b-bit/oneperm") {
    assert(TextAnalysis.wordBlocklistGate(emptyDocs, "text", Seq("x")).count() == 0)
    assert(TextAnalysis.dropRepeatedParagraphs(emptyDocs, "text").count() == 0)
    // empty corpus ⇒ no strata ⇒ empty targets and an empty mix
    assert(ScaleOps.temperatureTargets(
      emptyDocs.withColumn("n", lit(1L)), "source", "n", 0.3, 1000L).isEmpty)
    assert(ScaleOps.temperatureSample(
      emptyDocs.withColumn("n", lit(1L)), "doc_id", "source", "n", 0.3, 1000L)
      .count() == 0)
    assert(graft.quality.Privacy.dpNoisedCounts(
      emptyDocs, Seq("source"), epsilon = 1.0, seed = 7L).count() == 0)
    val emptyPairs = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    // empty pair graph ⇒ every doc is a singleton, still fully assigned
    val docs2 = Seq((1L, "a", "s"), (2L, "b", "s")).toDF("doc_id", "text", "source")
    val assigned = Dedup.splitByCluster(docs2, "doc_id", emptyPairs)
    assert(assigned.count() == 2 &&
      assigned.filter(col("split").isNull).count() == 0)
    assert(Dedup.splitByCluster(emptyDocs, "doc_id", emptyPairs).count() == 0)
    // incremental advance: empty batch and empty pairs are both no-ops
    val store = assigned.select(col("doc_id"), col("cluster_rep"), col("split"))
    val (advEmpty, confEmpty) = Dedup.splitByClusterIncremental(
      store, emptyDocs, "doc_id", emptyPairs)
    assert(advEmpty.count() == 2 && confEmpty.isEmpty)
    // empty corpus through the sketch/oneperm near-dup paths
    assert(Dedup.minHashNearDupsBBit(emptyDocs, "doc_id", "text").count() == 0)
    assert(Dedup.minHashNearDups(emptyDocs, "doc_id", "text", oneperm = true).count() == 0)
  }

  test("semantic dedup: empty corpus, empty batch against a store") {
    val emptyVecs = Seq.empty[(Long, Array[Float])].toDF("id", "v")
    val cents = Similarity.centroids(emptyVecs, "id", "v", c = 8)
    assert(cents.isEmpty)
    // an empty quantizer cannot block anything — the operator must
    // yield an empty pair list, not throw
    assert(Dedup.semanticNearDupPairs(emptyVecs, "id", "v", cents, 0.9).count() == 0)
    assert(Dedup.semanticDedup(emptyVecs, "id", "v", cents, 0.9).count() == 0)
    // empty BATCH against a real store: no new ids ⇒ no pairs
    val vecs = Seq((1L, Array(1f, 0f)), (2L, Array(0f, 1f))).toDF("id", "v")
    val realCents = Similarity.centroids(vecs, "id", "v", c = 2)
    val store = Similarity.ivfIndex(vecs, "id", "v", realCents)
    assert(Dedup.semanticNearDupsIncremental(
      emptyVecs, store, "id", "v", realCents, 0.9).count() == 0)
  }

  test("temporal: scd2, snapshot, merge") {
    val dim = Temporal.scd2(
      Seq.empty[(Long, Long, String)].toDF("k", "ts", "attr"),
      Seq("k"), "ts", Seq("attr"))
    assert(dim.count() == 0)
    assert(Temporal.asOfSnapshot(dim, lit(5L)).count() == 0)
    val merged = Temporal.scd2Merge(dim,
      Seq.empty[(Long, Long, String)].toDF("k", "ts", "attr"),
      Seq("k"), "ts", Seq("attr"))
    assert(merged.count() == 0)
  }

  test("sessionize and binned interval join") {
    assert(Sessionize.sessions(emptyEvents, "ts_sec", "event_id").count() == 0)
    val sessions = Sessionize.sessions(emptyEvents, "ts_sec", "event_id")
    assert(ScaleOps.binnedIntervalJoin(
      emptyEvents, sessions, Seq("user_id"), "ts_sec", "start_sec", "end_sec", 600L)
      .count() == 0)
  }

  test("scale ops: split, sample, bloom, salted, zorder, hll") {
    assert(ScaleOps.splitByGroup(emptyDocs, "source").count() == 0)
    assert(ScaleOps.sampleKPerGroup(emptyDocs, "source", "doc_id", 3).count() == 0)
    val dim = Seq.empty[Long].toDF("dk")
    assert(ScaleOps.bloomSemiJoin(emptyDocs, dim, "doc_id", "dk", 10L).count() == 0)
    assert(ScaleOps.saltedJoin(emptyDocs,
      Seq.empty[(Long, String)].toDF("doc_id", "x"), "doc_id").count() == 0)
    assert(ScaleOps.zOrderBy(
      Seq.empty[(Long, Double)].toDF("a", "b"), Seq("a", "b")).count() == 0)
    val parts = ScaleOps.hllRollup(emptyEvents, Seq("event_type"), "user_id")
    assert(ScaleOps.hllMergeEstimate(parts, Seq("event_type")).count() == 0)
  }

  test("quality: winsorize and robustScale") {
    val e = Seq.empty[(String, Double)].toDF("g", "v")
    assert(graft.quality.Outliers.winsorize(e, "v", Seq("g")).count() == 0)
    assert(graft.quality.Outliers.robustScale(e, "v", Seq("g")).count() == 0)
  }

  test("dedup: exact, minhash near-dups") {
    assert(Dedup.exact(emptyDocs, Seq("text")).count() == 0)
    assert(Dedup.minHashNearDups(emptyDocs, "doc_id", "text").count() == 0)
  }

  test("round-5 additions: simhash-md5 pairs, cohort retention, perplexity") {
    assert(Dedup.simHashMd5NearDups(emptyDocs, "doc_id", "text").count() == 0)
    assert(Sessionize.cohortRetention(emptyEvents).count() == 0)
    assert(TextAnalysis.selfPerplexity(emptyDocs).count() == 0)
    assert(TextAnalysis.charNgramModel(emptyDocs).count() == 0)
  }

  test("round-10 additions: shard manifest, novelty, dup attribution, cluster histogram") {
    val withTok = emptyDocs.withColumn("n", lit(1L))
    assert(graft.operators.ScaleOps.shardManifest(withTok, "doc_id", "n", 100L).count() == 0)
    assert(Dedup.ngramNovelty(emptyDocs, "doc_id", "text").count() == 0)
    assert(Dedup.crossSourceDupMatrix(
      emptyDocs, "doc_id", "text", "source").count() == 0)
    // empty pairs + empty corpus: no singleton row either
    val emptyPairs = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(Dedup.dupClusterHistogram(emptyPairs, totalDocs = 0L).count() == 0)
  }
}
