package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CorpusPipelineSpec extends SparkSpec {

  lazy val docs = spark.read.parquet(s"$sf/documents.parquet")
  lazy val cleaned = CorpusPipeline.clean(docs)

  test("every survivor passes all gates") {
    val cfg = CorpusPipeline.Config()
    val bad = cleaned.filter(
      col("n_tokens") < cfg.minTokens ||
        col("quality") < cfg.minQuality ||
        !col("lang_pred").isin(cfg.langs: _*)).count()
    assert(bad == 0)
    assert(cleaned.count() > 0)
  }

  test("no two survivors share a fingerprint") {
    val dupFps = cleaned.groupBy("fingerprint").count().filter(col("count") > 1).count()
    assert(dupFps == 0)
  }

  test("cleaning is idempotent: a second pass removes nothing") {
    val again = CorpusPipeline.clean(cleaned.drop(
      "n_tokens", "n_subwords", "stopword_ratio", "quality", "lang_pred", "fingerprint"))
    assert(again.count() == cleaned.count())
  }

  test("clean() pins nothing in the CacheManager (leak-free composition)") {
    val cm = spark.sharedState.cacheManager
    cm.clearCache()
    val out = CorpusPipeline.clean(docs)
    out.count() // materialize fully
    assert(cm.isEmpty,
      "corpus pipeline must not leave CacheManager entries behind " +
        "(intermediates are shared via GC-tracked localCheckpoint blocks)")
  }
}
