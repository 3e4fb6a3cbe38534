package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end training-corpus cleaning pipeline — the composite operator a
  * 100 TB LLM-data run would execute (north-star EXTENSION; the
  * reference's own pipeline is the ETL chain in graft.Pipeline, cf.
  * `scripts/...pyspark.py:82-138`), built entirely from the engine's
  * distributed pieces:
  *
  *   annotate (token/quality/language, map-only)
  *     → filter (quality + language + length gates, map-only)
  *     → exact dedup on the order-sensitive fingerprint (one hash agg)
  *     → MinHash-LSH near-dup removal (signature → band join → verify)
  *
  * Scale shape (measured; see SCALE.md): annotation and gating are
  * map-only; the shuffles are the fingerprint window, the LSH band join
  * and candidate re-attach joins, and the final anti-join — each carries
  * ids/keys only, never document payloads. No driver-side data movement.
  */
object CorpusPipeline {

  final case class Config(
      minTokens: Int = 10,
      minQuality: Double = 0.3,
      langs: Seq[String] = Seq("en", "es", "fr", "de", "zh"),
      nearDupThreshold: Double = 0.8,
      // when set, shingles in >= this many docs are treated as corpus
      // boilerplate and excluded from near-dup similarity (one extra
      // aggregate; see Dedup.hotShingles)
      stopShingleMinDf: Option[Long] = None)

  /** Returns the cleaned corpus: survivors of all gates + both dedup
    * stages, with the annotation columns retained for downstream
    * sampling/mixing decisions.
    *
    * No result-stage job and no CacheManager pin at call time:
    * intermediate sharing uses lazy `localCheckpoint` blocks, which the
    * ContextCleaner frees once the result is unreferenced (a long-lived
    * session can call clean() in a loop without accumulating caches).
    * Under AQE (GraftSession's default) planning the checkpoint RDD may
    * materialize UPSTREAM shuffle stages — the annotate/gate/window
    * exchanges — as real jobs when clean() is called, and downstream
    * operators see a frozen LogicalRDD leaf at that boundary rather
    * than the full logical subtree. localCheckpoint blocks are not
    * recomputable after executor loss; on clusters with dynamic
    * allocation, set a checkpoint dir and swap in reliable
    * `Dataset.checkpoint` at this boundary.
    */
  def clean(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
      cfg: Config = Config()): DataFrame = {
    val annotated = TextAnalysis.annotate(docs, textCol)
    val gated = annotated.filter(
      col("n_tokens") >= cfg.minTokens &&
        col("quality") >= cfg.minQuality &&
        col("lang_pred").isin(cfg.langs: _*))
    // Lazily block-shared: the near-dup stage scans this frame twice
    // (signature branch + the keep side of the anti-join); without the
    // sharing the annotate+window chain runs twice per materialization.
    val exactDeduped = Dedup.exactKeepMin(gated, Seq("fingerprint"), idCol)
      .localCheckpoint(eager = false)
    val stopShingles = cfg.stopShingleMinDf
      .map(minDf => Dedup.hotShingles(exactDeduped, textCol, minDf = minDf))
      .getOrElse(Array.empty[Long])
    Dedup.minHashDedup(exactDeduped, idCol, textCol,
      threshold = cfg.nearDupThreshold, excludeShingles = stopShingles)
  }

  /** The FULL preparation pipeline — [[clean]] plus the remaining stages
    * a corpus passes on its way to a training run:
    *
    *   word-blocklist gate (when `blocklist` is supplied — the
    *       cheapest whole-document drop, before anything else spends
    *       work on a page that cannot ship)
    *     → PII scrub (map-only regexp chain — first TEXT REWRITE, so every downstream
    *       annotation, fingerprint, and dedup decision sees the text
    *       that will actually ship; two docs differing only in PII
    *       dedupe together)
    *     → repetition gate (map-only — BEFORE dedup, so gating a
    *       cluster's would-be representative cannot discard a cluster
    *       whose other members pass the gate)
    *     → clean (annotate → gates → exact + near-dup dedup)
    *     → benchmark decontamination (when an eval set is supplied)
    *     → token-window chunking (when chunk dims are supplied;
    *       quality/language gate columns ride onto every chunk)
    *
    * Everything added over clean() is map-only except decontamination's
    * id-and-hash joins — the composite keeps clean()'s scale shape.
    * Without `chunk`, returns gated whole documents with annotation
    * columns retained — consistent with the returned text, since
    * annotation happens post-scrub. With it, returns chunk rows ready
    * for tokenization.
    */
  def prepare(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      cfg: Config = Config(),
      maxRepetition: Double = 0.9,
      evalDocs: Option[DataFrame] = None,
      chunk: Option[(Int, Int)] = None,
      splitBy: Option[(String, Seq[(String, Double)])] = None,
      htmlInput: Boolean = false,
      blocklist: Seq[String] = Nil): DataFrame = {
    // stage 0 when the input is a crawl: markup → main text (map-only,
    // HtmlText's block-segmented link-density extraction); pages whose
    // every block was boilerplate vanish here, before any text gate
    val textual =
      if (!htmlInput) docs
      else docs.withColumn(textCol, HtmlText.extractText(col(textCol)))
        .filter(length(col(textCol)) > 0)
    // C4's doc-level bad-words gate, right after extraction: the
    // cheapest whole-document drop runs before any annotation or
    // fingerprinting spends work on a page that cannot ship (map-only;
    // the audit columns don't ride — prepare's contract is the corpus,
    // not the rejection report; run wordBlocklistGate standalone for
    // that)
    val admitted =
      if (blocklist.isEmpty) textual
      else TextAnalysis.wordBlocklistGate(textual, textCol, blocklist)
        .filter(!col("blocked"))
        .drop("bad_terms", "n_bad_tokens", "blocked")
    val scrubbed = admitted.withColumn(textCol, TextAnalysis.redactPii(col(textCol)))
      .filter(TextAnalysis.repetitionRatio(col(textCol)) <= maxRepetition)
    val cleaned = clean(scrubbed, idCol, textCol, cfg)
    val decontaminated = evalDocs
      .map(e => Dedup.decontaminate(cleaned, e, idCol, textCol))
      .getOrElse(cleaned)
    val chunked = chunk match {
      case Some((size, overlap)) =>
        // the split group column must ride through chunking, or the
        // final stage would have nothing to hash; chunk already emits
        // idCol, so splitting BY document must not carry it twice
        TextAnalysis.chunk(decontaminated, idCol, textCol, size, overlap,
          carry = (Seq("lang_pred", "quality") ++ splitBy.map(_._1))
            .distinct.filterNot(_ == idCol))
      case None => decontaminated
    }
    // final stage so CHUNKS of one group can't straddle the boundary
    // either: the leakage guard applies to everything derived from a
    // group, not just whole documents
    splitBy match {
      case Some((groupCol, splits)) => ScaleOps.splitByGroup(chunked, groupCol, splits)
      case None => chunked
    }
  }
}
