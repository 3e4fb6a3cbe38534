package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{CorpusPipeline, TextAnalysis}

/** Streaming twin of graft.operators.CorpusPipeline: continuous
  * ingestion of documents with the same annotation, quality/language/
  * length gates, and EXACT dedup — expressed over an unbounded stream.
  *
  * Dedup semantics differ from batch by necessity and by design:
  *  - exact dedup keys on the content fingerprint via
  *    `dropDuplicatesWithinWatermark` — state is bounded by the
  *    watermark horizon, so a duplicate arriving a year later is NOT
  *    caught here (unbounded-state exact dedup cannot stream);
  *  - MinHash NEAR-dup removal stays a batch concern: it is a growing
  *    self-join, so production systems run it as periodic compaction
  *    over the accumulated output (CorpusPipeline.clean on the sink
  *    directory), not in the hot path.
  *
  * Everything before the dedup is map-only (TextProfileExpr), so the
  * stream scales exactly like the batch annotate stage.
  */
object StreamingCorpus {

  /** @param docs      unbounded frame with (idCol, textCol, tsCol)
    * @param tsCol     event-time column driving the watermark
    * @param watermark dedup horizon (state retention bound)
    */
  def clean(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      tsCol: String = "ts",
      watermark: String = "1 hour",
      cfg: CorpusPipeline.Config = CorpusPipeline.Config()): DataFrame =
    TextAnalysis.annotate(docs, textCol)
      .filter(
        col("n_tokens") >= cfg.minTokens &&
          col("quality") >= cfg.minQuality &&
          col("lang_pred").isin(cfg.langs: _*))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("fingerprint")

  /** Streaming scrub-and-chunk: PII redaction then token-window
    * chunking, continuously. Both stages are STATELESS (regexp chains
    * and a per-row explode — no watermark, no state store), so this
    * composes after [[clean]] or runs standalone at input rate; the
    * explode multiplies rows exactly like the batch operator, and
    * repetition/gate columns survive onto every chunk row for
    * downstream mixing decisions.
    */
  def scrubAndChunk(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      chunkSize: Int = 512,
      overlap: Int = 64): DataFrame = {
    val scrubbed = docs.withColumn(textCol, TextAnalysis.redactPii(col(textCol)))
      .withColumn("rep_ratio", TextAnalysis.repetitionRatio(col(textCol)))
    TextAnalysis.chunk(scrubbed, idCol, textCol, chunkSize, overlap,
      carry = Seq("rep_ratio"))
  }

  /** Streaming twin of [[graft.operators.TextAnalysis.dedupLines]]:
    * corpus-wide keep-first LINE dedup over an unbounded stream. Emits
    * the surviving lines as (idCol, pos, line, tsCol) rows.
    *
    * Necessary semantic shifts vs batch (same reasoning as [[clean]]):
    * "first" means first ARRIVAL inside the watermark horizon, not
    * globally smallest (id, pos) — a duplicate arriving after state
    * expiry is re-emitted; and documents are NOT reassembled here (a
    * per-doc gather would pin every open document in the state store) —
    * reassembly is the sink-side compaction `dedupLines` already
    * handles. State is one entry per distinct line inside the horizon,
    * the same bound `dropDuplicatesWithinWatermark` gives exact dedup.
    */
  def dedupLinesStream(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      tsCol: String = "ts",
      sep: String = "\n",
      watermark: String = "1 hour"): DataFrame =
    docs
      .select(col(idCol), col(tsCol),
        posexplode(split(col(textCol), java.util.regex.Pattern.quote(sep)))
          .as(Seq("pos", "line")))
      .filter(length(trim(col("line"))) > 0)
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("line")

  /** Streaming twin of [[graft.operators.Dedup.substringDedup]] at the
    * tile stage: corpus-wide keep-first dedup of w-token tiles over an
    * unbounded stream. Emits surviving tiles as (idCol, tile_no, h,
    * tsCol) rows — the stream-side feed for a persisted
    * [[graft.operators.Dedup.tileHashStore]].
    *
    * Same semantic shifts as [[dedupLinesStream]], for the same
    * reasons: "first" is first ARRIVAL within the watermark horizon
    * (state = one entry per distinct tile hash in the horizon), and
    * documents are not rebuilt in the hot path — text reconstruction
    * stays the batch-side `substringDedupIncremental` compaction over
    * the accumulated store. Tiling itself is map-only, identical
    * arithmetic to the batch operator (md5 over the same slice/join).
    */
  def dedupTilesStream(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      tsCol: String = "ts",
      w: Int = 20,
      watermark: String = "1 hour"): DataFrame = {
    val toks = split(col(textCol), " ")
    val nTiles = floor(size(toks) / w).cast("int")
    docs
      .select(col(idCol), col(tsCol), toks.as("__t"), nTiles.as("__n"))
      .where(col("__n") >= 1)
      .select(col(idCol), col(tsCol), col("__t"),
        explode(sequence(lit(0), col("__n") - 1)).as("tile_no"))
      .select(col(idCol), col(tsCol), col("tile_no"),
        md5(array_join(slice(col("__t"), col("tile_no") * w + 1, lit(w)), " ")).as("h"))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("h")
  }

  /** Streaming twin of the CCNet perplexity filter: score each arriving
    * document's char n-grams against a broadcast REFERENCE model (built
    * batch-side by TextAnalysis.charNgramModel over a trusted corpus)
    * and keep documents at or above `minAvgLogp`. The scorer is a
    * map-only native expression — no explode, no join, no aggregation
    * state, no watermark — so the gate adds zero streaming state and
    * composes with [[clean]] before the dedup. Unseen grams take the
    * model's add-half smoothing, so scoring is total on novel text.
    */
  def lmGate(
      docs: DataFrame,
      model: DataFrame,
      minAvgLogp: Double,
      textCol: String = "text",
      n: Int = 3): DataFrame = {
    val scorer = graft.operators.TextAnalysis.lmScorer(model, n)
    docs
      .withColumn("avg_logp", scorer(col(textCol)))
      .filter(col("avg_logp").isNotNull && col("avg_logp") >= minAvgLogp)
  }
}
