package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.lake.VersionedTable
import graft.operators.Dedup

/** Streaming twin of the leakage-free split ADVANCE
  * (`Dedup.splitByClusterIncremental`, q223's operator) with
  * EXACTLY-ONCE semantics — the governance-critical member of the
  * daily-ingest family: a crash mid-advance must never strand an eval
  * document in train (or vice versa), because every benchmark number
  * after that moment would be contaminated.
  *
  * Each micro-batch advances two [[graft.lake.VersionedTable]]s:
  *
  *   - `store` — the assignment store `(idCol, cluster_rep, split)`,
  *     advanced by MERGE (`upsertIfNew`) with only the DELTA: new batch
  *     assignments plus store rows whose cluster_rep re-keyed to a
  *     merged canon. Splits of existing rows NEVER change (the
  *     stability contract); quarantined batch rows land with a NULL
  *     split and are served by [[quarantined]];
  *   - `conflicts` — the per-batch bridging-conflict ledger
  *     `(cluster_rep, n_splits, batch_id)`, APPENDED each batch so the
  *     quarantine decisions are surfaced and auditable forever.
  *
  * Exactly-once across foreachBatch replays is the StreamingEr
  * two-table protocol: conflicts commit FIRST, store LAST, and the
  * whole advance is derived ONLY from the pre-batch store and the
  * batch. Every interleaving is safe:
  *
  *   1. a crash after the conflicts append replays against the
  *      still-pre-batch store, recomputes bit-identically, skips the
  *      conflicts append on its txn marker, and applies the store
  *      merge once;
  *   2. the store's txn marker alone proves full application (it
  *      commits last), so a fully-applied replay returns without
  *      reading data;
  *   3. re-arriving already-assigned ids are dropped inside the
  *      advance (its anti-join replay guard), so at-least-once sources
  *      cannot flip a split either.
  *
  * `pairsOf(batch, storeRows)` supplies the batch-touching near-dup
  * pairs (batch-batch and batch-store — store-internal pairs never
  * re-materialize, the incremental-linkage contract); it must be a
  * deterministic function of its inputs for the replay argument to
  * hold (every pair source in this repo is).
  *
  * Scale shape per batch: the pair source's own cost, the ENTITY-level
  * closure (bounded by touched clusters, not rows — the
  * `entityPairGraph` contraction, plan-pinned), one delta self-join on
  * id, and a MERGE that rewrites only zone-overlapping files. History
  * text is never read; the store is governance metadata only.
  */
object StreamingSplit {

  /** Split parameters shared by every batch of a stream. */
  final case class SplitConfig(
      idCol: String,
      splits: Seq[(String, Double)] =
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))

  /** Apply ONE batch exactly once (the foreachBatch body, public so a
    * driver-orchestrated daily job can reuse the identical protocol).
    */
  def advanceBatch(
      store: VersionedTable,
      conflicts: VersionedTable,
      batch: DataFrame,
      pairsOf: (DataFrame, DataFrame) => DataFrame,
      cfg: SplitConfig,
      appId: String,
      batchId: Long): Unit = {
    val spark = batch.sparkSession
    // the store commits LAST, so its marker alone proves the batch is
    // fully applied (the conflicts append either committed before the
    // crash or was empty)
    if (store.lastTxn(appId).exists(_ >= batchId)) return
    if (batch.isEmpty) return // zero applications IS exactly once

    if (store.currentVersion() == 0) {
      // bootstrap: the first batch IS the corpus — the batch operator's
      // assignment verbatim, no conflicts possible
      val assigned = Dedup.splitByCluster(
          batch, cfg.idCol, pairsOf(batch, batch.limit(0)), cfg.splits)
        .select(col(cfg.idCol), col("cluster_rep"), col("split"))
      store.upsertIfNew(assigned, appId, batchId): Unit
      return
    }

    val rows = store.read(spark) // pre-batch by protocol (store commits last)
    val (advanced, confRows) = Dedup.splitByClusterIncremental(
      rows, batch, cfg.idCol, pairsOf(batch, rows), cfg.splits)
    // delta vs the pre-batch store: new ids + re-keyed cluster reps —
    // unchanged rows never rewrite (split values CANNOT change by the
    // stability contract, so rep equality is the only check needed)
    val delta = advanced
      .join(rows.select(col(cfg.idCol), col("cluster_rep").as("__old")),
        Seq(cfg.idCol), "left")
      .filter(col("__old").isNull || col("__old") =!= col("cluster_rep"))
      .drop("__old")
    conflicts.appendIfNew(
      confRows.withColumn("batch_id", lit(batchId)), appId, batchId)
    store.upsertIfNew(delta, appId, batchId): Unit
  }

  /** Start the exactly-once streaming split sink: unbounded document
    * arrivals → maintained (store, conflicts) tables.
    */
  def splitStream(
      updates: DataFrame,
      store: VersionedTable,
      conflicts: VersionedTable,
      pairsOf: (DataFrame, DataFrame) => DataFrame,
      cfg: SplitConfig,
      appId: String,
      checkpoint: String): StreamingQuery =
    updates.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        advanceBatch(store, conflicts, batch.toDF(), pairsOf, cfg, appId, batchId)
      }
      .start()

  /** Batch rows whose component bridged store clusters of different
    * splits — quarantined (NULL split); the caller must exclude them
    * from training until resolved.
    */
  def quarantined(spark: SparkSession, store: VersionedTable): DataFrame =
    store.read(spark).filter(col("split").isNull)
}
