package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.lake.VersionedTable
import graft.operators.EntityResolution

/** Streaming entity resolution with EXACTLY-ONCE golden-record
  * maintenance: each micro-batch runs the composed incremental ER
  * advance (`EntityResolution.goldenRecordAdvance` — incremental
  * linkage, entity-level transitive closure incl. cluster-bridging
  * merges, mergeable survivorship state) against two
  * [[graft.lake.VersionedTable]]s:
  *
  *   - `rows`  — the resolved row store `(idCol cols…, entity_id)`,
  *     advanced by MERGE (`upsertIfNew`): batch rows insert, store rows
  *     whose entity was bridged away re-key;
  *   - `state` — the survivorship state `(__ent, __kind, __field,
  *     __value, __cnt, __ord)`, recomputed-normalized whole per batch
  *     and replaced atomically (`overwriteIfNew`).
  *
  * Exactly-once across restarts is the StreamingLake txn-marker
  * pattern, with one subtlety the two-table shape adds: foreachBatch
  * replays a batch after checkpoint recovery, and the two commits are
  * not joint-atomic. The protocol makes every interleaving safe:
  *
  *   1. state commits FIRST, rows second — so a crash can leave
  *      (state applied, rows not), never the reverse;
  *   2. the rows update (entity remap + batch assignments) is derived
  *      ONLY from the pre-batch `rows` store and the batch — never
  *      from `state` — so on a (state-done, rows-pending) replay the
  *      remap recomputes bit-identically from the still-pre-batch
  *      store, the state overwrite skips on its marker, and the rows
  *      merge applies once;
  *   3. a fully-applied replay skips on both markers without reading
  *      data.
  *
  * Scale: per batch the cost is the incremental advance —
  * batch↔store candidate pairs under the pair budget (id/feature-width
  * shuffles only), entity-level closure (orders smaller than the row
  * graph), and a state re-aggregation whose input is O(state + batch),
  * never a history re-read; the rows MERGE rewrites only
  * zone-overlapping files. Golden records are served on demand from
  * the state table ([[goldenRecords]]) — reading them costs one
  * window/pivot over broadcast-sized state, not a linkage pass.
  */
object StreamingEr {

  /** ER parameters shared by every batch of a stream. */
  final case class ErConfig(
      idCol: String,
      blockCols: Seq[String],
      fields: Seq[(String, Double)],
      threshold: Double,
      modeFields: Seq[String] = Nil,
      longestFields: Seq[String] = Nil,
      newestFields: Seq[(String, String)] = Nil,
      roundScale: Int = 6,
      pairBudget: Long = 5000L)

  /** Apply ONE batch exactly once (the foreachBatch body, public so a
    * driver-orchestrated daily job can reuse the identical protocol).
    */
  def advanceBatch(
      rows: VersionedTable,
      state: VersionedTable,
      batch: DataFrame,
      cfg: ErConfig,
      appId: String,
      batchId: Long): Unit = {
    val spark = batch.sparkSession
    val rowsDone = rows.lastTxn(appId).exists(_ >= batchId)
    val stateDone = state.lastTxn(appId).exists(_ >= batchId)
    if (rowsDone && stateDone) return // full replay
    if (batch.isEmpty) return        // zero applications IS exactly once

    if (rows.currentVersion() == 0) {
      // bootstrap: the first batch is its own corpus — full linkage
      // within the batch, then state from the resolved assignment
      val resolved = EntityResolution.resolve(
        batch, cfg.idCol, cfg.blockCols, cfg.fields, cfg.threshold,
        cfg.roundScale, cfg.pairBudget)
      val st = EntityResolution.goldenRecordState(
        resolved, "entity_id", cfg.modeFields, cfg.longestFields, cfg.newestFields)
      state.overwriteIfNew(st, appId, batchId)
      rows.upsertIfNew(resolved, appId, batchId): Unit
      return
    }

    val store = rows.read(spark) // pre-batch by protocol (rows commit is last)
    val (newState, remap) = EntityResolution.goldenRecordAdvance(
      store, state.read(spark), batch, cfg.idCol, cfg.blockCols, cfg.fields,
      cfg.threshold, cfg.modeFields, cfg.longestFields, cfg.newestFields,
      cfg.roundScale, cfg.pairBudget)
    // remap is entity-level and tiny by construction (≤ touched
    // entities per batch); it feeds three evaluations (the state
    // overwrite embeds it, and both row-update legs join it), so pin
    // the iterative closure's result for the batch's lifetime
    remap.persist()
    try {
      val remapB = broadcast(remap)
      state.overwriteIfNew(newState, appId, batchId)

      // rows update: batch rows enter with canonical(own id) (a batch
      // row is its own singleton entity until bridged); store rows
      // whose entity folded re-key. Derived from (pre-batch store,
      // batch) only.
      val outCols = store.columns.toSeq
      val batchRows = batch
        .join(remapB.withColumnRenamed("__ent", cfg.idCol), Seq(cfg.idCol), "left")
        .withColumn("entity_id", coalesce(col("__canon"), col(cfg.idCol)))
        .select(outCols.map(col): _*)
      val movedRows = store
        .join(remapB.withColumnRenamed("__ent", "entity_id"), Seq("entity_id"))
        .withColumn("entity_id", col("__canon"))
        .select(outCols.map(col): _*)
      rows.upsertIfNew(batchRows.unionByName(movedRows), appId, batchId): Unit
    } finally remap.unpersist(): Unit
  }

  /** Start the exactly-once streaming ER sink: unbounded row updates →
    * maintained (rows, state) tables.
    */
  def resolveStream(
      updates: DataFrame,
      rows: VersionedTable,
      state: VersionedTable,
      cfg: ErConfig,
      appId: String,
      checkpoint: String): StreamingQuery =
    updates.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        advanceBatch(rows, state, batch.toDF(), cfg, appId, batchId)
      }
      .start()

  /** Golden records from the maintained state — winners, tie rules,
    * and shape identical to the batch `goldenRecord` (q186 oracle).
    */
  def goldenRecords(
      spark: SparkSession,
      state: VersionedTable,
      template: DataFrame,
      cfg: ErConfig): DataFrame =
    EntityResolution.goldenRecordFromState(
      state.read(spark), template, "entity_id",
      cfg.modeFields, cfg.longestFields, cfg.newestFields)
}
