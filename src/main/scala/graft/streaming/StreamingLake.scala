package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.lake.VersionedTable

/** Streaming CDC apply into a [[graft.lake.VersionedTable]]: each
  * micro-batch is upserted (MERGE latest-wins) as one atomic table
  * commit, with EXACTLY-ONCE semantics across restarts.
  *
  * Structured Streaming's foreachBatch is at-least-once — after a
  * checkpoint recovery the last batch is REPLAYED with the same
  * batchId. A plain merge would double-apply it (non-idempotent when
  * updates insert new keys). `VersionedTable.upsertIfNew` closes the
  * gap with the transactional-writer pattern: the (appId, batchId)
  * progress marker lands in the SAME atomic manifest commit as the data
  * files, so a replayed batch is recognized and skipped — the streaming
  * twin of the batch `merge` (q149), and the continuous version of the
  * reference's daily write-then-recrawl loop.
  *
  * Scale: each micro-batch costs what a batch merge costs — O(zone-
  * overlapping files + batch), not O(table). Small-file accretion from
  * many micro-batches is handled by the same `compact()` commit,
  * which can run between batches (single-writer: schedule it in the
  * same foreachBatch loop or pause the stream).
  */
object StreamingLake {

  /** Start the exactly-once upsert sink.
    *
    * @param updates    unbounded frame, schema = table schema (must
    *                   include the table's key column)
    * @param table      target VersionedTable
    * @param appId      stable writer identity (one per stream); scopes
    *                   the idempotence marker
    * @param checkpoint checkpoint directory (drives batchId continuity
    *                   across restarts — the other half of exactly-once)
    */
  def upsertStream(
      updates: DataFrame,
      table: VersionedTable,
      appId: String,
      checkpoint: String): StreamingQuery =
    updates.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        table.upsertIfNew(batch.toDF(), appId, batchId): Unit
      }
      .start()

  /** Exactly-once upsert PLUS an incrementally maintained materialized
    * aggregate: after each micro-batch commit the
    * [[graft.lake.MaterializedAgg]] advances by that batch's change
    * feed only. Both halves are replay-safe on checkpoint recovery —
    * the table by its (appId, batchId) txn marker, the aggregate by
    * its table-version cursor — so a recovered stream never
    * double-applies to either.
    */
  def upsertStreamMaintaining(
      updates: DataFrame,
      table: VersionedTable,
      agg: graft.lake.MaterializedAgg,
      appId: String,
      checkpoint: String): StreamingQuery =
    updates.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        table.upsertIfNew(batch.toDF(), appId, batchId)
        agg.refresh(batch.sparkSession): Unit
      }
      .start()
}
