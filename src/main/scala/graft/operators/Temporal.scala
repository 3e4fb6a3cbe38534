package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (SCD Type-2) construction from a change
  * log, plus point-in-time snapshot lookup. North-star EXTENSION — the
  * reference stops at "overwrite the curated table"
  * (`scripts/aws-hackathon-glue-data-lake-querying-pyspark.py:131-140`);
  * a lakehouse serving training pipelines needs the history-preserving
  * form so any past state of the dimension is reproducible (e.g. "which
  * documents were tagged safe at the time of the March snapshot").
  *
  * Scale: ONE shuffle on the dimension key (the window partition key),
  * one sort, zero joins. Both window passes (the change-compaction lag
  * and the validity lead) and the intervening filter run over the same
  * partitioning+ordering, so Catalyst plans a single Exchange and a
  * single Sort — pinned in TemporalSpec. Skew is bounded by per-key
  * version counts, never corpus size.
  */
object Temporal {

  /** Build an SCD Type-2 dimension from a change log.
    *
    * Input: one row per observed state, identified by `keyCols`,
    * ordered within a key by `tsCol` (caller pre-dedups to one row per
    * (key, ts) — ties would make the compaction nondeterministic).
    *
    * Steps, all window-algebra on the same (key, ts) shuffle:
    *   1. compact no-op rows: drop a row when EVERY tracked attribute is
    *      null-safely equal (`<=>`) to its predecessor's value;
    *   2. validity interval: `valid_from` = own ts, `valid_to` = next
    *      surviving row's ts (null = open-ended), half-open [from, to);
    *   3. `is_current` = 1 for the open-ended row of each key.
    */
  def scd2(
      changes: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      attrCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty && attrCols.nonEmpty, "need key and attribute columns")
    val byKey = Window.partitionBy(keyCols.map(col): _*).orderBy(col(tsCol).asc)
    // row_number, not lag(ts).isNull: a null ts value would make its
    // SUCCESSOR look like the first row and survive compaction (and this
    // matches the oracle's rn = 1 formulation)
    val isFirst = row_number().over(byKey) === 1
    val anyAttrChanged: Column = attrCols
      .map(a => !(col(a) <=> lag(col(a), 1).over(byKey)))
      .reduce(_ || _)
    changes
      .withColumn("__keep", isFirst || anyAttrChanged)
      .filter(col("__keep"))
      .drop("__keep")
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(byKey))
      .withColumn("is_current", when(col("valid_to").isNull, 1).otherwise(0))
  }

  /** The dimension as of an instant: rows whose half-open validity
    * interval contains `ts`. A plain filter — partition- and
    * pushdown-friendly (on a dimension stored partitioned by
    * `is_current` or bucketed by key, this prunes at planning time).
    */
  def asOfSnapshot(dim: DataFrame, ts: Column): DataFrame =
    dim.filter(col("valid_from") <= ts &&
      (col("valid_to").isNull || ts < col("valid_to")))

  /** Incremental SCD2 merge — the lakehouse MERGE pattern as a pure
    * batch transform: fold a NEW batch of changes into an existing
    * [[scd2]] dimension without replaying history. Closed versions pass
    * through untouched (their history is immutable); each key's OPEN
    * row is converted back to a change record and re-run through
    * [[scd2]] together with the new batch, which closes it when the
    * batch's first differing observation arrives and compacts no-ops
    * against it.
    *
    * Equivalence contract (spec-pinned): given every new change at or
    * after the open rows' `valid_from`,
    * `scd2Merge(scd2(log1), log2) == scd2(log1 ++ log2)` whenever log1's
    * open-version attrs match — i.e. incremental and full-replay builds
    * agree. Cost: one shuffle over |open rows| + |batch| (the closed
    * majority of a years-old dimension never moves), so daily merges
    * touch O(keyspace + day), not O(history).
    */
  def scd2Merge(
      dim: DataFrame,
      changes: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      attrCols: Seq[String]): DataFrame = {
    val closed = dim.filter(col("is_current") === 0)
    val openAsChanges = dim.filter(col("is_current") === 1)
      .select((keyCols.map(col) ++ Seq(col("valid_from").as(tsCol)) ++
        attrCols.map(col)).toIndexedSeq: _*)
    val rebuilt = scd2(
      openAsChanges.unionByName(
        changes.select((keyCols.map(col) ++ Seq(col(tsCol)) ++
          attrCols.map(col)).toIndexedSeq: _*)),
      keyCols, tsCol, attrCols)
    // project closed rows down to the canonical merge schema: a dim
    // built from a log with extra passthrough columns still merges —
    // the output carries keys + ts + attrs + validity only
    closed
      .select(rebuilt.columns.map(col).toIndexedSeq: _*)
      .unionByName(rebuilt)
  }
}
