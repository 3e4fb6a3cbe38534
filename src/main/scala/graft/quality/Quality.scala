package graft.quality

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, count, lit, sum}

/** Data-profile snapshot — reference validation block
  * (`scripts/...pyspark.py:86-98`): row count, column count, duplicate-row
  * count, per-column null counts. The reference logs these; we return them
  * as data so tests can assert.
  */
final case class Profile(
    rows: Long,
    cols: Int,
    dupRows: Long,
    nullCounts: Map[String, Long])

object Validator {

  /** Single job computing rows + dup-rows; one more for per-column nulls.
    *
    * Reference computes `df.count() - df.distinct().count()` (`:90-91`) —
    * two jobs — and the per-column null vector as ONE single-pass
    * aggregation (`:93-95`), which we keep: n columns → n partial sums in
    * one shuffle-free reduce, scale-safe at any width.
    */
  def profile(df: DataFrame): Profile = {
    val columns = df.columns
    val rows = df.count()
    val distinctRows = df.distinct().count()
    val nullRow = df
      .select(columns.map(c => sum(col(c).isNull.cast("int")).as(c)).toIndexedSeq: _*)
      .na.fill(0L)
      .collect()
      .headOption
    val nullCounts = nullRow match {
      case Some(r) => columns.zipWithIndex.map { case (c, i) => c -> r.getLong(i) }.toMap
      case None    => columns.map(_ -> 0L).toMap
    }
    Profile(rows, columns.length, rows - distinctRows, nullCounts)
  }
}

object Cleaner {

  /** Default targeted fill — reference `fillna({"Phone": "Unknown"})`
    * (`:100`). Applied ONLY to columns that exist in the frame (fillna on a
    * missing column is a no-op in both PySpark and Scala `na.fill`).
    */
  val defaultFill: Map[String, String] = Map("Phone" -> "Unknown")

  /** Cleaning chain in the reference's EXACT order (`:100-103`):
    * 1. targeted fill (Phone → "Unknown") — runs BEFORE dropna so
    *    Phone-only-null rows survive;
    * 2. `na.drop()` — remove any row with a null in ANY column;
    * 3. `dropDuplicates()` — exact full-row dedup.
    * Inverting 1 and 2 silently drops Phone-null rows — pinned by tests.
    *
    * All three are distributed ops (fill is a projection; drop a filter;
    * dedup a hash aggregate over all columns).
    */
  def clean(df: DataFrame, fill: Map[String, String] = defaultFill): DataFrame = {
    val present = fill.filter { case (k, _) =>
      df.columns.exists(_.equalsIgnoreCase(k))
    }
    df.na.fill(present).na.drop().dropDuplicates()
  }
}
