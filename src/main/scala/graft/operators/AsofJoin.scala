package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed as-of join — for each left row, attach the single most
  * recent right row with `rightTs <= leftTs` within the same key (the
  * time-series "latest value as of" operator; Spark has no built-in).
  * EXTENSION beyond the reference (which is batch ETL only, no joins in
  * its 237 LoC) — declared per the arbitrary-SQL surface contract,
  * oracle-checked against DuckDB's native ASOF JOIN (q17).
  *
  * Implementation is the union-window pattern, NOT a range join:
  * tag and union both inputs, sort each key's timeline once, and carry
  * the latest right values forward with `last(_, ignoreNulls=true)` over
  * an unbounded-preceding window; then keep the left rows. One shuffle
  * (by key), no candidate explosion — a theta/range join would shuffle
  * |left|×|right per key| pairs, this shuffles |left|+|right| rows, so
  * it survives 100 TB where a range join cannot. Ties (equal key+ts):
  * right rows sort before left rows (a right row AT the left timestamp
  * is visible to it), multiple right rows at one ts resolve to the last
  * by `rightId` for determinism.
  */
object AsofJoin {

  /** @param left      left (probe) rows
    * @param right     right (reference) rows; `valueCols` are attached
    * @param keyCols   equi-join keys present in both
    * @param leftTs    left timestamp column (numeric or timestamp)
    * @param rightTs   right timestamp column
    * @param rightId   right tie-break column (unique within key+ts)
    * @param valueCols right columns to attach (null when no right row is
    *                  at-or-before the left row)
    */
  def asof(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTs: String,
      rightTs: String,
      rightId: String,
      valueCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    require(valueCols.forall(v => !keyCols.contains(v)),
      s"valueCols ${valueCols.mkString(",")} must be disjoint from keyCols")

    val taggedLeft = valueCols.foldLeft(
      left.withColumn("__ts", col(leftTs))
        .withColumn("__side", lit(1))
        .withColumn("__rid", lit(null).cast("long"))) {
      (df, v) => df.withColumn(s"__v_$v", lit(null))
    }
    // Extract the right value columns into their __v_* aliases BEFORE
    // null-padding the left-only column names: a valueCol that shares its
    // name with a left non-key column (both sides carrying `value`, say)
    // must not be clobbered by the padding.
    val taggedRight = {
      val extracted = right
        .withColumn("__ts", col(rightTs))
        .withColumn("__side", lit(0))
        .withColumn("__rid", col(rightId).cast("long"))
        .select(
          (keyCols.map(col) ++
            Seq(col("__ts"), col("__side"), col("__rid")) ++
            valueCols.map(v => col(v).as(s"__v_$v"))).toIndexedSeq: _*)
      leftCols.filterNot(keyCols.contains).foldLeft(extracted) {
        (df, c) => df.withColumn(c, lit(null).cast(left.schema(c).dataType))
      }.select(
        (keyCols.map(col) ++ leftCols.filterNot(keyCols.contains).map(col) ++
          Seq(col("__ts"), col("__side"), col("__rid")) ++
          valueCols.map(v => col(s"__v_$v"))).toIndexedSeq: _*)
    }

    val unioned = taggedLeft
      .select(taggedRight.columns.map(col).toIndexedSeq: _*)
      .union(taggedRight)

    // right rows (__side=0) sort before left rows at the same ts; the
    // carried value is the latest non-null right value seen so far
    val w = Window
      .partitionBy(keyCols.map(col).toIndexedSeq: _*)
      .orderBy(col("__ts").asc, col("__side").asc, col("__rid").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = valueCols.foldLeft(unioned) { (df, v) =>
      df.withColumn(s"__asof_$v", last(col(s"__v_$v"), ignoreNulls = true).over(w))
    }

    carried
      .filter(col("__side") === 1)
      .select((leftCols.map(col) ++
        valueCols.map(v => col(s"__asof_$v").as(s"asof_$v"))).toIndexedSeq: _*)
  }
}
