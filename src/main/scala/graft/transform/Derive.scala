package graft.transform

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, current_date, datediff, lit, to_date}

/** Derived-column transforms — reference `scripts/...pyspark.py:108-109`.
  *
  * NOTE ON SEMANTICS: in the reference pipeline these lines are dead code —
  * the temp view snapshots the plan BEFORE this transform, so the SQL query
  * and the sink never see `age` (SURVEY.md §2.A critical-semantics note).
  * The operator is kept (and tested) independently for parity.
  */
object Derive {

  /** `withColumn("age", (datediff(asOf, to_date(col(dobCol), "yyyy-MM-dd")) / 365).cast("int"))`.
    *
    * @param asOf injectable "today" (ISO yyyy-MM-dd) for deterministic
    *             tests; None → `current_date()` like the reference (`:108`).
    */
  def age(df: DataFrame, dobCol: String = "Date of Birth", asOf: Option[String] = None): DataFrame = {
    val today = asOf.map(d => to_date(lit(d))).getOrElse(current_date())
    df.withColumn(
      "age",
      (datediff(today, to_date(col(dobCol), "yyyy-MM-dd")) / 365).cast("int"))
  }

  /** `df.filter(col("age") > 30)` — reference `:109`. */
  def adultsOver(df: DataFrame, threshold: Int = 30): DataFrame =
    df.filter(col("age") > threshold)
}
