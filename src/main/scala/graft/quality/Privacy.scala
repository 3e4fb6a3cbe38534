package graft.quality

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Privacy audits over quasi-identifiers — the release-gate questions
  * ("can any row be singled out by this column combination?") asked of
  * a training corpus or a published lake table. Complements the
  * row-level PII redaction in `TextAnalysis.redactPii`: redaction
  * scrubs literal identifiers out of text, these audits measure
  * re-identification risk in the STRUCTURED columns that survive.
  *
  * Scale shape: every audit is one groupBy over the quasi-identifier
  * columns (map-side partial aggregation; violation sets are the small
  * tail by construction). Exact integer arithmetic throughout — every
  * query carries a DuckDB oracle.
  */
object Privacy {

  /** Equivalence classes: one row per distinct quasi-identifier
    * combination with its row count (`class_size`). A dataset is
    * k-anonymous iff min(class_size) ≥ k.
    */
  def kAnonymityClasses(df: DataFrame, quasiCols: Seq[String]): DataFrame =
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("class_size"))

  /** Quasi-identifier combinations shared by FEWER than k rows — the
    * classes whose members a k-anonymity release policy would expose.
    * Empty output == the dataset is k-anonymous on these columns.
    */
  def kAnonymityViolations(df: DataFrame, quasiCols: Seq[String], k: Int): DataFrame =
    kAnonymityClasses(df, quasiCols).filter(col("class_size") < k)

  /** The k-anonymity spectrum: how many classes (and rows) exist at
    * each class size. The release-gate summary — `min(class_size)` is
    * the dataset's k, and the row mass below a target k is the cost of
    * enforcing it by suppression.
    */
  def kAnonymityProfile(df: DataFrame, quasiCols: Seq[String]): DataFrame =
    kAnonymityClasses(df, quasiCols)
      .groupBy("class_size")
      .agg(
        count(lit(1)).as("n_classes"),
        sum("class_size").as("n_rows"))

  /** Distinct-l-diversity: classes where the sensitive column takes
    * FEWER than l distinct values — k-anonymity's complement (a class
    * of 50 rows that all share one diagnosis still leaks it). Output:
    * quasi columns + `class_size` + `n_sensitive`.
    */
  def lDiversityViolations(
      df: DataFrame,
      quasiCols: Seq[String],
      sensitiveCol: String,
      l: Int): DataFrame =
    df.groupBy(quasiCols.map(col): _*)
      .agg(
        count(lit(1)).as("class_size"),
        countDistinct(col(sensitiveCol)).as("n_sensitive"))
      .filter(col("n_sensitive") < l)
}
