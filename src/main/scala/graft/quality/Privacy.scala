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

  /** ε-differentially-private group counts — the Laplace mechanism
    * (Dwork et al., TCC 2006): each group's count is released as
    * count + Lap(1/ε) (a COUNT query has sensitivity 1: one person
    * moves one group count by one), the release-side complement of the
    * k-anonymity/l-diversity AUDITS above.
    *
    * WHAT THE GUARANTEE REQUIRES OF THE CALLER (the mechanism alone is
    * not a release policy):
    *  - `seed` is the release's secret randomness and has NO default:
    *    anyone who knows the seed subtracts the deterministic noise and
    *    recovers exact counts, so the seed must be drawn fresh per
    *    release, kept as secret as the raw data, and never reused
    *    (reuse also spends no fresh randomness — account ε across
    *    releases).
    *  - the GROUP DOMAIN must not itself leak. With a data-dependent
    *    domain, a group whose existence hinges on one individual is
    *    revealed with certainty no matter the noise. Either pass
    *    `publicDomain` (the data-independent list of releasable group
    *    keys — absent groups are emitted as noised ZEROS, present
    *    groups outside it are suppressed) or set `releaseThreshold` τ
    *    so only groups with noised_count ≥ τ are emitted (the
    *    stability-style thresholded release; τ ≈ 1 + ln(1/δ)/ε gives
    *    (ε, δ)-DP for unit-sensitivity counts).
    *  - publish the [[dpRelease]] projection, not this frame: the exact
    *    `class_size` column returned here is for verification/oracle
    *    replay only and voids the guarantee if released.
    *
    * The Laplace draw is DETERMINISTIC given the seed and
    * engine-replayable (the engine's md5-uniform discipline, as in
    * `ScaleOps.importanceResample`'s Gumbel): u = (52-bit md5 prefix of
    * the keyed group + 0.5) / 2⁵² ∈ (0,1), noise = −(1/ε) · sign(u−½) ·
    * ln(1 − 2|u−½|), rounded to 6 decimals for cross-engine hash
    * stability. The key is INJECTIVE — md5(md5(seed) ∥ md5(col₁) ∥ …):
    * each component hashes to a fixed 32-hex block before
    * concatenation, so group tuples like ("a:b","c") and ("a","b:c")
    * cannot collide into correlated noise (a ':'-join would).
    *
    * Scale shape: one groupBy (map-side partial agg) + a map-only noise
    * projection; group keys must be non-null (the `tokenBudgetRates`
    * stringification contract — bucket nulls under an explicit label
    * first).
    */
  def dpNoisedCounts(
      df: DataFrame,
      groupCols: Seq[String],
      epsilon: Double,
      seed: Long,
      publicDomain: Option[DataFrame] = None,
      releaseThreshold: Option[Double] = None): DataFrame = {
    require(epsilon > 0.0, "epsilon must be > 0")
    val key = concat(
      (md5(lit(seed.toString)) +: groupCols.map(c => md5(col(c).cast("string")))): _*)
    val u = (conv(substring(md5(key), 1, 13), 16, 10).cast("double") + lit(0.5)) /
      lit(4503599627370496.0) // 2^52 — exact long→double, exact division
    val centered = u - lit(0.5)
    val noise = round(
      lit(-1.0 / epsilon) * signum(centered) * log(lit(1.0) - lit(2.0) * abs(centered)),
      6)
    val counts = df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("class_size"))
    val domained = publicDomain match {
      case None => counts
      case Some(dom) =>
        // inner-from-domain: groups outside the public domain are
        // suppressed; public groups absent from the data release a
        // noised zero, so presence itself discloses nothing
        dom.select(groupCols.map(col): _*).distinct()
          .join(counts, groupCols, "left")
          .withColumn("class_size", coalesce(col("class_size"), lit(0L)))
    }
    val noised = domained.withColumn("noised_count", round(col("class_size") + noise, 6))
    releaseThreshold.fold(noised)(t => noised.filter(col("noised_count") >= t))
  }

  /** The publishable projection of [[dpNoisedCounts]]: group keys and
    * `noised_count` only — the exact `class_size` never leaves the
    * verification context.
    */
  def dpRelease(noisedCounts: DataFrame): DataFrame =
    noisedCounts.drop("class_size")
}
