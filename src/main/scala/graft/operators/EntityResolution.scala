package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Record linkage over STRUCTURED rows — the classic warehouse dedup
  * (Fellegi–Sunter shape: block, score field-wise, threshold, cluster),
  * complementing the text/embedding near-dup family which keys on
  * content. Reference scope: the reference dedups exact duplicate rows
  * only (`drop_duplicates`, scripts/.../pyspark.py:61); this extends
  * that to fuzzy entity matching under the north-star charter.
  *
  * Scale shape: candidates come from an equi-join on the blocking key —
  * never a cartesian product — with a hot-block cap (the skew guard the
  * near-dup family uses); scoring is codegen'd string expressions on
  * the joined pairs; clustering reuses the bounded min-label
  * propagation of [[Dedup.nearDupClusters]]. Every stage is exact and
  * engine-replayable (levenshtein + integer lengths + one rounded
  * division), so the whole path carries a DuckDB oracle.
  */
object EntityResolution {

  /** Normalized edit similarity in [0, 1]: 1 − lev(a,b)/max(len) —
    * 1.0 for identical strings, 0.0 for fully dissimilar. NULL-safe:
    * a null field scores 0 (no evidence), not null (which would
    * poison the weighted sum).
    */
  def levSim(a: Column, b: Column): Column = {
    val sim = lit(1.0) -
      levenshtein(a, b).cast("double") /
        greatest(length(a), length(b), lit(1)).cast("double")
    when(a.isNull || b.isNull, 0.0).otherwise(sim)
  }

  /** Match-candidate pairs with their field-similarity score.
    *
    * `blockCols`: equality blocking key (candidates only form inside a
    * block). `fields`: (column, weight) — the score is
    * Σ wᵢ·levSim(aᵢ, bᵢ) rounded to `roundScale`, and pairs below
    * `threshold` (compared AFTER rounding, the oracle convention) are
    * dropped. `blockCap` bounds the quadratic term: a block of b rows
    * yields b(b−1)/2 pairs, so blocks larger than the cap are EXCLUDED
    * from candidate generation (the near-dup family's hot-bucket rule —
    * a degenerate key value is boilerplate, not evidence of identity);
    * raise the cap deliberately, or pick a finer key.
    *
    * Output: (id_a, id_b, score) with id_a < id_b.
    */
  def linkPairs(
      df: DataFrame,
      idCol: String,
      blockCols: Seq[String],
      fields: Seq[(String, Double)],
      threshold: Double,
      roundScale: Int = 6,
      blockCap: Int = 10000): DataFrame = {
    require(fields.nonEmpty, "at least one scoring field")
    val key = concat_ws("", blockCols.map(c => col(c).cast("string")): _*)
    val slim = df.select(
      (Seq(col(idCol), key.as("__block")) ++
        fields.map { case (f, _) => col(f) }): _*)
    val guarded = Dedup.dropHotBuckets(slim, "__block", blockCap)
    val a = guarded.select(
      (Seq(col(idCol).as("id_a"), col("__block")) ++
        fields.map { case (f, _) => col(f).as(s"__a_$f") }): _*)
    val b = guarded.select(
      (Seq(col(idCol).as("id_b"), col("__block")) ++
        fields.map { case (f, _) => col(f).as(s"__b_$f") }): _*)
    val score = round(
      fields.map { case (f, w) =>
        lit(w) * levSim(col(s"__a_$f"), col(s"__b_$f"))
      }.reduce(_ + _),
      roundScale)
    // Length prefilter (lossless): lev(a,b) ≥ |len(a)−len(b)|, so
    // Σ wᵢ·(1 − |lenΔᵢ|/maxLenᵢ) upper-bounds the score — pairs whose
    // bound can't reach the threshold skip the levenshtein DP entirely.
    // Slack covers the final round-then-compare promote window plus
    // float error; the bound only PRUNES, the real score decides.
    val ubound = fields.map { case (f, w) =>
      val (la, lb) = (col(s"__a_$f"), col(s"__b_$f"))
      val ub = lit(1.0) -
        abs(length(la) - length(lb)).cast("double") /
          greatest(length(la), length(lb), lit(1)).cast("double")
      lit(w) * when(la.isNull || lb.isNull, 0.0).otherwise(ub)
    }.reduce(_ + _)
    a.join(b, Seq("__block"))
      .filter(col("id_a") < col("id_b"))
      .filter(ubound >= threshold - 0.5 * math.pow(10, -roundScale) - 1e-9)
      .withColumn("score", score)
      .filter(col("score") >= threshold)
      .select("id_a", "id_b", "score")
  }

  /** End-to-end resolution: link pairs, close them transitively
    * (min-label propagation — bounded iterations, lineage-truncated),
    * and return every input row annotated with its `entity_id` (the
    * smallest member id of its match cluster; singletons keep their own
    * id). The survivor policy is the caller's — [[Dedup.nearDupSurvivors]]
    * composes directly.
    */
  def resolve(
      df: DataFrame,
      idCol: String,
      blockCols: Seq[String],
      fields: Seq[(String, Double)],
      threshold: Double,
      roundScale: Int = 6,
      blockCap: Int = 10000): DataFrame = {
    val pairs = linkPairs(df, idCol, blockCols, fields, threshold, roundScale, blockCap)
    val clusters = Dedup.nearDupClusters(pairs) // (id, cluster)
    df.join(clusters.withColumnRenamed("id", idCol), Seq(idCol), "left")
      .withColumn("entity_id", coalesce(col("cluster"), col(idCol)))
      .drop("cluster")
  }
}
