package graft.quality

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** Corpus DATA CARD: the per-source summary a training-data pipeline
  * publishes with every release ("Datasheets for Datasets", Gebru et
  * al. 2021 — the documentation artifact; the numbers here are the
  * quantitative half a 100 TB pipeline can actually compute). One row
  * per source with volume, duplication, language, quality, encoding
  * and PII indicators — every metric a composition of kernels that
  * already carry their own oracle (token counts q95/q96, md5 identity
  * q105, script profile q213, encoding noise q191, PII classes q102).
  *
  * Scale shape: ONE aggregation over the corpus (all metrics are
  * partial-aggregable: counts, sums, countDistinct of an md5, and
  * DECIMAL-exact sums of per-doc rounded ratios so addition order can
  * never perturb the card), plus a per-(source, lang) count whose
  * mode/window runs over the |sources|×|langs|-bounded aggregate —
  * never over rows. The card itself is |sources| rows: driver-safe at
  * any corpus size.
  */
object DataCard {

  def perSource(
      docs: DataFrame,
      sourceCol: String = "source",
      textCol: String = "text",
      langCol: String = "lang"): DataFrame = {
    val text = col(textCol)
    val toks = size(split(trim(text), "\\s+")).cast("long")
    val sp = org.apache.spark.sql.graft.NativeExprs.scriptProfile(text)
    // per-doc ratio rounded THEN summed as DECIMAL: the q153 discipline
    // (exact addition at any partitioning)
    val stopDec = round(TextAnalysis.stopwordRatio(text), 4).cast("decimal(18,6)")
    val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

    val base = docs
      .groupBy(col(sourceCol).as("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(toks).as("n_tokens"),
        sum(length(text).cast("long")).as("n_chars"),
        round(lit(1.0) -
          countDistinct(md5(text)).cast("double") / count(lit(1)), 4).as("dup_rate"),
        countDistinct(col(langCol)).as("n_langs"),
        round(sum(stopDec).cast("double") / count(lit(1)), 4).as("avg_stop_ratio"),
        round(sum(sp.getField("n_latin")).cast("double") /
          greatest(sum(length(text).cast("long")), lit(1L)), 4).as("latin_frac"),
        sum(when(TextAnalysis.encodingNoiseScore(text) > 0, 1L).otherwise(0L))
          .as("n_noisy_docs"),
        sum(when(text.rlike(emailRe), 1L).otherwise(0L)).as("n_email_docs"))

    // dominant language: mode over the bounded (source, lang) aggregate,
    // ties to the alphabetically-first language
    val langCounts = docs
      .groupBy(col(sourceCol).as("source"), col(langCol).as("lang"))
      .agg(count(lit(1)).as("ln"))
    val w = Window.partitionBy("source").orderBy(col("ln").desc, col("lang"))
    val top = langCounts
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("source"), col("lang").as("top_lang"), col("ln").as("__top_n"))

    base.join(top, Seq("source"))
      .withColumn("top_lang_frac",
        round(col("__top_n").cast("double") / col("n_docs"), 4))
      .select("source", "n_docs", "n_tokens", "n_chars", "dup_rate",
        "n_langs", "top_lang", "top_lang_frac", "avg_stop_ratio",
        "latin_frac", "n_noisy_docs", "n_email_docs")
  }
}
