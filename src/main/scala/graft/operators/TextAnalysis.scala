package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline, over a
  * `documents(doc_id, text, …)` table. All are pure column expressions
  * (whole-stage-codegen-friendly where Spark codegens them, JVM higher-order
  * functions elsewhere) — no UDFs, no driver-side loops; each scales as a
  * map-only stage.
  */
object TextAnalysis {

  /** Whitespace tokenization; empty string → empty array (split would give
    * one empty token).
    */
  def tokens(text: Column): Column =
    when(length(trim(text)) === 0, array().cast("array<string>"))
      .otherwise(split(trim(text), "\\s+"))

  /** Token count (whitespace tokenizer). */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count: counts word-piece-like units — runs of letters,
    * runs of digits, or single punctuation marks — the usual pre-tokenizer
    * regex shape. An approximation of BPE token counts without a vocab.
    */
  def subwordCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))

  /** Characters of punctuation. */
  def punctCount(text: Column): Column =
    length(text) - length(regexp_replace(text, "[.,!?;:'\"()\\[\\]{}-]", ""))

  val defaultStopwords: Seq[String] =
    Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")

  /** Fraction of tokens that are stopwords; 0 for empty docs. */
  def stopwordRatio(text: Column, stopwords: Seq[String] = defaultStopwords): Column = {
    val toks = tokens(text)
    val sw = array(stopwords.map(lit).toIndexedSeq: _*)
    val nTok = size(toks)
    when(nTok === 0, lit(0.0))
      .otherwise(size(filter(toks, t => array_contains(sw, lower(t)))).cast("double") / nTok)
  }

  /** Heuristic quality score in [0,1]: rewards moderate length, low
    * punctuation density, presence (but not excess) of stopwords, and a
    * sane mean token length. Deterministic, explainable, cheap.
    *
    *   score = 0.25·lenScore + 0.25·punctScore + 0.25·stopScore + 0.25·wordScore
    */
  def qualityScore(text: Column): Column = {
    val nChars = length(text).cast("double")
    val nToks = tokenCount(text).cast("double")
    // length: full credit 100..10000 chars, linear ramp below, clamp above
    val lenScore = least(nChars / 100.0, lit(1.0))
    val punctRatio = when(nChars === 0, 0.0).otherwise(punctCount(text).cast("double") / nChars)
    val punctScore = greatest(lit(0.0), lit(1.0) - punctRatio * 5.0)
    val sr = stopwordRatio(text)
    // stopwords: ideal band ~[0.1, 0.6]
    val stopScore = when(sr.between(0.1, 0.6), 1.0)
      .otherwise(greatest(lit(0.0), lit(1.0) - abs(sr - 0.35) * 2.0))
    val meanTokLen = when(nToks === 0, 0.0).otherwise(nChars / nToks)
    val wordScore = when(meanTokLen.between(3.0, 10.0), 1.0)
      .otherwise(greatest(lit(0.0), lit(1.0) - abs(meanTokLen - 6.0) / 10.0))
    round((lenScore + punctScore + stopScore + wordScore) / 4.0, 4)
  }

  /** Tiny built-in stopword profiles for the n-gram/stopword language-ID
    * heuristic. Public-knowledge word lists, a handful per language.
    */
  val langProfiles: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "is", "that", "you", "with"),
    "es" -> Seq("el", "la", "de", "que", "los", "una", "por", "con"),
    "fr" -> Seq("le", "les", "des", "est", "dans", "une", "pour", "que"),
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "ein", "mit"),
    "zh" -> Seq("的", "是", "了", "在", "我", "有", "他", "这"))

  /** Heuristic language ID: score each language by stopword hits (plus a
    * CJK-character signal for zh), take the argmax; "und" when nothing
    * matches. Pure expressions → map-only, no shuffle.
    */
  def langId(text: Column, profiles: Map[String, Seq[String]] = langProfiles): Column = {
    val toks = transform(tokens(text), lower _)
    val cjk = size(regexp_extract_all(text, lit("[\\u4e00-\\u9fff]"), lit(0)))
    val scored: Seq[(String, Column)] = profiles.toSeq.sortBy(_._1).map { case (lang, words) =>
      val prof = array(words.map(lit).toIndexedSeq: _*)
      val base = size(filter(toks, t => array_contains(prof, t)))
      val score = if (lang == "zh") base + cjk else base
      lang -> score
    }
    // argmax with deterministic tie-break on language code order
    val best = scored.map(_._2).reduce((a, b) => greatest(a, b))
    scored.foldLeft(lit("und")) { case (acc, (lang, score)) =>
      when(score > 0 && score === best && acc === "und", lit(lang)).otherwise(acc)
    }
  }

  /** 64-bit document fingerprint: polynomial rolling hash over the
    * normalized (lowercased, whitespace-collapsed) text, built from
    * per-token xxhash64 values combined order-sensitively:
    *
    *   fp = Σ over positions p:  xxhash64(token_p) · 31^p   (mod 2⁶⁴)
    *
    * Order-sensitive (unlike a bag-of-words hash) yet incremental —
    * expressible entirely with built-ins.
    */
  def fingerprint(text: Column): Column = {
    val toks = tokens(lower(text))
    aggregate(
      toks,
      struct(lit(0L).as("acc"), lit(1L).as("pow")),
      (st, t) =>
        struct(
          (st.getField("acc") + xxhash64(t) * st.getField("pow")).as("acc"),
          (st.getField("pow") * 31L).as("pow")),
      st => st.getField("acc"))
  }

  /** Annotate a documents frame with all analysis columns. One native
    * single-tokenization kernel (TextProfileExpr); field-by-field
    * value-identical to [[annotateHof]], which the spec pins.
    */
  def annotate(df: DataFrame, textCol: String = "text"): DataFrame = {
    val p = graft.functions.TextProfileExpr(col(textCol))
    df.withColumn("__tp", p)
      .withColumn("n_tokens", col("__tp.n_tokens"))
      .withColumn("n_subwords", col("__tp.n_subwords"))
      .withColumn("stopword_ratio", col("__tp.stopword_ratio"))
      .withColumn("quality", col("__tp.quality"))
      .withColumn("lang_pred", col("__tp.lang_pred"))
      .withColumn("fingerprint", col("__tp.fingerprint"))
      .drop("__tp")
  }

  /** Reference formulation of [[annotate]] from the individual built-in
    * expressions — kept as the semantic spec for the native kernel.
    */
  def annotateHof(df: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    df.withColumn("n_tokens", tokenCount(t))
      .withColumn("n_subwords", subwordCount(t))
      .withColumn("stopword_ratio", round(stopwordRatio(t), 4))
      .withColumn("quality", qualityScore(t))
      .withColumn("lang_pred", langId(t))
      .withColumn("fingerprint", fingerprint(t))
  }
}
