package graft.functions

import java.text.Normalizer

import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization kernel (UAX #15 via `java.text.Normalizer`) —
  * the canonicalization pass every fingerprint/dedup pipeline needs
  * BEFORE hashing: "café" composed (U+00E9) and decomposed
  * (e + U+0301) are byte-different, so md5/minhash/simhash all see two
  * distinct documents until the text is normalized. NFC is the
  * cross-engine-auditable form (DuckDB's `nfc_normalize` implements
  * the same standard, which is what lets q196 hash-compare); NFKC adds
  * the compatibility foldings (ligatures ﬁ→fi, fullwidth forms,
  * superscripts) corpus pipelines usually want before tokenization.
  *
  * The fast path is free: `Normalizer.isNormalized` is a table-driven
  * scan, and real corpora are overwhelmingly already-NFC ASCII, so the
  * common case allocates nothing and returns the input unchanged.
  */
object TextNorm {

  private val Forms: Array[Normalizer.Form] = Array(
    Normalizer.Form.NFC, Normalizer.Form.NFD,
    Normalizer.Form.NFKC, Normalizer.Form.NFKD)

  /** Index into [[Forms]] for a form name, or -1. */
  def formIndex(name: String): Int = name.toUpperCase match {
    case "NFC" => 0
    case "NFD" => 1
    case "NFKC" => 2
    case "NFKD" => 3
    case _ => -1
  }

  def normalize(text: UTF8String, form: Int): UTF8String = {
    val s = text.toString
    val f = Forms(form)
    if (Normalizer.isNormalized(s, f)) text
    else UTF8String.fromString(Normalizer.normalize(s, f))
  }
}
