package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry.FunctionBuilder
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SparkSessionExtensions hook exposing the engine's native expressions to
  * the SQL surface — the reference's "query language" is an arbitrary SQL
  * string from config (`config/data_lake_config.json:4` →
  * `scripts/...pyspark.py:113`), so extension operators belong in SQL too:
  *
  *   SELECT doc_id FROM docs WHERE simhash(text) = simhash('probe')
  *   SELECT minhash_signature(shingle_hashes(text, 3), 128, 42) FROM docs
  *   SELECT text_profile(text).lang_pred FROM docs
  *
  * Wire-up: `.config("spark.sql.extensions", "org.apache.spark.sql.graft.GraftExtensions")`
  * (GraftSession does this by default).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intArg(e: Expression, name: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$name must be an integer literal, got $other")
  }

  private def longArg(e: Expression, name: String): Long = e match {
    case Literal(v: Int, _)  => v.toLong
    case Literal(v: Long, _) => v
    case other => throw new IllegalArgumentException(
      s"$name must be a long literal, got $other")
  }

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  private def register(
      ext: SparkSessionExtensions,
      name: String,
      usage: String,
      builder: FunctionBuilder): Unit =
    ext.injectFunction((FunctionIdentifier(name), info(name, usage), builder))

  override def apply(ext: SparkSessionExtensions): Unit = {
    register(ext, "shingle_hashes",
      "shingle_hashes(text, w) - distinct w-word-shingle xxhash64 array", {
        case Seq(text, w) => ShingleHashesExpr(text, intArg(w, "w"))
        case Seq(text)    => ShingleHashesExpr(text, 3)
        case args => throw new IllegalArgumentException(
          s"shingle_hashes expects (text[, w]), got ${args.length} args")
      })

    register(ext, "minhash_signature",
      "minhash_signature(shingles, k, seed) - k-permutation MinHash signature", {
        case Seq(sh, k, seed) => MinHashSignatureExpr(sh, intArg(k, "k"), longArg(seed, "seed"))
        case Seq(sh, k)       => MinHashSignatureExpr(sh, intArg(k, "k"), 42L)
        case Seq(sh)          => MinHashSignatureExpr(sh, 128, 42L)
        case args => throw new IllegalArgumentException(
          s"minhash_signature expects (shingles[, k[, seed]]), got ${args.length} args")
      })

    register(ext, "oneperm_signature",
      "oneperm_signature(shingles, k, seed) - one-permutation MinHash signature " +
        "with rotation densification (O(n + k) per row; values are NOT " +
        "compatible with minhash_signature's)", {
        case Seq(sh, k, seed) => OnePermSignatureExpr(sh, intArg(k, "k"), longArg(seed, "seed"))
        case Seq(sh, k)       => OnePermSignatureExpr(sh, intArg(k, "k"), 42L)
        case Seq(sh)          => OnePermSignatureExpr(sh, 128, 42L)
        case args => throw new IllegalArgumentException(
          s"oneperm_signature expects (shingles[, k[, seed]]), got ${args.length} args")
      })

    register(ext, "one_bit_minhash",
      "one_bit_minhash(sig) - low bit of each signature component packed " +
        "into k/64 longs (Li-Konig b-bit minhash, b = 1)", {
        case Seq(sig) => OneBitMinHashExpr(sig)
        case args => throw new IllegalArgumentException(
          s"one_bit_minhash expects (sig), got ${args.length} args")
      })

    register(ext, "simhash",
      "simhash(text) - 64-bit SimHash fingerprint", {
        case Seq(text) => SimHashExpr(text)
        case args => throw new IllegalArgumentException(
          s"simhash expects (text), got ${args.length} args")
      })

    register(ext, "simhash_md5",
      "simhash_md5(text) - cross-engine SimHash fingerprint as [fp_hi, fp_lo] 32-bit halves", {
        case Seq(text) => SimHashMd5Expr(text)
        case args => throw new IllegalArgumentException(
          s"simhash_md5 expects (text), got ${args.length} args")
      })

    register(ext, "frequent_items",
      "frequent_items(col, k) - Misra-Gries heavy-hitter sketch of a STRING column " +
        "as map<item, weight> (no false negatives above n/(k+1))", {
        case Seq(child, kExpr) =>
          val k = intArg(kExpr, "k")
          val uda = org.apache.spark.sql.functions.udaf(new graft.functions.MisraGries(k))
            .asInstanceOf[org.apache.spark.sql.expressions.UserDefinedAggregator[String, Map[String, Long], Map[String, Long]]]
          org.apache.spark.sql.execution.aggregate.ScalaAggregator(uda, Seq(child))
            .toAggregateExpression()
        case args => throw new IllegalArgumentException(
          s"frequent_items expects (col, k), got ${args.length} args")
      })

    register(ext, "text_profile",
      "text_profile(text) - struct(n_tokens, n_subwords, stopword_ratio, quality, lang_pred, fingerprint)", {
        case Seq(text) => TextProfileExpr(text)
        case args => throw new IllegalArgumentException(
          s"text_profile expects (text), got ${args.length} args")
      })

    register(ext, "cosine_sim",
      "cosine_sim(a, b) - cosine similarity of two float/double vectors", {
        case Seq(a, b) => CosineSimExpr(a, b)
        case args => throw new IllegalArgumentException(
          s"cosine_sim expects (a, b), got ${args.length} args")
      })

    register(ext, "l2_sq",
      "l2_sq(a, b) - squared euclidean distance of two float/double vectors", {
        case Seq(a, b) => L2SqExpr(a, b)
        case args => throw new IllegalArgumentException(
          s"l2_sq expects (a, b), got ${args.length} args")
      })

    register(ext, "lev_within",
      "lev_within(a, b, cap) - levenshtein distance when <= cap (banded DP, " +
        "per-ROW cap expression), -1 when provably greater", {
        case Seq(a, b, cap) => LevWithinExpr(a, b, cap)
        case args => throw new IllegalArgumentException(
          s"lev_within expects (a, b, cap), got ${args.length} args")
      })

    // The KMV bottom-k sketch is a typed Aggregator, not a row Expression:
    // SQL exposure goes through ScalaAggregator (the same bridge
    // `udf.register(name, udaf(...))` uses), whose partial-merge contract
    // gives map-side combine for free in GROUP BY plans.
    register(ext, "bottom_k",
      "bottom_k(col, k) - KMV sketch: the k smallest xxhash64 values of a LONG column " +
        "(deterministic distinct sample + distinct-count estimator)", {
        case Seq(child, kExpr) =>
          val k = intArg(kExpr, "k")
          val uda = org.apache.spark.sql.functions.udaf(new graft.functions.BottomKSketch(k))
            .asInstanceOf[org.apache.spark.sql.expressions.UserDefinedAggregator[Long, Array[Long], Array[Long]]]
          org.apache.spark.sql.execution.aggregate.ScalaAggregator(uda, Seq(child))
            .toAggregateExpression()
        case args => throw new IllegalArgumentException(
          s"bottom_k expects (col, k), got ${args.length} args")
      })

    register(ext, "quant_dot",
      "quant_dot(vec, comp, scale) - fixed-point dot product: " +
        "sum(floor(vec[i]*scale) * comp[i]) with comp an ARRAY<DOUBLE> literal " +
        "(bit-deterministic projection kernel; graft.operators.Embeddings)", {
        case Seq(v, comp, scaleE) =>
          val compArr = if (comp.foldable) comp.eval() match {
            case a: org.apache.spark.sql.catalyst.util.ArrayData => a.toDoubleArray()
            case other => throw new IllegalArgumentException(
              s"quant_dot: comp must be an array<double> literal, got $other")
          } else throw new IllegalArgumentException(
            "quant_dot: comp must be a foldable array literal")
          val scale = if (scaleE.foldable) scaleE.eval() match {
            case d: org.apache.spark.sql.types.Decimal => d.toDouble
            case n: java.lang.Number => n.doubleValue()
            case other => throw new IllegalArgumentException(
              s"quant_dot: scale must be a numeric literal, got $other")
          } else throw new IllegalArgumentException(
            "quant_dot: scale must be a foldable numeric literal")
          QuantDotExpr(v, compArr, scale)
        case args => throw new IllegalArgumentException(
          s"quant_dot expects (vec, comp, scale), got ${args.length} args")
      })

    register(ext, "vec_moments",
      "vec_moments(vec, dim, bits) - exact fixed-point moments of an ARRAY<DOUBLE> " +
        "column in one pass: struct(n, sums ARRAY<BIGINT>, gram ARRAY<BIGINT> upper-tri) " +
        "of the quantized vectors floor(x*2^bits) (mean/covariance sufficient statistics, " +
        "order- and merge-independent; graft.operators.Embeddings)", {
        case Seq(child, dimExpr, bitsExpr) =>
          val dim = intArg(dimExpr, "dim")
          val bits = intArg(bitsExpr, "bits")
          val uda = org.apache.spark.sql.functions.udaf(new graft.functions.VectorMoments(dim, bits))
            .asInstanceOf[org.apache.spark.sql.expressions.UserDefinedAggregator[Seq[Double], Array[Long], graft.functions.VectorMomentsState]]
          org.apache.spark.sql.execution.aggregate.ScalaAggregator(uda, Seq(child))
            .toAggregateExpression()
        case args => throw new IllegalArgumentException(
          s"vec_moments expects (vec, dim, bits), got ${args.length} args")
      })

    register(ext, "cms_sketch",
      "cms_sketch(col, depth, width) - Count-Min sketch of a STRING column as a " +
        "flat depth*width LONG grid (row j cell = md5(j||':'||item) first-32-bits % width; " +
        "estimate = min over rows, one-sided error <= eps*n)", {
        case Seq(child, dExpr, wExpr) =>
          val d = intArg(dExpr, "depth")
          val w = intArg(wExpr, "width")
          val uda = org.apache.spark.sql.functions.udaf(new graft.functions.CountMin(d, w))
            .asInstanceOf[org.apache.spark.sql.expressions.UserDefinedAggregator[String, Array[Long], Array[Long]]]
          org.apache.spark.sql.execution.aggregate.ScalaAggregator(uda, Seq(child))
            .toAggregateExpression()
        case args => throw new IllegalArgumentException(
          s"cms_sketch expects (col, depth, width), got ${args.length} args")
      })

    // Column-composition operators exposed to SQL through the
    // Column↔Expression bridge: the SQL surface gets exactly the same
    // expression tree the Scala API builds (regexp chains, HOF chunking
    // math), so there is one semantics to test, not two. The node
    // converter (not ExpressionUtils.expression) is required: the latter
    // defers conversion inside a ColumnNodeExpression wrapper, which the
    // analyzer never unwraps when returned from a function builder.
    import org.apache.spark.sql.classic.ExpressionUtils.column
    def expression(c: org.apache.spark.sql.Column): Expression =
      org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)
    register(ext, "redact_pii",
      "redact_pii(text) - emails/SSNs/phones/IPv4 replaced with typed placeholders", {
        case Seq(text) =>
          expression(graft.operators.TextAnalysis.redactPii(column(text)))
        case args => throw new IllegalArgumentException(
          s"redact_pii expects (text), got ${args.length} args")
      })

    register(ext, "repetition_ratio",
      "repetition_ratio(text, n) - fraction of word n-grams repeating an earlier n-gram", {
        case Seq(text, n) => RepetitionRatioExpr(text, intArg(n, "n"))
        case Seq(text)    => RepetitionRatioExpr(text, 3)
        case args => throw new IllegalArgumentException(
          s"repetition_ratio expects (text[, n]), got ${args.length} args")
      })

    register(ext, "md5_fingerprint",
      "md5_fingerprint(text) - md5 of the normalized text (cross-engine dedup ledger key)", {
        case Seq(text) =>
          expression(graft.operators.TextAnalysis.md5Fingerprint(column(text)))
        case args => throw new IllegalArgumentException(
          s"md5_fingerprint expects (text), got ${args.length} args")
      })

    register(ext, "html_text",
      "html_text(html) - main text of an HTML page (block-segmented link-density boilerplate removal)", {
        case Seq(html) =>
          expression(graft.operators.HtmlText.extractText(column(html)))
        case args => throw new IllegalArgumentException(
          s"html_text expects (html), got ${args.length} args")
      })

    register(ext, "html_links",
      "html_links(html) - quoted href values of <a> tags, in document order", {
        case Seq(html) =>
          expression(graft.operators.HtmlText.extractLinks(column(html)))
        case args => throw new IllegalArgumentException(
          s"html_links expects (html), got ${args.length} args")
      })

    register(ext, "resolve_href",
      "resolve_href(base_url, href) - absolute URL per the crawler RFC 3986 subset; " +
        "fragments and mailto/javascript/tel/data resolve NULL", {
        case Seq(base, href) =>
          expression(graft.operators.WebOps.resolveHref(column(base), column(href)))
        case args => throw new IllegalArgumentException(
          s"resolve_href expects (base_url, href), got ${args.length} args")
      })

    register(ext, "html_title",
      "html_title(html) - visible text of the page title ('' when absent)", {
        case Seq(html) =>
          expression(graft.operators.HtmlText.extractTitle(column(html)))
        case args => throw new IllegalArgumentException(
          s"html_title expects (html), got ${args.length} args")
      })

    register(ext, "luhn_valid",
      "luhn_valid(candidate) - mod-10 checksum validity of a 13-19-digit card candidate", {
        case Seq(c) =>
          expression(graft.operators.TextAnalysis.luhnValid(column(c)))
        case args => throw new IllegalArgumentException(
          s"luhn_valid expects (candidate), got ${args.length} args")
      })

    register(ext, "redact_cards",
      "redact_cards(text) - Luhn-VALID card numbers replaced with <CARD>", {
        case Seq(text) =>
          expression(graft.operators.TextAnalysis.redactCards(column(text)))
        case args => throw new IllegalArgumentException(
          s"redact_cards expects (text), got ${args.length} args")
      })

    register(ext, "encoding_noise",
      "encoding_noise(text) - mojibake artifact count per 1000 chars (0 for clean text)", {
        case Seq(text) =>
          expression(graft.operators.TextAnalysis.encodingNoiseScore(column(text)))
        case args => throw new IllegalArgumentException(
          s"encoding_noise expects (text), got ${args.length} args")
      })

    register(ext, "winnow_md5",
      "winnow_md5(text, k, w) - distinct MOSS winnowing fingerprints (md5 char k-grams, window w)", {
        case Seq(text, k, w) => WinnowMd5Expr(text, intArg(k, "k"), intArg(w, "w"))
        case Seq(text)       => WinnowMd5Expr(text, 20, 8)
        case args => throw new IllegalArgumentException(
          s"winnow_md5 expects (text[, k, w]), got ${args.length} args")
      })

    register(ext, "band_hashes",
      "band_hashes(signature, bands) - LSH band hashes of a MinHash signature", {
        case Seq(sig, bands) => BandHashesExpr(sig, intArg(bands, "bands"))
        case args => throw new IllegalArgumentException(
          s"band_hashes expects (signature, bands), got ${args.length} args")
      })

    register(ext, "gopher_signals",
      "gopher_signals(text) - struct of Gopher quality counters (word_count, alpha_words, " +
        "hash_chars, ellipses, top2/3/4_chars, dup5_chars, word_chars)", {
        case Seq(text) => GopherSignalsExpr(text)
        case args => throw new IllegalArgumentException(
          s"gopher_signals expects (text), got ${args.length} args")
      })

    register(ext, "phash",
      "phash(image_bytes) - 64-bit DCT perceptual hash; NULL for undecodable bytes", {
        case Seq(bytes) => PHashExpr(bytes)
        case args => throw new IllegalArgumentException(
          s"phash expects (image_bytes), got ${args.length} args")
      })

    register(ext, "hyperplane_sig",
      "hyperplane_sig(vec, dim, n_planes, seed) - random-hyperplane LSH signature " +
        "(seeded plane set, same generator as embeddingNearDups)", {
        case Seq(vec, dim, nPlanes, seed) =>
          val planes = graft.functions.VectorFunctions.randomPlanes(
            intArg(dim, "dim"), intArg(nPlanes, "n_planes"), longArg(seed, "seed"))
          expression(NativeExprs.hyperplaneSig(column(vec), planes))
        case Seq(vec, dim, nPlanes) =>
          val planes = graft.functions.VectorFunctions.randomPlanes(
            intArg(dim, "dim"), intArg(nPlanes, "n_planes"), 42L)
          expression(NativeExprs.hyperplaneSig(column(vec), planes))
        case args => throw new IllegalArgumentException(
          s"hyperplane_sig expects (vec, dim, n_planes[, seed]), got ${args.length} args")
      })

    register(ext, "top_k_by_score",
      "top_k_by_score(id, score, k) - bounded top-k aggregate: array<struct<id,score>> of the " +
        "k highest-scored rows per group (map-side combinable; (score desc, id asc) order)", {
        case Seq(id, score, kExpr) =>
          val k = intArg(kExpr, "k")
          val uda = org.apache.spark.sql.functions.udaf(new graft.functions.TopKByScore(k))
            .asInstanceOf[org.apache.spark.sql.expressions.UserDefinedAggregator[
              graft.functions.Scored, Array[graft.functions.Scored], Array[graft.functions.Scored]]]
          org.apache.spark.sql.execution.aggregate.ScalaAggregator(uda, Seq(id, score))
            .toAggregateExpression()
        case args => throw new IllegalArgumentException(
          s"top_k_by_score expects (id, score, k), got ${args.length} args")
      })

    register(ext, "bloom_sketch",
      "bloom_sketch(col, num_bits[, num_hashes]) - mergeable bloom bitset aggregate of a " +
        "STRING column as array<bigint> (probe with graft.functions.BloomSketch.mightContain)", {
        case args if args.length == 2 || args.length == 3 =>
          val bits = intArg(args(1), "num_bits")
          val hashes = if (args.length == 3) intArg(args(2), "num_hashes") else 7
          val uda = org.apache.spark.sql.functions.udaf(new graft.functions.BloomSketch(bits, hashes))
            .asInstanceOf[org.apache.spark.sql.expressions.UserDefinedAggregator[String, Array[Long], Array[Long]]]
          org.apache.spark.sql.execution.aggregate.ScalaAggregator(uda, Seq(args.head))
            .toAggregateExpression()
        case args => throw new IllegalArgumentException(
          s"bloom_sketch expects (col, num_bits[, num_hashes]), got ${args.length} args")
      })

    register(ext, "unicode_normalize",
      "unicode_normalize(text[, 'NFC'|'NFD'|'NFKC'|'NFKD']) - UAX #15 normalization " +
        "(default NFC; the canonicalization pass before fingerprinting)", {
        case Seq(text, formExpr) =>
          val name = formExpr match {
            case Literal(s: org.apache.spark.unsafe.types.UTF8String, _) => s.toString
            case other => throw new IllegalArgumentException(
              s"unicode_normalize form must be a string literal, got $other")
          }
          val idx = graft.functions.TextNorm.formIndex(name)
          if (idx < 0) throw new IllegalArgumentException(
            s"unknown normalization form '$name' (NFC/NFD/NFKC/NFKD)")
          UnicodeNormalizeExpr(text, idx)
        case Seq(text) => UnicodeNormalizeExpr(text, 0)
        case args => throw new IllegalArgumentException(
          s"unicode_normalize expects (text[, form]), got ${args.length} args")
      })

    register(ext, "script_profile",
      "script_profile(text) - one-pass Unicode-script counters " +
        "(latin/cyrillic/greek/arabic/cjk/digit/space/other; disjoint, " +
        "sum to code-point length) as a struct", {
        case Seq(text) => ScriptProfileExpr(text)
        case args => throw new IllegalArgumentException(
          s"script_profile expects (text), got ${args.length} args")
      })

    register(ext, "fix_mojibake",
      "fix_mojibake(text) - repair UTF-8-decoded-as-cp1252 ghost runs " +
        "(segment-wise inverse-map + strict re-decode; ASCII untouched)", {
        case Seq(text) => FixMojibakeExpr(text)
        case args => throw new IllegalArgumentException(
          s"fix_mojibake expects (text), got ${args.length} args")
      })

    // ---------------------------------------------------- named models
    // Trained state (BPE merge ranks, NB micro-model, char-ngram LM) is
    // a broadcast closure, not a literal — the SQL surface reaches it
    // by NAME through GraftModels (registered via Bpe.registerSql /
    // Classify.registerSql / TextAnalysis.registerLmSql). Resolution
    // happens at analysis time and splices in the exact expression tree
    // the Scala API builds: one semantics per kernel.
    def modelFn(sqlName: String, kind: String): FunctionBuilder = {
      case Seq(text, nameExpr) =>
        val name = nameExpr match {
          case Literal(s: org.apache.spark.unsafe.types.UTF8String, _) => s.toString
          case other => throw new IllegalArgumentException(
            s"$sqlName model name must be a string literal, got $other")
        }
        expression(graft.functions.GraftModels.resolve(name, kind)(column(text)))
      case args => throw new IllegalArgumentException(
        s"$sqlName expects (text, 'model_name'), got ${args.length} args")
    }

    register(ext, "bpe_encode",
      "bpe_encode(text, 'model') - greedy-by-priority BPE subword encoding under a " +
        "registered merge-rank model (Bpe.registerSql)",
      modelFn("bpe_encode", "bpe"))

    register(ext, "bpe_encode_ids",
      "bpe_encode_ids(text, 'model') - BPE token-id array under a registered " +
        "merge-rank model + vocabulary (Bpe.registerIdsSql); OOV subwords -> -1",
      modelFn("bpe_encode_ids", "bpe_ids"))

    register(ext, "bpe_decode",
      "bpe_decode(ids, 'model') - detokenize a BPE token-id array back to " +
        "tokenizer-normalized text (Bpe.registerIdsSql); UNK ids drop",
      modelFn("bpe_decode", "bpe_decode"))

    register(ext, "unigram_encode",
      "unigram_encode(text, 'model') - max-log-prob Viterbi subword encoding under a " +
        "registered unigram-LM piece table (Unigram.registerSql)",
      modelFn("unigram_encode", "unigram"))

    register(ext, "unigram_encode_ids",
      "unigram_encode_ids(text, 'model') - unigram token-id array under a registered " +
        "piece table + vocabulary (Unigram.registerIdsSql); OOV pieces -> -1",
      modelFn("unigram_encode_ids", "unigram_ids"))

    register(ext, "unigram_decode",
      "unigram_decode(ids, 'model') - detokenize a unigram token-id array back to " +
        "tokenizer-normalized text (Unigram.registerIdsSql); UNK ids drop",
      modelFn("unigram_decode", "unigram_decode"))

    register(ext, "nb_score",
      "nb_score(text, 'model') - struct(pred, score) under a registered Naive Bayes " +
        "micro-model (Classify.registerSql)",
      modelFn("nb_score", "nb"))

    register(ext, "lm_score",
      "lm_score(text, 'model') - avg char-ngram log-prob under a registered LM " +
        "(TextAnalysis.registerLmSql)",
      modelFn("lm_score", "lm"))
  }
}
