package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text analysis for the documents pipeline.
  *
  * All functions are built from codegen'd `org.apache.spark.sql.functions`
  * (no UDFs) so they stay inside whole-stage codegen and are expressible in
  * the DuckDB oracle.
  *
  * Covers the reference's keyword tokenizer UDTF
  * (`util/SplitKeywordUDTF.java:19-34`, consumed via `lateral table` at
  * `app/dws/DwsTrafficSourceKeywordPageViewWindow.java:52-57`) — the
  * reference uses IKAnalyzer for Chinese segmentation, which is not
  * available offline; we use deterministic whitespace/regex tokenization
  * plus CJK-codepoint handling (documented divergence, SURVEY §7.5).
  */
object TextFunctions {

  /** Whitespace tokenizer — the UDTF-equivalent; pair with `explode`. */
  def tokens(text: Column): Column =
    split(trim(text), "\\s+")

  /** Tokenizer with CJK handling: CJK ideographs become single-character
    * tokens (space-isolated before the whitespace split), Latin text
    * tokenizes by whitespace. A deterministic stand-in for the
    * reference's IKAnalyzer segmentation (`util/SplitKeywordUDTF.java:
    * 19-34` — IK is unavailable offline; divergence documented in
    * SURVEY §7.5): unigram CJK is the standard degraded mode of CJK
    * search tokenization. */
  def tokensWithCjk(text: Column): Column =
    tokens(normalized(
      regexp_replace(text, "([\\x{4e00}-\\x{9fff}])", " $1 ")))

  /** BPE-ish sub-token split: runs of letters, runs of digits, single
    * punctuation — a deterministic stand-in for a real BPE vocab. */
  def regexTokens(text: Column): Column =
    regexp_extract_all(text, lit("[a-z]+|[A-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"), lit(0))

  /** Normalize for fingerprinting: lowercase, collapse whitespace, trim. */
  def normalized(text: Column): Column =
    trim(regexp_replace(lower(text), "\\s+", " "))

  /** Exact-dup fingerprint = md5 of normalized text (hex string).
    * Portable: DuckDB `md5(...)` produces the identical digest. */
  def fingerprint(text: Column): Column = md5(normalized(text))

  /** Bag-of-words signature: md5 over the sorted distinct token set —
    * catches docs that are permutations of the same vocabulary. */
  def bowSignature(text: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(tokens(normalized(text))))))

  /** Word-level n-gram shingles from a token-array column (NOT distinct —
    * min-hashing is duplicate-insensitive and Jaccard callers distinct at
    * the point of use, where rows are few).
    *
    * Resolves to the native codegen'd [[graft.plans.WordShingles]]
    * expression (injected by GraftExtensions); on a session without the
    * extensions it falls back to the semantics-identical zip_with chain
    * below. */
  def shinglesFromTokens(toks: Column, n: Int): Column =
    if (wordShinglesRegistered)
      call_function("word_shingles", toks, lit(n))
    else shinglesFromTokensHof(toks, n)

  private def wordShinglesRegistered: Boolean =
    org.apache.spark.sql.SparkSession.getActiveSession.exists { s =>
      try s.catalog.functionExists("word_shingles")
      catch { case _: Exception => false }
    }

  /** Builtin-only formulation of [[shinglesFromTokens]] (fallback + the
    * parity reference for `WordShinglesSpec`).
    *
    * Construction: zip_with over n shifted slices of the token array.
    * Every reference to `toks` sits OUTSIDE the lambdas — expressions
    * referenced inside a higher-order-function lambda are re-evaluated
    * PER ELEMENT (and per-element `slice` copies made the naive
    * transform-with-index formulation O(tokens²) per document, a measured
    * ~20× slowdown); the zip_with chain is O(tokens · n) with each input
    * evaluated once per row. */
  def shinglesFromTokensHof(toks: Column, n: Int): Column = {
    val cnt = size(toks) - (n - 1)
    val joined = (1 until n).foldLeft(slice(toks, lit(1), cnt)) { (acc, j) =>
      zip_with(acc, slice(toks, lit(j + 1), cnt), (a, b) => concat(a, lit(" "), b))
    }
    when(cnt <= 0, array().cast("array<string>")).otherwise(joined)
  }

  /** Language-ID by stopword evidence + script detection.
    *
    * Deterministic scorer: count occurrences of high-frequency function
    * words per language (via replace-count, identical in DuckDB) and CJK
    * codepoints; argmax with fixed tie-break order en>de>es>fr>zh.
    */
  val langStopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq(" the ", " a ", " of ", " and "),
    "de" -> Seq(" der ", " die ", " und ", " das "),
    "es" -> Seq(" el ", " la ", " de ", " que "),
    "fr" -> Seq(" le ", " la ", " et ", " les "))

  // literal (non-regex) replace — the needle is a plain string, and the
  // regex engine costs ~an NFA walk per character; `replace` is a memcmp
  // scan. Same counting formula as the DuckDB oracle's replace-based occSql.
  private def occurrences(padded: Column, needle: String): Column =
    ((length(padded) - length(call_function("replace", padded, lit(needle))))
      / needle.length).cast("long")

  def langScore(text: Column, lang: String): Column = {
    val padded = concat(lit(" "), lower(text), lit(" "))
    langStopwords(lang).map(w => occurrences(padded, w)).reduce(_ + _)
  }

  /** Count of CJK ideograph codepoints (evidence for zh). */
  def cjkCount(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[\\x{4e00}-\\x{9fff}]", ""))).cast("long")

  /** Predicted language label. */
  def langId(text: Column): Column = {
    val en = langScore(text, "en"); val de = langScore(text, "de")
    val es = langScore(text, "es"); val fr = langScore(text, "fr")
    val zh = cjkCount(text) * 3 // script evidence outweighs stopwords
    val best = greatest(en, de, es, fr, zh)
    when(best === lit(0L), lit("und"))
      .when(en === best, lit("en"))
      .when(de === best, lit("de"))
      .when(es === best, lit("es"))
      .when(fr === best, lit("fr"))
      .otherwise(lit("zh"))
  }

  /** Whitespace token count (quality features). */
  def wordCount(text: Column): Column = size(tokens(normalized(text))).cast("long")

  /** Composite document quality score in [0, 1] — C4/Gopher-style
    * heuristics: length evidence (0.5), stopword-density fluency evidence
    * (0.3), punctuation sanity (0.2). */
  def qualityScore(text: Column): Column = {
    val wc = wordCount(text)
    val sw = stopwordCount(text)
    val pc = punctCount(text)
    val chars = length(text).cast("long")
    least(wc.cast("double") / 100.0, lit(1.0)) * 0.5 +
      least(sw.cast("double") * 10.0 / wc, lit(1.0)) * 0.3 +
      when(pc * 5 <= chars, 0.2).otherwise(0.0)
  }

  /** Punctuation character count. */
  def punctCount(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[!-/:-@\\[-`{-~]", ""))).cast("long")

  /** Stopword-hit count over the combined lists (fluency evidence). */
  def stopwordCount(text: Column): Column =
    langStopwords.values.flatten.toSeq.distinct.sorted
      .map(w => occurrences(concat(lit(" "), lower(text), lit(" ")), w))
      .reduce(_ + _)
}
