package graft.extensions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared text primitives for the LLM-data-pipeline operators. Everything is
  * built from codegen'd built-ins (`split`, `transform`, `aggregate`, `md5`)
  * — no UDFs — so these stay inside whole-stage codegen over the scan and
  * scale linearly at 100 TB.
  *
  * Tokenization contract (mirrored by every DuckDB oracle):
  * lowercase, split on `\s+`.
  */
object TextOps {

  /** Whitespace tokens of the lowercased text.
    *
    * Formulated as normalize-then-split (both codegen'd natives) rather than
    * `filter(split(lower(text), "\\s+"), len > 0)`: higher-order functions
    * are interpreted (no doGenCode), and the HOF filter measured ~10× slower
    * at sf0.1. Semantics are identical — collapsing `\s+` runs to one space
    * and splitting on it yields exactly the non-empty tokens, in order; the
    * empty/whitespace-only guard mirrors the HOF's empty-array result, and
    * NULL text yields NULL (SQL null propagation, like the HOF form and the
    * DuckDB oracles' string_split_regex — without the explicit first branch
    * the `otherwise` would silently coerce NULL to an empty array).
    */
  def tokens(text: Column): Column = {
    val norm = trim(regexp_replace(lower(text), "\\s+", " "))
    when(text.isNull, lit(null).cast("array<string>"))
      .when(length(norm) > 0, split(norm, " "))
      .otherwise(array().cast("array<string>"))
  }

  /** Word k-shingles (k=3): `toks[i] ++ " " ++ toks[i+1] ++ " " ++ toks[i+2]`.
    * Empty array when fewer than 3 tokens.
    *
    * Built from three `slice`s zipped element-wise. The naive
    * `transform(sequence(0, n-3), i -> concat_ws(element_at(toks, i+1), ...))`
    * re-evaluates the lambda-external `toks` expression PER ELEMENT (HOF
    * lambda bodies inline their captured expressions) — with `toks` a regex
    * split, that is O(tokens²) regex work per document; the zip form
    * evaluates each slice once per row (measured 14× faster at sf0.1).
    */
  def shingles3(toks: Column): Column = {
    val n3 = size(toks) - 2
    val zipped = arrays_zip(
      slice(toks, lit(1), n3), slice(toks, lit(2), n3), slice(toks, lit(3), n3))
    when(size(toks) >= 3,
      transform(zipped, s =>
        concat_ws(" ", s.getField("0"), s.getField("1"), s.getField("2"))))
      .otherwise(array().cast("array<string>"))
  }

  /** Word 2-shingles (bigrams): `toks[i] ++ " " ++ toks[i+1]`. Empty array
    * when fewer than 2 tokens. Same zipped-slice form as [[shingles3]] (the
    * lambda touches only its own variable — no captured-expr recompute).
    */
  def shingles2(toks: Column): Column = {
    val n2 = size(toks) - 1
    val zipped = arrays_zip(slice(toks, lit(1), n2), slice(toks, lit(2), n2))
    when(size(toks) >= 2,
      transform(zipped, s => concat_ws(" ", s.getField("0"), s.getField("1"))))
      .otherwise(array().cast("array<string>"))
  }

  /** Whitespace-normalized lowercase text (for content fingerprints). */
  def normalized(text: Column): Column =
    trim(regexp_replace(lower(text), "\\s+", " "))

  // NOTE: the minhash / simhash FORMULAS (md5("k:" ++ shingle) min; ±1 votes
  // from md5 hex-nibble high bits) live in Dedup.minhashSignatures and
  // Dedup.simhashes as explode+aggregate pipelines — the array-shaped HOF
  // helpers that used to sit here were deleted when those rewrites landed
  // (two divergent copies of an oracle-mirrored formula is a hazard).

  /** Per-language stopword marker sets for the n-gram/stopword language-ID
    * heuristic (public common function words).
    */
  val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "and", "of", "to", "in", "is", "it", "for", "on"),
    "es" -> Seq("el", "la", "de", "que", "y", "los", "las", "un", "una", "en"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "eine", "nicht", "mit", "zu"),
    "fr" -> Seq("le", "la", "les", "et", "des", "une", "est", "dans", "que", "pour"),
    "zh" -> Seq("de5", "shi4", "bu4", "le5", "wo3", "zai4", "you3", "ta1", "men5", "zhe4"))

  /** English stopwords used by the quality score. */
  val enStopwords: Seq[String] = langMarkers("en")

  /** Count of tokens that appear in `words` — the native codegen'd
    * [[graft.functions.MarkerHits]] with one set (the HOF form
    * `size(filter(toks, isin(words)))` it replaces is CodegenFallback —
    * interpreted per element; identical semantics including null array →
    * null and null elements counting as no-hit).
    */
  def markerHits(toks: Column, words: Seq[String]): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      graft.functions.MarkerHits(
        org.apache.spark.sql.GraftColumnBridge.expression(toks),
        Seq(words))).getItem(0)
}
