package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text column builders shared by the dedup (D) and text-analysis (F)
  * blocks. All pure `Column` expressions over built-in functions —
  * whole-stage-codegen friendly, no UDFs — and each has an exact
  * DuckDB mirror used by the oracle SQL (same normalization regex,
  * same operand order), so results are bit-identical cross-engine.
  */
object TextFunctions {

  /** Normalize + tokenize: lowercase, every non-alphanumeric run → one
    * space, trim, split on single space, drop empties (split of an
    * empty normalized string yields one empty token).
    * DuckDB mirror: `list_filter(string_split(trim(regexp_replace(
    * lower(t),'[^a-z0-9]+',' ','g')),' '), x -> len(x) > 0)` — the
    * filter matters: without it an all-punctuation text is [''] (wc 1)
    * in DuckDB vs [] (wc 0) here.
    */
  def tokens(text: Column): Column = {
    val norm = trim(regexp_replace(lower(text), "[^a-z0-9]+", " "))
    filter(split(norm, " "), t => length(t) > 0)
  }

  /** Canonical normalized string (tokens re-joined with single spaces)
    * — the content fingerprint input. */
  def normalized(text: Column): Column = array_join(tokens(text), " ")

  /** Word 3-gram shingles over the token array; empty for <3 tokens.
    * DuckDB mirror: `list_transform(range(1, len(t)-1), i -> ...)`
    * (1-based; empty range when too short).
    */
  def grams3(toks: Column): Column =
    when(size(toks) >= 3,
      transform(sequence(lit(0), size(toks) - 3), i =>
        concat_ws(" ",
          element_at(toks, i + 1),
          element_at(toks, i + 2),
          element_at(toks, i + 3))))
      .otherwise(array().cast("array<string>"))

  /** Count of tokens hitting a fixed stopword list (with multiplicity —
    * `array_intersect` would dedup, so `filter` + `size` instead). */
  def stopwordHits(toks: Column, stopwords: Seq[String]): Column =
    size(filter(toks, t => t.isin(stopwords: _*)))
}
