package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared text-normalization building blocks for the dedup / text-analysis
  * operator families. Every definition here has an exact DuckDB-SQL
  * counterpart (used in the oracle queries), so outputs are engine-exact:
  * same normalization, same tokenizer regex, same shingling, same
  * md5-based hashing.
  */
object TextPrep {

  /** lower + trim. */
  def norm(text: Column): Column = lower(trim(text))

  /** Whitespace-collapsed canonical form (for fingerprints). */
  def canonical(text: Column): Column =
    regexp_replace(norm(text), "\\s+", " ")

  /** Whitespace tokens of the normalized text. */
  def tokens(text: Column): Column = split(norm(text), "\\s+")

  /** Distinct word n-gram shingles (default 3), space-joined — the unit of
    * near-duplicate detection.
    *
    * Formulated as zip_with over n shifted slices rather than
    * transform(sequence)(element_at): a lambda body re-evaluates free
    * subexpressions per ELEMENT, so indexing into the un-materialized
    * `split` re-ran the regex O(tokens²) times per row (~2 ms/doc — 11 s
    * just to shingle sf0.1). Slices reference the split a constant number
    * of times per ROW. Short docs fall out naturally: slice length ≤ 0 →
    * empty arrays → empty zip. */
  def shingles(text: Column, n: Int = 3): Column = {
    val t = tokens(text)
    val len = greatest(size(t) - (n - 1), lit(0))
    val parts = (0 until n).map(k => slice(t, lit(k + 1), len))
    array_distinct(parts.reduce((acc, p) =>
      zip_with(acc, p, (a, b) => concat(a, lit(" "), b))))
  }

  /** Seeded 64-bit-ish minhash primitive: lexicographic min over shingles
    * of the first 16 hex chars of md5(seed || '|' || shingle). Fixed-width
    * lowercase hex makes string-min equal numeric-min, which keeps the
    * DuckDB oracle expressible without hex→int conversion. */
  def minhashAgg(shingleCol: Column, seed: Int): Column =
    min(substring(md5(concat(lit(s"$seed|"), shingleCol)), 1, 16))
}
