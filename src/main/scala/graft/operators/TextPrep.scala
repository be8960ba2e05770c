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
    * near-duplicate detection. Guarded for short docs. */
  def shingles(text: Column, n: Int = 3): Column = {
    val t = tokens(text)
    when(size(t) >= n,
      array_distinct(transform(sequence(lit(0), size(t) - n), i =>
        concat_ws(" ", (0 until n).map(k => element_at(t, i + k + 1)): _*))))
      .otherwise(array().cast("array<string>"))
  }

  /** Seeded 64-bit-ish minhash primitive: lexicographic min over shingles
    * of the first 16 hex chars of md5(seed || '|' || shingle). Fixed-width
    * lowercase hex makes string-min equal numeric-min, which keeps the
    * DuckDB oracle expressible without hex→int conversion. */
  def minhashAgg(shingleCol: Column, seed: Int): Column =
    min(substring(md5(concat(lit(s"$seed|"), shingleCol)), 1, 16))
}
