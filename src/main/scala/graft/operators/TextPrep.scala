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

  /** The C4/CCNet-style canonical dedup key (d22) — the full ladder rung
    * above NFC alone: NFC canonical normalization, casefold, ASCII
    * punctuation runs to a single space, whitespace collapse, trim. The
    * punctuation class is the explicit ASCII range set `!-/ :-@ [-\x60
    * {-~` (never `\p{Punct}`/POSIX classes, whose membership differs
    * between Java regex and DuckDB's RE2); case/whitespace/punctuation
    * variants — the most common near-exact web duplicates — then share
    * one key. DuckDB oracle: the same composition over `nfc_normalize`
    * + `lower` + two `regexp_replace(..., 'g')`. */
  def canonicalKey(text: Column): Column =
    canonicalKeyOfNfc(graft.functions.NfcNormalize.nfc_normalize(text))

  /** [[canonicalKey]] over an ALREADY-NFC-normalized column — for
    * callers that also need the NFC form itself (d22 counts NFC
    * variants per group), so the normalizer runs once per row, not
    * twice. */
  def canonicalKeyOfNfc(nfc: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(nfc), "[!-/:-@\\[-`{-~]+", " "),
      "\\s+", " "))

  /** The d24 template-skeleton key: every ASCII alphanumeric run becomes
    * one `#` marker, whitespace runs collapse — only the document's
    * punctuation/layout structure survives, so documents generated from
    * one boilerplate template share a key while every canonical-ladder
    * key still differs. Explicit ASCII classes (the [[canonicalKey]]
    * Java↔RE2 parity rule). */
  def skeletonKey(text: Column): Column =
    trim(regexp_replace(regexp_replace(text,
      "[0-9A-Za-z]+", "#"), "\\s+", " "))

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

  /** 32-bit base hash of a shingle: first 8 hex chars of its md5 as a
    * BIGINT. Computed ONCE per shingle; the K minhash functions derive
    * from it with cheap integer mixing (below) instead of K separate md5
    * passes — the dominant cost of signature computation at scale. */
  def shingleBase(shingleCol: Column): Column =
    conv(substring(md5(shingleCol), 1, 8), 16, 10).cast("long")

  /** Modulus of the universal hash family (smallest prime > 2^32). */
  val MinhashP: Long = 4294967311L

  private[graft] def md5hex(x: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** JVM-side mirror of [[tokens]] — ONE definition for every streaming
    * processor's plain-Scala tokenizer, matching the column expression
    * EXACTLY where java.lang.String's conveniences silently differ:
    * Spark's `trim` strips SPACES only (String.trim strips all code
    * points ≤ U+0020 — tabs and newlines), and Spark's `split` keeps
    * trailing empty tokens (String.split drops them without limit -1).
    * `Locale.ROOT` because the default-locale toLowerCase diverges from
    * Spark's locale-independent lower() (Turkish dotless-i). */
  private[graft] def jvmTokens(text: String): Seq[String] =
    text.dropWhile(_ == ' ').reverse.dropWhile(_ == ' ').reverse
      .toLowerCase(java.util.Locale.ROOT).split("\\s+", -1).toSeq

  /** Multiplier for seed j: odd, < 2^29 (so a·base < 2^61 — no overflow
    * under ANSI arithmetic in either engine). Derived from md5 so both
    * the engine and the DuckDB oracle can reproduce it. */
  def mixA(j: Int): Long =
    java.lang.Long.parseLong(md5hex("a" + j).take(7), 16) * 2 + 1

  /** Offset for seed j, < 2^32. */
  def mixB(j: Int): Long = java.lang.Long.parseLong(md5hex("b" + j).take(8), 16)

  /** Seeded minhash primitive over pre-hashed shingles: the textbook
    * universal family h_j(x) = (a_j·x + b_j) mod p applied to
    * [[shingleBase]]. One md5 per shingle total, K cheap integer mixes —
    * versus the naive K md5 passes. */
  def minhashAgg(baseCol: Column, seed: Int): Column =
    min((lit(mixA(seed)) * baseCol + lit(mixB(seed))) % MinhashP)
}
