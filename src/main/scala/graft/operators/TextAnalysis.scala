package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Text-analysis operators over `documents` (north-star surface):
  * language ID, quality scoring, token counting, fingerprinting. All
  * integer-count based with double math only at the boundary — DuckDB
  * oracle-exact. Each is explode → aggregate: linear work, shuffles keyed
  * by doc_id, no driver loops.
  */
object TextAnalysis {
  import TextPrep._

  /** Marker-word profiles per language (tiny, broadcast). Real systems use
    * char-n-gram models; the operator shape (score per (doc, lang) →
    * argmax with deterministic tie-break) is the same. */
  val markers: Seq[(String, String)] = Seq(
    "en" -> "the", "en" -> "a", "en" -> "of", "en" -> "and", "en" -> "is",
    "es" -> "el", "es" -> "la", "es" -> "los", "es" -> "de", "es" -> "y",
    "de" -> "der", "de" -> "die", "de" -> "das", "de" -> "und", "de" -> "ist",
    "fr" -> "le", "fr" -> "la", "fr" -> "les", "fr" -> "de", "fr" -> "et",
    "zh" -> "的", "zh" -> "是", "zh" -> "在", "zh" -> "了", "zh" -> "和")

  val stopwordsEn: Seq[String] = Seq("the", "a", "of", "and", "is", "to", "in")

  // --- language ID ---------------------------------------------------------
  def langId(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.table(s, dir, "documents")
    val m = markers.toDF("lang", "word")
    val langs = markers.map(_._1).distinct.sorted
    // Single aggregation pass: a LEFT broadcast join tags every token with
    // its marker language (or null), one groupBy(doc_id) builds all
    // per-language counts as conditional sums, and the argmax (score desc,
    // lang asc on ties — zero-hit docs included, every doc has ≥1 token)
    // is a driver-free struct sort. 2 shuffles total where the
    // grid + left-join + ranking-window shape needed 5.
    val toks = docs.select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
    val cnts = langs.map(l =>
      sum(when(col("lang") === l, 1L).otherwise(0L)).as(s"c_$l"))
    val counts = toks.join(broadcast(m), col("tok") === col("word"), "left")
      .groupBy("doc_id").agg(cnts.head, cnts.tail: _*)
    val best = sort_array(array(langs.map(l => struct(
      (-col(s"c_$l")).as("neg"), lit(l).as("lang"), col(s"c_$l").as("score"))): _*))
      .getItem(0)
    counts.select(col("doc_id"), best.getField("lang").as("pred_lang"),
        best.getField("score").as("score"))
  }

  // --- quality scoring -----------------------------------------------------
  def quality(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.table(s, dir, "documents")
    val toks = docs.select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
    val stats = toks.groupBy("doc_id").agg(
      count(lit(1)).as("n_tokens"),
      countDistinct(col("tok")).as("n_distinct"),
      sum(length(col("tok"))).as("token_chars"),
      sum(when(col("tok").isInCollection(stopwordsEn), 1L).otherwise(0L))
        .as("stop_hits"))
    docs.select(col("doc_id"), length(col("text")).as("n_chars"))
      .join(stats, "doc_id")
      .select(col("doc_id"), col("n_chars"), col("n_tokens"), col("n_distinct"),
        (col("token_chars").cast(DoubleType) / col("n_tokens")).as("avg_token_len"),
        (col("n_distinct").cast(DoubleType) / col("n_tokens")).as("type_token_ratio"),
        (col("stop_hits").cast(DoubleType) / col("n_tokens")).as("stopword_ratio"))
      .withColumn("quality_score",
        lit(0.5) * col("type_token_ratio") +
          lit(0.3) * least(lit(1.0), col("n_tokens").cast(DoubleType) / 100.0) +
          lit(0.2) * col("stopword_ratio"))
  }

  // --- readability ---------------------------------------------------------
  def readability(s: SparkSession, dir: String): DataFrame =
    readabilityOf(Tables.table(s, dir, "documents"))

  /** Flesch-style readability scoring (t17) — the grade-level curation
    * signal alongside t02's lexical quality and t15's Gopher rules:
    * words (t03 whitespace convention), sentences (runs of `[.!?]`,
    * floored at one — an unpunctuated doc IS one sentence), and a
    * syllable proxy (vowel-group runs, the standard heuristic when no
    * dictionary is in the loop), combined as
    * `206.835 − 1.015·(words/sentences) − 84.6·(syllables/words)`.
    * Pure per-row expressions (zero shuffles before canon), and the
    * formula's left-associated double arithmetic is replayed exactly by
    * the oracle, so the score hash-matches despite being a float. */
  def readabilityOf(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        size(tokens(col("text"))).cast("long").as("n_words"),
        greatest(lit(1L),
          regexp_count(col("text"), lit("[.!?]+")).cast("long"))
          .as("n_sentences"),
        regexp_count(lower(col("text")), lit("[aeiou]+")).cast("long")
          .as("n_syllables"))
      .withColumn("flesch",
        lit(206.835)
          - lit(1.015) * (col("n_words").cast(DoubleType) / col("n_sentences"))
          - lit(84.6) * (col("n_syllables").cast(DoubleType) / col("n_words")))

  // --- token counting ------------------------------------------------------
  // Whitespace tokens, alpha words, and a BPE-ish greedy ≤4-char chunking.
  def tokenCount(s: SparkSession, dir: String): DataFrame =
    Tables.table(s, dir, "documents")
      .select(col("doc_id"),
        size(tokens(col("text"))).as("ws_tokens"),
        size(regexp_extract_all(lower(col("text")), lit("[a-z]+"), lit(0)))
          .as("alpha_tokens"),
        size(regexp_extract_all(lower(col("text")), lit("[a-z]{1,4}"), lit(0)))
          .as("subword_tokens"),
        length(col("text")).as("n_chars"))

  // --- within-doc repetition signals ---------------------------------------
  /** Gopher-style repetition quality signals: the share of the most
    * frequent token, the duplicate-token fraction, and the duplicate-bigram
    * fraction. High values flag degenerate/templated text that a
    * training-data pipeline drops before dedup even runs. Token stats are
    * a two-level aggregation (per (doc, token) counts, then per doc);
    * bigram stats are pure per-row array expressions — no extra shuffle.
    */
  def repetition(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.table(s, dir, "documents")
    val toks = docs.select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
    val tokStats = toks.groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(
        sum(col("c")).as("n_tokens"),
        max(col("c")).as("top_c"),
        count(lit(1)).as("n_distinct"))
    val t = tokens(col("text"))
    val g2 = zip_with(slice(t, lit(1), size(t) - 1), slice(t, lit(2), size(t) - 1),
      (a, b) => concat(a, lit(" "), b))
    val grams = docs.select(col("doc_id"),
      size(g2).as("n_bigrams"),
      size(array_distinct(g2)).as("n_distinct_bigrams"))
    tokStats.join(grams, "doc_id")
      .select(col("doc_id"), col("n_tokens"),
        (col("top_c").cast(DoubleType) / col("n_tokens")).as("top_token_share"),
        (lit(1.0) - col("n_distinct").cast(DoubleType) / col("n_tokens"))
          .as("dup_token_frac"),
        when(col("n_bigrams") > 0,
            lit(1.0) - col("n_distinct_bigrams").cast(DoubleType) / col("n_bigrams"))
          .otherwise(lit(0.0)).as("dup_bigram_frac"))
  }

  // --- corpus-level boilerplate mining -------------------------------------
  /** Top-K most document-frequent shingles across the corpus — the
    * boilerplate a pipeline strips (license headers, templates) and
    * exactly the hot keys the d04 df-cap guards against. One explode +
    * one aggregation + top-k (`TakeOrderedAndProject`, no global sort
    * shuffle); df counts documents, not occurrences, because per-doc
    * shingles are distinct.
    */
  val BoilerplateTopK = 20

  def boilerplate(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.table(s, dir, "documents")
      .select(col("doc_id"), shingles(col("text")).as("sh"))
    val total = docs.agg(count(lit(1)).as("n_docs"))
    docs.select(explode(col("sh")).as("s"))
      .groupBy("s").agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(total))
      .select(col("s"), col("df"),
        (col("df").cast(DoubleType) / col("n_docs")).as("doc_share"))
      .orderBy(col("df").desc, col("s").asc)
      .limit(BoilerplateTopK)
  }

  // --- corpus vocabulary / Zipf profile ------------------------------------
  /** Top-K corpus vocabulary with frequency rank, document frequency, and
    * cumulative token share — the Zipf profile a corpus report leads with
    * (head-token concentration is a tokenizer-health and dedup-health
    * signal: a natural corpus puts roughly constant mass per rank decade;
    * a templated one front-loads it). Shape at 100 TB: one (token)
    * aggregation, a `TakeOrderedAndProject` top-K (never a global sort),
    * and the running share is a window over K=50 rows — driver-scale by
    * construction. All counts exact integers; shares are single divisions
    * of exact integers at the boundary.
    */
  val VocabTopK = 50

  def vocab(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.table(s, dir, "documents")
    val toks = docs.select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
    val counts = toks.groupBy("tok").agg(
      count(lit(1)).as("freq"),
      countDistinct(col("doc_id")).as("df"))
    // n_total from the already-reduced vocabulary frame — summing freq is
    // exact and avoids re-tokenizing the corpus for one scalar
    val total = counts.agg(sum(col("freq")).as("n_total"))
    val top = counts.orderBy(col("freq").desc, col("tok").asc).limit(VocabTopK)
    // K rows: the no-partition window is a deliberate single-task pass over
    // the already-limited frame, not a scale hazard
    val w = Window.orderBy(col("freq").desc, col("tok").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    top.crossJoin(broadcast(total))
      .withColumn("rank", row_number().over(
        Window.orderBy(col("freq").desc, col("tok").asc)))
      .withColumn("cum_freq", sum(col("freq")).over(w))
      .select(col("rank"), col("tok").as("token"), col("freq"), col("df"),
        (col("freq").cast(DoubleType) / col("n_total")).as("corpus_share"),
        (col("cum_freq").cast(DoubleType) / col("n_total")).as("cum_share"))
  }

  // --- distinctive-keyword extraction --------------------------------------
  /** Top-3 most distinctive tokens per document, ranked by (term frequency
    * desc, document frequency asc, token asc) — tf-idf's ordering without
    * its logarithm, so every ranking key is an exact integer and the
    * oracle matches bit-for-bit (ln() is not correctly-rounded across
    * engines). Two aggregations + one join + one windowed top-k; the df
    * side is the distinct-token table, small enough to broadcast at any
    * scale.
    */
  /** Token-rarity surprisal profile (t12) — the curation signal a CCNet/
    * Gopher-style LM perplexity filter approximates, in exact integers:
    * every corpus token gets a rarity CLASS from fixed frequency
    * thresholds (powers of 4, so class boundaries are literals both
    * engines compare exactly — a float log would put boundary tokens at
    * the mercy of rounding), and each document reduces to its token
    * count, rarity sum, and rare-token count; the mean is one division of
    * exact integers at the boundary. Low mean ⇒ boilerplate/stopword
    * soup; high mean ⇒ unusual or noisy text — both tails are what a
    * quality pipeline inspects. Shape at 100 TB: one vocab aggregation
    * (map-side combine), a token-keyed equi-join (the Zipf head of the
    * vocab is broadcastable; the long tail hash-partitions evenly by
    * construction), one per-doc aggregation. */
  def surprisal(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.spread(s, dir, "documents", "doc_id")
    val toks = docs.select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
    val vocab = toks.groupBy("tok").agg(count(lit(1)).as("freq"))
    val rarity = vocab.select(col("tok"),
      when(col("freq") >= 1024, 0).when(col("freq") >= 256, 1)
        .when(col("freq") >= 64, 2).when(col("freq") >= 16, 3)
        .when(col("freq") >= 4, 4).otherwise(5).as("rarity"))
    toks.join(rarity, "tok")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("rarity")).as("rarity_sum"),
        sum(when(col("rarity") === 5, 1L).otherwise(0L)).as("n_rare"))
      .select(col("doc_id"), col("n_tokens"), col("rarity_sum"), col("n_rare"),
        (col("rarity_sum").cast(DoubleType) / col("n_tokens")).as("mean_rarity"))
  }

  /** Per-source provenance audit (t13) — the by-provenance data card a
    * corpus owner reviews before mixing sources: for every `source`, doc
    * and exact token counts, high-quality share (the p09 s3 threshold
    * over t02's hash-identical quality doubles), declared-vs-detected
    * language disagreements (t01), and near-duplicate exposure (docs in
    * any d02 pair). A source with high mismatch or dup rates gets
    * down-weighted or dropped; this query is where that decision comes
    * from. Composes the already-bounded pipelines and ends in one tiny
    * per-source rollup — integer aggregates only, no float sums. */
  def sourceProfile(s: SparkSession, dir: String): DataFrame =
    sourceProfile(s, dir, Dedup.minhashLsh(s, dir))

  /** [[sourceProfile]] over an already-materialized d02 pair table — the
    * production shape: at 100 TB the pair table is computed once per
    * corpus snapshot and every audit reads it, never re-running LSH
    * inside the audit itself. */
  def sourceProfile(s: SparkSession, dir: String,
      pairs: DataFrame): DataFrame = {
    val docs = Tables.table(s, dir, "documents")
      .select(col("doc_id"), col("source"), col("lang"))
    val q = quality(s, dir)
      .select(col("doc_id"), col("n_tokens"), col("quality_score"))
    val lid = langId(s, dir).select(col("doc_id"), col("pred_lang"))
    val dup = pairs.select(col("da").as("doc_id"))
      .unionByName(pairs.select(col("db").as("doc_id")))
      .distinct().withColumn("is_dup", lit(1L))
    docs.join(q, "doc_id").join(lid, "doc_id")
      .join(dup, Seq("doc_id"), "left")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        sum(when(col("quality_score") >= 0.43, 1L).otherwise(0L))
          .as("n_high_quality"),
        sum(when(col("pred_lang") =!= col("lang"), 1L).otherwise(0L))
          .as("n_lang_mismatch"),
        sum(coalesce(col("is_dup"), lit(0L))).as("n_near_dup"))
  }

  /** Cross-source near-dup overlap matrix (t14) — which source pairs
    * leak into each other: every verified d02 pair labeled with its two
    * documents' sources (unordered, so (a,b) and (b,a) collapse), rolled
    * up to pair counts per source pair. High off-diagonal counts mean two
    * crawls overlap and one should be dropped or down-weighted; the
    * diagonal is within-source duplication. Consumes the materialized
    * pair table in production (the t13 pattern); the oracle entry
    * self-computes. Shape: pairs ≪ docs, two doc_id equi-joins + a tiny
    * rollup. */
  def sourceOverlap(s: SparkSession, dir: String): DataFrame =
    sourceOverlap(s, dir, Dedup.minhashLsh(s, dir))

  /** [[sourceOverlap]] over an already-materialized d02 pair table. */
  def sourceOverlap(s: SparkSession, dir: String,
      pairs: DataFrame): DataFrame = {
    val src = Tables.table(s, dir, "documents")
      .select(col("doc_id"), col("source"))
    pairs
      .join(src.select(col("doc_id").as("da"), col("source").as("sa")), "da")
      .join(src.select(col("doc_id").as("db"), col("source").as("sb")), "db")
      .select(least(col("sa"), col("sb")).as("source_a"),
        greatest(col("sa"), col("sb")).as("source_b"), col("jaccard"))
      .groupBy("source_a", "source_b")
      .agg(count(lit(1)).as("n_pairs"), max(col("jaccard")).as("max_jaccard"))
  }

  def keywords(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.table(s, dir, "documents")
    val toks = docs.select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
    val tf = toks.groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("tf").desc, col("df").asc, col("tok").asc)
    tf.join(df, "tok")
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("doc_id"), col("rk"), col("tok").as("keyword"),
        col("tf"), col("df"))
  }

  // --- bigram novelty ------------------------------------------------------
  /** Per-document bigram novelty: the fraction of a document's token
    * bigrams NOT among the corpus's [[BigramTopK]] most frequent — low
    * novelty flags template/boilerplate-dominated text (the complement of
    * [[boilerplate]]'s corpus view, scored per document so the curation
    * funnel can gate on it). Counts are occurrence-level exact integers;
    * the single double division sits at the boundary. Shape at 100 TB:
    * one bigram aggregation + top-K (`TakeOrderedAndProject`), the top
    * set broadcast into a semi-join — per-document work never sees the
    * corpus vocabulary.
    */
  val BigramTopK = 50

  def bigramNovelty(s: SparkSession, dir: String): DataFrame = {
    val t = tokens(col("text"))
    val g2 = zip_with(slice(t, lit(1), size(t) - 1), slice(t, lit(2), size(t) - 1),
      (a, b) => concat(a, lit(" "), b))
    val docs = Tables.spread(s, dir, "documents", "doc_id")
      .select(col("doc_id"), g2.as("bg"))
    val ex = docs.select(col("doc_id"), explode(col("bg")).as("g"))
    val top = ex.groupBy("g").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("g").asc).limit(BigramTopK)
      .select("g")
    val common = ex.join(broadcast(top), Seq("g"), "left_semi")
      .groupBy("doc_id").agg(count(lit(1)).as("n_common"))
    docs.select(col("doc_id"), size(col("bg")).cast("long").as("n_bigrams"))
      .join(common, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_bigrams"),
        coalesce(col("n_common"), lit(0L)).as("n_common"))
      .withColumn("novelty",
        when(col("n_bigrams") > 0,
          lit(1.0) - col("n_common").cast(DoubleType) / col("n_bigrams"))
          .otherwise(lit(0.0)))
  }

  // --- curation filter funnel ----------------------------------------------
  /** Per-stage survivor counts of a C4/Gopher-style quality cascade — the
    * first report a corpus-curation run produces (how many documents each
    * rule removes). Stages apply cumulatively:
    *   0 total; 1 length ≥ 200 chars; 2 ≥ 50 tokens;
    *   3 duplicate-token fraction ≤ 1/2; 4 top-token share ≤ 1/5.
    * Every predicate is an exact integer comparison (`2·(n−d) ≤ n`, not a
    * float ratio), so the oracle matches bit-for-bit. One token-stats
    * aggregation + one conditional-sum pass; the 5-row funnel falls out of
    * a `stack` unpivot — no per-stage rescan, which is what makes the same
    * plan a single corpus pass at 100 TB.
    */
  def filterFunnel(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.table(s, dir, "documents")
    val toks = docs.select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
    val tokStats = toks.groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(
        sum(col("c")).as("n_tokens"),
        max(col("c")).as("top_c"),
        count(lit(1)).as("n_distinct"))
    val sig = docs.select(col("doc_id"), length(col("text")).as("n_chars"))
      .join(tokStats, "doc_id")
      .select(
        (col("n_chars") >= 200).as("b1"),
        (col("n_tokens") >= 50).as("b2"),
        (lit(2) * (col("n_tokens") - col("n_distinct")) <= col("n_tokens"))
          .as("b3"),
        (lit(5) * col("top_c") <= col("n_tokens")).as("b4"))
    val agg = sig.agg(
      count(lit(1)).as("s0"),
      sum(when(col("b1"), 1L).otherwise(0L)).as("s1"),
      sum(when(col("b1") && col("b2"), 1L).otherwise(0L)).as("s2"),
      sum(when(col("b1") && col("b2") && col("b3"), 1L).otherwise(0L)).as("s3"),
      sum(when(col("b1") && col("b2") && col("b3") && col("b4"), 1L)
        .otherwise(0L)).as("s4"))
    agg.select(expr(
      """stack(5,
        |  0, 'total',           s0,
        |  1, 'min_length',      s1,
        |  2, 'min_tokens',      s2,
        |  3, 'dup_token_frac',  s3,
        |  4, 'top_token_share', s4) AS (stage, stage_name, docs_remaining)
        |""".stripMargin))
      .select(col("stage").cast("int").as("stage"), col("stage_name"),
        col("docs_remaining"))
  }

  // --- PII scan / redaction ------------------------------------------------
  /** C4-style PII pass over the corpus: count and redact email addresses,
    * dotted-quad IPs, and dashed phone numbers. Patterns are deliberately
    * plain POSIX-class regexes ([0-9], [a-z]) that Java regex and RE2
    * (DuckDB) scan identically — no \\d, no lookaround, no word
    * boundaries, so non-overlapping greedy matching agrees engine-to-
    * engine. Redaction replaces in email→ip→phone order (an IP inside an
    * already-redacted email cannot double-count). Pure per-row map work:
    * no shuffle at any scale, the scan's the cost.
    */
  val EmailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z][a-z]+"
  val IpRe = "[0-9]+\\.[0-9]+\\.[0-9]+\\.[0-9]+"
  val PhoneRe = "[0-9][0-9][0-9]-[0-9][0-9][0-9]-[0-9][0-9][0-9][0-9]"

  def piiScan(s: SparkSession, dir: String): DataFrame =
    piiScanOf(Tables.table(s, dir, "documents"))

  /** [[piiScan]] over an arbitrary (doc_id, text) corpus — the spec entry
    * point (the synthetic corpus is digit-free, so the driver's oracle
    * only proves plumbing; `PiiSpec` proves matching + redaction). */
  private[graft] def piiScanOf(raw: DataFrame): DataFrame = {
    val t = lower(col("text"))
    val red = regexp_replace(
      regexp_replace(
        regexp_replace(t, EmailRe, "<EMAIL>"),
        IpRe, "<IP>"),
      PhoneRe, "<PHONE>")
    raw
      .select(col("doc_id"),
        size(regexp_extract_all(t, lit(EmailRe), lit(0))).cast("long")
          .as("n_emails"),
        size(regexp_extract_all(t, lit(IpRe), lit(0))).cast("long")
          .as("n_ips"),
        size(regexp_extract_all(t, lit(PhoneRe), lit(0))).cast("long")
          .as("n_phones"),
        length(red).as("redacted_len"))
      .withColumn("has_pii",
        col("n_emails") + col("n_ips") + col("n_phones") > 0)
  }

  // --- Gopher rule-based quality filter ------------------------------------
  /** Gopher-style rule filter (t15) — the published heuristic gate (Rae
    * et al. 2021, "Scaling Language Models: ... Gopher", Appendix A1.1)
    * every large text pipeline runs before model-based scoring: word-count
    * bounds, mean-word-length bounds, symbol-to-word ratio (# and …),
    * bullet-start and ellipsis-end line ratios, alphabetic-word fraction,
    * and a minimum stopword-diversity requirement. Every ratio test is an
    * exact integer cross-multiplication (`3·n ≤ chars`, never a float
    * division), so the DuckDB oracle matches bit-for-bit. Pure per-row
    * array/regex expressions — ZERO shuffles at any corpus size; the scan
    * is the cost, which is what makes this the first gate in a 100-TB
    * funnel (it prunes before anything that shuffles runs).
    *
    * The driver corpus is single-line and symbol-free, so the line/symbol
    * rules pass trivially there (plumbing proof); `GopherRulesSpec` feeds
    * a corpus that trips every rule individually (the t09 PII pattern). */
  def gopherRules(s: SparkSession, dir: String): DataFrame =
    gopherRulesOf(Tables.table(s, dir, "documents"))

  private[graft] def gopherRulesOf(raw: DataFrame): DataFrame =
    gopherSignals(raw)

  /** The unsorted [[gopherRules]] signal computation — pure per-row
    * expressions, so it applies unchanged to a STREAMING DataFrame (the
    * in-stream curation gate: drop failing docs before they ever reach
    * state or a sink — see the streaming spec). */
  private[graft] def gopherSignals(raw: DataFrame): DataFrame = {
    val t = tokens(col("text"))
    val lines = split(col("text"), "\n")
    val nHash = length(col("text")) - length(regexp_replace(col("text"), "#", ""))
    val nEll = size(regexp_extract_all(col("text"), lit("\\.\\.\\."), lit(0)))
    val stopHits = stopwordsEn.map(w =>
      when(array_contains(t, w), 1L).otherwise(0L)).reduce(_ + _)
    raw.select(col("doc_id"),
        size(t).cast("long").as("n_tokens"),
        aggregate(t, lit(0L), (a, x) => a + length(x)).as("token_chars"),
        size(filter(t, x => x.rlike("[a-z]"))).cast("long").as("n_alpha_words"),
        (nHash + nEll).cast("long").as("n_symbols"),
        size(lines).cast("long").as("n_lines"),
        size(filter(lines, l =>
          substring(ltrim(l), 1, 2) === "- " ||
            substring(ltrim(l), 1, 2) === "* ")).cast("long")
          .as("n_bullet_lines"),
        size(filter(lines, l => rtrim(l).rlike("\\.\\.\\.$"))).cast("long")
          .as("n_ellipsis_lines"),
        stopHits.as("n_stop_hits"))
      .select(col("*"),
        (col("n_tokens") >= 50 && col("n_tokens") <= 100000).as("f_word_count"),
        (lit(3) * col("n_tokens") <= col("token_chars") &&
          col("token_chars") <= lit(10) * col("n_tokens")).as("f_mean_word_len"),
        (lit(10) * col("n_symbols") <= col("n_tokens")).as("f_symbol_ratio"),
        (lit(10) * col("n_bullet_lines") <= lit(9) * col("n_lines"))
          .as("f_bullet_ratio"),
        (lit(10) * col("n_ellipsis_lines") <= lit(3) * col("n_lines"))
          .as("f_ellipsis_ratio"),
        (lit(5) * col("n_alpha_words") >= lit(4) * col("n_tokens"))
          .as("f_alpha_ratio"),
        (col("n_stop_hits") >= 2).as("f_stopwords"))
      .withColumn("pass_gopher",
        col("f_word_count") && col("f_mean_word_len") && col("f_symbol_ratio") &&
          col("f_bullet_ratio") && col("f_ellipsis_ratio") &&
          col("f_alpha_ratio") && col("f_stopwords"))
  }

  // --- code-vs-prose detection ---------------------------------------------
  /** Code-keyword tokens the detector counts (whitespace-token exact
    * matches — a real detector adds per-language lexers; the dataflow is
    * identical). */
  val CodeKeywords: Seq[String] = Seq("def", "return", "import", "class",
    "void", "function", "var", "let", "const", "if", "else", "for", "while")

  /** Code-vs-prose detection (t16) — the source-routing signal a mixed
    * crawl needs before tokenization (code gets a different tokenizer,
    * different dedup granularity, different quality rules). Three
    * independent per-row signals: code-punctuation density
    * (`{}()[];=` chars per char), statement-terminated line ratio
    * (lines ending `;`/`{`), indented-line ratio, and keyword-token
    * density; the verdict ORs integer cross-multiplied thresholds. Pure
    * map work — zero shuffles, scan-bound at 100 TB, same gate position
    * as [[gopherRules]]. */
  def codeDetect(s: SparkSession, dir: String): DataFrame =
    codeDetectOf(Tables.table(s, dir, "documents"))

  private[graft] def codeDetectOf(raw: DataFrame): DataFrame = {
    val t = tokens(col("text"))
    val lines = split(col("text"), "\n")
    raw.select(col("doc_id"),
        length(col("text")).cast("long").as("n_chars"),
        (length(col("text")) -
          length(translate(col("text"), "{}()[];=", ""))).cast("long")
          .as("n_code_chars"),
        size(lines).cast("long").as("n_lines"),
        size(filter(lines, l => rtrim(l).rlike("[;{]$"))).cast("long")
          .as("n_stmt_lines"),
        size(filter(lines, l => l.rlike("^(\\t|  )"))).cast("long")
          .as("n_indent_lines"),
        size(t).cast("long").as("n_tokens"),
        size(filter(t, x => x.isInCollection(CodeKeywords))).cast("long")
          .as("n_kw_hits"))
      .withColumn("is_code",
        (lit(20) * col("n_code_chars") >= col("n_chars")) ||
          (col("n_lines") >= 3 &&
            lit(2) * col("n_stmt_lines") >= col("n_lines")) ||
          (col("n_lines") >= 3 &&
            lit(2) * col("n_indent_lines") >= col("n_lines")) ||
          (col("n_kw_hits") >= 3 &&
            lit(10) * col("n_kw_hits") >= col("n_tokens")))
  }

  // --- document fingerprinting --------------------------------------------
  def fingerprint(s: SparkSession, dir: String): DataFrame =
    Tables.table(s, dir, "documents")
      .select(col("doc_id"),
        md5(canonical(col("text"))).as("fp_full"),
        md5(substring(canonical(col("text")), 1, 64)).as("fp_prefix64"),
        greatest(lit(0), size(tokens(col("text"))) - 2).as("n_shingles"))

  /** Class ceiling for [[bigramXent]]: conditional probabilities below
    * 2^-[[XentMaxClass]] all land in the top class (the "tail" a
    * perplexity filter flags). */
  val XentMaxClass = 12

  /** Count-min sketch geometry for [[cmsHeavyHitters]]: depth (independent
    * hash rows) × width (counters per row). Width 256 on the fixture
    * vocabulary produces visible-but-bounded collision overestimates —
    * the property the operator exists to measure. */
  val CmsDepth = 4
  val CmsWidth = 256

  /** Heavy hitters under a count-min sketch (t19) — the bounded-memory
    * corpus-frequency machinery a streaming 100 TB pipeline runs when
    * the exact vocabulary (t10) no longer fits anywhere: d×w counters
    * instead of |V| cells, estimate = min over rows of the hashed
    * counter, overestimate-only by construction. Both sides ship here:
    * the sketch table (one narrow aggregation over d hashed copies of
    * the token stream) AND the exact top-[[VocabTopK]] (t10's path), so
    * the output row per heavy hitter carries `freq` (exact), `cms_est`,
    * and `overestimate = cms_est − freq ≥ 0` — the collision-error audit
    * that decides whether d×w is sized right BEFORE the exact side
    * becomes unaffordable. Every hash is the engine-portable md5 idiom,
    * so unlike q12b's HLL gate the sketch itself replays bit-exactly in
    * the oracle. Shape at scale: the d-way explode is a constant-factor
    * map, the sketch is d·w rows (broadcast back), and only the top-k
    * join touches it. */
  private def cmsBucket(i: Int, tok: Column): Column =
    TextPrep.shingleBase(concat(lit(s"$i:"), tok)) % CmsWidth

  private def cmsToks(s: SparkSession, dir: String): DataFrame =
    Tables.spread(s, dir, "documents", "doc_id")
      .select(explode(tokens(col("text"))).as("tok"))

  /** The batch d×w counter grid `(row, bucket, cnt)` — t19's sketch as a
    * standalone artifact: what ships to a consumer (or to the
    * [[graft.streaming.StreamingCms]] parity proof, which must equal it
    * cell-for-cell after any stream prefix). */
  def cmsSketch(s: SparkSession, dir: String): DataFrame =
    cmsSketchOf(cmsToks(s, dir))

  private def cmsSketchOf(toks: DataFrame): DataFrame = toks
    .select(explode(array((0 until CmsDepth).map(i =>
      struct(lit(i).as("row"), cmsBucket(i, col("tok")).as("bucket"))): _*))
      .as("c"))
    .groupBy(col("c.row").as("row"), col("c.bucket").as("bucket"))
    .agg(count(lit(1)).as("cnt"))

  def cmsHeavyHitters(s: SparkSession, dir: String): DataFrame = {
    val toks = cmsToks(s, dir)
    val sketch = cmsSketchOf(toks)
    val top = toks.groupBy("tok").agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("tok").asc).limit(VocabTopK)
    val probes = top.select(col("tok"), col("freq"),
      explode(array((0 until CmsDepth).map(i =>
        struct(lit(i).as("row"), cmsBucket(i, col("tok")).as("bucket"))): _*))
        .as("p"))
      .select(col("tok"), col("freq"), col("p.row").as("row"),
        col("p.bucket").as("bucket"))
    probes.join(broadcast(sketch), Seq("row", "bucket"))
      .groupBy("tok", "freq")
      .agg(min(col("cnt")).as("cms_est"))
      .withColumn("rank", row_number().over(
        Window.orderBy(col("freq").desc, col("tok").asc)))
      .select(col("rank"), col("tok").as("token"), col("freq"),
        col("cms_est"), (col("cms_est") - col("freq")).as("overestimate"))
  }

  /** Quantized bigram-LM cross-entropy (t18) — the KenLM/CCNet
    * perplexity filter in exact integers: train a bigram model on the
    * corpus itself (count c2(w₁,w₂) and prefix mass c1(w₁) — the LM any
    * self-supervised curation run fits on its own data), then score each
    * document by the conditional improbability of its transitions.
    * Instead of −log₂ P (a float no two engines round alike), each
    * transition gets the integer CLASS k = min{k : c2·2ᵏ ≥ c1}
    * = ⌈log₂(c1/c2)⌉ — a cascade of integer cross-multiplications, so
    * boundary transitions land identically on both engines; c2 ≥ 1 for
    * every observed bigram (the model is trained on the same corpus —
    * no OOV), and k is capped at [[XentMaxClass]]. A document's
    * `mean_xent` is its quantized cross-entropy in bits/transition:
    * high ⇒ improbable transitions (noise, shuffled text, OCR damage);
    * low ⇒ repetitive/templated text — the t12 rarity signal's
    * CONDITIONAL counterpart (a common word in a rare context scores
    * high here but low there). Shape at 100 TB: one bigram explode, two
    * (w₁,w₂)/(w₁)-keyed count aggregations with map-side combine, one
    * hash join back on the bigram key (Zipf head broadcastable, tail
    * hash-partitions evenly), one per-doc rollup. */
  def bigramXent(s: SparkSession, dir: String): DataFrame = {
    val t = tokens(col("text"))
    val g2 = zip_with(slice(t, lit(1), size(t) - 1),
      slice(t, lit(2), size(t) - 1), (a, b) => concat(a, lit(" "), b))
    val bg = Tables.spread(s, dir, "documents", "doc_id")
      .select(col("doc_id"), explode(g2).as("g"))
    val c2 = bg.groupBy("g").agg(count(lit(1)).as("c2"))
      .withColumn("w1", substring_index(col("g"), " ", 1))
    val c1 = c2.groupBy("w1").agg(sum(col("c2")).as("c1"))
    val cls = coalesce(
      ((0 until XentMaxClass).map(k =>
        when(col("c2") * lit(1L << k) >= col("c1"), lit(k))) :+
        lit(XentMaxClass)): _*)
    val classed = c2.join(c1, "w1").select(col("g"), cls.as("xent"))
    bg.join(classed, "g")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_transitions"),
        sum(col("xent")).as("xent_sum"),
        sum(when(col("xent") === XentMaxClass, 1L).otherwise(0L))
          .as("n_tail"))
      .select(col("doc_id"), col("n_transitions"), col("xent_sum"),
        col("n_tail"),
        (col("xent_sum").cast(DoubleType) / col("n_transitions"))
          .as("mean_xent"))
  }

  // --- encoding-artifact scan ----------------------------------------------
  /** Byte-hygiene scan (t20) — the ftfy-shaped curation stage upstream
    * of every text signal: per document, counts of the four standard
    * encoding-damage artifacts a crawled corpus carries — U+FFFD
    * replacement characters (decoder already gave up), C1 control
    * characters U+0080–U+009F (Latin-1 misreads of continuation bytes),
    * raw ASCII control characters outside tab/newline/CR (binary
    * spillage), and the classic UTF-8-read-as-Latin-1/cp1252 mojibake
    * signatures (`Ã`/`Â` + continuation-range char, `â€`). `is_clean`
    * gates the doc. Pure per-row column expressions — map-side only, no
    * shuffle, streaming-applicable like [[gopherSignals]]. Counting is
    * length-difference after class removal (engine-exact on both sides;
    * occurrence counting only for the two-char signatures); classes use
    * explicit `\\x{…}` escapes, the d22 Java↔RE2 parity rule. */
  def encodingScan(s: SparkSession, dir: String): DataFrame =
    encodingScanOf(Tables.table(s, dir, "documents"))

  private[graft] def encodingScanOf(docs: DataFrame): DataFrame = {
    def charsOf(pattern: String): Column =
      (length(col("text")) -
        length(regexp_replace(col("text"), pattern, ""))).cast("long")
    val moji = size(regexp_extract_all(col("text"),
      lit("([\\x{00C3}\\x{00C2}][\\x{0080}-\\x{00BF}]|\\x{00E2}\\x{20AC})"),
      lit(0))).cast("long")
    docs.select(col("doc_id"),
        charsOf("\\x{FFFD}").as("n_replacement"),
        charsOf("[\\x{0080}-\\x{009F}]").as("n_c1_controls"),
        charsOf("[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]").as("n_ctrl_chars"),
        moji.as("n_mojibake_sigs"))
      .withColumn("is_clean",
        col("n_replacement") === 0 && col("n_c1_controls") === 0 &&
          col("n_ctrl_chars") === 0 && col("n_mojibake_sigs") === 0)
  }
}
