package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Deduplication operator family over the `documents` corpus — the
  * training-data-pipeline extension surface (north-star per BASELINE.json;
  * generalizes the reference's natural-key dedup, SURVEY §2.5).
  *
  * Scale design: every variant is a bounded-candidate pipeline — LSH bands
  * (minhash), fingerprints (simhash/exact), or shingle-postings joins —
  * never an unbounded cross join. At 100 TB the shapes stay the same:
  * shuffle on band key / fingerprint, verify only candidates.
  */
object Dedup {
  import TextPrep._

  // --- exact dedup: hash-groupBy on full text ------------------------------
  // Representative = min(doc_id) per distinct text (deterministic).
  def exact(s: SparkSession, dir: String): DataFrame =
    Tables.table(s, dir, "documents")
      .groupBy(col("text"))
      .agg(min(col("doc_id")).as("rep_id"), count(lit(1)).as("n_copies"))
      .select(col("rep_id"), col("n_copies"))

  // --- Unicode-normalization-aware exact dedup ------------------------------
  /** NFC-normalized exact dedup (d21) — the d01 rung after Unicode
    * canonical normalization (the codegen
    * [[graft.functions.NfcNormalize]] expression): the same logical
    * string arrives from different sources under different code-point
    * sequences (composed vs decomposed accents being the classic case),
    * and byte-level grouping silently treats them as distinct. Groups on
    * the NFC form and counts, per representative, both the copies and
    * how many DISTINCT raw byte sequences the normal form coalesced —
    * `n_raw_variants > 1` rows are exactly the duplicates d01 misses.
    * Same 100-TB shape as d01 (one hash-shuffle groupBy on a per-doc
    * value); the fast-path inside the expression makes the normalization
    * free for ASCII-dominated corpora. Oracle: DuckDB's `nfc_normalize`
    * implements the same Unicode form. */
  def nfcDedup(s: SparkSession, dir: String): DataFrame =
    Tables.table(s, dir, "documents")
      .select(col("doc_id"),
        graft.functions.NfcNormalize.nfc_normalize(col("text")).as("nfc"),
        col("text"))
      .groupBy(col("nfc"))
      .agg(min(col("doc_id")).as("rep_id"), count(lit(1)).as("n_copies"),
        countDistinct(col("text")).as("n_raw_variants"))
      .select(col("rep_id"), col("n_copies"), col("n_raw_variants"))

  // --- canonical-ladder exact dedup ----------------------------------------
  /** Canonical-key exact dedup (d22) — the ladder rung between [[nfcDedup]]
    * and [[bagDedup]]: groups on [[TextPrep.canonicalKey]] (NFC + casefold
    * + punctuation/whitespace collapse — the C4/CCNet canonical form), so
    * case, spacing, and punctuation variants of one document coalesce.
    * NFC alone (d21) misses exactly these, and they are the most common
    * near-exact duplicates in web corpora; the bag rung (d12) goes one
    * step further by also ignoring token ORDER. Same 100-TB shape as
    * d01/d21: one per-doc key, one hash-shuffle groupBy.
    * `n_raw_variants > 1` rows are the duplicates d01 misses;
    * `n_nfc_variants > 1` rows are the ones d21 ALSO misses. */
  def canonicalDedup(s: SparkSession, dir: String): DataFrame =
    Tables.table(s, dir, "documents")
      // normalize ONCE per row; the key derives from the nfc column
      .select(col("doc_id"), col("text"),
        graft.functions.NfcNormalize.nfc_normalize(col("text")).as("nfc"))
      .select(col("doc_id"), col("text"), col("nfc"),
        TextPrep.canonicalKeyOfNfc(col("nfc")).as("ck"))
      .groupBy(col("ck"))
      .agg(min(col("doc_id")).as("rep_id"), count(lit(1)).as("n_copies"),
        countDistinct(col("text")).as("n_raw_variants"),
        countDistinct(col("nfc")).as("n_nfc_variants"))
      .select(col("rep_id"), col("n_copies"), col("n_raw_variants"),
        col("n_nfc_variants"))

  // --- template-skeleton dedup ---------------------------------------------
  /** Template-skeleton family detection (d24) — the rung PAST [[
    * canonicalDedup]]'s ladder: collapse every ASCII alphanumeric run to
    * one `#` marker and whitespace runs to one space, leaving only the
    * document's punctuation/layout SKELETON. Documents generated from
    * one boilerplate template (same structure, different payload words
    * and numbers — machine-generated listings, error pages, mail-merge
    * spam) share a skeleton while every exact/NFC/canonical key still
    * differs, so families with ≥ 2 DISTINCT texts are exactly the
    * duplicate mass d01/d21/d22 cannot see. Emits one row per template
    * family: representative, member count, distinct payloads, and the
    * skeleton's size. Same 100-TB shape as the whole exact-dedup ladder:
    * one per-row key projection, one hash-shuffle groupBy. Explicit
    * ASCII classes (never `\w`/POSIX), the d22 Java↔RE2 parity rule. */
  def skeletonDedup(s: SparkSession, dir: String): DataFrame =
    skeletonDedupOf(Tables.table(s, dir, "documents"))

  private[graft] def skeletonDedupOf(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), col("text"),
        TextPrep.skeletonKey(col("text")).as("sk"))
      .groupBy(col("sk"))
      .agg(min(col("doc_id")).as("rep_id"), count(lit(1)).as("n_docs"),
        countDistinct(col("text")).as("n_distinct_texts"))
      .filter(col("n_distinct_texts") >= 2)
      .select(col("rep_id"), col("n_docs"), col("n_distinct_texts"),
        length(col("sk")).cast("long").as("skeleton_chars"))

  // --- quality-aware keeper selection --------------------------------------
  /** Quality-aware canonical keeper selection (d25) — the keeper POLICY
    * rung above the whole ladder: every dedup stage here keeps
    * `min(doc_id)` (deterministic, cheap, order-stable), but a curation
    * pipeline keeps the BEST member of each near-dup cluster — the
    * version with intact boilerplate-free text wins, not the one that
    * happened to be crawled first. Composes the d06 cluster labels with
    * t02's quality score: per cluster, keeper = argmax quality (ties to
    * the smallest doc_id — both engines compare the hash-proven
    * identical doubles). Emits one row per cluster with BOTH policies'
    * keepers, their scores, and whether they differ — the audit of what
    * min-id keeping costs in kept quality. Shape: label and score
    * tables join on doc_id, one per-cluster window — all ∝ corpus, the
    * cluster table materialized once per snapshot in production. */
  def qualityKeeper(s: SparkSession, dir: String): DataFrame = {
    val labels = clusters(s, dir).select("doc_id", "cluster")
    val q = TextAnalysis.quality(s, dir)
      .select(col("doc_id"), col("quality_score"))
    val m = labels.join(q, "doc_id")
    val w = Window.partitionBy(col("cluster"))
      .orderBy(col("quality_score").desc, col("doc_id").asc)
    val best = m.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("cluster"), col("doc_id").as("keeper_id"),
        col("quality_score").as("keeper_quality"))
    // the min-id keeper IS the cluster label (cluster = min reachable id)
    val minq = m.filter(col("doc_id") === col("cluster"))
      .select(col("cluster"), col("quality_score").as("minid_quality"))
    val sizes = labels.groupBy("cluster")
      .agg(count(lit(1)).as("n_members"))
    best.join(minq, "cluster").join(sizes, "cluster")
      .select(col("cluster"), col("n_members"), col("keeper_id"),
        col("keeper_quality"), col("minid_quality"),
        (col("keeper_id") =!= col("cluster")).as("keeper_differs"))
  }

  // --- winnowing fingerprint near-dup --------------------------------------
  /** Winnowing parameters (Schleimer, Wilkerson & Aiken, SIGMOD 2003 —
    * the MOSS fingerprinting scheme): k-gram size, selection window, the
    * minimum shared fingerprints for a reported pair, and a fingerprint
    * document-frequency cap (the d04 df-cap guard — a boilerplate
    * fingerprint shared by thousands of documents must not quadratically
    * pair them all). Guarantee: any shared token run of length
    * ≥ k + w − 1 yields at least one shared fingerprint. */
  val WinnowK = 3
  val WinnowW = 4
  val WinnowMinShared = 2L
  val WinnowDfCap = 100L

  /** Winnowed fingerprint set per document: the MINIMUM k-gram hash of
    * every w consecutive shingle positions, distinct per document —
    * density ≈ 2/(w+1) of the shingle count, POSITION-ROBUST unlike
    * d16's fixed-stride windows (an insertion shifts every d16 window
    * hash downstream; winnowing re-selects the same minima). Hash is
    * [[TextPrep.shingleBase]] — one md5 per shingle, the d02 primitive. */
  private[graft] def winnowFingerprints(docs: DataFrame): DataFrame = {
    import TextPrep.{shingleBase, tokens}
    val ph = docs
      .select(col("doc_id"), tokens(col("text")).as("t"))
      .filter(size(col("t")) >= WinnowK - 1 + WinnowW) // ≥ one full window
      .select(col("doc_id"),
        (size(col("t")) - (WinnowK - 1)).cast("long").as("n_sh"),
        explode(sequence(lit(0L), (size(col("t")) - WinnowK).cast("long")))
          .as("pos"),
        col("t"))
      .select(col("doc_id"), col("n_sh"), col("pos"),
        shingleBase(concat_ws(" ",
          slice(col("t"), (col("pos") + 1).cast("int"), lit(WinnowK))))
          .as("h"))
    val wD = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(0, WinnowW - 1)
    ph.withColumn("fp", min(col("h")).over(wD))
      .filter(col("pos") <= col("n_sh") - WinnowW) // full windows only
      .select("doc_id", "fp").distinct()
  }

  /** Winnowing near-dup pairs (d23): documents sharing at least
    * [[WinnowMinShared]] winnowed fingerprints, with hot (boilerplate)
    * fingerprints df-capped out of pair generation. The robust
    * fingerprint rung between d16 (exact fixed windows — insertion-
    * fragile) and d02 (MinHash — probabilistic): detection of shared
    * runs ≥ k+w−1 tokens is GUARANTEED, while the pair join touches the
    * ~2/(w+1)-density fingerprint table, never all shingles. Shape at
    * 100 TB: one narrow (doc, fp) table, one fp-keyed equi-self-join
    * bounded by the df cap. */
  def winnowPairs(s: SparkSession, dir: String): DataFrame =
    winnowPairsOf(Tables.spread(s, dir, "documents", "doc_id"))

  private[graft] def winnowPairsOf(docs: DataFrame): DataFrame = {
    val fps = winnowFingerprints(docs)
    val kept = fps.join(
      fps.groupBy("fp").agg(count(lit(1)).as("d"))
        .filter(col("d") <= WinnowDfCap).select("fp"),
      "fp")
    kept.as("a").join(kept.as("b"),
        col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= WinnowMinShared)
  }

  // --- canonical bag-fingerprint dedup -------------------------------------
  /** Bag-of-words canonical dedup (d12) — exact dedup after an
    * order-insensitive normal form: lowercase, collapse whitespace, SORT
    * the token multiset, md5 the result. Catches the reorder-only
    * near-copies (shuffled list pages, re-templated boilerplate) that
    * [[exact]] misses but that don't need MinHash's probabilistic
    * machinery — the standard middle rung of a dedup ladder (exact → bag
    * → MinHash). Same 100-TB shape as d01: one constant-size fingerprint
    * per doc, one hash-shuffle groupBy on it; `n_raw_variants` counts how
    * many DISTINCT raw texts each bag coalesced (the coverage d01 lacks).
    * Token sort order is binary; tokens are ASCII-lowercased, so Spark's
    * UTF8 ordering and DuckDB's agree. */
  def bagDedup(s: SparkSession, dir: String): DataFrame =
    bagDedupOf(Tables.table(s, dir, "documents"))

  /** The d12 normal form — load-bearing for cross-engine parity (binary
    * token sort, single-space join, md5) and for d14's stage-2 ⊆ stage-1
    * nesting, so it has exactly one definition. */
  private def bagFp(text: Column): Column =
    md5(concat_ws(" ", array_sort(tokens(text))))

  private[graft] def bagDedupOf(raw: DataFrame): DataFrame =
    raw
      .select(col("doc_id"), col("text"), bagFp(col("text")).as("bag_fp"))
      .groupBy(col("bag_fp"))
      .agg(min(col("doc_id")).as("rep_id"), count(lit(1)).as("n_copies"),
        countDistinct(col("text")).as("n_raw_variants"))
      .select(col("rep_id"), col("n_copies"), col("n_raw_variants"))

  // --- MinHash + LSH banding ----------------------------------------------
  // K=16 signatures, 4 bands × 4 rows. Candidates = pairs sharing a band
  // key; verification = exact shingle jaccard on candidates only.
  val K = 16
  val Bands = 4
  val RowsPerBand = 4
  val JaccardThreshold = 0.8

  /** Shingled corpus `(doc_id, sh)`, width-normalized before shingling
    * (one small file = one partition, and every branch recompute would
    * serialize otherwise — see ngramJaccard). The SECOND exchange sits
    * after the shingle pass so every consumer branch (band keys,
    * verify-join sides) shares it as a ReusedExchange instead of
    * re-running the tokenize+shingle regexes per branch — the p05
    * materialization-point pattern.
    *
    * PUBLIC because it is the one shingle materialization every
    * shingle-based audit (d02/d04/d08/p05) starts from: an audit pipeline
    * that runs several of them in one session persists THIS frame once
    * and hands it to the `*Shingled` variants (see
    * [[Sampling.shingleAuditSuite]]) — at 100 TB the shingle pass over
    * the corpus is the dominant shared cost. */
  def shingledDocs(s: SparkSession, dir: String): DataFrame =
    shingleFrame(s, Tables.table(s, dir, "documents"))

  /** The [[shingledDocs]] pipeline over an arbitrary `(doc_id, text, …)`
    * corpus. */
  private def shingleFrame(s: SparkSession, raw: DataFrame): DataFrame =
    raw
      .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
      .select(col("doc_id"), shingles(col("text")).as("sh"))
      .repartition(s.sparkContext.defaultParallelism, col("doc_id"))


  /** LSH band keys per document: K minhash signatures folded into
    * `bands` md5 band keys of `rowsPerBand` signatures each — the
    * (doc_id, band, bkey) index both the all-pairs pass and the
    * incremental pass probe. `bands · rowsPerBand` must equal [[K]]. */
  private def bandKeys(docs: DataFrame, bands: Int = Bands,
      rowsPerBand: Int = RowsPerBand): DataFrame =
    bandKeysFromSigs(signatures(docs), bands, rowsPerBand)

  /** The K minhash signatures per document — the expensive
    * shingle-explode + doc-keyed aggregation, factored out so
    * [[lshTuningAudit]] computes it once and folds it into every band
    * grid. */
  private def signatures(docs: DataFrame): DataFrame = {
    val ex = docs.select(col("doc_id"), explode(col("sh")).as("s"))
    // one md5 per shingle; K universal-hash mixes derive the K signatures
    val sigExprs = (0 until K).map(j => minhashAgg(col("hb"), j).as(s"h$j"))
    ex.withColumn("hb", shingleBase(col("s")))
      .groupBy("doc_id").agg(sigExprs.head, sigExprs.tail: _*)
  }

  /** Fold a `(doc_id, h0..h{K-1})` signature frame into `bands` md5 band
    * keys of `rowsPerBand` signatures each — the (doc_id, band, bkey)
    * index both the all-pairs pass and the incremental pass probe.
    * `bands · rowsPerBand` must equal [[K]]. */
  private def bandKeysFromSigs(sigs: DataFrame, bands: Int,
      rowsPerBand: Int): DataFrame = {
    require(bands * rowsPerBand == K,
      s"band grid ${bands}x$rowsPerBand must tile the $K signatures")
    val bandStructs = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        md5(concat((0 until rowsPerBand).map(r => col(s"h${b * rowsPerBand + r}")): _*)).as("bkey"))
    }
    sigs
      .select(col("doc_id"), explode(array(bandStructs: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.bkey").as("bkey"))
  }

  def minhashLsh(s: SparkSession, dir: String): DataFrame =
    minhashLshShingled(s, shingledDocs(s, dir))

  /** [[minhashLsh]] at an explicit band grid — the consumption seam for
    * [[recommendedLshGrid]]: a pipeline runs the d15 sweep once, then
    * dedups at the grid the sweep selected instead of the compiled-in
    * default. */
  def minhashLsh(s: SparkSession, dir: String,
      bands: Int, rowsPerBand: Int): DataFrame =
    minhashLshShingled(s, shingledDocs(s, dir), bands, rowsPerBand)

  /** [[minhashLsh]] over an already-shingled `(doc_id, sh)` frame — hand
    * it a persisted [[shingledDocs]] to share the shingle pass with the
    * other shingle audits in one session (the d09 pattern). */
  def minhashLshShingled(s: SparkSession, docs: DataFrame,
      nBands: Int = Bands, rowsPerBand: Int = RowsPerBand): DataFrame = {
    val bands = bandKeys(docs, nBands, rowsPerBand)
    val cands = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("da"), col("y.doc_id").as("db"))
      .distinct()

    // verify candidates with exact jaccard: per-pair set intersection
    // against the per-doc shingle arrays (see ngramJaccard — one row per
    // candidate through two doc_id equi-joins beats re-exploding
    // candidates × shingles through a 3-way postings join)
    val a = docs.select(col("doc_id").as("da"), col("sh").as("sha"))
    val b = docs.select(col("doc_id").as("db"), col("sh").as("shb"))
    cands.join(a, "da").join(b, "db")
      .select(col("da"), col("db"),
        size(array_intersect(col("sha"), col("shb"))).cast("long").as("inter"),
        size(col("sha")).as("na"), size(col("shb")).as("nb"))
      .select(col("da"), col("db"),
        (col("inter").cast(DoubleType) /
          (col("na") + col("nb") - col("inter"))).as("jaccard"))
      .filter(col("jaccard") >= JaccardThreshold)
  }

  /** Dedup-sketch recall evaluation (d13) — the go/no-go measurement
    * before trusting the MinHash sketch at scale (the dedup twin of
    * s06's ANN recall eval): run the d02 LSH pipeline and the d04
    * AllPairs exact pipeline over ONE persisted shingle materialization
    * and compare the verified pair sets. Both sides verify exact
    * jaccard ≥ τ, so every pair on either side is a true near-dup; the
    * difference is coverage — `n_lsh_missed` counts true pairs whose
    * minhash bands never collided (the sketch's false negatives, the
    * number that says whether K/bands need raising), `n_cap_missed`
    * counts pairs the AllPairs df-cap dropped but LSH still caught (the
    * cap's blind spot). One summary row; inputs evicted after eager
    * materialization (the s06 pattern — a leaked cache would rewrite
    * later queries' plans). */
  def dedupRecallEval(s: SparkSession, dir: String): DataFrame = {
    val sh = shingledDocs(s, dir).persist()
    val truth = ngramJaccardShingled(s, sh).select("da", "db").persist()
    val lsh = minhashLshShingled(s, sh).select("da", "db").persist()
    val common = truth.join(lsh, Seq("da", "db"))
    val out = truth.agg(count(lit(1)).as("n_exact"))
      .crossJoin(lsh.agg(count(lit(1)).as("n_lsh")))
      .crossJoin(common.agg(count(lit(1)).as("n_common")))
      .select(lit("minhash_lsh_vs_allpairs").as("method"),
        col("n_exact"), col("n_lsh"), col("n_common"),
        (col("n_exact") - col("n_common")).as("n_lsh_missed"),
        (col("n_lsh") - col("n_common")).as("n_cap_missed"),
        when(col("n_exact") > 0,
          col("n_common").cast(DoubleType) / col("n_exact"))
          .otherwise(lit(1.0)).as("lsh_recall"))
    graft.plans.PlanCapture.note("pipeline", out)
    val materialized = out.localCheckpoint(true)
    Seq(sh, truth, lsh).foreach(_.unpersist())
    materialized
  }

  /** Band grids [[lshTuningAudit]] sweeps: (bands, rowsPerBand) tilings
    * of the K=16 signatures, from recall-leaning (8×2: collision prob
    * 1−(1−j²)⁸) to precision-leaning (2×8: 1−(1−j⁸)²). */
  val LshTuningGrids: Seq[(Int, Int)] = Seq((2, 8), (4, 4), (8, 2))

  /** The declared selection rule every tuning sweep (d15/s12/s14) marks
    * its `recommended` row with: among operating points retaining at
    * least [[SweepRetention]] of the best point's quality, pick the
    * CHEAPEST (then the smallest parameter — fully deterministic). The
    * sweeps stopped at reporting curves; this is the arg-max a pipeline
    * actually consumes (VERDICT r6 ask #6 / r7 #7). */
  val SweepRetention = 0.95

  /** Append `recommended` to a sweep frame per the [[SweepRetention]]
    * rule. The global window is over the sweep's 3–5 rows, not data. */
  private[operators] def markRecommended(df: DataFrame, quality: Column,
      cost: Column, param: Column): DataFrame = {
    val wAll = Window.partitionBy()
    df.withColumn("_qmax", max(quality.cast(DoubleType)).over(wAll))
      .withColumn("recommended",
        row_number().over(wAll.orderBy(
          when(quality.cast(DoubleType) >= lit(SweepRetention) * col("_qmax"),
            0).otherwise(1),
          cost, param)) === 1)
      .drop("_qmax")
  }

  /** LSH operating-point sweep (d15) — the tuning table that picks the
    * band grid BEFORE a 100-TB dedup run commits to one: for each
    * (bands × rowsPerBand) tiling of the same K=16 minhash signatures,
    * the candidate-pair count (the work the grid generates) and the
    * verified ≥ τ count (the work that was worth it), with precision =
    * verified/candidates. More bands ⇒ higher recall but more candidate
    * verification; the published S-curve tradeoff measured on the actual
    * corpus instead of assumed. One shingle materialization feeds every
    * grid (signatures recompute per grid but candidates dominate);
    * evicted after eager materialization (the s06/d13 pattern). */
  def lshTuningAudit(s: SparkSession, dir: String): DataFrame = {
    val sh = shingledDocs(s, dir).persist()
    // one shingle->minhash aggregation serves every grid: a band key is
    // just an md5 fold of the SAME K signatures, so only the (cheap)
    // fold+explode differs per sweep point
    val sigs = signatures(sh).persist()
    val a = sh.select(col("doc_id").as("da"), col("sh").as("sha"))
    val b = sh.select(col("doc_id").as("db"), col("sh").as("shb"))
    val rows = LshTuningGrids.map { case (nb, rpb) =>
      val bands = bandKeysFromSigs(sigs, nb, rpb)
      val cands = bands.as("x").join(bands.as("y"),
          col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
            col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("da"), col("y.doc_id").as("db"))
        .distinct()
      val verified = cands.join(a, "da").join(b, "db")
        .select(col("da"), col("db"),
          size(array_intersect(col("sha"), col("shb"))).cast("long")
            .as("inter"),
          size(col("sha")).as("na"), size(col("shb")).as("nb"))
        .filter((col("inter").cast(DoubleType) /
          (col("na") + col("nb") - col("inter"))) >= JaccardThreshold)
      cands.agg(count(lit(1)).as("n_candidates"))
        .crossJoin(verified.agg(count(lit(1)).as("n_verified")))
        .select(lit(s"${nb}x$rpb").as("grid"),
          lit(nb).as("n_bands"), lit(rpb).as("rows_per_band"),
          col("n_candidates"), col("n_verified"),
          when(col("n_candidates") > 0,
            col("n_verified").cast(DoubleType) / col("n_candidates"))
            .otherwise(lit(1.0)).as("candidate_precision"))
    }
    val out = markRecommended(rows.reduce(_.unionByName(_)),
      quality = col("n_verified"), cost = col("n_candidates"),
      param = col("n_bands"))
    graft.plans.PlanCapture.note("pipeline", out)
    val materialized = out.localCheckpoint(true)
    sigs.unpersist()
    sh.unpersist()
    materialized
  }

  /** The band grid [[lshTuningAudit]] recommends — the (bands,
    * rowsPerBand) a production run passes back into [[minhashLsh]]. One
    * driver-side row from a 3-row tuning table (inherently a
    * plan-time decision, not a data-path collect). */
  def recommendedLshGrid(s: SparkSession, dir: String): (Int, Int) = {
    val r = lshTuningAudit(s, dir).filter(col("recommended")).head()
    (r.getAs[Int]("n_bands"), r.getAs[Int]("rows_per_band"))
  }

  // --- incremental dedup: new batch vs existing index ----------------------
  /** Every 1/[[IncrementalMod]]-th document plays the incoming batch; the
    * rest are the already-indexed corpus. */
  val IncrementalMod = 5

  /** Incremental near-dup ingest — what a 100-TB pipeline actually runs
    * per arriving batch: probe the NEW documents' LSH band keys against
    * the EXISTING index only, never re-pairing index×index (that work
    * happened when those documents arrived) and never batch×batch (a
    * separate, much smaller within-batch pass). Candidates = band-key
    * collisions between the two sides; verification = exact shingle
    * jaccard on candidates, as [[minhashLsh]]. One row per new document:
    * its index-match count and its best match (highest jaccard, smallest
    * index doc_id on ties), `matched = false` ⇒ the document is genuinely
    * new and enters the index.
    *
    * At scale the index side's band keys are a precomputed table the
    * batch probes with an equi-join on (band, bkey) — the probe cost is
    * proportional to the BATCH, not the corpus.
    */
  def incremental(s: SparkSession, dir: String): DataFrame =
    incremental(s, dir, bloomPruneIndex = false)

  /** [[incremental]] with an optional [[graft.ops.BloomPrune]] gate on
    * the index side (d07b): a bloom filter over the BATCH's band keys —
    * the model-sized artifact, built in one pass over the small side —
    * drops index band keys that cannot collide BEFORE the probe
    * exchange. At 100 TB the index band table is the corpus-sized side
    * of this join; without the gate every index key shuffles to meet a
    * batch that touches almost none of them. Blooms have no false
    * negatives, so the output is row-identical to the plain path (the
    * two entries share one oracle) — false positives only ride the
    * shuffle and fall out of the equi-join. */
  def incremental(s: SparkSession, dir: String,
      bloomPruneIndex: Boolean): DataFrame = {
    val docs = shingledDocs(s, dir)
    val isNew = col("doc_id") % IncrementalMod === 0
    val bands = bandKeys(docs)
    // the bloom path reads the batch's band keys twice (filter build +
    // probe join); localCheckpoint materializes the expensive
    // shingle→minhash pass once instead of re-deriving it per consumer
    // (eager, lineage-truncating — no session-cache entry to leak)
    val newBands = {
      val nb = bands.filter(isNew)
      if (bloomPruneIndex) {
        graft.plans.PlanCapture.note("batch_bands", nb)
        nb.localCheckpoint(true)
      } else nb
    }
    val idxBands = if (!bloomPruneIndex) bands.filter(!isNew) else {
      val key = concat_ws(":", col("band"), col("bkey"))
      val probe = newBands.select(key.as("k"))
      // expected-keys bound: batch docs × bands — a column-pruned count
      // of doc ids, NOT a count over the shingled band keys (which would
      // re-run the whole minhash pass just to size the filter; an
      // overestimate only makes the bloom bigger)
      val expected = math.max(1L,
        docs.filter(isNew).select(col("doc_id")).count() * Bands)
      val bloom = graft.ops.BloomPrune.buildFilter(probe, "k", expected)
      graft.ops.BloomPrune
        .semiPrune(bands.filter(!isNew).withColumn("k", key), "k", bloom)
        .drop("k")
    }
    val cands = newBands.as("x")
      .join(idxBands.as("y"),
        col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey"))
      .select(col("x.doc_id").as("nid"), col("y.doc_id").as("iid"))
      .distinct()
    val a = docs.select(col("doc_id").as("nid"), col("sh").as("sha"))
    val b = docs.select(col("doc_id").as("iid"), col("sh").as("shb"))
    val verified = cands.join(a, "nid").join(b, "iid")
      .select(col("nid"), col("iid"),
        size(array_intersect(col("sha"), col("shb"))).cast("long").as("inter"),
        size(col("sha")).as("na"), size(col("shb")).as("nb"))
      .select(col("nid"), col("iid"),
        (col("inter").cast(DoubleType) /
          (col("na") + col("nb") - col("inter"))).as("jaccard"))
      .filter(col("jaccard") >= JaccardThreshold)
    // best match per new doc: max jaccard, ties to the smallest index id
    // (min over (−jaccard, iid) — exact because both engines compare the
    // identical doubles); counts ride the same aggregation. The struct
    // buffer plans a SortAggregate; deliberate: it runs over the BOUNDED
    // candidate frame (∝ batch, never corpus), and the s07-style packed-
    // key rewrite is unavailable because a double's exact value can't be
    // folded into one fixed-scale decimal without tie-break drift vs the
    // oracle's double comparison
    val matches = verified.groupBy("nid").agg(
      count(lit(1)).as("n_index_matches"),
      min(struct((-col("jaccard")).as("nj"), col("iid").as("iid"))).as("best"))
    docs.filter(isNew).select(col("doc_id"))
      .join(matches, col("doc_id") === col("nid"), "left")
      .select(col("doc_id"),
        col("nid").isNotNull.as("matched"),
        coalesce(col("n_index_matches"), lit(0L)).as("n_index_matches"),
        coalesce(col("best.iid"), lit(-1L)).as("best_match_id"),
        coalesce(-col("best.nj"), lit(0.0)).as("best_jaccard"))
  }

  // --- near-dup cluster assignment (connected components) ------------------
  /** The step after pair finding that a dedup pipeline actually acts on:
    * group the verified near-dup pairs ([[minhashLsh]]) into connected
    * components and give every document a cluster id — the smallest doc_id
    * reachable through near-dup edges — with `is_keeper` marking the one
    * canonical document the pass retains per cluster.
    *
    * Min-label propagation run to FIXPOINT (each step: one join + one
    * aggregation; a `changed` count gates the next round). Near-dup
    * clusters have tiny diameter — labels settle in 2–3 rounds. At 100 TB
    * the same loop stands, with each round's labels persisted and the
    * previous round's freed, which is exactly what this does; the pair
    * edges (small: near-dup hits only) persist across rounds instead of
    * re-running LSH per iteration.
    */
  def clusters(s: SparkSession, dir: String): DataFrame =
    clusters(s, dir, minhashLsh(s, dir))

  /** [[clusters]] over an already-materialized pair table — at 100 TB the
    * d02 pairs are computed once per corpus snapshot and every consumer
    * (this, the p08 split, the t13 audit) reads that table instead of
    * re-running LSH. */
  def clusters(s: SparkSession, dir: String, pairTable: DataFrame): DataFrame = {
    val pairs = pairTable.select(col("da"), col("db"))
    val nodes = Tables.table(s, dir, "documents").select("doc_id")
    val (labels, rounds) = propagateMinLabels(nodes, pairs)
    org.slf4j.LoggerFactory.getLogger(getClass)
      .info(s"d06 cluster propagation converged in $rounds rounds")
    labels
      .select(col("doc_id"), col("cluster"),
        (col("cluster") === col("doc_id")).as("is_keeper"))
  }

  /** Cluster-size histogram (d11) — the dedup-quality audit over the d06
    * labels: how many clusters exist at each size. A healthy near-dup
    * graph is dominated by singletons and small clusters; one giant
    * component means boilerplate or a degenerate shingle space is
    * chaining unrelated documents together (and the p08 cluster-routed
    * split would dump a whole corpus slice into one split). This is the
    * evidence for tuning [[JaccardThreshold]] before trusting d06
    * downstream. Integer-only double rollup over the label table —
    * scale-free. Consumes a materialized cluster table in production;
    * the oracle entry self-computes. */
  def clusterSizeHistogram(s: SparkSession, dir: String): DataFrame =
    clusterSizeHistogram(s, dir, clusters(s, dir))

  /** [[clusterSizeHistogram]] over an already-materialized d06 cluster
    * label table. */
  def clusterSizeHistogram(s: SparkSession, dir: String,
      clusterTable: DataFrame): DataFrame =
    clusterTable.groupBy("cluster").agg(count(lit(1)).as("cluster_size"))
      .groupBy("cluster_size")
      .agg(count(lit(1)).as("n_clusters"), min("cluster").as("first_cluster"))

  /** Dedup funnel (d14) — the per-stage survivor report a dedup run
    * publishes (the dedup twin of t08's quality funnel): how many
    * documents and tokens survive each rung of the dedup ladder,
    * applied cumulatively — 1 exact (one keeper per identical text),
    * 2 bag (one keeper per token multiset — d12's normal form), 3
    * near-dup (one keeper per d06 cluster among the stage-2 survivors).
    * Keeper rule is min(doc_id) everywhere, which nests by
    * construction: the bag keeper is the min over a UNION of text
    * groups, hence also its own text group's min, so stage 2 ⊆ stage 1
    * without any explicit intersection. Stage 3 intersects explicitly
    * (bag-identical docs need not share shingles, so cluster keepers
    * are not automatically bag keepers). One doc-stats pass + three
    * keeper-set left joins + one conditional-sum aggregate unpivoted to
    * 4 rows — the t08 single-pass shape; consumes a materialized d06
    * cluster table in production, the oracle entry self-computes. */
  def dedupFunnel(s: SparkSession, dir: String): DataFrame =
    dedupFunnel(s, dir, clusters(s, dir))

  /** [[dedupFunnel]] over an already-materialized d06 cluster table. */
  def dedupFunnel(s: SparkSession, dir: String,
      clusterTable: DataFrame): DataFrame = {
    // width-normalize BEFORE the per-row tokenize/fingerprint, and put
    // the exchange AFTER it (the shingleFrame pattern): the four consumer
    // branches below then share one ReusedExchange instead of re-running
    // the tokenizer per branch on a one-partition scan
    val docs = Tables.spread(s, dir, "documents", "doc_id")
      .select(col("doc_id"), col("text"),
        size(tokens(col("text"))).cast("long").as("n_tokens"),
        bagFp(col("text")).as("bag_fp"))
      .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
    val s1 = docs.groupBy("text").agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"), lit(1L).as("in1"))
    val s2 = docs
      .groupBy("bag_fp").agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"), lit(1L).as("in2"))
    val s3 = s2.select("doc_id")
      .join(clusterTable.select("doc_id", "cluster"), "doc_id")
      .groupBy("cluster").agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"), lit(1L).as("in3"))
    val agg = docs.select("doc_id", "n_tokens")
      .join(s1, Seq("doc_id"), "left")
      .join(s2, Seq("doc_id"), "left")
      .join(s3, Seq("doc_id"), "left")
      .agg(count(lit(1)).as("c0"), sum(col("n_tokens")).as("t0"),
        sum(when(col("in1") === 1L, 1L).otherwise(0L)).as("c1"),
        sum(when(col("in1") === 1L, col("n_tokens")).otherwise(0L)).as("t1"),
        sum(when(col("in2") === 1L, 1L).otherwise(0L)).as("c2"),
        sum(when(col("in2") === 1L, col("n_tokens")).otherwise(0L)).as("t2"),
        sum(when(col("in3") === 1L, 1L).otherwise(0L)).as("c3"),
        sum(when(col("in3") === 1L, col("n_tokens")).otherwise(0L)).as("t3"))
    agg.select(expr(
      """stack(4,
        |  0, 'total',            c0, t0,
        |  1, 'exact',            c1, t1,
        |  2, 'bag',              c2, t2,
        |  3, 'near_dup_cluster', c3, t3)
        |  AS (stage, stage_name, docs_remaining, tokens_remaining)
        |""".stripMargin))
      .select(col("stage").cast("int").as("stage"), col("stage_name"),
        col("docs_remaining"), col("tokens_remaining"))
  }

  /** Min-label propagation to a PROVEN fixpoint. `nodes` = (doc_id),
    * `pairs` = undirected edges (da, db). Returns the converged labels and
    * the number of rounds used. The round cap is a runaway guard, not an
    * answer: hitting it without `changed == 0` throws rather than silently
    * returning half-propagated clusters (an adversarial chain-of-near-dups
    * component has diameter ≈ its length, one hop per round).
    */
  private[graft] def propagateMinLabels(nodes: DataFrame, pairs: DataFrame,
      maxRounds: Int = 50): (DataFrame, Int) = {
    val edges = pairs
      .union(pairs.select(col("db").as("da"), col("da").as("db")))
      .toDF("ea", "eb")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var labels = nodes.select(col("doc_id"), col("doc_id").as("cluster"))
    var changed = 1L
    var round = 0
    while (changed > 0 && round < maxRounds) {
      val nbrMin = edges.join(labels, col("eb") === col("doc_id"))
        .groupBy(col("ea")).agg(min(col("cluster")).as("nbr_min"))
      // keep the pre-update label alongside: `changed` then reads off this
      // frame directly instead of re-joining next against labels (one
      // fewer shuffle join per round). localCheckpoint (eager) BREAKS THE
      // LINEAGE: `labels` feeds two operators per round, so without
      // truncation the logical plan doubles every round — on a long-chain
      // component the plan tree itself becomes the bottleneck long before
      // the data does. Superseded checkpoint RDDs are dropped by the
      // context cleaner once unreferenced.
      val step = labels.join(nbrMin, col("doc_id") === col("ea"), "left")
        .select(col("doc_id"), col("cluster").as("old_cluster"),
          least(col("cluster"), coalesce(col("nbr_min"), col("cluster")))
            .as("cluster"))
        .localCheckpoint()
      changed = step.filter(col("cluster") =!= col("old_cluster")).count()
      labels = step.select("doc_id", "cluster")
      round += 1
    }
    if (changed > 0)
      throw new IllegalStateException(
        s"cluster propagation did not converge within $maxRounds rounds " +
          s"($changed labels still moving) — raise maxRounds or check for " +
          "a pathological long-chain component")
    (labels, round)
  }

  // --- SimHash fingerprint -------------------------------------------------
  // 128-bit fingerprint as 32 hex nibbles: per-nibble-bit majority vote over
  // md5(token) of the distinct tokens. One explode + two aggregations —
  // linear in corpus size, shuffle keyed by doc. (A measured dead end: a
  // single doc-keyed aggregation carrying all 128 bit counters as columns
  // benched 1.8× SLOWER at sf0.1 — the generated update method for a
  // 65-column buffer blows past the JIT's method-size budget and runs
  // interpreted; the narrow two-level shape stays compiled.)
  def simhash(s: SparkSession, dir: String): DataFrame = {
    // spread: the token explode fans 5k docs into 1.7M contrib rows — from
    // a single-split scan that generation would run on one core
    val toks = Tables.spread(s, dir, "documents", "doc_id")
      .select(col("doc_id"), explode(array_distinct(tokens(col("text")))).as("tok"))
      .withColumn("h", md5(col("tok")))
    // one row per (doc, token, nibble-position); the four bit-majority
    // sums ride as aggregate columns instead of a ×4 row explode — 1.7M
    // rows through one aggregation rather than 7M through two.
    val contrib = toks
      .select(col("doc_id"), col("h"), explode(sequence(lit(0), lit(31))).as("pos"))
      .withColumn("v", expr("instr('0123456789abcdef', substring(h, pos + 1, 1)) - 1"))
    val bitSums = (0 to 3).map(b =>
      sum(expr(s"(shiftright(v, $b) % 2) * 2 - 1")).as(s"s$b"))
    val nibbles = contrib.groupBy("doc_id", "pos")
      .agg(bitSums.head, bitSums.tail: _*)
      .withColumn("nib", expr(
        "(CASE WHEN s0 > 0 THEN 1 ELSE 0 END) + 2 * (CASE WHEN s1 > 0 THEN 1 ELSE 0 END)" +
          " + 4 * (CASE WHEN s2 > 0 THEN 1 ELSE 0 END) + 8 * (CASE WHEN s3 > 0 THEN 1 ELSE 0 END)"))
      .withColumn("hexc", expr("substring('0123456789abcdef', CAST(nib AS INT) + 1, 1)"))
    nibbles.groupBy("doc_id")
      .agg(array_join(transform(array_sort(collect_list(struct(col("pos"), col("hexc")))),
        x => x.getField("hexc")), "").as("simhash128"))
  }

  // --- n-gram jaccard (exact, postings-join bounded) -----------------------
  // Candidates = pairs sharing ≥1 NON-HOT shingle; scored exactly over the
  // FULL shingle sets, so surviving pairs' scores are unchanged by the cap.
  //
  // The document-frequency cap is the 100-TB guard: a boilerplate shingle
  // in d documents alone produces d²/2 candidate pairs (a license header in
  // 1% of a 100-TB corpus would be ~10¹² pairs). Dropping shingles with
  // df > max(floor, fraction·N) from CANDIDATE GENERATION bounds the pair
  // blowup while exact re-scoring keeps every surviving score identical; a
  // ≥0.8-jaccard pair whose shared shingles are ALL corpus-ubiquitous does
  // not exist in practice (verified: zero qualifying pairs lost at sf0.01
  // and sf0.1, where the cap prunes 29 and 1209 hot shingles).
  val DfCapFloor = 5
  val DfCapFraction = 0.003

  def ngramJaccard(s: SparkSession, dir: String): DataFrame =
    ngramJaccardOf(s, Tables.table(s, dir, "documents"))

  /** [[ngramJaccard]] over an arbitrary (doc_id, text, …) corpus — the
    * spec entry point for adversarial corpora. Width-normalizes BEFORE
    * shingling (see [[shingledDocs]]): a small corpus arrives as one file
    * = one partition, and this 5-branch DAG recomputes scan+shingle per
    * branch — serially, on one core, ~6 s of the sf0.1 runtime. The
    * SECOND exchange, after the shingle pass, is the branch
    * materialization point (p05 pattern): postings, cap, and both
    * verify-join sides read the shingled rows from one ReusedExchange
    * instead of re-running the regexes per branch. */
  private[graft] def ngramJaccardOf(s: SparkSession, raw: DataFrame): DataFrame =
    ngramJaccardShingled(s, shingleFrame(s, raw))

  /** [[ngramJaccard]] over an already-shingled `(doc_id, sh)` frame —
    * hand it a persisted [[shingledDocs]] to share the shingle pass with
    * other audits in the same session ([[Sampling.shingleAuditSuite]]). */
  def ngramJaccardShingled(s: SparkSession, docs: DataFrame): DataFrame = {
    val ex = docs.select(col("doc_id"), size(col("sh")).as("n"),
      explode(col("sh")).as("s"))
    // df cap as a broadcast scalar (no collect; the 1-row cross join is a
    // broadcast, not a shuffle)
    val cap = docs.agg(greatest(lit(DfCapFloor.toLong),
      floor(lit(DfCapFraction) * count(lit(1)))).as("cap"))
    // Prefix filtering (AllPairs/PPJoin): under a global canonical order, a
    // pair with jaccard ≥ τ MUST collide within the first
    // ⌊(1−τ)·|sh|⌋ + 1 shingles of each side — so only those prefixes need
    // to be indexed for candidate generation. Order rarest-first (df asc)
    // so the indexed prefix holds each doc's most selective shingles: at
    // τ=0.8 this joins ~20% of the postings and shrinks pair-occurrences
    // quadratically (sf0.1: 1.1M → ~50k). Combined with the df cap,
    // candidates stay bounded even on a boilerplate-heavy corpus.
    // Document frequency comes from a window over the postings (one
    // shuffle on s) rather than an aggregate + join-back, which re-ran the
    // whole shingle pipeline for the aggregate branch.
    val wS = Window.partitionBy(col("s"))
    val exKept = ex.withColumn("d", count(lit(1)).over(wS))
      .crossJoin(broadcast(cap))
      .filter(col("d") <= col("cap"))
      .select(col("doc_id"), col("n"), col("s"), col("d"))
    val wDoc = Window.partitionBy(col("doc_id"))
      .orderBy(col("d").asc, col("s").asc)
    // Prefix length n − ⌈τ·n⌉ + 1 in EXACT integer arithmetic (τ = 4/5):
    // the double form floor((1−τ)·n) is one short whenever 5 | n, because
    // 1.0−0.8 = 0.1999…96 — which silently drops qualifying pairs.
    val prefixLen = col("n") - expr("(4 * n + 4) div 5") + 1
    val prefix = exKept.withColumn("rn", row_number().over(wDoc))
      .filter(col("rn") <= prefixLen)
      .select("doc_id", "s")
    val cands = prefix.as("a").join(prefix.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .distinct()
    // Exact re-score over the FULL shingle SETS, one row per candidate
    // pair: two equi-joins on doc_id pull in each side's (distinct) shingle
    // array and `array_intersect` counts the overlap map-side. The earlier
    // shape — re-exploding candidates through a 3-way postings join —
    // pushed |cands|·|shingles| rows through a shuffle and was 10× slower
    // at sf0.1; this one moves |cands| rows + the docs table only.
    val a = docs.select(col("doc_id").as("da"), col("sh").as("sha"))
    val b = docs.select(col("doc_id").as("db"), col("sh").as("shb"))
    cands.join(a, "da").join(b, "db")
      .select(col("da"), col("db"),
        size(array_intersect(col("sha"), col("shb"))).cast("long").as("inter"),
        size(col("sha")).as("na"), size(col("shb")).as("nb"))
      .select(col("da"), col("db"),
        (col("inter").cast(DoubleType) /
          (col("na") + col("nb") - col("inter"))).as("jaccard"))
      .filter(col("jaccard") >= JaccardThreshold)
  }

  // --- containment (doc-in-doc) dedup --------------------------------------
  /** Shingle-containment threshold for [[containment]]: τ = 9/10. */
  val ContainmentThreshold = 0.9

  /** Asymmetric containment dedup (d08): flags INNER documents whose
    * shingle set is ≥ τ contained in another document — the quoted
    * article, the doc-embedded-in-boilerplate, the partial copy that
    * symmetric jaccard (d04) misses because the big container dilutes
    * the union. Directional output: one row per (inner, outer) pair with
    * the exact containment |inner ∩ outer| / |inner|.
    *
    * Same candidate machinery as d04 with one asymmetry: the AllPairs
    * prefix bound applies to the CONTAINED side only (containment ≥ τ
    * forces a collision within inner's first n − ⌈τ·n⌉ + 1 rarest kept
    * shingles — at most (1−τ)·n of inner's shingles can be absent from
    * the container — while the container's prefix is unbounded, so its
    * full df-capped postings are indexed). Prefix length in exact
    * integer arithmetic (τ = 9/10); the df cap bounds the pair blowup at
    * 100 TB exactly as in d04, and capping is df-global so it never
    * drops a kept collision asymmetrically. Exact re-score over full
    * shingle sets keeps surviving scores cap-independent. */
  def containment(s: SparkSession, dir: String): DataFrame =
    containmentOf(s, Tables.table(s, dir, "documents"))

  /** [[containment]] over an arbitrary (doc_id, text, …) corpus — the
    * spec entry point for crafted doc-in-doc corpora. */
  private[graft] def containmentOf(s: SparkSession, raw: DataFrame): DataFrame =
    containmentShingled(s, shingleFrame(s, raw))

  /** [[containment]] over an already-shingled `(doc_id, sh)` frame (see
    * [[ngramJaccardShingled]]). */
  def containmentShingled(s: SparkSession, docs: DataFrame): DataFrame = {
    val ex = docs.select(col("doc_id"), size(col("sh")).as("n"),
      explode(col("sh")).as("s"))
    val cap = docs.agg(greatest(lit(DfCapFloor.toLong),
      floor(lit(DfCapFraction) * count(lit(1)))).as("cap"))
    val wS = Window.partitionBy(col("s"))
    val exKept = ex.withColumn("d", count(lit(1)).over(wS))
      .crossJoin(broadcast(cap))
      .filter(col("d") <= col("cap"))
      .select(col("doc_id"), col("n"), col("s"), col("d"))
    val wDoc = Window.partitionBy(col("doc_id"))
      .orderBy(col("d").asc, col("s").asc)
    // Count-bounded prefix (the PPJoin count filter, containment form).
    // missBudget = ⌊(1−τ)·n⌋ in exact integer arithmetic (the double form
    // drops a slot whenever 10 | n — the d04 lesson): a container holding
    // ≥ τ of inner's shingles misses at most missBudget of them, so among
    // inner's first k indexed rarest shingles it must match ≥ k −
    // missBudget. Indexing 2·missBudget + 1 (instead of the minimal
    // missBudget + 1) raises that evidence requirement from ≥ 1 shared
    // rare shingle to ≥ missBudget + 1 — which collapses the candidate
    // set from every-pair-sharing-one-rare-shingle (~133k at sf0.1, each
    // paying an array-intersect verify) to the genuinely overlapping
    // pairs, at the price of a 2× wider posting index. The count bound is
    // exact, so no qualifying pair is lost.
    val missBudget = col("n") - expr("(9 * n + 9) div 10")
    val prefix = exKept.withColumn("rn", row_number().over(wDoc))
      .filter(col("rn") <= lit(2) * missBudget + 1)
      .select(col("doc_id"), col("n"), col("s"))
    // k_idx = rows actually indexed (short or heavily-capped docs index
    // fewer than 2·missBudget + 1); the per-pair requirement adapts
    val kIdx = prefix.groupBy(col("doc_id"), col("n"))
      .agg(count(lit(1)).as("k_idx"))
      .select(col("doc_id").as("inner_id"),
        greatest(lit(1L),
          col("k_idx") - (col("n") - expr("(9 * n + 9) div 10")))
          .as("required"))
    val cands = prefix.as("a").join(exKept.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") =!= col("b.doc_id"))
      .groupBy(col("a.doc_id").as("inner_id"), col("b.doc_id").as("outer_id"))
      .agg(count(lit(1)).as("hits"))
      .join(kIdx, "inner_id")
      .filter(col("hits") >= col("required"))
      .select("inner_id", "outer_id")
    val a = docs.select(col("doc_id").as("inner_id"), col("sh").as("sha"))
    val b = docs.select(col("doc_id").as("outer_id"), col("sh").as("shb"))
    cands.join(a, "inner_id").join(b, "outer_id")
      .select(col("inner_id"), col("outer_id"),
        size(array_intersect(col("sha"), col("shb"))).cast("long").as("inter"),
        size(col("sha")).cast("long").as("n_inner"))
      .select(col("inner_id"), col("outer_id"), col("n_inner"),
        col("inter").as("n_overlap"),
        (col("inter").cast(DoubleType) / col("n_inner")).as("containment"))
      .filter(col("containment") >= ContainmentThreshold)
  }

  // --- embedding-cosine near-dup ------------------------------------------
  // Exact-decimal dot products (order-independent → engine-exact doubles).
  // Threshold 0.5 is calibrated to this corpus (max cosine ≈ 0.6);
  // production near-dup would use ~0.95, where the banded buckets below
  // get far more selective (collision prob per band rises with cosine).
  val CosineThreshold = 0.5

  /** Banded random-hyperplane LSH for candidate generation: a pair is a
    * candidate iff its sign-pattern buckets agree in at least one band.
    * 12 bands × 4 planes ⇒ P[candidate] = 1 − (1 − p^4)^12 with
    * p = 1 − θ/π; ≈ 1.0 for cosine ≥ 0.5 on this corpus (verified: every
    * qualifying pair at sf0.01 and sf0.1 collides in ≥1 band), while
    * keeping the plan an equi-join on (band, bucket) — the 100-TB shape —
    * instead of an all-pairs BroadcastNestedLoopJoin.
    *
    * [[EmbPlanesPerBand]] is the FLOOR of the per-band plane count, not
    * the count itself: since round 14 the geometry is corpus-adaptive
    * ([[adaptiveEmbPlanes]]) — the r13 scale study measured the fixed
    * 12 × 2^4 bucket space saturating (192 occupied groups at every
    * scale), which made candidate occurrences quadratic once full
    * (1.58M → 158M → 631M at sf0.1/10×/20×). Fixture corpora (≤ 2,000
    * vectors) stay at the floor, so their buckets are bit-identical to
    * the pre-adaptive engine. */
  val EmbBands = 12
  val EmbPlanesPerBand = 4
  val EmbSeed = "d"

  /** Ceiling of the adaptive plane ladder: weights exist for
    * `EmbBands × EmbPlanesMax` hyperplanes, supporting corpora up to
    * `EmbTargetOccupancy · 2^16` ≈ 8.2M vectors per banding SCOPE before
    * the per-bucket expectation exceeds the target. PAST the ceiling the
    * recipe is partition scoping, not more planes: band within natural
    * corpus scopes (source shard, ingest date, language) so per-scope N
    * stays under `T·2^16` and each scope derives its own rung —
    * [[embeddingCosineScoped]] (d27) is that recipe as an operator (one
    * banding pass, per-scope prefix truncation, within-scope pairing).
    * A 10¹⁰-vector corpus over daily × source scopes of ≤8M vectors each
    * runs the same plan; [[adaptiveEmbPlanes]] itself simply pins to the
    * ceiling for any larger N (never overflows — the rung comparison is
    * a Long shift, max `125·2^15`). */
  val EmbPlanesMax = 16

  /** Target EXPECTED occupancy per (band, bucket) group — the constant
    * the adaptive ladder holds: with 2^P ≥ N / EmbTargetOccupancy
    * buckets per band, uniform-hash candidate pairs per band are
    * ≈ N·T/2, i.e. LINEAR in the corpus where the fixed geometry was
    * quadratic. 125 is sized so the bench corpus (sf0.1, N = 2,000)
    * sits exactly at the floor geometry's saturation edge — larger
    * corpora immediately earn more buckets. */
  val EmbTargetOccupancy = 125L

  /** Planes-per-band for a corpus of `n` vectors: the smallest
    * `P ∈ [EmbPlanesPerBand, EmbPlanesMax]` with `n ≤ T·2^P`. A pure
    * integer ladder — replayed term-for-term by the DuckDB oracle as a
    * CASE chain, so there is no float-boundary risk (the
    * [[graft.operators.Similarity.adaptiveStride]] playbook applied to
    * the r13 study's one remaining scale-killer). More planes narrow
    * each band's collision probability (p^P per band), so the adaptive
    * default trades tail recall near the threshold for linear candidate
    * growth — the SemDeDup-style trade a 100-TB near-dup pass makes;
    * the explicit `planes` parameter on [[embBandKeys]] remains the
    * per-deployment recall knob, sized by [[embPlanesSweep]] (d26). */
  def adaptiveEmbPlanes(n: Long): Int = {
    var p = EmbPlanesPerBand
    while (p < EmbPlanesMax && n > (EmbTargetOccupancy << p)) p += 1
    p
  }

  /** [[adaptiveEmbPlanes]] over a corpus frame (memoized count — shared
    * with [[semStrideOf]]'s, which keys the same full-frame plan). */
  private[graft] def adaptiveEmbPlanesOf(e: DataFrame): Int =
    adaptiveEmbPlanes(graft.ops.CorpusCount.memo(e))

  /** Flat md5-weight slot of (band `b`, plane `p`): planes below the
    * [[EmbPlanesPerBand]] floor keep their legacy flat slots
    * (`b·4 + p` — floor-geometry buckets are bit-identical to the
    * pre-adaptive engine), extension planes draw fresh slots past the
    * legacy range. The arrangement makes every band's bit string
    * PREFIX-STABLE in `P`: bucket(P planes) = substr(bucket(Pmax), 1, P)
    * — the property the oracle's replay relies on (it materializes all
    * [[EmbPlanesMax]] bits and truncates by its own count-derived P). */
  private[graft] def embPlaneSlot(b: Int, p: Int): Int =
    if (p < EmbPlanesPerBand) b * EmbPlanesPerBand + p
    else EmbBands * EmbPlanesPerBand +
      b * (EmbPlanesMax - EmbPlanesPerBand) + (p - EmbPlanesPerBand)

  // lazy val, not def: the weight table is 192 planes × 64 dims of
  // md5-derived ints, and embBandKeys reads it once per (band, plane) —
  // as a def that was ~590k md5 digests of driver time per call (the
  // r14 bench regression on the whole d05 family)
  private[graft] lazy val embPlaneWeights: Seq[Seq[Int]] =
    Similarity.planeWeightsSeeded(EmbSeed, EmbBands * EmbPlanesMax)

  private[operators] def dec(c: Column): Column = c.cast(DecimalType(12, 6))

  /** Exact-decimal dot product of two float-array columns — the numeric
    * contract is DECIMAL(12,6) per element, exact scale-12 products and
    * sum, surfaced as DECIMAL(30,12). Implemented by the codegen'd
    * [[graft.functions.DecimalVecDot]] native expression (bit-identical to
    * the earlier `aggregate(zip_with(...))` fold, which interpreted a
    * lambda and built an intermediate array per pair — the hot cost of
    * every similarity re-score). */
  private[operators] def dotDec(a: Column, b: Column): Column =
    graft.functions.DecimalVecDot.decimal_vec_dot(a, b)

  /** sqrt of the exact-decimal self-dot, as double. */
  private[operators] def normD(v: Column): Column =
    sqrt(dotDec(v, v).cast(DoubleType))

  /** Per-document substring-duplication exposure (d10) — the corpus-level
    * duplication metric a curation pipeline reports before and after
    * dedup (the Lee et al. "Deduplicating Training Data" measurement
    * family): for each document, how many of its distinct n-gram
    * shingles also occur in at least one OTHER document, and the exposed
    * fraction. A doc with high dup_rate but no ≥τ near-dup pair is
    * boilerplate-assembled — exactly what d02/d04 miss by design — so
    * this is the audit that decides whether span-level dedup is needed.
    * One shingle-keyed window (docs-per-shingle) + one doc-keyed rollup
    * over the shared [[shingledDocs]] pass; both shuffles key on
    * high-cardinality columns, so the shape holds at any corpus size.
    * dup_rate is one division of two exact integers — engine-exact. */
  def substringDupRate(s: SparkSession, dir: String): DataFrame = {
    val docs = shingledDocs(s, dir)
    val ex = docs.select(col("doc_id"), explode(col("sh")).as("s"))
    val wS = Window.partitionBy(col("s"))
    // shingles are per-doc distinct, so rows-per-shingle = docs-per-shingle
    ex.withColumn("docs_with", count(lit(1)).over(wS))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("docs_with") >= 2, 1L).otherwise(0L))
          .as("n_dup_shingles"))
      .select(col("doc_id"), col("n_shingles"), col("n_dup_shingles"),
        (col("n_dup_shingles").cast(DoubleType) / col("n_shingles"))
          .as("dup_rate"))
  }

  /** Passage length (tokens) for [[passageCuts]]: the exact-substring
    * dedup granularity — windows shorter than this are treated as chance
    * collisions, longer repeats emerge as merged spans. */
  val PassageLen = 8

  def passageCuts(s: SparkSession, dir: String): DataFrame =
    passageCutsOf(Tables.table(s, dir, "documents"))

  /** Passage-level exact-substring dedup (d16) — the actionable operator
    * [[substringDupRate]]'s audit motivates (the Lee et al. span-removal
    * family): fingerprint every [[PassageLen]]-token window at stride 1,
    * exempt each fingerprint's canonical first occurrence (smallest
    * (doc_id, pos) — deterministic in both engines), and merge the
    * remaining duplicated windows per document into maximal token spans
    * (gaps-and-islands over window positions with a running max-end).
    * Output is the CUT LIST a span-removal writer applies: (doc_id,
    * span_start, span_end, n_windows, n_tokens_cut) — boilerplate
    * passages shared across documents collapse to one surviving copy.
    *
    * Scale shape: the window explode multiplies rows by ~tokens/doc but
    * each row narrows to (doc_id, pos, md5) BEFORE any exchange — the
    * token array never shuffles. Both window passes key on
    * high-cardinality columns (fingerprint, then doc_id); everything is
    * integer/hash arithmetic, so the oracle matches bit-for-bit. */
  def passageCutsOf(docs: DataFrame): DataFrame = {
    import TextPrep.tokens
    val W = PassageLen
    val win = docs
      .select(col("doc_id"), tokens(col("text")).as("t"))
      .filter(size(col("t")) >= W)
      .select(col("doc_id"),
        explode(sequence(lit(0L), (size(col("t")) - W).cast("long")))
          .as("pos"),
        col("t"))
      .select(col("doc_id"), col("pos"),
        md5(concat_ws(" ",
          slice(col("t"), (col("pos") + 1).cast("int"), lit(W)))).as("fp"))
    val wF = Window.partitionBy(col("fp"))
    val cuts = win
      .withColumn("n_occ", count(lit(1)).over(wF))
      .withColumn("rk", row_number().over(wF.orderBy(col("doc_id"), col("pos"))))
      .filter(col("n_occ") >= 2 && col("rk") >= 2)
      .select("doc_id", "pos")
    val wD = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    cuts
      .withColumn("prev_end", max(col("pos") + W)
        .over(wD.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("brk", when(col("prev_end").isNull ||
        col("pos") > col("prev_end"), 1L).otherwise(0L))
      .withColumn("island",
        sum(col("brk")).over(wD.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("doc_id"), col("island"))
      .agg(min(col("pos")).as("span_start"),
        (max(col("pos")) + W).as("span_end"),
        count(lit(1)).as("n_windows"))
      .select(col("doc_id"), col("span_start"), col("span_end"),
        col("n_windows"),
        (col("span_end") - col("span_start")).as("n_tokens_cut"))
  }

  /** Cut accounting (d17) — the "how much data actually survives"
    * rollup that makes [[passageCutsOf]] actionable: per language,
    * document count, total token mass, tokens inside d16 cut spans,
    * the net token mass a writer would emit after span removal, and the
    * cut rate. The number a data owner multiplies by epochs before
    * committing to a crawl — computed from the SAME cut list the writer
    * applies, so plan and execution cannot disagree. One per-doc span
    * rollup joined back to a narrow (doc, lang, tokens) frame, then one
    * lang-keyed aggregation; counts exact, the rate one boundary
    * division. */
  def cutAccounting(s: SparkSession, dir: String): DataFrame = {
    import TextPrep.tokens
    val docs = Tables.table(s, dir, "documents")
      .select(col("doc_id"), col("lang"),
        size(tokens(col("text"))).cast("long").as("n_tokens"))
    val cutPerDoc = passageCuts(s, dir)
      .groupBy("doc_id").agg(sum(col("n_tokens_cut")).as("cut"))
    docs.join(cutPerDoc, Seq("doc_id"), "left")
      .select(col("lang"), col("n_tokens"),
        coalesce(col("cut"), lit(0L)).as("cut"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("tokens_total"),
        sum(col("cut")).as("tokens_cut"))
      .select(col("lang"), col("n_docs"), col("tokens_total"),
        col("tokens_cut"),
        (col("tokens_total") - col("tokens_cut")).as("net_tokens"),
        (col("tokens_cut").cast(DoubleType) / col("tokens_total"))
          .as("cut_rate"))
  }

  /** Normed embedding frame, width-normalized (Tables.spread): one small
    * parquet file = one split, which would run every exact-decimal
    * norm/dot on a single core. The second exchange AFTER the norm
    * projection is the branch materialization point (p05 pattern): the
    * band explode and both verify-join sides reuse one normed pass
    * instead of re-running the exact-decimal self-dot per branch. */
  private def embNormed(s: SparkSession, dir: String): DataFrame =
    Tables.spread(s, dir, "embeddings", "vec_id")
      .select(col("vec_id"), col("embedding"),
        normD(col("embedding")).as("nrm"))
      .repartition(s.sparkContext.defaultParallelism, col("vec_id"))

  /** Banded sign-pattern band keys `(vec_id, band, bucket)` — zero
    * shuffle, one codegen'd dot per plane. `planes` defaults to the
    * corpus-adaptive ladder (one memoized driver-side count); pass an
    * explicit value to pin a deployment's recall contract. */
  private[graft] def embBandKeys(e: DataFrame): DataFrame =
    embBandKeys(e, adaptiveEmbPlanesOf(e))

  private[graft] def embBandKeys(e: DataFrame, planes: Int,
      keep: Seq[String] = Nil): DataFrame = {
    import graft.functions.FloatVecDot.float_vec_dot
    require(planes >= 1 && planes <= EmbPlanesMax,
      s"planes $planes outside [1, $EmbPlanesMax]")
    val bandStructs = (0 until EmbBands).map { b =>
      val bits = (0 until planes).map { p =>
        val ws = embPlaneWeights(embPlaneSlot(b, p))
        val wArr = array(ws.map(x => lit(x.toFloat)): _*)
        when(float_vec_dot(col("embedding"), wArr) >= 0, lit("1"))
          .otherwise(lit("0"))
      }
      struct(lit(b).as("band"), concat(bits: _*).as("bucket"))
    }
    val carried = keep.map(col)
    e.select(col("vec_id") +: carried :+
        explode(array(bandStructs: _*)).as("bk"): _*)
      .select(col("vec_id") +: carried :+ col("bk.band").as("band") :+
        col("bk.bucket").as("bucket"): _*)
  }

  /** Two-phase exact verification of candidate pairs `(va, vb)`: a
    * codegen'd double dot prunes (|double − exact| ≪ 1e-9 here, margin
    * 1e-6 is generous), then the surviving handful is re-scored with
    * exact decimals — identical output to scoring every candidate
    * exactly, ~100× cheaper.
    *
    * No presentation sort here (r16): the former `.orderBy(va, vb)` put
    * a rangepartitioning Exchange — plus the range partitioner's
    * sampling pass — inside EVERY consumer, including the d18/d19/d28
    * aggregation paths where row order is semantically dead. The
    * declared pair queries (d05/d05b/d27/d27b) canonicalize at the
    * harness tail instead (`SparkEntry.canon("va", "vb")` —
    * repartition(1) + in-partition sort gives the identical total
    * order on the answer-sized output without the sampling pass). */
  private def embVerify(e: DataFrame, cands: DataFrame): DataFrame = {
    import graft.functions.FloatVecDot.float_vec_dot
    cands
      .join(e.as("a"), col("va") === col("a.vec_id"))
      .join(e.as("b"), col("vb") === col("b.vec_id"))
      .withColumn("approx_cos",
        float_vec_dot(col("a.embedding"), col("b.embedding")) /
          (col("a.nrm") * col("b.nrm")))
      .filter(col("approx_cos") > CosineThreshold - 1e-6)
      .select(col("va"), col("vb"),
        (dotDec(col("a.embedding"), col("b.embedding")).cast(DoubleType) /
          (col("a.nrm") * col("b.nrm"))).as("cos_sim"))
      .filter(col("cos_sim") > CosineThreshold)
  }

  def embeddingCosine(s: SparkSession, dir: String): DataFrame =
    lshPairs(embNormed(s, dir))

  /** d05 at an EXPLICIT planes-per-band — the deployment-pinned recall
    * contract ([[graft.operators.DedupDeployment]] records the chosen P
    * beside the corpus so re-runs and rebuilds honor it; the adaptive
    * ladder remains the default when nothing is recorded). Identical
    * verification, identical output shape; only the candidate geometry
    * is pinned. */
  def embeddingCosineAt(s: SparkSession, dir: String, planes: Int): DataFrame =
    lshPairs(embNormed(s, dir), Some(planes))

  /** d05's verified ≥τ pair table over an already-normed embedding frame
    * — shared with the d19 agreement audit so both read one `e`.
    *
    * Scale note: the band/bucket GEOMETRY is the corpus-size knob here,
    * exactly as the centroid stride is for IVF — and since round 14 the
    * DEFAULT is corpus-adaptive ([[adaptiveEmbPlanes]]: bucket space
    * grows with N at constant expected occupancy, so candidate
    * occurrences are ≈ linear where the r13 study measured the fixed
    * 12 × 2^4 space going quadratic once saturated: 1.58M → 158M → 631M
    * at sf0.1/10×/20×, each occurrence pulling two 64-float arrays into
    * the exact verify). The derivation is one memoized driver-side
    * count, replayed term-for-term by the DuckDB oracle (integer CASE
    * ladder + prefix truncation of [[EmbPlanesMax]] materialized bits),
    * so fixtures stay deterministic at every corpus size. The trade is
    * recall near the threshold (per-band collision is p^P), which is
    * why the explicit `planes` parameter remains the per-deployment
    * recall knob — [[embPlanesSweep]] (d26) is the instrument that
    * sizes it, published with d15's recommended rule.
    * [[embeddingCosineSalted]] (d05b) stays the skew insurance: the
    * ladder bounds the EXPECTED occupancy, salting bounds a hot cell. */
  private def lshPairs(e: DataFrame, planes: Option[Int] = None): DataFrame = {
    import graft.functions.FloatVecDot.float_vec_dot
    // SCORE WHERE GENERATED (the q44 r15 lesson applied to the LSH
    // verify): the band keys carry their vector payload into the
    // self-join, so the approx cosine filter runs INSIDE the join stage
    // and candidate occurrences die before any exchange. The former
    // shape shuffled every occurrence through a distinct and then joined
    // the id pairs back against `e` twice — at 100× that exchanged
    // ~165M occurrence rows plus two array-wide pair joins per pass,
    // which (not the banding) dominated d05's wall time (268 s → the
    // in-stage filter leaves only the ≥τ-ish survivors, a set the size
    // of the ANSWER, to cross an exchange). A pair colliding in several
    // bands evaluates the filter once per collision (same verdict each
    // time — the predicate is a pure function of the two vectors) and
    // the tiny survivor distinct dedups it; the exact-decimal re-score
    // (embVerify) is unchanged, so the output — and the DuckDB oracle —
    // is bit-identical.
    val p = planes.getOrElse(adaptiveEmbPlanesOf(e))
    val bbp = embBandKeys(e, p, keep = Seq("embedding", "nrm"))
    val survivors = bbp.as("x").join(bbp.as("y"),
        col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket") &&
          col("x.vec_id") < col("y.vec_id"))
      .filter(float_vec_dot(col("x.embedding"), col("y.embedding")) /
        (col("x.nrm") * col("y.nrm")) > CosineThreshold - 1e-6)
      .select(col("x.vec_id").as("va"), col("y.vec_id").as("vb"))
      .distinct()
    embVerify(e, survivors)
  }

  /** Hot-band occupancy threshold for [[embeddingCosineSalted]]: a
    * (band, bucket) group holding more vectors than this gets its
    * candidate self-join grid-decomposed. The default is sized so the
    * fixture corpora stay on the plain path (their max occupancy is well
    * below it) while a skewed corpus — the s10 audit's alarm condition —
    * triggers decomposition. */
  val EmbHotBucketThreshold = 1000L

  /** d05 with skew handling driven by the same per-bucket occupancy
    * evidence the s10 index-balance audit reports: (band, bucket) groups
    * above `hotThreshold` vectors have their candidate self-join
    * decomposed over a salts×salts grid ([[graft.ops.SaltedJoin
    * .selfPairsSalted]]) so one hot LSH band no longer serializes the
    * stage — the n² pair workload of a hot bucket spreads over salts²
    * shuffle cells. Output is bit-identical to [[embeddingCosine]] (the
    * grid meets each pair exactly once; verification is unchanged), so
    * the two share one oracle. At 100 TB this is the re-bucketing path
    * an operator turns on when s10's max_share alarm fires — or leaves
    * on permanently, since cold groups pay only the distributed
    * occupancy probe and a broadcast of the (few) hot keys. */
  def embeddingCosineSalted(s: SparkSession, dir: String,
      hotThreshold: Long = EmbHotBucketThreshold, salts: Int = 8): DataFrame = {
    import graft.functions.FloatVecDot.float_vec_dot
    val e = embNormed(s, dir)
    // payload rides the banding and the (possibly grid-decomposed)
    // self-join so the approx filter runs in-stage — the lshPairs r15
    // shape on the skew-insurance path, same bit-identical output
    val bbp = embBandKeys(e, adaptiveEmbPlanesOf(e),
      keep = Seq("embedding", "nrm"))
    // the s10 occupancy evidence: distributed aggregate over the banded
    // index, hot keys broadcast back (see selfPairsSaltedByOccupancy)
    val cands = graft.ops.SaltedJoin
      .selfPairsSaltedByOccupancy(bbp, Seq("band", "bucket"), "vec_id",
        hotThreshold, salts, keep = Seq("embedding", "nrm"))
      .filter(float_vec_dot(col("a_embedding"), col("b_embedding")) /
        (col("a_nrm") * col("b_nrm")) > CosineThreshold - 1e-6)
      .select(col("a").as("va"), col("b").as("vb"))
      .distinct()
    embVerify(e, cands)
  }

  /** [[adaptiveEmbPlanes]] as a Column over a count column — the same
    * integer ladder in distributed form, one CASE rung per plane, used
    * by [[embeddingCosineScoped]] to derive EACH scope's geometry inside
    * the plan (no per-scope driver round-trips). */
  private[graft] def embPlanesLadder(n: Column): Column =
    (EmbPlanesPerBand until EmbPlanesMax).foldRight(lit(EmbPlanesMax)) {
      (p, rest) => when(n <= lit(EmbTargetOccupancy << p), lit(p))
        .otherwise(rest)
    }

  /** d05 with PARTITION-SCOPED adaptive banding (d27) — the
    * past-the-ceiling story for the plane ladder, written as an
    * operator: [[adaptiveEmbPlanes]] caps at [[EmbPlanesMax]] (= 16)
    * planes, which holds expected bucket occupancy at
    * [[EmbTargetOccupancy]] only up to `T·2^16` ≈ 8.2M vectors per
    * banding SCOPE — but a 100 TB corpus is 10⁹–10¹⁰ vectors. The recipe
    * is the hypertable lesson applied to dedup: band WITHIN natural
    * partition scopes (source shard, ingest date, language — here the
    * embeddings table's `label`, its source-shard stand-in) so per-scope
    * N stays under the ceiling and every scope gets its OWN ladder rung.
    * Near-dups concentrate within such scopes (same crawl, same source,
    * same day); cross-scope pairs are deliberately out of contract —
    * exactly the trade a sharded 100 TB near-dup pass makes.
    *
    * Shape: one banding pass at the LARGEST scope's rung (per-scope
    * buckets are prefix-truncations — [[embPlaneSlot]]'s prefix
    * stability yet again), one broadcast of the tiny per-scope geometry
    * table, candidates equi-joined on (scope, band, bucket), then the
    * shared two-phase exact verification. Every shuffle keys on
    * high-cardinality columns; scope count and per-scope rungs are data,
    * not config, so the same plan serves 10 scopes or 10⁵. */
  def embeddingCosineScoped(s: SparkSession, dir: String): DataFrame =
    embeddingCosineScopedOver(
      Tables.spread(s, dir, "embeddings", "vec_id")
        .select(col("vec_id"), col("embedding"), col("label").as("scope")))

  /** [[embeddingCosineScoped]] over an explicit `(vec_id, embedding,
    * scope)` frame — shared by the registered d27, the planted-twin
    * oracle fixture (d27b, [[embeddingCosineScopedPlanted]]), and the
    * scale study's multi-rung scope probe. */
  private[graft] def embeddingCosineScopedOver(e0: DataFrame): DataFrame = {
    val e = e0
      .select(col("vec_id"), col("embedding"), col("scope"),
        normD(col("embedding")).as("nrm"))
      .repartition(e0.sparkSession.sparkContext.defaultParallelism,
        col("vec_id"))
    val cnts = e.groupBy("scope").agg(count(lit(1)).as("n"))
    // banding width = the largest scope's rung (ladder is monotone, so
    // it covers every scope's prefix); ONE tiny driver-side aggregate,
    // the same geometry-decision pattern as CorpusCount. On an EMPTY
    // corpus max(n) aggregates to NULL — fall back to the ladder floor
    // (ADVICE r15: a getLong on the null row NPE'd confusingly) and let
    // the rest of the plan yield the empty verified frame.
    val maxRow = cnts.agg(max(col("n"))).head()
    val maxN = if (maxRow.isNullAt(0)) 0L else maxRow.getLong(0)
    val bb = embBandKeys(e, adaptiveEmbPlanes(maxN),
        keep = Seq("scope", "embedding", "nrm"))
      .join(broadcast(cnts.select(col("scope"),
        embPlanesLadder(col("n")).as("p"))), Seq("scope"))
      .select(col("vec_id"), col("scope"), col("band"),
        col("bucket").substr(lit(1), col("p")).as("bucket"),
        col("embedding"), col("nrm"))
    // in-stage approx filter (the lshPairs shape): occurrences die
    // inside the join stage, only answer-sized survivors exchange
    val survivors = bb.as("x").join(bb.as("y"),
        col("x.scope") === col("y.scope") &&
          col("x.band") === col("y.band") &&
          col("x.bucket") === col("y.bucket") &&
          col("x.vec_id") < col("y.vec_id"))
      .filter(graft.functions.FloatVecDot.float_vec_dot(
          col("x.embedding"), col("y.embedding")) /
        (col("x.nrm") * col("y.nrm")) > CosineThreshold - 1e-6)
      .select(col("x.vec_id").as("va"), col("y.vec_id").as("vb"))
      .distinct()
    embVerify(e, survivors)
  }

  /** d27 over a corpus variant that PLANTS deterministic twins (d27b) —
    * the oracle fixture the scoped operator needs: the driver corpus's
    * only ≥τ near-dup pair happens to be cross-label, so the registered
    * d27's hash check passed with zero rows on both sides (VERDICT r15
    * item 1) — schema and emptiness proven, the pair path not. Since the
    * corpus is fixed, the fixture is derived INSIDE the query as a pure
    * function of the data, replayed term-for-term by the DuckDB oracle:
    *
    *  - same-scope twins: each scope's min-vec_id vector re-keyed to
    *    `vec_id + off` (off = max vec_id + 1, so plant ids are disjoint)
    *    in its OWN scope — one guaranteed within-scope cosine-1.0 pair
    *    per scope, so the banding, per-scope rung derivation, in-stage
    *    filter, and exact re-score are all exercised with rows > 0;
    *  - a cross-scope twin: the min scope's min-vec_id vector copied
    *    into the MAX scope at `vec_id + 2·off` — its only ≥τ partner
    *    lives in another scope, so the within-scope contract must NOT
    *    emit it (on a degenerate single-scope corpus the pair is
    *    in-scope and appears; both engines replay that identically).
    *
    * Production d27 semantics are untouched; this entry exists so the
    * driver's hard correctness signal covers the pair path. */
  def embeddingCosineScopedPlanted(s: SparkSession, dir: String): DataFrame = {
    // r16 note: an in-query persist of `base` (+ eager output
    // materialization) was tried and MEASURED SLOWER at bench scale
    // (3.3 s → 4.5 s, 47 → 81 jobs): the cache build, InMemoryTableScan
    // stages, and the eager checkpoint cost more than the repeated
    // column-pruned parquet scans they replaced, and runtime exchange
    // reuse already dedups the heavy subtrees. Kept lazy on purpose.
    val base = Tables.spread(s, dir, "embeddings", "vec_id")
      .select(col("vec_id"), col("embedding"), col("label").as("scope"))
    val maxRow = base.agg(max(col("vec_id"))).head()
    val off = if (maxRow.isNullAt(0)) 1L else maxRow.getLong(0) + 1
    val minPer = base.groupBy("scope").agg(min(col("vec_id")).as("vec_id"))
    val samePlants = base.join(minPer, Seq("scope", "vec_id"))
      .select((col("vec_id") + lit(off)).as("vec_id"), col("embedding"),
        col("scope"))
    // the cross-scope plant rides 1-row broadcast aggregates so the
    // scope column's type never crosses the driver (labels are corpus
    // data — int today, string on another corpus)
    val loScope = base.agg(min(col("scope")).as("scope"))
    val loMin = base.join(broadcast(loScope), Seq("scope"))
      .groupBy("scope").agg(min(col("vec_id")).as("vec_id"))
    val crossPlant = base.join(broadcast(loMin), Seq("scope", "vec_id"))
      .crossJoin(broadcast(base.agg(max(col("scope")).as("hi_scope"))))
      .select((col("vec_id") + lit(2L * off)).as("vec_id"),
        col("embedding"), col("hi_scope").as("scope"))
    embeddingCosineScopedOver(
      base.unionByName(samePlants).unionByName(crossPlant))
  }

  /** Scoped-banding loss audit (d28) — the instrument that PRICES d27's
    * accepted trade before a 100 TB deployment commits to it: scoped
    * banding deliberately drops cross-scope pairs (near-dups concentrate
    * within a source shard / crawl / day, so the loss should be small —
    * but "should" is a hypothesis about THIS corpus, and the operator
    * that decides to scope needs the number, exactly as d19 prices
    * LSH-vs-SemDeDup and d13 prices each dedup rung's recall). One
    * full-outer join of the GLOBAL verified ≥τ pair table (d05's
    * corpus-rung banding) against the SCOPED one (d27's per-scope
    * rungs), rolled up with the shared population column:
    * `scoped_coverage` = n_both / n_global is the fraction of globally
    * found pairs the scoped pass retains; `n_global_only` counts pairs
    * lost to the scope boundary PLUS any recall difference between the
    * corpus rung and a scope's coarser rung; `n_scoped_only` counts the
    * reverse (a scope's fewer planes collide MORE, so scoped banding
    * can catch pairs the global geometry misses — neither side's found
    * set contains the other, which is why the audit is a full outer
    * join and not a subtraction). Cost: one d05 + one d27 — linear at
    * the candidate level, run-on-demand like d13/d19. NULL coverage on
    * a corpus where the global pass finds nothing. */
  def scopedLossAudit(s: SparkSession, dir: String): DataFrame = {
    // r16 note: sharing one persisted widened scan across the global
    // side, the scoped side, and the population count was tried and
    // measured NO FASTER at bench scale (the column-pruned scans it
    // dedups are already cheap, and the cache build + eager checkpoint
    // add jobs) — kept lazy, like d27b.
    val e = embNormed(s, dir)
    val g = lshPairs(e).select(col("va"), col("vb"), lit(1).as("in_g"))
    val sc = embeddingCosineScoped(s, dir)
      .select(col("va"), col("vb"), lit(1).as("in_s"))
    g.join(sc, Seq("va", "vb"), "full_outer")
      .select(coalesce(col("in_g"), lit(0)).as("gg"),
        coalesce(col("in_s"), lit(0)).as("ss"))
      .agg(sum(col("gg")).as("n_global"), sum(col("ss")).as("n_scoped"),
        sum(col("gg") * col("ss")).as("n_both"))
      .crossJoin(broadcast(e.agg(count(lit(1)).as("n_vectors"))))
      .select(col("n_vectors"), col("n_global"), col("n_scoped"),
        col("n_both"),
        (col("n_global") - col("n_both")).as("n_global_only"),
        (col("n_scoped") - col("n_both")).as("n_scoped_only"),
        when(col("n_global") === 0, lit(null))
          .otherwise(col("n_both").cast(DoubleType) / col("n_global"))
          .as("scoped_coverage"))
  }

  /** Plane counts [[embPlanesSweep]] sweeps — a fixed literal grid
    * around the fixture corpora's adaptive floor (4), reaching the
    * rungs an enlarged corpus derives, so the published curve shows
    * both directions of the trade. */
  val EmbPlanesGrids: Seq[Int] = Seq(3, 4, 5, 6, 8)

  /** Embedding-LSH operating-point sweep (d26) — the d15 instrument for
    * the NEW geometry knob: for each planes-per-band P in
    * [[EmbPlanesGrids]], the candidate-pair count the banding generates
    * (the work) and how many of the TRUE ≥τ pairs it covers (the
    * recall), with precision = verified/candidates. This is the sweep
    * that SIZES a deployment's explicit `planes` parameter before a
    * 100-TB near-dup run commits to one — the adaptive ladder
    * ([[adaptiveEmbPlanes]]) is the default; an operator overrides it
    * only with this curve in hand (run on a sample at scale: the exact
    * all-pairs truth side is the d04-style audit cost, affordable on a
    * fixture or a sampled shard, never on the full corpus).
    * `recommended` follows the [[SweepRetention]] rule: cheapest point
    * retaining ≥95% of the best recall, ties to the smallest P. One
    * normed materialization and one exact pair table serve every grid
    * point; both evict after the 5-row summary materializes. */
  def embPlanesSweep(s: SparkSession, dir: String): DataFrame =
    embPlanesSweepOver(embNormed(s, dir))

  /** Deterministic hash-sample share (percent of vec_ids) the REGISTERED
    * d26 sweep runs at — the sweep's own documented discipline made
    * mechanical: its truth side is an exact all-pairs pass (quadratic by
    * definition, the audit cost), so the instrument itself must run on a
    * sampled shard at scale, never the full corpus. 50% keeps the
    * fixture curves statistically meaningful while cutting the quadratic
    * truth side ×4; a 100 TB deployment passes the pct that caps the
    * shard at ~10⁴–10⁵ vectors. */
  val SweepSamplePct = 50

  /** [[embPlanesSweep]] over a deterministic hash-sample of the corpus
    * (`md5(vec_id) % 100 < pct` — the p02/p03 split machinery, so the
    * shard is a pure function of the data: same sample every rerun,
    * every engine, every partition layout, and the DuckDB oracle replays
    * it exactly). This is the entry point a deployment SIZES the planes
    * knob with: the per-bucket geometry it measures is scale-free
    * (collision probability per band is a property of the vector
    * DIRECTIONS, not the corpus size), so a capped shard prices the
    * recall↔work trade without paying the truth side's O(N²).
    *
    * Oracle contract (ADVICE r15): the registered d26 entry's DuckDB
    * twin bakes the DEFAULT [[SweepSamplePct]] into its shard
    * predicate, so hash parity holds at the default only — a caller
    * sizing with another pct (e.g. `DedupDeployment.sizeAndRecord(pct
    * = ...)`) runs geometry the registered oracle does not replay
    * (still deterministic, just not driver-hash-covered). */
  def embPlanesSweepSampled(s: SparkSession, dir: String,
      pct: Int = SweepSamplePct): DataFrame = {
    require(pct >= 1 && pct <= 100, s"sample pct $pct outside [1, 100]")
    embPlanesSweepOver(
      embNormed(s, dir).filter(Sampling.pctBucket(col("vec_id")) < pct))
  }

  private def embPlanesSweepOver(e0: DataFrame): DataFrame = {
    import graft.functions.FloatVecDot.float_vec_dot
    val e = e0.persist()
    // exact ≥τ truth via ONE broadcast nested-loop pass: the corpus is
    // broadcast (the truth side runs on a fixture or sampled shard by
    // design — see above), every pair scores its float dot inline with
    // no candidate-frame shuffles, and only the ~handful of approx
    // survivors pay the exact-decimal re-score (the embVerify contract,
    // inlined: joining the 2M-row all-pairs id frame back against e
    // twice cost 30+ s at bench scale)
    val exact = e.as("a").join(broadcast(e.as("b")),
        col("a.vec_id") < col("b.vec_id"))
      .withColumn("approx_cos",
        float_vec_dot(col("a.embedding"), col("b.embedding")) /
          (col("a.nrm") * col("b.nrm")))
      .filter(col("approx_cos") > CosineThreshold - 1e-6)
      .select(col("a.vec_id").as("va"), col("b.vec_id").as("vb"),
        (dotDec(col("a.embedding"), col("b.embedding")).cast(DoubleType) /
          (col("a.nrm") * col("b.nrm"))).as("cos_sim"))
      .filter(col("cos_sim") > CosineThreshold)
      .select("va", "vb").persist()
    // band ONCE at the FINEST grid point, join ONCE at the COARSEST:
    // the bucket bits are prefix-stable (bucket(P) = substr(bucket(
    // Pmax), 1, P), see embPlaneSlot — the same arrangement the oracle
    // replays), so a pair colliding on P planes collides on every
    // P' ≤ P and the pMin candidate set CONTAINS every grid point's.
    // Per-pair band-max prefix-match flags then recover each point's
    // exact candidate/verified counts from one aggregate — five
    // banding passes, self-joins, and distincts collapse into one
    // banding pass, one join, and one grouped aggregate. Banding width
    // is EmbPlanesGrids.max, NOT EmbPlanesMax: no flag inspects a bit
    // past the finest grid point, and the wider string would carry
    // 12 bands × 8 unread codegen dots per vector through the persisted
    // frame for nothing. pMin is .min, not .head — the coarse join must
    // be a SUPERSET of every grid point's candidates, an invariant a
    // reordered grid list must not be able to break positionally.
    val grids = EmbPlanesGrids.distinct.sorted
    val bbMax = embBandKeys(e, grids.max).persist()
    val pMin = grids.head
    val flagCols = grids.map(p =>
      (substring(col("x.bucket"), 1, p) ===
        substring(col("y.bucket"), 1, p)).as(s"m$p"))
    val pairFlags = bbMax.as("x").join(bbMax.as("y"),
        col("x.band") === col("y.band") &&
          substring(col("x.bucket"), 1, pMin) ===
            substring(col("y.bucket"), 1, pMin) &&
          col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("va") +: col("y.vec_id").as("vb") +:
        flagCols: _*)
      .groupBy("va", "vb")
      .agg(max(col(s"m$pMin")).as(s"m$pMin"),
        grids.tail.map(p => max(col(s"m$p")).as(s"m$p")): _*)
    // ONE aggregate recovers every grid point's candidate AND verified
    // counts: the tiny exact truth table broadcast-left-joins into the
    // flags (verified = in exact ∧ collides at p), then one pass sums
    // all 2×|grids| flag columns. The former per-grid assembly
    // (crossJoins of three 1-row aggregates per point) re-aggregated
    // the persisted flags 15 times — THAT, not the truth side, was the
    // sweep's fixed cost at bench scale. The 1-row result and the
    // 5-row summary built from it are driver-bounded by construction.
    val nEx = exact.count()
    val aggCols = grids.flatMap { p =>
      Seq(coalesce(sum(col(s"m$p").cast("long")), lit(0L)).as(s"c$p"),
        coalesce(sum(when(col("ex").isNotNull && col(s"m$p"), 1L)
          .otherwise(0L)), lit(0L)).as(s"v$p"))
    }
    val counts = pairFlags
      .join(broadcast(exact.withColumn("ex", lit(1))), Seq("va", "vb"),
        "left")
      .agg(aggCols.head, aggCols.tail: _*)
      .head()
    bbMax.unpersist()
    exact.unpersist()
    e.unpersist()
    val summary = grids.map { p =>
      val c = counts.getAs[Long](s"c$p")
      val v = counts.getAs[Long](s"v$p")
      (p, c, v, nEx,
        if (c > 0) v.toDouble / c else 1.0,
        if (nEx > 0) v.toDouble / nEx else 1.0)
    }
    val sess = e0.sparkSession
    import sess.implicits._
    val out = markRecommended(
      summary.toDF("planes", "n_candidates", "n_verified", "n_exact",
        "candidate_precision", "recall"),
      quality = col("n_verified"), cost = col("n_candidates"),
      param = col("planes"))
    graft.plans.PlanCapture.note("pipeline", out)
    out
  }

  /** The planes-per-band [[embPlanesSweep]] recommends — what a
    * deployment passes back into [[embBandKeys]] when overriding the
    * adaptive ladder (the [[recommendedLshGrid]] consumption seam for
    * the embedding geometry). */
  def recommendedEmbPlanes(s: SparkSession, dir: String): Int =
    embPlanesSweep(s, dir).filter(col("recommended")).head()
      .getAs[Int]("planes")

  // --- semantic dedup (SemDeDup shape) --------------------------------------
  /** Coarse-cluster stride for [[semanticDedup]] — scale-adaptive like
    * the IVF quantizer's ([[Similarity.adaptiveStride]]; sizing one
    * sizes both): `⌊√N⌋` over the corpus count, so K ≈ √N and BOTH
    * quadratic terms balance at N^1.5 — the N·K assignment and the
    * Σ|cluster|² within-cluster candidate pass (clusters average √N
    * members). Unlike `Similarity.centsOf` there is no query set here,
    * so N is the WHOLE frame and the `vec_id >= NumQueries` exclusion
    * does not apply; the oracle replays the same count in SQL. Memoized
    * like every geometry count ([[graft.ops.CorpusCount]]). */
  private def semStrideOf(e: DataFrame): Int =
    Similarity.adaptiveStride(graft.ops.CorpusCount.memo(e))

  /** Semantic deduplication (d18) — the SemDeDup recipe (Abbas et al.
    * 2023): partition the embedding space with a coarse k-means-style
    * quantizer, then look for near-duplicates ONLY within each cluster
    * and keep one representative per duplicate group. Differs from d05
    * by construction: d05's LSH bands approximate "all pairs above τ";
    * SemDeDup accepts missing cross-cluster pairs in exchange for a
    * candidate set that is |cluster|² rather than bucket-collision
    * driven — the trade a 100 TB embedding corpus makes when the
    * quantizer is already built for ANN search (s03/s15 share it).
    *
    * Determinism: centroids are the stride sample (no trained floats —
    * oracle-replayable); assignment is argmax cosine with ties to the
    * smallest cid; the keep rule is greedy-by-id (a vector is dropped
    * iff some LOWER-id vector in its cluster scores above
    * [[CosineThreshold]] — exact-decimal dots, the d05 contract, via
    * [[embVerify]]'s two-phase prune). Shape at scale: centroids
    * broadcast (one map-side pass), members shuffle once on cid, and
    * the within-cluster self-join is the only quadratic term — bounded
    * by the quantizer's balance, which the s10 audit watches; a hot
    * cluster takes the d05b salting path. */
  def semanticDedup(s: SparkSession, dir: String): DataFrame =
    semanticDedupAudited(s, dir, SemArgmaxAuditPct)

  /** [[semanticDedup]] with an explicit argmax-audit share — the spec
    * seam that proves the loud-failure contract (auditPct = 100 on an
    * adversarial quantization-boundary corpus must raise; on a
    * well-conditioned corpus it must be value-identical to pct = 0). */
  private[graft] def semanticDedupAudited(s: SparkSession, dir: String,
      auditPct: Int): DataFrame = {
    val e = embNormed(s, dir)
    val (assign, pairs) = semCore(e, auditPct)
    val dups = pairs.select(col("vb").as("vec_id")).distinct()
      .withColumn("dup", lit(1))
    assign.join(dups, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cid"),
        when(col("dup").isNull, 1).otherwise(0).as("keep"))
  }

  /** Deterministic hash-sample share (percent of vec_ids) whose argmax
    * assignment [[semCore]] re-derives EXACTLY over all K centroids and
    * cross-checks against the two-phase margin path, failing the query
    * loudly (`raise_error`) on divergence instead of silently assigning
    * a wrong centroid (ADVICE r15). Why a runtime audit at all: the
    * 1e-6 float margin provably contains the exact argmax only under a
    * DATA-DEPENDENT bound — the exact path quantizes elements to
    * DECIMAL(12,6) (HALF_UP) while the float path reads raw floats, so
    *
    *   |fcos − ccos| ≤ [ Σᵢ |aᵢbᵢ − q(aᵢ)q(bᵢ)| + d·u·Σᵢ|aᵢbᵢ| ] / (‖a‖‖b‖)
    *               ≤ d · (5e-7·(Aₐ + A_b) + 2.5e-13 + u·Aₐ·A_b) / (‖a‖‖b‖)
    *
    * with d = dim, A = max |element|, u = 2⁻⁵³ (the dot accumulates in
    * double), q = round-to-6-decimals (|x − q(x)| ≤ 5e-7). For d = 64,
    * A ≈ 1, ‖·‖ ≈ 1 the WORST CASE is ~6e-5 > 1e-6: the margin is safe
    * in practice because corpus floats carry ≤6 significant decimals
    * (float32 round-trip residue per element ~1e-9, measured ≪1e-9 per
    * pair — the [[embVerify]] adjudication), not by the worst case. An
    * adversarial low-norm / quantization-boundary corpus CAN push past
    * the margin — this sampled re-derivation is the loud detector, and
    * the audit cost is pct·N·K exact-decimal dots (~2% of the exact
    * work the two-phase rewrite removed). */
  val SemArgmaxAuditPct = 2

  /** d18's `(assign, verified within-cluster pairs)` — one definition
    * shared by the dedup itself and the d19 agreement audit. `auditPct`
    * sizes the loud-failure argmax cross-check ([[SemArgmaxAuditPct]]);
    * 0 disables, 100 audits every vector (the spec seam). */
  private[graft] def semCore(e: DataFrame,
      auditPct: Int = SemArgmaxAuditPct): (DataFrame, DataFrame) = {
    import graft.functions.FloatVecDot.float_vec_dot
    val cents = e.filter(col("vec_id") % semStrideOf(e) === 0)
      .select(col("vec_id").as("cid"), col("embedding").as("cv"),
        col("nrm").as("cn"))
    // Two-phase argmax assignment, no window (r15; measured on the 20×
    // corpus: 184 s → ~50 s, and the exact-everywhere alternative
    // re-measured at ~150 s — the N·K BigDecimal dot stream, not just
    // the former row_number window's full-width sort exchange, was the
    // d18/d19 wall-time dominator): a codegen FLOAT cosine scores every
    // (vector, centroid) pair INSIDE the broadcast-join stage; the
    // per-vector float max comes from a map-side-combined aggregate
    // broadcast back; and only candidates within 1e-6 of their vector's
    // float max pay the exact-decimal re-score (|float − exact| ≪ 1e-9
    // per pair, so the margin set always contains the exact argmax —
    // the embVerify prune applied to assignment; exact-decimal work
    // drops from N·K evaluations to ≈N). The exact argmax with ties to
    // the smallest cid is max(struct(ccos, −cid)) — bit-identical to
    // row_number(ccos DESC, cid ASC) = 1 (struct ordering compares
    // ccos first, then the negated id), with map-side partials instead
    // of a sorted window exchange: only N tiny rows ever cross it.
    val scored = e.join(broadcast(cents), lit(true))
      .select(col("vec_id"), col("cid"), col("embedding"), col("nrm"),
        col("cv"), col("cn"),
        (float_vec_dot(col("embedding"), col("cv")) /
          (col("nrm") * col("cn"))).as("fcos"))
    val fmax = scored.groupBy("vec_id").agg(max(col("fcos")).as("fmax"))
    val assign = scored.join(broadcast(fmax), Seq("vec_id"))
      .filter(col("fcos") >= col("fmax") - 1e-6)
      .select(col("vec_id"), col("cid"),
        (dotDec(col("embedding"), col("cv")).cast(DoubleType) /
          (col("nrm") * col("cn"))).as("ccos"))
      .groupBy("vec_id")
      .agg(max(struct(col("ccos"), (-col("cid")).as("ncid"))).as("m"))
      .select(col("vec_id"), (-col("m.ncid")).as("cid"))
    // sampled loud-failure cross-check of the margin contract (see
    // SemArgmaxAuditPct): a deterministic md5-bucket shard of vectors
    // re-derives the argmax EXACTLY over all K centroids (same
    // max(struct(ccos, −cid)) tie rule); any divergence from the
    // two-phase assignment raises in-plan — values are untouched when
    // the audit passes, so the oracle is unaffected. The exact frame is
    // pct·N rows → broadcast; no extra action, no extra shuffle.
    val assignAudited = if (auditPct <= 0) assign else {
      val exa = e.filter(Sampling.pctBucket(col("vec_id")) < auditPct)
        .join(broadcast(cents), lit(true))
        .select(col("vec_id"), col("cid"),
          (dotDec(col("embedding"), col("cv")).cast(DoubleType) /
            (col("nrm") * col("cn"))).as("xcos"))
        .groupBy("vec_id")
        .agg(max(struct(col("xcos"), (-col("cid")).as("ncid"))).as("m"))
        .select(col("vec_id"), (-col("m.ncid")).as("cid_exact"))
      assign.join(broadcast(exa), Seq("vec_id"), "left")
        .select(col("vec_id"),
          when(col("cid_exact").isNull || col("cid") === col("cid_exact"),
            col("cid"))
            .otherwise(raise_error(concat(
              lit("semCore argmax audit: two-phase margin assignment "),
              col("cid").cast("string"), lit(" != exact argmax "),
              col("cid_exact").cast("string"), lit(" at vec_id="),
              col("vec_id").cast("string"),
              lit(" — margin 1e-6 violated; see SemArgmaxAuditPct"))))
            .as("cid"))
    }
    // within-cluster pairs SCORED WHERE GENERATED (the lshPairs r15
    // shape): the assignment joins its vectors back on (one O(N)
    // vec_id-keyed exchange), the cluster self-join carries them as
    // keep payload, and the approx cosine filter runs INSIDE the join
    // stage — the N·√N candidate stream dies before any exchange,
    // where the former id-pair form shuffled it through a distinct and
    // re-joined `e` twice (at 100× that was ~89M pair rows, the
    // dominant d18/d19 cost). The self-join rides the d05b
    // occupancy-salting path: clusters average √N members but their
    // SIZES follow the corpus's own cluster skew (the r13 study hit one
    // cluster's pair cell exceeding the spill disk at 20×), so clusters
    // above the hot threshold decompose into a salts² grid of bounded
    // cells — bit-identical pair set, cold corpora short-circuit to the
    // plain join (eager occupancy probe, the pre-flight-AQE move).
    import graft.functions.FloatVecDot.float_vec_dot
    val aP = assignAudited.join(e, Seq("vec_id"))
    val cands = graft.ops.SaltedJoin
      .selfPairsSaltedByOccupancy(aP, Seq("cid"), "vec_id",
        EmbHotBucketThreshold, salts = 8, keep = Seq("embedding", "nrm"))
      .filter(float_vec_dot(col("a_embedding"), col("b_embedding")) /
        (col("a_nrm") * col("b_nrm")) > CosineThreshold - 1e-6)
      .select(col("a").as("va"), col("b").as("vb"))
    (assignAudited, embVerify(e, cands))
  }

  /** Dedup-method agreement audit (d19) — the comparison a pipeline
    * owner runs before switching near-dup machinery: the SAME ≥τ
    * cosine contract found through d05's LSH candidate generation vs
    * d18's cluster-scoped search. `lsh_only` pairs cross a cluster
    * boundary (SemDeDup's accepted blind spot); `sem_only` pairs
    * escaped every LSH band (the banding's miss probability made
    * concrete). One full-outer join of two verified pair tables — both
    * already bounded by their generators — and a 1-row rollup; the
    * Jaccard overlap is the single boundary division. */
  def dedupMethodAgreement(s: SparkSession, dir: String): DataFrame =
    agreementOver(embNormed(s, dir))

  /** Deterministic hash-sample share (percent of vec_ids) the REGISTERED
    * d19b agreement audit runs at — the d26 sampling discipline applied
    * to the method-agreement audit (VERDICT r15 item 3): the full d19
    * is linear-in-candidates but carries a heavy constant (two ~89M-row
    * in-stage broadcast streams at 100×, 374 s measured), and agreement
    * RATES are corpus-direction statistics a capped shard estimates —
    * the full variant stays registered for the exact counts. Oracle
    * parity holds at this default only (the shard predicate is baked
    * into the registered SQL); a caller passing another pct runs
    * geometry the oracle does not replay. */
  val AgreementSamplePct = 50

  /** [[dedupMethodAgreement]] over a deterministic md5-bucket hash-sample
    * of the corpus (d19b) — `md5(vec_id) % 100 < pct`, the p02/p03 split
    * machinery, so the shard is a pure function of the data and the
    * DuckDB oracle replays it exactly. Every geometry derivation (LSH
    * plane ladder, SemDeDup centroid stride) re-derives from the SHARD's
    * count, exactly as a sharded 100 TB agreement audit would run. */
  def dedupMethodAgreementSampled(s: SparkSession, dir: String,
      pct: Int = AgreementSamplePct): DataFrame = {
    require(pct >= 1 && pct <= 100, s"sample pct $pct outside [1, 100]")
    agreementOver(
      embNormed(s, dir).filter(Sampling.pctBucket(col("vec_id")) < pct))
  }

  private def agreementOver(e: DataFrame): DataFrame = {
    val lsh = lshPairs(e)
      .select(col("va"), col("vb"), lit(1).as("in_lsh"))
    val sem = semCore(e)._2
      .select(col("va"), col("vb"), lit(1).as("in_sem"))
    // n_vectors = the population BOTH methods searched — on a corpus
    // (or shard) with no ≥τ pairs every count column is legitimately
    // NULL, and without it the oracle hash would only prove "both
    // engines found nothing"; the population column pins the shard
    // predicate and geometry inputs themselves (r16, the d27b
    // non-vacuous-fixture discipline applied to the 1-row rollup)
    lsh.join(sem, Seq("va", "vb"), "full_outer")
      .select(coalesce(col("in_lsh"), lit(0)).as("l"),
        coalesce(col("in_sem"), lit(0)).as("m"))
      .agg(sum(col("l")).as("n_lsh"), sum(col("m")).as("n_sem"),
        sum(col("l") * col("m")).as("n_both"))
      .crossJoin(broadcast(e.agg(count(lit(1)).as("n_vectors"))))
      .select(col("n_vectors"), col("n_lsh"), col("n_sem"), col("n_both"),
        (col("n_lsh") - col("n_both")).as("n_lsh_only"),
        (col("n_sem") - col("n_both")).as("n_sem_only"),
        (col("n_both").cast(DoubleType) /
          (col("n_lsh") + col("n_sem") - col("n_both")))
          .as("jaccard_overlap"))
  }
}
