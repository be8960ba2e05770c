package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Deterministic sampling / splitting — the reproducibility layer of a
  * training-data pipeline. RNG-based `TABLESAMPLE` gives a different
  * sample per run (and per engine); hashing the stable id instead makes
  * the selection a pure function of the data, so a 100 TB corpus splits
  * identically on every rerun, every engine, every partition layout —
  * and membership can be checked per-row without global state. Both
  * operators are narrow (no shuffle for the split; one bounded top-k
  * shuffle for the stratified sample).
  */
object Sampling {

  /** Percent bucket 0–99 from the md5 of the id: the standard
    * hash-mod-100 split key. Shared with every operator that needs a
    * DETERMINISTIC sample (d26's sweep shard) — the selection is a pure
    * function of the id, replayed bit-identically by the oracle. */
  private[operators] def pctBucket(id: org.apache.spark.sql.Column) =
    conv(substring(md5(id.cast("string")), 1, 8), 16, 10)
      .cast("long") % 100

  private def hashBucketOf(id: org.apache.spark.sql.Column) =
    pctBucket(id).as("bucket")

  private def hashBucket(idCol: String) = hashBucketOf(col(idCol))

  /** Per-document split name (train/val/test, 80/10/10) — the assignment
    * behind [[hashSplit]]'s rollup, reusable by other operators. */
  private[operators] def splitAssign(s: SparkSession, dir: String): DataFrame =
    Tables.table(s, dir, "documents")
      .select(col("doc_id"), hashBucket("doc_id"))
      .select(col("doc_id"),
        when(col("bucket") < 80, "train")
          .when(col("bucket") < 90, "val").otherwise("test").as("split"))

  /** Split-leakage (contamination) check: near-duplicate pairs whose two
    * documents landed in DIFFERENT splits — exactly how eval contamination
    * happens at scale (a test doc with a train-set near-copy). Composes
    * the verified MinHash pairs with the deterministic split assignment;
    * at 100 TB both sides are the operators already run, and the join is
    * on doc_id against the (tiny) pair list. The fix in production is
    * cluster-level splitting (route d06 clusters, not documents); this
    * operator is the audit that proves whether it's needed.
    */
  def splitLeakage(s: SparkSession, dir: String): DataFrame =
    splitLeakage(s, dir, Dedup.minhashLsh(s, dir))

  /** [[splitLeakage]] over an already-materialized d02 pair table (the
    * 100-TB audit shape — see [[TextAnalysis.sourceProfile]]). */
  def splitLeakage(s: SparkSession, dir: String,
      pairTable: DataFrame): DataFrame = {
    val pairs = pairTable.select("da", "db", "jaccard")
    val sp = splitAssign(s, dir)
    pairs
      .join(sp.select(col("doc_id").as("da"), col("split").as("split_a")), "da")
      .join(sp.select(col("doc_id").as("db"), col("split").as("split_b")), "db")
      .filter(col("split_a") =!= col("split_b"))
      .select("da", "db", "split_a", "split_b", "jaccard")
  }

  /** Train/val/test assignment (80/10/10) by id-hash bucket, with the
    * per-split document counts as the oracle-checked rollup. */
  def hashSplit(s: SparkSession, dir: String): DataFrame =
    Tables.table(s, dir, "documents")
      .select(col("doc_id"), hashBucket("doc_id"))
      .withColumn("split",
        when(col("bucket") < 80, "train")
          .when(col("bucket") < 90, "val").otherwise("test"))
      .groupBy("split")
      .agg(count(lit(1)).as("n_docs"), min("doc_id").as("first_doc"))

  /** Context length for [[sequencePacking]] (tokens per training window). */
  val ContextLen = 512

  /** Sequence packing — where each document lands after the standard
    * pretraining transform: concatenate documents in a deterministic
    * order, then split the token stream into fixed [[ContextLen]] windows.
    * Emits, per document, its window span (`start_bin`..`end_bin`) and
    * offset inside the first window — the index a packed-dataset writer
    * needs to materialize examples.
    *
    * Packing runs PER LANGUAGE SHARD (window partitioned by `lang`), which
    * is both what real pipelines do (shard-local packing, no global
    * order) and what makes the running-sum window parallel: a single
    * global cumsum would serialize on one partition at 100 TB, a
    * per-shard one shuffles on `lang` and scans each shard once. All
    * outputs are exact integers.
    */
  def sequencePacking(s: SparkSession, dir: String): DataFrame = {
    import TextPrep.tokens
    packingOf(Tables.table(s, dir, "documents")
      .select(col("doc_id"), col("lang"),
        size(tokens(col("text"))).cast("long").as("n_tokens")))
  }

  /** The [[sequencePacking]] layout rule over an arbitrary
    * `(doc_id, lang, n_tokens)` frame — the CorpusShardSink packs the
    * CLEANED corpus it actually ships through this same rule. */
  private[graft] def packingOf(tok: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    tok
      .withColumn("cum_before", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      // integer div, not double `/`: near-boundary doubles would misround
      // once cumulative counts exceed 2^53 on a real corpus
      .select(col("doc_id"), col("lang"), col("n_tokens"),
        expr(s"cum_before div $ContextLen").as("start_bin"),
        expr(s"(cum_before + n_tokens - 1) div $ContextLen").as("end_bin"),
        (col("cum_before") % ContextLen).as("offset_in_bin"))
  }

  /** Packing-efficiency audit (p10) over [[sequencePacking]]'s layout:
    * per language — documents packed, token mass, windows consumed,
    * boundary-straddling documents (split across two training windows:
    * they train with truncated context, the quality cost of contiguous
    * packing), and the tail waste in the final partially-filled window.
    * These are the numbers a pipeline multiplies by GPU-hours before
    * choosing a context length. All-integer aggregation over p04's
    * already-computed layout — one tiny rollup per language. */
  def packingEfficiency(s: SparkSession, dir: String): DataFrame =
    sequencePacking(s, dir)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        (max(col("end_bin")) + 1).as("n_bins"),
        sum(when(col("start_bin") =!= col("end_bin"), 1L).otherwise(0L))
          .as("n_straddling"))
      .select(col("lang"), col("n_docs"), col("n_tokens"), col("n_bins"),
        col("n_straddling"),
        (col("n_bins") * ContextLen - col("n_tokens"))
          .as("tail_waste_tokens"))

  /** Fixed-length example budget for the PADDED (one-document-per-
    * sequence, SFT-style) layout [[paddingAudit]] compares against
    * [[ContextLen]] packing — short enough that the corpus exercises
    * BOTH failure modes (padding waste on short docs, truncation loss
    * on long ones). */
  val PadMaxLen = 64

  /** Pad-vs-pack layout audit (p21) — the OTHER way to fill training
    * windows, measured against p04's: the padded layout gives every
    * document its own [[PadMaxLen]]-token example (truncating past the
    * budget, padding up to it — no cross-document attention, the SFT
    * default), the packed layout concatenates ([[sequencePacking]]).
    * Per language: both layouts' exact token accounting — truncation
    * loss and pad waste on one side, tail waste on the other — and the
    * utilization ratios a pipeline multiplies by GPU-hours to choose a
    * layout (p10's decision widened to the layout axis). One token-count
    * pass feeds both sides; all integers, divisions at the boundary. */
  def paddingAudit(s: SparkSession, dir: String): DataFrame = {
    import TextPrep.tokens
    // ONE tokenize pass: packingOf's layout already carries n_tokens per
    // document, so both layouts' accounting folds into one per-language
    // aggregation over it — no second documents scan, no join
    packingOf(Tables.table(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          size(tokens(col("text"))).cast("long").as("n_tokens")))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        sum(least(col("n_tokens"), lit(PadMaxLen.toLong)))
          .as("padded_kept_tokens"),
        sum(greatest(col("n_tokens") - PadMaxLen, lit(0L)))
          .as("trunc_loss_tokens"),
        sum(greatest(lit(PadMaxLen.toLong) - col("n_tokens"), lit(0L)))
          .as("pad_waste_tokens"),
        (max(col("end_bin")) + 1).as("n_bins"))
      .select(col("lang"), col("n_docs"), col("n_tokens"),
        col("n_bins").as("packed_bins"),
        (col("n_bins") * ContextLen - col("n_tokens"))
          .as("packed_waste_tokens"),
        col("trunc_loss_tokens"), col("pad_waste_tokens"),
        (col("n_tokens").cast(DoubleType) / (col("n_bins") * ContextLen))
          .as("packed_util"),
        (col("padded_kept_tokens").cast(DoubleType) /
          (col("n_docs") * PadMaxLen)).as("padded_util"))
  }

  /** Context windows per output shard for [[shardManifest]] — the file
    * granularity a packed-dataset writer emits. */
  val BinsPerShard = 16

  /** Shard write-plan manifest (p15) — the last planning artifact before
    * bytes hit disk: [[sequencePacking]]'s window layout rolled up into
    * per-(lang, shard) manifest rows — documents landing in the shard
    * (attributed by their start window), exact token mass, the bin range
    * the shard covers, and how many of its documents straddle into the
    * next shard (they complete there; the writer's handoff list). A pure
    * rollup of the already-computed p04 layout: one (lang, shard)-keyed
    * aggregation, all integers. */
  def shardManifest(s: SparkSession, dir: String): DataFrame =
    shardManifestOf(sequencePacking(s, dir))

  /** The [[shardManifest]] rollup over an arbitrary [[packingOf]] frame. */
  private[graft] def shardManifestOf(packed: DataFrame): DataFrame =
    packed
      .withColumn("shard_id", expr(s"start_bin div $BinsPerShard"))
      .groupBy("lang", "shard_id")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        min(col("start_bin")).as("first_bin"),
        max(col("end_bin")).as("last_bin"),
        sum(when(expr(s"end_bin div $BinsPerShard") > col("shard_id"), 1L)
          .otherwise(0L)).as("n_straddle_out"))

  /** Sliding-window geometry: [[ChunkLen]]-token windows advancing by
    * [[ChunkStride]] (overlap = ChunkLen − ChunkStride = 32 tokens of
    * shared context across consecutive windows). */
  val ChunkLen = 128
  val ChunkStride = 96

  /** Sliding-window chunking (p14) — the long-document prepass that [[
    * sequencePacking]] consumes downstream: split each document into
    * overlapping [[ChunkLen]]-token windows every [[ChunkStride]] tokens,
    * so no token loses more than the overlap of context at a window
    * boundary. Emits the chunk INDEX (doc_id, chunk_id, tok_start,
    * tok_end, chunk_len) a chunk writer materializes, not the text — at
    * 100 TB the index is the shuffle-free artifact; slicing bytes happens
    * in the same map pass that writes shards.
    *
    * Chunk count is `ceil(max(n−W, 0) / S) + 1` computed in non-negative
    * integer arithmetic (floor and truncate agree, so Spark `div` and
    * DuckDB `//` are engine-exact; a double `ceil` would misround at
    * 2^53-scale cumulative counts). Shape: one narrow projection + one
    * explode — zero shuffles, rows multiply by ~n/S on long docs only. */
  def slidingChunks(s: SparkSession, dir: String): DataFrame =
    slidingChunksOf(Tables.table(s, dir, "documents"))

  /** The [[slidingChunks]] pipeline over an arbitrary `(doc_id, text, …)`
    * frame — the synthetic-corpus specs drive multi-chunk geometry here
    * (the driver corpus tops out under [[ChunkLen]] tokens, so its oracle
    * rows prove plumbing only, the t09 PII pattern). */
  def slidingChunksOf(docs: DataFrame): DataFrame = {
    import TextPrep.tokens
    docs
      .select(col("doc_id"),
        size(tokens(col("text"))).cast("long").as("n_tokens"))
      .withColumn("n_chunks",
        expr(s"(greatest(n_tokens - $ChunkLen, 0L) + $ChunkStride - 1) " +
          s"div $ChunkStride") + lit(1L))
      .select(col("doc_id"), col("n_tokens"),
        explode(sequence(lit(0L), col("n_chunks") - 1)).as("chunk_id"))
      .select(col("doc_id"), col("chunk_id"),
        (col("chunk_id") * ChunkStride).as("tok_start"),
        least(col("chunk_id") * ChunkStride + ChunkLen, col("n_tokens"))
          .as("tok_end"))
      .withColumn("chunk_len", col("tok_end") - col("tok_start"))
  }

  /** Cuts-applier (p16) — the span-removal WRITER the d16/d17 pair plans
    * for: materialize [[graft.operators.Dedup.passageCuts]]'s per-document
    * cut lists into the cleaned corpus itself (doc_id, lang,
    * n_tokens_clean, clean_text). d16 plans the cuts, d17 accounts for
    * them, p16 EMITS the artifact a 100 TB pipeline actually ships — and
    * because all three consume the same cut list, the per-language token
    * mass of p16's output equals d17's `net_tokens` exactly (asserted in
    * CurationSpec).
    *
    * Shape: the cut list aggregates to one small span array per affected
    * document (bounded by tokens/PassageLen), joins back on doc_id — the
    * same key the token arrays are already hashed on — and the removal
    * itself is a codegen'd higher-order filter (position ∉ any span) with
    * no extra shuffle and no token-array exchange beyond that one join. */
  def applyCuts(s: SparkSession, dir: String): DataFrame =
    applyCutsOf(Tables.spread(s, dir, "documents", "doc_id"),
      Dedup.passageCuts(s, dir))

  /** Corpus materializer (p17) — the end-to-end dedup WRITER: compose the
    * document-level and passage-level dedup decisions into the single
    * artifact a 100 TB curation run actually ships. Keeps one document
    * per d06 near-dup cluster (the canonical min-doc_id keeper) plus an
    * exact-text keeper pass that also catches shingle-less tiny documents
    * d06 cannot pair, then re-runs the d16→p16 span removal over the KEPT
    * subset — re-running matters: a passage whose only other copy lived
    * in a dropped document must NOT be cut from the survivor, so cut
    * decisions are made against the post-dedup corpus, not the raw one.
    *
    * Shape: the exact-keeper pass shuffles only (md5(text), doc_id); the
    * cluster keepers come from the d06 label table (in production a
    * materialized table, recomputed here for self-containment); both
    * filters join on doc_id — the key the corpus is already hashed on —
    * and the applier adds nothing beyond p16's own plan. */
  def corpusMaterialize(s: SparkSession, dir: String): DataFrame =
    corpusMaterializeOf(
      Tables.spread(s, dir, "documents", "doc_id")
        .select(col("doc_id"), col("lang"), col("text")),
      Dedup.clusters(s, dir))

  /** The [[corpusMaterialize]] pipeline over arbitrary `(doc_id, lang,
    * text)` and d06-shaped `(doc_id, cluster, is_keeper)` frames — in
    * production the cluster table is a materialized artifact of a prior
    * dedup run, not recomputed per write. */
  private[graft] def corpusMaterializeOf(docs: DataFrame,
      clusterTable: DataFrame): DataFrame = {
    val exactKeepers = docs
      .select(col("doc_id"), md5(col("text")).as("fp"))
      .groupBy("fp").agg(min(col("doc_id")).as("doc_id"))
      .select("doc_id")
    val clusterKeepers = clusterTable
      .filter(col("is_keeper")).select("doc_id")
    val kept = docs.join(exactKeepers, "doc_id").join(clusterKeepers, "doc_id")
    applyCutsOf(kept, Dedup.passageCutsOf(kept))
  }

  /** The [[applyCuts]] pipeline over arbitrary `(doc_id, lang, text)` and
    * `(doc_id, span_start, span_end, …)` frames, for spec-supplied
    * corpora and cut lists. Spans are half-open token intervals
    * `[span_start, span_end)`, 0-based, non-overlapping per document
    * (d16 emits merged maximal islands). */
  def applyCutsOf(docs: DataFrame, cuts: DataFrame): DataFrame = {
    import TextPrep.tokens
    val spans = cuts
      .groupBy("doc_id")
      .agg(collect_list(struct(col("span_start"), col("span_end")))
        .as("spans"))
    docs
      .select(col("doc_id"), col("lang"), tokens(col("text")).as("t"))
      .join(spans, Seq("doc_id"), "left")
      .select(col("doc_id"), col("lang"),
        filter(col("t"), (_, i) =>
          !exists(coalesce(col("spans"), array()), sp =>
            i.cast("long") >= sp.getField("span_start") &&
              i.cast("long") < sp.getField("span_end"))).as("keep"))
      .select(col("doc_id"), col("lang"),
        size(col("keep")).cast("long").as("n_tokens_clean"),
        concat_ws(" ", col("keep")).as("clean_text"))
  }

  /** Train-side document frequency above which a shingle is dropped from
    * the decontamination join (same hot-key guard as d04's df cap — a
    * boilerplate shingle shared by d train docs and e eval docs costs
    * d·e join rows; corpus-ubiquitous shingles carry no contamination
    * signal). */
  val DecontamDfCap = 50

  /** Eval-set decontamination — the audit a training pipeline runs before
    * trusting its benchmarks: for every `test`-split document, how many of
    * its shingles also occur in ANY `train`-split document. A test doc
    * sharing a meaningful fraction of shingles with the train set is
    * contaminated (its eval score measures memorization, not
    * generalization).
    *
    * Shape at 100 TB: one equi-join on the shingle string between the
    * (distinct-shingle) test postings and the df-capped DISTINCT train
    * shingle set — never doc×doc. The train side aggregates to one row
    * per distinct shingle before the join, so join width is bounded by
    * test postings × 1.
    */
  def decontamination(s: SparkSession, dir: String): DataFrame =
    decontaminationShingled(s, dir, Dedup.shingledDocs(s, dir))

  /** [[decontamination]] over an already-shingled `(doc_id, sh)` frame —
    * hand it a persisted [[Dedup.shingledDocs]] to share the shingle pass
    * with other audits in the same session ([[shingleAuditSuite]]). The
    * shingled frame is the branch materialization point — the three
    * consumers below (test docs, test postings, train df) share it as a
    * ReusedExchange (or one InMemoryTableScan when persisted), so the
    * corpus is shingled ONCE instead of once per branch. */
  def decontaminationShingled(s: SparkSession, dir: String,
      shingledFrame: DataFrame): DataFrame = {
    val docs = shingledFrame.join(splitAssign(s, dir), "doc_id")
      .select(col("doc_id"), col("split"), col("sh"))
    val testDocs = docs.filter(col("split") === "test")
      .select(col("doc_id"), size(col("sh")).cast("long").as("n_shingles"))
    val testPost = docs.filter(col("split") === "test")
      .select(col("doc_id"), explode(col("sh")).as("s"))
    // distinct train shingles with df <= cap (hot shingles excluded)
    val trainSh = docs.filter(col("split") === "train")
      .select(explode(col("sh")).as("s"))
      .groupBy("s").agg(count(lit(1)).as("df"))
      .filter(col("df") <= DecontamDfCap)
      .select("s")
    val shared = testPost.join(trainSh, Seq("s"), "left_semi")
      .groupBy("doc_id").agg(count(lit(1)).as("n_shared"))
    // left join keeps zero-shingle / zero-overlap test docs in the audit;
    // contaminated = >=10% shingle overlap (exact integer comparison)
    testDocs.join(shared, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_shingles"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared_shingles"),
        (col("n_shingles") > 0 &&
          coalesce(col("n_shared"), lit(0L)) * 10 >= col("n_shingles"))
          .as("contaminated"))
  }

  /** Token budget per language for [[tokenBudgetSample]]. */
  val TokenBudget = 20000L

  /** Token-budget sampling — the data-mixing primitive: from each
    * language, take documents in deterministic md5(doc_id) order until
    * the running token count reaches the budget (the last document may
    * overshoot; its successors are excluded). Pipelines use exactly this
    * to hit a target language/domain mix by token mass, not doc count.
    * One per-shard ordered running sum (same parallel window shape as
    * [[sequencePacking]]); selection is a pure function of the data, so
    * the same 100-TB corpus yields the same sample on every engine and
    * every rerun. Emits the per-language realized totals alongside.
    */
  def tokenBudgetSample(s: SparkSession, dir: String): DataFrame = {
    import TextPrep.tokens
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("h").asc, col("doc_id").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.table(s, dir, "documents")
      .select(col("doc_id"), col("lang"),
        size(tokens(col("text"))).cast("long").as("n_tokens"),
        md5(col("doc_id").cast("string")).as("h"))
      .withColumn("cum_before", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .filter(col("cum_before") < TokenBudget)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens_total"),
        min(col("doc_id")).as("first_doc"))
  }

  /** Per-document cluster-aware split assignment behind [[clusterSplit]]:
    * every document inherits its near-dup cluster's hash bucket, so the
    * whole cluster lands in ONE split. */
  /** Train-set decontamination applier (p18) — the artifact side of
    * [[decontamination]]'s audit, in the direction a pipeline can act on:
    * the eval set is fixed, so the TRAINING documents overlapping it are
    * what gets removed. For every train-split document, count its
    * shingles occurring in any test-split document (df-capped on the
    * eval side — p05's hot-key guard mirrored); drop train docs with
    * ≥ 10% overlap; emit the surviving keep list with per-doc token mass
    * and its overlap evidence — the frame a shard writer joins on doc_id
    * to ship the decontaminated training corpus. Shingle-less documents
    * carry no measurable overlap and survive (the p05 convention).
    *
    * Shape at 100 TB: identical to p05 with the sides swapped — the eval
    * shingle set aggregates to one row per distinct shingle before the
    * join (eval ≪ train, so the broadcast side is the SMALL one here),
    * and the join is postings × 1, never doc × doc. */
  def trainDecontaminate(s: SparkSession, dir: String): DataFrame = {
    import TextPrep.tokens
    val meta = Tables.table(s, dir, "documents")
      .select(col("doc_id"), col("lang"),
        size(tokens(col("text"))).cast("long").as("n_tokens"))
    trainDecontaminateOf(meta, splitAssign(s, dir),
      Dedup.shingledDocs(s, dir))
  }

  /** The [[trainDecontaminate]] pipeline over arbitrary `(doc_id, lang,
    * n_tokens)`, `(doc_id, split)` and `(doc_id, sh)` frames, for
    * spec-supplied corpora and split assignments. */
  private[graft] def trainDecontaminateOf(meta: DataFrame, splits: DataFrame,
      shingled: DataFrame): DataFrame = {
    val docs = shingled.join(splits, "doc_id")
      .select(col("doc_id"), col("split"), col("sh"))
    val trainDocs = docs.filter(col("split") === "train")
      .select(col("doc_id"), size(col("sh")).cast("long").as("n_shingles"))
    val trainPost = docs.filter(col("split") === "train")
      .select(col("doc_id"), explode(col("sh")).as("s"))
    val evalSh = docs.filter(col("split") === "test")
      .select(explode(col("sh")).as("s"))
      .groupBy("s").agg(count(lit(1)).as("df"))
      .filter(col("df") <= DecontamDfCap)
      .select("s")
    val shared = trainPost.join(evalSh, Seq("s"), "left_semi")
      .groupBy("doc_id").agg(count(lit(1)).as("n_shared"))
    trainDocs.join(shared, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_shingles"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared_eval_shingles"))
      .filter(!(col("n_shingles") > 0 &&
        col("n_shared_eval_shingles") * 10 >= col("n_shingles")))
      .join(meta, "doc_id")
      .select(col("doc_id"), col("lang"), col("n_tokens"),
        col("n_shingles"), col("n_shared_eval_shingles"))
  }

  private[graft] def clusterSplitAssign(s: SparkSession, dir: String,
      clusterTable: DataFrame): DataFrame =
    clusterTable
      .select(col("doc_id"), col("cluster"), hashBucketOf(col("cluster")))
      .select(col("doc_id"), col("cluster"),
        when(col("bucket") < 80, "train")
          .when(col("bucket") < 90, "val").otherwise("test").as("split"))

  /** Cluster-aware train/val/test split — the production fix for the
    * leakage [[splitLeakage]] audits: hash near-dup CLUSTERS (d06), not
    * documents, into splits, so a test document can never have a train-set
    * near-copy BY CONSTRUCTION (every near-dup pair is intra-cluster and
    * every cluster is intra-split). Same 80/10/10 bucketing as
    * [[hashSplit]]; the summary reports per-split document and cluster
    * counts. At 100 TB this is the d06 labels (already computed by the
    * dedup pass) plus one map-side bucket expression and a tiny rollup —
    * the split stays a pure function of the corpus.
    */
  def clusterSplit(s: SparkSession, dir: String): DataFrame =
    clusterSplit(s, dir, Dedup.clusters(s, dir))

  /** [[clusterSplit]] over an already-materialized d06 cluster-label
    * table (the 100-TB shape: the dedup pass already produced the labels;
    * the split is a map-side bucket expression plus a tiny rollup). */
  def clusterSplit(s: SparkSession, dir: String,
      clusterTable: DataFrame): DataFrame =
    clusterSplitAssign(s, dir, clusterTable)
      .groupBy("split")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("cluster")).as("n_clusters"),
        min(col("doc_id")).as("first_doc"))

  /** Target language mixture for [[domainMixture]], in parts-per-million
    * (sums to 1,000,000). The shares are intentionally far from the
    * corpus's natural ~45% English skew so the operator demonstrably
    * reshapes the distribution. */
  val MixTargetsPpm: Seq[(String, Long)] = Seq(
    "en" -> 300000L, "de" -> 200000L, "es" -> 200000L,
    "fr" -> 200000L, "zh" -> 100000L)

  /** Domain-mixture resampling — the data-mixing step that turns a raw
    * corpus into a training mix with declared domain weights (the Pile /
    * Dolma recipe): given target shares per language, keep the largest
    * deterministic subset whose realized mix matches them. Feasible scale
    * is bounded by the scarcest language (`scale = min_s n_s·10⁶/t_s`, all
    * integer arithmetic — no float thresholds to misround at 2^53); each
    * language then keeps its `want_s = scale·t_s div 10⁶` hash-smallest
    * documents, so membership is a pure function of the data (same corpus
    * → same mix on every engine, rerun, and partition layout).
    *
    * Shape at 100 TB: one tiny per-language count aggregate (≤ #languages
    * rows, broadcast back), one per-shard `WindowGroupLimit`-style ranked
    * filter — the same parallel window as [[stratifiedSample]] — and a
    * per-language summary aggregate. No global sort, no driver loop.
    */
  def domainMixture(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val t = MixTargetsPpm.toDF("lang", "t_ppm")
    val docs = Tables.table(s, dir, "documents")
      .select(col("doc_id"), col("lang"),
        md5(col("doc_id").cast("string")).as("h"))
    val counts = docs.groupBy("lang").agg(count(lit(1)).as("n_docs"))
      .join(broadcast(t), "lang")
    // scale = min over languages of n_s·10⁶ div t_s (integer div: exact)
    val scale = counts
      .select(expr("min(n_docs * 1000000 div t_ppm)").as("scale"))
    val want = counts.crossJoin(broadcast(scale))
      .select(col("lang"), col("n_docs"), col("t_ppm"),
        expr("scale * t_ppm div 1000000").as("want"))
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("h").asc, col("doc_id").asc)
    val kept = docs.withColumn("rk", row_number().over(w))
      .join(broadcast(want), "lang")
      .filter(col("rk") <= col("want"))
    val perLang = kept.groupBy("lang").agg(
      count(lit(1)).as("n_kept"), min(col("doc_id")).as("first_doc"))
    val totalKept = perLang.agg(sum(col("n_kept")).as("total_kept"))
    want.join(perLang, "lang").crossJoin(broadcast(totalKept))
      .select(col("lang"), col("n_docs"), col("t_ppm").as("target_ppm"),
        col("n_kept"), col("first_doc"),
        expr("n_kept * 1000000 div total_kept").as("achieved_ppm"))
  }

  /** Token-budget multiple and repeat-epoch cap for [[repeatFactor]]. The
    * cap mirrors the published data-constrained-scaling finding that
    * repeated data holds near-full value for ~4 epochs and decays after
    * (Muennighoff et al. 2023, "Scaling Data-Constrained Language
    * Models"). */
  val RepeatBudgetMultiple = 3L
  val RepeatCap = 4L

  /** Repeat-factor epoch planning (p11) — the data-constrained budgeting
    * step a training run does once the mixture wants more tokens than a
    * source has: each source is assigned an equal share of a total budget
    * of [[RepeatBudgetMultiple]]× the corpus's tokens; a source smaller
    * than its share repeats for `ceil(target/available)` epochs, capped
    * at [[RepeatCap]]; whatever the cap leaves unfilled is reported as
    * the deficit the mixer must re-allocate. Every figure is exact BIGINT
    * arithmetic (ceil as `(t + a - 1) div a` — no float rounding to
    * disagree on). Shape at 100 TB: one per-source token aggregate
    * (map-side combined), two one-row scalar aggregates broadcast back —
    * the output is #sources rows, driver-scale by construction. */
  def repeatFactor(s: SparkSession, dir: String): DataFrame = {
    val toks = Tables.table(s, dir, "documents")
      .select(col("source"), size(TextPrep.tokens(col("text"))).cast("long")
        .as("n_tokens"))
    val avail = toks.groupBy("source")
      .agg(sum(col("n_tokens")).as("avail_tokens"))
    val totals = avail.agg(sum(col("avail_tokens")).as("total_tokens"),
      count(lit(1)).as("n_sources"))
    avail.crossJoin(broadcast(totals))
      .select(col("source"), col("avail_tokens"),
        expr(s"total_tokens * $RepeatBudgetMultiple div n_sources")
          .as("target_tokens"))
      .select(col("source"), col("avail_tokens"), col("target_tokens"),
        least(expr("(target_tokens + avail_tokens - 1) div avail_tokens"),
          lit(RepeatCap)).as("epochs"))
      .select(col("source"), col("avail_tokens"), col("target_tokens"),
        col("epochs"),
        least(col("target_tokens"), col("epochs") * col("avail_tokens"))
          .as("effective_tokens"))
      .withColumn("deficit_tokens",
        col("target_tokens") - col("effective_tokens"))
  }

  /** Stratified deterministic sample: the k hash-smallest documents per
    * language — proportional-free, reproducible, and skew-proof (one
    * `WindowGroupLimit`-pruned top-k per stratum, never a full sort). */
  val PerStratum = 20

  def stratifiedSample(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("h").asc, col("doc_id").asc)
    Tables.table(s, dir, "documents")
      .select(col("doc_id"), col("lang"),
        md5(col("doc_id").cast("string")).as("h"))
      .withColumn("rk", row_number().over(w).cast("int"))
      .filter(col("rk") <= PerStratum)
      .select("lang", "rk", "doc_id")
  }

  /** Curriculum staging (p09): bucket the corpus into ordered training
    * stages by quality score — the data-ordering primitive behind
    * curriculum learning (train easy/clean first, hard/noisy later) and
    * behind quality-tiered mixture weights. Stage thresholds are double
    * LITERALS compared against t02's quality score, whose doubles are
    * hash-proven bit-identical across engines (each is a single division
    * or literal-weighted sum of exact integers), so the bucket boundaries
    * cannot drift. Per stage: doc count, exact token budget (the number a
    * mixture scheduler actually consumes), and the score range (min/max —
    * order-independent selections, never a float sum). One pass over the
    * t02 signals + one tiny aggregation; at 100 TB the stage column is a
    * pure map and the rollup is three rows. */
  def curriculum(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.quality(s, dir)
      .select(col("doc_id"), col("n_tokens"), col("quality_score"),
        when(col("quality_score") >= 0.43, "s3_high")
          .when(col("quality_score") >= 0.41, "s2_mid")
          .otherwise("s1_low").as("stage"))
      .groupBy("stage")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"),
        min(col("quality_score")).as("min_score"),
        max(col("quality_score")).as("max_score"))

  /** Temperature-based mixture weighting (p13) — the α = 0.5 sampling
    * the multilingual-pretraining literature uses to keep head languages
    * from drowning the tail (weights ∝ n^α; the published XLM-R recipe):
    * per language, the corpus's exact token count, its integer weight
    * `⌊√n⌋` (IEEE sqrt of an exact integer is correctly rounded, so both
    * engines floor the same double — no float sums anywhere), the
    * natural vs sampled shares in ppm (integer division), and the
    * expected token draw when resampling the corpus to its own size.
    * The sampled share demonstrably flattens the natural skew (en's
    * share shrinks, zh's grows). Shape: one per-language aggregate, one
    * one-row scalar aggregate broadcast back — #languages output rows. */
  def temperatureMixture(s: SparkSession, dir: String): DataFrame = {
    val byLang = Tables.table(s, dir, "documents")
      .select(col("lang"),
        size(TextPrep.tokens(col("text"))).cast("long").as("n"))
      .groupBy("lang").agg(sum(col("n")).as("n_tokens"))
      .withColumn("weight",
        floor(sqrt(col("n_tokens").cast("double"))).cast("long"))
    val totals = byLang.agg(sum(col("n_tokens")).as("total_tokens"),
      sum(col("weight")).as("total_weight"))
    // ×10⁶ decomposed into two ×10³ steps and the ×weight multiply into
    // quotient/remainder parts: floor(n·10⁶/t) = q·10³ + floor(r·10³/t)
    // with q = (n·10³) div t, r = (n·10³) mod t — exact, and every
    // intermediate stays < 2⁶³ up to ~9·10¹⁵-token corpora (a naive
    // n_tokens·10⁶ overflows BIGINT at ~9·10¹² tokens, well under the
    // 100-TB scale this operator is shaped for)
    byLang.crossJoin(broadcast(totals))
      .select(col("lang"), col("n_tokens"), col("weight"),
        expr("(n_tokens * 1000 div total_tokens) * 1000" +
          " + ((n_tokens * 1000) % total_tokens) * 1000 div total_tokens")
          .as("natural_ppm"),
        expr("weight * 1000000 div total_weight").as("sampled_ppm"),
        expr("(total_tokens div total_weight) * weight" +
          " + (total_tokens % total_weight) * weight div total_weight")
          .as("expected_tokens"))
  }

  /** Shard count and epoch count for [[epochShuffle]]. */
  val EpochShuffleShards = 8
  val EpochShuffleEpochs = 2

  /** Deterministic epoch shuffle (p12) — the dataloader's global shuffle
    * as a pure function of the data: each (epoch, doc) gets an order
    * hash `md5(epoch:doc_id)`, the hash assigns a shard (mod
    * [[EpochShuffleShards]]), and the within-shard position is a ranked
    * window over the hash — so every epoch is a fresh pseudo-random
    * permutation that is identical on every engine, rerun, and partition
    * layout (resumable training needs exactly this), and no two epochs
    * present the data in correlated order. Shape at 100 TB: a pure map
    * pass (epoch multiply is an array explode, not a join), then one
    * shuffle keyed by (epoch, shard) with a per-shard sort — the
    * standard bucketed-shuffle write; there is never a global sort, and
    * shard balance is hash-uniform by construction. */
  def epochShuffle(s: SparkSession, dir: String): DataFrame = {
    val epochs = array((0 until EpochShuffleEpochs).map(lit): _*)
    val g = Tables.table(s, dir, "documents")
      .select(col("doc_id"), explode(epochs).as("epoch"))
      .withColumn("h", md5(concat(col("epoch").cast("string"), lit(":"),
        col("doc_id").cast("string"))))
      .withColumn("shard",
        (conv(substring(col("h"), 1, 8), 16, 10).cast("long")
          % EpochShuffleShards).cast("int"))
    val w = Window.partitionBy(col("epoch"), col("shard"))
      .orderBy(col("h"), col("doc_id"))
    g.withColumn("pos", row_number().over(w).cast("int"))
      .select("epoch", "shard", "pos", "doc_id")
  }

  /** The three shingle-based audit aggregates (d04, d08, p05) over ONE
    * shared shingled frame — the building block [[shingleAuditSuite]]
    * unions, exposed so the plan spec can audit exchange sharing. */
  private[graft] def shingleAuditFrames(s: SparkSession, dir: String,
      sh: DataFrame): Seq[DataFrame] = Seq(
    Dedup.ngramJaccardShingled(s, sh)
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col("da")).as("n_a"),
        countDistinct(col("db")).as("n_b"))
      .select(lit("d04_jaccard_pairs").as("audit"),
        col("n_rows"), col("n_a"), col("n_b")),
    Dedup.containmentShingled(s, sh)
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col("inner_id")).as("n_a"),
        countDistinct(col("outer_id")).as("n_b"))
      .select(lit("d08_containment_pairs").as("audit"),
        col("n_rows"), col("n_a"), col("n_b")),
    decontaminationShingled(s, dir, sh)
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("contaminated"), 1L).otherwise(0L)).as("n_a"),
        sum(col("n_shared_shingles")).as("n_b"))
      .select(lit("p05_decontamination").as("audit"),
        col("n_rows"), col("n_a"), col("n_b")))

  /** One-session shingle audit suite — d04 (jaccard pairs), d08
    * (containment pairs), and p05 (decontamination) over ONE persisted
    * shingle materialization instead of three independent shingle passes.
    * This is the audit-pipeline reality at 100 TB: the corpus shingle
    * pass dominates all three audits' shared cost, so it is computed
    * once (a persisted/materialized table) and every audit reads it. One
    * summary row per audit, integer aggregates only. The persisted frame
    * is evicted after eager materialization (the s06 pattern — a leaked
    * cache would rewrite later queries' plans).
    *
    * Exchange budget (r13 census of the captured pipeline plan — the
    * PLANS.md `⊂ pipeline` row's 14 shuffles + 1 cached): the shared
    * shingle frame is repartitioned exactly ONCE (the cached
    * REPARTITION_BY_NUM spread; no consumer re-partitions it), and
    * everything shareable across the three audits already shows as
    * ReusedExchange — the df-window postings exchange `(doc_id, n, s,
    * d)` is reused by both of d04's self-join sides and both of d08's,
    * the 1-row df-cap rollup is reused, and the exact-re-score doc
    * sides are reused pairwise. The remaining per-audit exchanges are
    * forced by KEY ALTERNATION in each audit's own semantics — postings
    * keyed by shingle (df window) → per-doc prefix ranking keyed by
    * doc_id → candidate join keyed by shingle again (d04/d08 index
    * DIFFERENT prefixes, so their prefix exchanges cannot unify) → pair
    * aggregation keyed by (da,db)/(inner,outer) → exact re-score keyed
    * by doc — plus one SinglePartition 1-row rollup per audit. 14 is
    * minimal for these three outputs under that alternation. */
  def shingleAuditSuite(s: SparkSession, dir: String): DataFrame = {
    val sh = Dedup.shingledDocs(s, dir).persist()
    val out = shingleAuditFrames(s, dir, sh)
      .reduce(_.unionByName(_))
    graft.plans.PlanCapture.note("pipeline", out)
    val materialized = out.localCheckpoint(true)
    sh.unpersist()
    materialized
  }

  // --- DSIR-style importance weighting --------------------------------------
  /** Hashed-feature bucket count for [[dsirWeighting]] (DSIR hashes
    * n-grams into 10k buckets; 64 keeps per-bucket masses non-trivial on
    * the fixture corpora without changing the shape). */
  val DsirBuckets = 64

  /** Log-ratio clamp for [[dsirWeighting]]: bucket importance classes
    * live in [-K, K] bits. */
  val DsirMaxClass = 8

  /** Declared target slice: the corpus's own `lang = 'en'` documents
    * play the Wikipedia/quality-corpus role of DSIR's target set. */
  val DsirTargetLang = "en"

  // --- corpus snapshot diff --------------------------------------------------
  /** Deterministic simulation knobs for [[snapshotDiff]]'s two corpus
    * versions (the live fixture ships only one snapshot): documents with
    * `doc_id % 10 == DiffRemovedSlot` exist only in the PREVIOUS
    * snapshot, `== DiffAddedSlot` only in the CURRENT one, and
    * `== DiffEditedSlot` exist in both with a sentinel appended to the
    * previous text (a simulated edit that differs even for empty
    * documents). Everything else is unchanged. */
  val DiffRemovedSlot = 7
  val DiffAddedSlot = 3
  val DiffEditedSlot = 5

  /** Corpus snapshot diff (p20) — the first question an incremental
    * 100 TB pipeline asks before reprocessing anything: which documents
    * were ADDED, REMOVED, CHANGED, or RETAINED between snapshots, so
    * dedup/index/statistics work runs over the delta instead of the
    * corpus (the d07-batch and s13-drift operators consume exactly this
    * classification upstream). Mechanics: each side reduces to
    * `(doc_id, md5(canonical(text)))` — t04's fingerprint contract, one
    * narrow scan per snapshot — and ONE full-outer join on the doc key
    * classifies every document: present-right-only → added,
    * present-left-only → removed, both with differing fingerprints →
    * changed, else retained. At scale both fingerprint tables are
    * (doc_id)-partitioned snapshot artifacts; the join shuffles 33-byte
    * rows, never text. Output: per-document status + per-status rollup
    * seam via the tiny status dimension. */
  def snapshotDiff(s: SparkSession, dir: String): DataFrame = {
    import TextPrep.canonical
    val docs = Tables.table(s, dir, "documents").select("doc_id", "text")
    val slot = col("doc_id") % 10
    // coalesce: a null text must still fingerprint (else a doc present
    // in both snapshots would read as 'added' — fp_prev IS NULL wins);
    // the simulated edit APPENDS a sentinel rather than cutting the last
    // character, so it changes the fingerprint even for empty documents
    val canon = canonical(coalesce(col("text"), lit("")))
    val prev = docs.filter(slot =!= DiffAddedSlot)
      .select(col("doc_id"),
        md5(when(slot === DiffEditedSlot, concat(canon, lit("~edit")))
          .otherwise(canon)).as("fp_prev"))
    val curr = docs.filter(slot =!= DiffRemovedSlot)
      .select(col("doc_id"), md5(canon).as("fp_curr"))
    prev.join(curr, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        when(col("fp_prev").isNull, "added")
          .when(col("fp_curr").isNull, "removed")
          .when(col("fp_prev") =!= col("fp_curr"), "changed")
          .otherwise("retained").as("status"))
  }

  /** The md5 feature-hash bucket of a token column — ONE definition for
    * the batch trainer/scorer and the streaming scorer. */
  private[graft] def dsirBucket(tok: org.apache.spark.sql.Column) =
    TextPrep.shingleBase(tok) % DsirBuckets

  /** The trained DSIR artifact: `(bucket, cls)` for ALL [[DsirBuckets]]
    * buckets — densified so an online scorer meets no unknown bucket
    * (a bucket with zero corpus mass gets the smoothed prior class).
    * This 64-row table is what ships to the streaming scorer
    * ([[graft.streaming.StreamingDsirScorer]]); the batch scorer joins
    * it right back. */
  def dsirBucketClasses(s: SparkSession, dir: String): DataFrame = {
    val d38 = (c: org.apache.spark.sql.Column) => c.cast(DecimalType(38, 0))
    // ONE conditional aggregation over the exploded stream (the oracle's
    // `b` CTE shape): raw and target masses per bucket in a single pass,
    // so the expensive tokenize+explode is not run twice
    val buckets = dsirToks(s, dir).groupBy("bucket")
      .agg(count(lit(1)).as("r"),
        sum(when(col("lang") === DsirTargetLang, 1L).otherwise(0L)).as("t"))
    val dense = s.range(DsirBuckets).select(col("id").as("bucket"))
      .join(buckets, Seq("bucket"), "left")
      .select(col("bucket"), coalesce(col("r"), lit(0L)).as("r"),
        coalesce(col("t"), lit(0L)).as("t"))
    val totals = dense.agg(sum(col("r")).as("rTot"), sum(col("t")).as("tTot"))
    // cond(k): (t+1)(R+B)·2^max(0,−k) ≥ (r+1)(T+B)·2^max(0,k) —
    // monotone in k, so the first true k scanning K → −K+1 is the floor
    val ks = (-DsirMaxClass + 1 to DsirMaxClass).reverse
    def cond(k: Int) =
      d38(col("t") + 1) * d38(col("rTot") + DsirBuckets) *
        lit(1L << math.max(0, -k)) >=
        d38(col("r") + 1) * d38(col("tTot") + DsirBuckets) *
          lit(1L << math.max(0, k))
    val cls = coalesce(
      (ks.map(k => when(cond(k), lit(k))) :+ lit(-DsirMaxClass)): _*)
    dense.crossJoin(broadcast(totals))
      .select(col("bucket"), cls.as("cls"))
  }

  private def dsirToks(s: SparkSession, dir: String): DataFrame =
    Tables.spread(s, dir, "documents", "doc_id")
      .select(col("doc_id"), col("lang"),
        explode(TextPrep.tokens(col("text"))).as("tok"))
      .select(col("doc_id"), col("lang"), dsirBucket(col("tok")).as("bucket"))

  /** Data Selection via Importance Resampling (p19) — the Xie et al.
    * 2023 recipe in exact integers: estimate target and raw unigram
    * distributions over [[DsirBuckets]] hashed feature buckets
    * (md5-hashed tokens — the engine-portable hash every sampler here
    * uses), give each bucket the QUANTIZED log-importance class
    * ⌊log₂((t+1)/(T+B) ÷ (r+1)/(R+B))⌋ clamped to ±[[DsirMaxClass]] —
    * computed as a cascade of integer cross-multiplications over
    * DECIMAL(38,0) products (the counts-times-totals products overflow
    * BIGINT at 100 TB), so no float log/division can drift between
    * engines — and score each document by the sum of its token
    * occurrences' classes. `keep = 1` where the sum is positive: the
    * document looks more like the target than like the corpus average,
    * which IS DSIR's resampling criterion with the noise term dropped
    * for determinism. Add-one smoothing keeps empty buckets finite.
    * Shape at 100 TB: one token explode, one conditional bucket
    * aggregation (64 rows — broadcast back), one per-doc rollup; the
    * bucket table is a trained ARTIFACT reusable across corpus
    * snapshots. */
  def dsirWeighting(s: SparkSession, dir: String): DataFrame = {
    val classed = dsirBucketClasses(s, dir)
    dsirToks(s, dir).join(broadcast(classed), "bucket")
      .groupBy("doc_id", "lang")
      .agg(count(lit(1)).as("n_tokens"), sum(col("cls")).as("dsir_points"))
      .select(col("doc_id"), col("lang"), col("n_tokens"),
        col("dsir_points"),
        when(col("dsir_points") > 0, 1).otherwise(0).as("keep"),
        (col("dsir_points").cast(org.apache.spark.sql.types.DoubleType) /
          col("n_tokens")).as("mean_class"))
  }
}
