package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.collection.immutable.ListMap
import org.apache.spark.sql.functions.col
import scala.util.chaining._
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the engine's declared operator surface (SURVEY §2.14);
  * `oracleSql` holds the DuckDB-equivalent SQL the driver hash-compares
  * against. Numeric-exactness conventions are documented in
  * [[graft.operators.CoreQueries]].
  */
object SparkEntry {

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.q11AggTpchQ1(spark, "/root/testdata/sf0.001")

  /** Oracle-determinism tail, harness layer (VERDICT r04 item 2). The
    * driver's DuckDB hash compare needs a canonical row order, but the
    * reusable operators must return scale-shaped distributed frames — a
    * production caller of e.g. `Dedup.minhashLsh` must not inherit a
    * corpus-on-one-task presentation sort. So the tail lives here, on the
    * declared query entry points only. `repartition(1).sortWithinPartitions`
    * (not `orderBy`): the outputs are tiny, and orderBy's range-sampling
    * pass would re-execute the upstream pipeline a second time. */
  private def canon(cols: String*)(
      fn: (SparkSession, String) => DataFrame): (SparkSession, String) => DataFrame =
    (s, d) => fn(s, d).repartition(1).sortWithinPartitions(cols.head, cols.tail: _*)

  /** [[canon]] with Column sort keys — for the handful of queries whose
    * canonical order carries a DESC direction (q50/q57/q63). */
  private def canonBy(cols: org.apache.spark.sql.Column*)(
      fn: (SparkSession, String) => DataFrame): (SparkSession, String) => DataFrame =
    (s, d) => fn(s, d).repartition(1).sortWithinPartitions(cols: _*)

  def queries: Map[String, (SparkSession, String) => DataFrame] = ListMap(
    "q01_filter_project" -> canon("o_orderkey")(CoreQueries.q01FilterProject),
    "q02_mask_sha256" -> canon("c_custkey")(CoreQueries.q02MaskSha256),
    "q03_latest_state" -> canon("user_id")(CoreQueries.q03LatestState),
    "q04_delete_propagation" -> canon("user_id")(CoreQueries.q04DeletePropagation),
    // version_event_id completes the total order: the window itself
    // tie-breaks equal timestamps on event_id, so the presentation key
    // must too or tied rows hash nondeterministically
    "q69_scd2_history" ->
      canon("user_id", "valid_from_us", "version_event_id")(
        CoreQueries.q69Scd2History),
    "q70_pit_join" -> canon("purchase_event_id")(CoreQueries.q70PitJoin),
    "q05_type_cast" -> canon("l_orderkey", "l_linenumber")(CoreQueries.q05TypeCast),
    "q06_max_progress" -> canon("user_id")(CoreQueries.q06MaxProgress),
    "q07_join_inner" -> canon("o_orderkey")(CoreQueries.q07JoinInner),
    "q08_join_left" -> canon("c_custkey")(CoreQueries.q08JoinLeft),
    "q08b_join_anti" -> canon("c_custkey")(CoreQueries.q08bJoinAnti),
    "q09_join_multiway" -> canon("n_name")(CoreQueries.q09JoinMultiway),
    "q10_join_broadcast" -> canon("r_name", "n_name")(CoreQueries.q10JoinBroadcast),
    "q11_agg_tpch_q1" -> canon("l_returnflag", "l_linestatus")(CoreQueries.q11AggTpchQ1),
    "q12_count_distinct" -> CoreQueries.q12CountDistinct _,
    "q12b_approx_distinct" -> CoreQueries.q12bApproxDistinct _,
    "q13_rollup" -> canon("n_name", "o_orderpriority")(CoreQueries.q13Rollup),
    "q14_having_subquery" -> canon("c_nationkey")(CoreQueries.q14HavingSubquery),
    "q15_window_rank" -> canon("c_nationkey", "rn")(CoreQueries.q15WindowRank),
    "q16_window_analytic" -> canon("o_custkey", "o_orderkey")(CoreQueries.q16WindowAnalytic),
    "q17_time_bucket" -> canon("bucket_us")(CoreQueries.q17TimeBucket),
    "q18_topk" -> CoreQueries.q18TopK _,
    "q18b_shipping_priority" -> CoreQueries.q18bShippingPriority _,
    "q19_setops" -> canon("tag", "c_custkey")(CoreQueries.q19SetOps),
    "q19b_setops_all" -> canon("tag", "o_orderpriority")(CoreQueries.q19bSetOpsAll),
    "q20_scalar" -> canon("o_orderkey")(CoreQueries.q20Scalar),
    "q21_array_json" -> canon("c_nationkey")(CoreQueries.q21ArrayJson),
    "q22_mask_hmac" -> CoreQueries.q22MaskHmac _,
    "q23_cube" -> canon("n_name", "o_orderstatus")(ExtendedQueries.q23Cube),
    "q24_pivot" -> canon("n_name")(ExtendedQueries.q24Pivot),
    "q39_unpivot" -> canon("n_name", "o_orderpriority")(ExtendedQueries.q39Unpivot),
    "q25_window_family" -> canon("o_custkey", "o_orderkey")(ExtendedQueries.q25WindowFamily),
    "q26_exists_subquery" -> canon("c_custkey")(ExtendedQueries.q26ExistsSubquery),
    "q27_percentiles" -> canon("l_returnflag")(ExtendedQueries.q27Percentiles),
    "q27b_percentiles_approx" -> canon("l_returnflag")(ExtendedQueries.q27bPercentilesApprox),
    "q28_string_agg" -> canon("c_nationkey")(ExtendedQueries.q28StringAgg),
    "q29_conditional_agg" -> canon("yr")(ExtendedQueries.q29ConditionalAgg),
    "q30_date_arith" -> canon("o_orderkey")(ExtendedQueries.q30DateArith),
    "q31_asof_join" -> canon("user_id", "purchase_id")(ExtendedQueries.q31AsofJoin),
    "q32_grouping_sets" -> canon("n_name", "o_orderpriority")(ExtendedQueries.q32GroupingSets),
    "q33_range_join" -> canon("band")(ExtendedQueries.q33RangeJoin),
    "q34_sessionize" -> canon("user_id", "session_seq")(ExtendedQueries.q34Sessionize),
    "q35_json_extract" -> canon("event_type")(ExtendedQueries.q35JsonExtract),
    "q36_correlated_subquery" -> canon("o_orderkey")(ExtendedQueries.q36CorrelatedSubquery),
    "q37_range_frame" -> canon("o_orderkey")(ExtendedQueries.q37RangeFrame),
    "q38_window_distinct" -> canon("o_orderkey")(ExtendedQueries.q38WindowDistinct),
    "q40_join_full_outer" -> canon("custkey")(CoreQueries.q40JoinFullOuter),
    "q41_cohort_retention" -> canon("cohort_week", "week_offset")(ExtendedQueries.q41CohortRetention),
    "q42_event_funnel" -> canon("idx")(ExtendedQueries.q42EventFunnel),
    "q43_copurchase_pairs" -> ExtendedQueries.q43CopurchasePairs _,
    "q44_series_topk" -> canon("qid", "rank")((s, d) =>
      ExtendedQueries.q44SeriesTopK(s, d)),
    "q44b_series_topk_clustered" -> canon("qid", "rank")((s, d) =>
      ExtendedQueries.q44bSeriesTopKClustered(s, d)),
    "q45_smallqty_revenue" -> ExtendedQueries.q45SmallQtyRevenue _,
    "q46_waiting_suppliers" -> ExtendedQueries.q46WaitingSuppliers _,
    "q47_dormant_highbal" -> canon("n_name")(ExtendedQueries.q47DormantHighBalance),
    "q48_large_volume_cust" -> ExtendedQueries.q48LargeVolumeCustomers _,
    "q49_disjunctive_revenue" -> ExtendedQueries.q49DisjunctiveRevenue _,
    "q50_custdist" -> canonBy(col("custdist").desc, col("c_count").desc)(ExtendedQueries.q50CustDist),
    "q55_mincost_supplier" -> ExtendedQueries.q55MinCostSupplier _,
    "q56_top_supplier_revenue" -> canon("s_suppkey")(ExtendedQueries.q56TopSupplierRevenue),
    "q57_part_supplier_counts" -> canonBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))(ExtendedQueries.q57PartSupplierCounts),
    "q58_majority_share_supp" -> canon("s_name")(ExtendedQueries.q58MajorityShareSuppliers),
    "q59_late_order_priorities" -> canon("o_orderpriority")(ExtendedQueries.q59LateOrderPriorities),
    "q60_forecast_revenue" -> ExtendedQueries.q60ForecastRevenue _,
    "q61_volume_shipping" -> canon("supp_nation", "cust_nation", "l_year")(ExtendedQueries.q61VolumeShipping),
    "q62_market_share" -> canon("o_year")(ExtendedQueries.q62MarketShare),
    "q63_product_profit" -> canonBy(col("nation"), col("o_year").desc)(ExtendedQueries.q63ProductProfit),
    "q64_returned_items" -> ExtendedQueries.q64ReturnedItems _,
    "q65_priority_shipclass" -> canon("ship_class")(ExtendedQueries.q65PriorityShipClass),
    "q66_promo_revenue" -> ExtendedQueries.q66PromoRevenue _,
    "q67_fuzzy_match" -> canon("a_key", "b_key")(ExtendedQueries.q67FuzzyMatch),
    "q68_entity_clusters" -> canon("c_custkey")(ExtendedQueries.q68EntityClusters),
    "q51_gapfill_interpolate" -> canon("event_type", "h")(ExtendedQueries.q51GapfillInterpolate),
    "q52_stats_moments" -> canon("l_returnflag")(ExtendedQueries.q52StatsMoments),
    "q53_distribution_rank" -> canon("o_custkey", "o_orderkey")(ExtendedQueries.q53DistributionRank),
    "q54_mode_median" -> canon("flag")(ExtendedQueries.q54ModeMedian),
    // training-data / north-star operator surface
    "d01_dedup_exact" -> canon("rep_id")(Dedup.exact),
    "d02_dedup_minhash_lsh" -> canon("da", "db")(Dedup.minhashLsh),
    "d03_dedup_simhash" -> canon("doc_id")(Dedup.simhash),
    "d04_dedup_ngram_jaccard" -> canon("da", "db")(Dedup.ngramJaccard),
    // d05 family: the verified-pair operators return unsorted frames
    // (r16 — the in-operator orderBy cost a rangepartitioning Exchange
    // plus its sampling pass in every consumer); the canon tail restores
    // the identical (va, vb) presentation order for the oracle
    "d05_dedup_embedding" -> canon("va", "vb")(Dedup.embeddingCosine),
    "d05b_dedup_embedding_salted" ->
      canon("va", "vb")((s, dir) => Dedup.embeddingCosineSalted(s, dir)),
    "d06_dedup_clusters" -> canon("doc_id")(Dedup.clusters),
    "d07_dedup_incremental" -> canon("doc_id")(Dedup.incremental),
    "d07b_dedup_incremental_bloom" ->
      canon("doc_id")((s, dir) => Dedup.incremental(s, dir, bloomPruneIndex = true)),
    "d08_dedup_containment" -> canon("inner_id", "outer_id")(Dedup.containment),
    "d09_shingle_audit_suite" -> canon("audit")(Sampling.shingleAuditSuite),
    "d10_substring_dup_rate" -> canon("doc_id")(Dedup.substringDupRate),
    "d11_cluster_size_histogram" ->
      canon("cluster_size")((s, dir) => Dedup.clusterSizeHistogram(s, dir)),
    "d12_dedup_bag" -> canon("rep_id")(Dedup.bagDedup),
    "d13_dedup_recall_eval" -> Dedup.dedupRecallEval _, // 1 row
    "d14_dedup_funnel" ->
      canon("stage")((s: SparkSession, dir: String) => Dedup.dedupFunnel(s, dir)),
    "d15_lsh_tuning_audit" -> canon("grid")(Dedup.lshTuningAudit),
    // d26 runs SAMPLED (its own documented discipline, made mechanical):
    // the sweep's truth side is exact all-pairs, so the registered
    // instrument prices the geometry on a deterministic hash-shard; the
    // full-corpus embPlanesSweep stays the fixture/spec entry point
    "d26_emb_planes_sweep" ->
      canon("planes")((s, d) => Dedup.embPlanesSweepSampled(s, d)),
    "d27_dedup_scoped" -> canon("va", "vb")(Dedup.embeddingCosineScoped),
    // d27b: d27 over the planted-twin corpus variant (derived in-query,
    // oracle-replayed) — the driver corpus's only near-dup pair is
    // cross-label, so the plain d27 hash check is 0-row; this entry
    // hash-covers the scoped PAIR path (rows > 0 by construction)
    "d27b_dedup_scoped_planted" ->
      canon("va", "vb")(Dedup.embeddingCosineScopedPlanted),
    // d28: the instrument that prices d27's accepted cross-scope trade —
    // global d05 pairs vs scoped d27 pairs, full-outer, with coverage
    "d28_scoped_loss_audit" -> Dedup.scopedLossAudit _,
    "d16_passage_cuts" ->
      canon("doc_id", "span_start")(Dedup.passageCuts),
    "d17_cut_accounting" -> canon("lang")(Dedup.cutAccounting),
    "d18_semantic_dedup" -> canon("vec_id")(Dedup.semanticDedup),
    "d19_dedup_method_agreement" -> Dedup.dedupMethodAgreement _,
    // d19b: the agreement audit on a deterministic md5-bucket hash-shard
    // (the d26 sampling discipline — the full d19 is the run-on-demand
    // exact audit; the sampled entry is what a 100 TB corpus prices)
    "d19b_method_agreement_sampled" ->
      ((s: SparkSession, d: String) => Dedup.dedupMethodAgreementSampled(s, d)),
    "d21_dedup_nfc" -> canon("rep_id")(Dedup.nfcDedup),
    "d22_dedup_canonical" -> canon("rep_id")(Dedup.canonicalDedup),
    "d23_dedup_winnow" -> canon("da", "db")(Dedup.winnowPairs),
    "d24_dedup_template" -> canon("rep_id")(Dedup.skeletonDedup),
    "d25_keeper_quality" -> canon("cluster")(Dedup.qualityKeeper),
    "s01_sim_bruteforce_topk" -> canon("qid", "rank")(Similarity.bruteForceTopK),
    "s02_sim_ann_lsh" -> canon("qid", "rank")(Similarity.annLsh),
    "s03_sim_ann_ivf" -> canon("qid", "rank")(Similarity.annIvf),
    "s04_sim_ann_ivf_trained" -> Similarity.annIvfTrained _, // 1 row
    "s05_sim_quantized_topk" -> canon("qid", "rank")(Similarity.quantizedTopK),
    "s06_ann_recall" -> canon("method")(Similarity.annRecall),
    "s07_sim_pq_topk" -> canon("qid", "rank")(Similarity.pqTopK),
    "s08_sim_filtered_topk" -> canon("qid", "rank")(Similarity.filteredTopK),
    "s09_quantization_recall" -> canon("method")(Similarity.quantizationRecall),
    "s10_index_stats" -> canon("index_name")(Similarity.indexStats),
    "s11_embedding_stats" -> canon("dim")(Similarity.embeddingStats),
    "s12_ivf_probe_audit" -> canon("n_probe")(Similarity.ivfProbeAudit),
    "s13_embedding_drift" -> canon("dim")(Similarity.embeddingDrift),
    "s14_pq_tuning_sweep" -> canon("pq_m")(Similarity.pqTuningSweep),
    "s19_dim_tuning_sweep" -> canon("dims")(Similarity.dimTuningSweep),
    // neighbor_id completes the total order: adcRanked cuts with
    // ties-INCLUSIVE rank() (the exact-duplicate guarantee), so tied
    // rows share (qid, rank) and the presentation key must extend past
    // them or they hash nondeterministically (the q69 rule)
    "s15_sim_ivfpq_topk" ->
      canon("qid", "rank", "neighbor_id")(Similarity.ivfPqTopK),
    "s16_sim_ivfpq_refine" -> canon("qid", "rank")(Similarity.ivfPqRefineTopK),
    "s17_ivfpq_ingest" -> canon("cid")(Similarity.ivfPqIngest),
    "s17c_ingest_artifacts" -> canon("cid")(Similarity.ivfPqIngestArtifacts),
    "s17b_ingest_recall" -> canon("method")(Similarity.ivfPqIngestRecall),
    "s18_ivfpq_delete" -> canon("cid")(Similarity.ivfPqDelete),
    "s18c_delete_artifacts" -> canon("cid")(Similarity.ivfPqDeleteArtifacts),
    "s18b_delete_serve" ->
      canon("qid", "rank", "neighbor_id")(Similarity.ivfPqDeleteServe),
    "s20_ivfpq_shard_merge" -> canon("cid")(Similarity.ivfPqShardMerge),
    "s20c_merge_artifacts" ->
      canon("cid")(Similarity.ivfPqShardMergeArtifacts),
    "s21_filtered_ann_audit" -> canon("method")(Similarity.filteredAnnAudit),
    "s21c_filtered_artifacts" ->
      canon("method")(Similarity.filteredAnnAuditArtifacts),
    "s22_label_purity" -> canon("label")(Similarity.labelPurity),
    "t01_text_langid" -> canon("doc_id")(TextAnalysis.langId),
    "t02_text_quality" -> canon("doc_id")(TextAnalysis.quality),
    "t03_text_tokens" -> canon("doc_id")(TextAnalysis.tokenCount),
    "t04_text_fingerprint" -> canon("doc_id")(TextAnalysis.fingerprint),
    "t05_text_repetition" -> canon("doc_id")(TextAnalysis.repetition),
    "t06_boilerplate_ngrams" -> TextAnalysis.boilerplate _,
    "t07_keywords_tfdf" -> canon("doc_id", "rk")(TextAnalysis.keywords),
    "m01_media_meta" -> canon("doc_id")(Multimodal.mediaMeta),
    "m02_media_resize" -> canon("doc_id")(Multimodal.resizeQuery),
    "m03_frame_sample" -> canon("doc_id", "frame_offset")(Multimodal.frameSampleQuery),
    "m04_media_histogram" -> canon("doc_id")(Multimodal.histogramQuery),
    "m05_perceptual_hash" -> canon("rep_id")(Multimodal.perceptualHashQuery),
    "m06_still_segments" -> canon("doc_id")(Multimodal.stillSegmentsQuery),
    "m07_audio_stats" -> canon("doc_id")(Multimodal.audioStatsQuery),
    "m08_image_patches" -> canon("doc_id")(Multimodal.imagePatchQuery),
    "m09_channel_stats" -> canon("doc_id")(Multimodal.channelStatsQuery),
    "m10_audio_decimate" -> canon("doc_id")(Multimodal.audioDecimateQuery),
    "m11_visual_ann" -> canon("qid", "rank")(Multimodal.visualAnnQuery),
    "m12_visual_dup_recall" ->
      canon("qid", "partner")(Multimodal.visualDupRecallQuery),
    "m13_audio_ann" -> canon("qid", "rank")(Multimodal.audioAnnQuery),
    "m14_audio_ann_recall" ->
      canon("method")(Multimodal.audioAnnRecallQuery),
    "p01_hash_split" -> canon("split")(Sampling.hashSplit),
    "p02_stratified_sample" -> canon("lang", "rk")(Sampling.stratifiedSample),
    "p03_split_leakage" -> canon("da", "db")(Sampling.splitLeakage),
    "p04_sequence_packing" -> canon("lang", "doc_id")(Sampling.sequencePacking),
    "p10_packing_efficiency" -> canon("lang")(Sampling.packingEfficiency),
    "p21_padding_audit" -> canon("lang")(Sampling.paddingAudit),
    "p05_decontamination" -> canon("doc_id")(Sampling.decontamination),
    "p06_token_budget_sample" -> canon("lang")(Sampling.tokenBudgetSample),
    "p07_domain_mixture" -> canon("lang")(Sampling.domainMixture),
    "p08_cluster_split" -> canon("split")(Sampling.clusterSplit),
    "p09_curriculum" -> canon("stage")(Sampling.curriculum),
    "p11_repeat_factor" -> canon("source")(Sampling.repeatFactor),
    "p12_epoch_shuffle" -> canon("epoch", "shard", "pos")(Sampling.epochShuffle),
    "p13_temperature_mixture" -> canon("lang")(Sampling.temperatureMixture),
    "p14_sliding_chunks" ->
      canon("doc_id", "chunk_id")(Sampling.slidingChunks),
    "p15_shard_manifest" -> canon("lang", "shard_id")(Sampling.shardManifest),
    "p16_apply_cuts" -> canon("doc_id")(Sampling.applyCuts),
    "p17_corpus_materialize" -> canon("doc_id")(Sampling.corpusMaterialize),
    "p18_train_decontaminate" -> canon("doc_id")(Sampling.trainDecontaminate),
    "p19_dsir_weighting" -> canon("doc_id")(Sampling.dsirWeighting),
    "p20_snapshot_diff" -> canon("doc_id")(Sampling.snapshotDiff),
    "t08_filter_funnel" -> canon("stage")(TextAnalysis.filterFunnel),
    "t09_pii_scan" -> canon("doc_id")(TextAnalysis.piiScan),
    "t10_vocab_zipf" -> canon("rank")(TextAnalysis.vocab),
    "t11_bigram_novelty" -> canon("doc_id")(TextAnalysis.bigramNovelty),
    "t12_token_surprisal" -> canon("doc_id")(TextAnalysis.surprisal),
    "t13_source_profile" -> canon("source")(TextAnalysis.sourceProfile),
    "t14_source_overlap" ->
      canon("source_a", "source_b")((s, dir) => TextAnalysis.sourceOverlap(s, dir)),
    "t15_gopher_rules" -> canon("doc_id")(TextAnalysis.gopherRules),
    "t16_code_detect" -> canon("doc_id")(TextAnalysis.codeDetect),
    "t17_readability" -> canon("doc_id")(TextAnalysis.readability),
    "t18_bigram_xent" -> canon("doc_id")(TextAnalysis.bigramXent),
    "t19_cms_heavy_hitters" -> canon("rank")(TextAnalysis.cmsHeavyHitters),
    "t20_encoding_scan" -> canon("doc_id")(TextAnalysis.encodingScan),
  )

  // ---- shared DuckDB oracle fragments (north-star queries) ----------------

  /** tokens CTE: identical normalization + tokenizer to TextPrep, over an
    * arbitrary `(doc_id, …, text)` source (p17 re-tokenizes the kept
    * subset, everything else tokenizes `documents`). */
  private def toksCteFrom(src: String): String =
    s"""toks AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t
       |         FROM $src)""".stripMargin

  private val toksCte = toksCteFrom("documents")

  /** shingle CTEs shared by the dedup oracles. */
  private val shingleCtes =
    toksCte + """,
      |sh AS (SELECT doc_id,
      |         list_distinct(CASE WHEN len(t) >= 3
      |           THEN list_transform(generate_series(1, len(t) - 2),
      |                i -> concat_ws(' ', t[i], t[i+1], t[i+2]))
      |           ELSE CAST([] AS VARCHAR[]) END) AS shingles
      |       FROM toks),
      |ex AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
      |sizes AS (SELECT doc_id, len(shingles) AS n FROM sh)""".stripMargin

  /** d04 oracle — lifted to a val so d09's suite oracle can embed it. */
  private val d04OracleSql =
    s"""WITH $shingleCtes,
       |df AS (SELECT s, count(*) AS d FROM ex GROUP BY s),
       |kept AS (SELECT s FROM df
       |         WHERE d <= greatest(${Dedup.DfCapFloor},
       |           CAST(floor(${Dedup.DfCapFraction} *
       |             (SELECT count(*) FROM documents)) AS BIGINT))),
       |exk AS (SELECT ex.doc_id, ex.s FROM ex JOIN kept USING (s)),
       |cand AS (SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
       |         FROM exk a JOIN exk b ON a.s = b.s AND a.doc_id < b.doc_id),
       |i AS (SELECT da, db, count(*) AS inter
       |      FROM cand JOIN ex a ON da = a.doc_id
       |      JOIN ex b ON db = b.doc_id AND a.s = b.s
       |      GROUP BY 1, 2)
       |SELECT da, db, CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) AS jaccard
       |FROM i JOIN sizes sa ON da = sa.doc_id JOIN sizes sb ON db = sb.doc_id
       |WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= ${Dedup.JaccardThreshold}
       |ORDER BY da, db""".stripMargin

  /** d08 oracle — lifted for the same reason. Candidates from any shared
    * df-capped shingle (a lossless superset of the engine's inner-side
    * prefix index, so the verified ≥ τ outputs agree), exact re-score
    * over full shingle sets. */
  private val d08OracleSql =
    s"""WITH $shingleCtes,
       |df AS (SELECT s, count(*) AS d FROM ex GROUP BY s),
       |kept AS (SELECT s FROM df
       |         WHERE d <= greatest(${Dedup.DfCapFloor},
       |           CAST(floor(${Dedup.DfCapFraction} *
       |             (SELECT count(*) FROM documents)) AS BIGINT))),
       |exk AS (SELECT ex.doc_id, ex.s FROM ex JOIN kept USING (s)),
       |cand AS (SELECT DISTINCT a.doc_id AS inner_id, b.doc_id AS outer_id
       |         FROM exk a JOIN exk b ON a.s = b.s AND a.doc_id != b.doc_id),
       |i AS (SELECT inner_id, outer_id, count(*) AS inter
       |      FROM cand JOIN ex a ON inner_id = a.doc_id
       |      JOIN ex b ON outer_id = b.doc_id AND a.s = b.s
       |      GROUP BY 1, 2)
       |SELECT inner_id, outer_id, CAST(sa.n AS BIGINT) AS n_inner,
       |  CAST(inter AS BIGINT) AS n_overlap,
       |  CAST(inter AS DOUBLE) / sa.n AS containment
       |FROM i JOIN sizes sa ON inner_id = sa.doc_id
       |WHERE CAST(inter AS DOUBLE) / sa.n >= ${Dedup.ContainmentThreshold}
       |ORDER BY inner_id, outer_id""".stripMargin

  /** p04 oracle — lifted so p10's efficiency rollup can embed it. */
  /** d16 oracle — lifted to a def so d17's accounting oracle can embed
    * it (the d04/d09 pattern). */
  private def d16OracleSql: String = d16OracleSqlFrom("documents")

  /** The p16 span-removal applier over an arbitrary `(doc_id, lang, text)`
    * source — shared by p16 (whole corpus) and p17 (kept subset). Emits
    * the CTE chain + final SELECT (no leading WITH) so callers can
    * prepend their own CTEs. */
  private def cutsApplySqlFrom(src: String): String =
    "WITH " + cutsApplyCtesAndSelect(src)

  private def cutsApplyCtesAndSelect(src: String): String =
    s"""${toksCteFrom(src)},
       |spans AS (SELECT * FROM (${d16OracleSqlFrom(src)})),
       |tp AS (SELECT doc_id, unnest(generate_series(0, len(t) - 1)) AS pos,
       |         t FROM toks),
       |tk AS (SELECT doc_id, pos, t[CAST(pos + 1 AS INT)] AS tok FROM tp),
       |cut AS (SELECT DISTINCT k.doc_id, k.pos FROM tk k JOIN spans s
       |        ON k.doc_id = s.doc_id
       |       AND k.pos >= s.span_start AND k.pos < s.span_end),
       |keep AS (SELECT t.doc_id, t.pos, t.tok FROM tk t
       |         LEFT JOIN cut c ON t.doc_id = c.doc_id AND t.pos = c.pos
       |         WHERE c.doc_id IS NULL),
       |agg AS (SELECT doc_id, count(*) AS n_tokens_clean,
       |          string_agg(tok, ' ' ORDER BY pos) AS clean_text
       |        FROM keep GROUP BY doc_id)
       |SELECT d.doc_id, d.lang,
       |  CAST(COALESCE(a.n_tokens_clean, 0) AS BIGINT) AS n_tokens_clean,
       |  COALESCE(a.clean_text, '') AS clean_text
       |FROM $src d LEFT JOIN agg a USING (doc_id)
       |ORDER BY d.doc_id""".stripMargin

  private def d16OracleSqlFrom(src: String): String = {
    val W = Dedup.PassageLen
    s"""WITH ${toksCteFrom(src)},
       |tw AS (SELECT doc_id, t, len(t) AS n FROM toks WHERE len(t) >= $W),
       |win AS (SELECT doc_id, t,
       |    unnest(generate_series(0, n - $W)) AS pos FROM tw),
       |fps AS (SELECT doc_id, pos,
       |    md5(array_to_string(
       |      t[CAST(pos + 1 AS INT):CAST(pos + $W AS INT)], ' ')) AS fp
       |  FROM win),
       |r AS (SELECT doc_id, pos,
       |    count(*) OVER (PARTITION BY fp) AS n_occ,
       |    ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id, pos) AS rk
       |  FROM fps),
       |cuts AS (SELECT doc_id, pos FROM r WHERE n_occ >= 2 AND rk >= 2),
       |g AS (SELECT doc_id, pos,
       |    max(pos + $W) OVER (PARTITION BY doc_id ORDER BY pos
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
       |  FROM cuts),
       |b AS (SELECT doc_id, pos,
       |    CASE WHEN prev_end IS NULL OR pos > prev_end THEN 1 ELSE 0 END
       |      AS brk FROM g),
       |i AS (SELECT doc_id, pos,
       |    SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
       |  FROM b)
       |SELECT doc_id, CAST(min(pos) AS BIGINT) AS span_start,
       |  CAST(max(pos) + $W AS BIGINT) AS span_end,
       |  count(*) AS n_windows,
       |  CAST(max(pos) + $W - min(pos) AS BIGINT) AS n_tokens_cut
       |FROM i GROUP BY doc_id, island
       |ORDER BY doc_id, span_start""".stripMargin
  }

  private val p04OracleSql =
    s"""WITH tk AS (SELECT doc_id, lang,
       |    CAST(len(string_split_regex(lower(trim(text)), '\\s+')) AS BIGINT)
       |      AS n_tokens
       |  FROM documents),
       |c AS (SELECT doc_id, lang, n_tokens,
       |    CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY lang
       |      ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
       |      AS cum_before
       |  FROM tk)
       |SELECT doc_id, lang, n_tokens,
       |  cum_before // ${Sampling.ContextLen} AS start_bin,
       |  (cum_before + n_tokens - 1) // ${Sampling.ContextLen} AS end_bin,
       |  cum_before % ${Sampling.ContextLen} AS offset_in_bin
       |FROM c ORDER BY lang, doc_id""".stripMargin

  /** p05 oracle — lifted for the same reason. */
  private val p05OracleSql =
    s"""WITH $shingleCtes,
       |sp AS (SELECT doc_id,
       |    CASE WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
       |              AS BIGINT) % 100 < 80 THEN 'train'
       |         WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
       |              AS BIGINT) % 100 < 90 THEN 'val' ELSE 'test' END AS split
       |  FROM documents),
       |testdocs AS (SELECT sh.doc_id, CAST(len(shingles) AS BIGINT)
       |      AS n_shingles
       |  FROM sh JOIN sp ON sh.doc_id = sp.doc_id WHERE split = 'test'),
       |testpost AS (SELECT ex.doc_id, s FROM ex
       |  JOIN sp ON ex.doc_id = sp.doc_id WHERE split = 'test'),
       |trainsh AS (SELECT s FROM ex JOIN sp ON ex.doc_id = sp.doc_id
       |  WHERE split = 'train'
       |  GROUP BY s HAVING count(*) <= ${Sampling.DecontamDfCap}),
       |shared AS (SELECT tp.doc_id, count(*) AS n_shared
       |  FROM testpost tp JOIN trainsh USING (s) GROUP BY tp.doc_id)
       |SELECT t.doc_id, n_shingles,
       |  COALESCE(n_shared, 0) AS n_shared_shingles,
       |  (n_shingles > 0 AND COALESCE(n_shared, 0) * 10 >= n_shingles)
       |    AS contaminated
       |FROM testdocs t LEFT JOIN shared USING (doc_id)
       |ORDER BY doc_id""".stripMargin

  /** The d02 MinHash+LSH chain up to a `pairs(da, db, jaccard)` CTE —
    * shared by the d02 oracle and d06's connected-components closure.
    * Same universal-hash family as TextPrep.minhashAgg: one md5 per
    * shingle, h_j = (a_j·base + b_j) mod p with md5-derived constants.
    */
  private def minhashPairCtes: String = {
    val sigCols = (0 until Dedup.K)
      .map(j => s"min((${graft.operators.TextPrep.mixA(j)} * hb + " +
        s"${graft.operators.TextPrep.mixB(j)}) % " +
        s"${graft.operators.TextPrep.MinhashP}) AS h$j").mkString(",\n  ")
    val bandSelects = (0 until Dedup.Bands).map { b =>
      val cols = (0 until Dedup.RowsPerBand).map(r => s"h${b * Dedup.RowsPerBand + r}")
      s"SELECT doc_id, $b AS band, md5(${cols.mkString(" || ")}) AS bkey FROM sig"
    }.mkString("\n  UNION ALL ")
    s"""$shingleCtes,
       |exh AS (SELECT doc_id,
       |          CAST('0x' || substr(md5(s), 1, 8) AS BIGINT) AS hb FROM ex),
       |sig AS (SELECT doc_id,
       |  $sigCols
       |FROM exh GROUP BY doc_id),
       |bands AS (
       |  $bandSelects),
       |cand AS (SELECT DISTINCT x.doc_id AS da, y.doc_id AS db
       |         FROM bands x JOIN bands y
       |           ON x.band = y.band AND x.bkey = y.bkey AND x.doc_id < y.doc_id),
       |i AS (SELECT da, db, count(*) AS inter
       |      FROM cand JOIN ex a ON a.doc_id = da
       |                JOIN ex b ON b.doc_id = db AND b.s = a.s
       |      GROUP BY da, db),
       |pairs AS (
       |  SELECT da, db, CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) AS jaccard
       |  FROM i JOIN sizes sa ON da = sa.doc_id JOIN sizes sb ON db = sb.doc_id
       |  WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter)
       |    >= ${Dedup.JaccardThreshold})""".stripMargin
  }

  /** The d06 connected-component closure over the d02 pairs, ending in a
    * `cl(doc_id, cluster)` CTE — shared by the d06 and p08 oracles. Must
    * run under WITH RECURSIVE. */
  private def closureCtes: String =
    s"""$minhashPairCtes,
       |edges AS (SELECT da AS ea, db AS eb FROM pairs
       |          UNION ALL SELECT db, da FROM pairs),
       |reach AS (SELECT ea, eb FROM edges
       |          UNION
       |          SELECT r.ea, e.eb FROM reach r JOIN edges e ON r.eb = e.ea),
       |cl AS (SELECT ea AS doc_id, least(ea, min(eb)) AS cluster
       |       FROM reach GROUP BY ea)""".stripMargin

  /** exact-decimal self-dot (norm²) over embeddings — matches Dedup.dotDec. */
  private def embCteFrom(src: String) =
    s"""e AS (SELECT vec_id, embedding,
       |        list_sum(list_transform(embedding,
       |          x -> CAST(CAST(x AS DOUBLE) AS DECIMAL(12,6)) * CAST(CAST(x AS DOUBLE) AS DECIMAL(12,6)))) AS n2
       |      FROM $src)""".stripMargin

  private val embCte = embCteFrom("embeddings")

  /** SQL twin of the d26 sweep's deterministic hash-shard
    * ([[Dedup.embPlanesSweepSampled]]): same md5-bucket predicate as the
    * p02/p03 split machinery, so both engines select the same vectors. */
  private val sweepShardSql =
    "(SELECT * FROM embeddings WHERE" +
      " CAST('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 8) AS BIGINT)" +
      s" % 100 < ${Dedup.SweepSamplePct})"

  private val dotAB =
    """list_sum(list_transform(list_zip(a.embedding, b.embedding),
      |  z -> CAST(CAST(z[1] AS DOUBLE) AS DECIMAL(12,6)) * CAST(CAST(z[2] AS DOUBLE) AS DECIMAL(12,6))))"""
      .stripMargin.replaceAll("\n", " ")

  /** SQL twin of [[Similarity.adaptiveStride]]: `max(1, ⌊√N⌋)` over an
    * explicit COUNT subquery — the oracle derives the same stride the
    * engine counts (floor/sqrt are exactly-rounded IEEE in both engines
    * and √integer never sits on a rounding boundary), so the fixtures
    * stay deterministic at every corpus size instead of pinning one
    * constant that makes K ∝ N. */
  private def adaptiveStrideSql(countFrom: String): String =
    s"GREATEST(1, CAST(floor(sqrt((SELECT count(*) FROM $countFrom)))" +
      " AS BIGINT))"

  /** [[adaptiveStrideSql]] over the `e` CTE's centroid-eligible rows —
    * the population [[Similarity.centsOf]] samples (`vec_id >=
    * NumQueries`, narrowed by the same membership pred as the cents
    * CTE it feeds). */
  private def ivfStrideSql(centsPred: String = ""): String =
    adaptiveStrideSql(
      s"e WHERE vec_id >= ${Similarity.NumQueries}$centsPred")

  /** SQL twin of [[Dedup.adaptiveEmbPlanes]]: the same integer CASE
    * ladder over an explicit COUNT subquery — generated from the SAME
    * Scala constants, so engine and oracle cannot disagree on a rung
    * (and the ladder is pure integer comparison: no float boundary). */
  private def embPlanesSql(countFrom: String): String = {
    val whens = (Dedup.EmbPlanesPerBand until Dedup.EmbPlanesMax)
      .map(p => s"WHEN n <= ${Dedup.EmbTargetOccupancy << p} THEN $p")
      .mkString(" ")
    s"(SELECT CASE $whens ELSE ${Dedup.EmbPlanesMax} END" +
      s" FROM (SELECT count(*) AS n FROM $countFrom))"
  }

  /** Full [[Dedup.EmbPlanesMax]]-bit sign strings per band
    * (`vec_id, band, fb`) — same md5-derived hyperplanes as the engine,
    * via the prefix-stable [[Dedup.embPlaneSlot]] arrangement. The sign
    * of a sequential double fold is engine-exact on both sides. Shared
    * by the adaptive-truncation [[embBandSql]] (d05/d19) and the d26
    * sweep's literal-P truncations. */
  private lazy val embBandFullSql: String = {
    val w = Dedup.embPlaneWeights
    (0 until Dedup.EmbBands).map { b =>
      val bits = (0 until Dedup.EmbPlanesMax).map { p =>
        val l = w(Dedup.embPlaneSlot(b, p)).mkString("[", ", ", "]")
        s"(CASE WHEN list_sum(list_transform(list_zip(embedding, $l::FLOAT[]), " +
          "z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE))) >= 0 " +
          "THEN '1' ELSE '0' END)"
      }.mkString(" || ")
      s"SELECT vec_id, $b AS band, $bits AS fb FROM e"
    }.mkString("\n  UNION ALL ")
  }

  /** The banded sign-pattern table of the d05/d19 oracles (`bb`): the
    * full bit strings truncated to the count-derived plane count, which
    * IS the engine's adaptive geometry (the engine computes only its
    * derived bits; prefix-stability makes truncation and direct
    * construction identical). */
  private lazy val embBandSql: String =
    s"SELECT vec_id, band, substr(fb, 1, ${embPlanesSql("e")}) AS bucket" +
      s" FROM (\n  $embBandFullSql)"

  /** Shared d27/d27b oracle: per-scope count → inline integer ladder →
    * full-bit banding prefix-truncated at each scope's rung →
    * within-scope candidates → exact re-score, over whatever CTE chain
    * `ePreamble` uses to define `e(vec_id, embedding, scope, n2)` (the
    * plain corpus for d27; the planted-twin variant for d27b). */
  private def scopedPairsSqlOver(ePreamble: String): String = {
    val ladder = {
      val whens =
        (Dedup.EmbPlanesPerBand until Dedup.EmbPlanesMax)
          .map(p => s"WHEN n <= ${Dedup.EmbTargetOccupancy << p} THEN $p")
          .mkString(" ")
      s"CASE $whens ELSE ${Dedup.EmbPlanesMax} END"
    }
    s"""WITH $ePreamble,
       |cnt AS (SELECT scope, $ladder AS p
       |        FROM (SELECT scope, count(*) AS n FROM e GROUP BY scope)),
       |bbf AS (
       |  $embBandFullSql),
       |bb AS (SELECT b.vec_id, s.scope, b.band,
       |         substr(b.fb, 1, c.p) AS bucket
       |       FROM bbf b
       |       JOIN (SELECT vec_id, scope FROM e) s USING (vec_id)
       |       JOIN cnt c USING (scope)),
       |cand AS (SELECT DISTINCT x.vec_id AS va, y.vec_id AS vb
       |         FROM bb x JOIN bb y ON x.scope = y.scope
       |           AND x.band = y.band AND x.bucket = y.bucket
       |           AND x.vec_id < y.vec_id)
       |SELECT va, vb,
       |  CAST($dotAB AS DOUBLE)
       |    / (sqrt(CAST(a.n2 AS DOUBLE)) * sqrt(CAST(b.n2 AS DOUBLE))) AS cos_sim
       |FROM cand JOIN e a ON va = a.vec_id JOIN e b ON vb = b.vec_id
       |WHERE CAST($dotAB AS DOUBLE)
       |    / (sqrt(CAST(a.n2 AS DOUBLE)) * sqrt(CAST(b.n2 AS DOUBLE))) > ${Dedup.CosineThreshold}
       |ORDER BY va, vb""".stripMargin
  }

  /** Shared d19/d19b oracle: full-outer join of the d05 (LSH-found) and
    * d18 (cluster-found) verified ≥τ pair tables plus the 1-row rollup,
    * over whatever `eCte` defines `e(vec_id, embedding, n2)` — the full
    * corpus for d19, the md5-bucket hash-shard for d19b. Every geometry
    * term (plane ladder, centroid stride) derives from `e`'s own count,
    * so the shard re-derives its own rungs exactly like the engine. */
  private def agreementSqlOver(eCte: String): String = {
    val tau = Dedup.CosineThreshold
    val cos = s"CAST($dotAB AS DOUBLE)" +
      " / (sqrt(CAST(a.n2 AS DOUBLE)) * sqrt(CAST(b.n2 AS DOUBLE)))"
    s"""WITH $eCte,
       |bb AS (
       |  $embBandSql),
       |lshc AS (SELECT DISTINCT x.vec_id AS va, y.vec_id AS vb
       |         FROM bb x JOIN bb y ON x.band = y.band
       |           AND x.bucket = y.bucket AND x.vec_id < y.vec_id),
       |lshp AS (SELECT va, vb, 1 AS l
       |  FROM lshc JOIN e a ON va = a.vec_id JOIN e b ON vb = b.vec_id
       |  WHERE $cos > $tau),
       |cents AS (SELECT vec_id AS cid, embedding AS cv, n2 AS cn2 FROM e
       |          WHERE vec_id % ${adaptiveStrideSql("e")} = 0),
       |ac AS (SELECT a.vec_id, c.cid,
       |    CAST(list_sum(list_transform(list_zip(a.embedding, c.cv),
       |      z -> CAST(CAST(z[1] AS DOUBLE) AS DECIMAL(12,6))
       |         * CAST(CAST(z[2] AS DOUBLE) AS DECIMAL(12,6)))) AS DOUBLE)
       |      / (sqrt(CAST(a.n2 AS DOUBLE)) * sqrt(CAST(c.cn2 AS DOUBLE))) AS ccos
       |  FROM e a, cents c),
       |assign AS (SELECT vec_id, cid FROM (
       |    SELECT vec_id, cid, ROW_NUMBER() OVER (PARTITION BY vec_id
       |      ORDER BY ccos DESC, cid) AS rn FROM ac)
       |  WHERE rn = 1),
       |semc AS (SELECT x.vec_id AS va, y.vec_id AS vb
       |         FROM assign x JOIN assign y ON x.cid = y.cid
       |           AND x.vec_id < y.vec_id),
       |semp AS (SELECT va, vb, 1 AS m
       |  FROM semc JOIN e a ON va = a.vec_id JOIN e b ON vb = b.vec_id
       |  WHERE $cos > $tau),
       |j AS (SELECT coalesce(l, 0) AS l, coalesce(m, 0) AS m
       |      FROM lshp FULL JOIN semp USING (va, vb))
       |SELECT CAST((SELECT count(*) FROM e) AS BIGINT) AS n_vectors,
       |  CAST(sum(l) AS BIGINT) AS n_lsh,
       |  CAST(sum(m) AS BIGINT) AS n_sem,
       |  CAST(sum(l * m) AS BIGINT) AS n_both,
       |  CAST(sum(l) - sum(l * m) AS BIGINT) AS n_lsh_only,
       |  CAST(sum(m) - sum(l * m) AS BIGINT) AS n_sem_only,
       |  CAST(sum(l * m) AS DOUBLE)
       |    / (sum(l) + sum(m) - sum(l * m)) AS jaccard_overlap
       |FROM j""".stripMargin
  }

  /** Exact-decimal norm² over an arbitrary source relation — the embCte
    * body applied to a CTE that already carries a `scope` column. */
  private def n2Expr: String =
    """list_sum(list_transform(embedding,
      |          x -> CAST(CAST(x AS DOUBLE) AS DECIMAL(12,6)) * CAST(CAST(x AS DOUBLE) AS DECIMAL(12,6))))"""
      .stripMargin

  /** Full s01/s02/s03/s05/s07 oracle bodies — their own map entries, and
    * composed as subqueries by the s06 and s09 recall oracles. */
  private def s05Sql: String =
    s"""WITH qa AS (SELECT vec_id, embedding,
       |    list_max(list_transform(embedding, y -> abs(CAST(y AS DOUBLE)))) AS amax
       |  FROM embeddings),
       |q AS (SELECT vec_id, list_transform(embedding, x ->
       |    CAST(floor(CAST(x AS DOUBLE) * 127.0 / amax + 0.5) AS BIGINT)) AS qv
       |  FROM qa),
       |e AS (SELECT vec_id, qv,
       |    sqrt(CAST(list_sum(list_transform(qv, v -> v * v)) AS DOUBLE)) AS qn
       |  FROM q),
       |scored AS (
       |  SELECT a.vec_id AS qid, b.vec_id AS neighbor_id,
       |    CAST(list_sum(list_transform(list_zip(a.qv, b.qv),
       |      z -> z[1] * z[2])) AS DOUBLE) / (a.qn * b.qn) AS qcos
       |  FROM e a JOIN e b ON b.vec_id <> a.vec_id
       |  WHERE a.vec_id < ${Similarity.NumQueries}),
       |r AS (SELECT qid, neighbor_id, qcos,
       |        CAST(ROW_NUMBER() OVER (PARTITION BY qid
       |          ORDER BY qcos DESC, neighbor_id) AS INT) AS rank
       |      FROM scored)
       |SELECT qid, rank, neighbor_id, qcos FROM r
       |WHERE rank <= 3 ORDER BY qid, rank""".stripMargin

  // PQ/ADC: same decimal-exact per-element contract as embCte/dotAB;
  // argmin replayed as ROW_NUMBER over (key, code) — identical semantics
  // to the engine's min(struct(key, code)).
  private def s07Sql: String =
    s07SqlFor(Similarity.PqM, Similarity.PqSubDim)

  /** IVF probe pruning composed with PQ/ADC scoring (the s15 oracle;
    * also embedded by the s06 recall eval). */
  private def s15Sql: String =
    s"""${s15Ctes}
       |SELECT qid, rank, neighbor_id, pq_score FROM r
       |WHERE rank <= 3 ORDER BY qid, rank, neighbor_id""".stripMargin

  // s16 refine: exact-decimal re-rank (the dotAB contract) of the
  // rank <= RefineK compressed retrieval UNIONED with the exact-code
  // channel (candidates whose packed PQ code key equals the query's own
  // encoding always advance — quantization cannot separate exact
  // duplicates) — shared by the s16 oracle and the m11 visual-ANN
  // composition (ONE definition of the refine stage)
  private def s16RefineCtes: String =
    s"""ck AS (SELECT vec_id,
       |         CAST(SUM(code * CAST(pow(2, 4*m) AS BIGINT)) AS BIGINT)
       |           AS ckey
       |       FROM codes GROUP BY vec_id),
       |ceq AS (SELECT c.qid, c.vec_id AS neighbor_id
       |        FROM cand c JOIN ck nk ON nk.vec_id = c.vec_id
       |        JOIN ck qk ON qk.vec_id = c.qid AND qk.ckey = nk.ckey),
       |ret AS (SELECT qid, neighbor_id FROM r
       |        WHERE rank <= ${Similarity.RefineK}
       |        UNION SELECT qid, neighbor_id FROM ceq),
       |ex AS (SELECT ret.qid, ret.neighbor_id,
       |    CAST($dotAB AS DOUBLE)
       |      / (sqrt(CAST(a.n2 AS DOUBLE)) * sqrt(CAST(b.n2 AS DOUBLE)))
       |      AS cos_sim
       |  FROM ret JOIN e a ON ret.qid = a.vec_id
       |    JOIN e b ON ret.neighbor_id = b.vec_id),
       |rr AS (SELECT qid, neighbor_id, cos_sim,
       |        CAST(ROW_NUMBER() OVER (PARTITION BY qid
       |          ORDER BY cos_sim DESC, neighbor_id) AS INT) AS rank
       |      FROM ex)""".stripMargin

  private def s16Sql: String =
    s"""${s15Ctes},
       |$s16RefineCtes
       |SELECT qid, rank, neighbor_id, cos_sim FROM rr
       |WHERE rank <= 3 ORDER BY qid, rank""".stripMargin

  /** m11 feature + truth CTEs: per-BMP 16-bin intensity histograms as
    * the `e(vec_id, embedding, n2)` corpus (vec_id = doc_id / 2 — the
    * m04 decode formulas over even docs), the m05 aHash fingerprints,
    * exact-duplicate pairs, and the duplicate-query id set the IVF-PQ
    * chain serves. */
  private def m11FeatureCtes: String = {
    val bcols = (0 until 16).map(b =>
      s"CAST(sum(CASE WHEN bin = $b THEN 1 ELSE 0 END) AS DOUBLE) AS b$b")
      .mkString(",\n    ")
    val arr = (0 until 16).map(b => s"b$b").mkString("[", ", ", "]")
    s"""imgs AS (SELECT doc_id, text,
       |    CAST(12*(length(text) % 3 + 1)
       |      * (length(text) // (12*(length(text) % 3 + 1))) AS INT) AS declen
       |  FROM documents WHERE doc_id % 2 = 0),
       |ci AS (SELECT doc_id // 2 AS vec_id,
       |    ord(substr(text, CAST(i AS INT), 1)) // 16 AS bin
       |  FROM (SELECT doc_id, text,
       |          unnest(generate_series(1, declen)) AS i FROM imgs)),
       |hb AS (SELECT vec_id,
       |    $bcols
       |  FROM ci GROUP BY vec_id),
       |e AS (SELECT vec_id, $arr AS embedding,
       |    list_sum(list_transform($arr,
       |      x -> CAST(CAST(x AS DOUBLE) AS DECIMAL(12,6))
       |        * CAST(CAST(x AS DOUBLE) AS DECIMAL(12,6)))) AS n2
       |  FROM hb),
       |px AS (SELECT doc_id // 2 AS vec_id,
       |    list_transform(generate_series(0, 63),
       |      i -> ord(substr(text, CAST((i * declen) // 64 AS INT) + 1, 1)))
       |      AS pixels
       |  FROM imgs),
       |sgm AS (SELECT vec_id, pixels, list_sum(pixels) AS st FROM px),
       |ah AS (SELECT vec_id, array_to_string(list_transform(pixels,
       |      p -> CASE WHEN p * 64 > st THEN '1' ELSE '0' END), '') AS ahash
       |  FROM sgm),
       |duppairs AS (SELECT a.vec_id AS dqid, b.vec_id AS partner
       |  FROM ah a JOIN ah b ON a.ahash = b.ahash AND b.vec_id <> a.vec_id),
       |qids AS (SELECT DISTINCT dqid AS qid FROM duppairs)""".stripMargin
  }

  /** The verbatim s15+s16 retrieval chain over the image-feature corpus
    * at the 16-dim PQ grid, querying the duplicate images. */
  private def m11Ctes: String =
    s"""${s15CtesFor("", "", src = m11FeatureCtes,
         m = graft.operators.Multimodal.M11PqM,
         sd = graft.operators.Multimodal.M11PqSubDim,
         queryPred = a => s"${a}vec_id IN (SELECT qid FROM qids)")},
       |$s16RefineCtes""".stripMargin

  private def m11Sql: String =
    s"""$m11Ctes
       |SELECT qid, rank, neighbor_id, cos_sim FROM rr
       |WHERE rank <= 3 ORDER BY qid, rank""".stripMargin

  private def m12Sql: String =
    s"""$m11Ctes,
       |top3 AS (SELECT qid, neighbor_id FROM rr WHERE rank <= 3)
       |SELECT dqid AS qid, partner, (t.neighbor_id IS NOT NULL) AS hit
       |FROM duppairs LEFT JOIN top3 t
       |  ON t.qid = dqid AND t.neighbor_id = partner
       |ORDER BY qid, partner""".stripMargin

  /** m13 feature CTEs: per-WAV 16-bin byte histograms over the decoded
    * PCM stream (declen = whole 16-bit frames) as the `e` corpus,
    * vec_id = doc_id // 2 over the ODD docs — the audio mirror of
    * [[m11FeatureCtes]]. */
  private def m13FeatureCtes: String = {
    val bcols = (0 until 16).map(b =>
      s"CAST(sum(CASE WHEN bin = $b THEN 1 ELSE 0 END) AS DOUBLE) AS b$b")
      .mkString(",\n    ")
    val arr = (0 until 16).map(b => s"b$b").mkString("[", ", ", "]")
    s"""aud AS (SELECT doc_id, text,
       |    CAST(length(text) - length(text) % 2 AS INT) AS declen
       |  FROM documents WHERE doc_id % 2 = 1),
       |ca AS (SELECT doc_id // 2 AS vec_id,
       |    ord(substr(text, CAST(i AS INT), 1)) // 16 AS bin
       |  FROM (SELECT doc_id, text,
       |          unnest(generate_series(1, declen)) AS i FROM aud)),
       |hb AS (SELECT vec_id,
       |    $bcols
       |  FROM ca GROUP BY vec_id),
       |e AS (SELECT vec_id, $arr AS embedding,
       |    list_sum(list_transform($arr,
       |      x -> CAST(CAST(x AS DOUBLE) AS DECIMAL(12,6))
       |        * CAST(CAST(x AS DOUBLE) AS DECIMAL(12,6)))) AS n2
       |  FROM hb)""".stripMargin
  }

  /** The verbatim s15+s16 retrieval chain over the audio-feature corpus
    * at the 16-dim PQ grid, standard query roles (vec_id < NumQueries). */
  private def m13Ctes: String =
    s"""${s15CtesFor("", "", src = m13FeatureCtes,
         m = graft.operators.Multimodal.M11PqM,
         sd = graft.operators.Multimodal.M11PqSubDim)},
       |$s16RefineCtes""".stripMargin

  private def m13Sql: String =
    s"""$m13Ctes
       |SELECT qid, rank, neighbor_id, cos_sim FROM rr
       |WHERE rank <= 3 ORDER BY qid, rank""".stripMargin

  private def m14Sql: String = {
    val np = 3 * Similarity.NumQueries
    s"""$m13Ctes,
       |top3 AS (SELECT qid, neighbor_id FROM rr WHERE rank <= 3),
       |bfr AS (
       |  SELECT a.vec_id AS qid, b.vec_id AS neighbor_id,
       |    CAST($dotAB AS DOUBLE)
       |      / (sqrt(CAST(a.n2 AS DOUBLE)) * sqrt(CAST(b.n2 AS DOUBLE)))
       |      AS cos_sim
       |  FROM e a JOIN e b ON b.vec_id <> a.vec_id
       |  WHERE a.vec_id < ${Similarity.NumQueries}),
       |bf AS (SELECT qid, neighbor_id FROM (
       |    SELECT qid, neighbor_id, ROW_NUMBER() OVER (PARTITION BY qid
       |      ORDER BY cos_sim DESC, neighbor_id) AS rank FROM bfr)
       |  WHERE rank <= 3)
       |SELECT 'audio_ivfpq' AS method,
       |  CAST((SELECT count(*) FROM top3 JOIN bf USING (qid, neighbor_id))
       |    AS BIGINT) AS n_hits,
       |  CAST($np AS BIGINT) AS n_possible,
       |  CAST((SELECT count(*) FROM top3 JOIN bf USING (qid, neighbor_id))
       |    AS DOUBLE) / $np AS recall_at_3""".stripMargin
  }

  /** s17 ingest-membership predicates (the frozen-artifact exclusions):
    * batch rows are `vec_id % IngestMod = IngestRem`. */
  private def s17NewPred =
    s"vec_id % ${Similarity.IngestMod} = ${Similarity.IngestRem}"
  private def s17NotNewPred = s" AND NOT ($s17NewPred)"

  /** s15's search data flow with the quantizer artifacts frozen to the
    * pre-ingest corpus — the post-ingest retrieval the s17b recall
    * oracle scores. */
  private def s15IngestSql: String =
    s"""${s15CtesFor(s17NotNewPred, s17NotNewPred)}
       |SELECT qid, rank, neighbor_id, pq_score FROM r
       |WHERE rank <= 3 ORDER BY qid, rank""".stripMargin

  /** s17 maintenance-audit oracle: assignment over index members against
    * the existing-only centroid sample, PQ codes through the
    * existing-only codebook, per-list before/added/after occupancy. */
  private def s17Sql: String = {
    val nq = Similarity.NumQueries
    s"""WITH $embCte,
       |${pqCtes(Similarity.PqM, Similarity.PqSubDim, s17NotNewPred)},
       |${memberAssignCtes(s17NotNewPred)},
       |before AS (SELECT cid, count(*) AS n_before FROM assign
       |           WHERE NOT ($s17NewPred) GROUP BY cid),
       |csum AS (SELECT vec_id, CAST(SUM(code) AS BIGINT) AS code_sum
       |         FROM codes WHERE $s17NewPred AND vec_id >= $nq
       |         GROUP BY vec_id),
       |added AS (SELECT a.cid, count(*) AS n_added,
       |            CAST(SUM(code_sum) AS BIGINT) AS code_mass_added
       |          FROM assign a JOIN csum USING (vec_id)
       |          WHERE a.$s17NewPred GROUP BY a.cid),
       |tot AS (SELECT
       |    CAST((SELECT SUM(n_before) FROM before) AS BIGINT) AS tot_before,
       |    CAST((SELECT count(*) FROM mem WHERE $s17NewPred) AS BIGINT)
       |      AS n_batch)
       |SELECT b.cid, b.n_before,
       |  COALESCE(a.n_added, 0) AS n_added,
       |  b.n_before + COALESCE(a.n_added, 0) AS n_after,
       |  CAST(b.n_before AS DOUBLE) / tot_before AS share_before,
       |  CAST(b.n_before + COALESCE(a.n_added, 0) AS DOUBLE)
       |    / (tot_before + n_batch) AS share_after,
       |  CAST(b.n_before + COALESCE(a.n_added, 0) AS DOUBLE)
       |      / (tot_before + n_batch)
       |    - CAST(b.n_before AS DOUBLE) / tot_before AS share_drift,
       |  COALESCE(a.code_mass_added, 0) AS code_mass_added
       |FROM before b LEFT JOIN added a USING (cid) CROSS JOIN tot
       |ORDER BY b.cid""".stripMargin
  }

  /** Shared audit CTE chain over index MEMBERS (vec_id >= NumQueries):
    * the coarse-centroid sample (optionally membership-filtered by
    * `centsPred`), the member×centroid cosine table, and the
    * argmax-cosine inverted-list assignment — the replay every
    * maintenance-audit oracle (s17 ingest / s18 delete / s20 shard
    * merge) starts from. Expects the `e` CTE in scope. */
  private def memberAssignCtes(centsPred: String): String = {
    val nq = Similarity.NumQueries
    s"""cents AS (SELECT vec_id AS cid, embedding AS cv, n2 AS cn2 FROM e
       |          WHERE vec_id % ${ivfStrideSql(centsPred)} = 0
       |            AND vec_id >= $nq$centsPred),
       |mem AS (SELECT * FROM e WHERE vec_id >= $nq),
       |ac AS (SELECT a.vec_id, c.cid,
       |    list_sum(list_transform(list_zip(a.embedding, c.cv),
       |      z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE)))
       |      / (sqrt(CAST(a.n2 AS DOUBLE)) * sqrt(CAST(c.cn2 AS DOUBLE)))
       |      AS ccos
       |  FROM mem a, cents c),
       |assign AS (SELECT vec_id, cid FROM (
       |    SELECT vec_id, cid, ROW_NUMBER() OVER (PARTITION BY vec_id
       |      ORDER BY ccos DESC, cid) AS rn FROM ac)
       |  WHERE rn = 1)""".stripMargin
  }

  /** s18 tombstone predicate (the CDC delete-feed membership), with an
    * optional table alias for qualified contexts. */
  private def s18TombPred(a: String = ""): String =
    s"(${a}vec_id % ${Similarity.DeleteMod} = ${Similarity.DeleteRem}" +
      s" AND ${a}vec_id >= ${Similarity.NumQueries})"

  /** s18 compaction-audit oracle: assignment over ALL pre-delete members
    * against the full-corpus (frozen) centroid sample, PQ code mass of
    * the tombstoned rows through the full-corpus codebook, per-list
    * before/removed/after occupancy. */
  private def s18Sql: String = {
    s"""WITH $embCte,
       |${pqCtes(Similarity.PqM, Similarity.PqSubDim)},
       |${memberAssignCtes("")},
       |before AS (SELECT cid, count(*) AS n_before FROM assign GROUP BY cid),
       |csum AS (SELECT vec_id, CAST(SUM(code) AS BIGINT) AS code_sum
       |         FROM codes WHERE ${s18TombPred()} GROUP BY vec_id),
       |removed AS (SELECT a.cid, count(*) AS n_removed,
       |              CAST(SUM(code_sum) AS BIGINT) AS code_mass_removed
       |            FROM assign a JOIN csum USING (vec_id) GROUP BY a.cid),
       |tot AS (SELECT
       |    CAST((SELECT SUM(n_before) FROM before) AS BIGINT) AS tot_before,
       |    CAST((SELECT count(*) FROM mem WHERE ${s18TombPred()}) AS BIGINT)
       |      AS n_tomb)
       |SELECT b.cid, b.n_before,
       |  COALESCE(r.n_removed, 0) AS n_removed,
       |  b.n_before - COALESCE(r.n_removed, 0) AS n_after,
       |  CAST(b.n_before AS DOUBLE) / tot_before AS share_before,
       |  CAST(b.n_before - COALESCE(r.n_removed, 0) AS DOUBLE)
       |    / (tot_before - n_tomb) AS share_after,
       |  CAST(b.n_before - COALESCE(r.n_removed, 0) AS DOUBLE)
       |      / (tot_before - n_tomb)
       |    - CAST(b.n_before AS DOUBLE) / tot_before AS share_drift,
       |  COALESCE(r.code_mass_removed, 0) AS code_mass_removed
       |FROM before b LEFT JOIN removed r USING (cid) CROSS JOIN tot
       |ORDER BY b.cid""".stripMargin
  }

  /** s18b post-delete retrieval oracle: the verbatim s15 search flow
    * with tombstoned members excluded from the candidate (inverted-list)
    * side only — artifacts stay the full pre-delete corpus's. */
  private def s18bSql: String =
    s"""${s15CtesFor("", "", s" AND NOT ${s18TombPred("a.")}")}
       |SELECT qid, rank, neighbor_id, pq_score FROM r
       |WHERE rank <= 3 ORDER BY qid, rank, neighbor_id""".stripMargin

  /** s20 shard-merge oracle: per-list member counts and exact PQ code
    * mass split by build shard (`vec_id % ShardMod`), artifacts frozen
    * to the full corpus — the merge planner's audit replayed. */
  private def s20Sql: String = {
    val nq = Similarity.NumQueries
    val sm = Similarity.ShardMod
    s"""WITH $embCte,
       |${pqCtes(Similarity.PqM, Similarity.PqSubDim)},
       |${memberAssignCtes("")},
       |csum AS (SELECT vec_id, CAST(SUM(code) AS BIGINT) AS code_sum
       |         FROM codes WHERE vec_id >= $nq GROUP BY vec_id)
       |SELECT a.cid,
       |  CAST(SUM(CASE WHEN a.vec_id % $sm = 0 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_shard0,
       |  CAST(SUM(CASE WHEN a.vec_id % $sm = 1 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_shard1,
       |  CAST(count(*) AS BIGINT) AS n_merged,
       |  CAST(SUM(CASE WHEN a.vec_id % $sm = 0 THEN code_sum ELSE 0 END)
       |    AS BIGINT) AS code_mass_shard0,
       |  CAST(SUM(CASE WHEN a.vec_id % $sm = 1 THEN code_sum ELSE 0 END)
       |    AS BIGINT) AS code_mass_shard1,
       |  CAST(SUM(code_sum) AS BIGINT) AS code_mass_merged
       |FROM assign a JOIN csum USING (vec_id)
       |GROUP BY a.cid ORDER BY a.cid""".stripMargin
  }

  /** Full s08 exact filtered-top-3 oracle body — its own entry, and the
    * truth term of the s21 strategy audit. */
  private def s08Sql: String =
    s"""WITH el AS (SELECT vec_id, label, embedding,
       |        list_sum(list_transform(embedding,
       |          x -> CAST(CAST(x AS DOUBLE) AS DECIMAL(12,6))
       |            * CAST(CAST(x AS DOUBLE) AS DECIMAL(12,6)))) AS n2
       |      FROM embeddings),
       |scored AS (
       |  SELECT a.vec_id AS qid, a.label AS qlabel, b.vec_id AS neighbor_id,
       |    CAST($dotAB AS DOUBLE)
       |      / (sqrt(CAST(a.n2 AS DOUBLE)) * sqrt(CAST(b.n2 AS DOUBLE)))
       |      AS cos_sim
       |  FROM el a JOIN el b ON b.label = a.label AND b.vec_id <> a.vec_id
       |  WHERE a.vec_id < ${Similarity.NumQueries}),
       |r AS (SELECT qid, qlabel, neighbor_id, cos_sim,
       |        CAST(ROW_NUMBER() OVER (PARTITION BY qid
       |          ORDER BY cos_sim DESC, neighbor_id) AS INT) AS rank
       |      FROM scored)
       |SELECT qid, qlabel, rank, neighbor_id, cos_sim FROM r
       |WHERE rank <= 3 ORDER BY qid, rank""".stripMargin

  /** s21 filtered-ANN strategy audit oracle: the unfiltered s15 ranked
    * flow (post-filter base) plus a label-restricted ADC scoring pass
    * (pre-filter), both scored against the nested s08 exact truth. */
  private def s21Sql: String = {
    val nq = Similarity.NumQueries
    s"""${s15CtesFor("", "")},
       |lb AS (SELECT vec_id, label FROM embeddings),
       |ql AS (SELECT vec_id AS qid, label AS qlabel FROM embeddings
       |       WHERE vec_id < $nq),
       |cm AS (SELECT c.qid, c.vec_id, (lb.label = ql.qlabel) AS is_match
       |       FROM cand c JOIN lb ON lb.vec_id = c.vec_id
       |       JOIN ql ON ql.qid = c.qid),
       |scoredpre AS (SELECT c.qid, codes.vec_id AS neighbor_id,
       |           SUM(pdot) AS adc
       |         FROM cm c JOIN codes ON codes.vec_id = c.vec_id
       |         JOIN lut ON codes.m = lut.m AND codes.code = lut.c
       |           AND lut.qid = c.qid
       |         WHERE c.is_match GROUP BY c.qid, codes.vec_id),
       |finpre AS (SELECT qid, neighbor_id FROM (
       |    SELECT s.qid, s.neighbor_id, RANK() OVER (
       |        PARTITION BY s.qid ORDER BY
       |        CAST(s.adc AS DOUBLE) / (sqrt(CAST(qe.n2 AS DOUBLE))
       |          * sqrt(CAST(ne.n2 AS DOUBLE))) DESC) AS rnk
       |    FROM scoredpre s JOIN e qe ON s.qid = qe.vec_id
       |      JOIN e ne ON s.neighbor_id = ne.vec_id)
       |  WHERE rnk <= 3),
       |post AS (SELECT qid, neighbor_id FROM (
       |    SELECT r.qid, r.neighbor_id, ROW_NUMBER() OVER (
       |        PARTITION BY r.qid ORDER BY r.rank, r.neighbor_id) AS rr
       |    FROM r JOIN lb ON lb.vec_id = r.neighbor_id
       |      JOIN ql ON ql.qid = r.qid
       |    WHERE r.rank <= ${Similarity.RefineK} AND lb.label = ql.qlabel)
       |  WHERE rr <= 3),
       |truth AS (SELECT qid, neighbor_id FROM ($s08Sql)),
       |met AS (SELECT 'prefilter' AS method,
       |    CAST((SELECT count(*) FROM finpre) AS BIGINT) AS n_retrieved,
       |    CAST((SELECT count(*) FROM truth) AS BIGINT) AS n_truth,
       |    CAST((SELECT count(*) FROM finpre JOIN truth
       |      USING (qid, neighbor_id)) AS BIGINT) AS n_hits,
       |    CAST((SELECT count(*) FROM cm WHERE is_match) AS BIGINT)
       |      AS n_candidates
       |  UNION ALL
       |  SELECT 'postfilter',
       |    CAST((SELECT count(*) FROM post) AS BIGINT),
       |    CAST((SELECT count(*) FROM truth) AS BIGINT),
       |    CAST((SELECT count(*) FROM post JOIN truth
       |      USING (qid, neighbor_id)) AS BIGINT),
       |    CAST((SELECT count(*) FROM cm) AS BIGINT))
       |SELECT method, n_retrieved, n_truth, n_hits,
       |  CAST(n_hits AS DOUBLE) / n_truth AS recall_vs_exact,
       |  CAST(n_candidates AS DOUBLE) / $nq AS mean_candidates_per_query
       |FROM met ORDER BY method""".stripMargin
  }

  /** The s15 IVF-PQ pipeline through its ranked CTE `r` — shared by the
    * s15 top-3 and the s16 refine oracle. */
  private def s15Ctes: String = s15CtesFor("", "")

  /** [[s15Ctes]] with extra membership predicates on the quantizer
    * artifacts — `centsPred` narrows the coarse-centroid sample,
    * `cbPred` the PQ codebook source rows. The s17b ingest-recall
    * oracle uses them to freeze both artifacts to the EXISTING corpus
    * while the search data flow stays verbatim s15. `candPred` narrows
    * the CANDIDATE side instead (alias `a.`): the s18b post-delete
    * oracle uses it to drop tombstoned members from the inverted lists
    * while the artifacts stay the full pre-delete corpus's. */
  private def s15CtesFor(centsPred: String, cbPred: String,
      candPred: String = "",
      src: String = embCte,
      m: Int = Similarity.PqM, sd: Int = Similarity.PqSubDim,
      queryPred: String => String =
        a => s"${a}vec_id < ${Similarity.NumQueries}",
      stridePred: String = null): String =
    s"""WITH $src,
         |${pqCtes(m, sd, cbPred, queryPred)},
         |cents AS (SELECT vec_id AS cid, embedding AS cv, n2 AS cn2 FROM e
         |          WHERE vec_id % ${ivfStrideSql(
             Option(stridePred).getOrElse(centsPred))} = 0
         |            AND vec_id >= ${Similarity.NumQueries}$centsPred),
         |ac AS (SELECT a.vec_id, c.cid,
         |    list_sum(list_transform(list_zip(a.embedding, c.cv),
         |      z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE)))
         |      / (sqrt(CAST(a.n2 AS DOUBLE)) * sqrt(CAST(c.cn2 AS DOUBLE)))
         |      AS ccos
         |  FROM e a, cents c),
         |assign AS (SELECT vec_id, cid FROM (
         |    SELECT vec_id, cid, ROW_NUMBER() OVER (PARTITION BY vec_id
         |      ORDER BY ccos DESC, cid) AS rn FROM ac)
         |  WHERE rn = 1),
         |probes AS (SELECT vec_id AS qid, cid FROM (
         |    SELECT vec_id, cid, ROW_NUMBER() OVER (PARTITION BY vec_id
         |      ORDER BY ccos DESC, cid) AS rn
         |    FROM ac WHERE ${queryPred("")})
         |  WHERE rn <= ${Similarity.NProbe}),
         |cand AS (SELECT p.qid, a.vec_id FROM probes p
         |         JOIN assign a ON a.cid = p.cid AND a.vec_id <> p.qid$candPred),
         |scored AS (SELECT c.qid, codes.vec_id AS neighbor_id, SUM(pdot) AS adc
         |           FROM cand c JOIN codes ON codes.vec_id = c.vec_id
         |           JOIN lut ON codes.m = lut.m AND codes.code = lut.c
         |             AND lut.qid = c.qid
         |           GROUP BY c.qid, codes.vec_id),
         |fin AS (SELECT qid, neighbor_id,
         |          CAST(adc AS DOUBLE) / (sqrt(CAST(qe.n2 AS DOUBLE))
         |            * sqrt(CAST(ne.n2 AS DOUBLE))) AS pq_score
         |        FROM scored JOIN e qe ON qid = qe.vec_id
         |          JOIN e ne ON neighbor_id = ne.vec_id),
         |r AS (SELECT qid, neighbor_id, pq_score,
         |        CAST(RANK() OVER (PARTITION BY qid
         |          ORDER BY pq_score DESC) AS INT) AS rank
         |      FROM fin)""".stripMargin


  /** The PQ oracle at an arbitrary (M, subDim) grid — s07 uses the
    * production config; the s14 sweep embeds one body per M. */
  /** PQ CTE chain (ms…codes…lut) over the `e` CTE — shared by the s07
    * all-candidates oracle and the s15 IVF-pruned composition. */
  private def pqCtes(m: Int, sd: Int, cbPred: String = "",
      queryPred: String => String =
        a => s"${a}vec_id < ${Similarity.NumQueries}"): String = {
    def d(x: String) = s"CAST(CAST($x AS DOUBLE) AS DECIMAL(12,6))"
    val nq = Similarity.NumQueries
    val k = Similarity.PqK
    s"""ms AS (SELECT unnest(generate_series(0, ${m - 1})) AS m),
       |cb AS (SELECT ms.m AS m, CAST(vec_id - $nq AS INT) AS c,
       |         list_slice(embedding, ms.m*$sd+1, ms.m*$sd+$sd) AS csub
       |       FROM e, ms WHERE vec_id >= $nq AND vec_id < ${nq + k}$cbPred),
       |cbn AS (SELECT m, c, csub,
       |         list_sum(list_transform(csub, x -> ${d("x")} * ${d("x")}))
       |           AS cn2 FROM cb),
       |sub AS (SELECT vec_id, ms.m AS m,
       |          list_slice(embedding, ms.m*$sd+1, ms.m*$sd+$sd) AS xsub
       |        FROM e, ms),
       |keys AS (SELECT vec_id, s.m, c,
       |           cn2 - 2*list_sum(list_transform(list_zip(xsub, csub),
       |             z -> ${d("z[1]")} * ${d("z[2]")})) AS kk
       |         FROM sub s JOIN cbn ON s.m = cbn.m),
       |codes AS (SELECT vec_id, m, c AS code FROM (
       |            SELECT vec_id, m, c, ROW_NUMBER() OVER (
       |              PARTITION BY vec_id, m ORDER BY kk, c) AS rn FROM keys)
       |          WHERE rn = 1),
       |lut AS (SELECT q.vec_id AS qid, cbn.m, cbn.c,
       |          list_sum(list_transform(list_zip(
       |            list_slice(q.embedding, cbn.m*$sd+1, cbn.m*$sd+$sd), csub),
       |            z -> ${d("z[1]")} * ${d("z[2]")})) AS pdot
       |        FROM e q, cbn WHERE ${queryPred("q.")})""".stripMargin
  }

  private def s07SqlFor(m: Int, sd: Int): String =
    s"""WITH $embCte,
       |${pqCtes(m, sd)},
       |scored AS (SELECT qid, codes.vec_id AS neighbor_id, SUM(pdot) AS adc
       |           FROM codes JOIN lut ON codes.m = lut.m
       |             AND codes.code = lut.c AND codes.vec_id <> lut.qid
       |           GROUP BY qid, codes.vec_id),
       |fin AS (SELECT qid, neighbor_id,
       |          CAST(adc AS DOUBLE) / (sqrt(CAST(qe.n2 AS DOUBLE))
       |            * sqrt(CAST(ne.n2 AS DOUBLE))) AS pq_score
       |        FROM scored JOIN e qe ON qid = qe.vec_id
       |          JOIN e ne ON neighbor_id = ne.vec_id),
       |r AS (SELECT qid, neighbor_id, pq_score,
       |        CAST(ROW_NUMBER() OVER (PARTITION BY qid
       |          ORDER BY pq_score DESC, neighbor_id) AS INT) AS rank
       |      FROM fin)
       |SELECT qid, rank, neighbor_id, pq_score FROM r
       |WHERE rank <= 3 ORDER BY qid, rank""".stripMargin

  private def s01Sql: String =
    s"""WITH $embCte,
       |scored AS (
       |  SELECT a.vec_id AS qid, b.vec_id AS neighbor_id,
       |    CAST($dotAB AS DOUBLE)
       |      / (sqrt(CAST(a.n2 AS DOUBLE)) * sqrt(CAST(b.n2 AS DOUBLE))) AS cos_sim
       |  FROM e a JOIN e b ON b.vec_id <> a.vec_id
       |  WHERE a.vec_id < ${Similarity.NumQueries}),
       |r AS (SELECT qid, neighbor_id, cos_sim,
       |        CAST(ROW_NUMBER() OVER (PARTITION BY qid
       |          ORDER BY cos_sim DESC, neighbor_id) AS INT) AS rank
       |      FROM scored)
       |SELECT qid, rank, neighbor_id, cos_sim FROM r
       |WHERE rank <= ${Similarity.TopK} ORDER BY qid, rank""".stripMargin

  // same md5-derived hyperplanes as Similarity.planeWeights, inlined as
  // literal weight vectors; the sign of a sequential double fold is
  // engine-exact on both sides. Shared by s02 and the s10 balance audit.
  private def lshBitExprs: String =
    Similarity.planeWeights.map { ws =>
      val l = ws.mkString("[", ", ", "]")
      s"(CASE WHEN list_sum(list_transform(list_zip(embedding, $l::FLOAT[]), " +
        "z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE))) >= 0 " +
        "THEN '1' ELSE '0' END)"
    }.mkString(" || ")

  private def s02Sql: String = {
    val bitExprs = lshBitExprs
    s"""WITH $embCte,
       |bk AS (SELECT vec_id, $bitExprs AS bucket FROM e),
       |ee AS (SELECT e.*, bk.bucket FROM e JOIN bk USING (vec_id)),
       |scored AS (
       |  SELECT a.vec_id AS qid, b.vec_id AS neighbor_id,
       |    CAST($dotAB AS DOUBLE)
       |      / (sqrt(CAST(a.n2 AS DOUBLE)) * sqrt(CAST(b.n2 AS DOUBLE))) AS cos_sim
       |  FROM ee a JOIN ee b ON a.bucket = b.bucket AND b.vec_id <> a.vec_id
       |  WHERE a.vec_id < ${Similarity.NumQueries}),
       |r AS (SELECT qid, neighbor_id, cos_sim,
       |        CAST(ROW_NUMBER() OVER (PARTITION BY qid
       |          ORDER BY cos_sim DESC, neighbor_id) AS INT) AS rank
       |      FROM scored)
       |SELECT qid, rank, neighbor_id, cos_sim FROM r
       |WHERE rank <= 3 ORDER BY qid, rank""".stripMargin
  }

  private def s03Sql: String =
    s"""WITH $embCte,
       |cents AS (SELECT vec_id AS cid, embedding AS cv, n2 AS cn2 FROM e
       |          WHERE vec_id % ${ivfStrideSql()} = 0
       |            AND vec_id >= ${Similarity.NumQueries}),
       |ac AS (SELECT a.vec_id, c.cid,
       |    list_sum(list_transform(list_zip(a.embedding, c.cv),
       |      z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE)))
       |      / (sqrt(CAST(a.n2 AS DOUBLE)) * sqrt(CAST(c.cn2 AS DOUBLE))) AS ccos
       |  FROM e a, cents c),
       |assign AS (SELECT vec_id, cid FROM (
       |    SELECT vec_id, cid, ROW_NUMBER() OVER (PARTITION BY vec_id
       |      ORDER BY ccos DESC, cid) AS rn FROM ac)
       |  WHERE rn = 1),
       |probes AS (SELECT vec_id AS qid, cid FROM (
       |    SELECT vec_id, cid, ROW_NUMBER() OVER (PARTITION BY vec_id
       |      ORDER BY ccos DESC, cid) AS rn
       |    FROM ac WHERE vec_id < ${Similarity.NumQueries})
       |  WHERE rn <= ${Similarity.NProbe}),
       |scored AS (
       |  SELECT p.qid, s.vec_id AS neighbor_id,
       |    CAST($dotAB AS DOUBLE)
       |      / (sqrt(CAST(a.n2 AS DOUBLE)) * sqrt(CAST(b.n2 AS DOUBLE))) AS cos_sim
       |  FROM probes p
       |  JOIN assign s ON s.cid = p.cid AND s.vec_id <> p.qid
       |  JOIN e a ON a.vec_id = p.qid
       |  JOIN e b ON b.vec_id = s.vec_id),
       |r AS (SELECT qid, neighbor_id, cos_sim,
       |        CAST(ROW_NUMBER() OVER (PARTITION BY qid
       |          ORDER BY cos_sim DESC, neighbor_id) AS INT) AS rank
       |      FROM scored)
       |SELECT qid, rank, neighbor_id, cos_sim FROM r
       |WHERE rank <= 3 ORDER BY qid, rank""".stripMargin

  // DuckDB oracle equivalents. Notes:
  //  - DuckDB reads events.ts as TIMESTAMP_NS; epoch_us(CAST(ts AS
  //    TIMESTAMP)) truncates to micros exactly like our `ts DIV 1000`.
  //  - DuckDB CAST(double AS BIGINT) rounds while Spark truncates, hence
  //    trunc() in q05.
  //  - window/date/length functions return BIGINT in DuckDB but INT in
  //    Spark → explicit INTEGER casts keep schemas aligned.
  def oracleSql: Map[String, String] = ListMap(
    "q01_filter_project" ->
      "SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderstatus = 'F' ORDER BY o_orderkey",
    "q02_mask_sha256" ->
      "SELECT c_custkey, sha256(c_name) AS masked FROM customer ORDER BY c_custkey",
    "q03_latest_state" ->
      """WITH ranked AS (
        |  SELECT user_id, event_id, event_type, value,
        |         epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
        |         ROW_NUMBER() OVER (PARTITION BY user_id
        |           ORDER BY epoch_us(CAST(ts AS TIMESTAMP)) DESC, event_id DESC) AS rn
        |  FROM events)
        |SELECT user_id, event_id AS last_event_id, event_type AS last_event_type,
        |       value AS last_value, ts_us AS last_ts_us
        |FROM ranked WHERE rn = 1 AND event_type <> 'error' ORDER BY user_id""".stripMargin,
    // q69: SCD2 — the closing LEAD runs over ALL events (deletes close
    // the open version), delete markers open no row of their own
    "q69_scd2_history" ->
      """WITH e AS (SELECT event_id, user_id, event_type, value,
        |             epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events),
        |v AS (SELECT *, LEAD(ts_us) OVER (PARTITION BY user_id
        |        ORDER BY ts_us, event_id) AS valid_to_us FROM e)
        |SELECT user_id, event_id AS version_event_id,
        |  event_type AS state_type, value AS state_value,
        |  ts_us AS valid_from_us, valid_to_us,
        |  valid_to_us IS NULL AS is_current
        |FROM v WHERE event_type <> 'error'
        |ORDER BY user_id, valid_from_us, version_event_id""".stripMargin,
    // q70: fact x SCD2 dimension AS OF fact.ts — the unique covering
    // interval (valid_from < ts <= valid_to), null prior when deleted
    // or first-event
    "q70_pit_join" ->
      """WITH e AS (SELECT event_id, user_id, event_type, value,
        |             epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events),
        |v AS (SELECT *, LEAD(ts_us) OVER (PARTITION BY user_id
        |        ORDER BY ts_us, event_id) AS valid_to_us FROM e),
        |hist AS (SELECT * FROM v WHERE event_type <> 'error'),
        |p AS (SELECT event_id AS purchase_event_id, user_id,
        |        ts_us AS purchase_ts_us FROM e
        |      WHERE event_type = 'purchase')
        |SELECT p.purchase_event_id, p.user_id, p.purchase_ts_us,
        |  h.event_id AS prior_event_id, h.event_type AS prior_state_type,
        |  h.value AS prior_state_value
        |FROM p LEFT JOIN hist h ON h.user_id = p.user_id
        |  AND h.ts_us < p.purchase_ts_us
        |  AND p.purchase_ts_us
        |    <= COALESCE(h.valid_to_us, 9223372036854775807)
        |ORDER BY p.purchase_event_id""".stripMargin,
    "q04_delete_propagation" ->
      """WITH ranked AS (
        |  SELECT user_id, event_id, event_type,
        |         ROW_NUMBER() OVER (PARTITION BY user_id
        |           ORDER BY epoch_us(CAST(ts AS TIMESTAMP)) DESC, event_id DESC) AS rn
        |  FROM events),
        |latest AS (SELECT user_id, event_id AS last_event_id,
        |                  event_type AS last_event_type FROM ranked WHERE rn = 1)
        |SELECT user_id, last_event_id, last_event_type FROM latest
        |WHERE NOT EXISTS (SELECT 1 FROM events e
        |                  WHERE e.user_id = latest.user_id
        |                    AND e.event_type = 'error' AND e.event_id % 100 < 15)
        |ORDER BY user_id""".stripMargin,
    "q05_type_cast" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST(trunc(l_quantity) AS BIGINT) AS qty_big,
        |  CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS DOUBLE) AS price_dec,
        |  CAST(l_shipdate AS DATE) AS ship_date
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q06_max_progress" ->
      """SELECT user_id, MAX(epoch_us(CAST(ts AS TIMESTAMP))) AS max_ts_us,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q07_join_inner" ->
      """SELECT o_orderkey, c_custkey, c_name, o_totalprice
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_orderkey""".stripMargin,
    "q08_join_left" ->
      """SELECT c_custkey, COUNT(o_orderkey) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spent
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,
    "q08b_join_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey
        |                    AND o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,
    "q09_join_multiway" ->
      """SELECT n_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |       (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_lines
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q10_join_broadcast" ->
      """SELECT r_name, n_name, COUNT(*) AS n_lines,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,
    "q11_agg_tpch_q1" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |       (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |       (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) *
        |       (CAST(1 AS DECIMAL(18,2)) + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
        |  COUNT(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q12_count_distinct" ->
      "SELECT COUNT(DISTINCT o_custkey) AS n_cust, COUNT(*) AS n_orders FROM orders",
    "q13_rollup" ->
      """SELECT n_name, o_orderpriority,
        |  CAST(GROUPING(n_name) AS INTEGER) AS g_nation,
        |  CAST(GROUPING(o_orderpriority) AS INTEGER) AS g_prio,
        |  COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY ROLLUP(n_name, o_orderpriority)
        |ORDER BY n_name NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,
    // GATE queries (VERDICT r04 ask #7): sketch/crypto/trained outputs are
    // engine-specific, so these expose oracle-recomputable components plus
    // tolerance/structure assertions the engine computes from the LIVE
    // operator output and the oracle pins true; value-level goldens stay
    // in the ScalaTest gates.
    "q12b_approx_distinct" ->
      """SELECT count(*) AS n_orders,
        |  count(DISTINCT o_custkey) AS n_cust_exact,
        |  TRUE AS approx_within_5pct
        |FROM orders""".stripMargin,
    "q22_mask_hmac" ->
      """SELECT count(*) AS n_rows, count(*) AS n_wellformed,
        |  count(DISTINCT c_name) AS n_distinct_tokens,
        |  '3109106bc9ab38f5a7fb536e182ee6ba942f7fa98cd5fac7a61044bdd33c17b8'
        |    AS probe_hmac
        |FROM customer""".stripMargin,
    "q27b_percentiles_approx" ->
      """SELECT l_returnflag, count(*) AS n,
        |  TRUE AS p50_within_2pct, TRUE AS p95_within_2pct,
        |  TRUE AS p99_within_2pct
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "s04_sim_ann_ivf_trained" ->
      """SELECT count(*) AS n_queries, 3 * count(*) AS n_results,
        |  TRUE AS three_per_query, TRUE AS no_self_matches
        |FROM embeddings WHERE vec_id < 10""".stripMargin,
    "q14_having_subquery" ->
      """WITH t AS (SELECT c_nationkey, SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS tb
        |           FROM customer GROUP BY c_nationkey)
        |SELECT c_nationkey, CAST(tb AS DOUBLE) AS total_bal FROM t
        |WHERE CAST(tb AS DOUBLE) > (SELECT CAST(SUM(tb) AS DOUBLE) / COUNT(*) FROM t)
        |ORDER BY c_nationkey""".stripMargin,
    "q15_window_rank" ->
      """SELECT c_nationkey, rn, c_custkey, c_acctbal FROM (
        |  SELECT c_nationkey, c_custkey, c_acctbal,
        |         CAST(ROW_NUMBER() OVER (PARTITION BY c_nationkey
        |           ORDER BY c_acctbal DESC, c_custkey) AS INTEGER) AS rn
        |  FROM customer) x
        |WHERE rn <= 3 ORDER BY c_nationkey, rn""".stripMargin,
    "q16_window_analytic" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(LAG(CAST(o_totalprice AS DECIMAL(18,2)), 1) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS DOUBLE) AS prev_price,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) AS DOUBLE) AS moving_sum_10
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q17_time_bucket" ->
      """SELECT (epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000) * 3600000000 AS bucket_us,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q18_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,
    "q18b_shipping_priority" ->
      """SELECT l_orderkey,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |    (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |  o_orderdate, o_orderpriority
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1995-03-15'
        |  AND l_shipdate > TIMESTAMP '1995-03-15'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "q19_setops" ->
      """SELECT tag, c_custkey FROM (
        |  SELECT 'both' AS tag, c_custkey FROM (
        |    SELECT c_custkey FROM customer WHERE c_acctbal > 5000
        |    INTERSECT
        |    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
        |  UNION ALL
        |  SELECT 'only_a' AS tag, c_custkey FROM (
        |    SELECT c_custkey FROM customer WHERE c_acctbal > 5000
        |    EXCEPT
        |    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
        |) ORDER BY tag, c_custkey""".stripMargin,
    "q19b_setops_all" ->
      """WITH jan AS (SELECT o_orderpriority FROM orders
        |             WHERE month(o_orderdate) = 1),
        |feb AS (SELECT o_orderpriority FROM orders
        |        WHERE month(o_orderdate) = 2),
        |c AS (SELECT 'common' AS tag, o_orderpriority FROM
        |        (SELECT * FROM jan INTERSECT ALL SELECT * FROM feb)
        |      UNION ALL
        |      SELECT 'jan_extra' AS tag, o_orderpriority FROM
        |        (SELECT * FROM jan EXCEPT ALL SELECT * FROM feb))
        |SELECT tag, o_orderpriority, count(*) AS n
        |FROM c GROUP BY tag, o_orderpriority
        |ORDER BY tag, o_orderpriority""".stripMargin,
    "q20_scalar" ->
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS INTEGER) AS yr,
        |  CAST(month(o_orderdate) AS INTEGER) AS mo,
        |  substr(o_orderpriority, 1, 1) AS pri1,
        |  lower(substr(o_orderpriority, 3, 20)) AS pri_word,
        |  concat_ws('-', o_orderstatus, o_orderpriority) AS tag,
        |  CAST(length(o_orderpriority) AS INTEGER) AS pri_len,
        |  o_orderkey % 97 AS mod97
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q21_array_json" ->
      """WITH agg AS (
        |  SELECT c_nationkey, COUNT(*) AS n_cust,
        |         to_json(list(c_custkey ORDER BY c_custkey)) AS cust_keys
        |  FROM customer GROUP BY c_nationkey)
        |SELECT c_nationkey, n_cust, cust_keys,
        |  to_json(struct_pack(n_nationkey := n_nationkey, n_cust := n_cust)) AS j,
        |  n_name AS map_val
        |FROM agg JOIN nation ON c_nationkey = n_nationkey
        |ORDER BY c_nationkey""".stripMargin,

    // ---- extended relational surface oracles ------------------------------
    "q23_cube" ->
      """SELECT n_name, o_orderstatus,
        |  CAST(GROUPING(n_name) AS INTEGER) AS g_nation,
        |  CAST(GROUPING(o_orderstatus) AS INTEGER) AS g_status,
        |  COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY CUBE(n_name, o_orderstatus)
        |ORDER BY n_name NULLS FIRST, o_orderstatus NULLS FIRST""".stripMargin,
    "q24_pivot" -> {
      val cols = ExtendedQueries.Priorities
        .map(p => s"""count(*) FILTER (WHERE o_orderpriority = '$p') AS "$p"""")
        .mkString(",\n  ")
      s"""SELECT n_name,
         |  $cols
         |FROM orders
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |GROUP BY n_name ORDER BY n_name""".stripMargin
    },
    "q39_unpivot" -> {
      val plist = ExtendedQueries.Priorities.map(p => s"'$p'").mkString(", ")
      s"""WITH j AS (SELECT n_name, o_orderpriority FROM orders
         |  JOIN customer ON o_custkey = c_custkey
         |  JOIN nation ON c_nationkey = n_nationkey),
         |grid AS (SELECT n_name, p AS o_orderpriority
         |  FROM (SELECT DISTINCT n_name FROM j),
         |       (SELECT unnest([$plist]) AS p)),
         |c AS (SELECT n_name, o_orderpriority, count(*) AS n
         |      FROM j GROUP BY n_name, o_orderpriority)
         |SELECT g.n_name, g.o_orderpriority, COALESCE(c.n, 0) AS n
         |FROM grid g LEFT JOIN c
         |  ON g.n_name = c.n_name AND g.o_orderpriority = c.o_orderpriority
         |ORDER BY g.n_name, g.o_orderpriority""".stripMargin
    },
    "q25_window_family" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(DENSE_RANK() OVER w AS INT) AS drank,
        |  CAST(NTILE(4) OVER w AS INT) AS quartile,
        |  CAST(LEAD(CAST(o_totalprice AS DECIMAL(18,2)), 1) OVER w AS DOUBLE) AS next_price,
        |  CAST(FIRST_VALUE(CAST(o_totalprice AS DECIMAL(18,2))) OVER wf AS DOUBLE) AS first_price,
        |  CAST(LAST_VALUE(CAST(o_totalprice AS DECIMAL(18,2))) OVER wf AS DOUBLE) AS last_price
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
        |  wf AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q26_exists_subquery" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_totalprice > 400000)
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
        |ORDER BY c_custkey""".stripMargin,
    "q27_percentiles" ->
      """SELECT l_returnflag,
        |  quantile_cont(l_extendedprice, 0.5) AS p50,
        |  quantile_cont(l_extendedprice, 0.95) AS p95,
        |  quantile_cont(l_extendedprice, 0.99) AS p99,
        |  COUNT(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q28_string_agg" ->
      """SELECT c_nationkey,
        |  string_agg(c_name, ',' ORDER BY c_name) AS names,
        |  COUNT(*) AS n
        |FROM customer WHERE c_custkey % 100 = 0
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,
    "q29_conditional_agg" ->
      """SELECT CAST(year(o_orderdate) AS INT) AS yr,
        |  count(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
        |  count(*) FILTER (WHERE o_orderstatus = 'O') AS n_open,
        |  CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT'
        |        THEN CAST(o_totalprice AS DECIMAL(18,2))
        |        ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS urgent_total,
        |  CAST(SUM(CASE WHEN o_orderstatus = 'F'
        |        THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE)
        |    / count(*) FILTER (WHERE o_orderstatus = 'F') AS avg_finished_price
        |FROM orders GROUP BY year(o_orderdate) ORDER BY yr""".stripMargin,
    "q30_date_arith" ->
      """SELECT o_orderkey,
        |  CAST(o_orderdate AS DATE) AS od,
        |  CAST(o_orderdate AS DATE) + 30 AS due_date,
        |  CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INT)
        |    AS days_since_epoch95,
        |  CAST(date_trunc('month', CAST(o_orderdate AS DATE)) AS DATE) AS month_start,
        |  last_day(CAST(o_orderdate AS DATE)) AS month_end,
        |  CAST(quarter(o_orderdate) AS INT) AS qtr
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q31_asof_join" ->
      """WITH ev AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
        |                   event_id, event_type FROM events),
        |u AS (
        |  SELECT user_id, ts_us, event_id, 0 AS side,
        |         event_id AS view_event_id, ts_us AS view_ts_us
        |  FROM ev WHERE event_type = 'view'
        |  UNION ALL
        |  SELECT user_id, ts_us, event_id, 1 AS side, NULL, NULL
        |  FROM ev WHERE event_type = 'purchase'),
        |m AS (SELECT user_id, ts_us, event_id, side,
        |        last_value(view_event_id IGNORE NULLS) OVER w AS asof_view_id,
        |        last_value(view_ts_us IGNORE NULLS) OVER w AS asof_view_ts
        |      FROM u
        |      WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, side, event_id
        |                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT user_id, event_id AS purchase_id, ts_us AS purchase_ts_us,
        |       asof_view_id, asof_view_ts
        |FROM m WHERE side = 1 ORDER BY user_id, purchase_id""".stripMargin,
    "q32_grouping_sets" ->
      """SELECT n_name, o_orderpriority,
        |  CAST(GROUPING(n_name) AS INT) AS g_nation,
        |  CAST(GROUPING(o_orderpriority) AS INT) AS g_prio,
        |  COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY GROUPING SETS ((n_name), (o_orderpriority), ())
        |ORDER BY n_name NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,
    "q33_range_join" ->
      """WITH bands(band, lo, hi) AS (VALUES
        |  ('b1_under_20k', 0.0, 20000.0),
        |  ('b2_20k_40k', 20000.0, 40000.0),
        |  ('b3_40k_60k', 40000.0, 60000.0),
        |  ('b4_60k_80k', 60000.0, 80000.0),
        |  ('b5_80k_plus', 80000.0, 1e18))
        |SELECT band, COUNT(*) AS n_items,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        |FROM lineitem JOIN bands
        |  ON l_extendedprice >= lo AND l_extendedprice < hi
        |GROUP BY band ORDER BY band""".stripMargin,
    "q34_sessionize" ->
      """WITH ev AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
        |                   event_id FROM events),
        |flagged AS (SELECT user_id, ts_us, event_id,
        |  CASE WHEN lag(ts_us) OVER w IS NULL THEN 1
        |       WHEN ts_us - lag(ts_us) OVER w > 1800000000 THEN 1
        |       ELSE 0 END AS new_session
        |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
        |sessions AS (SELECT user_id, ts_us,
        |  CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS INT)
        |    AS session_seq
        |  FROM flagged)
        |SELECT user_id, session_seq, COUNT(*) AS n_events,
        |  MIN(ts_us) AS session_start_us, MAX(ts_us) AS session_end_us,
        |  MAX(ts_us) - MIN(ts_us) AS duration_us
        |FROM sessions GROUP BY user_id, session_seq
        |ORDER BY user_id, session_seq""".stripMargin,
    "q35_json_extract" ->
      """WITH k AS (SELECT event_type, CAST(props->>'k' AS INT) AS k FROM events)
        |SELECT event_type, COUNT(*) AS n, CAST(SUM(k) AS BIGINT) AS sum_k,
        |  MIN(k) AS min_k, MAX(k) AS max_k
        |FROM k GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q36_correlated_subquery" ->
      """SELECT o_orderkey, o_custkey,
        |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price
        |FROM orders o
        |WHERE CAST(o_totalprice AS DECIMAL(18,2)) *
        |    (SELECT count(*) FROM orders i WHERE i.o_custkey = o.o_custkey)
        |  > (SELECT sum(CAST(o_totalprice AS DECIMAL(18,2)))
        |     FROM orders i WHERE i.o_custkey = o.o_custkey)
        |ORDER BY o_orderkey""".stripMargin,
    "q37_range_frame" ->
      """SELECT o_orderkey, o_custkey, o_orderdate,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate
        |    RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW)
        |    AS DOUBLE) AS spend_30d
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q38_window_distinct" ->
      """WITH f AS (SELECT o_orderkey, o_custkey, o_orderdate,
        |    CASE WHEN ROW_NUMBER() OVER (
        |        PARTITION BY o_custkey, o_orderpriority
        |        ORDER BY o_orderdate, o_orderkey) = 1
        |      THEN 1 ELSE 0 END AS is_first
        |  FROM orders)
        |SELECT o_orderkey, o_custkey,
        |  CAST(SUM(is_first) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS distinct_priorities_so_far
        |FROM f ORDER BY o_orderkey""".stripMargin,
    "q40_join_full_outer" ->
      """WITH c AS (SELECT c_custkey, c_name FROM customer
        |           WHERE c_mktsegment = 'BUILDING'),
        |o AS (SELECT o_custkey, COUNT(*) AS n_f_orders,
        |        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |          AS f_total
        |      FROM orders WHERE o_orderstatus = 'F' GROUP BY o_custkey)
        |SELECT COALESCE(c_custkey, o_custkey) AS custkey,
        |  c_custkey IS NOT NULL AS in_building,
        |  COALESCE(n_f_orders, 0) AS n_f_orders,
        |  COALESCE(f_total, 0.0) AS f_total
        |FROM c FULL OUTER JOIN o ON c_custkey = o_custkey
        |ORDER BY custkey""".stripMargin,
    // q41: distinct user-weeks -> min-week cohorts -> (cohort, offset)
    // cells; retention is one boundary division of exact counts
    "q41_cohort_retention" ->
      """WITH ev AS (SELECT user_id,
        |    epoch_us(CAST(ts AS TIMESTAMP)) // 604800000000 AS week
        |  FROM events),
        |wk AS (SELECT DISTINCT user_id, week FROM ev),
        |ch AS (SELECT user_id, min(week) AS cohort_week FROM wk
        |       GROUP BY user_id),
        |cs AS (SELECT cohort_week, count(*) AS n_cohort FROM ch
        |       GROUP BY cohort_week),
        |act AS (SELECT cohort_week, week - cohort_week AS week_offset
        |        FROM wk JOIN ch USING (user_id))
        |SELECT a.cohort_week, a.week_offset, count(*) AS n_users,
        |  cs.n_cohort,
        |  CAST(count(*) AS DOUBLE) / cs.n_cohort AS retention
        |FROM act a JOIN cs USING (cohort_week)
        |GROUP BY a.cohort_week, a.week_offset, cs.n_cohort
        |ORDER BY cohort_week, week_offset""".stripMargin,
    // q42: chained strictly-later min-aggregations; conversion via lag
    "q42_event_funnel" ->
      """WITH ev AS (SELECT user_id, event_type,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events),
        |s1 AS (SELECT user_id, min(ts_us) AS t FROM ev
        |       WHERE event_type = 'signup' GROUP BY user_id),
        |s2 AS (SELECT e.user_id, min(e.ts_us) AS t FROM ev e
        |       JOIN s1 ON e.user_id = s1.user_id AND e.ts_us > s1.t
        |       WHERE e.event_type = 'view' GROUP BY e.user_id),
        |s3 AS (SELECT e.user_id, min(e.ts_us) AS t FROM ev e
        |       JOIN s2 ON e.user_id = s2.user_id AND e.ts_us > s2.t
        |       WHERE e.event_type = 'click' GROUP BY e.user_id),
        |s4 AS (SELECT e.user_id, min(e.ts_us) AS t FROM ev e
        |       JOIN s3 ON e.user_id = s3.user_id AND e.ts_us > s3.t
        |       WHERE e.event_type = 'purchase' GROUP BY e.user_id),
        |n AS (
        |  SELECT '1_signup' AS step, count(*) AS n_users FROM s1
        |  UNION ALL SELECT '2_view', count(*) FROM s2
        |  UNION ALL SELECT '3_click', count(*) FROM s3
        |  UNION ALL SELECT '4_purchase', count(*) FROM s4)
        |SELECT step, n_users,
        |  COALESCE(CAST(n_users AS DOUBLE)
        |    / lag(n_users) OVER (ORDER BY step), 1.0) AS conv_from_prev
        |FROM n ORDER BY step""".stripMargin,
    // q43: distinct baskets, size cap, one self-join on the order key
    "q43_copurchase_pairs" ->
      s"""WITH it AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        |           FROM lineitem),
        |cap AS (SELECT ok, pk FROM (
        |    SELECT ok, pk, count(*) OVER (PARTITION BY ok) AS n_items
        |    FROM it) WHERE n_items <= ${ExtendedQueries.MaxBasketSize})
        |SELECT a.pk AS part_a, b.pk AS part_b, count(*) AS n_orders
        |FROM cap a JOIN cap b ON a.ok = b.ok AND a.pk < b.pk
        |GROUP BY a.pk, b.pk
        |ORDER BY n_orders DESC, part_a, part_b LIMIT 20""".stripMargin,
    // q45: TPC-H Q17 shape; the 20%-of-average filter cross-multiplied so
    // it stays exact decimal (5·qty·cnt < sum_qty)
    "q45_smallqty_revenue" ->
      """WITH pp AS (SELECT l_partkey,
        |    SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty,
        |    COUNT(*) AS cnt
        |  FROM lineitem GROUP BY l_partkey)
        |SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |    / 7.0 AS avg_yearly
        |FROM lineitem l
        |JOIN part p ON p.p_partkey = l.l_partkey AND p.p_brand = 'Brand#4'
        |JOIN pp ON pp.l_partkey = l.l_partkey
        |WHERE CAST(l.l_quantity AS DECIMAL(18,2)) * cnt * 5 < sum_qty""".stripMargin,
    // q46: TPC-H Q21 shape — the oracle runs the LITERAL double-correlated
    // EXISTS / NOT EXISTS; the engine's one-pass (n_supp, n_late_supp)
    // aggregate must agree exactly
    "q46_waiting_suppliers" ->
      s"""WITH lo AS (
         |  SELECT l.l_orderkey AS ok, l.l_suppkey AS sk,
         |    (l.l_shipdate > CAST(o.o_orderdate AS DATE)
         |       + INTERVAL ${ExtendedQueries.LateShipDays} DAY) AS late
         |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
         |  WHERE o.o_orderstatus = 'F')
         |SELECT s.s_name, count(*) AS numwait
         |FROM lo l1
         |JOIN supplier s ON l1.sk = s.s_suppkey
         |JOIN nation n ON s.s_nationkey = n.n_nationkey
         |WHERE l1.late AND n.n_name = 'NATION_7'
         |  AND EXISTS (SELECT 1 FROM lo l2
         |              WHERE l2.ok = l1.ok AND l2.sk <> l1.sk)
         |  AND NOT EXISTS (SELECT 1 FROM lo l3
         |                  WHERE l3.ok = l1.ok AND l3.sk <> l1.sk AND l3.late)
         |GROUP BY s.s_name
         |ORDER BY numwait DESC, s.s_name LIMIT 20""".stripMargin,
    // q47: TPC-H Q22 shape — scalar positive-balance average (cross-
    // multiplied, exact DECIMAL) + anti join against recent orders
    "q47_dormant_highbal" ->
      s"""WITH a AS (SELECT SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS pos_sum,
         |             COUNT(*) AS pos_n
         |           FROM customer WHERE c_acctbal > 0)
         |SELECT n.n_name, count(*) AS numcust,
         |  CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
         |FROM customer c
         |CROSS JOIN a
         |JOIN nation n ON c.c_nationkey = n.n_nationkey
         |WHERE CAST(c.c_acctbal AS DECIMAL(18,2)) * a.pos_n > a.pos_sum
         |  AND NOT EXISTS (SELECT 1 FROM orders o
         |                  WHERE o.o_custkey = c.c_custkey
         |                    AND o.o_orderdate >=
         |                      TIMESTAMP '${ExtendedQueries.DormantCutoff}')
         |GROUP BY n.n_name ORDER BY n.n_name""".stripMargin,
    // q48: TPC-H Q18 shape — the oracle keeps the literal IN-subquery form
    "q48_large_volume_cust" ->
      s"""WITH sq AS (SELECT l_orderkey,
         |    SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty
         |  FROM lineitem GROUP BY l_orderkey)
         |SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
         |  CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS o_totalprice,
         |  CAST(sq.sum_qty AS DOUBLE) AS sum_qty
         |FROM orders o
         |JOIN sq ON sq.l_orderkey = o.o_orderkey
         |JOIN customer c ON c.c_custkey = o.o_custkey
         |WHERE o.o_orderkey IN (SELECT l_orderkey FROM sq
         |                       WHERE sum_qty > ${ExtendedQueries.LargeVolumeQty})
         |ORDER BY o_totalprice DESC, o.o_orderkey LIMIT 20""".stripMargin,
    // q49: TPC-H Q19 shape — exact OR-of-ANDs across both join sides
    "q49_disjunctive_revenue" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_lines,
        |  CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
        |         * (CAST(1 AS DECIMAL(18,2))
        |            - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE)
        |    AS revenue
        |FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        |WHERE (p.p_brand = 'Brand#1' AND l.l_quantity BETWEEN 1 AND 11
        |        AND p.p_size BETWEEN 1 AND 5)
        |   OR (p.p_brand = 'Brand#2' AND l.l_quantity BETWEEN 10 AND 20
        |        AND p.p_size BETWEEN 1 AND 10)
        |   OR (p.p_brand = 'Brand#3' AND l.l_quantity BETWEEN 20 AND 30
        |        AND p.p_size BETWEEN 1 AND 15)""".stripMargin,
    // q50: TPC-H Q13 shape — filter inside the LEFT join's ON clause so
    // zero-order customers land in the k = 0 bucket
    "q50_custdist" ->
      """WITH k AS (SELECT c.c_custkey, count(o.o_orderkey) AS c_count
        |  FROM customer c LEFT JOIN orders o
        |    ON o.o_custkey = c.c_custkey AND o.o_orderpriority <> '1-URGENT'
        |  GROUP BY c.c_custkey)
        |SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
        |FROM k GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,
    // q55: TPC-H Q2 shape — the oracle keeps the LITERAL correlated
    // scalar min subquery; the engine's decorrelated min-join must agree
    "q55_mincost_supplier" ->
      s"""WITH asia AS (
         |  SELECT l.l_partkey, l.l_extendedprice, s.s_suppkey, s.s_name,
         |    s.s_acctbal, n.n_name
         |  FROM lineitem l
         |  JOIN supplier s ON s.s_suppkey = l.l_suppkey
         |  JOIN nation n ON s.s_nationkey = n.n_nationkey
         |  JOIN region r ON n.n_regionkey = r.r_regionkey
         |  WHERE r.r_name = '${ExtendedQueries.Q55Region}')
         |SELECT DISTINCT a.s_acctbal, a.s_name, a.n_name, p.p_partkey,
         |  p.p_brand, a.l_extendedprice AS min_price
         |FROM asia a JOIN part p ON p.p_partkey = a.l_partkey
         |WHERE p.p_size <= ${ExtendedQueries.Q55MaxPartSize}
         |  AND a.l_extendedprice = (SELECT min(a2.l_extendedprice)
         |                           FROM asia a2
         |                           WHERE a2.l_partkey = a.l_partkey)
         |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
         |LIMIT 100""".stripMargin,
    // q56: TPC-H Q15 shape — max over an aggregated revenue view; the
    // max/tie comparison stays on the DECIMAL sums
    "q56_top_supplier_revenue" ->
      s"""WITH revenue AS (
         |  SELECT l_suppkey,
         |    SUM(CAST(l_extendedprice AS DECIMAL(18,2))
         |      * (CAST(1 AS DECIMAL(18,2))
         |         - CAST(l_discount AS DECIMAL(18,2)))) AS rev
         |  FROM lineitem
         |  WHERE l_shipdate >= TIMESTAMP '${ExtendedQueries.Q56WindowStart}'
         |    AND l_shipdate < TIMESTAMP '${ExtendedQueries.Q56WindowEnd}'
         |  GROUP BY l_suppkey)
         |SELECT s.s_suppkey, s.s_name, CAST(r.rev AS DOUBLE) AS total_revenue
         |FROM supplier s JOIN revenue r ON s.s_suppkey = r.l_suppkey
         |WHERE r.rev = (SELECT max(rev) FROM revenue)
         |ORDER BY s.s_suppkey""".stripMargin,
    // q57: TPC-H Q16 shape — NOT IN exclusion + distinct supplier counts
    "q57_part_supplier_counts" ->
      s"""SELECT p.p_brand, p.p_type, p.p_size,
         |  count(DISTINCT l.l_suppkey) AS supplier_cnt
         |FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
         |WHERE p.p_brand <> '${ExtendedQueries.Q57ExcludedBrand}'
         |  AND p.p_type <> '${ExtendedQueries.Q57ExcludedType}'
         |  AND p.p_size IN (${ExtendedQueries.Q57Sizes.mkString(", ")})
         |  AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier
         |                          WHERE s_acctbal < 0)
         |GROUP BY p.p_brand, p.p_type, p.p_size
         |ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size""".stripMargin,
    // q58: TPC-H Q20 shape — the oracle keeps the literal nested
    // IN-over-grouped-HAVING with a correlated per-part total
    "q58_majority_share_supp" ->
      s"""WITH qty AS (
         |  SELECT l_suppkey, l_partkey,
         |    SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sq
         |  FROM lineitem
         |  WHERE l_shipdate >= TIMESTAMP '${ExtendedQueries.Q58WindowStart}'
         |    AND l_shipdate < TIMESTAMP '${ExtendedQueries.Q58WindowEnd}'
         |  GROUP BY l_suppkey, l_partkey)
         |SELECT s.s_name, s.s_acctbal
         |FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
         |WHERE n.n_name = '${ExtendedQueries.Q58Nation}'
         |  AND s.s_suppkey IN (
         |    SELECT q.l_suppkey FROM qty q
         |    WHERE q.l_partkey IN (SELECT p_partkey FROM part
         |                          WHERE p_name LIKE '${ExtendedQueries.Q58PartPrefix}%')
         |      AND q.sq * 2 > (SELECT SUM(q2.sq) FROM qty q2
         |                      WHERE q2.l_partkey = q.l_partkey))
         |ORDER BY s.s_name""".stripMargin,
    // q59: TPC-H Q4 shape — the oracle keeps the literal EXISTS; the
    // engine's left-semi with the lateness predicate on the join must agree
    "q59_late_order_priorities" ->
      s"""SELECT o.o_orderpriority, count(*) AS order_count
         |FROM orders o
         |WHERE o.o_orderdate >= TIMESTAMP '${ExtendedQueries.Q59WindowStart}'
         |  AND o.o_orderdate < TIMESTAMP '${ExtendedQueries.Q59WindowEnd}'
         |  AND EXISTS (SELECT 1 FROM lineitem l
         |              WHERE l.l_orderkey = o.o_orderkey
         |                AND l.l_shipdate > CAST(o.o_orderdate AS DATE)
         |                  + INTERVAL ${ExtendedQueries.LateShipDays} DAY)
         |GROUP BY o.o_orderpriority ORDER BY o.o_orderpriority""".stripMargin,
    // q60: TPC-H Q6 shape — pure pushdown + one decimal product sum
    "q60_forecast_revenue" ->
      s"""SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
         |         * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
         |FROM lineitem
         |WHERE l_shipdate >= TIMESTAMP '${ExtendedQueries.Q60WindowStart}'
         |  AND l_shipdate < TIMESTAMP '${ExtendedQueries.Q60WindowEnd}'
         |  AND l_discount BETWEEN 0.05 AND 0.07
         |  AND l_quantity < 24""".stripMargin,
    // q61: TPC-H Q7 shape — bilateral nation volume per ship year
    "q61_volume_shipping" ->
      s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         |  year(CAST(l.l_shipdate AS TIMESTAMP)) AS l_year,
         |  CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
         |    * (CAST(1 AS DECIMAL(18,2))
         |       - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
         |FROM lineitem l
         |JOIN orders o ON l.l_orderkey = o.o_orderkey
         |JOIN supplier s ON l.l_suppkey = s.s_suppkey
         |JOIN customer c ON o.o_custkey = c.c_custkey
         |JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
         |JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
         |WHERE l.l_shipdate >= TIMESTAMP '${ExtendedQueries.Q61WindowStart}'
         |  AND l.l_shipdate < TIMESTAMP '${ExtendedQueries.Q61WindowEnd}'
         |  AND ((n1.n_name = '${ExtendedQueries.Q61NationA}'
         |        AND n2.n_name = '${ExtendedQueries.Q61NationB}')
         |    OR (n1.n_name = '${ExtendedQueries.Q61NationB}'
         |        AND n2.n_name = '${ExtendedQueries.Q61NationA}'))
         |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    // q62: TPC-H Q8 shape — conditional/total decimal sums in ONE pass,
    // share division at the double boundary
    "q62_market_share" ->
      s"""SELECT year(CAST(o.o_orderdate AS TIMESTAMP)) AS o_year,
         |  CAST(SUM(CASE WHEN sn.n_name = '${ExtendedQueries.Q62Nation}'
         |    THEN CAST(l.l_extendedprice AS DECIMAL(18,2))
         |      * (CAST(1 AS DECIMAL(18,2))
         |         - CAST(l.l_discount AS DECIMAL(18,2)))
         |    ELSE 0 END) AS DOUBLE)
         |  / CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
         |      * (CAST(1 AS DECIMAL(18,2))
         |         - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE)
         |    AS mkt_share
         |FROM lineitem l
         |JOIN part p ON l.l_partkey = p.p_partkey
         |JOIN orders o ON l.l_orderkey = o.o_orderkey
         |JOIN supplier s ON l.l_suppkey = s.s_suppkey
         |JOIN nation sn ON s.s_nationkey = sn.n_nationkey
         |WHERE p.p_type = '${ExtendedQueries.Q62PartType}'
         |  AND o.o_orderdate >= TIMESTAMP '${ExtendedQueries.Q62WindowStart}'
         |  AND o.o_orderdate < TIMESTAMP '${ExtendedQueries.Q62WindowEnd}'
         |  AND o.o_custkey IN (SELECT c.c_custkey FROM customer c
         |    JOIN nation cn ON c.c_nationkey = cn.n_nationkey
         |    JOIN region r ON cn.n_regionkey = r.r_regionkey
         |    WHERE r.r_name = '${ExtendedQueries.Q62Region}')
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    // q63: TPC-H Q9 shape — per-line profit from exact decimals
    "q63_product_profit" ->
      s"""SELECT n.n_name AS nation,
         |  year(CAST(o.o_orderdate AS TIMESTAMP)) AS o_year,
         |  CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
         |      * (CAST(1 AS DECIMAL(18,2))
         |         - CAST(l.l_discount AS DECIMAL(18,2)))
         |    - CAST(p.p_retailprice AS DECIMAL(12,2))
         |      * CAST(l.l_quantity AS DECIMAL(12,2))
         |      * CAST(0.5 AS DECIMAL(2,1))) AS DOUBLE) AS sum_profit
         |FROM lineitem l
         |JOIN part p ON l.l_partkey = p.p_partkey
         |JOIN supplier s ON l.l_suppkey = s.s_suppkey
         |JOIN nation n ON s.s_nationkey = n.n_nationkey
         |JOIN orders o ON l.l_orderkey = o.o_orderkey
         |WHERE p.p_name LIKE '%${ExtendedQueries.Q63PartWord}%'
         |GROUP BY 1, 2 ORDER BY nation, o_year DESC""".stripMargin,
    // q64: TPC-H Q10 shape — returned-revenue top 20
    "q64_returned_items" ->
      s"""SELECT c.c_custkey, c.c_name, c.c_acctbal, n.n_name,
         |  CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
         |    * (CAST(1 AS DECIMAL(18,2))
         |       - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
         |FROM lineitem l
         |JOIN orders o ON l.l_orderkey = o.o_orderkey
         |JOIN customer c ON o.o_custkey = c.c_custkey
         |JOIN nation n ON c.c_nationkey = n.n_nationkey
         |WHERE l.l_returnflag = 'R'
         |  AND o.o_orderdate >= TIMESTAMP '${ExtendedQueries.Q64WindowStart}'
         |  AND o.o_orderdate < TIMESTAMP '${ExtendedQueries.Q64WindowEnd}'
         |GROUP BY 1, 2, 3, 4
         |ORDER BY revenue DESC, c.c_custkey LIMIT 20""".stripMargin,
    // q65: TPC-H Q12 shape — lateness class plays the shipmode dimension
    "q65_priority_shipclass" ->
      s"""SELECT CASE WHEN l.l_shipdate > CAST(o.o_orderdate AS DATE)
         |         + INTERVAL ${ExtendedQueries.LateShipDays} DAY
         |       THEN 'late' ELSE 'ontime' END AS ship_class,
         |  CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
         |      THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
         |  CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
         |      THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
         |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    // q66: TPC-H Q14 shape — promo share, percentage at the double boundary
    "q66_promo_revenue" ->
      s"""SELECT CAST(SUM(CASE WHEN p.p_type = 'PROMO'
         |    THEN CAST(l.l_extendedprice AS DECIMAL(18,2))
         |      * (CAST(1 AS DECIMAL(18,2))
         |         - CAST(l.l_discount AS DECIMAL(18,2)))
         |    ELSE 0 END) AS DOUBLE) * 100.0
         |  / CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
         |      * (CAST(1 AS DECIMAL(18,2))
         |         - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE)
         |    AS promo_revenue
         |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
         |WHERE l.l_shipdate >= TIMESTAMP '${ExtendedQueries.Q66WindowStart}'
         |  AND l.l_shipdate < TIMESTAMP '${ExtendedQueries.Q66WindowEnd}'""".stripMargin,
    // q67: blocked fuzzy self-join (entity resolution) — candidates only
    // inside the prefix block, standard unit-cost Levenshtein on both
    // sides (the engine's threshold form equals it for kept pairs)
    "q67_fuzzy_match" -> {
      val pfx = ExtendedQueries.Q67BlockPrefix
      s"""WITH b AS (SELECT c_custkey, c_name,
         |             substr(c_name, 1, $pfx) AS blk FROM customer)
         |SELECT a.c_custkey AS a_key, bb.c_custkey AS b_key,
         |  CAST(levenshtein(a.c_name, bb.c_name) AS INT) AS edit_dist
         |FROM b a JOIN b bb ON a.blk = bb.blk
         |  AND a.c_custkey < bb.c_custkey
         |WHERE levenshtein(a.c_name, bb.c_name)
         |  <= ${ExtendedQueries.Q67MaxEdit}
         |ORDER BY a_key, b_key""".stripMargin
    },
    // q68: q67's pairs resolved to entities — recursive-CTE transitive
    // closure (the d06 rule), min reachable key as the entity id
    "q68_entity_clusters" -> {
      val pfx = ExtendedQueries.Q67BlockPrefix
      s"""WITH RECURSIVE
         |b AS (SELECT c_custkey, c_name, substr(c_name, 1, $pfx) AS blk
         |      FROM customer),
         |fpairs AS (SELECT a.c_custkey AS da, bb.c_custkey AS db
         |           FROM b a JOIN b bb ON a.blk = bb.blk
         |             AND a.c_custkey < bb.c_custkey
         |           WHERE levenshtein(a.c_name, bb.c_name)
         |             <= ${ExtendedQueries.Q67MaxEdit}),
         |edges AS (SELECT da AS ea, db AS eb FROM fpairs
         |          UNION ALL SELECT db, da FROM fpairs),
         |reach AS (SELECT ea, eb FROM edges
         |          UNION
         |          SELECT r.ea, e.eb FROM reach r JOIN edges e ON r.eb = e.ea),
         |cl AS (SELECT ea AS c_custkey, least(ea, min(eb)) AS cluster
         |       FROM reach GROUP BY ea)
         |SELECT c.c_custkey, coalesce(cl.cluster, c.c_custkey) AS entity_id,
         |  coalesce(cl.cluster, c.c_custkey) = c.c_custkey AS is_canonical
         |FROM customer c LEFT JOIN cl USING (c_custkey)
         |ORDER BY c.c_custkey""".stripMargin
    },
    // q51: TimescaleDB gapfill/locf/interpolate — dense hour spine via
    // generate_series, IGNORE NULLS windows, identical double op order
    "q51_gapfill_interpolate" ->
      """WITH ev AS (SELECT event_type,
        |    epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 AS h,
        |    CAST(value AS DECIMAL(12,6)) AS v
        |  FROM events WHERE value IS NOT NULL),
        |sparse AS (SELECT event_type, h, count(*) AS n_events,
        |    sum(v) AS vsum
        |  FROM ev GROUP BY event_type, h),
        |spine AS (SELECT event_type,
        |    unnest(generate_series(h0, h1)) AS h
        |  FROM (SELECT event_type, min(h) AS h0, max(h) AS h1
        |        FROM sparse GROUP BY event_type)),
        |j AS (SELECT s.event_type, s.h, sp.n_events, sp.vsum
        |      FROM spine s LEFT JOIN sparse sp
        |        ON sp.event_type = s.event_type AND sp.h = s.h),
        |w AS (SELECT event_type, h, n_events, vsum,
        |    last_value(vsum IGNORE NULLS) OVER pv AS prev_v,
        |    last_value(CASE WHEN vsum IS NOT NULL THEN h END IGNORE NULLS)
        |      OVER pv AS prev_h,
        |    first_value(vsum IGNORE NULLS) OVER nx AS next_v,
        |    first_value(CASE WHEN vsum IS NOT NULL THEN h END IGNORE NULLS)
        |      OVER nx AS next_h
        |  FROM j
        |  WINDOW pv AS (PARTITION BY event_type ORDER BY h
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |  nx AS (PARTITION BY event_type ORDER BY h
        |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        |SELECT event_type, h,
        |  CAST(CASE WHEN vsum IS NOT NULL THEN 1 ELSE 0 END AS INT)
        |    AS present,
        |  CAST(coalesce(n_events, 0) AS BIGINT) AS n_events,
        |  CAST(prev_v AS DOUBLE) AS locf_sum,
        |  CASE WHEN vsum IS NOT NULL THEN CAST(vsum AS DOUBLE)
        |       ELSE CAST(prev_v AS DOUBLE)
        |         + (CAST(next_v AS DOUBLE) - CAST(prev_v AS DOUBLE))
        |           * (CAST(h - prev_h AS DOUBLE)
        |              / CAST(next_h - prev_h AS DOUBLE)) END AS interp_sum
        |FROM w ORDER BY event_type, h""".stripMargin,
    // q52: moments from exact decimal power sums (identity form), doubles
    // only at the final assembly — same op order as the engine
    "q52_stats_moments" ->
      """WITH s AS (SELECT l_returnflag, count(*) AS n,
        |    sum(CAST(l_quantity AS DECIMAL(18,2))) AS sx,
        |    sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS sy,
        |    sum(CAST(l_quantity AS DECIMAL(18,2))
        |      * CAST(l_quantity AS DECIMAL(18,2))) AS sxx,
        |    sum(CAST(l_extendedprice AS DECIMAL(18,2))
        |      * CAST(l_extendedprice AS DECIMAL(18,2))) AS syy,
        |    sum(CAST(l_quantity AS DECIMAL(18,2))
        |      * CAST(l_extendedprice AS DECIMAL(18,2))) AS sxy
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, n,
        |  (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |    / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS var_qty,
        |  sqrt(greatest((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |    / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)), 0.0)) AS stddev_qty,
        |  (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
        |     - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))
        |    / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS var_price,
        |  (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |     - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |    / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS cov_qty_price,
        |  (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |     - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |    / (sqrt(greatest(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE), 0.0))
        |       * sqrt(greatest(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
        |          - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE), 0.0)))
        |    AS corr_qty_price
        |FROM s ORDER BY l_returnflag""".stripMargin,
    // q53: percent_rank/cume_dist — exact integer ratios, one division each
    "q53_distribution_rank" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price,
        |  percent_rank() OVER w AS pct_rank,
        |  cume_dist() OVER w AS cume
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey
        |  ORDER BY CAST(o_totalprice AS DECIMAL(18,2)), o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    // q54: explicit mode/percentile_disc constructions (engine built-ins
    // have differing tie-break rules); 2*cum >= total keeps the median
    // threshold an exact integer comparison
    "q54_mode_median" ->
      """WITH c AS (SELECT l_returnflag AS flag,
        |    CAST(l_quantity AS DECIMAL(18,2)) AS q, count(*) AS cnt
        |  FROM lineitem GROUP BY 1, 2),
        |m AS (SELECT flag, CAST(q AS DOUBLE) AS mode_qty, cnt AS mode_count
        |  FROM (SELECT flag, q, cnt, ROW_NUMBER() OVER (PARTITION BY flag
        |          ORDER BY cnt DESC, q ASC) AS rn FROM c)
        |  WHERE rn = 1),
        |d AS (SELECT flag, CAST(q AS DOUBLE) AS median_qty
        |  FROM (SELECT flag, q, ROW_NUMBER() OVER (PARTITION BY flag
        |          ORDER BY q ASC) AS rn
        |        FROM (SELECT flag, q,
        |                sum(cnt) OVER (PARTITION BY flag ORDER BY q
        |                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |                  AS cum,
        |                sum(cnt) OVER (PARTITION BY flag) AS tot, cnt
        |              FROM c)
        |        WHERE cum * 2 >= tot)
        |  WHERE rn = 1)
        |SELECT m.flag, mode_qty, mode_count, median_qty
        |FROM m JOIN d ON m.flag = d.flag ORDER BY m.flag""".stripMargin,
    // q44: hour-of-day activity profiles (exact DECIMAL sums), candidates
    // banded by peak hour, exact cosine on candidates, top-3 per user
    "q44_series_topk" ->
      s"""WITH ev AS (SELECT user_id,
         |    (epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000) % 24 AS hour,
         |    value FROM events WHERE value IS NOT NULL),
         |prof AS (SELECT user_id, hour,
         |    CAST(sum(CAST(value AS DECIMAL(12,6))) AS DECIMAL(18,6)) AS v
         |  FROM ev GROUP BY user_id, hour),
         |n2 AS (SELECT user_id, sum(v * v) AS n2 FROM prof GROUP BY user_id),
         |peak AS (SELECT user_id, hour AS peak_hour FROM (
         |    SELECT user_id, hour, ROW_NUMBER() OVER (PARTITION BY user_id
         |      ORDER BY v DESC, hour) AS rn FROM prof) WHERE rn = 1),
         |cand AS (SELECT a.user_id AS qa, b.user_id AS qb
         |  FROM peak a JOIN peak b ON a.peak_hour = b.peak_hour
         |    AND a.user_id <> b.user_id),
         |dots AS (SELECT c.qa, c.qb, sum(pa.v * pb.v) AS dot
         |  FROM cand c JOIN prof pa ON pa.user_id = c.qa
         |  JOIN prof pb ON pb.user_id = c.qb AND pb.hour = pa.hour
         |  GROUP BY c.qa, c.qb),
         |scored AS (SELECT d.qa AS qid, d.qb AS neighbor_id,
         |    CAST(d.dot AS DOUBLE)
         |      / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE)))
         |      AS cos_sim
         |  FROM dots d JOIN n2 na ON na.user_id = d.qa
         |  JOIN n2 nb ON nb.user_id = d.qb
         |  WHERE na.n2 > 0 AND nb.n2 > 0)
         |SELECT qid, rank, neighbor_id, cos_sim FROM (
         |  SELECT qid, neighbor_id, cos_sim,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY qid
         |      ORDER BY cos_sim DESC, neighbor_id) AS INT) AS rank
         |  FROM scored)
         |WHERE rank <= 3 ORDER BY qid, rank""".stripMargin,

    // q44b: the subquadratic clustered variant — candidates from
    // within-cluster pairs (argmax-cosine assignment to a user-id-stride
    // centroid sample) instead of peak-hour banding; scoring tail
    // identical to q44
    "q44b_series_topk_clustered" ->
      s"""WITH ev AS (SELECT user_id,
         |    (epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000) % 24 AS hour,
         |    value FROM events WHERE value IS NOT NULL),
         |prof AS (SELECT user_id, hour,
         |    CAST(sum(CAST(value AS DECIMAL(12,6))) AS DECIMAL(18,6)) AS v
         |  FROM ev GROUP BY user_id, hour),
         |n2 AS (SELECT user_id, sum(v * v) AS n2 FROM prof GROUP BY user_id),
         |cents AS (SELECT user_id AS cid, n2 AS cn2 FROM n2
         |  WHERE user_id % ${adaptiveStrideSql("n2 WHERE n2 > 0")} = 0
         |    AND n2 > 0),
         |cprof AS (SELECT c.cid, p.hour, p.v AS cv, c.cn2
         |  FROM cents c JOIN prof p ON p.user_id = c.cid),
         |cdot AS (SELECT p.user_id, cp.cid, sum(p.v * cp.cv) AS dot,
         |    min(cp.cn2) AS cn2
         |  FROM prof p JOIN cprof cp ON cp.hour = p.hour
         |  GROUP BY p.user_id, cp.cid),
         |assign AS (SELECT user_id, cid FROM (
         |    SELECT d.user_id, d.cid,
         |      ROW_NUMBER() OVER (PARTITION BY d.user_id ORDER BY
         |        CAST(d.dot AS DOUBLE) / (sqrt(CAST(nu.n2 AS DOUBLE))
         |          * sqrt(CAST(d.cn2 AS DOUBLE))) DESC, d.cid) AS rn
         |    FROM cdot d JOIN n2 nu ON nu.user_id = d.user_id
         |    WHERE nu.n2 > 0) WHERE rn = 1),
         |cand AS (SELECT a.user_id AS qa, b.user_id AS qb
         |  FROM assign a JOIN assign b ON a.cid = b.cid
         |    AND a.user_id <> b.user_id),
         |dots AS (SELECT c.qa, c.qb, sum(pa.v * pb.v) AS dot
         |  FROM cand c JOIN prof pa ON pa.user_id = c.qa
         |  JOIN prof pb ON pb.user_id = c.qb AND pb.hour = pa.hour
         |  GROUP BY c.qa, c.qb),
         |scored AS (SELECT d.qa AS qid, d.qb AS neighbor_id,
         |    CAST(d.dot AS DOUBLE)
         |      / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE)))
         |      AS cos_sim
         |  FROM dots d JOIN n2 na ON na.user_id = d.qa
         |  JOIN n2 nb ON nb.user_id = d.qb
         |  WHERE na.n2 > 0 AND nb.n2 > 0)
         |SELECT qid, rank, neighbor_id, cos_sim FROM (
         |  SELECT qid, neighbor_id, cos_sim,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY qid
         |      ORDER BY cos_sim DESC, neighbor_id) AS INT) AS rank
         |  FROM scored)
         |WHERE rank <= 3 ORDER BY qid, rank""".stripMargin,

    // ---- north-star surface oracles ---------------------------------------
    "d01_dedup_exact" ->
      """SELECT min(doc_id) AS rep_id, count(*) AS n_copies
        |FROM documents GROUP BY text ORDER BY rep_id""".stripMargin,
    // d21: DuckDB's nfc_normalize implements the same Unicode NFC form as
    // the engine's java.text.Normalizer expression
    "d21_dedup_nfc" ->
      """SELECT min(doc_id) AS rep_id, count(*) AS n_copies,
        |  count(DISTINCT text) AS n_raw_variants
        |FROM documents GROUP BY nfc_normalize(text) ORDER BY rep_id""".stripMargin,
    // d22: the canonical ladder key — same NFC + casefold + ASCII-punct
    // + whitespace composition as TextPrep.canonicalKey; the punct class
    // is explicit ASCII ranges so Java regex and RE2 agree
    "d22_dedup_canonical" ->
      """SELECT min(doc_id) AS rep_id, count(*) AS n_copies,
        |  count(DISTINCT text) AS n_raw_variants,
        |  count(DISTINCT nfc_normalize(text)) AS n_nfc_variants
        |FROM documents
        |GROUP BY trim(regexp_replace(regexp_replace(
        |  lower(nfc_normalize(text)), '[!-/:-@\[-`{-~]+', ' ', 'g'),
        |  '\s+', ' ', 'g'))
        |ORDER BY rep_id""".stripMargin,
    "d02_dedup_minhash_lsh" ->
      s"""WITH $minhashPairCtes
         |SELECT da, db, jaccard FROM pairs ORDER BY da, db""".stripMargin,
    // d23: winnowing (MOSS) — positional k-gram hashes, window-min
    // selection, df-capped fingerprint pair join; same md5-prefix hash
    // primitive as the d02 shingle base
    "d23_dedup_winnow" -> {
      val k = Dedup.WinnowK
      val w = Dedup.WinnowW
      s"""WITH $toksCte,
         |ps AS (SELECT doc_id, t,
         |         unnest(generate_series(1, len(t) - ${k - 1})) AS i,
         |         len(t) - ${k - 1} AS n_sh
         |       FROM toks WHERE len(t) >= ${k - 1 + w}),
         |ph AS (SELECT doc_id, i - 1 AS pos, n_sh,
         |         CAST('0x' || substr(md5(concat_ws(' ',
         |           ${(0 until k).map(j => s"t[i+$j]").mkString(", ")})),
         |           1, 8) AS BIGINT) AS h
         |       FROM ps),
         |wm AS (SELECT doc_id, pos, n_sh,
         |         min(h) OVER (PARTITION BY doc_id ORDER BY pos
         |           ROWS BETWEEN CURRENT ROW AND ${w - 1} FOLLOWING) AS fp
         |       FROM ph),
         |fps AS (SELECT DISTINCT doc_id, fp FROM wm
         |        WHERE pos <= n_sh - $w),
         |keptf AS (SELECT fp FROM (SELECT fp, count(*) AS d FROM fps
         |                          GROUP BY fp)
         |          WHERE d <= ${Dedup.WinnowDfCap}),
         |fk AS (SELECT fps.doc_id, fps.fp FROM fps JOIN keptf USING (fp))
         |SELECT a.doc_id AS da, b.doc_id AS db,
         |  CAST(count(*) AS BIGINT) AS n_shared
         |FROM fk a JOIN fk b ON a.fp = b.fp AND a.doc_id < b.doc_id
         |GROUP BY 1, 2 HAVING count(*) >= ${Dedup.WinnowMinShared}
         |ORDER BY 1, 2""".stripMargin
    },
    // d24: template-skeleton families — alnum runs to '#', whitespace
    // collapsed; families with >= 2 distinct payloads are the template
    // duplicates the exact/canonical ladder cannot see
    "d24_dedup_template" ->
      """WITH sk AS (SELECT doc_id, text,
        |    trim(regexp_replace(regexp_replace(text,
        |      '[0-9A-Za-z]+', '#', 'g'), '\s+', ' ', 'g')) AS sk
        |  FROM documents),
        |g AS (SELECT sk, min(doc_id) AS rep_id, count(*) AS n_docs,
        |        count(DISTINCT text) AS n_distinct_texts
        |      FROM sk GROUP BY sk)
        |SELECT rep_id, n_docs, n_distinct_texts,
        |  CAST(length(sk) AS BIGINT) AS skeleton_chars
        |FROM g WHERE n_distinct_texts >= 2 ORDER BY rep_id""".stripMargin,
    // d25: per-cluster keeper policies — the d06 closure joined with the
    // t02 quality chain (reusing the closure's own `toks` tokenization,
    // the t13 pattern), argmax-quality keeper vs the min-id label
    "d25_keeper_quality" -> {
      val stops = TextAnalysis.stopwordsEn.map(w => s"'$w'").mkString(",")
      s"""WITH RECURSIVE $closureCtes,
         |labels AS (SELECT d.doc_id, coalesce(cl.cluster, d.doc_id)
         |             AS cluster
         |           FROM documents d LEFT JOIN cl USING (doc_id)),
         |qtok AS (SELECT doc_id, unnest(t) AS tok FROM toks),
         |qst AS (SELECT doc_id, count(*) AS n_tokens,
         |          count(DISTINCT tok) AS n_distinct,
         |          CAST(sum(CASE WHEN tok IN ($stops) THEN 1 ELSE 0 END)
         |            AS BIGINT) AS stop_hits
         |        FROM qtok GROUP BY doc_id),
         |qq AS (SELECT doc_id,
         |         0.5 * (CAST(n_distinct AS DOUBLE) / n_tokens)
         |           + 0.3 * least(1.0, CAST(n_tokens AS DOUBLE) / 100.0)
         |           + 0.2 * (CAST(stop_hits AS DOUBLE) / n_tokens) AS score
         |       FROM qst),
         |m AS (SELECT l.cluster, l.doc_id, qq.score
         |      FROM labels l JOIN qq USING (doc_id)),
         |best AS (SELECT cluster, doc_id AS keeper_id,
         |           score AS keeper_quality FROM (
         |    SELECT cluster, doc_id, score, ROW_NUMBER() OVER (
         |        PARTITION BY cluster ORDER BY score DESC, doc_id) AS rn
         |    FROM m) WHERE rn = 1),
         |minq AS (SELECT cluster, score AS minid_quality FROM m
         |         WHERE doc_id = cluster),
         |sz AS (SELECT cluster, CAST(count(*) AS BIGINT) AS n_members
         |       FROM labels GROUP BY cluster)
         |SELECT b.cluster, sz.n_members, b.keeper_id, b.keeper_quality,
         |  minq.minid_quality, b.keeper_id <> b.cluster AS keeper_differs
         |FROM best b JOIN minq USING (cluster) JOIN sz USING (cluster)
         |ORDER BY b.cluster""".stripMargin
    },
    // incremental ingest = the straddling subset of the all-pairs result:
    // a (new, index) pair collides in a band iff the same unordered pair
    // does, so `pairs` restricted to one-endpoint-new replays the
    // asymmetric probe exactly.
    "d07_dedup_incremental" -> {
      val m = Dedup.IncrementalMod
      s"""WITH $minhashPairCtes,
         |straddle AS (
         |  SELECT CASE WHEN da % $m = 0 THEN da ELSE db END AS nid,
         |         CASE WHEN da % $m = 0 THEN db ELSE da END AS iid, jaccard
         |  FROM pairs WHERE (da % $m = 0) <> (db % $m = 0)),
         |best AS (SELECT nid, iid, jaccard FROM (
         |  SELECT nid, iid, jaccard, ROW_NUMBER() OVER (PARTITION BY nid
         |    ORDER BY jaccard DESC, iid) AS rn FROM straddle) WHERE rn = 1),
         |cnt AS (SELECT nid, COUNT(*) AS n FROM straddle GROUP BY nid)
         |SELECT d.doc_id,
         |  cnt.nid IS NOT NULL AS matched,
         |  COALESCE(cnt.n, 0) AS n_index_matches,
         |  COALESCE(best.iid, -1) AS best_match_id,
         |  COALESCE(best.jaccard, 0.0) AS best_jaccard
         |FROM documents d LEFT JOIN cnt ON d.doc_id = cnt.nid
         |  LEFT JOIN best ON d.doc_id = best.nid
         |WHERE d.doc_id % $m = 0 ORDER BY d.doc_id""".stripMargin
    },
    "d06_dedup_clusters" ->
      // transitive closure over the d02 near-dup pairs (components are
      // tiny, so the closure is small); cluster = min reachable doc_id
      s"""WITH RECURSIVE $closureCtes
         |SELECT d.doc_id, coalesce(cl.cluster, d.doc_id) AS cluster,
         |  coalesce(cl.cluster, d.doc_id) = d.doc_id AS is_keeper
         |FROM documents d LEFT JOIN cl USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin,
    "d03_dedup_simhash" ->
      s"""WITH $toksCte,
         |tok AS (SELECT doc_id, unnest(list_distinct(t)) AS tok FROM toks),
         |h AS (SELECT doc_id, md5(tok) AS h FROM tok),
         |contrib AS (
         |  SELECT doc_id, pos, b,
         |    ((((strpos('0123456789abcdef', substr(h, pos + 1, 1)) - 1) >> b) % 2) * 2 - 1) AS contrib
         |  FROM h, generate_series(0, 31) g1(pos), generate_series(0, 3) g2(b)),
         |bits AS (SELECT doc_id, pos, b,
         |           CASE WHEN sum(contrib) > 0 THEN 1 ELSE 0 END AS bit
         |         FROM contrib GROUP BY doc_id, pos, b),
         |nib AS (SELECT doc_id, pos, sum(bit * (1 << b)) AS nib
         |        FROM bits GROUP BY doc_id, pos),
         |hexc AS (SELECT doc_id, pos,
         |           substr('0123456789abcdef', CAST(nib AS INT) + 1, 1) AS c FROM nib)
         |SELECT doc_id, string_agg(c, '' ORDER BY pos) AS simhash128
         |FROM hexc GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "d04_dedup_ngram_jaccard" -> d04OracleSql,
    // d08: directional shingle containment — candidates from any shared
    // df-capped shingle (a lossless superset of the engine's inner-side
    // prefix index, so the verified ≥ τ outputs agree), exact re-score
    // over full shingle sets
    "d08_dedup_containment" -> d08OracleSql,
    "d09_shingle_audit_suite" ->
      s"""SELECT * FROM (
         |SELECT 'd04_jaccard_pairs' AS audit, count(*) AS n_rows,
         |  count(DISTINCT da) AS n_a, count(DISTINCT db) AS n_b
         |FROM ($d04OracleSql)
         |UNION ALL
         |SELECT 'd08_containment_pairs', count(*),
         |  count(DISTINCT inner_id), count(DISTINCT outer_id)
         |FROM ($d08OracleSql)
         |UNION ALL
         |SELECT 'p05_decontamination', count(*),
         |  CAST(sum(CASE WHEN contaminated THEN 1 ELSE 0 END) AS BIGINT),
         |  CAST(sum(n_shared_shingles) AS BIGINT)
         |FROM ($p05OracleSql)
         |) ORDER BY audit""".stripMargin,
    // d10: docs-per-shingle from the same distinct-shingle postings; the
    // dup_rate division is two exact integers, bit-identical across engines
    "d10_substring_dup_rate" ->
      s"""WITH $shingleCtes,
         |dfx AS (SELECT s, count(*) AS d FROM ex GROUP BY s)
         |SELECT ex.doc_id, count(*) AS n_shingles,
         |  CAST(sum(CASE WHEN d >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_dup_shingles,
         |  CAST(sum(CASE WHEN d >= 2 THEN 1 ELSE 0 END) AS DOUBLE) / count(*)
         |    AS dup_rate
         |FROM ex JOIN dfx USING (s)
         |GROUP BY ex.doc_id ORDER BY doc_id""".stripMargin,
    // d11: singleton clusters come from the documents LEFT JOIN (a doc in
    // no pair is its own cluster), exactly as the engine's label table
    "d11_cluster_size_histogram" ->
      s"""WITH RECURSIVE $closureCtes,
         |allc AS (SELECT d.doc_id, coalesce(cl.cluster, d.doc_id) AS cluster
         |         FROM documents d LEFT JOIN cl USING (doc_id)),
         |cs AS (SELECT cluster, count(*) AS cluster_size
         |       FROM allc GROUP BY cluster)
         |SELECT cluster_size, count(*) AS n_clusters,
         |  min(cluster) AS first_cluster
         |FROM cs GROUP BY cluster_size ORDER BY cluster_size""".stripMargin,
    "d12_dedup_bag" ->
      s"""WITH $toksCte,
         |fp AS (SELECT d.doc_id, d.text,
         |         md5(array_to_string(list_sort(t.t), ' ')) AS bag_fp
         |       FROM documents d JOIN toks t USING (doc_id))
         |SELECT min(doc_id) AS rep_id, count(*) AS n_copies,
         |  count(DISTINCT text) AS n_raw_variants
         |FROM fp GROUP BY bag_fp ORDER BY rep_id""".stripMargin,
    // d13: the LSH chain's `pairs` CTE vs the d04 AllPairs chain (CTE
    // names suffixed 2 to avoid clashing with the minhash chain's)
    "d13_dedup_recall_eval" ->
      s"""WITH $minhashPairCtes,
         |df2 AS (SELECT s, count(*) AS d FROM ex GROUP BY s),
         |kept2 AS (SELECT s FROM df2
         |          WHERE d <= greatest(${Dedup.DfCapFloor},
         |            CAST(floor(${Dedup.DfCapFraction} *
         |              (SELECT count(*) FROM documents)) AS BIGINT))),
         |exk2 AS (SELECT ex.doc_id, ex.s FROM ex JOIN kept2 USING (s)),
         |cand2 AS (SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
         |          FROM exk2 a JOIN exk2 b
         |            ON a.s = b.s AND a.doc_id < b.doc_id),
         |i2 AS (SELECT da, db, count(*) AS inter
         |       FROM cand2 JOIN ex a ON da = a.doc_id
         |       JOIN ex b ON db = b.doc_id AND a.s = b.s
         |       GROUP BY 1, 2),
         |truth AS (SELECT da, db FROM i2
         |          JOIN sizes sa ON da = sa.doc_id
         |          JOIN sizes sb ON db = sb.doc_id
         |          WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter)
         |            >= ${Dedup.JaccardThreshold}),
         |lshp AS (SELECT da, db FROM pairs),
         |cmn AS (SELECT t.da, t.db FROM truth t
         |        JOIN lshp l ON t.da = l.da AND t.db = l.db),
         |c AS (SELECT (SELECT count(*) FROM truth) AS n_exact,
         |             (SELECT count(*) FROM lshp) AS n_lsh,
         |             (SELECT count(*) FROM cmn) AS n_common)
         |SELECT 'minhash_lsh_vs_allpairs' AS method,
         |  n_exact, n_lsh, n_common,
         |  n_exact - n_common AS n_lsh_missed,
         |  n_lsh - n_common AS n_cap_missed,
         |  CASE WHEN n_exact > 0 THEN CAST(n_common AS DOUBLE) / n_exact
         |       ELSE CAST(1.0 AS DOUBLE) END AS lsh_recall
         |FROM c""".stripMargin,
    // d15: one shared shingle+signature front, one band/cand/verify CTE
    // chain per grid (suffixes avoid clashes), scalar-subquery summary
    "d15_lsh_tuning_audit" -> {
      val sigCols = (0 until Dedup.K)
        .map(j => s"min((${graft.operators.TextPrep.mixA(j)} * hb + " +
          s"${graft.operators.TextPrep.mixB(j)}) % " +
          s"${graft.operators.TextPrep.MinhashP}) AS h$j").mkString(",\n  ")
      val gridCtes = Dedup.LshTuningGrids.map { case (nb, rpb) =>
        val sel = (0 until nb).map { b0 =>
          val cols = (0 until rpb).map(r => s"h${b0 * rpb + r}")
          s"SELECT doc_id, $b0 AS band, md5(${cols.mkString(" || ")}) AS bkey FROM sig2"
        }.mkString("\n  UNION ALL ")
        s"""bands_$nb AS (
           |  $sel),
           |cand_$nb AS (SELECT DISTINCT x.doc_id AS da, y.doc_id AS db
           |  FROM bands_$nb x JOIN bands_$nb y
           |    ON x.band = y.band AND x.bkey = y.bkey
           |      AND x.doc_id < y.doc_id),
           |ver_$nb AS (SELECT count(*) AS n FROM (
           |    SELECT i.da, i.db, i.inter, sa.n AS na, sb.n AS nb FROM (
           |      SELECT da, db, count(*) AS inter FROM cand_$nb
           |        JOIN ex a ON a.doc_id = da
           |        JOIN ex b ON b.doc_id = db AND b.s = a.s
           |      GROUP BY da, db) i
           |    JOIN sizes sa ON i.da = sa.doc_id
           |    JOIN sizes sb ON i.db = sb.doc_id) v
           |  WHERE CAST(inter AS DOUBLE) / (na + nb - inter)
           |    >= ${Dedup.JaccardThreshold})""".stripMargin
      }.mkString(",\n")
      val rows = Dedup.LshTuningGrids.map { case (nb, rpb) =>
        s"""SELECT '${nb}x$rpb' AS grid, $nb AS n_bands,
           |  $rpb AS rows_per_band,
           |  (SELECT count(*) FROM cand_$nb) AS n_candidates,
           |  (SELECT n FROM ver_$nb) AS n_verified,
           |  CASE WHEN (SELECT count(*) FROM cand_$nb) > 0
           |    THEN CAST((SELECT n FROM ver_$nb) AS DOUBLE)
           |      / (SELECT count(*) FROM cand_$nb)
           |    ELSE CAST(1.0 AS DOUBLE) END AS candidate_precision""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH $shingleCtes,
         |exh2 AS (SELECT doc_id,
         |  CAST('0x' || substr(md5(s), 1, 8) AS BIGINT) AS hb FROM ex),
         |sig2 AS (SELECT doc_id,
         |  $sigCols
         |FROM exh2 GROUP BY doc_id),
         |""".stripMargin + gridCtes + ",\nbase AS (\n" + rows + "),\n" +
        s"""sel AS (SELECT *, max(CAST(n_verified AS DOUBLE)) OVER () AS qmax
           |        FROM base)
           |SELECT * EXCLUDE (qmax),
           |  (ROW_NUMBER() OVER (ORDER BY
           |     CASE WHEN CAST(n_verified AS DOUBLE)
           |       >= ${Dedup.SweepRetention} * qmax THEN 0 ELSE 1 END,
           |     n_candidates, n_bands) = 1) AS recommended
           |FROM sel ORDER BY grid""".stripMargin
    },
    // d26: the d15 sweep pattern on the embedding-LSH plane geometry —
    // full bit strings once, literal-P truncations per grid point, exact
    // all-pairs >= tau as the recall denominator, d15's recommended rule
    "d26_emb_planes_sweep" -> {
      val gridCtes = Dedup.EmbPlanesGrids.map { p =>
        s"""bb_$p AS (SELECT vec_id, band, substr(fb, 1, $p) AS bucket
           |  FROM bbf),
           |cand_$p AS (SELECT DISTINCT x.vec_id AS va, y.vec_id AS vb
           |  FROM bb_$p x JOIN bb_$p y ON x.band = y.band
           |    AND x.bucket = y.bucket AND x.vec_id < y.vec_id),
           |ver_$p AS (SELECT count(*) AS n
           |  FROM cand_$p JOIN exact USING (va, vb))""".stripMargin
      }.mkString(",\n")
      val rows = Dedup.EmbPlanesGrids.map { p =>
        s"""SELECT $p AS planes,
           |  (SELECT count(*) FROM cand_$p) AS n_candidates,
           |  (SELECT n FROM ver_$p) AS n_verified,
           |  (SELECT count(*) FROM exact) AS n_exact,
           |  CASE WHEN (SELECT count(*) FROM cand_$p) > 0
           |    THEN CAST((SELECT n FROM ver_$p) AS DOUBLE)
           |      / (SELECT count(*) FROM cand_$p)
           |    ELSE CAST(1.0 AS DOUBLE) END AS candidate_precision,
           |  CASE WHEN (SELECT count(*) FROM exact) > 0
           |    THEN CAST((SELECT n FROM ver_$p) AS DOUBLE)
           |      / (SELECT count(*) FROM exact)
           |    ELSE CAST(1.0 AS DOUBLE) END AS recall""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH ${embCteFrom(sweepShardSql)},
         |bbf AS (
         |  $embBandFullSql),
         |exact AS (SELECT va, vb FROM (
         |    SELECT a.vec_id AS va, b.vec_id AS vb,
         |      CAST($dotAB AS DOUBLE)
         |        / (sqrt(CAST(a.n2 AS DOUBLE)) * sqrt(CAST(b.n2 AS DOUBLE)))
         |        AS cs
         |    FROM e a JOIN e b ON a.vec_id < b.vec_id)
         |  WHERE cs > ${Dedup.CosineThreshold}),
         |$gridCtes,
         |base AS (
         |$rows),
         |sel AS (SELECT *, max(CAST(n_verified AS DOUBLE)) OVER () AS qmax
         |        FROM base)
         |SELECT * EXCLUDE (qmax),
         |  (ROW_NUMBER() OVER (ORDER BY
         |     CASE WHEN CAST(n_verified AS DOUBLE)
         |       >= ${Dedup.SweepRetention} * qmax THEN 0 ELSE 1 END,
         |     n_candidates, planes) = 1) AS recommended
         |FROM sel ORDER BY planes""".stripMargin
    },
    // d27: per-scope adaptive banding — scope = label, per-scope counts
    // drive the SAME integer ladder as d05's (inline CASE over the scope
    // population), buckets are prefix truncations of the full bit
    // strings, candidates pair only within a scope
    "d27_dedup_scoped" -> scopedPairsSqlOver(
      s"""e AS (SELECT vec_id, embedding, label AS scope,
         |        $n2Expr AS n2
         |      FROM embeddings)""".stripMargin),
    // d27b: the same scoped suffix over the planted-twin corpus variant
    // — same-scope twin per scope (min vec_id re-keyed at +off), one
    // cross-scope twin (min scope's min vector copied into the max
    // scope at +2·off) that the within-scope contract must NOT emit
    "d27b_dedup_scoped_planted" -> scopedPairsSqlOver(
      s"""base AS (SELECT vec_id, embedding, label AS scope FROM embeddings),
         |mx AS (SELECT max(vec_id) + 1 AS o FROM base),
         |sp AS (SELECT b.vec_id + (SELECT o FROM mx) AS vec_id,
         |              b.embedding, b.scope
         |       FROM base b
         |       JOIN (SELECT scope, min(vec_id) AS vec_id FROM base
         |             GROUP BY scope) m USING (scope, vec_id)),
         |cp AS (SELECT b.vec_id + 2 * (SELECT o FROM mx) AS vec_id,
         |              b.embedding,
         |              (SELECT max(scope) FROM base) AS scope
         |       FROM base b
         |       WHERE b.scope = (SELECT min(scope) FROM base)
         |         AND b.vec_id = (SELECT min(vec_id) FROM base
         |                         WHERE scope = (SELECT min(scope) FROM base))),
         |pl AS (SELECT * FROM base UNION ALL SELECT * FROM sp
         |       UNION ALL SELECT * FROM cp),
         |e AS (SELECT vec_id, embedding, scope,
         |        $n2Expr AS n2
         |      FROM pl)""".stripMargin),
    // d28: global (corpus-rung) vs scoped (per-scope-rung) verified pair
    // tables from the SAME full-bit banding CTE, full-outer + rollup —
    // the d19 shape applied to the scoping decision
    "d28_scoped_loss_audit" -> {
      val ladder = {
        val whens =
          (Dedup.EmbPlanesPerBand until Dedup.EmbPlanesMax)
            .map(p => s"WHEN n <= ${Dedup.EmbTargetOccupancy << p} THEN $p")
            .mkString(" ")
        s"CASE $whens ELSE ${Dedup.EmbPlanesMax} END"
      }
      val cos = s"CAST($dotAB AS DOUBLE)" +
        " / (sqrt(CAST(a.n2 AS DOUBLE)) * sqrt(CAST(b.n2 AS DOUBLE)))"
      s"""WITH e AS (SELECT vec_id, embedding, label AS scope,
         |        $n2Expr AS n2
         |      FROM embeddings),
         |bbf AS (
         |  $embBandFullSql),
         |bbg AS (SELECT vec_id, band,
         |          substr(fb, 1, ${embPlanesSql("e")}) AS bucket
         |        FROM bbf),
         |gcand AS (SELECT DISTINCT x.vec_id AS va, y.vec_id AS vb
         |          FROM bbg x JOIN bbg y ON x.band = y.band
         |            AND x.bucket = y.bucket AND x.vec_id < y.vec_id),
         |gp AS (SELECT va, vb, 1 AS g
         |  FROM gcand JOIN e a ON va = a.vec_id JOIN e b ON vb = b.vec_id
         |  WHERE $cos > ${Dedup.CosineThreshold}),
         |cnt AS (SELECT scope, $ladder AS p
         |        FROM (SELECT scope, count(*) AS n FROM e GROUP BY scope)),
         |bbs AS (SELECT b.vec_id, s.scope, b.band,
         |          substr(b.fb, 1, c.p) AS bucket
         |        FROM bbf b
         |        JOIN (SELECT vec_id, scope FROM e) s USING (vec_id)
         |        JOIN cnt c USING (scope)),
         |scand AS (SELECT DISTINCT x.vec_id AS va, y.vec_id AS vb
         |          FROM bbs x JOIN bbs y ON x.scope = y.scope
         |            AND x.band = y.band AND x.bucket = y.bucket
         |            AND x.vec_id < y.vec_id),
         |sp AS (SELECT va, vb, 1 AS m
         |  FROM scand JOIN e a ON va = a.vec_id JOIN e b ON vb = b.vec_id
         |  WHERE $cos > ${Dedup.CosineThreshold}),
         |j AS (SELECT coalesce(g, 0) AS g, coalesce(m, 0) AS m
         |      FROM gp FULL JOIN sp USING (va, vb))
         |SELECT CAST((SELECT count(*) FROM e) AS BIGINT) AS n_vectors,
         |  CAST(sum(g) AS BIGINT) AS n_global,
         |  CAST(sum(m) AS BIGINT) AS n_scoped,
         |  CAST(sum(g * m) AS BIGINT) AS n_both,
         |  CAST(sum(g) - sum(g * m) AS BIGINT) AS n_global_only,
         |  CAST(sum(m) - sum(g * m) AS BIGINT) AS n_scoped_only,
         |  CASE WHEN sum(g) = 0 THEN NULL
         |    ELSE CAST(sum(g * m) AS DOUBLE) / sum(g) END AS scoped_coverage
         |FROM j""".stripMargin
    },
    // d16: stride-1 token-window fingerprints; canonical first occurrence
    // exempt (rk=1 by (doc_id,pos)); islands merge overlapping cut windows
    "d16_passage_cuts" -> d16OracleSql,
    // d17: d16's spans rolled up per doc, left-joined to every doc's
    // token count, then one per-lang accounting aggregation
    "d17_cut_accounting" ->
      s"""WITH spans AS (SELECT * FROM ($d16OracleSql)),
         |pd AS (SELECT doc_id, CAST(sum(n_tokens_cut) AS BIGINT) AS cut
         |       FROM spans GROUP BY doc_id),
         |tk AS (SELECT d.doc_id, d.lang,
         |    CAST(len(string_split_regex(lower(trim(d.text)), '\\s+'))
         |      AS BIGINT) AS n_tokens
         |  FROM documents d),
         |j AS (SELECT tk.lang, tk.n_tokens, COALESCE(pd.cut, 0) AS cut
         |      FROM tk LEFT JOIN pd USING (doc_id))
         |SELECT lang, count(*) AS n_docs,
         |  CAST(sum(n_tokens) AS BIGINT) AS tokens_total,
         |  CAST(sum(cut) AS BIGINT) AS tokens_cut,
         |  CAST(sum(n_tokens) - sum(cut) AS BIGINT) AS net_tokens,
         |  CAST(sum(cut) AS DOUBLE) / sum(n_tokens) AS cut_rate
         |FROM j GROUP BY lang ORDER BY lang""".stripMargin,
    // d14: closure CTEs give cl(doc_id, cluster) over near-dup docs;
    // singleton docs label themselves via the LEFT JOIN coalesce
    "d14_dedup_funnel" ->
      s"""WITH RECURSIVE $closureCtes,
         |allc AS (SELECT d.doc_id, coalesce(cl.cluster, d.doc_id) AS cluster
         |         FROM documents d LEFT JOIN cl USING (doc_id)),
         |tk AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tokens FROM toks),
         |s1 AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY text),
         |bg AS (SELECT doc_id, md5(array_to_string(list_sort(t), ' '))
         |         AS bag_fp FROM toks),
         |s2 AS (SELECT min(doc_id) AS doc_id FROM bg GROUP BY bag_fp),
         |s3 AS (SELECT min(s2.doc_id) AS doc_id FROM s2
         |       JOIN allc USING (doc_id) GROUP BY allc.cluster),
         |f AS (SELECT d.doc_id, tk.n_tokens,
         |        (k1.doc_id IS NOT NULL) AS in1,
         |        (k2.doc_id IS NOT NULL) AS in2,
         |        (k3.doc_id IS NOT NULL) AS in3
         |      FROM documents d JOIN tk USING (doc_id)
         |      LEFT JOIN s1 k1 ON d.doc_id = k1.doc_id
         |      LEFT JOIN s2 k2 ON d.doc_id = k2.doc_id
         |      LEFT JOIN s3 k3 ON d.doc_id = k3.doc_id),
         |a AS (SELECT count(*) AS c0, CAST(sum(n_tokens) AS BIGINT) AS t0,
         |        count(*) FILTER (WHERE in1) AS c1,
         |        CAST(coalesce(sum(n_tokens) FILTER (WHERE in1), 0)
         |          AS BIGINT) AS t1,
         |        count(*) FILTER (WHERE in2) AS c2,
         |        CAST(coalesce(sum(n_tokens) FILTER (WHERE in2), 0)
         |          AS BIGINT) AS t2,
         |        count(*) FILTER (WHERE in3) AS c3,
         |        CAST(coalesce(sum(n_tokens) FILTER (WHERE in3), 0)
         |          AS BIGINT) AS t3
         |      FROM f)
         |SELECT * FROM (
         |  SELECT 0 AS stage, 'total' AS stage_name,
         |    c0 AS docs_remaining, t0 AS tokens_remaining FROM a
         |  UNION ALL SELECT 1, 'exact', c1, t1 FROM a
         |  UNION ALL SELECT 2, 'bag', c2, t2 FROM a
         |  UNION ALL SELECT 3, 'near_dup_cluster', c3, t3 FROM a)
         |ORDER BY stage""".stripMargin,
    "d05_dedup_embedding" -> {
      s"""WITH $embCte,
         |bb AS (
         |  $embBandSql),
         |cand AS (SELECT DISTINCT x.vec_id AS va, y.vec_id AS vb
         |         FROM bb x JOIN bb y ON x.band = y.band
         |           AND x.bucket = y.bucket AND x.vec_id < y.vec_id)
         |SELECT va, vb,
         |  CAST($dotAB AS DOUBLE)
         |    / (sqrt(CAST(a.n2 AS DOUBLE)) * sqrt(CAST(b.n2 AS DOUBLE))) AS cos_sim
         |FROM cand JOIN e a ON va = a.vec_id JOIN e b ON vb = b.vec_id
         |WHERE CAST($dotAB AS DOUBLE)
         |    / (sqrt(CAST(a.n2 AS DOUBLE)) * sqrt(CAST(b.n2 AS DOUBLE))) > ${Dedup.CosineThreshold}
         |ORDER BY va, vb""".stripMargin
    },
    // d18: SemDeDup — stride centroids, argmax-cosine assignment (ties to
    // the smallest cid), greedy-by-id within-cluster keep rule; every dot
    // is the exact-decimal contract shared with d05/s01
    "d18_semantic_dedup" ->
      s"""WITH $embCte,
         |cents AS (SELECT vec_id AS cid, embedding AS cv, n2 AS cn2 FROM e
         |          WHERE vec_id % ${adaptiveStrideSql("e")} = 0),
         |ac AS (SELECT a.vec_id, c.cid,
         |    CAST(list_sum(list_transform(list_zip(a.embedding, c.cv),
         |      z -> CAST(CAST(z[1] AS DOUBLE) AS DECIMAL(12,6))
         |         * CAST(CAST(z[2] AS DOUBLE) AS DECIMAL(12,6)))) AS DOUBLE)
         |      / (sqrt(CAST(a.n2 AS DOUBLE)) * sqrt(CAST(c.cn2 AS DOUBLE))) AS ccos
         |  FROM e a, cents c),
         |assign AS (SELECT vec_id, cid FROM (
         |    SELECT vec_id, cid, ROW_NUMBER() OVER (PARTITION BY vec_id
         |      ORDER BY ccos DESC, cid) AS rn FROM ac)
         |  WHERE rn = 1),
         |cand AS (SELECT x.vec_id AS va, y.vec_id AS vb
         |         FROM assign x JOIN assign y ON x.cid = y.cid
         |           AND x.vec_id < y.vec_id),
         |dups AS (SELECT DISTINCT vb
         |         FROM cand JOIN e a ON va = a.vec_id JOIN e b ON vb = b.vec_id
         |         WHERE CAST($dotAB AS DOUBLE)
         |           / (sqrt(CAST(a.n2 AS DOUBLE)) * sqrt(CAST(b.n2 AS DOUBLE)))
         |             > ${Dedup.CosineThreshold})
         |SELECT s.vec_id, s.cid,
         |  CASE WHEN d.vb IS NULL THEN 1 ELSE 0 END AS keep
         |FROM assign s LEFT JOIN dups d ON s.vec_id = d.vb
         |ORDER BY s.vec_id""".stripMargin,
    // d19: full-outer join of the d05 (LSH-found) and d18 (cluster-found)
    // verified >= tau pair tables; same band/centroid constructions
    "d19_dedup_method_agreement" -> agreementSqlOver(embCte),
    // d19b: the identical agreement body over the deterministic
    // md5-bucket hash-shard (the d26 predicate at AgreementSamplePct) —
    // every geometry term (plane ladder, centroid stride) re-derives
    // from the SHARD's own counts inside the shared CTEs
    "d19b_method_agreement_sampled" -> agreementSqlOver(embCteFrom(
      "(SELECT * FROM embeddings WHERE" +
        " CAST('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 8) AS BIGINT)" +
        s" % 100 < ${Dedup.AgreementSamplePct})")),
    "s01_sim_bruteforce_topk" -> s01Sql,
    "s02_sim_ann_lsh" -> s02Sql,
    "s03_sim_ann_ivf" -> s03Sql,
    // s04_sim_ann_ivf_trained: rows-only by design — k-means||-trained
    // centroid floats are engine-specific (like q12b's HLL sketch);
    // correctness is pinned by the clustered-corpus recall spec instead.
    "s05_sim_quantized_topk" -> s05Sql,
    // PQ/ADC: same decimal-exact per-element contract as embCte/dotAB;
    // argmin replayed as ROW_NUMBER over (key, code) — identical semantics
    // to the engine's min(struct(key, code)).
    "s07_sim_pq_topk" -> s07Sql,
    "s09_quantization_recall" ->
      s"""WITH bf AS (SELECT qid, neighbor_id FROM ($s01Sql) WHERE rank <= 3),
         |q8 AS (SELECT qid, neighbor_id FROM ($s05Sql)),
         |pq AS (SELECT qid, neighbor_id FROM ($s07Sql)),
         |c AS (SELECT 'int8' AS method, count(*) AS n_hits
         |        FROM q8 JOIN bf USING (qid, neighbor_id)
         |      UNION ALL
         |      SELECT 'pq', count(*) FROM pq JOIN bf USING (qid, neighbor_id))
         |SELECT method, n_hits,
         |  CAST(${3 * Similarity.NumQueries} AS BIGINT) AS n_possible,
         |  CAST(n_hits AS DOUBLE) / ${3 * Similarity.NumQueries} AS recall_at_3
         |FROM c ORDER BY method""".stripMargin,
    "s06_ann_recall" ->
      s"""WITH bf AS (SELECT qid, neighbor_id FROM ($s01Sql) WHERE rank <= 3),
         |lsh AS (SELECT qid, neighbor_id FROM ($s02Sql)),
         |ivf AS (SELECT qid, neighbor_id FROM ($s03Sql)),
         |ivfpq AS (SELECT qid, neighbor_id FROM ($s15Sql)),
         |c AS (SELECT 'lsh' AS method, count(*) AS n_hits
         |        FROM lsh JOIN bf USING (qid, neighbor_id)
         |      UNION ALL
         |      SELECT 'ivf', count(*) FROM ivf JOIN bf USING (qid, neighbor_id)
         |      UNION ALL
         |      SELECT 'ivfpq', count(*)
         |        FROM ivfpq JOIN bf USING (qid, neighbor_id))
         |SELECT method, n_hits,
         |  CAST(${3 * Similarity.NumQueries} AS BIGINT) AS n_possible,
         |  CAST(n_hits AS DOUBLE) / ${3 * Similarity.NumQueries} AS recall_at_3
         |FROM c ORDER BY method""".stripMargin,
    // s10: occupancy stats over the same bucket/assignment CTEs as
    // s02/s03; sums cast from DuckDB's HUGEINT to BIGINT to match Spark
    "s10_index_stats" ->
      s"""WITH $embCte,
         |bk AS (SELECT vec_id, $lshBitExprs AS bucket FROM e),
         |lg AS (SELECT bucket, count(*) AS sz FROM bk GROUP BY bucket),
         |cents AS (SELECT vec_id AS cid, embedding AS cv, n2 AS cn2 FROM e
         |          WHERE vec_id % ${ivfStrideSql()} = 0
         |            AND vec_id >= ${Similarity.NumQueries}),
         |ac AS (SELECT a.vec_id, c.cid,
         |    list_sum(list_transform(list_zip(a.embedding, c.cv),
         |      z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE)))
         |      / (sqrt(CAST(a.n2 AS DOUBLE)) * sqrt(CAST(c.cn2 AS DOUBLE))) AS ccos
         |  FROM e a, cents c),
         |assign AS (SELECT vec_id, cid FROM (
         |    SELECT vec_id, cid, ROW_NUMBER() OVER (PARTITION BY vec_id
         |      ORDER BY ccos DESC, cid) AS rn FROM ac)
         |  WHERE rn = 1),
         |ig AS (SELECT cid, count(*) AS sz FROM assign GROUP BY cid),
         |st AS (
         |  SELECT 'lsh' AS index_name, count(*) AS n_groups,
         |    CAST(sum(sz) AS BIGINT) AS n_vectors,
         |    CAST(min(sz) AS BIGINT) AS min_size,
         |    CAST(max(sz) AS BIGINT) AS max_size FROM lg
         |  UNION ALL
         |  SELECT 'ivf', count(*), CAST(sum(sz) AS BIGINT),
         |    CAST(min(sz) AS BIGINT), CAST(max(sz) AS BIGINT) FROM ig)
         |SELECT index_name, n_groups, n_vectors, min_size, max_size,
         |  CAST(max_size AS DOUBLE) / n_vectors AS max_share
         |FROM st ORDER BY index_name""".stripMargin,
    // s11: per-dim sums in exact DECIMAL(12,6) (the d05/s01 numeric
    // contract), mean as one boundary division; dims indexed 0-based
    "s11_embedding_stats" ->
      s"""WITH d AS (SELECT CAST(i AS INT) AS dim,
         |    CAST(embedding[CAST(i AS INT) + 1] AS DOUBLE) AS v
         |  FROM embeddings,
         |    (SELECT unnest(generate_series(0, ${Similarity.Dim - 1})) AS i))
         |SELECT dim, count(*) AS n_vecs,
         |  CAST(sum(CAST(v AS DECIMAL(12,6))) AS DOUBLE) / count(*) AS mean_v,
         |  min(v) AS min_v, max(v) AS max_v,
         |  CAST(sum(CASE WHEN v = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero,
         |  CAST(sum(CASE WHEN v > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos
         |FROM d GROUP BY dim ORDER BY dim""".stripMargin,
    // s13: the s11 unnest with a parity CASE - one conditional
    // aggregation, decimal sums, boundary-double means and shift
    "s13_embedding_drift" ->
      s"""WITH d AS (SELECT vec_id, CAST(i AS INT) AS dim,
         |    CAST(embedding[CAST(i AS INT) + 1] AS DOUBLE) AS v
         |  FROM embeddings,
         |    (SELECT unnest(generate_series(0, ${Similarity.Dim - 1})) AS i)),
         |g AS (SELECT dim,
         |    CAST(sum(CASE WHEN vec_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_a,
         |    CAST(sum(CASE WHEN vec_id % 2 <> 0 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_b,
         |    sum(CASE WHEN vec_id % 2 = 0
         |      THEN CAST(v AS DECIMAL(12,6)) END) AS sa,
         |    sum(CASE WHEN vec_id % 2 <> 0
         |      THEN CAST(v AS DECIMAL(12,6)) END) AS sb
         |  FROM d GROUP BY dim)
         |SELECT dim, n_a, n_b,
         |  CAST(sa AS DOUBLE) / n_a AS mean_a,
         |  CAST(sb AS DOUBLE) / n_b AS mean_b,
         |  abs(CAST(sa AS DOUBLE) / n_a - CAST(sb AS DOUBLE) / n_b)
         |    AS mean_shift
         |FROM g ORDER BY dim""".stripMargin,
    // s14: one bf-truth CTE; per-M hit CTEs embed the parameterized s07
    // body as a self-contained subquery
    "s14_pq_tuning_sweep" -> {
      val perM = Similarity.PqSweepMs.map { m =>
        s"""pq_$m AS (SELECT qid, neighbor_id
           |  FROM (${s07SqlFor(m, Similarity.Dim / m)})),
           |h_$m AS (SELECT count(*) AS n FROM pq_$m
           |  JOIN bf USING (qid, neighbor_id))""".stripMargin
      }.mkString(",\n")
      val rows = Similarity.PqSweepMs.map { m =>
        s"""SELECT $m AS pq_m, ${Similarity.Dim / m} AS subdim,
           |  CAST($m AS BIGINT) AS bytes_per_vec,
           |  (SELECT n FROM h_$m) AS n_hits,
           |  CAST(${3 * Similarity.NumQueries} AS BIGINT) AS n_possible,
           |  CAST((SELECT n FROM h_$m) AS DOUBLE)
           |    / ${3 * Similarity.NumQueries} AS recall_at_3""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH $embCte,
         |bfr AS (
         |  SELECT a.vec_id AS qid, b.vec_id AS neighbor_id,
         |    CAST($dotAB AS DOUBLE)
         |      / (sqrt(CAST(a.n2 AS DOUBLE)) * sqrt(CAST(b.n2 AS DOUBLE))) AS cos_sim
         |  FROM e a JOIN e b ON b.vec_id <> a.vec_id
         |  WHERE a.vec_id < ${Similarity.NumQueries}),
         |bf AS (SELECT qid, neighbor_id FROM (
         |    SELECT qid, neighbor_id, ROW_NUMBER() OVER (PARTITION BY qid
         |      ORDER BY cos_sim DESC, neighbor_id) AS rank FROM bfr)
         |  WHERE rank <= 3),
         |""".stripMargin + perM + ",\nbase AS (\n" + rows + "),\n" +
        s"""sel AS (SELECT *, max(recall_at_3) OVER () AS qmax FROM base)
           |SELECT * EXCLUDE (qmax),
           |  (ROW_NUMBER() OVER (ORDER BY
           |     CASE WHEN recall_at_3 >= ${Dedup.SweepRetention} * qmax
           |       THEN 0 ELSE 1 END,
           |     bytes_per_vec, pq_m) = 1) AS recommended
           |FROM sel ORDER BY pq_m""".stripMargin
    },
    // s19: prefix-truncated exact search per width vs the full-dim
    // truth; same decimal-dot contract as embCte at every width
    "s19_dim_tuning_sweep" -> {
      def d6(x: String) = s"CAST(CAST($x AS DOUBLE) AS DECIMAL(12,6))"
      val np = 3 * Similarity.NumQueries
      val perD = Similarity.DimSweep.map { d =>
        s"""e_$d AS (SELECT vec_id, list_slice(embedding, 1, $d) AS embedding,
           |    list_sum(list_transform(list_slice(embedding, 1, $d),
           |      x -> ${d6("x")} * ${d6("x")})) AS n2
           |  FROM embeddings),
           |r_$d AS (SELECT qid, neighbor_id FROM (
           |    SELECT a.vec_id AS qid, b.vec_id AS neighbor_id,
           |      ROW_NUMBER() OVER (PARTITION BY a.vec_id ORDER BY
           |        CAST($dotAB AS DOUBLE)
           |          / (sqrt(CAST(a.n2 AS DOUBLE))
           |             * sqrt(CAST(b.n2 AS DOUBLE))) DESC,
           |        b.vec_id) AS rank
           |    FROM e_$d a JOIN e_$d b ON b.vec_id <> a.vec_id
           |    WHERE a.vec_id < ${Similarity.NumQueries})
           |  WHERE rank <= 3),
           |h_$d AS (SELECT count(*) AS n FROM r_$d
           |  JOIN bf USING (qid, neighbor_id))""".stripMargin
      }.mkString(",\n")
      val rows = Similarity.DimSweep.map { d =>
        s"""SELECT $d AS dims, CAST(${4L * d} AS BIGINT) AS bytes_per_vec,
           |  (SELECT n FROM h_$d) AS n_hits,
           |  CAST($np AS BIGINT) AS n_possible,
           |  CAST((SELECT n FROM h_$d) AS DOUBLE) / $np AS recall_at_3"""
          .stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH $embCte,
         |bfr AS (
         |  SELECT a.vec_id AS qid, b.vec_id AS neighbor_id,
         |    CAST($dotAB AS DOUBLE)
         |      / (sqrt(CAST(a.n2 AS DOUBLE)) * sqrt(CAST(b.n2 AS DOUBLE))) AS cos_sim
         |  FROM e a JOIN e b ON b.vec_id <> a.vec_id
         |  WHERE a.vec_id < ${Similarity.NumQueries}),
         |bf AS (SELECT qid, neighbor_id FROM (
         |    SELECT qid, neighbor_id, ROW_NUMBER() OVER (PARTITION BY qid
         |      ORDER BY cos_sim DESC, neighbor_id) AS rank FROM bfr)
         |  WHERE rank <= 3),
         |""".stripMargin + perD + ",\nbase AS (\n" + rows + "),\n" +
        s"""sel AS (SELECT *, max(recall_at_3) OVER () AS qmax FROM base)
           |SELECT * EXCLUDE (qmax),
           |  (ROW_NUMBER() OVER (ORDER BY
           |     CASE WHEN recall_at_3 >= ${Dedup.SweepRetention} * qmax
           |       THEN 0 ELSE 1 END,
           |     bytes_per_vec, dims) = 1) AS recommended
           |FROM sel ORDER BY dims""".stripMargin
    },
    // s12: the s03 IVF CTE chain widened with probe_rank; one scored CTE
    // serves every sweep point via per-np rank/count CTEs
    "s12_ivf_probe_audit" -> {
      val perNp = Similarity.ProbeSweep.map { np =>
        s"""r_$np AS (SELECT qid, neighbor_id,
           |    ROW_NUMBER() OVER (PARTITION BY qid
           |      ORDER BY cos_sim DESC, neighbor_id) AS rank
           |  FROM scored WHERE probe_rank <= $np),
           |h_$np AS (SELECT count(*) AS n FROM r_$np
           |  JOIN bf USING (qid, neighbor_id) WHERE rank <= 3),
           |c_$np AS (SELECT count(*) AS n FROM scored
           |  WHERE probe_rank <= $np)""".stripMargin
      }.mkString(",\n")
      val rows = Similarity.ProbeSweep.map { np =>
        s"""SELECT $np AS n_probe, (SELECT n FROM c_$np) AS n_candidates,
           |  (SELECT n FROM h_$np) AS n_hits,
           |  CAST(${3 * Similarity.NumQueries} AS BIGINT) AS n_possible,
           |  CAST((SELECT n FROM h_$np) AS DOUBLE)
           |    / ${3 * Similarity.NumQueries} AS recall_at_3""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH $embCte,
         |cents AS (SELECT vec_id AS cid, embedding AS cv, n2 AS cn2 FROM e
         |          WHERE vec_id % ${ivfStrideSql()} = 0
         |            AND vec_id >= ${Similarity.NumQueries}),
         |ac AS (SELECT a.vec_id, c.cid,
         |    list_sum(list_transform(list_zip(a.embedding, c.cv),
         |      z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE)))
         |      / (sqrt(CAST(a.n2 AS DOUBLE)) * sqrt(CAST(c.cn2 AS DOUBLE))) AS ccos
         |  FROM e a, cents c),
         |assign AS (SELECT vec_id, cid FROM (
         |    SELECT vec_id, cid, ROW_NUMBER() OVER (PARTITION BY vec_id
         |      ORDER BY ccos DESC, cid) AS rn FROM ac)
         |  WHERE rn = 1),
         |probes AS (SELECT vec_id AS qid, cid, rn AS probe_rank FROM (
         |    SELECT vec_id, cid, ROW_NUMBER() OVER (PARTITION BY vec_id
         |      ORDER BY ccos DESC, cid) AS rn
         |    FROM ac WHERE vec_id < ${Similarity.NumQueries})
         |  WHERE rn <= ${Similarity.ProbeSweep.max}),
         |scored AS (
         |  SELECT p.qid, p.probe_rank, s.vec_id AS neighbor_id,
         |    CAST($dotAB AS DOUBLE)
         |      / (sqrt(CAST(a.n2 AS DOUBLE)) * sqrt(CAST(b.n2 AS DOUBLE))) AS cos_sim
         |  FROM probes p
         |  JOIN assign s ON s.cid = p.cid AND s.vec_id <> p.qid
         |  JOIN e a ON a.vec_id = p.qid
         |  JOIN e b ON b.vec_id = s.vec_id),
         |bfr AS (
         |  SELECT a.vec_id AS qid, b.vec_id AS neighbor_id,
         |    CAST($dotAB AS DOUBLE)
         |      / (sqrt(CAST(a.n2 AS DOUBLE)) * sqrt(CAST(b.n2 AS DOUBLE))) AS cos_sim
         |  FROM e a JOIN e b ON b.vec_id <> a.vec_id
         |  WHERE a.vec_id < ${Similarity.NumQueries}),
         |bf AS (SELECT qid, neighbor_id FROM (
         |    SELECT qid, neighbor_id, ROW_NUMBER() OVER (PARTITION BY qid
         |      ORDER BY cos_sim DESC, neighbor_id) AS rank FROM bfr)
         |  WHERE rank <= 3),
         |""".stripMargin + perNp + ",\nbase AS (\n" + rows + "),\n" +
        s"""sel AS (SELECT *, max(recall_at_3) OVER () AS qmax FROM base)
           |SELECT * EXCLUDE (qmax),
           |  (ROW_NUMBER() OVER (ORDER BY
           |     CASE WHEN recall_at_3 >= ${Dedup.SweepRetention} * qmax
           |       THEN 0 ELSE 1 END,
           |     n_candidates, n_probe) = 1) AS recommended
           |FROM sel ORDER BY n_probe""".stripMargin
    },
    // s15: the s03 IVF probe pruning composed with the s07 PQ/ADC scoring
    // — candidates restricted to the query's probed inverted lists
    "s15_sim_ivfpq_topk" -> s15Sql,
    "s16_sim_ivfpq_refine" -> s16Sql,
    // s17: incremental IVF-PQ ingest — assignment/codes replayed with the
    // quantizer artifacts frozen to the pre-ingest (NOT new-batch) corpus
    "s17_ivfpq_ingest" -> s17Sql,
    // s17c/s18c/s20c/s21c: the persisted-artifact paths are value-equal
    // by construction (assignment/encoding are pure functions of the
    // frozen tables), so each replays its derive twin's oracle verbatim
    "s17c_ingest_artifacts" -> s17Sql,
    "s17b_ingest_recall" -> {
      val np = 3 * Similarity.NumQueries
      // the fresh baseline runs at the frozen artifacts' OWN stride
      // (count over the EXISTING members) so the delta isolates
      // quantizer staleness from K resizing — the engine pins both
      // sides the same way (ivfPqIngestRecall)
      val baseSql =
        s"""${s15CtesFor("", "", stridePred = s17NotNewPred)}
           |SELECT qid, rank, neighbor_id, pq_score FROM r
           |WHERE rank <= 3 ORDER BY qid, rank""".stripMargin
      s"""WITH bf AS (SELECT qid, neighbor_id FROM ($s01Sql)
         |           WHERE rank <= 3),
         |base AS (SELECT qid, neighbor_id FROM ($baseSql)),
         |ing AS (SELECT qid, neighbor_id FROM ($s15IngestSql)),
         |c AS (SELECT
         |  CAST((SELECT count(*) FROM ing JOIN bf USING (qid, neighbor_id))
         |    AS BIGINT) AS n_hits,
         |  CAST((SELECT count(*) FROM base JOIN bf USING (qid, neighbor_id))
         |    AS BIGINT) AS n_base)
         |SELECT 'ivfpq_ingest' AS method, n_hits,
         |  CAST($np AS BIGINT) AS n_possible,
         |  CAST(n_hits AS DOUBLE) / $np AS recall_at_3,
         |  CAST(n_base AS DOUBLE) / $np AS baseline_recall_at_3,
         |  CAST(n_hits AS DOUBLE) / $np - CAST(n_base AS DOUBLE) / $np
         |    AS recall_delta
         |FROM c""".stripMargin
    },
    // s18: tombstone delete + compaction — the CDC delete feed applied to
    // the index; artifacts frozen to the FULL pre-delete corpus
    "s18_ivfpq_delete" -> s18Sql,
    "s18c_delete_artifacts" -> s18Sql,
    "s18b_delete_serve" -> s18bSql,
    // s20: shard-parallel build merge — per-list shard contributions
    // under one shared frozen quantizer
    "s20_ivfpq_shard_merge" -> s20Sql,
    "s20c_merge_artifacts" -> s20Sql,
    "s08_sim_filtered_topk" -> s08Sql,
    // s21: pre-filter vs post-filter through the compressed index,
    // scored against s08's exact filtered truth
    "s21_filtered_ann_audit" -> s21Sql,
    "s21c_filtered_artifacts" -> s21Sql,
    // s22: kNN label-consistency — exact top-K truth (the s01 body)
    // joined to labels; per-label hit and majority-vote-correct counts,
    // integers only; majority ties break to the smallest label on both
    // engines
    "s22_label_purity" ->
      s"""WITH top AS (SELECT qid, neighbor_id FROM ($s01Sql)),
         |lab AS (SELECT vec_id, label FROM embeddings),
         |j AS (SELECT t.qid, ql.label AS qlabel, nl.label AS nlabel
         |      FROM top t
         |      JOIN lab ql ON ql.vec_id = t.qid
         |      JOIN lab nl ON nl.vec_id = t.neighbor_id),
         |perq AS (SELECT qid, qlabel,
         |      SUM(CASE WHEN nlabel = qlabel THEN 1 ELSE 0 END) AS n_match
         |    FROM j GROUP BY qid, qlabel),
         |maj AS (SELECT qid, nlabel AS maj_label FROM (
         |      SELECT qid, nlabel, ROW_NUMBER() OVER (PARTITION BY qid
         |          ORDER BY COUNT(*) DESC, nlabel) AS rn
         |      FROM j GROUP BY qid, nlabel) WHERE rn = 1)
         |SELECT p.qlabel AS label, COUNT(*) AS n_queries,
         |  CAST(SUM(p.n_match) AS BIGINT) AS n_hits,
         |  CAST(SUM(CASE WHEN m.maj_label = p.qlabel THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_correct
         |FROM perq p JOIN maj m USING (qid)
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "p01_hash_split" ->
      """WITH b AS (SELECT doc_id,
        |    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)
        |      % 100 AS bucket
        |  FROM documents)
        |SELECT CASE WHEN bucket < 80 THEN 'train'
        |            WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split,
        |  COUNT(*) AS n_docs, MIN(doc_id) AS first_doc
        |FROM b GROUP BY 1 ORDER BY split""".stripMargin,
    "p02_stratified_sample" ->
      s"""WITH h AS (SELECT doc_id, lang,
         |    md5(CAST(doc_id AS VARCHAR)) AS h FROM documents),
         |r AS (SELECT lang, doc_id,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY lang ORDER BY h, doc_id)
         |      AS INT) AS rk
         |  FROM h)
         |SELECT lang, rk, doc_id FROM r
         |WHERE rk <= ${Sampling.PerStratum} ORDER BY lang, rk""".stripMargin,
    "p03_split_leakage" ->
      s"""WITH $minhashPairCtes,
         |sp AS (SELECT doc_id,
         |    CASE WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
         |              AS BIGINT) % 100 < 80 THEN 'train'
         |         WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
         |              AS BIGINT) % 100 < 90 THEN 'val' ELSE 'test' END AS split
         |  FROM documents)
         |SELECT da, db, a.split AS split_a, b.split AS split_b, jaccard
         |FROM pairs JOIN sp a ON da = a.doc_id JOIN sp b ON db = b.doc_id
         |WHERE a.split <> b.split
         |ORDER BY da, db""".stripMargin,
    "p04_sequence_packing" -> p04OracleSql,
    "p10_packing_efficiency" ->
      s"""SELECT lang, count(*) AS n_docs,
         |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
         |  CAST(max(end_bin) + 1 AS BIGINT) AS n_bins,
         |  CAST(sum(CASE WHEN start_bin != end_bin THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_straddling,
         |  CAST((max(end_bin) + 1) * ${Sampling.ContextLen} - sum(n_tokens)
         |    AS BIGINT) AS tail_waste_tokens
         |FROM ($p04OracleSql) GROUP BY lang ORDER BY lang""".stripMargin,
    // p21: pad-vs-pack — the padded (per-doc, PadMaxLen-budget) layout's
    // truncation/padding losses against p04's packed layout, per language
    "p21_padding_audit" -> {
      val pl = Sampling.PadMaxLen
      val cl = Sampling.ContextLen
      s"""WITH pk AS ($p04OracleSql),
         |pb AS (SELECT lang, CAST(max(end_bin) + 1 AS BIGINT) AS n_bins
         |       FROM pk GROUP BY lang),
         |ag AS (SELECT lang, count(*) AS n_docs,
         |         CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
         |         CAST(SUM(LEAST(n_tokens, $pl)) AS BIGINT) AS kept,
         |         CAST(SUM(GREATEST(n_tokens - $pl, 0)) AS BIGINT)
         |           AS trunc_loss_tokens,
         |         CAST(SUM(GREATEST($pl - n_tokens, 0)) AS BIGINT)
         |           AS pad_waste_tokens
         |       FROM pk GROUP BY lang)
         |SELECT ag.lang, n_docs, n_tokens, pb.n_bins AS packed_bins,
         |  CAST(pb.n_bins * $cl - n_tokens AS BIGINT) AS packed_waste_tokens,
         |  trunc_loss_tokens, pad_waste_tokens,
         |  CAST(n_tokens AS DOUBLE) / (pb.n_bins * $cl) AS packed_util,
         |  CAST(kept AS DOUBLE) / (n_docs * $pl) AS padded_util
         |FROM ag JOIN pb USING (lang) ORDER BY ag.lang""".stripMargin
    },
    "p05_decontamination" -> p05OracleSql,
    // p18: p05 with the sides swapped — the train docs overlapping the
    // (df-capped) eval shingle set are dropped; survivors emitted
    "p18_train_decontaminate" ->
      s"""WITH $shingleCtes,
         |sp AS (SELECT doc_id,
         |    CASE WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
         |              AS BIGINT) % 100 < 80 THEN 'train'
         |         WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
         |              AS BIGINT) % 100 < 90 THEN 'val' ELSE 'test' END AS split
         |  FROM documents),
         |traindocs AS (SELECT sh.doc_id, CAST(len(shingles) AS BIGINT)
         |      AS n_shingles
         |  FROM sh JOIN sp ON sh.doc_id = sp.doc_id WHERE split = 'train'),
         |trainpost AS (SELECT ex.doc_id, s FROM ex
         |  JOIN sp ON ex.doc_id = sp.doc_id WHERE split = 'train'),
         |evalsh AS (SELECT s FROM ex JOIN sp ON ex.doc_id = sp.doc_id
         |  WHERE split = 'test'
         |  GROUP BY s HAVING count(*) <= ${Sampling.DecontamDfCap}),
         |shared AS (SELECT tp.doc_id, count(*) AS n_shared
         |  FROM trainpost tp JOIN evalsh USING (s) GROUP BY tp.doc_id),
         |surv AS (SELECT t.doc_id, n_shingles,
         |    COALESCE(n_shared, 0) AS n_shared_eval_shingles
         |  FROM traindocs t LEFT JOIN shared USING (doc_id)
         |  WHERE NOT (n_shingles > 0
         |    AND COALESCE(n_shared, 0) * 10 >= n_shingles))
         |SELECT s.doc_id, d.lang,
         |  CAST(len(t.t) AS BIGINT) AS n_tokens,
         |  s.n_shingles, s.n_shared_eval_shingles
         |FROM surv s
         |JOIN documents d ON d.doc_id = s.doc_id
         |JOIN toks t ON t.doc_id = s.doc_id
         |ORDER BY s.doc_id""".stripMargin,
    // p19: DSIR — hashed-unigram bucket log-ratio classes via HUGEINT
    // cross-multiplication (mirrors the engine's DECIMAL(38,0) products)
    "p19_dsir_weighting" -> {
      val B = Sampling.DsirBuckets
      val K = Sampling.DsirMaxClass
      val cases = (-K + 1 to K).reverse.map { k =>
        val lhs = s"CAST(t + 1 AS HUGEINT) * (rTot + $B) * ${1L << math.max(0, -k)}"
        val rhs = s"CAST(r + 1 AS HUGEINT) * (tTot + $B) * ${1L << math.max(0, k)}"
        s"WHEN $lhs >= $rhs THEN $k"
      }.mkString("\n         |         ")
      s"""WITH $toksCte,
         |tk AS (SELECT doc_id, lang,
         |    CAST('0x' || substr(md5(tok), 1, 8) AS BIGINT) % $B AS bucket
         |  FROM (SELECT t2.doc_id, d.lang, unnest(t2.t) AS tok
         |        FROM toks t2 JOIN documents d ON d.doc_id = t2.doc_id)),
         |b AS (SELECT bucket, count(*) AS r,
         |    CAST(sum(CASE WHEN lang = '${Sampling.DsirTargetLang}'
         |         THEN 1 ELSE 0 END) AS BIGINT) AS t
         |  FROM tk GROUP BY bucket),
         |tot AS (SELECT sum(r) AS rTot, sum(t) AS tTot FROM b),
         |cl AS (SELECT bucket,
         |    CASE $cases
         |         ELSE ${-K} END AS cls
         |  FROM b CROSS JOIN tot)
         |SELECT tk.doc_id, tk.lang,
         |  CAST(count(*) AS BIGINT) AS n_tokens,
         |  CAST(sum(cls) AS BIGINT) AS dsir_points,
         |  CAST(CASE WHEN sum(cls) > 0 THEN 1 ELSE 0 END AS INT) AS keep,
         |  CAST(sum(cls) AS DOUBLE) / count(*) AS mean_class
         |FROM tk JOIN cl USING (bucket)
         |GROUP BY tk.doc_id, tk.lang ORDER BY tk.doc_id""".stripMargin
    },
    // p20: snapshot diff — t04's canonical-md5 fingerprint on both sides,
    // one full-outer join classifies every document
    "p20_snapshot_diff" ->
      s"""WITH d AS (SELECT doc_id, doc_id % 10 AS slot,
         |    regexp_replace(lower(trim(coalesce(text, ''))), '\\s+', ' ', 'g')
         |      AS c
         |  FROM documents),
         |prev AS (SELECT doc_id,
         |    md5(CASE WHEN slot = ${Sampling.DiffEditedSlot}
         |        THEN c || '~edit' ELSE c END) AS fp_prev
         |  FROM d WHERE slot <> ${Sampling.DiffAddedSlot}),
         |curr AS (SELECT doc_id, md5(c) AS fp_curr
         |  FROM d WHERE slot <> ${Sampling.DiffRemovedSlot})
         |SELECT coalesce(prev.doc_id, curr.doc_id) AS doc_id,
         |  CASE WHEN fp_prev IS NULL THEN 'added'
         |       WHEN fp_curr IS NULL THEN 'removed'
         |       WHEN fp_prev <> fp_curr THEN 'changed'
         |       ELSE 'retained' END AS status
         |FROM prev FULL JOIN curr ON prev.doc_id = curr.doc_id
         |ORDER BY doc_id""".stripMargin,
    "p06_token_budget_sample" ->
      s"""WITH tk AS (SELECT doc_id, lang,
         |    CAST(len(string_split_regex(lower(trim(text)), '\\s+')) AS BIGINT)
         |      AS n_tokens,
         |    md5(CAST(doc_id AS VARCHAR)) AS h
         |  FROM documents),
         |c AS (SELECT doc_id, lang, n_tokens,
         |    CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY lang
         |      ORDER BY h, doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
         |      AS cum_before
         |  FROM tk)
         |SELECT lang, count(*) AS n_docs,
         |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens_total,
         |  min(doc_id) AS first_doc
         |FROM c WHERE cum_before < ${Sampling.TokenBudget}
         |GROUP BY lang ORDER BY lang""".stripMargin,
    "p07_domain_mixture" -> {
      val targets = Sampling.MixTargetsPpm
        .map { case (l, p) => s"('$l', CAST($p AS BIGINT))" }.mkString(", ")
      s"""WITH t(lang, t_ppm) AS (SELECT * FROM (VALUES $targets)),
         |d AS (SELECT doc_id, lang, md5(CAST(doc_id AS VARCHAR)) AS h
         |      FROM documents),
         |cnt AS (SELECT lang, COUNT(*) AS n_docs FROM d GROUP BY lang),
         |ct AS (SELECT cnt.lang, n_docs, t_ppm
         |       FROM cnt JOIN t ON cnt.lang = t.lang),
         |sc AS (SELECT MIN(n_docs * 1000000 // t_ppm) AS scale FROM ct),
         |want AS (SELECT lang, n_docs, t_ppm,
         |           scale * t_ppm // 1000000 AS want FROM ct, sc),
         |rk AS (SELECT doc_id, d.lang,
         |         ROW_NUMBER() OVER (PARTITION BY d.lang
         |           ORDER BY h, doc_id) AS rk
         |       FROM d),
         |kept AS (SELECT rk.lang, COUNT(*) AS n_kept,
         |           MIN(doc_id) AS first_doc
         |         FROM rk JOIN want ON rk.lang = want.lang
         |         WHERE rk <= want GROUP BY rk.lang),
         |tot AS (SELECT CAST(SUM(n_kept) AS BIGINT) AS total_kept FROM kept)
         |SELECT want.lang, n_docs, t_ppm AS target_ppm, n_kept, first_doc,
         |  n_kept * 1000000 // total_kept AS achieved_ppm
         |FROM want JOIN kept ON want.lang = kept.lang, tot
         |ORDER BY want.lang""".stripMargin
    },
    "p08_cluster_split" ->
      s"""WITH RECURSIVE $closureCtes,
         |lab AS (SELECT d.doc_id, coalesce(cl.cluster, d.doc_id) AS cluster
         |        FROM documents d LEFT JOIN cl USING (doc_id)),
         |b AS (SELECT doc_id, cluster,
         |        CAST('0x' || substr(md5(CAST(cluster AS VARCHAR)), 1, 8)
         |          AS BIGINT) % 100 AS bucket
         |      FROM lab)
         |SELECT CASE WHEN bucket < 80 THEN 'train'
         |            WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split,
         |  COUNT(*) AS n_docs, COUNT(DISTINCT cluster) AS n_clusters,
         |  MIN(doc_id) AS first_doc
         |FROM b GROUP BY 1 ORDER BY split""".stripMargin,
    "t01_text_langid" -> {
      val values = TextAnalysis.markers
        .map { case (l, w) => s"('$l','$w')" }.mkString(",")
      s"""WITH $toksCte,
         |tok AS (SELECT doc_id, unnest(t) AS tok FROM toks),
         |m(lang, word) AS (VALUES $values),
         |hits AS (SELECT doc_id, lang, count(*) AS score
         |         FROM tok JOIN m ON tok = word GROUP BY doc_id, lang),
         |grid AS (SELECT d.doc_id, l.lang FROM documents d
         |         CROSS JOIN (SELECT DISTINCT lang FROM m) l),
         |scored AS (SELECT g.doc_id, g.lang, coalesce(h.score, 0) AS score
         |           FROM grid g LEFT JOIN hits h
         |             ON g.doc_id = h.doc_id AND g.lang = h.lang),
         |r AS (SELECT doc_id, lang, score,
         |        ROW_NUMBER() OVER (PARTITION BY doc_id
         |          ORDER BY score DESC, lang) AS rn FROM scored)
         |SELECT doc_id, lang AS pred_lang, score FROM r WHERE rn = 1
         |ORDER BY doc_id""".stripMargin
    },
    "t02_text_quality" -> {
      val stops = TextAnalysis.stopwordsEn.map(w => s"'$w'").mkString(",")
      s"""WITH $toksCte,
         |tok AS (SELECT doc_id, unnest(t) AS tok FROM toks),
         |st AS (SELECT doc_id, count(*) AS n_tokens,
         |         count(DISTINCT tok) AS n_distinct,
         |         CAST(sum(length(tok)) AS BIGINT) AS token_chars,
         |         CAST(sum(CASE WHEN tok IN ($stops) THEN 1 ELSE 0 END) AS BIGINT) AS stop_hits
         |       FROM tok GROUP BY doc_id)
         |SELECT d.doc_id, CAST(length(d.text) AS INT) AS n_chars, n_tokens, n_distinct,
         |  CAST(token_chars AS DOUBLE) / n_tokens AS avg_token_len,
         |  CAST(n_distinct AS DOUBLE) / n_tokens AS type_token_ratio,
         |  CAST(stop_hits AS DOUBLE) / n_tokens AS stopword_ratio,
         |  0.5 * (CAST(n_distinct AS DOUBLE) / n_tokens)
         |    + 0.3 * least(1.0, CAST(n_tokens AS DOUBLE) / 100.0)
         |    + 0.2 * (CAST(stop_hits AS DOUBLE) / n_tokens) AS quality_score
         |FROM documents d JOIN st ON d.doc_id = st.doc_id
         |ORDER BY d.doc_id""".stripMargin
    },
    // p09: stage thresholds are double literals over t02's hash-proven
    // identical quality doubles; token budget exact BIGINT, score range
    // via min/max (order-independent), never a float sum
    "p09_curriculum" -> {
      val stops = TextAnalysis.stopwordsEn.map(w => s"'$w'").mkString(",")
      s"""WITH $toksCte,
         |tok AS (SELECT doc_id, unnest(t) AS tok FROM toks),
         |st AS (SELECT doc_id, count(*) AS n_tokens,
         |         count(DISTINCT tok) AS n_distinct,
         |         CAST(sum(CASE WHEN tok IN ($stops) THEN 1 ELSE 0 END) AS BIGINT) AS stop_hits
         |       FROM tok GROUP BY doc_id),
         |q AS (SELECT doc_id, n_tokens,
         |        0.5 * (CAST(n_distinct AS DOUBLE) / n_tokens)
         |          + 0.3 * least(1.0, CAST(n_tokens AS DOUBLE) / 100.0)
         |          + 0.2 * (CAST(stop_hits AS DOUBLE) / n_tokens) AS score
         |      FROM st),
         |b AS (SELECT n_tokens, score,
         |        CASE WHEN score >= 0.43 THEN 's3_high'
         |             WHEN score >= 0.41 THEN 's2_mid'
         |             ELSE 's1_low' END AS stage FROM q)
         |SELECT stage, count(*) AS n_docs,
         |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
         |  min(score) AS min_score, max(score) AS max_score
         |FROM b GROUP BY stage ORDER BY stage""".stripMargin
    },
    "p11_repeat_factor" ->
      s"""WITH $toksCte,
         |a AS (SELECT d.source,
         |        CAST(sum(len(t.t)) AS BIGINT) AS avail_tokens
         |      FROM documents d JOIN toks t USING (doc_id)
         |      GROUP BY d.source),
         |tt AS (SELECT CAST(sum(avail_tokens) AS BIGINT) AS total_tokens,
         |         count(*) AS n_sources FROM a),
         |p AS (SELECT source, avail_tokens,
         |        CAST(total_tokens * ${Sampling.RepeatBudgetMultiple}
         |          // n_sources AS BIGINT) AS target_tokens
         |      FROM a, tt),
         |e AS (SELECT source, avail_tokens, target_tokens,
         |        CAST(least((target_tokens + avail_tokens - 1) // avail_tokens,
         |          ${Sampling.RepeatCap}) AS BIGINT) AS epochs
         |      FROM p)
         |SELECT source, avail_tokens, target_tokens, epochs,
         |  CAST(least(target_tokens, epochs * avail_tokens) AS BIGINT)
         |    AS effective_tokens,
         |  CAST(target_tokens - least(target_tokens, epochs * avail_tokens)
         |    AS BIGINT) AS deficit_tokens
         |FROM e ORDER BY source""".stripMargin,
    "p12_epoch_shuffle" ->
      s"""WITH g AS (SELECT doc_id, e.epoch,
         |    md5(CAST(e.epoch AS VARCHAR) || ':' || CAST(doc_id AS VARCHAR))
         |      AS h
         |  FROM documents,
         |    (SELECT unnest([${(0 until Sampling.EpochShuffleEpochs)
        .mkString(",")}]) AS epoch) e),
         |sd AS (SELECT doc_id, epoch, h,
         |    CAST(CAST('0x' || substr(h, 1, 8) AS BIGINT)
         |      % ${Sampling.EpochShuffleShards} AS INT) AS shard FROM g)
         |SELECT epoch, shard,
         |  CAST(ROW_NUMBER() OVER (PARTITION BY epoch, shard
         |    ORDER BY h, doc_id) AS INT) AS pos,
         |  doc_id
         |FROM sd ORDER BY epoch, shard, pos""".stripMargin,
    // p13: ⌊√n⌋ of an exact integer is engine-identical (IEEE sqrt is
    // correctly rounded); every share is integer division from there
    "p13_temperature_mixture" ->
      s"""WITH $toksCte,
         |tl AS (SELECT d.lang, CAST(sum(len(t.t)) AS BIGINT) AS n_tokens
         |       FROM documents d JOIN toks t USING (doc_id)
         |       GROUP BY d.lang),
         |w AS (SELECT lang, n_tokens,
         |        CAST(floor(sqrt(CAST(n_tokens AS DOUBLE))) AS BIGINT)
         |          AS weight FROM tl),
         |tt AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
         |         CAST(sum(weight) AS BIGINT) AS total_weight FROM w)
         |SELECT lang, n_tokens, weight,
         |  (n_tokens * 1000 // total_tokens) * 1000
         |    + ((n_tokens * 1000) % total_tokens) * 1000 // total_tokens
         |    AS natural_ppm,
         |  weight * 1000000 // total_weight AS sampled_ppm,
         |  (total_tokens // total_weight) * weight
         |    + (total_tokens % total_weight) * weight // total_weight
         |    AS expected_tokens
         |FROM w, tt ORDER BY lang""".stripMargin,
    // p14: chunk count in non-negative integer arithmetic (floor ==
    // truncate, so DuckDB // and Spark div agree); one window per stride
    "p14_sliding_chunks" ->
      s"""WITH $toksCte,
         |tk AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tokens FROM toks),
         |nc AS (SELECT doc_id, n_tokens,
         |    (greatest(n_tokens - ${Sampling.ChunkLen}, 0)
         |      + ${Sampling.ChunkStride} - 1) // ${Sampling.ChunkStride} + 1
         |      AS n_chunks
         |  FROM tk),
         |c AS (SELECT doc_id, n_tokens,
         |    unnest(generate_series(0, n_chunks - 1)) AS chunk_id
         |  FROM nc)
         |SELECT doc_id, chunk_id,
         |  chunk_id * ${Sampling.ChunkStride} AS tok_start,
         |  least(chunk_id * ${Sampling.ChunkStride} + ${Sampling.ChunkLen},
         |    n_tokens) AS tok_end,
         |  least(chunk_id * ${Sampling.ChunkStride} + ${Sampling.ChunkLen},
         |    n_tokens) - chunk_id * ${Sampling.ChunkStride} AS chunk_len
         |FROM c ORDER BY doc_id, chunk_id""".stripMargin,
    // p15: the p04 layout grouped by (lang, start-bin shard)
    "p15_shard_manifest" ->
      s"""WITH p AS (SELECT * FROM ($p04OracleSql))
         |SELECT lang, start_bin // ${Sampling.BinsPerShard} AS shard_id,
         |  count(*) AS n_docs,
         |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
         |  CAST(min(start_bin) AS BIGINT) AS first_bin,
         |  CAST(max(end_bin) AS BIGINT) AS last_bin,
         |  CAST(sum(CASE WHEN end_bin // ${Sampling.BinsPerShard}
         |      > start_bin // ${Sampling.BinsPerShard} THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_straddle_out
         |FROM p GROUP BY lang, shard_id
         |ORDER BY lang, shard_id""".stripMargin,
    // p16: d16's spans applied — tokens outside every cut span re-joined
    // into the cleaned text a span-removal writer emits
    "p16_apply_cuts" -> cutsApplySqlFrom("documents"),
    // p17: near-dup-aware corpus materialization — d06 cluster keepers
    // (plus an exact-text keeper pass for shingle-less tiny docs), then
    // the p16 span-removal applier re-run over the KEPT subset (a span is
    // only cut if it still repeats among survivors)
    "p17_corpus_materialize" ->
      s"""WITH exk AS (SELECT min(doc_id) AS doc_id FROM documents
         |             GROUP BY md5(text)),
         |ck AS (SELECT doc_id FROM (
         |    WITH RECURSIVE $closureCtes
         |    SELECT d.doc_id,
         |      coalesce(cl.cluster, d.doc_id) = d.doc_id AS is_keeper
         |    FROM documents d LEFT JOIN cl USING (doc_id))
         |  WHERE is_keeper),
         |keepdocs AS (SELECT d.doc_id, d.lang, d.text
         |  FROM documents d JOIN exk USING (doc_id) JOIN ck USING (doc_id)),
         |${cutsApplyCtesAndSelect("keepdocs")}""".stripMargin,
    "t03_text_tokens" ->
      s"""WITH $toksCte
         |SELECT d.doc_id,
         |  CAST(len(t.t) AS INT) AS ws_tokens,
         |  CAST(len(regexp_extract_all(lower(d.text), '[a-z]+')) AS INT) AS alpha_tokens,
         |  CAST(len(regexp_extract_all(lower(d.text), '[a-z]{1,4}')) AS INT) AS subword_tokens,
         |  CAST(length(d.text) AS INT) AS n_chars
         |FROM documents d JOIN toks t ON d.doc_id = t.doc_id
         |ORDER BY d.doc_id""".stripMargin,
    "t04_text_fingerprint" ->
      s"""WITH $toksCte
         |SELECT d.doc_id,
         |  md5(regexp_replace(lower(trim(d.text)), '\\s+', ' ', 'g')) AS fp_full,
         |  md5(substr(regexp_replace(lower(trim(d.text)), '\\s+', ' ', 'g'), 1, 64)) AS fp_prefix64,
         |  CAST(greatest(0, len(t.t) - 2) AS INT) AS n_shingles
         |FROM documents d JOIN toks t ON d.doc_id = t.doc_id
         |ORDER BY d.doc_id""".stripMargin,
    "t05_text_repetition" ->
      s"""WITH $toksCte,
         |tok AS (SELECT doc_id, unnest(t) AS tok FROM toks),
         |tc AS (SELECT doc_id, tok, count(*) AS c FROM tok GROUP BY doc_id, tok),
         |st AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
         |         CAST(max(c) AS BIGINT) AS top_c, count(*) AS n_distinct
         |       FROM tc GROUP BY doc_id),
         |g AS (SELECT doc_id, len(t) - 1 AS n_bigrams,
         |        len(list_distinct(list_transform(generate_series(1, len(t) - 1),
         |          i -> concat_ws(' ', t[i], t[i+1])))) AS n_distinct_bigrams
         |      FROM toks)
         |SELECT st.doc_id, n_tokens,
         |  CAST(top_c AS DOUBLE) / n_tokens AS top_token_share,
         |  1.0 - CAST(n_distinct AS DOUBLE) / n_tokens AS dup_token_frac,
         |  CASE WHEN n_bigrams > 0
         |    THEN 1.0 - CAST(n_distinct_bigrams AS DOUBLE) / n_bigrams
         |    ELSE 0.0 END AS dup_bigram_frac
         |FROM st JOIN g ON st.doc_id = g.doc_id
         |ORDER BY st.doc_id""".stripMargin,
    "t06_boilerplate_ngrams" ->
      s"""WITH $shingleCtes,
         |df AS (SELECT s, count(*) AS df FROM ex GROUP BY s),
         |n AS (SELECT count(*) AS n_docs FROM documents)
         |SELECT s, df, CAST(df AS DOUBLE) / n_docs AS doc_share
         |FROM df, n
         |ORDER BY df DESC, s LIMIT ${TextAnalysis.BoilerplateTopK}""".stripMargin,
    "t07_keywords_tfdf" ->
      s"""WITH $toksCte,
         |tok AS (SELECT doc_id, unnest(t) AS tok FROM toks),
         |tf AS (SELECT doc_id, tok, count(*) AS tf FROM tok GROUP BY doc_id, tok),
         |df AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
         |r AS (SELECT tf.doc_id, tf.tok, tf.tf, df.df,
         |        CAST(ROW_NUMBER() OVER (PARTITION BY tf.doc_id
         |          ORDER BY tf.tf DESC, df.df ASC, tf.tok ASC) AS INT) AS rk
         |      FROM tf JOIN df USING (tok))
         |SELECT doc_id, rk, tok AS keyword, tf, df FROM r
         |WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin,
    "t08_filter_funnel" ->
      s"""WITH $toksCte,
         |tok AS (SELECT doc_id, unnest(t) AS tok FROM toks),
         |tc AS (SELECT doc_id, tok, count(*) AS c FROM tok GROUP BY doc_id, tok),
         |st AS (SELECT doc_id, sum(c) AS n_tokens, max(c) AS top_c,
         |         count(*) AS n_distinct
         |       FROM tc GROUP BY doc_id),
         |sig AS (SELECT (length(text) >= 200) AS b1, (n_tokens >= 50) AS b2,
         |          (2 * (n_tokens - n_distinct) <= n_tokens) AS b3,
         |          (5 * top_c <= n_tokens) AS b4
         |        FROM documents JOIN st USING (doc_id)),
         |a AS (SELECT count(*) AS s0,
         |        count(*) FILTER (WHERE b1) AS s1,
         |        count(*) FILTER (WHERE b1 AND b2) AS s2,
         |        count(*) FILTER (WHERE b1 AND b2 AND b3) AS s3,
         |        count(*) FILTER (WHERE b1 AND b2 AND b3 AND b4) AS s4
         |      FROM sig)
         |SELECT * FROM (
         |  SELECT 0 AS stage, 'total' AS stage_name, s0 AS docs_remaining FROM a
         |  UNION ALL SELECT 1, 'min_length', s1 FROM a
         |  UNION ALL SELECT 2, 'min_tokens', s2 FROM a
         |  UNION ALL SELECT 3, 'dup_token_frac', s3 FROM a
         |  UNION ALL SELECT 4, 'top_token_share', s4 FROM a)
         |ORDER BY stage""".stripMargin,
    "t09_pii_scan" -> {
      val (em, ip, ph) =
        (TextAnalysis.EmailRe, TextAnalysis.IpRe, TextAnalysis.PhoneRe)
      s"""WITH p AS (SELECT doc_id, lower(text) AS t FROM documents),
         |c AS (SELECT doc_id,
         |    CAST(len(regexp_extract_all(t, '$em')) AS BIGINT) AS n_emails,
         |    CAST(len(regexp_extract_all(t, '$ip')) AS BIGINT) AS n_ips,
         |    CAST(len(regexp_extract_all(t, '$ph')) AS BIGINT) AS n_phones,
         |    CAST(length(regexp_replace(regexp_replace(regexp_replace(t,
         |      '$em', '<EMAIL>', 'g'), '$ip', '<IP>', 'g'),
         |      '$ph', '<PHONE>', 'g')) AS INT) AS redacted_len
         |  FROM p)
         |SELECT doc_id, n_emails, n_ips, n_phones, redacted_len,
         |  (n_emails + n_ips + n_phones > 0) AS has_pii
         |FROM c ORDER BY doc_id""".stripMargin
    },
    "t10_vocab_zipf" ->
      s"""WITH $toksCte,
         |tok AS (SELECT doc_id, unnest(t) AS tok FROM toks),
         |counts AS (SELECT tok, COUNT(*) AS freq,
         |             COUNT(DISTINCT doc_id) AS df
         |           FROM tok GROUP BY tok),
         |total AS (SELECT COUNT(*) AS n_total FROM tok),
         |top AS (SELECT tok, freq, df FROM counts
         |        ORDER BY freq DESC, tok LIMIT ${TextAnalysis.VocabTopK}),
         |r AS (SELECT tok, freq, df,
         |        CAST(ROW_NUMBER() OVER (ORDER BY freq DESC, tok) AS INT)
         |          AS rank,
         |        SUM(freq) OVER (ORDER BY freq DESC, tok
         |          ROWS UNBOUNDED PRECEDING) AS cum_freq
         |      FROM top)
         |SELECT rank, tok AS token, freq, df,
         |  CAST(freq AS DOUBLE) / n_total AS corpus_share,
         |  CAST(cum_freq AS DOUBLE) / n_total AS cum_share
         |FROM r, total ORDER BY rank""".stripMargin,
    "t11_bigram_novelty" ->
      s"""WITH $toksCte,
         |bgs AS (SELECT doc_id,
         |          CASE WHEN len(t) >= 2
         |            THEN list_transform(generate_series(1, len(t) - 1),
         |                 i -> concat_ws(' ', t[i], t[i+1]))
         |            ELSE CAST([] AS VARCHAR[]) END AS bg
         |        FROM toks),
         |ex AS (SELECT doc_id, unnest(bg) AS g FROM bgs),
         |top AS (SELECT g FROM (SELECT g, count(*) AS cnt FROM ex GROUP BY g)
         |        ORDER BY cnt DESC, g LIMIT ${TextAnalysis.BigramTopK}),
         |common AS (SELECT doc_id, count(*) AS n_common
         |           FROM ex JOIN top USING (g) GROUP BY doc_id),
         |sz AS (SELECT doc_id, CAST(len(bg) AS BIGINT) AS n_bigrams FROM bgs)
         |SELECT sz.doc_id, n_bigrams,
         |  COALESCE(n_common, 0) AS n_common,
         |  CASE WHEN n_bigrams > 0
         |    THEN 1.0 - CAST(COALESCE(n_common, 0) AS DOUBLE) / n_bigrams
         |    ELSE 0.0 END AS novelty
         |FROM sz LEFT JOIN common USING (doc_id) ORDER BY sz.doc_id""".stripMargin,
    // t12: fixed power-of-4 frequency thresholds => rarity classes are
    // exact-integer comparisons in both engines; mean is one division of
    // exact integers (identical doubles both sides)
    "t12_token_surprisal" ->
      s"""WITH $toksCte,
         |ex AS (SELECT doc_id, unnest(t) AS tok FROM toks),
         |v AS (SELECT tok, count(*) AS freq FROM ex GROUP BY tok),
         |r AS (SELECT tok,
         |    CASE WHEN freq >= 1024 THEN 0 WHEN freq >= 256 THEN 1
         |         WHEN freq >= 64 THEN 2 WHEN freq >= 16 THEN 3
         |         WHEN freq >= 4 THEN 4 ELSE 5 END AS rarity FROM v)
         |SELECT e.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
         |  CAST(sum(rarity) AS BIGINT) AS rarity_sum,
         |  CAST(sum(CASE WHEN rarity = 5 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_rare,
         |  CAST(sum(rarity) AS DOUBLE) / count(*) AS mean_rarity
         |FROM ex e JOIN r USING (tok) GROUP BY e.doc_id
         |ORDER BY e.doc_id""".stripMargin,
    // t13: composes the d02 pairs chain, t02 quality formula, and t01
    // langid grid; rollup is integer-only (no float sums)
    "t13_source_profile" -> {
      val stops = TextAnalysis.stopwordsEn.map(w => s"'$w'").mkString(",")
      val values = TextAnalysis.markers
        .map { case (l, w) => s"('$l','$w')" }.mkString(",")
      s"""WITH $minhashPairCtes,
         |tok AS (SELECT doc_id, unnest(t) AS tok FROM toks),
         |st AS (SELECT doc_id, count(*) AS n_tokens,
         |         count(DISTINCT tok) AS n_distinct,
         |         CAST(sum(CASE WHEN tok IN ($stops) THEN 1 ELSE 0 END) AS BIGINT) AS stop_hits
         |       FROM tok GROUP BY doc_id),
         |q AS (SELECT doc_id, n_tokens,
         |        0.5 * (CAST(n_distinct AS DOUBLE) / n_tokens)
         |          + 0.3 * least(1.0, CAST(n_tokens AS DOUBLE) / 100.0)
         |          + 0.2 * (CAST(stop_hits AS DOUBLE) / n_tokens) AS score
         |      FROM st),
         |m(lang, word) AS (VALUES $values),
         |hits AS (SELECT doc_id, lang, count(*) AS score
         |         FROM tok JOIN m ON tok = word GROUP BY doc_id, lang),
         |grid AS (SELECT d.doc_id, l.lang FROM documents d
         |         CROSS JOIN (SELECT DISTINCT lang FROM m) l),
         |sc AS (SELECT g.doc_id, g.lang, coalesce(h.score, 0) AS score
         |       FROM grid g LEFT JOIN hits h
         |         ON g.doc_id = h.doc_id AND g.lang = h.lang),
         |lr AS (SELECT doc_id, lang, score,
         |         ROW_NUMBER() OVER (PARTITION BY doc_id
         |           ORDER BY score DESC, lang) AS rn FROM sc),
         |lid AS (SELECT doc_id, lang AS pred_lang FROM lr WHERE rn = 1),
         |dup AS (SELECT DISTINCT doc_id FROM
         |         (SELECT da AS doc_id FROM pairs
         |          UNION ALL SELECT db FROM pairs)),
         |j AS (SELECT d.source, d.lang, q.n_tokens, q.score, lid.pred_lang,
         |        dup.doc_id AS dup_id
         |      FROM documents d JOIN q USING (doc_id)
         |        JOIN lid USING (doc_id) LEFT JOIN dup USING (doc_id))
         |SELECT source, count(*) AS n_docs,
         |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
         |  CAST(sum(CASE WHEN score >= 0.43 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_high_quality,
         |  CAST(sum(CASE WHEN pred_lang != lang THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_lang_mismatch,
         |  CAST(sum(CASE WHEN dup_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_near_dup
         |FROM j GROUP BY source ORDER BY source""".stripMargin
    },
    "t14_source_overlap" ->
      s"""WITH $minhashPairCtes,
         |lab AS (SELECT least(a.source, b.source) AS source_a,
         |         greatest(a.source, b.source) AS source_b, p.jaccard
         |        FROM pairs p JOIN documents a ON p.da = a.doc_id
         |        JOIN documents b ON p.db = b.doc_id)
         |SELECT source_a, source_b, count(*) AS n_pairs,
         |  max(jaccard) AS max_jaccard
         |FROM lab GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "t15_gopher_rules" -> {
      val stops = TextAnalysis.stopwordsEn.map(w =>
        s"(CASE WHEN list_contains(t.t, '$w') THEN 1 ELSE 0 END)")
        .mkString("\n         + ")
      s"""WITH $toksCte,
         |sig AS (SELECT d.doc_id,
         |    CAST(len(t.t) AS BIGINT) AS n_tokens,
         |    CAST(list_sum(list_transform(t.t, x -> length(x))) AS BIGINT)
         |      AS token_chars,
         |    CAST(len(list_filter(t.t, x -> regexp_matches(x, '[a-z]')))
         |      AS BIGINT) AS n_alpha_words,
         |    CAST(length(d.text) - length(replace(d.text, '#', ''))
         |      + len(regexp_extract_all(d.text, '\\.\\.\\.')) AS BIGINT)
         |      AS n_symbols,
         |    CAST(len(string_split(d.text, chr(10))) AS BIGINT) AS n_lines,
         |    CAST(len(list_filter(string_split(d.text, chr(10)),
         |      l -> substr(ltrim(l), 1, 2) = '- '
         |        OR substr(ltrim(l), 1, 2) = '* ')) AS BIGINT)
         |      AS n_bullet_lines,
         |    CAST(len(list_filter(string_split(d.text, chr(10)),
         |      l -> regexp_matches(rtrim(l), '\\.\\.\\.$$'))) AS BIGINT)
         |      AS n_ellipsis_lines,
         |    CAST($stops AS BIGINT) AS n_stop_hits
         |  FROM documents d JOIN toks t USING (doc_id)),
         |fl AS (SELECT *,
         |    (n_tokens >= 50 AND n_tokens <= 100000) AS f_word_count,
         |    (3*n_tokens <= token_chars AND token_chars <= 10*n_tokens)
         |      AS f_mean_word_len,
         |    (10*n_symbols <= n_tokens) AS f_symbol_ratio,
         |    (10*n_bullet_lines <= 9*n_lines) AS f_bullet_ratio,
         |    (10*n_ellipsis_lines <= 3*n_lines) AS f_ellipsis_ratio,
         |    (5*n_alpha_words >= 4*n_tokens) AS f_alpha_ratio,
         |    (n_stop_hits >= 2) AS f_stopwords
         |  FROM sig)
         |SELECT *, (f_word_count AND f_mean_word_len AND f_symbol_ratio
         |    AND f_bullet_ratio AND f_ellipsis_ratio AND f_alpha_ratio
         |    AND f_stopwords) AS pass_gopher
         |FROM fl ORDER BY doc_id""".stripMargin
    },
    "t16_code_detect" -> {
      val kws = TextAnalysis.CodeKeywords.map(k => s"'$k'").mkString(", ")
      s"""WITH $toksCte,
         |sig AS (SELECT d.doc_id,
         |    CAST(length(d.text) AS BIGINT) AS n_chars,
         |    CAST(length(d.text)
         |      - length(translate(d.text, '{}()[];=', '')) AS BIGINT)
         |      AS n_code_chars,
         |    CAST(len(string_split(d.text, chr(10))) AS BIGINT) AS n_lines,
         |    CAST(len(list_filter(string_split(d.text, chr(10)),
         |      l -> regexp_matches(rtrim(l), '[;{]$$'))) AS BIGINT)
         |      AS n_stmt_lines,
         |    CAST(len(list_filter(string_split(d.text, chr(10)),
         |      l -> regexp_matches(l, '^(\\t|  )'))) AS BIGINT)
         |      AS n_indent_lines,
         |    CAST(len(t.t) AS BIGINT) AS n_tokens,
         |    CAST(len(list_filter(t.t, x -> x IN ($kws))) AS BIGINT)
         |      AS n_kw_hits
         |  FROM documents d JOIN toks t USING (doc_id))
         |SELECT *,
         |  (20*n_code_chars >= n_chars
         |    OR (n_lines >= 3 AND 2*n_stmt_lines >= n_lines)
         |    OR (n_lines >= 3 AND 2*n_indent_lines >= n_lines)
         |    OR (n_kw_hits >= 3 AND 10*n_kw_hits >= n_tokens)) AS is_code
         |FROM sig ORDER BY doc_id""".stripMargin
    },
    // t17: same left-associated double arithmetic as the operator so the
    // float score hash-matches; sentences floored at 1
    "t17_readability" ->
      s"""WITH $toksCte
         |SELECT d.doc_id,
         |  CAST(len(t.t) AS BIGINT) AS n_words,
         |  greatest(1, CAST(len(regexp_extract_all(d.text, '[.!?]+'))
         |    AS BIGINT)) AS n_sentences,
         |  CAST(len(regexp_extract_all(lower(d.text), '[aeiou]+'))
         |    AS BIGINT) AS n_syllables,
         |  206.835
         |    - 1.015 * (CAST(len(t.t) AS DOUBLE)
         |      / greatest(1, CAST(len(regexp_extract_all(d.text, '[.!?]+'))
         |          AS BIGINT)))
         |    - 84.6 * (CAST(len(regexp_extract_all(lower(d.text), '[aeiou]+'))
         |          AS DOUBLE)
         |      / CAST(len(t.t) AS BIGINT)) AS flesch
         |FROM documents d JOIN toks t USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin,
    // t18: quantized bigram cross-entropy — class k = min{k : c2·2^k ≥ c1}
    // as an integer CASE cascade (no float log on either engine)
    "t18_bigram_xent" -> {
      val cases = (0 until TextAnalysis.XentMaxClass)
        .map(k => s"WHEN c2 * ${1L << k} >= c1 THEN $k")
        .mkString("\n         |         ")
      s"""WITH $toksCte,
         |bg AS (SELECT doc_id, unnest(CASE WHEN len(t) >= 2
         |    THEN list_transform(generate_series(1, len(t) - 1),
         |      i -> t[i] || ' ' || t[i + 1])
         |    ELSE [] END) AS g
         |  FROM toks),
         |m2 AS (SELECT g, count(*) AS c2, split_part(g, ' ', 1) AS w1
         |       FROM bg GROUP BY g),
         |m1 AS (SELECT w1, sum(c2) AS c1 FROM m2 GROUP BY w1),
         |cl AS (SELECT g,
         |    CASE $cases
         |         ELSE ${TextAnalysis.XentMaxClass} END AS xent
         |  FROM m2 JOIN m1 USING (w1))
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_transitions,
         |  CAST(sum(xent) AS BIGINT) AS xent_sum,
         |  CAST(sum(CASE WHEN xent = ${TextAnalysis.XentMaxClass}
         |       THEN 1 ELSE 0 END) AS BIGINT) AS n_tail,
         |  CAST(sum(xent) AS DOUBLE) / count(*) AS mean_xent
         |FROM bg JOIN cl USING (g)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin
    },
    // t19: count-min sketch — md5 row-hashes make even the sketch
    // estimates engine-exact (unlike q12b's HLL gate)
    "t19_cms_heavy_hitters" -> {
      val d = TextAnalysis.CmsDepth
      val w = TextAnalysis.CmsWidth
      val bucket = "CAST('0x' || substr(md5(CAST(i AS VARCHAR) || ':' || tok), " +
        s"1, 8) AS BIGINT) % $w"
      s"""WITH $toksCte,
         |ex AS (SELECT unnest(t) AS tok FROM toks),
         |hs AS (SELECT tok, i, $bucket AS bucket
         |       FROM ex CROSS JOIN (SELECT unnest(generate_series(0, ${d - 1}))
         |                           AS i)),
         |sk AS (SELECT i AS row, bucket, count(*) AS cnt
         |       FROM hs GROUP BY i, bucket),
         |top AS (SELECT tok, count(*) AS freq FROM ex GROUP BY tok
         |        ORDER BY freq DESC, tok LIMIT ${TextAnalysis.VocabTopK}),
         |probes AS (SELECT tok, freq, i AS row, $bucket AS bucket
         |           FROM top CROSS JOIN (SELECT
         |             unnest(generate_series(0, ${d - 1})) AS i)),
         |est AS (SELECT tok, freq, min(cnt) AS cms_est
         |        FROM probes JOIN sk USING (row, bucket)
         |        GROUP BY tok, freq)
         |SELECT CAST(ROW_NUMBER() OVER (ORDER BY freq DESC, tok) AS INT)
         |    AS rank,
         |  tok AS token, freq, cms_est, cms_est - freq AS overestimate
         |FROM est ORDER BY rank""".stripMargin
    },
    // t20: byte-hygiene scan — length-difference counting for the
    // single-char artifact classes, occurrence counting for the two-char
    // mojibake signatures; \x{...} escapes for Java<->RE2 parity
    "t20_encoding_scan" ->
      """SELECT doc_id,
        |  CAST(length(text) - length(regexp_replace(text,
        |    '\x{FFFD}', '', 'g')) AS BIGINT) AS n_replacement,
        |  CAST(length(text) - length(regexp_replace(text,
        |    '[\x{0080}-\x{009F}]', '', 'g')) AS BIGINT) AS n_c1_controls,
        |  CAST(length(text) - length(regexp_replace(text,
        |    '[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]', '', 'g')) AS BIGINT)
        |    AS n_ctrl_chars,
        |  CAST(len(regexp_extract_all(text,
        |    '([\x{00C3}\x{00C2}][\x{0080}-\x{00BF}]|\x{00E2}\x{20AC})'))
        |    AS BIGINT) AS n_mojibake_sigs,
        |  (length(text) - length(regexp_replace(text,
        |     '\x{FFFD}', '', 'g')) = 0
        |   AND length(text) - length(regexp_replace(text,
        |     '[\x{0080}-\x{009F}]', '', 'g')) = 0
        |   AND length(text) - length(regexp_replace(text,
        |     '[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]', '', 'g')) = 0
        |   AND len(regexp_extract_all(text,
        |     '([\x{00C3}\x{00C2}][\x{0080}-\x{00BF}]|\x{00E2}\x{20AC})')) = 0)
        |    AS is_clean
        |FROM documents ORDER BY doc_id""".stripMargin,
    // Geometry contract with the asset synthesizer (Multimodal.assets):
    // even doc_id -> 24-bpp BMP, w = 4*(len%3+1), h = len // (3w), decoded
    // pixel array = first 3wh text bytes; odd doc_id -> 16-bit mono WAV,
    // decoded sample bytes = first len - len%2 text bytes. The engine
    // PARSES these fields back out of real container headers; the oracle
    // recomputes them from the formulas -- `declen` is the decoded length.
    "m01_media_meta" ->
      """WITH d AS (SELECT doc_id, CAST(length(text) AS INT) AS len,
        |    CAST(4 * (length(text) % 3 + 1) AS INT) AS w FROM documents),
        |e AS (SELECT doc_id, len, w, CAST(len // (3*w) AS INT) AS h,
        |    CAST(CASE WHEN doc_id % 2 = 0 THEN 3*w*(len // (3*w))
        |         ELSE len - len % 2 END AS INT) AS declen FROM d)
        |SELECT doc_id,
        |  CASE WHEN doc_id % 2 = 0 THEN 'bmp' ELSE 'wav' END AS fmt,
        |  CAST(CASE WHEN doc_id % 2 = 0 THEN 54 ELSE 44 END + declen AS INT)
        |    AS byte_len,
        |  CAST(CASE WHEN doc_id % 2 = 0 THEN w ELSE 0 END AS INT) AS width,
        |  CAST(CASE WHEN doc_id % 2 = 0 THEN h ELSE 0 END AS INT) AS height,
        |  CAST(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE declen // 2 END AS INT)
        |    AS n_frames,
        |  CAST(CASE WHEN doc_id % 2 = 0 THEN 0 ELSE 8000 END AS INT)
        |    AS sample_rate,
        |  CAST(CASE WHEN doc_id % 2 = 0 THEN 0 ELSE 1 END AS INT) AS channels
        |FROM e ORDER BY doc_id""".stripMargin,
    // ASCII corpus + truncate-not-pad geometry => decoded byte i == ord of
    // text character i+1 on both sides, for the first `declen` bytes
    "m02_media_resize" ->
      """WITH e AS (SELECT doc_id, text,
        |    CAST(CASE WHEN doc_id % 2 = 0
        |      THEN 12*(length(text) % 3 + 1)
        |        * (length(text) // (12*(length(text) % 3 + 1)))
        |      ELSE length(text) - length(text) % 2 END AS INT) AS declen
        |  FROM documents)
        |SELECT doc_id, CAST(64 AS INT) AS size,
        |  to_json(list_transform(generate_series(0, 63),
        |    i -> ord(substr(text, CAST((i * declen) // 64 AS INT) + 1, 1))))
        |    AS pixels_json
        |FROM e ORDER BY doc_id""".stripMargin,
    "m03_frame_sample" ->
      """WITH e AS (SELECT doc_id, text,
        |    CAST(CASE WHEN doc_id % 2 = 0
        |      THEN 12*(length(text) % 3 + 1)
        |        * (length(text) // (12*(length(text) % 3 + 1)))
        |      ELSE length(text) - length(text) % 2 END AS INT) AS declen
        |  FROM documents),
        |f AS (SELECT doc_id, text,
        |    unnest(generate_series(0, declen - 1, 10)) AS off FROM e)
        |SELECT doc_id, CAST(off AS INT) AS frame_offset,
        |  ord(substr(text, CAST(off AS INT) + 1, 1)) AS frame_byte
        |FROM f ORDER BY doc_id, frame_offset""".stripMargin,
    "m04_media_histogram" -> {
      val sums = (0 until 16).map(b =>
        s"CAST(sum(CASE WHEN bin = $b THEN 1 ELSE 0 END) AS BIGINT) AS b$b")
        .mkString(",\n  ")
      val arr = (0 until 16).map(b => s"b$b").mkString("[", ", ", "]")
      s"""WITH e AS (SELECT doc_id, text,
         |    CAST(CASE WHEN doc_id % 2 = 0
         |      THEN 12*(length(text) % 3 + 1)
         |        * (length(text) // (12*(length(text) % 3 + 1)))
         |      ELSE length(text) - length(text) % 2 END AS INT) AS declen
         |  FROM documents),
         |c AS (SELECT doc_id, text, declen AS len,
         |    unnest(generate_series(1, declen)) AS i FROM e),
         |b AS (SELECT doc_id, len,
         |    ord(substr(text, CAST(i AS INT), 1)) // 16 AS bin FROM c),
         |h AS (SELECT doc_id, len,
         |  $sums
         |FROM b GROUP BY doc_id, len)
         |SELECT doc_id, len, to_json($arr) AS hist_counts_json
         |FROM h ORDER BY doc_id""".stripMargin
    },
    "m05_perceptual_hash" ->
      """WITH e AS (SELECT doc_id, text,
        |    CAST(CASE WHEN doc_id % 2 = 0
        |      THEN 12*(length(text) % 3 + 1)
        |        * (length(text) // (12*(length(text) % 3 + 1)))
        |      ELSE length(text) - length(text) % 2 END AS INT) AS declen
        |  FROM documents),
        |px AS (SELECT doc_id,
        |    list_transform(generate_series(0, 63),
        |      i -> ord(substr(text, CAST((i * declen) // 64 AS INT) + 1, 1)))
        |      AS pixels
        |  FROM e),
        |s AS (SELECT doc_id, pixels, list_sum(pixels) AS st FROM px),
        |h AS (SELECT doc_id,
        |    array_to_string(list_transform(pixels,
        |      p -> CASE WHEN p * 64 > st THEN '1' ELSE '0' END), '') AS ahash
        |  FROM s)
        |SELECT min(doc_id) AS rep_id, count(*) AS n_assets, ahash
        |FROM h GROUP BY ahash ORDER BY rep_id""".stripMargin,
    // gaps-and-islands: pos - per-(doc, byte) rank is constant within a
    // run; argmax = longest run, ties to smallest byte then earliest pos
    "m06_still_segments" ->
      """WITH e AS (SELECT doc_id, text,
        |    CAST(CASE WHEN doc_id % 2 = 0
        |      THEN 12*(length(text) % 3 + 1)
        |        * (length(text) // (12*(length(text) % 3 + 1)))
        |      ELSE length(text) - length(text) % 2 END AS INT) AS declen
        |  FROM documents),
        |c AS (SELECT doc_id,
        |    unnest(generate_series(1, declen)) AS i, text
        |  FROM e),
        |b AS (SELECT doc_id, CAST(i - 1 AS INT) AS pos,
        |        ord(substr(text, CAST(i AS INT), 1)) AS v FROM c),
        |g AS (SELECT doc_id, pos, v,
        |        pos - ROW_NUMBER() OVER (PARTITION BY doc_id, v
        |          ORDER BY pos) AS grp
        |      FROM b),
        |runs AS (SELECT doc_id, v, grp, COUNT(*) AS run_len,
        |           CAST(MIN(pos) AS INT) AS run_start
        |         FROM g GROUP BY doc_id, v, grp),
        |best AS (SELECT doc_id, run_len, v, run_start,
        |           ROW_NUMBER() OVER (PARTITION BY doc_id
        |             ORDER BY run_len DESC, v, run_start) AS rn
        |         FROM runs),
        |cnt AS (SELECT doc_id, COUNT(*) AS n_runs FROM runs GROUP BY doc_id)
        |SELECT best.doc_id, n_runs, run_len AS max_run_len,
        |  v AS max_run_byte, run_start AS max_run_start
        |FROM best JOIN cnt USING (doc_id) WHERE rn = 1
        |ORDER BY best.doc_id""".stripMargin,
    // m07: signed int16 reassembly from the decoded WAV byte stream; all
    // outputs exact integers (sum of squares as BIGINT), so the compare
    // is bit-exact. ASCII corpus => hi byte <= 127, samples never reach
    // full scale: n_clipped = 0 is a REAL assertion of the clip detector.
    "m07_audio_stats" ->
      """WITH e AS (SELECT doc_id, text,
        |    CAST(length(text) - length(text) % 2 AS INT) AS declen
        |  FROM documents WHERE doc_id % 2 = 1),
        |sm AS (SELECT doc_id, declen, text,
        |    unnest(generate_series(0, declen // 2 - 1)) AS i FROM e),
        |v AS (SELECT doc_id, declen,
        |    ord(substr(text, CAST(2*i+1 AS INT), 1))
        |      + 256 * ord(substr(text, CAST(2*i+2 AS INT), 1)) AS raw
        |  FROM sm),
        |w AS (SELECT doc_id, declen,
        |    CASE WHEN raw > 32767 THEN raw - 65536 ELSE raw END AS s FROM v)
        |SELECT doc_id, CAST(declen // 2 AS INT) AS n_samples,
        |  CAST(max(abs(s)) AS INT) AS peak_abs,
        |  CAST(sum(CASE WHEN s = 32767 OR s = -32768 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_clipped,
        |  CAST(sum(CAST(s AS BIGINT) * s) AS BIGINT) AS sum_sq
        |FROM w GROUP BY doc_id, declen ORDER BY doc_id""".stripMargin,
    // m10: the m07 chain with the sample index carried through, split by
    // i % factor into kept (decimated stream) vs dropped energy
    "m10_audio_decimate" ->
      s"""WITH e AS (SELECT doc_id, text,
         |    CAST(length(text) - length(text) % 2 AS INT) AS declen
         |  FROM documents WHERE doc_id % 2 = 1),
         |sm AS (SELECT doc_id, declen, text,
         |    unnest(generate_series(0, declen // 2 - 1)) AS i FROM e),
         |v AS (SELECT doc_id, declen, i,
         |    ord(substr(text, CAST(2*i+1 AS INT), 1))
         |      + 256 * ord(substr(text, CAST(2*i+2 AS INT), 1)) AS raw
         |  FROM sm),
         |w AS (SELECT doc_id, declen, i,
         |    CASE WHEN raw > 32767 THEN raw - 65536 ELSE raw END AS s FROM v)
         |SELECT doc_id, CAST(declen // 2 AS INT) AS n_samples_in,
         |  CAST(sum(CASE WHEN i % ${Multimodal.DecimationFactor} = 0
         |    THEN 1 ELSE 0 END) AS INT) AS n_samples_out,
         |  CAST(max(CASE WHEN i % ${Multimodal.DecimationFactor} = 0
         |    THEN abs(s) ELSE 0 END) AS INT) AS peak_out,
         |  CAST(sum(CASE WHEN i % ${Multimodal.DecimationFactor} = 0
         |    THEN CAST(s AS BIGINT) * s ELSE 0 END) AS BIGINT) AS sum_sq_out,
         |  CAST(sum(CASE WHEN i % ${Multimodal.DecimationFactor} <> 0
         |    THEN CAST(s AS BIGINT) * s ELSE 0 END) AS BIGINT)
         |    AS sum_sq_dropped
         |FROM w GROUP BY doc_id, declen ORDER BY doc_id""".stripMargin,
    // m11/m12: the s15+s16 IVF-PQ retrieval chain replayed over the
    // m04 histogram features of the BMP assets (vec_id = doc_id/2),
    // querying the images whose m05 aHash has an exact duplicate;
    // m12 audits the index answers against that truth pair by pair
    "m11_visual_ann" -> m11Sql,
    "m12_visual_dup_recall" -> m12Sql,
    // m13/m14: the same s15+s16 chain replayed over the WAV byte
    // histograms, standard query roles; m14 audits it against the exact
    // brute-force cosine truth on the same features
    "m13_audio_ann" -> m13Sql,
    "m14_audio_ann_recall" -> m14Sql,
    // m08: 2x2 quadrant sums over the row-major decoded pixel array;
    // quadrant = integer index arithmetic, sums exact BIGINTs
    "m08_image_patches" ->
      """WITH d AS (SELECT doc_id, text, CAST(length(text) AS INT) AS len,
        |    CAST(4 * (length(text) % 3 + 1) AS INT) AS w
        |  FROM documents WHERE doc_id % 2 = 0),
        |e AS (SELECT doc_id, text, w, CAST(len // (3*w) AS INT) AS h,
        |    CAST(3*w*(len // (3*w)) AS INT) AS declen FROM d),
        |px AS (SELECT doc_id, w, h, text,
        |    unnest(generate_series(0, declen - 1)) AS i FROM e),
        |q AS (SELECT doc_id, w, h,
        |    CASE WHEN 2*(i // (3*w)) >= h THEN 2 ELSE 0 END
        |      + CASE WHEN 2*(i % (3*w)) >= 3*w THEN 1 ELSE 0 END AS quad,
        |    ord(substr(text, CAST(i + 1 AS INT), 1)) AS v
        |  FROM px),
        |g AS (SELECT doc_id, w, h,
        |    CAST(sum(CASE WHEN quad = 0 THEN v ELSE 0 END) AS BIGINT) AS q0,
        |    CAST(sum(CASE WHEN quad = 1 THEN v ELSE 0 END) AS BIGINT) AS q1,
        |    CAST(sum(CASE WHEN quad = 2 THEN v ELSE 0 END) AS BIGINT) AS q2,
        |    CAST(sum(CASE WHEN quad = 3 THEN v ELSE 0 END) AS BIGINT) AS q3
        |  FROM q GROUP BY doc_id, w, h)
        |SELECT doc_id, w AS width, h AS height,
        |  to_json([q0, q1, q2, q3]) AS quadrant_sums_json
        |FROM g ORDER BY doc_id""".stripMargin,
    // m09: BMP pixels are interleaved B,G,R in file order -> channel is
    // (i-1) % 3 over 1-based byte positions; all sums exact BIGINTs, the
    // three means are single divisions of those sums at the boundary
    "m09_channel_stats" ->
      """WITH d AS (SELECT doc_id, text, CAST(length(text) AS INT) AS len,
        |    CAST(4 * (length(text) % 3 + 1) AS INT) AS w
        |  FROM documents WHERE doc_id % 2 = 0),
        |e AS (SELECT doc_id, text,
        |    CAST(3*w*(len // (3*w)) AS INT) AS declen FROM d),
        |c AS (SELECT doc_id, declen, text,
        |    unnest(generate_series(1, declen)) AS i FROM e),
        |v AS (SELECT doc_id, declen, (i - 1) % 3 AS ch,
        |    ord(substr(text, CAST(i AS INT), 1)) AS v FROM c),
        |g AS (SELECT doc_id, CAST(declen // 3 AS INT) AS n_px,
        |    CAST(sum(CASE WHEN ch = 0 THEN v ELSE 0 END) AS BIGINT) AS sum_b,
        |    CAST(sum(CASE WHEN ch = 1 THEN v ELSE 0 END) AS BIGINT) AS sum_g,
        |    CAST(sum(CASE WHEN ch = 2 THEN v ELSE 0 END) AS BIGINT) AS sum_r,
        |    CAST(sum(CASE WHEN ch = 0 THEN v*v ELSE 0 END) AS BIGINT) AS sq_b,
        |    CAST(sum(CASE WHEN ch = 1 THEN v*v ELSE 0 END) AS BIGINT) AS sq_g,
        |    CAST(sum(CASE WHEN ch = 2 THEN v*v ELSE 0 END) AS BIGINT) AS sq_r
        |  FROM v GROUP BY doc_id, declen)
        |SELECT doc_id, n_px, sum_b, sum_g, sum_r, sq_b, sq_g, sq_r,
        |  CAST(sum_b AS DOUBLE) / n_px AS mean_b,
        |  CAST(sum_g AS DOUBLE) / n_px AS mean_g,
        |  CAST(sum_r AS DOUBLE) / n_px AS mean_r
        |FROM g ORDER BY doc_id""".stripMargin,
  ).pipe(m =>
    // d05b is BIT-IDENTICAL to d05 by construction (the salt grid meets
    // each candidate pair exactly once; verification is unchanged), so
    // the two entries share one oracle query. Same for d07b: a bloom
    // prune has no false negatives, so the probe join sees every true
    // collision and the verified output equals d07's exactly.
    m + ("d05b_dedup_embedding_salted" -> m("d05_dedup_embedding"))
      + ("d07b_dedup_incremental_bloom" -> m("d07_dedup_incremental")))
}
