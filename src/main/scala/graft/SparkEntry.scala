package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{IoQueries, LlmQueries, PipelineQueries, RelationalQueries, StreamingQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 is a named query here with a
  * DuckDB-runnable oracle twin in [[oracleSql]]. Determinism rules:
  * explicit ORDER BY on a unique key in both engines, doubles rounded,
  * timestamps emitted as formatted strings or epoch integers, integer sums
  * CAST to BIGINT in DuckDB (its SUM(BIGINT) returns HUGEINT).
  *
  * Naming: a `b`-suffixed id (q08b, q18b, q35b, q51b) is a VARIANT query —
  * an alternate formulation of the same operator as its base id, gated
  * against the same (or an equivalence-flag) oracle so the two
  * implementations stay provably value-equal while their plans/costs are
  * compared: q08 window top-k vs q08b native bounded-heap operator; q18
  * typed Aggregator vs q18b TypedImperativeAggregate; q35 hyperplane-LSH
  * ANN vs q35b IVF-cell ANN (q82 = q35b's quantizer trained by q77's
  * k-means); q51 exact percentiles vs q51b approx-sketch percentiles.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.pricingSummary(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary" -> RelationalQueries.pricingSummary,
    "q02_earliest_order" -> RelationalQueries.earliestOrder,
    "q03_partsupp_join" -> RelationalQueries.partSuppJoin,
    "q04_semi_join" -> RelationalQueries.semiJoinCustomers,
    "q05_anti_join" -> RelationalQueries.antiJoinCustomers,
    "q06_full_outer_profile" -> RelationalQueries.fullOuterProfile,
    "q07_recent_window_agg" -> RelationalQueries.recentWindowAgg,
    "q08_topk_per_key" -> RelationalQueries.topOrdersPerCustomer,
    "q08b_topk_native" -> RelationalQueries.topOrdersNative,
    "q09_mode_priority" -> RelationalQueries.modePriority,
    "q10_event_funnel" -> RelationalQueries.eventFunnel,
    "q11_distinct" -> RelationalQueries.distinctSegments,
    "q12_set_ops" -> RelationalQueries.setOps,
    "q13_json_shred" -> RelationalQueries.jsonShred,
    "q14_string_funcs" -> RelationalQueries.stringFuncs,
    "q15_date_funcs" -> RelationalQueries.dateFuncs,
    "q16_try_cast" -> RelationalQueries.tryCastCleaning,
    "q17_type_count_map" -> RelationalQueries.typeCountMap,
    "q18_map_monoid_udaf" -> PipelineQueries.mapMonoidUdaf,
    "q18b_map_monoid_native" -> PipelineQueries.mapMonoidNative,
    "q19_pivot" -> RelationalQueries.pivotEventCounts,
    "q20_rollup" -> RelationalQueries.rollupNation,
    "q21_cube" -> RelationalQueries.cubeReturnStatus,
    "q64_grouping_sets" -> RelationalQueries.groupingSetsMultiDistinct,
    "q65_asof_join" -> RelationalQueries.asofJoin,
    "q66_heavy_hitters" -> LlmQueries.heavyHitters,
    "q68_bucketed_join" -> IoQueries.bucketedJoin,
    "q69_salted_skew_join" -> RelationalQueries.saltedSkewJoin,
    "q70_snapshot_upsert" -> RelationalQueries.snapshotUpsert,
    "q71_column_profile" -> RelationalQueries.columnProfile,
    "q72_containment" -> LlmQueries.containment,
    "q74_streaming_asof_batch" -> StreamingQueries.streamingAsOfBatch,
    "q83_streaming_dedup_batch" -> StreamingQueries.dedupBatch,
    "q85_streaming_asof_buffered" -> StreamingQueries.streamingAsOfBuffered,
    "q86_streaming_heavy_hitters" -> StreamingQueries.heavyHittersStream,
    "q87_stratified_sample" -> LlmQueries.stratifiedSample,
    "q88_expectations" -> RelationalQueries.expectations,
    "q89_sequence_packing" -> LlmQueries.packSequences,
    "q90_weighted_upsample" -> LlmQueries.upsample,
    "q91_decontamination" -> LlmQueries.decontamination,
    "q92_normalized_dedup" -> LlmQueries.normalizedDedup,
    "q93_streaming_ingest" -> StreamingQueries.streamingIngest,
    "q94_best_per_source" -> LlmQueries.bestPerSource,
    "q75_json_roundtrip" -> IoQueries.jsonRoundtrip,
    "q77_kmeans_clusters" -> LlmQueries.kmeansClusters,
    "q82_ivf_trained" -> LlmQueries.ivfTrained,
    "q78_string_distance" -> RelationalQueries.stringDistance,
    "q79_corpus_pipeline" -> LlmQueries.corpusPipeline,
    "q80_hll_sketch_union" -> RelationalQueries.hllSketchUnion,
    "q81_scd_type2" -> RelationalQueries.scdType2,
    "q76_zorder_layout" -> IoQueries.zorderLayout,
    "q84_zorder_nd" -> IoQueries.zorderLayout3,
    "q73_label_centroids" -> LlmQueries.labelCentroids,
    "q22_e1_config_extract" -> PipelineQueries.e1ConfigExtract,
    "q23_e2_profile_daily" -> PipelineQueries.e2ProfileDaily,
    "q24_aes_roundtrip" -> PipelineQueries.aesRoundtrip,
    "q25_fingerprints" -> PipelineQueries.fingerprints,
    "q26_e1_multi_sink" -> PipelineQueries.e1MultiSink,
    "q27_nested_shred" -> PipelineQueries.nestedShred,
    "q28_chunking" -> LlmQueries.chunkDocs,
    "q29_hash_split" -> LlmQueries.hashSplit,
    "q30_exact_dedup" -> LlmQueries.exactDedup,
    "q31_ngram_jaccard" -> LlmQueries.ngramJaccard,
    "q32_minhash_lsh" -> LlmQueries.minhashLsh,
    "q33_simhash_pairs" -> LlmQueries.simhashPairs,
    "q63_neardup_clusters" -> LlmQueries.neardupClusters,
    "q67_deduped_corpus" -> LlmQueries.dedupedCorpus,
    "q34_cosine_topk" -> LlmQueries.cosineTopK,
    "q35_ann_lsh" -> LlmQueries.annLsh,
    "q35b_ann_ivf" -> LlmQueries.ivfAnn,
    "q36_lang_id" -> LlmQueries.langId,
    "q37_quality_score" -> LlmQueries.qualityScore,
    "q38_token_count" -> LlmQueries.tokenCount,
    "q39_multimodal_decode" -> LlmQueries.multimodalDecode,
    "q40_tumbling_window" -> StreamingQueries.tumblingWindow,
    "q41_sessionize" -> StreamingQueries.sessionize,
    "q42_session_window" -> StreamingQueries.sessionWindowBatch,
    "q43_csv_roundtrip" -> IoQueries.csvRoundtrip,
    "q61_interval_join" -> StreamingQueries.intervalJoinBatch,
    "q44_partitioned_write" -> IoQueries.partitionedWriteRead,
    "q45_history_scan" -> IoQueries.historyScan,
    "q46_approx_distinct" -> IoQueries.approxDistinct,
    "q47_embedding_neardup" -> LlmQueries.embeddingNearDup,
    "q50_from_json" -> RelationalQueries.fromJsonShred,
    "q54_dsv2_range_scan" -> IoQueries.dsv2RangeScan,
    "q55_window_suite" -> RelationalQueries.windowSuite,
    "q51b_approx_percentiles" -> RelationalQueries.approxPercentiles,
    "q62_stateful_counters" -> StreamingQueries.statefulCountersBatch,
    "q56_pii_scrub" -> LlmQueries.piiScrub,
    "q57_sql_surface" -> RelationalQueries.sqlSurface,
    "q58_null_semantics" -> RelationalQueries.nullSemantics,
    "q59_multimodal_resize" -> LlmQueries.multimodalResizeFrames,
    "q60_multimodal_features" -> LlmQueries.multimodalFeatures,
    "q51_percentiles" -> RelationalQueries.percentiles,
    "q52_stats_agg" -> RelationalQueries.statsAgg,
    "q53_array_funcs" -> RelationalQueries.arrayFuncs,
    "q48_tfidf_top_terms" -> LlmQueries.tfidfTopTerms,
    "q49_repetition_ratio" -> LlmQueries.repetitionRatio,
    "q95_ann_rewrite" -> LlmQueries.annRewrite,
    "q96_containment_sketch" -> LlmQueries.containmentSketch,
    "q97_line_dedup" -> LlmQueries.lineDedup,
    "q98_image_roundtrip" -> LlmQueries.imageRoundtrip,
    "q99_semantic_dedup" -> LlmQueries.semanticDedup,
    "q100_neardup_artifacts" -> LlmQueries.neardupArtifacts,
    "q101_streaming_neardup" -> StreamingQueries.streamingNearDup,
    "q102_audio_roundtrip" -> LlmQueries.audioRoundtrip,
    "q103_video_roundtrip" -> LlmQueries.videoRoundtrip,
    "q104_video_frame_sample" -> LlmQueries.videoFrameSample,
    "q105_bloom_decontamination" -> LlmQueries.bloomDecontamination,
    "q106_duplicate_spans" -> LlmQueries.duplicateSpans,
    "q107_strip_dup_spans" -> LlmQueries.stripDupSpans,
    "q108_prototype_prune" -> LlmQueries.prototypePrune,
    "q109_mixture_by_budget" -> LlmQueries.mixtureByBudget,
    "q110_ngram_logprob" -> LlmQueries.ngramLogProb,
    "q111_dsir_score" -> LlmQueries.dsirScore,
    "q112_linear_classifier" -> LlmQueries.linearClassifier,
    "q113_temperature_mixture" -> LlmQueries.temperatureMixture,
    "q114_count_min" -> LlmQueries.countMinFrequencies,
    "q115_trained_classifier" -> LlmQueries.trainedClassifier,
    "q116_html_extract" -> LlmQueries.htmlExtract,
    "q117_ppl_buckets" -> LlmQueries.perplexityBuckets,
    "q118_incremental_neardup" -> LlmQueries.incrementalNearDup,
    "q119_shuffle_order" -> LlmQueries.shuffleOrder,
    "q120_token_entropy" -> LlmQueries.tokenEntropy,
    "q121_pmi_collocations" -> LlmQueries.pmiCollocations,
    "q122_quantized_topk" -> LlmQueries.quantizedTopK,
    "q123_web_filter" -> LlmQueries.webFilter,
    "q124_pq_topk" -> LlmQueries.pqTopK,
    "q125_training_manifest" -> LlmQueries.trainingManifest,
    "q126_image_resize" -> LlmQueries.imageResize,
    "q127_image_features" -> LlmQueries.imageFeatures,
    "q128_phrase_vocab" -> LlmQueries.phraseVocab,
    "q129_indexed_neardup" -> LlmQueries.indexedNearDup,
    "q130_streaming_media" -> StreamingQueries.streamingMediaIngest,
    "q131_ann_recall" -> LlmQueries.annRecall,
    "q132_ann_lsh_multi" -> LlmQueries.annLshMulti,
    "q133_dedup_pair_recall" -> LlmQueries.dedupPairRecall,
    "q134_phrase_tokenize" -> LlmQueries.phraseTokenize,
    "q135_full_pipeline_manifest" -> LlmQueries.fullPipelineManifest,
    "q136_orc_roundtrip" -> IoQueries.orcRoundtrip,
    "q137_warc_extract" -> LlmQueries.warcExtract,
    "q138_knn_graph" -> LlmQueries.knnGraph,
    "q139_cluster_balanced_sample" -> LlmQueries.clusterBalancedSample,
    "q140_streaming_web_filter" -> StreamingQueries.streamingWebFilter,
    "q141_knn_graph_clusters" -> LlmQueries.knnGraphClusters,
    "q142_indexed_ivf_ann" -> LlmQueries.indexedIvfAnn,
    "q143_domain_stats" -> LlmQueries.domainStats,
    "q144_host_pagerank" -> LlmQueries.hostPageRank,
    "q145_bottomk_sample" -> LlmQueries.bottomKSample,
    "q146_tar_shards" -> LlmQueries.tarShardRoundtrip,
    "q147_url_canonical" -> LlmQueries.urlCanonicalDedup,
    "q148_snapshot_timetravel" -> IoQueries.snapshotTimeTravel,
    "q149_snapshot_diff" -> IoQueries.snapshotDiff,
    "q150_streaming_bottomk" -> StreamingQueries.streamingBottomK,
    "q151_snapshot_compact" -> IoQueries.snapshotCompact,
    "q152_source_similarity" -> LlmQueries.sourceSimilarity,
    "q153_streaming_snapshot" -> StreamingQueries.streamingSnapshotIngest,
    "q154_snapshot_pruned_scan" -> IoQueries.snapshotPrunedScan,
    "q155_snapshot_evolve" -> IoQueries.snapshotEvolve,
    "q156_hard_negatives" -> LlmQueries.hardNegatives,
    "q157_snapshot_delete" -> IoQueries.snapshotDelete,
    "q158_snapshot_update" -> IoQueries.snapshotUpdate,
    "q159_snapshot_merge" -> IoQueries.snapshotMerge,
    "q160_snapshot_audited" -> IoQueries.snapshotAudited,
    "q161_streaming_cdc" -> StreamingQueries.streamingCdcUpsert,
    "q162_resample_ffill" -> RelationalQueries.resampleFfill,
    "q163_leakage_safe_split" -> LlmQueries.leakageSafeSplit,
    "q164_retrieval_metrics" -> LlmQueries.retrievalMetrics,
    "q165_stream_static_enrich" -> StreamingQueries.streamStaticEnrich,
    "q166_bm25_topk" -> LlmQueries.bm25Retrieval,
    "q167_label_propagation" -> LlmQueries.knnLabelPropagation,
    "q168_hll_distinct" -> LlmQueries.hllDistinct,
    "q169_stream_stream_join" -> StreamingQueries.streamStreamIntervalJoin,
    "q170_hamming_ann" -> LlmQueries.hammingAnn,
    "q171_bm25_indexed" -> LlmQueries.bm25Indexed,
    "q172_streaming_hll" -> StreamingQueries.streamingHll,
    "q173_rrf_fusion" -> LlmQueries.rrfFusion,
    "q174_clustering_coeff" -> LlmQueries.knnClusteringCoeff,
    "q175_trust_rank" -> LlmQueries.hostTrustRank,
    "q176_quality_keeper" -> LlmQueries.qualityKeeperDedup,
    "q177_ngram_novelty" -> LlmQueries.ngramNovelty,
    "q178_anchor_graph" -> LlmQueries.anchorLinkGraph,
    "q179_corpus_datasheet" -> LlmQueries.corpusDatasheet,
    "q180_contrastive_triplets" -> LlmQueries.contrastiveTriplets,
    "q181_blocklist_gate" -> LlmQueries.blocklistGate,
    "q182_classifier_eval" -> LlmQueries.classifierEval,
    "q183_hybrid_retrieval" -> LlmQueries.hybridRetrieval,
    "q184_vocab_coverage" -> LlmQueries.vocabCoverageCurve,
    "q185_kmeans_separation" -> LlmQueries.kmeansSeparation,
    "q186_lsh_bucket_audit" -> LlmQueries.lshBucketAudit,
    "q187_calibration" -> LlmQueries.classifierCalibration,
    "q188_span_corruption" -> LlmQueries.spanCorruptionPairs,
    "q189_dsir_resample" -> LlmQueries.dsirResample,
    "q190_fim_transform" -> LlmQueries.fimPairs,
    "q191_packed_batches" -> LlmQueries.packedBatches,
    "q192_drift_psi" -> LlmQueries.driftPsi,
    "q193_kmv_set_ops" -> LlmQueries.kmvSetOps,
    "q194_bitext_margin" -> LlmQueries.bitextMargin,
    "q195_fuzzy_join" -> LlmQueries.fuzzyNameJoin,
    "q196_contaminated_spans" -> LlmQueries.contaminatedSpans,
    "q197_record_linkage" -> LlmQueries.recordLinkage,
    "q198_url_blocklist" -> LlmQueries.urlBlocklist,
    "q199_jl_projection" -> LlmQueries.jlProjectionAudit,
    "q200_streaming_drift" -> StreamingQueries.streamingDrift,
    "q201_gopher_repetition" -> LlmQueries.gopherRepetitionGate,
    "q202_jl_ann_recall" -> LlmQueries.jlAnnRecall,
    "q203_quality_ensemble" -> LlmQueries.qualityEnsemble,
    "q204_join_cardinality" -> LlmQueries.joinCardinality,
    "q205_text_embedding" -> LlmQueries.textEmbeddingRetrieval,
    "q205b_text_embedding_kernel" -> LlmQueries.textEmbeddingKernelLaws,
    "q214_snapshot_sql_read" -> IoQueries.snapshotSqlRead,
    "q218_snapshot_sql_write" -> IoQueries.snapshotSqlWrite,
    "q219_snapshot_catalog_sql" -> IoQueries.snapshotCatalogSql,
    "q220_streaming_snapshot_sink" -> StreamingQueries.streamingSnapshotSink,
    "q221_streaming_snapshot_source" -> StreamingQueries.streamingSnapshotSource,
    "q206_fk_discovery" -> LlmQueries.fkDiscovery,
    "q207_skyline" -> LlmQueries.skylineDocs,
    "q208_cohort_retention" -> RelationalQueries.cohortRetention,
    "q209_weighted_sample" -> LlmQueries.weightedSampleDocs,
    "q210_sorted_neighborhood" -> LlmQueries.sortedNeighborhoodLinkage,
    "q211_snapshot_bloom" -> IoQueries.snapshotBloomLookup,
    "q212_unicode_hygiene" -> LlmQueries.unicodeHygieneReport,
    "q213_incremental_exact" -> LlmQueries.incrementalExactDedup,
    "q215_bpe_train" -> LlmQueries.bpeTrain,
    "q216_graph_ann" -> LlmQueries.graphAnn,
    "q222_graph_ann_indexed" -> LlmQueries.graphAnnIndexed,
    "q225_ivf_codebook_indexed" -> LlmQueries.ivfCodebookAnn,
    "q226_pq_codebook_indexed" -> LlmQueries.pqCodebookAnn,
    "q223_unigram_train" -> LlmQueries.unigramTrain,
    "q224_tokenizer_compare" -> LlmQueries.tokenizerCompare,
    "q217_bpe_tokenize" -> LlmQueries.bpeTokenize,
    "q227_snapshot_time_travel" -> IoQueries.snapshotTimestampTravel,
    "q228_snapshot_retention" -> IoQueries.snapshotRetention,
    "q229_snapshot_restore" -> IoQueries.snapshotRestore,
    "q230_snapshot_agg_pushdown" -> IoQueries.snapshotAggPushdown,
    "q231_unimax_budget" -> LlmQueries.unimaxReport,
    "q232_snapshot_sql_dml" -> IoQueries.snapshotSqlDml,
    "q233_unigram_shrink" -> LlmQueries.unigramShrinkTrain,
    "q234_snapshot_history" -> IoQueries.snapshotHistory,
    "q235_snapshot_multistats" -> IoQueries.snapshotMultiStats,
    "q236_snapshot_partitioned" -> IoQueries.snapshotPartitioned,
    "q237_unigram_soft" -> LlmQueries.unigramSoftTrain,
    "q238_show_partitions" -> IoQueries.snapshotShowPartitions,
    "q239_snapshot_embeddings" -> IoQueries.snapshotEmbeddings,
    "q240_snapshot_spj" -> IoQueries.snapshotSpjJoin,
    "q241_snapshot_spec_evolution" -> IoQueries.snapshotSpecEvolution,
    "q242_snapshot_change_feed" -> IoQueries.snapshotChangeFeed,
    "q243_snapshot_null_stats" -> IoQueries.snapshotNullStats,
    "q244_change_feed_incremental" -> IoQueries.changeFeedIncremental,
    "q245_sql_dml_change_feed" -> IoQueries.snapshotSqlDmlChangeFeed,
    "q246_mor_dml" -> IoQueries.morDml,
    "q247_mor_dsv2_compact" -> IoQueries.morDsv2,
    "q248_spec_repair" -> IoQueries.specRepair,
    "q249_snapshot_rename" -> IoQueries.snapshotRename,
    "q250_hidden_partitioning" -> IoQueries.hiddenPartitioning,
    "q251_tags_binpack" -> IoQueries.snapshotTagsBinpack,
  )

  def oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |  round(avg(l_quantity), 4) AS avg_qty,
        |  round(avg(l_discount), 4) AS avg_disc,
        |  CAST(count(*) AS BIGINT) AS count_order
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q02_earliest_order" ->
      """SELECT c_custkey, c_name,
        |  strftime(min(o_orderdate), '%Y-%m-%d') AS first_order,
        |  CAST(count(*) AS BIGINT) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_custkey, c_name
        |ORDER BY c_custkey""".stripMargin,
    "q03_partsupp_join" ->
      """WITH ps AS (
        |  SELECT l_partkey, l_suppkey, round(sum(l_quantity), 2) AS ps_qty,
        |         CAST(count(*) AS BIGINT) AS ps_lines
        |  FROM lineitem GROUP BY 1, 2)
        |SELECT l.l_orderkey, l.l_linenumber, l.l_partkey, l.l_suppkey,
        |       ps.ps_qty, ps.ps_lines
        |FROM lineitem l JOIN ps USING (l_partkey, l_suppkey)
        |ORDER BY l.l_orderkey, l.l_linenumber, l.l_partkey, l.l_suppkey""".stripMargin,
    "q04_semi_join" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "q05_anti_join" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "q06_full_outer_profile" ->
      """WITH oa AS (
        |  SELECT o_custkey AS custkey, CAST(count(*) AS BIGINT) AS n_orders,
        |         round(sum(o_totalprice), 2) AS total_spend
        |  FROM orders GROUP BY 1),
        |c AS (SELECT c_custkey AS custkey, c_name, c_acctbal FROM customer)
        |SELECT COALESCE(oa.custkey, c.custkey) AS custkey,
        |       COALESCE(c_name, '<none>') AS name,
        |       COALESCE(n_orders, 0) AS n_orders,
        |       COALESCE(total_spend, 0.0) AS total_spend
        |FROM oa FULL OUTER JOIN c ON oa.custkey = c.custkey
        |ORDER BY custkey""".stripMargin,
    "q07_recent_window_agg" ->
      """WITH m AS (SELECT user_id, min(ts) AS min_ts FROM events GROUP BY 1)
        |SELECT e.user_id, CAST(count(*) AS BIGINT) AS n_events,
        |       round(sum(e.value), 2) AS sum_value
        |FROM events e JOIN m USING (user_id)
        |WHERE e.ts <= m.min_ts + INTERVAL 14 DAY
        |GROUP BY e.user_id
        |ORDER BY e.user_id""".stripMargin,
    "q08_topk_per_key" ->
      """SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |         CAST(row_number() OVER (PARTITION BY o_custkey
        |              ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
        |  FROM orders)
        |WHERE rn <= 3
        |ORDER BY o_custkey, rn""".stripMargin,
    "q08b_topk_native" ->
      """SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |         CAST(row_number() OVER (PARTITION BY o_custkey
        |              ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
        |  FROM orders)
        |WHERE rn <= 3
        |ORDER BY o_custkey, rn""".stripMargin,
    "q09_mode_priority" ->
      """WITH c AS (
        |  SELECT o_custkey, o_orderpriority, CAST(count(*) AS BIGINT) AS cnt
        |  FROM orders GROUP BY 1, 2),
        |r AS (SELECT *, row_number() OVER (PARTITION BY o_custkey
        |        ORDER BY cnt DESC, o_orderpriority) AS rn FROM c)
        |SELECT o_custkey, o_orderpriority, cnt FROM r WHERE rn = 1
        |ORDER BY o_custkey""".stripMargin,
    "q10_event_funnel" ->
      """SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signups,
        |  CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS clicks,
        |  CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS views,
        |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchases,
        |  CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS errors,
        |  round(sum(value), 2) AS sum_value
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q11_distinct" ->
      """SELECT DISTINCT c_nationkey, c_mktsegment FROM customer
        |ORDER BY c_nationkey, c_mktsegment""".stripMargin,
    "q12_set_ops" ->
      """WITH a AS (SELECT DISTINCT o_custkey AS k FROM orders),
        |b AS (SELECT DISTINCT c_custkey AS k FROM customer WHERE c_acctbal > 5000)
        |SELECT k, 'in_both' AS op FROM (SELECT k FROM a INTERSECT SELECT k FROM b)
        |UNION ALL
        |SELECT k, 'orders_only' AS op FROM (SELECT k FROM a EXCEPT SELECT k FROM b)
        |UNION ALL
        |SELECT k, 'rich_only' AS op FROM (SELECT k FROM b EXCEPT SELECT k FROM a)
        |ORDER BY k, op""".stripMargin,
    "q13_json_shred" ->
      """SELECT event_id, event_type,
        |  CAST(regexp_extract(props, '[0-9]+') AS BIGINT) AS prop_k
        |FROM events ORDER BY event_id""".stripMargin,
    "q14_string_funcs" ->
      """WITH t AS (
        |  SELECT *,
        |    regexp_replace(c_name || chr(0) || chr(0) || chr(0),
        |                   '\x00+$', '', 'g') AS stripped,
        |    md5(c_name) AS h
        |  FROM customer)
        |SELECT c_custkey,
        |  string_split(c_name, '#')[2] AS name_num,
        |  substring(c_name, 1, 8) AS name_head,
        |  upper(c_mktsegment) AS seg_upper,
        |  lower(c_name) AS name_lower,
        |  CAST(length(c_name) AS BIGINT) AS name_len,
        |  concat_ws('-', c_mktsegment, c_custkey) AS seg_key,
        |  reverse(c_name) AS name_rev,
        |  regexp_replace(c_name, '[0-9]', 'x', 'g') AS name_masked,
        |  CASE WHEN length(stripped) > 8
        |       THEN substr(stripped, 5, length(stripped) - 8) END AS trimmed,
        |  substr(h,1,8) || '-' || substr(h,9,4) || '-' || substr(h,13,4)
        |    || '-' || substr(h,17,4) || '-' || substr(h,21,12) AS uuid_str,
        |  regexp_matches(c_name,
        |    '^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$')
        |    AS name_is_uuid
        |FROM t
        |WHERE regexp_matches(substr(h,1,8) || '-' || substr(h,9,4) || '-'
        |  || substr(h,13,4) || '-' || substr(h,17,4) || '-' || substr(h,21,12),
        |  '^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$')
        |ORDER BY c_custkey""".stripMargin,
    "q15_date_funcs" ->
      """SELECT o_orderkey,
        |  strftime(o_orderdate, '%Y-%m-%d') AS d,
        |  CAST(year(o_orderdate) AS BIGINT) AS y,
        |  CAST(month(o_orderdate) AS BIGINT) AS m,
        |  CAST(day(o_orderdate) AS BIGINT) AS dom,
        |  CAST(quarter(o_orderdate) AS BIGINT) AS q,
        |  CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS days_since,
        |  strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
        |  epoch_us(o_orderdate) AS epoch_us
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q16_try_cast" ->
      """SELECT event_id,
        |  TRY_CAST(event_type AS BIGINT) AS bad_long,
        |  TRY_CAST(regexp_extract(props, '[0-9]+') AS BIGINT) AS k,
        |  CAST(NULL AS DOUBLE) AS div0,
        |  CAST(TRY_CAST(event_type AS DATE) AS VARCHAR) AS bad_date
        |FROM events ORDER BY event_id""".stripMargin,
    "q17_type_count_map" ->
      """WITH c AS (
        |  SELECT user_id, event_type, count(*) AS cnt
        |  FROM events GROUP BY 1, 2)
        |SELECT user_id,
        |  string_agg(event_type || ':' || cnt, ',' ORDER BY event_type) AS type_counts
        |FROM c GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q19_pivot" ->
      """SELECT user_id,
        |  CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
        |  CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
        |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
        |  CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
        |  CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q20_rollup" ->
      """SELECT CAST(COALESCE(c_nationkey, -1) AS BIGINT) AS nationkey,
        |  CAST(GROUPING(c_nationkey) AS BIGINT) AS is_total,
        |  CAST(count(*) AS BIGINT) AS n,
        |  round(sum(c_acctbal), 2) AS bal
        |FROM customer GROUP BY ROLLUP(c_nationkey)
        |ORDER BY nationkey, is_total""".stripMargin,
    "q21_cube" ->
      """SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
        |  COALESCE(l_linestatus, 'ALL') AS linestatus,
        |  CAST(GROUPING(l_returnflag) AS BIGINT) AS g_rf,
        |  CAST(GROUPING(l_linestatus) AS BIGINT) AS g_ls,
        |  CAST(count(*) AS BIGINT) AS n,
        |  round(sum(l_quantity), 2) AS qty
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY returnflag, linestatus, g_rf, g_ls""".stripMargin,
    "q18_map_monoid_udaf" ->
      """WITH c AS (
        |  SELECT user_id, event_type, count(*) AS cnt
        |  FROM events GROUP BY 1, 2)
        |SELECT user_id,
        |  string_agg(event_type || ':' || cnt, ',' ORDER BY event_type) AS type_counts
        |FROM c GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q18b_map_monoid_native" ->
      """WITH c AS (
        |  SELECT user_id, event_type, count(*) AS cnt
        |  FROM events GROUP BY 1, 2)
        |SELECT user_id,
        |  string_agg(event_type || ':' || cnt, ',' ORDER BY event_type) AS type_counts
        |FROM c GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q64_grouping_sets" ->
      """SELECT COALESCE(o_orderstatus, 'ALL') AS status,
        |  COALESCE(o_orderpriority, 'ALL') AS priority,
        |  CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
        |  CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_prio,
        |  CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_cust,
        |  CAST(count(DISTINCT o_orderpriority) AS BIGINT) AS n_prio,
        |  CAST(count(*) AS BIGINT) AS n_orders,
        |  round(sum(o_totalprice), 2) AS spend
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY status, priority, g_status, g_prio""".stripMargin,
    "q65_asof_join" ->
      """WITH p AS (SELECT user_id, event_id, ts, value FROM events
        |           WHERE event_type = 'purchase'),
        |s AS (SELECT user_id, ts FROM events WHERE event_type = 'signup')
        |SELECT p.user_id, p.event_id, epoch_us(p.ts) AS purchase_us,
        |  round(p.value, 2) AS purchase_value, epoch_us(s.ts) AS signup_us
        |FROM p ASOF LEFT JOIN s
        |  ON p.user_id = s.user_id AND p.ts >= s.ts
        |ORDER BY p.event_id""".stripMargin,
    "q66_heavy_hitters" ->
      """WITH tok AS (SELECT unnest(string_split(text, ' ')) AS term
        |             FROM documents),
        |ex AS (SELECT term, CAST(count(*) AS BIGINT) AS exact_cnt
        |       FROM tok GROUP BY term)
        |SELECT term, exact_cnt, TRUE AS within_bound
        |FROM ex ORDER BY exact_cnt DESC, term LIMIT 10""".stripMargin,
    "q68_bucketed_join" ->
      """SELECT c_custkey, c_name, CAST(count(*) AS BIGINT) AS n_orders,
        |  round(sum(o_totalprice), 2) AS spend
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_custkey, c_name
        |ORDER BY c_custkey""".stripMargin,
    "q69_salted_skew_join" ->
      """WITH dim AS (SELECT user_id, CAST(count(*) AS BIGINT) AS user_events
        |             FROM events GROUP BY 1)
        |SELECT e.user_id, CAST(count(*) AS BIGINT) AS n,
        |  round(sum(e.value), 2) AS sum_value,
        |  max(d.user_events) AS user_events
        |FROM events e JOIN dim d USING (user_id)
        |GROUP BY e.user_id ORDER BY e.user_id""".stripMargin,
    "q70_snapshot_upsert" ->
      """WITH base AS (
        |  SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders,
        |         round(sum(o_totalprice), 2) AS spend,
        |         strftime(max(o_orderdate), '%Y-%m-%d') AS last_day
        |  FROM orders WHERE o_orderdate < TIMESTAMP '1996-01-01'
        |  GROUP BY 1),
        |delta AS (
        |  SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders,
        |         round(sum(o_totalprice), 2) AS spend,
        |         strftime(max(o_orderdate), '%Y-%m-%d') AS last_day
        |  FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  GROUP BY 1)
        |SELECT COALESCE(u.o_custkey, b.o_custkey) AS o_custkey,
        |  COALESCE(u.n_orders, b.n_orders) AS n_orders,
        |  COALESCE(u.spend, b.spend) AS spend,
        |  COALESCE(u.last_day, b.last_day) AS last_day
        |FROM base b FULL OUTER JOIN delta u ON b.o_custkey = u.o_custkey
        |ORDER BY o_custkey""".stripMargin,
    "q71_column_profile" ->
      """SELECT * FROM (
        |  SELECT 'event_id' AS col_name, CAST(count(*) AS BIGINT) AS n_rows,
        |    CAST(count(*) - count(event_id) AS BIGINT) AS n_null,
        |    CAST(count(DISTINCT event_id) AS BIGINT) AS n_distinct,
        |    CAST(min(event_id) AS VARCHAR) AS min_value,
        |    CAST(max(event_id) AS VARCHAR) AS max_value FROM events
        |  UNION ALL
        |  SELECT 'user_id', CAST(count(*) AS BIGINT),
        |    CAST(count(*) - count(user_id) AS BIGINT),
        |    CAST(count(DISTINCT user_id) AS BIGINT),
        |    CAST(min(user_id) AS VARCHAR), CAST(max(user_id) AS VARCHAR)
        |  FROM events
        |  UNION ALL
        |  SELECT 'event_type', CAST(count(*) AS BIGINT),
        |    CAST(count(*) - count(event_type) AS BIGINT),
        |    CAST(count(DISTINCT event_type) AS BIGINT),
        |    CAST(min(event_type) AS VARCHAR), CAST(max(event_type) AS VARCHAR)
        |  FROM events
        |  UNION ALL
        |  SELECT 'props', CAST(count(*) AS BIGINT),
        |    CAST(count(*) - count(props) AS BIGINT),
        |    CAST(count(DISTINCT props) AS BIGINT),
        |    CAST(min(props) AS VARCHAR), CAST(max(props) AS VARCHAR)
        |  FROM events)
        |ORDER BY col_name""".stripMargin,
    "q74_streaming_asof_batch" ->
      """WITH p AS (SELECT user_id, event_id, ts, value FROM events
        |           WHERE event_type = 'purchase'),
        |s AS (SELECT user_id, ts FROM events WHERE event_type = 'signup')
        |SELECT p.user_id, p.event_id, epoch_us(p.ts) AS purchase_us,
        |  round(p.value, 2) AS purchase_value, epoch_us(s.ts) AS signup_us
        |FROM p ASOF LEFT JOIN s
        |  ON p.user_id = s.user_id AND p.ts >= s.ts
        |ORDER BY p.event_id""".stripMargin,
    "q81_scd_type2" ->
      """WITH b0 AS (
        |  SELECT o_custkey, o_orderpriority AS priority,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        |  FROM orders WHERE o_orderdate < TIMESTAMP '1996-01-01'),
        |base AS (SELECT o_custkey, priority FROM b0 WHERE rn = 1),
        |d0 AS (
        |  SELECT o_custkey, o_orderpriority AS priority,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        |  FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01'),
        |delta AS (SELECT o_custkey, priority FROM d0 WHERE rn = 1),
        |j AS (SELECT COALESCE(b.o_custkey, d.o_custkey) AS o_custkey,
        |        b.priority AS bp, d.priority AS dp,
        |        (b.o_custkey IS NOT NULL) AS inb,
        |        (d.o_custkey IS NOT NULL) AS ind
        |      FROM base b FULL OUTER JOIN delta d ON b.o_custkey = d.o_custkey)
        |SELECT * FROM (
        |  SELECT o_custkey, bp AS priority, '1995-01-01' AS valid_from,
        |         CAST(NULL AS VARCHAR) AS valid_to
        |  FROM j WHERE inb AND (NOT ind OR bp IS NOT DISTINCT FROM dp)
        |  UNION ALL
        |  SELECT o_custkey, bp, '1995-01-01', '1996-01-01'
        |  FROM j WHERE inb AND ind AND bp IS DISTINCT FROM dp
        |  UNION ALL
        |  SELECT o_custkey, dp, '1996-01-01', CAST(NULL AS VARCHAR)
        |  FROM j WHERE ind AND (NOT inb OR bp IS DISTINCT FROM dp))
        |ORDER BY o_custkey, valid_from""".stripMargin,
    "q83_streaming_dedup_batch" ->
      """SELECT event_id, user_id, event_type, round(value, 2) AS value,
        |  epoch_us(ts) AS ts_us
        |FROM events ORDER BY event_id""".stripMargin,
    "q85_streaming_asof_buffered" ->
      """WITH p AS (SELECT user_id, event_id, ts, value FROM events
        |           WHERE event_type = 'purchase'),
        |s AS (SELECT user_id, ts FROM events WHERE event_type = 'signup')
        |SELECT p.user_id, p.event_id, epoch_us(p.ts) AS purchase_us,
        |  round(p.value, 2) AS purchase_value, epoch_us(s.ts) AS signup_us
        |FROM p ASOF LEFT JOIN s
        |  ON p.user_id = s.user_id AND p.ts >= s.ts
        |ORDER BY p.event_id""".stripMargin,
    "q86_streaming_heavy_hitters" ->
      """SELECT user_id, event_type AS term, CAST(count(*) AS BIGINT) AS cnt
        |FROM events GROUP BY user_id, event_type
        |ORDER BY user_id, term""".stripMargin,
    "q87_stratified_sample" ->
      s"""SELECT doc_id, lang FROM documents
WHERE ${graft.llm.PortableSeededHash.sql("doc_id", 17)} % 10000 <
  CASE lang WHEN 'en' THEN 8000 WHEN 'de' THEN 5000
            WHEN 'fr' THEN 2500 WHEN 'es' THEN 1000 ELSE 500 END
ORDER BY doc_id""",
    "q94_best_per_source" ->
      """WITH scored AS (
        |  SELECT doc_id, source,
        |    round(least(CAST(len(string_split(text, ' ')) AS DOUBLE) / 100.0, 1.0) * 0.4
        |      + (CAST(len(list_filter(string_split(text,' '),
        |           x -> x IN ('the','and','of','is','in','a'))) AS DOUBLE)
        |         / len(string_split(text, ' '))) * 0.3
        |      + (1.0 - CAST(len(regexp_extract_all(text, '[.,!?;:]')) AS DOUBLE)
        |         / length(text)) * 0.3, 4) AS quality
        |  FROM documents),
        |r AS (SELECT source, doc_id, quality,
        |        CAST(row_number() OVER (PARTITION BY source
        |          ORDER BY quality DESC, doc_id) AS BIGINT) AS rn
        |      FROM scored)
        |SELECT source, rn, doc_id, quality FROM r WHERE rn <= 5
        |ORDER BY source, rn""".stripMargin,
    "q93_streaming_ingest" ->
      """WITH n AS (
        |  SELECT DISTINCT md5(trim(regexp_replace(regexp_replace(
        |    lower(text), '[.,!?;:]', '', 'g'), '\s+', ' ', 'g'))) AS fp
        |  FROM documents)
        |SELECT fp,
        |  CASE WHEN ('0x' || substr(md5('42:' || fp), 1, 15))::BIGINT % 100 < 80
        |       THEN 'train'
        |       WHEN ('0x' || substr(md5('42:' || fp), 1, 15))::BIGINT % 100 < 90
        |       THEN 'val' ELSE 'test' END AS split
        |FROM n ORDER BY fp""".stripMargin,
    "q92_normalized_dedup" ->
      """WITH all_docs AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 100000, upper(text) || ' !!' FROM documents),
        |n AS (SELECT doc_id,
        |        trim(regexp_replace(regexp_replace(lower(text),
        |          '[.,!?;:]', '', 'g'), '\s+', ' ', 'g')) AS nt
        |      FROM all_docs)
        |SELECT CAST(min(doc_id) AS BIGINT) AS keep_id,
        |  CAST(count(*) AS BIGINT) AS dup_count, md5(nt) AS fp
        |FROM n GROUP BY nt ORDER BY keep_id""".stripMargin,
    "q91_decontamination" -> decontaminationOracle,
    // q176: quality-aware keeper — q92's variant corpus + normalization
    // key, q37's quality formula per COPY, rank replayed on the
    // ROUNDED score with doc_id ties.
    // q181: blocked-phrase gate — the engine's one Aho–Corasick pass
    // replayed as one `contains` per dictionary term; the literal list
    // is in binary-sorted order, matching the automaton's output order.
    "q181_blocklist_gate" ->
      """WITH m AS (SELECT doc_id, list_filter(
        |    ['batch batch', 'batch batch batch', 'big slow', 'data line',
        |     'dup', 'fast key', 'low joi', 'merge data', 'ow jo',
        |     'slow join', 'stream spark', 'table scan', 'the fast',
        |     'window window'],
        |    p -> contains(text, p)) AS mt
        |  FROM documents)
        |SELECT doc_id, CAST(len(mt) AS BIGINT) AS n_matched,
        |  coalesce(array_to_string(mt, '|'), '') AS matched_terms,
        |  len(mt) >= 3 AS blocked
        |FROM m ORDER BY doc_id""".stripMargin,
    // q180: triplets — one scored scan, positive = rank-1, negative =
    // best candidate ≥0.05 below the positive and ≥0.10; 4-dp sims.
    "q180_contrastive_triplets" ->
      """WITH q AS (SELECT vec_id AS anchor_id, embedding AS q_emb
        |           FROM embeddings WHERE vec_id < 50),
        |sc AS (SELECT q.anchor_id, e.vec_id AS cand_id,
        |    CAST(round(round(list_cosine_similarity(
        |        CAST(q.q_emb AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])),
        |      4) * 10000, 0) AS BIGINT) AS sim_bp
        |  FROM embeddings e JOIN q ON e.vec_id <> q.anchor_id),
        |pos AS (SELECT anchor_id, cand_id AS positive_id,
        |    sim_bp AS pos_sim_bp
        |  FROM (SELECT *, row_number() OVER (PARTITION BY anchor_id
        |          ORDER BY sim_bp DESC, cand_id) AS rk FROM sc)
        |  WHERE rk = 1),
        |neg AS (SELECT anchor_id, positive_id, pos_sim_bp,
        |    cand_id AS negative_id, sim_bp AS neg_sim_bp
        |  FROM (SELECT sc.anchor_id, sc.cand_id, sc.sim_bp,
        |      pos.positive_id, pos.pos_sim_bp,
        |      row_number() OVER (PARTITION BY sc.anchor_id
        |        ORDER BY sc.sim_bp DESC, sc.cand_id) AS nrk
        |    FROM sc JOIN pos USING (anchor_id)
        |    WHERE sc.sim_bp <= pos.pos_sim_bp - 500
        |      AND sc.sim_bp >= 1000)
        |  WHERE nrk = 1)
        |SELECT anchor_id, positive_id, pos_sim_bp, negative_id,
        |  neg_sim_bp, pos_sim_bp - neg_sim_bp AS margin_bp
        |FROM neg ORDER BY anchor_id""".stripMargin,
    // q179: the corpus datasheet — volume, length quantiles, language
    // mix, dup rate, fixed-point mean quality; all pieces replayed.
    "q179_corpus_datasheet" ->
      """WITH base AS (SELECT doc_id, lang,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |    md5(text) AS fp
        |  FROM documents),
        |core AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
        |    round(avg(n_tokens), 4) AS mean_tokens,
        |    round(quantile_cont(n_tokens, 0.5), 4) AS p50_tokens,
        |    round(quantile_cont(n_tokens, 0.95), 4) AS p95_tokens,
        |    CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
        |    CAST(count(DISTINCT fp) AS BIGINT) AS n_unique
        |  FROM base),
        |top AS (SELECT lang AS top_lang, CAST(count(*) AS BIGINT) AS c
        |        FROM base GROUP BY 1
        |        ORDER BY count(*) DESC, lang LIMIT 1),
        |mq AS (SELECT CAST(sum(qfp) AS BIGINT) AS qsum,
        |         CAST(count(*) AS BIGINT) AS qn
        |  FROM (SELECT CAST(round(
        |    round(least(CAST(len(string_split(text, ' ')) AS DOUBLE) / 100.0, 1.0) * 0.4
        |      + (CAST(len(list_filter(string_split(text,' '),
        |           x -> x IN ('the','and','of','is','in','a'))) AS DOUBLE)
        |         / len(string_split(text, ' '))) * 0.3
        |      + (1.0 - CAST(len(regexp_extract_all(text, '[.,!?;:]')) AS DOUBLE)
        |         / length(text)) * 0.3, 4) * 10000, 0) AS BIGINT) AS qfp
        |    FROM documents))
        |SELECT n_docs, total_tokens, mean_tokens, p50_tokens, p95_tokens,
        |  n_langs, top_lang,
        |  round(CAST(c AS DOUBLE) / n_docs, 4) AS top_lang_frac,
        |  n_unique,
        |  round(1.0 - CAST(n_unique AS DOUBLE) / n_docs, 4) AS dup_rate,
        |  round(CAST(qsum AS DOUBLE) / (10000.0 * qn), 4) AS mean_quality
        |FROM core, top, mq""".stripMargin,
    // q178: the q143 HTML wrapper + deterministic anchors, the anchor-
    // tag regexp extraction, host recovery and the weighted edge list
    // with min-anchor — all replayed.
    "q178_anchor_graph" ->
      """WITH pages AS (SELECT source || '.crawl.example' AS src_host,
        |  '<html><head><title>Doc ' || doc_id ||
        |  '</title><script type="text/javascript">var t = 1 &amp;&amp; 2;' ||
        |  '</script><style>.nav { color: red; }</style></head><body>' ||
        |  '<div class="nav">Home | About</div><p>' || text ||
        |  '</p><footer>&amp;copy; 2026</footer></body></html>' ||
        |  '<a href="http://src' || ((doc_id * 7 + 3) % 20) ||
        |  '.crawl.example/page/' || doc_id || '">see src' ||
        |  ((doc_id * 7 + 3) % 20) || '</a>' ||
        |  '<a href="http://src' || ((doc_id * 11 + 5) % 20) ||
        |  '.crawl.example/ref">ref src' || ((doc_id * 11 + 5) % 20) ||
        |  '</a>' AS html
        |  FROM documents),
        |t AS (SELECT src_host, unnest(regexp_extract_all(html,
        |        '<a href="[^"]+">[^<]*</a>', 0)) AS tag FROM pages),
        |l AS (SELECT src_host,
        |  regexp_extract(regexp_extract(tag, '<a href="([^"]+)"', 1),
        |    '^http://([^/]+)', 1) AS dst_host,
        |  regexp_extract(tag, '>([^<]*)</a>', 1) AS anchor FROM t)
        |SELECT src_host, dst_host, CAST(count(*) AS BIGINT) AS n_links,
        |  min(anchor) AS top_anchor
        |FROM l GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // q177: per-doc distinct 3-grams (the q49 window spelling), corpus
    // df, and the df=1 novelty fraction — counts exact, ratio at 4dp.
    "q177_ngram_novelty" ->
      """WITH g AS (
        |  SELECT doc_id, list_distinct(list_transform(
        |    range(1, len(string_split(text,' ')) - 1),
        |    i -> string_split(text,' ')[i] || ' ' ||
        |         string_split(text,' ')[i+1] || ' ' ||
        |         string_split(text,' ')[i+2])) AS grams
        |  FROM documents),
        |gd AS (SELECT doc_id, unnest(grams) AS g FROM g
        |       WHERE len(grams) > 0),
        |df AS (SELECT g, CAST(count(*) AS BIGINT) AS df
        |       FROM gd GROUP BY 1)
        |SELECT gd.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
        |  CAST(count(*) FILTER (WHERE df.df = 1) AS BIGINT) AS n_novel,
        |  round(CAST(count(*) FILTER (WHERE df.df = 1) AS DOUBLE)
        |    / count(*), 4) AS novelty
        |FROM gd JOIN df USING (g) GROUP BY 1 ORDER BY 1""".stripMargin,
    "q176_quality_keeper" ->
      """WITH all_docs AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 100000, upper(text) || ' !!' FROM documents),
        |q AS (SELECT doc_id,
        |  round(least(CAST(len(string_split(text, ' ')) AS DOUBLE) / 100.0, 1.0) * 0.4
        |    + (CAST(len(list_filter(string_split(text,' '),
        |         x -> x IN ('the','and','of','is','in','a'))) AS DOUBLE)
        |       / len(string_split(text, ' '))) * 0.3
        |    + (1.0 - CAST(len(regexp_extract_all(text, '[.,!?;:]')) AS DOUBLE)
        |       / length(text)) * 0.3, 4) AS quality,
        |  md5(trim(regexp_replace(regexp_replace(lower(text),
        |    '[.,!?;:]', '', 'g'), '\s+', ' ', 'g'))) AS fp
        |  FROM all_docs),
        |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY fp
        |        ORDER BY quality DESC, doc_id) AS BIGINT) AS rk FROM q),
        |k AS (SELECT fp, doc_id AS keeper_id FROM r WHERE rk = 1),
        |c AS (SELECT fp, CAST(count(*) AS BIGINT) AS n_copies
        |      FROM q GROUP BY 1)
        |SELECT q.doc_id, q.fp, q.quality, k.keeper_id,
        |  (q.doc_id = k.keeper_id) AS is_keeper, c.n_copies
        |FROM q JOIN k USING (fp) JOIN c USING (fp)
        |ORDER BY q.doc_id""".stripMargin,
    // q105: the Bloom-prefiltered path must be invisible in the answer —
    // same split, same exact containment semantics, SAME oracle as q91.
    "q105_bloom_decontamination" -> decontaminationOracle,
    // q106/q107: the oracle works on gram STRINGS where the engine uses
    // compiled 64-bit gram hashes — identical output absent a 64-bit
    // collision (none at this scale; documented on duplicateSpans).
    "q106_duplicate_spans" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |grams AS (
        |  SELECT doc_id, i AS pos, array_to_string(t[i:i+14], ' ') AS g
        |  FROM toks, LATERAL unnest(generate_series(1, len(t) - 14))
        |    AS u(i)),
        |dup AS (SELECT g FROM grams GROUP BY g HAVING count(*) >= 2),
        |flagged AS (
        |  SELECT doc_id, pos FROM grams
        |  WHERE g IN (SELECT g FROM dup)),
        |isl AS (
        |  SELECT doc_id, pos,
        |    CASE WHEN pos - lag(pos)
        |        OVER (PARTITION BY doc_id ORDER BY pos) <= 15
        |      THEN 0 ELSE 1 END AS brk
        |  FROM flagged),
        |isl2 AS (
        |  SELECT doc_id, pos,
        |    sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS island
        |  FROM isl)
        |SELECT CAST(doc_id AS BIGINT) AS doc_id,
        |  CAST(min(pos) AS BIGINT) AS span_start,
        |  CAST(max(pos) + 14 AS BIGINT) AS span_end,
        |  CAST(max(pos) + 15 - min(pos) AS BIGINT) AS span_tokens
        |FROM isl2 GROUP BY doc_id, island
        |ORDER BY doc_id, span_start""".stripMargin,
    "q107_strip_dup_spans" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |grams AS (
        |  SELECT doc_id, i AS pos, array_to_string(t[i:i+14], ' ') AS g
        |  FROM toks, LATERAL unnest(generate_series(1, len(t) - 14))
        |    AS u(i)),
        |dup AS (SELECT g FROM grams GROUP BY g HAVING count(*) >= 2),
        |flagged AS (
        |  SELECT doc_id, pos FROM grams
        |  WHERE g IN (SELECT g FROM dup)),
        |isl AS (
        |  SELECT doc_id, pos,
        |    CASE WHEN pos - lag(pos)
        |        OVER (PARTITION BY doc_id ORDER BY pos) <= 15
        |      THEN 0 ELSE 1 END AS brk
        |  FROM flagged),
        |spans AS (
        |  SELECT doc_id, min(pos) AS s, max(pos) + 14 AS e
        |  FROM (SELECT doc_id, pos,
        |          sum(brk) OVER (PARTITION BY doc_id ORDER BY pos)
        |            AS island
        |        FROM isl)
        |  GROUP BY doc_id, island),
        |tok1 AS (
        |  SELECT doc_id, i AS pos, t[i] AS tok
        |  FROM toks, LATERAL unnest(generate_series(1, len(t))) AS u(i)),
        |kept AS (
        |  SELECT k.doc_id, k.pos, k.tok FROM tok1 k
        |  WHERE NOT EXISTS (SELECT 1 FROM spans s
        |    WHERE s.doc_id = k.doc_id AND k.pos BETWEEN s.s AND s.e))
        |SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
        |  coalesce(string_agg(k.tok, ' ' ORDER BY k.pos), '') AS text,
        |  CAST(len(d.t) AS BIGINT) AS n_tokens,
        |  CAST(count(k.pos) AS BIGINT) AS n_kept
        |FROM toks d LEFT JOIN kept k ON d.doc_id = k.doc_id
        |GROUP BY d.doc_id, d.t
        |ORDER BY doc_id""".stripMargin,
    "q89_sequence_packing" ->
      s"""WITH $q89PackCtes
SELECT p.doc_id, p.n_tokens,
  (o.bucket_offset + p.cum - p.n_tokens) // 512 AS seq_id,
  (o.bucket_offset + p.cum - p.n_tokens) % 512 AS seq_offset
FROM p JOIN o USING (bucket) ORDER BY p.doc_id""",
    // q191: the q89 prefix chain + per-doc span explode across sequence
    // boundaries + ordered per-sequence reassembly with doc-start
    // boundary offsets.
    "q191_packed_batches" ->
      s"""WITH $q89PackCtes,
st AS (SELECT p.doc_id, p.n_tokens,
         o.bucket_offset + p.cum - p.n_tokens AS strt
       FROM p JOIN o USING (bucket)),
tk AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
spn AS (SELECT st.doc_id, st.n_tokens, st.strt, u.s AS seq_id,
          CAST(greatest(u.s * 512, st.strt) - st.strt + 1 AS BIGINT) AS a,
          CAST(least((u.s + 1) * 512, st.strt + st.n_tokens) - st.strt
            AS BIGINT) AS b
        FROM st, LATERAL unnest(generate_series(st.strt // 512,
          (st.strt + st.n_tokens - 1) // 512)) AS u(s)),
pc AS (SELECT spn.seq_id, spn.strt, spn.a, spn.b - spn.a + 1 AS len,
         spn.strt - (spn.strt // 512) * 512 AS off0,
         array_to_string(tk.t[spn.a:spn.b], ' ') AS ptxt
       FROM spn JOIN tk USING (doc_id))
SELECT CAST(seq_id AS BIGINT) AS seq_id,
  CAST(count(*) AS BIGINT) AS n_pieces,
  CAST(sum(len) AS BIGINT) AS n_tokens,
  coalesce(string_agg(CASE WHEN a = 1 THEN off0::VARCHAR END, '|'
    ORDER BY strt), '') AS boundaries,
  string_agg(ptxt, ' ' ORDER BY strt) AS seq_text
FROM pc GROUP BY seq_id ORDER BY seq_id""",
    "q90_weighted_upsample" ->
      s"""WITH w AS (
  SELECT doc_id, lang,
    CASE lang WHEN 'de' THEN 2 WHEN 'fr' THEN 1 WHEN 'es' THEN 0
              WHEN 'zh' THEN 0 ELSE 1 END AS base,
    CASE lang WHEN 'de' THEN 5000 WHEN 'fr' THEN 2500 WHEN 'es' THEN 7500
              WHEN 'zh' THEN 3000 ELSE 0 END AS thresh
  FROM documents),
c AS (SELECT doc_id, lang,
        base + CASE WHEN ${graft.llm.PortableSeededHash.sql("doc_id", 23)}
          % 10000 < thresh THEN 1 ELSE 0 END AS copies
      FROM w)
SELECT doc_id, lang, CAST(unnest(range(0, copies)) AS BIGINT) AS copy_idx
FROM c WHERE copies > 0 ORDER BY doc_id, copy_idx""",
    // q110: the oracle counts gram STRINGS where the engine uses compiled
    // 64-bit positional shingle hashes (q106's documented trade-off);
    // ln() is the one libm call in the oracle surface — both engines are
    // <=1-ulp and the score is 4-dp rounded over an average, so boundary
    // flips are measure-zero (verified empirically at sf0.01).
    "q110_ngram_logprob" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |v AS (SELECT count(DISTINCT tok) AS vsz
        |      FROM (SELECT unnest(t) AS tok FROM toks)),
        |tri AS (
        |  SELECT doc_id, array_to_string(t[i:i+2], ' ') AS g3,
        |         array_to_string(t[i:i+1], ' ') AS g2
        |  FROM toks, LATERAL unnest(generate_series(1, len(t) - 2))
        |    AS u(i)),
        |c3 AS (SELECT g3, count(*) AS cn FROM tri GROUP BY g3),
        |bi AS (
        |  SELECT array_to_string(t[i:i+1], ' ') AS g2
        |  FROM toks, LATERAL unnest(generate_series(1, len(t) - 1))
        |    AS u(i)),
        |c2 AS (SELECT g2, count(*) AS cc FROM bi GROUP BY g2)
        |SELECT CAST(t.doc_id AS BIGINT) AS doc_id,
        |  CAST(count(*) AS BIGINT) AS n_grams,
        |  round(avg(ln((COALESCE(c3.cn, 0) + 1)
        |    / CAST(COALESCE(c2.cc, 0) + v.vsz AS DOUBLE))), 4)
        |    AS avg_logprob
        |FROM tri t LEFT JOIN c3 USING (g3) LEFT JOIN c2 USING (g2), v
        |GROUP BY t.doc_id ORDER BY doc_id""".stripMargin,
    // q111: hash buckets are SEMANTICS here (collisions are part of the
    // hashed-feature model), so the oracle replays the portable hash for
    // both the corpus split and the feature map; ln carries the same
    // 4-dp measure-zero caveat as q110.
    "q111_dsir_score" ->
      s"""WITH $q111DsirCtes
SELECT doc_id, n_grams, log_ratio FROM dsirsc ORDER BY doc_id""",
    // q189: q111's weights + hash-derived Gumbel noise, 4-dp keys,
    // top-64 without-replacement selection (Gumbel top-k identity).
    "q189_dsir_resample" ->
      s"""WITH $q111DsirCtes,
k AS (SELECT doc_id, n_grams, log_ratio,
        round(log_ratio + -ln(-ln(
          (CAST(${graft.llm.PortableSeededHash.sql("doc_id", 67)}
             AS DOUBLE) + 0.5)
          / CAST(1152921504606846976 AS DOUBLE))), 4) AS gumbel_key
      FROM dsirsc)
SELECT doc_id, n_grams, log_ratio, gumbel_key, CAST(rk AS BIGINT) AS rk
FROM (SELECT *, row_number() OVER (ORDER BY gumbel_key DESC, doc_id)
        AS rk FROM k)
WHERE rk <= 64 ORDER BY rk""",
    // q112: integer weights + integer sum — no float anywhere, so the
    // logit is bit-exact; the weight of bucket b re-derives as
    // hash77('w' || b) % 17 - 8, exactly as the Scala driver builds it.
    "q112_linear_classifier" ->
      s"""WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
grams AS (
  SELECT doc_id, t[i] AS g
  FROM toks, LATERAL unnest(generate_series(1, len(t))) AS u(i)
  UNION ALL
  SELECT doc_id, t[i] || ' ' || t[i+1]
  FROM toks, LATERAL unnest(generate_series(1, len(t) - 1)) AS u(i)),
wg AS (SELECT doc_id,
         (${graft.llm.PortableSeededHash.sql(
             "'w' || (" + graft.llm.PortableSeededHash.sql("g", 59) +
               " % 256)::VARCHAR", 77)} % 17) - 8 AS w
       FROM grams)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
  CAST(count(*) AS BIGINT) AS n_feats,
  CAST(sum(w) AS BIGINT) AS logit,
  CAST(sum(w) AS BIGINT) > 0 AS keep
FROM wg GROUP BY doc_id ORDER BY doc_id""",
    // q113: sqrt/divide/floor are IEEE-correctly-rounded, so the
    // data-derived thresholds are bit-identical cross-engine (the α=0.5
    // guarantee documented on temperatureSampled).
    "q113_temperature_mixture" ->
      s"""WITH c AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_stratum
           FROM documents GROUP BY lang),
t AS (SELECT lang, n_stratum,
        least(10000, CAST(floor(25000.0 / sqrt(CAST(n_stratum AS DOUBLE)))
          AS BIGINT)) AS threshold_bp
      FROM c)
SELECT d.doc_id, d.lang AS stratum, t.n_stratum, t.threshold_bp,
  ${graft.llm.PortableSeededHash.sql("d.doc_id", 41)} % 10000
    < t.threshold_bp AS kept
FROM documents d JOIN t ON d.lang = t.lang ORDER BY d.doc_id""",
    // q114: the oracle rebuilds the ENTIRE count-min matrix (per-row
    // bucket sums) and takes the min over rows — the sketch estimate is
    // replayed exactly, overcounts included, not approximated away.
    "q114_count_min" ->
      """WITH c AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n
        |           FROM events GROUP BY user_id),
        |h AS (SELECT user_id, n, r,
        |        ('0x' || substr(md5((101 + r)::VARCHAR || ':' ||
        |          user_id::VARCHAR), 1, 15))::BIGINT % 256 AS b
        |      FROM c, (SELECT unnest([0, 1, 2, 3]) AS r) rws),
        |cell AS (SELECT r, b, CAST(sum(n) AS BIGINT) AS cell
        |         FROM h GROUP BY r, b)
        |SELECT CAST(h.user_id AS BIGINT) AS user_id,
        |  CAST(min(h.n) AS BIGINT) AS exact_n,
        |  CAST(min(cell.cell) AS BIGINT) AS est_n
        |FROM h JOIN cell USING (r, b)
        |GROUP BY h.user_id ORDER BY user_id""".stripMargin,
    // q115: the oracle replays the full quantized-state gradient descent
    // (generated CTE chain, one stage per iteration) — see the generator.
    "q115_trained_classifier" -> q115TrainedClassifierOracle,
    // q182: q115's training chain + average-rank AUC + confusion at the
    // keep threshold, integer arithmetic to the final rounded divisions.
    "q182_classifier_eval" -> q182ClassifierEvalOracle,
    // q187: the q182 held-out scores binned by the training's own
    // integer hard-sigmoid; per-bin mean p̂ vs observed rate.
    "q187_calibration" -> q187CalibrationOracle,
    // q192: bin counts per split, full-outer bin join, add-one-smoothed
    // shares, per-bin PSI contribution ×10⁴ at 4 dp.
    "q192_drift_psi" ->
      s"""WITH d AS (SELECT n_chars // 64 AS bin,
        |             ${h("doc_id", 42)} % 100 AS sb FROM documents),
        |hr AS (SELECT bin, CAST(count(*) AS BIGINT) AS c_ref
        |       FROM d WHERE sb < 80 GROUP BY 1),
        |hc AS (SELECT bin, CAST(count(*) AS BIGINT) AS c_cur
        |       FROM d WHERE sb >= 80 GROUP BY 1),
        |j AS (SELECT coalesce(hr.bin, hc.bin) AS bin,
        |        coalesce(c_ref, 0) AS c_ref, coalesce(c_cur, 0) AS c_cur
        |      FROM hr FULL OUTER JOIN hc ON hr.bin = hc.bin),
        |t AS (SELECT CAST(sum(c_ref) AS BIGINT) AS n_ref,
        |        CAST(sum(c_cur) AS BIGINT) AS n_cur,
        |        CAST(count(*) AS BIGINT) AS n_bins FROM j)
        |SELECT bin, c_ref, c_cur,
        |  round(CAST(c_ref + 1 AS DOUBLE)
        |    / CAST(n_ref + n_bins AS DOUBLE), 4) AS p_ref,
        |  round(CAST(c_cur + 1 AS DOUBLE)
        |    / CAST(n_cur + n_bins AS DOUBLE), 4) AS p_cur,
        |  round((CAST(c_ref + 1 AS DOUBLE)
        |      / CAST(n_ref + n_bins AS DOUBLE)
        |    - CAST(c_cur + 1 AS DOUBLE)
        |      / CAST(n_cur + n_bins AS DOUBLE))
        |    * (ln(CAST(c_ref + 1 AS DOUBLE)
        |        / CAST(n_ref + n_bins AS DOUBLE))
        |      - ln(CAST(c_cur + 1 AS DOUBLE)
        |        / CAST(n_cur + n_bins AS DOUBLE))) * 10000, 4)
        |    AS psi_x1e4
        |FROM j, t ORDER BY bin""".stripMargin,
    // q193: the bottom-256 distinct-word-hash sketch per source (window
    // spelling — the aggregate's value semantics), pair join, and the
    // KMV set-algebra estimators: HUGEINT numerator integral divides,
    // all-integer intersection, 4-dp Jaccard.
    "q193_kmv_set_ops" -> q193KmvSetOpsOracle,
    // q206: q193's KMV machinery pointed at key columns + exact twin.
    "q206_fk_discovery" -> q206FkDiscoveryOracle,
    // q207: fixed-point signals, textbook NOT EXISTS dominance — the
    // engine's two-phase local-skyline merge must land the same set.
    "q207_skyline" ->
      """WITH t AS (SELECT doc_id, text,
        |            string_split(text, ' ') AS toks FROM documents),
        |x AS (SELECT doc_id,
        |    CAST(round(round(
        |      least(CAST(len(toks) AS DOUBLE) / 100.0, 1.0) * 0.4
        |      + (CAST(len(list_filter(toks,
        |           x -> x IN ('the','and','of','is','in','a'))) AS DOUBLE)
        |         / len(toks)) * 0.3
        |      + (1.0 - CAST(len(regexp_extract_all(text, '[.,!?;:]'))
        |           AS DOUBLE) / length(text)) * 0.3, 4) * 10000)
        |      AS BIGINT) AS quality_bp,
        |    CAST(round(round(-list_sum(list_transform(
        |        list_transform(list_sort(list_distinct(toks)),
        |          u -> CAST(len(list_filter(toks, x -> x = u)) AS DOUBLE)),
        |        c -> (c / CAST(len(toks) AS DOUBLE))
        |          * ln(c / CAST(len(toks) AS DOUBLE)))), 4) * 10000)
        |      AS BIGINT) AS entropy_bp,
        |    CAST(len(toks) AS BIGINT) AS n_tokens
        |  FROM t)
        |SELECT r.doc_id, r.quality_bp, r.entropy_bp, r.n_tokens
        |FROM x r
        |WHERE NOT EXISTS (SELECT 1 FROM x s
        |  WHERE s.quality_bp >= r.quality_bp
        |    AND s.entropy_bp >= r.entropy_bp
        |    AND s.n_tokens >= r.n_tokens
        |    AND (s.quality_bp > r.quality_bp
        |      OR s.entropy_bp > r.entropy_bp
        |      OR s.n_tokens > r.n_tokens))
        |ORDER BY r.doc_id""".stripMargin,
    // q208: first-signup cohorts, distinct (user, week) activity,
    // integer day-diff div 7 offsets, cohort-share retention.
    "q208_cohort_retention" ->
      """WITH su AS (SELECT user_id, date_trunc('week', min(ts)) AS cw
        |  FROM events WHERE event_type = 'signup' GROUP BY user_id),
        |act AS (SELECT DISTINCT e.user_id, su.cw,
        |    datediff('day', su.cw, date_trunc('week', e.ts)) // 7
        |      AS week_offset
        |  FROM events e JOIN su USING (user_id)
        |  WHERE date_trunc('week', e.ts) >= su.cw),
        |sz AS (SELECT cw, CAST(count(*) AS BIGINT) AS cohort_size
        |       FROM su GROUP BY cw),
        |r AS (SELECT cw, week_offset,
        |        CAST(count(*) AS BIGINT) AS n_active
        |      FROM act GROUP BY cw, week_offset)
        |SELECT strftime(r.cw, '%Y-%m-%d') AS cohort_week,
        |  CAST(r.week_offset AS BIGINT) AS week_offset, r.n_active,
        |  sz.cohort_size,
        |  round(CAST(r.n_active AS DOUBLE) / sz.cohort_size, 4)
        |    AS retention
        |FROM r JOIN sz USING (cw)
        |ORDER BY cohort_week, week_offset""".stripMargin,
    // q209: exact-integer u, the ln(u)/w A-ES key rounded to 10 dp (the
    // rounded-cut convention), top-64 with id tie-break.
    "q209_weighted_sample" ->
      s"""WITH x AS (SELECT doc_id AS id,
        |    CAST(n_chars AS BIGINT) AS weight,
        |    round(ln((${h("doc_id", 91)} + 1)
        |        / 1152921504606846976.0) / n_chars, 10) AS es_key
        |  FROM documents),
        |t AS (SELECT id, weight, es_key FROM x
        |      ORDER BY es_key DESC, id LIMIT 64)
        |SELECT CAST(row_number() OVER (ORDER BY es_key DESC, id)
        |    AS BIGINT) AS rn,
        |  id, weight, es_key
        |FROM t ORDER BY rn""".stripMargin,
    // q210: the q197 twin, merged-file row_number (cents DESC, id), the
    // <8-rank self-join, same weights, matched pairs only.
    "q210_sorted_neighborhood" ->
      """WITH c AS (SELECT c_custkey AS id, c_name AS name,
        |    CAST(round(c_acctbal * 100) AS BIGINT) AS cents,
        |    c_mktsegment AS seg, CAST(c_nationkey AS BIGINT) AS nat
        |  FROM customer),
        |b0 AS (SELECT id,
        |    ('0x' || substr(md5('71:' || id), 1, 15))::BIGINT % 4 AS mode,
        |    1 + ('0x' || substr(md5('72:' || id), 1, 15))::BIGINT
        |      % len(name) AS dp,
        |    name, cents, seg, nat FROM c),
        |b AS (SELECT id + 1000000 AS rid,
        |    CASE WHEN mode = 1
        |      THEN substr(name, 1, dp - 1) || substr(name, dp + 1)
        |      ELSE name END AS name,
        |    CASE WHEN mode = 0 THEN cents + 1 ELSE cents END AS cents,
        |    CASE WHEN mode = 2 THEN 'UNKNOWN' ELSE seg END AS seg,
        |    nat FROM b0),
        |m AS (SELECT id AS rid, name, cents, seg, nat FROM c
        |      UNION ALL SELECT rid, name, cents, seg, nat FROM b),
        |r AS (SELECT rid, name, cents, seg, nat,
        |    row_number() OVER (ORDER BY cents DESC, rid) AS rk FROM m),
        |p AS (SELECT x.rid AS id_a, y.rid AS id_b, y.rk - x.rk AS rank_gap,
        |    (CASE WHEN x.name = y.name THEN 9892 ELSE -4320 END
        |     + CASE WHEN x.cents = y.cents THEN 13136 ELSE -3322 END
        |     + CASE WHEN x.seg = y.seg THEN 2293 ELSE -5322 END
        |     + CASE WHEN x.nat = y.nat THEN 4615 ELSE -5585 END)
        |      AS score_milli
        |  FROM r x JOIN r y ON y.rk > x.rk AND y.rk - x.rk < 8)
        |SELECT id_a, id_b, CAST(rank_gap AS BIGINT) AS rank_gap,
        |  CAST(score_milli AS BIGINT) AS score_milli,
        |  abs(id_b - id_a) = 1000000 AS is_true
        |FROM p WHERE score_milli >= 5000 ORDER BY id_a, id_b""".stripMargin,
    // q211: Bloom pruning is invisible in the answer — a plain point-set
    // filter; the absent key contributes no row.
    "q211_snapshot_bloom" ->
      """SELECT doc_id, source, n_chars FROM documents
        |WHERE doc_id IN (7, 123, 321, 444, 999999)
        |ORDER BY doc_id""".stripMargin,
    // q212: dirty-suffix synthesis via chr(), nfc_normalize, the
    // 10-entry mojibake replace chain (counted on the normalized text),
    // control strip and whitespace collapse — 'g' flags because DuckDB
    // regexp_replace is first-match-only by default where Spark's is
    // global.
    "q212_unicode_hygiene" ->
      """WITH d AS (SELECT doc_id, text ||
        |    CASE doc_id % 4
        |      WHEN 0 THEN ' cafe' || chr(769)
        |      WHEN 1 THEN ' caf' || chr(195) || chr(169)
        |      WHEN 2 THEN ' x' || chr(7) || 'y'
        |      ELSE '  end' END AS dirty
        |  FROM documents),
        |n AS (SELECT doc_id, dirty, nfc_normalize(dirty) AS t0 FROM d),
        |cnt AS (SELECT doc_id, dirty, t0,
        |    (length(t0) - length(replace(t0, chr(195)||chr(169), ''))) // 2
        |  + (length(t0) - length(replace(t0, chr(195)||chr(168), ''))) // 2
        |  + (length(t0) - length(replace(t0, chr(195)||chr(164), ''))) // 2
        |  + (length(t0) - length(replace(t0, chr(195)||chr(182), ''))) // 2
        |  + (length(t0) - length(replace(t0, chr(195)||chr(188), ''))) // 2
        |  + (length(t0) - length(replace(t0, chr(195)||chr(177), ''))) // 2
        |  + (length(t0) - length(replace(t0,
        |      chr(226)||chr(8364)||chr(8482), ''))) // 3
        |  + (length(t0) - length(replace(t0,
        |      chr(226)||chr(8364)||chr(339), ''))) // 3
        |  + (length(t0) - length(replace(t0,
        |      chr(226)||chr(8364)||chr(157), ''))) // 3
        |  + (length(t0) - length(replace(t0,
        |      chr(226)||chr(8364)||chr(8220), ''))) // 3
        |    AS n_mojibake FROM n),
        |fx AS (SELECT doc_id, dirty, n_mojibake,
        |  replace(replace(replace(replace(replace(replace(replace(
        |    replace(replace(replace(t0,
        |    chr(195)||chr(169), chr(233)),
        |    chr(195)||chr(168), chr(232)),
        |    chr(195)||chr(164), chr(228)),
        |    chr(195)||chr(182), chr(246)),
        |    chr(195)||chr(188), chr(252)),
        |    chr(195)||chr(177), chr(241)),
        |    chr(226)||chr(8364)||chr(8482), chr(8217)),
        |    chr(226)||chr(8364)||chr(339), chr(8220)),
        |    chr(226)||chr(8364)||chr(157), chr(8221)),
        |    chr(226)||chr(8364)||chr(8220), chr(8211)) AS t1
        |  FROM cnt),
        |cl AS (SELECT doc_id, dirty, n_mojibake,
        |    trim(regexp_replace(regexp_replace(t1,
        |      '[\x00-\x08\x0B\x0C\x0E-\x1F]', '', 'g'), ' +', ' ', 'g'))
        |      AS cleaned
        |  FROM fx)
        |SELECT doc_id, cleaned <> dirty AS changed,
        |  CAST(n_mojibake AS BIGINT) AS n_mojibake,
        |  right(cleaned, 8) AS tail
        |FROM cl ORDER BY doc_id""".stripMargin,
    // q213: split replay, corpus md5 fingerprints with min-id keepers,
    // batch left-probe — the bucketed index is invisible in the answer.
    "q213_incremental_exact" ->
      """WITH split AS (
        |  SELECT doc_id, text,
        |    ('0x' || substr(md5('42:' || doc_id), 1, 15))::BIGINT % 100
        |      AS b
        |  FROM documents),
        |idx AS (SELECT md5(text) AS fp, min(doc_id) AS keeper_id
        |        FROM split WHERE b < 90 GROUP BY 1),
        |batch AS (SELECT doc_id, md5(text) AS fp
        |          FROM split WHERE b >= 90)
        |SELECT batch.doc_id, idx.keeper_id IS NOT NULL AS is_dup,
        |  idx.keeper_id
        |FROM batch LEFT JOIN idx USING (fp)
        |ORDER BY batch.doc_id""".stripMargin,
    // q194: the parity split, both-direction top-4 cosine neighborhoods
    // over the same pair table, integer fixed-point sims, and the folded
    // one-division margin 8·si/(ΣA+ΣB); best-margin row per src.
    "q194_bitext_margin" -> q194BitextMarginOracle,
    // q195: identity + one-char-deletion variants via generate_series,
    // variant equi self-join, levenshtein-verified distinct pairs.
    "q195_fuzzy_join" ->
      """WITH n AS (SELECT s_suppkey AS id, s_name AS name FROM supplier),
        |v AS (SELECT DISTINCT id, name,
        |    CASE WHEN p = 0 THEN name
        |      ELSE substr(name, 1, p - 1) || substr(name, p + 1) END
        |      AS variant
        |  FROM n, LATERAL unnest(generate_series(0, len(name))) AS u(p)),
        |c AS (SELECT DISTINCT a.id AS id_a, a.name AS name_a,
        |    b.id AS id_b, b.name AS name_b
        |  FROM v a JOIN v b ON a.variant = b.variant AND a.id < b.id)
        |SELECT id_a, id_b,
        |  CAST(levenshtein(name_a, name_b) AS BIGINT) AS dist
        |FROM c WHERE levenshtein(name_a, name_b) <= 1
        |ORDER BY id_a, id_b""".stripMargin,
    // q196: the q105 split replayed at gram STRINGS (engine uses the
    // compiled 64-bit positional-shingle hash — q106's documented
    // trade-off), then the q106 island merge per corpus document.
    "q196_contaminated_spans" ->
      """WITH split AS (
        |  SELECT doc_id, text,
        |    ('0x' || substr(md5('42:' || doc_id), 1, 15))::BIGINT % 100
        |      AS bucket
        |  FROM documents),
        |corpus AS (SELECT doc_id, string_split(text, ' ') AS t
        |           FROM split WHERE bucket < 80),
        |bench AS (SELECT doc_id, string_split(text, ' ') AS t
        |          FROM split WHERE bucket >= 90),
        |bg AS (SELECT DISTINCT array_to_string(t[i:i+3], ' ') AS g
        |       FROM bench,
        |         LATERAL unnest(generate_series(1, len(t) - 3)) AS u(i)),
        |grams AS (SELECT doc_id, i AS pos,
        |            array_to_string(t[i:i+3], ' ') AS g
        |          FROM corpus,
        |            LATERAL unnest(generate_series(1, len(t) - 3)) AS u(i)),
        |flagged AS (SELECT doc_id, pos FROM grams
        |            WHERE g IN (SELECT g FROM bg)),
        |isl AS (SELECT doc_id, pos,
        |    CASE WHEN pos - lag(pos)
        |        OVER (PARTITION BY doc_id ORDER BY pos) <= 4
        |      THEN 0 ELSE 1 END AS brk
        |  FROM flagged),
        |isl2 AS (SELECT doc_id, pos,
        |    sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS island
        |  FROM isl)
        |SELECT CAST(doc_id AS BIGINT) AS doc_id,
        |  CAST(min(pos) AS BIGINT) AS span_start,
        |  CAST(max(pos) + 3 AS BIGINT) AS span_end,
        |  CAST(max(pos) + 4 - min(pos) AS BIGINT) AS span_tokens
        |FROM isl2 GROUP BY doc_id, island
        |ORDER BY doc_id, span_start""".stripMargin,
    // q197: corrupted twin from seeded md5 modes, two blocking passes
    // (cents-prefix floor-division on the +100000 offset, exact name),
    // integer milli-bit Fellegi-Sunter log-odds, threshold 5000.
    "q197_record_linkage" ->
      """WITH c AS (SELECT c_custkey AS id, c_name AS name,
        |    CAST(round(c_acctbal * 100) AS BIGINT) AS cents,
        |    c_mktsegment AS seg, CAST(c_nationkey AS BIGINT) AS nat
        |  FROM customer),
        |b0 AS (SELECT id,
        |    ('0x' || substr(md5('71:' || id), 1, 15))::BIGINT % 4 AS mode,
        |    1 + ('0x' || substr(md5('72:' || id), 1, 15))::BIGINT
        |      % len(name) AS dp,
        |    name, cents, seg, nat FROM c),
        |b AS (SELECT id + 1000000 AS id_b,
        |    CASE WHEN mode = 1
        |      THEN substr(name, 1, dp - 1) || substr(name, dp + 1)
        |      ELSE name END AS b_name,
        |    CASE WHEN mode = 0 THEN cents + 1 ELSE cents END AS b_cents,
        |    CASE WHEN mode = 2 THEN 'UNKNOWN' ELSE seg END AS b_seg,
        |    nat AS b_nat FROM b0),
        |a AS (SELECT id AS id_a, name AS a_name, cents AS a_cents,
        |             seg AS a_seg, nat AS a_nat FROM c),
        |cand AS (
        |  SELECT * FROM a JOIN b
        |    ON (a_cents + 100000) // 10 = (b_cents + 100000) // 10
        |  UNION
        |  SELECT * FROM a JOIN b ON a_name = b_name),
        |scored AS (SELECT id_a, id_b,
        |    a_name = b_name AS agree_name,
        |    a_cents = b_cents AS agree_acctbal,
        |    a_seg = b_seg AS agree_segment,
        |    a_nat = b_nat AS agree_nation,
        |    (CASE WHEN a_name = b_name THEN 9892 ELSE -4320 END
        |     + CASE WHEN a_cents = b_cents THEN 13136 ELSE -3322 END
        |     + CASE WHEN a_seg = b_seg THEN 2293 ELSE -5322 END
        |     + CASE WHEN a_nat = b_nat THEN 4615 ELSE -5585 END)
        |      AS score_milli
        |  FROM cand)
        |SELECT id_a, id_b, agree_name, agree_acctbal, agree_segment,
        |  agree_nation, CAST(score_milli AS BIGINT) AS score_milli,
        |  score_milli >= 5000 AS matched,
        |  id_b - 1000000 = id_a AS is_true
        |FROM scored ORDER BY id_a, id_b""".stripMargin,
    // q198: host synthesis replayed, dot-suffix explode, rule semi-join,
    // smallest matching rule per doc, clean docs carried with null rule.
    "q198_url_blocklist" ->
      """WITH d AS (SELECT doc_id,
        |    CASE WHEN doc_id % 3 = 0
        |        THEN 'src' || (doc_id % 20) || '.example.com'
        |      WHEN doc_id % 3 = 1
        |        THEN 'cdn.src' || (doc_id % 20) || '.example.com'
        |      ELSE 'ads.tracker' || (doc_id % 5) || '.adnet.net'
        |    END AS host
        |  FROM documents),
        |rules AS (SELECT * FROM (VALUES ('tracker3.adnet.net'),
        |    ('src7.example.com'), ('ads.src1.example.com')) AS t(rule)),
        |p AS (SELECT doc_id, host, string_split(host, '.') AS parts
        |      FROM d),
        |sufs AS (SELECT doc_id,
        |    array_to_string(parts[i:len(parts)], '.') AS suffix
        |  FROM p, LATERAL unnest(generate_series(1, len(parts))) AS u(i)),
        |hits AS (SELECT doc_id, min(suffix) AS rule
        |  FROM sufs JOIN rules ON suffix = rule GROUP BY doc_id)
        |SELECT d.doc_id, d.host, hits.rule IS NOT NULL AS blocked,
        |  hits.rule
        |FROM d LEFT JOIN hits USING (doc_id) ORDER BY doc_id""".stripMargin,
    // q199: seed-11 integer weight matrix replayed, fixed-point
    // projections and both squared L2 sums as exact BIGINTs; rho is the
    // one double, rounded, null for identical pairs.
    "q199_jl_projection" ->
      s"""WITH e AS (SELECT vec_id, embedding FROM embeddings
        |           WHERE embedding IS NOT NULL),
        |ex AS (SELECT vec_id,
        |    CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT) AS xi,
        |    d1 - 1 AS d
        |  FROM (SELECT vec_id, unnest(embedding) AS x,
        |          generate_subscripts(embedding, 1) AS d1 FROM e)),
        |w AS (SELECT p, d,
        |    ${h("p::VARCHAR || ':' || d::VARCHAR", 11)} % 1000 - 500 AS w
        |  FROM range(0, 16) tp(p), (SELECT DISTINCT d FROM ex) td),
        |proj AS (SELECT vec_id, p, CAST(sum(xi * w) AS BIGINT) AS pr
        |  FROM ex JOIN w USING (d) GROUP BY 1, 2),
        |pd AS (SELECT a.vec_id AS id_a, a.vec_id + 1 AS id_b,
        |    CAST(sum((a.xi - b.xi) * (a.xi - b.xi)) AS BIGINT) AS d2_orig
        |  FROM ex a JOIN ex b ON b.vec_id = a.vec_id + 1 AND b.d = a.d
        |  WHERE a.vec_id % 2 = 0 GROUP BY 1, 2),
        |rd AS (SELECT a.vec_id AS id_a,
        |    CAST(sum((a.pr - b.pr) * (a.pr - b.pr)) AS BIGINT) AS d2_red
        |  FROM proj a JOIN proj b ON b.vec_id = a.vec_id + 1 AND b.p = a.p
        |  WHERE a.vec_id % 2 = 0 GROUP BY 1)
        |SELECT pd.id_a, pd.id_b, pd.d2_orig, rd.d2_red,
        |  CASE WHEN pd.d2_orig = 0 THEN NULL
        |    ELSE round(rd.d2_red / (pd.d2_orig * 1333332.0), 4)
        |  END AS rho
        |FROM pd JOIN rd USING (id_a) ORDER BY id_a""".stripMargin,
    // q200: the q192 PSI spelled per hash-slice — slice histograms,
    // (slice × bin) universe, per-slice smoothed totals, identical IEEE
    // contribution expression. Streaming maintenance is invisible in the
    // answer by the mergeable-count argument.
    "q200_streaming_drift" ->
      s"""WITH d AS (SELECT n_chars // 64 AS bin,
        |    ${h("doc_id", 42)} % 100 AS sb,
        |    ${h("doc_id", 83)} % 4 AS slice FROM documents),
        |ref AS (SELECT bin, CAST(count(*) AS BIGINT) AS c_ref
        |        FROM d WHERE sb < 80 GROUP BY 1),
        |cur AS (SELECT slice, bin, CAST(count(*) AS BIGINT) AS c_cur
        |        FROM d GROUP BY 1, 2),
        |u AS (SELECT slice, bin
        |      FROM (SELECT DISTINCT slice FROM cur),
        |        (SELECT DISTINCT bin FROM (SELECT bin FROM ref
        |           UNION ALL SELECT bin FROM cur))),
        |j AS (SELECT u.slice, u.bin, coalesce(ref.c_ref, 0) AS c_ref,
        |        coalesce(cur.c_cur, 0) AS c_cur
        |      FROM u LEFT JOIN ref USING (bin)
        |        LEFT JOIN cur USING (slice, bin)),
        |t AS (SELECT slice, CAST(sum(c_ref) AS BIGINT) AS n_ref,
        |        CAST(sum(c_cur) AS BIGINT) AS n_cur,
        |        CAST(count(*) AS BIGINT) AS n_bins
        |      FROM j GROUP BY slice)
        |SELECT j.slice, j.bin, CAST(j.c_ref AS BIGINT) AS c_ref,
        |  CAST(j.c_cur AS BIGINT) AS c_cur,
        |  round(CAST(j.c_ref + 1 AS DOUBLE)
        |    / CAST(t.n_ref + t.n_bins AS DOUBLE), 4) AS p_ref,
        |  round(CAST(j.c_cur + 1 AS DOUBLE)
        |    / CAST(t.n_cur + t.n_bins AS DOUBLE), 4) AS p_cur,
        |  round((CAST(j.c_ref + 1 AS DOUBLE)
        |      / CAST(t.n_ref + t.n_bins AS DOUBLE)
        |    - CAST(j.c_cur + 1 AS DOUBLE)
        |      / CAST(t.n_cur + t.n_bins AS DOUBLE))
        |    * (ln(CAST(j.c_ref + 1 AS DOUBLE)
        |        / CAST(t.n_ref + t.n_bins AS DOUBLE))
        |      - ln(CAST(j.c_cur + 1 AS DOUBLE)
        |        / CAST(t.n_cur + t.n_bins AS DOUBLE))) * 10000, 4)
        |    AS psi_x1e4
        |FROM j JOIN t USING (slice) ORDER BY slice, bin""".stripMargin,
    // q201: five gram-count replays; most-frequent ties break (cnt DESC,
    // g DESC) both engines; a count-1 top gram scores 0; integer basis
    // points gate on the Table A1 cuts.
    "q201_gopher_repetition" ->
      """WITH t AS (SELECT doc_id, n_chars, string_split(text, ' ') AS w
        |  FROM documents),
        |c2 AS (SELECT doc_id, array_to_string(w[i:i+1], ' ') AS g,
        |    count(*) AS cnt
        |  FROM t, LATERAL unnest(generate_series(1, len(w) - 1)) AS u(i)
        |  GROUP BY 1, 2),
        |c3 AS (SELECT doc_id, array_to_string(w[i:i+2], ' ') AS g,
        |    count(*) AS cnt
        |  FROM t, LATERAL unnest(generate_series(1, len(w) - 2)) AS u(i)
        |  GROUP BY 1, 2),
        |c4 AS (SELECT doc_id, array_to_string(w[i:i+3], ' ') AS g,
        |    count(*) AS cnt
        |  FROM t, LATERAL unnest(generate_series(1, len(w) - 3)) AS u(i)
        |  GROUP BY 1, 2),
        |c5 AS (SELECT doc_id, array_to_string(w[i:i+4], ' ') AS g,
        |    count(*) AS cnt
        |  FROM t, LATERAL unnest(generate_series(1, len(w) - 4)) AS u(i)
        |  GROUP BY 1, 2),
        |c6 AS (SELECT doc_id, array_to_string(w[i:i+5], ' ') AS g,
        |    count(*) AS cnt
        |  FROM t, LATERAL unnest(generate_series(1, len(w) - 5)) AS u(i)
        |  GROUP BY 1, 2),
        |t2 AS (SELECT doc_id,
        |    CASE WHEN cnt >= 2 THEN cnt * len(g) ELSE 0 END AS chars
        |  FROM (SELECT doc_id, g, cnt, row_number() OVER
        |      (PARTITION BY doc_id ORDER BY cnt DESC, g DESC) AS rn
        |    FROM c2) WHERE rn = 1),
        |t3 AS (SELECT doc_id,
        |    CASE WHEN cnt >= 2 THEN cnt * len(g) ELSE 0 END AS chars
        |  FROM (SELECT doc_id, g, cnt, row_number() OVER
        |      (PARTITION BY doc_id ORDER BY cnt DESC, g DESC) AS rn
        |    FROM c3) WHERE rn = 1),
        |t4 AS (SELECT doc_id,
        |    CASE WHEN cnt >= 2 THEN cnt * len(g) ELSE 0 END AS chars
        |  FROM (SELECT doc_id, g, cnt, row_number() OVER
        |      (PARTITION BY doc_id ORDER BY cnt DESC, g DESC) AS rn
        |    FROM c4) WHERE rn = 1),
        |d5 AS (SELECT doc_id, sum(CASE WHEN cnt >= 2
        |    THEN (cnt - 1) * len(g) ELSE 0 END) AS chars
        |  FROM c5 GROUP BY 1),
        |d6 AS (SELECT doc_id, sum(CASE WHEN cnt >= 2
        |    THEN (cnt - 1) * len(g) ELSE 0 END) AS chars
        |  FROM c6 GROUP BY 1),
        |bp AS (SELECT t.doc_id, t.n_chars,
        |    CAST(round(coalesce(t2.chars, 0) * 10000.0 / t.n_chars)
        |      AS BIGINT) AS top2_bp,
        |    CAST(round(coalesce(t3.chars, 0) * 10000.0 / t.n_chars)
        |      AS BIGINT) AS top3_bp,
        |    CAST(round(coalesce(t4.chars, 0) * 10000.0 / t.n_chars)
        |      AS BIGINT) AS top4_bp,
        |    CAST(round(coalesce(d5.chars, 0) * 10000.0 / t.n_chars)
        |      AS BIGINT) AS dup5_bp,
        |    CAST(round(coalesce(d6.chars, 0) * 10000.0 / t.n_chars)
        |      AS BIGINT) AS dup6_bp
        |  FROM t LEFT JOIN t2 USING (doc_id) LEFT JOIN t3 USING (doc_id)
        |    LEFT JOIN t4 USING (doc_id) LEFT JOIN d5 USING (doc_id)
        |    LEFT JOIN d6 USING (doc_id))
        |SELECT *, top2_bp <= 2000 AND top3_bp <= 1800 AND top4_bp <= 1600
        |  AND dup5_bp <= 1500 AND dup6_bp <= 1400 AS passed
        |FROM bp ORDER BY doc_id""".stripMargin,
    // q202: both distance legs replayed exactly (q199's weight matrix +
    // fixed point), rank windows tie-broken on vec_id, overlap count.
    "q202_jl_ann_recall" ->
      s"""WITH e AS (SELECT vec_id, embedding FROM embeddings
        |           WHERE embedding IS NOT NULL),
        |ex AS (SELECT vec_id,
        |    CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT) AS xi,
        |    d1 - 1 AS d
        |  FROM (SELECT vec_id, unnest(embedding) AS x,
        |          generate_subscripts(embedding, 1) AS d1 FROM e)),
        |w AS (SELECT p, d,
        |    ${h("p::VARCHAR || ':' || d::VARCHAR", 11)} % 1000 - 500 AS w
        |  FROM range(0, 16) tp(p), (SELECT DISTINCT d FROM ex) td),
        |proj AS (SELECT vec_id, p, CAST(sum(xi * w) AS BIGINT) AS pr
        |  FROM ex JOIN w USING (d) GROUP BY 1, 2),
        |d2o AS (SELECT q.vec_id AS query_id, c.vec_id,
        |    CAST(sum((c.xi - q.xi) * (c.xi - q.xi)) AS BIGINT) AS d2o
        |  FROM ex c JOIN ex q ON c.d = q.d AND q.vec_id < 10
        |    AND c.vec_id <> q.vec_id
        |  GROUP BY 1, 2),
        |d2r AS (SELECT q.vec_id AS query_id, c.vec_id,
        |    CAST(sum((c.pr - q.pr) * (c.pr - q.pr)) AS BIGINT) AS d2r
        |  FROM proj c JOIN proj q ON c.p = q.p AND q.vec_id < 10
        |    AND c.vec_id <> q.vec_id
        |  GROUP BY 1, 2),
        |r AS (SELECT d2o.query_id, d2o.vec_id,
        |    row_number() OVER (PARTITION BY d2o.query_id
        |      ORDER BY d2o.d2o ASC, d2o.vec_id) AS rn_exact,
        |    row_number() OVER (PARTITION BY d2o.query_id
        |      ORDER BY d2r.d2r ASC, d2o.vec_id) AS rn_jl
        |  FROM d2o JOIN d2r USING (query_id, vec_id))
        |SELECT query_id,
        |  CAST(sum(CASE WHEN rn_exact <= 5 AND rn_jl <= 5 THEN 1
        |    ELSE 0 END) AS BIGINT) AS n_overlap,
        |  round(sum(CASE WHEN rn_exact <= 5 AND rn_jl <= 5 THEN 1
        |    ELSE 0 END) / 5.0, 4) AS recall_at_5
        |FROM r WHERE rn_exact <= 5 OR rn_jl <= 5
        |GROUP BY query_id ORDER BY query_id""".stripMargin,
    // q203: the three signal replays (q37 quality / q120 entropy / q112
    // logit), global row_number ranks — the engine's two-phase bin
    // machinery must land the identical global order — then the
    // q173-spelling integer RRF and the final consensus rank.
    "q203_quality_ensemble" ->
      s"""WITH $webFilterSignalsCtes,
        |qual AS (SELECT doc_id,
        |  round(least(CAST(len(string_split(text, ' ')) AS DOUBLE)
        |      / 100.0, 1.0) * 0.4
        |    + (CAST(len(list_filter(string_split(text, ' '),
        |         x -> x IN ('the','and','of','is','in','a'))) AS DOUBLE)
        |       / len(string_split(text, ' '))) * 0.3
        |    + (1.0 - CAST(len(regexp_extract_all(text, '[.,!?;:]'))
        |         AS DOUBLE) / length(text)) * 0.3, 4) AS quality
        |  FROM documents),
        |x AS (SELECT q.doc_id, q.quality, s.entropy, s.logit
        |      FROM qual q JOIN sig s USING (doc_id)),
        |r AS (SELECT doc_id,
        |    row_number() OVER (ORDER BY quality DESC, doc_id) AS q_rank,
        |    row_number() OVER (ORDER BY entropy DESC, doc_id) AS e_rank,
        |    row_number() OVER (ORDER BY logit DESC, doc_id) AS c_rank
        |  FROM x),
        |f AS (SELECT doc_id, q_rank, e_rank, c_rank,
        |    1000000000 // (60 + q_rank) + 1000000000 // (60 + e_rank)
        |      + 1000000000 // (60 + c_rank) AS rrf_fp
        |  FROM r)
        |SELECT CAST(doc_id AS BIGINT) AS doc_id,
        |  CAST(q_rank AS BIGINT) AS q_rank,
        |  CAST(e_rank AS BIGINT) AS e_rank,
        |  CAST(c_rank AS BIGINT) AS c_rank,
        |  CAST(rrf_fp AS BIGINT) AS rrf_fp,
        |  CAST(row_number() OVER (ORDER BY rrf_fp DESC, doc_id)
        |    AS BIGINT) AS ens_rank
        |FROM f ORDER BY doc_id""".stripMargin,
    // q204: both count-min matrices rebuilt exactly (the q114 replay),
    // per-row inner products, min-row estimate, exact Σ fA·fB.
    "q204_join_cardinality" ->
      """WITH a AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n
        |  FROM events WHERE event_type = 'signup' GROUP BY user_id),
        |b AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n
        |  FROM events WHERE event_type <> 'signup' GROUP BY user_id),
        |ha AS (SELECT user_id, n, r,
        |    ('0x' || substr(md5((101 + r)::VARCHAR || ':' ||
        |      user_id::VARCHAR), 1, 15))::BIGINT % 256 AS bk
        |  FROM a, (SELECT unnest([0, 1, 2, 3]) AS r) rws),
        |hb AS (SELECT user_id, n, r,
        |    ('0x' || substr(md5((101 + r)::VARCHAR || ':' ||
        |      user_id::VARCHAR), 1, 15))::BIGINT % 256 AS bk
        |  FROM b, (SELECT unnest([0, 1, 2, 3]) AS r) rws),
        |ca AS (SELECT r, bk, CAST(sum(n) AS BIGINT) AS cell
        |       FROM ha GROUP BY r, bk),
        |cb AS (SELECT r, bk, CAST(sum(n) AS BIGINT) AS cell
        |       FROM hb GROUP BY r, bk),
        |ip AS (SELECT ca.r, CAST(sum(ca.cell * cb.cell) AS BIGINT)
        |         AS inner_r
        |       FROM ca JOIN cb USING (r, bk) GROUP BY ca.r),
        |est AS (SELECT CAST(min(inner_r) AS BIGINT) AS est_size FROM ip),
        |ex AS (SELECT CAST(sum(a.n * b.n) AS BIGINT) AS exact_size
        |       FROM a JOIN b USING (user_id))
        |SELECT CAST(ip.r AS BIGINT) AS r, ip.inner_r, est.est_size,
        |  ex.exact_size
        |FROM ip, est, ex ORDER BY r""".stripMargin,
    // q205: hashed-3gram buckets (md5 seed 13), the seed-17 integer
    // weight matrix, integer dots/norms, ranks on the 4-dp rounded sim.
    "q205_text_embedding" ->
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk
        |           FROM documents),
        |g AS (SELECT doc_id, array_to_string(tk[i:i+2], ' ') AS g
        |      FROM t, LATERAL unnest(generate_series(1, len(tk) - 2))
        |        AS u(i)),
        |bc AS (SELECT doc_id,
        |    ${h("g", 13)} % 256 AS b, CAST(count(*) AS BIGINT) AS c
        |  FROM g GROUP BY 1, 2),
        |w AS (SELECT b, p,
        |    ${h("p::VARCHAR || ':' || b::VARCHAR", 17)} % 1000 - 500 AS w
        |  FROM range(0, 256) tb(b), range(0, 16) tp(p)),
        |e AS (SELECT doc_id, p, CAST(sum(c * w) AS BIGINT) AS v
        |      FROM bc JOIN w USING (b) GROUP BY 1, 2),
        |nm AS (SELECT doc_id, CAST(sum(v * v) AS BIGINT) AS n2
        |       FROM e GROUP BY 1),
        |d AS (SELECT q.doc_id AS query_id, c.doc_id AS neighbor_id,
        |    CAST(sum(c.v * q.v) AS BIGINT) AS dot
        |  FROM e c JOIN e q ON c.p = q.p AND q.doc_id < 5
        |    AND c.doc_id <> q.doc_id
        |  GROUP BY 1, 2),
        |s AS (SELECT d.query_id, d.neighbor_id,
        |    round(d.dot / (sqrt(nq.n2) * sqrt(nc.n2)), 4) AS sim
        |  FROM d JOIN nm nq ON nq.doc_id = d.query_id
        |    JOIN nm nc ON nc.doc_id = d.neighbor_id),
        |r AS (SELECT query_id, neighbor_id, sim,
        |    CAST(row_number() OVER (PARTITION BY query_id
        |      ORDER BY sim DESC, neighbor_id) AS BIGINT) AS rk
        |  FROM s)
        |SELECT query_id, rk, neighbor_id, sim
        |FROM r WHERE rk <= 3 ORDER BY query_id, rk""".stripMargin,
    // q205b: the xx64-kernel production leg is oracled by retrieval
    // LAWS valid for any draw of the embedding family (self-retrieval,
    // exact-dup recall, rank monotonicity, |sim| ≤ 1); has_dup is
    // data-derived from TEXT on both sides. Numeric kernel parity is
    // pinned by SimilaritySpec; the portable-md5 draw is q205.
    "q205b_text_embedding_kernel" ->
      """WITH t AS (SELECT doc_id, text FROM documents
        |           WHERE doc_id < 5 AND len(string_split(text, ' ')) >= 3),
        |d AS (SELECT t.doc_id,
        |        count(*) FILTER (WHERE b.doc_id <> t.doc_id) > 0 AS has_dup
        |      FROM t LEFT JOIN documents b ON b.text = t.text
        |      GROUP BY t.doc_id)
        |SELECT CAST(doc_id AS BIGINT) AS query_id,
        |  CAST(3 AS BIGINT) AS n_results, has_dup,
        |  true AS top1_unit, true AS dup_recalled, true AS sims_desc,
        |  true AS sims_bounded
        |FROM d ORDER BY query_id""".stripMargin,
    // q190: seeded cut points sorted into [lo, hi), three list slices
    // reassembled around PSM sentinels; non-FIM docs pass through.
    "q190_fim_transform" ->
      s"""WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS t,
        |             len(string_split(text, ' ')) AS n FROM documents),
        |c AS (SELECT doc_id, text, t, n,
        |        ${h("doc_id", 63)} % n AS a,
        |        ${h("doc_id", 64)} % n AS b,
        |        ${h("doc_id", 65)} % 100 < 50 AS fim_applied
        |      FROM t),
        |cut AS (SELECT *, 1 + least(a, b) AS lo, 1 + greatest(a, b) AS hi
        |        FROM c)
        |SELECT doc_id, fim_applied, CAST(n AS BIGINT) AS n_tokens,
        |  CASE WHEN fim_applied THEN array_to_string(
        |    list_concat(list_concat(list_concat(list_concat(list_concat(
        |      ['<PRE>'], t[1:lo-1]), ['<SUF>']), t[hi:n]), ['<MID>']),
        |      t[lo:hi-1]), ' ')
        |  ELSE text END AS text_fim
        |FROM cut ORDER BY doc_id""".stripMargin,
    // q188: seeded mask coins, gaps-and-islands spans, numbered
    // sentinels, ordered string_agg reassembly.
    "q188_span_corruption" ->
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS t
        |           FROM documents),
        |p AS (SELECT doc_id, i AS pos, t[i] AS tok
        |      FROM t, LATERAL unnest(generate_series(1, len(t))) AS u(i)),
        |m AS (SELECT doc_id, pos, tok,
        |        ${h("doc_id::VARCHAR || ':' || pos::VARCHAR", 61)} % 100
        |          < 15 AS msk
        |      FROM p),
        |s AS (SELECT *, msk AND NOT coalesce(lag(msk) OVER
        |        (PARTITION BY doc_id ORDER BY pos), false) AS st
        |      FROM m),
        |g AS (SELECT *, sum(CASE WHEN st THEN 1 ELSE 0 END) OVER
        |        (PARTITION BY doc_id ORDER BY pos) AS span_id
        |      FROM s),
        |pieces AS (SELECT doc_id, pos, msk, span_id,
        |    CASE WHEN NOT msk THEN tok
        |         WHEN st THEN '<X' || (span_id - 1) || '>' END AS ip,
        |    CASE WHEN msk AND st
        |           THEN '<X' || (span_id - 1) || '> ' || tok
        |         WHEN msk THEN tok END AS tp
        |  FROM g)
        |SELECT doc_id,
        |  coalesce(string_agg(ip, ' ' ORDER BY pos), '') AS input_text,
        |  coalesce(string_agg(tp, ' ' ORDER BY pos), '') AS target_text,
        |  CAST(coalesce(max(span_id), 0) AS BIGINT) AS n_spans,
        |  CAST(count(*) FILTER (WHERE msk) AS BIGINT) AS n_masked
        |FROM pieces GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // q116: wrap + strip both replayed — the regexes avoid backreferences
    // and lookarounds so the same patterns run under Java regex and RE2.
    "q116_html_extract" ->
      """WITH h AS (SELECT doc_id,
        |  '<html><head><title>Doc ' || doc_id ||
        |  '</title><script type="text/javascript">var t = 1 &amp;&amp; 2;' ||
        |  '</script><style>.nav { color: red; }</style></head><body>' ||
        |  '<div class="nav">Home | About</div><p>' || text ||
        |  '</p><footer>&amp;copy; 2026</footer></body></html>' AS x
        |  FROM documents),
        |s1 AS (SELECT doc_id, regexp_replace(x,
        |  '(?s)<script[^>]*>.*?</script>', ' ', 'g') AS x FROM h),
        |s2 AS (SELECT doc_id, regexp_replace(x,
        |  '(?s)<style[^>]*>.*?</style>', ' ', 'g') AS x FROM s1),
        |s3 AS (SELECT doc_id, regexp_replace(x, '<[^>]+>', ' ', 'g') AS x
        |       FROM s2),
        |s4 AS (SELECT doc_id,
        |  regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        |  regexp_replace(regexp_replace(x,
        |    '&lt;', '<', 'g'), '&gt;', '>', 'g'), '&quot;', '"', 'g'),
        |    '&#39;', '''', 'g'), '&nbsp;', ' ', 'g'), '&amp;', '&', 'g')
        |  AS x FROM s3)
        |SELECT doc_id, trim(regexp_replace(x, '\s+', ' ', 'g')) AS text_clean,
        |  CAST(length(trim(regexp_replace(x, '\s+', ' ', 'g'))) AS BIGINT)
        |    AS n_chars_clean
        |FROM s4 ORDER BY doc_id""".stripMargin,
    // q137: the q116 wrapper + strip chain, plus the WARC/HTTP framing
    // arithmetic — content_length is the octet length of the
    // reconstructed HTTP response message (status line + two headers +
    // blank line + html), exactly what the engine's codec must have
    // written into, and read back from, the record's Content-Length.
    "q137_warc_extract" ->
      """WITH h AS (SELECT doc_id,
        |  '<html><head><title>Doc ' || doc_id ||
        |  '</title><script type="text/javascript">var t = 1 &amp;&amp; 2;' ||
        |  '</script><style>.nav { color: red; }</style></head><body>' ||
        |  '<div class="nav">Home | About</div><p>' || text ||
        |  '</p><footer>&amp;copy; 2026</footer></body></html>' AS x
        |  FROM documents),
        |msg AS (SELECT doc_id, x,
        |  octet_length(encode('HTTP/1.1 200 OK' || chr(13) || chr(10) ||
        |    'Content-Type: text/html; charset=utf-8' || chr(13) || chr(10) ||
        |    'Content-Length: ' || octet_length(encode(x)) || chr(13) ||
        |    chr(10) || chr(13) || chr(10) || x)) AS content_length
        |  FROM h),
        |s1 AS (SELECT doc_id, content_length, regexp_replace(x,
        |  '(?s)<script[^>]*>.*?</script>', ' ', 'g') AS x FROM msg),
        |s2 AS (SELECT doc_id, content_length, regexp_replace(x,
        |  '(?s)<style[^>]*>.*?</style>', ' ', 'g') AS x FROM s1),
        |s3 AS (SELECT doc_id, content_length,
        |  regexp_replace(x, '<[^>]+>', ' ', 'g') AS x FROM s2),
        |s4 AS (SELECT doc_id, content_length,
        |  regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        |  regexp_replace(regexp_replace(x,
        |    '&lt;', '<', 'g'), '&gt;', '>', 'g'), '&quot;', '"', 'g'),
        |    '&#39;', '''', 'g'), '&nbsp;', ' ', 'g'), '&amp;', '&', 'g')
        |  AS x FROM s3)
        |SELECT doc_id, 'http://corpus.local/doc/' || doc_id AS uri,
        |  CAST(200 AS BIGINT) AS http_status,
        |  CAST(content_length AS BIGINT) AS content_length,
        |  trim(regexp_replace(x, '\s+', ' ', 'g')) AS text_clean,
        |  CAST(length(trim(regexp_replace(x, '\s+', ' ', 'g'))) AS BIGINT)
        |    AS n_chars_clean
        |FROM s4 ORDER BY doc_id""".stripMargin,
    // q118: asymmetric new-batch-vs-index LSH — generated like q32.
    "q118_incremental_neardup" -> q118IncrementalOracle,
    // q129: the persisted-index form is defined to produce exactly the
    // q118 output (the lifecycle changes, the math doesn't) — same
    // oracle, same cap-divergence note.
    "q129_indexed_neardup" -> q118IncrementalOracle,
    // q119: integer row_number machinery — exact.
    "q119_shuffle_order" ->
      s"""WITH b AS (SELECT doc_id AS id, ${h("doc_id", 37)} AS h
       FROM documents),
p AS (SELECT id, h, h % 8 AS bucket,
        CAST(row_number() OVER (PARTITION BY h % 8 ORDER BY h, id)
          AS BIGINT) AS rn
      FROM b),
o AS (SELECT bucket, CAST(COALESCE(sum(total) OVER (ORDER BY bucket
        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        AS bucket_offset
      FROM (SELECT bucket, count(*) AS total FROM p GROUP BY bucket))
SELECT p.id, o.bucket_offset + p.rn - 1 AS ord
FROM p JOIN o USING (bucket) ORDER BY p.id""",
    // q124: the full PQ train→encode→ADC loop — see the generator.
    "q124_pq_topk" -> q124PqOracle,
    // q123: each signal's replay is its parent query's oracle (q36 lang,
    // q120 entropy, q112 logit) joined per doc; the engine runs them in
    // one scan but the answer is identical.
    "q123_web_filter" -> q123WebFilterOracle,
    // q140: the q123 gate run under Structured Streaming micro-batches
    // — stateless per-row signals, so batch parity IS the contract.
    "q140_streaming_web_filter" -> q123WebFilterOracle,
    // q125: the manifest chain — the q123 signals, the multilingual
    // gate, q113's data-derived temperature thresholds ON THE KEPT SET,
    // and q119's rank machinery for the epoch order.
    "q125_training_manifest" ->
      s"""WITH $webFilterSignalsCtes,
kept AS (SELECT doc_id, pred_lang FROM sig
  WHERE (n_tokens BETWEEN 10 AND 5000) AND entropy >= 2.0 AND logit > 0),
cnt AS (SELECT pred_lang, CAST(count(*) AS BIGINT) AS n_stratum
        FROM kept GROUP BY 1),
thr AS (SELECT pred_lang,
          least(10000, CAST(floor(25000.0 / sqrt(CAST(n_stratum AS DOUBLE)))
            AS BIGINT)) AS threshold_bp
        FROM cnt),
samp AS (SELECT k.doc_id, k.pred_lang AS stratum
         FROM kept k JOIN thr USING (pred_lang)
         WHERE ${h("k.doc_id", 41)} % 10000 < thr.threshold_bp),
sbm AS (SELECT doc_id, stratum, ${h("doc_id", 37)} AS hh FROM samp),
spm AS (SELECT doc_id, stratum, hh, hh % 8 AS bucket,
         CAST(row_number() OVER (PARTITION BY hh % 8 ORDER BY hh, doc_id)
           AS BIGINT) AS rn
        FROM sbm),
som AS (SELECT bucket, CAST(COALESCE(sum(total) OVER (ORDER BY bucket
         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
         AS bucket_offset
        FROM (SELECT bucket, count(*) AS total FROM spm GROUP BY bucket))
SELECT spm.doc_id, spm.stratum, som.bucket_offset + spm.rn - 1 AS ord
FROM spm JOIN som USING (bucket) ORDER BY ord""",
    // q122: quantization, per-vector integer stats and the SQ dot
    // expansion replayed verbatim — integer sums are order-free and the
    // float combination is the identical expression tree, so even the
    // UNROUNDED sims (the window sort key) are bit-identical.
    "q122_quantized_topk" -> q122SqOracle,
    // q121: the cut line orders on ROUNDED pmi with word tie-breaks, so
    // a <=1-ulp ln difference cannot reorder the top-K boundary.
    "q121_pmi_collocations" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t
        |              FROM documents),
        |uni AS (SELECT tok AS w, count(*) AS c
        |        FROM (SELECT unnest(t) AS tok FROM toks) GROUP BY 1),
        |bg AS (SELECT t[i] AS w1, t[i+1] AS w2
        |       FROM toks, LATERAL unnest(generate_series(1, len(t) - 1))
        |         AS u(i)),
        |big AS (SELECT w1, w2, count(*) AS c_ab FROM bg GROUP BY 1, 2),
        |n AS (SELECT count(*) AS n FROM bg)
        |SELECT w1, w2, CAST(c_ab AS BIGINT) AS c_ab,
        |  round(ln(CAST(c_ab AS DOUBLE) * CAST(n.n AS DOUBLE)
        |    / (CAST(u1.c AS DOUBLE) * CAST(u2.c AS DOUBLE))), 4) AS pmi
        |FROM big JOIN uni u1 ON big.w1 = u1.w
        |         JOIN uni u2 ON big.w2 = u2.w, n
        |WHERE c_ab >= 5
        |ORDER BY pmi DESC, w1, w2 LIMIT 50""".stripMargin,
    // q128: generated per-round SQL — see q128PhraseVocabOracle.
    "q128_phrase_vocab" -> q128PhraseVocabOracle(rounds = 2),
    // q120: the ln fold runs over SORTED distinct tokens in both engines
    // (same summation order; q110's 4-dp measure-zero caveat applies).
    "q120_token_entropy" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
        |           FROM documents),
        |e AS (SELECT doc_id, len(toks) AS n_tokens,
        |        CAST(len(toks) AS DOUBLE) AS n,
        |        list_transform(list_sort(list_distinct(toks)),
        |          u -> CAST(len(list_filter(toks, x -> x = u)) AS DOUBLE))
        |          AS cs
        |      FROM t)
        |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
        |  round(-list_sum(list_transform(cs, c -> (c / n) * ln(c / n))), 4)
        |    AS entropy
        |FROM e ORDER BY doc_id""".stripMargin,
    // q117: q110's LM-score chain + the bounded value-histogram tercile
    // cuts (integer thresholds over 4-dp score cells — no interpolation,
    // no global sort; exact cross-engine).
    "q117_ppl_buckets" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |v AS (SELECT count(DISTINCT tok) AS vsz
        |      FROM (SELECT unnest(t) AS tok FROM toks)),
        |tri AS (
        |  SELECT doc_id, array_to_string(t[i:i+2], ' ') AS g3,
        |         array_to_string(t[i:i+1], ' ') AS g2
        |  FROM toks, LATERAL unnest(generate_series(1, len(t) - 2))
        |    AS u(i)),
        |c3 AS (SELECT g3, count(*) AS cn FROM tri GROUP BY g3),
        |bi AS (
        |  SELECT array_to_string(t[i:i+1], ' ') AS g2
        |  FROM toks, LATERAL unnest(generate_series(1, len(t) - 1))
        |    AS u(i)),
        |c2 AS (SELECT g2, count(*) AS cc FROM bi GROUP BY g2),
        |sc AS (
        |  SELECT CAST(t.doc_id AS BIGINT) AS doc_id,
        |    CAST(count(*) AS BIGINT) AS n_grams,
        |    round(avg(ln((COALESCE(c3.cn, 0) + 1)
        |      / CAST(COALESCE(c2.cc, 0) + v.vsz AS DOUBLE))), 4)
        |      AS avg_logprob
        |  FROM tri t LEFT JOIN c3 USING (g3) LEFT JOIN c2 USING (g2), v
        |  GROUP BY t.doc_id),
        |hist AS (SELECT avg_logprob AS s, count(*) AS c FROM sc GROUP BY 1),
        |cum AS (SELECT s, sum(c) OVER (ORDER BY s
        |          ROWS UNBOUNDED PRECEDING) AS cum FROM hist),
        |tot AS (SELECT count(*) AS n FROM sc),
        |cuts AS (SELECT
        |    min(CASE WHEN cum >= (n + 2) // 3 THEN s END) AS t1,
        |    min(CASE WHEN cum >= (2 * n + 2) // 3 THEN s END) AS t2
        |  FROM cum, tot)
        |SELECT doc_id, n_grams, avg_logprob,
        |  CASE WHEN avg_logprob <= t1 THEN 'tail'
        |       WHEN avg_logprob <= t2 THEN 'middle'
        |       ELSE 'head' END AS ppl_bucket
        |FROM sc, cuts ORDER BY doc_id""".stripMargin,
    "q109_mixture_by_budget" ->
      s"""WITH b AS (
  SELECT doc_id, lang AS domain,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         ${graft.llm.PortableSeededHash.sql("doc_id", 31)} AS h
  FROM documents),
p AS (SELECT doc_id, domain, n_tokens,
        CAST(sum(n_tokens) OVER (PARTITION BY domain
          ORDER BY h % 8, h, doc_id ROWS UNBOUNDED PRECEDING) AS BIGINT)
          AS cum_tokens
      FROM b)
SELECT doc_id, domain, n_tokens, cum_tokens,
  cum_tokens <= CASE domain
    WHEN 'en' THEN 6000 WHEN 'fr' THEN 3000 WHEN 'es' THEN 3000
    WHEN 'de' THEN 1500 WHEN 'zh' THEN 1500 ELSE 0 END AS kept
FROM p ORDER BY doc_id""",
    "q88_expectations" ->
      """SELECT check_name, violations, violations = 0 AS pass FROM (
        |  SELECT 'discount_in_range' AS check_name,
        |    CAST(sum(CASE WHEN l_discount BETWEEN 0.0 AND 0.1 THEN 0 ELSE 1 END) AS BIGINT) AS violations
        |  FROM lineitem
        |  UNION ALL SELECT 'orderkey_not_null',
        |    CAST(sum(CASE WHEN l_orderkey IS NOT NULL THEN 0 ELSE 1 END) AS BIGINT)
        |  FROM lineitem
        |  UNION ALL SELECT 'quantity_in_range',
        |    CAST(sum(CASE WHEN l_quantity BETWEEN 1.0 AND 50.0 THEN 0 ELSE 1 END) AS BIGINT)
        |  FROM lineitem
        |  UNION ALL SELECT 'quantity_under_25',
        |    CAST(sum(CASE WHEN l_quantity < 25.0 THEN 0 ELSE 1 END) AS BIGINT)
        |  FROM lineitem
        |  UNION ALL SELECT 'lineitem_key_unique',
        |    CAST(COALESCE(sum(n - 1), 0) AS BIGINT)
        |  FROM (SELECT count(*) AS n FROM lineitem
        |        GROUP BY l_orderkey, l_linenumber, l_partkey, l_suppkey)
        |  WHERE n > 1
        |  UNION ALL SELECT 'orderkey_unique',
        |    CAST(COALESCE(sum(n - 1), 0) AS BIGINT)
        |  FROM (SELECT count(*) AS n FROM lineitem GROUP BY l_orderkey)
        |  WHERE n > 1)
        |ORDER BY check_name""".stripMargin,
    "q80_hll_sketch_union" ->
      """SELECT event_type,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
        |  TRUE AS union_ok
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q78_string_distance" ->
      """SELECT c_custkey, c_name,
        |  CAST(levenshtein(c_name, reverse(c_name)) AS BIGINT) AS lev_rev,
        |  CAST(levenshtein(c_name,
        |    translate(c_name, '0123456789', 'XXXXXXXXXX')) AS BIGINT)
        |    AS lev_mask,
        |  lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS padded,
        |  translate(c_mktsegment, 'AEIOU', 'aeiou') AS segment_t
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q75_json_roundtrip" ->
      """SELECT event_id, user_id, event_type, value, props,
        |  epoch_us(ts) AS ts_us
        |FROM events ORDER BY event_id""".stripMargin,
    // q136: same identity contract through the ORC codec.
    "q136_orc_roundtrip" ->
      """SELECT event_id, user_id, event_type, value, props,
        |  epoch_us(ts) AS ts_us
        |FROM events ORDER BY event_id""".stripMargin,
    "q76_zorder_layout" ->
      """SELECT user_id, CAST(count(*) AS BIGINT) AS n,
        |  round(sum(value), 2) AS sum_value
        |FROM events
        |WHERE user_id BETWEEN 10 AND 20
        |  AND date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
        |      BETWEEN 5 AND 15
        |GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q84_zorder_nd" ->
      """SELECT user_id, etype_code, CAST(count(*) AS BIGINT) AS n,
        |  round(sum(value), 2) AS sum_value
        |FROM (SELECT user_id, value,
        |        date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS day_num,
        |        CAST(CASE event_type WHEN 'click' THEN 0 WHEN 'error' THEN 1
        |             WHEN 'purchase' THEN 2 WHEN 'signup' THEN 3
        |             ELSE 4 END AS BIGINT) AS etype_code
        |      FROM events)
        |WHERE user_id BETWEEN 10 AND 20 AND day_num BETWEEN 5 AND 15
        |  AND etype_code <= 2
        |GROUP BY user_id, etype_code
        |ORDER BY user_id, etype_code""".stripMargin,
    "q72_containment" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |sh AS (SELECT doc_id,
        |         list_distinct(list_transform(range(1, len(ws) - 1),
        |           i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS s
        |       FROM w WHERE len(ws) >= 3),
        |ex AS (SELECT doc_id, unnest(s) AS sg FROM sh),
        |sz AS (SELECT doc_id, len(s) AS sz FROM sh),
        |p AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS inter
        |      FROM ex a JOIN ex b ON a.sg = b.sg AND a.doc_id < b.doc_id
        |      GROUP BY 1, 2)
        |SELECT da AS doc_a, db AS doc_b,
        |  round(CAST(inter AS DOUBLE) / least(sa.sz, sb.sz), 4) AS containment
        |FROM p JOIN sz sa ON p.da = sa.doc_id JOIN sz sb ON p.db = sb.doc_id
        |WHERE CAST(inter AS DOUBLE) / least(sa.sz, sb.sz) >= 0.5
        |ORDER BY doc_a, doc_b""".stripMargin,
    // q96: the exact containment pairs (same computation as q72) each
    // flagged TRUE — the Spark side sets the flag from the sketch path
    // finding the pair with an identical value, so a recall/value
    // regression hash-mismatches.
    "q96_containment_sketch" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |sh AS (SELECT doc_id,
        |         list_distinct(list_transform(range(1, len(ws) - 1),
        |           i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS s
        |       FROM w WHERE len(ws) >= 3),
        |ex AS (SELECT doc_id, unnest(s) AS sg FROM sh),
        |sz AS (SELECT doc_id, len(s) AS sz FROM sh),
        |p AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS inter
        |      FROM ex a JOIN ex b ON a.sg = b.sg AND a.doc_id < b.doc_id
        |      GROUP BY 1, 2)
        |SELECT da AS doc_a, db AS doc_b,
        |  round(CAST(inter AS DOUBLE) / least(sa.sz, sb.sz), 4) AS containment,
        |  true AS found_by_sketch
        |FROM p JOIN sz sa ON p.da = sa.doc_id JOIN sz sb ON p.db = sb.doc_id
        |WHERE CAST(inter AS DOUBLE) / least(sa.sz, sb.sz) >= 0.5
        |ORDER BY doc_a, doc_b""".stripMargin,
    // q97: the oracle replays the 15-token segmentation, resolves first
    // occurrences with a (doc_id, pos)-ordered window, and reassembles —
    // independent formulation of the same line-dedup contract.
    "q97_line_dedup" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |seg AS (SELECT doc_id, CAST(t.i AS BIGINT) AS pos,
        |          array_to_string(ws[(t.i*15+1):(t.i*15+15)], ' ') AS line
        |        FROM w, LATERAL unnest(range(CAST(ceil(len(ws)/15.0) AS BIGINT))) AS t(i)),
        |rk AS (SELECT doc_id, pos, line,
        |         row_number() OVER (PARTITION BY line ORDER BY doc_id, pos) AS rn
        |       FROM seg),
        |agg AS (SELECT doc_id, string_agg(line, ' ' ORDER BY pos) AS text,
        |          CAST(count(*) AS BIGINT) AS n_kept
        |        FROM rk WHERE rn = 1 GROUP BY doc_id),
        |base AS (SELECT doc_id, CAST(ceil(len(ws)/15.0) AS BIGINT) AS n_lines
        |         FROM w)
        |SELECT b.doc_id, coalesce(a.text, '') AS text, b.n_lines,
        |  coalesce(a.n_kept, 0) AS n_kept
        |FROM base b LEFT JOIN agg a USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
    // q98: the oracle predicts the decoded image metadata analytically
    // (dimensions + band-0 pixel sum are pure integer formulas of
    // doc_id) — the Spark side must produce them through a REAL PNG
    // encode + decode (JDK ImageIO), so codec faults hash-mismatch.
    "q98_image_roundtrip" -> q98ImageRoundtripOracle,
    // q130: the streaming replay of the q98 pipeline must land the SAME
    // rows — identical analytic oracle; a dropped or duplicated row in
    // the micro-batch replay (or any codec fault) hash-mismatches.
    "q130_streaming_media" -> q98ImageRoundtripOracle,
    // q102: like q98, the oracle predicts the decoded audio metadata
    // analytically (sample count + signed-sample sum are pure integer
    // formulas of doc_id) — the Spark side must produce them through a
    // REAL WAV encode + decode (javax.sound.sampled), so a header
    // misread or sample corruption hash-mismatches.
    "q102_audio_roundtrip" ->
      """WITH d AS (SELECT doc_id, 32 + doc_id % 97 AS ns FROM documents),
        |s AS (SELECT doc_id, ns,
        |        CAST((doc_id * 31 + t.i * 17) % 4001 - 2000 AS BIGINT) AS v
        |      FROM d, LATERAL unnest(range(ns)) AS t(i))
        |SELECT doc_id, CAST(8000 AS BIGINT) AS sample_rate,
        |  CAST(1 AS BIGINT) AS channels, CAST(ns AS BIGINT) AS n_samples,
        |  CAST(sum(v) AS BIGINT) AS sum_val
        |FROM s GROUP BY doc_id, ns
        |ORDER BY doc_id""".stripMargin,
    // q103: like q98/q102, the oracle predicts the decoded video
    // metadata analytically (dimensions, frame count and the pixel sum
    // are pure integer formulas of doc_id) — the Spark side must
    // produce them through a REAL RIFF-AVI container encode + chunk-walk
    // decode, so a header misread or frame drop hash-mismatches.
    "q103_video_roundtrip" ->
      """WITH d AS (SELECT doc_id, 8 + 4 * (doc_id % 12) AS w,
        |                  8 + (doc_id * 3) % 17 AS h,
        |                  2 + doc_id % 7 AS nf
        |           FROM documents),
        |px AS (SELECT doc_id, w, h, nf,
        |         CAST((x.i + 2 * y.i + 3 * f.i + doc_id) % 256 AS BIGINT) AS g
        |       FROM d, LATERAL unnest(range(w)) AS x(i),
        |            LATERAL unnest(range(h)) AS y(i),
        |            LATERAL unnest(range(nf)) AS f(i))
        |SELECT doc_id, CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
        |  CAST(nf AS BIGINT) AS n_frames, CAST(sum(g) AS BIGINT) AS sum_px
        |FROM px GROUP BY doc_id, w, h, nf
        |ORDER BY doc_id""".stripMargin,
    // q104: frame sampling (keep every 3rd frame) over the q103
    // container — the oracle filters the same analytic pixel grid to
    // the sampled frames, so a stream-order or modulo fault in the
    // chunk-walk frame indexing hash-mismatches.
    "q104_video_frame_sample" ->
      """WITH d AS (SELECT doc_id, 8 + 4 * (doc_id % 12) AS w,
        |                  8 + (doc_id * 3) % 17 AS h,
        |                  2 + doc_id % 7 AS nf
        |           FROM documents),
        |px AS (SELECT doc_id, nf, f.i AS f,
        |         CAST((x.i + 2 * y.i + 3 * f.i + doc_id) % 256 AS BIGINT) AS g
        |       FROM d, LATERAL unnest(range(w)) AS x(i),
        |            LATERAL unnest(range(h)) AS y(i),
        |            LATERAL unnest(range(nf)) AS f(i))
        |SELECT doc_id, CAST(nf AS BIGINT) AS n_frames,
        |  CAST(count(DISTINCT f) AS BIGINT) AS sampled_frames,
        |  CAST(sum(g) AS BIGINT) AS sampled_px
        |FROM px WHERE f % 3 = 0
        |GROUP BY doc_id, nf
        |ORDER BY doc_id""".stripMargin,
    // q126: the oracle replays the 2×2 box-filter downscale analytically
    // — block sums of the q98 pixel formula with truncating integer
    // division (DuckDB `//` == Java int `/` on non-negatives) — while
    // the Spark side runs encode → decode → resize → re-encode → decode
    // through the REAL PNG codec at every stage. The three block pixels
    // collapse: p(2x,2y)=s%256, p(2x+1,2y)=p(2x,2y+1)=(s+1)%256,
    // p(2x+1,2y+1)=(s+2)%256 with s=2x+2y+id.
    "q126_image_resize" ->
      """WITH d AS (SELECT doc_id, (8 + doc_id % 25) // 2 AS rw,
        |                  (8 + (doc_id * 7) % 25) // 2 AS rh
        |           FROM documents),
        |px AS (SELECT doc_id, rw, rh,
        |         ((2 * x.i + 2 * y.i + doc_id) % 256
        |          + 2 * ((2 * x.i + 2 * y.i + doc_id + 1) % 256)
        |          + (2 * x.i + 2 * y.i + doc_id + 2) % 256) // 4 AS g
        |       FROM d, LATERAL unnest(range(rw)) AS x(i),
        |            LATERAL unnest(range(rh)) AS y(i))
        |SELECT doc_id, CAST(rw AS BIGINT) AS width, CAST(rh AS BIGINT) AS height,
        |  CAST(rw * rh AS BIGINT) AS n_pixels, CAST(sum(g) AS BIGINT) AS sum_gray
        |FROM px GROUP BY doc_id, rw, rh
        |ORDER BY doc_id""".stripMargin,
    // q127: 16-bucket histogram of REAL decoded pixel values — the
    // oracle buckets the same analytic pixel grid and left-joins onto
    // the full bucket range so zero-count buckets survive (the engine's
    // fixed-length histogram array posexplodes all 16).
    "q127_image_features" ->
      """WITH d AS (SELECT doc_id, 8 + doc_id % 25 AS w,
        |                  8 + (doc_id * 7) % 25 AS h
        |           FROM documents),
        |px AS (SELECT doc_id, ((x.i + y.i + doc_id) % 256) // 16 AS bucket
        |       FROM d, LATERAL unnest(range(w)) AS x(i),
        |            LATERAL unnest(range(h)) AS y(i)),
        |c AS (SELECT doc_id, bucket, count(*) AS cnt
        |      FROM px GROUP BY doc_id, bucket),
        |grid AS (SELECT doc_id, b.i AS bucket
        |         FROM documents, LATERAL unnest(range(16)) AS b(i))
        |SELECT g.doc_id, CAST(g.bucket AS BIGINT) AS bucket,
        |  CAST(coalesce(c.cnt, 0) AS BIGINT) AS cnt
        |FROM grid g LEFT JOIN c ON g.doc_id = c.doc_id AND g.bucket = c.bucket
        |ORDER BY g.doc_id, g.bucket""".stripMargin,
    // q95: DuckDB pins the exact cosine-threshold pair count; the flags
    // assert the bucket join emitted a ≥20%-recall subset of those pairs.
    "q95_ann_rewrite" ->
      """WITH p AS (SELECT a.vec_id AS va, b.vec_id AS vb
        |  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |  WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.4)
        |SELECT CAST(count(*) AS BIGINT) AS n_exact,
        |  true AS subset_ok, true AS recall_ok
        |FROM p""".stripMargin,
    "q73_label_centroids" ->
      """WITH ex AS (
        |  SELECT vec_id, label, d1 - 1 AS d,
        |         CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT) AS xi
        |  FROM (SELECT vec_id, label, unnest(embedding) AS x,
        |               generate_subscripts(embedding, 1) AS d1
        |        FROM embeddings)),
        |cent AS (SELECT label, d, CAST(sum(xi) AS BIGINT) AS m
        |         FROM ex GROUP BY 1, 2),
        |nm AS (SELECT label, CAST(sum(m * m) AS BIGINT) AS nm
        |       FROM cent GROUP BY 1),
        |per AS (SELECT e.vec_id, e.label,
        |          CAST(sum(e.xi * c.m) AS BIGINT) AS dot,
        |          CAST(sum(e.xi * e.xi) AS BIGINT) AS nx
        |        FROM ex e JOIN cent c USING (label, d) GROUP BY 1, 2)
        |SELECT p.vec_id, p.label,
        |  round(p.dot / (sqrt(CAST(p.nx AS DOUBLE)) * sqrt(CAST(n.nm AS DOUBLE))), 4)
        |    AS centroid_sim
        |FROM per p JOIN nm n USING (label)
        |ORDER BY p.vec_id""".stripMargin,
    "q22_e1_config_extract" ->
      """SELECT event_id, strftime(ts, '%Y-%m-%d') AS day, user_id, event_type,
        |  CAST(regexp_extract(props, '[0-9]+') AS BIGINT) AS prop_k,
        |  round(value, 2) AS value_r
        |FROM events
        |WHERE event_type <> 'error'
        |  AND CAST(regexp_extract(props, '[0-9]+') AS BIGINT) IS NOT NULL
        |ORDER BY event_id""".stripMargin,
    "q23_e2_profile_daily" ->
      """WITH ord AS (
        |  SELECT o_custkey AS custkey, o_orderkey,
        |         strftime(o_orderdate, '%Y-%m-%d') AS day,
        |         o_orderstatus, o_totalprice
        |  FROM orders),
        |min_day AS (SELECT custkey, min(day) AS min_day FROM ord GROUP BY 1),
        |li AS (
        |  SELECT l_orderkey AS o_orderkey,
        |         strftime(l_shipdate, '%Y-%m-%d') AS day,
        |         l_quantity, l_returnflag
        |  FROM lineitem),
        |hist AS (
        |  SELECT o.custkey, li.day, li.l_quantity, li.l_returnflag
        |  FROM li
        |  JOIN (SELECT custkey, o_orderkey FROM ord) o USING (o_orderkey)
        |  JOIN min_day USING (custkey)
        |  WHERE date_diff('day', CAST(min_day AS DATE), CAST(li.day AS DATE))
        |        BETWEEN 0 AND 14),
        |hist_agg AS (
        |  SELECT custkey, day, round(sum(l_quantity), 2) AS qty,
        |         CAST(count(*) AS BIGINT) AS n_lines,
        |         CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS n_returns
        |  FROM hist GROUP BY 1, 2),
        |txp_agg AS (
        |  SELECT custkey, day,
        |         CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS open_orders,
        |         CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS done_orders,
        |         CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS pending_orders,
        |         round(sum(o_totalprice), 2) AS spend
        |  FROM ord GROUP BY 1, 2),
        |profile AS (
        |  SELECT COALESCE(h.custkey, t.custkey) AS custkey,
        |         COALESCE(h.day, t.day) AS day,
        |         COALESCE(qty, 0.0) AS qty,
        |         COALESCE(n_lines, 0) AS n_lines,
        |         COALESCE(n_returns, 0) AS n_returns,
        |         COALESCE(open_orders, 0) AS open_orders,
        |         COALESCE(done_orders, 0) AS done_orders,
        |         COALESCE(pending_orders, 0) AS pending_orders,
        |         COALESCE(spend, 0.0) AS spend
        |  FROM hist_agg h
        |  FULL OUTER JOIN txp_agg t ON h.custkey = t.custkey AND h.day = t.day)
        |SELECT p.custkey, p.day, p.qty, p.n_lines, p.n_returns,
        |       p.open_orders, p.done_orders, p.pending_orders, p.spend,
        |       c.c_name, CAST(c.c_nationkey AS BIGINT) AS nationkey
        |FROM profile p JOIN customer c ON p.custkey = c.c_custkey
        |ORDER BY p.custkey, p.day""".stripMargin,
    "q24_aes_roundtrip" ->
      """SELECT c_custkey, c_name AS decrypted FROM customer
        |ORDER BY c_custkey""".stripMargin,
    "q26_e1_multi_sink" ->
      """WITH a AS (
        |  SELECT 'testpilot' AS src, event_id AS key,
        |         strftime(ts, '%Y-%m-%d') AS day, event_type AS attr,
        |         CAST(CAST(regexp_extract(props, '[0-9]+') AS BIGINT)
        |              AS VARCHAR) AS val
        |  FROM events
        |  WHERE event_type IN ('click', 'view')
        |    AND CAST(regexp_extract(props, '[0-9]+') AS BIGINT) IS NOT NULL),
        |b AS (
        |  SELECT 'testpilottest' AS src, event_id AS key,
        |         strftime(ts, '%Y-%m-%d') AS day, event_type AS attr,
        |         CAST(CAST(round(value * 100) AS BIGINT) AS VARCHAR) AS val
        |  FROM events WHERE event_type NOT IN ('click', 'view')),
        |c AS (
        |  SELECT 'search' AS src, c_custkey AS key, '' AS day,
        |         string_split(c_name, '#')[1] AS attr,
        |         CAST(c_mktsegment IN ('AUTOMOBILE', 'MACHINERY') AS VARCHAR)
        |           || ':' ||
        |           CAST(CAST(round(c_acctbal * 100) AS BIGINT) AS VARCHAR) AS val
        |  FROM customer)
        |SELECT * FROM a UNION ALL SELECT * FROM b UNION ALL SELECT * FROM c
        |ORDER BY src, key""".stripMargin,
    "q27_nested_shred" ->
      """WITH agg AS (
        |  SELECT user_id, count(*) AS n_events,
        |         first(event_type ORDER BY epoch_us(ts), event_id)
        |           AS first_event
        |  FROM events GROUP BY user_id)
        |SELECT user_id,
        |  ['en-US','de-DE','fr-FR','es-ES','pt-BR'][(user_id % 5 + 1)]
        |    AS locale,
        |  (user_id % 2 = 0) AS telemetry,
        |  (user_id % 3 = 0) AS has_addon,
        |  CASE WHEN user_id % 3 = 0
        |       THEN '1.' || (user_id % 10)::VARCHAR END AS cliqz_version,
        |  first_event, CAST(n_events AS BIGINT) AS n_events
        |FROM agg ORDER BY user_id""".stripMargin,
    "q28_chunking" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |c AS (SELECT doc_id,
        |        list_transform(range(0, CAST(ceil(len(ws) / 32.0) AS INT)),
        |          i -> array_to_string(ws[i*32+1 : i*32+32], ' ')) AS chunks
        |      FROM w)
        |SELECT doc_id,
        |  CAST(generate_subscripts(chunks, 1) - 1 AS BIGINT) AS chunk_id,
        |  CAST(len(string_split(unnest(chunks), ' ')) AS BIGINT)
        |    AS chunk_tokens,
        |  unnest(chunks) AS chunk_text
        |FROM c ORDER BY doc_id, chunk_id""".stripMargin,
    "q29_hash_split" ->
      """SELECT doc_id,
        |  ('0x' || substr(md5('42:' || doc_id), 1, 15))::BIGINT % 100
        |    AS bucket,
        |  CASE WHEN ('0x' || substr(md5('42:' || doc_id), 1, 15))::BIGINT % 100 < 80 THEN 'train'
        |       WHEN ('0x' || substr(md5('42:' || doc_id), 1, 15))::BIGINT % 100 < 90 THEN 'val'
        |       ELSE 'test' END AS split
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q30_exact_dedup" ->
      """SELECT CAST(min(doc_id) AS BIGINT) AS keep_id,
        |  CAST(count(*) AS BIGINT) AS dup_count, md5(text) AS fp
        |FROM documents GROUP BY text ORDER BY keep_id""".stripMargin,
    "q31_ngram_jaccard" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |sh AS (SELECT doc_id,
        |         list_distinct(list_transform(range(1, len(ws) - 1),
        |           i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS s
        |       FROM w WHERE len(ws) >= 3),
        |ex AS (SELECT doc_id, unnest(s) AS sg FROM sh),
        |sz AS (SELECT doc_id, len(s) AS sz FROM sh),
        |p AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS inter
        |      FROM ex a JOIN ex b ON a.sg = b.sg AND a.doc_id < b.doc_id
        |      GROUP BY 1, 2)
        |SELECT da AS doc_a, db AS doc_b,
        |  round(CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter), 4) AS jaccard
        |FROM p JOIN sz sa ON p.da = sa.doc_id JOIN sz sb ON p.db = sb.doc_id
        |WHERE CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter) >= 0.1
        |ORDER BY doc_a, doc_b""".stripMargin,
    "q32_minhash_lsh" -> q32MinhashOracle(),
    "q33_simhash_pairs" -> q33SimhashOracle,
    "q63_neardup_clusters" -> q63ClustersOracle(),
    "q163_leakage_safe_split" -> q163LeakageSplitOracle,
    // q100: the single-pass artifact bundle's clusters must satisfy the
    // SAME independent closure oracle as the standalone q63
    "q100_neardup_artifacts" -> q63ClustersOracle(),
    "q67_deduped_corpus" ->
      s"""SELECT d.doc_id, d.lang, d.n_chars FROM documents d
WHERE d.doc_id NOT IN (
  SELECT doc_id FROM (${q63ClustersOracle()}) WHERE NOT is_keeper)
ORDER BY d.doc_id""",
    "q35_ann_lsh" -> q35AnnLshOracle,
    "q77_kmeans_clusters" -> q77KmeansOracle,
    "q108_prototype_prune" -> q108PrototypePruneOracle,
    "q82_ivf_trained" -> q82IvfTrainedOracle,
    "q99_semantic_dedup" -> q99SemanticDedupOracle,
    "q101_streaming_neardup" -> q101StreamNearDupOracle,
    "q79_corpus_pipeline" -> q79PipelineOracle,
    "q35b_ann_ivf" -> q35bIvfOracle,
    "q34_cosine_topk" -> q34CosineTopKOracle,
    // q131: recall@5 of every ANN leg vs the exact q34 ground truth —
    // each leg's full oracle replayed as a derived table, see generator.
    "q131_ann_recall" -> q131AnnRecallOracle,
    // q164: MRR + nDCG@5 per ANN leg — q131's leg replays with their
    // ranks kept, the metric arithmetic over a dense method×query grid.
    "q164_retrieval_metrics" -> q164RetrievalMetricsOracle,
    "q132_ann_lsh_multi" -> q132LshMultiOracle,
    // q138: the q132 multi-table collision join as an all-nodes
    // self-join, per-src rounded-cosine top-5, mutual = transpose hit.
    // The engine's maxBucket cap (2^12) is not replayed — the q118/q32
    // convention: no bucket approaches the cap at oracle SFs.
    "q138_knn_graph" -> q138KnnGraphOracle,
    // q139: q77 k-means strata + the q113 temperature coin over cells.
    "q139_cluster_balanced_sample" -> q139ClusterBalancedOracle,
    // q141: q138's mutual edges + the q99-style recursive closure.
    "q141_knn_graph_clusters" -> q141KnnClustersOracle,
    // q167: label propagation over the q138 graph — rounds unrolled.
    "q167_label_propagation" -> q167LabelPropOracle,
    // q170: binary sign-bit Hamming ANN — integer end-to-end.
    "q170_hamming_ann" -> q170HammingAnnOracle,
    // q173: RRF fusion of the q170 + q122 legs — both chains replayed,
    // fused by integer-division reciprocal ranks.
    "q173_rrf_fusion" -> q173RrfOracle,
    // q174: triangles + clustering coefficient on the mutual-kNN graph
    // — the q138 edges, mutual restriction, the ordered two-join with
    // EXISTS closure, exact integer counts, 4-dp coefficient.
    "q174_clustering_coeff" -> q174ClusteringOracle,
    // q168: HLL — every register (portable-hash index + trailing-zero
    // rank as pure integer bit ops) and the estimator arithmetic
    // (identical literal spelling, integer Σ2^(40−M)) replayed.
    "q168_hll_distinct" -> q168HllOracle,
    // q172: the streaming-maintained sketch's final state must equal the
    // batch registers (element-wise max is batch-split invariant) — the
    // oracle is q168's verbatim.
    "q172_streaming_hll" -> q168HllOracle,
    // q142: the persisted-index form is defined to produce exactly the
    // q82 output (build-once lifecycle + DPP probe; the math is q82's).
    "q142_indexed_ivf_ann" -> q82IvfTrainedOracle,
    // q143: per-domain crawl report — host reconstructed from source,
    // content_length replays the q137 HTTP-framing arithmetic, the
    // blocklist is the same literal set.
    "q143_domain_stats" ->
      """WITH h AS (SELECT doc_id, source,
        |  '<html><head><title>Doc ' || doc_id ||
        |  '</title><script type="text/javascript">var t = 1 &amp;&amp; 2;' ||
        |  '</script><style>.nav { color: red; }</style></head><body>' ||
        |  '<div class="nav">Home | About</div><p>' || text ||
        |  '</p><footer>&amp;copy; 2026</footer></body></html>' AS x
        |  FROM documents),
        |msg AS (SELECT doc_id, source || '.crawl.example' AS host,
        |  octet_length(encode('HTTP/1.1 200 OK' || chr(13) || chr(10) ||
        |    'Content-Type: text/html; charset=utf-8' || chr(13) || chr(10) ||
        |    'Content-Length: ' || octet_length(encode(x)) || chr(13) ||
        |    chr(10) || chr(13) || chr(10) || x)) AS content_length
        |  FROM h)
        |SELECT host, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(content_length) AS BIGINT) AS total_bytes,
        |  host IN ('src7.crawl.example', 'src13.crawl.example') AS blocked
        |FROM msg GROUP BY host ORDER BY host""".stripMargin,
    // q144: 5 unrolled fixed-point power iterations — all-long
    // arithmetic, so the replay is exact (see generator).
    "q144_host_pagerank" -> q144PageRankOracle,
    // q175: TrustRank — q144's graph, seed-concentrated teleport.
    "q175_trust_rank" -> q175TrustRankOracle,
    // q145: bottom-8-by-portable-hash per source + the KMV estimator
    // off the same kth hash — integer end-to-end.
    "q145_bottomk_sample" -> q145BottomKOracle,
    // q150: the SAME sample maintained by the streaming bottom_k
    // aggregate — final-state parity with batch q145 IS the contract.
    "q150_streaming_bottomk" -> q145BottomKOracle,
    // q146: tar-shard sink/source identity, like the ORC/JSON/WARC tiers.
    "q146_tar_shards" ->
      "SELECT doc_id, lang, source, text FROM documents ORDER BY doc_id",
    // q147: the spelling synthesis + canonicalization rules 1-6 replayed
    // with DuckDB's regexp/list functions (patterns in the Java∩RE2
    // common subset).
    "q147_url_canonical" ->
      """WITH raw AS (SELECT doc_id,
        |  CASE WHEN doc_id % 2 = 0 THEN 'HTTP' ELSE 'http' END || '://' ||
        |  CASE WHEN doc_id % 2 = 0
        |    THEN 'Src' || ((doc_id // 2) % 20) || '.Example.COM:80'
        |    ELSE 'src' || ((doc_id // 2) % 20) || '.example.com' END ||
        |  CASE WHEN (doc_id // 2) % 7 = 0 THEN ''
        |    ELSE '/p/' || (doc_id // 2) END ||
        |  CASE WHEN doc_id % 2 = 0 THEN '?b=2&utm_source=news&a=1'
        |    ELSE '?a=1&b=2&fbclid=XYZ#frag' END AS url_raw
        |  FROM documents),
        |cn AS (SELECT doc_id, url_raw,
        |  regexp_replace(url_raw, '#.*$', '') AS nf FROM raw),
        |parts AS (SELECT doc_id, url_raw,
        |  lower(regexp_extract(nf, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))
        |    AS scheme,
        |  lower(regexp_extract(nf,
        |    '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)) AS auth0,
        |  regexp_extract(nf,
        |    '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1) AS path0,
        |  COALESCE(regexp_extract(nf, '\?([^#]*)', 1), '') AS query0
        |  FROM cn),
        |canon AS (SELECT doc_id, url_raw,
        |  scheme || '://' ||
        |  (CASE WHEN scheme = 'http'
        |      THEN regexp_replace(auth0, ':80$', '')
        |    WHEN scheme = 'https'
        |      THEN regexp_replace(auth0, ':443$', '')
        |    ELSE auth0 END) ||
        |  (CASE WHEN path0 = '' THEN '/' ELSE path0 END) ||
        |  (CASE WHEN q = '' THEN '' ELSE '?' || q END) AS url_canon
        |  FROM (SELECT *, array_to_string(list_sort(list_filter(
        |      string_split(query0, '&'),
        |      p -> NOT regexp_matches(p,
        |        '^(utm_[^=]*|fbclid|gclid|msclkid)(=|$)')
        |        AND p <> '')), '&') AS q
        |    FROM parts))
        |SELECT c.doc_id, c.url_raw, c.url_canon, g.keep_id, g.n_spellings
        |FROM canon c JOIN (SELECT url_canon AS uc,
        |    CAST(min(doc_id) AS BIGINT) AS keep_id,
        |    CAST(count(*) AS BIGINT) AS n_spellings
        |  FROM canon GROUP BY 1) g ON c.url_canon = g.uc
        |ORDER BY c.doc_id""".stripMargin,
    // q148: the three versions' contents are pure doc_id predicates —
    // v1 ≡0 (mod 3), v2 adds ≡1, v3 overwrites with ≡0 (mod 5).
    "q148_snapshot_timetravel" ->
      """SELECT 1 AS version, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(doc_id) AS BIGINT) AS sum_id,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents WHERE doc_id % 3 = 0
        |UNION ALL
        |SELECT 2, CAST(count(*) AS BIGINT), CAST(sum(doc_id) AS BIGINT),
        |  CAST(sum(n_chars) AS BIGINT)
        |FROM documents WHERE doc_id % 3 IN (0, 1)
        |UNION ALL
        |SELECT 3, CAST(count(*) AS BIGINT), CAST(sum(doc_id) AS BIGINT),
        |  CAST(sum(n_chars) AS BIGINT)
        |FROM documents WHERE doc_id % 5 = 0
        |ORDER BY version""".stripMargin,
    // q214: the q148 versions read back through the DSv2 source + SQL;
    // leg 4 is v3 under the stats-pruned doc_id range.
    "q214_snapshot_sql_read" ->
      """SELECT 1 AS leg, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(doc_id) AS BIGINT) AS sum_id,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents WHERE doc_id % 3 = 0
        |UNION ALL
        |SELECT 2, CAST(count(*) AS BIGINT), CAST(sum(doc_id) AS BIGINT),
        |  CAST(sum(n_chars) AS BIGINT)
        |FROM documents WHERE doc_id % 3 IN (0, 1)
        |UNION ALL
        |SELECT 3, CAST(count(*) AS BIGINT), CAST(sum(doc_id) AS BIGINT),
        |  CAST(sum(n_chars) AS BIGINT)
        |FROM documents WHERE doc_id % 5 = 0
        |UNION ALL
        |SELECT 4, CAST(count(*) AS BIGINT), CAST(sum(doc_id) AS BIGINT),
        |  CAST(sum(n_chars) AS BIGINT)
        |FROM documents WHERE doc_id % 5 = 0 AND doc_id BETWEEN 100 AND 399
        |ORDER BY leg""".stripMargin,
    // q218: the q214 shape through the WRITE surface — v1 = %3=0 slim,
    // v2 = v1 + the %3=1 slice WITH lang (evolution: v1's files
    // null-fill, so n_lang counts exactly the appended slice), v3 =
    // %5=0 overwrite (schema resets, lang gone), leg 4 = v3 under the
    // stats-pruned range.
    "q218_snapshot_sql_write" ->
      """SELECT 1 AS leg, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(doc_id) AS BIGINT) AS sum_id,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |  CAST(0 AS BIGINT) AS n_lang
        |FROM documents WHERE doc_id % 3 = 0
        |UNION ALL
        |SELECT 2, CAST(count(*) AS BIGINT), CAST(sum(doc_id) AS BIGINT),
        |  CAST(sum(n_chars) AS BIGINT),
        |  CAST(sum(CASE WHEN doc_id % 3 = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |FROM documents WHERE doc_id % 3 IN (0, 1)
        |UNION ALL
        |SELECT 3, CAST(count(*) AS BIGINT), CAST(sum(doc_id) AS BIGINT),
        |  CAST(sum(n_chars) AS BIGINT), CAST(0 AS BIGINT)
        |FROM documents WHERE doc_id % 5 = 0
        |UNION ALL
        |SELECT 4, CAST(count(*) AS BIGINT), CAST(sum(doc_id) AS BIGINT),
        |  CAST(sum(n_chars) AS BIGINT), CAST(0 AS BIGINT)
        |FROM documents WHERE doc_id % 5 = 0 AND doc_id BETWEEN 100 AND 399
        |ORDER BY leg""".stripMargin,
    // q219: the catalog-SQL lifecycle — v1 = CREATE TABLE's empty
    // commit, v2 = +%3=0, v3 = +%3=1, v4 = CoW DELETE doc_id < 250
    // (content = %3 in (0,1) AND doc_id >= 250); v5 = ALTER TABLE ADD
    // COLUMN lang (metadata-only: same rows as v4, all lang NULL); v6 =
    // +%3=2 ∧ ≥250 rows WITH lang='xx' (n_lang counts exactly those —
    // pre-ALTER files null-fill). v2/v3 prove the pre-delete history
    // stayed readable; v4 proves it keeps its pre-ALTER schema.
    "q219_snapshot_catalog_sql" ->
      """SELECT 1 AS leg, CAST(0 AS BIGINT) AS n_docs,
        |  CAST(0 AS BIGINT) AS sum_id, CAST(0 AS BIGINT) AS sum_chars,
        |  CAST(0 AS BIGINT) AS n_lang
        |UNION ALL
        |SELECT 2, CAST(count(*) AS BIGINT),
        |  CAST(coalesce(sum(doc_id), 0) AS BIGINT),
        |  CAST(coalesce(sum(n_chars), 0) AS BIGINT), CAST(0 AS BIGINT)
        |FROM documents WHERE doc_id % 3 = 0
        |UNION ALL
        |SELECT 3, CAST(count(*) AS BIGINT),
        |  CAST(coalesce(sum(doc_id), 0) AS BIGINT),
        |  CAST(coalesce(sum(n_chars), 0) AS BIGINT), CAST(0 AS BIGINT)
        |FROM documents WHERE doc_id % 3 IN (0, 1)
        |UNION ALL
        |SELECT 4, CAST(count(*) AS BIGINT),
        |  CAST(coalesce(sum(doc_id), 0) AS BIGINT),
        |  CAST(coalesce(sum(n_chars), 0) AS BIGINT), CAST(0 AS BIGINT)
        |FROM documents WHERE doc_id % 3 IN (0, 1) AND doc_id >= 250
        |UNION ALL
        |SELECT 5, CAST(count(*) AS BIGINT),
        |  CAST(coalesce(sum(doc_id), 0) AS BIGINT),
        |  CAST(coalesce(sum(n_chars), 0) AS BIGINT), CAST(0 AS BIGINT)
        |FROM documents WHERE doc_id % 3 IN (0, 1) AND doc_id >= 250
        |UNION ALL
        |SELECT 6, CAST(count(*) AS BIGINT),
        |  CAST(coalesce(sum(doc_id), 0) AS BIGINT),
        |  CAST(coalesce(sum(n_chars), 0) AS BIGINT),
        |  CAST(coalesce(sum(CASE WHEN doc_id % 3 = 2 THEN 1 ELSE 0 END),
        |    0) AS BIGINT)
        |FROM documents WHERE doc_id >= 250
        |ORDER BY leg""".stripMargin,
    // q149: v2→v3 change set — added = in v3 not v2, removed = in v2
    // not v3, as doc_id predicates.
    "q149_snapshot_diff" ->
      """SELECT doc_id, 'added' AS change FROM documents
        |WHERE doc_id % 5 = 0 AND doc_id % 3 NOT IN (0, 1)
        |UNION ALL
        |SELECT doc_id, 'removed' FROM documents
        |WHERE doc_id % 3 IN (0, 1) AND doc_id % 5 <> 0
        |ORDER BY change, doc_id""".stripMargin,
    // q151: compaction/vacuum change layout, never content — the
    // surviving version is v3's predicate.
    "q151_snapshot_compact" ->
      """SELECT doc_id, source, n_chars FROM documents
        |WHERE doc_id % 5 = 0 ORDER BY doc_id""".stripMargin,
    // q152: per-source bottom-64 word-hash sketches + the Mash/bottom-k
    // Jaccard estimator over every pair — integer sketch coordinates,
    // list functions for the pair math.
    "q152_source_similarity" ->
      s"""WITH words AS (SELECT DISTINCT source, w FROM (
        |    SELECT source, unnest(string_split(text, ' ')) AS w
        |    FROM documents) WHERE w <> ''),
        |hs0 AS (SELECT DISTINCT source, ${h("w", 52)} AS h FROM words),
        |r AS (SELECT source, h,
        |  row_number() OVER (PARTITION BY source ORDER BY h) AS rn
        |  FROM hs0),
        |sk AS (SELECT source, list_sort(list(h)) AS hs
        |  FROM r WHERE rn <= 64 GROUP BY 1),
        |p AS (SELECT a.source AS src_a, b.source AS src_b,
        |    a.hs AS ha, b.hs AS hb
        |  FROM sk a JOIN sk b ON a.source < b.source),
        |e AS (SELECT src_a, src_b,
        |  CAST(len(list_intersect(
        |    list_sort(list_distinct(list_concat(ha, hb)))[1:64],
        |    list_intersect(ha, hb))) AS INT) AS hits
        |  FROM p)
        |SELECT src_a, src_b, hits,
        |  round(CAST(hits AS DOUBLE) / 64, 4) AS jaccard_est
        |FROM e ORDER BY src_a, src_b""".stripMargin,
    // q153: streaming micro-batch commits into the snapshot table —
    // final visible content is the whole corpus projection.
    "q153_streaming_snapshot" ->
      """SELECT doc_id, source, n_chars FROM documents
        |ORDER BY doc_id""".stripMargin,
    // q220: the NATIVE streaming sink (no foreachBatch) — same
    // final-content contract as q153; per-epoch commit mechanics and
    // exactly-once replay are spec-tested, invisible in the answer.
    "q220_streaming_snapshot_sink" ->
      """SELECT doc_id, source, n_chars FROM documents
        |ORDER BY doc_id""".stripMargin,
    // q221: the streaming SOURCE over the log — everything the stream
    // delivers across the three append commits must be exactly the
    // table; incremental planning (added-files-only) is spec-asserted.
    "q221_streaming_snapshot_source" ->
      """SELECT doc_id, source, n_chars FROM documents
        |ORDER BY doc_id""".stripMargin,
    // q154: manifest-stats pruning never changes results — the range
    // predicate alone is the oracle.
    "q154_snapshot_pruned_scan" ->
      """SELECT doc_id, source, n_chars FROM documents
        |WHERE doc_id BETWEEN 100 AND 199 ORDER BY doc_id""".stripMargin,
    // q155: schema evolution's visible contract — which (row, column)
    // cells are populated depends only on which append wave committed
    // the row (files predating a column null-fill it at read time).
    "q155_snapshot_evolve" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 3 IN (0, 1) THEN lang END AS lang,
        |  CASE WHEN doc_id % 3 IN (1, 2) THEN n_chars END AS n_chars,
        |  CASE WHEN doc_id % 3 = 2 THEN source END AS source
        |FROM documents ORDER BY doc_id""".stripMargin,
    // q156: the q34 cosine kernel with the rounded-sim band filter
    // before the per-query rank — band test and ordering both on the
    // 4-dp value, so the cut line is cross-engine stable.
    "q156_hard_negatives" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding AS q_emb
        |    FROM embeddings WHERE vec_id < 10),
        |s AS (SELECT query_id, vec_id AS neighbor_id,
        |    round(list_cosine_similarity(q_emb, embedding), 4) AS sim
        |  FROM q, embeddings WHERE vec_id <> query_id),
        |b AS (SELECT * FROM s WHERE sim BETWEEN 0.15 AND 0.35),
        |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id
        |    ORDER BY sim DESC, neighbor_id) AS BIGINT) AS rn FROM b)
        |SELECT query_id, rn, neighbor_id, sim
        |FROM r WHERE rn <= 5 ORDER BY query_id, rn""".stripMargin,
    // q157: copy-on-write DELETE — the per-language profile before the
    // DML commit is the full corpus, after it the predicate's complement
    // (false OR NULL rows survive, SQL DELETE semantics).
    "q157_snapshot_delete" ->
      """SELECT 'after' AS phase, lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents WHERE NOT (doc_id % 2 = 1 AND lang = 'de')
        |GROUP BY lang
        |UNION ALL
        |SELECT 'before', lang, CAST(count(*) AS BIGINT),
        |  CAST(sum(n_chars) AS BIGINT)
        |FROM documents GROUP BY lang
        |ORDER BY phase, lang""".stripMargin,
    // q159: MERGE INTO — after = matched rows with lang 'xx' (their
    // n_chars kept: the source's NULL payload keeps the base value)
    // plus the shifted-key inserted slice; before = the full corpus.
    "q159_snapshot_merge" ->
      """WITH after AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 10 = 1 THEN 'xx' ELSE lang END AS lang,
        |    n_chars
        |  FROM documents
        |  UNION ALL
        |  SELECT doc_id + 100000000, 'new', n_chars + 1
        |  FROM documents WHERE doc_id % 50 = 0)
        |SELECT 'after' AS phase, lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM after GROUP BY lang
        |UNION ALL
        |SELECT 'before', lang, CAST(count(*) AS BIGINT),
        |  CAST(sum(n_chars) AS BIGINT)
        |FROM documents GROUP BY lang
        |ORDER BY phase, lang""".stripMargin,
    // q160: write-audit-publish — the bad attempt's violation count is
    // the planted corruption's row count, the good attempt is clean,
    // and exactly the clean corpus is visible afterwards.
    "q160_snapshot_audited" ->
      """SELECT 'bad' AS attempt, 'n_chars_nonneg' AS check_name,
        |  CAST((SELECT count(*) FROM documents WHERE doc_id % 97 = 0)
        |    AS BIGINT) AS violations, false AS pass
        |UNION ALL
        |SELECT 'bad', 'unique_doc', 0, true
        |UNION ALL
        |SELECT 'good', 'n_chars_nonneg', 0, true
        |UNION ALL
        |SELECT 'good', 'unique_doc', 0, true
        |UNION ALL
        |SELECT 'table', 'rows_visible',
        |  CAST((SELECT count(*) FROM documents) AS BIGINT), true
        |ORDER BY attempt, check_name""".stripMargin,
    // q165: stream-static enrichment — the read-back aggregate is
    // micro-batch-boundary independent, so the oracle is the plain
    // batch join + aggregate.
    "q165_stream_static_enrich" ->
      """SELECT coalesce(c_mktsegment, 'UNKNOWN') AS segment, event_type,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  round(sum(value), 2) AS sum_value,
        |  CAST(count(DISTINCT c_nationkey) AS BIGINT) AS n_nations
        |FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // q166: BM25 top-5 — every stage replayed: postings, doc lengths,
    // corpus stats, idf, the fixed-point per-term contribution (identical
    // left-associative arithmetic tree; composite literals like k1+1 are
    // spelled as the same IEEE ADDITION on both sides, never as a decimal
    // literal that might round differently from the computed sum), the
    // order-free integer score sum, and the rounded-score ranking.
    "q166_bm25_topk" -> q166Bm25Oracle,
    // q171: the q166 search off the persisted bucketed index — same
    // oracle; the index roundtrip must be invisible in the answer.
    "q171_bm25_indexed" -> q166Bm25Oracle,
    // q183: BM25 top-10 + basis-point dense top-10, integer RRF fusion.
    "q183_hybrid_retrieval" -> q183HybridOracle,
    // q184: coverage from the count histogram alone — full classes above
    // the boundary count + integer interpolation into the boundary class.
    // q185: the q77 chain + one scoring pass + basis-point margins.
    "q185_kmeans_separation" -> q185KmeansSeparationOracle,
    // q186: q132 signatures + bucket histogram + integer-log2 advisor.
    "q186_lsh_bucket_audit" -> q186LshBucketAuditOracle,
    "q184_vocab_coverage" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS t
        |           FROM documents),
        |g AS (SELECT t[i] AS g
        |      FROM t, LATERAL unnest(generate_series(1, len(t))) AS u(i)
        |      UNION ALL
        |      SELECT t[i] || ' ' || t[i+1]
        |      FROM t, LATERAL unnest(generate_series(1, len(t) - 1))
        |        AS u(i)),
        |tc AS (SELECT g, CAST(count(*) AS BIGINT) AS c FROM g GROUP BY 1),
        |hist AS (SELECT c, CAST(count(*) AS BIGINT) AS n_types
        |         FROM tc GROUP BY 1),
        |cum AS (SELECT c, n_types, c * n_types AS mass,
        |    coalesce(sum(n_types) OVER (ORDER BY c DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS types_above,
        |    coalesce(sum(c * n_types) OVER (ORDER BY c DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS mass_above
        |  FROM hist),
        |tot AS (SELECT CAST(sum(n_types) AS BIGINT) AS n_types_total,
        |               CAST(sum(c * n_types) AS BIGINT) AS total_tokens
        |        FROM hist),
        |cp AS (SELECT unnest([8, 16, 32, 64, 128, 256, 512, 1024]) AS v),
        |sel AS (SELECT cp.v,
        |    max(cm.mass_above + (cp.v - cm.types_above) * cm.c)
        |      AS covered_part
        |  FROM cp LEFT JOIN cum cm
        |    ON cm.types_above < cp.v AND cp.v <= cm.types_above + cm.n_types
        |  GROUP BY cp.v)
        |SELECT CAST(s.v AS BIGINT) AS vocab_size, t.n_types_total,
        |  CAST(coalesce(s.covered_part, t.total_tokens) AS BIGINT)
        |    AS covered_tokens,
        |  t.total_tokens,
        |  round(CAST(coalesce(s.covered_part, t.total_tokens) AS DOUBLE)
        |    / CAST(t.total_tokens AS DOUBLE), 4) AS coverage
        |FROM sel s CROSS JOIN tot t ORDER BY vocab_size""".stripMargin,
    // q162: hourly resample + forward fill — per-hour value is the max
    // event_id's (arg_max, deterministic under ts ties), the grid is
    // each user's [first, last] active hour, gap hours carry the last
    // value and n_events 0.
    "q162_resample_ffill" ->
      """WITH hourly AS (SELECT user_id, date_trunc('hour', ts) AS bucket,
        |    arg_max(value, event_id) AS v, count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |b AS (SELECT user_id, min(bucket) AS lo, max(bucket) AS hi
        |  FROM hourly GROUP BY 1),
        |grid AS (SELECT user_id,
        |    unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket
        |  FROM b),
        |j AS (SELECT g.user_id, g.bucket, h.v, h.n FROM grid g
        |  LEFT JOIN hourly h ON g.user_id = h.user_id AND g.bucket = h.bucket)
        |SELECT user_id, strftime(bucket, '%Y-%m-%d %H:%M:%S') AS hour_start,
        |  round(last_value(v IGNORE NULLS) OVER (PARTITION BY user_id
        |    ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |    2) AS value_ffill,
        |  CAST(coalesce(n, 0) AS BIGINT) AS n_events
        |FROM j ORDER BY user_id, hour_start""".stripMargin,
    // q161: streaming CDC upsert — insert-merge then matched-update
    // merge per micro-batch; final state is order-independent by
    // construction (every doc ends at n_chars + 1, lang kept).
    "q161_streaming_cdc" ->
      """SELECT doc_id, lang, n_chars + 1 AS n_chars
        |FROM documents ORDER BY doc_id""".stripMargin,
    // q158: copy-on-write UPDATE — the after side applies the assignment
    // to predicate-true rows only; row counts never change under UPDATE.
    "q158_snapshot_update" ->
      """SELECT 'after' AS phase, lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(CASE WHEN doc_id % 2 = 1 AND lang = 'de'
        |    THEN n_chars + 1000 ELSE n_chars END) AS BIGINT) AS sum_chars
        |FROM documents GROUP BY lang
        |UNION ALL
        |SELECT 'before', lang, CAST(count(*) AS BIGINT),
        |  CAST(sum(n_chars) AS BIGINT)
        |FROM documents GROUP BY lang
        |ORDER BY phase, lang""".stripMargin,
    // q133: precision/recall of the sketch dedup families vs the exact
    // Jaccard >= 0.5 ground truth — see generator.
    "q133_dedup_pair_recall" -> q133DedupPairRecallOracle,
    // q134: train 2 phrase rounds then APPLY both — the oracle replays
    // the q128 chain with the merge applied at every round, then the
    // per-doc reassembly. See generator.
    "q134_phrase_tokenize" -> q134ApplyPhrasesOracle(rounds = 2),
    "q215_bpe_train" -> q215BpeTrainOracle(merges = 8),
    "q216_graph_ann" -> q216GraphAnnOracle(),
    "q222_graph_ann_indexed" -> q222GraphAnnIndexedOracle(),
    // q225/q226: the persisted-codebook searches are DEFINED to produce
    // exactly the in-query q82/q124 outputs (the lifecycle changes, the
    // math doesn't — deterministic fixed-point training), so they share
    // those oracles: a fault in the artifact or the search mismatches.
    "q225_ivf_codebook_indexed" -> q82IvfTrainedOracle,
    "q226_pq_codebook_indexed" -> q124PqOracle,
    "q223_unigram_train" -> q223UnigramOracle(),
    "q233_unigram_shrink" -> q233UnigramShrinkOracle(),
    "q237_unigram_soft" -> q237UnigramSoftOracle(),
    "q224_tokenizer_compare" -> q224TokenizerCompareOracle(),
    "q217_bpe_tokenize" -> q217BpeTokenizeOracle(merges = 6),
    // q227: TIMESTAMP AS OF resolution — leg 1 between-commits → v1
    // (%4=0), leg 2 exact-boundary inclusive → v2 (%4 in (0,1)), leg 3
    // past-the-last → v3 (the %5=0 overwrite), leg 4 the catalog SQL
    // spelling of leg 1's instant → v1 again.
    "q227_snapshot_time_travel" ->
      """SELECT 1 AS leg, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(coalesce(sum(doc_id), 0) AS BIGINT) AS sum_id,
        |  CAST(coalesce(sum(n_chars), 0) AS BIGINT) AS sum_chars
        |FROM documents WHERE doc_id % 4 = 0
        |UNION ALL
        |SELECT 2, CAST(count(*) AS BIGINT),
        |  CAST(coalesce(sum(doc_id), 0) AS BIGINT),
        |  CAST(coalesce(sum(n_chars), 0) AS BIGINT)
        |FROM documents WHERE doc_id % 4 IN (0, 1)
        |UNION ALL
        |SELECT 3, CAST(count(*) AS BIGINT),
        |  CAST(coalesce(sum(doc_id), 0) AS BIGINT),
        |  CAST(coalesce(sum(n_chars), 0) AS BIGINT)
        |FROM documents WHERE doc_id % 5 = 0
        |UNION ALL
        |SELECT 4, CAST(count(*) AS BIGINT),
        |  CAST(coalesce(sum(doc_id), 0) AS BIGINT),
        |  CAST(coalesce(sum(n_chars), 0) AS BIGINT)
        |FROM documents WHERE doc_id % 4 = 0
        |ORDER BY leg""".stripMargin,
    // q228: age-based vacuum at horizon t2 retains exactly {v3, v4} —
    // leg 0 pins the procedure's oldest_retained = 3, leg 1 the
    // retained overwrite (%5=0), leg 2 the current table (%5 in (0,3):
    // the overwrite plus the append on top).
    "q228_snapshot_retention" ->
      """SELECT 0 AS leg, CAST(3 AS BIGINT) AS n_docs,
        |  CAST(0 AS BIGINT) AS sum_id, CAST(0 AS BIGINT) AS sum_chars
        |UNION ALL
        |SELECT 1, CAST(count(*) AS BIGINT),
        |  CAST(coalesce(sum(doc_id), 0) AS BIGINT),
        |  CAST(coalesce(sum(n_chars), 0) AS BIGINT)
        |FROM documents WHERE doc_id % 5 = 0
        |UNION ALL
        |SELECT 2, CAST(count(*) AS BIGINT),
        |  CAST(coalesce(sum(doc_id), 0) AS BIGINT),
        |  CAST(coalesce(sum(n_chars), 0) AS BIGINT)
        |FROM documents WHERE doc_id % 5 IN (0, 3)
        |ORDER BY leg""".stripMargin,
    // q229: RESTORE rolls v3 (the bad overwrite: only doc_id 0) back to
    // v2's content as a NEW v4 — leg 0 pins (restored_from=2,
    // new_version=4), leg 1 = v4 = %3 in (0,1), leg 2 = the bad v3
    // still in history, leg 3 = v5 appends %3=2 on top of the restore.
    "q229_snapshot_restore" ->
      """SELECT 0 AS leg, CAST(2 AS BIGINT) AS n_docs,
        |  CAST(4 AS BIGINT) AS sum_id, CAST(0 AS BIGINT) AS sum_chars
        |UNION ALL
        |SELECT 1, CAST(count(*) AS BIGINT),
        |  CAST(coalesce(sum(doc_id), 0) AS BIGINT),
        |  CAST(coalesce(sum(n_chars), 0) AS BIGINT)
        |FROM documents WHERE doc_id % 3 IN (0, 1)
        |UNION ALL
        |SELECT 2, CAST(count(*) AS BIGINT),
        |  CAST(coalesce(sum(doc_id), 0) AS BIGINT),
        |  CAST(coalesce(sum(n_chars), 0) AS BIGINT)
        |FROM documents WHERE doc_id = 0
        |UNION ALL
        |SELECT 3, CAST(count(*) AS BIGINT),
        |  CAST(coalesce(sum(doc_id), 0) AS BIGINT),
        |  CAST(coalesce(sum(n_chars), 0) AS BIGINT)
        |FROM documents
        |ORDER BY leg""".stripMargin,
    // q230: manifest-answered aggregates — leg 1 = the whole corpus
    // (v2 = evens + odds), leg 2 = v1 (evens only), leg 3 = the
    // filtered row-path twin; pushdown changes the plan, never values.
    "q230_snapshot_agg_pushdown" ->
      """SELECT 1 AS leg, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(min(doc_id) AS BIGINT) AS min_id,
        |  CAST(max(doc_id) AS BIGINT) AS max_id
        |FROM documents
        |UNION ALL
        |SELECT 2, CAST(count(*) AS BIGINT), CAST(min(doc_id) AS BIGINT),
        |  CAST(max(doc_id) AS BIGINT)
        |FROM documents WHERE doc_id % 2 = 0
        |UNION ALL
        |SELECT 3, CAST(count(*) AS BIGINT), CAST(min(doc_id) AS BIGINT),
        |  CAST(max(doc_id) AS BIGINT)
        |FROM documents WHERE doc_id % 7 = 0
        |ORDER BY leg""".stripMargin,
    // q235: multi-column stats prune FILES only (may-contain) — the
    // oracle is the plain filtered aggregate over the source table
    "q235_snapshot_multistats" ->
      """SELECT 1 AS leg, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(coalesce(sum(doc_id), 0) AS BIGINT) AS sum_id,
        |  CAST(coalesce(sum(n_chars), 0) AS BIGINT) AS sum_chars
        |FROM documents WHERE doc_id BETWEEN 100 AND 199
        |UNION ALL
        |SELECT 2, CAST(count(*) AS BIGINT),
        |  CAST(coalesce(sum(doc_id), 0) AS BIGINT),
        |  CAST(coalesce(sum(n_chars), 0) AS BIGINT)
        |FROM documents WHERE n_chars BETWEEN 100 AND 300
        |UNION ALL
        |SELECT 3, CAST(count(*) AS BIGINT),
        |  CAST(coalesce(sum(doc_id), 0) AS BIGINT),
        |  CAST(coalesce(sum(n_chars), 0) AS BIGINT)
        |FROM documents WHERE doc_id >= 200 AND n_chars BETWEEN 100 AND 300
        |ORDER BY leg""".stripMargin,
    // q236: partition pruning changes the FILE SET only — the oracle is
    // the plain filtered aggregate over the source table
    "q236_snapshot_partitioned" ->
      """SELECT 1 AS leg, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(coalesce(sum(doc_id), 0) AS BIGINT) AS sum_id,
        |  CAST(coalesce(sum(n_chars), 0) AS BIGINT) AS sum_chars
        |FROM documents WHERE source = 'src3'
        |UNION ALL
        |SELECT 2, CAST(count(*) AS BIGINT),
        |  CAST(coalesce(sum(doc_id), 0) AS BIGINT),
        |  CAST(coalesce(sum(n_chars), 0) AS BIGINT)
        |FROM documents WHERE source IN ('src1', 'src8')
        |UNION ALL
        |SELECT 3, CAST(count(*) AS BIGINT),
        |  CAST(coalesce(sum(doc_id), 0) AS BIGINT),
        |  CAST(coalesce(sum(n_chars), 0) AS BIGINT)
        |FROM documents WHERE source = 'src5' AND doc_id >= 100
        |UNION ALL
        |SELECT 4, CAST(count(*) AS BIGINT),
        |  CAST(coalesce(sum(doc_id), 0) AS BIGINT),
        |  CAST(count(DISTINCT source) AS BIGINT)
        |FROM documents WHERE source IN ('src2', 'src7')
        |ORDER BY leg""".stripMargin,
    // q238: the partition inventory is manifest metadata; its semantic
    // content is exactly the source table's GROUP BY (file counts are
    // layout and stay out of the oracle)
    "q238_show_partitions" ->
      """SELECT concat('source=', source) AS partition,
        |  CAST(count(*) AS BIGINT) AS n_rows
        |FROM documents GROUP BY 1 ORDER BY partition""".stripMargin,
    // q239: leg 1 replays the q34 exact brute-force top-5 (v1 of the
    // snapshot table IS the raw embeddings table — arrays roundtrip
    // bit-exact through the native writer); leg 2 checksums the
    // latest version = raw ∪ ten shifted-id clones.
    "q239_snapshot_embeddings" ->
      """WITH v2 AS (SELECT vec_id, embedding FROM embeddings
     UNION ALL
     SELECT vec_id + 100000, embedding FROM embeddings WHERE vec_id < 10),
q AS (SELECT vec_id AS query_id, embedding AS q_emb
      FROM embeddings WHERE vec_id < 10),
s AS (SELECT query_id, vec_id AS neighbor_id,
        list_cosine_similarity(q_emb, embedding) AS sim
      FROM q, embeddings WHERE vec_id <> query_id),
r AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id
        ORDER BY sim DESC, neighbor_id) AS BIGINT) AS rn FROM s)
SELECT CAST(1 AS BIGINT) AS leg, query_id, rn, neighbor_id,
  round(sim, 4) AS sim
FROM r WHERE rn <= 5
UNION ALL
SELECT CAST(2 AS BIGINT), CAST(-1 AS BIGINT), count(*),
  CAST(sum(vec_id) + sum(len(embedding)) AS BIGINT), 0.0
FROM v2
ORDER BY leg, query_id, rn""",
    // q240: the storage-partitioned join is a PLAN property (zero
    // exchanges — pinned by the spec); its semantics are the plain
    // join + aggregate below.
    "q240_snapshot_spj" ->
      """WITH dim AS (SELECT source, min(doc_id) AS src_min,
       CAST(count(*) AS BIGINT) AS src_docs
     FROM documents GROUP BY 1)
SELECT d.source, CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(CASE WHEN d.doc_id > m.src_min THEN 1 ELSE 0 END)
    AS BIGINT) AS n_after_min,
  CAST(sum(d.n_chars) + max(m.src_docs) AS BIGINT) AS checksum
FROM documents d JOIN dim m USING (source)
GROUP BY d.source ORDER BY d.source""",
    // q241: spec evolution is a METADATA property (which files can be
    // pruned); the row semantics are plain slices of the corpus —
    // leg 1 everything, leg 2 one source across the spec boundary,
    // leg 3 the even-id pre-evolution half.
    "q241_snapshot_spec_evolution" ->
      """SELECT CAST(1 AS BIGINT) AS leg, count(*) AS n_docs,
  CAST(sum(doc_id) AS BIGINT) AS sum_id,
  CAST(sum(n_chars) AS BIGINT) AS sum_chars FROM documents
UNION ALL
SELECT CAST(2 AS BIGINT), count(*), CAST(sum(doc_id) AS BIGINT),
  CAST(sum(n_chars) AS BIGINT) FROM documents WHERE source = 'src3'
UNION ALL
SELECT CAST(3 AS BIGINT), count(*), CAST(sum(doc_id) AS BIGINT),
  CAST(sum(n_chars) AS BIGINT) FROM documents WHERE doc_id % 2 = 0
ORDER BY leg""",
    // q242: the change feed replayed as a DIRECT VERSION DIFF — v1 =
    // all inserts, v2 = the deleted residue class, v3 = the merge's
    // pre/post images over the post-delete base plus its inserts
    // (keys absent from the base: brand-new ids AND the ones v2
    // deleted).
    "q242_snapshot_change_feed" ->
      """WITH b AS (SELECT doc_id, source, n_chars FROM documents
       WHERE doc_id % 10 <> 3),
s AS (SELECT doc_id, source, n_chars + 1000 AS n_chars FROM documents
        WHERE doc_id % 7 = 0
      UNION ALL
      SELECT doc_id + 100000000, source, n_chars FROM documents
        WHERE doc_id < 5),
feed AS (
  SELECT 1 AS commit_version, 'insert' AS change_type, doc_id, n_chars
  FROM documents
  UNION ALL
  SELECT 2, 'delete', doc_id, n_chars FROM documents
  WHERE doc_id % 10 = 3
  UNION ALL
  SELECT 3, 'update_preimage', doc_id, n_chars FROM b
  WHERE doc_id IN (SELECT doc_id FROM s)
  UNION ALL
  SELECT 3, 'update_postimage', doc_id, n_chars FROM s
  WHERE doc_id IN (SELECT doc_id FROM b)
  UNION ALL
  SELECT 3, 'insert', doc_id, n_chars FROM s
  WHERE doc_id NOT IN (SELECT doc_id FROM b))
SELECT CAST(commit_version AS BIGINT) AS commit_version, change_type,
  count(*) AS n_rows, CAST(sum(doc_id) AS BIGINT) AS sum_id,
  CAST(sum(n_chars) AS BIGINT) AS sum_chars
FROM feed GROUP BY 1, 2 ORDER BY commit_version, change_type""",
    // q243: null-count pruning changes the FILE SET only — the
    // semantics are the plain null-predicate slices.
    "q243_snapshot_null_stats" ->
      """WITH d AS (SELECT doc_id, n_chars,
       CASE WHEN doc_id % 10 < 5 THEN n_chars END AS opt_val
     FROM documents)
SELECT CAST(1 AS BIGINT) AS leg, count(*) AS n_docs,
  CAST(sum(doc_id) AS BIGINT) AS sum_id,
  CAST(coalesce(sum(opt_val), 0) AS BIGINT) AS sum_opt FROM d
UNION ALL
SELECT CAST(2 AS BIGINT), count(*), CAST(sum(doc_id) AS BIGINT),
  CAST(coalesce(sum(opt_val), 0) AS BIGINT) FROM d
WHERE opt_val IS NOT NULL
UNION ALL
SELECT CAST(3 AS BIGINT), count(*), CAST(sum(doc_id) AS BIGINT),
  CAST(0 AS BIGINT) FROM d WHERE opt_val IS NULL
ORDER BY leg""",
    // q244: the Spark side MAINTAINS the aggregate from the change
    // feed; the oracle recomputes the LATEST state directly (upsert
    // semantics: matched keys replaced, unmatched inserted). A hash
    // match proves incremental maintenance ≡ recompute.
    "q244_change_feed_incremental" ->
      """WITH after2 AS (SELECT doc_id, source, n_chars FROM documents
       WHERE doc_id % 9 <> 2),
s AS (SELECT doc_id, source, n_chars + 500 AS n_chars FROM documents
        WHERE doc_id % 6 = 0
      UNION ALL
      SELECT doc_id + 100000000, source, n_chars FROM documents
        WHERE doc_id < 8),
final AS (SELECT a.doc_id, a.source, a.n_chars FROM after2 a
          WHERE a.doc_id NOT IN (SELECT doc_id FROM s)
          UNION ALL
          SELECT doc_id, source, n_chars FROM s)
SELECT source, count(*) AS n_docs,
  CAST(sum(n_chars) AS BIGINT) AS sum_chars
FROM final GROUP BY source ORDER BY source""",
    // q245: the SQL-path change feed replayed as slice arithmetic —
    // v2 = all inserts; v3 = the UPDATE's pre/postimages (predicate
    // on the ASSIGNED column, evaluated pre-assignment); v4 = the
    // MERGE's net delta (matched rows feed as delete+insert, new keys
    // as insert); v5 = the matched-DELETE merge's vanished rows at
    // their v4 values.
    "q245_sql_dml_change_feed" ->
      """WITH d AS (SELECT doc_id, n_chars FROM documents),
v3 AS (SELECT doc_id,
         CASE WHEN n_chars % 10 = 3 THEN 77777 ELSE n_chars END AS n_chars,
         n_chars AS orig
       FROM d),
v4 AS (SELECT doc_id,
         CASE WHEN doc_id % 5 = 0 THEN orig * 10 + 3 ELSE n_chars END
           AS n_chars
       FROM v3
       UNION ALL
       SELECT doc_id + 100000000, n_chars FROM d WHERE doc_id % 7 = 0),
feed AS (
  SELECT 2 AS commit_version, 'insert' AS change_type, doc_id, n_chars
  FROM d
  UNION ALL
  SELECT 3, 'update_preimage', doc_id, n_chars FROM d
  WHERE n_chars % 10 = 3
  UNION ALL
  SELECT 3, 'update_postimage', doc_id, 77777 FROM d
  WHERE n_chars % 10 = 3
  UNION ALL
  SELECT 4, 'delete', doc_id, n_chars FROM v3 WHERE doc_id % 5 = 0
  UNION ALL
  SELECT 4, 'insert', doc_id, orig * 10 + 3 FROM v3 WHERE doc_id % 5 = 0
  UNION ALL
  SELECT 4, 'insert', doc_id + 100000000, n_chars FROM d
  WHERE doc_id % 7 = 0
  UNION ALL
  SELECT 5, 'delete', doc_id, n_chars FROM v4 WHERE doc_id % 11 = 0
    AND doc_id < 100000000)
SELECT CAST(commit_version AS BIGINT) AS commit_version, change_type,
  count(*) AS n_rows, CAST(sum(doc_id) AS BIGINT) AS sum_id,
  CAST(sum(n_chars) AS BIGINT) AS sum_chars
FROM feed GROUP BY 1, 2 ORDER BY commit_version, change_type""",
    // q251: tags + binpack are content-neutral — legs 1/3 are the
    // even-id half (the tagged v1, re-read AFTER vacuum would have
    // dropped it), leg 2 the whole corpus after the binpack.
    "q251_tags_binpack" ->
      """WITH d AS (SELECT doc_id, n_chars FROM documents)
SELECT CAST(1 AS BIGINT) AS leg, count(*) AS n_docs,
  CAST(sum(doc_id) AS BIGINT) AS sum_id,
  CAST(sum(n_chars) AS BIGINT) AS sum_chars FROM d WHERE doc_id % 2 = 0
UNION ALL
SELECT CAST(2 AS BIGINT), count(*), CAST(sum(doc_id) AS BIGINT),
  CAST(sum(n_chars) AS BIGINT) FROM d
UNION ALL
SELECT CAST(3 AS BIGINT), count(*), CAST(sum(doc_id) AS BIGINT),
  CAST(sum(n_chars) AS BIGINT) FROM d WHERE doc_id % 2 = 0
ORDER BY leg""",
    // q250: hidden partitioning changes WHICH FILES PLAN, never the
    // rows — each leg is a plain slice of events: the full table, the
    // raw-timestamp range, the min-user probe, and the table minus
    // the dropped day cell.
    "q250_hidden_partitioning" ->
      """WITH e AS (SELECT event_id, ts, user_id FROM events)
SELECT CAST(1 AS BIGINT) AS leg, count(*) AS n_events,
  CAST(sum(event_id) AS BIGINT) AS sum_id,
  CAST(sum(user_id) AS BIGINT) AS sum_user FROM e
UNION ALL
SELECT CAST(2 AS BIGINT), count(*), CAST(sum(event_id) AS BIGINT),
  CAST(sum(user_id) AS BIGINT) FROM e
  WHERE ts >= TIMESTAMP '2024-01-20 12:00:00'
UNION ALL
SELECT CAST(3 AS BIGINT), count(*), CAST(sum(event_id) AS BIGINT),
  CAST(sum(user_id) AS BIGINT) FROM e
  WHERE user_id = (SELECT min(user_id) FROM e)
UNION ALL
SELECT CAST(4 AS BIGINT), count(*), CAST(sum(event_id) AS BIGINT),
  CAST(sum(user_id) AS BIGINT) FROM e
  WHERE strftime(ts, '%Y-%m-%d') <> '2024-01-05'
ORDER BY leg""",
    // q249: the rename is metadata-only — every leg is a plain slice
    // of the corpus, with the value column surfaced as `sum_len`
    // whichever name its files physically store: leg 1 the whole
    // table (mixed epochs), leg 2 the stats-bounded n_chars <= 500
    // slice, leg 3 after deleting the n_chars % 7 = 3 class, leg 4
    // the even-id pre-rename half.
    "q249_snapshot_rename" ->
      """WITH d AS (SELECT doc_id, n_chars FROM documents)
SELECT CAST(1 AS BIGINT) AS leg, count(*) AS n_docs,
  CAST(sum(doc_id) AS BIGINT) AS sum_id,
  CAST(sum(n_chars) AS BIGINT) AS sum_len FROM d
UNION ALL
SELECT CAST(2 AS BIGINT), count(*), CAST(sum(doc_id) AS BIGINT),
  CAST(sum(n_chars) AS BIGINT) FROM d WHERE n_chars <= 500
UNION ALL
SELECT CAST(3 AS BIGINT), count(*), CAST(sum(doc_id) AS BIGINT),
  CAST(sum(n_chars) AS BIGINT) FROM d WHERE n_chars % 7 <> 3
UNION ALL
SELECT CAST(4 AS BIGINT), count(*), CAST(sum(doc_id) AS BIGINT),
  CAST(sum(n_chars) AS BIGINT) FROM d WHERE doc_id % 2 = 0
ORDER BY leg""",
    // q248: the repair is content-identity — legs 1/3 are the whole
    // corpus (post- and pre-repair), leg 2 the src3 slice (file-exact
    // after repair; a misfiled tuple moves its counts).
    "q248_spec_repair" ->
      """WITH d AS (SELECT doc_id, source, n_chars FROM documents)
SELECT CAST(1 AS BIGINT) AS leg, count(*) AS n_docs,
  CAST(sum(doc_id) AS BIGINT) AS sum_id,
  CAST(sum(n_chars) AS BIGINT) AS sum_chars FROM d
UNION ALL
SELECT CAST(2 AS BIGINT), count(*), CAST(sum(doc_id) AS BIGINT),
  CAST(sum(n_chars) AS BIGINT) FROM d WHERE source = 'src3'
UNION ALL
SELECT CAST(3 AS BIGINT), count(*), CAST(sum(doc_id) AS BIGINT),
  CAST(sum(n_chars) AS BIGINT) FROM d
ORDER BY leg""",
    // q246: merge-on-read DML replayed as slice arithmetic — v2 drops
    // a residue class (tombstones), v3 rewrites a slice's n_chars, v4
    // merges a batch (matched updates, re-inserts of tombstoned keys,
    // brand-new ids). A tombstone the scan fails to apply (or
    // over-applies) moves a count or a sum.
    "q246_mor_dml" ->
      """WITH d AS (SELECT doc_id, n_chars FROM documents),
v2 AS (SELECT doc_id, n_chars FROM d WHERE doc_id % 10 <> 3),
v3 AS (SELECT doc_id,
         CASE WHEN n_chars % 7 = 2 THEN 55555 ELSE n_chars END AS n_chars
       FROM v2),
srck AS (SELECT doc_id, n_chars + 100 AS n_chars FROM d
         WHERE doc_id % 6 = 0
         UNION ALL
         SELECT doc_id + 100000000, n_chars FROM d WHERE doc_id % 13 = 0),
v4 AS (SELECT doc_id, n_chars FROM v3
       WHERE doc_id NOT IN (SELECT doc_id FROM srck)
       UNION ALL SELECT doc_id, n_chars FROM srck),
legs AS (
  SELECT 1 AS leg, doc_id, n_chars FROM d
  UNION ALL SELECT 2, doc_id, n_chars FROM v2
  UNION ALL SELECT 3, doc_id, n_chars FROM v3
  UNION ALL SELECT 4, doc_id, n_chars FROM v4)
SELECT CAST(leg AS BIGINT) AS leg, count(*) AS n_docs,
  CAST(sum(doc_id) AS BIGINT) AS sum_id,
  CAST(sum(n_chars) AS BIGINT) AS sum_chars
FROM legs GROUP BY 1 ORDER BY leg""",
    // q247: the tombstoned table through the DSv2 scan, then OPTIMIZE
    // folds the deletes — legs 1/3 (metadata count) and 2/4 (filtered
    // aggregate) must be pairwise identical: merge-on-read is layout,
    // never semantics.
    "q247_mor_dsv2_compact" ->
      """WITH d AS (SELECT doc_id, n_chars FROM documents
       WHERE doc_id % 5 <> 2),
a AS (SELECT count(*) AS n_docs, CAST(sum(doc_id) AS BIGINT) AS sum_id,
        CAST(sum(n_chars) AS BIGINT) AS sum_chars
      FROM d WHERE n_chars % 3 = 1)
SELECT CAST(1 AS BIGINT) AS leg, (SELECT count(*) FROM d) AS n_docs,
  CAST(0 AS BIGINT) AS sum_id, CAST(0 AS BIGINT) AS sum_chars
UNION ALL SELECT CAST(2 AS BIGINT), n_docs, sum_id, sum_chars FROM a
UNION ALL SELECT CAST(3 AS BIGINT), (SELECT count(*) FROM d),
  CAST(0 AS BIGINT), CAST(0 AS BIGINT)
UNION ALL SELECT CAST(4 AS BIGINT), n_docs, sum_id, sum_chars FROM a
ORDER BY leg""",
    // q231: UniMax water-filling replayed in integer arithmetic — the
    // threshold rule, the rank-(t+1) share, and the epoch-major kept
    // prefix (cum order = epoch, bucket, hash, doc_id flattened).
    "q231_unimax_budget" ->
      s"""WITH b AS (SELECT doc_id, lang,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |    ${h("doc_id", 37)} AS h
        |  FROM documents),
        |pl AS (SELECT lang, CAST(sum(n_tokens) AS BIGINT) AS lang_tokens,
        |    CAST(count(*) AS BIGINT) AS lang_docs
        |  FROM b GROUP BY 1),
        |tot AS (SELECT CAST(sum(lang_tokens) AS BIGINT) AS corpus_tokens,
        |    CAST(count(*) AS BIGINT) AS n_langs FROM pl),
        |rk AS (SELECT pl.*, n_langs,
        |    (corpus_tokens * 148) // 100 AS budget,
        |    lang_tokens * 2 AS capacity,
        |    CAST(row_number() OVER
        |      (ORDER BY lang_tokens * 2, lang) AS BIGINT) AS k,
        |    CAST(COALESCE(sum(lang_tokens * 2) OVER
        |      (ORDER BY lang_tokens * 2, lang
        |       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS prefix
        |  FROM pl, tot),
        |rk2 AS (SELECT rk.*,
        |    (budget - prefix) // (n_langs - k + 1) AS even_share FROM rk),
        |tk AS (SELECT COALESCE(max(CASE WHEN capacity <= even_share
        |    THEN k END), 0) AS tt FROM rk2),
        |al AS (SELECT rk2.*, tt,
        |    max(CASE WHEN k = tt + 1 THEN even_share END) OVER () AS share
        |  FROM rk2, tk),
        |alloc AS (SELECT lang, lang_docs, lang_tokens, capacity,
        |    CAST(CASE WHEN k <= tt THEN capacity
        |         ELSE greatest(share, 0) END AS BIGINT) AS alloc_tokens
        |  FROM al),
        |ex AS (SELECT b.*, e.epoch
        |  FROM b CROSS JOIN (SELECT unnest(range(2)) AS epoch) e),
        |cum AS (SELECT lang, n_tokens,
        |    CAST(sum(n_tokens) OVER (PARTITION BY lang
        |      ORDER BY epoch, h % 8, h, doc_id
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        |  FROM ex),
        |ks AS (SELECT c.lang, CAST(count(*) AS BIGINT) AS n_kept,
        |    CAST(sum(c.n_tokens) AS BIGINT) AS kept_tokens
        |  FROM cum c JOIN alloc a USING (lang)
        |  WHERE c.cum <= a.alloc_tokens GROUP BY 1)
        |SELECT a.lang, a.lang_docs, a.lang_tokens, a.capacity,
        |  a.alloc_tokens,
        |  CAST(COALESCE(ks.n_kept, 0) AS BIGINT) AS n_kept,
        |  CAST(COALESCE(ks.kept_tokens, 0) AS BIGINT) AS kept_tokens
        |FROM alloc a LEFT JOIN ks USING (lang)
        |ORDER BY lang""".stripMargin,
    // q232: SQL UPDATE/MERGE as CASE arithmetic — v2 = the raw corpus,
    // v3 = +1000 on %3=0, v4 = matched %5=0 rows at n_chars*10 (the
    // MERGE update wins over the earlier UPDATE on %15=0) plus the
    // %7=0 slice re-inserted under doc_id+100000000 (an offset
    // disjoint from corpus ids at every tested scale: +1e6 collided
    // with the 100x corpus id space and tripped the MERGE cardinality
    // guard loudly — the guard working, now avoided by construction).
    "q232_snapshot_sql_dml" ->
      """SELECT 2 AS leg, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(coalesce(sum(doc_id), 0) AS BIGINT) AS sum_id,
        |  CAST(coalesce(sum(n_chars), 0) AS BIGINT) AS sum_chars
        |FROM documents
        |UNION ALL
        |SELECT 3, CAST(count(*) AS BIGINT),
        |  CAST(coalesce(sum(doc_id), 0) AS BIGINT),
        |  CAST(coalesce(sum(n_chars +
        |    CASE WHEN doc_id % 3 = 0 THEN 1000 ELSE 0 END), 0) AS BIGINT)
        |FROM documents
        |UNION ALL
        |SELECT 4,
        |  CAST(count(*) +
        |    (SELECT count(*) FROM documents WHERE doc_id % 7 = 0)
        |    AS BIGINT),
        |  CAST(coalesce(sum(doc_id), 0) +
        |    (SELECT coalesce(sum(doc_id + 100000000), 0) FROM documents
        |     WHERE doc_id % 7 = 0) AS BIGINT),
        |  CAST(coalesce(sum(CASE WHEN doc_id % 5 = 0 THEN n_chars * 10
        |    WHEN doc_id % 3 = 0 THEN n_chars + 1000
        |    ELSE n_chars END), 0) +
        |    (SELECT coalesce(sum(n_chars), 0) FROM documents
        |     WHERE doc_id % 7 = 0) AS BIGINT)
        |FROM documents
        |ORDER BY leg""".stripMargin,
    // q234: DESCRIBE HISTORY from manifest bytes — actions, injected
    // wall-clocks (minute k for version k past the fixed base), and
    // recorded row counts per version.
    "q234_snapshot_history" ->
      """SELECT CAST(1 AS BIGINT) AS version, 'append' AS action,
        |  CAST(1000000060000 AS BIGINT) AS ts_millis,
        |  CAST(0 AS BIGINT) AS n_rows
        |UNION ALL
        |SELECT 2, 'append', 1000000120000, CAST(count(*) AS BIGINT)
        |FROM documents WHERE doc_id % 2 = 0
        |UNION ALL
        |SELECT 3, 'append', 1000000180000, CAST(count(*) AS BIGINT)
        |FROM documents
        |UNION ALL
        |SELECT 4, 'overwrite', 1000000240000, CAST(count(*) AS BIGINT)
        |FROM documents
        |UNION ALL
        |SELECT 5, 'delete', 1000000300000, CAST(count(*) AS BIGINT)
        |FROM documents WHERE doc_id >= 100
        |ORDER BY version""".stripMargin,
    // q135: the q79 pipeline's train split semi-joined into the q125
    // manifest chain — thresholds re-derived on the deduped kept set.
    "q135_full_pipeline_manifest" ->
      s"""WITH clean AS (SELECT doc_id FROM (
$q79PipelineOracle
) cp WHERE split = 'train'),
$webFilterSignalsCtes,
kept AS (SELECT s.doc_id, s.pred_lang FROM sig s JOIN clean USING (doc_id)
  WHERE (n_tokens BETWEEN 10 AND 5000) AND entropy >= 2.0 AND logit > 0),
cnt AS (SELECT pred_lang, CAST(count(*) AS BIGINT) AS n_stratum
        FROM kept GROUP BY 1),
thr AS (SELECT pred_lang,
          least(10000, CAST(floor(25000.0 / sqrt(CAST(n_stratum AS DOUBLE)))
            AS BIGINT)) AS threshold_bp
        FROM cnt),
samp AS (SELECT k.doc_id, k.pred_lang AS stratum
         FROM kept k JOIN thr USING (pred_lang)
         WHERE ${h("k.doc_id", 41)} % 10000 < thr.threshold_bp),
sbm AS (SELECT doc_id, stratum, ${h("doc_id", 37)} AS hh FROM samp),
spm AS (SELECT doc_id, stratum, hh, hh % 8 AS bucket,
         CAST(row_number() OVER (PARTITION BY hh % 8 ORDER BY hh, doc_id)
           AS BIGINT) AS rn
        FROM sbm),
som AS (SELECT bucket, CAST(COALESCE(sum(total) OVER (ORDER BY bucket
         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
         AS bucket_offset
        FROM (SELECT bucket, count(*) AS total FROM spm GROUP BY bucket))
SELECT spm.doc_id, spm.stratum, som.bucket_offset + spm.rn - 1 AS ord
FROM spm JOIN som USING (bucket) ORDER BY ord""",
    "q51b_approx_percentiles" ->
      """SELECT o_orderpriority,
        |  round(quantile_cont(o_totalprice, 0.5), 4) AS exact_p50,
        |  abs(approx_quantile(o_totalprice, 0.5)
        |      - quantile_cont(o_totalprice, 0.5))
        |    <= quantile_cont(o_totalprice, 0.5) * 0.02 AS p50_ok,
        |  abs(approx_quantile(o_totalprice, 0.9)
        |      - quantile_cont(o_totalprice, 0.9))
        |    <= quantile_cont(o_totalprice, 0.9) * 0.02 AS p90_ok
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "q62_stateful_counters" ->
      """SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
        |  round(sum(value), 2) AS sum_value
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q55_window_suite" ->
      """SELECT o_custkey, o_orderkey,
        |  strftime(o_orderdate, '%Y-%m-%d') AS day,
        |  lag(o_orderkey, 1) OVER w AS prev_key,
        |  lead(o_orderkey, 1) OVER w AS next_key,
        |  CAST(rank() OVER wp AS BIGINT) AS price_rank,
        |  CAST(dense_rank() OVER wp AS BIGINT) AS price_dense_rank,
        |  CAST(ntile(4) OVER w AS BIGINT) AS quartile,
        |  round(cume_dist() OVER w, 4) AS cume,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    AS running_spend
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
        |       wp AS (PARTITION BY o_custkey
        |              ORDER BY o_totalprice DESC, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q56_pii_scrub" ->
      """WITH r AS (
        |  SELECT doc_id,
        |    'contact user' || doc_id || '@example.com or https://site'
        |      || doc_id || '.example.org ' || text AS raw
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(raw,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT)
        |    AS n_emails,
        |  CAST(len(regexp_extract_all(raw, 'https?://[^ ]+')) AS BIGINT)
        |    AS n_urls,
        |  substring(regexp_replace(regexp_replace(raw,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    'https?://[^ ]+', '<URL>', 'g'), 1, 80) AS scrubbed_head
        |FROM r ORDER BY doc_id""".stripMargin,
    "q36_lang_id" ->
      """WITH t AS (SELECT doc_id, lang AS labeled_lang,
        |  CAST(len(list_filter(string_split(text,' '), x -> x IN ('the','and','of','is','in','a'))) AS BIGINT) AS s_en,
        |  CAST(len(list_filter(string_split(text,' '), x -> x IN ('der','die','das','und','ist','ein'))) AS BIGINT) AS s_de,
        |  CAST(len(list_filter(string_split(text,' '), x -> x IN ('le','la','les','et','est','un'))) AS BIGINT) AS s_fr,
        |  CAST(len(list_filter(string_split(text,' '), x -> x IN ('el','los','y','es','una','que'))) AS BIGINT) AS s_es
        |FROM documents)
        |SELECT doc_id, labeled_lang, s_en, s_de, s_fr, s_es,
        |  CASE WHEN greatest(s_en, s_de, s_fr, s_es) = 0 THEN 'und'
        |       WHEN s_en >= greatest(s_de, s_fr, s_es) THEN 'en'
        |       WHEN s_de >= greatest(s_fr, s_es) THEN 'de'
        |       WHEN s_fr >= s_es THEN 'fr'
        |       ELSE 'es' END AS predicted
        |FROM t ORDER BY doc_id""".stripMargin,
    "q37_quality_score" ->
      """SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |  round(CAST(len(list_filter(string_split(text,' '),
        |      x -> x IN ('the','and','of','is','in','a'))) AS DOUBLE)
        |    / len(string_split(text, ' ')), 4) AS stop_ratio,
        |  round(CAST(len(regexp_extract_all(text, '[.,!?;:]')) AS DOUBLE)
        |    / length(text), 4) AS punct_ratio,
        |  round(least(CAST(len(string_split(text, ' ')) AS DOUBLE) / 100.0, 1.0) * 0.4
        |    + (CAST(len(list_filter(string_split(text,' '),
        |         x -> x IN ('the','and','of','is','in','a'))) AS DOUBLE)
        |       / len(string_split(text, ' '))) * 0.3
        |    + (1.0 - CAST(len(regexp_extract_all(text, '[.,!?;:]')) AS DOUBLE)
        |       / length(text)) * 0.3, 4) AS quality
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q38_token_count" ->
      """SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
        |  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS bpe_ish_tokens,
        |  CAST(ceil(CAST(n_chars AS DOUBLE) / 4.0) AS BIGINT) AS est_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q39_multimodal_decode" ->
      """WITH b AS (SELECT doc_id, CAST(length(text) AS BIGINT) AS n_bytes,
        |  list_aggregate(list_transform(string_split(text, ''),
        |    x -> unicode(x)), 'sum') % 65536 AS checksum
        |FROM documents)
        |SELECT doc_id, n_bytes, n_bytes % 64 + 1 AS width,
        |  CAST(ceil(CAST(n_bytes AS DOUBLE) / (n_bytes % 64 + 1)) AS BIGINT) AS height,
        |  CAST(checksum AS BIGINT) AS checksum
        |FROM b ORDER BY doc_id""".stripMargin,
    "q40_tumbling_window" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
        |  event_type, CAST(count(*) AS BIGINT) AS n_events,
        |  round(sum(value), 2) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q41_sessionize" ->
      """WITH x AS (
        |  SELECT user_id, event_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR date_part('epoch', ts - lag(ts) OVER w) > 1800
        |         THEN 1 ELSE 0 END AS is_new
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |y AS (
        |  SELECT *, CAST(sum(is_new) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        |  FROM x)
        |SELECT user_id, session_id, CAST(count(*) AS BIGINT) AS n_events,
        |  epoch_us(min(ts)) AS start_us, epoch_us(max(ts)) AS end_us
        |FROM y GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q42_session_window" ->
      """WITH x AS (
        |  SELECT user_id, event_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR date_part('epoch', ts - lag(ts) OVER w) >= 1800
        |         THEN 1 ELSE 0 END AS is_new
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |y AS (
        |  SELECT *, sum(is_new) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS session_id
        |  FROM x)
        |SELECT user_id, epoch_us(min(ts)) AS start_us,
        |  epoch_us(max(ts) + INTERVAL 30 MINUTE) AS end_us,
        |  CAST(count(*) AS BIGINT) AS n_events
        |FROM y GROUP BY user_id, session_id ORDER BY user_id, start_us""".stripMargin,
    "q43_csv_roundtrip" ->
      """SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
        |FROM customer ORDER BY c_custkey""".stripMargin,
    // q169: the stream-stream replay must equal the batch join — the
    // oracle is q61's, verbatim.
    "q169_stream_stream_join" ->
      """SELECT p.user_id,
        |  epoch_us(s.ts) AS signup_us,
        |  epoch_us(p.ts) AS purchase_us,
        |  round(p.value, 2) AS purchase_value
        |FROM events p JOIN events s
        |  ON p.user_id = s.user_id
        | AND p.event_type = 'purchase' AND s.event_type = 'signup'
        | AND p.ts >= s.ts AND p.ts <= s.ts + INTERVAL 1 HOUR
        |ORDER BY p.user_id, purchase_us, signup_us""".stripMargin,
    "q61_interval_join" ->
      """SELECT p.user_id,
        |  epoch_us(s.ts) AS signup_us,
        |  epoch_us(p.ts) AS purchase_us,
        |  round(p.value, 2) AS purchase_value
        |FROM events p JOIN events s
        |  ON p.user_id = s.user_id
        | AND p.event_type = 'purchase' AND s.event_type = 'signup'
        | AND p.ts >= s.ts AND p.ts <= s.ts + INTERVAL 1 HOUR
        |ORDER BY p.user_id, purchase_us, signup_us""".stripMargin,
    "q44_partitioned_write" ->
      """SELECT strftime(o_orderdate, '%Y-%m') AS month,
        |  CAST(count(*) AS BIGINT) AS n_orders,
        |  round(sum(o_totalprice), 2) AS spend
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "q45_history_scan" ->
      """SELECT user_id, rn, event_id, epoch_us(ts) AS ts_us FROM (
        |  SELECT user_id, event_id, ts,
        |    CAST(row_number() OVER (PARTITION BY user_id
        |         ORDER BY ts DESC, event_id) AS BIGINT) AS rn
        |  FROM events
        |  WHERE ts >= TIMESTAMP '2024-01-05' AND ts < TIMESTAMP '2024-01-20'
        |    AND user_id IN (SELECT DISTINCT user_id FROM events
        |                    ORDER BY user_id LIMIT 5))
        |WHERE rn <= 20 ORDER BY user_id, rn""".stripMargin,
    "q46_approx_distinct" ->
      """SELECT o_orderpriority,
        |  CAST(count(DISTINCT o_custkey) AS BIGINT) AS exact_cnt,
        |  abs(approx_count_distinct(o_custkey) - count(DISTINCT o_custkey))
        |    <= count(DISTINCT o_custkey) * 0.15 AS approx_ok
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "q47_embedding_neardup" ->
      """SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        |  round(list_cosine_similarity(a.embedding, b.embedding), 4) AS sim
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.4
        |ORDER BY vec_a, vec_b""".stripMargin,
    "q50_from_json" ->
      """SELECT event_id, event_type,
        |  CAST(regexp_extract(props, '[0-9]+') AS BIGINT) AS prop_k
        |FROM events ORDER BY event_id""".stripMargin,
    "q51_percentiles" ->
      """SELECT o_orderpriority,
        |  round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
        |  round(quantile_cont(o_totalprice, 0.9), 4) AS p90,
        |  round(quantile_cont(o_totalprice, 0.99), 4) AS p99
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "q54_dsv2_range_scan" ->
      """SELECT CAST(range % 10 AS INT) AS bucket,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(range) AS BIGINT) AS id_sum
        |FROM range(25000, 75000)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q57_sql_surface" ->
      """SELECT c_custkey, c_name, round(c_acctbal, 2) AS acctbal
        |FROM customer c
        |WHERE c_acctbal > (SELECT avg(c2.c_acctbal) FROM customer c2
        |                   WHERE c2.c_nationkey = c.c_nationkey)
        |  AND EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "q58_null_semantics" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_orderkey % 3 = 0 THEN NULL ELSE o_totalprice END AS v,
        |  (CASE WHEN o_orderkey % 3 = 0 THEN NULL ELSE o_totalprice END)
        |    IS NULL AS is_null,
        |  (CASE WHEN o_orderkey % 3 = 0 THEN NULL ELSE o_totalprice END)
        |    IS NOT DISTINCT FROM NULL AS eq_null,
        |  COALESCE(CASE WHEN o_orderkey % 3 = 0 THEN NULL
        |                ELSE o_totalprice END, -1.0) AS v_or_default
        |FROM orders
        |ORDER BY v NULLS FIRST, o_orderkey""".stripMargin,
    "q59_multimodal_resize" ->
      """SELECT doc_id,
        |  CAST(length(text) AS BIGINT) AS n_bytes,
        |  CAST((length(text) + 2) // 3 AS BIGINT) AS resized_bytes,
        |  CAST(list_aggregate(list_transform(range(1, length(text) + 1, 3),
        |    i -> unicode(text[i])), 'sum') % 65536 AS BIGINT) AS resized_checksum,
        |  CAST((length(text) + 63) // 64 AS BIGINT) AS n_frames,
        |  CAST(((length(text) + 63) // 64 + 1) // 2 AS BIGINT) AS sampled_frames,
        |  CAST(64 * (((length(text) + 63) // 64 + 1) // 2)
        |    - CASE WHEN ((length(text) + 63) // 64 - 1) % 2 = 0
        |           THEN 64 - (length(text) - ((length(text) + 63) // 64 - 1) * 64)
        |           ELSE 0 END AS BIGINT) AS sampled_bytes
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q60_multimodal_features" ->
      """SELECT doc_id, CAST(b AS BIGINT) AS bucket,
        |  CAST(len(list_filter(string_split(text, ''),
        |    c -> unicode(c) // 16 = b)) AS BIGINT) AS cnt
        |FROM documents, range(0, 16) t(b)
        |ORDER BY doc_id, bucket""".stripMargin,
    "q52_stats_agg" ->
      """SELECT l_returnflag,
        |  round(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price,
        |  round(stddev_samp(l_quantity), 4) AS sd_qty,
        |  round(var_samp(l_quantity), 4) AS var_qty,
        |  round(covar_samp(l_quantity, l_discount), 6) AS cov_qty_disc
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    "q53_array_funcs" ->
      """SELECT vec_id,
        |  CAST(len(embedding) AS BIGINT) AS dim,
        |  round(list_aggregate(list_transform(embedding,
        |    x -> CAST(x AS DOUBLE)), 'sum'), 4) AS sum_all,
        |  CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_pos,
        |  round(CAST(list_max(embedding) AS DOUBLE), 6) AS max_v,
        |  round(CAST(list_min(embedding) AS DOUBLE), 6) AS min_v,
        |  round(list_aggregate(list_transform(embedding,
        |    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'), 4) AS sum_sq
        |FROM embeddings ORDER BY vec_id""".stripMargin,
    "q48_tfidf_top_terms" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS term
        |  FROM documents),
        |tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
        |       FROM tok GROUP BY 1, 2),
        |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |n AS (SELECT count(*) AS n_docs FROM documents),
        |scored AS (
        |  SELECT tf.doc_id, tf.term, tf.tf,
        |    round(tf.tf * ln(CAST(n_docs AS DOUBLE) / df.df), 6) AS score
        |  FROM tf JOIN df USING (term) CROSS JOIN n),
        |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY doc_id
        |        ORDER BY score DESC, term) AS BIGINT) AS rk FROM scored)
        |SELECT doc_id, rk, term, tf, score FROM r WHERE rk <= 3
        |ORDER BY doc_id, rk""".stripMargin,
    "q49_repetition_ratio" ->
      """WITH g AS (
        |  SELECT doc_id,
        |    list_transform(range(1, len(string_split(text,' ')) - 1),
        |      i -> string_split(text,' ')[i] || ' ' ||
        |           string_split(text,' ')[i+1] || ' ' ||
        |           string_split(text,' ')[i+2]) AS grams
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(grams) AS BIGINT) AS total_3grams,
        |  CAST(len(list_distinct(grams)) AS BIGINT) AS distinct_3grams,
        |  round(1.0 - CAST(len(list_distinct(grams)) AS DOUBLE)
        |    / len(grams), 4) AS repetition
        |FROM g ORDER BY doc_id""".stripMargin,
    "q25_fingerprints" ->
      """SELECT doc_id, md5(text) AS md5_hex, sha256(text) AS sha256_hex,
        |  list_reduce(
        |    list_transform(string_split(text, ''),
        |                   x -> CAST(unicode(x) AS BIGINT)),
        |    (a, b) -> (a * 31 + b) % 2147483647) AS rolling_fp,
        |  list_reduce(
        |    list_transform(string_split(text, ''),
        |                   x -> CAST(unicode(x) AS BIGINT)),
        |    (a, b) -> (a * 31 + b) % 2147483647) AS rolling_fp_native
        |FROM documents ORDER BY doc_id""".stripMargin,
  )

  // ---- generated oracle SQL for the portable-hash LSH family ----------
  // The Spark side runs graft.llm.PortableSeededHash (60-bit md5 prefix);
  // `h(x, seed)` below is its exact DuckDB spelling, so signatures, band
  // buckets, SimHash bits and hyperplane signs replay byte-for-byte.

  /** q91/q105 shared oracle: the hash split's train bucket checked for
    * cross-side n-gram containment against its test bucket — q105's
    * Bloom prefilter must be invisible in the answer, so both queries
    * compare against the identical SQL. */
  private def decontaminationOracle: String =
    """WITH split AS (
      |  SELECT doc_id, text,
      |    ('0x' || substr(md5('42:' || doc_id), 1, 15))::BIGINT % 100
      |      AS bucket
      |  FROM documents),
      |tagged AS (
      |  SELECT doc_id, text, 'C' AS side FROM split WHERE bucket < 80
      |  UNION ALL
      |  SELECT doc_id, text, 'B' FROM split WHERE bucket >= 90),
      |w AS (SELECT doc_id, side, string_split(text, ' ') AS ws FROM tagged),
      |sh AS (SELECT doc_id, side,
      |         list_distinct(list_transform(range(1, len(ws) - 1),
      |           i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS s
      |       FROM w WHERE len(ws) >= 3),
      |ex AS (SELECT doc_id, unnest(s) AS sg FROM sh),
      |sz AS (SELECT doc_id, side, len(s) AS sz FROM sh),
      |p AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS inter
      |      FROM ex a JOIN ex b ON a.sg = b.sg AND a.doc_id < b.doc_id
      |      GROUP BY 1, 2)
      |SELECT CASE WHEN sa.side = 'C' THEN p.da ELSE p.db END AS corpus_doc,
      |  CASE WHEN sa.side = 'B' THEN p.da ELSE p.db END AS benchmark_doc,
      |  round(CAST(inter AS DOUBLE) / least(sa.sz, sb.sz), 4) AS containment
      |FROM p JOIN sz sa ON p.da = sa.doc_id JOIN sz sb ON p.db = sb.doc_id
      |WHERE sa.side <> sb.side
      |  AND CAST(inter AS DOUBLE) / least(sa.sz, sb.sz) >= 0.5
      |ORDER BY corpus_doc, benchmark_doc""".stripMargin

  private def h(x: String, seed: Int): String =
    graft.llm.PortableSeededHash.sql(x, seed)

  /** The shared q89/q191 WITH-body: canonical hash order, per-bucket
    * running token totals and bucket offsets (the two-phase prefix). */
  private def q89PackCtes: String =
    s"""b AS (
  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         ${h("doc_id", 29)} AS h
  FROM documents),
p AS (SELECT doc_id, n_tokens, h, h % 8 AS bucket,
        CAST(sum(n_tokens) OVER (PARTITION BY h % 8
          ORDER BY h, doc_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
      FROM b),
o AS (SELECT bucket, CAST(COALESCE(sum(total) OVER (ORDER BY bucket
        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        AS bucket_offset
      FROM (SELECT bucket, max(cum) AS total FROM p GROUP BY bucket))"""

  /** The shared q111/q189 WITH-body: hashed unigram+bigram bucket
    * postings for the 80/10 corpus split and the per-doc DSIR
    * log-ratio as the `dsirsc` CTE. */
  private def q111DsirCtes: String =
    s"""toks AS (
  SELECT doc_id, string_split(text, ' ') AS t,
         ${h("doc_id", 42)} % 100 AS sb
  FROM documents),
grams AS (
  SELECT doc_id, sb, t[i] AS g
  FROM toks, LATERAL unnest(generate_series(1, len(t))) AS u(i)
  UNION ALL
  SELECT doc_id, sb, t[i] || ' ' || t[i+1]
  FROM toks, LATERAL unnest(generate_series(1, len(t) - 1)) AS u(i)),
gb AS (SELECT doc_id, sb,
         ${h("g", 59)} % 1024 AS b
       FROM grams),
tg AS (SELECT b FROM gb WHERE sb >= 90),
rg AS (SELECT doc_id, b FROM gb WHERE sb < 80),
tc AS (SELECT b, count(*) AS ct FROM tg GROUP BY b),
rc AS (SELECT b, count(*) AS cr FROM rg GROUP BY b),
tt AS (SELECT count(*) AS t_total FROM tg),
rt AS (SELECT count(*) AS r_total FROM rg),
dsirsc AS (SELECT CAST(rg.doc_id AS BIGINT) AS doc_id,
  CAST(count(*) AS BIGINT) AS n_grams,
  round(sum(
    ln((COALESCE(tc.ct, 0) + 1) / CAST(tt.t_total + 1024 AS DOUBLE)) -
    ln((COALESCE(rc.cr, 0) + 1) / CAST(rt.r_total + 1024 AS DOUBLE))), 4)
    AS log_ratio
FROM rg LEFT JOIN tc USING (b) LEFT JOIN rc USING (b), tt, rt
GROUP BY rg.doc_id)"""

  /** The q123 signal CTEs (token split, marker lang scores, entropy,
    * hashed classifier logit, joined into `sig`) — shared by the q123
    * gate oracle and the q125 manifest oracle. WITH-body only. */
  private def webFilterSignalsCtes: String =
    s"""t AS (SELECT doc_id, string_split(text, ' ') AS toks
       FROM documents),
lang AS (SELECT doc_id,
  CAST(len(list_filter(toks, x -> x IN ('the','and','of','is','in','a'))) AS BIGINT) AS s_en,
  CAST(len(list_filter(toks, x -> x IN ('der','die','das','und','ist','ein'))) AS BIGINT) AS s_de,
  CAST(len(list_filter(toks, x -> x IN ('le','la','les','et','est','un'))) AS BIGINT) AS s_fr,
  CAST(len(list_filter(toks, x -> x IN ('el','los','y','es','una','que'))) AS BIGINT) AS s_es
  FROM t),
ent AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
  round(-list_sum(list_transform(
    list_transform(list_sort(list_distinct(toks)),
      u -> CAST(len(list_filter(toks, x -> x = u)) AS DOUBLE)),
    c -> (c / CAST(len(toks) AS DOUBLE)) * ln(c / CAST(len(toks) AS DOUBLE)))), 4)
    AS entropy
  FROM t),
grams AS (
  SELECT doc_id, t.toks[i] AS g
  FROM t, LATERAL unnest(generate_series(1, len(toks))) AS u(i)
  UNION ALL
  SELECT doc_id, t.toks[i] || ' ' || t.toks[i+1]
  FROM t, LATERAL unnest(generate_series(1, len(toks) - 1)) AS u(i)),
clf AS (SELECT doc_id, CAST(SUM((${graft.llm.PortableSeededHash.sql(
             "'w' || (" + graft.llm.PortableSeededHash.sql("g", 59) +
               " % 256)::VARCHAR", 77)} % 17) - 8) AS BIGINT) AS logit
        FROM grams GROUP BY doc_id),
sig AS (SELECT l.doc_id, e.n_tokens,
  CASE WHEN greatest(s_en, s_de, s_fr, s_es) = 0 THEN 'und'
       WHEN s_en >= greatest(s_de, s_fr, s_es) THEN 'en'
       WHEN s_de >= greatest(s_fr, s_es) THEN 'de'
       WHEN s_fr >= s_es THEN 'fr'
       ELSE 'es' END AS pred_lang,
  e.entropy, c.logit
  FROM lang l JOIN ent e USING (doc_id) JOIN clf c USING (doc_id))"""

  /** q115 oracle: replays the ENTIRE quantized-state gradient descent of
    * [[graft.llm.Importance.trainLogisticHashed]] (buckets=256, iters=3,
    * lr=0.5 ⇒ a = lr·2^16/2^20 = 0.03125 exactly) as a generated CTE
    * chain — one (margin → residual → gradient → update) stage per
    * iteration, all in integer arithmetic except the single
    * ROUND((a·G)/N) per update, which is the same two correctly-rounded
    * IEEE ops both engines execute. Then scores every document with the
    * final weights, exactly as hashedLinearLogit does. */
  private def q115TrainedClassifierOracle: String =
    s"""WITH ${q115TrainChainCtes()}
SELECT CAST(a.doc_id AS BIGINT) AS doc_id,
  CAST(count(*) AS BIGINT) AS n_feats,
  CAST(SUM(w.w) AS BIGINT) AS logit,
  CAST(SUM(w.w) AS BIGINT) > 0 AS keep
FROM gb a JOIN w3 w USING (b)
GROUP BY a.doc_id ORDER BY doc_id"""

  /** q182 oracle: the q115 training chain, scores restricted to the
    * labeled set, then the per-score histogram, the average-rank AUC
    * identity 2U = Σ p_s·(2·(below+1)+(n_s−1)) − nPos·(nPos+1), and the
    * threshold-0 confusion counts — integer arithmetic to the final
    * divisions, which are single IEEE ops rounded to 4 dp both sides. */
  private def q182ClassifierEvalOracle: String =
    s"""WITH ${q115TrainChainCtes(
      labSelect = "SELECT DISTINCT doc_id, " +
        "CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END AS y FROM toks " +
        "WHERE sb < 80")},
helab AS (SELECT DISTINCT doc_id,
            CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END AS y
          FROM toks WHERE sb >= 80),
scl AS (SELECT g.doc_id, max(l.y) AS y, SUM(w.w) AS logit
        FROM gb g JOIN helab l USING (doc_id) JOIN w3 w USING (b)
        GROUP BY g.doc_id),
hist AS (SELECT logit, count(*) AS cnt, sum(y) AS p FROM scl GROUP BY 1),
cm AS (SELECT logit, cnt, p,
         coalesce(sum(cnt) OVER (ORDER BY logit
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS below
       FROM hist),
m AS (SELECT sum(p * (2 * (below + 1) + (cnt - 1))) AS s2,
        sum(p) AS npos, sum(cnt) AS ntot,
        sum(CASE WHEN logit > 0 THEN p ELSE 0 END) AS tp,
        sum(CASE WHEN logit > 0 THEN cnt - p ELSE 0 END) AS fp
      FROM cm)
SELECT CAST(ntot AS BIGINT) AS n_eval, CAST(npos AS BIGINT) AS n_pos,
  CAST(ntot - npos AS BIGINT) AS n_neg,
  CAST(tp AS BIGINT) AS n_tp, CAST(fp AS BIGINT) AS n_fp,
  CAST(npos - tp AS BIGINT) AS n_fn,
  CAST(ntot - npos - fp AS BIGINT) AS n_tn,
  round(CAST(s2 - npos * (npos + 1) AS DOUBLE)
    / CAST(2 * npos * (ntot - npos) AS DOUBLE), 4) AS auc,
  CASE WHEN tp + fp = 0 THEN NULL
       ELSE round(CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE), 4)
  END AS prec,
  round(CAST(tp AS DOUBLE) / CAST(npos AS DOUBLE), 4) AS rec,
  round(CAST(2 * tp AS DOUBLE)
    / CAST(2 * tp + fp + npos - tp AS DOUBLE), 4) AS f1
FROM m"""

  /** q187 oracle: the q182 held-out scoring chain, then the integer
    * hard-sigmoid p̂_fp = clamp(4·logit + 2^19, 0, 2^20), fixed 2^17
    * bins, per-bin mean predicted probability vs observed rate. */
  private def q187CalibrationOracle: String =
    s"""WITH ${q115TrainChainCtes(
      labSelect = "SELECT DISTINCT doc_id, " +
        "CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END AS y FROM toks " +
        "WHERE sb < 80")},
helab AS (SELECT DISTINCT doc_id,
            CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END AS y
          FROM toks WHERE sb >= 80),
scl AS (SELECT g.doc_id, max(l.y) AS y, SUM(w.w) AS logit
        FROM gb g JOIN helab l USING (doc_id) JOIN w3 w USING (b)
        GROUP BY g.doc_id),
ph AS (SELECT y,
         LEAST(GREATEST((logit >> 6) * 4 + 524288, 0), 1048576) AS phat_fp
       FROM scl)
SELECT CAST(phat_fp // 131072 AS BIGINT) AS bin,
  CAST(count(*) AS BIGINT) AS n,
  round(CAST(sum(phat_fp) AS DOUBLE)
    / (CAST(count(*) AS DOUBLE) * 1048576.0), 4) AS mean_phat,
  round(CAST(sum(y) AS DOUBLE) / CAST(count(*) AS DOUBLE), 4) AS obs_rate
FROM ph GROUP BY 1 ORDER BY bin"""

  /** The shared q115/q182 WITH-body: tokenize, hash grams to buckets,
    * label (q115: pseudo-labels on the doc_id hash slice; q182: real
    * lang-derived labels), then the full 3-iteration quantized gradient
    * descent (w0..w3) over `tg` = the labeled gram postings restricted
    * by `trainWhere`. */
  private def q115TrainChainCtes(
      labSelect: String = "SELECT DISTINCT doc_id, " +
        "CASE WHEN sb >= 90 THEN 1 ELSE 0 END AS y\n        " +
        "FROM toks WHERE sb < 80 OR sb >= 90"): String = {
    val iters = 3
    val stages = (0 until iters).map { k =>
      s"""m$k AS (SELECT t.doc_id, t.y, SUM(w.w) AS m
   FROM tg t JOIN w$k w USING (b) GROUP BY t.doc_id, t.y),
q$k AS (SELECT doc_id,
          LEAST(GREATEST(m * 4 + 524288, 0), 1048576) - y * 1048576 AS q
        FROM m$k),
g$k AS (SELECT t.b, SUM(q.q) AS G
        FROM tg t JOIN q$k q USING (doc_id) GROUP BY t.b),
w${k + 1} AS (SELECT w.b,
          w.w - CAST(ROUND((0.03125 * COALESCE(g.G, 0)) / n.n) AS BIGINT)
            AS w
        FROM w$k w LEFT JOIN g$k g USING (b), n)"""
    }.mkString(",\n")
    s"""toks AS (
  SELECT doc_id, n_chars, string_split(text, ' ') AS t,
         ${h("doc_id", 42)} % 100 AS sb
  FROM documents),
grams AS (
  SELECT doc_id, sb, t[i] AS g
  FROM toks, LATERAL unnest(generate_series(1, len(t))) AS u(i)
  UNION ALL
  SELECT doc_id, sb, t[i] || ' ' || t[i+1]
  FROM toks, LATERAL unnest(generate_series(1, len(t) - 1)) AS u(i)),
gb AS (SELECT doc_id, sb, ${h("g", 59)} % 256 AS b FROM grams),
lab AS ($labSelect),
n AS (SELECT count(*) AS n FROM lab),
tg AS (SELECT g.doc_id, l.y, g.b FROM gb g JOIN lab l USING (doc_id)),
w0 AS (SELECT CAST(range AS BIGINT) AS b, CAST(0 AS BIGINT) AS w
       FROM range(256)),
$stages"""
  }

  /** q128 oracle: replay [[graft.llm.LanguageModel.trainPhrases]] round
    * by round — per round, the q121 PMI scoring + rounded cut line over
    * the CURRENT tokenization, then the greedy merge as the same
    * gaps-and-islands windows the engine uses (running non-mergeable
    * count = run id, within-run running mergeable count = alternation
    * parity, lag = consumed successor). Every round's re-tokenization is
    * thereby pinned, not just the scores: a parity or window-frame fault
    * in the engine's merge pass changes round-2 counts and
    * hash-mismatches. */
  private def q128PhraseVocabOracle(rounds: Int, minCount: Int = 5,
                                    topK: Int = 20): String = {
    val perRound = (1 to rounds).map { r =>
      val merge =
        if (r == rounds) ""
        else s""",
m$r AS (SELECT p.doc_id, p.pos, p.tok, p.nxt, t.w1 IS NOT NULL AS mergeable
  FROM pr$r p LEFT JOIN top$r t ON p.tok = t.w1 AND p.nxt = t.w2),
g$r AS (SELECT *, sum(CASE WHEN mergeable THEN 0 ELSE 1 END)
    OVER (PARTITION BY doc_id ORDER BY pos) AS grp FROM m$r),
x$r AS (SELECT *, sum(CASE WHEN mergeable THEN 1 ELSE 0 END)
    OVER (PARTITION BY doc_id, grp ORDER BY pos) AS midx FROM g$r),
y$r AS (SELECT *, mergeable AND midx % 2 = 1 AS merge_pos FROM x$r),
z$r AS (SELECT *, coalesce(lag(merge_pos)
    OVER (PARTITION BY doc_id ORDER BY pos), false) AS consumed FROM y$r),
t$r AS (SELECT doc_id,
    row_number() OVER (PARTITION BY doc_id ORDER BY pos) - 1 AS pos,
    CASE WHEN merge_pos THEN tok || '_' || nxt ELSE tok END AS tok
  FROM z$r WHERE NOT consumed)"""
      s"""pr$r AS (SELECT doc_id, pos, tok,
    lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt
  FROM t${r - 1}),
bg$r AS (SELECT tok AS w1, nxt AS w2 FROM pr$r WHERE nxt IS NOT NULL),
big$r AS (SELECT w1, w2, count(*) AS c_ab FROM bg$r GROUP BY 1, 2),
uni$r AS (SELECT tok AS w, count(*) AS c FROM t${r - 1} GROUP BY 1),
n$r AS (SELECT count(*) AS n FROM bg$r),
top$r AS (SELECT w1, w2, c_ab,
    round(ln(CAST(c_ab AS DOUBLE) * CAST(n.n AS DOUBLE)
      / (CAST(u1.c AS DOUBLE) * CAST(u2.c AS DOUBLE))), 4) AS pmi
  FROM big$r b JOIN uni$r u1 ON b.w1 = u1.w
       JOIN uni$r u2 ON b.w2 = u2.w, n$r n
  WHERE c_ab >= $minCount
  ORDER BY pmi DESC, w1, w2 LIMIT $topK)$merge"""
    }.mkString(",\n")
    val union = (1 to rounds)
      .map(r => s"SELECT CAST($r AS BIGINT) AS merge_round, * FROM top$r")
      .mkString("\n  UNION ALL ")
    s"""WITH t0 AS (
  SELECT doc_id, generate_subscripts(ws, 1) - 1 AS pos, unnest(ws) AS tok
  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)),
$perRound
SELECT merge_round, w1, w2, CAST(c_ab AS BIGINT) AS c_ab, pmi FROM (
  $union)
ORDER BY merge_round, pmi DESC, w1, w2"""
  }

  /** q134 oracle: the q128 train chain with the greedy merge applied at
    * EVERY round (q128's generator skips the last round's merge because
    * the trainer only scores it), then per-doc reassembly of the merged
    * token stream — training and application both replayed, so a fault
    * in either the PMI cut line or the merge windows hash-mismatches. */
  private def q134ApplyPhrasesOracle(rounds: Int, minCount: Int = 5,
                                     topK: Int = 20): String = {
    val perRound = (1 to rounds).map { r =>
      s"""pr$r AS (SELECT doc_id, pos, tok,
    lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt
  FROM t${r - 1}),
bg$r AS (SELECT tok AS w1, nxt AS w2 FROM pr$r WHERE nxt IS NOT NULL),
big$r AS (SELECT w1, w2, count(*) AS c_ab FROM bg$r GROUP BY 1, 2),
uni$r AS (SELECT tok AS w, count(*) AS c FROM t${r - 1} GROUP BY 1),
n$r AS (SELECT count(*) AS n FROM bg$r),
top$r AS (SELECT w1, w2, c_ab,
    round(ln(CAST(c_ab AS DOUBLE) * CAST(n.n AS DOUBLE)
      / (CAST(u1.c AS DOUBLE) * CAST(u2.c AS DOUBLE))), 4) AS pmi
  FROM big$r b JOIN uni$r u1 ON b.w1 = u1.w
       JOIN uni$r u2 ON b.w2 = u2.w, n$r n
  WHERE c_ab >= $minCount
  ORDER BY pmi DESC, w1, w2 LIMIT $topK),
m$r AS (SELECT p.doc_id, p.pos, p.tok, p.nxt, t.w1 IS NOT NULL AS mergeable
  FROM pr$r p LEFT JOIN top$r t ON p.tok = t.w1 AND p.nxt = t.w2),
g$r AS (SELECT *, sum(CASE WHEN mergeable THEN 0 ELSE 1 END)
    OVER (PARTITION BY doc_id ORDER BY pos) AS grp FROM m$r),
x$r AS (SELECT *, sum(CASE WHEN mergeable THEN 1 ELSE 0 END)
    OVER (PARTITION BY doc_id, grp ORDER BY pos) AS midx FROM g$r),
y$r AS (SELECT *, mergeable AND midx % 2 = 1 AS merge_pos FROM x$r),
z$r AS (SELECT *, coalesce(lag(merge_pos)
    OVER (PARTITION BY doc_id ORDER BY pos), false) AS consumed FROM y$r),
t$r AS (SELECT doc_id,
    row_number() OVER (PARTITION BY doc_id ORDER BY pos) - 1 AS pos,
    CASE WHEN merge_pos THEN tok || '_' || nxt ELSE tok END AS tok
  FROM z$r WHERE NOT consumed)"""
    }.mkString(",\n")
    s"""WITH t0 AS (
  SELECT doc_id, generate_subscripts(ws, 1) - 1 AS pos, unnest(ws) AS tok
  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)),
$perRound
SELECT r.doc_id, r.n_tokens_raw, m.n_tokens_merged, m.text_merged
FROM (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens_raw
      FROM t0 GROUP BY 1) r
JOIN (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens_merged,
        string_agg(tok, ' ' ORDER BY pos) AS text_merged
      FROM t$rounds GROUP BY 1) m USING (doc_id)
ORDER BY doc_id"""
  }

  /** Shared CTE chain of the BPE oracles (q215/q217): the distinct-word
    * count table, the char+end-of-word symbol frame, and `merges`
    * unrolled rounds — weighted adjacent-pair counts, the
    * (pair_count DESC, s1, s2) winner at the minPairCount gate, and the
    * q128 gaps-and-islands greedy merge keyed by WORD (concatenation
    * with no joiner — subword symbols fuse). The trainer skips the last
    * round's merge (it only scores it); `applyAll` replays every merge
    * (the q217 tokenizer). */
  private def bpeRoundCtes(merges: Int, minPairCount: Int,
                           applyAll: Boolean): String = {
    val perRound = (1 to merges).map { r =>
      val merge =
        if (r == merges && !applyAll) ""
        else s""",
m$r AS (SELECT p.w, p.cnt, p.pos, p.tok, p.nxt, b.s1 IS NOT NULL AS mergeable
  FROM pr$r p LEFT JOIN best$r b ON p.tok = b.s1 AND p.nxt = b.s2),
g$r AS (SELECT *, sum(CASE WHEN mergeable THEN 0 ELSE 1 END)
    OVER (PARTITION BY w ORDER BY pos) AS grp FROM m$r),
x$r AS (SELECT *, sum(CASE WHEN mergeable THEN 1 ELSE 0 END)
    OVER (PARTITION BY w, grp ORDER BY pos) AS midx FROM g$r),
y$r AS (SELECT *, mergeable AND midx % 2 = 1 AS merge_pos FROM x$r),
z$r AS (SELECT *, coalesce(lag(merge_pos)
    OVER (PARTITION BY w ORDER BY pos), false) AS consumed FROM y$r),
f$r AS (SELECT w, cnt,
    row_number() OVER (PARTITION BY w ORDER BY pos) - 1 AS pos,
    CASE WHEN merge_pos THEN tok || nxt ELSE tok END AS tok
  FROM z$r WHERE NOT consumed)"""
      s"""pr$r AS (SELECT w, cnt, pos, tok,
    lead(tok) OVER (PARTITION BY w ORDER BY pos) AS nxt
  FROM f${r - 1}),
best$r AS (SELECT tok AS s1, nxt AS s2,
    CAST(sum(cnt) AS BIGINT) AS pair_count
  FROM pr$r WHERE nxt IS NOT NULL GROUP BY 1, 2
  HAVING sum(cnt) >= $minPairCount
  ORDER BY pair_count DESC, s1, s2 LIMIT 1)$merge"""
    }.mkString(",\n")
    s"""words AS (SELECT w, CAST(count(*) AS BIGINT) AS cnt FROM (
    SELECT unnest(string_split(text, ' ')) AS w FROM documents)
  WHERE w <> '' GROUP BY 1),
f0 AS (SELECT w, cnt, i - 1 AS pos, substring(w, i, 1) AS tok
    FROM (SELECT w, cnt, unnest(generate_series(1, length(w))) AS i
          FROM words)
  UNION ALL
  SELECT w, cnt, length(w) AS pos, '</w>' AS tok FROM words),
$perRound"""
  }

  /** q215 oracle: the BPE train chain, final output = every round's
    * winning pair (rounds whose best pair misses the gate emit no row,
    * the trainer's stopping rule). */
  private def q215BpeTrainOracle(merges: Int, minPairCount: Int = 2)
      : String = {
    val union = (1 to merges)
      .map(r => s"SELECT CAST($r AS BIGINT) AS merge_round, * FROM best$r")
      .mkString("\n  UNION ALL ")
    s"""WITH ${bpeRoundCtes(merges, minPairCount, applyAll = false)}
SELECT merge_round, s1, s2, pair_count FROM (
  $union)
ORDER BY merge_round"""
  }

  /** q217 oracle: the train chain with EVERY merge applied, per-word
    * subword counts off the final symbol frame, joined back to word
    * occurrences — per-doc word/subword counts and 4-dp fertility. */
  private def q217BpeTokenizeOracle(merges: Int, minPairCount: Int = 2)
      : String =
    s"""WITH ${bpeRoundCtes(merges, minPairCount, applyAll = true)},
wt AS (SELECT w, CAST(count(*) AS BIGINT) AS n_subwords
       FROM f$merges GROUP BY 1),
occ AS (SELECT doc_id, w FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
  WHERE w <> '')
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
  CAST(sum(n_subwords) AS BIGINT) AS n_subword_tokens,
  round(CAST(sum(n_subwords) AS DOUBLE) / count(*), 4) AS fertility
FROM occ JOIN wt USING (w) GROUP BY 1 ORDER BY doc_id"""

  /** Shared CTE chain of the unigram-LM oracles (q223/q224): the
    * distinct-word table, the length≤`maxPieceLen` substring span set,
    * the top-`seedSize`+singles seed vocabulary, and `rounds` unrolled
    * hard-EM rounds — fixed-point ln scores (round(ln·10⁶), the q110
    * libm convention, rounded BEFORE any decision), a position-unrolled
    * Viterbi DP with (total DESC, start, piece) argmax ties, the
    * backpointer walk, the occurrence-weighted recount, and the
    * rebuild rule (nonzero pieces ∪ unchosen singles floored at 1).
    * Ends with uv{rounds} (the final vocabulary) and un{rounds}
    * (per-word piece counts of the final segmentation). */
  private def unigramCtes(seedSize: Int = 48, rounds: Int = 2,
                          pieceLen: Int = 4, maxLen: Int = 12,
                          shrinkTo: Option[Int] = None,
                          shrinkKeepPct: Int = 80): String = {
    def dpRound(r: Int): String = {
      val dp = (1 to maxLen).map { j =>
        val froms = (math.max(0, j - pieceLen) until j).map { i =>
          s"""SELECT e.w, e.i AS bi, e.piece AS bpiece,
      p.best + e.score AS total
    FROM ue$r e JOIN ud${r}_$i p ON p.w = e.w
    WHERE e.j = $j AND e.i = $i"""
        }.mkString("\n    UNION ALL ")
        s"""uc${r}_$j AS MATERIALIZED (
    $froms),
ud${r}_$j AS MATERIALIZED (SELECT w, $j AS j, total AS best, bi, bpiece FROM (
    SELECT *, row_number() OVER (PARTITION BY w
      ORDER BY total DESC, bi, bpiece) AS rn FROM uc${r}_$j)
  WHERE rn = 1)"""
      }.mkString(",\n")
      val dall = (1 to maxLen).map(j => s"SELECT * FROM ud${r}_$j")
        .mkString("\n  UNION ALL ")
      val bw = (1 until maxLen).map { k =>
        s"""ubw${r}_$k AS MATERIALIZED (SELECT d.w, d.j, d.bi, d.bpiece
  FROM ubw${r}_${k - 1} b JOIN udall$r d ON d.w = b.w AND d.j = b.bi
  WHERE b.bi > 0)"""
      }.mkString(",\n")
      val segUnion = (0 until maxLen).map(k =>
        s"SELECT w, bpiece AS piece FROM ubw${r}_$k")
        .mkString("\n  UNION ALL ")
      s"""ut$r AS MATERIALIZED (SELECT CAST(sum(freq) AS DOUBLE) AS total FROM uv${r - 1}),
usc$r AS MATERIALIZED (SELECT piece,
    CAST(round(ln(CAST(freq AS DOUBLE) / t.total) * 1000000, 0) AS BIGINT)
      AS score
  FROM uv${r - 1}, ut$r t),
ue$r AS MATERIALIZED (SELECT s.w, s.i, s.j, s.piece, v.score
  FROM usp s JOIN usc$r v USING (piece)),
ud${r}_0 AS MATERIALIZED (SELECT w, 0 AS j, CAST(0 AS BIGINT) AS best, -1 AS bi,
    CAST(NULL AS VARCHAR) AS bpiece FROM uwords),
$dp,
udall$r AS MATERIALIZED (
  $dall),
ubw${r}_0 AS MATERIALIZED (SELECT d.w, d.j, d.bi, d.bpiece FROM udall$r d
  JOIN uwords w2 ON w2.w = d.w AND length(w2.w) = d.j),
$bw,
useg$r AS MATERIALIZED (
  $segUnion),
ucnt$r AS MATERIALIZED (SELECT piece, CAST(sum(cnt) AS BIGINT) AS freq
  FROM useg$r JOIN uwords USING (w) GROUP BY 1),
un$r AS MATERIALIZED (SELECT w, CAST(count(*) AS BIGINT) AS n_pieces
  FROM useg$r GROUP BY 1),
uvraw$r AS MATERIALIZED (SELECT piece, freq FROM ucnt$r
  UNION ALL
  SELECT s.piece, CAST(1 AS BIGINT) FROM usingle s
  WHERE s.piece NOT IN (SELECT piece FROM ucnt$r)),
uv$r AS MATERIALIZED (${shrinkTo.fold(
        s"SELECT piece, freq FROM uvraw$r")(target =>
        s"""SELECT piece, freq FROM (
    SELECT *, row_number() OVER (ORDER BY freq DESC, piece) AS rn,
           count(*) OVER () AS nv FROM uvraw$r)
  WHERE rn <= greatest($target, (nv * $shrinkKeepPct) // 100)
    OR length(piece) = 1""")})"""
    }
    s"""uwords AS MATERIALIZED (SELECT w, CAST(count(*) AS BIGINT) AS cnt FROM (
    SELECT unnest(string_split(text, ' ')) AS w FROM documents)
  WHERE w <> '' GROUP BY 1),
usp AS MATERIALIZED (SELECT w, cnt, i, i + l AS j, substr(w, i + 1, l) AS piece
  FROM uwords,
       LATERAL unnest(range(0, length(w))) AS a(i),
       LATERAL unnest(range(1, 1 + least($pieceLen, length(w) - i)))
         AS b(l)),
useed0 AS MATERIALIZED (SELECT piece, CAST(sum(cnt) AS BIGINT) AS freq
  FROM usp GROUP BY 1),
utop AS MATERIALIZED (SELECT piece, freq FROM (
    SELECT *, row_number() OVER (ORDER BY freq DESC, piece) AS rn
    FROM useed0)
  WHERE rn <= $seedSize),
usingle AS MATERIALIZED (SELECT DISTINCT piece FROM usp WHERE length(piece) = 1),
uv0 AS MATERIALIZED (SELECT piece, freq FROM utop
  UNION ALL
  SELECT s0.piece, s0.freq FROM useed0 s0 JOIN usingle USING (piece)
  WHERE s0.piece NOT IN (SELECT piece FROM utop)),
${(1 to rounds).map(dpRound).mkString(",\n")}"""
  }

  /** Shared CTE chain of the SOFT-EM unigram oracle (q237): the same
    * word/span/seed tables as [[unigramCtes]] (seed counts ·10⁶), then
    * `rounds` unrolled forward–backward rounds — fixed-point ln
    * scores, a position-unrolled α recurrence whose log-sum-exp
    * max-shifts and LEFT-FOLDS its exp terms in (start, piece) order
    * (the exact float-add sequence the Spark expression executes — a
    * deterministic fold is bit-reproducible), the mirrored β
    * recurrence folding in (end, piece) order, per-span posteriors
    * rounded to ·10⁶ BEFORE the occurrence-weighted BIGINT recount,
    * and the rebuild rule (expected-nonzero pieces ∪ zero-rounded
    * singles floored at 10⁶). */
  private def unigramSoftCtes(seedSize: Int = 32, rounds: Int = 2,
                              pieceLen: Int = 3, maxLen: Int = 12): String = {
    // max-shifted fixed-point LSE over rows (w, <ordCols>, x),
    // folding exp terms in ORDER BY <ordCols>
    def lseSelect(src: String, ordCols: String, out: String): String =
      s"""SELECT w, m + CAST(round(ln(list_reduce(
         |      list_prepend(CAST(0 AS DOUBLE), exps),
         |      (acc, e2) -> acc + e2)) * 1000000, 0) AS BIGINT) AS $out
         |  FROM (
         |    SELECT w, max(m) AS m, list(ex ORDER BY $ordCols) AS exps
         |    FROM (
         |      SELECT w, $ordCols, m,
         |             exp(CAST(x - m AS DOUBLE) / 1000000.0) AS ex
         |      FROM (SELECT w, $ordCols, x,
         |                   max(x) OVER (PARTITION BY w) AS m
         |            FROM $src) q1) q2
         |    GROUP BY w) q3""".stripMargin
    def softRound(r: Int): String = {
      val fwd = (1 to maxLen).map { j =>
        val legs = (math.max(0, j - pieceLen) until j).map { i =>
          s"""SELECT e.w, e.i, e.piece, p.afp + e.score AS x
    FROM ue$r e JOIN usa${r}_$i p ON p.w = e.w
    WHERE e.j = $j AND e.i = $i"""
        }.mkString("\n    UNION ALL ")
        s"""usac${r}_$j AS MATERIALIZED (
    $legs),
usa${r}_$j AS MATERIALIZED (
  ${lseSelect(s"usac${r}_$j", "i, piece", "afp")})"""
      }.mkString(",\n")
      val bwd = (0 until maxLen).reverse.map { j =>
        val legs = ((j + 1) to math.min(j + pieceLen, maxLen)).map { k =>
          s"""SELECT e.w, e.j AS jj, e.piece, b.bfp + e.score AS x
    FROM ue$r e JOIN usb${r}_$k b ON b.w = e.w
    WHERE e.i = $j AND e.j = $k"""
        }.mkString("\n    UNION ALL ")
        s"""usbc${r}_$j AS MATERIALIZED (
    $legs),
usb${r}_$j AS MATERIALIZED (
  SELECT w, CAST(0 AS BIGINT) AS bfp FROM uwords WHERE length(w) = $j
  UNION ALL
  ${lseSelect(s"usbc${r}_$j", "jj, piece", "bfp")})"""
      }.mkString(",\n")
      val aAll = (0 to maxLen).map(j =>
        s"SELECT w, $j AS pos, afp FROM usa${r}_$j")
        .mkString("\n  UNION ALL ")
      val bAll = (0 to maxLen).map(j =>
        s"SELECT w, $j AS pos, bfp FROM usb${r}_$j")
        .mkString("\n  UNION ALL ")
      s"""ust$r AS MATERIALIZED (SELECT CAST(sum(freq) AS DOUBLE) AS total FROM usv${r - 1}),
ussc$r AS MATERIALIZED (SELECT piece,
    CAST(round(ln(CAST(freq AS DOUBLE) / t.total) * 1000000, 0) AS BIGINT)
      AS score
  FROM usv${r - 1}, ust$r t),
ue$r AS MATERIALIZED (SELECT s.w, s.i, s.j, s.piece, v.score
  FROM usp s JOIN ussc$r v USING (piece)),
usa${r}_0 AS MATERIALIZED (SELECT w, CAST(0 AS BIGINT) AS afp FROM uwords),
usb${r}_$maxLen AS MATERIALIZED (
  SELECT w, CAST(0 AS BIGINT) AS bfp FROM uwords WHERE length(w) = $maxLen),
$fwd,
$bwd,
uaall$r AS MATERIALIZED (
  $aAll),
uball$r AS MATERIALIZED (
  $bAll),
uend$r AS MATERIALIZED (SELECT u.w, a.afp FROM uwords u
  JOIN uaall$r a ON a.w = u.w AND a.pos = length(u.w)),
ues$r AS MATERIALIZED (
  SELECT e.w, e.piece,
    CAST(round(exp(CAST(a.afp + e.score + b.bfp - t.afp AS DOUBLE)
      / 1000000.0) * 1000000, 0) AS BIGINT) AS efp
  FROM ue$r e
  JOIN uaall$r a ON a.w = e.w AND a.pos = e.i
  JOIN uball$r b ON b.w = e.w AND b.pos = e.j
  JOIN uend$r t ON t.w = e.w),
uscnt$r AS MATERIALIZED (
  SELECT piece, CAST(sum(cnt * efp) AS BIGINT) AS freq
  FROM ues$r JOIN uwords USING (w) GROUP BY 1),
usv$r AS MATERIALIZED (
  SELECT piece, freq FROM uscnt$r WHERE freq > 0
  UNION ALL
  SELECT s.piece, CAST(1000000 AS BIGINT) FROM usingle s
  WHERE s.piece NOT IN (SELECT piece FROM uscnt$r WHERE freq > 0))"""
    }
    s"""uwords AS MATERIALIZED (SELECT w, CAST(count(*) AS BIGINT) AS cnt FROM (
    SELECT unnest(string_split(text, ' ')) AS w FROM documents)
  WHERE w <> '' GROUP BY 1),
usp AS MATERIALIZED (SELECT w, cnt, i, i + l AS j, substr(w, i + 1, l) AS piece
  FROM uwords,
       LATERAL unnest(range(0, length(w))) AS a(i),
       LATERAL unnest(range(1, 1 + least($pieceLen, length(w) - i)))
         AS b(l)),
useed0 AS MATERIALIZED (SELECT piece,
    CAST(sum(cnt) * 1000000 AS BIGINT) AS freq
  FROM usp GROUP BY 1),
utop AS MATERIALIZED (SELECT piece, freq FROM (
    SELECT *, row_number() OVER (ORDER BY freq DESC, piece) AS rn
    FROM useed0)
  WHERE rn <= $seedSize),
usingle AS MATERIALIZED (SELECT DISTINCT piece FROM usp WHERE length(piece) = 1),
usv0 AS MATERIALIZED (SELECT piece, freq FROM utop
  UNION ALL
  SELECT s0.piece, s0.freq FROM useed0 s0 JOIN usingle USING (piece)
  WHERE s0.piece NOT IN (SELECT piece FROM utop)),
${(1 to rounds).map(softRound).mkString(",\n")}"""
  }

  /** q237 oracle: the soft-EM chain; output = the final vocabulary of
    * 10⁶-scaled expected counts, ranked (freq DESC, piece). */
  private def q237UnigramSoftOracle(rounds: Int = 2): String =
    s"""WITH ${unigramSoftCtes(rounds = rounds)}
SELECT CAST(row_number() OVER (ORDER BY freq DESC, piece) AS BIGINT)
    AS rank,
  piece, freq
FROM usv$rounds ORDER BY rank"""

  /** q223 oracle: the full unigram chain; output = the final
    * vocabulary ranked (freq DESC, piece). */
  private def q223UnigramOracle(rounds: Int = 2): String =
    s"""WITH ${unigramCtes(rounds = rounds)}
SELECT CAST(row_number() OVER (ORDER BY freq DESC, piece) AS BIGINT)
    AS rank,
  piece, freq
FROM uv$rounds ORDER BY rank"""

  /** q233 oracle: the unigram chain with the per-round shrink rule
    * (top max(target, floor(|V|·keepPct%)) by (freq DESC, piece),
    * singles always kept) replayed verbatim. */
  private def q233UnigramShrinkOracle(rounds: Int = 3, target: Int = 24,
                                      keepPct: Int = 60): String =
    s"""WITH ${unigramCtes(rounds = rounds, shrinkTo = Some(target),
          shrinkKeepPct = keepPct)}
SELECT CAST(row_number() OVER (ORDER BY freq DESC, piece) AS BIGINT)
    AS rank,
  piece, freq
FROM uv$rounds ORDER BY rank"""

  /** q224 oracle: the 6-merge BPE apply chain AND the unigram chain on
    * the same word table, reduced to one corpus-level fertility row per
    * method. */
  private def q224TokenizerCompareOracle(bpeMerges: Int = 6,
                                         rounds: Int = 2): String =
    s"""WITH ${bpeRoundCtes(bpeMerges, minPairCount = 2, applyAll = true)},
${unigramCtes(rounds = rounds)},
wt AS (SELECT w, CAST(count(*) AS BIGINT) AS n_subwords
  FROM f$bpeMerges GROUP BY 1),
uocc AS (SELECT w FROM (
    SELECT unnest(string_split(text, ' ')) AS w FROM documents)
  WHERE w <> ''),
bstat AS (SELECT CAST(count(*) AS BIGINT) AS n_words,
    CAST(sum(n_subwords) AS BIGINT) AS n_tokens
  FROM uocc JOIN wt USING (w)),
ustat AS (SELECT CAST(count(*) AS BIGINT) AS n_words,
    CAST(sum(n_pieces) AS BIGINT) AS n_tokens
  FROM uocc JOIN un$rounds USING (w))
SELECT method, n_words, n_tokens,
  round(CAST(n_tokens AS DOUBLE) / n_words, 4) AS fertility
FROM (SELECT 'bpe' AS method, * FROM bstat
      UNION ALL SELECT 'unigram', * FROM ustat)
ORDER BY method"""

  /** q118 oracle: the q32 signature machinery, asymmetric — new-batch
    * banded rows (split ≥ 90) joined against corpus banded rows
    * (split < 80), no doc_id ordering constraint, agreement estimated
    * new-vs-corpus.
    *
    * CAP DIVERGENCE (deliberate): the engine applies the minHashLsh
    * hot-bucket cap (`dropHotBuckets`, maxBucket 2^12) on BOTH banded
    * sides; this oracle joins bn/bc uncapped. Verification therefore
    * holds exactly while no (band, bucket) exceeds the cap — true at
    * every tested sf. On a template-flood corpus the engine would
    * (by design) drop the flooded buckets and diverge from this SQL;
    * if a future sf bump trips the cap, that's the guard working, not
    * an engine bug. Same convention as the q32 oracle. */
  private def q118IncrementalOracle: String = {
    val k = 16; val bands = 4; val rpb = k / bands
    val p = graft.llm.Dedup.P31
    val mins = (0 until k)
      .map(i => s"min((hb * ${2 * i + 1} + ${graft.llm.Dedup.bSeed(i)}) % $p) AS mh$i")
      .mkString(",\n    ")
    def banded(filter: String) = (0 until bands).map { b =>
      val cat = (b * rpb until (b + 1) * rpb)
        .map(i => s"mh$i::VARCHAR").mkString(" || ',' || ")
      s"SELECT doc_id, $b AS band, $cat AS bucket FROM sig WHERE $filter"
    }.mkString("\n  UNION ALL ")
    val agree = (0 until k)
      .map(i => s"CASE WHEN sa.mh$i = sb.mh$i THEN 1 ELSE 0 END")
      .mkString(" + ")
    s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws,
         ${h("doc_id", 42)} % 100 AS sbk
       FROM documents),
sh AS (SELECT doc_id, sbk, ${h("sg", 0)} % $p AS hb FROM (
         SELECT doc_id, sbk, unnest(list_distinct(list_transform(range(1, len(ws) - 1),
           i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))) AS sg
         FROM w WHERE len(ws) >= 3)),
sig AS (SELECT doc_id, min(sbk) AS sbk,
    $mins
  FROM sh GROUP BY doc_id),
bn AS (
  ${banded("sbk >= 90")}),
bc AS (
  ${banded("sbk < 80")}),
cand AS (SELECT a.doc_id AS new_doc, b.doc_id AS corpus_doc,
           count(*) AS n_bands_hit
         FROM bn a JOIN bc b ON a.band = b.band AND a.bucket = b.bucket
         GROUP BY 1, 2),
est AS (SELECT c.new_doc, c.corpus_doc, c.n_bands_hit,
          CAST($agree AS DOUBLE) / $k AS ej
        FROM cand c JOIN sig sa ON c.new_doc = sa.doc_id
                    JOIN sig sb ON c.corpus_doc = sb.doc_id)
SELECT new_doc, corpus_doc, round(ej, 4) AS est_jaccard, n_bands_hit
FROM est WHERE ej >= 0.3 ORDER BY new_doc, corpus_doc"""
  }

  /** q124 oracle: the FULL product-quantization loop — per-subspace
    * fixed-point k-means (the kmeansCtes machinery on locally re-indexed
    * dimension slices, shared seeds), codebooks + codes from the final
    * round, then ADC: per-query integer dot tables against the
    * codebooks, candidate scores as m table-lookups summed. Every
    * quantity is an exact integer or the trainer's deterministic
    * round/sqrt formula, so training, encoding and search all replay. */
  private def q124PqOracle: String = {
    val m = 4; val dsub = 16; val kc = 8; val iters = 2
    def sub(s: Int): String = {
      val x = s"p$s"
      def round(i: Int, centName: String): String =
        s"""nm$i$x AS (SELECT cid, CAST(sum(m*m) AS BIGINT) AS nm
  FROM $centName GROUP BY 1),
sc$i$x AS (SELECT e.vec_id, c.cid, CAST(sum(e.xi * c.m) AS BIGINT) AS dot
  FROM ex$x e JOIN $centName c USING (d) GROUP BY 1, 2),
a$i$x AS (SELECT vec_id, cid FROM (
    SELECT s.vec_id, s.cid, row_number() OVER (PARTITION BY s.vec_id
      ORDER BY round(s.dot / (sqrt(CAST(v.nx AS DOUBLE)) * sqrt(CAST(n.nm AS DOUBLE))), 4)
        DESC, s.cid) AS rn
    FROM sc$i$x s JOIN nm$i$x n USING (cid) JOIN nx$x v USING (vec_id))
  WHERE rn = 1)"""
      val rounds = (0 until iters).map { i =>
        val cent =
          if (i == 0) ""
          else s"""cent$i$x AS (SELECT a.cid, e.d, CAST(sum(e.xi) AS BIGINT) AS m
  FROM ex$x e JOIN a${i - 1}$x a USING (vec_id) GROUP BY 1, 2),
"""
        cent + round(i, s"cent$i$x")
      }.mkString(",\n")
      s"""ex$x AS (SELECT vec_id, d - ${s * dsub} AS d, xi FROM exg
  WHERE d >= ${s * dsub} AND d < ${(s + 1) * dsub}),
nx$x AS (SELECT vec_id, CAST(sum(xi*xi) AS BIGINT) AS nx
  FROM ex$x GROUP BY 1),
cent0$x AS (SELECT s.cid, e.d, e.xi AS m
  FROM ex$x e JOIN seeds s ON e.vec_id = s.cid),
$rounds"""
    }
    val last = iters - 1
    val codes = (0 until m)
      .map(s => s"SELECT vec_id, $s AS s, cid FROM a$last" + s"p$s")
      .mkString("\n  UNION ALL ")
    val cb = (0 until m)
      .map(s => s"SELECT $s AS s, cid, d, m FROM cent$last" + s"p$s")
      .mkString("\n  UNION ALL ")
    s"""WITH exg AS (
  SELECT vec_id, d1 - 1 AS d,
         CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT) AS xi
  FROM (SELECT vec_id, unnest(embedding) AS x,
               generate_subscripts(embedding, 1) AS d1 FROM embeddings)),
seeds AS (SELECT vec_id AS cid FROM embeddings
          ORDER BY ${h("vec_id", 5)}, vec_id
          LIMIT $kc),
${(0 until m).map(sub).mkString(",\n")},
codes AS (
  $codes),
cb AS (
  $cb),
nmc AS (SELECT s, cid, CAST(sum(m*m) AS BIGINT) AS nm
        FROM cb GROUP BY 1, 2),
exq AS (SELECT vec_id AS query_id, d // $dsub AS s, d % $dsub AS d2, xi
        FROM exg WHERE vec_id < 10),
nq AS (SELECT query_id, CAST(sum(xi*xi) AS BIGINT) AS nq
       FROM exq GROUP BY 1),
tbl AS (SELECT q.query_id, q.s, c.cid,
          CAST(sum(q.xi * c.m) AS BIGINT) AS dot
        FROM exq q JOIN cb c ON q.s = c.s AND q.d2 = c.d
        GROUP BY 1, 2, 3),
na AS (SELECT k.vec_id, CAST(sum(n.nm) AS BIGINT) AS na
       FROM codes k JOIN nmc n USING (s, cid) GROUP BY 1),
scq AS (SELECT t.query_id, k.vec_id AS neighbor_id,
          CAST(sum(t.dot) AS BIGINT) AS adot
        FROM codes k JOIN tbl t USING (s, cid)
        WHERE k.vec_id <> t.query_id
        GROUP BY 1, 2),
simq AS (SELECT s.query_id, s.neighbor_id,
          round(CAST(s.adot AS DOUBLE)
            / (sqrt(CAST(q.nq AS DOUBLE)) * sqrt(CAST(a.na AS DOUBLE))), 4)
            AS sim
         FROM scq s JOIN nq q USING (query_id)
                    JOIN na a ON s.neighbor_id = a.vec_id),
r AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id
        ORDER BY sim DESC, neighbor_id) AS BIGINT) AS rn FROM simq)
SELECT query_id, rn, neighbor_id, sim
FROM r WHERE rn <= 5 ORDER BY query_id, rn"""
  }

  /** MinHash+LSH oracle: n=3 shingles, k=16 seeded min-hashes, 4 bands of
    * 4 rows, est_jaccard = signature-agreement/16 ≥ 0.3 (mirrors
    * [[graft.llm.Dedup.minHashLsh]] with the portable hasher). `src` is
    * the (doc_id, text) relation to mine — `documents`, or an upstream
    * CTE when composed into a pipeline oracle (q79). */
  private def q32MinhashOracle(src: String = "documents"): String = {
    val k = 16; val bands = 4; val rpb = k / bands
    val p = graft.llm.Dedup.P31
    val mins = (0 until k)
      .map(i => s"min((hb * ${2 * i + 1} + ${graft.llm.Dedup.bSeed(i)}) % $p) AS mh$i")
      .mkString(",\n    ")
    val banded = (0 until bands).map { b =>
      val cat = (b * rpb until (b + 1) * rpb)
        .map(i => s"mh$i::VARCHAR").mkString(" || ',' || ")
      s"SELECT doc_id, $b AS band, $cat AS bucket FROM sig"
    }.mkString("\n  UNION ALL ")
    val agree = (0 until k)
      .map(i => s"CASE WHEN sa.mh$i = sb.mh$i THEN 1 ELSE 0 END")
      .mkString(" + ")
    s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM $src),
sh AS (SELECT doc_id, ${h("sg", 0)} % $p AS hb FROM (
         SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(ws) - 1),
           i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))) AS sg
         FROM w WHERE len(ws) >= 3)),
sig AS (SELECT doc_id,
    $mins
  FROM sh GROUP BY doc_id),
banded AS (
  $banded),
cand AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_bands_hit
         FROM banded a JOIN banded b
           ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
         GROUP BY 1, 2),
est AS (SELECT c.doc_a, c.doc_b, c.n_bands_hit,
          CAST($agree AS DOUBLE) / $k AS ej
        FROM cand c JOIN sig sa ON c.doc_a = sa.doc_id
                    JOIN sig sb ON c.doc_b = sb.doc_id)
SELECT doc_a, doc_b, round(ej, 4) AS est_jaccard, n_bands_hit
FROM est WHERE ej >= 0.3 ORDER BY doc_a, doc_b"""
  }

  /** Online near-dup oracle (q101): the q32 signature/banding CTEs, then
    * the RELATIONAL restatement of the streaming min-keeper state — each
    * (band, bucket)'s minimum doc_id — and per-document count of bands
    * where a smaller doc_id shares the bucket. Valid because the gate
    * replay is one micro-batch and the operator's min-keeper fold is
    * row-order-independent within a batch (the cross-batch contract is
    * spec-pinned, see [[graft.streaming.StreamingNearDup]]). */
  private def q101StreamNearDupOracle: String = {
    val k = 16; val bands = 4; val rpb = k / bands
    val p = graft.llm.Dedup.P31
    val mins = (0 until k)
      .map(i => s"min((hb * ${2 * i + 1} + ${graft.llm.Dedup.bSeed(i)}) % $p) AS mh$i")
      .mkString(",\n    ")
    val banded = (0 until bands).map { b =>
      val cat = (b * rpb until (b + 1) * rpb)
        .map(i => s"mh$i::VARCHAR").mkString(" || ',' || ")
      s"SELECT doc_id, $b AS band, $cat AS bucket FROM sig"
    }.mkString("\n  UNION ALL ")
    s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
sh AS (SELECT doc_id, ${h("sg", 0)} % $p AS hb FROM (
         SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(ws) - 1),
           i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))) AS sg
         FROM w WHERE len(ws) >= 3)),
sig AS (SELECT doc_id,
    $mins
  FROM sh GROUP BY doc_id),
banded AS (
  $banded),
m AS (SELECT band, bucket, min(doc_id) AS mn FROM banded GROUP BY 1, 2)
SELECT b.doc_id,
  CAST(sum(CASE WHEN b.doc_id > m.mn THEN 1 ELSE 0 END) AS BIGINT)
    AS n_dup_bands
FROM banded b JOIN m USING (band, bucket)
GROUP BY b.doc_id ORDER BY doc_id"""
  }

  /** Cluster-resolution oracle: the q32 candidate pairs (same generated
    * portable-hash SQL, embedded as a subquery) resolved into connected
    * components by a recursive transitive-closure CTE; component id =
    * least reachable doc_id (mirrors
    * [[graft.llm.Dedup.connectedComponents]]). The recursive closure is
    * O(pairs²) — fine for the oracle's sf0.01 pair count; the Spark side
    * is the scalable label-propagation loop. */
  private def q63ClustersOracle(src: String = "documents"): String =
    s"""WITH RECURSIVE pr AS (SELECT doc_a, doc_b FROM (${q32MinhashOracle(src)})),
edges AS (SELECT doc_a AS a, doc_b AS b FROM pr
          UNION SELECT doc_b, doc_a FROM pr),
reach(n, m) AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.n, e.b FROM reach r JOIN edges e ON r.m = e.a),
comp AS (SELECT n AS doc_id, least(n, min(m)) AS component
         FROM reach GROUP BY n)
SELECT doc_id, component, (component = doc_id) AS is_keeper
FROM comp ORDER BY doc_id"""

  /** Pipeline oracle (q79): all five [[graft.jobs.CorpusPipeline]] stages
    * recomputed in DuckDB — exact dedup, the q63 cluster resolution over
    * the DEDUPED corpus (the parameterized q32/q63 generators pointed at
    * the `d0` CTE), loser drop, the q37 quality formula, the q29 split. */
  private def q79PipelineOracle: String =
    s"""WITH
keep0 AS (SELECT CAST(min(doc_id) AS BIGINT) AS doc_id
          FROM documents GROUP BY text),
d0 AS (SELECT d.doc_id, d.text, d.lang, d.n_chars
       FROM documents d JOIN keep0 USING (doc_id)),
losers AS (SELECT doc_id FROM (${q63ClustersOracle("d0")})
           WHERE NOT is_keeper),
clean AS (SELECT * FROM d0
          WHERE doc_id NOT IN (SELECT doc_id FROM losers)),
scored AS (
  SELECT doc_id, lang, n_chars,
    round(least(CAST(len(string_split(text, ' ')) AS DOUBLE) / 100.0, 1.0) * 0.4
      + (CAST(len(list_filter(string_split(text,' '),
           x -> x IN ('the','and','of','is','in','a'))) AS DOUBLE)
         / len(string_split(text, ' '))) * 0.3
      + (1.0 - CAST(len(regexp_extract_all(text, '[.,!?;:]')) AS DOUBLE)
         / length(text)) * 0.3, 4) AS quality
  FROM clean)
SELECT doc_id, lang, n_chars, quality,
  CASE WHEN ('0x' || substr(md5('42:' || doc_id), 1, 15))::BIGINT % 100 < 80
       THEN 'train'
       WHEN ('0x' || substr(md5('42:' || doc_id), 1, 15))::BIGINT % 100 < 90
       THEN 'val' ELSE 'test' END AS split
FROM scored WHERE quality >= 0.4 ORDER BY doc_id"""

  /** Leakage-safe split oracle (q163): the q63 component CTE gives every
    * doc its group (own id when unpaired), the q79 split spelling throws
    * the coin on the GROUP id, and the q32 pair list re-joins the labels
    * to count cross-split pairs — zero when group-aware splitting holds. */
  private def q163LeakageSplitOracle: String =
    s"""WITH comp AS (SELECT * FROM (${q63ClustersOracle()})),
grp AS (SELECT d.doc_id, coalesce(c.component, d.doc_id) AS grp
        FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id),
lab AS (SELECT doc_id, grp,
    CASE WHEN ('0x' || substr(md5('42:' || grp), 1, 15))::BIGINT % 100 < 80
           THEN 'train'
         WHEN ('0x' || substr(md5('42:' || grp), 1, 15))::BIGINT % 100 < 90
           THEN 'val'
         ELSE 'test' END AS split
  FROM grp),
pr AS (SELECT doc_a, doc_b FROM (${q32MinhashOracle()}))
SELECT split, CAST(count(*) AS BIGINT) AS n_docs,
  CAST(count(DISTINCT grp) AS BIGINT) AS n_groups
FROM lab GROUP BY split
UNION ALL
SELECT 'leak_pairs', CAST(count(*) AS BIGINT), 0
FROM pr JOIN lab a ON pr.doc_a = a.doc_id JOIN lab b ON pr.doc_b = b.doc_id
WHERE a.split <> b.split
ORDER BY split"""

  /** SimHash oracle: 60-bit portable token hash, ±1 bit sums, 4×15-bit
    * band LSH, Hamming ≤ 6 (mirrors [[graft.llm.Dedup.simHashPairs]]). */
  private def q33SimhashOracle: String = {
    val bits = 60; val bandWidth = bits / 4
    val sums = (0 until bits)
      .map(j => s"sum(CASE WHEN (th.h >> $j) & 1 = 1 THEN 1 ELSE -1 END) AS b$j")
      .mkString(",\n    ")
    val sigExpr = (0 until bits)
      .map(j => s"CASE WHEN b$j > 0 THEN ${1L << j} ELSE 0 END")
      .mkString("\n    + ")
    val banded = (0 until 4).map { b =>
      s"SELECT doc_id, simhash, $b AS band, " +
        s"(simhash >> ${b * bandWidth}) & ${(1L << bandWidth) - 1} AS bucket FROM sig"
    }.mkString("\n  UNION ALL ")
    s"""WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents),
th AS (SELECT doc_id, ${h("t", 0)} AS h FROM tok),
sums AS (SELECT doc_id,
    $sums
  FROM th GROUP BY doc_id),
sig AS (SELECT doc_id, $sigExpr AS simhash FROM sums),
banded AS (
  $banded)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
  CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
FROM banded a JOIN banded b
  ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 6
ORDER BY doc_a, doc_b"""
  }

  /** k-means oracle: the exact Lloyd rounds of
    * [[graft.llm.Similarity.kmeansAssign]] (k=8, iters=2) unrolled as
    * chained CTEs — integer fixed-point components, unnormalized integer
    * centroid sums, 4-dp-rounded ranking with cid tie-breaks, so DuckDB
    * replays the training bit-for-bit. */
  private def q77KmeansOracle: String =
    s"""WITH ${kmeansCtes(8, 2)}
SELECT vec_id, cid FROM a1 ORDER BY vec_id"""

  /** q185 oracle: the q77 training CTEs, then one more assignment-style
    * scoring pass against the final centroids (sc1/nm1/nx), basis-point
    * quantization, own vs runner-up margins, per-cluster aggregates. */
  private def q185KmeansSeparationOracle: String =
    s"""WITH ${kmeansCtes(8, 2)},
sims AS (SELECT s.vec_id, s.cid,
    CAST(round(round(s.dot / (sqrt(CAST(x.nx AS DOUBLE))
        * sqrt(CAST(n.nm AS DOUBLE))), 4) * 10000, 0) AS BIGINT) AS sim_bp,
    row_number() OVER (PARTITION BY s.vec_id
      ORDER BY round(s.dot / (sqrt(CAST(x.nx AS DOUBLE))
        * sqrt(CAST(n.nm AS DOUBLE))), 4) DESC, s.cid) AS rn
  FROM sc1 s JOIN nm1 n USING (cid) JOIN nx x USING (vec_id)),
own AS (SELECT vec_id, cid, sim_bp AS own_bp FROM sims WHERE rn = 1),
ru AS (SELECT vec_id, sim_bp AS ru_bp FROM sims WHERE rn = 2),
mg AS (SELECT o.cid, o.own_bp, o.own_bp - r.ru_bp AS margin_bp
       FROM own o JOIN ru r USING (vec_id))
SELECT CAST(cid AS BIGINT) AS cid, CAST(count(*) AS BIGINT) AS n_members,
  round(CAST(sum(margin_bp) AS DOUBLE) / CAST(count(*) AS DOUBLE), 4)
    AS mean_margin_bp,
  CAST(min(margin_bp) AS BIGINT) AS min_margin_bp,
  round(CAST(sum(own_bp) AS DOUBLE) / CAST(count(*) AS DOUBLE), 4)
    AS mean_own_bp,
  CAST(min(own_bp) AS BIGINT) AS min_own_bp
FROM mg GROUP BY cid ORDER BY cid"""

  /** q139 oracle: the q77 training CTEs produce the semantic strata,
    * then the q113 temperature formula (α = 0.5 ⇒ sqrt-exact scaled-
    * integer threshold, same seeded coin) over cluster ids. */
  private def q139ClusterBalancedOracle: String =
    s"""WITH ${kmeansCtes(8, 2)},
cbc AS (SELECT cid, CAST(count(*) AS BIGINT) AS n_stratum
        FROM a1 GROUP BY 1),
cbt AS (SELECT cid, n_stratum,
          least(10000, CAST(floor(25000.0 / sqrt(CAST(n_stratum AS DOUBLE)))
            AS BIGINT)) AS threshold_bp
        FROM cbc)
SELECT a.vec_id, a.cid, t.n_stratum, t.threshold_bp,
  ${h("a.vec_id", 43)} % 10000 < t.threshold_bp AS kept
FROM a1 a JOIN cbt t USING (cid) ORDER BY a.vec_id"""

  /** SemDeDup oracle (q99): the q77 training CTEs, within-cluster cosine
    * pairs via list_cosine_similarity (the q47-proven float comparison
    * at the same 0.4 threshold on the same vectors), then a q63-style
    * recursive transitive closure with min-id keepers. */
  private def q99SemanticDedupOracle: String =
    s"""WITH RECURSIVE ${kmeansCtes(8, 2)},
prs AS (SELECT a.vec_id AS pa, b.vec_id AS pb
  FROM a1 a JOIN a1 b ON a.cid = b.cid AND a.vec_id < b.vec_id
  JOIN embeddings ea ON ea.vec_id = a.vec_id
  JOIN embeddings eb ON eb.vec_id = b.vec_id
  WHERE list_cosine_similarity(ea.embedding, eb.embedding) >= 0.4),
edges AS (SELECT pa AS x, pb AS y FROM prs UNION SELECT pb, pa FROM prs),
reach(n, m) AS (
  SELECT x, y FROM edges
  UNION
  SELECT r.n, e.y FROM reach r JOIN edges e ON r.m = e.x),
comp AS (SELECT n AS vec_id, least(n, min(m)) AS component
         FROM reach GROUP BY n)
SELECT vec_id, component, (component = vec_id) AS is_keeper
FROM comp ORDER BY vec_id"""

  /** SSL-prototypes oracle (q108): the q77 training CTEs, then each
    * vector's 4-dp fixed-point cosine to its ASSIGNED centroid (sc1
    * already holds the integer dot for every (vec, cid) — the a1 join
    * picks the assigned one), per-cluster prototypicality rank, kept =
    * rank beyond ceil(0.25·|cluster|) (mirrors
    * [[graft.llm.Similarity.prototypicalityPrune]]). */
  private def q108PrototypePruneOracle: String =
    s"""WITH ${kmeansCtes(8, 2)},
pr AS (SELECT s.vec_id, s.cid,
         round(s.dot / (sqrt(CAST(x.nx AS DOUBLE))
           * sqrt(CAST(n.nm AS DOUBLE))), 4) AS centroid_sim
       FROM sc1 s JOIN nm1 n USING (cid) JOIN nx x USING (vec_id)
       JOIN a1 a ON a.vec_id = s.vec_id AND a.cid = s.cid),
rk AS (SELECT vec_id, cid, centroid_sim,
         row_number() OVER (PARTITION BY cid
           ORDER BY centroid_sim DESC, vec_id) AS rk,
         count(*) OVER (PARTITION BY cid) AS csz
       FROM pr)
SELECT CAST(vec_id AS BIGINT) AS vec_id, CAST(cid AS BIGINT) AS cid,
       centroid_sim, (rk > ceil(csz * 0.25)) AS kept
FROM rk ORDER BY vec_id"""

  /** Trained-IVF oracle (q82): the q77 training CTEs, then the probe —
    * per-query cell ranking on the exact-integer centroid cosine (top
    * nprobe=2), candidates from the final assignment, pair similarity as
    * the exact-integer fixed-point cosine, top k=5 ranked on the
    * 4-dp-rounded score (mirrors
    * [[graft.llm.Similarity.ivfTopKTrained]]). */
  private def q82IvfTrainedOracle: String =
    s"""WITH ${kmeansCtes(8, 2)},
pq AS (SELECT e.vec_id AS query_id, c.cid,
         CAST(sum(e.xi * c.m) AS BIGINT) AS dot
       FROM ex e JOIN cent1 c USING (d)
       WHERE e.vec_id < 10 GROUP BY 1, 2),
pr AS (SELECT pq.query_id, pq.cid,
         row_number() OVER (PARTITION BY pq.query_id
           ORDER BY round(pq.dot / (sqrt(CAST(x.nx AS DOUBLE))
             * sqrt(CAST(n.nm AS DOUBLE))), 4) DESC, pq.cid) AS qrn
       FROM pq JOIN nm1 n USING (cid) JOIN nx x ON pq.query_id = x.vec_id),
probes AS (SELECT query_id, cid FROM pr WHERE qrn <= 2),
cp AS (SELECT p.query_id, a.vec_id AS neighbor_id
       FROM a1 a JOIN probes p USING (cid) WHERE a.vec_id <> p.query_id),
cs AS (SELECT c.query_id, c.neighbor_id,
         CAST(sum(eq.xi * ec.xi) AS BIGINT) AS dot
       FROM cp c
       JOIN ex eq ON eq.vec_id = c.query_id
       JOIN ex ec ON ec.vec_id = c.neighbor_id AND ec.d = eq.d
       GROUP BY 1, 2),
r AS (SELECT c.query_id, c.neighbor_id,
        round(c.dot / (sqrt(CAST(xq.nx AS DOUBLE))
          * sqrt(CAST(xc.nx AS DOUBLE))), 4) AS sim
      FROM cs c JOIN nx xq ON xq.vec_id = c.query_id
                JOIN nx xc ON xc.vec_id = c.neighbor_id),
rr AS (SELECT query_id, neighbor_id, sim,
         CAST(row_number() OVER (PARTITION BY query_id
           ORDER BY sim DESC, neighbor_id) AS BIGINT) AS rn
       FROM r)
SELECT query_id, rn, neighbor_id, sim FROM rr WHERE rn <= 5
ORDER BY query_id, rn"""

  /** The shared k-means training CTE chain (ex/nx/seeds/cent0 …
    * a{iters-1}): every quantity exact integer or deterministic IEEE, so
    * both the q77 assignment oracle and the q82 probe oracle replay the
    * same training. */
  private def kmeansCtes(k: Int, iters: Int): String = {
    def round(i: Int, centName: String): String =
      s"""nm$i AS (SELECT cid, CAST(sum(m*m) AS BIGINT) AS nm
  FROM $centName GROUP BY 1),
sc$i AS (SELECT e.vec_id, c.cid, CAST(sum(e.xi * c.m) AS BIGINT) AS dot
  FROM ex e JOIN $centName c USING (d) GROUP BY 1, 2),
a$i AS (SELECT vec_id, cid FROM (
    SELECT s.vec_id, s.cid, row_number() OVER (PARTITION BY s.vec_id
      ORDER BY round(s.dot / (sqrt(CAST(x.nx AS DOUBLE)) * sqrt(CAST(n.nm AS DOUBLE))), 4)
        DESC, s.cid) AS rn
    FROM sc$i s JOIN nm$i n USING (cid) JOIN nx x USING (vec_id))
  WHERE rn = 1)"""
    val rounds = (0 until iters).map { i =>
      val cent =
        if (i == 0) ""
        else s"""cent$i AS (SELECT a.cid, e.d, CAST(sum(e.xi) AS BIGINT) AS m
  FROM ex e JOIN a${i - 1} a USING (vec_id) GROUP BY 1, 2),
"""
      cent + round(i, s"cent$i")
    }.mkString(",\n")
    s"""ex AS (
  SELECT vec_id, d1 - 1 AS d,
         CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT) AS xi
  FROM (SELECT vec_id, unnest(embedding) AS x,
               generate_subscripts(embedding, 1) AS d1 FROM embeddings)),
nx AS (SELECT vec_id, CAST(sum(xi*xi) AS BIGINT) AS nx FROM ex GROUP BY 1),
seeds AS (SELECT vec_id AS cid FROM embeddings
          ORDER BY ${graft.llm.PortableSeededHash.sql("vec_id", 5)}, vec_id
          LIMIT $k),
cent0 AS (SELECT s.cid, e.d, e.xi AS m FROM ex e JOIN seeds s ON e.vec_id = s.cid),
$rounds"""
  }

  /** LSH-ANN oracle: integer hyperplane weights hash("p:d")%1000-500,
    * fixed-point projections round(x·1000)·w summed as integers (sign bits
    * therefore exactly reproducible), bucket = 12-bit signature equality,
    * cosine ranked on the 4-dp rounded score (mirrors
    * [[graft.llm.Similarity.lshTopK]] with the portable hasher). */
  private def q35AnnLshOracle: String =
    s"""WITH ex AS (SELECT vec_id, CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT) AS xi,
             d1 - 1 AS d
      FROM (SELECT vec_id, unnest(embedding) AS x,
                   generate_subscripts(embedding, 1) AS d1 FROM embeddings)),
w AS (SELECT p, d, ${h("p::VARCHAR || ':' || d::VARCHAR", 7)} % 1000 - 500 AS w
      FROM range(0, 12) tp(p), (SELECT DISTINCT d FROM ex) td),
proj AS (SELECT vec_id, p, sum(xi * w) AS proj
         FROM ex JOIN w USING (d) GROUP BY 1, 2),
sig AS (SELECT vec_id,
          sum(CASE WHEN proj > 0 THEN (1::BIGINT << p) ELSE 0 END) AS sg
        FROM proj GROUP BY 1),
sigd AS (SELECT e.vec_id, e.embedding, s.sg FROM embeddings e
         JOIN sig s USING (vec_id)),
q AS (SELECT vec_id AS query_id, embedding AS q_emb, sg AS q_sig
      FROM sigd WHERE vec_id < 10),
cand AS (SELECT q.query_id, c.vec_id AS neighbor_id,
           list_cosine_similarity(q.q_emb, c.embedding) AS sim
         FROM sigd c JOIN q ON c.sg = q.q_sig AND c.vec_id <> q.query_id),
r AS (SELECT query_id, neighbor_id, sim,
        CAST(row_number() OVER (PARTITION BY query_id
          ORDER BY round(sim, 4) DESC, neighbor_id) AS BIGINT) AS rn
      FROM cand)
SELECT query_id, rn, neighbor_id, round(sim, 4) AS sim
FROM r WHERE rn <= 5 ORDER BY query_id, rn"""

  /** q98/q130 oracle: decoded image dimensions and the band-0 pixel sum
    * are pure integer formulas of doc_id — the Spark side must produce
    * them through a REAL PNG encode + decode (q98 batch, q130 streaming
    * replay), so codec faults and row drops/duplicates hash-mismatch. */
  private def q98ImageRoundtripOracle: String =
    """WITH d AS (SELECT doc_id, 8 + doc_id % 25 AS w,
8 + (doc_id * 7) % 25 AS h
FROM documents),
px AS (SELECT doc_id, w, h,
  CAST((x.i + y.i + doc_id) % 256 AS BIGINT) AS g
FROM d, LATERAL unnest(range(w)) AS x(i),
     LATERAL unnest(range(h)) AS y(i))
SELECT doc_id, CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
  CAST(w * h AS BIGINT) AS n_pixels, CAST(sum(g) AS BIGINT) AS sum_gray
FROM px GROUP BY doc_id, w, h
ORDER BY doc_id"""

  /** q34 oracle: exact brute-force cosine top-5 for the first 10 vectors
    * via list_cosine_similarity — also the ground-truth side of q131. */
  private def q34CosineTopKOracle: String =
    """WITH q AS (SELECT vec_id AS query_id, embedding AS q_emb
           FROM embeddings WHERE vec_id < 10),
s AS (SELECT query_id, vec_id AS neighbor_id,
        list_cosine_similarity(q_emb, embedding) AS sim
      FROM q, embeddings WHERE vec_id <> query_id),
r AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id
        ORDER BY sim DESC, neighbor_id) AS BIGINT) AS rn FROM s)
SELECT query_id, rn, neighbor_id, round(sim, 4) AS sim
FROM r WHERE rn <= 5 ORDER BY query_id, rn"""

  /** q35b oracle: hash-sampled 16-centroid IVF — deterministic centroid
    * sample, nearest-cell assignment, nprobe=2 probe, in-cell top-5. */
  private def q35bIvfOracle: String =
    """WITH cent AS (SELECT vec_id AS cid, embedding AS c_emb
              FROM embeddings
              ORDER BY ('0x' || substr(md5('5:' || vec_id), 1, 15))::BIGINT,
                       vec_id
              LIMIT 16),
a0 AS (SELECT e.vec_id, e.embedding, c.cid,
         row_number() OVER (PARTITION BY e.vec_id
           ORDER BY round(list_cosine_similarity(e.embedding, c.c_emb), 4)
             DESC, c.cid) AS crn
       FROM embeddings e, cent c),
assigned AS (SELECT vec_id, embedding, cid FROM a0 WHERE crn = 1),
q0 AS (SELECT e.vec_id AS query_id, e.embedding AS q_emb, c.cid,
         row_number() OVER (PARTITION BY e.vec_id
           ORDER BY round(list_cosine_similarity(e.embedding, c.c_emb), 4)
             DESC, c.cid) AS qrn
       FROM embeddings e, cent c WHERE e.vec_id < 10),
probes AS (SELECT query_id, q_emb, cid FROM q0 WHERE qrn <= 2),
cand AS (SELECT p.query_id, a.vec_id AS neighbor_id,
           list_cosine_similarity(p.q_emb, a.embedding) AS sim
         FROM assigned a JOIN probes p USING (cid)
         WHERE a.vec_id <> p.query_id),
r AS (SELECT query_id, neighbor_id, sim,
        CAST(row_number() OVER (PARTITION BY query_id
          ORDER BY round(sim, 4) DESC, neighbor_id) AS BIGINT) AS rn
      FROM cand)
SELECT query_id, rn, neighbor_id, round(sim, 4) AS sim
FROM r WHERE rn <= 5 ORDER BY query_id, rn"""

  /** q122 oracle: int8 scalar quantization, per-vector integer stats and
    * the SQ dot expansion replayed verbatim — integer sums are order-free
    * and the float combination is the identical expression tree, so even
    * the UNROUNDED sims (the window sort key) are bit-identical. */
  private def q122SqOracle: String =
    """WITH qz AS (SELECT vec_id,
  CAST(list_min(embedding) AS DOUBLE) AS mn,
  (CAST(list_max(embedding) AS DOUBLE)
   - CAST(list_min(embedding) AS DOUBLE)) / 255.0 AS scale,
  embedding FROM embeddings),
qv AS (SELECT vec_id, mn, scale,
  list_transform(embedding, x -> CASE WHEN scale > 0
    THEN CAST(round((CAST(x AS DOUBLE) - mn) / scale) AS INTEGER)
    ELSE 0 END) AS q
  FROM qz),
st AS (SELECT vec_id, mn, scale, q, CAST(len(q) AS BIGINT) AS n,
  CAST(list_sum(list_transform(q, v -> CAST(v AS BIGINT)))
    AS BIGINT) AS s1,
  CAST(list_sum(list_transform(q,
    v -> CAST(v AS BIGINT) * CAST(v AS BIGINT))) AS BIGINT) AS s2
  FROM qv),
p AS (SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
  a.mn AS mna, a.scale AS sa, a.s1 AS s1a, a.s2 AS s2a, a.n AS na,
  b.mn AS mnb, b.scale AS sb, b.s1 AS s1b, b.s2 AS s2b, b.n AS nb,
  CAST(list_sum(list_transform(list_zip(a.q, b.q),
    z -> CAST(z[1] AS BIGINT) * CAST(z[2] AS BIGINT)))
    AS BIGINT) AS ab
  FROM st a, st b WHERE a.vec_id < 10 AND b.vec_id <> a.vec_id),
s AS (SELECT query_id, neighbor_id,
  (CAST(na AS DOUBLE) * mna * mnb + mna * sb * CAST(s1b AS DOUBLE)
   + mnb * sa * CAST(s1a AS DOUBLE) + sa * sb * CAST(ab AS DOUBLE))
  / (sqrt(CAST(na AS DOUBLE) * mna * mna
      + 2.0 * mna * sa * CAST(s1a AS DOUBLE)
      + sa * sa * CAST(s2a AS DOUBLE))
     * sqrt(CAST(nb AS DOUBLE) * mnb * mnb
      + 2.0 * mnb * sb * CAST(s1b AS DOUBLE)
      + sb * sb * CAST(s2b AS DOUBLE))) AS sim
  FROM p),
r AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id
        ORDER BY sim DESC, neighbor_id) AS BIGINT) AS rn FROM s)
SELECT query_id, rn, neighbor_id, round(sim, 4) AS sim
FROM r WHERE rn <= 5 ORDER BY query_id, rn"""

  /** q132 oracle: multi-table LSH — 4 tables × 8 planes off the same
    * integer weight family (global plane id keys the hash), per-(vec,
    * table) sign-bit signatures, candidates = DISTINCT bucket collisions
    * in ANY table, cosine ranked on the 4-dp score (mirrors
    * [[graft.llm.Similarity.lshTopKMulti]] with the portable hasher). */
  /** q123/q140 oracle: each signal's replay is its parent query's
    * oracle (q36 lang, q120 entropy, q112 logit) joined per doc; the
    * engine runs them in one scan (q123) or one stream (q140) but the
    * answer is identical. */
  private def q123WebFilterOracle: String =
    s"""WITH $webFilterSignalsCtes
SELECT doc_id, n_tokens, pred_lang, entropy, logit,
  n_tokens BETWEEN 10 AND 5000 AS pass_len,
  pred_lang = 'en' AS pass_lang,
  entropy >= 2.0 AS pass_entropy,
  logit > 0 AS pass_clf,
  (n_tokens BETWEEN 10 AND 5000) AND pred_lang = 'en'
    AND entropy >= 2.0 AND logit > 0 AS keep
FROM sig ORDER BY doc_id"""

  /** The q138 kNN-edge CTE chain (signatures → collisions → scored →
    * ranked top-5 as `e`) — WITH-body only, shared by the q138 graph
    * oracle and the q141 clustering oracle. */
  private def q138EdgeCtes: String =
    s"""ex AS (SELECT vec_id, CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT) AS xi,
             d1 - 1 AS d
      FROM (SELECT vec_id, unnest(embedding) AS x,
                   generate_subscripts(embedding, 1) AS d1 FROM embeddings)),
$q138EdgeCtesAfterEx"""

  /** The q138 edge chain MINUS its `ex` fixed-point CTE — for oracles
    * that already define the identical `ex` through [[kmeansCtes]]
    * (q222 composes both; duplicate CTE names are a binder error). */
  private def q138EdgeCtesAfterEx: String =
    s"""w AS (SELECT p, d, ${h("p::VARCHAR || ':' || d::VARCHAR", 7)} % 1000 - 500 AS w
      FROM range(0, 32) tp(p), (SELECT DISTINCT d FROM ex) td),
proj AS (SELECT vec_id, p, sum(xi * w) AS proj
         FROM ex JOIN w USING (d) GROUP BY 1, 2),
sig AS (SELECT vec_id, p // 8 AS t,
          sum(CASE WHEN proj > 0 THEN (1::BIGINT << (p % 8)) ELSE 0 END) AS sg
        FROM proj GROUP BY 1, 2),
cand AS (SELECT DISTINCT a.vec_id AS src, b.vec_id AS dst
         FROM sig a JOIN sig b ON a.t = b.t AND a.sg = b.sg
         WHERE a.vec_id <> b.vec_id),
cs AS (SELECT cand.src, cand.dst,
         list_cosine_similarity(ea.embedding, eb.embedding) AS sim
       FROM cand JOIN embeddings ea ON ea.vec_id = cand.src
                 JOIN embeddings eb ON eb.vec_id = cand.dst),
r AS (SELECT src, dst, sim,
        CAST(row_number() OVER (PARTITION BY src
          ORDER BY round(sim, 4) DESC, dst) AS BIGINT) AS rn
      FROM cs),
e AS (SELECT src, rn, dst, round(sim, 4) AS sim FROM r WHERE rn <= 5)"""

  /** q138 oracle: the q132 multi-table signature CTEs, the collision
    * self-join over ALL nodes (distinct (src, dst) — a pair colliding in
    * several tables scores once), 4-dp-rounded cosine top-5 per src, and
    * the transpose left-join for the mutual flag. */
  private def q138KnnGraphOracle: String =
    s"""WITH $q138EdgeCtes
SELECT e.src, e.rn, e.dst, e.sim, (m.src IS NOT NULL) AS mutual
FROM e LEFT JOIN e m ON m.src = e.dst AND m.dst = e.src
ORDER BY e.src, e.rn"""

  /** q216 oracle: the q138 edge CTEs undirected, then `rounds` beam
    * expansion rounds unrolled — per round, neighbors of the current
    * beam along either edge direction, 4-dp cosine vs the query (self
    * excluded), union with the carried beam, keep the top-`beam` per
    * query on (sim DESC, node); final top-k off the last beam. Entry =
    * the `entry` lowest vec_ids (the coarse-quantizer seam's
    * deterministic stand-in). */
  private def q216GraphAnnOracle(rounds: Int = 4, beam: Int = 8,
                                 entry: Int = 8, k: Int = 5): String = {
    val roundCtes = (1 to rounds).map { r =>
      s"""nb$r AS (SELECT DISTINCT b.query_id, a.dst AS node
  FROM b${r - 1} b JOIN ua a ON a.src = b.node),
sc$r AS (SELECT nb.query_id, nb.node,
    round(list_cosine_similarity(q.q_emb, n.embedding), 4) AS sim
  FROM nb$r nb JOIN q USING (query_id)
       JOIN embeddings n ON n.vec_id = nb.node
  WHERE nb.node <> nb.query_id),
b$r AS (SELECT query_id, node, sim FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
      ORDER BY sim DESC, node) AS rn
    FROM (SELECT query_id, node, sim FROM b${r - 1}
          UNION SELECT query_id, node, sim FROM sc$r))
  WHERE rn <= $beam)"""
    }.mkString(",\n")
    s"""WITH $q138EdgeCtes,
ua AS (SELECT src, dst FROM e UNION SELECT dst AS src, src AS dst FROM e),
q AS (SELECT vec_id AS query_id, embedding AS q_emb
      FROM embeddings WHERE vec_id < 10),
entry AS (SELECT vec_id AS node FROM embeddings ORDER BY vec_id
          LIMIT $entry),
b0 AS (SELECT query_id, node, sim FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
      ORDER BY sim DESC, node) AS rn
    FROM (SELECT q.query_id, en.node,
            round(list_cosine_similarity(q.q_emb, n.embedding), 4) AS sim
          FROM q, entry en JOIN embeddings n ON n.vec_id = en.node
          WHERE en.node <> q.query_id))
  WHERE rn <= $beam),
$roundCtes
SELECT query_id, rn, node AS neighbor_id, sim FROM (
  SELECT query_id, node, sim, CAST(row_number() OVER (
      PARTITION BY query_id ORDER BY sim DESC, node) AS BIGINT) AS rn
  FROM b$rounds)
WHERE rn <= $k ORDER BY query_id, rn"""
  }

  /** q222 oracle: the q216 beam search replayed over the PERSISTED-
    * lifecycle inputs — the q138 edge chain (its `ex` shared with the
    * k-means CTEs: identical fixed-point explode) plus the coarse-
    * quantizer entry points (per trained centroid, the corpus node with
    * the best exact-integer cosine to it, vec_id tie-break — the
    * [[graft.llm.Similarity.centroidEntryPoints]] selection), then the
    * same `rounds` expansion rounds (CTEs g-prefixed: the k-means chain
    * already owns sc0/sc1). The artifact round-trips through two
    * snapshot tables engine-side; content is deterministic, so this
    * oracle pins BOTH the build that was persisted and the search that
    * reads it. */
  private def q222GraphAnnIndexedOracle(rounds: Int = 4, beam: Int = 8,
                                        k: Int = 5): String = {
    val roundCtes = (1 to rounds).map { r =>
      s"""gnb$r AS (SELECT DISTINCT b.query_id, a.dst AS node
  FROM gb${r - 1} b JOIN ua a ON a.src = b.node),
gsc$r AS (SELECT nb.query_id, nb.node,
    round(list_cosine_similarity(q.q_emb, n.embedding), 4) AS sim
  FROM gnb$r nb JOIN q USING (query_id)
       JOIN embeddings n ON n.vec_id = nb.node
  WHERE nb.node <> nb.query_id),
gb$r AS (SELECT query_id, node, sim FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
      ORDER BY sim DESC, node) AS rn
    FROM (SELECT query_id, node, sim FROM gb${r - 1}
          UNION SELECT query_id, node, sim FROM gsc$r))
  WHERE rn <= $beam)"""
    }.mkString(",\n")
    s"""WITH ${kmeansCtes(8, 2)},
$q138EdgeCtesAfterEx,
ua AS (SELECT src, dst FROM e UNION SELECT dst AS src, src AS dst FROM e),
q AS (SELECT vec_id AS query_id, embedding AS q_emb
      FROM embeddings WHERE vec_id < 10),
cdot AS (SELECT e2.vec_id, c.cid, CAST(sum(e2.xi * c.m) AS BIGINT) AS dot
         FROM ex e2 JOIN cent1 c USING (d) GROUP BY 1, 2),
entry AS (SELECT DISTINCT node FROM (
    SELECT vec_id AS node FROM (
      SELECT cd.vec_id, cd.cid, row_number() OVER (PARTITION BY cd.cid
        ORDER BY round(cd.dot / (sqrt(CAST(x.nx AS DOUBLE))
          * sqrt(CAST(n.nm AS DOUBLE))), 4) DESC, cd.vec_id) AS rn
      FROM cdot cd JOIN nm1 n USING (cid) JOIN nx x USING (vec_id))
    WHERE rn = 1)),
gb0 AS (SELECT query_id, node, sim FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
      ORDER BY sim DESC, node) AS rn
    FROM (SELECT q.query_id, en.node,
            round(list_cosine_similarity(q.q_emb, n.embedding), 4) AS sim
          FROM q, entry en JOIN embeddings n ON n.vec_id = en.node
          WHERE en.node <> q.query_id))
  WHERE rn <= $beam),
$roundCtes
SELECT query_id, rn, node AS neighbor_id, sim FROM (
  SELECT query_id, node, sim, CAST(row_number() OVER (
      PARTITION BY query_id ORDER BY sim DESC, node) AS BIGINT) AS rn
  FROM gb$rounds)
WHERE rn <= $k ORDER BY query_id, rn"""
  }

  /** q141 oracle: the q138 edges restricted to mutual pairs, then the
    * q99-style recursive transitive closure with min-id components. */
  private def q141KnnClustersOracle: String =
    s"""WITH RECURSIVE $q138EdgeCtes,
mp AS (SELECT e.src AS pa, e.dst AS pb
       FROM e JOIN e m ON m.src = e.dst AND m.dst = e.src
       WHERE e.src < e.dst),
medges AS (SELECT pa AS x, pb AS y FROM mp UNION SELECT pb, pa FROM mp),
reach(n, m) AS (
  SELECT x, y FROM medges
  UNION
  SELECT r2.n, e2.y FROM reach r2 JOIN medges e2 ON r2.m = e2.x),
comp AS (SELECT n AS vec_id, least(n, min(m)) AS component
         FROM reach GROUP BY n)
SELECT vec_id, component, (component = vec_id) AS is_keeper
FROM comp ORDER BY vec_id"""

  /** q167 oracle: the q138 edge CTEs, then `rounds` synchronous label-
    * propagation rounds unrolled — each round votes with the fixed-point
    * edge weight (round(sim·10⁴) as BIGINT, an order-free integer sum),
    * takes the (wsum DESC, lab ASC) argmax for every non-seed node with a
    * labeled out-neighbor, and unions the fixed seed set back in. */
  private def q167LabelPropOracle: String = {
    val rounds = 3
    val roundCtes = (1 to rounds).map { i =>
      val prev = if (i == 1) "l0" else s"l${i - 1}"
      s"""v$i AS (SELECT e.src AS vec_id, l.lab,
  CAST(sum(CAST(round(e.sim * 10000, 0) AS BIGINT)) AS BIGINT) AS wsum
  FROM e JOIN $prev l ON l.vec_id = e.dst GROUP BY 1, 2),
a$i AS (SELECT vec_id, lab FROM (SELECT vec_id, lab,
    row_number() OVER (PARTITION BY vec_id
      ORDER BY wsum DESC, lab) AS rk FROM v$i)
  WHERE rk = 1 AND vec_id NOT IN (SELECT vec_id FROM l0)),
l$i AS (SELECT * FROM l0 UNION ALL SELECT * FROM a$i)"""
    }.mkString(",\n")
    s"""WITH $q138EdgeCtes,
l0 AS (SELECT vec_id, CAST(label AS BIGINT) AS lab FROM embeddings
       WHERE vec_id % 5 = 0),
$roundCtes
SELECT l.vec_id, l.lab AS label_hat, (l.vec_id % 5 = 0) AS is_seed,
  CAST(emb.label AS BIGINT) AS label_true,
  (l.lab = CAST(emb.label AS BIGINT)) AS correct
FROM l$rounds l JOIN embeddings emb ON emb.vec_id = l.vec_id
ORDER BY l.vec_id"""
  }

  /** q166/q171 oracle: BM25 — postings, doc lengths, corpus stats, idf,
    * the fixed-point per-term contribution (identical left-associative
    * arithmetic tree; composite literals like k1+1 are spelled as the
    * same IEEE ADDITION on both sides), the order-free integer score
    * sum, and the rounded-score ranking. q171 runs the same search off
    * the persisted bucketed index, so it shares this oracle verbatim. */
  private def q166Bm25Oracle: String =
    s"""WITH $q166Bm25Ctes
      |SELECT query_id, rk, doc_id, hits,
      |  round(score_fp / 1000000.0, 4) AS score
      |FROM r WHERE rk <= 5 ORDER BY query_id, rk""".stripMargin

  /** q183 oracle: the q166 BM25 chain (top-10 cut) + the q180-convention
    * basis-point dense leg + the q173 integer RRF arithmetic. */
  private def q183HybridOracle: String =
    s"""WITH $q166Bm25Ctes,
      |bleg AS (SELECT query_id, doc_id, rk FROM r WHERE rk <= 10),
      |dq AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS q_emb
      |       FROM embeddings WHERE vec_id < 4),
      |ds AS (SELECT dq.query_id, e.vec_id AS doc_id,
      |    CAST(round(round(list_cosine_similarity(
      |        dq.q_emb, CAST(e.embedding AS DOUBLE[])), 4) * 10000, 0)
      |      AS BIGINT) AS sim_bp
      |  FROM embeddings e JOIN dq ON e.vec_id <> dq.query_id),
      |dleg AS (SELECT query_id, doc_id, rk
      |  FROM (SELECT *, CAST(row_number() OVER (PARTITION BY query_id
      |          ORDER BY sim_bp DESC, doc_id) AS BIGINT) AS rk FROM ds)
      |  WHERE rk <= 10),
      |fused AS (SELECT coalesce(b.query_id, d.query_id) AS query_id,
      |    coalesce(b.doc_id, d.doc_id) AS doc_id,
      |    b.rk AS bm25_rank, d.rk AS dense_rank,
      |    coalesce(1000000000 // (60 + b.rk), 0) +
      |      coalesce(1000000000 // (60 + d.rk), 0) AS rrf_fp
      |  FROM bleg b FULL OUTER JOIN dleg d
      |    ON b.query_id = d.query_id AND b.doc_id = d.doc_id),
      |fr AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id
      |        ORDER BY rrf_fp DESC, doc_id) AS BIGINT) AS rk FROM fused)
      |SELECT query_id, rk, doc_id, CAST(rrf_fp AS BIGINT) AS rrf_fp,
      |  CAST(coalesce(bm25_rank, 0) AS BIGINT) AS bm25_rank,
      |  CAST(coalesce(dense_rank, 0) AS BIGINT) AS dense_rank
      |FROM fr WHERE rk <= 5 ORDER BY query_id, rk""".stripMargin

  /** The q166/q171/q183 BM25 WITH-body: postings, doc lengths, corpus
    * stats, idf, the fixed-point contribution tree, integer score sums
    * and the rank window `r`. */
  private def q166Bm25Ctes: String =
    """toks AS (
      |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |tfc AS (
      |  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
      |  FROM (SELECT doc_id, unnest(toks) AS term FROM toks)
      |  GROUP BY 1, 2),
      |dl AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl FROM toks),
      |stats AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
      |                 CAST(sum(len(toks)) AS BIGINT) AS sum_dl
      |          FROM toks),
      |df AS (SELECT term, CAST(count(*) AS BIGINT) AS df
      |       FROM tfc GROUP BY 1),
      |qd AS (SELECT doc_id AS query_id, toks[1:5] AS qterms
      |       FROM toks ORDER BY doc_id LIMIT 4),
      |qterm AS (SELECT DISTINCT query_id, unnest(qterms) AS term FROM qd),
      |contrib AS (
      |  SELECT q.query_id, t.doc_id,
      |    CAST(round(ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
      |      * (t.tf * (1.2 + 1.0))
      |      / (t.tf + 1.2 * ((1.0 - 0.75) + 0.75 * l.dl * s.n_docs / s.sum_dl))
      |      * 1000000.0, 0) AS BIGINT) AS c
      |  FROM tfc t JOIN qterm q USING (term) JOIN df d USING (term)
      |    JOIN dl l USING (doc_id) CROSS JOIN stats s),
      |scored AS (SELECT query_id, doc_id,
      |             CAST(sum(c) AS BIGINT) AS score_fp,
      |             CAST(count(*) AS BIGINT) AS hits
      |           FROM contrib GROUP BY 1, 2),
      |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id
      |        ORDER BY score_fp DESC, doc_id) AS BIGINT) AS rk
      |      FROM scored)""".stripMargin

  private def q168HllOracle: String =
    s"""WITH hv AS (SELECT event_type,
        |    ${h("CAST(user_id AS VARCHAR)", 77)} AS h FROM events),
        |r0 AS (SELECT event_type, CAST(h % 256 AS INT) AS idx,
        |    CASE WHEN h // 256 = 0 THEN 53
        |      ELSE bit_count(((h // 256) & (-(h // 256))) - 1) + 1
        |    END AS rho
        |  FROM hv),
        |reg AS (SELECT event_type, idx, max(rho) AS r
        |        FROM r0 GROUP BY 1, 2),
        |grid AS (SELECT et.event_type, g.range AS idx
        |         FROM (SELECT DISTINCT event_type FROM events) et,
        |              range(0, 256) g),
        |fullr AS (SELECT grid.event_type, grid.idx,
        |            coalesce(reg.r, 0) AS r
        |          FROM grid LEFT JOIN reg
        |            ON reg.event_type = grid.event_type
        |           AND reg.idx = grid.idx),
        |agg AS (SELECT event_type,
        |    CAST(sum(1::BIGINT << (40 - least(r, 40))) AS BIGINT) AS zfp,
        |    CAST(count(*) FILTER (WHERE r = 0) AS BIGINT) AS n_zero_regs
        |  FROM fullr GROUP BY 1),
        |est AS (SELECT event_type, n_zero_regs,
        |    (0.7213 / (1.0 + 1.079 / 256.0)) * 256.0 * 256.0 *
        |      1099511627776.0 / CAST(zfp AS DOUBLE) AS e_raw
        |  FROM agg),
        |ex AS (SELECT event_type,
        |    CAST(count(DISTINCT user_id) AS BIGINT) AS exact_distinct
        |  FROM events GROUP BY 1)
        |SELECT est.event_type, n_zero_regs,
        |  round(CASE WHEN e_raw <= 2.5 * 256.0 AND n_zero_regs > 0
        |    THEN 256.0 * ln(256.0 / CAST(n_zero_regs AS DOUBLE))
        |    ELSE e_raw END, 4) AS hll_est,
        |  exact_distinct
        |FROM est JOIN ex USING (event_type)
        |ORDER BY est.event_type""".stripMargin

  /** q173 oracle: the q122 int8-SQ chain and the q170 Hamming chain (CTE
    * names disjoint by construction), each cut at top-10 per query, full
    * outer joined and fused by Σ 10⁹ // (60 + rank) — integer division
    * on integer ranks, exact both engines — then re-ranked top-5. */
  private def q173RrfOracle: String =
    s"""WITH qz AS (SELECT vec_id,
  CAST(list_min(embedding) AS DOUBLE) AS mn,
  (CAST(list_max(embedding) AS DOUBLE)
   - CAST(list_min(embedding) AS DOUBLE)) / 255.0 AS scale,
  embedding FROM embeddings),
qv AS (SELECT vec_id, mn, scale,
  list_transform(embedding, x -> CASE WHEN scale > 0
    THEN CAST(round((CAST(x AS DOUBLE) - mn) / scale) AS INTEGER)
    ELSE 0 END) AS q
  FROM qz),
st AS (SELECT vec_id, mn, scale, q, CAST(len(q) AS BIGINT) AS n,
  CAST(list_sum(list_transform(q, v -> CAST(v AS BIGINT)))
    AS BIGINT) AS s1,
  CAST(list_sum(list_transform(q,
    v -> CAST(v AS BIGINT) * CAST(v AS BIGINT))) AS BIGINT) AS s2
  FROM qv),
p AS (SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
  a.mn AS mna, a.scale AS sa, a.s1 AS s1a, a.s2 AS s2a, a.n AS na,
  b.mn AS mnb, b.scale AS sb, b.s1 AS s1b, b.s2 AS s2b, b.n AS nb,
  CAST(list_sum(list_transform(list_zip(a.q, b.q),
    z -> CAST(z[1] AS BIGINT) * CAST(z[2] AS BIGINT)))
    AS BIGINT) AS ab
  FROM st a, st b WHERE a.vec_id < 10 AND b.vec_id <> a.vec_id),
s AS (SELECT query_id, neighbor_id,
  (CAST(na AS DOUBLE) * mna * mnb + mna * sb * CAST(s1b AS DOUBLE)
   + mnb * sa * CAST(s1a AS DOUBLE) + sa * sb * CAST(ab AS DOUBLE))
  / (sqrt(CAST(na AS DOUBLE) * mna * mna
      + 2.0 * mna * sa * CAST(s1a AS DOUBLE)
      + sa * sa * CAST(s2a AS DOUBLE))
     * sqrt(CAST(nb AS DOUBLE) * mnb * mnb
      + 2.0 * mnb * sb * CAST(s1b AS DOUBLE)
      + sb * sb * CAST(s2b AS DOUBLE))) AS sim
  FROM p),
sqr AS (SELECT query_id, neighbor_id,
  CAST(row_number() OVER (PARTITION BY query_id
    ORDER BY sim DESC, neighbor_id) AS BIGINT) AS sq_rank FROM s),
sqtop AS (SELECT query_id, neighbor_id, sq_rank FROM sqr
          WHERE sq_rank <= 10),
ex AS (SELECT vec_id, CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT) AS xi,
             d1 - 1 AS d
      FROM (SELECT vec_id, unnest(embedding) AS x,
                   generate_subscripts(embedding, 1) AS d1 FROM embeddings)),
w AS (SELECT p, d, ${h("p::VARCHAR || ':' || d::VARCHAR", 7)} % 1000 - 500 AS w
      FROM range(0, 60) tp(p), (SELECT DISTINCT d FROM ex) td),
proj AS (SELECT vec_id, p, sum(xi * w) AS proj
         FROM ex JOIN w USING (d) GROUP BY 1, 2),
sig AS (SELECT vec_id, sum(CASE WHEN proj > 0 THEN (1::BIGINT << p)
                 ELSE 0 END) AS sg
        FROM proj GROUP BY 1),
hq AS (SELECT vec_id AS query_id, sg AS qsig FROM sig WHERE vec_id < 10),
dist AS (SELECT q.query_id, c.vec_id AS neighbor_id,
           bit_count(xor(q.qsig, c.sg)) AS hamming
         FROM hq q JOIN sig c ON c.vec_id <> q.query_id),
hamr AS (SELECT query_id, neighbor_id,
  CAST(row_number() OVER (PARTITION BY query_id
    ORDER BY hamming, neighbor_id) AS BIGINT) AS ham_rank FROM dist),
hamtop AS (SELECT query_id, neighbor_id, ham_rank FROM hamr
           WHERE ham_rank <= 10),
fused AS (SELECT coalesce(h.query_id, s2.query_id) AS query_id,
    coalesce(h.neighbor_id, s2.neighbor_id) AS neighbor_id,
    h.ham_rank, s2.sq_rank
  FROM hamtop h FULL JOIN sqtop s2
    ON h.query_id = s2.query_id AND h.neighbor_id = s2.neighbor_id),
rrf AS (SELECT query_id, neighbor_id, ham_rank, sq_rank,
    CAST((CASE WHEN ham_rank IS NOT NULL
            THEN 1000000000 // (60 + ham_rank) ELSE 0 END
        + CASE WHEN sq_rank IS NOT NULL
            THEN 1000000000 // (60 + sq_rank) ELSE 0 END)
      AS BIGINT) AS rrf_fp
  FROM fused),
fr AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id
        ORDER BY rrf_fp DESC, neighbor_id) AS BIGINT) AS rk FROM rrf)
SELECT query_id, rk, neighbor_id, rrf_fp,
  CAST(coalesce(ham_rank, 0) AS BIGINT) AS ham_rank,
  CAST(coalesce(sq_rank, 0) AS BIGINT) AS sq_rank
FROM fr WHERE rk <= 5 ORDER BY query_id, rk"""

  /** q174 oracle: the q138 edges → mutual pairs (x &lt; y) → ordered
    * triangle join with EXISTS closure → per-node counts + 4-dp
    * coefficient. */
  private def q174ClusteringOracle: String =
    s"""WITH $q138EdgeCtes,
mp AS (SELECT e.src AS x, e.dst AS y
       FROM e JOIN e m ON m.src = e.dst AND m.dst = e.src
       WHERE e.src < e.dst),
deg AS (SELECT node, CAST(count(*) AS BIGINT) AS degree
        FROM (SELECT x AS node FROM mp UNION ALL SELECT y FROM mp)
        GROUP BY 1),
tr AS (SELECT e1.x AS a, e1.y AS b, e2.y AS c
       FROM mp e1 JOIN mp e2 ON e1.y = e2.x
       WHERE EXISTS (SELECT 1 FROM mp e3
                     WHERE e3.x = e1.x AND e3.y = e2.y)),
tn AS (SELECT node, CAST(count(*) AS BIGINT) AS triangles
       FROM (SELECT a AS node FROM tr UNION ALL SELECT b FROM tr
             UNION ALL SELECT c FROM tr)
       GROUP BY 1)
SELECT d.node, d.degree,
  CAST(coalesce(tn.triangles, 0) AS BIGINT) AS triangles,
  CASE WHEN d.degree >= 2
    THEN round(2.0 * coalesce(tn.triangles, 0)
               / (d.degree * (d.degree - 1)), 4)
    ELSE 0.0 END AS coeff
FROM deg d LEFT JOIN tn USING (node) ORDER BY d.node"""

  /** q170 oracle: 60-plane sign-bit signatures (the q138 projection CTEs
    * at one table), Hamming = bit_count(xor), integer rank with
    * neighbor tie-break, exact rounded cosine joined back on winners. */
  private def q170HammingAnnOracle: String =
    s"""WITH ex AS (SELECT vec_id, CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT) AS xi,
             d1 - 1 AS d
      FROM (SELECT vec_id, unnest(embedding) AS x,
                   generate_subscripts(embedding, 1) AS d1 FROM embeddings)),
w AS (SELECT p, d, ${h("p::VARCHAR || ':' || d::VARCHAR", 7)} % 1000 - 500 AS w
      FROM range(0, 60) tp(p), (SELECT DISTINCT d FROM ex) td),
proj AS (SELECT vec_id, p, sum(xi * w) AS proj
         FROM ex JOIN w USING (d) GROUP BY 1, 2),
sig AS (SELECT vec_id, sum(CASE WHEN proj > 0 THEN (1::BIGINT << p)
                 ELSE 0 END) AS sg
        FROM proj GROUP BY 1),
qs AS (SELECT vec_id AS query_id, sg AS qsig FROM sig WHERE vec_id < 10),
dist AS (SELECT q.query_id, s.vec_id AS neighbor_id,
           bit_count(xor(q.qsig, s.sg)) AS hamming
         FROM qs q JOIN sig s ON s.vec_id <> q.query_id),
r AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id
        ORDER BY hamming, neighbor_id) AS BIGINT) AS rk FROM dist)
SELECT r.query_id, r.rk, r.neighbor_id,
  CAST(r.hamming AS BIGINT) AS hamming,
  round(list_cosine_similarity(ea.embedding, eb.embedding), 4) AS cosine
FROM r JOIN embeddings ea ON ea.vec_id = r.query_id
       JOIN embeddings eb ON eb.vec_id = r.neighbor_id
WHERE r.rk <= 5 ORDER BY r.query_id, r.rk"""

  private def q132LshMultiOracle: String =
    s"""WITH ex AS (SELECT vec_id, CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT) AS xi,
             d1 - 1 AS d
      FROM (SELECT vec_id, unnest(embedding) AS x,
                   generate_subscripts(embedding, 1) AS d1 FROM embeddings)),
w AS (SELECT p, d, ${h("p::VARCHAR || ':' || d::VARCHAR", 7)} % 1000 - 500 AS w
      FROM range(0, 32) tp(p), (SELECT DISTINCT d FROM ex) td),
proj AS (SELECT vec_id, p, sum(xi * w) AS proj
         FROM ex JOIN w USING (d) GROUP BY 1, 2),
sig AS (SELECT vec_id, p // 8 AS t,
          sum(CASE WHEN proj > 0 THEN (1::BIGINT << (p % 8)) ELSE 0 END) AS sg
        FROM proj GROUP BY 1, 2),
qs AS (SELECT vec_id AS query_id, t, sg FROM sig WHERE vec_id < 10),
cand AS (SELECT DISTINCT q.query_id, c.vec_id AS neighbor_id
         FROM sig c JOIN qs q ON c.t = q.t AND c.sg = q.sg
         WHERE c.vec_id <> q.query_id),
cs AS (SELECT cand.query_id, cand.neighbor_id,
         list_cosine_similarity(eq.embedding, ec.embedding) AS sim
       FROM cand JOIN embeddings eq ON eq.vec_id = cand.query_id
                 JOIN embeddings ec ON ec.vec_id = cand.neighbor_id),
r AS (SELECT query_id, neighbor_id, sim,
        CAST(row_number() OVER (PARTITION BY query_id
          ORDER BY round(sim, 4) DESC, neighbor_id) AS BIGINT) AS rn
      FROM cs)
SELECT query_id, rn, neighbor_id, round(sim, 4) AS sim
FROM r WHERE rn <= 5 ORDER BY query_id, rn"""

  /** q186 oracle: the q132 signature CTEs, bucket histogram stats per
    * table, exact candidate-pair arithmetic, and the integer-log2
    * planes advisor via a shifted-bounds range probe. */
  private def q186LshBucketAuditOracle: String =
    s"""WITH ex AS (SELECT vec_id, CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT) AS xi,
             d1 - 1 AS d
      FROM (SELECT vec_id, unnest(embedding) AS x,
                   generate_subscripts(embedding, 1) AS d1 FROM embeddings)),
w AS (SELECT p, d, ${h("p::VARCHAR || ':' || d::VARCHAR", 7)} % 1000 - 500 AS w
      FROM range(0, 32) tp(p), (SELECT DISTINCT d FROM ex) td),
proj AS (SELECT vec_id, p, sum(xi * w) AS proj
         FROM ex JOIN w USING (d) GROUP BY 1, 2),
sig AS (SELECT vec_id, p // 8 AS t,
          sum(CASE WHEN proj > 0 THEN (1::BIGINT << (p % 8)) ELSE 0 END) AS sg
        FROM proj GROUP BY 1, 2),
bkt AS (SELECT t, sg, CAST(count(*) AS BIGINT) AS sz FROM sig GROUP BY 1, 2),
pt AS (SELECT t, CAST(sum(sz) AS BIGINT) AS n_vecs,
         CAST(count(*) AS BIGINT) AS n_buckets,
         CAST(max(sz) AS BIGINT) AS max_bucket,
         round(CAST(sum(sz) AS DOUBLE) / CAST(count(*) AS DOUBLE), 4)
           AS mean_bucket,
         CAST(sum(sz * sz) AS BIGINT) AS sum_sz2,
         CAST(sum(sz * (sz - 1) // 2) AS BIGINT) AS cand_pairs
       FROM bkt GROUP BY 1),
adv AS (SELECT pt.t, CAST(min(ps.p) AS BIGINT) AS recommended_planes
        FROM pt JOIN range(0, 63) ps(p)
          ON ((pt.n_vecs - 1) >> ps.p) < 16
        GROUP BY 1)
SELECT CAST(pt.t AS BIGINT) AS t, n_vecs, n_buckets, max_bucket,
  mean_bucket, sum_sz2, cand_pairs, adv.recommended_planes
FROM pt JOIN adv USING (t) ORDER BY t"""

  /** q133 oracle: precision/recall of the MinHash-LSH (q32) and SimHash
    * (q33) candidate sets vs the exact 3-gram Jaccard ≥ 0.5 ground truth
    * — both leg oracles replayed verbatim as derived tables, the truth
    * set mined by the q31 construction at the 0.5 threshold. */
  private def q133DedupPairRecallOracle: String = {
    val truthSql =
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
sh AS (SELECT doc_id,
         list_distinct(list_transform(range(1, len(ws) - 1),
           i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS s
       FROM w WHERE len(ws) >= 3),
ex AS (SELECT doc_id, unnest(s) AS sg FROM sh),
sz AS (SELECT doc_id, len(s) AS sz FROM sh),
p AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS inter
      FROM ex a JOIN ex b ON a.sg = b.sg AND a.doc_id < b.doc_id
      GROUP BY 1, 2)
SELECT da AS doc_a, db AS doc_b
FROM p JOIN sz sa ON p.da = sa.doc_id JOIN sz sb ON p.db = sb.doc_id
WHERE CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter) >= 0.5"""
    s"""WITH truth AS (SELECT doc_a, doc_b FROM (
$truthSql
) gt),
nt AS (SELECT CAST(count(*) AS DOUBLE) AS n_true_d,
              CAST(count(*) AS BIGINT) AS n_true FROM truth),
legs AS (
SELECT 'minhash_lsh' AS method, doc_a, doc_b FROM (
${q32MinhashOracle()}
) leg_mh
UNION ALL
SELECT 'simhash' AS method, doc_a, doc_b FROM (
$q33SimhashOracle
) leg_sh
),
agg AS (SELECT l.method, CAST(count(*) AS BIGINT) AS n_candidates,
          CAST(sum(CASE WHEN t.doc_a IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_hits
        FROM legs l LEFT JOIN truth t
          ON l.doc_a = t.doc_a AND l.doc_b = t.doc_b
        GROUP BY l.method)
SELECT method, n_candidates, n_hits, nt.n_true,
  round(CAST(n_hits AS DOUBLE) / nt.n_true_d, 4) AS recall,
  round(CAST(n_hits AS DOUBLE) / CAST(n_candidates AS DOUBLE), 4)
    AS precision
FROM agg, nt ORDER BY method"""
  }

  /** q131 oracle: recall@5 of every ANN leg vs the exact q34 top-5 — each
    * leg's FULL oracle is replayed as a derived table (DuckDB allows a
    * WITH clause inside a subquery), so the recall numbers are pinned to
    * the same engine-exact constructions the individual leg queries
    * verify; the denominator is the exact-set cardinality, mirroring the
    * Spark side's 1-row scalar frame. */
  private def q131AnnRecallOracle: String = {
    def leg(name: String, sql: String): String =
      s"SELECT '$name' AS method, query_id, neighbor_id FROM (\n$sql\n) leg_$name"
    val legs = Seq(
      leg("graph", q216GraphAnnOracle()),
      leg("ivf", q35bIvfOracle),
      leg("ivf_trained", q82IvfTrainedOracle),
      leg("lsh", q35AnnLshOracle),
      leg("lsh_multi", q132LshMultiOracle),
      leg("pq", q124PqOracle),
      leg("sq", q122SqOracle)).mkString("\nUNION ALL\n")
    s"""WITH exact AS (SELECT query_id, neighbor_id FROM (
$q34CosineTopKOracle
) gt),
ne AS (SELECT CAST(count(*) AS DOUBLE) AS n_exact FROM exact),
legs AS (
$legs
),
agg AS (SELECT l.method, CAST(count(*) AS BIGINT) AS n_returned,
          CAST(sum(CASE WHEN e.query_id IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_hits
        FROM legs l LEFT JOIN exact e
          ON l.query_id = e.query_id AND l.neighbor_id = e.neighbor_id
        GROUP BY l.method)
SELECT method, n_returned, n_hits,
  round(CAST(n_hits AS DOUBLE) / ne.n_exact, 4) AS recall_at_5
FROM agg, ne ORDER BY method"""
  }

  /** Retrieval-metrics oracle (q164): the q131 leg replays with ranks
    * kept; RR/DCG per (method, query), averaged over the dense
    * method×query grid so no-result queries score 0. The ideal-DCG
    * divisor is the SAME Scala-computed literal the engine divides by. */
  private def q164RetrievalMetricsOracle: String = {
    def leg(name: String, sql: String): String =
      s"SELECT '$name' AS method, query_id, rn AS rank, neighbor_id FROM (\n$sql\n) leg_$name"
    val legs = Seq(
      leg("graph", q216GraphAnnOracle()),
      leg("ivf", q35bIvfOracle),
      leg("ivf_trained", q82IvfTrainedOracle),
      leg("lsh", q35AnnLshOracle),
      leg("lsh_multi", q132LshMultiOracle),
      leg("pq", q124PqOracle),
      leg("sq", q122SqOracle)).mkString("\nUNION ALL\n")
    val idcg = graft.queries.LlmQueries.Idcg5
    s"""WITH exact AS (SELECT query_id, neighbor_id FROM (
$q34CosineTopKOracle
) gt),
legs AS (
$legs
),
h AS (SELECT l.method, l.query_id, l.rank,
        CASE WHEN e.query_id IS NOT NULL THEN 1 ELSE 0 END AS hit
      FROM legs l LEFT JOIN exact e
        ON l.query_id = e.query_id AND l.neighbor_id = e.neighbor_id),
pq AS (SELECT method, query_id,
         max(CASE WHEN hit = 1 THEN 1.0 / rank END) AS rr,
         sum(CASE WHEN hit = 1 THEN 1.0 / log2(rank + 1) END) AS dcg
       FROM h GROUP BY 1, 2),
grid AS (SELECT m.method, q.query_id
         FROM (VALUES ('graph'), ('ivf'), ('ivf_trained'), ('lsh'),
               ('lsh_multi'), ('pq'), ('sq')) m(method)
         CROSS JOIN (SELECT vec_id AS query_id FROM embeddings
                     WHERE vec_id < 10) q)
SELECT method, round(avg(coalesce(rr, 0)), 4) AS mrr,
  round(avg(coalesce(dcg, 0) / $idcg), 4) AS ndcg_at_5
FROM grid LEFT JOIN pq USING (method, query_id)
GROUP BY method ORDER BY method"""
  }

  /** q145/q150 oracle: bottom-8-by-portable-hash per source + the KMV
    * estimator off the kth smallest hash (HUGEINT numerator, integer
    * division). q150's streaming aggregate maintains the same sample
    * across micro-batches, so batch and stream share this replay. */
  private def q145BottomKOracle: String =
    s"""WITH hv AS (SELECT source, doc_id, n_chars,
      |  ${h("CAST(doc_id AS VARCHAR)", 45)} AS h
      |  FROM documents),
      |r AS (SELECT source, doc_id, n_chars, h,
      |  CAST(row_number() OVER (PARTITION BY source ORDER BY h, doc_id)
      |    AS INT) AS rn FROM hv),
      |kh AS (SELECT source AS ks,
      |  max(CASE WHEN rn = 8 THEN h END) AS h_k
      |  FROM r WHERE rn <= 8 GROUP BY 1)
      |SELECT source, rn, doc_id, n_chars,
      |  CAST(CAST('8070450532247928832' AS HUGEINT) // h_k AS BIGINT)
      |    AS est_distinct
      |FROM r JOIN kh ON source = ks WHERE rn <= 8
      |ORDER BY source, rn""".stripMargin

  /** q193 oracle: the bottom-256 distinct-word-hash sketch per source as
    * a window (value-identical to the engine's mergeable bottom_k
    * aggregate), every source pair, and the KMV set-algebra estimators —
    * HUGEINT-numerator integral divides (the q145 convention), the
    * all-integer intersection estimate, 4-dp Jaccard. */
  private def q193KmvSetOpsOracle: String = {
    val k = 256
    val num = (BigInt(k) - 1) * (BigInt(1) << 60)
    s"""WITH words AS (SELECT DISTINCT source, w FROM (
      |    SELECT source, unnest(string_split(text, ' ')) AS w
      |    FROM documents) WHERE w <> ''),
      |hs0 AS (SELECT DISTINCT source, ${h("w", 53)} AS h FROM words),
      |r AS (SELECT source, h,
      |  row_number() OVER (PARTITION BY source ORDER BY h) AS rn FROM hs0),
      |sk AS (SELECT source, list_sort(list(h)) AS hs
      |  FROM r WHERE rn <= $k GROUP BY 1),
      |p AS (SELECT a.source AS src_a, b.source AS src_b,
      |    a.hs AS ha, b.hs AS hb
      |  FROM sk a JOIN sk b ON a.source < b.source),
      |m AS (SELECT src_a, src_b, ha, hb,
      |    list_sort(list_distinct(list_concat(ha, hb)))[1:$k] AS lu FROM p),
      |e AS (SELECT src_a, src_b,
      |    CAST(len(ha) AS BIGINT) AS ka, CAST(len(hb) AS BIGINT) AS kb,
      |    CAST(len(lu) AS BIGINT) AS ku,
      |    CAST(len(list_intersect(lu, list_intersect(ha, hb))) AS BIGINT)
      |      AS rho,
      |    ha[len(ha)] AS kth_a, hb[len(hb)] AS kth_b, lu[len(lu)] AS kth_u
      |  FROM m),
      |f AS (SELECT src_a, src_b, ka, kb, ku, rho,
      |    CASE WHEN ka < $k THEN ka
      |      ELSE CAST(CAST('$num' AS HUGEINT) // kth_a AS BIGINT) END
      |      AS est_a,
      |    CASE WHEN kb < $k THEN kb
      |      ELSE CAST(CAST('$num' AS HUGEINT) // kth_b AS BIGINT) END
      |      AS est_b,
      |    CASE WHEN ku < $k THEN ku
      |      ELSE CAST(CAST('$num' AS HUGEINT) // kth_u AS BIGINT) END
      |      AS est_union
      |  FROM e)
      |SELECT src_a, src_b, ka, kb, ku, rho, est_a, est_b, est_union,
      |  rho * est_union // ku AS est_intersection,
      |  round(CAST(rho AS DOUBLE) / ku, 4) AS jaccard_est
      |FROM f ORDER BY src_a, src_b""".stripMargin
  }

  /** q206 oracle: the q193 KMV replay pointed at key COLUMNS — per-column
    * distinct hashes, window-spelling bottom-k, directed-pair estimators,
    * and the exact inclusion twin from real distinct joins. */
  private def q206FkDiscoveryOracle: String = {
    val k = 128
    val num = (BigInt(k) - 1) * (BigInt(1) << 60)
    s"""WITH vals AS (
      |    SELECT 'customer.c_custkey' AS cname, c_custkey AS v FROM customer
      |    UNION ALL SELECT 'orders.o_custkey', o_custkey FROM orders
      |    UNION ALL SELECT 'orders.o_orderkey', o_orderkey FROM orders
      |    UNION ALL SELECT 'lineitem.l_orderkey', l_orderkey FROM lineitem
      |    UNION ALL SELECT 'lineitem.l_partkey', l_partkey FROM lineitem
      |    UNION ALL SELECT 'part.p_partkey', p_partkey FROM part
      |    UNION ALL SELECT 'lineitem.l_suppkey', l_suppkey FROM lineitem
      |    UNION ALL SELECT 'supplier.s_suppkey', s_suppkey FROM supplier),
      |d AS (SELECT DISTINCT cname, v FROM vals WHERE v IS NOT NULL),
      |hs0 AS (SELECT DISTINCT cname, ${h("v", 57)} AS h FROM d),
      |r AS (SELECT cname, h,
      |  row_number() OVER (PARTITION BY cname ORDER BY h) AS rn FROM hs0),
      |sk AS (SELECT cname, list_sort(list(h)) AS hs
      |  FROM r WHERE rn <= $k GROUP BY 1),
      |p AS (SELECT a.cname AS col_a, b.cname AS col_b,
      |    a.hs AS ha, b.hs AS hb
      |  FROM sk a JOIN sk b ON a.cname <> b.cname),
      |m AS (SELECT col_a, col_b, ha, hb,
      |    list_sort(list_distinct(list_concat(ha, hb)))[1:$k] AS lu FROM p),
      |e0 AS (SELECT col_a, col_b,
      |    CAST(len(ha) AS BIGINT) AS ka, CAST(len(lu) AS BIGINT) AS ku,
      |    CAST(len(list_intersect(lu, list_intersect(ha, hb))) AS BIGINT)
      |      AS rho,
      |    ha[len(ha)] AS kth_a, lu[len(lu)] AS kth_u
      |  FROM m),
      |f AS (SELECT col_a, col_b, rho, ku,
      |    CASE WHEN ka < $k THEN ka
      |      ELSE CAST(CAST('$num' AS HUGEINT) // kth_a AS BIGINT) END
      |      AS est_a,
      |    CASE WHEN ku < $k THEN ku
      |      ELSE CAST(CAST('$num' AS HUGEINT) // kth_u AS BIGINT) END
      |      AS est_union
      |  FROM e0),
      |g AS (SELECT col_a, col_b, est_a,
      |    rho * est_union // ku AS est_intersection
      |  FROM f),
      |ea AS (SELECT cname AS col_a, CAST(count(*) AS BIGINT) AS exact_a
      |       FROM d GROUP BY 1),
      |ei AS (SELECT x.cname AS col_a, y.cname AS col_b,
      |    CAST(count(*) AS BIGINT) AS exact_intersection
      |  FROM d x JOIN d y ON x.v = y.v AND x.cname <> y.cname
      |  GROUP BY 1, 2)
      |SELECT g.col_a AS col_a, g.col_b AS col_b, g.est_a,
      |  g.est_intersection,
      |  round(CAST(g.est_intersection AS DOUBLE) / g.est_a, 4)
      |    AS inclusion_est,
      |  round(CAST(g.est_intersection AS DOUBLE) / g.est_a, 4) >= 0.95
      |    AS candidate,
      |  ea.exact_a,
      |  coalesce(ei.exact_intersection, 0) AS exact_intersection,
      |  round(CAST(coalesce(ei.exact_intersection, 0) AS DOUBLE)
      |    / ea.exact_a, 4) AS inclusion_exact
      |FROM g JOIN ea ON ea.col_a = g.col_a
      |  LEFT JOIN ei ON ei.col_a = g.col_a AND ei.col_b = g.col_b
      |ORDER BY g.col_a, g.col_b""".stripMargin
  }

  /** q194 oracle: one src×tgt pair table fixed-pointed to integer sims
    * at the scan, both directions' top-4 windows RANKED ON those
    * integers (nothing downstream sees a raw float), exact integer
    * neighborhood sums, the folded single-division margin, best-margin
    * row per src. */
  private def q194BitextMarginOracle: String =
    """WITH src AS (SELECT vec_id, embedding FROM embeddings
      |    WHERE vec_id % 2 = 0),
      |tgt AS (SELECT vec_id, embedding FROM embeddings
      |    WHERE vec_id % 2 = 1),
      |fs AS (SELECT s.vec_id AS src_id, t.vec_id AS tgt_id,
      |    CAST(round(list_cosine_similarity(
      |        CAST(s.embedding AS DOUBLE[]), CAST(t.embedding AS DOUBLE[]))
      |      * 10000, 0) AS BIGINT) AS si
      |  FROM src s, tgt t),
      |f4 AS (SELECT * FROM (SELECT src_id, tgt_id, si, row_number()
      |    OVER (PARTITION BY src_id ORDER BY si DESC, tgt_id) AS rn
      |  FROM fs) WHERE rn <= 4),
      |ax AS (SELECT src_id, CAST(sum(si) AS BIGINT) AS sum_a
      |  FROM f4 GROUP BY 1),
      |b4 AS (SELECT * FROM (SELECT tgt_id, si, row_number()
      |    OVER (PARTITION BY tgt_id ORDER BY si DESC, src_id) AS rn
      |  FROM fs) WHERE rn <= 4),
      |bx AS (SELECT tgt_id, CAST(sum(si) AS BIGINT) AS sum_b
      |  FROM b4 GROUP BY 1),
      |m AS (SELECT f4.src_id, f4.tgt_id, f4.si,
      |    round(8.0 * f4.si / (sum_a + sum_b), 4) AS margin
      |  FROM f4 JOIN ax ON f4.src_id = ax.src_id
      |  JOIN bx ON f4.tgt_id = bx.tgt_id),
      |r AS (SELECT *, row_number() OVER (PARTITION BY src_id
      |    ORDER BY margin DESC, tgt_id) AS rk FROM m)
      |SELECT src_id, tgt_id, round(si / 10000.0, 4) AS sim, margin,
      |  margin >= 1.05 AS mined
      |FROM r WHERE rk = 1 ORDER BY src_id""".stripMargin

  /** q144 oracle: the link synthesis, host edge aggregation, and 5
    * unrolled fixed-point PageRank rounds (teleport 150000, damping
    * 85%, truncating `//` division — nonnegative operands, so DuckDB's
    * floor division equals Spark's `div` truncation). `sum` promotes to
    * HUGEINT in DuckDB; each round casts back to BIGINT. */
  /** q175 oracle: q144's link-graph CTEs with the TrustRank twist —
    * r0 = Fp on the three literal seeds (0 elsewhere), per-round
    * teleport only on seeds; 5 rounds unrolled, all-integer. */
  private def q175TrustRankOracle: String = {
    val iters = 5
    val seedList =
      "('src0.crawl.example', 'src1.crawl.example', 'src2.crawl.example')"
    val rounds = (1 to iters).map { i =>
      s"""c$i AS (SELECT ew.dst, sum((r${i - 1}.r * ew.w) // ew.ow) AS s
       FROM ew JOIN r${i - 1} ON r${i - 1}.node = ew.src GROUP BY 1),
r$i AS (SELECT node,
        CAST(CASE WHEN node IN $seedList THEN 150000 ELSE 0 END
             + (85 * COALESCE(s, 0)) // 100 AS BIGINT) AS r
       FROM nodes LEFT JOIN c$i ON node = c$i.dst)"""
    }.mkString(",\n")
    s"""WITH links AS (SELECT source || '.crawl.example' AS src,
       'src' || ((doc_id * 7 + 3) % 20) || '.crawl.example' AS dst
     FROM documents),
e AS (SELECT src, dst, CAST(count(*) AS BIGINT) AS w
      FROM links GROUP BY 1, 2),
ew AS (SELECT e.src, e.dst, e.w, o.ow FROM e
       JOIN (SELECT src, CAST(sum(w) AS BIGINT) AS ow
             FROM e GROUP BY 1) o ON e.src = o.src),
nodes AS (SELECT DISTINCT src AS node FROM e
          UNION SELECT DISTINCT dst FROM e),
r0 AS (SELECT node, CAST(CASE WHEN node IN $seedList
         THEN 1000000 ELSE 0 END AS BIGINT) AS r FROM nodes),
$rounds
SELECT node AS host, r AS trust_fp,
  node IN $seedList AS is_seed
FROM r$iters ORDER BY host"""
  }

  private def q144PageRankOracle: String = {
    val iters = 5
    val rounds = (1 to iters).map { i =>
      s"""c$i AS (SELECT ew.dst, sum((r${i - 1}.r * ew.w) // ew.ow) AS s
       FROM ew JOIN r${i - 1} ON r${i - 1}.node = ew.src GROUP BY 1),
r$i AS (SELECT node,
        CAST(150000 + (85 * COALESCE(s, 0)) // 100 AS BIGINT) AS r
       FROM nodes LEFT JOIN c$i ON node = c$i.dst)"""
    }.mkString(",\n")
    s"""WITH links AS (SELECT source || '.crawl.example' AS src,
       'src' || ((doc_id * 7 + 3) % 20) || '.crawl.example' AS dst
     FROM documents),
e AS (SELECT src, dst, CAST(count(*) AS BIGINT) AS w
      FROM links GROUP BY 1, 2),
ew AS (SELECT e.src, e.dst, e.w, o.ow FROM e
       JOIN (SELECT src, CAST(sum(w) AS BIGINT) AS ow
             FROM e GROUP BY 1) o ON e.src = o.src),
nodes AS (SELECT DISTINCT src AS node FROM e
          UNION SELECT DISTINCT dst FROM e),
r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS r FROM nodes),
$rounds
SELECT node AS host, r AS rank_fp FROM r$iters ORDER BY host"""
  }
}
