package graft

import graft.functions.GraftFunctions
import graft.operators._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + FIXTURES.md.
  *
  * Every entry in [[queries]] has a matching ANSI-SQL oracle in
  * [[oracleSql]] run by DuckDB over the same parquet tables (column names
  * and types aligned; doubles rounded identically on both sides). Queries
  * whose semantics are not SQL-expressible (KMeans IVF, the chunker, the
  * hash embedder) are declared without an oracle → rows-only check.
  */
object SparkEntry
    extends SparkEntryStreaming
    with SparkEntryCore
    with SparkEntryVector
    with SparkEntryIndex
    with SparkEntryHygiene
    with SparkEntryTraining {

  private[graft] def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** `events` with `ts` normalized to int64 epoch-nanoseconds regardless of
    * how the driver generated the column — older testdata stored parquet
    * TIMESTAMP_NS (read as long under `nanosAsLong`), newer testdata stores
    * TIMESTAMP(µs) which Spark reads as TIMESTAMP_NTZ. All downstream gap /
    * window arithmetic and the DuckDB oracles (`epoch_ns(ts)`) are written
    * against the nanosecond number line, so one normalization point keeps
    * both generations working. Session timezone is pinned to UTC in every
    * entry point, so the NTZ→LTZ cast is instant-preserving and matches
    * DuckDB's naive-as-UTC `epoch_ns`. */
  /** Recursively delete a staging dir (the q195/q201 streaming gates
    * copy the events table per run; leaking those fills /tmp across
    * bench reps). */
  private[graft] def rmTree(path: String): Unit = {
    import scala.jdk.CollectionConverters._
    val p = java.nio.file.Paths.get(path)
    if (java.nio.file.Files.exists(p))
      java.nio.file.Files.walk(p).iterator().asScala.toSeq
        .sortBy(-_.getNameCount)
        .foreach(f => java.nio.file.Files.deleteIfExists(f))
  }

  private[graft] def eventsNs(spark: SparkSession, dir: String): DataFrame = {
    val raw = t(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => raw
      case _ =>
        raw.withColumn("ts", unix_micros(col("ts").cast("timestamp_ltz")) * lit(1000L))
    }
  }

  /** Flagship: hash-embed the documents corpus, run a text query through
    * embed → exact k-NN → dynamic-threshold retrieval (the reference's
    * faiss-mode pipeline, `components/modes/faiss_mode.py:43-113`). */
  def entry(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val res = RagPipeline.query(spark,
      t(spark, "/root/testdata/sf0.001", "documents"),
      "spark join vector stream merge")
    res.docs
      .map(d => (d.docId, d.text, d.source,
        BigDecimal(d.score).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble,
        res.stats.final_threshold, res.stats.target_reached))
      .toDF("doc_id", "text", "source", "score", "final_threshold", "target_reached")
  }


  // ====================================================================

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing_summary" -> (q1PricingSummary _),
    "q2_brand_stats" -> (q2BrandStats _),
    "q3_shipping_priority" -> (q3ShippingPriority _),
    "q4_order_priority" -> (q4OrderPriority _),
    "q5_region_revenue" -> (q5RegionRevenue _),
    "q6_revenue_filter" -> (q6RevenueFilter _),
    "q7_order_rank" -> (q7OrderRank _),
    "q8_event_stats" -> (q8EventStats _),
    "q9_sessions" -> (q9Sessions _),
    "q10_event_json" -> (q10EventJson _),
    "q11_doc_stats" -> (q11DocStats _),
    "q12_lang_pred" -> (q12LangPred _),
    "q13_fingerprints" -> (q13Fingerprints _),
    "q14_dedup_keep_first" -> (q14DedupKeepFirst _),
    "q15_minhash_neardup" -> (q15MinhashNearDup _),
    "q16_knn_exact" -> (q16KnnExact _),
    "q17_knn_batch" -> (q17KnnBatch _),
    "q18_knn_batch_agg" -> (q18KnnBatchAgg _),
    "q19_dynamic_threshold" -> (q19DynamicThreshold _),
    "q20_emb_neardup" -> (q20EmbNearDup _),
    "q28_knn_l2" -> (q28KnnL2 _),
    "q30_threshold_progression" -> (q30ThresholdProgression _),
    "q36_dynamic_threshold_fine" -> (q36DynamicThresholdFine _),
    "q37_event_windows" -> (q37EventWindows _),
    "q31_multimodal_frames" -> (q31MultimodalFrames _),
    "q32_quality_buckets" -> (q32QualityBuckets _),
    "q29_fixed_threshold" -> (q29FixedThreshold _),
    "q24_score_parse" -> (q24ScoreParse _),
    "q25_json_tasks" -> (q25JsonTasks _),
    "q26_prev_context" -> (q26PrevContext _),
    "q27_best_order" -> (q27BestOrder _),
    "q33_corpus_append" -> (q33CorpusAppend _),
    "q34_ivf_recall" -> (q34IvfRecall _),
    "q107_nprobe_sweep" -> (q107NprobeSweep _),
    "q110_filtered_search" -> (q110FilteredSearch _),
    "q116_embedding_outliers" -> (q116EmbeddingOutliers _),
    "q21_ivf_search" -> (q21IvfSearch _),
    "q22_corpus_build" -> (q22CorpusBuild _),
    "q23_doc_semantic_search" -> (q23DocSemanticSearch _),
    "q35_embed_partitioned" -> (q35EmbedPartitioned _),
    "q38_docx_pipeline" -> (q38DocxPipeline _),
    "q39_full_events" -> (q39FullEvents _),
    "q40_conv_chunks" -> (q40ConvChunks _),
    "q41_upload_ingest" -> (q41UploadIngest _),
    "q42_simhash_neardup" -> (q42SimhashNearDup _),
    "q43_lsh_search" -> (q43LshSearch _),
    "q44_lsh_emb_neardup" -> (q44LshEmbNearDup _),
    "q45_image_decode" -> (q45ImageDecode _),
    "q46_audio_decode" -> (q46AudioDecode _),
    "q47_lsh_recall" -> (q47LshRecall _),
    "q48_chunk_headers" -> (q48ChunkHeaders _),
    "q49_salted_agg" -> (q49SaltedAgg _),
    "q50_hot_bucket_dedup" -> (q50HotBucketDedup _),
    "q51_decontaminate" -> (q51Decontaminate _),
    "q101_fuzzy_decontaminate" -> (q101FuzzyDecontaminate _),
    "q52_pack_bins" -> (q52PackBins _),
    "q53_split_assign" -> (q53SplitAssign _),
    "q54_pii_redact" -> (q54PiiRedact _),
    "q55_repetition" -> (q55Repetition _),
    "q56_ingest_screen" -> (q56IngestScreen _),
    "q57_mix_sample" -> (q57MixSample _),
    "q58_dedup_corpus" -> (q58DedupCorpus _),
    "q59_dedup_ledger" -> (q59DedupLedger _),
    "q60_dup_lines" -> (q60DupLines _),
    "q61_domain_filter" -> (q61DomainFilter _),
    "q62_linear_embed" -> (q62LinearEmbed _),
    "q63_neardup_components" -> (q63NearDupComponents _),
    "q64_repeated_lines" -> (q64RepeatedLines _),
    "q65_c4_clean" -> (q65C4Clean _),
    "q66_bm25" -> (q66Bm25 _),
    "q67_bm25_indexed" -> (q67Bm25Indexed _),
    "q68_postings" -> (q68Postings _),
    "q69_hybrid_rrf" -> (q69HybridRrf _),
    "q70_lm_quality" -> (q70LmQuality _),
    "q106_token_vocab" -> (q106TokenVocab _),
    "q111_bpe_pairs" -> (q111BpePairs _),
    "q112_normalize" -> (q112Normalize _),
    "q113_corpus_stats" -> (q113CorpusStats _),
    "q115_prepare_shard" -> (q115PrepareShard _),
    "q71_keep_best" -> (q71KeepBest _),
    "q72_mix_weights" -> (q72MixWeights _),
    "q73_url_dedup" -> (q73UrlDedup _),
    "q74_span_removal" -> (q74SpanRemoval _),
    "q75_gopher_rules" -> (q75GopherRules _),
    "q76_repeated_paragraphs" -> (q76RepeatedParagraphs _),
    "q77_pq_search" -> (q77PqSearch _),
    "q78_ivfadc_search" -> (q78IvfAdcSearch _),
    "q104_search_reconstruct" -> (q104SearchReconstruct _),
    "q109_ivfadc_batch" -> (q109IvfAdcBatch _),
    "q79_sq8_search" -> (q79SqSearch _),
    "q100_sq4_search" -> (q100Sq4Search _),
    "q80_refine_search" -> (q80RefineSearch _),
    "q81_dsir_weights" -> (q81DsirWeights _),
    "q82_semantic_dedup" -> (q82SemanticDedup _),
    "q83_ivf_stats" -> (q83IvfStats _),
    "q84_binary_search" -> (q84BinarySearch _),
    "q103_binary_range" -> (q103BinaryRange _),
    "q134_binary_hash" -> (q134BinaryHash _),
    "q135_binary_multihash" -> (q135BinaryMultiHash _),
    "q136_kmeans_train" -> (q136Kmeans _),
    "q137_embedding_drift" -> (q137EmbeddingDrift _),
    "q138_tokenizer_fertility" -> (q138TokenizerFertility _),
    "q139_shard_search" -> (q139ShardSearch _),
    "q140_spherical_kmeans" -> (q140SphericalKmeans _),
    "q141_kmeans_sweep" -> (q141KmeansSweep _),
    "q142_dataset_card" -> (q142DatasetCard _),
    "q143_lloyd_ivf" -> (q143LloydIvf _),
    "q144_quality_sample" -> (q144QualitySample _),
    "q145_hard_negatives" -> (q145HardNegatives _),
    "q146_retrieval_eval" -> (q146RetrievalEval _),
    "q147_mmr_rerank" -> (q147MmrRerank _),
    "q148_knn_classify" -> (q148KnnClassify _),
    "q149_epoch_shuffle" -> (q149EpochShuffle _),
    "q150_quota_sample" -> (q150QuotaSample _),
    "q151_quality_calibration" -> (q151QualityCalibration _),
    "q152_ivf_remove" -> (q152IvfRemove _),
    "q153_cell_topterms" -> (q153CellTopTerms _),
    "q154_ivf_merge" -> (q154IvfMerge _),
    "q155_pmi_cooccur" -> (q155PmiCooccur _),
    "q156_delete_blast" -> (q156DeleteBlast _),
    "q157_beam_sweep" -> (q157BeamSweep _),
    "q158_source_maxpool" -> (q158SourceMaxpool _),
    "q159_graph_stats" -> (q159GraphStats _),
    "q160_score_fusion" -> (q160ScoreFusion _),
    "q161_emb_isotropy" -> (q161EmbIsotropy _),
    "q162_containment" -> (q162Containment _),
    "q163_classifier_cv" -> (q163ClassifierCv _),
    "q164_knn_purity" -> (q164KnnPurity _),
    "q165_pack_fill" -> (q165PackFill _),
    "q166_probe_cost" -> (q166ProbeCost _),
    "q167_unigram_drift" -> (q167UnigramDrift _),
    "q168_ivf_merge_shift" -> (q168IvfMergeShift _),
    "q169_minhash_calibration" -> (q169MinhashCalibration _),
    "q170_eval_dirtiness" -> (q170EvalDirtiness _),
    "q171_weighted_kmeans" -> (q171WeightedKmeans _),
    "q172_dup_histogram" -> (q172DupHistogram _),
    "q173_cross_source_dups" -> (q173CrossSourceDups _),
    "q174_knn_l1" -> (q174KnnL1 _),
    "q175_knn_linf" -> (q175KnnLinf _),
    "q176_length_curriculum" -> (q176LengthCurriculum _),
    "q177_metric_agreement" -> (q177MetricAgreement _),
    "q178_band_sweep" -> (q178BandSweep _),
    "q179_pq_utilization" -> (q179PqUtilization _),
    "q180_orphan_audit" -> (q180OrphanAudit _),
    "q181_mix_quota" -> (q181MixQuota _),
    "q182_vocab_coverage" -> (q182VocabCoverage _),
    "q183_pq_ip_search" -> (q183PqIpSearch _),
    "q184_shard_balance" -> (q184ShardBalance _),
    "q185_mix_draw" -> (q185MixDraw _),
    "q186_method_overlap" -> (q186MethodOverlap _),
    "q187_ivf_l2_search" -> (q187IvfL2Search _),
    "q188_l2_range" -> (q188L2Range _),
    "q189_norm_stats" -> (q189NormStats _),
    "q190_quantizer_churn" -> (q190QuantizerChurn _),
    "q191_norm_yield" -> (q191NormYield _),
    "q192_idmap_search" -> (q192IdmapSearch _),
    "q193_watermark_audit" -> (q193WatermarkAudit _),
    "q194_session_stats" -> (q194SessionStats _),
    "q195_stream_sessions" -> (q195StreamSessions _),
    "q196_watermark_by_user" -> (q196WatermarkByUser _),
    "q197_band_sweep_sampled" -> (q197BandSweepSampled _),
    "q198_graph_insert" -> (q198GraphInsert _),
    "q199_graph_remove" -> (q199GraphRemove _),
    "q200_farthest_init" -> (q200FarthestInit _),
    "q201_stream_windows" -> (q201StreamWindows _),
    "q202_funnel" -> (q202Funnel _),
    "q203_cohort_retention" -> (q203CohortRetention _),
    "q204_asof_attribution" -> (q204AsofAttribution _),
    "q205_range_count" -> (q205RangeCount _),
    "q206_session_window" -> (q206SessionWindow _),
    "q207_stream_join" -> (q207StreamJoin _),
    "q208_maxsim_search" -> (q208MaxsimSearch _),
    "q209_maxsim_ivf" -> (q209MaxsimIvf _),
    "q210_mrl_search" -> (q210MrlSearch _),
    "q211_graph_pagerank" -> (q211GraphPagerank _),
    "q212_graph_ppr" -> (q212GraphPpr _),
    "q213_stream_dedup" -> (q213StreamDedup _),
    "q215_graph_triangles" -> (q215GraphTriangles _),
    "q216_graph_wcc" -> (q216GraphWcc _),
    "q217_kmv_distinct" -> (q217KmvDistinct _),
    "q218_kmv_setops" -> (q218KmvSetops _),
    "q219_rpf_search" -> (q219RpfSearch _),
    "q220_rpf_recall" -> (q220RpfRecall _),
    "q221_bloom_decontaminate" -> (q221BloomDecontaminate _),
    "q222_stream_outer_join" -> (q222StreamOuterJoin _),
    "q223_graph_kcore" -> (q223GraphKcore _),
    "q224_graph_bfs" -> (q224GraphBfs _),
    "q225_stream_tws" -> (q225StreamTws _),
    "q226_cms_counts" -> (q226CmsCounts _),
    "q227_weighted_sample" -> (q227WeightedSample _),
    "q228_prefix_jaccard" -> (q228PrefixJaccard _),
    "q229_winnow_pairs" -> (q229WinnowPairs _),
    "q230_stream_sliding" -> (q230StreamSliding _),
    "q231_graph_assortativity" -> (q231GraphAssortativity _),
    "q232_vocab_growth" -> (q232VocabGrowth _),
    "q233_graph_ball" -> (q233GraphBall _),
    "q234_zipf_fit" -> (q234ZipfFit _),
    "q235_orc_roundtrip" -> (q235OrcRoundtrip _),
    "q236_detector_recall" -> (q236DetectorRecall _),
    "q237_component_medoid" -> (q237ComponentMedoid _),
    "q238_stream_cms" -> (q238StreamCms _),
    "q239_image_ahash" -> (q239ImageAhash _),
    "q240_asof_forward" -> (q240AsofForward _),
    "q241_audio_ehash" -> (q241AudioEnergyHash _),
    "q242_grouping_sets" -> (q242GroupingSets _),
    "q243_range_frame" -> (q243RangeFrame _),
    "q244_pivot" -> (q244Pivot _),
    "q245_event_paths" -> (q245EventPaths _),
    "q246_event_transitions" -> (q246EventTransitions _),
    "q247_unpivot" -> (q247Unpivot _),
    "q248_length_deciles" -> (q248LengthDeciles _),
    "q249_exists_anti" -> (q249ExistsAnti _),
    "q250_budget_waterfill" -> (q250BudgetWaterfill _),
    "q251_rpf_append_search" -> (q251RpfAppendSearch _),
    "q252_rpf_occupancy" -> (q252RpfOccupancy _),
    "q253_unigram_seed" -> (q253UnigramSeed _),
    "q256_containment_recall" -> (q256ContainmentRecall _),
    "q257_stream_kmv" -> (q257StreamKmv _),
    "q258_image_hamming" -> (q258ImageHamming _),
    "q259_unigram_nll" -> (q259UnigramNll _),
    "q260_stream_full_outer" -> (q260StreamFullOuter _),
    "q261_unigram_doc_score" -> (q261UnigramDocScore _),
    "q262_stream_rpf_ingest" -> (q262StreamRpfIngest _),
    "q263_audio_hamming" -> (q263AudioHamming _),
    "q264_image_neardup_corpus" -> (q264ImageNearDupCorpus _),
    "q265_containment_decon" -> (q265ContainmentDecon _),
    "q266_unigram_pack" -> (q266UnigramPack _),
    "q267_containment_tiered" -> (q267ContainmentTiered _),
    "q268_stream_asset_screen" -> (q268StreamAssetScreen _),
    "q269_containment_budget" -> (q269ContainmentBudget _),
    "q270_budget_ledger" -> (q270BudgetLedger _),
    "q271_wide_neardup" -> (q271WideNearDup _),
    "q272_stream_wide_screen" -> (q272StreamWideScreen _),
    "q273_rpf_compacted_search" -> (q273RpfCompactedSearch _),
    "q254_unigram_encode" -> (q254UnigramEncode _),
    "q255_tokenizer_compare" -> (q255TokenizerCompare _),
    "q214_stream_enrich" -> (q214StreamEnrich _),
    "q85_range_search" -> (q85RangeSearch _),
    "q86_pca_search" -> (q86PcaSearch _),
    "q87_knn_graph" -> (q87KnnGraph _),
    "q88_sq8_recon" -> (q88SqRecon _),
    "q89_binary_recall" -> (q89BinaryRecall _),
    "q90_opq_search" -> (q90OpqSearch _),
    "q105_opq_ivf_search" -> (q105OpqIvfSearch _),
    "q114_rq_search" -> (q114RqSearch _),
    "q117_rq_recon" -> (q117RqRecon _),
    "q91_ivfsq_search" -> (q91IvfSqSearch _),
    "q102_ivfsq4_search" -> (q102IvfSq4Search _),
    "q92_bivf_search" -> (q92BivfSearch _),
    "q108_bivf_range" -> (q108BivfRange _),
    "q97_graph_search" -> (q97GraphSearch _),
    "q98_ivf_range" -> (q98IvfRange _),
    "q99_pq_recon" -> (q99PqRecon _),
    "q93_corpus_screen" -> (q93CorpusScreen _),
    "q94_quality_score" -> (q94QualityScore _),
    "q95_cluster_sample" -> (q95ClusterSample _),
    "q96_jsonl_roundtrip" -> (q96JsonlRoundtrip _),
    "q118_bpe_encode" -> (q118BpeEncode _),
    "q119_itq_search" -> (q119ItqSearch _),
    "q120_ivfpqr_search" -> (q120IvfPqrSearch _),
    "q121_bpe_doc_tokens" -> (q121BpeDocTokens _),
    "q122_pairwise_dist" -> (q122PairwiseDist _),
    "q123_nlist_sweep" -> (q123NlistSweep _),
    "q124_bpe_pack" -> (q124BpePack _),
    "q125_corpus_diff" -> (q125CorpusDiff _),
    "q126_source_quality" -> (q126SourceQuality _),
    "q127_safe_split" -> (q127SafeSplit _),
    "q128_html_extract" -> (q128HtmlExtract _),
    "q129_pack_emit" -> (q129PackEmit _),
    "q130_screen_vs_classifier" -> (q130ScreenVsClassifier _),
    "q131_dedup_density" -> (q131DedupDensity _),
    "q132_graph_batch" -> (q132GraphBatch _),
    "q133_bpe_roundtrip" -> (q133BpeRoundtrip _),
  )

  def oracleSql: Map[String, String] = Map(
    "q1_pricing_summary" -> q1Sql,
    "q2_brand_stats" -> q2Sql,
    "q3_shipping_priority" -> q3Sql,
    "q4_order_priority" -> q4Sql,
    "q5_region_revenue" -> q5Sql,
    "q6_revenue_filter" -> q6Sql,
    "q7_order_rank" -> q7Sql,
    "q8_event_stats" -> q8Sql,
    "q9_sessions" -> q9Sql,
    "q10_event_json" -> q10Sql,
    "q11_doc_stats" -> q11Sql,
    "q12_lang_pred" -> q12Sql,
    "q13_fingerprints" -> q13Sql,
    "q14_dedup_keep_first" -> q14Sql,
    "q15_minhash_neardup" -> q15Sql,
    "q16_knn_exact" -> q16Sql,
    "q17_knn_batch" -> q17Sql,
    "q18_knn_batch_agg" -> q17Sql, // same contract, aggregated physical plan
    "q19_dynamic_threshold" -> q19Sql,
    "q20_emb_neardup" -> q20Sql,
    "q28_knn_l2" -> q28Sql,
    "q30_threshold_progression" -> q30Sql,
    "q31_multimodal_frames" -> q31Sql,
    "q32_quality_buckets" -> q32Sql,
    "q29_fixed_threshold" -> q29Sql,
    "q24_score_parse" -> q24Sql,
    "q25_json_tasks" -> q25Sql,
    "q26_prev_context" -> q26Sql,
    "q27_best_order" -> q27Sql,
    "q33_corpus_append" -> q33Sql,
    "q36_dynamic_threshold_fine" -> q36Sql,
    "q37_event_windows" -> q37Sql,
    "q22_corpus_build" -> q22Sql,
    "q23_doc_semantic_search" -> q23Sql,
    "q35_embed_partitioned" -> q35Sql,
    "q39_full_events" -> q39Sql,
    "q40_conv_chunks" -> q40Sql,
    "q41_upload_ingest" -> q41Sql,
    "q42_simhash_neardup" -> q42Sql,
    "q38_docx_pipeline" -> q38Sql,
    "q43_lsh_search" -> q43Sql,
    "q44_lsh_emb_neardup" -> q44Sql,
    "q45_image_decode" -> q45Sql,
    "q46_audio_decode" -> q46Sql,
    "q47_lsh_recall" -> q47Sql,
    "q48_chunk_headers" -> q48Sql,
    "q49_salted_agg" -> q49Sql,
    "q50_hot_bucket_dedup" -> q50Sql,
    "q51_decontaminate" -> q51Sql,
    "q101_fuzzy_decontaminate" -> q101Sql,
    "q52_pack_bins" -> q52Sql,
    "q53_split_assign" -> q53Sql,
    "q54_pii_redact" -> q54Sql,
    "q55_repetition" -> q55Sql,
    "q56_ingest_screen" -> q56Sql,
    "q57_mix_sample" -> q57Sql,
    "q58_dedup_corpus" -> q58Sql,
    "q59_dedup_ledger" -> q59Sql,
    "q60_dup_lines" -> q60Sql,
    "q61_domain_filter" -> q61Sql,
    "q62_linear_embed" -> q62Sql,
    "q63_neardup_components" -> q63Sql,
    "q64_repeated_lines" -> q64Sql,
    "q65_c4_clean" -> q65Sql,
    "q66_bm25" -> q66Sql,
    "q67_bm25_indexed" -> q66Sql,
    "q68_postings" -> q68Sql,
    "q69_hybrid_rrf" -> q69Sql,
    "q70_lm_quality" -> q70Sql,
    "q106_token_vocab" -> q106Sql,
    "q111_bpe_pairs" -> q111Sql,
    "q112_normalize" -> q112Sql,
    "q113_corpus_stats" -> q113Sql,
    "q115_prepare_shard" -> q115Sql,
    "q81_dsir_weights" -> q81Sql,
    "q84_binary_search" -> q84Sql,
    "q103_binary_range" -> q103Sql,
    "q134_binary_hash" -> q134Sql,
    "q135_binary_multihash" -> q135Sql,
    "q136_kmeans_train" -> q136Sql,
    "q139_shard_search" -> q139Sql,
    "q140_spherical_kmeans" -> q140Sql,
    "q141_kmeans_sweep" -> q141Sql,
    "q142_dataset_card" -> q142Sql,
    "q144_quality_sample" -> q144Sql,
    "q145_hard_negatives" -> q145Sql,
    "q146_retrieval_eval" -> q146Sql,
    "q147_mmr_rerank" -> q147Sql,
    "q148_knn_classify" -> q148Sql,
    "q149_epoch_shuffle" -> q149Sql,
    "q150_quota_sample" -> q150Sql,
    "q155_pmi_cooccur" -> q155Sql,
    "q156_delete_blast" -> q156Sql,
    "q158_source_maxpool" -> q158Sql,
    "q160_score_fusion" -> q160Sql,
    "q161_emb_isotropy" -> q161Sql,
    "q162_containment" -> q162Sql,
    "q164_knn_purity" -> q164Sql,
    "q165_pack_fill" -> q165Sql,
    "q167_unigram_drift" -> q167Sql,
    "q169_minhash_calibration" -> q169Sql,
    "q170_eval_dirtiness" -> q170Sql,
    "q171_weighted_kmeans" -> q171Sql,
    "q172_dup_histogram" -> q172Sql,
    "q173_cross_source_dups" -> q173Sql,
    "q174_knn_l1" -> q174Sql,
    "q175_knn_linf" -> q175Sql,
    "q176_length_curriculum" -> q176Sql,
    "q177_metric_agreement" -> q177Sql,
    "q178_band_sweep" -> q178Sql,
    "q180_orphan_audit" -> q180Sql,
    "q181_mix_quota" -> q181Sql,
    "q182_vocab_coverage" -> q182Sql,
    "q184_shard_balance" -> q184Sql,
    "q185_mix_draw" -> q185Sql,
    "q186_method_overlap" -> q186Sql,
    "q188_l2_range" -> q188Sql,
    "q189_norm_stats" -> q189Sql,
    "q191_norm_yield" -> q191Sql,
    "q192_idmap_search" -> q192Sql,
    "q193_watermark_audit" -> q193Sql,
    "q194_session_stats" -> q194Sql,
    "q195_stream_sessions" -> q195Sql,
    "q196_watermark_by_user" -> q196Sql,
    "q200_farthest_init" -> q200Sql,
    "q201_stream_windows" -> q201Sql,
    "q202_funnel" -> q202Sql,
    "q203_cohort_retention" -> q203Sql,
    "q204_asof_attribution" -> q204Sql,
    "q205_range_count" -> q205Sql,
    "q206_session_window" -> q206Sql,
    "q207_stream_join" -> q207Sql,
    "q208_maxsim_search" -> q208Sql,
    "q210_mrl_search" -> q210Sql,
    "q213_stream_dedup" -> q213Sql,
    "q214_stream_enrich" -> q214Sql,
    "q217_kmv_distinct" -> OracleSqlGen.kmvDistinctSql(k = 64),
    "q218_kmv_setops" -> OracleSqlGen.kmvSetopsSql(k = 64),
    "q221_bloom_decontaminate" -> q221Sql,
    "q222_stream_outer_join" -> q222Sql,
    "q225_stream_tws" -> q225Sql,
    "q226_cms_counts" -> q226Sql,
    "q227_weighted_sample" -> q227Sql,
    "q228_prefix_jaccard" -> q228Sql,
    "q229_winnow_pairs" -> q229Sql,
    "q230_stream_sliding" -> q230Sql,
    "q234_zipf_fit" -> q234Sql,
    "q235_orc_roundtrip" -> q235Sql,
    "q236_detector_recall" -> q236Sql,
    "q237_component_medoid" -> q237Sql,
    "q238_stream_cms" -> q238Sql,
    "q239_image_ahash" -> q239Sql,
    "q240_asof_forward" -> q240Sql,
    "q241_audio_ehash" -> q241Sql,
    "q242_grouping_sets" -> q242Sql,
    "q243_range_frame" -> q243Sql,
    "q244_pivot" -> q244Sql,
    "q245_event_paths" -> q245Sql,
    "q246_event_transitions" -> q246Sql,
    "q247_unpivot" -> q247Sql,
    "q248_length_deciles" -> q248Sql,
    "q249_exists_anti" -> q249Sql,
    "q250_budget_waterfill" -> q250Sql,
    "q253_unigram_seed" -> q253Sql,
    "q256_containment_recall" -> q256Sql,
    "q257_stream_kmv" -> OracleSqlGen.kmvStreamSql(k = 64),
    "q258_image_hamming" -> q258Sql,
    "q260_stream_full_outer" -> q260Sql,
    "q263_audio_hamming" -> q263Sql,
    "q264_image_neardup_corpus" -> q264Sql,
    "q265_containment_decon" -> q265Sql,
    "q267_containment_tiered" -> q267Sql,
    "q268_stream_asset_screen" -> q268Sql,
    "q269_containment_budget" -> q269Sql,
    "q270_budget_ledger" -> q270Sql,
    "q271_wide_neardup" -> q271Sql,
    "q272_stream_wide_screen" -> q272Sql,
    "q197_band_sweep_sampled" -> q197Sql,
    "q85_range_search" -> q85Sql,
    "q122_pairwise_dist" -> q122Sql,
    "q125_corpus_diff" -> q125Sql,
    "q126_source_quality" -> q126Sql,
    "q127_safe_split" -> q127Sql,
    "q128_html_extract" -> q128Sql,
    "q129_pack_emit" -> q129Sql,
    "q131_dedup_density" -> q131Sql,
    "q133_bpe_roundtrip" -> q133Sql,
    "q89_binary_recall" -> q89Sql,
    "q93_corpus_screen" -> q93Sql,
    "q96_jsonl_roundtrip" -> q96Sql,
    "q71_keep_best" -> q71Sql,
    "q72_mix_weights" -> q72Sql,
    "q73_url_dedup" -> q73Sql,
    "q74_span_removal" -> q74Sql,
    "q75_gopher_rules" -> q75Sql,
    "q76_repeated_paragraphs" -> q76Sql,
  ) ++ ivfOracleSqls ++ pqOracleSqls ++ ivfAdcOracleSqls ++ sqOracleSqls ++
    sq4OracleSqls ++ pcaOracleSqls ++ opqOracleSqls ++ opqIvfOracleSqls ++
    ivfSqOracleSqls ++ ivfSq4OracleSqls ++ qcOracleSqls ++ cvOracleSqls ++ rqOracleSqls ++
    bpeOracleSqls ++ itqOracleSqls ++ ivfPqrOracleSqls ++
    nlistSweepOracleSqls ++ lloydIvfOracleSqls ++ churnOracleSqls ++
    rpfOracleSqls ++ rpfAppendOracleSqls ++ unigramOracleSqls ++
    vocabGrowthOracleSqls

  /** q232's oracle needs the dataset's max doc_id for its bucket rule —
    * dataset-derived like the quantizer oracles, same gated lifecycle. */
  private[graft] def vocabGrowthOracleSqls: Map[String, String] =
    (for {
      dir <- oracleSfDir
      s <- SparkSession.getActiveSession
    } yield Map("q232_vocab_growth" -> q232Sql(s, dir))).getOrElse(Map.empty)

  /** Set by Verify (after running the queries, before dumping oracle SQL)
    * so dataset-derived oracles — the IVF centroid literals — can read the
    * quantizer the query run just persisted. */
  @volatile var oracleSfDir: Option[String] = None

  /** IVF oracles are generated, not static: the centroids ARE the index
    * state, inlined as SQL literals the same way a query session loads
    * them from the persisted quantizer. Absent the cache (oracleSfDir
    * unset, or index untrained) the entries are omitted and the driver
    * falls back to its rows-only check. */
  /** PQ oracle, generated from the codebooks q77's run just persisted —
    * same lifecycle as [[ivfOracleSqls]]; omitted (driver falls back to
    * rows-only) when the artifact is absent or untrained. */
  private[graft] def pqOracleSqls: Map[String, String] =
    (for {
      dir <- oracleSfDir
      s <- SparkSession.getActiveSession
      path = java.nio.file.Paths.get(s"${pqCachePath(s, dir)}/codebooks.txt")
      if java.nio.file.Files.exists(path)
      lines = java.nio.file.Files.readAllLines(path)
      if lines.get(0).split(" ")(2).toInt > 0
    } yield {
      val m = lines.get(0).split(" ")(0).toInt
      val flat: Seq[Array[Double]] = (1 until lines.size())
        .map(i => lines.get(i).split(" ").map(_.toDouble))
      val books = flat.grouped(flat.length / m).toSeq
      Map(
        "q77_pq_search" -> OracleSqlGen.pqSearchSql(books, k = 10),
        "q99_pq_recon" -> OracleSqlGen.pqReconSql(books),
        "q179_pq_utilization" -> OracleSqlGen.pqUtilizationSql(books),
        "q183_pq_ip_search" -> OracleSqlGen.pqIpSearchSql(books, k = 10))
    }).getOrElse(Map.empty)

  /** Lloyd-trained-IVF oracle: the q143 replay generates from the
    * centroids the GATED training loop persisted — same `ivfSearchSql`
    * machinery as q21, different quantizer artifact. */
  private[graft] def lloydIvfOracleSqls: Map[String, String] =
    (for {
      dir <- oracleSfDir
      s <- SparkSession.getActiveSession
      path = java.nio.file.Paths.get(s"${lloydIvfCachePath(s, dir)}/quantizer.txt")
      if java.nio.file.Files.exists(path)
      lines = java.nio.file.Files.readAllLines(path)
      if lines.get(0).split(" ")(1).toInt > 0
    } yield {
      val cents: Seq[Array[Double]] = (1 until lines.size())
        .map(i => lines.get(i).split(" ").map(_.toDouble))
      Map("q143_lloyd_ivf" -> OracleSqlGen.ivfSearchSql(cents, k = 10, nprobe = 4))
    }).getOrElse(Map.empty)

  /** q190's oracle: needs BOTH persisted quantizer artifacts (the
    * shared sampled q21 one and the Lloyd q143 one) — same lifecycle as
    * [[lloydIvfOracleSqls]], reading two files. */
  private[graft] def churnOracleSqls: Map[String, String] =
    (for {
      dir <- oracleSfDir
      s <- SparkSession.getActiveSession
      pathA = java.nio.file.Paths.get(s"${ivfCachePath(s, dir)}/quantizer.txt")
      pathB = java.nio.file.Paths.get(s"${lloydIvfCachePath(s, dir)}/quantizer.txt")
      if java.nio.file.Files.exists(pathA) && java.nio.file.Files.exists(pathB)
      linesA = java.nio.file.Files.readAllLines(pathA)
      linesB = java.nio.file.Files.readAllLines(pathB)
      if linesA.get(0).split(" ")(1).toInt > 0 &&
        linesB.get(0).split(" ")(1).toInt > 0
    } yield {
      val centsA: Seq[Array[Double]] = (1 until linesA.size())
        .map(i => linesA.get(i).split(" ").map(_.toDouble))
      val centsB: Seq[Array[Double]] = (1 until linesB.size())
        .map(i => linesB.get(i).split(" ").map(_.toDouble))
      Map("q190_quantizer_churn" ->
        OracleSqlGen.quantizerChurnSql(centsA, centsB))
    }).getOrElse(Map.empty)

  /** BPE oracle, generated from the merges q118's run just persisted —
    * same lifecycle as [[pqOracleSqls]]. */
  private[graft] def bpeOracleSqls: Map[String, String] =
    (for {
      dir <- oracleSfDir
      s <- SparkSession.getActiveSession
      path = java.nio.file.Paths.get(s"${bpeCachePath(s, dir)}/merges.txt")
      if java.nio.file.Files.exists(path)
      merges = TextAnalysis.loadBpe(path.toString)
      if merges.nonEmpty
    } yield Map(
      "q118_bpe_encode" -> OracleSqlGen.bpeEncodeSql(
        merges.map(m => (m.lhs, m.rhs)), topK = 40),
      "q121_bpe_doc_tokens" -> OracleSqlGen.bpeDocTokenSql(
        merges.map(m => (m.lhs, m.rhs))),
      "q124_bpe_pack" -> OracleSqlGen.bpePackSql(
        merges.map(m => (m.lhs, m.rhs)), budget = 2000),
      "q138_tokenizer_fertility" -> OracleSqlGen.tokenizerFertilitySql(
        merges.map(m => (m.lhs, m.rhs))))).getOrElse(Map.empty)

  /** Unigram-LM oracles, generated from the piece table q254's run just
    * persisted (plus the BPE merges for the q255 comparison) — same
    * lifecycle as [[bpeOracleSqls]]. */
  private[graft] def unigramOracleSqls: Map[String, String] =
    (for {
      dir <- oracleSfDir
      s <- SparkSession.getActiveSession
      upath = java.nio.file.Paths.get(s"${unigramCachePath(s, dir)}/model.txt")
      if java.nio.file.Files.exists(upath)
      bpath = java.nio.file.Paths.get(s"${bpeCachePath(s, dir)}/merges.txt")
      if java.nio.file.Files.exists(bpath)
      model = TextAnalysis.loadUnigram(upath.toString)
      merges = TextAnalysis.loadBpe(bpath.toString)
      if model.pieces.nonEmpty && merges.nonEmpty
    } yield {
      val ps = model.pieces.map(p => (p.piece, p.logp))
      Map(
        "q254_unigram_encode" -> OracleSqlGen.unigramEncodeSql(
          ps, model.unkLogp, model.maxLen, topK = 40),
        "q255_tokenizer_compare" -> OracleSqlGen.tokenizerCompareSql(
          merges.map(m => (m.lhs, m.rhs)), ps, model.unkLogp, model.maxLen),
        "q259_unigram_nll" -> OracleSqlGen.unigramNllSql(
          ps, model.unkLogp, model.maxLen),
        "q261_unigram_doc_score" -> OracleSqlGen.unigramDocScoreSql(
          ps, model.unkLogp, model.maxLen),
        "q266_unigram_pack" -> OracleSqlGen.unigramPackSql(
          ps, model.unkLogp, model.maxLen, budget = 2000))
    }).getOrElse(Map.empty)

  /** Quality-classifier oracle, generated from the coefficients q94's
    * run just persisted — same lifecycle as [[pqOracleSqls]]. */
  private[graft] def qcOracleSqls: Map[String, String] =
    (for {
      dir <- oracleSfDir
      s <- SparkSession.getActiveSession
      path = java.nio.file.Paths.get(s"${qcCachePath(s, dir)}/model.txt")
      if java.nio.file.Files.exists(path)
      lines = java.nio.file.Files.readAllLines(path)
      if lines.get(0).trim.toInt > 0
    } yield {
      val weights = lines.get(1).split(" ").map(_.toDouble)
      val intercept = lines.get(2).toDouble
      Map(
        "q94_quality_score" ->
          OracleSqlGen.qualityClassifierSql(weights, intercept),
        "q151_quality_calibration" ->
          s"""WITH ${OracleSqlGen.qualityClassifierCtes(weights, intercept)},
             |s AS (
             |  SELECT d.doc_id, d.source, z.zv AS score
             |  FROM documents d JOIN z USING (doc_id)),
             |c AS (SELECT quantile_cont(score, 0.4) AS cut FROM s)
             |SELECT s.source, CAST(count(*) AS BIGINT) AS n_docs,
             |  CAST(count(*) FILTER (WHERE s.score >= c.cut) AS BIGINT) AS n_kept,
             |  round(CAST(count(*) FILTER (WHERE s.score >= c.cut) AS DOUBLE)
             |    / count(*), 4) AS keep_rate,
             |  round(min(c.cut), 6) AS cutoff
             |FROM s, c GROUP BY s.source
             |ORDER BY s.source""".stripMargin,
        "q130_screen_vs_classifier" ->
          s"""WITH ${q93SqlParts},
             |${OracleSqlGen.qualityClassifierCtes(weights, intercept)},
             |v AS (
             |  SELECT d.doc_id,
             |    (langp.lang_pred = 'en' AND gf.gopher_keep AND ckeep.c4_keep) AS kept
             |  FROM documents d
             |  JOIN langp USING (doc_id) JOIN gf USING (doc_id) JOIN ckeep USING (doc_id))
             |SELECT v.kept, z.zv > 0 AS pred,
             |  CAST(count(*) AS BIGINT) AS n_docs
             |FROM v JOIN z USING (doc_id)
             |GROUP BY 1, 2 ORDER BY kept, pred""".stripMargin)
    }).getOrElse(Map.empty)

  /** Cross-validation oracle: BOTH fold models q163's run just persisted
    * replayed as disjoint derived-table scoring blocks (`WITH` nests
    * inside a derived table — the nlistSweep idiom). */
  private[graft] def cvOracleSqls: Map[String, String] =
    (for {
      dir <- oracleSfDir
      s <- SparkSession.getActiveSession
      p0 = java.nio.file.Paths.get(s"${qcCachePath(s, dir)}/cv_fold0.txt")
      p1 = java.nio.file.Paths.get(s"${qcCachePath(s, dir)}/cv_fold1.txt")
      if java.nio.file.Files.exists(p0) && java.nio.file.Files.exists(p1)
      l0 = java.nio.file.Files.readAllLines(p0)
      l1 = java.nio.file.Files.readAllLines(p1)
      if l0.get(0).trim.toInt > 0 && l1.get(0).trim.toInt > 0
    } yield {
      def block(fold: Int, lines: java.util.List[String], evalParity: Int) = {
        val w = lines.get(1).split(" ").map(_.toDouble)
        val b = lines.get(2).toDouble
        s"""SELECT CAST($fold AS BIGINT) AS fold, tp, fp, fn, tn,
           |  round(CAST(tp + tn AS DOUBLE) / CAST(tp + fp + fn + tn AS DOUBLE), 4)
           |    AS accuracy
           |FROM (
           |  SELECT
           |    count(*) FILTER (WHERE truth AND pred) AS tp,
           |    count(*) FILTER (WHERE NOT truth AND pred) AS fp,
           |    count(*) FILTER (WHERE truth AND NOT pred) AS fn,
           |    count(*) FILTER (WHERE NOT truth AND NOT pred) AS tn
           |  FROM (WITH ${OracleSqlGen.qualityClassifierCtes(w, b)}
           |        SELECT (d.lang = 'en') AS truth, z.zv > 0 AS pred
           |        FROM documents d JOIN z ON z.doc_id = d.doc_id
           |        WHERE d.doc_id % 2 = $evalParity))""".stripMargin
      }
      Map("q163_classifier_cv" ->
        s"""SELECT * FROM (
           |${block(0, l0, 1)}
           |UNION ALL
           |${block(1, l1, 0)}
           |) ORDER BY fold""".stripMargin)
    }).getOrElse(Map.empty)

  /** IVF-SQ8 oracle, generated from the shared quantizer + the residual
    * bounds q91's run just persisted — same lifecycle as
    * [[pqOracleSqls]]. */
  private[graft] def ivfSqOracleSqls: Map[String, String] =
    (for {
      dir <- oracleSfDir
      s <- SparkSession.getActiveSession
      qpath = java.nio.file.Paths.get(s"${ivfCachePath(s, dir)}/quantizer.txt")
      bpath = java.nio.file.Paths.get(s"${ivfSqCachePath(s, dir)}/bounds.txt")
      if java.nio.file.Files.exists(qpath) && java.nio.file.Files.exists(bpath)
      qlines = java.nio.file.Files.readAllLines(qpath)
      blines = java.nio.file.Files.readAllLines(bpath)
      if qlines.get(0).split(" ")(1).toInt > 0 && blines.get(0).trim.toInt > 0
    } yield {
      val cents: Seq[Array[Double]] = (1 until qlines.size())
        .map(i => qlines.get(i).split(" ").map(_.toDouble))
      val vmin = blines.get(1).split(" ").map(_.toDouble)
      val step = blines.get(2).split(" ").map(_.toDouble)
      Map("q91_ivfsq_search" ->
        OracleSqlGen.ivfSqSearchSql(cents, vmin, step, k = 10, nprobe = 4))
    }).getOrElse(Map.empty)

  /** IVF-SQ4 oracle: shared quantizer + the 4-bit residual bounds q102's
    * run just persisted — same lifecycle as [[ivfSqOracleSqls]]. */
  private[graft] def ivfSq4OracleSqls: Map[String, String] =
    (for {
      dir <- oracleSfDir
      s <- SparkSession.getActiveSession
      qpath = java.nio.file.Paths.get(s"${ivfCachePath(s, dir)}/quantizer.txt")
      bpath = java.nio.file.Paths.get(s"${ivfSq4CachePath(s, dir)}/bounds.txt")
      if java.nio.file.Files.exists(qpath) && java.nio.file.Files.exists(bpath)
      qlines = java.nio.file.Files.readAllLines(qpath)
      blines = java.nio.file.Files.readAllLines(bpath)
      if qlines.get(0).split(" ")(1).toInt > 0 && blines.get(0).trim.toInt > 0
    } yield {
      val cents: Seq[Array[Double]] = (1 until qlines.size())
        .map(i => qlines.get(i).split(" ").map(_.toDouble))
      val vmin = blines.get(1).split(" ").map(_.toDouble)
      val step = blines.get(2).split(" ").map(_.toDouble)
      Map("q102_ivfsq4_search" ->
        OracleSqlGen.ivfSq4SearchSql(cents, vmin, step, k = 10, nprobe = 4))
    }).getOrElse(Map.empty)

  /** OPQ oracle, generated from BOTH artifacts q90's run just persisted
    * (rotation + rotated-space codebooks) — same lifecycle as
    * [[pqOracleSqls]]. */
  private[graft] def opqOracleSqls: Map[String, String] =
    (for {
      dir <- oracleSfDir
      s <- SparkSession.getActiveSession
      rpath = java.nio.file.Paths.get(s"${opqCachePath(s, dir)}/rot.txt")
      cpath = java.nio.file.Paths.get(s"${opqCachePath(s, dir)}/codebooks.txt")
      if java.nio.file.Files.exists(rpath) && java.nio.file.Files.exists(cpath)
      rlines = java.nio.file.Files.readAllLines(rpath)
      clines = java.nio.file.Files.readAllLines(cpath)
      if clines.get(0).split(" ")(2).toInt > 0
    } yield {
      // rot.txt is the PCA artifact format: header, mean line (zeros),
      // then the d component rows
      val rot: Seq[Array[Double]] = (2 until rlines.size())
        .map(i => rlines.get(i).split(" ").map(_.toDouble))
      val m = clines.get(0).split(" ")(0).toInt
      val flat: Seq[Array[Double]] = (1 until clines.size())
        .map(i => clines.get(i).split(" ").map(_.toDouble))
      val books = flat.grouped(flat.length / m).toSeq
      Map("q90_opq_search" -> OracleSqlGen.opqSearchSql(rot, books, k = 10))
    }).getOrElse(Map.empty)

  /** RQ oracle: per-level codebooks q114's run just persisted (PQ
    * artifact format: m ⇔ levels, ksub ⇔ k, dsub ⇔ d) — same lifecycle
    * as [[pqOracleSqls]]. */
  private[graft] def rqOracleSqls: Map[String, String] =
    (for {
      dir <- oracleSfDir
      s <- SparkSession.getActiveSession
      path = java.nio.file.Paths.get(s"${rqCachePath(s, dir)}/codebooks.txt")
      if java.nio.file.Files.exists(path)
      lines = java.nio.file.Files.readAllLines(path)
      if lines.get(0).split(" ")(2).toInt > 0
    } yield {
      val m = lines.get(0).split(" ")(0).toInt
      val flat: Seq[Array[Double]] = (1 until lines.size())
        .map(i => lines.get(i).split(" ").map(_.toDouble))
      val levels = flat.grouped(flat.length / m).toSeq.map(_.map(_.toSeq.toArray))
      Map(
        "q114_rq_search" -> OracleSqlGen.rqSearchSql(levels, k = 10),
        "q117_rq_recon" -> OracleSqlGen.rqReconSql(levels))
    }).getOrElse(Map.empty)

  /** OPQ+IVF+PQ oracle: all THREE artifacts q105's run just persisted —
    * the shared OPQ rotation ([[opqCachePath]]), the rotated-space
    * quantizer and the residual codebooks ([[opqIvfCachePath]]) — same
    * lifecycle as [[pqOracleSqls]]. */
  private[graft] def opqIvfOracleSqls: Map[String, String] =
    (for {
      dir <- oracleSfDir
      s <- SparkSession.getActiveSession
      rpath = java.nio.file.Paths.get(s"${opqCachePath(s, dir)}/rot.txt")
      qpath = java.nio.file.Paths.get(s"${opqIvfCachePath(s, dir)}/quantizer.txt")
      cpath = java.nio.file.Paths.get(s"${opqIvfCachePath(s, dir)}/codebooks.txt")
      if java.nio.file.Files.exists(rpath) &&
        java.nio.file.Files.exists(qpath) && java.nio.file.Files.exists(cpath)
      rlines = java.nio.file.Files.readAllLines(rpath)
      qlines = java.nio.file.Files.readAllLines(qpath)
      clines = java.nio.file.Files.readAllLines(cpath)
      if qlines.get(0).split(" ")(1).toInt > 0 &&
        clines.get(0).split(" ")(2).toInt > 0
    } yield {
      val rot: Seq[Array[Double]] = (2 until rlines.size())
        .map(i => rlines.get(i).split(" ").map(_.toDouble))
      val cents: Seq[Array[Double]] = (1 until qlines.size())
        .map(i => qlines.get(i).split(" ").map(_.toDouble))
      val m = clines.get(0).split(" ")(0).toInt
      val flat: Seq[Array[Double]] = (1 until clines.size())
        .map(i => clines.get(i).split(" ").map(_.toDouble))
      val books = flat.grouped(flat.length / m).toSeq
      Map("q105_opq_ivf_search" ->
        OracleSqlGen.opqIvfAdcSearchSql(rot, cents, books, k = 10, nprobe = 4))
    }).getOrElse(Map.empty)

  /** PCA oracle, generated from the artifact q86's run just persisted —
    * same lifecycle as [[pqOracleSqls]]. */
  private[graft] def pcaOracleSqls: Map[String, String] =
    (for {
      dir <- oracleSfDir
      s <- SparkSession.getActiveSession
      path = java.nio.file.Paths.get(s"${pcaCachePath(s, dir)}/pca.txt")
      if java.nio.file.Files.exists(path)
      lines = java.nio.file.Files.readAllLines(path)
      if lines.get(0).split(" ")(0).toInt > 0
    } yield {
      val mean = lines.get(1).split(" ").map(_.toDouble)
      val comps: Seq[Array[Double]] = (2 until lines.size())
        .map(i => lines.get(i).split(" ").map(_.toDouble))
      Map("q86_pca_search" -> OracleSqlGen.pcaSearchSql(mean, comps, k = 10))
    }).getOrElse(Map.empty)

  /** nlist-sweep oracle, generated from ALL the sweep quantizer
    * artifacts q123's run just persisted — omitted unless every sweep
    * point's artifact exists and is trained. */
  private[graft] def nlistSweepOracleSqls: Map[String, String] =
    (for {
      dir <- oracleSfDir
      s <- SparkSession.getActiveSession
      paths = sweepNlists.map(nl =>
        java.nio.file.Paths.get(s"${ivfSweepPath(s, dir, nl)}/quantizer.txt"))
      if paths.forall(java.nio.file.Files.exists(_))
      linesAll = paths.map(java.nio.file.Files.readAllLines(_))
      if linesAll.forall(_.get(0).split(" ")(1).toInt > 0)
    } yield {
      val points = sweepNlists.zip(linesAll).map { case (nl, lines) =>
        (nl, (1 until lines.size())
          .map(i => lines.get(i).split(" ").map(_.toDouble)): Seq[Array[Double]])
      }
      Map("q123_nlist_sweep" ->
        OracleSqlGen.nlistSweepSql(points, k = 10, nprobe = 4, nq = 8))
    }).getOrElse(Map.empty)

  /** ITQ oracle, generated from the composed transform q119's run just
    * persisted — same lifecycle as [[pcaOracleSqls]]. */
  private[graft] def itqOracleSqls: Map[String, String] =
    (for {
      dir <- oracleSfDir
      s <- SparkSession.getActiveSession
      path = java.nio.file.Paths.get(s"${itqCachePath(s, dir)}/itq.txt")
      if java.nio.file.Files.exists(path)
      lines = java.nio.file.Files.readAllLines(path)
      if lines.get(0).split(" ")(0).toInt > 0
    } yield {
      val mean = lines.get(1).split(" ").map(_.toDouble)
      val comps: Seq[Array[Double]] = (2 until lines.size())
        .map(i => lines.get(i).split(" ").map(_.toDouble))
      Map("q119_itq_search" -> OracleSqlGen.itqSearchSql(mean, comps, k = 10))
    }).getOrElse(Map.empty)

  /** SQ8 oracle, generated from the bounds q79's run just persisted —
    * same lifecycle as [[pqOracleSqls]]; omitted (driver falls back to
    * rows-only) when the artifact is absent or untrained. */
  private[graft] def sqOracleSqls: Map[String, String] =
    (for {
      dir <- oracleSfDir
      s <- SparkSession.getActiveSession
      path = java.nio.file.Paths.get(s"${sqCachePath(s, dir)}/bounds.txt")
      if java.nio.file.Files.exists(path)
      lines = java.nio.file.Files.readAllLines(path)
      if lines.get(0).trim.toInt > 0
    } yield {
      val vmin = lines.get(1).split(" ").map(_.toDouble)
      val step = lines.get(2).split(" ").map(_.toDouble)
      Map(
        "q79_sq8_search" -> OracleSqlGen.sqSearchSql(vmin, step, k = 10),
        "q88_sq8_recon" -> OracleSqlGen.sqReconSql(vmin, step))
    }).getOrElse(Map.empty)

  /** SQ4 oracle, generated from the 4-bit bounds q100's run just
    * persisted — same lifecycle as [[sqOracleSqls]]. */
  private[graft] def sq4OracleSqls: Map[String, String] =
    (for {
      dir <- oracleSfDir
      s <- SparkSession.getActiveSession
      path = java.nio.file.Paths.get(s"${sq4CachePath(s, dir)}/bounds.txt")
      if java.nio.file.Files.exists(path)
      lines = java.nio.file.Files.readAllLines(path)
      if lines.get(0).trim.toInt > 0
    } yield {
      val vmin = lines.get(1).split(" ").map(_.toDouble)
      val step = lines.get(2).split(" ").map(_.toDouble)
      Map("q100_sq4_search" -> OracleSqlGen.sq4SearchSql(vmin, step, k = 10))
    }).getOrElse(Map.empty)

  /** IVFADC oracle: needs BOTH persisted artifacts — the coarse
    * quantizer (q21's) and the residual codebooks (q78's). Omitted →
    * rows-only fallback, same as the other generated oracles. */
  private[graft] def ivfAdcOracleSqls: Map[String, String] =
    (for {
      dir <- oracleSfDir
      s <- SparkSession.getActiveSession
      qpath = java.nio.file.Paths.get(s"${ivfCachePath(s, dir)}/quantizer.txt")
      cpath = java.nio.file.Paths.get(s"${pqCachePath(s, dir)}-ivfadc/codebooks.txt")
      if java.nio.file.Files.exists(qpath) && java.nio.file.Files.exists(cpath)
      qlines = java.nio.file.Files.readAllLines(qpath)
      clines = java.nio.file.Files.readAllLines(cpath)
      if qlines.get(0).split(" ")(1).toInt > 0 &&
        clines.get(0).split(" ")(2).toInt > 0
    } yield {
      val cents: Seq[Array[Double]] = (1 until qlines.size())
        .map(i => qlines.get(i).split(" ").map(_.toDouble))
      val m = clines.get(0).split(" ")(0).toInt
      val flat: Seq[Array[Double]] = (1 until clines.size())
        .map(i => clines.get(i).split(" ").map(_.toDouble))
      val books = flat.grouped(flat.length / m).toSeq
      Map(
        "q78_ivfadc_search" ->
          OracleSqlGen.ivfAdcSearchSql(cents, books, k = 10, nprobe = 4),
        "q80_refine_search" ->
          OracleSqlGen.refineSearchSql(cents, books,
            k = 10, rerank = 50, nprobe = 4),
        "q104_search_reconstruct" ->
          OracleSqlGen.ivfAdcReconSql(cents, books, k = 5, nprobe = 4),
        "q109_ivfadc_batch" ->
          OracleSqlGen.ivfAdcBatchSearchSql(cents, books,
            k = 10, nprobe = 4, nq = 6))
    }).getOrElse(Map.empty)

  /** IVFPQR oracle, generated from all THREE artifacts q120's run just
    * persisted (coarse quantizer + both codebook levels) — same
    * lifecycle as [[ivfAdcOracleSqls]]. */
  private[graft] def ivfPqrOracleSqls: Map[String, String] =
    (for {
      dir <- oracleSfDir
      s <- SparkSession.getActiveSession
      qpath = java.nio.file.Paths.get(s"${ivfCachePath(s, dir)}/quantizer.txt")
      c1path = java.nio.file.Paths.get(s"${pqCachePath(s, dir)}-ivfpqr/codebooks.txt")
      c2path = java.nio.file.Paths.get(s"${pqCachePath(s, dir)}-ivfpqr/refine.txt")
      if java.nio.file.Files.exists(qpath) &&
        java.nio.file.Files.exists(c1path) && java.nio.file.Files.exists(c2path)
      qlines = java.nio.file.Files.readAllLines(qpath)
      c1lines = java.nio.file.Files.readAllLines(c1path)
      c2lines = java.nio.file.Files.readAllLines(c2path)
      if qlines.get(0).split(" ")(1).toInt > 0 &&
        c1lines.get(0).split(" ")(2).toInt > 0 &&
        c2lines.get(0).split(" ")(2).toInt > 0
    } yield {
      val cents: Seq[Array[Double]] = (1 until qlines.size())
        .map(i => qlines.get(i).split(" ").map(_.toDouble))
      def parseBooks(lines: java.util.List[String]): Seq[Seq[Array[Double]]] = {
        val m = lines.get(0).split(" ")(0).toInt
        val flat: Seq[Array[Double]] = (1 until lines.size())
          .map(i => lines.get(i).split(" ").map(_.toDouble))
        flat.grouped(flat.length / m).toSeq
      }
      Map("q120_ivfpqr_search" -> OracleSqlGen.ivfPqrSearchSql(cents,
        parseBooks(c1lines), parseBooks(c2lines),
        k = 10, rerank = 50, nprobe = 4))
    }).getOrElse(Map.empty)

  /** RP-forest oracles, generated from the forest artifact q219's run
    * just persisted — [[ivfOracleSqls]] lifecycle; the query leaves are
    * re-routed here with the same driver arithmetic the engine used. */
  private[graft] def rpfOracleSqls: Map[String, String] =
    (for {
      dir <- oracleSfDir
      s <- SparkSession.getActiveSession
      fpath = java.nio.file.Paths.get(s"${rpfCachePath(s, dir)}/forest.txt")
      if java.nio.file.Files.exists(fpath)
    } yield {
      val f = RpForest.load(s, fpath.toString)
      val splits = for (tr <- 0 until f.trees; node <- 1 to (1 << f.depth) - 1)
        yield (tr, node, f.planes(tr)(node - 1), f.thetas(tr)(node - 1))
      val qs = t(s, dir, "embeddings").filter(col("vec_id") < 8)
        .select("vec_id", "embedding").collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).sortBy(_._1)
      val qLeaves0 = RpForest.routeQuery(f, qs.find(_._1 == 0L).get._2)
      val qLeavesAll = qs.toSeq.flatMap { case (qid, qv) =>
        RpForest.routeQuery(f, qv).map { case (tr, lf) => (qid, tr, lf) }
      }
      Map(
        "q219_rpf_search" -> OracleSqlGen.rpfSearchSql(splits, f.depth,
          qLeaves0, k = 10, qVecId = 0L),
        "q220_rpf_recall" -> OracleSqlGen.rpfRecallSql(splits, f.depth,
          qLeavesAll, k = 5, nq = 8),
        "q252_rpf_occupancy" -> OracleSqlGen.rpfOccupancySql(splits, f.depth))
    }).getOrElse(Map.empty)

  /** q251's oracle — generated from the APPEND-grown forest's artifact
    * ([[rpfAppendCorpus]]): routes the FULL corpus through the
    * base-trained heap, which is what append ≡ rebuild-route makes the
    * grown store equal to. Same gated lifecycle as [[rpfOracleSqls]]. */
  private[graft] def rpfAppendOracleSqls: Map[String, String] =
    (for {
      dir <- oracleSfDir
      s <- SparkSession.getActiveSession
      fpath = java.nio.file.Paths.get(s"${rpfAppendCachePath(s, dir)}/forest.txt")
      if java.nio.file.Files.exists(fpath)
    } yield {
      val f = RpForest.load(s, fpath.toString)
      val splits = for (tr <- 0 until f.trees; node <- 1 to (1 << f.depth) - 1)
        yield (tr, node, f.planes(tr)(node - 1), f.thetas(tr)(node - 1))
      val q0 = t(s, dir, "embeddings").filter(col("vec_id") === 0)
        .select("embedding").collect()(0).getSeq[Float](0).toArray
      val searchSql = OracleSqlGen.rpfSearchSql(splits,
        f.depth, RpForest.routeQuery(f, q0), k = 10, qVecId = 0L)
      // q262 streams the SAME delta through append, and q273 compacts
      // the streamed store before searching — all three stores must be
      // row-identical to q251's, so they share one oracle
      Map("q251_rpf_append_search" -> searchSql,
        "q262_stream_rpf_ingest" -> searchSql,
        "q273_rpf_compacted_search" -> searchSql)
    }).getOrElse(Map.empty)

  private[graft] def ivfOracleSqls: Map[String, String] =
    (for {
      dir <- oracleSfDir
      // oracle generation runs inside Verify's session; if no session is
      // active the cache key can't be derived → omit the IVF oracles and
      // let the driver fall back to its rows-only check
      s <- SparkSession.getActiveSession
      path = java.nio.file.Paths.get(s"${ivfCachePath(s, dir)}/quantizer.txt")
      if java.nio.file.Files.exists(path)
      lines = java.nio.file.Files.readAllLines(path)
      if lines.get(0).split(" ")(1).toInt > 0
    } yield {
      val cents: Seq[Array[Double]] = (1 until lines.size())
        .map(i => lines.get(i).split(" ").map(_.toDouble))
      Map(
        "q21_ivf_search" -> OracleSqlGen.ivfSearchSql(cents, k = 10, nprobe = 4),
        "q152_ivf_remove" -> OracleSqlGen.ivfRemoveSearchSql(cents,
          k = 10, nprobe = 4, imin = 8, imax = 40),
        "q153_cell_topterms" -> OracleSqlGen.cellTopTermsSql(cents,
          minDf = 5, minDfCell = 2, topK = 3),
        // merged store ≡ full corpus: the q21 replay IS the merge gate
        "q154_ivf_merge" -> OracleSqlGen.ivfSearchSql(cents, k = 10, nprobe = 4),
        "q168_ivf_merge_shift" -> OracleSqlGen.ivfMergeShiftSearchSql(cents,
          k = 10, nprobe = 4, addId = MergeAddId),
        "q187_ivf_l2_search" -> OracleSqlGen.ivfL2SearchSql(cents,
          k = 10, nprobe = 4),
        "q34_ivf_recall" -> OracleSqlGen.ivfRecallSql(cents, k = 10, nprobe = 4, nq = 8),
        "q82_semantic_dedup" -> OracleSqlGen.semanticDedupSql(cents,
          minCos = 0.3, cap = SemanticDedup.DefaultMaxCellSize),
        "q83_ivf_stats" -> OracleSqlGen.ivfCellStatsSql(cents),
        "q87_knn_graph" -> OracleSqlGen.knnGraphSql(cents,
          k = 4, cap = SemanticDedup.DefaultMaxCellSize),
        "q92_bivf_search" -> OracleSqlGen.bivfSearchSql(cents,
          k = 10, nprobe = 4),
        "q108_bivf_range" -> OracleSqlGen.bivfRangeSql(cents,
          maxDist = 320, nprobe = 4),
        "q95_cluster_sample" -> OracleSqlGen.clusterSampleSql(cents,
          perCell = 12, salt = "balance"),
        "q97_graph_search" -> OracleSqlGen.graphSearchSql(cents,
          kGraph = 4, cap = SemanticDedup.DefaultMaxCellSize,
          k = 10, nprobe = 4, beamWidth = 8, hops = 3),
        "q132_graph_batch" -> OracleSqlGen.graphSearchBatchSql(cents,
          kGraph = 4, cap = SemanticDedup.DefaultMaxCellSize,
          k = 10, nprobe = 4, beamWidth = 8, hops = 3,
          qVecIds = Seq(0, 1, 2, 3)),
        "q157_beam_sweep" -> OracleSqlGen.graphBeamSweepSql(cents,
          kGraph = 4, cap = SemanticDedup.DefaultMaxCellSize,
          k = 10, nprobe = 4, beams = Seq(2, 4, 8), hops = 3),
        "q159_graph_stats" -> OracleSqlGen.knnGraphStatsSql(cents,
          k = 4, cap = SemanticDedup.DefaultMaxCellSize),
        "q198_graph_insert" -> OracleSqlGen.graphInsertSql(cents,
          kGraph = 4, cap = SemanticDedup.DefaultMaxCellSize,
          nprobe = 4, beamWidth = 8, hops = 3, qVecId = 0,
          newId = 10000000L),
        "q199_graph_remove" -> OracleSqlGen.graphRemoveSql(cents,
          kGraph = 4, cap = SemanticDedup.DefaultMaxCellSize,
          mod = 101L, res = 7L),
        "q166_probe_cost" -> OracleSqlGen.ivfProbeCostSql(cents, maxProbe = 8),
        "q98_ivf_range" -> OracleSqlGen.ivfRangeSearchSql(cents,
          minScore = 0.2, nprobe = 4),
        "q107_nprobe_sweep" -> OracleSqlGen.ivfRecallSweepSql(cents,
          k = 10, nprobes = Seq(1, 2, 4, 8), nq = 8),
        "q110_filtered_search" -> OracleSqlGen.ivfFilteredSearchSql(cents,
          k = 10, nprobe = 4, label = 3),
        "q209_maxsim_ivf" -> OracleSqlGen.maxsimIvfSql(cents,
          k = 10, nprobe = 4, nq = 4, docSize = 8),
        "q211_graph_pagerank" -> OracleSqlGen.graphPagerankSql(cents,
          k = 4, cap = SemanticDedup.DefaultMaxCellSize,
          iters = 3, topK = 20),
        "q212_graph_ppr" -> OracleSqlGen.graphPprSql(cents,
          k = 4, cap = SemanticDedup.DefaultMaxCellSize,
          iters = 3, topK = 20, seedMod = 97L),
        "q215_graph_triangles" -> OracleSqlGen.graphTrianglesSql(cents,
          k = 4, cap = SemanticDedup.DefaultMaxCellSize, topK = 20),
        "q216_graph_wcc" -> OracleSqlGen.graphWccSql(cents,
          k = 4, cap = SemanticDedup.DefaultMaxCellSize, rounds = 5),
        "q223_graph_kcore" -> OracleSqlGen.graphKcoreSql(cents,
          k = 4, cap = SemanticDedup.DefaultMaxCellSize,
          kCore = 3, rounds = 3),
        "q224_graph_bfs" -> OracleSqlGen.graphBfsSql(cents,
          k = 4, cap = SemanticDedup.DefaultMaxCellSize,
          seedMod = 97L, rounds = 4),
        "q231_graph_assortativity" -> OracleSqlGen.graphAssortativitySql(cents,
          k = 4, cap = SemanticDedup.DefaultMaxCellSize),
        "q233_graph_ball" -> OracleSqlGen.graphBallSql(cents,
          k = 4, cap = SemanticDedup.DefaultMaxCellSize),
        "q137_embedding_drift" -> OracleSqlGen.embeddingDriftSql(cents,
          oldPred = "e.vec_id % 10 <> 0", newPred = "e.vec_id % 10 <> 1"),
        "q116_embedding_outliers" -> OracleSqlGen.embeddingOutliersSql(cents))
    }).getOrElse(Map.empty)
}
