package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.operators._
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1Agg(spark, "/root/testdata/sf0.001")
  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> (Relational.q1Agg _),
    "q2_join" -> (Relational.q2Join _),
    "q3_topk" -> (Relational.q3TopK _),
    "q4_sort_limit" -> (Relational.q4SortLimit _),
    "q5_semi_anti" -> (Relational.q5SemiAnti _),
    "q6_rollup" -> (Relational.q6Rollup _),
    "q7_running_window" -> (Relational.q7RunningWindow _),
    "q8_set_ops" -> (Relational.q8SetOps _),
    "q9_event_window" -> (Relational.q9EventWindow _),
    // crawl operators over derived URLs (SURVEY §2.2-2.4)
    "c1_canonicalize" -> (CrawlQueries.c1Canonicalize _),
    "c2_doc_id" -> (CrawlQueries.c2DocId _),
    "c3_media_filter" -> (CrawlQueries.c3MediaFilter _),
    "c4_resolve" -> (CrawlQueries.c4Resolve _),
    "c5_dedup_first_wins" -> (CrawlQueries.c5DedupFirstWins _),
    "c6_host_budget" -> (CrawlQueries.c6HostBudget _),
    "c7_robots" -> (CrawlQueries.c7Robots _),
    "c8_wave_expansion" -> (CrawlQueries.c8WaveExpansion _),
    "c9_robots_txt" -> (CrawlQueries.c9RobotsTxt _),
    // training-data text analysis
    "t1_exact_dedup" -> (TextOps.exactDedup _),
    "t2_token_count" -> (TextOps.tokenCount _),
    "t3_quality_score" -> (TextOps.qualityScore _),
    "t4_lang_id" -> (TextOps.langId _),
    "t5_fingerprint" -> (TextOps.fingerprint _),
    // near-duplicate detection
    "d1_minhash_signature" -> (DedupOps.minhashSignature _),
    "d2_minhash_lsh_pairs" -> (DedupOps.minhashLshPairs _),
    "d3_simhash" -> (DedupOps.simhash _),
    "d4_ngram_jaccard" -> (DedupOps.ngramJaccardPairs _),
    "d5_embedding_neardup" -> (DedupOps.embeddingNearDup _),
    // similarity search
    "a1_ann_brute_topk" -> (AnnOps.bruteForceTopK _),
    "a2_ann_lsh_buckets" -> (AnnOps.lshBuckets _),
    "a3_ann_lsh_topk" -> (AnnOps.lshTopK _),
    "a4_ann_ivf_topk" -> (AnnOps.ivfTopK _),
    // multimodal binary plumbing
    "m1_binary_meta" -> (Multimodal.binaryMeta _),
    "m2_frame_sample" -> (Multimodal.frameSample _),
    "m3_decode_stub" -> (Multimodal.decodeStub _),
    // ES-mapping analyzer chains (reference conf/mappings/*.json)
    "x1_analyze_autocomplete" -> (AnalyzerOps.analyzeAutocomplete _),
    "x2_analyze_standard" -> (AnalyzerOps.analyzeStandard _),
    "x3_analyze_english_stop" -> (AnalyzerOps.analyzeEnglishStop _),
    "x4_analyzed_fields" -> (AnalyzerOps.analyzedFields _),
    "x5_porter_stems" -> (AnalyzerOps.porterStems _),
  )
  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q1_agg" -> Relational.q1Sql,
    "q2_join" -> Relational.q2Sql,
    "q3_topk" -> Relational.q3Sql,
    "q4_sort_limit" -> Relational.q4Sql,
    "q5_semi_anti" -> Relational.q5Sql,
    "q6_rollup" -> Relational.q6Sql,
    "q7_running_window" -> Relational.q7Sql,
    "q8_set_ops" -> Relational.q8Sql,
    "q9_event_window" -> Relational.q9Sql,
    "c1_canonicalize" -> CrawlQueries.c1Sql,
    "c2_doc_id" -> CrawlQueries.c2Sql,
    "c3_media_filter" -> CrawlQueries.c3Sql,
    "c4_resolve" -> CrawlQueries.c4Sql,
    "c5_dedup_first_wins" -> CrawlQueries.c5Sql,
    "c6_host_budget" -> CrawlQueries.c6Sql,
    "c7_robots" -> CrawlQueries.c7Sql,
    "c8_wave_expansion" -> CrawlQueries.c8Sql,
    "c9_robots_txt" -> CrawlQueries.c9Sql,
    "t1_exact_dedup" -> TextOps.exactDedupSql,
    "t2_token_count" -> TextOps.tokenCountSql,
    "t3_quality_score" -> TextOps.qualityScoreSql,
    "t4_lang_id" -> TextOps.langIdSql,
    "t5_fingerprint" -> TextOps.fingerprintSql,
    "d1_minhash_signature" -> DedupOps.minhashSignatureSql,
    "d2_minhash_lsh_pairs" -> DedupOps.minhashLshPairsSql,
    "d3_simhash" -> DedupOps.simhashSql,
    "d4_ngram_jaccard" -> DedupOps.ngramJaccardPairsSql,
    "d5_embedding_neardup" -> DedupOps.embeddingNearDupSql,
    "a1_ann_brute_topk" -> AnnOps.bruteForceTopKSql,
    "a2_ann_lsh_buckets" -> AnnOps.lshBucketsSql,
    "a3_ann_lsh_topk" -> AnnOps.lshTopKSql,
    "a4_ann_ivf_topk" -> AnnOps.ivfTopKSql,
    "m1_binary_meta" -> Multimodal.binaryMetaSql,
    "m2_frame_sample" -> Multimodal.frameSampleSql,
    "m3_decode_stub" -> Multimodal.decodeStubSql,
    "x1_analyze_autocomplete" -> AnalyzerOps.analyzeAutocompleteSql,
    "x2_analyze_standard" -> AnalyzerOps.analyzeStandardSql,
    "x3_analyze_english_stop" -> AnalyzerOps.analyzeEnglishStopSql,
    "x4_analyzed_fields" -> AnalyzerOps.analyzedFieldsSql,
    "x5_porter_stems" -> AnalyzerOps.porterStemsSql,
  )
}
