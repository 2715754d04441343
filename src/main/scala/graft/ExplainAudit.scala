package graft
import org.apache.spark.sql.functions._
/** Plan audit: prints formatted plans for representative queries so scan
  * pruning, pushdown, join strategy, and codegen coverage can be reviewed.
  */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val spark = Engine.create("audit")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q02_filter", "q04_agg", "q11_join_names", "q12_join_left", "q33_minhash_lsh",
        "q36_ann_brute", "q40_events_window", "q45_ann_ivf_exact", "q47_salted_join",
        "q50_neardup_components", "q51_clean_corpus",
        "q57_segment_dedup", "q59_contamination", "q60_pack_sequences",
        "q63_range_join", "q64_gap_fill", "q65_centroid_assign",
        "q66_tfidf_top_terms", "q68_interval_join", "q69_topk_per_group",
        "q72_rollup", "q73_pivot", "q76_quantize_embeddings",
        "q78_corr_stats", "q79_kmeans_lloyd", "q80_bigram_lift",
        "q81_session_window",
        "q100_pagerank", "q104_bm25", "q106_semdedup", "q108_incremental_lsh",
        "q110_key_skew", "q115_robust_scale", "q117_mutual_knn",
        "q118_component_split", "q123_novelty_curve", "q125_tpch_q5",
        "q128_tpch_q18", "q129_triangles",
        "q142_mutual_knn_ivf", "q144_clean_corpus_lsh", "q149_video_frames",
        "q150_bucketed_join", "q151_partition_pruned_scan", "q152_udaf_sql",
        "q153_source_roundtrip", "q154_dynamic_partition_pruning",
        "q155_streaming_partitioned_ingest",
        "q156_tpch_q11", "q160_tpch_q15", "q161_tpch_q21",
        "q163_dup_substr_stats", "q164_dup_substr_spans_hashed",
        "q166_dsir_weights", "q168_window_frames", "q170_compaction",
        "q188_backoff_lm", "q190_image_dhash_neardup", "q191_hll_distinct",
        "q192_incremental_agg", "q194_ann_sq8", "q198_weighted_sample",
        "q199_kcore", "q200_image_dedup_pipeline",
        "q208_sorted_neighborhood", "q212_mmr_rerank",
        // round-6 session cost leaders + new plan morphologies
        "q213_entity_resolution", "q222_ppjoin", "q256_video_motion",
        "q260_bloom_join", "q262_cbo_join_reorder", "q263_bitmap_distinct",
        "q270_recursive_cte",
        // round-6 additions: fingerprint pigeonhole on audio prints,
        // anti-join purge rewrite, inverted-index sparse cosine
        "q292_audio_fingerprint_neardup", "q297_forget_rewrite",
        "q304_tfidf_cosine_pairs",
        // this session's cost leaders + new plan morphologies: FastSS
        // variant join, 24-round relaxation, panel pair window, dense-cell
        // components, greedy coverage anti-join, geofence containment
        "q332_point_in_polygon", "q333_edit_distance_pairs",
        "q334_dag_critical_path", "q335_theil_sen",
        "q337_grid_density_clusters", "q342_greedy_max_coverage",
        // round-6 cost leaders: 15-hop parity BFS + CC (the stats-
        // propagation wedge regression query), component-contracted MST,
        // and the new rank/bucket + sequential-fold morphologies
        "q349_bipartite_check", "q370_boruvka_mst", "q377_uplift_qini",
        "q381_seq_patterns", "q386_corr_matrix")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      println(SparkEntry.queries(n)(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
    }
    spark.stop()
  }
}
