"""DuckDB oracle type-alignment map (GENERATED — do not hand-edit).

Regenerate with:
    python tools/audit_oracle_types.py > /tmp/oracle_audit.json
    python tools/gen_oracle_casts.py /tmp/oracle_audit.json

Why this exists: the driver's correctness gate hashes values
type-sensitively.  DuckDB binds ``sum(<integer>)`` as HUGEINT,
``count``-arithmetic as BIGINT where Spark emits int, and some rounded
aggregates as DECIMAL — the VALUES are identical but the hash differs
(round-1 VERDICT.md "What's wrong #1").  plans/catalog.py wraps each
affected oracle in a projection that CASTs the offending columns to the
exact type Spark produces, so both engines hand the driver the same
logical and physical type.

``ORACLE_CASTS[name] = (ordered_output_columns, {column: duckdb_cast})``
"""

from __future__ import annotations

ORACLE_CASTS: dict[str, tuple[tuple[str, ...], dict[str, str]]] = {
    'agg_anova_f_oneway': (
        ('k', 'n_total', 'f_stat', 'eta_sq'),
        {'n_total': 'BIGINT'},
    ),
    'agg_benjamini_hochberg': (
        ('c_nationkey', 'n_rows', 'zval', 'pval', 'p_rank', 'discovery'),
        {'p_rank': 'INTEGER'},
    ),
    'agg_bitbool_countif': (
        ('o_orderstatus', 'key_bit_and', 'key_bit_or', 'key_bit_xor', 'all_over_1k', 'any_over_400k', 'n_urgent'),
        {'n_urgent': 'BIGINT'},
    ),
    'agg_brown_forsythe': (
        ('k', 'n_total', 'f_stat', 'variances_differ'),
        {'n_total': 'BIGINT'},
    ),
    'agg_chain_ladder_factors': (
        ('from_dev', 'n_origins', 'dev_factor'),
        {'from_dev': 'INTEGER'},
    ),
    'agg_chi_square_independence': (
        ('n_obs', 'n_segments', 'n_priorities', 'dof', 'chi2'),
        {'n_obs': 'BIGINT'},
    ),
    'agg_churn_transitions': (
        ('mi', 'n_new', 'n_retained', 'n_resurrected'),
        {'mi': 'INTEGER'},
    ),
    'agg_dau_mau_stickiness': (
        ('yyyymm', 'n_days', 'avg_dau', 'mau', 'stickiness'),
        {'yyyymm': 'INTEGER'},
    ),
    'agg_decile_lift': (
        ('decile', 'n_customers', 'n_orders', 'lift'),
        {'decile': 'INTEGER', 'n_orders': 'BIGINT'},
    ),
    'agg_eb_beta_binomial_returns': (
        ('p_brand', 'n', 'x', 'raw_rate', 'eb_rate', 'prior_alpha', 'prior_beta'),
        {'x': 'BIGINT'},
    ),
    'agg_equidepth_histogram': (
        ('bucket', 'n', 'lo', 'hi'),
        {'bucket': 'INTEGER'},
    ),
    'agg_expected_calibration_error': (
        ('bin', 'n', 'mean_conf', 'frac_pos', 'gap', 'ece_contrib'),
        {'bin': 'INTEGER'},
    ),
    'agg_holm_stepdown': (
        ('m_tests', 'holm_rejections', 'min_p', 'largest_rejected_p'),
        {'holm_rejections': 'BIGINT'},
    ),
    'agg_interval_union_coverage': (
        ('n_intervals', 'covered_seconds', 'naive_sum_seconds'),
        {'covered_seconds': 'BIGINT', 'naive_sum_seconds': 'BIGINT'},
    ),
    'agg_intraclass_correlation': (
        ('n_clusters', 'n_orders', 'icc1', 'k0', 'design_effect'),
        {'n_orders': 'BIGINT'},
    ),
    'agg_kaplan_meier': (
        ('duration_days', 'n_risk', 'd_events', 'survival'),
        {'d_events': 'BIGINT', 'duration_days': 'INTEGER', 'n_risk': 'BIGINT'},
    ),
    'agg_kendall_tau_monthly': (
        ('n_months', 'n_pairs', 'concordant', 'discordant', 'tau_b'),
        {'concordant': 'BIGINT', 'discordant': 'BIGINT'},
    ),
    'agg_kl_divergence_segments': (
        ('n_building_orders', 'n_machinery_orders', 'n_categories', 'kl_p_q'),
        {'n_building_orders': 'BIGINT', 'n_machinery_orders': 'BIGINT'},
    ),
    'agg_ks_two_sample': (
        ('n_a', 'n_b', 'ks_d', 'reject_05'),
        {'n_a': 'BIGINT', 'n_b': 'BIGINT'},
    ),
    'agg_late_priority_counts': (
        ('l_linestatus', 'high_line_count', 'low_line_count'),
        {'high_line_count': 'BIGINT', 'low_line_count': 'BIGINT'},
    ),
    'agg_leadtime_percentiles': (
        ('o_orderpriority', 'n_lines', 'avg_days', 'p50_days', 'p90_days', 'p99_days'),
        {'p50_days': 'INTEGER', 'p90_days': 'INTEGER', 'p99_days': 'INTEGER'},
    ),
    'agg_markov_entropy_rate': (
        ('state', 'n_from', 'pi', 'h_cond', 'rate_contrib'),
        {'n_from': 'BIGINT'},
    ),
    'agg_mcnemar_paired': (
        ('n11', 'n10', 'n01', 'n00', 'chi2', 'chi2_corrected'),
        {'n00': 'BIGINT', 'n01': 'BIGINT', 'n10': 'BIGINT', 'n11': 'BIGINT'},
    ),
    'agg_naive_bayes_eval': (
        ('n_customers', 'nb_accuracy', 'baseline_accuracy', 'n_predicted_positive'),
        {'n_predicted_positive': 'BIGINT'},
    ),
    'agg_nelson_aalen': (
        ('t', 'd', 'n_risk', 'cum_hazard'),
        {'d': 'BIGINT', 'n_risk': 'BIGINT', 't': 'INTEGER'},
    ),
    'agg_net_promoter_score': (
        ('seg', 'n', 'promoters', 'detractors', 'nps'),
        {'detractors': 'BIGINT', 'promoters': 'BIGINT'},
    ),
    'agg_permutation_test_deterministic': (
        ('observed_diff', 'n_permutations', 'n_extreme', 'p_value'),
        {'n_extreme': 'BIGINT'},
    ),
    'agg_priority_entropy': (
        ('n_name', 'n_orders', 'n_priorities', 'entropy_nats'),
        {'n_orders': 'BIGINT'},
    ),
    'agg_regression_price_qty': (
        ('l_returnflag', 'n', 'slope', 'intercept', 'r2'),
        {'n': 'BIGINT'},
    ),
    'agg_rfm_segments': (
        ('r_score', 'f_score', 'm_score', 'n_customers'),
        {'f_score': 'INTEGER', 'm_score': 'INTEGER', 'r_score': 'INTEGER'},
    ),
    'agg_runs_test': (
        ('n_up', 'n_down', 'n_runs', 'expected_runs', 'z_stat'),
        {'n_runs': 'BIGINT'},
    ),
    'agg_simpson_reversal': (
        ('n_strata', 'n_pos', 'n_neg', 'pooled_log_or', 'reversal'),
        {'n_neg': 'BIGINT', 'n_pos': 'BIGINT'},
    ),
    'agg_srm_check': (
        ('n', 'n_treat', 'n_control', 'treat_share', 'chi2_1df', 'srm_flag'),
        {'n_control': 'BIGINT', 'n_treat': 'BIGINT'},
    ),
    'agg_storey_pi0': (
        ('m_tests', 'n_above', 'pi0_hat', 'min_p', 'min_q_value'),
        {'n_above': 'BIGINT'},
    ),
    'agg_tukey_fence_outliers': (
        ('seg', 'n', 'q1', 'q3', 'n_mild_outliers', 'n_extreme_outliers'),
        {'n_extreme_outliers': 'BIGINT', 'n_mild_outliers': 'BIGINT'},
    ),
    'agg_two_proportion_ztest': (
        ('n1', 'n2', 'p1', 'p2', 'z_stat', 'significant_95'),
        {'n1': 'BIGINT', 'n2': 'BIGINT'},
    ),
    'array_hof_embedding_stats': (
        ('vec_id', 'dim', 'n_positive', 'sum_all', 'l1_norm', 'has_large_component'),
        {'dim': 'INTEGER'},
    ),
    'cdc_csv_quoted_newlines': (
        ('o_orderpriority', 'n_rows', 'total_chars', 'content_xor'),
        {'total_chars': 'BIGINT'},
    ),
    'cdc_csv_scalar_roundtrip': (
        ('o_orderstatus', 'n_rows', 'key_sum', 'price_sum', 'first_date'),
        {'key_sum': 'BIGINT'},
    ),
    'cdc_idempotency_key_dedup': (
        ('n_submissions', 'n_admitted', 'n_suppressed', 'n_double_admits'),
        {'n_admitted': 'BIGINT', 'n_suppressed': 'BIGINT'},
    ),
    'cdc_ivm_agg_maintenance': (
        ('o_orderstatus', 'n_live', 'total_price'),
        {'total_price': 'DECIMAL(18,2)'},
    ),
    'cdc_latency_histogram': (
        ('bucket_30d', 'n_events', 'p50_days', 'p95_days'),
        {'p50_days': 'INTEGER', 'p95_days': 'INTEGER'},
    ),
    'cdc_scd3_previous_value': (
        ('n_keys', 'n_with_history', 'n_current_statuses', 'n_inconsistent'),
        {'n_inconsistent': 'BIGINT', 'n_with_history': 'BIGINT'},
    ),
    'cdc_update_column_churn': (
        ('column_name', 'n_changes', 'n_pairs'),
        {'n_changes': 'BIGINT'},
    ),
    'cdc_xml_scalar_roundtrip': (
        ('o_orderstatus', 'n_rows', 'key_sum', 'price_sum'),
        {'key_sum': 'BIGINT'},
    ),
    'corpus_budget_largest_remainder': (
        ('source', 'mass', 'alloc_tokens'),
        {'alloc_tokens': 'BIGINT', 'mass': 'BIGINT'},
    ),
    'corpus_data_card': (
        ('n_docs', 'n_sources', 'exact_dup_rate', 'lang_entropy_bits', 'total_tokens', 'len_p25', 'len_p50', 'len_p75'),
        {'total_tokens': 'BIGINT'},
    ),
    'corpus_hash_split': (
        ('split', 'n_docs', 'total_chars'),
        {'total_chars': 'BIGINT'},
    ),
    'corpus_incremental_ingest': (
        ('class', 'n_docs', 'total_chars'),
        {'total_chars': 'BIGINT'},
    ),
    'corpus_injection_scan': (
        ('source', 'n_docs', 'n_override', 'n_role_smuggle', 'n_exfil', 'flagged_share'),
        {'n_exfil': 'BIGINT', 'n_override': 'BIGINT', 'n_role_smuggle': 'BIGINT'},
    ),
    'corpus_license_scan': (
        ('source', 'n_docs', 'n_copyright', 'n_license_terms', 'n_rights_reserved', 'flagged_share'),
        {'n_copyright': 'BIGINT', 'n_license_terms': 'BIGINT', 'n_rights_reserved': 'BIGINT'},
    ),
    'corpus_mix_sources': (
        ('domain', 'n_total', 'n_kept', 'kept_chars'),
        {'kept_chars': 'BIGINT', 'n_kept': 'BIGINT'},
    ),
    'corpus_pack_token_shards': (
        ('shard_id', 'n_docs', 'total_tokens', 'first_doc', 'last_doc'),
        {'total_tokens': 'BIGINT'},
    ),
    'corpus_percentile_length_filter': (
        ('source', 'n_docs', 'n_kept', 'avg_kept_chars', 'p5_chars', 'p95_chars'),
        {'n_kept': 'BIGINT'},
    ),
    'corpus_sft_pair_prep': (
        ('source', 'n_pairs', 'n_within_budget', 'budget_yield', 'kept_tokens'),
        {'kept_tokens': 'BIGINT', 'n_within_budget': 'BIGINT'},
    ),
    'corpus_span_corruption': (
        ('source', 'n_docs', 'n_tokens', 'n_spans', 'n_masked_tokens', 'corruption_rate'),
        {'n_masked_tokens': 'BIGINT', 'n_spans': 'BIGINT', 'n_tokens': 'BIGINT'},
    ),
    'corpus_split_leakage_audit': (
        ('n_fingerprints', 'n_leaky', 'n_train_test_leaks', 'leak_rate'),
        {'n_leaky': 'BIGINT', 'n_train_test_leaks': 'BIGINT'},
    ),
    'corpus_stratified_sample': (
        ('lang', 'n_total', 'n_kept', 'kept_chars'),
        {'kept_chars': 'BIGINT', 'n_kept': 'BIGINT'},
    ),
    'corpus_vocab_growth': (
        ('decile', 'cum_tokens', 'cum_types'),
        {'decile': 'INTEGER'},
    ),
    'dedup_paragraph_segments': (
        ('doc_id', 'n_segments', 'n_kept', 'n_dropped'),
        {'n_dropped': 'BIGINT', 'n_kept': 'BIGINT'},
    ),
    'dedup_phonetic_blocking': (
        ('n_blocks', 'n_rows', 'n_distinct_words', 'max_block', 'n_candidate_pairs'),
        {'n_distinct_words': 'BIGINT', 'n_rows': 'BIGINT'},
    ),
    'dedup_sorted_neighborhood': (
        ('edit_distance', 'n_pairs'),
        {'edit_distance': 'INTEGER'},
    ),
    'dedup_survivorship_canonical': (
        ('source', 'n_docs', 'n_survivors', 'n_dropped'),
        {'n_dropped': 'BIGINT', 'n_survivors': 'BIGINT'},
    ),
    'eval_average_precision': (
        ('n_pos', 'n_total', 'prevalence', 'average_precision'),
        {'n_pos': 'BIGINT'},
    ),
    'eval_langid_prf_kappa': (
        ('tp', 'fp', 'fn', 'tn', 'precision_en', 'recall_en', 'f1_en', 'accuracy', 'cohen_kappa'),
        {'fn': 'BIGINT', 'fp': 'BIGINT', 'tn': 'BIGINT', 'tp': 'BIGINT'},
    ),
    'events_alarm_debounce': (
        ('user_id', 'n_errors', 'n_alarms', 'n_suppressed', 'suppression_rate'),
        {'n_alarms': 'BIGINT', 'n_suppressed': 'BIGINT'},
    ),
    'events_capture_recapture': (
        ('n1', 'n2', 'm', 'true_total', 'chapman_estimate'),
        {'m': 'BIGINT', 'n1': 'BIGINT', 'n2': 'BIGINT'},
    ),
    'events_consecutive_motif': (
        ('n_users', 'n_users_with_motif', 'total_motifs', 'max_motifs_per_user'),
        {'max_motifs_per_user': 'BIGINT', 'n_users_with_motif': 'BIGINT', 'total_motifs': 'BIGINT'},
    ),
    'events_extremal_index_declustering': (
        ('threshold', 'n_exceedances', 'n_clusters', 'extremal_index'),
        {'n_clusters': 'BIGINT'},
    ),
    'events_haar_wavelet_levels': (
        ('n_samples', 'signal_energy', 'detail1_energy', 'detail2_energy', 'approx2_energy', 'reconstructed_energy'),
        {'signal_energy': 'DOUBLE'},
    ),
    'events_user_behavior_entropy': (
        ('bin', 'entropy_lo', 'n_users', 'mean_entropy'),
        {'entropy_lo': 'DOUBLE'},
    ),
    'feat_best_split_gini': (
        ('split_decile', 'split_threshold', 'gini_root', 'gini_split', 'gain'),
        {'split_decile': 'INTEGER'},
    ),
    'feat_woe_iv_deciles': (
        ('decile', 'n_pos', 'n_neg', 'woe', 'iv_total'),
        {'decile': 'INTEGER'},
    ),
    'fuzzy_blocked_name_pairs': (
        ('name_a', 'name_b', 'dist'),
        {'dist': 'INTEGER'},
    ),
    'graph_kcore_peel_step': (
        ('n_nodes0', 'n_edges0', 'k_threshold', 'n_survivors', 'n_edges_induced', 'avg_deg0'),
        {'k_threshold': 'BIGINT'},
    ),
    'groupedmap_minmax_normalize': (
        ('c_custkey', 'c_nationkey', 'bal_norm'),
        {'c_nationkey': 'BIGINT'},
    ),
    'join_quartile_dependence': (
        ('c_quart', 'o_quart', 'n', 'expected', 'pearson_resid'),
        {'c_quart': 'INTEGER', 'o_quart': 'INTEGER'},
    ),
    'join_role_playing_dates': (
        ('n_lines', 'ordered_weekend_share', 'shipped_weekend_share', 'both_weekend'),
        {'both_weekend': 'BIGINT'},
    ),
    'map_dynamic_schema_algebra': (
        ('k_mod', 'n_events', 'n_high'),
        {'n_high': 'BIGINT'},
    ),
    'mlops_kfold_cv_deterministic': (
        ('fold', 'n_eval', 'threshold', 'fold_accuracy'),
        {'fold': 'INTEGER'},
    ),
    'mlops_model_disagreement': (
        ('n_docs', 'agreement_rate', 'champion_acc', 'challenger_acc', 'champ_right_chall_wrong', 'chall_right_champ_wrong'),
        {'chall_right_champ_wrong': 'BIGINT', 'champ_right_chall_wrong': 'BIGINT'},
    ),
    'mlops_pit_training_set': (
        ('label', 'n_rows', 'mean_prior_orders', 'mean_prior_spend', 'mean_days_since_prev', 'n_cold_start'),
        {'n_cold_start': 'BIGINT'},
    ),
    'mlops_threshold_sweep_f1': (
        ('cut_decile', 'tp', 'fp', 'precision_', 'recall_', 'f1', 'is_best'),
        {'cut_decile': 'INTEGER', 'fp': 'BIGINT', 'tp': 'BIGINT'},
    ),
    'mlops_youden_cutpoint': (
        ('cut_decile', 'sensitivity', 'specificity', 'youden_j', 'is_best'),
        {'cut_decile': 'INTEGER'},
    ),
    'mm_audio_window_energy': (
        ('doc_id', 'n_windows', 'total_energy', 'max_energy'),
        {'max_energy': 'BIGINT', 'total_energy': 'BIGINT'},
    ),
    'mm_audio_zero_crossing': (
        ('doc_id', 'n_windows', 'total_crossings', 'max_crossings'),
        {'total_crossings': 'BIGINT'},
    ),
    'mm_blob_chunk_reassembly': (
        ('n_docs', 'n_chunks', 'n_roundtrip_ok'),
        {'n_chunks': 'BIGINT', 'n_roundtrip_ok': 'BIGINT'},
    ),
    'mm_image_patch_plan': (
        ('n_images', 'total_patches', 'n_too_small', 'mean_coverage'),
        {'n_too_small': 'BIGINT', 'total_patches': 'BIGINT'},
    ),
    'pipeline_curate_corpus': (
        ('doc_id', 'n_tokens', 'quality'),
        {'n_tokens': 'INTEGER'},
    ),
    'scalar_cyclical_calendar_features': (
        ('qtr', 'n_orders', 'avg_dow_sin', 'avg_dow_cos', 'avg_doy_sin', 'avg_doy_cos'),
        {'qtr': 'INTEGER'},
    ),
    'scalar_feistel_pseudonymize': (
        ('n_keys', 'n_pseudonyms', 'n_roundtrip_ok', 'bijection_proven'),
        {'n_roundtrip_ok': 'BIGINT'},
    ),
    'scalar_hash_encode_surface': (
        ('p_partkey', 'name_md5', 'name_sha256', 'name_b64', 'b64_roundtrip', 'name_bytes'),
        {'name_bytes': 'INTEGER'},
    ),
    'scalar_haversine_distance': (
        ('region_lo', 'region_hi', 'n_pairs', 'avg_dist_km', 'max_dist_km'),
        {'region_hi': 'INTEGER', 'region_lo': 'INTEGER'},
    ),
    'scalar_ipv4_roundtrip': (
        ('n_addrs', 'n_roundtrip_ok', 'n_subnets_16', 'min_dotted'),
        {'n_roundtrip_ok': 'BIGINT'},
    ),
    'scalar_levenshtein_brand_names': (
        ('p_brand', 'n_pairs', 'avg_dist', 'min_dist', 'max_dist'),
        {'max_dist': 'INTEGER', 'min_dist': 'INTEGER'},
    ),
    'scalar_luhn_checksum': (
        ('n_numbers', 'n_valid', 'valid_rate'),
        {'n_valid': 'BIGINT'},
    ),
    'scalar_string_date_math': (
        ('p_partkey', 'brand_upper', 'name_prefix', 'brand_type', 'name_len', 'price_with_tax', 'price_dist_1000', 'log_price', 'size_mod5'),
        {'name_len': 'INTEGER'},
    ),
    'scalar_ulid_mint': (
        ('n', 'n_distinct', 'n_order_agree', 'sortable_and_unique'),
        {'n_order_agree': 'BIGINT'},
    ),
    'sessionize_events_gap': (
        ('user_id', 'session_no', 'n_events', 'duration_s'),
        {'session_no': 'BIGINT'},
    ),
    'sim_kmeans_lloyd_step': (
        ('cluster', 'n_members', 'n_switched', 'avg_dist'),
        {'n_switched': 'BIGINT'},
    ),
    'sim_srp_lsh_hamming': (
        ('n_vectors', 'n_buckets', 'max_bucket_size', 'corr_hamming_cosine'),
        {'n_vectors': 'BIGINT'},
    ),
    'source_json_corrupt_records': (
        ('record_class', 'n_rows', 'key_sum', 'price_sum'),
        {'key_sum': 'BIGINT'},
    ),
    'sql_api_topk_per_group_qualify': (
        ('o_orderpriority', 'o_orderkey', 'o_totalprice', 'rnk'),
        {'rnk': 'INTEGER'},
    ),
    'stream_retraction_agg': (
        ('o_orderstatus', 'n_live', 'total_price'),
        {'total_price': 'DECIMAL(18,2)'},
    ),
    'stream_retraction_agg_jvm': (
        ('o_orderstatus', 'n_live', 'total_price'),
        {'total_price': 'DECIMAL(18,2)'},
    ),
    'text_bleu_proxy_pairs': (
        ('source', 'n_pairs', 'mean_bleu1', 'max_bleu1', 'n_suspicious_pairs'),
        {'n_suspicious_pairs': 'BIGINT'},
    ),
    'text_bpe_first_merge': (
        ('merge_pair', 'n_occurrences', 'total_symbols', 'merge_coverage'),
        {'n_occurrences': 'BIGINT', 'total_symbols': 'BIGINT'},
    ),
    'text_cavnar_trenkle_langid': (
        ('lang', 'n_docs', 'n_correct', 'accuracy'),
        {'n_correct': 'BIGINT'},
    ),
    'text_chao1_unseen_vocab': (
        ('source', 's_obs', 'f1', 'f2', 'chao1_estimate', 'coverage'),
        {'f1': 'BIGINT', 'f2': 'BIGINT'},
    ),
    'text_clean_normalize': (
        ('doc_id', 'clean_hash', 'n_chars', 'n_tokens'),
        {'n_chars': 'INTEGER', 'n_tokens': 'INTEGER'},
    ),
    'text_code_detection': (
        ('source', 'n_docs', 'mean_symbol_density', 'mean_digit_density', 'n_code_suspect', 'code_suspect_share'),
        {'n_code_suspect': 'BIGINT'},
    ),
    'text_gopher_filters': (
        ('source', 'n_docs', 'n_word_count_ok', 'n_word_len_ok', 'n_stopword_ok', 'n_repetition_ok', 'n_pass_all'),
        {'n_pass_all': 'BIGINT', 'n_repetition_ok': 'BIGINT', 'n_stopword_ok': 'BIGINT', 'n_word_count_ok': 'BIGINT', 'n_word_len_ok': 'BIGINT'},
    ),
    'text_hapax_ratio': (
        ('source', 'vocab', 'hapax', 'dis', 'hapax_ratio', 'sichel_s'),
        {'dis': 'BIGINT', 'hapax': 'BIGINT'},
    ),
    'text_log_odds_fightin_words': (
        ('t', 'n_web', 'n_wiki', 'zscore'),
        {'n_web': 'BIGINT', 'n_wiki': 'BIGINT'},
    ),
    'text_oov_rate_profile': (
        ('source', 'n_tokens', 'n_oov', 'oov_rate'),
        {'n_oov': 'BIGINT'},
    ),
    'text_quality_profile': (
        ('doc_id', 'n_chars', 'n_tokens', 'n_bpe_tokens', 'avg_token_len', 'stopword_ratio', 'lang_pred', 'quality', 'fingerprint'),
        {'n_bpe_tokens': 'INTEGER', 'n_chars': 'INTEGER', 'n_tokens': 'INTEGER'},
    ),
    'text_sentiment_lexicon': (
        ('source', 'n_docs', 'total_pos_hits', 'total_neg_hits', 'mean_polarity', 'subjective_share'),
        {'total_neg_hits': 'BIGINT', 'total_pos_hits': 'BIGINT'},
    ),
    'text_term_burstiness': (
        ('term', 'total', 'n_docs_with', 'burstiness_vmr'),
        {'total': 'BIGINT'},
    ),
    'text_tokenizer_fertility': (
        ('lang', 'n_docs', 'n_bpe_tokens', 'n_words', 'fertility'),
        {'n_bpe_tokens': 'BIGINT', 'n_words': 'BIGINT'},
    ),
    'text_zipf_topk_coverage': (
        ('head_size', 'n_types', 'coverage'),
        {'head_size': 'INTEGER'},
    ),
    'tooling_date_dimension_build': (
        ('n_days', 'n_weekend', 'n_month_ends', 'n_quarters', 'calendar_complete'),
        {'n_month_ends': 'BIGINT', 'n_weekend': 'BIGINT'},
    ),
    'vec_array_algebra': (
        ('vec_id', 'n_dims', 'l2_norm', 'n_positive', 'max_component'),
        {'n_dims': 'INTEGER', 'n_positive': 'INTEGER'},
    ),
    'window_autocorrelation': (
        ('lag_k', 'n_pairs', 'acf'),
        {'lag_k': 'INTEGER'},
    ),
    'window_bollinger_breach': (
        ('yyyymm', 'n_days', 'n_breaches'),
        {'n_breaches': 'BIGINT', 'yyyymm': 'INTEGER'},
    ),
    'window_cohort_ltv_curve': (
        ('cohort_yyyymm', 'age_months', 'n_customers', 'cum_ltv_per_customer'),
        {'age_months': 'INTEGER'},
    ),
    'window_forecast_tracking_signal': (
        ('n_months', 'min_signal', 'max_signal', 'n_bias_alarms', 'mean_signal'),
        {'n_bias_alarms': 'BIGINT'},
    ),
    'window_hampel_despike': (
        ('n_days', 'n_spikes', 'mean_spike_magnitude', 'despiked_mass_ratio'),
        {'n_spikes': 'BIGINT'},
    ),
    'window_mom_growth': (
        ('n_name', 'mkey', 'rev', 'mom_growth'),
        {'mkey': 'INTEGER'},
    ),
    'window_peak_drawdown': (
        ('n_name', 'mkey', 'rev', 'peak', 'drawdown'),
        {'mkey': 'INTEGER'},
    ),
    'window_record_statistics': (
        ('n_months', 'n_records', 'expected_records', 'last_record_month'),
        {'n_records': 'BIGINT'},
    ),
    'window_rolling_correlation': (
        ('yr', 'n_days', 'avg_roll_corr', 'min_roll_corr', 'max_roll_corr'),
        {'yr': 'INTEGER'},
    ),
    'window_seasonal_ratio_to_ma': (
        ('cal_month', 'n_obs', 'seasonal_index'),
        {'cal_month': 'INTEGER'},
    ),
    'window_skyline_pareto_frontier': (
        ('p_brand', 'n_parts', 'n_frontier'),
        {'n_frontier': 'BIGINT'},
    ),
    'window_sla_percentile_trend': (
        ('mon', 'n_orders', 'p50', 'p90', 'p90_trend_per_month'),
        {'p50': 'INTEGER', 'p90': 'INTEGER'},
    ),
    'window_time_weighted_avg': (
        ('n_users', 'avg_twap', 'min_twap', 'max_twap', 'n_segments'),
        {'n_segments': 'BIGINT'},
    ),
    'window_top_customers_per_nation': (
        ('n_name', 'c_name', 'acctbal', 'rk'),
        {'rk': 'INTEGER'},
    ),
    'window_turning_points_test': (
        ('n_months', 'n_turning_points', 'expected', 'z_stat'),
        {'n_turning_points': 'BIGINT'},
    ),
    'window_yoy_same_month': (
        ('yr', 'mth', 'revenue', 'yoy_ratio'),
        {'mth': 'INTEGER', 'yr': 'INTEGER'},
    ),
}
