"""Cross-engine parity harness: runs every registered query on Spark
AND its DuckDB oracle, then compares row count, column names, and an
order-insensitive value hash — the driver's correctness gate, locally.
"""

import hashlib
import math

import pandas as pd
import pytest

from tests.conftest import SF_CORRECT


def _canon(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        col = df[c]
        if pd.api.types.is_float_dtype(col):
            # + 0.0 folds IEEE -0.0 (a summation-residue sign, not a
            # value difference) into +0.0 before stringifying
            df[c] = col.round(9) + 0.0
        elif pd.api.types.is_datetime64_any_dtype(col):
            df[c] = col.astype("datetime64[us]").astype(str)
    rows = sorted(
        tuple(str(v) for v in row) for row in df.itertuples(index=False))
    return hashlib.md5(repr(rows).encode()).hexdigest()


def _pairs():
    from structa_spark.queries import REGISTRY
    return [(name, fn, sql) for name, (fn, sql) in REGISTRY.items()
            if sql is not None]


@pytest.mark.parametrize("name,fn,sql",
                         _pairs(), ids=[p[0] for p in _pairs()])
def test_query_matches_oracle(spark, duck, name, fn, sql):
    sdf = fn(spark, SF_CORRECT).toPandas()
    ddf = duck.execute(sql).df()
    assert list(sorted(sdf.columns)) == list(sorted(ddf.columns)), \
        f"{name}: column mismatch {sorted(sdf.columns)} vs {sorted(ddf.columns)}"
    assert len(sdf) == len(ddf), \
        f"{name}: row count {len(sdf)} vs {len(ddf)}"
    h1, h2 = _canon(sdf), _canon(ddf)
    if h1 != h2:
        merged = sdf.merge(ddf, how="outer", indicator=True,
                           on=None)
        diff = merged[merged["_merge"] != "both"]
        raise AssertionError(
            f"{name}: value hash mismatch\nspark:\n{sdf.head(10)}\n"
            f"duckdb:\n{ddf.head(10)}\ndiff sample:\n{diff.head(10)}")


SF_SCALE = "/root/testdata/sf0.1"

# representative scale-critical queries re-checked at 100x the local
# parity tier (10x the driver's correctness tier): the hash compare
# is identical — only the data volume changes, so a bug that needs
# volume to show (bucket caps, skew paths, agg overflow) surfaces
SCALE_SPOT = ["q1_pricing_summary", "dedup_exact_groups",
              "span_dup_coverage", "minhash_band_buckets",
              "bigram_nll", "kn_bigram_nll", "gopher_quality_flags",
              "scrub_eval_spans",
              # round-8 window newcomers whose semantics depend on
              # volume (bitset load, sketch collisions, vocab head,
              # water level, graph edges)
              "bloom_contamination_flags", "cms_heavy_hitters",
              "host_pagerank", "unimax_lang_allocation",
              "oov_rate_by_vocab_size",
              # round-9 newcomers whose semantics depend on volume
              # (dup-run lengths per tier, the capped word list and
              # seed competition, the rank/keep-rate interplay)
              "longest_dup_span_report", "unigram_tokenizer_vocab",
              "host_policy_v2", "unigram_encode_fertility",
              "quality_gopher_calibration",
              # late round-9 newcomers whose semantics depend on
              # volume (L1-norm drift across a denser graph, the
              # vocabulary-weighted pair/symbol counts, cumulative
              # frame offsets over longer streams)
              "host_hits_scores", "wordpiece_merge_candidates",
              "video_frame_index", "source_vocab_overlap"]


@pytest.fixture(scope="module")
def duck01():
    import duckdb
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents",
              "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"'{SF_SCALE}/{t}.parquet'")
    return con


@pytest.mark.parametrize("name", SCALE_SPOT)
def test_query_matches_oracle_sf01(spark, duck01, name):
    from structa_spark.queries import REGISTRY
    fn, sql = REGISTRY[name]
    sdf = fn(spark, SF_SCALE).toPandas()
    ddf = duck01.execute(sql).df()
    assert len(sdf) == len(ddf), f"{name}: {len(sdf)} vs {len(ddf)}"
    assert _canon(sdf) == _canon(ddf), f"{name}: value hash mismatch"


def test_driver_window_covers_every_family():
    """The round driver records correctness rows for the first 50
    entries of queries() only — pin that the window is exactly the
    curated DRIVER_PRIORITY list, that every window query has an
    oracle, and that nothing falls out of the registry."""
    from structa_spark.queries import (
        DRIVER_PRIORITY, REGISTRY, oracle_sql, queries)
    names = list(queries())
    assert names[:50] == DRIVER_PRIORITY
    assert set(names) == set(REGISTRY)
    o = oracle_sql()
    assert all(n in o for n in DRIVER_PRIORITY), \
        "every driver-window query must be hash-checkable"
    # one representative per family the judge checks explicitly
    for must in ("profile_type_candidates",
                 "asof_next_purchase_gap",
                 "cube_status_priority",
                 "pivot_lang_source_counts",
                 "daily_event_drift",
                 "span_dup_coverage",
                 "benchmark_contamination_report",
                 "bpe_merge_candidates",
                 "sequence_packing",
                 "gopher_quality_flags",
                 "host_policy_v2",
                 "unimax_lang_allocation",
                 "mixing_weights_by_source",
                 "hybrid_rrf_topk",
                 "resized_media_stats",):
        assert must in DRIVER_PRIORITY, must
    # everything outside the window keeps an in-window family sibling
    siblings = {
        # Round-12 rotation: the window holds the 10 never-driver-
        # checked round-11 registrations, the optimization-touched
        # paths (similarity verdicts, graph iterations, LM model
        # joins, profiler family) and the stalest round-3-green
        # queries, plus the 15 family anchors; every rotated-out
        # query below was driver-green in a previous window
        # (CORRECTNESS_r1-r11) and stays hash-pinned against its
        # DuckDB oracle by test_query_matches_oracle every run.
        # witnessed via asof_next_purchase_gap
        "asof_purchase_click": "asof_next_purchase_gap",
        "customers_without_bigorder": "asof_next_purchase_gap",
        "q1_pricing_summary": "asof_next_purchase_gap",
        "q3_top_orders": "asof_next_purchase_gap",
        "q5_nation_revenue": "asof_next_purchase_gap",
        "range_join_purchase_views": "asof_next_purchase_gap",
        "top_orders_per_customer": "asof_next_purchase_gap",
        # witnessed via audio_mfcc_features
        "audio_clipping_stats": "audio_mfcc_features",
        "audio_envelope_hashes": "audio_mfcc_features",
        "audio_resample": "audio_mfcc_features",
        "audio_spectral_features": "audio_mfcc_features",
        "audio_vad_segments": "audio_mfcc_features",
        "audio_zcr_features": "audio_mfcc_features",
        # witnessed via benchmark_contamination_report
        "bloom_contamination_flags": "benchmark_contamination_report",
        "contamination_check": "benchmark_contamination_report",
        "corpus_version_diff": "benchmark_contamination_report",
        "fuzzy_contamination_pairs": "benchmark_contamination_report",
        "scrub_eval_spans": "benchmark_contamination_report",
        "source_vocab_overlap": "benchmark_contamination_report",
        "split_leakage_report": "benchmark_contamination_report",
        # witnessed via bigram_nll
        "doc_fingerprints": "bigram_nll",
        "hashed_doc_vectors": "bigram_nll",
        "quality_classifier_scores": "bigram_nll",
        "rare_token_stats": "bigram_nll",
        "tfidf_top_terms": "bigram_nll",
        "token_length_histogram": "bigram_nll",
        "token_stats_by_lang": "bigram_nll",
        "unigram_nll": "bigram_nll",
        "vocab_top20": "bigram_nll",
        # witnessed via bpe_merge_candidates
        "oov_rate_by_vocab_size": "bpe_merge_candidates",
        "tokenizer_fertility_by_lang": "bpe_merge_candidates",
        "unigram_encode_fertility": "bpe_merge_candidates",
        "unigram_tokenizer_vocab": "bpe_merge_candidates",
        "wordpiece_merge_candidates": "bpe_merge_candidates",
        # witnessed via chat_template_render
        "flesch_readability": "chat_template_render",
        "sentence_align_beads": "chat_template_render",
        "sentence_chunk_index": "chat_template_render",
        # witnessed via code_license_screen
        "blocklist_screen": "code_license_screen",
        "code_quality_flags": "code_license_screen",
        "pii_card_scan": "code_license_screen",
        "pii_iban_scan": "code_license_screen",
        # witnessed via confusable_spoof_screen
        "compat_normalized_text": "confusable_spoof_screen",
        "domain_stats": "confusable_spoof_screen",
        "encoding_quality_report": "confusable_spoof_screen",
        "lang_id_confusion": "confusable_spoof_screen",
        "mojibake_repair": "confusable_spoof_screen",
        "nb_lang_confusion": "confusable_spoof_screen",
        "normalized_text_stats": "confusable_spoof_screen",
        "text_quality_features": "confusable_spoof_screen",
        # witnessed via cosine_topk_vectorized
        "bitext_margin_pairs": "cosine_topk_vectorized",
        "cosine_topk": "cosine_topk_vectorized",
        "ivf_recall_at_k": "cosine_topk_vectorized",
        # witnessed via cube_status_priority
        "rollup_nation_year": "cube_status_priority",
        # witnessed via daily_event_drift
        "sessionize_events": "daily_event_drift",
        "skewed_event_agg": "daily_event_drift",
        "sliding_event_stats": "daily_event_drift",
        "source_token_jsd": "daily_event_drift",
        "trailing_window_avg": "daily_event_drift",
        "user_event_gaps": "daily_event_drift",
        "value_outliers_by_type": "daily_event_drift",
        "windowed_event_stats": "daily_event_drift",
        # witnessed via dedup_exact_props
        "containment_pairs": "dedup_exact_props",
        "dedup_corpus_keep": "dedup_exact_props",
        "dedup_exact_groups": "dedup_exact_props",
        "dedup_keep_best": "dedup_exact_props",
        "dup_cluster_histogram": "dedup_exact_props",
        "incremental_dedup_verdicts": "dedup_exact_props",
        "incremental_span_hits": "dedup_exact_props",
        "longest_dup_span_report": "dedup_exact_props",
        "lsh_recall": "dedup_exact_props",
        "minhash_band_buckets": "dedup_exact_props",
        "near_dup_groups": "dedup_exact_props",
        "ngram_jaccard_pairs": "dedup_exact_props",
        "passage_dedup_summary": "dedup_exact_props",
        "simhash_values": "dedup_exact_props",
        "span_dedup_texts": "dedup_exact_props",
        "url_dedup_stats": "dedup_exact_props",
        "winnow_overlap_pairs": "dedup_exact_props",
        # witnessed via gopher_quality_flags
        "c4_line_clean": "gopher_quality_flags",
        "c4_rule_flags": "gopher_quality_flags",
        "corpus_filter_report": "gopher_quality_flags",
        "filter_training_corpus": "gopher_quality_flags",
        "gopher_dup_fractions": "gopher_quality_flags",
        "html_extracted_text": "gopher_quality_flags",
        "pii_scan": "gopher_quality_flags",
        "quality_gopher_calibration": "gopher_quality_flags",
        "repetition_ngram_profile": "gopher_quality_flags",
        "repetition_signals": "gopher_quality_flags",
        "source_curation_report": "gopher_quality_flags",
        "source_curation_report_v2": "gopher_quality_flags",
        "training_manifest": "gopher_quality_flags",
        "variant_props_stats": "gopher_quality_flags",
        # witnessed via host_hits_scores
        "host_curation_report": "host_hits_scores",
        "host_policy_filter": "host_hits_scores",
        # witnessed via host_pagerank
        "anchor_text_profile": "host_pagerank",
        "html_link_extract": "host_pagerank",
        # witnessed via host_policy_v2
        "host_boilerplate_clean": "host_policy_v2",
        "robots_policy_check": "host_policy_v2",
        # witnessed via html_table_extract
        "markdown_extracted_text": "html_table_extract",
        # witnessed via hybrid_rrf_topk
        "bm25_topk": "hybrid_rrf_topk",
        "hard_negative_topk": "hybrid_rrf_topk",
        # witnessed via image_dedup_keep
        "audio_dedup_keep": "image_dedup_keep",
        "video_dedup_keep": "image_dedup_keep",
        "video_dup_groups": "image_dedup_keep",
        "video_frame_index": "image_dedup_keep",
        # witnessed via image_dup_groups
        "audio_dup_groups": "image_dup_groups",
        "image_dhash_values": "image_dup_groups",
        "image_entropy_stats": "image_dup_groups",
        "image_phash_values": "image_dup_groups",
        "jpeg_quality_screen": "image_dup_groups",
        # witnessed via kmeans_cluster_profile
        "embedding_health_report": "kmeans_cluster_profile",
        "embedding_quantization": "kmeans_cluster_profile",
        "int8_topk_search": "kmeans_cluster_profile",
        "matryoshka_recall_at_k": "kmeans_cluster_profile",
        "pq_adc_topk": "kmeans_cluster_profile",
        "pq_codes": "kmeans_cluster_profile",
        # witnessed via length_bucket_batches
        "adaptive_length_gate": "length_bucket_batches",
        "window_chunks": "length_bucket_batches",
        # witnessed via mixing_weights_by_source
        "cms_heavy_hitters": "mixing_weights_by_source",
        "doremi_domain_weights": "mixing_weights_by_source",
        "mixed_resample_counts": "mixing_weights_by_source",
        # witnessed via pdf_extracted_text
        "docx_extracted_text": "pdf_extracted_text",
        "epub_extracted_text": "pdf_extracted_text",
        "latex_extracted_text": "pdf_extracted_text",
        "office_extracted_text": "pdf_extracted_text",
        "pdf_metadata": "pdf_extracted_text",
        "pptx_extracted_text": "pdf_extracted_text",
        "xlsx_extracted_text": "pdf_extracted_text",
        # witnessed via profile_char_classes
        "datetime_parse_formats": "profile_char_classes",
        "group_quantiles_exact": "profile_char_classes",
        "json_props_stats": "profile_char_classes",
        "profile_quartiles": "profile_char_classes",
        "profile_stats_numeric": "profile_char_classes",
        # witnessed via resized_media_stats
        "audio_header_metadata": "resized_media_stats",
        "decoded_media_stats": "resized_media_stats",
        "decompressed_text_stats": "resized_media_stats",
        "image_exif_metadata": "resized_media_stats",
        "image_header_metadata": "resized_media_stats",
        "multimodal_doc_features": "resized_media_stats",
        "video_header_metadata": "resized_media_stats",
        "video_scene_cuts": "resized_media_stats",
        # witnessed via sample_docs_deterministic
        "cap_docs_per_lang": "sample_docs_deterministic",
        "curriculum_shard_stats": "sample_docs_deterministic",
        "diverse_sample_by_cluster": "sample_docs_deterministic",
        "dsir_logweights": "sample_docs_deterministic",
        "dsir_resample_topk": "sample_docs_deterministic",
        "shuffle_order_coords": "sample_docs_deterministic",
        "split_counts_by_lang": "sample_docs_deterministic",
        "stratified_sample_by_lang": "sample_docs_deterministic",
        # witnessed via sequence_packing
        "fim_split_coords": "sequence_packing",
        "zorder_layout_keys": "sequence_packing",
        # witnessed via token_entropy_stats
        "compression_ratio_screen": "token_entropy_stats",
        "heaps_vocab_growth": "token_entropy_stats",
        "zipf_vocab_fit": "token_entropy_stats",
        # witnessed via weighted_sample_by_source
        "alpha_lang_weights": "weighted_sample_by_source",
    }
    outside = set(names[50:])
    assert outside == set(siblings), \
        f"unexpected outside-window set: {outside ^ set(siblings)}"
    for out_name, sib in siblings.items():
        assert sib in DRIVER_PRIORITY, (out_name, sib)
