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
        # Round-11 full rotation: the window holds every query that
        # had never been driver-checked (35) plus 15 family anchors;
        # every rotated-out query below was driver-green in its last
        # window (CORRECTNESS_r1-r10) and stays hash-pinned against
        # its DuckDB oracle by test_query_matches_oracle every run.
        # registered after the round-11 rotation froze, awaiting the
        # round-12 window
        "ipynb_extracted_cells": "markdown_extracted_text",
        "subtitle_extracted_cues": "markdown_extracted_text",
        "code_license_screen": "code_quality_flags",
        "preference_pairs": "quality_classifier_scores",
        "chat_template_render": "sentence_align_beads",
        "kmeans_cluster_profile": "matryoshka_recall_at_k",
        "weighted_sample_by_source": "alpha_lang_weights",
        "length_bucket_batches": "sequence_packing",
        "confusable_spoof_screen": "compat_normalized_text",
        "html_table_extract": "markdown_extracted_text",
        # witnessed via asof_next_purchase_gap
        "asof_purchase_click": "asof_next_purchase_gap",
        "customers_without_bigorder": "asof_next_purchase_gap",
        "q1_pricing_summary": "asof_next_purchase_gap",
        "q3_top_orders": "asof_next_purchase_gap",
        "q5_nation_revenue": "asof_next_purchase_gap",
        "range_join_purchase_views": "asof_next_purchase_gap",
        "top_orders_per_customer": "asof_next_purchase_gap",
        # witnessed via audio_vad_segments
        "audio_clipping_stats": "audio_vad_segments",
        "audio_envelope_hashes": "audio_vad_segments",
        "audio_mfcc_features": "audio_vad_segments",
        "audio_spectral_features": "audio_vad_segments",
        "audio_zcr_features": "audio_vad_segments",
        # witnessed via benchmark_contamination_report
        "bloom_contamination_flags": "benchmark_contamination_report",
        "contamination_check": "benchmark_contamination_report",
        "corpus_version_diff": "benchmark_contamination_report",
        "fuzzy_contamination_pairs": "benchmark_contamination_report",
        "scrub_eval_spans": "benchmark_contamination_report",
        "source_vocab_overlap": "benchmark_contamination_report",
        "split_leakage_report": "benchmark_contamination_report",
        # witnessed via bpe_merge_candidates
        "oov_rate_by_vocab_size": "bpe_merge_candidates",
        "tokenizer_fertility_by_lang": "bpe_merge_candidates",
        "unigram_encode_fertility": "bpe_merge_candidates",
        "unigram_tokenizer_vocab": "bpe_merge_candidates",
        "wordpiece_merge_candidates": "bpe_merge_candidates",
        # witnessed via compat_normalized_text
        "domain_stats": "compat_normalized_text",
        "encoding_quality_report": "compat_normalized_text",
        "lang_id_confusion": "compat_normalized_text",
        "nb_lang_confusion": "compat_normalized_text",
        "normalized_text_stats": "compat_normalized_text",
        "text_quality_features": "compat_normalized_text",
        # witnessed via compression_ratio_screen
        "heaps_vocab_growth": "compression_ratio_screen",
        "token_entropy_stats": "compression_ratio_screen",
        "zipf_vocab_fit": "compression_ratio_screen",
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
        # witnessed via host_policy_v2
        "host_curation_report": "host_policy_v2",
        "host_hits_scores": "host_policy_v2",
        "host_pagerank": "host_policy_v2",
        "host_policy_filter": "host_policy_v2",
        # witnessed via hybrid_rrf_topk
        "cosine_topk": "hybrid_rrf_topk",
        "cosine_topk_vectorized": "hybrid_rrf_topk",
        "embedding_neardup_pairs": "hybrid_rrf_topk",
        "ivf_assignment_counts": "hybrid_rrf_topk",
        "ivf_recall_at_k": "hybrid_rrf_topk",
        "ivf_topk_search": "hybrid_rrf_topk",
        "label_centroids": "hybrid_rrf_topk",
        "semantic_dedup_summary": "hybrid_rrf_topk",
        # witnessed via jpeg_quality_screen
        "audio_dup_groups": "jpeg_quality_screen",
        "image_dhash_values": "jpeg_quality_screen",
        "image_dup_groups": "jpeg_quality_screen",
        "image_entropy_stats": "jpeg_quality_screen",
        "image_phash_values": "jpeg_quality_screen",
        # witnessed via matryoshka_recall_at_k
        "embedding_health_report": "matryoshka_recall_at_k",
        "embedding_quantization": "matryoshka_recall_at_k",
        "int8_topk_search": "matryoshka_recall_at_k",
        "pq_adc_topk": "matryoshka_recall_at_k",
        "pq_codes": "matryoshka_recall_at_k",
        "pq_recall_at_k": "matryoshka_recall_at_k",
        # witnessed via mixing_weights_by_source
        "cms_heavy_hitters": "mixing_weights_by_source",
        "mixed_resample_counts": "mixing_weights_by_source",
        # witnessed via pdf_metadata
        "pdf_extracted_text": "pdf_metadata",
        # witnessed via profile_type_candidates
        "datetime_parse_formats": "profile_type_candidates",
        "group_quantiles_exact": "profile_type_candidates",
        "json_props_stats": "profile_type_candidates",
        "profile_char_classes": "profile_type_candidates",
        "profile_freq_topk": "profile_type_candidates",
        "profile_quartiles": "profile_type_candidates",
        "profile_quartiles_strings": "profile_type_candidates",
        "profile_stats_numeric": "profile_type_candidates",
        "profile_stats_strings": "profile_type_candidates",
        # witnessed via quality_classifier_scores
        "bigram_nll": "quality_classifier_scores",
        "ccnet_perplexity_buckets": "quality_classifier_scores",
        "doc_fingerprints": "quality_classifier_scores",
        "hashed_doc_vectors": "quality_classifier_scores",
        "kn_bigram_nll": "quality_classifier_scores",
        "rare_token_stats": "quality_classifier_scores",
        "reflm_nll": "quality_classifier_scores",
        "tfidf_top_terms": "quality_classifier_scores",
        "token_length_histogram": "quality_classifier_scores",
        "token_stats_by_lang": "quality_classifier_scores",
        "unigram_nll": "quality_classifier_scores",
        "vocab_top20": "quality_classifier_scores",
        # witnessed via resized_media_stats
        "audio_header_metadata": "resized_media_stats",
        "decoded_media_stats": "resized_media_stats",
        "decompressed_text_stats": "resized_media_stats",
        "image_exif_metadata": "resized_media_stats",
        "image_header_metadata": "resized_media_stats",
        "multimodal_doc_features": "resized_media_stats",
        "video_header_metadata": "resized_media_stats",
        # witnessed via sentence_align_beads
        "flesch_readability": "sentence_align_beads",
        "sentence_chunk_index": "sentence_align_beads",
        # witnessed via sequence_packing
        "window_chunks": "sequence_packing",
        # witnessed via span_dup_coverage
        "containment_pairs": "span_dup_coverage",
        "dedup_corpus_keep": "span_dup_coverage",
        "dedup_exact_groups": "span_dup_coverage",
        "dedup_exact_props": "span_dup_coverage",
        "dedup_keep_best": "span_dup_coverage",
        "dup_cluster_histogram": "span_dup_coverage",
        "incremental_dedup_verdicts": "span_dup_coverage",
        "incremental_span_hits": "span_dup_coverage",
        "longest_dup_span_report": "span_dup_coverage",
        "lsh_recall": "span_dup_coverage",
        "minhash_band_buckets": "span_dup_coverage",
        "minhash_signatures": "span_dup_coverage",
        "near_dup_groups": "span_dup_coverage",
        "ngram_jaccard_pairs": "span_dup_coverage",
        "passage_dedup_summary": "span_dup_coverage",
        "simhash_values": "span_dup_coverage",
        "span_dedup_texts": "span_dup_coverage",
        "url_dedup_stats": "span_dup_coverage",
        "winnow_overlap_pairs": "span_dup_coverage",
        # witnessed via unimax_lang_allocation
        "cap_docs_per_lang": "unimax_lang_allocation",
        "curriculum_shard_stats": "unimax_lang_allocation",
        "diverse_sample_by_cluster": "unimax_lang_allocation",
        "dsir_logweights": "unimax_lang_allocation",
        "dsir_resample_topk": "unimax_lang_allocation",
        "sample_docs_deterministic": "unimax_lang_allocation",
        "shuffle_order_coords": "unimax_lang_allocation",
        "split_counts_by_lang": "unimax_lang_allocation",
        "stratified_sample_by_lang": "unimax_lang_allocation",
        # witnessed via video_dedup_keep
        "audio_dedup_keep": "video_dedup_keep",
        "image_dedup_keep": "video_dedup_keep",
        "video_dup_groups": "video_dedup_keep",
        "video_frame_index": "video_dedup_keep",
    }
    outside = set(names[50:])
    assert outside == set(siblings), \
        f"unexpected outside-window set: {outside ^ set(siblings)}"
    for out_name, sib in siblings.items():
        assert sib in DRIVER_PRIORITY, (out_name, sib)
