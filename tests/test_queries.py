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
    for must in ("pq_recall_at_k", "ivf_topk_search",
                 "embedding_health_report",
                 "hybrid_rrf_topk", "semantic_dedup_summary",
                 "benchmark_contamination_report", "sequence_packing",
                 "asof_next_purchase_gap", "cube_status_priority",
                 "pivot_lang_source_counts", "unimax_lang_allocation",
                 "bpe_merge_candidates", "daily_event_drift",
                 "resized_media_stats", "mixing_weights_by_source"):
        assert must in DRIVER_PRIORITY, must
    # everything outside the window keeps an in-window family sibling
    siblings = {
        # outside since round 1, witnessed via their anchor
        "profile_stats_strings": "profile_type_candidates",
        "profile_quartiles_strings": "profile_type_candidates",
        "dedup_exact_props": "span_dup_coverage",
        "minhash_signatures": "span_dup_coverage",
        "asof_purchase_click": "asof_next_purchase_gap",
        "rollup_nation_year": "cube_status_priority",
        "cosine_topk_vectorized": "hybrid_rrf_topk",
        "sample_docs_deterministic": "unimax_lang_allocation",
        "stratified_sample_by_lang": "unimax_lang_allocation",
        "cap_docs_per_lang": "unimax_lang_allocation",
        "token_length_histogram": "kn_bigram_nll",
        "label_centroids": "semantic_dedup_summary",
        "filter_training_corpus": "corpus_filter_report",
        "skewed_event_agg": "daily_event_drift",
        "ivf_assignment_counts": "ivf_topk_search",
        "repetition_signals": "corpus_filter_report",
        "passage_dedup_summary": "span_dup_coverage",
        "vocab_top20": "kn_bigram_nll",
        # rotated OUT in round 5 (driver-green in rounds 1-4)
        "q5_nation_revenue": "asof_next_purchase_gap",
        "top_orders_per_customer": "asof_next_purchase_gap",
        "datetime_parse_formats": "profile_type_candidates",
        "profile_freq_topk": "profile_type_candidates",
        "windowed_event_stats": "daily_event_drift",
        "ngram_jaccard_pairs": "span_dup_coverage",
        "near_dup_groups": "span_dup_coverage",
        "dedup_corpus_keep": "span_dup_coverage",
        "token_stats_by_lang": "kn_bigram_nll",
        "text_quality_features": "normalized_text_stats",
        "rare_token_stats": "kn_bigram_nll",
        "doc_fingerprints": "kn_bigram_nll",
        "mixed_resample_counts": "mixing_weights_by_source",
        "pq_adc_topk": "pq_recall_at_k",
        "int8_topk_search": "embedding_health_report",
        "embedding_neardup_pairs": "hybrid_rrf_topk",
        "image_header_metadata": "resized_media_stats",
        "multimodal_doc_features": "resized_media_stats",
        "decoded_media_stats": "resized_media_stats",
        "json_props_stats": "profile_type_candidates",
        "split_counts_by_lang": "unimax_lang_allocation",
        # rotated OUT in round 6 (driver-green in rounds 1-5) to make
        # room for the 13 round-5 newcomers
        "customers_without_bigorder": "asof_next_purchase_gap",
        "user_event_gaps": "daily_event_drift",
        "profile_char_classes": "profile_type_candidates",
        "group_quantiles_exact": "profile_type_candidates",
        "range_join_purchase_views": "asof_next_purchase_gap",
        "trailing_window_avg": "daily_event_drift",
        "value_outliers_by_type": "daily_event_drift",
        "simhash_values": "span_dup_coverage",
        "url_dedup_stats": "span_dup_coverage",
        "domain_stats": "normalized_text_stats",
        "hashed_doc_vectors": "kn_bigram_nll",
        "unigram_nll": "kn_bigram_nll",
        "pii_scan": "c4_rule_flags",
        # rotated OUT in round 7 (driver-green in rounds 1-6) to make
        # room for the 8 round-6 newcomers + the round-7 C4/Gopher
        # line-rule pair
        "sessionize_events": "daily_event_drift",
        "lsh_recall": "span_dup_coverage",
        "incremental_dedup_verdicts": "span_dup_coverage",
        "span_dedup_texts": "span_dup_coverage",
        "incremental_span_hits": "span_dup_coverage",
        "dedup_keep_best": "span_dup_coverage",
        "nb_lang_confusion": "normalized_text_stats",
        "reflm_nll": "kn_bigram_nll",
        "dsir_resample_topk": "unimax_lang_allocation",
        "video_header_metadata": "resized_media_stats",
        "window_chunks": "sequence_packing",
        "source_token_jsd": "daily_event_drift",
        "shuffle_order_coords": "unimax_lang_allocation",
        # rotated OUT in round 8 (driver-green in rounds 1-7) to make
        # room for the 7 round-7 newcomers
        "q1_pricing_summary": "asof_next_purchase_gap",
        "winnow_overlap_pairs": "span_dup_coverage",
        "scrub_eval_spans": "benchmark_contamination_report",
        "fuzzy_contamination_pairs": "benchmark_contamination_report",
        "source_curation_report": "corpus_filter_report",
        "source_curation_report_v2": "corpus_filter_report",
        "diverse_sample_by_cluster": "unimax_lang_allocation",
        "gopher_dup_fractions": "gopher_quality_flags",
        "repetition_ngram_profile": "gopher_quality_flags",
        "ccnet_perplexity_buckets": "kn_bigram_nll",
        "image_dhash_values": "image_dup_groups",
        # rotated OUT late in round 8 (driver-green in rounds 1-7) to
        # put the round-8 newcomers (bloom gate, token entropy, host
        # pagerank, tokenizer fertility, OOV curve, UniMax, CMS,
        # split leakage) into the round-8 correctness window
        "profile_stats_numeric": "profile_type_candidates",
        "minhash_band_buckets": "span_dup_coverage",
        "bigram_nll": "kn_bigram_nll",
        "cosine_topk": "hybrid_rrf_topk",
        "audio_header_metadata": "resized_media_stats",
        "decompressed_text_stats": "resized_media_stats",
        "html_extracted_text": "c4_rule_flags",
        "contamination_check": "benchmark_contamination_report",
        # rotated OUT in round 9 (driver-green in rounds 1-8) to make
        # room for the 5 late round-8 newcomers (pHash, ZCR, sentence
        # chunking, zipf fit, Flesch)
        "profile_quartiles": "profile_type_candidates",
        "dedup_exact_groups": "span_dup_coverage",
        "lang_id_confusion": "normalized_text_stats",
        "tfidf_top_terms": "kn_bigram_nll",
        "sliding_event_stats": "daily_event_drift",
        # rotated OUT late in round 9 (driver-green in rounds 1-8) to
        # put the round-9 newcomers (unigram tokenizer, longest-dup
        # span ladder, audio spectral screen, host_policy_v2) into
        # the round-9 correctness window
        "q3_top_orders": "asof_next_purchase_gap",
        "containment_pairs": "span_dup_coverage",
        "training_manifest": "corpus_filter_report",
        "dsir_logweights": "unimax_lang_allocation",
        # rotated OUT in round 10 (every one green in its last
        # driver check) to put the 14 never-driver-checked round-9
        # registrations into the round-10 correctness window
        "curriculum_shard_stats": "unimax_lang_allocation",
        "variant_props_stats": "corpus_filter_report",
        "corpus_version_diff": "split_leakage_report",
        "host_curation_report": "host_policy_v2",
        "host_policy_filter": "host_policy_v2",
        "pq_codes": "pq_recall_at_k",
        "embedding_quantization": "embedding_health_report",
        "audio_envelope_hashes": "audio_spectral_features",
        "audio_dup_groups": "image_dup_groups",
        "image_exif_metadata": "resized_media_stats",
        "image_phash_values": "image_dup_groups",
        "audio_zcr_features": "audio_spectral_features",
        "audio_dedup_keep": "image_dedup_keep",
        "c4_line_clean": "c4_rule_flags",
        # rotated OUT late in round 10 (green in round 9; in-window
        # family siblings) to put the round-10 registrations (PDF,
        # MJPEG dedup, MFCC) into the round-10 correctness window
        "zipf_vocab_fit": "token_entropy_stats",
        "flesch_readability": "sentence_chunk_index",
        "oov_rate_by_vocab_size": "tokenizer_fertility_by_lang",
        # rotated OUT in round 11 (every one green in its round-10
        # driver check) to put the 12 never-driver-checked round-10
        # registrations into the round-11 correctness window
        "audio_clipping_stats": "audio_spectral_features",
        "dup_cluster_histogram": "span_dup_coverage",
        "encoding_quality_report": "normalized_text_stats",
        "heaps_vocab_growth": "token_entropy_stats",
        "host_hits_scores": "host_pagerank",
        "image_entropy_stats": "image_dup_groups",
        "ivf_recall_at_k": "ivf_topk_search",
        "quality_gopher_calibration": "gopher_quality_flags",
        "source_vocab_overlap": "split_leakage_report",
        "unigram_encode_fertility": "unigram_tokenizer_vocab",
        "video_frame_index": "video_dup_groups",
        "wordpiece_merge_candidates": "bpe_merge_candidates",
        # registered in round 11, awaiting the round-12 rotation
        "epub_extracted_text": "office_extracted_text",
        "pptx_extracted_text": "office_extracted_text",
        "xlsx_extracted_text": "office_extracted_text",
        "quality_classifier_scores": "mixing_weights_by_source",
        "audio_vad_segments": "audio_mfcc_features",
        "code_quality_flags": "c4_rule_flags",
        "pii_card_scan": "c4_rule_flags",
        "latex_extracted_text": "markdown_extracted_text",
        "bm25_topk": "hybrid_rrf_topk",
        "video_scene_cuts": "video_dup_groups",
        "html_link_extract": "markdown_extracted_text",
        "host_boilerplate_clean": "host_policy_v2",
        "robots_policy_check": "c4_rule_flags",
        "hard_negative_topk": "hybrid_rrf_topk",
        "mojibake_repair": "normalized_text_stats",
        "alpha_lang_weights": "unimax_lang_allocation",
        "audio_resample": "audio_mfcc_features",
        "sentence_align_beads": "sentence_chunk_index",
        "pii_iban_scan": "c4_rule_flags",
        "anchor_text_profile": "host_policy_v2",
        "compat_normalized_text": "normalized_text_stats",
        "adaptive_length_gate": "gopher_quality_flags",
        "zorder_layout_keys": "daily_event_drift",
    }
    outside = set(names[50:])
    assert outside == set(siblings), \
        f"unexpected outside-window set: {outside ^ set(siblings)}"
    for out_name, sib in siblings.items():
        assert sib in DRIVER_PRIORITY, (out_name, sib)
