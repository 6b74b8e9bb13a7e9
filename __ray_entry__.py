"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; nothing
here (or in lucene_ray) calls ray.init()/ray.shutdown().

- ``entry()``: flagship pipeline on sf0.001 — build the inverted index from
  the documents-derived corpus and run the reference BM25 query set through
  the block-max searcher actor pool.
- ``queries()``: one entry per implemented operator/pipeline (SURVEY.md §2
  + the §8 round-2/3/4 additions; 164 entries).
- ``oracle_sql()``: DuckDB-equivalent SQL per query (149 of 164). Omitted
  only for ops SQL cannot express (those get the rows-only check, each
  with a stated reason): ``media_features`` / ``video_frame_sample`` / ``audio_features``
  (binary codec decode / frame seek / spectral transform),
  ``bpe_train`` / ``bpe_token_count`` (iterative merge learning; the
  merge sequence is pytest-pinned to the published Sennrich example),
  ``doc_fingerprint`` / ``dedup_simhash`` / ``dedup_simhash_pairs`` /
  ``dedup_minhash_lsh`` (blake2b-seeded signatures),
  ``embedding_neardup_lsh`` / ``ann_pq_topk`` / ``ann_ivfpq_topk``
  (approximate by design;
  recall floors asserted in pytest), ``ft_profile`` (engine-internal
  execution counters; invariants pytest-pinned), ``graph_pagerank``
  (iterative float fixpoint — summation order is engine-dependent
  below the last ulp; invariants pytest-pinned), ``ft_stemmed_search`` (DuckDB has no offline stemmer; the
  Porter chain is pytest-golden and its stop/length half has the exact
  ``ft_english_doclen`` oracle).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    from lucene_ray.pipelines import fulltext

    return fulltext.ft_bm25_scores("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from lucene_ray.pipelines import fulltext as ft

    # The driver verifies a rotation of ~50 entries per round in dict
    # order.  Entries that do not yet have a driver-green CORRECTNESS row
    # enumerate FIRST so the rotation reaches them (VERDICT r3 item 1;
    # r4 item 2: the 44 entries below — 2 fixed r4 hash-fails + the 42
    # never-driver-checked — fill the r5 rotation, oracle-backed first,
    # rows-only last).
    from lucene_ray.pipelines import hybrid as _hy

    def _lazy(mod: str, fn: str):
        def run(sf_dir: str):
            m = __import__(f"lucene_ray.pipelines.{mod}", fromlist=[mod])
            return getattr(m, fn)(sf_dir)
        return run

    q: dict[str, Callable[[str], Any]] = {
        # --- r4 hash-fails, fixed by oracle ::BIGINT casts (VERDICT r4
        # item 1); values were already bit-exact ---
        "text_repetition": _lazy("textstats", "text_repetition"),
        "ft_highlight_passages": ft.ft_highlight_passages,
        # --- oracle-backed entries never reached by a driver rotation ---
        "ft_sweetspot": ft.ft_sweetspot,
        "ft_common_terms": ft.ft_common_terms,
        "ft_phonetic": ft.ft_phonetic,
        "ft_multi_range": ft.ft_multi_range,
        "ft_dv_stats": ft.ft_dv_stats,
        "events_asof_join": _lazy("temporal", "events_asof_join"),
        "events_lag_delta": _lazy("temporal", "events_lag_delta"),
        "join_range_orders": _lazy("temporal", "join_range_orders"),
        "doc_ppl_buckets": _lazy("textstats", "doc_ppl_buckets"),
        "dsir_importance": _lazy("textstats", "dsir_importance"),
        "agg_facetset_counts": _lazy("relational", "agg_facetset_counts"),
        "corpus_clean": _lazy("textstats", "corpus_clean"),
        "events_sliding_window": _lazy("streaming", "events_sliding_window"),
        "agg_quantity_quantiles": _lazy("relational",
                                        "agg_quantity_quantiles"),
        "dup_ngram_stats": _lazy("dedup", "dup_ngram_stats"),
        "dedup_substring_spans": _lazy("dedup", "dedup_substring_spans"),
        "knn_graph": _lazy("ann", "knn_graph"),
        "kmeans_embeddings": _lazy("ann", "kmeans_embeddings"),
        "semdedup": _lazy("ann", "semdedup"),
        "classify_nb": _lazy("classify", "classify_naive_bayes"),
        "classify_knn": _lazy("ann", "classify_knn"),
        "events_late_data": _lazy("streaming", "events_late_data"),
        "events_decayed_counts": _lazy("streaming", "events_decayed_counts"),
        "dedup_exact_best": _lazy("dedup", "dedup_exact_best"),
        "dedup_cluster_best": _lazy("dedup", "dedup_cluster_best"),
        "pack_token_budget": _lazy("textstats", "pack_token_budget"),
        "corpus_sample_balanced": _lazy("textstats",
                                        "corpus_sample_balanced"),
        "corpus_sample_quota": _lazy("textstats", "corpus_sample_quota"),
        "curation_recipe": _lazy("textstats", "curation_recipe"),
        "doc_lm_logprob": _lazy("textstats", "doc_lm_logprob"),
        "doc_blocklist": _lazy("textstats", "doc_blocklist"),
        "redact_pii": _lazy("textstats", "redact_pii"),
        "chunk_documents": _lazy("textstats", "chunk_documents"),
        "source_mix_weights": _lazy("textstats", "source_mix_weights"),
        # --- new in round 5 (oracle-backed) ---
        "ft_word_delimiter": ft.ft_word_delimiter,
        "ft_icu_fold": ft.ft_icu_fold,
        "ft_cjk_lattice": ft.ft_cjk_lattice,
        "ft_korean_lattice": ft.ft_korean_lattice,
        "ft_length_filter": ft.ft_length_filter,
        "ft_truncate": ft.ft_truncate,
        "ft_reverse_token": ft.ft_reverse_token,
        "ft_whitespace_tok": ft.ft_whitespace_tok,
        "ft_simple_tok": ft.ft_simple_tok,
        "ft_keyword_tok": ft.ft_keyword_tok,
        "ft_path_hierarchy": ft.ft_path_hierarchy,
        "ft_classic": ft.ft_classic,
        "ft_classic_types": ft.ft_classic_types,
        "ft_common_grams": ft.ft_common_grams,
        "ft_keep_word": ft.ft_keep_word,
        "ft_fingerprint": ft.ft_fingerprint,
        "ft_hyphenated": ft.ft_hyphenated,
        "ft_limit_count": ft.ft_limit_count,
        "ft_decimal_digit": ft.ft_decimal_digit,
        "ft_apostrophe": ft.ft_apostrophe,
        "ft_elision": ft.ft_elision,
        "ft_capitalization": ft.ft_capitalization,
        "ft_type_filter": ft.ft_type_filter,
        "ft_html_strip": ft.ft_html_strip,
        "ft_mapping_char": ft.ft_mapping_char,
        "ft_pattern_replace_char": ft.ft_pattern_replace_char,
        "ft_german_light": ft.ft_german_light,
        "ft_spanish_light": ft.ft_spanish_light,
        "ft_italian_light": ft.ft_italian_light,
        "ft_swedish_light": ft.ft_swedish_light,
        "ft_russian_light": ft.ft_russian_light,
        "ft_portuguese_light": ft.ft_portuguese_light,
        "ft_norwegian_light": ft.ft_norwegian_light,
        "ft_turkish_lower": ft.ft_turkish_lower,
        "ft_greek_lower": ft.ft_greek_lower,
        "ft_arabic_norm": ft.ft_arabic_norm,
        "ft_persian_norm": ft.ft_persian_norm,
        "ft_hindi_norm": ft.ft_hindi_norm,
        "ft_scandinavian_fold": ft.ft_scandinavian_fold,
        # --- rows-only entries never reached by a rotation (weaker
        # check; their exactness gates are pytest-pinned) ---
        # --- round-5 additions: oracle-backed, never checked —
        # must land inside the final rotation ---
        "ft_dfi_chisq": ft.ft_dfi_chisq,
        "ft_xml_query": ft.ft_xml_query,
        "ft_geo3d_distance": ft.ft_geo3d_distance,
        "ft_geo3d_bbox": ft.ft_geo3d_bbox,
        "ft_geo3d_polygon": ft.ft_geo3d_polygon,
        "ft_geo3d_path": ft.ft_geo3d_path,
        "ft_edge_ngram": ft.ft_edge_ngram,
        "ft_ngram": ft.ft_ngram,
        "ann_pq_topk": _lazy("ann", "ann_pq_topk"),
        "graph_pagerank": _lazy("ann", "graph_pagerank"),
        "ann_ivfpq_topk": _lazy("ann", "ann_ivfpq_topk"),
        "ft_profile": ft.ft_profile,
        "video_frame_sample": _lazy("multimodal", "video_frame_sample"),
        "audio_features": _lazy("multimodal", "audio_features"),
        "bpe_train": _lazy("bpe", "bpe_train"),
        "bpe_token_count": _lazy("bpe", "bpe_token_count"),
        # --- everything below already has a driver-green row ---
        "agg_lineitem_pricing": _lazy("relational", "agg_lineitem_pricing"),
        "agg_facet_taxonomy": _lazy("relational", "agg_facet_taxonomy"),
        "ann_filtered_topk": _lazy("ann", "ann_filtered_topk"),
        "ann_quantized_topk": _lazy("ann", "ann_quantized_topk"),
        "doc_keywords": _lazy("textstats", "doc_keywords"),
        "decontaminate": _lazy("textstats", "decontaminate"),
        "vocab_hll": _lazy("textstats", "vocab_hll"),
        "ft_combined_field": ft.ft_combined_field,
        "ft_synonym_graph": ft.ft_synonym_graph,
        "ft_covering": ft.ft_covering,
        "ft_dv_multi_range": ft.ft_dv_multi_range,
        "ft_span_not": ft.ft_span_not,
        "ft_simple_query": ft.ft_simple_query,
        "ft_sorted_range": ft.ft_sorted_range,
        "ft_lmdirichlet": ft.ft_lmdirichlet,
        "ft_lmjelinek": ft.ft_lmjelinek,
        "ft_term_automaton": ft.ft_term_automaton,
        "ft_dfr_inl2": ft.ft_dfr_inl2,
        "ft_suggest_context": ft.ft_suggest_context,
        "ft_expr_range": ft.ft_expr_range,
        "ft_shape_distance": ft.ft_shape_distance,
        "ft_surround": ft.ft_surround,
        "ft_dismax_tie": ft.ft_dismax_tie,
        "ft_suggest_blended": ft.ft_suggest_blended,
        "ft_complex_phrase": ft.ft_complex_phrase,
        "ft_ib_spl": ft.ft_ib_spl,
        "ft_span_pos_range": ft.ft_span_pos_range,
        "ft_axiomatic_f2exp": ft.ft_axiomatic_f2exp,
        "ft_suggest_freetext": ft.ft_suggest_freetext,
        "hybrid_rrf": _hy.hybrid_rrf,
        "ft_geo_sort": ft.ft_geo_sort,
        "ft_facet_dynamic_range": ft.ft_facet_dynamic_range,
        "ft_spell": ft.ft_spell,
        "join_scored": ft.join_scored,
        "ft_expr_score": ft.ft_expr_score,
        "ft_index_synonyms": ft.ft_index_synonyms,
        "ft_suggest_infix": ft.ft_suggest_infix,
        "ft_cjk_bigrams": ft.ft_cjk_bigrams,
        "ft_shape_box": ft.ft_shape_box,
        "ft_payload_score": ft.ft_payload_score,
        "ft_word_break": ft.ft_word_break,
        "ft_boolean_filter": ft.ft_boolean_filter,
        "ft_blockjoin_child": ft.ft_blockjoin_child,
        "ft_facet_assoc": ft.ft_facet_assoc,
        "ft_span_first": ft.ft_span_first,
        "ft_phrase_prefix": ft.ft_phrase_prefix,
        "ft_diversified_topk": ft.ft_diversified_topk,
        "ft_term_exists": ft.ft_term_exists,
        "agg_grouping_topk": _lazy("relational", "agg_grouping_topk"),
    }
    q.update({
        # --- full-text index engine (flagship) ---
        "ft_collection_stats": ft.ft_collection_stats,
        "ft_term_stats": ft.ft_term_stats,
        "ft_docmeta": ft.ft_docmeta,
        "ft_postings_sample": ft.ft_postings_sample,
        "ft_bm25_top10": ft.ft_bm25_top10,
        "ft_bm25_scores": ft.ft_bm25_scores,          # rows-only (float32)
        "ft_boolean_and": ft.ft_boolean_and,
        "ft_boolean_and_not": ft.ft_boolean_and_not,
        "ft_term_in_set": ft.ft_term_in_set,
        "ft_prefix_terms": ft.ft_prefix_terms,
        "ft_suggest": ft.ft_suggest,
        "ft_term_range": ft.ft_term_range,
        "ft_regexp_terms": ft.ft_regexp_terms,
        "ft_phrase": ft.ft_phrase,
        "ft_phrase_sloppy": ft.ft_phrase_sloppy,
        "ft_multi_phrase": ft.ft_multi_phrase,
        "ft_interval_near": ft.ft_interval_near,
        "ft_bm25_boosted": ft.ft_bm25_boosted,
        "ft_sort_by_field": ft.ft_sort_by_field,
        "ft_sort_early_terminated": ft.ft_sort_early_terminated,
        "ft_fuzzy_terms": ft.ft_fuzzy_terms,
        "ft_wildcard_docs": ft.ft_wildcard_docs,
        "ft_fuzzy_docs": ft.ft_fuzzy_docs,
        "ft_facet_lang": ft.ft_facet_lang,
        "ft_facet_lang_dv": ft.ft_facet_lang_dv,
        "ft_facet_len_ranges": ft.ft_facet_len_ranges,
        "ft_facet_sampled": ft.ft_facet_sampled,
        "ft_drill_sideways": ft.ft_drill_sideways,
        "ft_keyword_filter": ft.ft_keyword_filter,
        "ft_synonym": ft.ft_synonym,
        "ft_dismax": ft.ft_dismax,
        "ft_min_should_match": ft.ft_min_should_match,
        "ft_feature_rank": ft.ft_feature_rank,
        "ft_rescore": ft.ft_rescore,
        "ft_suggest_fuzzy": ft.ft_suggest_fuzzy,
        "ft_blockjoin_parent": ft.ft_blockjoin_parent,
        "ft_len_range": ft.ft_len_range,
        "ft_geo_box": ft.ft_geo_box,
        "ft_geo_distance": ft.ft_geo_distance,
        "ft_more_like_this": ft.ft_more_like_this,
        "ft_highlight": ft.ft_highlight,
        "ft_deletes_filter": ft.ft_deletes_filter,
        "ft_percolate": ft.ft_percolate,
        "ft_collapse_lang": ft.ft_collapse_lang,
        "ft_interval_contains": ft.ft_interval_contains,
        "ft_english_doclen": ft.ft_english_doclen,
        "ft_stemmed_search": ft.ft_stemmed_search,
        "ft_shingles": ft.ft_shingles,
        "ft_distance_feature": ft.ft_distance_feature,
        "ft_geo_polygon": ft.ft_geo_polygon,
    })
    try:
        from lucene_ray.pipelines import (ann, dedup, multimodal, relational,
                                          streaming, textstats)

        q.update({
            "events_tumbling_window": streaming.events_tumbling_window,
            "events_sessionize": streaming.events_sessionize,
            "media_features": multimodal.media_features,
            "embedding_neardup": ann.embedding_neardup_pairs,
            # sub-quadratic scale path (hyperplane LSH; recall < 1 by
            # design → rows-only, measured in pytest instead)
            "embedding_neardup_lsh": (
                lambda sf: __import__("lucene_ray.pipelines.ann",
                                      fromlist=["ann"])
                .embedding_neardup_lsh(sf, n_tables=16, n_bits=4)),
            "dedup_exact": dedup.dedup_exact,
            "dedup_minhash_lsh": dedup.dedup_minhash_lsh,
            "dedup_simhash": dedup.dedup_simhash,
            "dedup_simhash_pairs": dedup.dedup_simhash_pairs,
            "ngram_jaccard_pairs": dedup.ngram_jaccard_pairs,
            "dedup_clusters": dedup.dedup_clusters,
            "text_quality": textstats.text_quality,
            "lang_id": textstats.lang_id,
            "token_count_bpe": textstats.token_count_bpe,
            "doc_fingerprint": textstats.doc_fingerprint,
            "ann_cosine_topk": ann.ann_cosine_topk,
            "ann_ivf_topk": ann.ann_ivf_topk,
            "ann_hnsw_topk": ann.ann_hnsw_topk,
            "agg_facet_counts": relational.agg_facet_counts,
            "agg_distinct": relational.agg_distinct,
            "join_semi_broadcast": relational.join_semi_broadcast,
        })
    except ImportError:
        pass
    return q


def oracle_sql() -> dict[str, str]:
    from lucene_ray.pipelines import fulltext as ft

    o = {
        "ft_covering": ft.oracle_covering_sql(),
        "ft_dv_multi_range": ft.oracle_dv_multi_range_sql(),
        "ft_span_not": ft.oracle_span_not_sql(),
        "ft_simple_query": ft.oracle_simple_query_sql(),
        "ft_highlight_passages": ft.oracle_highlight_passages_sql(),
        "ft_sorted_range": ft.oracle_sorted_range_sql(),
        "ft_lmdirichlet": ft.oracle_lmdirichlet_sql(),
        "ft_lmjelinek": ft.oracle_lmjelinek_sql(),
        "ft_term_automaton": ft.oracle_term_automaton_sql(),
        "ft_dfr_inl2": ft.oracle_dfr_inl2_sql(),
        "ft_suggest_context": ft.oracle_suggest_context_sql(),
        "ft_expr_range": ft.oracle_expr_range_sql(),
        "ft_shape_distance": ft.oracle_shape_distance_sql(),
        "ft_surround": ft.oracle_surround_sql(),
        "ft_dismax_tie": ft.oracle_dismax_tie_sql(),
        "ft_suggest_blended": ft.oracle_suggest_blended_sql(),
        "ft_complex_phrase": ft.oracle_complex_phrase_sql(),
        "ft_ib_spl": ft.oracle_ib_spl_sql(),
        "ft_span_pos_range": ft.oracle_span_pos_range_sql(),
        "ft_axiomatic_f2exp": ft.oracle_axiomatic_f2exp_sql(),
        "ft_dfi_chisq": ft.oracle_dfi_chisq_sql(),
        "ft_xml_query": ft.oracle_xml_query_sql(),
        "ft_collection_stats": ft.oracle_collection_stats_sql(),
        "ft_term_stats": ft.oracle_term_stats_sql(),
        "ft_docmeta": ft.oracle_docmeta_sql(),
        "ft_postings_sample": ft.oracle_postings_sample_sql(),
        "ft_bm25_top10": ft.oracle_bm25_sql(),
        # float32 scores are bit-equal to the DuckDB REAL-cast chain
        "ft_bm25_scores": ft.oracle_bm25_sql(with_scores=True),
        "ft_boolean_and": ft.oracle_boolean_and_sql(),
        "ft_boolean_and_not": ft.oracle_boolean_and_not_sql(),
        "ft_term_in_set": ft.oracle_term_in_set_sql(),
        "ft_prefix_terms": ft.oracle_prefix_terms_sql(),
        "ft_suggest": ft.oracle_suggest_sql(),
        "ft_term_range": ft.oracle_term_range_sql(),
        "ft_regexp_terms": ft.oracle_regexp_terms_sql(),
        "ft_phrase": ft.oracle_phrase_sql(),
        "ft_phrase_sloppy": ft.oracle_phrase_sloppy_sql(),
        "ft_multi_phrase": ft.oracle_multi_phrase_sql(),
        "ft_interval_near": ft.oracle_interval_near_sql(),
        "ft_bm25_boosted": ft.oracle_bm25_boosted_sql(),
        "ft_sort_by_field": ft.oracle_sort_by_field_sql(),
        "ft_sort_early_terminated": ft.oracle_sort_early_terminated_sql(),
        "ft_fuzzy_terms": ft.oracle_fuzzy_terms_sql(),
        "ft_wildcard_docs": ft.oracle_wildcard_docs_sql(),
        "ft_fuzzy_docs": ft.oracle_fuzzy_docs_sql(),
        "ft_facet_lang": ft.oracle_facet_lang_sql(),
        "ft_facet_lang_dv": ft.oracle_facet_lang_sql(),
        "ft_facet_len_ranges": ft.oracle_facet_len_ranges_sql(),
        "ft_facet_sampled": ft.oracle_facet_sampled_sql(),
        "ft_drill_sideways": ft.oracle_drill_sideways_sql(),
        "ft_keyword_filter": ft.oracle_keyword_filter_sql(),
        "ft_synonym": ft.oracle_synonym_sql(),
        "ft_dismax": ft.oracle_dismax_sql(),
        "ft_min_should_match": ft.oracle_min_should_match_sql(),
        "ft_feature_rank": ft.oracle_feature_rank_sql(),
        "ft_rescore": ft.oracle_rescore_sql(),
        "ft_suggest_fuzzy": ft.oracle_suggest_fuzzy_sql(),
        "ft_blockjoin_parent": ft.oracle_blockjoin_parent_sql(),
        "ft_len_range": ft.oracle_len_range_sql(),
        "ft_geo_box": ft.oracle_geo_box_sql(),
        "ft_geo_distance": ft.oracle_geo_distance_sql(),
        "ft_more_like_this": ft.oracle_more_like_this_sql(),
        "ft_highlight": ft.oracle_highlight_sql(),
        "ft_deletes_filter": ft.oracle_deletes_filter_sql(),
        "ft_percolate": ft.oracle_percolate_sql(),
        "ft_collapse_lang": ft.oracle_collapse_lang_sql(),
        "ft_interval_contains": ft.oracle_interval_contains_sql(),
        # ft_stemmed_search is rows-only: DuckDB has no offline stemmer
        # (fts extension needs network); the Porter chain is pytest-golden
        # verified and its stop/length half has this exact oracle:
        "ft_english_doclen": ft.oracle_english_doclen_sql(),
        "ft_shingles": ft.oracle_shingles_sql(),
        "ft_distance_feature": ft.oracle_distance_feature_sql(),
        "ft_geo_polygon": ft.oracle_geo_polygon_sql(),
        "ft_geo3d_distance": ft.oracle_geo3d_distance_sql(),
        "ft_geo3d_bbox": ft.oracle_geo3d_bbox_sql(),
        "ft_geo3d_polygon": ft.oracle_geo3d_polygon_sql(),
        "ft_geo3d_path": ft.oracle_geo3d_path_sql(),
        "ft_edge_ngram": ft.oracle_edge_ngram_sql(),
        "ft_ngram": ft.oracle_ngram_sql(),
        "ft_combined_field": ft.oracle_combined_field_sql(),
        "ft_synonym_graph": ft.oracle_synonym_graph_sql(),
        "ft_spell": ft.oracle_spell_sql(),
        "join_scored": ft.oracle_join_scored_sql(),
        "ft_expr_score": ft.oracle_expr_score_sql(),
        "ft_index_synonyms": ft.oracle_index_synonyms_sql(),
        "ft_suggest_infix": ft.oracle_suggest_infix_sql(),
        "ft_cjk_bigrams": ft.oracle_cjk_bigrams_sql(),
        "ft_word_delimiter": ft.oracle_word_delimiter_sql(),
        "ft_icu_fold": ft.oracle_icu_fold_sql(),
        "ft_cjk_lattice": ft.oracle_cjk_lattice_sql(),
        "ft_korean_lattice": ft.oracle_korean_lattice_sql(),
        "ft_length_filter": ft.oracle_length_filter_sql(),
        "ft_truncate": ft.oracle_truncate_sql(),
        "ft_reverse_token": ft.oracle_reverse_token_sql(),
        "ft_whitespace_tok": ft.oracle_whitespace_tok_sql(),
        "ft_simple_tok": ft.oracle_simple_tok_sql(),
        "ft_keyword_tok": ft.oracle_keyword_tok_sql(),
        "ft_path_hierarchy": ft.oracle_path_hierarchy_sql(),
        "ft_classic": ft.oracle_classic_sql(),
        "ft_classic_types": ft.oracle_classic_types_sql(),
        "ft_common_grams": ft.oracle_common_grams_sql(),
        "ft_keep_word": ft.oracle_keep_word_sql(),
        "ft_fingerprint": ft.oracle_fingerprint_sql(),
        "ft_hyphenated": ft._identity_word_stats_sql(),
        "ft_limit_count": ft.oracle_limit_count_sql(),
        "ft_decimal_digit": ft._identity_word_stats_sql(),
        "ft_apostrophe": ft._identity_word_stats_sql(),
        "ft_elision": ft._identity_word_stats_sql(),
        "ft_capitalization": ft.oracle_capitalization_sql(),
        "ft_type_filter": ft.oracle_type_filter_sql(),
        "ft_html_strip": ft._identity_word_stats_sql(),
        "ft_mapping_char": ft.oracle_mapping_char_sql(),
        "ft_pattern_replace_char": ft.oracle_pattern_replace_char_sql(),
        "ft_german_light": ft.oracle_german_light_sql(),
        "ft_spanish_light": ft.oracle_spanish_light_sql(),
        "ft_italian_light": ft.oracle_italian_light_sql(),
        "ft_swedish_light": ft.oracle_swedish_light_sql(),
        "ft_russian_light": ft.oracle_russian_light_sql(),
        "ft_portuguese_light": ft.oracle_portuguese_light_sql(),
        "ft_norwegian_light": ft.oracle_norwegian_light_sql(),
        "ft_turkish_lower": ft.oracle_turkish_lower_sql(),
        "ft_greek_lower": ft.oracle_greek_lower_sql(),
        "ft_arabic_norm": ft.oracle_arabic_norm_sql(),
        "ft_persian_norm": ft.oracle_persian_norm_sql(),
        "ft_hindi_norm": ft.oracle_hindi_norm_sql(),
        "ft_scandinavian_fold": ft.oracle_scandinavian_fold_sql(),
        "ft_shape_box": ft.oracle_shape_box_sql(),
        "ft_payload_score": ft.oracle_payload_score_sql(),
        "ft_word_break": ft.oracle_word_break_sql(),
        "ft_boolean_filter": ft.oracle_boolean_filter_sql(),
        "ft_blockjoin_child": ft.oracle_blockjoin_child_sql(),
        "ft_facet_assoc": ft.oracle_facet_assoc_sql(),
        "ft_span_first": ft.oracle_span_first_sql(),
        "ft_phrase_prefix": ft.oracle_phrase_prefix_sql(),
        "ft_diversified_topk": ft.oracle_diversified_topk_sql(),
        "ft_term_exists": ft.oracle_term_exists_sql(),
        "ft_sweetspot": ft.oracle_sweetspot_sql(),
        "ft_common_terms": ft.oracle_common_terms_sql(),
        "ft_phonetic": ft.oracle_phonetic_sql(),
        "ft_multi_range": ft.oracle_multi_range_sql(),
        "ft_dv_stats": ft.oracle_dv_stats_sql(),
        "ft_suggest_freetext": ft.oracle_suggest_freetext_sql(),
        "ft_geo_sort": ft.oracle_geo_sort_sql(),
        "ft_facet_dynamic_range": ft.oracle_facet_dynamic_range_sql(),
    }
    from lucene_ray.pipelines import hybrid as _hy
    o["hybrid_rrf"] = _hy.oracle_hybrid_rrf_sql()
    try:
        from lucene_ray.pipelines import (ann, classify, dedup, relational,
                                          streaming, temporal, textstats)

        o.update({
            "events_asof_join": temporal.oracle_asof_join_sql(),
            "events_lag_delta": temporal.oracle_lag_delta_sql(),
            "join_range_orders": temporal.oracle_join_range_sql(),
            "dsir_importance": textstats.oracle_dsir_importance_sql(),
            "events_tumbling_window": streaming.oracle_tumbling_window_sql(),
            "events_late_data": streaming.oracle_late_data_sql(),
            "events_decayed_counts": streaming.oracle_decayed_counts_sql(),
            "dedup_exact_best": dedup.oracle_dedup_exact_best_sql(),
            "dedup_cluster_best": dedup.oracle_dedup_cluster_best_sql(),
            "events_sessionize": streaming.oracle_sessionize_sql(),
            "events_sliding_window": streaming.oracle_sliding_window_sql(),
            "agg_quantity_quantiles":
                relational.oracle_quantity_quantiles_sql(),
            "embedding_neardup": ann.oracle_embedding_neardup_sql(),
            "dedup_exact": dedup.oracle_dedup_exact_sql(),
            "dup_ngram_stats": dedup.oracle_dup_ngram_sql(),
            "dedup_substring_spans": dedup.oracle_substring_spans_sql(),
            "ngram_jaccard_pairs": dedup.oracle_ngram_jaccard_sql(),
            "dedup_clusters": dedup.oracle_dedup_clusters_sql(),
            "text_quality": textstats.oracle_text_quality_sql(),
            "lang_id": textstats.oracle_lang_id_sql(),
            "token_count_bpe": textstats.oracle_token_count_sql(),
            "text_repetition": textstats.oracle_text_repetition_sql(),
            "doc_keywords": textstats.oracle_doc_keywords_sql(),
            "decontaminate": textstats.oracle_decontaminate_sql(),
            "doc_lm_logprob": textstats.oracle_doc_lm_logprob_sql(),
            "doc_ppl_buckets": textstats.oracle_doc_ppl_buckets_sql(),
            "doc_blocklist": textstats.oracle_doc_blocklist_sql(),
            "redact_pii": textstats.oracle_redact_pii_sql(),
            "chunk_documents": textstats.oracle_chunk_documents_sql(),
            "source_mix_weights": textstats.oracle_source_mix_sql(),
            "corpus_clean": textstats.oracle_corpus_clean_sql(),
            "pack_token_budget": textstats.oracle_pack_token_budget_sql(),
            "corpus_sample_balanced":
                textstats.oracle_sample_balanced_sql(),
            "corpus_sample_quota": textstats.oracle_sample_quota_sql(),
            "curation_recipe": textstats.oracle_curation_recipe_sql(),
            "vocab_hll": textstats.oracle_vocab_hll_sql(),
            "ann_cosine_topk": ann.oracle_ann_sql(),
            "knn_graph": ann.oracle_knn_graph_sql(),
            "kmeans_embeddings": ann.oracle_kmeans_sql(),
            "semdedup": ann.oracle_semdedup_sql(),
            "classify_nb": classify.oracle_classify_nb_sql(),
            "classify_knn": ann.oracle_classify_knn_sql(),
            "ann_ivf_topk": ann.oracle_ann_sql(),
            "ann_hnsw_topk": ann.oracle_ann_sql(),
            "ann_filtered_topk": ann.oracle_ann_filtered_sql(),
            "ann_quantized_topk": ann.oracle_ann_sql(),
            "agg_facet_counts": relational.oracle_facet_counts_sql(),
            "agg_facet_taxonomy": relational.oracle_facet_taxonomy_sql(),
            "agg_facetset_counts": relational.oracle_facetset_counts_sql(),
            "agg_grouping_topk": relational.oracle_grouping_topk_sql(),
            "agg_distinct": relational.oracle_distinct_sql(),
            "join_semi_broadcast": relational.oracle_semi_join_sql(),
            "agg_lineitem_pricing": relational.oracle_lineitem_pricing_sql(),
        })
    except ImportError:
        pass
    return o
