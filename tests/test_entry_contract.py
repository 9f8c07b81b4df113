"""Driver-contract consistency: queries() and oracle_sql() must stay in
lockstep (every query either has an oracle or is knowingly rows-only)."""

from __future__ import annotations

import __spark_entry__ as entry


def test_every_query_has_an_oracle():
    qs = set(entry.queries())
    oracles = set(entry.oracle_sql())
    # no stale oracles for removed queries
    assert oracles <= qs
    # all current queries are oracle-checked (none intentionally
    # rows-only right now — update this list if one becomes so)
    rows_only: set[str] = set()
    assert qs - oracles == rows_only


def test_query_registry_is_pinned():
    """VERDICT r3 #6: the driver's correctness gate iterates queries()
    — if an entry silently drops out (as cast_scalars/url_dedup did
    from the r3 driver run), its oracle row vanishes without any test
    failing. Pin the exact registry so adding/removing a query is an
    explicit, reviewed change."""
    expected = {
        "validate_documents", "stats_by_lang", "dedup_exact",
        "referential_lang", "length_histogram", "agg_pushdown",
        "topk_per_group", "dedup_minhash_lsh", "dedup_groups",
        "near_dedup_corpus", "dedup_exact_text", "simhash",
        "simhash64", "simhash_pairs", "ann_cosine_topk",
        "ann_lsh_topk", "ann_lsh_probe", "emb_near_dup",
        "text_analysis", "token_stats", "line_dedup", "redact_pii",
        "pack_sequences", "chunk_documents", "ngram_topk", "snapshot_diff",
        "mix_corpus", "dedup_lines_in_doc", "semantic_dedup",
        "filter_urls", "take_per_stratum", "perplexity_split",
        "html_extract", "rate_anomalies", "corpus_overlap",
        "dsir_select", "tfidf_topk", "cap_per_domain", "link_graph",
        "dedup_paragraphs", "encoding_artifacts", "index_probe",
        "bm25_topk", "pagerank_hosts", "weighted_sample",
        "repetition_features",
        "quality_filter",
        "unigram_logprob", "multimodal_features", "multimodal_dims",
        "multimodal_audio", "image_dedup", "image_dedup_gif", "video_dedup", "audio_dedup", "media_dedup",
        "image_dedup_jpeg", "validate_json_dynamic",
        "validate_json_hybrid", "validate_json_variant",
        "containment_winnowing", "decontamination", "sessionize", "asof_join",
        "asof_join_keyless", "time_rollup", "hash_split", "temperature_sample", "range_join",
        "cast_props", "psi_drift", "ks_drift", "js_drift",
        "baseline_drift", "ks_baseline", "ann_lsh_multi", "ivf_topk",
        "kw_combinators", "kw_array",
        "kw_object", "kw_numeric", "kw_formats", "kw_content",
        "cast_scalars", "url_dedup",
        "anchor_text", "host_profile", "host_boilerplate",
        "infer_profile", "robots_gate", "infer_formats",
        "url_templates", "html_meta", "canonical_pick", "host_quality",
        "crawl_priority", "sitemap_urls", "hits_hosts",
        "domain_rollup", "parse_sitemaps", "soft404",
        "recrawl_schedule", "fetch_batches", "crawl_delays",
        "parse_warc", "mirror_hosts", "canonical_collapse",
        "degree_stats", "clean_unicode", "wordlist_filter",
        "ann_quantized", "lang_agreement", "sitemap_coverage",
        "mean_pool", "robots_compliance", "bigram_logprob",
    }
    assert set(entry.queries()) == expected
    assert len(entry.queries()) == len(expected)


def test_round5_driver_window_rotation():
    """VERDICT r4 #1: the correctness driver verifies only the FIRST 50
    queries() entries, so dict insertion order is the coverage schedule.
    Round 5's window must contain every query the r4 window missed —
    the 10 never driver-checked plus the 25 last checked in r3 — and
    the queries whose implementation changed this round.  Rotation
    rule going forward: any query absent from the previous round's
    CORRECTNESS_r{N}.json, and any query touched in the current round,
    moves into the first 50 slots (every query gets a driver-verified
    row at least once per two rounds)."""
    window = list(entry.queries())[:50]
    never_checked = {
        "image_dedup", "image_dedup_gif", "image_dedup_jpeg",
        "video_dedup", "audio_dedup", "media_dedup",
        "decontamination", "temperature_sample",
        "baseline_drift", "ks_baseline",
    }
    stale_since_r3 = {
        "multimodal_dims", "multimodal_audio", "validate_json_dynamic",
        "validate_json_hybrid", "validate_json_variant",
        "containment_winnowing", "sessionize", "asof_join",
        "asof_join_keyless", "time_rollup", "hash_split", "range_join",
        "cast_props", "psi_drift", "ks_drift", "js_drift", "ivf_topk",
        "kw_combinators", "kw_array", "kw_object", "kw_numeric",
        "kw_formats", "kw_content", "cast_scalars", "url_dedup",
    }
    changed_in_r5 = {
        # semantic_dedup / ann_cosine_topk / near_dedup_corpus also
        # changed in r5, but their oracle VALUES are pytest-pinned
        # unchanged (semantic_dedup's changed IVF path is exercised
        # in-window by ivf_topk + the dim-256 plan test) — their
        # window slots went to the brand-new queries, which have
        # never had any driver row, per the same never-checked-first
        # priority the rotation rule encodes; they sit FIRST outside
        # the window.
        "pagerank_hosts",
    }
    new_in_r5 = {
        "anchor_text", "host_profile", "host_boilerplate",
        "infer_profile", "robots_gate", "infer_formats",
        "url_templates", "html_meta", "canonical_pick",
        "host_quality", "crawl_priority", "sitemap_urls",
        "hits_hosts", "domain_rollup",
    }
    must_cover = (never_checked | stale_since_r3 | changed_in_r5
                  | new_in_r5)
    missing = must_cover - set(window)
    assert not missing, f"round-5 driver window misses: {sorted(missing)}"
    assert list(entry.queries())[50:53] == ["semantic_dedup",
                                            "ann_cosine_topk",
                                            "near_dedup_corpus"]


def test_oracle_sql_is_static_text():
    for name, sql in entry.oracle_sql().items():
        assert isinstance(sql, str) and "SELECT" in sql.upper(), name


def test_queries_are_callables():
    for name, fn in entry.queries().items():
        assert callable(fn), name
