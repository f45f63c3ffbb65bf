"""Operator library.

Each module exposes ``QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]]``
and ``ORACLES: dict[str, str]`` (ANSI SQL for DuckDB over the same parquet
tables). ``all_queries()`` / ``all_oracles()`` merge every module — this is
what ``__spark_entry__.py`` re-exports to the driver.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# The external correctness gate hashes the FIRST 50 registry entries against
# the DuckDB oracle each round. Round 6's window: (a) entries whose CODE
# changed this round (fresh evidence regardless of age), then (b) the new
# round-6 operators. The VERDICT r05 task-3 stale-cohort rotation was the
# original plan for slots 31-49, but round 6 ultimately created 54
# never-evidenced operators against a 50-slot window — and first evidence
# outranks re-confirmation, so the stale r01/r02 cohort (which has hard
# green rows, merely old ones) yields every contested slot and leads round
# 7's front-load instead (full ledger at the bottom). Ten new entries
# that could not fit are listed in DEFERRED_FIRST_EVIDENCE with the
# in-window sibling that covers each one's kernel meanwhile. The
# builder-side sims (DRIVER_SIM_r06*.txt) cover ALL entries at two scale
# factors every round regardless of window.
PRIORITY_ENTRIES: tuple[str, ...] = (
    # -- (a) code changed in round 6 (fresh evidence; pared down to the
    # three riskiest changes when the wave-10 ops arrived — the evicted
    # three are the LOWEST-risk changed rows, each with an in-window
    # guard meanwhile: events_linreg_trend's change is a HAVING guard
    # applied to BOTH sides plus a shared-moment rewrite (sim-validated
    # at two SFs), and stream_cusum_alerts / stream_running_totals are
    # bit-identity-tested against their windowed batch siblings
    # (tests/test_round5_wave5.py:13); all three re-window in round 7):
    # dedup_semantic now clusters with trained kmeans_fit centroids and
    # its oracle switched to the shared unrolled-Lloyd's CTEs
    "dedup_semantic",
    # kernel refactor: trajectory() indirection + HALF_UP rounding +
    # optional closed-form flag (default path bit-identical by test)
    "events_cusum_alerts",
    # forced broadcast dropped from the part-dimension singles joins
    "market_basket_pairs",
    # (rounding-only diffs NOT re-windowed: stream_ewma_bounded shares
    # the changed harness+rounding path with the two stream rows above;
    # embedding_power_iteration's round site is a driver-side list of
    # D floats exercised by every windowed kmeans/PCA sibling)
    #
    # -- (b) NEW in round 6 (first evidence):
    "dedup_exact_substring",
    "events_retention_cohorts",
    "text_ngram_novelty",
    # wave 2:
    "tpch_q5_local_volume",
    "graph_label_propagation",
    "graph_kcore",
    "events_path_trigrams",
    "events_time_to_convert",
    "embedding_pq_encode",
    # wave 3:
    "embedding_pq_search",
    "tpch_q10_returned_items",
    "text_keywords_topk",
    # wave 4:
    "tpch_q14_promo_revenue",
    "tpch_q13_custdist",
    "tpch_q4_priority_exists",
    "tpch_q22_idle_customers",
    "graph_clustering_coeff",
    "graph_jaccard_neighbors",
    "events_attribution_last_touch",
    # wave 5:
    "text_token_entropy",
    "vocab_topk_ids",
    "bpe_pair_counts",
    "events_dau_wau_rolling",
    "events_gini_concentration",
    # (dedup_embedding_cosine, the 12th r01 row, was renamed/absorbed
    # into dedup_embedding_lsh_verified in r2 and is no longer a
    # registry key; its slot re-windows the rounding-touched
    # stream_ewma_bounded after all)
    "stream_ewma_bounded",
    # -- (b continued) waves 6-9 (TPC-H completion + the analytics/ML
    # wave, first evidence — these NEVER-evidenced entries outrank the
    # stale-cohort re-confirmations that previously held slots 31-49;
    # the full r01/r02 cohort moves, intact, to the head of round 7's
    # front-load, see the ledger below):
    "tpch_q2_min_cost_supplier",
    "tpch_q7_volume_shipping",
    "tpch_q8_market_share",
    "tpch_q9_product_profit",
    "tpch_q11_important_stock",
    "tpch_q16_supplier_cnt",
    "tpch_q17_small_qty_revenue",
    "tpch_q20_promo_suppliers",
    "tpch_q21_waiting_orders",
    "events_survival_hazard",
    "events_winsorized_mean",
    "graph_adamic_adar",
    "nb_lang_classifier",
    "text_chi2_keywords",
    "corpus_source_kl_drift",
    "embedding_ann_recall",
    "embedding_mmr_diverse_topk",
    "knn_label_vote",
    "media_phash_buckets",
    # wave 10:
    "dedup_simhash_bands",
    "graph_harmonic_centrality",
    "text_pmi_collocations",
    # ROTATION LEDGER (evidence age after round 6, assuming this window
    # lands green): r06 x 50 (the above), r05 x 44, r04 x 46, r03 x 41,
    # r02 x 29 + r01 x 11 (the stale cohort this round's new-op volume
    # displaced — round 6 created 54 never-evidenced operators against
    # a 50-slot window, so re-confirmation lost every contested slot),
    # plus the 10 DEFERRED first-evidence rows below. Round 7
    # front-loads (1) the 10 deferred rows plus the three evicted
    # changed rows (events_linreg_trend, stream_cusum_alerts,
    # stream_running_totals), (2) the r01 cohort
    # (distinct_op, doc_fingerprint, embedding_centroid_norm,
    # embedding_knn_topk, events_funnel_steps, events_range_join_counts,
    # events_rollup_multires, events_tumbling, lang_id_heuristic,
    # tfidf_rarest_term, token_count_regex), (3) the r02 cohort
    # (embedding_lsh_buckets, media_catalog, sparql_filter_agg,
    # sparql_group_concat, sparql_lateral, sparql_minus,
    # sparql_subselect, sparql_wds_lookup, sparql_string/numeric/date/
    # hash/term_funcs, sparql_expr_calc, sparql_ask, sparql_reduced,
    # graph_bfs_chain, sparql_exists, sparql_not_exists, sparql_union,
    # sparql_values_undef, sparql_describe, media_frame_sample,
    # dedup_ngram_jaccard, sparql_path_sequence, sparql_path_negated,
    # sparql_ps_pq_chain, sparql_qualifier_join, sparql_graph_empty) —
    # 10 + 3 + 11 + 29 = 53: three over round 7's 50 slots, so the
    # last three r02 rows spill to round 8's head along with the r03
    # cohort, r04 in round 9. ALSO QUEUED for round-7 registration
    # (implemented + pytest-gated this round, need oracles + slots):
    # streams.topk_hitters (Space-Saving streaming top-k),
    # text.bpe_train_merges (iterative BPE trainer),
    # events.holt_linear_trend (Holt level+trend smoothing),
    # multimodal.media_cdc_chunk_census (content-defined chunking),
    # text.unigram_lm_tokenizer (unigram-LM tokenizer hard-EM).
)

# Never-evidenced entries WITHOUT a slot in this round's window — the
# overflow of a 54-new-op round over a 50-slot window. Each is deferred
# (not dropped) because an IN-WINDOW entry exercises the same kernel
# this round, and all ten lead round 7's front-load:
#   tpch_q12_shipmode_priority — integer CASE-sum over a date-banded
#       orderkey join; windowed siblings tpch_q4_priority_exists /
#       tpch_q13_custdist cover the join+conditional-count shape.
#   tpch_q15_top_supplier — scalar-max broadcast threshold; windowed
#       tpch_q11_important_stock is the same scalar-subquery kernel.
#   tpch_q19_disjunctive_revenue — decimal revenue sum under pushed
#       predicates; windowed tpch_q14_promo_revenue / tpch_q17 share
#       the exact-decimal lineitem-part aggregate.
#   events_percent_change_wow — lag window over a rollup; windowed
#       events_dau_wau_rolling covers window-over-rollup, and
#       window_lead_lag_ntile is green r04.
#   events_power_users_percentile — percentile threshold + broadcast
#       filter; windowed events_winsorized_mean covers the percentile
#       parity, tpch_q11 the threshold join.
#   text_feature_hashing — md5-bucket map + partial agg; windowed
#       vocab_topk_ids / corpus_split_hash (green r05) share the idiom.
#   text_readability — map-only regexp counts; windowed
#       text_token_entropy covers the map-only text-scoring shape
#       (token_count_regex green r01 is the same regexp-count kernel).
#   embedding_outlier_distance — centroid distances + per-cell moments;
#       windowed dedup_semantic runs the same centroid-distance kernel
#       and embedding_ann_recall the same centroid aggregate.
#   events_count_min_heavy_hitters — md5-row-hash counting sketch;
#       events_approx_distinct_kmv (green r05) is the sketch sibling
#       and events_heavy_hitter_share (green r05) the exact readout.
#   embedding_mrl_truncation_recall — same probe-broadcast + rank
#       window + overlap join as the windowed embedding_ann_recall;
#       only the similarity input (dimension-sliced) differs.
DEFERRED_FIRST_EVIDENCE: tuple[str, ...] = (
    "embedding_outlier_distance",
    "events_count_min_heavy_hitters",
    "embedding_mrl_truncation_recall",
    "tpch_q12_shipmode_priority",
    "tpch_q15_top_supplier",
    "tpch_q19_disjunctive_revenue",
    "events_percent_change_wow",
    "events_power_users_percentile",
    "text_feature_hashing",
    "text_readability",
)


def _reorder(merged: dict) -> dict:
    missing = [k for k in PRIORITY_ENTRIES if k not in merged]
    if missing:
        raise KeyError(f"PRIORITY_ENTRIES not in registry: {missing}")
    out = {k: merged[k] for k in PRIORITY_ENTRIES}
    out.update((k, v) for k, v in merged.items() if k not in out)
    return out


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from . import asof, corpus, dedup, events, graph, multimodal, relational, similarity, text, tpch

    from ..engine import entry_queries as sparql_queries
    from ..streaming import entry as streaming_entry

    merged: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in (relational, tpch, events, asof, text, corpus, dedup, similarity, multimodal, graph, streaming_entry, sparql_queries):
        merged.update(mod.QUERIES)
    return _reorder(merged)


def all_oracles() -> dict[str, str]:
    from . import asof, corpus, dedup, events, graph, multimodal, relational, similarity, text, tpch

    from ..engine import entry_queries as sparql_queries
    from ..streaming import entry as streaming_entry

    merged: dict[str, str] = {}
    for mod in (relational, tpch, events, asof, text, corpus, dedup, similarity, multimodal, graph, streaming_entry, sparql_queries):
        merged.update(mod.ORACLES)
    return {k: merged[k] for k in all_queries() if k in merged}
