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
# the DuckDB oracle each round.
#
# ROUND 7 IS THE EVIDENCE-DEBT ROUND (VERDICT r06 next-round #1): no new
# operator waves — the entire window pays down stale and missing driver
# evidence, exactly as the verdict prescribed:
#   (a) the 5 round-6 queue operators, registered with real oracles this
#       round (first driver evidence),
#   (b) the 10 DEFERRED_FIRST_EVIDENCE rows from round 6 (never windowed),
#   (c) the 3 changed rows evicted from round 6's window
#       (events_linreg_trend, stream_cusum_alerts, stream_running_totals),
#   (d) the full r01 cohort (11 entries whose only driver evidence is r1),
#   (e) the 21 oldest r02 entries (ledger order).
# 5 + 10 + 3 + 11 + 21 = 50. The rotation-age invariant is now ENFORCED by
# tests/test_rotation_policy.py, which parses the shipped CORRECTNESS_r*.json
# history and fails the suite if a registered entry goes never-evidenced or
# over the age budget while a younger entry holds a window slot.
PRIORITY_ENTRIES: tuple[str, ...] = (
    # -- (a) round-6 queue operators, first registration + first evidence:
    "stream_topk_hitters",
    "bpe_train_merges",
    "unigram_lm_tokenizer",
    "events_holt_linear_trend",
    "media_cdc_chunk_census",
    # -- (b) round-6 deferred first-evidence rows:
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
    # -- (c) the three changed rows evicted from round 6's window:
    "events_linreg_trend",
    "stream_cusum_alerts",
    "stream_running_totals",
    # -- (d) the r01 cohort (only driver evidence is round 1):
    "distinct_op",
    "doc_fingerprint",
    "embedding_centroid_norm",
    "embedding_knn_topk",
    "events_funnel_steps",
    "events_range_join_counts",
    "events_rollup_multires",
    "events_tumbling",
    "lang_id_heuristic",
    "tfidf_rarest_term",
    "token_count_regex",
    # -- (e) the 21 oldest r02 entries (ledger order from round 6):
    "embedding_lsh_buckets",
    "media_catalog",
    "sparql_filter_agg",
    "sparql_group_concat",
    "sparql_lateral",
    "sparql_minus",
    "sparql_subselect",
    "sparql_wds_lookup",
    "sparql_string_funcs",
    "sparql_numeric_funcs",
    "sparql_date_funcs",
    "sparql_hash_funcs",
    "sparql_term_funcs",
    "sparql_expr_calc",
    "sparql_ask",
    "sparql_reduced",
    "graph_bfs_chain",
    "sparql_exists",
    "sparql_not_exists",
    "sparql_union",
    "sparql_values_undef",
    # ROTATION LEDGER (evidence age after round 7, assuming this window
    # lands green): every registered entry has driver evidence, max age
    # = r03 (the 41-entry r03 cohort plus round 8's head). ROUND 8
    # WINDOW, in order: (1) the 3 similarity rows whose CODE changed in
    # round 7 under ADVICE r06 (embedding_ivf_topk, embedding_ann_recall
    # — centroid dims now round to KMEANS_ROUND and the probe csim to
    # 6dp on both engines — and embedding_mmr_diverse_topk, whose greedy
    # loop became a single-partition mapInPandas kernel; oracles for all
    # three verified green at sf0.001/0.01 this round, and the in-window
    # embedding_outlier_distance exercises the same rounded-centroid
    # kernel meanwhile), (2) the 8 r02 spillover rows
    # (sparql_describe, media_frame_sample, dedup_ngram_jaccard,
    # sparql_path_sequence, sparql_path_negated, sparql_ps_pq_chain,
    # sparql_qualifier_join, sparql_graph_empty), (3) the first 39 of
    # the 41-entry r03 cohort; the remaining 2 r03 rows lead round 9
    # with the r04 cohort. Age invariant going forward: no registered
    # entry's latest driver evidence older than 4 rounds
    # (tests/test_rotation_policy.py enforces both rules mechanically).
)

# Round 6's never-evidenced overflow — all ten hold window slots above.
# Kept as an explicit (now empty) ledger so the rotation test can assert
# no entry is ever deferred without a named in-window kernel sibling.
DEFERRED_FIRST_EVIDENCE: tuple[str, ...] = ()

# Entries whose CODE changed since their last driver evidence and whose
# window slot is therefore fresh-evidence-for-changed-code, not a
# re-confirmation — tests/test_rotation_policy.py exempts exactly these
# from the oldest-first precedence rule and requires each to hold a
# window slot. Re-justify every round:
#   events_linreg_trend   — r6 HAVING guard + shared-moment rewrite,
#                           evicted from r6's window for the wave-10 ops
#   stream_cusum_alerts   — r6 kernel refactor (trajectory indirection,
#                           HALF_UP rounding, closed-form flag), evicted
#   stream_running_totals — same r6 harness+rounding change, evicted
CHANGED_ROWS: tuple[str, ...] = (
    "events_linreg_trend",
    "stream_cusum_alerts",
    "stream_running_totals",
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
