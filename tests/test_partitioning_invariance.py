"""Partitioning-invariance: the determinism contract behind every
oracle hash-match, tested directly. At 100 TB the SAME query runs under
different partition counts, AQE decisions, and shuffle orders on every
execution — a result that depends on aggregation association order
(double sums) or on which row a tie-break happens to see first is not
reproducible, and would also flap the driver's value-hash gate.

These tests run each operator under deliberately different
``spark.sql.shuffle.partitions`` settings (1 vs 13 — a serial plan vs a
spread one, forcing different partial-agg association orders) and
assert the collected results are IDENTICAL, bit for bit. The chosen
operators are exactly the ones whose kernels would be order-sensitive
if naively written with double accumulations: they all route FP sums
through the round-to-decimal idiom or integer arithmetic.
"""

from __future__ import annotations

import pytest

from graphdb_wikidata_spark.operators import all_queries

from tests.conftest import SF_SMOKE

# operator -> why it would be order-sensitive if naively written
ORDER_SENSITIVE_OPS = [
    "events_survival_hazard",      # cumulative hazard: window sum of decimals
    "graph_adamic_adar",           # AA/RA: groupBy sum of 1/ln(deg) terms
    "nb_lang_classifier",          # per-doc log-likelihood sums + argmax
    "corpus_source_kl_drift",      # KL: sum of p*ln(p/q) terms per source
    "text_pmi_collocations",       # rank over log-ratio scores
    "graph_harmonic_centrality",   # sum of 1/dist over sampled sources
    "events_winsorized_mean",      # mean of clamped decimals
    "embedding_outlier_distance",  # per-cell moments of rounded distances
    "events_count_min_heavy_hitters",  # sketch cells + min readout
    "tpch_q2_min_cost_supplier",   # window-min equality over rounded costs
    # round-8 registrations: MAX-merge cells, packed-key window argmin,
    # per-block lead() neighbors, broadcast-set membership counts —
    # each would flap under shuffle reshaping if its tie-breaks or
    # merges were order-sensitive
    "events_hll_registers",
    "text_winnowing_fingerprints",
    "dedup_sorted_neighborhood",
    "bloom_semi_filter_probe",
]


def _run(spark, name: str, shuffle_partitions: int):
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))
    try:
        df = all_queries()[name](spark, SF_SMOKE)
        cols = df.columns
        rows = sorted(tuple(r) for r in df.collect())
        return cols, rows
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


@pytest.mark.parametrize("name", ORDER_SENSITIVE_OPS)
def test_result_is_partitioning_invariant(spark, name):
    cols_a, rows_a = _run(spark, name, 1)
    cols_b, rows_b = _run(spark, name, 13)
    assert cols_a == cols_b
    assert rows_a == rows_b, (
        f"{name}: result depends on shuffle partitioning — an "
        "association-order-sensitive aggregation leaked through"
    )
    assert rows_a, f"{name}: invariance test is vacuous (no rows)"
