"""Wave-9 ops: WoW percent change, power-user percentile slice, KL
source drift, embedding outlier z-scores. Oracle equality is covered by
test_entry_queries.py; these pin the estimator invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from graphdb_wikidata_spark.operators.corpus import QUERIES as CORPUS_QUERIES
from graphdb_wikidata_spark.operators.events import QUERIES as EVENT_QUERIES
from graphdb_wikidata_spark.operators.similarity import (
    OUTLIER_TOPK,
    QUERIES as SIM_QUERIES,
)
from graphdb_wikidata_spark.tables import table

from tests.conftest import SF_SMOKE


def test_wow_first_week_is_null_and_counts_conserve(spark):
    rows = EVENT_QUERIES["events_percent_change_wow"](spark, SF_SMOKE).collect()
    assert rows
    first_seen: set[str] = set()
    for r in rows:
        if r.event_type not in first_seen:
            assert r.pct_change is None  # no prior week to compare
            first_seen.add(r.event_type)
        else:
            assert r.pct_change is not None
    total = table(spark, SF_SMOKE, "events").count()
    assert sum(r.n_events for r in rows) == total


def test_power_users_exceed_threshold_and_are_few(spark):
    rows = EVENT_QUERIES["events_power_users_percentile"](spark, SF_SMOKE).collect()
    assert rows
    n_users = (
        table(spark, SF_SMOKE, "events").select("user_id").distinct().count()
    )
    # above-p95 slice: nonempty but well under half the population
    assert len(rows) < n_users / 2
    for r in rows:
        assert r.n_events > r.p95_threshold


def test_kl_drift_nonnegative_and_covers_every_source(spark):
    rows = CORPUS_QUERIES["corpus_source_kl_drift"](spark, SF_SMOKE).collect()
    d = table(spark, SF_SMOKE, "documents")
    n_sources = d.select("source").distinct().count()
    assert len(rows) == n_sources
    for r in rows:
        # KL >= 0 up to the per-term 9dp rounding slack
        assert r.kl_divergence >= -1e-6
        assert r.n_tokens > 0


def test_outlier_scores_are_extreme_and_ranked(spark):
    rows = SIM_QUERIES["embedding_outlier_distance"](spark, SF_SMOKE).collect()
    assert len(rows) == OUTLIER_TOPK
    assert all(
        rows[i].z_score >= rows[i + 1].z_score for i in range(len(rows) - 1)
    )
    # a top-20-of-500 z-score slice must sit in the upper tail
    assert rows[0].z_score > 1.0
    assert len({r.vec_id for r in rows}) == OUTLIER_TOPK
