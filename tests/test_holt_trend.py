"""Holt linear trend smoother (events.holt_linear_trend) — registry-
queued for round 7; this round the recursion's correctness against an
independent Python recomputation, plus determinism, are the gate."""

from __future__ import annotations

from pyspark.sql import functions as F

from graphdb_wikidata_spark.operators.events import (
    HOLT_ALPHA,
    HOLT_BETA,
    holt_linear_trend,
)
from graphdb_wikidata_spark.rounding import round_like_duckdb
from graphdb_wikidata_spark.tables import table

from tests.conftest import SF_SMOKE


def test_holt_matches_independent_recursion(spark):
    rows = holt_linear_trend(spark, SF_SMOKE).collect()
    assert rows
    ev = table(spark, SF_SMOKE, "events")
    daily = {}
    for r in (
        ev.groupBy(
            "event_type",
            F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    ):
        daily.setdefault(r.event_type, []).append((r.day, r.n))
    expect = {}
    for et, series in daily.items():
        series.sort()
        level = trend = None
        for i, (day, n) in enumerate(series):
            y = float(n)
            if level is None:
                level, trend = y, 0.0
            else:
                if trend == 0.0 and i == 1:
                    trend = y - level
                fc = level + trend
                new_level = HOLT_ALPHA * y + (1 - HOLT_ALPHA) * fc
                trend = HOLT_BETA * (new_level - level) + (1 - HOLT_BETA) * trend
                level = new_level
            expect[(et, day)] = (
                round_like_duckdb(level, 4),
                round_like_duckdb(trend, 4),
                round_like_duckdb(level + trend, 4),
            )
    for r in rows:
        assert (r.level, r.trend, r.forecast_next) == expect[(r.event_type, r.day)], (
            r.event_type,
            r.day,
        )


def test_holt_first_day_inits_and_is_deterministic(spark):
    a = holt_linear_trend(spark, SF_SMOKE).collect()
    seen = set()
    for r in a:
        if r.event_type not in seen:
            assert r.level == float(r.n) and r.trend == 0.0
            seen.add(r.event_type)
    b = holt_linear_trend(spark, SF_SMOKE).collect()
    assert [tuple(x) for x in a] == [tuple(x) for x in b]
