"""Streaming operators: drive each with Trigger.availableNow into a
memory sink and cross-check against the batch equivalent on the same
data — the streaming result on a finite replay must equal the batch
answer."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graphdb_wikidata_spark.streaming import (
    dedup_within_watermark,
    events_stream,
    run_available_now,
    running_user_totals,
    session_stats,
    sliding_avg,
    tumbling_counts,
)
from graphdb_wikidata_spark.tables import table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def batch_events(spark):
    return table(spark, SF, "events").cache()


def test_tumbling_counts_matches_batch(spark, batch_events):
    got = run_available_now(tumbling_counts(events_stream(spark, SF)))
    want = (
        batch_events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(F.col("w").start.alias("win_start"), "event_type", "n", "sum_value")
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_sliding_avg_matches_batch(spark, batch_events):
    got = run_available_now(sliding_avg(events_stream(spark, SF)))
    want = (
        batch_events.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .select(F.col("w").start.alias("win_start"), "event_type", "n", "sum_value")
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_session_stats_matches_batch(spark, batch_events):
    got = run_available_now(session_stats(events_stream(spark, SF)))
    want = (
        batch_events.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.col("w").start.alias("session_start"),
            F.col("w").end.alias("session_end"),
            "user_id",
            "n_events",
            "sum_value",
        )
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_dedup_within_watermark(spark, batch_events):
    got = run_available_now(
        dedup_within_watermark(events_stream(spark, SF)), output_mode="append"
    )
    # the synthetic events have unique ids: dedup must be lossless
    assert got.count() == batch_events.count()
    assert got.select("event_id").distinct().count() == got.count()


def test_running_user_totals(spark, batch_events):
    got = run_available_now(
        running_user_totals(events_stream(spark, SF)), output_mode="update"
    )
    # availableNow on one file = one micro-batch: the update stream's
    # last emission per user is the lifetime total
    want = (
        batch_events.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )
    g = {r["user_id"]: (r["n_events"], r["total_value"]) for r in got.collect()}
    w = {r["user_id"]: (r["n_events"], r["total_value"]) for r in want.collect()}
    assert g == w
