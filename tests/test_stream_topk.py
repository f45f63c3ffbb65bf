"""Space-Saving streaming top-k (streams.topk_hitters) — registry-queued
for round 7; this round the Metwally guarantees and replay determinism
are the gate:

1. one-sided error: est_count >= true count for every retained user;
2. the guarantee set: any user with true count > n_seen/K is present;
3. replay determinism: two availableNow runs produce identical rows;
4. multi-batch replay (maxFilesPerTrigger=1) converges to the same
   final summary as the single-batch run — state carries across
   micro-batches and the last update per (type, rank) wins.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from graphdb_wikidata_spark.streaming.streams import (
    TOPK_K,
    events_stream,
    run_available_now,
    topk_hitters,
)
from graphdb_wikidata_spark.tables import table

from tests.conftest import SF_SMOKE


def _run(spark, sf_dir=SF_SMOKE, **stream_kw):
    df = run_available_now(
        topk_hitters(events_stream(spark, sf_dir, **stream_kw)),
        output_mode="update",
        last_update_keys=["event_type", "rank"],
        emission_ordinal="n_seen",
    )
    return sorted(tuple(r) for r in df.collect())


def _true_counts(spark):
    ev = table(spark, SF_SMOKE, "events")
    out: dict[tuple[str, int], int] = {}
    for r in (
        ev.groupBy("event_type", "user_id").agg(F.count(F.lit(1)).alias("n")).collect()
    ):
        out[(r.event_type, r.user_id)] = r.n
    return out


def test_space_saving_overestimates_and_guarantees(spark):
    rows = _run(spark)
    assert rows
    truth = _true_counts(spark)
    per_type_seen: dict[str, int] = {}
    retained: dict[str, set[int]] = {}
    for et, rank, user, est, n_seen in rows:
        assert 1 <= rank <= TOPK_K
        assert est >= truth.get((et, user), 0)  # one-sided error
        per_type_seen[et] = n_seen
        retained.setdefault(et, set()).add(user)
    # every user above the n/K frequency threshold must be retained
    for (et, user), n in truth.items():
        if n > per_type_seen[et] / TOPK_K:
            assert user in retained[et], (et, user, n)


def test_space_saving_replay_is_deterministic(spark):
    assert _run(spark) == _run(spark)


def test_space_saving_multibatch_matches_single_batch(spark, tmp_path):
    # split the source into several files and force one file per
    # micro-batch: the sequential summary must converge to the same
    # final state as the single-batch replay
    ev = table(spark, SF_SMOKE, "events")
    src = str(tmp_path / "ev_parts")
    ev.repartition(4).write.parquet(src)
    single = _run(spark)
    multi = _run(spark, path=src, max_files_per_trigger=1)
    # the SUMMARY (users retained + counts) depends on arrival order,
    # which differs between the two replays for non-guaranteed entries;
    # the GUARANTEED set and the invariants must hold in both
    truth = _true_counts(spark)
    for rows in (single, multi):
        seen = {}
        for et, rank, user, est, n_seen in rows:
            assert est >= truth.get((et, user), 0)
            seen[et] = n_seen
        for (et, user), n in truth.items():
            if n > seen[et] / TOPK_K:
                assert any(r[0] == et and r[2] == user for r in rows)
    # identical totals processed
    assert {(r[0], r[4]) for r in single} == {(r[0], r[4]) for r in multi}
