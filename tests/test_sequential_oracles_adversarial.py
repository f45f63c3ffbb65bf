"""Adversarial generalization for the round-7 sequential-kernel
oracles, mirroring test_tokenizer_oracles_adversarial:

- stream_topk_hitters: a crafted arrival order that forces the
  Space-Saving eviction arm through its tie-break repeatedly (all K
  counters at the minimum, evicted-then-returning users inheriting
  counts) — the fixed testdata reaches evictions but not saturated
  min-ties on every step.
- events_holt_linear_trend: series whose FIRST TWO days have equal
  counts (the ADVICE r06 init edge — trend init must still run, as a
  no-op, keyed to the row index), single-day series (no init at all),
  and a declining series whose trend goes negative and whose rounded
  emissions cross zero (the -0.0 regime pinned by
  test_rounding_contract).
"""

from __future__ import annotations

import datetime
import os

import pytest

from tests.conftest import SF_SMOKE
from tests.oracle_harness import compare


def _mk_events():
    rows = []  # (event_id, ts, user_id, event_type, value)
    eid = 0
    t0 = datetime.datetime(2024, 1, 1)

    def add(day, user, etype, value=1.0):
        nonlocal eid
        rows.append(
            (eid, t0 + datetime.timedelta(days=day, seconds=eid), user, etype, value)
        )
        eid += 1

    # --- Space-Saving stress on type 'tie': fill K=10 counters, then
    # cycle users 11..15 and 1..5 so every arrival evicts out of a
    # saturated min-tie set
    for u in range(1, 11):
        add(0, u, "tie")
    for u in list(range(11, 16)) + list(range(1, 6)) + list(range(11, 16)):
        add(0, u, "tie")
    # same-user runs (increment path) interleaved with evictions
    for u in [20, 20, 20, 1, 21, 21, 2, 22]:
        add(0, u, "tie")

    # --- Holt series: equal first two days (init edge), then a ramp
    for day, n in enumerate([5, 5, 7, 12, 20]):
        for _ in range(n):
            add(day, 100, "flat2")
    # single observation (no trend init ever)
    add(0, 100, "lone")
    # decline to make the trend negative and emissions cross zero
    for day, n in enumerate([30, 24, 19, 15, 12, 10, 9, 9, 9]):
        for _ in range(n):
            add(day, 100, "fall")
    return rows


@pytest.fixture(scope="module")
def adversarial_dir(tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = str(tmp_path_factory.mktemp("adv_events"))
    rows = _mk_events()
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows]),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array(["{}"] * len(rows)),
        }
    )
    pq.write_table(tbl, os.path.join(d, "events.parquet"))
    from graphdb_wikidata_spark.tables import TABLE_NAMES

    for t in TABLE_NAMES:
        if t != "events":
            os.symlink(
                os.path.join(SF_SMOKE, f"{t}.parquet"),
                os.path.join(d, f"{t}.parquet"),
            )
    return d


def test_space_saving_oracle_survives_saturated_min_ties(spark, adversarial_dir):
    from graphdb_wikidata_spark.streaming.entry import ORACLES, QUERIES

    name = "stream_topk_hitters"
    ok, msg = compare(QUERIES[name](spark, adversarial_dir), ORACLES[name], adversarial_dir)
    assert ok, msg


def test_holt_oracle_survives_init_edges_and_sign_changes(spark, adversarial_dir):
    from graphdb_wikidata_spark.operators.events import ORACLES, QUERIES

    name = "events_holt_linear_trend"
    ok, msg = compare(QUERIES[name](spark, adversarial_dir), ORACLES[name], adversarial_dir)
    assert ok, msg


def _mk_embeddings_dir(tmp_path, n_vecs: int) -> str:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = str(tmp_path)
    rng = np.random.RandomState(7)
    vecs = rng.randn(n_vecs, 8).astype("float32")
    tbl = pa.table(
        {
            "vec_id": pa.array(range(n_vecs), pa.int64()),
            "embedding": pa.array(vecs.tolist(), pa.list_(pa.float32())),
            "label": pa.array([i % 3 for i in range(n_vecs)], pa.int32()),
        }
    )
    pq.write_table(tbl, os.path.join(d, "embeddings.parquet"))
    from graphdb_wikidata_spark.tables import TABLE_NAMES

    for t in TABLE_NAMES:
        if t != "embeddings":
            os.symlink(
                os.path.join(SF_SMOKE, f"{t}.parquet"),
                os.path.join(d, f"{t}.parquet"),
            )
    return d


@pytest.mark.parametrize("n_vecs,expect_rows", [(1, 0), (3, 2), (4, 3)])
def test_mmr_small_and_empty_pools_match_oracle(
    spark, tmp_path_factory, n_vecs, expect_rows
):
    """Pool smaller than MMR_K: both engines emit one row per available
    candidate and stop; a corpus holding only the query vector emits
    zero rows (the empty-Arrow-batch guard from the round-7 review)
    instead of crashing the kernel."""
    from graphdb_wikidata_spark.operators.similarity import ORACLES, QUERIES

    d = _mk_embeddings_dir(tmp_path_factory.mktemp(f"adv_emb{n_vecs}"), n_vecs)
    name = "embedding_mmr_diverse_topk"
    sdf = QUERIES[name](spark, d)
    assert sdf.count() == expect_rows
    ok, msg = compare(QUERIES[name](spark, d), ORACLES[name], d)
    assert ok, msg
