"""Streaming HyperLogLog (streams.hll_registers_stream): the sketch's
merge is cell-wise MAX, so unlike Space-Saving the final state is
ORDER-INDEPENDENT — the multi-batch replay must equal the single-batch
replay AND the batch-built sketch bit-for-bit, not just within
invariants."""

from __future__ import annotations

from graphdb_wikidata_spark.operators.events import QUERIES as EVENT_QUERIES
from graphdb_wikidata_spark.streaming.streams import (
    events_stream,
    hll_registers_stream,
    run_available_now,
)
from graphdb_wikidata_spark.tables import table

from tests.conftest import SF_SMOKE


def _run(spark, sf_dir=SF_SMOKE, **stream_kw):
    df = run_available_now(
        hll_registers_stream(events_stream(spark, sf_dir, **stream_kw)),
        output_mode="update",
        last_update_keys=["register"],
        emission_ordinal="n_hashes",
    )
    return sorted(tuple(r) for r in df.collect())


def test_stream_equals_batch_sketch(spark):
    batch = sorted(
        tuple(r)
        for r in EVENT_QUERIES["events_hll_registers"](spark, SF_SMOKE).collect()
    )
    assert _run(spark) == batch


def test_multibatch_replay_is_bit_identical(spark, tmp_path):
    # force one file per micro-batch: MAX-merge is order- and
    # batching-independent, so the final registers must be identical
    ev = table(spark, SF_SMOKE, "events")
    src = str(tmp_path / "ev_parts")
    ev.repartition(4).write.parquet(src)
    assert _run(spark) == _run(spark, path=src, max_files_per_trigger=1)


def test_register_bounds(spark):
    rows = _run(spark)
    assert 1 <= len(rows) <= 256
    for register, max_rho, n_hashes in rows:
        assert 0 <= register < 256
        assert 1 <= max_rho <= 49  # 48 examined bits + 1
        assert n_hashes >= 1
