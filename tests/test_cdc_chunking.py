"""Content-defined chunking (multimodal.cdc_chunk_batch /
media_cdc_chunk_census) — registry-queued for round 7; this round the
CDC properties are the gate: exact reconstruction, duplicate-payload
digest equality, and the shift-resilience property that is the entire
point of content-defined (vs fixed-size) chunking."""

from __future__ import annotations

import hashlib

from graphdb_wikidata_spark.operators.multimodal import (
    CDC_WINDOW,
    cdc_chunk_batch,
    media_cdc_chunk_census,
)

from tests.conftest import SF_SMOKE


def test_chunks_reconstruct_payload_exactly():
    payloads = [
        b"the quick brown fox jumps over the lazy dog " * 40,
        b"spark join merge filter window " * 64,
        b"x",
        b"",
    ]
    for b, chunks in zip(payloads, cdc_chunk_batch(payloads)):
        assert sum(ln for _, ln, _ in chunks) == len(b)
        # offsets are contiguous from zero and digests match the slices
        pos = 0
        for off, ln, dg in chunks:
            assert off == pos
            assert hashlib.md5(b[off : off + ln]).hexdigest() == dg
            pos += ln


def test_identical_payloads_chunk_identically():
    b = b"merge sort hash join scan filter " * 50
    a, c = cdc_chunk_batch([b, b])
    assert a == c


def test_insertion_preserves_downstream_chunks():
    # the CDC property: prepending bytes shifts only the chunks up to
    # the first content-determined boundary; every LATER chunk keeps
    # its digest. A fixed-size chunker would lose all of them.
    base = b"the quick brown fox jumps over the lazy dog " * 60
    shifted = b"INSERTED-PREFIX-" + base
    da = {dg for _, _, dg in cdc_chunk_batch([base])[0]}
    db = {dg for _, _, dg in cdc_chunk_batch([shifted])[0]}
    shared = da & db
    assert len(shared) >= len(da) - 2, (
        f"only {len(shared)} of {len(da)} chunks survived a prefix insertion"
    )


def test_census_finds_cross_media_shared_chunks(spark):
    rows = media_cdc_chunk_census(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r.n_copies >= 2
        assert r.chunk_len >= 1
        assert r.bytes_saved == (r.n_copies - 1) * r.chunk_len
    # deterministic across runs
    again = media_cdc_chunk_census(spark, SF_SMOKE).collect()
    assert [tuple(r) for r in rows] == [tuple(r) for r in again]


def test_short_payloads_are_single_chunks():
    short = b"abc"[: CDC_WINDOW - 1]
    (chunks,) = cdc_chunk_batch([short])
    assert len(chunks) == 1 and chunks[0][1] == len(short)
