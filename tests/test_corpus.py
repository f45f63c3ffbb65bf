"""Invariant tests for the corpus-assembly operators (corpus.py) and
the dedup-cluster composition (dedup.py::dedup_clusters). The
oracle hash-match itself runs in test_entry_queries.py; these pin the
semantic invariants the hash can't express."""

from __future__ import annotations

from pyspark.sql import functions as F

from graphdb_wikidata_spark.operators.corpus import (
    PACK_BUDGET,
    pack_sequences_budget,
    pack_sequences_global,
    sample_stratified_hash,
)
from graphdb_wikidata_spark.operators.dedup import dedup_clusters, minhash_candidates, _shingled
from tests.conftest import SF_CORRECT, SF_SMOKE


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_sharded_packing_equals_global_window(spark):
    """The sharded two-pass prefix sum must equal the single-window
    semantics EXACTLY — with a shard size small enough that sf0.01's
    500 docs span many shards (the default 4096 would put the whole
    corpus in one shard and prove nothing)."""
    sharded = pack_sequences_budget(spark, SF_CORRECT, shard_docs=64)
    globl = pack_sequences_global(spark, SF_CORRECT)
    assert _rows(sharded) == _rows(globl)


def test_packing_invariants(spark):
    out = pack_sequences_budget(spark, SF_CORRECT, shard_docs=64).collect()
    assert len(out) == 500
    by_source: dict[str, list] = {}
    for r in out:
        by_source.setdefault(r.source, []).append(r)
    for rows in by_source.values():
        rows.sort(key=lambda r: r.doc_id)
        cum = 0
        prev_pack = 0
        for r in rows:
            assert r.pack_id == cum // PACK_BUDGET
            assert r.pack_id >= prev_pack  # packs are monotone per source
            prev_pack = r.pack_id
            cum += r.n_tokens
        # the budget actually bites: a multi-KB source spans >1 pack
        if cum > 2 * PACK_BUDGET:
            assert rows[-1].pack_id >= 1


def test_sampling_deterministic_and_rate_shaped(spark):
    a = _rows(sample_stratified_hash(spark, SF_CORRECT))
    b = _rows(sample_stratified_hash(spark, SF_CORRECT))
    assert a == b  # no RNG state anywhere
    assert 0 < len(a) < 500  # neither empty nor everything
    for doc_id, source, bucket, rate in a:
        assert 0 <= bucket < 100
        assert 10 <= rate < 90
        assert bucket < rate
        suffix = int(source[3:])
        assert rate == 10 + (suffix * 7) % 80


def test_dedup_clusters_invariants(spark):
    clusters = {r.doc_id: (r.cluster_id, r.is_kept) for r in dedup_clusters(spark, SF_CORRECT).collect()}
    assert len(clusters) == 500  # every doc labeled, singletons included
    # kept <=> doc is its own cluster representative (the min)
    for doc, (cid, kept) in clusters.items():
        assert cid <= doc
        assert kept == (cid == doc)
        assert clusters[cid][0] == cid  # representative maps to itself
    # every LSH candidate pair landed in one cluster
    pairs = minhash_candidates(_shingled(spark, SF_CORRECT)).collect()
    assert pairs, "sf0.01 is known to contain near-duplicates"
    for p in pairs:
        assert clusters[p.doc_a][0] == clusters[p.doc_b][0]
    # exactly one keeper per cluster
    keepers = {cid for doc, (cid, kept) in clusters.items() if kept}
    assert keepers == {cid for cid, _ in clusters.values()}


def test_pack_plan_shapes(spark):
    """The sharded pack must broadcast the shard-offset relation (a
    #shards-row frame) and never fall back to a cartesian/BNLJ — the
    plan property that makes it scale."""
    plan = pack_sequences_budget(spark, SF_CORRECT)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_quality_pack_composition(spark):
    """corpus_quality_pack == quality filter then pack: every output
    doc satisfies the filter, and pack ids re-derive from the filtered
    token stream (not the unfiltered one)."""
    from graphdb_wikidata_spark.operators.corpus import corpus_quality_pack

    out = sorted(corpus_quality_pack(spark, SF_CORRECT).collect(), key=lambda r: (r.source, r.doc_id))
    assert out
    assert all(20 <= r.n_tokens <= 80 for r in out)
    cum: dict[str, int] = {}
    for r in out:
        assert r.pack_id == cum.get(r.source, 0) // PACK_BUDGET
        cum[r.source] = cum.get(r.source, 0) + r.n_tokens
