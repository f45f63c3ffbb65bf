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


def test_decontaminate_plan_broadcasts_eval_grams(spark):
    """The eval-gram set must reach the overlap join as a broadcast
    (the corpus side never shuffles), and a contaminated doc is
    exactly one sharing a distinct n-gram with the eval stratum."""
    from graphdb_wikidata_spark.operators.corpus import DECON_N, decontaminate_ngrams

    df = decontaminate_ngrams(spark, SF_CORRECT)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan

    rows = df.collect()
    # recompute ground truth in Python at sf0.01 scale (small enough)
    import duckdb

    docs = duckdb.sql(
        "SELECT doc_id, text FROM read_parquet('/root/testdata/sf0.01/documents.parquet')"
    ).fetchall()
    def grams(t):
        w = t.split(" ")
        return {" ".join(w[i : i + DECON_N]) for i in range(len(w) - DECON_N + 1)}
    ev = set()
    for did, text in docs:
        if did % 20 == 0 and len(text.split(" ")) >= DECON_N:
            ev |= grams(text)
    truth = {}
    for did, text in docs:
        if did % 20 != 0 and len(text.split(" ")) >= DECON_N:
            g = grams(text)
            truth[did] = (len(g), len(g & ev))
    assert len(rows) == len(truth)
    for r in rows:
        n, s = truth[r.doc_id]
        assert (r.n_grams, r.n_shared, r.contaminated) == (n, s, s > 0)


def test_gopher_rules_match_python_model(spark):
    """keep flag and metrics re-derive from a direct per-doc model."""
    from collections import Counter
    from decimal import ROUND_HALF_UP, Decimal

    def r4(x):  # Spark/DuckDB round() is HALF_UP; Python round() is not
        return float(Decimal(str(x)).quantize(Decimal("0.0001"), ROUND_HALF_UP))

    from graphdb_wikidata_spark.operators.text import quality_gopher_rules

    rows = quality_gopher_rules(spark, SF_SMOKE).collect()
    import duckdb

    docs = duckdb.sql(
        "SELECT doc_id, text FROM read_parquet('/root/testdata/sf0.001/documents.parquet')"
    ).fetchall()
    assert len(rows) == len(docs)
    model = {}
    for did, text in docs:
        c = Counter(text.split(" "))
        n = sum(c.values())
        top = max(c.values())
        dup = 1 - len(c) / n
        model[did] = (n, top / n, dup, 20 <= n <= 80 and top / n <= 0.2 and dup <= 0.6)
    for r in rows:
        n, topf, dupf, keep = model[r.doc_id]
        assert r.n_tokens == n
        assert r.top_tok_frac == r4(topf)
        assert r.dup_tok_frac == r4(dupf)
        assert r.keep == keep


def test_mix_budget_semantics(spark):
    """Per-source doc_id-order prefix under the token budget: every
    kept doc's predecessors are kept too, and the first dropped doc of
    a source is exactly the budget crosser."""
    from graphdb_wikidata_spark.operators.corpus import QUERIES

    rows = QUERIES["corpus_mix_budget"](spark, SF_CORRECT).collect()
    assert rows
    import duckdb

    docs = duckdb.sql(
        "SELECT doc_id, source, len(string_split(text,' ')) FROM "
        "read_parquet('/root/testdata/sf0.01/documents.parquet') ORDER BY doc_id"
    ).fetchall()
    kept = {r.doc_id: r for r in rows}
    cum: dict[str, int] = {}
    for did, src, n in docs:
        budget = 200 + (int(src[3:]) * 137) % 1200
        want_keep = cum.get(src, 0) < budget
        assert (did in kept) == want_keep
        if want_keep:
            assert kept[did].cum_before == cum.get(src, 0)
        cum[src] = cum.get(src, 0) + n
    # the budget actually bites somewhere
    assert len(kept) < len(docs)


def test_text_chunk_dedup_semantics(spark):
    # toy corpus: doc 0 and doc 1 share an identical 10-word chunk; the
    # keeper is the minimal (doc_id, pos) occurrence
    import pandas as pd

    from graphdb_wikidata_spark.operators import text as tx

    shared = " ".join(f"w{i}" for i in range(10))
    other = " ".join(f"x{i}" for i in range(10))
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [0, 1],
                "text": [shared + " " + other, shared],
                "lang": ["en", "en"],
                "source": ["a", "a"],
                "n_chars": [0, 0],
            }
        )
    )
    import graphdb_wikidata_spark.tables as tables

    orig = tables.table
    tables.table = lambda spark_, sf, name: df  # noqa: ARG005
    # operators/text.py imported `table` by name — patch both
    tx.table, tx_orig = tables.table, tx.table
    try:
        rows = {r["doc_id"]: r for r in tx.QUERIES["text_chunk_dedup"](spark, "x").collect()}
    finally:
        tables.table = orig
        tx.table = tx_orig
    assert rows[0]["n_chunks"] == 2 and rows[0]["n_kept"] == 2  # first occurrence
    assert rows[1]["n_chunks"] == 1 and rows[1]["n_kept"] == 0  # duplicate chunk


def test_text_intradoc_ngram_dedup_ratio(spark):
    import pandas as pd

    from graphdb_wikidata_spark.operators import text as tx

    looped = " ".join(["a b c d e"] * 4)  # heavy 5-gram repetition
    fresh = " ".join(f"t{i}" for i in range(20))
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [0, 1],
                "text": [looped, fresh],
                "lang": ["en", "en"],
                "source": ["a", "a"],
                "n_chars": [0, 0],
            }
        )
    )
    tx_orig = tx.table
    tx.table = lambda spark_, sf, name: df  # noqa: ARG005
    try:
        rows = {r["doc_id"]: r for r in tx.QUERIES["text_intradoc_ngram_dedup"](spark, "x").collect()}
    finally:
        tx.table = tx_orig
    assert rows[0]["n_grams"] == 16 and rows[0]["n_unique"] == 5
    assert rows[1]["n_grams"] == 16 and rows[1]["n_unique"] == 16
    assert rows[1]["uniq_ratio"] == 1.0
