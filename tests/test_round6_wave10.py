"""Wave-10 ops: SimHash hamming-band pairing, sampled harmonic
centrality, PMI collocations. Oracle equality is covered by
test_entry_queries.py; these pin the pigeonhole recall guarantee, the
BFS bounds, and collocation adjacency."""

from __future__ import annotations

from pyspark.sql import functions as F

from graphdb_wikidata_spark.operators.dedup import (
    QUERIES as DEDUP_QUERIES,
    SIMHASH_HAMMING_K,
    simhash_signature,
)
from graphdb_wikidata_spark.operators.graph import (
    HARMONIC_SOURCES,
    QUERIES as GRAPH_QUERIES,
)
from graphdb_wikidata_spark.operators.text import (
    PMI_MIN_COUNT,
    QUERIES as TEXT_QUERIES,
)
from graphdb_wikidata_spark.tables import table

from tests.conftest import SF_SMOKE


def test_simhash_bands_find_every_close_pair(spark):
    # Pigeonhole recall: 4 disjoint 8-bit bands over a 32-bit signature
    # mean hamming <= 3 implies at least one identical band — so the
    # band join must find EVERY close pair, not a probabilistic subset.
    sigs = {r.doc_id: r.simhash for r in simhash_signature(spark, SF_SMOKE).collect()}
    ids = sorted(sigs)
    expect = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            h = bin(sigs[a] ^ sigs[b]).count("1")
            if h <= SIMHASH_HAMMING_K:
                expect[(a, b)] = h
    got = {
        (r.doc_a, r.doc_b): r.hamming
        for r in DEDUP_QUERIES["dedup_simhash_bands"](spark, SF_SMOKE).collect()
    }
    assert got == expect
    assert expect, "no close pairs at sf0.001 — the property test is vacuous"


def test_simhash_bands_plan_has_no_allpairs_join(spark):
    plan = (
        DEDUP_QUERIES["dedup_simhash_bands"](spark, SF_SMOKE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_harmonic_centrality_bounds(spark):
    rows = GRAPH_QUERIES["graph_harmonic_centrality"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert 1 <= r.n_sources_reaching <= HARMONIC_SOURCES
        # each source contributes at most 1/1
        assert r.harmonic <= r.n_sources_reaching + 1e-9
        assert r.harmonic > 0
    assert all(
        rows[i].harmonic >= rows[i + 1].harmonic for i in range(len(rows) - 1)
    )


def test_pmi_collocations_are_real_adjacent_pairs(spark):
    rows = TEXT_QUERIES["text_pmi_collocations"](spark, SF_SMOKE).collect()
    assert rows
    d = table(spark, SF_SMOKE, "documents")
    for r in rows[:5]:
        assert r.n_pair >= PMI_MIN_COUNT
        # the pair must occur adjacently in the space-joined text
        needle = f"%{r.w1} {r.w2}%"
        assert d.filter(F.col("text").like(needle)).count() > 0, (r.w1, r.w2)
    assert all(rows[i].pmi >= rows[i + 1].pmi for i in range(len(rows) - 1))
