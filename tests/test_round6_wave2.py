"""Round-6 wave-2 operators: TPC-H Q5, label propagation, 2-core,
path trigrams, time-to-convert, product quantization.

Oracle equivalence for each entry is covered by the parametrized
test_entry_queries sweep; these tests pin the behavioral contracts the
hash can't see (convergence horizons, determinism, tie-breaks,
degenerate inputs) on synthetic frames.
"""

from __future__ import annotations

from datetime import datetime, timedelta

from pyspark.sql import functions as F

from graphdb_wikidata_spark.operators import events, graph, similarity

from tests.conftest import SF_SMOKE


def _with_events(spark, rows, name):
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    orig = events.table
    events.table = lambda s, d, n: df  # noqa: ARG005
    try:
        return events.QUERIES[name](spark, SF_SMOKE).collect()
    finally:
        events.table = orig


T0 = datetime(2024, 1, 1)


def _ev(i, secs, user, etype):
    return (i, T0 + timedelta(seconds=secs), user, etype, 1.0, "{}")


# ---------------------------------------------------------------------------
# events_path_trigrams
# ---------------------------------------------------------------------------


def test_path_trigrams_counts_consecutive_triples(spark):
    rows = [
        _ev(1, 0, 1, "view"),
        _ev(2, 10, 1, "click"),
        _ev(3, 20, 1, "purchase"),
        _ev(4, 30, 1, "view"),  # second trigram: click,purchase,view
        _ev(5, 0, 2, "view"),
        _ev(6, 10, 2, "click"),  # user 2 has only 2 events -> no trigram
    ]
    out = {(r.e1, r.e2, r.e3): r.n_paths for r in _with_events(spark, rows, "events_path_trigrams")}
    assert out == {
        ("view", "click", "purchase"): 1,
        ("click", "purchase", "view"): 1,
    }


def test_path_trigrams_tie_breaks_on_event_id(spark):
    # two events at the SAME timestamp: event_id orders them, so the
    # trigram is deterministic across shuffles/engines
    rows = [
        _ev(1, 0, 1, "a"),
        _ev(2, 5, 1, "b"),
        _ev(3, 5, 1, "c"),  # same ts as event 2 -> ordered by id: b, c
        _ev(4, 9, 1, "d"),
    ]
    out = {(r.e1, r.e2, r.e3) for r in _with_events(spark, rows, "events_path_trigrams")}
    assert out == {("a", "b", "c"), ("b", "c", "d")}


# ---------------------------------------------------------------------------
# events_time_to_convert
# ---------------------------------------------------------------------------


def test_time_to_convert_first_view_to_first_purchase_after(spark):
    rows = [
        _ev(1, 100, 1, "view"),
        _ev(2, 400, 1, "purchase"),  # 300s after first view
        _ev(3, 900, 1, "purchase"),  # later purchase ignored (min)
        _ev(4, 50, 2, "purchase"),  # purchase BEFORE any view: excluded
        _ev(5, 60, 2, "view"),
        _ev(6, 0, 3, "view"),  # never purchases: excluded
    ]
    out = {r.user_id: r.secs_to_convert for r in _with_events(spark, rows, "events_time_to_convert")}
    assert out == {1: 300}


def test_time_to_convert_floor_division_whole_seconds(spark):
    rows = [
        (1, T0, 1, "view", 1.0, "{}"),
        (2, T0 + timedelta(seconds=10, microseconds=999999), 1, "purchase", 1.0, "{}"),
    ]
    out = _with_events(spark, rows, "events_time_to_convert")
    assert out[0].secs_to_convert == 10  # floor, not round


# ---------------------------------------------------------------------------
# graph_label_propagation / graph_kcore
# ---------------------------------------------------------------------------


def test_lpa_partitions_all_candidate_nodes_deterministically(spark):
    from graphdb_wikidata_spark.operators.dedup import _shingled, minhash_candidates

    cand = minhash_candidates(_shingled(spark, SF_SMOKE))
    n_nodes = (
        cand.select(F.col("doc_a").alias("d"))
        .unionByName(cand.select(F.col("doc_b").alias("d")))
        .distinct()
        .count()
    )
    a = {(r.community, r.n_members) for r in graph.QUERIES["graph_label_propagation"](spark, SF_SMOKE).collect()}
    b = {(r.community, r.n_members) for r in graph.QUERIES["graph_label_propagation"](spark, SF_SMOKE).collect()}
    assert a == b  # synchronous rounds + struct-min tie-break = deterministic
    assert sum(m for _, m in a) == n_nodes  # every node labeled exactly once


def test_kcore_members_have_core_degree_at_least_k(spark):
    out = graph.QUERIES["graph_kcore"](spark, SF_SMOKE).collect()
    assert out, "sf0.001 candidate graph has a non-empty 2-core"
    assert all(r.core_degree >= graph.KCORE_K for r in out)


def test_kcore_converges_within_oracle_horizon(spark):
    # the oracle unrolls KCORE_ORACLE_PEELS peel rounds; the engine
    # raises if the fixpoint needs more. Run at the larger local SF to
    # catch horizon drift before the driver does.
    out = graph.QUERIES["graph_kcore"](spark, "/root/testdata/sf0.01").collect()
    assert len(out) > 0


# ---------------------------------------------------------------------------
# embedding_pq_encode
# ---------------------------------------------------------------------------


def test_pq_shape_and_code_range(spark):
    rows = similarity.QUERIES["embedding_pq_encode"](spark, SF_SMOKE).collect()
    n_vecs = {r.vec_id for r in rows}
    # every vector gets exactly PQ_M codes, one per subspace
    assert len(rows) == len(n_vecs) * similarity.PQ_M
    assert {r.subspace for r in rows} == set(range(similarity.PQ_M))
    assert all(0 <= r.code < similarity.PQ_K for r in rows)


def test_pq_subspace_fit_equals_kmeans_on_slice(spark):
    from graphdb_wikidata_spark.operators.similarity import (
        PQ_ITERS,
        PQ_K,
        PQ_SUB,
        _as_double,
        kmeans_fit,
    )
    from graphdb_wikidata_spark.tables import table

    e = table(spark, SF_SMOKE, "embeddings").select(
        "vec_id", _as_double("embedding").alias("full")
    )
    es = e.select("vec_id", F.slice("full", PQ_SUB + 1, PQ_SUB).alias("v"))  # subspace 1
    direct = {
        (r.vec_id, r.cid) for r in kmeans_fit(es, k=PQ_K, iters=PQ_ITERS).select("vec_id", "cid").collect()
    }
    via_pq = {
        (r.vec_id, r.code)
        for r in similarity.QUERIES["embedding_pq_encode"](spark, SF_SMOKE).collect()
        if r.subspace == 1
    }
    assert direct == via_pq


# ---------------------------------------------------------------------------
# wave 3: embedding_pq_search / text_keywords_topk
# ---------------------------------------------------------------------------


def test_pq_search_self_distance_is_minimal(spark):
    # the query vector's own codes give adist equal to its quantization
    # error — every returned neighbour's adist must be >= the smallest
    # and the list must be ascending with vec_id tie-breaks
    rows = similarity.QUERIES["embedding_pq_search"](spark, SF_SMOKE).collect()
    assert len(rows) == 10
    assert 0 not in {r.vec_id for r in rows}
    dists = [r.adist for r in rows]
    assert dists == sorted(dists)
    assert all(d >= 0 for d in dists)


def test_pq_search_tracks_exact_knn(spark):
    # ADC over 12-bit codes is approximate; on the clustered testdata
    # at least a few of the exact top-10 should survive in the PQ
    # top-10 (a total miss means the codebooks/LUT wiring is wrong)
    exact = {r.vec_id for r in similarity.QUERIES["embedding_knn_topk"](spark, SF_SMOKE).collect()}
    approx = {r.vec_id for r in similarity.QUERIES["embedding_pq_search"](spark, SF_SMOKE).collect()}
    assert len(exact & approx) >= 2


def test_keywords_topk_rank_and_ties(spark):
    from graphdb_wikidata_spark.operators import text

    out = text.QUERIES["text_keywords_topk"](spark, SF_SMOKE).collect()
    by_doc: dict = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc, rs in by_doc.items():
        rs.sort(key=lambda r: r.rank)
        assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= 3
        # scores non-increasing; equal scores ordered by token string
        for a, b in zip(rs, rs[1:]):
            assert a.score > b.score or (a.score == b.score and a.token < b.token)
