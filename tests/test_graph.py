"""Graph analytics unit tests on small explicit graphs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graphdb_wikidata_spark.operators.graph import (
    bfs_distances,
    connected_components,
    pagerank,
)


@pytest.fixture(scope="module")
def tri_plus_pair(spark):
    # triangle 1-2-3 (directed cycle) + disjoint edge 10->11
    return spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (10, 11)], "src long, dst long"
    )


def test_pagerank_redistribute_sums_to_one(tri_plus_pair):
    r = pagerank(tri_plus_pair, iterations=15)
    total = r.agg(F.sum("rank")).first()[0]
    assert abs(total - 1.0) < 1e-6
    ranks = {row["node"]: row["rank"] for row in r.collect()}
    # cycle nodes are symmetric
    assert abs(ranks[1] - ranks[2]) < 1e-6 and abs(ranks[2] - ranks[3]) < 1e-6
    # 11 receives from 10, so it outranks 10
    assert ranks[11] > ranks[10]


def test_connected_components_two_islands(tri_plus_pair):
    comp = {r["node"]: r["comp"] for r in connected_components(tri_plus_pair).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_bfs_distances_cycle(tri_plus_pair):
    d = {r["node"]: r["dist"] for r in bfs_distances(tri_plus_pair, source=1).collect()}
    assert d == {1: 0, 2: 1, 3: 2}


def test_connected_components_deep_chain_log_rounds(spark):
    """Diameter independence: a 301-node path graph must converge
    within max_iters=12 — O(log n) hooking rounds. Label propagation
    (O(diameter)) would need ~100+ rounds and now RAISES instead of
    silently returning partial labels, so this pins both the round
    complexity and the loud-failure contract."""
    from graphdb_wikidata_spark.operators.graph import connected_components

    edges = spark.range(300).select(
        (F.col("id") + 1000).alias("src"), (F.col("id") + 1001).alias("dst")
    )
    comp = connected_components(edges, max_iters=12)
    rows = comp.collect()
    assert len(rows) == 301
    assert {r["comp"] for r in rows} == {1000}


def test_connected_components_nonconvergence_raises(spark):
    from graphdb_wikidata_spark.operators.graph import connected_components

    edges = spark.range(60).select(
        (F.col("id") + 1).alias("src"), (F.col("id") + 2).alias("dst")
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, max_iters=1)


def test_triangle_count_invariants(spark):
    from graphdb_wikidata_spark.operators.dedup import _shingled, minhash_candidates
    from graphdb_wikidata_spark.operators.graph import QUERIES as GQ

    sf = "/root/testdata/sf0.001"
    rows = GQ["graph_triangle_count"](spark, sf).collect()
    assert rows
    total = sum(r.n_triangles for r in rows)
    # every triangle contributes exactly 3 node participations
    assert total % 3 == 0 and total > 0
    # triangle members are candidate-graph nodes
    cand = minhash_candidates(_shingled(spark, sf)).collect()
    nodes = {r.doc_a for r in cand} | {r.doc_b for r in cand}
    assert {r.doc_id for r in rows} <= nodes
