"""Round-6 wave-4 operators: TPC-H Q14/Q13/Q4/Q22 adaptations,
candidate-graph clustering coefficient + neighbor Jaccard, last-touch
attribution.

Oracle equivalence is covered by the parametrized test_entry_queries
sweep; these tests pin the behavioral contracts the hash can't see
(semi-join dedup, zero-count groups, window boundary semantics) on
synthetic frames, and brute-force-check the graph scores against a
driver-side recomputation of the same candidate graph.
"""

from __future__ import annotations

from datetime import datetime, timedelta

from pyspark.sql import functions as F

from graphdb_wikidata_spark.operators import events, graph, relational

from tests.conftest import SF_SMOKE

T0 = datetime(1996, 2, 1)


def _with_tables(spark, frames, name):
    orig = relational.table
    relational.table = lambda s, d, n: frames[n]  # noqa: ARG005
    try:
        return relational.QUERIES[name](spark, SF_SMOKE).collect()
    finally:
        relational.table = orig


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


# ---------------------------------------------------------------------------
# events_attribution_last_touch
# ---------------------------------------------------------------------------


def _ev(i, secs, user, etype):
    return (i, datetime(2024, 1, 1) + timedelta(seconds=secs), user, etype, 1.0, "{}")


def test_attribution_credits_most_recent_prior_touch(spark):
    rows = [
        _ev(1, 0, 1, "view"),
        _ev(2, 10, 1, "click"),  # last touch before the purchase
        _ev(3, 20, 1, "purchase"),
        _ev(4, 30, 1, "view"),  # AFTER the purchase: must not count
        _ev(5, 0, 2, "purchase"),  # no prior touch -> organic
        _ev(6, 10, 2, "signup"),
        _ev(7, 20, 2, "purchase"),  # credited to signup
    ]
    out = {r.touch_type: (r.n_conversions, r.n_users) for r in _with_events(
        spark, rows, "events_attribution_last_touch"
    )}
    assert out == {"click": (1, 1), "organic": (1, 1), "signup": (1, 1)}


def test_attribution_error_events_do_not_steal_credit(spark):
    rows = [
        _ev(1, 0, 1, "click"),
        _ev(2, 10, 1, "error"),  # not a touch type: carried click survives
        _ev(3, 20, 1, "purchase"),
    ]
    out = {r.touch_type: r.n_conversions for r in _with_events(
        spark, rows, "events_attribution_last_touch"
    )}
    assert out == {"click": 1}


# ---------------------------------------------------------------------------
# tpch_q4_priority_exists
# ---------------------------------------------------------------------------


def test_q4_order_with_two_late_lines_counts_once(spark):
    orders = spark.createDataFrame(
        [(1, T0, "1-URGENT"), (2, T0, "1-URGENT"), (3, T0, "5-LOW")],
        ["o_orderkey", "o_orderdate", "o_orderpriority"],
    )
    late = T0 + timedelta(days=90)
    ontime = T0 + timedelta(days=10)
    lineitem = spark.createDataFrame(
        [(1, late), (1, late), (2, ontime), (3, late)],
        ["l_orderkey", "l_shipdate"],
    )
    out = _with_tables(
        spark,
        {"orders": orders, "lineitem": lineitem},
        "tpch_q4_priority_exists",
    )
    assert {(r.o_orderpriority, r.order_count) for r in out} == {
        ("1-URGENT", 1),  # order 1 once despite two late lines; order 2 on time
        ("5-LOW", 1),
    }


# ---------------------------------------------------------------------------
# tpch_q13_custdist
# ---------------------------------------------------------------------------


def test_q13_customers_without_orders_land_in_bucket_zero(spark):
    customer = spark.createDataFrame([(1,), (2,), (3,)], ["c_custkey"])
    orders = spark.createDataFrame(
        [(10, 1), (11, 1), (12, 2)], ["o_orderkey", "o_custkey"]
    )
    out = _with_tables(
        spark, {"customer": customer, "orders": orders}, "tpch_q13_custdist"
    )
    assert {(r.c_count, r.custdist) for r in out} == {(2, 1), (1, 1), (0, 1)}


# ---------------------------------------------------------------------------
# tpch_q22_idle_customers
# ---------------------------------------------------------------------------


def test_q22_threshold_and_anti_join(spark):
    customer = spark.createDataFrame(
        [
            (1, 100.0, "BUILDING"),  # above avg(60.0), no orders -> kept
            (2, 100.0, "BUILDING"),  # above avg but HAS an order -> dropped
            (3, 20.0, "AUTO"),  # below avg -> dropped
            (4, -5.0, "AUTO"),  # negative: excluded from the avg itself
        ],
        ["c_custkey", "c_acctbal", "c_mktsegment"],
    )
    orders = spark.createDataFrame([(10, 2)], ["o_orderkey", "o_custkey"])
    out = _with_tables(
        spark, {"customer": customer, "orders": orders}, "tpch_q22_idle_customers"
    )
    # avg over positive balances = (100+100+20)/3 = 73.33 -> only cust 1
    assert [(r.c_mktsegment, r.numcust, r.totacctbal) for r in out] == [
        ("BUILDING", 1, 100.0)
    ]


# ---------------------------------------------------------------------------
# tpch_q14_promo_revenue
# ---------------------------------------------------------------------------


def test_q14_ratio_on_tiny_frame(spark):
    lineitem = spark.createDataFrame(
        [
            (1, T0, 100.0, 0.0),  # promo part
            (2, T0, 300.0, 0.0),  # non-promo
            (3, datetime(1999, 1, 1), 900.0, 0.0),  # outside the band
        ],
        ["l_partkey", "l_shipdate", "l_extendedprice", "l_discount"],
    )
    part = spark.createDataFrame(
        [(1, "PROMO"), (2, "ECONOMY"), (3, "PROMO")], ["p_partkey", "p_type"]
    )
    out = _with_tables(
        spark, {"lineitem": lineitem, "part": part}, "tpch_q14_promo_revenue"
    )
    assert out[0].n_rows == 2
    assert out[0].promo_revenue_pct == 25.0  # 100 / (100+300)


# ---------------------------------------------------------------------------
# graph_clustering_coeff / graph_jaccard_neighbors: brute-force twins
# ---------------------------------------------------------------------------


def _candidate_edges(spark):
    from graphdb_wikidata_spark.operators.dedup import _shingled, minhash_candidates

    return [
        (r.doc_a, r.doc_b)
        for r in minhash_candidates(_shingled(spark, SF_SMOKE)).collect()
    ]


def test_clustering_coeff_matches_bruteforce(spark):
    edges = _candidate_edges(spark)
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    expected = {}
    for v, nbrs in adj.items():
        d = len(nbrs)
        if d < 2:
            continue
        tri = sum(1 for x in nbrs for y in nbrs if x < y and y in adj.get(x, ()))
        expected[v] = (d, tri, round(2.0 * tri / (d * (d - 1)), 6))
    out = graph.QUERIES["graph_clustering_coeff"](spark, SF_SMOKE).collect()
    got = {r.doc_id: (r.degree, r.n_triangles, r.clustering_coeff) for r in out}
    assert got == expected
    assert all(0.0 <= c <= 1.0 for _, _, c in got.values())


def test_jaccard_neighbors_matches_bruteforce(spark):
    edges = _candidate_edges(spark)
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    expected = {}
    for a, b in edges:
        common = len(adj[a] & adj[b])
        union = len(adj[a] | adj[b])
        expected[(a, b)] = (common, round(common / union, 6))
    out = graph.QUERIES["graph_jaccard_neighbors"](spark, SF_SMOKE).collect()
    got = {(r.doc_a, r.doc_b): (r.common_neighbors, r.neighbor_jaccard) for r in out}
    assert got == expected
    # one row per candidate edge, scores bounded
    assert len(got) == len(edges)
    assert all(0.0 <= j <= 1.0 for _, j in got.values())
