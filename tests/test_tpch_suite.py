"""Wave-6 TPC-H completions (Q2/Q7/Q8/Q9/Q11/Q12/Q15/Q16/Q17/Q19/Q20/Q21).

Oracle hash-equality is covered by test_entry_queries.py's generic
parametrization; these tests pin the properties the oracle can't see:
plan shapes (pushdown, no all-pairs joins), the decorrelation
equivalence for Q21, and the threshold/tie semantics that make the
scalar-subquery queries deterministic.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from graphdb_wikidata_spark.operators.tpch import QUERIES
from graphdb_wikidata_spark.tables import table

from tests.conftest import SF_SMOKE


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_q19_disjunction_pushes_quantity_band_to_lineitem_scan(spark):
    # Catalyst must extract the cross-disjunct common conjuncts and push
    # them into the scans: the lineitem side gets a quantity band, the
    # part side a brand/size disjunction. If either scan shows no pushed
    # filter the OR was evaluated post-join on the full fact.
    plan = _plan(QUERIES["tpch_q19_disjunctive_revenue"](spark, SF_SMOKE))
    assert "PushedFilters: [" in plan
    assert "l_quantity" in plan.split("ReadSchema")[0] or "l_quantity" in plan


def test_q2_rows_are_the_per_part_minimum(spark):
    rows = QUERIES["tpch_q2_min_cost_supplier"](spark, SF_SMOKE).collect()
    assert rows, "q2 returned nothing at sf0.001 — filter constants too tight"
    best: dict[int, float] = {}
    for r in rows:
        best.setdefault(r.p_partkey, r.unit_cost)
        assert r.unit_cost == best[r.p_partkey]


def test_q15_all_rows_tie_at_the_max(spark):
    rows = QUERIES["tpch_q15_top_supplier"](spark, SF_SMOKE).collect()
    assert rows
    assert len({r.total_revenue for r in rows}) == 1


def test_q11_rows_all_exceed_twice_mean(spark):
    rows = QUERIES["tpch_q11_important_stock"](spark, SF_SMOKE).collect()
    assert rows
    # recompute the threshold independently from the full per-part values
    li = table(spark, SF_SMOKE, "lineitem")
    s = table(spark, SF_SMOKE, "supplier")
    n = table(spark, SF_SMOKE, "nation")
    r = table(spark, SF_SMOKE, "region").filter(F.col("r_name") == "AFRICA")
    pv = (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(n, s.s_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("l_partkey")
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * F.col("l_quantity").cast("decimal(18,2)")
            ).alias("value")
        )
    )
    agg = pv.agg(
        F.sum("value").cast("double").alias("total"), F.count(F.lit(1)).alias("n")
    ).collect()[0]
    thr = 2.0 * agg.total / agg.n
    for row in rows:
        assert row.value > thr - 0.01  # rounded output vs exact threshold


def test_q21_decorrelation_matches_exists_formulation(spark):
    # The shipped plan replaces the double-correlated EXISTS with one
    # per-order aggregate; verify against a literal semi/anti-join
    # translation of the oracle's EXISTS form.
    li = table(spark, SF_SMOKE, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_returnflag"
    )
    o = table(spark, SF_SMOKE, "orders").filter(F.col("o_orderstatus") == "F")
    l1 = li.filter(F.col("l_returnflag") == "R").join(
        o.select("o_orderkey"), F.col("l_orderkey") == F.col("o_orderkey")
    )
    l2 = li.select(
        F.col("l_orderkey").alias("x_orderkey"), F.col("l_suppkey").alias("x_suppkey")
    )
    l3 = li.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("y_orderkey"), F.col("l_suppkey").alias("y_suppkey")
    )
    exists = l1.join(
        l2,
        (F.col("l_orderkey") == F.col("x_orderkey"))
        & (F.col("l_suppkey") != F.col("x_suppkey")),
        "left_semi",
    )
    not_exists = exists.join(
        l3,
        (F.col("l_orderkey") == F.col("y_orderkey"))
        & (F.col("l_suppkey") != F.col("y_suppkey")),
        "left_anti",
    )
    s = table(spark, SF_SMOKE, "supplier")
    n = table(spark, SF_SMOKE, "nation")
    r = table(spark, SF_SMOKE, "region").filter(F.col("r_name") == "MIDDLE EAST")
    direct = (
        not_exists.join(s, F.col("l_suppkey") == s.s_suppkey)
        .join(n, s.s_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("s_name", "s_suppkey")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name", "s_suppkey")
        .limit(25)
    )
    got = [tuple(x) for x in QUERIES["tpch_q21_waiting_orders"](spark, SF_SMOKE).collect()]
    want = [tuple(x) for x in direct.collect()]
    assert got == want


def test_q8_share_bounded_and_nonempty(spark):
    rows = QUERIES["tpch_q8_market_share"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.mkt_share_pct <= 100.0


def test_dimension_joins_broadcast(spark):
    # nation/region attach by broadcast in every wave-6 plan that uses
    # them — a shuffle of a 25-row dimension would be a plan bug.
    for name in ("tpch_q7_volume_shipping", "tpch_q9_product_profit"):
        plan = _plan(QUERIES[name](spark, SF_SMOKE))
        assert "BroadcastHashJoin" in plan, name


def test_no_cartesian_outside_scalar_broadcast(spark):
    # The scalar-threshold joins (q11/q15/q20) are single-row broadcast
    # nested loops by construction; every other wave-6 plan must be free
    # of non-equi join fallbacks.
    for name in (
        "tpch_q2_min_cost_supplier",
        "tpch_q7_volume_shipping",
        "tpch_q8_market_share",
        "tpch_q9_product_profit",
        "tpch_q12_shipmode_priority",
        "tpch_q16_supplier_cnt",
        "tpch_q19_disjunctive_revenue",
        "tpch_q21_waiting_orders",
    ):
        plan = _plan(QUERIES[name](spark, SF_SMOKE))
        assert "CartesianProduct" not in plan, name
