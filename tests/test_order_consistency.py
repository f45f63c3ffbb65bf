"""Order consistency: the deterministic total order used by ORDER BY /
MIN / MAX (sort_key) must agree with the SPARQL partial comparison
order (cmp_terms) on every pair where the latter is defined, and
cmp_terms must be antisymmetric. Exhaustive over a representative term
matrix (the distributed engine's analogue of the reference's
DataValue::partial_cmp unit tests, data_types.rs:493-525)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graphdb_wikidata_spark.engine.expressions import cmp_terms, eq_terms, sort_key
from graphdb_wikidata_spark.model.schema import statements_from_quads

GREG = "greg"
JUL = "jul"

TERMS = [
    3,
    -7,
    3.5,
    3.0,
    True,
    False,
    "apple",
    "zebra",
    {"type": "mono", "obj_string": "abend", "obj_lang": "de"},
    {"type": "mono", "obj_string": "zug", "obj_lang": "de"},
    {"type": "mono", "obj_string": "yak", "obj_lang": "en"},
    {"type": "qty", "obj_qty": ("5", 5.0, "m", None, None)},
    {"type": "qty", "obj_qty": ("9", 9.0, "m", None, None)},
    {"type": "qty", "obj_qty": ("7", 7.0, "kg", None, None)},
    {"type": "time", "obj_time": (1900, 1, 1, 0, 0, 0, 0, 0, 9, 0, GREG)},
    {"type": "time", "obj_time": (1800, 6, 15, 12, 0, 0, 0, 0, 11, 0, GREG)},
    {"type": "time", "obj_time": (-500, 1, 1, 0, 0, 0, 0, 0, 9, 0, JUL)},
    "Q42",
    "Q7",
]


@pytest.fixture(scope="module")
def pairs(spark):
    quads = [("Q1", "P1", t, f"s{i}") for i, t in enumerate(TERMS)]
    st = statements_from_quads(spark, quads)
    from graphdb_wikidata_spark.engine.scan import scan_pattern
    from graphdb_wikidata_spark.engine.algebra import TriplePattern, Var

    terms = scan_pattern(st, TriplePattern(Var("s"), Var("p"), Var("x"))).select("x")
    a = terms.select(F.col("x").alias("a"))
    b = terms.select(F.col("x").alias("b"))
    df = a.crossJoin(b).select(
        "a",
        "b",
        cmp_terms(F.col("a"), F.col("b"), "<").alias("lt"),
        cmp_terms(F.col("b"), F.col("a"), "<").alias("gt_rev"),
        eq_terms(F.col("a"), F.col("b")).alias("eq"),
        (sort_key(F.col("a")) < sort_key(F.col("b"))).alias("key_lt"),
        (sort_key(F.col("a")) == sort_key(F.col("b"))).alias("key_eq"),
    )
    return df.collect()


def test_total_order_refines_partial_order(pairs):
    for r in pairs:
        if r["lt"] is True:
            assert r["key_lt"] is True, (r["a"], r["b"])


def test_antisymmetry(pairs):
    for r in pairs:
        if r["lt"] is True:
            assert r["gt_rev"] is not True, (r["a"], r["b"])


def test_equality_implies_equal_keys(pairs):
    # '=' equal values (incl. int 3 = double 3.0) sort identically
    for r in pairs:
        if r["eq"] is True:
            assert r["key_eq"] is True, (r["a"], r["b"])


def test_defined_comparisons_are_total_within_class(pairs):
    # same-unit quantities, same-calendar times, same-language mono:
    # exactly one of <, =, > holds
    for r in pairs:
        a, b = r["a"], r["b"]
        if a["t"] == b["t"] == "qty" and a["qty"]["unit"] == b["qty"]["unit"]:
            assert (r["lt"] is True) or (r["gt_rev"] is True) or (r["eq"] is True)
        if a["t"] == b["t"] == "time" and a["time"]["cal"] == b["time"]["cal"]:
            assert (r["lt"] is True) or (r["gt_rev"] is True) or (r["eq"] is True)
