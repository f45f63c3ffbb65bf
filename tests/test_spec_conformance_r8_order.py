"""SPARQL 1.1 §15.1 cross-class ORDER BY conformance (round 8).

§15.1 normatively fixes the order BETWEEN term classes: unbound <
blank < IRI < literal. The engine's sort_key previously ranked
literals before IRIs; this suite pins the spec class order. (Within
the IRI class, entities order by (kind, numeric id) — a declared
deviation from full-IRI codepoint order, see sort_key's docstring;
within-literal cross-datatype order is implementation-defined.)
"""

from __future__ import annotations

import pytest

from graphdb_wikidata_spark.engine import GraphEngine
from graphdb_wikidata_spark.model.schema import statements_from_quads


@pytest.fixture(scope="module")
def eng(spark):
    # ?v mixes classes: entities Q9/Q100, int 5, string "apple"
    return GraphEngine(
        spark,
        statements_from_quads(
            spark,
            [
                ("Q1", "P2", "Q9", "s1"),
                ("Q1", "P2", 5, "s2"),
                ("Q1", "P2", "apple", "s3"),
                ("Q1", "P2", "Q100", "s4"),
            ],
        ),
    )


def _order(eng, direction="ASC"):
    rows = eng.sql(
        "SELECT ?v WHERE { ?s <http://www.wikidata.org/prop/direct/P2> ?v . }"
        f" ORDER BY {direction}(?v)"
    ).collect()
    return [(r["v"]["t"], r["v"]["e"] if r["v"]["t"] == "entity" else None) for r in rows]


def test_iris_sort_before_literals(eng):
    got = _order(eng)
    assert got == [
        ("entity", 9),
        ("entity", 100),
        ("int", None),
        ("str", None),
    ]


def test_desc_reverses_class_order(eng):
    got = _order(eng, "DESC")
    assert got == [
        ("str", None),
        ("int", None),
        ("entity", 100),
        ("entity", 9),
    ]


def test_unbound_sorts_first(eng):
    # OPTIONAL misses for the literal-valued rows' objects: build a
    # column with some unbound values via OPTIONAL on a non-existent
    # predicate, then sort by it — unbound rows come first ASC
    rows = eng.sql(
        """
        SELECT ?v ?w WHERE {
          ?s <http://www.wikidata.org/prop/direct/P2> ?v .
          OPTIONAL { ?v <http://www.wikidata.org/prop/direct/P3> ?w . }
        } ORDER BY ?w ?v
        """
    ).collect()
    assert all(r["w"] is None for r in rows)  # P3 never matches
    assert len(rows) == 4


def test_min_mixed_class_prefers_iri(eng):
    r = eng.sql(
        """
        SELECT (MIN(?v) AS ?m) (MAX(?v) AS ?x) WHERE {
          ?s <http://www.wikidata.org/prop/direct/P2> ?v .
        }
        """
    ).collect()[0]
    assert r["m"]["t"] == "entity" and r["m"]["e"] == 9
    assert r["x"]["t"] == "str" and r["x"]["s"] == "apple"
