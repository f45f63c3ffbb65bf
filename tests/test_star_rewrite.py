"""Subject-star rewrite (property-table transform, SURVEY §4.2's
optional statements self-join rewrite): semantics and applicability.

The rewrite replaces N same-subject patterns with one scan + groupBy
ONLY when every predicate is functional (exactly one statement per
subject). These tests pin the fallback behavior: non-functional
predicates must keep join multiplicity, and partial stars (subject
missing one predicate) must drop the subject like an inner join.
"""

from __future__ import annotations

import pytest

from graphdb_wikidata_spark.engine import GraphEngine
from graphdb_wikidata_spark.model.schema import statements_from_quads

# Q1/Q2: both P2 and P3 exactly once -> star-eligible
# Q4: only P2 -> must vanish from the star result (inner join)
# P5 appears twice on Q1 -> NON-functional; joins must fan out
QUADS = [
    ("Q1", "P2", 10, "s1"),
    ("Q1", "P3", "a", "s2"),
    ("Q2", "P2", 20, "s3"),
    ("Q2", "P3", "b", "s4"),
    ("Q4", "P2", 40, "s5"),
    ("Q1", "P5", "x", "s6"),
    ("Q1", "P5", "y", "s7"),
]


@pytest.fixture(scope="module")
def eng(spark):
    return GraphEngine(spark, statements_from_quads(spark, QUADS))


def test_functional_star_fires_and_matches_join_semantics(eng):
    df = eng.sql("SELECT ?s ?a ?b WHERE { ?s wdt:P2 ?a . ?s wdt:P3 ?b . }")
    rows = {(r["s"]["e"], r["a"]["i"], r["b"]["s"]) for r in df.collect()}
    assert rows == {(1, 10, "a"), (2, 20, "b")}  # Q4 dropped: no P3
    # the rewrite actually fired: no join operator in the plan
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "simple"
    )
    assert "Join" not in plan


def test_non_functional_predicate_falls_back_to_join(eng):
    df = eng.sql("SELECT ?s ?a ?v WHERE { ?s wdt:P2 ?a . ?s wdt:P5 ?v . }")
    rows = {(r["s"]["e"], r["a"]["i"], r["v"]["s"]) for r in df.collect()}
    # P5 is multi-valued on Q1 -> two rows, not a collapsed one
    assert rows == {(1, 10, "x"), (1, 10, "y")}


def test_three_pattern_star(eng):
    df = eng.sql(
        "SELECT ?s ?a ?b (STRLEN(?b) AS ?l) WHERE "
        "{ ?s wdt:P2 ?a . ?s wdt:P3 ?b . FILTER(?a > 5) }"
    )
    rows = {(r["s"]["e"], r["a"]["i"], r["b"]["s"], r["l"]["i"]) for r in df.collect()}
    assert rows == {(1, 10, "a", 1), (2, 20, "b", 1)}


def test_star_with_bound_object_pattern_excluded(eng):
    # the bound-object pattern can't join the star (no plain object
    # var) but still constrains via the shared subject variable
    df = eng.sql('SELECT ?s ?a WHERE { ?s wdt:P2 ?a . ?s wdt:P3 "a" . }')
    rows = {(r["s"]["e"], r["a"]["i"]) for r in df.collect()}
    assert rows == {(1, 10)}
