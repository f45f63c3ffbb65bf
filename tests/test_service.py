"""SERVICE federation over registered datasets.

The reference declares Service in its IR (calc_data_types.rs:117-205)
but the interpreter recognizes only wikibase:label and panics on every
other SERVICE IRI (interpreter.rs:655-659). Here any IRI registered
via GraphEngine.register_service executes for real, in-plan; SILENT
failure yields the unit solution per SPARQL 1.1 Federated Query §2.3.
"""

from __future__ import annotations

import pytest

from graphdb_wikidata_spark.engine import GraphEngine
from graphdb_wikidata_spark.model.schema import statements_from_quads

SVC = "http://example.org/svc/remote"

LOCAL_QUADS = [
    ("Q1", "P1", "Q2", "s1"),
    ("Q3", "P1", "Q4", "s2"),
    ("Q5", "P1", "Q6", "s3"),
]

# the "remote" dataset knows extra facts about some of the objects
REMOTE_QUADS = [
    ("Q2", "P9", "Q100", "r1"),
    ("Q6", "P9", "Q101", "r2"),
    ("Q7", "P9", "Q102", "r3"),
]


@pytest.fixture(scope="module")
def eng(spark):
    e = GraphEngine(spark, statements_from_quads(spark, LOCAL_QUADS))
    e.register_service(SVC, statements_from_quads(spark, REMOTE_QUADS))
    return e


def test_service_joins_with_outer_pattern(eng):
    rows = eng.sql(
        f"""
        SELECT ?s ?o ?x WHERE {{
          ?s wdt:P1 ?o .
          SERVICE <{SVC}> {{ ?o wdt:P9 ?x . }}
        }}
        """
    ).collect()
    got = sorted((r["s"]["e"], r["o"]["e"], r["x"]["e"]) for r in rows)
    assert got == [(1, 2, 100), (5, 6, 101)]


def test_service_alone(eng):
    rows = eng.sql(f"SELECT ?a ?b WHERE {{ SERVICE <{SVC}> {{ ?a wdt:P9 ?b . }} }}").collect()
    assert sorted(r["a"]["e"] for r in rows) == [2, 6, 7]


def test_service_body_is_remote_not_local(eng):
    # P1 edges exist only locally: the service body must not see them
    rows = eng.sql(f"SELECT ?s WHERE {{ SERVICE <{SVC}> {{ ?s wdt:P1 ?o . }} }}").collect()
    assert rows == []


def test_unregistered_service_raises(eng):
    with pytest.raises(KeyError, match="not registered"):
        eng.sql("SELECT ?x WHERE { SERVICE <http://example.org/svc/absent> { ?x wdt:P9 ?y . } }")


def test_silent_unregistered_is_unit_solution(eng):
    # §2.3: SILENT failure = the unit solution, so the outer pattern's
    # rows pass through with the service vars unbound
    rows = eng.sql(
        """
        SELECT ?s ?x WHERE {
          ?s wdt:P1 ?o .
          SERVICE SILENT <http://example.org/svc/absent> { ?o wdt:P9 ?x . }
        }
        """
    ).collect()
    assert sorted(r["s"]["e"] for r in rows) == [1, 3, 5]
    assert all(r["x"] is None for r in rows)


def test_silent_registered_still_filters(eng):
    # SILENT only rescues FAILURE; a working service that simply has
    # no match for some rows still joins (drops non-matching rows)
    rows = eng.sql(
        f"""
        SELECT ?s WHERE {{
          ?s wdt:P1 ?o .
          SERVICE SILENT <{SVC}> {{ ?o wdt:P9 ?x . }}
        }}
        """
    ).collect()
    assert sorted(r["s"]["e"] for r in rows) == [1, 5]


def test_register_engine_as_service(spark, eng):
    other = GraphEngine(spark, statements_from_quads(spark, REMOTE_QUADS))
    eng.register_service("http://example.org/svc/eng", other)
    try:
        rows = eng.sql(
            "SELECT ?b WHERE { SERVICE <http://example.org/svc/eng> { wd:Q7 wdt:P9 ?b . } }"
        ).collect()
        assert [r["b"]["e"] for r in rows] == [102]
    finally:
        eng.unregister_service("http://example.org/svc/eng")


def test_optional_service(eng):
    # OPTIONAL { SERVICE ... }: non-matching outer rows survive unbound
    rows = eng.sql(
        f"""
        SELECT ?s ?x WHERE {{
          ?s wdt:P1 ?o .
          OPTIONAL {{ SERVICE <{SVC}> {{ ?o wdt:P9 ?x . }} }}
        }}
        """
    ).collect()
    got = sorted(
        ((r["s"]["e"], r["x"]["e"] if r["x"] is not None else None) for r in rows),
        key=str,
    )
    assert got == sorted([(1, 100), (3, None), (5, 101)], key=str)


def test_label_service_unaffected(eng):
    # the wikibase:label SERVICE keeps its rewrite path
    plan = eng.plan(
        """
        SELECT ?s ?sLabel WHERE {
          ?s wdt:P1 ?o .
          SERVICE wikibase:label { bd:serviceParam wikibase:language "en". }
        }
        """
    )
    assert plan is not None
