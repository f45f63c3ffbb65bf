"""All 8 bound/unbound combinations of (s, p, o) for the triple-pattern
scan, plus Pstmt/statement-id routing and repeated-variable patterns —
the port of the reference's 14 triplepattern_match tests
(calc_engine.rs:3479-3756) onto the quad DSL."""

from __future__ import annotations

import pytest

from graphdb_wikidata_spark.engine import GraphEngine
from graphdb_wikidata_spark.model.schema import statements_from_quads

QUADS = [
    ("Q1", "P2", "Q3", "s1"),
    ("Q1", "P2", 5, "s2"),
    ("Q4", "P2", "Q3", "s3"),
    ("Q1", "P7", "Q4", "s4"),
    (("stmt", "s1"), "P9", "Q8", "s5"),  # qualifier off statement s1
]


@pytest.fixture(scope="module")
def eng(spark):
    return GraphEngine(spark, statements_from_quads(spark, QUADS))


def n(eng, s, p, o):
    return eng.scan_pattern(s, p, o).count()


def test_vvv(eng):
    assert n(eng, None, None, None) == 5


def test_bvv(eng):
    assert n(eng, "http://www.wikidata.org/entity/Q1", None, None) == 3


def test_vbv(eng):
    assert n(eng, None, "http://www.wikidata.org/prop/direct/P2", None) == 3


def test_vvb(eng):
    assert n(eng, None, None, "http://www.wikidata.org/entity/Q3") == 2


def test_bbv(eng):
    assert (
        n(
            eng,
            "http://www.wikidata.org/entity/Q1",
            "http://www.wikidata.org/prop/direct/P2",
            None,
        )
        == 2
    )


def test_bvb(eng):
    assert (
        n(
            eng,
            "http://www.wikidata.org/entity/Q1",
            None,
            "http://www.wikidata.org/entity/Q3",
        )
        == 1
    )


def test_vbb(eng):
    assert (
        n(
            eng,
            None,
            "http://www.wikidata.org/prop/direct/P2",
            "http://www.wikidata.org/entity/Q3",
        )
        == 2
    )


def test_bbb(eng):
    assert (
        n(
            eng,
            "http://www.wikidata.org/entity/Q1",
            "http://www.wikidata.org/prop/direct/P2",
            "http://www.wikidata.org/entity/Q3",
        )
        == 1
    )


def test_pstmt_binds_statement_ids(eng):
    # p:P2 binds the statement id, not the object (calc_engine.rs:3135-3141)
    rows = (
        eng.scan_pattern("http://www.wikidata.org/entity/Q1",
                         "http://www.wikidata.org/prop/P2", "?stmt")
        .collect()
    )
    assert sorted(r["stmt"]["s"] for r in rows) == ["s1", "s2"]


def test_statement_id_object_lookup(eng):
    # a wds: object constrains the statement id (calc_engine.rs:3119-3124)
    df = eng.sql(
        'SELECT ?s ?p WHERE { ?s ?p <http://www.wikidata.org/entity/statement/s3> . }'
    )
    rows = df.collect()
    assert len(rows) == 1
    assert rows[0]["s"]["e"] == 4


def test_qualifier_subject_scan(eng):
    # the qualifier edge hangs off the statement node as subject
    df = eng.sql(
        'SELECT ?p ?o WHERE { <http://www.wikidata.org/entity/statement/s1> ?p ?o . }'
    )
    rows = df.collect()
    assert len(rows) == 1
    assert rows[0]["o"]["e"] == 8


def test_repeated_variable(eng):
    # ?x P2 ?x: no subject equals its own object here
    assert eng.sql("SELECT ?x WHERE { ?x wdt:P2 ?x . }").count() == 0


def test_nonproperty_predicate_matches_nothing(eng):
    assert n(eng, None, "http://www.wikidata.org/entity/Q3", None) == 0


def test_ps_routes_to_statement_value(eng):
    """ps:Pn matches the claim row itself, subject = statement node."""
    via_ps = eng.sql("SELECT ?o ?b WHERE { ?o p:P2 ?st . ?st ps:P2 ?b . }").count()
    direct = eng.sql("SELECT ?o ?b WHERE { ?o wdt:P2 ?b . }").count()
    assert via_ps == direct == 3
    bound = eng.sql("SELECT ?b WHERE { wds:s1 ps:P2 ?b . }").collect()
    assert [r["b"]["e"] for r in bound] == [3]


def test_pq_only_matches_qualifier_edges(eng):
    """pq:Pn is restricted to edges off statement nodes."""
    assert eng.sql("SELECT ?st ?q WHERE { ?st pq:P9 ?q . }").count() == 1
    # an entity subject bound through pq: yields nothing, even for a
    # predicate that exists on entity subjects
    assert eng.sql("SELECT ?b WHERE { wd:Q1 pq:P2 ?b . }").count() == 0


def test_psv_unmapped_matches_nothing(eng):
    """psv:/pqv: value-node forms are not modeled (no wdv: nodes) and
    must match nothing rather than mis-route."""
    assert eng.sql("SELECT ?s ?b WHERE { ?s psv:P2 ?b . }").count() == 0


# ---- union_stmt_forms: the pinned bound-subject/var-predicate decision
# (reference calc_engine.rs:3182-3203 vs published cardinalities — see
# engine/scan.py module docstring)


@pytest.fixture(scope="module")
def eng_union(spark):
    return GraphEngine(
        spark, statements_from_quads(spark, QUADS), union_stmt_forms=True
    )


def test_bvv_union_mode_doubles_claim_edges(eng_union):
    # Q1's 3 claim edges each appear as (wdt:P, value) AND (p:P, wds:id)
    rows = eng_union.scan_pattern(
        "http://www.wikidata.org/entity/Q1", None, None
    ).collect()
    assert len(rows) == 6
    stmt_form = sorted(r["o"]["s"] for r in rows if r["o"]["t"] == "stmt")
    assert stmt_form == ["s1", "s2", "s4"]
    assert sum(1 for r in rows if r["p"]["k"] == "Pstmt") == 3
    assert sum(1 for r in rows if r["p"]["k"] == "P") == 3


def test_bvv_union_mode_stmt_subject_single_form(eng_union):
    # qualifier edges (stmt subject) have no second form: their
    # statement_id is the edge id, not a wds: statement node
    df = eng_union.sql(
        "SELECT ?p ?o WHERE { <http://www.wikidata.org/entity/statement/s1> ?p ?o . }"
    )
    assert df.count() == 1


def test_union_mode_leaves_other_dispatch_arms_alone(eng_union):
    # var-subject and bound-predicate cases are single-form in BOTH the
    # reference and here (the union arm is (bound, var, var) only)
    assert n(eng_union, None, None, None) == 5
    assert n(eng_union, None, "http://www.wikidata.org/prop/direct/P2", None) == 3
    assert (
        n(
            eng_union,
            "http://www.wikidata.org/entity/Q1",
            "http://www.wikidata.org/prop/direct/P2",
            None,
        )
        == 2
    )


def test_default_mode_is_single_form(eng):
    # the default pins the reference's PUBLISHED counts
    # (test_requests.txt:15-20), not its code path
    assert n(eng, "http://www.wikidata.org/entity/Q1", None, None) == 3
