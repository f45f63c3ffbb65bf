"""Named-graph (GRAPH) semantics over the quad column graph_id.

The reference IR declares Graph but never executes it
(calc_data_types.rs:117-205); semantics here follow SPARQL 1.1 §13.3:
patterns outside GRAPH see the default graph only, GRAPH <iri> scopes
to one named graph, GRAPH ?g ranges over named graphs binding ?g, and
all triples of one solution inside GRAPH ?g come from the same graph.
"""

from __future__ import annotations

import pytest

from graphdb_wikidata_spark.engine import GraphEngine
from graphdb_wikidata_spark.model.schema import statements_from_quads

G1 = "http://example.org/g/one"
G2 = "http://example.org/g/two"

QUADS = [
    # default graph
    ("Q1", "P1", "Q2", "s1"),
    ("Q2", "P1", "Q3", "s2"),
    # graph one: its own edge pair (chain within one graph)
    ("Q1", "P1", "Q4", "g1a", G1),
    ("Q4", "P1", "Q5", "g1b", G1),
    # graph two: an edge from Q1, but the continuation lives in g/one
    ("Q1", "P1", "Q6", "g2a", G2),
    ("Q6", "P1", "Q7", "g1c", G1),
]


@pytest.fixture(scope="module")
def eng(spark):
    return GraphEngine(spark, statements_from_quads(spark, QUADS))


def _vals(rows, var):
    return sorted(r[var]["e"] for r in rows)


def test_default_graph_excludes_named(eng):
    rows = eng.sql("SELECT ?o WHERE { wd:Q1 wdt:P1 ?o . }").collect()
    assert _vals(rows, "o") == [2]


def test_graph_bound_iri(eng):
    rows = eng.sql(f"SELECT ?o WHERE {{ GRAPH <{G1}> {{ wd:Q1 wdt:P1 ?o . }} }}").collect()
    assert _vals(rows, "o") == [4]


def test_graph_var_binds_and_ranges_named_only(eng):
    rows = eng.sql(
        "SELECT ?g ?o WHERE { GRAPH ?g { wd:Q1 wdt:P1 ?o . } }"
    ).collect()
    got = sorted((r["g"]["s"], r["o"]["e"]) for r in rows)
    assert got == [(G1, 4), (G2, 6)]


def test_bgp_inside_graph_var_stays_in_one_graph(eng):
    # Q1->Q4->Q5 completes inside g/one; Q1->Q6 (g/two) has its
    # continuation in g/one, so it must NOT produce a solution
    rows = eng.sql(
        "SELECT ?g ?b WHERE { GRAPH ?g { wd:Q1 wdt:P1 ?a . ?a wdt:P1 ?b . } }"
    ).collect()
    got = [(r["g"]["s"], r["b"]["e"]) for r in rows]
    assert got == [(G1, 5)]


def test_graph_join_with_default_pattern(eng):
    rows = eng.sql(
        f"""
        SELECT ?o ?n WHERE {{
          wd:Q1 wdt:P1 ?o .
          GRAPH <{G1}> {{ wd:Q4 wdt:P1 ?n . }}
        }}
        """
    ).collect()
    assert [(r["o"]["e"], r["n"]["e"]) for r in rows] == [(2, 5)]


def test_graph_absent_iri_empty(eng):
    rows = eng.sql(
        "SELECT ?o WHERE { GRAPH <http://example.org/g/none> { ?s wdt:P1 ?o . } }"
    ).collect()
    assert rows == []


def test_path_inside_bound_graph(eng):
    rows = eng.sql(
        f"SELECT ?o WHERE {{ GRAPH <{G1}> {{ wd:Q1 wdt:P1+ ?o . }} }}"
    ).collect()
    assert _vals(rows, "o") == [4, 5]


def test_path_inside_graph_var(eng):
    # per-graph closure: g/one's chain from Q1 is Q4->Q5; g/two has
    # only Q1->Q6 (the Q6->Q7 edge lives in g/one, so the closure must
    # NOT cross graphs)
    rows = eng.sql("SELECT ?g ?o WHERE { GRAPH ?g { wd:Q1 wdt:P1+ ?o . } }").collect()
    got = sorted((r["g"]["s"], r["o"]["e"]) for r in rows)
    assert got == [(G1, 4), (G1, 5), (G2, 6)]


def test_path_inside_graph_var_repeated_var(eng):
    # graph var repeated as an endpoint: equality-constrained per graph
    rows = eng.sql("SELECT ?g WHERE { GRAPH ?g { ?g wdt:P1+ wd:Q5 . } }").collect()
    assert rows == []


def test_path_inside_graph_var_from_named(eng):
    # FROM NAMED restricts the per-graph loop to the listed graphs
    rows = eng.sql(
        f"SELECT ?g ?o FROM NAMED <{G2}> WHERE {{ GRAPH ?g {{ wd:Q1 wdt:P1+ ?o . }} }}"
    ).collect()
    assert sorted((r["g"]["s"], r["o"]["e"]) for r in rows) == [(G2, 6)]


def test_graph_filter_pushes_to_parquet(spark, eng, tmp_path_factory):
    """The 100 TB design point for named graphs: the graph_id filter
    (both the default-graph IS NULL and the bound-graph equality) must
    reach the parquet scan as a pushed filter, so GRAPH <iri> prunes at
    the storage layer instead of post-scan."""
    from graphdb_wikidata_spark.engine.algebra import TriplePattern, Var
    from graphdb_wikidata_spark.engine.scan import scan_pattern
    from graphdb_wikidata_spark.engine.terms import Term

    path = str(tmp_path_factory.mktemp("ng") / "stmts.parquet")
    statements_from_quads(spark, QUADS).write.parquet(path)
    stmts = spark.read.parquet(path)
    tp = TriplePattern(Var("s"), Var("p"), Var("o"))

    plan = scan_pattern(stmts, tp)._jdf.queryExecution().executedPlan().toString()
    assert "IsNull(graph_id)" in plan, plan

    g = Term(t="str", k="string", s=G1)
    plan = scan_pattern(stmts, tp, graph=g)._jdf.queryExecution().executedPlan().toString()
    assert "EqualTo(graph_id," in plan, plan


def test_graph_var_certainly_bound(eng):
    # ?g from GRAPH is certainly bound: joining two GRAPH blocks on ?g
    # must use the plain equality path and agree on the graph
    rows = eng.sql(
        "SELECT ?g WHERE { GRAPH ?g { wd:Q1 wdt:P1 ?o . } GRAPH ?g { wd:Q6 wdt:P1 ?n . } }"
    ).collect()
    assert [r["g"]["s"] for r in rows] == [G1]


# ---- FROM / FROM NAMED dataset clauses (SPARQL 1.1 §13.2) ----------------


def test_from_merges_named_graphs_into_default(eng):
    # FROM <g1> FROM <g2>: default graph = merge of the two named
    # graphs; the default-graph rows (Q1->Q2) are NOT in the dataset
    rows = eng.sql(
        f"SELECT ?o FROM <{G1}> FROM <{G2}> WHERE {{ wd:Q1 wdt:P1 ?o . }}"
    ).collect()
    assert _vals(rows, "o") == [4, 6]


def test_from_named_only_empties_default_graph(eng):
    rows = eng.sql(
        f"SELECT ?o FROM NAMED <{G1}> WHERE {{ wd:Q1 wdt:P1 ?o . }}"
    ).collect()
    assert rows == []


def test_from_named_restricts_graph_var(eng):
    rows = eng.sql(
        f"SELECT ?g ?o FROM NAMED <{G1}> WHERE {{ GRAPH ?g {{ wd:Q1 wdt:P1 ?o . }} }}"
    ).collect()
    assert _vals(rows, "o") == [4]
    assert [r["g"]["s"] for r in rows] == [G1]


def test_graph_iri_outside_from_named_is_empty(eng):
    rows = eng.sql(
        f"SELECT ?o FROM NAMED <{G1}> WHERE {{ GRAPH <{G2}> {{ wd:Q1 wdt:P1 ?o . }} }}"
    ).collect()
    assert rows == []


def test_from_without_named_leaves_graph_empty(eng):
    rows = eng.sql(
        f"SELECT ?g ?o FROM <{G1}> WHERE {{ GRAPH ?g {{ ?s wdt:P1 ?o . }} }}"
    ).collect()
    assert rows == []


def test_path_closure_inside_from(eng):
    # +-closure over the FROM-merged default graph: g/one's chain only
    rows = eng.sql(f"SELECT ?o FROM <{G1}> WHERE {{ wd:Q1 wdt:P1+ ?o . }}").collect()
    assert _vals(rows, "o") == [4, 5]


def test_from_ask_and_describe_forms(eng):
    assert eng.sql(f"ASK FROM <{G1}> {{ wd:Q4 wdt:P1 ?o . }}").count() == 1
    assert eng.sql(f"ASK FROM NAMED <{G1}> {{ wd:Q4 wdt:P1 ?o . }}").count() == 0
    # DESCRIBE wd:Q1 under FROM <g2>: only the g/two statement about Q1
    rows = eng.sql(f"DESCRIBE wd:Q1 FROM <{G2}>").collect()
    assert len(rows) == 1
    assert rows[0]["object"]["e"] == 6
