"""SPARQL 1.1 spec-conformance fixes from the round-7 engine-core
review — each test pins a behavior where the engine previously
diverged from the spec (and where the DuckDB oracles could not catch
it, since they share the author's reading):

- §18.5 ZeroLengthPath matches any term regardless of graph membership
- repeated endpoint variables through composite paths
- §17.4.1.2 IF propagates an errored condition as an error
- §17.4.2.8 IRI() of an IRI returns it unchanged
- fn:substring position-window semantics for SUBSTR
- §17.4.3.1 string-argument compatibility (lang-tag) errors
- §17.4.3.4 no-match STRBEFORE/STRAFTER yields the empty SIMPLE literal
- fn:encode-for-uri percent-encodes '*'
- REGEX/REPLACE honor non-literal (computed/variable) flags
"""

from __future__ import annotations

import pytest

from graphdb_wikidata_spark.engine import GraphEngine
from graphdb_wikidata_spark.model.schema import statements_from_quads

P1 = "<http://www.wikidata.org/prop/direct/P1>"
Q = "http://www.wikidata.org/entity/Q"


@pytest.fixture(scope="module")
def eng(spark):
    return GraphEngine(
        spark,
        statements_from_quads(
            spark,
            [
                ("Q1", "P1", "Q2", "s1"),
                ("Q2", "P1", "Q1", "s2"),  # 2-cycle
                ("Q3", "P1", "Q4", "s3"),
            ],
        ),
    )


def test_repeated_endpoint_var_through_closure(eng):
    rows = eng.sql(f"SELECT ?x WHERE {{ ?x {P1}+ ?x }}").collect()
    assert sorted(r["x"]["e"] for r in rows) == [1, 2]


def test_repeated_endpoint_var_through_sequence(eng):
    rows = eng.sql(f"SELECT ?x WHERE {{ ?x {P1}/{P1} ?x }}").collect()
    assert sorted(r["x"]["e"] for r in rows) == [1, 2]


@pytest.mark.parametrize("path", ["?", "*"])
def test_zero_length_path_matches_terms_outside_the_graph(eng, path):
    # Q99 never appears in the data; the zero-length path still matches
    assert eng.sql(f"ASK {{ <{Q}99> {P1}{path} <{Q}99> }}").collect()
    rows = eng.sql(f"SELECT ?y WHERE {{ <{Q}99> {P1}{path} ?y }}").collect()
    assert [r["y"]["e"] for r in rows] == [99]


def test_zero_length_path_bound_unequal_terms_still_require_a_path(eng):
    assert not eng.sql(f"ASK {{ <{Q}99> {P1}? <{Q}98> }}").collect()
    assert eng.sql(f"ASK {{ <{Q}1> {P1}? <{Q}2> }}").collect()


def test_if_propagates_errored_condition(eng):
    rows = eng.sql(
        f"""SELECT ?r WHERE {{ ?s {P1} ?o .
            OPTIONAL {{ ?s <http://www.wikidata.org/prop/direct/P99> ?m }}
            BIND(IF(?m, 1, 2) AS ?r) }}"""
    ).collect()
    assert rows and all(r["r"] is None for r in rows)  # error, never "2"


def test_iri_of_an_iri_is_identity(eng):
    rows = eng.sql(f"SELECT ?u WHERE {{ ?s {P1} ?o . BIND(IRI(?s) AS ?u) }}").collect()
    assert sorted(r["u"]["e"] for r in rows) == [1, 2, 3]
    assert all(r["u"]["t"] == "entity" for r in rows)


def _bind1(eng, expr):
    return eng.sql(f"SELECT ?x WHERE {{ BIND({expr} AS ?x) }}").collect()[0]["x"]


def test_substr_fn_substring_semantics(eng):
    assert _bind1(eng, 'SUBSTR("12345", 0, 3)')["s"] == "12"
    assert _bind1(eng, 'SUBSTR("12345", -2)')["s"] == "12345"
    assert _bind1(eng, 'SUBSTR("12345", 1.5, 2.6)')["s"] == "234"
    assert _bind1(eng, 'SUBSTR("12345", 2)')["s"] == "2345"
    assert _bind1(eng, 'SUBSTR("12345", 2, 2)')["s"] == "23"


def test_strbefore_strafter_lang_and_no_match(eng):
    m = _bind1(eng, 'STRBEFORE("abc"@en, "b")')
    assert (m["t"], m["s"], m["lang"]) == ("mono", "a", "en")
    nm = _bind1(eng, 'STRBEFORE("abc"@en, "z")')
    assert (nm["t"], nm["s"]) == ("str", "")  # empty SIMPLE literal
    e = _bind1(eng, 'STRAFTER("abc"@en, "")')
    assert (e["t"], e["s"], e["lang"]) == ("mono", "abc", "en")


def test_string_argument_compatibility_errors(eng):
    assert not eng.sql(
        '''ASK { ?s ?p ?o . FILTER(STRSTARTS("abc"@en, "b"@cy)) }'''
    ).collect()
    assert eng.sql(
        '''ASK { ?s ?p ?o . FILTER(STRSTARTS("abc"@en, "ab"@en)) }'''
    ).collect()
    assert eng.sql(
        '''ASK { ?s ?p ?o . FILTER(CONTAINS("abc"@en, "b")) }'''
    ).collect()
    # errored STRAFTER -> unbound, not a value
    assert _bind1(eng, 'STRAFTER("abc"@en, "b"@cy)') is None


def test_encode_for_uri_star(eng):
    assert _bind1(eng, 'ENCODE_FOR_URI("a*b c~d")')["s"] == "a%2Ab%20c~d"


def test_regex_and_replace_dynamic_flags(eng):
    r = eng.sql(
        'SELECT ?m WHERE { BIND(LCASE("I") AS ?f) BIND(REGEX("ABC", "abc", ?f) AS ?m) }'
    ).collect()[0]["m"]
    assert r["b"] is True
    r = eng.sql(
        'SELECT ?m WHERE { BIND(LCASE("I") AS ?f) '
        'BIND(REPLACE("ABCabc", "abc", "x", ?f) AS ?m) }'
    ).collect()[0]["m"]
    assert r["s"] == "xx"
