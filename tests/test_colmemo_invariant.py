"""The compiler's column memo must never lie: for every DataFrame it
remembers while compiling, the remembered list must equal the real
(analysis-forced) df.columns. A wrong memo entry would silently
mis-shape joins/projections, so this sweeps the memo after compiling
one query per algebra feature."""

from __future__ import annotations

import pytest

from graphdb_wikidata_spark.engine import GraphEngine
from graphdb_wikidata_spark.model.schema import statements_from_quads

QUADS = [
    ("Q1", "P2", "Q3", "s1"),
    ("Q1", "P2", 5, "s2"),
    ("Q4", "P2", "Q3", "s3"),
    ("Q1", "P7", "Q4", "s4"),
    ("Q3", "P7", "Q1", "s5"),
    (("stmt", "s1"), "P9", "Q8", "s6"),
]

QUERIES = [
    "SELECT ?s ?o WHERE { ?s wdt:P2 ?o . ?s wdt:P7 ?x . }",
    "SELECT ?s ?o WHERE { ?s wdt:P2 ?o . OPTIONAL { ?s wdt:P7 ?y . FILTER(?y != ?o) } }",
    "SELECT ?s WHERE { { ?s wdt:P2 ?o . } UNION { ?s wdt:P7 ?o . } }",
    "SELECT ?s WHERE { ?s wdt:P2 ?o . MINUS { ?s wdt:P7 ?z . } }",
    # compatibility-path MINUS / Join: OPTIONAL leaves ?y maybe-unbound
    "SELECT ?s WHERE { ?s wdt:P2 ?o . OPTIONAL { ?s wdt:P7 ?y . } MINUS { ?s wdt:P7 ?y . } }",
    "SELECT ?s ?y WHERE { { ?s wdt:P2 ?o . OPTIONAL { ?s wdt:P7 ?y . } } { ?x wdt:P7 ?y . } }",
    "SELECT ?s ?y ?x WHERE { ?s wdt:P2 ?o . OPTIONAL { ?s wdt:P7 ?y . } OPTIONAL { ?x wdt:P7 ?y . FILTER(?y != ?x) } }",
    "SELECT ?s WHERE { ?s wdt:P2 ?o . FILTER EXISTS { ?s wdt:P7 ?w . } }",
    "SELECT ?s WHERE { ?s wdt:P2 ?o . FILTER(BOUND(?o) && EXISTS { ?s wdt:P7 ?w . }) }",
    "SELECT ?s (COUNT(?o) AS ?n) WHERE { ?s ?p ?o . } GROUP BY ?s HAVING (COUNT(?o) > 1)",
    "SELECT ?s ?v WHERE { ?s wdt:P2 ?o . BIND(STR(?o) AS ?v) } ORDER BY DESC(?v) LIMIT 3",
    "SELECT ?s ?o WHERE { VALUES (?s ?o) { (wd:Q1 wd:Q3) (wd:Q4 UNDEF) } ?s wdt:P2 ?o . }",
    "SELECT DISTINCT ?x WHERE { wd:Q1 wdt:P7/wdt:P7* ?x . }",
    "SELECT ?s WHERE { ?s wdt:P2 ?o . { SELECT ?s WHERE { ?s wdt:P7 ?y . } } }",
]


@pytest.fixture(scope="module")
def eng(spark):
    return GraphEngine(spark, statements_from_quads(spark, QUADS))


@pytest.mark.parametrize("query", QUERIES)
def test_memo_matches_real_columns(eng, query, monkeypatch):
    from graphdb_wikidata_spark.engine.parser import parse_query

    compiler = eng._compiler
    recorded = []  # strong refs: the memo itself is weak
    real_remember = compiler._remember

    def spy(df, cols):
        recorded.append((df, list(cols)))
        return real_remember(df, cols)

    monkeypatch.setattr(compiler, "_remember", spy)
    compiler.compile(parse_query(query))
    assert recorded, "compile remembered nothing — memo wiring broken"
    for df, cols in recorded:
        assert cols == df.columns
