"""Property test: FROM / FROM NAMED / GRAPH scan scoping must agree
with a direct evaluation of SPARQL 1.1 §13.2-13.3 dataset semantics on
small random quad stores — the default graph is the FROM merge (or the
store's NULL-graph rows without a clause), GRAPH ranges over the FROM
NAMED set (or all named graphs), and any clause replaces the store
dataset entirely."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from graphdb_wikidata_spark.engine import GraphEngine
from graphdb_wikidata_spark.model.schema import statements_from_quads

G1 = "http://example.org/g/one"
G2 = "http://example.org/g/two"
GRAPHS = [None, G1, G2]

quad = st.tuples(
    st.integers(1, 3),  # subject Qn
    st.integers(4, 6),  # object Qn
    st.sampled_from(GRAPHS),
)
quads_strat = st.lists(quad, min_size=0, max_size=8, unique=True)
subset = st.lists(st.sampled_from([G1, G2]), max_size=2, unique=True)
clause = st.one_of(
    st.none(),  # no dataset clause
    st.tuples(subset, subset).filter(lambda t: t[0] or t[1]),
)


def _clause_text(ds) -> str:
    if ds is None:
        return ""
    froms, nameds = ds
    return " ".join(
        [f"FROM <{g}>" for g in froms] + [f"FROM NAMED <{g}>" for g in nameds]
    )


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(qs=quads_strat, ds=clause)
def test_dataset_scoping_matches_model(spark, qs, ds):
    rows = [
        (f"Q{s}", "P1", f"Q{o}", f"st{i}", *((g,) if g else ()))
        for i, (s, o, g) in enumerate(qs)
    ]
    eng = GraphEngine(spark, statements_from_quads(spark, rows))
    text = _clause_text(ds)

    # default-graph pattern
    got = sorted(
        (r["s"]["e"], r["o"]["e"])
        for r in eng.sql(f"SELECT ?s ?o {text} WHERE {{ ?s wdt:P1 ?o . }}").collect()
    )
    if ds is None:
        # the store's own default graph: scan rows as stored
        want = sorted((s, o) for s, o, g in qs if g is None)
    else:
        # FROM default graph = RDF MERGE of the listed graphs — a SET:
        # the same triple in two FROM graphs is one solution (§13.2;
        # round-4 set-semantics collapse)
        want = sorted({(s, o) for s, o, g in qs if g in set(ds[0])})
    assert got == want

    # GRAPH ?g pattern
    got_g = sorted(
        (r["g"]["s"], r["s"]["e"], r["o"]["e"])
        for r in eng.sql(
            f"SELECT ?g ?s ?o {text} WHERE {{ GRAPH ?g {{ ?s wdt:P1 ?o . }} }}"
        ).collect()
    )
    named = {G1, G2} if ds is None else set(ds[1])
    want_g = sorted((g, s, o) for s, o, g in qs if g is not None and g in named)
    assert got_g == want_g
