"""Property tests: the mask-grouped compatibility machinery must agree
with a direct Python evaluation of SPARQL §8.3.1/.2/.3 on small random
relations with unbound (NULL) cells — join merges on the common bound
domain, OPTIONAL pads rows with no compatible partner, MINUS removes on
compatible-with-overlap. Multiset semantics: results compared as sorted
row lists, not sets."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SHARED = ["a", "b"]
LEFT_COLS = ["a", "b", "l"]
RIGHT_COLS = ["a", "b", "r"]

cell = st.one_of(st.none(), st.integers(min_value=0, max_value=2))
left_rows = st.lists(st.tuples(cell, cell, st.integers(0, 9)), max_size=4)
right_rows = st.lists(st.tuples(cell, cell, st.integers(0, 9)), max_size=4)


def _compatible(lrow: dict, rrow: dict):
    common = [c for c in SHARED if lrow[c] is not None and rrow[c] is not None]
    ok = all(lrow[c] == rrow[c] for c in common)
    return ok, common


def _merge(lrow: dict, rrow: dict) -> tuple:
    out = []
    for c in LEFT_COLS:
        v = lrow[c]
        if c in SHARED and v is None:
            v = rrow[c]
        out.append(v)
    out += [rrow[c] for c in RIGHT_COLS if c not in SHARED]
    return tuple(out)


def _join_ref(L, R):
    return [
        _merge(l, r) for l in L for r in R if _compatible(l, r)[0]
    ]


def _leftjoin_ref(L, R):
    out = []
    for l in L:
        partners = [_merge(l, r) for r in R if _compatible(l, r)[0]]
        out += partners if partners else [tuple(l[c] for c in LEFT_COLS) + (None,)]
    return out


def _sorted(rows):
    return sorted(
        rows, key=lambda t: tuple((v is None, 0 if v is None else v) for v in t)
    )


@pytest.fixture(scope="module")
def compiler(spark):
    from graphdb_wikidata_spark.engine.compiler import Compiler

    return Compiler(spark, spark.range(0).select())


def _dfs(spark, L, R):
    ldf = spark.createDataFrame(L or [(None, None, 0)][:0], "a int, b int, l int")
    rdf = spark.createDataFrame(R or [(None, None, 0)][:0], "a int, b int, r int")
    return ldf, rdf


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(L=left_rows, R=right_rows)
def test_compat_join_matches_reference(spark, compiler, L, R):
    ldf, rdf = _dfs(spark, L, R)
    got = _sorted(map(tuple, compiler._compat_join(ldf, rdf, SHARED).collect()))
    want = _sorted(_join_ref([dict(zip(LEFT_COLS, t)) for t in L],
                             [dict(zip(RIGHT_COLS, t)) for t in R]))
    assert got == want


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(L=left_rows, R=right_rows)
def test_compat_leftjoin_matches_reference(spark, compiler, L, R):
    ldf, rdf = _dfs(spark, L, R)
    got = _sorted(
        map(tuple, compiler._compat_leftjoin(ldf, rdf, SHARED, None).collect())
    )
    want = _sorted(_leftjoin_ref([dict(zip(LEFT_COLS, t)) for t in L],
                                 [dict(zip(RIGHT_COLS, t)) for t in R]))
    assert got == want


# ---------------------------------------------------------------------------
# binding_masks soundness: the STATIC mask analysis (which round 3 made
# the default, replacing plan-time data enumeration) must over-
# approximate reality — every bound-variable set observed in a compiled
# result must appear in binding_masks(op). An omission here would make
# a compatibility join silently drop solutions.
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def bm_engine(spark):
    from graphdb_wikidata_spark.engine import GraphEngine
    from graphdb_wikidata_spark.model.schema import statements_from_quads

    quads = [
        ("Q1", "P1", "Q2", "s1"),
        ("Q2", "P1", "Q3", "s2"),
        ("Q1", "P2", "Q3", "s3"),
        ("Q3", "P2", "Q1", "s4"),
        ("Q2", "P3", 7, "s5"),
    ]
    return GraphEngine(spark, statements_from_quads(spark, quads).cache())


def _op_trees():
    from graphdb_wikidata_spark.engine.algebra import (
        Extend,
        EVar,
        Join,
        LeftJoin,
        Minus,
        Project,
        TriplePattern,
        Union,
        Term,
        Var,
    )

    x, y, z = Var("x"), Var("y"), Var("z")
    p1 = Term(t="entity", k="P", e=1)
    p2 = Term(t="entity", k="P", e=2)
    leaves = st.sampled_from(
        [
            TriplePattern(x, p1, y),
            TriplePattern(y, p1, z),
            TriplePattern(x, p2, z),
            TriplePattern(z, p2, x),
        ]
    )

    from graphdb_wikidata_spark.engine.algebra import pattern_vars

    def combine(children):
        return st.one_of(
            st.tuples(children, children).map(lambda t: Join(*t)),
            st.tuples(children, children).map(lambda t: LeftJoin(*t)),
            st.tuples(children, children).map(lambda t: Union(*t)),
            st.tuples(children, children).map(lambda t: Minus(*t)),
            # BIND may not rebind an in-scope var (SPARQL syntax rule),
            # so only extend trees that don't already bind w
            children.filter(lambda c: "w" not in pattern_vars(c)).map(
                lambda c: Extend(c, "w", EVar("x"))
            ),
            children.map(lambda c: Project(c, ("x", "y"))),
        )

    return st.recursive(leaves, combine, max_leaves=4)


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(op=_op_trees())
def test_binding_masks_over_approximate(bm_engine, op):
    from graphdb_wikidata_spark.engine.algebra import binding_masks

    bm = binding_masks(op)
    df = bm_engine._compiler.compile(op)
    rows = df.collect()
    if bm is None:
        return  # analysis declined: callers fall back, nothing to check
    cols = df.columns
    for r in rows:
        observed = frozenset(c for c in cols if r[c] is not None)
        assert observed in bm, (observed, sorted(map(sorted, bm)), op)
