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
