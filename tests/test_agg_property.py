"""Property test: engine aggregates over random mixed-type groups must
agree with a direct Python evaluation of SPARQL §18.5 (as fixed by the
round-8 conformance pass): Sum/Avg error (unbound) when any element is
non-numeric, Sum stays integer over all-integer groups, Min/Max follow
the engine's documented total term order over bound terms, Count
counts bound elements, GroupConcat sorts renderings.

Floats are generated off the integer lattice (x + 0.5) so no int/float
pair shares a sort key — min_by ties across equal-valued terms of
different numeric types are the one place the total order is
deliberately coarser than term identity."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from graphdb_wikidata_spark.engine import GraphEngine
from graphdb_wikidata_spark.model.schema import statements_from_quads

P = "<http://www.wikidata.org/prop/direct/P2>"

value = st.one_of(
    st.integers(min_value=-5, max_value=9),
    st.integers(min_value=0, max_value=9).map(lambda i: i + 0.5),
    st.sampled_from(["apple", "zebra", "mango"]),
)
groups = st.dictionaries(
    st.sampled_from([1, 3, 5]),
    st.lists(value, min_size=1, max_size=4),
    min_size=1,
    max_size=3,
)


def _model(vals):
    nums = [v for v in vals if isinstance(v, (int, float)) and not isinstance(v, bool)]
    poisoned = len(nums) != len(vals)
    out = {}
    out["cnt"] = len(vals)
    if poisoned:
        out["sum"] = out["avg"] = None
    else:
        out["sum"] = sum(nums)
        out["avg"] = sum(nums) / len(nums)

    def key(v):
        if isinstance(v, str):
            return (7, v, 0.0)
        return (4, "", float(v))

    out["min"] = min(vals, key=key)
    out["max"] = max(vals, key=key)
    # default separator is a single space (§18.5.1.7)
    out["gc"] = " ".join(sorted(str(v) for v in vals))
    return out


def _term_py(t):
    if t is None:
        return None
    if t["t"] == "int":
        return t["i"]
    if t["t"] == "double":
        return t["d"]
    if t["t"] == "str":
        return t["s"]
    raise AssertionError(t)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(g=groups)
def test_aggregates_match_spec_model(spark, g):
    quads = []
    n = 0
    for k, vals in g.items():
        for v in vals:
            quads.append((f"Q{k}", "P2", v, f"s{n}"))
            n += 1
    eng = GraphEngine(spark, statements_from_quads(spark, quads))
    rows = eng.sql(
        f"""
        SELECT ?s (COUNT(?v) AS ?cnt) (SUM(?v) AS ?sum) (AVG(?v) AS ?avg)
               (MIN(?v) AS ?mn) (MAX(?v) AS ?mx)
               (GROUP_CONCAT(STR(?v)) AS ?gc)
        WHERE {{ ?s {P} ?v . }} GROUP BY ?s
        """
    ).collect()
    got = {r["s"]["e"]: r for r in rows}
    assert set(got) == set(g)
    for k, vals in g.items():
        m = _model(vals)
        r = got[k]
        assert r["cnt"]["i"] == m["cnt"], (k, vals)
        if m["sum"] is None:
            assert r["sum"] is None and r["avg"] is None, (k, vals)
        else:
            if all(isinstance(v, int) for v in vals):
                assert r["sum"]["t"] == "int" and r["sum"]["i"] == m["sum"], (k, vals)
            else:
                assert r["sum"]["t"] == "double"
                assert r["sum"]["d"] == pytest.approx(m["sum"]), (k, vals)
            assert r["avg"]["d"] == pytest.approx(m["avg"]), (k, vals)
        assert _term_py(r["mn"]) == m["min"], (k, vals)
        assert _term_py(r["mx"]) == m["max"], (k, vals)
        # STR renders ints/doubles via their lexical form; python str()
        # matches for the generated lattice (no scientific notation)
        assert r["gc"]["s"] == m["gc"], (k, vals)
