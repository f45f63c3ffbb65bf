"""SPARQL 1.1 §18.5 aggregate conformance (round-8 review pass #3).

The reference engine SKIPS elements it cannot use — non-numeric terms
in Sum/Avg (calc_engine.rs:507-585, the ``_ => ()`` match arms) and
incomparable pairs in Min/Max (partial_cmp None => ()) — which is the
SQL NULL-skipping behavior, not SPARQL's. Per §18.5.1 ListEval
"retains errors": an element whose expression evaluation errors makes
Sum/Avg/GroupConcat error, so the aggregate's variable is UNBOUND in
that group's row. This suite pins the spec semantics:

- Sum/Avg over a group containing a non-numeric term, an unbound
  variable, or an errored expression -> unbound (error), not a
  partial sum over the usable subset
- Min/Max over a group containing an unbound/errored element ->
  unbound; cross-TYPE mixing stays defined under the engine's
  documented total-order deviation (sort_key, expressions.py)
- GroupConcat over a group with an errored element -> unbound
- Count(expr) counts the non-error elements (per the WG errata and
  engine consensus); Count(*) counts solutions
- Sum typing follows op:numeric-add promotion: all-integer input
  stays xsd:integer, any double promotes to double (Avg stays double
  — declared deviation, TERM_T has no decimal branch)
- Empty GLOBAL aggregation group (§18.5.1.5-9): Sum({}) = 0,
  Avg({}) = 0, GroupConcat({}) = "", Min/Max/Sample({}) = error
"""

from __future__ import annotations

import pytest

from graphdb_wikidata_spark.engine import GraphEngine
from graphdb_wikidata_spark.model.schema import statements_from_quads


@pytest.fixture(scope="module")
def eng(spark):
    return GraphEngine(
        spark,
        statements_from_quads(
            spark,
            [
                # Q1: clean all-integer group
                ("Q1", "P2", 10, "s1"),
                ("Q1", "P2", 20, "s2"),
                # Q3: mixed numeric + string -> Sum/Avg error
                ("Q3", "P2", 5, "s3"),
                ("Q3", "P2", "abc", "s4"),
                # Q5: int + double -> Sum promotes to double
                ("Q5", "P2", 3, "s5"),
                ("Q5", "P2", 1.5, "s6"),
                # Q7: subject with a P2 value but no P4 (for unbound-in-
                # group via OPTIONAL)
                ("Q7", "P2", 4, "s7"),
                ("Q1", "P4", 100, "s8"),
            ],
        ),
    )


def _groups(eng, query: str, key: str = "s", var: str = "agg") -> dict:
    rows = eng.sql(query).collect()
    out = {}
    for r in rows:
        k = r[key]
        out[k["e"] if k is not None else None] = r[var]
    return out


AGG_BY_SUBJECT = """
SELECT ?s ({expr} AS ?agg) WHERE {{
  ?s <http://www.wikidata.org/prop/direct/P2> ?v .
}} GROUP BY ?s
"""


def test_sum_mixed_string_group_is_unbound(eng):
    g = _groups(eng, AGG_BY_SUBJECT.format(expr="SUM(?v)"))
    assert g[3] is None  # Q3 contains "abc" -> op:numeric-add error
    assert (g[1]["t"], g[1]["i"]) == ("int", 30)


def test_sum_all_int_stays_integer(eng):
    g = _groups(eng, AGG_BY_SUBJECT.format(expr="SUM(?v)"))
    assert g[1]["t"] == "int" and g[1]["i"] == 30


def test_sum_promotes_to_double_on_any_double(eng):
    g = _groups(eng, AGG_BY_SUBJECT.format(expr="SUM(?v)"))
    assert g[5]["t"] == "double" and g[5]["d"] == pytest.approx(4.5)


def test_sum_distinct_gates_and_types_identically(eng):
    g = _groups(eng, AGG_BY_SUBJECT.format(expr="SUM(DISTINCT ?v)"))
    assert g[3] is None
    assert (g[1]["t"], g[1]["i"]) == ("int", 30)
    assert g[5]["t"] == "double" and g[5]["d"] == pytest.approx(4.5)


def test_avg_mixed_group_is_unbound(eng):
    g = _groups(eng, AGG_BY_SUBJECT.format(expr="AVG(?v)"))
    assert g[3] is None
    assert g[1]["t"] == "double" and g[1]["d"] == pytest.approx(15.0)


def test_sum_over_errored_expression_is_unbound(eng):
    # STRLEN of an integer is a type error for the rows it hits
    g = _groups(eng, AGG_BY_SUBJECT.format(expr="SUM(STRLEN(?v))"))
    assert g[1] is None and g[5] is None
    # Q3's group has one string ("abc" -> 3) and one int (error)
    assert g[3] is None


def test_min_max_with_errored_element_is_unbound(eng):
    g = _groups(eng, AGG_BY_SUBJECT.format(expr="MIN(STRLEN(?v))"))
    assert g[3] is None  # one element errors -> whole MIN errors
    g = _groups(eng, AGG_BY_SUBJECT.format(expr="MAX(STRLEN(?v))"))
    assert g[3] is None


def test_min_cross_type_stays_defined_total_order(eng):
    # documented deviation: mixed int/string group under MIN uses the
    # engine's total term order (numbers rank before strings), rather
    # than the reference's input-order-dependent partial_cmp skip
    g = _groups(eng, AGG_BY_SUBJECT.format(expr="MIN(?v)"))
    assert (g[3]["t"], g[3]["i"]) == ("int", 5)
    g = _groups(eng, AGG_BY_SUBJECT.format(expr="MAX(?v)"))
    assert g[3]["t"] == "str" and g[3]["s"] == "abc"


def test_unbound_in_group_poisons_sum(eng):
    # OPTIONAL P4: Q1 has it, Q7 does not -> SUM(?w) over Q7's group
    # evaluates an unbound variable -> error -> unbound
    q = """
    SELECT ?s (SUM(?w) AS ?agg) WHERE {
      ?s <http://www.wikidata.org/prop/direct/P2> ?v .
      OPTIONAL { ?s <http://www.wikidata.org/prop/direct/P4> ?w . }
    } GROUP BY ?s
    """
    g = _groups(eng, q)
    assert g[7] is None
    assert (g[1]["t"], g[1]["i"]) == ("int", 200)  # two P2 rows x 100


def test_group_concat_with_errored_element_is_unbound(eng):
    # UCASE of an int errors; Q3's group also has "abc" -> "ABC"
    g = _groups(eng, AGG_BY_SUBJECT.format(expr="GROUP_CONCAT(UCASE(?v))"))
    assert g[3] is None
    g2 = _groups(eng, AGG_BY_SUBJECT.format(expr='GROUP_CONCAT(STR(?v))'))
    assert g2[3] is not None  # STR is total over terms -> no error


def test_count_expr_counts_non_error_elements(eng):
    g = _groups(eng, AGG_BY_SUBJECT.format(expr="COUNT(STRLEN(?v))"))
    assert (g[3]["t"], g[3]["i"]) == ("int", 1)  # only "abc" survives
    assert g[1]["i"] == 0
    g2 = _groups(eng, AGG_BY_SUBJECT.format(expr="COUNT(?v)"))
    assert g2[3]["i"] == 2


def test_sample_picks_a_non_error_value(eng):
    g = _groups(eng, AGG_BY_SUBJECT.format(expr="SAMPLE(STRLEN(?v))"))
    assert (g[3]["t"], g[3]["i"]) == ("int", 3)


EMPTY_GLOBAL = """
SELECT ({expr} AS ?agg) WHERE {{
  ?s <http://www.wikidata.org/prop/direct/P2> ?v .
  FILTER(?v = "no-such-value")
}}
"""


def _global(eng, expr):
    rows = eng.sql(EMPTY_GLOBAL.format(expr=expr)).collect()
    assert len(rows) == 1
    return rows[0]["agg"]


def test_empty_global_sum_is_integer_zero(eng):
    r = _global(eng, "SUM(?v)")
    assert r is not None and (r["t"], r["i"]) == ("int", 0)


def test_empty_global_avg_is_integer_zero(eng):
    r = _global(eng, "AVG(?v)")
    assert r is not None and (r["t"], r["i"]) == ("int", 0)


def test_empty_global_count_is_zero(eng):
    r = _global(eng, "COUNT(?v)")
    assert (r["t"], r["i"]) == ("int", 0)


def test_empty_global_group_concat_is_empty_string(eng):
    r = _global(eng, "GROUP_CONCAT(?v)")
    assert r is not None and r["s"] == ""


def test_empty_global_min_max_sample_are_errors(eng):
    for expr in ("MIN(?v)", "MAX(?v)", "SAMPLE(?v)"):
        assert _global(eng, expr) is None, expr
