"""SPARQL 1.1 spec-conformance fixes from the round-8 engine-core
review (the two divergences declared-and-deferred in round 7, VERDICT
r07 what's-missing #1, plus the ADVICE r07 error-propagation gaps):

- §17.4.1.3 COALESCE skips ERRORED arguments, not just unbound ones —
  requires errors to be fully-NULL term structs (previously a typed
  struct with a NULL payload, which F.coalesce cannot skip)
- §17.4 XPath operator promotion: int op int stays int, int/int is
  op:numeric-divide (decimal; double here) with /0 an error, double
  division by zero follows IEEE 754 (INF/-INF/NaN), int overflow is
  an error
- fn:substring propagates an errored start/length (ADVICE r07)
- REGEX/REPLACE propagate a NULL (errored) flags argument (ADVICE r07)
- §17.4.3.1 compatibility also validates arg1's type: STRSTARTS(42,
  "4") is a type error (ADVICE r07)
- TZ of a non-time term is a type error
"""

from __future__ import annotations

import math

import pytest

from graphdb_wikidata_spark.engine import GraphEngine
from graphdb_wikidata_spark.model.schema import statements_from_quads

P1 = "<http://www.wikidata.org/prop/direct/P1>"


@pytest.fixture(scope="module")
def eng(spark):
    return GraphEngine(
        spark,
        statements_from_quads(
            spark,
            [
                ("Q1", "P1", "Q2", "s1"),
            ],
        ),
    )


def _bind1(eng, expr):
    return eng.sql(f"SELECT ?x WHERE {{ BIND({expr} AS ?x) }}").collect()[0]["x"]


# ---- §17.4.1.3 COALESCE over error terms ---------------------------------


def test_coalesce_skips_errored_argument(eng):
    # STRAFTER with incompatible lang tags is a type ERROR, and
    # COALESCE must fall through to the next argument
    r = _bind1(eng, 'COALESCE(STRAFTER("abc"@en, "b"@cy), "fallback")')
    assert r is not None and r["s"] == "fallback"


def test_coalesce_skips_integer_division_by_zero(eng):
    r = _bind1(eng, 'COALESCE(1/0, "safe")')
    assert r is not None and r["s"] == "safe"


def test_coalesce_skips_unbound_then_error_then_value(eng):
    r = _bind1(eng, 'COALESCE(?never, MD5(?never), 42)')
    assert r is not None and (r["t"], r["i"]) == ("int", 42)


def test_coalesce_all_errors_is_error(eng):
    assert _bind1(eng, "COALESCE(?never, 1/0)") is None


def test_errors_are_null_structs(eng):
    # the representation itself: an errored function result is a NULL
    # struct (unbound), not a typed struct with a NULL payload
    for expr in ('MD5(?never)', 'STRLEN(<http://www.wikidata.org/entity/Q1>)',
                 'STRLANG(42, "en")'):
        assert _bind1(eng, expr) is None, expr


# ---- §17.4 XPath arithmetic promotion ------------------------------------


def test_int_arithmetic_stays_int(eng):
    r = _bind1(eng, "3 + 4")
    assert (r["t"], r["i"]) == ("int", 7)
    r = _bind1(eng, "3 * 4 - 5")
    assert (r["t"], r["i"]) == ("int", 7)
    r = _bind1(eng, "-(3)")
    assert (r["t"], r["i"]) == ("int", -3)


def test_mixed_arithmetic_promotes_to_double(eng):
    r = _bind1(eng, "3 + 4.5")
    assert r["t"] == "double" and r["d"] == 7.5
    r = _bind1(eng, "2 * 1.5")
    assert r["t"] == "double" and r["d"] == 3.0


def test_int_division_is_decimal_valued(eng):
    # op:numeric-divide on two integers yields xsd:decimal (double in
    # this term model): 7/2 = 3.5, not 3
    r = _bind1(eng, "7 / 2")
    assert r["t"] == "double" and r["d"] == 3.5


def test_int_division_by_zero_is_error(eng):
    assert _bind1(eng, "1 / 0") is None
    assert _bind1(eng, "0 / 0") is None


def test_double_division_by_zero_is_ieee(eng):
    assert _bind1(eng, "1.5 / 0.0")["d"] == math.inf
    assert _bind1(eng, "-1.5 / 0.0")["d"] == -math.inf
    assert math.isnan(_bind1(eng, "0.0 / 0.0")["d"])
    # and an int dividend over a double zero is promoted -> IEEE too
    assert _bind1(eng, "1 / 0.0")["d"] == math.inf


def test_int_overflow_is_error_not_wraparound(eng):
    assert _bind1(eng, "9223372036854775807 + 1") is None
    assert _bind1(eng, "9223372036854775807 * 2") is None


def test_arithmetic_on_nonnumeric_is_error(eng):
    assert _bind1(eng, '"abc" + 1') is None
    assert _bind1(eng, "?never * 2") is None


# ---- ADVICE r07 error-propagation gaps -----------------------------------


def test_substr_propagates_errored_start_and_length(eng):
    assert _bind1(eng, 'SUBSTR("12345", ?never)') is None
    assert _bind1(eng, 'SUBSTR("12345", 1, ?never)') is None
    assert _bind1(eng, 'SUBSTR("12345", "x")') is None
    # sanity: the valid forms still work (r7 semantics preserved)
    assert _bind1(eng, 'SUBSTR("12345", 0, 3)')["s"] == "12"
    assert _bind1(eng, 'SUBSTR("12345", -2)')["s"] == "12345"


def test_regex_replace_propagate_null_flags(eng):
    assert _bind1(eng, 'REGEX("ABC", "abc", ?never)') is None
    assert _bind1(eng, 'REPLACE("ABC", "abc", "x", ?never)') is None
    # non-NULL dynamic flags still work
    r = eng.sql(
        'SELECT ?m WHERE { BIND(LCASE("I") AS ?f) BIND(REGEX("ABC", "abc", ?f) AS ?m) }'
    ).collect()[0]["m"]
    assert r["b"] is True


def test_strstarts_validates_arg1_type(eng):
    assert _bind1(eng, 'STRSTARTS(42, "4")') is None
    assert _bind1(eng, 'CONTAINS(<http://www.wikidata.org/entity/Q1>, "Q")') is None
    # string arg1 still fine
    assert _bind1(eng, 'STRSTARTS("42", "4")')["b"] is True


def test_tz_of_non_time_is_error(eng):
    assert _bind1(eng, "TZ(42)") is None
    assert _bind1(eng, "TIMEZONE(?never)") is None
