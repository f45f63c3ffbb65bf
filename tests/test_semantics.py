"""Typed comparison semantics (SURVEY risk register / data_types.rs:
277-323): quantity ordering is unit-gated, time ordering is calendar-
gated, monolingual text is language-gated, cross-type comparison is
undefined (row dropped by FILTER), int/double cross-compare works."""

from __future__ import annotations

import pytest

from graphdb_wikidata_spark.engine import GraphEngine
from graphdb_wikidata_spark.model.schema import statements_from_quads

GREG = "http://www.wikidata.org/entity/Q1985727"
JUL = "http://www.wikidata.org/entity/Q1985786"


def _qty(amount: float, unit: str):
    return {
        "type": "qty",
        "obj_qty": (str(amount), float(amount), unit, None, None),
    }


def _time(year: int, cal: str):
    return {
        "type": "time",
        "obj_time": (year, 1, 1, 0, 0, 0, 0, 0, 9, 0, cal),
    }


def _mono(text: str, lang: str):
    return {"type": "mono", "obj_string": text, "obj_lang": lang}


@pytest.fixture(scope="module")
def eng(spark):
    quads = [
        ("Q1", "P1", _qty(5, "m"), "s1"),
        ("Q2", "P1", _qty(9, "m"), "s2"),
        ("Q3", "P1", _qty(7, "kg"), "s3"),
        ("Q4", "P2", _time(1900, GREG), "s4"),
        ("Q5", "P2", _time(1800, GREG), "s5"),
        ("Q6", "P2", _time(1700, JUL), "s6"),
        ("Q7", "P3", _mono("abend", "de"), "s7"),
        ("Q8", "P3", _mono("zebra", "en"), "s8"),
        ("Q9", "P3", _mono("yak", "en"), "s9"),
        ("Q10", "P4", 3, "s10"),
        ("Q11", "P4", 3.5, "s11"),
        ("Q12", "P4", "threeish", "s12"),
    ]
    return GraphEngine(spark, statements_from_quads(spark, quads))


def _ids(df):
    return sorted(r["s"]["e"] for r in df.collect())


def test_quantity_unit_gated(eng):
    # quantities compare only against quantities with the same unit
    # (data_types.rs:344-359): 9m > 5m passes, 7kg vs 5m is dropped
    df = eng.sql(
        """
        SELECT ?s WHERE {
          ?s wdt:P1 ?q . wdt:Q1 wdt:P1 ?ref .
          FILTER(?q > ?ref)
        }
        """
    )
    assert _ids(df) == [2]
    # a quantity never compares with a plain number either
    df = eng.sql("SELECT ?s WHERE { ?s wdt:P1 ?q . FILTER(?q > 6) }")
    assert _ids(df) == []


def test_time_calendar_gated(eng):
    # Julian 1700 is incomparable with the Gregorian literal bound below
    quads_bound = "SELECT ?s WHERE { ?s wdt:P2 ?t . ?x wdt:P2 ?t2 . }"
    df = eng.sql(
        """
        SELECT ?s WHERE {
          ?s wdt:P2 ?t . wdt:Q4 wdt:P2 ?ref .
          FILTER(?t < ?ref)
        }
        """
    )
    assert _ids(df) == [5]  # 1800 Gregorian only; 1700 Julian dropped


def test_mono_language_gated(eng):
    df = eng.sql(
        """
        SELECT ?s WHERE {
          ?s wdt:P3 ?m . wdt:Q8 wdt:P3 ?ref .
          FILTER(?m < ?ref)
        }
        """
    )
    # only 'yak'@en < 'zebra'@en; 'abend'@de incomparable
    assert _ids(df) == [9]


def test_numeric_cross_type(eng):
    df = eng.sql("SELECT ?s WHERE { ?s wdt:P4 ?v . FILTER(?v > 3.2) }")
    assert _ids(df) == [11]
    # int 3 = double 3.0 under '=' (calc_engine.rs:2938-2944)
    df = eng.sql("SELECT ?s WHERE { ?s wdt:P4 ?v . FILTER(?v = 3.0) }")
    assert _ids(df) == [10]
    # strings never compare with numbers
    df = eng.sql("SELECT ?s WHERE { ?s wdt:P4 ?v . FILTER(?v >= 0) }")
    assert _ids(df) == [10, 11]


def test_min_max_respect_type_order(eng):
    rows = eng.sql(
        "SELECT (MIN(?q) AS ?mn) (MAX(?q) AS ?mx) WHERE { ?s wdt:P1 ?q . }"
    ).collect()[0]
    # deterministic total order: min/max are stable regardless of
    # partitioning (deviation from the reference's first-value-wins)
    assert rows["mn"]["qty"]["amount_d"] in (5.0, 7.0)
    assert rows["mx"]["qty"]["amount_d"] in (7.0, 9.0)


def test_effective_boolean_value(spark):
    """EBV (data_types.rs:244-252): booleans as-is, non-empty string
    true, nonzero numbers true, everything else a type error -> the
    FILTER drops the row (unwrap_or(false), calc_engine.rs:215)."""
    quads = [
        ("Q1", "P1", "hello", "s1"),   # non-empty string -> true
        ("Q2", "P1", "", "s2"),        # empty string -> false
        ("Q3", "P1", 0, "s3"),         # zero -> false
        ("Q4", "P1", 2, "s4"),         # nonzero -> true
        ("Q5", "P1", True, "s5"),      # true
        ("Q6", "P1", False, "s6"),     # false
        ("Q7", "P1", "Q9", "s7"),      # entity -> type error -> dropped
        ("Q8", "P1", 0.0, "s8"),       # zero double -> false
    ]
    eng = GraphEngine(spark, statements_from_quads(spark, quads))
    df = eng.sql("SELECT ?s WHERE { ?s wdt:P1 ?v . FILTER(?v) }")
    assert sorted(r["s"]["e"] for r in df.collect()) == [1, 4, 5]
    # negation: type errors still drop the row (NOT(error) is error)
    df = eng.sql("SELECT ?s WHERE { ?s wdt:P1 ?v . FILTER(!?v) }")
    assert sorted(r["s"]["e"] for r in df.collect()) == [2, 3, 6, 8]
