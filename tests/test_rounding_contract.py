"""The two rounding regimes (round 7, docs/SCALING.md):

- ``round_half_up``  — Spark ``F.round`` parity: BigDecimal HALF_UP on
  the double's shortest decimal representation.
- ``round_like_duckdb`` — DuckDB ``round(DOUBLE, n)`` parity:
  ``std::round(x * 10^n) / 10^n`` with half-away-from-zero evaluated on
  the PRODUCT double.

They disagree exactly when a value sits within an ulp of a decimal
boundary (systematic for finite-decimal kernels like Holt); these tests
pin each helper bit-exact against its engine so a regression in either
direction — or an engine upgrade changing semantics — fails loudly.
"""

from __future__ import annotations

import random

import duckdb
import pytest

from graphdb_wikidata_spark.rounding import round_half_up, round_like_duckdb


def _vals(n_random: int = 5000, n_boundary: int = 5000) -> list[float]:
    rng = random.Random(20240816)
    vals = [rng.uniform(-1e6, 1e6) for _ in range(n_random)]
    # adversarial: exact decimal-boundary neighborhoods
    vals += [round(rng.uniform(-1000, 1000), 5) + 5e-5 for _ in range(n_boundary)]
    vals += [13.838849999999999, -0.00005, 0.00005, 2.5, -2.5, 2.00005, -2.00005, 0.0]
    return vals


@pytest.mark.parametrize("nd", [0, 2, 4, 6, 9])
def test_round_like_duckdb_matches_duckdb(nd):
    vals = _vals()
    con = duckdb.connect()
    duck = con.execute(
        "select round(x, ?) from (select unnest(?::DOUBLE[]) x)", [nd, vals]
    ).fetchall()
    con.close()
    for v, (d,) in zip(vals, duck):
        assert d == round_like_duckdb(v, nd), (v, nd, d, round_like_duckdb(v, nd))


def test_round_half_up_matches_spark_f_round(spark):
    from pyspark.sql import functions as F

    vals = _vals(1500, 1500)
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    for nd in (2, 4, 6):
        got = [r.r for r in df.select(F.round("x", nd).alias("r")).collect()]
        for v, g in zip(vals, got):
            assert g == round_half_up(v, nd), (v, nd, g, round_half_up(v, nd))


def test_the_regimes_disagree_on_the_holt_boundary():
    # the round-7 finding: both are self-consistent, but they are NOT
    # interchangeable — the exact value Holt hit at sf0.001
    v = 13.838849999999999  # real-arithmetic trajectory value 13.83885
    assert round_half_up(v, 4) == 13.8388
    assert round_like_duckdb(v, 4) == 13.8389
