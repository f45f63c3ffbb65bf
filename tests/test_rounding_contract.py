"""The two rounding regimes (round 7, docs/SCALING.md):

- ``round_half_up``  — Spark ``F.round`` parity: BigDecimal HALF_UP on
  the double's shortest decimal representation.
- ``round_like_duckdb`` — DuckDB ``round(DOUBLE, n)`` parity:
  ``std::round(x * 10^n) / 10^n`` with half-away-from-zero evaluated on
  the PRODUCT double.

They disagree exactly when a value sits within an ulp of a decimal
boundary (systematic for finite-decimal kernels like Holt); these tests
pin each helper BIT-exact against its engine — signed zeros included
(float ``==`` treats -0.0 == +0.0, but the driver's dtype-sensitive
hash does not; the round-7 review caught both a +0.0-for--0.0 return
and a misround at the one double per scale just above -0.5, so the
corpus probes both sides of zero and those exact edges)."""

from __future__ import annotations

import math
import random
import struct

import duckdb
import pytest

from graphdb_wikidata_spark.rounding import round_half_up, round_like_duckdb


def _bits(v: float) -> bytes:
    return struct.pack("<d", v)


def _vals(n_random: int = 5000, n_boundary: int = 5000) -> list[float]:
    rng = random.Random(20240816)
    vals = [rng.uniform(-1e6, 1e6) for _ in range(n_random)]
    # adversarial: exact decimal-boundary neighborhoods, BOTH signs
    vals += [
        round(rng.uniform(-1000, 1000), 5) + sign * 5e-5
        for sign in (1, -1)
        for _ in range(n_boundary // 2)
    ]
    vals += [
        13.838849999999999,  # the Holt sf0.001 boundary value
        -0.00005, 0.00005, 2.5, -2.5, 2.00005, -2.00005, 0.0, -0.0,
        -3e-05, 3e-05,  # negative-to-zero: must return -0.0 like std::round
        math.nextafter(-0.5, 0), math.nextafter(0.5, 1),
    ]
    # the one double per scale whose (-1,0) tie computation misrounds
    # under the v - floor(v) formulation
    for nd in (0, 2, 4, 6, 9):
        p = 10.0 ** nd
        vals += [math.nextafter(-0.5, 0) / p, -0.5 / p, 0.5 / p]
    return vals


@pytest.mark.parametrize("nd", [0, 2, 4, 6, 9])
def test_round_like_duckdb_matches_duckdb_bit_exact(nd):
    vals = _vals()
    con = duckdb.connect()
    duck = con.execute(
        "select round(x, ?) from (select unnest(?::DOUBLE[]) x)", [nd, vals]
    ).fetchall()
    con.close()
    for v, (d,) in zip(vals, duck):
        got = round_like_duckdb(v, nd)
        assert _bits(d) == _bits(got), (v, nd, repr(d), repr(got))


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


def test_negative_zero_is_preserved():
    assert _bits(round_like_duckdb(-3e-05, 4)) == _bits(-0.0)
    assert _bits(round_like_duckdb(3e-05, 4)) == _bits(0.0)
