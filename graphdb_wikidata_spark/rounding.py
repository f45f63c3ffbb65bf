"""Decimal rounding for Python-side kernels.

Python's built-in ``round()`` is banker's rounding (half-to-even);
Spark's ``F.round`` is Java ``BigDecimal`` HALF_UP over the double's
shortest decimal representation, and DuckDB's ``round`` is
half-away-from-zero. All Python kernels that produce a value an oracle
will hash (the CUSUM/EWMA stateful kernels, the power-iteration
normalizer) must round the same way as the JVM/DuckDB sides or an
exact decimal tie in the trajectory mismatches the oracle
(ADVICE r05). Python's ``decimal.ROUND_HALF_UP`` is half-away-from-zero
like both of them; building the ``Decimal`` from ``repr(x)`` uses the
shortest round-trip decimal string, matching Java's
``BigDecimal.valueOf(double)``.
"""

from __future__ import annotations

import math
from decimal import ROUND_HALF_UP, Decimal


def round_half_up(x: float, ndigits: int) -> float:
    """Round like Spark ``F.round``: decimal HALF_UP (away from zero on
    ties) at ``ndigits``, via the double's shortest decimal
    representation. NaN/inf pass through unchanged.

    DuckDB's ``round(DOUBLE, n)`` agrees with this everywhere EXCEPT
    when ``x`` sits within an ulp of an exact ``d.ddd5`` boundary: the
    shortest repr sees e.g. ``13.838849999999999`` and rounds DOWN,
    while DuckDB computes ``std::round(x * 10^n) / 10^n`` whose product
    re-rounds to exactly ``138388.5`` and goes UP. For kernels whose
    REAL-arithmetic values are finite decimals (integer inputs times
    0.5/0.3-style coefficients — Holt), those boundaries occur
    systematically, not at measure zero; such kernels must emit
    ``round_like_duckdb`` instead (round-7 Holt fix). Kernels rounding
    sums/ratios of arbitrary floats (CUSUM, EWMA, cosine sims) keep
    this helper — their boundary probability is ~0 and F.round parity
    matters for the JVM-side columns they're hashed against."""
    x = float(x)
    if not math.isfinite(x):
        return x
    q = Decimal(1).scaleb(-ndigits)
    return float(Decimal(repr(x)).quantize(q, rounding=ROUND_HALF_UP))


def round_like_duckdb(x: float, ndigits: int) -> float:
    """Round exactly like DuckDB ``round(DOUBLE, n)``:
    ``std::round(x * 10^n) / 10^n`` with ``std::round`` = half away
    from zero evaluated on the PRODUCT double (so a product that lands
    exactly on ``.5`` — systematic when the real value is a finite
    decimal — goes away from zero, even when the pre-product double
    sat just below the boundary). Fuzz-verified BIT-exact (signed
    zeros included) against DuckDB over random + adversarial boundary
    values on both sides of zero — see tests/test_rounding_contract.py.

    The tie test runs on ``abs(v)``: ``a - floor(a)`` is exact for all
    non-negative doubles (``a`` itself when ``floor`` is 0, Sterbenz
    otherwise), whereas ``v - floor(v)`` for ``v`` in (-1, 0) computes
    ``v + 1`` and can round onto exactly 0.5 for the double just above
    -0.5 — misrounding one value per scale (round-7 review). And a
    negative value rounding to zero must return -0.0, like std::round,
    or the driver's dtype-sensitive hash sees a sign-bit mismatch."""
    x = float(x)
    if not math.isfinite(x):
        return x
    p = 10.0 ** ndigits
    a = abs(x) * p
    f = math.floor(a)
    if a - f >= 0.5:
        f += 1
    return math.copysign(f / p, x)
