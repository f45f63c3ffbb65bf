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
    """Round like Spark ``F.round``/DuckDB ``round``: decimal HALF_UP
    (away from zero on ties) at ``ndigits``, via the double's shortest
    decimal representation. NaN/inf pass through unchanged."""
    x = float(x)
    if not math.isfinite(x):
        return x
    q = Decimal(1).scaleb(-ndigits)
    return float(Decimal(repr(x)).quantize(q, rounding=ROUND_HALF_UP))
