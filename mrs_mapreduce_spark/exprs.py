"""Shared expression helpers.

``pround`` exists because of a cross-engine rounding trap discovered
empirically (see SURVEY.md §7.4 float discipline): Spark's ``round(x, n)``
rounds the SHORTEST decimal representation of the double (BigDecimal
HALF_UP on ``Double.toString``), while DuckDB computes
``round(x * 10^n) / 10^n`` in double arithmetic. For a value whose shortest
repr ends in "…5" (e.g. 37704.575 whose exact double is
37704.5749999…), Spark rounds up and DuckDB down — ~0.2% of rows in
fixture data. DuckDB's form is reproducible from Spark (same IEEE ops on
the same double), so every declared query rounds with ``pround`` and the
oracle keeps plain ``round(x, n)`` — verified equivalent by fuzz test.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def pround(col: Column | str, n: int = 2) -> Column:
    """Portable round-half-away-from-zero matching DuckDB's ``round(x, n)``."""
    if isinstance(col, str):
        col = F.col(col)
    scale = float(10**n)
    return F.round(col * scale, 0) / scale


def pround0(col: Column | str, n: int = 2) -> Column:
    """:func:`pround` with negative zero normalized to ``+0.0``.

    A value in (-0.5 * 10^-n, 0) rounds to ``-0.0``, which the driver's
    repr-level hash distinguishes from ``0.0`` and the local oracle gate
    bans outright (the r8 ``feature_standardize`` class). ``+ 0.0`` is
    the portable normalization — IEEE ``-0.0 + 0.0 = +0.0`` in both
    engines (bare ``abs()`` is NOT portable: DuckDB's preserves the
    sign). Oracles pair this with ``round(x, n) + 0.0``. Use for any
    informative float column whose true value can be near zero.
    """
    return pround(col, n) + F.lit(0.0)
