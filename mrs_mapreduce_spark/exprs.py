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


def cents(col: Column | str) -> Column:
    """Exact integer cents of a 2-decimal-domain double column.

    THE money-sum discipline (r11 tpch review, promoted here for the
    whole engine): a product of two 2-decimal values is an exact
    4-decimal rational, and measured fixture groups land EXACTLY on
    .005 rounding boundaries (tpch_q15: 2/100 groups at sf0.01) where
    a last-ulp cross-engine or cross-partition-count accumulation
    difference flips the rounded cent. Summing exact int64 cents is
    order-independent; divide and round only at the end.
    """
    if isinstance(col, str):
        col = F.col(col)
    return F.round(col * 100, 0).cast("long")


def net4() -> Column:
    """One lineitem row's ``l_extendedprice x (1 - l_discount)`` in
    exact integer 10^-4 dollar units (int64)."""
    return cents(F.col("l_extendedprice")) * cents(
        1 - F.col("l_discount")
    )


def rev4() -> Column:
    """sum of :func:`net4` — exact int64, order-independent."""
    return F.sum(net4())


def net4_sql(p: str = "") -> str:
    """DuckDB twin of :func:`net4` (``p`` = table alias prefix)."""
    return (
        f"(CAST(round({p}l_extendedprice * 100) AS BIGINT)"
        f" * CAST(round((1 - {p}l_discount) * 100) AS BIGINT))"
    )


def rev4_sql(p: str = "") -> str:
    """DuckDB twin of :func:`rev4`."""
    return f"sum({net4_sql(p)})"


def safe_corr(x: Column | str, y: Column | str) -> Column:
    """Pearson correlation that yields NULL (not a crash) at zero variance.

    Under ANSI mode (this engine's default) Spark's ``corr`` THROWS
    ``DIVIDE_BY_ZERO`` when either input has zero variance over an
    n >= 2 group, while DuckDB's ``corr`` — every declared oracle —
    yields NULL (probed live: ``corr`` is the ONLY member of the stat
    family with this behavior; covar/stddev/var/regr_* are all
    NULL-or-0-safe). A degenerate group is latent in today's fixtures
    but one fixture regeneration away from a crashed builder = red
    driver row, so declared queries use this composed algebraic form:
    corr = covar_pop / (stddev_pop * stddev_pop) with ``try_divide``
    supplying the DuckDB NULL. Verified equal to ``F.corr`` at
    pround-6 repr on every fixture group and against DuckDB directly
    (pinned by test_safe_corr_parity_and_degenerate).
    """
    return F.try_divide(
        F.covar_pop(x, y), F.stddev_pop(x) * F.stddev_pop(y)
    )


_ASCII_UP = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
_ASCII_LO = "abcdefghijklmnopqrstuvwxyz"


def fold_lower(col: Column | str) -> Column:
    """Byte-stable ASCII case-fold for hash-keyed canonicalization.

    Engine-native ``lower``/``upper`` embed locale-free but
    CONVENTION-dependent Unicode mappings that differ across engines
    (probed live: Java/Spark ``lower('İ')`` = ``'i̇'`` (2 chars,
    combining dot) vs DuckDB/utf8proc ``'i'``; ``upper('ß')`` =
    ``'SS'`` vs ``'ẞ'``) — so a case-folded md5 KEY built with native
    functions silently diverges cross-engine on those code points.
    Dedup keys need bit-stable folding more than they need full
    Unicode folding: ``translate`` over the 26 ASCII letters is
    identical in every engine and leaves non-ASCII letters unchanged
    (two texts differing only in İ/i casing stay distinct — the
    documented trade; a production multilingual pipeline would apply
    ONE ICU normalizer in ingest, upstream of any engine function).
    SQL twin: :func:`fold_lower_sql`.
    """
    return F.translate(col, _ASCII_UP, _ASCII_LO)


def fold_upper(col: Column | str) -> Column:
    """ASCII twin of :func:`fold_lower` in the upper direction."""
    return F.translate(col, _ASCII_LO, _ASCII_UP)


def fold_lower_sql(expr: str) -> str:
    """DuckDB twin of :func:`fold_lower`."""
    return f"translate({expr}, '{_ASCII_UP}', '{_ASCII_LO}')"


def fold_upper_sql(expr: str) -> str:
    """DuckDB twin of :func:`fold_upper`."""
    return f"translate({expr}, '{_ASCII_LO}', '{_ASCII_UP}')"
