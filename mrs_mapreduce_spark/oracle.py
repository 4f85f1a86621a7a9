"""Local replica of the driver's DuckDB correctness oracle.

The external driver runs every ``queries()[name]`` against
``oracle_sql()[name]`` (DuckDB) at sf0.01 and compares row count + schema +
order-insensitive value hash. This module reproduces that check locally so a
query is never *declared* before it has been *verified* (SURVEY.md §5.2
rule: "never declare a query whose hash we haven't matched locally").
"""

from __future__ import annotations

import datetime as _dt
import math
from dataclasses import dataclass, field

import duckdb
from pyspark.sql import DataFrame, SparkSession

from .catalog import TABLES


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """In-memory DuckDB with the fixture views registered (driver-style).

    r10 gate review hardening:
    - ``TimeZone`` pinned UTC: Spark's session zone is pinned UTC
      (session.RUNTIME_CONFS), and _canon_value strips tzinfo — on a
      non-UTC host an unpinned DuckDB would localize TIMESTAMPTZ cells
      to a different wall clock before the strip, failing (or worse,
      coincidentally passing) every timestamp comparison.
    - Directory-layout parquet (Spark-written tables, the synth tiers)
      binds via a glob; DuckDB's read_parquet validates at CREATE VIEW
      and cannot read a bare directory path.
    - A missing table skips its view instead of aborting the whole
      sweep (queries that touch it fail individually; the rest run).
    """
    import os

    con = duckdb.connect()
    con.execute("SET TimeZone = 'UTC'")
    for name in TABLES:
        path = f"{sf_dir}/{name}.parquet"
        src = f"'{path}/*.parquet'" if os.path.isdir(path) else f"'{path}'"
        try:
            con.execute(
                f"CREATE OR REPLACE VIEW {name} AS "
                f"SELECT * FROM read_parquet({src})"
            )
        except Exception:  # missing/unreadable: surface per-query
            pass
    return con


def _canon_value(v):
    """Canonicalize one cell so Spark and DuckDB results compare equal."""
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # The driver hashes repr-level values: repr(-0.0) != repr(0.0),
        # so negative zero MUST stay distinct here (the r8
        # feature_standardize red row proved the old `v + 0.0` collapse
        # made this sim blinder than the driver). A distinct marker —
        # not the float itself — because Python's -0.0 == 0.0 would
        # erase the difference in tuple comparison.
        if v == 0.0 and math.copysign(1.0, v) < 0.0:
            return "\x00-0.0"
        return v
    if isinstance(v, _dt.datetime):
        # aware values convert to UTC BEFORE the strip: Spark's session
        # zone is pinned UTC, so the naive twin of an instant is its
        # UTC wall clock — stripping a localized datetime on a non-UTC
        # host would compare different wall clocks (r10 gate review)
        if v.tzinfo is not None:
            v = v.astimezone(_dt.timezone.utc)
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_canon_value(x) for x in v)
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    if isinstance(v, _dt.timedelta):
        return v.total_seconds()
    return v


def _canon_rows(cols: list[str], rows: list[tuple]) -> list[tuple]:
    """Sort columns by name (driver behavior), canonicalize, sort rows."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_canon_value(r[i]) for i in order) for r in rows]
    return sorted(out, key=repr)


def _driver_shape_issues(side: str, cols: list[str], rows: list[tuple]) -> list[str]:
    """Run the driver's ACTUAL canonicalization op: pandas sort_values.

    The r3 red row proved the external driver sorts results with
    ``pandas.DataFrame.sort_values`` over all columns, which raises
    ``TypeError: unhashable type`` on array/map cells — a failure mode the
    tuple-sort in ``_canon_rows`` cannot see. Reproduce it here so any
    driver-incompatible output schema fails locally, on both the Spark
    result and the oracle result.
    """
    import numpy as np
    import pandas as pd

    # direct cell walk first (ADVICE r4): pandas' multi-column
    # sort_values factorizes (hashes) cells and raises TypeError on
    # lists — but a SINGLE column sorts via argsort, where Python list
    # comparison succeeds, so a one-array-column result would slip
    # through the sort probe below. Flag container cells explicitly
    # instead of depending on pandas' sort implementation details
    # (every row, not just the first: a nullable array column can hold
    # None in row 0 and a list further down).
    for r in rows:
        for i, v in enumerate(r):
            if isinstance(v, (list, tuple, dict, set, np.ndarray)):
                return [
                    f"{side} result column {cols[i]!r} holds "
                    f"{type(v).__name__} cells — driver-canonicalizer "
                    "incompatible; flatten array/map columns "
                    "(array_join / string_agg discipline)"
                ]

    try:
        pdf = pd.DataFrame(rows, columns=cols)
        if len(pdf):
            pdf.sort_values(by=sorted(cols), kind="mergesort")
    except TypeError as exc:
        return [
            f"{side} result is driver-canonicalizer incompatible "
            f"(pandas sort_values: {exc}) — flatten array/map columns "
            "(array_join / string_agg discipline)"
        ]
    return []


def _negzero_issues(side: str, cols: list[str], rows: list[tuple]) -> list[str]:
    """Ban emitted ``-0.0`` registry-wide (the r8 feature_standardize class).

    A cell that rounds to negative zero means the value is
    indistinguishable from 0 at the declared precision while its SIGN is
    partition-summation-order noise — the driver's repr-level hash
    distinguishes ``-0.0`` from ``0.0``, so such a query is a coin-flip
    red row across runs/engines. The discipline (SURVEY §7.4 rule 2):
    emit a boolean witness (``abs(x) < eps AS x_zero_ok``) or normalize
    with ``+ 0.0`` — NOT bare ``abs()``, which DuckDB defines as
    sign-preserving on -0.0 while Spark clears it.
    """
    issues: list[str] = []
    for r in rows:
        for i, v in enumerate(r):
            if (
                isinstance(v, float)
                and v == 0.0
                and math.copysign(1.0, v) < 0.0
            ):
                issues.append(
                    f"{side} result column {cols[i]!r} emits -0.0 — "
                    "sign-unstable zero (r8 feature_standardize class); "
                    "emit a boolean witness or `+ 0.0` instead"
                )
                break
        if issues:
            break
    return issues


def _cells_close(ra: tuple, rb: tuple, tol: float) -> bool:
    if len(ra) != len(rb):
        return False
    for x, y in zip(ra, rb):
        if x == y:
            continue
        if (
            isinstance(x, (int, float))
            and isinstance(y, (int, float))
            and not isinstance(x, bool)
            and not isinstance(y, bool)
            and abs(float(x) - float(y)) <= tol
        ):
            continue
        return False
    return True


def _rows_close(a: list[tuple], b: list[tuple], tol: float) -> bool:
    """Cell-wise comparison allowing ``tol`` absolute error on numerics.

    Rows are matched on their NON-numeric cells first, then IN SORTED
    ORDER within each group — a positional zip after repr-sorting would
    misalign genuinely-close rows whenever a within-tolerance float
    delta flips the canonical sort order between engines, and matching
    each row against an UNSORTED pool greedily can reject sets that
    have a valid pairing (r10 gate review: a=[1.0, 2.0] vs
    b=[1.5, 0.5] at tol=0.5 — greedy pairs 1.0->1.5 then strands 2.0;
    sorting both sides numerically makes in-order pairing the optimal
    matching for interval tolerance on scalars).

    Sorted in-order pairing is provably optimal only for a SINGLE
    numeric column; with >= 2 numeric cells it can reject sets that
    have a valid within-tolerance matching (ADVICE r10:
    a=[(0,10),(1,0)] vs b=[(1,10),(0,0)] at tol=1 sorts a by (0,10)
    first but b by (0,0) first). When in-order pairing fails on a
    multi-numeric group, an exact maximum-bipartite-matching retry
    (Kuhn's augmenting paths — polynomial, never the factorial blowup
    naive backtracking risks on dense tolerance graphs; r12 advice)
    decides the pairing — false negatives only shrink; a false green is
    still impossible (every accepted pair passes _cells_close).
    """
    if len(a) != len(b):
        return False

    def key_of(r: tuple) -> tuple:
        return tuple(
            None
            if isinstance(x, (int, float)) and not isinstance(x, bool)
            else x
            for x in r
        )

    def num_key(r: tuple) -> tuple:
        return tuple(
            float(x)
            if isinstance(x, (int, float)) and not isinstance(x, bool)
            else 0.0
            for x in r
        )

    pool_a: dict[tuple, list[tuple]] = {}
    pool_b: dict[tuple, list[tuple]] = {}
    for r in a:
        pool_a.setdefault(key_of(r), []).append(r)
    for r in b:
        pool_b.setdefault(key_of(r), []).append(r)
    if set(pool_a) != set(pool_b):
        return False
    def perfect_matching(rows_a: list[tuple], rows_b: list[tuple]) -> bool:
        """True iff a perfect within-tolerance pairing exists.

        Kuhn's augmenting-path maximum matching over the _cells_close
        adjacency: O(n * edges), so a dense 16x16 group costs ~4k edge
        visits — the naive backtracking this replaces explored up to 16!
        partial assignments when many pairs are close but no perfect
        matching exists (it could effectively hang the gate on a FAILING
        comparison; r12 advice).
        """
        n = len(rows_a)
        adj = [
            [j for j, rb in enumerate(rows_b) if _cells_close(ra, rb, tol)]
            for ra in rows_a
        ]
        match_of_b: list[int | None] = [None] * n

        def try_augment(i: int, seen: list[bool]) -> bool:
            for j in adj[i]:
                if not seen[j]:
                    seen[j] = True
                    if match_of_b[j] is None or try_augment(
                        match_of_b[j], seen
                    ):
                        match_of_b[j] = i
                        return True
            return False

        return all(try_augment(i, [False] * n) for i in range(n))

    for k, rows_a in pool_a.items():
        rows_b = pool_b[k]
        if len(rows_a) != len(rows_b):
            return False
        sa = sorted(rows_a, key=num_key)
        sb = sorted(rows_b, key=num_key)
        if all(_cells_close(ra, rb, tol) for ra, rb in zip(sa, sb)):
            continue
        # in-order pairing failed: optimal only for one numeric column.
        # Retry with exact bipartite matching; polynomial, so the cap is
        # generous (128 rows ≈ 2M edge visits worst case) — beyond it
        # keep the sorted verdict (false-negative-only, never a false
        # green)
        n_num = sum(
            1
            for x in sa[0]
            if isinstance(x, (int, float)) and not isinstance(x, bool)
        )
        if n_num < 2 or len(sa) > 128 or not perfect_matching(sa, sb):
            return False
    return True


#: DuckDB result type → Spark ``simpleString`` it must pair with for the
#: driver's *type-sensitive* value hash to match. HUGEINT/UHUGEINT are
#: deliberately absent: DuckDB's bare ``sum(int)`` is HUGEINT, which
#: pandas/arrow widens to float64/object and the driver hash diverges even
#: when the values are equal (the round-1 ``agg_pivot`` failure) — oracles
#: must ``CAST(... AS BIGINT)`` instead.
_DUCK_TO_SPARK = {
    "BOOLEAN": "boolean",
    "TINYINT": "tinyint",
    "SMALLINT": "smallint",
    "INTEGER": "int",
    "BIGINT": "bigint",
    "FLOAT": "float",
    "DOUBLE": "double",
    "VARCHAR": "string",
    "DATE": "date",
    "TIMESTAMP": "timestamp_ntz",
    "TIMESTAMP WITH TIME ZONE": "timestamp",
    "BLOB": "binary",
}

#: type kinds that hash identically after the driver's canonicalization
#: (python ints of any width; naive vs zoned timestamps collapse once the
#: tz is stripped), so a width difference inside one kind is not an error.
_TYPE_KINDS = {
    "tinyint": "i",
    "smallint": "i",
    "int": "i",
    "bigint": "i",
    "float": "f",
    "double": "f",
    "timestamp": "ts",
    "timestamp_ntz": "ts",
}


def _duck_type_to_spark(t) -> str:
    """Canonical Spark simpleString for a DuckDB result type (best effort)."""
    s = str(t).upper()
    if s.endswith("[]"):
        return f"array<{_duck_type_to_spark(s[:-2])}>"
    if s.startswith("DECIMAL"):
        return s.lower()
    return _DUCK_TO_SPARK.get(s, s.lower())


def _type_issues(spark_df: DataFrame, rel) -> list[str]:
    """Flag DuckDB↔Spark result-type pairs the driver's hash would split.

    The driver's value hash is type-sensitive (ADVICE round 1): HUGEINT vs
    BIGINT hash-mismatches even with equal values. Compare the oracle's
    result types against the Spark schema by *hash kind* so a locally-green
    query predicts a driver-green query.
    """
    issues = []
    s_types = {f.name: f.dataType.simpleString() for f in spark_df.schema.fields}
    for col, dtyp in zip(rel.columns, rel.types):
        d = _duck_type_to_spark(dtyp)
        s = s_types.get(col)
        if s is None:
            continue  # column-name diff reported separately
        if d == s:
            continue
        if _TYPE_KINDS.get(d) is not None and _TYPE_KINDS.get(d) == _TYPE_KINDS.get(s):
            continue
        if d.startswith("array<") and s.startswith("array<"):
            di, si = d[6:-1], s[6:-1]
            if di == si or (
                _TYPE_KINDS.get(di) is not None
                and _TYPE_KINDS.get(di) == _TYPE_KINDS.get(si)
            ):
                continue
        issues.append(f"type-kind mismatch on {col!r}: duck={d} spark={s}")
    return issues


@dataclass
class CompareResult:
    name: str
    ok: bool
    spark_rows: int
    duck_rows: int
    issues: list[str] = field(default_factory=list)

    def __str__(self) -> str:
        status = "OK " if self.ok else "FAIL"
        msg = f"[{status}] {self.name}: spark={self.spark_rows} duck={self.duck_rows}"
        for issue in self.issues[:6]:
            msg += f"\n    - {issue}"
        return msg


def compare(
    name: str,
    spark_df: DataFrame,
    con: duckdb.DuckDBPyConnection,
    sql: str,
    float_tol: float = 0.0,
) -> CompareResult:
    """Run both sides and diff (count, column names, types, canonical values).

    ``float_tol`` > 0 relaxes the value check: rows that differ only by
    ≤ ``float_tol`` absolute error in numeric cells still pass. The default
    0.0 mirrors the driver (exact hash); use a tolerance only for local
    debugging of summation-order effects, never to declare a query.
    """
    issues: list[str] = []
    s_cols = list(spark_df.columns)
    s_rows = [tuple(r) for r in spark_df.collect()]
    rel = con.sql(sql)
    d_cols = list(rel.columns)
    issues.extend(_type_issues(spark_df, rel))
    d_rows = rel.fetchall()

    if sorted(s_cols) != sorted(d_cols):
        issues.append(f"columns differ: spark={sorted(s_cols)} duck={sorted(d_cols)}")
    if len(s_rows) != len(d_rows):
        issues.append("row counts differ")
    issues.extend(_negzero_issues("spark", s_cols, s_rows))
    issues.extend(_negzero_issues("duck", d_cols, d_rows))
    issues.extend(_driver_shape_issues("spark", s_cols, s_rows))
    issues.extend(_driver_shape_issues("duck", d_cols, d_rows))

    if not issues:
        cs = _canon_rows(s_cols, s_rows)
        cd = _canon_rows(d_cols, d_rows)
        if cs != cd and not (float_tol > 0.0 and _rows_close(cs, cd, float_tol)):
            n_bad = sum(1 for a, b in zip(cs, cd) if a != b)
            issues.append(f"{n_bad}/{len(cs)} canonical rows differ")
            for a, b in zip(cs, cd):
                if a != b:
                    issues.append(f"spark={a!r}")
                    issues.append(f"duck ={b!r}")
                    break
    return CompareResult(name, not issues, len(s_rows), len(d_rows), issues)


def check_queries(
    spark: SparkSession,
    sf_dir: str,
    names: list[str] | None = None,
) -> list[CompareResult]:
    """Run the full declared inventory against the oracle at ``sf_dir``."""
    from .registry import load_all

    registry = load_all()
    if names:
        unknown = sorted(set(names) - set(registry))
        if unknown:  # a typo must not read as a 0/0 green sweep
            raise KeyError(f"not in the registry: {unknown}")
    con = duck_connect(sf_dir)
    results = []
    for name, q in registry.items():
        if names and name not in names:
            continue
        try:
            df = q.builder(spark, sf_dir)
            if q.oracle is None:
                n = df.count()
                results.append(CompareResult(name, n >= 0, n, -1, ["rows-only"]))
            else:
                results.append(compare(name, df, con, q.oracle))
        except Exception as exc:  # surface, don't abort the sweep
            results.append(
                CompareResult(name, False, -1, -1, [f"{type(exc).__name__}: {exc}"])
            )
    return results
