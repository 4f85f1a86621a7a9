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
    """In-memory DuckDB with the fixture views registered (driver-style)."""
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {name} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con


def _canon_value(v):
    """Canonicalize one cell so Spark and DuckDB results compare equal."""
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # collapse -0.0 vs 0.0 and represent exactly
        return v + 0.0
    if isinstance(v, _dt.datetime):
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
    """Run both sides and diff (count, column names, canonical values)."""
    issues: list[str] = []
    s_cols = list(spark_df.columns)
    s_rows = [tuple(r) for r in spark_df.collect()]
    rel = con.execute(sql)
    d_cols = [d[0] for d in rel.description]
    d_rows = rel.fetchall()

    if sorted(s_cols) != sorted(d_cols):
        issues.append(f"columns differ: spark={sorted(s_cols)} duck={sorted(d_cols)}")
    if len(s_rows) != len(d_rows):
        issues.append("row counts differ")

    if not issues:
        cs = _canon_rows(s_cols, s_rows)
        cd = _canon_rows(d_cols, d_rows)
        if cs != cd:
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
