"""Bulk cross-engine pin of the rounding discipline (exprs.pround).

Written as adversarial hunting (2000 seeded-random doubles + an
engineered nasty set) and it DID find the seam on first run — which
turned out to be exactly the documented one: for values in
(-0.5*10^-n, 0], Spark's round(x*scale, 0)/scale yields +0.0 while
DuckDB's round preserves the sign and yields -0.0 (repr-level hash
divergence, the r8 feature_standardize class). That is precisely why
``pround0`` exists and why its oracles pair with ``round(x, n) + 0.0``.
This module pins the REAL contract in both directions:

1. away from zero, pround and DuckDB round agree bit-for-bit at
   repr level — including shortest-repr halves (2.675, 1.005),
   exact .005 rationals (the money boundary), and dyadic exacts;
2. every divergence between bare pround and bare DuckDB round is a
   zero-sign divergence and nothing else;
3. pround0 vs ``round(x, n) + 0.0`` agree bit-for-bit EVERYWHERE,
   zero seam remaining.
"""

from __future__ import annotations

import random

import duckdb


def _value_sets():
    rng = random.Random(1711)
    vals = [rng.uniform(-1000, 1000) for _ in range(800)]
    vals += [rng.uniform(-1, 1) for _ in range(400)]
    vals += [rng.uniform(-1e6, 1e6) for _ in range(400)]
    # engineered boundaries: shortest-repr halves, exact rationals,
    # negative twins, subnormal neighborhoods, both zeros
    vals += [2.675, -2.675, 1.005, -1.005, 0.125, -0.125, 90.045,
             -90.045, 0.005, -0.005, 2.5, -2.5, 0.0049999, -0.0049999,
             1e-300, -1e-300, 0.0, -0.0]
    vals += [k + 0.005 for k in range(-10, 10)]   # exact 3-decimal .005
    vals += [k / 16 for k in range(-40, 40)]      # dyadic exacts
    return [(i, float(v)) for i, v in enumerate(vals)]


def test_pround_matches_duckdb_round_on_doubles(spark):
    from mrs_mapreduce_spark.exprs import pround, pround0

    rows = _value_sets()
    sdf = spark.createDataFrame(rows, "i long, x double").select(
        "i",
        pround("x", 2).alias("r2"),
        pround("x", 4).alias("r4"),
        pround0("x", 2).alias("z2"),
        pround0("x", 4).alias("z4"),
    )
    got = {
        r["i"]: (repr(r["r2"]), repr(r["r4"]), repr(r["z2"]), repr(r["z4"]))
        for r in sdf.collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t (i BIGINT, x DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    want = {
        i: (repr(a), repr(b), repr(za), repr(zb))
        for i, a, b, za, zb in con.execute(
            "SELECT i, round(x, 2), round(x, 4),"
            " round(x, 2) + 0.0, round(x, 4) + 0.0 FROM t"
        ).fetchall()
    }
    byval = dict(rows)
    # (3) the normalized pair has NO seam at all
    zbad = {
        i: (got[i][2:], want[i][2:], byval[i])
        for i in got
        if got[i][2:] != want[i][2:]
    }
    assert not zbad, f"pround0 diverged: {list(zbad.items())[:5]}"
    # (1)+(2) bare pround diverges ONLY by sign of zero
    seam = {}
    for i in got:
        for g, w in zip(got[i][:2], want[i][:2]):
            if g != w:
                seam[i] = (g, w, byval[i])
                # the only tolerated divergence: +0.0 vs -0.0
                assert g == "0.0" and w == "-0.0", (
                    f"non-zero-sign divergence at x={byval[i]!r}: "
                    f"spark={g} duckdb={w}"
                )
    # the seam must actually be exercised (engineered -0.0 inputs), so
    # a future pround change that silently widens it cannot hide
    assert seam, "nasty set no longer exercises the -0.0 seam"
    assert all(v < 0 or v == 0.0 for _, _, v in seam.values())
