"""Pin catalog.table's memo semantics: eviction on rebuild, no growth.

The memo must hold at most ONE entry per (sf_dir, name): a fixture rebuilt
in place (new mtime) yields a fresh DataFrame AND evicts the superseded
entry, so repeated rebuild cycles (synth_scale-style flows) don't pin an
unbounded chain of stale DataFrames on the session.
"""

from __future__ import annotations

import os
import shutil

from mrs_mapreduce_spark.catalog import table


def test_rebuild_evicts_superseded_entry(spark, sf_dir, tmp_path):
    local = str(tmp_path / "sf")
    os.makedirs(local)
    path = f"{local}/nation.parquet"
    shutil.copy2(f"{sf_dir}/nation.parquet", path)

    df1 = table(spark, local, "nation")
    assert table(spark, local, "nation") is df1  # memo hit

    cache = spark._mrs_table_cache
    n_before = sum(1 for k in cache if k[0] == local)
    assert n_before == 1

    # rebuild in place: bump the dataset path's mtime
    st = os.stat(path)
    os.utime(path, ns=(st.st_atime_ns, st.st_mtime_ns + 1_000_000))

    df2 = table(spark, local, "nation")
    assert df2 is not df1  # fresh DataFrame after rebuild
    n_after = sum(1 for k in cache if k[0] == local)
    assert n_after == 1, "superseded entry must be evicted, not accumulated"
    assert table(spark, local, "nation") is df2  # and the new one memoizes


def test_check_queries_unknown_name_raises(spark):
    """r10 gate review: a typo'd query name must not read as a 0/0
    green sweep."""
    import pytest as _pytest

    from mrs_mapreduce_spark.oracle import check_queries

    with _pytest.raises(KeyError, match="not in the registry"):
        check_queries(spark, "/root/testdata/sf0.01", ["agg_pivott"])


def test_duck_connect_pins_utc_and_tolerates_missing_tables(tmp_path):
    """r10 gate review: DuckDB's zone is pinned to Spark's UTC, and a
    missing fixture table skips its view instead of aborting."""
    from mrs_mapreduce_spark.oracle import duck_connect

    con = duck_connect(str(tmp_path))  # empty dir: every table missing
    assert con.execute("SELECT current_setting('TimeZone')").fetchone()[
        0
    ] == "UTC"
    # localization round-trip: an instant renders as its UTC wall clock
    v = con.execute(
        "SELECT ('2020-01-01 00:00:00+00'::TIMESTAMPTZ)"
    ).fetchone()[0]
    from mrs_mapreduce_spark.oracle import _canon_value

    assert _canon_value(v) == "2020-01-01T00:00:00"


def test_register_views_rebind_after_fixture_rebuild(spark, tmp_path):
    """r10 gate review: an in-place fixture rebuild must rebind the sql
    temp views, not serve the pre-rebuild file listing."""
    import shutil

    from mrs_mapreduce_spark.catalog import TABLES, register_views

    src = "/root/testdata/sf0.001"
    dst = str(tmp_path / "fx")
    shutil.copytree(src, dst)
    register_views(spark, dst)
    n1 = spark.sql("SELECT count(*) FROM region").collect()[0][0]
    # rebuild region in place with fewer rows (copy nation over it)
    shutil.copy(f"{src}/nation.parquet", f"{dst}/region.parquet")
    register_views(spark, dst)
    n2 = spark.sql("SELECT count(*) FROM region").collect()[0][0]
    assert n2 != n1  # stale binding would have returned n1
