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
