"""Pin corpus_pack_contexts' gated prefix-sum regimes against each other.

Below `_PACK_TWO_LEVEL_GATE` buckets the offset cumsum is one window over
the subtotal relation; above it, a two-level super-bucket scheme bounds
every task. The fixtures never cross the gate, so the two-level path gets
its coverage here: both regimes must produce IDENTICAL offsets on the
same subtotal relation (including empty buckets / irregular bucket ids),
the same discipline as the semdedup broadcast-overflow tests.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mrs_mapreduce_spark.llm.curation import _bucket_offsets


def _offsets(df, span, two_level):
    rows = _bucket_offsets(df, span, two_level=two_level).collect()
    return {r["bucket"]: r["offset"] for r in rows}


def test_two_level_matches_one_level(spark):
    # 1000 buckets with irregular sizes and GAPS (buckets 300-399 absent)
    # so the within-super prefix must handle partial supers
    btok = (
        spark.range(1000)
        .select(F.col("id").alias("bucket"))
        .filter((F.col("bucket") < 300) | (F.col("bucket") >= 400))
        .select(
            "bucket",
            ((F.col("bucket") * 37) % 113 + 1).cast("long").alias("btok"),
        )
    )
    one = _offsets(btok, span=16, two_level=False)
    two = _offsets(btok, span=16, two_level=True)
    assert one == two and len(one) == 900


def test_offsets_are_exclusive_prefix_sums(spark):
    btok = spark.createDataFrame(
        [(0, 10), (1, 5), (2, 7)], ["bucket", "btok"]
    ).select("bucket", F.col("btok").cast("long").alias("btok"))
    assert _offsets(btok, span=2, two_level=True) == {0: 0, 1: 10, 2: 15}


def test_cached_count_memoizes(spark):
    from mrs_mapreduce_spark.catalog import cached_count

    df = spark.range(137)
    assert cached_count(df) == 137
    df._mrs_row_count = 999  # a second call must NOT re-count
    assert cached_count(df) == 999


def test_table_memo_invalidates_on_rebuild(spark, tmp_path):
    # a fixture rewritten in place mid-session (synth_scale flows) must
    # yield a fresh DataFrame — and thus a fresh cached_count — because
    # the memo key includes the parquet path's mtime
    import os
    import time

    from mrs_mapreduce_spark.catalog import cached_count, table

    sf_dir = str(tmp_path)
    path = f"{sf_dir}/region.parquet"
    spark.range(5).write.parquet(path)
    first = table(spark, sf_dir, "region")
    assert table(spark, sf_dir, "region") is first  # memo hit
    assert cached_count(first) == 5
    time.sleep(0.01)
    spark.range(9).write.mode("overwrite").parquet(path)
    os.utime(path)  # overwrite may reuse dir inode times at coarse res
    rebuilt = table(spark, sf_dir, "region")
    assert rebuilt is not first
    assert cached_count(rebuilt) == 9


def test_pack_gate_is_bucket_domain_aware(spark, monkeypatch):
    # a sparse doc_id domain (1 doc per bucket) must flip the regime to
    # two-level even when ceil(rows/span) is far below the gate: rows
    # alone can't prove the bucket domain is small
    from mrs_mapreduce_spark.llm import curation

    monkeypatch.setattr(curation, "_PACK_TWO_LEVEL_GATE", 8)

    def btok_for(stride):
        docs = spark.range(12).select(
            (F.col("id") * stride).alias("doc_id")
        )
        d = docs.select(
            "doc_id",
            F.expr(f"doc_id div {curation._BUCKET}").alias("bucket"),
        )
        return d.groupBy("bucket").agg(F.count(F.lit(1)).alias("btok"))

    # strided ids: 12 rows -> 12 buckets > gate(8); ceil(12/256)=1 would
    # have (wrongly) kept one-level under the old rows/span gate
    sparse = btok_for(curation._BUCKET * 3)
    two_level, _ = curation._pack_regime(12, sparse)
    assert two_level is True
    # dense ids: 12 rows -> 1 bucket, same row count -> one-level via
    # the exact probe (rows=12 > gate makes the bounds inconclusive)
    dense = btok_for(1)
    two_level, _ = curation._pack_regime(12, dense)
    assert two_level is False
    # rows <= gate proves one-level with no probe job at all
    two_level, _ = curation._pack_regime(8, sparse)
    assert two_level is False
