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
