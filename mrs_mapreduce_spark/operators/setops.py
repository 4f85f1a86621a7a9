"""Set operations: union, intersect, except.

Capability parity: SURVEY.md §2.B B18/B19. Multi-file ``file_data`` is the
reference's union (A1); intersect/except are reduce-side side-presence
checks a Mrs user writes by hand. Here they are native operators that
compile to union / left-semi-style aggregation plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..exprs import pround
from ..registry import register


@register(
    "set_union",
    oracle="""
    SELECT c_custkey AS id, 'cust' AS side, round(c_acctbal, 2) AS bal
    FROM customer
    UNION ALL
    SELECT s_suppkey AS id, 'supp' AS side, round(s_acctbal, 2) AS bal
    FROM supplier
    """,
    survey="B18",
    scale="""
    unionByName is a metadata concat — zero shuffle, partitions of both
    children are simply appended. Row-count additivity is tested as a
    hypothesis property.
    """,
)
def set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-aligned union of two entity tables."""
    cust = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("id"),
        F.lit("cust").alias("side"),
        pround("c_acctbal", 2).alias("bal"),
    )
    supp = table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("id"),
        F.lit("supp").alias("side"),
        pround("s_acctbal", 2).alias("bal"),
    )
    return cust.unionByName(supp)


@register(
    "set_intersect",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    """,
    survey="B19",
    scale="""
    INTERSECT compiles to a left-semi join over distinct keys — one
    shuffle per side on the compared columns.
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers present in both order-status populations."""
    orders = table(spark, sf_dir, "orders")
    f_side = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    o_side = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    return f_side.intersect(o_side)


@register(
    "set_except",
    oracle="""
    SELECT o_custkey FROM orders
    EXCEPT ALL
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
    survey="B19",
    scale="""
    EXCEPT ALL preserves multiplicity (bag semantics): implemented as a
    counted anti-subtraction — per-key counts on both sides, emit
    max(left−right, 0) copies. One shuffle per side.
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-semantics subtraction (non-finished order slots per customer)."""
    orders = table(spark, sf_dir, "orders")
    all_side = orders.select("o_custkey")
    f_side = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return all_side.exceptAll(f_side)


@register(
    "set_intersect_all",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    INTERSECT ALL
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    """,
    survey="B19 (INTERSECT ALL — bag semantics, completes the set-op family)",
    scale="""
    INTERSECT ALL preserves multiplicity: per-key counts on both sides,
    emit min(left, right) copies per key. Like exceptAll this compiles to
    counted generation after one shuffle per side — the shuffle carries
    (key, count) after partial aggregation, never the raw bags, so a
    100 TB bag intersect moves only distinct-key-sized data.
    """,
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-semantics intersection (matched order slots per customer)."""
    orders = table(spark, sf_dir, "orders")
    f_side = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    o_side = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    return f_side.intersectAll(o_side)


@register(
    "set_union_byname",
    oracle="""
    SELECT event_id AS id, event_type AS kind,
           round(value, 2) AS value, CAST(NULL AS DOUBLE) AS price
    FROM events
    UNION ALL
    SELECT o_orderkey AS id, o_orderstatus AS kind,
           CAST(NULL AS DOUBLE) AS value, round(o_totalprice, 2) AS price
    FROM orders
    """,
    survey="B18/E22 (schema-evolving union: unionByName with "
    "allowMissingColumns — the heterogeneous-source concat)",
    scale="""
    ``unionByName(allowMissingColumns=True)`` resolves columns by NAME,
    null-padding each child's absent columns — the union a 100 TB lake
    actually needs, where month-over-month parquet schemas drift (new
    columns appear, old ones retire). Like plain union it is a metadata
    concat: zero shuffle, zero data movement; the null fill is a literal
    projection inside each child's scan stage (WholeStageCodegen), so
    schema drift costs nothing at read time. Contrast with positional
    ``UNION ALL`` which silently mis-aligns drifted schemas — the oracle
    spells the alignment explicitly with typed NULL casts.
    """,
)
def set_union_byname(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union two sources with DIFFERENT schemas, aligned by column name."""
    ev = table(spark, sf_dir, "events").select(
        F.col("event_id").alias("id"),
        F.col("event_type").alias("kind"),
        pround("value", 2).alias("value"),
    )
    orders = table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("id"),
        F.col("o_orderstatus").alias("kind"),
        pround("o_totalprice", 2).alias("price"),
    )
    return ev.unionByName(orders, allowMissingColumns=True)


def _row_fp():
    """THE (st, cents, pri) row fingerprint both diff operators key on.

    One definition shared by table_diff's fp() and
    table_diff_incremental's finger() so the twins (whose oracles spell
    the identical md5(st || '|' || cents || '|' || pri)) can never
    drift (r11 setops review).
    """
    return F.md5(
        F.concat_ws(
            "|", F.col("st"), F.col("cents").cast("string"), F.col("pri")
        )
    )


@register(
    "table_diff",
    oracle="""
    WITH a AS (SELECT o_orderkey AS k, o_orderstatus AS st,
                      CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
                      o_orderpriority AS pri
               FROM orders),
    b AS (SELECT k, st, cents + CASE WHEN k % 5 = 0 THEN 100 ELSE 0 END
                 AS cents, pri
          FROM a WHERE k % 7 <> 0
          UNION ALL
          SELECT k + 10000000, st, cents, pri FROM a WHERE k % 7 = 0),
    fa AS (SELECT k, md5(st || '|' || CAST(cents AS VARCHAR) || '|' || pri)
                  AS fp FROM a),
    fb AS (SELECT k, md5(st || '|' || CAST(cents AS VARCHAR) || '|' || pri)
                  AS fp FROM b),
    d AS (SELECT COALESCE(fa.k, fb.k) AS k,
                 CASE WHEN fb.k IS NULL THEN 'deleted'
                      WHEN fa.k IS NULL THEN 'inserted'
                      WHEN fa.fp <> fb.fp THEN 'updated'
                      ELSE 'unchanged' END AS change_type
          FROM fa FULL OUTER JOIN fb ON fa.k = fb.k)
    SELECT change_type, count(*) AS n,
           CAST(min(k) AS BIGINT) AS min_key, CAST(max(k) AS BIGINT) AS max_key
    FROM d GROUP BY change_type
    """,
    survey="B19 extension (snapshot reconciliation / CDC table diff: "
    "row-fingerprint FULL OUTER join classifying inserted / deleted / "
    "updated / unchanged)",
    scale="""
    The reconciliation primitive for two 100 TB snapshots: each side is
    reduced AT SCAN to (key, fingerprint) — one md5 over the concatenated
    business columns inside WholeStageCodegen, so the join carries 2
    narrow columns no matter how wide the table — then ONE full outer
    sort-merge join on the primary key classifies every row. With both
    snapshots bucketed by key (sink_bucketed_join's layout) the join is
    zero-exchange. The production refinement the plan shape already
    admits: a per-bucket checksum pre-pass (sum of fingerprint words per
    key range, two tiny aggregates) prunes identical buckets before the
    row-level join — day-over-day snapshots that differ in 0.1% of rows
    then pay the full join on only the touched buckets. The synthetic
    twin here derives snapshot B from A deterministically (k%7 deleted
    and re-inserted under shifted keys, k%5 repriced) so both engines
    build byte-identical inputs; price compares in integer cents to keep
    the fingerprint float-free cross-engine.
    """,
)
def table_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classify row changes between two snapshots via fingerprint diff."""
    a = table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderstatus").alias("st"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        F.col("o_orderpriority").alias("pri"),
    )
    # r12: snapshot B's two branches are DISJOINT and TOTAL over A
    # (k%7=0 re-keyed, k%7<>0 possibly repriced), so the union-of-
    # filtered-scans is one projection with two `when`s — the B subtree
    # scans orders once, not twice (the dedup_canonical single-scan
    # rewrite class; plan 6 -> 4 scan nodes).
    b = a.select(
        F.when(F.col("k") % 7 == 0, F.col("k") + 10000000)
        .otherwise(F.col("k"))
        .alias("k"),
        "st",
        F.when(
            (F.col("k") % 7 != 0) & (F.col("k") % 5 == 0),
            F.col("cents") + 100,
        )
        .otherwise(F.col("cents"))
        .alias("cents"),
        "pri",
    )

    def fp(df: DataFrame) -> DataFrame:
        return df.select(
            "k",
            _row_fp().alias("fp"),
        )

    fa, fb = fp(a), fp(b)
    d = fa.alias("a").join(fb.alias("b"), F.col("a.k") == F.col("b.k"), "full")
    classified = d.select(
        F.coalesce(F.col("a.k"), F.col("b.k")).alias("k"),
        F.when(F.col("b.k").isNull(), F.lit("deleted"))
        .when(F.col("a.k").isNull(), F.lit("inserted"))
        .when(F.col("a.fp") != F.col("b.fp"), F.lit("updated"))
        .otherwise(F.lit("unchanged"))
        .alias("change_type"),
    )
    return classified.groupBy("change_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("k").alias("min_key"),
        F.max("k").alias("max_key"),
    )


_DIFF_BUCKETS = 4096
#: 2^32, NOT 2^40: the digest is a SUM over the bucket, so int64
#: overflows at ~rows_per_bucket * mod. 2^32 keeps the sum exact to
#: ~2^31 rows PER BUCKET (any sane bucketing is orders of magnitude
#: below); 2^40 overflowed at ~2^23 rows/bucket -- under ANSI the
#: aggregation THROWS there, and a wrap could alias a changed bucket
#: to a false-clean digest (r11 setops review). Per-bucket collision
#: odds rise to ~2^-32, still negligible and documented.
_DIGEST_MOD = 4294967296


def checksum_dirty_buckets(fa: DataFrame, fb: DataFrame) -> DataFrame:
    """(bucket) — buckets whose order-independent digests disagree.

    ``fa``/``fb`` are (k, bucket, fp, ...) fingerprint relations. Each
    side reduces to one digest row per bucket (SUM of a 32-bit keyed
    hash of (k, fp) — commutative, partial-aggregated map-side); a
    full outer join keeps buckets missing on either side dirty.
    COMPLETENESS property (tests/test_properties.py): any bucket whose
    (k, fp) multiset differs lands in the output unless the two 32-bit
    digest sums collide (~2^-32 per bucket).
    """

    def digest(df: DataFrame) -> DataFrame:
        keyed = F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.col("k").cast("string"), F.col("fp"))),
                1,
                15,
            ),
            16,
            10,
        ).cast("long") % _DIGEST_MOD  # sum-safe: see _DIGEST_MOD note
        return df.groupBy("bucket").agg(F.sum(keyed).alias("dg"))

    da, db = digest(fa), digest(fb)
    return (
        da.alias("da")
        .join(db.alias("db"), F.col("da.bucket") == F.col("db.bucket"), "full")
        .filter(~F.col("da.dg").eqNullSafe(F.col("db.dg")))
        .select(F.coalesce(F.col("da.bucket"), F.col("db.bucket")).alias("bucket"))
    )


@register(
    "table_diff_incremental",
    oracle=f"""
    WITH a AS (SELECT o_orderkey AS k,
                      CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
                      o_orderstatus AS st, o_orderpriority AS pri
               FROM orders),
    b AS (SELECT k, cents + CASE WHEN k % 997 = 0 THEN 100 ELSE 0 END
                 AS cents, st, pri
          FROM a),
    fa AS (SELECT k, k % {_DIFF_BUCKETS} AS bucket,
                  md5(st || '|' || CAST(cents AS VARCHAR) || '|' || pri)
                      AS fp, cents
           FROM a),
    fb AS (SELECT k, k % {_DIFF_BUCKETS} AS bucket,
                  md5(st || '|' || CAST(cents AS VARCHAR) || '|' || pri)
                      AS fp, cents
           FROM b),
    da AS (SELECT bucket,
                  sum(('0x' || substr(md5(CAST(k AS VARCHAR) || ':' || fp),
                                      1, 15))::BIGINT % {_DIGEST_MOD}) AS dg
           FROM fa GROUP BY bucket),
    db AS (SELECT bucket,
                  sum(('0x' || substr(md5(CAST(k AS VARCHAR) || ':' || fp),
                                      1, 15))::BIGINT % {_DIGEST_MOD}) AS dg
           FROM fb GROUP BY bucket),
    dirty AS (SELECT COALESCE(da.bucket, db.bucket) AS bucket
              FROM da FULL OUTER JOIN db ON da.bucket = db.bucket
              WHERE da.dg IS DISTINCT FROM db.dg)
    SELECT fa.k, fa.cents AS cents_a, fb.cents AS cents_b
    FROM fa JOIN fb ON fa.k = fb.k
    WHERE fa.bucket IN (SELECT bucket FROM dirty)
      AND fa.fp <> fb.fp
    """,
    survey="B19/E88 extension (incremental snapshot diff: per-bucket "
    "checksum pre-pass prunes identical key ranges BEFORE the row-level "
    "compare — the 0.1%-delta refinement table_diff's scale note "
    "documents, materialized as a real plan)",
    scale="""
    The day-over-day reconciliation path: snapshots that differ in a
    handful of rows should not pay a full row-level join. Phase 1
    reduces each side to ONE digest row per key bucket (sum over rows of
    a 32-bit keyed hash — order-independent, partial-aggregated
    map-side, commutative like any sum, and 2^32 x rows-per-bucket stays
    far inside int64), so comparing two 100 TB snapshots first costs two
    |buckets|-row relations. Phase 2 re-scans ONLY the dirty buckets
    (the IN-subquery compiles to a semi-join against the tiny dirty
    list, and with snapshots PARTITIONED by the same bucket expression
    it becomes partition pruning — scan skips clean files entirely) and
    classifies rows there. Here the synthetic delta touches k%997 == 0
    (~0.1% of keys), leaving >96% of the 4096 buckets provably clean
    after phase 1 — the row-level join runs over a few dozen buckets,
    not the table. Digest collisions (two different row sets with one
    colliding 32-bit sum) would SKIP a dirty bucket; production hardens
    with a second independent hash column — the false-clean probability
    per bucket is ~2^-40 per digest.
    """,
)
def table_diff_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changed rows between near-identical snapshots, checksum-pruned."""
    a = table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        F.col("o_orderstatus").alias("st"),
        F.col("o_orderpriority").alias("pri"),
    )
    b = a.select(
        "k",
        (
            F.col("cents")
            + F.when(F.col("k") % 997 == 0, F.lit(100)).otherwise(F.lit(0))
        ).alias("cents"),
        "st",
        "pri",
    )

    def finger(df: DataFrame) -> DataFrame:
        return df.select(
            "k",
            (F.col("k") % _DIFF_BUCKETS).alias("bucket"),
            _row_fp().alias("fp"),
            "cents",
        )

    fa, fb = finger(a), finger(b)
    # The <=4096-row dirty list is checkpointed (it feeds two broadcast
    # semi-joins; uncheckpointed each replays both corpus digest
    # aggregations) and BOTH snapshot sides are pruned by it before the
    # row-level join — result-identical, since the row join is on k and
    # bucket = k % 4096 on both sides, so a b row outside the dirty
    # buckets can never match a pruned a row. Re-decided at the
    # sf1-synth tier (r13, verdict task #7): the b-prune won 4/4
    # interleaved rounds there (medians 6.36 -> 2.46 s — the phase-2
    # join's shuffle shrinks from |snapshot| to |dirty rows|, a win that
    # grows with the data) against a ~+20-30% fixed-overhead cost at
    # sf0.1 (r12's measurement, re-confirmed) — the 100 TB call, where
    # bucket-partitioned snapshots turn this prune into free partition
    # pruning (the scale note above).
    dirty = checksum_dirty_buckets(fa, fb).localCheckpoint(eager=True)
    fb = fb.join(F.broadcast(dirty), "bucket", "left_semi")
    pruned_a = fa.join(F.broadcast(dirty), "bucket", "left_semi")
    return (
        pruned_a.alias("a")
        .join(fb.alias("b"), F.col("a.k") == F.col("b.k"))
        .filter(F.col("a.fp") != F.col("b.fp"))
        .select(
            F.col("a.k").alias("k"),
            F.col("a.cents").alias("cents_a"),
            F.col("b.cents").alias("cents_b"),
        )
    )
