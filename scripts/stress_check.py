"""Stress-fixture parity sweep: the whole registry on adversarial inputs.

The r9-r11 package reviews kept finding the same latent classes by hand:
NULL text, irregular whitespace, same-timestamp ties, NULL JSON props,
near-zero floats, .005 money-rounding boundaries, byte-vs-char string
metrics on multibyte names. This script makes that hunt mechanical: it
derives a STRESS fixture from sf0.001 (same schemas, adversarial rows),
then runs every registered query's builder against its DuckDB oracle on
it — any divergence is a latent cross-engine bug the shipped fixtures
cannot see.

Deliberately NOT injected (documented engine-level domain errors, not
parity bugs): exact zero embedding vectors (ANSI DIVIDE_BY_ZERO on both
engines by design — see _semdedup_victims), negative event values
(fixtures declare a positive domain).

Usage:
    python scripts/stress_check.py            # build + run all queries
    python scripts/stress_check.py name ...   # restrict to named queries
    SPARK_GRAFT_STRESS_DIR=... to override the output dir.
"""

from __future__ import annotations

import os
import shutil
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SRC = "/root/testdata/sf0.001"
OUT = os.environ.get("SPARK_GRAFT_STRESS_DIR", "/tmp/stress_sf")


def build(spark) -> None:
    from pyspark.sql import functions as F

    shutil.rmtree(OUT, ignore_errors=True)
    os.makedirs(OUT, exist_ok=True)
    # unchanged tables: straight copies
    for t in ("region", "nation", "customer", "supplier",
              "orders"):
        src = f"{SRC}/{t}.parquet"
        dst = f"{OUT}/{t}.parquet"
        if os.path.isdir(src):  # fixture generations vary: file vs dir
            shutil.copytree(src, dst)
        else:
            shutil.copy2(src, dst)

    # lineitem: inject .005-rounding-boundary revenue rows (exact
    # 4-decimal rationals ending in ...50 at the 10^-4 place) onto
    # EXISTING orderkeys, so both pure-lineitem aggregates and the join
    # chains exercise the boundary. The integer-cents discipline makes
    # both engines round these identically; a double-sum regression
    # re-diverges here first (r11 tpch review class, pinned).
    li = spark.read.parquet(f"{SRC}/lineitem.parquet")
    keys = [r["l_orderkey"] for r in li.select("l_orderkey")
            .distinct().orderBy("l_orderkey").limit(2).collect()]
    lrow = li.limit(1).collect()[0]
    lmax = li.agg(F.max("l_linenumber")).collect()[0][0]
    boundary = [
        # net = 0.05 * 0.10 = 0.005 exactly (1-row boundary group)
        (keys[0], lrow["l_partkey"], lrow["l_suppkey"], lmax + 10,
         1.0, 0.05, 0.90, 0.0, "B", "X", lrow["l_shipdate"]),
        # net = 100.05 * 0.90 = 90.045 exactly
        (keys[1], lrow["l_partkey"], lrow["l_suppkey"], lmax + 11,
         2.0, 100.05, 0.10, 0.0, "B", "X", lrow["l_shipdate"]),
    ]
    bdf = spark.createDataFrame(
        boundary,
        "l_orderkey long, l_partkey long, l_suppkey long, "
        "l_linenumber int, l_quantity double, l_extendedprice double, "
        "l_discount double, l_tax double, l_returnflag string, "
        "l_linestatus string, l_shipdate timestamp_ntz",
    )
    li.unionByName(bdf).coalesce(1).write.mode("overwrite").parquet(
        f"{OUT}/lineitem.parquet"
    )

    # part: unicode near-dup names (the byte-vs-char levenshtein seam —
    # Spark counts char edits, DuckDB counts byte edits; the declared
    # join_fuzzy_names distance is byte-based so these must agree),
    # an empty-string name with a 1-edit twin, and a duplicated name
    # (cnt > 1 through the dictionary aggregate)
    p = spark.read.parquet(f"{SRC}/part.parquet")
    pmax = p.agg(F.max("p_partkey")).collect()[0][0]
    prow = p.limit(1).collect()[0]
    pext = [
        ("widgét box", ), ("widget box", ), ("café mug", ),
        ("cafe mug", ), ("naïve kit", ), ("naive kit", ),
        ("", ), ("a", ), ("dup name part", ), ("dup name part", ),
    ]
    pdf = spark.createDataFrame(
        [
            (pmax + 1 + i, name, prow["p_brand"], prow["p_type"],
             int(prow["p_size"]), float(prow["p_retailprice"]))
            for i, (name,) in enumerate(pext)
        ],
        "p_partkey long, p_name string, p_brand string, p_type string, "
        "p_size int, p_retailprice double",
    )
    p.unionByName(pdf).coalesce(1).write.mode("overwrite").parquet(
        f"{OUT}/part.parquet"
    )

    # documents: NULL text, empty text, doubled/leading/trailing spaces,
    # tab + newline whitespace, a unicode doc — appended with fresh ids
    d = spark.read.parquet(f"{SRC}/documents.parquet")
    base = d.limit(1).collect()[0]
    mx = d.agg(F.max("doc_id")).collect()[0][0]
    extra = [
        (mx + 1, None, base["lang"], base["source"], 0),
        (mx + 2, "", base["lang"], base["source"], 0),
        (mx + 3, "double  space  tokens", "en", base["source"], 22),
        (mx + 4, " leading and trailing ", "en", base["source"], 22),
        (mx + 5, "tab\tand\nnewline mix", "en", base["source"], 19),
        (mx + 6, "ünïcodé tøkens naïve café", "en", base["source"], 25),
        (mx + 7, "dup dup dup dup", "en", base["source"], 15),
        (mx + 8, "dup dup dup dup", "en", base["source"], 15),
        # body text IS a boilerplate line (corpus_boilerplate_strip's
        # injected header/footer): the doc strips to kept_text='' —
        # the empty-reassembly seam both engines must agree on
        (mx + 9, "subscribe to our newsletter today", "en",
         base["source"], 33),
        (mx + 10, "all rights reserved copyright notice", "en",
         base["source"], 36),
        # the case-fold divergence set (Java/Spark vs utf8proc/DuckDB:
        # lower('İ') = 'i̇' vs 'i', upper('ß') = 'SS' vs 'ẞ'): any
        # hash key built with engine-native lower/upper silently
        # splits on this doc — the fold_lower/fold_upper discipline
        # (exprs.py) must keep every dedup family green here
        (mx + 11, "İstanbul Straße ẞ MIXED case", "tr",
         base["source"], 28),
        # supplementary-plane chars (4-byte UTF-8, surrogate pairs in
        # the JVM): exercises Arrow/pandas transfer, md5, ordering —
        # Spark's UTF8String orders by UTF-8 bytes exactly like
        # DuckDB (probed r11), so this doc must never split a sort
        (mx + 12, "emoji 😀 text 🎉 with astral 𝄞 chars", "en",
         base["source"], 30),
        # non-ASCII whitespace (NBSP, U+2028 line sep, U+0085 NEL):
        # Python str.split() would tokenize these as separators but the
        # wordcount oracles' regex class [ \t\n\r\f\v]+ does NOT — the
        # ascii_words() discipline (mapreduce.py) must keep the
        # wordcount/mr family green on this doc (r12 advice)
        (mx + 13,
         "nbsp\u00a0glued sep\u2028joined nel\u0085word",
         "en", base["source"], 30),
    ]
    cols = ["doc_id", "text", "lang", "source", "n_chars"]
    sdf = spark.createDataFrame(
        extra, "doc_id long, text string, lang string, source string, "
        "n_chars int"
    )
    d.select(*cols).unionByName(sdf).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{OUT}/documents.parquet")

    # events: same-microsecond ties (new rows duplicating an existing
    # row's ts under fresh event_ids) + NULL props
    e = spark.read.parquet(f"{SRC}/events.parquet")
    emax = e.agg(F.max("event_id")).collect()[0][0]
    tie_src = e.orderBy("event_id").limit(4).collect()
    ties = [
        (emax + 1 + i, r["ts"], r["user_id"],
         "signup" if i % 2 == 0 else "purchase", float(r["value"]), None)
        for i, r in enumerate(tie_src)
    ]
    # negative JSON k: pins integer-division direction in fn_variant —
    # DuckDB `//` TRUNCATES toward zero (-17 // 10 = -1, probed r12)
    # and Spark `div` matches; a floor() regression diverges here
    ties.append(
        (emax + 10, tie_src[0]["ts"], tie_src[0]["user_id"],
         "signup", float(tie_src[0]["value"]), '{"k": -17}')
    )
    tdf = spark.createDataFrame(
        ties, "event_id long, ts timestamp_ntz, user_id long, "
        "event_type string, value double, props string"
    )
    e.unionByName(tdf).coalesce(1).write.mode("overwrite").parquet(
        f"{OUT}/events.parquet"
    )

    # embeddings: near-zero (but nonzero) vectors with fresh ids — the
    # -0.0 / rounding-boundary hunting ground
    v = spark.read.parquet(f"{SRC}/embeddings.parquet")
    vmax = v.agg(F.max("vec_id")).collect()[0][0]
    vrow = v.limit(1).collect()[0]
    tiny = [float((-1) ** i) * 3e-7 for i in range(64)]
    near = [(vmax + 1, [float(x) for x in tiny], vrow["label"]),
            (vmax + 2, [float(-x) for x in tiny], vrow["label"])]
    vdf = spark.createDataFrame(
        near, "vec_id long, embedding array<float>, label string"
    )
    (v.select("vec_id", "embedding", "label").unionByName(vdf)
     .coalesce(1).write.mode("overwrite")
     .parquet(f"{OUT}/embeddings.parquet"))


def main() -> int:
    from mrs_mapreduce_spark.oracle import check_queries
    from mrs_mapreduce_spark.session import get_session

    spark = get_session("stress-check")
    build(spark)
    names = sys.argv[1:] or None
    results = check_queries(spark, OUT, names)
    fails = [r.name for r in results if not r.ok]
    for r in results:
        if not r.ok:
            print(f"[DIVERGE] {r}")
    print(f"\n{len(results) - len(fails)}/{len(results)} OK @ {OUT}; "
          f"diverging={fails}")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
