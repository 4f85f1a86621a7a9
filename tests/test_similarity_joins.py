"""Pin the exact-recall claims of the prefix-filtered similarity joins.

dedup_jaccard_exact and dedup_containment promise EXACT recall: the
AllPairs prefix filter (and the one-sided containment variant) may only
prune pairs that provably cannot reach the threshold. The fixture-level
oracle already compares against brute force; these tests stress the
corners the fixtures may not cover:

1. near-threshold sizes where ceil() off-by-ones would lose pairs
   (integer prefix arithmetic: n - (4n+4) div 5 + 1);
2. qualifying pairs whose ONLY shared shingles are globally common
   (df-descending tail) -- the prefix must still collide;
3. containment pairs with a much larger container (the case symmetric
   Jaccard misses by construction).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from mrs_mapreduce_spark.llm.dedup import (
    dedup_containment,
    dedup_jaccard_exact,
)

_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.IntegerType()),
    ]
)


def _write_docs(spark, tmp_path, texts):
    rows = [(i, t, "en", "synthetic", len(t)) for i, t in enumerate(texts)]
    spark.createDataFrame(rows, _SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{tmp_path}/documents.parquet")
    return str(tmp_path)


def _brute_jaccard(spark, sf_dir, t_num, t_den):
    """Brute-force 4-shingle Jaccard pairs >= t_num/t_den (no prefix)."""
    from mrs_mapreduce_spark.catalog import table
    from mrs_mapreduce_spark.llm.dedup import shingles

    sh = (
        shingles(table(spark, sf_dir, "documents"), k=4)
        .select("doc_id", F.md5("sh").alias("h"))
        .distinct()
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    inter = (
        sh.alias("a")
        .join(
            sh.alias("b"),
            (F.col("a.h") == F.col("b.h"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .agg(F.count(F.lit(1)).alias("i"))
    )
    j = (
        inter.join(
            sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na")),
            "doc_a",
        )
        .join(
            sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb")),
            "doc_b",
        )
        .filter(
            t_den * F.col("i") >= t_num * (F.col("na") + F.col("nb") - F.col("i"))
        )
    )
    return {(r.doc_a, r.doc_b) for r in j.collect()}


@pytest.fixture(scope="module")
def corpus_dir(spark, tmp_path_factory):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    # near-threshold pair: drop exactly one word -> jaccard 6/8 < 0.8,
    # change nothing -> 1.0; append one word -> 7/8 >= 0.8
    texts = [
        base,                                   # 0
        base + " lambda",                       # 1: jac(0,1) = 7/8
        base.replace("kappa", "omega"),         # 2: jac(0,2) = 6/8 -> out
        base,                                   # 3: exact copy of 0
        # common-shingle-only overlap: two docs built from the SAME
        # high-df boilerplate phrase repeated, so every shared shingle
        # is common (high df) -- prefix must still catch the pair
        "lorem ipsum dolor sit amet " * 4,      # 4
        "lorem ipsum dolor sit amet " * 4,      # 5: exact copy of 4
        # containment: doc 6 is a strict prefix of the larger doc 7
        "red green blue cyan magenta yellow",   # 6
        "red green blue cyan magenta yellow "   # 7: contains 6
        "one two three four five six seven eight nine ten",
        "solitary unrelated words entirely disjoint from everything",  # 8
        # 3-copy family: within-family expansion must emit C(3,2)=3
        # unordered jaccard pairs / 6 ordered containment pairs
        "north south east west upward downward",   # 9
        "north south east west upward downward",   # 10
        "north south east west upward downward",   # 11
        # shingle-less family (< 4 words): exact copies, but NO shingles
        # -> must appear in NEITHER query despite csize >= 2
        "tiny doc",                                # 12
        "tiny doc",                                # 13
    ]
    path = _write_docs(spark, tmp_path_factory.mktemp("simjoin"), texts)
    return path


def test_jaccard_exact_equals_brute_force(spark, corpus_dir):
    got = {
        (r.doc_a, r.doc_b)
        for r in dedup_jaccard_exact(spark, corpus_dir).collect()
    }
    want = _brute_jaccard(spark, corpus_dir, 4, 5)
    assert got == want
    assert (0, 1) in got        # near-threshold 7/8 kept
    assert (0, 2) not in got    # 6/8 correctly excluded
    assert (0, 3) in got        # exact copy
    assert (4, 5) in got        # common-shingles-only pair survives prefix
    # 3-copy family: all three unordered pairs, via within-family
    # expansion of the collapsed pipeline
    assert {(9, 10), (9, 11), (10, 11)} <= got
    # shingle-less copies never appear (no shingles -> not in the
    # brute graph either; the collapse must not resurrect them)
    assert not any(12 in p or 13 in p for p in got)


def test_jaccard_exact_values(spark, corpus_dir):
    rows = {
        (r.doc_a, r.doc_b): (r.inter_n, float(r.jaccard))
        for r in dedup_jaccard_exact(spark, corpus_dir).collect()
    }
    # base has 7 distinct shingles; base+" lambda" has 8; all 7 shared
    assert rows[(0, 1)] == (7, round(7 / 8, 4))
    assert rows[(0, 3)][1] == 1.0


def test_containment_catches_what_jaccard_misses(spark, corpus_dir):
    cont = {
        (r.doc_a, r.doc_b): float(r.containment)
        for r in dedup_containment(spark, corpus_dir).collect()
    }
    # doc 6 (3 shingles) wholly inside doc 7 (13 shingles): containment
    # 1.0 but jaccard 3/13 -- invisible to the symmetric query
    assert cont[(6, 7)] == 1.0
    jac = {
        (r.doc_a, r.doc_b)
        for r in dedup_jaccard_exact(spark, corpus_dir).collect()
    }
    assert (6, 7) not in jac
    # asymmetry: the container is NOT contained in the part
    assert (7, 6) not in cont
    # exact copies contain each other -- both ordered pairs present
    assert cont[(0, 3)] == 1.0 and cont[(3, 0)] == 1.0
    # 3-copy family: all 6 ordered pairs at containment 1.0
    fam3 = {(a, b) for a in (9, 10, 11) for b in (9, 10, 11) if a != b}
    assert all(cont[p] == 1.0 for p in fam3)
    # shingle-less copies excluded despite being exact duplicates
    assert not any(12 in p or 13 in p for p in cont)


def test_containment_threshold_is_asymmetric(spark, corpus_dir):
    """jac(0,1)=7/8 but containment(0 in 1) = 7/7 = 1.0 while
    containment(1 in 0) = 7/8 < 0.9 -> only one direction emitted."""
    cont = {
        (r.doc_a, r.doc_b)
        for r in dedup_containment(spark, corpus_dir).collect()
    }
    assert (0, 1) in cont
    assert (1, 0) not in cont


def test_minhash_pairs_collapse_equals_uncollapsed(spark, corpus_dir):
    """The collapsed dedup_minhash_pairs must equal the direct
    (uncollapsed) LSH pipeline row-for-row on a corpus with exact-copy
    families, including the shingle-less (<3-word) family staying out."""
    from mrs_mapreduce_spark.llm.dedup import (
        _minhash_pairs,
        dedup_minhash_pairs,
    )

    got = {
        (r.doc_a, r.doc_b, float(r.jaccard))
        for r in dedup_minhash_pairs(spark, corpus_dir).collect()
    }
    want = {
        (r.doc_a, r.doc_b, float(r.jaccard))
        for r in _minhash_pairs(spark, corpus_dir, cap=None).collect()
    }
    assert got == want
    assert any(p[:2] == (9, 10) for p in got)      # 3-copy family present
    assert not any(12 in p[:2] or 13 in p[:2] for p in got)


def test_simblocked_collapse_equals_uncollapsed(spark, corpus_dir):
    """Collapsed simhash-blocked Jaccard == the direct pipeline,
    including the 2-word family (word sets are never empty, so copy
    pairs of ANY length qualify at 1.0 — unlike the shingle queries)."""
    from mrs_mapreduce_spark.llm.dedup import (
        _simblocked_pairs,
        dedup_ngram_jaccard_simblocked,
    )

    got = {
        (r.doc_a, r.doc_b, float(r.jaccard))
        for r in dedup_ngram_jaccard_simblocked(spark, corpus_dir).collect()
    }
    want = {
        (r.doc_a, r.doc_b, float(r.jaccard))
        for r in _simblocked_pairs(spark, corpus_dir).collect()
    }
    assert got == want
    assert (12, 13, 1.0) in got    # word-set pipeline keeps tiny copies


def test_ngram_jaccard_collapse_respects_metadata_blocks(
    spark, tmp_path_factory
):
    """The metadata-blocked query collapses on (text, lang, source), not
    text alone: identical texts with different metadata must stay in
    separate families (they never pair — different blocks), while
    full-key-identical copies pair at 1.0. Pinned against the direct
    (uncollapsed) pipeline."""
    from mrs_mapreduce_spark.llm.dedup import (
        _ngram_jaccard_pairs,
        dedup_ngram_jaccard,
    )

    text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (0, text, "en", "srcA", len(text)),
        (1, text, "en", "srcA", len(text)),   # same text+meta as 0
        (2, text, "en", "srcB", len(text)),   # same text, OTHER source
        (3, text + " lambda", "en", "srcA", len(text) + 7),  # near-dup
        (4, "totally different words here now", "en", "srcA", 33),
    ]
    path = str(tmp_path_factory.mktemp("metafam"))
    spark.createDataFrame(rows, _SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{path}/documents.parquet")

    got = {
        (r.doc_a, r.doc_b, float(r.jaccard))
        for r in dedup_ngram_jaccard(spark, path).collect()
    }
    want = {
        (r.doc_a, r.doc_b, float(r.jaccard))
        for r in _ngram_jaccard_pairs(spark, path).collect()
    }
    assert got == want
    assert (0, 1, 1.0) in got          # full-key-identical copies pair
    assert not any(
        {p[0], p[1]} == {0, 2} or {p[0], p[1]} == {1, 2} for p in got
    )                                   # cross-source identical: blocked


def test_null_text_and_metadata_form_singleton_families(
    spark, tmp_path_factory
):
    """NULL discipline (r6 review finding): the direct pipelines can
    never pair NULL-text docs (split(NULL) -> no token rows) nor, in
    metadata-blocked queries, NULL-metadata docs (null-unsafe block
    join) — so the collapse must NOT family them together, or the
    within-family expansion would fabricate 1.0 pairs the oracle never
    emits. Each such doc gets a singleton family."""
    from mrs_mapreduce_spark.llm.dedup import (
        _minhash_pairs,
        _ngram_jaccard_pairs,
        _simblocked_pairs,
        dedup_minhash_pairs,
        dedup_ngram_jaccard,
        dedup_ngram_jaccard_simblocked,
    )

    text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (0, None, "en", "srcA", 0),     # NULL text, twice
        (1, None, "en", "srcA", 0),
        (2, text, None, "srcA", len(text)),   # NULL lang, twice
        (3, text, None, "srcA", len(text)),
        (4, text, "en", "srcA", len(text)),   # normal copies
        (5, text, "en", "srcA", len(text)),
    ]
    path = str(tmp_path_factory.mktemp("nullfam"))
    spark.createDataFrame(rows, _SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{path}/documents.parquet")

    for collapsed, direct in [
        (dedup_minhash_pairs, lambda s, p: _minhash_pairs(s, p, cap=None)),
        (dedup_ngram_jaccard, _ngram_jaccard_pairs),
        (dedup_ngram_jaccard_simblocked, _simblocked_pairs),
    ]:
        got = {
            (r.doc_a, r.doc_b) for r in collapsed(spark, path).collect()
        }
        want = {
            (r.doc_a, r.doc_b) for r in direct(spark, path).collect()
        }
        assert got == want, collapsed.__name__
        # NULL-text copies never pair anywhere
        assert not any(0 in p or 1 in p for p in got), collapsed.__name__
        assert (4, 5) in got, collapsed.__name__
    # NULL-lang copies: pairable by the content-keyed pipelines, but the
    # metadata-blocked query must NOT pair them (null-unsafe block join)
    meta_got = {
        (r.doc_a, r.doc_b)
        for r in dedup_ngram_jaccard(spark, path).collect()
    }
    assert (2, 3) not in meta_got
    content_got = {
        (r.doc_a, r.doc_b)
        for r in dedup_ngram_jaccard_simblocked(spark, path).collect()
    }
    assert (2, 3) in content_got


def test_fuzzy_names_misses_nothing_and_dist_is_exact(spark, sf_dir):
    from mrs_mapreduce_spark.catalog import table
    from mrs_mapreduce_spark.operators.joins import join_fuzzy_names

    got = {
        (r.name_a, r.name_b): r.dist
        for r in join_fuzzy_names(spark, sf_dir).collect()
    }
    # brute-force over the (tiny) dictionary, unbanded
    names = [
        r.p_name
        for r in table(spark, sf_dir, "part").select("p_name").distinct().collect()
    ]

    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    want = {
        (a, b): lev(a, b)
        for a in names
        for b in names
        if a < b and lev(a, b) <= 2
    }
    assert got == want and len(got) > 0


def test_corpus_minhash_probe_collapse_equals_uncollapsed(
    spark, tmp_path_factory
):
    """The collapsed dedup_against_corpus_minhash must equal the direct
    (uncollapsed) batch-vs-corpus probe row-for-row, on a corpus with
    copies WITHIN each side and ACROSS the doc_id-250 split — the
    cross-side-copy case is where a single-family collapse would break
    (same family, no rep pair) and the two-sided collapse must not."""
    from mrs_mapreduce_spark.catalog import table
    from mrs_mapreduce_spark.llm.dedup import (
        _minhash_probe,
        dedup_against_corpus_minhash,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        # corpus side (doc_id < 250)
        (100, base, "en", "srcA", len(base)),
        (101, base, "en", "srcA", len(base)),            # corpus copy
        (102, base + " lambda", "en", "srcA", 0),        # jac 7/8
        (103, "solitary unrelated words entirely disjoint", "en", "srcA", 0),
        (104, "tiny doc", "en", "srcA", 8),              # shingle-less
        # batch side (doc_id >= 250)
        (300, base, "en", "srcB", len(base)),            # cross-side copy
        (301, base, "en", "srcB", len(base)),            # batch family
        (302, base.replace("kappa", "omega"), "en", "srcB", 0),  # jac 6/8
        (303, "tiny doc", "en", "srcB", 8),              # shingle-less copy
    ]
    path = str(tmp_path_factory.mktemp("probefam"))
    spark.createDataFrame(rows, _SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{path}/documents.parquet")

    got = {
        (r.batch_id, r.corpus_id, float(r.jaccard))
        for r in dedup_against_corpus_minhash(spark, path).collect()
    }
    d = table(spark, path, "documents")
    want = {
        (r.doc_a, r.doc_b, float(r.jaccard))
        for r in _minhash_probe(
            d.filter(F.col("doc_id") >= 250),
            d.filter(F.col("doc_id") < 250),
        ).collect()
    }
    assert got == want
    # cross-side copies pair at 1.0 against BOTH corpus copies
    assert (300, 100, 1.0) in got and (300, 101, 1.0) in got
    assert (301, 100, 1.0) in got and (301, 101, 1.0) in got
    # orientation: output is (batch, corpus) only — never batch-batch
    pairs = {(a, b) for a, b, _ in got}
    assert all(a >= 250 and b < 250 for a, b in pairs)
    assert (300, 301) not in pairs and (301, 300) not in pairs
    # shingle-less exact copies stay out despite crossing the split
    assert not any(303 in p or 104 in p for p in pairs)


def test_minhash_eval_collapse_equals_uncollapsed(spark, corpus_dir):
    """The collapsed dedup_minhash_eval must equal the direct pipeline
    row-for-row: candidacy, signature agreement AND exact Jaccard are
    all content-level, so copies inherit (est, true) verbatim and
    within-family pairs are (1.0, 1.0) — except shingle-less copies,
    which have no signature and never become candidates."""
    from mrs_mapreduce_spark.catalog import table
    from mrs_mapreduce_spark.llm.dedup import (
        _minhash_eval_pairs,
        dedup_minhash_eval,
    )

    got = {
        (r.doc_a, r.doc_b, float(r.est_jaccard), float(r.true_jaccard))
        for r in dedup_minhash_eval(spark, corpus_dir).collect()
    }
    want = {
        (r.doc_a, r.doc_b, float(r.est_jaccard), float(r.true_jaccard))
        for r in _minhash_eval_pairs(
            table(spark, corpus_dir, "documents")
        ).collect()
    }
    assert got == want
    assert (9, 10, 1.0, 1.0) in got              # within-family pair
    assert (0, 3, 1.0, 1.0) in got               # 2-copy family
    assert not any(12 in p[:2] or 13 in p[:2] for p in got)
    # a true near-dup (not exact-copy) candidate keeps its real values
    near = [p for p in got if p[:2] == (0, 1)]
    assert near and near[0][3] == 0.8889         # jac(0,1) = 8/9 3-shingles


def test_against_corpus_null_text_docs_all_survive(
    spark, tmp_path_factory
):
    """r10 dedup review: dedup_against_corpus must treat each NULL-text
    batch doc as a singleton survivor (the _content_families rule). The
    pre-fix builder groupBy'd the NULL hash into ONE survivor while the
    SQL oracle (null-unsafe equality) kept them all — this pins the
    agreed semantics on a NULL-bearing fixture the driver tier lacks."""
    import duckdb

    from mrs_mapreduce_spark.registry import load_all

    text = "alpha beta gamma delta epsilon"
    rows = [
        (0, text, "en", "srcA", len(text)),        # history
        (1, None, "en", "srcA", 0),                # history NULL
        (250, text, "en", "srcA", len(text)),      # dup of history: drop
        (251, None, "en", "srcA", 0),              # NULL batch: survives
        (252, None, "en", "srcA", 0),              # NULL batch: survives
        (253, "zeta eta", "en", "srcA", 8),        # new: survives
        (254, "zeta eta", "en", "srcA", 8),        # within-batch dup: drop
    ]
    path = str(tmp_path_factory.mktemp("nullcorp"))
    spark.createDataFrame(rows, _SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{path}/documents.parquet")

    q = load_all()["dedup_against_corpus"]
    got = sorted(r["doc_id"] for r in q.builder(spark, path).collect())
    assert got == [251, 252, 253]

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{path}/documents.parquet/*.parquet')"
    )
    oracle = sorted(r[0] for r in con.execute(q.oracle).fetchall())
    assert oracle == got
