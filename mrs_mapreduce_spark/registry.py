"""Declared-query registry — the engine's operator inventory as code.

Every operator in SURVEY.md §2 that is marked "declare" registers here a
``(builder, oracle_sql)`` pair. The builder is the Spark-first
implementation; the oracle is the ANSI-SQL equivalent DuckDB runs on the
same parquet fixtures. The test driver (and ``tests/test_oracle_parity.py``
locally) executes both and compares row count + schema + order-insensitive
value hash — so registration is a falsifiable claim, not documentation.

Capability parity: ``mrs/registry.py::Registry`` (SURVEY.md §2 A18) — the
reference resolves user map/reduce callables by *name* so every node runs
the same code; this registry resolves query builders by name so the driver,
tests and bench all run the same plans.
"""

from __future__ import annotations

import textwrap
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    """One declared, oracle-checked query."""

    name: str
    builder: Builder
    #: DuckDB-runnable ANSI SQL over the fixture views, or None for
    #: genuinely non-SQL-expressible ops (driver then does rows-only check).
    oracle: str | None
    #: SURVEY.md §2 row id(s), e.g. "B9" — what this query demonstrates.
    survey: str
    #: How this plan behaves at 100 TB — partitioning/shuffle/broadcast notes.
    scale: str


REGISTRY: dict[str, Query] = {}

#: Presentation order for the declared inventory. The external driver
#: evaluates queries in ``queries()`` iteration order and its correctness
#: report covers a prefix of that order (exactly the first 50), so the
#: prefix ROTATES each round until every declared query has earned a
#: driver-green CORRECTNESS row: rounds 1-2 verified 73 distinct queries
#: (see CORRECTNESS_r0{1,2}.json); the round-3 prefix below is 50 queries
#: the driver has NEVER checked, every one with an EXACT SQL oracle.
#: Queries not listed here keep their registration order after the
#: showcase.
#:
#: ROUND-5 PREFIX (the r4 rotation is recorded in CORRECTNESS_r04.json:
#: 50/50 green — the first zero-red round; cumulative driver-green
#: after r4: 171/223 distinct queries): this round's 50 = ALL the
#: never-driver-tested queries except exactly 2 deliberate deferrals,
#: chosen per the r4 verdict for minimal evidence value because a
#: structurally-identical twin is already driver-green —
#: ``mr_map_only`` (subset of r1-green map_project through the same
#: parity layer) and ``map_explode_pos`` (r2-green map_explode plus an
#: ordinal). A clean round makes the cumulative record 221/223; rotate
#: the 2 deferrals FIRST in round 6 before anything else.
#: Three of this round's 50 were redesigned this round and re-verified
#: locally before declaration: dedup_ngram_jaccard (re-blocked on
#: (lang, source, simhash/256) + 1-bit multiprobe), dedup_semdedup /
#: dedup_minhash_capped (estimator/oracle hardening touched their
#: shared helpers).
#: Run scripts/fixture_check.py FIRST (fixtures regenerate between
#: rounds).
SHOWCASE: tuple[str, ...] = (
    # aggregate tail (B9/B10 extensions)
    "agg_conditional", "agg_weighted", "agg_regression",
    "agg_bitmap_distinct",
    # sketch family remainder (E1-E3, E66)
    "sketch_bloom", "sketch_hll", "sketch_hll_merge",
    # window tail (B13-B15 extensions)
    "window_range_frame", "window_distribution", "window_regression",
    "window_count_distinct", "window_count_distinct_scalable",
    # join tail (B7/B8/E4-E6 extensions)
    "join_asof_forward", "join_asof_nearest", "join_null_safe",
    "join_range_binned", "join_dpp", "join_interval_events",
    "join_lateral",
    # SQL-API surface (A17/E7-E10)
    "sql_api_q5", "sql_scripting", "sql_pipe_syntax", "scalar_subquery",
    # Spark-4 UDF specimens (A18)
    "python_udtf_table_arg", "python_udf_arrow", "arrow_grouped_map",
    # set ops / functions tail
    "set_intersect_all", "fn_url",
    # dedup/similarity tails (D2/D3) — incl. the round-5 re-blocks
    "dedup_minhash_pairs", "dedup_minhash_capped", "dedup_minhash_eval",
    "dedup_ngram_jaccard", "dedup_ngram_jaccard_simblocked",
    "dedup_against_corpus", "dedup_substring", "dedup_semdedup",
    "similarity_pq_adc", "similarity_range",
    # curation / sampling (E14/E28-E31/E54-E57)
    "corpus_mix_weights", "corpus_shuffle", "corpus_temperature_mix",
    "corpus_length_filter", "sample_hash", "sample_stratified",
    "sample_weighted", "text_repetition",
    # graph / events / multimodal / parity remainder
    "graph_triangles", "events_attribution", "multimodal_audio_energy",
    "mr_reducemap",
)


def register(
    name: str,
    oracle: str | None = None,
    survey: str = "",
    scale: str = "",
) -> Callable[[Builder], Builder]:
    """Decorator: declare ``fn`` as the builder for query ``name``."""

    def deco(fn: Builder) -> Builder:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = Query(
            name=name,
            builder=fn,
            oracle=textwrap.dedent(oracle).strip() if oracle else None,
            survey=survey,
            scale=textwrap.dedent(scale).strip(),
        )
        return fn

    return deco


def load_all() -> dict[str, Query]:
    """Import every module that declares queries; return the full registry."""
    from .operators import (  # noqa: F401
        aggregates,
        events,
        iterative,
        joins,
        maps,
        scans,
        setops,
        sketches,
        sorts,
        sql_api,
        subqueries,
        tpch,
        windows,
    )
    from .functions import arrays, jsons, scalars  # noqa: F401
    from .llm import curation, dedup, multimodal, similarity, text  # noqa: F401
    from .sources import (  # noqa: F401
        layouts,
        pairsource,
        partitioned,
        roundtrips,
    )
    from .streaming import sinks, stateful  # noqa: F401
    from .streaming import windows as _stream_windows  # noqa: F401
    from . import mapreduce  # noqa: F401

    missing = [n for n in SHOWCASE if n not in REGISTRY]
    if missing:  # a rename must update SHOWCASE, loudly
        raise KeyError(f"SHOWCASE names not registered: {missing}")
    ordered = {n: REGISTRY[n] for n in SHOWCASE}
    ordered.update((n, q) for n, q in REGISTRY.items() if n not in ordered)
    return ordered
