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
#: ROUND-4 PREFIX: rounds 1-3 drove 123 distinct queries (121 green).
#: This round's 50 = the 2 still-red rows (dedup_components: array
#: output fixed to ","-joined string; agg_approx_distinct: redesigned
#: with a bounded-error exact oracle) + the 4 never-sampled queries
#: carrying the same latent array/no-oracle hazards, now fixed
#: (dedup_components_star, embedding_pq, text_postings,
#: sketch_quantile) + 44 never-driver-tested queries from the r3
#: verdict's priority families (text_*, sink_*/source_*, stream_*,
#: events_* tail). Remaining never-tested after r4: ~52 — rotate them
#: in round 5 (agg_* tail, window_* tail, join_* tail, sql_*,
#: sketch_bloom/hll/hll_merge, multimodal_audio_energy,
#: similarity/dedup tails, corpus_*, sample_*, mr_*, graph_triangles,
#: map_explode_pos, fn_url, arrow/udtf specimens, events_attribution,
#: text_repetition, join_interval_events).
#: Run scripts/fixture_check.py FIRST (fixtures regenerate between
#: rounds).
SHOWCASE: tuple[str, ...] = (
    # still-red retests (r3 array-canonicalizer fix; r1 no-oracle redesign)
    "dedup_components", "agg_approx_distinct",
    # never-sampled queries that carried the same latent hazards, fixed
    "dedup_components_star", "embedding_pq", "text_postings",
    "sketch_quantile",
    # text-analysis family (D4) — zero driver evidence until now
    "text_lang_stats", "text_langid", "text_quality", "text_tokens",
    "text_fingerprint", "text_winnow", "text_bigrams", "text_scrub",
    "text_bigram_lm", "text_mask_spans", "text_bpe_pairs", "text_bm25",
    "text_perplexity", "text_pmi", "text_fertility", "text_entropy",
    "text_zipf",
    # source/sink surface (A3/A4)
    "sink_csv_roundtrip", "sink_json_roundtrip", "sink_orc_roundtrip",
    "source_text_lines", "sink_merge_upsert", "sink_schema_evolution",
    "sink_compaction", "source_csv_permissive", "source_hex_pairs",
    "sink_partitioned",
    # streaming remainder (C1-C6, E11/E16/E49/E54)
    "stream_foreach_batch", "stream_static_join", "stream_join_left_outer",
    "stream_dedup", "stream_stateful", "stream_sliding", "stream_watermark",
    "stream_session_dynamic",
    # event-analytics tail (D6/E36/E39/E41/E46/E57/E61/E62/E69)
    "events_funnel_ordered", "events_trigrams", "events_interarrival",
    "events_ewma", "events_abtest", "events_funnel_bounded",
    "events_mom_growth", "events_fill_forward", "scd2_build",
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
