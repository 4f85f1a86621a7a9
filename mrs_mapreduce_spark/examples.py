"""Example programs for the Mrs-parity layer.

Capability parity: the reference's ``examples/`` directory (wordcount.py,
the canonical ~40-line Mrs program, and the Monte-Carlo pi family used by
the PyHPC'12 paper) — SURVEY.md §5.1. Classes live here (not in tests) so
Python workers can import them by module path, the Spark analogue of the
reference's same-script-on-every-node rule (``mrs/registry.py``).
"""

from __future__ import annotations

import random

from .mapreduce import MapReduce, ascii_words


class WordCount(MapReduce):
    """The canonical Mrs program: count words with a map-side combiner."""

    def map(self, key, value):
        # ascii_words: NULL text is an empty document, and the split is
        # pinned to the ASCII whitespace class the oracles use — NOT
        # str.split(), which also splits on NBSP/U+2028/U+0085 and would
        # diverge on non-ASCII whitespace (r12 advice)
        for word in ascii_words(value):
            yield (word, 1)

    def combine(self, key, values):
        yield sum(values)

    def reduce(self, key, values):
        yield sum(values)


class MonteCarloPi(MapReduce):
    """Monte-Carlo pi estimation (the paper's benchmark family).

    Input pairs are ``(task_id, n_samples)``; map emits per-task hit
    counts keyed by a single reduce key; reduce totals them. Deterministic
    per task: the RNG is seeded with the task id.
    """

    def map(self, key, value):
        rng = random.Random(key)
        hits = sum(
            1
            for _ in range(value)
            if rng.random() ** 2 + rng.random() ** 2 <= 1.0
        )
        yield ("pi", (hits, value))

    def reduce(self, key, values):
        hits, total = 0, 0
        for h, n in values:
            hits += h
            total += n
        yield 4.0 * hits / total
