"""MockParallel run mode: the deterministic full-machinery debug twin.

SURVEY.md §2 A16. The reference ships three run modes [upstream-
UNVERIFIED, public knowledge of byu-aml-lab/mrs-mapreduce: ``mrs/main.py``
selects Serial / MockParallel / the networked master-slave mode]:
*Serial* short-circuits the task machinery entirely, while *MockParallel*
runs EVERY task — splits, parters, combiners, shuffle buckets, sorted
reduce groups — in one process, one task at a time, in a deterministic
order, which is what makes it the debug mode: a failing job replays
identically under a debugger with no scheduler nondeterminism.

The r7 verdict named this the one genuinely absent reference behavior
(Spark ``local[1]`` approximates the parallelism but still schedules
through the DAG scheduler with its own thread, serialization and retry
machinery). :class:`MockParallelJob` is the faithful counterpart: the
SAME user program (a :class:`~.mapreduce.MapReduce` subclass, or an
:class:`~.mapreduce.IterativeMR` producer/consumer program) runs through
the same ``Job`` API surface against plain Python lists — no JVM, no
pickling, no threads — with every framework step (generator map,
map-side combine over sorted per-split groups, parter-bucketed shuffle,
key-sorted groups, secondary value sort, reducemap fusion, text sink)
executed for real. Task order is pinned: upstream datasets materialize
before their consumers, and within a dataset tasks run in split/bucket
index order.

Equality with the Spark-backed :class:`~.mapreduce.Job` is pinned by
tests (``tests/test_mapreduce.py::TestMockParallelParity``) for
wordcount-with-combiner, secondary sort, reducemap fusion, the text
sink, and a full IterativeMR convergence loop.

Scale note: this mode exists for DEBUGGING, never for data. It holds
every partition in driver memory by design — the same documented
limitation as the reference's MockParallel — so its ceiling is what fits
in one Python heap; production runs use :class:`~.mapreduce.Job`
(Spark), where the identical program text scales out.
"""

from __future__ import annotations

import itertools
from collections.abc import Callable, Iterable
from pathlib import Path

from .mapreduce import _sorted_groups, hash_partition


class MockDataset:
    """Materialized-on-wait pair collection — MockParallel's dataset.

    API parity with :class:`~.mapreduce.Dataset`: ``collect``, ``close``,
    ``splits``, ``parter``. ``_tasks`` is the real task list — one
    zero-arg callable per output split/bucket, run in index order.
    """

    def __init__(self, splits: int, tasks: list[Callable[[], list]]):
        self.splits = splits
        self._tasks = tasks
        self._partitions: list[list] | None = None
        self._tasks_done = 0
        self.parter = hash_partition

    def _materialize(self) -> list[list]:
        if self._partitions is None:
            parts = []
            for task in self._tasks:  # deterministic: index order
                parts.append(list(task()))
                self._tasks_done += 1
            self._partitions = parts
        return self._partitions

    def collect(self) -> list[tuple]:
        return [p for part in self._materialize() for p in part]

    def close(self) -> None:
        """Free materialized partitions (parity: frees bucket files)."""
        self._partitions = None


def _chunk(pairs: list, splits: int) -> list[list]:
    """Contiguous split like ``SparkContext.parallelize``'s slicing."""
    n = len(pairs)
    return [
        pairs[n * i // splits : n * (i + 1) // splits] for i in range(splits)
    ]


class MockParallelJob:
    """Drop-in ``Job`` twin running every task serially, deterministically.

    Accepts the same calls as :class:`~.mapreduce.Job` (sources,
    transforms, ``wait``, ``progress``) so user programs and
    :class:`~.mapreduce.IterativeMR` drivers run unmodified. ``wait``'s
    ``timeout`` is accepted but moot: tasks run synchronously inside
    ``wait`` (the reference's MockParallel is likewise single-threaded),
    so every requested dataset is ready on return.
    """

    def __init__(self, default_splits: int = 4):
        self.default_splits = default_splits

    # -- sources ----------------------------------------------------------

    def local_data(self, pairs: Iterable[tuple], splits: int = 2) -> MockDataset:
        chunks = _chunk(list(pairs), splits)
        return MockDataset(
            splits, [lambda c=c: c for c in chunks]
        )

    def file_data(self, paths: list[str]) -> MockDataset:
        def read(path: str) -> list[tuple]:
            lines = Path(path).read_text().splitlines()
            return list(enumerate(lines))

        return MockDataset(
            len(paths), [lambda p=p: read(p) for p in paths]
        )

    # -- transforms ---------------------------------------------------------

    def map_data(
        self,
        dataset: MockDataset,
        mapper: Callable,
        splits: int | None = None,
        parter: Callable = hash_partition,
        combiner: Callable | None = None,
    ) -> MockDataset:
        def map_task(i: int) -> list[tuple]:
            out = [
                pair
                for k, v in dataset._materialize()[i]
                for pair in mapper(k, v)
            ]
            if combiner is not None:
                out = [
                    (k, v)
                    for k, vals in _sorted_groups(out)
                    for v in combiner(k, vals)
                ]
            return out

        ds = MockDataset(
            splits or self.default_splits,
            [lambda i=i: map_task(i) for i in range(len(dataset._tasks))],
        )
        ds.parter = parter
        return ds

    def _bucket(
        self, dataset: MockDataset, bucket: int, n: int, parter: Callable
    ) -> list[tuple]:
        """One shuffle bucket: upstream splits concatenated in order."""
        return [
            (k, v)
            for part in dataset._materialize()
            for k, v in part
            if parter(k, n) == bucket
        ]

    def reduce_data(
        self,
        dataset: MockDataset,
        reducer: Callable,
        splits: int | None = None,
        parter: Callable = hash_partition,
        outdir: str | None = None,
    ) -> MockDataset:
        n = splits or self.default_splits

        def reduce_task(b: int) -> list[tuple]:
            return [
                (k, v)
                for k, vals in _sorted_groups(self._bucket(dataset, b, n, parter))
                for v in reducer(k, vals)
            ]

        ds = MockDataset(n, [lambda b=b: reduce_task(b) for b in range(n)])
        if outdir is not None:
            # the Spark twin's saveAsTextFile is an eager action; match it
            out = Path(outdir)
            out.mkdir(parents=True, exist_ok=False)
            for b, part in enumerate(ds._materialize()):
                (out / f"part-{b:05d}").write_text(
                    "".join(f"{k}\t{v}\n" for k, v in part)
                )
        return ds

    def reduce_data_sorted(
        self,
        dataset: MockDataset,
        reducer: Callable,
        splits: int | None = None,
        parter: Callable = hash_partition,
    ) -> MockDataset:
        n = splits or self.default_splits

        def reduce_task(b: int) -> list[tuple]:
            ordered = sorted(self._bucket(dataset, b, n, parter))
            out = []
            for key, group in itertools.groupby(ordered, key=lambda kv: kv[0]):
                for v in reducer(key, (v for _, v in group)):
                    out.append((key, v))
            return out

        return MockDataset(n, [lambda b=b: reduce_task(b) for b in range(n)])

    def reducemap_data(
        self,
        dataset: MockDataset,
        reducer: Callable,
        mapper: Callable,
        splits: int | None = None,
        parter: Callable = hash_partition,
    ) -> MockDataset:
        n = splits or self.default_splits

        def task(b: int) -> list[tuple]:
            return [
                pair
                for k, vals in _sorted_groups(self._bucket(dataset, b, n, parter))
                for v in reducer(k, vals)
                for pair in mapper(k, v)
            ]

        return MockDataset(n, [lambda b=b: task(b) for b in range(n)])

    # -- control ------------------------------------------------------------

    def wait(self, *datasets: MockDataset, timeout: float | None = None):
        for ds in datasets:
            ds._materialize()
        return list(datasets)

    def progress(self, dataset: MockDataset) -> float:
        if dataset._partitions is not None:
            return 1.0
        if not dataset._tasks:
            return 0.0
        return min(dataset._tasks_done / len(dataset._tasks), 0.99)


class BypassDataset:
    """Eagerly-computed pair collection — Bypass mode's dataset.

    API parity with :class:`~.mapreduce.Dataset` / :class:`MockDataset`
    (``collect``, ``close``, ``splits``); there is exactly one logical
    split and nothing is lazy — bypass computed the pairs at the call
    that produced this object.
    """

    def __init__(self, pairs: list[tuple]):
        self.pairs = list(pairs)
        self.splits = 1
        self.parter = hash_partition

    def collect(self) -> list[tuple]:
        return list(self.pairs)

    def close(self) -> None:
        """No-op: bypass holds no lazy resources to free.

        Dataset.close (Spark) unpersists but a later collect recomputes
        from lineage; MockDataset.close drops partitions but a later
        collect re-runs the tasks. Bypass has no lineage or tasks to
        recompute from, so emptying ``pairs`` here would make a
        close-then-collect sequence silently return [] in exactly one
        run mode — an output-parity violation in the mode whose whole
        contract is parity. Keeping the list is the only behavior where
        all three modes agree.
        """


class BypassJob:
    """A16's fourth run mode: run map/reduce generators INLINE, no tasks.

    The reference's *Bypass* mode [upstream-UNVERIFIED, public knowledge
    of byu-aml-lab/mrs-mapreduce: ``mrs/main.py`` run-implementation
    switch] skips the framework entirely — no splits, no parters, no
    shuffle buckets, no task scheduling; each operation applies the
    user's generators to the whole dataset immediately. That makes it
    the fastest way to sanity-check PROGRAM LOGIC (is my mapper/reducer
    arithmetic right?) with zero machinery in the stack trace, while
    :class:`MockParallelJob` remains the mode that debugs the MACHINERY
    interactions (split boundaries, parter placement, combiner runs).

    Same ``Job`` API surface, so user programs and
    :class:`~.mapreduce.IterativeMR` drivers run unmodified. ``splits``
    and ``parter`` arguments are accepted and ignored — there is one
    inline "split" by definition. Everything is EAGER: ``wait`` has
    nothing to do and ``progress`` is always 1.0.

    Output equality with :class:`~.mapreduce.Job` (Spark) and
    :class:`MockParallelJob` is pinned three-way in
    ``tests/test_mapreduce.py::TestMockParallelParity``.

    Scale note: debugging only, like MockParallel — the whole dataset
    lives in one Python list. Production is the Spark ``Job``.
    """

    def __init__(self, default_splits: int = 1):
        self.default_splits = default_splits

    # -- sources ----------------------------------------------------------

    def local_data(self, pairs: Iterable[tuple], splits: int = 1) -> BypassDataset:
        return BypassDataset(pairs)

    def file_data(self, paths: list[str]) -> BypassDataset:
        return BypassDataset(
            pair
            for path in paths
            for pair in enumerate(Path(path).read_text().splitlines())
        )

    # -- transforms (each computes inline, immediately) -------------------

    def map_data(
        self,
        dataset: BypassDataset,
        mapper: Callable,
        splits: int | None = None,
        parter: Callable = hash_partition,
        combiner: Callable | None = None,
    ) -> BypassDataset:
        out = [pair for k, v in dataset.pairs for pair in mapper(k, v)]
        if combiner is not None:
            # one inline combine pass over the whole (sorted) output —
            # the degenerate single-split case of the framework's
            # map-side combine, output-equal because combiners are
            # reduce-compatible by contract
            out = [
                (k, v)
                for k, vals in _sorted_groups(out)
                for v in combiner(k, vals)
            ]
        return BypassDataset(out)

    def reduce_data(
        self,
        dataset: BypassDataset,
        reducer: Callable,
        splits: int | None = None,
        parter: Callable = hash_partition,
        outdir: str | None = None,
    ) -> BypassDataset:
        ds = BypassDataset(
            (k, v)
            for k, vals in _sorted_groups(dataset.pairs)
            for v in reducer(k, vals)
        )
        if outdir is not None:
            out = Path(outdir)
            out.mkdir(parents=True, exist_ok=False)
            (out / "part-00000").write_text(
                "".join(f"{k}\t{v}\n" for k, v in ds.pairs)
            )
        return ds

    def reduce_data_sorted(
        self,
        dataset: BypassDataset,
        reducer: Callable,
        splits: int | None = None,
        parter: Callable = hash_partition,
    ) -> BypassDataset:
        ordered = sorted(dataset.pairs)
        out = []
        for key, group in itertools.groupby(ordered, key=lambda kv: kv[0]):
            for v in reducer(key, (v for _, v in group)):
                out.append((key, v))
        return BypassDataset(out)

    def reducemap_data(
        self,
        dataset: BypassDataset,
        reducer: Callable,
        mapper: Callable,
        splits: int | None = None,
        parter: Callable = hash_partition,
    ) -> BypassDataset:
        return BypassDataset(
            pair
            for k, vals in _sorted_groups(dataset.pairs)
            for v in reducer(k, vals)
            for pair in mapper(k, v)
        )

    # -- control (trivial: everything already ran) ------------------------

    def wait(self, *datasets: BypassDataset, timeout: float | None = None):
        return list(datasets)

    def progress(self, dataset: BypassDataset) -> float:
        return 1.0


def make_job(mode: str = "spark", spark=None, **kwargs):
    """Run-mode switch (A16): the reference's CLI ``--mrs=<impl>`` flag.

    ``spark`` → the distributed :class:`~.mapreduce.Job` (requires a
    SparkSession); ``mock_parallel`` → :class:`MockParallelJob`, the
    deterministic full-machinery debug mode; ``bypass`` →
    :class:`BypassJob`, generators applied inline with no task machinery
    at all (the reference's fourth mode; Serial is subsumed by ``Job``'s
    synchronous waits on ``local[1]``).
    """
    if mode == "spark":
        if spark is None:
            raise ValueError("mode='spark' requires a SparkSession")
        from .mapreduce import Job

        return Job(spark, **kwargs)
    if mode == "mock_parallel":
        return MockParallelJob(**kwargs)
    if mode == "bypass":
        return BypassJob(**kwargs)
    raise ValueError(f"unknown run mode {mode!r}")
