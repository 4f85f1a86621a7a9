#!/usr/bin/env python
"""The canonical Mrs program, runnable against this engine's parity layer.

Mirrors the reference's ``examples/wordcount.py`` (the ~40-line program
every Mrs paper demos): map yields (word, 1), combine/reduce sum, output
is one ``word<TAB>count`` text part-file per reduce split.

Usage::

    python examples/wordcount.py INPUT.txt [INPUT2.txt ...] OUTDIR \
        [--master local[4]] [--splits 4]

``--master local[1]`` is the reference's ``--mrs=Serial``;
``local[N]`` is parallel; a cluster URL is Master/Slave mode.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from mrs_mapreduce_spark.examples import WordCount  # noqa: E402
from mrs_mapreduce_spark.mapreduce import Job  # noqa: E402
from mrs_mapreduce_spark.session import get_session  # noqa: E402


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("inputs", nargs="+", help="input text file(s)")
    parser.add_argument("outdir", help="output directory (must not exist)")
    parser.add_argument("--master", default="local[4]")
    parser.add_argument("--splits", type=int, default=4)
    args = parser.parse_args(argv)

    spark = get_session("wordcount-example", master=args.master)
    program = WordCount()
    job = Job(spark, default_splits=args.splits)

    ds0 = job.file_data(args.inputs)
    ds1 = job.map_data(ds0, program.map, combiner=program.combine)
    ds2 = job.reduce_data(
        ds1, program.reduce, splits=args.splits, outdir=args.outdir
    )
    job.wait(ds2)
    print(f"wrote {args.splits} part files to {args.outdir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
