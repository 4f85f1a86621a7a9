"""Command-line entry point.

Capability parity: ``mrs/param.py`` + ``mrs/main.py`` (SURVEY.md §2.A
A16/A17) — the reference's declarative Param/CLI system and run-mode
switch (``--mrs=Serial|MockParallel|Master``). Spark's analogue is
configuration: ``--master local[1]`` is Serial, ``local[N]`` is
MockParallel-with-real-parallelism, a cluster URL is Master/Slave.

Usage::

    python -m mrs_mapreduce_spark.cli --query groupby_agg \
        --sf-dir /root/testdata/sf0.001 --master "local[4]" --show 10
    python -m mrs_mapreduce_spark.cli --list
"""

from __future__ import annotations

import argparse
import sys


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        prog="mrs_mapreduce_spark",
        description="Run a declared query from the engine registry.",
    )
    parser.add_argument("--query", help="registry query name")
    parser.add_argument(
        "--sf-dir",
        default="/root/testdata/sf0.001",
        help="fixture directory (default sf0.001)",
    )
    parser.add_argument(
        "--master",
        default=None,
        help="Spark master: local[1]=serial, local[N]=parallel, URL=cluster",
    )
    parser.add_argument(
        "--show", type=int, default=20, help="rows to display"
    )
    parser.add_argument(
        "--explain", action="store_true", help="print the physical plan"
    )
    parser.add_argument(
        "--list", action="store_true", help="list registered queries"
    )
    return parser


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    from .registry import load_all

    registry = load_all()
    if args.list:
        for name in sorted(registry):
            print(f"{name:28s} {registry[name].survey}")
        return 0
    if not args.query:
        print("--query or --list required", file=sys.stderr)
        return 2
    if args.query not in registry:
        print(f"unknown query: {args.query}", file=sys.stderr)
        return 2

    from .session import get_session

    spark = get_session(f"mrs-cli:{args.query}", master=args.master)
    df = registry[args.query].builder(spark, args.sf_dir)
    if args.explain:
        df.explain("formatted")
    df.show(args.show, truncate=False)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
