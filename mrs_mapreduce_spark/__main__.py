"""Command-line runner: ``python -m mrs_mapreduce_spark <cmd> ...``.

SURVEY.md §2 A17. The reference exposes every program through a CLI
with declarative ``Param`` options (``mrs/main.py`` + ``mrs/param.py``,
[upstream-UNVERIFIED]: ``--mrs=<impl>`` picks the run mode,
``--mrs-reduce-tasks`` etc. tune the task grid). The Spark counterpart
keeps configuration in the session factory (SparkConf) and the query
inventory in the registry; this module is the user-facing switch that
ties them together:

    python -m mrs_mapreduce_spark list [--grep PAT]
    python -m mrs_mapreduce_spark run <query> [--sf-dir DIR] [--limit N]
        [--splits N]
    python -m mrs_mapreduce_spark explain <query> [--sf-dir DIR]
    python -m mrs_mapreduce_spark oracle <query>

``run`` executes a declared query and prints TSV; ``explain`` prints the
formatted physical plan (the .explain discipline as a first-class
command); ``oracle`` prints the query's DuckDB oracle SQL so a user can
replay the correctness check themselves. ``--splits`` maps to
``spark.sql.shuffle.partitions`` — the analogue of the reference's
``--mrs-reduce-tasks`` (reduce-task count == shuffle width).
"""

from __future__ import annotations

import argparse
import os
import sys


def _registry():
    from .registry import load_all

    return load_all()


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="python -m mrs_mapreduce_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p_list = sub.add_parser("list", help="list declared queries")
    p_list.add_argument("--grep", default=None, help="substring filter")

    common = argparse.ArgumentParser(add_help=False)
    common.add_argument(
        "query", help="declared query name (see `list`)"
    )
    common.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"),
        help="fixture directory (default $SPARK_GRAFT_SF_DIR or sf0.01)",
    )
    common.add_argument(
        "--splits",
        type=int,
        default=None,
        help="shuffle partition count (the reference's --mrs-reduce-tasks)",
    )

    p_run = sub.add_parser("run", parents=[common], help="run a query, print TSV")
    p_run.add_argument("--limit", type=int, default=20,
                       help="max rows to print (0 = all)")
    sub.add_parser("explain", parents=[common],
                   help="print the formatted physical plan")
    p_or = sub.add_parser("oracle", help="print a query's DuckDB oracle SQL")
    p_or.add_argument("query")

    args = ap.parse_args(argv)
    registry = _registry()

    if args.cmd == "list":
        for name in sorted(registry):
            row = registry[name].survey.split("(")[0].strip()
            if args.grep and args.grep not in name:
                continue
            print(f"{name}\t{row}")
        return 0

    if args.query not in registry:
        print(f"unknown query {args.query!r}; try `list`", file=sys.stderr)
        return 2

    if args.cmd == "oracle":
        oracle = registry[args.query].oracle
        if oracle is None:
            print(f"{args.query} has no SQL oracle (rows-only check)",
                  file=sys.stderr)
            return 1
        print(oracle.strip())
        return 0

    from .session import get_session

    extra = (
        {"spark.sql.shuffle.partitions": str(args.splits)}
        if args.splits
        else None
    )
    spark = get_session("mrs-cli", extra=extra)
    df = registry[args.query].builder(spark, args.sf_dir)

    if args.cmd == "explain":
        df.explain(mode="formatted")
        return 0

    rows = df.collect() if args.limit == 0 else df.limit(args.limit).collect()
    print("\t".join(df.columns))
    for r in rows:
        print("\t".join(str(v) for v in r))
    print(f"# {len(rows)} row(s){' (limited)' if args.limit else ''}",
          file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
