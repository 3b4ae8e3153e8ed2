"""Command-line entry point: list, run, explain and verify catalog
queries without writing a driver script.

    python -m personal_health_etl_pipeline_spark list [--filter SUBSTR]
    python -m personal_health_etl_pipeline_spark run NAME
        [--sf DIR] [--limit N] [--explain]
    python -m personal_health_etl_pipeline_spark verify NAME [--sf DIR]

``run`` executes one catalog query and prints its rows (first
``--limit``, default 20); ``--explain`` prints the formatted physical
plan instead. ``verify`` runs the query AND its DuckDB oracle on the
same parquet and reports match/mismatch — the driver's differential
gate, one query at a time, from a shell.
"""

from __future__ import annotations

import argparse
import sys


def _build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="personal_health_etl_pipeline_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    lp = sub.add_parser("list", help="list catalog queries")
    lp.add_argument("--filter", default="", help="substring filter")

    rp = sub.add_parser("run", help="run one catalog query")
    rp.add_argument("name")
    rp.add_argument("--sf", default="/root/testdata/sf0.01")
    rp.add_argument("--limit", type=int, default=20)
    rp.add_argument(
        "--explain", action="store_true", help="print the plan, not rows"
    )

    vp = sub.add_parser("verify", help="differential-check one query vs DuckDB")
    vp.add_argument("name")
    vp.add_argument("--sf", default="/root/testdata/sf0.01")
    return p


def main(argv: list[str] | None = None) -> int:
    args = _build_parser().parse_args(argv)
    from personal_health_etl_pipeline_spark.plans.catalog import CATALOG

    if args.cmd == "list":
        for name in CATALOG:
            if args.filter in name:
                print(name)
        return 0

    if args.name not in CATALOG:
        print(
            f"unknown query {args.name!r}; `list` shows all "
            f"{len(CATALOG)} entries",
            file=sys.stderr,
        )
        return 2

    from personal_health_etl_pipeline_spark import get_spark

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    try:
        fn, oracle = CATALOG[args.name]
        df = fn(spark, args.sf)
        if args.cmd == "run":
            if args.explain:
                df.explain("formatted")
            else:
                df.show(args.limit, truncate=False)
            return 0
        # verify
        if oracle is None:
            n = df.count()
            print(f"{args.name}: rows-only check, {n} rows (no oracle)")
            return 0
        import importlib

        try:
            parity = importlib.import_module("tests.parity")
        except ImportError:
            print(
                "verify needs the repo's tests/ tree on sys.path "
                "(tests.parity holds the DuckDB oracle compare). "
                "Run from the repository root, e.g.:\n"
                "  cd <repo> && python -m "
                "personal_health_etl_pipeline_spark verify "
                f"{args.name}",
                file=sys.stderr,
            )
            return 2
        cols, rows, types = parity.run_oracle(oracle, args.sf)
        try:
            parity.compare(df, cols, rows, types)
        except AssertionError as ex:
            print(f"{args.name}: MISMATCH — {ex}", file=sys.stderr)
            return 1
        print(f"{args.name}: ok ({len(rows)} rows match DuckDB)")
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
