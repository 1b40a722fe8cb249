"""CLI: run registered queries, list the catalog, describe tables.

    python -m etl_cotrip_signs_spark list
    python -m etl_cotrip_signs_spark describe documents --sf /root/testdata/sf0.01
    python -m etl_cotrip_signs_spark run q5_regional_revenue --sf /root/testdata/sf0.01 --show 10
    python -m etl_cotrip_signs_spark bench --sf /root/testdata/sf0.1
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="etl_cotrip_signs_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    sp_list = sub.add_parser("list", help="list registered queries")
    sp_list.add_argument("--oracle-only", action="store_true")

    sp_desc = sub.add_parser("describe", help="print a table's schema")
    sp_desc.add_argument("table")
    sp_desc.add_argument("--sf", default="/root/testdata/sf0.01")

    sp_run = sub.add_parser("run", help="run one query")
    sp_run.add_argument("name")
    sp_run.add_argument("--sf", default="/root/testdata/sf0.01")
    sp_run.add_argument("--show", type=int, default=20)
    sp_run.add_argument("--explain", action="store_true")

    sub.add_parser("bench", help="run the headline benchmark (same as bench.py)")

    args = p.parse_args(argv)

    from . import registry
    from .io import TABLES, describe_table
    from .session import get_spark

    registry.load_all()

    if args.cmd == "list":
        for name in sorted(registry.QUERIES):
            if args.oracle_only and name not in registry.ORACLES:
                continue
            kind = "oracle" if name in registry.ORACLES else "rows-only"
            print(f"{name:35s} [{kind}]")
        return 0

    spark = get_spark("etl-cotrip-signs-cli")

    if args.cmd == "describe":
        if args.table not in TABLES:
            print(f"unknown table {args.table!r}; one of {TABLES}", file=sys.stderr)
            return 2
        print(describe_table(spark, args.sf, args.table).treeString())
        return 0

    if args.cmd == "run":
        if args.name not in registry.QUERIES:
            print(f"unknown query {args.name!r} (see `list`)", file=sys.stderr)
            return 2
        t0 = time.perf_counter()
        df = registry.QUERIES[args.name](spark, args.sf)
        if args.explain:
            df.explain("formatted")
        df.show(args.show, truncate=False)
        print(
            json.dumps(
                {"query": args.name, "sf_dir": args.sf,
                 "wall_sec": round(time.perf_counter() - t0, 3)}
            )
        )
        return 0

    if args.cmd == "bench":
        import bench  # repo-root bench.py

        bench.main()
        return 0

    return 1


if __name__ == "__main__":
    raise SystemExit(main())
