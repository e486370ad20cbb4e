"""CLI: run catalog queries against a testdata scale factor.

    python -m parcel_analytics_etl_notebook_spark list
    python -m parcel_analytics_etl_notebook_spark run lifecycle_kpis
    python -m parcel_analytics_etl_notebook_spark run pricing_summary \
        --sf-dir /root/testdata/sf0.1 --explain -n 20
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="parcel_analytics_etl_notebook_spark")
    sub = parser.add_subparsers(dest="cmd", required=True)
    sub.add_parser("list", help="list catalog queries")
    runp = sub.add_parser("run", help="run a catalog query")
    runp.add_argument("query")
    runp.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    runp.add_argument("-n", type=int, default=10, help="rows to show")
    runp.add_argument("--explain", action="store_true", help="print plan summary")
    runp.add_argument("--out", help="write the full result here instead of showing rows")
    runp.add_argument(
        "--format",
        choices=["parquet", "csv", "jsonl"],
        default="parquet",
        help="sink format for --out (default parquet)",
    )
    args = parser.parse_args(argv)

    from parcel_analytics_etl_notebook_spark.plans.catalog import registry

    reg = registry()
    if args.cmd == "list":
        for name, e in sorted(reg.items()):
            kind = "oracle" if e.oracle else "rows-only"
            doc = (e.doc or "").strip().splitlines()
            print(f"{name:32s} [{kind}] {doc[0] if doc else ''}")
        return 0

    if args.query not in reg:
        print(f"unknown query {args.query!r}; try 'list'", file=sys.stderr)
        return 2
    from parcel_analytics_etl_notebook_spark.session import get_spark

    spark = get_spark(app_name=f"cli-{args.query}")
    spark.sparkContext.setLogLevel("ERROR")
    df = reg[args.query].fn(spark, args.sf_dir)
    if args.explain:
        from parcel_analytics_etl_notebook_spark.plans.diagnostics import plan_summary

        for k, v in plan_summary(df).items():
            print(f"  {k}: {v}")
    if args.out:
        from parcel_analytics_etl_notebook_spark.sources.writers import (
            write_jsonl,
            write_parquet,
        )

        if args.format == "parquet":
            write_parquet(df, args.out)
        elif args.format == "jsonl":
            write_jsonl(df, args.out)
        else:
            df.write.mode("overwrite").option("header", "true").csv(args.out)
        print(f"wrote {args.out} ({args.format})")
    else:
        df.show(args.n, truncate=False)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
