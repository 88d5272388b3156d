"""CLI entry point: run pipelines from a JSON config file of the
reference's YAML shape (reference README.md:17-42), or ad-hoc
registry queries.

    python -m mkpipe_extractor_clickhouse_spark config.json [--tags t1 t2]
    python -m mkpipe_extractor_clickhouse_spark --query q1_pricing_summary \
        [--sf-dir /root/testdata/sf0.01] [--explain] [--limit 20]

(JSON rather than YAML keeps pyyaml out of the dependency set; the
dict shape is identical — any YAML loader's output works through
pipeline.run_pipelines directly.)
"""

from __future__ import annotations

import argparse
import json
import logging
import sys

from .pipeline import run_pipelines
from .session import get_spark


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="mkpipe_extractor_clickhouse_spark")
    ap.add_argument("config", nargs="?", help="JSON pipeline config (reference dict shape)")
    ap.add_argument("--tags", nargs="*", default=None, help="run only tables with these tags")
    ap.add_argument("--query", help="run a registry query by name instead of a pipeline")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01", help="fixture dir for --query")
    ap.add_argument("--limit", type=int, default=20, help="rows to show for --query")
    ap.add_argument("--explain", action="store_true", help="print the formatted plan + advisor warnings for --query")
    args = ap.parse_args(argv)

    logging.basicConfig(level=logging.INFO, format="%(levelname)s %(name)s %(message)s")

    if args.query:
        from .plans import formatted_plan, plan_warnings
        from .registry import all_specs

        specs = all_specs()
        if args.query not in specs:
            import difflib

            near = difflib.get_close_matches(args.query, specs, n=5)
            print(f"unknown query {args.query!r}; close matches: {near}")
            return 2
        spark = get_spark(app_name=f"query_{args.query}")
        try:
            df = specs[args.query].builder(spark, args.sf_dir)
            if args.explain:
                print(formatted_plan(df))
                for w in plan_warnings(df):
                    print(f"WARNING: {w}")
            df.show(args.limit, truncate=False)
        finally:
            spark.stop()
        return 0
    if not args.config:
        ap.error("either a config file or --query is required")
    with open(args.config) as f:
        config = json.load(f)
    spark = get_spark(app_name="mkpipe_spark_pipeline")
    try:
        results = run_pipelines(config, spark, tags=args.tags)
    finally:
        spark.stop()
    failed = 0
    for name, rs in results.items():
        for r in rs:
            line = {"pipeline": name, "table": r.table, "status": r.status}
            if r.write_mode:
                line["write_mode"] = r.write_mode
            if r.last_point:
                line["last_point"] = r.last_point
            if r.error:
                line["error"] = r.error
                failed += 1
            print(json.dumps(line))
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
