"""CLI entry point: run pipelines from a JSON config file of the
reference's YAML shape (reference README.md:17-42).

    python -m mkpipe_extractor_clickhouse_spark config.json [--tags t1 t2]

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
    ap.add_argument("config", help="JSON pipeline config (reference dict shape)")
    ap.add_argument("--tags", nargs="*", default=None, help="run only tables with these tags")
    args = ap.parse_args(argv)

    logging.basicConfig(level=logging.INFO, format="%(levelname)s %(name)s %(message)s")
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
