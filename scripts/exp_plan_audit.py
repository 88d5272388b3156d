"""Plan audit over the sweep tail: per query, count parquet scans per
table, Exchange nodes, and Python-eval nodes in the compiled physical
plan. Repeated scans of one table = a subtree Spark will re-execute
per reference (everything above the reused exchange re-runs)."""

from __future__ import annotations

import json
import re
import sys
from collections import Counter
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))


def main() -> int:
    sf_dir = "/root/testdata/sf0.1"
    names = sys.argv[1:]
    from mkpipe_extractor_clickhouse_spark.registry import all_specs
    from mkpipe_extractor_clickhouse_spark.session import get_spark

    spark = get_spark(app_name="exp_plan_audit")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_specs()
    out = {}
    for name in names:
        try:
            df = specs[name].builder(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as ex:  # noqa: BLE001
            out[name] = {"error": str(ex)[:80]}
            continue
        scans = Counter(
            m.group(1)
            for m in re.finditer(r"FileScan parquet \[?[^\]]*\]? ?.*?([a-z_0-9]+)\.parquet", plan)
        )
        out[name] = {
            "scans": dict(scans),
            "multi": {t: c for t, c in scans.items() if c > 1},
            "exchanges": plan.count("Exchange"),
            "python": plan.count("EvalPython") + plan.count("MapInArrow")
            + plan.count("MapInPandas") + plan.count("FlatMapGroupsInPandas"),
            "rdd_scans": plan.count("Scan ExistingRDD"),
            "plan_kb": round(len(plan) / 1024, 1),
        }
        print(name, json.dumps(out[name]))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
