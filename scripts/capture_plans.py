"""Capture .explain('formatted') output for named queries into a
directory (the r12 optimization evidence: plans/r12/<q>_<tag>.txt).

Usage: python scripts/capture_plans.py --tag before --dir plans/r12 name...
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--tag", required=True)
    ap.add_argument("--dir", default="plans/r12")
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    from mkpipe_extractor_clickhouse_spark.registry import all_specs
    from mkpipe_extractor_clickhouse_spark.session import get_spark

    spark = get_spark(app_name="capture_plans")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_specs()
    out = REPO / args.dir
    out.mkdir(parents=True, exist_ok=True)
    for name in args.names:
        df = specs[name].builder(spark, args.sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        (out / f"{name}_{args.tag}.txt").write_text(plan)
        print(f"wrote {name}_{args.tag}.txt ({len(plan)} bytes)")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
