"""Fast bench experimentation: steady-state pass only, configurable
extra confs via JSON arg. Usage:
    python scripts/bench_experiment.py '{"spark.foo": "bar"}' [n_passes]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = str(Path(__file__).resolve().parent.parent)
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from mkpipe_extractor_clickhouse_spark.catalog import TABLE_NAMES, load_table
from mkpipe_extractor_clickhouse_spark.registry import bench_specs
from mkpipe_extractor_clickhouse_spark.session import get_spark


def main() -> None:
    extra = json.loads(sys.argv[1]) if len(sys.argv) > 1 else {}
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = "/root/testdata/sf0.1"
    spark = get_spark(app_name="bench_exp", extra_conf=extra)
    for t in TABLE_NAMES:
        load_table(spark, sf_dir, t).count()
    results: list[dict[str, float]] = []
    for _ in range(passes):
        timing: dict[str, float] = {}
        for name, spec in sorted(bench_specs().items()):
            t0 = time.perf_counter()
            spec.builder(spark, sf_dir).write.format("noop").mode("overwrite").save()
            timing[name] = round(time.perf_counter() - t0, 3)
        results.append(timing)
    best = {n: min(r[n] for r in results[1:]) for n in results[0]}
    print(json.dumps({"passes": [round(sum(r.values()), 3) for r in results],
                      "best_total": round(sum(best.values()), 3),
                      "best": best}))
    spark.stop()


if __name__ == "__main__":
    main()
