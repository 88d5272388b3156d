"""Clean A/B for l23 variants: alternating reps, min + median, one
session. Variants: current, repart-shingles + current ppjoin,
repart-shingles + one-pass ppjoin."""

from __future__ import annotations

import statistics
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from mkpipe_extractor_clickhouse_spark.operators.llm_dedup import (  # noqa: E402
    NGRAM_T,
    _shingles,
    ppjoin_pairs,
)
from mkpipe_extractor_clickhouse_spark.catalog import load_table  # noqa: E402
from mkpipe_extractor_clickhouse_spark.session import get_spark  # noqa: E402
from scripts.exp_ppjoin_onepass import ppjoin_pairs_onepass  # noqa: E402
from scripts.exp_shingles_repart import shingles_repart  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 9
    spark = get_spark(app_name="exp_l23_ab")
    spark.sparkContext.setLogLevel("ERROR")
    p = spark.sparkContext.defaultParallelism
    d = load_table(spark, sf_dir, "documents")

    variants = {
        "A_current": ppjoin_pairs(_shingles(d), NGRAM_T),
        "B_repart_curjoin": ppjoin_pairs(shingles_repart(d, p), NGRAM_T),
        "C_repart_onepass": ppjoin_pairs_onepass(shingles_repart(d, p), NGRAM_T),
        "D_cursh_onepass": ppjoin_pairs_onepass(_shingles(d), NGRAM_T),
    }

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    for df in variants.values():
        noop(df)
    times = {k: [] for k in variants}
    for _ in range(reps):
        for name, df in variants.items():
            t0 = time.perf_counter(); noop(df); times[name].append(time.perf_counter() - t0)
    for name in variants:
        xs = times[name]
        print(
            f"{name}: min={min(xs):.3f} med={statistics.median(xs):.3f} "
            f"all={[round(x, 2) for x in xs]}"
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
