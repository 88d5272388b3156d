"""Experiment (guide §2.4 — remove shuffles outright): the shingle
relation's dedup is PER-DOC (doc_id is in the key), so the global
.distinct() exchange can become a map-side array_distinct. Also times
the combined effect with the one-pass PPJoin on l23's full pipeline."""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from mkpipe_extractor_clickhouse_spark.operators.llm_dedup import (  # noqa: E402
    NGRAM_T,
    _shingles,
    ppjoin_pairs,
)
from mkpipe_extractor_clickhouse_spark.catalog import load_table  # noqa: E402
from mkpipe_extractor_clickhouse_spark.session import get_spark  # noqa: E402
from scripts.exp_ppjoin_onepass import ppjoin_pairs_onepass  # noqa: E402


def shingles_mapside(docs: DataFrame) -> DataFrame:
    t = F.split("text", " ")
    grams = F.when(
        F.size(t) >= 3,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size(t) - 2),
                lambda i: F.concat_ws(
                    " ",
                    F.element_at(t, i),
                    F.element_at(t, i + 1),
                    F.element_at(t, i + 2),
                ),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))
    return docs.select("doc_id", F.explode(grams).alias("token"))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="exp_shingles_mapside")
    spark.sparkContext.setLogLevel("ERROR")
    d = load_table(spark, sf_dir, "documents")

    cur_sh = _shingles(d)
    new_sh = shingles_mapside(d)
    a = {tuple(r) for r in cur_sh.collect()}
    b = {tuple(r) for r in new_sh.collect()}
    print(f"shingle rows cur={len(a)} new={len(b)} equal={a == b}")
    if a != b:
        return 1

    variants = {
        "sh_current": cur_sh,
        "sh_mapside": new_sh,
        "l23_current": ppjoin_pairs(_shingles(d), NGRAM_T),
        "l23_mapside_onepass": ppjoin_pairs_onepass(shingles_mapside(d), NGRAM_T),
    }
    # l23 result equality for the combined variant
    r1 = {tuple(r) for r in variants["l23_current"].collect()}
    r2 = {tuple(r) for r in variants["l23_mapside_onepass"].collect()}
    print(f"l23 rows cur={len(r1)} new={len(r2)} equal={r1 == r2}")
    if r1 != r2:
        return 1

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    for df in variants.values():
        noop(df)
    times = {k: [] for k in variants}
    for _ in range(5):
        for name, df in variants.items():
            t0 = time.perf_counter(); noop(df); times[name].append(time.perf_counter() - t0)
    for name in variants:
        print(f"{name}: min={min(times[name]):.3f} all={[round(x,3) for x in times[name]]}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
