"""Simulate the round driver against __spark_entry__.py.

Creates a DEFAULT-config SparkSession (no engine confs — like the
driver's own session), runs entry() at sf0.001, then every queries()
entry at sf0.01 against its oracle_sql() DuckDB equivalent, comparing
row-count + sorted-column schema + order-insensitive canonical values.

Usage: python scripts/driver_sim.py [--sf-dir /root/testdata/sf0.01] [name ...]
"""

from __future__ import annotations

import argparse
import sys
import time
import traceback
from pathlib import Path

import duckdb
from pyspark.sql import SparkSession

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

import __spark_entry__ as e  # noqa: E402
from _compare import compare_results  # noqa: E402

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument(
        "--strict",
        action="store_true",
        help=(
            "materialize BOTH sides through Arrow (Spark toArrow vs "
            "DuckDB fetch_arrow_table) and compare full-precision, "
            "type-sensitive canonical values — int64 vs float64 vs "
            "Decimal are DISTINCT, floats compare on all bits.  This is "
            "the tightest local model of the round driver's value hash; "
            "requires the oracle cast map to be current."
        ),
    )
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    # Deliberately default config — the driver owns this session.
    spark = SparkSession.builder.master("local[8]").appName("driver_sim").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    print("== t1 smoke: entry(spark) @ sf0.001")
    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0, "entry returned 0 rows"
    print(f"   ok: {len(rows)} rows, schema {df.columns}")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{args.sf_dir}/{t}.parquet')"
        )

    qs = e.queries()
    osql = e.oracle_sql()
    names = args.names or sorted(qs)
    n_pass = n_fail = n_rows_only = 0
    failures = []
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, args.sf_dir)
            if args.strict:
                stab = sdf.toArrow()
                scols = list(stab.column_names)
                scells = [c.to_pylist() for c in stab.columns]
                srows = list(zip(*scells)) if scells else []
            else:
                srows = [tuple(r) for r in sdf.collect()]
                scols = list(sdf.columns)
            if name in osql:
                res = con.sql(osql[name])
                if args.strict:
                    otab = res.fetch_arrow_table()
                    ocols = list(otab.column_names)
                    ocells = [c.to_pylist() for c in otab.columns]
                    orows = list(zip(*ocells)) if ocells else []
                    compare_results(scols, srows, ocols, orows, strict=True)
                else:
                    compare_results(
                        scols, srows, list(res.columns), res.fetchall()
                    )
                n_pass += 1
                status = "MATCH"
            else:
                assert len(scols) == len(set(scols))
                n_rows_only += 1
                status = f"rows-only ({len(srows)} rows)"
            print(f"   {name}: {status} [{time.time() - t0:.1f}s]")
        except Exception as ex:
            n_fail += 1
            failures.append(name)
            print(f"   {name}: FAIL [{time.time() - t0:.1f}s]")
            traceback.print_exception(type(ex), ex, ex.__traceback__, limit=3)
    print(
        f"== t2 @ {args.sf_dir}: {n_pass} match, {n_rows_only} rows-only, {n_fail} fail"
        + (f" → {failures}" if failures else "")
    )
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
