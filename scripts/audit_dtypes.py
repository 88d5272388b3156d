"""Type-parity audit: for every registered query, compare the Spark
result schema against the DuckDB oracle's result types (via DESCRIBE —
no execution), mapped into the canonical classes a pandas/Arrow-based
driver would materialize.

Root cause found in round 4: the round driver's value-hash diverged on
exactly the queries whose DuckDB oracle emits HUGEINT (SUM of integers
widens to int128 → float64/decimal128 under .df()/.arrow()) while Spark
emits int64 — equal VALUES, different TYPES.  DuckDB fetchall() hides
the difference (HUGEINT → Python int), which is why driver_sim passed
all nine flagged queries bit-exactly.  The categorical fix is CAST(...
AS BIGINT) on the oracle side; this audit finds every such site.

Usage:
    python scripts/audit_dtypes.py            # audit all queries
    python scripts/audit_dtypes.py name1 ...  # subset
Exit 1 when any mismatch is found.
"""

from __future__ import annotations

import os
import re
import sys
from pathlib import Path

REPO = str(Path(__file__).resolve().parent.parent)
if REPO not in sys.path:
    sys.path.insert(0, REPO)

import duckdb  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_AUDIT_SF_DIR", "/root/testdata/sf0.001")
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

# DuckDB column_type string → canonical class.  HUGEINT deliberately
# maps to its own class: no Spark type materializes like it.
_DUCK = {
    "TINYINT": "i8", "SMALLINT": "i16", "INTEGER": "i32", "BIGINT": "i64",
    "HUGEINT": "hugeint", "UTINYINT": "u8", "USMALLINT": "u16",
    "UINTEGER": "u32", "UBIGINT": "u64",
    "FLOAT": "f32", "DOUBLE": "f64",
    "VARCHAR": "str", "BOOLEAN": "bool", "BLOB": "bytes",
    "DATE": "date", "TIME": "time",
    "TIMESTAMP": "ts", "TIMESTAMP_NS": "ts", "TIMESTAMP_MS": "ts",
    "TIMESTAMP_S": "ts", "TIMESTAMP WITH TIME ZONE": "tstz",
    "INTERVAL": "interval",
}


def duck_class(t: str) -> str:
    t = t.strip()
    if t in _DUCK:
        return _DUCK[t]
    m = re.match(r"DECIMAL\((\d+),(\d+)\)", t)
    if m:
        return f"dec({m.group(1)},{m.group(2)})"
    m = re.match(r"(.*)\[\]$", t)
    if m:
        return f"list<{duck_class(m.group(1))}>"
    if t.startswith("STRUCT") or t.startswith("MAP"):
        return t  # compared textually; rare in oracles
    return t


def spark_class(dt) -> str:
    from pyspark.sql import types as T

    if isinstance(dt, T.ByteType):
        return "i8"
    if isinstance(dt, T.ShortType):
        return "i16"
    if isinstance(dt, T.IntegerType):
        return "i32"
    if isinstance(dt, T.LongType):
        return "i64"
    if isinstance(dt, T.FloatType):
        return "f32"
    if isinstance(dt, T.DoubleType):
        return "f64"
    if isinstance(dt, T.DecimalType):
        return f"dec({dt.precision},{dt.scale})"
    if isinstance(dt, T.StringType):
        return "str"
    if isinstance(dt, T.BooleanType):
        return "bool"
    if isinstance(dt, T.BinaryType):
        return "bytes"
    if isinstance(dt, T.DateType):
        return "date"
    if isinstance(dt, T.TimestampNTZType):
        return "ts"
    if isinstance(dt, T.TimestampType):
        return "tstz"
    if isinstance(dt, T.ArrayType):
        return f"list<{spark_class(dt.elementType)}>"
    return dt.simpleString()


# Pairs that materialize identically through pandas/Arrow on both
# paths, so a driver hash cannot distinguish them.  Kept MINIMAL and
# evidence-based: int-width differences are benign only when proven by
# a green driver row; start strict and whitelist per audit evidence.
_COMPATIBLE = {
    ("ts", "tstz"),  # fixture timestamps are NTZ; DuckDB reads naive
}


def compatible(spark_c: str, duck_c: str) -> bool:
    if spark_c == duck_c:
        return True
    return (spark_c, duck_c) in _COMPATIBLE or (duck_c, spark_c) in _COMPATIBLE


def main() -> int:
    from mkpipe_extractor_clickhouse_spark import registry

    registry._load_modules()
    only = set(sys.argv[1:])

    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )

    from pyspark.sql import types as T

    from mkpipe_extractor_clickhouse_spark.session import get_spark

    spark = get_spark()

    bad = 0
    checked = 0
    for name, spec in registry._REGISTRY.items():
        if only and name not in only:
            continue
        try:
            sdf = spec.builder(spark, SF_DIR)
            stypes = {f.name: spark_class(f.dataType) for f in sdf.schema.fields}
        except Exception as e:  # noqa: BLE001
            print(f"{name}: SPARK BUILD ERROR: {str(e)[:160]}")
            bad += 1
            continue
        # Complex-typed OUTPUT columns are forbidden registry-wide
        # (oracle and rows-only alike): the round driver canonicalizes
        # results via a pandas multi-key sort, and list/dict cells are
        # unhashable there (round-7 harness crash on the two
        # ch_moving_*_array queries).  Serialize arrays to
        # deterministic strings instead (a8_collect_list pattern).
        for f in sdf.schema.fields:
            if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType)):
                print(
                    f"{name}.{f.name}: COMPLEX OUTPUT TYPE "
                    f"{f.dataType.simpleString()} (driver-unsortable)"
                )
                bad += 1
        if spec.oracle is None:
            continue
        sql = registry._normalized_oracle(name, spec.oracle)
        try:
            desc = con.execute(f"DESCRIBE {sql}").fetchall()
            duck_types = {r[0]: duck_class(r[1]) for r in desc}
        except Exception as e:  # noqa: BLE001
            print(f"{name}: ORACLE DESCRIBE ERROR: {str(e)[:160]}")
            bad += 1
            continue
        checked += 1
        if set(stypes) != set(duck_types):
            print(
                f"{name}: COLUMN MISMATCH spark={sorted(stypes)} "
                f"oracle={sorted(duck_types)}"
            )
            bad += 1
            continue
        for col in sorted(stypes):
            if not compatible(stypes[col], duck_types[col]):
                print(
                    f"{name}.{col}: spark={stypes[col]} "
                    f"oracle={duck_types[col]}"
                )
                bad += 1
    print(f"-- audited {checked} oracle queries, {bad} mismatched columns --")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
