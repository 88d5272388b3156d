"""Type-parity staleness gate for the oracle cast map.

Round-4 root cause: the round driver's value hash canonicalizes results
the way pandas/Arrow materializes them, so a DuckDB HUGEINT (any SUM
over integers) renders ``600572.0`` where Spark's int64 renders
``600572`` — equal values, failed hash (all nine r3 flags).  The fix is
``registry.oracle_sql()`` wrapping affected oracles with casts from the
generated map (_oracle_casts.py).

This test re-DESCRIBEs every NORMALIZED oracle in DuckDB (metadata
only, no execution, no Spark) and asserts the mismatch-prone types are
gone — the cheap invariant that catches a new query added without
regenerating the map.  The full Spark-side audit is
scripts/audit_dtypes.py; the bit-level gate is driver_sim --strict.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from mkpipe_extractor_clickhouse_spark import registry

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return c


def test_no_hugeint_in_any_normalized_oracle(con):
    registry._load_modules()
    bad = []
    for name, sql in registry.oracle_sql().items():
        for col, typ, *_ in con.execute(f"DESCRIBE {sql}").fetchall():
            if typ == "HUGEINT":
                bad.append(f"{name}.{col}")
    assert not bad, (
        "HUGEINT columns reached the driver surface — regenerate the "
        f"cast map (python scripts/gen_oracle_casts.py): {bad}"
    )


def test_cast_map_covers_registry_names_only():
    """Every cast-map entry must reference a live registered query —
    a renamed/deleted query with a stale map entry silently stops
    normalizing its successor."""
    from mkpipe_extractor_clickhouse_spark._oracle_casts import (
        ORACLE_CASTS,
        ORACLE_COLUMNS,
    )

    registry._load_modules()
    names = set(registry._REGISTRY)
    assert set(ORACLE_CASTS) <= names
    assert set(ORACLE_COLUMNS) == set(ORACLE_CASTS)
