"""Order-insensitive result comparison mimicking the driver's gate:
row-count + schema (column names, sorted) + value multiset.

Cells are canonicalized to strings: floats via repr(round(x, 6)) so a
sub-1e-6 engine difference still matches, timestamps via isoformat,
arrays via recursive canonicalization. The driver's exact hash is
unknown; this is intentionally at least as strict on names/counts and
slightly looser on float low bits (queries are designed to be
bit-identical anyway via decimal-sum determinism)."""

from __future__ import annotations

import datetime as dt
import math
from decimal import Decimal
from typing import Any

import numpy as np


def canon_cell(v: Any) -> str:
    if v is None:
        return "∅"
    if isinstance(v, float) or isinstance(v, np.floating):
        v = float(v)
        if math.isnan(v):
            return "NaN"
        if math.isinf(v):
            return "Inf" if v > 0 else "-Inf"
        return repr(round(v, 6))
    if isinstance(v, (bool, np.bool_)):
        return str(bool(v))
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, Decimal):
        return repr(round(float(v), 6))
    if isinstance(v, (dt.datetime, np.datetime64)):
        if isinstance(v, np.datetime64):
            v = v.astype("datetime64[us]").item()
        if isinstance(v, dt.datetime) and v.tzinfo is not None:
            v = v.astimezone(dt.timezone.utc).replace(tzinfo=None)
        return v.isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(canon_cell(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{canon_cell(x)}" for k, x in sorted(v.items())) + "}"
    return str(v)


def canon_cell_strict(v: Any) -> str:
    """Type- and bit-sensitive canonicalization mimicking a pandas/Arrow
    materializing driver: full-precision float repr (no rounding), ints
    and Decimals kept DISTINCT from floats (``600572`` vs ``600572.0``
    vs ``Decimal('600572')`` all differ — the round-3 flag mechanism),
    datetimes at microsecond iso.  Used by ``driver_sim --strict`` after
    the oracle type-normalization map; a pass here means no plausible
    value-level canonicalization can distinguish the two sides."""
    if v is None:
        return "∅"
    if isinstance(v, (bool, np.bool_)):
        return f"b:{bool(v)}"
    if isinstance(v, float) or isinstance(v, np.floating):
        v = float(v)
        if math.isnan(v):
            return "NaN"
        if math.isinf(v):
            return "Inf" if v > 0 else "-Inf"
        return f"f:{v!r}"
    if isinstance(v, (int, np.integer)):
        return f"i:{int(v)}"
    if isinstance(v, Decimal):
        return f"d:{v}"
    if isinstance(v, (dt.datetime, np.datetime64)):
        if isinstance(v, np.datetime64):
            v = v.astype("datetime64[us]").item()
        if isinstance(v, dt.datetime) and v.tzinfo is not None:
            v = v.astimezone(dt.timezone.utc).replace(tzinfo=None)
        return f"t:{v.isoformat()}"
    if isinstance(v, dt.date):
        return f"D:{v.isoformat()}"
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(canon_cell_strict(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, dict):
        return (
            "{"
            + ",".join(
                f"{k}:{canon_cell_strict(x)}" for k, x in sorted(v.items())
            )
            + "}"
        )
    return str(v)


def canon_rows(
    columns: list[str], rows: list[tuple], strict: bool = False
) -> list[tuple[str, ...]]:
    """Sort columns by name (driver behavior), canonicalize, sort rows."""
    cell = canon_cell_strict if strict else canon_cell
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(cell(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def compare_results(
    spark_cols: list[str],
    spark_rows: list[tuple],
    oracle_cols: list[str],
    oracle_rows: list[tuple],
    strict: bool = False,
) -> None:
    """Raise AssertionError with a focused diff on any mismatch."""
    assert sorted(spark_cols) == sorted(oracle_cols), (
        f"schema mismatch:\n  spark : {sorted(spark_cols)}\n  oracle: {sorted(oracle_cols)}"
    )
    assert len(spark_rows) == len(oracle_rows), (
        f"row count mismatch: spark={len(spark_rows)} oracle={len(oracle_rows)}"
    )
    s = canon_rows(spark_cols, spark_rows, strict=strict)
    o = canon_rows(oracle_cols, oracle_rows, strict=strict)
    if s != o:
        only_s = [r for r in s if r not in set(o)][:5]
        only_o = [r for r in o if r not in set(s)][:5]
        raise AssertionError(
            "value mismatch (sorted cols: "
            f"{sorted(spark_cols)}):\n  only in spark : {only_s}\n  only in oracle: {only_o}"
        )
