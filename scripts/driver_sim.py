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
    ap.add_argument(
        "--changed-since",
        action="store_true",
        help=(
            "run only queries whose fingerprint (builder source + "
            "oracle SQL + cast-map wrapper) differs from the last "
            "green manifest (.driver_sim_green.json) — the fast "
            "per-commit gate; the full run stays the pre-push gate. "
            "Every passing query refreshes its manifest entry either "
            "way."
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

    # Fingerprints: a query re-runs iff its observable definition
    # changed — builder SOURCE, raw oracle, the cast-map-wrapped
    # oracle actually served to DuckDB, or ANY package module the
    # builder's module (transitively) depends on. The dependency
    # closure is what makes helper edits (qgram_fuzzy_pairs,
    # connected_components, dialect rewrites, _determinism…) visible:
    # without it the fast gate kept stale greens after helper changes.
    import hashlib
    import inspect
    import json
    import re

    from mkpipe_extractor_clickhouse_spark.registry import all_specs

    manifest_path = REPO / ".driver_sim_green.json"
    PKG = "mkpipe_extractor_clickhouse_spark"
    _mod_src: dict[str, str] = {}

    def _module_hash(modname: str) -> str:
        h = _mod_src.get(modname)
        if h is None:
            mod = sys.modules.get(modname)
            try:
                src = inspect.getsource(mod) if mod else ""
            except (OSError, TypeError):
                src = ""
            h = hashlib.sha256(src.encode()).hexdigest()[:16]
            _mod_src[modname] = h
        return h

    def _dep_closure(root_modname: str) -> list[str]:
        """Package-internal modules reachable from a module's globals
        (imported modules + the defining modules of imported callables),
        transitively — the helpers whose edits must re-run the query."""
        seen: set[str] = set()
        stack = [root_modname]
        while stack:
            mn = stack.pop()
            if mn in seen or not mn.startswith(PKG):
                continue
            mod = sys.modules.get(mn)
            if mod is None:
                continue
            # PACKAGE modules (__init__) are excluded from the
            # closure: the operators package imports every operator
            # module for registration, so traversing through it would
            # make every edit invalidate every query (the gate would
            # be safe but useless). Logic lives in leaf modules here;
            # `from .x import y` edges to those are followed directly.
            if hasattr(mod, "__path__"):
                continue
            seen.add(mn)
            for v in vars(mod).values():
                if inspect.ismodule(v):
                    dep = v.__name__
                else:
                    dep = getattr(v, "__module__", None)
                if isinstance(dep, str) and dep.startswith(PKG):
                    stack.append(dep)
            # Function-BODY relative imports (lazy `from .x import y`)
            # never reach module globals — recover them from source.
            try:
                msrc = inspect.getsource(mod)
            except (OSError, TypeError):
                msrc = ""
            pkg_parts = mn.split(".")[:-1]  # module's own package
            for dots, relmod in re.findall(
                r"^\s*from\s+(\.+)([\w.]*)\s+import", msrc, re.MULTILINE
            ):
                base = pkg_parts[: len(pkg_parts) - (len(dots) - 1)]
                target = ".".join(base + ([relmod] if relmod else []))
                # `from .x import y`: y may be a module or an attr —
                # push the module candidate; unknown names fall out at
                # the sys.modules lookup (the parent package is NOT
                # pushed — packages are excluded above).
                stack.append(target)
        return sorted(seen)

    # Package __init__ modules are EXCLUDED from the per-query closure
    # (traversing the registration hub would invalidate everything on
    # any edit) — but logic added to one must still be visible to the
    # gate. Hash every __init__.py into ONE global salt: an __init__
    # edit invalidates the whole manifest (rare, correct), while leaf
    # edits keep their narrow per-query invalidation.
    init_hash = hashlib.sha256()
    pkg_dir = REPO / PKG
    for p in sorted(pkg_dir.rglob("__init__.py")):
        init_hash.update(str(p.relative_to(REPO)).encode())
        init_hash.update(b"\x00")
        init_hash.update(p.read_bytes())
    init_salt = init_hash.hexdigest()[:16]

    fps: dict[str, str] = {}
    for n, spec in all_specs().items():
        try:
            src = inspect.getsource(spec.builder)
        except OSError:
            src = repr(spec.builder)
        deps = _dep_closure(getattr(spec.builder, "__module__", "") or "")
        dep_blob = "\x00".join(f"{d}={_module_hash(d)}" for d in deps)
        fps[n] = hashlib.sha256(
            (
                src
                + "\x00"
                + (spec.oracle or "")
                + "\x00"
                + osql.get(n, "")
                + "\x00"
                + dep_blob
                + "\x00"
                + init_salt
            ).encode()
        ).hexdigest()[:16]
    if args.changed_since:
        try:
            green = json.loads(manifest_path.read_text())
        except (OSError, ValueError):
            green = {}
        names = [n for n in names if green.get(n) != fps.get(n)]
        print(
            f"== changed-since: {len(names)} of {len(qs)} queries differ "
            f"from the green manifest"
        )
    n_pass = n_fail = n_rows_only = 0
    failures = []
    passed: list[str] = []
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, args.sf_dir)
            # The real driver canonicalizes via a pandas multi-key
            # sort_values, which cannot factorize list/dict cells
            # (round-7 crash on ch_moving_*_array) — forbid complex
            # output types registry-wide, before any comparison.
            from pyspark.sql import types as T

            for fld in sdf.schema.fields:
                assert not isinstance(
                    fld.dataType, (T.ArrayType, T.MapType, T.StructType)
                ), (
                    f"{name}.{fld.name}: complex output type "
                    f"{fld.dataType.simpleString()} — the round driver's "
                    f"pandas sort crashes on list cells; serialize to a "
                    f"string (a8_collect_list pattern)"
                )
            if name not in osql:
                # Rows-only contract (no oracle): the real driver's check
                # is row count + stable schema — materializing the full
                # result to the 1g default-config driver is NOT part of
                # the contract and dies on inherently pair-sized outputs
                # (r11 sf0.1 canary: l2b's documented 4.5 M-pair clique
                # expansion hit TaskResultLost in toArrow while its
                # bounded twin l2b_portable MATCHed). Count distributes;
                # the schema asserts above already ran.
                assert len(sdf.columns) == len(set(sdf.columns))
                n_rows_only += 1
                status = f"rows-only ({sdf.count()} rows)"
                passed.append(name)
                print(f"   {name}: {status} [{time.time() - t0:.1f}s]")
                continue
            if args.strict:
                stab = sdf.toArrow()
                scols = list(stab.column_names)
                scells = [c.to_pylist() for c in stab.columns]
                srows = list(zip(*scells)) if scells else []
            else:
                srows = [tuple(r) for r in sdf.collect()]
                scols = list(sdf.columns)
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
            passed.append(name)
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
    # Only STRICT passes at the driver's sf certify a green-manifest
    # entry — the looser modes would let a type-level regression hide
    # from the next --changed-since run.
    if args.strict and args.sf_dir == "/root/testdata/sf0.01" and passed:
        try:
            green = json.loads(manifest_path.read_text())
        except (OSError, ValueError):
            green = {}
        green.update({n: fps[n] for n in passed if n in fps})
        manifest_path.write_text(json.dumps(green, indent=0, sort_keys=True) + "\n")
        print(f"== green manifest: {len(passed)} entries refreshed")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
