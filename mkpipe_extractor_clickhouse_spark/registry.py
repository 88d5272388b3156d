"""Query registry: the single source of truth for the declared surface.

Every implemented operator from SURVEY.md §2 registers a ``QuerySpec``
binding (a) a Spark DataFrame builder ``(spark, sf_dir) -> DataFrame``
and (b) the equivalent ANSI SQL string the DuckDB oracle runs on the same
parquet tables — or ``oracle=None`` for non-SQL-expressible operators
(weaker rows-only check).

``__spark_entry__.py`` derives its ``queries()`` / ``oracle_sql()``
contract dicts from this registry; the pytest parity harness
(tests/test_parity.py) runs the exact same comparison locally so the
driver's correctness gate is never a surprise.

Determinism rules enforced by convention here (SURVEY §5.5):
  * every computed column is aliased identically in Spark and SQL;
  * double aggregations go through ``dsum``-style decimal casts
    (operators/_determinism.py) so results are exact and order-independent;
  * LIMIT queries are totally ordered by a unique key.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]

# Modules that register QuerySpecs on import.
_OPERATOR_MODULES = [
    "mkpipe_extractor_clickhouse_spark.operators.scans",
    "mkpipe_extractor_clickhouse_spark.operators.filters",
    "mkpipe_extractor_clickhouse_spark.operators.joins",
    "mkpipe_extractor_clickhouse_spark.operators.aggregates",
    "mkpipe_extractor_clickhouse_spark.operators.windows",
    "mkpipe_extractor_clickhouse_spark.operators.sorts",
    "mkpipe_extractor_clickhouse_spark.operators.setops",
    "mkpipe_extractor_clickhouse_spark.functions.scalar",
    "mkpipe_extractor_clickhouse_spark.functions.udf",
    "mkpipe_extractor_clickhouse_spark.operators.subqueries",
    "mkpipe_extractor_clickhouse_spark.operators.llm_dedup",
    "mkpipe_extractor_clickhouse_spark.operators.llm_similarity",
    "mkpipe_extractor_clickhouse_spark.operators.llm_text",
    "mkpipe_extractor_clickhouse_spark.operators.llm_curation",
    "mkpipe_extractor_clickhouse_spark.operators.multimodal",
    "mkpipe_extractor_clickhouse_spark.operators.extract_parity",
    "mkpipe_extractor_clickhouse_spark.operators.skew",
    "mkpipe_extractor_clickhouse_spark.operators.analytics",
    "mkpipe_extractor_clickhouse_spark.operators.funnel",
    "mkpipe_extractor_clickhouse_spark.streaming.batch_equiv",
]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    builder: Builder
    oracle: str | None  # DuckDB ANSI SQL, or None → rows-only check
    tags: tuple[str, ...] = ()
    doc: str = ""
    bench: bool = False  # include in bench.py headline set


_REGISTRY: dict[str, QuerySpec] = {}
_loaded = False


def register(
    name: str,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
    bench: bool = False,
) -> Callable[[Builder], Builder]:
    """Decorator: register a query builder under ``name``."""

    def deco(fn: Builder) -> Builder:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = QuerySpec(
            name=name,
            builder=fn,
            oracle=oracle,
            tags=tuple(tags),
            doc=(fn.__doc__ or "").strip(),
            bench=bench,
        )
        return fn

    return deco


def _load_modules() -> None:
    global _loaded
    if _loaded:
        return
    for mod in _OPERATOR_MODULES:
        importlib.import_module(mod)
    _loaded = True


def all_specs() -> dict[str, QuerySpec]:
    _load_modules()
    return dict(_REGISTRY)


def queries() -> dict[str, Builder]:
    return {name: spec.builder for name, spec in all_specs().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle
        for name, spec in all_specs().items()
        if spec.oracle is not None
    }


def bench_specs() -> dict[str, QuerySpec]:
    return {n: s for n, s in all_specs().items() if s.bench}
