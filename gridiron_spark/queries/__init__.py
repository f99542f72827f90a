"""Query catalog: every operator from SURVEY.md §2, paired with its DuckDB oracle.

Each entry registers (a) a Spark implementation ``(spark, sf_dir) -> DataFrame``
and (b) an equivalent ANSI-SQL string the driver runs in DuckDB over the same
parquet tables. The two are hash-compared (columns sorted by name,
order-insensitive value hash), so every computed column is aliased identically
on both sides and all double aggregation goes through decimal-safe helpers
(see gridiron_spark.functions.decimal_safe).

Queries whose semantics are not SQL-expressible (streaming state, grouped-map
tensorization, LSH) register with ``oracle=None`` → the driver records a
weaker rows-only check.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class CatalogEntry:
    name: str
    spark_fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    survey_ref: str  # SURVEY.md §2 operator ids this query covers


_CATALOG: dict[str, CatalogEntry] = {}

# modules that register queries on import. ORDER MATTERS for external
# verification: the driver hash-checks the first 50 catalog entries in
# registration order. Rounds 1-2 verified parity/analytics/text/dedup/
# similarity/streaming_batch/multimodal/tensor (+6 of advanced); this round
# rotates tpch_extra/advanced/scale/tpch_final to the front so the
# never-checked half of the catalog gets driver-verified rows.
_QUERY_MODULES = (
    "gridiron_spark.queries.tpch_extra",
    "gridiron_spark.queries.advanced",
    "gridiron_spark.queries.scale",
    "gridiron_spark.queries.tpch_final",
    "gridiron_spark.queries.parity",
    "gridiron_spark.queries.analytics",
    "gridiron_spark.queries.text",
    "gridiron_spark.queries.dedup",
    "gridiron_spark.queries.similarity",
    "gridiron_spark.queries.streaming_batch",
    "gridiron_spark.queries.multimodal",
    "gridiron_spark.queries.tensor",
)


def register(name: str, *, oracle: str | None, survey: str):
    """Decorator: add a query to the catalog."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in _CATALOG:
            raise ValueError(f"duplicate query name: {name}")
        _CATALOG[name] = CatalogEntry(name, fn, oracle, survey)
        return fn

    return deco


def catalog() -> dict[str, CatalogEntry]:
    for mod in _QUERY_MODULES:
        importlib.import_module(mod)
    return dict(_CATALOG)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: e.spark_fn for name, e in catalog().items()}


def oracle_sql() -> dict[str, str]:
    return {name: e.oracle for name, e in catalog().items() if e.oracle is not None}
