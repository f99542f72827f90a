"""Cross-engine deterministic numeric aggregation.

Summing doubles is order-dependent, and Spark's shuffle order differs from any
other engine's scan order — so ``SUM(double)`` can never hash-match an oracle.
The fix: route aggregates through fixed-point ``DECIMAL(18,6)``. Decimal
addition is exact and associative, so Spark's partial/final aggregation and
DuckDB's single-pass sum produce the *identical* value; one final cast to
double is then bit-identical in both engines.

The SQL mirror of each helper is documented so oracle strings stay in lockstep.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(18,6)"


def dec(c: Column | str) -> Column:
    """``CAST(c AS DECIMAL(18,6))``."""
    c = F.col(c) if isinstance(c, str) else c
    return c.cast(DEC)


def dsum(c: Column | str, alias: str) -> Column:
    """Exact sum → double. SQL: ``CAST(SUM(CAST(c AS DECIMAL(18,6))) AS DOUBLE)``."""
    return F.sum(dec(c)).cast("double").alias(alias)


def dmean(c: Column | str, alias: str) -> Column:
    """Exact-sum mean → double: one double division at the end.

    SQL: ``CAST(SUM(CAST(c AS DECIMAL(18,6))) AS DOUBLE) / COUNT(c)``.
    """
    c = F.col(c) if isinstance(c, str) else c
    return (F.sum(dec(c)).cast("double") / F.count(c)).alias(alias)
