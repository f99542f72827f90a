"""Data-layout operators: Z-order (Morton) clustering for multi-dimensional
file skipping — the lakehouse optimization (Delta OPTIMIZE ZORDER BY,
Iceberg sort orders) that makes min/max pruning work on MORE than one
column at 100 TB.

A linear sort clusters one column perfectly and the second not at all; the
Z-order curve interleaves the bits of both keys so every contiguous range
of the sort covers a small RECTANGLE in (custkey × day) space. Files
written in Z-order then carry tight min/max stats on BOTH dimensions, and
a scan with a predicate on either column prunes most files. The query
proves the property the layout exists for: per-bucket (file-sized run of
the Z-sorted order) min/max spans on both dimensions, hash-checked exactly.

Reference parity: the reference engine has no layout surface; this is the
write-side complement of the partitioned sink (queries/sinks.py S5).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from gridiron_spark.io.tables import load_table
from gridiron_spark.queries import register

_BITS = 12          # 12 bits per dimension: custkey ≤ 1499, day ≤ ~2400
_BUCKET_SHIFT = 14  # bucket = zval >> 14 → ≤ 2^10 buckets, 128×128 tiles
_EPOCH = "1995-01-01"


def _interleave_sql(ck: str, dd: str, div_op: str) -> str:
    """Bit-interleave via pure integer arithmetic — identical text modulo
    the engine's integer-division operator, so Spark and DuckDB evaluate
    the same formula. Bit i of ck lands at position 2i, of dd at 2i+1."""
    terms = []
    for i in range(_BITS):
        terms.append(f"(({ck} {div_op} {1 << i}) % 2) * {1 << (2 * i)}")
        terms.append(f"(({dd} {div_op} {1 << i}) % 2) * {1 << (2 * i + 1)}")
    return " + ".join(terms)


@register(
    "zorder_layout_sort",
    survey="NS-layout(Z-order/Morton clustering for 2-D file skipping),A3-A6",
    oracle=f"""
WITH k AS (
    SELECT o_custkey AS ck,
           date_diff('day', DATE '{_EPOCH}', CAST(o_orderdate AS DATE)) AS dd
    FROM orders
),
z AS (
    SELECT ck, dd,
           CAST({_interleave_sql("ck", "dd", "//")} AS BIGINT) AS zval
    FROM k
)
SELECT CAST(zval // {1 << _BUCKET_SHIFT} AS BIGINT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(MIN(ck) AS BIGINT) AS ck_min,
       CAST(MAX(ck) AS BIGINT) AS ck_max,
       CAST(MIN(dd) AS BIGINT) AS dd_min,
       CAST(MAX(dd) AS BIGINT) AS dd_max
FROM z
GROUP BY bucket
""",
)
def zorder_layout_sort(spark, sf_dir):
    """Z-order layout pass over ``orders``: Morton-interleave
    (o_custkey, epoch-day(o_orderdate)) into a 24-bit zval and reduce each
    file-sized run of the Z-sorted order (bucket = zval >> 14, a 128×128
    tile) to the min/max stats a lakehouse writer would persist per file.
    Tight ck/dd spans per bucket — versus a 1-D sort where the second
    dimension's span is the full domain — IS the file-skipping property;
    the hash check pins it exactly.

    Scale shape: the interleave is a pure integer map (whole-stage
    codegen, no UDF — day arithmetic by datediff, never a session-tz
    epoch); the bucket reduction is ONE map-side-combined aggregate whose
    output is bounded by 2^(2·12−14) = 1024 rows regardless of corpus
    size. The real write path is ``.repartitionByRange(n, zval)`` +
    per-file stats — repartitionByRange samples the zval distribution, so
    file sizes stay balanced even on skewed keys."""
    day = F.datediff(
        "o_orderdate", F.lit(_EPOCH).cast("date")
    ).cast("bigint")
    k = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("ck"), day.alias("dd")
    )
    z = k.select(
        "ck",
        "dd",
        F.expr(_interleave_sql("ck", "dd", "div")).cast("bigint").alias("zval"),
    )
    return (
        z.select("ck", "dd", F.expr(f"zval div {1 << _BUCKET_SHIFT}").alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.min("ck").cast("bigint").alias("ck_min"),
            F.max("ck").cast("bigint").alias("ck_max"),
            F.min("dd").cast("bigint").alias("dd_min"),
            F.max("dd").cast("bigint").alias("dd_max"),
        )
    )
