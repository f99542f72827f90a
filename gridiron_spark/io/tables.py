"""Loaders for the driver's synthetic parquet tables (TESTDATA.md).

Mirrors the reference's lazy "pool scan" pattern (reference src/query.py:18-24
builds a LazyFrame over a parquet glob; here ``spark.read.parquet`` gives the
same deferred semantics). All reads are plain columnar parquet scans so
Catalyst's filter pushdown / column pruning apply.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# The events table is written with TIMESTAMP(NANOS, isAdjustedToUTC=false),
# which Spark's parquet reader rejects outright (PARQUET_TYPE_ILLEGAL). The
# supported escape hatch reads nano timestamps as epoch-nanos LongType. It is a
# runtime-settable SQLConf, so we can flip it on the session the driver hands
# us without controlling session construction.
_NANOS_AS_LONG = "spark.sql.legacy.parquet.nanosAsLong"


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one synthetic table; normalizes the events timestamp.

    ``events`` comes back with its raw nano clock plus two derived columns:
    ``ts_us`` (epoch microseconds, bigint — the canonical cross-engine form;
    DuckDB timestamps are µs so nanos are not oracle-representable) and
    ``ts_ts`` (TimestampType, µs precision) for window/streaming operators.
    """
    path = f"{sf_dir}/{name}.parquet"
    if name == "events":
        spark.conf.set(_NANOS_AS_LONG, "true")
        df = spark.read.parquet(path)
        if dict(df.dtypes)["ts"] == "bigint":
            # integer div, not `/1000`: double division rounds at int64 scale
            ts_us = F.expr("ts div 1000")
        else:
            # Spark >= 4.1 reads TIMESTAMP(NANOS) natively as timestamp_ntz
            # (µs precision, nanos truncated — matching DuckDB's µs clock).
            # timestampdiff against an NTZ epoch literal is session-timezone
            # independent; unix_timestamp() would truncate to whole seconds
            # AND coerce through the session tz.
            ts_us = F.expr(
                "timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', ts)"
            )
        return df.withColumn("ts_us", ts_us).withColumn(
            "ts_ts", F.timestamp_micros(F.col("ts_us"))
        )
    return spark.read.parquet(path)


def fan_out(df: DataFrame, parallelism: int | None = None) -> DataFrame:
    """Round-robin repartition a *pre-fan-out* input so a downstream explode
    parallelizes — only when the scan is under-partitioned.

    A small parquet file scans as one partition, and explode/posexplode is a
    narrow transformation, so a k-gram fan-out (×300 rows) inherits the
    single task: the whole generation stage runs serially (measured 4× on
    winnow_fingerprint at sf0.1). Repartitioning the compact pre-explode rows
    costs one shuffle of the raw text bytes — tiny relative to the exploded
    output — and buys full-cluster parallelism for the generation stage.

    At 100 TB the guard makes this a no-op: a large table already scans with
    >= cluster parallelism partitions, so no shuffle is added.
    """
    if parallelism is None:
        parallelism = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= parallelism:
        return df
    return df.repartition(parallelism)
