"""Lake compaction — the small-file maintenance pass a partitioned lake
needs at scale.

Streaming ingest, per-batch appends, and concurrent writers fragment Hive
partitions into many small files; at 100 TB that means scan task counts in
the millions and parquet footer overhead dominating I/O. Compaction rewrites
each partition's rows into one (or few) files, optionally sorted on filter
columns so parquet row-group min/max statistics prune reads
(poor-man's clustering; same goal as Z-ordering).

The reference keeps exactly one file per game by construction
(src/ingest.py:82-87 fixed-filename overwrite); this pass restores that
invariant for lakes written by engines that append.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def compact_pool(
    spark: SparkSession,
    pool: str,
    partition_cols: Sequence[str] = ("season", "gameId"),
    sort_by: Sequence[str] | None = None,
) -> DataFrame:
    """Rewrite the lake so each Hive partition holds one file.

    ``repartition(*partition_cols)`` clusters every partition's rows into a
    single task (distinct partition-value tuples may share a task — the
    writer still splits them into their own directories/files), so the
    rewrite shuffles each row exactly once and writes exactly one file per
    partition. ``sort_by`` orders rows *within* each rewritten file so
    row-group statistics become selective for those columns.

    Dynamic partition overwrite replaces only partitions that have data —
    the same per-partition upsert semantics as ingest, so a partial
    compaction (filtered input) is safe.

    Returns the compacted lake's lazy scan (for verification).
    """
    df = spark.read.option("basePath", pool).parquet(pool)
    clustered = df.repartition(*partition_cols)
    if sort_by:
        clustered = clustered.sortWithinPartitions(*partition_cols, *sort_by)
    (
        clustered.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*partition_cols)
        .parquet(pool)
    )
    return spark.read.option("basePath", pool).parquet(pool)
