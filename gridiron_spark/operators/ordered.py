"""Per-group ordered scans (running totals, global numbering) at scale.

The recurring problem: a cumulative window ``PARTITION BY group ORDER BY ord``
puts each group's ENTIRE extent on one task — fatal when groups are few and
corpus-sized (length buckets, data sources). The scale-correct shape is the
one ``ranged_global_sort`` pioneered (queries/tpch_extra.py), generalized here
per group: sample-based range exchange on (group, ord), a per-(partition,
group) local scan, and a broadcast prefix-sum offset table of
|partitions × groups| rows. Parallelism stays |partitions| regardless of how
few groups there are.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def grouped_running_sum(
    df: DataFrame,
    group_cols: Sequence[str],
    order_cols: Sequence[str],
    value_col: str,
    out_col: str = "running_sum",
    num_partitions: int = 16,
    reliable_checkpoint: bool = False,
) -> DataFrame:
    """Inclusive running SUM(value_col) per group in (order_cols) order,
    without ever putting a whole group on one task.

    repartitionByRange draws sample-based boundaries over (group, ord) so
    partitions stay even; spark_partition_id is materialized immediately
    after the exchange and the frame is checkpointed — the plan forks into
    the local-scan and offsets branches, and two independent executions of
    the range exchange could draw DIFFERENT boundaries. Default is a lazy
    localCheckpoint (fast, executor-local blocks — right for local mode and
    short-lived jobs); pass ``reliable_checkpoint=True`` on a real cluster
    so executor loss re-reads the pinned frame from the configured
    ``spark.sparkContext.setCheckpointDir`` storage instead of failing the
    job mid-query. The offsets table has |partitions × groups| rows, so its
    own prefix-sum window is free and its broadcast is bounded.
    """
    gcols = list(group_cols)
    ocols = list(order_cols)
    exchanged = df.repartitionByRange(
        num_partitions, *gcols, *ocols
    ).withColumn("_pid", F.spark_partition_id())
    if reliable_checkpoint:
        if df.sparkSession.sparkContext.getCheckpointDir() is None:
            raise ValueError(
                "grouped_running_sum(reliable_checkpoint=True) requires "
                "spark.sparkContext.setCheckpointDir(...) to be set"
            )
        srt = exchanged.checkpoint(eager=False)
    else:
        srt = exchanged.localCheckpoint(eager=False)
    local = srt.withColumn(
        "_local_sum",
        F.sum(value_col).over(
            Window.partitionBy("_pid", *gcols)
            .orderBy(*ocols)
            .rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    offsets = (
        local.groupBy(*gcols, "_pid")
        .agg(F.sum(value_col).alias("_n"))
        .select(
            *gcols,
            "_pid",
            F.sum("_n")
            .over(
                Window.partitionBy(*gcols)
                .orderBy("_pid")
                .rowsBetween(Window.unboundedPreceding, -1)
            )
            .alias("_off"),
        )
    )
    return (
        local.join(F.broadcast(offsets), [*gcols, "_pid"])
        .withColumn(
            out_col, F.col("_local_sum") + F.coalesce(F.col("_off"), F.lit(0))
        )
        .drop("_pid", "_local_sum", "_off")
    )
