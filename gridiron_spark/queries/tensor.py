"""Grouped-map tensorization on driver tables (rows-only check).

The long→wide pivot (operators/tensorize.py, reference
docs/DATA_LAKE_GUIDE.md:73-109) is inherently non-SQL output (nested 3-D
float arrays), so this entry takes the driver's weaker rows-only check; its
numeric correctness is pytest-covered on tracking-shaped fixtures
(tests/test_features.py)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from gridiron_spark.io.tables import load_table
from gridiron_spark.operators.tensorize import tensorize_plays
from gridiron_spark.queries import register


@register(
    "grouped_map_tensorize",
    survey="§2.9 grouped-map pandas UDF (long→wide tensor) — rows-only",
    oracle=None,
)
def grouped_map_tensorize(spark, sf_dir):
    """Events recast into the tracking shape (entity-frame time series), then
    tensorized per (user, lane) group via applyInPandas — one shuffle on the
    group key, per-group pivot inside Arrow batches, nothing on the driver."""
    # a 1-in-20 user subset: the entry demonstrates the grouped-map plan
    # (shuffle → per-group Arrow pivot), not a full-corpus materialization —
    # unsubsetted, the 3-D output dominates runtime without adding coverage
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") % 20 == 0)
    w = Window.partitionBy("user_id", F.expr("event_id % 8")).orderBy(
        "ts_us", "event_id"
    )
    tracking_shaped = ev.select(
        F.col("user_id").alias("gameId"),
        (F.col("event_id") % 8).cast("int").alias("playId"),
        F.when(F.col("event_id") % 23 == 0, None)
        .otherwise(F.col("event_id") % 23)
        .cast("int")
        .alias("nflId"),
        F.row_number().over(w).alias("frameId"),
        F.col("value").cast("float").alias("x"),
        (F.col("ts_us") % 1000).cast("float").alias("y"),
        F.col("value").cast("float").alias("s"),
        F.lit(0.0).cast("float").alias("a"),
    )
    return tensorize_plays(tracking_shaped, max_frames=16, max_players=23)
