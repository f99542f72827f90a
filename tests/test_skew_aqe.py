"""AQE skew handling: a pathologically hot join key must be split at runtime
(OptimizeSkewedJoin) — the mechanism PLANS.md leans on for hot LSH buckets.
Thresholds are lowered so fixture-scale data exhibits 'skew' the way a 100 TB
key would against production defaults."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def skew_conf(spark):
    keys = (
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        "spark.sql.adaptive.coalescePartitions.minPartitionSize",
    )
    prev = {k: spark.conf.get(k) for k in keys}
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.2")
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB"
    )
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.minPartitionSize", "1KB")
    yield spark
    for k, v in prev.items():
        spark.conf.set(k, v)


def test_aqe_splits_skewed_join_partition(skew_conf):
    spark = skew_conf
    # 200k rows on key 0 vs ~40 rows on each of 5000 other keys
    left = spark.range(0, 240_000).select(
        F.when(F.col("id") < 200_000, 0).otherwise(F.col("id") % 5000).alias("k"),
        F.col("id").alias("v"),
    )
    right = spark.range(0, 5000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("w")
    )
    joined = left.join(right, "k")
    # collect() executes the DataFrame's own QueryExecution (count() would
    # build a different plan object, leaving this one un-finalized)
    assert len(joined.collect()) == 240_000
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    assert "skew=true" in plan, plan[:2000]


def test_skewed_join_result_correct_under_aqe(skew_conf):
    spark = skew_conf
    left = spark.range(0, 50_000).select(
        F.when(F.col("id") < 40_000, 0).otherwise(F.col("id") % 100).alias("k"),
        F.lit(1).alias("one"),
    )
    right = spark.range(0, 100).select(F.col("id").alias("k"), F.lit(10).alias("ten"))
    total = left.join(right, "k").agg(F.sum(F.col("one") * F.col("ten"))).collect()[0][0]
    assert total == 50_000 * 10
