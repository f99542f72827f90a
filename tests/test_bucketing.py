"""Bucketed co-located joins: the 100 TB answer to repeated big-big joins.

Broadcast works when one side is small; when both sides are fact-scale and
the join recurs (orders ⋈ lineitem on orderkey every day), bucketing both
tables by the join key at write time removes the shuffle from every future
join. This test proves the engine actually achieves that: the bucketed join
plan contains NO Exchange on either side, and results equal the plain join.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gridiron_spark.io.tables import load_table
from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    wh = tmp_path_factory.mktemp("warehouse")
    o = load_table(spark, SF_SMALL, "orders")
    li = load_table(spark, SF_SMALL, "lineitem")
    for name, df, key in (("b_orders", o, "o_orderkey"), ("b_lineitem", li, "l_orderkey")):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            df.write.bucketBy(8, key)
            .sortBy(key)
            .option("path", f"{wh}/{name}")
            .mode("overwrite")
            .saveAsTable(name)
        )
    return spark


def test_bucketed_join_has_no_exchange(bucketed):
    spark = bucketed
    # broadcast off: at fixture scale the planner would broadcast (and skip
    # the bucketed scan entirely) — the big-big SMJ path is what bucketing
    # exists for, so that's the plan under test
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("b_orders").join(
            spark.table("b_lineitem"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan  # co-located: bucket layout replaces shuffle


def test_bucketed_join_results_match_plain_join(bucketed):
    spark = bucketed
    via_buckets = (
        spark.table("b_orders")
        .join(spark.table("b_lineitem"), F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    o = load_table(spark, SF_SMALL, "orders")
    li = load_table(spark, SF_SMALL, "lineitem")
    plain = (
        o.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert {tuple(r) for r in via_buckets.collect()} == {
        tuple(r) for r in plain.collect()
    }
