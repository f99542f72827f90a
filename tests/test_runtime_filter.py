"""Runtime bloom-filter join pruning — scale evidence.

At 100 TB the win is pre-shuffle pruning: when a selective dimension filter
makes the build side small, Spark can inject a bloom filter of the build-side
join keys into the FACT side's scan stage, dropping non-matching rows BEFORE
the shuffle (`spark.sql.optimizer.runtime.bloomFilter.enabled`). Locally the
size thresholds (10 GB application side) never trigger, so this test lowers
the application-side threshold to prove the engine's plans are eligible —
i.e. the rewrite fires on our join shapes when the cluster-scale conditions
hold.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_ORACLE

_CONFS = {
    # force a shuffle join: broadcast would bypass the runtime filter
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "10GB",
    # the local fact table is tiny; at cluster scale this is the real 10GB
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
}


@pytest.fixture()
def filter_confs(spark):
    prev = {k: spark.conf.get(k, None) for k in _CONFS}
    for k, v in _CONFS.items():
        spark.conf.set(k, v)
    yield
    for k, v in prev.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_bloom_filter_prunes_fact_before_shuffle(spark, filter_confs):
    li = spark.read.parquet(f"{SF_ORACLE}/lineitem.parquet")
    o = spark.read.parquet(f"{SF_ORACLE}/orders.parquet").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    j = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderpriority")
        .count()
    )
    rows = j.collect()
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "might_contain" in plan, "bloom runtime filter was not injected"
    assert "xxhash64(l_orderkey" in plan, "filter must probe the FACT side key"
    # correctness unaffected by the rewrite
    o_cnt = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey")).count()
    )
    assert rows[0]["count"] == o_cnt
