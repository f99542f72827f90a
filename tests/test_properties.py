"""Property-based tests (hypothesis) for the engine's invariant-bearing
primitives, plus the `observe()` instrumentation surface.

Spark jobs are slow relative to hypothesis's defaults, so examples are
bounded and deadlines disabled; the point is randomized *structure* (key
distributions, duplicate patterns), not volume.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Observation
from pyspark.sql import functions as F

from gridiron_spark.sampling import sample_exact_n

_KEYS = st.lists(
    st.tuples(st.integers(0, 30), st.integers(0, 5)), min_size=1, max_size=60
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=_KEYS, n=st.integers(1, 20), seed=st.integers(0, 2**31 - 1))
def test_sample_exact_n_invariants(spark, rows, n, seed):
    df = spark.createDataFrame(rows, "gameId int, playId int")
    distinct = {tuple(r) for r in rows}
    out1 = [tuple(r) for r in sample_exact_n(df, ["gameId", "playId"], n, seed).collect()]
    # exact size: min(n, |distinct keys|) — the reference's return-all fallback
    assert len(out1) == min(n, len(distinct))
    # sampled keys are real distinct keys, no duplicates
    assert len(set(out1)) == len(out1)
    assert set(out1) <= distinct
    # seeded-deterministic: same seed → same keys regardless of partitioning
    out2 = [
        tuple(r)
        for r in sample_exact_n(
            df.repartition(7), ["gameId", "playId"], n, seed
        ).collect()
    ]
    assert sorted(out1) == sorted(out2)


def test_observe_metrics_single_pass(spark):
    """`observe()` attaches aggregates to a plan node: metrics accumulate
    DURING the action — pipeline instrumentation with zero extra scans
    (the scale-correct replacement for calling .count() on intermediates)."""
    obs = Observation("ingest_metrics")
    df = (
        spark.range(1000)
        .withColumn("v", F.col("id") * 2)
        .observe(
            obs,
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("v").alias("v_total"),
        )
        .filter(F.col("id") % 2 == 0)
    )
    n_after = df.count()
    # the observation saw pre-filter rows: it measured the observed node
    assert obs.get["n_rows"] == 1000
    assert obs.get["v_total"] == 999 * 1000
    assert n_after == 500
