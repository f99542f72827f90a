"""Scale-technique operator properties: salting changes the plan, never the
result; IVF trades recall for probe count in the documented direction."""

from __future__ import annotations

from pyspark.sql import functions as F

from gridiron_spark.functions.decimal_safe import dec
from gridiron_spark.io.tables import load_table
from gridiron_spark.operators.similarity import ivf_topk
from gridiron_spark.operators.skew import salted_agg
from tests.conftest import SF_ORACLE


def test_salted_agg_equals_direct(spark):
    ev = load_table(spark, SF_ORACLE, "events")
    salted = {
        r.event_type: (r.n, r.sum_value)
        for r in salted_agg(
            ev,
            keys=["event_type"],
            salt_source=F.col("event_id"),
            partial_aggs=[
                F.count(F.lit(1)).alias("n_part"),
                F.sum(dec("value")).alias("sum_part"),
            ],
            merge_aggs=[
                F.sum("n_part").alias("n"),
                F.sum("sum_part").cast("double").alias("sum_value"),
            ],
        ).collect()
    }
    direct = {
        r.event_type: (r.n, r.sum_value)
        for r in ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(dec("value")).cast("double").alias("sum_value"),
        )
        .collect()
    }
    assert salted == direct  # bit-exact: decimal merge is associative


def test_countmin_estimates_bound_true_counts(spark):
    """CMS guarantee: point estimate (min over hash rows) never undercounts,
    and overshoot stays within the N·e/w additive bound."""
    import math

    from gridiron_spark.queries.scale import _CMS_DEPTH, _CMS_WIDTH, countmin_sketch

    sketch = {}
    for r in countmin_sketch(spark, SF_ORACLE).collect():
        sketch[(r.row_i, r.bucket)] = r.cnt
    ev = load_table(spark, SF_ORACLE, "events")
    true_counts = {
        r.user_id: r.n
        for r in ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    n_total = sum(true_counts.values())
    bound = math.e * n_total / _CMS_WIDTH
    import hashlib

    for uid, true_n in true_counts.items():
        est = min(
            sketch.get(
                (
                    i,
                    int(hashlib.md5(f"{uid}|{i}".encode()).hexdigest()[:8], 16)
                    % _CMS_WIDTH,
                ),
                0,
            )
            for i in range(_CMS_DEPTH)
        )
        assert est >= true_n  # CMS never undercounts
        assert est - true_n <= bound


def test_hll_estimate_within_bound(spark):
    """HLL estimate from the register sketch lands within the standard
    ~1.04/sqrt(m) relative-error bound (with generous 3-sigma slack) of the
    true distinct count, and registers merge by cell-wise MAX."""
    import math

    from gridiron_spark.queries.scale import _HLL_BUCKETS, hll_distinct_sketch

    rows = hll_distinct_sketch(spark, SF_ORACLE).collect()
    regs = [0] * _HLL_BUCKETS
    for r in rows:
        regs[r.bucket] = r.max_rho
    m = _HLL_BUCKETS
    alpha = 0.709  # alpha_64
    raw = alpha * m * m / sum(2.0**-x for x in regs)
    zeros = regs.count(0)
    est = m * math.log(m / zeros) if (raw <= 2.5 * m and zeros) else raw
    true_n = (
        load_table(spark, SF_ORACLE, "events").select("user_id").distinct().count()
    )
    assert abs(est - true_n) / true_n < 3 * 1.04 / math.sqrt(m)

    # mergeability: sketch(first half) MAX sketch(second half) == sketch(all)
    ev = load_table(spark, SF_ORACLE, "events")
    med = ev.approxQuantile("event_id", [0.5], 0.0)[0]
    halves = [ev.filter(F.col("event_id") <= med), ev.filter(F.col("event_id") > med)]
    from gridiron_spark.queries.scale import hll_registers

    merged = [0] * m
    for h in halves:
        for r in hll_registers(h).collect():
            merged[r.bucket] = max(merged[r.bucket], r.max_rho)
    assert merged == regs


def test_approx_aggregates_within_bounds(spark):
    """The 100 TB substitutes for exact distinct/percentile: HLL++ and
    GK-sketch results must land within their documented error bounds of the
    exact answers (which the oracle'd queries pin)."""
    ev = load_table(spark, SF_ORACLE, "events")
    row = ev.agg(
        F.countDistinct("user_id").alias("exact_users"),
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
        F.expr("percentile(value, 0.5)").alias("exact_p50"),
        F.expr("approx_percentile(value, 0.5, 10000)").alias("approx_p50"),
    ).collect()[0]
    assert abs(row.approx_users - row.exact_users) / row.exact_users < 0.06
    spread = (
        ev.agg(F.max("value") - F.min("value")).collect()[0][0]
    )
    assert abs(row.approx_p50 - row.exact_p50) <= 0.01 * spread


def test_ivf_results_are_true_cosines_and_recall_monotone(spark):
    """IVF scores are exact for returned ids (only *membership* is
    approximate), and recall against brute force grows with n_probe."""
    from gridiron_spark.functions.vectors import cosine

    emb = load_table(spark, SF_ORACLE, "embeddings")
    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qvec")
    )
    brute = (
        emb.filter(F.col("vec_id") != 0)
        .join(F.broadcast(q))
        .select("vec_id", cosine(F.col("embedding"), F.col("qvec")).alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), "vec_id")
        .limit(10)
    )
    exact = {r.vec_id: r.cos_sim for r in brute.collect()}

    recalls = []
    for n_probe in (1, 3, 10):
        got = {
            r.vec_id: r.cos_sim
            for r in ivf_topk(emb, 0, k=10, centroid_stride=50, n_probe=n_probe).collect()
        }
        for vid, cs in got.items():
            if vid in exact:
                assert cs == exact[vid]  # scores never approximated
        recalls.append(len(set(got) & set(exact)) / len(exact))
    assert recalls == sorted(recalls)
    assert recalls[-1] >= 0.9  # probing all 10 lists ≈ exhaustive
