"""Behavior + plan-shape tests for the model-based data-selection family
(queries/selection.py): CCNet perplexity filtering, DSIR importance
resampling, and robust median/MAD outlier pruning.

Oracle parity (test_oracle_parity.py) pins cross-engine equality; these
tests pin the SEMANTICS (a planted junk/clean corpus separates) and the
SCALE shape (scoring is a zero-exchange map; the only wide step DSIR is
allowed is its final top-N)."""

from __future__ import annotations

import re

import numpy as np
import pytest

from pyspark.sql import functions as F

from gridiron_spark.operators.lm import (
    dsir_logratio_table,
    table_fold,
    unigram_nlp_table,
)
from gridiron_spark.operators.quality_model import feature_array, tokens_expr
from gridiron_spark.queries import catalog
from tests.conftest import SF_SMALL

_CATALOG = catalog()


def _plan_of(spark, name: str) -> str:
    df = _CATALOG[name].spark_fn(spark, SF_SMALL)
    return df._jdf.queryExecution().executedPlan().toString()


_EXCHANGE = r"Exchange (?:hash|range)partitioning|Exchange SinglePartition"


def test_perplexity_filter_is_map_only(spark):
    """The LM rides in the plan as a literal table and the score is a
    higher-order fold — nothing to shuffle, join, or explode."""
    plan = _plan_of(spark, "perplexity_filter")
    assert not re.findall(_EXCHANGE, plan), plan
    assert "Join" not in plan, plan
    assert "Generate" not in plan, plan


def test_dsir_scoring_is_map_then_topk(spark):
    """DSIR's only cross-partition step may be the final top-N
    (TakeOrderedAndProject — driver holds N rows); the scoring itself
    must be a zero-exchange map with no join and no explode."""
    plan = _plan_of(spark, "dsir_select_topk")
    assert "TakeOrderedAndProject" in plan, plan
    assert not re.findall(_EXCHANGE, plan), plan
    assert "Join" not in plan, plan
    assert "Generate" not in plan, plan


def test_robust_outlier_joinbacks_broadcast(spark):
    """Both grouped fence tables (median, MAD) must broadcast back over
    the corpus scan — the corpus side shuffles only for its own grouped
    aggregations, never for the join."""
    plan = _plan_of(spark, "robust_outlier_flags")
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert "SortMergeJoin" not in plan, plan


def test_perplexity_separates_planted_corpus(spark):
    """In-vocab prose must land under the keep threshold; rare-token word
    salad must land far above it (OOV deci-bit cost dominates)."""
    df = spark.createDataFrame(
        [
            (1, "scan column join query group window filter table"),
            (2, "xqzzy fnord zyxxy glorp wibble quux flurble snark"),
        ],
        "doc_id bigint, text string",
    )
    scored = df.select(
        "doc_id",
        F.size(tokens_expr()).cast("bigint").alias("n"),
        table_fold(tokens_expr(), unigram_nlp_table()).alias("s"),
    ).collect()
    by_id = {r["doc_id"]: r["s"] / r["n"] for r in scored}
    assert by_id[1] < 80, by_id
    assert by_id[2] >= 130, by_id  # all-OOV averages ≈ the OOV cost


def test_dsir_ranks_target_domain_first(spark):
    """A target-vocabulary doc must out-weigh a raw/junk doc under the
    log-ratio table, and a mixed doc must land between them."""
    df = spark.createDataFrame(
        [
            (1, "scan column join query stream vector hash table"),
            (2, "the a slow dup spam click buy free casino"),
            (3, "scan column the a slow join query dup"),
        ],
        "doc_id bigint, text string",
    )
    feats = feature_array(tokens_expr())
    w = {
        r["doc_id"]: r["w"]
        for r in df.select(
            "doc_id", table_fold(feats, dsir_logratio_table()).alias("w")
        ).collect()
    }
    assert w[1] > w[3] > w[2], w


def test_robust_outliers_match_numpy_fences(spark):
    """Per-source flags must equal the fences an independent numpy
    median/MAD computation produces on the same table."""
    out = (
        _CATALOG["robust_outlier_flags"]
        .spark_fn(spark, SF_SMALL)
        .collect()
    )
    by_source: dict[str, list[tuple[int, int]]] = {}
    for r in out:
        by_source.setdefault(r["source"], []).append(
            (r["n_chars"], r["is_outlier"])
        )
    checked = 0
    for source, rows in by_source.items():
        xs = np.array([x for x, _ in rows], dtype=np.float64)
        med = float(np.median(xs))
        mad = float(np.median(np.abs(xs - med)))
        for x, flag in rows:
            want = 1 if abs(x - med) > 3 * mad else 0
            assert flag == want, (source, x, med, mad, flag)
            checked += 1
    assert checked == len(out) > 0


def test_perplexity_threshold_monotone_in_perplexity():
    """avg_nlp10 → perplexity is monotone (ppl = 2^(avg/10)), so the
    deci-bit threshold is a perplexity threshold — the documented
    contract for why exp() never enters the plan."""
    import math

    avgs = [20.0, 45.5, 80.0, 139.9]
    ppls = [math.pow(2.0, a / 10.0) for a in avgs]
    assert ppls == sorted(ppls)
    assert all(b > a for a, b in zip(ppls, ppls[1:]))
