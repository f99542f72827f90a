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


_DOC_WORDS = st.lists(
    st.sampled_from(list("abcdef")), min_size=1, max_size=30
)
_CORPUS = st.lists(_DOC_WORDS, min_size=1, max_size=6)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(corpus=_CORPUS, k=st.integers(2, 4))
def test_dup_span_coverage_matches_bruteforce(spark, corpus, k):
    """dup_span_coverage's windowed interval union must equal a direct
    Python computation (span multiset → duplicated spans → per-doc union of
    [pos, pos+k) hit intervals) on ANY random corpus — tiny 6-letter vocab
    forces heavy span collisions, the regime where overlap merging matters."""
    from collections import Counter

    from gridiron_spark.operators.dedup import dup_span_coverage_stats

    docs = [(i, " ".join(words)) for i, words in enumerate(corpus)]
    sdf = spark.createDataFrame(docs, "doc_id bigint, text string")
    got = {
        r.doc_id: (r.n_dup_positions, r.covered_tokens)
        for r in dup_span_coverage_stats(sdf, k).collect()
    }

    spans = Counter()
    per_doc_positions: dict[int, list[int]] = {}
    for i, words in enumerate(corpus):
        per_doc_positions[i] = []
        for p in range(len(words) - k + 1):
            spans[" ".join(words[p : p + k])] += 1
    for i, words in enumerate(corpus):
        for p in range(len(words) - k + 1):
            if spans[" ".join(words[p : p + k])] >= 2:
                per_doc_positions[i].append(p)
    for i, words in enumerate(corpus):
        covered: set[int] = set()
        for p in per_doc_positions[i]:
            covered.update(range(p, p + k))
        assert got[i] == (len(per_doc_positions[i]), len(covered)), (
            i, corpus, k,
        )


_WORD = st.text(alphabet="abcd", min_size=1, max_size=6)
_WORD_FREQ = st.dictionaries(_WORD, st.integers(1, 9), min_size=1, max_size=12)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(wf=_WORD_FREQ, n_merges=st.integers(1, 5))
def test_bpe_loop_matches_reference_on_random_vocab(spark, wf, n_merges):
    """The declarative BPE merge loop must reproduce the reference Python
    BPE merge-for-merge on ANY random (word, freq) table — a 4-letter
    alphabet with short words forces dense pair collisions and frequent
    ties, the regime where the (n DESC, a, b) tie-break and the
    left-to-right non-overlap scan actually matter. Early-converging
    vocabularies (fewer emitted merges than requested) must truncate
    identically on both sides."""
    from gridiron_spark.operators.bpe import bpe_merge_table
    from tests.test_semdedup_bpe import _reference_bpe

    expected = _reference_bpe(dict(wf), n_merges=n_merges)
    wc = spark.createDataFrame(
        [(w, n) for w, n in wf.items()], "word string, freq bigint"
    )
    got = [
        (r["step"], r["left_sym"], r["right_sym"], r["merged"], r["n"])
        for r in bpe_merge_table(wc, n_merges=n_merges).orderBy("step").collect()
    ]
    assert got == expected
