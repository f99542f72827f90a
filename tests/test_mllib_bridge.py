"""Behavioral contracts for the pyspark.ml (MLlib) operator variants.

These entries register rows-only (MLlib's seeded LSH families are not
DuckDB-reproducible), so the correctness evidence lives here: agreement
with the exact oracle-checked baselines and recall guarantees that hold by
construction.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from gridiron_spark.queries import catalog
from tests.conftest import SF_ORACLE, SF_SMALL

_CATALOG = catalog()


def test_brp_ann_recall_vs_exact_cosine(spark):
    """The BRP-LSH top-10 must substantially agree with the exact top-10.

    Euclidean distance on unnormalized vectors is NOT cosine order, so
    compare against the exact *euclidean* top-10 computed with DataFrame
    expressions — on that baseline the LSH result is a candidate-pruned
    approximation whose recall we pin."""
    got = {
        r.vec_id
        for r in _CATALOG["mllib_ann_brp_topk"].spark_fn(spark, SF_ORACLE).collect()
    }
    emb = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qvec")
    )
    dist = F.sqrt(
        F.aggregate(
            F.zip_with(
                "embedding",
                "qvec",
                lambda a, b: (a.cast("double") - b.cast("double"))
                * (a.cast("double") - b.cast("double")),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    exact = (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select("vec_id", dist.alias("d"))
        .orderBy("d", "vec_id")
        .limit(10)
        .collect()
    )
    exact_ids = {r.vec_id for r in exact}
    assert len(got) == 10
    assert len(got & exact_ids) >= 6, (got, exact_ids)


def test_brp_ann_deterministic(spark):
    fn = _CATALOG["mllib_ann_brp_topk"].spark_fn
    a = [(r.vec_id, r.dist) for r in fn(spark, SF_SMALL).collect()]
    b = [(r.vec_id, r.dist) for r in fn(spark, SF_SMALL).collect()]
    assert a == b and len(a) == 10


def test_minhash_join_finds_exact_duplicates(spark, tmp_path):
    """Identical texts have identical shingle vectors ⇒ identical minhash
    buckets ⇒ recall 1.0 on exact duplicates, by construction. The corpus
    has no exact dups, so plant some in a temp lake."""
    import pandas as pd

    texts = {
        3: "the quick brown fox jumps over the lazy dog tonight",
        6: "the quick brown fox jumps over the lazy dog tonight",  # dup of 3
        9: "completely unrelated words about streaming window state stores",
        12: "completely unrelated words about streaming window state stores",  # dup of 9
        15: "a third singleton document with its own distinct vocabulary set",
    }
    pdf = pd.DataFrame(
        {
            "doc_id": list(texts),
            "text": list(texts.values()),
            "lang": ["en"] * 5,
            "source": ["t"] * 5,
            "n_chars": [len(t) for t in texts.values()],
        }
    )
    spark.createDataFrame(pdf).write.parquet(str(tmp_path / "documents.parquet"))
    rows = (
        _CATALOG["mllib_minhash_sim_join"].spark_fn(spark, str(tmp_path)).collect()
    )
    dist0 = {(r.doc_a, r.doc_b) for r in rows if r.jaccard_dist == 0.0}
    assert {(3, 6), (9, 12)} <= dist0
    got = {(r.doc_a, r.doc_b) for r in rows}
    assert (3, 9) not in got and (3, 15) not in got


def test_minhash_join_agrees_with_md5_family(spark):
    """At the same Jaccard threshold, the MLlib pairs and the hand-rolled
    md5-family MinHash pairs (dedup_minhash_lsh) must overlap heavily —
    they estimate the same similarity with different hash families. (Exact
    agreement is not expected: different families block differently near
    the threshold.)"""
    mllib_pairs = {
        (r.doc_a, r.doc_b)
        for r in _CATALOG["mllib_minhash_sim_join"]
        .spark_fn(spark, SF_ORACLE)
        .collect()
        if r.jaccard_dist <= 0.5
    }
    exact_pairs = {
        (r.doc_a, r.doc_b)
        for r in _CATALOG["dedup_ngram_jaccard"].spark_fn(spark, SF_ORACLE).collect()
    }
    # dedup_ngram_jaccard emits pairs at set-Jaccard >= 0.5 (dist <= 0.5);
    # HashingTF collisions can only merge shingles (raising similarity), so
    # every exact pair must be found by the MLlib variant
    missing = exact_pairs - mllib_pairs
    assert not missing, f"exact >=0.5 pairs missed: {missing}"


def test_banded_subset_of_stock_and_finds_dups(spark, tmp_path):
    """AND-banded pairs must be a subset of the stock OR-blocked pairs on
    the real corpus, and exact duplicates must still be found (identical
    hash values ⇒ identical band keys)."""
    import pandas as pd

    banded = {
        (r.doc_a, r.doc_b)
        for r in _CATALOG["mllib_minhash_banded"].spark_fn(spark, SF_ORACLE).collect()
    }
    stock = {
        (r.doc_a, r.doc_b)
        for r in _CATALOG["mllib_minhash_sim_join"].spark_fn(spark, SF_ORACLE).collect()
    }
    assert banded, "banded variant found no pairs on the corpus"
    assert banded <= stock, f"banded pairs not in stock: {banded - stock}"

    texts = {
        3: "the quick brown fox jumps over the lazy dog tonight",
        6: "the quick brown fox jumps over the lazy dog tonight",
        9: "a completely different singleton about stateful stream windows",
    }
    pdf = pd.DataFrame(
        {
            "doc_id": list(texts),
            "text": list(texts.values()),
            "lang": ["en"] * 3,
            "source": ["t"] * 3,
            "n_chars": [len(t) for t in texts.values()],
        }
    )
    spark.createDataFrame(pdf).write.parquet(str(tmp_path / "documents.parquet"))
    rows = _CATALOG["mllib_minhash_banded"].spark_fn(spark, str(tmp_path)).collect()
    got = {(r.doc_a, r.doc_b): r.jaccard_dist for r in rows}
    assert got.get((3, 6)) == 0.0
    assert (3, 9) not in got
