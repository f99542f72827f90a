"""MLlib-backed variants of the similarity/dedup operators.

The north-star approach names "DataFrame ops + MLlib tensors"
(BASELINE.json): these entries exercise the `pyspark.ml` path — VectorUDT
columns via `array_to_vector`, `HashingTF` term vectors, `MinHashLSH` /
`BucketedRandomProjectionLSH` models — alongside the hand-rolled md5-family
operators (operators/dedup.py, operators/similarity.py) that remain the
oracle-checkable variants.

MLlib's LSH hash families are seeded JVM RNG + MurmurHash3 — deterministic
for a fixed seed but not reproducible in DuckDB SQL, so these register
rows-only (oracle=None); their behavioral contracts (planted-duplicate
recall, exact-baseline agreement) are pinned in tests/test_mllib_bridge.py
instead. Scale notes: LSH fit() is metadata-only (random hyperplanes /
coefficients — no data pass), approxSimilarityJoin shuffles by (band, hash)
bucket exactly like the hand-rolled variants, and approxNearestNeighbors
broadcasts the probe key — the same 100 TB shapes, JVM-side.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from gridiron_spark.io.tables import load_table
from gridiron_spark.queries import register

_SEED = 42


def _vectors(spark, sf_dir):
    from pyspark.ml.functions import array_to_vector

    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        "label",
        array_to_vector(F.col("embedding").cast("array<double>")).alias("features"),
    )


@register(
    "mllib_ann_brp_topk",
    survey="NS-sim(MLlib BucketedRandomProjectionLSH ANN — the pyspark.ml path)",
    oracle=None,  # seeded JVM hyperplanes are not DuckDB-reproducible
)
def mllib_ann_brp_topk(spark, sf_dir):
    """Top-10 neighbors of query vector 0 via MLlib's
    BucketedRandomProjectionLSH (euclidean). fit() draws seeded random
    projections (no data pass); approxNearestNeighbors probes the model's
    hash buckets and only computes exact distances inside them. Distances
    are exact euclidean on the candidates, so output ordering is stable for
    the fixed seed; tests pin recall against the exact cosine baseline."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH

    vec = _vectors(spark, sf_dir)
    lsh = BucketedRandomProjectionLSH(
        inputCol="features",
        outputCol="hashes",
        seed=_SEED,
        bucketLength=2.0,
        numHashTables=6,
    )
    model = lsh.fit(vec)
    key = vec.filter(F.col("vec_id") == 0).first()["features"]
    out = model.approxNearestNeighbors(
        vec.filter(F.col("vec_id") != 0), key, 10, distCol="dist"
    )
    return out.select(
        "vec_id", "label", F.round(F.col("dist"), 6).alias("dist")
    ).orderBy("dist", "vec_id")


@register(
    "mllib_minhash_sim_join",
    survey="NS-dedup(MLlib MinHashLSH approxSimilarityJoin — the pyspark.ml path)",
    oracle=None,
)
def mllib_minhash_sim_join(spark, sf_dir):
    """Near-dup candidate pairs via MLlib MinHashLSH over HashingTF shingle
    vectors — the stock-MLlib formulation of dedup_minhash_lsh. HashingTF
    maps each doc's word 3-gram set into a sparse 2^18 binary vector (pure
    map-side); MinHashLSH(seed) fit() draws hash coefficients (no data
    pass); approxSimilarityJoin blocks on shared minhash buckets and
    computes EXACT Jaccard distance only on candidates — the same
    candidate-then-verify shape as the md5-family variant, so identical
    docs (identical vectors ⇒ identical buckets) are found with recall 1.0
    by construction. Emits (doc_a, doc_b) at Jaccard distance ≤ 0.6.

    This is the priciest catalog entry BY DESIGN of the stock API, and the
    cost was measured, not guessed: ~11 s at sf0.1, and ~14 s on a 1-in-3
    subset — i.e. dominated by MLlib's join machinery (per-table hash
    explode + vector-equality join + pairwise keyDistance UDF), NOT by
    candidate volume, so demo-subsetting buys nothing and the entry runs
    full-corpus. Two structural gaps vs the md5-family generator
    (dedup_minhash_lsh, ~2 s for identical output semantics): MLlib blocks
    on SINGLE-hash equality across tables (P(candidate) = 1-(1-J)^tables,
    no AND-banding), and the candidate join carries full sparse vectors.
    The API path is the coverage target here; the banded md5 generator IS
    the scale path — at 100 TB you would AND-band MLlib's hash columns
    yourself before any join."""
    from pyspark.ml.feature import HashingTF, MinHashLSH

    doc = load_table(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.col("text")), " ")
    grams = F.when(
        F.size(toks) >= 3,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.size(toks) - 3),
                lambda i: F.concat_ws(
                    " ",
                    F.element_at(toks, i + 1),
                    F.element_at(toks, i + 2),
                    F.element_at(toks, i + 3),
                ),
            )
        ),
    ).otherwise(F.array(F.concat_ws(" ", toks)))
    shingled = doc.select("doc_id", grams.alias("shingles"))
    tf = HashingTF(
        inputCol="shingles", outputCol="features", numFeatures=1 << 18, binary=True
    )
    feats = tf.transform(shingled)
    lsh = MinHashLSH(
        inputCol="features", outputCol="hashes", seed=_SEED, numHashTables=8
    )
    model = lsh.fit(feats)
    pairs = model.approxSimilarityJoin(feats, feats, 0.6, distCol="jaccard_dist")
    return (
        pairs.filter(F.col("datasetA.doc_id") < F.col("datasetB.doc_id"))
        .select(
            F.col("datasetA.doc_id").alias("doc_a"),
            F.col("datasetB.doc_id").alias("doc_b"),
            F.round(F.col("jaccard_dist"), 6).alias("jaccard_dist"),
        )
        .orderBy("doc_a", "doc_b")
    )
