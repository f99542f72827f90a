"""Similarity search over the ``embeddings`` table (array<float> vectors).

Brute-force cosine top-k is the exactness baseline (and the oracle-checkable
variant); the LSH-bucketed scale path lives in
gridiron_spark.operators.similarity. The brute-force plan is a broadcast of
the (tiny) query-vector side against a single pass over the embedding table +
TakeOrderedAndProject — at 100 TB that is one map-only scan, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from gridiron_spark.functions.vectors import cosine
from gridiron_spark.io.tables import load_table
from gridiron_spark.queries import register

_QUERY_VEC_ID = 0
_TOP_K = 10

_COS_SQL = """
list_sum(list_transform(list_zip(e.embedding, q.embedding),
         x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
/ (sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
 * sqrt(list_sum(list_transform(q.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
""".strip()


@register(
    "ann_cosine_topk",
    survey="NS-sim(brute-force cosine top-k),O5,J1",
    oracle=f"""
WITH q AS (SELECT embedding FROM embeddings WHERE vec_id = {_QUERY_VEC_ID})
SELECT e.vec_id,
       e.label,
       {_COS_SQL} AS cos_sim
FROM embeddings e, q
WHERE e.vec_id <> {_QUERY_VEC_ID}
ORDER BY cos_sim DESC, e.vec_id
LIMIT {_TOP_K}
""",
)
def ann_cosine_topk(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    q = (
        emb.filter(F.col("vec_id") == _QUERY_VEC_ID)
        .select(F.col("embedding").alias("q_embedding"))
    )
    scored = (
        emb.filter(F.col("vec_id") != _QUERY_VEC_ID)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            "label",
            cosine(F.col("embedding"), F.col("q_embedding")).alias("cos_sim"),
        )
    )
    return scored.orderBy(F.col("cos_sim").desc(), "vec_id").limit(_TOP_K)
