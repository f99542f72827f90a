"""Deduplication operators over ``documents`` (training-data pipeline surface).

Exact dedup is a hash aggregation on the content key — fully shuffled by text
hash, scales linearly. Near-dup variants (MinHash/LSH, SimHash, n-gram
Jaccard) live in gridiron_spark.operators.dedup and are registered here; the
pairwise-exact ones are oracle-checked, approximate ones use deterministic
hash families so they are *also* reproducible.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from gridiron_spark.io.tables import load_table
from gridiron_spark.queries import register


@register(
    "dedup_exact",
    survey="NS-dedup(exact hash-groupBy),A2",
    oracle="""
SELECT md5(text) AS content_md5,
       MIN(doc_id) AS keeper_doc_id,
       COUNT(*) AS n_copies
FROM documents
GROUP BY md5(text)
""",
)
def dedup_exact(spark, sf_dir):
    """Exact dedup: group on content hash, keep the smallest doc_id.

    Grouping on md5(text) rather than raw text keeps shuffle rows small at
    100 TB (32-byte key vs multi-KB documents) — the full text never moves.
    """
    doc = load_table(spark, sf_dir, "documents")
    return (
        doc.groupBy(F.md5("text").alias("content_md5"))
        .agg(
            F.min("doc_id").alias("keeper_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


@register(
    "dedup_exact_keep_rows",
    survey="NS-dedup(exact, row-preserving),W2",
    oracle="""
SELECT doc_id, lang, source, n_chars
FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id) AS rn
    FROM documents
)
WHERE rn = 1
""",
)
def dedup_exact_keep_rows(spark, sf_dir):
    """Row-preserving exact dedup (deterministic dropDuplicates): keep the
    lowest-doc_id row per distinct text."""
    from pyspark.sql import Window

    doc = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("text").orderBy("doc_id")
    return (
        doc.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "lang", "source", "n_chars")
    )
