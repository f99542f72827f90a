"""The composed end-to-end training-data pipeline.

One catalog entry chaining the four pipeline stages every LLM data release
runs — quality gate → benchmark decontamination → mixture downsampling →
context-window packing — each stage shrinking the next stage's input. The
individual operators are verified separately (text.py, dedup.py, scale.py);
this entry proves they compose, and its oracle replays the whole chain as a
single CTE pipeline, so the hash check covers the stage *boundaries* (which
docs survive each cut), not just each stage in isolation.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from gridiron_spark.io.tables import load_table
from gridiron_spark.operators.dedup import shingle_rows
from gridiron_spark.operators.ordered import grouped_running_sum
from gridiron_spark.queries import register


@register(
    "training_data_pipeline",
    survey="NS-pipeline(composed: quality gate → decontaminate → mixture → pack)",
    oracle="""
WITH gated AS (
    SELECT doc_id, source, text,
           len(string_split(text, ' ')) AS n_tokens
    FROM documents
    WHERE len(string_split(text, ' ')) >= 15
),
sh AS (
    SELECT doc_id,
           list_distinct(CASE WHEN len(t) >= 3
               THEN list_transform(range(0, len(t) - 2),
                                   i -> array_to_string(t[i+1:i+3], ' '))
               ELSE [array_to_string(t, ' ')] END) AS shingles
    FROM (SELECT doc_id, string_split(lower(text), ' ') AS t FROM gated)
),
ex AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
bench AS (SELECT doc_id AS bench_id, shingle FROM ex WHERE doc_id % 50 = 0),
contaminated AS (
    SELECT t.doc_id
    FROM (SELECT doc_id, shingle FROM ex WHERE doc_id % 50 <> 0) t
    JOIN bench b USING (shingle)
    GROUP BY t.doc_id
    HAVING COUNT(DISTINCT t.shingle) >= 2
),
clean AS (
    SELECT g.doc_id, g.source, g.n_tokens,
           md5(CAST(g.doc_id AS VARCHAR)) AS ord
    FROM gated g
    WHERE g.doc_id % 50 <> 0
      AND g.doc_id NOT IN (SELECT doc_id FROM contaminated)
),
b2 AS (
    SELECT source,
           (SUM(n_tokens) * ((CAST(substring(source, 4) AS INT) % 3) + 1)) // 5
               AS budget
    FROM clean GROUP BY source
),
cum AS (
    SELECT doc_id, source, n_tokens,
           SUM(n_tokens) OVER (PARTITION BY source ORDER BY ord, doc_id
                               ROWS UNBOUNDED PRECEDING) AS cum_tokens
    FROM clean
),
mixed AS (
    SELECT c.doc_id,
           LEAST(CAST(ceil(c.n_tokens / 16.0) AS INT) * 16, 128) AS bucket_len,
           LEAST(c.n_tokens, 128) AS n_tokens
    FROM cum c JOIN b2 USING (source)
    WHERE c.cum_tokens <= b2.budget
),
numbered AS (
    SELECT bucket_len, n_tokens,
           ROW_NUMBER() OVER (PARTITION BY bucket_len ORDER BY doc_id) AS rn,
           128 // bucket_len AS fit
    FROM mixed
)
SELECT bucket_len,
       CAST((rn - 1) // fit AS BIGINT) AS seq_idx,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
       CAST(COUNT(*) * bucket_len - SUM(n_tokens) AS BIGINT) AS slot_pad,
       CAST(128 - COUNT(*) * bucket_len AS BIGINT) AS tail_pad
FROM numbered
GROUP BY bucket_len, (rn - 1) // fit
""",
)
def training_data_pipeline(spark, sf_dir):
    """Quality gate (≥15 tokens) → drop benchmark docs and anything sharing
    ≥2 shingles with them → per-source token-budget mixture (md5 order) →
    128-token length-bucketed packing. Returns one row per packed sequence.

    Composition is where pipelines die at scale, so the stage boundaries
    are all shrink-only: the gate and decontamination prune before any
    expensive stage; the benchmark side broadcasts (corpus-independent
    size); the contaminated-doc set is overlap-sized, so its anti-join
    broadcasts too; and both ordered scans (mixture cumsum, pack numbering)
    go through grouped_running_sum's range-exchange + broadcast-offsets
    path — no single-task group extents anywhere. Every number is integer
    or md5 arithmetic: the full four-stage chain hash-matches the oracle.
    """
    doc = load_table(spark, sf_dir, "documents")
    n_tok = F.size(F.split(F.col("text"), " "))
    gated = doc.select(
        "doc_id", "source", "text", n_tok.alias("n_tokens")
    ).filter(n_tok >= 15)

    bench_sh = shingle_rows(gated.filter(F.col("doc_id") % 50 == 0)).select(
        F.col("doc_id").alias("bench_id"), "shingle"
    )
    train_sh = shingle_rows(
        gated.filter(F.col("doc_id") % 50 != 0), distinct=False
    )
    contaminated = (
        train_sh.join(F.broadcast(bench_sh), "shingle")
        .groupBy("doc_id")
        .agg(F.countDistinct("shingle").alias("n_shared"))
        .filter(F.col("n_shared") >= 2)
        .select("doc_id")
    )
    clean = (
        gated.filter(F.col("doc_id") % 50 != 0)
        .join(F.broadcast(contaminated), "doc_id", "left_anti")
        .select(
            "doc_id",
            "source",
            "n_tokens",
            F.md5(F.col("doc_id").cast("string")).alias("ord"),
        )
    )
    budgets = (
        clean.groupBy("source")
        .agg(F.sum("n_tokens").alias("tot"))
        .select(
            "source",
            F.expr(
                "(tot * ((CAST(substring(source, 4) AS INT) % 3) + 1)) div 5"
            ).alias("budget"),
        )
    )
    cum = grouped_running_sum(
        clean, ["source"], ["ord", "doc_id"], "n_tokens", out_col="cum_tokens"
    )
    mixed = (
        cum.join(F.broadcast(budgets), "source")
        .filter(F.col("cum_tokens") <= F.col("budget"))
        .select(
            "doc_id",
            F.least(F.ceil(F.col("n_tokens") / 16.0).cast("int") * 16, F.lit(128))
            .alias("bucket_len"),
            F.least(F.col("n_tokens"), F.lit(128)).alias("n_tokens"),
        )
    )
    numbered = grouped_running_sum(
        mixed.withColumn("one", F.lit(1)),
        ["bucket_len"],
        ["doc_id"],
        "one",
        out_col="rn",
    ).withColumn("fit", F.expr("128 div bucket_len"))
    return (
        numbered.groupBy(
            "bucket_len",
            F.expr("(rn - 1) div fit").cast("bigint").alias("seq_idx"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("sum_tokens"),
        )
        .select(
            "bucket_len",
            "seq_idx",
            "n_docs",
            "sum_tokens",
            (F.col("n_docs") * F.col("bucket_len") - F.col("sum_tokens"))
            .cast("bigint")
            .alias("slot_pad"),
            (F.lit(128) - F.col("n_docs") * F.col("bucket_len"))
            .cast("bigint")
            .alias("tail_pad"),
        )
    )
