"""Feature-engineering passes over relational training data — the
tabular-ML preparation stage (encode categoricals, normalize, leak-proof
the statistics) that sits between the warehouse queries and a model fit.

Everything follows the repo's cross-engine-exact discipline: category
statistics are integer sums, each emitted encoding is ONE division of
identical integer operands, and the per-row join-back rides a broadcast
of the (bounded) category dimension.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from gridiron_spark.io.tables import load_table
from gridiron_spark.queries import register


@register(
    "target_encode_loo",
    survey="NS-features(leave-one-out target encoding of a categorical against a binary outcome),J1,A3-A6",
    oracle="""
WITH y AS (
    SELECT o_orderkey, o_orderpriority AS cat,
           CAST(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS BIGINT) AS y
    FROM orders
),
stats AS (
    SELECT cat, CAST(COUNT(*) AS BIGINT) AS n_cat,
           CAST(SUM(y) AS BIGINT) AS sum_y
    FROM y GROUP BY cat
)
SELECT y.o_orderkey, y.cat, y.y,
       stats.sum_y - y.y AS loo_num,
       stats.n_cat - 1 AS loo_den,
       CASE WHEN stats.n_cat > 1
            THEN CAST(stats.sum_y - y.y AS DOUBLE) / (stats.n_cat - 1)
       END AS loo_enc
FROM y JOIN stats USING (cat)
""",
)
def target_encode_loo(spark, sf_dir):
    """Leave-one-out target encoding — the standard high-cardinality
    categorical encoder for tabular ML (each row's category is replaced
    by the target mean of the OTHER rows in its category, so the encoding
    never contains the row's own label and cannot leak it into training):
    order priority encoded against the binary finished-order outcome.
    The row's own y is subtracted from the category sum before the
    division — integer numerator and denominator, ONE IEEE division per
    row, NULL for singleton categories (no peers to average).

    Scale shape: the category-statistics aggregate is map-side combined
    (one shuffle of |categories| groups), and the join-back broadcasts
    the bounded category dimension into a map-side hash join — the
    corpus-sized side never shuffles. For a genuinely high-cardinality
    key (user id at 100 TB) the same plan holds with the broadcast
    replaced by a co-partitioned sort-merge join on the category, still
    one shuffle each side; nothing about the arithmetic changes."""
    y = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_orderpriority").alias("cat"),
        (F.col("o_orderstatus") == "F").cast("bigint").alias("y"),
    )
    stats = y.groupBy("cat").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cat"),
        F.sum("y").cast("bigint").alias("sum_y"),
    )
    return y.join(F.broadcast(stats), "cat").select(
        "o_orderkey",
        "cat",
        "y",
        (F.col("sum_y") - F.col("y")).alias("loo_num"),
        (F.col("n_cat") - 1).alias("loo_den"),
        F.when(
            F.col("n_cat") > 1,
            (F.col("sum_y") - F.col("y")).cast("double")
            / (F.col("n_cat") - 1),
        ).alias("loo_enc"),
    )
