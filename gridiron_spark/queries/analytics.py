"""Window-function analytics (SURVEY.md §2.5).

The reference's data model is windowing-shaped (per-entity ordered frames) and
its docs call for derivative features ("complex physics derivatives",
reference docs/DATA_LAKE_GUIDE.md:132) without implementing them. Here they
are, over the ``events`` time-series (per user_id ordered by time — the same
shape as per-(gameId,playId,nflId) ordered by frameId):

- finite-difference deltas / velocity (lag)
- frame re-indexing (row_number)
- per-entity horizon counts (count over partition — the reference's
  ``num_frames_output``, data/nfl-bdb/2026/README.md:37)
- per-entity min/max normalization

All windows partition by the entity key, so at 100 TB this is one shuffle on
user_id, then per-partition sorted evaluation — no driver involvement.
Double arithmetic here is subtraction/division on *identical operand pairs* in
both engines (never reordered accumulation), hence hash-stable.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from gridiron_spark.io.tables import load_table
from gridiron_spark.queries import register

# Ordering key includes event_id: ts alone can tie, and window determinism
# must not depend on partition layout. (Built lazily — Window specs need an
# active session in pyspark 4.)
def _w():
    return Window.partitionBy("user_id").orderBy("ts_us", "event_id")


def _wp():
    return Window.partitionBy("user_id")


@register(
    "window_lag_delta",
    survey="W1(lag),W2(row_number),F7",
    oracle="""
SELECT event_id,
       user_id,
       ROW_NUMBER() OVER w AS rn,
       epoch_us(ts) - lag(epoch_us(ts)) OVER w AS dt_us,
       value - lag(value) OVER w AS delta_value,
       CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > 0
            THEN (value - lag(value) OVER w) / ((epoch_us(ts) - lag(epoch_us(ts)) OVER w) / 1000000.0)
       END AS velocity
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
""",
)
def window_lag_delta(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    w = _w()
    dt_us = F.col("ts_us") - F.lag("ts_us").over(w)
    delta = F.col("value") - F.lag("value").over(w)
    return ev.select(
        "event_id",
        "user_id",
        F.row_number().over(w).alias("rn"),
        dt_us.alias("dt_us"),
        delta.alias("delta_value"),
        F.when(dt_us > 0, delta / (dt_us / F.lit(1000000.0))).alias("velocity"),
    )


@register(
    "window_rank_suite",
    survey="W-rank(rank/dense_rank/percent_rank/cume_dist/ntile)",
    oracle="""
SELECT o_orderkey, o_custkey,
       RANK() OVER w AS rnk,
       DENSE_RANK() OVER w AS drnk,
       PERCENT_RANK() OVER w AS prnk,
       CUME_DIST() OVER w AS cdist,
       NTILE(4) OVER w AS quartile
FROM orders
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey)
""",
)
def window_rank_suite(spark, sf_dir):
    """The full ANSI ranking-function family over one window spec — one
    shuffle on the partition key, one sort, five functions in a single
    Window physical node. percent_rank/cume_dist are exact rationals
    ((rank-1)/(n-1), rank/n) so doubles match bit-exactly cross-engine."""
    from pyspark.sql import Window as W

    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), "o_orderkey"
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.percent_rank().over(w).alias("prnk"),
        F.cume_dist().over(w).alias("cdist"),
        F.ntile(4).over(w).alias("quartile"),
    )


@register(
    "window_frame_stats",
    survey="W3(count/min/max over partition)",
    oracle="""
SELECT event_id,
       user_id,
       value,
       COUNT(*) OVER wp AS n_user_events,
       MIN(value) OVER wp AS min_value,
       MAX(value) OVER wp AS max_value,
       CASE WHEN MAX(value) OVER wp > MIN(value) OVER wp
            THEN (value - MIN(value) OVER wp) / (MAX(value) OVER wp - MIN(value) OVER wp)
       END AS value_norm
FROM events
WINDOW wp AS (PARTITION BY user_id)
""",
)
def window_frame_stats(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    wp = _wp()
    mn = F.min("value").over(wp)
    mx = F.max("value").over(wp)
    return ev.select(
        "event_id",
        "user_id",
        "value",
        F.count(F.lit(1)).over(wp).alias("n_user_events"),
        mn.alias("min_value"),
        mx.alias("max_value"),
        F.when(mx > mn, (F.col("value") - mn) / (mx - mn)).alias("value_norm"),
    )
