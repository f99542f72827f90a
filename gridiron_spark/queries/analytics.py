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


# --- Product analytics: funnels and cohorts ----------------------------------

_DAY_US = 86400 * 1_000_000


@register(
    "event_funnel_analysis",
    survey="A-analytics(ordered event funnel: per-user strictly-sequenced step conversion),A3-A6,J1",
    oracle="""
WITH e AS (
    SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events
),
s1 AS (
    SELECT user_id, MIN(ts_us) AS t1 FROM e
    WHERE event_type = 'view' GROUP BY user_id
),
s2 AS (
    SELECT e.user_id, MIN(e.ts_us) AS t2
    FROM e JOIN s1 ON e.user_id = s1.user_id
    WHERE e.event_type = 'click' AND e.ts_us > s1.t1
    GROUP BY e.user_id
),
s3 AS (
    SELECT e.user_id, MIN(e.ts_us) AS t3
    FROM e JOIN s2 ON e.user_id = s2.user_id
    WHERE e.event_type = 'purchase' AND e.ts_us > s2.t2
    GROUP BY e.user_id
)
SELECT 1 AS step, 'view' AS step_name, COUNT(*) AS n_users FROM s1
UNION ALL
SELECT 2, 'click_after_view', COUNT(*) FROM s2
UNION ALL
SELECT 3, 'purchase_after_click', COUNT(*) FROM s3
""",
)
def event_funnel_analysis(spark, sf_dir):
    """The ordered conversion funnel (view → click → purchase, each step
    STRICTLY after the previous step's first occurrence) — the product-
    analytics query every event warehouse runs, and a shape none of the
    window/session entries cover: per-user sequential-pattern matching,
    not bucketing. Step k's timestamp is the MIN event time after step
    k-1's, so a user who clicks before ever viewing does not convert.

    Scale shape: each step is one filtered map-side-combined per-user
    aggregate joined to the previous step's (user, t) table — the chain
    is |steps| co-partitioned shuffles on user_id (Spark reuses the
    user_id partitioning across them), and the funnel report is three
    1-row aggregates. No window over the raw stream, no explode."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts_us"
    )
    s1 = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("t1"))
    )
    s2 = (
        e.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter(F.col("ts_us") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("t2"))
    )
    s3 = (
        e.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter(F.col("ts_us") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("t3"))
    )

    def count_step(df, step, name):
        return df.agg(
            F.lit(step).alias("step"),
            F.lit(name).alias("step_name"),
            F.count(F.lit(1)).alias("n_users"),
        ).select("step", "step_name", "n_users")

    return (
        count_step(s1, 1, "view")
        .unionByName(count_step(s2, 2, "click_after_view"))
        .unionByName(count_step(s3, 3, "purchase_after_click"))
    )


@register(
    "cohort_retention",
    survey="A-analytics(daily cohort retention matrix),A3-A6,W1-W3",
    oracle=f"""
WITH e AS (
    SELECT user_id, epoch_us(ts) // {_DAY_US} AS d FROM events
),
first_d AS (
    SELECT user_id, MIN(d) AS cohort_day FROM e GROUP BY user_id
),
active AS (
    SELECT DISTINCT e.user_id, f.cohort_day, e.d - f.cohort_day AS day_offset
    FROM e JOIN first_d f ON e.user_id = f.user_id
)
SELECT cohort_day, day_offset, COUNT(*) AS n_users
FROM active
GROUP BY cohort_day, day_offset
""",
)
def cohort_retention(spark, sf_dir):
    """The retention matrix: users cohorted by their first-activity epoch
    DAY, counted on every later day they return — the (cohort, offset)
    grid a growth dashboard draws (daily grain: the corpus spans ~30
    days, so the matrix is genuinely two-dimensional). Epoch-day
    arithmetic on ts_us keeps it timezone-independent (the repo-wide
    rule: never session-tz date functions).

    Scale shape: one per-user MIN (map-side combined), a co-partitioned
    join back on user_id, one DISTINCT on (user, offset) and the final
    bounded aggregate — output is |days|² cells no matter the event
    volume."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id", F.expr(f"ts_us div {_DAY_US}").alias("d")
    )
    first_d = e.groupBy("user_id").agg(F.min("d").alias("cohort_day"))
    active = (
        e.join(first_d, "user_id")
        .select(
            "user_id",
            "cohort_day",
            (F.col("d") - F.col("cohort_day")).alias("day_offset"),
        )
        .distinct()
    )
    return active.groupBy("cohort_day", "day_offset").agg(
        F.count(F.lit(1)).alias("n_users")
    )
