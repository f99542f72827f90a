"""Grouped-map tensorization on driver tables (hash-checked via digest).

The long→wide pivot (operators/tensorize.py, reference
docs/DATA_LAKE_GUIDE.md:73-109) emits nested 3-D float arrays the driver's
row canonicalizer cannot hash, so the catalog entry projects the block to a
quantized-integer digest — and since floor(x·2²⁰) is exact for float32, the
oracle replays the whole pivot in SQL (round 9; rows-only before that).
Numeric correctness is additionally pytest-covered on tracking-shaped
fixtures (tests/test_features.py)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from gridiron_spark.io.tables import load_table
from gridiron_spark.operators.tensorize import tensorize_plays
from gridiron_spark.queries import register


def _tensorize_events(spark, sf_dir, subset_mod: int | None):
    """Shared body for the catalog entry (1-in-``subset_mod`` user subset)
    and the bench-only full-corpus variant (``subset_mod=None``)."""
    ev = load_table(spark, sf_dir, "events")
    if subset_mod is not None:
        ev = ev.filter(F.col("user_id") % subset_mod == 0)
    w = Window.partitionBy("user_id", F.expr("event_id % 8")).orderBy(
        "ts_us", "event_id"
    )
    tracking_shaped = ev.select(
        F.col("user_id").alias("gameId"),
        (F.col("event_id") % 8).cast("int").alias("playId"),
        F.when(F.col("event_id") % 23 == 0, None)
        .otherwise(F.col("event_id") % 23)
        .cast("int")
        .alias("nflId"),
        F.row_number().over(w).alias("frameId"),
        F.col("value").cast("float").alias("x"),
        (F.col("ts_us") % 1000).cast("float").alias("y"),
        F.col("value").cast("float").alias("s"),
        F.lit(0.0).cast("float").alias("a"),
    )
    t = tensorize_plays(tracking_shaped, max_frames=16, max_players=23)
    # Project the 3-D float block to a scalar digest for the driver's row
    # canonicalizer (it cannot hash list cells). Elements are quantized
    # floor(x·2²⁰) BIGINTs — exact for float32 inputs (power-of-two
    # scaling shifts the exponent only) and therefore SQL-replayable,
    # unlike a to_json float rendering (engine float-formatting rules
    # differ). The digest covers every padded cell in frame-major order,
    # so any drift in the applyInPandas pivot — values, ordering,
    # truncation, padding — flips the md5.
    q = F.transform(
        "tensor",
        lambda fr: F.transform(
            fr,
            lambda pl: F.transform(
                pl,
                lambda v: F.floor(v.cast("double") * F.lit(1048576.0)).cast(
                    "bigint"
                ),
            ),
        ),
    )
    return t.select(
        "gameId",
        "playId",
        "n_frames",
        "n_players",
        F.md5(
            F.array_join(
                F.transform(
                    F.flatten(F.flatten(q)), lambda x: x.cast("string")
                ),
                ",",
            )
        ).alias("tensor_q20_md5"),
    )


@register(
    "grouped_map_tensorize",
    survey="§2.9 grouped-map pandas UDF (long→wide tensor), digest hash-checked",
    # Full SQL replay of the applyInPandas pivot (upgraded from rows-only
    # in round 9): rebuild the tracking shape, index frames (row_number,
    # truncate 16) and players (nflId asc NULLS LAST), scatter the
    # quantized features into a dense 16×23×4 grid via a LEFT JOIN
    # against the flattened index range (absent cell = padding 0), and
    # hash the frame-major string_agg — cell for cell the digest Spark
    # computes FROM THE UDF OUTPUT.
    oracle="""
WITH base AS (
    SELECT user_id AS gameId,
           CAST(event_id % 8 AS INTEGER) AS playId,
           CASE WHEN event_id % 23 = 0 THEN NULL
                ELSE CAST(event_id % 23 AS INTEGER) END AS nflId,
           CAST(ROW_NUMBER() OVER (
               PARTITION BY user_id, event_id % 8
               ORDER BY epoch_us(ts), event_id) AS INTEGER) AS frameId,
           CAST(value AS FLOAT) AS x,
           CAST(epoch_us(ts) % 1000 AS FLOAT) AS y,
           CAST(value AS FLOAT) AS s,
           CAST(0.0 AS FLOAT) AS a
    FROM events WHERE user_id % 20 = 0
),
pm AS (
    SELECT gameId, playId, nflId,
           CAST(ROW_NUMBER() OVER (
               PARTITION BY gameId, playId
               ORDER BY nflId ASC NULLS LAST) - 1 AS BIGINT) AS pidx
    FROM (SELECT DISTINCT gameId, playId, nflId FROM base)
),
stats AS (
    SELECT gameId, playId,
           CAST(LEAST(COUNT(DISTINCT frameId), 16) AS INTEGER) AS n_frames,
           CAST(LEAST(COUNT(DISTINCT nflId)
                + MAX(CASE WHEN nflId IS NULL THEN 1 ELSE 0 END), 23)
               AS INTEGER) AS n_players
    FROM base GROUP BY gameId, playId
),
cells AS (
    SELECT b.gameId, b.playId,
           CAST(b.frameId - 1 AS BIGINT) * 92 + pm.pidx * 4 + u.k AS i,
           CAST(FLOOR(CAST(CASE u.k WHEN 0 THEN b.x WHEN 1 THEN b.y
                           WHEN 2 THEN b.s ELSE b.a END AS DOUBLE)
                      * 1048576.0) AS BIGINT) AS qv
    FROM base b
    JOIN pm ON pm.gameId = b.gameId AND pm.playId = b.playId
           AND pm.nflId IS NOT DISTINCT FROM b.nflId,
         unnest(range(0, 4)) AS u(k)
    WHERE b.frameId <= 16
),
grid AS (
    SELECT p.gameId, p.playId, g.i, COALESCE(c.qv, 0) AS qv
    FROM (SELECT DISTINCT gameId, playId FROM base) p
    CROSS JOIN (SELECT unnest(range(0, 1472)) AS i) g
    LEFT JOIN cells c
           ON c.gameId = p.gameId AND c.playId = p.playId AND c.i = g.i
)
SELECT s.gameId, s.playId, s.n_frames, s.n_players,
       md5(string_agg(CAST(g.qv AS VARCHAR), ',' ORDER BY g.i))
           AS tensor_q20_md5
FROM grid g JOIN stats s ON s.gameId = g.gameId AND s.playId = g.playId
GROUP BY s.gameId, s.playId, s.n_frames, s.n_players
""",
)
def grouped_map_tensorize(spark, sf_dir):
    """Events recast into the tracking shape (entity-frame time series), then
    tensorized per (user, lane) group via applyInPandas — one shuffle on the
    group key, per-group pivot inside Arrow batches, nothing on the driver.
    The 3-D block is projected to a quantized-integer digest computed FROM
    the UDF output, and the oracle replays the entire pivot (frame/player
    indexing, truncation, padding, quantization) in SQL — so the Arrow
    grouped-map machinery itself is hash-checked, not just row-counted.

    1-in-20 user subset: the entry demonstrates the grouped-map plan, not a
    full-corpus materialization. The full-corpus cost is timed separately
    (``grouped_map_tensorize_full`` via ``SPARK_GRAFT_BENCH_FULL=1`` in
    bench.py) and recorded in BASELINE.md so the per-round number is not
    mistaken for it."""
    return _tensorize_events(spark, sf_dir, subset_mod=20)


def grouped_map_tensorize_full(spark, sf_dir):
    """Bench-only full-corpus tensorization (every user, no subset)."""
    return _tensorize_events(spark, sf_dir, subset_mod=None)


_COGROUP_SCHEMA = (
    "user_key long, n_orders long, max_price double, n_events long, n_clicks long"
)


def _reconcile_fn(key, orders_pdf, events_pdf):
    """Per-key merge of two cogrouped tables — pandas boundary kept to
    exact ops only (counts, max): no float folds, so the result is
    bit-identical to the SQL oracle regardless of Arrow batch order."""
    import pandas as pd

    mx = float(orders_pdf["o_totalprice"].max()) if len(orders_pdf) else None
    return pd.DataFrame(
        {
            "user_key": [key[0]],
            "n_orders": [len(orders_pdf)],
            "max_price": [mx],
            "n_events": [len(events_pdf)],
            "n_clicks": [int((events_pdf["event_type"] == "click").sum())],
        }
    )


@register(
    "cogroup_reconcile",
    survey="§2.9 cogrouped applyInPandas (two-table per-key merge) + oracle",
    oracle="""
SELECT COALESCE(o.k, e.k) AS user_key,
       COALESCE(o.n_orders, 0) AS n_orders,
       o.max_price,
       COALESCE(e.n_events, 0) AS n_events,
       COALESCE(e.n_clicks, 0) AS n_clicks
FROM (SELECT o_custkey AS k, COUNT(*) AS n_orders,
             MAX(o_totalprice) AS max_price
      FROM orders WHERE o_custkey % 50 = 0 GROUP BY o_custkey) o
FULL OUTER JOIN
     (SELECT user_id AS k, COUNT(*) AS n_events,
             COUNT(*) FILTER (event_type = 'click') AS n_clicks
      FROM events WHERE user_id % 50 = 0 GROUP BY user_id) e
  ON o.k = e.k
""",
)
def cogroup_reconcile(spark, sf_dir):
    """Co-grouped pandas merge (the feature-store escape hatch): orders
    keyed by customer and events keyed by user meet in ONE co-partitioned
    shuffle; each key's rows from both tables land in the same Arrow batch
    and a python function reconciles them — the pattern for per-entity
    logic spanning two 100 TB tables that joins/aggs can't express (here
    the logic is deliberately SQL-expressible so the driver's oracle
    hash-checks the cogroup machinery itself; keys missing on either side
    surface as empty pandas frames ≡ FULL OUTER JOIN)."""
    # 1-in-50 key subset: the entry demonstrates the cogroup plan (two
    # co-partitioned Exchanges -> per-key Arrow merge); unsubsetted, the
    # per-group Python call overhead dominates (~15k tiny groups) without
    # adding coverage — the full-corpus cost is timed separately
    # (cogroup_reconcile_full, SPARK_GRAFT_BENCH_FULL=1) per BASELINE.md
    return _cogroup_reconcile(spark, sf_dir, subset_mod=50)


def _cogroup_reconcile(spark, sf_dir, subset_mod: int | None):
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type")
    if subset_mod is not None:
        o = o.filter(F.col("o_custkey") % subset_mod == 0)
        ev = ev.filter(F.col("user_id") % subset_mod == 0)
    return (
        o.groupBy("o_custkey")
        .cogroup(ev.groupBy("user_id"))
        .applyInPandas(_reconcile_fn, schema=_COGROUP_SCHEMA)
    )


def cogroup_reconcile_full(spark, sf_dir):
    """Bench-only full-corpus cogroup reconcile (every key, no subset)."""
    return _cogroup_reconcile(spark, sf_dir, subset_mod=None)
