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

from gridiron_spark.io.tables import fan_out, load_table
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
_HOUR_US = 3600 * 1_000_000


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


# --- Tracking-shaped spatial + dimension-history operators --------------------


@register(
    "frame_nearest_defender",
    survey="NS-tracking(per-frame nearest-opponent distance — the reference's designed feature-store metric),J1,W3,A3-A6",
    oracle="""
WITH t AS (
    SELECT l_orderkey AS play_id,
           l_linenumber AS entity_id,
           l_linenumber % 2 AS team,
           MIN(l_partkey % 120) AS x,
           MIN(l_suppkey % 54) AS y
    FROM lineitem
    GROUP BY 1, 2, 3
),
pairs AS (
    SELECT o.play_id, o.entity_id,
           d.entity_id AS def_entity,
           (o.x - d.x) * (o.x - d.x) + (o.y - d.y) * (o.y - d.y) AS dist_sq
    FROM t o JOIN t d ON o.play_id = d.play_id
    WHERE o.team = 0 AND d.team = 1
),
w AS (
    SELECT play_id, entity_id, def_entity, dist_sq,
           MIN(dist_sq) OVER (PARTITION BY play_id, entity_id) AS min_sq
    FROM pairs
)
SELECT play_id, entity_id,
       CAST(MIN(dist_sq) AS BIGINT) AS nearest_dist_sq,
       CAST(MIN(CASE WHEN dist_sq = min_sq THEN def_entity END) AS BIGINT)
           AS nearest_defender,
       CAST(COUNT(*) AS BIGINT) AS n_defenders
FROM w
GROUP BY play_id, entity_id
""",
)
def frame_nearest_defender(spark, sf_dir):
    """The reference's designed-but-never-implemented feature-store metric:
    "distance to nearest defender" (reference README.md:10-11,
    docs/DATA_LAKE_GUIDE.md:125-133 sketch the side-car but ship no
    implementation). The tracking snapshot is derived from ``lineitem``
    with integer-only arithmetic so DuckDB can replay it: each order
    group is one frame of up to 7 tracked entities (linenumber), even
    linenumbers are offense, odd are defense, and (x, y) come from
    partkey/suppkey modulo the 120x53.3 field (reference
    app/main.py:139-141); duplicate sensor rows for one entity (the
    synthetic lineitem repeats linenumbers) collapse coordinate-wise by
    MIN first — the dedup a tracking ingest performs before featurizing. For every offense entity the query returns the
    squared distance to, identity of, and count of same-frame defenders
    (squared distance keeps it integer-exact; sqrt is monotone so the
    NEAREST defender is identical). Ties break to the lowest defender id
    via the window-min filter, deterministically in both engines.

    Scale shape: one map-side-combined collapse aggregate, then the pair
    generator is a self-equi-join on the frame key — co-partitioned
    shuffle, sort-merge, and the group size is bounded by
    players-per-frame (<=7 here, 23 in NFL tracking), so the fan-out is
    a constant factor, never quadratic in the corpus. The window-min and
    final aggregate reuse the same (play, entity) partitioning, so Spark
    plans one Exchange after the join."""
    t = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy(
            F.col("l_orderkey").alias("play_id"),
            F.col("l_linenumber").alias("entity_id"),
            (F.col("l_linenumber") % 2).alias("team"),
        )
        .agg(
            F.min(F.col("l_partkey") % 120).alias("x"),
            F.min(F.col("l_suppkey") % 54).alias("y"),
        )
    )
    off = t.filter(F.col("team") == 0).select(
        "play_id", "entity_id", F.col("x").alias("ox"), F.col("y").alias("oy")
    )
    dfn = t.filter(F.col("team") == 1).select(
        F.col("play_id").alias("d_play"),
        F.col("entity_id").alias("def_entity"),
        F.col("x").alias("dx"),
        F.col("y").alias("dy"),
    )
    dsq = (F.col("ox") - F.col("dx")) * (F.col("ox") - F.col("dx")) + (
        F.col("oy") - F.col("dy")
    ) * (F.col("oy") - F.col("dy"))
    pairs = off.join(dfn, F.col("play_id") == F.col("d_play")).select(
        "play_id", "entity_id", "def_entity", dsq.alias("dist_sq")
    )
    w = Window.partitionBy("play_id", "entity_id")
    return (
        pairs.withColumn("min_sq", F.min("dist_sq").over(w))
        .groupBy("play_id", "entity_id")
        .agg(
            F.min("dist_sq").cast("bigint").alias("nearest_dist_sq"),
            F.min(
                F.when(F.col("dist_sq") == F.col("min_sq"), F.col("def_entity"))
            )
            .cast("bigint")
            .alias("nearest_defender"),
            F.count(F.lit(1)).alias("n_defenders"),
        )
    )


@register(
    "scd2_dimension_build",
    survey="NS-lakehouse(SCD type-2 dimension history from a change log),W1-W2,O1",
    oracle="""
WITH e AS (
    SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id FROM events
),
marked AS (
    SELECT user_id, event_type, ts_us, event_id,
           LAG(event_type) OVER w AS prev_type
    FROM e
    WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
),
changes AS (
    SELECT user_id, event_type, ts_us
    FROM marked
    WHERE prev_type IS NULL OR prev_type <> event_type
)
SELECT user_id, event_type,
       ts_us AS eff_from_us,
       LEAD(ts_us) OVER w2 AS eff_to_us,
       ROW_NUMBER() OVER w2 AS version,
       CAST(LEAD(ts_us) OVER w2 IS NULL AS INT) AS is_current
FROM changes
WINDOW w2 AS (PARTITION BY user_id ORDER BY ts_us)
""",
)
def scd2_dimension_build(spark, sf_dir):
    """Slowly-changing-dimension type-2 build — the lakehouse MERGE staple
    the snapshot-diff/CDC entries (table_snapshot_diff, dedup_cdc_chunks,
    streaming_cdc_upsert_e2e) don't cover: collapse an append-only change
    log into versioned effective-dated dimension rows. The per-user
    attribute is ``event_type``; consecutive duplicates collapse into one
    validity interval, each surviving row gets [eff_from, eff_to) epoch-us
    bounds, a version number, and an is_current flag (open interval).
    Epoch-us integers, never session-tz timestamps (the repo-wide rule).

    Scale shape: one shuffle on the dimension key (user_id), then two
    pipelined window passes over the SAME partitioning (lag to mark
    changes, lead/row_number to close intervals) — Spark plans a single
    Exchange and sorts once; the change-collapse filter runs between
    them map-side. At 100 TB this is the standard one-key-shuffle
    dimension rebuild; an incremental variant would stage the current
    open rows and union the new log tail."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts_us", "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    changes = (
        e.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(
            F.col("prev_type").isNull()
            | (F.col("prev_type") != F.col("event_type"))
        )
        .select("user_id", "event_type", "ts_us")
    )
    w2 = Window.partitionBy("user_id").orderBy("ts_us")
    return changes.select(
        "user_id",
        "event_type",
        F.col("ts_us").alias("eff_from_us"),
        F.lead("ts_us").over(w2).alias("eff_to_us"),
        F.row_number().over(w2).alias("version"),
        F.lead("ts_us").over(w2).isNull().cast("int").alias("is_current"),
    )


@register(
    "interval_islands_merge",
    survey="NS-temporal(gaps-and-islands interval coalescing via exclusive cumulative max),W1-W3,A3-A6",
    oracle=f"""
WITH iv AS (
    SELECT user_id,
           epoch_us(ts) AS s,
           epoch_us(ts) + ((event_id % 5) + 1) * {2 * _HOUR_US} AS e
    FROM events
),
flagged AS (
    SELECT user_id, s, e,
           CASE WHEN MAX(e) OVER (PARTITION BY user_id ORDER BY s, e
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                     >= s
                THEN 0 ELSE 1 END AS new_island
    FROM iv
),
islands AS (
    SELECT user_id, s, e,
           SUM(new_island) OVER (PARTITION BY user_id ORDER BY s, e
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS island_id
    FROM flagged
)
SELECT user_id,
       CAST(island_id AS BIGINT) AS island_id,
       MIN(s) AS island_start_us,
       MAX(e) AS island_end_us,
       CAST(COUNT(*) AS BIGINT) AS n_intervals
FROM islands
GROUP BY user_id, island_id
""",
)
def interval_islands_merge(spark, sf_dir):
    """Gaps-and-islands: coalesce overlapping / touching per-user activity
    intervals into maximal merged spans — the temporal-coverage shape
    (session stitching, on-call coverage, validity unioning) that
    session_window_agg's fixed-gap sessionization cannot express, because
    here each row carries its OWN end time. Each event opens an interval
    of (event_id % 5 + 1) x 2h; an interval starts a new island iff it
    begins after the exclusive running max of all earlier ends (the
    textbook cumulative-max formulation), and islands aggregate to
    [min start, max end] with a row count. All epoch-us integers.

    Scale shape: one shuffle on user_id, then two window passes over the
    same partitioning (exclusive-frame cumulative max, then the running
    island-id sum) and a final aggregate that reuses the partitioning
    again — a single Exchange end to end, per-user sorted evaluation,
    no self-join (the naive interval-overlap formulation is a range
    self-join; the cumulative-max rewrite is what survives 100 TB)."""
    iv = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.col("ts_us").alias("s"),
        (
            F.col("ts_us")
            + ((F.col("event_id") % 5) + 1) * F.lit(2 * _HOUR_US)
        ).alias("e"),
    )
    wo = Window.partitionBy("user_id").orderBy("s", "e")
    prev_max = F.max("e").over(wo.rowsBetween(Window.unboundedPreceding, -1))
    flagged = iv.withColumn(
        "new_island",
        F.when(prev_max >= F.col("s"), F.lit(0)).otherwise(F.lit(1)),
    )
    islands = flagged.withColumn(
        "island_id",
        F.sum("new_island").over(wo.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return islands.groupBy("user_id", "island_id").agg(
        F.min("s").alias("island_start_us"),
        F.max("e").alias("island_end_us"),
        F.count(F.lit(1)).alias("n_intervals"),
    )


# --- Scale-path joins Spark lacks natively: interval overlap, spatial radius --

_IVL_W = 128  # bin width (days) — must exceed the max interval length (89)


@register(
    "interval_overlap_join_binned",
    survey="NS-temporal(two-set interval OVERLAP join via bin-replicated equi-join — the scale path for range joins),J1,W3",
    oracle="""
WITH iv AS (
    SELECT o_orderkey AS k, o_custkey AS ck, o_orderpriority AS pr,
           CAST(date_diff('day', TIMESTAMP '1992-01-01', o_orderdate)
                AS BIGINT) AS s,
           CAST(date_diff('day', TIMESTAMP '1992-01-01', o_orderdate)
                + 30 + o_orderkey % 60 AS BIGINT) AS e
    FROM orders
),
a AS (SELECT * FROM iv WHERE pr IN ('1-URGENT', '2-HIGH')),
b AS (SELECT * FROM iv WHERE pr IN ('4-NOT SPECIFIED', '5-LOW'))
SELECT a.ck AS custkey, a.k AS a_key, b.k AS b_key,
       LEAST(a.e, b.e) - GREATEST(a.s, b.s) + 1 AS overlap_days
FROM a JOIN b
  ON a.ck = b.ck AND a.s <= b.e AND b.s <= a.e
""",
)
def interval_overlap_join_binned(spark, sf_dir):
    """Interval-overlap join between two interval sets — the temporal join
    (reservations x outages, dosing x symptoms, contract x incident)
    that Spark has no native operator for, and whose naive form is a
    range-predicate join the planner can only run as a nested loop. Each
    order is an interval [s, s + 30 + key%60] of epoch-days on its
    customer's timeline; set A = urgent/high priority, set B =
    not-specified/low; the join emits every same-customer overlapping
    pair with its overlap length.

    Scale shape — the bin-replication rewrite: every interval is
    replicated to the {_IVL_W}-day bins it touches (<=2 copies, since the
    max length 89 < bin width), the join is a pure EQUI-join on
    (customer, bin) — co-partitioned shuffle, sort-merge, zero nested
    loops (plan-linted) — and each surviving pair is attributed to
    exactly ONE bin, max(a.start_bin, b.start_bin), so no dedup pass is
    needed: if two intervals overlap, the later start lies inside both,
    hence that bin holds both copies; any other shared bin is filtered
    by the attribution equality. The oracle replays the naive
    range-predicate join — same rows, quadratic plan — which is exactly
    the rewrite's correctness claim. At 100 TB the shuffle is linear in
    replicated intervals and per-bin fan-out is bounded by interval
    density per customer-bin, the quantity a capacity planner already
    bounds."""
    o = load_table(spark, sf_dir, "orders")
    day = F.datediff(F.col("o_orderdate"), F.lit("1992-01-01").cast("date"))
    iv = o.select(
        F.col("o_orderkey").alias("k"),
        F.col("o_custkey").alias("ck"),
        F.col("o_orderpriority").alias("pr"),
        day.cast("bigint").alias("s"),
        (day + 30 + F.col("o_orderkey") % 60).cast("bigint").alias("e"),
    )
    a = iv.filter(F.col("pr").isin("1-URGENT", "2-HIGH"))
    b = iv.filter(F.col("pr").isin("4-NOT SPECIFIED", "5-LOW"))

    def binned(df, side):
        return df.select(
            F.col("k").alias(f"{side}_key"),
            F.col("ck").alias(f"{side}_ck"),
            F.col("s").alias(f"{side}_s"),
            F.col("e").alias(f"{side}_e"),
            F.explode(
                F.sequence(
                    F.expr(f"s div {_IVL_W}"), F.expr(f"e div {_IVL_W}")
                )
            ).alias(f"{side}_bin"),
        )

    ab = binned(a, "a")
    bb = binned(b, "b")
    joined = ab.join(
        bb,
        (F.col("a_ck") == F.col("b_ck")) & (F.col("a_bin") == F.col("b_bin")),
    ).filter(
        (F.col("a_s") <= F.col("b_e"))
        & (F.col("b_s") <= F.col("a_e"))
        # one-bin attribution: the pair counts only in the bin holding
        # the LATER of the two interval starts (covered by both sides
        # exactly when they overlap)
        & (
            F.col("a_bin")
            == F.greatest(
                F.expr(f"a_s div {_IVL_W}"), F.expr(f"b_s div {_IVL_W}")
            )
        )
    )
    return joined.select(
        F.col("a_ck").alias("custkey"),
        "a_key",
        "b_key",
        (
            F.least(F.col("a_e"), F.col("b_e"))
            - F.greatest(F.col("a_s"), F.col("b_s"))
            + 1
        ).alias("overlap_days"),
    )


_GRID_R2 = 4  # squared radius (r = 2)
_GRID_W = 2  # cell width — must be >= r for 3x3 neighborhood completeness
# 48-bit md5 coordinate hash: x in [0, 360), y = next digits in [0, 180)
_GRID_H_SQL = (
    "CAST(('0x' || substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 12)) AS BIGINT)"
)


@register(
    "grid_cell_neighbor_join",
    survey="NS-spatial(radius-neighbor self-join via 3x3 grid-cell replication — the scale path for spatial joins),J1,A3-A6",
    oracle=f"""
WITH p AS (
    SELECT o_orderkey AS pid,
           {_GRID_H_SQL} % 360 AS x,
           ({_GRID_H_SQL} // 360) % 180 AS y
    FROM orders
),
pairs AS (
    SELECT a.pid AS pid,
           (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS d2
    FROM p a JOIN p b
      ON b.x BETWEEN a.x - {_GRID_W} AND a.x + {_GRID_W}
     AND b.y BETWEEN a.y - {_GRID_W} AND a.y + {_GRID_W}
     AND a.pid <> b.pid
    WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) <= {_GRID_R2}
),
c AS (
    SELECT pid, CAST(COUNT(*) AS BIGINT) AS n_neighbors,
           CAST(MIN(d2) AS BIGINT) AS nearest_dist_sq
    FROM pairs GROUP BY pid
)
SELECT p.pid AS point_id,
       COALESCE(c.n_neighbors, 0) AS n_neighbors,
       c.nearest_dist_sq
FROM p LEFT JOIN c ON p.pid = c.pid
""",
)
def grid_cell_neighbor_join(spark, sf_dir):
    """Radius-neighbor spatial self-join — "every point's neighbors within
    r" across the WHOLE corpus, the geospatial primitive behind
    store-catchment overlap, sensor cross-validation, and collision
    screening. frame_nearest_defender joins within a pre-given frame
    key; here there is no key — the operator must INVENT the join key,
    and that invention (space partitioning) is the entire scale story.
    Points are md5-hashed onto a 360x180 field; output is every point
    with its within-r={_GRID_W} neighbor count and nearest squared
    distance (NULL when isolated).

    Scale shape: each point joins as probe replicated to its 3x3
    neighborhood of {_GRID_W}-wide grid cells (9 copies — cell width >=
    r guarantees any within-r neighbor lies in one of them), the join is
    a pure EQUI-join on the composite cell id, and candidates are
    distance-filtered post-join: co-partitioned shuffle, sort-merge,
    zero nested loops. The oracle replays the naive band-predicate join
    (DuckDB IEJoin). Per-task work is candidate pairs = 9 W^2 x mean
    cell density — on real spatial corpora density per cell is bounded
    (extent grows with data; cells partition-prune), while THIS fixed
    360x180 probe grows superlinearly in SF by construction (density^2
    candidate term), the same honestly-measured caveat as the pagerank
    panel's alpha=2."""
    # fan_out: the md5 coordinate hash and the ×9 neighborhood explode are
    # narrow — a single-file orders scan would run both on ONE core before
    # the cell-key join's exchange (guide §2.4; no-op at scale)
    o = fan_out(load_table(spark, sf_dir, "orders"))
    h = F.conv(
        F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 12), 16, 10
    ).cast("bigint")
    p = o.select(
        F.col("o_orderkey").alias("pid"), h.alias("h")
    ).select(
        "pid",
        (F.col("h") % 360).alias("x"),
        (F.expr("h div 360") % 180).alias("y"),
    )
    # composite cell id: cx in [0,180), cy in [0,90) at W=2 -> cx*256+cy
    cell = (F.expr(f"x div {_GRID_W}") * 256 + F.expr(f"y div {_GRID_W}"))
    base = p.select("pid", "x", "y", cell.alias("cell"))
    probe = (
        p.select(
            F.col("pid").alias("a_pid"),
            F.col("x").alias("a_x"),
            F.col("y").alias("a_y"),
            F.explode(F.expr("array(-1, 0, 1)")).alias("dx"),
        )
        .select(
            "a_pid",
            "a_x",
            "a_y",
            "dx",
            F.explode(F.expr("array(-1, 0, 1)")).alias("dy"),
        )
        .select(
            "a_pid",
            "a_x",
            "a_y",
            (
                (F.expr(f"a_x div {_GRID_W}") + F.col("dx")) * 256
                + (F.expr(f"a_y div {_GRID_W}") + F.col("dy"))
            ).alias("cell"),
        )
    )
    d2 = (F.col("a_x") - F.col("x")) * (F.col("a_x") - F.col("x")) + (
        F.col("a_y") - F.col("y")
    ) * (F.col("a_y") - F.col("y"))
    counts = (
        probe.join(base, "cell")
        .filter((F.col("a_pid") != F.col("pid")) & (d2 <= _GRID_R2))
        .groupBy(F.col("a_pid").alias("cpid"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_neighbors"),
            F.min(d2).cast("bigint").alias("nearest_dist_sq"),
        )
    )
    return p.join(counts, p.pid == counts.cpid, "left").select(
        F.col("pid").alias("point_id"),
        F.coalesce(F.col("n_neighbors"), F.lit(0).cast("bigint")).alias(
            "n_neighbors"
        ),
        "nearest_dist_sq",
    )


@register(
    "markov_next_event",
    survey="NS-seq(first-order Markov transition matrix over per-user event sequences),W1,A3",
    oracle="""
WITH tr AS (
    SELECT event_type AS from_type,
           LEAD(event_type) OVER (PARTITION BY user_id
                                  ORDER BY epoch_us(ts), event_id) AS to_type
    FROM events
),
c AS (
    SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n_transitions
    FROM tr WHERE to_type IS NOT NULL GROUP BY from_type, to_type
),
t AS (
    SELECT from_type, CAST(SUM(n_transitions) AS BIGINT) AS n_from
    FROM c GROUP BY from_type
)
SELECT c.from_type, c.to_type, c.n_transitions, t.n_from,
       c.n_transitions * 1000000 // t.n_from AS p_ppm
FROM c JOIN t ON c.from_type = t.from_type
""",
)
def markov_next_event(spark, sf_dir):
    """First-order Markov transition matrix over per-user event streams:
    for every (from_type, to_type) pair, the transition count and the
    empirical next-event probability in ppm — the sequence-model prior a
    behavioral pipeline fits before anything fancier (and the funnel
    entries' natural generalization from one hand-picked path to ALL
    paths). Probability is integer ppm (count*1e6 div row-total), exact in
    both engines; the ordering key includes event_id so ties in ts never
    make the lead() nondeterministic.

    Scale shape: ONE shuffle on user_id for the lead window (the module's
    standard per-entity frame — sorted within partitions, no global sort),
    then a map-side-combined aggregate to |event_types|² cells; the
    row-total join runs on that tiny matrix, never on the corpus. At
    100 TB this is the same plan with more user partitions."""
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    ev = load_table(spark, sf_dir, "events")
    tr = (
        ev.select("user_id", "ts_us", "event_id", "event_type")
        .withColumn("to_type", F.lead("event_type").over(w))
        .filter(F.col("to_type").isNotNull())
        .select(F.col("event_type").alias("from_type"), "to_type")
    )
    c = tr.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_transitions")
    )
    t = c.groupBy("from_type").agg(
        F.sum("n_transitions").cast("bigint").alias("n_from")
    )
    return c.join(t, "from_type").select(
        "from_type",
        "to_type",
        "n_transitions",
        "n_from",
        F.expr("n_transitions * 1000000 div n_from").alias("p_ppm"),
    )


# Fixed centering constants for the OLS trend: keep every product inside
# BIGINT at the test scales (x in ±~1300 days around the TPC-H date-range
# midpoint, y in ±~2.5e5 dollars around the mean order price).
_TREND_X0 = "1995-06-01"
_TREND_Y0 = 150000


@register(
    "trend_slope_by_group",
    survey="NS-stats(exact per-group OLS trend: integer moment sums, translation-invariant slope),A3-A6,F2",
    oracle=f"""
WITH b AS (
    SELECT o_orderpriority,
           CAST(datediff('day', DATE '{_TREND_X0}',
                         CAST(o_orderdate AS DATE)) AS BIGINT) AS x,
           CAST(floor(o_totalprice) AS BIGINT) - {_TREND_Y0} AS y
    FROM orders
),
s AS (
    SELECT o_orderpriority AS priority,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
           CAST(SUM(x*y) AS BIGINT) AS sxy, CAST(SUM(x*x) AS BIGINT) AS sxx
    FROM b GROUP BY o_orderpriority
)
SELECT priority, n,
       n*sxy - sx*sy AS cov_num,
       n*sxx - sx*sx AS var_num,
       CAST(n*sxy - sx*sy AS DOUBLE) / (n*sxx - sx*sx) AS slope_per_day
FROM s
""",
)
def trend_slope_by_group(spark, sf_dir):
    """Exact per-group OLS trend (is order value drifting over time, per
    priority class): slope = (nΣxy − ΣxΣy) / (nΣx² − (Σx)²) with every
    moment an integer sum — x = days since a fixed epoch midpoint, y =
    whole dollars around a fixed center (the formula is
    translation-invariant, so constant centering changes nothing but keeps
    nΣxy inside BIGINT: ~3e17 at sf0.1). The slope itself is the single
    division of two identical BIGINTs in both engines — bit-stable. The
    numerator/denominator are emitted too, so a consumer can re-derive
    intercept or r² without re-scanning.

    Scale shape: ONE map-side-combined aggregate over the scan to
    |groups| rows of 5 moments; no join, no window, no second pass. At
    corpus scale the only change is wider partial-agg buffers; past
    ~1e9 rows/group the moments move to DECIMAL(38,0) accumulators (the
    one disclosed adaptation)."""
    o = load_table(spark, sf_dir, "orders")
    x = F.datediff(
        F.col("o_orderdate").cast("date"), F.lit(_TREND_X0).cast("date")
    ).cast("bigint")
    y = F.floor("o_totalprice").cast("bigint") - F.lit(_TREND_Y0)
    s = (
        o.select(F.col("o_orderpriority").alias("priority"), x.alias("x"), y.alias("y"))
        .groupBy("priority")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("x").cast("bigint").alias("sx"),
            F.sum("y").cast("bigint").alias("sy"),
            F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
            F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        )
    )
    cov = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    var = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    return s.select(
        "priority",
        "n",
        cov.alias("cov_num"),
        var.alias("var_num"),
        (cov.cast("double") / var).alias("slope_per_day"),
    )


_SESSION_GAP_US = 28_800 * 1_000_000  # 8h inactivity closes a session


@register(
    "session_stats_batch",
    survey="NS-behavior(batch gap-rule sessionization: islands via lag+running-sum, per-session stats),W1,A3",
    oracle=f"""
WITH o AS (
    SELECT user_id, event_id, event_type, epoch_us(ts) AS t,
           CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                  OR epoch_us(ts) - lag(epoch_us(ts)) OVER w
                     > {_SESSION_GAP_US}
                THEN 1 ELSE 0 END AS brk
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
),
s AS (
    SELECT user_id, event_type, t,
           CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY t, event_id
                               ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS session_idx
    FROM o
)
SELECT user_id, session_idx,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types,
       MIN(t) AS start_us, MAX(t) AS end_us,
       MAX(t) - MIN(t) AS duration_us
FROM s
GROUP BY user_id, session_idx
""",
)
def session_stats_batch(spark, sf_dir):
    """Batch sessionization by the inactivity-gap rule (8 h here — sized
    to this corpus's 7.7 h median inter-event gap): the islands pattern —
    a lag() marks session BREAKS, a per-user running sum turns break
    flags into session indices, and a final aggregate emits per-session
    stats (event count, distinct types, span). This is the batch twin of
    the streaming session window (session_window_agg /
    streaming_session_e2e) with identical semantics on at-rest data,
    which is how a lambda-architecture backfill must behave.

    Scale shape: BOTH windows (lag and running sum) and the final
    aggregate share ONE user_id partitioning — a single Exchange, then
    per-partition sorted evaluation; session counts per user are bounded
    by the gap rule, so no key explodes. All arithmetic is epoch-µs
    BIGINT."""
    ev = load_table(spark, sf_dir, "events")
    w = _w()
    wsum = Window.partitionBy("user_id").orderBy("ts_us", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    brk = (
        F.when(
            F.lag("ts_us").over(w).isNull()
            | (F.col("ts_us") - F.lag("ts_us").over(w) > _SESSION_GAP_US),
            1,
        )
        .otherwise(0)
    )
    s = (
        ev.select("user_id", "event_id", "event_type", "ts_us")
        .withColumn("brk", brk)
        .withColumn("session_idx", F.sum("brk").over(wsum).cast("bigint"))
    )
    return s.groupBy("user_id", "session_idx").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.countDistinct("event_type").cast("bigint").alias("n_types"),
        F.min("ts_us").alias("start_us"),
        F.max("ts_us").alias("end_us"),
        (F.max("ts_us") - F.min("ts_us")).alias("duration_us"),
    )
