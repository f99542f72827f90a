"""Advanced relational operators beyond the reference's direct surface:
as-of join, range join, grouped top-k, rollup, batch sliding windows.

The reference has "no theta/range/as-of/anti joins" (SURVEY.md §2.3) but its
event-tag-propagation use case calls for as-of semantics (§2.3 note, §7);
these close that gap Spark-first. Each query pairs with an ANSI-SQL oracle
using the *same algorithmic formulation* (e.g. the as-of join is the
last-non-null-over-ordered-window form in both engines), so results
hash-match bit-exactly.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from gridiron_spark.functions.decimal_safe import dsum
from gridiron_spark.io.tables import load_table
from gridiron_spark.queries import register


@register(
    "asof_join_events",
    survey="J-asof(event-tag propagation): last-non-null over ordered window",
    oracle="""
SELECT event_id, user_id, ts_us, ref_ts_us, ref_value
FROM (
    SELECT event_id, user_id, event_type,
           epoch_us(ts) AS ts_us,
           last_value(CASE WHEN event_type = 'view' THEN epoch_us(ts) END IGNORE NULLS)
               OVER w AS ref_ts_us,
           last_value(CASE WHEN event_type = 'view' THEN value END IGNORE NULLS)
               OVER w AS ref_value
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                 ROWS UNBOUNDED PRECEDING)
)
WHERE event_type = 'click'
""",
)
def asof_join_events(spark, sf_dir):
    """As-of join, composition form: for each click, the user's most recent
    view at-or-before it. One shuffle on user_id + one sorted window pass —
    the scalable shape (a naive range self-join is quadratic per user; the
    sort-based form is how kdb/Flink implement as-of). Ties broken by
    event_id, identically in both engines."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    is_view = F.col("event_type") == "view"
    enriched = ev.select(
        "event_id",
        "user_id",
        "event_type",
        "ts_us",
        F.last(F.when(is_view, F.col("ts_us")), ignorenulls=True)
        .over(w)
        .alias("ref_ts_us"),
        F.last(F.when(is_view, F.col("value")), ignorenulls=True)
        .over(w)
        .alias("ref_value"),
    )
    return enriched.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts_us", "ref_ts_us", "ref_value"
    )


_BANDS = [("q0_10", 0.0, 10.0), ("q10_20", 10.0, 20.0), ("q20_30", 20.0, 30.0),
          ("q30_40", 30.0, 40.0), ("q40_up", 40.0, 1e9)]


@register(
    "range_join_bands",
    survey="J-range(banded dimension, broadcast nested-loop)",
    oracle=f"""
SELECT b.band,
       COUNT(*) AS n,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)))
            AS DOUBLE) AS revenue
FROM lineitem
JOIN (VALUES {", ".join(f"('{b}', {lo}, {hi})" for b, lo, hi in _BANDS)})
     AS b(band, lo, hi)
  ON l_quantity >= b.lo AND l_quantity < b.hi
GROUP BY b.band
""",
)
def range_join_bands(spark, sf_dir):
    """Range (theta) join against a tiny banding dimension: broadcast
    nested-loop on an interval predicate, then hash agg. The broadcast makes
    the inequality join a map-side pass at any fact-table scale; bands with
    wide intervals are the skew knob (disjoint bands → no fan-out)."""
    li = load_table(spark, sf_dir, "lineitem")
    bands = li.sparkSession.createDataFrame(_BANDS, "band string, lo double, hi double")
    joined = li.join(
        F.broadcast(bands),
        (F.col("l_quantity") >= F.col("lo")) & (F.col("l_quantity") < F.col("hi")),
    )
    return joined.groupBy("band").agg(
        F.count(F.lit(1)).alias("n"),
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"),
    )


@register(
    "topk_per_group",
    survey="W2+O5(grouped top-k via row_number)",
    oracle="""
SELECT o_custkey, o_orderkey, o_totalprice, rn
FROM (
    SELECT o_custkey, o_orderkey, o_totalprice,
           ROW_NUMBER() OVER (PARTITION BY o_custkey
                              ORDER BY o_totalprice DESC, o_orderkey) AS rn
    FROM orders
)
WHERE rn <= 3
""",
)
def topk_per_group(spark, sf_dir):
    """Top-3 orders per customer: row_number + filter — one shuffle, sort
    bounded per group; Spark pushes the rank filter into the sort via
    WindowGroupLimit (verify in explain: no full per-group materialization)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), "o_orderkey"
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


@register(
    "rollup_revenue",
    survey="A-rollup(hierarchical grouping sets)",
    oracle="""
SELECT year(o_orderdate) AS o_year,
       month(o_orderdate) AS o_month,
       GROUPING(year(o_orderdate), month(o_orderdate)) AS gid,
       COUNT(*) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS revenue
FROM orders
GROUP BY ROLLUP(year(o_orderdate), month(o_orderdate))
""",
)
def rollup_revenue(spark, sf_dir):
    """Year→month rollup with grand total: Catalyst expands grouping sets
    into one Expand + hash agg (single shuffle, partial-agg friendly)."""
    o = load_table(spark, sf_dir, "orders").select(
        F.year("o_orderdate").alias("o_year"),
        F.month("o_orderdate").alias("o_month"),
        "o_totalprice",
    )
    return o.rollup("o_year", "o_month").agg(
        F.grouping_id().alias("gid"),
        F.count(F.lit(1)).alias("n"),
        dsum("o_totalprice", "revenue"),
    )


@register(
    "multi_join_topk_revenue",
    survey="J1×2+A+O(3-way join, agg, top-k — TPC-H Q3 shape)",
    oracle="""
SELECT o_orderkey,
       year(o_orderdate) AS o_year,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)))
            AS DOUBLE) AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY o_orderkey, year(o_orderdate)
ORDER BY revenue DESC, o_orderkey
LIMIT 10
""",
)
def multi_join_topk_revenue(spark, sf_dir):
    """Customer→orders→lineitem revenue top-10 (Q3 shape): the segment
    filter prunes customer before the join (Catalyst pushes it to the scan);
    customer and the filtered orders broadcast under AQE, so lineitem — the
    100 TB side — is never shuffled; TakeOrderedAndProject caps the sort at
    k rows per partition."""
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("o_orderkey", F.year("o_orderdate").alias("o_year"))
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .orderBy(F.col("revenue").desc(), "o_orderkey")
        .limit(10)
    )


@register(
    "string_functions",
    survey="F-strings(regexp_replace/pad/translate/repeat/reverse)",
    oracle="""
SELECT c_custkey,
       regexp_replace(c_name, '[0-9]+', '#', 'g') AS name_masked,
       lpad(CAST(c_custkey AS VARCHAR), 12, '0') AS padded_key,
       reverse(c_mktsegment) AS seg_rev,
       repeat(substring(c_mktsegment, 1, 2), 3) AS seg_echo,
       translate(c_mktsegment, 'AEIOU', 'aeiou') AS seg_lowvowel
FROM customer
""",
)
def string_functions(spark, sf_dir):
    """String-function parity beyond the reference's lower/slice (SURVEY
    §2.8): regex masking, padding, translate — all JVM builtins, shared
    semantics with ANSI SQL (regex kept to character classes: Java and RE2
    agree)."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.regexp_replace("c_name", "[0-9]+", "#").alias("name_masked"),
        F.lpad(F.col("c_custkey").cast("string"), 12, "0").alias("padded_key"),
        F.reverse("c_mktsegment").alias("seg_rev"),
        F.repeat(F.substring("c_mktsegment", 1, 2), 3).alias("seg_echo"),
        F.translate("c_mktsegment", "AEIOU", "aeiou").alias("seg_lowvowel"),
    )


@register(
    "array_functions",
    survey="F-arrays(size/slice/min/max/contains/sort over array<float>)",
    oracle="""
SELECT vec_id,
       len(embedding) AS dims,
       CAST(embedding[1] AS DOUBLE) AS h1,
       CAST(embedding[2] AS DOUBLE) AS h2,
       CAST(embedding[3] AS DOUBLE) AS h3,
       CAST(embedding[4] AS DOUBLE) AS h4,
       CAST(list_min(embedding) AS DOUBLE) AS vmin,
       CAST(list_max(embedding) AS DOUBLE) AS vmax,
       CAST(list_sort(embedding[1:4])[1] AS DOUBLE) AS s1,
       CAST(list_sort(embedding[1:4])[4] AS DOUBLE) AS s4
FROM embeddings
""",
)
def array_functions(spark, sf_dir):
    """Array-function parity over the embedding column — the slice/min/max/
    sort primitives the vector and tensor operators compose; float32
    elements widen identically in both engines. Outputs are scalar DOUBLE
    projections of the slice/sort results (element extraction), NOT the
    arrays themselves: the driver's value hasher can't digest list cells,
    and float→string array_join would couple the check to each engine's
    float rendering. Element-wise extraction checks the same slice/sort
    semantics with exact float64 widening on both sides."""
    emb = load_table(spark, sf_dir, "embeddings")
    head4 = F.slice("embedding", 1, 4)
    sorted4 = F.sort_array(head4)
    return emb.select(
        "vec_id",
        F.size("embedding").alias("dims"),
        head4[0].cast("double").alias("h1"),
        head4[1].cast("double").alias("h2"),
        head4[2].cast("double").alias("h3"),
        head4[3].cast("double").alias("h4"),
        F.array_min("embedding").cast("double").alias("vmin"),
        F.array_max("embedding").cast("double").alias("vmax"),
        sorted4[0].cast("double").alias("s1"),
        sorted4[3].cast("double").alias("s4"),
    )


@register(
    "set_intersect_users",
    survey="SET-intersect(distinct set semantics)",
    oracle="""
SELECT user_id FROM events WHERE event_type = 'click'
INTERSECT
SELECT user_id FROM events WHERE event_type = 'purchase'
""",
)
def set_intersect_users(spark, sf_dir):
    """Users who both clicked and purchased — INTERSECT (distinct) lowers to
    a left-semi join over pre-distincted sides."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id")
    buys = ev.filter(F.col("event_type") == "purchase").select("user_id")
    return clicks.intersect(buys)


@register(
    "set_except_users",
    survey="SET-except(distinct set difference)",
    oracle="""
SELECT user_id FROM events WHERE event_type = 'click'
EXCEPT
SELECT user_id FROM events WHERE event_type = 'purchase'
""",
)
def set_except_users(spark, sf_dir):
    """Clickers who never purchased — EXCEPT (distinct) lowers to a
    left-anti join; the relational complement of set_intersect_users."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id")
    buys = ev.filter(F.col("event_type") == "purchase").select("user_id")
    return clicks.subtract(buys)  # subtract == EXCEPT DISTINCT


_EXISTS_SQL = """
SELECT s.s_suppkey, s.s_nationkey
FROM supplier s
WHERE EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity > 45
)
"""


@register(
    "sql_api_exists",
    survey="SQL-string API + correlated EXISTS (decorrelated to semi join)",
    oracle=_EXISTS_SQL,
)
def sql_api_exists(spark, sf_dir):
    """The spark.sql() surface: temp views + the *same SQL text* as the
    oracle. Catalyst decorrelates the EXISTS into a left semi join (no
    per-row subquery execution) — the plan to check in explain."""
    load_table(spark, sf_dir, "supplier").createOrReplaceTempView("supplier")
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(_EXISTS_SQL)


@register(
    "datetime_functions",
    survey="F-datetime(extract/trunc/diff — int-valued, tz-safe)",
    oracle="""
SELECT o_orderkey,
       year(o_orderdate) AS y,
       month(o_orderdate) AS m,
       day(o_orderdate) AS d,
       CAST(epoch(date_trunc('month', o_orderdate)) AS BIGINT) AS month_start_epoch,
       CAST(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS INTEGER) AS days_since_95
FROM orders
""",
)
def datetime_functions(spark, sf_dir):
    """Datetime parity: extraction, truncation, day arithmetic. Everything
    returns integers (epochs, not timestamps) — timestamp *values* don't
    cross engines safely (timezone rendering), integer time math does."""
    o = load_table(spark, sf_dir, "orders")
    # trunc() keeps DATE type and datediff*86400 keeps the epoch in pure
    # day arithmetic — unix_timestamp(date_trunc(...)) would route through
    # the session timezone and shift on a non-UTC driver host.
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("y"),
        F.month("o_orderdate").alias("m"),
        F.dayofmonth("o_orderdate").alias("d"),
        (
            F.datediff(
                F.trunc("o_orderdate", "month"), F.lit("1970-01-01").cast("date")
            ).cast("long")
            * 86400
        ).alias("month_start_epoch"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date"))
        .cast("int")
        .alias("days_since_95"),
    )


_UDAF_SCHEMA = "user_id bigint, n bigint, mean_value double, value_range double"


@register(
    "pandas_udaf_stats",
    survey="§2.9 grouped-agg pandas UDF — hash-checked via exact fsum",
    oracle="""
SELECT user_id,
       COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*)
           AS mean_value,
       MAX(value) - MIN(value) AS value_range
FROM events GROUP BY user_id
""",
)
def pandas_udaf_stats(spark, sf_dir):
    """Grouped aggregation through Arrow (applyInPandas as a UDAF): per-user
    event stats computed Python-side, under the repo's DECIMAL(18,6)
    quantize-then-sum contract applied INSIDE the UDAF so the entry stays
    hash-checked against DuckDB's CAST(double AS DECIMAL(18,6)) sum.

    The quantization is vectorized as scaled int64 —
    ``np.round(v·10⁶).astype(int64)`` sums exactly (|Σ| ≪ 2⁶³), and one
    float conversion + one double division then match the oracle's
    CAST(SUM(...) AS DOUBLE)/COUNT(*) operand-for-operand. Equivalence to
    the per-row ``Decimal(float(x)).quantize(10⁻⁶)`` path was verified
    value-for-value over the full sf0.01 and sf0.1 events tables (zero
    mismatches) before the swap; the only way the two can EVER differ is a
    rounding tie decided by the ~ulp error of the double product v·10⁶, so
    values within 10⁻⁶ of a .5 boundary (≫ that ulp, ≈2.4e-7 at |v·10⁶|≤1e9)
    are recomputed through Decimal — exact round-half-even on the true
    binary value — keeping the loop O(borderline), not O(rows), at 100×."""
    from decimal import Decimal

    import numpy as np
    import pandas as pd

    _Q = Decimal("0.000001")

    def _stats(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf["value"].to_numpy(dtype=np.float64)
        scaled = v * 1e6
        q = np.round(scaled).astype(np.int64)
        borderline = np.nonzero(
            np.abs(scaled - np.floor(scaled) - 0.5) < 1e-6
        )[0]
        for i in borderline:
            q[i] = int(Decimal(float(v[i])).quantize(_Q) * 1_000_000)
        s = Decimal(int(q.sum())) / Decimal(1_000_000)
        return pd.DataFrame(
            {
                "user_id": [int(pdf["user_id"].iloc[0])],
                "n": [len(v)],
                "mean_value": [float(s) / len(v)],
                "value_range": [float(v.max() - v.min())],
            }
        )

    ev = load_table(spark, sf_dir, "events")
    return ev.select("user_id", "value").groupBy("user_id").applyInPandas(
        _stats, schema=_UDAF_SCHEMA
    )


_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


@register(
    "pivot_event_counts",
    survey="A-pivot(long→wide with explicit value list)",
    oracle=f"""
SELECT user_id,
       {", ".join(f"COUNT(*) FILTER (event_type = '{t}') AS {t}" for t in _EVENT_TYPES)}
FROM events
GROUP BY user_id
""",
)
def pivot_event_counts(spark, sf_dir):
    """Per-user event-type pivot. The value list is explicit — at scale a
    dynamic pivot needs a driver-side distinct first (an extra job) and an
    unbounded column count; pinning the values keeps the plan a single
    hash agg. Absent combinations coalesce to 0 (pivot yields null)."""
    ev = load_table(spark, sf_dir, "events")
    pivoted = (
        ev.groupBy("user_id")
        .pivot("event_type", list(_EVENT_TYPES))
        .agg(F.count(F.lit(1)))
    )
    return pivoted.select(
        "user_id",
        *[F.coalesce(F.col(t), F.lit(0)).alias(t) for t in _EVENT_TYPES],
    )


_SLIDE_S = 300
_SLIDE_US = _SLIDE_S * 1_000_000


@register(
    "sliding_window_agg",
    survey="ST1(sliding window, batch form)",
    oracle=f"""
SELECT ws AS window_start, event_type, COUNT(*) AS n
FROM (
    SELECT event_type,
           (epoch_us(ts) // {_SLIDE_US}) * {_SLIDE_S} - u.k * {_SLIDE_S} AS ws
    FROM events
    CROSS JOIN (SELECT unnest([0, 1]) AS k) u
)
GROUP BY 1, 2
""",
)
def sliding_window_agg(spark, sf_dir):
    """10-minute windows sliding by 5: each event lands in exactly 2 buckets
    (F.window expands rows window/slide-fold before the agg — same plan in
    batch and streaming)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts_ts", "10 minutes", "5 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").cast("long").alias("window_start"), "event_type", "n"
        )
    )


@register(
    "cube_order_stats",
    survey="A-cube(full grouping-set lattice over status x priority)",
    oracle="""
SELECT o_orderstatus, o_orderpriority,
       GROUPING(o_orderstatus, o_orderpriority) AS gid,
       COUNT(*) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS revenue
FROM orders
GROUP BY CUBE(o_orderstatus, o_orderpriority)
""",
)
def cube_order_stats(spark, sf_dir):
    """CUBE completes the grouping-set family next to ROLLUP
    (`rollup_revenue`): all four (status, priority) lattice levels in ONE
    Expand + hash-aggregate pass — one shuffle total, vs four separate
    groupBys each shuffling the 100 TB fact table. grouping_id() matches
    DuckDB's GROUPING() bit layout (left arg = high bit)."""
    o = load_table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.grouping_id().alias("gid"),
        F.count(F.lit(1)).alias("n"),
        dsum("o_totalprice", "revenue"),
    )


@register(
    "scalar_subquery_idle_rich",
    survey="A-scalar-subquery+anti(TPC-H Q22 shape: above-avg balance, no orders)",
    oracle="""
WITH stats AS (
    SELECT SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS s,
           CAST(COUNT(*) AS DECIMAL(18,0)) AS cnt
    FROM customer WHERE c_acctbal > 0.0
)
SELECT c_nationkey, COUNT(*) AS numcust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS totacctbal
FROM customer, stats
WHERE CAST(c_acctbal AS DECIMAL(18,6)) * cnt > s
  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = customer.c_custkey)
GROUP BY c_nationkey
""",
)
def scalar_subquery_idle_rich(spark, sf_dir):
    """TPC-H Q22 shape: customers with above-average positive balance and no
    orders, per nation. The global average is a 1-row aggregate broadcast
    into the filter (scalar subquery -> broadcast nested loop over ONE row);
    NOT EXISTS is a left_anti hash join on o_custkey. The threshold compare
    is avg-free: `bal * cnt > sum` in exact decimal arithmetic on both
    engines, so the boundary is bit-deterministic (no double division).
    At 100 TB the anti join shuffles only (custkey) pairs; AQE broadcasts
    the distinct-custkey side if it fits."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").select("o_custkey")
    stats = (
        c.filter(F.col("c_acctbal") > 0.0)
        .agg(
            F.sum(F.col("c_acctbal").cast("decimal(18,6)")).alias("s"),
            F.count(F.lit(1)).cast("decimal(18,0)").alias("cnt"),
        )
    )
    rich = (
        c.crossJoin(F.broadcast(stats))
        .filter(F.col("c_acctbal").cast("decimal(18,6)") * F.col("cnt") > F.col("s"))
    )
    return (
        rich.join(o, rich["c_custkey"] == o["o_custkey"], "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum("c_acctbal", "totacctbal"),
        )
    )


@register(
    "conditional_agg_priority",
    survey="A-conditional(TPC-H Q12 shape: CASE-WHEN pivoted counts in one agg pass)",
    oracle="""
SELECT l_linestatus,
       COUNT(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 END)
           AS high_line_count,
       COUNT(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 END)
           AS low_line_count,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE)
           AS revenue
FROM orders
JOIN lineitem ON l_orderkey = o_orderkey
WHERE l_shipdate >= o_orderdate
GROUP BY l_linestatus
""",
)
def conditional_agg_priority(spark, sf_dir):
    """Conditional aggregation (TPC-H Q12 shape, reference has no counterpart;
    see SURVEY.md §2.4): per line-status counts of high/low-priority order
    lines plus decimal-exact revenue, all in ONE aggregation pass —
    ``count(when(...))`` pivots the priority predicate into columns instead of
    a second scan or a join-per-branch. Scale notes: orders↔lineitem is a
    same-key shuffle join (both sides large at 100 TB — no broadcast), the
    cross-table ``l_shipdate >= o_orderdate`` predicate applies post-join, and
    the 2-row groupBy aggregates map-side to near-nothing before its shuffle."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linestatus", "l_shipdate", "l_extendedprice", "l_discount"
    )
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .filter(F.col("l_shipdate") >= F.col("o_orderdate"))
        .groupBy("l_linestatus")
        .agg(
            F.count(F.when(hi, F.lit(1))).alias("high_line_count"),
            F.count(F.when(~hi, F.lit(1))).alias("low_line_count"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"),
        )
    )


@register(
    "outer_join_order_dist",
    survey="J-outer(TPC-H Q13 shape: left outer join + two-level aggregation)",
    oracle="""
SELECT c_count, COUNT(*) AS custdist
FROM (
    SELECT c_custkey, COUNT(o_orderkey) AS c_count
    FROM customer
    LEFT JOIN orders
      ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
    GROUP BY c_custkey
)
GROUP BY c_count
""",
)
def outer_join_order_dist(spark, sf_dir):
    """Customer order-count distribution (TPC-H Q13 shape; no reference
    counterpart — SURVEY.md §2.3 notes only inner joins exist there). The two
    outer-join subtleties this pins down: the priority predicate lives in the
    JOIN's ON clause, so non-matching customers are KEPT with null orders (a
    WHERE would silently turn the join inner), and ``COUNT(o_orderkey)``
    counts non-null matches only, yielding the zero-order bucket. Scale
    notes: one shuffle join on custkey (both sides large — no broadcast),
    then a custkey agg that reuses the join's partitioning (no extra
    exchange), then a tiny second-level shuffle on the distinct counts."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderpriority"
    )
    per_cust = (
        c.join(
            o,
            (c["c_custkey"] == o["o_custkey"])
            & (o["o_orderpriority"] != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "full_outer_debt_recon",
    survey="J-outer(full outer join: per-nation debt reconciliation with null sides)",
    oracle="""
WITH c AS (
    SELECT c_nationkey AS nationkey, COUNT(*) AS n_cust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS cust_debt
    FROM customer WHERE c_acctbal < 0 GROUP BY c_nationkey
),
s AS (
    SELECT s_nationkey AS nationkey, COUNT(*) AS n_supp,
           CAST(SUM(CAST(s_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS supp_debt
    FROM supplier WHERE s_acctbal < 0 GROUP BY s_nationkey
)
SELECT COALESCE(c.nationkey, s.nationkey) AS nationkey,
       COALESCE(n_cust, 0) AS n_cust,
       COALESCE(n_supp, 0) AS n_supp,
       COALESCE(cust_debt, 0.0) + COALESCE(supp_debt, 0.0) AS total_debt
FROM c FULL OUTER JOIN s ON c.nationkey = s.nationkey
""",
)
def full_outer_debt_recon(spark, sf_dir):
    """Full outer join reconciliation: per-nation negative account balances
    from BOTH customer and supplier sides, keeping nations present on either
    side only (at sf0.01, 21 of 25 nations have no indebted supplier — the
    null-padding path is genuinely exercised). COALESCE folds the two key
    columns and zero-fills the absent side; the debt total is ONE double
    addition after decimal-exact per-side sums, so it hash-matches. Scale
    notes: both inputs pre-aggregate to ≤|nations| rows BEFORE the join —
    reconcile aggregates, not raw rows; full outer cannot broadcast, but a
    25-row sort-merge join is free."""
    ca = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") < 0)
        .groupBy(F.col("c_nationkey").alias("c_nk"))
        .agg(
            F.count(F.lit(1)).alias("n_cust_raw"),
            dsum("c_acctbal", "cust_debt"),
        )
    )
    sa = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .groupBy(F.col("s_nationkey").alias("s_nk"))
        .agg(
            F.count(F.lit(1)).alias("n_supp_raw"),
            dsum("s_acctbal", "supp_debt"),
        )
    )
    return ca.join(sa, ca["c_nk"] == sa["s_nk"], "full").select(
        F.coalesce("c_nk", "s_nk").alias("nationkey"),
        F.coalesce("n_cust_raw", F.lit(0)).alias("n_cust"),
        F.coalesce("n_supp_raw", F.lit(0)).alias("n_supp"),
        (
            F.coalesce("cust_debt", F.lit(0.0)) + F.coalesce("supp_debt", F.lit(0.0))
        ).alias("total_debt"),
    )


@register(
    "late_supplier_blame",
    survey="J-semi/anti correlated (TPC-H Q21 shape: sole-blame supplier per order)",
    oracle="""
SELECT s_name, COUNT(*) AS numwait
FROM supplier
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders ON o_orderkey = l1.l_orderkey
WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_returnflag = 'R')
GROUP BY s_name
""",
)
def late_supplier_blame(spark, sf_dir):
    """TPC-H Q21 shape adapted to this schema (late := ``l_returnflag = 'R'``,
    since the synthetic lineitem has no receipt/commit dates): suppliers who
    are the SOLE returned-flag supplier on a multi-supplier finished order,
    counted once per qualifying line. The oracle states it as correlated
    EXISTS + NOT EXISTS self-joins; the Spark plan is the scalable rewrite —
    ONE pass over lineitem builds per-order stats (distinct suppliers,
    distinct 'late' suppliers), and both correlations become predicates on
    that aggregate (n_supp >= 2 ∧ n_late_supp = 1 ⇔ another supplier exists
    ∧ no OTHER late supplier exists, because l1's own supplier is late and
    counted). That turns two O(|lineitem|²)-ish correlated probes into one
    map-side-combinable agg plus an orderkey-partitioned join that reuses the
    agg's partitioning; supplier is a broadcast dim."""
    lt = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_returnflag"
    )
    ostats = lt.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(
            F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
        ).alias("n_late_supp"),
    )
    fin_orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey")
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        lt.filter(F.col("l_returnflag") == "R")
        .join(fin_orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(ostats, "l_orderkey")
        .filter((F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


@register(
    "groupwise_max_balance",
    survey="correlated scalar subquery (groupwise-max: richest customer per nation)",
    oracle="""
SELECT c_nationkey, c_custkey, c_name, c_acctbal
FROM customer c
WHERE c_acctbal = (SELECT MAX(c2.c_acctbal) FROM customer c2
                   WHERE c2.c_nationkey = c.c_nationkey)
""",
)
def groupwise_max_balance(spark, sf_dir):
    """Groupwise-max via correlated scalar subquery (the oracle's stated
    form): every customer whose balance equals their nation's maximum, ties
    kept. The Spark plan is the window rewrite — MAX over a nationkey
    partition, then filter-equal — which is ONE shuffle on nationkey and one
    streamed pass, versus the naive re-aggregate-and-join's two scans of the
    table. MAX of a double involves no summation, so cross-engine equality is
    exact. At 100 TB the window carries only (nationkey, acctbal) plus
    projected output columns, and low-cardinality partition keys (25 nations)
    would skew a row_number sort — but an unordered MAX frame is a running
    aggregate, not a sort, so skew costs only scan time."""
    w = Window.partitionBy("c_nationkey")
    return (
        load_table(spark, sf_dir, "customer")
        .select("c_nationkey", "c_custkey", "c_name", "c_acctbal")
        .withColumn("nation_max", F.max("c_acctbal").over(w))
        .filter(F.col("c_acctbal") == F.col("nation_max"))
        .drop("nation_max")
    )


@register(
    "json_functions",
    survey="F-json (semi-structured props column: parse + aggregate)",
    oracle="""
SELECT event_type,
       COUNT(*) AS n_events,
       COUNT(CAST(json_extract(props, '$.k') AS BIGINT)) AS n_with_k,
       CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       MIN(CAST(json_extract(props, '$.k') AS BIGINT)) AS min_k,
       MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS max_k,
       CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS DOUBLE)
           / COUNT(CAST(json_extract(props, '$.k') AS BIGINT)) AS avg_k
FROM events
GROUP BY event_type
""",
)
def json_functions(spark, sf_dir):
    """JSON functions over the semi-structured ``events.props`` column
    (reference keeps raw strings and "parses later" — SURVEY.md §1.2; this is
    the parse-later path done engine-side). ``from_json`` with an explicit
    one-field schema parses inside whole-stage codegen — no Python, no
    schema inference pass — and Catalyst prunes the parquet scan to
    (event_type, props). Integer sums are exact in both engines; the average
    is ONE double division of exact integers, so it hash-matches bit-exactly.
    At scale: map-side partial aggregation collapses to |event_type| groups
    before the only shuffle."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.from_json("props", "k BIGINT").getField("k").alias("k"),
    )
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count("k").alias("n_with_k"),
        F.sum("k").alias("sum_k"),
        F.min("k").alias("min_k"),
        F.max("k").alias("max_k"),
        (F.sum("k").cast("double") / F.count("k")).alias("avg_k"),
    )


@register(
    "grouping_sets_mix",
    survey="A-grouping-sets (asymmetric lattice: two disjoint groupings, one pass)",
    oracle="""
SELECT GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS gid,
       l_returnflag, l_linestatus, COUNT(*) AS n,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
""",
)
def grouping_sets_mix(spark, sf_dir):
    """GROUPING SETS completes the lattice family next to ROLLUP
    (`rollup_revenue`) and CUBE (`cube_order_stats`): an ASYMMETRIC set pair
    — by returnflag and, separately, by linestatus — that neither rollup nor
    cube can express without computing unwanted levels. Still ONE Expand +
    hash-aggregate pass over the fact table (each input row fans out to
    exactly 2 lattice rows, collapses map-side to ≤|flag|+|status| groups
    before the single shuffle), vs two separate 100 TB groupBy scans.
    grouping_id() matches DuckDB's GROUPING() bit layout (left arg = high
    bit)."""
    lt = load_table(spark, sf_dir, "lineitem")
    return lt.groupingSets(
        [["l_returnflag"], ["l_linestatus"]], "l_returnflag", "l_linestatus"
    ).agg(
        F.grouping_id().alias("gid"),
        F.count(F.lit(1)).alias("n"),
        dsum("l_quantity", "sum_qty"),
    )


@register(
    "map_functions",
    survey="F-map (map construction / interrogation / explosion round-trip)",
    oracle="""
SELECT user_id, event_type, n,
       COUNT(*) OVER (PARTITION BY user_id) AS n_types
FROM (
    SELECT user_id, event_type, COUNT(*) AS n
    FROM events GROUP BY user_id, event_type
)
""",
)
def map_functions(spark, sf_dir):
    """Map-typed column surface: per-user event-type counts are packed into a
    ``map<string,bigint>`` (map_from_entries over a sorted entry array),
    interrogated with size(), and exploded back to flat rows. The round-trip
    proves construction/explosion are lossless, and flat rows are what the
    cross-engine oracle can hash (map serialization differs between engines;
    exploding is also the right 100 TB answer — maps travel as one row per
    user through shuffles, then restore row-form for downstream relational
    ops). One shuffle on (user_id, event_type) with map-side partials, one on
    user_id; the pack/explode stages are narrow."""
    ev = load_table(spark, sf_dir, "events")
    per_type = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    packed = per_type.groupBy("user_id").agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("event_type", "n")))
        ).alias("m")
    )
    return packed.select(
        "user_id",
        F.explode("m").alias("event_type", "n"),
        F.size("m").alias("n_types"),
    )


@register(
    "disjunctive_join_revenue",
    survey="J-disjunctive (TPC-H Q19 shape: OR-of-conjuncts join predicate)",
    oracle="""
SELECT CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)))
            AS DOUBLE) AS revenue,
       COUNT(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
       AND l_quantity BETWEEN 10 AND 35)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
       AND l_quantity BETWEEN 20 AND 50)
""",
)
def disjunctive_join_revenue(spark, sf_dir):
    """TPC-H Q19 shape: an equi-join whose residual is an OR of brand/size/
    quantity conjunct brackets. The planner keeps the equi-conjunct
    (l_partkey = p_partkey) as the join key and evaluates the disjunction as
    a post-join residual, while CNF extraction pushes the single-table
    implications down to both scans: part prunes to the three brands' size
    union, lineitem to quantity [1,50] — at 100 TB that pushdown, visible as
    PushedFilters on both sides, is most of the win. part is the broadcast
    dim; the decimal revenue sum makes the double bit-stable."""
    lt = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    pt = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    bracket = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 20)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(10, 30)
            & F.col("l_quantity").between(10, 35)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(20, 50)
            & F.col("l_quantity").between(20, 50)
        )
    )
    return (
        lt.join(F.broadcast(pt), F.col("l_partkey") == F.col("p_partkey"))
        .filter(bracket)
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


_ASOF_TOL_US = 3_600_000_000  # 1 hour


@register(
    "asof_forward_tolerance",
    survey="J-asof(forward direction + staleness tolerance — the other merge_asof half)",
    oracle=f"""
SELECT event_id, user_id, ts_us,
       CASE WHEN nxt_ts_us IS NOT NULL AND nxt_ts_us - ts_us <= {_ASOF_TOL_US}
            THEN nxt_ts_us END AS ref_ts_us,
       CASE WHEN nxt_ts_us IS NOT NULL AND nxt_ts_us - ts_us <= {_ASOF_TOL_US}
            THEN nxt_value END AS ref_value
FROM (
    SELECT event_id, user_id, event_type,
           epoch_us(ts) AS ts_us,
           first_value(CASE WHEN event_type = 'view' THEN epoch_us(ts) END
                       IGNORE NULLS) OVER w AS nxt_ts_us,
           first_value(CASE WHEN event_type = 'view' THEN value END
                       IGNORE NULLS) OVER w AS nxt_value
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
WHERE event_type = 'click'
""",
)
def asof_forward_tolerance(spark, sf_dir):
    """As-of join, FORWARD direction with a staleness tolerance: for each
    click, the user's next view at-or-after it, nulled when the gap exceeds
    1 hour — the other half of the merge_asof surface (asof_join_events is
    backward/unbounded). Same scalable shape: one shuffle on user_id, one
    sorted window pass with a FOLLOWING frame; the tolerance is a post-hoc
    null-out, NOT a range join, so nothing goes quadratic. All time math in
    integer microseconds (tz-free, bit-exact)."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    is_view = F.col("event_type") == "view"
    nxt_ts = F.first(F.when(is_view, F.col("ts_us")), ignorenulls=True).over(w)
    nxt_val = F.first(F.when(is_view, F.col("value")), ignorenulls=True).over(w)
    in_tol = nxt_ts.isNotNull() & (nxt_ts - F.col("ts_us") <= _ASOF_TOL_US)
    return (
        ev.select(
            "event_id",
            "user_id",
            "event_type",
            "ts_us",
            F.when(in_tol, nxt_ts).alias("ref_ts_us"),
            F.when(in_tol, nxt_val).alias("ref_value"),
        )
        .filter(F.col("event_type") == "click")
        .select("event_id", "user_id", "ts_us", "ref_ts_us", "ref_value")
    )


@register(
    "recursive_cte_hierarchy",
    survey="SQL-surface(WITH RECURSIVE hierarchy walk — Spark 4 recursive CTE vs DuckDB recursive CTE),A3-A6",
    oracle="""
WITH RECURSIVE chain AS (
    SELECT o_orderkey AS node, o_totalprice AS price,
           o_orderkey AS cur, 0 AS depth
    FROM orders
    UNION ALL
    SELECT node, price, cur // 8, depth + 1
    FROM chain WHERE cur >= 8
)
SELECT depth,
       CAST(COUNT(*) AS BIGINT) AS n_nodes,
       CAST(COUNT(DISTINCT cur) AS BIGINT) AS n_roots,
       CAST(SUM(CAST(price AS DECIMAL(18,6))) AS DOUBLE) AS sum_price
FROM chain
WHERE cur < 8
GROUP BY depth
""",
)
def recursive_cte_hierarchy(spark, sf_dir):
    """WITH RECURSIVE — the SQL-surface capability that separates a
    warehouse from a query runner (org charts, bill-of-materials
    explosions, graph reachability), newly native in Spark 4's parser
    and executed as an iterative UnionLoop. Every order walks its
    synthetic reporting chain (parent = key div 8) up to its root
    (key < 8); the rollup reports, per chain depth, how many nodes live
    there, how many distinct roots they reach, and their decimal-exact
    price total. Depth is log8(max key) — bounded by the KEY DOMAIN, so
    the loop iterates ~6 times regardless of row count.

    Scale shape: each recursion step is a map-only projection + filter
    over the frontier (no join — the parent is computed, not looked up;
    a foreign-key hierarchy would make each step a co-partitioned join,
    same loop). The frontier SHRINKS monotonically (rows retire at their
    root), the final aggregate is map-side combined on ~6 depth groups,
    and the decimal sum follows the repo's exact-aggregation discipline.
    The oracle runs the IDENTICAL recursive SQL in DuckDB — dialect
    difference is exactly `div` vs `//`."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "rec_hierarchy_orders"
    )
    return spark.sql("""
WITH RECURSIVE chain AS (
    SELECT o_orderkey AS node, o_totalprice AS price,
           o_orderkey AS cur, 0 AS depth
    FROM rec_hierarchy_orders
    UNION ALL
    SELECT node, price, cur div 8, depth + 1
    FROM chain WHERE cur >= 8
)
SELECT depth,
       CAST(COUNT(*) AS BIGINT) AS n_nodes,
       CAST(COUNT(DISTINCT cur) AS BIGINT) AS n_roots,
       CAST(SUM(CAST(price AS DECIMAL(18,6))) AS DOUBLE) AS sum_price
FROM chain
WHERE cur < 8
GROUP BY depth
""")
