"""Scale-technique queries: skew-salted aggregation, anti join, exact
quantiles, regex (BPE-ish) tokenization. Each demonstrates a 100 TB pattern
whose *result* is ordinary SQL — so the oracle checks the technique costs
nothing in correctness."""

from __future__ import annotations

from pyspark.sql import functions as F

from gridiron_spark.functions.decimal_safe import dec
from gridiron_spark.io.tables import fan_out, load_table
from gridiron_spark.operators.skew import salted_agg
from gridiron_spark.queries import register


@register(
    "salted_hot_key_agg",
    survey="A-skew(two-stage salted aggregation over hot keys)",
    oracle="""
SELECT event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM events
GROUP BY event_type
""",
)
def salted_hot_key_agg(spark, sf_dir):
    """events grouped by event_type — a handful of distinct values, i.e. the
    canonical hot-key aggregation. Salting on pmod(event_id, 16) splits each
    key's merge across 16 tasks; the decimal sum keeps the two-stage result
    bit-equal to the direct aggregation (associativity), which the oracle
    verifies against plain GROUP BY."""
    ev = load_table(spark, sf_dir, "events")
    return salted_agg(
        ev,
        keys=["event_type"],
        salt_source=F.col("event_id"),
        partial_aggs=[
            F.count(F.lit(1)).alias("n_part"),
            F.sum(dec("value")).alias("sum_part"),
        ],
        merge_aggs=[
            F.sum("n_part").alias("n"),
            F.sum("sum_part").cast("double").alias("sum_value"),
        ],
    )


@register(
    "anti_join_customers",
    survey="J-anti(left anti join)",
    oracle="""
SELECT c_custkey, c_mktsegment
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
""",
)
def anti_join_customers(spark, sf_dir):
    """Customers with no orders: left anti join (broadcast of the distinct
    key set when it fits; shuffle-hash otherwise — Catalyst's choice)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(
        o, c["c_custkey"] == o["o_custkey"], "left_anti"
    ).select("c_custkey", "c_mktsegment")


@register(
    "quantile_stats",
    survey="A-quantile(exact percentiles per group)",
    oracle="""
SELECT event_type,
       COUNT(*) AS n,
       quantile_cont(value, 0.5) AS p50,
       quantile_cont(value, 0.95) AS p95
FROM events
GROUP BY event_type
""",
)
def quantile_stats(spark, sf_dir):
    """Exact per-group percentiles (linear interpolation — the ANSI
    PERCENTILE_CONT definition both engines implement). Exact quantiles sort
    within group; at 100 TB swap to approx_percentile with a documented
    error bound — kept exact here so the oracle can hash-match."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.percentile("value", F.lit(0.5)).alias("p50"),
        F.percentile("value", F.lit(0.95)).alias("p95"),
    )


_CMS_DEPTH = 4
_CMS_WIDTH = 256


@register(
    "countmin_sketch",
    survey="A-sketch(count-min over user_id — mergeable, deterministic)",
    oracle=f"""
SELECT k.i AS row_i,
       CAST(('0x' || substring(md5(user_id || '|' || k.i), 1, 8)) AS BIGINT)
           % {_CMS_WIDTH} AS bucket,
       COUNT(*) AS cnt
FROM events
CROSS JOIN (SELECT unnest(range(0, {_CMS_DEPTH})) AS i) k
GROUP BY 1, 2
""",
)
def countmin_sketch(spark, sf_dir):
    """Count-min sketch of user_id frequencies: depth {d} md5-derived hash
    rows × width {w} buckets. The sketch is a plain aggregation — partial
    (map-side) counts merge associatively, so at 100 TB the full sketch
    costs one shuffle of ≤ d·w rows regardless of input size, and sketches
    from separate partitions/days merge by cell-wise addition. Point
    estimate for a key = min over rows of its bucket counts (≥ true count;
    error bounded by N·e/w per the CMS guarantee) — checked in pytest; the
    deterministic hash family makes sketch *construction* oracle-exact.
    """
    ev = load_table(spark, sf_dir, "events")
    uid = F.col("user_id").cast("string")
    cells = F.array(
        *[
            F.struct(
                F.lit(i).alias("row_i"),
                (
                    F.conv(
                        F.substring(F.md5(F.concat(uid, F.lit(f"|{i}"))), 1, 8),
                        16,
                        10,
                    ).cast("bigint")
                    % _CMS_WIDTH
                ).alias("bucket"),
            )
            for i in range(_CMS_DEPTH)
        ]
    )
    return (
        ev.select(F.explode(cells).alias("c"))
        .select("c.row_i", "c.bucket")
        .groupBy("row_i", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


countmin_sketch.__doc__ = countmin_sketch.__doc__.format(d=_CMS_DEPTH, w=_CMS_WIDTH)


_HLL_BUCKETS = 64


@register(
    "hll_distinct_sketch",
    survey="A-sketch(HyperLogLog registers over user_id — mergeable, deterministic)",
    oracle=f"""
SELECT bucket, MAX(rho) AS max_rho
FROM (
    SELECT CAST(('0x' || substring(md5(user_id || '|b'), 1, 8)) AS BIGINT)
               % {_HLL_BUCKETS} AS bucket,
           CASE WHEN w = 0 THEN 33 ELSE 33 - length(bin(w)) END AS rho
    FROM (
        SELECT CAST(('0x' || substring(md5(user_id || '|r'), 1, 8)) AS BIGINT) AS w,
               user_id
        FROM events
    )
)
GROUP BY bucket
""",
)
def hll_distinct_sketch(spark, sf_dir):
    """HyperLogLog register array for distinct user_ids: {m} buckets, each
    holding max(rho) where rho = 1 + leading-zero count of a 32-bit
    md5-derived hash. Like the count-min entry, the sketch IS an
    aggregation — per-bucket MAX merges associatively, so at 100 TB the
    full register array costs one map-side-combined shuffle of ≤ {m} rows
    regardless of input size, and per-partition/day sketches merge by
    cell-wise MAX (the property that makes HLL the standard distinct
    counter for 100 TB pipelines, vs an exact countDistinct whose shuffle
    carries every distinct key). rho uses length(bin(w)) — an integer op,
    identical in Spark and DuckDB (both strip leading zeros) — never
    floating log2. The estimate (alpha·m²/Σ2^-M_j, checked in pytest)
    lands within the ~1.04/√m ≈ 13% HLL bound; the deterministic hash
    family makes sketch *construction* oracle-exact.
    """
    return hll_registers(load_table(spark, sf_dir, "events"))


hll_distinct_sketch.__doc__ = hll_distinct_sketch.__doc__.format(m=_HLL_BUCKETS)


def hll_registers(ev):
    """Register-array aggregation over any DataFrame with ``user_id`` —
    exposed separately so sketches over shards can be built and MAX-merged
    (mergeability is asserted in tests/test_scale_ops.py)."""
    uid = F.col("user_id").cast("string")
    bucket = (
        F.conv(F.substring(F.md5(F.concat(uid, F.lit("|b"))), 1, 8), 16, 10).cast(
            "bigint"
        )
        % _HLL_BUCKETS
    )
    w = F.conv(F.substring(F.md5(F.concat(uid, F.lit("|r"))), 1, 8), 16, 10).cast(
        "bigint"
    )
    rho = F.when(w == 0, F.lit(33)).otherwise(33 - F.length(F.bin(w)))
    return (
        ev.select(bucket.alias("bucket"), rho.alias("rho"))
        .groupBy("bucket")
        .agg(F.max("rho").alias("max_rho"))
    )


# RE2-safe (no lookahead) GPT-2-style pre-tokenizer classes: space-prefixed
# letter runs, digit runs, punctuation runs. Identical match semantics in
# Java regex (Spark) and RE2 (DuckDB) because only character classes are used.
_BPE_RE = " ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+"


@register(
    "text_regex_tokens",
    survey="NS-text(BPE-ish regex tokenization)",
    oracle=f"""
SELECT doc_id,
       len(regexp_extract_all(lower(text), '{_BPE_RE}')) AS n_bpe_tokens,
       len(string_split(text, ' ')) AS n_ws_tokens
FROM documents
""",
)
def text_regex_tokens(spark, sf_dir):
    """Token counting, BPE-pre-tokenizer flavor: count regex segment matches
    (letter/digit/punct runs with space prefixes) next to the whitespace
    count — the standard cheap proxy pair for LLM token budgeting."""
    doc = load_table(spark, sf_dir, "documents")
    return doc.select(
        "doc_id",
        F.size(F.regexp_extract_all(F.lower("text"), F.lit(_BPE_RE), 0)).alias(
            "n_bpe_tokens"
        ),
        F.size(F.split(F.col("text"), " ")).alias("n_ws_tokens"),
    )


_HOUR_US = 3_600_000_000


@register(
    "resample_forward_fill",
    survey="A-resample(timeline densification + forward fill, training-pipeline op)",
    oracle=f"""
WITH dedup AS (
    SELECT user_id, epoch_us(ts) AS ts_us,
           arg_max(value, event_id) AS value
    FROM events GROUP BY user_id, epoch_us(ts)
),
b AS (
    SELECT user_id, ts_us // {_HOUR_US} AS bucket,
           arg_max(value, ts_us) AS value
    FROM dedup GROUP BY user_id, ts_us // {_HOUR_US}
),
bounds AS (
    SELECT user_id, MIN(bucket) AS lo, MAX(bucket) AS hi FROM b GROUP BY user_id
),
grid AS (
    SELECT user_id, unnest(range(lo, hi + 1)) AS bucket FROM bounds
)
SELECT g.user_id, g.bucket * 3600 AS grid_start,
       last_value(b.value IGNORE NULLS)
           OVER (PARTITION BY g.user_id ORDER BY g.bucket
                 ROWS UNBOUNDED PRECEDING) AS value
FROM grid g LEFT JOIN b ON b.user_id = g.user_id AND b.bucket = g.bucket
""",
)
def resample_forward_fill(spark, sf_dir):
    """Per-user hourly timeline densification with forward fill — the
    resampling pass a training pipeline runs before windowed feature
    extraction (fixed-grid inputs from irregular events).

    The scale design avoids the naive as-of range join entirely: events
    collapse to per-(user, bucket) last values (map-side combinable), the
    dense grid is generated from per-user bounds (sequence + explode — fan
    out bounded by span/step), and the fill is one last(ignorenulls)
    window per user — every stage keyed on user_id, one partitioning
    reused throughout. Ties (same user, same microsecond) break on
    event_id, making the carried double bit-deterministic cross-engine."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    dedup = (
        ev.groupBy("user_id", "ts_us")
        .agg(F.max_by("value", "event_id").alias("value"))
    )
    b = (
        dedup.withColumn("bucket", F.expr(f"ts_us DIV {_HOUR_US}"))
        .groupBy("user_id", "bucket")
        .agg(F.max_by("value", "ts_us").alias("value"))
    )
    bounds = b.groupBy("user_id").agg(
        F.min("bucket").alias("lo"), F.max("bucket").alias("hi")
    )
    grid = bounds.select(
        "user_id", F.explode(F.sequence("lo", "hi")).alias("bucket")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(b, ["user_id", "bucket"], "left")
        .select(
            "user_id",
            (F.col("bucket") * 3600).alias("grid_start"),
            F.last("value", ignorenulls=True).over(w).alias("value"),
        )
    )


@register(
    "histogram_quantile_sketch",
    survey="A-sketch(mergeable fixed-bin histogram quantiles)",
    oracle="""
WITH b AS (
    SELECT event_type, CAST(floor(value) AS BIGINT) // 10 AS bin FROM events
),
c AS (SELECT event_type, bin, COUNT(*) AS cnt FROM b GROUP BY 1, 2),
cc AS (
    SELECT event_type, bin, cnt,
           SUM(cnt) OVER (PARTITION BY event_type ORDER BY bin
                          ROWS UNBOUNDED PRECEDING) AS cum,
           SUM(cnt) OVER (PARTITION BY event_type) AS total
    FROM c
)
SELECT event_type, CAST(MAX(total) AS BIGINT) AS n,
       MIN(CASE WHEN cum >= (total + 1) // 2 THEN bin END) * 10 AS p50_lo,
       MIN(CASE WHEN cum >= (9 * total + 9) // 10 THEN bin END) * 10 AS p90_lo,
       MIN(CASE WHEN cum >= (99 * total + 99) // 100 THEN bin END) * 10 AS p99_lo
FROM cc GROUP BY event_type
""",
)
def histogram_quantile_sketch(spark, sf_dir):
    """Quantile estimation from a mergeable fixed-bin histogram — the
    100 TB substitute for exact PERCENTILE_CONT (quantile_stats) when the
    value domain is bounded: per-key bin counts are the sketch (map-side
    combinable, mergeable across partitions/days/tables by plain SUM),
    and quantile extraction runs over at most keys x bins rows. All
    arithmetic is integer (bin = floor(value) DIV 10, rank = ceil via
    integer division), so the estimate is bit-exact cross-engine —
    the technique costs nothing in checkability, unlike engine-private
    t-digest/KLL."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    c = (
        ev.select(
            "event_type",
            F.expr("CAST(floor(value) AS BIGINT) DIV 10").alias("bin"),
        )
        .groupBy("event_type", "bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wt = Window.partitionBy("event_type")
    cc = c.withColumn("cum", F.sum("cnt").over(w)).withColumn(
        "total", F.sum("cnt").over(wt)
    )
    def _pick(rank_expr):
        return F.min(F.when(F.col("cum") >= F.expr(rank_expr), F.col("bin")))

    return cc.groupBy("event_type").agg(
        F.max("total").alias("n"),
        (_pick("(total + 1) DIV 2") * 10).alias("p50_lo"),
        (_pick("(9 * total + 9) DIV 10") * 10).alias("p90_lo"),
        (_pick("(99 * total + 99) DIV 100") * 10).alias("p99_lo"),
    )


@register(
    "mixture_token_budget",
    survey="NS-sampling(data-mixture downsampling under per-source token budgets),O5,A6",
    oracle="""
WITH d AS (
    SELECT doc_id, source,
           len(string_split(text, ' ')) AS n_tokens,
           md5(CAST(doc_id AS VARCHAR)) AS ord
    FROM documents
),
b AS (
    SELECT source,
           (SUM(n_tokens) * ((CAST(substring(source, 4) AS INT) % 3) + 1)) // 5
               AS budget
    FROM d GROUP BY source
),
c AS (
    SELECT doc_id, source, n_tokens,
           CAST(SUM(n_tokens) OVER (
               PARTITION BY source ORDER BY ord, doc_id
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
    FROM d
)
SELECT c.doc_id, c.source, c.n_tokens, c.cum_tokens
FROM c JOIN b USING (source)
WHERE c.cum_tokens <= b.budget
""",
)
def mixture_token_budget(spark, sf_dir):
    """Data-mixture construction: downsample every source to a per-source
    token budget (here 20/40/60% of its tokens, keyed off the source name so
    the mix is heterogeneous), selecting docs in deterministic md5 order —
    the pass that turns raw per-source corpora into the weighted training
    mix an LLM run actually consumes.

    The hard part at 100 TB is the per-source *cumulative* token count that
    decides where each source's budget line falls: sources are few and
    corpus-sized, so ``SUM() OVER (PARTITION BY source ORDER BY md5)`` would
    drag whole sources onto single tasks. grouped_running_sum
    (operators/ordered.py) gives the same running total through a range
    exchange + broadcast prefix-sum offsets, keeping parallelism at
    |partitions|. Budgets are integer arithmetic (tokens × mix-numerator div
    5) — no double rounding to diverge cross-engine — and the budget table
    (|sources| rows) broadcasts.
    """
    from gridiron_spark.operators.ordered import grouped_running_sum

    doc = load_table(spark, sf_dir, "documents")
    d = doc.select(
        "doc_id",
        "source",
        F.size(F.split(F.col("text"), " ")).alias("n_tokens"),
        F.md5(F.col("doc_id").cast("string")).alias("ord"),
    )
    budgets = (
        d.groupBy("source")
        .agg(F.sum("n_tokens").alias("tot"))
        .select(
            "source",
            F.expr(
                "(tot * ((CAST(substring(source, 4) AS INT) % 3) + 1)) div 5"
            ).alias("budget"),
        )
    )
    cum = grouped_running_sum(
        d, ["source"], ["ord", "doc_id"], "n_tokens", out_col="cum_tokens"
    )
    return (
        cum.join(F.broadcast(budgets), "source")
        .filter(F.col("cum_tokens") <= F.col("budget"))
        .select(
            "doc_id",
            "source",
            "n_tokens",
            F.col("cum_tokens").cast("bigint").alias("cum_tokens"),
        )
    )


_BLOOM_M = 8192  # bits
_BLOOM_K = 3     # hash functions

_BLOOM_POS_SQL = (
    "CAST(('0x' || substring(md5(CAST({key} AS VARCHAR) || '|' || {j}), 1, 8)) "
    f"AS BIGINT) % {_BLOOM_M}"
)


@register(
    "bloom_prefilter_join",
    survey="A-sketch(explicit bloom filter: build/broadcast/probe semi-join prefilter with FP accounting),J1,A3-A6",
    oracle=f"""
WITH b AS (
    SELECT DISTINCT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
),
bits AS (
    SELECT list(DISTINCT p) AS bitset FROM (
        SELECT {_BLOOM_POS_SQL.format(key="c_custkey", j="k.j")} AS p
        FROM b CROSS JOIN (SELECT unnest(range(0, {_BLOOM_K})) AS j) k
    )
),
probe AS (
    SELECT o.o_orderpriority,
           CASE WHEN list_contains(bits.bitset, {_BLOOM_POS_SQL.format(key="o_custkey", j="0")})
                 AND list_contains(bits.bitset, {_BLOOM_POS_SQL.format(key="o_custkey", j="1")})
                 AND list_contains(bits.bitset, {_BLOOM_POS_SQL.format(key="o_custkey", j="2")})
                THEN 1 ELSE 0 END AS bloom_pass,
           CASE WHEN b.c_custkey IS NOT NULL THEN 1 ELSE 0 END AS is_true
    FROM orders o CROSS JOIN bits
    LEFT JOIN b ON b.c_custkey = o.o_custkey
)
SELECT o_orderpriority,
       COUNT(*) AS n_probed,
       CAST(SUM(bloom_pass) AS BIGINT) AS n_bloom_pass,
       CAST(SUM(is_true) AS BIGINT) AS n_true,
       CAST(SUM(CASE WHEN bloom_pass = 1 AND is_true = 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_false_pos
FROM probe
GROUP BY o_orderpriority
""",
)
def bloom_prefilter_join(spark, sf_dir):
    """Explicit bloom-filter semi-join prefilter — the third mergeable
    sketch next to count-min and HLL, and the user-space analog of the
    engine's injected runtime filter (tests/test_runtime_filter.py pins
    that rewrite firing on these join shapes): build a {m}-bit / {k}-hash
    bloom set of the selective build-side keys (BUILDING-segment
    customers), broadcast it as ONE row, and flag every probe-side order
    map-side, with a verification join counting the sketch's actual false
    positives per priority bucket.

    Scale shape: the bitset construction is a distinct over ≤ m integers
    (map-side partial distinct, a ≤{m}/64-row bit_or word fold, then a
    single 1-row pack into a dense 64-bit-word array — a few KB
    regardless of build cardinality); the probe pass is a broadcast of
    that row plus pure per-row hashing with an O(1) word-index bit test
    per hash (round 13 replaced the sorted-set `array_contains` probe,
    whose linear scan cost probes × |set| comparisons per row — measured
    9.3 s → see OPTIMIZATION_r13.md — with the packed representation a
    real bloom filter uses), so at 100 TB the orders scan is filtered
    BEFORE any shuffle and the exact join runs only on survivors.
    Per-partition bloom words merge by bitwise OR, the property that
    makes the sketch distributable. The verification join exists to
    MEASURE the FP rate; a production prefilter drops it and keeps only
    bloom_pass=1 rows.
    """
    cust = load_table(spark, sf_dir, "customer")
    orders = fan_out(load_table(spark, sf_dir, "orders"))
    build = (
        cust.filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
        .distinct()
    )

    def positions(key):
        s = key.cast("string")
        return [
            F.conv(
                F.substring(F.md5(F.concat(s, F.lit(f"|{j}"))), 1, 8), 16, 10
            ).cast("bigint")
            % _BLOOM_M
            for j in range(_BLOOM_K)
        ]

    # dense packed bitmask: m bits as m/64 bigint words, assembled once on
    # the build side (bit semantics identical to the oracle's DISTINCT
    # position set — a bit is set iff its position was inserted)
    n_words = _BLOOM_M // 64
    words = (
        build.select(F.explode(F.array(*positions(F.col("c_custkey")))).alias("p"))
        .groupBy(F.expr("CAST(p DIV 64 AS INT)").alias("w"))
        .agg(F.expr("bit_or(shiftleft(CAST(1 AS BIGINT), CAST(p % 64 AS INT)))").alias("word"))
        .agg(F.map_from_entries(F.collect_list(F.struct("w", "word"))).alias("wm"))
        .select(
            F.transform(
                F.sequence(F.lit(0), F.lit(n_words - 1)),
                lambda i: F.coalesce(
                    F.element_at(F.col("wm"), i), F.lit(0).cast("bigint")
                ),
            ).alias("words")
        )
    )
    p0, p1, p2 = positions(F.col("o_custkey"))
    hit_sql = (
        "(element_at(words, CAST(p{j} DIV 64 AS INT) + 1)"
        " & shiftleft(CAST(1 AS BIGINT), CAST(p{j} % 64 AS INT))) != 0"
    )
    probe = (
        orders.crossJoin(F.broadcast(words))
        .join(
            F.broadcast(build.withColumn("is_true", F.lit(1))),
            orders["o_custkey"] == build["c_custkey"],
            "left",
        )
        .withColumn("p0", p0)
        .withColumn("p1", p1)
        .withColumn("p2", p2)
        .select(
            "o_orderpriority",
            (
                F.expr(hit_sql.format(j=0))
                & F.expr(hit_sql.format(j=1))
                & F.expr(hit_sql.format(j=2))
            )
            .cast("int")
            .alias("bloom_pass"),
            F.coalesce(F.col("is_true"), F.lit(0)).alias("is_true"),
        )
    )
    return probe.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_probed"),
        F.sum("bloom_pass").cast("bigint").alias("n_bloom_pass"),
        F.sum("is_true").cast("bigint").alias("n_true"),
        F.sum(((F.col("bloom_pass") == 1) & (F.col("is_true") == 0)).cast("int"))
        .cast("bigint")
        .alias("n_false_pos"),
    )


bloom_prefilter_join.__doc__ = bloom_prefilter_join.__doc__.format(m=_BLOOM_M, k=_BLOOM_K)


_KMV_K = 64
_KMV_DOMAIN = 1 << 32


@register(
    "kmv_distinct_sketch",
    survey="A-sketch(KMV / k-minimum-values distinct sketch over per-source shingles — mergeable, deterministic)",
    oracle=f"""
WITH t AS (
    SELECT source,
           list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks
    FROM documents
),
sh AS (
    SELECT DISTINCT source,
           CAST(('0x' || substring(md5(s.s), 1, 8)) AS BIGINT) AS hv
    FROM t CROSS JOIN LATERAL (
        SELECT unnest(list_transform(range(1, len(toks) - 1),
               i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2])) AS s
    ) s
    WHERE len(toks) >= 3
),
r AS (
    SELECT source, hv,
           ROW_NUMBER() OVER (PARTITION BY source ORDER BY hv) AS rn
    FROM sh
),
k AS (
    SELECT source,
           CAST(MAX(hv) AS BIGINT) AS kth_hash,
           CAST(COUNT(*) AS BIGINT) AS n_kept
    FROM r WHERE rn <= {_KMV_K} GROUP BY source
),
x AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_exact FROM sh GROUP BY source)
SELECT x.source, x.n_exact, k.kth_hash,
       CAST(CASE WHEN k.n_kept < {_KMV_K} THEN x.n_exact
                 ELSE ({_KMV_K} - 1) * {_KMV_DOMAIN} // k.kth_hash
            END AS BIGINT) AS kmv_estimate,
       CAST(CASE WHEN k.n_kept < {_KMV_K} THEN x.n_exact
                 ELSE ({_KMV_K} - 1) * {_KMV_DOMAIN} // k.kth_hash
            END AS DOUBLE) / x.n_exact AS est_ratio
FROM x JOIN k USING (source)
""",
)
def kmv_distinct_sketch(spark, sf_dir):
    """KMV (k-minimum-values) distinct-count sketch — the third mergeable
    sketch family (after count-min and HLL), the one whose sketches also
    support set-operation estimates (union = merge-and-take-k,
    intersection via the k-th-value inclusion bound): per source, the 64
    smallest 32-bit md5 hashes of its word 3-gram shingles; estimate =
    (k-1)·2³²/h₍ₖ₎ (floor-integer), exact fallback when a source has
    fewer than k distinct values. The exact count rides along so the
    driver hash also pins the measured estimate/exact ratio (one IEEE
    division) — the ±1/√k ≈ 12% accuracy claim is data, not doctrine.

    Scale shape: explode → DISTINCT (source, hash) — the same map-side-
    combinable dedup shuffle every sketch pays — then a per-source
    bottom-k window that Spark executes as Partial WindowGroupLimit
    (each map task forwards ≤ k rows per source, so the window input is
    maps·k, never the corpus); the exact-count branch exists only for
    the accuracy report and would be dropped at 100 TB. Merging two
    sketches = union the hash sets, keep the k smallest — pytest pins
    split-merge == whole."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.lower("text"), " "), lambda t: t != "")
    t = docs.select("source", toks.alias("toks")).filter(F.size("toks") >= 3)
    sh = t.select(
        "source",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("toks") - 2),
                lambda i: F.concat_ws(
                    " ",
                    F.element_at("toks", i),
                    F.element_at("toks", i + 1),
                    F.element_at("toks", i + 2),
                ),
            )
        ).alias("s"),
    )
    d = sh.select(
        "source",
        F.conv(F.substring(F.md5("s"), 1, 8), 16, 10).cast("bigint").alias("hv"),
    ).distinct()
    from pyspark.sql import Window

    rn = F.row_number().over(Window.partitionBy("source").orderBy("hv"))
    k = (
        d.withColumn("rn", rn)
        .filter(F.col("rn") <= _KMV_K)
        .groupBy("source")
        .agg(
            F.max("hv").cast("bigint").alias("kth_hash"),
            F.count(F.lit(1)).cast("bigint").alias("n_kept"),
        )
    )
    x = d.groupBy("source").agg(F.count(F.lit(1)).cast("bigint").alias("n_exact"))
    est = F.when(
        F.col("n_kept") < _KMV_K, F.col("n_exact")
    ).otherwise(F.expr(f"({_KMV_K} - 1) * {_KMV_DOMAIN} div kth_hash"))
    return (
        x.join(F.broadcast(k), "source")
        .select(
            "source",
            "n_exact",
            "kth_hash",
            est.cast("bigint").alias("kmv_estimate"),
            (est.cast("double") / F.col("n_exact")).alias("est_ratio"),
        )
    )


_IVM_SPLIT_MOD = 5  # event_id % 5 == 4 -> the arriving delta batch


@register(
    "incremental_agg_maintenance",
    survey="A-maintenance(incremental view maintenance: partial-aggregate merge == full recompute),A3-A6",
    oracle="""
SELECT event_type,
       COUNT(*) AS n,
       COUNT(DISTINCT user_id) AS n_users,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM events
GROUP BY event_type
""",
)
def incremental_agg_maintenance(spark, sf_dir):
    """Incremental view maintenance, proven by construction: the
    materialized per-event-type stats are computed as state (the historic
    4/5 of events) PLUS an arriving delta batch (the other 1/5), merged
    by partial-aggregate algebra — counts add, decimal sums add, distinct
    users via per-(type,user) partials that merge before the final
    distinct count. The oracle is the FULL recompute over all events, so
    the driver hash is literally the IVM identity merge(state, delta) ==
    recompute — a lost delta row, a double-merged partial, or a
    non-decomposable aggregate each breaks it.

    Scale shape: this is exactly what a nightly pipeline does to avoid
    rescanning 100 TB — both branches aggregate independently
    (map-side-combined), the merge touches |event_type| (and
    |type×user| for the distinct) rows. The same algebra is why the
    streaming aggregations drain bit-identical to batch backfill."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "user_id", "value"
    )
    old = ev.filter(F.col("event_id") % _IVM_SPLIT_MOD != _IVM_SPLIT_MOD - 1)
    delta = ev.filter(F.col("event_id") % _IVM_SPLIT_MOD == _IVM_SPLIT_MOD - 1)

    def partials(df):
        # per-(type,user) partials: counts + decimal sums. The distinct
        # dimension stays keyed until the final merge, so user overlap
        # between state and delta cannot double-count.
        return df.groupBy("event_type", "user_id").agg(
            F.count(F.lit(1)).alias("p_n"),
            F.sum(F.col("value").cast("decimal(18,6)")).alias("p_sum"),
        )

    merged = (
        partials(old)
        .unionByName(partials(delta))
        .groupBy("event_type", "user_id")
        .agg(
            F.sum("p_n").alias("u_n"),
            F.sum("p_sum").alias("u_sum"),
        )
    )
    return merged.groupBy("event_type").agg(
        F.sum("u_n").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum("u_sum").cast("decimal(18,6)").cast("double").alias("sum_value"),
    )


_THETA_K = 64
_THETA_A = "1-URGENT"
_THETA_B = "5-LOW"


@register(
    "theta_sketch_intersect",
    survey="A-sketch(theta/KMV set-INTERSECTION estimate from two mergeable sketches)",
    oracle=f"""
WITH s AS (
    SELECT DISTINCT
           CASE WHEN o_orderpriority = '{_THETA_A}' THEN 'A' ELSE 'B' END AS set_id,
           CAST(('0x' || substring(md5(CAST(o_custkey AS VARCHAR)), 1, 8)) AS BIGINT) AS hv
    FROM orders
    WHERE o_orderpriority IN ('{_THETA_A}', '{_THETA_B}')
),
r AS (
    SELECT set_id, hv,
           ROW_NUMBER() OVER (PARTITION BY set_id ORDER BY hv) AS rn
    FROM s
),
bottom AS (SELECT set_id, hv FROM r WHERE rn <= {_THETA_K}),
thetas AS (
    SELECT set_id,
           CASE WHEN COUNT(*) < {_THETA_K} THEN {_KMV_DOMAIN}
                ELSE MAX(hv) END AS theta_s
    FROM bottom GROUP BY set_id
),
th AS (SELECT CAST(MIN(theta_s) AS BIGINT) AS theta FROM thetas),
common AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_common
    FROM (SELECT hv FROM bottom WHERE set_id = 'A') a
    JOIN (SELECT hv FROM bottom WHERE set_id = 'B') b USING (hv)
    CROSS JOIN th
    WHERE a.hv < th.theta
),
exact AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_exact
    FROM (SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '{_THETA_A}') xa
    JOIN (SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '{_THETA_B}') xb
    USING (o_custkey)
)
SELECT c.n_common, t.theta,
       CAST(c.n_common * {_KMV_DOMAIN} // t.theta AS BIGINT) AS est_intersection,
       e.n_exact,
       CASE WHEN e.n_exact > 0
            THEN CAST(c.n_common * {_KMV_DOMAIN} // t.theta AS DOUBLE) / e.n_exact
       END AS est_ratio
FROM common c, th t, exact e
""",
)
def theta_sketch_intersect(spark, sf_dir):
    """Theta-sketch set-INTERSECTION estimation — the operation that makes
    KMV-family sketches an algebra rather than a counter
    (kmv_distinct_sketch's docstring promises it; this entry delivers):
    customers with '1-URGENT' orders ∩ customers with '5-LOW' orders,
    estimated purely from the two 64-minimum-value sketches. theta = the
    smaller of the two per-set k-th minima (full-domain when a set is
    smaller than k); the intersection sample is the hash-equality join of
    the two bottom-k sets below theta; estimate = |sample|·2³²/theta
    (floor-integer, exclusive-theta convention). The exact intersection
    rides along so the driver hash pins the measured accuracy ratio.

    Scale shape: building both sketches is ONE scan of orders (the set
    tag is a projected column, not two scans), one DISTINCT (set, hash)
    shuffle, and a per-set bottom-k window that Spark executes with
    partial WindowGroupLimit (<=k rows per set leave each map task). From
    there everything is sketch-sized: the intersection join touches
    <=2k rows, theta is a 1-row broadcast. At 100 TB only the
    distinct-hash shuffle scales with data — exactly the cost of the
    plain distinct sketch — and sketches for different partitions/days
    merge by union-and-rekeep-k, so the intersection of any two cohorts
    is answerable from stored 64-row sketches without rescanning."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    s = (
        o.filter(F.col("o_orderpriority").isin(_THETA_A, _THETA_B))
        .select(
            F.when(F.col("o_orderpriority") == _THETA_A, "A")
            .otherwise("B")
            .alias("set_id"),
            F.conv(F.substring(F.md5(F.col("o_custkey").cast("string")), 1, 8), 16, 10)
            .cast("bigint")
            .alias("hv"),
        )
        .distinct()
    )
    rn = F.row_number().over(Window.partitionBy("set_id").orderBy("hv"))
    bottom = s.withColumn("rn", rn).filter(F.col("rn") <= _THETA_K)
    thetas = bottom.groupBy("set_id").agg(
        F.when(F.count(F.lit(1)) < _THETA_K, F.lit(_KMV_DOMAIN))
        .otherwise(F.max("hv"))
        .alias("theta_s")
    )
    th = thetas.agg(F.min("theta_s").cast("bigint").alias("theta"))
    a = bottom.filter(F.col("set_id") == "A").select("hv")
    b = bottom.filter(F.col("set_id") == "B").select("hv")
    common = (
        a.join(b, "hv")
        .crossJoin(F.broadcast(th))
        .filter(F.col("hv") < F.col("theta"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    xa = o.filter(F.col("o_orderpriority") == _THETA_A).select("o_custkey").distinct()
    xb = o.filter(F.col("o_orderpriority") == _THETA_B).select("o_custkey").distinct()
    exact = xa.join(xb, "o_custkey").agg(F.count(F.lit(1)).alias("n_exact"))
    est = F.expr(f"(n_common * {_KMV_DOMAIN}) div theta").cast("bigint")
    return (
        common.crossJoin(F.broadcast(th))
        .crossJoin(F.broadcast(exact))
        .select(
            "n_common",
            "theta",
            est.alias("est_intersection"),
            "n_exact",
            F.when(
                F.col("n_exact") > 0,
                est.cast("double") / F.col("n_exact"),
            ).alias("est_ratio"),
        )
    )


_SKEW_TOPN = 20


@register(
    "key_skew_audit",
    survey="NS-ops(shuffle-key skew audit: heavy hitters, share-of-total, Herfindahl concentration),A3,O1-O3",
    oracle=f"""
WITH c AS (
    SELECT l_partkey AS key, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM lineitem GROUP BY l_partkey
),
s AS (
    SELECT CAST(SUM(cnt) AS BIGINT) AS total,
           CAST(SUM(cnt * cnt) AS BIGINT) AS sum_sq,
           CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(MAX(cnt) AS BIGINT) AS max_cnt
    FROM c
)
SELECT key, cnt,
       cnt * 1000000 // total AS share_ppm,
       n_keys, total,
       max_cnt * n_keys * 1000 // total AS skew_x1000,
       CAST(sum_sq AS DOUBLE) / (total * total) AS hhi
FROM c, s
ORDER BY cnt DESC, key
LIMIT {_SKEW_TOPN}
""",
)
def key_skew_audit(spark, sf_dir):
    """Shuffle-key skew audit — the diagnostic you run BEFORE picking a
    join/agg strategy at 100 TB: per-key counts for a prospective shuffle
    key (here lineitem.l_partkey), the top-{_SKEW_TOPN} heavy hitters with
    their share of all rows (ppm), the key cardinality, a skew factor
    (max/mean, ×1000 — 1000 means perfectly uniform), and the Herfindahl
    concentration index Σ(share²) as one double division of exact integer
    operands. skew_x1000 ≫ 1000 is the signal to salt
    (salted_hot_key_agg) or let AQE split the straggler partitions; HHI
    near 1/n_keys says broadcast/bucketing decisions can assume uniform
    buckets. All ratios are integer (ppm / ×1000) or single identical-
    operand divisions, so the report hash-matches cross-engine.

    Scale shape: ONE map-side-combined count per key (the same shuffle the
    audited operation would do, minus its payload), then a 1-row global
    reduction over the (key-cardinality-sized, corpus-independent) count
    table and a broadcast of that 1 row back onto it;
    TakeOrderedAndProject for the top-{_SKEW_TOPN} — per-task heaps, no
    global sort anywhere."""
    li = load_table(spark, sf_dir, "lineitem")
    c = li.groupBy(F.col("l_partkey").alias("key")).agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    s = c.agg(
        F.sum("cnt").cast("bigint").alias("total"),
        F.sum(F.col("cnt") * F.col("cnt")).cast("bigint").alias("sum_sq"),
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
        F.max("cnt").cast("bigint").alias("max_cnt"),
    )
    return (
        c.join(F.broadcast(s))
        .select(
            "key",
            "cnt",
            F.expr("cnt * 1000000 div total").alias("share_ppm"),
            "n_keys",
            "total",
            F.expr("max_cnt * n_keys * 1000 div total").alias("skew_x1000"),
            (F.col("sum_sq").cast("double") / (F.col("total") * F.col("total"))).alias(
                "hhi"
            ),
        )
        .orderBy(F.col("cnt").desc(), "key")
        .limit(_SKEW_TOPN)
    )


_DAY_US = 86_400_000_000


@register(
    "hll_rollup_merge",
    survey="A-sketch(HLL pre-aggregation rollup: per-day register shards MAX-merged at query time, merge==direct pinned in-plan),A3,W2",
    oracle=f"""
WITH h AS (
    SELECT event_type,
           epoch_us(ts) // {_DAY_US} AS day,
           CAST(('0x' || substring(md5(user_id || '|b'), 1, 8)) AS BIGINT)
               % {_HLL_BUCKETS} AS bucket,
           CASE WHEN CAST(('0x' || substring(md5(user_id || '|r'), 1, 8))
                          AS BIGINT) = 0 THEN 33
                ELSE 33 - length(bin(CAST(('0x' ||
                     substring(md5(user_id || '|r'), 1, 8)) AS BIGINT))) END
               AS rho,
           user_id
    FROM events
),
reg_day AS (
    SELECT event_type, day, bucket, MAX(rho) AS r
    FROM h GROUP BY event_type, day, bucket
),
merged AS (
    SELECT event_type, bucket, MAX(r) AS merged_rho
    FROM reg_day GROUP BY event_type, bucket
),
direct AS (
    SELECT event_type, bucket, MAX(rho) AS direct_rho
    FROM h GROUP BY event_type, bucket
),
days AS (
    SELECT event_type, CAST(COUNT(DISTINCT day) AS BIGINT) AS n_days
    FROM h GROUP BY event_type
),
exact AS (
    SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT)
               AS exact_distinct
    FROM h GROUP BY event_type
)
SELECT m.event_type, d.n_days,
       CAST(COUNT(*) AS BIGINT) AS n_buckets_set,
       CAST(SUM(CASE WHEN m.merged_rho <> x.direct_rho THEN 1 ELSE 0 END)
            AS BIGINT) AS n_mismatched_cells,
       CAST(SUM(CAST(1 AS BIGINT) << CAST(33 - m.merged_rho AS INTEGER))
            + ({_HLL_BUCKETS} - COUNT(*)) * (CAST(1 AS BIGINT) << 33)
            AS BIGINT) AS denom_scaled,
       MAX(e.exact_distinct) AS exact_distinct
FROM merged m
JOIN direct x ON x.event_type = m.event_type AND x.bucket = m.bucket
JOIN days d ON d.event_type = m.event_type
JOIN exact e ON e.event_type = m.event_type
GROUP BY m.event_type, d.n_days
""",
)
def hll_rollup_merge(spark, sf_dir):
    """The lakehouse pre-aggregation pattern the HLL sketch exists for,
    demonstrated IN the plan: per-(event_type, day) register shards —
    what a pipeline materializes nightly — are rolled up to event_type
    grain by cell-wise MAX at query time, and the rollup is compared
    cell-for-cell against registers computed directly from the raw rows.
    ``n_mismatched_cells`` is hash-pinned (the mergeability theorem made
    a driver-checked output: any break in the merge path flips the
    hash), ``denom_scaled`` is the HLL harmonic denominator as an EXACT
    dyadic integer (Σ 2^(33−ρ) over set cells + 2³³ per empty cell — no
    float ever enters the plan; the float estimate α·m²/denom is one
    driver-side division away), and ``exact_distinct`` rides along as
    the eval baseline (at 100 TB you would drop it — its shuffle carries
    every distinct key, which is precisely what the sketch avoids).

    Scale shape: the shard table is ≤ |types|·days·m rows (map-side
    combined — the only corpus-scale pass), the merge is an aggregate
    over that tiny table, and the comparison joins are register-table
    equi-joins. Day shards MAX-merge associatively across any partition
    of the data — per-file, per-day, per-cluster — which is why the full
    register array costs one bounded shuffle at any input size."""
    ev = load_table(spark, sf_dir, "events")
    uid = F.col("user_id").cast("string")
    bucket = (
        F.conv(F.substring(F.md5(F.concat(uid, F.lit("|b"))), 1, 8), 16, 10)
        .cast("bigint") % _HLL_BUCKETS
    )
    w = F.conv(
        F.substring(F.md5(F.concat(uid, F.lit("|r"))), 1, 8), 16, 10
    ).cast("bigint")
    rho = F.when(w == 0, F.lit(33)).otherwise(33 - F.length(F.bin(w)))
    h = ev.select(
        "event_type",
        F.expr(f"ts_us div {_DAY_US}").alias("day"),
        bucket.alias("bucket"),
        rho.alias("rho"),
        "user_id",
    )
    reg_day = h.groupBy("event_type", "day", "bucket").agg(
        F.max("rho").alias("r")
    )
    merged = reg_day.groupBy("event_type", "bucket").agg(
        F.max("r").alias("merged_rho")
    )
    direct = h.groupBy("event_type", "bucket").agg(
        F.max("rho").alias("direct_rho")
    )
    days = h.groupBy("event_type").agg(
        F.countDistinct("day").cast("bigint").alias("n_days")
    )
    exact = h.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("bigint").alias("exact_distinct")
    )
    cell_term = F.expr(
        "shiftleft(cast(1 as bigint), cast(33 - merged_rho as int))"
    )
    return (
        merged.join(direct, ["event_type", "bucket"])
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_buckets_set"),
            F.sum(
                F.when(F.col("merged_rho") != F.col("direct_rho"), 1)
                .otherwise(0)
            ).cast("bigint").alias("n_mismatched_cells"),
            (
                F.sum(cell_term)
                + (_HLL_BUCKETS - F.count(F.lit(1)))
                * F.expr("shiftleft(cast(1 as bigint), 33)")
            ).cast("bigint").alias("denom_scaled"),
        )
        .join(days, "event_type")
        .join(exact, "event_type")
        .select(
            "event_type", "n_days", "n_buckets_set", "n_mismatched_cells",
            "denom_scaled", "exact_distinct",
        )
    )


@register(
    "quantile_rollup_merge",
    survey="A-sketch(mergeable histogram pre-aggregation rollup: per-day bin-count shards SUM-merged at query time, merge==direct pinned in-plan, quantiles extracted from the merged sketch),A3,W1-W3",
    oracle=f"""
WITH b AS (
    SELECT event_type, epoch_us(ts) // {_DAY_US} AS day,
           CAST(floor(value) AS BIGINT) // 10 AS bin
    FROM events
),
shard AS (
    SELECT event_type, day, bin, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM b GROUP BY 1, 2, 3
),
merged AS (
    SELECT event_type, bin, CAST(SUM(cnt) AS BIGINT) AS mcnt
    FROM shard GROUP BY 1, 2
),
direct AS (
    SELECT event_type, bin, CAST(COUNT(*) AS BIGINT) AS dcnt
    FROM b GROUP BY 1, 2
),
days AS (
    SELECT event_type, CAST(COUNT(DISTINCT day) AS BIGINT) AS n_days
    FROM b GROUP BY 1
),
cc AS (
    SELECT m.event_type, m.bin, m.mcnt,
           CAST(CASE WHEN m.mcnt <> d.dcnt THEN 1 ELSE 0 END AS BIGINT)
               AS mism,
           SUM(m.mcnt) OVER (PARTITION BY m.event_type ORDER BY m.bin
                             ROWS UNBOUNDED PRECEDING) AS cum,
           SUM(m.mcnt) OVER (PARTITION BY m.event_type) AS total
    FROM merged m
    JOIN direct d ON d.event_type = m.event_type AND d.bin = m.bin
)
SELECT cc.event_type, MAX(dy.n_days) AS n_days,
       CAST(MAX(total) AS BIGINT) AS n,
       CAST(COUNT(*) AS BIGINT) AS n_bins_set,
       CAST(SUM(mism) AS BIGINT) AS n_mismatched_cells,
       MIN(CASE WHEN cum >= (total + 1) // 2 THEN bin END) * 10 AS p50_lo,
       MIN(CASE WHEN cum >= (9 * total + 9) // 10 THEN bin END) * 10 AS p90_lo,
       MIN(CASE WHEN cum >= (99 * total + 99) // 100 THEN bin END) * 10
           AS p99_lo
FROM cc JOIN days dy ON dy.event_type = cc.event_type
GROUP BY cc.event_type
""",
)
def quantile_rollup_merge(spark, sf_dir):
    """The percentile twin of `hll_rollup_merge` — the OTHER sketch a
    lakehouse pre-aggregates nightly: per-(event_type, day) fixed-bin
    histogram shards (the histogram_quantile_sketch binning, floor(value)
    DIV 10) are rolled up to event_type grain by cell-wise SUM at query
    time, the rollup is compared cell-for-cell against a histogram
    computed directly from the raw rows (``n_mismatched_cells`` — count
    additivity made a driver-checked output: any break in the merge path
    flips the hash), and p50/p90/p99 lower bin bounds are extracted from
    the MERGED sketch with exact integer rank arithmetic. Together the
    two rollups cover the standard nightly-shard pair: MAX-mergeable
    registers for distincts, SUM-mergeable bin counts for quantiles.

    Scale shape: the shard table is ≤ |types|·days·bins rows and is the
    only corpus-scale pass (one map-side-combined aggregate); the merge,
    the direct comparison join, and the cumulative-rank window all run
    over register-table-sized inputs (the window partitions by
    event_type over ≤ bins rows per type — never corpus rows). Day
    shards SUM-merge associatively across any partition of the data, so
    the full histogram costs one bounded shuffle at any input size."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    b = ev.select(
        "event_type",
        F.expr(f"ts_us div {_DAY_US}").alias("day"),
        F.expr("CAST(floor(value) AS BIGINT) DIV 10").alias("bin"),
    )
    shard = b.groupBy("event_type", "day", "bin").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    merged = shard.groupBy("event_type", "bin").agg(
        F.sum("cnt").cast("bigint").alias("mcnt")
    )
    direct = b.groupBy("event_type", "bin").agg(
        F.count(F.lit(1)).cast("bigint").alias("dcnt")
    )
    days = b.groupBy("event_type").agg(
        F.countDistinct("day").cast("bigint").alias("n_days")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wt = Window.partitionBy("event_type")
    cc = (
        merged.join(direct, ["event_type", "bin"])
        .select(
            "event_type", "bin", "mcnt",
            (F.col("mcnt") != F.col("dcnt")).cast("bigint").alias("mism"),
        )
        .withColumn("cum", F.sum("mcnt").over(w))
        .withColumn("total", F.sum("mcnt").over(wt))
    )

    def _pick(rank_expr):
        return F.min(F.when(F.col("cum") >= F.expr(rank_expr), F.col("bin")))

    return (
        cc.groupBy("event_type")
        .agg(
            F.max("total").cast("bigint").alias("n"),
            F.count(F.lit(1)).cast("bigint").alias("n_bins_set"),
            F.sum("mism").cast("bigint").alias("n_mismatched_cells"),
            (_pick("(total + 1) DIV 2") * 10).alias("p50_lo"),
            (_pick("(9 * total + 9) DIV 10") * 10).alias("p90_lo"),
            (_pick("(99 * total + 99) DIV 100") * 10).alias("p99_lo"),
        )
        .join(F.broadcast(days), "event_type")
        .select(
            "event_type", "n_days", "n", "n_bins_set",
            "n_mismatched_cells", "p50_lo", "p90_lo", "p99_lo",
        )
    )
