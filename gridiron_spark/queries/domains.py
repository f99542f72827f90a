"""Domain/URL-grain curation — the CC-pipeline stage that operates on the
registrable domain (eTLD+1) instead of the document: per-domain document
caps (no single site may dominate the training mix) and the per-domain
contamination/quality rollup a data team reads before whitelisting a
domain. The reference has no counterpart (NFL tracking data has no URLs);
these are north-star operators in the SURVEY §2.11 sense.

The synthetic corpus carries no URL column, so one is SYNTHESIZED
deterministically from doc metadata (md5-derived, Zipf-skewed so one
domain per source genuinely dominates — the exact situation domain caps
exist for, and a realistic skew profile for the cap's hot-key story), and
the registrable domain is then EXTRACTED from the URL string with the
public-suffix-lite rule (last two labels, or three when the suffix is a
two-label 'co.uk'-style one) — the parse itself is part of the operator
under test, not an input convenience.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from gridiron_spark.io.tables import load_table
from gridiron_spark.queries import register
from gridiron_spark.queries.dedup import _SHINGLES_CTE

_DOMAIN_CAP = 5  # max docs any registrable domain may contribute

# ---------------------------------------------------------------------------
# URL synthesis + registrable-domain extraction (shared by both queries)
#
# h     = first 8 md5 hex digits of doc_id, as BIGINT (the repo's standard
#         deterministic hash-integer; curation.py uses the same form)
# dnum  = 1000 div (1 + h mod 1000)  — Zipf-ish: dnum=1 captures ~half the
#         docs, dnum=2 ~1/6, a long tail above (the "one hot site" shape)
# sfx   = 'co.uk' for h mod 7 == 0 else 'com'  — keeps the two-label
#         public-suffix branch of the extractor live
# sub   = 'www.' / 'cdn.' / ''  by h mod 3     — subdomains to strip
# url   = https://{sub}d{dnum}-{source}.{sfx}/p/{doc_id}

_H_SPARK = (
    "cast(conv(substring(md5(cast(doc_id as string)), 1, 8), 16, 10) "
    "as bigint)"
)
_H_SQL = (
    "CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)"
)

_URL_SPARK = f"""
concat(
  'https://',
  element_at(array('www.', 'cdn.', ''), cast(({_H_SPARK}) % 3 + 1 as int)),
  'd', cast(1000 div (1 + ({_H_SPARK}) % 1000) as string),
  '-', source, '.',
  case when ({_H_SPARK}) % 7 = 0 then 'co.uk' else 'com' end,
  '/p/', cast(doc_id as string)
)
""".strip()

_URL_SQL = f"""
'https://'
  || (['www.', 'cdn.', ''])[CAST(({_H_SQL}) % 3 + 1 AS INTEGER)]
  || 'd' || CAST(1000 // (1 + ({_H_SQL}) % 1000) AS VARCHAR)
  || '-' || source || '.'
  || CASE WHEN ({_H_SQL}) % 7 = 0 THEN 'co.uk' ELSE 'com' END
  || '/p/' || CAST(doc_id AS VARCHAR)
""".strip()

# registrable-domain extraction from a url column named `url`:
# host = 3rd '/'-segment; labels = '.'-split of host; registrable = last
# two labels, or last three when the trailing pair is the two-label suffix
_DOMAIN_SPARK = """
case
  when element_at(split(element_at(split(url, '/'), 3), '\\\\.'), -2) = 'co'
   and element_at(split(element_at(split(url, '/'), 3), '\\\\.'), -1) = 'uk'
  then concat_ws('.',
         slice(split(element_at(split(url, '/'), 3), '\\\\.'),
               size(split(element_at(split(url, '/'), 3), '\\\\.')) - 2, 3))
  else concat_ws('.',
         slice(split(element_at(split(url, '/'), 3), '\\\\.'),
               size(split(element_at(split(url, '/'), 3), '\\\\.')) - 1, 2))
end
""".strip()

_DOMAIN_SQL = """
CASE
  WHEN string_split(string_split(url, '/')[3], '.')[-2] = 'co'
   AND string_split(string_split(url, '/')[3], '.')[-1] = 'uk'
  THEN array_to_string(
         string_split(string_split(url, '/')[3], '.')[-3:], '.')
  ELSE array_to_string(
         string_split(string_split(url, '/')[3], '.')[-2:], '.')
END
""".strip()

_DOC_DOMAIN_CTE = f"""
dd AS (
    SELECT doc_id, lang, source, n_chars, domain FROM (
        SELECT doc_id, lang, source, n_chars, {_DOMAIN_SQL} AS domain
        FROM (SELECT *, {_URL_SQL} AS url FROM documents)
    )
)
""".strip()


def doc_domains(spark, sf_dir):
    """documents + synthesized url + extracted registrable domain."""
    return (
        load_table(spark, sf_dir, "documents")
        .withColumn("url", F.expr(_URL_SPARK))
        .withColumn("domain", F.expr(_DOMAIN_SPARK))
        .drop("url")
    )


@register(
    "domain_cap_keep",
    survey="NS-curation(per-registrable-domain document caps: URL synthesis, eTLD+1 extraction, deterministic keep-n per domain),W2,A3-A6",
    oracle=f"""
WITH {_DOC_DOMAIN_CTE},
r AS (
    SELECT doc_id, domain,
           ROW_NUMBER() OVER (
               PARTITION BY domain
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
    FROM dd
)
SELECT domain,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN rn <= {_DOMAIN_CAP} THEN 1 ELSE 0 END) AS BIGINT)
           AS n_kept,
       CAST(SUM(CASE WHEN rn <= {_DOMAIN_CAP} THEN doc_id ELSE 0 END)
            AS BIGINT) AS kept_id_sum
FROM r
GROUP BY domain
""",
)
def domain_cap_keep(spark, sf_dir):
    """Per-registrable-domain document cap — the anti-monoculture stage of
    a crawl-curation pipeline (no domain may contribute more than
    {cap} docs to the mix): synthesize the URL, extract the registrable
    domain (public-suffix-lite: last 2 labels, 3 for co.uk-style
    suffixes), rank each domain's docs in deterministic md5-priority
    order, keep rank ≤ {cap}. Output is the per-domain audit (total,
    kept, and an exact kept-membership checksum) rather than the kept
    rows themselves, so the driver hash pins WHICH docs survive.

    Scale shape: the keep rank is a rank-filter window → Spark plants a
    Partial WindowGroupLimit BEFORE the domain shuffle, so each map task
    forwards at most {cap} rows per domain — the Zipf-hot domain (~50%
    of a source's docs by construction) never concentrates in one task's
    sort beyond its pruned remnant. The n_docs side is a plain
    map-side-combined count. Two linear corpus passes, both skew-proof;
    everything after is domain-cardinality.
    """
    from pyspark.sql import Window

    dd = doc_domains(spark, sf_dir)
    w = Window.partitionBy("domain").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    kept = (
        dd.select("doc_id", "domain")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _DOMAIN_CAP)
        .groupBy("domain")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_kept"),
            F.sum("doc_id").cast("bigint").alias("kept_id_sum"),
        )
    )
    totals = dd.groupBy("domain").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs")
    )
    return totals.join(kept, "domain").select(
        "domain", "n_docs", "n_kept", "kept_id_sum"
    )


domain_cap_keep.__doc__ = domain_cap_keep.__doc__.format(cap=_DOMAIN_CAP)


@register(
    "domain_contamination_rollup",
    survey="NS-curation(domain-grain contamination/quality rollup: benchmark-overlap + lexical signals aggregated to eTLD+1),J1,A3-A6",
    oracle=f"""
WITH {_DOC_DOMAIN_CTE},
{_SHINGLES_CTE},
ex AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
bench AS (
    SELECT DISTINCT shingle FROM ex WHERE doc_id % 50 = 0
),
cont AS (
    SELECT t.doc_id
    FROM (SELECT doc_id, shingle FROM ex WHERE doc_id % 50 <> 0) t
    JOIN bench b USING (shingle)
    GROUP BY t.doc_id
    HAVING COUNT(DISTINCT t.shingle) >= 2
)
SELECT dd.domain,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(c.doc_id) AS BIGINT) AS n_contaminated,
       CAST(COUNT(c.doc_id) * 1000000 // COUNT(*) AS BIGINT)
           AS contaminated_ppm,
       CAST(SUM(CASE WHEN dd.n_chars < 200 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_short,
       CAST(SUM(dd.n_chars) AS BIGINT) AS chars_total,
       CAST(COUNT(DISTINCT dd.lang) AS BIGINT) AS n_langs
FROM dd LEFT JOIN cont c USING (doc_id)
GROUP BY dd.domain
""",
)
def domain_contamination_rollup(spark, sf_dir):
    """The per-domain scorecard a curation team reads before whitelisting
    a domain: how much of it is benchmark-contaminated (shares ≥2
    distinct word 3-grams with the held-out ``doc_id % 50 == 0``
    benchmark set — the same leak rule decontaminate_ngram_overlap
    applies at doc grain), how much is too short to train on, its volume
    (docs, chars), and its language spread — all rolled up to the
    registrable domain extracted from the synthesized URL.

    Scale shape: the benchmark's distinct shingles broadcast (eval sets
    don't grow with the crawl), so the contamination branch is the
    decontaminate_ngram_overlap plan — linear shingle assembly, map-side
    broadcast join, overlap-sized per-doc aggregate. The contaminated
    doc set then LEFT-joins the doc→domain table on doc_id
    (co-partitioned equi-join) and ONE map-side-combined aggregate on
    domain produces the rollup (count-distinct lang rides the same pass
    via Expand). No pairwise work anywhere; the hot Zipf domain is
    absorbed by partial aggregation.
    """
    from gridiron_spark.queries.dedup import shingle_rows

    dd = doc_domains(spark, sf_dir)
    doc = load_table(spark, sf_dir, "documents")
    bench = (
        shingle_rows(doc.filter(F.col("doc_id") % 50 == 0))
        .select("shingle")
        .distinct()
    )
    cont = (
        shingle_rows(doc.filter(F.col("doc_id") % 50 != 0), distinct=False)
        .join(F.broadcast(bench), "shingle")
        .groupBy("doc_id")
        .agg(F.countDistinct("shingle").alias("ns"))
        .filter(F.col("ns") >= 2)
        .select("doc_id", F.lit(1).alias("is_cont"))
    )
    return (
        dd.join(cont, "doc_id", "left")
        .groupBy("domain")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.count("is_cont").cast("bigint").alias("n_contaminated"),
            F.expr("count(is_cont) * 1000000 div count(*)")
            .cast("bigint")
            .alias("contaminated_ppm"),
            F.sum(F.when(F.col("n_chars") < 200, 1).otherwise(0))
            .cast("bigint")
            .alias("n_short"),
            F.sum("n_chars").cast("bigint").alias("chars_total"),
            F.countDistinct("lang").cast("bigint").alias("n_langs"),
        )
    )


# ---------------------------------------------------------------------------
# URL canonicalization + URL-exact dedup: the re-crawl collapse stage.
# Messy URL synthesis (per-doc noise over a shared base resource so ~4 docs
# collide per canonical URL): scheme case, host case, explicit :443 port,
# trailing slash, utm_* tracking params, #fragment — all md5-branch-derived.

_N_URL_BASES = 128

_H2_SPARK = (
    "cast(conv(substring(md5(concat('u', cast(doc_id as string))), 1, 8), "
    "16, 10) as bigint)"
)
_H2_SQL = (
    "CAST(('0x' || substring(md5('u' || CAST(doc_id AS VARCHAR)), 1, 8)) "
    "AS BIGINT)"
)

_MESSY_URL_SPARK = f"""
concat(
  case when ({_H2_SPARK}) % 2 = 0 then 'https' else 'HTTPS' end, '://',
  case when ({_H2_SPARK}) % 3 = 0
       then upper(concat('b', cast(doc_id % {_N_URL_BASES} as string), '.example.com'))
       else concat('b', cast(doc_id % {_N_URL_BASES} as string), '.example.com') end,
  case when ({_H2_SPARK}) % 5 = 0 then ':443' else '' end,
  '/a/', cast(doc_id % {_N_URL_BASES} as string),
  case when ({_H2_SPARK}) % 7 = 0 then '/' else '' end,
  '?',
  case when ({_H2_SPARK}) % 2 = 1
       then concat('utm_source=s', cast(({_H2_SPARK}) % 4 as string), '&')
       else '' end,
  'id=', cast(doc_id % {_N_URL_BASES} as string),
  case when ({_H2_SPARK}) % 3 = 1
       then concat('#sec', cast(({_H2_SPARK}) % 10 as string))
       else '' end
)
""".strip()

_MESSY_URL_SQL = f"""
(CASE WHEN ({_H2_SQL}) % 2 = 0 THEN 'https' ELSE 'HTTPS' END) || '://'
|| (CASE WHEN ({_H2_SQL}) % 3 = 0
         THEN upper('b' || CAST(doc_id % {_N_URL_BASES} AS VARCHAR) || '.example.com')
         ELSE 'b' || CAST(doc_id % {_N_URL_BASES} AS VARCHAR) || '.example.com' END)
|| (CASE WHEN ({_H2_SQL}) % 5 = 0 THEN ':443' ELSE '' END)
|| '/a/' || CAST(doc_id % {_N_URL_BASES} AS VARCHAR)
|| (CASE WHEN ({_H2_SQL}) % 7 = 0 THEN '/' ELSE '' END)
|| '?'
|| (CASE WHEN ({_H2_SQL}) % 2 = 1
         THEN 'utm_source=s' || CAST(({_H2_SQL}) % 4 AS VARCHAR) || '&'
         ELSE '' END)
|| 'id=' || CAST(doc_id % {_N_URL_BASES} AS VARCHAR)
|| (CASE WHEN ({_H2_SQL}) % 3 = 1
         THEN '#sec' || CAST(({_H2_SQL}) % 10 AS VARCHAR)
         ELSE '' END)
""".strip()


@register(
    "url_canonical_dedup",
    survey="NS-curation(URL canonicalization + URL-exact re-crawl collapse: defragment, case-fold scheme/host, strip default port / trailing slash / tracking params),F4-F6,A2",
    oracle=f"""
WITH u AS (
    SELECT doc_id, {_MESSY_URL_SQL} AS url FROM documents
),
steps AS (
    SELECT doc_id,
           string_split(url, '#')[1] AS defrag
    FROM u
),
parts AS (
    SELECT doc_id,
           lower(string_split(defrag, '://')[1]) AS scheme,
           string_split(string_split(defrag, '://')[2], '/')[1] AS hostport,
           substring(string_split(defrag, '://')[2],
                     CAST(len(string_split(string_split(defrag, '://')[2],
                                           '/')[1]) + 1 AS INTEGER)) AS pathq
    FROM steps
),
canon AS (
    SELECT doc_id,
           scheme || '://' || lower(replace(hostport, ':443', ''))
           || regexp_replace(string_split(pathq, '?')[1], '/$', '')
           || CASE WHEN array_to_string(list_filter(
                        string_split(string_split(pathq, '?')[2], '&'),
                        x -> NOT starts_with(x, 'utm_')), '&') = ''
                   THEN ''
                   ELSE '?' || array_to_string(list_filter(
                        string_split(string_split(pathq, '?')[2], '&'),
                        x -> NOT starts_with(x, 'utm_')), '&') END
               AS canonical_url
    FROM parts
)
SELECT canonical_url,
       CAST(COUNT(*) AS BIGINT) AS n_dups,
       CAST(MIN(doc_id) AS BIGINT) AS keeper_id,
       CAST(SUM(doc_id) AS BIGINT) AS dup_id_sum
FROM canon
GROUP BY canonical_url
""",
)
def url_canonical_dedup(spark, sf_dir):
    """URL canonicalization + URL-exact dedup — the re-crawl collapse every
    web pipeline runs before content dedup (the same page fetched as
    `HTTPS://Host:443/a/5/?utm_source=x&id=5#frag` and
    `https://host/a/5?id=5` is ONE resource). The canonicalizer operates
    on the URL string alone: drop the fragment, case-fold scheme and
    host, strip the protocol-default :443 port and the trailing slash,
    drop utm_* tracking params (preserving real ones and their order).
    Docs sharing a canonical URL collapse to the earliest doc_id; output
    is the per-URL group audit (count, keeper, exact membership sum).

    Scale shape: canonicalization is a pure whole-stage-codegen string
    pipeline (split/lower/replace/filter — no UDF, no regex backtracking
    risk: the only regex is the '/$' literal anchor); the dedup is one
    map-side-combined aggregate on the canonical URL — dedup_exact's
    anatomy with the canonical string as the key. At 100 TB the key is
    ~60 bytes/row of shuffle, and a hot canonical URL (a mass re-crawl)
    is absorbed by partial aggregation."""
    docs = load_table(spark, sf_dir, "documents")
    u = docs.select("doc_id", F.expr(_MESSY_URL_SPARK).alias("url"))
    defrag = F.expr("element_at(split(url, '#'), 1)")
    u = u.select("doc_id", defrag.alias("defrag"))
    u = u.select(
        "doc_id",
        F.expr("lower(element_at(split(defrag, '://'), 1))").alias("scheme"),
        F.expr(
            "element_at(split(element_at(split(defrag, '://'), 2), '/'), 1)"
        ).alias("hostport"),
        F.expr(
            "substring(element_at(split(defrag, '://'), 2), "
            "length(element_at(split(element_at(split(defrag, '://'), 2), "
            "'/'), 1)) + 1)"
        ).alias("pathq"),
    )
    canon_q = (
        "array_join(filter(split(element_at(split(pathq, '\\\\?'), 2), '&'),"
        " x -> NOT startswith(x, 'utm_')), '&')"
    )
    canonical = F.expr(
        "concat(scheme, '://', lower(replace(hostport, ':443', '')), "
        "regexp_replace(element_at(split(pathq, '\\\\?'), 1), '/$', ''), "
        f"case when {canon_q} = '' then '' else concat('?', {canon_q}) end)"
    )
    return (
        u.select("doc_id", canonical.alias("canonical_url"))
        .groupBy("canonical_url")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_dups"),
            F.min("doc_id").cast("bigint").alias("keeper_id"),
            F.sum("doc_id").cast("bigint").alias("dup_id_sum"),
        )
    )


_KEEP_NUM, _KEEP_DEN = 6, 10  # keep the top 60% of each domain by score

# deterministic integer quality score — deliberately COARSE (div-bucketed)
# so score ties are common and the threshold's boundary-resolution path is
# genuinely exercised: volume bucket + words bucket + an English bonus.
_SCORE_SPARK = (
    "least(n_chars div 20, 100) "
    "+ least((length(text) - length(replace(text, ' ', ''))) div 5, 40) "
    "+ case when lang = 'en' then 50 else 0 end"
)
_SCORE_SQL = (
    "least(n_chars // 20, 100) "
    "+ least((len(text) - len(replace(text, ' ', ''))) // 5, 40) "
    "+ CASE WHEN lang = 'en' THEN 50 ELSE 0 END"
)


@register(
    "domain_quality_threshold_keep",
    survey="NS-curation(per-domain ADAPTIVE quality threshold: exact top-fraction keep via score-histogram cumulative quota + boundary tie resolution),W2,A3-A6,J1",
    oracle=f"""
WITH dq AS (
    SELECT doc_id, domain, CAST({_SCORE_SQL} AS BIGINT) AS score
    FROM (SELECT doc_id, text, lang, n_chars, {_DOMAIN_SQL} AS domain
          FROM (SELECT *, {_URL_SQL} AS url FROM documents))
),
r AS (
    SELECT doc_id, domain, score,
           ROW_NUMBER() OVER (PARTITION BY domain
                              ORDER BY score DESC, doc_id) AS rn,
           COUNT(*) OVER (PARTITION BY domain) AS n
    FROM dq
)
SELECT domain,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(({_KEEP_NUM} * COUNT(*) + {_KEEP_DEN} - 1) // {_KEEP_DEN}
            AS BIGINT) AS quota,
       CAST(SUM(CASE WHEN rn <= ({_KEEP_NUM} * n + {_KEEP_DEN} - 1)
                               // {_KEEP_DEN}
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(SUM(CASE WHEN rn <= ({_KEEP_NUM} * n + {_KEEP_DEN} - 1)
                               // {_KEEP_DEN}
                     THEN doc_id ELSE 0 END) AS BIGINT) AS kept_id_sum,
       CAST(COALESCE(MIN(CASE WHEN rn <= ({_KEEP_NUM} * n + {_KEEP_DEN} - 1)
                                        // {_KEEP_DEN}
                              THEN score END), -1) AS BIGINT) AS thr_score
FROM r
GROUP BY domain
""",
)
def domain_quality_threshold_keep(spark, sf_dir):
    """Per-domain ADAPTIVE quality threshold — the curation stage after the
    hard cap: keep each registrable domain's top {num}/{den} of documents
    by quality score, so a mediocre doc survives on a weak domain but not
    on a strong one (a fixed global cutoff would empty some domains and
    rubber-stamp others). The keep rule is exact rank ≤ ceil({num}n/{den})
    under (score DESC, doc_id) ordering; the score is deliberately coarse
    integer bucketing (ties are the norm), and the output is the
    per-domain audit — total, quota, kept count, exact kept-membership
    checksum, and the realized threshold score.

    Scale shape: domain_cap_keep's fixed-k rank gets a Partial
    WindowGroupLimit, but a FRACTION keep cannot prune map-side — so this
    does NOT sort whole domains. Instead: ONE map-side-combined
    (domain, score) histogram aggregate (output bounded by
    domains × score-cardinality, corpus-independent), a cumulative window
    over those HISTOGRAM rows (≤ ~190 per domain, never per-doc), which
    yields each domain's fully-kept score groups and its single boundary
    score; the boundary quota remainder re-ranks ONLY the boundary tie
    group via a broadcast (domain, score, need) join — per-doc sorting is
    confined to one score-collision group per domain. The Zipf-hot
    domain's docs never concentrate in one task except that remnant.
    Degenerate worst case (every doc of a domain sharing one score) would
    make the remnant the domain itself — the cap query's honest limit,
    documented here because the coarse score makes it reachable.
    """
    from pyspark.sql import Window

    sc = (
        doc_domains(spark, sf_dir)
        .select(
            "doc_id",
            "domain",
            F.expr(_SCORE_SPARK).cast("bigint").alias("score"),
        )
    )
    hist = sc.groupBy("domain", "score").agg(
        F.count(F.lit(1)).cast("bigint").alias("c"),
        F.sum("doc_id").cast("bigint").alias("ids"),
    )
    wcum = (
        Window.partitionBy("domain")
        .orderBy(F.desc("score"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("domain")
    g = (
        hist.withColumn("cum", F.sum("c").over(wcum))
        .withColumn("n", F.sum("c").over(wall))
        .withColumn(
            "quota",
            F.expr(
                f"({_KEEP_NUM} * n + {_KEEP_DEN} - 1) div {_KEEP_DEN}"
            ).cast("bigint"),
        )
    )
    full = g.filter(F.col("cum") <= F.col("quota"))
    bnd = g.filter(
        (F.col("cum") > F.col("quota"))
        & (F.col("cum") - F.col("c") < F.col("quota"))
    ).select(
        "domain",
        "score",
        (F.col("quota") - (F.col("cum") - F.col("c"))).alias("need"),
    )
    wb = Window.partitionBy("domain", "score").orderBy("doc_id")
    bnd_kept = (
        sc.join(F.broadcast(bnd), ["domain", "score"])
        .withColumn("rn", F.row_number().over(wb))
        .filter(F.col("rn") <= F.col("need"))
    )
    full_agg = full.groupBy("domain").agg(
        F.sum("c").cast("bigint").alias("kept_f"),
        F.sum("ids").cast("bigint").alias("ids_f"),
        F.min("score").cast("bigint").alias("smin_f"),
    )
    bnd_agg = bnd_kept.groupBy("domain").agg(
        F.count(F.lit(1)).cast("bigint").alias("kept_b"),
        F.sum("doc_id").cast("bigint").alias("ids_b"),
        F.min("score").cast("bigint").alias("smin_b"),
    )
    totals = g.groupBy("domain").agg(
        F.max("n").cast("bigint").alias("n_docs"),
        F.max("quota").cast("bigint").alias("quota"),
    )
    return (
        totals.join(full_agg, "domain", "left")
        .join(bnd_agg, "domain", "left")
        .select(
            "domain",
            "n_docs",
            "quota",
            (
                F.coalesce(F.col("kept_f"), F.lit(0))
                + F.coalesce(F.col("kept_b"), F.lit(0))
            ).cast("bigint").alias("n_kept"),
            (
                F.coalesce(F.col("ids_f"), F.lit(0))
                + F.coalesce(F.col("ids_b"), F.lit(0))
            ).cast("bigint").alias("kept_id_sum"),
            F.coalesce(F.col("smin_b"), F.col("smin_f"), F.lit(-1))
            .cast("bigint")
            .alias("thr_score"),
        )
    )


domain_quality_threshold_keep.__doc__ = domain_quality_threshold_keep.__doc__.format(num=_KEEP_NUM, den=_KEEP_DEN)


@register(
    "domain_holdout_split",
    survey="NS-curation(leakage-free train/val/test split at domain grain: split is a pure function of the registrable domain),F4-F6,A3-A6",
    oracle=f"""
WITH {_DOC_DOMAIN_CTE},
sp AS (
    SELECT doc_id, source, n_chars, domain,
           CASE WHEN CAST(('0x' || substring(md5(domain), 1, 8)) AS BIGINT)
                     % 100 < 10 THEN 'test'
                WHEN CAST(('0x' || substring(md5(domain), 1, 8)) AS BIGINT)
                     % 100 < 20 THEN 'val'
                ELSE 'train' END AS split
    FROM dd
)
SELECT split, source,
       CAST(COUNT(DISTINCT domain) AS BIGINT) AS n_domains,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS chars_total,
       CAST(SUM(doc_id) AS BIGINT) AS doc_id_sum
FROM sp
GROUP BY split, source
""",
)
def domain_holdout_split(spark, sf_dir):
    """Leakage-free holdout split at the registrable-domain grain — the
    GroupShuffleSplit a web-data team uses so near-duplicate pages from
    one site can never straddle train and eval (doc-grain random splits
    leak): the split is a PURE FUNCTION of the domain (md5 bucket:
    10% test / 10% val / 80% train), so every doc of a domain lands in
    the same split by construction, deterministically and with no
    coordination state. Output is the per-(split, source) audit —
    domain and doc counts, volume, and an exact doc-membership checksum
    — the table a pipeline records next to the split manifest. The
    cluster-grain analog is cluster_split_assign; this is its
    URL-world twin over the synthesized domain column.

    Scale shape: the split column is a map-side expression over the
    domain projection; ONE map-side-combined aggregate on
    (split, source) — count-distinct domain rides the same pass via
    Expand — and nothing else. No join, no window, no second pass."""
    dd = doc_domains(spark, sf_dir)
    h = F.expr(
        "cast(conv(substring(md5(domain), 1, 8), 16, 10) as bigint) % 100"
    )
    sp = dd.withColumn(
        "split",
        F.when(h < 10, "test").when(h < 20, "val").otherwise("train"),
    )
    return sp.groupBy("split", "source").agg(
        F.countDistinct("domain").cast("bigint").alias("n_domains"),
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("chars_total"),
        F.sum("doc_id").cast("bigint").alias("doc_id_sum"),
    )
