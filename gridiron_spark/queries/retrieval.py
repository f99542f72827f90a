"""Corpus retrieval / ranking operators over ``documents``: BM25 keyword
search, per-document TF-IDF keyword extraction, and a CORPUS-TRAINED
smoothed bigram language model — the lexical half of a training-data
curation stack (the embedding half lives in queries/similarity.py).

All three follow the repo's cross-engine-exact discipline: ranking scores
are scaled-integer rationals (the round-6 fixed-point trick) so Spark and
DuckDB agree bit-for-bit. Where the textbook formula uses ln() (BM25 idf,
LM log-prob), the score substitutes the MONOTONE rational inside the log
(idf' = (N-df+½)/(df+½); mean smoothed probability instead of mean
log-prob): ln is engine-divergent in the last ulp, and for filtering and
ranking only the ordering matters — the docstrings state the deviation.

Reference parity: the reference engine (JHollenb/gridiron) has no retrieval
surface; these are north-star LLM-pipeline operators mandated by the build
brief (SURVEY.md §2.11).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from gridiron_spark.io.tables import load_table
from gridiron_spark.operators.quality_model import tokens_expr
from gridiron_spark.queries import register

# BM25 free parameters as exact rationals: k1 = 1.2 = 6/5, b = 0.75 = 3/4.
# With A = floor(total_tokens / N) (integer average doc length) the
# per-term weight tf·(k1+1) / (tf + k1·(1−b+b·dl/A)) multiplied through by
# 20·A becomes the integer ratio 44·A·tf / (20·A·tf + 6·A + 18·dl), and
# idf' = (N−df+½)/(df+½) = (2N−2df+1)/(2df+1). One floor-division per
# matched (doc, term) at scale S keeps every intermediate within int64
# (S·44·A·tf·2N ≈ 1e6·44·500·50·1e5 ≈ 1e17 at 100× this corpus).
_S = 1_000_000
_BM25_QUERY = ("spark", "join", "vector")

_TOKS_SQL = "list_filter(string_split(lower(text), ' '), t -> t <> '')"


def _bm25_oracle() -> str:
    terms = ", ".join(f"'{t}'" for t in _BM25_QUERY)
    return f"""
WITH d AS (
    SELECT doc_id, {_TOKS_SQL} AS toks FROM documents
),
stats AS (
    SELECT COUNT(*) AS n,
           CAST(SUM(len(toks)) AS BIGINT) // COUNT(*) AS a
    FROM d
),
tf AS (
    SELECT doc_id,
           CAST(len(toks) AS BIGINT) AS dl,
           q.term,
           CAST(len(list_filter(toks, x -> x = q.term)) AS BIGINT) AS tf
    FROM d CROSS JOIN (SELECT unnest([{terms}]) AS term) q
),
m AS (SELECT * FROM tf WHERE tf > 0),
df AS (SELECT term, COUNT(*) AS df FROM m GROUP BY term),
scored AS (
    SELECT m.doc_id,
           ({_S} * 44 * s.a * m.tf * (2 * s.n - 2 * df.df + 1))
           // ((20 * s.a * m.tf + 6 * s.a + 18 * m.dl) * (2 * df.df + 1))
               AS term_score
    FROM m JOIN df USING (term) CROSS JOIN stats s
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_terms,
       CAST(SUM(term_score) AS BIGINT) AS score_scaled
FROM scored
GROUP BY doc_id
ORDER BY score_scaled DESC, doc_id
LIMIT 20
"""


@register(
    "bm25_search_topk",
    survey="NS-text(BM25 keyword retrieval, integer-exact Okapi weighting),A3-A6,O1-O3",
    oracle=_bm25_oracle(),
)
def bm25_search_topk(spark, sf_dir):
    """Okapi BM25 top-20 for a literal query panel, with the idf's ln()
    replaced by its monotone rational argument (cross-engine-exact; the
    ordering BM25 cares about is preserved — see module docstring) and
    every weight computed as one int64 floor-division at scale 1e6.

    Scale shape: NO corpus-wide explode — per-term tf comes from
    F.size(F.filter(toks, ...)) inside a single map over the scan (the
    query panel is a plan literal, so this is |panel| array scans per
    row, all in whole-stage codegen). The only exchanges are a 3-row df
    aggregate (broadcast back) and the final per-doc sum feeding a
    TakeOrdered — no shuffle grows with |panel| × corpus. At 100 TB the
    df/stats aggregates are the classic two-pass scan-share; a standing
    query workload would stage them per source fingerprint like the
    candidate-pair artifact."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", tokens_expr().alias("toks")
    )
    stats = d.agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("CAST(sum(size(toks)) AS BIGINT) div count(1)").alias("a"),
    )
    stack_expr = ", ".join(
        f"'{t}', CAST(size(filter(toks, x -> x = '{t}')) AS BIGINT)"
        for t in _BM25_QUERY
    )
    m = (
        d.select(
            "doc_id",
            F.size("toks").cast("bigint").alias("dl"),
            F.expr(
                f"stack({len(_BM25_QUERY)}, {stack_expr}) AS (term, tf)"
            ),
        )
        .filter(F.col("tf") > 0)
    )
    df_tbl = m.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        m.join(F.broadcast(df_tbl), "term")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            (
                F.lit(_S)
                * 44
                * F.col("a")
                * F.col("tf")
                * (2 * F.col("n") - 2 * F.col("df") + 1)
            ).alias("num"),
            (
                (20 * F.col("a") * F.col("tf") + 6 * F.col("a") + 18 * F.col("dl"))
                * (2 * F.col("df") + 1)
            ).alias("den"),
        )
        .select("doc_id", F.expr("num div den").alias("term_score"))
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_terms"),
            F.sum("term_score").cast("bigint").alias("score_scaled"),
        )
        .orderBy(F.desc("score_scaled"), "doc_id")
        .limit(20)
    )


_TFIDF_TOPK = 3


@register(
    "tfidf_topk_terms",
    survey="NS-text(per-doc TF-IDF keyword extraction, rational idf),W1-W3",
    oracle=f"""
WITH t AS (
    SELECT doc_id, unnest({_TOKS_SQL}) AS term FROM documents
),
tf AS (
    SELECT doc_id, term, COUNT(*) AS tf FROM t GROUP BY doc_id, term
),
dl AS (
    SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl FROM tf GROUP BY doc_id
),
df AS (
    SELECT term, COUNT(*) AS df FROM tf GROUP BY term
),
n AS (SELECT COUNT(*) AS n FROM documents),
scored AS (
    SELECT tf.doc_id, tf.term,
           ({_S} * tf.tf * n.n) // (dl.dl * df.df) AS score_scaled
    FROM tf JOIN dl USING (doc_id) JOIN df USING (term) CROSS JOIN n
),
ranked AS (
    SELECT doc_id, term, score_scaled,
           ROW_NUMBER() OVER (PARTITION BY doc_id
                              ORDER BY score_scaled DESC, term) AS rnk
    FROM scored
)
SELECT doc_id, term, CAST(rnk AS INTEGER) AS rnk, score_scaled
FROM ranked WHERE rnk <= {_TFIDF_TOPK}
""",
)
def tfidf_topk_terms(spark, sf_dir):
    """Per-document top-3 TF-IDF keywords — the keyword-extraction pass a
    curation pipeline uses for topic tagging and mixture labeling. idf is
    the rational N/df (monotone stand-in for ln(N/df), module docstring);
    score = floor(S · tf · N / (dl · df)), one int64 division per
    (doc, term).

    Scale shape: explode → (doc, term) count is the canonical word-count
    shuffle (map-side combined); df is a second, vocabulary-sized
    aggregate joined back by BROADCAST (a real vocabulary is ≪ corpus);
    the top-3 window partitions by doc_id — corpus-cardinality key, never
    a single-task global window."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", tokens_expr().alias("toks")
    )
    tf = (
        d.select("doc_id", F.explode("toks").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dl = tf.groupBy("doc_id").agg(F.sum("tf").cast("bigint").alias("dl"))
    df_tbl = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = d.agg(F.count(F.lit(1)).alias("n"))
    scored = (
        tf.join(dl, "doc_id")
        .join(F.broadcast(df_tbl), "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            (F.lit(_S) * F.col("tf") * F.col("n")).alias("num"),
            (F.col("dl") * F.col("df")).alias("den"),
        )
        .select("doc_id", "term", F.expr("num div den").alias("score_scaled"))
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("score_scaled"), F.asc("term")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _TFIDF_TOPK)
        .select("doc_id", "term", "rnk", "score_scaled")
    )


# Mean smoothed-bigram probability threshold (scale S): the corpus draws
# from a small working vocabulary, so coherent docs average well above
# uniform; the gate keeps docs whose bigrams are corpus-typical.
_LM_KEEP_P_SCALED = 20_000


@register(
    "ngram_lm_train_score",
    survey="NS-text(corpus-TRAINED add-one bigram LM: train + score in one plan),A3-A6,J1",
    oracle=f"""
WITH d AS (
    SELECT doc_id, {_TOKS_SQL} AS toks FROM documents
),
bg AS (
    SELECT doc_id,
           unnest(list_transform(range(1, len(toks)),
                  i -> toks[i] || ' ' || toks[i + 1])) AS bigram
    FROM d WHERE len(toks) >= 2
),
c12 AS (SELECT bigram, COUNT(*) AS c12 FROM bg GROUP BY bigram),
uni AS (
    SELECT t.tok, COUNT(*) AS c1
    FROM (SELECT unnest(toks) AS tok FROM d) t
    GROUP BY t.tok
),
v AS (SELECT COUNT(*) AS v FROM uni),
p AS (
    SELECT bg.doc_id,
           ({_S} * (c12.c12 + 1))
           // (uni.c1 + v.v) AS p_scaled
    FROM bg
    JOIN c12 USING (bigram)
    JOIN uni ON uni.tok = string_split(bg.bigram, ' ')[1]
    CROSS JOIN v
),
s AS (
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           CAST(SUM(p_scaled) AS BIGINT) AS p_sum
    FROM p GROUP BY doc_id
)
SELECT d.doc_id,
       COALESCE(s.n_bigrams, 0) AS n_bigrams,
       COALESCE(s.p_sum, 0) AS p_sum,
       CASE WHEN COALESCE(s.n_bigrams, 0) = 0 THEN 0.0
            ELSE CAST(s.p_sum AS DOUBLE) / s.n_bigrams END AS avg_p_scaled,
       CAST(CASE WHEN COALESCE(s.n_bigrams, 0) > 0
                  AND CAST(s.p_sum AS DOUBLE) / s.n_bigrams
                      >= {_LM_KEEP_P_SCALED}
            THEN 1 ELSE 0 END AS BIGINT) AS keep
FROM d LEFT JOIN s USING (doc_id)
""",
)
def ngram_lm_train_score(spark, sf_dir):
    """KenLM-shaped in-corpus language-model filtering with the model
    TRAINED in the same plan (unlike perplexity_filter's fixed plan-time
    table): add-one-smoothed bigram probabilities p(w2|w1) =
    (c(w1,w2)+1)/(c(w1)+V) are estimated from the corpus itself, then
    every document is scored by its MEAN smoothed bigram probability
    (scaled integer; the linear-space stand-in for mean log-prob — see
    module docstring) and gated. Docs with <2 tokens score 0 and fail
    the gate.

    Scale shape: training = two canonical count shuffles (bigram counts,
    unigram counts — both map-side combined); V is a 1-row broadcast;
    scoring joins the exploded doc bigrams against the model tables. The
    unigram table is vocabulary-bounded and always broadcasts; the BIGRAM
    table broadcasts here (tiny working vocabulary) but grows with
    observed-bigram count on a web corpus — at that scale drop its
    F.broadcast hint and the join becomes co-partitioned on the bigram
    key, nothing else changes. Then one per-doc aggregation. This is
    the backfill-and-gate shape: the same trained tables could be staged
    once per source fingerprint and reused by a streaming gate."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", tokens_expr().alias("toks")
    )
    bg = d.filter(F.size("toks") >= 2).select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("toks") - 1),
                lambda i: F.concat(
                    F.element_at("toks", i),
                    F.lit(" "),
                    F.element_at("toks", i + 1),
                ),
            )
        ).alias("bigram"),
    )
    c12 = bg.groupBy("bigram").agg(F.count(F.lit(1)).alias("c12"))
    uni = (
        d.select(F.explode("toks").alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c1"))
    )
    v = uni.agg(F.count(F.lit(1)).alias("v"))
    p = (
        bg.withColumn("w1", F.split("bigram", " ").getItem(0))
        .join(F.broadcast(c12), "bigram")
        .join(F.broadcast(uni), F.col("w1") == F.col("tok"))
        .crossJoin(F.broadcast(v))
        .select(
            "doc_id",
            (F.lit(_S) * (F.col("c12") + 1)).alias("num"),
            (F.col("c1") + F.col("v")).alias("den"),
        )
        .select("doc_id", F.expr("num div den").alias("p_scaled"))
    )
    s = p.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
        F.sum("p_scaled").cast("bigint").alias("p_sum"),
    )
    avg = F.when(F.col("n_bigrams") == 0, F.lit(0.0)).otherwise(
        F.col("p_sum").cast("double") / F.col("n_bigrams")
    )
    return (
        d.select("doc_id")
        .join(s, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_bigrams", F.lit(0).cast("bigint")).alias("n_bigrams"),
            F.coalesce("p_sum", F.lit(0).cast("bigint")).alias("p_sum"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            "p_sum",
            avg.alias("avg_p_scaled"),
            (
                (F.col("n_bigrams") > 0) & (avg >= _LM_KEEP_P_SCALED)
            ).cast("bigint").alias("keep"),
        )
    )


_FUSE_DEPTH = 20
_FUSE_OUT = 10
_FUSE_QVEC = 0

_FUSE_COS_SQL = """
list_sum(list_transform(list_zip(e.embedding, q.embedding),
         x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
/ (sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
 * sqrt(list_sum(list_transform(q.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
""".strip()


def _fusion_oracle() -> str:
    bm25_body = _bm25_oracle()
    return f"""
WITH lex0 AS ({bm25_body}),
lex AS (
    SELECT doc_id,
           ROW_NUMBER() OVER (ORDER BY score_scaled DESC, doc_id) AS lex_rank
    FROM lex0
),
q AS (SELECT embedding FROM embeddings WHERE vec_id = {_FUSE_QVEC}),
sem0 AS (
    SELECT e.vec_id AS doc_id, {_FUSE_COS_SQL} AS cs
    FROM embeddings e, q
    WHERE e.vec_id <> {_FUSE_QVEC}
    ORDER BY cs DESC, doc_id
    LIMIT {_FUSE_DEPTH}
),
sem AS (
    SELECT doc_id,
           ROW_NUMBER() OVER (ORDER BY cs DESC, doc_id) AS sem_rank
    FROM sem0
)
SELECT COALESCE(lex.doc_id, sem.doc_id) AS doc_id,
       lex_rank,
       sem_rank,
       CAST(COALESCE({_FUSE_DEPTH + 1} - lex_rank, 0)
          + COALESCE({_FUSE_DEPTH + 1} - sem_rank, 0) AS BIGINT) AS fused_score
FROM lex FULL JOIN sem ON lex.doc_id = sem.doc_id
ORDER BY fused_score DESC, doc_id
LIMIT {_FUSE_OUT}
"""


@register(
    "hybrid_retrieval_fusion",
    survey="NS-retrieval(hybrid lexical+semantic rank fusion — integer-exact Borda variant of RRF),SET1,O1-O3",
    oracle=_fusion_oracle(),
)
def hybrid_retrieval_fusion(spark, sf_dir):
    """Hybrid retrieval: fuse the BM25 lexical top-20 (bm25_search_topk's
    exact pipeline, reused) with the embedding cosine top-20 for the
    probe vector into one ranking, using Borda fusion — score =
    Σ (depth+1 − rank) over the lists a document appears in. Borda is
    the integer-exact member of the rank-fusion family: reciprocal-rank
    fusion's Σ 1/(60+rank) is a sum of non-representable rationals, so
    per the repo's cross-engine discipline the linear rank discount
    stands in for the reciprocal one (same monotone-in-each-rank
    structure; the two CAN order multi-list ties differently, and that
    deviation is stated here as the module docstring mandates).

    Scale shape: each arm is its already-audited plan (BM25: map-side
    stack + 3-row df broadcast + TakeOrdered; cosine: broadcast 1-row
    query against one scan + TakeOrdered); the fusion itself touches
    2·depth rows — the rank windows and the full-outer join run on
    <=20-row inputs (bounded by the fusion depth, a query-time constant,
    never the corpus), so the whole fusion stage is sketch-sized."""
    lex0 = bm25_search_topk(spark, sf_dir)
    lex = lex0.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.col("score_scaled").desc(), "doc_id"))
        .alias("lex_rank"),
    )
    emb = load_table(spark, sf_dir, "embeddings")
    q = (
        emb.filter(F.col("vec_id") == _FUSE_QVEC)
        .select(F.col("embedding").alias("q_embedding"))
    )
    from gridiron_spark.functions.vectors import cosine

    sem0 = (
        emb.filter(F.col("vec_id") != _FUSE_QVEC)
        .crossJoin(F.broadcast(q))
        .select(
            F.col("vec_id").alias("doc_id"),
            cosine(F.col("embedding"), F.col("q_embedding")).alias("cs"),
        )
        .orderBy(F.col("cs").desc(), "doc_id")
        .limit(_FUSE_DEPTH)
    )
    sem = sem0.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.col("cs").desc(), "doc_id"))
        .alias("sem_rank"),
    )
    fused = (
        lex.join(sem, "doc_id", "full_outer")
        .select(
            "doc_id",
            "lex_rank",
            "sem_rank",
            (
                F.coalesce(F.lit(_FUSE_DEPTH + 1) - F.col("lex_rank"), F.lit(0))
                + F.coalesce(F.lit(_FUSE_DEPTH + 1) - F.col("sem_rank"), F.lit(0))
            )
            .cast("bigint")
            .alias("fused_score"),
        )
    )
    return fused.orderBy(F.col("fused_score").desc(), "doc_id").limit(_FUSE_OUT)


# Container width 63: bit positions 0..62 of a BIGINT keep the sign bit
# clear, so every mask is positive and shift/or/xor/popcount agree
# bit-for-bit between the JVM and DuckDB (two's-complement corner cases
# never arise).
_BMP_BITS = 63

_BMP_TOK_SQL = (
    "unnest(string_split(trim(regexp_replace(regexp_replace("
    "lower(text), '[^a-z0-9 ]', ' ', 'g'), '  +', ' ', 'g')), ' '))"
)


@register(
    "bitmap_posting_index",
    survey="NS-retrieval(roaring-style bitmap posting index build: fixed-width doc-id containers OR-folded per term in ONE idempotent aggregate; per-term container census + popcount + xor digest),A3-A6,F4",
    oracle=f"""
WITH tok AS (
    SELECT doc_id, {_BMP_TOK_SQL} AS term FROM documents
),
m AS (
    SELECT term, doc_id // {_BMP_BITS} AS container,
           bit_or(CAST(1 AS BIGINT) << CAST(doc_id % {_BMP_BITS} AS INT))
               AS mask
    FROM tok WHERE term <> ''
    GROUP BY term, doc_id // {_BMP_BITS}
)
SELECT term,
       CAST(COUNT(*) AS BIGINT) AS n_containers,
       CAST(SUM(bit_count(mask)) AS BIGINT) AS n_postings,
       CAST(MIN(container) AS BIGINT) AS first_container,
       CAST(MAX(container) AS BIGINT) AS last_container,
       bit_xor(mask) AS mask_xor
FROM m GROUP BY term
""",
)
def bitmap_posting_index(spark, sf_dir):
    """Roaring-bitmap-style posting index build — the compressed
    doc-membership structure a lexical search / contamination-lookup
    service materializes per term: doc ids bucket into fixed-width
    containers (doc_id div {b}) and each (term, container) folds to one
    {b}-bit BIGINT mask via `bit_or(1 << doc_id % {b})`. The output row
    per term is the index's directory entry: container census, exact
    posting count as popcount (Σ bit_count — duplicates within a doc
    collapse in the OR), container id range (the doc-id clustering
    signal a query planner reads to skip containers), and an
    order-insensitive xor digest of the masks pinning exact membership.

    Scale shape: OR is IDEMPOTENT, so unlike a count-based posting build
    there is NO distinct-(term, doc) pre-shuffle — repeated tokens of a
    doc land in the same bit and vanish in the map-side partial
    aggregate. The whole plan is the token explode feeding ONE
    map-side-combined (term, container) bit_or and one (term) rollup;
    shuffle volume is bounded by |vocab| × |containers touched|, with
    stopword-grade terms (the skew that breaks collect_list posting
    builds) costing exactly n/{b} masks instead of n list entries — a
    {b}× reduction that partial aggregation realizes before the
    exchange. Both aggregates are associative/commutative, so the same
    masks MERGE across files, days, or clusters (the HLL-rollup
    property, here exact).
    """
    doc = load_table(spark, sf_dir, "documents")
    clean = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", " "),
            "  +",
            " ",
        )
    )
    tok = doc.select("doc_id", F.explode(F.split(clean, " ")).alias("term")).filter(
        F.col("term") != ""
    )
    masks = tok.groupBy(
        "term", F.expr(f"doc_id div {_BMP_BITS}").alias("container")
    ).agg(
        F.expr(
            f"bit_or(shiftleft(CAST(1 AS BIGINT), CAST(doc_id % {_BMP_BITS} AS INT)))"
        ).alias("mask")
    )
    return masks.groupBy("term").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_containers"),
        F.sum(F.bit_count("mask")).cast("bigint").alias("n_postings"),
        F.min("container").cast("bigint").alias("first_container"),
        F.max("container").cast("bigint").alias("last_container"),
        F.expr("bit_xor(mask)").alias("mask_xor"),
    )


bitmap_posting_index.__doc__ = bitmap_posting_index.__doc__.format(b=_BMP_BITS)
