"""Text-analysis operators over the ``documents`` table — the training-data
pipeline surface (language-ID, quality scoring, token counting, document
fingerprinting). Everything is built-in Column expressions (split/filter/
transform/aggregate on arrays) — JVM-side, whole-stage-codegen, no Python UDFs
in the hot path.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from gridiron_spark.functions.partitions import range_parts as _range_parts
from gridiron_spark.io.tables import fan_out, load_table
from gridiron_spark.queries import register

_STOPWORDS = ("the", "a", "of", "and", "in", "to", "is")
_STOP_SQL = "(" + ", ".join(f"'{w}'" for w in _STOPWORDS) + ")"

# Marker-word tables for the n-gram/stopword language-ID heuristic. The
# synthetic corpus is English-ish word soup, so this demonstrates the
# *mechanics* (per-language marker hit counting + argmax) deterministically.
_LANG_MARKERS = {
    "en": ("the", "a", "and", "of"),
    "es": ("el", "la", "de", "que"),
    "fr": ("le", "la", "et", "les"),
}


def _tokens():
    return F.split(F.col("text"), " ")


@register(
    "text_token_count",
    survey="NS-text(token counting)",
    oracle="""
SELECT doc_id,
       length(text) AS n_chars_measured,
       len(string_split(text, ' ')) AS n_tokens,
       len(list_distinct(string_split(text, ' '))) AS n_unique_tokens
FROM documents
""",
)
def text_token_count(spark, sf_dir):
    doc = load_table(spark, sf_dir, "documents")
    toks = _tokens()
    return doc.select(
        "doc_id",
        F.length("text").alias("n_chars_measured"),
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_unique_tokens"),
    )


@register(
    "text_quality_score",
    survey="NS-text(quality scoring)",
    oracle=f"""
SELECT doc_id,
       len(string_split(text, ' ')) AS n_tokens,
       len(list_filter(string_split(text, ' '), x -> x IN {_STOP_SQL})) AS n_stopwords,
       CAST(len(list_filter(string_split(text, ' '), x -> x IN {_STOP_SQL})) AS DOUBLE)
           / len(string_split(text, ' ')) AS stopword_ratio,
       CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
           / len(string_split(text, ' ')) AS unique_ratio,
       CAST(list_sum(list_transform(string_split(text, ' '), x -> length(x))) AS DOUBLE)
           / len(string_split(text, ' ')) AS mean_token_len
FROM documents
""",
)
def text_quality_score(spark, sf_dir):
    doc = load_table(spark, sf_dir, "documents")
    toks = _tokens()
    n_tokens = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda x: x.isin(*_STOPWORDS)))
    sum_len = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
    )
    return doc.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        n_stop.alias("n_stopwords"),
        (n_stop.cast("double") / n_tokens).alias("stopword_ratio"),
        (F.size(F.array_distinct(toks)).cast("double") / n_tokens).alias(
            "unique_ratio"
        ),
        (sum_len.cast("double") / n_tokens).alias("mean_token_len"),
    )


def _marker_hits_spark(toks, markers):
    return F.size(F.filter(toks, lambda x: x.isin(*markers)))


def _marker_hits_sql(markers):
    mk = "(" + ", ".join(f"'{w}'" for w in markers) + ")"
    return f"len(list_filter(string_split(text, ' '), x -> x IN {mk}))"


@register(
    "text_lang_id",
    survey="NS-text(language-ID heuristic)",
    oracle=f"""
SELECT doc_id,
       lang AS lang_tagged,
       CASE
           WHEN {_marker_hits_sql(_LANG_MARKERS["en"])} >= {_marker_hits_sql(_LANG_MARKERS["es"])}
            AND {_marker_hits_sql(_LANG_MARKERS["en"])} >= {_marker_hits_sql(_LANG_MARKERS["fr"])}
            AND {_marker_hits_sql(_LANG_MARKERS["en"])} > 0 THEN 'en'
           WHEN {_marker_hits_sql(_LANG_MARKERS["es"])} >= {_marker_hits_sql(_LANG_MARKERS["fr"])}
            AND {_marker_hits_sql(_LANG_MARKERS["es"])} > 0 THEN 'es'
           WHEN {_marker_hits_sql(_LANG_MARKERS["fr"])} > 0 THEN 'fr'
           ELSE 'und'
       END AS lang_pred
FROM documents
""",
)
def text_lang_id(spark, sf_dir):
    doc = load_table(spark, sf_dir, "documents")
    toks = _tokens()
    en = _marker_hits_spark(toks, _LANG_MARKERS["en"])
    es = _marker_hits_spark(toks, _LANG_MARKERS["es"])
    fr = _marker_hits_spark(toks, _LANG_MARKERS["fr"])
    return doc.select(
        "doc_id",
        F.col("lang").alias("lang_tagged"),
        F.when((en >= es) & (en >= fr) & (en > 0), "en")
        .when((es >= fr) & (es > 0), "es")
        .when(fr > 0, "fr")
        .otherwise("und")
        .alias("lang_pred"),
    )


_WIN_K = 8  # character k-gram length
_WIN_W = 4  # winnowing window (hashes per window)


# shared winnowing CTE chain: also the candidate source for
# winnow_overlap_pairs
_WINNOW_SQL = f"""
WITH grams AS (
    SELECT doc_id, u.pos,
           substring(lower(text), u.pos, {_WIN_K}) AS gram
    FROM documents
    CROSS JOIN LATERAL (
        SELECT unnest(range(1, greatest(length(text) - {_WIN_K - 2}, 2))) AS pos
    ) u
),
h AS (
    SELECT doc_id, pos,
           CAST(('0x' || substring(md5(gram), 1, 8)) AS BIGINT) AS hv
    FROM grams
),
win AS (
    SELECT doc_id, pos,
           MIN(hv) OVER (PARTITION BY doc_id ORDER BY pos
                         ROWS BETWEEN CURRENT ROW AND {_WIN_W - 1} FOLLOWING) AS m,
           COUNT(*) OVER (PARTITION BY doc_id) AS nh
    FROM h
)
SELECT DISTINCT doc_id, m AS fingerprint
FROM win
WHERE pos <= greatest(nh - {_WIN_W - 1}, 1)
""".strip()


@register(
    "winnow_fingerprint",
    survey="NS-text(rolling-hash fingerprinting — winnowing over char k-grams)",
    oracle=_WINNOW_SQL,
)
def winnow_fingerprint(spark, sf_dir):
    """Winnowing (MOSS) fingerprints: hash every character {k}-gram, keep
    the minimum of each sliding window of {w} consecutive hashes, distinct.
    Guarantees any shared substring of length ≥ k+w-1 yields a shared
    fingerprint — the rolling-hash dedup primitive for plagiarism/contamination
    detection. Plan shape: one explode (gram rows, lower(text) computed once
    per doc in the projection under the Generate), one windowed min per doc
    — linear, partial-agg friendly."""
    from pyspark.sql import Window

    doc = load_table(spark, sf_dir, "documents")
    # fan_out: the char-gram explode is narrow, so an under-partitioned scan
    # would run the whole ×300 generation stage serially (4× at sf0.1).
    t = fan_out(doc.select("doc_id", F.lower(F.col("text")).alias("t")))
    # gram count is a pure function of length — carry it through the explode
    # instead of paying a second (unbounded) window pass to count rows.
    grams = t.select(
        "doc_id",
        F.greatest(F.length("t") - (_WIN_K - 1), F.lit(1)).alias("nh"),
        F.posexplode(
            F.expr(
                f"transform(sequence(1, greatest(length(t) - {_WIN_K - 1}, 1)),"
                f" i -> substring(t, i, {_WIN_K}))"
            )
        ).alias("pos0", "gram"),
    ).select("doc_id", "nh", (F.col("pos0") + 1).alias("pos"), "gram")
    h = grams.select(
        "doc_id",
        "nh",
        "pos",
        F.conv(F.substring(F.md5("gram"), 1, 8), 16, 10).cast("bigint").alias("hv"),
    )
    w_min = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(0, _WIN_W - 1)
    win = h.select(
        "doc_id",
        "nh",
        "pos",
        F.min("hv").over(w_min).alias("m"),
    )
    return (
        win.filter(F.col("pos") <= F.greatest(F.col("nh") - (_WIN_W - 1), F.lit(1)))
        .select("doc_id", F.col("m").alias("fingerprint"))
        .distinct()
    )


winnow_fingerprint.__doc__ = winnow_fingerprint.__doc__.format(k=_WIN_K, w=_WIN_W)


@register(
    "word_topk",
    survey="NS-text(corpus word-frequency top-k — generator/explode surface)",
    oracle="""
SELECT token, cnt FROM (
    SELECT token, COUNT(*) AS cnt
    FROM (SELECT unnest(string_split(lower(text), ' ')) AS token FROM documents)
    GROUP BY token
)
ORDER BY cnt DESC, token
LIMIT 50
""",
)
def word_topk(spark, sf_dir):
    """Corpus-wide word-frequency top-k: the canonical generator (explode)
    plus global aggregate shape. Scale notes: the explode is narrow (no
    shuffle) and the count aggregates map-side before the single shuffle on
    ``token``; the final top-50 is a TakeOrdered (per-partition heap + driver
    merge), never a full sort. Deterministic tie-break on the token itself so
    the LIMIT frontier hash-matches the oracle."""
    doc = load_table(spark, sf_dir, "documents")
    toks = fan_out(
        doc.select(F.explode(F.split(F.lower(F.col("text")), " ")).alias("token"))
    )
    return (
        toks.groupBy("token")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.col("cnt").desc(), "token")
        .limit(50)
    )


@register(
    "doc_fingerprint",
    survey="NS-text(document fingerprinting)",
    oracle="""
SELECT doc_id,
       md5(lower(text)) AS content_md5,
       md5(array_to_string(list_sort(list_distinct(string_split(lower(text), ' '))), ' ')) AS bow_fingerprint
FROM documents
""",
)
def doc_fingerprint(spark, sf_dir):
    """Content hash + order-insensitive bag-of-words fingerprint (the
    canonicalized-token-set hash used for fuzzy-exact dedup)."""
    doc = load_table(spark, sf_dir, "documents")
    low_toks = F.split(F.lower(F.col("text")), " ")
    return doc.select(
        "doc_id",
        F.md5(F.lower(F.col("text"))).alias("content_md5"),
        F.md5(
            F.array_join(F.array_sort(F.array_distinct(low_toks)), " ")
        ).alias("bow_fingerprint"),
    )


@register(
    "udtf_bigrams",
    survey="§2.9 Python UDTF (table function, lateral join) — arrow-batched",
    oracle="""
SELECT doc_id, i AS pos, w[i] || ' ' || w[i+1] AS bigram
FROM (SELECT doc_id, string_split(text, ' ') AS w
      FROM documents WHERE doc_id % 10 = 0),
     LATERAL (SELECT unnest(generate_series(1, len(w) - 1)) AS i) g
""",
)
def udtf_bigrams(spark, sf_dir):
    """Python UDTF surface (new in Spark 4): a table function laterally
    joined per input row, yielding (pos, bigram) for consecutive token
    pairs. Arrow-optimized UDTF evaluation (one Arrow batch per partition,
    not per-row pickling) is enabled at the session level; the 1-in-10
    doc subset bounds the fan-out (~len(text) rows per doc). The same
    semantics are SQL-expressible (the DuckDB lateral-unnest oracle), so
    the hash check validates the UDTF plumbing end to end. For hot paths
    the explode-based form (word_topk) is preferred — UDTFs are the
    extension point, not the default."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id bigint, pos int, bigram string")
    class Bigrams:
        def eval(self, doc_id, text):
            toks = text.split(" ")
            for i in range(len(toks) - 1):
                yield doc_id, i + 1, toks[i] + " " + toks[i + 1]

    # set (not save/restore): the conf is read when the lazy plan EXECUTES,
    # after this function returns — restoring it here would defeat it
    spark.conf.set("spark.sql.execution.pythonUDTF.arrow.enabled", "true")
    spark.udtf.register("bigrams_udtf", Bigrams)
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 10 == 0)
    docs.select("doc_id", "text").createOrReplaceTempView("udtf_bigram_src")
    return spark.sql(
        "SELECT b.doc_id, b.pos, b.bigram "
        "FROM udtf_bigram_src, LATERAL bigrams_udtf(doc_id, text) b"
    )


_CHUNK = 32
_CHUNK_STRIDE = 24


@register(
    "doc_chunking",
    survey="NS-text(context-window chunking: overlapping token windows)",
    oracle=f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
SELECT doc_id, CAST(i AS INT) AS chunk_id,
       array_to_string(
           list_slice(toks, i*{_CHUNK_STRIDE}+1, i*{_CHUNK_STRIDE}+{_CHUNK}), ' '
       ) AS chunk_text,
       len(list_slice(toks, i*{_CHUNK_STRIDE}+1, i*{_CHUNK_STRIDE}+{_CHUNK}))
           AS n_chunk_tokens
FROM t, LATERAL (
    SELECT unnest(range(0, (len(toks)-1)//{_CHUNK_STRIDE} + 1)) AS i
) u
""",
)
def doc_chunking(spark, sf_dir):
    """Overlapping token-window chunking — the context-window prep step of
    every LLM training/RAG pipeline: {c}-token chunks every {s} tokens
    ({o}-token overlap), final chunk allowed short. One chunk per stride
    start ≤ last token index — fully deterministic, so the lateral-unnest
    oracle matches bit-for-bit (Spark slice and DuckDB list_slice both
    clamp at the array end).

    Plan shape: tokens materialize ONCE in a projection (never inside a
    HOF lambda — no CSE there), then a posexplode of the tiny stride-index
    sequence fans rows out; slice/concat_ws run on the already-split array
    per chunk row. The explode is narrow, so the pre-explode rows are
    fan_out-repartitioned only when the scan is under-partitioned (no-op
    at 100 TB, where chunking is embarrassingly parallel and shuffle-free).
    """
    from gridiron_spark.io.tables import fan_out

    doc = fan_out(load_table(spark, sf_dir, "documents"))
    t = doc.select("doc_id", _tokens().alias("toks"))
    n_ids = F.floor((F.size("toks") - 1) / _CHUNK_STRIDE).cast("int")
    exploded = t.select(
        "doc_id",
        "toks",
        F.explode(F.sequence(F.lit(0), n_ids)).alias("chunk_id"),
    )
    sl = F.slice(
        F.col("toks"), F.col("chunk_id") * _CHUNK_STRIDE + 1, F.lit(_CHUNK)
    )
    return exploded.select(
        "doc_id",
        "chunk_id",
        F.concat_ws(" ", sl).alias("chunk_text"),
        F.size(sl).alias("n_chunk_tokens"),
    )


doc_chunking.__doc__ = doc_chunking.__doc__.format(c=_CHUNK, s=_CHUNK_STRIDE, o=_CHUNK - _CHUNK_STRIDE)


@register(
    "text_normalize",
    survey="NS-text(cleaning: lowercase, punct strip, whitespace collapse)",
    oracle="""
SELECT doc_id,
       trim(regexp_replace(
           regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
           '  +', ' ', 'g')) AS clean_text,
       len(string_split(trim(regexp_replace(
           regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
           '  +', ' ', 'g')), ' ')) AS n_clean_tokens
FROM documents
""",
)
def text_normalize(spark, sf_dir):
    """Text cleaning for training corpora: lowercase, non-alphanumeric →
    space, whitespace collapse, trim. Pure JVM-side regexp_replace chain
    (whole-stage codegen, no UDF); the patterns use only character
    classes, so Java regex and DuckDB's RE2 agree exactly. The cleaned
    token count is the usual pre-tokenizer length signal for filtering."""
    doc = load_table(spark, sf_dir, "documents")
    clean = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", " "),
            "  +",
            " ",
        )
    )
    return doc.select(
        "doc_id",
        clean.alias("clean_text"),
        F.size(F.split(clean, " ")).alias("n_clean_tokens"),
    )


@register(
    "sequence_pack_bucketed",
    survey="NS-text(context-window sequence packing, length-bucketed),W2,A6",
    oracle="""
WITH d AS (
    SELECT doc_id,
           LEAST(CAST(ceil(len(string_split(text, ' ')) / 16.0) AS INT) * 16,
                 128) AS bucket_len,
           LEAST(len(string_split(text, ' ')), 128) AS n_tokens
    FROM documents
),
numbered AS (
    SELECT bucket_len, n_tokens,
           ROW_NUMBER() OVER (PARTITION BY bucket_len ORDER BY doc_id) AS rn,
           128 // bucket_len AS fit
    FROM d
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
def sequence_pack_bucketed(spark, sf_dir):
    """Pack documents into fixed-capacity (128-token) training sequences by
    length bucket — the batch-construction pass an LLM pipeline runs between
    tokenization and example writing.

    Packing that walks documents sequentially (first-fit/next-fit) is a
    stateful scan that cannot shard; the scale-correct variant buckets each
    doc's token count up to a multiple of 16, so every sequence holds exactly
    ``fit = 128 div bucket_len`` docs of one bucket and assignment becomes
    pure arithmetic on a per-bucket sequence number. The per-bucket global
    numbering is the only hard part at 100 TB: a bare
    ``row_number() over (partition by bucket_len)`` would drag each bucket
    (≈ corpus/8) onto ONE task, so instead we repartitionByRange on
    (bucket_len, doc_id) — sample-based boundaries keep partitions even —
    then local row_number per (partition, bucket) plus a broadcast
    prefix-sum offset table of |partitions × buckets| rows (the
    ranged_global_sort technique, per group). localCheckpoint pins the
    sampled range boundaries before the plan forks over them.

    Output is one row per packed sequence with exact integer padding
    accounting (slot_pad = intra-slot waste, tail_pad = unused capacity) —
    the numbers a data engineer reads to pick bucket granularity.
    """
    from pyspark.sql import Window as W

    doc = load_table(spark, sf_dir, "documents")
    n_tok = F.size(F.split(F.col("text"), " "))
    d = doc.select(
        "doc_id",
        F.least(F.ceil(n_tok / 16.0).cast("int") * 16, F.lit(128)).alias(
            "bucket_len"
        ),
        F.least(n_tok, F.lit(128)).alias("n_tokens"),
    )
    srt = (
        d.repartitionByRange(_range_parts(spark), "bucket_len", "doc_id")
        .withColumn("pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    local = srt.withColumn(
        "local_rn",
        F.row_number().over(W.partitionBy("pid", "bucket_len").orderBy("doc_id")),
    )
    offsets = (
        local.groupBy("bucket_len", "pid")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "bucket_len",
            "pid",
            F.sum("n")
            .over(
                W.partitionBy("bucket_len")
                .orderBy("pid")
                .rowsBetween(W.unboundedPreceding, -1)
            )
            .alias("off"),
        )
    )
    numbered = local.join(F.broadcast(offsets), ["bucket_len", "pid"]).select(
        "bucket_len",
        "n_tokens",
        (F.col("local_rn") + F.coalesce(F.col("off"), F.lit(0))).alias("rn"),
        F.expr("128 div bucket_len").alias("fit"),
    )
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


@register(
    "bpe_pair_counts",
    survey="NS-text(tokenizer induction: BPE merge-candidate pair counts),A3-A4,O1",
    oracle="""
WITH wc AS (
    SELECT w AS word, COUNT(*) AS freq
    FROM (SELECT unnest(string_split(lower(text), ' ')) AS w FROM documents)
    WHERE w <> '' GROUP BY w
),
pairs AS (
    SELECT substring(word, CAST(i AS INT), 2) AS pair, freq
    FROM wc, unnest(range(1, length(word))) AS u(i)
)
SELECT pair, CAST(SUM(freq) AS BIGINT) AS n
FROM pairs GROUP BY pair
ORDER BY n DESC, pair
LIMIT 30
""",
)
def bpe_pair_counts(spark, sf_dir):
    """Tokenizer-training primitive: the first BPE merge step's candidate
    table — corpus-weighted counts of adjacent symbol pairs, top 30. The
    scale trick is aggregation ORDER: the corpus collapses to the
    (vocabulary-bounded) word-frequency table FIRST, and the character-pair
    fan-out runs over distinct words only — at 100 TB the pair explosion
    costs |vocab|·|word| rows, not |corpus|·|word|, and the word-count
    aggregate is map-side combined on the only corpus-sized shuffle. The
    real BPE loop re-runs this candidate query per merge over a
    re-segmented vocab table; one iteration is the checkable unit.
    """
    doc = load_table(spark, sf_dir, "documents")
    wc = (
        doc.select(F.explode(F.split(F.lower("text"), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    # substring with a DYNAMIC start position needs the expr form — the
    # Python F.substring signature only takes literal pos/len. Words
    # shorter than 2 chars are filtered BEFORE the fan-out: Spark's
    # sequence(1, 0) is a DESCENDING sequence (not empty like DuckDB's
    # range), which would fabricate pairs for 1-char words.
    pairs = wc.filter(F.length("word") >= 2).select(
        F.expr(
            "explode(transform(sequence(1, length(word) - 1),"
            " i -> substring(word, i, 2)))"
        ).alias("pair"),
        "freq",
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("freq").alias("n"))
        .orderBy(F.col("n").desc(), "pair")
        .limit(30)
    )


_VOCAB_K = 200


@register(
    "vocab_encode_checksum",
    survey="NS-text(numericalization: token→id encode vs learned top-K vocab, OOV accounting),J1,W2,O5",
    oracle=f"""
WITH wc AS (
    SELECT w AS word, COUNT(*) AS freq
    FROM (SELECT unnest(string_split(lower(text), ' ')) AS w FROM documents)
    WHERE w <> '' GROUP BY w
),
vocab AS (
    SELECT word,
           CAST(ROW_NUMBER() OVER (ORDER BY freq DESC, word) AS BIGINT) AS id
    FROM wc ORDER BY freq DESC, word LIMIT {_VOCAB_K}
),
tok AS (
    SELECT doc_id, u.i AS pos, t[u.i + 1] AS word
    FROM (SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents),
         unnest(range(0, len(t))) AS u(i)
)
SELECT tok.doc_id,
       COUNT(*) AS n_tokens,
       CAST(SUM(CASE WHEN v.id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
       CAST(SUM(COALESCE(v.id, 0) * (tok.pos + 1)) AS BIGINT) AS ids_checksum
FROM tok LEFT JOIN vocab v USING (word)
GROUP BY tok.doc_id
""",
)
def vocab_encode_checksum(spark, sf_dir):
    """Numericalization — the encode step between cleaning and packing: learn
    a top-{k} vocabulary (corpus frequency, deterministic (freq desc, word)
    tie-break), map every token position to its vocab id (OOV → 0/<unk>),
    and emit per-doc token/OOV counts plus a position-weighted integer
    checksum of the id sequence. The checksum is ORDER-SENSITIVE (Σ id·pos)
    yet exact in BIGINT, so the driver hash pins the full encoded sequence,
    not just its multiset, without shipping arrays.

    Scale shape: the vocab is rank-limited to K rows — its global rank
    window runs over the already-LIMITed top-K (bounded by K, not by the
    corpus vocabulary), and it broadcasts into the token stream; the token
    side is one linear by-doc_id positional explode feeding a map-side
    broadcast join straight into the per-doc aggregate."""
    from pyspark.sql import Window

    doc = load_table(spark, sf_dir, "documents")
    wc = (
        doc.select(F.explode(F.split(F.lower("text"), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    topk = wc.orderBy(F.col("freq").desc(), "word").limit(_VOCAB_K)
    vocab = topk.select(
        "word",
        F.row_number()
        .over(Window.orderBy(F.col("freq").desc(), "word"))
        .cast("bigint")
        .alias("id"),
    )
    tok = doc.select(
        "doc_id", F.posexplode(F.split(F.lower("text"), " ")).alias("pos", "word")
    )
    enc = tok.join(F.broadcast(vocab), "word", "left")
    return enc.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum(F.col("id").isNull().cast("bigint")).alias("n_oov"),
        F.sum(F.coalesce(F.col("id"), F.lit(0)) * (F.col("pos") + 1))
        .cast("bigint")
        .alias("ids_checksum"),
    )


vocab_encode_checksum.__doc__ = vocab_encode_checksum.__doc__.format(k=_VOCAB_K)

_BPE_N_MERGES = 8


def _bpe_ctes(n_merges: int, train_where: str = "") -> str:
    """Chained-CTE replay of the N-merge BPE loop (DuckDB). Each round i:
    re-split the sentinel-packed segmentation, count adjacent pairs
    (corpus-frequency weighted), pick the (n DESC, a, b) winner, and
    re-segment via literal replace — the same left-to-right non-overlapping
    scan Spark's replace performs. Fixed N unrolls the recursion, so no
    recursive-CTE aggregate restrictions apply. Returns the WITH-chain up
    to seg{N}; callers append their final SELECT. ``train_where``
    restricts the TRAINING corpus (e.g. ' WHERE doc_id % 2 = 0' for the
    fertility gate's train split)."""
    from gridiron_spark.operators.bpe import SENTINEL as S

    parts = [
        f"""
wc AS (
    SELECT w AS word, COUNT(*) AS freq
    FROM (SELECT unnest(string_split(lower(text), ' ')) AS w
          FROM documents{train_where})
    WHERE w <> '' GROUP BY w
),
seg0 AS (
    SELECT word, freq,
           regexp_replace(word, '(.)', '{S}\\1{S}', 'g') AS seg
    FROM wc
)"""
    ]
    for i in range(1, n_merges + 1):
        parts.append(
            f""",
sym{i} AS (
    SELECT freq,
           list_filter(string_split(seg, '{S}'), s -> s <> '') AS syms
    FROM seg{i - 1}
),
pr{i} AS (
    SELECT syms[u.i] AS a, syms[u.i + 1] AS b, SUM(freq) AS n
    FROM sym{i}, unnest(range(1, len(syms))) AS u(i)
    GROUP BY 1, 2
),
best{i} AS (SELECT a, b, n FROM pr{i} ORDER BY n DESC, a, b LIMIT 1),
seg{i} AS (
    SELECT w.word, w.freq,
           coalesce(replace(w.seg, '{S}' || bb.a || '{S}{S}' || bb.b || '{S}',
                            '{S}' || bb.a || bb.b || '{S}'), w.seg) AS seg
    FROM seg{i - 1} w LEFT JOIN best{i} bb ON TRUE
)"""
        )
    return "WITH " + "".join(parts)


def _bpe_oracle(n_merges: int) -> str:
    union = "\nUNION ALL\n".join(
        f"SELECT {i} AS step, a AS left_sym, b AS right_sym,"
        f" a || b AS merged, CAST(n AS BIGINT) AS n FROM best{i}"
        for i in range(1, n_merges + 1)
    )
    return _bpe_ctes(n_merges) + "\n" + union


@register(
    "bpe_merge_sequence",
    survey="NS-text(tokenizer induction: iterative N-merge BPE loop, merge table output),A3-A4,O1",
    oracle=_bpe_oracle(_BPE_N_MERGES),
)
def bpe_merge_sequence(spark, sf_dir):
    """The real BPE training loop that bpe_pair_counts is one round of:
    {n} merge rounds over the sentinel-packed vocabulary segmentation,
    emitting the merge table (step, pair, merged symbol, corpus-weighted
    count) — the artifact a tokenizer ships. Deterministic throughout
    (lexicographic tie-break on the winning pair), so the whole loop is
    hash-checkable against a chained-CTE replay.

    Scale shape: see operators/bpe.bpe_merge_table — one corpus-sized
    aggregation total; every round is vocab-bounded with a 1-row broadcast
    winner, no driver collect, lineage cut per round.
    """
    from gridiron_spark.operators.bpe import bpe_merge_table, word_freq

    doc = load_table(spark, sf_dir, "documents")
    return bpe_merge_table(word_freq(doc), _BPE_N_MERGES)


bpe_merge_sequence.__doc__ = bpe_merge_sequence.__doc__.format(n=_BPE_N_MERGES)


def _bpe_encode_oracle(n_merges: int) -> str:
    from gridiron_spark.operators.bpe import SENTINEL as S

    return _bpe_ctes(n_merges) + f""",
wsyms AS (
    SELECT word,
           CAST(len(list_filter(string_split(seg, '{S}'), s -> s <> ''))
               AS BIGINT) AS n_syms
    FROM seg{n_merges}
),
tok AS (
    SELECT doc_id, u.i AS pos, t[u.i + 1] AS word
    FROM (SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents),
         unnest(range(0, len(t))) AS u(i)
)
SELECT tok.doc_id,
       COUNT(*) AS n_words,
       CAST(SUM(w.n_syms) AS BIGINT) AS n_bpe_tokens,
       CAST(SUM(w.n_syms * (tok.pos + 1)) AS BIGINT) AS tokens_checksum
FROM tok JOIN wsyms w USING (word)
GROUP BY tok.doc_id
"""


def _staged_segmentations(spark, sf_dir, split: str | None = None):
    """The trained tokenizer as a staged artifact: final per-word
    segmentation lengths, mined once per source fingerprint and
    _SUCCESS-gated like the candidate-pair stage — a production encode
    never re-trains the tokenizer per batch. Deterministic training ⇒ the
    stage is byte-equivalent to a recompute, which the oracle (a full
    training replay) re-proves on every check. ``split='even'`` trains on
    the doc_id % 2 == 0 half only (the fertility gate's train-split
    regime — a tokenizer trained on an earlier snapshot and applied to
    new data, so OOV is a real signal)."""
    from gridiron_spark.io.staging import ensure_stage, stage_path
    from gridiron_spark.operators.bpe import bpe_segmentations, word_freq

    stage = stage_path(
        sf_dir, "bpe_seg", "documents",
        # fmt 2 = wrapped-sentinel segmentation (the round-10 prefix-
        # collision fix); re-keys away any artifact trained pre-fix
        params={"n_merges": _BPE_N_MERGES, "split": split or "full",
                "fmt": 2},
    )
    train = load_table(spark, sf_dir, "documents")
    if split == "even":
        train = train.filter(F.col("doc_id") % 2 == 0)
    ensure_stage(
        stage,
        lambda p: bpe_segmentations(word_freq(train), _BPE_N_MERGES)
        .write.mode("overwrite")
        .parquet(p),
    )
    return spark.read.schema("word string, n_syms bigint").parquet(stage)



@register(
    "bpe_encode_tokens",
    survey="NS-text(tokenizer apply: encode the corpus with the learned BPE merges),J1,A3",
    oracle=_bpe_encode_oracle(_BPE_N_MERGES),
)
def bpe_encode_tokens(spark, sf_dir):
    """The ENCODE half of the tokenizer loop bpe_merge_sequence trains:
    apply the learned {n}-merge segmentation to every token position and
    emit per-doc BPE accounting — word count, total BPE token count, and a
    position-weighted checksum (Σ n_syms·pos, order-sensitive yet exact in
    BIGINT, the vocab_encode_checksum trick) that pins the entire encoded
    sequence without shipping arrays.

    Scale shape: the trained segmentation table comes off the staged
    artifact (see _staged_segmentations — the tokenizer is trained once,
    not per encode) and is vocab-sized, so it BROADCASTS into the
    positional token stream — the corpus side is one linear explode
    feeding a map-side join straight into the per-doc aggregate.
    """
    doc = load_table(spark, sf_dir, "documents")
    wsyms = _staged_segmentations(spark, sf_dir)
    tok = doc.select(
        "doc_id", F.posexplode(F.split(F.lower("text"), " ")).alias("pos", "word")
    )
    enc = tok.join(F.broadcast(wsyms), "word")
    return enc.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_words"),
        F.sum("n_syms").cast("bigint").alias("n_bpe_tokens"),
        F.sum(F.col("n_syms") * (F.col("pos") + 1))
        .cast("bigint")
        .alias("tokens_checksum"),
    )


bpe_encode_tokens.__doc__ = bpe_encode_tokens.__doc__.format(n=_BPE_N_MERGES)


_FERT_MAX_FRAG_PERMILLE = 400   # drop docs where >40% of word occurrences
                                # fully fragment (no learned merge applies)
_FERT_MIN_CPT_MILLI = 1160      # drop docs compressing below 1.16 chars/token


def _fertility_oracle() -> str:
    from gridiron_spark.operators.bpe import SENTINEL as S

    n = _BPE_N_MERGES
    return _bpe_ctes(n, " WHERE doc_id % 2 = 0") + f""",
wsyms AS (
    SELECT word,
           CAST(len(list_filter(string_split(seg, '{S}'), s -> s <> ''))
               AS BIGINT) AS n_syms
    FROM seg{n}
),
tok AS (
    SELECT doc_id, source, u.w AS word
    FROM (SELECT doc_id, source, string_split(lower(text), ' ') AS t
          FROM documents),
         unnest(t) AS u(w)
    WHERE u.w <> ''
),
perdoc AS (
    SELECT doc_id, ANY_VALUE(source) AS source,
           COUNT(*) AS n_words,
           SUM(CASE WHEN w.n_syms IS NULL THEN 1 ELSE 0 END) AS n_oov,
           SUM(CASE WHEN COALESCE(w.n_syms, len(tok.word)) = len(tok.word)
                         AND len(tok.word) > 1 THEN 1 ELSE 0 END) AS n_frag,
           SUM(COALESCE(w.n_syms, len(tok.word))) AS n_bpe,
           SUM(len(tok.word)) AS n_chars
    FROM tok LEFT JOIN wsyms w USING (word)
    GROUP BY doc_id
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN 1000 * n_frag <= {_FERT_MAX_FRAG_PERMILLE} * n_words
                      AND 1000 * n_chars >= {_FERT_MIN_CPT_MILLI} * n_bpe
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(SUM(n_words) AS BIGINT) AS n_words,
       CAST(SUM(n_oov) AS BIGINT) AS n_oov_words,
       CAST(SUM(n_frag) AS BIGINT) AS n_fragmented_words,
       CAST(SUM(n_bpe) AS BIGINT) AS n_bpe_tokens,
       CAST((1000 * SUM(n_chars)) // SUM(n_bpe) AS BIGINT)
           AS chars_per_token_milli,
       CAST((1000 * SUM(n_frag)) // SUM(n_words) AS BIGINT)
           AS fragmented_permille
FROM perdoc
GROUP BY source
"""


@register(
    "tokenizer_fertility_gate",
    survey="NS-text(tokenizer-fertility quality screen: chars-per-BPE-token, OOV rate, and merge-fragmentation rate vs a TRAIN-SPLIT tokenizer; per-doc gates rolled into a per-source funnel),J1,A3-A6",
    oracle=_fertility_oracle(),
)
def tokenizer_fertility_gate(spark, sf_dir):
    """Tokenizer-fertility screening — the cheap quality signal the
    funnel (filter_funnel_report) doesn't include: text a tokenizer
    cannot compress (gibberish, wrong-language, OCR noise) costs
    training compute ∝ tokens, so the standard screen drops documents
    whose bytes-per-token falls below a floor. Three signals per doc,
    all exact integers, against the {n}-merge BPE trained on the EVEN
    doc_id half only (_staged_segmentations(split='even') — a tokenizer
    trained on an earlier snapshot and applied to new data, so
    out-of-vocabulary is a real production signal even though this
    fixture's shared vocabulary keeps it zero): (1) OOV rate — words
    absent from the trained segmentation encode by byte fallback
    (n_syms := word length, the left-join COALESCE); (2) fragmentation
    rate — occurrences of multi-char words where NO learned merge
    applies (n_syms = length: fully fragmented, fertility's worst
    case); (3) chars-per-token ×1000 (floor division — the
    bytes-per-BPE-token fertility measure itself). A doc passes iff
    fragmentation ≤ {f}‰ AND chars/token ≥ {c} milli; the output is the
    per-source funnel rollup (docs, kept, word/OOV/fragment/token
    totals, pooled fertility ratios) a data team reads next to
    filter_funnel_report's attrition columns.

    Scale shape: the trained segmentation is the staged vocab-sized
    artifact (trained once, _SUCCESS-gated), broadcast into one linear
    positional explode of the corpus — a map-side LEFT join feeding one
    per-doc aggregate and one |sources|-row rollup; no second corpus
    scan, no window, no self-join. The oracle replays tokenizer
    training AND the gate in one CTE chain.
    """
    doc = load_table(spark, sf_dir, "documents")
    wsyms = _staged_segmentations(spark, sf_dir, split="even")
    tok = doc.select(
        "doc_id",
        "source",
        F.explode(F.split(F.lower("text"), " ")).alias("word"),
    ).filter(F.col("word") != "")
    enc = tok.join(F.broadcast(wsyms), "word", "left")
    wl = F.length("word")
    syms = F.coalesce(F.col("n_syms"), wl.cast("bigint"))
    perdoc = enc.groupBy("doc_id").agg(
        F.first("source").alias("source"),
        F.count(F.lit(1)).alias("n_words"),
        F.sum(F.col("n_syms").isNull().cast("bigint")).alias("n_oov"),
        F.sum(((syms == wl) & (wl > 1)).cast("bigint")).alias("n_frag"),
        F.sum(syms).alias("n_bpe"),
        F.sum(wl.cast("bigint")).alias("n_chars"),
    )
    kept = (
        (F.col("n_frag") * 1000 <= F.col("n_words") * _FERT_MAX_FRAG_PERMILLE)
        & (F.col("n_chars") * 1000 >= F.col("n_bpe") * _FERT_MIN_CPT_MILLI)
    )
    return perdoc.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(kept.cast("bigint")).cast("bigint").alias("n_kept"),
        F.sum("n_words").cast("bigint").alias("n_words"),
        F.sum("n_oov").cast("bigint").alias("n_oov_words"),
        F.sum("n_frag").cast("bigint").alias("n_fragmented_words"),
        F.sum("n_bpe").cast("bigint").alias("n_bpe_tokens"),
        F.expr("1000 * sum(n_chars) div sum(n_bpe)")
        .cast("bigint")
        .alias("chars_per_token_milli"),
        F.expr("1000 * sum(n_frag) div sum(n_words)")
        .cast("bigint")
        .alias("fragmented_permille"),
    )


tokenizer_fertility_gate.__doc__ = tokenizer_fertility_gate.__doc__.format(n=_BPE_N_MERGES, f=_FERT_MAX_FRAG_PERMILLE,
               c=_FERT_MIN_CPT_MILLI)


_WIN_DF_CAP = 10   # fingerprints seen in more docs than this are boilerplate
_WIN_MIN_SHARED = 2


@register(
    "winnow_overlap_pairs",
    survey="NS-dedup(substring-overlap doc pairs via winnowing fingerprints, DF-capped),J1,A3",
    oracle=f"""
WITH wf AS (SELECT * FROM ({_WINNOW_SQL}) t),
freq AS (
    SELECT fingerprint FROM wf
    GROUP BY fingerprint HAVING COUNT(*) <= {_WIN_DF_CAP}
),
kept AS (SELECT wf.doc_id, wf.fingerprint FROM wf JOIN freq USING (fingerprint))
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(COUNT(*) AS BIGINT) AS n_shared
FROM kept a JOIN kept b
  ON a.fingerprint = b.fingerprint AND a.doc_id < b.doc_id
GROUP BY 1, 2
HAVING COUNT(*) >= {_WIN_MIN_SHARED}
""",
)
def winnow_overlap_pairs(spark, sf_dir):
    """The MOSS report over the winnowing fingerprints: document pairs
    sharing ≥ {m} fingerprints — i.e. at least {m} substrings of length
    ≥ k+w-1 — with the shared count, the substring-granular complement to
    the shingle-Jaccard near-dup family (catches partial plagiarism and
    template reuse that whole-doc Jaccard dilutes below threshold).

    Scale shape: the standard MOSS mitigation is built in, not bolted on —
    fingerprints whose document frequency exceeds {cap} are dropped as
    boilerplate BEFORE the inverted-index self-join, so each surviving
    fingerprint contributes at most {cap}²/2 candidate pairs and the join
    is linear in corpus size by construction (exactly the hot-shingle
    failure mode BASELINE.md measured on the naive n-gram variant, here
    excluded up front). Fingerprinting itself is the audited
    winnow_fingerprint plan: one explode + one windowed min per doc.
    """
    # the fingerprint frame feeds BOTH the DF-cap aggregate and the kept
    # join — without a lineage cut the char-gram explode + windowed-min
    # pipeline runs twice per invocation (round 13; the mllib entries'
    # measured no-CSE-under-reuse pattern). localCheckpoint materializes
    # it once; the fingerprint table is corpus-linear, the same artifact
    # a production MOSS index persists anyway.
    wf = winnow_fingerprint(spark, sf_dir).localCheckpoint(eager=False)
    freq = (
        wf.groupBy("fingerprint")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= _WIN_DF_CAP)
        .select("fingerprint")
    )
    kept = wf.join(freq, "fingerprint")
    return (
        kept.alias("a")
        .join(
            kept.alias("b"),
            (F.col("a.fingerprint") == F.col("b.fingerprint"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= _WIN_MIN_SHARED)
    )


winnow_overlap_pairs.__doc__ = winnow_overlap_pairs.__doc__.format(m=_WIN_MIN_SHARED, cap=_WIN_DF_CAP)


_POOL_DIMS = 16
_POOL_MOD = 2001  # word-vector component grid: (md5 % 2001 - 1000) / 1000


@register(
    "doc_embedding_pool",
    survey="NS-text(document embedding generation: hashed word vectors, exact mean pooling),F1-F7",
    oracle=f"""
WITH t AS (
    SELECT doc_id,
           list_filter(string_split(lower(text), ' '), w -> w <> '') AS toks
    FROM documents
),
h AS (
    SELECT doc_id,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           list_transform(toks, w -> md5(w || '|0') || md5(w || '|1')) AS hs
    FROM t
),
s AS (
    SELECT doc_id, n_tokens,
           list_transform(range(0, {_POOL_DIMS}), d ->
               COALESCE(list_sum(list_transform(hs,
                   x -> CAST(('0x' || substring(x, CAST(1 + d * 4 AS INT), 4))
                             AS BIGINT) % {_POOL_MOD} - 1000)), 0)) AS sums
    FROM h
)
SELECT doc_id, n_tokens, CAST(u.i AS INTEGER) AS dim,
       CASE WHEN n_tokens = 0 THEN 0.0
            ELSE CAST(sums[CAST(u.i + 1 AS INT)] AS DOUBLE)
                 / n_tokens / 1000.0 END AS val
FROM s, unnest(range(0, {_POOL_DIMS})) AS u(i)
""",
)
def doc_embedding_pool(spark, sf_dir):
    """The EMBEDDING-GENERATION stage of a curation pipeline, in the
    fastText sentence-vector shape (mean of word vectors): each word's
    {d}-dim vector derives from the md5 family on a ±1.000 grid — TWO
    md5 digests per token total (md5(w|0) || md5(w|1), 64 hex chars),
    sliced 4 hex chars per dimension: component d =
    (int(hex[4d:4d+4]) mod {m} - 1000)/1000. The per-token digest array
    is materialized in its own projection so the {d} dimension folds
    reuse it instead of re-hashing ({d} md5/token -> 2 md5/token: this
    cut the sf0.1 bench time 4.5 s -> ~1 s). No model file to ship;
    swapping in trained vectors is a broadcast join instead of the hash.
    The document embedding is the token mean, pooled EXACTLY: integer
    component sums (BIGINT, order-free) with two IEEE divisions at the
    end — the same fixed-point discipline as the k-means update, which
    is what lets a pooled float vector hash-match cross-engine. Output
    is long-form (doc_id, dim, val): array cells aren't hashable by
    external row canonicalizers, and long form is what a vector-store
    sink ingests anyway.

    Scale shape: a pure map over the corpus scan — per-row higher-order
    folds ({d} per doc over precomputed digests) and a width-{d}
    posexplode; zero exchanges, no joins (plan-guarded). The downstream
    consumers are the ANN/SemDeDup family over the embeddings table.
    """
    # fan_out: the 16 per-dim folds are heavy per row and the stage is
    # narrow — an under-partitioned scan would run the whole pooling pass
    # on one task (measured 4.5 s single-task vs ~1 s fanned at sf0.1).
    # The round-robin exchange moves only the compact pre-fold rows.
    doc = fan_out(load_table(spark, sf_dir, "documents"))
    toks = F.filter(F.split(F.lower("text"), " "), lambda w: w != "")
    # digest per token ONCE, in its own projection, so the 16 dimension
    # folds below slice a precomputed string instead of re-hashing
    with_hs = doc.select(
        "doc_id",
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.transform(
            toks,
            lambda w: F.concat(
                F.md5(F.concat(w, F.lit("|0"))),
                F.md5(F.concat(w, F.lit("|1"))),
            ),
        ).alias("hs"),
    )
    sums = F.transform(
        F.sequence(F.lit(0), F.lit(_POOL_DIMS - 1)),
        lambda d: F.aggregate(
            F.col("hs"),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc
            + (
                F.conv(
                    F.substring(x, (F.lit(1) + d * 4).cast("int"), 4), 16, 10
                ).cast("bigint")
                % _POOL_MOD
                - 1000
            ),
        ),
    )
    pooled = with_hs.select(
        "doc_id",
        "n_tokens",
        F.posexplode(sums).alias("dim", "s"),
    )
    return pooled.select(
        "doc_id",
        "n_tokens",
        F.col("dim").cast("int").alias("dim"),
        F.when(F.col("n_tokens") == 0, F.lit(0.0))
        .otherwise(
            F.col("s").cast("double") / F.col("n_tokens") / F.lit(1000.0)
        )
        .alias("val"),
    )


doc_embedding_pool.__doc__ = doc_embedding_pool.__doc__.format(d=_POOL_DIMS, m=_POOL_MOD)


_PMI_MIN_COUNT = 5
_PMI_TOPK = 100


@register(
    "pmi_collocations",
    survey="NS-text(collocation mining: adjacent-bigram PMI ranking, word2phrase-style),A3,J1,O1",
    oracle=f"""
WITH t AS (SELECT string_split(lower(text), ' ') AS t FROM documents),
big AS (
    SELECT unnest(list_transform(range(0, len(t) - 1),
                                 i -> t[i+1] || ' ' || t[i+2])) AS bigram
    FROM t
),
uni AS (SELECT unnest(t) AS w FROM t),
cxy AS (SELECT bigram, CAST(COUNT(*) AS BIGINT) AS n_xy FROM big GROUP BY bigram),
cx AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS n FROM uni GROUP BY w),
nb AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_bigrams FROM big)
SELECT bigram, n_xy, a.n AS n_x, b.n AS n_y, n_bigrams,
       n_xy * n_bigrams * 1000 // (a.n * b.n) AS pmi_x1000
FROM cxy
JOIN cx a ON a.w = split_part(bigram, ' ', 1)
JOIN cx b ON b.w = split_part(bigram, ' ', 2), nb
WHERE n_xy >= {_PMI_MIN_COUNT}
ORDER BY pmi_x1000 DESC, bigram
LIMIT {_PMI_TOPK}
""",
)
def pmi_collocations(spark, sf_dir):
    """Collocation mining — the word2phrase step that decides which
    adjacent word pairs are PHRASES before tokenizer training: rank
    bigrams by pointwise mutual information, expressed as the integer
    ratio p(xy)/(p(x)p(y)) = n_xy·N / (n_x·n_y), scaled ×1000 (the log in
    PMI is monotone, so ranking by the ratio ranks by PMI — the same
    monotone-substitute rationale as BM25's rational idf). The
    ≥{_PMI_MIN_COUNT}-count floor is the standard guard against
    rare-pair PMI blow-up; ties break on the bigram itself so the
    top-{_PMI_TOPK} frontier is deterministic.

    Scale shape: bigram assembly is the token-row lead-window (one linear
    user-bounded shuffle on doc_id — shingle_rows' measured pattern, no
    per-lambda re-split); both count tables are map-side-combined
    aggregates; the bigram⋈unigram joins are equi-joins on the word key
    (vocabulary-sized right side — hash-join, AQE broadcasts it when it
    fits); the 1-row bigram total broadcasts; top-{_PMI_TOPK} is
    TakeOrderedAndProject. Nothing quadratic, no global sort."""
    from pyspark.sql import Window

    doc = load_table(spark, sf_dir, "documents")
    toks = fan_out(
        doc.select(
            "doc_id",
            F.posexplode(F.split(F.lower(F.col("text")), " ")).alias("pos", "w"),
        )
    )
    w_doc = Window.partitionBy("doc_id").orderBy("pos")
    big = (
        toks.withColumn("nxt", F.lead("w").over(w_doc))
        .filter(F.col("nxt").isNotNull())
        .select(
            F.concat_ws(" ", "w", "nxt").alias("bigram"),
            F.col("w").alias("w1"),
            F.col("nxt").alias("w2"),
        )
    )
    cxy = big.groupBy("bigram", "w1", "w2").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_xy")
    )
    cx = toks.groupBy("w").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    nb = big.agg(F.count(F.lit(1)).cast("bigint").alias("n_bigrams"))
    return (
        cxy.filter(F.col("n_xy") >= _PMI_MIN_COUNT)
        .join(cx.select(F.col("w").alias("w1"), F.col("n").alias("n_x")), "w1")
        .join(cx.select(F.col("w").alias("w2"), F.col("n").alias("n_y")), "w2")
        .join(F.broadcast(nb))
        .select(
            "bigram",
            "n_xy",
            "n_x",
            "n_y",
            "n_bigrams",
            F.expr("n_xy * n_bigrams * 1000 div (n_x * n_y)").alias("pmi_x1000"),
        )
        .orderBy(F.col("pmi_x1000").desc(), "bigram")
        .limit(_PMI_TOPK)
    )
