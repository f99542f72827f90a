"""Multimodal pipeline queries: binary payload columns over the documents
corpus (operators/multimodal.py). The decode stage is a real mapInPandas pass
whose stand-in decode is deterministic (md5 + byte stats), so even the
UDF-backed pipeline hash-matches a DuckDB oracle — the codec boundary is the
only stubbed piece (no media libs in this container)."""

from __future__ import annotations

from pyspark.sql import functions as F

from gridiron_spark.io.tables import load_table
from gridiron_spark.operators.multimodal import (
    decode_media,
    extract_media_embedding,
    media_from_documents,
    resize_images,
    sample_frames,
)
from gridiron_spark.queries import register


@register(
    "multimodal_decode",
    survey="NS-multimodal(decode via mapInPandas, binary payload)",
    oracle="""
SELECT doc_id AS media_id,
       ['image', 'audio', 'video'][CAST(doc_id % 3 AS INTEGER) + 1] AS kind,
       CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
       md5(text) AS content_md5,
       TRUE AS decoded_ok
FROM documents
""",
)
def multimodal_decode(spark, sf_dir):
    """Binary payload → Arrow-batched decode (mapInPandas). The fake decode
    is content-deterministic, so the whole UDF stage is oracle-checked.
    codecs=False: these payloads are raw text bytes, so a doc that happens
    to start with "P6"/"RIFF" must not be parsed as a container — the
    contract here is byte stats (oracle: md5(text))."""
    docs = load_table(spark, sf_dir, "documents")
    return decode_media(media_from_documents(docs), codecs=False)


@register(
    "multimodal_frame_sample",
    survey="NS-multimodal(video frame sampling, metadata-only)",
    oracle="""
SELECT doc_id AS media_id, f.frame_idx
FROM documents
CROSS JOIN LATERAL (
    SELECT unnest(range(0, CAST(n_chars % 60 + 1 AS BIGINT), 10)) AS frame_idx
) f
WHERE doc_id % 3 = 2
""",
)
def multimodal_frame_sample(spark, sf_dir):
    """Frame-index manifest for video rows — pure Column algebra over the
    metadata struct; payload bytes never touched (the 100 TB-safe shape:
    sampling decisions cost metadata reads only)."""
    docs = load_table(spark, sf_dir, "documents")
    return sample_frames(media_from_documents(docs), every_n=10)


@register(
    "multimodal_resize",
    survey="NS-multimodal(resize stage: kind routing + target geometry)",
    oracle="""
SELECT doc_id AS media_id,
       CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
       CAST(224 AS INTEGER) AS width,
       CAST(224 AS INTEGER) AS height,
       CAST(n_chars % 60 + 1 AS INTEGER) AS n_frames
FROM documents
WHERE doc_id % 3 = 0
""",
)
def multimodal_resize(spark, sf_dir):
    """The resize stage's engine-side contract: only image rows are routed
    in (kind filter on metadata — payload bytes untouched), target geometry
    lands in the meta struct, and every non-geometry metadata field
    (n_bytes, n_frames) survives the rewrite — which the oracle checks
    field by field. The pixel rewrite itself is the stubbed codec boundary
    (operators/multimodal._decode_payload)."""
    docs = load_table(spark, sf_dir, "documents")
    resized = resize_images(media_from_documents(docs), width=224, height=224)
    return resized.select(
        "media_id",
        F.col("meta.n_bytes").alias("n_bytes"),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
        F.col("meta.n_frames").alias("n_frames"),
    )


@register(
    "multimodal_embed",
    survey="NS-multimodal(feature extraction via pandas_udf, digest hash-checked)",
    # The embedding body is the swappable model boundary, but THIS body is
    # deterministic (md5-chunk bytes / 255 as float32), so the digest IS
    # SQL-replayable: DuckDB rebuilds each element from the payload md5,
    # reproduces the float32 widening + 6-dp rounding + string form, and
    # hashes the same comma-joined digest. The element domain is the 256
    # byte values, so the float-formatting agreement is exhaustively
    # covered by any corpus touching all bytes. (Upgraded from rows-only
    # in round 9 — the digest was designed for exactly this.)
    oracle="""
WITH m AS (
    SELECT doc_id AS media_id,
           (['image', 'audio', 'video'])[CAST(doc_id % 3 + 1 AS INTEGER)]
               AS kind,
           md5(text) AS h
    FROM documents
)
SELECT media_id, kind, CAST(16 AS INTEGER) AS emb_dim,
       md5(array_to_string(list_transform(range(0, 16), i ->
           CAST(ROUND(CAST(CAST(
               CAST(('0x' || substring(h, CAST(i*2+1 AS INTEGER), 2))
                    AS BIGINT) / 255.0
           AS FLOAT) AS DOUBLE), 6) AS VARCHAR)), ',')) AS emb_md5
FROM m
""",
)
def multimodal_embed(spark, sf_dir):
    """The pandas_udf embedding stage, with the array<float> output projected
    to scalar digests for the driver's row canonicalizer (which cannot hash
    list cells): vector dimension + md5 of the 6-dp-rounded values. The
    digest pins every element's value, so the UDF plumbing is fully
    exercised and regressions flip the hash — and since the fake-model
    body is md5-chunk-deterministic, the oracle replays the whole digest
    (payload bytes → md5 → byte/255 float32 → 6-dp round → string → md5)
    in SQL, making this a full hash-checked entry, not rows-only."""
    docs = load_table(spark, sf_dir, "documents")
    emb = extract_media_embedding(media_from_documents(docs), dims=16)
    rounded = F.transform(
        "embedding", lambda x: F.round(x.cast("double"), 6).cast("string")
    )
    return emb.select(
        "media_id",
        "kind",
        F.size("embedding").alias("emb_dim"),
        F.md5(F.concat_ws(",", rounded)).alias("emb_md5"),
    )


@register(
    "multimodal_wav_roundtrip",
    survey="NS-multimodal(REAL audio codec proof: WAV pack -> decode -> integer sample stats)",
    oracle="""
WITH s AS (
    SELECT doc_id,
           list_transform(range(0, 256),
               i -> (doc_id * 31 + i * 17) % 65536 - 32768) AS v
    FROM documents
)
SELECT doc_id AS media_id,
       CAST(16000 AS INTEGER) AS sample_rate,
       CAST(256 AS BIGINT) AS n_samples,
       CAST(list_sum(list_transform(v, x -> x * x)) AS BIGINT) AS sum_sq,
       CAST(len(list_filter(range(0, 255),
           i -> v[CAST(i + 1 AS INT)] * v[CAST(i + 2 AS INT)] < 0))
           AS BIGINT) AS n_zero_cross,
       CAST(list_min(v) AS BIGINT) AS s_min,
       CAST(list_max(v) AS BIGINT) AS s_max
FROM s
""",
)
def multimodal_wav_roundtrip(spark, sf_dir):
    """The real audio codec, driver-checked (not just pytest-pinned): a
    deterministic int16 signal per doc packs into an actual RIFF/WAVE
    container, travels the production decode boundary
    (operators/multimodal._decode_payload -> _decode_wav), and integer
    stats of the DECODED samples are hash-compared against an oracle that
    computes the same stats from the generating formula — green iff the
    encode->decode loop reproduces every sample bit-exactly. Upgrades the
    codec evidence from unit tests to an external CORRECTNESS row."""
    from gridiron_spark.operators.multimodal import wav_roundtrip_stats

    docs = load_table(spark, sf_dir, "documents")
    return wav_roundtrip_stats(
        docs.select(F.col("doc_id").alias("media_id"))
    )


@register(
    "multimodal_ppm_roundtrip",
    survey="NS-multimodal(REAL image codec proof: PPM pack -> decode -> integer pixel stats)",
    oracle="""
WITH p AS (
    SELECT doc_id,
           8 + doc_id % 9 AS w,
           6 + doc_id % 5 AS h,
           list_transform(range(0, (8 + doc_id % 9) * (6 + doc_id % 5) * 3),
               i -> (doc_id * 7 + i * 13) % 256) AS v
    FROM documents
)
SELECT doc_id AS media_id,
       CAST(w AS INTEGER) AS width,
       CAST(h AS INTEGER) AS height,
       CAST(len(v) AS BIGINT) AS n_samples,
       CAST(list_sum(v) AS BIGINT) AS sum_val,
       CAST(list_sum(list_transform(range(0, len(v)),
           i -> v[CAST(i + 1 AS INT)] * (i + 1))) AS BIGINT) AS pos_checksum,
       CAST(list_min(v) AS BIGINT) AS p_min,
       CAST(list_max(v) AS BIGINT) AS p_max
FROM p
""",
)
def multimodal_ppm_roundtrip(spark, sf_dir):
    """The real image codec, driver-checked (the PPM twin of
    multimodal_wav_roundtrip): per-doc deterministic RGB pixels with
    per-doc VARYING dimensions pack into a real P6 container, travel the
    production decode boundary, and integer pixel stats (incl. a
    position-weighted checksum pinning sample order) hash-match an oracle
    replaying the generating formula — green iff header parsing AND the
    pixel array copy are both bit-exact."""
    from gridiron_spark.operators.multimodal import ppm_roundtrip_stats

    docs = load_table(spark, sf_dir, "documents")
    return ppm_roundtrip_stats(docs.select(F.col("doc_id").alias("media_id")))


@register(
    "multimodal_png_roundtrip",
    survey="NS-multimodal(REAL compressed-image codec proof: PNG pack -> inflate+unfilter -> integer pixel stats)",
    oracle="""
WITH p AS (
    SELECT doc_id,
           8 + doc_id % 7 AS w,
           5 + doc_id % 6 AS h,
           list_transform(range(0, (8 + doc_id % 7) * (5 + doc_id % 6) * 3),
               i -> (doc_id * 11 + i * 19) % 256) AS v
    FROM documents
)
SELECT doc_id AS media_id,
       CAST(w AS INTEGER) AS width,
       CAST(h AS INTEGER) AS height,
       CAST(len(v) AS BIGINT) AS n_samples,
       CAST(list_sum(v) AS BIGINT) AS sum_val,
       CAST(list_sum(list_transform(range(0, len(v)),
           i -> v[CAST(i + 1 AS INT)] * (i + 1))) AS BIGINT) AS pos_checksum,
       CAST(list_min(v) AS BIGINT) AS p_min,
       CAST(list_max(v) AS BIGINT) AS p_max
FROM p
""",
)
def multimodal_png_roundtrip(spark, sf_dir):
    """The third real codec, and the first with a COMPRESSION loop in the
    path (PPM/WAV are raw-array containers): per-doc deterministic RGB
    pixels with per-doc varying dimensions are forward-filtered (scanline
    y gets filter y mod 5, so all five PNG filter types are live),
    deflate-compressed into a real PNG, decoded back through the
    production boundary (operators/multimodal._decode_png — stdlib zlib,
    CRC-verified chunk walk, per-scanline unfilter), and reduced to
    integer pixel stats hash-matched against an oracle replaying the
    generating formula — green iff inflate AND every unfilter branch
    reproduce each sample bit-exactly, in order."""
    from gridiron_spark.operators.multimodal import png_roundtrip_stats

    docs = load_table(spark, sf_dir, "documents")
    return png_roundtrip_stats(docs.select(F.col("doc_id").alias("media_id")))


def _dhash_oracle() -> str:
    from gridiron_spark.operators.multimodal import (
        DHASH_BASES,
        DHASH_H,
        DHASH_W,
    )

    n = DHASH_W * DHASH_H
    gray = (
        "(CAST(('0x' || substring(md5(CAST(doc_id % {b} AS VARCHAR) || '_' "
        "|| CAST(i AS VARCHAR)), 1, 2)) AS BIGINT) "
        "+ CASE WHEN (doc_id // {b}) % 2 = 1 AND i % 97 = 0 "
        "THEN 128 ELSE 0 END) % 256"
    ).format(b=DHASH_BASES)
    return f"""
WITH px AS (
    SELECT doc_id AS media_id,
           list_transform(range(0, {n}), i -> {gray}) AS v
    FROM documents
),
cl AS (
    SELECT media_id,
           list_transform(range(0, 72), c ->
               (v[(c // 9 * 2) * {DHASH_W} + (c % 9) * 2 + 1]
                + v[(c // 9 * 2) * {DHASH_W} + (c % 9) * 2 + 2]
                + v[(c // 9 * 2 + 1) * {DHASH_W} + (c % 9) * 2 + 1]
                + v[(c // 9 * 2 + 1) * {DHASH_W} + (c % 9) * 2 + 2]) // 4
           ) AS cells
    FROM px
),
bt AS (
    SELECT media_id,
           list_transform(range(0, 64), b ->
               CASE WHEN cells[(b // 8) * 9 + (b % 8) + 2]
                         > cells[(b // 8) * 9 + (b % 8) + 1]
                    THEN 1 ELSE 0 END) AS bits
    FROM cl
),
h AS (
    SELECT media_id,
           CAST(list_sum(list_transform(range(0, 32),
               i -> bits[i + 33] * (CAST(1 AS BIGINT) << i))) AS BIGINT) AS hi,
           CAST(list_sum(list_transform(range(0, 32),
               i -> bits[i + 1] * (CAST(1 AS BIGINT) << i))) AS BIGINT) AS lo
    FROM bt
),
b AS (
              SELECT media_id, hi, lo, 0 AS bi, lo % 65536 AS bv FROM h
    UNION ALL SELECT media_id, hi, lo, 1, lo // 65536 FROM h
    UNION ALL SELECT media_id, hi, lo, 2, hi % 65536 FROM h
    UNION ALL SELECT media_id, hi, lo, 3, hi // 65536 FROM h
),
cand AS (
    SELECT DISTINCT x.media_id AS id_a, x.hi AS ha, x.lo AS la,
                    y.media_id AS id_b, y.hi AS hb, y.lo AS lb
    FROM b x JOIN b y ON x.bi = y.bi AND x.bv = y.bv
                     AND x.media_id < y.media_id
)
SELECT id_a, id_b,
       CAST(bit_count(xor(ha, hb)) + bit_count(xor(la, lb)) AS BIGINT)
           AS hamming
FROM cand
WHERE bit_count(xor(ha, hb)) + bit_count(xor(la, lb)) <= 10
"""


@register(
    "image_dhash_neardup",
    survey="NS-multimodal+NS-dedup(perceptual dHash through the REAL image decode boundary, banded Hamming near-dup join)",
    oracle=_dhash_oracle(),
)
def image_dhash_neardup(spark, sf_dir):
    """Perceptual near-duplicate detection for IMAGES — the pixel-space
    twin of simhash_near_pairs: every doc's deterministic test image
    (md5-family pixels, planted few-pixel perturbations between variants
    of the same base) packs into a real P6 PPM, decodes through the
    production codec boundary (operators/multimodal.image_dhash), and
    reduces to the classic 64-bit dHash (9x8 2x2-block means, each bit =
    right cell brighter). Near-dups are found EXACTLY like the text LSH
    family: 4x16-bit band blocking → candidate pairs → Hamming(<=10)
    verify on the full hash — lossless for this band layout up to 16
    scattered flipped bits... and the planted variants flip at most 6.

    Scale shape: hashing is an Arrow-batched map (no shuffle); the band
    join shuffles 4 x 16-byte keys per image — never pixels — and the
    verify is a bit_count over two BIGINT halves, all JVM-side. The
    oracle replays pixels -> cells -> bits -> bands -> pairs in SQL, so
    the driver hash checks decode, hash, banding, AND verification."""
    from gridiron_spark.operators.multimodal import image_dhash

    docs = load_table(spark, sf_dir, "documents")
    h = image_dhash(docs.select(F.col("doc_id").alias("media_id")))
    bands = h.select(
        "media_id",
        "hash_hi",
        "hash_lo",
        F.explode(
            F.array(
                F.struct(
                    F.lit(0).alias("bi"),
                    (F.col("hash_lo") % 65536).alias("bv"),
                ),
                F.struct(
                    F.lit(1).alias("bi"),
                    F.expr("hash_lo div 65536").alias("bv"),
                ),
                F.struct(
                    F.lit(2).alias("bi"),
                    (F.col("hash_hi") % 65536).alias("bv"),
                ),
                F.struct(
                    F.lit(3).alias("bi"),
                    F.expr("hash_hi div 65536").alias("bv"),
                ),
            )
        ).alias("band"),
    ).select("media_id", "hash_hi", "hash_lo", "band.bi", "band.bv")
    x, y = bands.alias("x"), bands.alias("y")
    cand = (
        x.join(
            y,
            (F.col("x.bi") == F.col("y.bi"))
            & (F.col("x.bv") == F.col("y.bv"))
            & (F.col("x.media_id") < F.col("y.media_id")),
        )
        .select(
            F.col("x.media_id").alias("id_a"),
            F.col("x.hash_hi").alias("ha"),
            F.col("x.hash_lo").alias("la"),
            F.col("y.media_id").alias("id_b"),
            F.col("y.hash_hi").alias("hb"),
            F.col("y.hash_lo").alias("lb"),
        )
        .distinct()
    )
    ham = (
        F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
        + F.bit_count(F.col("la").bitwiseXOR(F.col("lb")))
    ).cast("bigint")
    return (
        cand.select("id_a", "id_b", ham.alias("hamming"))
        .filter(F.col("hamming") <= 10)
    )


@register(
    "audio_energy_windows",
    survey="NS-multimodal(windowed audio features through the REAL WAV codec: energy/peak/zero-crossings per 64-sample window)",
    oracle="""
WITH p AS (
    SELECT doc_id,
           list_transform(range(0, 256),
               i -> (doc_id * 31 + i * 17) % 65536 - 32768) AS v
    FROM documents
),
w AS (
    SELECT doc_id, u.wi FROM p
    CROSS JOIN LATERAL (SELECT unnest(range(0, 4)) AS wi) u
)
SELECT w.doc_id AS media_id,
       CAST(w.wi AS INTEGER) AS win_idx,
       CAST(list_sum(list_transform(range(0, 64),
           j -> p.v[w.wi * 64 + j + 1] * p.v[w.wi * 64 + j + 1]))
           AS BIGINT) AS energy_sq,
       CAST(list_max(list_transform(range(0, 64),
           j -> abs(p.v[w.wi * 64 + j + 1]))) AS BIGINT) AS peak_abs,
       CAST(list_sum(list_transform(range(0, 63),
           j -> CASE WHEN p.v[w.wi * 64 + j + 1] * p.v[w.wi * 64 + j + 2] < 0
                THEN 1 ELSE 0 END)) AS BIGINT) AS n_zc
FROM w JOIN p ON p.doc_id = w.doc_id
""",
)
def audio_energy_windows(spark, sf_dir):
    """The feature-extraction stage a speech/audio curation pipeline runs
    after decode (silence trimming, loudness normalization, VAD all start
    here): per-clip deterministic int16 PCM travels the REAL RIFF/WAVE
    boundary (operators/multimodal._decode_wav) and each 64-sample window
    reduces to exact integer energy / peak / zero-crossing features,
    hash-matched against a formula-replay oracle — green iff container
    walk, PCM slicing, AND the window arithmetic agree sample-for-sample.

    Scale shape: Arrow-batched map, 4 output rows per clip, zero
    shuffles — feature extraction runs at scan speed like every codec
    stage in this repo."""
    from gridiron_spark.operators.multimodal import audio_energy_windows

    docs = load_table(spark, sf_dir, "documents")
    return audio_energy_windows(docs.select(F.col("doc_id").alias("media_id")))
