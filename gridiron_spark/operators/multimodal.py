"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The engine-side contract for media at 100 TB:
- payload is an opaque ``BinaryType`` column (never parsed by Catalyst; stays
  off the shuffle path unless explicitly carried);
- per-kind metadata rides in a typed struct column so filters/pruning work on
  metadata without touching payload bytes;
- decode / feature-extract / resize / frame-sample run as Arrow-batched
  ``mapInPandas`` / ``pandas_udf`` stages — the only layer that ever looks
  inside the bytes, sized by batch not by row.

Real media codecs (PIL/librosa/ffmpeg) are NOT in this container, so the
byte-interpretation step is STUBBED: ``_decode_payload`` raises
``NotImplementedError`` for real codec work and the pipeline substitutes a
deterministic fake (md5-derived) decode so the Spark-side plumbing — schema,
partitioning, UDF signatures, Arrow batch shapes — is fully real and tested.
Swap ``_decode_payload`` for a real codec to productionize; nothing else
changes.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

KINDS = ("image", "audio", "video")

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("n_bytes", T.IntegerType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("n_frames", T.IntegerType()),
                    T.StructField("sample_rate", T.IntegerType()),
                ]
            ),
        ),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("content_md5", T.StringType()),
        T.StructField("decoded_ok", T.BooleanType()),
    ]
)


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic media table over the documents corpus: payload is the
    utf-8 text bytes, kind cycles by media_id, metadata derives from n_chars.
    (A stand-in source; a real lake would land these columns at ingest.)"""
    kind = F.element_at(F.array(*[F.lit(k) for k in KINDS]), (F.col("doc_id") % 3 + 1).cast("int"))
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.octet_length(F.encode("text", "UTF-8")).cast("int").alias("n_bytes"),
            (F.col("n_chars") % 640 + 16).cast("int").alias("width"),
            (F.col("n_chars") % 480 + 16).cast("int").alias("height"),
            (F.col("n_chars") % 60 + 1).cast("int").alias("n_frames"),
            F.lit(16_000).alias("sample_rate"),
        ).alias("meta"),
    )


def _decode_payload(kind: str, payload: bytes) -> dict:
    """The codec boundary. Real decoders are not available in this
    environment — a production deployment implements this per kind (PIL for
    image, soundfile for audio, pyav for video) and returns pixel/sample
    arrays. Everything outside this function is environment-independent."""
    raise NotImplementedError("media codecs not available in this container")


def _fake_decode(kind: str, payload: bytes) -> dict:
    """Deterministic stand-in decode: content hash + byte stats."""
    return {
        "n_bytes": len(payload),
        "content_md5": hashlib.md5(payload).hexdigest(),
        "decoded_ok": True,
    }


def decode_media(media: DataFrame) -> DataFrame:
    """Arrow-batched decode pass: mapInPandas over (media_id, kind, payload).

    Column-pruned input (payload only enters this stage), batch-shaped work
    (one pandas frame per Arrow batch, not per row), null-safe. At scale this
    stage is a map-only pass — no shuffle — and its parallelism is the scan
    partitioning of the media table.
    """

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                try:
                    d = _decode_payload(kind, bytes(payload))
                except NotImplementedError:
                    d = _fake_decode(kind, bytes(payload))
                out.append(
                    (int(mid), kind, d["n_bytes"], d["content_md5"], d["decoded_ok"])
                )
            yield pd.DataFrame(out, columns=[f.name for f in DECODED_SCHEMA.fields])

    return media.select("media_id", "kind", "payload").mapInPandas(
        _decode, schema=DECODED_SCHEMA
    )


def extract_media_embedding(media: DataFrame, dims: int = 16) -> DataFrame:
    """Deterministic fake feature extractor with real pandas_udf plumbing:
    payload bytes → fixed-dim float vector (md5-chunk-derived). A real model
    swaps the vectorized body for an ONNX/torch batch call — the Arrow
    transfer, schema, and batching contract are identical."""

    @F.pandas_udf(T.ArrayType(T.FloatType()))
    def _embed(payload: pd.Series) -> pd.Series:
        def vec(b: bytes | None):
            if b is None:
                return None
            h = hashlib.md5(bytes(b)).digest()
            raw = (h * ((dims // len(h)) + 1))[:dims]
            return [x / 255.0 for x in raw]

        return payload.map(vec)

    return media.withColumn("embedding", _embed(F.col("payload")))


def resize_images(media: DataFrame, width: int = 224, height: int = 224) -> DataFrame:
    """Resize stage for image rows. Codec-less: records the *target* geometry
    and keeps payload opaque (a real impl rewrites payload via
    ``_decode_payload``). Filter-then-map: non-image rows never reach it."""
    return media.filter(F.col("kind") == "image").withColumn(
        "meta",
        F.struct(
            F.col("meta.n_bytes").alias("n_bytes"),
            F.lit(width).cast("int").alias("width"),
            F.lit(height).cast("int").alias("height"),
            F.col("meta.n_frames").alias("n_frames"),
            F.col("meta.sample_rate").alias("sample_rate"),
        ),
    )


def sample_frames(media: DataFrame, every_n: int = 10) -> Column | DataFrame:
    """Frame sampling for video rows: explode frame indices 0, n, 2n, … from
    metadata — pure Column algebra, no UDF, no payload bytes touched. The
    per-frame payload extraction is the codec boundary again (stubbed as a
    (media_id, frame_idx) manifest a decoder stage consumes)."""
    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0), F.col("meta.n_frames") - 1, F.lit(every_n)
                )
            ).alias("frame_idx"),
        )
    )
