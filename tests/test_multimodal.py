"""Multimodal plumbing: binary payloads, typed metadata, Arrow-batched
decode/extract stages. The codec itself is stubbed (no media libs here); these
tests pin the *engine* contract — schemas, batch shapes, determinism, and
metadata-only planning."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from gridiron_spark.io.tables import load_table
from gridiron_spark.operators.multimodal import (
    KINDS,
    _decode_payload,
    decode_media,
    extract_media_embedding,
    media_from_documents,
    resize_images,
    sample_frames,
)
from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def media(spark):
    return media_from_documents(load_table(spark, SF_SMALL, "documents")).cache()


def test_media_schema_and_kinds(media):
    assert [f.name for f in media.schema.fields] == ["media_id", "kind", "payload", "meta"]
    assert media.schema["payload"].dataType.typeName() == "binary"
    kinds = {r.kind for r in media.select("kind").distinct().collect()}
    assert kinds == set(KINDS)


def test_codec_boundary_is_explicit():
    with pytest.raises(NotImplementedError):
        _decode_payload("image", b"\x89PNG")


def test_decode_media_deterministic_and_content_correct(spark, media):
    decoded = {r.media_id: r for r in decode_media(media).collect()}
    src = {r.media_id: bytes(r.payload) for r in media.collect()}
    assert set(decoded) == set(src)
    for mid, payload in src.items():
        assert decoded[mid].content_md5 == hashlib.md5(payload).hexdigest()
        assert decoded[mid].n_bytes == len(payload)
        assert decoded[mid].decoded_ok


def test_embedding_shape_and_determinism(media):
    emb = extract_media_embedding(media, dims=16)
    rows = emb.select("media_id", "embedding").collect()
    assert all(len(r.embedding) == 16 for r in rows)
    assert all(0.0 <= v <= 1.0 for r in rows for v in r.embedding)
    again = {r.media_id: r.embedding for r in emb.select("media_id", "embedding").collect()}
    assert {r.media_id: r.embedding for r in rows} == again


def test_resize_targets_only_images(media):
    out = resize_images(media, 224, 224)
    rows = out.collect()
    assert all(r.kind == "image" for r in rows)
    assert all(r.meta.width == 224 and r.meta.height == 224 for r in rows)
    # payload untouched (opaque passthrough)
    src = {r.media_id: bytes(r.payload) for r in media.filter(F.col("kind") == "image").collect()}
    assert {r.media_id: bytes(r.payload) for r in rows} == src


def test_decode_prunes_unused_source_columns(spark):
    """The decode stage must not drag unused document columns through the
    scan: ReadSchema stops at what media_from_documents consumes, and lang/
    source never enter the plan (column pruning reaches through mapInPandas)."""
    docs = load_table(spark, SF_SMALL, "documents")
    plan = decode_media(media_from_documents(docs))._jdf.queryExecution().executedPlan().toString()
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert read_schema, plan[:1500]
    assert "lang" not in read_schema[0] and "source" not in read_schema[0]


def test_sample_frames_metadata_only(media):
    out = sample_frames(media, every_n=10).collect()
    meta = {r.media_id: r.meta.n_frames for r in media.filter(F.col("kind") == "video").collect()}
    got = {}
    for r in out:
        got.setdefault(r.media_id, []).append(r.frame_idx)
    assert set(got) == set(meta)
    for mid, idxs in got.items():
        assert idxs == list(range(0, meta[mid], 10))
