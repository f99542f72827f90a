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


def _make_ppm(width, height, maxval=255, comment=False):
    header = b"P6\n"
    if comment:
        header += b"# a comment line\n"
    header += f"{width} {height}\n{maxval}\n".encode()
    bps = 1 if maxval < 256 else 2
    pixels = bytes((i * 7 + 3) % 256 for i in range(width * height * 3 * bps))
    return header + pixels, pixels


def _make_wav(n_samples, sample_rate=8000, channels=1, bits=16):
    import struct

    frame = channels * bits // 8
    data = bytes((i * 13 + 1) % 256 for i in range(n_samples * frame))
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, sample_rate * frame, frame, bits
    )
    chunks = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(chunks)) + chunks, data


def test_real_ppm_decode_dimensions_and_pixels():
    payload, pixels = _make_ppm(5, 3, comment=True)
    d = _decode_payload("image", payload)
    assert (d["width"], d["height"], d["maxval"]) == (5, 3, 255)
    assert d["n_pixels"] == 15
    assert d["decoded_ok"] and d["n_bytes"] == len(payload)
    # digest is of the DECODED pixel array, not the container bytes
    assert d["content_md5"] == hashlib.md5(pixels).hexdigest()
    # 16-bit samples double the pixel payload
    wide, _ = _make_ppm(2, 2, maxval=65535)
    assert _decode_payload("image", wide)["maxval"] == 65535
    with pytest.raises(ValueError):
        _decode_payload("image", payload[:-1])  # truncated pixel data


def test_real_wav_decode_layout_and_samples():
    payload, data = _make_wav(32, sample_rate=16000, channels=2)
    d = _decode_payload("audio", payload)
    assert (d["sample_rate"], d["channels"], d["bits"]) == (16000, 2, 16)
    assert d["n_samples"] == 32
    assert d["content_md5"] == hashlib.md5(data).hexdigest()
    # odd-sized chunks are word-aligned: an odd data chunk must still parse
    odd, odd_data = _make_wav(3, channels=1, bits=8)
    assert _decode_payload("audio", odd)["n_samples"] == 3
    with pytest.raises(ValueError):
        _decode_payload("audio", b"RIFF\x00\x00\x00\x00WAVEjunk")


def test_decode_media_mixes_real_and_fake_codecs(spark):
    """End-to-end mapInPandas pass over a frame mixing real PPM/WAV payloads
    with a codec-less one: real rows digest their decoded arrays, the
    codec-less row falls back to the deterministic fake (payload digest)."""
    ppm, pixels = _make_ppm(4, 4)
    wav, samples = _make_wav(8)
    other = b"\x89PNG fake payload"
    media = spark.createDataFrame(
        [(1, "image", bytearray(ppm)), (2, "audio", bytearray(wav)),
         (3, "image", bytearray(other))],
        "media_id bigint, kind string, payload binary",
    )
    rows = {r.media_id: r for r in decode_media(media).collect()}
    assert rows[1].content_md5 == hashlib.md5(pixels).hexdigest()
    assert rows[2].content_md5 == hashlib.md5(samples).hexdigest()
    assert rows[3].content_md5 == hashlib.md5(other).hexdigest()
    assert all(r.decoded_ok for r in rows.values())


def test_png_roundtrip_all_filters_and_profiles():
    """Every PNG filter type (the encoder assigns y % 5) and every 8-bit
    color profile must survive the compress→decode loop bit-exactly."""
    import numpy as np

    from gridiron_spark.operators.multimodal import _decode_png, _encode_png

    for mid in range(12):
        w, h = 8 + mid % 7, 5 + mid % 6  # h >= 5 → all five filters used
        n = w * h * 3
        pix = ((mid * 11 + np.arange(n) * 19) % 256).astype(np.uint8).tobytes()
        d = _decode_png(_encode_png(pix, w, h, 3))
        assert d["pixels"] == pix and (d["width"], d["height"]) == (w, h)
    for ch in (1, 2, 4):  # gray, gray+alpha, RGBA
        pix = bytes((i * 7) % 256 for i in range(9 * 6 * ch))
        d = _decode_png(_encode_png(pix, 9, 6, ch))
        assert d["pixels"] == pix and d["channels"] == ch


def test_png_rejects_corruption():
    """Truncations raise cleanly; a flipped pixel byte inside the IDAT
    stream must fail the chunk CRC, never silently decode wrong."""
    import numpy as np
    import pytest as _pytest

    from gridiron_spark.operators.multimodal import _decode_png, _encode_png

    pix = ((np.arange(6 * 5 * 3) * 13) % 256).astype(np.uint8).tobytes()
    png = _encode_png(pix, 6, 5, 3)
    for cut in range(len(png)):
        # a cut that still contains the full IDAT may legally parse — but
        # then it must be the TRUE decode, never a silent half-result
        try:
            d = _decode_png(png[:cut])
            assert d["pixels"] == pix
        except ValueError:
            pass
    corrupt = bytearray(png)
    corrupt[40] ^= 0xFF  # inside IHDR/IDAT territory → CRC breaks
    with _pytest.raises(ValueError):
        _decode_png(bytes(corrupt))


def test_decode_media_malformed_magic_falls_back(spark):
    """A payload that SNIFFS as a container but is malformed (raw text
    starting with 'P6', a truncated RIFF header) must fall back to the
    deterministic byte-stats fake — never kill the mapInPandas task. And
    with codecs=False, even a VALID container is treated as opaque bytes
    (the contract for sources whose payloads are known to be raw text)."""
    ppm, pixels = _make_ppm(4, 4)
    text_p6 = b"P6 is the magic number of binary PPM files."
    text_riff = b"RIFF....WAVE but nothing else follows"
    media = spark.createDataFrame(
        [(1, "image", bytearray(text_p6)), (2, "audio", bytearray(text_riff)),
         (3, "image", bytearray(ppm))],
        "media_id bigint, kind string, payload binary",
    )
    rows = {r.media_id: r for r in decode_media(media).collect()}
    assert rows[1].content_md5 == hashlib.md5(text_p6).hexdigest()
    assert rows[2].content_md5 == hashlib.md5(text_riff).hexdigest()
    assert rows[3].content_md5 == hashlib.md5(pixels).hexdigest()
    # codecs off: the valid PPM row digests its BYTES, not its pixels
    raw = {r.media_id: r for r in decode_media(media, codecs=False).collect()}
    assert raw[3].content_md5 == hashlib.md5(ppm).hexdigest()
    assert all(r.decoded_ok for r in rows.values())


def test_codec_parsers_reject_garbage_without_crashing():
    """Hostile-input behavior at the codec boundary: random/truncated
    payloads must raise (ValueError for recognized-but-broken containers,
    NotImplementedError for unrecognized magic) — never IndexError,
    struct.error, or a silent wrong decode."""
    import random

    rng = random.Random(7)
    ppm, _ = _make_ppm(3, 3)
    wav, _ = _make_wav(6)
    for payload in (ppm, wav):
        # every truncation point of a valid container
        for cut in range(len(payload)):
            try:
                d = _decode_payload("x", payload[:cut])
                # a shorter prefix that still parses must be internally
                # consistent, never a silent half-decode of the original
                assert d["decoded_ok"] and d["n_bytes"] == cut
            except (ValueError, NotImplementedError):
                pass
    # random byte soup (seeded): unrecognized → NotImplementedError;
    # soup behind valid magic → ValueError
    for _ in range(200):
        soup = bytes(rng.randrange(256) for _ in range(rng.randrange(0, 64)))
        for prefix in (b"", b"P6", b"RIFF" + soup[:4].ljust(4) + b"WAVE"):
            try:
                _decode_payload("x", prefix + soup)
            except (ValueError, NotImplementedError):
                pass


def test_codec_parser_bounds():
    """Header edge values parse exactly: 1x1 image, 0-sample WAV."""
    tiny, pix = _make_ppm(1, 1)
    d = _decode_payload("image", tiny)
    assert (d["width"], d["height"], d["n_pixels"]) == (1, 1, 1)
    assert len(pix) == 3
    empty, data = _make_wav(0)
    d = _decode_payload("audio", empty)
    assert d["n_samples"] == 0 and data == b""
