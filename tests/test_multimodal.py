"""Multimodal plumbing: binary payload columns, Arrow-batched decode
stubs, frame sampling. The decode is a deterministic fake (no codecs in
the container) — these tests pin the Spark-side contract: schemas,
batch flow, and the stub math itself."""

from __future__ import annotations

import numpy as np
import pytest

from graphdb_wikidata_spark.operators.multimodal import (
    _decode_payload,
    byte_histogram_features,
    decode_media,
    media_table,
    sample_frames,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def media(spark):
    return media_table(spark, SF).cache()


def test_media_table_schema(media):
    assert dict(media.dtypes)["payload"] == "binary"
    meta_t = dict(media.dtypes)["meta"]
    assert "width" in meta_t and "n_frames" in meta_t
    assert media.count() > 0
    kinds = {r["kind"] for r in media.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}


def test_decode_stub_math():
    # text payloads are never decodable media, so this pins the
    # deterministic fallback regardless of codec availability
    px = _decode_payload(b"\x00\x01\x02\x03", width=2, height=3)
    assert px.shape == (3, 2)
    # np.resize tiles: [0,1,2,3,0,1] -> mean 7/6
    assert abs(px.mean() - 7 / 6) < 1e-9


def test_decode_real_codec_when_available():
    """Exercise whichever decode branch this environment provides: with
    PIL importable a real PNG roundtrips through the codec path; without
    it the same bytes deterministically fall back to the byte-tiling
    stub (shape contract identical either way)."""
    try:
        import io

        import PIL.Image

        buf = io.BytesIO()
        src = PIL.Image.new("L", (4, 2), color=200)
        src.save(buf, format="PNG")
        px = _decode_payload(buf.getvalue(), width=4, height=2)
        assert px.shape == (2, 4)
        assert int(px.mean()) == 200  # real decode, not byte tiling
    except ImportError:
        px = _decode_payload(b"PNG-not-really" * 3, width=4, height=2)
        assert px.shape == (2, 4)
        assert px.dtype == np.uint8


def test_decode_media(media):
    out = decode_media(media)
    rows = out.collect()
    assert len(rows) == media.count()
    for r in rows[:20]:
        assert r["n_bytes"] > 0
        assert 0.0 <= r["mean_intensity"] <= 255.0


def test_byte_histogram_features(media):
    out = byte_histogram_features(media).collect()
    for r in out[:20]:
        f = np.array(r["feature"])
        assert f.shape == (8,)
        assert abs(f.sum() - 1.0) < 1e-5


def test_sample_frames(media):
    out = sample_frames(media, step=4)
    pdf = out.toPandas()
    # only video rows, every 4th index, within n_frames
    meta = {r["media_id"]: r["meta"] for r in media.filter("kind='video'").collect()}
    assert set(pdf["media_id"]) == set(meta)
    for mid, grp in pdf.groupby("media_id"):
        n = meta[mid]["n_frames"]
        assert sorted(grp["frame_idx"]) == list(range(0, n, 4))


# ---- round 4: real-codec branch contract (VERDICT r03 #7) ----------------


def _tiny_png(width: int, height: int, value: int = 128) -> bytes:
    """A minimal valid grayscale PNG, written with stdlib zlib/struct
    only — no imaging library needed to WRITE one, which is exactly
    what lets this test pin the real-decode branch contract even in
    containers without PIL."""
    import struct
    import zlib

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)  # 8-bit gray
    raw = b"".join(b"\x00" + bytes([value]) * width for _ in range(height))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _pil_available() -> bool:
    try:
        import PIL.Image  # noqa: F401

        return True
    except ImportError:
        return False


def test_decode_payload_stub_branch_shape_and_determinism():
    from graphdb_wikidata_spark.operators.multimodal import _decode_payload

    a = _decode_payload(b"hello world", 8, 4)
    b = _decode_payload(b"hello world", 8, 4)
    assert a.shape == (4, 8) and a.dtype == np.uint8
    assert (a == b).all()  # stub is deterministic
    assert a.flat[0] == ord("h")  # tiled payload bytes, not zeros


@pytest.mark.skipif(not _pil_available(), reason="PIL not installed")
def test_decode_payload_real_codec_branch():
    # a real PNG must take the decode branch: every pixel equals the
    # constant gray value, which the byte-tiling stub could never
    # produce from compressed PNG bytes
    from graphdb_wikidata_spark.operators.multimodal import _decode_payload

    png = _tiny_png(6, 3, value=77)
    out = _decode_payload(png, 6, 3)
    assert out.shape == (3, 6)
    assert (out == 77).all()


def test_decode_payload_invalid_bytes_fall_back():
    # PIL present or not, non-image bytes must land on the stub
    from graphdb_wikidata_spark.operators.multimodal import _decode_payload

    out = _decode_payload(b"\x89PNG but actually garbage", 5, 2)
    assert out.shape == (2, 5)
    assert out.flat[0] == 0x89
