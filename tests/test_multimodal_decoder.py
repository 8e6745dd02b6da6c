"""Real-decoder drop-in proof for the multimodal registry (round-8
verdict task 7): the docstrings claim a production codec slots into
``register_decoder()`` without any relational-shape change.  Two tests
make that claim executable:

- a PIL-backed PNG decode (skip-marked when PIL is absent, as in this
  container) — the auto-probe path;
- a genuine pure-python BMP decoder (real format: 54-byte header parse,
  bottom-up padded BGR rows -> top-down raw RGB) registered through the
  production hook — green everywhere, proving the registry snapshot
  serializes into the mapInPandas closure and the downstream schema,
  partitioning, and feature math are untouched by WHAT decoded the
  bytes.
"""

from __future__ import annotations

import struct

import pytest
from pyspark.sql import functions as F


def _bmp_bytes(width: int, height: int, rgb_rows: list[list[tuple]]) -> bytes:
    """Encode a real uncompressed 24-bit BMP (top-down input rows)."""
    row_pad = (-(width * 3)) % 4
    body = b""
    for row in reversed(rgb_rows):  # BMP stores rows bottom-up
        for r, g, b in row:
            body += bytes([b, g, r])  # and pixels as BGR
        body += b"\x00" * row_pad
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(body),
        2835, 2835, 0, 0,
    )
    header = struct.pack("<2sIHHI", b"BM", 54 + len(body), 0, 0, 54)
    return header + info + body


def _make_bmp_decoder():
    """Real BMP decoder: parse the header, un-pad, flip to top-down RGB.

    Built inside a factory so cloudpickle serializes it BY VALUE into
    the mapInPandas closure — executors cannot import the test module.
    """
    import struct as _struct

    def _bmp_decode(payload: bytes) -> bytes:
        if payload[:2] != b"BM":
            raise ValueError("not a BMP payload")
        (offset,) = _struct.unpack_from("<I", payload, 10)
        size, width, height, planes, bitcount = _struct.unpack_from(
            "<IiiHH", payload, 14
        )
        if bitcount != 24:
            raise ValueError("only 24-bit BMP supported")
        stride = width * 3 + ((-(width * 3)) % 4)
        rows = []
        for y in range(height):
            start = offset + y * stride
            row = payload[start: start + width * 3]
            rgb = b"".join(
                bytes([row[i + 2], row[i + 1], row[i]])
                for i in range(0, width * 3, 3)
            )
            rows.append(rgb)
        return b"".join(reversed(rows))  # bottom-up -> top-down

    return _bmp_decode


def _media_df(spark, payload: bytes, modality: str, mime: str):
    return spark.createDataFrame(
        [(1, bytearray(payload), (modality, mime, len(payload), "web"))],
        "doc_id long, media binary,"
        " meta struct<modality:string,mime:string,n_bytes:long,"
        "source:string>",
    )


def test_real_bmp_decoder_drops_in(spark):
    from litebase_spark.operators import multimodal as mm

    rgb = [
        [(255, 0, 0), (0, 255, 0), (0, 0, 255)],
        [(10, 20, 30), (40, 50, 60), (70, 80, 90)],
    ]
    payload = _bmp_bytes(3, 2, rgb)
    _bmp_decode = _make_bmp_decoder()
    raw = _bmp_decode(payload)
    assert raw == bytes(
        [255, 0, 0, 0, 255, 0, 0, 0, 255, 10, 20, 30, 40, 50, 60, 70, 80, 90]
    )

    saved = dict(mm._DECODERS)
    try:
        mm.register_decoder("image", _bmp_decode)
        feats = mm.extract_features(
            _media_df(spark, payload, "image", "image/bmp")
        ).collect()
        assert len(feats) == 1
        r = feats[0]
        # identical relational shape to the stub-decoder path
        assert set(r.asDict()) == {
            "doc_id", "modality", "n_bytes", "feat_mean",
            "feat_entropy_proxy",
        }
        # and the features are computed over the DECODED pixels
        assert r["feat_mean"] == pytest.approx(sum(raw) / len(raw))
        assert r["feat_entropy_proxy"] == len(set(raw)) / 256.0
        assert r["n_bytes"] == len(payload)  # metadata still encoded size
    finally:
        mm._DECODERS.clear()
        mm._DECODERS.update(saved)


def test_undecodable_modality_still_fails_loudly(spark):
    from litebase_spark.operators import multimodal as mm

    df = _media_df(spark, b"\x00\x01", "video", "video/mp4")
    with pytest.raises(Exception) as ei:
        mm.extract_features(df).collect()
    assert "register_decoder" in str(ei.value)


def test_pil_decoder_drops_in(spark):
    PIL = pytest.importorskip("PIL")  # noqa: F841  (absent here: skips)
    import io

    from PIL import Image

    from litebase_spark.operators import multimodal as mm

    img = Image.new("RGB", (4, 3), (200, 100, 50))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    payload = buf.getvalue()
    feats = mm.extract_features(
        _media_df(spark, payload, "image", "image/png")
    ).collect()
    raw = img.convert("RGB").tobytes()
    assert feats[0]["feat_mean"] == pytest.approx(sum(raw) / len(raw))
