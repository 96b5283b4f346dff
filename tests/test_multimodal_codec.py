"""Real image codec tests: hand-built BMP/PPM bytes decoded through the
same Arrow-batched mapInPandas kernels the oracle-verified
`multimodal_decode` query uses, pixel values asserted.

The BMP fixtures are built with raw struct.pack (NOT encode_bmp) so the
decoder is checked against the spec, not against its own inverse; the
encode_bmp roundtrip is a separate property.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from history_collector_spark.queries.multimodal import (
    ImageDecodeError,
    decode_blob,
    decode_bmp,
    decode_image_pixels,
    decode_images,
    decode_ppm,
    encode_bmp,
)


def _hand_bmp(pixels: list[list[tuple[int, int, int]]], top_down: bool = False) -> bytes:
    """Build BMP bytes by hand: 24-bit BI_RGB, rows padded to 4 bytes,
    BGR on disk, bottom-up unless top_down."""
    height, width = len(pixels), len(pixels[0])
    stride = (width * 3 + 3) // 4 * 4
    rows = pixels if top_down else pixels[::-1]
    body = b""
    for row in rows:
        line = b"".join(bytes((b, g, r)) for (r, g, b) in row)
        body += line + b"\x00" * (stride - len(line))
    header = struct.pack("<2sIHHI", b"BM", 54 + len(body), 0, 0, 54)
    dib = struct.pack(
        "<IiiHHIIiiII", 40, width, -height if top_down else height,
        1, 24, 0, len(body), 0, 0, 0, 0,
    )
    return header + dib + body


# 3x2 test image: distinct channel values per pixel so any row-order /
# channel-order mistake shows up.
PIXELS = [
    [(255, 0, 0), (0, 255, 0), (0, 0, 255)],
    [(10, 20, 30), (40, 50, 60), (70, 80, 90)],
]


def test_decode_bmp_bottom_up_pixels():
    px = decode_bmp(_hand_bmp(PIXELS))
    assert px.shape == (2, 3, 3)
    assert px.tolist() == [[list(p) for p in row] for row in PIXELS]


def test_decode_bmp_top_down_pixels():
    px = decode_bmp(_hand_bmp(PIXELS, top_down=True))
    assert px.tolist() == [[list(p) for p in row] for row in PIXELS]


def test_decode_bmp_row_padding():
    # width=1 -> 3 bytes/row padded to 4; a padding bug shears the rows
    col = [[(1, 2, 3)], [(4, 5, 6)], [(7, 8, 9)]]
    px = decode_bmp(_hand_bmp(col))
    assert px.tolist() == [[[1, 2, 3]], [[4, 5, 6]], [[7, 8, 9]]]


def test_encode_bmp_roundtrip():
    arr = np.arange(5 * 7 * 3, dtype=np.uint8).reshape(5, 7, 3)
    assert np.array_equal(decode_bmp(encode_bmp(arr)), arr)


def test_decode_bmp_rejects_truncated_and_wrong_bpp():
    blob = _hand_bmp(PIXELS)
    with pytest.raises(ImageDecodeError):
        decode_bmp(blob[:-5])
    bad_bpp = bytearray(blob)
    struct.pack_into("<H", bad_bpp, 28, 8)
    with pytest.raises(ImageDecodeError):
        decode_bmp(bytes(bad_bpp))


def test_decode_ppm_p6_with_comment():
    body = bytes([v for row in PIXELS for p in row for v in p])
    blob = b"P6\n# a comment\n3 2\n255\n" + body
    assert decode_ppm(blob).tolist() == [[list(p) for p in row] for row in PIXELS]


def test_decode_ppm_p3_ascii():
    nums = " ".join(str(v) for row in PIXELS for p in row for v in p)
    blob = f"P3\n3 2\n255\n{nums}\n".encode()
    assert decode_ppm(blob).tolist() == [[list(p) for p in row] for row in PIXELS]


def test_decode_blob_real_mode_metadata():
    meta = decode_blob(_hand_bmp(PIXELS))
    assert meta == {
        "width": 3, "height": 2, "n_frames": 1, "decode_status": "ok"
    }
    with pytest.raises(NotImplementedError):
        decode_blob(b"\x89PNG\r\n\x1a\nrest")  # no PNG codec: plug point


def test_real_decode_through_mapinpandas_kernel(spark):
    """The verdict's done-bar: a real hand-built BMP decoded through the
    SAME distributed kernel as the registered query, pixels asserted."""
    bmp = _hand_bmp(PIXELS)
    ppm = b"P6\n3 2\n255\n" + bytes(
        v for row in PIXELS for p in row for v in p
    )
    blobs = spark.createDataFrame(
        [(1, bytearray(bmp)), (2, bytearray(ppm)), (3, bytearray(b"notimg"))],
        "doc_id long, data binary",
    ).repartition(2)

    meta = {r["doc_id"]: r.asDict() for r in decode_images(blobs).collect()}
    assert meta[1]["width"] == 3 and meta[1]["height"] == 2
    assert meta[1]["decode_status"] == "ok"
    assert meta[2]["width"] == 3 and meta[2]["decode_status"] == "ok"
    assert meta[3]["decode_status"].startswith("error")
    assert meta[3]["width"] is None

    px = decode_image_pixels(blobs)
    got = {
        (r["doc_id"], r["y"], r["x"]): (r["r"], r["g"], r["b"])
        for r in px.collect()
    }
    assert len(got) == 12  # 2 images x 6 pixels; undecodable contributes 0
    for doc in (1, 2):
        for y, row in enumerate(PIXELS):
            for x, p in enumerate(row):
                assert got[(doc, y, x)] == p
