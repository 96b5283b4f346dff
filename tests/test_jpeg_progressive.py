"""Progressive JPEG (SOF2): the decode contract is bit-equality with
the baseline path — a progression is a lossless re-ordering of the
same quantized coefficients, so decode(progressive(px)) must equal
decode(baseline(px)) pixel-for-pixel. That single assertion exercises
all four scan kinds (DC/AC first + refine), EOB-run coding across
blocks, ZRLs inside refinement, and the successive-approximation
reconstruction arithmetic.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from history_collector_spark.functions.jpeg import (
    JpegDecodeError,
    decode_jpeg,
    encode_jpeg,
)
from history_collector_spark.functions.jpeg_progressive import (
    decode_progressive,
    encode_jpeg_progressive,
)


@pytest.mark.parametrize("shape", [(8, 8), (16, 16), (8, 16), (24, 40),
                                   (17, 23), (9, 9)])
def test_progressive_equals_baseline_rgb(shape):
    rng = np.random.default_rng(sum(shape))
    px = rng.integers(0, 256, size=shape + (3,)).astype(np.uint8)
    base = decode_jpeg(encode_jpeg(px))
    prog = decode_progressive(encode_jpeg_progressive(px))
    assert np.array_equal(base, prog), shape


@pytest.mark.parametrize("shape", [(8, 8), (16, 24), (17, 23)])
def test_progressive_equals_baseline_gray(shape):
    rng = np.random.default_rng(99 + sum(shape))
    px = rng.integers(0, 256, size=shape).astype(np.uint8)
    base = decode_jpeg(encode_jpeg(px))
    prog = decode_progressive(encode_jpeg_progressive(px))
    assert np.array_equal(base, prog), shape


def test_progressive_eob_runs_and_zrl_paths():
    """Mostly-flat image with isolated spikes: long cross-block EOB
    runs in the AC-first scans and ZRL + correction-bit interleaving
    in the refinement scan."""
    px = np.full((64, 64), 128, dtype=np.uint8)
    px[0, 0] = 255  # one spiky block among 63 empty ones
    px[63, 63] = 0
    px[32, 5] = 200
    base = decode_jpeg(encode_jpeg(px))
    prog = decode_progressive(encode_jpeg_progressive(px))
    assert np.array_equal(base, prog)
    # smooth gradient: dense low-frequency coefficients, sparse high
    yy, xx = np.meshgrid(np.arange(48), np.arange(40), indexing="ij")
    g = ((yy * 2 + xx * 3) % 256).astype(np.uint8)
    assert np.array_equal(
        decode_jpeg(encode_jpeg(g)),
        decode_progressive(encode_jpeg_progressive(g)),
    )


def test_sof2_dispatches_through_decode_jpeg():
    px = np.random.default_rng(1).integers(
        0, 256, size=(16, 16, 3)
    ).astype(np.uint8)
    blob = encode_jpeg_progressive(px)
    assert decode_jpeg(blob).shape == (16, 16, 3)
    assert np.array_equal(decode_jpeg(blob), decode_progressive(blob))


def test_progressive_through_decode_image_and_kernel():
    from history_collector_spark.queries.multimodal import decode_blob

    px = np.full((8, 8), 130, dtype=np.uint8)
    meta = decode_blob(encode_jpeg_progressive(px))
    assert meta == {
        "width": 8, "height": 8, "n_frames": 1, "decode_status": "ok"
    }


def test_progressive_malformed_inputs():
    px = np.full((8, 8), 100, dtype=np.uint8)
    blob = encode_jpeg_progressive(px)
    # truncation anywhere inside the scan data is a decode error
    with pytest.raises(JpegDecodeError):
        decode_progressive(blob[: len(blob) // 2])
    with pytest.raises(JpegDecodeError, match="SOI"):
        decode_progressive(b"\x00\x01")
    # AC scan before any SOF2 frame
    bad = (
        b"\xff\xd8\xff\xda\x00\x08\x01\x01\x00\x01\x3f\x00\xff\xd9"
    )
    with pytest.raises(JpegDecodeError, match="SOS before SOF2"):
        decode_progressive(bad)


def test_progressive_error_class_degrades_in_kernel(spark):
    """A corrupt SOF2 payload through the Arrow kernel must land in
    the error column (JpegDecodeError is an ImageDecodeError)."""
    from history_collector_spark.queries.multimodal import decode_images

    px = np.full((8, 8), 100, dtype=np.uint8)
    blob = encode_jpeg_progressive(px)
    blobs = spark.createDataFrame(
        [(1, bytearray(blob)), (2, bytearray(blob[: len(blob) // 2]))],
        "doc_id long, data binary",
    )
    meta = {r["doc_id"]: r.asDict() for r in decode_images(blobs).collect()}
    assert meta[1]["decode_status"] == "ok"
    assert meta[2]["decode_status"].startswith("error")
