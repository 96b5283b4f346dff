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
    decode_image,
    decode_image_pixels,
    decode_images,
    decode_png,
    decode_ppm,
    encode_bmp,
    encode_png,
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
    # JPEG now has a real baseline codec behind the dispatcher: a
    # well-formed payload decodes, a truncated one fails as a decode
    # error (not NotImplementedError, not a raw struct.error)
    from history_collector_spark.functions.jpeg import (
        JpegDecodeError,
        encode_jpeg,
    )

    jm = decode_blob(encode_jpeg(np.full((8, 16), 130, dtype=np.uint8)))
    assert jm == {
        "width": 16, "height": 8, "n_frames": 1, "decode_status": "ok"
    }
    with pytest.raises(JpegDecodeError):
        decode_blob(b"\xff\xd8\xff\xe0JFIF")  # truncated JPEG
    # WebP is plugged since round 10 (VP8L lossless): a lossless
    # payload decodes for real, the lossy VP8 half stays a plug point,
    # and a RIFF-framed payload with garbage lengths is a decode error
    from history_collector_spark.functions.webp import encode_webp_vp8l

    wm = decode_blob(encode_webp_vp8l(np.full((2, 3, 3), 9, np.uint8)))
    assert wm == {
        "width": 3, "height": 2, "n_frames": 1, "decode_status": "ok"
    }
    # lossy VP8 decodes to real pixels since round 12 (the from-
    # scratch RFC 6386 key-frame decoder); a VP8 body without the
    # keyframe start code is a decode ERROR, not a plug point (it is
    # malformed, not merely unsupported)
    from history_collector_spark.queries.multimodal import _vp8_lossy_blob

    lm = decode_blob(_vp8_lossy_blob(7, 4))
    assert lm == {
        "width": 7, "height": 4, "n_frames": 1,
        "decode_status": "ok",
    }
    with pytest.raises(ImageDecodeError):
        decode_blob(
            b"RIFF\x1c\x00\x00\x00WEBPVP8 "
            + (16).to_bytes(4, "little") + bytes(16)
        )  # garbage VP8 body: no keyframe start code
    with pytest.raises(ImageDecodeError):
        decode_blob(b"RIFF....WEBP")  # corrupt RIFF framing
    with pytest.raises(NotImplementedError):
        decode_blob(b"II*\x00tiff?")  # still-unplugged format (TIFF)


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


def test_malformed_jpeg_degrades_gracefully_in_kernel(spark):
    """Regression (round-9 ADVICE): JpegDecodeError must be an
    ImageDecodeError subclass so the Arrow kernels' graceful-degradation
    except-tuple catches it — a corrupt JPEG blob yields an error row,
    it does NOT kill the Spark task."""
    from history_collector_spark.functions.codec_errors import (
        ImageDecodeError as SharedBase,
    )
    from history_collector_spark.functions.jpeg import (
        JpegDecodeError,
        encode_jpeg,
    )

    assert issubclass(JpegDecodeError, SharedBase)
    assert issubclass(JpegDecodeError, ImageDecodeError)

    good = encode_jpeg(np.full((8, 8), 90, dtype=np.uint8))
    blobs = spark.createDataFrame(
        [
            (1, bytearray(good)),
            (2, bytearray(b"\xff\xd8\xff\xe0JFIF")),  # truncated JPEG
            (3, bytearray(good[: len(good) // 2])),  # cut mid-stream
            # short declared SOF0 seglen (3): raw struct.error class
            (4, bytearray(b"\xff\xd8\xff\xc0\x00\x03\x08\xff\xd9")),
        ],
        "doc_id long, data binary",
    ).repartition(2)
    meta = {r["doc_id"]: r.asDict() for r in decode_images(blobs).collect()}
    assert meta[1]["decode_status"] == "ok"
    for doc in (2, 3, 4):
        assert meta[doc]["decode_status"].startswith("error"), meta[doc]
        assert meta[doc]["width"] is None


def test_jpeg_malformed_segments_raise_decode_error():
    """Short declared segment lengths and stray restart markers must
    surface as JpegDecodeError, never raw struct.error/IndexError."""
    from history_collector_spark.functions.jpeg import (
        JpegDecodeError,
        decode_jpeg,
        encode_jpeg,
    )

    # SOF0 with seglen=3 (no component bytes)
    with pytest.raises(JpegDecodeError, match="SOF0"):
        decode_jpeg(b"\xff\xd8\xff\xc0\x00\x03\x08\xff\xd9")
    # DRI with empty body
    with pytest.raises(JpegDecodeError, match="DRI"):
        decode_jpeg(b"\xff\xd8\xff\xdd\x00\x02\xff\xd9")
    # SOS declaring 3 scans but carrying bytes for none
    good = encode_jpeg(np.full((8, 8), 10, dtype=np.uint8))
    sos_at = good.find(b"\xff\xda")
    assert sos_at > 0
    bad = good[: sos_at + 2] + b"\x00\x03\x03" + good[sos_at + 4 :]
    with pytest.raises(JpegDecodeError):
        decode_jpeg(bad)
    # stray RSTn mid-entropy-data: JpegDecodeError, not a bare escape
    ent_at = sos_at + 2 + int.from_bytes(good[sos_at + 2 : sos_at + 4], "big")
    bad2 = good[:ent_at] + b"\xff\xd3" + good[ent_at:]
    with pytest.raises(JpegDecodeError, match="restart"):
        decode_jpeg(bad2)


# ---------------------------------------------------------------------------
# PNG: hand-built bytes (struct + zlib directly, NOT encode_png) decoded
# against the spec; the encoder roundtrip is a separate property.
# ---------------------------------------------------------------------------


def _png_chunk(ctype: bytes, body: bytes) -> bytes:
    import zlib

    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def _hand_png(scanlines: list[tuple[int, bytes]], width: int, height: int,
              color_type: int = 2) -> bytes:
    """Build PNG bytes by hand: each scanline is (filter_type,
    already-FILTERED bytes), concatenated and deflated into one IDAT."""
    import zlib

    raw = b"".join(bytes([ft]) + line for ft, line in scanlines)
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )


def test_decode_png_none_and_sub_filters():
    # 2x2 RGB. Row 0 unfiltered; row 1 Sub-filtered: stored = raw - left.
    row0 = bytes([10, 20, 30, 40, 50, 60])
    raw1 = [7, 8, 9, 17, 28, 39]
    filt1 = bytes([7, 8, 9, (17 - 7) % 256, (28 - 8) % 256, (39 - 9) % 256])
    px = decode_png(_hand_png([(0, row0), (1, filt1)], 2, 2))
    assert px.shape == (2, 2, 3)
    assert px[0].ravel().tolist() == list(row0)
    assert px[1].ravel().tolist() == raw1


def test_decode_png_up_average_paeth_filters():
    # 3 rows x 1 RGB pixel exercising Up, Average, Paeth reconstruction.
    row0 = bytes([100, 150, 200])
    raw1 = [105, 149, 250]
    filt_up = bytes([(105 - 100) % 256, (149 - 150) % 256, (250 - 200) % 256])
    # Average with no left pixel: pred = prev // 2
    raw2 = [60, 80, 130]
    filt_avg = bytes([(60 - 105 // 2) % 256, (80 - 149 // 2) % 256,
                      (130 - 250 // 2) % 256])
    # Paeth with no left: a=0, c=0 -> p=b, pred=b (prev row)
    raw3 = [61, 70, 140]
    filt_paeth = bytes([(61 - 60) % 256, (70 - 80) % 256, (140 - 130) % 256])
    px = decode_png(
        _hand_png([(0, row0), (2, filt_up), (3, filt_avg), (4, filt_paeth)], 1, 4)
    )
    assert px[1, 0].tolist() == raw1
    assert px[2, 0].tolist() == raw2
    assert px[3, 0].tolist() == raw3


def test_decode_png_multiple_idat_chunks():
    import zlib

    row = bytes([1, 2, 3, 4, 5, 6])
    raw = bytes([0]) + row
    z = zlib.compress(raw)
    mid = len(z) // 2
    ihdr = struct.pack(">IIBBBBB", 2, 1, 8, 2, 0, 0, 0)
    blob = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", z[:mid])
        + _png_chunk(b"IDAT", z[mid:])
        + _png_chunk(b"IEND", b"")
    )
    assert decode_png(blob)[0].ravel().tolist() == list(row)


def test_encode_png_roundtrip_all_filters_and_channels():
    rng = np.random.default_rng(7)
    for ch in (1, 2, 3, 4):
        px = rng.integers(0, 256, (9, 5, ch), dtype=np.uint8)
        filters = [y % 5 for y in range(9)]
        back = decode_png(encode_png(px, row_filters=filters))
        assert np.array_equal(back, px), f"channels={ch}"


def test_decode_image_channel_normalization():
    rng = np.random.default_rng(8)
    gray = rng.integers(0, 256, (3, 4, 1), dtype=np.uint8)
    out = decode_image(encode_png(gray))
    assert out.shape == (3, 4, 3)
    assert np.array_equal(out[:, :, 0], gray[:, :, 0])
    rgba = rng.integers(0, 256, (3, 4, 4), dtype=np.uint8)
    assert np.array_equal(decode_image(encode_png(rgba)), rgba[:, :, :3])


def test_decode_png_error_paths():
    with pytest.raises(ImageDecodeError):
        decode_png(b"\x89PNG\r\n\x1a\x00bad-signature")
    # CRC corruption
    blob = bytearray(encode_png(np.zeros((2, 2, 3), dtype=np.uint8)))
    blob[-5] ^= 0xFF
    with pytest.raises(ImageDecodeError, match="CRC"):
        decode_png(bytes(blob))
    # 16-bit truecolor decodes via high-byte downconversion (round 9);
    # hand-built: 2x1 RGB, big-endian samples, filter-0 rows. Second
    # row uses the Up filter to pin bpp=6 byte-distance filtering.
    import zlib as _zz

    ihdr16 = struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0)
    row0 = b"\x00" + struct.pack(
        ">6H", 0xFF00, 0x0180, 0x8040, 0x1234, 0xABCD, 0x0001
    )
    # Up filter: raw deltas so reconstructed = row0 + delta (mod 256
    # per byte); use zero deltas -> row1 == row0
    row1 = b"\x02" + bytes(12)
    blob16 = (
        b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr16)
        + _png_chunk(b"IDAT", _zz.compress(row0 + row1))
        + _png_chunk(b"IEND", b"")
    )
    px16 = decode_png(blob16)
    assert px16.shape == (2, 2, 3)
    assert px16[0, 0].tolist() == [0xFF, 0x01, 0x80]
    assert px16[0, 1].tolist() == [0x12, 0xAB, 0x00]
    assert (px16[1] == px16[0]).all()
    # 12-bit (invalid) depth still rejected
    ihdr12 = struct.pack(">IIBBBBB", 1, 1, 12, 2, 0, 0, 0)
    blob12 = (
        b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr12)
        + _png_chunk(b"IEND", b"")
    )
    with pytest.raises(ImageDecodeError, match="depth"):
        decode_png(blob12)
    # unknown interlace method rejected (Adam7 itself decodes now)
    ihdr_i = struct.pack(">IIBBBBB", 1, 1, 8, 2, 0, 0, 2)
    blob_i = (
        b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr_i)
        + _png_chunk(b"IEND", b"")
    )
    with pytest.raises(ImageDecodeError, match="interlace"):
        decode_png(blob_i)
    # palette PNG without PLTE rejected
    import zlib as _z

    ihdr_p = struct.pack(">IIBBBBB", 1, 1, 8, 3, 0, 0, 0)
    blob_p = (
        b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr_p)
        + _png_chunk(b"IDAT", _z.compress(b"\x00\x00"))
        + _png_chunk(b"IEND", b"")
    )
    with pytest.raises(ImageDecodeError, match="PLTE"):
        decode_png(blob_p)
    # truncated pixel stream
    import zlib

    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)
    short = (
        b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(b"\x00\x01\x02"))
        + _png_chunk(b"IEND", b"")
    )
    with pytest.raises(ImageDecodeError, match="pixel stream"):
        decode_png(short)


def test_decode_png_palette_hand_built():
    """Color type 3 at depth 8, hand-built bytes (struct + zlib, not
    the encoder): indices map through PLTE; tRNS adds per-entry alpha
    (entries past the tRNS length are opaque)."""
    import zlib

    pal = b"\xff\x00\x00" + b"\x00\xff\x00" + b"\x00\x00\xff"  # R,G,B
    # 3x2, filter 0 rows: indices [[0,1,2],[2,1,0]]
    raw = b"\x00\x00\x01\x02" + b"\x00\x02\x01\x00"
    ihdr = struct.pack(">IIBBBBB", 3, 2, 8, 3, 0, 0, 0)
    blob = (
        b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"PLTE", pal)
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )
    px = decode_png(blob)
    assert px.shape == (2, 3, 3)
    assert px[0, 0].tolist() == [255, 0, 0]
    assert px[0, 1].tolist() == [0, 255, 0]
    assert px[0, 2].tolist() == [0, 0, 255]
    assert px[1, 0].tolist() == [0, 0, 255]
    # + tRNS: entry 0 transparent, 1 half, 2 defaults opaque
    blob_a = (
        b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"PLTE", pal)
        + _png_chunk(b"tRNS", b"\x00\x80")
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )
    pxa = decode_png(blob_a)
    assert pxa.shape == (2, 3, 4)
    assert pxa[0, :, 3].tolist() == [0, 128, 255]
    # out-of-range palette index is a decode error
    raw_bad = b"\x00\x00\x01\x07" + b"\x00\x02\x01\x00"
    blob_bad = (
        b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"PLTE", pal)
        + _png_chunk(b"IDAT", zlib.compress(raw_bad))
        + _png_chunk(b"IEND", b"")
    )
    with pytest.raises(ImageDecodeError, match="palette index"):
        decode_png(blob_bad)


def test_decode_png_palette_subbyte_depths():
    """Depths 1/2/4: hand-checked bit packing for depth 4 and 1, plus
    encoder roundtrips for all three."""
    from history_collector_spark.queries.multimodal import (
        encode_png_palette,
    )
    import zlib

    # depth 4, 3x1: indices 1,2,3 pack as 0x12 0x30
    pal = np.array(
        [[0, 0, 0], [10, 10, 10], [20, 20, 20], [30, 30, 30]], np.uint8
    )
    ihdr = struct.pack(">IIBBBBB", 3, 1, 4, 3, 0, 0, 0)
    blob = (
        b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"PLTE", pal.tobytes())
        + _png_chunk(b"IDAT", zlib.compress(b"\x00\x12\x30"))
        + _png_chunk(b"IEND", b"")
    )
    px = decode_png(blob)
    assert px[:, :, 0].tolist() == [[10, 20, 30]]
    # depth 1, 10x1: bits 1010101010 -> 0xAA 0x80
    pal2 = np.array([[0, 0, 0], [255, 255, 255]], np.uint8)
    ihdr1 = struct.pack(">IIBBBBB", 10, 1, 1, 3, 0, 0, 0)
    blob1 = (
        b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr1)
        + _png_chunk(b"PLTE", pal2.tobytes())
        + _png_chunk(b"IDAT", zlib.compress(b"\x00\xaa\x80"))
        + _png_chunk(b"IEND", b"")
    )
    px1 = decode_png(blob1)
    assert px1[0, :, 0].tolist() == [255, 0] * 5
    # encoder roundtrips at every depth
    rng = np.random.default_rng(7)
    for depth, n in ((1, 2), (2, 4), (4, 16), (8, 5)):
        idx = rng.integers(0, n, size=(5, 7)).astype(np.uint8)
        pal = rng.integers(0, 256, size=(n, 3)).astype(np.uint8)
        got = decode_png(encode_png_palette(idx, pal, depth=depth))
        assert (got == pal[idx]).all(), depth


def test_decode_png_adam7_interlaced():
    """Adam7: encoder-built interlaced images must decode pixel-equal
    to their sequential twins, across sizes that exercise empty and
    partial passes, for truecolor, gray, and palette."""
    from history_collector_spark.queries.multimodal import (
        encode_png_adam7,
        encode_png_palette,
    )

    rng = np.random.default_rng(11)
    for h, w in ((1, 1), (2, 3), (5, 5), (8, 8), (9, 13), (16, 4)):
        px = rng.integers(0, 256, size=(h, w, 3)).astype(np.uint8)
        assert (decode_png(encode_png_adam7(px)) == px).all(), (h, w)
        gray = rng.integers(0, 256, size=(h, w)).astype(np.uint8)
        got = decode_png(encode_png_adam7(gray))
        assert (got[:, :, 0] == gray).all(), (h, w)
    # palette + Adam7 + sub-byte depth together
    idx = rng.integers(0, 4, size=(9, 9)).astype(np.uint8)
    pal = rng.integers(0, 256, size=(4, 3)).astype(np.uint8)
    blob = encode_png_palette(idx, pal, depth=2, interlace=1)
    assert (decode_png(blob) == pal[idx]).all()
    # and with tRNS alpha
    blob_a = encode_png_palette(
        idx, pal, trns=[0, 64, 128], depth=2, interlace=1
    )
    got = decode_png(blob_a)
    alut = np.array([0, 64, 128, 255], np.uint8)
    assert (got[:, :, 3] == alut[idx]).all()


def test_png_through_mapinpandas_kernel(spark):
    """Hand-built PNG decoded through the SAME distributed kernel as the
    registered queries, pixels asserted — the BMP test's PNG twin."""
    row0 = bytes([10, 20, 30, 40, 50, 60])
    blob = _hand_png([(0, row0), (0, row0)], 2, 2)
    blobs = spark.createDataFrame(
        [(1, bytearray(blob))], "doc_id long, data binary"
    )
    meta = decode_images(blobs).collect()[0].asDict()
    assert meta["width"] == 2 and meta["height"] == 2
    assert meta["decode_status"] == "ok"
    got = {
        (r["y"], r["x"]): (r["r"], r["g"], r["b"])
        for r in decode_image_pixels(blobs).collect()
    }
    assert got[(0, 0)] == (10, 20, 30) and got[(1, 1)] == (40, 50, 60)


def test_png_roundtrip_property():
    """Hypothesis-style randomized roundtrip: arbitrary dims, channel
    counts, and per-row filter choices survive encode -> decode
    bit-for-bit (seeded generator keeps it deterministic)."""
    rng = np.random.default_rng(0xC0DEC)
    for _ in range(40):
        h = int(rng.integers(1, 12))
        w = int(rng.integers(1, 12))
        ch = int(rng.choice([1, 2, 3, 4]))
        px = rng.integers(0, 256, (h, w, ch), dtype=np.uint8)
        filters = rng.integers(0, 5, h).tolist()
        from history_collector_spark.queries.multimodal import (
            decode_png,
            encode_png,
        )

        back = decode_png(encode_png(px, row_filters=filters))
        assert np.array_equal(back, px), (h, w, ch, filters)


# ---------------------------------------------------------------------------
# GIF: hand-packed LZW streams decoded against the spec (dictionary
# growth and the kwkwk special case), plus encoder roundtrips.
# ---------------------------------------------------------------------------


def _pack_codes(codes, width):
    acc = n = 0
    out = bytearray()
    for c in codes:
        acc |= c << n
        n += width
        while n >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            n -= 8
    if n:
        out.append(acc & 0xFF)
    return bytes(out)


def test_gif_lzw_literal_growth_and_kwkwk():
    from history_collector_spark.queries.multimodal import _gif_lzw_decode

    # min_code_size=2: CLEAR=4, END=5, first dynamic code=6
    assert bytes(_gif_lzw_decode(2, _pack_codes([4, 0, 1, 2, 5], 3))) == (
        b"\x00\x01\x02"
    )
    # dictionary growth: code 6 == b"\x00\x01" learned from the stream
    assert bytes(_gif_lzw_decode(2, _pack_codes([4, 0, 1, 6, 5], 3))) == (
        b"\x00\x01\x00\x01"
    )
    # kwkwk: code == next_code -> prev + prev[0]
    assert bytes(_gif_lzw_decode(2, _pack_codes([4, 1, 6, 5], 3))) == (
        b"\x01\x01\x01"
    )


def test_gif_roundtrip_plain_and_interlaced():
    from history_collector_spark.queries.multimodal import (
        decode_gif,
        encode_gif,
    )

    rng = np.random.default_rng(5)
    for interlaced in (False, True):
        pal = rng.integers(0, 256, (7, 3), dtype=np.uint8)
        px = pal[rng.integers(0, 7, (9, 5))]
        back = decode_gif(encode_gif(px, interlaced=interlaced))
        assert np.array_equal(back, px), interlaced


def test_gif_through_decode_image_and_errors():
    from history_collector_spark.queries.multimodal import (
        decode_gif,
        decode_image,
        encode_gif,
    )

    pal = np.array([[1, 2, 3], [4, 5, 6]], dtype=np.uint8)
    px = pal[np.zeros((2, 2), dtype=int)]
    assert decode_image(encode_gif(px)).shape == (2, 2, 3)
    with pytest.raises(ImageDecodeError):
        decode_gif(b"notgif")
    with pytest.raises(ImageDecodeError):
        decode_gif(b"GIF87a\x00\x00")  # truncated header
    # stream shorter than the raster must be detected: inflate the
    # image-descriptor height so the LZW stream can't fill the raster
    blob = bytearray(encode_gif(px))
    import struct

    desc = blob.index(0x2C)
    struct.pack_into("<H", blob, desc + 7, 200)
    with pytest.raises(ImageDecodeError, match="pixel stream"):
        decode_gif(bytes(blob))


def test_png_truncated_inside_crc_is_decode_error():
    """Round-7 audit: a payload cut INSIDE a chunk's trailing CRC must
    raise ImageDecodeError, not leak a raw struct.error."""
    px = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    blob = encode_png(px)
    for cut in (1, 2, 3):  # truncate 1..3 bytes into the final CRC
        with pytest.raises(ImageDecodeError, match="truncated PNG chunk"):
            decode_png(blob[:-cut])


def test_gif_partial_frame_composites_onto_logical_screen():
    """A first frame smaller than / offset within the logical screen
    must produce a SCREEN-sized canvas (background color under the
    frame), not silently report frame dims as image dims."""
    from history_collector_spark.queries.multimodal import (
        decode_gif,
        encode_gif,
    )

    pal = np.array([[9, 9, 9], [200, 10, 30]], dtype=np.uint8)
    idx = np.array([[1, 0], [0, 1], [1, 1]])
    px = pal[idx]  # 3 rows x 2 cols
    blob = bytearray(encode_gif(px))
    struct.pack_into("<HH", blob, 6, 4, 5)  # logical screen w=4, h=5
    desc = 13 + 3 * 4  # header + 4-entry global color table
    assert blob[desc] == 0x2C
    struct.pack_into("<HH", blob, desc + 1, 1, 2)  # frame at left=1, top=2
    out = decode_gif(bytes(blob))
    assert out.shape == (5, 4, 3)
    # frame pixels land at their offset...
    assert np.array_equal(out[2:5, 1:3], px)
    # ...and everything else is the background (global palette entry 0,
    # the lexicographically-smallest color after encode_gif's unique())
    bg = np.array([9, 9, 9], dtype=np.uint8)
    assert np.array_equal(out[0, 0], bg) and np.array_equal(out[4, 3], bg)
    # 14 canvas pixels outside the frame + the 2 idx==0 pixels inside
    assert int((out == bg).all(axis=2).sum()) == (5 * 4 - 3 * 2) + 2


def test_gif_frame_exceeding_logical_screen_is_rejected():
    from history_collector_spark.queries.multimodal import (
        decode_gif,
        encode_gif,
    )

    pal = np.array([[0, 0, 0], [255, 255, 255]], dtype=np.uint8)
    px = pal[np.ones((3, 2), dtype=int)]
    blob = bytearray(encode_gif(px))
    struct.pack_into("<HH", blob, 6, 1, 1)  # screen smaller than frame
    with pytest.raises(ImageDecodeError, match="exceeds"):
        decode_gif(bytes(blob))
