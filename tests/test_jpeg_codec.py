"""Baseline JPEG codec tests (functions/jpeg.py).

The decoder is checked three ways:
- closed-form: constant 8x8 blocks with even offsets survive the DC
  quantizer exactly, so encode->decode must be pixel-identical;
- hand-assembled entropy streams (built with the writer primitives but
  with COEFFICIENTS chosen in the test) decoded against an INDEPENDENT
  numpy IDCT reconstruction — exercises AC runs, ZRL, EOB, negative
  categories, 4:2:0 subsampling, and restart markers;
- error paths: wrong magic, progressive SOF2, truncated streams.
"""

from __future__ import annotations

import os
import struct
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from history_collector_spark.functions.jpeg import (
    AC_LUMA_BITS,
    AC_LUMA_VALS,
    DC_LUMA_BITS,
    DC_LUMA_VALS,
    QUANT_LUMA,
    ZIGZAG,
    JpegDecodeError,
    _BitWriter,
    _canonical_codes,
    _encode_block,
    decode_jpeg,
    encode_jpeg,
)


def _ref_idct(coeffs_natural: np.ndarray) -> np.ndarray:
    """Independent IDCT-II reconstruction (direct double sum, not the
    codec's matrix form)."""
    out = np.zeros((8, 8))
    for y in range(8):
        for x in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    cu = np.sqrt(0.125) if u == 0 else 0.5
                    cv = np.sqrt(0.125) if v == 0 else 0.5
                    s += (
                        cu * cv * coeffs_natural[u, v]
                        * np.cos((2 * y + 1) * u * np.pi / 16)
                        * np.cos((2 * x + 1) * v * np.pi / 16)
                    )
            out[y, x] = s
    return out


def _gray_jpeg_from_zigzag(zz_blocks, width, height, quant=None):
    """Assemble a grayscale baseline JPEG whose entropy data encodes
    the given zigzag coefficient vectors (one per block, row-major)."""
    q = QUANT_LUMA if quant is None else quant
    dc = _canonical_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac = _canonical_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    bw = _BitWriter()
    pred = 0
    for zz in zz_blocks:
        pred = _encode_block(bw, np.asarray(zz, np.int64), pred, dc, ac)
    bw.flush()

    def seg(marker, payload):
        return bytes([0xFF, marker]) + struct.pack(
            ">H", len(payload) + 2
        ) + payload

    zq = np.zeros(64, np.uint8)
    zq[np.arange(64)] = q[ZIGZAG].astype(np.uint8)
    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, bytes([0]) + zq.tobytes())
    out += seg(0xC0, struct.pack(">BHHB", 8, height, width, 1)
               + bytes([1, 0x11, 0]))
    out += seg(0xC4, bytes([0x00]) + bytes(DC_LUMA_BITS)
               + bytes(DC_LUMA_VALS))
    out += seg(0xC4, bytes([0x10]) + bytes(AC_LUMA_BITS)
               + bytes(AC_LUMA_VALS))
    out += seg(0xDA, bytes([1, 1, 0x00]) + b"\x00\x3f\x00")
    out += bw.out + b"\xff\xd9"
    return bytes(out)


def _expected_gray(zz_blocks, width, height, quant=None):
    q = (QUANT_LUMA if quant is None else quant).astype(np.int64)
    bx = (width + 7) // 8
    imgs = []
    for zz in zz_blocks:
        nat = np.zeros(64, np.int64)
        # zz is zigzag-ordered; the quant value for the i-th zigzag
        # element lives at natural position ZIGZAG[i]
        nat[ZIGZAG] = np.asarray(zz, np.int64) * q[ZIGZAG]
        px = _ref_idct(nat.reshape(8, 8)) + 128
        imgs.append(np.clip(np.round(px), 0, 255).astype(np.uint8))
    rows = [
        np.concatenate(imgs[r * bx : (r + 1) * bx], axis=1)
        for r in range((height + 7) // 8)
    ]
    return np.concatenate(rows, axis=0)[:height, :width]


def test_handbuilt_dc_only_block():
    zz = np.zeros(64, np.int64)
    zz[0] = 5  # DC category 3
    blob = _gray_jpeg_from_zigzag([zz], 8, 8)
    out = decode_jpeg(blob)
    exp = _expected_gray([zz], 8, 8)
    assert np.array_equal(out[:, :, 0], exp)
    assert np.array_equal(out[:, :, 0], out[:, :, 2])


def test_handbuilt_ac_runs_zrl_and_negatives():
    zz = np.zeros(64, np.int64)
    zz[0] = -37          # negative DC, category 6
    zz[1] = 12           # immediate AC
    zz[5] = -3           # run of 3 zeros then negative AC
    zz[25] = 7           # run of 19 zeros -> ZRL + (3, s)
    zz[63] = -1          # forces no-EOB path (last coeff nonzero)
    blob = _gray_jpeg_from_zigzag([zz], 8, 8)
    out = decode_jpeg(blob)
    exp = _expected_gray([zz], 8, 8)
    assert np.array_equal(out[:, :, 0], exp)


def test_handbuilt_multi_block_dc_prediction():
    blocks = []
    for dcv in (10, 10, -20, 0):  # diffs 10, 0, -30, 20
        zz = np.zeros(64, np.int64)
        zz[0] = dcv
        zz[2] = dcv % 5
        blocks.append(zz)
    blob = _gray_jpeg_from_zigzag(blocks, 32, 8)
    out = decode_jpeg(blob)
    exp = _expected_gray(blocks, 32, 8)
    assert np.array_equal(out[:, :, 0], exp)


def test_handbuilt_color_420_subsampling():
    """One 16x16 MCU in 4:2:0: four constant Y blocks + constant
    Cb/Cr; expected RGB derived independently from the YCbCr formulas
    with 2x2 chroma upsampling."""
    from history_collector_spark.functions.jpeg import (
        AC_CHROMA_BITS, AC_CHROMA_VALS, DC_CHROMA_BITS, DC_CHROMA_VALS,
        QUANT_CHROMA,
    )

    ydc = [4, -4, 8, 0]  # one per Y block (2x2 layout)
    cbdc, crdc = 3, -2
    dc_l = _canonical_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_l = _canonical_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    dc_c = _canonical_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ac_c = _canonical_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)
    bw = _BitWriter()
    pred = 0
    for v in ydc:  # interleaved MCU: Y blocks first (2x2), then Cb, Cr
        zz = np.zeros(64, np.int64)
        zz[0] = v
        pred = _encode_block(bw, zz, pred, dc_l, ac_l)
    for v, predc in ((cbdc, 0), (crdc, 0)):
        zz = np.zeros(64, np.int64)
        zz[0] = v
        _encode_block(bw, zz, predc, dc_c, ac_c)
    bw.flush()

    def seg(marker, payload):
        return bytes([0xFF, marker]) + struct.pack(
            ">H", len(payload) + 2
        ) + payload

    out = bytearray(b"\xff\xd8")
    for i, q in enumerate((QUANT_LUMA, QUANT_CHROMA)):
        zq = np.zeros(64, np.uint8)
        zq[np.arange(64)] = q[ZIGZAG].astype(np.uint8)
        out += seg(0xDB, bytes([i]) + zq.tobytes())
    sof = struct.pack(">BHHB", 8, 16, 16, 3)
    sof += bytes([1, 0x22, 0]) + bytes([2, 0x11, 1]) + bytes([3, 0x11, 1])
    out += seg(0xC0, sof)
    for tid, bits, vals in (
        (0x00, DC_LUMA_BITS, DC_LUMA_VALS),
        (0x10, AC_LUMA_BITS, AC_LUMA_VALS),
        (0x01, DC_CHROMA_BITS, DC_CHROMA_VALS),
        (0x11, AC_CHROMA_BITS, AC_CHROMA_VALS),
    ):
        out += seg(0xC4, bytes([tid]) + bytes(bits) + bytes(vals))
    out += seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11]) + b"\x00\x3f\x00")
    out += bw.out + b"\xff\xd9"

    img = decode_jpeg(bytes(out))
    assert img.shape == (16, 16, 3)
    # independent expectation: constant blocks -> DC-only IDCT is
    # (dc * q00) / 8 uniformly
    yplane = np.zeros((16, 16))
    for bi, v in enumerate(ydc):
        r, c = divmod(bi, 2)
        yplane[r * 8 : r * 8 + 8, c * 8 : c * 8 + 8] = (
            v * QUANT_LUMA[0] / 8.0
        )
    cb = cbdc * 17 / 8.0  # QUANT_CHROMA[0] = 17
    cr = crdc * 17 / 8.0
    y = yplane + 128
    expected = np.stack(
        [y + 1.402 * cr,
         y - 0.344136 * cb - 0.714136 * cr,
         y + 1.772 * cb],
        axis=2,
    )
    expected = np.clip(np.round(expected), 0, 255).astype(np.uint8)
    assert np.array_equal(img, expected)


def test_restart_markers():
    """DRI=1 with an RST marker between the two MCUs; DC prediction
    must reset across the restart."""
    dc = _canonical_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac = _canonical_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    zz1 = np.zeros(64, np.int64)
    zz1[0] = 9
    zz2 = np.zeros(64, np.int64)
    zz2[0] = 9  # same ABSOLUTE dc; encoded diff must be 9 again (reset)
    b1, b2 = _BitWriter(), _BitWriter()
    _encode_block(b1, zz1, 0, dc, ac)
    _encode_block(b2, zz2, 0, dc, ac)  # pred reset to 0
    b1.flush()
    b2.flush()

    def seg(marker, payload):
        return bytes([0xFF, marker]) + struct.pack(
            ">H", len(payload) + 2
        ) + payload

    zq = np.zeros(64, np.uint8)
    zq[np.arange(64)] = QUANT_LUMA[ZIGZAG].astype(np.uint8)
    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, bytes([0]) + zq.tobytes())
    out += seg(0xDD, struct.pack(">H", 1))  # DRI = 1 MCU
    out += seg(0xC0, struct.pack(">BHHB", 8, 8, 16, 1) + bytes([1, 0x11, 0]))
    out += seg(0xC4, bytes([0x00]) + bytes(DC_LUMA_BITS) + bytes(DC_LUMA_VALS))
    out += seg(0xC4, bytes([0x10]) + bytes(AC_LUMA_BITS) + bytes(AC_LUMA_VALS))
    out += seg(0xDA, bytes([1, 1, 0x00]) + b"\x00\x3f\x00")
    out += b1.out + b"\xff\xd0" + b2.out + b"\xff\xd9"
    img = decode_jpeg(bytes(out))
    exp = _expected_gray([zz1, zz2], 16, 8)
    assert np.array_equal(img[:, :, 0], exp)


def test_encode_decode_constant_blocks_exact():
    rng = np.random.default_rng(11)
    vals = 128 + 2 * (rng.integers(-32, 32, (2, 3)))  # EVEN offsets
    img = np.repeat(np.repeat(vals, 8, axis=0), 8, axis=1).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(img))
    assert np.array_equal(out[:, :, 0], img)
    assert np.array_equal(out[:, :, 0], out[:, :, 1])


def test_encode_decode_color_and_partial_blocks():
    yy, xx = np.mgrid[0:21, 0:13]
    img = np.stack(
        [(yy * 5) % 256, (xx * 9) % 256, ((yy + xx) * 3) % 256], axis=2
    ).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(img))
    assert out.shape == img.shape
    assert np.abs(out.astype(int) - img.astype(int)).mean() < 8.0


def test_decode_through_dispatcher():
    from history_collector_spark.queries.multimodal import decode_image

    img = np.full((8, 8), 130, dtype=np.uint8)
    out = decode_image(encode_jpeg(img))
    assert out.shape == (8, 8, 3)
    assert np.array_equal(out[:, :, 0], img)


def test_jpeg_error_paths():
    with pytest.raises(JpegDecodeError, match="SOI"):
        decode_jpeg(b"notjpeg")
    blob = bytearray(encode_jpeg(np.full((8, 8), 99, np.uint8)))
    # flip SOF0 -> SOF2: now DISPATCHES to the progressive decoder
    # (round 9), which must reject the baseline-shaped scan header
    # (Ss=0 with Se=63 is illegal for a progressive DC scan) as a
    # decode error — never a silent mis-parse
    i = bytes(blob).index(b"\xff\xc0")
    prog = blob[:i] + b"\xff\xc2" + blob[i + 2 :]
    with pytest.raises(JpegDecodeError, match="DC scan"):
        decode_jpeg(bytes(prog))
    # a remaining non-baseline frame type is still rejected up front
    prog2 = blob[:i] + b"\xff\xc1" + blob[i + 2 :]
    with pytest.raises(JpegDecodeError, match="non-baseline"):
        decode_jpeg(bytes(prog2))
    # truncation inside the entropy stream
    with pytest.raises(JpegDecodeError):
        decode_jpeg(bytes(blob[:-4]))
    # truncation inside a marker segment
    with pytest.raises(JpegDecodeError):
        decode_jpeg(bytes(blob[:20]))


def test_cmyk_jpeg_decode_transform0_exact():
    """Adobe 4-component (inverted CMYK, transform 0): constant 8x8
    blocks survive the DCT path exactly, so the composite-onto-white
    rgb = cmy * k / 255 is closed-form checkable."""
    from history_collector_spark.functions.jpeg import encode_jpeg_cmyk

    blocks = np.array([[140, 180], [100, 220]], dtype=np.uint8)
    cmyk = np.zeros((16, 16, 4), np.uint8)
    for by in range(2):
        for bx in range(2):
            v = int(blocks[by, bx])
            cmyk[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = [
                v, (v + 20) % 256, (v + 40) % 256, 200
            ]
    rgb = decode_jpeg(encode_jpeg_cmyk(cmyk, transform=0))
    exp = np.round(
        cmyk[:, :, :3].astype(float) * cmyk[:, :, 3:4].astype(float)
        / 255.0
    ).astype(np.uint8)
    assert np.array_equal(rgb, exp)


def test_ycck_jpeg_decode_transform2_close():
    """YCCK (transform 2): the forward+inverse YCbCr float path adds
    ~1-2 counts of rounding on top of quantization — assert within 2."""
    from history_collector_spark.functions.jpeg import encode_jpeg_cmyk

    cmyk = np.zeros((8, 8, 4), np.uint8)
    cmyk[:, :, 0] = 150
    cmyk[:, :, 1] = 90
    cmyk[:, :, 2] = 130
    cmyk[:, :, 3] = 240
    rgb = decode_jpeg(encode_jpeg_cmyk(cmyk, transform=2))
    exp = np.round(
        cmyk[:, :, :3].astype(float) * cmyk[:, :, 3:4].astype(float)
        / 255.0
    )
    assert np.abs(rgb.astype(int) - exp.astype(int)).max() <= 2


def test_cmyk_jpeg_through_decode_blob():
    from history_collector_spark.functions.jpeg import encode_jpeg_cmyk
    from history_collector_spark.queries.multimodal import decode_blob

    cmyk = np.full((8, 16, 4), 128, np.uint8)
    meta = decode_blob(encode_jpeg_cmyk(cmyk))
    assert meta == {
        "width": 16, "height": 8, "n_frames": 1, "decode_status": "ok"
    }
