"""Round-13 build: animated WebP (ANIM/ANMF) decode + compositing.

The container walk and the canvas arithmetic in
functions/webp.py:decode_webp_anim are verified here against an
INDEPENDENT reference: every frame payload is decoded as a plain
still through decode_webp (itself interop-gated against libwebp for
the pinned vectors), then composited by a per-pixel pure-Python
composer written directly from the container spec's formulas — no
shared code with the numpy kernel under test.
"""

from __future__ import annotations

import numpy as np
import pytest

from history_collector_spark.functions.codec_errors import ImageDecodeError
from history_collector_spark.functions.webp import (
    decode_webp,
    decode_webp_anim,
    parse_webp_info,
)
from history_collector_spark.queries.multimodal import (
    _ANIM_VARIANTS,
    _anim_fixture_blob,
)


def _walk_anmf(blob: bytes):
    """Independent ANMF walk: (x, y, w, h, dur, flags, payload)."""
    pos, out = 12, []
    while pos + 8 <= len(blob):
        tag = blob[pos : pos + 4]
        clen = int.from_bytes(blob[pos + 4 : pos + 8], "little")
        body = blob[pos + 8 : pos + 8 + clen]
        if tag == b"ANMF":
            out.append(
                (
                    2 * int.from_bytes(body[0:3], "little"),
                    2 * int.from_bytes(body[3:6], "little"),
                    1 + int.from_bytes(body[6:9], "little"),
                    1 + int.from_bytes(body[9:12], "little"),
                    int.from_bytes(body[12:15], "little"),
                    body[15],
                    body[16:],
                )
            )
        pos += 8 + clen + (clen & 1)
    return out


def _still_decode(payload: bytes, w: int, h: int):
    """Decode an ANMF payload as a standalone still: re-wrap in a
    VP8X container so an ALPH chunk (alpha plane over lossy VP8)
    stays attached — the bare RIFF+VP8 path has no alpha slot."""
    vp8x = (
        b"VP8X" + (10).to_bytes(4, "little")
        + bytes([0x10]) + b"\x00\x00\x00"
        + (w - 1).to_bytes(3, "little") + (h - 1).to_bytes(3, "little")
    )
    body = vp8x + payload
    blob = b"RIFF" + (4 + len(body)).to_bytes(4, "little") + b"WEBP"
    return decode_webp(blob + body)


def _compose_reference(blob: bytes):
    """Spec-formula composer, per pixel in pure Python ints."""
    info = parse_webp_info(blob)
    W, H = info["width"], info["height"]
    canvas = [[(0, 0, 0, 0)] * W for _ in range(H)]
    frames = []
    for fx, fy, fw, fh, dur, flags, payload in _walk_anmf(blob):
        tile = _still_decode(payload, fw, fh)
        assert tile.shape[:2] == (fh, fw)
        for y in range(fh):
            for x in range(fw):
                sr, sg, sb, sa = (int(v) for v in tile[y, x])
                if flags & 2:  # no-blend
                    canvas[fy + y][fx + x] = (sr, sg, sb, sa)
                    continue
                dr, dg, db, da = canvas[fy + y][fx + x]
                den = sa * 255 + da * (255 - sa)
                if den == 0:
                    canvas[fy + y][fx + x] = (0, 0, 0, 0)
                    continue
                a = (den + 127) // 255
                mix = tuple(
                    (2 * (s * sa * 255 + d * da * (255 - sa)) + den)
                    // (2 * den)
                    for s, d in ((sr, dr), (sg, dg), (sb, db))
                )
                canvas[fy + y][fx + x] = mix + (a,)
        frames.append(
            (dur, np.array(canvas, dtype=np.uint8).reshape(H, W, 4))
        )
        if flags & 1:  # dispose to background
            for y in range(fh):
                for x in range(fw):
                    canvas[fy + y][fx + x] = (0, 0, 0, 0)
    return frames


@pytest.mark.parametrize("variant", _ANIM_VARIANTS)
def test_anim_matches_independent_composer(variant):
    blob = _anim_fixture_blob(variant)
    got = decode_webp_anim(blob)
    expect = _compose_reference(blob)
    assert len(got) == len(expect) == 2
    for (gd, gc), (ed, ec) in zip(got, expect):
        assert gd == ed
        np.testing.assert_array_equal(gc, ec)


def test_anim_metadata_and_first_frame():
    blob = _anim_fixture_blob("overwrite2")
    info = parse_webp_info(blob)
    assert info["has_anim"] and info["n_frames"] == 2
    assert (info["width"], info["height"]) == (48, 32)
    # decode_webp returns the FIRST composited canvas
    first = decode_webp(blob)
    np.testing.assert_array_equal(first, decode_webp_anim(blob)[0][1])
    # max_frames bounds the decode
    assert len(decode_webp_anim(blob, max_frames=1)) == 1


def test_anim_blend_semantics_edges():
    from history_collector_spark.functions.webp import _blend_over

    dst = np.array([[[10, 20, 30, 200]]], np.uint8)
    # fully transparent source leaves dst unchanged
    src0 = np.array([[[99, 99, 99, 0]]], np.uint8)
    np.testing.assert_array_equal(_blend_over(dst, src0), dst)
    # fully opaque source overwrites
    src1 = np.array([[[99, 88, 77, 255]]], np.uint8)
    np.testing.assert_array_equal(_blend_over(dst, src1), src1)
    # both transparent -> transparent black
    z = np.zeros((1, 1, 4), np.uint8)
    np.testing.assert_array_equal(_blend_over(z, z), z)


def test_anim_structural_errors():
    blob = _anim_fixture_blob("blend_tile")
    # frame rectangle escaping the canvas
    bad = bytearray(blob)
    pos = blob.index(b"ANMF")
    bad[pos + 8 : pos + 11] = (100).to_bytes(3, "little")  # x/2 = 100
    with pytest.raises(ImageDecodeError):
        decode_webp_anim(bytes(bad))
    # ANMF header truncated
    pos2 = blob.index(b"ANMF")
    trunc = blob[: pos2 + 8 + 10]
    trunc = (
        trunc[: pos2 + 4] + (10).to_bytes(4, "little") + trunc[pos2 + 8 :]
    )
    with pytest.raises(ImageDecodeError):
        decode_webp_anim(trunc)
    # no frames at all
    with pytest.raises(ImageDecodeError):
        decode_webp_anim(blob[: blob.index(b"ANMF")])


def test_anim_mutation_fuzz():
    """Random corruption must degrade to ImageDecodeError (or still
    decode), never IndexError/struct.error/Overflow — the graceful-
    degradation contract every codec kernel relies on."""
    blob = _anim_fixture_blob("dispose")
    rng = np.random.default_rng(1313)
    ok = err = 0
    for _ in range(150):
        mutant = bytearray(blob)
        for _ in range(int(rng.integers(1, 6))):
            mutant[int(rng.integers(12, len(mutant)))] = int(
                rng.integers(0, 256)
            )
        try:
            frames = decode_webp_anim(bytes(mutant))
            assert frames and all(c.dtype == np.uint8 for _, c in frames)
            ok += 1
        except (ImageDecodeError, NotImplementedError):
            err += 1
    assert ok + err == 150
