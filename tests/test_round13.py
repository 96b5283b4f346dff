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


# ---------------------------------------------------------------------------
# Round-13 stereo ADPCM arms: the stereo decode must equal the PINNED
# mono decoder run per channel — the stereo block is de-interleaved
# into two mono-layout blocks (header + that channel's nibble bytes)
# and each is pushed through the mono path, so the only new code under
# test (channel routing) is verified against the old code exactly.
# ---------------------------------------------------------------------------


def _ima_stereo_to_mono_blocks(data: bytes, block_align: int):
    """Stereo IMA block stream -> per-channel mono block streams."""
    mono_align = block_align // 2
    chans = [bytearray(), bytearray()]
    for b0 in range(0, len(data), block_align):
        blk = data[b0 : b0 + block_align]
        for c in (0, 1):
            chans[c] += blk[4 * c : 4 * c + 4]
        pos = 8
        while pos < block_align:
            for c in (0, 1):
                chans[c] += blk[pos : pos + 4]
                pos += 4
    return bytes(chans[0]), bytes(chans[1]), mono_align


def _ms_stereo_to_mono_blocks(data: bytes, block_align: int):
    """Stereo MS block stream -> per-channel mono block streams."""
    mono_align = block_align // 2
    chans = [bytearray(), bytearray()]
    for b0 in range(0, len(data), block_align):
        blk = data[b0 : b0 + block_align]
        for c in (0, 1):
            hdr = (
                blk[c : c + 1]
                + blk[2 + 2 * c : 4 + 2 * c]      # delta
                + blk[6 + 2 * c : 8 + 2 * c]      # sample1
                + blk[10 + 2 * c : 12 + 2 * c]    # sample2
            )
            chans[c] += hdr
        nibbles: list[list[int]] = [[], []]
        i = 0
        for byte in blk[14:]:
            for n in (byte >> 4, byte & 0xF):
                nibbles[i % 2].append(n)
                i += 1
        for c in (0, 1):
            ns = nibbles[c]
            for hi, lo in zip(ns[0::2], ns[1::2]):
                chans[c].append((hi << 4) | lo)
    return bytes(chans[0]), bytes(chans[1]), mono_align


def test_stereo_ima_adpcm_matches_per_channel_mono():
    from history_collector_spark.functions.wav import (
        _decode_ima_adpcm,
        encode_wav_ima_adpcm,
        parse_wav,
    )

    rng = np.random.default_rng(131)
    bf = 89  # 1 mod 8
    left = np.cumsum(rng.integers(-40, 41, bf * 2)).astype(int)
    right = np.cumsum(rng.integers(-90, 91, bf * 2)).astype(int)
    inter = np.empty(bf * 4, dtype=int)
    inter[0::2], inter[1::2] = left, right
    blob = encode_wav_ima_adpcm(inter, 8000, block_frames=bf,
                                n_channels=2)
    w = parse_wav(blob)
    assert w["n_channels"] == 2 and w["n_frames"] == bf * 2
    got = np.asarray(w["samples"]).reshape(-1, 2)

    # locate the data chunk and de-interleave
    pos = blob.index(b"data")
    data = blob[pos + 8 : pos + 8 + int.from_bytes(
        blob[pos + 4 : pos + 8], "little")]
    align = (4 + (bf - 1) // 2) * 2
    ch0, ch1, mono_align = _ima_stereo_to_mono_blocks(data, align)
    np.testing.assert_array_equal(
        got[:, 0], _decode_ima_adpcm(ch0, mono_align))
    np.testing.assert_array_equal(
        got[:, 1], _decode_ima_adpcm(ch1, mono_align))


def test_stereo_ms_adpcm_matches_per_channel_mono():
    from history_collector_spark.functions.wav import (
        _MS_DEFAULT_COEFS,
        _decode_ms_adpcm,
        encode_wav_ms_adpcm,
        parse_wav,
    )

    rng = np.random.default_rng(137)
    bf = 94  # even
    left = np.cumsum(rng.integers(-60, 61, bf * 2)).astype(int)
    right = np.cumsum(rng.integers(-25, 26, bf * 2)).astype(int)
    inter = np.empty(bf * 4, dtype=int)
    inter[0::2], inter[1::2] = left, right
    blob = encode_wav_ms_adpcm(inter, 16000, block_frames=bf,
                               n_channels=2)
    w = parse_wav(blob)
    assert w["n_channels"] == 2 and w["n_frames"] == bf * 2
    got = np.asarray(w["samples"]).reshape(-1, 2)

    pos = blob.index(b"data")
    data = blob[pos + 8 : pos + 8 + int.from_bytes(
        blob[pos + 4 : pos + 8], "little")]
    align = (7 + (bf - 2) // 2) * 2
    ch0, ch1, mono_align = _ms_stereo_to_mono_blocks(data, align)
    np.testing.assert_array_equal(
        got[:, 0], _decode_ms_adpcm(ch0, mono_align, _MS_DEFAULT_COEFS))
    np.testing.assert_array_equal(
        got[:, 1], _decode_ms_adpcm(ch1, mono_align, _MS_DEFAULT_COEFS))


def test_stereo_adpcm_channel_isolation():
    """Distinct per-channel constants reconstruct exactly with zero
    bleed — the property the ingest oracle's closed-form relies on."""
    from history_collector_spark.functions.wav import (
        encode_wav_ima_adpcm,
        encode_wav_ms_adpcm,
        parse_wav,
    )

    for enc, bf in ((encode_wav_ima_adpcm, 105), (encode_wav_ms_adpcm, 100)):
        inter = np.empty(bf * 2, dtype=int)
        inter[0::2], inter[1::2] = 1234, -567
        w = parse_wav(enc(inter, 8000, block_frames=bf, n_channels=2))
        s = np.asarray(w["samples"]).reshape(-1, 2)
        assert set(s[:, 0].tolist()) == {1234}
        assert set(s[:, 1].tolist()) == {-567}


# ---------------------------------------------------------------------------
# Round-13 MP3 VBR headers: Xing/Info at the side-info offset, VBRI at
# offset 36 — the standard duration sources real players read without
# walking the file; the walker is their cross-check.
# ---------------------------------------------------------------------------


def test_mp3_vbr_headers_match_walk():
    from history_collector_spark.functions.mp3 import (
        build_mp3,
        parse_mp3_info,
    )

    for src in ("xing", "info", "vbri"):
        for mono in (False, True):
            blob = build_mp3(17, 192, 48000, mono=mono, vbr_header=src)
            i = parse_mp3_info(blob)
            assert i["vbr_source"] == src
            # header frame count == audio frames == walk minus the
            # header frame itself
            assert i["vbr_frames"] == 17 == i["n_frames"] - 1
            # bytes field == the audio frames' total size
            assert i["vbr_bytes"] == 17 * (144 * 192000 // 48000)
            # Xing (not Info/CBR) and VBRI mark the stream VBR
            assert i["vbr"] == (src != "info")
    # no header -> 'none', walker authority unchanged
    i = parse_mp3_info(build_mp3(9, 128, 44100))
    assert (i["vbr_source"], i["vbr_frames"], i["n_frames"]) == (
        "none", None, 9)


def test_mp3_vbr_header_offset_is_mode_dependent():
    """The Xing tag offset depends on the side-info size (mono 17 vs
    stereo 32 for MPEG-1): a tag written at the stereo offset must
    NOT be found in a mono stream — guards against the classic
    fixed-offset shortcut."""
    from history_collector_spark.functions.mp3 import (
        build_mp3,
        parse_mp3_info,
    )

    stereo = build_mp3(5, 128, 44100, mono=False, vbr_header="xing")
    # flip the channel-mode bits of every frame header to mono: the
    # tag now sits at the wrong offset for the declared mode
    mut = bytearray(stereo)
    pos, flen = 0, 144 * 128000 // 44100
    while pos + 4 <= len(mut):
        mut[pos + 3] |= 0xC0
        pos += flen
    i = parse_mp3_info(bytes(mut))
    assert i["vbr_source"] == "none" and i["vbr_frames"] is None


def test_mp3_truncated_vbr_tag_degrades_to_none():
    """A torn Xing flag/field area must yield vbr_source='none', not
    an exception — damaged duration tags are common in real crawls
    and are not framing errors."""
    from history_collector_spark.functions.mp3 import (
        build_mp3,
        parse_mp3_info,
    )

    blob = bytearray(build_mp3(6, 128, 44100, vbr_header="xing"))
    off = blob.index(b"Xing")
    blob[off + 4 : off + 8] = (0).to_bytes(4, "big")  # no fields
    i = parse_mp3_info(bytes(blob))
    assert i["vbr_source"] == "xing" and i["vbr_frames"] is None
    blob[off : off + 4] = b"Zing"  # torn tag magic
    i = parse_mp3_info(bytes(blob))
    assert i["vbr_source"] == "none"


# ---------------------------------------------------------------------------
# Round-13 animated GIF: compositing semantics pinned by hand-built
# containers (the query's oracle states the sums closed-form; these
# tests pin the per-pixel behavior the arithmetic relies on).
# ---------------------------------------------------------------------------


def test_gif_anim_compositing_semantics():
    from history_collector_spark.queries.multimodal import (
        decode_gif,
        decode_gif_anim,
        encode_gif_anim,
    )

    W, H = 10, 6
    f1 = np.zeros((H, W, 3), np.uint8)
    f1[:, :, 0] = 200
    t = np.zeros((3, 4, 3), np.uint8)
    t[:, :, 2] = 250
    mask = np.ones((3, 4), bool)
    mask[0, 0] = False
    blob = encode_gif_anim(
        [
            dict(px=f1, delay_cs=5, disposal=1),
            dict(px=t, left=2, top=1, delay_cs=8, disposal=3, mask=mask),
            dict(px=t, left=6, top=2, delay_cs=3, disposal=2),
        ],
        W, H,
    )
    frames = decode_gif_anim(blob)
    assert [d for d, _ in frames] == [5, 8, 3]
    c1, c2, c3 = (c for _, c in frames)
    assert (c1[:, :, :3] == f1).all() and (c1[:, :, 3] == 255).all()
    # transparent pixel shows the underlying ground, opaque draws
    assert tuple(c2[1, 2, :3]) == (200, 0, 0)
    assert tuple(c2[1, 3, :3]) == (0, 0, 250)
    # disposal=3 restored the ground under frame 2's rect
    assert tuple(c3[1, 3, :3]) == (200, 0, 0)
    assert tuple(c3[2, 6, :3]) == (0, 0, 250)
    # disposal=2 clears AFTER the snapshot: visible in a 4th frame
    blob4 = encode_gif_anim(
        [
            dict(px=f1, delay_cs=1, disposal=1),
            dict(px=t, left=6, top=2, delay_cs=1, disposal=2),
            dict(px=t[:1, :2], left=0, top=0, delay_cs=1, disposal=1),
        ],
        W, H,
    )
    c_last = decode_gif_anim(blob4)[-1][1]
    assert (c_last[2:5, 6:10, 3] == 0).all()  # cleared to transparent
    # max_frames bound + first-frame convention
    assert len(decode_gif_anim(blob, max_frames=2)) == 2
    np.testing.assert_array_equal(decode_gif(blob), f1)


def test_gif_anim_structural_errors():
    from history_collector_spark.queries.multimodal import (
        ImageDecodeError,
        decode_gif_anim,
        encode_gif_anim,
    )

    px = np.zeros((2, 2, 3), np.uint8)
    blob = encode_gif_anim([dict(px=px, delay_cs=1)], 4, 4)
    # frame escaping the logical screen
    bad = encode_gif_anim([dict(px=px, left=3, top=3, delay_cs=1)], 4, 4)
    with pytest.raises(ImageDecodeError):
        decode_gif_anim(bad)
    # no frames
    with pytest.raises(ImageDecodeError):
        decode_gif_anim(blob[:13] + b"\x3B")
    # fuzz: corruption degrades to ImageDecodeError, never IndexError
    rng = np.random.default_rng(4242)
    big = encode_gif_anim(
        [
            dict(px=np.arange(48, dtype=np.uint8).reshape(4, 4, 3),
                 delay_cs=2, disposal=2),
            dict(px=px, left=1, top=1, delay_cs=2),
        ],
        6, 6,
    )
    ok = err = 0
    for _ in range(200):
        mutant = bytearray(big)
        for _ in range(int(rng.integers(1, 5))):
            mutant[int(rng.integers(6, len(mutant)))] = int(
                rng.integers(0, 256)
            )
        try:
            frames = decode_gif_anim(bytes(mutant))
            assert frames
            ok += 1
        except (ImageDecodeError, NotImplementedError):
            err += 1
    assert ok + err == 200


def test_mp3_in_wav_unwraps_transparently():
    from history_collector_spark.functions.codec_errors import (
        AudioDecodeError,
    )
    from history_collector_spark.functions.mp3 import (
        build_mp3,
        parse_mp3_info,
        wrap_mp3_in_wav,
    )
    from history_collector_spark.functions.wav import (
        encode_wav,
        parse_wav,
    )

    raw = build_mp3(11, 128, 44100, vbr_header="xing",
                    id3_payload=b"x" * 30)
    wrapped = wrap_mp3_in_wav(raw, 44100, 128)
    a, b = parse_mp3_info(raw), parse_mp3_info(wrapped)
    assert a == b and a["n_frames"] == 12 and a["vbr_frames"] == 11
    # a RIFF wrapper holding PCM is NOT an MPEG stream
    pcm = encode_wav([0, 1, 2, 3], 8000)
    with pytest.raises(AudioDecodeError):
        parse_mp3_info(pcm)
    # ...and the WAV reader deliberately leaves tag 0x0055 alone
    with pytest.raises(NotImplementedError):
        parse_wav(wrapped)


# ---------------------------------------------------------------------------
# Round-13 zstd dictionaries: the from-scratch RFC 8878 dictionary
# path (parse_zstd_dict + decompress(dictionary=...)) against REAL
# libzstd: a ZDICT-trained dictionary, per-sample frames compressed
# with ZSTD_compress_usingDict, decoded bit-exact.
# ---------------------------------------------------------------------------


def _zdict_fixture():
    from history_collector_spark.queries.corpus_io import (
        _train_zstd_dict,
        _zstd_compress_with_dict,
    )

    rng = np.random.default_rng(777)
    words = ("alpha beta gamma delta epsilon zeta eta theta iota "
             "kappa lambda mu").split()
    samples = [
        (" ".join(words[int(i)] for i in rng.integers(0, 12, 30))
         + f" tail{k}\n").encode()
        for k in range(120)
    ]
    return samples, _train_zstd_dict(samples), _zstd_compress_with_dict


def test_zstd_trained_dictionary_interop():
    from history_collector_spark.functions.zstd import (
        ZstdDecodeError,
        decompress,
        parse_zstd_dict,
    )

    samples, dict_bytes, compress = _zdict_fixture()
    info = parse_zstd_dict(dict_bytes)
    assert info["dict_id"] != 0 and info["entropy"] is not None
    assert all(r > 0 for r in info["reps"])
    assert len(info["content"]) > 0
    for s in samples[:60]:
        frame = compress(s, dict_bytes)
        assert decompress(frame, dictionary=dict_bytes) == s
    # the frame header demands the dictionary id
    frame = compress(samples[0], dict_bytes)
    with pytest.raises(ZstdDecodeError):
        decompress(frame)
    # ...and a different structured dictionary is rejected by id
    other = bytearray(dict_bytes)
    other[4] ^= 0xFF
    with pytest.raises(ZstdDecodeError):
        decompress(frame, dictionary=bytes(other))


def test_zstd_raw_content_dictionary_interop():
    from history_collector_spark.functions.zstd import (
        decompress,
        parse_zstd_dict,
    )
    from history_collector_spark.queries.corpus_io import (
        _zstd_compress_with_dict,
    )

    raw = b"alpha beta gamma delta epsilon zeta eta theta " * 3
    info = parse_zstd_dict(raw)
    assert info == {
        "dict_id": 0, "entropy": None, "reps": None, "content": raw
    }
    msg = b"epsilon zeta eta theta alpha beta gamma delta end."
    frame = _zstd_compress_with_dict(msg, raw)
    assert decompress(frame, dictionary=raw) == msg


def test_zstd_dict_parse_errors_and_plain_frames_unaffected():
    from history_collector_spark.functions.zstd import (
        ZstdDecodeError,
        compress_store,
        decompress,
        parse_zstd_dict,
    )

    samples, dict_bytes, _ = _zdict_fixture()
    # truncated structured dictionary -> clean error
    with pytest.raises(ZstdDecodeError):
        parse_zstd_dict(dict_bytes[:16])
    # a dictionary supplied to a dict-less frame still decodes (the
    # window prefix is benign when no sequence reaches into it)
    plain = compress_store(b"plain frame payload")
    assert decompress(plain, dictionary=dict_bytes) == b"plain frame payload"
    assert decompress(plain) == b"plain frame payload"


# ---------------------------------------------------------------------------
# Round-13 bzip2: from-scratch decoder vs the REAL libbz2 (stdlib bz2)
# across levels, content classes, multi-block and concatenated
# streams; mutation fuzz pins graceful degradation.
# ---------------------------------------------------------------------------


def test_bzip2_interop_sweep():
    import bz2 as _bz2
    import random

    from history_collector_spark.functions.bzip2 import decompress_bz2

    random.seed(1331)
    cases = [
        b"",
        b"a",
        b"aaaa",  # RLE1 boundary: exactly four equal bytes
        b"aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa" * 30,
        b"abcd" * 1000,
        bytes(random.randrange(256) for _ in range(5000)),
        (" ".join(random.choice(["alpha", "beta", "gamma", "delta"])
                  for _ in range(2000))).encode(),
        bytes(random.randrange(4) for _ in range(200_000)),  # 2 blocks @1
    ]
    for lvl in (1, 5, 9):
        for c in cases:
            assert decompress_bz2(_bz2.compress(c, lvl)) == c
    # concatenated streams (the multi-member convention)
    two = _bz2.compress(b"first|", 1) + _bz2.compress(b"second", 9)
    assert decompress_bz2(two) == b"first|second"


def test_bzip2_fuzz_and_crc_gate():
    import bz2 as _bz2

    from history_collector_spark.functions.bzip2 import (
        Bzip2DecodeError,
        decompress_bz2,
    )

    base = _bz2.compress(
        b"the quarterly revenue grew across all regions " * 50, 9
    )
    rng = np.random.default_rng(9090)
    ok = err = 0
    for _ in range(250):
        mutant = bytearray(base)
        for _ in range(int(rng.integers(1, 4))):
            mutant[int(rng.integers(0, len(mutant)))] = int(
                rng.integers(0, 256)
            )
        try:
            out = decompress_bz2(bytes(mutant))
            # CRC layers make silent corruption essentially impossible;
            # an accepted mutant must be byte-identical to the truth
            assert out == b"the quarterly revenue grew across all regions " * 50
            ok += 1
        except Bzip2DecodeError:
            err += 1
    assert ok + err == 250 and err > 200


# ---------------------------------------------------------------------------
# Round-13 PDF extraction: the structure parser against its own real
# (viewer-openable) writer, plus hand-built operator/escape cases the
# writer never emits.
# ---------------------------------------------------------------------------


def test_pdf_roundtrip_and_escapes():
    from history_collector_spark.functions.pdf import (
        extract_pdf_text,
        write_pdf,
    )

    pages = [
        ["Hello (world) \\ backslash", "tab\there", "newline\nkept"],
        ["héllo — unicode ✓", ""],
        ["parens ))(( nested (a(b)c)", "100% literal %PDF"],
    ]
    for compress in (True, False):
        got = extract_pdf_text(write_pdf(pages, compress=compress))
        assert got == ["".join(p) for p in pages]


def test_pdf_operator_and_string_forms():
    """Hand-built content streams: TJ arrays with kerning numbers,
    hex strings, octal escapes, line continuations — forms the
    fixture writer never emits."""
    from history_collector_spark.functions.pdf import (
        _extract_content_text,
    )

    content = (
        b"BT /F1 12 Tf 72 720 Td "
        b"[(A) -120 (B) 33.5 (C)] TJ "
        b"<48656C6C6F> Tj "
        b"(oct\\101l and \\( paren) Tj "
        b"(line\\\ncontinued) Tj "
        b"ET"
    )
    assert (
        _extract_content_text(content)
        == "ABC" + "Hello" + "octAl and ( paren" + "linecontinued"
    )


def test_pdf_structure_errors_and_fuzz():
    from history_collector_spark.functions.pdf import (
        PdfDecodeError,
        extract_pdf_text,
        write_pdf,
    )

    blob = write_pdf([["some text on a page"] * 5] * 2)
    with pytest.raises(PdfDecodeError):
        extract_pdf_text(b"not a pdf at all")
    with pytest.raises(PdfDecodeError):
        extract_pdf_text(blob[: len(blob) // 2])
    rng = np.random.default_rng(2718)
    ok = err = 0
    for _ in range(200):
        mutant = bytearray(blob)
        for _ in range(int(rng.integers(1, 5))):
            mutant[int(rng.integers(5, len(mutant)))] = int(
                rng.integers(0, 256)
            )
        try:
            texts = extract_pdf_text(bytes(mutant))
            assert isinstance(texts, list)
            ok += 1
        except PdfDecodeError:
            err += 1
    assert ok + err == 200


def test_decode_blob_reports_gif_frame_count():
    from history_collector_spark.queries.multimodal import (
        decode_blob,
        encode_gif,
        encode_gif_anim,
    )

    px = np.zeros((3, 4, 3), np.uint8)
    px[:, :, 1] = 77
    meta = decode_blob(encode_gif(px))
    assert meta["n_frames"] == 1 and meta["decode_status"] == "ok"
    anim = encode_gif_anim(
        [dict(px=px, delay_cs=2), dict(px=px, delay_cs=2),
         dict(px=px, delay_cs=2)],
        4, 3,
    )
    meta = decode_blob(anim)
    assert meta == {
        "width": 4, "height": 3, "n_frames": 3, "decode_status": "ok",
    }


def test_pdf_incremental_update_prev_chain():
    """3+-section xref chains (two incremental updates) must follow
    /Prev per SECTION — the newest trailer's own Prev only reaches
    one hop, and a merged-trailer walk stops short (review finding,
    round 13). Built by appending real incremental updates: each adds
    a replacement object + an xref section chaining to the previous
    one."""
    from history_collector_spark.functions.pdf import (
        _parse_xref,
        extract_pdf_text,
        write_pdf,
    )

    base = write_pdf([["original page text"]])
    m = base.rindex(b"startxref")
    prev1 = int(base[m:].split()[1])

    def update(doc: bytes, prev: int, obj_num: int, body: bytes):
        off = len(doc)
        doc += str(obj_num).encode() + b" 0 obj\n" + body + b"\nendobj\n"
        xref_at = len(doc)
        doc += (
            b"xref\n0 1\n0000000000 65535 f \n"
            + str(obj_num).encode() + b" 1\n"
            + f"{off:010d} 00000 n \n".encode()
            + b"trailer\n<< /Size 99 /Prev " + str(prev).encode()
            + b" >>\nstartxref\n" + str(xref_at).encode() + b"\n%%EOF\n"
        )
        return doc, xref_at

    # two incremental updates -> three chained xref sections; the
    # replaced object is an unused scratch dict, so the text and the
    # catalog live ONLY in the base section
    doc, prev2 = update(base, prev1, 90, b"<< /Scratch 1 >>")
    doc, _ = update(doc, prev2, 91, b"<< /Scratch 2 >>")
    offsets, trailer = _parse_xref(doc)
    assert "Root" in trailer and 90 in offsets and 91 in offsets
    assert extract_pdf_text(doc) == ["original page text"]
