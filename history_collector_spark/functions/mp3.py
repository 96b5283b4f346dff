"""MPEG audio (MP3) frame-header metadata parser — metadata-grade arm.

Real crawls carry MP3 payloads whose FULL decode (hybrid filterbank,
Huffman spectral data) is out of scope, but whose container facts a
curation pipeline filters on — duration, bitrate profile, sample
rate, channel mode, CBR/VBR — are all recoverable from the 4-byte
frame headers alone (ISO/IEC 11172-3 §2.4.1; the public header layout
and bitrate/sample-rate tables below). Same posture as
``parse_webp_info`` for animated WebP: classify and size the asset
honestly instead of charging it as an error, while sample decode
stays a documented plug point.

Parsing walks physical frames: optional ID3v2 tag skip (syncsafe
size), then per-frame sync validation and the exact frame-length
arithmetic (slot size and samples-per-frame by version x layer).
Malformed payloads raise AudioDecodeError; trailing garbage after the
last whole frame is tolerated up to one frame-length (real files end
with ID3v1 tags or padding).
"""

from __future__ import annotations

from history_collector_spark.functions.codec_errors import AudioDecodeError

# bitrate tables in kbps, index 1..14 (0 = free-format, 15 = invalid)
_BITRATES = {
    # (mpeg1?, layer): tuple of 14 rates
    (True, 1): (32, 64, 96, 128, 160, 192, 224, 256,
                288, 320, 352, 384, 416, 448),
    (True, 2): (32, 48, 56, 64, 80, 96, 112, 128,
                160, 192, 224, 256, 320, 384),
    (True, 3): (32, 40, 48, 56, 64, 80, 96, 112,
                128, 160, 192, 224, 256, 320),
    (False, 1): (32, 48, 56, 64, 80, 96, 112, 128,
                 144, 160, 176, 192, 224, 256),
    (False, 2): (8, 16, 24, 32, 40, 48, 56, 64,
                 80, 96, 112, 128, 144, 160),
    (False, 3): (8, 16, 24, 32, 40, 48, 56, 64,
                 80, 96, 112, 128, 144, 160),
}
# sample rates by (version_bits, sr_index)
_SAMPLE_RATES = {
    3: (44100, 48000, 32000),   # MPEG-1
    2: (22050, 24000, 16000),   # MPEG-2
    0: (11025, 12000, 8000),    # MPEG-2.5
}
_CHANNEL_MODES = ("stereo", "joint_stereo", "dual_channel", "mono")


_RIFF_MP3_TAGS = (0x0055, 0x0050)  # MPEG Layer III / Layer I-II


def _unwrap_riff_mp3(data: bytes) -> bytes:
    """RIFF/WAVE-wrapped MPEG audio (fmt tag 0x0055, the common
    'MP3-in-WAV' container; 0x0050 for Layer I/II) -> the raw MPEG
    stream from its data chunk. Non-RIFF payloads pass through
    untouched; a RIFF wrapper holding anything other than an MPEG
    stream is the caller's error (AudioDecodeError), since this
    entry point is the MPEG parser."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        return data
    import struct

    pos, end = 12, min(len(data), 8 + struct.unpack("<I", data[4:8])[0])
    tag = None
    stream = None
    while pos + 8 <= end:
        cid = data[pos : pos + 4]
        (csize,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        # clamp to the DECLARED container end: a chunk whose payload
        # runs past the RIFF size field is truncated, even when the
        # file carries trailing bytes beyond the declared container
        body = data[pos + 8 : min(pos + 8 + csize, end)]
        if len(body) != csize:
            raise AudioDecodeError("truncated RIFF chunk")
        if cid == b"fmt " and len(body) >= 2:
            (tag,) = struct.unpack("<H", body[:2])
        elif cid == b"data":
            stream = body
        pos += 8 + csize + (csize & 1)
    if tag not in _RIFF_MP3_TAGS:
        raise AudioDecodeError(
            f"RIFF wrapper carries format tag {tag}, not an MPEG stream"
        )
    if stream is None:
        raise AudioDecodeError("RIFF/MP3 wrapper has no data chunk")
    return stream


def _id3v2_size(data: bytes) -> int:
    """Bytes to skip for a leading ID3v2 tag (0 if none)."""
    if len(data) < 10 or data[:3] != b"ID3":
        return 0
    if any(b & 0x80 for b in data[6:10]):
        raise AudioDecodeError("ID3v2 size is not syncsafe")
    size = (
        (data[6] << 21) | (data[7] << 14) | (data[8] << 7) | data[9]
    )
    footer = 10 if data[5] & 0x10 else 0
    return 10 + size + footer


def parse_mp3_frame_header(b: bytes):
    """One 4-byte header -> (version_bits, layer, bitrate_kbps,
    sample_rate, padding, channel_mode, frame_bytes, samples)."""
    if len(b) < 4:
        raise AudioDecodeError("MP3 frame header truncated")
    if b[0] != 0xFF or (b[1] & 0xE0) != 0xE0:
        raise AudioDecodeError("bad MP3 frame sync")
    ver = (b[1] >> 3) & 3
    if ver == 1:
        raise AudioDecodeError("reserved MPEG version")
    layer = 4 - ((b[1] >> 1) & 3)  # bits 3/2/1 -> layer I/II/III
    if layer == 4:
        raise AudioDecodeError("reserved MPEG layer")
    br_idx = (b[2] >> 4) & 0xF
    if br_idx == 0:
        raise AudioDecodeError("free-format bitrate not supported")
    if br_idx == 15:
        raise AudioDecodeError("invalid bitrate index")
    sr_idx = (b[2] >> 2) & 3
    if sr_idx == 3:
        raise AudioDecodeError("invalid sample-rate index")
    mpeg1 = ver == 3
    bitrate = _BITRATES[(mpeg1, layer)][br_idx - 1]
    rate = _SAMPLE_RATES[ver][sr_idx]
    padding = (b[2] >> 1) & 1
    mode = _CHANNEL_MODES[(b[3] >> 6) & 3]
    if layer == 1:
        samples = 384
        frame = (12 * bitrate * 1000 // rate + padding) * 4
    elif layer == 2:
        samples = 1152
        frame = 144 * bitrate * 1000 // rate + padding
    else:  # layer III
        samples = 1152 if mpeg1 else 576
        per = 144 if mpeg1 else 72
        frame = per * bitrate * 1000 // rate + padding
    return ver, layer, bitrate, rate, padding, mode, frame, samples


def _xing_side_info_bytes(mpeg1: bool, mono: bool) -> int:
    """Layer III side-info size — the published offset at which a
    Xing/Info tag sits inside the first frame's payload."""
    if mpeg1:
        return 17 if mono else 32
    return 9 if mono else 17


def _parse_vbr_headers(frame: bytes, mpeg1: bool, mono: bool):
    """First physical frame -> (vbr_source, vbr_frames, vbr_bytes).

    Xing ('Xing' tag, VBR) / Info (same layout, CBR) sit after the
    Layer III side info; their big-endian flag word gates optional
    frames / bytes / 100-byte TOC / quality fields in that order.
    When the frame is CRC-protected (protection_bit = 0, i.e. header
    byte 1 bit 0 CLEAR), a 16-bit CRC sits between the header and the
    side info, pushing the tag 2 bytes later — real-world
    CRC-protected VBR files misdetect as 'none' without this.
    VBRI (Fraunhofer) sits at the fixed offset 32 after the 4-byte
    header: version, delay, quality (u16 each), then bytes and
    frames (u32 BE). Absent or truncated headers -> ('none', None,
    None) — a damaged VBR tag is not a framing error."""
    crc = 2 if len(frame) >= 2 and (frame[1] & 0x01) == 0 else 0
    off = 4 + crc + _xing_side_info_bytes(mpeg1, mono)
    tag = frame[off : off + 4]
    if tag in (b"Xing", b"Info") and len(frame) >= off + 8:
        flags = int.from_bytes(frame[off + 4 : off + 8], "big")
        pos = off + 8
        frames = nbytes = None
        if flags & 1:
            if len(frame) < pos + 4:
                return "none", None, None
            frames = int.from_bytes(frame[pos : pos + 4], "big")
            pos += 4
        if flags & 2:
            if len(frame) < pos + 4:
                return "none", None, None
            nbytes = int.from_bytes(frame[pos : pos + 4], "big")
            pos += 4
        return ("xing" if tag == b"Xing" else "info"), frames, nbytes
    if frame[36:40] == b"VBRI" and len(frame) >= 36 + 18:
        nbytes = int.from_bytes(frame[46:50], "big")
        frames = int.from_bytes(frame[50:54], "big")
        return "vbri", frames, nbytes
    return "none", None, None


def parse_mp3_info(data: bytes) -> dict:
    """MP3 payload -> {n_frames, sample_rate, channel_mode, layer,
    mpeg1, bitrate_kbps (max seen), vbr, duration_us, id3v2_bytes,
    vbr_source, vbr_frames, vbr_bytes}.

    Every frame's header is validated and stepped exactly; mixed
    sample rates / layers across frames are malformed (real encoders
    never change them mid-stream). The first frame is additionally
    probed for the standard VBR duration headers (Xing/Info at the
    side-info offset, Fraunhofer VBRI at offset 36): real players
    take duration from these without walking the file, so the walker
    doubles as their cross-check — vbr_frames counts the frames
    AFTER the header frame itself (the Xing frame is not audio),
    which the round-13 fixtures pin against the walk.

    RIFF/WAVE-wrapped MPEG (the 'MP3-in-WAV' container, fmt tag
    0x0055) unwraps transparently — the walk runs on the data
    chunk's stream. The wav module's parse_wav deliberately leaves
    tag 0x0055 to this parser (sample decode is out of scope
    there)."""
    data = _unwrap_riff_mp3(data)
    skip = _id3v2_size(data)
    pos = skip
    if pos >= len(data):
        raise AudioDecodeError("no MP3 frames after ID3v2 tag")
    n_frames = 0
    total_samples = 0
    rate = layer = ver = mode = None
    bitrates = set()
    vbr_source, vbr_frames, vbr_bytes = "none", None, None
    while pos + 4 <= len(data):
        b = data[pos : pos + 4]
        if b[0] != 0xFF or (b[1] & 0xE0) != 0xE0:
            break  # trailing tag / junk after the last whole frame
        v, lay, br, r, _pad, m, frame, samples = parse_mp3_frame_header(b)
        if rate is None:
            ver, layer, rate, mode = v, lay, r, m
            if lay == 3 and pos + frame <= len(data):
                vbr_source, vbr_frames, vbr_bytes = _parse_vbr_headers(
                    data[pos : pos + frame], v == 3, m == "mono"
                )
        elif (v, lay, r) != (ver, layer, rate):
            raise AudioDecodeError("MP3 stream parameters change mid-file")
        if pos + frame > len(data):
            raise AudioDecodeError("MP3 final frame truncated")
        bitrates.add(br)
        n_frames += 1
        total_samples += samples
        pos += frame
    if n_frames == 0:
        raise AudioDecodeError("no valid MP3 frames")
    tail = len(data) - pos
    if tail > 1445:  # longest possible frame: junk, not a tag
        raise AudioDecodeError(f"{tail} bytes of non-frame data")
    return {
        "n_frames": n_frames,
        "sample_rate": rate,
        "channel_mode": mode,
        "layer": layer,
        "mpeg1": ver == 3,
        "bitrate_kbps": max(bitrates),
        "vbr": len(bitrates) > 1 or vbr_source in ("xing", "vbri"),
        "duration_us": total_samples * 1_000_000 // rate,
        "id3v2_bytes": skip,
        "vbr_source": vbr_source,
        "vbr_frames": vbr_frames,
        "vbr_bytes": vbr_bytes,
    }


def wrap_mp3_in_wav(stream: bytes, sample_rate: int = 44100,
                    bitrate_kbps: int = 128) -> bytes:
    """MPEG stream -> RIFF/WAVE 'MP3-in-WAV' container (fmt tag
    0x0055 with the MPEGLAYER3WAVEFORMAT extension real muxers
    write, fact chunk omitted). Inverse of :func:`_unwrap_riff_mp3`
    for fixture arithmetic."""
    import struct

    # nBlockSize = frame length; wID=1 (MPEGLAYER3_ID_MPEG),
    # fdwFlags=0 (padding off), nFramesPerBlock=1, nCodecDelay=0
    block = 144 * bitrate_kbps * 1000 // sample_rate
    extra = struct.pack("<HIHHH", 1, 0, block, 1, 0)
    fmt = struct.pack(
        "<HHIIHHH", 0x0055, 2, sample_rate,
        bitrate_kbps * 1000 // 8, 1, 0, len(extra),
    ) + extra
    chunks = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(stream)) + stream
        + (b"\x00" if len(stream) & 1 else b"")
    )
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def build_mp3(n_frames: int, bitrate_kbps: int = 128,
              sample_rate: int = 44100, mono: bool = False,
              id3_payload: bytes = b"",
              vbr_header: str | None = None,
              crc_protect: bool = False) -> bytes:
    """Assemble a structurally valid MPEG-1 Layer III stream (zeroed
    side-info/spectral payload — a metadata fixture, not playable
    audio) with an optional ID3v2 tag. Exact inverse of
    :func:`parse_mp3_info` for fixture arithmetic.

    ``vbr_header`` ('xing' | 'info' | 'vbri') prepends one extra
    header frame carrying the named VBR tag at its real offset, with
    the frames field = n_frames (the audio frames that follow, per
    the Xing convention) and the bytes field = their total size.

    ``crc_protect`` clears the protection bit (header bit 0), placing
    a 16-bit CRC between header and side info — which pushes the
    Xing/Info tag 2 bytes later, exactly the real-world layout the
    round-14 CRC-offset fix targets."""
    idx = _BITRATES[(True, 3)].index(bitrate_kbps) + 1
    sr_idx = _SAMPLE_RATES[3].index(sample_rate)
    # MPEG-1, layer III; protection bit CLEAR means a CRC follows
    b1 = 0xE0 | (3 << 3) | (1 << 1) | (0 if crc_protect else 1)
    b2 = (idx << 4) | (sr_idx << 2)
    b3 = (3 << 6) if mono else 0
    frame_len = 144 * bitrate_kbps * 1000 // sample_rate
    hdr4 = bytes([0xFF, b1, b2, b3])
    frame = hdr4 + bytes(frame_len - 4)
    out = b""
    if id3_payload:
        size = len(id3_payload)
        ss = bytes([(size >> 21) & 0x7F, (size >> 14) & 0x7F,
                    (size >> 7) & 0x7F, size & 0x7F])
        out += b"ID3\x04\x00\x00" + ss + id3_payload
    lead = b""
    if vbr_header is not None:
        stream_bytes = n_frames * frame_len
        body = bytearray(frame_len - 4)
        if vbr_header in ("xing", "info"):
            off = (2 if crc_protect else 0) + _xing_side_info_bytes(
                True, mono)
            tag = b"Xing" if vbr_header == "xing" else b"Info"
            blob = (tag + (3).to_bytes(4, "big")  # frames + bytes
                    + n_frames.to_bytes(4, "big")
                    + stream_bytes.to_bytes(4, "big"))
            body[off : off + len(blob)] = blob
        elif vbr_header == "vbri":
            blob = (b"VBRI" + (1).to_bytes(2, "big")  # version
                    + bytes(4)  # delay, quality
                    + stream_bytes.to_bytes(4, "big")
                    + n_frames.to_bytes(4, "big"))
            body[32 : 32 + len(blob)] = blob
        else:
            raise ValueError(f"unknown vbr_header {vbr_header!r}")
        lead = hdr4 + bytes(body)
    return out + lead + frame * n_frames
