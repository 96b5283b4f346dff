"""From-scratch RIFF/WAVE (PCM) reader + writer.

The crawl-audio analogue of the image codecs: a real corpus's audio
arrives as WAV/RIFF containers, and the ingest kernel must frame the
container, validate the format chunk, and expose samples — degrading
gracefully (``AudioDecodeError``) on the torn blobs a crawl always
contains, never killing a task.

Subset by design (PCM integer, fmt tag 1): compressed WAVE formats
(ADPCM, float, extensible) raise ``NotImplementedError`` at the plug
point, the same posture as lossy WebP in ``functions/webp.py``. The
chunk walker itself is total: it skips unknown chunks (LIST/INFO/fact
and anything else) by their declared size like a real RIFF reader, so
metadata-bearing files parse fine.

No third-party or stdlib wave module is used anywhere (the stdlib
``wave`` module exists but would hide exactly the framing logic this
engine must own; tests cross-validate against it instead, the
tarfile/html.parser discipline).
"""

from __future__ import annotations

import struct

from history_collector_spark.functions.codec_errors import AudioDecodeError


def encode_wav(samples, sample_rate: int, n_channels: int = 1) -> bytes:
    """Interleaved int16 samples -> minimal PCM16 WAV blob (plus one
    junk LIST chunk so readers must exercise the skip path)."""
    import numpy as np

    pcm = np.asarray(samples, dtype="<i2").tobytes()
    block_align = 2 * n_channels
    fmt = struct.pack(
        "<HHIIHH",
        1,  # PCM
        n_channels,
        sample_rate,
        sample_rate * block_align,
        block_align,
        16,
    )
    info = b"INFOISFT\x06\x00\x00\x00hcwav\x00"
    chunks = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"LIST" + struct.pack("<I", len(info)) + info
        + b"data" + struct.pack("<I", len(pcm)) + pcm
        + (b"\x00" if len(pcm) & 1 else b"")
    )
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def parse_wav(blob: bytes) -> dict:
    """WAV blob -> {sample_rate, n_channels, bits, n_frames, samples}.

    samples is an int16 numpy array of interleaved frames. Raises
    AudioDecodeError on any malformed framing, NotImplementedError on
    valid-but-unsupported formats (non-PCM, non-16-bit)."""
    import numpy as np

    if len(blob) < 12:
        raise AudioDecodeError("short RIFF header")
    if blob[0:4] != b"RIFF":
        raise AudioDecodeError("bad RIFF magic")
    (riff_size,) = struct.unpack("<I", blob[4:8])
    if blob[8:12] != b"WAVE":
        raise AudioDecodeError("bad WAVE form type")
    if riff_size + 8 > len(blob):
        raise AudioDecodeError("RIFF size past end of blob")
    pos = 12
    end = 8 + riff_size
    fmt = None
    data = None
    while pos + 8 <= end:
        cid = blob[pos : pos + 4]
        (csize,) = struct.unpack("<I", blob[pos + 4 : pos + 8])
        body_end = pos + 8 + csize
        if body_end > end:
            raise AudioDecodeError(f"chunk {cid!r} past end of RIFF")
        body = blob[pos + 8 : body_end]
        if cid == b"fmt ":
            if csize < 16:
                raise AudioDecodeError("fmt chunk too short")
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        # any other chunk id: skip by declared size (LIST, fact, ...)
        pos = body_end + (csize & 1)  # chunks are word-aligned
    if fmt is None:
        raise AudioDecodeError("missing fmt chunk")
    if data is None:
        raise AudioDecodeError("missing data chunk")
    tag, n_channels, rate, _byte_rate, block_align, bits = fmt
    if tag != 1:
        raise NotImplementedError(f"non-PCM WAVE format tag {tag}")
    if bits != 16:
        raise NotImplementedError(f"{bits}-bit PCM unsupported")
    if n_channels < 1 or n_channels > 32:
        raise AudioDecodeError(f"implausible channel count {n_channels}")
    if rate <= 0:
        raise AudioDecodeError("non-positive sample rate")
    if block_align != 2 * n_channels:
        raise AudioDecodeError(
            f"block align {block_align} != 2 * {n_channels}"
        )
    if len(data) % block_align:
        raise AudioDecodeError("data chunk not frame-aligned")
    samples = np.frombuffer(data, dtype="<i2")
    return {
        "sample_rate": rate,
        "n_channels": n_channels,
        "bits": bits,
        "n_frames": len(data) // block_align,
        "samples": samples,
    }
