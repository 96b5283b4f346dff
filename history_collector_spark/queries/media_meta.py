"""Audio-container ingest (RIFF/WAVE) and image-metadata harvest
(TIFF/EXIF IFD) — the two metadata-bearing container walks a
multimodal corpus sweep runs on every asset before any expensive
decode: WAV framing yields duration/rate/channel facts that gate
audio curation, and the TIFF IFD walk yields dimensions/orientation/
camera facts that gate image curation (and dedup by device).

Topology (same as every codec query here): generate the fixture bytes
in-kernel from doc_id arithmetic, push them through the REAL
from-scratch codec both directions (encode -> parse), and emit narrow
rows — map-only Arrow dataflow, zero exchange before the final
aggregate. Corrupt blobs (a fixed deterministic fraction) must cost a
status='error' row, never a task (the shared MediaDecodeError
contract, fuzz-proven in tests/test_codec_fuzz.py).

Oracles state every field closed-form from the generator arithmetic —
they never frame a RIFF chunk or walk an IFD — so agreement proves
the parser inverts the writer exactly on every doc.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from history_collector_spark.catalog import table
from history_collector_spark.registry import register

_WAV_RATES = (8000, 16000, 44100)
_WAV_ERR_MOD = 17
_TIFF_ERR_MOD = 19


def _wav_batches(batches):
    import numpy as np
    import pandas as pd

    from history_collector_spark.functions.codec_errors import (
        MediaDecodeError,
    )
    from history_collector_spark.functions.wav import (
        alaw_to_lin,
        encode_wav,
        encode_wav_extensible,
        encode_wav_float,
        encode_wav_g711,
        encode_wav_ima_adpcm,
        encode_wav_ms_adpcm,
        parse_wav,
        ulaw_to_lin,
    )

    # G.711 expand LUTs built once per task, lazily (only the 2-in-7
    # G.711 arms need them)
    _G711_LUTS = None
    for pdf in batches:
        out = {
            "doc_id": [], "status": [], "codec": [], "sample_rate": [],
            "n_channels": [], "n_frames": [], "duration_us": [],
            "sum_samples": [], "peak": [],
        }
        for doc_id in pdf["doc_id"]:
            d = int(doc_id)
            # container arm: pcm/float/extensible/ima/ulaw/alaw/ms
            v = d % 7
            n_frames = 64 + d % 64
            channels = 1 + d % 2
            rate = _WAV_RATES[d % 3]
            if v in (3, 6):
                # IMA / MS ADPCM, mono or stereo (round 13 added the
                # interleaved stereo arms), one whole block of
                # per-channel CONSTANT signals: at step index 0 /
                # predictor 0 a zero nibble reconstructs exactly, so
                # the decode is bit-exact and the oracle closed-form;
                # distinct per-channel constants prove the channel
                # de-interleave does not bleed
                if v == 3:
                    # block frames must be 1 mod 8 (4-byte groups)
                    bf = ((n_frames - 1) // 8) * 8 + 1
                else:
                    bf = n_frames - (n_frames % 2)
                c = (d * 37) % 4096 - 2048
                if channels == 2:
                    c2 = (d * 53) % 4096 - 2048
                    sig = np.empty(bf * 2, dtype=np.int64)
                    sig[0::2] = c
                    sig[1::2] = c2
                else:
                    sig = np.full(bf, c, dtype=np.int64)
                enc = encode_wav_ima_adpcm if v == 3 else encode_wav_ms_adpcm
                blob = enc(
                    sig, rate, block_frames=bf, n_channels=channels
                )
            elif v in (4, 5):
                # G.711: samples drawn from the codec's own decode
                # image, so compress(expand(byte)) == byte and the
                # payload bytes — hence the decoded sum — are
                # closed-form. mu-law sticks to the positive half
                # (byte 0x7F, negative zero, is the one
                # non-idempotent code)
                n = n_frames * channels
                i = np.arange(n, dtype=np.int64)
                if _G711_LUTS is None:
                    _G711_LUTS = (
                        np.array([ulaw_to_lin(b) for b in range(256)],
                                 dtype=np.int64),
                        np.array([alaw_to_lin(b) for b in range(256)],
                                 dtype=np.int64),
                    )
                if v == 4:
                    ints = _G711_LUTS[0][128 + (d * 13 + i * 7) % 128]
                    blob = encode_wav_g711(ints, rate, channels, "u")
                else:
                    ints = _G711_LUTS[1][(d * 11 + i * 5) % 256]
                    blob = encode_wav_g711(ints, rate, channels, "a")
            else:
                n = n_frames * channels
                ints = (
                    d * 37 + np.arange(n, dtype=np.int64) * 11
                ) % 4096 - 2048
                if v == 0:
                    blob = encode_wav(ints, rate, channels)
                elif v == 1:
                    # integer/32767 floats round-trip to the exact
                    # integers through the clip+round normalization
                    blob = encode_wav_float(ints / 32767.0, rate, channels)
                else:
                    blob = encode_wav_extensible(ints, rate, channels)
            if d % _WAV_ERR_MOD == 0:
                blob = b"XIFF" + blob[4:]  # torn magic: the crawl case
            out["doc_id"].append(d)
            try:
                w = parse_wav(blob)
                out["status"].append("ok")
                out["codec"].append(w["codec"])
                out["sample_rate"].append(w["sample_rate"])
                out["n_channels"].append(w["n_channels"])
                out["n_frames"].append(w["n_frames"])
                out["duration_us"].append(
                    w["n_frames"] * 1_000_000 // w["sample_rate"]
                )
                s = w["samples"].astype(np.int64)
                out["sum_samples"].append(int(s.sum()))
                out["peak"].append(int(s.max()))
            except (MediaDecodeError, NotImplementedError):
                out["status"].append("error")
                out["codec"].append(None)
                for k in ("sample_rate", "n_channels", "n_frames",
                          "duration_us", "sum_samples", "peak"):
                    out[k].append(None)
        yield pd.DataFrame(
            {
                "doc_id": out["doc_id"],
                "status": out["status"],
                "codec": out["codec"],
                **{
                    k: pd.array(out[k], dtype="Int64")
                    for k in ("sample_rate", "n_channels", "n_frames",
                              "duration_us", "sum_samples", "peak")
                },
            }
        )


@register(
    "multimodal_audio_wav_ingest",
    oracle=f"""
    WITH g AS (
      SELECT doc_id,
             CAST(doc_id % 7 AS INT) AS v,
             64 + doc_id % 64 AS nf,
             1 + doc_id % 2 AS n_channels,
             [8000, 16000, 44100][CAST(doc_id % 3 AS INT) + 1] AS rate,
             (doc_id * 37) % 4096 - 2048 AS c,
             (doc_id * 53) % 4096 - 2048 AS c2
      FROM documents
    ),
    g2 AS (
      SELECT doc_id, v, n_channels, rate, c, c2,
             CASE WHEN v = 3 THEN ((nf - 1) // 8) * 8 + 1
                  WHEN v = 6 THEN nf - (nf % 2)
                  ELSE nf END AS out_frames,
             CASE WHEN v IN (3, 6) THEN 0
                  ELSE nf * n_channels END AS n,
             doc_id % {_WAV_ERR_MOD} = 0 AS err
      FROM g
    ),
    -- decoded int16 value lists for the arms whose samples are not
    -- the raw generator integers: G.711 expand, stated closed-form
    -- from the segment/mantissa formulas (ITU-T G.711)
    vals AS (
      SELECT doc_id,
        CASE WHEN v = 4 THEN list_transform(range(0, n), i ->
               (((127 - (doc_id * 13 + i * 7) % 128) % 16) * 8 + 132)
                 * (1 << CAST((127 - (doc_id * 13 + i * 7) % 128) // 16
                              AS INT)) - 132)
             WHEN v = 5 THEN list_transform(range(0, n), i ->
               CASE WHEN xor((doc_id * 11 + i * 5) % 256, 85) >= 128
                    THEN 1 ELSE -1 END
               * CASE WHEN (xor((doc_id * 11 + i * 5) % 256, 85) // 16)
                           % 8 = 0
                      THEN (xor((doc_id * 11 + i * 5) % 256, 85) % 16)
                           * 16 + 8
                      ELSE ((xor((doc_id * 11 + i * 5) % 256, 85) % 16)
                            * 16 + 264)
                        * (1 << CAST((xor((doc_id * 11 + i * 5) % 256, 85)
                                      // 16) % 8 - 1 AS INT))
                 END)
             WHEN v IN (0, 1, 2) THEN list_transform(range(0, n), i ->
               (doc_id * 37 + i * 11) % 4096 - 2048)
             ELSE NULL END AS dv
      FROM g2
    )
    SELECT g2.doc_id,
      CASE WHEN err THEN 'error' ELSE 'ok' END AS status,
      CASE WHEN err THEN NULL
           WHEN v = 0 THEN 'pcm16' WHEN v = 1 THEN 'float32'
           WHEN v = 2 THEN 'pcm16' WHEN v = 3 THEN 'ima_adpcm'
           WHEN v = 4 THEN 'ulaw' WHEN v = 5 THEN 'alaw'
           ELSE 'ms_adpcm' END AS codec,
      CASE WHEN err THEN NULL ELSE CAST(rate AS BIGINT) END
        AS sample_rate,
      CASE WHEN err THEN NULL ELSE CAST(n_channels AS BIGINT) END
        AS n_channels,
      CASE WHEN err THEN NULL ELSE CAST(out_frames AS BIGINT) END
        AS n_frames,
      CASE WHEN err THEN NULL
           ELSE CAST(out_frames AS BIGINT) * 1000000 // rate END
        AS duration_us,
      CASE WHEN err THEN NULL
           WHEN v IN (3, 6) THEN CAST(out_frames
                * (c + CASE WHEN n_channels = 2 THEN c2 ELSE 0 END)
                AS BIGINT)
           ELSE CAST(list_sum(dv) AS BIGINT)
        END AS sum_samples,
      CASE WHEN err THEN NULL
           WHEN v IN (3, 6) THEN CAST(
                CASE WHEN n_channels = 2 THEN greatest(c, c2)
                     ELSE c END AS BIGINT)
           ELSE CAST(list_max(dv) AS BIGINT)
        END AS peak
    FROM g2 JOIN vals ON g2.doc_id = vals.doc_id
    """,
)
def multimodal_audio_wav_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RIFF/WAVE ingest through the real from-scratch codec both
    directions, now across SEVEN container arms (round 12 added
    G.711 and MS ADPCM to round 11's four): integer PCM16, IEEE
    float32 (samples generated as integer/32767 so the clip+round
    normalization round-trips the exact integers),
    WAVE_FORMAT_EXTENSIBLE (real format dispatched from the SubFormat
    GUID), IMA ADPCM and MS ADPCM in BOTH mono and interleaved stereo
    (round 13 added the stereo arms: per-channel headers, 4-byte
    nibble groups / round-robin nibbles; distinct per-channel
    constant signals reconstruct bit-exactly — zero nibbles at step
    index 0 / predictor 0 — keeping the oracle closed-form while
    proving the channel de-interleave does not bleed), and G.711
    mu-law + A-law (payload bytes drawn from the
    codec's own decode image so compand(expand(b)) == b and the
    decoded sums are stated closed-form from the ITU-T segment
    formulas — the expand tables themselves are audioop-pinned over
    the full int16 range in tests). Per asset: the
    container facts an audio curation pass filters on — codec, rate,
    channels, frames, exact duration, an exact integer content
    checksum (sum) and peak. A deterministic 1/17 of blobs arrive
    with torn magic and must yield status='error' rows (the
    MediaDecodeError graceful-degradation contract; fuzz sweep in
    tests/test_codec_fuzz.py covers all four encoders).

    Oracle: every field stated closed-form from the generators'
    arithmetic — DuckDB never frames a chunk — so agreement proves
    each reader arm inverts its writer sample-exactly.

    Scale shape: map-only Arrow kernel over the scan, narrow output,
    zero exchange (audio containers are framed where they land; only
    facts move)."""
    docs = table(spark, sf_dir, "documents").select("doc_id")
    return docs.mapInPandas(
        _wav_batches,
        schema=(
            "doc_id bigint, status string, codec string,"
            " sample_rate bigint, n_channels bigint, n_frames bigint,"
            " duration_us bigint, sum_samples bigint, peak bigint"
        ),
    )


def _tiff_batches(batches):
    import pandas as pd

    from history_collector_spark.functions.codec_errors import (
        MediaDecodeError,
    )
    from history_collector_spark.functions.tiff import (
        encode_tiff_meta,
        parse_tiff_meta,
    )

    for pdf in batches:
        rows = []
        for doc_id in pdf["doc_id"]:
            d = int(doc_id)
            blob = encode_tiff_meta(
                width=16 + d % 1024,
                height=16 + (d * 3) % 768,
                orientation=1 + d % 8,
                make=f"camera{d % 6}",
                big_endian=d % 2 == 1,
            )
            if d % _TIFF_ERR_MOD == 0:
                blob = b"XX" + blob[2:]  # torn byte-order mark
            try:
                m = parse_tiff_meta(blob)
                rows.append(
                    (m["make"], m["byte_order"], m["width"],
                     m["height"], m["orientation"])
                )
            except (MediaDecodeError, NotImplementedError):
                rows.append((None, None, None, None, None))
        yield pd.DataFrame(
            rows,
            columns=["make", "byte_order", "width", "height",
                     "orientation"],
        )


@register(
    "multimodal_exif_tiff_metadata",
    oracle=f"""
    WITH g AS (
      SELECT CASE WHEN doc_id % {_TIFF_ERR_MOD} = 0 THEN NULL
                  ELSE 'camera' || CAST(doc_id % 6 AS VARCHAR) END
               AS make,
             CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END AS mm,
             16 + doc_id % 1024 AS width,
             16 + (doc_id * 3) % 768 AS height,
             1 + doc_id % 8 AS orientation
      FROM documents
    )
    SELECT make,
      CAST(count(*) AS BIGINT) AS n_images,
      CAST(sum(CASE WHEN make IS NULL THEN NULL ELSE mm END) AS BIGINT)
        AS n_big_endian,
      CAST(sum(CASE WHEN make IS NULL THEN NULL
                    WHEN orientation >= 5 THEN 1 ELSE 0 END) AS BIGINT)
        AS n_rotated,
      CAST(sum(CASE WHEN make IS NULL THEN NULL ELSE width END)
           AS BIGINT) AS sum_width,
      CAST(max(CASE WHEN make IS NULL THEN NULL ELSE height END)
           AS BIGINT) AS max_height
    FROM g GROUP BY make
    """,
)
def multimodal_exif_tiff_metadata(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Fleet-level EXIF harvest through the real from-scratch TIFF IFD
    walker both directions (encode_tiff_meta -> parse_tiff_meta, both
    byte orders, inline AND offset-stored ASCII values): per camera
    make, the corpus facts an image-curation pass keys on — volume,
    byte-order mix, rotation incidence (orientation 5-8 need a
    transpose before any pixel op), width mass, max height. A
    deterministic 1/19 of blobs arrive with a torn byte-order mark and
    aggregate under make=NULL (the error bucket).

    Oracle closed-form from the generator arithmetic (DuckDB never
    walks an IFD).

    Scale shape: map-only Arrow kernel, then ONE hash aggregate on
    make — a trillion EXIF blocks reduce to a camera-grain profile."""
    docs = table(spark, sf_dir, "documents").select("doc_id")
    meta = docs.mapInPandas(
        _tiff_batches,
        schema=(
            "make string, byte_order string, width bigint,"
            " height bigint, orientation bigint"
        ),
    )
    return meta.groupBy("make").agg(
        F.count("*").alias("n_images"),
        F.sum((F.col("byte_order") == "MM").cast("int"))
        .cast("long").alias("n_big_endian"),
        F.sum((F.col("orientation") >= 5).cast("int"))
        .cast("long").alias("n_rotated"),
        F.sum("width").alias("sum_width"),
        F.max("height").alias("max_height"),
    )


# ---------------------------------------------------------------------------
# MP3 frame-header metadata ingest: the metadata-grade audio arm
# (functions/mp3.py) — duration/bitrate/channel facts from physical
# frame walking, full sample decode stays the documented plug point.
# ---------------------------------------------------------------------------

_MP3_BITRATES = (64, 128, 192, 320)
_MP3_RATES = (44100, 48000, 32000)
_MP3_ERR_MOD = 19


def _mp3_batches(batches):
    import pandas as pd

    from history_collector_spark.functions.codec_errors import (
        MediaDecodeError,
    )
    from history_collector_spark.functions.mp3 import (
        build_mp3,
        parse_mp3_info,
        wrap_mp3_in_wav,
    )

    for pdf in batches:
        out = {
            "doc_id": [], "status": [], "container": [],
            "channel_mode": [], "vbr_source": [],
            "n_frames": [], "sample_rate": [], "bitrate_kbps": [],
            "duration_us": [], "id3v2_bytes": [],
        }
        for doc_id in pdf["doc_id"]:
            d = int(doc_id)
            nf = 8 + d % 24
            br = _MP3_BITRATES[d % 4]
            sr = _MP3_RATES[d % 3]
            id3 = b"t" * (40 + d % 50) if d % 3 == 0 else b""
            # round 13: 3 in 5 assets carry a real VBR duration
            # header (Xing / Info / Fraunhofer VBRI) in a leading
            # header frame, the layout real encoders emit
            vh = ("xing", "info", "vbri", None, None)[d % 5]
            blob = build_mp3(nf, br, sr, mono=bool(d % 2),
                             id3_payload=id3, vbr_header=vh)
            # round 13: every fourth asset arrives RIFF/WAVE-wrapped
            # (the 'MP3-in-WAV' container, fmt tag 0x0055) — the
            # parser unwraps it transparently
            wrapped = d % 4 == 1
            if wrapped:
                blob = wrap_mp3_in_wav(blob, sr, br)
            if d % _MP3_ERR_MOD == 0:
                blob = b"\x00" + blob[1:]  # torn sync / torn magic
            out["doc_id"].append(d)
            out["container"].append("wav" if wrapped else "raw")
            try:
                info = parse_mp3_info(blob)
                # the header's frame count must equal the walked
                # audio frames (walk minus the header frame itself) —
                # a drifting Xing offset or field parse flips status
                consistent = info["vbr_frames"] is None or (
                    info["vbr_frames"] == info["n_frames"] - 1
                )
                out["status"].append("ok" if consistent else "mismatch")
                out["channel_mode"].append(info["channel_mode"])
                out["vbr_source"].append(info["vbr_source"])
                out["n_frames"].append(info["n_frames"])
                out["sample_rate"].append(info["sample_rate"])
                out["bitrate_kbps"].append(info["bitrate_kbps"])
                out["duration_us"].append(info["duration_us"])
                out["id3v2_bytes"].append(info["id3v2_bytes"])
            except MediaDecodeError:
                out["status"].append("error")
                out["channel_mode"].append(None)
                out["vbr_source"].append(None)
                for k in ("n_frames", "sample_rate", "bitrate_kbps",
                          "duration_us", "id3v2_bytes"):
                    out[k].append(None)
        yield pd.DataFrame(
            {
                "doc_id": out["doc_id"],
                "status": out["status"],
                "container": out["container"],
                "channel_mode": out["channel_mode"],
                "vbr_source": out["vbr_source"],
                **{
                    k: pd.array(out[k], dtype="Int64")
                    for k in ("n_frames", "sample_rate", "bitrate_kbps",
                              "duration_us", "id3v2_bytes")
                },
            }
        )


@register(
    "multimodal_mp3_meta",
    oracle=f"""
    WITH g AS (
      SELECT doc_id,
             8 + doc_id % 24 AS nf,
             [64, 128, 192, 320][CAST(doc_id % 4 AS INT) + 1] AS br,
             [44100, 48000, 32000][CAST(doc_id % 3 AS INT) + 1] AS sr,
             CASE WHEN doc_id % 3 = 0
                  THEN 10 + 40 + doc_id % 50 ELSE 0 END AS id3,
             doc_id % 2 = 1 AS mono,
             ['xing', 'info', 'vbri', 'none', 'none']
               [CAST(doc_id % 5 AS INT) + 1] AS vsrc,
             CASE WHEN doc_id % 5 <= 2 THEN 1 ELSE 0 END AS lead,
             doc_id % {_MP3_ERR_MOD} = 0 AS err
      FROM documents
    )
    SELECT doc_id,
      CASE WHEN err THEN 'error' ELSE 'ok' END AS status,
      CASE WHEN doc_id % 4 = 1 THEN 'wav' ELSE 'raw' END AS container,
      CASE WHEN err THEN NULL
           WHEN mono THEN 'mono' ELSE 'stereo' END AS channel_mode,
      CASE WHEN err THEN NULL ELSE vsrc END AS vbr_source,
      CASE WHEN err THEN NULL ELSE CAST(nf + lead AS BIGINT) END
        AS n_frames,
      CASE WHEN err THEN NULL ELSE CAST(sr AS BIGINT) END
        AS sample_rate,
      CASE WHEN err THEN NULL ELSE CAST(br AS BIGINT) END
        AS bitrate_kbps,
      CASE WHEN err THEN NULL
           ELSE CAST(nf + lead AS BIGINT) * 1152 * 1000000 // sr END
        AS duration_us,
      CASE WHEN err THEN NULL ELSE CAST(id3 AS BIGINT) END
        AS id3v2_bytes
    FROM g
    """,
)
def multimodal_mp3_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MP3 metadata-grade ingest through the from-scratch frame-header
    walker (functions/mp3.py, ISO/IEC 11172-3 header layout + the
    published bitrate/sample-rate tables): per asset, the facts an
    audio curation pass filters on — physical frame count, sample
    rate, channel mode, bitrate, EXACT duration from
    samples-per-frame arithmetic, the skipped ID3v2 tag size, and —
    round 13 — the VBR duration header source (Xing / Info /
    Fraunhofer VBRI, parsed at their real offsets inside the leading
    header frame; 3 in 5 assets carry one) plus the container: every
    fourth asset arrives RIFF/WAVE-wrapped (fmt tag 0x0055, the
    'MP3-in-WAV' layout real muxers emit) and must unwrap
    transparently. The kernel cross-checks
    the header's frame count against the physical walk (they must
    agree exactly — any Xing-offset or field-parse drift lands as
    status='mismatch', which the oracle never emits). A deterministic
    1/19 of blobs arrive with torn sync bytes and must land as
    status='error' rows (graceful-degradation contract); streams
    rotate MPEG-1 Layer III bitrates/rates/channel modes and every
    third asset carries a syncsafe-sized ID3v2 tag the walker must
    skip exactly. The oracle restates every field closed-form from
    the generator arithmetic — frame-length or ID3-skip drift of a
    single byte flips a row.

    Scale shape: map-only Arrow kernel, zero exchange; per-asset work
    is linear in frame count (header hops, no payload reads)."""
    docs = table(spark, sf_dir, "documents").select("doc_id")
    return docs.mapInPandas(
        _mp3_batches,
        schema=(
            "doc_id bigint, status string, container string,"
            " channel_mode string, vbr_source string,"
            " n_frames bigint, sample_rate bigint, bitrate_kbps bigint,"
            " duration_us bigint, id3v2_bytes bigint"
        ),
    )
