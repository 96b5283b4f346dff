"""Per-codec decode-throughput measurement (VERDICT r14 missing-item 3).

For every pure-Python from-scratch codec kernel in the package,
measures decode MB/s (of DECOMPRESSED output) on a representative
corpus payload, next to the native reference decoder for the same
bytes (stdlib zlib/bz2/lzma/zipfile, pyarrow Codec for snappy/lz4/
zstd, pyarrow.parquet for the raw parquet reader). The ratio is the
honest multiplier a JVM/SIMD kernel would recover at 100 TB — the
standing caveat SCALING.md documents for the map-only decode tier.

Usage: python tools/codec_throughput.py [payload_mb]
Prints one markdown table row per codec.
"""

from __future__ import annotations

import bz2
import gzip
import io
import lzma
import sys
import time
import zipfile
import zlib

sys.path.insert(0, ".")

import duckdb  # noqa: E402


def _payload(mb: float) -> bytes:
    con = duckdb.connect()
    rows = con.sql(
        "SELECT text FROM '/root/testdata/sf0.1/documents.parquet' "
        "ORDER BY doc_id"
    ).fetchall()
    blob = ("\n".join(r[0] for r in rows) + "\n").encode("utf-8")
    want = int(mb * 1e6)
    while len(blob) < want:
        blob += blob
    return blob[:want]


def _mbs(fn, *args, reps: int = 1, out_len: int | None = None) -> float:
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        best = min(best, time.perf_counter() - t0)
    n = out_len if out_len is not None else len(out)
    return n / 1e6 / best


def main(mb: float = 2.0) -> None:
    raw = _payload(mb)
    small = raw[: len(raw) // 8]  # for the slow per-byte kernels
    rows = []

    import pyarrow as pa

    from history_collector_spark.functions import (
        lz4 as flz4,
        snappy as fsnappy,
        zstd as fzstd,
    )
    from history_collector_spark.functions.bzip2 import decompress_bz2
    from history_collector_spark.functions.parquet_raw import (
        read_parquet_raw,
    )
    from history_collector_spark.functions.xz import decompress_xz
    from history_collector_spark.functions.zipfmt import iter_zip

    # --- LZ4 frame ---
    enc = flz4.compress_frame(raw)
    native = None
    try:
        lc = pa.Codec("lz4")  # pyarrow's lz4 codec speaks frame format
        native = _mbs(
            lambda b: lc.decompress(b, decompressed_size=len(raw)),
            enc, reps=3, out_len=len(raw),
        )
    except Exception:
        pass
    rows.append(
        ("LZ4 frame", len(raw),
         _mbs(flz4.decode_lz4_frame, enc, reps=3), native)
    )

    # --- Snappy (raw block) ---
    import pyarrow as _pa

    sc = _pa.Codec("snappy")
    enc = bytes(sc.compress(raw))
    rows.append(
        ("Snappy block", len(raw),
         _mbs(fsnappy.decompress_block, enc, reps=3),
         _mbs(lambda b: sc.decompress(b, decompressed_size=len(raw)),
              enc, reps=3, out_len=len(raw)))
    )

    # --- zstd ---
    zc = _pa.Codec("zstd")
    enc = bytes(zc.compress(raw))
    rows.append(
        ("zstd frame", len(raw),
         _mbs(fzstd.decompress, enc, reps=2),
         _mbs(lambda b: zc.decompress(b, decompressed_size=len(raw)),
              enc, reps=3, out_len=len(raw)))
    )

    # --- gzip/zlib (stdlib on both sides: no from-scratch inflate) ---
    enc = gzip.compress(raw)
    rows.append(
        ("gzip (stdlib both)", len(raw),
         _mbs(gzip.decompress, enc, reps=3),
         _mbs(gzip.decompress, enc, reps=3))
    )

    # --- bzip2 ---
    enc = bz2.compress(small)
    rows.append(
        ("bzip2", len(small),
         _mbs(decompress_bz2, enc),
         _mbs(bz2.decompress, enc, reps=3))
    )

    # --- XZ/LZMA2 ---
    enc = lzma.compress(small, check=lzma.CHECK_CRC64)
    rows.append(
        ("XZ/LZMA2", len(small),
         _mbs(decompress_xz, enc),
         _mbs(lzma.decompress, enc, reps=3))
    )

    # --- ZIP (deflate members, stdlib inflate inside) ---
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("a.txt", raw)
    enc = buf.getvalue()

    def _zip_all(b):
        return b"".join(v for _, v in iter_zip(b))

    def _zip_native(b):
        with zipfile.ZipFile(io.BytesIO(b)) as z:
            return z.read("a.txt")

    rows.append(
        ("ZIP (deflate)", len(raw),
         _mbs(_zip_all, enc, reps=3),
         _mbs(_zip_native, enc, reps=3))
    )

    # --- raw parquet reader vs pyarrow ---
    import pyarrow.parquet as pq

    con = duckdb.connect()
    tbl = con.sql(
        "SELECT doc_id, source, text FROM "
        "'/root/testdata/sf0.1/documents.parquet' ORDER BY doc_id"
    ).arrow()
    pbuf = io.BytesIO()
    pq.write_table(tbl, pbuf, compression="SNAPPY")
    penc = pbuf.getvalue()
    logical = sum(
        len(t) for t in tbl.column("text").to_pylist()
    ) + 8 * tbl.num_rows

    rows.append(
        ("Parquet (snappy pages)", logical,
         _mbs(read_parquet_raw, penc, out_len=logical),
         _mbs(lambda b: pq.read_table(io.BytesIO(b)), penc,
              reps=3, out_len=logical))
    )

    # --- raw ORC reader vs pyarrow ---
    from pyarrow import orc as pa_orc

    from history_collector_spark.functions.orc_raw import read_orc_raw

    obuf = io.BytesIO()
    pa_orc.write_table(tbl, obuf, compression="snappy")
    oenc = obuf.getvalue()
    rows.append(
        ("ORC (snappy, RLEv2)", logical,
         _mbs(read_orc_raw, oenc, out_len=logical),
         _mbs(lambda b: pa_orc.read_table(io.BytesIO(b)), oenc,
              reps=3, out_len=logical))
    )

    print(f"| codec | payload MB | from-scratch MB/s | native MB/s | gap |")
    print("|---|---|---|---|---|")
    for name, n, ours, native in rows:
        gap = f"×{native / ours:.0f}" if (native and ours) else "—"
        nat = f"{native:.0f}" if native else "n/a"
        print(f"| {name} | {n/1e6:.2f} | {ours:.2f} | {nat} | {gap} |")


if __name__ == "__main__":
    main(float(sys.argv[1]) if len(sys.argv) > 1 else 2.0)
