"""Order-insensitive DataFrame comparison between Spark and DuckDB results.

Both frames are normalized (column order, numeric widths, timestamp unit),
sorted by every column, then compared with a float tolerance — the same
spirit as the driver's row-count + schema + value-hash gate.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_bool_dtype(s):
            df[c] = s.astype("boolean")
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("Int64")
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64")
        elif pd.api.types.is_datetime64_any_dtype(s):
            df[c] = pd.to_datetime(s).dt.floor("us").astype("datetime64[us]")
        elif s.dtype == object:
            # decimals from DuckDB, lists/arrays from Spark
            if s.map(lambda v: isinstance(v, (list, tuple, np.ndarray))).any():
                df[c] = s.map(
                    lambda v: tuple(np.round(np.asarray(v, dtype="float64"), 6))
                    if v is not None
                    else None
                )
            else:
                try:
                    df[c] = s.astype("float64")
                except (ValueError, TypeError):
                    df[c] = s.astype("string")
    return df


def _sortable(df: pd.DataFrame) -> pd.DataFrame:
    key = df.apply(lambda row: tuple(str(v) for v in row), axis=1)
    return df.iloc[key.argsort(kind="mergesort")].reset_index(drop=True)


def assert_frames_match(
    spark_df: pd.DataFrame,
    oracle_df: pd.DataFrame,
    name: str = "",
    mode: str = "tolerance",
) -> None:
    """Compare two result frames after normalization and order-insensitive sort.

    mode="tolerance": floats compared at rtol/atol 1e-6 — the diagnostic layer
    (a failure here is a real wrong answer, not representation drift).
    mode="parity": driver-parity gate — floats are quantized to 6 decimals
    (np.round on both sides) and must then be BIT-equal. Calibrated against
    the round-5 driver evidence: queries with last-ulp drift (1e-14..1e-9)
    were driver-green, but event_linear_interpolate went driver-red because
    ~35 of its ulp-drifted values sat exactly on 1e-6 rounding boundaries and
    flipped sides. Round-6-then-exact reproduces precisely that failure
    class: sub-5e-7 drift passes unless it straddles a boundary. Queries
    that fail this mode need their arithmetic made order-independent (prefer
    bit-stable endpoints like min/max over avg/sum) or matched quantization
    on both sides. Parity mode also REJECTS list/dict-valued columns
    outright: the driver's canonicalizer (pandas sort_values over every
    column) crashes on unhashable cells (the round-13 embedding_quantize
    driver-red), so tuple-izing them here would hide a guaranteed external
    failure. Tolerance mode keeps the tuple conversion for diagnostics.
    """
    if mode == "parity":
        for frame, side in ((spark_df, "spark"), (oracle_df, "oracle")):
            for c in frame.columns:
                s = frame[c]
                if s.dtype == object and s.map(
                    lambda v: isinstance(v, (list, tuple, dict, np.ndarray))
                ).any():
                    raise AssertionError(
                        f"{name}: {side} column {c!r} is list/dict-valued — "
                        "the driver canonicalizer crashes on unhashable "
                        "cells; reshape the query output to scalars "
                        "(digest / posexplode / summaries)"
                    )
    assert sorted(spark_df.columns) == sorted(oracle_df.columns), (
        f"{name}: column mismatch {sorted(spark_df.columns)} vs {sorted(oracle_df.columns)}"
    )
    assert len(spark_df) == len(oracle_df), (
        f"{name}: row count {len(spark_df)} vs {len(oracle_df)}"
    )
    a = _sortable(_normalize(spark_df))
    b = _sortable(_normalize(oracle_df))
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av) and pd.api.types.is_float_dtype(bv):
            an = av.fillna(np.nan).to_numpy(dtype="float64")
            bn = bv.fillna(np.nan).to_numpy(dtype="float64")
            if mode == "parity":
                aq, bq = np.round(an, 6), np.round(bn, 6)
                eq = (aq == bq) | (np.isnan(aq) & np.isnan(bq))
                assert eq.all(), (
                    f"{name}: float column {c!r} not equal after round-6 at "
                    f"{int((~eq).sum())}/{len(eq)} rows "
                    f"(max abs raw diff {np.nanmax(np.abs(an - bn)):.3g}) — "
                    "driver hash would be red; stabilize the arithmetic"
                )
            else:
                ok = np.allclose(an, bn, rtol=1e-6, atol=1e-6, equal_nan=True)
                assert ok, f"{name}: float column {c!r} differs"
        else:
            eq = (av.astype("string").fillna("\0") == bv.astype("string").fillna("\0"))
            assert eq.all(), (
                f"{name}: column {c!r} differs at rows {list(eq[~eq].index[:5])}: "
                f"{av[~eq].head(3).tolist()} vs {bv[~eq].head(3).tolist()}"
            )
