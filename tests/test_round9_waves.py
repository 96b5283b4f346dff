"""Independent cross-checks for the round-9 waves: the oracle gate
proves Spark == DuckDB; these prove the shared formulas right against
implementations that share no code with either engine's plan.
"""

from __future__ import annotations

import math
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from history_collector_spark import registry
from tests.conftest import TEST_SF_DIR

registry.load_all()


def test_mel_energies_match_numpy_fft(spark):
    """Band energies recomputed with numpy's FFT + the same triangular
    weights must agree to float tolerance for every sampled doc."""
    from history_collector_spark.queries.multimodal import (
        _MEL_BINS,
        _MEL_W,
        _TONE_N,
    )

    rows = {
        r["doc_id"]: r
        for r in registry.QUERIES["multimodal_audio_mel_energies"](
            spark, TEST_SF_DIR
        ).collect()
    }
    assert rows
    docs = spark.read.parquet(f"{TEST_SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    ).limit(2000).collect()
    checked = 0
    for r in docs:
        if r["doc_id"] not in rows or len(r["text"]) < 2 * _TONE_N:
            continue
        raw = r["text"][: 2 * _TONE_N].encode("utf-8")[: 2 * _TONE_N]
        # fixture text is ASCII; the sample convention is 16-bit LE
        # over the CHARACTER codes (ascii()), matching the query
        s = np.array(
            [
                (ord(r["text"][2 * n]) + 256 * ord(r["text"][2 * n + 1]))
                / 32768.0
                for n in range(_TONE_N)
            ]
        )
        spec = np.fft.rfft(s)
        powers = {k: abs(spec[k]) ** 2 for k in _MEL_BINS}
        got = rows[r["doc_id"]]
        for b in range(4):
            exp = sum(
                _MEL_W[b][i] * powers[k] for i, k in enumerate(_MEL_BINS)
            )
            assert math.isclose(
                got[f"mel_{b + 1}"], exp, rel_tol=1e-9, abs_tol=1e-9
            ), (r["doc_id"], b, got[f"mel_{b + 1}"], exp)
        checked += 1
        del raw
        if checked >= 40:
            break
    assert checked >= 20


def test_mel_weights_are_valid_triangles():
    from history_collector_spark.queries.multimodal import _MEL_W

    assert len(_MEL_W) == 4
    for w in _MEL_W:
        assert all(0.0 <= x <= 1.0 for x in w)
        assert max(w) > 0  # no empty filter
    # every interior bin participates in at least one filter
    cover = [sum(w[i] for w in _MEL_W) for i in range(len(_MEL_W[0]))]
    assert sum(1 for c in cover if c > 0) >= 5


def test_nprobe_sweep_monotone_recall(spark):
    """More probed lists can only add candidates: recall@5 must be
    non-decreasing in nprobe, and nprobe=4 must match or beat the
    own-list batch probe's hit behavior (superset of lists)."""
    rows = {
        r["nprobe"]: r
        for r in registry.QUERIES["ann_ivf_nprobe_sweep"](
            spark, TEST_SF_DIR
        ).collect()
    }
    assert set(rows) == {1, 2, 4}
    assert rows[1]["n_hits"] <= rows[2]["n_hits"] <= rows[4]["n_hits"]
    nq = rows[1]["n_queries"]
    assert rows[2]["n_queries"] == nq and rows[4]["n_queries"] == nq
    for r in rows.values():
        assert 0.0 <= r["recall_at_5"] <= 1.0


def test_endtoend_matches_stagewise_recomputation(spark):
    """Brute-force the funnel in plain Python over the collected corpus
    (no Spark, no SQL) and compare the per-source fate counts."""
    import hashlib
    import re

    from history_collector_spark.queries.dedup import verified_pair_table
    from history_collector_spark.queries.endtoend import (
        _BENCH_MOD,
        _BUDGET,
        _MIN_TOKENS,
        _NEARDUP_J,
    )

    docs = spark.read.parquet(f"{TEST_SF_DIR}/documents.parquet").select(
        "doc_id", "source", "text"
    ).collect()
    meta = {}
    for r in docs:
        if r["doc_id"] % _BENCH_MOD == 0:
            continue
        toks = re.split(r"\s+", r["text"])
        meta[r["doc_id"]] = (
            r["source"], len(toks),
            hashlib.md5(r["text"].encode()).hexdigest(),
        )
    q = {d for d, (s, nt, h) in meta.items() if nt >= _MIN_TOKENS}
    seen_h = {}
    for d in sorted(q):
        seen_h.setdefault(meta[d][2], d)
    b = {d for d in q if seen_h[meta[d][2]] == d}
    pairs = verified_pair_table(spark, TEST_SF_DIR).filter(
        f"jaccard >= {_NEARDUP_J}"
    ).collect()
    nd = {
        p["doc_b"] for p in pairs
        if p["doc_a"] in b and p["doc_b"] in b
    }
    c = b - nd

    def grams(text):
        t = re.split(r"\s+", text)
        return {
            " ".join(t[i : i + 3]) for i in range(max(len(t) - 2, 0))
        }

    bench = set()
    for r in docs:
        if r["doc_id"] % _BENCH_MOD == 0:
            bench |= grams(r["text"])
    text_by_id = {r["doc_id"]: r["text"] for r in docs}
    contam = {d for d in c if grams(text_by_id[d]) & bench}
    dset = c - contam
    kept = set()
    cum: dict = {}
    for d in sorted(dset):
        src, nt, _ = meta[d]
        cum[src] = cum.get(src, 0) + nt
        if cum[src] <= _BUDGET:
            kept.add(d)
    exp: dict = {}
    for d, (src, nt, h) in meta.items():
        e = exp.setdefault(
            src,
            {"n_input": 0, "drop_quality": 0, "drop_exact": 0,
             "drop_neardup": 0, "drop_contam": 0, "drop_budget": 0,
             "kept_docs": 0, "kept_tokens": 0},
        )
        e["n_input"] += 1
        if d not in q:
            e["drop_quality"] += 1
        elif d not in b:
            e["drop_exact"] += 1
        elif d in nd:
            e["drop_neardup"] += 1
        elif d in contam:
            e["drop_contam"] += 1
        elif d not in kept:
            e["drop_budget"] += 1
        else:
            e["kept_docs"] += 1
            e["kept_tokens"] += nt
    got = {
        r["source"]: r.asDict()
        for r in registry.QUERIES["curation_end_to_end"](
            spark, TEST_SF_DIR
        ).collect()
    }
    assert set(got) == set(exp)
    for src, e in exp.items():
        g = got[src]
        for k, v in e.items():
            assert g[k] == v, (src, k, g[k], v)
