"""Semantic invariants of the curation/analytics operators — properties
the oracle hash-match cannot express (it only proves Spark == DuckDB,
not that both are *right*). Each test states a law the operator must
satisfy on any input and checks it on the sf0.001 tables.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from history_collector_spark import registry
from tests.conftest import TEST_SF_DIR

registry.load_all()


def test_shard_assign_is_a_balanced_permutation(spark):
    """Every doc appears exactly once; positions within a shard are the
    contiguous range 1..len(shard); no shard is pathologically loaded
    (the hash route is uniform)."""
    pdf = registry.QUERIES["curation_shard_assign"](spark, TEST_SF_DIR).toPandas()
    n_docs = spark.read.parquet(f"{TEST_SF_DIR}/documents.parquet").count()
    assert len(pdf) == n_docs
    assert pdf["doc_id"].is_unique
    for _, grp in pdf.groupby("shard"):
        assert sorted(grp["pos"]) == list(range(1, len(grp) + 1))
    sizes = pdf.groupby("shard").size()
    assert sizes.max() <= 4 * max(sizes.min(), 1)


def test_ngram_lm_probabilities_are_normalized(spark):
    """Conditionals lie in (0, 1] and reported continuations of a prefix
    never sum past 1 (they are a subset of the full distribution)."""
    pdf = registry.QUERIES["text_ngram_lm"](spark, TEST_SF_DIR).toPandas()
    assert ((pdf["prob"] > 0) & (pdf["prob"] <= 1 + 1e-9)).all()
    assert (pdf.groupby("prefix")["prob"].sum() <= 1 + 1e-9).all()
    assert (pdf["c"] >= 3).all()


def test_temperature_mix_conserves_corpus_mass(spark):
    """Weights form a distribution and the reweighted corpus keeps the
    original total size: sum(n_docs * sample_rate) == sum(n_docs)."""
    pdf = registry.QUERIES["curation_temperature_mix"](
        spark, TEST_SF_DIR
    ).toPandas()
    assert abs(pdf["weight"].sum() - 1.0) < 1e-9
    total = pdf["n_docs"].sum()
    assert abs((pdf["n_docs"] * pdf["sample_rate"]).sum() - total) < 1e-6 * total
    # alpha < 1 flattens: smallest source gets rate above the largest's
    smallest = pdf.loc[pdf["n_docs"].idxmin(), "sample_rate"]
    largest = pdf.loc[pdf["n_docs"].idxmax(), "sample_rate"]
    assert smallest >= largest


def test_cohort_retention_peaks_at_week_zero(spark):
    """Week 0 contains the whole cohort, so no later week of the same
    cohort can exceed it; week_k is never negative."""
    pdf = registry.QUERIES["cohort_retention"](spark, TEST_SF_DIR).toPandas()
    assert (pdf["week_k"] >= 0).all()
    for _, grp in pdf.groupby("cohort"):
        base = grp.loc[grp["week_k"] == 0, "n_active"]
        assert len(base) == 1
        assert (grp["n_active"] <= base.iloc[0]).all()


def test_resample_copies_match_rates(spark):
    """Each doc yields floor(rate) or ceil(rate) contiguous copies for
    its source's temperature rate, and (doc_id, copy) never repeats."""
    import math

    rates = {
        r["source"]: r["sample_rate"]
        for r in registry.QUERIES["curation_temperature_mix"](
            spark, TEST_SF_DIR
        ).collect()
    }
    pdf = registry.QUERIES["curation_resample"](spark, TEST_SF_DIR).toPandas()
    assert not pdf.duplicated(["doc_id", "copy"]).any()
    for (doc, src), grp in pdf.groupby(["doc_id", "source"]):
        n = len(grp)
        assert sorted(grp["copy"]) == list(range(n))
        assert n in (math.floor(rates[src]), math.ceil(rates[src]))


# ---------------------------------------------------------------------------
# Window-family gap/frame boundary invariants on hand-built edge-case
# events (the sf tables' random timestamps never land exactly ON a
# boundary, so these laws are untestable there).
# ---------------------------------------------------------------------------


def _write_events(rows, tmpdir):
    """Write a synthetic events.parquet (current driver vintage:
    physical timestamp[us]) into tmpdir and return tmpdir as a sf_dir."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array([r[5] for r in rows], pa.string()),
        }
    )
    pq.write_table(tbl, os.path.join(tmpdir, "events.parquet"))
    return tmpdir


def test_sessionize_gap_exactly_at_threshold_merges(spark, tmp_path):
    """The session split is on gap STRICTLY greater than 30 min: a gap of
    exactly 30:00.000000 stays one session, 30:00.000001 splits. Both the
    lag/cumsum batch formulation and F.session_window agree."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    us = dt.timedelta(microseconds=1)
    m30 = dt.timedelta(minutes=30)
    rows = [
        (0, base, 1, "view", 1.0, "{}"),
        (1, base + m30, 1, "view", 1.0, "{}"),
        (2, base + 2 * m30, 1, "view", 1.0, "{}"),
        (3, base, 2, "view", 1.0, "{}"),
        (4, base + m30 + us, 2, "view", 1.0, "{}"),
    ]
    sf = _write_events(rows, str(tmp_path))
    sess = (
        registry.QUERIES["event_sessionize"](spark, sf)
        .toPandas()
        .groupby("user_id")
        .size()
    )
    assert sess[1] == 1  # exactly-at-threshold gaps merged
    assert sess[2] == 2  # one microsecond past the threshold splits
    # F.session_window must draw the same boundaries
    sw = (
        registry.QUERIES["session_window_agg"](spark, sf)
        .toPandas()
        .groupby("user_id")
        .size()
    )
    assert sw[1] == 1 and sw[2] == 2


def test_sessionize_single_event_session(spark, tmp_path):
    """A lone event forms a 1-event session of zero duration whose start
    equals its end equals its timestamp."""
    import datetime as dt

    base = dt.datetime(2024, 3, 5, 12, 34, 56, 789000)
    sf = _write_events([(0, base, 7, "view", 1.0, "{}")], str(tmp_path))
    pdf = registry.QUERIES["event_sessionize"](spark, sf).toPandas()
    assert len(pdf) == 1
    r = pdf.iloc[0]
    assert r["n_events"] == 1
    assert r["duration_sec"] == 0
    assert r["session_start"] == r["session_end"] == base


def test_trailing_hour_frame_includes_exact_boundary(spark, tmp_path):
    """The RANGE frame is [-1h, now] INCLUSIVE on both ends: an event
    exactly 3600.000000s earlier is inside the frame; 3600.000001s is
    out."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    h1 = dt.timedelta(hours=1)
    us = dt.timedelta(microseconds=1)
    rows = [
        (0, base, 1, "view", 10.0, "{}"),
        (1, base + h1, 1, "view", 1.0, "{}"),  # exactly 1h later
        (2, base, 2, "view", 10.0, "{}"),
        (3, base + h1 + us, 2, "view", 1.0, "{}"),  # 1h + 1us later
    ]
    sf = _write_events(rows, str(tmp_path))
    pdf = (
        registry.QUERIES["trailing_hour_sum"](spark, sf)
        .toPandas()
        .set_index("event_id")
    )
    assert pdf.loc[1, "trailing_n"] == 2
    assert pdf.loc[1, "trailing_sum"] == 11.0
    assert pdf.loc[3, "trailing_n"] == 1
    assert pdf.loc[3, "trailing_sum"] == 1.0


def test_trailing_hour_peers_see_each_other(spark, tmp_path):
    """RANGE frames are peer-inclusive: two events with IDENTICAL
    timestamps are each inside the other's trailing window."""
    import datetime as dt

    base = dt.datetime(2024, 6, 1, 9, 0, 0)
    rows = [
        (0, base, 1, "view", 2.0, "{}"),
        (1, base, 1, "click", 3.0, "{}"),
    ]
    sf = _write_events(rows, str(tmp_path))
    pdf = registry.QUERIES["trailing_hour_sum"](spark, sf).toPandas()
    assert (pdf["trailing_n"] == 2).all()
    assert (pdf["trailing_sum"] == 5.0).all()


def test_embedding_cosine_refuses_oversized_build_side(spark, monkeypatch):
    """The brute-force baseline must refuse to collect an unbounded
    corpus to the driver — the scale path is the bucketed ANN family."""
    import pytest as _pytest

    from history_collector_spark.queries import dedup as dedup_mod

    monkeypatch.setattr(dedup_mod, "COSINE_MAX_BUILD_ROWS", 1)
    with _pytest.raises(ValueError, match="ann_lsh_topk"):
        dedup_mod.dedup_embedding_cosine(spark, TEST_SF_DIR)


def test_bm25_scores_positive_and_ranked(spark):
    """BM25 of an all-matching conjunctive-OR query is positive; ranks
    are 1..k aligned with descending score; top-k has no duplicate doc."""
    pdf = registry.QUERIES["text_bm25_retrieval"](spark, TEST_SF_DIR).toPandas()
    assert len(pdf) > 0 and pdf["doc_id"].is_unique
    assert (pdf["bm25"] > 0).all()
    pdf = pdf.sort_values("rank").reset_index(drop=True)
    assert list(pdf["rank"]) == list(range(1, len(pdf) + 1))
    assert (pdf["bm25"].diff().dropna() <= 1e-12).all()


def test_containment_bounds_and_implies_jaccard(spark):
    """Containment ratios lie in (0, 1]; the larger direction bounds the
    symmetric Jaccard from above (C >= J always), so every reported
    Jaccard pair at threshold t must also appear here when t <= the
    containment threshold scaled for it."""
    c = registry.QUERIES["dedup_containment"](spark, TEST_SF_DIR).toPandas()
    assert ((c["c_a_in_b"] > 0) & (c["c_a_in_b"] <= 1 + 1e-12)).all()
    assert ((c["c_b_in_a"] > 0) & (c["c_b_in_a"] <= 1 + 1e-12)).all()
    # directional ratios come from ONE intersection count:
    # inter = c_a_in_b * na = c_b_in_a * nb -> both nonzero together
    j = registry.QUERIES["dedup_ngram_jaccard"](spark, TEST_SF_DIR).toPandas()
    jac_pairs = set(zip(j["doc_a"], j["doc_b"]))
    cont_pairs = set(zip(c["doc_a"], c["doc_b"]))
    # any Jaccard >= 0.5 pair has max-containment >= 0.5 (C >= J)
    strong = set(zip(j[j["jaccard"] >= 0.5]["doc_a"], j[j["jaccard"] >= 0.5]["doc_b"]))
    assert strong <= cont_pairs, f"missing containment pairs: {strong - cont_pairs}"
    del jac_pairs


def test_semantic_dedup_keep_set_is_canonical(spark):
    """Every vector appears exactly once; dup_of always points at a
    LOWER id in the SAME bucket that is itself present; keepers and
    dups partition the set."""
    pdf = registry.QUERIES["dedup_semantic"](spark, TEST_SF_DIR).toPandas()
    assert pdf["vec_id"].is_unique
    bucket_of = dict(zip(pdf["vec_id"], pdf["bucket"]))
    dups = pdf[~pdf["keep"]]
    assert (dups["dup_of"] < dups["vec_id"]).all()
    for _, r in dups.iterrows():
        assert bucket_of[r["dup_of"]] == r["bucket"]
    assert (pdf["keep"] == pdf["dup_of"].isna()).all()


def test_novelty_ratio_bounds_and_exclusive_shingles(spark):
    """novelty in [0, 1]; n_novel <= n_shingles; a doc with text shared
    verbatim by another doc (exact dups exist in the corpus) has
    novelty 0 on those shingles — so exact-dup docs can never be 100%
    novel."""
    pdf = registry.QUERIES["text_novelty"](spark, TEST_SF_DIR).toPandas()
    assert ((pdf["novelty"] >= 0) & (pdf["novelty"] <= 1 + 1e-12)).all()
    assert (pdf["n_novel"] <= pdf["n_shingles"]).all()
    docs = spark.read.parquet(f"{TEST_SF_DIR}/documents.parquet").toPandas()
    dup_texts = docs[docs.duplicated("text", keep=False)]
    long_dups = dup_texts[dup_texts["text"].str.split().str.len() >= 3]
    if len(long_dups):
        dup_ids = set(long_dups["doc_id"])
        sub = pdf[pdf["doc_id"].isin(dup_ids)]
        assert (sub["novelty"] == 0).all(), "exact-dup doc claims novel shingles"


def test_pagerank_is_a_distribution_over_dup_nodes(spark):
    """Every edge-participating node gets a positive rank; with no
    dangling nodes (every node in the edge list has out-degree >= 1)
    each iteration conserves total mass, so ranks sum to 1."""
    pdf = registry.QUERIES["graph_pagerank_dups"](spark, TEST_SF_DIR).toPandas()
    if len(pdf) == 0:
        return  # no dup edges at this scale factor
    assert (pdf["rank"] > 0).all()
    assert (pdf["degree"] >= 1).all()
    assert abs(pdf["rank"].sum() - 1.0) < 1e-9
    # hubs outrank leaves: max-degree node is not ranked below average
    hub = pdf.loc[pdf["degree"].idxmax()]
    assert hub["rank"] >= pdf["rank"].mean() - 1e-12


def test_chunk_overlap_reconstructs_documents(spark):
    """Concatenating each chunk's first `stride` tokens (all of the
    last chunk) reproduces the original token stream exactly — no
    token lost or duplicated beyond the declared overlap."""
    from history_collector_spark.queries.curation import (
        _CHUNK_SIZE,
        _CHUNK_STRIDE,
    )

    pdf = registry.QUERIES["curation_chunk_overlap"](spark, TEST_SF_DIR).toPandas()
    docs = (
        spark.read.parquet(f"{TEST_SF_DIR}/documents.parquet")
        .select("doc_id", "text")
        .toPandas()
        .set_index("doc_id")["text"]
    )
    for doc_id, grp in pdf.groupby("doc_id"):
        grp = grp.sort_values("chunk_idx")
        toks: list[str] = []
        rows = list(grp.itertuples())
        for i, r in enumerate(rows):
            ctoks = r.chunk_text.split(" ") if r.chunk_text else [""]
            assert r.n_tokens == len(ctoks) <= _CHUNK_SIZE
            if i < len(rows) - 1:
                toks.extend(ctoks[:_CHUNK_STRIDE])
            else:
                toks.extend(ctoks)
        orig = docs[doc_id].split(" ") if docs[doc_id] else [""]
        # documents tokenize on \s+; the corpus is single-space separated
        assert toks == orig, f"doc {doc_id}: chunk reconstruction mismatch"


def test_cluster_representative_is_best_member(spark):
    """The representative belongs to its cluster and no member of the
    same cluster has strictly higher quality (ties break to lowest id);
    n_members sums to the full corpus."""
    reps = registry.QUERIES["dedup_cluster_representative"](
        spark, TEST_SF_DIR
    ).toPandas()
    clusters = registry.QUERIES["dedup_clusters"](spark, TEST_SF_DIR).toPandas()
    from history_collector_spark.queries.text import with_quality

    q = (
        with_quality(spark.read.parquet(f"{TEST_SF_DIR}/documents.parquet"))
        .select("doc_id", "quality")
        .toPandas()
        .set_index("doc_id")["quality"]
    )
    members = clusters.groupby("cluster_id")["doc_id"].apply(set)
    assert reps["n_members"].sum() == len(clusters)
    for r in reps.itertuples():
        assert r.rep_doc_id in members[r.cluster_id]
        assert r.n_members == len(members[r.cluster_id])
        for m in members[r.cluster_id]:
            beats = q[m] > r.rep_quality or (
                q[m] == r.rep_quality and m < r.rep_doc_id
            )
            assert not beats, (
                f"cluster {r.cluster_id}: member {m} beats representative"
            )


def test_exact_substring_accounting_and_no_residual_kgrams(spark):
    """dup_token_count equals tokens removed; a cleaned doc never
    retains a K-gram that was duplicated in the ORIGINAL corpus at an
    uncovered position (covered-position removal is exhaustive)."""
    from history_collector_spark.queries.spandedup import K

    pdf = registry.QUERIES["dedup_exact_substring"](
        spark, TEST_SF_DIR
    ).toPandas()
    docs = (
        spark.read.parquet(f"{TEST_SF_DIR}/documents.parquet")
        .select("doc_id", "text")
        .toPandas()
    )
    assert len(pdf) == len(docs)
    merged = pdf.merge(docs, on="doc_id")
    # corpus-wide original K-gram counts
    from collections import Counter

    counts: Counter = Counter()
    for text in merged["text"]:
        toks = text.split()
        for i in range(len(toks) - K + 1):
            counts[" ".join(toks[i : i + K])] += 1
    dup_grams = {g for g, c in counts.items() if c > 1}
    for _, row in merged.iterrows():
        toks = row["text"].split()
        cleaned = row["cleaned_text"].split() if row["cleaned_text"] else []
        assert row["n_tokens"] == len(toks)
        assert row["dup_token_count"] == len(toks) - len(cleaned)
        # every position inside a duplicated gram was removed, so the
        # kept tokens are exactly the uncovered ones in original order
        covered = set()
        for i in range(len(toks) - K + 1):
            if " ".join(toks[i : i + K]) in dup_grams:
                covered.update(range(i, i + K))
        expect = [t for i, t in enumerate(toks) if i not in covered]
        assert cleaned == expect


def test_exact_segments_keeps_globally_first_occurrence(spark):
    """Each distinct segment survives exactly once corpus-wide, at its
    lowest (doc_id, seg_idx); per-doc counts reconcile."""
    from history_collector_spark.queries.spandedup import SEG

    pdf = registry.QUERIES["dedup_exact_segments"](
        spark, TEST_SF_DIR
    ).toPandas()
    docs = (
        spark.read.parquet(f"{TEST_SF_DIR}/documents.parquet")
        .select("doc_id", "text")
        .toPandas()
    )
    first_owner: dict[str, tuple[int, int]] = {}
    for _, row in docs.sort_values("doc_id").iterrows():
        toks = row["text"].split()
        for s in range((len(toks) + SEG - 1) // SEG):
            seg = " ".join(toks[s * SEG : (s + 1) * SEG])
            first_owner.setdefault(seg, (row["doc_id"], s))
    by_doc = pdf.set_index("doc_id")
    for _, row in docs.iterrows():
        toks = row["text"].split()
        n_segs = (len(toks) + SEG - 1) // SEG
        kept = [
            " ".join(toks[s * SEG : (s + 1) * SEG])
            for s in range(n_segs)
            if first_owner[" ".join(toks[s * SEG : (s + 1) * SEG])]
            == (row["doc_id"], s)
        ]
        got = by_doc.loc[row["doc_id"]]
        assert got["n_segments"] == n_segs
        assert got["kept_segments"] == len(kept)
        assert got["cleaned_text"] == " ".join(kept)


def test_kmeans_step_partitions_corpus_and_wss_nonnegative(spark):
    """Cluster sizes sum to the corpus; every seed claims itself
    (distance 0), so all K clusters are non-empty; WSS >= 0."""
    from history_collector_spark.queries.clustering import KM_K

    pdf = registry.QUERIES["cluster_kmeans_step"](spark, TEST_SF_DIR).toPandas()
    n = spark.read.parquet(f"{TEST_SF_DIR}/embeddings.parquet").count()
    assert pdf["n_members"].sum() == n
    assert len(pdf) == KM_K
    assert (pdf["wss"] >= 0).all()


def test_random_projection_preserves_scaled_dot_sign_structure(spark):
    """Projection is linear: proj(v) computed in numpy with the same
    md5-derived +-1 matrix matches the query output exactly."""
    import hashlib

    import numpy as np

    from history_collector_spark.queries.clustering import EMB_DIM, RP_DIMS

    pdf = registry.QUERIES["embedding_random_projection"](
        spark, TEST_SF_DIR
    ).toPandas()
    emb = (
        spark.read.parquet(f"{TEST_SF_DIR}/embeddings.parquet")
        .select("vec_id", "embedding")
        .toPandas()
        .set_index("vec_id")
    )
    mat = np.array(
        [
            [
                1.0
                if int(
                    hashlib.md5(f"rp:{p}#{i}".encode()).hexdigest()[:8], 16
                )
                % 2
                == 1
                else -1.0
                for i in range(1, EMB_DIM + 1)
            ]
            for p in range(RP_DIMS)
        ]
    )
    # scalar-only shape: one row per (vec_id, plane p)
    assert sorted(pdf.columns) == ["label", "p", "proj", "vec_id"]
    assert set(pdf["p"].unique()) == set(range(RP_DIMS))
    for _, row in pdf.head(50 * RP_DIMS).iterrows():
        v = np.asarray(emb.loc[row["vec_id"], "embedding"], dtype=np.float64)
        np.testing.assert_allclose(
            row["proj"], mat[int(row["p"])] @ v, rtol=1e-9
        )


def test_bpe_merge_step_counts_match_bruteforce(spark):
    """The winning pair's count equals a brute-force corpus scan, and
    ranks are a deterministic dense 1..20."""
    from collections import Counter

    pdf = registry.QUERIES["bpe_merge_step"](spark, TEST_SF_DIR).toPandas()
    docs = (
        spark.read.parquet(f"{TEST_SF_DIR}/documents.parquet")
        .select("text")
        .toPandas()
    )
    counts: Counter = Counter()
    for text in docs["text"]:
        for w in text.split():
            for a, b in zip(w, w[1:]):
                counts[(a, b)] += 1
    assert list(pdf["rank"]) != []
    assert sorted(pdf["rank"]) == list(range(1, len(pdf) + 1))
    for _, row in pdf.iterrows():
        assert counts[(row["a"], row["b"])] == row["pair_count"]


def test_global_ids_are_a_contiguous_permutation(spark):
    """global_id is exactly 1..N, unique, and ordered by (source,
    doc_id) — the two-phase form must be indistinguishable from the
    banned global-sort row_number."""
    pdf = registry.QUERIES["assign_global_ids"](spark, TEST_SF_DIR).toPandas()
    n = len(pdf)
    assert sorted(pdf["global_id"]) == list(range(1, n + 1))
    ordered = pdf.sort_values(["source", "doc_id"])["global_id"].tolist()
    assert ordered == list(range(1, n + 1))


def test_bpe_encode_matches_pure_python_pipeline(spark):
    """End-to-end check of train+apply: an independent pure-Python BPE
    (same tie rules) over the same corpus must reproduce every doc's
    subword count exactly; merges never split words (so subword counts
    per word are in [1, len(word)]) and encoding with 0 merges is
    character count."""
    from collections import Counter

    from history_collector_spark.queries.bpe import (
        _learn_merges,
        encode_word,
    )

    pdf = registry.QUERIES["bpe_encode_corpus"](spark, TEST_SF_DIR).toPandas()
    docs = (
        spark.read.parquet(f"{TEST_SF_DIR}/documents.parquet")
        .select("doc_id", "text")
        .toPandas()
    )
    wc: Counter = Counter()
    for text in docs["text"]:
        for w in text.split():
            if w:
                wc[w] += 1
    merges = _learn_merges(sorted(wc.items()))
    ranks = {p: i for i, p in enumerate(merges)}
    enc_cache = {w: len(encode_word(w, ranks)) for w in wc}
    got = pdf.set_index("doc_id")
    for _, row in docs.iterrows():
        ws = [w for w in row["text"].split() if w]
        expect_words = len(ws)
        expect_sub = sum(enc_cache[w] for w in ws)
        assert got.loc[row["doc_id"], "n_words"] == expect_words
        assert got.loc[row["doc_id"], "n_subwords"] == expect_sub
    for w, n in enc_cache.items():
        assert 1 <= n <= len(w)


def test_ridge_probe_stats_solve_matches_numpy(spark):
    """The flattened sufficient statistics reassemble into XtX / Xty
    that match a direct numpy computation, and the ridge solve on them
    equals numpy's lstsq-style solution."""
    import numpy as np

    pdf = registry.QUERIES["ml_ridge_probe_stats"](
        spark, TEST_SF_DIR
    ).toPandas()
    assert len(pdf) == 20
    xtx = np.zeros((4, 4))
    xty = np.zeros(4)
    for _, r in pdf.iterrows():
        if r["j"] == 0:
            xty[int(r["i"])] = r["v"]
        else:
            xtx[int(r["i"]), int(r["j"]) - 1] = r["v"]

    docs = (
        spark.read.parquet(f"{TEST_SF_DIR}/documents.parquet")
        .select("text", "lang")
        .toPandas()
    )
    stop = {"the", "a", "of", "and", "to", "in"}
    X, y = [], []
    for _, row in docs.iterrows():
        toks = row["text"].split()
        lt = row["text"].lower().split()
        X.append(
            [
                1.0,
                float(len(toks)),
                sum(1 for t in lt if t in stop) / len(toks),
                float(len(row["text"])),
            ]
        )
        y.append(1.0 if row["lang"] == "en" else 0.0)
    X = np.array(X)
    y = np.array(y)
    np.testing.assert_allclose(xtx, X.T @ X, rtol=1e-9)
    np.testing.assert_allclose(xty, X.T @ y, rtol=1e-9)
    lam = 1e-3
    beta_spark = np.linalg.solve(xtx + lam * np.eye(4), xty)
    beta_np = np.linalg.solve(X.T @ X + lam * np.eye(4), X.T @ y)
    np.testing.assert_allclose(beta_spark, beta_np, rtol=1e-8)


def test_langid_confusion_mass_and_diagonal(spark):
    """Confusion counts total the corpus, and per-class recall is
    derivable (diagonal / row sum in [0, 1])."""
    pdf = registry.QUERIES["text_langid_confusion"](
        spark, TEST_SF_DIR
    ).toPandas()
    n_docs = spark.read.parquet(f"{TEST_SF_DIR}/documents.parquet").count()
    assert pdf["n"].sum() == n_docs
    for lab, grp in pdf.groupby("labeled"):
        diag = grp.loc[grp["predicted"] == lab, "n"].sum()
        assert 0 <= diag <= grp["n"].sum()


def test_edit_distance_refuses_pathological_duplication(spark, monkeypatch):
    """The O(pairs x len^2) budget guard trips when the collision-pair
    count times squared average length exceeds the budget."""
    import pytest as _pytest

    from history_collector_spark.queries import dedup as d

    monkeypatch.setattr(d, "EDIT_MAX_CELLS", 1.0)
    with _pytest.raises(ValueError, match="budget"):
        d.dedup_edit_distance(spark, TEST_SF_DIR)


# ---------------------------------------------------------------------------
# Timeseries-family laws (queries/timeseries.py) on hand-built edges.
# ---------------------------------------------------------------------------


def test_debounce_threshold_is_strict_and_per_type(spark, tmp_path):
    """A repeat at EXACTLY 5:00.000000 after its predecessor is dropped
    (the rule is strictly greater); one microsecond later survives; and
    events of a different type never debounce each other."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    m5 = dt.timedelta(minutes=5)
    us = dt.timedelta(microseconds=1)
    rows = [
        (0, base, 1, "view", 1.0, "{}"),
        (1, base + m5, 1, "view", 1.0, "{}"),        # exactly 5:00 -> drop
        (2, base + 2 * m5 + us, 1, "view", 1.0, "{}"),  # 5:00.000001 after #1 -> keep
        (3, base + us, 1, "click", 1.0, "{}"),       # other type -> keep
    ]
    sf = _write_events(rows, str(tmp_path))
    kept = set(
        registry.QUERIES["event_debounce"](spark, sf).toPandas()["event_id"]
    )
    assert kept == {0, 2, 3}


def test_streaks_split_only_on_missing_days(spark, tmp_path):
    """Days {1,2,3,5,6} -> streaks of 3 and 2; multiple events on one day
    count once; the longest/total/segment counts all agree."""
    import datetime as dt

    d = lambda n: dt.datetime(2024, 1, n, 12, 0, 0)
    rows = [
        (0, d(1), 1, "view", 1.0, "{}"),
        (1, d(1) + dt.timedelta(hours=5), 1, "click", 1.0, "{}"),  # same day
        (2, d(2), 1, "view", 1.0, "{}"),
        (3, d(3), 1, "view", 1.0, "{}"),
        (4, d(5), 1, "view", 1.0, "{}"),
        (5, d(6), 1, "view", 1.0, "{}"),
        (6, d(10), 2, "view", 1.0, "{}"),
    ]
    sf = _write_events(rows, str(tmp_path))
    pdf = (
        registry.QUERIES["user_active_streaks"](spark, sf)
        .toPandas()
        .set_index("user_id")
    )
    assert pdf.loc[1, "longest_streak"] == 3
    assert pdf.loc[1, "n_streaks"] == 2
    assert pdf.loc[1, "n_active_days"] == 5
    assert pdf.loc[2, "longest_streak"] == 1


def test_forward_fill_carries_last_reading_and_leading_nulls_stay(spark, tmp_path):
    """Rows before the first reading stay null; afterwards every row sees
    the most recent reading (props.k % 5 == 0 emits one)."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    s = lambda n: base + dt.timedelta(seconds=n)
    rows = [
        (0, s(0), 1, "view", 9.0, '{"k": 1}'),    # no reading
        (1, s(1), 1, "view", 10.0, '{"k": 5}'),   # reading 10.0
        (2, s(2), 1, "view", 11.0, '{"k": 2}'),   # carries 10.0
        (3, s(3), 1, "view", 12.0, '{"k": 10}'),  # reading 12.0
        (4, s(4), 1, "view", 13.0, '{"k": 3}'),   # carries 12.0
    ]
    sf = _write_events(rows, str(tmp_path))
    pdf = (
        registry.QUERIES["event_forward_fill"](spark, sf)
        .toPandas()
        .set_index("event_id")
        .sort_index()
    )
    import pandas as pd

    assert pd.isna(pdf.loc[0, "filled"])
    assert list(pdf.loc[1:4, "filled"]) == [10.0, 10.0, 12.0, 12.0]


def test_time_weighted_avg_hand_case(spark, tmp_path):
    """value 10 held for 30s then 20 held for 10s -> TWA 12.5 over a
    40-second span; the terminal event contributes no weight."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    s = lambda n: base + dt.timedelta(seconds=n)
    rows = [
        (0, s(0), 1, "view", 10.0, "{}"),
        (1, s(30), 1, "view", 20.0, "{}"),
        (2, s(40), 1, "view", 99.0, "{}"),  # terminal: value never weighted
    ]
    sf = _write_events(rows, str(tmp_path))
    pdf = registry.QUERIES["time_weighted_avg"](spark, sf).toPandas()
    assert len(pdf) == 1
    assert pdf.loc[0, "twa_value"] == (10.0 * 30 + 20.0 * 10) / 40
    assert pdf.loc[0, "span_us"] == 40_000_000


def test_ohlc_open_close_follow_arrival_order_on_ts_ties(spark, tmp_path):
    """Two ticks sharing one timestamp: open/close resolve by event_id
    (arrival order), high/low by value."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1, 9, 30, 0)
    rows = [
        (10, base, 1, "trade", 5.0, "{}"),
        (11, base, 1, "trade", 1.0, "{}"),   # same ts, later arrival
        (12, base + dt.timedelta(minutes=1), 1, "trade", 3.0, "{}"),
    ]
    sf = _write_events(rows, str(tmp_path))
    pdf = registry.QUERIES["event_ohlc_bars"](spark, sf).toPandas()
    assert len(pdf) == 1
    r = pdf.iloc[0]
    assert r["open"] == 5.0 and r["close"] == 3.0
    assert r["high"] == 5.0 and r["low"] == 1.0
    assert r["n_ticks"] == 3


# ---------------------------------------------------------------------------
# Wave: interval coverage / rate cap / EWMA / heavy hitters / PMI /
# triangles — hand-built edge cases.
# ---------------------------------------------------------------------------


def _write_docs(docs, tmpdir):
    """Write a synthetic documents.parquet; docs = [(doc_id, text, lang,
    source)]. Returns tmpdir as a sf_dir."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pa.table(
        {
            "doc_id": pa.array([d[0] for d in docs], pa.int64()),
            "text": pa.array([d[1] for d in docs], pa.string()),
            "lang": pa.array([d[2] for d in docs], pa.string()),
            "source": pa.array([d[3] for d in docs], pa.string()),
            "n_chars": pa.array([len(d[1]) for d in docs], pa.int64()),
        }
    )
    pq.write_table(tbl, os.path.join(tmpdir, "documents.parquet"))
    return tmpdir


def test_interval_coverage_merges_touching_and_zero_length(spark, tmp_path):
    """[0,10]+[5,20] overlap-merge, [20,30] TOUCHES (start == running max)
    and merges, [31,40] starts a new island; a value=0 interval covers
    nothing but still counts as one interval."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    s = lambda n: base + dt.timedelta(seconds=n)
    rows = [
        (0, s(0), 1, "view", 10.0, "{}"),
        (1, s(5), 1, "view", 15.0, "{}"),
        (2, s(20), 1, "view", 10.0, "{}"),
        (3, s(31), 1, "view", 9.0, "{}"),
        (4, s(0), 2, "view", 0.0, "{}"),
    ]
    sf = _write_events(rows, str(tmp_path))
    pdf = (
        registry.QUERIES["interval_coverage"](spark, sf)
        .toPandas()
        .set_index("user_id")
    )
    assert pdf.loc[1, "n_intervals"] == 2
    assert pdf.loc[1, "covered_us"] == 39_000_000
    assert pdf.loc[1, "longest_covered_us"] == 30_000_000
    assert pdf.loc[2, "n_intervals"] == 1
    assert pdf.loc[2, "covered_us"] == 0


def test_rate_cap_keeps_first_three_per_day_breaking_ts_ties_by_id(
    spark, tmp_path
):
    import datetime as dt

    d1 = dt.datetime(2024, 1, 1, 8, 0, 0)
    d2 = dt.datetime(2024, 1, 2, 8, 0, 0)
    rows = [
        (0, d1, 1, "view", 1.0, "{}"),
        (1, d1, 1, "view", 1.0, "{}"),  # same ts: id breaks the tie
        (2, d1 + dt.timedelta(seconds=1), 1, "view", 1.0, "{}"),
        (3, d1 + dt.timedelta(seconds=2), 1, "view", 1.0, "{}"),  # 4th: drop
        (4, d2, 1, "view", 1.0, "{}"),  # next day: cap resets
    ]
    sf = _write_events(rows, str(tmp_path))
    pdf = registry.QUERIES["event_rate_cap"](spark, sf).toPandas()
    assert set(pdf["event_id"]) == {0, 1, 2, 4}
    assert pdf.set_index("event_id").loc[4, "rn"] == 1


def test_ewma_matches_hand_recursion(spark, tmp_path):
    """alpha=0.2, x=[10,20,30] -> y=[10, 12, 15.6]; a second user's
    series is smoothed independently."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    s = lambda n: base + dt.timedelta(seconds=n)
    rows = [
        (0, s(0), 1, "view", 10.0, "{}"),
        (1, s(1), 1, "view", 20.0, "{}"),
        (2, s(2), 1, "view", 30.0, "{}"),
        (3, s(0), 2, "view", 7.0, "{}"),
    ]
    sf = _write_events(rows, str(tmp_path))
    pdf = (
        registry.QUERIES["ewma_smoothing"](spark, sf)
        .toPandas()
        .set_index("event_id")
        .sort_index()
    )
    assert list(pdf.loc[[0, 1, 2], "ewma"].round(10)) == [10.0, 12.0, 15.6]
    assert pdf.loc[3, "ewma"] == 7.0


def test_heavy_hitters_survive_misra_gries_compression(spark, tmp_path):
    """Vocabulary (101 tokens) far exceeds the 64-counter summary, so
    decrements DO fire — the true heavy hitter must still come through
    (the MG superset guarantee), and nothing below threshold may."""
    filler = " ".join(f"w{i}" for i in range(100))  # 100 singletons
    docs = [
        (0, "hot " * 50, "en", "s1"),
        (1, filler, "en", "s2"),
    ]
    sf = _write_docs(docs, str(tmp_path))
    pdf = registry.QUERIES["heavy_hitter_tokens"](spark, sf).toPandas()
    # total 150 tokens, threshold 150/30 = 5: only 'hot' (50) qualifies
    assert list(pdf["tok"]) == ["hot"]
    assert pdf.loc[0, "n_occurrences"] == 50
    assert abs(pdf.loc[0, "share"] - 50 / 150) < 1e-12


def test_pmi_positive_for_perfect_collocation(spark, tmp_path):
    """'p q' always adjacent, p/q appearing nowhere else -> PMI ln(16)
    with nb=5, nu=20; sub-threshold pairs are excluded."""
    import math

    docs = [(i, "p q", "en", "s") for i in range(5)] + [
        (10 + i, "r", "en", "s") for i in range(10)
    ]
    sf = _write_docs(docs, str(tmp_path))
    pdf = registry.QUERIES["text_pmi_bigrams"](spark, sf).toPandas()
    assert len(pdf) == 1
    r = pdf.iloc[0]
    assert (r["t1"], r["t2"], r["n_pair"]) == ("p", "q", 5)
    assert abs(r["pmi"] - math.log(16)) < 1e-12


def test_triangle_count_finds_clone_clique_once(spark, tmp_path):
    """Three identical docs form one triangle (each node support 1);
    the unrelated doc contributes nothing. Canonical a<b<c enumeration
    must not double-count."""
    clone = "alpha beta gamma delta epsilon zeta"
    docs = [
        (1, clone, "en", "s"),
        (2, clone, "en", "s"),
        (3, clone, "en", "s"),
        (9, "one two three four five six seven", "en", "s"),
    ]
    sf = _write_docs(docs, str(tmp_path))
    pdf = registry.QUERIES["graph_triangle_count"](spark, sf).toPandas()
    assert sorted(pdf["doc_id"]) == [1, 2, 3]
    assert set(pdf["n_triangles"]) == {1}


# ---------------------------------------------------------------------------
# Wave: prefix-filter join / Q13 / rolling bands / digest / co-occurrence.
# ---------------------------------------------------------------------------


def test_prefix_filter_finds_boundary_pair_exactly(spark, tmp_path):
    """A pair at EXACTLY tau (trigram jaccard 3/5 = 0.6) must be found
    (inclusive threshold, no LSH luck involved); the unrelated doc
    appears in no pair."""
    docs = [
        (1, "a b c d e f", "en", "s"),
        (2, "a b c d e g", "en", "s"),
        (3, "x y z w", "en", "s"),
    ]
    sf = _write_docs(docs, str(tmp_path))
    pdf = registry.QUERIES["dedup_prefix_filter"](spark, sf).toPandas()
    assert len(pdf) == 1
    r = pdf.iloc[0]
    assert (r["doc_a"], r["doc_b"]) == (1, 2)
    assert abs(r["jaccard"] - 0.6) < 1e-12


def _write_customer_orders(customers, orders, tmpdir):
    """customers = [(custkey, name, nationkey, acctbal, seg)];
    orders = [(okey, custkey, status, total, odate, priority)]."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    ct = pa.table(
        {
            "c_custkey": pa.array([c[0] for c in customers], pa.int64()),
            "c_name": pa.array([c[1] for c in customers], pa.string()),
            "c_nationkey": pa.array([c[2] for c in customers], pa.int32()),
            "c_acctbal": pa.array([c[3] for c in customers], pa.float64()),
            "c_mktsegment": pa.array([c[4] for c in customers], pa.string()),
        }
    )
    ot = pa.table(
        {
            "o_orderkey": pa.array([o[0] for o in orders], pa.int64()),
            "o_custkey": pa.array([o[1] for o in orders], pa.int64()),
            "o_orderstatus": pa.array([o[2] for o in orders], pa.string()),
            "o_totalprice": pa.array([o[3] for o in orders], pa.float64()),
            "o_orderdate": pa.array([o[4] for o in orders], pa.timestamp("us")),
            "o_orderpriority": pa.array([o[5] for o in orders], pa.string()),
        }
    )
    pq.write_table(ct, os.path.join(tmpdir, "customer.parquet"))
    pq.write_table(ot, os.path.join(tmpdir, "orders.parquet"))
    return tmpdir


def test_q13_keeps_customers_whose_only_orders_are_filtered(spark, tmp_path):
    """The priority predicate lives in the OUTER join's ON clause: a
    customer with only urgent orders must appear at c_count=0, not
    vanish (the WHERE-clause trap)."""
    import datetime as dt

    d = dt.datetime(2024, 1, 1)
    sf = _write_customer_orders(
        [(1, "a", 0, 0.0, "m"), (2, "b", 0, 0.0, "m")],
        [
            (10, 1, "O", 1.0, d, "3-MEDIUM"),
            (11, 1, "O", 1.0, d, "3-MEDIUM"),
            (12, 1, "O", 1.0, d, "1-URGENT"),
            (13, 2, "O", 1.0, d, "1-URGENT"),
        ],
        str(tmp_path),
    )
    pdf = (
        registry.QUERIES["customer_order_distribution"](spark, sf)
        .toPandas()
        .set_index("c_count")
    )
    assert pdf.loc[2, "custdist"] == 1
    assert pdf.loc[0, "custdist"] == 1


def test_rolling_bands_flags_spike_after_constant_run(spark, tmp_path):
    """11 constant readings then a spike: the spike breaches (std=0,
    any deviation exceeds the band); the constants never do; the first
    two rows are unjudgeable (n_window < 2)."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, base + dt.timedelta(seconds=i), 1, "view", 5.0, "{}")
        for i in range(11)
    ] + [(11, base + dt.timedelta(seconds=11), 1, "view", 50.0, "{}")]
    sf = _write_events(rows, str(tmp_path))
    pdf = registry.QUERIES["rolling_bands"](spark, sf).toPandas()
    assert list(pdf["event_id"]) == [11]
    assert pdf.iloc[0]["roll_mean"] == 5.0 and pdf.iloc[0]["roll_std"] == 0.0


def test_content_digest_is_order_independent_and_change_sensitive(
    spark, tmp_path
):
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    def write_li(rows, d):
        os.makedirs(d, exist_ok=True)
        tbl = pa.table(
            {
                "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
                "l_partkey": pa.array([r[1] for r in rows], pa.int64()),
                "l_suppkey": pa.array([r[2] for r in rows], pa.int64()),
                "l_linenumber": pa.array([r[3] for r in rows], pa.int32()),
                "l_quantity": pa.array([1.0] * len(rows), pa.float64()),
                "l_extendedprice": pa.array([1.0] * len(rows), pa.float64()),
                "l_discount": pa.array([0.0] * len(rows), pa.float64()),
                "l_tax": pa.array([0.0] * len(rows), pa.float64()),
                "l_returnflag": pa.array([r[4] for r in rows], pa.string()),
                "l_linestatus": pa.array([r[5] for r in rows], pa.string()),
                "l_shipdate": pa.array([r[6] for r in rows], pa.timestamp("us")),
            }
        )
        pq.write_table(tbl, os.path.join(d, "lineitem.parquet"))
        return d

    d = dt.datetime(2024, 3, 1)
    rows = [
        (1, 10, 100, 1, "N", "O", d),
        (2, 20, 200, 1, "R", "F", d),
        (3, 30, 300, 2, "A", "F", d),
    ]
    q = registry.QUERIES["table_content_digest"]
    a = q(spark, write_li(rows, str(tmp_path / "a"))).toPandas().iloc[0]
    b = (
        q(spark, write_li(rows[::-1], str(tmp_path / "b")))
        .toPandas()
        .iloc[0]
    )
    assert (a["digest_sum"], a["digest_xor"]) == (
        b["digest_sum"],
        b["digest_xor"],
    )
    mutated = [rows[0], (2, 20, 200, 1, "N", "F", d), rows[2]]
    c = q(spark, write_li(mutated, str(tmp_path / "c"))).toPandas().iloc[0]
    assert (a["digest_sum"], a["digest_xor"]) != (
        c["digest_sum"],
        c["digest_xor"],
    )


def test_cooccurrence_counts_and_cosine_hand_case(spark, tmp_path):
    """users: 1->{a,b,c}, 2->{a,b}, 3->{a} (with a repeat that must not
    double-count) -> (a,b)=2 users, cosine 2/sqrt(6)."""
    import datetime as dt
    import math

    base = dt.datetime(2024, 1, 1)
    s = lambda n: base + dt.timedelta(seconds=n)
    rows = [
        (0, s(0), 1, "a", 1.0, "{}"),
        (1, s(1), 1, "b", 1.0, "{}"),
        (2, s(2), 1, "c", 1.0, "{}"),
        (3, s(3), 2, "a", 1.0, "{}"),
        (4, s(4), 2, "b", 1.0, "{}"),
        (5, s(5), 2, "a", 1.0, "{}"),  # repeat: distinct-projected away
        (6, s(6), 3, "a", 1.0, "{}"),
    ]
    sf = _write_events(rows, str(tmp_path))
    pdf = (
        registry.QUERIES["item_cooccurrence"](spark, sf)
        .toPandas()
        .set_index(["t1", "t2"])
    )
    assert pdf.loc[("a", "b"), "n_users"] == 2
    assert abs(pdf.loc[("a", "b"), "cosine"] - 2 / math.sqrt(6)) < 1e-12
    assert pdf.loc[("a", "c"), "n_users"] == 1
    assert pdf.loc[("b", "c"), "n_users"] == 1


# ---------------------------------------------------------------------------
# Wave: silhouette / temporal leakage / contribution shares.
# ---------------------------------------------------------------------------


def test_silhouette_hand_geometry(spark, tmp_path):
    """Two well-separated 1-D clusters embedded in 64-dim: silhouettes
    follow (b-a)/max(a,b) exactly against hand centroids."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    def vec(x):
        return [float(x)] + [0.0] * 63

    rows = [(0, vec(0), 0), (1, vec(2), 0), (2, vec(10), 1), (3, vec(12), 1)]
    tbl = pa.table(
        {
            "vec_id": pa.array([r[0] for r in rows], pa.int64()),
            "embedding": pa.array(
                [r[1] for r in rows], pa.list_(pa.float32())
            ),
            "label": pa.array([r[2] for r in rows], pa.int32()),
        }
    )
    pq.write_table(tbl, os.path.join(str(tmp_path), "embeddings.parquet"))
    pdf = (
        registry.QUERIES["cluster_silhouette"](spark, str(tmp_path))
        .toPandas()
        .set_index("label")
    )
    # centroids at 1 and 11: s(x=0) = (11-1)/11, s(x=2) = (9-1)/9
    exp0 = (10 / 11 + 8 / 9) / 2
    assert abs(pdf.loc[0, "mean_silhouette"] - exp0) < 1e-12
    assert pdf.loc[0, "n_members"] == 2
    assert abs(pdf.loc[1, "mean_silhouette"] - exp0) < 1e-12  # symmetric


def test_temporal_leakage_counts_straddlers_only(spark, tmp_path):
    """Range 0..100 s -> cutoff at 80 s. user 1 straddles (leaky),
    users 2 and 3 sit on one side each."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    s = lambda n: base + dt.timedelta(seconds=n)
    rows = [
        (0, s(0), 1, "view", 1.0, "{}"),     # train (defines min)
        (1, s(90), 1, "view", 1.0, "{}"),    # test -> user 1 leaky
        (2, s(20), 2, "view", 1.0, "{}"),    # train only
        (3, s(95), 3, "view", 1.0, "{}"),    # test only
        (4, s(100), 4, "view", 1.0, "{}"),   # test (defines max)
    ]
    sf = _write_events(rows, str(tmp_path))
    pdf = registry.QUERIES["temporal_split_leakage"](spark, sf).toPandas()
    r = pdf.set_index("event_type").loc["view"]
    assert (r["n_train"], r["n_test"]) == (2, 3)
    assert (r["n_users"], r["n_leaky_users"]) == (4, 1)


def test_revenue_shares_sum_to_one_and_match_hand_case(spark, tmp_path):
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    d = dt.datetime(2024, 1, 1)
    _write_customer_orders(
        [(1, "a", 0, 0.0, "m"), (2, "b", 1, 0.0, "m"), (3, "c", 2, 0.0, "m")],
        [
            (10, 1, "O", 30.0, d, "3-MEDIUM"),
            (11, 2, "O", 70.0, d, "3-MEDIUM"),
            (12, 3, "O", 100.0, d, "3-MEDIUM"),
        ],
        str(tmp_path),
    )
    nt = pa.table(
        {
            "n_nationkey": pa.array([0, 1, 2], pa.int32()),
            "n_name": pa.array(["N0", "N1", "N2"], pa.string()),
            "n_regionkey": pa.array([0, 0, 1], pa.int32()),
        }
    )
    rt = pa.table(
        {
            "r_regionkey": pa.array([0, 1], pa.int32()),
            "r_name": pa.array(["RA", "RB"], pa.string()),
        }
    )
    pq.write_table(nt, os.path.join(str(tmp_path), "nation.parquet"))
    pq.write_table(rt, os.path.join(str(tmp_path), "region.parquet"))
    pdf = (
        registry.QUERIES["revenue_contribution"](spark, str(tmp_path))
        .toPandas()
        .set_index("n_name")
    )
    assert abs(pdf.loc["N0", "share_of_region"] - 0.3) < 1e-12
    assert abs(pdf.loc["N1", "share_of_region"] - 0.7) < 1e-12
    assert abs(pdf.loc["N2", "share_of_region"] - 1.0) < 1e-12
    assert abs(pdf["share_of_total"].sum() - 1.0) < 1e-12
    assert abs(pdf.loc["N2", "share_of_total"] - 0.5) < 1e-12


# ---------------------------------------------------------------------------
# Wave: recall audit / skew report / attribution.
# ---------------------------------------------------------------------------


def test_recall_is_one_when_index_is_exhaustive(spark, tmp_path):
    """If every vector shares one label, the IVF probe IS brute force,
    so recall@5 must be exactly 1.0 for every query."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.RandomState(7)
    n = 120
    vecs = rng.randn(n, 64).astype("float32")
    tbl = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array(
                [v.tolist() for v in vecs], pa.list_(pa.float32())
            ),
            "label": pa.array([0] * n, pa.int32()),
        }
    )
    pq.write_table(tbl, os.path.join(str(tmp_path), "embeddings.parquet"))
    pdf = registry.QUERIES["ann_recall_audit"](spark, str(tmp_path)).toPandas()
    assert len(pdf) == 2  # queries: vec_id 0 and 100
    assert (pdf["recall"] == 1.0).all()
    assert (pdf["n_matched"] == 5).all()


def test_skew_report_hand_distribution(spark, tmp_path):
    """Keys with counts [1, 1, 2, 8]: max 8, avg 3, skew 8/3, median
    1.5 (linear interpolation between the middle pair)."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for user, cnt in ((1, 1), (2, 1), (3, 2), (4, 8)):
        for i in range(cnt):
            rows.append(
                (eid, base + dt.timedelta(seconds=eid), user, "view", 1.0, "{}")
            )
            eid += 1
    sf = _write_events(rows, str(tmp_path))
    r = registry.QUERIES["key_skew_report"](spark, sf).toPandas().iloc[0]
    assert r["n_keys"] == 4 and r["max_count"] == 8
    assert abs(r["avg_count"] - 3.0) < 1e-12
    assert abs(r["skew_ratio"] - 8 / 3) < 1e-12
    assert abs(r["p50_count"] - 1.5) < 1e-12


def test_attribution_last_click_wins_and_window_is_inclusive(spark, tmp_path):
    """Two clicks before a purchase -> the LATER one sets the latency;
    a purchase exactly 1 h after its click still attributes (<=); a
    click-less purchase and one past the window do not."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    m = lambda n: base + dt.timedelta(minutes=n)
    rows = [
        (0, m(0), 1, "click", 1.0, "{}"),
        (1, m(30), 1, "click", 1.0, "{}"),
        (2, m(45), 1, "purchase", 1.0, "{}"),   # 15 min after click #1
        (3, m(0), 2, "click", 1.0, "{}"),
        (4, m(60), 2, "purchase", 1.0, "{}"),   # exactly 1 h: attributed
        (5, m(0), 3, "purchase", 1.0, "{}"),    # no click ever
        (6, m(0), 4, "click", 1.0, "{}"),
        (7, m(61), 4, "purchase", 1.0, "{}"),   # 1 h + 1 min: not
    ]
    sf = _write_events(rows, str(tmp_path))
    pdf = (
        registry.QUERIES["attribution_last_touch"](spark, sf)
        .toPandas()
        .set_index("event_id")
    )
    assert pdf.loc[2, "attributed"] == 1
    assert pdf.loc[2, "latency_us"] == 15 * 60 * 1_000_000
    assert pdf.loc[4, "attributed"] == 1
    assert pdf.loc[4, "latency_us"] == 3_600_000_000
    assert pdf.loc[5, "attributed"] == 0 and pdf.loc[7, "attributed"] == 0


# ---------------------------------------------------------------------------
# Wave: size histogram / winsorized stats / shipping delay.
# ---------------------------------------------------------------------------


def test_cluster_histogram_counts_clones_and_singletons(spark, tmp_path):
    """3 identical docs + 2 other identical docs + 1 singleton ->
    histogram {3: 1 cluster, 2: 1, 1: 1} and doc mass adds back to 6."""
    a = "alpha beta gamma delta epsilon zeta"
    b = "one two three four five six seven eight"
    docs = [
        (1, a, "en", "s"), (2, a, "en", "s"), (3, a, "en", "s"),
        (4, b, "en", "s"), (5, b, "en", "s"),
        (6, "lonely words drift far apart here", "en", "s"),
    ]
    sf = _write_docs(docs, str(tmp_path))
    pdf = (
        registry.QUERIES["dup_cluster_size_histogram"](spark, sf)
        .toPandas()
        .set_index("cluster_size")
    )
    assert pdf.loc[3, "n_clusters"] == 1
    assert pdf.loc[2, "n_clusters"] == 1
    assert pdf.loc[1, "n_clusters"] == 1
    assert pdf["n_docs"].sum() == 6


def test_winsorized_mean_ignores_single_outlier(spark, tmp_path):
    """19 values of 10 and one of 1000: P95 interpolates just above 10,
    so the winsorized mean stays ~10 while the raw mean is ~59."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, base + dt.timedelta(seconds=i), 1, "view",
         10.0 if i < 19 else 1000.0, "{}")
        for i in range(20)
    ]
    sf = _write_events(rows, str(tmp_path))
    r = (
        registry.QUERIES["robust_stats_winsorized"](spark, sf)
        .toPandas()
        .iloc[0]
    )
    # P95 by linear interpolation over 20 pts: index 0.95*19 = 18.05
    # -> 10 + 0.05*(1000-10) = 59.5; clamped mean = (19*10 + 59.5)/20
    assert abs(r["win_mean"] - (19 * 10 + 59.5) / 20) < 1e-9
    assert r["n"] == 20


def test_shipping_delay_hand_percentiles(spark, tmp_path):
    """Delays [1, 2, 3, 10] for one priority: avg 4, p50 2.5 by linear
    interpolation."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    od = dt.datetime(2024, 1, 1)
    _write_customer_orders(
        [(1, "a", 0, 0.0, "m")],
        [(k, 1, "O", 1.0, od, "3-MEDIUM") for k in (10, 11, 12, 13)],
        str(tmp_path),
    )
    rows = [(10, 1), (11, 2), (12, 3), (13, 10)]
    tbl = pa.table(
        {
            "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
            "l_partkey": pa.array([1] * 4, pa.int64()),
            "l_suppkey": pa.array([1] * 4, pa.int64()),
            "l_linenumber": pa.array([1] * 4, pa.int32()),
            "l_quantity": pa.array([1.0] * 4, pa.float64()),
            "l_extendedprice": pa.array([1.0] * 4, pa.float64()),
            "l_discount": pa.array([0.0] * 4, pa.float64()),
            "l_tax": pa.array([0.0] * 4, pa.float64()),
            "l_returnflag": pa.array(["N"] * 4, pa.string()),
            "l_linestatus": pa.array(["O"] * 4, pa.string()),
            "l_shipdate": pa.array(
                [od + dt.timedelta(days=r[1]) for r in rows],
                pa.timestamp("us"),
            ),
        }
    )
    pq.write_table(tbl, os.path.join(str(tmp_path), "lineitem.parquet"))
    r = (
        registry.QUERIES["shipping_delay_stats"](spark, str(tmp_path))
        .toPandas()
        .iloc[0]
    )
    assert r["n_items"] == 4
    assert abs(r["avg_delay"] - 4.0) < 1e-12
    assert abs(r["p50_delay"] - 2.5) < 1e-12


# ---------------------------------------------------------------------------
# Wave: audio energy / dedup rates / MAD anomalies.
# ---------------------------------------------------------------------------


def test_audio_energy_hand_pcm_and_frame_budget(spark, tmp_path):
    """'AB' repeated decodes to the constant sample 0x4241: RMS equals
    the sample and peak equals it; a long blob is capped at 8 windows;
    a short blob yields none."""
    long_doc = "AB" * (64 * 12)  # 12 full windows -> capped at 8
    docs = [
        (1, long_doc, "en", "s"),
        (2, "AB" * 63, "en", "s"),  # 63 samples < one window
    ]
    sf = _write_docs(docs, str(tmp_path))
    pdf = registry.QUERIES["multimodal_audio_energy"](spark, sf).toPandas()
    assert set(pdf["doc_id"]) == {1}
    assert len(pdf) == 8  # frame budget
    sample = ord("A") + 256 * ord("B")
    assert (pdf["peak"] == sample).all()
    assert (abs(pdf["rms"] - sample) < 1e-9).all()


def test_dedup_rates_hand_corpus(spark, tmp_path):
    """Source s1: 3 docs, 2 byte-identical -> exact rate 1/3 and all
    clones near-dup; source s2: 1 unique doc, zero rates."""
    a = "alpha beta gamma delta epsilon zeta"
    docs = [
        (1, a, "en", "s1"),
        (2, a, "en", "s1"),
        (3, "completely different words entirely here now", "en", "s1"),
        (4, "unrelated second source text goes here", "en", "s2"),
    ]
    sf = _write_docs(docs, str(tmp_path))
    pdf = (
        registry.QUERIES["dedup_rates_by_source"](spark, sf)
        .toPandas()
        .set_index("source")
    )
    assert pdf.loc["s1", "n_docs"] == 3
    assert pdf.loc["s1", "n_unique_exact"] == 2
    assert abs(pdf.loc["s1", "exact_dup_rate"] - 1 / 3) < 1e-12
    assert pdf.loc["s1", "n_near_dup_docs"] == 2
    assert pdf.loc["s2", "n_near_dup_docs"] == 0
    assert pdf.loc["s2", "exact_dup_rate"] == 0.0


def test_mad_flags_outlier_zscore_misses(spark, tmp_path):
    """With half the points at 10 and half at 12 plus one huge spike,
    MAD stays tiny and flags the spike; the spike itself cannot
    inflate the threshold (the robustness property)."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    vals = [10.0, 12.0] * 10 + [10_000.0]
    rows = [
        (i, base + dt.timedelta(seconds=i), 1, "view", v, "{}")
        for i, v in enumerate(vals)
    ]
    sf = _write_events(rows, str(tmp_path))
    r = (
        registry.QUERIES["event_anomaly_mad"](spark, sf).toPandas().iloc[0]
    )
    assert r["med"] == 12.0  # 11th of 21 sorted values
    assert abs(r["mad"] - 2.0) < 1e-12
    assert r["n_outliers"] == 1


# ---------------------------------------------------------------------------
# Wave: JSON schema profile / Zipf fit.
# ---------------------------------------------------------------------------


def test_props_profile_discovers_mixed_keys_and_types(spark, tmp_path):
    """Dynamic key discovery: three different key sets across rows,
    integer detection excludes strings and floats, range covers
    negatives."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = [
        (0, base, 1, "view", 1.0, '{"a": 5, "b": "x"}'),
        (1, base, 1, "view", 1.0, '{"a": -7}'),
        (2, base, 1, "view", 1.0, '{"c": 1.5}'),
    ]
    sf = _write_events(rows, str(tmp_path))
    pdf = (
        registry.QUERIES["props_schema_profile"](spark, sf)
        .toPandas()
        .set_index("key")
    )
    assert pdf.loc["a", "n_present"] == 2
    assert pdf.loc["a", "n_int_values"] == 2
    assert pdf.loc["a", "min_int"] == -7 and pdf.loc["a", "max_int"] == 5
    assert pdf.loc["b", "n_int_values"] == 0
    assert pdf.loc["c", "n_int_values"] == 0  # 1.5 is not an integer


def test_zipf_slope_hand_regression(spark, tmp_path):
    """Frequencies 4/2/1 over ranks 1/2/3: slope of log-log least
    squares computed by hand (numpy polyfit agreement)."""
    import numpy as np

    docs = [(0, "a a a a b b c", "en", "s")]
    sf = _write_docs(docs, str(tmp_path))
    r = registry.QUERIES["text_zipf_fit"](spark, sf).toPandas().iloc[0]
    x = np.log([1.0, 2.0, 3.0])
    y = np.log([4.0, 2.0, 1.0])
    slope, intercept = np.polyfit(x, y, 1)
    assert r["n_types"] == 3
    assert abs(r["zipf_slope"] - slope) < 1e-9
    assert abs(r["zipf_intercept"] - intercept) < 1e-9


# ---------------------------------------------------------------------------
# Wave: market basket / rolling median.
# ---------------------------------------------------------------------------


def test_market_basket_counts_and_lift_hand_case(spark, tmp_path):
    """Baskets {A,B}, {A,B}, {A,C}, {B}: with thresholds lowered via
    the real constants being generous, verify against a hand corpus
    where A,B clear the item threshold by construction and pair (A,B)
    has support 2 and lift 8/6."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    # item support threshold is 30 -> replicate the basket pattern 30x
    # across distinct orders so A and B qualify and (A,B) support = 30
    rows = []
    for i in range(30):
        base = i * 10
        rows += [(base + 1, 100), (base + 1, 200)]   # {A, B}
        rows += [(base + 2, 100), (base + 2, 300)]   # {A, C}
        rows += [(base + 3, 200)]                     # {B}
    d = dt.datetime(2024, 1, 1)
    tbl = pa.table(
        {
            "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
            "l_partkey": pa.array([r[1] for r in rows], pa.int64()),
            "l_suppkey": pa.array([1] * len(rows), pa.int64()),
            "l_linenumber": pa.array([1] * len(rows), pa.int32()),
            "l_quantity": pa.array([1.0] * len(rows), pa.float64()),
            "l_extendedprice": pa.array([1.0] * len(rows), pa.float64()),
            "l_discount": pa.array([0.0] * len(rows), pa.float64()),
            "l_tax": pa.array([0.0] * len(rows), pa.float64()),
            "l_returnflag": pa.array(["N"] * len(rows), pa.string()),
            "l_linestatus": pa.array(["O"] * len(rows), pa.string()),
            "l_shipdate": pa.array([d] * len(rows), pa.timestamp("us")),
        }
    )
    pq.write_table(tbl, os.path.join(str(tmp_path), "lineitem.parquet"))
    pdf = (
        registry.QUERIES["orders_market_basket"](spark, str(tmp_path))
        .toPandas()
        .set_index(["p1", "p2"])
    )
    # items: A support 60, B support 60, C support 30; 90 orders total
    # pairs among frequent: (100,200) 30, (100,300) 30
    assert pdf.loc[(100, 200), "support"] == 30
    assert abs(pdf.loc[(100, 200), "lift"] - (30 * 90) / (60 * 60)) < 1e-12
    assert abs(pdf.loc[(100, 300), "lift"] - (30 * 90) / (60 * 30)) < 1e-12


def test_rolling_median_null_until_full_and_robust_to_spike(spark, tmp_path):
    import datetime as dt

    import pandas as pd

    base = dt.datetime(2024, 1, 1)
    vals = [10.0, 10.0, 10.0, 10.0, 999.0, 10.0]
    rows = [
        (i, base + dt.timedelta(seconds=i), 1, "view", v, "{}")
        for i, v in enumerate(vals)
    ]
    sf = _write_events(rows, str(tmp_path))
    pdf = (
        registry.QUERIES["rolling_median_smooth"](spark, sf)
        .toPandas()
        .set_index("event_id")
        .sort_index()
    )
    assert pd.isna(pdf.loc[0:3, "med5"]).all()  # frame not yet full
    assert pdf.loc[4, "med5"] == 10.0  # spike IN frame, median ignores it
    assert pdf.loc[5, "med5"] == 10.0


# ---------------------------------------------------------------------------
# Wave: session paths / threshold sweep.
# ---------------------------------------------------------------------------


def test_session_paths_truncate_and_split_on_gap(spark, tmp_path):
    """A 7-event session truncates to its first 5 steps; a >30-min gap
    starts a fresh path; two users with the same journey both count."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    s = lambda n: base + dt.timedelta(minutes=n)
    rows = []
    # user 1: 7 quick events then (after a 40-min gap) 2 more
    types = ["a", "b", "c", "d", "e", "f", "g"]
    for i, t in enumerate(types):
        rows.append((i, s(i), 1, t, 1.0, "{}"))
    rows.append((10, s(50), 1, "x", 1.0, "{}"))
    rows.append((11, s(51), 1, "y", 1.0, "{}"))
    # user 2: same first journey
    for i, t in enumerate(types):
        rows.append((20 + i, s(i), 2, t, 1.0, "{}"))
    sf = _write_events(rows, str(tmp_path))
    pdf = (
        registry.QUERIES["session_path_counts"](spark, sf)
        .toPandas()
        .set_index("path")
    )
    assert pdf.loc["a>b>c>d>e", "n_sessions"] == 2  # truncated at 5
    assert pdf.loc["x>y", "n_sessions"] == 1
    assert len(pdf) == 2


def test_threshold_sweep_is_monotone_and_matches_pair_table(spark):
    """n_pairs and n_docs must be non-increasing in tau, and the 0.8
    row must agree with counting the memoized pair table directly."""
    from history_collector_spark.queries.dedup import verified_pair_table

    pdf = (
        registry.QUERIES["dedup_threshold_sweep"](spark, TEST_SF_DIR)
        .toPandas()
        .sort_values("tau_x10")
    )
    assert (pdf["n_pairs"].diff().dropna() <= 0).all()
    assert (pdf["n_docs"].diff().dropna() <= 0).all()
    pairs = verified_pair_table(spark, TEST_SF_DIR).toPandas()
    import numpy as np

    bucketed = np.floor(pairs["jaccard"] * 10) >= 8
    assert (
        pdf.set_index("tau_x10").loc[8, "n_pairs"] == bucketed.sum()
    )


# ---------------------------------------------------------------------------
# Wave: bloom audit / streaming z-score.
# ---------------------------------------------------------------------------


def test_bloom_never_false_negative_and_fp_rate_near_theory(spark):
    """Zero false negatives is the Bloom INVARIANT (any FN means the
    build or probe path is broken); the measured FP rate must sit near
    the (1 - e^(-kn/m))^k theoretical curve."""
    import math

    from history_collector_spark.queries.sketches import (
        _BLOOM_BITS,
        _BLOOM_K,
    )

    r = (
        registry.QUERIES["bloom_membership_audit"](spark, TEST_SF_DIR)
        .toPandas()
        .iloc[0]
    )
    assert r["n_false_negatives"] == 0
    n, m, k = r["n_members"], _BLOOM_BITS, _BLOOM_K
    theory = (1 - math.exp(-k * n / m)) ** k
    assert abs(r["false_positive_rate"] - theory) < max(0.05, theory)


def test_streaming_zscore_scores_against_prior_only(spark, tmp_path):
    """Values 10, 10, 10, 16: the spike's z uses the prior mean/std
    only — but 3 constant priors give std 0 -> null; sequence
    10, 12, 10, 22 gives a hand-checkable z for the last point."""
    import datetime as dt
    import math

    import pandas as pd

    base = dt.datetime(2024, 1, 1)
    vals = [10.0, 12.0, 10.0, 22.0]
    rows = [
        (i, base + dt.timedelta(hours=6 * i), 1, "view", v, "{}")
        for i, v in enumerate(vals)
    ]
    sf = _write_events(rows, str(tmp_path))
    pdf = (
        registry.QUERIES["streaming_zscore_e2e"](spark, sf)
        .toPandas()
        .set_index("event_id")
        .sort_index()
    )
    assert pd.isna(pdf.loc[0, "z"]) and pd.isna(pdf.loc[1, "z"])
    # event 2: priors [10,12] -> mean 11, std sqrt(2) -> z = -1/sqrt(2)
    assert abs(pdf.loc[2, "z"] + 1 / math.sqrt(2)) < 1e-9
    # event 3: priors [10,12,10] -> mean 32/3, std sqrt(4/3)
    exp = (22 - 32 / 3) / math.sqrt(4 / 3)
    assert abs(pdf.loc[3, "z"] - exp) < 1e-9


def test_bootstrap_ci_brackets_true_mean_and_is_deterministic(spark):
    """The Poisson bootstrap at sf0.001: the 95% CI must bracket the
    true mean (1500 rows, CLT-comfortable), the replicate count must
    equal the configured budget, and two runs must agree bit-for-bit
    (weights are md5-derived, not RNG)."""
    from history_collector_spark.queries.evaluation import N_REPLICATES

    sf = TEST_SF_DIR
    a = registry.QUERIES["bootstrap_mean_ci"](spark, sf).toPandas()
    b = registry.QUERIES["bootstrap_mean_ci"](spark, sf).toPandas()
    assert a.equals(b)
    row = a.iloc[0]
    assert row["n_replicates"] == N_REPLICATES
    true_mean = (
        registry.QUERIES["group_agg_pricing"](spark, sf)
        .sparkSession.read.parquet(f"{sf}/orders.parquet")
        .agg({"o_totalprice": "avg"})
        .collect()[0][0]
    )
    assert row["ci_lo"] < true_mean < row["ci_hi"]
    assert row["ci_lo"] < row["boot_mean"] < row["ci_hi"]


def test_salted_agg_equals_direct_groupby(spark):
    """The explicit two-phase salted aggregation must be
    indistinguishable from the direct groupBy — including the
    count_distinct, which is only correct because the salt is a
    function of the distinct key."""
    from pyspark.sql import functions as F

    from history_collector_spark.catalog import table as cat_table

    sf = TEST_SF_DIR
    salted = (
        registry.QUERIES["salted_two_phase_agg"](spark, sf)
        .toPandas()
        .set_index("event_type")
        .sort_index()
    )
    direct = (
        cat_table(spark, sf, "events")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("value").alias("sum_value"),
            F.count_distinct("user_id").alias("n_users"),
        )
        .toPandas()
        .set_index("event_type")
        .sort_index()
    )
    assert (salted["n"] == direct["n"]).all()
    assert (salted["n_users"] == direct["n_users"]).all()
    assert (abs(salted["sum_value"] - direct["sum_value"]) < 1e-6).all()
