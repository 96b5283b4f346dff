"""Round-8 additions: encoding-artifact audit on hand-built dirty
docs (the sf corpus is clean, so the zero path is all the driver gate
can prove) and a brute-force pin of the Gopher repetition panel.
"""

from __future__ import annotations

import os
from collections import Counter

import duckdb
import pandas as pd
import pytest

from history_collector_spark import registry
from tests.oracle_compare import assert_frames_match

registry.load_all()


def _write_docs(tmp_path, rows):
    df = pd.DataFrame(
        [
            {
                "doc_id": i,
                "text": t,
                "lang": "en",
                "source": s,
                "n_chars": len(t),
            }
            for i, (t, s) in enumerate(rows)
        ]
    )
    df["doc_id"] = df["doc_id"].astype("int64")
    df["n_chars"] = df["n_chars"].astype("int64")
    df.to_parquet(os.path.join(tmp_path, "documents.parquet"))
    return str(tmp_path)


DIRTY = [
    ("clean ascii only", "web"),
    ("bad \ufffd twice \ufffd here and a bell \x07", "web"),
    # 'caf\u00c3\u00a9' twice (mojibake'd accent) and one mangled
    # smart quote '\u00e2\u20ac\u2122'
    (
        "caf\u00c3\u00a9 and clich\u00c3\u00a9 plus"
        " \u00e2\u20ac\u2122quote",
        "books",
    ),
    ("\u4e16\u754c cjk text", "books"),
]


def test_encoding_audit_dirty_docs_vs_oracle(spark, tmp_path):
    """End-to-end on dirty docs: the registered Spark query and its
    DuckDB oracle agree on data that actually exercises every
    artifact class (the driver's sf corpus hits only the zero path)."""
    d = _write_docs(tmp_path, DIRTY)
    sdf = registry.QUERIES["curation_encoding_audit"](spark, d).toPandas()
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet'"
    )
    odf = con.sql(registry.ORACLES["curation_encoding_audit"]).df()
    assert_frames_match(sdf, odf, name="encoding_audit_dirty", mode="parity")


def test_encoding_audit_pinned_counts(spark, tmp_path):
    d = _write_docs(tmp_path, DIRTY)
    out = {
        r["source"]: r
        for r in registry.QUERIES["curation_encoding_audit"](spark, d)
        .collect()
    }
    web, books = out["web"], out["books"]
    assert web["n_docs"] == 2 and books["n_docs"] == 2
    assert web["repl_chars"] == 2          # two U+FFFD
    assert web["ctrl_chars"] == 1          # the \x07 bell
    assert web["mojibake_chars"] == 0
    assert web["n_docs_flagged"] == 1
    # books: 'Ã©' twice -> two 'Ã' chars; 'â€™' -> one 'â€' pair = 2 chars
    assert books["repl_chars"] == 0 and books["ctrl_chars"] == 0
    assert books["mojibake_chars"] == 2 + 2
    assert books["n_docs_flagged"] == 1
    # CJK doc: non-ascii but NOT flagged (no artifact markers)
    assert books["non_ascii_chars"] >= 2
    assert web["total_chars"] == sum(
        len(t) for t, s in DIRTY if s == "web"
    )


def _brute_gopher(text):
    w = text.lower().split()
    L = len(text)
    row = {}
    for n, kind in ((2, "top2"), (3, "top3"), (5, "dup5"), (10, "dup10")):
        if len(w) < n:
            row[f"{kind}_char_frac"] = None
            continue
        c = Counter(
            " ".join(w[i : i + n]) for i in range(len(w) - n + 1)
        )
        if kind.startswith("top"):
            cover = max(len(g) * k for g, k in c.items())
        else:
            cover = sum(len(g) * k for g, k in c.items() if k > 1)
        row[f"{kind}_char_frac"] = cover / L
    return row


GOPHER_DOCS = [
    ("spam spam spam spam spam ham spam spam spam spam spam eggs", "web"),
    ("one two three four five six seven eight nine ten eleven", "web"),
    ("tiny doc", "web"),  # < 5 words: dup5/dup10 must be NULL
    ("a b a b a b a b a b a b a b", "books"),
]


def test_gopher_signals_match_brute_force(spark, tmp_path):
    d = _write_docs(tmp_path, GOPHER_DOCS)
    got = {
        r["doc_id"]: r.asDict()
        for r in registry.QUERIES["text_gopher_signals"](spark, d).collect()
    }
    assert len(got) == len(GOPHER_DOCS)
    for i, (text, _src) in enumerate(GOPHER_DOCS):
        want = _brute_gopher(text)
        for k, v in want.items():
            g = got[i][k]
            if v is None:
                assert g is None, (i, k, g)
            else:
                assert g == pytest.approx(v, abs=1e-12), (i, k, g, v)


def test_n_chars_matches_text_length(duck):
    """dedup_edit_distance's narrow pre-gate keys off documents.n_chars;
    pin the column's contract (== length(text)) so drift would surface
    here, not as silently weaker pruning."""
    bad = duck.sql(
        "SELECT count(*) FROM documents WHERE n_chars <> length(text)"
    ).fetchone()[0]
    assert bad == 0
