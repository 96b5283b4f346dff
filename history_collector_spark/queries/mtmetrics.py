"""Generation-quality metrics: chrF and corpus BLEU over paired texts.

A training-data pipeline that distills, translates, or paraphrases at
corpus scale needs its generation evals ON the cluster — per-pair chrF
for filtering (keep only faithful rewrites) and corpus BLEU for run
regression tracking. Candidate/reference pairs are formed from the
documents table itself (doc 2k rewrites doc 2k+1), which keeps the
metric arithmetic honest without shipping a generation model.

Scale shapes (both measured at sf0.1 before choosing): n-grams are
formed O(len) per row JVM-side (zip_with over array slices — never a
re-split per gram). chrF's large char multisets go through ONE
(pair_id, n, packed-long-code) aggregation (_char_code_overlap); BLEU
and ROUGE-L compute entirely within the row (_clip_count sort+fold /
the unrolled LCS DP) — zero corpus shuffle. No windows, no driver
loops, no Python row path.

Reference scope: kinecosystem/history-collector has no text metrics;
LLM-pipeline extension tier.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from history_collector_spark.catalog import spread, table
from history_collector_spark.registry import register
from history_collector_spark.pinning import pin_local

_CHRF_BETA2 = 4  # beta = 2: recall weighted 2x, per the chrF paper

# candidate = even doc_id, reference = the following odd doc_id; both
# lowercased once. Shared by both oracles.
_PAIRS_SQL = """
  pairs AS (
    SELECT c.doc_id // 2 AS pair_id,
           lower(c.text) AS cand,
           lower(r.text) AS ref
    FROM documents c
    JOIN documents r ON r.doc_id = c.doc_id + 1
    WHERE c.doc_id % 2 = 0
  )
"""


def _pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # spread() the single-row-group scan (r15 optimization): the pair
    # join broadcasts one side, so without it the join AND all per-pair
    # gram/clip work Catalyst fuses downstream run inside the one-task
    # scan stage.
    docs = spread(
        table(spark, sf_dir, "documents").select("doc_id", "text"), spark
    )
    c = docs.filter(F.col("doc_id") % 2 == 0).select(
        (F.col("doc_id") / 2).cast("long").alias("pair_id"),
        F.lower(F.col("text")).alias("cand"),
    )
    r = docs.filter(F.col("doc_id") % 2 == 1).select(
        F.floor(F.col("doc_id") / 2).cast("long").alias("pair_id"),
        F.lower(F.col("text")).alias("ref"),
    )
    return c.join(r, "pair_id")


def _word_grams(w: Column, n: int) -> Column:
    """Word n-grams by chaining zip_with over shifted slices — each
    slice materializes once per row, so gram formation is O(len)
    regardless of how Catalyst collapses the token projection."""
    m = F.size(w)
    g = w
    for k in range(2, n + 1):
        g = F.zip_with(
            F.slice(g, 1, F.greatest(m - (k - 1), F.lit(0))),
            F.slice(w, k, F.greatest(m - (k - 1), F.lit(0))),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
    return F.when(m >= n, g).otherwise(F.array().cast("array<string>"))


def _mk_side_tag(t: int):
    """Single-arg HOF lambda factory (the F.transform arity trap)."""
    return lambda g: F.struct(g.alias("g"), F.lit(t).alias("t"))


def _clip_count(cand_grams: Column, ref_grams: Column) -> Column:
    """Clipped multiset overlap sum_g min(count_cand(g), count_ref(g))
    computed ENTIRELY WITHIN THE ROW — both gram multisets of a pair
    already live in one row, so shuffling 8M exploded gram rows into a
    (pair, n, gram) aggregate (the first cut of this file) pays a
    corpus-scale exchange for arithmetic that is per-pair local.

    Shape: tag each side, sort the concatenated struct array (equal
    grams become adjacent, O(L log L) per row), then one fold that
    run-length-counts each gram per side and adds min(run_a, run_b) at
    every run boundary; the finish lambda flushes the last run. Zero
    shuffle, embarrassingly parallel — the 100 TB shape for a per-pair
    metric."""
    arr = F.array_sort(
        F.concat(
            F.transform(cand_grams, _mk_side_tag(0)),
            F.transform(ref_grams, _mk_side_tag(1)),
        )
    )
    zero = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("long").alias("ca"),
        F.lit(0).cast("long").alias("cb"),
        F.lit(0).cast("long").alias("acc"),
    )

    def step(s: Column, x: Column) -> Column:
        same = x.g.eqNullSafe(s.prev)
        is_a = (x.t == 0).cast("long")
        return F.struct(
            x.g.alias("prev"),
            (F.when(same, s.ca).otherwise(F.lit(0)) + is_a).alias("ca"),
            (
                F.when(same, s.cb).otherwise(F.lit(0)) + (1 - is_a)
            ).alias("cb"),
            F.when(same, s.acc)
            .otherwise(s.acc + F.least(s.ca, s.cb))
            .alias("acc"),
        )

    return F.aggregate(
        arr, zero, step, lambda s: s.acc + F.least(s.ca, s.cb)
    )


_CP_K = 1 << 21  # > max Unicode code point; 3-gram codes stay < 2^63


def _mk_ntag(n: int):
    """Single-arg HOF lambda factory (the F.transform arity trap)."""
    return lambda code: F.struct(F.lit(n).alias("n"), code.alias("code"))


def _char_code_overlap(pairs: DataFrame, orders) -> DataFrame:
    """(pair_id, ov1..ov3): clipped char-n-gram overlap per pair via
    ONE union + ONE (pair, n, code) aggregation, with every gram
    packed into a single LONG (code points shifted by 2^21 per
    position — injective for all of Unicode) instead of a string: the
    aggregation hashes and shuffles fixed-width ints, not 8M short
    strings. The gram->code mapping never leaves the plan (only the
    min-count sums are output), so the string-gram oracle is unchanged.

    Chose over the per-row sort+fold _clip_count shape after measuring
    both at sf0.1: char multisets are ~1.1k grams/pair and the struct
    sort + per-element fold ran 2x SLOWER (12.2s) than even the
    string-keyed shuffle (5.9s); BLEU's word multisets are ~10x
    smaller and keep the per-row shape."""

    def side(txt: str, tag: int) -> DataFrame:
        cp = F.transform(
            F.split(F.col(txt), ""), lambda c: F.ascii(c).cast("long")
        )
        sel = pairs.select("pair_id", cp.alias("cp"))
        m = F.size("cp")
        c2 = F.zip_with(
            F.slice("cp", 1, F.greatest(m - 1, F.lit(0))),
            F.slice(F.col("cp"), 2, F.greatest(m - 1, F.lit(0))),
            lambda x, y: x * _CP_K + y,
        )
        c3 = F.zip_with(
            F.slice(F.col("c2"), 1, F.greatest(m - 2, F.lit(0))),
            F.slice(F.col("cp"), 3, F.greatest(m - 2, F.lit(0))),
            lambda x, y: x * _CP_K + y,
        )
        tagged = sel.withColumn("c2", c2).select(
            "pair_id",
            F.explode(
                F.concat(
                    F.transform("cp", _mk_ntag(1)),
                    F.transform("c2", _mk_ntag(2)),
                    F.transform(c3, _mk_ntag(3)),
                )
            ).alias("t"),
        )
        return tagged.select(
            "pair_id",
            F.col("t.n").alias("n"),
            F.col("t.code").alias("code"),
            F.lit(tag).alias("side"),
        )

    both = side("cand", 0).unionByName(side("ref", 1))
    cnt = both.groupBy("pair_id", "n", "code").agg(
        F.sum(F.when(F.col("side") == 0, 1).otherwise(0)).alias("c"),
        F.sum(F.when(F.col("side") == 1, 1).otherwise(0)).alias("cr"),
    )
    per_n = cnt.groupBy("pair_id", "n").agg(
        F.sum(F.least("c", "cr")).alias("ov")
    )
    return per_n.groupBy("pair_id").agg(
        *[
            F.sum(F.when(F.col("n") == n, F.col("ov")).otherwise(0)).alias(
                f"ov{n}"
            )
            for n in (1, 2, 3)
        ]
    )


# per-(pair, n) clipped overlap: sum of min(cand count, ref count) —
# an inner join suffices (missing grams clip to 0).
_CHRF_OV_SQL = """
  cg AS (
    SELECT pair_id, n, g, CAST(count(*) AS BIGINT) AS c
    FROM (
      SELECT pair_id, n, unnest(list_transform(
               range(1, greatest(length(cand) - (n - 1), 0) + 1),
               i -> substr(cand, CAST(i AS INT), CAST(n AS INT)))) AS g
      FROM pairs, (SELECT unnest(range(1, 4)) AS n) ns
    ) GROUP BY 1, 2, 3
  ),
  rg AS (
    SELECT pair_id, n, g, CAST(count(*) AS BIGINT) AS c
    FROM (
      SELECT pair_id, n, unnest(list_transform(
               range(1, greatest(length(ref) - (n - 1), 0) + 1),
               i -> substr(ref, CAST(i AS INT), CAST(n AS INT)))) AS g
      FROM pairs, (SELECT unnest(range(1, 4)) AS n) ns
    ) GROUP BY 1, 2, 3
  ),
  ov AS (
    SELECT cg.pair_id, cg.n,
           CAST(sum(least(cg.c, rg.c)) AS BIGINT) AS ov
    FROM cg JOIN rg ON cg.pair_id = rg.pair_id
                   AND cg.n = rg.n AND cg.g = rg.g
    GROUP BY 1, 2
  ),
  grid AS (
    SELECT p.pair_id, ns.n,
           greatest(length(p.cand) - (ns.n - 1), 0) AS tc,
           greatest(length(p.ref) - (ns.n - 1), 0) AS tr
    FROM pairs p CROSS JOIN (SELECT unnest(range(1, 4)) AS n) ns
  ),
  pern AS (
    SELECT gd.pair_id, gd.n, gd.tc, gd.tr, coalesce(ov.ov, 0) AS ov
    FROM grid gd LEFT JOIN ov ON ov.pair_id = gd.pair_id AND ov.n = gd.n
  ),
  folded AS (
    SELECT pair_id,
           (sum(CASE WHEN n = 1 AND tc > 0 THEN CAST(ov AS DOUBLE) / tc ELSE 0.0 END)
            + sum(CASE WHEN n = 2 AND tc > 0 THEN CAST(ov AS DOUBLE) / tc ELSE 0.0 END)
            + sum(CASE WHEN n = 3 AND tc > 0 THEN CAST(ov AS DOUBLE) / tc ELSE 0.0 END)
           ) / 3 AS chrp,
           (sum(CASE WHEN n = 1 AND tr > 0 THEN CAST(ov AS DOUBLE) / tr ELSE 0.0 END)
            + sum(CASE WHEN n = 2 AND tr > 0 THEN CAST(ov AS DOUBLE) / tr ELSE 0.0 END)
            + sum(CASE WHEN n = 3 AND tr > 0 THEN CAST(ov AS DOUBLE) / tr ELSE 0.0 END)
           ) / 3 AS chrr
    FROM pern GROUP BY pair_id
  )
"""


@register(
    "text_chrf_score",
    oracle=f"""
    WITH {_PAIRS_SQL},
    {_CHRF_OV_SQL}
    SELECT pair_id, chrp, chrr,
           CASE WHEN {_CHRF_BETA2} * chrp + chrr > 0.0
                THEN ((1 + {_CHRF_BETA2}) * (chrp * chrr))
                     / ({_CHRF_BETA2} * chrp + chrr)
                ELSE 0.0 END AS chrf
    FROM folded
    ORDER BY chrf DESC, pair_id
    LIMIT 100
    """,
)
def text_chrf_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """chrF2 (Popović 2015) per candidate/reference pair, top-100 by
    score — the per-pair faithfulness filter: character 1..3-gram
    precision and recall (clipped multiset overlap), averaged over n,
    combined with beta=2.

    Parity: per-n P and R are single BIGINT/BIGINT divisions (clip
    totals are integers; the denominator is closed-form from the text
    length, no second aggregate), averaged and combined in the same op
    order both engines; the per-n fold is a fixed 3-term CASE sum, not
    an unordered float aggregation. Top-k is TakeOrderedAndProject
    with (chrf DESC, pair_id) tiebreak.

    Scale: one union + one (pair_id, n, code)-keyed aggregation over
    packed-long gram codes (see _char_code_overlap — measured 2.7x
    faster than string keys / the per-row sort+fold at sf0.1); gram
    formation O(len) per row; everything downstream per-pair
    arithmetic. 4.6s warm at sf0.1 (7.5k pairs x ~1.7k grams/side).
    """
    pairs = _pairs(spark, sf_dir).select(
        "pair_id",
        "cand",
        "ref",
        F.length("cand").alias("lc"),
        F.length("ref").alias("lr"),
        # r15 optimization (the multiply-consumed-frame persist
        # discipline): this frame anchors THREE consumers — the cand
        # and ref legs of the char-code overlap union plus the length
        # join — so the docs scan + pair self-join executed three
        # times. Pinned, all three read InMemoryTableScan.
    ).transform(pin_local)
    orders = (1, 2, 3)
    ov = _char_code_overlap(pairs, orders)
    base = pairs.select("pair_id", "lc", "lr").join(ov, "pair_id", "left")

    def _p(n: int, length: Column) -> Column:
        tot = F.greatest(length - (n - 1), F.lit(0))
        ovn = F.coalesce(F.col(f"ov{n}"), F.lit(0))
        return F.when(tot > 0, ovn.cast("double") / tot).otherwise(F.lit(0.0))

    chrp = (
        _p(1, F.col("lc")) + _p(2, F.col("lc")) + _p(3, F.col("lc"))
    ) / F.lit(3)
    chrr = (
        _p(1, F.col("lr")) + _p(2, F.col("lr")) + _p(3, F.col("lr"))
    ) / F.lit(3)
    scored = base.select(
        "pair_id", chrp.alias("chrp"), chrr.alias("chrr")
    ).withColumn(
        "chrf",
        F.when(
            F.lit(_CHRF_BETA2) * F.col("chrp") + F.col("chrr") > 0.0,
            (F.lit(1 + _CHRF_BETA2) * (F.col("chrp") * F.col("chrr")))
            / (F.lit(_CHRF_BETA2) * F.col("chrp") + F.col("chrr")),
        ).otherwise(F.lit(0.0)),
    )
    return scored.orderBy(F.desc("chrf"), "pair_id").limit(100)


_BLEU_GRAMS_SQL = """
  toks AS (
    SELECT pair_id,
           string_split_regex(cand, '\\s+') AS cw,
           string_split_regex(ref, '\\s+') AS rw
    FROM pairs
  ),
  cg AS (
    SELECT pair_id, n, g, CAST(count(*) AS BIGINT) AS c
    FROM (
      SELECT pair_id, n,
             unnest(list_transform(
               range(1, greatest(len(cw) - (n - 1), 0) + 1),
               i -> array_to_string(cw[i:i+n-1], ' '))) AS g
      FROM toks, (SELECT unnest(range(1, 5)) AS n) ns
    ) GROUP BY 1, 2, 3
  ),
  rg AS (
    SELECT pair_id, n, g, CAST(count(*) AS BIGINT) AS c
    FROM (
      SELECT pair_id, n,
             unnest(list_transform(
               range(1, greatest(len(rw) - (n - 1), 0) + 1),
               i -> array_to_string(rw[i:i+n-1], ' '))) AS g
      FROM toks, (SELECT unnest(range(1, 5)) AS n) ns
    ) GROUP BY 1, 2, 3
  ),
  clip AS (
    SELECT cg.n, CAST(sum(least(cg.c, rg.c)) AS BIGINT) AS clip_n
    FROM cg JOIN rg ON cg.pair_id = rg.pair_id
                   AND cg.n = rg.n AND cg.g = rg.g
    GROUP BY 1
  ),
  tots AS (
    SELECT ns.n,
           CAST(sum(greatest(len(t.cw) - (ns.n - 1), 0)) AS BIGINT) AS tot_n
    FROM toks t, (SELECT unnest(range(1, 5)) AS n) ns
    GROUP BY 1
  ),
  lens AS (
    SELECT CAST(sum(len(cw)) AS BIGINT) AS c_len,
           CAST(sum(len(rw)) AS BIGINT) AS r_len
    FROM toks
  )
"""


@register(
    "text_bleu_corpus",
    oracle=f"""
    WITH {_PAIRS_SQL},
    {_BLEU_GRAMS_SQL},
    wide AS (
      SELECT lens.c_len, lens.r_len,
             max(CASE WHEN t.n = 1 THEN coalesce(c.clip_n, 0) END) AS clip1,
             max(CASE WHEN t.n = 2 THEN coalesce(c.clip_n, 0) END) AS clip2,
             max(CASE WHEN t.n = 3 THEN coalesce(c.clip_n, 0) END) AS clip3,
             max(CASE WHEN t.n = 4 THEN coalesce(c.clip_n, 0) END) AS clip4,
             max(CASE WHEN t.n = 1 THEN t.tot_n END) AS tot1,
             max(CASE WHEN t.n = 2 THEN t.tot_n END) AS tot2,
             max(CASE WHEN t.n = 3 THEN t.tot_n END) AS tot3,
             max(CASE WHEN t.n = 4 THEN t.tot_n END) AS tot4
      FROM tots t LEFT JOIN clip c ON c.n = t.n CROSS JOIN lens
      GROUP BY lens.c_len, lens.r_len
    )
    SELECT c_len, r_len, clip1, clip2, clip3, clip4,
           tot1, tot2, tot3, tot4,
           CASE WHEN least(clip1, clip2, clip3, clip4) = 0 THEN 0.0
                ELSE (CASE WHEN c_len > r_len THEN 1.0
                           ELSE exp(1.0 - CAST(r_len AS DOUBLE) / c_len) END)
                     * exp((ln(CAST(clip1 AS DOUBLE) / tot1)
                            + ln(CAST(clip2 AS DOUBLE) / tot2)
                            + ln(CAST(clip3 AS DOUBLE) / tot3)
                            + ln(CAST(clip4 AS DOUBLE) / tot4)) / 4)
           END AS bleu
    FROM wide
    """,
)
def text_bleu_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level BLEU-4 (Papineni et al. 2002) of the paired
    candidate/reference corpus: clipped n-gram matches and candidate
    totals are summed over ALL pairs before the precision ratio (the
    corpus statistic, not an average of sentence BLEUs), with the
    standard brevity penalty.

    Parity: every count column is an exact BIGINT; bleu itself is the
    only transcendental (exp/ln, both ≤1 ulp per engine — the PARITY.md
    drift class that passes unless a value sits on a rounding
    boundary), with the op order matched term-for-term and the
    int/int precision divisions kept single.

    Scale: clip counts are computed WITHIN each row (_clip_count
    sort+fold — word multisets are small enough that the per-row shape
    wins; measured at sf0.1), then everything collapses into ONE
    global aggregate row — zero shuffle beyond the pair join.
    """
    pairs = _pairs(spark, sf_dir)
    toks = pairs.select(
        "pair_id",
        F.split(F.col("cand"), r"\s+").alias("cw"),
        F.split(F.col("ref"), r"\s+").alias("rw"),
    )
    orders = (1, 2, 3, 4)
    per_pair = toks.select(
        F.size("cw").alias("lc"),
        F.size("rw").alias("lr"),
        *[
            _clip_count(
                _word_grams(F.col("cw"), n), _word_grams(F.col("rw"), n)
            ).alias(f"ov{n}")
            for n in orders
        ],
    )
    wide = per_pair.agg(
        F.sum("lc").alias("c_len"),
        F.sum("lr").alias("r_len"),
        *[F.sum(f"ov{n}").alias(f"clip{n}") for n in orders],
        *[
            F.sum(F.greatest(F.col("lc") - (n - 1), F.lit(0))).alias(
                f"tot{n}"
            )
            for n in orders
        ],
    )
    bp = F.when(F.col("c_len") > F.col("r_len"), F.lit(1.0)).otherwise(
        F.exp(
            F.lit(1.0) - F.col("r_len").cast("double") / F.col("c_len")
        )
    )
    logmean = (
        F.log(F.col("clip1").cast("double") / F.col("tot1"))
        + F.log(F.col("clip2").cast("double") / F.col("tot2"))
        + F.log(F.col("clip3").cast("double") / F.col("tot3"))
        + F.log(F.col("clip4").cast("double") / F.col("tot4"))
    ) / F.lit(4)
    bleu = F.when(
        F.least("clip1", "clip2", "clip3", "clip4") == 0, F.lit(0.0)
    ).otherwise(bp * F.exp(logmean))
    return wide.select(
        "c_len",
        "r_len",
        "clip1",
        "clip2",
        "clip3",
        "clip4",
        "tot1",
        "tot2",
        "tot3",
        "tot4",
        bleu.alias("bleu"),
    )


# ---------------------------------------------------------------------------
# ROUGE-L: longest-common-subsequence recall/precision per pair. The
# LCS DP is unrolled to a fixed token horizon with the SAME Python
# loop generating both engines' expressions (the tokenizer_unigram_
# viterbi lockstep idiom), using the prefix-max form of the row
# update — valid because LCS DP rows are nondecreasing in j:
#   dp_new[j] = max(dp_old[j], max_{k<=j}(dp_old[k-1] + [cand_i=ref_k]))
# (non-match terms are absorbed by dp_old[j], so mismatches contribute
# a harmless 0). Integer DP -> EXACT parity.
# ---------------------------------------------------------------------------

_RL_CAP = 24  # token horizon per side; docs truncate deterministically


def _rouge_sql() -> str:
    """Chained-SELECT unrolled LCS for DuckDB over the pairs CTE."""
    cap = _RL_CAP
    steps = [
        "d0 AS (SELECT pair_id,"
        " (string_split_regex(cand, '\\s+'))[1:%d] AS cw,"
        " (string_split_regex(ref, '\\s+'))[1:%d] AS rw,"
        " list_transform(range(0, %d), x -> CAST(0 AS BIGINT)) AS row_0"
        " FROM pairs)" % (cap, cap, cap + 1)
    ]
    for i in range(1, cap + 1):
        steps.append(
            f"a{i} AS (SELECT *, list_transform(range(1, {cap + 1}),"
            f" k -> CASE WHEN rw[k] = cw[{i}] THEN row_{i - 1}[k] + 1"
            f" ELSE CAST(0 AS BIGINT) END) AS av FROM d{i - 1})"
        )
        steps.append(
            f"d{i} AS (SELECT pair_id, cw, rw,"
            f" CASE WHEN {i} <= len(cw) THEN"
            f" list_prepend(CAST(0 AS BIGINT),"
            f" list_transform(range(1, {cap + 1}),"
            f" j -> greatest(row_{i - 1}[j + 1],"
            f" coalesce(list_max(av[1:j]), CAST(0 AS BIGINT)))))"
            f" ELSE row_{i - 1} END AS row_{i} FROM a{i})"
        )
    steps.append(
        f"lcs AS (SELECT pair_id, CAST(len(cw) AS BIGINT) AS clen,"
        f" CAST(len(rw) AS BIGINT) AS rlen,"
        f" row_{cap}[len(rw) + 1] AS lcs_len FROM d{cap})"
    )
    return ",\n  ".join(steps)


@register(
    "text_rouge_l",
    oracle=f"""
    WITH {_PAIRS_SQL},
  {_rouge_sql()}
    SELECT pair_id, clen, rlen, lcs_len,
           CAST(lcs_len AS DOUBLE) / clen AS rouge_l_p,
           CAST(lcs_len AS DOUBLE) / rlen AS rouge_l_r,
           CAST(2 * lcs_len AS DOUBLE) / (clen + rlen) AS rouge_l_f
    FROM lcs
    """,
)
def text_rouge_l(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROUGE-L per candidate/reference pair over the first {_RL_CAP}
    tokens of each side (deterministic truncation, mirrored in the
    oracle): LCS length plus precision/recall/F1. With P = lcs/clen
    and R = lcs/rlen, F1 = 2PR/(P+R) simplifies to 2*lcs/(clen+rlen),
    so all three ratios are single BIGINT/BIGINT divisions — EXACT.

    The LCS DP runs as ONE vectorized numpy kernel per Arrow batch
    (mapInPandas): tokens integer-encode per batch, pads use distinct
    negative ids per side so they never match, and the prefix-max row
    update (valid because LCS rows are nondecreasing) becomes
    np.maximum.accumulate over the whole (batch x cap) matrix — cap
    iterations of O(batch*cap) SIMD work, integers end to end. A
    first cut unrolled the same DP as {_RL_CAP} JVM array transforms
    per row: pure-JVM and exact, but ~1.5us/element interpreted HOF
    cost made it the suite's slowest query (8.6s at sf0.1 vs 0.4s for
    this kernel — measured, see SCALING.md); the oracle (lockstep
    chained-CTE DP) and the brute-force pytest cross-check pin both
    forms to the same integers. Partition-parallel, zero shuffle
    after the pair join.
    """
    cap = _RL_CAP
    pairs = _pairs(spark, sf_dir)
    d = pairs.select(
        "pair_id",
        F.slice(F.split(F.col("cand"), r"\s+"), 1, cap).alias("cw"),
        F.slice(F.split(F.col("ref"), r"\s+"), 1, cap).alias("rw"),
    )

    def lcs_batches(pdfs):
        import numpy as np
        import pandas as pd

        for pdf in pdfs:
            b = len(pdf)
            if b == 0:
                continue
            cw = pdf["cw"].tolist()
            rw = pdf["rw"].tolist()
            clen = np.array([len(x) for x in cw], dtype=np.int64)
            rlen = np.array([len(x) for x in rw], dtype=np.int64)
            # integer-encode the batch vocabulary; pads -1/-2 never match
            flat = [t for row in cw for t in row] + [
                t for row in rw for t in row
            ]
            uniq, inv = np.unique(np.array(flat, dtype=object),
                                  return_inverse=True)
            c = np.full((b, cap), -1, dtype=np.int64)
            r = np.full((b, cap), -2, dtype=np.int64)
            k = 0
            for i, row in enumerate(cw):
                n = len(row)
                c[i, :n] = inv[k:k + n]
                k += n
            for i, row in enumerate(rw):
                n = len(row)
                r[i, :n] = inv[k:k + n]
                k += n
            dp = np.zeros((b, cap + 1), dtype=np.int64)
            for i in range(cap):
                match = r == c[:, i:i + 1]  # pads never match
                a = np.where(match, dp[:, :-1] + 1, 0)
                new = np.maximum(dp[:, 1:], np.maximum.accumulate(a, axis=1))
                dp[:, 1:] = new
            lcs = dp[np.arange(b), rlen]
            yield pd.DataFrame(
                {
                    "pair_id": pdf["pair_id"].to_numpy(dtype=np.int64),
                    "clen": clen,
                    "rlen": rlen,
                    "lcs_len": lcs,
                }
            )

    lcs = spread(d, spark).mapInPandas(
        lcs_batches, schema="pair_id long, clen long, rlen long, lcs_len long"
    )
    return lcs.select(
        "pair_id",
        "clen",
        "rlen",
        "lcs_len",
(F.col("lcs_len").cast("double") / F.col("clen")).alias("rouge_l_p"),
        (F.col("lcs_len").cast("double") / F.col("rlen")).alias("rouge_l_r"),
        (
            (F.lit(2) * F.col("lcs_len")).cast("double")
            / (F.col("clen") + F.col("rlen"))
        ).alias("rouge_l_f"),
    )
