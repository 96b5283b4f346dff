"""Distributed BPE-training kernel over `documents`.

`bpe_merge_step` computes the statistic one byte-pair-encoding merge
iteration needs: for every adjacent SYMBOL pair inside a word, the
total corpus frequency (Σ over distinct words of pair-occurrences ×
word count), returning the top 20 candidate merges. Tokenizer training
at corpus scale (GPT-2's BPE, SentencePiece) loops exactly this
aggregation; here one step is expressed as two map-side-combined
aggregations:

  1. word frequencies — shuffle keys are distinct WORDS (vocab-sized,
     zipf-concentrated → partial aggregation collapses almost
     everything map-side);
  2. pair totals — per distinct word, split to characters, form
     adjacent pairs (map-only array ops), weight by word count;
     shuffle keys are character PAIRS (alphabet²-sized).

At 100 TB stage 1's reduce output is the vocabulary, stage 2's input
is vocab-sized, not corpus-sized — the corpus itself is scanned once.
Top-20 uses a rank window over the tiny pair table with a
deterministic (count desc, pair asc) tie-break.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from history_collector_spark.catalog import table
from history_collector_spark.functions.nlp import tokens
from history_collector_spark.registry import register

TOP_PAIRS = 20


@register(
    "bpe_merge_step",
    oracle=f"""
    WITH words AS (
      SELECT w, CAST(count(*) AS BIGINT) AS wc
      FROM documents, UNNEST(string_split_regex(text, '\\s+')) AS u(w)
      WHERE w != ''
      GROUP BY w
    ),
    pairs AS (
      SELECT substr(w, i, 1) AS a, substr(w, i + 1, 1) AS b,
             CAST(sum(wc) AS BIGINT) AS pair_count
      FROM words, UNNEST(range(1, len(w))) AS v(i)
      GROUP BY a, b
    ),
    ranked AS (
      SELECT a, b, pair_count,
             row_number() OVER (ORDER BY pair_count DESC, a, b) AS rn
      FROM pairs
    )
    SELECT a, b, pair_count, CAST(rn AS INT) AS rank
    FROM ranked WHERE rn <= {TOP_PAIRS}
    """,
)
def bpe_merge_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")

    words = (
        docs.select(F.explode(tokens(F.col("text"))).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count("*").alias("wc"))
    )

    # Adjacent character pairs of each distinct word, map-only: split
    # to a bound char array, then a transform over positions.
    chars = words.select("w", "wc", F.split("w", "").alias("cs"))
    pair_structs = F.when(
        F.size("cs") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size("cs") - 1),
            lambda i: F.struct(
                F.element_at("cs", i).alias("a"),
                F.element_at("cs", i + 1).alias("b"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))

    pairs = (
        chars.select("wc", F.explode(pair_structs).alias("p"))
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("wc").alias("pair_count"))
    )

    w = Window.orderBy(F.desc("pair_count"), "a", "b")
    return (
        pairs.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= TOP_PAIRS)
        .select("a", "b", "pair_count", "rank")
    )


# ---------------------------------------------------------------------------
# BPE apply: train a merge table, then tokenize the corpus with it.
# The deep-scale observation: a word's encoding depends only on the
# WORD, so the corpus is never re-encoded occurrence by occurrence —
# encode the VOCABULARY (bounded, zipf-small next to the corpus) in one
# Arrow-batched pass, then attach subword counts to documents with a
# broadcast join and aggregate. Python touches vocab-sized data only.
# ---------------------------------------------------------------------------

N_MERGES = 50
# Above this vocabulary size, merge training switches from the
# driver-side loop to the distributed trainer (round 14; formerly a
# hard refusal). Below it the driver loop is cheaper: one collect and
# zero extra Spark jobs.
VOCAB_CAP = 1_000_000


def _learn_merges(
    word_counts: list[tuple[str, int]], n_merges: int = N_MERGES
) -> list[tuple[str, str]]:
    """Classic BPE training loop over the word-count table (Sennrich et
    al. 2016): repeatedly merge the most frequent adjacent symbol pair.
    Runs on the driver — the input is the VOCABULARY with counts, the
    same bounded-small data class as k-means centroids; corpus text
    never reaches the driver. Ties break lexicographically so training
    is deterministic."""
    vocab: dict[tuple[str, ...], int] = {
        tuple(w): c for w, c in word_counts if w
    }
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for sym, c in vocab.items():
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + c
        if not pairs:
            break
        best = max(pairs.items(), key=lambda kv: (kv[1], kv[0][0], kv[0][1]))
        # strictly-greater wins; among equals the lexicographically
        # LAST pair — any fixed rule works, it just must be fixed
        (a, b), _cnt = best
        merges.append((a, b))
        merged = a + b
        new_vocab: dict[tuple[str, ...], int] = {}
        for sym, c in vocab.items():
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + c
        vocab = new_vocab
    return merges


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply merges by rank (lowest-rank pair first) — the standard
    BPE inference loop."""
    sym = list(word)
    while len(sym) >= 2:
        cand = [
            (ranks[(x, y)], i)
            for i, (x, y) in enumerate(zip(sym, sym[1:]))
            if (x, y) in ranks
        ]
        if not cand:
            break
        _, i = min(cand)
        sym[i : i + 2] = [sym[i] + sym[i + 1]]
    return sym


def _adjacent_pair_structs(sym_col: str) -> F.Column:
    """array<string> symbols -> array of adjacent (a, b) structs
    (empty for 1-symbol words) — the map-only pair fan-out both the
    merge-step query and the distributed trainer share."""
    return F.when(
        F.size(sym_col) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(sym_col) - 1),
            lambda i: F.struct(
                F.element_at(sym_col, i).alias("a"),
                F.element_at(sym_col, i + 1).alias("b"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))


def _learn_merges_distributed(
    words: DataFrame, n_merges: int = N_MERGES
) -> list[tuple[str, str]]:
    """Distributed BPE training (Sennrich et al. 2016 at corpus scale):
    the vocabulary table never leaves the cluster. Each iteration is

      1. one vocab-keyed pair-count aggregation (map-side combined;
         shuffle keys are symbol PAIRS, alphabet-squared-ish small) and
         a 1-ROW collect of the winner — the only data that ever
         reaches the driver is the winning pair per iteration;
      2. one map-only fold over every word's symbol array applying the
         merge left-to-right non-overlapping (a CASE-gated
         F.aggregate — provably equivalent to the driver loop's
         scan, pinned by tests/test_round14.py's equivalence test).

    localCheckpoint() truncates the 50-fold lineage each iteration so
    the plan stays constant-size. Tie-break matches _learn_merges
    exactly: among equal counts the lexicographically LAST pair wins
    (ORDER BY count DESC, a DESC, b DESC), and Spark's UTF8 ordering
    agrees with Python's code-point string comparison."""
    vocab = (
        words.filter(F.col("w") != "")
        .select(F.split("w", "").alias("sym"), F.col("wc").cast("long"))
        .localCheckpoint()
    )
    merges: list[tuple[str, str]] = []
    try:
        for _ in range(n_merges):
            top = (
                vocab.select("wc", F.explode(
                    _adjacent_pair_structs("sym")).alias("p"))
                .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
                .agg(F.sum("wc").alias("c"))
                .orderBy(F.desc("c"), F.desc("a"), F.desc("b"))
                .limit(1)
                .collect()  # BOUNDED: exactly one winner row
            )
            if not top:
                break
            a, b = top[0]["a"], top[0]["b"]
            merges.append((a, b))
            merged = a + b
            # left-to-right non-overlapping merge, JVM-side: append s,
            # unless the previous output symbol is `a` and s is `b` —
            # then replace that tail element with the merged token.
            # CASE branches evaluate lazily, so element_at never sees
            # an empty array.
            new_sym = F.aggregate(
                "sym",
                F.array().cast("array<string>"),
                lambda acc, s: F.when(
                    F.size(acc) == 0, F.array(s)
                )
                .when(
                    (F.element_at(acc, -1) == F.lit(a)) & (s == F.lit(b)),
                    F.concat(
                        F.slice(acc, F.lit(1), F.size(acc) - 1),
                        F.array(F.lit(merged)),
                    ),
                )
                .otherwise(F.concat(acc, F.array(s))),
            )
            old = vocab
            vocab = old.select(new_sym.alias("sym"), "wc").localCheckpoint()
            old.unpersist()
    finally:
        vocab.unpersist()
    return merges


def _bpe_fold(symstr: str, a: str, b: str) -> str:
    """DuckDB expression: apply merge pair (``a``, ``b``) to a
    chr(31)-joined symbol string, globally, left-to-right,
    non-overlapping — the exact scan the Spark-side F.aggregate fold
    and the driver loop perform. The accumulator is the joined-so-far
    string; the previous symbol is ``a`` iff the accumulator IS ``a``
    or ends with separator+``a`` (symbols never contain the
    separator), in which case appending ``b`` bare fuses the pair."""
    return f"""list_reduce(
        list_prepend('', string_split({symstr}, chr(31))),
        (acc, x) -> CASE
          WHEN acc = '' THEN x
          WHEN (acc = {a} OR ends_with(acc, chr(31) || {a})) AND x = {b}
            THEN acc || {b}
          ELSE acc || chr(31) || x END)"""


def _bpe_encode_oracle() -> str:
    """Lockstep DuckDB replay of the full train-then-encode pipeline.

    Every step is exact integer/string arithmetic, so the two engines
    agree bit-for-bit (the kmeans-train recipe, minus the floats):

    1. TRAIN — a recursive CTE whose state is ONE row per iteration
       carrying the whole vocabulary as a list of (symstr, wc)
       structs. Each step unnests the vocab, counts adjacent symbol
       pairs weighted by word count, picks the argmax with the
       trainer's exact tie-break (count DESC, a DESC, b DESC — the
       lexicographically LAST pair wins among ties), and applies the
       winner to every word with the shared fold. Recursion ends
       early, like the driver loop, when no pair remains.
    2. ENCODE — encode_word repeatedly merges the lowest-ranked pair
       present; that is EQUIVALENT to applying the learned merges in
       rank order, each globally left-to-right non-overlapping,
       because a merge can only create pairs of strictly higher rank
       than itself (any learned pair containing the merged symbol was
       learned after it) and can never resurrect a lower-ranked one
       (pinned by tests/test_round15.py's randomized equivalence
       test). So the second recursive CTE folds merges 1..N over the
       distinct-word frame.
    3. JOIN — per-doc word and subword totals, identical to the Spark
       side's explode + broadcast join.

    chr(31) (US, the unit separator) is the symbol delimiter; no
    document in the corpus contains it (asserted in tests).
    """
    charsplit = (
        "array_to_string(list_transform("
        "range(1, len(w) + 1), i -> w[i]), chr(31))"
    )
    argmax = """list_reduce(
      list(struct_pack(c := c, a := a, b := b)),
      (acc, x) -> CASE WHEN x.c > acc.c
                       OR (x.c = acc.c AND (x.a > acc.a
                           OR (x.a = acc.a AND x.b > acc.b)))
                  THEN x ELSE acc END)"""
    return f"""
    WITH RECURSIVE
    words AS (
      SELECT w, CAST(count(*) AS BIGINT) AS wc
      FROM documents, UNNEST(string_split_regex(text, '\\s+')) AS u(w)
      WHERE w != ''
      GROUP BY w
    ),
    train AS (
      SELECT 0 AS it,
             list(struct_pack(s := {charsplit}, wc := wc)) AS vocab,
             CAST(NULL AS VARCHAR) AS ma, CAST(NULL AS VARCHAR) AS mb
      FROM words
      UNION ALL
      SELECT it + 1,
             list_transform(vocab, v -> struct_pack(
               s := {_bpe_fold('v.s', 'best.a', 'best.b')}, wc := v.wc)),
             best.a, best.b
      FROM (
        SELECT it, any_value(vocab) AS vocab, {argmax} AS best
        FROM (
          SELECT t.it AS it, any_value(t.vocab) AS vocab,
                 p.a AS a, p.b AS b, CAST(sum(p.wc) AS BIGINT) AS c
          FROM train t,
               LATERAL (
                 SELECT sym[i] AS a, sym[i+1] AS b, wc
                 FROM (SELECT unnest(t.vocab) AS v),
                      LATERAL (SELECT string_split(v.s, chr(31)) AS sym,
                                      v.wc AS wc),
                      LATERAL (SELECT unnest(range(1, len(sym))) AS i)
               ) p
          WHERE t.it < {N_MERGES}
          GROUP BY t.it, p.a, p.b
        ) pc
        GROUP BY it
      ) agg
    ),
    merges AS (SELECT it AS rnk, ma, mb FROM train WHERE it >= 1),
    n_m AS (SELECT count(*) AS n FROM merges),
    enc AS (
      SELECT 0 AS r, w, {charsplit} AS symstr FROM words
      UNION ALL
      SELECT e.r + 1, e.w, {_bpe_fold('e.symstr', 'm.ma', 'm.mb')}
      FROM enc e JOIN merges m ON m.rnk = e.r + 1
    ),
    encoded AS (
      SELECT w, len(string_split(symstr, chr(31))) AS n_subwords
      FROM enc WHERE r = (SELECT n FROM n_m)
    )
    SELECT d.doc_id,
           CAST(count(*) AS BIGINT) AS n_words,
           CAST(sum(e.n_subwords) AS BIGINT) AS n_subwords
    FROM (SELECT doc_id, w
          FROM documents, UNNEST(string_split_regex(text, '\\s+')) AS u(w)
          WHERE w != '') d
    JOIN encoded e USING (w)
    GROUP BY d.doc_id
    """


@register("bpe_encode_corpus", oracle=_bpe_encode_oracle())
def bpe_encode_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus tokenization with a trained BPE table.

    Plan: (1) word counts — one vocab-keyed map-side-combined agg;
    (2) merge training: driver-side over the collected vocab while it
    fits (<= VOCAB_CAP), else the DISTRIBUTED trainer (round 14) whose
    per-iteration driver traffic is ONE winning-pair row — no vocab
    size refuses any more; (3) vocab ENCODE via Arrow-batched
    mapInPandas — Python cost is O(vocab), not O(corpus); (4) per-doc
    subword totals by exploding words and broadcast-joining the vocab
    encode table. At 100 TB the corpus is touched twice by scans and
    never by Python.
    """
    import pandas as pd

    docs = table(spark, sf_dir, "documents")
    words = (
        docs.select(F.explode(tokens(F.col("text"))).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count("*").alias("wc"))
    )
    n_vocab = words.count()
    if n_vocab > VOCAB_CAP:
        merges = _learn_merges_distributed(words)
    else:
        wc = [(r["w"], r["wc"]) for r in words.collect()]
        merges = _learn_merges(wc)
    ranks = {pair: i for i, pair in enumerate(merges)}
    bc = spark.sparkContext.broadcast(ranks)

    def encode_batches(batches):
        r = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            yield pd.DataFrame(
                {
                    "w": pdf["w"],
                    "n_subwords": [
                        len(encode_word(w, r)) for w in pdf["w"]
                    ],
                }
            )

    encoded = words.select("w").mapInPandas(
        encode_batches, schema="w string, n_subwords int"
    )

    doc_words = docs.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("w")
    ).filter(F.col("w") != "")
    return (
        doc_words.join(F.broadcast(encoded), "w")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_words"),
            F.sum("n_subwords").cast("long").alias("n_subwords"),
        )
    )
