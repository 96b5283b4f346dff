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
