"""Skew/bucketing utilities: result parity for salted joins, and the
physical plan proof that bucketed joins eliminate the shuffle."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from history_collector_spark.functions.skew import (
    bucketed_join,
    has_shuffle,
    salted_join,
    write_bucketed,
)


def test_salted_join_matches_plain_join(spark):
    # skewed left: 90% of rows share key 1
    left = spark.range(1000).select(
        F.when(F.col("id") < 900, 1).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("v"),
    )
    right = spark.createDataFrame(
        [(1, "hot"), (950, "cold")], "k long, tag string"
    )
    plain = {
        (r.k, r.v, r.tag) for r in left.join(right, "k").collect()
    }
    salted = {
        (r.k, r.v, r.tag) for r in salted_join(left, right, "k").collect()
    }
    assert salted == plain
    assert len(salted) == 901  # 900 hot + 1 cold


def test_salted_left_join_keeps_misses(spark):
    left = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    right = spark.createDataFrame([(1, "x")], "k long, tag string")
    rows = {
        (r.k, r.v, r.tag)
        for r in salted_join(left, right, "k", how="left").collect()
    }
    assert rows == {(1, "a", "x"), (2, "b", None)}


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    a = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("x")
    )
    b = spark.range(500).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("y")
    )
    threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force the shuffle-join code path so the assertion is about
        # bucketing, not about broadcast picking a different plan
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        write_bucketed(a, "bt_a", "k", buckets=8)
        write_bucketed(b, "bt_b", "k", buckets=8)
        joined = bucketed_join(spark, "bt_a", "bt_b", "k")
        assert joined.count() == 500
        # the whole point: same-bucketed equi-join needs no exchange
        assert not has_shuffle(joined)
        # sanity: the identical un-bucketed join DOES shuffle
        plain = a.join(b, "k")
        plain.count()
        assert has_shuffle(plain)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
        spark.sql("DROP TABLE IF EXISTS bt_a")
        spark.sql("DROP TABLE IF EXISTS bt_b")


def test_partition_pruning_on_ledger_layout(spark, tmp_path):
    """The reference's ledger=<seq>/ S3 layout read back through Spark
    prunes partitions at plan time (SURVEY §4 'partition pruning')."""
    out = str(tmp_path / "ledgers")
    df = spark.range(300).select(
        (F.col("id") % 3).alias("ledger"), F.col("id").alias("v")
    )
    df.write.partitionBy("ledger").parquet(out)

    pruned = spark.read.parquet(out).filter(F.col("ledger") == 1)
    assert pruned.count() == 100
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "ledger" in plan.split("PartitionFilters")[1][:200]


def test_compact_shrinks_small_files(spark, tmp_path):
    from history_collector_spark.functions.layout import compact

    src = str(tmp_path / "tiny")
    dst = str(tmp_path / "compacted")
    # 40 tiny files (the one-object-per-ledger shape)
    spark.range(4000).repartition(40).write.parquet(src)
    assert len(list((tmp_path / "tiny").glob("part-*"))) == 40

    n = compact(spark, src, dst, target_rows_per_file=2000)
    assert n == 2
    out_files = list((tmp_path / "compacted").glob("part-*"))
    assert len(out_files) == 2
    assert spark.read.parquet(dst).count() == 4000


def test_range_layout_files_have_disjoint_ranges(spark, tmp_path):
    import pyspark.sql.functions as F
    from history_collector_spark.functions.layout import write_range_layout

    dst = tmp_path / "ranged"
    df = spark.range(10000).select(
        (F.col("id") * 37 % 10000).alias("k"), F.col("id").alias("v")
    )
    write_range_layout(df, str(dst), ["k"], n_files=4)

    files = sorted(dst.glob("part-*"))
    assert len(files) == 4
    spans = []
    for f in files:
        pdf = spark.read.parquet(str(f)).toPandas()
        spans.append((pdf["k"].min(), pdf["k"].max()))
    spans.sort()
    # each file covers its own key range -> footer min/max prunes files
    for (lo_a, hi_a), (lo_b, hi_b) in zip(spans, spans[1:]):
        assert hi_a < lo_b
    assert spark.read.parquet(str(dst)).count() == 10000


def test_scoped_shuffle_partitions_restores_on_exception(spark):
    from history_collector_spark.functions.scope import (
        scoped_shuffle_partitions,
    )

    key = "spark.sql.shuffle.partitions"
    before = spark.conf.get(key)
    try:
        with scoped_shuffle_partitions(spark, 3):
            assert spark.conf.get(key) == "3"
            raise RuntimeError("boom")
    except RuntimeError:
        pass
    assert spark.conf.get(key) == before


def test_pair_and_candidate_tables_memoize_per_corpus(spark):
    """Same (session, sf_dir) returns the identical persisted frame;
    a different sf_dir builds its own."""
    from history_collector_spark.queries.dedup import (
        candidate_pair_table,
        verified_pair_table,
    )

    a1 = candidate_pair_table(spark, "/root/testdata/sf0.001")
    a2 = candidate_pair_table(spark, "/root/testdata/sf0.001")
    assert a1 is a2
    v1 = verified_pair_table(spark, "/root/testdata/sf0.001")
    v2 = verified_pair_table(spark, "/root/testdata/sf0.001")
    assert v1 is v2
    assert v1.is_cached
