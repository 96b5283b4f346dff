"""history_collector_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of
kinecosystem/history-collector (studied read-only; see SURVEY.md), rebuilt
Spark-first: DataFrame/SQL logical plans optimized by Catalyst, Structured
Streaming for the ingest loop, `foreachBatch` for exactly-once dual-table
commits, plus large-scale text/dedup/similarity operators designed for
100 TB partition-parallel execution.
"""

__version__ = "0.1.0"
