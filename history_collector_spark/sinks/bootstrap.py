"""Storage bootstrap / catalog init — S9+S10 of SURVEY.md §2.1.

The reference's build_database.py creates the database, generates DDL
from the shared schema dicts, and seeds the `lastfile` checkpoint
(python/build_database.py:30-89); build_s3_storage.py seeds `last_file`
(python/build_s3_storage.py:25-69). Spark translation: catalog database
+ tables from the same StructTypes the writers use (schemas.py), plus
the FIRST_FILE alignment check ((seq+1) % 64 == 0,
python/build_database.py:24-27). GRANT/user management stays a deploy
concern (explicitly not ported, SURVEY.md §7).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from history_collector_spark.schemas import (
    create_table_ddl,
    creations_schema,
    lastfile_schema,
    payments_schema,
)
from history_collector_spark.sources.xdr import is_valid_file_seq


def bootstrap_storage(
    spark: SparkSession,
    database: str = "hcs",
    first_file: str = "0000003f",
) -> None:
    """Idempotent: existing database/tables short-circuit, like the
    reference's existence probe (python/build_database.py:38-47)."""
    if not is_valid_file_seq(first_file):
        raise ValueError(
            f"FIRST_FILE {first_file!r} is not 64-ledger aligned "
            "((seq+1) % 64 must be 0, python/build_database.py:24-27)"
        )
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {database}")
    for name, schema in (
        ("payments", payments_schema()),
        ("creations", creations_schema()),
        ("lastfile", lastfile_schema()),
    ):
        spark.sql(create_table_ddl(f"{database}.{name}", schema))
    # seed the checkpoint only on first creation
    if spark.table(f"{database}.lastfile").isEmpty():
        spark.createDataFrame([(first_file,)], lastfile_schema()).write.insertInto(
            f"{database}.lastfile"
        )
