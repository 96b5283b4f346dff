"""Single source of schema truth — the one reference idea kept as-is.

The reference declares its output schemas once as ordered dicts shared
by DDL generation and the writers
(python/adapters/hc_storage_adapter.py:61-99,
python/build_database.py:64-74). Here the same role is played by
StructTypes: the sinks, the DDL generator, the streaming ingest and
the tests all import from this module.

Column renames between the abstract and the physical (Postgres-style)
schema mirror convert_payment
(python/adapters/postgres_storage_adapter.py:56-88): memo->memo_text,
tx_fee->fee, tx_charged_fee->fee_charged, op_index->operation_index,
tx_hash->hash, timestamp->time.

Money stays DOUBLE for reference bit-compat; DECIMAL_MONEY switches the
amount columns to DecimalType(20, 5) (the reference's own Kin3 TODO,
python/adapters/postgres_storage_adapter.py:100).
"""

from __future__ import annotations

from pyspark.sql.types import (
    DecimalType,
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

DECIMAL_MONEY = False


def _money():
    return DecimalType(20, 5) if DECIMAL_MONEY else DoubleType()


def payments_schema() -> StructType:
    """python/adapters/hc_storage_adapter.py:61-78, physical names."""
    return StructType(
        [
            StructField("source", StringType(), nullable=False),
            StructField("destination", StringType(), nullable=False),
            StructField("amount", _money(), nullable=False),
            StructField("memo_text", StringType(), nullable=True),
            StructField("fee", IntegerType(), nullable=False),
            StructField("fee_charged", IntegerType(), nullable=False),
            StructField("operation_index", IntegerType(), nullable=False),
            StructField("tx_status", StringType(), nullable=True),
            StructField("op_status", StringType(), nullable=True),
            StructField("hash", StringType(), nullable=False),
            StructField("time", TimestampType(), nullable=False),
        ]
    )


def creations_schema() -> StructType:
    """python/adapters/hc_storage_adapter.py:80-99: same shape, amount ->
    starting_balance."""
    fields = [
        f if f.name != "amount"
        else StructField("starting_balance", _money(), nullable=False)
        for f in payments_schema().fields
    ]
    return StructType(fields)


def lastfile_schema() -> StructType:
    """The one-row checkpoint table (python/build_database.py:70-74)."""
    return StructType([StructField("name", StringType(), nullable=False)])


def create_table_ddl(name: str, schema: StructType, using: str = "parquet") -> str:
    """S9: DDL generated from the same schema the writers use
    (python/build_database.py:92-96)."""
    return f"CREATE TABLE IF NOT EXISTS {name} ({schema.toDDL()}) USING {using}"


def enforce_nullability(df, schema: StructType):
    """Reject rows violating NOT NULL — the constraint Postgres enforced
    for the reference (python/adapters/postgres_storage_adapter.py:90-130,
    tested at python/tests/test_postgres_storage_adapter.py:54-113).
    Returns (valid_df, rejected_df)."""
    from pyspark.sql import functions as F

    required = [f.name for f in schema.fields if not f.nullable]
    if not required:
        return df, df.limit(0)
    viol = None
    for c in required:
        cond = F.col(c).isNull()
        viol = cond if viol is None else (viol | cond)
    return df.filter(~viol), df.filter(viol)
