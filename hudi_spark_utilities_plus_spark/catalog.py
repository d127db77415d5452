"""Lake-table catalog over the driver-generated parquet testdata.

Tables (TESTDATA.md): TPC-H-ish star schema + ``events`` stream table +
LLM-pipeline fixtures ``documents`` / ``embeddings``. At 100 TB these are
hive-partitioned lake tables; here they are single parquet files, read
through the same declarative scan so Catalyst pushdown applies either way.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def _nanos_ts_columns(path: str) -> list[str]:
    """Columns stored as parquet TIMESTAMP(NANOS), which Spark's vectorized
    reader rejects (PARQUET_TYPE_ILLEGAL). Footer-only read, driver-side."""
    try:
        import pyarrow.parquet as pq

        schema = pq.read_schema(path)
        return [
            f.name
            for f in schema
            if str(f.type).startswith("timestamp[ns")
        ]
    except Exception:
        return []


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = os.path.join(sf_dir, f"{name}.parquet")
    nanos = _nanos_ts_columns(path)
    if nanos:
        # Read nanos as raw int64 then truncate to micros (integer `div`,
        # no double round-trip — 2024 epoch-nanos exceed double precision),
        # matching DuckDB's nanos→micros truncation.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    for c in nanos:
        df = df.withColumn(c, F.expr(f"timestamp_micros(`{c}` div 1000)"))
    return df


def load_tables(
    spark: SparkSession,
    sf_dir: str,
    names: list[str] | None = None,
    register: bool = True,
) -> dict[str, DataFrame]:
    """Load tables as DataFrames; optionally register temp views so the
    SQL-transform hook (operators.transform) can reference them."""
    out: dict[str, DataFrame] = {}
    for name in names or TABLES:
        df = load_table(spark, sf_dir, name)
        if register:
            df.createOrReplaceTempView(name)
        out[name] = df
    return out
