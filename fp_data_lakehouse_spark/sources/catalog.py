"""Table catalog over the driver parquet fixtures.

The reference's "sources" are a directory scan of PDFs plus hand-rolled
JDBC sinks (SURVEY.md §2.1, reference ETL_FINAL.py:137-145). Here every
table is a columnar parquet scan — Catalyst pushes predicates and prunes
columns into the scan, which is the 100 TB-relevant property: a query
touching 2 columns of lineitem must read 2 columns, not 11.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import tune

TABLES = (
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
)

# Tiny dimension tables that should always broadcast in star joins.
BROADCAST_TABLES = frozenset({"region", "nation", "customer", "supplier", "part"})


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Lazy parquet scan of one fixture table.

    The events fixture's ``ts`` physical type has varied across driver
    generations — TIMESTAMP(NANOS) (admitted only as a raw long via
    nanosAsLong, set in session.tune) and plain timestamp[us] (read as
    TIMESTAMP_NTZ). Normalize both here so every consumer sees one
    TimestampType column; session TZ is pinned UTC, so the ntz→ltz cast
    is value-preserving.
    """
    tune(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            # integer division: nanos ~1.7e18 exceed double precision (2^53)
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    # Any remaining TIMESTAMP_NTZ column (events.ts, orders.o_orderdate, ...)
    # becomes TimestampType: several time functions (unix_micros,
    # unix_timestamp) reject NTZ, and the UTC session TZ makes the cast
    # value-preserving.
    for col, dtype in df.dtypes:
        if dtype == "timestamp_ntz":
            df = df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in names}


def register_views(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> None:
    """Register the fixture tables as temp views for spark.sql queries."""
    for name, df in load_tables(spark, sf_dir, names).items():
        df.createOrReplaceTempView(name)
