"""Parquet source — the engine's primary columnar format.

The reference has no columnar format at all (row-major fixed-width
partitions only, SURVEY.md §1.1); Parquet is the idiomatic Spark
replacement and the format the project's testdata ships in. Vectorized
reads, predicate pushdown, column pruning and partition pruning are all
built in — `.explain` should show PushedFilters/ReadSchema on every
query built from these readers.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from sif_spark.frame import SifFrame

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def read_parquet(spark: SparkSession, path: str) -> SifFrame:
    return SifFrame(spark.read.parquet(path))


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one of the project's testdata tables as a plain DataFrame.

    The events table stores TIMESTAMP(NANOS), which Spark reads as long
    nanos under ``spark.sql.legacy.parquet.nanosAsLong`` — convert to a
    microsecond TimestampType (truncating, matching DuckDB's ns→µs cast).

    Defensive: the confs are (re)applied here at runtime, not only in
    get_session — callers (e.g. the verification driver) may hand us a
    session built without them, which would otherwise fail the scan
    (PARQUET_TYPE_ILLEGAL) or render the LTZ timestamps in a non-UTC
    session zone and break oracle comparison.
    """
    from pyspark.sql import functions as F, types as T

    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and isinstance(df.schema["ts"].dataType, T.LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return df


def register_views(spark: SparkSession, sf_dir: str, tables: list[str] | None = None) -> None:
    """Register the testdata tables as temp views for spark.sql()."""
    for name in tables or TABLES:
        read_table(spark, sf_dir, name).createOrReplaceTempView(name)
