"""In-memory source — the reference's test workhorse.

Reference: ``memory.CreateDataFrame`` (datasource/memory/memory_datasource.go:14-19)
— static [][]byte buffers, one partition loader per buffer. Spark:
``spark.createDataFrame`` over local rows (Arrow path for pandas).
"""

from __future__ import annotations

from collections.abc import Iterable
from typing import Any

import pandas as pd
from pyspark.sql import SparkSession, types as T

from sif_spark.frame import SifFrame


def from_rows(
    spark: SparkSession,
    rows: Iterable[Any],
    schema: T.StructType | str,
    num_partitions: int | None = None,
) -> SifFrame:
    df = spark.createDataFrame(list(rows), schema=schema)
    if num_partitions:
        df = df.repartition(num_partitions)
    return SifFrame(df)


def from_pandas(spark: SparkSession, pdf: pd.DataFrame, schema: T.StructType | None = None) -> SifFrame:
    return SifFrame(spark.createDataFrame(pdf, schema=schema))
