"""Custom Python DataSource — the reference's extension point, on
Spark's official plugin API.

The reference documents user-defined sources and parsers as a core
extension point (docs/custom-datasources.md, docs/custom-parsers.md,
datasource.go:21-27): implement DataSource/PartitionLoader/Parser and
the framework schedules the loaders. PySpark 4's
``pyspark.sql.datasource`` API is the exact analogue — implement
DataSource/Reader and Spark schedules the partitions — so this module
provides the two reference source archetypes on it:

- batch: ``memory.CreateDataFrame``-style deterministic generator
  partitions (memory_datasource.go:14-19 — one loader per buffer).
- streaming: ``memorystream.CreateDataFrame``-style infinite generator
  pulling ``batch_size`` records per micro-batch
  (memorystream_datasource_partitionloader.go:22-36), with offsets
  tracked by Spark instead of the reference's run-forever loop.

Register once per session, then use like any format:

    register(spark)
    spark.read.format("sif_generator").option("rows", 1000).load()
    spark.readStream.format("sif_generator").option("batch_size", 12).load()
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import SparkSession
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import IntegerType, LongType, StructField, StructType

SCHEMA = StructType(
    [
        StructField("id", LongType(), False),
        StructField("col1", IntegerType(), False),
    ]
)


def _gen_row(i: int, seed: int) -> tuple[int, int]:
    # Deterministic LCG per index — the reference's generator closures
    # are arbitrary; ours must be reproducible for oracle checks.
    state = (i * 6364136223846793005 + seed * 1442695040888963407) % (1 << 64)
    return i, (state >> 33) % 10


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class _GeneratorBatchReader(DataSourceReader):
    def __init__(self, options: dict):
        self.rows = int(options.get("rows", 100))
        self.n_partitions = int(options.get("partitions", 4))
        self.seed = int(options.get("seed", 42))

    def partitions(self) -> list[InputPartition]:
        per = max(1, self.rows // self.n_partitions)
        bounds = list(range(0, self.rows, per)) + [self.rows]
        return [_RangePartition(a, b) for a, b in zip(bounds, bounds[1:])]

    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        for i in range(partition.start, partition.end):
            yield _gen_row(i, self.seed)


class _GeneratorStreamReader(SimpleDataSourceStreamReader):
    """Infinite generator stream: each micro-batch advances the offset
    by ``batch_size`` rows — memorystream parity with exactly-once
    offsets (the reference just loops and re-reads forever)."""

    def __init__(self, options: dict):
        self.batch_size = int(options.get("batch_size", 12))
        self.seed = int(options.get("seed", 42))
        # Optional bound: beyond max_rows the generator idles (empty
        # batches, offset parked) — lets tests/catalog entries drain a
        # finite prefix deterministically. Unset = infinite, the
        # reference's run-forever semantics.
        self.max_rows = int(options["max_rows"]) if "max_rows" in options else None

    def initialOffset(self) -> dict:
        return {"index": 0}

    def read(self, start: dict):
        begin = start["index"]
        end = begin + self.batch_size
        if self.max_rows is not None:
            end = min(end, self.max_rows)
        rows = [_gen_row(i, self.seed) for i in range(begin, end)]
        return iter(rows), {"index": max(end, begin)}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        return iter(_gen_row(i, self.seed) for i in range(start["index"], end["index"]))


class GeneratorDataSource(DataSource):
    """``sif_generator`` — deterministic generator source, batch + stream."""

    @classmethod
    def name(cls) -> str:
        return "sif_generator"

    def schema(self) -> StructType:
        return SCHEMA

    def reader(self, schema: StructType) -> DataSourceReader:
        return _GeneratorBatchReader(self.options)

    def simpleStreamReader(self, schema: StructType) -> SimpleDataSourceStreamReader:
        return _GeneratorStreamReader(self.options)


def register(spark: SparkSession) -> None:
    spark.dataSource.register(GeneratorDataSource)
