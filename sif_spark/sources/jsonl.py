"""JSONL source with gjson-style dotted-path columns.

Reference: ``jsonl.CreateParser`` (datasource/parser/jsonl/jsonl_parser.go:10-32)
— column names are gjson dotted paths (``meta.uuid``) evaluated against
the raw JSON line, yielding flat columns; missing paths become nil
(jsonl_utils.go:13-17). Spark parses nested JSON natively, so we read
with real StructType nesting and (optionally) flatten the requested
dotted paths to reproduce the reference's flat output schema — dotted
access itself is free in Spark (``F.col("meta.uuid")``).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import SparkSession, functions as F, types as T

from sif_spark.frame import SifFrame


@dataclass(frozen=True)
class JSONLConf:
    """jsonl_parser.go:25-30 config. PartitionSize/MaxBufferSize are input
    split details Spark sizes in bytes instead."""

    multiline: bool = False


def read_jsonl(
    spark: SparkSession,
    glob: str,
    schema: T.StructType | None = None,
    paths: list[str] | None = None,
    conf: JSONLConf | None = None,
) -> SifFrame:
    """Read JSON-lines. ``paths`` is the reference idiom: a list of dotted
    paths (e.g. ``["coords.x", "date"]``) flattened into columns named by
    the path, nil when absent — matching jsonl_utils.go:53-61 semantics.
    """
    conf = conf or JSONLConf()
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    reader = reader.option("multiLine", str(conf.multiline).lower())
    df = reader.json(glob)
    if paths:
        df = df.select(*[F.col(p).alias(p) for p in paths])
    return SifFrame(df)
