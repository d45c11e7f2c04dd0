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


def read_jsonl_decoded(
    spark: SparkSession,
    glob: str,
    decoder,
    schema: T.StructType | None = None,
    paths: list[str] | None = None,
) -> SifFrame:
    """JSONL with a whole-file pre-pass decoder — the reference's
    ``DataSourceConf.Decoder`` (``func([]byte)([]byte,error)``,
    datasource/file/file_datasource.go:24-28) composes with ANY parser,
    jsonl included; this is the jsonl companion to ``read_dsv_decoded``
    (VERDICT r4 "Next round" #7).

    Spark mapping: ``binaryFile`` scan → Arrow-batched whole-file
    decode + line split (Python touches only the opaque bytes the
    decoder must see) → JVM-side ``from_json`` against the explicit
    schema → the same dotted-path flattening as ``read_jsonl``. JSON
    parsing stays in codegen; only the byte-level decode — which no
    JVM codec covers, or it should use plain ``read_jsonl`` with a
    standard compression codec — runs in Python.

    Files are the parallelism unit (as in the reference's per-file
    loader). ``schema=None`` infers from the decoded lines (one extra
    pass); the reference never infers, and neither should production
    callers."""
    from collections.abc import Iterator

    import pandas as pd

    binary = spark.read.format("binaryFile").load(glob).select("content")

    def decode(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            for blob in pdf["content"]:
                text = decoder(bytes(blob)).decode("utf-8")
                lines = [ln for ln in text.splitlines() if ln.strip()]
                if lines:
                    yield pd.DataFrame({"line": lines})

    lines = binary.mapInPandas(decode, "line string")
    if schema is None:
        schema = spark.read.json(
            lines.rdd.map(lambda r: r["line"])
        ).schema
    df = lines.select(F.from_json("line", schema).alias("data")).select("data.*")
    if paths:
        df = df.select(*[F.col(p).alias(p) for p in paths])
    return SifFrame(df)
