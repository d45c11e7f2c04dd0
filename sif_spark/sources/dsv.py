"""DSV (delimiter-separated values) source.

Reference: ``dsv.CreateParser`` (datasource/parser/dsv/dsv_parser.go:11-33)
with config {PartitionSize, HeaderLines, Delimiter, Comment, NilValue},
combined with ``file.CreateDataFrame`` globs
(datasource/file/file_datasource.go:24-47). Spark's CSV reader covers
every knob; per-type parsing (dsv_utils.go:12-116) is the reader's cast
path with an explicit schema (the reference never infers — neither do we
by default).

Scale note: the reference splits work one-file-per-loader; Spark splits
by byte ranges (``spark.sql.files.maxPartitionBytes``), which is what
you want at 100 TB — no dependence on file-count granularity.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import SparkSession, types as T

from sif_spark.frame import SifFrame


@dataclass(frozen=True)
class DSVConf:
    """Reference parser config (dsv_parser.go:11-17) → Spark CSV options."""

    delimiter: str = ","        # Delimiter
    header_lines: int = 0       # HeaderLines (Spark: header bool; >1 unsupported)
    comment: str | None = None  # Comment prefix char
    nil_value: str = ""         # NilValue (dsv_utils.go:16-18)
    # PartitionSize (rows/partition, default 128) has no Spark equivalent —
    # input split sizing is byte-based; see module docstring.


def read_dsv(
    spark: SparkSession,
    glob: str,
    schema: T.StructType,
    conf: DSVConf | None = None,
) -> SifFrame:
    conf = conf or DSVConf()
    reader = (
        spark.read.schema(schema)
        .option("sep", conf.delimiter)
        .option("header", "true" if conf.header_lines > 0 else "false")
        .option("nullValue", conf.nil_value)
        .option("mode", "PERMISSIVE")
    )
    if conf.comment:
        reader = reader.option("comment", conf.comment)
    return SifFrame(reader.csv(glob))


def read_dsv_decoded(
    spark: SparkSession,
    glob: str,
    schema: T.StructType,
    decoder,
    conf: DSVConf | None = None,
) -> SifFrame:
    """DSV with a whole-file pre-pass decoder — the reference's
    ``DataSourceConf.Decoder`` (``func([]byte)([]byte,error)``,
    datasource/file/file_datasource.go:24-47, applied per file in
    file_datasource_partitionloader.go:26-57). Spark mapping:
    ``binaryFile`` scan → decode each file's bytes in an Arrow batch →
    parse the decoded text with pandas, yielding rows of ``schema``.

    Files are the parallelism unit here (as in the reference); use the
    plain ``read_dsv`` + a standard codec when possible — Spark's
    native line-splitting beats per-file decoding for splittable
    formats.
    """
    import io as _io
    from collections.abc import Iterator

    import pandas as pd

    conf = conf or DSVConf()
    names = [f.name for f in schema.fields]
    # Integral columns parse straight into pandas' NULLABLE Int64/Int32
    # — never through float64. (Parsing int-then-promote-on-NaN would
    # silently round BIGINTs above 2^53 in any column that also holds a
    # nil; reference NilValue semantics, dsv_utils.go:16-18, are exact.)
    int_dtypes = {
        f.name: "Int64" if isinstance(f.dataType, T.LongType) else "Int32"
        for f in schema.fields
        if isinstance(f.dataType, (T.LongType, T.IntegerType))
    }
    binary = spark.read.format("binaryFile").load(glob).select("content")

    def parse(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            for blob in pdf["content"]:
                decoded = decoder(bytes(blob))
                yield pd.read_csv(
                    _io.BytesIO(decoded),
                    sep=conf.delimiter,
                    names=names,
                    header=0 if conf.header_lines > 0 else None,
                    comment=conf.comment,
                    # Empty fields are nil alongside the configured token
                    # (a non-empty nil_value alone would make any empty
                    # cell a hard parse error in the nullable-int dtype
                    # columns, ADVICE r3) — matching read_dsv, where the
                    # Spark CSV reader nulls empty non-string fields
                    # regardless of nullValue.
                    na_values=list({conf.nil_value, ""}),
                    keep_default_na=False,
                    dtype=int_dtypes or None,
                )

    return SifFrame(binary.mapInPandas(parse, schema))
