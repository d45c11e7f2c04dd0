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
