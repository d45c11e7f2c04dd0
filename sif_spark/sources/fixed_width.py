"""Fixed-width text source/sink — the mainframe/enterprise-export
format the DSV parser family doesn't cover: columns live at byte
offsets, not behind delimiters.

Reference parity note: go-sif's `datasource/parser` extension point
(datasource/parser/dsv/...) is exactly where a user would hang this;
here it is substring/trim/cast expressions over `spark.read.text` —
fully codegen'd, zero Python, and the scan splits by line like any
text source, so parallelism is unconstrained at 100 TB. NULLs write
as all-pad fields and read back as NULL (the NilValue contract of
dsv_utils.go:16-18, positionally encoded).

Widths are the caller's contract: a value longer than its field
raises at write time (truncation would silently corrupt the
round-trip) — the same strictness ANSI mode gives arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from sif_spark.frame import SifFrame

ColSpec = tuple[str, int, str]  # (name, width, spark type)


def write_fixed_width(
    df: DataFrame, path: str, widths: list[tuple[str, int]]
) -> None:
    """Write one left-aligned, space-padded line per row. NULL fields
    are written as all spaces. Overflowing values error (ANSI-style
    loudness beats silent truncation)."""
    fields = []
    for name, width in widths:
        s = F.col(name).cast("string")
        padded = F.rpad(F.coalesce(s, F.lit("")), width, " ")
        guarded = F.when(F.length(s) > width, F.raise_error(
            F.concat(
                F.lit(f"fixed-width overflow in column '{name}' (width {width}): "),
                s,
            )
        ).cast("string")).otherwise(padded)
        fields.append(guarded)
    df.select(F.concat(*fields).alias("value")).write.mode("overwrite").text(path)


def read_fixed_width(
    spark: SparkSession, path: str, colspecs: list[ColSpec]
) -> SifFrame:
    """Parse fixed-width lines back into typed columns: substring at
    the accumulated offsets, trim the padding, empty → NULL, cast.
    One codegen projection over the text scan — no UDFs, no shuffle."""
    lines = spark.read.text(path)
    cols = []
    pos = 1
    for name, width, dtype in colspecs:
        raw = F.trim(F.substring(F.col("value"), pos, width))
        cols.append(
            F.when(raw == "", None).otherwise(raw).cast(dtype).alias(name)
        )
        pos += width
    return SifFrame(lines.select(*cols))
