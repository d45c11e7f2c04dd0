"""XML source/sink (Spark 4 native `xml` format).

Reference parity note: go-sif ships DSV and JSONL parsers behind its
`datasource/parser` extension point (datasource/parser/...); XML is
the same contract served by Spark's built-in StAX reader — schema'd
row extraction by `rowTag`, predicate/projection handled by Catalyst
after parse. At 100 TB the scan parallelism is per-file (XML is not
splittable mid-document), so shard the corpus into many files —
exactly how every large XML dump (e.g. Wikipedia) already ships.

Spark's own `avro` format stays environment-blocked here (external
spark-avro jar absent), but round 9 closed the gap from scratch:
`sources/avro.py` is a pure-Python Avro OCF reader/writer (q156).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from sif_spark.frame import SifFrame


def read_xml(
    spark: SparkSession,
    path: str,
    row_tag: str,
    schema: str | None = None,
) -> SifFrame:
    """Read XML documents into rows: every ``<row_tag>`` element
    becomes one row; nested elements surface as struct columns (dotted
    projection works like the JSONL source). Pass ``schema`` (DDL
    string) to pin types — inference reads the data twice."""
    r = spark.read.format("xml").option("rowTag", row_tag)
    if schema:
        r = r.schema(schema)
    return SifFrame(r.load(path))


def write_xml(
    df: DataFrame,
    path: str,
    row_tag: str = "row",
    root_tag: str = "rows",
    mode: str = "overwrite",
) -> None:
    """Write rows as XML files (one ``<row_tag>`` element per row,
    wrapped in ``root_tag``)."""
    (
        df.write.mode(mode)
        .format("xml")
        .option("rowTag", row_tag)
        .option("rootTag", root_tag)
        .save(path)
    )
