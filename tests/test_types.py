"""Type-mapping, schema-builder, and sink round-trip tests."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import types as T

from sif_spark import sif_types
from sif_spark.frame import SifFrame
from sif_spark.sources.memory import from_rows
from sif_spark.sources.parquet import read_parquet


def test_type_mapping_table():
    """SURVEY §1.2: unsigned widen one level; fixed-width strings are
    plain strings; times are timestamps."""
    assert sif_types.UINT8 == T.ShortType()
    assert sif_types.UINT16 == T.IntegerType()
    assert sif_types.UINT32 == T.LongType()
    assert sif_types.UINT64 == T.DecimalType(20, 0)
    assert sif_types.INT64 == T.LongType()
    assert sif_types.STRING == T.StringType()
    assert sif_types.VARBYTES == T.BinaryType()
    assert sif_types.TIME == T.TimestampType()
    assert sif_types.HEATMAP == T.MapType(T.IntegerType(), T.LongType())


def test_go_time_format():
    assert sif_types.go_time_format_to_spark("2006-01-02 15:04:05") == "yyyy-MM-dd HH:mm:ss"
    assert sif_types.go_time_format_to_spark("2006-01-02") == "yyyy-MM-dd"


def test_schema_builder():
    """schema/schema.go:44-60, 201-240: create/rename/remove."""
    schema = (
        sif_types.create_schema()
        .create_column("a", sif_types.INT32)
        .create_column("b", sif_types.VARSTRING)
        .create_column("c", sif_types.FLOAT64)
        .rename_column("b", "name")
        .remove_column("c")
        .build()
    )
    assert [f.name for f in schema.fields] == ["a", "name"]
    assert schema["a"].dataType == T.IntegerType()


def test_schema_builder_duplicate_rejected():
    import pytest

    b = sif_types.create_schema().create_column("a", sif_types.INT32)
    with pytest.raises(ValueError):
        b.create_column("a", sif_types.INT64)


def test_opaque_envelope():
    t = sif_types.opaque({"width": T.IntegerType()})
    assert t.fieldNames() == ["data", "width"]
    assert t["data"].dataType == T.BinaryType()


def test_sink_round_trips(spark):
    """The reference has no write path (SURVEY §2.1) — ours must
    round-trip through every format."""
    d = tempfile.mkdtemp(prefix="sif_sinks_")
    frame = from_rows(spark, [(1, "a"), (2, "b")], "id int, name string")
    frame.write_parquet(os.path.join(d, "p"))
    frame.write_csv(os.path.join(d, "c"))
    frame.write_json(os.path.join(d, "j"))
    back_p = read_parquet(spark, os.path.join(d, "p")).collect()
    assert sorted((r["id"], r["name"]) for r in back_p) == [(1, "a"), (2, "b")]
    back_c = spark.read.option("header", "true").csv(os.path.join(d, "c")).collect()
    assert len(back_c) == 2
    back_j = spark.read.json(os.path.join(d, "j")).collect()
    assert sorted(r["name"] for r in back_j) == ["a", "b"]


def test_partitioned_write(spark):
    d = tempfile.mkdtemp(prefix="sif_partw_")
    frame = from_rows(spark, [(1, "x"), (2, "y"), (3, "x")], "id int, part string")
    frame.write_parquet(os.path.join(d, "t"), partition_by=["part"])
    assert sorted(
        p for p in os.listdir(os.path.join(d, "t")) if p.startswith("part=")
    ) == ["part=x", "part=y"]
    back = read_parquet(spark, os.path.join(d, "t"))
    assert back.count() == 3
