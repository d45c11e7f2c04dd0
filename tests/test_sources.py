"""Source tests: DSV config surface, whole-file decoder, JSONL dotted
paths, custom Python DataSource (batch + stream)."""

from __future__ import annotations

import gzip
import os
import tempfile

import pytest
from pyspark.sql import functions as F, types as T

from sif_spark.sources.dsv import DSVConf, read_dsv, read_dsv_decoded
from sif_spark.sources.jsonl import read_jsonl, read_jsonl_decoded
from sif_spark.sources import custom as custom_source


@pytest.fixture(scope="module")
def tmpdir():
    return tempfile.mkdtemp(prefix="sif_sources_")


def test_dsv_delimiter_comment_nil(spark, tmpdir):
    """dsv_parser.go config: Delimiter, Comment, NilValue, HeaderLines."""
    p = os.path.join(tmpdir, "data.dsv")
    with open(p, "w") as f:
        f.write("# a comment line\n")
        f.write("1|alpha|2.5\n")
        f.write("2|null|3.5\n")
    schema = T.StructType(
        [
            T.StructField("id", T.IntegerType()),
            T.StructField("name", T.StringType()),
            T.StructField("v", T.DoubleType()),
        ]
    )
    frame = read_dsv(
        spark, p, schema, DSVConf(delimiter="|", comment="#", nil_value="null")
    )
    rows = sorted(frame.collect(), key=lambda r: r["id"])
    assert len(rows) == 2
    assert rows[0]["name"] == "alpha"
    assert rows[1]["name"] is None  # NilValue honored
    assert rows[1]["v"] == 3.5


def test_dsv_decoded_gzip(spark, tmpdir):
    """file_datasource.go Decoder: whole-file pre-pass (gzip here)."""
    p = os.path.join(tmpdir, "data.csv.gz")
    with open(p, "wb") as f:
        f.write(gzip.compress(b"id,name\n1,a\n2,b\n"))
    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("name", T.StringType())]
    )
    frame = read_dsv_decoded(
        spark, p, schema, decoder=gzip.decompress, conf=DSVConf(header_lines=1)
    )
    rows = sorted(frame.collect(), key=lambda r: r["id"])
    assert [(r["id"], r["name"]) for r in rows] == [(1, "a"), (2, "b")]


def test_dsv_decoded_bigint_with_nil_exact(spark, tmpdir):
    """ADVICE r2 (medium): a BIGINT column that also contains a nil must
    not round-trip through float64 — values above 2^53 must survive
    exactly (pandas parses straight into nullable Int64)."""
    big = (1 << 53) + 1  # not representable as float64
    p = os.path.join(tmpdir, "big.csv.gz")
    with open(p, "wb") as f:
        f.write(gzip.compress(f"id,v\n1,{big}\n2,\n3,{big + 2}\n".encode()))
    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("v", T.LongType())]
    )
    frame = read_dsv_decoded(
        spark, p, schema, decoder=gzip.decompress, conf=DSVConf(header_lines=1)
    )
    rows = {r["id"]: r["v"] for r in frame.collect()}
    assert rows == {1: big, 2: None, 3: big + 2}


def test_dsv_decoded_nonempty_nil_token_with_empty_cells(spark, tmpdir):
    """ADVICE r3 (low): a NON-empty nil token (e.g. 'NULL') plus an
    empty cell in a nullable-int column must parse (both read as nil),
    not raise a pandas dtype ValueError."""
    p = os.path.join(tmpdir, "niltok.csv.gz")
    with open(p, "wb") as f:
        f.write(gzip.compress(b"id,v,name\n1,NULL,a\n2,,b\n3,7,NULL\n"))
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("v", T.IntegerType()),
            T.StructField("name", T.StringType()),
        ]
    )
    frame = read_dsv_decoded(
        spark, p, schema, decoder=gzip.decompress,
        conf=DSVConf(header_lines=1, nil_value="NULL"),
    )
    rows = {r["id"]: (r["v"], r["name"]) for r in frame.collect()}
    assert rows == {1: (None, "a"), 2: (None, "b"), 3: (7, None)}


def test_jsonl_dotted_paths(spark, tmpdir):
    """jsonl_utils.go: gjson dotted paths → flat columns, nil for
    missing paths."""
    p = os.path.join(tmpdir, "data.jsonl")
    with open(p, "w") as f:
        f.write('{"coords": {"x": 1.5, "z": 2.5}, "date": "2024-01-01"}\n')
        f.write('{"coords": {"x": 3.5}, "date": "2024-01-02"}\n')
    frame = read_jsonl(spark, p, paths=["coords.x", "coords.z", "date"])
    assert frame.df.columns == ["coords.x", "coords.z", "date"]
    rows = sorted(frame.collect(), key=lambda r: r["date"])
    assert rows[0]["coords.x"] == 1.5
    assert rows[1]["coords.z"] is None  # missing path → nil


def test_jsonl_decoded_gzip(spark, tmpdir):
    """VERDICT r4 #7: the whole-file Decoder pre-pass composes with the
    jsonl parser too (file_datasource.go:24-28 applies it before ANY
    parser) — gzip'd JSONL with dotted-path flattening must equal
    read_jsonl on the same content uncompressed, including nested
    schema, missing-path nils, and exact BIGINTs."""
    content = (
        '{"coords": {"x": 1.5, "z": 2.5}, "date": "2024-01-01", "n": 9007199254740993}\n'
        '{"coords": {"x": 3.5}, "date": "2024-01-02"}\n'
    )
    plain = os.path.join(tmpdir, "data.jsonl")
    with open(plain, "w") as f:
        f.write(content)
    gz = os.path.join(tmpdir, "data.jsonl.gz")
    with open(gz, "wb") as f:
        f.write(gzip.compress(content.encode()))

    schema = T.StructType(
        [
            T.StructField(
                "coords",
                T.StructType(
                    [
                        T.StructField("x", T.DoubleType()),
                        T.StructField("z", T.DoubleType()),
                    ]
                ),
            ),
            T.StructField("date", T.StringType()),
            T.StructField("n", T.LongType()),
        ]
    )
    paths = ["coords.x", "coords.z", "date", "n"]
    want = sorted(
        (tuple(r) for r in read_jsonl(spark, plain, schema, paths).collect())
    )
    got = sorted(
        (tuple(r) for r in
         read_jsonl_decoded(spark, gz, gzip.decompress, schema, paths).collect())
    )
    assert got == want
    assert got[0][3] == 9007199254740993  # BIGINT > 2^53 exact

    # schema inference path (one extra pass; production passes a schema)
    inferred = read_jsonl_decoded(spark, gz, gzip.decompress, paths=["date"])
    assert sorted(r["date"] for r in inferred.collect()) == [
        "2024-01-01", "2024-01-02",
    ]


def test_custom_datasource_batch(spark):
    """docs/custom-datasources.md extension point on the PySpark 4
    DataSource API: deterministic generator, partitioned."""
    custom_source.register(spark)
    df = (
        spark.read.format("sif_generator")
        .option("rows", 100)
        .option("partitions", 4)
        .load()
    )
    rows = df.collect()
    assert len(rows) == 100
    assert df.rdd.getNumPartitions() == 4
    assert all(0 <= r["col1"] < 10 for r in rows)
    # deterministic across reads
    again = spark.read.format("sif_generator").option("rows", 100).option("partitions", 4).load()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again.collect()))


def test_custom_datasource_stream(spark):
    """memorystream parity: batch_size rows per micro-batch, offsets
    tracked by Spark (F4 fixture shape)."""
    custom_source.register(spark)
    stream = (
        spark.readStream.format("sif_generator").option("batch_size", 12).load()
    )
    agg = stream.groupBy("col1").agg(F.count(F.lit(1)).alias("c"))
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory").queryName("gen_out").start()
    )
    import time

    # generous deadline: each micro-batch pays Python-worker startup,
    # and the host carries sporadic external load
    deadline = time.time() + 90
    total = 0
    while time.time() < deadline:
        if q.exception() is not None:
            raise AssertionError(f"stream died: {q.exception()}")
        rows = spark.sql("SELECT sum(c) AS s FROM gen_out").collect()
        total = rows[0]["s"] or 0
        if total >= 24:  # at least two micro-batches
            break
        time.sleep(0.5)
    q.stop()
    q.awaitTermination(30)
    assert total >= 24 and total % 12 == 0


def test_xml_roundtrip_preserves_nulls(spark):
    """XML write -> read with pinned schema restores values AND nulls
    (null columns are omitted elements on write)."""
    import tempfile

    from sif_spark.sources.xml import read_xml, write_xml

    d = tempfile.mkdtemp(prefix="sif_xml_")
    df = spark.createDataFrame(
        [(1, "a", 10), (2, "b", None), (3, "c", 30)],
        "id long, name string, v long",
    )
    write_xml(df, f"{d}/out", row_tag="rec", root_tag="recs")
    back = read_xml(spark, f"{d}/out/*.xml", "rec", "id BIGINT, name STRING, v BIGINT")
    rows = {r["id"]: (r["name"], r["v"]) for r in back.df.collect()}
    assert rows == {1: ("a", 10), 2: ("b", None), 3: ("c", 30)}


def test_fixed_width_roundtrip_nulls_and_overflow(spark, tmp_path):
    from pyspark.errors import PySparkRuntimeError, PythonException
    from sif_spark.sources.fixed_width import read_fixed_width, write_fixed_width

    df = spark.createDataFrame(
        [(1, "ab", 100), (2, None, None), (3, "c", -5)],
        "id long, name string, v long",
    )
    out = str(tmp_path / "fw")
    write_fixed_width(df, out, [("id", 4), ("name", 6), ("v", 8)])
    back = read_fixed_width(
        spark, out, [("id", 4, "bigint"), ("name", 6, "string"), ("v", 8, "bigint")]
    ).df
    rows = {r["id"]: r for r in back.collect()}
    assert rows[1]["name"] == "ab" and rows[1]["v"] == 100
    assert rows[2]["name"] is None and rows[2]["v"] is None  # all-pad -> NULL
    assert rows[3]["v"] == -5
    # overflow must error loudly, not truncate
    import pytest as _pytest

    with _pytest.raises(Exception, match="fixed-width overflow"):
        write_fixed_width(
            df, str(tmp_path / "fw2"), [("id", 4), ("name", 1), ("v", 8)]
        )
