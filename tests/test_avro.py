"""Avro OCF source/sink: spec known answers (zigzag table,
hand-assembled container bytes independent of our writer), round-trip
determinism, typed errors + bomb caps, fuzz, and the Spark stages."""

from __future__ import annotations

import datetime
import json
import struct
import zlib

import numpy as np
import pytest

from sif_spark.sources.avro import (
    avro_schema_for,
    parse_ocf,
    read_avro,
    spark_schema_for,
    write_avro,
    write_ocf,
    zigzag_decode,
    zigzag_encode,
)

SCHEMA = json.dumps(
    {
        "type": "record",
        "name": "r",
        "fields": [
            {"name": "id", "type": "long"},
            {"name": "name", "type": ["null", "string"]},
            {"name": "score", "type": "double"},
            {"name": "ok", "type": "boolean"},
            {"name": "ts", "type": {"type": "long", "logicalType": "timestamp-micros"}},
            {"name": "raw", "type": ["null", "bytes"]},
        ],
    }
)
ROWS = [
    (1, "alpha", 1.5, True, datetime.datetime(2020, 1, 2, 3, 4, 5, 123456), b"xy"),
    (2, None, -0.25, False, datetime.datetime(1969, 12, 31, 23, 59, 59), None),
    (-3, "", 0.0, True, datetime.datetime(1970, 1, 1), b""),
]


def test_zigzag_spec_known_answers():
    # the example table from the Avro spec's binary-encoding section
    for n, b in ((0, b"\x00"), (-1, b"\x01"), (1, b"\x02"), (-2, b"\x03"),
                 (2, b"\x04"), (-64, b"\x7f"), (64, b"\x80\x01")):
        assert zigzag_encode(n) == b, n
        assert zigzag_decode(b, 0) == (n, len(b))
    big = -(1 << 62)
    assert zigzag_decode(zigzag_encode(big), 0)[0] == big


def test_ocf_roundtrip_both_codecs_and_determinism():
    for codec in ("null", "deflate"):
        blob = write_ocf(SCHEMA, ROWS, codec)
        schema, rows = parse_ocf(blob)
        assert rows == ROWS, codec
        assert schema["fields"][0]["name"] == "id"
        assert write_ocf(SCHEMA, ROWS, codec) == blob  # byte-deterministic


def test_hand_assembled_spec_bytes():
    """An OCF authored field-by-field from the spec (independent of
    write_ocf): header map, sync discipline, one null-codec block with
    two records of (long, nullable string)."""
    schema = json.dumps(
        {"type": "record", "name": "t",
         "fields": [{"name": "a", "type": "long"},
                    {"name": "b", "type": ["null", "string"]}]}
    ).encode()
    sync = bytes(range(100, 116))
    body = (
        zigzag_encode(64) + zigzag_encode(1) + zigzag_encode(2) + b"hi"
        + zigzag_encode(-1) + zigzag_encode(0)
    )
    blob = (
        b"Obj\x01"
        + zigzag_encode(2)
        + zigzag_encode(11) + b"avro.schema" + zigzag_encode(len(schema)) + schema
        + zigzag_encode(10) + b"avro.codec" + zigzag_encode(4) + b"null"
        + zigzag_encode(0)
        + sync
        + zigzag_encode(2) + zigzag_encode(len(body)) + body + sync
    )
    _s, rows = parse_ocf(blob)
    assert rows == [(64, "hi"), (-1, None)]


def test_typed_errors_and_bomb_caps():
    good = write_ocf(SCHEMA, ROWS, "deflate")
    with pytest.raises(ValueError, match="magic"):
        parse_ocf(b"NOPE" + good[4:])
    with pytest.raises(ValueError, match="truncated|runs past"):
        parse_ocf(good[:20])
    # corrupt the sync marker of the data block
    bad = bytearray(good)
    bad[-1] ^= 0xFF
    with pytest.raises(ValueError, match="sync marker"):
        parse_ocf(bytes(bad))
    # unsupported codec gates loudly
    snappy = good.replace(b"\x0edeflate", b"\x0csnappy")
    with pytest.raises((NotImplementedError, ValueError)):
        parse_ocf(snappy)
    # nested types rejected at schema level (arrays of PRIMITIVES are
    # in scope since round 10; arrays of records/maps are not)
    nested = json.dumps(
        {"type": "record", "name": "n",
         "fields": [{"name": "xs", "type": {
             "type": "array", "items": {"type": "array", "items": "long"}}}]}
    )
    with pytest.raises(NotImplementedError, match="array items"):
        write_ocf(nested, [])
    mapped = json.dumps(
        {"type": "record", "name": "n",
         "fields": [{"name": "m", "type": {"type": "map", "values": "long"}}]}
    )
    with pytest.raises(NotImplementedError, match="map"):
        write_ocf(mapped, [])
    # NULL into a non-nullable field
    with pytest.raises(ValueError, match="non-nullable"):
        write_ocf(SCHEMA, [(None, "x", 1.0, True, ROWS[0][4], b"")])
    # forged block size past the buffer
    hdr_end = good.find(bytes(range(16))) + 16
    forged = good[:hdr_end] + zigzag_encode(1) + zigzag_encode(1 << 27) + b"\x00"
    with pytest.raises(ValueError, match="runs past|outside"):
        parse_ocf(forged)
    # deflate bomb: a block inflating past MAX_BLOCK_BYTES is refused
    import sif_spark.sources.avro as A

    old = A.MAX_BLOCK_BYTES
    A.MAX_BLOCK_BYTES = 1 << 10
    try:
        boom = zlib.compress(b"\x00" * (1 << 16), 9)[2:-4]
        sync = good[hdr_end - 16 : hdr_end]
        blob = (
            good[:hdr_end]
            + zigzag_encode(1)
            + zigzag_encode(len(boom))
            + boom
            + sync
        )
        with pytest.raises(ValueError, match="cap|bounds|trailing|block"):
            parse_ocf(blob)
    finally:
        A.MAX_BLOCK_BYTES = old


def test_mutation_fuzz_never_hangs():
    rng = np.random.default_rng(47)
    base = write_ocf(SCHEMA, ROWS * 5, "deflate")
    for _ in range(300):
        b = bytearray(base)
        for _ in range(rng.integers(1, 6)):
            b[rng.integers(0, len(b))] = rng.integers(0, 256)
        try:
            parse_ocf(bytes(b))
        except (ValueError, NotImplementedError, zlib.error):
            pass


def test_spark_roundtrip_with_nulls_and_schema_inference(spark, tmp_path):
    d = str(tmp_path / "av")
    df = spark.createDataFrame(
        [
            (1, "a", 1.5, datetime.datetime(2020, 1, 1), b"z"),
            (2, None, None, None, None),
            (3, "c", -2.0, datetime.datetime(1999, 6, 1, 12), b""),
        ],
        "id long, name string, score double, ts timestamp, raw binary",
    )
    write_avro(df, d)
    import glob as _g

    assert _g.glob(f"{d}/part-*.avro") and _g.glob(f"{d}/_SUCCESS")
    for back in (read_avro(spark, f"{d}/*.avro"),  # inferred from the file
                 read_avro(spark, f"{d}/*.avro",
                           "id long, name string, score double, "
                           "ts timestamp, raw binary")):
        got = sorted(tuple(r) for r in back.collect())
        want = sorted(tuple(r) for r in df.collect())
        assert got == want
        assert back.schema == df.schema


def test_schema_mapping_gates():
    from pyspark.sql import types as T

    with pytest.raises(NotImplementedError, match="flat Avro"):
        avro_schema_for(T.StructType([T.StructField("m", T.MapType(
            T.StringType(), T.LongType()))]))
    # arrays of primitives ARE in scope (round 10); nested arrays gate
    with pytest.raises(NotImplementedError, match="primitive items only"):
        avro_schema_for(T.StructType([T.StructField("aa", T.ArrayType(
            T.ArrayType(T.LongType())))]))
    s = json.loads(avro_schema_for(
        T.StructType([T.StructField("id", T.LongType(), False),
                      T.StructField("n", T.StringType(), True)])
    ))
    assert s["fields"][0]["type"] == "long"
    assert s["fields"][1]["type"] == ["null", "string"]
    assert spark_schema_for(s) == "id bigint, n string"


# ---------------------------------------------------------------------------
# Round 10: block chunking, logical types, by-name mapping, evolution
# ---------------------------------------------------------------------------


def test_writer_chunks_blocks_under_reader_caps():
    """ADVICE r9: one giant block broke the round-trip at exactly the
    scale the module targets — the writer must flush sync-marked
    blocks the reader's caps always accept."""
    schema = json.dumps(
        {"type": "record", "name": "r",
         "fields": [{"name": "id", "type": "long"},
                    {"name": "txt", "type": "string"}]}
    )
    rows = [(i, "x" * 1000) for i in range(500)]
    blob = write_ocf(schema, rows, codec="null", block_rows=100)
    # 5 blocks of 100 rows each: count the sync markers after each
    from sif_spark.sources.avro import _SYNC

    assert blob.count(_SYNC) == 6  # header + 5 data blocks
    _s, back = parse_ocf(blob)
    assert back == rows

    # byte-pressure flush: >16 MiB of raw body splits even within
    # block_rows, so no authored block can near the 256 MiB read cap
    big = [(i, "y" * 100_000) for i in range(300)]  # ~30 MB raw
    blob2 = write_ocf(schema, big, codec="null")
    assert blob2.count(_SYNC) >= 3
    _s, back2 = parse_ocf(blob2)
    assert back2 == big


def test_logical_types_roundtrip(spark, tmp_path):
    """decimal(p,s) over bytes + date over int, through the Spark
    sink and source (VERDICT r9 ask #4)."""
    from decimal import Decimal

    d = str(tmp_path / "lt")
    df = spark.createDataFrame(
        [
            (1, Decimal("12345.67"), datetime.date(2020, 2, 29)),
            (2, Decimal("-0.01"), datetime.date(1969, 12, 31)),
            (3, None, None),
        ],
        "id long, amt decimal(10,2), d date",
    )
    write_avro(df, d)
    back = read_avro(spark, f"{d}/*.avro")  # inferred from embedded schema
    assert back.schema == df.schema
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_by_name_mapping_and_drift_raises(spark, tmp_path):
    """Files decode with their OWN schema and realign by name; a
    drifted file raises instead of silently mis-mapping (ADVICE r9)."""
    import os

    d = str(tmp_path / "mixed")
    os.makedirs(d)
    s_ab = json.dumps({"type": "record", "name": "r", "fields": [
        {"name": "a", "type": "long"}, {"name": "b", "type": "string"}]})
    s_ba = json.dumps({"type": "record", "name": "r", "fields": [
        {"name": "b", "type": "string"}, {"name": "a", "type": "long"}]})
    with open(f"{d}/f1.avro", "wb") as fh:
        fh.write(write_ocf(s_ab, [(1, "one")], codec="null"))
    with open(f"{d}/f2.avro", "wb") as fh:  # same fields, swapped order
        fh.write(write_ocf(s_ba, [("two", 2)], codec="null"))
    got = sorted(map(tuple, read_avro(spark, f"{d}/*.avro").collect()))
    assert got == [(1, "one"), (2, "two")]

    s_drift = json.dumps({"type": "record", "name": "r", "fields": [
        {"name": "a", "type": "string"}, {"name": "b", "type": "string"}]})
    with open(f"{d}/f3.avro", "wb") as fh:
        fh.write(write_ocf(s_drift, [("x", "y")], codec="null"))
    with pytest.raises(Exception, match="file has string, reader expects"):
        read_avro(spark, f"{d}/*.avro",
                  schema="a bigint, b string").collect()


def test_schema_resolution_evolution(spark, tmp_path):
    """Write v1 files, read with a v2 reader schema: renamed-away
    field skipped, new field filled from its default, int→long and
    float→double promotions applied (VERDICT r9 ask #4)."""
    import os

    d = str(tmp_path / "evo")
    os.makedirs(d)
    v1 = json.dumps({"type": "record", "name": "r", "fields": [
        {"name": "id", "type": "int"},
        {"name": "score", "type": "float"},
        {"name": "legacy", "type": "string"}]})
    with open(f"{d}/v1.avro", "wb") as fh:
        fh.write(write_ocf(v1, [(7, 1.5, "old"), (8, -2.0, "old2")],
                           codec="null"))
    v2 = json.dumps({"type": "record", "name": "r", "fields": [
        {"name": "id", "type": "long"},                      # int → long
        {"name": "score", "type": "double"},                 # float → double
        {"name": "source", "type": "string", "default": "unknown"},
        {"name": "weight", "type": ["null", "double"], "default": None}]})
    back = read_avro(spark, f"{d}/*.avro", reader_schema=v2)
    assert back.schema.simpleString() == (
        "struct<id:bigint,score:double,source:string,weight:double>"
    )
    got = sorted(map(tuple, back.collect()))
    assert got == [(7, 1.5, "unknown", None), (8, -2.0, "unknown", None)]

    # without reader_schema the same corpus refuses to guess: the
    # widenings pass strict mode, but the defaulted field does not
    with pytest.raises(Exception, match="missing from the file"):
        read_avro(spark, f"{d}/*.avro",
                  schema="id bigint, score double, source string").collect()


def test_array_columns_embeddings_roundtrip(spark, tmp_path):
    """Round 10: arrays of primitives — the embeddings-interchange
    case. float32 values survive the Avro float codec bit-exactly;
    NULL arrays ride the union; empty arrays are a bare 0-count."""
    from pyspark.sql import functions as F

    d = str(tmp_path / "emb_avro")
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    src = emb.limit(50).select(
        "vec_id", "embedding",
        # exercise NULL and empty arrays alongside the real ones
        F.when(F.col("vec_id") % 3 == 0, F.col("embedding")).when(
            F.col("vec_id") % 3 == 1, F.array().cast("array<float>")
        ).alias("maybe_vec"),
    )
    write_avro(src, d)
    back = read_avro(spark, f"{d}/*.avro")
    assert back.schema == src.schema
    got = sorted((r["vec_id"], tuple(r["embedding"]),
                  None if r["maybe_vec"] is None else tuple(r["maybe_vec"]))
                 for r in back.collect())
    want = sorted((r["vec_id"], tuple(r["embedding"]),
                   None if r["maybe_vec"] is None else tuple(r["maybe_vec"]))
                  for r in src.collect())
    assert got == want


# ---------------------------------------------------------------------------
# vectorized codec (avro_vec.py) — differential pins vs the reference path
# ---------------------------------------------------------------------------


def _stress_frame(n=4000):
    import pandas as pd
    from decimal import Decimal

    rng = np.random.default_rng(11)
    return pd.DataFrame(
        {
            "k": np.arange(n, dtype=np.int64),
            "i32": rng.integers(-(2**31), 2**31, n),
            "s": pd.Series(
                [f"row-{i}-αβ" if i % 7 else None for i in range(n)],
                dtype=object,
            ),
            "d": rng.normal(size=n),
            "f": rng.normal(size=n).astype(np.float32),
            "b": rng.integers(0, 2, n).astype(bool),
            "raw": pd.Series(
                [bytes([i % 251, (i * 7) % 251]) if i % 5 else None for i in range(n)],
                dtype=object,
            ),
            "ts": pd.Series(
                pd.to_datetime("2021-03-04")
                + pd.to_timedelta(np.arange(n) * 1000003, unit="us")
            ),
            "dt": pd.Series(
                [
                    datetime.date(2020, 1, 1) + datetime.timedelta(days=int(i % 4000))
                    for i in range(n)
                ],
                dtype=object,
            ),
            "dec": pd.Series(
                [Decimal(f"{i}.{i % 100:02d}") if i % 3 else None for i in range(n)],
                dtype=object,
            ),
        }
    )


def _stress_schema():
    from pyspark.sql import types as T

    return T.StructType(
        [
            T.StructField("k", T.LongType(), False),
            T.StructField("i32", T.IntegerType(), False),
            T.StructField("s", T.StringType(), True),
            T.StructField("d", T.DoubleType(), False),
            T.StructField("f", T.FloatType(), False),
            T.StructField("b", T.BooleanType(), False),
            T.StructField("raw", T.BinaryType(), True),
            T.StructField("ts", T.TimestampType(), False),
            T.StructField("dt", T.DateType(), False),
            T.StructField("dec", T.DecimalType(12, 2), True),
        ]
    )


def test_vec_writer_byte_identical_to_reference():
    """The NumPy-vectorized writer and the per-row reference writer
    must author the SAME bytes — including at multi-block boundaries
    triggered by both the row cap and the byte cap."""
    from sif_spark.sources.avro import _pandas_rows, write_ocf_pandas

    pdf = _stress_frame()
    sj = avro_schema_for(_stress_schema())
    rows = _pandas_rows(pdf)
    for codec in ("null", "deflate"):
        assert write_ocf(sj, rows, codec) == write_ocf_pandas(sj, pdf, codec)
    # multi-block: row cap at 777 rows
    assert write_ocf(sj, rows, block_rows=777) == write_ocf_pandas(
        sj, pdf, block_rows=777
    )


def test_vec_reader_matches_sequential():
    """parse_ocf_columns (vectorized, index-driven) materializes the
    same values the sequential row decoder yields — every kind, nulls
    included."""
    import pandas as pd

    from sif_spark.sources.avro import (
        _materialize_col,
        _pandas_rows,
        parse_ocf_columns,
        write_ocf_pandas,
    )

    pdf = _stress_frame()
    sj = avro_schema_for(_stress_schema())
    blob = write_ocf_pandas(sj, pdf, "deflate", block_rows=901)  # multi-block
    _, rows = parse_ocf(blob)
    _, fcols, n = parse_ocf_columns(blob)
    kinds = [
        "long", "int", "string", "double", "float",
        "boolean", "bytes", "timestamp-micros", "date", "decimal:12:2",
    ]
    assert n == len(rows) == len(pdf)
    for j, kind in enumerate(kinds):
        vals, mask = fcols[j]
        col = _materialize_col(kind, vals, mask, n)
        seq = [r[j] for r in rows]
        for c, s in zip(col, seq):
            if kind == "timestamp-micros":
                assert pd.Timestamp(c).to_pydatetime() == s
            elif kind in ("double", "float"):
                assert c == np.array(s, col.dtype)
            else:
                assert (c is None and s is None) or c == s, (kind, c, s)


def test_foreign_file_without_index_uses_sequential_path(spark, tmp_path):
    """A spec-conformant file WITHOUT the sif.rowlens metadata (any
    foreign writer) must still read correctly through read_avro's
    sequential fallback."""
    from sif_spark.sources.avro import (
        _assemble_ocf,
        _encode_blocks_rows,
        _normalize,
        _pandas_rows,
        parse_ocf_columns,
    )
    from sif_spark.sources.avro_vec import AvroVecUnsupported

    pdf = _stress_frame(500)
    sj = avro_schema_for(_stress_schema())
    kinds = [_normalize(f["type"]) for f in json.loads(sj)["fields"]]
    blob = _assemble_ocf(
        sj, "deflate", _encode_blocks_rows(kinds, _pandas_rows(pdf), 200),
        rowlens_index=False,
    )
    with pytest.raises(AvroVecUnsupported):
        parse_ocf_columns(blob)
    p = tmp_path / "foreign"
    p.mkdir()
    (p / "part-0.avro").write_bytes(blob)
    back = read_avro(spark, f"{p}/*.avro")
    assert back.count() == 500
    got = {r["k"]: r["s"] for r in back.collect()}
    assert got[0] is None and got[1] == "row-1-αβ"


def test_timestamp_microsecond_exactness():
    """Regression: the encoder must carry exact integer microseconds.
    Float true-division of timedeltas rounds above 2^53 ns and was
    off by +-1 us on values like 2021-03-04 00:00:48.000144."""
    adversarial = [
        datetime.datetime(2021, 3, 4, 0, 0, 48, 144),
        datetime.datetime(2038, 1, 19, 3, 14, 7, 999999),
        datetime.datetime(1969, 12, 31, 23, 59, 59, 1),
        datetime.datetime(2262, 4, 11, 23, 47, 16, 854775),
    ]
    sj = json.dumps(
        {
            "type": "record",
            "name": "r",
            "fields": [
                {
                    "name": "ts",
                    "type": {"type": "long", "logicalType": "timestamp-micros"},
                }
            ],
        }
    )
    blob = write_ocf(sj, [(v,) for v in adversarial], "null")
    _, rows = parse_ocf(blob)
    assert [r[0] for r in rows] == adversarial


def test_vec_array_codec_matches_reference():
    """Arrays of primitives (embeddings / token ids / flag vectors)
    through the vectorized codec: byte-identical writes to the
    reference encoder (incl. empty arrays = bare terminator) and
    value-identical decode, nullable column included."""
    import pandas as pd
    from pyspark.sql import types as T

    from sif_spark.sources.avro import (
        _materialize_col,
        _pandas_rows,
        parse_ocf_columns,
        write_ocf_pandas,
    )

    rng = np.random.default_rng(5)
    n = 600
    pdf = pd.DataFrame(
        {
            "k": np.arange(n, dtype=np.int64),
            "emb": pd.Series(
                [rng.normal(size=8).astype(np.float32) for _ in range(n)],
                dtype=object,
            ),
            "toks": pd.Series(
                [list(rng.integers(-(10**12), 10**12, i % 5)) for i in range(n)],
                dtype=object,
            ),
            "flags": pd.Series(
                [[bool(i % 2), True] if i % 4 else None for i in range(n)],
                dtype=object,
            ),
        }
    )
    schema = T.StructType(
        [
            T.StructField("k", T.LongType(), False),
            T.StructField("emb", T.ArrayType(T.FloatType()), False),
            T.StructField("toks", T.ArrayType(T.LongType()), False),
            T.StructField("flags", T.ArrayType(T.BooleanType()), True),
        ]
    )
    sj = avro_schema_for(schema)
    rows = _pandas_rows(pdf)
    ref = write_ocf(sj, rows, "deflate", block_rows=251)
    vec = write_ocf_pandas(sj, pdf, "deflate", block_rows=251)
    assert ref == vec
    _, seq_rows = parse_ocf(vec)
    _, fcols, nn = parse_ocf_columns(vec)
    assert nn == n
    for j, kind in enumerate(
        ["long", "array:float", "array:long", "array:boolean"]
    ):
        col = _materialize_col(kind, *fcols[j], nn)
        for c, s in zip(col, (r[j] for r in seq_rows)):
            if kind == "long":
                assert c == s
            elif c is None or s is None:
                assert c is None and s is None
            else:
                assert [float(x) for x in c] == [float(x) for x in s] or list(
                    c
                ) == list(s)


def test_rowlens_index_decompression_capped(monkeypatch):
    """ADVICE r10 (medium): the sif.rowlens metadata value is
    attacker-controlled in a foreign file; a deflate bomb there must
    stop at the cap with a typed ValueError instead of bypassing the
    block path's decompression limits."""
    from sif_spark.sources import avro_vec
    from sif_spark.sources.avro_vec import pack_rowlens, unpack_rowlens

    # legit round-trip unaffected
    blocks = [np.array([3, 5, 7], np.int64), np.array([11], np.int64)]
    back = unpack_rowlens(pack_rowlens(blocks))
    assert [b.tolist() for b in back] == [[3, 5, 7], [11]]
    # a bomb past the cap raises (cap lowered so the test stays tiny)
    monkeypatch.setattr(avro_vec, "_ROWLENS_RAW_CAP", 1 << 16)
    bomb = zlib.compress(b"\x00" * (1 << 20), 9)  # 1 MiB raw, ~1 KiB deflated
    with pytest.raises(ValueError, match="decompression cap"):
        unpack_rowlens(bomb)
    # a truncated stream raises too (decompressobj never sees eof)
    ok = zlib.compress(b"\x00" * 100, 9)
    with pytest.raises(ValueError, match="cap|truncated"):
        unpack_rowlens(ok[:-4])


def test_decimal38_vectorized_writer_falls_back():
    """ADVICE r10 (low): decimal precision > 18 exceeds the int64
    unscaled fast path — the vectorized writer must declare
    AvroVecUnsupported (engaging the per-row arbitrary-precision
    fallback) instead of dying with OverflowError mid-encode."""
    from decimal import Decimal

    import pandas as pd

    from sif_spark.sources.avro import parse_ocf, write_ocf_pandas

    sj = json.dumps(
        {
            "type": "record",
            "name": "r",
            "fields": [
                {"name": "id", "type": "long"},
                {
                    "name": "amt",
                    "type": {
                        "type": "bytes",
                        "logicalType": "decimal",
                        "precision": 38,
                        "scale": 2,
                    },
                },
            ],
        }
    )
    big = Decimal("123456789012345678901234567890.12")  # > int64 unscaled
    pdf = pd.DataFrame({"id": [1, 2], "amt": [big, Decimal("-0.01")]})
    blob = write_ocf_pandas(sj, pdf)  # must not raise OverflowError
    _schema, rows = parse_ocf(blob)
    assert rows[0][1] == big and rows[1][1] == Decimal("-0.01")
