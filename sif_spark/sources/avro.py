"""Avro Object Container File source/sink — from scratch, pure
Python/stdlib, built from the public Avro 1.12 specification (the
binary encoding and OCF layout chapters).

Why from scratch: Spark packages the `avro` DataSource as the
external `spark-avro` module and this container carries no extra jars
(the format call raises "Failed to find data source: avro"). Avro OCF
is, however, a simple container — a JSON schema + zigzag-varint
binary records in sync-marked blocks — squarely within this repo's
from-scratch codec discipline (tar/zip/FLAC/MP4), so the last
mainstream interchange format gets a real reader/writer instead of a
documented absence.

Scope (the flat-record interchange case):
- records of primitives: null/boolean/int/long/float/double/string/
  bytes, nullable fields as ["null", T] unions, ARRAYS of those
  primitives (the embeddings-interchange case — round 10), and the
  logical types `timestamp-micros` (Spark TimestampType), `date`
  (DateType) and `decimal` over bytes (DecimalType(p, s)).
- codecs: `null` and `deflate` (raw DEFLATE via zlib, per spec).
- schema resolution per the spec's "Schema Resolution" chapter:
  fields matched by NAME (any file field order), writer-only fields
  skipped, reader-only fields filled from their `default`, and the
  numeric/string promotions int→long/float/double, long→float/double,
  float→double, string↔bytes (pass ``reader_schema=`` to read_avro).
- nested records/maps/enums/fixed and non-primitive array items
  raise typed NotImplementedError naming the Avro type — same
  loud-gate contract as the media codecs.

Reference parity: go-sif's `datasource/parser` extension point
(datasource/parser/dsv/dsv_parser.go:11-33) — a byte-stream → rows
parser behind `file.CreateDataFrame`; here the parse is an
Arrow-batched mapInPandas over a binaryFile scan (whole-OCF files,
like the Decoder pre-pass of file_datasource.go:24-28).

Scale notes: OCF is splittable at sync markers, but this reader
parallelizes per FILE (binaryFile) — shard corpora into many files
(they already are: Avro writers roll files). Throughput: files this
writer authors carry a per-block row-length index in the open OCF
metadata map (``sif.rowlens`` — Parquet's offset-index idea), which
lets both sides run NumPy/Arrow-vectorized (avro_vec.py: ~130k
rows/s/core write, ~300k rows/s/core read on a 10-column all-types
row — ~3.5x the per-row reference path, which remains the decoder
for foreign files and is differentially pinned byte-identical).
For bulk decode of a foreign Avro-dominated corpus inject a native
reader — the plumbing, caps, and typed errors are the documented
injected-codec boundary. Decompression-bomb caps: per-block declared
sizes and counts are bounded before allocation."""

from __future__ import annotations

import io
import json
import struct
import zlib
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession, types as T

MAGIC = b"Obj\x01"
MAX_BLOCK_COUNT = 1 << 24  # rows per block cap (spec allows any long)
MAX_BLOCK_BYTES = 1 << 28  # 256 MiB inflated per block
_SYNC = bytes(range(16))  # deterministic writer sync marker

_SPARK_TO_AVRO = {
    T.BooleanType: "boolean",
    T.IntegerType: "int",
    T.LongType: "long",
    T.FloatType: "float",
    T.DoubleType: "double",
    T.StringType: "string",
    T.BinaryType: "bytes",
}


# ---------------------------------------------------------------------------
# Binary encoding primitives (Avro spec "Binary Encoding")
# ---------------------------------------------------------------------------


def zigzag_encode(n: int) -> bytes:
    u = (n << 1) ^ (n >> 63) if n < 0 else n << 1
    u &= (1 << 64) - 1
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def zigzag_decode(buf: bytes, pos: int) -> tuple[int, int]:
    shift = 0
    u = 0
    while True:
        if pos >= len(buf):
            raise ValueError("truncated Avro varint")
        b = buf[pos]
        pos += 1
        u |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
        if shift > 63:
            raise ValueError("Avro varint longer than 64 bits")
    return (u >> 1) ^ -(u & 1), pos


def _avro_type_for(dt: T.DataType, name: str):
    if isinstance(dt, T.TimestampType):
        return {"type": "long", "logicalType": "timestamp-micros"}
    if isinstance(dt, T.ArrayType):
        for cls, avro in _SPARK_TO_AVRO.items():
            if isinstance(dt.elementType, cls):
                return {"type": "array", "items": avro}
        raise NotImplementedError(
            f"column {name!r}: Avro arrays of {dt.elementType.simpleString()} "
            "are out of scope (primitive items only)"
        )
    if isinstance(dt, T.DateType):
        return {"type": "int", "logicalType": "date"}
    if isinstance(dt, T.DecimalType):
        return {
            "type": "bytes",
            "logicalType": "decimal",
            "precision": dt.precision,
            "scale": dt.scale,
        }
    for cls, avro in _SPARK_TO_AVRO.items():
        if isinstance(dt, cls):
            return avro
    raise NotImplementedError(
        f"column {name!r}: Spark type {dt.simpleString()} has no flat Avro "
        "mapping here (nested/array/map are out of this writer's "
        "scope — see module docstring)"
    )


def avro_schema_for(schema: T.StructType, record_name: str = "row") -> str:
    """Spark StructType → Avro record schema JSON (nullable fields as
    ["null", T] unions, Avro's convention)."""
    fields = []
    for f in schema.fields:
        at = _avro_type_for(f.dataType, f.name)
        fields.append(
            {"name": f.name, "type": (["null", at] if f.nullable else at)}
        )
    return json.dumps({"type": "record", "name": record_name, "fields": fields})


def _normalize(t):
    """An Avro field type → ('kind', nullable) where kind is the
    primitive name, 'timestamp-micros', 'date', or 'decimal:p:s'."""
    nullable = False
    if isinstance(t, list):
        branches = [b for b in t if b != "null"]
        if len(t) > 2 or len(branches) != 1:
            raise NotImplementedError(f"unsupported Avro union {t!r}")
        nullable = len(branches) < len(t)
        t = branches[0]
    if isinstance(t, dict):
        lt = t.get("logicalType")
        if lt == "timestamp-micros" and t.get("type") == "long":
            return "timestamp-micros", nullable
        if lt == "date" and t.get("type") == "int":
            return "date", nullable
        if lt == "decimal" and t.get("type") == "bytes":
            p, s = t.get("precision"), t.get("scale", 0)
            if not isinstance(p, int) or p <= 0 or not 0 <= s <= p:
                raise ValueError(f"invalid Avro decimal (precision={p}, scale={s})")
            return f"decimal:{p}:{s}", nullable
        if t.get("type") == "array":
            items = t.get("items")
            if items in ("boolean", "int", "long", "float", "double",
                         "string", "bytes"):
                return f"array:{items}", nullable
            raise NotImplementedError(
                f"Avro array items {items!r} are outside the primitive scope"
            )
        t = t.get("type")
    if t in ("null", "boolean", "int", "long", "float", "double", "string", "bytes"):
        return t, nullable
    raise NotImplementedError(
        f"Avro type {t!r} is outside the flat-record scope (records/arrays/"
        "maps/enums/fixed gate loudly — see module docstring)"
    )


def _encode_value(kind: str, v, out: bytearray) -> None:
    if kind in ("long", "int"):
        out += zigzag_encode(int(v))
    elif kind == "date":
        # int: days since the Unix epoch (Avro `date` logical type);
        # pandas may hand the column over as Timestamps — take .date()
        import datetime as _dt

        if isinstance(v, _dt.datetime):
            v = v.date()
        out += zigzag_encode((v - _dt.date(1970, 1, 1)).days)
    elif kind.startswith("decimal:"):
        # bytes: two's-complement big-endian unscaled integer
        _, _p, s = kind.split(":")
        import decimal
        from decimal import Decimal

        d = Decimal(v)
        with decimal.localcontext() as ctx:
            # the default 28-digit context silently ROUNDS wide
            # decimals (e.g. decimal(38,x)) during scaleb — widen the
            # working precision so the unscaled integer is exact
            ctx.prec = len(d.as_tuple().digits) + abs(int(s)) + 4
            unscaled = int(d.scaleb(int(s)).to_integral_value())
        n = max(1, (unscaled.bit_length() + 8) // 8)  # +1 sign bit
        b = unscaled.to_bytes(n, "big", signed=True)
        out += zigzag_encode(len(b)) + b
    elif kind == "timestamp-micros":
        # naive datetime treated as UTC (Spark session is UTC-pinned)
        import datetime as _dt

        epoch = _dt.datetime(1970, 1, 1, tzinfo=_dt.timezone.utc)
        if v.tzinfo is None:
            v = v.replace(tzinfo=_dt.timezone.utc)
        # floor DIVISION on the timedelta (exact integer µs) — float
        # true-division rounds above 2^53 ns and was off by ±1 µs
        out += zigzag_encode((v - epoch) // _dt.timedelta(microseconds=1))
    elif kind.startswith("array:"):
        # spec: item blocks (count, items...) terminated by count 0
        item_kind = kind.split(":", 1)[1]
        vals = list(v)
        if vals:
            out += zigzag_encode(len(vals))
            for item in vals:
                if item is None:
                    raise ValueError("NULL inside an Avro array of primitives")
                _encode_value(item_kind, item, out)
        out += zigzag_encode(0)
    elif kind == "double":
        out += struct.pack("<d", float(v))
    elif kind == "float":
        out += struct.pack("<f", float(v))
    elif kind == "boolean":
        out.append(1 if v else 0)
    elif kind == "string":
        b = str(v).encode("utf-8")
        out += zigzag_encode(len(b)) + b
    elif kind == "bytes":
        b = bytes(v)
        out += zigzag_encode(len(b)) + b
    else:
        raise NotImplementedError(f"encode: Avro kind {kind!r}")


def _decode_value(kind: str, buf: bytes, pos: int):
    if kind in ("long", "int"):
        return zigzag_decode(buf, pos)
    if kind == "date":
        import datetime as _dt

        days, pos = zigzag_decode(buf, pos)
        return _dt.date(1970, 1, 1) + _dt.timedelta(days=days), pos
    if kind.startswith("decimal:"):
        from decimal import Decimal

        _, _p, s = kind.split(":")
        n, pos = zigzag_decode(buf, pos)
        if n <= 0 or pos + n > len(buf):
            raise ValueError(f"Avro decimal length {n} runs past the block")
        unscaled = int.from_bytes(buf[pos : pos + n], "big", signed=True)
        # tuple construction is context-exact; scaleb would round wide
        # decimals at the default 28-digit context
        t = Decimal(unscaled).as_tuple()
        return Decimal((t.sign, t.digits, t.exponent - int(s))), pos + n
    if kind == "timestamp-micros":
        import datetime as _dt

        us, pos = zigzag_decode(buf, pos)
        return (
            _dt.datetime(1970, 1, 1) + _dt.timedelta(microseconds=us),
            pos,
        )
    if kind.startswith("array:"):
        item_kind = kind.split(":", 1)[1]
        vals: list = []
        while True:
            n, pos = zigzag_decode(buf, pos)
            if n == 0:
                break
            if n < 0:  # negative count carries a byte size first (skippable)
                n = -n
                _, pos = zigzag_decode(buf, pos)
            if n > MAX_BLOCK_COUNT or len(vals) + n > MAX_BLOCK_COUNT:
                raise ValueError(f"Avro array block count {n} outside bounds")
            for _ in range(n):
                item, pos = _decode_value(item_kind, buf, pos)
                vals.append(item)
        return vals, pos
    if kind == "double":
        if pos + 8 > len(buf):
            raise ValueError("truncated Avro double")
        return struct.unpack_from("<d", buf, pos)[0], pos + 8
    if kind == "float":
        if pos + 4 > len(buf):
            raise ValueError("truncated Avro float")
        return struct.unpack_from("<f", buf, pos)[0], pos + 4
    if kind == "boolean":
        if pos >= len(buf):
            raise ValueError("truncated Avro boolean")
        return buf[pos] != 0, pos + 1
    if kind in ("string", "bytes"):
        n, pos = zigzag_decode(buf, pos)
        if n < 0 or pos + n > len(buf):
            raise ValueError(f"Avro {kind} length {n} runs past the block")
        raw = buf[pos : pos + n]
        return (raw.decode("utf-8") if kind == "string" else bytes(raw)), pos + n
    raise NotImplementedError(f"decode: Avro kind {kind!r}")


# ---------------------------------------------------------------------------
# OCF container
# ---------------------------------------------------------------------------


WRITE_BLOCK_ROWS = 100_000  # rows per authored block
WRITE_BLOCK_BYTES = 1 << 24  # ~16 MiB raw per authored block


def _assemble_ocf(
    schema_json: str, codec: str, blocks, rowlens_index: bool = True
) -> bytes:
    """Header (magic + metadata + sync) + sync-marked blocks.
    ``blocks`` is [(n_rows, raw_body bytes, row_lens)]. The per-block
    row byte-lengths ride along in the open OCF metadata map
    (``sif.rowlens``, deflated uint32s — Parquet's offset-index idea):
    foreign readers ignore the key; this reader uses it to decode
    whole blocks vectorized (avro_vec.py). Deterministic (fixed sync
    marker) — identical inputs give identical bytes, the property
    content-addressed stores want."""
    from sif_spark.sources.avro_vec import ROWLENS_META_KEY, pack_rowlens

    if codec not in ("null", "deflate"):
        raise ValueError(f"codec must be 'null' or 'deflate', got {codec!r}")
    out = bytearray(MAGIC)
    meta = {
        "avro.codec": codec.encode(),
        "avro.schema": schema_json.encode(),
    }
    if rowlens_index:
        meta[ROWLENS_META_KEY] = pack_rowlens([rl for _n, _b, rl in blocks])
    out += zigzag_encode(len(meta))
    for k, v in meta.items():
        kb = k.encode()
        out += zigzag_encode(len(kb)) + kb + zigzag_encode(len(v)) + v
    out += zigzag_encode(0)  # end of metadata map
    out += _SYNC
    for n_rows, body, _row_lens in blocks:
        payload = bytes(body)
        if codec == "deflate":
            payload = zlib.compress(payload, 6)[2:-4]  # raw DEFLATE per spec
        out.extend(zigzag_encode(n_rows) + zigzag_encode(len(payload)))
        out.extend(payload)
        out.extend(_SYNC)
    return bytes(out)


def _encode_blocks_rows(kinds, rows, block_rows: int):
    """Per-row reference encoder -> [(n, body, row_lens)]. Blocks
    flush every ``block_rows`` rows or when the raw body nears 16 MiB
    — far under the reader's 256 MiB decompression-bomb cap, so the
    writer can never author a file its own reader rejects, at any
    partition size (ADVICE r9)."""
    blocks = []
    body = bytearray()
    row_lens: list[int] = []
    n = 0
    for row in rows:
        at = len(body)
        for (kind, nullable), v in zip(kinds, row):
            if nullable:
                if v is None:
                    body += zigzag_encode(0)
                    continue
                body += zigzag_encode(1)
            elif v is None:
                raise ValueError("NULL in a non-nullable Avro field")
            _encode_value(kind, v, body)
        row_lens.append(len(body) - at)
        n += 1
        if n >= block_rows or len(body) >= WRITE_BLOCK_BYTES:
            blocks.append((n, bytes(body), row_lens))
            body, row_lens, n = bytearray(), [], 0
    if n:
        blocks.append((n, bytes(body), row_lens))
    return blocks


def write_ocf(
    schema_json: str,
    rows: list[tuple],
    codec: str = "deflate",
    block_rows: int = WRITE_BLOCK_ROWS,
) -> bytes:
    """Author one Avro Object Container File from Python row tuples
    (the reference per-row encoder; write_ocf_pandas is the
    vectorized fast path and is pinned byte-identical to this)."""
    schema = json.loads(schema_json)
    kinds = [_normalize(f["type"]) for f in schema["fields"]]
    return _assemble_ocf(
        schema_json, codec, _encode_blocks_rows(kinds, rows, block_rows)
    )


def write_ocf_pandas(
    schema_json: str,
    pdf,
    codec: str = "deflate",
    block_rows: int = WRITE_BLOCK_ROWS,
) -> bytes:
    """Vectorized OCF author from a pandas DataFrame (NumPy/Arrow
    column encoders + one row-major interleave scatter per column —
    avro_vec.py). Byte-identical output to write_ocf on the same
    data; schemas outside the fast path (arrays) fall back to the
    per-row encoder automatically."""
    from sif_spark.sources.avro_vec import (
        AvroVecUnsupported,
        columns_from_pandas,
        encode_columns,
    )

    schema = json.loads(schema_json)
    kinds = [_normalize(f["type"]) for f in schema["fields"]]
    names = [f["name"] for f in schema["fields"]]
    try:
        blocks = []
        if len(pdf):
            cols, n = columns_from_pandas(kinds, names, pdf)
            body, row_lens = encode_columns(kinds, cols, n)
            blocks = _split_blocks(body.tobytes(), row_lens, block_rows)
        return _assemble_ocf(schema_json, codec, blocks)
    except AvroVecUnsupported:
        rows = _pandas_rows(pdf)
        return write_ocf(schema_json, rows, codec, block_rows)


def _split_blocks(body: bytes, row_lens, block_rows: int):
    """Split one encoded body at the exact boundaries the per-row
    encoder flushes at (``block_rows`` rows, or the first row whose
    cumulative bytes reach WRITE_BLOCK_BYTES) — keeps the two writers
    byte-identical and every authored block under the reader's
    decompression caps."""
    import numpy as np

    ends = np.cumsum(np.asarray(row_lens, np.int64))
    n = len(ends)
    blocks = []
    start_row, start_byte = 0, 0
    while start_row < n:
        byte_hit = int(np.searchsorted(ends, start_byte + WRITE_BLOCK_BYTES, "left"))
        hi = min(byte_hit + 1, start_row + block_rows, n)
        end_byte = int(ends[hi - 1])
        blocks.append(
            (
                hi - start_row,
                body[start_byte:end_byte],
                np.asarray(row_lens[start_row:hi], np.int64),
            )
        )
        start_row, start_byte = hi, end_byte
    return blocks


def _pandas_rows(pdf) -> list[tuple]:
    """pandas chunk -> row tuples with scalar-safe null normalization
    (pd.isna handles None/NaN/NaT; bytes/str/list are never NA)."""
    import pandas as pd

    rows: list[tuple] = []
    for rec in pdf.itertuples(index=False):
        rows.append(
            tuple(
                None
                if v is None
                or (
                    not isinstance(v, (bytes, str, list, tuple))
                    and not hasattr(v, "__len__")
                    and pd.isna(v)
                )
                else v
                for v in rec
            )
        )
    return rows


def _parse_header(blob: bytes):
    """OCF header → (schema dict, kinds, codec, meta, sync, pos)."""
    if blob[:4] != MAGIC:
        raise ValueError(f"not an Avro OCF (magic {blob[:4]!r})")
    pos = 4
    meta: dict[str, bytes] = {}
    while True:
        n, pos = zigzag_decode(blob, pos)
        if n == 0:
            break
        if n < 0:  # negative block count carries a byte size first
            n = -n
            _, pos = zigzag_decode(blob, pos)
        for _ in range(n):
            kl, pos = zigzag_decode(blob, pos)
            if kl < 0 or pos + kl > len(blob):
                raise ValueError("Avro metadata key runs past the buffer")
            k = blob[pos : pos + kl].decode()
            pos += kl
            vl, pos = zigzag_decode(blob, pos)
            if vl < 0 or pos + vl > len(blob):
                raise ValueError("Avro metadata value runs past the buffer")
            meta[k] = blob[pos : pos + vl]
            pos += vl
    if pos + 16 > len(blob):
        raise ValueError("truncated Avro OCF header (no sync marker)")
    sync = blob[pos : pos + 16]
    pos += 16
    codec = meta.get("avro.codec", b"null").decode()
    if codec not in ("null", "deflate"):
        raise NotImplementedError(f"Avro codec {codec!r} (null/deflate supported)")
    try:
        schema = json.loads(meta["avro.schema"])
    except KeyError:
        raise ValueError("Avro OCF has no avro.schema metadata") from None
    except (ValueError, UnicodeDecodeError) as e:
        raise ValueError(f"avro.schema is not valid JSON: {e}") from None
    if (
        not isinstance(schema, dict)
        or not isinstance(schema.get("fields"), list)
        or not all(isinstance(f, dict) and "type" in f for f in schema["fields"])
    ):
        raise ValueError("avro.schema is not a record schema with fields")
    kinds = [_normalize(f["type"]) for f in schema["fields"]]
    return schema, kinds, codec, meta, sync, pos


def _iter_blocks(blob: bytes, pos: int, sync: bytes, codec: str):
    """Walk sync-marked blocks → (count, inflated payload). Block
    counts/sizes are bounds-checked before allocation
    (decompression-bomb caps)."""
    while pos < len(blob):
        count, pos = zigzag_decode(blob, pos)
        size, pos = zigzag_decode(blob, pos)
        if not 0 <= count <= MAX_BLOCK_COUNT:
            raise ValueError(f"Avro block row count {count} outside bounds")
        if not 0 <= size <= MAX_BLOCK_BYTES or pos + size > len(blob):
            raise ValueError(f"Avro block size {size} runs past the buffer")
        payload = blob[pos : pos + size]
        pos += size
        if blob[pos : pos + 16] != sync:
            raise ValueError("Avro block sync marker mismatch — corrupt file")
        pos += 16
        if codec == "deflate":
            d = zlib.decompressobj(-15)
            payload = d.decompress(payload, MAX_BLOCK_BYTES)
            if d.unconsumed_tail:
                raise ValueError("Avro deflate block inflates past the cap")
        yield count, payload


def parse_ocf(blob: bytes) -> tuple[dict, list[tuple]]:
    """One OCF blob → (parsed schema dict, rows as tuples). The
    sequential reference decoder — reads ANY spec-conformant file.
    Typed ValueError/NotImplementedError contract."""
    schema, kinds, codec, _meta, sync, pos = _parse_header(blob)
    rows: list[tuple] = []
    for count, payload in _iter_blocks(blob, pos, sync, codec):
        p = 0
        for _ in range(count):
            vals = []
            for kind, nullable in kinds:
                if nullable:
                    idx, p = zigzag_decode(payload, p)
                    if idx == 0:
                        vals.append(None)
                        continue
                    if idx != 1:
                        raise ValueError(f"Avro union index {idx} out of range")
                v, p = _decode_value(kind, payload, p)
                vals.append(v)
            rows.append(tuple(vals))
        if p != len(payload):
            raise ValueError("Avro block has trailing bytes after its rows")
    return schema, rows


def parse_ocf_columns(blob: bytes):
    """Vectorized decode of a file carrying the ``sif.rowlens`` index:
    → (schema dict, per-writer-field (values, null_mask) pairs,
    n_rows). Values are over NON-NULL rows only (avro_vec contract).
    Raises AvroVecUnsupported when the file lacks the index or the
    schema is outside the fast path — callers fall back to
    parse_ocf."""
    import numpy as np

    from sif_spark.sources.avro_vec import (
        ROWLENS_META_KEY,
        AvroVecUnsupported,
        decode_block_columns,
        unpack_rowlens,
    )

    schema, kinds, codec, meta, sync, pos = _parse_header(blob)
    if ROWLENS_META_KEY not in meta:
        raise AvroVecUnsupported("no sif.rowlens index (foreign writer)")
    rowlens = unpack_rowlens(meta[ROWLENS_META_KEY])
    per_block = []
    n_total = 0
    for i, (count, payload) in enumerate(_iter_blocks(blob, pos, sync, codec)):
        if i >= len(rowlens) or len(rowlens[i]) != count:
            raise ValueError("sif.rowlens disagrees with the block layout")
        per_block.append(decode_block_columns(payload, rowlens[i], kinds))
        n_total += count
    if not per_block:
        return schema, [(np.empty(0), None) for _ in kinds], 0
    cols = []
    for f in range(len(kinds)):
        vals = np.concatenate([b[f][0] for b in per_block])
        masks = [b[f][1] for b in per_block]
        if all(m is None for m in masks):
            mask = None
        else:
            mask = np.concatenate(
                [
                    m
                    if m is not None
                    else np.ones(len(rowlens[i]), bool)
                    for i, m in enumerate(masks)
                ]
            )
        cols.append((vals, mask))
    return schema, cols, n_total


# ---------------------------------------------------------------------------
# Spark source / sink
# ---------------------------------------------------------------------------


_AVRO_TO_SPARK = {
    "boolean": "boolean",
    "int": "int",
    "long": "bigint",
    "float": "float",
    "double": "double",
    "string": "string",
    "bytes": "binary",
    "timestamp-micros": "timestamp",
    "date": "date",
}


def _spark_type_of(kind: str) -> str:
    if kind.startswith("decimal:"):
        _, p, s = kind.split(":")
        return f"decimal({p},{s})"
    if kind.startswith("array:"):
        return f"array<{_AVRO_TO_SPARK[kind.split(':', 1)[1]]}>"
    return _AVRO_TO_SPARK[kind]


def spark_schema_for(avro_schema: dict) -> str:
    """Avro record schema dict → Spark DDL string."""
    cols = []
    for f in avro_schema["fields"]:
        kind, _null = _normalize(f["type"])
        cols.append(f"{f['name']} {_spark_type_of(kind)}")
    return ", ".join(cols)


# Writer→reader promotions from the Avro spec's Schema Resolution
# chapter (value: the Python-side converter, or None for identity).
_PROMOTIONS = {
    ("int", "long"): None,
    ("int", "float"): float,
    ("int", "double"): float,
    ("long", "float"): float,
    ("long", "double"): float,
    ("float", "double"): None,
    ("string", "bytes"): lambda v: v.encode("utf-8"),
    ("bytes", "string"): lambda v: v.decode("utf-8"),
}


def _promote_vec(wkind: str, rkind: str, vals):
    """Vectorized equivalents of _PROMOTIONS for the columns path."""
    import numpy as np

    if wkind == rkind or (wkind, rkind) == ("int", "long"):
        return vals
    if rkind == "double":
        return np.asarray(vals).astype(np.float64)
    if rkind == "float":
        return np.asarray(vals).astype(np.float32)
    if (wkind, rkind) == ("string", "bytes"):
        return np.array([v.encode("utf-8") for v in vals], dtype=object)
    if (wkind, rkind) == ("bytes", "string"):
        return np.array([v.decode("utf-8") for v in vals], dtype=object)
    raise ValueError(f"no vectorized promotion {wkind} -> {rkind}")


def _materialize_col(rkind: str, vals, mask, n: int):
    """(non-null values, null mask) -> one full-height pandas-ready
    column for reader kind ``rkind``. Varint-backed logical kinds
    (timestamp/date) arrive as raw int64 from the vectorized decoder
    and convert to datetime64/date objects HERE, in one astype."""
    import numpy as np

    if rkind == "timestamp-micros":
        conv = np.asarray(vals, np.int64).astype("datetime64[us]")
        if mask is None:
            return conv
        full = np.full(n, np.datetime64("NaT"), "datetime64[us]")
        full[mask] = conv
        return full
    if rkind == "date":
        conv = np.asarray(vals, np.int64).astype("datetime64[D]").astype(object)
    elif rkind in ("double", "float"):
        dt = np.float64 if rkind == "double" else np.float32
        conv = np.asarray(vals, dt)
        if mask is None:
            return conv
        full = np.full(n, np.nan, dt)
        full[mask] = conv
        return full
    elif rkind in ("long", "int"):
        conv = np.asarray(vals, np.int64)
        if mask is None:
            return conv
    elif rkind == "boolean":
        conv = np.asarray(vals, bool)
        if mask is None:
            return conv
    else:  # string / bytes / decimal — already object arrays
        conv = np.asarray(vals, dtype=object)
    if mask is None:
        return conv
    full = np.empty(n, object)  # None-initialized
    full[mask] = conv
    return full

_MISSING = object()


def _default_value(kind: str, default):
    """An Avro JSON `default` → the Python value this reader yields
    for a writer-absent field (spec: defaults are written in the
    UNDERLYING JSON type; bytes defaults are ISO-8859-1 strings)."""
    if default is None:
        return None
    if kind in ("int", "long"):
        return int(default)
    if kind in ("float", "double"):
        return float(default)
    if kind == "boolean":
        return bool(default)
    if kind == "string":
        return str(default)
    if kind == "bytes":
        return str(default).encode("latin-1")
    raise NotImplementedError(
        f"non-null default for Avro logical type {kind!r} is out of scope"
    )


def _resolution_plan(writer_schema: dict, reader, strict: bool):
    """Per the spec's Schema Resolution: match fields by NAME, promote
    kinds per _PROMOTIONS, fill reader-only fields from defaults. In
    strict mode (no reader_schema passed) the field-name sets and
    kinds must match exactly — a drifted file raises instead of being
    silently mis-mapped onto the wrong columns (ADVICE r9).

    Returns [(writer_index | None, converter | None, default)] in
    reader-field order."""
    wkinds = [_normalize(f["type"])[0] for f in writer_schema["fields"]]
    wnames = [f["name"] for f in writer_schema["fields"]]
    widx = {n: i for i, n in enumerate(wnames)}
    plan = []
    for name, kind, default in reader:
        if name in widx:
            i = widx[name]
            wkind = wkinds[i]
            if wkind == kind:
                plan.append((i, None, None))
            elif (wkind, kind) in _PROMOTIONS and (
                not strict or (wkind, kind) in (("int", "long"), ("float", "double"))
            ):
                # strict mode still takes the LOSSLESS widenings — a
                # caller's `schema=` DDL declaring bigint over int files
                # can't mis-map anything; the representation-changing
                # promotions (string↔bytes, int→float) need an explicit
                # reader_schema
                plan.append((i, _PROMOTIONS[(wkind, kind)], None))
            else:
                raise ValueError(
                    f"Avro field {name!r}: file has {wkind}, reader expects "
                    f"{kind}" + ("" if strict else " (no legal promotion)")
                )
        elif not strict and default is not _MISSING:
            plan.append((None, None, _default_value(kind, default)))
        else:
            raise ValueError(
                f"Avro field {name!r} is missing from the file's schema"
                + ("" if strict else " and has no default")
            )
    if strict:
        extra = set(wnames) - {n for n, _, _ in reader}
        if extra:
            raise ValueError(
                f"file carries fields {sorted(extra)} absent from the "
                "expected schema — pass reader_schema= to resolve evolution"
            )
    return plan


def write_avro(
    df: DataFrame, path: str, codec: str = "deflate", record_name: str = "row"
) -> None:
    """Distributed Avro OCF sink: each partition authors one
    ``part-<pid>.avro`` file under ``path`` on shared storage (the
    same shared-FS contract as the streaming stores), and a _SUCCESS
    marker commits the directory. One pass, no shuffle."""
    import os

    import pandas as pd
    from pyspark import TaskContext

    schema_json = avro_schema_for(df.schema, record_name)
    cols = [f.name for f in df.schema.fields]
    os.makedirs(path, exist_ok=True)

    def author(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pid = TaskContext.get().partitionId()
        parts = [pdf for pdf in batches if len(pdf)]
        pdf = (
            pd.concat(parts, ignore_index=True)
            if parts
            else pd.DataFrame(columns=cols)
        )
        blob = write_ocf_pandas(schema_json, pdf, codec)
        fname = os.path.join(path, f"part-{pid:05d}.avro")
        with open(fname, "wb") as fh:
            fh.write(blob)
        yield pd.DataFrame({"file": [fname], "n_rows": [len(pdf)]})

    written = df.select(*cols).mapInPandas(author, "file string, n_rows long")
    written.collect()  # O(#partitions) driver rows — the commit barrier
    with open(os.path.join(path, "_SUCCESS"), "w"):
        pass


def read_avro(
    spark: SparkSession,
    path_glob: str,
    schema: str | None = None,
    reader_schema: str | None = None,
) -> DataFrame:
    """Read Avro OCF files: binaryFile scan → Arrow-batched mapInPandas
    parse (one task per file).

    Every file is decoded with its OWN embedded avro.schema and mapped
    onto the output columns BY NAME (never positionally — a corpus
    whose files differ in field order realigns correctly; ADVICE r9):

    - default: the expected schema comes from ``schema`` (Spark DDL)
      or, absent that, the first file's schema (one driver-side read —
      pass ``schema`` for remote/huge corpora). Files whose field
      names or kinds drift from it raise a typed error.
    - ``reader_schema`` (Avro record JSON) switches on the spec's
      Schema Resolution: writer-only fields are skipped, reader-only
      fields fill from their ``default``, and int→long/float/double,
      long→float/double, float→double, string↔bytes promotions apply —
      the read-side half of schema evolution."""
    import pandas as pd

    blobs = spark.read.format("binaryFile").load(path_glob)
    strict = reader_schema is None
    if reader_schema is not None:
        rs = json.loads(reader_schema)
        if schema is None:
            schema = spark_schema_for(rs)
        reader = [
            (f["name"], _normalize(f["type"])[0], f.get("default", _MISSING))
            for f in rs["fields"]
        ]
    else:
        if schema is None:
            head = blobs.select("content").head()
            if head is None:
                raise ValueError(f"no Avro files match {path_glob!r}")
            avro_schema, _ = parse_ocf(bytes(head["content"]))
            schema = spark_schema_for(avro_schema)
        ddl_struct = T._parse_datatype_string(schema)
        expected = json.loads(avro_schema_for(ddl_struct))
        reader = [
            (f["name"], _normalize(f["type"])[0], _MISSING)
            for f in expected["fields"]
        ]
    out_schema = T._parse_datatype_string(schema)
    names = [f.name for f in out_schema.fields]

    rkinds = [k for _n, k, _d in reader]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from sif_spark.sources.avro_vec import AvroVecUnsupported

        plans: dict[str, tuple] = {}  # one resolution per distinct writer schema
        for pdf in batches:
            for b in pdf["content"]:
                blob = bytes(b)
                try:  # vectorized columns path (sif.rowlens-indexed files)
                    wschema, fcols, n = parse_ocf_columns(blob)
                    rows = None
                except AvroVecUnsupported:
                    wschema, rows = parse_ocf(blob)  # sequential reference
                    n = len(rows)
                key = json.dumps(wschema, sort_keys=True)
                if key not in plans:
                    plans[key] = (
                        _resolution_plan(wschema, reader, strict),
                        [_normalize(f["type"])[0] for f in wschema["fields"]],
                    )
                plan, wkinds = plans[key]
                if not n:  # empty-partition file: schema checked above
                    continue
                cols: dict = {}
                if rows is None:
                    for name, rkind, (src, _conv, dflt) in zip(
                        names, rkinds, plan
                    ):
                        if src is None:
                            full = pd.Series([dflt] * n, dtype=object)
                        else:
                            vals, mask = fcols[src]
                            vals = _promote_vec(wkinds[src], rkind, vals)
                            full = _materialize_col(rkind, vals, mask, n)
                        cols[name] = full
                else:
                    for name, (src, conv, dflt) in zip(names, plan):
                        if src is None:
                            cols[name] = [dflt] * n
                        elif conv is None:
                            cols[name] = [r[src] for r in rows]
                        else:
                            cols[name] = [
                                None if r[src] is None else conv(r[src])
                                for r in rows
                            ]
                yield pd.DataFrame(cols, columns=names)

    return blobs.select("content").mapInPandas(run, out_schema)
