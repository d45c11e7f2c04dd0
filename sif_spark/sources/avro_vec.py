"""NumPy-vectorized Avro binary codec — the fast path behind
`sources/avro.py` (same public semantics, ~40-100x the rows/s).

Why this exists: the per-row encoder/decoder in avro.py is a correct
reference implementation, but at ~40k rows/s/core it is the FLAC
class of throughput — fine for a type gate, wrong for an
Avro-dominated ingest at scale. The binary encoding itself is
embarrassingly vectorizable:

- **encode**: every column's values become (flat_bytes, per_row_len)
  pairs via NumPy (zigzag varints through a (n,10)-byte mask matrix,
  fixed-width via dtype views, strings/bytes via Arrow's C UTF-8
  machinery), and the row-major interleave the format demands is one
  grouped-arange scatter per column. The vectorized writer is pinned
  BYTE-IDENTICAL to the per-row writer in tests.
- **decode**: Avro's varints make a block a sequential walk — you
  cannot know where row i+1 starts before decoding row i. The writer
  therefore stores a per-block row-length index in an extra OCF
  metadata key (``sif.rowlens``: deflated uint32 row byte-lengths per
  block) — exactly Parquet's offset-index idea. Spec-legal: OCF
  metadata is an open map, foreign readers ignore unknown keys.
  With row starts known, each FIELD decodes across all rows as a
  handful of NumPy gathers; strings build through
  `pyarrow.StringArray.from_buffers`. Files without the index (any
  foreign writer) keep the sequential path in avro.py.

Everything here is column-oriented: the decoder returns
``(values, null_mask)`` per writer field, and avro.py materializes
pandas columns after schema resolution.

Scope guards: array-typed fields and any malformed index fall back
loudly (AvroVecUnsupported) to the sequential reference path — the
two implementations are differentially pinned in tests/test_avro.py.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

ROWLENS_META_KEY = "sif.rowlens"

_VEC_KINDS = {
    "boolean", "int", "long", "float", "double", "string", "bytes",
    "timestamp-micros", "date",
}
# array items the fast path takes: fixed-width (flat byte gather) and
# varint (wave decode). array:string/bytes stay on the reference path.
_VEC_ARRAY_ITEMS = {"float", "double", "boolean", "int", "long"}
_FIXED_WIDTHS = {"float": 4, "double": 8, "boolean": 1}


class AvroVecUnsupported(Exception):
    """Raised when a schema/file is outside the vectorized fast path;
    callers fall back to the sequential reference implementation."""


def _vec_ok(kinds) -> bool:
    def ok(k: str) -> bool:
        if k in _VEC_KINDS or k.startswith("decimal:"):
            return True
        return k.startswith("array:") and k.split(":", 1)[1] in _VEC_ARRAY_ITEMS

    return all(ok(k) for k, _null in kinds)


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------


def _grouped_arange(lens: np.ndarray) -> np.ndarray:
    """[3,1,2] -> [0,1,2,0,0,1] — intra-group offsets for scatter."""
    if len(lens) == 0:
        return np.empty(0, np.int64)
    ends = np.cumsum(lens)
    return np.arange(ends[-1], dtype=np.int64) - np.repeat(ends - lens, lens)


def _venc_u64(u: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """uint64 array -> (flat varint bytes, per-value byte lengths)."""
    u = u.astype(np.uint64, copy=False)
    n = len(u)
    lens = np.ones(n, np.int64)
    for k in range(1, 10):
        lens += (u >= np.uint64(1 << (7 * k))).astype(np.int64)
    mat = np.empty((n, 10), np.uint8)
    for j in range(10):
        mat[:, j] = ((u >> np.uint64(7 * j)) & np.uint64(0x7F)).astype(
            np.uint8
        ) | np.uint8(0x80)
    mat[np.arange(n), lens - 1] &= 0x7F
    flat = mat[np.arange(10) < lens[:, None]]  # C-order: row-major, in order
    return flat, lens


def _venc_zigzag(x: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    x = x.astype(np.int64, copy=False)
    u = ((x << 1) ^ (x >> 63)).view(np.uint64)
    return _venc_u64(u)


def _interleave(cells: list[tuple[np.ndarray, np.ndarray]], n: int):
    """Row-major interleave: each cell is (flat_bytes, per_row_lens);
    returns (body bytes, per_row total lens). The core scatter that
    turns column-encoded chunks into Avro's row-major layout."""
    C = len(cells)
    L = np.empty((n, C), np.int64)
    for c, (_flat, lens) in enumerate(cells):
        L[:, c] = lens
    cell_lens = L.ravel()
    ends = np.cumsum(cell_lens)
    total = int(ends[-1]) if len(ends) else 0
    starts = ends - cell_lens
    out = np.empty(total, np.uint8)
    for c, (flat, lens) in enumerate(cells):
        cs = starts[c::C]
        if not len(flat):
            continue
        w = lens[0] if len(lens) else 0
        if w and (lens == w).all():
            # constant-width cell (prefix bytes, bool, float/double):
            # one 2-D fancy-index assignment, no repeat/arange walk
            out[cs[:, None] + np.arange(w)] = flat.reshape(len(cs), w)
        else:
            out[np.repeat(cs, lens) + _grouped_arange(lens)] = flat
    return out, L.sum(axis=1)


def _expand_nonnull(
    vflat: np.ndarray, vlens: np.ndarray, mask: np.ndarray, n: int
) -> tuple[np.ndarray, np.ndarray]:
    """Value bytes computed over non-null rows -> a full-height cell
    (null rows get length 0; union prefixes are a separate cell)."""
    lens = np.zeros(n, np.int64)
    lens[mask] = vlens
    return vflat, lens


# ---------------------------------------------------------------------------
# encode: one column -> cells
# ---------------------------------------------------------------------------


def _pa_flat(series, patype):
    """Arrow-encode an object series (strings/bytes) -> (data bytes as
    uint8 array, per-value byte lens). Uses Arrow's C encoder instead
    of a Python .encode() per value."""
    import pyarrow as pa

    arr = pa.array(series, type=patype)
    if arr.null_count:
        raise AvroVecUnsupported("nulls must be masked before _pa_flat")
    off = np.frombuffer(arr.buffers()[1], np.int32, len(arr) + 1, 0)
    start = off[0]  # sliced arrays have a nonzero first offset
    data_buf = arr.buffers()[2]
    data = (
        np.frombuffer(data_buf, np.uint8, int(off[-1] - start), int(start))
        if data_buf is not None and off[-1] > start
        else np.empty(0, np.uint8)
    )
    return data, np.diff(off).astype(np.int64)


def _enc_lenprefixed(data: np.ndarray, blens: np.ndarray):
    """(payload bytes, lens) -> cells for varint(len) + payload."""
    lflat, llens = _venc_zigzag(blens)
    return [(lflat, llens), (data, blens)]


def _decimal_unscaled(values, scale: int) -> np.ndarray:
    from decimal import Decimal

    out = np.empty(len(values), np.int64)
    q = Decimal(1).scaleb(-scale)
    for i, v in enumerate(values):
        d = v if isinstance(v, Decimal) else Decimal(str(v))
        out[i] = int(d.quantize(q).scaleb(scale))
    return out


def _enc_decimal_bytes(unscaled: np.ndarray):
    """int64 unscaled -> minimal big-endian two's-complement bytes
    (same minimal-length convention as the reference encoder)."""
    a = unscaled.astype(np.int64, copy=False)
    mag = np.where(a < 0, ~a, a)  # bits that must fit under the sign bit
    nb = np.ones(len(a), np.int64)
    for k in range(1, 8):
        nb += (mag >= np.int64(1) << np.int64(8 * k - 1)).astype(np.int64)
    full = a.astype(">i8").view(np.uint8).reshape(len(a), 8)
    keep = np.arange(8) >= (8 - nb[:, None])
    return _enc_lenprefixed(full[keep], nb)


def encode_columns(kinds, cols, n: int):
    """Vectorized body encode: ``cols[i]`` is (values, null_mask|None)
    for writer field i (values over NON-NULL rows only, in row order).
    Returns (body uint8 array, per-row byte lens).

    Raises AvroVecUnsupported for kinds outside the fast path (the
    caller falls back to the per-row reference encoder)."""
    if not _vec_ok(kinds):
        raise AvroVecUnsupported("schema contains non-vectorized kinds")
    cells: list[tuple[np.ndarray, np.ndarray]] = []
    for (kind, nullable), (vals, mask) in zip(kinds, cols):
        if nullable:
            if mask is None:
                mask = np.ones(n, bool)
            prefix = np.where(mask, np.uint8(2), np.uint8(0))  # zigzag 1 / 0
            cells.append((prefix, np.ones(n, np.int64)))
        else:
            if mask is not None and not mask.all():
                raise ValueError("NULL in a non-nullable Avro field")
            mask = np.ones(n, bool)
        sub_cells = _encode_values(kind, vals)
        for vflat, vlens in sub_cells:
            cells.append(_expand_nonnull(vflat, vlens, mask, n))
    return _interleave(cells, n)


def _encode_values(kind: str, vals):
    """Non-null values of one field -> list of (flat, lens) cells."""
    if kind in ("long", "int"):
        f, l = _venc_zigzag(np.asarray(vals, np.int64))
        return [(f, l)]
    if kind == "timestamp-micros":
        us = np.asarray(vals).astype("datetime64[us]").astype(np.int64)
        f, l = _venc_zigzag(us)
        return [(f, l)]
    if kind == "date":
        days = np.asarray(vals, "datetime64[D]").astype(np.int64)
        f, l = _venc_zigzag(days)
        return [(f, l)]
    if kind == "boolean":
        b = np.asarray(vals).astype(np.uint8)
        return [(b, np.ones(len(b), np.int64))]
    if kind == "double":
        d = np.asarray(vals, np.float64).astype("<f8").view(np.uint8)
        return [(d, np.full(len(vals), 8, np.int64))]
    if kind == "float":
        d = np.asarray(vals, np.float32).astype("<f4").view(np.uint8)
        return [(d, np.full(len(vals), 4, np.int64))]
    if kind == "string":
        import pyarrow as pa

        data, blens = _pa_flat(list(vals), pa.string())
        return _enc_lenprefixed(data, blens)
    if kind == "bytes":
        import pyarrow as pa

        data, blens = _pa_flat([bytes(v) for v in vals], pa.binary())
        return _enc_lenprefixed(data, blens)
    if kind.startswith("decimal:"):
        _, p, s = kind.split(":")
        if int(p) > 18:
            # the vectorized unscaled path is int64; precision > 18
            # (e.g. Spark's default decimal(38,x)) would raise
            # OverflowError mid-encode instead of engaging the
            # documented per-row fallback (ADVICE r10 low)
            raise AvroVecUnsupported(
                f"decimal({p},{s}) exceeds the int64 unscaled fast path"
            )
        return _enc_decimal_bytes(_decimal_unscaled(list(vals), int(s)))
    if kind.startswith("array:"):
        return _enc_array(kind.split(":", 1)[1], vals)
    raise AvroVecUnsupported(f"encode: kind {kind!r} not vectorized")


def _enc_array(item: str, vals):
    """Arrays of primitives (the embeddings / token-id interchange
    case), spec layout per row: varint(count) + items + varint(0)
    terminator (empty arrays are the bare terminator — matching the
    reference encoder byte for byte). Items flatten through Arrow;
    fixed-width items are one dtype view, varint items one flat
    _venc_zigzag with per-row byte lengths by prefix-sum gather."""
    import pyarrow as pa

    if item not in _VEC_ARRAY_ITEMS:
        raise AvroVecUnsupported(f"array items {item!r} not vectorized")
    pa_item = {
        "float": pa.float32(), "double": pa.float64(),
        "boolean": pa.bool_(), "int": pa.int64(), "long": pa.int64(),
    }[item]
    arr = pa.array(list(vals), pa.list_(pa_item))
    flat = arr.flatten()
    if flat.null_count:
        raise ValueError("NULL inside an Avro array of primitives")
    offsets = arr.offsets.to_numpy().astype(np.int64)
    counts = np.diff(offsets)
    nz = counts > 0
    cflat, clens_nz = _venc_zigzag(counts[nz])
    clens = np.zeros(len(counts), np.int64)
    clens[nz] = clens_nz
    cells = [(cflat, clens)]
    fvals = flat.to_numpy(zero_copy_only=False)
    if item in _FIXED_WIDTHS:
        w = _FIXED_WIDTHS[item]
        if item == "float":
            data = fvals.astype("<f4").view(np.uint8)
        elif item == "double":
            data = fvals.astype("<f8").view(np.uint8)
        else:
            data = fvals.astype(np.uint8)
        cells.append((data, counts * w))
    else:
        iflat, ilens_item = _venc_zigzag(fvals.astype(np.int64))
        cum = np.concatenate(([0], np.cumsum(ilens_item)))
        cells.append((iflat, cum[offsets[1:]] - cum[offsets[:-1]]))
    cells.append((np.zeros(len(counts), np.uint8), np.ones(len(counts), np.int64)))
    return cells


# ---------------------------------------------------------------------------
# rowlens index (OCF metadata side-channel)
# ---------------------------------------------------------------------------


def pack_rowlens(blocks: list[np.ndarray]) -> bytes:
    """Per-block uint32 row byte-lengths -> deflated metadata value."""
    parts = []
    for lens in blocks:
        parts.append(struct.pack("<I", len(lens)))
        parts.append(np.asarray(lens, "<u4").tobytes())
    return zlib.compress(b"".join(parts), 6)


# inflate cap for the metadata index: 4 bytes per row + 4 per block,
# so 256 MiB covers ~64M rows/file — far beyond anything this writer
# authors (blocks flush at 100k rows / 16 MiB), while a crafted
# deflate bomb in the attacker-controlled metadata map stops here
# instead of bypassing the block path's caps (ADVICE r10 medium)
_ROWLENS_RAW_CAP = 1 << 28


def unpack_rowlens(blob: bytes) -> list[np.ndarray]:
    d = zlib.decompressobj()
    raw = d.decompress(blob, _ROWLENS_RAW_CAP)
    if not d.eof:
        raise ValueError(
            "sif.rowlens index exceeds the 256 MiB decompression cap "
            "(or is truncated)"
        )
    out, pos = [], 0
    while pos < len(raw):
        if pos + 4 > len(raw):
            raise ValueError("truncated sif.rowlens index")
        (cnt,) = struct.unpack_from("<I", raw, pos)
        pos += 4
        if pos + 4 * cnt > len(raw):
            raise ValueError("sif.rowlens block runs past the buffer")
        out.append(np.frombuffer(raw, "<u4", cnt, pos).astype(np.int64))
        pos += 4 * cnt
    return out


# ---------------------------------------------------------------------------
# decode: one block payload -> columns
# ---------------------------------------------------------------------------


def _vdec(buf: np.ndarray, pos: np.ndarray):
    """Vectorized zigzag-varint decode at positions ``pos`` of a
    zero-padded payload. Returns (int64 values, new positions)."""
    n = len(pos)
    if n == 0:
        return np.empty(0, np.int64), pos
    mat = buf[pos[:, None] + np.arange(10)]
    cont = (mat & 0x80) != 0
    nbytes = np.argmin(cont, axis=1) + 1  # first stop byte
    if cont.all(axis=1).any():
        raise ValueError("Avro varint longer than 64 bits")
    groups = (mat & np.uint8(0x7F)).astype(np.uint64)
    shifts = (np.uint64(7) * np.arange(10, dtype=np.uint64))[None, :]
    groups <<= shifts
    groups[np.arange(10)[None, :] >= nbytes[:, None]] = 0
    u = groups.sum(axis=1, dtype=np.uint64)
    v = (u >> np.uint64(1)).astype(np.int64) ^ -(u & np.uint64(1)).astype(
        np.int64
    )
    return v, pos + nbytes


def _gather_fixed(buf: np.ndarray, pos: np.ndarray, width: int, dtype: str):
    mat = buf[pos[:, None] + np.arange(width)]
    return np.ascontiguousarray(mat).view(dtype).ravel(), pos + width


def _gather_var(buf: np.ndarray, pos: np.ndarray, lens: np.ndarray):
    """Variable slices -> (contiguous data, int32 offsets) for Arrow.
    Constant-length slices (fixed-dim embeddings, fixed-width codes)
    gather through one 2-D fancy index instead of a per-byte
    repeat+arange walk."""
    offsets = np.zeros(len(pos) + 1, np.int32)
    np.cumsum(lens, out=offsets[1:])
    if len(lens):
        w = int(lens[0])
        if w and (lens == w).all():
            data = buf[pos[:, None] + np.arange(w)].ravel()
            return data, offsets
    idx = np.repeat(pos, lens) + _grouped_arange(lens)
    return buf[idx], offsets


def decode_block_columns(payload: bytes, row_lens: np.ndarray, kinds):
    """One inflated block + its row-length index -> per-field
    (values, null_mask|None). Values are over NON-NULL rows only;
    the caller (avro.py) materializes pandas columns after schema
    resolution. Raises ValueError if the index disagrees with the
    payload (caller falls back to the sequential reference path)."""
    if not _vec_ok(kinds):
        raise AvroVecUnsupported("schema contains non-vectorized kinds")
    n = len(row_lens)
    if int(row_lens.sum()) != len(payload):
        raise ValueError("sif.rowlens disagrees with the block payload")
    buf = np.frombuffer(payload + b"\x00" * 16, np.uint8)
    ends = np.cumsum(row_lens)
    pos = (ends - row_lens).astype(np.int64)
    out = []
    for kind, nullable in kinds:
        if nullable:
            pb = buf[pos]
            bad = (pb != 0) & (pb != 2)
            if bad.any():
                raise ValueError(
                    f"Avro union index byte {int(pb[bad][0])} out of range"
                )
            mask = pb == 2  # True = value present
            pos = pos + 1
        else:
            mask = None
        active = pos if mask is None else pos[mask]
        vals, newpos = _decode_values(kind, buf, active)
        if mask is None:
            pos = newpos
        else:
            pos = pos.copy()
            pos[mask] = newpos
        out.append((vals, mask))
    if len(pos) and not (pos == ends).all():
        raise ValueError("vectorized decode did not land on row boundaries")
    return out


def _decode_values(kind: str, buf: np.ndarray, pos: np.ndarray):
    if kind in ("long", "int", "timestamp-micros", "date"):
        return _vdec(buf, pos)
    if kind == "boolean":
        return buf[pos] != 0, pos + 1
    if kind == "double":
        return _gather_fixed(buf, pos, 8, "<f8")
    if kind == "float":
        return _gather_fixed(buf, pos, 4, "<f4")
    if kind in ("string", "bytes"):
        import pyarrow as pa

        lens, pos = _vdec(buf, pos)
        if len(lens) and ((lens < 0).any() or (pos + lens > len(buf)).any()):
            raise ValueError(f"Avro {kind} length runs past the block")
        data, offsets = _gather_var(buf, pos, lens)
        arr = pa.Array.from_buffers(
            pa.utf8() if kind == "string" else pa.binary(),
            len(pos),
            [None, pa.py_buffer(offsets.tobytes()), pa.py_buffer(data.tobytes())],
        )
        return arr.to_pandas().to_numpy(), pos + lens
    if kind.startswith("decimal:"):
        from decimal import Decimal

        _, _p, s = kind.split(":")
        sc = int(s)
        lens, pos = _vdec(buf, pos)
        if len(lens) and (
            (lens <= 0).any() or (pos + lens > len(buf)).any()
        ):
            raise ValueError("Avro decimal length runs past the block")
        data, offsets = _gather_var(buf, pos, lens)
        db = data.tobytes()

        def _exact(u: int) -> Decimal:
            # context-exact shift (scaleb would round wide decimals
            # at the default 28-digit context)
            t = Decimal(u).as_tuple()
            return Decimal((t.sign, t.digits, t.exponent - sc))

        vals = np.array(
            [
                _exact(
                    int.from_bytes(db[offsets[i] : offsets[i + 1]], "big", signed=True)
                )
                for i in range(len(pos))
            ],
            dtype=object,
        )
        return vals, pos + lens
    if kind.startswith("array:"):
        return _dec_array(kind.split(":", 1)[1], buf, pos)
    raise AvroVecUnsupported(f"decode: kind {kind!r} not vectorized")


def _dec_array(item: str, buf: np.ndarray, pos: np.ndarray):
    """Single-block array decode (the only shape this module's writers
    emit): varint(count), items, 0x00 terminator. Fixed-width items
    come back as one flat gather + split; varint items decode in
    WAVES — pass r decodes item r of every still-active row, so the
    work is O(total items) in vectorized batches, not per-value
    Python. Multi-block arrays (negative counts / nonzero terminator)
    raise — a sif.rowlens-indexed file can only come from this writer,
    which never authors them."""
    if item not in _VEC_ARRAY_ITEMS:
        raise AvroVecUnsupported(f"array items {item!r} not vectorized")
    counts, pos = _vdec(buf, pos)
    if len(counts) and (counts < 0).any():
        raise ValueError("multi-block Avro array outside the indexed fast path")
    # every item costs >= 1 byte, so total items are bounded by the
    # payload; the wave matrix is additionally bounded before allocation
    if len(counts) and int(counts.sum()) > len(buf):
        raise ValueError("Avro array counts run past the block")
    if len(counts) and int(counts.max()) * len(counts) > (1 << 27):
        raise ValueError("Avro array wave matrix would exceed the 1 GiB cap")
    if item in _FIXED_WIDTHS:
        w = _FIXED_WIDTHS[item]
        blens = counts * w
        if len(blens) and (pos + blens > len(buf)).any():
            raise ValueError("Avro array items run past the block")
        data, _off = _gather_var(buf, pos, blens)
        raw = data.tobytes()
        if item == "float":
            flat = np.frombuffer(raw, "<f4")
        elif item == "double":
            flat = np.frombuffer(raw, "<f8")
        else:
            flat = np.frombuffer(raw, np.uint8) != 0
        pos = pos + blens
    else:
        max_c = int(counts.max()) if len(counts) else 0
        mat = np.zeros((len(pos), max_c), np.int64)
        pos = pos.copy()
        for r in range(max_c):
            active = counts > r
            v, newp = _vdec(buf, pos[active])
            mat[active, r] = v
            pos[active] = newp
        flat = (
            mat[np.arange(max_c) < counts[:, None]]
            if max_c
            else np.empty(0, np.int64)
        )
    has_items = counts > 0
    if has_items.any():
        if (buf[pos[has_items]] != 0).any():
            raise ValueError(
                "multi-block Avro array outside the indexed fast path"
            )
    pos = pos + has_items.astype(np.int64)
    out = np.empty(len(counts), object)
    ends = np.cumsum(counts)
    starts = ends - counts
    for i in range(len(counts)):  # plain slices — np.split costs 6x this
        out[i] = flat[starts[i] : ends[i]]
    return out, pos


# ---------------------------------------------------------------------------
# pandas bridge (used by avro.py's writer)
# ---------------------------------------------------------------------------


def columns_from_pandas(kinds, names, pdf):
    """A pandas chunk -> the (values-over-non-null, null_mask) pairs
    encode_columns wants. Raises AvroVecUnsupported on dtypes the
    fast path can't take wholesale (caller falls back per-row)."""
    import pandas as pd

    n = len(pdf)
    cols = []
    for (kind, nullable), name in zip(kinds, names):
        s = pdf[name]
        isna = s.isna()
        if isna.any():
            if not nullable:
                raise ValueError("NULL in a non-nullable Avro field")
            mask = (~isna).to_numpy()
            sub = s[~isna]
        else:
            mask = None
            sub = s
        if kind in ("long", "int"):
            vals = sub.to_numpy(np.int64)
        elif kind == "timestamp-micros":
            vals = sub.to_numpy()
            if vals.dtype == object:
                vals = np.array(list(vals), "datetime64[us]")
        elif kind == "date":
            # DatetimeIndex parses object date columns in C (~40x the
            # np.array(list(...)) object walk)
            vals = pd.DatetimeIndex(sub).values.astype("datetime64[D]")
        elif kind in ("double", "float"):
            vals = sub.to_numpy(np.float64 if kind == "double" else np.float32)
        elif kind == "boolean":
            vals = sub.to_numpy()
            if vals.dtype == object:
                vals = vals.astype(bool)
        elif (
            kind in ("string", "bytes")
            or kind.startswith("decimal:")
            or kind.startswith("array:")
        ):
            vals = list(sub)
        else:
            raise AvroVecUnsupported(f"pandas bridge: kind {kind!r}")
        cols.append((vals, mask))
    return cols, n
