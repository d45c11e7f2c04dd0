"""Baseline JPEG (JFIF / ITU T.81) codec — stdlib + NumPy only.

The last big media format behind the injected-codec gate
(multimodal.py): the reference's custom column types carry arbitrary
bytes (reference: columntype/column_type.go:16-23,
docs/custom-columntypes.md:1-20), and a real crawl corpus is
dominated by JPEG. This module implements the decode path a 100 TB
pipeline needs to *validate and feature-extract* JPEG blobs without a
native dependency, plus an encoder used by the test suite to author
byte streams (round-trips alone can't catch symmetric bugs — the
known-answer tests use independently hand-assembled spec bytes).

Scope (typed errors beyond it):
  decode: baseline DCT (SOF0) and extended sequential (SOF1), 8-bit,
  Huffman, grayscale or YCbCr with 4:4:4 / 4:2:2 / 4:2:0 sampling,
  restart markers (DRI/RSTn), multiple DQT/DHT segments.
  NotImplementedError for progressive (SOF2) and arithmetic coding
  (SOF9-11); ValueError for malformed/truncated streams — never a
  hang, never an unbounded allocation (the entropy decode is bounded
  by the declared MCU count, and declared dimensions go through the
  same pixel budget as every other decoder).

Performance boundary: Huffman entropy decode is a serial Python loop
over symbols (a 16-bit prefix LUT makes each symbol one table hit);
dequantize/IDCT/upsample/color-convert are vectorized NumPy over all
blocks at once. Like PNG/GIF, this is the documented built-in-codec
boundary (multimodal.py module doc) — bulk 100 TB decode injects a
native codec through the same decoder= plumbing; these built-ins are
for correctness, validation, and modest-volume corpora. Measured
throughput: see SCALE.md (codec throughput table).
"""

from __future__ import annotations

import numpy as np

# --------------------------------------------------------------------------
# Spec constants (ITU T.81 public spec)
# --------------------------------------------------------------------------

#: zigzag scan order: k-th entropy-coded coefficient -> row-major index
ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# Annex K "typical" Huffman tables (the tables every camera/encoder
# ships): (bits[1..16], values). The encoder writes exactly these into
# DHT; the decoder builds whatever tables the stream declares.
DC_LUM_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUM_VALS = list(range(12))
DC_CHR_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHR_VALS = list(range(12))
AC_LUM_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125]
AC_LUM_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
AC_CHR_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119]
AC_CHR_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

# DCT-II basis: C[u, x] = c_u/2 * cos((2x+1) u pi / 16). Forward
# F = C @ f @ C.T ; inverse f = C.T @ F @ C — both exact per T.81
# Annex A (floating point; conformance tolerance is ±1 LSB).
_x = np.arange(8)
_C = 0.5 * np.cos((2 * _x[None, :] + 1) * _x[:, None] * np.pi / 16)
_C[0] /= np.sqrt(2)


# --------------------------------------------------------------------------
# Huffman machinery
# --------------------------------------------------------------------------


def _canonical_codes(bits: list[int], values: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per the spec's canonical assignment."""
    out: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[values[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return out


def _build_lut(bits: list[int], values: list[int]) -> tuple[np.ndarray, np.ndarray]:
    """16-bit-prefix lookup: peek 16 bits -> (symbol, code length).
    Length 0 marks an invalid prefix (malformed stream)."""
    if sum(bits) != len(values) or sum(bits) > 256:
        raise ValueError("malformed JPEG Huffman table")
    sym = np.zeros(1 << 16, dtype=np.int16)
    length = np.zeros(1 << 16, dtype=np.uint8)
    code, k = 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            if code >= (1 << ln):
                raise ValueError("malformed JPEG Huffman table (code overflow)")
            lo = code << (16 - ln)
            hi = (code + 1) << (16 - ln)
            sym[lo:hi] = values[k]
            length[lo:hi] = ln
            code += 1
            k += 1
        code <<= 1
    return sym, length


class _BitReader:
    """MSB-first bit reader over an already unstuffed entropy segment.
    Reads past the end raise (truncated stream) — peeking may pad with
    zeros (the final real symbol legitimately peeks past the last
    byte) but *consuming* padding is an error."""

    __slots__ = ("data", "nbytes", "pos", "buf", "nbits", "consumed")

    def __init__(self, data: bytes):
        self.data = data
        self.nbytes = len(data)
        self.pos = 0
        self.buf = 0
        self.nbits = 0
        self.consumed = 0

    def _fill(self, need: int) -> None:
        while self.nbits < need:
            b = self.data[self.pos] if self.pos < self.nbytes else 0
            self.pos += 1
            self.buf = ((self.buf << 8) | b) & 0xFFFFFFFF
            self.nbits += 8

    def peek16(self) -> int:
        self._fill(16)
        return (self.buf >> (self.nbits - 16)) & 0xFFFF

    def take(self, n: int) -> int:
        if n == 0:
            return 0
        self._fill(n)
        self.consumed += n
        if self.consumed > self.nbytes * 8:
            raise ValueError("truncated JPEG entropy stream")
        v = (self.buf >> (self.nbits - n)) & ((1 << n) - 1)
        self.nbits -= n
        return v


def _huff(br: _BitReader, lut: tuple[np.ndarray, np.ndarray]) -> int:
    p = br.peek16()
    ln = lut[1][p]
    if ln == 0:
        raise ValueError("invalid JPEG Huffman code")
    br.take(int(ln))
    return int(lut[0][p])


def _extend(v: int, t: int) -> int:
    """Signed-magnitude extension (spec EXTEND): t-bit value -> signed."""
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


# --------------------------------------------------------------------------
# Decoder
# --------------------------------------------------------------------------


def decode_jpeg(blob: bytes) -> np.ndarray:
    """Baseline JFIF -> (h, w) grayscale or (h, w, 3) RGB uint8."""
    from sif_spark.operators.multimodal import _check_pixel_budget

    if blob[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    hufftables: dict[tuple[int, int], tuple[np.ndarray, np.ndarray]] = {}
    frame = None  # (h, w, [(cid, hs, vs, tq)])
    restart_interval = 0
    n = len(blob)

    while pos < n:
        if blob[pos] != 0xFF:
            raise ValueError("JPEG marker expected")
        while pos < n and blob[pos] == 0xFF:  # fill bytes allowed
            pos += 1
        if pos >= n:
            raise ValueError("truncated JPEG")
        marker = blob[pos]
        pos += 1
        if marker == 0xD9:  # EOI
            raise ValueError("JPEG has no scan (EOI before SOS)")
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:  # TEM/RST: no payload
            continue
        if pos + 2 > n:
            raise ValueError("truncated JPEG segment")
        seglen = int.from_bytes(blob[pos : pos + 2], "big")
        if seglen < 2 or pos + seglen > n:
            raise ValueError("truncated JPEG segment")
        seg = blob[pos + 2 : pos + seglen]
        pos += seglen

        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 15
                i += 1
                if pq not in (0, 1) or tq > 3:
                    raise ValueError("malformed DQT")
                width = 128 if pq else 64
                if i + width > len(seg):
                    raise ValueError("truncated DQT")
                raw = seg[i : i + width]
                q = (
                    np.frombuffer(raw, dtype=">u2").astype(np.int32)
                    if pq
                    else np.frombuffer(raw, dtype=np.uint8).astype(np.int32)
                )
                if (q == 0).any():
                    raise ValueError("zero quantizer in DQT")
                qtables[tq] = q  # zigzag order
                i += width
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 15
                i += 1
                if tc not in (0, 1) or th > 3 or i + 16 > len(seg):
                    raise ValueError("malformed DHT")
                bits = list(seg[i : i + 16])
                i += 16
                nvals = sum(bits)
                if i + nvals > len(seg):
                    raise ValueError("truncated DHT")
                vals = list(seg[i : i + nvals])
                i += nvals
                hufftables[(tc, th)] = _build_lut(bits, vals)
        elif marker in (0xC0, 0xC1):  # SOF0 baseline / SOF1 ext. seq.
            if len(seg) < 6 or len(seg) < 6 + 3 * seg[5]:
                raise ValueError("truncated JPEG SOF")
            if seg[0] != 8:
                raise ValueError(f"unsupported JPEG sample precision {seg[0]}")
            h = int.from_bytes(seg[1:3], "big")
            w = int.from_bytes(seg[3:5], "big")
            _check_pixel_budget(w, h)
            ncomp = seg[5]
            if ncomp not in (1, 3):
                raise ValueError(f"unsupported JPEG component count {ncomp}")
            comps = []
            for c in range(ncomp):
                cid, hv, tq = seg[6 + 3 * c], seg[7 + 3 * c], seg[8 + 3 * c]
                hs, vs = hv >> 4, hv & 15
                if not (1 <= hs <= 4 and 1 <= vs <= 4):
                    raise ValueError("invalid JPEG sampling factors")
                comps.append((cid, hs, vs, tq))
            frame = (h, w, comps)
        elif marker == 0xC2:
            raise NotImplementedError(
                "progressive JPEG (SOF2): built-in codec covers baseline only "
                "— inject a native codec via decoder="
            )
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"unsupported JPEG coding process (SOF{marker - 0xC0})"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = int.from_bytes(seg[:2], "big")
        elif marker == 0xDA:  # SOS — single-scan baseline
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            if len(seg) < 1 or len(seg) < 1 + 2 * seg[0] + 3:
                raise ValueError("truncated JPEG SOS")
            ns = seg[0]
            scan_comps = []
            for c in range(ns):
                cs, tdta = seg[1 + 2 * c], seg[2 + 2 * c]
                scan_comps.append((cs, tdta >> 4, tdta & 15))
            # entropy data runs to the next non-RST non-stuffing marker
            end = pos
            while end < n - 1:
                if blob[end] == 0xFF and blob[end + 1] != 0x00 and not (
                    0xD0 <= blob[end + 1] <= 0xD7
                ):
                    break
                end += 1
            return _decode_scan(
                blob[pos:end],
                frame,
                scan_comps,
                qtables,
                hufftables,
                restart_interval,
            )
        # else: APPn/COM/unknown — skipped

    raise ValueError("truncated JPEG (no SOS)")


def _decode_scan(data, frame, scan_comps, qtables, hufftables, ri) -> np.ndarray:
    import re as _re

    h, w, comps = frame
    if len(scan_comps) != len(comps):
        raise ValueError("JPEG scan/frame component mismatch (multi-scan?)")
    by_id = {cid: (hs, vs, tq) for cid, hs, vs, tq in comps}
    # single-component scans lay out in plain 8x8 blocks (T.81 A.2.2)
    if len(comps) == 1:
        cid = comps[0][0]
        by_id[cid] = (1, 1, by_id[cid][2])
    hmax = max(hs for hs, _, _ in by_id.values())
    vmax = max(vs for _, vs, _ in by_id.values())
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    # restart markers split the stream into independently-padded
    # segments (predictors reset at each) — split BEFORE unstuffing:
    # post-unstuffing FF bytes are data, in-stream FF D0-D7 are markers
    segments = [
        s.replace(b"\xff\x00", b"\xff")
        for s in _re.split(rb"\xff[\xd0-\xd7]", data)
    ]

    per_comp: dict[int, list[np.ndarray]] = {cid: [] for cid in by_id}
    readers = [_BitReader(s) for s in segments]
    seg_i = 0
    br = readers[0]
    pred = {cid: 0 for cid in by_id}
    mcu_in_seg = 0

    for _ in range(mcux * mcuy):
        if ri and mcu_in_seg == ri:
            seg_i += 1
            if seg_i >= len(readers):
                raise ValueError("truncated JPEG (missing restart segment)")
            br = readers[seg_i]
            pred = {cid: 0 for cid in by_id}
            mcu_in_seg = 0
        for cs, td, ta in scan_comps:
            if cs not in by_id:
                raise ValueError("JPEG scan references unknown component")
            hs, vs, tq = by_id[cs]
            if (0, td) not in hufftables or (1, ta) not in hufftables:
                raise ValueError("JPEG scan references undefined Huffman table")
            if tq not in qtables:
                raise ValueError("JPEG scan references undefined quant table")
            dc_lut, ac_lut = hufftables[(0, td)], hufftables[(1, ta)]
            for _b in range(hs * vs):
                coefs = np.zeros(64, dtype=np.int32)
                t = _huff(br, dc_lut)
                if t > 11:
                    raise ValueError("invalid JPEG DC category")
                diff = _extend(br.take(t), t) if t else 0
                pred[cs] += diff
                coefs[0] = pred[cs]
                k = 1
                while k < 64:
                    rs = _huff(br, ac_lut)
                    r, s = rs >> 4, rs & 15
                    if s == 0:
                        if r == 15:
                            k += 16
                            continue
                        break  # EOB
                    k += r
                    if k > 63:
                        raise ValueError("JPEG AC run past block end")
                    coefs[k] = _extend(br.take(s), s)
                    k += 1
                per_comp[cs].append(coefs)
        mcu_in_seg += 1

    # vectorized tail: dequant -> dezigzag -> IDCT -> assemble planes
    planes = {}
    for cid, (hs, vs, tq) in by_id.items():
        arr = np.stack(per_comp[cid])  # (nblocks, 64) zigzag
        arr = arr * qtables[tq][None, :]
        blocks = np.zeros((len(arr), 64), dtype=np.float64)
        blocks[:, ZIGZAG] = arr
        blocks = blocks.reshape(-1, 8, 8)
        spatial = np.einsum("ux,nuv,vy->nxy", _C, blocks, _C, optimize=True)
        spatial = np.clip(np.round(spatial) + 128, 0, 255).astype(np.uint8)
        plane = (
            spatial.reshape(mcuy, mcux, vs, hs, 8, 8)
            .transpose(0, 2, 4, 1, 3, 5)
            .reshape(mcuy * vs * 8, mcux * hs * 8)
        )
        if hs < hmax or vs < vmax:
            plane = np.repeat(np.repeat(plane, vmax // vs, axis=0), hmax // hs, axis=1)
        planes[cid] = plane[:h, :w]

    if len(comps) == 1:
        return planes[comps[0][0]]
    y, cb, cr = (planes[cid].astype(np.float64) for cid, _, _, _ in comps)
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)


# --------------------------------------------------------------------------
# Encoder (test support: authors real baseline streams so the decoder
# can be exercised on every sampling mode, restart intervals included)
# --------------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)  # pad with 1-bits per spec
        return bytes(self.out)


def _fdct_quant(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
    """plane (H, W) uint8, H/W multiples of 8 -> (nblocks, 64) zigzag
    quantized int coefficients, blocks in raster order."""
    hh, ww = plane.shape
    f = plane.astype(np.float64) - 128.0
    f = f.reshape(hh // 8, 8, ww // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    coefs = np.einsum("ux,nxy,vy->nuv", _C, f, _C, optimize=True).reshape(-1, 64)
    return np.round(coefs[:, ZIGZAG] / q[None, :]).astype(np.int32)


def _encode_block(bw, coefs, pred, dc_codes, ac_codes) -> int:
    dc = int(coefs[0])
    diff = dc - pred
    t = abs(diff).bit_length()
    code, ln = dc_codes[t]
    bw.put(code, ln)
    if t:
        bw.put(diff if diff >= 0 else diff + (1 << t) - 1, t)
    last = 63
    while last > 0 and coefs[last] == 0:
        last -= 1
    run = 0
    for k in range(1, last + 1):
        v = int(coefs[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]
            bw.put(code, ln)
            run -= 16
        s = abs(v).bit_length()
        code, ln = ac_codes[(run << 4) | s]
        bw.put(code, ln)
        bw.put(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last < 63:
        code, ln = ac_codes[0x00]
        bw.put(code, ln)
    return dc


def _pad_edge(plane: np.ndarray, mh: int, mw: int) -> np.ndarray:
    hh, ww = plane.shape
    ph = -(-hh // mh) * mh
    pw = -(-ww // mw) * mw
    return np.pad(plane, ((0, ph - hh), (0, pw - ww)), mode="edge")


def encode_jpeg(
    arr: np.ndarray,
    quant: int | np.ndarray = 1,
    subsampling: str = "4:4:4",
    restart_interval: int = 0,
) -> bytes:
    """Baseline JFIF bytes for (h, w) grayscale or (h, w, 3) RGB uint8.

    ``quant`` is a scalar (flat table — 1 gives near-lossless, the
    round-trip-testable setting) or a 64-entry zigzag table applied to
    every component. ``subsampling``: '4:4:4', '4:2:2' or '4:2:0'
    (color only). ``restart_interval`` > 0 emits DRI + RSTn markers."""
    if arr.dtype != np.uint8 or arr.ndim not in (2, 3):
        raise ValueError("encode_jpeg wants (h,w) or (h,w,3) uint8")
    color = arr.ndim == 3
    if color and arr.shape[2] != 3:
        raise ValueError("color images must be (h,w,3)")
    h, w = arr.shape[:2]
    q = (
        np.full(64, int(quant), dtype=np.int32)
        if np.isscalar(quant)
        else np.asarray(quant, dtype=np.int32).reshape(64)
    )
    hs, vs = {"4:4:4": (1, 1), "4:2:2": (2, 1), "4:2:0": (2, 2)}[subsampling]
    if not color:
        hs = vs = 1

    if color:
        rgb = arr.astype(np.float64)
        y = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
        cb = 128.0 - 0.168736 * rgb[..., 0] - 0.331264 * rgb[..., 1] + 0.5 * rgb[..., 2]
        cr = 128.0 + 0.5 * rgb[..., 0] - 0.418688 * rgb[..., 1] - 0.081312 * rgb[..., 2]
        y, cb, cr = (np.clip(np.round(p), 0, 255).astype(np.uint8) for p in (y, cb, cr))
        ypad = _pad_edge(y, 8 * vs, 8 * hs)
        # chroma: box-filter downsample then pad to the chroma grid
        def sub(p):
            pp = _pad_edge(p, vs, hs).astype(np.float64)
            ph, pw = pp.shape
            small = pp.reshape(ph // vs, vs, pw // hs, hs).mean(axis=(1, 3))
            return _pad_edge(np.clip(np.round(small), 0, 255).astype(np.uint8), 8, 8)

        planes = [ypad, sub(cb), sub(cr)]
        samp = [(hs, vs), (1, 1), (1, 1)]
    else:
        planes = [_pad_edge(arr, 8, 8)]
        samp = [(1, 1)]

    dc_lum = _canonical_codes(DC_LUM_BITS, DC_LUM_VALS)
    ac_lum = _canonical_codes(AC_LUM_BITS, AC_LUM_VALS)
    dc_chr = _canonical_codes(DC_CHR_BITS, DC_CHR_VALS)
    ac_chr = _canonical_codes(AC_CHR_BITS, AC_CHR_VALS)

    # per-component quantized blocks in raster order + MCU addressing
    comp_blocks = [_fdct_quant(p, q) for p in planes]
    mcux = planes[0].shape[1] // (8 * samp[0][0])
    mcuy = planes[0].shape[0] // (8 * samp[0][1])

    bw = _BitWriter()
    body = bytearray()
    pred = [0] * len(planes)
    mcu_count = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count == restart_interval:
                body += bw.flush()
                body += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) & 7
                bw = _BitWriter()
                pred = [0] * len(planes)
                mcu_count = 0
            for ci, blocks in enumerate(comp_blocks):
                chs, cvs = samp[ci]
                bw_cols = planes[ci].shape[1] // 8
                dc_codes = dc_lum if ci == 0 else dc_chr
                ac_codes = ac_lum if ci == 0 else ac_chr
                for by in range(cvs):
                    for bx in range(chs):
                        bi = (my * cvs + by) * bw_cols + (mx * chs + bx)
                        pred[ci] = _encode_block(
                            bw, blocks[bi], pred[ci], dc_codes, ac_codes
                        )
            mcu_count += 1
    body += bw.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") + payload

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, bytes([0x00]) + bytes(int(v) & 0xFF for v in q))
    ncomp = len(planes)
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([ncomp])
    for ci in range(ncomp):
        sof += bytes([ci + 1, (samp[ci][0] << 4) | samp[ci][1], 0])
    out += seg(0xC0, sof)

    def dht(tc: int, th: int, bits: list[int], vals: list[int]) -> bytes:
        return seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals))

    out += dht(0, 0, DC_LUM_BITS, DC_LUM_VALS)
    out += dht(1, 0, AC_LUM_BITS, AC_LUM_VALS)
    if ncomp == 3:
        out += dht(0, 1, DC_CHR_BITS, DC_CHR_VALS)
        out += dht(1, 1, AC_CHR_BITS, AC_CHR_VALS)
    if restart_interval:
        out += seg(0xDD, restart_interval.to_bytes(2, "big"))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += body
    out += b"\xff\xd9"  # EOI
    return bytes(out)
