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
  decode: baseline DCT (SOF0), extended sequential (SOF1), AND
  progressive (SOF2 — T.81 Annex G: spectral selection, successive
  approximation with DC/AC refinement scans, EOBn runs), 8-bit,
  Huffman, grayscale or YCbCr with 4:4:4 / 4:2:2 / 4:2:0 sampling,
  restart markers (DRI/RSTn), multiple DQT/DHT segments.
  NotImplementedError for arithmetic coding and hierarchical
  (SOF3/5-7/9-15); ValueError for malformed/truncated streams —
  never a hang, never an unbounded allocation (the entropy decode is
  bounded by the declared MCU count, and declared dimensions go
  through the same pixel budget as every other decoder).

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
    progressive = False
    coef_state: dict[int, np.ndarray] = {}  # cid -> (BH, BW, 64) zigzag coefs
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
            if progressive and coef_state:
                return _reconstruct_progressive(coef_state, frame, qtables)
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
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 sequential, SOF2 progressive
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
            progressive = marker == 0xC2
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"unsupported JPEG coding process (SOF{marker - 0xC0})"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = int.from_bytes(seg[:2], "big")
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            if len(seg) < 1 or len(seg) < 1 + 2 * seg[0] + 3:
                raise ValueError("truncated JPEG SOS")
            ns = seg[0]
            scan_comps = []
            for c in range(ns):
                cs, tdta = seg[1 + 2 * c], seg[2 + 2 * c]
                scan_comps.append((cs, tdta >> 4, tdta & 15))
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ahal = seg[3 + 2 * ns]
            ah, al = ahal >> 4, ahal & 15
            # entropy data runs to the next non-RST non-stuffing marker
            end = pos
            while end < n - 1:
                if blob[end] == 0xFF and blob[end + 1] != 0x00 and not (
                    0xD0 <= blob[end + 1] <= 0xD7
                ):
                    break
                end += 1
            if not progressive:
                return _decode_scan(
                    blob[pos:end],
                    frame,
                    scan_comps,
                    qtables,
                    hufftables,
                    restart_interval,
                )
            _progressive_scan(
                blob[pos:end],
                frame,
                scan_comps,
                (ss, se, ah, al),
                hufftables,
                restart_interval,
                coef_state,
            )
            pos = end
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
# Progressive (SOF2) decoding — ITU T.81 Annex G. Scans refine a
# per-component coefficient buffer; reconstruction happens at EOI.
# --------------------------------------------------------------------------


def _frame_geometry(frame):
    """(hmax, vmax, mcux, mcuy, per-comp dict cid -> (hs, vs, tq,
    padded BH, padded BW, effective bh, effective bw)). Padded dims
    cover the interleaved-MCU grid; effective dims are the
    non-interleaved data-unit counts (T.81 A.2.2: ceil(comp
    samples / 8), NO MCU padding)."""
    h, w, comps = frame
    hmax = max(hs for _, hs, _, _ in comps)
    vmax = max(vs for _, _, vs, _ in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    geo = {}
    for cid, hs, vs, tq in comps:
        cw = -(-w * hs // hmax)
        ch = -(-h * vs // vmax)
        geo[cid] = (hs, vs, tq, mcuy * vs, mcux * hs, -(-ch // 8), -(-cw // 8))
    return hmax, vmax, mcux, mcuy, geo


def _split_segments(data: bytes) -> list[bytes]:
    import re as _re

    return [
        s.replace(b"\xff\x00", b"\xff")
        for s in _re.split(rb"\xff[\xd0-\xd7]", data)
    ]


def _refine_ac_block(br, block, k, se, p1):
    """Correction-bit refinement of the nonzero coefficients in
    [k, se] (T.81 G.2.2 / the jdphuff EOB-run tail)."""
    while k <= se:
        c = int(block[k])
        if c != 0 and br.take(1) and (c & p1) == 0:
            block[k] = c + (p1 if c >= 0 else -p1)
        k += 1


def _progressive_scan(data, frame, scan_comps, band, hufftables, ri, state):
    ss, se, ah, al = band
    h, w, comps = frame
    hmax, vmax, mcux, mcuy, geo = _frame_geometry(frame)
    for cid, *_ in comps:
        if cid not in state:
            _, _, _, bh, bw, _, _ = geo[cid]
            state[cid] = np.zeros((bh, bw, 64), dtype=np.int32)
    for cs, td, ta in scan_comps:
        if cs not in geo:
            raise ValueError("JPEG scan references unknown component")
    if not (0 <= ss <= se <= 63) or ah > 13 or al > 13:
        raise ValueError("invalid JPEG progressive scan band")
    if ss == 0 and se != 0:
        raise ValueError("JPEG progressive scan mixes DC and AC")
    if ss > 0 and len(scan_comps) != 1:
        raise ValueError("JPEG progressive AC scan must be single-component")

    readers = [_BitReader(s) for s in _split_segments(data)]
    seg_i = 0
    br = readers[0]
    eobrun = 0
    pred = {cs: 0 for cs, _, _ in scan_comps}
    units_done = 0

    def next_segment():
        nonlocal seg_i, br, eobrun, pred, units_done
        seg_i += 1
        if seg_i >= len(readers):
            raise ValueError("truncated JPEG (missing restart segment)")
        br = readers[seg_i]
        eobrun = 0
        pred = {cs: 0 for cs, _, _ in scan_comps}
        units_done = 0

    if ss == 0:  # DC scan (interleaved or single-component)
        interleaved = len(scan_comps) > 1
        if interleaved:
            n_units = mcux * mcuy
        else:
            _, _, _, _, _, ebh, ebw = geo[scan_comps[0][0]]
            n_units = ebh * ebw
        for u in range(n_units):
            if ri and units_done == ri:
                next_segment()
            for cs, td, ta in scan_comps:
                hs, vs, _, _, bw_pad, _, ebw = geo[cs]
                grid = state[cs]
                if interleaved:
                    my, mx = divmod(u, mcux)
                    blocks = [
                        (my * vs + by, mx * hs + bx)
                        for by in range(vs)
                        for bx in range(hs)
                    ]
                else:
                    blocks = [divmod(u, ebw)]
                for by, bx in blocks:
                    if ah == 0:  # DC initial
                        if (0, td) not in hufftables:
                            raise ValueError("undefined JPEG DC table")
                        t = _huff(br, hufftables[(0, td)])
                        if t > 11:
                            raise ValueError("invalid JPEG DC category")
                        diff = _extend(br.take(t), t) if t else 0
                        pred[cs] += diff
                        grid[by, bx, 0] = pred[cs] << al
                    else:  # DC refinement: one bit per block
                        if br.take(1):
                            grid[by, bx, 0] = int(grid[by, bx, 0]) | (1 << al)
            units_done += 1
        return

    # AC scan: single component, non-interleaved block order
    cs, td, ta = scan_comps[0]
    if (1, ta) not in hufftables:
        raise ValueError("undefined JPEG AC table")
    ac_lut = hufftables[(1, ta)]
    _, _, _, _, _, ebh, ebw = geo[cs]
    grid = state[cs]
    p1 = 1 << al
    for u in range(ebh * ebw):
        if ri and units_done == ri:
            next_segment()
        units_done += 1
        by, bx = divmod(u, ebw)
        block = grid[by, bx]
        if ah == 0:  # AC initial (G.2.1)
            if eobrun > 0:
                eobrun -= 1
                continue
            k = ss
            while k <= se:
                rs = _huff(br, ac_lut)
                r, s = rs >> 4, rs & 15
                if s == 0:
                    if r == 15:
                        k += 16
                        continue
                    eobrun = (1 << r) - 1
                    if r:
                        eobrun += br.take(r)
                    break
                k += r
                if k > se:
                    raise ValueError("JPEG AC run past band end")
                block[k] = _extend(br.take(s), s) << al
                k += 1
        else:  # AC refinement (G.2.2, the jdphuff algorithm)
            k = ss
            if eobrun == 0:
                while k <= se:
                    rs = _huff(br, ac_lut)
                    r, s = rs >> 4, rs & 15
                    if s == 0:
                        if r != 15:
                            eobrun = 1 << r
                            if r:
                                eobrun += br.take(r)
                            break
                        val = 0  # ZRL: 16 zero-history positions
                    elif s == 1:
                        val = p1 if br.take(1) else -p1
                    else:
                        raise ValueError(
                            "JPEG AC refinement magnitude must be 1"
                        )
                    while k <= se:
                        c = int(block[k])
                        if c != 0:
                            if br.take(1) and (c & p1) == 0:
                                block[k] = c + (p1 if c >= 0 else -p1)
                        else:
                            if r == 0:
                                break
                            r -= 1
                        k += 1
                    if val and k <= se:
                        block[k] = val
                    k += 1
            if eobrun > 0:
                _refine_ac_block(br, block, k, se, p1)
                eobrun -= 1


def _reconstruct_progressive(state, frame, qtables) -> np.ndarray:
    h, w, comps = frame
    hmax, vmax, _, _, geo = _frame_geometry(frame)
    planes = {}
    for cid, hs, vs, tq in comps:
        if tq not in qtables:
            raise ValueError("JPEG frame references undefined quant table")
        grid = state[cid]
        bh, bw = grid.shape[:2]
        arr = grid.reshape(-1, 64) * qtables[tq][None, :]
        blocks = np.zeros((len(arr), 64), dtype=np.float64)
        blocks[:, ZIGZAG] = arr
        blocks = blocks.reshape(-1, 8, 8)
        spatial = np.einsum("ux,nuv,vy->nxy", _C, blocks, _C, optimize=True)
        spatial = np.clip(np.round(spatial) + 128, 0, 255).astype(np.uint8)
        plane = (
            spatial.reshape(bh, bw, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(bh * 8, bw * 8)
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


def _prepare_components(arr, quant, subsampling):
    """Shared encoder front half: color transform, chroma
    downsampling, edge padding, FDCT+quantize. Returns
    (h, w, q, planes, samp, comp_blocks)."""
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
    comp_blocks = [_fdct_quant(p, q) for p in planes]
    return h, w, q, planes, samp, comp_blocks


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
    h, w, q, planes, samp, comp_blocks = _prepare_components(arr, quant, subsampling)

    dc_lum = _canonical_codes(DC_LUM_BITS, DC_LUM_VALS)
    ac_lum = _canonical_codes(AC_LUM_BITS, AC_LUM_VALS)
    dc_chr = _canonical_codes(DC_CHR_BITS, DC_CHR_VALS)
    ac_chr = _canonical_codes(AC_CHR_BITS, AC_CHR_VALS)

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


def encode_jpeg_progressive(
    arr: np.ndarray,
    quant: int | np.ndarray = 1,
    subsampling: str = "4:4:4",
    al: int = 1,
    bands: tuple = ((1, 5), (6, 63)),
) -> bytes:
    """Progressive (SOF2) JFIF bytes — test support exercising every
    scan type the decoder implements (T.81 Annex G): an interleaved
    DC-initial scan at successive-approximation Al=``al``, DC
    refinement scans down to 0, then per component and spectral band
    an AC-initial scan at Al=``al`` followed by AC refinement scans
    down to 0. EOB runs are flushed at length 1 (plain EOB) so the
    Annex K tables suffice — the decoder handles general EOBn runs.

    Point transforms per spec: DC uses arithmetic shift (floor), AC
    shifts magnitude toward zero; refinement reconstruction is
    bit-exact, so decode(progressive) == decode(baseline) for the
    same quantized coefficients."""
    h, w, q, planes, samp, comp_blocks = _prepare_components(arr, quant, subsampling)
    ncomp = len(planes)
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = planes[0].shape[1] // (8 * samp[0][0])
    mcuy = planes[0].shape[0] // (8 * samp[0][1])

    dc_codes = [
        _canonical_codes(DC_LUM_BITS, DC_LUM_VALS)
        if ci == 0
        else _canonical_codes(DC_CHR_BITS, DC_CHR_VALS)
        for ci in range(ncomp)
    ]
    ac_codes = [
        _canonical_codes(AC_LUM_BITS, AC_LUM_VALS)
        if ci == 0
        else _canonical_codes(AC_CHR_BITS, AC_CHR_VALS)
        for ci in range(ncomp)
    ]

    def pt_ac(v: int, a: int) -> int:
        return v >> a if v >= 0 else -((-v) >> a)

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") + payload

    def sos(scan_comps: list[tuple[int, int, int]], ss, se, ah, a) -> bytes:
        body = bytes([len(scan_comps)])
        for cs, td, ta in scan_comps:
            body += bytes([cs, (td << 4) | ta])
        return seg(0xDA, body + bytes([ss, se, (ah << 4) | a]))

    def mcu_blocks(ci):
        """(block_index, ) per MCU-interleaved order for component ci."""
        chs, cvs = samp[ci]
        cols = planes[ci].shape[1] // 8
        for my in range(mcuy):
            for mx in range(mcux):
                for by in range(cvs):
                    for bx in range(chs):
                        yield ci, (my * cvs + by) * cols + (mx * chs + bx)

    def interleaved_order():
        chs_cols = [(samp[ci], planes[ci].shape[1] // 8) for ci in range(ncomp)]
        for my in range(mcuy):
            for mx in range(mcux):
                for ci, ((chs, cvs), cols) in enumerate(chs_cols):
                    for by in range(cvs):
                        for bx in range(chs):
                            yield ci, (my * cvs + by) * cols + (mx * chs + bx)

    def effective_blocks(ci):
        """Raster order over the NON-interleaved data-unit grid
        (ceil of component sample dims / 8 — no MCU padding)."""
        chs, cvs = samp[ci]
        cols = planes[ci].shape[1] // 8
        cw = -(-w * chs // hmax)
        ch = -(-h * cvs // vmax)
        for by in range(-(-ch // 8)):
            for bx in range(-(-cw // 8)):
                yield by * cols + bx

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, bytes([0x00]) + bytes(int(v) & 0xFF for v in q))
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([ncomp])
    for ci in range(ncomp):
        sof += bytes([ci + 1, (samp[ci][0] << 4) | samp[ci][1], 0])
    out += seg(0xC2, sof)

    def dht(tc, th, bits, vals):
        return seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals))

    out += dht(0, 0, DC_LUM_BITS, DC_LUM_VALS)
    out += dht(1, 0, AC_LUM_BITS, AC_LUM_VALS)
    if ncomp == 3:
        out += dht(0, 1, DC_CHR_BITS, DC_CHR_VALS)
        out += dht(1, 1, AC_CHR_BITS, AC_CHR_VALS)

    # --- scan 1: DC initial, interleaved, Ah=0, Al=al ---
    bw_ = _BitWriter()
    pred = [0] * ncomp
    for ci, bi in interleaved_order():
        dc = int(comp_blocks[ci][bi][0]) >> al  # arithmetic shift (G.1.2.1)
        diff = dc - pred[ci]
        pred[ci] = dc
        t = abs(diff).bit_length()
        code, ln = dc_codes[ci][t]
        bw_.put(code, ln)
        if t:
            bw_.put(diff if diff >= 0 else diff + (1 << t) - 1, t)
    out += sos([(ci + 1, 0 if ci == 0 else 1, 0) for ci in range(ncomp)], 0, 0, 0, al)
    out += bw_.flush()

    # --- DC refinement scans: Ah=a+1 -> Al=a, one bit per block ---
    for a in range(al - 1, -1, -1):
        bw_ = _BitWriter()
        for ci, bi in interleaved_order():
            bw_.put((int(comp_blocks[ci][bi][0]) >> a) & 1, 1)
        out += sos([(ci + 1, 0, 0) for ci in range(ncomp)], 0, 0, a + 1, a)
        out += bw_.flush()

    # --- AC scans: per component, per band; initial then refinements ---
    for ci in range(ncomp):
        ta = 0 if ci == 0 else 1
        codes = ac_codes[ci]
        for ss, se in bands:
            # initial at Al=al
            bw_ = _BitWriter()
            for bi in effective_blocks(ci):
                block = comp_blocks[ci][bi]
                vals = [pt_ac(int(block[k]), al) for k in range(ss, se + 1)]
                if not any(vals):
                    code, ln = codes[0x00]  # EOB run of 1
                    bw_.put(code, ln)
                    continue
                r = 0
                for v in vals:
                    if v == 0:
                        r += 1
                        continue
                    while r > 15:
                        code, ln = codes[0xF0]
                        bw_.put(code, ln)
                        r -= 16
                    s = abs(v).bit_length()
                    code, ln = codes[(r << 4) | s]
                    bw_.put(code, ln)
                    bw_.put(v if v >= 0 else v + (1 << s) - 1, s)
                    r = 0
                if r > 0:
                    code, ln = codes[0x00]
                    bw_.put(code, ln)
            out += sos([(ci + 1, 0, ta)], ss, se, 0, al)
            out += bw_.flush()

            # refinements: Ah=a+1 -> Al=a (jcphuff encode_mcu_AC_refine,
            # EOB runs flushed at 1)
            for a in range(al - 1, -1, -1):
                bw_ = _BitWriter()
                for bi in effective_blocks(ci):
                    block = comp_blocks[ci][bi]
                    vals = [pt_ac(int(block[k]), a) for k in range(ss, se + 1)]
                    absv = [abs(v) for v in vals]
                    eobpos = max(
                        (i for i, t in enumerate(absv) if t == 1), default=-1
                    )
                    r = 0
                    br: list[int] = []
                    for i, t in enumerate(absv):
                        if t == 0:
                            r += 1
                            continue
                        while r > 15 and i <= eobpos:
                            code, ln = codes[0xF0]
                            bw_.put(code, ln)
                            r -= 16
                            for bit in br:
                                bw_.put(bit, 1)
                            br = []
                        if t > 1:  # history: correction bit
                            br.append(t & 1)
                            continue
                        # newly nonzero (magnitude exactly 1 here)
                        code, ln = codes[(r << 4) | 1]
                        bw_.put(code, ln)
                        bw_.put(1 if vals[i] > 0 else 0, 1)
                        for bit in br:
                            bw_.put(bit, 1)
                        br = []
                        r = 0
                    if r > 0 or br:
                        code, ln = codes[0x00]  # EOB run of 1
                        bw_.put(code, ln)
                        for bit in br:
                            bw_.put(bit, 1)
                out += sos([(ci + 1, 0, ta)], ss, se, a + 1, a)
                out += bw_.flush()

    out += b"\xff\xd9"
    return bytes(out)
