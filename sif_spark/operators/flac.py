"""FLAC lossless audio: from-scratch decoder + test encoder
(stdlib + NumPy only).

Extends the built-in audio surface past PCM WAV (multimodal.py) with
the dominant lossless interchange format. Everything is public-spec
arithmetic (RFC 9639 / xiph.org format spec): rice-coded residuals,
fixed and LPC predictors, stereo decorrelation, CRC-8/CRC-16 framing —
no tabulated psychoacoustics anywhere, which is what makes FLAC (unlike
MP3's payload) implementable exactly, and exactly testable: decode is
bit-for-bit, so round-trips and digest oracles are equality checks.
Reference ambition: opaque custom column types over arbitrary bytes
(column_type.go:16-23).

Scale notes: FLAC entropy decode is a per-sample bit walk — serial
Python by data dependency, like PNG Paeth and GIF LZW (measured
boundary in SCALE.md): fine for validation and modest corpora; bulk
decode of an audio corpus should inject a native codec through the
same `decoder=` plumbing. Header fields are attacker-controlled:
bounds-checked reads, sample-count budget, typed errors, CRC checks.
"""

from __future__ import annotations

import numpy as np

#: Largest PCM expansion the built-in decoder will materialize
#: (samples × channels). 2^26 ≈ 67M samples ≈ 256 MB as int32 — the
#: audio analog of multimodal.MAX_DECODE_PIXELS.
MAX_DECODE_SAMPLES = 1 << 26


def _crc8(data: bytes) -> int:
    """CRC-8, polynomial x^8 + x^2 + x + 1 (0x07), init 0."""
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    """CRC-16, polynomial x^16 + x^15 + x^2 + 1 (0x8005), init 0."""
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = (
                ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
            )
    return crc


class _BitReader:
    """MSB-first bit reader over bytes, tracking byte position so frame
    CRCs can be computed over exactly the consumed span."""

    __slots__ = ("data", "pos", "bit")

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos
        self.bit = 0

    def read(self, n: int) -> int:
        v = 0
        while n:
            if self.pos >= len(self.data):
                raise ValueError("truncated FLAC bitstream")
            avail = 8 - self.bit
            take = min(n, avail)
            byte = self.data[self.pos]
            v = (v << take) | ((byte >> (avail - take)) & ((1 << take) - 1))
            self.bit += take
            if self.bit == 8:
                self.bit = 0
                self.pos += 1
            n -= take
        return v

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >> (n - 1) else v

    def read_unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
            if q > 1 << 20:
                raise ValueError("FLAC unary run exceeds sanity bound")
        return q

    def align(self) -> None:
        if self.bit:
            self.bit = 0
            self.pos += 1


_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}

_BLOCKSIZE_CODES = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608}
_SAMPLE_SIZE_CODES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}
_RATE_CODES = {
    1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
    7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000,
}


def parse_flac_header(blob: bytes) -> tuple[dict, int]:
    """STREAMINFO + the offset of the first audio frame. Raises the
    typed decode contract on anything malformed."""
    if blob[:4] != b"fLaC":
        raise ValueError(f"not a FLAC blob (magic {blob[:4]!r})")
    pos = 4
    info: dict | None = None
    while True:
        if pos + 4 > len(blob):
            raise ValueError("truncated FLAC metadata block header")
        hdr = blob[pos]
        btype = hdr & 0x7F
        size = int.from_bytes(blob[pos + 1 : pos + 4], "big")
        body = pos + 4
        if body + size > len(blob):
            raise ValueError("FLAC metadata block runs past the buffer")
        if btype == 0:  # STREAMINFO
            if size < 34:
                raise ValueError("STREAMINFO shorter than 34 bytes")
            br = _BitReader(blob, body)
            br.read(16)  # min blocksize
            br.read(16)  # max blocksize
            br.read(24)  # min framesize
            br.read(24)  # max framesize
            rate = br.read(20)
            channels = br.read(3) + 1
            bps = br.read(5) + 1
            total = br.read(36)
            if rate == 0:
                raise ValueError("STREAMINFO sample rate is 0")
            info = {
                "sample_rate": rate,
                "channels": channels,
                "bits_per_sample": bps,
                "total_samples": total,
            }
        pos = body + size
        if hdr & 0x80:  # last-metadata-block flag
            break
    if info is None:
        raise ValueError("FLAC stream has no STREAMINFO block")
    return info, pos


def _read_utf8_coded(br: _BitReader) -> int:
    """FLAC's UTF-8-style frame/sample number coding (up to 7 bytes)."""
    b0 = br.read(8)
    if b0 < 0x80:
        return b0
    n = 0
    while b0 & (0x80 >> n):
        n += 1
    if n < 2 or n > 7:
        raise ValueError("invalid FLAC coded number prefix")
    v = b0 & (0x7F >> n)
    for _ in range(n - 1):
        c = br.read(8)
        if c & 0xC0 != 0x80:
            raise ValueError("invalid FLAC coded number continuation")
        v = (v << 6) | (c & 0x3F)
    return v


def _read_residual(br: _BitReader, blocksize: int, order: int) -> list[int]:
    method = br.read(2)
    if method > 1:
        raise ValueError(f"reserved FLAC residual coding method {method}")
    kbits = 4 if method == 0 else 5
    escape = (1 << kbits) - 1
    po = br.read(4)
    out: list[int] = []
    npart = 1 << po
    if blocksize % npart:
        raise ValueError("FLAC partition order does not divide block size")
    for p in range(npart):
        n = (blocksize >> po) - (order if p == 0 else 0)
        if n < 0:
            raise ValueError("FLAC predictor order exceeds first partition")
        k = br.read(kbits)
        if k == escape:
            raw = br.read(5)
            for _ in range(n):
                out.append(br.read_signed(raw) if raw else 0)
        else:
            for _ in range(n):
                q = br.read_unary()
                v = (q << k) | br.read(k)
                out.append((v >> 1) ^ -(v & 1))  # zigzag
    return out


def _decode_subframe(br: _BitReader, blocksize: int, bps: int) -> list[int]:
    if br.read(1):
        raise ValueError("FLAC subframe padding bit set")
    stype = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = 1 + br.read_unary()
        bps -= wasted
    if bps <= 0:
        raise ValueError("FLAC wasted bits consume the whole sample")
    if stype == 0:  # CONSTANT
        s = [br.read_signed(bps)] * blocksize
    elif stype == 1:  # VERBATIM
        s = [br.read_signed(bps) for _ in range(blocksize)]
    elif 8 <= stype <= 12:  # FIXED, order 0-4
        order = stype - 8
        s = [br.read_signed(bps) for _ in range(order)]
        res = _read_residual(br, blocksize, order)
        coefs = _FIXED_COEFS[order]
        for r in res:
            pred = sum(c * s[-1 - j] for j, c in enumerate(coefs))
            s.append(pred + r)
    elif stype >= 32:  # LPC, order 1-32
        order = (stype & 31) + 1
        s = [br.read_signed(bps) for _ in range(order)]
        prec = br.read(4)
        if prec == 15:
            raise ValueError("invalid FLAC LPC precision code")
        prec += 1
        shift = br.read_signed(5)
        if shift < 0:
            raise ValueError("negative FLAC LPC shift")
        coefs = [br.read_signed(prec) for _ in range(order)]
        res = _read_residual(br, blocksize, order)
        for r in res:
            pred = sum(c * s[-1 - j] for j, c in enumerate(coefs)) >> shift
            s.append(pred + r)
    else:
        raise ValueError(f"reserved FLAC subframe type {stype}")
    if wasted:
        s = [v << wasted for v in s]
    return s


def decode_flac_pcm(blob: bytes) -> tuple[np.ndarray, dict]:
    """Full decode → ((n_samples, channels) int32 exact PCM, STREAMINFO
    dict). Frame header CRC-8 and whole-frame CRC-16 are verified —
    corruption is a typed decode error, never wrong samples."""
    info, pos = parse_flac_header(blob)
    channels = info["channels"]
    total = info["total_samples"]
    if total * channels > MAX_DECODE_SAMPLES:
        raise ValueError(
            f"declared FLAC size {total}x{channels} exceeds "
            f"MAX_DECODE_SAMPLES ({MAX_DECODE_SAMPLES})"
        )
    chans: list[list[int]] = [[] for _ in range(channels)]
    while pos < len(blob) and (total == 0 or len(chans[0]) < total):
        frame_start = pos
        br = _BitReader(blob, pos)
        sync = br.read(14)
        if sync != 0x3FFE:
            raise ValueError(f"bad FLAC frame sync 0x{sync:04x}")
        if br.read(1):
            raise ValueError("FLAC frame reserved bit set")
        br.read(1)  # blocking strategy
        bs_code = br.read(4)
        rate_code = br.read(4)
        chan_code = br.read(4)
        size_code = br.read(3)
        if br.read(1):
            raise ValueError("FLAC frame header reserved bit set")
        _read_utf8_coded(br)
        if bs_code == 0:
            raise ValueError("reserved FLAC block size code 0")
        elif bs_code in _BLOCKSIZE_CODES:
            blocksize = _BLOCKSIZE_CODES[bs_code]
        elif bs_code == 6:
            blocksize = br.read(8) + 1
        elif bs_code == 7:
            blocksize = br.read(16) + 1
        else:
            blocksize = 256 << (bs_code - 8)
        if rate_code == 12:
            br.read(8)
        elif rate_code in (13, 14):
            br.read(16)
        elif rate_code == 15:
            raise ValueError("invalid FLAC sample rate code 15")
        if size_code in (0, 3):
            bps = info["bits_per_sample"] if size_code == 0 else None
            if bps is None:
                raise ValueError("reserved FLAC sample size code 3")
        else:
            bps = _SAMPLE_SIZE_CODES[size_code]
        br.align()
        if br.pos >= len(blob):
            raise ValueError("truncated FLAC frame header")
        if _crc8(blob[frame_start : br.pos]) != blob[br.pos]:
            raise ValueError("FLAC frame header CRC-8 mismatch")
        br.pos += 1

        if chan_code <= 7:
            nch = chan_code + 1
            if nch != channels:
                raise ValueError("FLAC frame channel count != STREAMINFO")
            subs = [_decode_subframe(br, blocksize, bps) for _ in range(nch)]
        elif chan_code in (8, 9, 10):
            if channels != 2:
                raise ValueError("FLAC side-coded frame in non-stereo stream")
            # the difference channel carries one extra bit
            if chan_code == 8:  # left/side
                left = _decode_subframe(br, blocksize, bps)
                side = _decode_subframe(br, blocksize, bps + 1)
                subs = [left, [l - s for l, s in zip(left, side)]]
            elif chan_code == 9:  # right/side
                side = _decode_subframe(br, blocksize, bps + 1)
                right = _decode_subframe(br, blocksize, bps)
                subs = [[r + s for r, s in zip(right, side)], right]
            else:  # mid/side
                mid = _decode_subframe(br, blocksize, bps)
                side = _decode_subframe(br, blocksize, bps + 1)
                subs = [[], []]
                for m, s in zip(mid, side):
                    m = (m << 1) | (s & 1)
                    subs[0].append((m + s) >> 1)
                    subs[1].append((m - s) >> 1)
        else:
            raise ValueError(f"reserved FLAC channel assignment {chan_code}")
        br.align()
        if br.pos + 2 > len(blob):
            raise ValueError("truncated FLAC frame footer")
        if _crc16(blob[frame_start : br.pos]) != int.from_bytes(
            blob[br.pos : br.pos + 2], "big"
        ):
            raise ValueError("FLAC frame CRC-16 mismatch")
        pos = br.pos + 2
        if (len(chans[0]) + blocksize) * channels > MAX_DECODE_SAMPLES:
            raise ValueError("FLAC frames exceed MAX_DECODE_SAMPLES")
        for c in range(channels):
            chans[c].extend(subs[c])
    if total and len(chans[0]) > total:
        chans = [c[:total] for c in chans]
    if total and len(chans[0]) < total:
        raise ValueError(
            f"FLAC stream ended at {len(chans[0])} of {total} declared samples"
        )
    return np.array(chans, dtype=np.int64).T.astype(np.int32), info


def decode_flac(blob: bytes) -> np.ndarray:
    """`media_decoder` contract (same shape as decode_wav): (n, ch)
    float32 in [-1, 1), normalized by 2^(bps-1)."""
    pcm, info = decode_flac_pcm(blob)
    return (pcm.astype(np.float32) / float(1 << (info["bits_per_sample"] - 1))).astype(
        np.float32
    )


# ---------------------------------------------------------------------------
# Test encoder. Subframe strategy per channel: CONSTANT when the block
# is constant, else FIXED order 0-2 (whichever minimizes |residual|)
# with single-partition rice; optional left/side and mid/side stereo.
# The decoder's correctness against OTHER encoders is pinned by
# hand-assembled spec bytes in the tests, not by this encoder.
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, v: int, n: int) -> None:
        self.acc = (self.acc << n) | (v & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def bytes(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.buf)


def _best_rice_k(res: list[int]) -> int:
    if not res:
        return 0
    mean = sum(abs(r) for r in res) / len(res) + 1
    k = max(0, int(mean).bit_length() - 1)
    return min(k, 14)


def _write_residual(bw: _BitWriter, res: list[int]) -> None:
    bw.write(0, 2)  # 4-bit rice
    bw.write(0, 4)  # partition order 0
    k = _best_rice_k(res)
    bw.write(k, 4)
    for r in res:
        v = (abs(r) << 1) - (1 if r < 0 else 0)  # zigzag
        q = v >> k
        if q:
            bw.write(0, q)
        bw.write(1, 1)
        bw.write(v & ((1 << k) - 1), k)


def _write_subframe(bw: _BitWriter, s: list[int], bps: int) -> None:
    bw.write(0, 1)  # padding
    if all(v == s[0] for v in s):
        bw.write(0, 6)  # CONSTANT
        bw.write(0, 1)  # no wasted bits
        bw.write(s[0], bps)
        return
    best_order, best_res, best_cost = None, None, None
    for order, coefs in list(_FIXED_COEFS.items())[:3]:
        if len(s) <= order:
            continue
        res = [
            s[i] - sum(c * s[i - 1 - j] for j, c in enumerate(coefs))
            for i in range(order, len(s))
        ]
        cost = sum(abs(r) for r in res)
        if best_cost is None or cost < best_cost:
            best_order, best_res, best_cost = order, res, cost
    bw.write(8 + best_order, 6)  # FIXED
    bw.write(0, 1)  # no wasted bits
    for v in s[:best_order]:
        bw.write(v, bps)
    _write_residual(bw, best_res)


def encode_flac(
    pcm: np.ndarray,
    sample_rate: int = 44100,
    bits_per_sample: int = 16,
    block_size: int = 4096,
    stereo_mode: str = "independent",
) -> bytes:
    """(n,) or (n, ch) integer PCM → a complete FLAC stream (fLaC +
    STREAMINFO + frames). ``stereo_mode``: 'independent', 'left_side'
    or 'mid_side' (2-channel input only) — exercises the decoder's
    decorrelation paths. Lossless by construction: decode_flac_pcm
    round-trips bit-for-bit."""
    a = np.asarray(pcm)
    if a.ndim == 1:
        a = a[:, None]
    if a.ndim != 2 or a.shape[0] == 0:
        raise ValueError("pcm must be (n,) or (n, ch) with n > 0")
    n, channels = a.shape
    lo, hi = -(1 << (bits_per_sample - 1)), (1 << (bits_per_sample - 1)) - 1
    if a.min() < lo or a.max() > hi:
        raise ValueError(f"samples exceed {bits_per_sample}-bit range")
    if stereo_mode != "independent" and channels != 2:
        raise ValueError("side/mid stereo modes need exactly 2 channels")

    out = bytearray(b"fLaC")
    si = _BitWriter()
    si.write(min(block_size, n), 16)
    si.write(block_size, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(sample_rate, 20)
    si.write(channels - 1, 3)
    si.write(bits_per_sample - 1, 5)
    si.write(n, 36)
    body = si.bytes() + bytes(16)  # zero MD5 (unset per spec)
    out += bytes([0x80]) + len(body).to_bytes(3, "big") + body  # last block

    for fi, start in enumerate(range(0, n, block_size)):
        block = a[start : start + block_size]
        bs = block.shape[0]
        bw = _BitWriter()
        bw.write(0x3FFE, 14)
        bw.write(0, 1)
        bw.write(0, 1)  # fixed blocksize strategy
        bw.write(7, 4)  # blocksize as 16-bit field
        bw.write(0, 4)  # sample rate from STREAMINFO
        if stereo_mode == "left_side":
            bw.write(8, 4)
        elif stereo_mode == "mid_side":
            bw.write(10, 4)
        else:
            bw.write(channels - 1, 4)
        bw.write(0, 3)  # sample size from STREAMINFO
        bw.write(0, 1)
        if fi < 0x80:
            bw.write(fi, 8)
        else:
            bw.write(0xC0 | (fi >> 6), 8)
            bw.write(0x80 | (fi & 0x3F), 8)
        bw.write(bs - 1, 16)
        bw.align()
        hdr = bw.bytes()
        hdr += bytes([_crc8(hdr)])

        bw = _BitWriter()
        cols = [block[:, c].astype(int).tolist() for c in range(channels)]
        if stereo_mode == "left_side":
            l, r = cols
            _write_subframe(bw, l, bits_per_sample)
            _write_subframe(bw, [x - y for x, y in zip(l, r)], bits_per_sample + 1)
        elif stereo_mode == "mid_side":
            l, r = cols
            _write_subframe(
                bw, [(x + y) >> 1 for x, y in zip(l, r)], bits_per_sample
            )
            _write_subframe(bw, [x - y for x, y in zip(l, r)], bits_per_sample + 1)
        else:
            for col in cols:
                _write_subframe(bw, col, bits_per_sample)
        bw.align()
        frame = hdr + bw.bytes()
        out += frame + _crc16(frame).to_bytes(2, "big")
    return bytes(out)
