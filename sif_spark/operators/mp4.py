"""ISO-BMFF / MP4 sample extraction: full sample-table resolution
(stsd/stsz/stsc/stco/co64), MJPEG video frame decode, and PCM audio
track decode, plus test muxers that author real multi-chunk tables.

This closes the "video container" half of the mp4 injected-codec gate
the same way operators/video.py closed it for AVI: the CONTAINER is
pure public-spec arithmetic (ISO/IEC 14496-12 box walk — already
implemented for the header probe in operators/probe.py), and the two
payload codecs every capture/test pipeline actually stores in .mov/
.mp4 without a modern encoder — Motion-JPEG ('jpeg'/'mjpa' sample
entries, each sample a baseline JPEG stream decoded by operators/
jpeg.py) and raw PCM audio ('sowt' little-endian int16, 'twos'
big-endian int16, 'raw ' offset-binary uint8) — compose codecs this
repo already ships. Modern codecs (avc1/hev1/vp09/av01, mp4a/AAC)
stay behind the injected-decoder gate with a typed error naming the
sample-entry fourcc.

Extends the reference's opaque-binary CustomColumnType ambition
(column_type.go:16-23, docs/custom-columntypes.md:1-20) — the engine
carries the bytes; these decoders are the typed views over them.

Scale notes: sample tables are resolved from the moov box only
(O(sample-count) integers, capped), then each sample is a cheap
bounds-checked slice — one forward pass per blob inside an Arrow
batch, frames never leave their executor. Every count and offset is
attacker-controlled: entry counts are validated against the physical
box size before allocation, total samples are capped
(MAX_MP4_SAMPLES), every sample span is bounds-checked against the
buffer, and frame allocations pass the shared MAX_DECODE_PIXELS
budget (the round-7/8 decompression-bomb contract).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np

from sif_spark.operators.multimodal import _check_pixel_budget, encode_ppm
from sif_spark.operators.probe import _mp4_boxes

#: Upper bound on resolved samples per track — a forged sample_count
#: can't buy an unbounded offset list (the table itself is physically
#: bounded by the box size; this caps the resolver's output too).
MAX_MP4_SAMPLES = 1 << 20

#: Sample-entry fourccs with a built-in decoder.
VIDEO_CODECS = ("jpeg", "mjpa", "mjpb", "MJPG")
AUDIO_CODECS = ("sowt", "twos", "raw ")


def _full_box(blob: bytes, body: int, box_end: int, need: int) -> int:
    """Validate a full-box (version+flags) header and `need` more
    bytes; returns the offset past version/flags."""
    if body + 4 + need > box_end:
        raise ValueError("truncated MP4 full box")
    return body + 4


def _read_table(
    blob: bytes, body: int, box_end: int, entry_bytes: int
) -> tuple[int, int]:
    """Common stsz/stsc/stco/co64 prologue: validate that the declared
    entry_count physically fits in the box (attacker-controlled count
    vs real bytes), return (entry_count, first_entry_offset)."""
    p = _full_box(blob, body, box_end, 4)
    n = int.from_bytes(blob[p : p + 4], "big")
    if p + 4 + n * entry_bytes > box_end:
        raise ValueError("MP4 table entry_count exceeds its box size")
    return n, p + 4


def parse_mp4_tracks(blob: bytes) -> list[dict]:
    """Walk moov and return one dict per trak: handler ('vide'/'soun'),
    codec fourcc, timescale, stsd details (video width/height; audio
    channels/bits/sample_rate), and the resolved sample list.

    Constant-size tracks (audio PCM: stsz.sample_size != 0) resolve to
    per-CHUNK spans (offset, n_samples*size) — concatenating chunk
    regions directly instead of materializing one entry per PCM frame;
    variable-size tracks (video) resolve to per-sample (offset, size).
    """
    tracks: list[dict] = []

    def walk_trak(pos: int, end: int, t: dict) -> None:
        for btype, body, box_end in _mp4_boxes(blob, pos, end):
            if btype in (b"mdia", b"minf", b"stbl"):
                walk_trak(body, box_end, t)
            elif btype == b"mdhd":
                if body >= box_end:
                    raise ValueError("truncated mdhd box")
                ver = blob[body]
                off = body + 4 + (16 if ver == 1 else 8)
                if off + 8 > box_end:
                    raise ValueError("truncated mdhd box")
                t["timescale"] = int.from_bytes(blob[off : off + 4], "big")
            elif btype == b"hdlr" and box_end - body >= 12:
                t["handler"] = blob[body + 8 : body + 12].decode("latin-1")
            elif btype == b"stsd":
                # ISO-BMFF doesn't mandate hdlr-before-minf order; defer
                # interpreting the sample entry until the trak walk ends
                # and the handler (if any) is known.
                t["_stsd_span"] = (body, box_end)
            elif btype == b"stsz":
                p = _full_box(blob, body, box_end, 8)
                t["sample_size"] = int.from_bytes(blob[p : p + 4], "big")
                n = int.from_bytes(blob[p + 4 : p + 8], "big")
                if n > MAX_MP4_SAMPLES:
                    raise ValueError(f"MP4 sample_count {n} exceeds cap")
                if t["sample_size"] == 0:
                    if p + 8 + n * 4 > box_end:
                        raise ValueError("stsz size table exceeds its box")
                    t["sizes"] = [
                        int.from_bytes(blob[p + 8 + 4 * i : p + 12 + 4 * i], "big")
                        for i in range(n)
                    ]
                t["sample_count"] = n
            elif btype == b"stsc":
                n, p = _read_table(blob, body, box_end, 12)
                t["stsc"] = [
                    (
                        int.from_bytes(blob[p + 12 * i : p + 12 * i + 4], "big"),
                        int.from_bytes(blob[p + 12 * i + 4 : p + 12 * i + 8], "big"),
                    )
                    for i in range(n)
                ]
            elif btype == b"stco":
                n, p = _read_table(blob, body, box_end, 4)
                t["chunk_offsets"] = [
                    int.from_bytes(blob[p + 4 * i : p + 4 * i + 4], "big")
                    for i in range(n)
                ]
            elif btype == b"co64":
                n, p = _read_table(blob, body, box_end, 8)
                t["chunk_offsets"] = [
                    int.from_bytes(blob[p + 8 * i : p + 8 * i + 8], "big")
                    for i in range(n)
                ]

    found_moov = False
    for btype, body, box_end in _mp4_boxes(blob, 0, len(blob)):
        if btype == b"moov":
            found_moov = True
            for btype2, b2, e2 in _mp4_boxes(blob, body, box_end):
                if btype2 == b"trak":
                    t: dict = {}
                    walk_trak(b2, e2, t)
                    span = t.pop("_stsd_span", None)
                    if span is not None:
                        _parse_stsd(blob, span[0], span[1], t)
                    t["samples"] = _resolve_samples(blob, t)
                    tracks.append(t)
    if not found_moov:
        raise ValueError("no moov box — not an MP4 movie")
    return tracks


def _parse_stsd(blob: bytes, body: int, box_end: int, t: dict) -> None:
    """First sample entry of the sample description box: codec fourcc
    plus the video (width/height) or audio (channels/bits/rate)
    fields of the ISO sample-entry layouts."""
    p = _full_box(blob, body, box_end, 4) + 4  # skip entry_count
    if p + 8 > box_end:
        raise ValueError("stsd has no sample entry")
    entry_size = int.from_bytes(blob[p : p + 4], "big")
    if entry_size < 16 or p + entry_size > box_end:
        raise ValueError("stsd sample entry runs past its box")
    t["codec"] = blob[p + 4 : p + 8].decode("latin-1")
    e = p + 8 + 6 + 2  # skip reserved(6) + data_reference_index(2)
    if t.get("handler") != "soun" and e + 20 <= p + entry_size:
        t["width"] = int.from_bytes(blob[e + 16 : e + 18], "big")
        t["height"] = int.from_bytes(blob[e + 18 : e + 20], "big")
    if t.get("handler") == "soun" and e + 20 <= p + entry_size:
        t["channels"] = int.from_bytes(blob[e + 8 : e + 10], "big")
        t["bits"] = int.from_bytes(blob[e + 10 : e + 12], "big")
        t["sample_rate"] = int.from_bytes(blob[e + 16 : e + 18], "big")


def _resolve_samples(blob: bytes, t: dict) -> list[tuple[int, int]]:
    """stsc × stco × stsz → bounds-checked byte spans. Per-sample for
    variable sizes; per-chunk for constant sizes (see parse_mp4_tracks)."""
    stsc = t.get("stsc") or []
    offsets = t.get("chunk_offsets") or []
    if not stsc or not offsets:
        return []
    const = t.get("sample_size", 0)
    sizes = t.get("sizes") or []
    n_samples = t.get("sample_count", len(sizes))
    spans: list[tuple[int, int]] = []
    si = 0
    for ei, (first, spc) in enumerate(stsc):
        if first < 1 or first > len(offsets):
            raise ValueError("stsc first_chunk out of range")
        last = (stsc[ei + 1][0] - 1) if ei + 1 < len(stsc) else len(offsets)
        for c in range(first, last + 1):
            if si >= n_samples:
                break
            take = min(spc, n_samples - si)
            off = offsets[c - 1]
            if const:
                span = take * const
                if off + span > len(blob):
                    raise ValueError("MP4 chunk runs past the buffer")
                spans.append((off, span))
                si += take
            else:
                for _ in range(take):
                    sz = sizes[si]
                    if off + sz > len(blob):
                        raise ValueError("MP4 sample runs past the buffer")
                    spans.append((off, sz))
                    off += sz
                    si += 1
            if len(spans) > MAX_MP4_SAMPLES:
                raise ValueError("resolved MP4 samples exceed cap")
    return spans


def _first_track(blob: bytes, handler: str) -> dict:
    for t in parse_mp4_tracks(blob):
        if t.get("handler") == handler:
            return t
    raise ValueError(f"MP4 has no {handler!r} track")


def iter_mp4_frames(blob: bytes) -> Iterator[np.ndarray]:
    """Yield each video frame of the first 'vide' track as (H, W, 3)
    RGB uint8 — MJPEG samples decoded through the baseline-JPEG
    decoder (the injected-codec gate names any other fourcc)."""
    from sif_spark.operators.jpeg import decode_jpeg

    t = _first_track(blob, "vide")
    codec = t.get("codec", "")
    if codec not in VIDEO_CODECS:
        raise NotImplementedError(
            f"no built-in codec for MP4 video sample entry {codec!r}: "
            f"built-ins cover {VIDEO_CODECS}; pass frame_decoder= with "
            f"a real video codec"
        )
    w, h = t.get("width", 0), t.get("height", 0)
    _check_pixel_budget(max(w, 1), max(h, 1))
    for off, sz in t["samples"]:
        frame = decode_jpeg(blob[off : off + sz])
        if frame.ndim == 2:  # grayscale MJPEG → RGB contract
            frame = np.repeat(frame[:, :, None], 3, axis=2)
        if w and h and frame.shape[:2] != (h, w):
            raise ValueError(
                f"MP4 frame is {frame.shape[1]}x{frame.shape[0]}, "
                f"sample entry declares {w}x{h}"
            )
        yield frame


def decode_mp4_audio(blob: bytes) -> np.ndarray:
    """First 'soun' track → (n_frames, channels) float32 in [-1, 1),
    the decode_wav contract: 'sowt' int16-LE → v/2¹⁵, 'twos' int16-BE
    → v/2¹⁵, 'raw ' offset-binary uint8 → (v−128)/128."""
    t = _first_track(blob, "soun")
    codec = t.get("codec", "")
    if codec not in AUDIO_CODECS:
        raise NotImplementedError(
            f"no built-in codec for MP4 audio sample entry {codec!r}: "
            f"built-ins cover {AUDIO_CODECS} (PCM); compressed audio "
            f"(mp4a/AAC) needs an injected codec"
        )
    data = b"".join(blob[off : off + sz] for off, sz in t["samples"])
    if codec == "sowt":
        x = np.frombuffer(data, dtype="<i2").astype(np.float32) / 32768.0
    elif codec == "twos":
        x = np.frombuffer(data, dtype=">i2").astype(np.float32) / 32768.0
    else:  # 'raw ' — QuickTime offset-binary 8-bit
        x = (np.frombuffer(data, np.uint8).astype(np.float32) - 128.0) / 128.0
    ch = max(t.get("channels", 1), 1)
    if x.size % ch:
        raise ValueError("MP4 PCM byte count not a multiple of channels")
    return x.reshape(-1, ch)


def decode_mp4(blob: bytes) -> np.ndarray:
    """media_decoder contract for MP4: first video frame when a
    decodable video track exists, else the decoded PCM audio (the
    decode_wav shape)."""
    tracks = parse_mp4_tracks(blob)
    if any(t.get("handler") == "vide" for t in tracks):
        for frame in iter_mp4_frames(blob):
            return frame
        raise ValueError("MP4 video track has no samples")
    return decode_mp4_audio(blob)


def mp4_frame_decoder(blob: bytes, every_n: int) -> list[bytes]:
    """`sample_frames` contract for MP4: video tracks yield every_n-th
    frame as a standalone P6 PPM blob (the avi_frame_decoder hand-off);
    audio-only movies yield every_n-th 1024-sample int16-LE PCM window
    (the wav_frame_decoder hand-off)."""
    from sif_spark.operators.multimodal import _pcm_frame_windows

    if any(t.get("handler") == "vide" for t in parse_mp4_tracks(blob)):
        frames = [encode_ppm(f) for f in iter_mp4_frames(blob)]
        return frames[::every_n] if frames else []
    return _pcm_frame_windows(decode_mp4_audio(blob), every_n)


# ---------------------------------------------------------------------------
# Test muxers: real multi-chunk sample tables (so stsc resolution is
# genuinely exercised), mdat-first layout, spec-complete moov tree.
# ---------------------------------------------------------------------------


def _box(btype: bytes, payload: bytes) -> bytes:
    return (8 + len(payload)).to_bytes(4, "big") + btype + payload


def _full(btype: bytes, payload: bytes, version: int = 0) -> bytes:
    return _box(btype, bytes([version, 0, 0, 0]) + payload)


def _moov(
    handler: bytes,
    stsd_entry: bytes,
    timescale: int,
    duration: int,
    n_samples: int,
    sample_size: int,
    sizes: list[int],
    stsc: list[tuple[int, int]],
    chunk_offsets: list[int],
    width: int = 0,
    height: int = 0,
) -> bytes:
    stsd = _full(b"stsd", (1).to_bytes(4, "big") + stsd_entry)
    stts = _full(
        b"stts", (1).to_bytes(4, "big") + n_samples.to_bytes(4, "big") + (1).to_bytes(4, "big")
    )
    stsz = _full(
        b"stsz",
        sample_size.to_bytes(4, "big")
        + n_samples.to_bytes(4, "big")
        + b"".join(s.to_bytes(4, "big") for s in (sizes if not sample_size else [])),
    )
    stsc_b = _full(
        b"stsc",
        len(stsc).to_bytes(4, "big")
        + b"".join(
            f.to_bytes(4, "big") + s.to_bytes(4, "big") + (1).to_bytes(4, "big")
            for f, s in stsc
        ),
    )
    stco = _full(
        b"stco",
        len(chunk_offsets).to_bytes(4, "big")
        + b"".join(o.to_bytes(4, "big") for o in chunk_offsets),
    )
    stbl = _box(b"stbl", stsd + stts + stsc_b + stsz + stco)
    header = (
        _full(b"vmhd", bytes(8), version=0)
        if handler == b"vide"
        else _full(b"smhd", bytes(4))
    )
    dinf = _box(b"dinf", _full(b"dref", (1).to_bytes(4, "big") + _full(b"url ", b"", version=0)))
    minf = _box(b"minf", header + dinf + stbl)
    hdlr = _full(b"hdlr", bytes(4) + handler + bytes(12) + b"\x00")
    mdhd = _full(
        b"mdhd",
        bytes(8) + timescale.to_bytes(4, "big") + duration.to_bytes(4, "big") + bytes(4),
    )
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    tkhd = _full(
        b"tkhd",
        bytes(8)
        + (1).to_bytes(4, "big")
        + bytes(4)
        + duration.to_bytes(4, "big")
        + bytes(52)
        + (width << 16).to_bytes(4, "big")
        + (height << 16).to_bytes(4, "big"),
        version=0,
    )
    trak = _box(b"trak", tkhd + mdia)
    mvhd = _full(
        b"mvhd",
        bytes(8)
        + timescale.to_bytes(4, "big")
        + duration.to_bytes(4, "big")
        + bytes(80),
    )
    return _box(b"moov", mvhd + trak)


def _chunk_layout(payloads: list[bytes], mdat_body: int) -> tuple[
    list[tuple[int, int]], list[int], bytes
]:
    """Pack samples into chunks of 3,2,2,2,… samples (a genuinely
    non-uniform stsc: one (1,3) entry + one (2,2) entry) and return
    (stsc, chunk_offsets, mdat_payload)."""
    groups: list[list[bytes]] = []
    i = 0
    while i < len(payloads):
        take = 3 if not groups else 2
        groups.append(payloads[i : i + take])
        i += take
    stsc = []  # run-length encode the per-chunk sample counts
    for ci, g in enumerate(groups, start=1):
        if not stsc or stsc[-1][1] != len(g):
            stsc.append((ci, len(g)))
    offsets: list[int] = []
    body = bytearray()
    for g in groups:
        offsets.append(mdat_body + len(body))
        for p in g:
            body += p
    return stsc, offsets, bytes(body)


def _mux(
    stsd_entry: bytes,
    handler: bytes,
    payloads: list[bytes],
    timescale: int,
    duration: int,
    sample_size: int = 0,
    width: int = 0,
    height: int = 0,
) -> bytes:
    ftyp = _box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2")
    mdat_body = len(ftyp) + 8  # mdat payload starts after its header
    stsc, offsets, body = _chunk_layout(payloads, mdat_body)
    n = len(payloads)
    moov = _moov(
        handler,
        stsd_entry,
        timescale,
        duration,
        n,
        sample_size,
        [len(p) for p in payloads],
        stsc,
        offsets,
        width,
        height,
    )
    return ftyp + _box(b"mdat", body) + moov


def encode_mp4_mjpeg(frames, fps: int = 10, quant: int = 1) -> bytes:
    """List of (H, W, 3) RGB uint8 frames → an MP4 with one Motion-JPEG
    video track ('jpeg' sample entries, each sample an encode_jpeg
    stream; quant=1 + 8×8-block-constant frames decode exactly).
    Samples are packed 3,2,2,… per chunk so decoding exercises real
    stsc resolution, not a trivial one-sample-per-chunk table."""
    from sif_spark.operators.jpeg import encode_jpeg

    frames = [np.asarray(f, dtype=np.uint8) for f in frames]
    if not frames:
        raise ValueError("MP4 needs at least one frame")
    if any(f.shape != frames[0].shape for f in frames):
        raise ValueError("MP4 frames must share one size")
    h, w = frames[0].shape[:2]
    payloads = [encode_jpeg(f, quant=quant) for f in frames]
    entry = (
        (8 + 8 + 70).to_bytes(4, "big")
        + b"jpeg"
        + bytes(6)
        + (1).to_bytes(2, "big")
        + bytes(16)
        + w.to_bytes(2, "big")
        + h.to_bytes(2, "big")
        + bytes(50)
    )
    return _mux(entry, b"vide", payloads, fps, len(frames), width=w, height=h)


def encode_mp4_pcm(
    pcm: np.ndarray, sample_rate: int = 16000, codec: str = "sowt"
) -> bytes:
    """(n, ch) or (n,) int16 PCM → an MP4 with one uncompressed audio
    track. 'sowt' stores little-endian, 'twos' big-endian, 'raw '
    offset-binary uint8 (int16 values are truncated to their high
    byte + 128, the QuickTime convention)."""
    if codec not in AUDIO_CODECS:
        raise ValueError(f"codec must be one of {AUDIO_CODECS}")
    pcm = np.asarray(pcm, dtype=np.int16)
    if pcm.ndim == 1:
        pcm = pcm[:, None]
    n, ch = pcm.shape
    if codec == "sowt":
        data, bits = pcm.astype("<i2").tobytes(), 16
    elif codec == "twos":
        data, bits = pcm.astype(">i2").tobytes(), 16
    else:
        data = (((pcm.astype(np.int32) >> 8) + 128).astype(np.uint8)).tobytes()
        bits = 8
    bytes_per_frame = ch * (bits // 8)
    # constant-size samples: one sample per PCM frame, chunked in
    # ~quarter-second groups so stsc/stco hold several real chunks
    per_chunk = max(sample_rate // 4, 1)
    payloads = [
        data[i : i + per_chunk * bytes_per_frame]
        for i in range(0, len(data), per_chunk * bytes_per_frame)
    ]
    # _chunk_layout packs PAYLOADS (here: chunks) — for constant-size
    # tracks each "payload" IS a chunk, so build the tables directly
    ftyp = _box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2")
    mdat_body = len(ftyp) + 8
    offsets, body = [], bytearray()
    for p in payloads:
        offsets.append(mdat_body + len(body))
        body += p
    stsc = []
    for i, p in enumerate(payloads):
        spc = len(p) // bytes_per_frame
        if not stsc or stsc[-1][1] != spc:
            stsc.append((i + 1, spc))
    entry = (
        (8 + 8 + 20).to_bytes(4, "big")
        + codec.encode("latin-1")
        + bytes(6)
        + (1).to_bytes(2, "big")
        + bytes(8)
        + ch.to_bytes(2, "big")
        + bits.to_bytes(2, "big")
        + bytes(4)
        + sample_rate.to_bytes(2, "big")
        + bytes(2)
    )
    moov = _moov(
        b"soun", entry, sample_rate, n, n, bytes_per_frame, [], stsc, offsets
    )
    return ftyp + _box(b"mdat", bytes(body)) + moov
