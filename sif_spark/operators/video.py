"""AVI video container: RIFF walk, MJPEG + uncompressed-DIB frame
decode, metadata probe, and a test encoder.

This extends the opaque-binary-column ambition of the reference's
CustomColumnType extension point (column_type.go:16-23,
docs/custom-columntypes.md:1-20) from still images (multimodal.py) to
real video containers: AVI is RIFF (the same container family as WAV,
already decoded here), MJPEG frames are baseline JPEG streams (decoded
by operators/jpeg.py), and DIB frames are the BMP pixel-array layout
(bottom-up BGR rows, 4-byte stride) — so a from-scratch AVI walker
composes three codecs this repo already ships and closes the
"video container" half of the injected-codec gate
(multimodal.media_decoder) for the two codecs every test corpus and
legacy capture pipeline actually uses. Modern codecs (H.264/VP9/AV1)
remain behind the injected-decoder gate with a typed error naming the
fourcc — entropy-coded motion compensation is not implementable at
useful speed in stdlib Python, and the gate makes that loud.

Scale notes: frame iteration is a single forward pass over the blob
(no index required — idx1 is written by the encoder but never needed
for decode), so `sample_frames` with `avi_frame_decoder` streams each
blob once inside an Arrow batch; frames never leave their executor.
All sizes are read from attacker-controlled fields, so every chunk is
bounds-checked against the enclosing buffer and every frame allocation
passes the shared MAX_DECODE_PIXELS budget before data bytes are
touched (the round-7/8 decompression-bomb contract).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np

from sif_spark.operators.multimodal import _check_pixel_budget, encode_ppm

#: Codecs with a built-in decoder. Anything else raises
#: NotImplementedError naming the fourcc (the injected-codec gate).
BUILTIN_CODECS = ("MJPG", "DIB ")


def _riff_chunks(data: bytes, pos: int, end: int) -> Iterator[tuple[bytes, int, int]]:
    """Yield (fourcc, body_offset, size) for each chunk in data[pos:end].
    RIFF chunks are word-aligned: an odd size is followed by a pad byte
    that is not part of the payload. Sizes are attacker-controlled, so
    a chunk running past the enclosing buffer is a typed decode error."""
    while pos + 8 <= end:
        fourcc = data[pos : pos + 4]
        size = int.from_bytes(data[pos + 4 : pos + 8], "little")
        body = pos + 8
        if size > end - body:
            raise ValueError(
                f"RIFF chunk {fourcc!r} (size {size}) runs past the buffer"
            )
        yield fourcc, body, size
        pos = body + size + (size & 1)
    if pos < end:
        raise ValueError("trailing bytes too short for a RIFF chunk header")


def _require_avi(blob: bytes) -> int:
    if blob[:4] != b"RIFF" or blob[8:12] != b"AVI ":
        raise ValueError(f"not an AVI blob (magic {blob[:4]!r}/{blob[8:12]!r})")
    size = int.from_bytes(blob[4:8], "little")
    end = min(8 + size, len(blob))
    if end < 12:
        raise ValueError("truncated AVI header")
    return end


def parse_avi(blob: bytes) -> dict:
    """Typed metadata without decoding a single frame: the hdrl LIST's
    MainAVIHeader + one dict per stream (AVIStreamHeader + the video
    BITMAPINFOHEADER / audio WAVEFORMATEX essentials). This is the
    metadata-only path — a probe over a 100 TB corpus reads a few
    hundred header bytes per blob and never touches frame data."""
    end = _require_avi(blob)
    meta: dict = {"streams": []}
    for fourcc, body, size in _riff_chunks(blob, 12, end):
        if fourcc != b"LIST" or blob[body : body + 4] != b"hdrl":
            continue
        for cc, b, sz in _riff_chunks(blob, body + 4, body + size):
            if cc == b"avih" and sz >= 40:
                meta["us_per_frame"] = int.from_bytes(blob[b : b + 4], "little")
                meta["total_frames"] = int.from_bytes(blob[b + 16 : b + 20], "little")
                meta["n_streams"] = int.from_bytes(blob[b + 24 : b + 28], "little")
                meta["width"] = int.from_bytes(blob[b + 32 : b + 36], "little")
                meta["height"] = int.from_bytes(blob[b + 36 : b + 40], "little")
            elif cc == b"LIST" and blob[b : b + 4] == b"strl":
                meta["streams"].append(_parse_strl(blob, b + 4, b + sz))
        break
    if "us_per_frame" not in meta:
        raise ValueError("AVI has no hdrl/avih header")
    if meta["us_per_frame"] and meta.get("total_frames"):
        meta["duration_s"] = meta["us_per_frame"] * meta["total_frames"] / 1e6
    return meta


def _parse_strl(blob: bytes, pos: int, end: int) -> dict:
    s: dict = {}
    for cc, b, sz in _riff_chunks(blob, pos, end):
        if cc == b"strh" and sz >= 40:
            s["type"] = blob[b : b + 4].decode("latin-1")
            s["handler"] = blob[b + 4 : b + 8].decode("latin-1")
            s["scale"] = int.from_bytes(blob[b + 20 : b + 24], "little")
            s["rate"] = int.from_bytes(blob[b + 24 : b + 28], "little")
            s["length"] = int.from_bytes(blob[b + 32 : b + 36], "little")
            if s["scale"]:
                s["fps"] = s["rate"] / s["scale"]
        elif cc == b"strf":
            s["_strf"] = (b, sz)
            if s.get("type") == "vids" and sz >= 40:
                s["bpp"] = int.from_bytes(blob[b + 14 : b + 16], "little")
                s["compression"] = (
                    blob[b + 16 : b + 20].decode("latin-1").replace("\x00", " ")
                )
                if s["compression"] == "    ":
                    s["compression"] = "DIB "  # biCompression=0 is BI_RGB
            elif s.get("type") == "auds" and sz >= 16:
                s["channels"] = int.from_bytes(blob[b + 2 : b + 4], "little")
                s["sample_rate"] = int.from_bytes(blob[b + 4 : b + 8], "little")
                s["bits_per_sample"] = int.from_bytes(blob[b + 14 : b + 16], "little")
    return s


def _dib_frame(data: bytes, w: int, h: int, bpp: int, palette) -> np.ndarray:
    """One uncompressed DIB frame → (H, W, 3) RGB uint8. Same layout as
    the BMP pixel array (multimodal.decode_bmp): bottom-up rows padded
    to 4-byte multiples, BGR / BGRX / palette-index pixels."""
    if bpp not in (8, 24, 32):
        raise ValueError(f"unsupported DIB bit depth {bpp}")
    stride = (w * (bpp // 8) + 3) & ~3
    if h * stride > len(data):
        raise ValueError("truncated DIB frame data")
    rows = np.frombuffer(data, np.uint8, h * stride).reshape(h, stride)
    rows = rows[::-1, : w * (bpp // 8)]  # bottom-up → top-down
    if bpp == 8:
        if palette is None:
            raise ValueError("8-bpp DIB frame without a strf color table")
        idx = rows.reshape(h, w)
        if idx.size and idx.max() >= len(palette):
            raise ValueError("DIB palette index exceeds color table")
        return np.ascontiguousarray(palette[idx])
    out = rows.reshape(h, w, bpp // 8)[:, :, 2::-1]  # BGR(X) → RGB
    return np.ascontiguousarray(out)


def iter_avi_frames(blob: bytes) -> Iterator[np.ndarray]:
    """Yield each video frame of the FIRST vids stream as an (H, W, 3)
    RGB uint8 array, decoding MJPG chunks through the baseline-JPEG
    decoder and DIB chunks through the BMP row layout. Zero-length
    frame chunks (a legal AVI way to hold a frame for >1 tick) repeat
    the previous frame, preserving frame indices for `every_n`
    sampling. Grouped `LIST rec ` blocks are walked recursively; audio
    (`##wb`) and index (`idx1`) chunks are skipped."""
    from sif_spark.operators.jpeg import decode_jpeg

    end = _require_avi(blob)
    meta = parse_avi(blob)
    vids = [
        (i, s) for i, s in enumerate(meta["streams"]) if s.get("type") == "vids"
    ]
    if not vids:
        raise ValueError("AVI has no video stream")
    snum, stream = vids[0]
    codec = stream.get("compression", "")
    if codec not in BUILTIN_CODECS:
        raise NotImplementedError(
            f"no built-in codec for AVI fourcc {codec!r}: built-ins cover "
            f"{BUILTIN_CODECS}; pass frame_decoder= with a real video codec"
        )
    w, h, bpp = meta["width"], meta["height"], stream.get("bpp", 24)
    _check_pixel_budget(max(w, 1), max(h, 1))
    palette = None
    if bpp == 8 and "_strf" in stream:
        b, sz = stream["_strf"]
        hdr = int.from_bytes(blob[b : b + 4], "little") or 40
        n_colors = int.from_bytes(blob[b + 32 : b + 36], "little") or 256
        if b + hdr + n_colors * 4 <= b + sz:
            palette = np.frombuffer(
                blob, np.uint8, n_colors * 4, b + hdr
            ).reshape(n_colors, 4)[:, 2::-1]  # BGRX → RGB

    want = {f"{snum:02d}dc".encode(), f"{snum:02d}db".encode()}
    prev: np.ndarray | None = None

    def walk(pos: int, stop: int) -> Iterator[np.ndarray]:
        nonlocal prev
        for cc, b, sz in _riff_chunks(blob, pos, stop):
            if cc == b"LIST" and blob[b : b + 4] == b"rec ":
                yield from walk(b + 4, b + sz)
            elif cc in want:
                if sz == 0:
                    if prev is None:
                        raise ValueError("AVI drop-frame before any real frame")
                    yield prev.copy()
                    continue
                data = blob[b : b + sz]
                if codec == "MJPG":
                    frame = decode_jpeg(data)
                    if frame.ndim == 2:  # grayscale MJPEG → RGB contract
                        frame = np.repeat(frame[:, :, None], 3, axis=2)
                else:
                    frame = _dib_frame(data, w, h, bpp, palette)
                if frame.shape[:2] != (h, w):
                    raise ValueError(
                        f"AVI frame is {frame.shape[1]}x{frame.shape[0]}, "
                        f"container declares {w}x{h}"
                    )
                prev = frame
                yield frame

    for fourcc, body, size in _riff_chunks(blob, 12, end):
        if fourcc == b"LIST" and blob[body : body + 4] == b"movi":
            yield from walk(body + 4, body + size)
            return
    raise ValueError("AVI has no movi LIST")


def decode_avi(blob: bytes) -> np.ndarray:
    """First video frame → (H, W, 3) RGB uint8 (the `media_decoder`
    still-image contract for video blobs, mirroring decode_gif)."""
    for frame in iter_avi_frames(blob):
        return frame
    raise ValueError("AVI movi LIST contains no video frames")


def avi_frame_decoder(blob: bytes, every_n: int) -> list[bytes]:
    """`sample_frames` contract for AVI: decode the video stream, keep
    every_n-th frame, return each as a standalone P6 PPM blob — the
    same independently-decodable hand-off as gif_frame_decoder."""
    frames = [encode_ppm(f) for f in iter_avi_frames(blob)]
    return frames[::every_n] if frames else []


def frame_sad(a: np.ndarray, b: np.ndarray) -> int:
    """Sum of absolute differences between two frames — the classic
    shot-boundary signal, pure integer (SQL-reproducible)."""
    if a.shape != b.shape:
        raise ValueError(f"frame shapes differ: {a.shape} vs {b.shape}")
    return int(np.abs(a.astype(np.int64) - b.astype(np.int64)).sum())


def scene_cuts(
    df,
    blob_col: str,
    id_col: str,
    threshold: int,
    on_error: str = "raise",
):
    """(id, frame_idx, sad) — one row per shot boundary: frames whose
    SAD against the PREVIOUS frame exceeds ``threshold``. Works on any
    container `media_frame_decoder` walks (AVI MJPG/DIB, animated
    GIF); the selected keyframes typically feed `sample_frames`-style
    extraction next, so a scene-cut pass turns "every Nth frame" into
    "one frame per shot" — far fewer frames to embed at 100 TB.

    One Arrow-batched mapInPandas stage, frames never leave their
    executor; SAD is integer-exact so q128 gates it in closed form.
    ``on_error="null"`` skips undecodable blobs (IgnoreRowErrors,
    internal/util/operation.go:10-27)."""
    import pandas as pd
    from pyspark.sql import types as T

    from sif_spark.operators.multimodal import decode_ppm, media_frame_decoder

    if on_error not in ("raise", "null"):
        raise ValueError(f"on_error must be 'raise' or 'null', got {on_error!r}")

    out_schema = T.StructType(
        [
            T.StructField(id_col, df.schema[id_col].dataType, True),
            T.StructField("frame_idx", T.IntegerType(), True),
            T.StructField("sad", T.LongType(), True),
        ]
    )

    def run(batches):
        for pdf in batches:
            ids, fidx, sads = [], [], []
            for i, b in zip(pdf[id_col], pdf[blob_col]):
                if b is None:
                    continue
                try:
                    frames = [decode_ppm(f) for f in media_frame_decoder(bytes(b), 1)]
                except (ValueError, NotImplementedError):
                    if on_error == "null":
                        continue
                    raise
                for k in range(1, len(frames)):
                    s = frame_sad(frames[k - 1], frames[k])
                    if s > threshold:
                        ids.append(i)
                        fidx.append(k)
                        sads.append(s)
            yield pd.DataFrame({id_col: ids, "frame_idx": fidx, "sad": sads})

    return df.select(id_col, blob_col).mapInPandas(run, out_schema)


# ---------------------------------------------------------------------------
# Test encoder: authors real AVI-MJPG / AVI-DIB files so the decoder is
# exercised on genuine container bytes (the PNG/GIF/JPEG encoders set
# the pattern — symmetric-bug risk is covered by hand-assembled spec
# bytes in the tests, not by the encoder).
# ---------------------------------------------------------------------------


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    return fourcc + len(payload).to_bytes(4, "little") + payload + (
        b"\x00" if len(payload) & 1 else b""
    )


def _list(kind: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", kind + payload)


def encode_avi(
    frames,
    codec: str = "MJPG",
    fps: int = 25,
    quant: int = 1,
    drop_frames: list[int] | None = None,
) -> bytes:
    """List of (H, W, 3) RGB uint8 frames → a complete AVI: hdrl
    (avih + one vids strl), movi with 00dc/00db frame chunks, and an
    idx1 index. ``codec`` 'MJPG' routes each frame through encode_jpeg
    (``quant`` forwarded; quant=1 + 8x8-block-constant frames decode
    exactly); 'DIB ' writes uncompressed bottom-up BGR rows.
    ``drop_frames`` lists frame indices to write as zero-length chunks
    (the hold-previous-frame AVI idiom) — the listed frame's pixels
    must equal the previous frame's for round-trip tests to hold."""
    from sif_spark.operators.jpeg import encode_jpeg

    frames = [np.asarray(f, dtype=np.uint8) for f in frames]
    if not frames:
        raise ValueError("AVI needs at least one frame")
    if any(f.ndim != 3 or f.shape[2] != 3 for f in frames):
        raise ValueError("frames must be (H,W,3) uint8")
    if any(f.shape != frames[0].shape for f in frames):
        raise ValueError("AVI frames must share one size")
    if codec not in BUILTIN_CODECS:
        raise ValueError(f"codec must be one of {BUILTIN_CODECS}")
    drop = set(drop_frames or ())
    if 0 in drop:
        raise ValueError("frame 0 cannot be a drop frame")
    h, w = frames[0].shape[:2]

    payloads: list[bytes] = []
    for i, f in enumerate(frames):
        if i in drop:
            payloads.append(b"")
        elif codec == "MJPG":
            payloads.append(encode_jpeg(f, quant=quant))
        else:
            stride = (w * 3 + 3) & ~3
            body = np.zeros((h, stride), dtype=np.uint8)
            body[:, : w * 3] = f[::-1, :, ::-1].reshape(h, w * 3)
            payloads.append(body.tobytes())
    frame_cc = b"00dc" if codec == "MJPG" else b"00db"
    max_bytes = max(len(p) for p in payloads)

    strh = (
        b"vids"
        + (codec.encode("latin-1") if codec == "MJPG" else b"\x00\x00\x00\x00")
        + (0).to_bytes(4, "little")  # flags
        + (0).to_bytes(4, "little")  # priority+language
        + (0).to_bytes(4, "little")  # initial frames
        + (1).to_bytes(4, "little")  # scale
        + fps.to_bytes(4, "little")  # rate
        + (0).to_bytes(4, "little")  # start
        + len(frames).to_bytes(4, "little")  # length
        + max_bytes.to_bytes(4, "little")  # suggested buffer
        + (0xFFFFFFFF).to_bytes(4, "little")  # quality
        + (0).to_bytes(4, "little")  # sample size
        + bytes(8)  # rcFrame
    )
    strf = (
        (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (b"MJPG" if codec == "MJPG" else bytes(4))
        + max_bytes.to_bytes(4, "little")
        + bytes(16)
    )
    avih = (
        (1_000_000 // fps).to_bytes(4, "little")
        + (max_bytes * fps).to_bytes(4, "little")
        + (0).to_bytes(4, "little")  # padding granularity
        + (0x10).to_bytes(4, "little")  # AVIF_HASINDEX
        + len(frames).to_bytes(4, "little")
        + (0).to_bytes(4, "little")  # initial frames
        + (1).to_bytes(4, "little")  # streams
        + max_bytes.to_bytes(4, "little")
        + w.to_bytes(4, "little")
        + h.to_bytes(4, "little")
        + bytes(16)
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )

    movi_body = bytearray()
    idx = bytearray()
    for p in payloads:
        # idx1 offsets are relative to the 'movi' fourcc position
        off = 4 + len(movi_body)
        idx += frame_cc + (0x10).to_bytes(4, "little")  # AVIIF_KEYFRAME
        idx += off.to_bytes(4, "little") + len(p).to_bytes(4, "little")
        movi_body += _chunk(frame_cc, p)
    movi = _list(b"movi", bytes(movi_body))

    riff_body = b"AVI " + hdrl + movi + _chunk(b"idx1", bytes(idx))
    return b"RIFF" + len(riff_body).to_bytes(4, "little") + riff_body


# ---------------------------------------------------------------------------
# Y4M (YUV4MPEG2): the standard UNCOMPRESSED video interchange format
# (what ffmpeg/x264 pipelines pass between stages). Pure header + raw
# planar YUV — no entropy coding anywhere, so decode is NumPy reshapes
# plus one fixed-point BT.601 conversion and the whole format sits on
# the vectorized side of the codec boundary (SCALE.md).
# ---------------------------------------------------------------------------

#: Supported colorspace tags → (chroma_x_div, chroma_y_div) plane
#: geometry. The C420 family variants (jpeg/mpeg2/paldv) differ only
#: in chroma SITING, which a nearest-neighbor upsample ignores.
Y4M_COLORSPACES = {
    "C420": (2, 2),
    "C420jpeg": (2, 2),
    "C420mpeg2": (2, 2),
    "C420paldv": (2, 2),
    "C422": (2, 1),
    "C444": (1, 1),
    "Cmono": (0, 0),
}


def yuv601_to_rgb(y: np.ndarray, u: np.ndarray, v: np.ndarray) -> np.ndarray:
    """Fixed-point ITU-R BT.601 limited-range YUV → RGB uint8 — the
    standard integer video conversion (coefficients 298/409/100/208/
    516, +128 rounding, >>8). Values are clamped to [0, 65535] BEFORE
    the shift so the shift always acts on non-negative ints — this
    makes the formula bit-identical between NumPy here and the integer
    SQL the DuckDB oracle replays (floor-vs-truncate division on
    negatives never arises)."""
    c = 298 * (y.astype(np.int64) - 16)
    d = u.astype(np.int64) - 128
    e = v.astype(np.int64) - 128
    def chan(expr):
        return (np.clip(expr + 128, 0, 65535) >> 8).astype(np.uint8)
    r = chan(c + 409 * e)
    g = chan(c - 100 * d - 208 * e)
    b = chan(c + 516 * d)
    return np.stack([r, g, b], axis=2)


def parse_y4m(blob: bytes) -> dict:
    """Stream header → {width, height, fps, colorspace, n_frames,
    data_offset, frame_bytes}. Every field is attacker-controlled:
    dims pass the shared pixel budget, and the frame count derives
    from the physical length (never a declared count)."""
    if blob[:9] != b"YUV4MPEG2":
        raise ValueError("not a YUV4MPEG2 stream")
    nl = blob.find(b"\n", 9)
    if nl < 0 or nl > 512:
        raise ValueError("unterminated/oversized Y4M stream header")
    w = h = 0
    fps = None
    cs = "C420jpeg"  # the spec default when no C tag is present
    for tag in blob[9:nl].decode("latin-1").split():
        if tag[:1] == "W":
            w = int(tag[1:])
        elif tag[:1] == "H":
            h = int(tag[1:])
        elif tag[:1] == "F":
            num, den = tag[1:].split(":")
            if int(den) == 0:
                raise ValueError("Y4M frame rate with zero denominator")
            fps = int(num) / int(den)
        elif tag[:1] == "C":
            cs = tag
    if w <= 0 or h <= 0:
        raise ValueError("Y4M header missing W/H")
    if cs not in Y4M_COLORSPACES:
        raise NotImplementedError(
            f"no built-in layout for Y4M colorspace {cs!r}: built-ins "
            f"cover {sorted(Y4M_COLORSPACES)}"
        )
    _check_pixel_budget(w, h)
    cx, cy = Y4M_COLORSPACES[cs]
    if cx and (w % cx or h % cy):
        raise ValueError(f"Y4M {cs} dims must be multiples of ({cx},{cy})")
    frame_bytes = w * h + (2 * (w // cx) * (h // cy) if cx else 0)
    n = 0
    pos = nl + 1
    while pos < len(blob):
        fnl = blob.find(b"\n", pos)
        if blob[pos : pos + 5] != b"FRAME" or fnl < 0:
            raise ValueError("malformed Y4M FRAME marker")
        if fnl + 1 + frame_bytes > len(blob):
            raise ValueError("truncated Y4M frame payload")
        n += 1
        pos = fnl + 1 + frame_bytes
    return {
        "format": "y4m",
        "width": w,
        "height": h,
        "fps": fps,
        "colorspace": cs,
        "n_frames": n,
        "data_offset": nl + 1,
        "frame_bytes": frame_bytes,
    }


def iter_y4m_frames(blob: bytes) -> Iterator[np.ndarray]:
    """Yield each frame as (H, W, 3) RGB uint8: planar YUV reshape,
    nearest-neighbor chroma upsample, fixed-point BT.601 conversion
    (Cmono replicates luma across channels, no conversion)."""
    m = parse_y4m(blob)
    w, h, fb = m["width"], m["height"], m["frame_bytes"]
    cx, cy = Y4M_COLORSPACES[m["colorspace"]]
    pos = m["data_offset"]
    for _ in range(m["n_frames"]):
        pos = blob.find(b"\n", pos) + 1  # past the FRAME marker
        data = np.frombuffer(blob, np.uint8, fb, pos)
        ypl = data[: w * h].reshape(h, w)
        if cx == 0:
            yield np.repeat(ypl[:, :, None], 3, axis=2)
        else:
            cw, ch = w // cx, h // cy
            u = data[w * h : w * h + cw * ch].reshape(ch, cw)
            v = data[w * h + cw * ch :].reshape(ch, cw)
            if cx > 1 or cy > 1:
                u = np.repeat(np.repeat(u, cy, axis=0), cx, axis=1)
                v = np.repeat(np.repeat(v, cy, axis=0), cx, axis=1)
            yield yuv601_to_rgb(ypl, u, v)
        pos += fb


def decode_y4m(blob: bytes) -> np.ndarray:
    """First frame → (H, W, 3) RGB uint8 (the media_decoder still-
    image contract, mirroring decode_avi/decode_gif)."""
    for frame in iter_y4m_frames(blob):
        return frame
    raise ValueError("Y4M stream contains no frames")


def y4m_frame_decoder(blob: bytes, every_n: int) -> list[bytes]:
    """`sample_frames` contract for Y4M: every_n-th frame as a
    standalone P6 PPM blob (the avi_frame_decoder hand-off)."""
    frames = [encode_ppm(f) for f in iter_y4m_frames(blob)]
    return frames[::every_n] if frames else []


def encode_y4m(
    y_planes,
    u_planes=None,
    v_planes=None,
    fps: tuple[int, int] = (25, 1),
    colorspace: str = "C444",
) -> bytes:
    """Author a Y4M stream from RAW planes (uint8 arrays; chroma plane
    dims must match the colorspace geometry; Cmono takes luma only) —
    tests supply closed-form planes so decode is exactly predictable."""
    if colorspace not in Y4M_COLORSPACES:
        raise ValueError(f"colorspace must be one of {sorted(Y4M_COLORSPACES)}")
    cx, cy = Y4M_COLORSPACES[colorspace]
    y_planes = [np.asarray(p, dtype=np.uint8) for p in y_planes]
    if not y_planes:
        raise ValueError("Y4M needs at least one frame")
    h, w = y_planes[0].shape
    if cx and (w % cx or h % cy):
        raise ValueError(f"{colorspace} dims must be multiples of ({cx},{cy})")
    if cx == 0:
        u_planes = v_planes = [None] * len(y_planes)
    elif u_planes is None or v_planes is None or not (
        len(u_planes) == len(v_planes) == len(y_planes)
    ):
        raise ValueError("chroma plane lists must parallel the luma list")
    hdr = (
        f"YUV4MPEG2 W{w} H{h} F{fps[0]}:{fps[1]} Ip A1:1 {colorspace}\n"
    ).encode("latin-1")
    out = bytearray(hdr)
    for ypl, u, v in zip(y_planes, u_planes, v_planes):
        if ypl.shape != (h, w):
            raise ValueError("Y4M frames must share one size")
        out += b"FRAME\n" + ypl.tobytes()
        if cx:
            cw, ch = w // cx, h // cy
            u = np.asarray(u, dtype=np.uint8)
            v = np.asarray(v, dtype=np.uint8)
            if u.shape != (ch, cw) or v.shape != (ch, cw):
                raise ValueError(
                    f"{colorspace} chroma planes must be ({ch},{cw})"
                )
            out += u.tobytes() + v.tobytes()
    return bytes(out)
