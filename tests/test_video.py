"""AVI video container: RIFF walk, MJPG/DIB frame decode, metadata
probe, typed-error contract, and the sample_frames integration.
Reference ambition: opaque custom column types carrying arbitrary
bytes (column_type.go:16-23) — here a real video container."""

from __future__ import annotations

import numpy as np
import pytest

from sif_spark.operators import multimodal as mm
from sif_spark.operators import video as vv
from sif_spark.operators.jpeg import decode_jpeg, encode_jpeg


def _rand_frames(rng, n, h, w):
    return [rng.integers(0, 256, (h, w, 3), np.uint8) for _ in range(n)]


def test_avi_dib_roundtrip_with_drop_frames():
    """Odd width (4-byte stride padding live), a zero-length
    hold-previous chunk, and the metadata probe."""
    rng = np.random.default_rng(11)
    frames = _rand_frames(rng, 5, 12, 17)
    frames[3] = frames[2].copy()
    blob = vv.encode_avi(frames, codec="DIB ", fps=10, drop_frames=[3])
    out = list(vv.iter_avi_frames(blob))
    assert len(out) == 5
    assert all(np.array_equal(a, b) for a, b in zip(frames, out))
    meta = vv.parse_avi(blob)
    assert (meta["width"], meta["height"]) == (17, 12)
    assert meta["total_frames"] == 5
    assert meta["us_per_frame"] == 100_000
    assert meta["duration_s"] == pytest.approx(0.5)
    (s,) = meta["streams"]
    assert s["type"] == "vids" and s["compression"] == "DIB " and s["fps"] == 10


def test_avi_mjpg_frames_equal_direct_jpeg_decode():
    """The container must hand each 00dc payload to the JPEG decoder
    byte-identically: AVI frames == decode_jpeg(encode_jpeg(frame))
    for lossy quant, and EXACT for gray-valued 8x8-block-constant
    frames at quant=1 (DC-only, Cb=Cr=128 — the q110 exactness trick)."""
    rng = np.random.default_rng(12)
    frames = _rand_frames(rng, 3, 16, 24)
    blob = vv.encode_avi(frames, codec="MJPG", quant=4)
    ref = [decode_jpeg(encode_jpeg(f, quant=4)) for f in frames]
    out = list(vv.iter_avi_frames(blob))
    assert all(np.array_equal(a, b) for a, b in zip(ref, out))

    gray = []
    for _ in range(4):
        base = rng.integers(0, 256, (2, 3), np.uint8)
        big = np.kron(base, np.ones((8, 8), np.uint8))
        gray.append(np.repeat(big[:, :, None], 3, axis=2))
    out = list(vv.iter_avi_frames(vv.encode_avi(gray, codec="MJPG", quant=1)))
    assert all(np.array_equal(a, b) for a, b in zip(gray, out))


def test_avi_hand_assembled_spec_bytes():
    """Symmetric-bug proof: a minimal AVI assembled from the spec by
    hand (not via encode_avi) — one 2x2 DIB frame written as raw
    bottom-up BGR rows with 4-byte stride, plus a LIST rec grouping
    around the frame chunk (the OpenDML capture idiom)."""
    # target image (top-down RGB):
    #   (255,0,0) (0,255,0)
    #   (0,0,255) (9,8,7)
    # DIB rows are BOTTOM-UP and BGR, strides padded to 8 bytes:
    row_bottom = bytes([255, 0, 0, 7, 8, 9, 0, 0])  # BGR(0,0,255), BGR(9,8,7)
    row_top = bytes([0, 0, 255, 0, 255, 0, 0, 0])
    dib = row_bottom + row_top

    def chunk(cc, payload):
        return cc + len(payload).to_bytes(4, "little") + payload + (
            b"\x00" if len(payload) & 1 else b""
        )

    strh = (
        b"vids" + bytes(4) + bytes(12)
        + (1).to_bytes(4, "little") + (5).to_bytes(4, "little")  # scale, rate
        + bytes(4) + (1).to_bytes(4, "little") + bytes(20)
    )
    strf = (
        (40).to_bytes(4, "little")
        + (2).to_bytes(4, "little", signed=True)
        + (2).to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little") + (24).to_bytes(2, "little")
        + bytes(4) + len(dib).to_bytes(4, "little") + bytes(16)
    )
    avih = (
        (200_000).to_bytes(4, "little") + bytes(12)
        + (1).to_bytes(4, "little") + bytes(4) + (1).to_bytes(4, "little")
        + bytes(4) + (2).to_bytes(4, "little") + (2).to_bytes(4, "little")
        + bytes(16)
    )
    hdrl = chunk(
        b"LIST",
        b"hdrl" + chunk(b"avih", avih)
        + chunk(b"LIST", b"strl" + chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi = chunk(b"LIST", b"movi" + chunk(b"LIST", b"rec " + chunk(b"00db", dib)))
    body = b"AVI " + hdrl + movi
    blob = b"RIFF" + len(body).to_bytes(4, "little") + body

    expect = np.array(
        [[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [9, 8, 7]]], np.uint8
    )
    assert np.array_equal(vv.decode_avi(blob), expect)
    meta = vv.parse_avi(blob)
    assert (meta["width"], meta["height"]) == (2, 2)
    assert meta["streams"][0]["fps"] == 5.0


def test_avi_typed_errors():
    rng = np.random.default_rng(13)
    frames = _rand_frames(rng, 2, 8, 8)
    blob = bytearray(vv.encode_avi(frames, codec="MJPG"))

    # unknown codec fourcc gates loudly, naming the fourcc
    h264 = bytearray(blob)
    i = bytes(h264).index(b"MJPG")  # strh handler
    j = bytes(h264).index(b"MJPG", i + 1)  # strf biCompression
    h264[i : i + 4] = b"H264"
    h264[j : j + 4] = b"H264"
    with pytest.raises(NotImplementedError, match="H264"):
        list(vv.iter_avi_frames(bytes(h264)))

    # truncation mid-chunk is a typed decode error
    with pytest.raises(ValueError):
        list(vv.iter_avi_frames(bytes(blob[: len(blob) // 2])))

    # forged giant dimensions refuse before allocating
    giant = bytearray(vv.encode_avi(frames, codec="DIB "))
    a = bytes(giant).index(b"avih") + 8
    giant[a + 32 : a + 36] = (1 << 16).to_bytes(4, "little")
    giant[a + 36 : a + 40] = (1 << 16).to_bytes(4, "little")
    with pytest.raises(ValueError, match="MAX_DECODE_PIXELS"):
        list(vv.iter_avi_frames(bytes(giant)))

    # a drop frame with no prior real frame
    with pytest.raises(ValueError, match="frame 0 cannot be a drop frame"):
        vv.encode_avi(frames, drop_frames=[0])

    # not an AVI at all / no movi
    with pytest.raises(ValueError, match="not an AVI"):
        vv.decode_avi(b"RIFF\x04\x00\x00\x00WAVE")
    nomovi = bytes(blob).replace(b"movi", b"mvix")
    with pytest.raises(ValueError, match="no movi"):
        list(vv.iter_avi_frames(nomovi))


def test_avi_mutation_fuzz_never_hangs():
    """300 random byte mutations of a valid AVI must only ever raise
    the typed decode errors — never a bare exception, never a hang
    (the round-7 malformed-input contract, extended to video)."""
    rng = np.random.default_rng(14)
    base = bytearray(
        vv.encode_avi(_rand_frames(rng, 3, 8, 12), codec="DIB ")
    )
    for _ in range(300):
        b = bytearray(base)
        for _ in range(rng.integers(1, 8)):
            b[rng.integers(0, len(b))] = rng.integers(0, 256)
        try:
            for _ in vv.iter_avi_frames(bytes(b)):
                pass
            vv.parse_avi(bytes(b))
        except (ValueError, NotImplementedError):
            pass


def test_sniff_format_discriminates_riff_family(spark):
    wav = mm.encode_wav(np.zeros(16, np.float32))
    avi = vv.encode_avi([np.zeros((8, 8, 3), np.uint8)], codec="DIB ")
    df = spark.createDataFrame(
        [(wav,), (avi,), (b"RIFF\x04\x00\x00\x00ACON",)], "blob binary"
    )
    got = [r[0] for r in df.select(mm.sniff_format("blob")).collect()]
    assert got == ["wav", "avi", "riff"]


def test_sample_frames_default_dispatch_handles_avi(spark):
    """End-to-end over Spark: sample_frames' DEFAULT decoder walks AVI
    blobs (every 2nd frame as PPM), and on_error='null' skips an
    unknown-codec AVI instead of failing the task."""
    rng = np.random.default_rng(15)
    frames = _rand_frames(rng, 4, 8, 10)
    good = vv.encode_avi(frames, codec="DIB ")
    df = spark.createDataFrame(
        [(1, good), (2, b"RIFF\x08\x00\x00\x00AVI ????")],
        "doc_id long, blob binary",
    )
    out = mm.sample_frames(df, "blob", "doc_id", every_n=2, on_error="null")
    rows = sorted(
        ((r["doc_id"], r["frame_idx"], bytes(r["frame"])) for r in out.collect())
    )
    assert [(d, j) for d, j, _ in rows] == [(1, 0), (1, 1)]
    assert np.array_equal(mm.decode_ppm(rows[0][2]), frames[0])
    assert np.array_equal(mm.decode_ppm(rows[1][2]), frames[2])


def test_scene_cuts_finds_exact_boundary(spark):
    """SAD shot detection: 8 frames with a +100 brightness jump at a
    known index — exactly that boundary crosses the threshold, over
    both AVI and animated-GIF containers."""
    def frames_with_cut(cut, h=8, w=10):
        out = []
        y, x = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        base = (5 * y + 7 * x) % 120
        for k in range(8):
            v = base + (100 if k >= cut else 0) + k
            out.append(np.repeat(v[:, :, None], 3, 2).astype(np.uint8))
        return out

    rows = [
        (1, vv.encode_avi(frames_with_cut(3), codec="DIB ")),
        (2, mm.encode_gif_animation(frames_with_cut(5))),
        (3, b"ID3" + bytes(20)),
    ]
    df = spark.createDataFrame(rows, "doc_id long, blob binary")
    got = sorted(
        (r["doc_id"], r["frame_idx"], r["sad"])
        for r in vv.scene_cuts(df, "blob", "doc_id", threshold=12000,
                               on_error="null").collect()
    )
    # within-scene SAD = h*w*3 = 240; at the cut = 101*240 = 24240
    assert got == [(1, 3, 24240), (2, 5, 24240)]

    assert vv.frame_sad(np.zeros((2, 2, 3), np.uint8),
                        np.full((2, 2, 3), 7, np.uint8)) == 84
    with pytest.raises(ValueError, match="shapes differ"):
        vv.frame_sad(np.zeros((2, 2, 3)), np.zeros((3, 2, 3)))


# ---------------------------------------------------------------------------
# Y4M (YUV4MPEG2)
# ---------------------------------------------------------------------------


def _yuv_planes(rng, n, h, w, cx, cy):
    ys = [rng.integers(0, 256, (h, w), dtype=np.uint8) for _ in range(n)]
    if cx == 0:
        return ys, None, None
    us = [rng.integers(0, 256, (h // cy, w // cx), dtype=np.uint8) for _ in range(n)]
    vs = [rng.integers(0, 256, (h // cy, w // cx), dtype=np.uint8) for _ in range(n)]
    return ys, us, vs


@pytest.mark.parametrize(
    "cs,cx,cy", [("C444", 1, 1), ("C422", 2, 1), ("C420jpeg", 2, 2), ("Cmono", 0, 0)]
)
def test_y4m_roundtrip_colorspaces(cs, cx, cy):
    """Every supported plane geometry decodes to exactly the reference
    conversion: nearest chroma upsample + fixed-point BT.601 (Cmono:
    luma replicated, untouched)."""
    rng = np.random.default_rng(21)
    ys, us, vs = _yuv_planes(rng, 3, 4, 6, cx, cy)
    blob = vv.encode_y4m(ys, us, vs, colorspace=cs)
    m = vv.parse_y4m(blob)
    assert (m["width"], m["height"], m["n_frames"], m["colorspace"]) == (6, 4, 3, cs)
    frames = list(vv.iter_y4m_frames(blob))
    assert len(frames) == 3
    for i, f in enumerate(frames):
        if cx == 0:
            exp = np.repeat(ys[i][:, :, None], 3, axis=2)
        else:
            u = np.repeat(np.repeat(us[i], cy, axis=0), cx, axis=1)
            v = np.repeat(np.repeat(vs[i], cy, axis=0), cx, axis=1)
            exp = vv.yuv601_to_rgb(ys[i], u, v)
        assert np.array_equal(f, exp)


def test_yuv601_reference_values():
    """Fixed-point BT.601 pinned against hand-computed spec values:
    limited-range black/white and a pure-red chroma point."""
    y = np.array([[16, 235, 81]], np.uint8)
    u = np.array([[128, 128, 90]], np.uint8)
    v = np.array([[128, 128, 240]], np.uint8)
    rgb = vv.yuv601_to_rgb(y, u, v)
    assert rgb[0, 0].tolist() == [0, 0, 0]        # video black
    assert rgb[0, 1].tolist() == [255, 255, 255]  # video white
    # Y=81,U=90,V=240 is the classic 75%-red test point:
    # R=(298*65+409*112+128)>>8=255 (clamped 254.9→254? compute exact)
    c, d, e = 298 * (81 - 16), 90 - 128, 240 - 128
    exp = [
        min(255, max(0, (c + 409 * e + 128) >> 8)),
        min(255, max(0, (c - 100 * d - 208 * e + 128) >> 8)),
        min(255, max(0, (c + 516 * d + 128) >> 8)),
    ]
    assert rgb[0, 2].tolist() == exp


def test_y4m_typed_errors():
    with pytest.raises(ValueError, match="not a YUV4MPEG2"):
        vv.parse_y4m(b"nope")
    with pytest.raises(ValueError, match="missing W/H"):
        vv.parse_y4m(b"YUV4MPEG2 F25:1\n")
    with pytest.raises(NotImplementedError, match="C411"):
        vv.parse_y4m(b"YUV4MPEG2 W8 H8 C411\n")
    with pytest.raises(ValueError, match="multiples"):
        vv.parse_y4m(b"YUV4MPEG2 W7 H4 C420jpeg\n")
    # truncated frame payload
    good = vv.encode_y4m([np.zeros((4, 4), np.uint8)], colorspace="Cmono")
    with pytest.raises(ValueError, match="truncated"):
        vv.parse_y4m(good[:-3])
    with pytest.raises(ValueError, match="zero denominator"):
        vv.parse_y4m(b"YUV4MPEG2 W4 H4 F25:0 Cmono\n")


def test_y4m_mutation_fuzz_never_hangs():
    rng = np.random.default_rng(22)
    ys, us, vs = _yuv_planes(rng, 3, 8, 8, 2, 2)
    base = bytearray(vv.encode_y4m(ys, us, vs, colorspace="C420"))
    for _ in range(300):
        b = bytearray(base)
        for _ in range(rng.integers(1, 8)):
            b[rng.integers(0, len(b))] = rng.integers(0, 256)
        try:
            for _ in vv.iter_y4m_frames(bytes(b)):
                pass
        except (ValueError, NotImplementedError):
            pass


def test_y4m_spark_dispatch(spark):
    """sniff_format labels Y4M; sample_frames' default decoder and
    probe_media both walk it end-to-end over Spark."""
    from sif_spark.operators.probe import probe_media

    rng = np.random.default_rng(23)
    ys, us, vs = _yuv_planes(rng, 4, 4, 6, 1, 1)
    blob = vv.encode_y4m(ys, us, vs, fps=(30, 1), colorspace="C444")
    df = spark.createDataFrame([(1, blob)], "doc_id long, blob binary")
    assert df.select(mm.sniff_format("blob")).collect()[0][0] == "y4m"
    out = mm.sample_frames(df, "blob", "doc_id", every_n=2)
    rows = sorted((r["doc_id"], r["frame_idx"], bytes(r["frame"])) for r in out.collect())
    assert [(d, j) for d, j, _ in rows] == [(1, 0), (1, 1)]
    u0 = np.repeat(np.repeat(us[2], 1, axis=0), 1, axis=1)
    assert np.array_equal(
        mm.decode_ppm(rows[1][2]), vv.yuv601_to_rgb(ys[2], us[2], vs[2])
    )
    p = probe_media(blob)
    assert (p["format"], p["width"], p["height"], p["n_frames"]) == ("y4m", 6, 4, 4)
    assert p["codec"] == "C444" and p["duration_s"] == 4 / 30
