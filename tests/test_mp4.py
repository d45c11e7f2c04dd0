"""MP4/ISO-BMFF sample extraction: sample-table resolution
(stsc/stsz/stco), MJPEG frame decode, PCM audio decode, hand-assembled
spec bytes, typed errors, mutation fuzz, and the Spark dispatch."""

from __future__ import annotations

import numpy as np
import pytest

from sif_spark.operators import mp4 as m4
from sif_spark.operators import multimodal as mm
from sif_spark.operators.jpeg import decode_jpeg


def _block_frames(n: int, bh: int = 2, bw: int = 3, seed: int = 11) -> list[np.ndarray]:
    """8×8-block-constant RGB frames: quant=1 MJPEG decodes them
    exactly (the established AVI/JPEG test corpus shape)."""
    frames = []
    for k in range(n):
        by, bx = np.meshgrid(np.arange(bh), np.arange(bw), indexing="ij")
        g = ((seed + 7 * k + 5 * by + 3 * bx) % 256).astype(np.uint8)
        big = np.kron(g, np.ones((8, 8), np.uint8))
        frames.append(np.repeat(big[:, :, None], 3, axis=2))
    return frames


def test_mp4_mjpeg_roundtrip_multi_chunk():
    """7 frames pack into chunks of 3,2,2 — decode walks a genuinely
    non-uniform stsc table and every frame comes back bit-exact."""
    frames = _block_frames(7)
    blob = m4.encode_mp4_mjpeg(frames)
    t = m4.parse_mp4_tracks(blob)[0]
    assert t["handler"] == "vide" and t["codec"] == "jpeg"
    assert len(t["chunk_offsets"]) == 3 and len(t["samples"]) == 7
    out = list(m4.iter_mp4_frames(blob))
    assert len(out) == 7
    for a, b in zip(frames, out):
        assert np.array_equal(a, b)
    # each sample is a standalone baseline JPEG stream
    off, sz = t["samples"][4]
    dec = decode_jpeg(blob[off : off + sz])
    if dec.ndim == 2:
        dec = np.repeat(dec[:, :, None], 3, axis=2)
    assert np.array_equal(dec, frames[4])


@pytest.mark.parametrize("codec", ["sowt", "twos", "raw "])
def test_mp4_pcm_roundtrip(codec):
    rng = np.random.default_rng(3)
    pcm = rng.integers(-32768, 32767, size=(9000, 2), dtype=np.int16)
    blob = m4.encode_mp4_pcm(pcm, 16000, codec)
    x = m4.decode_mp4_audio(blob)
    assert x.shape == pcm.shape and x.dtype == np.float32
    if codec == "raw ":  # 8-bit offset-binary: high byte survives
        exp = ((pcm.astype(np.int32) >> 8).astype(np.float32)) / 128.0
        assert np.allclose(x, exp)
    else:
        assert np.array_equal(np.rint(x * 32768.0).astype(np.int16), pcm)
    # constant-size track resolves per-chunk, not per-PCM-frame
    t = m4.parse_mp4_tracks(blob)[0]
    assert t["sample_size"] == (4 if codec != "raw " else 2)
    assert len(t["samples"]) == len(t["chunk_offsets"])


def test_mp4_hand_assembled_spec_bytes():
    """A moov tree typed out field-by-field from ISO/IEC 14496-12
    (independent of the muxer): one video track, 2 JPEG samples in 2
    chunks, co64 offsets — pins the box walk, stsd layout, and 64-bit
    chunk offsets against the spec rather than our own writer."""
    from sif_spark.operators.jpeg import encode_jpeg

    s0 = encode_jpeg(_block_frames(1)[0], quant=1)
    s1 = encode_jpeg(_block_frames(2)[1], quant=1)

    def box(t, p):
        return (8 + len(p)).to_bytes(4, "big") + t + p

    ftyp = box(b"ftyp", b"isom\x00\x00\x00\x01")
    mdat = box(b"mdat", s0 + s1)
    off0 = len(ftyp) + 8
    off1 = off0 + len(s0)
    stsd_entry = (
        (86).to_bytes(4, "big") + b"jpeg" + bytes(6) + (1).to_bytes(2, "big")
        + bytes(16) + (24).to_bytes(2, "big") + (16).to_bytes(2, "big") + bytes(50)
    )
    stbl = box(
        b"stbl",
        box(b"stsd", bytes(4) + (1).to_bytes(4, "big") + stsd_entry)
        + box(b"stts", bytes(4) + (1).to_bytes(4, "big")
              + (2).to_bytes(4, "big") + (1).to_bytes(4, "big"))
        + box(b"stsc", bytes(4) + (1).to_bytes(4, "big")
              + (1).to_bytes(4, "big") + (1).to_bytes(4, "big") + (1).to_bytes(4, "big"))
        + box(b"stsz", bytes(4) + (0).to_bytes(4, "big") + (2).to_bytes(4, "big")
              + len(s0).to_bytes(4, "big") + len(s1).to_bytes(4, "big"))
        + box(b"co64", bytes(4) + (2).to_bytes(4, "big")
              + off0.to_bytes(8, "big") + off1.to_bytes(8, "big")),
    )
    mdia = box(
        b"mdia",
        box(b"mdhd", bytes(12) + (10).to_bytes(4, "big") + (2).to_bytes(4, "big") + bytes(4))
        + box(b"hdlr", bytes(8) + b"vide" + bytes(13))
        + box(b"minf", stbl),
    )
    trak = box(b"trak", box(b"tkhd", bytes(84) + (24 << 16).to_bytes(4, "big")
                            + (16 << 16).to_bytes(4, "big")) + mdia)
    moov = box(b"moov", box(b"mvhd", bytes(12) + (10).to_bytes(4, "big")
                            + (2).to_bytes(4, "big") + bytes(80)) + trak)
    blob = ftyp + mdat + moov

    frames = list(m4.iter_mp4_frames(blob))
    exp = _block_frames(2)
    assert len(frames) == 2
    assert np.array_equal(frames[0], exp[0])
    assert np.array_equal(frames[1], exp[1])


def test_mp4_typed_errors():
    frames = _block_frames(2)
    good = m4.encode_mp4_mjpeg(frames)
    # unknown video codec gates loudly, naming the fourcc
    bad = good.replace(b"jpeg", b"avc1")
    with pytest.raises(NotImplementedError, match="avc1"):
        list(m4.iter_mp4_frames(bad))
    # audio API on a video-only movie
    with pytest.raises(ValueError, match="no 'soun' track"):
        m4.decode_mp4_audio(good)
    # no moov at all
    with pytest.raises(ValueError, match="moov"):
        m4.parse_mp4_tracks(b"\x00\x00\x00\x10ftypisom\x00\x00\x00\x01")
    # forged entry_count larger than the physical table
    pcm_blob = bytearray(m4.encode_mp4_pcm(np.zeros(100, np.int16), 100))
    i = pcm_blob.find(b"stco")  # [size][fourcc][ver/flags][entry_count]
    pcm_blob[i + 8 : i + 12] = (1 << 30).to_bytes(4, "big")
    with pytest.raises(ValueError, match="entry_count|box"):
        m4.parse_mp4_tracks(bytes(pcm_blob))


def test_mp4_mutation_fuzz_never_hangs():
    """400 random mutations across a video and an audio movie: typed
    errors only, never a hang or bare exception (the round-7/8
    malformed-input contract, extended to MP4)."""
    rng = np.random.default_rng(16)
    bases = [
        bytearray(m4.encode_mp4_mjpeg(_block_frames(3))),
        bytearray(m4.encode_mp4_pcm(
            rng.integers(-1000, 1000, 4000, dtype=np.int16), 8000)),
    ]
    for base in bases:
        for _ in range(200):
            b = bytearray(base)
            for _ in range(rng.integers(1, 8)):
                b[rng.integers(0, len(b))] = rng.integers(0, 256)
            try:
                m4.decode_mp4(bytes(b))
            except (ValueError, NotImplementedError):
                pass


def test_sniff_format_detects_mp4(spark):
    blob = m4.encode_mp4_mjpeg(_block_frames(1))
    df = spark.createDataFrame(
        [(blob,), (b"\x00\x00\x00\x08free + trailing",)], "blob binary"
    )
    got = [r[0] for r in df.select(mm.sniff_format("blob")).collect()]
    assert got == ["mp4", "unknown"]


def test_sample_frames_default_dispatch_handles_mp4(spark):
    """sample_frames' DEFAULT sniffed decoder walks MP4: a video movie
    yields PPM frames, an audio movie yields PCM windows, and a
    modern-codec movie gates to NULL under on_error='null'."""
    frames = _block_frames(5)
    vid = m4.encode_mp4_mjpeg(frames)
    pcm = np.arange(-2048, 2048, dtype=np.int16)  # 4096 = 4 windows
    aud = m4.encode_mp4_pcm(pcm, 16000, "sowt")
    gated = vid.replace(b"jpeg", b"avc1")
    df = spark.createDataFrame(
        [(1, vid), (2, aud), (3, gated)], "doc_id long, blob binary"
    )
    out = mm.sample_frames(df, "blob", "doc_id", every_n=2, on_error="null")
    rows = sorted(
        (r["doc_id"], r["frame_idx"], bytes(r["frame"])) for r in out.collect()
    )
    assert [(d, j) for d, j, _ in rows] == [(1, 0), (1, 1), (1, 2), (2, 0), (2, 1)]
    assert np.array_equal(mm.decode_ppm(rows[0][2]), frames[0])
    assert np.array_equal(mm.decode_ppm(rows[2][2]), frames[4])
    win0 = np.frombuffer(rows[3][2], dtype="<i2")
    assert np.array_equal(win0, pcm[:1024])
    win2 = np.frombuffer(rows[4][2], dtype="<i2")
    assert np.array_equal(win2, pcm[2048:3072])


def test_probe_and_decode_agree_on_muxed_mp4():
    """probe_mp4 (header-only) and the full decoder see the same
    geometry on a muxed movie."""
    from sif_spark.operators.probe import probe_mp4

    blob = m4.encode_mp4_mjpeg(_block_frames(4, bh=3, bw=2))
    p = probe_mp4(blob)
    assert (p["width"], p["height"], p["codec"]) == (16, 24, "jpeg")
    f = next(iter(m4.iter_mp4_frames(blob)))
    assert f.shape == (24, 16, 3)


def _box(t, p):
    return (8 + len(p)).to_bytes(4, "big") + t + p


def test_mp4_empty_mdhd_is_typed_error():
    """ADVICE r8: a zero-payload mdhd box at buffer end must raise the
    typed ValueError, not IndexError, preserving the on_error='null'
    decode contract."""
    trak = _box(b"trak", _box(b"mdia", _box(b"mdhd", b"")))
    blob = _box(b"moov", trak)
    with pytest.raises(ValueError, match="truncated mdhd"):
        m4.parse_mp4_tracks(blob)


def test_mp4_hdlr_after_minf_still_parses_audio_entry():
    """ADVICE r8: ISO-BMFF does not mandate hdlr-before-minf order; the
    stsd sample entry must be interpreted with the handler known even
    when hdlr follows minf in the trak."""
    entry = (
        (36).to_bytes(4, "big") + b"sowt" + bytes(6) + (1).to_bytes(2, "big")
        + bytes(8)  # audio reserved
        + (2).to_bytes(2, "big") + (16).to_bytes(2, "big")  # channels, bits
        + bytes(4)  # pre_defined + reserved
        + (44100).to_bytes(2, "big") + bytes(2)  # 16.16 sample rate
    )
    stsd = _box(b"stsd", bytes(4) + (1).to_bytes(4, "big") + entry)
    minf = _box(b"minf", _box(b"stbl", stsd))
    hdlr = _box(b"hdlr", bytes(8) + b"soun" + bytes(13))
    for order in (minf + hdlr, hdlr + minf):  # both spec-legal orders
        blob = _box(b"moov", _box(b"trak", _box(b"mdia", order)))
        t = m4.parse_mp4_tracks(blob)[0]
        assert t["handler"] == "soun" and t["codec"] == "sowt"
        assert (t["channels"], t["bits"], t["sample_rate"]) == (2, 16, 44100)
        assert "width" not in t and "height" not in t
